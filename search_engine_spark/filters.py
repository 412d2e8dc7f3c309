"""MongoDB-ish filter AST -> Spark Column (reference §2.5, F1-F7).

The reference's filter language (from its absent ``query_lang`` crate, AST
consumed in ``/root/reference/src/search/facet/filter.rs:188-515`` and
``condition.rs:1-31``) supports
``$eq/$ne/$gt/$gte/$lt/$lte/$between/$exists/$isEmpty/$in/$and/$or/$not``
over field paths. Here each condition becomes a Catalyst expression, so
predicate pushdown / partition pruning / constant folding are free — the
hand-built facet level B-tree (reference ``facet_range_search.rs``) is
replaced by parquet column stats.

Semantics notes:
* ``$ne`` matches documents where the field is NULL as well — the reference's
  ``!=`` includes documents missing the field (``filter.rs:270-311``); we
  replicate via NULL-safe comparison.
* string equality is normalized (NFKD + lowercase) on both sides, matching
  the reference's normalized string facets (``src/lib.rs:361-363``).
* the reference fork has copy-paste bugs mapping ``$gte``/``$lte`` to
  GreaterThan (``condition.rs:22,24``, SURVEY.md F8). We implement the
  CORRECT semantics and do not replicate the bug (documented divergence).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from search_engine_spark.analysis import normalize


def _norm_value(v):
    return normalize(v) if isinstance(v, str) else v


def _field_col(name: str, norm: bool) -> Column:
    c = F.col(name)
    return F.lower(c) if norm else c  # full NFKD happens via _norm_value for literals;
    # Spark-side lower() suffices for ascii attrs; callers needing full accent
    # folding should store normalized attribute columns.


def _condition(field: str, op: str, value, norm_strings: bool) -> Column:
    if op in ("$in", "$between"):
        # element-wise ops normalize like the $eq they expand to (reference
        # F4: IN = union of normalized equals, filter.rs:373-392)
        norm = norm_strings and any(isinstance(x, str) for x in value)
    else:
        norm = norm_strings and isinstance(value, str)
    c = _field_col(field, norm)
    v = _norm_value(value) if norm_strings else value
    if op == "$eq":
        return c == F.lit(v)
    if op == "$ne":
        # reference semantics: != includes missing/null fields
        return ~c.eqNullSafe(F.lit(v))
    if op == "$gt":
        return c > F.lit(v)
    if op == "$gte":
        return c >= F.lit(v)
    if op == "$lt":
        return c < F.lit(v)
    if op == "$lte":
        return c <= F.lit(v)
    if op == "$between":
        lo, hi = value
        return c.between(F.lit(_norm_value(lo) if norm_strings else lo),
                         F.lit(_norm_value(hi) if norm_strings else hi))
    if op == "$in":
        vals = [_norm_value(x) if norm else x for x in value]
        return c.isin(vals)
    if op == "$exists":
        return c.isNotNull() if value else c.isNull()
    if op == "$isEmpty":
        empty = F.length(F.trim(F.col(field).cast("string"))) == 0
        return empty if value else ~empty
    raise ValueError(f"unsupported filter operator: {op}")


def to_column(ast, norm_strings: bool = True) -> Column:
    """Compile a filter AST dict into a Spark Column.

    AST shapes::

        {"lang": "en"}                          # implicit $eq
        {"lang": {"$in": ["en", "de"]}}
        {"$and": [ ... ]} / {"$or": [ ... ]} / {"$not": { ... }}
        {"n_chars": {"$between": [10, 100]}}
    """
    if not isinstance(ast, dict) or not ast:
        raise ValueError(f"filter AST must be a non-empty dict, got {ast!r}")
    cols: list[Column] = []
    for key, val in ast.items():
        if key == "$and":
            cols.append(_fold(val, lambda a, b: a & b, norm_strings))
        elif key == "$or":
            cols.append(_fold(val, lambda a, b: a | b, norm_strings))
        elif key == "$not":
            # reference NOT = all_docs − matching (filter.rs:487-513):
            # docs where the inner predicate is NULL (missing field) are
            # NOT matching, so they survive the negation
            cols.append(~F.coalesce(to_column(val, norm_strings), F.lit(False)))
        elif isinstance(val, dict):
            for op, v in val.items():
                cols.append(_condition(key, op, v, norm_strings))
        else:
            cols.append(_condition(key, "$eq", val, norm_strings))
    out = cols[0]
    for c in cols[1:]:
        out = out & c
    return out


def _fold(items, combine, norm_strings: bool) -> Column:
    if not items:
        raise ValueError("$and/$or need at least one operand")
    cols = [to_column(x, norm_strings) for x in items]
    out = cols[0]
    for c in cols[1:]:
        out = combine(out, c)
    return out
