"""Facet read operators (reference §2.9, FD1-FD3) — pure Catalyst.

The reference walks a hand-built facet level B-tree
(``/root/reference/src/search/facet/facet_distribution.rs:24-835``,
``facet_distribution_iter.rs``) and a facet-value FST with typo-tolerant
prefix DFAs (``facet/search.rs:21-288``). On Spark both collapse into
groupBy/filter over attribute columns: parquet column stats + predicate
pushdown replace the level tree, and the dictionary scan replaces the FST.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from search_engine_spark.filters import to_column
from search_engine_spark.query_parse import levenshtein, max_typos_for

DEFAULT_MAX_VALUES = 100  # reference default cap, facet_distribution.rs:38


def facet_distribution(
    df: DataFrame,
    facet_col: str,
    filter_ast: dict | None = None,
    order: str = "count",
    max_values: int = DEFAULT_MAX_VALUES,
) -> DataFrame:
    """value -> doc count over the (optionally filtered) candidate set.

    -> (value, count). ``order``: 'count' (desc, value asc tiebreak — the
    reference's Count order) or 'lex' (value asc). Single hash-aggregate
    with map-side combine; the filter pushes down to the scan.
    """
    d = df.filter(to_column(filter_ast)) if filter_ast is not None else df
    agg = d.groupBy(F.col(facet_col).cast("string").alias("value")).agg(
        F.count("*").alias("count")
    )
    if order == "count":
        agg = agg.orderBy(F.col("count").desc(), F.col("value").asc())
    else:
        agg = agg.orderBy(F.col("value").asc())
    return agg.limit(max_values)


def facet_value_search(
    df: DataFrame,
    facet_col: str,
    query: str,
    k: int = 10,
    typo_tolerant: bool = True,
    filter_ast: dict | None = None,
) -> DataFrame:
    """Prefix (+ optional typo-tolerant) search over a facet's values
    (reference FD2 ``SearchForFacetValues``): -> (value, count), ordered
    (count desc, value asc), top-k.

    Prefix match is a Catalyst ``startswith``; the typo path adds a
    Levenshtein disjunct with the reference's length thresholds
    (``src/update/typo_config.rs:14-35``). Both prune to the facet's
    distinct-value aggregate, which is tiny relative to the corpus.
    """
    d = df.filter(to_column(filter_ast)) if filter_ast is not None else df
    counts = d.groupBy(F.col(facet_col).cast("string").alias("value")).agg(
        F.count("*").alias("count")
    )
    q = query.lower()
    cond = F.col("value").startswith(q)
    budget = max_typos_for(q) if typo_tolerant else 0
    if budget:
        cond = cond | (F.levenshtein(F.col("value"), F.lit(q)) <= budget)
    return (
        counts.filter(cond)
        .orderBy(F.col("count").desc(), F.col("value").asc())
        .limit(k)
    )


def facet_stats(df: DataFrame, facet_col: str, filter_ast: dict | None = None) -> DataFrame:
    """Numeric facet min/max over candidates (reference exposes facet bounds
    for range UIs via the level tree root): -> (min_value, max_value)."""
    d = df.filter(to_column(filter_ast)) if filter_ast is not None else df
    return d.agg(
        F.min(facet_col).alias("min_value"), F.max(facet_col).alias("max_value")
    )


__all__ = ["facet_distribution", "facet_value_search", "facet_stats", "levenshtein"]
