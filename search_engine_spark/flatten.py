"""Nested-document flattening (reference T6, ``flatten-serde-json``).

The reference flattens every document Elasticsearch-style before indexing
(``/root/reference/flatten-serde-json/src/lib.rs``, README):

* ``{"a": {"b": "c"}}``                -> ``{"a.b": "c"}``
* ``{"a": [{"b": "c"}, {"b": "d"}]}``  -> ``{"a.b": ["c", "d"]}``
* key collisions merge into arrays.

Spark equivalent: structs become dotted columns (pure Catalyst projection —
free, no UDF); arrays of structs become per-key arrays via ``transform``;
arrays of arrays flatten one level per pass like the reference. The web-page
input of the north rule is already flat, so this is the extension surface
for JSON corpora ingested via ``sources.read_documents(fmt='json')``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.types import ArrayType, StructType


def _field_getter(field_name: str):
    return lambda x: x[field_name]


def flatten_columns(df: DataFrame, sep: str = ".", max_depth: int = 16) -> DataFrame:
    """Flatten struct / array-of-struct columns into dotted top-level columns.

    Iterates to a fixed point (bounded by ``max_depth``): each pass expands
    one level of nesting, mirroring the reference's recursive walk. Arrays
    of structs turn into one array column per nested key; arrays of arrays
    collapse one level per pass (reference: nested arrays are merged).
    """
    for _ in range(max_depth):
        new_cols: list[Column] = []
        changed = False
        for field in df.schema.fields:
            name, dt = field.name, field.dataType
            if isinstance(dt, StructType):
                changed = True
                for sub in dt.fields:
                    new_cols.append(
                        F.col(f"`{name}`.`{sub.name}`").alias(f"{name}{sep}{sub.name}")
                    )
            elif isinstance(dt, ArrayType) and isinstance(dt.elementType, StructType):
                changed = True
                for sub in dt.elementType.fields:
                    # one-arg lambda via factory: a default-arg lambda looks
                    # binary to F.transform, which then passes (elem, index)
                    new_cols.append(
                        F.transform(F.col(f"`{name}`"), _field_getter(sub.name)).alias(
                            f"{name}{sep}{sub.name}"
                        )
                    )
            elif isinstance(dt, ArrayType) and isinstance(dt.elementType, ArrayType):
                changed = True
                new_cols.append(F.flatten(F.col(f"`{name}`")).alias(name))
            else:
                new_cols.append(F.col(f"`{name}`"))
        if not changed:
            return df
        df = df.select(*new_cols)
    return df


def linearize_for_search(df: DataFrame, cols: list[str], out_col: str = "text",
                         sep: str = ". ") -> DataFrame:
    """Join multiple (possibly array) columns into one searchable text column
    (reference ``json_to_string``, ``src/lib.rs:236-282``: arrays are
    '. '-joined, all values linearized to strings)."""
    parts = []
    for c in cols:
        dt = df.schema[c].dataType
        col = F.col(f"`{c}`")  # flattened names contain dots
        if isinstance(dt, ArrayType):
            parts.append(F.array_join(F.transform(col, lambda x: x.cast("string")), sep))
        else:
            parts.append(col.cast("string"))
    return df.withColumn(out_col, F.concat_ws(sep, *parts))
