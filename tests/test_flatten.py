"""Flattening semantics vs the reference's flatten-serde-json README cases."""


def test_struct_flattens_to_dotted(spark):
    from search_engine_spark.flatten import flatten_columns

    df = spark.createDataFrame(
        [(1, {"b": "c", "d": {"e": "f"}})],
        "id long, a struct<b string, d struct<e string>>",
    )
    out = flatten_columns(df)
    assert set(out.columns) == {"id", "a.b", "a.d.e"}
    row = out.head()
    assert row["a.b"] == "c" and row["a.d.e"] == "f"


def test_array_of_structs_merges_per_key(spark):
    from search_engine_spark.flatten import flatten_columns

    df = spark.createDataFrame(
        [(1, [{"b": "c"}, {"b": "d"}])], "id long, a array<struct<b string>>"
    )
    out = flatten_columns(df)
    assert set(out.columns) == {"id", "a.b"}
    assert out.head()["a.b"] == ["c", "d"]


def test_nested_arrays_flatten(spark):
    from search_engine_spark.flatten import flatten_columns

    df = spark.createDataFrame(
        [(1, [[1, 2], [3]])], "id long, a array<array<int>>"
    )
    out = flatten_columns(df)
    assert out.head()["a"] == [1, 2, 3]


def test_linearize_for_search(spark):
    from search_engine_spark.flatten import linearize_for_search

    df = spark.createDataFrame(
        [("t1", ["x", "y"], 7)], "title string, tags array<string>, n int"
    )
    out = linearize_for_search(df, ["title", "tags", "n"])
    assert out.head()["text"] == "t1. x. y. 7"
