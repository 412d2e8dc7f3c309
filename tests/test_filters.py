"""Filter AST -> Catalyst (reference F1-F8, filter.rs semantics)."""

import pandas as pd
import pytest


@pytest.fixture(scope="module")
def fdf(spark):
    pdf = pd.DataFrame(
        {
            "id": [0, 1, 2, 3, 4, 5],
            "lang": ["en", "EN", "de", None, "", "fr"],
            "stars": [1.0, 2.5, None, 4.0, 5.0, 3.0],
        }
    )
    return spark.createDataFrame(pdf)


def _ids(fdf, ast):
    from search_engine_spark.filters import to_column

    return sorted(r["id"] for r in fdf.filter(to_column(ast)).collect())


def test_eq_is_normalized(fdf):
    # reference normalizes string facets (NFKD + lowercase): 'EN' matches 'en'
    assert _ids(fdf, {"lang": "en"}) == [0, 1]
    assert _ids(fdf, {"lang": {"$eq": "EN"}}) == [0, 1]


def test_ne_includes_missing(fdf):
    # reference != includes docs whose field is NULL (filter.rs:270-311)
    assert _ids(fdf, {"lang": {"$ne": "en"}}) == [2, 3, 4, 5]


def test_ranges_correct_not_fork_bug(fdf):
    # F8: the fork maps $gte/$lte to GreaterThan (condition.rs:22,24);
    # we implement the CORRECT inclusive semantics
    assert _ids(fdf, {"stars": {"$gte": 4.0}}) == [3, 4]
    assert _ids(fdf, {"stars": {"$lte": 2.5}}) == [0, 1]
    assert _ids(fdf, {"stars": {"$between": [2.5, 4.0]}}) == [1, 3, 5]


def test_exists_null_empty(fdf):
    assert _ids(fdf, {"stars": {"$exists": True}}) == [0, 1, 3, 4, 5]
    assert _ids(fdf, {"stars": {"$exists": False}}) == [2]
    assert _ids(fdf, {"lang": {"$isEmpty": True}}) == [4]


def test_boolean_composition(fdf):
    ast = {"$or": [{"lang": "de"}, {"$and": [{"stars": {"$gt": 2.0}},
                                            {"lang": {"$ne": "fr"}}]}]}
    assert _ids(fdf, ast) == [1, 2, 3, 4]
    assert _ids(fdf, {"$not": {"lang": {"$in": ["en", "de"]}}}) == [3, 4, 5]
