"""BM25F field-weighted search (reference K5 AttributeRule,
``src/search/ranking/attribute.rs:18-238`` + per-field postings
``word_fid_docids``, ``src/index.rs:121-122``), rebuilt as integer field
boosts with Lucene content-duplication semantics (see config.field_cols).

The oracle mirrors the exact arithmetic (weighted tf/dl, fid<<16 position
packing), so rank identity is the gate here exactly as for single-field.
"""

import math

import pytest

from search_engine_spark.oracle.bm25 import build_oracle_index, oracle_search

FIELDS = [("text", 1), ("lang", 3)]


@pytest.fixture(scope="module")
def f_index_dir(spark, pages_pdf, tmp_path_factory):
    from search_engine_spark.build import build_index
    from search_engine_spark.config import IndexConfig

    d = str(tmp_path_factory.mktemp("bm25f") / "idx")
    cfg = IndexConfig(
        field_cols=tuple(FIELDS), num_shards=4, num_buckets=4,
        block_size=32, attr_cols=("lang",),
    )
    build_index(spark, spark.createDataFrame(pages_pdf), d, cfg)
    return d


@pytest.fixture(scope="module")
def f_search(spark, f_index_dir):
    from search_engine_spark.query import SearchIndex

    return SearchIndex(spark, f_index_dir)


@pytest.fixture(scope="module")
def f_oracle(pages_pdf):
    return build_oracle_index(pages_pdf, fields=FIELDS, attr_cols=("lang",))


def _assert_identical(engine, oracle, label):
    assert len(engine) == len(oracle), label
    for rank, ((ed, es), (od, os_)) in enumerate(zip(engine, oracle), 1):
        assert ed == od, f"{label} rank {rank}: {ed} != {od}"
        assert math.isclose(es, os_, rel_tol=1e-9, abs_tol=1e-12), (
            f"{label} rank {rank}: score {es} != {os_}"
        )


@pytest.mark.parametrize("query", [
    "en", "de", "search engine", "web search en", "the of and", "fr crawl",
])
def test_bm25f_rank_identity(f_search, f_oracle, query):
    engine = f_search.search_list(query, k=10, mode="exhaustive")
    oracle = oracle_search(f_oracle, query, k=10)
    _assert_identical(engine, oracle, f"bm25f {query!r}")


@pytest.mark.parametrize("query", ["en", "search engine", "web search en"])
def test_bm25f_wand_identity(f_search, query):
    ex = f_search.search_list(query, k=10, mode="exhaustive")
    wa = f_search.search_list(query, k=10, mode="wand")
    ms = f_search.search_list(query, k=10, mode="maxscore")
    _assert_identical(wa, ex, f"wand vs exhaustive {query!r}")
    _assert_identical(ms, ex, f"maxscore vs exhaustive {query!r}")


def test_field_boost_raises_weighted_field_hits(f_search, f_oracle, pages_pdf):
    """A doc whose boosted lang field matches must score the query term
    with tf >= 3 — strictly above what a single body occurrence yields in
    the same doc shape. Spot-check tf accounting via the oracle postings."""
    assert "en" in f_oracle.postings
    langs = dict(
        zip(range(len(pages_pdf)), pages_pdf.sort_values("url")["lang"])
    )
    for d, tf in f_oracle.postings["en"].items():
        # weight-3 lang field contributes exactly 3 per 'en' occurrence
        assert tf >= 3 or langs.get(d) != "en"


def test_phrase_cannot_cross_fields(f_search, f_oracle):
    """Positions are packed fid<<16|pos: 'search' (text field) and 'en'
    (lang field) are never adjacent, so the cross-field phrase is empty."""
    res = f_search.search_list('"search en"', k=10, mode="exhaustive")
    oracle = oracle_search(f_oracle, '"search en"', k=10)
    _assert_identical(res, oracle, "cross-field phrase")
    assert res == []


def test_proximity_no_bonus_across_fields(f_search, f_oracle):
    """Cross-field word pairs are >= 2^16 - 65535 apart -> minprox > 7 ->
    no proximity bonus; rank identity with the oracle still holds."""
    engine = f_search.search_list(
        "search en", k=10, mode="exhaustive", proximity=1.0
    )
    oracle = oracle_search(f_oracle, "search en", k=10, prox_weight=1.0)
    _assert_identical(engine, oracle, "cross-field prox")


def test_multifield_meta_roundtrip(f_search):
    assert f_search.config.field_cols == tuple(FIELDS)
    assert f_search.config.searchable_fields() == tuple(FIELDS)
