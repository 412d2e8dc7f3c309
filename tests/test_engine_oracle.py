"""BM25 rank identity: distributed engine vs single-process oracle
(SURVEY.md §5.2 item 2 — the binding correctness property).

Every query in the frozen fixture must produce IDENTICAL (docid, score)
top-k lists, rank by rank, in both exhaustive and block-max WAND modes.
"""

import math

import pytest

from search_engine_spark.corpus import query_fixture
from search_engine_spark.oracle.bm25 import oracle_search

QUERIES = [(int(r.qid), r.query, int(r.k)) for r in query_fixture().itertuples()]


def assert_rank_identical(engine_results, oracle_results, qid, query):
    assert len(engine_results) == len(oracle_results), (
        f"q{qid} {query!r}: engine returned {len(engine_results)} rows, "
        f"oracle {len(oracle_results)}"
    )
    for rank, ((ed, es), (od, os_)) in enumerate(zip(engine_results, oracle_results), 1):
        assert ed == od, f"q{qid} {query!r} rank {rank}: engine docid {ed} != oracle {od}"
        assert math.isclose(es, os_, rel_tol=1e-9, abs_tol=1e-12), (
            f"q{qid} {query!r} rank {rank}: engine score {es} != oracle {os_}"
        )


@pytest.mark.parametrize("qid,query,k", QUERIES, ids=[f"q{q[0]}" for q in QUERIES])
def test_rank_identity_exhaustive(search_index, oracle_idx, qid, query, k):
    engine = search_index.search_list(query, k=k, mode="exhaustive")
    oracle = oracle_search(oracle_idx, query, k=k)
    assert_rank_identical(engine, oracle, qid, query)


@pytest.mark.parametrize(
    "qid,query,k",
    [q for q in QUERIES if "-" not in q[1] and '"' not in q[1]],
    ids=[f"q{q[0]}" for q in QUERIES if "-" not in q[1] and '"' not in q[1]],
)
def test_rank_identity_wand(search_index, oracle_idx, qid, query, k):
    engine = search_index.search_list(query, k=k, mode="wand")
    oracle = oracle_search(oracle_idx, query, k=k)
    assert_rank_identical(engine, oracle, qid, query)


@pytest.mark.parametrize(
    "qid,query,k",
    [q for q in QUERIES if "-" not in q[1] and '"' not in q[1]],
    ids=[f"q{q[0]}" for q in QUERIES if "-" not in q[1] and '"' not in q[1]],
)
def test_rank_identity_maxscore(search_index, oracle_idx, qid, query, k):
    """Vectorized block-max MaxScore must be rank-identical to the oracle
    (hence to WAND and exhaustive) on every fixture query."""
    engine = search_index.search_list(query, k=k, mode="maxscore")
    oracle = oracle_search(oracle_idx, query, k=k)
    assert_rank_identical(engine, oracle, qid, query)


@pytest.mark.parametrize(
    "qid,query,k",
    [q for q in QUERIES if "-" not in q[1] and '"' not in q[1]
     and len(q[1].split()) >= 2],
    ids=[f"q{q[0]}" for q in QUERIES if "-" not in q[1] and '"' not in q[1]
         and len(q[1].split()) >= 2],
)
def test_rank_identity_proximity(search_index, oracle_idx, qid, query, k):
    """Proximity-boosted BM25 (reference K4) must be rank-identical between
    the distributed engine and the oracle on every multi-word fixture query."""
    engine = search_index.search_list(
        query, k=k, mode="exhaustive", proximity=1.0
    )
    oracle = oracle_search(oracle_idx, query, k=k, prox_weight=1.0)
    assert_rank_identical(engine, oracle, qid, f"{query} [prox]")


def test_proximity_boost_changes_order(search_index, oracle_idx):
    """Docs where the query words are adjacent must gain score vs plain
    BM25; the bonus per pair is at most prox_weight (minprox >= 1)."""
    plain = dict(search_index.search_list("search engine", k=50))
    boosted = dict(
        search_index.search_list("search engine", k=50, proximity=1.0)
    )
    assert any(
        boosted.get(d, 0.0) > s + 1e-12 for d, s in plain.items()
        if d in boosted
    ), "no doc gained a proximity bonus"
    for d, s in boosted.items():
        if d in plain:
            gain = s - plain[d]
            assert -1e-9 <= gain <= 1.0 + 1e-9


def test_proximity_requires_positions(spark, pages_pdf, tmp_path):
    from search_engine_spark.build import build_index
    from search_engine_spark.config import IndexConfig
    from search_engine_spark.query import SearchIndex

    d = str(tmp_path / "noposs")
    cfg = IndexConfig(num_shards=2, num_buckets=2, store_positions=False)
    build_index(spark, spark.createDataFrame(pages_pdf.head(50)), d, cfg)
    ix = SearchIndex(spark, d)
    with pytest.raises(ValueError, match="store_positions"):
        ix.search("search engine", proximity=1.0)


def test_nonempty_results(search_index):
    # sanity: the headline query matches documents at all
    res = search_index.search_list("web search engine", k=10)
    assert len(res) == 10
    scores = [s for _, s in res]
    assert scores == sorted(scores, reverse=True)


def test_filtered_search_matches_oracle(search_index, oracle_idx):
    # filter on lang attribute restricts candidates (reference F1-F7 + K7)
    allowed = {d for d, a in oracle_idx.attrs.items() if a["lang"] == "de"}
    oracle = oracle_search(oracle_idx, "search engine", k=10, allowed_docids=allowed)
    engine = search_index.search_list(
        "search engine", k=10, filter_ast={"lang": "de"}
    )
    assert_rank_identical(engine, oracle, "filter-de", "search engine +lang=de")


def test_filter_in_and_range(search_index, oracle_idx):
    allowed = {
        d for d, a in oracle_idx.attrs.items() if a["lang"] in ("fr", "ru")
    }
    oracle = oracle_search(oracle_idx, "data", k=10, allowed_docids=allowed)
    engine = search_index.search_list(
        "data", k=10, filter_ast={"lang": {"$in": ["fr", "ru"]}}
    )
    assert_rank_identical(engine, oracle, "filter-in", "data +lang in fr,ru")


def test_unknown_term_empty(search_index):
    assert search_index.search_list("zzzzqqqqxxxx") == []


def test_score_details_sum_equals_score(search_index):
    """K9 breakdown invariant: sum of per-term parts (+ proximity rows)
    per docid reproduces the search score exactly."""
    for kw in ({}, {"proximity": 1.0}, {"matching_strategy": "last"},
               {"matching_strategy": "last", "proximity": 1.0}):
        res = dict(search_index.search_list(
            "web search engine", k=10, mode="exhaustive", **kw
        ))
        det = search_index.score_details(
            "web search engine", k=10, mode="exhaustive", **kw
        ).collect()
        sums: dict[int, float] = {}
        for r in det:
            sums[r["docid"]] = sums.get(r["docid"], 0.0) + r["part"]
        assert set(sums) == set(res)
        for d, s in res.items():
            assert math.isclose(sums[d], s, rel_tol=1e-9, abs_tol=1e-12), (
                d, s, sums[d], kw
            )


def test_proximity_driver_path_identical(search_index, oracle_idx):
    """The pyarrow point-read execution path must apply the same proximity
    bonus as the cluster path (both route to the exhaustive scorer)."""
    q = "web search engine"
    cluster = search_index.search_list(
        q, k=10, mode="exhaustive", execution="cluster", proximity=1.0
    )
    driver = search_index.search_list(
        q, k=10, mode="exhaustive", execution="driver", proximity=1.0
    )
    oracle = oracle_search(oracle_idx, q, k=10, prox_weight=1.0)
    assert_rank_identical(cluster, oracle, "prox-cluster", q)
    assert_rank_identical(driver, oracle, "prox-driver", q)
