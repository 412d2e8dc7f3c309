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
