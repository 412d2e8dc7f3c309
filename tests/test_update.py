"""Incremental index maintenance: upsert / delete / compact semantics
(reference T1-T4 re-expressed as segment generations + tombstones)."""

import shutil

import pandas as pd
import pytest


@pytest.fixture()
def small_index(spark, tmp_path):
    from search_engine_spark.build import build_index
    from search_engine_spark.config import IndexConfig

    rows = [
        ("a", "spark index engine query", "en"),
        ("b", "spark table join", "en"),
        ("c", "window aggregate stream", "de"),
        ("d", "query planner optimizer", "en"),
    ]
    pdf = pd.DataFrame(rows, columns=["url", "text", "lang"])
    cfg = IndexConfig(text_col="text", pk_col="url", ts_col=None,
                      attr_cols=("lang",), num_shards=2, num_buckets=2)
    d = str(tmp_path / "idx")
    build_index(spark, spark.createDataFrame(pdf), d, cfg)
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _pk_results(ix, q, **kw):
    return [(r["pk"], round(r["score"], 9)) for r in ix.search(q, k=10, **kw).collect()]


def test_append_makes_new_docs_searchable(spark, small_index):
    from search_engine_spark.query import SearchIndex
    from search_engine_spark.update import add_documents

    new = spark.createDataFrame(
        pd.DataFrame([("e", "banana smoothie recipe", "fr")],
                     columns=["url", "text", "lang"])
    )
    meta = add_documents(spark, small_index, new)
    assert meta["n_docs"] == 5
    assert set(meta["generations"]) == {"0", "1"}
    ix = SearchIndex(spark, small_index)
    hits = _pk_results(ix, "banana")
    assert [p for p, _ in hits] == ["e"]
    # old docs still searchable, both modes agree across generations
    assert _pk_results(ix, "spark query", mode="wand") == _pk_results(
        ix, "spark query", mode="exhaustive"
    )


def test_replace_tombstones_old_version(spark, small_index):
    from search_engine_spark.query import SearchIndex
    from search_engine_spark.update import add_documents

    new = spark.createDataFrame(
        pd.DataFrame([("b", "completely new content here", "en")],
                     columns=["url", "text", "lang"])
    )
    meta = add_documents(spark, small_index, new)
    assert meta["n_docs"] == 4  # replaced, not added
    assert meta["n_deleted"] == 1
    ix = SearchIndex(spark, small_index)
    # old content of b no longer matches
    assert "b" not in [p for p, _ in _pk_results(ix, "table join")]
    assert [p for p, _ in _pk_results(ix, "completely content")] == ["b"]
    # WAND (with tombstone skip + bound scaling) agrees with exhaustive
    for q in ("spark", "query engine", "completely new"):
        assert _pk_results(ix, q, mode="wand") == _pk_results(ix, q, mode="exhaustive")


def test_delete_documents(spark, small_index):
    from search_engine_spark.query import SearchIndex
    from search_engine_spark.update import delete_documents

    meta = delete_documents(spark, small_index, ["a", "c"])
    assert meta["n_docs"] == 2 and meta["n_deleted"] == 2
    ix = SearchIndex(spark, small_index)
    pks = {p for p, _ in _pk_results(ix, "spark index engine window stream")}
    assert pks == {"b"}


def test_delete_by_filter(spark, small_index):
    from search_engine_spark.query import SearchIndex
    from search_engine_spark.update import compact, delete_by_filter

    meta = delete_by_filter(spark, small_index, {"lang": "en"})
    assert meta["n_docs"] == 1 and meta["n_deleted"] == 3
    ix = SearchIndex(spark, small_index)
    pks = {p for p, _ in _pk_results(ix, "spark index engine window stream")}
    assert pks == {"c"}
    # compaction folds the filter-deletes like id-deletes
    meta = compact(spark, small_index)
    assert meta["n_deleted"] == 0 and meta["n_docs"] == 1
    ix = SearchIndex(spark, small_index)
    assert {p for p, _ in _pk_results(ix, "window stream")} == {"c"}


def test_overlapping_deletes_count_distinct_docids(spark, small_index):
    """Overlapping delete_by_filter / replace-then-delete flows append the
    same docid to the tombstone log more than once; n_deleted (and hence
    the frozen idf denominator n_docs + n_deleted) must count DISTINCT
    tombstoned docids, not raw tombstone rows."""
    from search_engine_spark.query import SearchIndex
    from search_engine_spark.update import (
        add_documents, delete_by_filter, delete_documents,
    )

    # replace 'b' (tombstones its old docid) ...
    add_documents(spark, small_index, spark.createDataFrame(
        pd.DataFrame([("b", "replacement content", "en")],
                     columns=["url", "text", "lang"])))
    # ... then two overlapping filter deletes both match old docids
    meta = delete_by_filter(spark, small_index, {"lang": "en"})
    meta = delete_by_filter(spark, small_index, {"lang": "en"})
    # live: only c (de). tombstoned distinct docids: a, b(old), b(new), d
    assert meta["n_docs"] == 1
    assert meta["n_deleted"] == 4
    # delete_documents of an already-tombstoned pk resolves to docids that
    # are already tombstoned — count must not grow
    meta = delete_documents(spark, small_index, ["a"])
    assert meta["n_deleted"] == 4
    ix = SearchIndex(spark, small_index)
    assert ix.n_docs_indexed == 5  # 1 live + 4 distinct tombstoned


def test_compact_equals_clean_rebuild(spark, small_index, tmp_path):
    from search_engine_spark.build import build_index
    from search_engine_spark.config import IndexConfig
    from search_engine_spark.query import SearchIndex
    from search_engine_spark.update import add_documents, compact

    add_documents(spark, small_index, spark.createDataFrame(
        pd.DataFrame([("b", "fresh replacement text", "en"),
                      ("f", "spark streaming watermark", "en")],
                     columns=["url", "text", "lang"])))
    meta = compact(spark, small_index)
    assert meta["n_deleted"] == 0
    assert set(meta["generations"]) == {"0"}
    ix = SearchIndex(spark, small_index)

    # clean rebuild over the logically-equivalent corpus
    rows = [
        ("a", "spark index engine query", "en"),
        ("b", "fresh replacement text", "en"),
        ("c", "window aggregate stream", "de"),
        ("d", "query planner optimizer", "en"),
        ("f", "spark streaming watermark", "en"),
    ]
    clean_dir = str(tmp_path / "clean")
    cfg = IndexConfig(text_col="text", pk_col="url", ts_col=None,
                      attr_cols=("lang",), num_shards=2, num_buckets=2)
    build_index(spark, spark.createDataFrame(
        pd.DataFrame(rows, columns=["url", "text", "lang"])), clean_dir, cfg)
    clean = SearchIndex(spark, clean_dir)

    assert ix.n_docs == clean.n_docs
    assert abs(ix.avgdl - clean.avgdl) < 1e-9
    for q in ("spark", "query engine", "fresh replacement", "watermark", "stream"):
        a = _pk_results(ix, q)
        b = _pk_results(clean, q)
        assert a == b, (q, a, b)
        assert _pk_results(ix, q, mode="wand") == a
    shutil.rmtree(clean_dir, ignore_errors=True)


def test_reindex_with_new_settings(spark, small_index):
    """T8: settings change triggers a rebuild from the document store;
    docids survive, results identical modulo the changed setting."""
    from search_engine_spark.config import IndexConfig
    from search_engine_spark.query import SearchIndex
    from search_engine_spark.update import reindex

    before = SearchIndex(spark, small_index)
    ranked_before = _pk_results(before, "spark query")
    ids_before = {r["pk"]: r["docid"]
                  for r in spark.read.parquet(small_index + "/docs")
                  .select("pk", "docid").collect()}

    new_cfg = IndexConfig(attr_cols=("lang",), num_shards=3, num_buckets=4,
                          block_size=2, store_positions=True)
    meta = reindex(spark, small_index, new_cfg)
    assert meta["config"]["num_buckets"] == 4

    after = SearchIndex(spark, small_index)
    assert _pk_results(after, "spark query") == ranked_before
    ids_after = {r["pk"]: r["docid"]
                 for r in spark.read.parquet(small_index + "/docs")
                 .select("pk", "docid").collect()}
    assert ids_after == ids_before
    # phrase works because the new settings store positions
    assert after.search('"spark index"', k=5).collect()


def test_update_documents_merges_fields(spark, small_index):
    """Reference T2 UpdateDocuments (merge_functions.rs:47-161): a partial
    row updates only the fields it carries; the rest keep stored values."""
    from search_engine_spark.query import SearchIndex
    from search_engine_spark.update import update_documents

    # change ONLY the lang of doc b; its text must survive the merge
    partial = spark.createDataFrame(
        pd.DataFrame([("b", "fr")], columns=["url", "lang"])
    )
    meta = update_documents(spark, small_index, partial)
    assert meta["n_docs"] == 4  # still four live docs
    ix = SearchIndex(spark, small_index)
    hits = _pk_results(ix, "table join")
    assert "b" in [p for p, _ in hits], "b's text must be preserved"
    fr_hits = ix.search("table join", k=10, filter_ast={"lang": "fr"}).collect()
    assert [r["pk"] for r in fr_hits] == ["b"]


def test_update_documents_text_only_keeps_attrs(spark, small_index):
    from search_engine_spark.query import SearchIndex
    from search_engine_spark.update import update_documents

    partial = spark.createDataFrame(
        pd.DataFrame([("c", "fresh replacement words")],
                     columns=["url", "text"])
    )
    update_documents(spark, small_index, partial)
    ix = SearchIndex(spark, small_index)
    hits = ix.search("fresh replacement", k=10,
                     filter_ast={"lang": "de"}).collect()
    assert [r["pk"] for r in hits] == ["c"], "attr lang=de must be preserved"
    assert _pk_results(ix, "window aggregate") == [] or all(
        p != "c" for p, _ in _pk_results(ix, "window aggregate")
    ), "old text of c must be gone"


def test_update_documents_inserts_new_pk(spark, small_index):
    from search_engine_spark.query import SearchIndex
    from search_engine_spark.update import update_documents

    partial = spark.createDataFrame(
        pd.DataFrame([("z", "zebra crossing")], columns=["url", "text"])
    )
    meta = update_documents(spark, small_index, partial)
    assert meta["n_docs"] == 5
    ix = SearchIndex(spark, small_index)
    assert [p for p, _ in _pk_results(ix, "zebra")] == ["z"]
    z = ix.search("zebra", k=1).collect()[0]
    stats = ix._doc_stats.filter(f"docid = {z['docid']}").collect()[0]
    assert stats["lang"] is None  # absent field -> NULL for a new doc


def test_update_documents_rejects_unknown_columns(spark, small_index):
    from search_engine_spark.update import update_documents

    partial = spark.createDataFrame(
        pd.DataFrame([("b", 1)], columns=["url", "bogus"])
    )
    with pytest.raises(ValueError, match="unknown columns"):
        update_documents(spark, small_index, partial)


def test_delete_heavy_broadcast_tombstones(spark, tmp_path):
    """Delete-heavy invariance: tombstone 40% of a 200-doc corpus and the
    cluster-path scorer (tombstones via Spark broadcast, not task closures)
    must return exactly what a clean rebuild over the survivors returns."""
    from search_engine_spark.build import build_index
    from search_engine_spark.config import IndexConfig
    from search_engine_spark.query import SearchIndex
    from search_engine_spark.update import delete_documents

    words = ["spark", "index", "table", "join", "query", "stream",
             "window", "engine", "plan", "scan"]
    rows = [
        (f"u{i}", " ".join(words[(i + j) % len(words)] for j in range(6)), "en")
        for i in range(200)
    ]
    pdf = pd.DataFrame(rows, columns=["url", "text", "lang"])
    cfg = IndexConfig(text_col="text", pk_col="url", ts_col=None,
                      attr_cols=("lang",), num_shards=2, num_buckets=2)
    full_dir = str(tmp_path / "full")
    build_index(spark, spark.createDataFrame(pdf), full_dir, cfg)
    doomed = [f"u{i}" for i in range(200) if i % 5 in (1, 3)]  # 40%
    meta = delete_documents(spark, full_dir, doomed)
    assert meta["n_deleted"] == len(doomed)

    ix = SearchIndex(spark, full_dir)
    assert ix._deleted_bc is not None and len(ix._deleted_bc.value) == len(doomed)

    clean_dir = str(tmp_path / "clean")
    build_index(
        spark,
        spark.createDataFrame(pdf[~pdf["url"].isin(set(doomed))]),
        clean_dir, cfg,
    )
    clean = SearchIndex(spark, clean_dir)
    for q in ("spark table", "query stream window", "engine join"):
        for mode in ("wand", "exhaustive"):
            got = [p for p, _ in _pk_results(ix, q, mode=mode,
                                             execution="cluster")]
            want = [p for p, _ in _pk_results(clean, q, mode=mode,
                                              execution="cluster")]
            assert got == want, (q, mode, got, want)
    shutil.rmtree(full_dir, ignore_errors=True)
    shutil.rmtree(clean_dir, ignore_errors=True)


def test_delete_majority_of_term_docs_keeps_idf_sane(spark, tmp_path):
    """Regression: deleting more than half of a term's docs must not flip its
    idf negative (idf is computed over the indexed count = live + tombstoned,
    matching the stale df — Lucene semantics). Before the fix, live-count idf
    went negative for majority-deleted terms, inverting ranking and breaking
    the WAND/MaxScore nonnegative-bound invariant (wand != exhaustive)."""
    from search_engine_spark.build import build_index
    from search_engine_spark.config import IndexConfig
    from search_engine_spark.query import SearchIndex
    from search_engine_spark.update import delete_documents

    # 12 docs, all contain "alpha"; 6 also contain "beta". Delete 8 docs,
    # among them 4 of the 6 beta docs: stale df(beta)=6 > live n_docs=4.
    rows = []
    for i in range(12):
        text = "alpha common filler words here"
        if i < 6:
            text += " beta"
        rows.append((f"u{i}", text, "en"))
    pdf = pd.DataFrame(rows, columns=["url", "text", "lang"])
    cfg = IndexConfig(text_col="text", pk_col="url", ts_col=None,
                      attr_cols=("lang",), num_shards=2, num_buckets=2)
    d = str(tmp_path / "idx")
    build_index(spark, spark.createDataFrame(pdf), d, cfg)
    delete_documents(spark, d, [f"u{i}" for i in (0, 1, 2, 3, 6, 7, 8, 9)])

    ix = SearchIndex(spark, d)
    wand = _pk_results(ix, "alpha beta", mode="wand")
    exh = _pk_results(ix, "alpha beta", mode="exhaustive")
    assert wand == exh, (wand, exh)
    assert all(s > 0 for _, s in wand)
    # the two surviving beta docs must outrank the alpha-only survivors
    assert {p for p, _ in wand[:2]} == {"u4", "u5"}, wand
    shutil.rmtree(d, ignore_errors=True)


@pytest.fixture()
def docid_index(spark, tmp_path):
    """Index with externally-managed docids (docid_col) for replacement
    semantics under generation-horizon tombstones."""
    from search_engine_spark.build import build_index
    from search_engine_spark.config import IndexConfig

    rows = [
        (0, "k0", "spark index engine query", "en"),
        (1, "k1", "spark table join", "en"),
        (2, "k2", "window aggregate stream", "de"),
        (3, "k3", "query planner optimizer", "en"),
    ]
    pdf = pd.DataFrame(rows, columns=["doc_id", "url", "text", "lang"])
    cfg = IndexConfig(text_col="text", pk_col="url", ts_col=None,
                      docid_col="doc_id", attr_cols=("lang",),
                      num_shards=2, num_buckets=2)
    d = str(tmp_path / "didx")
    build_index(spark, spark.createDataFrame(pdf), d, cfg)
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_docid_col_replacement_in_place(spark, docid_index):
    """Generation-horizon tombstones: replacing a doc that reuses its
    external docid kills only the OLD generations — the new version stays
    live under the same docid, in every mode and in the doc snapshot."""
    from search_engine_spark.query import SearchIndex
    from search_engine_spark.update import add_documents

    new = spark.createDataFrame(
        pd.DataFrame([(1, "k1", "fresh banana recipe content", "fr")],
                     columns=["doc_id", "url", "text", "lang"])
    )
    meta = add_documents(spark, docid_index, new)
    assert meta["n_docs"] == 4            # replaced, not added
    assert meta["n_deleted"] == 1         # the superseded version
    ix = SearchIndex(spark, docid_index)
    # old content gone, new content searchable under the SAME docid
    assert _pk_results(ix, "table join") == []  # 'table'/'join' only in old k1
    hits = ix.search("banana recipe", k=5).collect()
    assert [(r["pk"], r["docid"]) for r in hits] == [("k1", 1)]
    # wand/maxscore fall back safely under horizon tombstones
    for mode in ("wand", "maxscore", "exhaustive"):
        assert _pk_results(ix, "spark query", mode=mode) == _pk_results(
            ix, "spark query", mode="exhaustive"), mode
    # attribute filter sees the NEW version's attrs, not the dead one's
    assert [r["pk"] for r in
            ix.search("banana", k=5, filter_ast={"lang": "fr"}).collect()] == ["k1"]
    assert ix.search("banana", k=5, filter_ast={"lang": "en"}).collect() == []
    # doc snapshot fetch returns exactly the new version
    res = ix.search("banana", k=1)
    fetched = ix.fetch_documents(res).collect()
    assert len(fetched) == 1 and fetched[0]["text"].startswith("fresh banana")


def test_docid_col_replace_twice_then_compact(spark, docid_index, tmp_path):
    """Two in-place replacements stack horizons correctly; compact folds to
    a clean single-generation index equal to a fresh rebuild."""
    from search_engine_spark.build import build_index
    from search_engine_spark.config import IndexConfig
    from search_engine_spark.query import SearchIndex
    from search_engine_spark.update import add_documents, compact

    for text in ("first replacement text", "second replacement text final"):
        add_documents(spark, docid_index, spark.createDataFrame(
            pd.DataFrame([(2, "k2", text, "en")],
                         columns=["doc_id", "url", "text", "lang"])
        ))
    ix = SearchIndex(spark, docid_index)
    assert _pk_results(ix, "window aggregate") == []
    assert _pk_results(ix, "first") == []  # word unique to replacement #1
    assert [p for p, _ in _pk_results(ix, "second final")] == ["k2"]
    assert ix.n_docs == 4

    meta = compact(spark, docid_index)
    assert meta["n_deleted"] == 0 and meta["n_docs"] == 4
    ix2 = SearchIndex(spark, docid_index)
    assert [p for p, _ in _pk_results(ix2, "second final")] == ["k2"]
    # equal to a clean rebuild over the final corpus
    rows = [
        (0, "k0", "spark index engine query", "en"),
        (1, "k1", "spark table join", "en"),
        (2, "k2", "second replacement text final", "en"),
        (3, "k3", "query planner optimizer", "en"),
    ]
    clean = str(tmp_path / "clean")
    build_index(spark, spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "url", "text", "lang"])),
        clean,
        IndexConfig(text_col="text", pk_col="url", ts_col=None,
                    docid_col="doc_id", attr_cols=("lang",),
                    num_shards=2, num_buckets=2))
    cx = SearchIndex(spark, clean)
    for q in ("spark query", "second final", "planner"):
        assert _pk_results(ix2, q) == _pk_results(cx, q), q
    shutil.rmtree(clean, ignore_errors=True)


def test_docid_col_delete_then_readd(spark, docid_index):
    """Delete kills every existing generation; a later re-add of the same
    external docid lands in a NEWER generation and is live again."""
    from search_engine_spark.query import SearchIndex
    from search_engine_spark.update import add_documents, delete_documents

    delete_documents(spark, docid_index, ["k3"])
    ix = SearchIndex(spark, docid_index)
    assert _pk_results(ix, "planner optimizer") == []
    add_documents(spark, docid_index, spark.createDataFrame(
        pd.DataFrame([(3, "k3", "resurrected planner doc", "en")],
                     columns=["doc_id", "url", "text", "lang"])
    ))
    ix2 = SearchIndex(spark, docid_index)
    assert [p for p, _ in _pk_results(ix2, "resurrected planner")] == ["k3"]
    assert ix2.n_docs == 4


def test_append_rank_mode_equals_window(spark, tmp_path):
    """A backfill append past append_window_max_docs auto-switches to the
    scalable two-pass range rank; docids must be identical to the
    single-task window (and invariant to the batch's partitioning)."""
    from search_engine_spark.build import build_index
    from search_engine_spark.config import IndexConfig
    from search_engine_spark.query import SearchIndex

    base = pd.DataFrame(
        [("a0", "base document text", "en")], columns=["url", "text", "lang"]
    )
    batch = pd.DataFrame(
        [(f"b{i:03d}", f"appended doc number {i}", "en") for i in range(97)],
        columns=["url", "text", "lang"],
    )

    def build_and_append(name, **cfg_kw):
        from search_engine_spark.update import add_documents

        cfg = IndexConfig(text_col="text", pk_col="url", ts_col=None,
                          attr_cols=("lang",), num_shards=2, num_buckets=2,
                          **cfg_kw)
        d = str(tmp_path / name)
        build_index(spark, spark.createDataFrame(base), d, cfg)
        add_documents(
            spark, d, spark.createDataFrame(batch).repartition(7)
        )
        ix = SearchIndex(spark, d)
        stats = spark.read.parquet(ix.paths.doc_stats)
        return {r["pk"]: r["docid"] for r in stats.select("pk", "docid").collect()}

    via_window = build_and_append("w", append_rank_mode="window")
    via_rank = build_and_append("r", append_rank_mode="rank")
    # auto with a tiny threshold must take the rank path and still agree
    via_auto = build_and_append("a", append_rank_mode="auto",
                                append_window_max_docs=10)
    assert via_rank == via_window == via_auto
    assert len(via_rank) == 98
    for name in ("w", "r", "a"):
        shutil.rmtree(str(tmp_path / name), ignore_errors=True)


def test_rank_docid_tombstones_stay_full(spark, small_index):
    """Replacements and deletes on a rank-assigned-docid index must stamp
    dead-everywhere tombstones: a horizon <= max_gen classifies as
    'partial' and silently forces every query onto the exhaustive scorer
    (WAND/MaxScore off) until compact(). Only docid_col indexes can ever
    re-add a docid into a newer generation, so only they need finite
    horizons."""
    from search_engine_spark.query import SearchIndex
    from search_engine_spark.update import add_documents, delete_documents

    add_documents(spark, small_index, spark.createDataFrame(
        pd.DataFrame([("b", "completely new content here", "en")],
                     columns=["url", "text", "lang"])))
    delete_documents(spark, small_index, ["c"])
    # a later append raises max_gen past the earlier tombstones' gens —
    # the regression had horizon=gen stamps turn partial exactly here
    add_documents(spark, small_index, spark.createDataFrame(
        pd.DataFrame([("f", "fresh appended text", "en")],
                     columns=["url", "text", "lang"])))
    ix = SearchIndex(spark, small_index)
    assert ix._partial_tombs is None, "tombstones must classify as FULL"
    assert len(ix._deleted) == 2
    for q in ("spark", "completely new", "fresh"):
        assert _pk_results(ix, q, mode="wand") == _pk_results(
            ix, q, mode="exhaustive")
    assert "c" not in [p for p, _ in _pk_results(ix, "window aggregate")]
    assert "b" not in [p for p, _ in _pk_results(ix, "table join")]


def test_update_settings_equal_value_no_reindex(spark, tmp_path, monkeypatch):
    """Passing semantically-equal config values (nested lists vs the stored
    tuples) to update_settings must be a no-op, not a spurious full
    reindex: the diff compares AFTER from_dict normalization."""
    from search_engine_spark import update
    from search_engine_spark.build import build_index
    from search_engine_spark.config import IndexConfig

    pdf = pd.DataFrame([("a", "alpha text", "src one"),
                        ("b", "beta text", "src two")],
                       columns=["url", "text", "source"])
    cfg = IndexConfig(text_col="text", pk_col="url", ts_col=None,
                      field_cols=(("text", 1), ("source", 2)),
                      num_shards=2, num_buckets=2)
    d = str(tmp_path / "idx_fc")
    build_index(spark, spark.createDataFrame(pdf), d, cfg)

    def boom(*a, **k):
        raise AssertionError("spurious reindex on an equal-value diff")

    monkeypatch.setattr(update, "reindex", boom)
    meta = update.update_settings(
        spark, d, field_cols=[["text", 1], ["source", 2]], attr_cols=[])
    assert tuple(map(tuple, meta["config"]["field_cols"])) == (
        ("text", 1), ("source", 2))


def test_mutations_on_pre_generation_index(spark, small_index):
    """Indexes written before the gen column existed must stay mutable:
    update paths default a missing/NULL gen to 0 (the query path's
    fallback), including the mixed-dir case where appended files carry gen
    but legacy files don't."""
    import os

    import pyarrow.dataset as ds
    import pyarrow.parquet as pq

    from search_engine_spark.index import IndexPaths
    from search_engine_spark.query import SearchIndex
    from search_engine_spark.update import add_documents, delete_documents

    paths = IndexPaths(small_index)
    for p in (paths.docs, paths.doc_stats):
        t = ds.dataset(p, format="parquet").to_table()
        if "gen" in t.column_names:
            t = t.drop_columns(["gen"])
        shutil.rmtree(p)
        os.makedirs(p)
        pq.write_table(t, os.path.join(p, "part-00000.parquet"))

    delete_documents(spark, small_index, ["c"])
    add_documents(spark, small_index, spark.createDataFrame(
        pd.DataFrame([("e", "banana smoothie recipe", "fr")],
                     columns=["url", "text", "lang"])))
    ix = SearchIndex(spark, small_index)
    assert "c" not in [p for p, _ in _pk_results(ix, "window aggregate")]
    assert [p for p, _ in _pk_results(ix, "banana")] == ["e"]
    assert _pk_results(ix, "spark query", mode="wand") == _pk_results(
        ix, "spark query", mode="exhaustive")
