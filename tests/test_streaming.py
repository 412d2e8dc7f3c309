"""Structured Streaming ingestion (streaming.index_stream): micro-batches
become segment generations; drain-and-stop with availableNow; compaction
threshold folds generations back to one."""

import json
import os
import shutil

import pandas as pd


def test_stream_ingest_into_index(spark, tmp_path):
    from search_engine_spark.build import build_index
    from search_engine_spark.config import IndexConfig
    from search_engine_spark.index import IndexPaths, read_meta
    from search_engine_spark.query import SearchIndex
    from search_engine_spark.streaming import index_stream

    # seed index
    cfg = IndexConfig(text_col="text", pk_col="url", ts_col=None,
                      attr_cols=("lang",), num_shards=2, num_buckets=2)
    idx = str(tmp_path / "idx")
    seed = pd.DataFrame([("s0", "alpha beta gamma", "en")],
                        columns=["url", "text", "lang"])
    build_index(spark, spark.createDataFrame(seed), idx, cfg)

    # a file-source stream: two json files = (at least) one micro-batch each
    src = str(tmp_path / "stream_src")
    os.makedirs(src)
    ckpt = str(tmp_path / "ckpt")
    rows1 = [{"url": "d1", "text": "delta epsilon", "lang": "en"}]
    rows2 = [{"url": "d2", "text": "zeta eta theta", "lang": "de"},
             {"url": "d3", "text": "delta theta", "lang": "en"}]
    with open(os.path.join(src, "a.json"), "w") as f:
        for r in rows1:
            f.write(json.dumps(r) + "\n")
    with open(os.path.join(src, "b.json"), "w") as f:
        for r in rows2:
            f.write(json.dumps(r) + "\n")

    stream = (
        spark.readStream.schema("url string, text string, lang string")
        .option("maxFilesPerTrigger", 1)
        .json(src)
    )
    q = index_stream(stream, idx, ckpt, compact_every=100,
                     trigger_available_now=True)
    q.awaitTermination(120)

    meta = read_meta(IndexPaths(idx))
    assert meta["n_docs"] == 4
    assert len(meta["generations"]) >= 2  # seed + >=1 streamed generation

    ix = SearchIndex(spark, idx)
    assert [p for p, _ in ((r["pk"], r["score"])
            for r in ix.search("epsilon", k=5).collect())] == ["d1"]
    hits = {r["pk"] for r in ix.search("theta", k=5).collect()}
    assert hits == {"d2", "d3"}
    # exactly-once under restart: re-running the drained stream adds nothing
    q2 = index_stream(stream, idx, ckpt, trigger_available_now=True)
    q2.awaitTermination(120)
    assert read_meta(IndexPaths(idx))["n_docs"] == 4

    shutil.rmtree(ckpt, ignore_errors=True)


def test_dedup_stream_drops_cross_batch_duplicates(spark, tmp_path):
    from search_engine_spark.streaming import dedup_stream

    src = str(tmp_path / "dsrc")
    os.makedirs(src)
    # same content "dup text" appears in batch 1 (d1, d9) and batch 2 (d5):
    # only the min-id row of the first batch survives
    with open(os.path.join(src, "a.json"), "w") as f:
        for r in [{"url": "d9", "text": "dup text"},
                  {"url": "d1", "text": "dup text"},
                  {"url": "d2", "text": "unique one"}]:
            f.write(json.dumps(r) + "\n")
    with open(os.path.join(src, "b.json"), "w") as f:
        for r in [{"url": "d5", "text": "dup text"},
                  {"url": "d6", "text": "unique two"}]:
            f.write(json.dumps(r) + "\n")

    stream = (
        spark.readStream.schema("url string, text string")
        .option("maxFilesPerTrigger", 1)
        .json(src)
    )
    q = (
        dedup_stream(stream, text_col="text", id_col="url")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_out")
        .option("checkpointLocation", str(tmp_path / "dckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = {r["url"]: r["text"] for r in spark.sql("select * from dedup_out").collect()}
    assert rows == {"d1": "dup text", "d2": "unique one", "d6": "unique two"}


def test_decontaminate_stream_matches_batch(spark, tmp_path):
    from search_engine_spark.pipelines.curation import decontaminate
    from search_engine_spark.streaming import decontaminate_stream

    rows = [
        {"doc_id": 0, "text": "the quick brown fox jumps over the lazy dog"},
        {"doc_id": 1, "text": "the quick brown fox jumps over the lazy dog"},
        {"doc_id": 2, "text": "the quick brown fox jumps over a lazy dog"},
        {"doc_id": 3, "text": "completely different text about spark"},
    ]
    src = str(tmp_path / "csrc")
    os.makedirs(src)
    # two micro-batches; per-doc counts must be identical to batch
    with open(os.path.join(src, "a.json"), "w") as f:
        for r in rows[:2]:
            f.write(json.dumps(r) + "\n")
    with open(os.path.join(src, "b.json"), "w") as f:
        for r in rows[2:]:
            f.write(json.dumps(r) + "\n")

    static = spark.createDataFrame(
        [(r["doc_id"], r["text"]) for r in rows], "doc_id long, text string"
    )
    probes = static.filter("doc_id = 0")
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .json(src)
    )
    q = (
        decontaminate_stream(stream, probes, n=3)
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("decon_out")
        .option("checkpointLocation", str(tmp_path / "cckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r["doc_id"]: r["n_hits"]
           for r in spark.sql("select * from decon_out").collect()}
    want = {r["doc_id"]: r["n_hits"]
            for r in decontaminate(static, probes, n=3).collect()}
    assert got == want == {0: 7, 1: 7, 2: 4}


def test_windowed_term_counts_watermark(spark, tmp_path):
    from search_engine_spark.streaming import windowed_term_counts

    src = str(tmp_path / "wsrc")
    os.makedirs(src)
    with open(os.path.join(src, "a.json"), "w") as f:
        for r in [
            {"warc_ts": "2026-01-01T00:10:00Z", "text": "alpha beta alpha"},
            {"warc_ts": "2026-01-01T00:40:00Z", "text": "beta"},
            {"warc_ts": "2026-01-01T01:20:00Z", "text": "alpha"},
            # late enough to close the 00:00 window under the 2h watermark
            {"warc_ts": "2026-01-01T09:00:00Z", "text": "gamma"},
        ]:
            f.write(json.dumps(r) + "\n")

    stream = (
        spark.readStream.schema("warc_ts timestamp, text string").json(src)
    )
    q = (
        windowed_term_counts(stream, ts_col="warc_ts", window="1 hour",
                             watermark="2 hours")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("wtc_out")
        .option("checkpointLocation", str(tmp_path / "wckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (str(r["window_start"]), r["term"]): r["n"]
        for r in spark.sql("select * from wtc_out").collect()
    }
    # finalized hour-0 and hour-1 windows (watermark passed them)
    assert got[("2026-01-01 00:00:00", "alpha")] == 2
    assert got[("2026-01-01 00:00:00", "beta")] == 2
    assert got[("2026-01-01 01:00:00", "alpha")] == 1
