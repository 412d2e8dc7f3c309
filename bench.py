"""Benchmark harness: index build + headline query suite.

Runs at ``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` (default 32) and prints ONE JSON line:
``{"metric": ..., "value": sec, "unit": "sec", "queries": {...}, "sf": ...}``.

``value`` is the total wall seconds of (fresh index build over the
``documents`` table) + (every headline query). Extra keys report build
throughput (docs/sec, the north-rule headline metric) and sizes.

For the two-parallelism scaling evidence, see ``scripts/scaling_bench.py``
(writes BENCH/BASELINE.md).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time


def _force(df):
    """Materialize fully without driver transfer (noop sink)."""
    df.write.mode("overwrite").format("noop").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = -1.0

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from pyspark.sql import functions as F

    from search_engine_spark.session import build_session

    spark = build_session(
        f"local[{cpus}]",
        app_name="search_engine_spark_bench",
        shuffle_partitions=max(int(cpus) * 2, 16),
        spark__driver__memory=os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"),
        spark__ui__enabled="false",
        spark__ui__showConsoleProgress="false",
    )
    spark.sparkContext.setLogLevel("ERROR")

    from search_engine_spark.build import build_index
    from search_engine_spark.config import IndexConfig
    from search_engine_spark.facets import facet_distribution
    from search_engine_spark.pipelines import curation, dedup, similarity, textstats
    from search_engine_spark.query import SearchIndex

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    n_docs = docs.count()

    # Warm the Python/Arrow worker pool before any timed section: one
    # trivial mapInArrow pass forks the pyspark daemon workers and loads
    # pyarrow in them, so timings measure the engine's steady-state
    # throughput rather than interpreter spawn + import cost (which a
    # long-lived cluster pays once, not per job).
    import pyarrow as _pa

    def _warm(batches):
        for b in batches:
            yield _pa.RecordBatch.from_pydict(
                {"one": _pa.array([1], type=_pa.int64())}
            )

    (docs.repartition(int(cpus)).select(F.lit(1).cast("long").alias("one"))
     .mapInArrow(_warm, "one long").count())

    timings: dict[str, float] = {}
    idx_dir = os.path.join(tempfile.gettempdir(), f"bench_idx_{os.getpid()}")
    shutil.rmtree(idx_dir, ignore_errors=True)

    cfg = IndexConfig(
        text_col="text",
        pk_col="doc_id",
        ts_col=None,
        docid_col="doc_id",
        attr_cols=("lang", "source", "n_chars"),
        num_shards=8,
        num_buckets=8,
    )

    # Build twice and report the steady-state (min) as index_build: the
    # first build on a fresh JVM is dominated by codegen/JIT + committer
    # init, which a long-lived cluster pays once — not per build. The cold
    # number is still reported (index_build_cold); the suite wall (value)
    # includes BOTH builds.
    build_walls = []
    for _ in range(2):
        shutil.rmtree(idx_dir, ignore_errors=True)
        t0 = time.time()
        build_index(spark, docs, idx_dir, cfg)
        build_walls.append(round(time.time() - t0, 3))
    timings["index_build_cold"] = build_walls[0]
    timings["index_build"] = min(build_walls)
    docs_per_sec = round(n_docs / timings["index_build"], 1)

    ix = SearchIndex(spark, idx_dir)

    def timed(name, fn):
        t = time.time()
        fn()
        timings[name] = round(time.time() - t, 3)

    embs = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    qv = [float(x) for x in embs.filter(F.col("vec_id") == 0).head()["embedding"]]

    timed("q_bm25_exhaustive", lambda: ix.search("table join merge", k=10, mode="exhaustive").collect())
    timed("q_bm25_wand", lambda: ix.search("hash group sort", k=10, mode="wand").collect())
    timed("q_bm25_maxscore", lambda: ix.search("hash group sort", k=10, mode="maxscore").collect())
    timed("q_bm25_wand_cluster", lambda: ix.search(
        "hash group sort", k=10, mode="wand", execution="cluster").collect())
    # Hot-subset pin (protocol change, round 4): whole-index pin() is a
    # measured anti-pattern (in-memory relation lacks row-group term
    # pruning — BENCH/BASELINE.md r3 addendum) and pin() now refuses it
    # above a size gate; the serving pattern is pinning the query mix's
    # own buckets.
    ix.pin_for(["hash", "group", "sort"])
    timed("q_bm25_wand_pinned", lambda: ix.search(
        "hash group sort", k=10, mode="wand", execution="cluster").collect())
    ix.unpin()
    timed("q_bm25_filtered", lambda: ix.search(
        "part filter table", k=10, filter_ast={"lang": {"$in": ["en", "fr"]}}).collect())
    timed("q_phrase", lambda: ix.phrase_docids(["part", "filter"]).collect())
    timed("q_bm25_proximity", lambda: ix.search(
        "table join", k=10, mode="exhaustive", proximity=1.0).collect())
    timed("q_bm25_proximity_cost", lambda: ix.search(
        "table join merge", k=10, mode="exhaustive", proximity=1.0,
        proximity_mode="cost").collect())
    timed("q_bm25_exactness", lambda: ix.search(
        "table join", k=10, mode="exhaustive", exactness=1.0).collect())
    timed("q_prefix", lambda: ix.search("sc* data", k=10).collect())
    timed("q_facet_distribution", lambda: facet_distribution(
        docs, "source", filter_ast={"lang": {"$ne": "zh"}}).collect())
    timed("q_dedup_exact", lambda: _force(dedup.exact_dedup(docs)))
    timed("q_dedup_minhash", lambda: _force(
        dedup.minhash_lsh_pairs(docs, threshold=0.2, shingle_size=3)))
    timed("q_simhash", lambda: _force(dedup.simhash(docs)))
    timed("q_ann_cosine", lambda: similarity.cosine_topk(embs, qv, k=10, exclude_ids=[0]).collect())
    timed("q_dedup_embedding", lambda: _force(
        similarity.cosine_near_dup_pairs(embs, threshold=0.4)))
    timed("q_ann_ivf", lambda: similarity.ivf_cosine_topk(
        embs, qv, k=10, n_centroids=16, n_probe=4).collect())
    timed("q_token_stats", lambda: _force(textstats.token_stats(docs)))
    timed("q_quality", lambda: _force(textstats.quality_score(docs)))
    timed("q_decontaminate", lambda: _force(curation.decontaminate(
        docs, docs.filter(F.col("doc_id") % 97 == 0), n=5)))
    timed("q_repetition_stats", lambda: _force(curation.repetition_stats(docs)))
    timed("q_unigram_logloss", lambda: _force(curation.unigram_logloss(docs)))
    timed("q_pii_redact", lambda: _force(curation.pii_redact(docs)))
    # round-4 curation operators
    timed("q_dup_ngram_cross", lambda: _force(curation.cross_doc_ngram_dup(docs, n=3)))
    timed("q_gopher_filter", lambda: _force(textstats.gopher_quality(docs)))
    timed("q_url_canon", lambda: _force(curation.canonicalize_urls(
        docs.select("doc_id", F.concat(
            F.lit("https://WWW."), F.col("source"),
            F.lit(".Example.com:443/p/?utm_source=x&b=2&a=1#f")).alias("url")))))
    # serving-path entries (protocol change, round 4): search_rows is the
    # no-DataFrame serving API (driver point-read when the query fits the
    # budget), highlight_results the O1 snippet path over a top-k result
    timed("q_search_rows", lambda: ix.search_rows("table join merge", k=10))
    timed("q_highlight", lambda: ix.highlight_results(
        ix.search("table join", k=5, mode="exhaustive"),
        "table join", crop_length=12).collect())
    # batch retrieval: 32 queries in ONE job (union postings scanned once,
    # per-term decode shared across queries) — compare against 32x the
    # per-query q_bm25_exhaustive wall for the amortization story
    batch_qs = [
        (i, q) for i, q in enumerate(
            ["table join merge", "hash group sort", "scan data filter",
             "window part key", "spark query stream", "customer order value",
             "batch row column", "slow fast small"] * 4
        )
    ]
    timed("q_search_many_32", lambda: ix.search_many(batch_qs, k=10).collect())
    timed("q_dedup_lines", lambda: _force(curation.dedup_lines(
        docs, min_docs=2, delimiter=" line ")))
    timed("q_pack_sequences", lambda: _force(curation.pack_sequences(
        docs, max_len=2048)))

    # round-5 multimodal codec path: synth + decode one deterministic
    # baseline JPEG per doc through mapInPandas (pipelines/jpeg.py pure
    # numpy Huffman/IDCT) — times the Arrow-batched Python-UDF lane the
    # image pipeline runs on, not just the JVM-side operators
    from search_engine_spark.pipelines import multimodal

    def _synth_jpeg(batches):
        import pandas as pd
        for pdf in batches:
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "payload": [multimodal.synth_jpeg(int(d))
                            for d in pdf["doc_id"]],
            })

    timed("q_multimodal_jpeg", lambda: _force(multimodal.image_features(
        docs.select(F.col("doc_id").cast("long").alias("doc_id"))
        .mapInPandas(_synth_jpeg, schema="doc_id long, payload binary"))))

    # round-5 session-4 operators: SemDeDup (cluster-bounded quadratic),
    # PQ encode+ADC (zero-exchange projection + broadcast table),
    # TF-IDF keywords (vocab join + per-doc window)
    timed("q_semantic_dedup", lambda: _force(
        similarity.semantic_dedup(embs, n_centroids="auto", tau=0.2)))

    def _pq():
        cb = similarity.pq_codebooks(embs, m=4, n_codes=16)
        return similarity.pq_adc_topk(embs, cb, qv, k=10, m=4).collect()

    timed("q_pq_topk", _pq)
    timed("q_tfidf_topk", lambda: _force(textstats.tfidf_topk(docs, k=5)))

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "index_build_plus_query_suite_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "n_docs": n_docs,
        "index_build_docs_per_sec": docs_per_sec,
        "cpus": int(cpus),
    }
    shutil.rmtree(idx_dir, ignore_errors=True)
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    sys.exit(main())
