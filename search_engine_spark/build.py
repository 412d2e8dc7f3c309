"""Distributed inverted-index build (SURVEY.md §2.2/§2.4 rebuilt Spark-first).

Pipeline (each stage checkpointed, see ``index.py``):

1. ``docs``      — last-write-wins dedupe by primary key (reference
   ``Transform::read_documents`` + ``ReplaceDocuments``,
   ``src/update/index_documents/transform.rs:107-360``) and deterministic
   docid assignment: docid = global rank of pk, computed with a scalable
   two-pass range-sort (never ``monotonically_increasing_id`` — docids must
   be identical at any parallelism).
2. ``extract``   — Arrow-batched ``mapInPandas`` tokenization (reference P1,
   ``extract_docid_word_positions.rs:26-127``) emitting one row per
   (docid, term): tf, sorted positions, dl. Per-doc aggregation happens
   inside the UDF, so the ONLY shuffle in the whole build is the
   repartition-by-(term, shard) in stage 5. Output is spilled to parquet
   partitioned by term-bucket — this is the per-partition extraction
   checkpoint.
3. ``doc_stats`` — (docid, pk, dl, attrs) + scalars N/avgdl (reference P4
   generalized to exact doc lengths — the data BM25 needs and the reference
   discards).
4. ``terms``     — global dictionary (term, term_id, df, cf, max_tf)
   (reference words FST, ``src/index.rs:56``). df is computed globally
   BEFORE sharding, so BM25 idf is exact regardless of salting.
5. ``postings``  — per term-bucket: ``groupBy(term, shard).applyInPandas``
   encodes sorted-docid delta+varint blocks with block-max metadata
   (reference P2 ``extract_word_docids.rs`` + codec
   ``cbo_roaring_bitmap_codec.rs`` replaced per the north rule).
   ``shard = docid % num_shards`` is the skew salt: a head term's postings
   split into num_shards bounded groups, and query-time scoring is
   document-partitioned (per-shard top-k + global merge).
6. ``finalize``  — meta.json commit (the "snapshot publish").
"""

from __future__ import annotations

import os
import threading
import time
import uuid
import zlib
from concurrent.futures import ThreadPoolExecutor
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from search_engine_spark.analysis import tokenize_with_positions
from search_engine_spark.codecs import encode_postings
from search_engine_spark.config import IndexConfig
from search_engine_spark.index import (
    CheckpointLog,
    IndexPaths,
    parquet_dir_column_sums,
    parquet_dir_rows,
    read_meta,
    staged_write,
    write_meta,
)

POSTINGS_SCHEMA = (
    "bucket int, term string, shard int, n_docs int, "
    "docs binary, tfs binary, dls binary, poss binary, "
    "block_meta array<struct<first_docid:long, max_docid:long, max_impact:double, "
    "doc_off:long, tf_off:long, dl_off:long, pos_off:long>>"
)

TERM_DOC_SCHEMA = (
    "bucket int, term string, shard int, docid long, tf int, dl int, positions array<int>"
)
TERM_DOC_SCHEMA_NOPOS = (
    "bucket int, term string, shard int, docid long, tf int, dl int"
)


def term_doc_schema(config: "IndexConfig") -> str:
    return TERM_DOC_SCHEMA if config.store_positions else TERM_DOC_SCHEMA_NOPOS


def assign_docids(
    df: DataFrame, pk_col: str, n_parts: int = 32, return_count: bool = False
):
    """docid = global 0-based rank of pk. Scalable two-pass: range-sort, count
    rows per physical partition, broadcast offsets, rank within partition.

    Deterministic for unique pks at any parallelism: ranks depend only on the
    total order of pk, not on where partition boundaries land. The sorted df
    is persisted so the count pass and the rank pass see the same partitions.

    ``return_count=True`` also returns the total row count (free by-product
    of the offsets pass — saves callers a separate count job).
    """
    d = df.repartitionByRange(n_parts, F.col(pk_col)).sortWithinPartitions(pk_col)
    d = d.withColumn("_pid", F.spark_partition_id())
    d.persist()
    counts = {r["_pid"]: r["cnt"] for r in d.groupBy("_pid").agg(F.count("*").alias("cnt")).collect()}
    offsets = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    spark = df.sparkSession
    off_df = spark.createDataFrame(
        [(int(p), int(o)) for p, o in offsets.items()] or [(0, 0)], "_pid int, _offset long"
    )
    w = Window.partitionBy("_pid").orderBy(pk_col)
    out = (
        d.join(F.broadcast(off_df), "_pid")
        .withColumn("docid", F.row_number().over(w) + F.col("_offset") - F.lit(1))
        .drop("_pid", "_offset")
    )
    # persist released by caller via unpersist/clearCache after materializing
    return (out, acc) if return_count else out


def _dedupe_last_write_wins(df: DataFrame, pk_col: str, ts_col: str | None) -> DataFrame:
    if ts_col and ts_col in df.columns:
        w = Window.partitionBy(pk_col).orderBy(F.col(ts_col).desc())
        return df.withColumn("_rn", F.row_number().over(w)).filter("_rn = 1").drop("_rn")
    return df.dropDuplicates([pk_col])


def make_extract_fn(config: IndexConfig):
    """mapInPandas extractor: (docid, text) batches -> per-(docid, term) rows.

    The tokenizer is the frozen per-doc Python function shared with the
    oracle (the byte-identical per-url invariant); EVERYTHING after it is
    vectorized — term interning via ``pd.factorize`` (C), per-(doc, term)
    tf via ``np.unique`` on a combined key, bucket hashes computed once per
    distinct term per batch instead of once per posting. The output columns
    are numpy arrays end-to-end (a 300k-doc corpus emits ~66M rows; per-row
    Python list appends here previously dominated the whole build).
    """
    num_shards = config.num_shards
    num_buckets = config.num_buckets
    store_positions = config.store_positions

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            doc_ids = pdf["docid"].to_numpy(dtype=np.int64)
            texts = pdf["text"].to_numpy()
            tokens_flat: list[str] = []
            pos_flat: list[int] = []
            lengths = np.zeros(len(doc_ids), dtype=np.int64)
            for i, text in enumerate(texts):
                toks = tokenize_with_positions(text if isinstance(text, str) else "")
                lengths[i] = len(toks)
                for t, p in toks:
                    tokens_flat.append(t)
                    pos_flat.append(p)
            if not tokens_flat:
                yield _empty_term_doc(store_positions)
                continue

            doc_idx = np.repeat(np.arange(len(doc_ids)), lengths)
            codes, uniques = pd.factorize(np.asarray(tokens_flat, dtype=object))
            n_uniq = len(uniques)
            key = doc_idx * n_uniq + codes

            if store_positions:
                pos_arr = np.asarray(pos_flat, dtype=np.int64)
                order = np.lexsort((pos_arr, key))
                key_sorted = key[order]
                uniq_keys, first_idx, tf = np.unique(
                    key_sorted, return_index=True, return_counts=True
                )
                pos_sorted = pos_arr[order]
                positions = np.split(pos_sorted, np.cumsum(tf)[:-1])
            else:
                uniq_keys, tf = np.unique(key, return_counts=True)
                positions = None

            row_doc_idx = uniq_keys // n_uniq
            row_code = (uniq_keys % n_uniq).astype(np.int64)
            bucket_u = np.fromiter(
                (zlib.crc32(t.encode("utf-8")) % num_buckets for t in uniques),
                dtype=np.int32,
                count=n_uniq,
            )
            out = {
                "bucket": pd.Series(bucket_u[row_code], dtype="int32"),
                "term": pd.Series(np.asarray(uniques, dtype=object)[row_code]),
                "shard": pd.Series(
                    (doc_ids[row_doc_idx] % num_shards).astype(np.int32), dtype="int32"
                ),
                "docid": pd.Series(doc_ids[row_doc_idx], dtype="int64"),
                "tf": pd.Series(tf.astype(np.int32), dtype="int32"),
                "dl": pd.Series(lengths[row_doc_idx].astype(np.int32), dtype="int32"),
            }
            if store_positions:
                out["positions"] = pd.Series(list(positions), dtype="object")
            yield pd.DataFrame(out)

    return extract


def _empty_term_doc(store_positions: bool) -> pd.DataFrame:
    cols = {
        "bucket": pd.Series([], dtype="int32"),
        "term": pd.Series([], dtype="object"),
        "shard": pd.Series([], dtype="int32"),
        "docid": pd.Series([], dtype="int64"),
        "tf": pd.Series([], dtype="int32"),
        "dl": pd.Series([], dtype="int32"),
    }
    if store_positions:
        cols["positions"] = pd.Series([], dtype="object")
    return pd.DataFrame(cols)


def make_encode_fn(config: IndexConfig, avgdl: float):
    """applyInPandas encoder for one shard group -> one segment row per term.

    Grouping by shard (not (term, shard)) keeps the number of pandas groups
    at num_buckets * num_shards — coarse enough that per-group UDF overhead
    is negligible, fine enough that every core stays busy. The per-term
    slicing happens vectorized inside (sort + boundary scan), which is the
    grenad-sorter analogue (reference P9, ``helpers/grenad_helpers.rs:34-57``)
    done by numpy instead of an external k-way merge. Memory per group =
    total postings / (num_buckets * num_shards) — the scale knob.
    """
    block_size = config.block_size
    store_positions = config.store_positions
    k1, b = config.k1, config.b
    num_buckets = config.num_buckets

    def encode(pdf: pd.DataFrame) -> pd.DataFrame:
        cols = {
            "bucket": pd.Series([], dtype="int32"),
            "term": pd.Series([], dtype="object"),
            "shard": pd.Series([], dtype="int32"),
            "n_docs": pd.Series([], dtype="int32"),
            "docs": pd.Series([], dtype="object"),
            "tfs": pd.Series([], dtype="object"),
            "dls": pd.Series([], dtype="object"),
            "poss": pd.Series([], dtype="object"),
            "block_meta": pd.Series([], dtype="object"),
        }
        if len(pdf) == 0:
            return pd.DataFrame(cols)
        pdf = pdf.sort_values(["term", "docid"], kind="mergesort")
        terms_arr = pdf["term"].to_numpy()
        docids_all = pdf["docid"].to_numpy(dtype=np.int64)
        tfs_all = pdf["tf"].to_numpy(dtype=np.int64)
        dls_all = pdf["dl"].to_numpy(dtype=np.int64)
        poss_all = pdf["positions"].to_numpy() if store_positions else None
        shard = int(pdf["shard"].iloc[0])

        bounds = np.flatnonzero(terms_arr[1:] != terms_arr[:-1]) + 1
        starts = np.concatenate(([0], bounds))
        ends = np.concatenate((bounds, [len(terms_arr)]))

        out = {k: [] for k in cols}
        for s, e in zip(starts, ends):
            term = terms_arr[s]
            positions = (
                [np.asarray(p, dtype=np.int64) for p in poss_all[s:e]]
                if store_positions
                else None
            )
            enc = encode_postings(
                docids_all[s:e], tfs_all[s:e], dls_all[s:e], positions,
                block_size=block_size, avgdl=avgdl, k1=k1, b=b,
            )
            out["bucket"].append(zlib.crc32(term.encode()) % num_buckets)
            out["term"].append(term)
            out["shard"].append(shard)
            out["n_docs"].append(enc.n_docs)
            out["docs"].append(enc.docs)
            out["tfs"].append(enc.tfs)
            out["dls"].append(enc.dls)
            out["poss"].append(enc.poss)
            out["block_meta"].append(enc.block_meta_rows())
        return pd.DataFrame(
            {
                "bucket": pd.Series(out["bucket"], dtype="int32"),
                "term": out["term"],
                "shard": pd.Series(out["shard"], dtype="int32"),
                "n_docs": pd.Series(out["n_docs"], dtype="int32"),
                "docs": out["docs"],
                "tfs": out["tfs"],
                "dls": out["dls"],
                "poss": out["poss"],
                "block_meta": out["block_meta"],
            }
        )

    return encode


class BuildError(RuntimeError):
    pass


def build_index(
    spark: SparkSession,
    pages: DataFrame,
    index_dir: str,
    config: IndexConfig | None = None,
    *,
    fail_after: str | None = None,
    build_id: str | None = None,
) -> dict:
    """Build (or resume) an index at ``index_dir``. Returns the meta dict.

    ``fail_after='<stage>'`` injects a failure right after that stage commits
    (kill-and-resume test harness). A resumed build skips every stage whose
    checkpoint manifest exists — per bucket for the postings stage.
    """
    config = config or IndexConfig()
    paths = IndexPaths(index_dir)
    paths.ensure()
    build_id = build_id or uuid.uuid4().hex[:12]
    log = CheckpointLog(paths, build_id)
    metrics_rows: list[dict] = []

    def maybe_fail(stage: str):
        if fail_after == stage:
            raise BuildError(f"injected failure after stage {stage!r}")

    # ---- stage 1: docs (dedupe + docid assignment) --------------------
    if not log.done("docs"):
        t0 = time.time()
        # project before any shuffle: html & co. never enter the dedupe or
        # rank exchanges (at CC scale the raw html dominates row size)
        keep = [config.pk_col, config.text_col, *config.attr_cols]
        for extra in (config.ts_col, config.docid_col):
            if extra and extra not in keep:
                keep.append(extra)
        deduped = _dedupe_last_write_wins(
            pages.select(*keep), config.pk_col, config.ts_col
        )
        n_docs = None
        if config.docid_col:
            docs = deduped.withColumn("docid", F.col(config.docid_col).cast("long"))
        else:
            # rank the slim pk projection, hash-join docids back: the global
            # range-sort (sampling pass + sort shuffle) only ever moves pks
            ids, n_docs = assign_docids(
                deduped.select(config.pk_col), config.pk_col, return_count=True
            )
            docs = deduped.join(ids, config.pk_col)
        docs = docs.select(
            "docid", F.col(config.pk_col).alias("pk"), F.col(config.text_col).alias("text"),
            *[F.col(c) for c in config.attr_cols],
        )
        staging, commit = staged_write(paths.docs)
        docs.write.mode("overwrite").parquet(staging)
        commit()
        spark.catalog.clearCache()
        if n_docs is None:
            n_docs = parquet_dir_rows(paths.docs)
        log.commit("docs", inputs={"source": "caller DataFrame"},
                   metrics={"n_docs": int(n_docs)}, wall_s=time.time() - t0)
    maybe_fail("docs")
    n_docs = log.read("docs")["metrics"]["n_docs"]

    docs_df = spark.read.parquet(paths.docs)

    # ---- stage 2: extract (tokenize -> term_doc spill) -----------------
    if not log.done("extract"):
        t0 = time.time()
        # Partition count must track cores, NOT the input file layout: the
        # docs snapshot is many small files that FileScan coalesces into a
        # handful of 128MB-target partitions, which would cap tokenization
        # at that parallelism no matter the cluster size.
        n_extract = config.extract_partitions or max(
            spark.sparkContext.defaultParallelism * 2, 8
        )
        extracted = (
            docs_df.select("docid", "text")
            .repartition(n_extract)
            .mapInPandas(make_extract_fn(config), schema=term_doc_schema(config))
        )
        os.makedirs(paths.term_doc, exist_ok=True)
        staging, commit = staged_write(paths.gen_dir(paths.term_doc, 0))
        extracted.write.mode("overwrite").partitionBy("bucket").parquet(staging)
        commit()
        n_postings = parquet_dir_rows(paths.term_doc)
        log.commit("extract", inputs={"docs": n_docs},
                   metrics={"n_term_doc_rows": n_postings}, wall_s=time.time() - t0)
    maybe_fail("extract")

    term_doc = spark.read.parquet(paths.term_doc)

    # ---- stage 3: doc_stats + scalars ----------------------------------
    if not log.done("doc_stats"):
        t0 = time.time()
        dl_df = term_doc.groupBy("docid").agg(F.first("dl").alias("dl"))
        stats = (
            docs_df.select("docid", "pk", *config.attr_cols)
            .join(dl_df, "docid", "left")
            .withColumn("dl", F.coalesce(F.col("dl"), F.lit(0)).cast("int"))
        )
        staging, commit = staged_write(paths.doc_stats)
        stats.write.mode("overwrite").parquet(staging)
        commit()
        agg = parquet_dir_column_sums(paths.doc_stats, int_cols=("dl",))
        avgdl = agg["dl"] / agg["rows"] if agg["rows"] else 0.0
        log.commit("doc_stats", inputs={"docs": n_docs},
                   metrics={"n_docs": agg["rows"], "total_dl": agg["dl"],
                            "avgdl": avgdl},
                   wall_s=time.time() - t0)
    maybe_fail("doc_stats")
    ds_meta = log.read("doc_stats")["metrics"]
    avgdl = ds_meta["avgdl"]

    # ---- stage 4: terms dictionary --------------------------------------
    if not log.done("terms"):
        t0 = time.time()
        terms = term_doc.groupBy("term").agg(
            F.count("*").alias("df"),
            F.sum("tf").alias("cf"),
            F.max("tf").alias("max_tf"),
        )
        # term_id = rank in term order. The dictionary is orders of magnitude
        # smaller than the corpus (the reference holds its whole words FST in
        # memory, src/index.rs:56), so a single-task global window is the
        # right cost/complexity point up to ~10M terms; beyond that, switch
        # to assign_docids(terms, "term") (scalable two-pass rank).
        w = Window.orderBy("term")
        terms = terms.withColumn("term_id", F.row_number().over(w) - F.lit(1))
        os.makedirs(paths.terms, exist_ok=True)
        staging, commit = staged_write(paths.gen_dir(paths.terms, 0))
        terms.select("term", "term_id", "df", "cf", "max_tf").write.mode(
            "overwrite"
        ).parquet(staging)
        commit()
        n_terms = parquet_dir_rows(paths.terms)
        log.commit("terms", inputs={"term_doc": "extract"},
                   metrics={"n_terms": n_terms}, wall_s=time.time() - t0)
    maybe_fail("terms")

    # ---- stage 5: postings segments, per bucket --------------------------
    # Buckets are independent jobs with independent staging dirs + manifests
    # (per-partition checkpoint granularity: a killed build re-runs only the
    # buckets without a manifest). They are SUBMITTED concurrently — Spark's
    # scheduler interleaves their tasks, so stragglers in one bucket don't
    # serialize the others and wall time ~ max(bucket) not sum(bucket).
    encode_fn = make_encode_fn(config, avgdl)
    os.makedirs(paths.gen_dir(paths.postings, 0), exist_ok=True)

    def run_bucket(b: int) -> None:
        stage = f"postings:bucket={b}"
        if log.done(stage):
            return
        t0 = time.time()
        td_b = term_doc.filter(F.col("bucket") == b)
        seg = td_b.groupBy("shard").applyInPandas(encode_fn, schema=POSTINGS_SCHEMA)
        bucket_dir = os.path.join(paths.gen_dir(paths.postings, 0), f"bucket={b}")
        staging, commit = staged_write(bucket_dir)
        seg.drop("bucket").write.mode("overwrite").parquet(staging)
        commit()
        m = parquet_dir_column_sums(
            bucket_dir, int_cols=("n_docs",),
            binary_size_cols=("docs", "tfs", "dls", "poss"),
        )
        metrics = {
            "segments_merged": m["rows"],
            "postings_emitted": m["n_docs"],
            "bytes_compressed": m["docs_bytes"] + m["tfs_bytes"]
            + m["dls_bytes"] + m["poss_bytes"],
        }
        with metrics_lock:
            metrics_rows.append({"stage": stage, "build_id": build_id, **metrics})
        log.commit(stage, inputs={"term_doc_bucket": b, "avgdl": avgdl},
                   metrics=metrics, wall_s=time.time() - t0)
        maybe_fail(stage)

    metrics_lock = threading.Lock()
    pending = [b for b in range(config.num_buckets) if not log.done(f"postings:bucket={b}")]
    if pending:
        # Pre-warm the Arrow python-worker pool with one tiny job: without
        # this, N cold bucket jobs launched together each pay worker spawn +
        # module import simultaneously (measured 6x slowdown per job).
        (
            term_doc.limit(64)
            .groupBy("shard")
            .applyInPandas(encode_fn, schema=POSTINGS_SCHEMA)
            .write.mode("overwrite")
            .format("noop")
            .save()
        )
    with ThreadPoolExecutor(max_workers=config.num_buckets) as pool:
        futures = [pool.submit(run_bucket, b) for b in range(config.num_buckets)]
        errs = [f.exception() for f in futures]
    for e in errs:
        if e is not None:
            raise e
    maybe_fail("postings")

    # ---- stage 6: finalize ----------------------------------------------
    from search_engine_spark.index import parquet_dir_column_max

    scalars = {
        "n_docs": int(ds_meta["n_docs"]),
        "avgdl": float(avgdl),
        "total_dl": int(ds_meta["total_dl"]),
        "n_terms": int(log.read("terms")["metrics"]["n_terms"]),
        "build_id": build_id,
        "max_docid": int(parquet_dir_column_max(paths.doc_stats, "docid") or -1),
        "n_deleted": 0,
        # per-generation avgdl used at encode time: query-side WAND scales
        # block-max bounds by max(1, query_avgdl / encode_avgdl) so pruning
        # stays admissible after appends shift the live avgdl
        "generations": {"0": {"avgdl": float(avgdl), "n_docs": int(ds_meta["n_docs"])}},
    }
    write_meta(paths, config, scalars)
    if metrics_rows:
        import json

        with open(os.path.join(paths.metrics, f"build-{build_id}.jsonl"), "a") as f:
            for r in metrics_rows:
                f.write(json.dumps(r) + "\n")
    if not log.done("finalize"):
        log.commit("finalize", inputs={"stages": "all"}, metrics=scalars, wall_s=0.0)
    return read_meta(paths)
