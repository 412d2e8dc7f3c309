"""Incremental index maintenance: upserts, deletes, compaction.

The reference applies updates in place inside one LMDB write transaction —
every extracted key carries a Deletion/Addition side and bitmaps are merged
(``/root/reference/src/update/del_add.rs:1-125``,
``transform.rs:150-452``). A distributed rebuild wants immutable files, so
this module re-expresses the same semantics Lucene-style:

* ``add_documents``  — ``ReplaceDocuments`` upsert (reference
  ``transform.rs:107-110``): last-write-wins within the batch, existing
  docs with the same pk are tombstoned, the batch becomes a NEW segment
  generation (``gen=N`` under term_doc/terms/postings). Nothing existing
  is rewritten.
* ``delete_documents`` — tombstone by external id (reference
  ``Transform::remove_documents``, ``transform.rs:363-452``).
* ``compact``        — segment merge: rebuilds a single ``gen=0`` from the
  union of live term_doc rows (re-tokenization is NOT needed — term_doc is
  the extraction checkpoint), recomputes doc stats / dictionary / postings
  with fresh global avgdl, clears tombstones.

Query-time consequences (see ``query.py``):
* docids are disjoint across generations, so per-shard scoring just sees
  extra segment rows per term;
* tombstoned docids are filtered in the scorer;
* df (hence idf) still counts tombstoned docs until compaction — the same
  documented staleness Lucene accepts;
* block-max bounds from older generations are scaled by
  ``max(1, avgdl_now / avgdl_encode)`` so WAND pruning stays admissible.

Scale notes: each append shuffles ONLY the new batch (extract + one
postings job); tombstones append a docid list. Compaction is the only
full-data rewrite and reuses the spilled extraction, so its cost is the
shuffle+encode of live postings — no tokenization pass.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from search_engine_spark.build import (
    DL_BUCKET,
    POSTINGS_SCHEMA,
    _dedupe_last_write_wins,
    doc_lengths,
    make_encode_fn,
    make_extract_fn,
    terms_agg,
)
from search_engine_spark.config import (
    EXTRACTION_AFFECTING,
    IndexConfig,
    IndexSettings,
)
from search_engine_spark.index import (
    IndexPaths,
    read_meta,
    staged_write,
    write_meta,
)


def _load(spark: SparkSession, index_dir: str):
    paths = IndexPaths(index_dir)
    meta = read_meta(paths)
    return paths, meta, IndexConfig.from_dict(meta["config"])


def _next_gen(meta: dict) -> int:
    return max(int(g) for g in meta["generations"]) + 1


def add_documents(
    spark: SparkSession, index_dir: str, new_pages: DataFrame
) -> dict:
    """Upsert a batch (ReplaceDocuments semantics). Returns updated meta."""
    paths, meta, config = _load(spark, index_dir)
    gen = _next_gen(meta)

    search_cols = (
        [c for c, _w in config.field_cols] if config.field_cols
        else [config.text_col]
    )
    keep = list(dict.fromkeys(
        [config.pk_col, *search_cols, *config.attr_cols]
    ))
    # ts is only used for within-batch LWW ordering; merged batches from
    # update_documents don't carry it (falls back to dropDuplicates)
    has_ts = bool(config.ts_col) and config.ts_col in new_pages.columns
    if has_ts and config.ts_col not in keep:
        keep.append(config.ts_col)
    batch = _dedupe_last_write_wins(
        new_pages.select(*keep), config.pk_col,
        config.ts_col if has_ts else None,
    )

    # tombstone existing docids whose pk is being replaced
    existing = spark.read.parquet(paths.doc_stats).select("docid", "pk")
    tomb = existing.join(
        batch.select(F.col(config.pk_col).alias("pk")), "pk"
    ).select("docid")
    if config.docid_col:
        # externally-managed docids: a replacement would reuse the SAME docid
        # in a newer generation, and docid-level tombstones cannot tell the
        # generations apart. Until tombstones carry a generation horizon,
        # replacements require rank-assigned docids (docid_col=None).
        n_replaced = tomb.count()
        if n_replaced:
            raise ValueError(
                f"add_documents: {n_replaced} pks already exist and "
                "docid_col is set — replacements need docid_col=None "
                "(rank-assigned docids) or delete_documents + compact first"
            )
    _append_tombstones(spark, paths, tomb)

    # docids: externally managed when docid_col is set (same contract as
    # build_index); otherwise continue after the current max (stable across
    # cluster sizes: rank of pk within the batch, offset by max_docid)
    offset = int(meta["max_docid"]) + 1
    if config.docid_col:
        with_id = batch.withColumn("docid", F.col(config.docid_col).cast("long"))
    else:
        w = Window.orderBy(config.pk_col)  # batch-sized window; batches are
        # the small side of an append — for huge backfills use assign_docids
        with_id = batch.withColumn(
            "docid", (F.row_number().over(w) - 1 + F.lit(offset)).cast("long")
        )
    if config.field_cols:
        search_sel = [F.col(c).alias(c) for c, _w in config.field_cols]
        search_names = [c for c, _w in config.field_cols]
    else:
        search_sel = [F.col(config.text_col).alias("text")]
        search_names = ["text"]
    docs = with_id.select(
        "docid",
        F.col(config.pk_col).alias("pk"),
        *search_sel,
        *[F.col(c) for c in config.attr_cols if c not in search_names],
    )
    docs.write.mode("append").parquet(paths.docs)
    new_pks = docs.select("pk")
    docs_df = spark.read.parquet(paths.docs).join(new_pks, "pk").select(
        "docid", "pk", *search_names,
        *[c for c in config.attr_cols if c not in search_names]
    )
    # appended rows are the only ones with these (pk, docid) pairs — the old
    # versions of replaced pks share the pk; keep only the max docid per pk
    # (externally-managed docids replace in place, so dedupe is a no-op there)
    from pyspark.sql import Window as _W

    docs_df = (
        docs_df.withColumn(
            "_rn", F.row_number().over(_W.partitionBy("pk").orderBy(F.col("docid").desc()))
        )
        .filter("_rn = 1")
        .drop("_rn")
    )
    n_new = docs_df.count()

    # extract ONLY the new docs into term_doc/gen=N
    from search_engine_spark.build import term_doc_schema

    n_extract = config.extract_partitions or max(
        spark.sparkContext.defaultParallelism * 2, 8
    )
    extracted = (
        docs_df.select("docid", *[c for c, _ in config.searchable_fields()])
        .repartition(n_extract)
        .mapInArrow(make_extract_fn(config), schema=term_doc_schema(config))
    )
    staging, commit = staged_write(paths.gen_dir(paths.term_doc, gen))
    extracted.write.mode("overwrite").partitionBy("bucket").parquet(staging)
    commit()
    td_gen = spark.read.parquet(paths.gen_dir(paths.term_doc, gen))

    # doc_stats append for the new docs
    dl_df = doc_lengths(td_gen)
    stats = (
        docs_df.select("docid", "pk", *config.attr_cols)
        .join(dl_df, "docid", "left")
        .withColumn("dl", F.coalesce(F.col("dl"), F.lit(0)).cast("int"))
    )
    stats.write.mode("append").parquet(paths.doc_stats)

    # per-generation dictionary
    terms = terms_agg(td_gen)
    tw = Window.orderBy("term")
    terms = terms.withColumn("term_id", F.row_number().over(tw) - F.lit(1))
    staging, commit = staged_write(paths.gen_dir(paths.terms, gen))
    terms.select("term", "term_id", "df", "cf", "max_tf").write.mode(
        "overwrite"
    ).parquet(staging)
    commit()

    # live avgdl AFTER the append (tombstoned dls removed)
    n_live, avgdl, total_dl = _live_stats(spark, paths)

    # postings for the new generation, encoded with the fresh avgdl
    encode_fn = make_encode_fn(config, avgdl)
    seg = (
        td_gen.filter(F.col("bucket") != DL_BUCKET)
        .groupBy("shard")
        .applyInArrow(encode_fn, schema=POSTINGS_SCHEMA)
    )
    staging, commit = staged_write(paths.gen_dir(paths.postings, gen))
    seg.write.mode("overwrite").partitionBy("bucket").parquet(staging)
    commit()

    meta["generations"][str(gen)] = {"avgdl": float(avgdl), "n_docs": int(n_new)}
    meta.update(
        n_docs=int(n_live),
        avgdl=float(avgdl),
        total_dl=int(total_dl),
        max_docid=int(offset + n_new - 1),
        n_deleted=_n_deleted(spark, paths),
    )
    _rewrite_meta(paths, config, meta)
    return read_meta(paths)


def update_documents(
    spark: SparkSession, index_dir: str, partial: DataFrame
) -> dict:
    """``UpdateDocuments`` per-field merge (reference
    ``update/index_documents/helpers/merge_functions.rs:47-161`` +
    ``IndexDocumentsMethod::UpdateDocuments``, ``transform.rs:107-110``):
    each incoming row updates ONLY the fields it carries — fields absent
    from ``partial``'s schema (or NULL in a carried column) keep their
    stored values; pks not yet indexed insert the partial row as a new
    document. The merged full rows then flow through the ReplaceDocuments
    path (tombstone + new generation), so search/filters see the merge
    immediately.

    Deviation note: the reference distinguishes "field set to null" from
    "field absent" (obkv records carry explicit keys); a DataFrame column
    cannot, so NULL-in-a-carried-column means "keep old" here. To clear a
    field, use ``add_documents`` (replace) with the full document.

    ``partial`` must contain ``config.pk_col``; other columns must be a
    subset of the indexed schema (searchable fields + attr_cols, source
    names).
    """
    paths, meta, config = _load(spark, index_dir)

    # snapshot-name <-> source-name mapping (single-field snapshots store
    # text under the canonical name 'text')
    if config.field_cols:
        field_map = [(c, c) for c, _w in config.field_cols]
    else:
        field_map = [(config.text_col, "text")]
    snap_of = {src: dst for src, dst in field_map}
    attr_extra = [
        c for c in config.attr_cols if c not in {d for _, d in field_map}
    ]

    allowed = {config.pk_col, *snap_of, *attr_extra}
    unknown = set(partial.columns) - allowed
    if unknown:
        raise ValueError(
            f"update_documents: unknown columns {sorted(unknown)}; "
            f"indexed columns are {sorted(allowed)}"
        )
    if config.pk_col not in partial.columns:
        raise ValueError(f"update_documents: missing pk column {config.pk_col!r}")

    old = spark.read.parquet(paths.docs)
    deleted = _deleted_df(spark, paths)
    if deleted is not None:
        old = old.join(deleted, "docid", "left_anti")
    # live version per pk (replaced pks keep multiple rows across gens)
    old = (
        old.withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy("pk").orderBy(F.col("docid").desc())
            ),
        )
        .filter("_rn = 1")
        .drop("_rn", "docid")
    )

    new = partial.withColumnRenamed(config.pk_col, "pk")
    for src, dst in field_map:
        if src in new.columns and src != dst:
            new = new.withColumnRenamed(src, dst)
    upd_cols = set(new.columns) - {"pk"}

    merged_cols = []
    for c in old.columns:
        if c == "pk":
            continue
        if c in upd_cols:
            merged_cols.append(
                F.coalesce(new[c], old[c]).alias(c)
            )
        else:
            merged_cols.append(old[c].alias(c))
    # pks only in the update: left join keeps them with old.* = NULL
    merged = new.join(old, "pk", "left").select(F.col("pk"), *merged_cols)

    # back to source names for the replace path
    out = merged.withColumnRenamed("pk", config.pk_col)
    for src, dst in field_map:
        if src != dst:
            out = out.withColumnRenamed(dst, src)
    return add_documents(spark, index_dir, out)


def delete_documents(spark: SparkSession, index_dir: str, pks: list) -> dict:
    """Tombstone documents by external id (reference T3)."""
    paths, meta, config = _load(spark, index_dir)
    existing = spark.read.parquet(paths.doc_stats).select("docid", "pk")
    pk_df = spark.createDataFrame([(p,) for p in pks], f"pk {existing.schema['pk'].dataType.simpleString()}")
    tomb = existing.join(pk_df, "pk").select("docid")
    _append_tombstones(spark, paths, tomb)
    n_live, avgdl, total_dl = _live_stats(spark, paths)
    meta.update(
        n_docs=int(n_live), avgdl=float(avgdl), total_dl=int(total_dl),
        n_deleted=_n_deleted(spark, paths),
    )
    _rewrite_meta(paths, config, meta)
    return read_meta(paths)


def delete_by_filter(
    spark: SparkSession, index_dir: str, filter_ast: dict
) -> dict:
    """Tombstone every document whose attributes match ``filter_ast`` (the
    same predicate language as search-time filters, filters.py).

    The reference deletes only by external id (T3; del_add merge during
    indexing) — filter-scoped deletion is the batch-pipeline extension:
    resolve the matching docids from the attribute columns (one pruned scan,
    no postings touched) and append them as tombstones. Scale shape is
    identical to delete_documents: tombstones are a docid parquet append;
    postings rewrite cost is deferred to compact().
    """
    from .filters import to_column

    paths, meta, config = _load(spark, index_dir)
    stats = spark.read.parquet(paths.doc_stats)
    tomb = stats.filter(to_column(filter_ast)).select("docid")
    _append_tombstones(spark, paths, tomb)
    n_live, avgdl, total_dl = _live_stats(spark, paths)
    meta.update(
        n_docs=int(n_live), avgdl=float(avgdl), total_dl=int(total_dl),
        n_deleted=_n_deleted(spark, paths),
    )
    _rewrite_meta(paths, config, meta)
    return read_meta(paths)


def compact(spark: SparkSession, index_dir: str) -> dict:
    """Segment merge: fold all generations + tombstones into a fresh gen=0.

    Reuses the term_doc extraction spill (no re-tokenization); docids are
    preserved. After compaction df/idf are exact again and WAND bound
    scaling returns to 1.
    """
    import shutil

    paths, meta, config = _load(spark, index_dir)
    deleted = _deleted_df(spark, paths)

    td_live = spark.read.parquet(paths.term_doc).drop("gen")
    stats_all = spark.read.parquet(paths.doc_stats)
    docs_all = spark.read.parquet(paths.docs)
    if deleted is not None:
        # term_doc rows are (term, shard) docid-array runs — tombstones are
        # removed by slicing the parallel arrays (np.isin, Arrow-batched),
        # not a join. Tombstone sets are explicit user deletes, bounded and
        # driver-collectable; docs at true scale live in the arrays.
        del_ids = [r["docid"] for r in deleted.collect()]
        td_live = _filter_deleted_from_arrays(td_live, del_ids, config)
        stats_all = stats_all.join(deleted, "docid", "left_anti")
        docs_all = docs_all.join(deleted, "docid", "left_anti")

    # rewrite docs + doc_stats (live rows only); latest row per docid wins
    # (append-mode docs/doc_stats never duplicate docids, but be defensive)
    from pyspark.sql import Observation

    t0 = time.time()
    staging, commit = staged_write(paths.docs + ".compact")
    docs_all.write.mode("overwrite").parquet(staging)
    commit()
    obs = Observation()
    stats_all = stats_all.observe(
        obs, F.count(F.lit(1)).alias("rows"), F.sum("dl").alias("dl"),
        F.max("docid").alias("max_docid"),
    )
    staging, commit = staged_write(paths.doc_stats + ".compact")
    stats_all.write.mode("overwrite").parquet(staging)
    commit()
    got = obs.get
    n_live = int(got["rows"])
    total_dl = int(got["dl"] or 0)
    max_docid = int(got["max_docid"] if got["max_docid"] is not None else -1)
    staging, commit = staged_write(paths.term_doc + ".compact")
    td_live.write.mode("overwrite").partitionBy("bucket").parquet(staging)
    commit()
    for p in (paths.docs, paths.doc_stats, paths.term_doc):
        shutil.rmtree(p)
    import os

    os.replace(paths.docs + ".compact", paths.docs)
    os.replace(paths.doc_stats + ".compact", paths.doc_stats)
    os.makedirs(paths.term_doc + ".tmpwrap", exist_ok=True)
    os.replace(paths.term_doc + ".compact", os.path.join(paths.term_doc + ".tmpwrap", "gen=0"))
    os.replace(paths.term_doc + ".tmpwrap", paths.term_doc)

    avgdl = total_dl / n_live if n_live else 0.0
    td = spark.read.parquet(paths.term_doc)

    # dictionary
    terms = terms_agg(td)
    tw = Window.orderBy("term")
    terms = terms.withColumn("term_id", F.row_number().over(tw) - F.lit(1))
    tobs = Observation()
    terms = terms.observe(tobs, F.count(F.lit(1)).alias("rows"))
    staging, commit = staged_write(paths.terms + ".compact")
    terms.select("term", "term_id", "df", "cf", "max_tf").write.mode("overwrite").parquet(staging)
    commit()
    n_terms = int(tobs.get["rows"])
    shutil.rmtree(paths.terms)
    os.makedirs(paths.terms + ".tmpwrap", exist_ok=True)
    os.replace(paths.terms + ".compact", os.path.join(paths.terms + ".tmpwrap", "gen=0"))
    os.replace(paths.terms + ".tmpwrap", paths.terms)

    # postings: one merged generation
    encode_fn = make_encode_fn(config, avgdl)
    seg = (
        td.drop("gen")
        .filter(F.col("bucket") != DL_BUCKET)
        .groupBy("shard")
        .applyInArrow(encode_fn, schema=POSTINGS_SCHEMA)
    )
    staging, commit = staged_write(paths.postings + ".compact")
    seg.write.mode("overwrite").partitionBy("bucket").parquet(staging)
    commit()
    shutil.rmtree(paths.postings)
    os.makedirs(paths.postings + ".tmpwrap", exist_ok=True)
    os.replace(paths.postings + ".compact", os.path.join(paths.postings + ".tmpwrap", "gen=0"))
    os.replace(paths.postings + ".tmpwrap", paths.postings)

    shutil.rmtree(paths.deletes, ignore_errors=True)

    meta.update(
        n_docs=n_live,
        avgdl=float(avgdl),
        total_dl=total_dl,
        n_terms=n_terms,
        n_deleted=0,
        max_docid=max_docid,
        generations={"0": {"avgdl": float(avgdl), "n_docs": n_live}},
        compacted_at=time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        compact_wall_s=round(time.time() - t0, 2),
    )
    _rewrite_meta(paths, config, meta)
    return read_meta(paths)


# ---------------------------------------------------------------------------


def _filter_deleted_from_arrays(
    td: DataFrame, del_ids: list, config: IndexConfig
) -> DataFrame:
    """Remove tombstoned docids from term_doc array rows (vectorized).

    The tombstone set ships as a Spark broadcast — one torrent transfer per
    executor — rather than inside every task's pickled closure (same
    contract as the query-time scorer's broadcast in SearchIndex)."""
    import numpy as np
    import pandas as pd

    bc = td.sparkSession.sparkContext.broadcast(
        np.asarray(sorted(int(d) for d in del_ids), dtype=np.int64)
    )
    store_positions = config.store_positions
    schema = td.schema

    from search_engine_spark.codecs import (
        delta_encode,
        varint_decode,
        varint_encode,
    )

    def fn(batches):
        del_arr = bc.value
        for pdf in batches:
            if len(pdf) == 0 or len(del_arr) == 0:
                yield pdf
                continue
            keep = []
            docs_new, tfs_new, dls_new, poss_new = [], [], [], []
            cf_new, maxtf_new, n_new = [], [], []
            has_poss = store_positions and "poss" in pdf
            for i in range(len(pdf)):
                n = int(pdf["n"].iloc[i])
                if n == 0:
                    keep.append(False)
                    continue
                d = np.cumsum(
                    varint_decode(pdf["docs"].iloc[i], n).astype(np.int64)
                )
                mask = ~np.isin(d, del_arr)
                if not mask.any():
                    keep.append(False)
                    continue
                keep.append(True)
                t = varint_decode(pdf["tfs"].iloc[i], n).astype(np.int64)
                dm, tm = d[mask], t[mask]
                n_new.append(len(dm))
                docs_new.append(varint_encode(delta_encode(dm).astype(np.uint64)))
                tfs_new.append(varint_encode(tm.astype(np.uint64)))
                dl_bytes = pdf["dls"].iloc[i]
                is_dl_row = len(dl_bytes) == 0  # DL spill rows carry no dls
                if is_dl_row:
                    dls_new.append(b"")
                    cf_new.append(0)
                    maxtf_new.append(0)
                else:
                    dl = varint_decode(dl_bytes, n).astype(np.int64)
                    dls_new.append(varint_encode(dl[mask].astype(np.uint64)))
                    cf_new.append(int(tm.sum()))
                    maxtf_new.append(int(tm.max()))
                if has_poss:
                    p_bytes = pdf["poss"].iloc[i]
                    if is_dl_row or len(p_bytes) == 0:
                        poss_new.append(b"")
                    else:
                        tok_off = np.zeros(n + 1, dtype=np.int64)
                        np.cumsum(t, out=tok_off[1:])
                        p_deltas = varint_decode(
                            p_bytes, int(tok_off[-1])
                        ).astype(np.uint64)
                        # per-posting runs decode independently (first
                        # position absolute), so surviving postings' delta
                        # runs can be re-concatenated without re-encoding
                        kept = np.flatnonzero(mask)
                        poss_new.append(varint_encode(np.concatenate(
                            [p_deltas[tok_off[j]:tok_off[j + 1]] for j in kept]
                        ) if len(kept) else np.zeros(0, np.uint64)))
            out = pdf.loc[keep].reset_index(drop=True)
            out["n"] = pd.Series(n_new, dtype="int32")
            out["cf"] = pd.Series(cf_new, dtype="int64")
            out["max_tf"] = pd.Series(maxtf_new, dtype="int32")
            out["docs"] = pd.Series(docs_new, dtype="object")
            out["tfs"] = pd.Series(tfs_new, dtype="object")
            out["dls"] = pd.Series(dls_new, dtype="object")
            if has_poss:
                out["poss"] = pd.Series(poss_new, dtype="object")
            yield out

    return td.mapInPandas(fn, schema)


def _append_tombstones(spark: SparkSession, paths: IndexPaths, tomb: DataFrame):
    tomb.write.mode("append").parquet(paths.deletes)


def _deleted_df(spark: SparkSession, paths: IndexPaths) -> DataFrame | None:
    import os

    if not os.path.isdir(paths.deletes):
        return None
    return spark.read.parquet(paths.deletes).select("docid").distinct()


def _n_deleted(spark: SparkSession, paths: IndexPaths) -> int:
    """Distinct tombstoned docids. The deletes dir is append-only and a
    replace-then-delete flow (or overlapping delete_by_filter calls) appends
    the same docid twice; a raw row count would inflate n_deleted and drift
    idf away from the frozen 'live + tombstoned' denominator (query.py:134)."""
    deleted = _deleted_df(spark, paths)
    return int(deleted.count()) if deleted is not None else 0


def _live_stats(spark: SparkSession, paths: IndexPaths) -> tuple[int, float, int]:
    stats = spark.read.parquet(paths.doc_stats)
    deleted = _deleted_df(spark, paths)
    if deleted is not None:
        stats = stats.join(deleted, "docid", "left_anti")
    row = stats.agg(F.count("*").alias("n"), F.sum("dl").alias("t")).collect()[0]
    n, t = int(row["n"] or 0), int(row["t"] or 0)
    return n, (t / n if n else 0.0), t


def _rewrite_meta(paths: IndexPaths, config: IndexConfig, meta: dict):
    scalars = {k: v for k, v in meta.items() if k != "config"}
    write_meta(paths, config, scalars)


def update_settings(spark: SparkSession, index_dir: str, **changes) -> dict:
    """Diff-aware per-index settings update (reference ``Settings::execute``,
    ``src/update/settings.rs:189-243`` decide-then-``:865+`` reindex).

    ``changes`` may mix:

    * ``IndexSettings`` fields (synonyms, matching_strategy, proximity,
      ngrams/splits, typo thresholds …) — query-time only: meta.json is
      rewritten, NO data touched. Queries pick the new defaults up on the
      next ``SearchIndex`` open.
    * ``IndexConfig`` fields — if any is extraction-affecting
      (``config.EXTRACTION_AFFECTING``: searchable fields, attr set,
      positions, sharding, BM25 params …) the index is REBUILT from its
      docs snapshot via :func:`reindex` (docids preserved); pure tuning
      knobs (stage1_*, term_rank_*, extract_partitions) rewrite meta only.

    Returns the updated meta dict.
    """
    import dataclasses

    paths, meta, config = _load(spark, index_dir)
    sfields = {f.name for f in dataclasses.fields(IndexSettings)}
    cfields = {f.name for f in dataclasses.fields(IndexConfig)}
    unknown = set(changes) - sfields - cfields
    if unknown:
        raise ValueError(f"unknown settings: {sorted(unknown)}")
    old_settings = IndexSettings.from_dict(meta.get("settings", {}))
    new_settings = IndexSettings.from_dict(
        {**old_settings.to_dict(),
         **{k: v for k, v in changes.items() if k in sfields}}
    )
    meta["settings"] = new_settings.to_dict()
    c_changes = {
        k: v for k, v in changes.items()
        if k in cfields and getattr(config, k) != (
            tuple(v) if isinstance(getattr(config, k), tuple) else v)
    }
    if c_changes:
        new_config = IndexConfig.from_dict({**config.to_dict(), **c_changes})
        if any(k in EXTRACTION_AFFECTING for k in c_changes):
            return reindex(spark, index_dir, new_config,
                           settings=new_settings)
        config = new_config
    _rewrite_meta(paths, config, meta)
    return read_meta(paths)


def reindex(
    spark: SparkSession,
    index_dir: str,
    new_config: IndexConfig,
    settings: IndexSettings | None = None,
) -> dict:
    """Settings change -> full rebuild from the canonical document store
    (reference T8 ``Settings::execute`` + ``reindex``,
    ``src/update/settings.rs:865+``): the docs snapshot is re-extracted
    under ``new_config`` (block size, shards/buckets, positions flag, BM25
    params, attr set) without touching the original input. docids are
    preserved (the snapshot already carries them), so external references
    stay valid across the settings change — same guarantee the reference's
    in-place reindex gives. Persisted query-time settings carry over
    (``settings`` overrides them when given).
    """
    import os
    import shutil
    import tempfile

    from search_engine_spark.build import build_index

    paths, meta, _old = _load(spark, index_dir)
    if settings is None:
        settings = IndexSettings.from_dict(meta.get("settings", {}))
    docs = spark.read.parquet(paths.docs)
    deleted = _deleted_df(spark, paths)
    if deleted is not None:
        docs = docs.join(deleted, "docid", "left_anti")

    # the docs snapshot stores single-field text under the canonical name
    # 'text'; multi-field (field_cols) snapshots keep the source names, so
    # field_cols carries over unchanged
    cfg = IndexConfig.from_dict(
        {**new_config.to_dict(), "pk_col": "pk", "text_col": "text",
         "ts_col": None, "docid_col": "docid"}
    )
    staging = tempfile.mkdtemp(prefix="reindex-", dir=os.path.dirname(index_dir.rstrip("/")) or ".")
    try:
        build_index(spark, docs, staging, cfg, settings=settings)
    except BaseException:
        shutil.rmtree(staging, ignore_errors=True)
        raise
    old = index_dir.rstrip("/") + ".pre-reindex"
    shutil.rmtree(old, ignore_errors=True)
    os.replace(index_dir, old)
    os.replace(staging, index_dir)
    shutil.rmtree(old, ignore_errors=True)
    return read_meta(IndexPaths(index_dir))
