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


# Horizon meaning "dead in every generation, forever". Used whenever the
# tombstoned docid can never recur in a future generation — which is ALWAYS
# the case for rank-assigned docids (new rows continue after max_docid).
# Keeping such tombstones at the dead-everywhere horizon matters for
# serving: _load_tombstones classifies horizon > max_gen as a FULL
# tombstone (flat fast path, WAND/MaxScore stay on); any horizon <= max_gen
# is "partial" and forces the exhaustive scorer until compact().
DEAD_HORIZON = (1 << 31) - 1


def _read_with_gen(spark: SparkSession, path: str) -> DataFrame:
    """Read docs / doc_stats / term_doc with the ``gen`` column guaranteed:
    indexes written before generations existed read as gen 0 — the same
    fallback the query path applies — so mutations work on pre-generation
    indexes instead of raising on the missing column.

    Mixed dirs (legacy gen-less files + appended gen-ful files) need two
    cares: if schema inference picked a legacy file the plain read has no
    ``gen`` at all (re-read with mergeSchema — a per-file-footer driver
    cost, paid only on legacy dirs); and rows from legacy files read
    ``gen`` as NULL (coalesced to 0: pre-generation rows ARE gen 0)."""
    df = spark.read.parquet(path)
    if "gen" not in df.columns:
        df = spark.read.option("mergeSchema", "true").parquet(path)
    if "gen" in df.columns:
        return df.withColumn(
            "gen", F.coalesce(F.col("gen"), F.lit(0)).cast("int")
        )
    return df.withColumn("gen", F.lit(0).cast("int"))


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
    if config.docid_col and config.docid_col not in keep:
        keep.append(config.docid_col)
    batch = _dedupe_last_write_wins(
        new_pages.select(*keep), config.pk_col,
        config.ts_col if has_ts else None,
    )

    # tombstone existing docids whose pk is being replaced
    existing = spark.read.parquet(paths.doc_stats).select("docid", "pk")
    tomb = existing.join(
        batch.select(F.col(config.pk_col).alias("pk")), "pk"
    ).select("docid")
    # docid_col: horizon = this new generation — the replaced docids' OLDER
    # versions die (gens < gen) while the versions this batch writes into
    # gen stay live, which is exactly what lets externally-managed docids be
    # replaced in place, reusing the same docid across generations.
    # Rank-assigned docids can never recur, so stamp dead-everywhere and
    # keep the pruned scorer paths (see DEAD_HORIZON).
    _append_tombstones(
        spark, paths, tomb,
        horizon=gen if config.docid_col else DEAD_HORIZON,
    )

    # docids: externally managed when docid_col is set (same contract as
    # build_index); otherwise continue after the current max (stable across
    # cluster sizes: rank of pk within the batch, offset by max_docid)
    offset = int(meta["max_docid"]) + 1
    rank_handle = None
    if config.docid_col:
        with_id = batch.withColumn("docid", F.col(config.docid_col).cast("long"))
    else:
        mode_ = config.append_rank_mode
        if mode_ == "auto":
            mode_ = (
                "rank"
                if batch.count() > config.append_window_max_docs
                else "window"
            )
        if mode_ == "rank":
            # scalable two-pass range rank (same machinery as build docids;
            # deterministic for unique pks at any parallelism)
            from search_engine_spark.build import assign_docids

            ranked, rank_handle = assign_docids(
                batch, config.pk_col, out_col="docid", return_handle=True
            )
            with_id = ranked.withColumn(
                "docid", (F.col("docid") + F.lit(offset)).cast("long")
            )
        else:
            w = Window.orderBy(config.pk_col)  # single task; size-gated above
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
    ).withColumn("gen", F.lit(gen).cast("int"))
    docs.write.mode("append").parquet(paths.docs)
    if rank_handle is not None:
        rank_handle.unpersist()
    new_pks = docs.select("pk")
    docs_df = _read_with_gen(spark, paths.docs).join(new_pks, "pk").select(
        "docid", "pk", "gen", *search_names,
        *[c for c in config.attr_cols if c not in search_names]
    )
    # appended rows are the only ones with these pks — old versions of
    # replaced pks share the pk (and, under docid_col, the docid too); the
    # newest generation wins
    from pyspark.sql import Window as _W

    docs_df = (
        docs_df.withColumn(
            "_rn", F.row_number().over(
                _W.partitionBy("pk").orderBy(
                    F.col("gen").desc(), F.col("docid").desc()
                )
            )
        )
        .filter("_rn = 1")
        .drop("_rn", "gen")
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
        .withColumn("gen", F.lit(gen).cast("int"))
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

    old = _filter_dead(
        _read_with_gen(spark, paths.docs), _tombstones_df(spark, paths)
    )
    # live version per pk (replaced pks keep multiple rows across gens;
    # docid_col replacements reuse the docid, so order by gen first)
    old = (
        old.withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy("pk").orderBy(
                    F.col("gen").desc(), F.col("docid").desc()
                )
            ),
        )
        .filter("_rn = 1")
        .drop("_rn", "docid", "gen")
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
    # docid_col: horizon = max_gen + 1 — dead in every generation that
    # exists today; a later re-add of the SAME docid into a newer generation
    # stays live (horizons fold by max). Rank-assigned docids never recur:
    # dead-everywhere, pruned scorers stay on (DEAD_HORIZON).
    _append_tombstones(
        spark, paths, tomb,
        horizon=_next_gen(meta) if config.docid_col else DEAD_HORIZON,
    )
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
    _append_tombstones(
        spark, paths, tomb,
        horizon=_next_gen(meta) if config.docid_col else DEAD_HORIZON,
    )
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
    tomb = _tombstones_df(spark, paths)

    td_live = _read_with_gen(spark, paths.term_doc)  # keep gen for the filter
    stats_all = _read_with_gen(spark, paths.doc_stats)
    docs_all = _read_with_gen(spark, paths.docs)
    if tomb is not None:
        # term_doc rows are (term, shard) docid-array runs — tombstones are
        # removed by slicing the parallel arrays (one segmented decode +
        # mask + re-encode per Arrow batch), not a join. A row's generation
        # decides which tombstones apply (dead iff horizon > gen).
        # Tombstone sets are explicit user deletes, bounded and
        # driver-collectable; docs at true scale live in the arrays.
        pairs = tomb.collect()
        td_live = _filter_deleted_from_arrays(td_live, pairs, config)
        stats_all = _filter_dead(stats_all, tomb)
        docs_all = _filter_dead(docs_all, tomb)
    td_live = td_live.drop("gen")
    # compacted rows all live in the fresh gen 0
    stats_all = stats_all.withColumn("gen", F.lit(0).cast("int"))
    docs_all = docs_all.withColumn("gen", F.lit(0).cast("int"))

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
    td: DataFrame, tomb_rows: list, config: IndexConfig
) -> DataFrame:
    """Remove tombstoned docids from term_doc array rows — fully vectorized
    (the same segmented-run codec toolkit the extract kernel uses: ONE
    varint decode / segmented prefix sum / mask / re-encode pass per Arrow
    batch and stream; no per-row or per-posting Python loops).

    ``tomb_rows`` are (docid, horizon) pairs; a posting from a row of
    generation g is dead iff its docid's horizon > g (generation-horizon
    semantics — an in-place docid_col replacement kills only the older
    generations). The pairs ship as a Spark broadcast — one torrent
    transfer per executor — rather than inside every task's pickled
    closure (same contract as the query-time scorer's broadcast)."""
    import numpy as np
    import pandas as pd

    t_ids = np.asarray([int(r["docid"]) for r in tomb_rows], dtype=np.int64)
    t_hor = np.asarray([int(r["horizon"]) for r in tomb_rows], dtype=np.int64)
    order = np.argsort(t_ids, kind="stable")
    bc = td.sparkSession.sparkContext.broadcast((t_ids[order], t_hor[order]))
    store_positions = config.store_positions
    schema = td.schema

    from search_engine_spark.codecs import (
        delta_decode_runs,
        delta_encode_runs,
        varint_decode,
        varint_encode_runs,
    )

    def _slices(buf: bytes, boffs: np.ndarray) -> list:
        mv = memoryview(buf)
        return [bytes(mv[boffs[i]:boffs[i + 1]]) for i in range(len(boffs) - 1)]

    def _filter_group(pdf: "pd.DataFrame", is_dl: bool, dead_of) -> "pd.DataFrame":
        """Filter one homogeneous row group (term rows or DL rows)."""
        n = pdf["n"].to_numpy().astype(np.int64)
        nz = n > 0
        starts = np.zeros(len(n), dtype=np.int64)
        np.cumsum(n[:-1], out=starts[1:])
        total = int(n.sum())
        if total == 0:
            return pdf.iloc[0:0]
        docs_buf = b"".join(pdf["docs"])
        docids = delta_decode_runs(
            varint_decode(docs_buf, total, dtype=np.int64), starts[nz]
        )
        gen_per_val = np.repeat(pdf["gen"].to_numpy().astype(np.int64), n)
        keep = ~dead_of(docids, gen_per_val)
        new_n = np.zeros(len(n), dtype=np.int64)
        new_n[nz] = np.add.reduceat(keep, starts[nz]) if keep.size else 0
        # guard reduceat duplication for empty rows (n==0 never occurs in
        # practice; nz-indexing keeps it correct anyway)
        row_keep = new_n > 0
        new_starts = np.zeros(int(row_keep.sum()), dtype=np.int64)
        np.cumsum(new_n[row_keep][:-1], out=new_starts[1:])
        offs = np.concatenate((new_starts, [int(new_n.sum())]))

        d_kept = docids[keep]
        docs_b, docs_off = varint_encode_runs(
            delta_encode_runs(d_kept, new_starts).astype(np.uint64), offs
        )
        t_all = varint_decode(b"".join(pdf["tfs"]), total, dtype=np.int64)
        tfs_b, tfs_off = varint_encode_runs(
            t_all[keep].astype(np.uint64), offs
        )
        out = pdf.loc[row_keep.tolist()].reset_index(drop=True)
        out["n"] = pd.Series(new_n[row_keep], dtype="int32")
        out["docs"] = pd.Series(_slices(docs_b, docs_off), dtype="object")
        out["tfs"] = pd.Series(_slices(tfs_b, tfs_off), dtype="object")
        if is_dl:
            out["cf"] = pd.Series(np.zeros(len(out)), dtype="int64")
            out["max_tf"] = pd.Series(np.zeros(len(out)), dtype="int32")
            out["dls"] = pd.Series([b""] * len(out), dtype="object")
            if "poss" in out.columns:
                out["poss"] = pd.Series([b""] * len(out), dtype="object")
            return out
        dl_all = varint_decode(b"".join(pdf["dls"]), total, dtype=np.int64)
        dls_b, dls_off = varint_encode_runs(
            dl_all[keep].astype(np.uint64), offs
        )
        out["dls"] = pd.Series(_slices(dls_b, dls_off), dtype="object")
        t_surv = np.where(keep, t_all, 0)
        cf = np.zeros(len(n), dtype=np.int64)
        mx = np.zeros(len(n), dtype=np.int64)
        cf[nz] = np.add.reduceat(t_surv, starts[nz])
        mx[nz] = np.maximum.reduceat(t_surv, starts[nz])
        out["cf"] = pd.Series(cf[row_keep], dtype="int64")
        out["max_tf"] = pd.Series(mx[row_keep], dtype="int32")
        if store_positions and "poss" in pdf.columns:
            # per-posting delta runs decode independently (first position
            # absolute), so surviving postings' raw deltas re-concatenate
            # without re-encoding: mask per TOKEN, one varint pass
            tok_total = int(t_all.sum())
            p_all = varint_decode(b"".join(pdf["poss"]), tok_total)
            tok_keep = np.repeat(keep, t_all)
            tok_counts = np.zeros(len(n), dtype=np.int64)
            tok_counts[nz] = np.add.reduceat(t_surv, starts[nz])
            tk = tok_counts[row_keep]
            p_offs = np.zeros(len(tk) + 1, dtype=np.int64)
            np.cumsum(tk, out=p_offs[1:])
            poss_b, poss_off = varint_encode_runs(p_all[tok_keep], p_offs)
            out["poss"] = pd.Series(_slices(poss_b, poss_off), dtype="object")
        return out

    def fn(batches):
        t_ids_s, t_hor_s = bc.value

        def dead_of(docids: np.ndarray, gens: np.ndarray) -> np.ndarray:
            if not len(t_ids_s) or not len(docids):
                return np.zeros(len(docids), dtype=bool)
            i = np.searchsorted(t_ids_s, docids)
            ic = np.minimum(i, len(t_ids_s) - 1)
            hit = (i < len(t_ids_s)) & (t_ids_s[ic] == docids)
            dead = np.zeros(len(docids), dtype=bool)
            dead[hit] = t_hor_s[ic[hit]] > gens[hit]
            return dead

        for pdf in batches:
            if len(pdf) == 0 or len(t_ids_s) == 0:
                yield pdf
                continue
            is_dl = pdf["bucket"].to_numpy() == DL_BUCKET
            parts = []
            if (~is_dl).any():
                parts.append(_filter_group(pdf.loc[(~is_dl).tolist()].reset_index(drop=True), False, dead_of))
            if is_dl.any():
                parts.append(_filter_group(pdf.loc[is_dl.tolist()].reset_index(drop=True), True, dead_of))
            out = pd.concat(parts, ignore_index=True) if parts else pdf.iloc[0:0]
            yield out[list(pdf.columns)]

    return td.mapInPandas(fn, schema)


def _append_tombstones(
    spark: SparkSession, paths: IndexPaths, tomb: DataFrame, horizon: int
):
    """Tombstones carry a generation HORIZON: the docid is dead in every
    generation < horizon. Rank-assigned docids always stamp DEAD_HORIZON
    (they can never recur); an in-place replacement of an externally-managed
    docid (docid_col) stamps horizon = the replacing generation, so the NEW
    version stays live — the reference's DelAdd semantics expressed over
    immutable segment generations."""
    tomb.select("docid").withColumn(
        "horizon", F.lit(int(horizon)).cast("int")
    ).write.mode("append").parquet(paths.deletes)


def _tombstones_df(spark: SparkSession, paths: IndexPaths) -> DataFrame | None:
    """(docid, horizon) with horizon folded to the max per docid (a doc is
    dead in gen g iff ANY tombstone has horizon > g iff max(horizon) > g).
    Rows written before horizons existed read as dead-everywhere."""
    import os

    if not os.path.isdir(paths.deletes):
        return None
    d = spark.read.parquet(paths.deletes)
    if "horizon" not in d.columns:
        d = d.withColumn("horizon", F.lit((1 << 31) - 1))
    return d.groupBy("docid").agg(F.max("horizon").alias("horizon"))


def _filter_dead(df: DataFrame, tomb: DataFrame | None) -> DataFrame:
    """Keep rows whose generation survived: no tombstone, or gen >= horizon.
    ``df`` must carry a ``gen`` column (docs / doc_stats)."""
    if tomb is None:
        return df
    gen = F.coalesce(F.col("gen"), F.lit(0))  # legacy gen-less rows = gen 0
    return (
        df.join(F.broadcast(tomb), "docid", "left")
        .filter(F.col("horizon").isNull() | (gen >= F.col("horizon")))
        .drop("horizon")
    )


def _n_deleted(spark: SparkSession, paths: IndexPaths) -> int:
    """DEAD doc_stats rows (gen-aware). Each dead row is one superseded or
    deleted document version whose postings still count toward df, so
    n_docs_indexed = live + n_deleted keeps idf's denominator aligned with
    the stale per-term df (query.py frozen semantics). Duplicate tombstone
    appends (replace-then-delete, overlapping delete_by_filter) fold to one
    horizon per docid, so they never inflate the count."""
    spark_ = spark
    tomb = _tombstones_df(spark_, paths)
    if tomb is None:
        return 0
    stats = _read_with_gen(spark_, paths.doc_stats)
    dead = stats.join(F.broadcast(tomb), "docid").filter(
        F.coalesce(F.col("gen"), F.lit(0)) < F.col("horizon")
    )
    return int(dead.count())


def _live_stats(spark: SparkSession, paths: IndexPaths) -> tuple[int, float, int]:
    stats = _read_with_gen(spark, paths.doc_stats)
    stats = _filter_dead(stats, _tombstones_df(spark, paths))
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
    # diff AFTER from_dict normalization (nested lists -> tuples etc.), so a
    # semantically-equal value (field_cols=[["text",1]] vs (("text",1),))
    # never registers as a change and triggers a spurious full reindex
    cand = IndexConfig.from_dict(
        {**config.to_dict(),
         **{k: v for k, v in changes.items() if k in cfields}}
    )
    c_changes = {
        k: getattr(cand, k) for k in changes
        if k in cfields and getattr(cand, k) != getattr(config, k)
    }
    if c_changes:
        new_config = cand
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
    docs = _filter_dead(
        _read_with_gen(spark, paths.docs), _tombstones_df(spark, paths)
    ).drop("gen")

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


def snapshot(index_dir: str, dest_dir: str, include_metrics: bool = True) -> dict:
    """Point-in-time index snapshot (reference S7, ``snapshot.rs``: copy
    the environment into a tarball; here: a directory copy openable
    directly by ``SearchIndex``). Returns the pinned meta dict.

    Consistency contract: the source ``meta.json`` is read FIRST (pinning
    the committed generation set), the data trees are copied, then any
    ``gen=N`` segment directory NOT in the pinned set is pruned and the
    PINNED meta is written last — so a concurrent ``add_documents``
    landing generation N+1 mid-copy cannot leak into the snapshot's
    segment stores, and the flat stores (docs / doc_stats / deletes)
    carry a ``gen`` column that readers bound by the pinned meta's
    generation horizon. Build checkpoints (``_checkpoints``) are
    deliberately NOT copied: a snapshot is a read surface, not a
    resumable build.

    Scale note: this is a driver-side file copy — at cluster scale the
    same pin-prune-meta-last sequence runs as a DistCp/object-store
    copy job; the contract (meta pinned first, written last) is what
    matters, not the copy mechanism.
    """
    import json
    import os
    import shutil

    src = IndexPaths(index_dir)
    meta = read_meta(src)
    pinned_gens = {int(g) for g in meta.get("generations", {"0": {}})}
    if os.path.exists(os.path.join(dest_dir, "meta.json")):
        raise ValueError(f"snapshot: {dest_dir!r} already holds an index")
    os.makedirs(dest_dir, exist_ok=True)
    dst = IndexPaths(dest_dir)
    for name in ("docs", "doc_stats", "term_doc", "terms", "postings",
                 "deletes") + (("metrics",) if include_metrics else ()):
        s = getattr(src, name)
        if os.path.exists(s):
            shutil.copytree(s, getattr(dst, name), dirs_exist_ok=True)
    for name in ("term_doc", "terms", "postings"):
        base = getattr(dst, name)
        if not os.path.isdir(base):
            continue
        for child in os.listdir(base):
            if child.startswith("gen="):
                g = int(child.split("=", 1)[1])
                if g not in pinned_gens:
                    shutil.rmtree(os.path.join(base, child),
                                  ignore_errors=True)
    with open(dst.meta, "w") as f:
        json.dump(meta, f)
    return meta
