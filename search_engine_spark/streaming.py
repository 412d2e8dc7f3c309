"""Structured Streaming ingestion into the index + stream operators.

The reference is a batch index-then-query engine (SURVEY.md §2.11 — no
streaming surface), but its incremental batch upsert maps naturally onto
``foreachBatch``: each micro-batch becomes one ``update.add_documents``
call, i.e. one new segment generation, exactly like a caller invoking the
batch API in a loop. Checkpointing composes: Spark's streaming checkpoint
guarantees each micro-batch is delivered once, and the index's staged
writes make each generation commit atomic.

Compaction policy: generations accumulate per micro-batch; call
``update.compact`` when ``len(meta['generations'])`` exceeds a threshold
(done here opportunistically via ``compact_every``).

Stream-side operators (composable in front of ``index_stream``):

* ``dedup_stream``          — cross-micro-batch exact content dedup via
                              ``applyInPandasWithState``: state = one seen
                              marker per content hash in the state store
                              (keyed, horizontally partitioned — no driver
                              state); only the first occurrence is emitted.
* ``windowed_term_counts``  — event-time windowed term frequencies with a
                              watermark for late data (built-in windowed
                              aggregation; append-mode emits finalized
                              windows only).
* ``decontaminate_stream``  — stream-static n-gram decontamination: the
                              static probe gram set joins against each
                              micro-batch (broadcast when small); per-doc
                              hit counts via streaming aggregation.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import IntegerType, LongType, StructField, StructType

from search_engine_spark.index import IndexPaths, read_meta
from search_engine_spark.update import add_documents, compact


def index_stream(
    stream_df: DataFrame,
    index_dir: str,
    checkpoint_dir: str,
    *,
    compact_every: int = 8,
    trigger_available_now: bool = True,
):
    """Attach a streaming DataFrame of documents to an existing index.

    Returns the started ``StreamingQuery``. The source must produce the
    index's document schema (pk/text/attr columns). Use
    ``trigger_available_now=True`` for drain-and-stop semantics (tests,
    backfills); False runs continuously with the default trigger.
    """
    spark = stream_df.sparkSession

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        add_documents(spark, index_dir, batch_df)
        meta = read_meta(IndexPaths(index_dir))
        if len(meta.get("generations", {})) >= compact_every:
            compact(spark, index_dir)

    writer = stream_df.writeStream.foreachBatch(sink).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def dedup_stream(
    stream_df: DataFrame,
    text_col: str = "text",
    id_col: str = "url",
) -> DataFrame:
    """Cross-micro-batch exact content dedup on a streaming DataFrame.

    Keys the stream by ``xxhash64(text)`` and keeps one integer marker per
    hash in Spark's keyed state store (``applyInPandasWithState``): the
    first row seen for a hash — ties within a micro-batch broken by min
    ``id_col`` for determinism — is emitted; every later row with the same
    content is dropped, across micro-batches and across restarts (state is
    checkpointed with the query).

    Scale shape: state is partitioned by the hash key across executors
    (state store instances), so memory per executor is
    ``n_distinct_hashes / n_partitions`` markers — no driver state, no
    broadcast. The 64-bit key keeps the store small regardless of document
    size. Collisions: a 64-bit key is safe to ~10^9 distinct contents
    (birthday bound ~3%); at 10^12 switch the key to the full ``md5``
    hex string — same plan shape, 2x state bytes.

    Batch parity: on a static DataFrame the same semantics are
    ``pipelines.dedup.exact_dedup`` (hash-groupBy, min-id winner).
    """
    if id_col not in stream_df.columns:
        raise ValueError(f"id_col {id_col!r} not in stream columns")
    hashed = stream_df.withColumn("_chash", F.xxhash64(F.col(text_col)))
    out_schema = StructType(list(hashed.schema.fields))
    state_schema = StructType([StructField("seen", IntegerType())])

    def emit_first(key, pdfs: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
        if state.exists:
            for _ in pdfs:  # drain; content already emitted in a prior batch
                pass
            return
        first = None
        for pdf in pdfs:
            cand = pdf.sort_values(id_col, kind="stable").head(1)
            if first is None or cand[id_col].iloc[0] < first[id_col].iloc[0]:
                first = cand
        state.update((1,))
        if first is not None:
            yield first

    return (
        hashed.groupBy("_chash")
        .applyInPandasWithState(
            emit_first, out_schema, state_schema, "append", "NoTimeout"
        )
        .drop("_chash")
    )


def decontaminate_stream(
    stream_df: DataFrame,
    probes: DataFrame,
    n: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    probe_id_col: str = "doc_id",
    probe_text_col: str = "text",
) -> DataFrame:
    """Stream-static decontamination: flag streaming docs that share a
    word n-gram with a STATIC probe (eval-set) DataFrame.

    The streaming side explodes each arriving doc into md5-hashed n-grams
    (a stateless projection, so each doc's grams stay inside its
    micro-batch); the probe side is a static distinct gram set that Spark
    joins stream-static — the static relation is planned once, broadcast
    when small, and never shuffles the stream. The per-doc
    ``n_hits`` count is a streaming aggregation keyed by ``doc_id``
    (run with ``outputMode('update')`` or ``'complete'``); since every
    gram of a doc arrives in the doc's own micro-batch, each doc's count
    is final the moment its batch commits.

    Batch parity: on a static DataFrame the same semantics are
    ``pipelines.curation.decontaminate`` (the DuckDB oracle for both).
    Use in front of ``index_stream`` as a filter: anti-join arriving
    batches against this result to keep eval-contaminated pages out of
    a continuously ingested index.
    """
    from search_engine_spark.pipelines.curation import _grams

    doc_g = (
        _grams(stream_df, n, id_col, text_col, distinct=True)
        .select("doc_id", F.explode("terms").alias("g"))
        .select("doc_id", F.md5("g").alias("gh"))
    )
    probe_g = (
        _grams(probes, n, probe_id_col, probe_text_col, distinct=True)
        .select(F.explode("terms").alias("g"))
        .select(F.md5("g").alias("gh"))
        .distinct()
    )
    return (
        doc_g.join(probe_g, "gh")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_hits"))
    )


def windowed_term_counts(
    stream_df: DataFrame,
    ts_col: str = "warc_ts",
    text_col: str = "text",
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Event-time windowed term frequencies with late-data handling.

    -> streaming (window_start, window_end, term, n): tokenizes JVM-side
    (``regexp_extract_all`` — the same frozen ASCII tokenizer as the dedup
    pipeline), explodes to (ts, term), and aggregates per tumbling window.
    The watermark bounds state: windows older than ``watermark`` are
    finalized, emitted (append mode), and evicted from the state store, so
    state size is O(active windows x distinct terms), independent of
    stream length.
    """
    from search_engine_spark.pipelines.dedup import tokens_col

    toks = (
        stream_df.withWatermark(ts_col, watermark)
        .select(F.col(ts_col), F.explode(tokens_col(text_col)).alias("term"))
    )
    return (
        toks.groupBy(F.window(F.col(ts_col), window), "term")
        .agg(F.count("*").cast(LongType()).alias("n"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "term",
            "n",
        )
    )
