"""Structured Streaming ingestion into the index.

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
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

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
