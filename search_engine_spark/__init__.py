"""search_engine_spark — a PySpark-native full-text indexing + BM25 engine.

A from-scratch rebuild of the capabilities of Rastler3D/search_engine
(a fork of Meilisearch's ``milli`` crate, see ``/root/reference``) on top of
Apache Spark DataFrames:

* ``analysis``   — frozen tokenizer/normalizer (reference A1-A4 semantics)
* ``codecs``     — delta+varint block-compressed postings with block-max
                   metadata (replaces the reference's CboRoaringBitmap codec)
* ``build``      — distributed inverted-index build: salted/sharded
                   repartition-by-term, per-stage checkpoints, metrics
* ``update``     — incremental upsert/delete as segment generations +
                   tombstones, compaction = segment merge (reference T1-T4)
* ``query``      — BM25 top-k: per-shard scoring (vectorized block-max
                   MaxScore default, heap WAND parity path, exhaustive) +
                   global top-k merge, driver point-read path for small
                   slices; phrase, prefix, negation, synonyms, ngrams,
                   splits, match-all, typo expansion (distance-penalized),
                   proximity-boosted ranking, BM25F field weights, hybrid
                   fusion, per-term score details, best-window highlighting
* ``session``    — allocator env + recommended Spark conf (load-bearing
                   for many-worker scaling; see its docstring)
* ``filters``    — MongoDB-ish filter AST -> Spark Column (reference F1-F7)
* ``facets``     — facet distribution / facet value search (FD1-FD2)
* ``oracle``     — single-process pure-Python reference implementation used
                   for rank-identity tests
* ``pipelines``  — training-data operations: dedup (exact/minhash/simhash/
                   ngram-jaccard/embedding), similarity search, text stats,
                   multimodal plumbing
"""

from search_engine_spark.config import IndexConfig, IndexSettings


def __getattr__(name):
    # lazy convenience re-exports (keep `import search_engine_spark` free of
    # a pyspark import so packaging/tooling can introspect the version)
    lazy = {
        "build_index": ("search_engine_spark.build", "build_index"),
        "SearchIndex": ("search_engine_spark.query", "SearchIndex"),
        "hybrid_search": ("search_engine_spark.query", "hybrid_search"),
        "highlight_best": ("search_engine_spark.sources", "highlight_best"),
        "add_documents": ("search_engine_spark.update", "add_documents"),
        "update_documents": ("search_engine_spark.update", "update_documents"),
        "delete_documents": ("search_engine_spark.update", "delete_documents"),
        "delete_by_filter": ("search_engine_spark.update", "delete_by_filter"),
        "compact": ("search_engine_spark.update", "compact"),
        "reindex": ("search_engine_spark.update", "reindex"),
        "update_settings": ("search_engine_spark.update", "update_settings"),
        "build_session": ("search_engine_spark.session", "build_session"),
        "apply_runtime_env": ("search_engine_spark.session", "apply_runtime_env"),
    }
    if name in lazy:
        import importlib

        mod, attr = lazy[name]
        return getattr(importlib.import_module(mod), attr)
    raise AttributeError(name)


__all__ = [
    "IndexConfig", "build_index", "SearchIndex", "hybrid_search",
    "highlight_best", "add_documents", "update_documents",
    "delete_documents", "delete_by_filter", "compact", "reindex",
    "update_settings", "IndexSettings",
    "build_session", "apply_runtime_env",
]
__version__ = "0.1.0"
