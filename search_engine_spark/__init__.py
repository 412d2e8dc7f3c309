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
* ``query``      — BM25 top-k: per-shard scoring (vectorized exhaustive or
                   block-max WAND) + global top-k merge; phrase, prefix,
                   negation, typo expansion
* ``filters``    — MongoDB-ish filter AST -> Spark Column (reference F1-F7)
* ``facets``     — facet distribution / facet value search (FD1-FD2)
* ``oracle``     — single-process pure-Python reference implementation used
                   for rank-identity tests
* ``pipelines``  — training-data operations: dedup (exact/minhash/simhash/
                   ngram-jaccard/embedding), similarity search, text stats,
                   multimodal plumbing
"""

from search_engine_spark.config import IndexConfig

__all__ = ["IndexConfig"]
__version__ = "0.1.0"
