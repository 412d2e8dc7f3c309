"""Training-data pipeline operators over document / embedding tables.

Beyond the reference engine's own surface (SURVEY.md §2), these are the
operations a large-scale corpus-preparation pipeline needs:

* ``dedup``      — exact (hash groupBy), token-set Jaccard, MinHash+LSH,
                   SimHash (+ banded Hamming near-dup join), pair-graph
                   connected components (cluster_pairs)
* ``similarity`` — brute-force cosine top-k and hyperplane-LSH-bucketed ANN
                   over an ``array<float>`` embedding column
* ``textstats``  — token counting, quality scoring, n-gram language ID,
                   document fingerprinting
* ``multimodal`` — binary-payload plumbing (schema, batching, Arrow UDF
                   signatures) with a stubbed decoder
* ``embed``      — pluggable batch-embedder UDF slot (reference P8) with a
                   deterministic md5-projection default
* ``curation``   — decontamination, repetition stats, stratified sampling,
                   unigram-LM quality scoring, PII redaction

Design rule shared by every operator: the hot path is built-in
``pyspark.sql.functions`` (JVM, whole-stage codegen) wherever the semantics
allow; hashing uses ``md5`` because it is bit-identical in Spark, DuckDB and
Python's ``hashlib`` — which is what lets the driver's DuckDB oracle verify
each operator end-to-end.
"""

from search_engine_spark.pipelines import (
    curation,
    dedup,
    embed,
    multimodal,
    similarity,
    textstats,
)

__all__ = ["dedup", "similarity", "textstats", "multimodal", "embed", "curation"]
