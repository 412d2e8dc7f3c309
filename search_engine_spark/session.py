"""Runtime environment + SparkSession configuration for the engine.

Two classes of setting, both load-bearing for strong scaling of the
Arrow-UDF build stages (measured on a 32-core host; see BENCH/BASELINE.md):

1. **Allocator env vars** — must be set in the environment BEFORE the JVM
   starts so Spark's forked Python workers inherit them:

   * ``MALLOC_MMAP_THRESHOLD_`` / ``MALLOC_TRIM_THRESHOLD_``: keep glibc
     from mmap()/munmap()-cycling large buffers. Every munmap triggers TLB
     shootdown IPIs across all cores; with N parallel UDF workers the cost
     grows ~quadratically with core count (measured: >50% of all CPU in
     kernel mode at 32 workers, vs ~4% at 8).
   * ``PYTHONMALLOC=malloc``: CPython's pymalloc allocates its arenas with
     raw mmap (ignoring the glibc thresholds); routing object allocation
     through glibc malloc removes that second mmap churn source.
   * ``ARROW_DEFAULT_MEMORY_POOL=system``: same story for pyarrow's
     default mimalloc pool.

   Note glibc silently caps ``MALLOC_MMAP_THRESHOLD_`` at 32 MiB, which is
   why the Arrow batch size below matters too.

2. **Spark conf** — ``spark.sql.execution.arrow.maxRecordsPerBatch=3000``:
   keeps per-batch UDF temporaries (token arrays, sort keys) under glibc's
   32 MiB mmap-threshold cap so allocation stays on the (cheap, reusable)
   heap. Larger batches measured 5-20x more kernel time at 32-way
   parallelism with no throughput benefit.

On a real multi-executor cluster each executor host runs few workers, so
these settings are less critical there — but they are exactly what
``spark-submit --conf spark.executorEnv.MALLOC_MMAP_THRESHOLD_=...`` is
for, and they never hurt.
"""

from __future__ import annotations

import os

RUNTIME_ENV = {
    "MALLOC_MMAP_THRESHOLD_": "1073741824",  # glibc caps at 32 MiB anyway
    "MALLOC_TRIM_THRESHOLD_": "1073741824",
    "PYTHONMALLOC": "malloc",
    "ARROW_DEFAULT_MEMORY_POOL": "system",
}

RECOMMENDED_CONF = {
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.execution.arrow.maxRecordsPerBatch": "3000",
    "spark.sql.adaptive.enabled": "true",
}


def apply_runtime_env(env: dict | None = None) -> dict:
    """Set the allocator env vars (idempotent; call BEFORE the JVM starts).

    Returns the mapping actually applied. Pass an explicit dict (e.g.
    ``subprocess`` env) to populate that instead of ``os.environ``.
    """
    target = os.environ if env is None else env
    for k, v in RUNTIME_ENV.items():
        target.setdefault(k, v)
    return target


def build_session(master: str, app_name: str = "search_engine_spark",
                  shuffle_partitions: int | None = None, **extra_conf):
    """SparkSession with the engine's recommended configuration."""
    apply_runtime_env()
    from pyspark.sql import SparkSession

    b = SparkSession.builder.master(master).appName(app_name)
    conf = dict(RECOMMENDED_CONF)
    if shuffle_partitions is not None:
        conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    conf.update({k.replace("__", "."): str(v) for k, v in extra_conf.items()})
    for k, v in conf.items():
        b = b.config(k, v)
    return b.getOrCreate()
