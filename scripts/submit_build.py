"""spark-submit entrypoint: build (or resume) an index on a cluster.

Packaging + launch (north rule: multi-executor via --py-files):

    python scripts/make_pyfiles.py /tmp/search_engine_spark.zip
    spark-submit \
        --master <cluster-master> \
        --py-files /tmp/search_engine_spark.zip \
        --conf spark.sql.execution.arrow.maxRecordsPerBatch=3000 \
        --conf spark.executorEnv.MALLOC_MMAP_THRESHOLD_=1073741824 \
        --conf spark.executorEnv.PYTHONMALLOC=malloc \
        --conf spark.executorEnv.ARROW_DEFAULT_MEMORY_POOL=system \
        scripts/submit_build.py \
        --input /data/pages_parquet --index /data/index \
        --text-col text --pk-col url --ts-col warc_ts --attr-cols lang

The executor-env confs mirror ``search_engine_spark.session.RUNTIME_ENV``
(required on many-core executors; see that module's docstring). The script
itself never sets a master, so it runs unchanged on YARN/K8s/standalone or
``--master local[N]``.

Resume: re-running with the same --index skips every stage whose
checkpoint manifest exists (per-bucket granularity for postings).
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input", required=True, help="parquet directory of pages")
    p.add_argument("--index", required=True, help="index output directory")
    p.add_argument("--text-col", default="text")
    p.add_argument("--pk-col", default="url")
    p.add_argument("--ts-col", default=None)
    p.add_argument("--docid-col", default=None)
    p.add_argument("--attr-cols", default="", help="comma-separated")
    p.add_argument("--num-buckets", type=int, default=None)
    p.add_argument("--num-shards", type=int, default=None)
    p.add_argument("--block-size", type=int, default=None)
    p.add_argument("--store-positions", action="store_true")
    p.add_argument("--no-store-positions", dest="store_positions",
                   action="store_false")
    p.set_defaults(store_positions=True)
    p.add_argument("--build-id", default=None)
    args = p.parse_args(argv)

    from pyspark.sql import SparkSession

    from search_engine_spark.build import build_index
    from search_engine_spark.config import IndexConfig

    spark = SparkSession.builder.appName("search_engine_spark_build").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    kw = {}
    for k, v in (("num_buckets", args.num_buckets),
                 ("num_shards", args.num_shards),
                 ("block_size", args.block_size)):
        if v is not None:
            kw[k] = v
    cfg = IndexConfig(
        text_col=args.text_col,
        pk_col=args.pk_col,
        ts_col=args.ts_col,
        docid_col=args.docid_col,
        attr_cols=tuple(c for c in args.attr_cols.split(",") if c),
        store_positions=args.store_positions,
        **kw,
    )
    pages = spark.read.parquet(args.input)
    meta = build_index(spark, pages, args.index, cfg, build_id=args.build_id)
    json.dump({k: v for k, v in meta.items() if k != "config"},
              sys.stdout, default=str)
    print()
    spark.stop()


if __name__ == "__main__":
    main()
