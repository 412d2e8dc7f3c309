"""spark-submit entrypoint: BM25 top-k search against a built index.

    spark-submit --master <master> --py-files /tmp/search_engine_spark.zip \
        scripts/submit_query.py --index /data/index \
        --query "web search engine" --k 10 --mode wand \
        [--filter '{"lang": "en"}']
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--index", required=True)
    p.add_argument("--query", required=True)
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--mode", choices=["wand", "exhaustive"], default="wand")
    p.add_argument("--filter", default=None, help="JSON filter AST")
    args = p.parse_args(argv)

    from pyspark.sql import SparkSession

    from search_engine_spark.query import SearchIndex

    spark = SparkSession.builder.appName("search_engine_spark_query").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    ix = SearchIndex(spark, args.index)
    filter_ast = json.loads(args.filter) if args.filter else None
    rows = ix.search(args.query, k=args.k, mode=args.mode,
                     filter_ast=filter_ast).collect()
    for r in rows:
        json.dump(r.asDict(), sys.stdout, default=str)
        print()
    spark.stop()


if __name__ == "__main__":
    main()
