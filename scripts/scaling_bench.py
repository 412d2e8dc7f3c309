"""Two-parallelism scaling benchmark (north rule evidence).

The north rule requires >= 0.8 throughput scaling efficiency between N and
4N executors. In this sandbox (no real cluster) the driver's substitution
rule applies: run the SAME job at two parallelism levels on the SAME input
and report throughput at both. We use local[8] vs local[32] in separate
JVMs (cold executor state; OS page cache shared — noted in the report).

efficiency = (T_8 / T_32) / 4   (1.0 = perfect strong scaling)

Usage: python scripts/scaling_bench.py [n_docs] [out_md]
Writes BENCH/BASELINE.md and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import json, os, shutil, sys, time
cpus, corpus, idx_dir = sys.argv[1], sys.argv[2], sys.argv[3]
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master(f"local[{cpus}]")
         .appName(f"scaling_bench_{cpus}")
         .config("spark.sql.shuffle.partitions", str(max(int(cpus) * 2, 16)))
         .config("spark.sql.adaptive.enabled", "true")
         .config("spark.sql.execution.arrow.pyspark.enabled", "true")
         .config("spark.driver.memory", "24g")
         .config("spark.ui.enabled", "false")
         .config("spark.ui.showConsoleProgress", "false")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
from search_engine_spark.build import build_index
from search_engine_spark.config import IndexConfig
from search_engine_spark.query import SearchIndex

pages = spark.read.parquet(corpus)
n_docs = pages.count()
shutil.rmtree(idx_dir, ignore_errors=True)
cfg = IndexConfig(text_col="text", pk_col="url", ts_col="warc_ts",
                  attr_cols=("lang",), num_shards=16, num_buckets=8,
                  store_positions=False)
t0 = time.time()
build_index(spark, pages, idx_dir, cfg)
build_s = time.time() - t0

ix = SearchIndex(spark, idx_dir)
queries = ["web search engine", "distributed data index", "the of and",
           "crawl rank score", "spark query term", "page table data",
           "search engine", "index term score rank", "of the web data",
           "engine crawl page"]
lat = []
for q in queries:
    t0 = time.time()
    ix.search(q, k=10, mode="wand").collect()
    lat.append(time.time() - t0)
lat.sort()
out = {"cpus": int(cpus), "n_docs": n_docs, "build_s": round(build_s, 2),
       "docs_per_sec": round(n_docs / build_s, 1),
       "q_p50_s": round(lat[len(lat)//2], 3), "q_p95_s": round(lat[-1], 3)}
print("RESULT " + json.dumps(out))
spark.stop()
"""

GEN = r"""
import sys, time
n_docs, corpus = int(sys.argv[1]), sys.argv[2]
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[32]")
         .config("spark.sql.shuffle.partitions", "64")
         .config("spark.driver.memory", "24g")
         .config("spark.ui.enabled", "false")
         .config("spark.ui.showConsoleProgress", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
from search_engine_spark.corpus import generate_pages_spark
t0 = time.time()
generate_pages_spark(spark, n_docs, seed=42, n_parts=64).write.mode("overwrite").parquet(corpus)
print(f"generated {n_docs} docs in {time.time()-t0:.1f}s")
spark.stop()
"""


def wait_quiet(max_wait: int = 600, thresh: float = 2.5) -> float:
    """Block until host loadavg drops below thresh (shared-host steal guard);
    returns the loadavg seen. Gives up after max_wait seconds."""
    t0 = time.time()
    while time.time() - t0 < max_wait:
        load = float(open("/proc/loadavg").read().split()[0])
        if load < thresh:
            return load
        time.sleep(15)
    return float(open("/proc/loadavg").read().split()[0])


def run_worker(script: str, *args: str) -> dict | None:
    env = dict(os.environ, PYTHONPATH=REPO)
    p = subprocess.run(
        [sys.executable, "-c", script, *args],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=3600,
    )
    for line in p.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
        print(line)
    if p.returncode != 0:
        sys.stderr.write(p.stderr[-4000:])
        raise SystemExit(f"worker failed rc={p.returncode}")
    return None


def main():
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_500_000
    out_md = sys.argv[2] if len(sys.argv) > 2 else os.path.join(REPO, "BENCH", "BASELINE.md")
    corpus = f"/tmp/scaling_corpus_{n_docs}"

    if not os.path.exists(os.path.join(corpus, "_SUCCESS")):
        run_worker(GEN, str(n_docs), corpus)

    # Two runs per level, alternating order, min build_s per level: the host
    # shares CPU with neighbors, so min-of-2 under a loadavg guard is the
    # fairest single-machine estimator of quiet-machine wall time.
    results = {}
    for attempt, cpus in enumerate(("8", "32", "32", "8")):
        load = wait_quiet()
        t0 = time.time()
        r = run_worker(WORKER, cpus, corpus, f"/tmp/scaling_idx_{cpus}")
        r["wall_total_s"] = round(time.time() - t0, 1)
        r["loadavg_before"] = load
        print(f"local[{cpus}] attempt: {r}")
        if cpus not in results or r["build_s"] < results[cpus]["build_s"]:
            results[cpus] = r
    for cpus in ("8", "32"):
        print(f"local[{cpus}] best: {results[cpus]}")

    t8, t32 = results["8"]["build_s"], results["32"]["build_s"]
    eff = round((t8 / t32) / 4, 3)
    summary = {
        "metric": "index_build_scaling_efficiency_local8_to_local32",
        "value": eff,
        "unit": "ratio",
        "n_docs": n_docs,
        "local8": results["8"],
        "local32": results["32"],
        "pass_ge_0_8": eff >= 0.8,
    }

    os.makedirs(os.path.dirname(out_md), exist_ok=True)
    with open(out_md, "w") as f:
        f.write(f"""# BENCH/BASELINE — measured numbers (this engine)

Input: deterministic synthetic Common-Crawl-style corpus
(`search_engine_spark.corpus.generate_pages_spark`, seed=42, {n_docs:,} docs,
~5k-term Zipfian vocab, schema `url, warc_ts, html, text, lang`), written
once to parquet and read identically by both runs.

Job: full index build — last-write-wins dedupe by url, deterministic docid
assignment (global url rank), Arrow-batched tokenize/extract, doc stats,
term dictionary, salted (docid % 8) repartition-by-(term, shard),
delta+varint block encode with block-max metadata, per-bucket checkpointed
commit. `store_positions=False` (positions are a config flag; the BM25/WAND
query path does not need them).

Two-cluster-size substitution (sandbox rule): same job, same input, fresh
JVM per run, `local[8]` vs `local[32]`.

| config | build wall (s) | docs/sec | query p50 (s) | query p95 (s) |
|---|---|---|---|---|
| local[8]  | {t8} | {results['8']['docs_per_sec']} | {results['8']['q_p50_s']} | {results['8']['q_p95_s']} |
| local[32] | {t32} | {results['32']['docs_per_sec']} | {results['32']['q_p50_s']} | {results['32']['q_p95_s']} |

**Scaling efficiency (T8/T32)/4 = {eff}** (north rule requires >= 0.8:
{'PASS' if eff >= 0.8 else 'FAIL'}).

Query latency is measured per top-10 block-max WAND search on the built
index (10 frozen queries); it is Spark-job-overhead-bound at this scale and
reported as secondary per BASELINE.md.

Caveats: single machine — parallelism levels share memory bandwidth and OS
page cache (the second run benefits from a warm cache; the reported
efficiency is conservative in CPU terms). The reference repo publishes no
benchmark numbers (see BASELINE.md), so these are the authoritative
baselines for later rounds.

Generated by `python scripts/scaling_bench.py {n_docs}`.
""")
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
