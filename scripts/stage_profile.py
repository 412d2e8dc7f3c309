"""Per-stage scaling profile: build the same corpus at two parallelism
levels and print each stage's wall time + the 2->8 scaling ratio, from the
checkpoint lineage the build already records.

Usage: python scripts/stage_profile.py <corpus_dir> [levels...]
"""
from __future__ import annotations

import glob
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
from search_engine_spark.session import apply_runtime_env  # noqa: E402

WORKER = r"""
import json, os, shutil, sys, time
sys.path.insert(0, os.environ["SEARCH_ENGINE_REPO"])
cpus, corpus, idx_dir = sys.argv[1], sys.argv[2], sys.argv[3]
from search_engine_spark.session import build_session
spark = build_session(f"local[{cpus}]", app_name=f"stage_profile_{cpus}",
                      shuffle_partitions=max(int(cpus) * 2, 16),
                      spark__driver__memory="24g",
                      spark__ui__enabled="false",
                      spark__ui__showConsoleProgress="false")
spark.sparkContext.setLogLevel("ERROR")
from search_engine_spark.build import build_index
from search_engine_spark.config import IndexConfig

pages = spark.read.parquet(corpus)
shutil.rmtree(idx_dir, ignore_errors=True)
cfg = IndexConfig(text_col="text", pk_col="url", ts_col="warc_ts",
                  attr_cols=("lang",), num_shards=16, num_buckets=8,
                  store_positions=False)
t0 = time.time()
build_index(spark, pages, idx_dir, cfg)
print(f"TOTAL {time.time()-t0:.2f}")
spark.stop()
"""


def stage_walls(idx_dir: str) -> dict[str, float]:
    out: dict[str, float] = {}
    for f in glob.glob(os.path.join(idx_dir, "_checkpoints", "*.json")):
        rec = json.load(open(f))
        name = rec["stage"]
        if name.startswith("postings:"):
            name = "postings(max-bucket)"
            out[name] = max(out.get(name, 0.0), rec["wall_s"])
        else:
            out[name] = rec["wall_s"]
        # composite stages record sub-phase walls in metrics.sub_walls —
        # surface them as indented pseudo-stages for scaling attribution
        for sub, wall in (rec.get("metrics", {}).get("sub_walls") or {}).items():
            out[f"{name}/{sub}"] = wall
    return out


def main():
    corpus = sys.argv[1]
    levels = sys.argv[2:] or ["2", "8"]
    env = dict(os.environ, PYTHONPATH=REPO, SEARCH_ENGINE_REPO=REPO)
    apply_runtime_env(env)
    walls: dict[str, dict[str, float]] = {}
    totals: dict[str, float] = {}
    pin = os.environ.get("SPARK_GRAFT_PIN") == "1"
    for cpus in levels:
        idx = f"/tmp/stage_profile_idx_{cpus}"
        cmd = [sys.executable, "-c", WORKER, cpus, corpus, idx]
        if pin:
            # same cluster-faithful pinning as scaling_bench.py: confine
            # the whole worker tree (JVM + Arrow python workers) to N cores
            cmd = ["taskset", "-c", f"0-{int(cpus) - 1}"] + cmd
        p = subprocess.run(cmd,
                           capture_output=True, text=True, env=env, cwd=REPO,
                           timeout=5400)
        for line in p.stdout.splitlines():
            if line.startswith("TOTAL "):
                totals[cpus] = float(line.split()[1])
        if p.returncode != 0:
            sys.stderr.write(p.stderr[-4000:])
            raise SystemExit(f"worker local[{cpus}] failed")
        walls[cpus] = stage_walls(idx)
        import shutil
        shutil.rmtree(idx, ignore_errors=True)
    stages = sorted({s for w in walls.values() for s in w},
                    key=lambda s: -walls[levels[0]].get(s, 0.0))
    hdr = "stage".ljust(24) + "".join(f"local[{c}]".rjust(12) for c in levels)
    if len(levels) == 2:
        hdr += "ratio".rjust(10) + "eff".rjust(8)
    print(hdr)
    for s in stages:
        row = s.ljust(24) + "".join(
            f"{walls[c].get(s, 0.0):12.2f}" for c in levels)
        if len(levels) == 2:
            a, b = walls[levels[0]].get(s, 0.0), walls[levels[1]].get(s, 0.0)
            k = int(levels[1]) / int(levels[0])
            if b > 0:
                row += f"{a / b:10.2f}" + f"{a / b / k:8.2f}"
        print(row)
    row = "TOTAL".ljust(24) + "".join(
        f"{totals.get(c, 0.0):12.2f}" for c in levels)
    if len(levels) == 2 and all(c in totals for c in levels):
        k = int(levels[1]) / int(levels[0])
        r = totals[levels[0]] / totals[levels[1]]
        row += f"{r:10.2f}" + f"{r / k:8.2f}"
    print(row)
    print(json.dumps({"levels": levels, "totals": totals, "stages": walls}))


if __name__ == "__main__":
    main()
