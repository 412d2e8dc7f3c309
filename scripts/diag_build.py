"""Diagnostic single-level build: run one index build at a given
parallelism with Spark event logs enabled and a /proc/stat CPU sampler,
then summarize per-stage task-time vs wall (utilization, waves, skew).

Usage: python scripts/diag_build.py <cpus> <corpus_dir> [n_docs_label]
Prints a per-Spark-stage table: stage name, wall, sum(task time), max task,
tasks, and the idle fraction at the given core count.
"""
from __future__ import annotations

import glob
import json
import os
import subprocess
import sys
import threading
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
from search_engine_spark.session import apply_runtime_env  # noqa: E402

EVDIR = "/tmp/spark-events-diag"

WORKER = r"""
import json, os, shutil, sys, time
sys.path.insert(0, os.environ["SEARCH_ENGINE_REPO"])
cpus, corpus, idx_dir = sys.argv[1], sys.argv[2], sys.argv[3]
from search_engine_spark.session import build_session
spark = build_session(f"local[{cpus}]", app_name=f"diag_build_{cpus}",
                      shuffle_partitions=max(int(cpus) * 2, 16),
                      spark__driver__memory="24g",
                      spark__ui__enabled="false",
                      spark__ui__showConsoleProgress="false",
                      spark__eventLog__enabled="true",
                      spark__eventLog__dir=os.environ["DIAG_EVDIR"])
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
shutil.rmtree(idx_dir, ignore_errors=True)
"""


def cpu_sampler(stop: threading.Event, out: list):
    def busy_total():
        f = open("/proc/stat").readline().split()
        vals = list(map(int, f[1:]))
        idle = vals[3] + vals[4]
        return sum(vals), idle

    prev_t, prev_i = busy_total()
    while not stop.wait(1.0):
        t, i = busy_total()
        dt, di = t - prev_t, i - prev_i
        prev_t, prev_i = t, i
        if dt > 0:
            ncpu = os.cpu_count()
            out.append(round((1.0 - di / dt) * ncpu, 2))


def parse_events(path: str, cores: int):
    if path.endswith(".zstd"):
        raw = subprocess.run(["zstd", "-d", "-c", path], capture_output=True)
        lines = raw.stdout.decode(errors="replace").splitlines()
    else:
        lines = open(path, errors="replace").read().splitlines()
    stages = {}

    def st_of(key):
        return stages.setdefault(key, {"tasks": [], "cpu": [], "gc": [],
                                       "shw": 0, "shr": 0})

    for line in lines:
        try:
            ev = json.loads(line)
        except Exception:
            continue
        if not isinstance(ev, dict):
            continue
        e = ev.get("Event")
        if e == "SparkListenerStageCompleted":
            si = ev["Stage Info"]
            st = st_of((si["Stage ID"], si.get("Stage Attempt ID", 0)))
            st["name"] = si["Stage Name"].split("\n")[0][:60]
            st["wall"] = (si.get("Completion Time", 0)
                          - si.get("Submission Time", 0)) / 1e3
        elif e == "SparkListenerTaskEnd":
            st = st_of((ev["Stage ID"], ev.get("Stage Attempt ID", 0)))
            tm = ev.get("Task Metrics") or {}
            st["tasks"].append(tm.get("Executor Run Time", 0) / 1e3)
            st["cpu"].append(tm.get("Executor CPU Time", 0) / 1e9)
            st["gc"].append(tm.get("JVM GC Time", 0) / 1e3)
            sw = tm.get("Shuffle Write Metrics") or {}
            sr = tm.get("Shuffle Read Metrics") or {}
            st["shw"] += sw.get("Shuffle Bytes Written", 0)
            st["shr"] += (sr.get("Remote Bytes Read", 0)
                          + sr.get("Local Bytes Read", 0))
    rows = []
    for key in sorted(stages):
        st = stages[key]
        ts = st["tasks"]
        if not ts:
            continue
        wall = st.get("wall", 0.0)
        rows.append({
            "stage": key[0], "name": st.get("name", "?"),
            "wall": round(wall, 1),
            "n_tasks": len(ts), "sum_task": round(sum(ts), 1),
            "sum_cpu": round(sum(st["cpu"]), 1),
            "max_task": round(max(ts), 1),
            "gc": round(sum(st["gc"]), 1),
            "shw_mb": round(st["shw"] / 1e6),
            "shr_mb": round(st["shr"] / 1e6),
            "util": round(sum(ts) / (wall * cores), 2) if wall > 0 else 0.0,
        })
    return rows


def main():
    cpus = sys.argv[1]
    corpus = sys.argv[2]
    import shutil
    shutil.rmtree(EVDIR, ignore_errors=True)
    os.makedirs(EVDIR, exist_ok=True)
    env = dict(os.environ, PYTHONPATH=REPO, SEARCH_ENGINE_REPO=REPO,
               DIAG_EVDIR=EVDIR)
    apply_runtime_env(env)
    stop = threading.Event()
    samples: list = []
    th = threading.Thread(target=cpu_sampler, args=(stop, samples), daemon=True)
    th.start()
    t0 = time.time()
    cmd = [sys.executable, "-c", WORKER, cpus, corpus, f"/tmp/diag_idx_{cpus}"]
    if os.environ.get("SPARK_GRAFT_PIN") == "1":
        # confine JVM + python UDF workers to exactly N cores (see
        # scaling_bench.run_worker) so busy-cores reads the leak directly
        cmd = ["taskset", "-c", f"0-{int(cpus) - 1}"] + cmd
    p = subprocess.run(cmd,
                       capture_output=True, text=True, env=env, cwd=REPO,
                       timeout=5400)
    stop.set()
    th.join(2)
    wall = time.time() - t0
    if p.returncode != 0:
        sys.stderr.write(p.stderr[-5000:])
        raise SystemExit("diag build failed")
    total = [ln for ln in p.stdout.splitlines() if ln.startswith("TOTAL")]
    print(f"build {total[0] if total else '?'}  (subprocess wall {wall:.1f}s)")
    if samples:
        s = sorted(samples)
        print(f"host busy-cores during run: p10={s[len(s)//10]} p50={s[len(s)//2]} "
              f"p90={s[9*len(s)//10]} mean={sum(s)/len(s):.2f} (cap {cpus})")
    evs = sorted(glob.glob(os.path.join(EVDIR, "*")), key=os.path.getmtime)
    if evs and os.path.isdir(evs[-1]):
        inner = [f for f in glob.glob(os.path.join(evs[-1], "*"))
                 if os.path.isfile(f) and "appstatus" not in f]
        evs = sorted(inner, key=os.path.getmtime)
    if evs:
        rows = parse_events(evs[-1], int(cpus))
        rows.sort(key=lambda r: -r["sum_task"])
        print(f"{'stage':>5} {'wall':>8} {'sumtask':>9} {'sumcpu':>8} "
              f"{'maxtask':>8} {'n':>5} {'gc':>5} {'shW':>6} {'shR':>6}  name")
        for r in rows[:25]:
            print(f"{r['stage']:>5} {r['wall']:>8.1f} {r['sum_task']:>9.1f} "
                  f"{r['sum_cpu']:>8.1f} {r['max_task']:>8.1f} "
                  f"{r['n_tasks']:>5} {r['gc']:>5.1f} {r['shw_mb']:>6} "
                  f"{r['shr_mb']:>6}  {r['name']}")
        tt = sum(r["sum_task"] for r in rows)
        tc = sum(r["sum_cpu"] for r in rows)
        print(f"sum task run {tt:.1f}s, sum task cpu {tc:.1f}s, "
              f"run/cores {tt/int(cpus):.1f}s")


if __name__ == "__main__":
    main()
