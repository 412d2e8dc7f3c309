"""PQ / IVF-PQ recall@k vs brute force (round-5 session-4 companion to
scripts/ivf_recall.py): same clustered synthetic corpus, measuring what
the quantization costs in recall at realistic compression.

Configs: raw-vector PQ-ADC (pq_adc_topk) at two code budgets, and
residual IVF-PQ (ivf_pq_topk) at two probe depths. Brute-force cosine is
the ground truth; PQ scores approximate L2, so recall (not rank parity)
is the honest metric — cosine and L2 orderings agree here because the
synthetic vectors are roughly norm-homogeneous.

Usage: python scripts/pq_recall.py [n_vecs] [dim] [n_queries] [k]
Prints one JSON line per config + a summary line for BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    n_queries = int(sys.argv[3]) if len(sys.argv) > 3 else 20
    k = int(sys.argv[4]) if len(sys.argv) > 4 else 10

    import numpy as np

    from search_engine_spark.pipelines import similarity
    from search_engine_spark.session import build_session

    spark = build_session(
        "local[32]", app_name="pq_recall", shuffle_partitions=32,
        spark__driver__memory="16g", spark__ui__enabled="false",
        spark__ui__showConsoleProgress="false",
    )
    spark.sparkContext.setLogLevel("ERROR")

    rng = np.random.default_rng(42)
    n_clusters = max(8, int(np.sqrt(n)) // 4)
    centers = rng.normal(size=(n_clusters, dim))
    assign = rng.integers(0, n_clusters, n)
    vecs = centers[assign] + 0.15 * rng.normal(size=(n, dim))
    # unit-normalize so brute-force cosine ordering == the L2 ordering
    # ADC approximates (isolates quantization quality from metric skew)
    vecs = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)

    emb = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(n)],
        "vec_id long, embedding array<double>",
    ).repartition(32).cache()
    emb.count()

    qids = rng.choice(n, n_queries, replace=False)
    norms = np.linalg.norm(vecs, axis=1)

    def brute(q):
        sims = (vecs @ q) / (norms * np.linalg.norm(q))
        return set(np.argsort(-sims, kind="stable")[:k].tolist())

    results = []

    # raw-vector PQ-ADC: sampled-init vs Lloyd-refined codebooks at two
    # code budgets (m subquantizers x 64 codes; byte-codes would be 256)
    for label, m, n_codes, lloyd, rpool in (
        ("pq_m4x64_init_adc", 4, 64, 0, None),
        ("pq_m8x64_lloyd3_adc", 8, 64, 3, None),
        ("pq_m4x64_init_rerank1k", 4, 64, 0, 1000),
        ("pq_m8x64_lloyd3_rerank1k", 8, 64, 3, 1000),
    ):
        cb = similarity.pq_codebooks(emb, m=m, n_codes=n_codes,
                                     lloyd_iters=lloyd)
        cb = cb.localCheckpoint()
        t0 = time.time()
        hits = total = 0
        for qi in qids:
            qv = [float(x) for x in vecs[qi]]
            got = {
                r["vec_id"]
                for r in similarity.pq_adc_topk(
                    emb, cb, qv, k=k, m=m, rerank_pool=rpool).collect()
            }
            hits += len(got & brute(vecs[qi]))
            total += k
        rec = hits / total
        row = {"config": label, "m": m, "n_codes": n_codes,
               "lloyd_iters": lloyd, "rerank_pool": rpool,
               "recall_at_k": round(rec, 4), "k": k,
               "n": n, "wall_s": round(time.time() - t0, 1)}
        print(json.dumps(row), flush=True)
        results.append(row)

    # residual IVF-PQ at two probe depths (auto-ish codebook)
    import math
    n_cents = max(16, math.isqrt(n) // 2)
    idx = similarity.ivf_pq_build(
        emb, n_centroids=n_cents, m=4, n_codes=64, pq_lloyd_iters=2,
    )
    for label, n_probe, rpool in (
        ("ivfpq_p4_adc", 4, None),
        ("ivfpq_p4_rerank1k", 4, 1000),
        ("ivfpq_p16_rerank1k", 16, 1000),
    ):
        t0 = time.time()
        hits = total = 0
        for qi in qids:
            qv = [float(x) for x in vecs[qi]]
            got = {
                r["vec_id"]
                for r in similarity.ivf_pq_query(
                    idx, qv, k=k, n_probe=n_probe, rerank_pool=rpool,
                ).collect()
            }
            hits += len(got & brute(vecs[qi]))
            total += k
        rec = hits / total
        row = {"config": label, "n_centroids": n_cents, "n_probe": n_probe,
               "m": 4, "n_codes": 64, "pq_lloyd_iters": 2,
               "rerank_pool": rpool, "recall_at_k": round(rec, 4), "k": k,
               "n": n, "wall_s": round(time.time() - t0, 1)}
        print(json.dumps(row), flush=True)
        results.append(row)

    print(json.dumps({"summary": results}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
