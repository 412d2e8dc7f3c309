"""IVF recall@k vs brute force at realistic corpus size (VERDICT r3 #8).

Generates n clustered vectors (deterministic seed), runs brute-force
cosine top-k and IVF-Flat top-k for a sample of queries across IVF
configurations (md5-init vs +Lloyd refinement, fixed vs auto codebook),
and prints one JSON line per config plus a summary for BENCH/BASELINE.md.

Usage: python scripts/ivf_recall.py [n_vecs] [dim] [n_queries] [k]
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
        "local[32]", app_name="ivf_recall", shuffle_partitions=32,
        spark__driver__memory="16g", spark__ui__enabled="false",
        spark__ui__showConsoleProgress="false",
    )
    spark.sparkContext.setLogLevel("ERROR")

    rng = np.random.default_rng(42)
    n_clusters = max(8, int(np.sqrt(n)) // 4)
    centers = rng.normal(size=(n_clusters, dim))
    assign = rng.integers(0, n_clusters, n)
    vecs = centers[assign] + 0.15 * rng.normal(size=(n, dim))

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
    for label, n_cents, lloyd, n_probe in (
        ("md5-init auto probe=1", "auto", 0, 1),
        ("md5-init n=16 probe=4", 16, 0, 4),
        ("md5-init auto probe=8", "auto", 0, 8),
        ("lloyd2 auto probe=8", "auto", 2, 8),
        ("lloyd2 auto probe=16", "auto", 2, 16),
    ):
        t0 = time.time()
        cents, assigns = similarity.ivf_assignments(
            emb, n_cents, lloyd_iters=lloyd)
        assigns = assigns.cache()
        n_lists = cents.count()
        # list balance: occupancy of the largest list / mean
        occ = [r["c"] for r in
               assigns.groupBy("cid").count()
               .selectExpr("count AS c").collect()]
        build_s = time.time() - t0
        # probe + rerank against the SAME codebook for every query (the
        # serving pattern): centroids collect once (tiny), the probed
        # lists' candidates collect per query and rerank in numpy — the
        # same math as ivf_cosine_topk without rebuilding assignments
        crows = sorted(cents.collect(), key=lambda r: r["cid"])
        cmat = np.array([r["cvec"] for r in crows])
        cnorm = np.linalg.norm(cmat, axis=1)
        hits = tot = 0
        t0 = time.time()
        for qi in qids:
            q = vecs[qi]
            csim = (cmat @ q) / (cnorm * np.linalg.norm(q))
            probe = [crows[i]["cid"]
                     for i in np.argsort(-csim, kind="stable")[:n_probe]]
            cand = assigns.filter(assigns.cid.isin(probe)).collect()
            ids = np.array([r["vec_id"] for r in cand])
            V = np.array([r["v"] for r in cand])
            sims = (V @ q) / (np.linalg.norm(V, axis=1) * np.linalg.norm(q))
            order = np.argsort(-sims, kind="stable")[:k]
            got = set(ids[order].tolist())
            hits += len(got & brute(q))
            tot += k
        row = {
            "config": label, "n_vecs": n, "dim": dim, "k": k,
            "n_lists": n_lists,
            "recall_at_k": round(hits / tot, 4),
            "max_list_over_mean": round(max(occ) / (sum(occ) / len(occ)), 2),
            "codebook_build_s": round(build_s, 2),
            "avg_query_s": round((time.time() - t0) / n_queries, 3),
        }
        assigns.unpersist()
        results.append(row)
        print(json.dumps(row))
    print(json.dumps({"summary": results}))
    spark.stop()


if __name__ == "__main__":
    main()
