"""Microbenchmark the extract kernel on real testdata batches (no Spark).

Feeds `make_extract_fn` the same Arrow batches Spark would (docid, text)
and times the whole kernel plus a per-phase breakdown via cProfile.
Usage: python scripts/profile_extract.py [n_docs] [reps]
"""
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, "/root/repo")

from search_engine_spark.build import make_extract_fn  # noqa: E402
from search_engine_spark.config import IndexConfig  # noqa: E402

_args = [a for a in sys.argv[1:] if a != "--profile"]
N = int(_args[0]) if len(_args) > 0 else 50000
REPS = int(_args[1]) if len(_args) > 1 else 3

tbl = pq.read_table("/root/testdata/sf0.1/documents.parquet", columns=["doc_id", "text"])
# replicate rows to reach N docs with distinct docids
base = tbl.num_rows
rep = (N + base - 1) // base
docids = np.arange(base * rep, dtype=np.int64)[:N]
text = pa.concat_arrays([tbl.column("text").combine_chunks()] * rep).slice(0, N)
batch = pa.RecordBatch.from_arrays(
    [pa.array(docids), text.combine_chunks() if isinstance(text, pa.ChunkedArray) else text],
    names=["docid", "text"],
)

for store_positions in (False, True):
    cfg = IndexConfig(
        text_col="text", pk_col="doc_id", ts_col=None, docid_col="doc_id",
        num_shards=8, num_buckets=8, store_positions=store_positions,
    )
    fn = make_extract_fn(cfg)
    # warm
    out = list(fn(iter([batch])))
    nrows = sum(b.num_rows for b in out)
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        list(fn(iter([batch])))
        ts.append(time.perf_counter() - t0)
    print(f"positions={store_positions}: {min(ts):.3f}s min of {REPS} "
          f"({N} docs, {nrows} out rows, {N/min(ts):,.0f} docs/s)")

if "--profile" in sys.argv:
    import cProfile, pstats
    cfg = IndexConfig(text_col="text", pk_col="doc_id", ts_col=None,
                      docid_col="doc_id", num_shards=8, num_buckets=8,
                      store_positions=True)
    fn = make_extract_fn(cfg)
    pr = cProfile.Profile()
    pr.enable()
    list(fn(iter([batch])))
    pr.disable()
    pstats.Stats(pr).sort_stats("cumulative").print_stats(25)
