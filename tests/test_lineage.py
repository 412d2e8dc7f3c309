"""Per-task lineage records written by the encode stage (north rule:
"per-partition lineage and metrics ... recorded per task"): every encode
task appends a JSON record with its Spark stage/partition/attempt ids and
the three build metrics; the records reconcile with the per-bucket
checkpoint metrics."""

import glob
import json
import os


def _read_jsonl(path):
    with open(path) as f:
        return [json.loads(line) for line in f if line.strip()]


def test_task_lineage_reconciles_with_bucket_metrics(index_dir):
    from search_engine_spark.index import IndexPaths, read_meta

    paths = IndexPaths(index_dir)
    build_id = read_meta(paths)["build_id"]

    task_files = glob.glob(os.path.join(paths.metrics, f"tasks-{build_id}", "*.json"))
    assert task_files, "encode stage wrote no per-task lineage records"
    tasks = [rec for fp in task_files for rec in _read_jsonl(fp)]
    for rec in tasks:
        assert rec["partition_id"] >= 0
        assert rec["task_attempt_id"] >= 0
        assert rec["segments_merged"] > 0
        assert rec["postings_emitted"] > 0
        assert rec["bytes_compressed"] > 0

    bucket_rows = _read_jsonl(os.path.join(paths.metrics, f"build-{build_id}.jsonl"))
    bucket = [r for r in bucket_rows if r["stage"].startswith("postings:bucket=")]
    assert bucket
    # every posting is merged by exactly one encode task and lands in
    # exactly one bucket, so the totals must agree exactly (no retries in
    # a clean test build; with retries the committed bucket totals remain
    # the truth and task records over-count by the retried attempts)
    assert sum(r["postings_emitted"] for r in tasks) == sum(
        r["postings_emitted"] for r in bucket
    )
    assert sum(r["segments_merged"] for r in tasks) == sum(
        r["segments_merged"] for r in bucket
    )
    assert sum(r["bytes_compressed"] for r in tasks) == sum(
        r["bytes_compressed"] for r in bucket
    )
