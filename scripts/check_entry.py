"""Local mirror of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry on Spark at the given sf dir,
runs the matching ``oracle_sql()`` in DuckDB over the same parquet files,
and compares row count, column names, and (column-name-sorted, row-sorted)
values. Floats are compared exactly after the entry-level rounding — the
driver hashes values, so exact is the bar.

Usage: python scripts/check_entry.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def compare(name: str, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    problems = []
    if sorted(spark_pdf.columns) != sorted(duck_pdf.columns):
        problems.append(
            f"schema: spark={sorted(spark_pdf.columns)} duck={sorted(duck_pdf.columns)}"
        )
        return problems
    if len(spark_pdf) != len(duck_pdf):
        problems.append(f"rows: spark={len(spark_pdf)} duck={len(duck_pdf)}")
    a, b = canon(spark_pdf), canon(duck_pdf)
    if len(a) == len(b):
        for c in a.columns:
            av, bv = a[c].to_numpy(), b[c].to_numpy()
            # The driver hashes *typed* values: an int64 Spark column vs a
            # HUGEINT/float oracle column hash-mismatches even when the
            # numbers are equal. Mirror that strictness here.
            ak = "f" if np.issubdtype(av.dtype, np.floating) else (
                "i" if np.issubdtype(av.dtype, np.integer) else "o")
            bk = "f" if np.issubdtype(bv.dtype, np.floating) else (
                "i" if np.issubdtype(bv.dtype, np.integer) else "o")
            if ak != bk:
                problems.append(
                    f"col {c}: numeric-kind mismatch spark={av.dtype} duck={bv.dtype} "
                    f"(driver hashes typed values — CAST the oracle column)"
                )
            if np.issubdtype(av.dtype, np.floating) or np.issubdtype(bv.dtype, np.floating):
                bad = ~np.isclose(
                    av.astype(float), bv.astype(float), rtol=0, atol=1e-9, equal_nan=True
                )
            else:
                bad = av.astype(str) != bv.astype(str)
            if bad.any():
                i = int(np.argmax(bad))
                problems.append(
                    f"col {c}: {int(bad.sum())} diffs; first at sorted-row {i}: "
                    f"spark={av[i]!r} duck={bv[i]!r}"
                )
    return problems


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]")
        .appName("check_entry")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", "6g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry

    qs = entry.queries()
    oracles = entry.oracle_sql()
    con = duck_con(sf_dir)

    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL  {name}: spark error: {type(e).__name__}: {str(e)[:400]}")
            failures += 1
            continue
        if name not in oracles:
            print(f"ok*   {name}: rows={len(sdf)} ({time.time()-t0:.1f}s) [rows-only, no oracle]")
            continue
        try:
            ddf = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {type(e).__name__}: {str(e)[:400]}")
            failures += 1
            continue
        problems = compare(name, sdf, ddf)
        if problems:
            failures += 1
            print(f"FAIL  {name}: rows spark={len(sdf)} duck={len(ddf)} ({time.time()-t0:.1f}s)")
            for p in problems:
                print(f"      - {p}")
        else:
            print(f"ok    {name}: rows={len(sdf)} ({time.time()-t0:.1f}s)")

    print(f"\n{'ALL OK' if failures == 0 else f'{failures} FAILURES'}")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
