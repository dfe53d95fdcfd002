"""Simulate the driver's full correctness sweep: run every registered query
through __spark_entry__ in a VANILLA SparkSession and compare against the
DuckDB oracle, exactly like the per-round CORRECTNESS_r{N}.json run.

Usage: python scripts/driver_sim.py [sf_dir] [query_name ...]
Defaults to /root/testdata/sf0.01 and all queries.
"""

from __future__ import annotations

import importlib
import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, "tests")


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.master("local[8]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    mod = importlib.import_module("__spark_entry__")
    from tests.oracle_utils import compare, duckdb_conn

    n = len(mod.entry(spark).collect())
    print(f"entry() -> {n} rows", flush=True)

    qs, osql = mod.queries(), mod.oracle_sql()
    con = duckdb_conn(sf_dir)
    bad = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            if name in osql:
                ok, msg = compare(fn(spark, sf_dir), con, osql[name])
            else:
                rows = fn(spark, sf_dir).count()
                ok, msg = rows >= 0, f"rows-only: {rows}"
        except Exception as e:  # noqa: BLE001
            ok, msg = False, f"EXC: {type(e).__name__}: {e}"
        dt = time.time() - t0
        print(f"{'PASS' if ok else 'FAIL'} {name:28s} {dt:6.1f}s  {msg[:200]}",
              flush=True)
        if not ok:
            bad.append(name)
    print(f"\n{len(qs) - len(bad)}/{len(qs)} pass" + (f"; FAILED: {bad}" if bad else ""))
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
