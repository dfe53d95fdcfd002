"""Micro-benchmark against BASELINE.md's only directly comparable numbers:
the reference's trivial sum kernels (`/root/reference/src/lib.rs:57-92`).

Run from the repo root: python scripts/microbench.py
Prints one JSON line; BASELINE.md's "Measured" section quotes a run.

Comparability notes (kept honest):
* The reference sums a hot, materialized Vec with SIMD+Rayon (22 CPUs).
  Spark's counterpart is whole-stage-codegen over `spark.range` — ids
  generated in-register, no input materialization either. Same trivial
  kernel, same single-machine setting.
* The parquet row measures the *realistic* path — decode + sum from
  columnar storage — which the reference does not publish.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from minarrow_spark.session import get_spark
from minarrow_spark.sources.catalog import load_table


def best_of(fn, n: int = 6) -> float:
    # Two warm runs + best-of-6: the 31M-adds-per-task loop only reaches
    # C2-compiled steady state after several executions (a fresh process
    # with best-of-3 measured 0.27-0.29 s where the warmed session shows
    # 0.17 s for the identical plan).
    fn()
    fn()
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    spark = get_spark("minarrow_spark_microbench")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    li = load_table(spark, sf_dir, "lineitem")

    n = 1_000_000_000
    # 2× core oversubscription: a measured partition sweep (32/64/128/256 →
    # 0.230/0.170/0.231/0.266 s) shows 2× tasks-per-core smooths the
    # straggler tail of the embarrassingly-parallel loop; same lever a
    # cluster job uses via shuffle-partition sizing.
    parts = 2 * spark.sparkContext.defaultParallelism
    # Like-for-like kernel semantics (r8): the reference's Rust sum is an
    # UNCHECKED wrapping add (`src/lib.rs:57-92` — no per-add overflow
    # branch). Spark under ansi.enabled=true compiles a checked add; an
    # interleaved same-session A/B (6 alternating blocks of best-of-6)
    # measured the branch at ~9% — 0.1328 checked vs 0.1211 unchecked —
    # NOT the historical 2×-band gap, which a first (non-interleaved)
    # probe mis-attributed to ANSI before the order-effect was controlled.
    # The headline ratio uses the unchecked form (same kernel as the
    # reference); the ANSI-checked number rides alongside because the
    # graded queries run under ANSI. The i64 kernel is measured in TWO
    # full passes per invocation (the r8 protocol: a band claim must
    # reproduce twice in one session), and a fixed-work calibration
    # anchor classifies cross-session VM drift.
    ansi_orig = spark.conf.get("spark.sql.ansi.enabled")
    i64_passes, ansi_passes = [], []
    try:
        for _ in range(2):
            spark.conf.set("spark.sql.ansi.enabled", "false")
            i64_passes.append(
                best_of(
                    lambda: spark.range(0, n, 1, parts).agg(F.sum("id")).collect()
                )
            )
            spark.conf.set("spark.sql.ansi.enabled", "true")
            ansi_passes.append(
                best_of(
                    lambda: spark.range(0, n, 1, parts).agg(F.sum("id")).collect()
                )
            )
        spark.conf.set("spark.sql.ansi.enabled", "false")
        t_fsum = best_of(
            lambda: spark.range(0, n, 1, parts)
            .agg(F.sum(F.col("id").cast("double")))
            .collect()
        )
    finally:
        spark.conf.set("spark.sql.ansi.enabled", ansi_orig)
    t_sum, t_sum_ansi = min(i64_passes), min(ansi_passes)
    t_pq = best_of(lambda: li.agg(F.sum("l_extendedprice")).collect())
    import bench

    out = {
        "sum_1e9_i64_sec": round(t_sum, 4),
        "sum_1e9_i64_passes": [round(t, 4) for t in i64_passes],
        "sum_1e9_i64_gelem_per_s": round(n / t_sum / 1e9, 2),
        "reference_sum_1e9_i64_sec": 0.1139,  # BASELINE.md, SIMD+Rayon, 22 CPUs
        "ratio_vs_reference": round(t_sum / 0.1139, 2),
        "ratio_per_pass": [round(t / 0.1139, 2) for t in i64_passes],
        "sum_1e9_i64_ansi_checked_sec": round(t_sum_ansi, 4),
        "ratio_ansi_checked_vs_reference": round(t_sum_ansi / 0.1139, 2),
        "sum_1e9_f64_sec": round(t_fsum, 4),
        "reference_sum_1e9_f64_sec": 0.1141,  # BASELINE.md src/lib.rs:92
        "ratio_f64_vs_reference": round(t_fsum / 0.1141, 2),
        "parquet_sum_lineitem_f64_sec": round(t_pq, 4),
        "calibration_s": bench.calibration(spark),
        "cpus": spark.sparkContext.defaultParallelism,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
