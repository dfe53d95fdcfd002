"""Skew robustness probe for the banded self-join shape (r4 verdict #9).

The LSH families (q35 minhash bands, q39b sign-LSH buckets, q40 cells) all
funnel into the same physical shape: a self equi-join on the band key. Real
corpora produce head-heavy bucket populations (boilerplate shards,
all-positive embedding sign cells), so the hot key is the scale risk. This
probe measures what AQE's OptimizeSkewedJoin actually does for the TWO
regimes our pipelines contain:

* SLIM band rows (the candidate-generation join, ~20 B/row): a hot bucket
  amplifies pair-generation CPU quadratically but barely moves partition
  BYTES — and AQE skew detection is byte-based, so it cannot see this
  skew. The protection for slim joins is structural: exact-clone collapse
  (removes the c² head entirely) and the band-width selectivity lever.
* PAYLOAD-carrying rows (the verify/attach stage: rows carry the shingle
  array / embedding, ~0.5 KB+): the hot bucket IS a byte-skewed shuffle
  partition; AQE splits it and parallelizes both the transfer and the
  per-pair verify work.

Each regime runs uniform vs hot-key inputs with skew-join OFF/ON (merge
self-join — the production shape once band tables exceed the broadcast
threshold). Skew thresholds are scaled to the probe's MB volume (the
mechanism is identical at the 256 MB production default); the off/on
timing delta on the skewed input is the split evidence (see the comment
in `run` for why a plan-string check is not used).

    python scripts/skewprobe.py

Results recorded in SCALE.md.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from minarrow_spark.session import get_spark


def build(spark, n: int, k: int, hot: int, dist: str, payload: int):
    ids = spark.range(n).select(F.col("id").alias("doc_id"))
    if dist == "uniform":
        keyed = ids.withColumn("band_key", (F.col("doc_id") % k).cast("long"))
    else:
        # first `hot` ids collapse onto key 0; the rest stay uniform
        keyed = ids.withColumn(
            "band_key",
            F.when(F.col("doc_id") < hot, F.lit(0))
            .otherwise((F.col("doc_id") % (k - 1)) + 1)
            .cast("long"),
        )
    if payload:
        # INCOMPRESSIBLE payload (md5 chain), not repeat('x', n): AQE skew
        # detection reads COMPRESSED map-output sizes, and a constant
        # string compresses to ~nothing — the hot partition then never
        # crosses the byte threshold no matter how fat the logical rows
        # are (measured: zero skew-marked reads with a constant payload).
        parts = [F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(f"|{i}")))
                 for i in range(max(1, payload // 32))]
        keyed = keyed.withColumn("pl", F.concat(*parts))
    return keyed.localCheckpoint(eager=True)


def pair_plan(rows, payload: int):
    a = rows.select(F.col("doc_id").alias("da"), "band_key", *(
        [F.col("pl").alias("pa")] if payload else []))
    b = rows.select(F.col("doc_id").alias("db"), "band_key", *(
        [F.col("pl").alias("pb")] if payload else []))
    j = a.join(b.hint("merge"), ["band_key"]).filter(F.col("da") < F.col("db"))
    if payload:
        # the verify analog: the pair output USES both payloads, so column
        # pruning cannot strip them from the shuffle
        return j.select("da", "db", (F.length("pa") + F.length("pb")).alias("w"))
    return j.select("da", "db")


def run(spark, rows, payload: int, skew_enabled: bool):
    # Evidence is the TIMING delta, deliberately not a plan-string check:
    # `df.write` runs its own QueryExecution, so inspecting
    # df.queryExecution().executedPlan() afterwards shows an unexecuted
    # plan with no AQE results (the CLAUDE.md plan-inspection pitfall),
    # and a count()-based run would let Catalyst prune the payload column
    # out of the shuffle and invalidate the byte-skew scenario.
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", str(skew_enabled).lower())
    df = pair_plan(rows, payload)
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def probe(spark, label, n, k, hot, payload):
    print(f"-- {label}: N={n} K={k} hot={hot} payload={payload}B "
          f"(hot pairs ~{hot * (hot - 1) // 2:,})")
    reps = 2 if payload == 0 else 1  # payload-skew runs are long; 1 timed run
    for dist in ("uniform", "skewed"):
        rows = build(spark, n, k, hot, dist, payload)
        for skew in (False, True):
            if payload == 0:
                run(spark, rows, payload, skew)  # warm (slim runs are cheap)
            best = None
            for _ in range(reps):
                dt = run(spark, rows, payload, skew)
                best = dt if best is None or dt < best else best
            print(
                f"   {dist:8s} skewJoin={'on ' if skew else 'off'}  {best:7.3f}s",
                flush=True,
            )


def main():
    spark = get_spark("skewprobe")
    spark.sparkContext.setLogLevel("ERROR")
    # Scale skew thresholds to the probe volume; mechanism identical at the
    # 256 MB production default. Coalescing advisory stays MB-scale — a
    # first attempt at 64k fragmented every exchange and dominated runtime.
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "2m")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "2m")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
    # cover the skip-when-extra-shuffle guard too
    spark.conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
    probe(spark, "slim band rows (candidate join)", 2_000_000, 80_000, 8_000, 0)
    probe(spark, "payload rows (verify/attach join)", 100_000, 8_000, 6_000, 512)


if __name__ == "__main__":
    main()
