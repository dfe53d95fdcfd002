"""Continuous aggregate (hypertable-style rollup): incrementally maintain a
coarse time-grain aggregate of an event stream so serving queries never
rescan raw history.

The 100 TB pattern: raw events are append-heavy and huge; dashboards ask
hourly/daily aggregates. Recomputing the window agg over all history per
refresh is O(history); a continuous rollup is O(new data):

* each micro-batch writes its PARTIAL aggregate (decomposable measures
  only — counts and exact long sums) to ``{dir}/batch=<id>``;
* a batch that replays after a failure OVERWRITES its own directory —
  foreachBatch's batch_id is stable across restarts from the same
  checkpoint, so the sink is idempotent (effectively exactly-once);
* reads merge partials with one small groupBy (sum-of-sums, sum-of-counts)
  — the LSM shape: cheap appends, merge-on-read, optional compaction.

Measures are carried as scaled longs (value × 100 → cents), so partial
merges are EXACT under any batch split — the same partial-agg algebra
Spark's own two-phase hash aggregate relies on, surfaced at rest.

Reference parity: the reference's chunked containers accumulate batches in
memory (`/root/reference/src/structs/chunked/super_table.rs:99,138`); this
is the at-rest, restart-safe, distributed counterpart for aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _partial_agg(batch: DataFrame, window: str) -> DataFrame:
    """Per-batch partial rollup: decomposable measures (count + exact
    scaled-long sum) PLUS a mergeable Datasketches HLL sketch of user_id,
    keyed by (window_start, event_type).

    The sketch is what lets the rollup answer "distinct users per window" —
    a measure plain sums cannot decompose (distinct is not algebraic).
    HLL register states merge by element-wise max, so sketches built from
    ANY batch split union to the identical state the one-shot aggregate
    produces — deterministic, order-free, and a few KB per row at rest."""
    return (
        batch.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("value_cents"),
            F.hll_sketch_agg("user_id").alias("users_hll"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).cast("bigint").alias("window_start"),
            "event_type",
            "n",
            "value_cents",
            "users_hll",
        )
    )


def rollup_writer(rollup_dir: str, window: str = "1 hour"):
    """foreachBatch callback: write this batch's partial aggregate under
    ``batch=<id>``, overwriting any previous attempt of the SAME batch —
    replays after failure/restart are idempotent."""

    def write_batch(batch: DataFrame, batch_id: int) -> None:
        _partial_agg(batch, window).coalesce(1).write.mode("overwrite").parquet(
            f"{rollup_dir}/batch={batch_id}"
        )

    return write_batch


def continuous_rollup(
    events: DataFrame,
    rollup_dir: str,
    checkpoint_dir: str,
    window: str = "1 hour",
):
    """Start the rollup maintenance stream (availableNow: drain what exists,
    then stop — on a live cluster use a processingTime trigger instead).
    Returns the StreamingQuery handle."""
    return (
        events.writeStream.foreachBatch(rollup_writer(rollup_dir, window))
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def rollup_view(spark: SparkSession, rollup_dir: str) -> DataFrame:
    """Merge-on-read over the partial files: one groupBy over
    rollup-cardinality rows (windows × types, NOT raw events). Exact: long
    sums merge associatively regardless of how batches split the data."""
    return (
        spark.read.parquet(rollup_dir)
        .groupBy("window_start", "event_type")
        .agg(
            F.sum("n").cast("bigint").alias("n"),
            (F.sum("value_cents").cast("decimal(38,0)") / 100)
            .cast("double")
            .alias("total_value"),
            F.hll_sketch_estimate(F.hll_union_agg("users_hll"))
            .cast("bigint")
            .alias("approx_users"),
        )
    )


def rollup_batch_twin(events: DataFrame, window: str = "1 hour") -> DataFrame:
    """The one-shot batch recomputation of the same rollup (for equivalence
    tests and backfills): identical measures, identical cents math."""
    return (
        _partial_agg(events, window)
        .groupBy("window_start", "event_type")
        .agg(
            F.sum("n").cast("bigint").alias("n"),
            (F.sum("value_cents").cast("decimal(38,0)") / 100)
            .cast("double")
            .alias("total_value"),
            F.hll_sketch_estimate(F.hll_union_agg("users_hll"))
            .cast("bigint")
            .alias("approx_users"),
        )
    )


def compact_rollup(
    spark: SparkSession, rollup_dir: str, out_dir: str, window_col: str = "window_start"
) -> DataFrame:
    """Fold accumulated batch=* partials into one consolidated partial set
    (the LSM compaction step: many small per-batch files → one file per
    shuffle partition, same merge algebra, identical view results).

    Writes to ``out_dir`` (never in place — a live maintenance stream may
    still be appending to ``rollup_dir``; the caller swaps directories or
    repoints readers once the write commits). Returns the compacted frame.
    """
    compacted = (
        spark.read.parquet(rollup_dir)
        .groupBy(window_col, "event_type")
        .agg(
            F.sum("n").cast("bigint").alias("n"),
            F.sum("value_cents").cast("bigint").alias("value_cents"),
            # sketches compact like any other partial: register-max union
            F.hll_union_agg("users_hll").alias("users_hll"),
        )
    )
    compacted.write.mode("overwrite").parquet(out_dir)
    return compacted
