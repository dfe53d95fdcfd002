"""Streaming layer tests: streaming results must equal batch recomputation
of the same specs (SURVEY §5 — watermark/session ops have no static oracle).
"""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from minarrow_spark.sources.catalog import load_table
from minarrow_spark.streaming import (
    dedup_within_watermark,
    read_event_stream,
    replay_dir,
    run_to_memory,
    windowed_counts,
)


@pytest.fixture(scope="module")
def replay(spark, sf_dir):
    path = replay_dir(spark, sf_dir, n_chunks=6)
    yield path
    shutil.rmtree(path, ignore_errors=True)


def _canon(df):
    return sorted(tuple(r) for r in df.collect())


def test_windowed_counts_matches_batch(spark, sf_dir, replay):
    stream = read_event_stream(spark, replay)
    q = run_to_memory(windowed_counts(stream), "win_out", output_mode="complete")
    try:
        streamed = spark.sql("SELECT * FROM win_out")
        # Batch recomputation: identical spec without the watermark.
        from minarrow_spark.functions.arithmetic import dec

        e = load_table(spark, sf_dir, "events")
        batch = (
            e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(dec("value")).cast("double").alias("total_value"),
            )
            .select(
                F.unix_timestamp(F.col("w.start")).cast("bigint").alias("window_start"),
                "event_type",
                "n",
                "total_value",
            )
        )
        assert _canon(streamed) == _canon(batch)
    finally:
        q.stop()


def test_dedup_within_watermark(spark, sf_dir, replay):
    stream = read_event_stream(spark, replay)
    q = run_to_memory(
        dedup_within_watermark(stream).select("event_id"),
        "dedup_out",
        output_mode="append",
    )
    try:
        out = spark.sql("SELECT count(*) AS n, count(DISTINCT event_id) AS d FROM dedup_out").first()
        n_src = load_table(spark, sf_dir, "events").count()
        # Replay has no duplicate ids → pass-through, but each id exactly once.
        assert out.n == out.d == n_src
    finally:
        q.stop()


def test_stateful_running_totals(spark, sf_dir, replay):
    from minarrow_spark.streaming import running_totals_per_user

    stream = read_event_stream(spark, replay)
    q = (
        running_totals_per_user(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("running_out")
        .start()
    )
    try:
        q.processAllAvailable()
        # update-mode memory sink may hold several versions per key; the last
        # (max n_events) version per user must equal the batch totals.
        final = spark.sql(
            """
            SELECT user_id, max_by(total_value, n_events) AS total_value,
                   max(n_events) AS n_events
            FROM running_out GROUP BY user_id
            """
        )
        e = load_table(spark, sf_dir, "events")
        batch = e.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("total_value"),
        )
        j = final.alias("s").join(batch.alias("b"), "user_id")
        bad = j.filter(
            (F.col("s.n_events") != F.col("b.n_events"))
            | (F.abs(F.col("s.total_value") - F.col("b.total_value")) > 1e-6)
        ).count()
        assert bad == 0
        assert final.count() == batch.count()
    finally:
        q.stop()


def test_hash_sampling_in_stream_matches_batch(spark, sf_dir, replay):
    """Deterministic hash sampling is a stateless projection+filter, so the
    identical operator applies under Structured Streaming and selects the
    SAME rows the batch form selects — the reproducibility property that
    makes it the right sampling tool for continuous ingestion."""
    from minarrow_spark.operators.sampling import sample_mask

    stream = read_event_stream(spark, replay)
    sampled = stream.filter(sample_mask(F.col("event_id"), 0.2)).select("event_id")
    q = run_to_memory(sampled, "sample_out", output_mode="append")
    try:
        streamed = spark.sql("SELECT * FROM sample_out")
        batch = (
            load_table(spark, sf_dir, "events")
            .filter(sample_mask(F.col("event_id"), 0.2))
            .select("event_id")
        )
        assert _canon(streamed) == _canon(batch)
        assert streamed.count() > 0
    finally:
        q.stop()


def test_stream_pair_join_matches_batch(spark, sf_dir, replay):
    from minarrow_spark.streaming import stream_pair_join

    sa = read_event_stream(spark, replay)
    sb = read_event_stream(spark, replay)
    q = run_to_memory(stream_pair_join(sa, sb), "pairs_out", output_mode="append")
    try:
        streamed = spark.sql("SELECT * FROM pairs_out")
        e = load_table(spark, sf_dir, "events")
        a, b = e.alias("a"), e.alias("b")
        batch = a.join(
            b,
            F.expr(
                "a.user_id = b.user_id AND a.event_id < b.event_id "
                "AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 10 minutes"
            ),
        ).select(
            F.col("a.user_id").alias("user_id"),
            F.col("a.event_id").alias("eid_a"),
            F.col("b.event_id").alias("eid_b"),
        )
        assert _canon(streamed) == _canon(batch)
    finally:
        q.stop()
