"""Shared helpers for query modules."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from minarrow_spark.sources.catalog import load_table


def T(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def par(df: DataFrame) -> DataFrame:
    """Scan-parallelism guard for CPU-heavy per-row pipelines (regex
    tokenization, per-shingle hashing, vector math): when the source scan
    yields fewer partitions than the cluster's parallelism — a single
    sub-`maxPartitionBytes` file, the small-SF test shape — round-robin
    repartition so the expensive map work uses every core instead of one.

    At production scale the scan's file splits already exceed
    defaultParallelism, the guard short-circuits, and NO exchange is added —
    this is not a blanket repartition. The repartitioned case moves only the
    raw scan rows (the cheapest point in the pipeline, before any explode/
    hash fan-out multiplies bytes). Measured at sf0.1: q35 minhash map stage
    32× parallel vs single-core, headline ~1.4s vs 2.5-8.6s erratic."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
