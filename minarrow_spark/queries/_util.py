"""Shared helpers for query modules."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from minarrow_spark.sources.catalog import load_table


def T(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)
