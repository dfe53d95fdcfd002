"""Driver contract for the spark-graft builder (PySpark target).

Thin facade over minarrow_spark's query registry — see
minarrow_spark/registry.py and minarrow_spark/queries/*.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from minarrow_spark.registry import all_queries  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1-style pricing summary) on sf0.001."""
    q = all_queries()["q01_pricing_summary"]
    return q.fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: q.fn for name, q in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: q.oracle for name, q in all_queries().items() if q.oracle is not None
    }
