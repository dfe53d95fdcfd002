"""Scalable global ranking: exact row numbers over a total order without a
single-reducer window.

An unpartitioned `Window.orderBy(...)` plans as Exchange SinglePartition —
every row through ONE task, the classic 100 TB cliff. The two-phase form
used everywhere from Hive's TOTAL ORDER BY to MapReduce terasort:

1. range-repartition on the order keys (balanced partitions, each owning a
   contiguous key range);
2. rank locally within each range partition;
3. add each partition's cumulative row offset (a partition-count aggregate,
   tiny, broadcast back).

global rank = partition offset + local rank — exact, deterministic (the
order must be total: include a unique tie-break key), and every stage is
balanced. The repartitioned frame is pinned with a GC-scoped eager
localCheckpoint so the offset pass and the rank pass see the SAME sampled
range boundaries (range boundaries are sampled per execution; two
re-executions could disagree).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F


def global_ranks(
    df: DataFrame,
    order_exprs: list[Column],
    n_partitions: int | None = None,
    rank_col: str = "grank",
) -> DataFrame:
    """Append an exact global row_number over ``order_exprs`` (must be a
    total order — include a unique key). Plan: one range exchange + one
    per-partition window + a broadcast of ≤ n_partitions offset rows; no
    stage ever sees more than its share of rows."""
    parts = n_partitions or df.sparkSession.sparkContext.defaultParallelism
    rp = (
        df.repartitionByRange(parts, *order_exprs)
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    counts = rp.groupBy("__pid").agg(F.count(F.lit(1)).alias("__c"))
    ow = W.orderBy("__pid").rowsBetween(W.unboundedPreceding, -1)
    offsets = counts.select(
        "__pid", F.coalesce(F.sum("__c").over(ow), F.lit(0)).alias("__off")
    )
    lw = W.partitionBy("__pid").orderBy(*order_exprs)
    return (
        rp.withColumn("__lr", F.row_number().over(lw))
        .join(F.broadcast(offsets), "__pid")
        .withColumn(rank_col, (F.col("__off") + F.col("__lr")).cast("bigint"))
        .drop("__pid", "__lr", "__off")
    )


def ntile_from_rank(rank: Column, n_total: Column, k: int) -> Column:
    """SQL NTILE(k) derived from a global rank: the first n_total mod k
    buckets carry ceil(n/k) rows, the rest floor(n/k) — the standard-SQL
    remainder rule Spark and DuckDB both implement. Pure arithmetic, so
    ntile no longer needs its own window pass."""
    base = (n_total / k).cast("long")
    rem = n_total % k
    cut = (base + 1) * rem
    return (
        F.when(rank <= cut, ((rank - 1) / (base + 1)).cast("long") + 1)
        .otherwise(rem + ((rank - cut - 1) / base).cast("long") + 1)
        .cast("bigint")
    )
