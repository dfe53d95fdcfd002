"""Bucketed-table layout: pre-shuffled data at rest for shuffle-free joins.

The 100 TB lever SURVEY §7 calls out: a fact table bucketed on its join key
is stored already hash-partitioned, so a join between two tables bucketed on
the same key with the same bucket count needs NO exchange at query time —
each task zips matching buckets. This is the persistent-layout analog of the
reference's arena/chunk locality (`src/structs/arena.rs`): pay the
organization cost once at write, reuse it on every query.

Local note: bucketing requires `saveAsTable` (a warehouse-managed table, not
a bare parquet path); bucket counts here default small for the test tier —
on a cluster size buckets so each is 100-200 MB compressed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_by: str | list[str],
    n_buckets: int = 8,
    sort_by: str | list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (optionally sorted) managed table.

    Sorting within buckets additionally removes the sort from sort-merge
    joins and enables windowed reads without a sort step."""
    keys = [bucket_by] if isinstance(bucket_by, str) else list(bucket_by)
    w = df.write.mode(mode).bucketBy(n_buckets, *keys)
    if sort_by:
        sorts = [sort_by] if isinstance(sort_by, str) else list(sort_by)
        w = w.sortBy(*sorts)
    w.format("parquet").saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    """Read a managed (bucketed) table; Catalyst picks up the bucket spec
    and drops exchanges for joins/aggregations on the bucket key."""
    return spark.table(table)


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_by: str | list[str],
    mode: str = "overwrite",
) -> None:
    """Hive-style partitioned parquet layout (`.../key=value/part-*.parquet`).

    The partition column becomes directory structure, so filters on it prune
    whole directories before any IO (static partition pruning; dynamic
    pruning kicks in for join keys). The at-rest complement to parquet's
    row-group min/max pruning — at 100 TB, date/tenant partitioning is what
    keeps a day's query from touching a year's files."""
    keys = [partition_by] if isinstance(partition_by, str) else list(partition_by)
    df.write.mode(mode).partitionBy(*keys).parquet(path)
