"""Table registry over the driver-provided parquet star schema.

Reference parallels: the reference constructs tables in memory with typed
builders (`/root/reference/src/structs/table.rs:103`, macros
`src/enums/array.rs:3411-3954`); it reserves Parquet support but does not
implement it (`Cargo.toml:143-148`). Here the scan layer IS Spark's parquet
reader, which gives us what the reference's zero-copy views gave it —
column pruning and predicate pushdown — at the storage level
(ReadSchema / PushedFilters in the physical plan).

Scale note: each table is a plain `spark.read.parquet` — no eager caching,
no collect. At 100 TB the same call reads a partitioned directory; nothing
here assumes single-file inputs.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLES: tuple[str, ...] = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to broadcast at any realistic scale factor.
BROADCAST_TABLES: frozenset[str] = frozenset({"region", "nation", "supplier"})

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    # Set UNCONDITIONALLY on every load (idempotent, runtime-settable), not
    # only when `events` loads: in a shared driver session the first query
    # to touch any table must leave the session in the same state regardless
    # of registration order — an events-gated set made timestamp semantics
    # depend on whether an events query had already run (r4 verdict #2).
    #   nanosAsLong: TIMESTAMP(NANOS) is illegal for Spark's parquet reader;
    #   the legacy conf reads it as epoch-nanos long instead.
    #   timeZone=UTC: ts math (unix_micros, casts) must agree with DuckDB's
    #   naive-as-UTC epoch_us.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(table_path(sf_dir, name))
    if name == "events":
        dt = df.schema["ts"].dataType
        if isinstance(dt, T.LongType):
            # TIMESTAMP(NANOS) read as epoch-nanos (nanosAsLong); truncate to
            # µs — the truncation DuckDB applies casting TIMESTAMP_NS→TIMESTAMP.
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif isinstance(dt, T.TimestampNTZType):
            # Parquet timestamp[us] without tz loads as TIMESTAMP_NTZ, which
            # unix_micros/watermarks reject; under the UTC session tz this cast
            # is the identity on the underlying micros (naive-as-UTC instant).
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        elif isinstance(dt, T.DateType):
            # A date32 ts would be a LOSSY upstream change (time-of-day gone);
            # silently casting would keep oracle checks green while streaming/
            # session semantics quietly degrade — fail loudly instead.
            raise TypeError(
                "events.ts arrived as DATE (date32) — a lossy upstream type "
                "change. Regenerate with timestamp precision or extend "
                "load_table deliberately; refusing to silently cast."
            )
    return df


def load_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR, suffix: str = "") -> None:
    """Register every table as a temp view (for the SQL API surface)."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name + suffix)
