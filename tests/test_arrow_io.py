"""Arrow interop boundary tests (SURVEY §2.1 S2-S6, §2.13 F4): round-trips
mirroring the reference's FFI test strategy (`pyo3/tests/atomic_tests.rs` —
per-type Rust→PyArrow→Rust equality; here DataFrame→Arrow→DataFrame)."""

import pyarrow as pa
import pytest
from pyspark.sql import functions as F

from minarrow_spark.sources.arrow_io import (
    arrow_batches,
    from_arrow,
    map_in_arrow,
    to_arrow,
)
from minarrow_spark.sources.catalog import load_table


def test_roundtrip_typed_table(spark):
    tbl = pa.table(
        {
            "i": pa.array([1, None, 3], pa.int64()),
            "f": pa.array([1.5, 2.5, None], pa.float64()),
            "s": pa.array(["a", None, "c"], pa.string()),
            "b": pa.array([True, False, None], pa.bool_()),
        }
    )
    df = from_arrow(spark, tbl)
    back = to_arrow(df)
    assert back.to_pydict() == tbl.to_pydict()


def test_roundtrip_parquet_table(spark, sf_dir):
    df = load_table(spark, sf_dir, "supplier")
    back = from_arrow(spark, to_arrow(df))
    assert back.schema == df.schema
    assert back.count() == df.count()


def test_arrow_batches_stream(spark):
    df = spark.range(1000).select(F.col("id"), (F.col("id") * 2).alias("x"))
    total = 0
    for batch in arrow_batches(df):
        assert isinstance(batch, pa.RecordBatch)
        total += batch.num_rows
    assert total == 1000


def test_arrow_batches_streams_incrementally(spark):
    """The memory contract: the first batch arrives while later partitions
    have not executed. Partitions ≥4 sleep 1s each — a full driver
    materialization (the old toArrow() path) could not yield the first
    batch before paying every sleep."""
    import time

    from pyspark import TaskContext

    df = spark.range(0, 8000, numPartitions=8).select(F.col("id"))

    def slow_tail(batches):
        ctx = TaskContext.get()
        if ctx is not None and ctx.partitionId() >= 4:
            time.sleep(1.0)
        yield from batches

    slow = df.mapInArrow(slow_tail, "id long")
    t0 = time.time()
    gen = arrow_batches(slow, batch_rows=500)
    first = next(gen)
    elapsed = time.time() - t0
    gen.close()
    assert first.num_rows > 0
    assert elapsed < 3.0, f"first batch took {elapsed:.1f}s — not streaming"


def test_map_in_arrow_kernel_matches_expr(spark, sf_dir):
    df = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_acctbal")

    def kernel(batch: pa.RecordBatch) -> pa.RecordBatch:
        import numpy as np

        doubled = batch.column("s_acctbal").to_numpy() * 2.0
        return pa.RecordBatch.from_arrays(
            [batch.column("s_suppkey"), pa.array(doubled)],
            names=["s_suppkey", "dbl"],
        )

    via_arrow = map_in_arrow(df, kernel, "s_suppkey long, dbl double")
    via_expr = df.select("s_suppkey", (F.col("s_acctbal") * 2.0).alias("dbl"))
    assert via_arrow.exceptAll(via_expr).count() == 0
    assert via_expr.exceptAll(via_arrow).count() == 0


def test_unsigned_widening_policy(spark):
    # SURVEY §1.3: u8→short, u16→int, u32→long, u64→decimal(20,0); the full
    # unsigned range must survive (Spark itself rejects unsigned Arrow input).
    from decimal import Decimal

    tbl = pa.table(
        {
            "u8": pa.array([0, 255], pa.uint8()),
            "u16": pa.array([0, 65535], pa.uint16()),
            "u32": pa.array([0, 2**32 - 1], pa.uint32()),
            "u64": pa.array([0, 2**64 - 1], pa.uint64()),
        }
    )
    df = from_arrow(spark, tbl)
    types = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    assert types == {
        "u8": "smallint",
        "u16": "int",
        "u32": "bigint",
        "u64": "decimal(20,0)",
    }, types
    top = df.orderBy(F.col("u8").desc()).first()
    assert (top.u8, top.u16, top.u32, top.u64) == (
        255, 65535, 2**32 - 1, Decimal(2**64 - 1),
    )
