"""Arrow interop boundary: the Spark analog of the reference's FFI layer.

Reference mapping (SURVEY §2.1 S2-S6, §2.13 F4):

* `import_from_c` (`src/ffi/arrow_c_ffi.rs:640`) — Arrow data *into* the
  engine → ``from_arrow`` (``spark.createDataFrame`` on a ``pyarrow.Table``;
  Spark's Arrow fast path does the zero-copy batch transfer).
* `export_to_c` (`arrow_c_ffi.rs:432`) — engine data *out* as Arrow →
  ``to_arrow`` (``DataFrame.toArrow()``, Spark 4).
* RecordBatch stream import/export (`arrow_c_ffi.rs:2104-2660`) →
  ``arrow_batches`` (a pull iterator of ``pyarrow.RecordBatch``).
* The pyo3 kernel pattern — "take a RecordBatch, compute, return a
  RecordBatch" (`pyo3/src/lib.rs:86-94`) → ``map_in_arrow``: the engine's
  escape hatch for kernels Catalyst can't express. The user function sees
  Arrow batches exactly like the reference's FFI kernels do, but Spark runs
  it on every partition of a distributed DataFrame.

Scale posture: ``map_in_arrow`` is executor-side (no driver materialization,
works at any partition count); ``to_arrow``/``arrow_batches`` are *driver*
collection points — boundary/export APIs, intentionally not used inside any
query plan (the same role `export_to_c` plays in the reference).
"""

from __future__ import annotations

from typing import Callable, Iterator

import pyarrow as pa
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


# SURVEY §1.3 widening policy: Spark has no unsigned types (and rejects
# unsigned Arrow input outright), so unsigned columns widen to the next
# signed type that holds the full range — Spark's own Parquet convention.
# u64 exceeds i64 and needs decimal(20,0).
_UNSIGNED_WIDENING: dict[pa.DataType, pa.DataType] = {
    pa.uint8(): pa.int16(),
    pa.uint16(): pa.int32(),
    pa.uint32(): pa.int64(),
    pa.uint64(): pa.decimal128(20, 0),
}


def _widen_unsigned(table: pa.Table) -> pa.Table:
    fields = [
        f.with_type(_UNSIGNED_WIDENING[f.type]) if f.type in _UNSIGNED_WIDENING else f
        for f in table.schema
    ]
    target = pa.schema(fields, metadata=table.schema.metadata)
    return table.cast(target) if target != table.schema else table


def from_arrow(spark: SparkSession, data: pa.Table | pa.RecordBatch) -> DataFrame:
    """Arrow → DataFrame (reference `import_from_c`). Accepts a Table or a
    single RecordBatch; schema (incl. nullability) comes from Arrow.
    Unsigned integer columns are widened per the reference's type-mapping
    table (SURVEY §1.3: u8→short, u16→int, u32→long, u64→decimal(20,0)) —
    value-preserving over the entire unsigned range."""
    if isinstance(data, pa.RecordBatch):
        data = pa.Table.from_batches([data])
    return spark.createDataFrame(_widen_unsigned(data))


def to_arrow(df: DataFrame) -> pa.Table:
    """DataFrame → Arrow table at the driver (reference `export_to_c`)."""
    return df.toArrow()


def arrow_batches(
    df: DataFrame, batch_rows: int = 1 << 16
) -> Iterator[pa.RecordBatch]:
    """DataFrame → pull-iterator of RecordBatches (reference's stream export,
    `arrow_c_ffi.rs:2104`, a genuine pull iterator): batches stream to the
    driver one partition at a time via ``toLocalIterator`` — the first batch
    is yielded while later partitions HAVE NOT RUN yet, and peak driver
    memory is ~one partition plus one prefetched partition, never the full
    DataFrame (pinned by tests/test_arrow_io.py::test_arrow_batches_streams).

    Trade-off, stated plainly: like any single-consumer stream export the
    pull is sequential — partitions execute (with one-ahead prefetch) in
    order, so cluster parallelism is bounded while exporting. For bulk
    driver-side materialization use ``to_arrow``; for distributed Arrow
    compute stay on ``map_in_arrow`` and never collect at all."""
    from pyspark.sql.pandas.types import to_arrow_schema

    schema = to_arrow_schema(df.schema)
    buf: list[dict] = []
    for row in df.toLocalIterator(prefetchPartitions=True):
        buf.append(row.asDict(recursive=True))
        if len(buf) >= batch_rows:
            yield pa.RecordBatch.from_pylist(buf, schema=schema)
            buf = []
    if buf:
        yield pa.RecordBatch.from_pylist(buf, schema=schema)


def map_in_arrow(
    df: DataFrame,
    fn: Callable[[pa.RecordBatch], pa.RecordBatch],
    schema: T.StructType | str,
) -> DataFrame:
    """Apply a RecordBatch→RecordBatch kernel across all partitions.

    Mirrors the reference's pyo3 extension pattern (`pyo3/src/lib.rs:86-94`):
    the kernel author writes against Arrow, the engine handles distribution.
    ``fn`` must be row-count-preserving per batch only if the caller's
    semantics require it — Spark imposes no constraint."""

    def _iter(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            yield fn(batch)

    return df.mapInArrow(_iter, schema)
