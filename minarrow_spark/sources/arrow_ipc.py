"""Arrow IPC file format as a first-class Spark data source ("arrow_ipc")
via PySpark 4's Python DataSource API — the reference's Arrow-native IO
surface (`src/ffi/arrow_c_ffi.rs` stream import/export; SURVEY §2 S4/ST6)
expressed as a registrable format instead of helper functions:

    spark.dataSource.register(ArrowIPCDataSource)
    df = spark.read.format("arrow_ipc").load(path)      # batch read
    df.write.format("arrow_ipc").mode("overwrite").save(path)
    spark.readStream.format("arrow_ipc").load(path)     # incremental files

Scale shape: one input partition per ``.arrow`` file (file-parallel, like
the parquet reader); data crosses the Python↔JVM boundary as Arrow
RecordBatches in BOTH directions (reader yields batches, writer receives
them via ``DataSourceArrowWriter``) — no per-row Python anywhere.
Comparison predicates are PUSHED into the source (``pushFilters``) and
evaluated per batch with vectorized ``pyarrow.compute`` — filtered rows
never reach the JVM, the same scan-side pruning parquet gets from
Catalyst. The stream reader treats the directory as an append-only file
queue (offset = sorted file list), the IPC analog of the cloud-files
source.

The writer is a simple direct sink (one file per task, no commit
protocol) — suitable for interchange/export, not concurrent writers; the
parquet path stays the durable table format.
"""

from __future__ import annotations

import os
import uuid
from collections.abc import Iterator, Sequence
from dataclasses import dataclass

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.ipc as ipc
from pyspark.sql.datasource import (
    DataSource,
    DataSourceArrowWriter,
    DataSourceReader,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    IsNotNull,
    LessThan,
    LessThanOrEqual,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType


def _files(path: str) -> list[str]:
    return sorted(
        os.path.join(path, f) for f in os.listdir(path) if f.endswith(".arrow")
    )


def _ipc_schema(path: str) -> pa.Schema:
    files = _files(path)
    if not files:
        raise FileNotFoundError(f"no .arrow files under {path!r}")
    with ipc.open_file(files[0]) as r:
        return r.schema


_PC_OPS = {
    EqualTo: "equal",
    GreaterThan: "greater",
    GreaterThanOrEqual: "greater_equal",
    LessThan: "less",
    LessThanOrEqual: "less_equal",
}


def _batch_mask(batch: pa.RecordBatch, filters: Sequence[Filter]):
    """AND of the pushed predicates as one pyarrow boolean mask (vectorized,
    null-safe: SQL comparison semantics make null compare to false, which
    `pc.fill_null(..., False)` reproduces)."""
    mask = None
    for f in filters:
        col = batch.column(batch.schema.get_field_index(f.attribute[0]))
        if isinstance(f, IsNotNull):
            m = pc.is_valid(col)
        else:
            m = pc.fill_null(
                getattr(pc, _PC_OPS[type(f)])(col, pa.scalar(f.value)), False
            )
        mask = m if mask is None else pc.and_(mask, m)
    return mask


class _IPCReader(DataSourceReader):
    def __init__(self, path: str):
        self.path = path
        self.filters: list[Filter] = []

    def partitions(self):
        return [InputPartition(f) for f in _files(self.path)]

    def read(self, partition) -> Iterator[pa.RecordBatch]:
        with ipc.open_file(partition.value) as r:
            for i in range(r.num_record_batches):
                b = r.get_batch(i)
                if self.filters:
                    b = b.filter(_batch_mask(b, self.filters))
                if b.num_rows:
                    yield b


class _IPCPushdownReader(_IPCReader):
    """Variant with scan-side predicate pushdown. Opt-in via
    ``option("pushdown", "true")`` because Spark refuses any reader that
    defines ``pushFilters`` unless ``spark.sql.python.filterPushdown
    .enabled`` is true — the base reader stays usable on vanilla sessions."""

    def pushFilters(self, filters: list[Filter]):  # noqa: N802 (API name)
        """Accept single-column comparison/not-null predicates; everything
        else goes back to Spark for post-scan evaluation."""
        for f in filters:
            if (
                isinstance(f, tuple(_PC_OPS)) or isinstance(f, IsNotNull)
            ) and len(f.attribute) == 1:
                self.filters.append(f)
            else:
                yield f


@dataclass
class _WroteFile(WriterCommitMessage):
    file: str


class _IPCWriter(DataSourceArrowWriter):
    def __init__(self, path: str, overwrite: bool):
        self.path = path
        os.makedirs(path, exist_ok=True)
        if overwrite:
            for f in _files(path):
                os.remove(f)

    def write(self, iterator: Iterator[pa.RecordBatch]) -> WriterCommitMessage:
        out = os.path.join(self.path, f"part-{uuid.uuid4().hex}.arrow")
        writer, wrote = None, None
        for b in iterator:
            if writer is None:
                writer = ipc.new_file(out, b.schema)
                wrote = out
            writer.write_batch(b)
        if writer is not None:
            writer.close()
        return _WroteFile(wrote or "")

    def commit(self, messages):
        return None

    def abort(self, messages):
        for m in messages:
            if m and m.file and os.path.exists(m.file):
                os.remove(m.file)


class _IPCStreamReader(SimpleDataSourceStreamReader):
    """Append-only file-queue stream: offset = count of (sorted) files
    already consumed; each micro-batch drains the newly arrived files."""

    def __init__(self, path: str):
        self.path = path

    def initialOffset(self):  # noqa: N802
        return {"n": 0}

    def _rows(self, files: list[str]):
        for f in files:
            with ipc.open_file(f) as r:
                for i in range(r.num_record_batches):
                    for t in r.get_batch(i).to_pylist():
                        yield tuple(t.values())

    def read(self, start):
        # a LIST, not a generator: Spark's prefetch cache copy.copy()s the
        # iterator for replay between offset commits
        files = _files(self.path)
        n0 = start["n"]
        return list(self._rows(files[n0:])), {"n": len(files)}

    def readBetweenOffsets(self, start, end):  # noqa: N802
        return list(self._rows(_files(self.path)[start["n"] : end["n"]]))


class ArrowIPCDataSource(DataSource):
    """Register with ``spark.dataSource.register(ArrowIPCDataSource)``; the
    path comes from ``.load(path)`` / ``.save(path)`` or ``option("path")``."""

    @classmethod
    def name(cls) -> str:
        return "arrow_ipc"

    def _path(self) -> str:
        p = self.options.get("path")
        if not p:
            raise ValueError("arrow_ipc requires a path")
        return p

    def schema(self):
        from pyspark.sql.pandas.types import from_arrow_schema

        return from_arrow_schema(_ipc_schema(self._path()))

    def reader(self, schema: StructType):
        if self.options.get("pushdown", "").lower() == "true":
            return _IPCPushdownReader(self._path())
        return _IPCReader(self._path())

    def writer(self, schema: StructType, overwrite: bool):
        return _IPCWriter(self._path(), overwrite)

    def simpleStreamReader(self, schema: StructType):  # noqa: N802
        return _IPCStreamReader(self._path())
