"""The "arrow_ipc" Python data source: batch read (file-parallel, Arrow
batches both directions), vectorized filter pushdown, direct-sink write,
and the append-only file-queue stream reader."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.ipc as ipc
import pytest
from pyspark.sql import functions as F

from minarrow_spark.sources.arrow_ipc import ArrowIPCDataSource


@pytest.fixture(scope="module")
def registered(spark):
    spark.dataSource.register(ArrowIPCDataSource)
    return spark


def _write_ipc(path: str, tables: list[pa.Table]) -> None:
    os.makedirs(path, exist_ok=True)
    for i, t in enumerate(tables):
        with ipc.new_file(os.path.join(path, f"p{i}.arrow"), t.schema) as w:
            w.write_table(t)


@pytest.fixture()
def ipc_dir(tmp_path):
    t1 = pa.table({"k": [1, 2, 3], "v": [10.5, None, 30.25], "s": ["a", "b", "c"]})
    t2 = pa.table({"k": [4, 5], "v": [40.0, 50.0], "s": ["d", None]})
    path = str(tmp_path / "ipc")
    _write_ipc(path, [t1, t2])
    return path


def test_read_roundtrip_and_partitioning(registered, ipc_dir):
    df = registered.read.format("arrow_ipc").load(ipc_dir)
    assert df.rdd.getNumPartitions() == 2  # one per .arrow file
    rows = sorted((r["k"], r["v"], r["s"]) for r in df.collect())
    assert rows == [
        (1, 10.5, "a"), (2, None, "b"), (3, 30.25, "c"),
        (4, 40.0, "d"), (5, 50.0, None),
    ]


def test_filter_pushdown_correct(registered, ipc_dir):
    registered.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    try:
        df = (
            registered.read.format("arrow_ipc")
            .option("pushdown", "true")
            .load(ipc_dir)
        )
        got = sorted(
            r["k"]
            for r in df.filter((F.col("k") > 1) & (F.col("v") <= 40.0)).collect()
        )
        assert got == [3, 4]  # null v (k=2) correctly dropped by the pushed filter
        # a predicate the source can't push (string contains) still evaluates
        got2 = sorted(r["k"] for r in df.filter(F.col("s").contains("d")).collect())
        assert got2 == [4]
        assert df.filter(F.col("v").isNotNull()).count() == 4
    finally:
        registered.conf.unset("spark.sql.python.filterPushdown.enabled")


def test_write_then_pyarrow_reads_back(registered, tmp_path):
    src = registered.createDataFrame(
        [(i, float(i) / 4, f"s{i}") for i in range(100)], "k long, v double, s string"
    ).repartition(3)
    out = str(tmp_path / "out")
    src.write.format("arrow_ipc").mode("overwrite").save(out)
    files = [f for f in os.listdir(out) if f.endswith(".arrow")]
    assert 1 <= len(files) <= 3
    got = pa.concat_tables(
        [ipc.open_file(os.path.join(out, f)).read_all() for f in files]
    ).sort_by("k")
    assert got.column("k").to_pylist() == list(range(100))
    assert got.column("v").to_pylist() == [i / 4 for i in range(100)]
    # overwrite replaces, not appends
    src.limit(10).repartition(1).write.format("arrow_ipc").mode("overwrite").save(out)
    df2 = registered.read.format("arrow_ipc").load(out)
    assert df2.count() == 10


def test_stream_reader_drains_file_queue(registered, tmp_path, ipc_dir):
    stream = registered.readStream.format("arrow_ipc").load(ipc_dir)
    q = (
        stream.writeStream.format("memory")
        .queryName("ipc_stream_out")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    q.awaitTermination()
    assert registered.sql("SELECT count(*) c FROM ipc_stream_out").first()["c"] == 5
