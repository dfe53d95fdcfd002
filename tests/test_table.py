"""MinTable fluent facade: the reference's `.c().r().to_table()` chain,
Value-style arithmetic broadcasting, Arrow casts, and DataFrame
passthrough — all delegating to the already-tested operator modules."""

from __future__ import annotations

import os

import pyarrow as pa
import pytest
from pyspark.sql import functions as F

from minarrow_spark import MinTable
from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def nation(spark):
    return MinTable.read_parquet(spark, os.path.join(SF_SMALL, "nation.parquet"))


def test_selection_chain_matches_reference_semantics(nation):
    # table.c(["name","key"]).r(5..10).to_table() — SURVEY §3.2
    t = nation.c("n_name", "n_nationkey").r(5, 10, order_by="n_nationkey")
    rows = sorted(r["n_nationkey"] for r in t.collect())
    assert rows == [5, 6, 7, 8, 9]  # rows [5,10) in key order
    assert t.columns == ["n_name", "n_nationkey"]
    # index + slice selectors resolve against the current column list
    assert nation.c(0).columns == [nation.columns[0]]
    assert nation.c(slice(1, 3)).columns == nation.columns[1:3]
    # gather arbitrary positions
    g = nation.gather([0, 3, 7], order_by="n_nationkey")
    assert sorted(r["n_nationkey"] for r in g.collect()) == [0, 3, 7]


def test_value_arithmetic_broadcasting(nation):
    t2 = (nation.c("n_nationkey", "n_name") * 2 + 1).filter(
        F.col("n_nationkey") < 10
    )
    got = {r["n_name"]: r["n_nationkey"] for r in t2.collect()}
    base = {
        r["n_name"]: r["n_nationkey"]
        for r in nation.filter(F.col("n_nationkey") * 2 + 1 < 10).collect()
    }
    # string column passed through untouched; numeric transformed
    for name, v in base.items():
        assert got[name] == v * 2 + 1
    neg = (-nation.c("n_nationkey")).collect()
    assert sorted(r["n_nationkey"] for r in neg)[0] == -24
    with pytest.raises(TypeError):
        nation + nation  # table⊕table needs key alignment — explicit error


def test_arrow_roundtrip_and_passthrough(spark, nation):
    at = nation.c("n_nationkey", "n_name").to_arrow()
    assert isinstance(at, pa.Table) and at.num_rows == 25
    back = MinTable.from_arrow(spark, at)
    assert back.n_rows() == 25
    # unknown attrs fall through to DataFrame and re-wrap fluent
    t = nation.select("n_nationkey").where(F.col("n_nationkey") == 3)
    assert isinstance(t, MinTable)
    assert t.n_rows() == 1
    assert nation.concat(nation).n_rows() == 50


def test_to_table_materializes(nation):
    t = (nation * 3).to_table()
    # the checkpointed plan is a materialized scan, not the arithmetic tree
    assert "LogicalRDD" in t.df._jdf.queryExecution().logical().toString()
    assert t.n_rows() == 25


def test_cube_stack_and_slice(spark):
    """Reference Cube parity (cube.rs:77,427-432) on a 3-table fixture:
    stacked members slice back exactly, resolver keys sort, col_across
    carries the axis, stack_on validates the index."""
    from minarrow_spark.table import MinCube, MinTable

    days = {
        "2024-01-02": [(1, 10.0), (2, 20.0)],
        "2024-01-01": [(1, 11.0), (3, 30.0)],
        "2024-01-03": [(2, 21.0)],
    }
    tables = {
        d: MinTable(spark.createDataFrame(rows, "id long, v double"))
        for d, rows in days.items()
    }
    cube = MinCube.stack(tables, axis_col="day", name="snap")

    assert cube.keys() == [("2024-01-01",), ("2024-01-02",), ("2024-01-03",)]
    assert cube.third_dim_index() == ["day"]
    for d, rows in days.items():  # per-axis slice == the member table
        got = sorted(tuple(r) for r in cube.table(d).collect())
        assert got == sorted(rows)
        assert cube.table(d).columns == ["id", "v"]  # axis-free, like the ref

    across = sorted((r["day"], r["v"]) for r in cube.col_across("v").collect())
    assert across == [
        ("2024-01-01", 11.0), ("2024-01-01", 30.0),
        ("2024-01-02", 10.0), ("2024-01-02", 20.0),
        ("2024-01-03", 21.0),
    ]

    # round-trip through the unified grain + stack_on with validation
    flat = cube.to_table()
    again = flat.stack_on("day")
    assert again.keys() == cube.keys()
    import pytest as _pytest

    with _pytest.raises(KeyError):
        flat.stack_on("nope")
    with _pytest.raises(KeyError):
        cube.table("2024-01-01", "extra")
