"""Selection/column-surgery semantics (SURVEY §2.2 P1-P5), mirroring the
reference's `tests/test_selection.rs` canonical-small-table strategy."""

from pyspark.sql import functions as F

from minarrow_spark.operators import projection as P
from minarrow_spark.sources.catalog import load_table


def _nation(spark, sf_dir):
    return load_table(spark, sf_dir, "nation")


def test_c_by_name_index_slice(spark, sf_dir):
    n = _nation(spark, sf_dir)
    assert P.c(n, "n_name", "n_regionkey").columns == ["n_name", "n_regionkey"]
    assert P.c(n, 0, 1).columns == n.columns[:2]
    assert P.c(n, slice(1, 3)).columns == n.columns[1:3]


def test_r_window_and_gather(spark, sf_dir):
    n = _nation(spark, sf_dir)
    first3 = P.r(n, 0, 3, "n_nationkey")
    assert [x.n_nationkey for x in first3.collect()] == [0, 1, 2]
    mid = P.r(n, 5, 8, "n_nationkey")
    assert [x.n_nationkey for x in mid.collect()] == [5, 6, 7]
    picked = P.gather(n, [0, 4, 9], "n_nationkey")
    assert [x.n_nationkey for x in picked.collect()] == [0, 4, 9]


def test_rename_add_remove(spark, sf_dir):
    n = _nation(spark, sf_dir)
    out = P.rename(n, {"n_name": "name"})
    assert "name" in out.columns and "n_name" not in out.columns
    out = P.add_col(n, "flag", F.lit(1))
    assert out.columns[-1] == "flag"
    out = P.remove_cols(n, "n_comment") if "n_comment" in n.columns else P.remove_cols(n, "n_name")
    assert len(out.columns) == len(n.columns) - 1


def test_map_and_apply_cols(spark, sf_dir):
    n = _nation(spark, sf_dir)
    up = P.map_col(n, "n_name", F.upper)
    row = up.orderBy("n_nationkey").first()
    assert row.n_name == row.n_name.upper()
    doubled = P.apply_cols(
        n.select("n_nationkey", "n_regionkey"), lambda col: col * 2
    )
    r0 = doubled.orderBy("n_nationkey").collect()[2]
    assert r0.n_nationkey == 4


def test_show_sink_smoke(spark, sf_dir):
    # S9 print/display sink (`src/traits/print.rs`): render without error.
    s = _nation(spark, sf_dir)._show_string(3, 20, False)
    assert "n_nationkey" in s
