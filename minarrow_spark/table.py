"""MinTable — the fluent table facade mirroring the reference's user API.

The reference's primary UX is a chainable `Table`/`TableV` surface:
``table.c(["name", "age"]).r(10..20).to_table()`` (SURVEY §3.2;
`src/traits/selection.rs:71-127`), plus `Value` arithmetic broadcasting
(``table * 2``, `src/kernels/broadcast/mod.rs:116-152`) and Arrow/Polars
casts. This module binds the repo's operator functions into that shape so
a reference user can port call sites mechanically:

    t = MinTable.read_parquet(spark, path)
    t.c("name", "age").r(10, 20, order_by="id").to_pandas()
    (t * 2 + 1).filter(F.col("age") > 30).to_arrow()

Laziness matches the reference exactly: every chained call builds a
Catalyst plan (the `TableV` analog — zero work, zero copy) and only the
materializers (`to_table`/`to_arrow`/`collect`/…) execute, the same
view-until-`to_table()` contract (`table_view.rs:376`). Everything
delegates to the tested operator modules; unknown attributes fall through
to the wrapped DataFrame, so the full Spark API stays reachable.
"""

from __future__ import annotations

from collections.abc import Callable, Iterable
from typing import Any

from pyspark.sql import Column, DataFrame, SparkSession

from minarrow_spark.functions.arithmetic import table_op
from minarrow_spark.operators import projection as _proj


class MinTable:
    """Immutable fluent wrapper: each method returns a NEW MinTable over a
    refined lazy plan. Access ``.df`` for the raw DataFrame."""

    __slots__ = ("df",)

    def __init__(self, df: DataFrame):
        object.__setattr__(self, "df", df)

    # -- constructors -------------------------------------------------------

    @classmethod
    def read_parquet(cls, spark: SparkSession, path: str) -> "MinTable":
        return cls(spark.read.parquet(path))

    @classmethod
    def from_arrow(cls, spark: SparkSession, data) -> "MinTable":
        """pa.Table / pa.RecordBatch → MinTable (full import matrix:
        sources/arrow_io.from_arrow)."""
        from minarrow_spark.sources.arrow_io import from_arrow

        return cls(from_arrow(spark, data))

    @classmethod
    def from_polars(cls, spark: SparkSession, pldf) -> "MinTable":
        from minarrow_spark.sources.arrow_io import from_polars

        return cls(from_polars(spark, pldf))

    # -- selection (lazy views; reference `.c()/.r()` chain) ----------------

    def c(self, *selectors: str | int | slice) -> "MinTable":
        return MinTable(_proj.c(self.df, *selectors))

    def r(self, start: int, stop: int, order_by: str | list[str]) -> "MinTable":
        return MinTable(_proj.r(self.df, start, stop, order_by))

    def gather(self, indices: Iterable[int], order_by: str | list[str]) -> "MinTable":
        return MinTable(_proj.gather(self.df, indices, order_by))

    def rename(self, mapping: dict[str, str]) -> "MinTable":
        return MinTable(_proj.rename(self.df, mapping))

    def add_col(self, name: str, col: Column) -> "MinTable":
        return MinTable(_proj.add_col(self.df, name, col))

    def remove_cols(self, *names: str) -> "MinTable":
        return MinTable(_proj.remove_cols(self.df, *names))

    def map_col(self, name: str, f: Callable[[Column], Column]) -> "MinTable":
        return MinTable(_proj.map_col(self.df, name, f))

    def apply_cols(
        self, f: Callable[[Column], Column], cols: Iterable[str] | None = None
    ) -> "MinTable":
        return MinTable(_proj.apply_cols(self.df, f, cols))

    def filter(self, cond) -> "MinTable":
        return MinTable(self.df.filter(cond))

    def distinct(self) -> "MinTable":
        return MinTable(self.df.distinct())

    def limit(self, n: int) -> "MinTable":
        return MinTable(self.df.limit(n))

    def concat(self, other: "MinTable") -> "MinTable":
        """Vertical, schema-checked union (reference U1 concatenate)."""
        return MinTable(self.df.unionByName(other.df))

    # -- Value-style arithmetic broadcasting (reference M6/M7) --------------

    def _op(self, other, op: str) -> "MinTable":
        if isinstance(other, MinTable):
            raise TypeError(
                "table⊕table broadcasting joins on position; align on a key "
                "and use column expressions instead (see q27/table_op docs)"
            )
        return MinTable(table_op(self.df, other, op))

    def __add__(self, other):
        return self._op(other, "+")

    __radd__ = __add__

    def __sub__(self, other):
        return self._op(other, "-")

    def __mul__(self, other):
        return self._op(other, "*")

    __rmul__ = __mul__

    def __truediv__(self, other):
        return self._op(other, "/")

    def __floordiv__(self, other):
        return self._op(other, "//")

    def __mod__(self, other):
        return self._op(other, "%")

    def __pow__(self, other):
        return self._op(other, "**")

    def __neg__(self):
        return self._op(-1, "*")

    # -- schema / shape -----------------------------------------------------

    @property
    def columns(self) -> list[str]:
        return self.df.columns

    @property
    def schema(self):
        return self.df.schema

    def n_rows(self) -> int:
        return self.df.count()

    # -- materializers (reference `to_table()` and casts) -------------------

    def to_table(self) -> "MinTable":
        """Materialize the view eagerly (reference `table_view.rs:376`):
        GC-scoped localCheckpoint — downstream branches reuse the computed
        result instead of re-running the plan (see CLAUDE.md reuse rule)."""
        return MinTable(self.df.localCheckpoint(eager=True))

    def collect(self):
        return self.df.collect()

    def show(self, n: int = 20, truncate: bool = True) -> None:
        self.df.show(n, truncate)

    def to_arrow(self):
        from minarrow_spark.sources.arrow_io import to_arrow

        return to_arrow(self.df)

    def arrow_batches(self, batch_rows: int = 1 << 16):
        from minarrow_spark.sources.arrow_io import arrow_batches

        return arrow_batches(self.df, batch_rows=batch_rows)

    def to_pandas(self):
        return self.df.toPandas()

    def to_polars(self):
        from minarrow_spark.sources.arrow_io import to_polars

        return to_polars(self.df)

    def to_matrix(self, cols: list[str] | None = None):
        from minarrow_spark.sources.arrow_io import to_matrix

        return to_matrix(self.df, cols)

    def write_parquet(self, path: str, mode: str = "overwrite") -> None:
        self.df.write.mode(mode).parquet(path)

    # -- cube (third-dimension stacking; reference cube.rs) -----------------

    def stack_on(self, *axis_cols: str, name: str = "") -> "MinCube":
        """View this table as a cube indexed by ``axis_cols`` — the
        reference's `Cube.set_third_dim_index` (`cube.rs:427-432`) applied
        to an already-unified table. Validates the index exists in the
        schema (the reference's `validate_third_dim_index`)."""
        missing = [c for c in axis_cols if c not in self.df.columns]
        if missing:
            raise KeyError(f"third-dim index column(s) not in schema: {missing}")
        return MinCube(self.df, list(axis_cols), name=name)

    # -- passthrough --------------------------------------------------------

    def __getattr__(self, name: str) -> Any:
        """Fall through to the wrapped DataFrame; results that are
        DataFrames re-wrap so chains stay fluent."""
        attr = getattr(self.df, name)
        if callable(attr):

            def wrapped(*args, **kw):
                out = attr(*args, **kw)
                return MinTable(out) if isinstance(out, DataFrame) else out

            return wrapped
        return MinTable(attr) if isinstance(attr, DataFrame) else attr

    def __repr__(self) -> str:
        return f"MinTable({', '.join(self.df.columns)})"


class MinCube:
    """Tables stacked on a third-dimension index — the reference's `Cube`
    (`/root/reference/src/structs/cube.rs:77`: a `Vec<Arc<Table>>` plus
    `third_dim_index` column names and a key→position `resolver`),
    re-expressed Spark-first: ONE DataFrame carrying the axis column(s),
    where each "table in the vec" is a partition-pruned slice. This keeps
    the reference's purpose — compare snapshots without losing the
    underlying grain — while the storage idiom (partition column) is what
    actually scales: written out partitioned by the axis, `table(key)`
    reads exactly one partition directory.

    The resolver is `keys()` (distinct axis values, sorted) — like the
    reference's HashMap it is axis-cardinality-sized metadata, the one
    deliberately driver-side piece. Slices come back axis-free, matching
    the reference where member tables don't carry the index.
    """

    __slots__ = ("df", "axis_cols", "name")

    def __init__(self, df: DataFrame, axis_cols: list[str], name: str = ""):
        object.__setattr__(self, "df", df)
        object.__setattr__(self, "axis_cols", list(axis_cols))
        object.__setattr__(self, "name", name)

    @classmethod
    def stack(
        cls,
        tables: dict[Any, "MinTable | DataFrame"],
        axis_col: str = "axis",
        name: str = "",
    ) -> "MinCube":
        """Build a cube from keyed member tables (`Cube::new` +
        `push`/resolver maintenance, `cube.rs:96,427`): each table gets its
        key as the axis column, members union by name."""
        from pyspark.sql import functions as F

        if not tables:
            raise ValueError("MinCube.stack needs at least one table")
        dfs = []
        for key, t in tables.items():
            d = t.df if isinstance(t, MinTable) else t
            dfs.append(d.withColumn(axis_col, F.lit(key)))
        out = dfs[0]
        for d in dfs[1:]:
            out = out.unionByName(d)
        return cls(out, [axis_col], name=name)

    def third_dim_index(self) -> list[str]:
        return list(self.axis_cols)

    def keys(self) -> list[tuple]:
        """Sorted distinct axis values (the resolver's key set). Axis
        cardinality is snapshot-count-sized — driver-side by design."""
        return [
            tuple(r)
            for r in self.df.select(*self.axis_cols)
            .distinct()
            .orderBy(*self.axis_cols)
            .collect()
        ]

    def table(self, *key: Any) -> "MinTable":
        """The member table at ``key`` (`cube.rs` resolver lookup), without
        the axis columns — a partition-pruned filter, O(slice) at rest."""
        from pyspark.sql import functions as F

        if len(key) != len(self.axis_cols):
            raise KeyError(
                f"cube indexed by {self.axis_cols}, got {len(key)} key part(s)"
            )
        cond = F.lit(True)
        for c, v in zip(self.axis_cols, key):
            cond = cond & (F.col(c) == F.lit(v))
        return MinTable(self.df.filter(cond).drop(*self.axis_cols))

    def tables(self):
        """Iterate (key, MinTable) in sorted key order (`Cube::tables`)."""
        for key in self.keys():
            yield key, self.table(*key)

    def col_across(self, name: str) -> DataFrame:
        """A column viewed across every member table, keyed by the axis
        (`Cube::col` iteration, `cube.rs:415`)."""
        if name not in self.df.columns:
            raise KeyError(f"column {name!r} not in cube schema")
        return self.df.select(*self.axis_cols, name)

    def to_table(self, axis_cols: bool = True) -> "MinTable":
        """Collapse back to the unified grain table."""
        return MinTable(self.df if axis_cols else self.df.drop(*self.axis_cols))

    def __repr__(self) -> str:
        return f"MinCube(axis={self.axis_cols}, cols={self.df.columns})"
