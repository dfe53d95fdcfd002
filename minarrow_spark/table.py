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
