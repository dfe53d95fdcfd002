"""Pandas-style selection & column surgery: the reference's Table/view API
(SURVEY §2.2 P1-P5) as thin DataFrame combinators.

Reference mapping:
* `.c(cols)` column selection by name/index/range (`src/traits/selection.rs:71-106`)
  → ``c(df, ...)``;
* `.r(a..b)` row-window views (`selection.rs:108-127`, `table.rs:416` slice)
  → ``r(df, a, b)``;
* `gather_rows(indices)` (`table_view.rs:787`) → ``gather(df, ...)``;
* `rename_columns` / `add_col` / `remove_col` (`table.rs:256,212,322`)
  → ``rename/add_col/remove_cols``;
* `map_col` / `apply_cols` closures (`table.rs:424-517`) → ``map_col/apply_cols``.

Everything stays a lazy plan (the reference's zero-copy views ≡ Catalyst
laziness — SURVEY §3.2). Row-window/gather semantics need a total order to be
meaningful in a distributed table, so they take an explicit ``order_by`` key:
the reference's implicit physical row order doesn't exist across partitions,
and asking for one (the sort key) is the honest distributed equivalent.
"""

from __future__ import annotations

from collections.abc import Callable, Iterable

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def c(df: DataFrame, *selectors: str | int | slice) -> DataFrame:
    """Column projection by name, index, or index-slice (reference `.c()`).

    ``c(df, "a", "b")``, ``c(df, 0, 2)``, ``c(df, slice(1, 4))`` all work,
    mirroring `FieldSelector::resolve_fields` (`selection.rs:40-59`)."""
    names: list[str] = []
    cols = df.columns
    for sel in selectors:
        if isinstance(sel, str):
            names.append(sel)
        elif isinstance(sel, int):
            names.append(cols[sel])
        elif isinstance(sel, slice):
            names.extend(cols[sel])
        else:
            raise TypeError(f"unsupported selector {sel!r}")
    return df.select(*names)


def r(df: DataFrame, start: int, stop: int, order_by: str | list[str]) -> DataFrame:
    """Row window [start, stop) in ``order_by`` order (reference `.r(a..b)`).

    start==0 plans as a limit (TakeOrderedAndProject — per-partition top-k,
    no global sort); general ranges rank through `global_ranks`
    (operators/ranking.py) — range-repartition + local rank + broadcast
    offsets, never an Exchange SinglePartition. ``order_by`` must be a
    (composite) unique key for deterministic results."""
    from minarrow_spark.operators.ranking import global_ranks

    keys = [order_by] if isinstance(order_by, str) else list(order_by)
    if start == 0:
        return df.orderBy(*keys).limit(stop)
    ranked = global_ranks(df, [F.col(k) for k in keys], rank_col="__rn")
    return (
        ranked.filter((F.col("__rn") > start) & (F.col("__rn") <= stop))
        .drop("__rn")
    )


def gather(df: DataFrame, indices: Iterable[int], order_by: str | list[str]) -> DataFrame:
    """Materialize arbitrary row positions (reference `gather_rows`,
    `table_view.rs:787`): `global_ranks` row numbers in key order (balanced
    two-phase ranking, no single-reducer window), filtered against the
    index list (small by construction)."""
    from minarrow_spark.operators.ranking import global_ranks

    keys = [order_by] if isinstance(order_by, str) else list(order_by)
    idx = [int(i) + 1 for i in indices]  # 0-based → row_number's 1-based
    ranked = global_ranks(df, [F.col(k) for k in keys], rank_col="__rn")
    return ranked.filter(F.col("__rn").isin(idx)).drop("__rn")


def rename(df: DataFrame, mapping: dict[str, str]) -> DataFrame:
    """Rename columns (reference `rename_columns`, `table.rs:256`)."""
    return df.withColumnsRenamed(mapping)


def add_col(df: DataFrame, name: str, col: Column) -> DataFrame:
    """Append a column (reference `add_col`, `table.rs:212`)."""
    return df.withColumn(name, col)


def remove_cols(df: DataFrame, *names: str) -> DataFrame:
    """Drop columns (reference `remove_col*`, `table.rs:322,333`)."""
    return df.drop(*names)


def map_col(df: DataFrame, name: str, f: Callable[[Column], Column]) -> DataFrame:
    """Transform one column in place (reference `map_col`, `table.rs:424`)."""
    return df.withColumn(name, f(F.col(name)))


def apply_cols(
    df: DataFrame,
    f: Callable[[Column], Column],
    cols: Iterable[str] | None = None,
) -> DataFrame:
    """Apply ``f`` to every column in ``cols`` (default: all) in one
    projection (reference `apply_cols`, `table.rs:436-517`)."""
    target = set(cols) if cols is not None else set(df.columns)
    return df.select(
        *[
            f(F.col(n)).alias(n) if n in target else F.col(n)
            for n in df.columns
        ]
    )
