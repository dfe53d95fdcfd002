"""Join helpers beyond Spark's built-ins: as-of join (SURVEY §2.3 J7).

Spark has no native as-of join pre-4.x `asofJoin` API on plain DataFrames;
the scalable classic is the union + last-observation-carried-forward window:

  1. tag left/right rows and union them (schema-aligned),
  2. one window per partition key ordered by (ts, tag, tiebreak),
  3. `last(payload, ignorenulls=True)` over an unbounded-preceding frame,
  4. keep the left rows.

Cost: ONE shuffle on the partition key + a sort — same as a sort-merge join,
no per-group Python. This beats `applyInPandas`+`pd.merge_asof` (which ships
every group through Arrow) by keeping the whole plan in Tungsten.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    payload: list[str],
    allow_exact: bool = True,
    tiebreak: str | None = None,
) -> DataFrame:
    """For each left row, attach the payload of the latest right row with
    right_ts <= left_ts (or < when ``allow_exact=False``), per ``on`` key.

    Left columns are all preserved; payload columns come back null when no
    earlier right row exists (left-outer as-of semantics).

    ``tiebreak`` names a right-side column that uniquely orders right rows
    sharing the same (key, ts) — the winner is the max under that order.
    When omitted, the payload tuple itself breaks ties, which is total
    unless two right rows carry byte-identical payloads (where the choice
    is immaterial). Either way the attached payload is deterministic under
    any partitioning — the engine-wide determinism rule (registry.py).
    """
    # Right rows sort before left rows at equal ts when exact matches count.
    right_tag, left_tag = (0, 1) if allow_exact else (1, 0)

    lt = left.withColumn("__ts", F.col(left_ts)).withColumn("__tag", F.lit(left_tag))
    for c in payload:
        lt = lt.withColumn(f"__p_{c}", F.lit(None).cast(right.schema[c].dataType))

    tb_cols = [tiebreak] if tiebreak else payload
    lt = lt.withColumn(
        "__tb",
        F.lit(None).cast(
            right.select(F.struct(*tb_cols).alias("s")).schema["s"].dataType
        ),
    )

    rt = right.select(
        F.col(on),
        F.col(right_ts).alias("__ts"),
        F.lit(right_tag).alias("__tag"),
        F.struct(*tb_cols).alias("__tb"),
        *[F.col(c).alias(f"__p_{c}") for c in payload],
    )
    for c in lt.columns:
        if c not in rt.columns:
            rt = rt.withColumn(c, F.lit(None).cast(lt.schema[c].dataType))
    rt = rt.select(*lt.columns)

    u = lt.unionByName(rt)
    # Tie-break sorts nulls (left rows) first among equal (__ts, __tag) —
    # irrelevant there since tags already separate sides; among right rows
    # it makes `last()` pick the max-tiebreak payload deterministically.
    w = (
        W.partitionBy(on)
        .orderBy("__ts", "__tag", F.col("__tb").asc_nulls_first())
        .rowsBetween(W.unboundedPreceding, 0)
    )
    filled = u.select(
        *[c for c in left.columns],
        F.col("__tag"),
        *[
            F.last(F.col(f"__p_{c}"), ignorenulls=True).over(w).alias(f"asof_{c}")
            for c in payload
        ],
    )
    return filled.filter(F.col("__tag") == left_tag).drop("__tag")
