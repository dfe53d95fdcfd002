"""Dictionary (categorical) encoding: string column ↔ dense int codes.

Reference parity: `StringArray::to_categorical_array`
(/root/reference/src/structs/variants/categorical.rs:103, interning at
variants/string.rs:439) materializes (codes, unique_values); the inverse is
`to_string_array` (categorical.rs:473). At the logical level Spark treats
dictionary-encoded strings as plain strings (SURVEY §1.1 — T17 recode is the
identity), but algorithms that need CODES (feature hashing, array-indexed
aggregation) want the derived int column, which is what this module adds.

Determinism note — a deliberate semantic choice: the reference assigns codes
in FIRST-APPEARANCE order, which is well-defined for a single in-memory
buffer but partition-dependent in a distributed engine. Codes here are dense
ranks of the SORTED distinct values (0-based) — the canonical deterministic
choice: stable under any partitioning, reproducible in SQL
(`dense_rank() over (order by value) - 1`), and order-isomorphic to the
values. Round-trip (encode ∘ decode = id) holds either way.

Scale shape: the dictionary is built by distinct + two-phase global ranks
(operators/ranking.py — no SinglePartition exchange), and the encode is an
equi-join of the source against the dictionary on the value — broadcast
when the dictionary is small (the common categorical case), AQE-planned
otherwise. Nulls encode to null code and decode back to null (the
reference's null-mask-with-index-0 convention, expressed Spark-natively).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from minarrow_spark.operators.ranking import global_ranks


def build_dictionary(df: DataFrame, col: str) -> DataFrame:
    """Dictionary table (code, value): dense 0-based codes over the sorted
    distinct non-null values of ``df[col]``."""
    vals = df.select(F.col(col).alias("value")).filter(
        F.col("value").isNotNull()
    ).distinct()
    return global_ranks(vals, [F.col("value")], rank_col="__rk").select(
        (F.col("__rk") - 1).cast("int").alias("code"), "value"
    )


def dictionary_encode(
    df: DataFrame, col: str, code_col: str | None = None,
    dictionary: DataFrame | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Append a dense int code column for string column ``col``.

    Returns (encoded, dictionary). Pass a prebuilt ``dictionary`` (code,
    value) to encode against a fixed vocabulary — values absent from it
    (and nulls) encode to null, the distributed analog of the reference's
    null-mask convention."""
    code_col = code_col or f"{col}_code"
    dic = dictionary if dictionary is not None else build_dictionary(df, col)
    attach = dic.select(
        F.col("value").alias(col), F.col("code").alias(code_col)
    )
    # Left join keeps nulls/out-of-vocab rows (null code). No forced
    # broadcast hint (r5 advisory): a typical dictionary is tiny and AQE's
    # runtime size stats pick broadcast-hash on their own, but a
    # high-cardinality column (IDs mistakenly encoded) must be allowed to
    # plan a shuffle join instead of driving an unbounded driver-side
    # broadcast build.
    return df.join(attach, on=col, how="left"), dic


def dictionary_decode(
    encoded: DataFrame, dictionary: DataFrame, code_col: str, out_col: str
) -> DataFrame:
    """Inverse of `dictionary_encode`: materialize the string column from
    codes (categorical.rs:473 `to_string_array`). Null codes → null."""
    attach = dictionary.select(
        F.col("code").alias(code_col), F.col("value").alias(out_col)
    )
    # Same AQE-decides posture as dictionary_encode (r5 advisory).
    return encoded.join(attach, on=code_col, how="left")
