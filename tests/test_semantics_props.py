"""Property-based semantics pinning (hypothesis): the reference's
small-array-with-edge-cases unit style (`src/kernels/arithmetic/mod.rs:63-509`
— dense/masked/div-by-zero/negative suites), generalized to random vectors.

Each property batches the generated examples into ONE Spark job per test
(hypothesis drives generation, Spark evaluates the whole batch) and compares
against plain-Python reference semantics:

* floordiv → Python `//` (both round toward −∞), null on zero divisor
* remainder → C semantics (dividend sign), null on zero divisor
* try_div → null on zero divisor, IEEE otherwise
* find0 → Python str.find (0-based, −1 absent)
* char/byte length → len(s) vs len(s.encode())
"""

from __future__ import annotations

import math

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from minarrow_spark.functions.arithmetic import (
    floordiv,
    floordiv_int,
    remainder,
    try_div,
)
from minarrow_spark.functions.strings import byte_length, char_length, find0

INTS = st.integers(min_value=-10_000, max_value=10_000)
# Full signed-64 range minus the lone overflow case (LONG_MIN // -1): pins
# that the integer floordiv path is exact where the double path loses
# precision (|quotient| > 2^53) — the reference's checked signed-int
# FloorDiv (`src/enums/operators.rs:41-47`).
BIGINTS = st.integers(min_value=-(2**63) + 1, max_value=2**63 - 1)
TEXT = st.text(
    alphabet=st.characters(codec="utf-8", exclude_categories=("Cs",)),
    max_size=24,
)


def _eval_pairs(spark, pairs, exprs):
    df = spark.createDataFrame(pairs, "a long, b long")
    return df.select(*exprs).collect()


@settings(max_examples=30, deadline=None)
@given(st.lists(st.tuples(INTS, INTS), min_size=1, max_size=50))
def test_int_division_semantics(spark, pairs):
    rows = _eval_pairs(
        spark,
        pairs,
        [
            "a",
            "b",
            floordiv(F.col("a"), F.col("b")).alias("fd"),
            remainder(F.col("a"), F.col("b")).alias("rem"),
            try_div(F.col("a"), F.col("b")).alias("td"),
        ],
    )
    for r in rows:
        if r.b == 0:
            assert r.fd is None and r.rem is None and r.td is None
        else:
            assert r.fd == r.a // r.b, (r.a, r.b, r.fd)
            assert r.rem == int(math.fmod(r.a, r.b)), (r.a, r.b, r.rem)
            assert abs(r.td - r.a / r.b) < 1e-12


@settings(max_examples=25, deadline=None)
@given(st.lists(st.tuples(BIGINTS, BIGINTS), min_size=1, max_size=50))
def test_int_floordiv_exact_full_range(spark, pairs):
    rows = _eval_pairs(
        spark,
        pairs,
        ["a", "b", floordiv_int(F.col("a"), F.col("b")).alias("fd")],
    )
    for r in rows:
        if r.b == 0:
            assert r.fd is None
        else:
            assert r.fd == r.a // r.b, (r.a, r.b, r.fd)


@settings(max_examples=25, deadline=None)
@given(st.lists(st.tuples(BIGINTS, INTS), min_size=1, max_size=50))
def test_checked_narrowing_cast(spark, pairs):
    """Narrowing-cast policy (reference checked TryFrom,
    `conversions.rs:80-1000`): out-of-range → null, in-range → identity.
    Never a silent wraparound."""
    from minarrow_spark.functions.arithmetic import checked_cast

    rows = _eval_pairs(
        spark,
        pairs,
        [
            "a",
            checked_cast(F.col("a"), "int").alias("i32"),
            checked_cast(F.col("a"), "smallint").alias("i16"),
            checked_cast(F.col("a"), "tinyint").alias("i8"),
        ],
    )
    for r in rows:
        for val, lo, hi in (
            (r.i32, -(2**31), 2**31 - 1),
            (r.i16, -(2**15), 2**15 - 1),
            (r.i8, -(2**7), 2**7 - 1),
        ):
            if lo <= r.a <= hi:
                assert val == r.a, (r.a, val)
            else:
                assert val is None, (r.a, val)


@settings(max_examples=50, deadline=None)
@given(
    st.floats(min_value=0.0, max_value=1.0, allow_nan=False),
    st.floats(min_value=0.0, max_value=1.0, allow_nan=False),
)
def test_hex_threshold_properties(p, q):
    """Sampling threshold invariants (no Spark needed): monotone in the
    fraction, fixed-width (or the keep-all sentinel), and the kept fraction
    of the keyspace equals round(p·16^8)/16^8 exactly."""
    from minarrow_spark.operators.sampling import hex_threshold

    tp, tq = hex_threshold(p), hex_threshold(q)
    if p <= q:
        # "g" sorts after every hex string — mirrors the engine comparison
        assert tp <= tq or tq == "g"
    assert tp == "g" or (len(tp) == 8 and int(tp, 16) == round(p * 16**8))


@settings(max_examples=20, deadline=None)
@given(st.lists(st.tuples(TEXT, st.text(max_size=3)), min_size=1, max_size=30))
def test_string_length_and_find(spark, items):
    df = spark.createDataFrame(items, "s string, needle string")
    rows = df.select(
        "s",
        char_length(F.col("s")).alias("chars"),
        byte_length(F.col("s")).alias("bytes"),
    ).collect()
    for r in rows:
        assert r.chars == len(r.s), (r.s, r.chars)
        assert r.bytes == len(r.s.encode("utf-8")), (r.s, r.bytes)


@settings(max_examples=20, deadline=None)
@given(
    st.lists(
        st.tuples(st.text(alphabet="abcde ", max_size=16), st.text(alphabet="abc", min_size=1, max_size=2)),
        min_size=1,
        max_size=30,
    )
)
def test_find0_matches_python_find(spark, items):
    df = spark.createDataFrame(items, "s string, needle string")
    # find0 takes a literal pattern → evaluate per distinct needle
    needles = sorted({n for _, n in items})
    for needle in needles:
        rows = (
            df.filter(F.col("needle") == needle)
            .select("s", find0(F.col("s"), needle).alias("idx"))
            .collect()
        )
        for r in rows:
            assert r.idx == r.s.find(needle), (r.s, needle, r.idx)
