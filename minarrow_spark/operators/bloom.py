"""Bloom-filter semi-join pre-filtering — prune a huge fact scan against a
compact membership sketch of the dim keys BEFORE any shuffle.

The 100 TB pattern: a semi/inner join against a selective dim shuffles the
whole fact side first. Building a Bloom filter of the dim keys (KBs–MBs
regardless of fact size) and filtering the fact scan with it drops
non-matching rows AT THE SCAN, so the shuffle carries only plausible
matches — Spark's own runtime row-group filtering, surfaced as an explicit,
deterministic operator (the built-in `bloom_filter_agg` expression is not
registered for SQL, and its hash is engine-private; this one is salted md5,
so any engine replays the exact bits).

Design: k hash positions per key from md5 slices; the filter is an array
of 64-bit words OR-combined (commutative, order-free → deterministic under
any partitioning). Build = one map-side-combined groupBy over n_words
rows; the collected words are MODEL STATE (n_bits/8 bytes). Probe = a pure
projection filter with the words as literals — zero shuffle, streamable.
Bloom guarantees: NO false negatives (the exact join after the pre-filter
returns precisely the true matches); false positives only cost wasted
shuffle rows (rate set by n_bits/n_keys and n_hashes).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _positions(key: Column, n_hashes: int, n_bits: int) -> list[Column]:
    """k deterministic bit positions: md5("h{i}|" + key) first 8 hex chars
    as an int, mod n_bits. Salted per hash index — independent functions."""
    return [
        (
            F.conv(
                F.substring(F.md5(F.concat(F.lit(f"h{i}|"), key.cast("string"))), 1, 8),
                16,
                10,
            ).cast("long")
            % n_bits
        )
        for i in range(n_hashes)
    ]


def bloom_build(
    keys: DataFrame, key: str, n_hashes: int = 4, n_bits: int = 1 << 14
) -> list[int]:
    """Build the filter over ``keys[key]`` (distinct not required — OR is
    idempotent). Returns the word array (python ints, n_bits/64 longs) —
    model state, broadcast into probes as literals."""
    if n_bits % 64:
        raise ValueError("n_bits must be a multiple of 64")
    pos = _positions(F.col(key), n_hashes, n_bits)
    bits = keys.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        (p / 64).cast("long").alias("w"),
                        F.call_function(
                            "shiftleft", F.lit(1).cast("long"), (p % 64).cast("int")
                        ).alias("b"),
                    )
                    for p in pos
                ]
            )
        ).alias("e")
    )
    got = {
        r["w"]: r["b"]
        for r in bits.groupBy("e.w").agg(F.bit_or("e.b").alias("b")).collect()
    }
    return [got.get(w, 0) for w in range(n_bits // 64)]


def bloom_might_contain(
    key: Column, words: list[int], n_hashes: int = 4, n_bits: int = 1 << 14
) -> Column:
    """Membership test against a built filter — a pure codegen expression
    (k md5s + k bit probes into a literal array), no shuffle, no Python."""
    warr = F.array(*[F.lit(int(w)).cast("long") for w in words])
    cond = None
    for p in _positions(key, n_hashes, n_bits):
        hit = (
            F.element_at(warr, (p / 64).cast("int") + 1).bitwiseAND(
                F.call_function(
                    "shiftleft", F.lit(1).cast("long"), (p % 64).cast("int")
                )
            )
            != 0
        )
        cond = hit if cond is None else (cond & hit)
    return cond


def bloom_semi_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    n_hashes: int = 4,
    n_bits: int = 1 << 14,
) -> DataFrame:
    """Exact left-semi join with Bloom scan pruning: filter the fact scan
    by the dim-key filter (drops most non-matches before the shuffle),
    then the exact semi-join removes the false positives — results are
    IDENTICAL to ``fact.join(dim, on, "left_semi")`` at a fraction of the
    shuffled rows."""
    words = bloom_build(dim.select(on), on, n_hashes, n_bits)
    pruned = fact.filter(bloom_might_contain(F.col(on), words, n_hashes, n_bits))
    return pruned.join(dim.select(on).distinct(), on, "left_semi")
