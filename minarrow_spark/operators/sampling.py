"""Deterministic hash-based sampling and dataset splits for training-data
pipelines.

At 100 TB, `df.sample()` (per-row RNG) is the wrong tool for anything that
must be reproducible or joinable: reruns see different rows, and two tables
sampled "the same way" don't align. The standard fix is HASH sampling — a
row is kept iff a salted hash of its key falls below a threshold:

* deterministic: the same key always lands on the same side, on any run,
  any partition count, any engine;
* joinable: sampling two fact tables by the same key yields aligned
  samples (all lineitems of a sampled order survive together);
* streamable: a pure projection+filter — no shuffle, no state, applies
  identically in batch and Structured Streaming.

Portability: hashes are md5-hex and thresholds are hex-string prefixes —
`substr(md5(salt|key), 1, 8) < hex_threshold(p)` — so a DuckDB/any-engine
oracle reproduces the exact sample (lexicographic order on hex = numeric
order). Granularity is 16^-8 ≈ 2.3e-10 of the keyspace per threshold step.

Reference parity: the reference's sampling estimators
(`/root/reference/src/utils.rs:327,348`) draw simple random samples inside
one process; these operators are the distributed, reproducible counterpart
(beyond-reference extension ops, same family as dedup/similarity).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_HEX_CHARS = 8  # 32-bit threshold space


def hex_threshold(fraction: float, chars: int = _HEX_CHARS) -> str:
    """Hex-string threshold t such that P(md5_prefix < t) == round
    (fraction × 16^chars) / 16^chars for a uniform hash.

    Comparisons are lexicographic on fixed-width hex, which equals numeric
    order ONLY at equal length — so fraction 1.0 (numerically 16^chars, a
    longer string) maps to "g", which sorts after every hex digit and
    therefore keeps everything."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    steps = round(fraction * 16**chars)
    if steps >= 16**chars:
        return "g"
    return format(steps, f"0{chars}x")


def hash_key(key: Column, salt: str = "") -> Column:
    """Salted uniform hash prefix of a key column (md5 hex, 8 chars).
    Different salts give independent samples over the same keys."""
    return F.substring(
        F.md5(F.concat(F.lit(f"{salt}|"), key.cast("string"))), 1, _HEX_CHARS
    )


def sample_mask(key: Column, fraction: float, salt: str = "") -> Column:
    """Boolean keep-mask: deterministic `fraction` sample by key."""
    return hash_key(key, salt) < F.lit(hex_threshold(fraction))


def hash_sample(
    df: DataFrame, key: str, fraction: float, salt: str = ""
) -> DataFrame:
    """Deterministic key-hash sample: a pure filter (no shuffle, no RNG
    state). Same keys survive on every run and in every co-sampled table."""
    return df.filter(sample_mask(F.col(key), fraction, salt))


def stratified_hash_sample(
    df: DataFrame, key: str, strata: str, fractions: dict[str, float],
    default: float = 0.0, salt: str = "",
) -> DataFrame:
    """Per-stratum deterministic sampling — the training-mix lever (e.g.
    keep 100% of rare high-quality sources, 5% of crawl). Strata absent
    from ``fractions`` fall back to ``default``. Still a pure projection —
    the per-stratum threshold is a CASE expression, no shuffle."""
    thr = F.lit(hex_threshold(default))
    for value, frac in fractions.items():
        thr = F.when(F.col(strata) == value, F.lit(hex_threshold(frac))).otherwise(thr)
    return df.filter(hash_key(F.col(key), salt) < thr)


def train_test_split(
    df: DataFrame, key: str, test: float, val: float = 0.0, salt: str = "split"
) -> DataFrame:
    """Attach a deterministic 'split' column ('test' / 'val' / 'train') by
    key hash: disjoint, exhaustive, reproducible, and leak-proof — every
    row of a key lands in exactly one split on every engine and every run
    (the property per-row RNG splits silently violate)."""
    if test + val > 1.0:
        raise ValueError("test + val fractions exceed 1.0")
    h = hash_key(F.col(key), salt)
    return df.withColumn(
        "split",
        F.when(h < F.lit(hex_threshold(test)), F.lit("test"))
        .when(h < F.lit(hex_threshold(test + val)), F.lit("val"))
        .otherwise(F.lit("train")),
    )


def epoch_shuffle(
    df: DataFrame,
    key: Column | str,
    epoch: int,
    n_partitions: int | None = None,
) -> DataFrame:
    """Deterministic training-epoch shuffle: a reproducible global random
    order, re-derived per epoch — the distributed analog of shuffling the
    dataset between training epochs.

    Order key = md5(epoch | key): uniformly random but a pure function of
    (epoch, key), so the order is identical on any rerun, any partition
    count, any engine — and changes completely between epochs. The layout
    is one range exchange on the hash + a within-partition sort (exactly a
    global sort's cost); downstream sequential readers (sequence packing,
    batch writers) consume partitions in order. No per-row RNG, no driver
    state, no collect.
    """
    k = F.col(key) if isinstance(key, str) else key
    h = F.md5(F.concat(F.lit(f"e{epoch}|"), k.cast("string")))
    parts = n_partitions or df.sparkSession.sparkContext.defaultParallelism
    return (
        df.withColumn("__eo", h)
        .repartitionByRange(parts, "__eo")
        .sortWithinPartitions("__eo")
        .drop("__eo")
    )


def weighted_sample_topk(
    df: DataFrame,
    key: str,
    weight: Column | str,
    k: int,
    salt: str = "",
    digits: int = 6,
) -> DataFrame:
    """Deterministic weighted random sample WITHOUT replacement of size
    ``k`` — Efraimidis–Spirakis A-ES with the hash-uniform trick: each row
    draws u = uniform(key-hash) ∈ (0, 1] and scores priority
    ln(u) / w (the monotone form of u^(1/w)); the k HIGHEST priorities are
    an exact weighted sample (inclusion ∝ weight, heavier rows win their
    "coin flips" more often). The training-data use: sample documents
    proportional to quality/importance scores, reproducibly.

    Determinism: u is a pure function of (salt, key); ln rounds per value
    to ``digits`` (house transcendental contract) before ranking; ties
    break on key. Top-k plans as TakeOrderedAndProject — per-partition
    heads then a k-row merge, no global sort, no RNG state; the same
    expression replays in any SQL engine (cross-checked against DuckDB in
    tests/test_sampling.py).

    Weights must be strictly positive; null/non-positive weights raise at
    runtime via an ANSI-style filter contract (rows with w <= 0 are
    dropped before ranking, documented rather than silent: a zero-weight
    row can never be sampled under A-ES).
    """
    w = F.col(weight) if isinstance(weight, str) else weight
    u = (
        F.conv(hash_key(F.col(key), salt), 16, 10).cast("double") + 1.0
    ) / float(16**_HEX_CHARS)
    prio = F.round(F.log(u) / w, digits)
    return (
        df.filter(w > 0)
        .withColumn("__prio", prio)
        .orderBy(F.col("__prio").desc(), F.col(key))
        .limit(k)
        .drop("__prio")
    )
