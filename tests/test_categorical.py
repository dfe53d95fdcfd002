"""Dictionary-encoding round-trip and determinism (reference parity:
StringArray↔CategoricalArray, variants/string.rs:439 / categorical.rs:473)."""

from __future__ import annotations

from pyspark.sql import functions as F

from minarrow_spark.operators.categorical import (
    build_dictionary,
    dictionary_decode,
    dictionary_encode,
)


def test_roundtrip_and_code_semantics(spark):
    rows = [(1, "banana"), (2, "apple"), (3, None), (4, "banana"), (5, "cherry")]
    df = spark.createDataFrame(rows, "id long, fruit string")
    enc, dic = dictionary_encode(df, "fruit")

    # dense 0-based codes in sorted value order, one row per distinct value
    d = {r["value"]: r["code"] for r in dic.collect()}
    assert d == {"apple": 0, "banana": 1, "cherry": 2}

    e = {r["id"]: r["fruit_code"] for r in enc.collect()}
    assert e == {1: 1, 2: 0, 3: None, 4: 1, 5: 2}

    dec = dictionary_decode(enc.drop("fruit"), dic, "fruit_code", "fruit")
    out = {r["id"]: r["fruit"] for r in dec.collect()}
    assert out == {r[0]: r[1] for r in rows}  # encode ∘ decode = id (incl null)


def test_fixed_vocabulary_and_partition_invariance(spark):
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(["x", "y", "z", "w"] * 25)],
        "id long, s string",
    )
    vocab = build_dictionary(df.filter(F.col("s").isin("x", "y")), "s")
    enc, _ = dictionary_encode(df, "s", dictionary=vocab)
    got = {r["id"]: r["s_code"] for r in enc.collect()}
    assert got[0] == 0 and got[1] == 1          # in-vocab
    assert got[2] is None and got[3] is None    # out-of-vocab -> null

    # codes are partition-invariant (sorted-order contract, not appearance)
    enc7, dic7 = dictionary_encode(df.repartition(7), "s")
    enc1, dic1 = dictionary_encode(df.coalesce(1), "s")
    assert sorted(map(tuple, dic7.collect())) == sorted(map(tuple, dic1.collect()))
    assert {r["id"]: r["s_code"] for r in enc7.collect()} == {
        r["id"]: r["s_code"] for r in enc1.collect()
    }
