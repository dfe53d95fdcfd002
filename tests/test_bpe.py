"""BPE trainer/encoder: hand-checked merge semantics on a toy histogram,
Spark↔Python encode parity, and the zero-shuffle encode plan (the q30
'bpe_*' tiers add the cross-engine DuckDB hash check)."""

from __future__ import annotations

from pyspark.sql import functions as F

from minarrow_spark.operators.bpe import (
    SEP,
    bpe_encode,
    bpe_tokens,
    bpe_train,
    symbolize,
    word_histogram,
)


def test_train_toy_histogram_hand_checked():
    # classic BPE example: ("low",5) ("lower",2) ("newest",6) ("widest",3)
    hist = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
    merges = bpe_train(hist, merges=4)
    # pair counts round 1: e|s and s|t both 9 (newest+widest); tie breaks
    # lexicographically to 'e|s'
    assert merges[0] == ("e|s", "es", 9)
    # round 2: es|t now 9, everything else ≤ 8
    assert merges[1] == ("es|t", "est", 9)
    # round 3: l|o appears in low+lower = 7, n|e / w|e... n|e 6, e|w 6+2? —
    # l|o (7) wins over any 6
    assert merges[2] == ("l|o", "lo", 7)
    assert merges[3] == ("lo|w", "low", 7)
    # counts are the selection-time weights, non-increasing is NOT required,
    # but every merged token must be the pair minus the separator
    for pr, merged, _ in merges:
        assert merged == pr.replace(SEP, "")


def test_single_pass_merge_is_boundary_anchored():
    # 'aaaa' with pair (a,a): ONE boundary-anchored left-to-right pass over
    # |a|a|a|a| replaces the first |a|a| and resumes past the consumed
    # boundary — result [aa, a, a], not [aa, aa]: back-to-back repeats of a
    # pair merge one site per pass (the parallel-safe variant)
    merges = bpe_train([("aaaa", 1)], merges=3)
    assert merges[0] == ("a|a", "aa", 3)  # counting includes overlaps
    # round 2 pairs: (aa,a)×1 and (a,a)×1 — tie breaks BYTEWISE, and
    # 'aa|a' < 'a|a' because 'a' (0x61) < '|' (0x7c)
    assert merges[1] == ("aa|a", "aaa", 1)
    assert merges[2] == ("aaa|a", "aaaa", 1)


def test_spark_encode_matches_trainer_state(spark):
    hist = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
    merges = bpe_train(hist, merges=6)
    pairs = [pr for pr, _, _ in merges]
    df = spark.createDataFrame(hist, ["w", "f"])
    enc = df.select(
        "w", bpe_tokens(bpe_encode(symbolize(F.col("w")), pairs)).alias("toks")
    )
    got = {r["w"]: list(r["toks"]) for r in enc.collect()}
    # python replay of the same replace chain
    for w, _ in hist:
        s = SEP + SEP.join(w) + SEP
        for pr in pairs:
            s = s.replace(SEP + pr + SEP, SEP + pr.replace(SEP, "") + SEP)
        assert got[w] == [t for t in s.split(SEP) if t], w


def test_encode_plan_is_zero_shuffle(spark, sf_dir):
    import os

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    wh = word_histogram(docs)
    merges = bpe_train(
        [(r["w"], r["f"]) for r in wh.orderBy(F.desc("f"), "w").limit(500).collect()],
        merges=8,
    )
    enc = docs.select(
        bpe_encode(
            symbolize(F.element_at(F.split("text", " "), 1)),
            [pr for pr, _, _ in merges],
        ).alias("s")
    )
    plan = enc._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
