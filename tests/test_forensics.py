"""Forensics sidecar plumbing (r6 verdict task 5): shared canonicalization,
keep-last-N rotation, and the capture-diff tool."""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import functions as F

from minarrow_spark import forensics
from minarrow_spark.forensics import _KEEP_LAST, capture

_TAG = "forensics_selftest"
_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".scratch",
    f"{_TAG}_forensics",
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "tier string, doc_id long, val long")


def test_canon_is_the_comparators(spark):
    # One implementation by construction: the sidecar must canonicalize
    # exactly as the oracle comparator does (r6 advisory).
    from minarrow_spark._canon import canon_value

    from .oracle_utils import canon_value as comparator_canon

    assert comparator_canon is canon_value
    assert forensics._canon is canon_value


def test_capture_structure_and_rotation(spark, monkeypatch):
    monkeypatch.setenv("MINARROW_FORENSICS", "1")
    shutil.rmtree(_DIR, ignore_errors=True)
    df = _df(spark, [("a", 1, 10), ("b", 2, 20), ("a", 3, 30)])
    for _ in range(_KEEP_LAST + 3):
        capture(_TAG, df, spark, tier_col="tier", extra={"k": "v"})
    files = sorted(f for f in os.listdir(_DIR) if f.endswith(".json"))
    assert len(files) == _KEEP_LAST  # rotation pruned the 3 oldest
    with open(os.path.join(_DIR, files[-1])) as fh:
        rec = json.load(fh)
    assert rec["n_rows"] == 3
    assert rec["columns_sorted"] == ["doc_id", "tier", "val"]
    assert set(rec["tiers"]) == {"a", "b"}
    assert rec["tiers"]["a"]["n_rows"] == 2
    assert rec["extra"] == {"k": "v"}
    assert rec["facts"]["spark_version"]


def test_capture_disabled_by_env(spark, monkeypatch):
    monkeypatch.setenv("MINARROW_FORENSICS", "0")
    shutil.rmtree(_DIR, ignore_errors=True)
    capture(_TAG, _df(spark, [("a", 1, 10)]), spark, always=True)
    assert not os.path.exists(_DIR)


def test_diff_tool(spark, monkeypatch, capsys):
    import sys

    sys.path.insert(
        0,
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"
        ),
    )
    import forensics_diff

    monkeypatch.setenv("MINARROW_FORENSICS", "1")
    shutil.rmtree(_DIR, ignore_errors=True)
    capture(_TAG, _df(spark, [("a", 1, 10), ("b", 2, 20)]), spark, tier_col="tier")
    capture(_TAG, _df(spark, [("a", 1, 10), ("b", 2, 20)]), spark, tier_col="tier")
    files = sorted(f for f in os.listdir(_DIR) if f.endswith(".json"))
    pa, pb = (os.path.join(_DIR, f) for f in files[-2:])
    assert forensics_diff.diff(pa, pb) == 0
    out = capsys.readouterr().out
    assert "RESULT: match" in out

    # a one-value divergence must be localized to its tier + row
    capture(_TAG, _df(spark, [("a", 1, 10), ("b", 2, 21)]), spark, tier_col="tier")
    files = sorted(f for f in os.listdir(_DIR) if f.endswith(".json"))
    pa, pb = (os.path.join(_DIR, f) for f in files[-2:])
    assert forensics_diff.diff(pa, pb) == 1
    out = capsys.readouterr().out
    assert "tier 'a': match" in out
    assert "tier 'b': DIFF" in out
    assert "only-in-A" in out and "only-in-B" in out
    # tag-form resolution picks the newest two captures
    assert forensics_diff.main([_TAG]) == 1
