"""Driver-contract smoke tests for __spark_entry__."""

from __future__ import annotations

import importlib


def _entry_mod():
    return importlib.import_module("__spark_entry__")


def test_entry_runs(spark):
    mod = _entry_mod()
    df = mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert len(df.schema.fields) > 0


def test_contract_shapes(spark):
    mod = _entry_mod()
    qs = mod.queries()
    oracles = mod.oracle_sql()
    assert len(qs) >= 40
    # The per-round correctness run records at most 50 queries in
    # registration order (round 1 registered 54 and the last 4 — the whole
    # window tier — got no correctness rows). Growing the surface means
    # MERGING into suite queries, not appending past the cap.
    assert len(qs) <= 50, f"{len(qs)} queries exceed the 50-row driver budget"
    # Every query is hash-checkable: a missing oracle downgrades that
    # operator to a rows-only check.
    assert set(oracles) == set(qs), set(qs) - set(oracles)
    # Column-name discipline: every oracle is a string, every query callable.
    assert all(isinstance(s, str) and s.strip() for s in oracles.values())
    assert all(callable(f) for f in qs.values())
