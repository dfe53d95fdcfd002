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
    assert set(oracles) <= set(qs)
    # Column-name discipline: every oracle is a string, every query callable.
    assert all(isinstance(s, str) and s.strip() for s in oracles.values())
    assert all(callable(f) for f in qs.values())
