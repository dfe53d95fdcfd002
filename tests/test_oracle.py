"""Every registered query with an oracle is hash-compared against DuckDB —
the same check the driver runs at sf0.01 (here at sf0.001 for speed; set
SPARK_GRAFT_TEST_SF_DIR=/root/testdata/sf0.01 for the full tier)."""

from __future__ import annotations

import pytest

from minarrow_spark.registry import all_queries
from tests.oracle_utils import compare, duckdb_conn

QUERIES = all_queries()
ORACLE_NAMES = [n for n, q in QUERIES.items() if q.oracle is not None]


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb_conn(sf_dir)
    yield c
    c.close()


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_oracle_match(spark, sf_dir, con, name):
    q = QUERIES[name]
    df = q.fn(spark, sf_dir)
    ok, msg = compare(df, con, q.oracle)
    assert ok, f"{name}: {msg}"


# (No rows-only tier remains: every registered query carries an oracle —
# enforced by tests/test_entry.py::test_contract_shapes.)


def test_no_oracle_emits_duckdb_only_integer_widths(con):
    """Binding-only scan of every oracle's output types: SUM(BIGINT) in
    DuckDB widens to HUGEINT, which fetches as decimal128/float64 through
    Arrow/pandas paths while fetchall() masks it as a plain Python int —
    the q36 r4/r5 driver hash-mismatch class. No oracle may emit one."""
    banned = {"HUGEINT", "UHUGEINT", "UBIGINT", "UINTEGER", "USMALLINT", "UTINYINT"}
    offenders = {}
    for name in ORACLE_NAMES:
        rel = con.sql(QUERIES[name].oracle)
        bad = [(c, str(t)) for c, t in zip(rel.columns, rel.types) if str(t) in banned]
        if bad:
            offenders[name] = bad
    assert not offenders, f"CAST these to BIGINT: {offenders}"
