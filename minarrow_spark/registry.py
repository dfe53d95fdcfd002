"""Query registry: the engine's declared operator surface.

Every operator family from SURVEY.md §2 is exercised by at least one named
query registered here. Each query is a (Spark callable, DuckDB oracle SQL)
pair; the driver hash-compares the two at sf0.01, so both sides must be
*numerically deterministic*, not just mathematically equal.

Determinism rules used throughout (see tests/test_oracle.py):

* SUM over doubles is order-sensitive → route through exact arithmetic:
  cast to DECIMAL(18,2) before summing (exact, order-independent in both
  engines), cast the final aggregate back to DOUBLE. Where per-group
  magnitudes are provably bounded, scaled-integer longs are the faster
  exact form (q04's cents × basis points) — widen to decimal before any
  unbounded final merge.
* Transcendentals (ln, etc.) round PER-VALUE to ≤6 digits, then aggregate
  as exact decimal (q32 NLL, q33 idf, q41 severity) — never sum raw
  doubles across partitions.
* AVG/variance → computed from exact decimal partial sums with scalar
  double math at the end (identical IEEE ops on identical inputs).
* Per-row double expressions are bit-deterministic across engines (same
  IEEE 754 ops) and need no rounding.
* Bit/bucket keys fold as integers with commutative ops — e.g. q39b's LSH
  band key `sum(bit << plane_pos)` — not as ordered string concatenation.
* Iterative algorithms hash-check by replaying every round in generated
  CTEs with integer state: k-means scaled-long centroids (q52), PageRank
  per-edge-rounded long ranks (q36), BPE merges with total-order
  tie-breaks (q30), power-iteration IEEE chains on exact moments < 2⁵³
  (q52 'pca'). Single-row scalar CTE chains MUST be `AS MATERIALIZED` in
  DuckDB — inlining grows exponentially with iteration count.
* Output columns are canonical types only: BIGINT, DOUBLE, VARCHAR,
  BOOLEAN — never raw timestamps/decimals (cross-engine hashing hazards).
  COROLLARY (the q36 r4/r5 driver failure): DuckDB widens SUM(BIGINT) to
  HUGEINT, and any arithmetic touching a HUGEINT stays HUGEINT — CAST
  every sum (and every expression downstream of one) back to BIGINT in
  the oracle SQL. fetchall() masks the difference (Python ints both
  ways); Arrow/pandas fetch paths render HUGEINT as decimal128/float64
  and hash-mismatch while rows and schema still match. Enforced by the
  comparator and tests/test_oracle.py's binding-only type scan.
* Every paired Spark/DuckDB tokenize or whitespace collapse uses the
  explicit shared class functions.text.WS = `[ \\t\\n\\r\\f]+` — Java `\\s`
  includes \\x0B, RE2's does not, so a bare `\\s` is a latent one-engine
  value flip on hostile whitespace.
* Any ORDER BY used for ranking/top-k carries a unique tie-break key.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL over the pre-registered views; None → rows-only check
    tags: tuple[str, ...] = ()
    bench: bool = False  # include in bench.py headline set
    doc: str = ""


QUERIES: dict[str, Query] = {}


def query(
    name: str,
    oracle: str | None = None,
    tags: tuple[str, ...] = (),
    bench: bool = False,
) -> Callable[[QueryFn], QueryFn]:
    """Register a query. ``oracle`` is DuckDB SQL equivalent to the Spark fn."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = Query(
            name=name, fn=fn, oracle=oracle, tags=tuple(tags), bench=bench,
            doc=(fn.__doc__ or "").strip(),
        )
        return fn

    return deco


def all_queries() -> dict[str, Query]:
    """Import every query module (side-effect registration) and return the registry."""
    import minarrow_spark.queries  # noqa: F401  (imports submodules)

    return QUERIES
