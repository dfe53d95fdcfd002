"""Connected components over candidate-pair edges — the cluster-formation
step that turns near-duplicate PAIRS (q35 minhash-LSH, q37 n-gram jaccard,
q40 embedding-cosine) into duplicate CLUSTERS with one canonical keeper.

A production dedup pipeline is pairs → components → keep-one-per-component;
the pair detectors here already exist, this closes the loop. No analog in
the reference (pbower/minarrow is a data library, not a graph engine) —
this is a beyond-reference extension for training-data pipelines, like
operators/dedup.py.

Algorithm: iterative min-label propagation, expressed declaratively so
Catalyst plans every round:

    label(v) ← min(label(v), min over neighbors u of label(u))

repeated until a fixpoint. Each round is one broadcast-or-shuffle join of
the (small, 2-column) label table against the symmetrized edge list plus a
min-groupBy — both map-side combined. Convergence needs O(diameter) rounds;
dup clusters are near-cliques (stars around a popular document), so the
practical round count is 2–4 regardless of corpus size. For adversarial
long-path graphs the `max_iter` guard raises rather than looping forever
(large-star/small-star contraction would give O(log n) worst-case rounds;
not needed for dedup-shaped graphs and the guard makes the contract
explicit).

Scale shape per round: edges stay partitioned on `src` across ALL rounds
(the join key never changes, so the exchange is reused from the previous
round's shuffle files); only the label table — 2 columns, one row per
vertex — moves. Lineage is cut every round with a GC-scoped
`localCheckpoint` (same rationale as operators/dedup.py: blocks are freed
by the ContextCleaner when the RDDs are collected, no session-lifetime
cache), without which the plan doubles each round and the driver, not the
data, becomes the bottleneck. The fixpoint check is a single `count` of
changed labels per round — an O(V) action, unavoidable for any iterative
algorithm, and the per-round result it gates is already materialized by
the checkpoint.
"""

from __future__ import annotations

from fractions import Fraction

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _damping_frac(damping: float) -> tuple[int, int]:
    """Exact rational (num, den) for the damping factor, via its decimal
    string (0.85 → 17/20) — the basis of the all-integer rounding contract:
    round-half-up(num·r / (den·dg)) == (2·num·r + den·dg) div (2·den·dg)
    for positive longs, with no floating point anywhere, so the value is
    bit-identical in any engine (the q36 r4 driver hash mismatch motivated
    retiring the double `round` path)."""
    frac = Fraction(str(damping))
    return frac.numerator, frac.denominator


def _ihalf(num: int, den: int) -> int:
    """Driver-side exact half-up rounding of num/den (positive ints)."""
    return (2 * num + den) // (2 * den)


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """Connected components of the undirected graph given by ``edges``.

    Returns (id, component) for every vertex appearing in any edge, where
    ``component`` is the MINIMUM vertex id of the component — a canonical,
    deterministic representative (the keep-id convention used by
    exact_dedup / the dedup queries).

    Raises RuntimeError if ``max_iter`` rounds don't reach the fixpoint
    (diameter > max_iter — not a dedup-shaped graph).
    """
    # Symmetrize once; both directions land in one table so each round is a
    # single join, and self-loops are harmless (they propagate a label to
    # itself). The edge table is the big side and its partitioning on `u`
    # is stable across rounds.
    e = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .unionByName(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .localCheckpoint(eager=False)
    )
    labels = (
        e.select(F.col("u").alias("id"))
        .distinct()
        .select("id", F.col("id").alias("component"))
        .localCheckpoint(eager=False)
    )
    for _ in range(max_iter):
        # min over {own label} ∪ {neighbor labels}: neighbor messages are
        # edge ⋈ label on the sender, grouped on the receiver. Both aggs
        # are map-side combined; the label table is the small build side.
        msgs = (
            e.join(labels.withColumnRenamed("id", "u"), "u")
            .select(F.col("v").alias("id"), "component")
            .unionByName(labels)
            .groupBy("id")
            .agg(F.min("component").alias("component"))
            .localCheckpoint(eager=True)
        )
        changed = (
            msgs.join(
                labels.withColumnRenamed("component", "old"), "id"
            )
            .filter(F.col("component") != F.col("old"))
            .count()
        )
        labels = msgs
        if changed == 0:
            return labels
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds "
        "(graph diameter exceeds max_iter)"
    )


def dedup_clusters(pairs: DataFrame, da: str = "da", db: str = "db") -> DataFrame:
    """Duplicate clusters from near-dup pairs: (doc_id, keep_id, is_keeper).

    ``keep_id`` is the minimum doc_id of the doc's connected component;
    singleton documents (no near-dup edge) are NOT returned — absence means
    "keep, it duplicates nothing", so the output stays candidate-sized, not
    corpus-sized (the join-back against the corpus is the caller's anti-join
    or left join, whichever the sink wants)."""
    comp = connected_components(pairs, src=da, dst=db)
    return comp.select(
        F.col("id").alias("doc_id"),
        F.col("component").alias("keep_id"),
        (F.col("id") == F.col("component")).alias("is_keeper"),
    )


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iters: int = 3,
    damping: float = 0.85,
    scale: int = 1_000_000_000,
) -> DataFrame:
    """Fixed-iteration PageRank over the UNDIRECTED graph of ``edges``,
    with exact scaled-long rank arithmetic — deterministic under any
    partitioning AND replayable in SQL (the q36 'pagerank' tier).

    Semantics contract (mirrored by the DuckDB oracle expression for
    expression): ranks are integers r = round(rank × scale); each round,
    every node sends round(damping · r / degree) along each incident edge
    (per-edge rounding BEFORE the sum, so the aggregate is an exact
    integer sum — order-free), and receives base = round((1−damping) ·
    scale / N) plus its incoming contributions. Degrees count symmetrized
    incident edges, so a symmetric graph has no dangling nodes.

    Every `round` above is EXACT INTEGER half-up on a rational: damping is
    taken as the rational num/den of its decimal string (0.85 = 17/20) and
    round(num·r/(den·dg)) is evaluated as (2·num·r + den·dg) div
    (2·den·dg) on longs — no double is ever formed, so the result is
    bit-identical across engines, partitionings, and JVMs by construction
    (the previous double-`round` form had a theoretical HALF_UP-vs-binary
    divergence class between Spark and DuckDB).

    Scale shape — the standard BSP loop: per round ONE join of the edge
    table (partitioned on the sender key, stable across rounds) against
    the 2-column rank table, one map-side-combined groupBy on the
    receiver, lineage cut by a GC-scoped checkpoint (same rationale as
    `connected_components`). Returns (id, rank_scaled, degree).
    """
    e = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .unionByName(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .localCheckpoint(eager=False)
    )
    deg = e.groupBy("u").agg(F.count(F.lit(1)).alias("dg")).localCheckpoint(
        eager=False
    )
    n = deg.count()  # O(V) scalar — the only driver-side value
    dnum, dden = _damping_frac(damping)
    base = _ihalf((dden - dnum) * scale, dden * n)  # round((1−d)·scale/N)
    r0 = _ihalf(scale, n)  # round(scale/N)
    ranks = deg.select(F.col("u").alias("id"), F.lit(r0).cast("long").alias("r"))
    send = F.expr(
        f"({2 * dnum} * r + {dden} * dg) div ({2 * dden} * dg)"
    ).cast("long")
    for _ in range(iters):
        contrib = (
            e.join(ranks.withColumnRenamed("id", "u"), "u")
            .join(deg, "u")
            .select(F.col("v").alias("id"), send.alias("c"))
            .groupBy("id")
            .agg(F.sum("c").alias("c"))
        )
        ranks = (
            deg.select(F.col("u").alias("id"))
            .join(contrib, "id", "left")
            .select(
                "id",
                (
                    F.lit(base).cast("long")
                    + F.coalesce(F.col("c"), F.lit(0))
                ).alias("r"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks.join(deg.withColumnRenamed("u", "id"), "id").select(
        "id", F.col("r").alias("rank_scaled"), F.col("dg").alias("degree")
    )


def pagerank_lumped(
    rep_edges: DataFrame,
    sizes: DataFrame,
    src: str = "da",
    dst: str = "db",
    id_col: str = "rep",
    size_col: str = "gc",
    iters: int = 3,
    damping: float = 0.85,
    scale: int = 1_000_000_000,
) -> DataFrame:
    """Exact PageRank over a CLONE-LUMPED graph: ``rep_edges`` connect one
    representative per group of structurally identical vertices, ``sizes``
    gives each group's multiplicity. The full (expanded) graph is: every
    group internally a clique, every rep edge a complete bipartite bundle
    between the two member sets — exactly the graph dense exact duplication
    induces in the dedup families.

    Identical ranks to running :func:`pagerank` on the expanded graph,
    proved by symmetry induction under the integer contract: clone-group
    members start uniform (round(scale/N)); if ranks are uniform within
    every group at round t, every member of group h receives
    Σ_{g∈N(h)} c_g·round(damping·r_g/deg_g) + (c_h−1)·round(damping·r_h/deg_h)
    — identical for all members — so uniformity holds at t+1, and the
    group-level recurrence computes the shared value with the same exact
    integer operations (per-edge rounding BEFORE sums; multiplying a
    rounded long by c_g equals summing c_g identical rounded longs).
    Degrees: deg_g = (c_g−1) + Σ_{h∈N(g)} c_h; N = Σ c_g over groups with
    deg ≥ 1 (clique edges keep every member of a c≥2 group in-graph).
    Pinned against the expanded computation by
    tests/test_graph.py::test_pagerank_lumped_equals_expanded.

    Scale shape: the loop's tables are GROUP-count-sized — the c² expanded
    edge bundle never materializes. Returns group-level
    (id, rank_scaled, degree, n_members); expand by joining members on id.
    """
    e = (
        rep_edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .unionByName(rep_edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .localCheckpoint(eager=False)
    )
    sz = sizes.select(F.col(id_col).alias("u"), F.col(size_col).alias("cu"))
    nsum = (
        e.join(
            sizes.select(F.col(id_col).alias("v"), F.col(size_col).alias("cv")), "v"
        )
        .groupBy("u")
        .agg(F.sum("cv").alias("ns"))
    )
    deg = (
        sz.join(nsum, "u", "left")
        .select(
            "u",
            "cu",
            (F.coalesce(F.col("ns"), F.lit(0)) + F.col("cu") - 1).alias("dg"),
        )
        .filter(F.col("dg") >= 1)
        .localCheckpoint(eager=True)
    )
    n = int(deg.agg(F.sum("cu")).collect()[0][0])  # full-graph N — scalar only
    dnum, dden = _damping_frac(damping)
    base = _ihalf((dden - dnum) * scale, dden * n)
    r0 = _ihalf(scale, n)
    ranks = deg.select(F.col("u").alias("id"), F.lit(r0).cast("long").alias("r"))
    send = F.expr(
        f"({2 * dnum} * r + {dden} * dg) div ({2 * dden} * dg)"
    ).cast("long")
    for _ in range(iters):
        t = (
            ranks.join(deg.withColumnRenamed("u", "id"), "id")
            .select("id", "cu", send.alias("t"))
        )
        recv = (
            e.join(t.withColumnRenamed("id", "u"), "u")
            .select(F.col("v").alias("id"), (F.col("cu") * F.col("t")).alias("c"))
            .groupBy("id")
            .agg(F.sum("c").alias("c"))
        )
        ranks = (
            t.join(recv, "id", "left")
            .select(
                "id",
                (
                    F.lit(base).cast("long")
                    + F.coalesce(F.col("c"), F.lit(0))
                    + (F.col("cu") - 1) * F.col("t")
                ).alias("r"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks.join(deg.withColumnRenamed("u", "id"), "id").select(
        "id",
        F.col("r").alias("rank_scaled"),
        F.col("dg").alias("degree"),
        F.col("cu").alias("n_members"),
    )
