"""Embedding similarity search over `embeddings` (array<float>, 64-dim).

* q38 — brute-force cosine top-k (the exact baseline; broadcast queries,
  single scan of candidates, rank window).
* q39 — top similar pairs corpus-wide (exact; the oracle for near-dup
  thresholds).
* q39b — sign-LSH bucketed near-dup variant: the 100 TB path (candidates
  from hyperplane-sign buckets, exact cosine verify). Rows-only driver
  check (approximate recall by design); pytest checks bucket candidates ⊆
  exact pairs semantics instead.

Numeric determinism: floats are widened to double *before* any multiply;
cosine is rounded to 6 digits; ranking orders by (rounded sim, id) so ranks
are stable cross-engine (see operators/similarity.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from minarrow_spark.operators.similarity import brute_force_topk, cosine_sim
from minarrow_spark.queries._util import T
from minarrow_spark.registry import query

_COS = (
    "round(list_cosine_similarity(CAST({a} AS DOUBLE[]), CAST({b} AS DOUBLE[])), 6)"
)


@query(
    "q38_ann_topk",
    oracle=f"""
    WITH q AS (SELECT vec_id AS q_id, embedding AS q_vec FROM embeddings
               WHERE vec_id < 5),
    scored AS (
      SELECT q.q_id, c.vec_id,
             {_COS.format(a="q.q_vec", b="c.embedding")} AS sim
      FROM embeddings c CROSS JOIN q
      WHERE c.vec_id <> q.q_id
    ),
    ranked AS (
      SELECT q_id, vec_id, sim,
             ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY sim DESC, vec_id)
               AS rank
      FROM scored
    )
    SELECT q_id, vec_id, sim, CAST(rank AS BIGINT) AS rank
    FROM ranked WHERE rank <= 10
    """,
    tags=("similarity", "ann", "topk"),
    bench=True,
)
def q38_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-10 neighbors for 5 probe vectors (brute-force
    baseline; scales linearly — probes broadcast, one candidate scan)."""
    e = T(spark, sf_dir, "embeddings")
    probes = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    return brute_force_topk(probes, e, k=10).select("q_id", "vec_id", "sim", "rank")


@query(
    "q39_similar_pairs",
    oracle=f"""
    WITH pairs AS (
      SELECT a.vec_id AS va, b.vec_id AS vb, a.label AS label_a,
             {_COS.format(a="a.embedding", b="b.embedding")} AS sim
      FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    ),
    ranked AS (
      SELECT va, vb, label_a, sim,
             ROW_NUMBER() OVER (ORDER BY sim DESC, va, vb) AS rank
      FROM pairs
    )
    SELECT va, vb, label_a, sim, CAST(rank AS BIGINT) AS rank
    FROM ranked WHERE rank <= 20
    """,
    tags=("similarity", "near-dup"),
)
def q39_similar_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 most-similar embedding pairs corpus-wide (exact all-pairs —
    the oracle/verification tier; the LSH tier below is the scale path)."""
    e = T(spark, sf_dir, "embeddings")
    a = e.select(
        F.col("vec_id").alias("va"), F.col("embedding").alias("ea"),
        F.col("label").alias("label_a"),
    )
    b = e.select(F.col("vec_id").alias("vb"), F.col("embedding").alias("eb"))
    sim = cosine_sim(F.col("ea"), F.col("eb"))
    pairs = (
        a.join(F.broadcast(b), F.col("va") < F.col("vb"))
        .select("va", "vb", "label_a", sim.alias("sim"))
    )
    w = W.orderBy(F.col("sim").desc(), "va", "vb")
    return (
        pairs.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= 20)
    )


@query(
    "q39b_lsh_buckets",
    oracle=None,  # approximate-by-design: rows-only driver check
    tags=("similarity", "lsh"),
)
def q39b_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign-LSH near-dup candidates: 12 deterministic ±1 hyperplanes (md5
    parity over dim index), 3 bands × 4 bits, exact cosine verify ≥ 0.3 on
    bucket collisions only. This is the shape that survives 100 TB: no
    all-pairs product, candidates bounded by bucket sizes."""
    import hashlib

    e = T(spark, sf_dir, "embeddings")
    dim = 64
    n_planes = 12

    def plane_signs(p: int) -> list[int]:
        return [
            1 if int(hashlib.md5(f"{p}|{d}".encode()).hexdigest(), 16) % 2 else -1
            for d in range(dim)
        ]

    vec = F.col("embedding").cast("array<double>")
    bits = []
    for p in range(n_planes):
        signs = F.array(*[F.lit(float(s)) for s in plane_signs(p)])
        proj = F.aggregate(
            F.zip_with(vec, signs, lambda x, s: x * s), F.lit(0.0), lambda a, v: a + v
        )
        bits.append(F.when(proj >= 0, F.lit(1)).otherwise(F.lit(0)).alias(f"b{p}"))
    hashed = e.select("vec_id", "embedding", *bits)
    bands = F.array(
        *[
            F.struct(
                F.lit(band).alias("band_id"),
                F.concat_ws(
                    "", *[F.col(f"b{band * 4 + j}").cast("string") for j in range(4)]
                ).alias("band_key"),
            )
            for band in range(n_planes // 4)
        ]
    )
    exploded = hashed.select(
        "vec_id", "embedding", F.explode(bands).alias("bb")
    ).select("vec_id", "embedding", "bb.band_id", "bb.band_key")
    a = exploded.select(
        F.col("vec_id").alias("va"), F.col("embedding").alias("ea"),
        "band_id", "band_key",
    )
    b = exploded.select(
        F.col("vec_id").alias("vb"), F.col("embedding").alias("eb"),
        "band_id", "band_key",
    )
    cands = (
        a.join(b, ["band_id", "band_key"])
        .filter(F.col("va") < F.col("vb"))
        .select("va", "vb", "ea", "eb")
        .distinct()
    )
    return (
        cands.select("va", "vb", cosine_sim(F.col("ea"), F.col("eb")).alias("sim"))
        .filter(F.col("sim") >= 0.3)
    )
