"""SQL window functions (SURVEY §2.5, W1-W4).

The reference has no SQL windows (its "window" is a physical view window,
`ArrayV` offset+len) — these are capability-implied. Every window spec here
carries a unique ordering key so ranks and frames are deterministic under
distributed execution; running/framed sums run as scaled longs (exact and
order-free like decimals, but without per-row BigDecimal churn inside the
window frame — see q10's inline note for the measured 10× gap).

Scale note: Window.partitionBy shuffles once on the partition key and sorts
within partitions — the canonical scalable plan. Nothing uses a global
(unpartitioned) window except where the output is provably tiny.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from minarrow_spark.functions.datetimes import epoch_micros
from minarrow_spark.queries._util import T
from minarrow_spark.registry import query


@query(
    "q10_window_topk",
    oracle="""
    SELECT * FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn,
             RANK() OVER (PARTITION BY o_custkey
                          ORDER BY o_orderstatus) AS status_rank,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
               AS running_spend,
             CAST(ROW_NUMBER() OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS BIGINT)
               AS order_seq
      FROM orders
    ) WHERE rn <= 3
    """,
    tags=("W1", "W4"),
    bench=True,
)
def q10_window_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer (row_number + rank, W1) carrying each
    order's running customer spend and sequence number (cumulative W4 —
    the reference's `Cube` time-stacking use case, `cube.rs:62-77`).
    Three window specs share the o_custkey partition → ONE shuffle, sorts
    within partitions (pinned in tests/test_plans.py)."""
    o = T(spark, sf_dir, "orders")
    # Window expressions as SQL strings (r11 — the q01/q04 build-cut
    # pattern, mechanical transcription of the Column/WindowSpec form):
    # same plan (three specs still share the o_custkey partition → ONE
    # shuffle, pinned in tests/test_plans.py), ~130 fewer py4j round-trips
    # per build on a headline query (~0.2 s → ~0.03 s, paid every rep).
    return o.selectExpr(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        "row_number() OVER (PARTITION BY o_custkey"
        " ORDER BY o_totalprice DESC, o_orderkey) AS rn",
        "rank() OVER (PARTITION BY o_custkey"
        " ORDER BY o_orderstatus) AS status_rank",
        # Scaled-long running sum (cents), NOT a decimal window agg: the
        # per-row BigDecimal churn of a decimal cumulative frame over
        # 15M rows measured 1.8-27s erratic (GC storms) at the 10×
        # bench point vs 0.7s stable for the long form. Σcents per
        # customer stays far under long range at any real scale, and
        # long/100.0 is the correctly-rounded double of the same exact
        # value the oracle's decimal sum produces.
        "sum(CAST(round(o_totalprice * 100) AS BIGINT)) OVER ("
        " PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey"
        # divisor as an explicit DOUBLE: a bare 100.0 literal is
        # DECIMAL(4,1) in SQL and would flip the division (and the output
        # column) to decimal — the Column form's Python float was double
        " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
        " / CAST(100.0 AS DOUBLE) AS running_spend",
        "CAST(row_number() OVER (PARTITION BY o_custkey"
        " ORDER BY o_orderdate, o_orderkey) AS BIGINT) AS order_seq",
    ).filter(F.col("rn") <= 3)


@query(
    "q11_window_lag",
    oracle="""
    WITH fr AS (
      SELECT user_id,
             epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS d,
             event_type,
             ROW_NUMBER() OVER (PARTITION BY user_id,
                                epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000
                                ORDER BY ts, event_id) AS rn
      FROM events
    ),
    f1 AS (
      SELECT user_id, d, MIN(rn) AS p1 FROM fr
      WHERE event_type = 'view' GROUP BY 1, 2
    ),
    f2 AS (
      SELECT r.user_id, r.d, MIN(r.rn) AS p2
      FROM fr r JOIN f1 ON f1.user_id = r.user_id AND f1.d = r.d
      WHERE r.event_type = 'click' AND r.rn > f1.p1 GROUP BY 1, 2
    ),
    f3 AS (
      SELECT r.user_id, r.d, MIN(r.rn) AS p3
      FROM fr r JOIN f2 ON f2.user_id = r.user_id AND f2.d = r.d
      WHERE r.event_type = 'purchase' AND r.rn > f2.p2 GROUP BY 1, 2
    )
    SELECT 'lag' AS tier, event_id AS k1, user_id AS k2,
           CAST(epoch_us(CAST(ts AS TIMESTAMP))
                - LAG(epoch_us(CAST(ts AS TIMESTAMP)))
                  OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT)
             AS v,
           LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
             AS s1,
           FIRST_VALUE(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
             AS s2
    FROM events
    UNION ALL
    SELECT 'funnel', 1, 0, (SELECT COUNT(*) FROM f1), 'view', ''
    UNION ALL
    SELECT 'funnel', 2, 0, (SELECT COUNT(*) FROM f2), 'click', ''
    UNION ALL
    SELECT 'funnel', 3, 0, (SELECT COUNT(*) FROM f3), 'purchase', ''
    UNION ALL
    SELECT 'json', event_id, user_id,
           CAST(props->>'k' AS BIGINT),
           array_to_string(
             list_sort(list_distinct([user_id % 7,
                                      CAST(props->>'k' AS BIGINT) % 7,
                                      event_id % 7]))[1:2], '-'),
           array_to_string(json_keys(props), ',') || '=' || (props->>'k')
    FROM events
    """,
    tags=("W2", "funnel", "SF-json"),
)
def q11_window_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic-window suite over events, two tiers (tier/k1/k2/v/s1/s2):

    * tier 'lag' — per-user event gaps via lag + first_value (W2).
      Timestamps reduce to epoch µs (Spark truncates parquet ns→µs; the
      oracle casts to match).
    * tier 'funnel' — ORDERED event-pattern matching (the product-analytics
      funnel): per user-day, the first 'view', the first 'click' strictly
      AFTER it, and the first 'purchase' strictly after that — counting
      user-days that reach each step. Computed as DEPENDENT window minima
      over ONE (user_id, day) partition: p1 = min rn among views, p2 =
      min rn among clicks with rn > p1, p3 likewise after p2. The three
      layers stack as Window nodes over the same exchange — events is
      scanned ONCE and the whole funnel costs one balanced shuffle plus a
      single-row count; no join-backs, nothing recomputed. (The earlier
      form joined three per-level aggregates back against the ranked
      table — 3 extra scans and ~7 extra exchanges for the same rows.)
    * tier 'json' — semistructured extraction (SURVEY §2.11, the array/map/
      JSON scalar family the reference's flat model lacks): the events
      `props` JSON column parsed three ways — get_json_object path extract
      (v), array construction → distinct → sort → slice → join (s1), and
      from_json into map<string,bigint> with map_keys/element_at (s2).
      Pure per-row JVM projection, zero added exchanges; the DuckDB twin
      uses its native json/list functions.
    """
    e = T(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    ep = epoch_micros(F.col("ts"))
    lag_rows = e.select(
        F.lit("lag").alias("tier"),
        F.col("event_id").alias("k1"),
        F.col("user_id").alias("k2"),
        (ep - F.lag(ep).over(w)).cast("bigint").alias("v"),
        F.lag("event_type").over(w).alias("s1"),
        F.first("event_type").over(w).alias("s2"),
    )

    day = F.floor(ep / 86_400_000_000).cast("long")
    wd = W.partitionBy("user_id", "d").orderBy("ts", "event_id")
    wp = W.partitionBy("user_id", "d")  # whole-partition frame, no ordering
    et = F.col("event_type")
    rn = F.col("rn")
    fr = (
        e.select("user_id", day.alias("d"), "event_type", "ts", "event_id")
        .withColumn("rn", F.row_number().over(wd))
        .withColumn("p1", F.min(F.when(et == "view", rn)).over(wp))
        .withColumn(
            "p2",
            F.min(F.when((et == "click") & (rn > F.col("p1")), rn)).over(wp),
        )
        .withColumn(
            "p3",
            F.min(F.when((et == "purchase") & (rn > F.col("p2")), rn)).over(wp),
        )
    )
    counts = fr.filter(rn == 1).agg(  # one row per user-day; p* are constants
        F.count("p1").alias("c1"),
        F.count("p2").alias("c2"),
        F.count("p3").alias("c3"),
    )
    funnel = counts.select(
        F.expr(
            "stack(3, 1, 'view', c1, 2, 'click', c2, 3, 'purchase', c3)"
        ).alias("k1", "s1", "v")
    ).select(
        F.lit("funnel").alias("tier"),
        F.col("k1").cast("bigint").alias("k1"),
        F.lit(0).cast("bigint").alias("k2"),
        F.col("v").cast("bigint").alias("v"),
        "s1",
        F.lit("").alias("s2"),
    )

    arr = F.slice(
        F.sort_array(
            F.array_distinct(
                F.array(
                    F.col("user_id") % 7,
                    F.get_json_object("props", "$.k").cast("bigint") % 7,
                    F.col("event_id") % 7,
                )
            )
        ),
        1,
        2,
    )
    pmap = F.from_json("props", "map<string,bigint>")
    json_rows = e.select(
        F.lit("json").alias("tier"),
        F.col("event_id").alias("k1"),
        F.col("user_id").alias("k2"),
        F.get_json_object("props", "$.k").cast("bigint").alias("v"),
        F.array_join(arr, "-").alias("s1"),
        F.concat(
            F.array_join(F.map_keys(pmap), ","),
            F.lit("="),
            F.element_at(pmap, "k").cast("string"),
        ).alias("s2"),
    )
    return lag_rows.unionByName(funnel).unionByName(json_rows)


@query(
    "q12_moving_window",
    oracle="""
    SELECT l_suppkey, l_orderkey, l_linenumber,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) OVER w AS DOUBLE) AS moving_qty,
           CAST(COUNT(*) OVER w AS BIGINT) AS frame_n
    FROM lineitem
    WHERE l_suppkey <= 20
    WINDOW w AS (PARTITION BY l_suppkey
                 ORDER BY l_shipdate, l_orderkey, l_linenumber
                 ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
    """,
    tags=("W3",),
)
def q12_moving_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moving 4-row sum per supplier (framed aggregate, W3)."""
    l = T(spark, sf_dir, "lineitem").filter(F.col("l_suppkey") <= 20)
    w = (
        W.partitionBy("l_suppkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
        .rowsBetween(-3, 0)
    )
    return l.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        # scaled-long frame sum — same rationale as q10's running_spend
        (F.sum(F.round(F.col("l_quantity") * 100).cast("long")).over(w) / 100.0)
        .alias("moving_qty"),
        F.count(F.lit(1)).over(w).alias("frame_n"),
    )


@query(
    "q20_ntile_lead",
    oracle="""
    SELECT c_custkey,
           CAST(NTILE(4) OVER (ORDER BY c_acctbal DESC, c_custkey) AS BIGINT)
             AS bal_quartile,
           LEAD(c_custkey) OVER (ORDER BY c_acctbal DESC, c_custkey) AS next_cust,
           CAST(DENSE_RANK() OVER (ORDER BY c_mktsegment) AS BIGINT) AS seg_code,
           PERCENT_RANK() OVER (ORDER BY c_acctbal DESC, c_custkey) AS pct_rank,
           CUME_DIST() OVER (ORDER BY c_acctbal DESC, c_custkey) AS cum_dist
    FROM customer
    """,
    tags=("W1", "W2", "T17"),
)
def q20_ntile_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile/lead/dense_rank over a GLOBAL order — without the global
    window. A naive `Window.orderBy(...)` plans Exchange SinglePartition
    (every customer through one task — the 100 TB cliff this query used to
    document as its known weakness); instead the total order goes through
    `global_ranks` (operators/ranking.py): range-repartition + local rank
    + broadcast partition offsets — every stage balanced. From the exact
    global rank, NTILE(4) is pure arithmetic (`ntile_from_rank`, the
    standard-SQL remainder rule both engines implement), LEAD is an
    equi-join on rank+1, and the segment dense_rank is a broadcast join
    against the ranked 5-row distinct-segment table (T17's
    string→categorical recode). Same results as the single-window form —
    the oracle is the plain NTILE/LEAD/DENSE_RANK SQL — but the plan
    scales: more shuffles, all balanced, none single-reducer."""
    from minarrow_spark.operators.ranking import global_ranks, ntile_from_rank

    c = T(spark, sf_dir, "customer").select(
        "c_custkey", "c_acctbal", "c_mktsegment"
    )
    order = [F.col("c_acctbal").desc(), F.col("c_custkey")]
    ranked = global_ranks(c, order)
    tot = ranked.agg(F.count(F.lit(1)).alias("__n"))
    nxt = ranked.select(
        (F.col("grank") - 1).alias("grank"), F.col("c_custkey").alias("next_cust")
    )
    segs = c.select("c_mktsegment").distinct()
    sw = W.orderBy("c_mktsegment")  # 5 distinct segments — tiny by design
    seg_codes = segs.withColumn(
        "seg_code", F.row_number().over(sw).cast("bigint")
    )
    return (
        ranked.crossJoin(F.broadcast(tot))
        .join(nxt, "grank", "left")
        .join(F.broadcast(seg_codes), "c_mktsegment")
        .select(
            "c_custkey",
            ntile_from_rank(F.col("grank"), F.col("__n"), 4).alias("bal_quartile"),
            "next_cust",
            "seg_code",
            # Under a UNIQUE total order the standard definitions reduce to
            # rank arithmetic — exact ints < 2^53, one IEEE division both
            # engines share: PERCENT_RANK = (rank-1)/(n-1), CUME_DIST =
            # rank/n (each row is its own peer group).
            # n == 1 guard: SQL PERCENT_RANK() defines the single-row case
            # as 0, while 0.0/0.0 would be NaN — match the standard.
            F.when(
                F.col("__n") > 1,
                (F.col("grank") - 1).cast("double")
                / (F.col("__n") - 1).cast("double"),
            )
            .otherwise(F.lit(0.0))
            .alias("pct_rank"),
            (F.col("grank").cast("double") / F.col("__n").cast("double"))
            .alias("cum_dist"),
        )
    )
