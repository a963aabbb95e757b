"""Second wave of extended relational operators (SURVEY.md §2.18):
gaps-and-islands sessionization, correlated EXISTS/NOT EXISTS,
deterministic per-group mode, forward as-of join, z-score anomaly
detection, and the TPC-H Q5-style multi-way star join.

Scale notes: sessionization is two window passes + one aggregate, all
hash-partitioned by user_id — one shuffle total (the windows and the
groupBy share the partitioning, so Catalyst reuses the exchange);
EXISTS/NOT EXISTS compile to LeftSemi/LeftAnti hash joins, never a
per-row subquery; the forward as-of is the union + ordered-window
linear scan (no range-join blowup), mirroring join_asof_bidask's
backward form; the anomaly op broadcasts the 5-row per-type stats
back to the fact, so the second pass adds no shuffle; Q5's plan
broadcasts every sub-fact dim and leaves exactly the two fact
shuffles (lineitem⋈orders on orderkey, +customer on custkey) that a
1000-executor cluster would also pick.

Parity notes: session boundaries compare epoch-second BIGINTs (both
engines floor), money sums use the exact scaled-integer policy
(functions/parity.py), the mode and the forward as-of carry explicit
total-order tie-breaks, and z-score outlier counts compare against an
exact scaled-integer mean so the only float in the predicate is the
shared-formula stddev (boundary hits measure-zero).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from etl_intraday_bidask_spark.functions.parity import exact_avg, exact_sum
from etl_intraday_bidask_spark.functions.parity import scaled_long
from etl_intraday_bidask_spark.registry import register
from etl_intraday_bidask_spark.tables import load


@register(
    "sessionize_gaps_islands",
    oracle_sql="""
        WITH es AS (
            SELECT user_id,
                   event_id,
                   CAST(floor(epoch(ts)) AS BIGINT) AS es,
                   CAST(round(value * 100) AS BIGINT) AS cents
            FROM events
        ), flagged AS (
            SELECT user_id, event_id, es, cents,
                   CASE WHEN lag(es) OVER w IS NULL
                             OR es - lag(es) OVER w > 1800
                        THEN 1 ELSE 0 END AS new_s
            FROM es
            WINDOW w AS (PARTITION BY user_id ORDER BY es, event_id)
        ), numbered AS (
            SELECT user_id, es, cents,
                   CAST(sum(new_s) OVER (
                       PARTITION BY user_id ORDER BY es, event_id
                       ROWS UNBOUNDED PRECEDING
                   ) AS BIGINT) AS session_seq
            FROM flagged
        )
        SELECT user_id,
               session_seq,
               count(*) AS n_events,
               min(es) AS session_start_s,
               max(es) AS session_end_s,
               CAST(sum(cents) AS DOUBLE) / 100.0 AS sum_value
        FROM numbered
        GROUP BY user_id, session_seq
        ORDER BY user_id, session_seq
    """,
    description="Batch gaps-and-islands sessionization: a new session "
    "starts after a >30-min silence; sessions are numbered per user by "
    "a cumulative sum of new-session flags (lag + running sum), then "
    "aggregated. The batch counterpart of stream_session_30m — one "
    "shuffle on user_id shared by both window passes and the final "
    "aggregate. Gap arithmetic on epoch-second BIGINTs for parity.",
)
def sessionize_gaps_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    base = ev.select(
        "user_id",
        "event_id",
        F.unix_seconds(F.col("ts")).alias("es"),
        scaled_long("value", 100).alias("cents"),
    )
    w = Window.partitionBy("user_id").orderBy("es", "event_id")
    flagged = base.withColumn("prev_es", F.lag("es").over(w)).withColumn(
        "new_s",
        F.when(
            F.col("prev_es").isNull() | (F.col("es") - F.col("prev_es") > 1800), 1
        ).otherwise(0),
    )
    numbered = flagged.withColumn(
        "session_seq",
        F.sum("new_s")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("long"),
    )
    return (
        numbered.groupBy("user_id", "session_seq")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("es").alias("session_start_s"),
            F.max("es").alias("session_end_s"),
            (F.sum("cents").cast("double") / 100.0).alias("sum_value"),
        )
        .orderBy("user_id", "session_seq")
    )


@register(
    "join_exists_correlated",
    oracle_sql="""
        SELECT c_custkey, c_name, c_nationkey
        FROM customer c
        WHERE EXISTS (
                SELECT 1 FROM orders o
                WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F'
              )
          AND NOT EXISTS (
                SELECT 1 FROM orders o
                WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'P'
              )
        ORDER BY c_custkey
    """,
    description="Correlated EXISTS + NOT EXISTS: customers with at "
    "least one finished order and no pending order. Expressed as "
    "left-semi then left-anti joins — exactly what Catalyst decorrelates "
    "the subqueries into, so there is no per-row re-execution; both "
    "joins shuffle on the same custkey and reuse the exchange.",
)
def join_exists_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    finished = orders.where(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("k")
    )
    pending = orders.where(F.col("o_orderstatus") == "P").select(
        F.col("o_custkey").alias("k")
    )
    return (
        cust.join(finished, cust.c_custkey == finished.k, "left_semi")
        .join(pending, cust.c_custkey == pending.k, "left_anti")
        .select("c_custkey", "c_name", "c_nationkey")
        .orderBy("c_custkey")
    )


@register(
    "agg_mode_deterministic",
    oracle_sql="""
        SELECT o_orderstatus, o_orderpriority AS mode_priority, n
        FROM (
            SELECT o_orderstatus,
                   o_orderpriority,
                   count(*) AS n,
                   row_number() OVER (
                       PARTITION BY o_orderstatus
                       ORDER BY count(*) DESC, o_orderpriority
                   ) AS rn
            FROM orders
            GROUP BY o_orderstatus, o_orderpriority
        )
        WHERE rn = 1
        ORDER BY o_orderstatus
    """,
    description="Deterministic per-group mode: most frequent order "
    "priority per status, ties broken lexicographically (built-in "
    "max_by/mode leave ties engine-defined, so the contract uses "
    "count + row_number). Two-phase hash agg then a tiny window over "
    "status×priority cells — the post-agg cardinality is bounded by "
    "the group domain, not the fact rows, so the window is free at "
    "any scale.",
)
def agg_mode_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    counts = orders.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.col("n").desc(), F.col("o_orderpriority")
    )
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "o_orderstatus", F.col("o_orderpriority").alias("mode_priority"), "n"
        )
        .orderBy("o_orderstatus")
    )


@register(
    "join_asof_forward",
    oracle_sql="""
        SELECT v.event_id,
               v.user_id,
               v.value AS view_value,
               (SELECT p.value FROM events p
                WHERE p.event_type = 'purchase'
                  AND p.user_id = v.user_id
                  AND p.ts >= v.ts
                ORDER BY p.ts, p.event_id
                LIMIT 1) AS next_purchase_value
        FROM events v
        WHERE v.event_type = 'view'
        ORDER BY v.event_id
    """,
    description="Forward as-of join: for each view, the value of the "
    "next purchase at-or-after it by the same user — the mirror of "
    "join_asof_bidask's backward match. ONE conditional-projection scan "
    "(event_type IN filter pushed to Parquet, the join_asof_nearest "
    "pattern) + ordered window with a forward unbounded frame and "
    "first(ignorenulls): one shuffle on user_id, linear per-user scan, "
    "no range-join blowup and no second scan of the fact table. Ties "
    "on ts break on event_id, matching the oracle's ORDER BY ts, "
    "event_id.",
)
def join_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Round-11 re-plan (the join_asof_bidask class): the former
    # UNION ALL of two filtered scans read events twice; the
    # conditional projection reads it once — identical row set.
    merged = (
        load(spark, sf_dir, "events")
        .where(F.col("event_type").isin("view", "purchase"))
        .select(
            "event_id",
            "user_id",
            "ts",
            F.when(F.col("event_type") == "view", F.col("value")).alias(
                "view_value"
            ),
            F.when(
                F.col("event_type") == "purchase", F.col("value")
            ).alias("purchase_value"),
            F.when(F.col("event_type") == "view", 0)
            .otherwise(1)
            .alias("side"),
        )
    )
    # At equal ts the view (side 0) sorts before the purchase (side 1),
    # so the purchase falls inside the view's forward frame → inclusive
    # "at-or-after" semantics matching the oracle's p.ts >= v.ts.
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "side", "event_id")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    return (
        merged
        .withColumn(
            "next_purchase_value",
            F.first("purchase_value", ignorenulls=True).over(w),
        )
        .where(F.col("side") == 0)
        .select("event_id", "user_id", "view_value", "next_purchase_value")
        .orderBy("event_id")
    )


@register(
    "anomaly_zscore",
    oracle_sql="""
        WITH stats AS (
            SELECT event_type,
                   count(*) AS n,
                   CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE)
                       / 100.0 / count(*) AS mu,
                   stddev_samp(value) AS sigma
            FROM events
            GROUP BY event_type
        )
        SELECT e.event_type,
               s.n,
               round(s.mu, 4) AS mean_value,
               round(s.sigma, 4) AS std_value,
               CAST(count(*) FILTER (WHERE abs(e.value - s.mu) > 2 * s.sigma)
                    AS BIGINT) AS n_outliers
        FROM events e JOIN stats s ON e.event_type = s.event_type
        GROUP BY e.event_type, s.n, s.mu, s.sigma
        ORDER BY e.event_type
    """,
    description="Z-score anomaly detection: per event_type mean/stddev, "
    "then a second pass counting |value − μ| > 2σ outliers. The 5-row "
    "stats side is broadcast back onto the fact, so the flagging pass "
    "is shuffle-free; μ is the exact scaled-integer mean (parity "
    "policy), σ the engines' shared stddev_samp formula.",
)
def anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    stats = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        exact_avg("value", 100).alias("mu"),
        F.stddev_samp("value").alias("sigma"),
    )
    outlier = F.abs(F.col("value") - F.col("mu")) > 2 * F.col("sigma")
    return (
        ev.join(F.broadcast(stats), "event_type")
        .groupBy("event_type", "n", "mu", "sigma")
        .agg(F.sum(F.when(outlier, 1).otherwise(0)).cast("long").alias("n_outliers"))
        .select(
            "event_type",
            "n",
            F.round("mu", 4).alias("mean_value"),
            F.round("sigma", 4).alias("std_value"),
            "n_outliers",
        )
        .orderBy("event_type")
    )


@register(
    "q5_local_supplier_volume",
    oracle_sql="""
        SELECT n.n_name,
               CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount)
                                   * 10000) AS BIGINT)) AS DOUBLE) / 10000.0
                   AS revenue
        FROM customer c
        JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
                       AND c.c_nationkey = s.s_nationkey
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        WHERE r.r_name = 'ASIA'
          AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY n.n_name
        ORDER BY revenue DESC, n.n_name
    """,
    description="TPC-H Q5-style local supplier volume: six-way star "
    "join (customer⋈orders⋈lineitem⋈supplier⋈nation⋈region) with the "
    "local-supplier condition c_nationkey = s_nationkey, revenue per "
    "nation for a region + date slice. Region/nation/supplier are "
    "broadcast; the date filter is pushed to the orders scan; the only "
    "shuffles are the two fact exchanges (lineitem⋈orders on orderkey, "
    "then custkey) — the plan a 1000-executor cluster wants.",
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    orders = load(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem")
    supp = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(supp),
            (li.l_suppkey == supp.s_suppkey)
            & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(exact_sum(revenue, 10000).alias("revenue"))
        .orderBy(F.col("revenue").desc(), "n_name")
    )


@register(
    "q18_large_volume_customer",
    oracle_sql="""
        WITH big AS (
            SELECT l_orderkey,
                   CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS DOUBLE)
                       / 100.0 AS sum_qty
            FROM lineitem
            GROUP BY l_orderkey
            HAVING sum(CAST(round(l_quantity * 100) AS BIGINT)) > 25000
        )
        SELECT c.c_custkey,
               o.o_orderkey,
               CAST(floor(epoch(o.o_orderdate)) AS BIGINT) AS orderdate_s,
               o.o_totalprice,
               b.sum_qty
        FROM big b
        JOIN orders o ON b.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        ORDER BY o.o_totalprice DESC, o.o_orderkey
        LIMIT 100
    """,
    description="TPC-H Q18-style large-volume customers: orders whose "
    "lineitem quantity sum exceeds 250, joined back to orders and "
    "customer, global top-100 by price. The agg-then-semi-filter shape: "
    "the HAVING filter runs on the aggregated (small) side BEFORE the "
    "joins, so the fact table is scanned once and the join input is "
    "~1% of orders; the global top-k plans TakeOrderedAndProject — "
    "no full sort at any scale.",
)
def q18_large_volume_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer").select("c_custkey")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(scaled_long("l_quantity", 100)).alias("qty_cents"))
        .where(F.col("qty_cents") > 25000)
        .select(
            "l_orderkey",
            (F.col("qty_cents").cast("double") / 100.0).alias("sum_qty"),
        )
    )
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_custkey",
            "o_orderkey",
            F.unix_timestamp("o_orderdate").alias("orderdate_s"),
            "o_totalprice",
            "sum_qty",
        )
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(100)
    )


@register(
    "agg_percentile_disc",
    oracle_sql="""
        SELECT c_mktsegment,
               count(*) AS n,
               quantile_disc(c_acctbal, 0.5) AS median_bal,
               quantile_disc(c_acctbal, 0.9) AS p90_bal
        FROM customer
        GROUP BY c_mktsegment
        ORDER BY c_mktsegment
    """,
    description="Discrete percentiles (percentile_disc / quantile_disc): "
    "unlike the interpolating percentile_cont (agg_percentiles), the "
    "discrete form returns an ACTUAL data value — no arithmetic is "
    "performed, so results are exact for any value type and the two "
    "engines agree bit-for-bit without scaling tricks. Sort-based "
    "aggregate buffering per group; bounded group domain here, "
    "approx_percentile at unbounded lake-scale cardinalities.",
)
def agg_percentile_disc(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    return (
        cust.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.expr(
                "percentile_disc(0.5) WITHIN GROUP (ORDER BY c_acctbal)"
            ).alias("median_bal"),
            F.expr(
                "percentile_disc(0.9) WITHIN GROUP (ORDER BY c_acctbal)"
            ).alias("p90_bal"),
        )
        .orderBy("c_mktsegment")
    )
