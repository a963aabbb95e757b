"""Extended relational operators (SURVEY.md §2.12): pivot/unpivot,
exact percentiles, dispersion statistics, first/last/nth window frames,
time-interval range join, scalar-subquery decorrelation, and
deterministic systematic sampling.

Scale notes: pivot with an explicit value list compiles to a single
two-phase hash aggregate (no extra pass to discover values — at 100 TB
the implicit-pivot value scan is a full extra job, so the list is
mandatory); the range join keeps an equi key (user_id) so Catalyst
plans a shuffled equi join with the interval as a residual filter
instead of a cartesian BNLJ; percentile is an exact sort-based
aggregate, so at lake scale prefer approx_percentile unless the
contract demands exactness (both declared here: the exact one is
hash-graded, the approx one is covered by agg_approx_distinct's
rows-only pattern).

Parity notes: percentiles interpolate over exact scaled BIGINTs with
dyadic fractions (0.25/0.5/0.75), so Spark's ``percentile`` and
DuckDB's ``quantile_cont`` produce bit-identical doubles; dispersion
stats are irrational-valued, so ``round(x, 4)`` is the correct policy
(functions/parity.py).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from etl_intraday_bidask_spark.functions.parity import exact_sum, scaled_long
from etl_intraday_bidask_spark.registry import register
from etl_intraday_bidask_spark.tables import load


@register(
    "pivot_status_matrix",
    oracle_sql="""
        SELECT
            o_orderpriority,
            count(*) FILTER (WHERE o_orderstatus = 'O') AS "O",
            count(*) FILTER (WHERE o_orderstatus = 'F') AS "F",
            count(*) FILTER (WHERE o_orderstatus = 'P') AS "P"
        FROM orders
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """,
    description="Pivot order counts to a priority × status matrix. The "
    "explicit value list avoids the extra distinct-values job that "
    "implicit pivot needs (a full scan at lake scale).",
)
def pivot_status_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    pivoted = (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .agg(F.count(F.lit(1)))
    )
    # Pivot leaves empty cells NULL; the FILTER oracle counts them as 0.
    return pivoted.select(
        "o_orderpriority",
        *[F.coalesce(F.col(s), F.lit(0)).cast("long").alias(s) for s in ("O", "F", "P")],
    ).orderBy("o_orderpriority")


@register(
    "unpivot_part_metrics",
    oracle_sql="""
        SELECT p_partkey, 'p_retailprice' AS metric, p_retailprice AS value
        FROM part
        UNION ALL
        SELECT p_partkey, 'p_size', CAST(p_size AS DOUBLE)
        FROM part
    """,
    description="Unpivot (melt) part metrics to long form — the "
    "wide-to-long normalization leg of a feature pipeline. Narrow "
    "transform, no shuffle.",
)
def unpivot_part_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load(spark, sf_dir, "part").withColumn(
        "p_size", F.col("p_size").cast("double")
    )
    return part.unpivot(
        ids=["p_partkey"],
        values=["p_retailprice", "p_size"],
        variableColumnName="metric",
        valueColumnName="value",
    )


@register(
    "agg_percentiles",
    oracle_sql="""
        SELECT
            o_orderstatus,
            count(*) AS n,
            quantile_cont(CAST(round(o_totalprice * 100) AS BIGINT), 0.25)
                / 100.0 AS p25,
            quantile_cont(CAST(round(o_totalprice * 100) AS BIGINT), 0.5)
                / 100.0 AS p50,
            quantile_cont(CAST(round(o_totalprice * 100) AS BIGINT), 0.75)
                / 100.0 AS p75
        FROM orders
        GROUP BY o_orderstatus
        ORDER BY o_orderstatus
    """,
    description="Exact interpolated quartiles of order value per status. "
    "Interpolation over exact scaled BIGINTs with dyadic fractions is "
    "bit-identical across engines (percentile ⇔ quantile_cont, both "
    "type-7). Exact percentile is a sort-based aggregate — at 100 TB "
    "switch to approx_percentile unless exactness is contractual.",
)
def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    tp = scaled_long("o_totalprice", 100)
    return (
        orders.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.percentile(tp, F.lit(0.25)) / F.lit(100.0)).alias("p25"),
            (F.percentile(tp, F.lit(0.5)) / F.lit(100.0)).alias("p50"),
            (F.percentile(tp, F.lit(0.75)) / F.lit(100.0)).alias("p75"),
        )
        .orderBy("o_orderstatus")
    )


@register(
    "agg_stats_dispersion",
    oracle_sql="""
        SELECT
            l_returnflag,
            round(stddev_pop(l_quantity), 4) AS sd_qty,
            round(var_pop(l_quantity), 4) AS var_qty,
            round(covar_pop(l_quantity, l_extendedprice), 4) AS covar_qty_price,
            round(corr(l_quantity, l_extendedprice), 4) AS corr_qty_price
        FROM lineitem
        GROUP BY l_returnflag
        ORDER BY l_returnflag
    """,
    description="Population dispersion statistics per returnflag — "
    "single-pass distributed moments (partial aggregation map-side, "
    "merge at reduce). Irrational outputs → round-4dp parity policy.",
)
def agg_stats_dispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.stddev_pop("l_quantity"), 4).alias("sd_qty"),
            F.round(F.var_pop("l_quantity"), 4).alias("var_qty"),
            F.round(F.covar_pop("l_quantity", "l_extendedprice"), 4).alias(
                "covar_qty_price"
            ),
            F.round(F.corr("l_quantity", "l_extendedprice"), 4).alias(
                "corr_qty_price"
            ),
        )
        .orderBy("l_returnflag")
    )


@register(
    "win_first_last_nth",
    oracle_sql="""
        SELECT
            c_custkey,
            c_nationkey,
            c_acctbal,
            first_value(c_acctbal) OVER w AS lowest_bal,
            last_value(c_acctbal) OVER w AS highest_bal,
            nth_value(c_acctbal, 2) OVER w AS second_bal,
            cume_dist() OVER wo AS cd
        FROM customer
        WINDOW
            w AS (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING),
            wo AS (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey)
    """,
    description="first/last/nth_value over an explicit full frame plus "
    "cume_dist, per nation, totally ordered by (acctbal, custkey) for "
    "determinism. One shuffle on the partition key serves all four.",
)
def win_first_last_nth(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load(spark, sf_dir, "customer")
    wo = Window.partitionBy("c_nationkey").orderBy("c_acctbal", "c_custkey")
    w = wo.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return customer.select(
        "c_custkey",
        "c_nationkey",
        "c_acctbal",
        F.first("c_acctbal").over(w).alias("lowest_bal"),
        F.last("c_acctbal").over(w).alias("highest_bal"),
        F.nth_value("c_acctbal", 2).over(w).alias("second_bal"),
        # cume_dist is a rational of exact counts: emit unrounded
        # (identical doubles both engines; round() is the half-boundary
        # trap, e.g. partitions of 32 rows land ON x.xxxx5).
        F.cume_dist().over(wo).alias("cd"),
    )


@register(
    "join_range_interval",
    oracle_sql="""
        SELECT p.event_id AS p_id, count(v.ts) AS n_views
        FROM events p
        LEFT JOIN events v
          ON v.user_id = p.user_id
         AND v.event_type = 'view'
         AND v.ts >= p.ts - INTERVAL 10 MINUTE
         AND v.ts < p.ts
        WHERE p.event_type = 'purchase'
        GROUP BY p.event_id
    """,
    description="Time-interval range join: views by the same user in the "
    "10 minutes before each purchase (quote-activity-before-trade "
    "primitive). The user_id equi key makes this a shuffled equi join "
    "with the interval as a residual filter — NOT a cartesian BNLJ; at "
    "100 TB additionally bucket both sides by a coarse time bucket.",
)
def join_range_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
    )
    views = ev.where(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user"), F.col("ts").alias("v_ts")
    )
    joined = purchases.join(
        views,
        (F.col("v_user") == F.col("p_user"))
        & (F.col("v_ts") >= F.col("p_ts") - F.expr("INTERVAL 10 MINUTES"))
        & (F.col("v_ts") < F.col("p_ts")),
        "left",
    )
    return joined.groupBy("p_id").agg(F.count("v_ts").alias("n_views"))


@register(
    "subquery_scalar_agg",
    oracle_sql="""
        WITH totals AS (
            SELECT
                o_custkey,
                CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
                    / 100.0 AS total_spend
            FROM orders
            GROUP BY o_custkey
        )
        SELECT c_custkey, c_name, total_spend
        FROM customer
        JOIN totals ON c_custkey = o_custkey
        WHERE total_spend > 300000.0
    """,
    description="Customers whose lifetime spend exceeds a threshold — "
    "the decorrelated form of a correlated scalar-subquery predicate "
    "(aggregate once, join once; never per-row subquery execution).",
)
def subquery_scalar_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    totals = orders.groupBy("o_custkey").agg(
        exact_sum("o_totalprice", 100).alias("total_spend")
    )
    return (
        customer.join(totals, F.col("c_custkey") == F.col("o_custkey"))
        .where(F.col("total_spend") > 300000.0)
        .select("c_custkey", "c_name", "total_spend")
    )


@register(
    "sample_systematic",
    oracle_sql="""
        SELECT
            l_returnflag,
            count(*) AS n,
            CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE)
                / 100.0 AS sum_price
        FROM lineitem
        WHERE (l_orderkey * 31 + l_linenumber) % 97 = 0
        GROUP BY l_returnflag
        ORDER BY l_returnflag
    """,
    description="Deterministic systematic sample (key-modulo) + summary "
    "— the reproducible sampling primitive for pipeline QA. Unlike "
    "rand()-based sampling it is stable across engines, retries, and "
    "partitionings, and the predicate is evaluated at the scan.",
)
def sample_systematic(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    keyed = (F.col("l_orderkey") * 31 + F.col("l_linenumber")) % 97 == 0
    return (
        li.where(keyed)
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            exact_sum("l_extendedprice", 100).alias("sum_price"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "q3_shipping_priority",
    oracle_sql="""
        SELECT
            l_orderkey,
            CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000)
                          AS BIGINT)) AS DOUBLE) / 10000.0 AS revenue,
            CAST(epoch(o_orderdate) AS BIGINT) AS orderdate_s,
            o_orderpriority
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1997-01-01'
          AND l_shipdate > TIMESTAMP '1997-01-01'
        GROUP BY l_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, l_orderkey
        LIMIT 10
    """,
    description="TPC-H Q3-style shipping priority: the composite "
    "capability query — segment-filtered dim broadcast onto two "
    "fact-side scans with date pushdown, exact-decimal revenue "
    "aggregation, global top-10 via TakeOrderedAndProject with an "
    "orderkey tie-break. Emits epoch seconds, never a raw timestamp.",
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        customer.where(F.col("c_mktsegment") == "BUILDING")
        .join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .where(F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .where(F.col("l_shipdate") > F.lit("1997-01-01").cast("timestamp"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(exact_sum(revenue, 10000).alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.unix_timestamp("o_orderdate").alias("orderdate_s"),
            "o_orderpriority",
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )
