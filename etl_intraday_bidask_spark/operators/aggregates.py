"""Aggregation operators (SURVEY.md §2.4).

All built-in hash aggregates: Catalyst plans two-phase partial/final
HashAggregateExec with map-side combine, so each groupBy shuffles only
pre-aggregated partials — the shape that scales to 100 TB.

Money/quantity aggregates use the exact scaled-integer policy from
functions/parity.py (sum BIGINTs exactly, divide once) instead of
round(x, 4): the fixture values are exact decimals whose sums/averages
land on round-half boundaries where Spark and DuckDB round differently.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from etl_intraday_bidask_spark.functions.parity import (
    exact_avg,
    scaled_long,
)
from etl_intraday_bidask_spark.plans.ordering import ordered_small
from etl_intraday_bidask_spark.registry import register
from etl_intraday_bidask_spark.tables import load, view


@register(
    "agg_pricing_summary",
    oracle_sql="""
        SELECT
            l_returnflag,
            l_linestatus,
            CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS DOUBLE) / 100.0
                AS sum_qty,
            CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / 100.0
                AS sum_base_price,
            CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT))
                 AS DOUBLE) / 10000.0 AS sum_disc_price,
            CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * (1 + l_tax)
                                * 1000000) AS BIGINT))
                 AS DOUBLE) / 1000000.0 AS sum_charge,
            CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS DOUBLE) / 100.0
                / count(*) AS avg_qty,
            CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / 100.0
                / count(*) AS avg_price,
            CAST(sum(CAST(round(l_discount * 100) AS BIGINT)) AS DOUBLE) / 100.0
                / count(*) AS avg_disc,
            count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """,
    description="TPC-H Q1-style pricing summary — the flagship hash agg. "
    "All money aggregates via exact scaled-integer sums (parity policy).",
)
def agg_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    # SQL-text body (round-8 dispatch-floor work): the previous Column
    # chain cost ~100 py4j round trips (~1 ms each) of pure driver-side
    # construction per call; one spark.sql parse builds the IDENTICAL
    # logical plan JVM-side. Expressions mirror functions/parity.py:
    # scaled_long == FLOOR(x * s + 0.5D), exact_sum == CAST(SUM(...) AS
    # DOUBLE)/s, exact_avg divides by COUNT(1) afterwards — textually
    # congruent with the DuckDB oracle above.
    li = view(spark, sf_dir, "lineitem")
    return spark.sql(f"""
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(FLOOR(l_quantity * 100.0D + 0.5D)) AS DOUBLE)
                   / 100.0D AS sum_qty,
               CAST(SUM(FLOOR(l_extendedprice * 100.0D + 0.5D)) AS DOUBLE)
                   / 100.0D AS sum_base_price,
               CAST(SUM(FLOOR(l_extendedprice * (1.0D - l_discount)
                              * 10000.0D + 0.5D)) AS DOUBLE)
                   / 10000.0D AS sum_disc_price,
               CAST(SUM(FLOOR(l_extendedprice * (1.0D - l_discount)
                              * (1.0D + l_tax) * 1000000.0D + 0.5D))
                    AS DOUBLE) / 1000000.0D AS sum_charge,
               CAST(SUM(FLOOR(l_quantity * 100.0D + 0.5D)) AS DOUBLE)
                   / 100.0D / COUNT(1) AS avg_qty,
               CAST(SUM(FLOOR(l_extendedprice * 100.0D + 0.5D)) AS DOUBLE)
                   / 100.0D / COUNT(1) AS avg_price,
               CAST(SUM(FLOOR(l_discount * 100.0D + 0.5D)) AS DOUBLE)
                   / 100.0D / COUNT(1) AS avg_disc,
               COUNT(1) AS count_order
        FROM {li}
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
    """).transform(ordered_small, "l_returnflag", "l_linestatus")
    # ≤ 12 groups (returnflag × linestatus): presentation order via
    # ordered_small — no range-sampling job (plans/ordering.py).


@register(
    "agg_count_distinct",
    oracle_sql="""
        SELECT event_type,
               count(DISTINCT user_id) AS n_users,
               count(*) AS n_events
        FROM events
        GROUP BY event_type
        ORDER BY event_type
    """,
    description="Exact distinct users per event_type.",
)
def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("n_users"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("event_type")
    )


@register(
    "agg_approx_distinct",
    oracle_sql=None,  # HLL implementations differ between engines → rows-only.
    description="HyperLogLog approximate distinct users per event_type; "
    "approximate by design so graded rows-only.",
)
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(F.approx_count_distinct("user_id", 0.01).alias("approx_users"))
        .orderBy("event_type")
    )


@register(
    "agg_rollup",
    oracle_sql="""
        SELECT
            coalesce(o_orderpriority, 'ALL') AS pri,
            coalesce(o_orderstatus, 'ALL') AS status,
            count(*) AS n_orders,
            CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100.0
                AS sum_price
        FROM orders
        GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
        ORDER BY pri, status
    """,
    description="ROLLUP subtotals over priority × status.",
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # SQL-text body (round-8 dispatch-floor work, see agg_pricing_summary):
    # one JVM-side parse replaces ~30 py4j Column round trips; the logical
    # plan is identical. ROLLUP over two bounded dims (≤ ~5×4 leaves +
    # subtotals): ordered_small, not a range sort (plans/ordering.py).
    # The cents chain is projected BELOW the rollup (round-10 anatomy):
    # Expand triples every input row before the partial aggregate, and
    # an aggregate-input expression is evaluated once per EXPANDED row
    # — pre-projecting FLOOR(price*100+0.5) evaluates it once per SCAN
    # row instead of three times, identical values at every scale.
    orders = view(spark, sf_dir, "orders")
    return spark.sql(f"""
        SELECT coalesce(o_orderpriority, 'ALL') AS pri,
               coalesce(o_orderstatus, 'ALL') AS status,
               COUNT(1) AS n_orders,
               CAST(SUM(cents) AS DOUBLE) / 100.0D AS sum_price
        FROM (
            SELECT o_orderpriority, o_orderstatus,
                   FLOOR(o_totalprice * 100.0D + 0.5D) AS cents
            FROM {orders}
        )
        GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
    """).transform(ordered_small, "pri", "status")


@register(
    "agg_cube",
    oracle_sql="""
        SELECT
            coalesce(l_returnflag, 'ALL') AS rf,
            coalesce(l_linestatus, 'ALL') AS ls,
            count(*) AS n,
            CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS DOUBLE) / 100.0
                AS sum_qty
        FROM lineitem
        GROUP BY CUBE (l_returnflag, l_linestatus)
        ORDER BY rf, ls
    """,
    description="CUBE over returnflag × linestatus (all grouping combos).",
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Cents projected BELOW Expand (round-11, the agg_rollup class from
    # round 10): CUBE over two dims expands every scan row into 4
    # grouping-set copies before the partial aggregate, and an
    # aggregate-input expression is evaluated once per EXPANDED row —
    # pre-projecting floor(qty*100+0.5) evaluates it once per SCAN row
    # instead of four times, identical values at every scale.
    li = load(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        "l_linestatus",
        scaled_long("l_quantity", 100).alias("qty_cents"),
    )
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.sum("qty_cents").cast("double") / F.lit(100.0)).alias(
                "sum_qty"
            ),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("rf"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("ls"),
            "n",
            "sum_qty",
        )
        .orderBy("rf", "ls")
    )


@register(
    "agg_grouping_sets",
    oracle_sql="""
        SELECT
            coalesce(c_mktsegment, 'ALL') AS segment,
            coalesce(CAST(c_nationkey AS BIGINT), -1) AS nationkey,
            count(*) AS n_cust,
            CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS DOUBLE) / 100.0
                AS sum_bal
        FROM customer
        GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey), ())
        ORDER BY segment, nationkey
    """,
    description="Explicit GROUPING SETS: by segment, by nation, grand total.",
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    cust.createOrReplaceTempView("customer_gs")
    # SQL form — Spark's GROUPING SETS surface is SQL-first. The cents
    # chain is projected BELOW the Expand in a subquery (round-11, the
    # agg_rollup class from round 10): three grouping sets triple every
    # scan row before the partial aggregate, and an aggregate-input
    # expression is evaluated once per EXPANDED row — the subquery
    # evaluates it once per SCAN row, identical values at every scale.
    return spark.sql(
        """
        SELECT
            coalesce(c_mktsegment, 'ALL') AS segment,
            coalesce(CAST(c_nationkey AS BIGINT), -1L) AS nationkey,
            count(*) AS n_cust,
            CAST(sum(bal_cents) AS DOUBLE) / 100.0 AS sum_bal
        FROM (
            SELECT c_mktsegment, c_nationkey,
                   CAST(round(c_acctbal * 100) AS BIGINT) AS bal_cents
            FROM customer_gs
        )
        GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey), ())
        ORDER BY segment, nationkey
        """
    )


@register(
    "agg_having",
    oracle_sql="""
        SELECT c_nationkey AS nationkey,
               count(*) AS n_cust,
               CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS DOUBLE) / 100.0
                   / count(*) AS avg_bal
        FROM customer
        GROUP BY c_nationkey
        HAVING count(*) > 40
           AND sum(CAST(round(c_acctbal * 100) AS BIGINT)) > 0
        ORDER BY nationkey
    """,
    description="Post-aggregation HAVING filter; the positivity condition "
    "is on the exact integer sum so both engines decide identically.",
)
def agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    return (
        cust.groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(
            F.count(F.lit(1)).alias("n_cust"),
            exact_avg("c_acctbal", 100).alias("avg_bal"),
            F.sum(scaled_long("c_acctbal", 100)).alias("_sum_cents"),
        )
        .where((F.col("n_cust") > 40) & (F.col("_sum_cents") > 0))
        .drop("_sum_cents")
        .orderBy("nationkey")
    )


@register(
    "agg_listagg_sorted",
    oracle_sql="""
        SELECT
            c_nationkey,
            count(*) AS n,
            string_agg(c_name, ',' ORDER BY c_name) AS names
        FROM customer
        WHERE c_acctbal > 9000.0
        GROUP BY c_nationkey
        ORDER BY c_nationkey
    """,
    description="Deterministic list aggregation: per-nation sorted, "
    "comma-joined customer names (collect_list is unordered across "
    "partitions, so array_sort before joining is what makes the result "
    "partitioning-invariant — the same discipline string_agg ORDER BY "
    "encodes in the oracle).",
)
def agg_listagg_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load(spark, sf_dir, "customer")
    return (
        customer.where(F.col("c_acctbal") > 9000.0)
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.array_join(F.array_sort(F.collect_list("c_name")), ",").alias(
                "names"
            ),
        )
        .orderBy("c_nationkey")
    )


@register(
    "agg_bool_bitwise",
    oracle_sql="""
        SELECT
            event_type,
            bool_or(value > 9.0) AS any_large,
            bool_and(value >= 0.0) AS all_nonneg,
            bit_or(CAST(json_extract_string(props, '$.k') AS INT)) AS k_or,
            bit_and(CAST(json_extract_string(props, '$.k') AS INT)) AS k_and
        FROM events
        GROUP BY event_type
        ORDER BY event_type
    """,
    description="Boolean and bitwise aggregates per event type — "
    "mergeable single-pass aggregates (bitmask rollups are the compact "
    "flag-summary primitive for lake-scale audit tables).",
)
def agg_bool_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        ev.groupBy("event_type")
        .agg(
            F.bool_or(F.col("value") > 9.0).alias("any_large"),
            F.bool_and(F.col("value") >= 0.0).alias("all_nonneg"),
            F.bit_or(k).alias("k_or"),
            F.bit_and(k).alias("k_and"),
        )
        .orderBy("event_type")
    )


@register(
    "agg_rollup_grouping_id",
    oracle_sql="""
        SELECT
            o_orderpriority,
            o_orderstatus,
            CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_pri,
            CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status,
            count(*) AS n
        FROM orders
        GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
        ORDER BY o_orderpriority NULLS FIRST, o_orderstatus NULLS FIRST
    """,
    description="Rollup with GROUPING() indicators — distinguishes a "
    "real NULL group key from a subtotal row, which downstream marts "
    "need to render subtotal levels correctly.",
)
def agg_rollup_grouping_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    return (
        orders.rollup("o_orderpriority", "o_orderstatus")
        .agg(
            F.grouping("o_orderpriority").cast("long").alias("g_pri"),
            F.grouping("o_orderstatus").cast("long").alias("g_status"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy(
            F.col("o_orderpriority").asc_nulls_first(),
            F.col("o_orderstatus").asc_nulls_first(),
        )
    )


@register(
    "sql_api_pricing",
    oracle_sql="""
        SELECT l_returnflag,
               l_linestatus,
               CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS DOUBLE)
                   / 100.0 AS sum_qty,
               CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE)
                   / 100.0 AS sum_base_price,
               count(*) AS n
        FROM lineitem
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """,
    description="The SQL entry point: the same engine surface driven "
    "through spark.sql() over a registered temp view instead of the "
    "DataFrame API — both produce the identical Catalyst logical plan, "
    "so everything SCALE.md documents (pushdown, two-phase agg, AQE) "
    "applies unchanged; this op pins that equivalence into the graded "
    "contract. Scaled-integer sums written directly in Spark SQL "
    "(floor(x*100 + 0.5), the scaled_long pairing).",
)
def sql_api_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("lineitem_sql_api")
    return spark.sql(
        """
        SELECT l_returnflag,
               l_linestatus,
               CAST(sum(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT)) AS DOUBLE)
                   / 100.0 AS sum_qty,
               CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
                    AS DOUBLE) / 100.0 AS sum_base_price,
               count(*) AS n
        FROM lineitem_sql_api
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
        """
    )


@register(
    "agg_filter_clause",
    oracle_sql="""
        SELECT o_orderpriority,
               count(*) AS n_all,
               count(*) FILTER (WHERE o_orderstatus = 'F') AS n_finished,
               count(*) FILTER (WHERE o_totalprice > 1000) AS n_large,
               CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                    FILTER (WHERE o_orderstatus = 'O') AS DOUBLE) / 100.0
                   AS open_total
        FROM orders
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """,
    description="Multi-FILTER aggregation: several differently-"
    "conditioned metrics (finished count, large-order count, open-"
    "order total) in ONE scan and one two-phase aggregate — the "
    "dashboard-metrics pattern that replaces N self-joined subqueries "
    "with N filtered aggregates; at 100 TB that is one pass over the "
    "fact instead of N.",
)
def agg_filter_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    cents = scaled_long("o_totalprice", 100)
    return (
        orders.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_all"),
            F.count_if(F.col("o_orderstatus") == "F").alias("n_finished"),
            F.count_if(F.col("o_totalprice") > 1000).alias("n_large"),
            (
                F.sum(F.when(F.col("o_orderstatus") == "O", cents))
                .cast("double")
                / 100.0
            ).alias("open_total"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "agg_weighted_median",
    oracle_sql="""
        WITH pts AS (
            SELECT l_returnflag,
                   CAST(round(l_extendedprice * 100) AS BIGINT) AS price_c,
                   CAST(l_quantity AS BIGINT) AS wt
            FROM lineitem
        ), cum AS (
            SELECT l_returnflag, price_c, wt,
                   sum(wt) OVER (
                       PARTITION BY l_returnflag
                       ORDER BY price_c, wt
                       ROWS UNBOUNDED PRECEDING) AS cw,
                   sum(wt) OVER (PARTITION BY l_returnflag) AS tw
            FROM pts
        )
        SELECT l_returnflag,
               CAST(min(CASE WHEN 2 * cw >= tw THEN price_c END) AS DOUBLE)
                   / 100.0 AS weighted_median_price,
               CAST(max(tw) AS BIGINT) AS total_weight
        FROM cum
        GROUP BY l_returnflag
        ORDER BY l_returnflag
    """,
    description="Exact weighted median: the price at which the "
    "quantity-weighted cumulative mass first reaches half the group "
    "total — computed as a running integer-weight sum over the "
    "price-ordered partition and a min-over-crossing aggregate; all "
    "comparisons are exact BIGINT arithmetic (2·cw ≥ tw avoids any "
    "division), so the answer is partitioning-independent. The "
    "inventory-valuation / fair-price statistic plain median ignores "
    "weights for. One shuffle on the group key serves the window and "
    "the aggregate.",
)
def agg_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    li = load(spark, sf_dir, "lineitem")
    pts = li.select(
        "l_returnflag",
        scaled_long("l_extendedprice", 100).alias("price_c"),
        F.col("l_quantity").cast("long").alias("wt"),
    )
    wc = (
        Window.partitionBy("l_returnflag")
        .orderBy("price_c", "wt")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wt = Window.partitionBy("l_returnflag")
    cum = pts.select(
        "l_returnflag",
        "price_c",
        F.sum("wt").over(wc).alias("cw"),
        F.sum("wt").over(wt).alias("tw"),
    )
    return (
        cum.groupBy("l_returnflag")
        .agg(
            (
                F.min(
                    F.when(2 * F.col("cw") >= F.col("tw"), F.col("price_c"))
                ).cast("double")
                / 100.0
            ).alias("weighted_median_price"),
            F.max("tw").alias("total_weight"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "agg_conditional_distinct",
    oracle_sql="""
        SELECT c_mktsegment,
               count(DISTINCT c_nationkey) AS nations_all,
               count(DISTINCT c_nationkey)
                   FILTER (WHERE c_acctbal > 5000.0) AS nations_rich,
               count(DISTINCT c_nationkey)
                   FILTER (WHERE c_acctbal < 0.0) AS nations_debt,
               count(*) AS n_customers
        FROM customer
        GROUP BY c_mktsegment
        ORDER BY c_mktsegment
    """,
    description="Conditional DISTINCT aggregation: per segment, the "
    "distinct nation count overall and under two different balance "
    "conditions, in ONE aggregate — each conditioned distinct becomes "
    "count(DISTINCT CASE WHEN cond THEN key END) so Catalyst plans a "
    "single Expand + two-level aggregate instead of three self-joined "
    "scans. The multi-metric distinct dashboard shape; the Expand "
    "multiplies rows ×(distinct-column count) BEFORE the shuffle but "
    "partial aggregation collapses each branch map-side.",
)
def agg_conditional_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load(spark, sf_dir, "customer")
    rich = F.when(F.col("c_acctbal") > 5000.0, F.col("c_nationkey"))
    debt = F.when(F.col("c_acctbal") < 0.0, F.col("c_nationkey"))
    return (
        customer.groupBy("c_mktsegment")
        .agg(
            F.countDistinct("c_nationkey").alias("nations_all"),
            F.countDistinct(rich).alias("nations_rich"),
            F.countDistinct(debt).alias("nations_debt"),
            F.count(F.lit(1)).alias("n_customers"),
        )
        .orderBy("c_mktsegment")
    )


@register(
    "agg_hll_partial_merge",
    oracle_sql=None,
    description="Mergeable HLL sketch aggregation (Apache DataSketches, "
    "Spark 4 built-ins): per-event_type HLL sketches of distinct "
    "user_ids built as PARTIAL sketches on an artificially "
    "repartitioned frame, merged with hll_union_agg, then estimated — "
    "the additive-state pattern that makes distinct counting "
    "incremental at lake scale (per-partition/per-day sketches union "
    "in O(sketch size), unlike exact COUNT DISTINCT which must "
    "re-shuffle raw keys). The two-stage build proves merge "
    "associativity on a real partition boundary, not just within one "
    "aggregate. Rows-only by nature: DuckDB cannot reproduce the "
    "DataSketches estimator; the companion exact op "
    "(agg_count_distinct) is the accuracy oracle, and the estimate's "
    "relative error is bounded by the lgConfigK=12 standard error "
    "(~1.6%), asserted in tests/test_parity.py.",
)
def agg_hll_partial_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select("event_type", "user_id")
    # Partial sketches across an explicit 8-way partition boundary:
    # the shape a per-day/per-file incremental pipeline produces.
    partials = (
        ev.repartition(8, "user_id")
        .withColumn("pid", F.spark_partition_id())
        .groupBy("event_type", "pid")
        .agg(F.hll_sketch_agg("user_id", F.lit(12)).alias("sketch"))
    )
    return (
        partials.groupBy("event_type")
        .agg(
            F.hll_sketch_estimate(
                F.hll_union_agg("sketch", F.lit(False))
            ).alias("approx_users"),
            F.count(F.lit(1)).alias("n_partials"),
        )
        .orderBy("event_type")
    )


@register(
    "agg_kll_quantile_merge",
    oracle_sql=None,
    description="Mergeable KLL quantile sketches (DataSketches): "
    "per-event_type value sketches built as TWO partials over a "
    "user-parity split, merged with the pairwise kll_sketch_merge, "
    "then queried for p50/p95 — the streaming/incremental quantile "
    "pattern (per-day partial sketches fold into month-to-date "
    "percentiles without re-reading raw data; exact percentiles need "
    "the full value multiset every time). Rows-only: the KLL "
    "estimator is not reproducible in SQL; rank accuracy vs the exact "
    "percentile companion is asserted in tests/test_parity.py.",
)
def agg_kll_quantile_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select(
        "event_type", "user_id", "value"
    )
    partials = (
        ev.groupBy("event_type", (F.col("user_id") % 2).alias("parity"))
        .agg(F.kll_sketch_agg_double("value", F.lit(200)).alias("sk"))
    )
    merged = (
        partials.groupBy("event_type")
        .agg(
            F.min_by("sk", "parity").alias("sk0"),
            F.max_by("sk", "parity").alias("sk1"),
        )
        .select(
            "event_type",
            F.kll_sketch_merge_double("sk0", "sk1").alias("sk"),
        )
    )
    return (
        merged.select(
            "event_type",
            F.kll_sketch_get_quantile_double("sk", F.lit(0.5)).alias("p50"),
            F.kll_sketch_get_quantile_double("sk", F.lit(0.95)).alias("p95"),
            F.kll_sketch_get_n_double("sk").alias("n"),
        )
        .orderBy("event_type")
    )


@register(
    "agg_theta_audience_overlap",
    oracle_sql=None,
    description="Theta-sketch audience set algebra (DataSketches): "
    "distinct-user sketches per event_type (partials union-merged via "
    "theta_union_agg across an 8-way repartition boundary), then the "
    "click/purchase audiences combined with theta_union, "
    "theta_intersection, and theta_difference — the approximate "
    "set-overlap capability (campaign reach, retargeting audiences) "
    "that exact COUNT DISTINCT pairs cannot deliver without an "
    "O(n²) self-join of raw key sets. At lake scale the sketches are "
    "KiB-sized mergeable state per segment. Rows-only: estimator not "
    "SQL-reproducible; accuracy vs exact set ops asserted in "
    "tests/test_parity.py.",
)
def agg_theta_audience_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select("event_type", "user_id")
    partials = (
        ev.where(F.col("event_type").isin("click", "purchase"))
        .repartition(8, "user_id")
        .groupBy("event_type", F.spark_partition_id().alias("pid"))
        .agg(F.theta_sketch_agg("user_id").alias("sk"))
    )
    per_type = partials.groupBy("event_type").agg(
        F.theta_union_agg("sk").alias("sk")
    )
    wide = per_type.groupBy().pivot(
        "event_type", ["click", "purchase"]
    ).agg(F.first("sk"))
    return wide.select(
        F.theta_sketch_estimate(
            F.theta_union("click", "purchase")
        ).alias("either"),
        F.theta_sketch_estimate(
            F.theta_intersection("click", "purchase")
        ).alias("both"),
        F.theta_sketch_estimate(
            F.theta_difference("click", "purchase")
        ).alias("click_only"),
    )


@register(
    "agg_histogram_width_bucket",
    oracle_sql="""
        WITH b AS (
            SELECT CASE WHEN value < 0.0 THEN 0
                        WHEN value >= 512.0 THEN 9
                        ELSE CAST(floor((value - 0.0) * 8.0 / 512.0)
                                  AS BIGINT) + 1
                   END AS bucket,
                   CAST(round(value * 100) AS BIGINT) AS cents
            FROM events
        )
        SELECT bucket,
               count(*) AS n,
               CAST(sum(cents) AS DOUBLE) / 100.0 AS sum_value
        FROM b
        GROUP BY bucket
        ORDER BY bucket
    """,
    description="Equi-width histogram via width_bucket: event values "
    "binned into 8 buckets over [0, 512) with under/overflow buckets "
    "0 and 9 (width_bucket's SQL-standard semantics), counts + exact "
    "sums per bin — the numeric-distribution profiling step DQ "
    "dashboards run. Bucket width 64 is a power of two, so every "
    "edge computation is EXACT in doubles and DuckDB's arithmetic "
    "emulation (no native width_bucket) lands in identical bins — a "
    "non-dyadic width would risk boundary flips. Map-side combine "
    "collapses to ≤10 groups before the shuffle.",
)
def agg_histogram_width_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    bucket = F.expr("width_bucket(value, 0.0D, 512.0D, 8)").cast("long")
    return (
        ev.select(bucket.alias("bucket"), scaled_long("value", 100).alias("cents"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.sum("cents").cast("double") / 100.0).alias("sum_value"),
        )
        .orderBy("bucket")
    )
