"""Data-quality check operators.

The reference pipeline ends its DAG with data-quality check tasks
(SURVEY.md §0 [PUB]: Airflow DAG → Spark jobs → S3 → quality checks);
this module is that surface re-expressed as one declarative Spark job:
each check is an aggregate producing (check_name, table_name, metric,
passed), unioned into a single small report — one pass per source
table, referential checks as anti-join counts.

At scale each check is a count over a pushed-down scan or a broadcast/
shuffle anti-join — no collect, no per-check job storm; the whole
report is one action.
"""

from __future__ import annotations

from functools import reduce

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from etl_intraday_bidask_spark.registry import register
from etl_intraday_bidask_spark.tables import load

# One persisted relation per (session, sf_dir, source frame) for
# cache_reuse_two_aggs. persist() on a FRESH DataFrame per invocation
# stacked a new InMemoryRelation into storage memory on every
# bench/fuzz/sweep call (LRU-evicted, so bounded, but stale entries
# pollute storage and re-materialize on eviction); the memo reuses one
# cached relation, and — like tables.view() — keys on the identity of
# load()'s frame so an injected fixture refreshes the cache instead of
# silently serving stale rows. Stored ON the session (tables.
# session_memo) so it dies with the session object.
from etl_intraday_bidask_spark.tables import session_memo  # noqa: E402


def _persisted_filtered_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    memo = session_memo(spark, "_etl_graft_quality_cache_memo")
    src = load(spark, sf_dir, "orders")
    cached = memo.get(sf_dir)
    if cached is not None and cached[0] is src:
        return cached[1]
    if cached is not None:
        cached[1].unpersist(blocking=False)
    persisted = src.where(F.col("o_totalprice") > 150000.0).persist()
    memo[sf_dir] = (src, persisted)
    return persisted


@register(
    "dq_checks",
    oracle_sql="""
        SELECT * FROM (
            SELECT 'row_count' AS check_name, 'orders' AS table_name,
                   count(*) AS metric, count(*) > 0 AS passed
            FROM orders
            UNION ALL
            SELECT 'null_custkey', 'orders',
                   count(*) FILTER (WHERE o_custkey IS NULL),
                   count(*) FILTER (WHERE o_custkey IS NULL) = 0
            FROM orders
            UNION ALL
            SELECT 'dup_orderkey', 'orders',
                   count(*) - count(DISTINCT o_orderkey),
                   count(*) = count(DISTINCT o_orderkey)
            FROM orders
            UNION ALL
            SELECT 'bad_status', 'orders',
                   count(*) FILTER (WHERE o_orderstatus NOT IN ('O','F','P')),
                   count(*) FILTER (WHERE o_orderstatus NOT IN ('O','F','P')) = 0
            FROM orders
            UNION ALL
            SELECT 'orphan_lineitems', 'lineitem', count(*), count(*) = 0
            FROM lineitem WHERE NOT EXISTS (
                SELECT 1 FROM orders WHERE o_orderkey = l_orderkey)
            UNION ALL
            SELECT 'orphan_orders', 'orders', count(*), count(*) = 0
            FROM orders WHERE NOT EXISTS (
                SELECT 1 FROM customer WHERE c_custkey = o_custkey)
            UNION ALL
            SELECT 'nonpositive_price', 'lineitem',
                   count(*) FILTER (WHERE l_extendedprice <= 0),
                   count(*) FILTER (WHERE l_extendedprice <= 0) = 0
            FROM lineitem
            UNION ALL
            SELECT 'ship_before_order', 'lineitem', count(*), count(*) = 0
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            WHERE l_shipdate < o_orderdate
        )
        ORDER BY check_name
    """,
    description="Data-quality report (the reference DAG's closing "
    "check tasks): row counts, null/duplicate keys, domain values, "
    "referential integrity (anti-joins), cross-table date sanity — one "
    "row per check with its metric and pass flag.",
)
def dq_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    lineitem = load(spark, sf_dir, "lineitem")
    customer = load(spark, sf_dir, "customer")

    def report(check: str, table: str, metric_col: F.Column, df: DataFrame,
               passed_when_zero: bool = True) -> DataFrame:
        metric = metric_col.cast("long").alias("metric")
        passed = (
            (metric_col == 0) if passed_when_zero else (metric_col > 0)
        ).alias("passed")
        return df.agg(metric, passed).select(
            F.lit(check).alias("check_name"),
            F.lit(table).alias("table_name"),
            "metric",
            "passed",
        )

    n_null_custkey = F.count(F.when(F.col("o_custkey").isNull(), 1))
    n_bad_status = F.count(
        F.when(~F.col("o_orderstatus").isin("O", "F", "P"), 1)
    )
    n_nonpos_price = F.count(F.when(F.col("l_extendedprice") <= 0, 1))
    checks = [
        report("row_count", "orders", F.count(F.lit(1)), orders, False),
        report("null_custkey", "orders", n_null_custkey, orders),
        report(
            "dup_orderkey",
            "orders",
            F.count(F.lit(1)) - F.countDistinct("o_orderkey"),
            orders,
        ),
        report("bad_status", "orders", n_bad_status, orders),
        report(
            "orphan_lineitems",
            "lineitem",
            F.count(F.lit(1)),
            lineitem.join(
                orders, F.col("l_orderkey") == F.col("o_orderkey"), "left_anti"
            ),
        ),
        report(
            "orphan_orders",
            "orders",
            F.count(F.lit(1)),
            orders.join(
                customer, F.col("o_custkey") == F.col("c_custkey"), "left_anti"
            ),
        ),
        report("nonpositive_price", "lineitem", n_nonpos_price, lineitem),
        report(
            "ship_before_order",
            "lineitem",
            F.count(F.lit(1)),
            lineitem.join(
                orders, F.col("l_orderkey") == F.col("o_orderkey")
            ).where(F.col("l_shipdate") < F.col("o_orderdate")),
        ),
    ]
    return reduce(DataFrame.unionByName, checks).orderBy("check_name")


@register(
    "observe_pipeline_metrics",
    oracle_sql="""
        SELECT
            count(*) AS n_rows,
            CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE)
                / 100.0 AS sum_price,
            count(*) FILTER (WHERE l_discount > 0.05) AS n_discounted
        FROM lineitem
        WHERE l_returnflag = 'R'
    """,
    description="Observation API (df.observe): pipeline metrics collected "
    "as a side-channel of a real pass over the data — zero extra scans, "
    "the production way to emit row counts / DQ counters from an ETL "
    "job without a second aggregation job. The observed values are "
    "returned as the result and hash-graded.",
)
def observe_pipeline_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Observation

    li = load(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    obs = Observation("pipeline_metrics")
    observed = li.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        (
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("long"))
            .cast("double")
            / 100.0
        ).alias("sum_price"),
        F.count(F.when(F.col("l_discount") > 0.05, 1)).alias("n_discounted"),
    )
    observed.write.format("noop").mode("overwrite").save()  # the real pass
    m = obs.get
    return spark.createDataFrame(
        [(m["n_rows"], m["sum_price"], m["n_discounted"])],
        "n_rows long, sum_price double, n_discounted long",
    )


@register(
    "cache_reuse_two_aggs",
    oracle_sql="""
        WITH filtered AS (
            SELECT * FROM orders WHERE o_totalprice > 150000.0
        )
        SELECT 'by_status' AS dim, o_orderstatus AS key, count(*) AS n
        FROM filtered GROUP BY o_orderstatus
        UNION ALL
        SELECT 'by_priority', o_orderpriority, count(*)
        FROM filtered GROUP BY o_orderpriority
    """,
    description="Materialized-once reuse: an expensive filtered relation "
    "is persisted and feeds two independent aggregations — the plan's "
    "second branch reads InMemoryTableScan instead of re-scanning "
    "parquet. At lake scale this is checkpoint/cache discipline for "
    "fan-out DAGs (one pass over 100 TB, many consumers).",
)
def cache_reuse_two_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    filtered = _persisted_filtered_orders(spark, sf_dir)
    by_status = filtered.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n")
    ).select(F.lit("by_status").alias("dim"), F.col("o_orderstatus").alias("key"), "n")
    by_priority = filtered.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n")
    ).select(
        F.lit("by_priority").alias("dim"),
        F.col("o_orderpriority").alias("key"),
        "n",
    )
    return by_status.unionByName(by_priority)
