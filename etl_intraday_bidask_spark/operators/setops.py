"""Set operations + exact dedup (SURVEY.md §2.7).

INTERSECT / EXCEPT distinct-ify via hash aggregation on all columns —
same shuffle shape as groupBy, so they scale like any agg. Exact dedup
(`dropDuplicates`) projects the key columns only: dropDuplicates keeps an
arbitrary row per key, so emitting non-key columns would be
nondeterministic (SURVEY.md §2.7).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from etl_intraday_bidask_spark.functions.parity import scaled_long
from etl_intraday_bidask_spark.registry import register
from etl_intraday_bidask_spark.tables import load


@register(
    "set_union_all",
    oracle_sql="""
        SELECT o_orderkey, o_totalprice, 'urgent' AS src
        FROM orders WHERE o_orderpriority = '1-URGENT'
        UNION ALL
        SELECT o_orderkey, o_totalprice, 'big' AS src
        FROM orders WHERE o_totalprice > 250000.0
    """,
    description="Bag union (UNION ALL) of two filtered slices, tagged "
    "with their source — overlapping rows kept twice.",
)
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    urgent = orders.where(F.col("o_orderpriority") == "1-URGENT").select(
        "o_orderkey", "o_totalprice", F.lit("urgent").alias("src")
    )
    big = orders.where(F.col("o_totalprice") > 250000.0).select(
        "o_orderkey", "o_totalprice", F.lit("big").alias("src")
    )
    return urgent.unionByName(big)


@register(
    "set_intersect",
    oracle_sql="""
        SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        INTERSECT
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
    description="Distinct intersection: customers with an urgent order "
    "AND a finished order.",
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    a = orders.where(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    b = orders.where(F.col("o_orderstatus") == "F").select("o_custkey")
    return a.intersect(b)


@register(
    "set_except",
    oracle_sql="""
        SELECT o_custkey FROM orders
        EXCEPT
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
    description="Distinct difference: customers who ordered but never had "
    "a finished order.",
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    all_cust = orders.select("o_custkey")
    finished = orders.where(F.col("o_orderstatus") == "F").select("o_custkey")
    # subtract == EXCEPT DISTINCT (removes every row present in the right).
    return all_cust.subtract(finished)


@register(
    "dedup_exact",
    oracle_sql="""
        SELECT DISTINCT user_id, event_type
        FROM events
        ORDER BY user_id, event_type
    """,
    description="Exact dedup on a key subset — hash-groupBy distinct, "
    "projecting only the key columns for determinism.",
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return (
        ev.select("user_id", "event_type")
        .dropDuplicates(["user_id", "event_type"])
        .orderBy("user_id", "event_type")
    )


@register(
    "set_union_by_name_evolved",
    oracle_sql="""
        WITH legacy AS (
            SELECT o_orderkey, o_totalprice, NULL AS o_orderpriority
            FROM orders WHERE o_orderkey % 3 = 0
        ), current AS (
            SELECT o_orderkey, o_totalprice, o_orderpriority
            FROM orders WHERE o_orderkey % 3 <> 0
        ), unified AS (
            SELECT * FROM legacy UNION ALL SELECT * FROM current
        )
        SELECT coalesce(o_orderpriority, 'UNKNOWN') AS pri,
               count(*) AS n,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
                   / 100.0 AS sum_price
        FROM unified
        GROUP BY pri
        ORDER BY pri
    """,
    description="Schema-evolution union on the DataFrame surface: "
    "unionByName(allowMissingColumns=True) aligns two frames by COLUMN "
    "NAME (not position) and null-fills columns one side lacks — the "
    "API-level twin of mergeSchema reads (scan_schema_evolution), used "
    "when the old and new extracts are already DataFrames. The legacy "
    "slice deliberately drops o_orderpriority; the union restores it "
    "as NULL and the rollup coalesces to 'UNKNOWN'. Narrow union, one "
    "aggregate shuffle.",
)
def set_union_by_name_evolved(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    legacy = orders.filter(F.col("o_orderkey") % 3 == 0).select(
        "o_orderkey", "o_totalprice"
    )
    current = orders.filter(F.col("o_orderkey") % 3 != 0).select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    )
    unified = legacy.unionByName(current, allowMissingColumns=True)
    return (
        unified.groupBy(
            F.coalesce(F.col("o_orderpriority"), F.lit("UNKNOWN")).alias("pri")
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.sum(scaled_long("o_totalprice", 100)).cast("double") / 100.0).alias(
                "sum_price"
            ),
        )
        .orderBy("pri")
    )
