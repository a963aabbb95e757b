"""Sort / limit / top-k operators (SURVEY.md §2.6).

Global ORDER BY is a range-partitioned sort in Spark; ORDER BY + LIMIT
collapses to TakeOrderedAndProject (per-partition top-k then a single
merge on the driver) — the scalable global-top-k physical plan.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from etl_intraday_bidask_spark.registry import register
from etl_intraday_bidask_spark.tables import load


@register(
    "sort_multikey",
    oracle_sql="""
        SELECT s_suppkey,
               s_nationkey,
               nullif(s_acctbal, 0.0) AS bal_or_null
        FROM supplier
        ORDER BY s_nationkey DESC, bal_or_null ASC NULLS LAST, s_suppkey
    """,
    description="Multi-key sort with explicit NULLS LAST placement "
    "(nulls manufactured via nullif since fixtures are null-free).",
)
def sort_multikey(spark: SparkSession, sf_dir: str) -> DataFrame:
    sup = load(spark, sf_dir, "supplier")
    return sup.select(
        "s_suppkey",
        "s_nationkey",
        F.nullif(F.col("s_acctbal"), F.lit(0.0)).alias("bal_or_null"),
    ).orderBy(
        F.col("s_nationkey").desc(),
        F.col("bal_or_null").asc_nulls_last(),
        F.col("s_suppkey"),
    )


@register(
    "limit_global_topk",
    oracle_sql="""
        SELECT l_orderkey,
               l_linenumber,
               round(l_extendedprice * (1 - l_discount), 4) AS net_price
        FROM lineitem
        ORDER BY net_price DESC, l_orderkey, l_linenumber
        LIMIT 100
    """,
    description="Global top-100 lineitems by net price — "
    "TakeOrderedAndProject with a full tie-break for determinism.",
)
def limit_global_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    net = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")), 4
    ).alias("net_price")
    return (
        li.select("l_orderkey", "l_linenumber", net)
        .orderBy(
            F.col("net_price").desc(), F.col("l_orderkey"), F.col("l_linenumber")
        )
        .limit(100)
    )
