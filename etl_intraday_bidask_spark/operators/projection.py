"""Projection / filter / predicate operators (SURVEY.md §2.2).

Pure narrow transformations — no shuffle; Catalyst folds them into the
scan stage under whole-stage codegen.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from etl_intraday_bidask_spark.functions.parity import exact_value
from etl_intraday_bidask_spark.registry import register
from etl_intraday_bidask_spark.tables import load


@register(
    "project_select",
    oracle_sql="""
        SELECT l_orderkey,
               l_linenumber,
               CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)
                   / 10000.0 AS net_price,
               CAST(round(l_extendedprice * (1 - l_discount) * (1 + l_tax)
                          * 1000000) AS BIGINT) / 1000000.0 AS charged
        FROM lineitem
    """,
    description="Column pruning + computed columns — emitted on their "
    "exact decimal grid (2dp × 2dp = 4dp, × 2dp = 6dp; parity policy).",
)
def project_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    net = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        exact_value(net, 10000).alias("net_price"),
        exact_value(net * (1 + F.col("l_tax")), 1000000).alias("charged"),
    )


@register(
    "filter_compound",
    oracle_sql="""
        SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority
        FROM orders
        WHERE (o_orderstatus IN ('F', 'P') OR o_orderpriority LIKE '1-%')
          AND o_totalprice BETWEEN 50000.0 AND 200000.0
          AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
    """,
    description="Compound predicate: AND/OR/IN/BETWEEN/LIKE over "
    "string + date + numeric columns.",
)
def filter_compound(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    return orders.where(
        (
            F.col("o_orderstatus").isin("F", "P")
            | F.col("o_orderpriority").like("1-%")
        )
        & F.col("o_totalprice").between(50000.0, 200000.0)
        & (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
    ).select("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority")


@register(
    "filter_null_semantics",
    oracle_sql="""
        SELECT
            c_custkey,
            coalesce(nullif(c_mktsegment, 'MACHINERY'), 'REDACTED') AS segment,
            (nullif(c_mktsegment, 'MACHINERY') IS NULL) AS was_machinery,
            (nullif(c_mktsegment, 'MACHINERY') IS NOT DISTINCT FROM NULL) AS null_safe_eq
        FROM customer
        WHERE c_acctbal IS NOT NULL
    """,
    description="NULL semantics: nullif/coalesce/IS NULL/null-safe equality. "
    "Fixtures are null-free, so nulls are manufactured with nullif.",
)
def filter_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    seg_or_null = F.nullif(F.col("c_mktsegment"), F.lit("MACHINERY"))
    return cust.where(F.col("c_acctbal").isNotNull()).select(
        "c_custkey",
        F.coalesce(seg_or_null, F.lit("REDACTED")).alias("segment"),
        seg_or_null.isNull().alias("was_machinery"),
        seg_or_null.eqNullSafe(F.lit(None).cast("string")).alias("null_safe_eq"),
    )
