"""Extended ETL operators (SURVEY.md §2.13): ORC/JSON ingest legs,
SCD-1 merge/upsert, and funnel conversion — the remaining lake-ETL
surface of the reference (S3 Parquet/ORC data lake with incremental
loads) plus a product-analytics rollup over the event stream.

The ORC/JSON round-trips are hash-graded: the file format preserves the
fixture values exactly (int64/double/string survive ORC and Spark's
shortest-round-trip JSON encoding losslessly), so the read-back
aggregate must equal the same aggregate over the original table — which
IS DuckDB-expressible and therefore a stronger check than rows-only.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from etl_intraday_bidask_spark.functions.parity import exact_sum, scaled_long
from etl_intraday_bidask_spark.registry import register
from etl_intraday_bidask_spark.tables import load, scratch_dir


@register(
    "source_orc_roundtrip",
    oracle_sql="""
        SELECT
            o_orderstatus,
            count(*) AS n,
            CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
                / 100.0 AS sum_price
        FROM orders
        GROUP BY o_orderstatus
        ORDER BY o_orderstatus
    """,
    description="ORC ingest leg (the reference lake is Parquet/ORC): "
    "write orders to ORC, read back, aggregate. Hash-graded against the "
    "same aggregate over the original table — ORC round-trips the fixture "
    "types losslessly, so any mismatch is a real reader/writer bug.",
)
def source_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    out = os.path.join(scratch_dir("source_orc"), "orders_orc")
    orders.write.mode("overwrite").orc(out)
    back = spark.read.orc(out)
    return (
        back.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            exact_sum("o_totalprice", 100).alias("sum_price"),
        )
        .orderBy("o_orderstatus")
    )


@register(
    "source_json_roundtrip",
    oracle_sql="""
        SELECT
            c_mktsegment,
            count(*) AS n,
            CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS DOUBLE)
                / 100.0 AS sum_bal
        FROM customer
        GROUP BY c_mktsegment
        ORDER BY c_mktsegment
    """,
    description="JSON-lines ingest with an explicit schema (no inference "
    "pass — schema inference is a full extra scan at lake scale): write "
    "customer to JSON, read back typed, aggregate. Hash-graded: Spark's "
    "JSON writer emits shortest-round-trip doubles, so values survive.",
)
def source_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load(spark, sf_dir, "customer")
    out = os.path.join(scratch_dir("source_json"), "customer_json")
    customer.write.mode("overwrite").json(out)
    schema = T.StructType(
        [
            T.StructField("c_custkey", T.LongType()),
            T.StructField("c_name", T.StringType()),
            T.StructField("c_nationkey", T.IntegerType()),
            T.StructField("c_acctbal", T.DoubleType()),
            T.StructField("c_mktsegment", T.StringType()),
        ]
    )
    back = spark.read.schema(schema).json(out)
    return (
        back.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n"),
            exact_sum("c_acctbal", 100).alias("sum_bal"),
        )
        .orderBy("c_mktsegment")
    )


@register(
    "merge_upsert_scd1",
    oracle_sql="""
        WITH source AS (
            SELECT
                o_orderkey,
                o_orderstatus,
                CAST(round(o_totalprice * 1.1 * 1000) AS BIGINT) / 1000.0
                    AS price
            FROM orders WHERE o_orderstatus = 'O'
            UNION ALL
            SELECT o_orderkey + 10000000, 'N', o_totalprice
            FROM orders WHERE o_orderstatus = 'P'
        ),
        merged AS (
            SELECT
                coalesce(s.o_orderstatus, t.o_orderstatus) AS status,
                coalesce(s.price, t.o_totalprice) AS price
            FROM orders t
            FULL OUTER JOIN source s USING (o_orderkey)
        )
        SELECT
            status,
            count(*) AS n,
            CAST(sum(CAST(round(price * 1000) AS BIGINT)) AS DOUBLE)
                / 1000.0 AS total
        FROM merged
        GROUP BY status
        ORDER BY status
    """,
    description="SCD-1 merge/upsert: a change batch (repriced open "
    "orders + brand-new rows) full-outer-joined onto the target with "
    "coalesce semantics — MERGE INTO re-expressed in pure DataFrame ops. "
    "At lake scale the same plan runs keyed on the table's bucket/ "
    "partition layout so the join co-locates without a full shuffle.",
)
def merge_upsert_scd1(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    target = orders.select(
        "o_orderkey", "o_orderstatus", F.col("o_totalprice").alias("t_price")
    )
    updates = orders.where(F.col("o_orderstatus") == "O").select(
        "o_orderkey",
        F.col("o_orderstatus").alias("s_status"),
        (scaled_long(F.col("o_totalprice") * F.lit(1.1), 1000) / F.lit(1000.0)).alias(
            "s_price"
        ),
    )
    inserts = orders.where(F.col("o_orderstatus") == "P").select(
        (F.col("o_orderkey") + F.lit(10000000)).alias("o_orderkey"),
        F.lit("N").alias("s_status"),
        F.col("o_totalprice").alias("s_price"),
    )
    source = updates.unionByName(inserts)
    merged = target.join(source, "o_orderkey", "full_outer").select(
        F.coalesce(F.col("s_status"), F.col("o_orderstatus")).alias("status"),
        F.coalesce(F.col("s_price"), F.col("t_price")).alias("price"),
    )
    return (
        merged.groupBy("status")
        .agg(
            F.count(F.lit(1)).alias("n"),
            exact_sum("price", 1000).alias("total"),
        )
        .orderBy("status")
    )


@register(
    "funnel_conversion",
    oracle_sql="""
        WITH stages AS (
            SELECT
                user_id,
                min(ts) FILTER (WHERE event_type = 'view') AS t_view,
                min(ts) FILTER (WHERE event_type = 'click') AS t_click,
                min(ts) FILTER (WHERE event_type = 'purchase') AS t_buy
            FROM events
            GROUP BY user_id
        )
        SELECT
            count(*) AS n_users,
            count(t_view) AS n_view,
            count(*) FILTER (WHERE t_click > t_view) AS n_view_then_click,
            count(*) FILTER (WHERE t_click > t_view AND t_buy > t_click)
                AS n_full_funnel
        FROM stages
    """,
    description="Ordered-funnel conversion (view → later click → later "
    "purchase) per user, counted across users. Stage timestamps stay "
    "internal (never emitted — ns/µs parity), output is pure counts. "
    "One shuffle on user_id, then a scalar fold.",
)
def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    stages = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t_view"),
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias("t_click"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("t_buy"),
    )
    return stages.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.count("t_view").alias("n_view"),
        F.count(F.when(F.col("t_click") > F.col("t_view"), 1)).alias(
            "n_view_then_click"
        ),
        F.count(
            F.when(
                (F.col("t_click") > F.col("t_view"))
                & (F.col("t_buy") > F.col("t_click")),
                1,
            )
        ).alias("n_full_funnel"),
    )


@register(
    "merge_upsert_scd2",
    oracle_sql="""
        WITH chg AS (
            SELECT o_custkey, max(o_orderdate) AS chg_ts
            FROM orders
            WHERE o_orderdate >= TIMESTAMP '1999-01-01 00:00:00'
            GROUP BY o_custkey
        ),
        j AS (
            SELECT c.c_custkey, c.c_nationkey, chg.chg_ts
            FROM customer c
            LEFT JOIN chg ON c.c_custkey = chg.o_custkey
        )
        SELECT c_custkey,
               c_nationkey,
               CAST(floor(epoch(TIMESTAMP '1995-01-01 00:00:00')) AS BIGINT)
                   AS valid_from_s,
               CASE WHEN chg_ts IS NOT NULL
                    THEN CAST(floor(epoch(chg_ts)) AS BIGINT) END AS valid_to_s,
               chg_ts IS NULL AS is_current
        FROM j
        UNION ALL
        SELECT c_custkey,
               (c_nationkey + 1) % 25 AS c_nationkey,
               CAST(floor(epoch(chg_ts)) AS BIGINT) AS valid_from_s,
               CAST(NULL AS BIGINT) AS valid_to_s,
               TRUE AS is_current
        FROM j
        WHERE chg_ts IS NOT NULL
        ORDER BY c_custkey, valid_from_s
    """,
    description="SCD-2 merge: a deterministic change batch (customers "
    "with post-1999 orders move to the next nation at their latest "
    "order date) applied onto the customer dim with full history — the "
    "prior version row is closed (valid_to = change ts, is_current "
    "false) and a new open-ended version row is appended. One left join "
    "from the dim to the aggregated change batch produces both "
    "branches; no row is rewritten in place, matching the append-"
    "friendly lake pattern (Delta/Iceberg MERGE compiles to the same "
    "shape). Validity bounds emitted as epoch-second BIGINTs (parity).",
)
def merge_upsert_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    orders = load(spark, sf_dir, "orders")
    chg = (
        orders.where(
            F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp")
        )
        .groupBy("o_custkey")
        .agg(F.max("o_orderdate").alias("chg_ts"))
    )
    j = cust.join(chg, cust.c_custkey == chg.o_custkey, "left")
    base_from = F.unix_timestamp(F.lit("1995-01-01").cast("timestamp"))
    closed_or_current = j.select(
        "c_custkey",
        "c_nationkey",
        base_from.alias("valid_from_s"),
        F.when(
            F.col("chg_ts").isNotNull(), F.unix_timestamp(F.col("chg_ts"))
        ).alias("valid_to_s"),
        F.col("chg_ts").isNull().alias("is_current"),
    )
    new_versions = j.where(F.col("chg_ts").isNotNull()).select(
        "c_custkey",
        ((F.col("c_nationkey") + 1) % 25).alias("c_nationkey"),
        F.unix_timestamp(F.col("chg_ts")).alias("valid_from_s"),
        F.lit(None).cast("long").alias("valid_to_s"),
        F.lit(True).alias("is_current"),
    )
    return closed_or_current.unionByName(new_versions).orderBy(
        "c_custkey", "valid_from_s"
    )


@register(
    "etl_incremental_highwater",
    oracle_sql="""
        SELECT o_orderstatus,
               count(*) AS n,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
                   / 100.0 AS total
        FROM orders
        GROUP BY o_orderstatus
        ORDER BY o_orderstatus
    """,
    description="Incremental load via high-water mark: the 'already "
    "materialized' partial aggregate (orders before 1999-01-01) and the "
    "'new batch' partial (at-or-after) are computed separately and "
    "merged by re-aggregating the additive partials (counts and exact "
    "cent sums) — the incremental-refresh shape that lets a nightly "
    "job re-aggregate only the new partition instead of 100 TB of "
    "history. The oracle is the direct full aggregate: merging partials "
    "MUST be indistinguishable from recomputing, which is exactly what "
    "additive statistics guarantee (and non-additive ones, like exact "
    "medians, do not — those need full recompute or sketches).",
)
def etl_incremental_highwater(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    hwm = F.lit("1999-01-01").cast("timestamp")

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy("o_orderstatus").agg(
            F.count(F.lit(1)).alias("pn"),
            F.sum(scaled_long("o_totalprice", 100)).alias("pcents"),
        )

    old_part = partial(orders.where(F.col("o_orderdate") < hwm))
    new_part = partial(orders.where(F.col("o_orderdate") >= hwm))
    return (
        old_part.unionByName(new_part)
        .groupBy("o_orderstatus")
        .agg(
            F.sum("pn").alias("n"),
            (F.sum("pcents").cast("double") / 100.0).alias("total"),
        )
        .orderBy("o_orderstatus")
    )
