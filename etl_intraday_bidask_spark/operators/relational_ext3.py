"""Third wave of extended relational / ETL operators (SURVEY.md §2.20):
TPC-H Q10-style returned-item revenue, calendar-spine densification,
positional explode, and CDC snapshot diff.

Scale notes: Q10 broadcasts the 25-row nation dim and leaves the two
fact shuffles (lineitem⋈orders on orderkey, +customer on custkey) a
cluster plan would also pick, with the returnflag and quarter filters
pushed into both parquet scans before either join; the date spine is a
30×5 broadcast side left-joined onto a pre-aggregated (type, day)
rollup, so densification adds zero fact-side shuffles beyond the one
aggregate; posexplode is a per-row generator (narrow, no shuffle); the
CDC diff is a single co-partitioned full-outer sort-merge join on the
snapshot key — the canonical two-snapshot compare, linear in input and
embarrassingly parallel in the key hash space at 100 TB.

Parity notes: revenue uses the exact scaled-integer policy
(functions/parity.py: grid 1e4 for price×(1-discount)); order dates are
emitted as epoch-second BIGINTs, never raw timestamps; spine days are
DATE on both engines; posexplode positions are BIGINT on both sides;
every top-k ORDER BY carries a total-order tie-break.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from etl_intraday_bidask_spark.functions.parity import scaled_long
from etl_intraday_bidask_spark.registry import register
from etl_intraday_bidask_spark.tables import load


@register(
    "q10_returned_items",
    oracle_sql="""
        SELECT
            c_custkey,
            c_name,
            CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000)
                          AS BIGINT)) AS DOUBLE) / 10000.0 AS revenue,
            CAST(round(c_acctbal * 100) AS BIGINT) AS acctbal_cents,
            n_name
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN nation ON c_nationkey = n_nationkey
        WHERE o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1996-04-01'
          AND l_returnflag = 'R'
        GROUP BY c_custkey, c_name, acctbal_cents, n_name
        ORDER BY revenue DESC, c_custkey
        LIMIT 20
    """,
    description="TPC-H Q10-style returned-item reporting: revenue lost "
    "to returns per customer over one quarter, top 20. Quarter filter "
    "pushed to the orders scan, returnflag filter pushed to lineitem, "
    "25-row nation broadcast; the only shuffles are the two fact joins "
    "and the final customer-grain aggregate. Exact-decimal revenue "
    "(grid 1e4), account balance as exact cents, custkey tie-break.",
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    lineitem = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = load(spark, sf_dir, "nation")
    joined = (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
    )
    return (
        joined.groupBy(
            "c_custkey",
            "c_name",
            scaled_long("c_acctbal", 100).alias("acctbal_cents"),
            "n_name",
        )
        .agg(
            (
                F.sum(
                    scaled_long(
                        F.col("l_extendedprice") * (1 - F.col("l_discount")), 10000
                    )
                ).cast("double")
                / 10000.0
            ).alias("revenue")
        )
        .select("c_custkey", "c_name", "revenue", "acctbal_cents", "n_name")
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@register(
    "densify_date_spine",
    oracle_sql="""
        WITH spine AS (
            SELECT CAST(unnest(generate_series(
                       DATE '2024-01-01', DATE '2024-01-30',
                       INTERVAL 1 DAY)) AS DATE) AS day
        ), types AS (
            SELECT DISTINCT event_type FROM events
        ), daily AS (
            SELECT event_type,
                   CAST(ts AS DATE) AS day,
                   count(*) AS n_events,
                   sum(CAST(round(value * 100) AS BIGINT)) AS cents
            FROM events
            GROUP BY event_type, day
        )
        SELECT t.event_type,
               s.day,
               CAST(COALESCE(d.n_events, 0) AS BIGINT) AS n_events,
               CAST(COALESCE(d.cents, 0) AS DOUBLE) / 100.0 AS sum_value
        FROM spine s
        CROSS JOIN types t
        LEFT JOIN daily d ON d.event_type = t.event_type AND d.day = s.day
        ORDER BY t.event_type, s.day
    """,
    description="Calendar-spine densification: every (event_type, day) "
    "cell over the full January 2024 range, zero-filled where no events "
    "occurred — the gap-filling step a downstream time-series model "
    "needs. The 30-day×5-type spine is generated with sequence()+"
    "explode and broadcast onto the pre-aggregated daily rollup, so "
    "the fact table is touched by exactly one aggregate shuffle.",
)
def densify_date_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(scaled_long("value", 100)).alias("cents"),
    )
    spine = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit("2024-01-01").cast("date"),
                F.lit("2024-01-30").cast("date"),
            )
        ).alias("day")
    )
    types = ev.select("event_type").distinct()
    grid = F.broadcast(spine.crossJoin(types))
    return (
        grid.join(daily, ["event_type", "day"], "left")
        .select(
            "event_type",
            "day",
            F.coalesce(F.col("n_events"), F.lit(0)).cast("long").alias("n_events"),
            (F.coalesce(F.col("cents"), F.lit(0)).cast("double") / 100.0).alias(
                "sum_value"
            ),
        )
        .orderBy("event_type", "day")
    )


@register(
    "array_posexplode",
    oracle_sql="""
        SELECT doc_id,
               CAST(unnest(generate_series(1, len(toks))) AS BIGINT) - 1 AS pos,
               unnest(toks) AS tok
        FROM (
            SELECT doc_id, string_split(text, ' ')[1:8] AS toks
            FROM documents
            WHERE lang = 'en'
        )
        ORDER BY doc_id, pos
    """,
    description="Positional explode: the first 8 tokens of every "
    "English document with their 0-based positions (posexplode), the "
    "order-preserving flatten that n-gram and windowed-context "
    "features build on. Narrow per-row generator — no shuffle; the "
    "lang filter is pushed to the parquet scan. Positions BIGINT on "
    "both engines (DuckDB zip-unnest against generate_series).",
)
def array_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").filter(F.col("lang") == "en")
    toks = docs.select(
        "doc_id", F.slice(F.split("text", " "), 1, 8).alias("toks")
    )
    return (
        toks.select("doc_id", F.posexplode("toks").alias("pos", "tok"))
        .select("doc_id", F.col("pos").cast("long").alias("pos"), "tok")
        .orderBy("doc_id", "pos")
    )


@register(
    "cdc_snapshot_diff",
    oracle_sql="""
        WITH old_snap AS (
            SELECT o_orderkey, o_orderstatus
            FROM orders WHERE o_orderkey % 97 <> 0
        ), new_snap AS (
            SELECT o_orderkey,
                   CASE WHEN o_orderkey % 89 = 0 THEN 'X'
                        ELSE o_orderstatus END AS o_orderstatus
            FROM orders WHERE o_orderkey % 101 <> 0
        )
        SELECT
            COALESCE(o.o_orderkey, n.o_orderkey) AS o_orderkey,
            CASE WHEN o.o_orderkey IS NULL THEN 'insert'
                 WHEN n.o_orderkey IS NULL THEN 'delete'
                 ELSE 'update' END AS change_type,
            o.o_orderstatus AS old_status,
            n.o_orderstatus AS new_status
        FROM old_snap o
        FULL OUTER JOIN new_snap n ON o.o_orderkey = n.o_orderkey
        WHERE o.o_orderkey IS NULL
           OR n.o_orderkey IS NULL
           OR o.o_orderstatus <> n.o_orderstatus
        ORDER BY o_orderkey
    """,
    description="CDC snapshot diff: full-outer join of two table "
    "snapshots on the business key, classifying every row as insert / "
    "delete / update and dropping unchanged rows — the change feed a "
    "lake without native CDC derives by comparing consecutive loads. "
    "Snapshots are deterministic modular slices of orders (old drops "
    "key%97=0, new drops key%101=0 and flips status where key%89=0). "
    "One co-partitioned sort-merge full-outer join; linear at scale.",
)
def cdc_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus")
    old_snap = orders.filter(F.col("o_orderkey") % 97 != 0)
    new_snap = orders.filter(F.col("o_orderkey") % 101 != 0).select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 89 == 0, F.lit("X"))
        .otherwise(F.col("o_orderstatus"))
        .alias("o_orderstatus"),
    )
    o = old_snap.alias("o")
    n = new_snap.alias("n")
    joined = o.join(
        n, F.col("o.o_orderkey") == F.col("n.o_orderkey"), "full_outer"
    )
    return (
        joined.filter(
            F.col("o.o_orderkey").isNull()
            | F.col("n.o_orderkey").isNull()
            | (F.col("o.o_orderstatus") != F.col("n.o_orderstatus"))
        )
        .select(
            F.coalesce(F.col("o.o_orderkey"), F.col("n.o_orderkey")).alias(
                "o_orderkey"
            ),
            F.when(F.col("o.o_orderkey").isNull(), F.lit("insert"))
            .when(F.col("n.o_orderkey").isNull(), F.lit("delete"))
            .otherwise(F.lit("update"))
            .alias("change_type"),
            F.col("o.o_orderstatus").alias("old_status"),
            F.col("n.o_orderstatus").alias("new_status"),
        )
        .orderBy("o_orderkey")
    )
