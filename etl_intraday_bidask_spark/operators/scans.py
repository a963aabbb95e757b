"""Scan / source / sink operators (SURVEY.md §2.1).

The engine is schema-on-read over columnar Parquet (the reference's S3
data-lake layout). Filters and projections are expressed declaratively so
Catalyst pushes them into the vectorized Parquet reader — at 100 TB the
difference between scanning 2 columns of pruned row groups and scanning
everything is the whole game.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from etl_intraday_bidask_spark.functions.parity import exact_sum
from etl_intraday_bidask_spark.registry import register
from etl_intraday_bidask_spark.tables import load, scratch_dir


@register(
    "scan_parquet",
    oracle_sql="""
        SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
        FROM lineitem
    """,
    description="Full-table Parquet scan, stable projected subset.",
)
def scan_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")


@register(
    "scan_parquet_pushdown",
    oracle_sql="""
        SELECT o_orderkey, o_totalprice
        FROM orders
        WHERE o_orderstatus = 'F' AND o_totalprice > 100000.0
    """,
    description="Scan with predicate + projection pushed into the Parquet "
    "reader (verify via .explain: PushedFilters / ReadSchema).",
)
def scan_parquet_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    return orders.where(
        (F.col("o_orderstatus") == "F") & (F.col("o_totalprice") > 100000.0)
    ).select("o_orderkey", "o_totalprice")


@register(
    "sink_parquet_partitioned",
    oracle_sql=None,  # sink side-effect — not expressible against shared views.
    description="Write Parquet partitioned by o_orderstatus (hive-style "
    "lake layout), read back, count per partition. Partitioned layout is "
    "what enables static partition pruning at lake scale.",
)
def sink_parquet_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    out = os.path.join(
        scratch_dir("sink_parquet"), "orders_by_status"
    )
    orders.write.mode("overwrite").partitionBy("o_orderstatus").parquet(out)
    back = spark.read.parquet(out)
    return (
        back.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 4).alias("sum_price"),
        )
        .orderBy("o_orderstatus")
    )


@register(
    "source_csv_roundtrip",
    oracle_sql=None,  # round-trips through a temp CSV file — rows-only.
    description="CSV ingest with an explicit schema (raw-file ingest leg "
    "of the reference ETL): write a sample to CSV, read back typed, agg.",
)
def source_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = load(spark, sf_dir, "nation")
    out = os.path.join(scratch_dir("source_csv"), "nation_csv")
    nation.write.mode("overwrite").option("header", "true").csv(out)
    schema = T.StructType(
        [
            T.StructField("n_nationkey", T.IntegerType()),
            T.StructField("n_name", T.StringType()),
            T.StructField("n_regionkey", T.IntegerType()),
        ]
    )
    back = spark.read.schema(schema).option("header", "true").csv(out)
    return (
        back.groupBy("n_regionkey")
        .agg(F.count(F.lit(1)).alias("n_nations"))
        .orderBy("n_regionkey")
    )


@register(
    "scan_partition_pruned",
    oracle_sql="""
        SELECT
            count(*) AS n,
            CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
                / 100.0 AS sum_price
        FROM orders
        WHERE year(o_orderdate) = 1998
    """,
    description="Static partition pruning: orders written to a "
    "hive-partitioned lake by order year, then a year-filtered read-back "
    "aggregates exactly one partition directory — the scan never opens "
    "the other years' files. This is the dominant IO eliminator on a "
    "date-partitioned 100 TB lake; the oracle is the same aggregate "
    "over the unpartitioned source.",
)
def scan_partition_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    out = os.path.join(scratch_dir("part_lake"), "orders_by_year")
    (
        orders.withColumn("o_year", F.year("o_orderdate"))
        .write.mode("overwrite")
        .partitionBy("o_year")
        .parquet(out)
    )
    back = spark.read.parquet(out).where(F.col("o_year") == 1998)
    return back.agg(
        F.count(F.lit(1)).alias("n"),
        exact_sum("o_totalprice", 100).alias("sum_price"),
    )


@register(
    "join_dynamic_partition_pruning",
    oracle_sql="""
        SELECT
            'grpA' AS grp,
            count(*) AS n,
            CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE)
                / 100.0 AS sum_price
        FROM lineitem
        WHERE l_returnflag = 'A'
    """,
    description="Dynamic partition pruning: lineitem written partitioned "
    "by returnflag, joined to a selective one-row dim on the partition "
    "column — Catalyst injects the dim's values as a runtime partition "
    "filter, so the fact scan reads only the matching partition even "
    "though the filter value is not a literal in the query. The "
    "star-join shape every partitioned lake query depends on.",
)
def join_dynamic_partition_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    out = os.path.join(scratch_dir("dpp_lake"), "lineitem_by_flag")
    li.write.mode("overwrite").partitionBy("l_returnflag").parquet(out)
    fact = spark.read.parquet(out)
    # The filter on the dim side is what DPP's planner heuristic keys on
    # ("selective predicate on the build side"): it makes Catalyst inject
    # the dim's flag values as a runtime PartitionFilter on the fact scan.
    dim = spark.createDataFrame(
        [("A", "grpA"), ("N", "grpN"), ("R", "grpR")], ["flag", "grp"]
    ).where(F.col("grp") == "grpA")
    return (
        fact.join(dim, fact.l_returnflag == dim.flag)
        .groupBy("grp")
        .agg(
            F.count(F.lit(1)).alias("n"),
            exact_sum("l_extendedprice", 100).alias("sum_price"),
        )
    )


def _interleave_sql(x: str, y: str, bits: int = 16) -> str:
    """SQL expression interleaving the low ``bits`` of x (even positions)
    and y (odd positions) into a Morton/Z-order value. Pure integer
    arithmetic (shift/mask/multiply) — identical in Spark SQL and DuckDB."""
    terms = []
    for i in range(bits):
        terms.append(f"((({x} >> {i}) & 1) * {1 << (2 * i)})")
        terms.append(f"((({y} >> {i}) & 1) * {1 << (2 * i + 1)})")
    return " + ".join(terms)


@register(
    "sort_zorder_layout",
    oracle_sql=f"""
        WITH keyed AS (
            SELECT o_orderkey,
                   o_custkey % 65536 AS xk,
                   CAST(floor((epoch(o_orderdate)
                               - epoch(TIMESTAMP '1995-01-01 00:00:00'))
                              / 86400) AS BIGINT) % 65536 AS yk
            FROM orders
        )
        SELECT o_orderkey,
               xk, yk,
               CAST({_interleave_sql('xk', 'yk')} AS BIGINT) AS zval
        FROM keyed
        ORDER BY zval, o_orderkey
        LIMIT 200
    """,
    description="Z-order (Morton) layout key over (custkey, order-day): "
    "bit-interleaving both dimensions into one sort key so that sorting "
    "by it co-locates rows that are close in EITHER dimension — the "
    "multi-dimensional clustering that makes parquet row-group min/max "
    "pruning effective for queries filtering on either column (the "
    "OPTIMIZE ZORDER pattern of lakehouse table formats, expressed as "
    "pure integer arithmetic any engine can evaluate). The sort is the "
    "normal distributed range-partitioned sort; emitting the top-200 "
    "curve prefix keeps the graded result bounded.",
)
def sort_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    base_epoch = "epoch(TIMESTAMP '1995-01-01 00:00:00')"
    keyed = orders.select(
        "o_orderkey",
        (F.col("o_custkey") % 65536).alias("xk"),
        (
            F.floor(
                (
                    F.unix_timestamp("o_orderdate")
                    - F.unix_timestamp(F.lit("1995-01-01").cast("timestamp"))
                )
                / 86400
            ).cast("long")
            % 65536
        ).alias("yk"),
    )
    return (
        keyed.select(
            "o_orderkey",
            "xk",
            "yk",
            F.expr(_interleave_sql("xk", "yk")).cast("long").alias("zval"),
        )
        .orderBy("zval", "o_orderkey")
        .limit(200)
    )


@register(
    "source_python_datasource",
    oracle_sql="""
        WITH ticks AS (
            SELECT i AS tick_id,
                   (i * 1103515245 + 12345) % 2147483648 % 10000 AS px_cents,
                   CASE WHEN i % 2 = 0 THEN 'bid' ELSE 'ask' END AS side
            FROM generate_series(0, 9999) AS t(i)
        )
        SELECT side,
               count(*) AS n,
               CAST(sum(px_cents) AS BIGINT) AS sum_px_cents,
               min(px_cents) AS min_px,
               max(px_cents) AS max_px
        FROM ticks
        GROUP BY side
        ORDER BY side
    """,
    description="Custom Python Data Source (Spark 4 pyspark.sql."
    "datasource API): a partitioned synthetic tick feed — the driver "
    "plans one InputPartition per shard and each task generates only "
    "its shard, the same parallel-read contract a real connector "
    "(internal feed, REST pagination, bespoke binary format) "
    "implements. Every value is a pure LCG function of the row index "
    "(sources/tick_source.py), so the DuckDB oracle reproduces the "
    "stream arithmetically from generate_series — a custom SOURCE that "
    "is still hash-gradable.",
)
def source_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_intraday_bidask_spark.sources.tick_source import TickDataSource

    # Idempotent per session: re-registering the same name is allowed
    # and cheap; the driver's grading session registers it on first use.
    spark.dataSource.register(TickDataSource)
    ticks = spark.read.format("synthetic_ticks").load()
    return (
        ticks.groupBy("side")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("px_cents").alias("sum_px_cents"),
            F.min("px_cents").alias("min_px"),
            F.max("px_cents").alias("max_px"),
        )
        .orderBy("side")
    )


@register(
    "source_python_stream_datasource",
    oracle_sql="""
        WITH ticks AS (
            SELECT i AS tick_id,
                   (i * 1103515245 + 12345) % 2147483648 % 10000 AS px_cents,
                   CASE WHEN i % 2 = 0 THEN 'bid' ELSE 'ask' END AS side
            FROM generate_series(0, 9999) AS t(i)
        )
        SELECT side,
               count(*) AS n,
               CAST(sum(px_cents) AS BIGINT) AS sum_px_cents,
               min(px_cents) AS min_px,
               max(px_cents) AS max_px
        FROM ticks
        GROUP BY side
        ORDER BY side
    """,
    description="STREAMING custom Python Data Source (Spark 4 "
    "DataSourceStreamReader): the same deterministic tick feed read "
    "through readStream — offsets are global row indices, each "
    "micro-batch range splits into executor partitions, and the "
    "finite latestOffset makes the availableNow replay consume "
    "exactly the batch reader's row set, so the streaming ingest is "
    "hash-graded against the identical generate_series oracle. This "
    "is the connector contract for streaming systems Spark has no "
    "built-in source for (internal feeds, queues, REST cursors); at "
    "scale reader parallelism = the per-batch partition count and "
    "offset commits give exactly-once replay.",
)
def source_python_stream_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_intraday_bidask_spark.sources.tick_source import TickDataSource
    from etl_intraday_bidask_spark.streaming.replay import _run_to_memory

    spark.dataSource.register(TickDataSource)
    ticks = spark.readStream.format("synthetic_ticks").load()
    agg = (
        ticks.groupBy("side")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("px_cents").alias("sum_px_cents"),
            F.min("px_cents").alias("min_px"),
            F.max("px_cents").alias("max_px"),
        )
    )
    return _run_to_memory(agg, "complete").orderBy("side")


@register(
    "scan_schema_evolution",
    oracle_sql="""
        WITH unified AS (
            SELECT o_orderkey, o_totalprice, NULL AS o_orderpriority
            FROM orders WHERE o_orderstatus = 'O'
            UNION ALL
            SELECT o_orderkey, o_totalprice, o_orderpriority
            FROM orders WHERE o_orderstatus = 'F'
        )
        SELECT coalesce(o_orderpriority, 'LEGACY') AS pri,
               count(*) AS n,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
                   / 100.0 AS total
        FROM unified
        GROUP BY pri
        ORDER BY pri
    """,
    description="Schema evolution on read: two parquet drops written "
    "with different schemas (a legacy writer without o_orderpriority, "
    "a current writer with it) unified by mergeSchema=true — missing "
    "columns surface as NULLs, the additive-column evolution every "
    "long-lived lake accumulates. mergeSchema costs a footer read per "
    "file (not a data scan), which is why production lakes pin the "
    "merged schema in a catalog instead of re-merging per query; the "
    "NULL-vs-'LEGACY' coalesce is the standard back-compat projection.",
)
def scan_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    lake = scratch_dir("schema_evo")
    # Legacy writer: no priority column yet.
    (
        orders.where(F.col("o_orderstatus") == "O")
        .select("o_orderkey", "o_totalprice")
        .write.mode("overwrite")
        .parquet(f"{lake}/drop=legacy")
    )
    # Current writer: priority added.
    (
        orders.where(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_totalprice", "o_orderpriority")
        .write.mode("overwrite")
        .parquet(f"{lake}/drop=current")
    )
    unified = spark.read.option("mergeSchema", "true").parquet(
        f"{lake}/drop=legacy", f"{lake}/drop=current"
    )
    return (
        unified.groupBy(
            F.coalesce("o_orderpriority", F.lit("LEGACY")).alias("pri")
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            exact_sum("o_totalprice", 100).alias("total"),
        )
        .orderBy("pri")
    )
