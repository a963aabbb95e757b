"""Dispatch-floor decomposition study (round 8).

Measures WHERE the per-query fixed cost at fixture scale actually
goes, on a bench-shaped session:

1. py4j round-trip latency (one JVM static call),
2. query-body CONSTRUCTION cost — a representative ~30-call
   pyspark Column chain vs the same logical plan as one spark.sql()
   text (the round-8 headline-rewrite rationale),
3. fresh-plan trivial dispatch (spark.range(1).count() — the bench's
   floor probe),
4. prebuilt-plan re-execution (UNDERSTATES true exec: shuffle stages
   are silently reused across actions on the same lineage — see the
   BASELINE.md warning; reported here only to bound scheduling cost).

Usage:  python tools/dispatch_study.py [--sf SF_DIR]
Output: one JSON line with medians in ms.

Finding this tool pins (BASELINE.md round-8 addendum): each Column /
functions call costs ~1 ms of py4j latency, so multi-call query
bodies pay 50-180 ms of pure driver-side construction per invocation
— more than the 2-stage job execution itself at sf0.1 — and a single
spark.sql() text eliminates all but one round trip while producing
the identical logical plan.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def med_ms(f, n=21):
    f()
    f()
    samples = []
    for _ in range(n):
        t0 = time.perf_counter()
        f()
        samples.append((time.perf_counter() - t0) * 1000)
    return round(statistics.median(samples), 2)


def main() -> None:
    sf_dir = "/root/testdata/sf0.1"
    if "--sf" in sys.argv:
        sf_dir = sys.argv[sys.argv.index("--sf") + 1]

    import pyspark.sql.functions as F

    from etl_intraday_bidask_spark.session import build_spark
    from etl_intraday_bidask_spark.tables import load, view

    spark = build_spark(app_name="dispatch-study", shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")
    jvm = spark._jvm

    orders = load(spark, sf_dir, "orders")
    orders_v = view(spark, sf_dir, "orders")

    def chain_body():
        # ~30 Column/functions calls — a deliberately typical body.
        return (
            orders.where(F.col("o_totalprice") > 0)
            .groupBy("o_orderpriority", "o_orderstatus")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(
                    F.floor(F.col("o_totalprice") * 100.0 + 0.5).cast(
                        "long"
                    )
                ).alias("cents"),
                F.min("o_orderdate").alias("first_d"),
                F.max("o_orderdate").alias("last_d"),
            )
            .select(
                F.coalesce("o_orderpriority", F.lit("ALL")).alias("pri"),
                F.coalesce("o_orderstatus", F.lit("ALL")).alias("st"),
                "n",
                "cents",
                "first_d",
                "last_d",
            )
        )

    SQL = f"""
        SELECT coalesce(o_orderpriority, 'ALL') AS pri,
               coalesce(o_orderstatus, 'ALL') AS st,
               COUNT(1) AS n,
               SUM(FLOOR(o_totalprice * 100.0D + 0.5D)) AS cents,
               MIN(o_orderdate) AS first_d, MAX(o_orderdate) AS last_d
        FROM {orders_v}
        WHERE o_totalprice > 0
        GROUP BY o_orderpriority, o_orderstatus
    """

    def sql_body():
        return spark.sql(SQL)

    chain_body().toPandas()
    sql_body().toPandas()
    prebuilt = sql_body()
    prebuilt.toPandas()

    # Round-9 deeper terms: split the floor into its THREE components.
    # (a) Catalyst planning of a trivial fresh plan (analyze + optimize
    #     + physical + codegen-cache lookup, no execution);
    # (b) pure result-channel cost — collect() on a prebuilt
    #     LocalRelation plan runs NO job and NO planning, so its wall
    #     is the collectToPython socket handshake + deserialization;
    # (c) job execution on a prebuilt plan (the 27 ms round-8 number).
    # Finding (round 9, idle): (a) ~26-30 ms, (b) ~30-37 ms, (c) ~27 ms
    # — the floor is planning + scheduling + result channel in roughly
    # equal parts, and none is a py4j chatter problem (0.5 ms/trip).
    # The .count() path skips (b) (scalar via py4j), which is why the
    # bench floor probe reads ~60-75 ms, not ~95.
    def plan_only():
        d = spark.range(1).agg(F.count("*"))
        d._jdf.queryExecution().executedPlan()

    select1 = spark.sql("SELECT 1")
    select1.collect()

    result = {
        "metric": "dispatch_decomposition",
        "sf_dir": sf_dir,
        "py4j_roundtrip_ms": med_ms(
            lambda: jvm.System.currentTimeMillis()
        ),
        "construct_chain_ms": med_ms(chain_body),
        "construct_sql_text_ms": med_ms(sql_body),
        "plan_trivial_agg_ms": med_ms(plan_only),
        "collect_channel_localrelation_ms": med_ms(
            lambda: select1.collect()
        ),
        "floor_probe_range_count_ms": med_ms(
            lambda: spark.range(1).count()
        ),
        "prebuilt_reexec_ms_UNDERSTATES": med_ms(
            lambda: prebuilt.toPandas()
        ),
        "full_chain_toPandas_ms": med_ms(
            lambda: chain_body().toPandas()
        ),
        "full_sql_toPandas_ms": med_ms(lambda: sql_body().toPandas()),
    }
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
