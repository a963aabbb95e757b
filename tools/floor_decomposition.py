"""Decompose the per-query dispatch floor (VERDICT r12 item 2).

The sf0.1 suite wall is dominated by a fixed ~65-115 ms per-action cost
("the floor"), measured as median `spark.range(1).count()` in a warmed
session. This tool splits that floor into its parts so the attack
targets the biggest slice instead of folklore:

  a. py4j round trip        — `spark._jsparkSession.version()`
  b. DataFrame construction — `spark.range(1)` (py4j + logical plan)
  c. analyze+optimize+codegen (no job) — force `executedPlan` on a
     FRESH DataFrame each time
  d. full `count()` on a fresh DataFrame (the bench floor itself)
  e. `count()` on a REUSED DataFrame (skips analysis: d - e ~= c)
  f. task-launch scaling: `spark.range(1)` defaults to
     defaultParallelism (local[32] -> 32) slices, so the bench floor
     includes launching 32+1 tasks; the 1-slice variant isolates
     scheduling-per-task cost
  g. result-path delta: `collect()` vs `toPandas()` on a tiny result

Each leg: median of N (default 31) interleaved samples, warmed first.
One JSON line; run on a probe-healthy window or the numbers grade the
machine-day (tools/host_probe.py first).

Usage: python tools/floor_decomposition.py [--runs N]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def med_ms(fn, runs: int, warm: int = 5) -> float:
    for _ in range(warm):
        fn()
    xs = []
    for _ in range(runs):
        t0 = time.perf_counter()
        fn()
        xs.append(time.perf_counter() - t0)
    return round(statistics.median(xs) * 1000, 2)


def main() -> None:
    runs = 31
    if "--runs" in sys.argv:
        runs = int(sys.argv[sys.argv.index("--runs") + 1])

    from etl_intraday_bidask_spark.session import build_spark

    spark = build_spark(app_name="floor-decomposition", shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.adaptive.enabled", "false")

    out: dict[str, float] = {}
    out["a_py4j_roundtrip_ms"] = med_ms(
        lambda: spark._jsparkSession.version(), runs
    )
    out["b_df_construct_ms"] = med_ms(lambda: spark.range(1), runs)

    def plan_only():
        df = spark.range(1).selectExpr("id + 1 as x")
        df._jdf.queryExecution().executedPlan()

    out["c_plan_fresh_ms"] = med_ms(plan_only, runs)

    out["d_floor_fresh_count_ms"] = med_ms(
        lambda: spark.range(1).count(), runs
    )
    reused = spark.range(1)
    reused.count()
    out["e_floor_reused_count_ms"] = med_ms(lambda: reused.count(), runs)

    out["f_floor_1slice_count_ms"] = med_ms(
        lambda: spark.range(0, 1, 1, 1).count(), runs
    )
    one_slice = spark.range(0, 1, 1, 1)
    one_slice.count()
    out["f_floor_1slice_reused_ms"] = med_ms(lambda: one_slice.count(), runs)

    tiny = spark.range(0, 100, 1, 1).selectExpr("id", "id * 2 as y")
    tiny.collect()
    tiny.toPandas()
    out["g_collect_tiny_ms"] = med_ms(lambda: tiny.collect(), runs)
    out["g_topandas_tiny_ms"] = med_ms(lambda: tiny.toPandas(), runs)

    # Derived attributions (medians don't subtract exactly; indicative).
    out["derived_analysis_ms"] = round(
        out["d_floor_fresh_count_ms"] - out["e_floor_reused_count_ms"], 2
    )
    out["derived_task_width_ms"] = round(
        out["e_floor_reused_count_ms"] - out["f_floor_1slice_reused_ms"], 2
    )
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
