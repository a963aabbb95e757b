"""Skew-join study: what actually happens to a hot key at scale.

VERDICT r6 filed "AQE skew splits under real skew" as unobservable in
local[32]. It isn't: AQE's OptimizeSkewedJoin rewrites a skewed
sort-merge join in local mode exactly as on a cluster — the only
cluster-specific part is the default trigger thresholds (256 MB),
which at demo scale we lower proportionally, the same way bench.py
scales maxPartitionBytes. This study measures the three answers to a
hot key on one synthetic workload and records them in BASELINE.md:

  fact (5M rows, 30 % of them on ONE key, rest uniform over 100k keys)
  ⋈ dim (100k rows, unique key) with broadcast DISABLED — emulating
  the 100 TB case where the build side does not fit in memory and the
  join must shuffle on the skewed key.

  a) plain sort-merge, AQE off      — the straggler baseline: one
     partition carries 30 % of the fact, wall == hot-task time.
  b) sort-merge, AQE skew-join on   — runtime splits the hot
     partition into N advisory-sized pieces, each joined against a
     copy of the matching dim rows (plan shows `skew=true`).
  c) manual salting (the join_skew_salted operator's technique) —
     fact key gets a deterministic salt in [0, S); the dim explodes
     ×S; the shuffle key becomes (key, salt), statically uniform.

All three produce identical aggregates (asserted). AQE needs no prior
knowledge of WHICH key is hot and leaves non-skewed queries untouched
— that is why the engine keeps it on by default in session.py and the
salted operator exists for the one case AQE cannot fix: skew in a
GROUP BY's own key, where correctness forces two-phase re-aggregation.

Usage: python tools/skew_study.py   (one JSON line on stdout).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

N_FACT = int(os.environ.get("SPARK_GRAFT_SKEW_FACT", str(5_000_000)))
N_KEYS = int(os.environ.get("SPARK_GRAFT_SKEW_KEYS", str(100_000)))
HOT_SHARE = 0.30
SALT = 16
RUNS = int(os.environ.get("SPARK_GRAFT_SKEW_RUNS", "3"))


def generate(d: str) -> None:
    """Skewed fact + unique-key dim, splittable row groups."""
    con = duckdb.connect()
    n_hot = int(N_FACT * HOT_SHARE)
    con.execute(
        f"""
        COPY (
            SELECT CASE WHEN i < {n_hot} THEN 1
                        ELSE 1 + (hash(i) % {N_KEYS}) END AS k,
                   CAST(i AS BIGINT) AS row_id,
                   CAST(hash(i * 7) % 10000 AS BIGINT) AS amount_cents
            FROM (SELECT unnest(range({N_FACT})) AS i)
        ) TO '{d}/fact.parquet' (FORMAT PARQUET, ROW_GROUP_SIZE 100000)
        """
    )
    con.execute(
        f"""
        COPY (
            SELECT CAST(1 + i AS BIGINT) AS k,
                   CAST(hash(i * 13) % 100 AS BIGINT) AS weight
            FROM (SELECT unnest(range({N_KEYS})) AS i)
        ) TO '{d}/dim.parquet' (FORMAT PARQUET, ROW_GROUP_SIZE 100000)
        """
    )
    con.close()


def main() -> None:
    from pyspark.sql import functions as F

    from etl_intraday_bidask_spark.session import build_spark

    tmp = tempfile.mkdtemp(prefix="skew_study_")
    generate(tmp)

    spark = build_spark(app_name="skew-study", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    # Emulate a build side too big to broadcast (the case skew matters).
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    # Scale AQE's cluster-default trigger (256 MB) to the demo data
    # exactly as bench.py scales maxPartitionBytes: the hot partition
    # here is ~24 MB where at 100 TB it would be hundreds of GB.
    spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "4m"
    )
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "2m")

    fact = spark.read.parquet(f"{tmp}/fact.parquet")
    dim = spark.read.parquet(f"{tmp}/dim.parquet")

    def plain():
        return (
            fact.join(dim, "k")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.col("amount_cents") * F.col("weight")).alias("v"),
            )
        )

    def salted():
        f = fact.withColumn("salt", F.pmod(F.hash("row_id"), F.lit(SALT)))
        d = dim.withColumn(
            "salt", F.explode(F.sequence(F.lit(0), F.lit(SALT - 1)))
        )
        return (
            f.join(d, ["k", "salt"])
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.col("amount_cents") * F.col("weight")).alias("v"),
            )
        )

    def run(df_fn, aqe: bool) -> tuple[float, tuple]:
        spark.conf.set("spark.sql.adaptive.enabled", str(aqe).lower())
        rows = df_fn().collect()  # warm (JIT, page cache)
        samples = []
        for _ in range(RUNS):
            t0 = time.perf_counter()
            rows = df_fn().collect()
            samples.append(time.perf_counter() - t0)
        return statistics.median(samples), tuple(rows[0])

    wall_a, res_a = run(plain, aqe=False)
    wall_b, res_b = run(plain, aqe=True)
    wall_c, res_c = run(salted, aqe=False)

    assert res_a == res_b == res_c, (res_a, res_b, res_c)

    # Prove AQE actually split the hot partition: the final plan of an
    # executed query carries skew=true markers on the SMJ.
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    df = plain()
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    skew_applied = "skew=true" in plan

    # ---- GROUP-BY key skew: the other half of the story. ----------
    # Algebraic aggregates (sum/count/avg/min/max) are IMMUNE to group
    # -key skew by construction: the map-side partial HashAggregate
    # combines the hot key down to one row per task BEFORE the
    # shuffle, so the hot reducer receives n_tasks rows like everyone
    # else. Holistic aggregates (collect_list, exact percentile) have
    # no partial reduction — every hot-key row crosses the shuffle and
    # lands on ONE reducer. AQE cannot split a skewed AGG partition
    # (splitting would break grouping correctness), so salted
    # two-phase re-aggregation is the only distributed fix: phase 1
    # aggregates (k, salt), phase 2 merges the S partials per key.

    def agg_algebraic():
        return fact.groupBy("k").agg(F.sum("amount_cents").alias("v"))

    def agg_holistic():
        return (
            fact.groupBy("k")
            .agg(F.size(F.collect_list("amount_cents")).alias("n"))
        )

    def agg_holistic_salted():
        f = fact.withColumn("salt", F.pmod(F.hash("row_id"), F.lit(SALT)))
        return (
            f.groupBy("k", "salt")
            .agg(F.collect_list("amount_cents").alias("part"))
            .groupBy("k")
            .agg(F.sum(F.size("part")).cast("int").alias("n"))
        )

    def run_agg(df_fn) -> tuple[float, int]:
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        df_fn().count()  # warm
        samples = []
        for _ in range(RUNS):
            t0 = time.perf_counter()
            n = df_fn().count()
            samples.append(time.perf_counter() - t0)
        return statistics.median(samples), n

    wall_alg, n_alg = run_agg(agg_algebraic)
    wall_hol, n_hol = run_agg(agg_holistic)
    wall_hs, n_hs = run_agg(agg_holistic_salted)
    assert n_alg == n_hol == n_hs, (n_alg, n_hol, n_hs)

    # Local walls at 5M rows sit near the floor for all three (a 1.5M
    # -row collect_list takes tens of ms), so the wall is NOT the
    # scale signal here. The scale signal is reducer INPUT asymmetry:
    # F.hash is the same Murmur3 Spark's HashPartitioning applies, so
    # pmod(hash(keys), P) reproduces the exact shuffle placement, and
    # the max/median input-rows ratio is what turns into an OOM at
    # 100 TB (30 % of the fact into ONE reducer) for any aggregate
    # with no partial reduction. Salting is the structural fix: the
    # (k, salt) key flattens the distribution back to ~1.
    P = 32

    def dist(df, *cols) -> tuple[int, int]:
        rows = (
            df.groupBy(F.pmod(F.hash(*cols), F.lit(P)).alias("p"))
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        )
        ns = sorted(r["n"] for r in rows)
        return ns[-1], ns[len(ns) // 2]

    f_salt = fact.withColumn(
        "salt", F.pmod(F.hash("row_id"), F.lit(SALT))
    )
    mx_p, md_p = dist(fact, "k")
    mx_s, md_s = dist(f_salt, "k", "salt")

    out = {
        "metric": "skew_join_study",
        "n_fact": N_FACT,
        "hot_share": HOT_SHARE,
        "wall_plain_smj_sec": round(wall_a, 3),
        "wall_aqe_skewjoin_sec": round(wall_b, 3),
        "wall_salted_sec": round(wall_c, 3),
        "aqe_skew_split_applied": skew_applied,
        "wall_agg_algebraic_sec": round(wall_alg, 3),
        "wall_agg_holistic_sec": round(wall_hol, 3),
        "wall_agg_holistic_salted_sec": round(wall_hs, 3),
        "reducer_rows_plain_max_over_median": round(mx_p / md_p, 1),
        "reducer_rows_salted_max_over_median": round(mx_s / md_s, 1),
        "results_identical": True,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
