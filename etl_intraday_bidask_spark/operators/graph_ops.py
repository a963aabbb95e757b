"""Graph-iteration operator (SURVEY.md §2.25): PageRank-style
fixed-point iteration in exact integer arithmetic.

The graph is the deterministic binary-tree relation over the customer
key space (child v → parent v//2, parents below 1 dropped), so every
node has out-degree 1 and in-degree ≤ 2 — enough structure for rank
mass to concentrate over iterations. Ranks are fixed-point integers
(1.0 ≡ 1,000,000) and the damping step 0.85·x is computed as
(17·x) div 20 — pure BIGINT arithmetic, bit-identical on any engine
and any partitioning, which is what makes an ITERATIVE NUMERIC
operator hash-gradable at all (IEEE summation order never enters).

Scale notes: each iteration is one groupBy(parent) shuffle + one
left join back to the node set — the standard Pregel-as-DataFrame
step. Iterations are unrolled (3 here); at 100 TB each round is an
hash-partitioned exchange on the vertex key, the join side reuses the
same partitioning, and lineage growth is bounded by checkpointing
every k rounds (the dedup_connected_components op in this repo
demonstrates localCheckpoint truncation for open-ended iteration).
Dangling mass is dropped (unnormalized PageRank variant) — documented
semantics, identical on both sides.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from etl_intraday_bidask_spark.registry import register
from etl_intraday_bidask_spark.tables import load


@register(
    "graph_pagerank_fixedpoint",
    oracle_sql="""
        WITH n AS (SELECT c_custkey AS v FROM customer),
        r0 AS (SELECT v, CAST(1000000 AS BIGINT) AS r FROM n),
        c1 AS (SELECT v // 2 AS p, sum(r) AS s FROM r0
               WHERE v // 2 >= 1 GROUP BY 1),
        r1 AS (SELECT n.v,
                      CAST(150000 + (17 * COALESCE(c1.s, 0)) // 20
                           AS BIGINT) AS r
               FROM n LEFT JOIN c1 ON n.v = c1.p),
        c2 AS (SELECT v // 2 AS p, sum(r) AS s FROM r1
               WHERE v // 2 >= 1 GROUP BY 1),
        r2 AS (SELECT n.v,
                      CAST(150000 + (17 * COALESCE(c2.s, 0)) // 20
                           AS BIGINT) AS r
               FROM n LEFT JOIN c2 ON n.v = c2.p),
        c3 AS (SELECT v // 2 AS p, sum(r) AS s FROM r2
               WHERE v // 2 >= 1 GROUP BY 1),
        r3 AS (SELECT n.v,
                      CAST(150000 + (17 * COALESCE(c3.s, 0)) // 20
                           AS BIGINT) AS r
               FROM n LEFT JOIN c3 ON n.v = c3.p)
        SELECT v AS custkey, r AS rank_fp
        FROM r3
        ORDER BY rank_fp DESC, custkey
        LIMIT 20
    """,
    description="PageRank-style fixed-point iteration (3 unrolled "
    "rounds, damping 0.85 as exact (17·x) div 20, ranks scaled 1e6) "
    "over the deterministic binary-tree graph v → v//2 on customer "
    "keys — the Pregel-as-DataFrame pattern: per round one "
    "groupBy(parent) shuffle plus a left join back onto the vertex "
    "set. All arithmetic is BIGINT, so the iterative numeric result "
    "is bit-identical across engines and partitionings. Top-20 ranks "
    "with total-order tie-break.",
)
def graph_pagerank_fixedpoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    nodes = load(spark, sf_dir, "customer").select(
        F.col("c_custkey").cast("long").alias("v")
    )
    ranks = nodes.select("v", F.lit(1000000).cast("long").alias("r"))
    for _ in range(3):
        contrib = (
            ranks.select(F.expr("v div 2").alias("p"), "r")
            .filter(F.col("p") >= 1)
            .groupBy("p")
            .agg(F.sum("r").alias("s"))
        )
        ranks = nodes.join(contrib, nodes.v == contrib.p, "left").select(
            "v",
            (
                F.lit(150000).cast("long")
                + F.expr("17 * coalesce(s, 0) div 20")
            ).alias("r"),
        )
    return (
        ranks.select(F.col("v").alias("custkey"), F.col("r").alias("rank_fp"))
        .orderBy(F.col("rank_fp").desc(), "custkey")
        .limit(20)
    )
