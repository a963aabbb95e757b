"""Sixth wave of extended relational operators (SURVEY.md §2.27):
the four remaining TPC-H query shapes — min-cost supplier (Q2),
important stock share (Q11), supplier/part-type counting with NOT IN
(Q16), promotion-part suppliers with nested quantity thresholds (Q20)
— adapted to the fixture schemas (no partsupp table: the part–supplier
relation and its supply cost/stock are derived from lineitem, keeping
each query's distinctive decorrelation shape), plus five analytic
patterns: exact skewness/kurtosis from integer power sums, ANY/ALL
subquery decorrelation, dynamic-value pivot, bucketed interval-overlap
self-join, and bitmap-based mergeable distinct rollup.

Scale notes: Q2's correlated min-cost subquery decorrelates into a
window-min over the (part, supplier) aggregate — one partkey exchange
over POST-aggregate rows, never a per-part re-scan; Q11 compares each
part's value against the global total as an exact integer inequality
with the 1-row total broadcast; Q16's NOT IN is a broadcast anti-join
(null-safe by construction: s_suppkey is non-null); Q20's nested IN
collapses to one (part,supplier) aggregate + two semi joins. The
skew/kurtosis power sums ride ONE map-side-combined aggregate; the
pivot is a two-job plan (tiny distinct-values discovery, then one
grouped agg); the interval overlap joins on (custkey, month-bucket)
equality — a 30-day interval covers ≤2 month buckets, so the join
fan-out is bounded and no range-theta join ever runs; the bitmap
rollup's per-(day,bucket) masks re-OR into month masks — the additive
sketch-free distinct pattern (user-id space is bucketed 32/bucket, so
state is |days|×|users|/32 longs regardless of event volume).

Parity notes: money stays on the cent/1e-4 grid as BIGINTs; quantity
is integer-exact, so every threshold (Q20's 2·q1997 > qtotal, Q11's
1000·val > total) is an integer comparison immune to float boundaries;
skew/kurtosis are float chains written with the IDENTICAL expression
tree over exact integer sums on both engines, rounded at 4dp;
bitmasks are BIGINT ORs of 1<<(uid%32) — exact on both engines.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from etl_intraday_bidask_spark.functions.parity import scaled_long
from etl_intraday_bidask_spark.registry import register
from etl_intraday_bidask_spark.tables import load


@register(
    "q2_min_cost_supplier",
    oracle_sql="""
        WITH ps AS (
            SELECT l_partkey, l_suppkey,
                   min(CAST(round(l_extendedprice * 100) AS BIGINT)) AS cost_c
            FROM lineitem
            GROUP BY 1, 2
        ),
        eu AS (
            SELECT s_suppkey, s_name, s_acctbal, n_name
            FROM supplier
            JOIN nation ON s_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            WHERE r_name = 'EUROPE'
        ),
        cand AS (
            SELECT p.p_partkey, e.s_name, e.s_acctbal, e.n_name, ps.cost_c,
                   min(ps.cost_c) OVER (PARTITION BY p.p_partkey) AS min_c
            FROM ps
            JOIN eu e ON ps.l_suppkey = e.s_suppkey
            JOIN part p ON ps.l_partkey = p.p_partkey
            WHERE p.p_type = 'ECONOMY' AND p.p_size BETWEEN 10 AND 20
        )
        SELECT s_acctbal, s_name, n_name, p_partkey,
               CAST(cost_c AS DOUBLE) / 100.0 AS supply_cost
        FROM cand
        WHERE cost_c = min_c
        ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
        LIMIT 100
    """,
    description="TPC-H Q2-style minimum-cost supplier: for each ECONOMY "
    "part in the 10–20 size band, the EUROPE supplier(s) achieving the "
    "minimum supply cost (no partsupp fixture: cost = min lineitem "
    "extended price per (part, supplier), exact cents). The correlated "
    "min subquery decorrelates into a window-min over the (part, "
    "supplier) aggregate — POST-aggregate rows, one partkey exchange, "
    "no per-part re-scan; supplier/nation/region resolve broadcast. "
    "Top-100 by account balance with a total-order tie-break, the Q2 "
    "output shape.",
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    ps = (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min(scaled_long("l_extendedprice", 100)).alias("cost_c"))
    )
    eu = (
        load(spark, sf_dir, "supplier")
        .join(
            F.broadcast(load(spark, sf_dir, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(load(spark, sf_dir, "region")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .where(F.col("r_name") == "EUROPE")
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    parts = (
        load(spark, sf_dir, "part")
        .where((F.col("p_type") == "ECONOMY") & F.col("p_size").between(10, 20))
        .select("p_partkey")
    )
    w = Window.partitionBy("p_partkey")
    return (
        ps.join(F.broadcast(eu), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey"))
        .withColumn("min_c", F.min("cost_c").over(w))
        .where(F.col("cost_c") == F.col("min_c"))
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            (F.col("cost_c").cast("double") / 100.0).alias("supply_cost"),
        )
        .orderBy(
            F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey"
        )
        .limit(100)
    )


@register(
    "q11_important_stock",
    oracle_sql="""
        WITH val AS (
            SELECT l_partkey,
                   sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000)
                            AS BIGINT)) AS val_e4
            FROM lineitem
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation ON s_nationkey = n_nationkey
            WHERE n_name = 'NATION_3'
            GROUP BY 1
        ),
        tot AS (SELECT sum(val_e4) AS total_e4 FROM val)
        SELECT l_partkey AS p_partkey,
               CAST(val_e4 AS DOUBLE) / 10000.0 AS part_value
        FROM val, tot
        WHERE val_e4 * 1000 > total_e4
        ORDER BY part_value DESC, p_partkey
    """,
    description="TPC-H Q11-style important stock: parts whose NATION_3-"
    "supplied value exceeds 0.1% of that nation's total (no partsupp "
    "fixture: value = discounted lineitem revenue via the supplier's "
    "nation). The group-vs-global-scalar shape: per-part exact 1e-4-"
    "grid BIGINT sums, the 1-row grand total broadcast, and the share "
    "threshold evaluated as the integer inequality 1000·val > total — "
    "no float division at the cut.",
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    supp = (
        load(spark, sf_dir, "supplier")
        .join(
            F.broadcast(load(spark, sf_dir, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .where(F.col("n_name") == "NATION_3")
        .select("s_suppkey")
    )
    val = (
        load(spark, sf_dir, "lineitem")
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(
            F.sum(
                scaled_long(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")), 10000
                )
            ).alias("val_e4")
        )
    )
    tot = val.agg(F.sum("val_e4").alias("total_e4"))
    return (
        val.crossJoin(F.broadcast(tot))
        .where(F.col("val_e4") * 1000 > F.col("total_e4"))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            (F.col("val_e4").cast("double") / 10000.0).alias("part_value"),
        )
        .orderBy(F.col("part_value").desc(), "p_partkey")
    )


@register(
    "q16_supplier_part_types",
    oracle_sql="""
        SELECT p_brand, p_type, p_size,
               CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
        FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
        JOIN part ON l_partkey = p_partkey
        WHERE p_brand <> 'Brand#1'
          AND p_type <> 'ECONOMY'
          AND p_size IN (1, 4, 9, 16, 25, 36, 49)
          AND l_suppkey NOT IN (
              SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
          )
        GROUP BY 1, 2, 3
        ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
    description="TPC-H Q16-style supplier counting per part attribute: "
    "how many distinct suppliers offer each (brand, type, size) combo "
    "outside Brand#1/ECONOMY in seven target sizes, excluding negative-"
    "balance suppliers (the complaint-supplier NOT IN, a stand-in for "
    "Q16's comment scan). The NOT IN executes as a broadcast anti-join "
    "on the 100-row supplier dim (null-safe by construction — suppkey "
    "is never null); the part dim broadcasts with both filters pushed; "
    "the distinct (part, supplier) pairs are the partsupp surrogate and "
    "shuffle once on partkey.",
)
def q16_supplier_part_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = (
        load(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    parts = (
        load(spark, sf_dir, "part")
        .where(
            (F.col("p_brand") != "Brand#1")
            & (F.col("p_type") != "ECONOMY")
            & F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49)
        )
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    bad = (
        load(spark, sf_dir, "supplier")
        .where(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        pairs.join(F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey"))
        .join(
            F.broadcast(bad),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").cast("long").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


@register(
    "q20_promotion_part_suppliers",
    oracle_sql="""
        WITH sq AS (
            SELECT l_partkey, l_suppkey,
                   CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT)
                       AS qty_total,
                   CAST(sum(CASE WHEN year(l_shipdate) = 1997
                                 THEN CAST(round(l_quantity) AS BIGINT)
                                 ELSE 0 END) AS BIGINT) AS qty_1997
            FROM lineitem
            GROUP BY 1, 2
        ),
        qual AS (
            SELECT DISTINCT l_suppkey
            FROM sq
            JOIN part ON l_partkey = p_partkey
            WHERE p_name LIKE 'small %'
              AND qty_1997 > 0
              AND 2 * qty_1997 > qty_total
        )
        SELECT s_name, n_name
        FROM supplier
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'EUROPE'
          AND s_suppkey IN (SELECT l_suppkey FROM qual)
        ORDER BY s_name
    """,
    description="TPC-H Q20-style promotion-part suppliers: EUROPE "
    "suppliers who concentrated a 'small'-named part's shipments in "
    "1997 (no partsupp: Q20's availqty > half-year-demand becomes "
    "2·qty_1997 > qty_total per (part, supplier) — integer quantities, "
    "so the threshold is an exact integer inequality). The nested "
    "IN-subquery chain collapses into ONE (part,supplier) aggregate "
    "with a conditional sum, a broadcast part filter, and a semi join "
    "into the supplier dim — no correlated re-scan anywhere.",
)
def q20_promotion_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    sq = (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            F.sum(scaled_long("l_quantity", 1)).alias("qty_total"),
            F.sum(
                F.when(
                    F.year("l_shipdate") == 1997, scaled_long("l_quantity", 1)
                ).otherwise(F.lit(0))
            ).alias("qty_1997"),
        )
    )
    small = (
        load(spark, sf_dir, "part")
        .where(F.col("p_name").like("small %"))
        .select("p_partkey")
    )
    qual = (
        sq.join(F.broadcast(small), F.col("l_partkey") == F.col("p_partkey"))
        .where(
            (F.col("qty_1997") > 0)
            & (2 * F.col("qty_1997") > F.col("qty_total"))
        )
        .select("l_suppkey")
        .distinct()
    )
    return (
        load(spark, sf_dir, "supplier")
        .join(
            F.broadcast(load(spark, sf_dir, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(load(spark, sf_dir, "region")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .where(F.col("r_name") == "EUROPE")
        .join(
            F.broadcast(qual),
            F.col("s_suppkey") == F.col("l_suppkey"),
            "left_semi",
        )
        .select("s_name", "n_name")
        .orderBy("s_name")
    )


@register(
    "agg_skew_kurtosis_exact",
    oracle_sql="""
        WITH s AS (
            SELECT l_returnflag,
                   CAST(count(*) AS BIGINT) AS n_q,
                   sum(q) AS s1, sum(q * q) AS s2,
                   sum(q * q * q) AS s3, sum(q * q * q * q) AS s4
            FROM (SELECT l_returnflag,
                         CAST(round(l_quantity) AS BIGINT) AS q
                  FROM lineitem)
            GROUP BY 1
        )
        SELECT l_returnflag, n_q,
               CAST(s1 AS DOUBLE) / n_q AS mean_q,
               CASE WHEN CAST(s2 AS DOUBLE) / n_q
                         - pow(CAST(s1 AS DOUBLE) / n_q, 2) > 0
                    THEN round((CAST(s3 AS DOUBLE) / n_q
                           - 3 * (CAST(s1 AS DOUBLE) / n_q)
                               * (CAST(s2 AS DOUBLE) / n_q)
                           + 2 * pow(CAST(s1 AS DOUBLE) / n_q, 3))
                          / pow(CAST(s2 AS DOUBLE) / n_q
                                - pow(CAST(s1 AS DOUBLE) / n_q, 2), 1.5),
                          4)
               END AS skew_q,
               CASE WHEN CAST(s2 AS DOUBLE) / n_q
                         - pow(CAST(s1 AS DOUBLE) / n_q, 2) > 0
                    THEN round((CAST(s4 AS DOUBLE) / n_q
                           - 4 * (CAST(s1 AS DOUBLE) / n_q)
                               * (CAST(s3 AS DOUBLE) / n_q)
                           + 6 * pow(CAST(s1 AS DOUBLE) / n_q, 2)
                               * (CAST(s2 AS DOUBLE) / n_q)
                           - 3 * pow(CAST(s1 AS DOUBLE) / n_q, 4))
                          / pow(CAST(s2 AS DOUBLE) / n_q
                                - pow(CAST(s1 AS DOUBLE) / n_q, 2), 2)
                          - 3, 4)
               END AS kurt_q
        FROM s
        ORDER BY l_returnflag
    """,
    description="Exact population skewness and excess kurtosis of "
    "quantity per return flag, from integer power sums: quantities are "
    "exact integers, so S1..S4 accumulate as BIGINTs (one map-side-"
    "combined aggregate, 50^4·|lineitem| « int64), and the central-"
    "moment formulas are a float chain written with the IDENTICAL "
    "expression tree on both engines over those exact sums — the "
    "mergeable-moments pattern (partial power sums re-aggregate "
    "losslessly across partitions/days, unlike a direct skewness() "
    "whose one-pass float state is order-dependent).",
)
def agg_skew_kurtosis_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    q = scaled_long("l_quantity", 1)
    s = (
        load(spark, sf_dir, "lineitem")
        .select("l_returnflag", q.alias("q"))
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_q"),
            F.sum("q").alias("s1"),
            F.sum(F.col("q") * F.col("q")).alias("s2"),
            F.sum(F.col("q") * F.col("q") * F.col("q")).alias("s3"),
            F.sum(
                F.col("q") * F.col("q") * F.col("q") * F.col("q")
            ).alias("s4"),
        )
    )
    n = F.col("n_q")
    m1 = F.col("s1").cast("double") / n
    r2 = F.col("s2").cast("double") / n
    r3 = F.col("s3").cast("double") / n
    r4 = F.col("s4").cast("double") / n
    var = r2 - F.pow(m1, F.lit(2))
    # Zero-variance groups (constant quantity) yield NULL moments on
    # both engines — found by the lineitem fuzz battery, unreachable on
    # the shipped fixtures but one regeneration away.
    skew = F.when(
        var > 0,
        (r3 - 3 * m1 * r2 + 2 * F.pow(m1, F.lit(3)))
        / F.pow(var, F.lit(1.5)),
    )
    kurt = F.when(
        var > 0,
        (
            r4
            - 4 * m1 * r3
            + 6 * F.pow(m1, F.lit(2)) * r2
            - 3 * F.pow(m1, F.lit(4))
        )
        / F.pow(var, F.lit(2))
        - 3,
    )
    return s.select(
        "l_returnflag",
        "n_q",
        # mean_q is a rational of exact ints: emit the unrounded IEEE
        # division (bit-identical across engines); round() on rationals
        # is the half-boundary trap (functions/parity.py).
        m1.alias("mean_q"),
        F.round(skew, 4).alias("skew_q"),
        F.round(kurt, 4).alias("kurt_q"),
    ).orderBy("l_returnflag")


@register(
    "subquery_in_any_all",
    oracle_sql="""
        SELECT c_custkey, c_name, c_acctbal, c_mktsegment
        FROM customer c
        WHERE c_acctbal > ALL (
                  SELECT c2.c_acctbal FROM customer c2
                  WHERE c2.c_nationkey = c.c_nationkey
                    AND c2.c_mktsegment = 'BUILDING'
              )
          AND c_nationkey IN (
                  SELECT n_nationkey FROM nation
                  JOIN region ON n_regionkey = r_regionkey
                  WHERE r_name = 'ASIA'
              )
        ORDER BY c_custkey
    """,
    description="ANY/ALL subquery decorrelation: ASIA customers whose "
    "balance beats EVERY BUILDING-segment balance in their own nation "
    "— > ALL over an empty set is vacuously TRUE, the classic SQL "
    "three-valued trap this op pins. Decorrelates to a per-nation MAX "
    "(25 rows, broadcast) with a left join whose null means 'no "
    "BUILDING customers, keep', plus a broadcast semi join for the IN; "
    "no correlated re-scan of customer per row.",
)
def subquery_in_any_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    bmax = (
        cust.where(F.col("c_mktsegment") == "BUILDING")
        .groupBy(F.col("c_nationkey").alias("b_nationkey"))
        .agg(F.max("c_acctbal").alias("b_max"))
    )
    asia = (
        load(spark, sf_dir, "nation")
        .join(
            F.broadcast(load(spark, sf_dir, "region")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .where(F.col("r_name") == "ASIA")
        .select("n_nationkey")
    )
    return (
        cust.join(
            F.broadcast(bmax),
            F.col("c_nationkey") == F.col("b_nationkey"),
            "left",
        )
        .where(F.col("b_max").isNull() | (F.col("c_acctbal") > F.col("b_max")))
        .join(
            F.broadcast(asia),
            F.col("c_nationkey") == F.col("n_nationkey"),
            "left_semi",
        )
        .select("c_custkey", "c_name", "c_acctbal", "c_mktsegment")
        .orderBy("c_custkey")
    )


# The five o_orderpriority values, discovered dynamically by the Spark
# pivot (no values list) and therefore hardcoded ONLY in the oracle.
_PRIORITIES = [
    "1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW",
]


def _prio_col(p: str) -> str:
    return "p" + p.split("-")[0] + "_" + (
        p.split("-", 1)[1].lower().replace(" ", "_")
    )


@register(
    "sql_pivot_dynamic_values",
    oracle_sql="SELECT o_orderstatus,\n"
    + ",\n".join(
        f"       CAST(count(*) FILTER (WHERE o_orderpriority = '{p}')"
        f" AS BIGINT) AS {_prio_col(p)}" for p in _PRIORITIES
    )
    + "\nFROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus",
    description="Dynamic-value pivot: order counts per status × "
    "priority where the pivot columns are DISCOVERED at plan time "
    "(pivot() with no values list runs Spark's internal distinct-"
    "values job, then compiles the same single grouped aggregate as "
    "the static form — two jobs, one shuffle, no per-value scan). "
    "Discovered values map to stable snake_case column names and "
    "missing cells coalesce to 0; the oracle hardcodes the value set "
    "as conditional counts, so a fixture drift in the priority domain "
    "fails loudly instead of silently reshaping the output.",
)
def sql_pivot_dynamic_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    pivoted = (
        load(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .pivot("o_orderpriority")  # dynamic: values discovered at plan time
        .agg(F.count(F.lit(1)))
    )
    cols = [F.col("o_orderstatus")]
    for p in sorted(c for c in pivoted.columns if c != "o_orderstatus"):
        cols.append(
            F.coalesce(F.col(f"`{p}`"), F.lit(0))
            .cast("long")
            .alias(_prio_col(p))
        )
    return pivoted.select(*cols).orderBy("o_orderstatus")


@register(
    "join_interval_overlap_bucketed",
    oracle_sql="""
        SELECT a.o_custkey,
               a.o_orderkey AS okey_lo, b.o_orderkey AS okey_hi,
               CAST((epoch(least(a.o_orderdate + INTERVAL 30 DAY,
                                 b.o_orderdate + INTERVAL 30 DAY))
                     - epoch(greatest(a.o_orderdate, b.o_orderdate)))
                    // 86400 AS BIGINT) AS overlap_days
        FROM orders a
        JOIN orders b
          ON a.o_custkey = b.o_custkey
         AND a.o_orderkey < b.o_orderkey
         AND a.o_orderdate < b.o_orderdate + INTERVAL 30 DAY
         AND b.o_orderdate < a.o_orderdate + INTERVAL 30 DAY
        ORDER BY 1, 2, 3
    """,
    description="Interval-overlap self-join: pairs of same-customer "
    "orders whose 30-day fulfilment windows overlap, with the exact "
    "overlap length in days (timestamps are midnight-aligned, so the "
    "division is exact). The scale shape: each interval expands to its "
    "≤2 covered month buckets and the join runs as (custkey, bucket) "
    "EQUALITY — never a range-theta join — then pairs dedup and the "
    "exact overlap predicate filters; fan-out is bounded by interval/"
    "bucket ratio. The oracle is the direct theta join, so the "
    "bucketing's losslessness is what the hash grades.",
)
def join_interval_overlap_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.col("o_orderdate").alias("start"),
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")).alias("end"),
    )
    bucketed = o.withColumn(
        "bucket",
        F.explode(
            F.array_distinct(
                F.array(
                    F.date_trunc("month", "start"),
                    F.date_trunc("month", F.col("end") - F.expr("INTERVAL 1 SECOND")),
                )
            )
        ),
    )
    a = bucketed.alias("a")
    b = bucketed.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.o_custkey") == F.col("b.o_custkey"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.o_orderkey") < F.col("b.o_orderkey")),
        )
        .where(
            (F.col("a.start") < F.col("b.end"))
            & (F.col("b.start") < F.col("a.end"))
        )
        .select(
            F.col("a.o_custkey").alias("o_custkey"),
            F.col("a.o_orderkey").alias("okey_lo"),
            F.col("b.o_orderkey").alias("okey_hi"),
            F.col("a.start").alias("start_a"),
            F.col("a.end").alias("end_a"),
            F.col("b.start").alias("start_b"),
            F.col("b.end").alias("end_b"),
        )
        .distinct()  # a pair can cohabit both month buckets
    )
    overlap = (
        (
            F.unix_timestamp(F.least("end_a", "end_b"))
            - F.unix_timestamp(F.greatest("start_a", "start_b"))
        )
        / 86400
    ).cast("long")
    return pairs.select(
        "o_custkey", "okey_lo", "okey_hi", overlap.alias("overlap_days")
    ).orderBy("o_custkey", "okey_lo", "okey_hi")


@register(
    "agg_bitmap_distinct_rollup",
    oracle_sql="""
        WITH masks AS (
            SELECT CAST(date_trunc('day', ts) AS DATE) AS d,
                   user_id // 32 AS bucket,
                   bit_or(CAST(1 AS BIGINT) << CAST(user_id % 32 AS INTEGER))
                       AS mask
            FROM events
            GROUP BY 1, 2
        ),
        daily AS (
            SELECT d, CAST(sum(bit_count(mask)) AS BIGINT) AS n_users
            FROM masks GROUP BY d
        ),
        monthly AS (
            SELECT CAST(date_trunc('month', d) AS DATE) AS m,
                   CAST(sum(bit_count(mmask)) AS BIGINT) AS n_users_month
            FROM (
                SELECT CAST(date_trunc('month', d) AS DATE) AS d,
                       bucket, bit_or(mask) AS mmask
                FROM masks GROUP BY 1, 2
            ) x(d, bucket, mmask)
            GROUP BY 1
        )
        SELECT daily.d, daily.n_users, monthly.n_users_month
        FROM daily
        JOIN monthly ON CAST(date_trunc('month', daily.d) AS DATE) = monthly.m
        ORDER BY daily.d
    """,
    description="Bitmap-based mergeable distinct rollup: exact daily "
    "active users via per-(day, user-bucket) BIGINT bitmasks (32 ids "
    "per mask), and the month's exact distinct obtained by RE-ORING "
    "the daily masks — the additive sketch-free distinct pattern "
    "(daily counts don't sum to monthly; the masks do merge), which is "
    "how lakehouse rollup tables get incrementally-maintainable exact "
    "distincts. State is |days|×|id-space|/32 longs regardless of "
    "event volume; both aggregates are map-side-combinable bit_or.",
)
def agg_bitmap_distinct_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    masks = (
        ev.select(
            F.to_date(F.date_trunc("day", "ts")).alias("d"),
            (F.col("user_id") / 32).cast("long").alias("bucket"),
            F.expr("shiftleft(1L, cast(user_id % 32 as int))").alias("bit"),
        )
        .groupBy("d", "bucket")
        .agg(F.bit_or("bit").alias("mask"))
    )
    daily = masks.groupBy("d").agg(
        F.sum(F.bit_count("mask")).cast("long").alias("n_users")
    )
    monthly = (
        masks.groupBy(
            F.to_date(F.date_trunc("month", "d")).alias("m"), F.col("bucket")
        )
        .agg(F.bit_or("mask").alias("mmask"))
        .groupBy("m")
        .agg(F.sum(F.bit_count("mmask")).cast("long").alias("n_users_month"))
    )
    return (
        daily.join(
            F.broadcast(monthly),
            F.to_date(F.date_trunc("month", "d")) == F.col("m"),
        )
        .select("d", "n_users", "n_users_month")
        .orderBy("d")
    )
