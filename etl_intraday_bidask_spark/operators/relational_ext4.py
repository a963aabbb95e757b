"""Fourth wave of extended relational operators (SURVEY.md §2.21):
the remaining classic TPC-H predicate/aggregate patterns adapted to the
fixture schemas — range-predicate forecast revenue (Q6), priority
counts by line status (Q12), promotion revenue share (Q14),
disjunctive-predicate revenue (Q19), and dormant high-balance
customers (Q22).

Scale notes: Q6 is the canonical scan-dominated query — every predicate
is a pushable range filter, the aggregate is a two-phase exact-integer
sum, zero joins and zero wide shuffles; Q12 pushes the ship-year filter
into the lineitem scan and leaves a single orderkey shuffle before a
2-group aggregate; Q14 broadcasts the part dim so the fact table is
touched by one scan and one month-sliced aggregate; Q19 pre-filters
BOTH sides with the derivable envelope of the disjunction (brand IN,
size/quantity bounds) so the pushdown the optimizer cannot infer from
an OR-of-ANDs is recovered manually before the broadcast join; Q22
reduces customers to one broadcastable scalar (exact average balance),
then an anti join against orders — at 100 TB the anti join shuffles on
custkey while the scalar side stays a 1-row broadcast.

Parity notes: all money aggregates use the exact scaled-integer policy
(functions/parity.py); the Q14 share and Q22 average are single IEEE
divisions of exact integers, bit-identical across engines; every
result set either is a single row or carries a total-order ORDER BY.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from etl_intraday_bidask_spark.functions.parity import scaled_long
from etl_intraday_bidask_spark.registry import register
from etl_intraday_bidask_spark.tables import load


@register(
    "q6_revenue_forecast",
    oracle_sql="""
        SELECT
            CAST(sum(CAST(round(l_extendedprice * l_discount * 10000)
                          AS BIGINT)) AS DOUBLE) / 10000.0 AS revenue,
            count(*) AS n_items
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1997-01-01'
          AND l_discount BETWEEN 0.03 AND 0.07
          AND l_quantity < 24
    """,
    description="TPC-H Q6-style forecast-revenue change: total discount "
    "revenue over one ship-year for mid-range discounts and small "
    "quantities. The canonical scan-bound query — all three predicates "
    "are pushable range filters on the parquet scan, no join, a "
    "two-phase exact-integer aggregate (grid 1e4: 2-dp price × 2-dp "
    "discount) and a single final division. One row out.",
)
def q6_revenue_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.03)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        (
            F.sum(
                scaled_long(F.col("l_extendedprice") * F.col("l_discount"), 10000)
            ).cast("double")
            / 10000.0
        ).alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


@register(
    "q12_priority_by_linestatus",
    oracle_sql="""
        SELECT
            l_linestatus,
            count(*) FILTER (WHERE o_orderpriority IN ('1-URGENT', '2-HIGH'))
                AS high_line_count,
            count(*) FILTER (WHERE o_orderpriority NOT IN ('1-URGENT', '2-HIGH'))
                AS low_line_count
        FROM orders
        JOIN lineitem ON l_orderkey = o_orderkey
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1997-01-01'
        GROUP BY l_linestatus
        ORDER BY l_linestatus
    """,
    description="TPC-H Q12-style priority split by line status over one "
    "ship-year (the fixture lineitem has no shipmode column; linestatus "
    "plays its grouping role). The year filter is pushed into the "
    "lineitem scan before the single orderkey shuffle join; conditional "
    "counts are one pass with map-side partial aggregation into a "
    "2-row result.",
)
def q12_priority_by_linestatus(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    orders = load(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        orders.join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_linestatus")
        .agg(
            F.count(F.when(high, 1)).alias("high_line_count"),
            F.count(F.when(~high, 1)).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


@register(
    "q14_promo_revenue_share",
    oracle_sql="""
        WITH scored AS (
            SELECT
                CAST(round(l_extendedprice * (1 - l_discount) * 10000)
                     AS BIGINT) AS rev,
                p_type = 'PROMO' AS is_promo
            FROM lineitem
            JOIN part ON l_partkey = p_partkey
            WHERE l_shipdate >= TIMESTAMP '1996-03-01'
              AND l_shipdate < TIMESTAMP '1996-04-01'
        )
        SELECT
            CAST(CAST(sum(CASE WHEN is_promo THEN rev ELSE 0 END)
                      AS BIGINT) AS DOUBLE) * 100.0
                / CAST(CAST(sum(rev) AS BIGINT) AS DOUBLE) AS promo_share,
            CAST(CAST(sum(CASE WHEN is_promo THEN rev ELSE 0 END)
                      AS BIGINT) AS DOUBLE) / 10000.0 AS promo_revenue,
            CAST(CAST(sum(rev) AS BIGINT) AS DOUBLE) / 10000.0 AS total_revenue
        FROM scored
    """,
    description="TPC-H Q14-style promotion effect: the percentage of "
    "one month's revenue coming from PROMO-type parts. The month "
    "filter is pushed into the lineitem scan, the part dim is "
    "broadcast, and both the promo and total sums are exact scaled "
    "integers — the share is a single IEEE division of two exact "
    "BIGINTs, bit-identical across engines. One row out.",
)
def q14_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    part = load(spark, sf_dir, "part")
    scored = li.join(
        F.broadcast(part), F.col("l_partkey") == F.col("p_partkey")
    ).select(
        scaled_long(
            F.col("l_extendedprice") * (1 - F.col("l_discount")), 10000
        ).alias("rev"),
        (F.col("p_type") == "PROMO").alias("is_promo"),
    )
    promo = F.sum(F.when(F.col("is_promo"), F.col("rev")).otherwise(0))
    total = F.sum("rev")
    return scored.agg(
        (promo.cast("double") * 100.0 / total.cast("double")).alias("promo_share"),
        (promo.cast("double") / 10000.0).alias("promo_revenue"),
        (total.cast("double") / 10000.0).alias("total_revenue"),
    )


@register(
    "q19_disjunctive_revenue",
    oracle_sql="""
        SELECT
            CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000)
                          AS BIGINT)) AS DOUBLE) / 10000.0 AS revenue,
            count(*) AS n_items
        FROM lineitem
        JOIN part ON p_partkey = l_partkey
        WHERE p_brand IN ('Brand#11', 'Brand#13', 'Brand#15')
          AND p_size BETWEEN 1 AND 15
          AND l_quantity BETWEEN 1 AND 30
          AND (
              (p_brand = 'Brand#11' AND p_size <= 5
               AND l_quantity BETWEEN 1 AND 11)
           OR (p_brand = 'Brand#13' AND p_size <= 10
               AND l_quantity BETWEEN 10 AND 20)
           OR (p_brand = 'Brand#15' AND p_size <= 15
               AND l_quantity BETWEEN 20 AND 30)
          )
    """,
    description="TPC-H Q19-style disjunctive-predicate revenue: an "
    "OR of three (brand, size, quantity) conjunction groups spanning "
    "both join sides. Catalyst cannot push an OR-of-ANDs into either "
    "scan, so the derivable envelope (brand IN set, size and quantity "
    "bounds) is stated explicitly — those single-sided conjuncts reach "
    "the parquet scans while the residual disjunction evaluates after "
    "the broadcast join. Exact-integer revenue, one row out.",
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load(spark, sf_dir, "part").filter(
        F.col("p_brand").isin("Brand#11", "Brand#13", "Brand#15")
        & F.col("p_size").between(1, 15)
    )
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_quantity").between(1, 30)
    )
    disj = (
        (
            (F.col("p_brand") == "Brand#11")
            & (F.col("p_size") <= 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#13")
            & (F.col("p_size") <= 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#15")
            & (F.col("p_size") <= 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return (
        li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .filter(disj)
        .agg(
            (
                F.sum(
                    scaled_long(
                        F.col("l_extendedprice") * (1 - F.col("l_discount")),
                        10000,
                    )
                ).cast("double")
                / 10000.0
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "q4_late_shipment_priority",
    oracle_sql="""
        SELECT o_orderpriority,
               count(*) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1996-04-01'
          AND EXISTS (
              SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND l_shipdate > o_orderdate + INTERVAL 90 DAY
          )
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """,
    description="TPC-H Q4-style order-priority checking adapted to the "
    "fixture schema (no commitdate/receiptdate): orders from one "
    "quarter having at least one line item shipped more than 90 days "
    "after the order date, counted per priority. The EXISTS becomes a "
    "left-semi join shuffling on orderkey with the quarter filter "
    "pushed into the orders scan; the correlated date comparison "
    "rides the join condition. 5-row result.",
)
def q4_late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem")
    late = orders.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


@register(
    "q22_dormant_high_balance",
    oracle_sql="""
        WITH avg_bal AS (
            SELECT CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT))
                        AS DOUBLE) / 100.0 / count(*) AS threshold
            FROM customer
            WHERE c_acctbal > 0.0
        )
        SELECT
            c_mktsegment,
            count(*) AS numcust,
            CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS DOUBLE)
                / 100.0 AS totacctbal
        FROM customer, avg_bal
        WHERE c_mktsegment IN ('AUTOMOBILE', 'BUILDING', 'MACHINERY')
          AND c_acctbal > threshold
          AND NOT EXISTS (
              SELECT 1 FROM orders
              WHERE o_custkey = c_custkey
                AND o_orderdate >= TIMESTAMP '2000-01-01'
          )
        GROUP BY c_mktsegment
        ORDER BY c_mktsegment
    """,
    description="TPC-H Q22-style dormant high-balance customers: "
    "customers in three market segments whose balance exceeds the "
    "exact average positive balance (the fixture customer table has no "
    "phone column; mktsegment plays the country-code role) and whose "
    "last order predates 2000 (every fixture customer has SOME order, "
    "so the classic no-orders-ever predicate is vacuously empty — "
    "'dormant' means no RECENT order, which also pushes a date filter "
    "into the anti-join's build side). The scalar average is an "
    "exact-integer sum divided once (1-row broadcast), the dormancy "
    "condition a left-anti join shuffling on custkey, then a 3-row "
    "segment aggregate of exact cents.",
)
def q22_dormant_high_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    threshold = customer.filter(F.col("c_acctbal") > 0.0).agg(
        (
            F.sum(scaled_long("c_acctbal", 100)).cast("double")
            / 100.0
            / F.count(F.lit(1))
        ).alias("threshold")
    )
    candidates = (
        customer.filter(
            F.col("c_mktsegment").isin("AUTOMOBILE", "BUILDING", "MACHINERY")
        )
        .crossJoin(F.broadcast(threshold))
        .filter(F.col("c_acctbal") > F.col("threshold"))
    )
    recent = orders.filter(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    )
    dormant = candidates.join(
        recent, F.col("o_custkey") == F.col("c_custkey"), "left_anti"
    )
    return (
        dormant.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            (F.sum(scaled_long("c_acctbal", 100)).cast("double") / 100.0).alias(
                "totacctbal"
            ),
        )
        .orderBy("c_mktsegment")
    )


@register(
    "skyline_pareto_2d",
    oracle_sql="""
        WITH pts AS (
            SELECT p_partkey,
                   CAST(round(p_retailprice * 100) AS BIGINT) AS price_c,
                   CAST(p_size AS BIGINT) AS size
            FROM part
        ), fenced AS (
            SELECT p_partkey, price_c, size,
                   max(size) OVER (
                       ORDER BY price_c
                       RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ) AS best_cheaper,
                   max(size) OVER (
                       PARTITION BY price_c
                   ) AS best_same_price
            FROM pts
        )
        SELECT p_partkey, CAST(price_c AS DOUBLE) / 100.0 AS price, size
        FROM fenced
        WHERE (best_cheaper IS NULL OR size > best_cheaper)
          AND size = best_same_price
        ORDER BY price_c, p_partkey
    """,
    description="2-D skyline (Pareto front): the parts not dominated "
    "on (price low, size high) — kept iff no strictly cheaper part "
    "has size ≥ theirs and no equal-priced part beats their size. "
    "Executed as the standard distributed decomposition: phase 1 "
    "hash-buckets the points and computes each bucket's LOCAL skyline "
    "with bucket-partitioned windows (running max size over "
    "strictly-cheaper rows via RANGE ... 1 PRECEDING, plus a per-"
    "(bucket, price) max) — dominance is transitive, so every global "
    "skyline point survives its bucket and the union of local fronts "
    "is a superset of the answer; phase 2 merges the fronts (expected "
    "O(buckets × log n) rows for anti-correlated-or-random data) with "
    "a broadcast anti-join dominance test. No global un-partitioned "
    "window anywhere: both window passes are bucket-partitioned and "
    "the quadratic merge touches only the tiny candidate set. The "
    "oracle keeps the single-sort global-window formulation — same "
    "set either way.",
)
def skyline_pareto_2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    part = load(spark, sf_dir, "part")
    n_buckets = 32
    pts = part.select(
        "p_partkey",
        scaled_long("p_retailprice", 100).alias("price_c"),
        F.col("p_size").cast("long").alias("size"),
        F.pmod(F.hash("p_partkey"), F.lit(n_buckets)).alias("b"),
    )
    w_cheaper = (
        Window.partitionBy("b")
        .orderBy("price_c")
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    w_same = Window.partitionBy("b", "price_c")
    local_front = (
        pts.select(
            "p_partkey",
            "price_c",
            "size",
            F.max("size").over(w_cheaper).alias("best_cheaper"),
            F.max("size").over(w_same).alias("best_same_price"),
        )
        .filter(
            (
                F.col("best_cheaper").isNull()
                | (F.col("size") > F.col("best_cheaper"))
            )
            & (F.col("size") == F.col("best_same_price"))
        )
        .select("p_partkey", "price_c", "size")
    )
    dom = local_front.select(
        F.col("price_c").alias("d_price"), F.col("size").alias("d_size")
    )
    dominates = (
        (F.col("d_price") < F.col("price_c"))
        & (F.col("d_size") >= F.col("size"))
    ) | (
        (F.col("d_price") == F.col("price_c"))
        & (F.col("d_size") > F.col("size"))
    )
    return (
        local_front.join(F.broadcast(dom), dominates, "left_anti")
        .select(
            "p_partkey",
            (F.col("price_c").cast("double") / 100.0).alias("price"),
            "size",
        )
        .orderBy("price", "p_partkey")
    )
