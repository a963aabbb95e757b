"""Fifth wave of extended relational operators (SURVEY.md §2.26):
the remaining classic TPC-H join/aggregate patterns adapted to the
fixture schemas — nation-pair shipping volume (Q7), regional market
share (Q8), customer order-count distribution (Q13), small-quantity
revenue (Q17), sole-late-supplier ranking (Q21) — plus two analytic
aggregates: year-over-year revenue change (lag window over a yearly
rollup) and per-group median absolute deviation (robust dispersion).

Scale notes: Q7/Q8 broadcast every dimension (nation, region, part,
supplier, customer at fixture scale; on a lake customer shuffles) so
the lineitem fact is scanned once and shuffled only on its join key;
Q13 is a single custkey shuffle followed by a tiny distribution
aggregate; Q17 computes the per-part quantity threshold as a
partial-aggregated join (never a correlated per-row subquery) and
keeps the comparison in exact integers; Q21 derives per-order
supplier/late-supplier counts in ONE orderkey-shuffled aggregate and
joins the per-line credit back broadcast — no EXISTS chain, no
re-scan; the YoY window partitions by nation (25 partitions of ~7
rows after the rollup — the window input is post-aggregate, bounded
by |nations|×|years| regardless of fact size); MAD is two tiny
aggregation passes with a 5-row broadcast join between them.

Parity notes: quantities are exact integers (1..50), so Q17's
``q < 0.2·avg`` becomes the integer inequality ``5·q·cnt < sum`` —
no float comparison at the boundary; YoY percent and Q8 share are
single IEEE divisions of exact integers; MAD medians interpolate on
the integer-cents grid so every intermediate is an exact dyadic
rational, bit-identical across engines.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from etl_intraday_bidask_spark.functions.parity import scaled_long
from etl_intraday_bidask_spark.registry import register
from etl_intraday_bidask_spark.tables import load


@register(
    "q7_nation_pair_volume",
    oracle_sql="""
        SELECT n1.n_name AS supp_nation,
               n2.n_name AS cust_nation,
               CAST(year(l_shipdate) AS BIGINT) AS l_year,
               CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000)
                             AS BIGINT)) AS DOUBLE) / 10000.0 AS revenue
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
               OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
          AND l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1999-01-01'
        GROUP BY 1, 2, 3
        ORDER BY 1, 2, 3
    """,
    description="TPC-H Q7-style volume shipping between a nation pair: "
    "revenue flowing NATION_1→NATION_2 and back, per ship-year over a "
    "3-year slice. Supplier side resolves through lineitem.l_suppkey, "
    "customer side through orders→customer; both nation dims broadcast "
    "(twice, under different aliases), supplier/customer broadcast at "
    "fixture scale, so the only wide exchange is lineitem↔orders on "
    "orderkey. The pair disjunction is applied AFTER the joins (it "
    "needs both nations) but the ship-date range pushes into the "
    "lineitem scan.",
)
def q7_nation_pair_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1999-01-01").cast("timestamp"))
    )
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    supp = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = load(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | (
        (F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")
    )
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(
            (
                F.sum(
                    scaled_long(
                        F.col("l_extendedprice") * (1 - F.col("l_discount")),
                        10000,
                    )
                ).cast("double")
                / 10000.0
            ).alias("revenue")
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@register(
    "q8_market_share",
    oracle_sql="""
        WITH sliced AS (
            SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
                   CAST(round(l_extendedprice * (1 - l_discount) * 10000)
                        AS BIGINT) AS rev_e4,
                   n1.n_name AS supp_nation
            FROM lineitem
            JOIN orders   ON l_orderkey = o_orderkey
            JOIN part     ON l_partkey = p_partkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation n1 ON s_nationkey = n1.n_nationkey
            JOIN nation n2 ON c_nationkey = n2.n_nationkey
            JOIN region   ON n2.n_regionkey = r_regionkey
            WHERE r_name = 'ASIA' AND p_type = 'PROMO'
        )
        SELECT o_year,
               CAST(sum(CASE WHEN supp_nation = 'NATION_2'
                             THEN rev_e4 ELSE 0 END) AS DOUBLE)
                   / sum(rev_e4) AS mkt_share
        FROM sliced
        GROUP BY o_year
        ORDER BY o_year
    """,
    description="TPC-H Q8-style national market share: NATION_2 "
    "suppliers' fraction of all PROMO-part revenue sold to ASIA "
    "customers, per order-year. Part/supplier/customer/nation/region "
    "dims all broadcast; the share is one IEEE division of two exact "
    "scaled-integer sums per year, bit-identical cross-engine.",
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    part = (
        load(spark, sf_dir, "part")
        .filter(F.col("p_type") == "PROMO")
        .select("p_partkey")
    )
    supp = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"),
        F.col("n_regionkey").alias("n2_region"),
    )
    rev_e4 = scaled_long(
        F.col("l_extendedprice") * (1 - F.col("l_discount")), 10000
    )
    sliced = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .join(F.broadcast(region), F.col("n2_region") == F.col("r_regionkey"))
        .select(
            F.year("o_orderdate").cast("long").alias("o_year"),
            rev_e4.alias("rev_e4"),
            "supp_nation",
        )
    )
    return (
        sliced.groupBy("o_year")
        .agg(
            (
                F.sum(
                    F.when(
                        F.col("supp_nation") == "NATION_2", F.col("rev_e4")
                    ).otherwise(F.lit(0))
                ).cast("double")
                / F.sum("rev_e4")
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


@register(
    "q13_order_count_distribution",
    oracle_sql="""
        WITH per_cust AS (
            SELECT c_custkey, count(o_orderkey) AS c_count
            FROM customer
            LEFT JOIN orders
              ON o_custkey = c_custkey AND o_orderpriority <> '1-URGENT'
            GROUP BY c_custkey
        )
        SELECT c_count, count(*) AS custdist
        FROM per_cust
        GROUP BY c_count
        ORDER BY custdist DESC, c_count DESC
    """,
    description="TPC-H Q13-style customer order-count distribution: "
    "how many customers placed exactly N non-urgent orders (customers "
    "with none kept by the LEFT join, counted at N=0). Two-level "
    "aggregation: one custkey shuffle for the per-customer count "
    "(count(o_orderkey) ignores the NULLs the outer join introduces), "
    "then a tiny distribution aggregate over ≤|distinct counts| rows.",
)
def q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer").select("c_custkey")
    orders = load(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        cust.join(orders, F.col("o_custkey") == F.col("c_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@register(
    "q17_small_quantity_revenue",
    oracle_sql="""
        WITH stats AS (
            SELECT l_partkey AS sp,
                   sum(CAST(l_quantity AS BIGINT)) AS sum_qty,
                   count(*) AS cnt
            FROM lineitem
            GROUP BY l_partkey
        )
        SELECT CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                    AS DOUBLE) / 100.0 / 7.0 AS avg_yearly
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        JOIN stats ON l_partkey = sp
        WHERE p_brand = 'Brand#3'
          AND 5 * CAST(l_quantity AS BIGINT) * cnt < sum_qty
    """,
    description="TPC-H Q17-style small-quantity order revenue: yearly "
    "average revenue lost if Brand#3 orders below 20% of their part's "
    "average quantity were no longer taken. The per-part threshold is "
    "a partial-aggregated join (never a correlated per-row subquery); "
    "fixture quantities are exact integers, so q < 0.2·avg(q) is the "
    "integer inequality 5·q·cnt < sum_qty — no float comparison can "
    "flip at the boundary. Output is exact cents divided twice in a "
    "fixed order (÷100 then ÷7), bit-identical cross-engine.",
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    part = (
        load(spark, sf_dir, "part")
        .filter(F.col("p_brand") == "Brand#3")
        .select("p_partkey")
    )
    stats = li.groupBy(F.col("l_partkey").alias("sp")).agg(
        F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
        F.count(F.lit(1)).alias("cnt"),
    )
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(stats, F.col("l_partkey") == F.col("sp"))
        .filter(
            5 * F.col("l_quantity").cast("long") * F.col("cnt")
            < F.col("sum_qty")
        )
        .agg(
            (
                F.sum(scaled_long("l_extendedprice", 100)).cast("double")
                / 100.0
                / 7.0
            ).alias("avg_yearly")
        )
    )


# Late = shipped more than 2 years after the order date; measured at
# sf0.01 this marks ~7% of lines, so sole-late orders are plentiful but
# not degenerate (threshold validated against the fixture lag profile).
_Q21_LATE_DAYS = 730


@register(
    "q21_sole_late_supplier",
    oracle_sql=f"""
        WITH flags AS (
            SELECT l_orderkey AS fok,
                   count(DISTINCT l_suppkey) AS n_supp,
                   count(DISTINCT CASE
                       WHEN l_shipdate > o_orderdate
                                        + INTERVAL {_Q21_LATE_DAYS} DAY
                       THEN l_suppkey END) AS n_late
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            GROUP BY l_orderkey
        )
        SELECT s_name, count(DISTINCT l_orderkey) AS numwait
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN flags ON l_orderkey = fok
        JOIN supplier ON l_suppkey = s_suppkey
        WHERE l_shipdate > o_orderdate + INTERVAL {_Q21_LATE_DAYS} DAY
          AND n_late = 1 AND n_supp >= 2
        GROUP BY s_name
        ORDER BY numwait DESC, s_name
        LIMIT 10
    """,
    description="TPC-H Q21-style suppliers who kept orders waiting: "
    "per supplier, the multi-supplier orders on which they were the "
    "ONLY one to ship late (> 2 years after the order date — the "
    "fixture has no commit/receipt dates, so ship-vs-order lag plays "
    "that role). Q21's EXISTS/NOT-EXISTS pair collapses into ONE "
    "orderkey-shuffled aggregate producing per-order supplier and "
    "late-supplier counts, joined back to the late lines — the fact "
    "is scanned twice but shuffled on the same key, and no correlated "
    "re-scan per supplier exists. Top-10 with name tie-break.",
)
def q21_sole_late_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    supp = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr(
        f"INTERVAL {_Q21_LATE_DAYS} DAY"
    )
    lo = li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
    flags = lo.groupBy(F.col("l_orderkey").alias("fok")).agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(F.when(late, F.col("l_suppkey"))).alias("n_late"),
    )
    return (
        lo.filter(late)
        .join(flags, F.col("l_orderkey") == F.col("fok"))
        .filter((F.col("n_late") == 1) & (F.col("n_supp") >= 2))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.countDistinct("l_orderkey").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(10)
    )


@register(
    "win_yoy_nation_revenue",
    oracle_sql="""
        WITH yearly AS (
            SELECT n_name,
                   CAST(year(l_shipdate) AS BIGINT) AS l_year,
                   sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000)
                            AS BIGINT)) AS rev_e4
            FROM lineitem
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation ON s_nationkey = n_nationkey
            GROUP BY 1, 2
        )
        SELECT n_name, l_year,
               CAST(rev_e4 AS DOUBLE) / 10000.0 AS revenue,
               CAST(rev_e4 - lag(rev_e4) OVER w AS DOUBLE)
                   / lag(rev_e4) OVER w AS yoy_change
        FROM yearly
        WINDOW w AS (PARTITION BY n_name ORDER BY l_year)
        ORDER BY n_name, l_year
    """,
    description="Year-over-year revenue change per supplier nation: a "
    "lag window over the yearly rollup (NULL for each nation's first "
    "year). The window input is post-aggregate — at most "
    "|nations|×|years| rows regardless of fact size — and partitions "
    "on nation, so the heavy lifting is the one rollup shuffle. The "
    "change ratio is a single IEEE division of exact scaled-integer "
    "revenues, bit-identical cross-engine.",
)
def win_yoy_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    supp = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    yearly = (
        li.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name", F.year("l_shipdate").cast("long").alias("l_year"))
        .agg(
            F.sum(
                scaled_long(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")), 10000
                )
            ).alias("rev_e4")
        )
    )
    w = Window.partitionBy("n_name").orderBy("l_year")
    prev = F.lag("rev_e4").over(w)
    return yearly.select(
        "n_name",
        "l_year",
        (F.col("rev_e4").cast("double") / 10000.0).alias("revenue"),
        ((F.col("rev_e4") - prev).cast("double") / prev).alias("yoy_change"),
    ).orderBy("n_name", "l_year")


@register(
    "q15_top_supplier",
    oracle_sql="""
        WITH rev AS (
            SELECT l_suppkey AS sk,
                   sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000)
                            AS BIGINT)) AS rev_e4
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate < TIMESTAMP '1996-04-01'
            GROUP BY l_suppkey
        ), mx AS (
            SELECT max(rev_e4) AS top FROM rev
        )
        SELECT s_suppkey, s_name,
               CAST(rev_e4 AS DOUBLE) / 10000.0 AS total_revenue
        FROM supplier JOIN rev ON s_suppkey = sk, mx
        WHERE rev_e4 = top
        ORDER BY s_suppkey
    """,
    description="TPC-H Q15-style top supplier: the supplier(s) with "
    "maximum revenue in 1996 Q1 (ties kept — the revenue comparison "
    "is on exact scaled integers, so 'equal to the max' is "
    "well-defined cross-engine, which a float revenue would not be). "
    "The quarter filter pushes to the lineitem scan; the rollup is "
    "one suppkey shuffle; the max is a 1-row broadcast joined back — "
    "the view+scalar-subquery shape of Q15 without recomputing the "
    "rollup twice.",
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    supp = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    rev = li.groupBy(F.col("l_suppkey").alias("sk")).agg(
        F.sum(
            scaled_long(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), 10000
            )
        ).alias("rev_e4")
    )
    mx = rev.agg(F.max("rev_e4").alias("top"))
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("rev_e4") == F.col("top"))
        .join(F.broadcast(supp), F.col("sk") == F.col("s_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            (F.col("rev_e4").cast("double") / 10000.0).alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


@register(
    "q9_profit_by_nation_year",
    oracle_sql="""
        SELECT n_name AS nation,
               CAST(year(o_orderdate) AS BIGINT) AS o_year,
               CAST(sum(CAST(round((l_extendedprice * (1 - l_discount)
                                    - 0.6 * p_retailprice * l_quantity)
                                   * 10000) AS BIGINT)) AS DOUBLE)
                   / 10000.0 AS sum_profit
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN part     ON l_partkey = p_partkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        WHERE p_name LIKE '%gear%'
        GROUP BY 1, 2
        ORDER BY nation, o_year DESC
    """,
    description="TPC-H Q9-style product-type profit by nation and "
    "year (the fixture has no partsupp.ps_supplycost; cost is proxied "
    "as 60% of p_retailprice per unit, keeping Q9's "
    "revenue-minus-cost aggregate shape and its LIKE part filter — '%gear%' on the fixture's color-noun names). "
    "Per-line profit sits on the exact 1e-4 grid (prices 2dp × "
    "discount/0.6 2dp/1dp × integer quantity), so the signed amounts "
    "aggregate as exact BIGINTs. Part/supplier/nation broadcast; one "
    "orderkey exchange; the LIKE filter prunes the broadcast side "
    "before the join.",
)
def q9_profit_by_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    part = (
        load(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%gear%"))
        .select("p_partkey", "p_retailprice")
    )
    supp = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    profit = scaled_long(
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - 0.6 * F.col("p_retailprice") * F.col("l_quantity"),
        10000,
    )
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg((F.sum(profit).cast("double") / 10000.0).alias("sum_profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


@register(
    "agg_median_abs_deviation",
    oracle_sql="""
        WITH cents AS (
            SELECT event_type,
                   CAST(round(value * 100) AS BIGINT) AS c
            FROM events
        ), med AS (
            SELECT event_type AS met, quantile_cont(c, 0.5) AS m
            FROM cents GROUP BY event_type
        )
        SELECT event_type,
               m / 100.0 AS median_value,
               quantile_cont(abs(CAST(c AS DOUBLE) - m), 0.5) / 100.0 AS mad
        FROM cents JOIN med ON event_type = met
        GROUP BY event_type, m
        ORDER BY event_type
    """,
    description="Per-type median absolute deviation — the robust "
    "dispersion statistic (outlier-insensitive, unlike anomaly_zscore's "
    "σ). Two aggregation passes with a 5-row broadcast join between "
    "them: exact interpolated median of integer cents (midpoints are "
    "exact .5 dyadics), then the median of absolute deviations from it "
    "— every intermediate sits on the half-cent grid, so both engines' "
    "percentile interpolation returns identical doubles. At scale each "
    "pass is a groupBy shuffle on event_type; the exact median needs "
    "the full per-group sort either way (approx sketches are the "
    "documented alternative, graded rows-only where used).",
)
def agg_median_abs_deviation(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    cents = ev.select(
        "event_type", scaled_long("value", 100).alias("c")
    )
    med = cents.groupBy(F.col("event_type").alias("met")).agg(
        F.expr("percentile(c, 0.5)").alias("m")
    )
    return (
        cents.join(F.broadcast(med), F.col("event_type") == F.col("met"))
        .groupBy("event_type", "m")
        .agg(
            F.expr("percentile(abs(CAST(c AS DOUBLE) - m), 0.5)").alias("mad_c")
        )
        .select(
            "event_type",
            (F.col("m") / 100.0).alias("median_value"),
            (F.col("mad_c") / 100.0).alias("mad"),
        )
        .orderBy("event_type")
    )
