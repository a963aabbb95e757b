"""STAGED round-7 operators (wave C) — implemented and parity-tested,
NOT registered, and NOT part of the round-6 activation wave.

Same staging contract as ``staged_r6.py``/``staged_r6b.py``, one wave
further out: round 6 activates the 50-key wave B window; this module
accumulates the NEXT window so round 7 can also activate a fully
pre-verified batch. Kept in its own ``STAGED_R7`` dict (not merged into
``STAGED``) so the round-6 activation step cannot accidentally register
more than its planned 50 keys.

House discipline: scaled-integer exact arithmetic on fixture grids,
explicit tie-breaks on every window, integer division for graded
ratios, 128-bit integers (DECIMAL(38,0) / HUGEINT) where int64 products
overflow, one final IEEE op where a float is emitted, a 100 TB scale
note per op.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from etl_intraday_bidask_spark.functions.parity import scaled_long
from etl_intraday_bidask_spark.registry import QuerySpec, SparkFn
from etl_intraday_bidask_spark.tables import load

STAGED_R7: dict[str, QuerySpec] = {}


def staged7(name: str, oracle_sql: str | None, description: str = ""):
    def deco(fn: SparkFn) -> SparkFn:
        STAGED_R7[name] = QuerySpec(name, fn, oracle_sql, description)
        return fn

    return deco


@staged7(
    "sample_largest_remainder_alloc",
    oracle_sql="""
        WITH per_source AS (
            SELECT source, CAST(count(*) AS BIGINT) AS n_docs
            FROM documents GROUP BY source
        ), tot AS (
            SELECT sum(n_docs) AS total FROM per_source
        ), quota AS (
            SELECT source, n_docs,
                   (1000 * n_docs) // total AS base,
                   (1000 * n_docs) % total AS rem
            FROM per_source, tot
        ), ranked AS (
            SELECT source, n_docs, base, rem,
                   row_number() OVER (ORDER BY rem DESC, source) AS rk,
                   1000 - sum(base) OVER () AS leftover
            FROM quota
        )
        SELECT source, n_docs,
               CAST(base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END
                    AS BIGINT) AS alloc
        FROM ranked
        ORDER BY source
    """,
    description="Largest-remainder (Hamilton) seat allocation of a "
    "1000-sample budget across corpus sources: exact integer quotas "
    "(1000*n div total), with the leftover seats going to the largest "
    "remainders (tie-broken on source name) — the deterministic, "
    "exactly-proportional way to turn mixture weights into sample "
    "counts, where naive per-source rounding over- or under-shoots "
    "the budget. Every value in the grade is an int64; no float ever "
    "exists. The alloc column sums to exactly 1000 by construction — "
    "an accounting identity the hash enforces. Scale: per-source "
    "counts reduce map-side; the remainder ranking windows over the "
    "#sources grain (tiny).",
)
def sample_largest_remainder_alloc(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    per_source = (
        load(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    )
    tot = per_source.agg(F.sum("n_docs").alias("total"))
    quota = per_source.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        F.expr("1000 * n_docs div total").alias("base"),
        ((1000 * F.col("n_docs")) % F.col("total")).alias("rem"),
    )
    ranked = quota.select(
        "source",
        "n_docs",
        "base",
        F.row_number()
        .over(Window.orderBy(F.desc("rem"), "source"))
        .alias("rk"),
        (F.lit(1000) - F.sum("base").over(Window.partitionBy())).alias(
            "leftover"
        ),
    )
    return ranked.select(
        "source",
        "n_docs",
        (
            F.col("base")
            + F.when(F.col("rk") <= F.col("leftover"), 1).otherwise(0)
        )
        .cast("long")
        .alias("alloc"),
    ).orderBy("source")


@staged7(
    "dq_benford_first_digit",
    oracle_sql="""
        WITH digits AS (
            SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT)
                                    AS VARCHAR), 1, 1) AS BIGINT) AS d
            FROM orders WHERE o_totalprice >= 1
        ), obs AS (
            SELECT d, CAST(count(*) AS BIGINT) AS n FROM digits GROUP BY d
        ), tot AS (SELECT sum(n) AS total FROM obs)
        SELECT d, n,
               CAST(n AS DOUBLE) / total AS observed_p,
               round(log10(1.0 + 1.0 / d), 4) AS benford_p,
               round(CAST(n AS DOUBLE) / total - log10(1.0 + 1.0 / d), 4)
                   AS deviation
        FROM obs, tot
        ORDER BY d
    """,
    description="Benford first-digit audit of order values: the "
    "leading digit of the integer dollar amount, counted exactly, "
    "against the log10(1+1/d) Benford expectation — the classic "
    "fabricated-data / unit-mix-up detector a DQ suite runs on any "
    "money column. The digit extraction goes through an exact "
    "BIGINT->string cast (identical in both engines, no float "
    "formatting); observed_p is the single unrounded IEEE division of "
    "exact ints (bit-identical across engines — rounding a rational "
    "is the half-boundary trap), while benford_p/deviation round at "
    "4dp per the irrational policy (log10 is transcendental). Scale: one map-side-"
    "combinable aggregate onto <=9 rows; the share window is over "
    "those 9.",
)
def dq_benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    digits = (
        load(spark, sf_dir, "orders")
        .where(F.col("o_totalprice") >= 1)
        .select(
            F.substring(
                F.floor("o_totalprice").cast("long").cast("string"), 1, 1
            )
            .cast("long")
            .alias("d")
        )
    )
    obs = digits.groupBy("d").agg(F.count(F.lit(1)).cast("long").alias("n"))
    tot = obs.agg(F.sum("n").alias("total"))
    benford_p = F.log10(1.0 + 1.0 / F.col("d"))
    return (
        obs.crossJoin(F.broadcast(tot))
        .select(
            "d",
            "n",
            # observed_p is a rational of exact ints: emit the single
            # unrounded IEEE division (bit-identical across engines);
            # round() on rationals is the half-boundary trap.
            (F.col("n").cast("double") / F.col("total")).alias(
                "observed_p"
            ),
            F.round(benford_p, 4).alias("benford_p"),
            F.round(
                F.col("n").cast("double") / F.col("total") - benford_p, 4
            ).alias("deviation"),
        )
        .orderBy("d")
    )


@staged7(
    "join_exists_flag_mark",
    oracle_sql="""
        WITH returned AS (
            SELECT DISTINCT l_orderkey FROM lineitem
            WHERE l_returnflag = 'R'
        )
        SELECT o_orderpriority,
               CAST(r.l_orderkey IS NOT NULL AS BIGINT) AS has_return,
               CAST(count(*) AS BIGINT) AS n_orders,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                    AS DOUBLE) / 100.0 AS revenue
        FROM orders o LEFT JOIN returned r
          ON o.o_orderkey = r.l_orderkey
        GROUP BY o_orderpriority, has_return
        ORDER BY o_orderpriority, has_return
    """,
    description="Mark join (existence FLAG, not existence FILTER): "
    "every order is tagged has_return without dropping or duplicating "
    "rows — the third member of the EXISTS family next to semi "
    "(join_semi / join_exists_correlated) and anti (join_anti), and "
    "the one SQL's IN/EXISTS in a SELECT list compiles to. "
    "Implemented as a left join against the pre-DISTINCTed key set, "
    "which is what makes it fan-out-safe: the distinct collapses "
    "multi-line returns BEFORE the join, so no order double-counts "
    "(the grade's revenue sum catches exactly that bug). Scale: both "
    "sides shuffle on orderkey (co-partitioned fact keys); the "
    "distinct is map-side partial.",
)
def join_exists_flag_mark(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    returned = (
        load(spark, sf_dir, "lineitem")
        .where(F.col("l_returnflag") == "R")
        .select("l_orderkey")
        .distinct()
    )
    return (
        orders.join(
            returned, orders.o_orderkey == returned.l_orderkey, "left"
        )
        .groupBy(
            "o_orderpriority",
            F.col("l_orderkey")
            .isNotNull()
            .cast("long")
            .alias("has_return"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            (
                F.sum(scaled_long("o_totalprice", 100)).cast("double")
                / 100.0
            ).alias("revenue"),
        )
        .orderBy("o_orderpriority", "has_return")
    )


@staged7(
    "win_bollinger_bands",
    oracle_sql="""
        WITH hourly AS (
            SELECT date_trunc('hour', ts) AS h,
                   sum(CAST(round(value * 100) AS BIGINT)) AS cents
            FROM events WHERE event_type = 'purchase'
            GROUP BY h
        ), roll AS (
            SELECT h, cents,
                   CAST(count(*) OVER w AS BIGINT) AS n,
                   CAST(sum(cents) OVER w AS BIGINT) AS s1,
                   CAST(sum(cents * cents) OVER w AS BIGINT) AS s2
            FROM hourly
            WINDOW w AS (ORDER BY h ROWS BETWEEN 23 PRECEDING
                         AND CURRENT ROW)
        )
        SELECT CAST(epoch_us(h) AS BIGINT) AS bucket_us,
               CAST(cents AS DOUBLE) / 100.0 AS price,
               CAST(s1 AS DOUBLE) / n / 100.0 AS mid,
               (CAST(s1 AS DOUBLE) / n
                - 2.0 * sqrt(CAST(n * s2 - s1 * s1 AS DOUBLE))
                  / n) / 100.0 AS lower_band,
               (CAST(s1 AS DOUBLE) / n
                + 2.0 * sqrt(CAST(n * s2 - s1 * s1 AS DOUBLE))
                  / n) / 100.0 AS upper_band
        FROM roll
        ORDER BY bucket_us
    """,
    description="Bollinger bands (trailing-24h mean +/- 2 population "
    "stddevs) over the hourly purchase-flow series: the rolling "
    "moments are exact int64 power sums (n, S1, S2) over a 24-row "
    "frame, and the band formula sqrt(n*S2 - S1^2)/n evaluates in one "
    "float expression per row, emitted UNROUNDED (identical IEEE ops "
    "on identical exact-int inputs are bit-identical across engines; "
    "rounding a rational like S1/n is the documented half-boundary "
    "trap) — the mergeable-moments discipline "
    "(SCALE.md 'Mergeable moments') applied to a windowed band "
    "indicator. Window input is the calendar-bounded hourly rollup "
    "(bounded rows at any data scale); S2 fits int64 to ~2e5 cents "
    "per hour x 24 comfortably (bound documented). Both engines share "
    "a 1:1 WINDOW-clause spec, so frame semantics can't drift.",
)
def win_bollinger_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    hourly = (
        load(spark, sf_dir, "events")
        .where(F.col("event_type") == "purchase")
        .groupBy(F.date_trunc("hour", "ts").alias("h"))
        .agg(F.sum(scaled_long("value", 100)).alias("cents"))
    )
    w = Window.orderBy("h").rowsBetween(-23, Window.currentRow)
    roll = hourly.select(
        "h",
        "cents",
        F.count(F.lit(1)).over(w).cast("long").alias("n"),
        F.sum("cents").over(w).cast("long").alias("s1"),
        F.sum(F.col("cents") * F.col("cents")).over(w).cast("long").alias(
            "s2"
        ),
    )
    mean = F.col("s1").cast("double") / F.col("n")
    dev = (
        2.0
        * F.sqrt(
            (F.col("n") * F.col("s2") - F.col("s1") * F.col("s1")).cast(
                "double"
            )
        )
        / F.col("n")
    )
    # No round(): every term derives from exact int64 sums via identical
    # IEEE ops on both engines, so the doubles are bit-identical; round()
    # would REINTRODUCE divergence (Spark rounds the shortest decimal
    # repr, DuckDB the binary value — they disagree ON the half
    # boundary, which rationals like S1/n actually hit; caught live at
    # sf0.001: 47.75375 -> 47.7538 vs 47.7537).
    return roll.select(
        F.unix_micros("h").alias("bucket_us"),
        (F.col("cents").cast("double") / 100.0).alias("price"),
        (mean / 100.0).alias("mid"),
        ((mean - dev) / 100.0).alias("lower_band"),
        ((mean + dev) / 100.0).alias("upper_band"),
    ).orderBy("bucket_us")


@staged7(
    "win_drawdown_duration",
    oracle_sql="""
        WITH daily AS (
            SELECT date_trunc('day', ts) AS d,
                   sum(CAST(round(value * 100) AS BIGINT)) AS cents
            FROM events WHERE event_type = 'purchase'
            GROUP BY d
        ), runs AS (
            SELECT d, cents,
                   max(cents) OVER w AS run_max
            FROM daily
            WINDOW w AS (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING
                         AND CURRENT ROW)
        ), peaks AS (
            SELECT d, cents, run_max,
                   max(CASE WHEN cents = run_max THEN d END) OVER w
                       AS last_peak_d
            FROM runs
            WINDOW w AS (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING
                         AND CURRENT ROW)
        )
        SELECT CAST(epoch_us(d) AS BIGINT) AS day_us,
               CAST(cents AS DOUBLE) / 100.0 AS flow,
               CAST(datediff('day', last_peak_d, d) AS BIGINT)
                   AS days_since_peak,
               CAST(run_max - cents AS BIGINT) AS drawdown_cents
        FROM peaks
        ORDER BY day_us
    """,
    description="Drawdown DURATION: per day, how long since the daily "
    "purchase flow last touched its running maximum, plus the current "
    "drawdown depth in exact cents — the time dimension "
    "win_drawdown_max's magnitude-only view misses (a shallow "
    "6-month drawdown and a deep 2-day one read very differently). "
    "The last-peak day is itself a windowed max over a CASE — no "
    "self-join, no recursion — and every graded value is an int64 "
    "(day difference, cents). Windows run over the calendar day "
    "grain; both engines share the WINDOW-clause spec 1:1.",
)
def win_drawdown_duration(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = (
        load(spark, sf_dir, "events")
        .where(F.col("event_type") == "purchase")
        .groupBy(F.date_trunc("day", "ts").alias("d"))
        .agg(F.sum(scaled_long("value", 100)).alias("cents"))
    )
    w = Window.orderBy("d").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    runs = daily.select(
        "d", "cents", F.max("cents").over(w).alias("run_max")
    )
    peaks = runs.select(
        "d",
        "cents",
        "run_max",
        F.max(
            F.when(F.col("cents") == F.col("run_max"), F.col("d"))
        )
        .over(w)
        .alias("last_peak_d"),
    )
    return peaks.select(
        F.unix_micros("d").alias("day_us"),
        (F.col("cents").cast("double") / 100.0).alias("flow"),
        F.datediff("d", "last_peak_d").cast("long").alias(
            "days_since_peak"
        ),
        (F.col("run_max") - F.col("cents")).cast("long").alias(
            "drawdown_cents"
        ),
    ).orderBy("day_us")
