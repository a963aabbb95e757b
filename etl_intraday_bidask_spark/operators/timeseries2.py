"""Market-microstructure and time-series pattern operators, wave 2
(SURVEY.md §2.27): order-flow imbalance, LOCF gap filling onto an
hourly grid, negative-pattern CEP (click never answered by a
purchase), rolling correlation from integer power sums, V-shape
reversal detection, and quote-staleness monitoring — the intraday
bid/ask analytics the reference pipeline family is named for,
re-expressed as window/aggregate plans.

Scale notes: every per-user window (OFI deltas, staleness gaps, LOCF)
shares ONE user_id hash partitioning with the aggregate that follows
it; the LOCF grid is |users|×|hours| rows built from a broadcast
~720-row hour spine — linear in users, never a range join; the
absence-CEP sorts each user's merged click/purchase stream once and
answers the negative pattern with a forward-looking first() frame (no
self-join, no re-scan); rolling correlation and V-shape run on POST-
aggregate series (≤ |hours| / |days| rows — bounded regardless of
event volume), which is why their global-order windows are safe: the
window input is the aggregate, not the events.

Parity notes: all money flows as exact cents (BIGINT), all time as
unix microseconds (BIGINT); rolling-correlation power sums accumulate
as BIGINTs (hourly cent sums ~1e7 ⇒ squares ~1e14, ×24 well inside
int64) and the correlation/average are single float chains over exact
integers, rounded 4dp; V-bottom strictness compares via integer
cross-multiplication (sum·n' < sum'·n), so no float ever touches a
rule boundary; window order keys always carry the event_id tie-break.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from etl_intraday_bidask_spark.functions.parity import scaled_long
from etl_intraday_bidask_spark.registry import register
from etl_intraday_bidask_spark.tables import load


@register(
    "bidask_ofi_hourly",
    oracle_sql="""
        WITH q AS (
            SELECT user_id, ts, event_id,
                   CAST(round(value * 100) AS BIGINT) AS cents,
                   lag(CAST(round(value * 100) AS BIGINT)) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS prev_cents
            FROM events WHERE event_type = 'view'
        )
        SELECT CAST(epoch_us(date_trunc('hour', ts)) AS BIGINT) AS bucket_us,
               CAST(count(*) AS BIGINT) AS n_updates,
               CAST(sum(cents - prev_cents) AS BIGINT) AS ofi_cents,
               CAST(sum(CASE WHEN cents > prev_cents THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_up,
               CAST(sum(CASE WHEN cents < prev_cents THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_down
        FROM q
        WHERE prev_cents IS NOT NULL
        GROUP BY 1
        ORDER BY 1
    """,
    description="Hourly order-flow imbalance: per-user quote-update "
    "deltas (view events as quote stream, exact cents, lag over the "
    "(ts, event_id)-ordered user partition) aggregated per hour into "
    "net signed flow and up/down tick counts — the microstructure "
    "pressure signal that leads short-horizon price moves. One "
    "user_id exchange for the lag window, then a map-side-combined "
    "hour aggregate; all arithmetic exact BIGINTs.",
)
def bidask_ofi_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    q = (
        load(spark, sf_dir, "events")
        .where(F.col("event_type") == "view")
        .select(
            "user_id",
            "ts",
            "event_id",
            scaled_long("value", 100).alias("cents"),
        )
        .withColumn("prev_cents", F.lag("cents").over(w))
        .where(F.col("prev_cents").isNotNull())
    )
    return (
        q.groupBy(
            F.unix_micros(F.date_trunc("hour", "ts")).alias("bucket_us")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_updates"),
            F.sum(F.col("cents") - F.col("prev_cents"))
            .cast("long")
            .alias("ofi_cents"),
            F.sum(F.when(F.col("cents") > F.col("prev_cents"), 1).otherwise(0))
            .cast("long")
            .alias("n_up"),
            F.sum(F.when(F.col("cents") < F.col("prev_cents"), 1).otherwise(0))
            .cast("long")
            .alias("n_down"),
        )
        .orderBy("bucket_us")
    )


@register(
    "win_gap_fill_locf",
    oracle_sql="""
        WITH v AS (
            SELECT user_id, ts,
                   CAST(round(value * 100) AS BIGINT) AS cents,
                   row_number() OVER (PARTITION BY user_id, ts
                                      ORDER BY event_id DESC) AS rn
            FROM events WHERE event_type = 'view'
        ),
        vd AS (SELECT user_id, ts, cents FROM v WHERE rn = 1),
        hours AS (
            SELECT DISTINCT date_trunc('hour', ts) AS h FROM events
        ),
        users AS (SELECT DISTINCT user_id FROM vd),
        grid AS (SELECT u.user_id, h.h FROM users u CROSS JOIN hours h)
        SELECT g.user_id,
               CAST(epoch_us(g.h) AS BIGINT) AS bucket_us,
               vd.cents AS locf_cents
        FROM grid g
        ASOF JOIN vd ON g.user_id = vd.user_id AND g.h >= vd.ts
        ORDER BY g.user_id, bucket_us
    """,
    description="Last-observation-carried-forward quote fill onto the "
    "hourly grid: each (user, hour-start) cell takes the user's latest "
    "quote at-or-before that instant — the step-function (not "
    "interpolated: densify_interpolate_linear's twin) regularization "
    "that turns an irregular quote stream into an aligned panel for "
    "factor models. Same-timestamp quote duplicates pre-dedup to the "
    "max-event_id row on BOTH engines so the carried value is well-"
    "defined. The ~720-row hour spine broadcasts against the user "
    "dim (grid is linear in users), grid markers union with quotes, "
    "and one last(ignorenulls) pass over each user's ordered stream "
    "fills every cell — the oracle is DuckDB's native ASOF join.",
)
def win_gap_fill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    dd = Window.partitionBy("user_id", "ts").orderBy(F.col("event_id").desc())
    vd = (
        ev.where(F.col("event_type") == "view")
        .select(
            "user_id", "ts", "event_id", scaled_long("value", 100).alias("cents")
        )
        .withColumn("rn", F.row_number().over(dd))
        .where(F.col("rn") == 1)
    )
    hours = ev.select(F.date_trunc("hour", "ts").alias("h")).distinct()
    users = vd.select("user_id").distinct()
    grid = users.crossJoin(F.broadcast(hours)).select(
        "user_id",
        F.col("h").alias("ts"),
        F.lit(None).cast("long").alias("cents"),
        F.lit(1).alias("is_marker"),
    )
    quotes = vd.select(
        "user_id", "ts", "cents", F.lit(0).alias("is_marker")
    )
    # Quote sorts BEFORE the marker at an equal timestamp: a quote landing
    # exactly on the hour is carried into that hour (at-or-before), the
    # same convention as the oracle's ASOF `>=`.
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_marker")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        quotes.unionByName(grid)
        .withColumn("locf_cents", F.last("cents", ignorenulls=True).over(w))
        .where((F.col("is_marker") == 1) & F.col("locf_cents").isNotNull())
        .select(
            "user_id",
            F.unix_micros("ts").alias("bucket_us"),
            "locf_cents",
        )
        .orderBy("user_id", "bucket_us")
    )


@register(
    "cep_pattern_absence",
    oracle_sql="""
        WITH c AS (
            SELECT event_id, user_id, ts FROM events
            WHERE event_type = 'click'
        )
        SELECT user_id,
               CAST(count(*) AS BIGINT) AS n_clicks,
               CAST(sum(CASE WHEN NOT EXISTS (
                   SELECT 1 FROM events p
                   WHERE p.event_type = 'purchase'
                     AND p.user_id = c.user_id
                     AND p.ts > c.ts
                     AND p.ts <= c.ts + INTERVAL 30 MINUTE
               ) THEN 1 ELSE 0 END) AS BIGINT) AS n_unanswered
        FROM c
        GROUP BY user_id
        ORDER BY user_id
    """,
    description="Negative-pattern CEP: clicks that are NEVER followed "
    "by a purchase within 30 minutes (strictly after, inclusive "
    "bound) — the absence detection (abandonment, missed-fill alarm) "
    "that funnel operators can't express because nothing arrives to "
    "trigger on. Each user's merged click/purchase stream sorts once; "
    "purchases order BEFORE clicks at an equal timestamp, so a "
    "forward-looking first(ignorenulls) frame sees exactly the "
    "strictly-later purchases, and the 30-minute bound is a BIGINT "
    "microsecond comparison. One user exchange, no self-join, no "
    "correlated re-scan — the oracle is the literal NOT EXISTS.",
)
def cep_pattern_absence(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Round-11 re-plan (the join_asof_bidask class): the former
    # UNION ALL of two filtered scans read events twice; ONE scan with
    # event_type IN pushed to Parquet and CASE side columns produces
    # the identical row set reading the fact table once. Clicks sort
    # AFTER purchases at equal ts (side 1 > 0), unchanged.
    both = (
        load(spark, sf_dir, "events")
        .where(F.col("event_type").isin("click", "purchase"))
        .select(
            "user_id",
            "ts",
            "event_id",
            F.when(
                F.col("event_type") == "purchase", F.unix_micros("ts")
            ).alias("purchase_us"),
            F.when(F.col("event_type") == "click", 1)
            .otherwise(0)
            .alias("side"),
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "side", "event_id")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    merged = (
        both
        .withColumn(
            "next_purchase_us",
            F.first("purchase_us", ignorenulls=True).over(w),
        )
        .where(F.col("side") == 1)
    )
    unanswered = F.col("next_purchase_us").isNull() | (
        F.col("next_purchase_us") > F.unix_micros("ts") + 30 * 60 * 1000000
    )
    return (
        merged.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_clicks"),
            F.sum(F.when(unanswered, 1).otherwise(0))
            .cast("long")
            .alias("n_unanswered"),
        )
        .orderBy("user_id")
    )


@register(
    "win_rolling_corr_24h",
    oracle_sql="""
        WITH hourly AS (
            SELECT date_trunc('hour', ts) AS h,
                   sum(CASE WHEN event_type = 'view'
                            THEN CAST(round(value * 100) AS BIGINT)
                            ELSE 0 END) AS x,
                   sum(CASE WHEN event_type = 'purchase'
                            THEN CAST(round(value * 100) AS BIGINT)
                            ELSE 0 END) AS y
            FROM events
            WHERE event_type IN ('view', 'purchase')
            GROUP BY 1
        ),
        win AS (
            SELECT h, x, y,
                   CAST(count(*) OVER w AS BIGINT) AS n,
                   sum(x) OVER w AS sx, sum(y) OVER w AS sy,
                   sum(x * y) OVER w AS sxy,
                   sum(x * x) OVER w AS sxx,
                   sum(y * y) OVER w AS syy
            FROM hourly
            WINDOW w AS (ORDER BY h ROWS BETWEEN 23 PRECEDING
                         AND CURRENT ROW)
        )
        SELECT CAST(epoch_us(h) AS BIGINT) AS bucket_us, n AS n_win,
               CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
                    THEN round((CAST(n AS DOUBLE) * sxy
                                - CAST(sx AS DOUBLE) * sy)
                               / sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                               / sqrt(CAST(n * syy - sy * sy AS DOUBLE)), 4)
                    ELSE NULL END AS corr_xy
        FROM win
        ORDER BY bucket_us
    """,
    description="Rolling 24-bucket correlation between hourly quote "
    "flow (view cents) and trade flow (purchase cents): power sums "
    "n, Σx, Σy, Σxy, Σx², Σy² accumulate as exact BIGINTs over a "
    "trailing 24-row frame and Pearson r is ONE float chain over "
    "them — the mergeable-moments trick that makes rolling "
    "correlation exact and order-independent (a naive rolling corr() "
    "drifts with summation order). The window input is the POST-"
    "aggregate hourly series (≤ |hours| rows, bounded regardless of "
    "event volume), which is why the global order is safe; zero-"
    "variance windows yield NULL on both engines.",
)
def win_rolling_corr_24h(spark: SparkSession, sf_dir: str) -> DataFrame:
    cents = scaled_long("value", 100)
    hourly = (
        load(spark, sf_dir, "events")
        .where(F.col("event_type").isin("view", "purchase"))
        .groupBy(F.date_trunc("hour", "ts").alias("h"))
        .agg(
            F.sum(
                F.when(F.col("event_type") == "view", cents).otherwise(0)
            ).alias("x"),
            F.sum(
                F.when(F.col("event_type") == "purchase", cents).otherwise(0)
            ).alias("y"),
        )
    )
    w = Window.orderBy("h").rowsBetween(-23, Window.currentRow)
    win = hourly.select(
        "h",
        F.count(F.lit(1)).over(w).cast("long").alias("n"),
        F.sum("x").over(w).alias("sx"),
        F.sum("y").over(w).alias("sy"),
        F.sum(F.col("x") * F.col("y")).over(w).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).over(w).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).over(w).alias("syy"),
    )
    dx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    dy = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    corr = F.when(
        (dx > 0) & (dy > 0),
        F.round(
            (
                F.col("n").cast("double") * F.col("sxy")
                - F.col("sx").cast("double") * F.col("sy")
            )
            / F.sqrt(dx.cast("double"))
            / F.sqrt(dy.cast("double")),
            4,
        ),
    )
    return win.select(
        F.unix_micros("h").alias("bucket_us"),
        F.col("n").alias("n_win"),
        corr.alias("corr_xy"),
    ).orderBy("bucket_us")


@register(
    "win_pattern_vshape",
    oracle_sql="""
        WITH daily AS (
            SELECT date_trunc('day', ts) AS d,
                   sum(CAST(round(value * 100) AS BIGINT)) AS sum_c,
                   CAST(count(*) AS BIGINT) AS n
            FROM events WHERE event_type = 'purchase'
            GROUP BY 1
        ),
        lagged AS (
            SELECT d, sum_c, n,
                   lag(sum_c) OVER (ORDER BY d) AS sum_p,
                   lag(n) OVER (ORDER BY d) AS n_p,
                   lead(sum_c) OVER (ORDER BY d) AS sum_n,
                   lead(n) OVER (ORDER BY d) AS n_n
            FROM daily
        )
        SELECT CAST(d AS DATE) AS d,
               CAST(sum_c AS DOUBLE) / n / 100.0 AS avg_price,
               (CAST(sum_p AS DOUBLE) / n_p
                + CAST(sum_n AS DOUBLE) / n_n) / 2.0 / 100.0
               - CAST(sum_c AS DOUBLE) / n / 100.0 AS depth
        FROM lagged
        WHERE sum_p IS NOT NULL AND sum_n IS NOT NULL
          AND sum_c * n_p < sum_p * n
          AND sum_c * n_n < sum_n * n
        ORDER BY d
    """,
    description="V-shape reversal detection (MATCH_RECOGNIZE-style "
    "pattern as lag/lead chains): days whose average purchase price "
    "sits strictly below BOTH neighbors, with the reversal depth "
    "(neighbor midpoint minus bottom). Strictness compares day "
    "averages via integer cross-multiplication (sum·n' < sum'·n over "
    "exact cent sums and counts) so no float touches the pattern "
    "boundary; depth is one float chain over the same exact integers. "
    "The lag/lead window runs on the POST-aggregate daily series "
    "(≤ |days| rows — bounded), the standard shape for pattern "
    "windows over rollups.",
)
def win_pattern_vshape(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = (
        load(spark, sf_dir, "events")
        .where(F.col("event_type") == "purchase")
        .groupBy(F.date_trunc("day", "ts").alias("d"))
        .agg(
            F.sum(scaled_long("value", 100)).alias("sum_c"),
            F.count(F.lit(1)).cast("long").alias("n"),
        )
    )
    w = Window.orderBy("d")
    lagged = daily.select(
        "d",
        "sum_c",
        "n",
        F.lag("sum_c").over(w).alias("sum_p"),
        F.lag("n").over(w).alias("n_p"),
        F.lead("sum_c").over(w).alias("sum_n"),
        F.lead("n").over(w).alias("n_n"),
    )
    avg_price = F.col("sum_c").cast("double") / F.col("n") / 100.0
    depth = (
        (
            F.col("sum_p").cast("double") / F.col("n_p")
            + F.col("sum_n").cast("double") / F.col("n_n")
        )
        / 2.0
        / 100.0
        - avg_price
    )
    return (
        lagged.where(
            F.col("sum_p").isNotNull()
            & F.col("sum_n").isNotNull()
            & (F.col("sum_c") * F.col("n_p") < F.col("sum_p") * F.col("n"))
            & (F.col("sum_c") * F.col("n_n") < F.col("sum_n") * F.col("n"))
        )
        .select(
            F.to_date("d").alias("d"),
            # Unrounded rationals of exact cent ints (half-boundary trap).
            avg_price.alias("avg_price"),
            depth.alias("depth"),
        )
        .orderBy("d")
    )


@register(
    "bidask_quote_staleness",
    oracle_sql="""
        WITH q AS (
            SELECT user_id,
                   epoch_us(ts) - lag(epoch_us(ts)) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS gap_us
            FROM events WHERE event_type = 'view'
        )
        SELECT user_id,
               CAST(count(*) AS BIGINT) AS n_gaps,
               CAST(max(gap_us) AS BIGINT) AS max_gap_us,
               CAST(sum(gap_us) AS DOUBLE) / count(*) / 1000000.0
                   AS avg_gap_s
        FROM q
        WHERE gap_us IS NOT NULL
        GROUP BY user_id
        ORDER BY user_id
    """,
    description="Quote staleness per user: microsecond gaps between "
    "consecutive quote updates (lag over the (ts, event_id)-ordered "
    "user partition), reporting gap count, worst staleness, and mean "
    "gap — the data-liveness SLA monitor for a quote feed (a user "
    "whose max gap blows out is a stale book). Exact BIGINT "
    "microsecond arithmetic end to end, one user exchange shared by "
    "the window and the aggregate, one final division rounded 4dp.",
)
def bidask_quote_staleness(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    q = (
        load(spark, sf_dir, "events")
        .where(F.col("event_type") == "view")
        .select(
            "user_id",
            (F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)).alias(
                "gap_us"
            ),
        )
        .where(F.col("gap_us").isNotNull())
    )
    return (
        q.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_gaps"),
            F.max("gap_us").cast("long").alias("max_gap_us"),
            # Unrounded rational of exact microsecond ints
            # (half-boundary trap).
            (
                F.sum("gap_us").cast("double")
                / F.count(F.lit(1))
                / 1000000.0
            ).alias("avg_gap_s"),
        )
        .orderBy("user_id")
    )
