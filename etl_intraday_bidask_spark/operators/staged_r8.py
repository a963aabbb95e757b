"""STAGED round-8 operators (wave D seeds) — implemented and
parity-tested, NOT registered, NOT part of the round-6 (wave B) or
round-7 (wave C) activation windows.

Theme: the ML-evaluation and feature-engineering surface a
training-data engine needs once models consume its output — exact
ROC-AUC from integer rank algebra, threshold sweeps, calibration
tables, multi-horizon feature windows — plus cross-op integral
identities. Same staging contract and house discipline as
``staged_r6/7`` (own ``STAGED_R8`` dict + leak guard).

Labels/scores are synthesized deterministically from the events
fixture: purchases are the positive class, views the negative, and the
trade value (exact cents) is the score — a monotone, replayable
stand-in for a model score that makes every metric exactly
reconstructible by the oracle.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from etl_intraday_bidask_spark.functions.parity import scaled_long
from etl_intraday_bidask_spark.registry import QuerySpec, SparkFn
from etl_intraday_bidask_spark.tables import load

STAGED_R8: dict[str, QuerySpec] = {}


def staged8(name: str, oracle_sql: str | None, description: str = ""):
    def deco(fn: SparkFn) -> SparkFn:
        STAGED_R8[name] = QuerySpec(name, fn, oracle_sql, description)
        return fn

    return deco


@staged8(
    "eval_auc_exact",
    oracle_sql="""
        WITH scored AS (
            SELECT CAST(round(value * 100) AS BIGINT) AS s,
                   CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END
                       AS y
            FROM events WHERE event_type IN ('purchase', 'view')
        ), per_score AS (
            SELECT s,
                   CAST(sum(y) AS BIGINT) AS n_pos_s,
                   CAST(count(*) - sum(y) AS BIGINT) AS n_neg_s
            FROM scored GROUP BY s
        ), cum AS (
            SELECT s, n_pos_s, n_neg_s,
                   coalesce(sum(n_neg_s) OVER (
                       ORDER BY s
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ), 0) AS neg_below
            FROM per_score
        ), u AS (
            SELECT CAST(sum(n_pos_s * (2 * neg_below + n_neg_s))
                        AS BIGINT) AS u2,
                   CAST(sum(n_pos_s) AS BIGINT) AS n_pos,
                   CAST(sum(n_neg_s) AS BIGINT) AS n_neg
            FROM cum
        )
        SELECT n_pos, n_neg, u2,
               CAST(u2 AS DOUBLE) / 2.0 / n_pos / n_neg AS auc
        FROM u
    """,
    description="Exact ROC-AUC by integer rank algebra: AUC is the "
    "probability a random positive outranks a random negative (ties "
    "count half), computed WITHOUT any global ranking of rows — per "
    "distinct score, positive/negative counts plus the cumulative "
    "negatives strictly below give 2U = sum(n_pos_s * (2*neg_below + "
    "n_neg_s)), an exact int64, and AUC = U / (n_pos*n_neg) is one "
    "unrounded division. The doubled-U trick keeps the tie "
    "half-credit integral, so no float participates in the "
    "statistic. Scale: the heavy reduction is per-score (the score "
    "GRID bounds the window input, not the row count — the same "
    "calendar-bounded-window argument, applied to a value grid); at "
    "a continuous-score 100 TB the grid comes from quantized scores, "
    "which is how exact distributed AUC is actually computed.",
)
def eval_auc_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    scored = (
        load(spark, sf_dir, "events")
        .where(F.col("event_type").isin("purchase", "view"))
        .select(
            scaled_long("value", 100).alias("s"),
            F.when(F.col("event_type") == "purchase", 1)
            .otherwise(0)
            .alias("y"),
        )
    )
    per_score = scored.groupBy("s").agg(
        F.sum("y").cast("long").alias("n_pos_s"),
        (F.count(F.lit(1)) - F.sum("y")).cast("long").alias("n_neg_s"),
    )
    w = Window.orderBy("s").rowsBetween(Window.unboundedPreceding, -1)
    cum = per_score.select(
        "n_pos_s",
        "n_neg_s",
        F.coalesce(F.sum("n_neg_s").over(w), F.lit(0)).alias("neg_below"),
    )
    u = cum.agg(
        F.sum(
            F.col("n_pos_s")
            * (2 * F.col("neg_below") + F.col("n_neg_s"))
        )
        .cast("long")
        .alias("u2"),
        F.sum("n_pos_s").cast("long").alias("n_pos"),
        F.sum("n_neg_s").cast("long").alias("n_neg"),
    )
    return u.select(
        "n_pos",
        "n_neg",
        "u2",
        (
            F.col("u2").cast("double")
            / 2.0
            / F.col("n_pos")
            / F.col("n_neg")
        ).alias("auc"),
    )


@staged8(
    "eval_threshold_sweep",
    oracle_sql="""
        WITH scored AS (
            SELECT CAST(round(value * 100) AS BIGINT) AS s,
                   CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END
                       AS y
            FROM events WHERE event_type IN ('purchase', 'view')
        ), t(thr) AS (VALUES (1000), (5000), (10000), (20000)),
        cells AS (
            SELECT t.thr,
                   CAST(sum(CASE WHEN s >= t.thr AND y = 1
                            THEN 1 ELSE 0 END) AS BIGINT) AS tp,
                   CAST(sum(CASE WHEN s >= t.thr AND y = 0
                            THEN 1 ELSE 0 END) AS BIGINT) AS fp,
                   CAST(sum(y) AS BIGINT) AS n_pos
            FROM scored, t
            GROUP BY t.thr
        )
        SELECT CAST(thr AS BIGINT) AS threshold_cents, tp, fp,
               CAST(CASE WHEN tp + fp > 0
                         THEN tp * 10000 // (tp + fp) END AS BIGINT)
                   AS precision_floor_bp,
               CAST(tp * 10000 // n_pos AS BIGINT) AS recall_floor_bp
        FROM cells
        ORDER BY threshold_cents
    """,
    description="Classifier threshold sweep: TP/FP and exact "
    "floor-basis-point precision/recall at four score thresholds, "
    "computed as ONE conditional aggregate over the scored stream "
    "(the threshold dim is a 4-row broadcast; no per-threshold "
    "rescans) — the operating-point table behind every "
    "precision/recall tradeoff decision. Zero-prediction thresholds "
    "emit NULL precision on both engines. All graded values are "
    "int64; no float rate is ever rounded.",
)
def eval_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    scored = (
        load(spark, sf_dir, "events")
        .where(F.col("event_type").isin("purchase", "view"))
        .select(
            scaled_long("value", 100).alias("s"),
            F.when(F.col("event_type") == "purchase", 1)
            .otherwise(0)
            .alias("y"),
        )
    )
    thr = spark.createDataFrame(
        [(1000,), (5000,), (10000,), (20000,)], ["thr"]
    )
    cells = (
        scored.crossJoin(F.broadcast(thr))
        .groupBy("thr")
        .agg(
            F.sum(
                F.when((F.col("s") >= F.col("thr")) & (F.col("y") == 1), 1)
                .otherwise(0)
            )
            .cast("long")
            .alias("tp"),
            F.sum(
                F.when((F.col("s") >= F.col("thr")) & (F.col("y") == 0), 1)
                .otherwise(0)
            )
            .cast("long")
            .alias("fp"),
            F.sum("y").cast("long").alias("n_pos"),
        )
    )
    return cells.select(
        F.col("thr").cast("long").alias("threshold_cents"),
        "tp",
        "fp",
        F.expr(
            "case when tp + fp > 0 then tp * 10000 div (tp + fp) end"
        )
        .cast("long")
        .alias("precision_floor_bp"),
        F.expr("tp * 10000 div n_pos").cast("long").alias(
            "recall_floor_bp"
        ),
    ).orderBy("threshold_cents")


@staged8(
    "eval_calibration_bins",
    oracle_sql="""
        WITH scored AS (
            SELECT least(CAST(round(value * 100) AS BIGINT) // 5000, 9)
                       AS bin,
                   CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END
                       AS y
            FROM events WHERE event_type IN ('purchase', 'view')
        )
        SELECT CAST(bin AS BIGINT) AS score_bin,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(y) AS BIGINT) AS n_pos,
               CAST(sum(y) * 10000 // count(*) AS BIGINT)
                   AS empirical_rate_floor_bp
        FROM scored
        GROUP BY bin
        ORDER BY score_bin
    """,
    description="Calibration table: scores bucketed into fixed $50 "
    "bins (capped at 9), each bin's observed positive rate in exact "
    "floor basis points — the reliability-diagram input that says "
    "whether a score of X actually means P(positive) = f(X), the "
    "property threshold decisions silently assume. A monotone "
    "empirical_rate curve here is the sanity check; plotting it "
    "against any claimed probability mapping gives the calibration "
    "error. One map-side-combinable aggregate; all int64.",
)
def eval_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    scored = (
        load(spark, sf_dir, "events")
        .where(F.col("event_type").isin("purchase", "view"))
        .select(
            F.least(
                F.expr("floor(value * 100 + 0.5) div 5000").cast("long"),
                F.lit(9),
            ).alias("bin"),
            F.when(F.col("event_type") == "purchase", 1)
            .otherwise(0)
            .alias("y"),
        )
    )
    return (
        scored.groupBy(F.col("bin").cast("long").alias("score_bin"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("y").cast("long").alias("n_pos"),
            F.expr("sum(y) * 10000 div count(*)")
            .cast("long")
            .alias("empirical_rate_floor_bp"),
        )
        .orderBy("score_bin")
    )


@staged8(
    "feature_multi_horizon",
    oracle_sql="""
        WITH ev AS (
            SELECT user_id, ts, event_id,
                   CAST(epoch(ts) AS BIGINT) AS tsec,
                   CAST(round(value * 100) AS BIGINT) AS cents
            FROM events
        )
        SELECT user_id, CAST(epoch_us(ts) AS BIGINT) AS ts_us,
               CAST(count(*) OVER w1 AS BIGINT) AS n_1h,
               CAST(sum(cents) OVER w1 AS BIGINT) AS cents_1h,
               CAST(count(*) OVER w6 AS BIGINT) AS n_6h,
               CAST(sum(cents) OVER w6 AS BIGINT) AS cents_6h,
               CAST(count(*) OVER w24 AS BIGINT) AS n_24h,
               CAST(sum(cents) OVER w24 AS BIGINT) AS cents_24h
        FROM ev
        WHERE user_id < 5
        WINDOW
            w1 AS (PARTITION BY user_id ORDER BY tsec
                   RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW),
            w6 AS (PARTITION BY user_id ORDER BY tsec
                   RANGE BETWEEN 21600 PRECEDING AND CURRENT ROW),
            w24 AS (PARTITION BY user_id ORDER BY tsec
                    RANGE BETWEEN 86400 PRECEDING AND CURRENT ROW)
        ORDER BY user_id, ts_us, n_1h
    """,
    description="Multi-horizon feature windows: per event, trailing "
    "1h/6h/24h activity counts and exact cent sums per user — the "
    "point-in-time feature vector a real-time model consumes, with "
    "every horizon guaranteed leak-free (RANGE frames end at CURRENT "
    "ROW; nothing future-dated contributes). The three event-time "
    "RANGE frames share ONE partition+sort (same user_id/tsec spec), "
    "so Catalyst computes all horizons in a single Window over a "
    "single Exchange — adding a horizon is free at plan level, the "
    "property that makes wide feature stores tractable. Note the "
    "duplicate-timestamp subtlety graded here: RANGE frames include "
    "ALL peer rows at the same tsec on both engines, so same-second "
    "events see each other symmetrically — the deterministic "
    "convention (output additionally sorts on n_1h so peer rows "
    "order stably). Output restricted to 5 users for grading size.",
)
def feature_multi_horizon(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        F.unix_seconds("ts").alias("tsec"),
        scaled_long("value", 100).alias("cents"),
    )

    def frame(secs):
        return (
            Window.partitionBy("user_id")
            .orderBy("tsec")
            .rangeBetween(-secs, 0)
        )

    out = ev.where(F.col("user_id") < 5).select(
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        F.count(F.lit(1)).over(frame(3600)).cast("long").alias("n_1h"),
        F.sum("cents").over(frame(3600)).cast("long").alias("cents_1h"),
        F.count(F.lit(1)).over(frame(21600)).cast("long").alias("n_6h"),
        F.sum("cents").over(frame(21600)).cast("long").alias("cents_6h"),
        F.count(F.lit(1)).over(frame(86400)).cast("long").alias("n_24h"),
        F.sum("cents").over(frame(86400)).cast("long").alias("cents_24h"),
    )
    return out.orderBy("user_id", "ts_us", "n_1h")


@staged8(
    "orders_little_law_identity",
    oracle_sql="""
        WITH spans AS (
            SELECT o_orderkey,
                   date_trunc('day', o_orderdate) AS start_d,
                   date_trunc('day', max(l_shipdate)) AS end_d
            FROM orders JOIN lineitem ON o_orderkey = l_orderkey
            GROUP BY o_orderkey, o_orderdate
        ), durations AS (
            SELECT CAST(sum(datediff('day', start_d, end_d) + 1)
                        AS BIGINT) AS total_open_days,
                   CAST(count(*) AS BIGINT) AS n_orders
            FROM spans
        ), deltas AS (
            SELECT start_d AS d, 1 AS delta FROM spans
            UNION ALL
            SELECT end_d + INTERVAL 1 DAY, -1 FROM spans
        ), per_day AS (
            SELECT d, sum(delta) AS net FROM deltas GROUP BY d
        ), swept AS (
            SELECT d, sum(net) OVER (ORDER BY d) AS open_now,
                   lead(d) OVER (ORDER BY d) AS next_d
            FROM per_day
        ), integral AS (
            SELECT CAST(sum(open_now *
                            datediff('day', d, next_d)) AS BIGINT)
                       AS sweep_open_days
            FROM swept WHERE next_d IS NOT NULL
        )
        SELECT du.n_orders, du.total_open_days, i.sweep_open_days,
               CAST(du.total_open_days = i.sweep_open_days AS BIGINT)
                   AS identity_holds
        FROM durations du, integral i
    """,
    description="Little's-law integral identity as a cross-check: the "
    "total open-order-days computed from per-order DURATIONS must "
    "exactly equal the time-integral of the sweep-line concurrency "
    "curve (sum of open_count x days-at-that-count over the "
    "piecewise-constant segments) — two INDEPENDENT computations of "
    "the same quantity (L*T = sum of W, the accounting form of "
    "Little's law), so a single off-by-one in either the duration "
    "arithmetic or the sweep's +1/-1 boundary handling breaks the "
    "graded equality. Integer day arithmetic throughout; the sweep "
    "reuses agg_concurrent_intervals' calendar-bounded plan with a "
    "lead() to close each constant segment.",
)
def orders_little_law_identity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", F.date_trunc("day", "o_orderdate").alias("start_d")
    )
    lineitem = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate"
    )
    spans = (
        orders.join(lineitem, orders.o_orderkey == lineitem.l_orderkey)
        .groupBy("o_orderkey", "start_d")
        .agg(F.date_trunc("day", F.max("l_shipdate")).alias("end_d"))
    )
    durations = spans.agg(
        F.sum(F.datediff("end_d", "start_d") + 1)
        .cast("long")
        .alias("total_open_days"),
        F.count(F.lit(1)).cast("long").alias("n_orders"),
    )
    deltas = spans.select(
        F.col("start_d").alias("d"), F.lit(1).alias("delta")
    ).unionByName(
        spans.select(
            (F.col("end_d") + F.expr("INTERVAL 1 DAY")).alias("d"),
            F.lit(-1).alias("delta"),
        )
    )
    per_day = deltas.groupBy("d").agg(F.sum("delta").alias("net"))
    w = Window.orderBy("d")
    swept = per_day.select(
        "d",
        F.sum("net").over(w).alias("open_now"),
        F.lead("d").over(w).alias("next_d"),
    )
    integral = swept.where(F.col("next_d").isNotNull()).agg(
        F.sum(F.col("open_now") * F.datediff("next_d", "d"))
        .cast("long")
        .alias("sweep_open_days")
    )
    return durations.crossJoin(F.broadcast(integral)).select(
        "n_orders",
        "total_open_days",
        "sweep_open_days",
        (F.col("total_open_days") == F.col("sweep_open_days"))
        .cast("long")
        .alias("identity_holds"),
    )


@staged8(
    "graph_two_hop_reach",
    oracle_sql="""
        WITH buckets AS (
            SELECT DISTINCT date_trunc('hour', ts) AS h, user_id
            FROM events WHERE event_type = 'purchase'
        ), edges AS (
            SELECT DISTINCT a.user_id AS u, b.user_id AS v
            FROM buckets a JOIN buckets b
              ON a.h = b.h AND a.user_id < b.user_id
        ), adj AS (
            SELECT u AS x, v AS nbr FROM edges
            UNION ALL SELECT v, u FROM edges
        ), two_hop AS (
            SELECT DISTINCT a.x, b.nbr AS r
            FROM adj a JOIN adj b ON a.nbr = b.x
            WHERE b.nbr <> a.x
            UNION
            SELECT x, nbr FROM adj
        ), reach AS (
            SELECT x, CAST(count(*) AS BIGINT) AS n_reach
            FROM two_hop GROUP BY x
        )
        SELECT n_reach,
               CAST(count(*) AS BIGINT) AS n_nodes
        FROM reach
        GROUP BY n_reach
        ORDER BY n_reach
    """,
    description="Two-hop reach distribution: for every vertex, the "
    "count of distinct vertices within <= 2 hops (friends-of-friends "
    "minus self), histogrammed — the influence/visibility measure "
    "behind contact tracing, recommendation candidate pools, and "
    "privacy k-anonymity checks, and the first place a hub's "
    "quadratic neighborhood blowup becomes visible (compare with "
    "graph_degree_distribution: reach inflates superlinearly where "
    "hubs overlap). The expansion is one adjacency self-join with "
    "DISTINCT collapse — bounded by sum of d(v)^2, the same postings "
    "bound as the Jaccard family; hub salting applies unchanged at "
    "100 TB. All exact counts.",
)
def graph_two_hop_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    buckets = (
        load(spark, sf_dir, "events")
        .where(F.col("event_type") == "purchase")
        .select(F.date_trunc("hour", "ts").alias("h"), "user_id")
        .distinct()
    )
    a, b = buckets.alias("a"), buckets.alias("b")
    edges = (
        a.join(
            b,
            (F.col("a.h") == F.col("b.h"))
            & (F.col("a.user_id") < F.col("b.user_id")),
        )
        .select(F.col("a.user_id").alias("u"), F.col("b.user_id").alias("v"))
        .distinct()
    )
    adj = edges.select(F.col("u").alias("x"), F.col("v").alias("nbr")).unionByName(
        edges.select(F.col("v").alias("x"), F.col("u").alias("nbr"))
    )
    pa, pb = adj.alias("pa"), adj.alias("pb")
    two_hop = (
        pa.join(pb, F.col("pa.nbr") == F.col("pb.x"))
        .where(F.col("pb.nbr") != F.col("pa.x"))
        .select(F.col("pa.x").alias("x"), F.col("pb.nbr").alias("r"))
        .unionByName(adj.select("x", F.col("nbr").alias("r")))
        .distinct()
    )
    reach = two_hop.groupBy("x").agg(
        F.count(F.lit(1)).cast("long").alias("n_reach")
    )
    return (
        reach.groupBy("n_reach")
        .agg(F.count(F.lit(1)).cast("long").alias("n_nodes"))
        .orderBy("n_reach")
    )
