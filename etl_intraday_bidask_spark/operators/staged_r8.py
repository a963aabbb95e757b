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


# --- Wave D growth (round 6): completing the ML-evaluation surface ----
# Shared conventions for the eval_* family: the scored stream is
# events restricted to {purchase, view}; score = exact integer cents
# (scaled_long(value, 100)); label y = 1 for purchase. All rate-like
# outputs are floor basis points / ppm via integral `div` (== DuckDB
# `//` on non-negative ints); irrational terms (ln) quantize to an
# integer grid BEFORE any cross-row aggregation (functions/parity.py).


@staged8(
    "eval_pr_auc_exact",
    oracle_sql="""
        WITH scored AS (
            SELECT CAST(round(value * 100) AS BIGINT) AS s,
                   CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END
                       AS y
            FROM events WHERE event_type IN ('purchase', 'view')
        ), per_score AS (
            SELECT s, CAST(sum(y) AS BIGINT) AS n_pos_s,
                   CAST(count(*) AS BIGINT) AS n_s
            FROM scored GROUP BY s
        ), cum AS (
            SELECT s, n_pos_s,
                   sum(n_pos_s) OVER (ORDER BY s DESC) AS tp_cum,
                   sum(n_s) OVER (ORDER BY s DESC) AS pred_cum
            FROM per_score
        ), terms AS (
            SELECT CAST(sum(n_pos_s * ((tp_cum * 1000000) // pred_cum))
                        AS BIGINT) AS ap_num_ppm,
                   CAST(sum(n_pos_s) AS BIGINT) AS n_pos
            FROM cum
        )
        SELECT n_pos, ap_num_ppm,
               CAST(ap_num_ppm AS DOUBLE) / 1000000.0 / n_pos
                   AS average_precision
        FROM terms
    """,
    description="Exact average precision (PR-AUC, step interpolation): "
    "AP = sum over descending distinct scores of n_pos_s * P(s), with "
    "the precision at each cutoff P = tp_cum/pred_cum floored onto the "
    "ppm grid by integral division — every term an exact int64, so the "
    "aggregate is order-independent and the final AP is one float "
    "division. Same per-score-grid reduction as eval_auc_exact (the "
    "window input is the score GRID, never the row count); ties inside "
    "a score group take the group-cutoff precision, the sklearn "
    "step-interpolation convention. Scale: one groupBy + one bounded "
    "window + one reduce.",
)
def eval_pr_auc_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
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
        F.count(F.lit(1)).cast("long").alias("n_s"),
    )
    w = Window.orderBy(F.col("s").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = per_score.select(
        "n_pos_s",
        F.sum("n_pos_s").over(w).alias("tp_cum"),
        F.sum("n_s").over(w).alias("pred_cum"),
    )
    terms = cum.agg(
        F.sum(
            F.col("n_pos_s")
            * F.expr("tp_cum * 1000000 div pred_cum")
        )
        .cast("long")
        .alias("ap_num_ppm"),
        F.sum("n_pos_s").cast("long").alias("n_pos"),
    )
    return terms.select(
        "n_pos",
        "ap_num_ppm",
        (
            F.col("ap_num_ppm").cast("double") / 1000000.0 / F.col("n_pos")
        ).alias("average_precision"),
    )


@staged8(
    "eval_lift_gain_deciles",
    oracle_sql="""
        WITH scored AS (
            SELECT event_id, CAST(round(value * 100) AS BIGINT) AS s,
                   CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END
                       AS y
            FROM events WHERE event_type IN ('purchase', 'view')
        ), deciled AS (
            SELECT y, ntile(10) OVER (ORDER BY s DESC, event_id) AS dec
            FROM scored
        ), cells AS (
            SELECT dec, CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(y) AS BIGINT) AS n_pos
            FROM deciled GROUP BY dec
        ), tot AS (
            SELECT sum(n) AS n_tot, sum(n_pos) AS pos_tot FROM cells
        )
        SELECT CAST(dec AS BIGINT) AS decile, n, n_pos,
               CAST(sum(n_pos) OVER (ORDER BY dec) * 10000
                    // t.pos_tot AS BIGINT) AS cum_gain_floor_bp,
               CAST(n_pos * t.n_tot * 10000 // (n * t.pos_tot)
                    AS BIGINT) AS lift_floor_bp
        FROM cells, tot t
        ORDER BY decile
    """,
    description="Lift/gain table: scores split into deciles (ntile "
    "over DESC score, event_id tie-break — SQL-standard distribution "
    "on both engines), each decile's positive count, cumulative gain "
    "(share of all positives captured so far) and lift vs the base "
    "rate — the campaign-targeting table (how deep to mail). All "
    "rates floor-bp integral divisions of exact counts; the totals "
    "row is a 1-row broadcast. Scale: one |rows| sort-window (the "
    "same global-rank cost as limit_global_topk) + bounded decile "
    "aggregate.",
)
def eval_lift_gain_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    scored = (
        load(spark, sf_dir, "events")
        .where(F.col("event_type").isin("purchase", "view"))
        .select(
            "event_id",
            scaled_long("value", 100).alias("s"),
            F.when(F.col("event_type") == "purchase", 1)
            .otherwise(0)
            .alias("y"),
        )
    )
    deciled = scored.select(
        "y",
        F.ntile(10)
        .over(Window.orderBy(F.col("s").desc(), "event_id"))
        .alias("dec"),
    )
    cells = deciled.groupBy("dec").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("y").cast("long").alias("n_pos"),
    )
    tot = cells.agg(
        F.sum("n").alias("n_tot"), F.sum("n_pos").alias("pos_tot")
    )
    w = Window.orderBy("dec").rowsBetween(Window.unboundedPreceding, 0)
    return (
        cells.crossJoin(F.broadcast(tot))
        .select(
            F.col("dec").cast("long").alias("decile"),
            "n",
            "n_pos",
            F.expr(
                "sum(n_pos) over (order by dec rows between unbounded "
                "preceding and current row) * 10000 div pos_tot"
            )
            .cast("long")
            .alias("cum_gain_floor_bp"),
            F.expr("n_pos * n_tot * 10000 div (n * pos_tot)")
            .cast("long")
            .alias("lift_floor_bp"),
        )
        .orderBy("decile")
    )


@staged8(
    "eval_ks_statistic",
    oracle_sql="""
        WITH scored AS (
            SELECT CAST(round(value * 100) AS BIGINT) AS s,
                   CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END
                       AS y
            FROM events WHERE event_type IN ('purchase', 'view')
        ), per_score AS (
            SELECT s, CAST(sum(y) AS BIGINT) AS n_pos_s,
                   CAST(count(*) - sum(y) AS BIGINT) AS n_neg_s
            FROM scored GROUP BY s
        ), cum AS (
            SELECT sum(n_pos_s) OVER (ORDER BY s) AS cp,
                   sum(n_neg_s) OVER (ORDER BY s) AS cn
            FROM per_score
        ), tot AS (
            SELECT sum(n_pos_s) AS n_pos, sum(n_neg_s) AS n_neg
            FROM per_score
        )
        SELECT CAST(t.n_pos AS BIGINT) AS n_pos,
               CAST(t.n_neg AS BIGINT) AS n_neg,
               CAST(max(abs(cp * t.n_neg - cn * t.n_pos)) AS BIGINT)
                   AS ks_numer,
               CAST(max(abs(cp * t.n_neg - cn * t.n_pos)) * 10000
                    // (t.n_pos * t.n_neg) AS BIGINT)
                   AS ks_floor_bp
        FROM cum, tot t
        GROUP BY t.n_pos, t.n_neg
    """,
    description="Kolmogorov-Smirnov separation statistic, exact: KS = "
    "max over the score grid of |F_pos(s) - F_neg(s)|, evaluated as "
    "the integer |cp*n_neg - cn*n_pos| (cross-multiplied CDFs — no "
    "rate float ever exists) with the bp reading one integral "
    "division at the end — the credit-scoring twin of AUC (KS is the "
    "max vertical gap, AUC the area). Same bounded score-grid window "
    "as the AUC family. Scale: per-score reduce + grid window + "
    "1-row max.",
)
def eval_ks_statistic(spark: SparkSession, sf_dir: str) -> DataFrame:
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
    w = Window.orderBy("s").rowsBetween(Window.unboundedPreceding, 0)
    cum = per_score.select(
        F.sum("n_pos_s").over(w).alias("cp"),
        F.sum("n_neg_s").over(w).alias("cn"),
    )
    tot = per_score.agg(
        F.sum("n_pos_s").alias("n_pos"), F.sum("n_neg_s").alias("n_neg")
    )
    return (
        cum.crossJoin(F.broadcast(tot))
        .groupBy("n_pos", "n_neg")
        .agg(
            F.max(
                F.abs(
                    F.col("cp") * F.col("n_neg")
                    - F.col("cn") * F.col("n_pos")
                )
            )
            .cast("long")
            .alias("ks_numer"),
            F.expr(
                "max(abs(cp * n_neg - cn * n_pos)) * 10000 "
                "div (n_pos * n_neg)"
            )
            .cast("long")
            .alias("ks_floor_bp"),
        )
        .select(
            F.col("n_pos").cast("long").alias("n_pos"),
            F.col("n_neg").cast("long").alias("n_neg"),
            "ks_numer",
            "ks_floor_bp",
        )
    )


@staged8(
    "eval_f1_threshold_sweep",
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
                   CAST(sum(CASE WHEN s < t.thr AND y = 1
                            THEN 1 ELSE 0 END) AS BIGINT) AS fn
            FROM scored, t GROUP BY t.thr
        )
        SELECT CAST(thr AS BIGINT) AS threshold_cents, tp, fp, fn,
               CAST(CASE WHEN 2 * tp + fp + fn > 0
                         THEN 2 * tp * 10000 // (2 * tp + fp + fn)
                    END AS BIGINT) AS f1_floor_bp
        FROM cells ORDER BY threshold_cents
    """,
    description="F1 operating-point sweep: TP/FP/FN and the exact "
    "floor-bp F1 = 2TP/(2TP+FP+FN) at four thresholds in ONE "
    "conditional aggregate (4-row broadcast threshold dim, no "
    "rescans) — the harmonic-mean companion to eval_threshold_sweep's "
    "precision/recall; the integral F1 form never materializes either "
    "rate, so no float rounding decision exists. Degenerate "
    "(no-prediction, no-positive) thresholds emit NULL identically.",
)
def eval_f1_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
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
            ).cast("long").alias("tp"),
            F.sum(
                F.when((F.col("s") >= F.col("thr")) & (F.col("y") == 0), 1)
                .otherwise(0)
            ).cast("long").alias("fp"),
            F.sum(
                F.when((F.col("s") < F.col("thr")) & (F.col("y") == 1), 1)
                .otherwise(0)
            ).cast("long").alias("fn"),
        )
    )
    return cells.select(
        F.col("thr").cast("long").alias("threshold_cents"),
        "tp",
        "fp",
        "fn",
        F.expr(
            "case when 2 * tp + fp + fn > 0 "
            "then 2 * tp * 10000 div (2 * tp + fp + fn) end"
        ).cast("long").alias("f1_floor_bp"),
    ).orderBy("threshold_cents")


@staged8(
    "eval_group_auc_by_dow",
    oracle_sql="""
        WITH scored AS (
            SELECT isodow(ts) AS dow,
                   CAST(round(value * 100) AS BIGINT) AS s,
                   CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END
                       AS y
            FROM events WHERE event_type IN ('purchase', 'view')
        ), per_score AS (
            SELECT dow, s, CAST(sum(y) AS BIGINT) AS n_pos_s,
                   CAST(count(*) - sum(y) AS BIGINT) AS n_neg_s
            FROM scored GROUP BY dow, s
        ), cum AS (
            SELECT dow, n_pos_s, n_neg_s,
                   coalesce(sum(n_neg_s) OVER (
                       PARTITION BY dow ORDER BY s
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ), 0) AS neg_below
            FROM per_score
        )
        SELECT CAST(dow AS BIGINT) AS dow,
               CAST(sum(n_pos_s) AS BIGINT) AS n_pos,
               CAST(sum(n_neg_s) AS BIGINT) AS n_neg,
               CAST(sum(n_pos_s * (2 * neg_below + n_neg_s)) AS BIGINT)
                   AS u2,
               CAST(sum(n_pos_s * (2 * neg_below + n_neg_s)) AS DOUBLE)
                   / 2.0 / sum(n_pos_s) / sum(n_neg_s) AS auc
        FROM cum GROUP BY dow ORDER BY dow
    """,
    description="Per-segment (ISO weekday) ROC-AUC by the same "
    "doubled-U integer rank algebra as eval_auc_exact, partitioned — "
    "the slice view that catches a model that ranks well on weekdays "
    "and guesses on weekends (aggregate AUC hides it). Weekday parity "
    "pinned: Spark weekday()+1 == DuckDB isodow. Scale: the grid "
    "window partitions by segment, so segments reduce independently "
    "— group AUC is embarrassingly parallel.",
)
def eval_group_auc_by_dow(spark: SparkSession, sf_dir: str) -> DataFrame:
    scored = (
        load(spark, sf_dir, "events")
        .where(F.col("event_type").isin("purchase", "view"))
        .select(
            (F.weekday("ts") + 1).alias("dow"),
            scaled_long("value", 100).alias("s"),
            F.when(F.col("event_type") == "purchase", 1)
            .otherwise(0)
            .alias("y"),
        )
    )
    per_score = scored.groupBy("dow", "s").agg(
        F.sum("y").cast("long").alias("n_pos_s"),
        (F.count(F.lit(1)) - F.sum("y")).cast("long").alias("n_neg_s"),
    )
    w = (
        Window.partitionBy("dow")
        .orderBy("s")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = per_score.select(
        "dow",
        "n_pos_s",
        "n_neg_s",
        F.coalesce(F.sum("n_neg_s").over(w), F.lit(0)).alias("neg_below"),
    )
    u2 = F.sum(
        F.col("n_pos_s") * (2 * F.col("neg_below") + F.col("n_neg_s"))
    )
    return (
        cum.groupBy(F.col("dow").cast("long").alias("dow"))
        .agg(
            F.sum("n_pos_s").cast("long").alias("n_pos"),
            F.sum("n_neg_s").cast("long").alias("n_neg"),
            u2.cast("long").alias("u2"),
            (
                u2.cast("double")
                / 2.0
                / F.sum("n_pos_s")
                / F.sum("n_neg_s")
            ).alias("auc"),
        )
        .orderBy("dow")
    )


@staged8(
    "eval_psi_score_drift",
    oracle_sql="""
        WITH scored AS (
            SELECT least(CAST(round(value * 100) AS BIGINT) // 5000, 9)
                       AS bin,
                   event_id % 2 AS half
            FROM events WHERE event_type IN ('purchase', 'view')
        ), cells AS (
            SELECT bin,
                   CAST(sum(CASE WHEN half = 0 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_a,
                   CAST(sum(CASE WHEN half = 1 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_b
            FROM scored GROUP BY bin
        ), tot AS (
            SELECT sum(n_a) AS na_tot, sum(n_b) AS nb_tot FROM cells
        ), shares AS (
            SELECT bin, n_a, n_b,
                   n_a * 1000000 // t.na_tot AS pa_ppm,
                   n_b * 1000000 // t.nb_tot AS pb_ppm
            FROM cells, tot t
        )
        SELECT CAST(bin AS BIGINT) AS score_bin, n_a, n_b,
               CAST(pa_ppm AS BIGINT) AS pa_ppm,
               CAST(pb_ppm AS BIGINT) AS pb_ppm,
               CAST(CASE WHEN pa_ppm > 0 AND pb_ppm > 0 THEN
                   (pa_ppm - pb_ppm) * CAST(floor(
                       ln(CAST(pa_ppm AS DOUBLE) / pb_ppm) * 1000000
                       + 0.5) AS BIGINT)
               END AS BIGINT) AS psi_term_scaled
        FROM shares ORDER BY score_bin
    """,
    description="Population Stability Index between two deterministic "
    "deployment halves (event_id parity), per $50 score bin: shares "
    "on the exact ppm grid (integral division), the ln share-ratio "
    "quantized to 1e-6 as an integer BEFORE the (pa-pb) product, so "
    "the per-bin PSI term is an exact int64 and the table is "
    "order-independent — the score-drift monitor that decides when a "
    "model retrains (PSI > 0.2 = shifted). Empty-side bins emit NULL "
    "terms identically on both engines. One conditional aggregate + "
    "1-row totals broadcast.",
)
def eval_psi_score_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    scored = (
        load(spark, sf_dir, "events")
        .where(F.col("event_type").isin("purchase", "view"))
        .select(
            F.least(
                F.expr("floor(value * 100 + 0.5) div 5000").cast("long"),
                F.lit(9),
            ).alias("bin"),
            (F.col("event_id") % 2).alias("half"),
        )
    )
    cells = scored.groupBy("bin").agg(
        F.sum(F.when(F.col("half") == 0, 1).otherwise(0))
        .cast("long")
        .alias("n_a"),
        F.sum(F.when(F.col("half") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_b"),
    )
    tot = cells.agg(
        F.sum("n_a").alias("na_tot"), F.sum("n_b").alias("nb_tot")
    )
    shares = cells.crossJoin(F.broadcast(tot)).select(
        "bin",
        "n_a",
        "n_b",
        F.expr("n_a * 1000000 div na_tot").alias("pa_ppm"),
        F.expr("n_b * 1000000 div nb_tot").alias("pb_ppm"),
    )
    return shares.select(
        F.col("bin").cast("long").alias("score_bin"),
        "n_a",
        "n_b",
        F.col("pa_ppm").cast("long").alias("pa_ppm"),
        F.col("pb_ppm").cast("long").alias("pb_ppm"),
        F.when(
            (F.col("pa_ppm") > 0) & (F.col("pb_ppm") > 0),
            (F.col("pa_ppm") - F.col("pb_ppm"))
            * F.floor(
                F.log(
                    F.col("pa_ppm").cast("double")
                    / F.col("pb_ppm").cast("double")
                )
                * 1000000
                + 0.5
            ).cast("long"),
        )
        .cast("long")
        .alias("psi_term_scaled"),
    ).orderBy("score_bin")


@staged8(
    "eval_information_value_bins",
    oracle_sql="""
        WITH scored AS (
            SELECT least(CAST(round(value * 100) AS BIGINT) // 5000, 9)
                       AS bin,
                   CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END
                       AS y
            FROM events WHERE event_type IN ('purchase', 'view')
        ), cells AS (
            SELECT bin, CAST(sum(y) AS BIGINT) AS n_pos,
                   CAST(count(*) - sum(y) AS BIGINT) AS n_neg
            FROM scored GROUP BY bin
        ), tot AS (
            SELECT sum(n_pos) AS pos_tot, sum(n_neg) AS neg_tot
            FROM cells
        ), shares AS (
            SELECT bin, n_pos, n_neg,
                   n_pos * 1000000 // t.pos_tot AS dp_ppm,
                   n_neg * 1000000 // t.neg_tot AS dn_ppm
            FROM cells, tot t
        )
        SELECT CAST(bin AS BIGINT) AS score_bin, n_pos, n_neg,
               CAST(CASE WHEN dp_ppm > 0 AND dn_ppm > 0 THEN
                   CAST(floor(ln(CAST(dp_ppm AS DOUBLE) / dn_ppm)
                              * 1000000 + 0.5) AS BIGINT)
               END AS BIGINT) AS woe_scaled,
               CAST(CASE WHEN dp_ppm > 0 AND dn_ppm > 0 THEN
                   (dp_ppm - dn_ppm) * CAST(floor(
                       ln(CAST(dp_ppm AS DOUBLE) / dn_ppm) * 1000000
                       + 0.5) AS BIGINT)
               END AS BIGINT) AS iv_term_scaled
        FROM shares ORDER BY score_bin
    """,
    description="Weight-of-evidence / information-value table per "
    "score bin: WoE = ln(share_pos/share_neg) quantized to 1e-6 "
    "integers, IV term = (share_pos - share_neg) x WoE exact — the "
    "credit-risk feature-strength screen (IV > 0.3 = strong "
    "predictor); shares are ppm integral divisions of class totals. "
    "Same skeleton as eval_psi_score_drift with class shares "
    "replacing deployment halves.",
)
def eval_information_value_bins(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
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
    cells = scored.groupBy("bin").agg(
        F.sum("y").cast("long").alias("n_pos"),
        (F.count(F.lit(1)) - F.sum("y")).cast("long").alias("n_neg"),
    )
    tot = cells.agg(
        F.sum("n_pos").alias("pos_tot"), F.sum("n_neg").alias("neg_tot")
    )
    shares = cells.crossJoin(F.broadcast(tot)).select(
        "bin",
        "n_pos",
        "n_neg",
        F.expr("n_pos * 1000000 div pos_tot").alias("dp_ppm"),
        F.expr("n_neg * 1000000 div neg_tot").alias("dn_ppm"),
    )
    woe = F.floor(
        F.log(
            F.col("dp_ppm").cast("double") / F.col("dn_ppm").cast("double")
        )
        * 1000000
        + 0.5
    ).cast("long")
    ok = (F.col("dp_ppm") > 0) & (F.col("dn_ppm") > 0)
    return shares.select(
        F.col("bin").cast("long").alias("score_bin"),
        "n_pos",
        "n_neg",
        F.when(ok, woe).cast("long").alias("woe_scaled"),
        F.when(ok, (F.col("dp_ppm") - F.col("dn_ppm")) * woe)
        .cast("long")
        .alias("iv_term_scaled"),
    ).orderBy("score_bin")


@staged8(
    "eval_mcnemar_paired_rules",
    oracle_sql="""
        WITH scored AS (
            SELECT CAST(round(value * 100) AS BIGINT) AS s,
                   CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END
                       AS y
            FROM events WHERE event_type IN ('purchase', 'view')
        ), paired AS (
            SELECT CASE WHEN (s >= 5000) = (y = 1) THEN 1 ELSE 0 END
                       AS a_ok,
                   CASE WHEN (s >= 10000) = (y = 1) THEN 1 ELSE 0 END
                       AS b_ok
            FROM scored
        ), cells AS (
            SELECT
                CAST(sum(CASE WHEN a_ok = 1 AND b_ok = 1
                         THEN 1 ELSE 0 END) AS BIGINT) AS n11,
                CAST(sum(CASE WHEN a_ok = 1 AND b_ok = 0
                         THEN 1 ELSE 0 END) AS BIGINT) AS n10,
                CAST(sum(CASE WHEN a_ok = 0 AND b_ok = 1
                         THEN 1 ELSE 0 END) AS BIGINT) AS n01,
                CAST(sum(CASE WHEN a_ok = 0 AND b_ok = 0
                         THEN 1 ELSE 0 END) AS BIGINT) AS n00
            FROM paired
        )
        SELECT n11, n10, n01, n00,
               CAST((n10 - n01) * (n10 - n01) AS BIGINT)
                   AS mcnemar_numer,
               CAST(n10 + n01 AS BIGINT) AS mcnemar_denom,
               CASE WHEN n10 + n01 > 0 THEN
                   CAST((n10 - n01) * (n10 - n01) AS DOUBLE)
                       / (n10 + n01)
               END AS mcnemar_chi2
        FROM cells
    """,
    description="McNemar paired-classifier test: two threshold rules "
    "(s>=50.00 vs s>=100.00) judged right/wrong per event; the "
    "discordant cells n10/n01 and the chi-square statistic "
    "(n10-n01)^2/(n10+n01) decide whether the rules differ beyond "
    "noise — the PAIRED comparison that is valid when both models "
    "score the same rows (two independent accuracy numbers are not). "
    "Numerator and denominator exact int64; the statistic one float "
    "division. One conditional aggregate, map-side combinable.",
)
def eval_mcnemar_paired_rules(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
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
    paired = scored.select(
        F.when((F.col("s") >= 5000) == (F.col("y") == 1), 1)
        .otherwise(0)
        .alias("a_ok"),
        F.when((F.col("s") >= 10000) == (F.col("y") == 1), 1)
        .otherwise(0)
        .alias("b_ok"),
    )
    cells = paired.agg(
        F.sum(F.when((F.col("a_ok") == 1) & (F.col("b_ok") == 1), 1).otherwise(0))
        .cast("long").alias("n11"),
        F.sum(F.when((F.col("a_ok") == 1) & (F.col("b_ok") == 0), 1).otherwise(0))
        .cast("long").alias("n10"),
        F.sum(F.when((F.col("a_ok") == 0) & (F.col("b_ok") == 1), 1).otherwise(0))
        .cast("long").alias("n01"),
        F.sum(F.when((F.col("a_ok") == 0) & (F.col("b_ok") == 0), 1).otherwise(0))
        .cast("long").alias("n00"),
    )
    d = F.col("n10") - F.col("n01")
    return cells.select(
        "n11",
        "n10",
        "n01",
        "n00",
        (d * d).cast("long").alias("mcnemar_numer"),
        (F.col("n10") + F.col("n01")).cast("long").alias("mcnemar_denom"),
        F.when(
            F.col("n10") + F.col("n01") > 0,
            (d * d).cast("double") / (F.col("n10") + F.col("n01")),
        ).alias("mcnemar_chi2"),
    )


@staged8(
    "eval_mrr_first_purchase",
    oracle_sql="""
        WITH scored AS (
            SELECT user_id, event_id,
                   CAST(round(value * 100) AS BIGINT) AS s,
                   CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END
                       AS y
            FROM events WHERE event_type IN ('purchase', 'view')
        ), ranked AS (
            SELECT user_id, y,
                   row_number() OVER (
                       PARTITION BY user_id ORDER BY s DESC, event_id
                   ) AS rk
            FROM scored
        ), firsts AS (
            SELECT user_id, min(rk) AS first_pos_rank
            FROM ranked WHERE y = 1 GROUP BY user_id
        )
        SELECT CAST(count(*) AS BIGINT) AS n_users,
               CAST(sum(1000000 // first_pos_rank) AS BIGINT)
                   AS rr_sum_ppm,
               CAST(sum(1000000 // first_pos_rank) // count(*)
                    AS BIGINT) AS mrr_floor_ppm,
               CAST(sum(CASE WHEN first_pos_rank = 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_hit_at_1
        FROM firsts
    """,
    description="Mean reciprocal rank of the first relevant item: per "
    "user, events ranked by score (event_id tie-break), the rank of "
    "the best-ranked purchase taken reciprocally on the exact ppm "
    "grid (1000000 div rank — integral, so the MRR sum is exact and "
    "order-independent; users with no purchase drop, the standard "
    "convention), plus hit@1 — the leaderboard metric for retrieval "
    "and recommendation rankers. Scale: one user-partitioned rank "
    "window + per-user min + global reduce; no global sort.",
)
def eval_mrr_first_purchase(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    scored = (
        load(spark, sf_dir, "events")
        .where(F.col("event_type").isin("purchase", "view"))
        .select(
            "user_id",
            "event_id",
            scaled_long("value", 100).alias("s"),
            F.when(F.col("event_type") == "purchase", 1)
            .otherwise(0)
            .alias("y"),
        )
    )
    ranked = scored.select(
        "user_id",
        "y",
        F.row_number()
        .over(
            Window.partitionBy("user_id").orderBy(
                F.col("s").desc(), "event_id"
            )
        )
        .alias("rk"),
    )
    firsts = (
        ranked.where(F.col("y") == 1)
        .groupBy("user_id")
        .agg(F.min("rk").alias("first_pos_rank"))
    )
    return firsts.agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum(F.expr("1000000 div first_pos_rank"))
        .cast("long")
        .alias("rr_sum_ppm"),
        F.expr("sum(1000000 div first_pos_rank) div count(*)")
        .cast("long")
        .alias("mrr_floor_ppm"),
        F.sum(F.when(F.col("first_pos_rank") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_hit_at_1"),
    )


@staged8(
    "eval_recall_at_k_per_user",
    oracle_sql="""
        WITH scored AS (
            SELECT user_id, event_id,
                   CAST(round(value * 100) AS BIGINT) AS s,
                   CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END
                       AS y
            FROM events WHERE event_type IN ('purchase', 'view')
        ), ranked AS (
            SELECT user_id, y,
                   row_number() OVER (
                       PARTITION BY user_id ORDER BY s DESC, event_id
                   ) AS rk
            FROM scored
        ), per_user AS (
            SELECT user_id,
                   CAST(sum(y) AS BIGINT) AS n_rel,
                   CAST(sum(CASE WHEN rk <= 5 THEN y ELSE 0 END)
                        AS BIGINT) AS n_rel_top5,
                   CAST(sum(CASE WHEN rk <= 10 THEN y ELSE 0 END)
                        AS BIGINT) AS n_rel_top10
            FROM ranked GROUP BY user_id
        )
        SELECT CAST(count(*) AS BIGINT) AS n_users,
               CAST(sum(n_rel) AS BIGINT) AS total_rel,
               CAST(sum(n_rel_top5) AS BIGINT) AS captured_top5,
               CAST(sum(n_rel_top10) AS BIGINT) AS captured_top10,
               CAST(sum(n_rel_top5) * 10000 // sum(n_rel) AS BIGINT)
                   AS recall5_floor_bp,
               CAST(sum(n_rel_top10) * 10000 // sum(n_rel) AS BIGINT)
                   AS recall10_floor_bp
        FROM per_user WHERE n_rel > 0
    """,
    description="Recall@5 / recall@10 (micro-averaged): per user, "
    "relevant items (purchases) captured in the score-ranked top-k "
    "(event_id tie-break), summed over users with >=1 relevant item "
    "and divided once on the exact bp grid — the retrieval-quality "
    "gate for candidate-generation stages (a recall@10 of 60% caps "
    "the whole recommender at 60%). One user-partitioned rank window "
    "+ conditional per-user reduce + global reduce; no global sort.",
)
def eval_recall_at_k_per_user(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    scored = (
        load(spark, sf_dir, "events")
        .where(F.col("event_type").isin("purchase", "view"))
        .select(
            "user_id",
            "event_id",
            scaled_long("value", 100).alias("s"),
            F.when(F.col("event_type") == "purchase", 1)
            .otherwise(0)
            .alias("y"),
        )
    )
    ranked = scored.select(
        "user_id",
        "y",
        F.row_number()
        .over(
            Window.partitionBy("user_id").orderBy(
                F.col("s").desc(), "event_id"
            )
        )
        .alias("rk"),
    )
    per_user = ranked.groupBy("user_id").agg(
        F.sum("y").cast("long").alias("n_rel"),
        F.sum(F.when(F.col("rk") <= 5, F.col("y")).otherwise(0))
        .cast("long")
        .alias("n_rel_top5"),
        F.sum(F.when(F.col("rk") <= 10, F.col("y")).otherwise(0))
        .cast("long")
        .alias("n_rel_top10"),
    )
    return per_user.where(F.col("n_rel") > 0).agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum("n_rel").cast("long").alias("total_rel"),
        F.sum("n_rel_top5").cast("long").alias("captured_top5"),
        F.sum("n_rel_top10").cast("long").alias("captured_top10"),
        F.expr("sum(n_rel_top5) * 10000 div sum(n_rel)")
        .cast("long")
        .alias("recall5_floor_bp"),
        F.expr("sum(n_rel_top10) * 10000 div sum(n_rel)")
        .cast("long")
        .alias("recall10_floor_bp"),
    )


@staged8(
    "feature_target_encode_loo",
    oracle_sql="""
        WITH scored AS (
            SELECT user_id,
                   CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END
                       AS y
            FROM events WHERE event_type IN ('purchase', 'view')
        ), stats AS (
            SELECT user_id, CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(y) AS BIGINT) AS pos
            FROM scored GROUP BY user_id
        ), loo AS (
            SELECT s.user_id, st.n, st.pos,
                   CASE WHEN st.n > 1 THEN
                       (st.pos - s.y) * 10000 // (st.n - 1)
                   END AS loo_bp
            FROM scored s JOIN stats st ON s.user_id = st.user_id
        )
        SELECT user_id, CAST(max(n) AS BIGINT) AS n_events,
               CAST(max(pos) AS BIGINT) AS n_pos,
               CAST(sum(loo_bp) AS BIGINT) AS loo_sum_bp,
               CAST(min(loo_bp) AS BIGINT) AS loo_min_bp,
               CAST(max(loo_bp) AS BIGINT) AS loo_max_bp
        FROM loo GROUP BY user_id ORDER BY user_id
    """,
    description="Leave-one-out target encoding of user_id: each "
    "event's encoded value is the user's positive rate EXCLUDING the "
    "event itself ((pos - y) / (n - 1), floored onto the bp grid) — "
    "the standard high-cardinality categorical encoding, with the "
    "self-exclusion that prevents the target leaking into its own "
    "feature; singleton users emit NULL identically. Graded per user "
    "as exact sum/min/max of the per-event encodings. Scale: one "
    "user aggregate broadcast-joined back — the fact shuffles once "
    "on the natural key; at 100 TB the stats side is the small one.",
)
def feature_target_encode_loo(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    scored = (
        load(spark, sf_dir, "events")
        .where(F.col("event_type").isin("purchase", "view"))
        .select(
            "user_id",
            F.when(F.col("event_type") == "purchase", 1)
            .otherwise(0)
            .alias("y"),
        )
    )
    stats = scored.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("y").cast("long").alias("pos"),
    )
    loo = scored.join(stats, "user_id").select(
        "user_id",
        "n",
        "pos",
        F.when(
            F.col("n") > 1,
            F.expr("(pos - y) * 10000 div (n - 1)"),
        ).alias("loo_bp"),
    )
    return (
        loo.groupBy("user_id")
        .agg(
            F.max("n").cast("long").alias("n_events"),
            F.max("pos").cast("long").alias("n_pos"),
            F.sum("loo_bp").cast("long").alias("loo_sum_bp"),
            F.min("loo_bp").cast("long").alias("loo_min_bp"),
            F.max("loo_bp").cast("long").alias("loo_max_bp"),
        )
        .orderBy("user_id")
    )


@staged8(
    "sample_group_kfold",
    oracle_sql="""
        WITH folded AS (
            SELECT user_id,
                   (user_id * 48271) % 2147483647 % 5 AS fold,
                   CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END
                       AS y
            FROM events
        )
        SELECT CAST(fold AS BIGINT) AS fold,
               CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
               CAST(count(*) AS BIGINT) AS n_events,
               CAST(sum(y) AS BIGINT) AS n_pos
        FROM folded GROUP BY fold ORDER BY fold
    """,
    description="Grouped 5-fold CV assignment: the fold is a pure LCG "
    "hash of user_id, so EVERY event of a user lands in one fold by "
    "construction — the grouping that prevents the same user's "
    "behavior appearing in both train and validation (the classic "
    "entity-leakage inflation). Membership is replayable on any "
    "partitioning/engine/day (same hash-not-RNG discipline as "
    "sample_hash_bucket); graded output is each fold's user/event/"
    "positive census. Zero shuffle beyond the fold aggregate.",
)
def sample_group_kfold(spark: SparkSession, sf_dir: str) -> DataFrame:
    folded = load(spark, sf_dir, "events").select(
        "user_id",
        ((F.col("user_id") * 48271) % 2147483647 % 5).alias("fold"),
        F.when(F.col("event_type") == "purchase", 1)
        .otherwise(0)
        .alias("y"),
    )
    return (
        folded.groupBy(F.col("fold").cast("long").alias("fold"))
        .agg(
            F.countDistinct("user_id").cast("long").alias("n_users"),
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum("y").cast("long").alias("n_pos"),
        )
        .orderBy("fold")
    )


@staged8(
    "sample_time_series_cv_expanding",
    oracle_sql="""
        WITH ev AS (
            SELECT ts, CASE WHEN event_type = 'purchase' THEN 1
                       ELSE 0 END AS y
            FROM events
        ), bounds AS (
            SELECT min(ts) AS t0 FROM ev
        ), folds(k) AS (VALUES (1), (2), (3)),
        cells AS (
            SELECT f.k,
                   CAST(sum(CASE WHEN e.ts < b.t0
                            + to_days(7 * f.k) THEN 1 ELSE 0 END)
                        AS BIGINT) AS train_n,
                   CAST(sum(CASE WHEN e.ts >= b.t0 + to_days(7 * f.k)
                            AND e.ts < b.t0 + to_days(7 * (f.k + 1))
                            THEN 1 ELSE 0 END) AS BIGINT) AS test_n,
                   CAST(sum(CASE WHEN e.ts >= b.t0 + to_days(7 * f.k)
                            AND e.ts < b.t0 + to_days(7 * (f.k + 1))
                            THEN e.y ELSE 0 END) AS BIGINT)
                       AS test_pos
            FROM ev e, bounds b, folds f
            GROUP BY f.k
        )
        SELECT CAST(k AS BIGINT) AS fold, train_n, test_n, test_pos
        FROM cells ORDER BY fold
    """,
    description="Expanding-window time-series CV folds: fold k trains "
    "on everything before week k (from the corpus start) and tests "
    "on week k itself — the only CV scheme that never shows a model "
    "the future (random k-fold leaks temporal structure). Fold "
    "boundaries derive from the corpus min(ts) (1-row broadcast) + "
    "exact day intervals; the three folds' train/test censuses come "
    "from ONE conditional aggregate over a 3-row broadcast fold dim "
    "(no per-fold rescans — same one-scan sweep as "
    "q6_sensitivity_whatif).",
)
def sample_time_series_cv_expanding(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = load(spark, sf_dir, "events").select(
        "ts",
        F.when(F.col("event_type") == "purchase", 1)
        .otherwise(0)
        .alias("y"),
    )
    bounds = ev.agg(F.min("ts").alias("t0"))
    folds = spark.createDataFrame([(1,), (2,), (3,)], ["k"])
    cells = (
        ev.crossJoin(F.broadcast(bounds))
        .crossJoin(F.broadcast(folds))
        .groupBy("k")
        .agg(
            F.sum(
                F.when(
                    F.col("ts")
                    < F.col("t0") + F.expr("make_dt_interval(7 * k)"),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("train_n"),
            F.sum(
                F.when(
                    (
                        F.col("ts")
                        >= F.col("t0") + F.expr("make_dt_interval(7 * k)")
                    )
                    & (
                        F.col("ts")
                        < F.col("t0")
                        + F.expr("make_dt_interval(7 * (k + 1))")
                    ),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("test_n"),
            F.sum(
                F.when(
                    (
                        F.col("ts")
                        >= F.col("t0") + F.expr("make_dt_interval(7 * k)")
                    )
                    & (
                        F.col("ts")
                        < F.col("t0")
                        + F.expr("make_dt_interval(7 * (k + 1))")
                    ),
                    F.col("y"),
                ).otherwise(0)
            )
            .cast("long")
            .alias("test_pos"),
        )
    )
    return cells.select(
        F.col("k").cast("long").alias("fold"),
        "train_n",
        "test_n",
        "test_pos",
    ).orderBy("fold")


@staged8(
    "eval_entity_split_leakage",
    oracle_sql="""
        WITH split AS (
            SELECT o_custkey,
                   CASE WHEN o_orderdate < TIMESTAMP '1996-01-01'
                        THEN 0 ELSE 1 END AS part,
                   count(*) AS n
            FROM orders GROUP BY 1, 2
        ), per_cust AS (
            SELECT o_custkey,
                   CAST(count(*) AS BIGINT) AS n_parts,
                   CAST(sum(n) AS BIGINT) AS n_orders
            FROM split GROUP BY o_custkey
        )
        SELECT CAST(count(*) AS BIGINT) AS n_customers,
               CAST(sum(CASE WHEN n_parts = 2 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_leaking,
               CAST(sum(CASE WHEN n_parts = 2 THEN n_orders ELSE 0 END)
                    AS BIGINT) AS n_orders_leaking,
               CAST(sum(CASE WHEN n_parts = 2 THEN 1 ELSE 0 END)
                    * 10000 // count(*) AS BIGINT)
                   AS leak_rate_floor_bp
        FROM per_cust
    """,
    description="Entity-leakage audit of a time split: customers whose "
    "orders fall on BOTH sides of the 1996-01-01 train/test boundary "
    "— each one lets a model memorize entity behavior in train and "
    "replay it in test, silently inflating offline metrics (the audit "
    "that says whether a time split also needs to be a GROUP split, "
    "cf. sample_group_kfold). Exact censuses + one floor-bp rate. "
    "One custkey aggregate — the fact's natural-key shuffle.",
)
def eval_entity_split_leakage(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    split = (
        load(spark, sf_dir, "orders")
        .select(
            "o_custkey",
            F.when(
                F.col("o_orderdate") < F.lit("1996-01-01").cast("timestamp"),
                0,
            )
            .otherwise(1)
            .alias("part"),
        )
        .groupBy("o_custkey", "part")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    per_cust = split.groupBy("o_custkey").agg(
        F.count(F.lit(1)).cast("long").alias("n_parts"),
        F.sum("n").cast("long").alias("n_orders"),
    )
    return per_cust.agg(
        F.count(F.lit(1)).cast("long").alias("n_customers"),
        F.sum(F.when(F.col("n_parts") == 2, 1).otherwise(0))
        .cast("long")
        .alias("n_leaking"),
        F.sum(F.when(F.col("n_parts") == 2, F.col("n_orders")).otherwise(0))
        .cast("long")
        .alias("n_orders_leaking"),
        F.expr(
            "sum(case when n_parts = 2 then 1 else 0 end) * 10000 "
            "div count(*)"
        )
        .cast("long")
        .alias("leak_rate_floor_bp"),
    )


@staged8(
    "feature_missingness_profile",
    oracle_sql="""
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n,
               CAST(count(*) - count(props) AS BIGINT) AS n_props_null,
               CAST(sum(CASE WHEN json_extract_string(props, '$.k')
                        IS NULL AND props IS NOT NULL
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_k_absent,
               CAST(sum(CASE WHEN value = 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_value_zero,
               CAST((count(*) - count(props)) * 10000 // count(*)
                    AS BIGINT) AS props_null_floor_bp
        FROM events GROUP BY event_type ORDER BY event_type
    """,
    description="Feature-missingness profile per event type: NULL "
    "props, present-but-k-absent JSON payloads, and zero values — "
    "the three distinct flavors of 'missing' a feature pipeline must "
    "treat differently (absent row vs absent key vs sentinel zero), "
    "profiled before any imputation decision. Exact counts + one "
    "floor-bp rate; single map-side-combinable aggregate over one "
    "scan.",
)
def feature_missingness_profile(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = load(spark, sf_dir, "events").select(
        "event_type",
        "props",
        "value",
        F.from_json("props", "k INT")["k"].alias("k"),
    )
    return (
        ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            (F.count(F.lit(1)) - F.count("props"))
            .cast("long")
            .alias("n_props_null"),
            F.sum(
                F.when(
                    F.col("k").isNull() & F.col("props").isNotNull(), 1
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_k_absent"),
            F.sum(F.when(F.col("value") == 0, 1).otherwise(0))
            .cast("long")
            .alias("n_value_zero"),
            F.expr("(count(*) - count(props)) * 10000 div count(*)")
            .cast("long")
            .alias("props_null_floor_bp"),
        )
        .orderBy("event_type")
    )


@staged8(
    "feature_hashed_cross_bucket",
    oracle_sql="""
        WITH crossed AS (
            SELECT CAST('0x' || substr(md5(event_type || '|'
                       || CAST(isodow(ts) AS VARCHAR)), 1, 15)
                       AS BIGINT) % 64 AS bucket,
                   CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END
                       AS y
            FROM events
        )
        SELECT CAST(bucket AS BIGINT) AS bucket,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(y) AS BIGINT) AS n_pos
        FROM crossed GROUP BY bucket ORDER BY bucket
    """,
    description="Hash-trick feature cross: (event_type x ISO weekday) "
    "hashed into 64 buckets via the cross-engine md5-arithmetic idiom "
    "(Spark conv(substr(md5,1,15),16,10) == DuckDB '0x'||substr "
    "cast — the same bit-identical hash the MinHash family is built "
    "on), with each bucket's count and positive census — the "
    "dimensionality-capped categorical interaction a linear model "
    "consumes, collision behavior included (the graded census IS the "
    "collision audit). Pure map + one aggregate; no vocabulary state "
    "at any scale.",
)
def feature_hashed_cross_bucket(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    crossed = load(spark, sf_dir, "events").select(
        (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat_ws(
                            "|",
                            F.col("event_type"),
                            (F.weekday("ts") + 1).cast("string"),
                        )
                    ),
                    1,
                    15,
                ),
                16,
                10,
            ).cast("long")
            % 64
        ).alias("bucket"),
        F.when(F.col("event_type") == "purchase", 1)
        .otherwise(0)
        .alias("y"),
    )
    return (
        crossed.groupBy(F.col("bucket").cast("long").alias("bucket"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("y").cast("long").alias("n_pos"),
        )
        .orderBy("bucket")
    )


@staged8(
    "churn_label_weekly",
    oracle_sql="""
        WITH weekly AS (
            SELECT DISTINCT date_trunc('week', ts) AS wk, user_id
            FROM events
        ), labeled AS (
            SELECT a.wk, a.user_id,
                   CASE WHEN b.user_id IS NULL THEN 1 ELSE 0 END
                       AS churned
            FROM weekly a
            LEFT JOIN weekly b
              ON b.user_id = a.user_id
             AND b.wk = a.wk + INTERVAL 7 DAY
            WHERE a.wk + INTERVAL 7 DAY <= (SELECT max(wk) FROM weekly)
        )
        SELECT CAST(epoch_us(wk) AS BIGINT) AS week_us,
               CAST(count(*) AS BIGINT) AS n_active,
               CAST(sum(churned) AS BIGINT) AS n_churned,
               CAST(sum(churned) * 10000 // count(*) AS BIGINT)
                   AS churn_rate_floor_bp
        FROM labeled GROUP BY wk ORDER BY week_us
    """,
    description="Weekly churn-label construction: a user active in "
    "week w is labeled churned iff absent in week w+1 — the "
    "look-one-period-forward label every retention model trains on, "
    "built leak-free (the label uses ONLY week w+1; the final "
    "unlabelable week is excluded by the max-week bound rather than "
    "silently labeled churned). Distinct (week, user) pairs first — "
    "the only pass over raw events — then a self-join on the "
    "(user, week+7d) key. Exact censuses, one floor-bp rate.",
)
def churn_label_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    weekly = (
        load(spark, sf_dir, "events")
        .select(F.date_trunc("week", "ts").alias("wk"), "user_id")
        .distinct()
    )
    max_wk = weekly.agg(F.max("wk").alias("max_wk"))
    a = weekly.alias("a")
    b = weekly.alias("b")
    labeled = (
        a.crossJoin(F.broadcast(max_wk))
        .where(
            F.col("a.wk") + F.expr("INTERVAL 7 DAY") <= F.col("max_wk")
        )
        .join(
            b,
            (F.col("b.user_id") == F.col("a.user_id"))
            & (
                F.col("b.wk")
                == F.col("a.wk") + F.expr("INTERVAL 7 DAY")
            ),
            "left",
        )
        .select(
            F.col("a.wk").alias("wk"),
            F.when(F.col("b.user_id").isNull(), 1).otherwise(0).alias(
                "churned"
            ),
        )
    )
    return (
        labeled.groupBy("wk")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_active"),
            F.sum("churned").cast("long").alias("n_churned"),
            F.expr("sum(churned) * 10000 div count(*)")
            .cast("long")
            .alias("churn_rate_floor_bp"),
        )
        .select(
            F.unix_micros("wk").alias("week_us"),
            "n_active",
            "n_churned",
            "churn_rate_floor_bp",
        )
        .orderBy("week_us")
    )
