"""Event-time / time-series operators — batch forms (SURVEY.md §2.9).

These are the intraday-bar operators of the bid/ask domain: tumbling /
sliding / session windows and OHLC bars over the event stream. Each has
a Structured Streaming twin in :mod:`etl_intraday_bidask_spark.streaming`
(watermarked, ``availableNow`` replay); Spark's unified semantics make
the batch output the ground truth for the streaming one, and that
equivalence is asserted in tests.

Hash-parity policy for event time (SURVEY.md §1.3): ``events.ts`` is
nanosecond parquet (µs-precision values), Spark truncates to µs — so no
query emits a raw ``ts``; window starts are emitted as **epoch
microseconds BIGINT** (``unix_micros`` ⇔ DuckDB ``epoch_us``), which is
lossless on both engines.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from etl_intraday_bidask_spark.functions.parity import (
    exact_avg,
    exact_sum,
    scaled_long,
)
from etl_intraday_bidask_spark.plans.ordering import ordered_small
from etl_intraday_bidask_spark.registry import register
from etl_intraday_bidask_spark.tables import load, view


@register(
    "stream_tumbling_1h",
    oracle_sql="""
        SELECT epoch_us(date_trunc('hour', ts)) AS bucket_us,
               event_type,
               count(*) AS n,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / 100.0
                   AS sum_value,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / 100.0
                   / count(*) AS avg_value
        FROM events
        GROUP BY 1, 2
        ORDER BY 1, 2
    """,
    description="1-hour tumbling bars per event_type (counts + sums) — "
    "the intraday-bar aggregation; the streaming twin uses window() "
    "(the watermark-aware construct), the batch form groups on "
    "date_trunc('hour') — identical bucket starts for tumbling "
    "windows, pinned value-equal by tests/test_streaming.py.",
)
def stream_tumbling_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    # SQL-text body (round-8 dispatch-floor work, see
    # agg_pricing_summary): one parse round trip. Round-11 re-plan
    # (VERDICT r10 item 4): the batch form groups on
    # date_trunc('HOUR', ts) instead of window(ts, '1 hour') — for
    # TUMBLING windows the bucket start IS the truncation, so the
    # struct construction, per-row window_start/end arithmetic, and
    # post-aggregate field extraction all disappear from the hot path,
    # and the group key is a flat timestamp instead of a struct.
    # Measured (interleaved medians, bench-shaped session): sf0.1
    # 317/219 ms -> 213/188 ms; 10x events 591/477 -> 456/419 ms;
    # results bit-identical at both scales (3,600 bars). The STREAMING
    # twin (streaming/replay.py, tests/test_streaming.py) keeps
    # window() — watermark eviction needs the window struct — and the
    # twin test pins the two forms value-equal, so the streaming
    # semantics stay the contract.
    # Round-13 (floor decomposition, VERDICT r12 item 2): the global
    # ORDER BY was a range sort whose bounds-sampling JOB re-executes
    # the whole scan+aggregate subtree (jobs 2 -> 1 without it). The
    # bar output is CALENDAR-BOUNDED — hours x event_types (3,600 rows
    # at every sf; the row count grows with the time SPAN, not data
    # volume) — which is exactly ordered_small's scale contract: the
    # coalesce(1) collapses only the final agg stage, whose input is
    # map-side partials capped at groups x map_tasks. Measured at
    # sf0.1 (interleaved medians): ORDER BY 208 -> repartition(1) 165
    # -> ordered_small 270-vs-331 on the head-to-head (the coalesce
    # form saves the extra exchange), jobs 2 -> 1. The data-dependent-
    # output ops (session, asof, topk) keep their range sorts —
    # bounded output is the admission test.
    ev = view(spark, sf_dir, "events")
    return ordered_small(
        spark.sql(f"""
        SELECT unix_micros(date_trunc('HOUR', ts)) AS bucket_us,
               event_type,
               COUNT(1) AS n,
               CAST(SUM(FLOOR(value * 100.0D + 0.5D)) AS DOUBLE)
                   / 100.0D AS sum_value,
               CAST(SUM(FLOOR(value * 100.0D + 0.5D)) AS DOUBLE)
                   / 100.0D / COUNT(1) AS avg_value
        FROM {ev}
        GROUP BY date_trunc('HOUR', ts), event_type
    """),
        "bucket_us",
        "event_type",
    )


@register(
    "stream_sliding_1h_15m",
    oracle_sql="""
        SELECT (epoch_us(ts) // 900000000 - k.k) * 900000000 AS win_start_us,
               event_type,
               count(*) AS n,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / 100.0
                   AS sum_value
        FROM events
        CROSS JOIN (VALUES (0), (1), (2), (3)) AS k(k)
        GROUP BY 1, 2
        ORDER BY 1, 2
    """,
    description="1-hour window sliding every 15 minutes: each event lands "
    "in 4 overlapping windows (window(ts, '1 hour', '15 minutes')).",
)
def stream_sliding_1h_15m(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.window("ts", "1 hour", "15 minutes").alias("w"),
            F.col("event_type"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            exact_sum("value", 100).alias("sum_value"),
        )
        .select(
            F.unix_micros("w.start").alias("win_start_us"),
            "event_type",
            "n",
            "sum_value",
        )
        .orderBy("win_start_us", "event_type")
    )


@register(
    "stream_session_30m",
    oracle_sql="""
        WITH d AS (
            SELECT user_id, value, epoch_us(ts) AS e,
                   lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts) AS pe
            FROM events
        ),
        marked AS (
            SELECT user_id, value, e,
                   CASE WHEN pe IS NULL OR e - pe >= 1800000000 THEN 1 ELSE 0 END AS new_s
            FROM d
        ),
        grouped AS (
            SELECT user_id, value, e,
                   sum(new_s) OVER (
                       PARTITION BY user_id ORDER BY e
                       ROWS UNBOUNDED PRECEDING
                   ) AS sid
            FROM marked
        )
        SELECT user_id,
               min(e) AS session_start_us,
               count(*) AS n_events,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / 100.0
                   AS sum_value
        FROM grouped
        GROUP BY user_id, sid
        ORDER BY user_id, session_start_us
    """,
    description="Session windows per user with a 30-minute inactivity gap "
    "(session_window); oracle is the gaps-and-islands formulation with "
    "exact integer-µs gap arithmetic. A new session starts when the gap "
    "is ≥ 30 min (Spark sessions are half-open [start, last+gap)).",
)
def stream_session_30m(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Round-15 re-plan (VERDICT r14 item 5; guide §2.4): range-
    # partition the events by user_id BEFORE the session aggregation.
    # RangePartitioning(user_id) satisfies the session merge's
    # ClusteredDistribution AND (prefix rule) the final ORDER BY
    # (user_id, session_start_us)'s OrderedDistribution, so the plan
    # carries ONE exchange instead of two and the range-boundary
    # sampling job re-executes only the scan, not the whole
    # MergingSessions reduce side. The shuffled rows are also
    # NARROWER: the raw (user_id, ts, value) triple crosses the wire
    # instead of the per-event partial-aggregate rows with their
    # [start,end) session-window struct (guide §2.3). DataFrame form
    # deliberately — SQL view resolution attaches attribute
    # qualifiers that break RangePartitioning.satisfies' structural
    # SortOrder equality, so the SQL-text body keeps the second
    # exchange (measured, round 15). Declared ORDER BY unchanged.
    return session_30m_unsorted(spark, sf_dir, ordered=True)


def session_30m_unsorted(
    spark: SparkSession, sf_dir: str, *, ordered: bool = False
) -> DataFrame:
    """The stream_session_30m aggregation, optionally without its final
    presentation ORDER BY — the single source of the session body, so
    tuning harnesses that need the sort-free form measure exactly the
    registered operator's plan. Round-15: DataFrame form with the
    range repartition established before the aggregation (see
    stream_session_30m's plan note); the unordered variant keeps the
    identical aggregation subtree so A/B bodies stay comparable."""
    ev = load(spark, sf_dir, "events")
    sess = (
        ev.select("user_id", "ts", "value")
        .repartitionByRange("user_id")
        .groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (
                F.sum(F.floor(F.col("value") * 100.0 + F.lit(0.5))).cast(
                    "double"
                )
                / 100.0
            ).alias("sum_value"),
        )
        .select(
            "user_id",
            F.unix_micros(F.col("w.start")).alias("session_start_us"),
            "n_events",
            "sum_value",
        )
    )
    return sess.orderBy("user_id", "session_start_us") if ordered else sess


@register(
    "stream_ohlc_bars",
    oracle_sql="""
        SELECT epoch_us(date_trunc('hour', ts)) AS bucket_us,
               event_type,
               arg_min(value, ts) AS open,
               max(value) AS high,
               min(value) AS low,
               arg_max(value, ts) AS close,
               count(*) AS n,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / 100.0
                   AS volume
        FROM events
        GROUP BY 1, 2
        ORDER BY 1, 2
    """,
    description="Hourly OHLC bars of value per event_type: open/close via "
    "min_by/max_by on ts (ts values are unique in the fixtures — verified "
    "— so no further tie-break is needed), high/low/volume as plain aggs. "
    "The canonical bid/ask bar builder.",
)
def stream_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), F.col("event_type"))
        .agg(
            F.min_by("value", "ts").alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", "ts").alias("close"),
            F.count(F.lit(1)).alias("n"),
            exact_sum("value", 100).alias("volume"),
        )
        .select(
            F.unix_micros("w.start").alias("bucket_us"),
            "event_type",
            "open",
            "high",
            "low",
            "close",
            "n",
            "volume",
        )
        .orderBy("bucket_us", "event_type")
    )


@register(
    "stream_watermark_dedup",
    oracle_sql=None,  # watermark/late-data behavior is not SQL-expressible.
    description="Dedup on event_id under a 1-hour event-time watermark. "
    "On this finite batch input the watermark is a no-op and event_ids "
    "are unique, so the batch form reduces to dropDuplicates; the real "
    "stateful streaming form (withWatermark + dropDuplicates over an "
    "availableNow replay) lives in streaming/replay.py and is asserted "
    "equal in tests/test_streaming.py.",
)
def stream_watermark_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return (
        ev.withWatermark("ts", "1 hour")
        .dropDuplicates(["event_id"])
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_unique_events"))
        .orderBy("event_type")
    )


@register(
    "cep_funnel_pattern",
    oracle_sql="""
        WITH seq AS (
            SELECT user_id,
                   string_agg(substring(event_type, 1, 1), ''
                              ORDER BY epoch_us(ts), event_id) AS s
            FROM events
            GROUP BY user_id
        )
        SELECT user_id,
               CAST(length(s) AS BIGINT) AS n_events,
               CAST(len(regexp_extract_all(s, 'vcp')) AS BIGINT) AS n_funnels
        FROM seq
        WHERE len(regexp_extract_all(s, 'vcp')) >= 1
        ORDER BY user_id
    """,
    description="Complex-event-processing pattern detection: each "
    "user's event history is ordered into a symbol string (first "
    "letter of event_type; the five fixture types have distinct "
    "initials) and scanned for the contiguous view→click→purchase "
    "motif — MATCH_RECOGNIZE semantics expressed as collect-sort-"
    "regex, the sequence-mining shape session funnels and fraud "
    "rules share. Ordering is (µs epoch, event_id) on BOTH engines "
    "(raw ns timestamps are never compared), and the literal pattern "
    "has identical non-overlapping scan semantics in Java regex and "
    "RE2. One user_id shuffle; per-user state is the event string — "
    "at 100 TB sessions would be windowed first so strings stay "
    "bounded (SCALE.md).",
)
def cep_funnel_pattern(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    seq = ev.groupBy("user_id").agg(
        F.concat_ws(
            "",
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            F.unix_micros("ts").alias("us"),
                            F.col("event_id").alias("eid"),
                            F.substring("event_type", 1, 1).alias("ch"),
                        )
                    )
                ),
                lambda x: x["ch"],
            ),
        ).alias("s")
    )
    return (
        seq.select(
            "user_id",
            F.length("s").cast("long").alias("n_events"),
            F.regexp_count("s", F.lit("vcp")).cast("long").alias("n_funnels"),
        )
        .filter(F.col("n_funnels") >= 1)
        .orderBy("user_id")
    )


@register(
    "stream_tumbling_append_closed",
    oracle_sql="""
        WITH m AS (
            SELECT max(ts) AS mx FROM events
        ), w AS (
            SELECT date_trunc('hour', ts) AS ws,
                   event_type,
                   count(*) AS n,
                   CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE)
                       / 100.0 AS sum_value
            FROM events
            GROUP BY ws, event_type
        )
        SELECT epoch_us(ws) AS bucket_us, event_type, n, sum_value
        FROM w, m
        WHERE ws + INTERVAL 1 HOUR <= mx - INTERVAL 1 HOUR
        ORDER BY bucket_us, event_type
    """,
    description="TRUE streaming tumbling aggregate in APPEND mode: a "
    "readStream replay with a 1-hour event-time watermark emits a "
    "window only once the watermark closes it, which is what lets the "
    "state store EVICT the window — the production pattern for "
    "unbounded streams (complete mode would retain all windows "
    "forever). On a finite availableNow replay the final watermark is "
    "max(ts) - 1h, so the emitted set is exactly the windows with "
    "end <= max(ts) - 1h — deterministic regardless of micro-batch "
    "boundaries (verified identical at sf0.001/0.01/0.1), which makes "
    "this hash-gradable: the oracle reconstructs the closed-window "
    "set. The two trailing open windows per type are withheld by "
    "design — that is the append-mode semantics under test.",
)
def stream_tumbling_append_closed(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Lazy import: replay helpers stage a temp dir; keep module import thin.
    from etl_intraday_bidask_spark.streaming.replay import (
        _read_events_stream,
        _run_to_memory,
    )

    ev = _read_events_stream(spark, sf_dir).withWatermark("ts", "1 hour")
    agg = (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            exact_sum("value", 100).alias("sum_value"),
        )
        .select(
            F.unix_micros("w.start").alias("bucket_us"),
            "event_type",
            "n",
            "sum_value",
        )
    )
    return _run_to_memory(agg, "append").orderBy("bucket_us", "event_type")


@register(
    "stream_sliding_append_closed",
    oracle_sql="""
        WITH m AS (
            SELECT max(ts) AS mx FROM events
        ), w AS (
            SELECT (epoch_us(ts) // 900000000 - k.k) * 900000000
                       AS win_start_us,
                   event_type,
                   count(*) AS n,
                   CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE)
                       / 100.0 AS sum_value
            FROM events
            CROSS JOIN (VALUES (0), (1), (2), (3)) AS k(k)
            GROUP BY 1, 2
        )
        SELECT win_start_us, event_type, n, sum_value
        FROM w, m
        WHERE win_start_us + 3600000000 <= epoch_us(mx) - 3600000000
        ORDER BY win_start_us, event_type
    """,
    description="TRUE streaming sliding windows in APPEND mode: "
    "window(ts, '1 hour', '15 minutes') under a 1-hour watermark on a "
    "readStream availableNow replay — each of the 4 overlapping "
    "windows an event lands in is emitted exactly once, when the "
    "watermark passes its end, which is what lets the state store "
    "evict it (complete mode retains every window forever). The final "
    "watermark of the finite replay is max(ts) − 1h, so the emitted "
    "set is exactly the windows with end ≤ max(ts) − 1h — "
    "deterministic across micro-batch boundaries, making the "
    "append-mode lifecycle itself hash-gradable; the ~4 trailing open "
    "windows per type are withheld by design.",
)
def stream_sliding_append_closed(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_intraday_bidask_spark.streaming.replay import (
        _read_events_stream,
        _run_to_memory,
    )

    ev = _read_events_stream(spark, sf_dir).withWatermark("ts", "1 hour")
    agg = (
        ev.groupBy(
            F.window("ts", "1 hour", "15 minutes").alias("w"),
            F.col("event_type"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            exact_sum("value", 100).alias("sum_value"),
        )
        .select(
            F.unix_micros("w.start").alias("win_start_us"),
            "event_type",
            "n",
            "sum_value",
        )
    )
    return _run_to_memory(agg, "append").orderBy("win_start_us", "event_type")


@register(
    "stream_session_append_closed",
    oracle_sql="""
        WITH m AS (
            SELECT max(ts) AS mx FROM events
        ), pts AS (
            SELECT user_id, ts,
                   -- >= not >: Spark session_window is half-open
                   -- [t, t+gap), so an event landing exactly at the
                   -- previous session's end starts a NEW session.
                   CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER (
                            PARTITION BY user_id ORDER BY ts, event_id)
                            >= 1800000000
                         OR lag(ts) OVER (
                            PARTITION BY user_id ORDER BY ts, event_id)
                            IS NULL
                        THEN 1 ELSE 0 END AS brk
            FROM events
        ), isl AS (
            SELECT user_id, ts,
                   sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                                  ROWS UNBOUNDED PRECEDING) AS sid
            FROM pts
        ), sess AS (
            SELECT user_id, sid,
                   epoch_us(min(ts)) AS session_start_us,
                   epoch_us(max(ts)) + 1800000000 AS session_end_us,
                   count(*) AS n_events
            FROM isl
            GROUP BY user_id, sid
        )
        SELECT session_start_us, session_end_us, user_id,
               CAST(n_events AS BIGINT) AS n_events
        FROM sess, m
        WHERE session_end_us <= epoch_us(mx) - 1800000000
        ORDER BY session_start_us, user_id
    """,
    description="TRUE streaming session windows in APPEND mode: a "
    "readStream replay with a 30-minute watermark emits a session only "
    "once the watermark passes its end (last event + gap), which is "
    "what lets per-user session state be EVICTED — the unbounded-"
    "stream production configuration (complete mode retains every "
    "session forever). On the finite availableNow replay the emitted "
    "set is exactly the sessions with end ≤ max(ts) − 30min — "
    "deterministic across micro-batching (verified identical at "
    "sf0.001 and sf0.01 against the gaps-and-islands reconstruction), "
    "so the stateful session lifecycle itself is hash-graded.",
)
def stream_session_append_closed(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_intraday_bidask_spark.streaming.replay import (
        _read_events_stream,
        _run_to_memory,
    )

    ev = _read_events_stream(spark, sf_dir).withWatermark("ts", "30 minutes")
    agg = (
        ev.groupBy(
            F.session_window("ts", "30 minutes").alias("w"), F.col("user_id")
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.unix_micros("w.start").alias("session_start_us"),
            F.unix_micros("w.end").alias("session_end_us"),
            "user_id",
            "n_events",
        )
    )
    return _run_to_memory(agg, "append").orderBy(
        "session_start_us", "user_id"
    )


@register(
    "bidask_twa_quote",
    oracle_sql="""
        WITH quotes AS (
            SELECT user_id, event_id,
                   CAST(round(value * 100) AS BIGINT) AS cents,
                   epoch_us(ts) AS e,
                   lead(epoch_us(ts)) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS ne
            FROM events WHERE event_type = 'view'
        )
        SELECT user_id,
               count(*) AS n_intervals,
               CASE WHEN sum(ne - e) > 0
                    THEN CAST(sum(cents * (ne - e)) AS DOUBLE)
                         / sum(ne - e) / 100.0
               END AS twa_quote
        FROM quotes
        WHERE ne IS NOT NULL
        GROUP BY user_id
        ORDER BY user_id
    """,
    description="Time-weighted average quote per user — the "
    "microstructure statistic that corrects simple averages for "
    "irregular quote arrival (a quote standing for an hour must weigh "
    "more than one replaced after a second): each view's exact cent "
    "value weighted by its lifetime until the next view (lead), the "
    "final open-ended quote excluded. One user_id shuffle serves the "
    "lead window and the aggregate; the weighted sum is an exact "
    "cents×µs BIGINT accumulation with two fixed-order divisions at "
    "the end, bit-identical cross-engine (int64 headroom to ~sf1; "
    "larger corpora re-scale the duration unit).",
)
def bidask_twa_quote(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").where(F.col("event_type") == "view")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    quotes = ev.select(
        "user_id",
        scaled_long("value", 100).alias("cents"),
        F.unix_micros("ts").alias("e"),
        F.lead(F.unix_micros("ts")).over(w).alias("ne"),
    ).where(F.col("ne").isNotNull())
    return (
        quotes.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_intervals"),
            # A user whose quotes all share one instant has zero total
            # lifetime: NULL on both engines, not a divide-by-zero
            # (same degenerate-data guard as the zero-variance moments).
            F.when(
                F.sum(F.col("ne") - F.col("e")) > 0,
                F.sum(F.col("cents") * (F.col("ne") - F.col("e"))).cast(
                    "double"
                )
                / F.sum(F.col("ne") - F.col("e"))
                / 100.0,
            ).alias("twa_quote"),
        )
        .orderBy("user_id")
    )


@register(
    "bidask_effective_spread",
    oracle_sql="""
        WITH matched AS (
            SELECT p.user_id, p.value AS pv, v.value AS vv
            FROM (SELECT * FROM events WHERE event_type = 'purchase') p
            ASOF LEFT JOIN (
                SELECT user_id, ts, arg_max(value, event_id) AS value
                FROM events WHERE event_type = 'view'
                GROUP BY user_id, ts
            ) v
              ON p.user_id = v.user_id AND p.ts >= v.ts
        )
        SELECT
            user_id,
            count(*) AS n_purchases,
            count(vv) AS n_matched,
            CAST(sum(CAST(round((pv - vv) * 100) AS BIGINT)) AS DOUBLE)
                / 100.0 / count(vv) AS avg_spread
        FROM matched
        GROUP BY user_id
        ORDER BY user_id
    """,
    description="Effective-spread analytics — the namesake metric of an "
    "intraday bid/ask pipeline: each purchase (taker side) matched to "
    "the latest at-or-before view (quote side) per user via the as-of "
    "window formulation, spread = purchase - matched view, aggregated "
    "per user with exact scaled-integer sums. ONE conditional-"
    "projection scan of events (no per-side re-scan); one shuffle on "
    "user_id serves both the as-of window and the final aggregate. The "
    "(ts, side, event_id) window order makes the Spark side "
    "max-event_id-deterministic under duplicate (user_id, ts) views; "
    "the oracle's arg_max pre-dedup pins the same choice.",
)
def bidask_effective_spread(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Round-11 re-plan (the join_asof_bidask class): the former
    # UNION ALL of two filtered scans read events twice; ONE scan with
    # event_type IN pushed to Parquet and CASE side columns produces
    # the identical row set reading the fact table once.
    merged = (
        load(spark, sf_dir, "events")
        .where(F.col("event_type").isin("view", "purchase"))
        .select(
            "event_id",
            "user_id",
            "ts",
            F.when(
                F.col("event_type") == "purchase", F.col("value")
            ).alias("purchase_value"),
            F.when(F.col("event_type") == "view", F.col("value")).alias(
                "view_value"
            ),
            F.when(F.col("event_type") == "view", 0)
            .otherwise(1)
            .alias("side"),
        )
    )
    # View sorts before purchase at equal ts (side 0 < 1): inclusive
    # at-or-before semantics, same as the ASOF oracle (p.ts >= v.ts).
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "side", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        merged
        .withColumn(
            "prior_view_value", F.last("view_value", ignorenulls=True).over(w)
        )
        .where(F.col("side") == 1)
    )
    spread_scaled = F.round(
        (F.col("purchase_value") - F.col("prior_view_value")) * 100
    ).cast("long")
    return (
        matched.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.count("prior_view_value").alias("n_matched"),
            (
                F.sum(spread_scaled).cast("double")
                / 100.0
                / F.count("prior_view_value")
            ).alias("avg_spread"),
        )
        .orderBy("user_id")
    )


@register(
    "stream_interval_join",
    oracle_sql="""
        SELECT a.event_id AS click_id,
               b.event_id AS purchase_id,
               a.user_id,
               epoch_us(b.ts) - epoch_us(a.ts) AS lag_us
        FROM events a
        JOIN events b
          ON a.user_id = b.user_id
         AND a.event_type = 'click'
         AND b.event_type = 'purchase'
         AND b.ts >= a.ts
         AND b.ts <= a.ts + INTERVAL 30 MINUTE
        ORDER BY click_id, purchase_id
    """,
    description="Event-time interval join: each click joined to the same "
    "user's purchases within the following 30 minutes (conversion "
    "attribution; in the bid/ask domain the identical shape pairs quote "
    "updates with trades inside a validity window). Batch form of the "
    "stream-stream join — the streaming twin (streaming/replay.py) runs "
    "two watermarked streams through Spark's interval-join state "
    "manager, where the 30-minute bound is what lets state be evicted. "
    "At 100 TB both sides shuffle on user_id and the time bound keeps "
    "per-key state O(events in window), not O(history).",
)
def stream_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    clicks = ev.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        "user_id",
        F.col("ts").alias("cts"),
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("user_b"),
        F.col("ts").alias("pts"),
    )
    j = clicks.join(
        purchases,
        (F.col("user_id") == F.col("user_b"))
        & (F.col("pts") >= F.col("cts"))
        & (F.col("pts") <= F.col("cts") + F.expr("INTERVAL 30 MINUTES")),
    )
    return j.select(
        "click_id",
        "purchase_id",
        "user_id",
        (F.unix_micros("pts") - F.unix_micros("cts")).alias("lag_us"),
    ).orderBy("click_id", "purchase_id")


@register(
    "stream_static_enrich",
    oracle_sql="""
        SELECT epoch_us(date_trunc('hour', e.ts)) AS bucket_us,
               c.c_nationkey AS nationkey,
               count(*) AS n,
               CAST(sum(CAST(round(e.value * 100) AS BIGINT)) AS DOUBLE)
                   / 100.0 AS sum_value
        FROM events e
        JOIN customer c ON e.user_id = c.c_custkey
        GROUP BY 1, 2
        ORDER BY 1, 2
    """,
    description="Stream-static enrichment: the event stream joined to "
    "the static customer dimension (broadcast — the stream side is "
    "never shuffled for the join), then hourly bars per nation. The "
    "canonical streaming-ETL enrich-then-aggregate topology; the "
    "streaming twin (streaming/replay.py) runs the same plan under "
    "readStream where the static side is re-broadcast per micro-batch, "
    "so slowly-changing dims pick up updates between batches.",
)
def stream_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    return (
        ev.join(F.broadcast(cust), ev.user_id == F.col("c_custkey"))
        .groupBy(F.window("ts", "1 hour").alias("w"), F.col("c_nationkey"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            exact_sum("value", 100).alias("sum_value"),
        )
        .select(
            F.unix_micros("w.start").alias("bucket_us"),
            F.col("c_nationkey").alias("nationkey"),
            "n",
            "sum_value",
        )
        .orderBy("bucket_us", "nationkey")
    )


@register(
    "stream_dedup_within_watermark",
    oracle_sql="""
        SELECT event_type,
               count(*) AS n_rows,
               count(DISTINCT event_id) AS n_unique
        FROM (SELECT DISTINCT event_id, event_type FROM events)
        GROUP BY event_type
        ORDER BY event_type
    """,
    description="dropDuplicatesWithinWatermark (Spark 3.5+ bounded-"
    "state dedup API): the events stream unioned with itself (every "
    "event arrives twice) and deduplicated on event_id under a 1-hour "
    "watermark — unlike plain dropDuplicates, the dedup state is "
    "EVICTED once the watermark passes an id's event time, which is "
    "what makes exactly-once de-duplication of at-least-once feeds "
    "(Kafka redeliveries, retried uploads) sustainable on unbounded "
    "streams. The synthesized duplicates share their original's "
    "timestamp, so every duplicate lands inside the watermark window "
    "and the emitted set is exactly the distinct events — hash-graded "
    "against the batch DISTINCT per type on BOTH count(*) and "
    "count(DISTINCT): a duplicate emission (the failure "
    "dropDuplicatesWithinWatermark exists to prevent) inflates "
    "n_rows and breaks the hash, a dropped event deflates both.",
)
def stream_dedup_within_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_intraday_bidask_spark.streaming.replay import (
        _read_events_stream,
        _run_to_memory,
    )

    ev1 = _read_events_stream(spark, sf_dir).select(
        "event_id", "ts", "event_type"
    )
    ev2 = _read_events_stream(spark, sf_dir).select(
        "event_id", "ts", "event_type"
    )
    doubled = ev1.unionByName(ev2).withWatermark("ts", "1 hour")
    deduped = doubled.dropDuplicatesWithinWatermark(["event_id"])
    out = _run_to_memory(deduped.select("event_id", "event_type"), "append")
    return (
        out.groupBy("event_type")
        .agg(
            F.count("*").alias("n_rows"),
            F.countDistinct("event_id").alias("n_unique"),
        )
        .orderBy("event_type")
    )


@register(
    "stream_interval_join_outer",
    oracle_sql="""
        WITH c AS (
            SELECT event_id AS click_id, user_id, ts AS cts
            FROM events WHERE event_type = 'click'
        ), p AS (
            SELECT event_id AS purchase_id, user_id AS user_b, ts AS pts
            FROM events WHERE event_type = 'purchase'
        ), w AS (
            SELECT least((SELECT max(cts) FROM c),
                         (SELECT max(pts) FROM p))
                   - INTERVAL 1 HOUR AS wm
        ), matches AS (
            SELECT click_id, purchase_id, c.user_id
            FROM c JOIN p
              ON c.user_id = p.user_b
             AND pts >= cts AND pts <= cts + INTERVAL 30 MINUTE
        ), unmatched AS (
            SELECT click_id, NULL AS purchase_id, user_id
            FROM c, w
            WHERE cts + INTERVAL 30 MINUTE < wm
              AND NOT EXISTS (
                  SELECT 1 FROM p
                  WHERE p.user_b = c.user_id
                    AND p.pts >= c.cts
                    AND p.pts <= c.cts + INTERVAL 30 MINUTE)
        )
        SELECT click_id, purchase_id, user_id FROM matches
        UNION ALL
        SELECT click_id, purchase_id, user_id FROM unmatched
        ORDER BY click_id, purchase_id
    """,
    description="Stream-stream LEFT OUTER interval join: clicks joined "
    "to purchases within 30 minutes, and a click with NO purchase is "
    "emitted with NULLs only once the watermark proves no match can "
    "still arrive — the state-eviction semantics that make outer "
    "stream joins possible at all (matches emit immediately; unmatched "
    "rows emit exactly when their join window closes under the "
    "watermark, which is also the moment their state is dropped). On "
    "the finite availableNow replay the final watermark is "
    "min(max cts, max pts) − 1h, so the emitted set is matches plus "
    "the unmatched clicks whose 30-minute window closed STRICTLY "
    "before the watermark (Spark evicts left state only when wm > "
    "cts + 30min, not >= — probed empirically with a boundary-exact "
    "synthetic stream, see tests/test_streaming.py) — deterministic "
    "across micro-batching (verified identical across runs), which "
    "lets the oracle reconstruct it and hash-grade the eviction "
    "behavior itself.",
)
def stream_interval_join_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_intraday_bidask_spark.streaming.replay import (
        _read_events_stream,
        _run_to_memory,
    )

    clicks = (
        _read_events_stream(spark, sf_dir)
        .where(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            "user_id",
            F.col("ts").alias("cts"),
        )
        .withWatermark("cts", "1 hour")
    )
    purchases = (
        _read_events_stream(spark, sf_dir)
        .where(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("user_b"),
            F.col("ts").alias("pts"),
        )
        .withWatermark("pts", "1 hour")
    )
    j = clicks.join(
        purchases,
        F.expr(
            "user_id = user_b AND pts >= cts "
            "AND pts <= cts + interval 30 minutes"
        ),
        "left_outer",
    )
    out = _run_to_memory(
        j.select("click_id", "purchase_id", "user_id"), "append"
    )
    return out.orderBy("click_id", "purchase_id")


@register(
    "rollup_time_hierarchy",
    oracle_sql="""
        SELECT coalesce(epoch_us(date_trunc('day', ts)), -1) AS day_us,
               coalesce(epoch_us(date_trunc('hour', ts)), -1) AS hour_us,
               count(*) AS n,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / 100.0
                   AS sum_value
        FROM events
        GROUP BY ROLLUP (date_trunc('day', ts), date_trunc('hour', ts))
        ORDER BY day_us, hour_us
    """,
    description="Time-hierarchy rollup (the hypertable continuous-"
    "aggregate shape): one pass over events produces hour-level bars, "
    "day-level subtotals, and the grand total via ROLLUP on the "
    "(day, hour) truncation hierarchy — Expand multiplies rows by the "
    "3 grouping levels BEFORE the shuffle and partial aggregation "
    "collapses each level map-side, so the shuffle carries ~|groups| "
    "rows. Null subtotal keys are emitted as -1 sentinels (both "
    "engines), never raw NULL timestamps.",
)
def rollup_time_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    day = F.date_trunc("day", F.col("ts"))
    hour = F.date_trunc("hour", F.col("ts"))
    # The truncations were already pre-projected; round-11 moves the
    # cents chain below the Expand too (the agg_rollup class from round
    # 10): ROLLUP triples every scan row before the partial aggregate
    # and evaluates aggregate-input arithmetic per EXPANDED row —
    # pre-projecting floor(value*100+0.5) evaluates it once per scan
    # row, identical values at every scale.
    return (
        ev.select(
            F.unix_micros(day).alias("d_us"), F.unix_micros(hour).alias("h_us"),
            scaled_long("value", 100).alias("v_cents"),
        )
        .rollup("d_us", "h_us")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.sum("v_cents").cast("double") / F.lit(100.0)).alias(
                "sum_value"
            ),
        )
        .select(
            F.coalesce("d_us", F.lit(-1)).alias("day_us"),
            F.coalesce("h_us", F.lit(-1)).alias("hour_us"),
            "n",
            "sum_value",
        )
        .orderBy("day_us", "hour_us")
    )


@register(
    "bidask_realized_vol",
    oracle_sql="""
        WITH ticks AS (
            SELECT user_id,
                   CAST(floor(epoch(date_trunc('day', ts))) AS BIGINT)
                       AS day_s,
                   ln(CAST(floor(value * 100 + 0.5) AS BIGINT)
                      / CAST(lag(CAST(floor(value * 100 + 0.5) AS BIGINT))
                             OVER (PARTITION BY user_id ORDER BY ts, event_id)
                             AS DOUBLE)) AS r
            FROM events
            WHERE value > 0
        )
        SELECT user_id,
               day_s,
               count(r) AS n_returns,
               round(sum(r * r), 4) AS realized_var
        FROM ticks
        WHERE r IS NOT NULL
        GROUP BY user_id, day_s
        ORDER BY user_id, day_s
    """,
    description="Realized variance per user per day: Σ of squared "
    "tick-to-tick log returns (the market-microstructure volatility "
    "estimator; here over the value stream, exactly the quote-stream "
    "computation). Log returns are ln of a ratio of exact cent "
    "integers, so both engines feed ln the identical rational; the "
    "daily Σr² is round(4) (irrational policy). One user_id shuffle "
    "for the lag window, then a (user, day) aggregate — the window's "
    "partitioning prefix makes the second exchange a cheap sub-"
    "partition.",
)
def bidask_realized_vol(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_intraday_bidask_spark.functions.parity import scaled_long

    ev = load(spark, sf_dir, "events").where(F.col("value") > 0)
    cents = scaled_long("value", 100)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ticks = ev.select(
        "user_id",
        F.unix_seconds(F.date_trunc("day", F.col("ts"))).alias("day_s"),
        F.ln(cents / F.lag(cents).over(w).cast("double")).alias("r"),
    )
    return (
        ticks.where(F.col("r").isNotNull())
        .groupBy("user_id", "day_s")
        .agg(
            F.count("r").alias("n_returns"),
            F.round(F.sum(F.col("r") * F.col("r")), 4).alias("realized_var"),
        )
        .orderBy("user_id", "day_s")
    )


@register(
    "bidask_vwap_hourly",
    oracle_sql="""
        SELECT epoch_us(date_trunc('hour', ts)) AS bucket_us,
               event_type,
               CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)
                        * CAST(json_extract_string(props, '$.k') AS BIGINT))
                    AS DOUBLE)
                   / sum(CAST(json_extract_string(props, '$.k') AS BIGINT))
                   / 100.0 AS vwap,
               CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT))
                    AS BIGINT) AS total_size
        FROM events
        WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) > 0
        GROUP BY 1, 2
        ORDER BY 1, 2
    """,
    description="Hourly VWAP per event_type: Σ(price × size)/Σ(size) "
    "with price as exact cents and the JSON k property as size — both "
    "sums are exact BIGINTs, so the volume-weighted average is two "
    "IEEE divisions of identical integers (no rounding needed). The "
    "canonical intraday execution-quality metric; a single two-phase "
    "hash aggregate, trivially incremental (additive numerator/"
    "denominator — the same partials the high-water refresh merges).",
)
def bidask_vwap_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_intraday_bidask_spark.functions.parity import scaled_long

    ev = load(spark, sf_dir, "events")
    size = F.get_json_object("props", "$.k").cast("long")
    cents = scaled_long("value", 100)
    return (
        ev.where(size > 0)
        .groupBy(F.window("ts", "1 hour").alias("w"), F.col("event_type"))
        .agg(
            (
                F.sum(cents * size).cast("double") / F.sum(size) / 100.0
            ).alias("vwap"),
            F.sum(size).alias("total_size"),
        )
        .select(
            F.unix_micros("w.start").alias("bucket_us"),
            "event_type",
            "vwap",
            "total_size",
        )
        .orderBy("bucket_us", "event_type")
    )


@register(
    "densify_interpolate_linear",
    oracle_sql="""
        WITH spine AS (
            SELECT CAST(unnest(generate_series(
                       DATE '2024-01-01', DATE '2024-01-30',
                       INTERVAL 1 DAY)) AS DATE) AS day
        ), daily AS (
            SELECT CAST(ts AS DATE) AS day,
                   sum(CAST(round(value * 100) AS BIGINT)) AS cents
            FROM events
            WHERE event_type = 'purchase' AND user_id % 7 = 0
            GROUP BY day
        ), grid AS (
            SELECT s.day, d.cents,
                   CAST(s.day - DATE '2024-01-01' AS BIGINT) AS x
            FROM spine s LEFT JOIN daily d ON s.day = d.day
        ), fenced AS (
            SELECT day, cents, x,
                   max(CASE WHEN cents IS NOT NULL THEN x END) OVER (
                       ORDER BY x ROWS UNBOUNDED PRECEDING) AS px,
                   min(CASE WHEN cents IS NOT NULL THEN x END) OVER (
                       ORDER BY x ROWS BETWEEN CURRENT ROW
                           AND UNBOUNDED FOLLOWING) AS nx,
                   last_value(cents IGNORE NULLS) OVER (
                       ORDER BY x ROWS UNBOUNDED PRECEDING) AS pv,
                   first_value(cents IGNORE NULLS) OVER (
                       ORDER BY x ROWS BETWEEN CURRENT ROW
                           AND UNBOUNDED FOLLOWING) AS nv
            FROM grid
        )
        SELECT day,
               CAST(cents IS NOT NULL AS BOOLEAN) AS observed,
               CASE
                   WHEN cents IS NOT NULL THEN CAST(cents AS DOUBLE) / 100.0
                   WHEN pv IS NULL OR nv IS NULL THEN NULL
                   WHEN nx = px THEN CAST(pv AS DOUBLE) / 100.0
                   ELSE (CAST(pv AS DOUBLE)
                         + CAST((x - px) * (nv - pv) AS DOUBLE)
                           / CAST(nx - px AS DOUBLE)) / 100.0
               END AS value_filled
        FROM fenced
        ORDER BY day
    """,
    description="Time-series gap imputation: a sparse daily series "
    "(purchases of a 1-in-7 user cohort) densified onto the calendar "
    "spine and LINEARLY INTERPOLATED between the nearest observed "
    "neighbors — the imputation step feature pipelines run before "
    "modeling. Prev/next observation via last/first_value IGNORE "
    "NULLS windows; the interpolation is arithmetic on exact cent "
    "and day integers with two IEEE divisions, bit-identical "
    "cross-engine. Leading/trailing gaps stay NULL (documented "
    "semantics). Single-series frame here; at scale the windows "
    "partition by series key.",
)
def densify_interpolate_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    daily = (
        ev.filter(
            (F.col("event_type") == "purchase") & (F.col("user_id") % 7 == 0)
        )
        # event_type is the series key: constant 'purchase' after the
        # filter (so the grouping is unchanged), but a real column — a
        # literal key would be constant-folded out of the window spec by
        # Catalyst, silently reverting to a global window.
        .groupBy(F.to_date("ts").alias("day"), F.col("event_type").alias("sk"))
        .agg(F.sum(scaled_long("value", 100)).alias("cents"))
    )
    spine = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit("2024-01-01").cast("date"),
                F.lit("2024-01-30").cast("date"),
            )
        ).alias("day")
    )
    grid = spine.join(daily, "day", "left").select(
        # Spine days with no observation get a NULL sk from the left
        # join; coalesce onto the single series so every grid row lands
        # in the same partition-key group. One series here, but the
        # windows partition on sk so the same plan distributes when the
        # pipeline densifies many series (per-symbol, per-user).
        F.coalesce(F.col("sk"), F.lit("purchase")).alias("sk"),
        "day",
        "cents",
        F.datediff("day", F.lit("2024-01-01").cast("date"))
        .cast("long")
        .alias("x"),
    )
    wb = (
        Window.partitionBy("sk")
        .orderBy("x")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wf = (
        Window.partitionBy("sk")
        .orderBy("x")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    x_obs = F.when(F.col("cents").isNotNull(), F.col("x"))
    fenced = grid.select(
        "day",
        "cents",
        "x",
        F.max(x_obs).over(wb).alias("px"),
        F.min(x_obs).over(wf).alias("nx"),
        F.last("cents", ignorenulls=True).over(wb).alias("pv"),
        F.first("cents", ignorenulls=True).over(wf).alias("nv"),
    )
    interp = (
        F.col("pv").cast("double")
        + ((F.col("x") - F.col("px")) * (F.col("nv") - F.col("pv"))).cast(
            "double"
        )
        / (F.col("nx") - F.col("px")).cast("double")
    ) / 100.0
    return (
        fenced.select(
            "day",
            F.col("cents").isNotNull().alias("observed"),
            F.when(
                F.col("cents").isNotNull(), F.col("cents").cast("double") / 100.0
            )
            .when(F.col("pv").isNull() | F.col("nv").isNull(), F.lit(None))
            .when(F.col("nx") == F.col("px"), F.col("pv").cast("double") / 100.0)
            .otherwise(interp)
            .alias("value_filled"),
        )
        .orderBy("day")
    )
