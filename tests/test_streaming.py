"""Streaming ≡ batch property tests (SURVEY.md §5): each Structured
Streaming twin, replayed over the same finite events fixture with
availableNow, must produce exactly the batch operator's output."""

from __future__ import annotations

import pytest

from etl_intraday_bidask_spark.registry import load_all_operators
from etl_intraday_bidask_spark.streaming import replay
from tests.conftest import SF_SMALL

REGISTRY = load_all_operators()

TWINS = [
    "stream_tumbling_1h",
    "stream_sliding_1h_15m",
    "stream_session_30m",
    "stream_ohlc_bars",
    "stream_watermark_dedup",
    "stream_interval_join",
    "stream_static_enrich",
]


@pytest.mark.parametrize("name", TWINS)
def test_streaming_equals_batch(spark, name):
    batch_df = REGISTRY[name].spark_fn(spark, SF_SMALL)
    stream_df = getattr(replay, name)(spark, SF_SMALL)
    assert sorted(batch_df.columns) == sorted(stream_df.columns)
    b = sorted(map(tuple, batch_df.collect()))
    s = sorted(
        map(tuple, stream_df.select(*batch_df.columns).collect())
    )
    assert b == s, f"{name}: streaming output != batch output"


def _outer_join_replay(spark, src):
    """Left-outer interval join replayed over a staged parquet dir."""
    import tempfile

    import pyspark.sql.functions as F

    raw = spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)
    clicks = (
        raw.where(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            "user_id",
            F.col("ts").alias("cts"),
        )
        .withWatermark("cts", "1 hour")
    )
    purchases = (
        raw.where(F.col("event_type") == "purchase")
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
    out = replay._run_to_memory(
        j.select("click_id", "purchase_id", "user_id"), "append"
    )
    return {tuple(r) for r in out.collect()}


def test_outer_interval_join_eviction_is_strict(spark, tmp_path):
    """Pins the watermark state-eviction convention the
    stream_interval_join_outer oracle encodes (ADVICE round 4): an
    unmatched left row whose join window closes EXACTLY at the final
    watermark is NOT emitted (strict wm > cts+30min), while one whose
    window closed strictly before the watermark IS."""
    import pandas as pd

    base = pd.Timestamp("2024-01-01 00:00:00")
    minute = pd.Timedelta(minutes=1)

    def stage(max_offset_min):
        rows = [
            ("A", "u1", "click", base),
            ("B", "u2", "click", base + max_offset_min * minute),
            ("P1", "u2", "purchase", base + max_offset_min * minute),
        ]
        pdf = pd.DataFrame(
            rows, columns=["event_id", "user_id", "event_type", "ts"]
        )
        src = str(tmp_path / f"ev_{max_offset_min}")
        spark.createDataFrame(pdf).coalesce(1).write.parquet(src)
        return src

    # Final wm = (base + 90min) - 1h = base + 30min == A's cts + 30min:
    # boundary-exact, Spark does NOT evict/emit A.
    at_boundary = _outer_join_replay(spark, stage(90))
    assert ("A", None, "u1") not in at_boundary
    assert ("B", "P1", "u2") in at_boundary

    # Final wm = base + 31min > A's cts + 30min: strictly past, emits A.
    past_boundary = _outer_join_replay(spark, stage(91))
    assert ("A", None, "u1") in past_boundary
    assert ("B", "P1", "u2") in past_boundary
