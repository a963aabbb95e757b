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
