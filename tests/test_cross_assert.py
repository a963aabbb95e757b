"""Cross-assertions between operator pairs that declare identical
semantics through different physical plans (SURVEY.md §5): the global
RANGE-window anchor vs its bucketed equi-join twin. Open since the
round-2 VERDICT; closes the `win_range_frame` design-debt item."""

from __future__ import annotations

from etl_intraday_bidask_spark.registry import load_all_operators
from tests.conftest import SF_SMALL

REGISTRY = load_all_operators()


def test_win_range_frame_equals_dist_twin(spark):
    """win_range_frame (semantic anchor: one global RANGE window) and
    win_range_frame_dist (scale path: two-bucket probe + equi join)
    must produce identical rows — the machine-checked proof that the
    distributed rewrite preserves the anchor's semantics."""
    anchor = REGISTRY["win_range_frame"].spark_fn(spark, SF_SMALL)
    dist = REGISTRY["win_range_frame_dist"].spark_fn(spark, SF_SMALL)
    assert sorted(anchor.columns) == sorted(dist.columns)
    a = sorted(map(tuple, anchor.collect()))
    d = sorted(map(tuple, dist.select(*anchor.columns).collect()))
    assert a == d, "bucketed rewrite diverges from the RANGE-window anchor"
