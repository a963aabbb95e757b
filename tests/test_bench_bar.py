"""Unit pins for bench.bar_reading — the ONE shared implementation
behind bar_r13 (continuity series, no exclusions) and bar_r14
(json_get excluded as a named engine constant, BASELINE.md round-14
addendum). Pure-python: no SparkSession needed.

Pinned here because the bar is the driver-visible perf verdict; a
silent change to its thresholds or evaluability rules would change
what "pass" means mid-series without a diff anyone reviews.
"""

from __future__ import annotations

import bench


# A synthetic healthy window: 11 headliners, most at parity.
MARGINAL = {f"q{i}": 0.100 for i in range(10)}
MARGINAL["json_get"] = 0.300
LIVE = {f"q{i}": 0.100 for i in range(10)}
LIVE["json_get"] = 0.020  # 15x live marginal — the engine constant


def test_bar_pass_on_ok_window():
    bar = bench.bar_reading(MARGINAL, LIVE, "ok")
    assert bar["pass"] is True
    assert bar["suite_ok"] and bar["queries_ok"]
    assert bar["queries_le_2x_live_marginal"] == 10
    assert "excluded_engine_constants" not in bar
    assert "suite_marginal_ratio_live" in bar


def test_bar_exclusion_changes_key_not_threshold():
    bar = bench.bar_reading(MARGINAL, LIVE, "ok", exclude=("json_get",))
    assert bar["excluded_engine_constants"] == ["json_get"]
    assert "suite_marginal_ratio_live_excl" in bar
    assert bar["suite_marginal_ratio_live_excl"] == 1.0
    # The >=6 count threshold is ABSOLUTE — exclusion shrinks the
    # universe to 10 but never the bar.
    assert bar["queries_le_2x_live_marginal"] == 10
    assert bar["pass"] is True


def test_bar_fail_on_ok_window_is_recorded_false():
    slow = {n: v * 10 for n, v in MARGINAL.items()}
    bar = bench.bar_reading(slow, LIVE, "ok")
    assert bar["pass"] is False
    assert not bar["suite_ok"]


def test_jvm_degraded_pass_is_conservative_valid():
    bar = bench.bar_reading(MARGINAL, LIVE, "jvm_degraded:warmed_floor_ms")
    assert bar["pass"] is True
    assert "conservative-valid" in bar["note"]


def test_jvm_degraded_fail_is_null_not_false():
    slow = {n: v * 10 for n, v in MARGINAL.items()}
    bar = bench.bar_reading(slow, LIVE, "jvm_degraded:warmed_floor_ms")
    assert bar["pass"] is None
    assert "indistinguishable" in bar["note"]


def test_degraded_window_is_never_evaluable():
    bar = bench.bar_reading(MARGINAL, LIVE, "degraded:warmed_floor_ms")
    assert bar["pass"] is None
    # Even a would-be pass stays null: absolute numbers grade the host.
    assert bar["suite_ok"] and bar["queries_ok"]


def test_no_anchors_is_explicit_not_missing():
    bar = bench.bar_reading(MARGINAL, {}, "ok")
    assert bar["pass"] is None
    assert "not evaluable" in bar["note"]


def test_exclusion_of_every_anchor_degrades_to_not_evaluable():
    only = {"json_get": 0.020}
    bar = bench.bar_reading(MARGINAL, only, "ok", exclude=("json_get",))
    assert bar["pass"] is None


def test_suite_threshold_boundary():
    # ratio exactly 2.8 passes; 2.81 fails (rounded reading is the bar).
    m = {f"q{i}": 0.280 for i in range(7)}
    a = {f"q{i}": 0.100 for i in range(7)}
    bar = bench.bar_reading(m, a, "ok")
    assert bar["suite_ok"] and bar["queries_le_2x_live_marginal"] == 0
    assert bar["pass"] is False  # queries_ok fails: 0 < 6
