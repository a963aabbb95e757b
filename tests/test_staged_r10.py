"""Parity tests for wave F (operators/staged_r10.py).

Staged in round 6, ACTIVATED in round 10 — the registry-driven sweeps
now cover these ops too; this file keeps the direct oracle-parity
drive plus the activation guard that pins the round-10 window
composition."""

from __future__ import annotations

import pytest

from etl_intraday_bidask_spark.operators.staged_r10 import STAGED_R10
from tests.conftest import SF_SMALL
from tests.test_parity import normalize


@pytest.mark.parametrize("name", sorted(STAGED_R10))
def test_staged_r10_parity(spark, duck_small, name):
    spec = STAGED_R10[name]
    df = spec.spark_fn(spark, SF_SMALL)
    s_rows, s_cols = df.collect(), df.columns
    if spec.oracle_sql is None:
        assert len(s_rows) >= 1
        return
    rel = duck_small.sql(spec.oracle_sql)
    d_rows, d_cols = rel.fetchall(), list(rel.columns)
    assert sorted(s_cols) == sorted(d_cols), (
        f"{name}: columns {s_cols} vs {d_cols}"
    )
    assert len(s_rows) == len(d_rows), (
        f"{name}: rows {len(s_rows)} vs {len(d_rows)}"
    )
    assert normalize(s_rows, s_cols) == normalize(d_rows, d_cols), (
        f"{name}: value mismatch"
    )


def test_wave_f_activated():
    """Round 10 activated wave F: all 50 staged_r10 ops are in the
    global registry with their exact staged specs, and the wave is
    exactly the driver's 50-slot window (every key never-graded as of
    r09, everything else green r1-r9)."""
    import __spark_entry__ as entry
    from etl_intraday_bidask_spark.operators.staged_r6 import STAGED
    from etl_intraday_bidask_spark.operators.staged_r7 import STAGED_R7
    from etl_intraday_bidask_spark.operators.staged_r8 import STAGED_R8
    from etl_intraday_bidask_spark.operators.staged_r9 import STAGED_R9
    from etl_intraday_bidask_spark.registry import load_all_operators

    registry = load_all_operators()
    assert len(STAGED_R10) == 50
    missing = sorted(set(STAGED_R10) - set(registry))
    assert not missing, f"wave-F ops not activated: {missing}"
    for name, spec in STAGED_R10.items():
        assert registry[name] is spec, f"{name}: registry spec diverged"
    assert set(entry._DEFER_NEW_R10) == set(STAGED_R10), (
        "_DEFER_NEW_R10 and the staged wave diverge"
    )
    overlap = sorted(
        set(STAGED_R10)
        & (
            set(STAGED)
            | set(STAGED_R7)
            | set(STAGED_R8)
            | set(STAGED_R9)
        )
    )
    assert not overlap, f"wave F collides with earlier waves: {overlap}"


def test_state_store_rows_match_distinct_keys(spark):
    """The engine-reported dedup state rows must equal the number of
    distinct (user_id, event_type) keys — the deterministic subset of
    the rows-only metrics op."""
    from etl_intraday_bidask_spark.tables import load

    rows = STAGED_R10["stream_state_store_metrics"].spark_fn(
        spark, SF_SMALL
    ).collect()
    assert rows, "no state operator metrics captured"
    n_keys = (
        load(spark, SF_SMALL, "events")
        .select("user_id", "event_type")
        .distinct()
        .count()
    )
    assert max(r["state_rows_total"] for r in rows) == n_keys
    assert sum(r["state_rows_updated"] for r in rows) == n_keys


def test_reorder_policy_cross_consistent(spark):
    """EOQ/reorder-point and safety-stock ops reduce the same daily
    demand grain over the same top-10 parts: part sets and demand
    totals must agree."""
    eoq = {
        r["l_partkey"]: r
        for r in STAGED_R10["parts_eoq_reorder_point"]
        .spark_fn(spark, SF_SMALL)
        .collect()
    }
    ss = {
        r["l_partkey"]: r
        for r in STAGED_R10["parts_safety_stock_plan"]
        .spark_fn(spark, SF_SMALL)
        .collect()
    }
    assert set(eoq) == set(ss)
    for k in eoq:
        assert eoq[k]["total_qty"] == ss[k]["total_qty"]
        assert eoq[k]["n_days"] == ss[k]["n_days"]


def test_km_at_risk_monotone(spark):
    """Kaplan-Meier at-risk counts can only shrink with k, deaths are
    bounded by at-risk, and survival factors live in [0, 1e6] ppm."""
    rows = STAGED_R10["events_kaplan_meier_weekly"].spark_fn(
        spark, SF_SMALL
    ).collect()
    prev = None
    for r in sorted(rows, key=lambda x: x["week_k"]):
        assert 0 <= r["n_dead"] <= r["n_risk"]
        assert 0 <= r["factor_ppm"] <= 1000000
        if prev is not None:
            assert r["n_risk"] <= prev
        prev = r["n_risk"]


def test_precision_curve_monotone_slots(spark):
    """P@k slots and hits are non-decreasing in k (supersets)."""
    rows = sorted(
        STAGED_R10["eval_precision_at_k_curve"]
        .spark_fn(spark, SF_SMALL)
        .collect(),
        key=lambda r: r["k"],
    )
    for a, b in zip(rows, rows[1:]):
        assert a["slots"] <= b["slots"]
        assert a["hits"] <= b["hits"]


def test_score_histogram_totals_match_auc(spark):
    """The class-conditional histograms and the AUC op reduce the same
    scored stream: class totals must agree."""
    from etl_intraday_bidask_spark.operators.staged_r8 import STAGED_R8

    hist = STAGED_R10["eval_score_histogram_by_class"].spark_fn(
        spark, SF_SMALL
    ).collect()
    auc = STAGED_R8["eval_auc_exact"].spark_fn(spark, SF_SMALL).collect()[0]
    assert sum(r["n_pos"] for r in hist) == auc["n_pos"]
    assert sum(r["n_neg"] for r in hist) == auc["n_neg"]


def test_simpson_diversity_in_range(spark):
    rows = STAGED_R10["events_simpson_diversity"].spark_fn(
        spark, SF_SMALL
    ).collect()
    assert rows
    for r in rows:
        assert 0 <= r["simpson_diversity_ppm"] < 1000000


def test_checkpoint_recovery_conserves_events(spark):
    """The recovered streaming state must account for every event —
    the exactly-once census cross-checked against the batch count."""
    from etl_intraday_bidask_spark.tables import load

    rows = STAGED_R10["stream_checkpoint_recovery"].spark_fn(
        spark, SF_SMALL
    ).collect()
    n_total = load(spark, SF_SMALL, "events").count()
    assert sum(r["n_events"] for r in rows) == n_total


def test_set_semantics_orderings(spark):
    """UNION <= UNION ALL; INTERSECT <= min side; EXCEPT <= distinct
    side — the lattice every engine must respect."""
    r = STAGED_R10["sql_set_dedup_semantics"].spark_fn(
        spark, SF_SMALL
    ).collect()[0]
    assert r["union_distinct"] <= r["union_all"]
    assert r["intersect_distinct"] <= r["a_distinct"]
    assert r["except_distinct"] <= r["a_distinct"]
    assert r["a_distinct"] <= r["a_all"]
