"""Parity tests for wave C (operators/staged_r7.py).

Staged through rounds 5-6, ACTIVATED in round 7 — the registry-driven
sweeps now cover these ops too; this file keeps the direct
oracle-parity drive plus the activation guard that pins the round-7
window composition."""

from __future__ import annotations

import pytest

from etl_intraday_bidask_spark.operators.staged_r7 import STAGED_R7
from tests.conftest import SF_SMALL
from tests.test_parity import normalize


@pytest.mark.parametrize("name", sorted(STAGED_R7))
def test_staged_r7_parity(spark, duck_small, name):
    spec = STAGED_R7[name]
    df = spec.spark_fn(spark, SF_SMALL)
    s_rows, s_cols = df.collect(), df.columns
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


def test_wave_c_activated():
    """Round 7 activated wave C: all 50 staged_r7 ops are in the global
    registry with their exact staged specs, and the wave is exactly the
    driver's 50-slot window (every key never-graded as of r06,
    everything else green r1-r6)."""
    import __spark_entry__ as entry
    from etl_intraday_bidask_spark.registry import load_all_operators
    from etl_intraday_bidask_spark.operators.staged_r6 import STAGED

    registry = load_all_operators()
    assert len(STAGED_R7) == 50
    missing = sorted(set(STAGED_R7) - set(registry))
    assert not missing, f"wave-C ops not activated: {missing}"
    for name, spec in STAGED_R7.items():
        assert registry[name] is spec, f"{name}: registry spec diverged"
    assert set(entry._DEFER_NEW_R7) == set(STAGED_R7), (
        "_DEFER_NEW_R7 and the staged wave diverge"
    )
    overlap = sorted(set(STAGED_R7) & set(STAGED))
    assert not overlap, f"wave C collides with wave A/B names: {overlap}"


def test_dq_detectors_nonvacuous(spark, tmp_path):
    """Both DQ detectors grade 0-rows-vs-0-rows at the driver's SFs
    (the synthetic orderkey space is dense and no two orders share a
    customer+amount within 7 days), which makes their hash grades
    vacuous — the same trap dedup_cross_source_exact hit in round 6.
    Inject both defect classes into an orders variant and re-run the
    full oracle parity on NON-EMPTY results: three duplicated payments
    (same customer, same cents, +3 days, fresh keys) and two carved
    key-gaps."""
    import os

    import duckdb

    from etl_intraday_bidask_spark.tables import TABLE_NAMES

    variant = str(tmp_path / "dqfix")
    os.makedirs(variant)
    con = duckdb.connect()
    con.execute(f"""
        COPY (
            SELECT * FROM read_parquet('{SF_SMALL}/orders.parquet')
            WHERE o_orderkey NOT BETWEEN 100 AND 104
              AND o_orderkey != 700
            UNION ALL
            SELECT o_orderkey + 2000 AS o_orderkey, o_custkey,
                   o_orderstatus, o_totalprice,
                   o_orderdate + INTERVAL 3 DAY AS o_orderdate,
                   o_orderpriority
            FROM read_parquet('{SF_SMALL}/orders.parquet')
            WHERE o_orderkey IN (10, 20, 30)
        ) TO '{variant}/orders.parquet' (FORMAT parquet)
    """)
    con.close()
    for name in TABLE_NAMES:
        dst = os.path.join(variant, f"{name}.parquet")
        if not os.path.exists(dst):
            os.symlink(os.path.join(SF_SMALL, f"{name}.parquet"), dst)

    vcon = duckdb.connect()
    for name in TABLE_NAMES:
        vcon.execute(
            f"CREATE VIEW {name} AS "
            f"SELECT * FROM read_parquet('{variant}/{name}.parquet')"
        )
    try:
        for op, min_rows in [
            ("dq_duplicate_payment_detect", 3),
            ("dq_key_gap_detect", 3),
        ]:
            spec = STAGED_R7[op]
            df = spec.spark_fn(spark, variant)
            s_rows, s_cols = df.collect(), df.columns
            rel = vcon.sql(spec.oracle_sql)
            d_rows, d_cols = rel.fetchall(), list(rel.columns)
            assert len(s_rows) >= min_rows, (
                f"{op}: injection produced only {len(s_rows)} rows — "
                "the non-vacuous check is itself vacuous"
            )
            assert len(s_rows) == len(d_rows)
            assert normalize(s_rows, s_cols) == normalize(d_rows, d_cols), (
                f"{op}: engines diverge on the injected-defect fixture"
            )
    finally:
        vcon.close()
