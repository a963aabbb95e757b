"""Parity tests for the STAGED round-7 wave C
(operators/staged_r7.py) — same harness as tests/test_staged_r6.py,
separate dict so round-6 activation can't over-register."""

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


def test_staged_r7_not_registered():
    from etl_intraday_bidask_spark.registry import load_all_operators
    from etl_intraday_bidask_spark.operators.staged_r6 import STAGED

    registry = load_all_operators()
    leaked = sorted(set(STAGED_R7) & set(registry))
    assert not leaked, f"wave C leaked into the registry: {leaked}"
    overlap = sorted(set(STAGED_R7) & set(STAGED))
    assert not overlap, f"wave C collides with wave A/B names: {overlap}"
