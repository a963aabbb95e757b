"""Parity tests for the STAGED round-6 wave (operators/staged_r6.py).

These ops are deliberately NOT in the global registry (see the module
docstring: the round-5 grading window stays exactly 27+23), so the
registry-driven sweeps skip them; this file drives the same
oracle-parity check directly so the wave lands in round 6 pre-verified.
"""

from __future__ import annotations

import pytest

from etl_intraday_bidask_spark.operators.staged_r6 import STAGED
from tests.conftest import SF_SMALL
from tests.test_parity import normalize


@pytest.mark.parametrize("name", sorted(STAGED))
def test_staged_parity(spark, duck_small, name):
    spec = STAGED[name]
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


def test_staged_not_registered():
    """The staged wave must NOT leak into the global registry (and thus
    the driver's queries()) before round 6 activates it — the round-5
    window composition depends on it."""
    from etl_intraday_bidask_spark.registry import load_all_operators

    registry = load_all_operators()
    leaked = sorted(set(STAGED) & set(registry))
    assert not leaked, f"staged ops leaked into the registry: {leaked}"
