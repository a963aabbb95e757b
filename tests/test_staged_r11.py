"""Parity tests + leak guard for the STAGED round-11 wave G seeds."""

from __future__ import annotations

import pytest

from etl_intraday_bidask_spark.operators.staged_r11 import STAGED_R11
from tests.conftest import SF_SMALL
from tests.test_parity import normalize


@pytest.mark.parametrize("name", sorted(STAGED_R11))
def test_staged_r11_parity(spark, duck_small, name):
    spec = STAGED_R11[name]
    df = spec.spark_fn(spark, SF_SMALL)
    s_rows, s_cols = df.collect(), df.columns
    if spec.oracle_sql is None:
        assert len(s_rows) >= 1
        return
    rel = duck_small.sql(spec.oracle_sql)
    d_rows, d_cols = rel.fetchall(), list(rel.columns)
    assert sorted(s_cols) == sorted(d_cols)
    assert len(s_rows) == len(d_rows)
    assert normalize(s_rows, s_cols) == normalize(d_rows, d_cols)


def test_staged_r11_not_registered():
    from etl_intraday_bidask_spark.operators.staged_r6 import STAGED
    from etl_intraday_bidask_spark.operators.staged_r7 import STAGED_R7
    from etl_intraday_bidask_spark.operators.staged_r8 import STAGED_R8
    from etl_intraday_bidask_spark.operators.staged_r9 import STAGED_R9
    from etl_intraday_bidask_spark.operators.staged_r10 import (
        STAGED_R10,
    )
    from etl_intraday_bidask_spark.registry import load_all_operators

    registry = load_all_operators()
    leaked = sorted(set(STAGED_R11) & set(registry))
    assert not leaked, f"wave G leaked into the registry: {leaked}"
    overlap = sorted(
        set(STAGED_R11)
        & (
            set(STAGED)
            | set(STAGED_R7)
            | set(STAGED_R8)
            | set(STAGED_R9)
            | set(STAGED_R10)
        )
    )
    assert not overlap, f"wave G collides with earlier waves: {overlap}"
