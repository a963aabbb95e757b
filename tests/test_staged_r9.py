"""Parity tests + leak guard for the STAGED round-9 wave E
(operators/staged_r9.py) — same harness as tests/test_staged_r6/7/8."""

from __future__ import annotations

import pytest

from etl_intraday_bidask_spark.operators.staged_r9 import STAGED_R9
from tests.conftest import SF_SMALL
from tests.test_parity import normalize


@pytest.mark.parametrize("name", sorted(STAGED_R9))
def test_staged_r9_parity(spark, duck_small, name):
    spec = STAGED_R9[name]
    df = spec.spark_fn(spark, SF_SMALL)
    s_rows, s_cols = df.collect(), df.columns
    if spec.oracle_sql is None:
        # rows-only by design (e.g. _metadata scans DuckDB can't
        # express); the driver grades row count, pinned tests cover
        # the values.
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


def test_staged_r9_not_registered():
    from etl_intraday_bidask_spark.operators.staged_r6 import STAGED
    from etl_intraday_bidask_spark.operators.staged_r7 import STAGED_R7
    from etl_intraday_bidask_spark.operators.staged_r8 import STAGED_R8
    from etl_intraday_bidask_spark.registry import load_all_operators

    registry = load_all_operators()
    leaked = sorted(set(STAGED_R9) & set(registry))
    assert not leaked, f"wave E leaked into the registry: {leaked}"
    overlap = sorted(
        set(STAGED_R9)
        & (set(STAGED) | set(STAGED_R7) | set(STAGED_R8))
    )
    assert not overlap, f"wave E collides with earlier waves: {overlap}"


def test_metadata_size_audit_matches_filesystem(spark):
    """Pin the rows-only _metadata audit to ground truth: the reported
    file_bytes must equal the actual on-disk parquet size and n_rows
    the actual row count."""
    import os

    import duckdb

    rows = (
        STAGED_R9["scan_metadata_size_audit"]
        .spark_fn(spark, SF_SMALL)
        .collect()
    )
    assert len(rows) == 1
    r = rows[0]
    path = os.path.join(SF_SMALL, "lineitem.parquet")
    assert r["file_bytes"] == os.path.getsize(path)
    con = duckdb.connect()
    n = con.sql(
        f"SELECT count(*) FROM read_parquet('{path}')"
    ).fetchone()[0]
    con.close()
    assert r["n_rows"] == n
