"""Parity tests for wave B (operators/staged_r6.py + staged_r6b.py).

Staged through round 5, ACTIVATED in round 6 — the registry-driven
sweeps now cover these ops too; this file keeps the direct
oracle-parity drive (it predates activation and doubles the coverage)
plus the activation guard that pins the round-6 window composition.
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


def test_wave_b_activated():
    """Round 6 activated wave B: all 50 staged_r6/staged_r6b ops are in
    the global registry with their exact staged specs, and the wave is
    exactly the driver's 50-slot window (every key never-graded as of
    r05, everything else green r1-r5)."""
    import __spark_entry__ as entry
    from etl_intraday_bidask_spark.registry import load_all_operators

    registry = load_all_operators()
    assert len(STAGED) == 50
    missing = sorted(set(STAGED) - set(registry))
    assert not missing, f"wave-B ops not activated: {missing}"
    for name, spec in STAGED.items():
        assert registry[name] is spec, f"{name}: registry spec diverged"
    assert set(entry._DEFER_NEW_R6) == set(STAGED), (
        "_DEFER_NEW_R6 and the staged wave diverge"
    )


def test_dedup_cross_source_exact_nonvacuous(spark, tmp_path):
    """The driver's r6 grade for dedup_cross_source_exact was a
    0-rows-vs-0-rows match (the sf0.01 fixtures happen to contain no
    cross-source exact duplicates), i.e. vacuous (VERDICT r6 item 4 /
    next-round item 7). This pins a parity case on a corpus WITH
    injected duplicates: 3 dup groups spanning 1-3 sources plus
    singleton noise, Spark vs the op's own DuckDB oracle, non-empty
    result asserted."""
    import duckdb

    rows = []
    # Group A: 3 exact copies across 3 sources; B: 2 copies, 2 sources;
    # C: 2 copies within ONE source (n_sources=1 must still count).
    for i, src in enumerate(["web", "books", "code"]):
        rows.append((100 + i, "the quick brown fox", "en", src, 19))
    for i, src in enumerate(["web", "wiki"]):
        rows.append((200 + i, "lorem ipsum dolor", "en", src, 17))
    for i in range(2):
        rows.append((300 + i, "same-source dup", "en", "web", 15))
    for i in range(5):  # singleton noise must NOT appear in the output
        rows.append((400 + i, f"unique text {i}", "en", "web", 13))
    import pandas as pd

    pdf = pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    )
    path = str(tmp_path / "documents.parquet")
    pdf.to_parquet(path)

    from etl_intraday_bidask_spark.operators.staged_r6 import STAGED
    from tests.test_parity import normalize

    spec = STAGED["dedup_cross_source_exact"]
    df = spec.spark_fn(spark, str(tmp_path))
    s_rows, s_cols = df.collect(), df.columns
    assert len(s_rows) == 3, f"expected 3 dup-shape groups, got {s_rows}"

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{path}')"
    )
    rel = con.sql(spec.oracle_sql)
    d_rows, d_cols = rel.fetchall(), list(rel.columns)
    assert sorted(s_cols) == sorted(d_cols)
    assert normalize(s_rows, s_cols) == normalize(d_rows, d_cols)
    con.close()
