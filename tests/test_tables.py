"""Pins for the table/view memo layer (etl_intraday_bidask_spark/tables.py).

The view() memo is keyed on the IDENTITY of load()'s DataFrame (round-8
ADVICE): tests and fuzz runs inject frames via tables.load_memo, and a memo
keyed only on (sf_dir, table) would silently keep serving the stale
frame through the temp view.
"""

from __future__ import annotations

from etl_intraday_bidask_spark import tables
from tests.conftest import SF_SMALL


def test_view_serves_injected_frame_and_reuses_name(spark):
    v1 = tables.view(spark, SF_SMALL, "region")
    n_full = spark.table(v1).count()
    assert n_full > 1
    memo = tables.load_memo(spark)
    orig = memo[(SF_SMALL, "region")]
    try:
        memo[(SF_SMALL, "region")] = orig.limit(1)
        v2 = tables.view(spark, SF_SMALL, "region")
        # Deterministic name: re-registration REPLACES, never accumulates.
        assert v2 == v1
        # The view now serves the injected frame, not the stale one.
        assert spark.table(v2).count() == 1
    finally:
        memo[(SF_SMALL, "region")] = orig
        tables.view(spark, SF_SMALL, "region")
    assert spark.table(v1).count() == n_full


def test_view_memo_hit_is_stable(spark):
    v1 = tables.view(spark, SF_SMALL, "nation")
    v2 = tables.view(spark, SF_SMALL, "nation")
    assert v1 == v2
    cached = tables._view_memo(spark)[(SF_SMALL, "nation")]
    assert cached[0] == v1
    assert cached[1] is tables.load(spark, SF_SMALL, "nation")


def test_session_memos_live_on_the_session_object(spark):
    """The memos must not outlive their session: a module-level
    WeakKeyDictionary whose values hold DataFrames never releases its
    entries (every DataFrame strongly references its session — round-9
    review), so the memo dicts are stored as session attributes and die
    with the session object via the cycle collector."""
    tables.load(spark, SF_SMALL, "region")
    tables.view(spark, SF_SMALL, "region")
    assert getattr(spark, "_etl_graft_load_memo", None)
    assert getattr(spark, "_etl_graft_view_memo", None)
    import etl_intraday_bidask_spark.tables as t

    assert not hasattr(t, "_LOAD_MEMO") and not hasattr(t, "_VIEW_MEMO")
