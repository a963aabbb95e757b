"""Cross-assertions between INDEPENDENT staged operators: identities
that must hold between ops computed by different code paths. A shared
bug can survive one op's oracle (both sides wrong the same way) but
not an identity against a differently-constructed op — the same
defense-in-depth as tests/test_cross_assert.py, applied to the staged
waves before activation."""

from __future__ import annotations

import pyspark.sql.functions as F

from etl_intraday_bidask_spark.operators.staged_r6 import STAGED
from etl_intraday_bidask_spark.operators.staged_r7 import STAGED_R7
from etl_intraday_bidask_spark.tables import load
from tests.conftest import SF_SMALL


def test_pareto_and_gini_agree_on_population(spark):
    """Both concentration ops aggregate the same customer-revenue
    grain; their per-nation customer counts must match exactly."""
    pareto = {
        r["n_name"]: r["n_customers"]
        for r in STAGED["agg_pareto_cumshare"].spark_fn(
            spark, SF_SMALL
        ).collect()
    }
    gini = {
        r["n_name"]: r["n_customers"]
        for r in STAGED["agg_gini_concentration"].spark_fn(
            spark, SF_SMALL
        ).collect()
    }
    assert pareto == gini


def test_triangle_count_matches_clustering_coefficient(spark):
    """graph_triangle_count (wave A) and graph_clustering_coefficient
    (wave C) build the co-purchase graph independently; their triangle
    censuses must agree."""
    tri = STAGED["graph_triangle_count"].spark_fn(spark, SF_SMALL).collect()[0]
    cc = STAGED_R7["graph_clustering_coefficient"].spark_fn(
        spark, SF_SMALL
    ).collect()[0]
    assert tri["n_triangles"] == cc["n_triangles"]
    # Every triangle contributes three wedges (closed triads), so the
    # wedge census bounds the triangle census: n_triads >= 3*n_triangles.
    assert cc["n_triads"] >= 3 * cc["n_triangles"]


def test_degree_distribution_accounts_for_all_vertices(spark):
    """The degree histogram's node total must equal the triangle op's
    vertex census, and the CCDF at the minimum degree must equal the
    total (every node has at least the minimum degree)."""
    tri = STAGED["graph_triangle_count"].spark_fn(spark, SF_SMALL).collect()[0]
    hist = STAGED_R7["graph_degree_distribution"].spark_fn(
        spark, SF_SMALL
    ).collect()
    assert sum(r["n_nodes"] for r in hist) == tri["n_vertices"]
    assert hist[0]["n_nodes_at_least"] == tri["n_vertices"]


def test_revenue_bridge_reconciles_to_direct_totals(spark):
    """The bridge's category deltas must sum to the directly-computed
    1996-minus-1995 revenue difference, exactly (integer cents)."""
    bridge = STAGED["orders_revenue_bridge"].spark_fn(
        spark, SF_SMALL
    ).collect()
    orders = load(spark, SF_SMALL, "orders")
    from etl_intraday_bidask_spark.functions.parity import scaled_long

    direct = orders.groupBy(F.year("o_orderdate").alias("y")).agg(
        F.sum(scaled_long("o_totalprice", 100)).alias("cents")
    )
    by_year = {r["y"]: r["cents"] for r in direct.collect()}
    expected = by_year.get(1996, 0) - by_year.get(1995, 0)
    got = round(sum(r["delta_revenue"] for r in bridge) * 100)
    assert got == expected


def test_transition_matrix_counts_all_lag_pairs(spark):
    """Total transitions == n_events - n_users_with_events (every
    event except each user's first contributes exactly one pair)."""
    trans = STAGED["cep_transition_matrix"].spark_fn(
        spark, SF_SMALL
    ).collect()
    ev = load(spark, SF_SMALL, "events")
    n_events = ev.count()
    n_users = ev.select("user_id").distinct().count()
    assert sum(r["n"] for r in trans) == n_events - n_users


def test_bar_resample_always_consistent(spark):
    """The OHLCV merge identity must hold for every hour — a single
    inconsistent bar means the merge rule is wrong."""
    bars = STAGED_R7["bidask_bar_resample_check"].spark_fn(
        spark, SF_SMALL
    ).collect()
    assert bars, "no bars produced"
    assert all(r["resample_consistent"] == 1 for r in bars)


def test_largest_remainder_alloc_sums_to_budget(spark):
    """Hamilton allocation must hand out exactly the 1000-seat budget."""
    alloc = STAGED_R7["sample_largest_remainder_alloc"].spark_fn(
        spark, SF_SMALL
    ).collect()
    assert sum(r["alloc"] for r in alloc) == 1000


def test_active_users_dau_matches_cumulative_uniques_day_one(spark):
    """On the first observed day, DAU == that day's new-user count in
    the cumulative-uniques curve (everyone active is new)."""
    act = STAGED["events_active_users_rolling"].spark_fn(
        spark, SF_SMALL
    ).collect()
    cum = STAGED_R7["events_cumulative_uniques"].spark_fn(
        spark, SF_SMALL
    ).collect()
    assert act[0]["day_us"] == cum[0]["day_us"]
    assert act[0]["dau"] == cum[0]["n_new"] == cum[0]["cumulative_uniques"]
