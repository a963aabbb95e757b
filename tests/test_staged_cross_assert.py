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


# ---- wave D/E cross-assertions (round 6) ---------------------------

from etl_intraday_bidask_spark.operators.staged_r8 import STAGED_R8
from etl_intraday_bidask_spark.operators.staged_r9 import STAGED_R9


def test_auc_rank_identity_holds(spark):
    """The Mann-Whitney rank-sum route and the direct doubled-U route
    must compute the same 2U on the real fixture (the op grades the
    flag; this pins it true)."""
    row = STAGED_R8["eval_auc_rank_identity"].spark_fn(
        spark, SF_SMALL
    ).collect()[0]
    assert row["identity_holds"] == 1
    assert row["u2_from_ranks"] == row["u2_direct"]


def test_auc_consistent_across_ops(spark):
    """eval_auc_exact, the rank-identity op, and the KS op all reduce
    the same scored stream: class totals must agree everywhere."""
    auc = STAGED_R8["eval_auc_exact"].spark_fn(spark, SF_SMALL).collect()[0]
    ks = STAGED_R8["eval_ks_statistic"].spark_fn(spark, SF_SMALL).collect()[0]
    ident = STAGED_R8["eval_auc_rank_identity"].spark_fn(
        spark, SF_SMALL
    ).collect()[0]
    assert auc["n_pos"] == ks["n_pos"] == ident["n_pos"]
    assert auc["n_neg"] == ks["n_neg"] == ident["n_neg"]
    assert auc["u2"] == ident["u2_direct"]


def test_markov_removal_effect_bounds(spark):
    """Removing a channel can only lose conversion probability, and
    probabilities stay in [0, 1e6] ppm."""
    row = STAGED_R9["attr_markov_removal_effect"].spark_fn(
        spark, SF_SMALL
    ).collect()[0]
    assert 0 <= row["conv_removed_ppm"] <= row["conv_base_ppm"] <= 1000000
    assert row["removal_effect_ppm"] == (
        row["conv_base_ppm"] - row["conv_removed_ppm"]
    )


def test_attribution_credit_conservation(spark):
    """Linear multi-touch credit sums to 10000 bp per converting path
    up to integral-division flooring: total credit must be within
    n_paths * (max touches per path) bp of exact, and never exceed
    exact."""
    rows = STAGED_R9["attr_linear_multitouch"].spark_fn(
        spark, SF_SMALL
    ).collect()
    total_credit = sum(r["credit_sum_bp"] for r in rows)
    # Reconstruct the number of credited paths from the U-shaped op's
    # role census: 'first' appears exactly once per path.
    roles = {
        r["role"]: r
        for r in STAGED_R9["attr_position_u_shaped"]
        .spark_fn(spark, SF_SMALL)
        .collect()
    }
    n_paths = roles["first"]["n_touches"]
    assert total_credit <= 10000 * n_paths
    # flooring loses < 1 bp per touch
    n_touches = sum(r["n_touches"] for r in rows)
    assert total_credit > 10000 * n_paths - n_touches


def test_pacf_closed_form_from_graded_acf(spark):
    """PACF(2) = (r2 - r1^2)/(1 - r1^2) derived from the graded r1/r2
    must be a valid partial correlation (|phi22| <= 1) — the
    Durbin-Levinson sanity the op's docstring promises."""
    row = STAGED_R9["ts_pacf_lag2_exact"].spark_fn(
        spark, SF_SMALL
    ).collect()[0]
    r1, r2 = row["r1"], row["r2"]
    assert r1 is not None and r2 is not None
    phi22 = (r2 - r1 * r1) / (1.0 - r1 * r1)
    assert -1.0 <= phi22 <= 1.0


def test_little_law_identity_holds(spark):
    """The sweep-line integral must equal the per-order duration sum
    on the real fixture (the op grades the flag; this pins it)."""
    row = STAGED_R8["orders_little_law_identity"].spark_fn(
        spark, SF_SMALL
    ).collect()[0]
    assert row["identity_holds"] == 1


def test_coverage_and_gini_read_same_lists(spark):
    """Catalog coverage and exposure Gini run over the same top-5
    lists: exposed-part counts must agree."""
    c = STAGED_R8["eval_catalog_coverage_topk"].spark_fn(
        spark, SF_SMALL
    ).collect()[0]
    g = STAGED_R8["eval_exposure_gini_topk"].spark_fn(
        spark, SF_SMALL
    ).collect()[0]
    assert c["n_exposed"] == g["n_exposed_parts"]


def test_vpin_imbalance_bounded_by_volume(spark):
    """|buy - sell| per bucket can never exceed bucket volume, so the
    aggregate imbalance is bounded by total volume and VPIN <= 10000
    bp."""
    row = STAGED_R9["bidask_vpin_volume_buckets"].spark_fn(
        spark, SF_SMALL
    ).collect()[0]
    assert row["sum_abs_imbalance"] <= row["total_volume"]
    assert 0 <= row["vpin_floor_bp"] <= 10000


def test_stl_seasonal_components_sum_near_zero(spark):
    """Centered-MA detrending makes the seasonal components sum to ~0
    across the 24 hours (each d_scaled is a deviation from a local
    24-window mean): the total seasonal mass must be tiny relative to
    the series scale."""
    rows = STAGED_R9["ts_stl_lite_hourly"].spark_fn(
        spark, SF_SMALL
    ).collect()
    total = sum(r["seasonal_sum_scaled"] for r in rows)
    mass = sum(abs(r["seasonal_sum_scaled"]) for r in rows)
    assert mass == 0 or abs(total) * 10 < mass


def test_k_anonymity_rows_reconcile(spark):
    """The k-bucket census must account for every customer row."""
    import duckdb

    rows = STAGED_R9["gov_k_anonymity_census"].spark_fn(
        spark, SF_SMALL
    ).collect()
    con = duckdb.connect()
    n = con.sql(
        f"SELECT count(*) FROM read_parquet('{SF_SMALL}/customer.parquet')"
    ).fetchone()[0]
    con.close()
    assert sum(r["n_rows"] for r in rows) == n
