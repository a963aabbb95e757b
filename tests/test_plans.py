"""Physical-plan audits (SURVEY.md §4): the optimizations the 100 TB
design depends on must actually appear in the plan — predicate pushdown
into the Parquet scan, column pruning, broadcast joins for dims,
TakeOrderedAndProject for global top-k, two-phase hash aggregation.
A correctness-green operator with the wrong plan is a scale bug."""

from __future__ import annotations

import contextlib
import io

from etl_intraday_bidask_spark.registry import load_all_operators
from tests.conftest import SF_SMALL

REGISTRY = load_all_operators()


def plan_of(spark, name: str) -> str:
    df = REGISTRY[name].spark_fn(spark, SF_SMALL)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_pushdown_reaches_parquet_scan(spark):
    plan = plan_of(spark, "scan_parquet_pushdown")
    assert "PushedFilters:" in plan
    assert "o_orderstatus" in plan.split("PushedFilters:")[1].split("\n")[0], (
        "status equality filter not pushed to the Parquet reader"
    )


def test_column_pruning_in_read_schema(spark):
    plan = plan_of(spark, "project_select")
    read_schema = plan.split("ReadSchema:")[1].split("\n")[0]
    for needed in ("l_orderkey", "l_extendedprice", "l_discount", "l_tax"):
        assert needed in read_schema
    for pruned in ("l_shipdate", "l_returnflag", "l_suppkey", "l_quantity"):
        assert pruned not in read_schema, f"{pruned} read but never used"


def test_dim_joins_are_broadcast(spark):
    plan = plan_of(spark, "join_broadcast_dims")
    assert "BroadcastHashJoin" in plan, (
        "fact side must probe the dim as a broadcast hash join"
    )
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    # Round-14 re-plan pin (VERDICT r13 item 2): the domain-bounded
    # nation/region dims (25/5 rows at EVERY sf) are folded to literals
    # driver-side, so the plan carries exactly ONE broadcast build (the
    # ASIA-pruned customer dim) instead of the round-9 three — the
    # broadcast-build job chain was most of the op's 12.7x live
    # marginal. Count DISTINCT node ids rather than raw substring
    # occurrences: the formatted explain lists each node once in the
    # tree and once in the detail section (round-10 ADVICE).
    import re

    build_ids = set(re.findall(r"\((\d+)\) BroadcastExchange", plan))
    assert len(build_ids) == 1, (
        "expected exactly the one ASIA-customer dim broadcast build, "
        f"got node ids {sorted(build_ids)}"
    )
    # The folded ASIA membership must reach the customer parquet scan
    # as a storage-level IN filter — the scan-pruning the join form
    # could never express (this is the fold's 100 TB argument, not just
    # its dispatch-floor one).
    pushed = [
        line
        for line in plan.splitlines()
        if "PushedFilters:" in line and "In(c_nationkey" in line
    ]
    assert pushed, "ASIA nation-key IN filter not pushed to customer scan"


def _single_range_exchange_pin(plan: str, range_key: str):
    """Round-15 re-plan pin body (VERDICT r14 items 4-5): the op must
    carry exactly ONE exchange — the early REPARTITION_BY_COL range
    partitioning on `range_key` — with the final global sort riding
    the prefix-satisfied OrderedDistribution instead of its own
    ENSURE_REQUIREMENTS range exchange + reduce-side-re-executing
    sampling job. Node-id counting per the round-10 ADVICE (formatted
    explain lists each node twice)."""
    import re

    ex_ids = set(re.findall(r"\((\d+)\) Exchange", plan))
    assert len(ex_ids) == 1, (
        f"expected exactly one exchange, got node ids {sorted(ex_ids)}"
    )
    assert "ENSURE_REQUIREMENTS" not in plan, (
        "the final sort re-grew its own exchange — the range-early "
        "re-plan no longer satisfies its OrderedDistribution"
    )
    arg_lines = [
        line
        for line in plan.splitlines()
        if "rangepartitioning(" in line and range_key in line
    ]
    assert arg_lines, f"the one exchange must range-partition on {range_key}"


def test_win_topk_single_range_exchange(spark):
    plan = plan_of(spark, "win_topk_per_group")
    _single_range_exchange_pin(plan, "o_custkey")
    # The declared final total order must still be a GLOBAL sort node
    # (same declared output order; only its exchange is gone).
    assert ") Sort" in plan and "c_custkey" in plan


def test_session_30m_single_range_exchange(spark):
    plan = plan_of(spark, "stream_session_30m")
    _single_range_exchange_pin(plan, "user_id")
    assert "MergingSessions" in plan, (
        "session aggregation must stay the native merging-sessions plan"
    )


def test_global_topk_uses_take_ordered(spark):
    plan = plan_of(spark, "limit_global_topk")
    assert "TakeOrderedAndProject" in plan, (
        "ORDER BY + LIMIT should collapse to per-partition top-k"
    )


def test_flagship_agg_is_two_phase(spark):
    plan = plan_of(spark, "agg_pricing_summary")
    assert plan.count("HashAggregate") >= 2, (
        "expected partial + final hash aggregation (map-side combine)"
    )
    assert "PushedFilters:" in plan  # the shipdate filter reaches the scan


def test_knn_topk_broadcasts_query_vector(spark):
    plan = plan_of(spark, "knn_cosine_topk")
    assert "TakeOrderedAndProject" in plan
    assert "SortMergeJoin" not in plan  # query side must broadcast


def test_asof_join_is_single_user_partitioned_window(spark):
    plan = plan_of(spark, "join_asof_bidask")
    assert "Window" in plan
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan, (
        "as-of must not degenerate into a range join"
    )
    # Round-11 re-plan: ONE conditional-projection scan, not a UNION
    # ALL of two filtered scans — the fact table is read once, with
    # the event_type IN filter pushed to Parquet. One "Location:"
    # detail line per scan node (formatted explain repeats node NAMES
    # in the tree + details, so counting names would double).
    assert plan.count("Location:") == 1, (
        "as-of must read events once (conditional projection), "
        "not once per side"
    )


def test_asof_forward_is_single_scan_window(spark):
    plan = plan_of(spark, "join_asof_forward")
    assert "Window" in plan
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan
    assert plan.count("Location:") == 1, (
        "forward as-of must read events once (conditional "
        "projection), not once per side"
    )


def test_range_interval_join_keeps_equi_key(spark):
    plan = plan_of(spark, "join_range_interval")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan, (
        "the user_id equi key must make this an equi join with a "
        "residual interval filter, not a nested-loop join"
    )


def test_pivot_is_single_aggregate_pass(spark):
    plan = plan_of(spark, "pivot_status_matrix")
    assert plan.count("HashAggregate") >= 2  # partial + final
    assert "CartesianProduct" not in plan


def test_tfidf_broadcasts_corpus_scalar(spark):
    plan = plan_of(spark, "text_tfidf_topk")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan, (
        "the 1-row corpus-size side must broadcast"
    )
    assert "CartesianProduct" not in plan
    # The df branch must build per-doc distinct tokens map-side
    # (array_distinct before explode) so the query's only full-corpus
    # exchange is the token-key aggregate, and the tf branch must run
    # on the pruned ranked-doc scan (doc_id < 10 pushed to Parquet) —
    # the full (doc_id, token) pair exchange must never return.
    assert "array_distinct" in plan, (
        "df must come from a narrow per-doc distinct, not a pair agg"
    )
    tf_scans = [
        seg.split("\n")[0]
        for seg in plan.split("PushedFilters:")[1:]
        if "doc_id" in seg.split("\n")[0]
    ]
    assert any("LessThan(doc_id,10)" in s for s in tf_scans), (
        "tf must be computed on the doc_id<10 pruned scan"
    )
    # Round-10 NOTE (kept as a tombstone): a dispatch-composition
    # re-plan coalesced the 10-doc tf aggregate and the final top-5
    # window to one partition to delete their AQE materialization jobs
    # (8 -> 6 jobs, -22% at sf0.1). The round-10 diff review REFUTED
    # it: coalesce(1) is narrow, so it collapsed the WHOLE post-shuffle
    # stage — including dfreq's vocabulary-sized final aggregate — to
    # one task, and the COALESCE(1) hint serialized the documents scan
    # (input is data-volume-bound even though the agg output is
    # contract-bounded). Reverted; SCALE.md §31 records the corrected
    # rule. No exchange-count pin here: the 5 shuffles (dfreq, 2x
    # n_docs distinct legs, tf10, window) are each the honest plan.
    assert "WindowGroupLimit" in plan, (
        "the rk <= 5 filter should push a group-limit below the window"
    )


def test_fuzzy_levenshtein_blocks_on_lang(spark):
    plan = plan_of(spark, "dedup_fuzzy_levenshtein")
    assert "CartesianProduct" not in plan, (
        "the lang equi key must block the self-join"
    )


def test_q3_broadcasts_filtered_dims_and_takes_topk(spark):
    plan = plan_of(spark, "q3_shipping_priority")
    assert plan.count("BroadcastHashJoin") >= 2, (
        "segment-filtered customer and date-filtered orders must broadcast"
    )
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan


def test_bucketed_join_has_no_shuffle(spark):
    """join_bucketed_colocated: both sides bucketed by the join key into
    the same bucket count — the sort-merge join must read bucket-aligned
    splits with no Exchange anywhere in the joined plan."""
    from etl_intraday_bidask_spark.operators.joins import _bucketed_tables
    from tests.conftest import SF_SMALL

    bo, bc = _bucketed_tables(spark, SF_SMALL)
    j = bo.hint("merge").join(bc, bo.o_custkey == bc.c_custkey)
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan, "bucketed join must not shuffle"


def test_q5_broadcasts_dims_no_cartesian(spark):
    plan = plan_of(spark, "q5_local_supplier_volume")
    assert plan.count("BroadcastHashJoin") >= 2, (
        "supplier/nation/region should broadcast"
    )
    assert "CartesianProduct" not in plan


def test_range_frame_dist_has_no_window(spark):
    # The scale-safe twin must NOT contain the single-task global
    # WindowExec that win_range_frame declares — that is its point.
    plan = plan_of(spark, "win_range_frame_dist")
    assert "Window" not in plan
    assert "CartesianProduct" not in plan


def test_zorder_sorts_via_take_ordered(spark):
    plan = plan_of(spark, "sort_zorder_layout")
    assert "TakeOrderedAndProject" in plan, (
        "z-order top-k should never globally sort"
    )


def test_variant_get_stays_jvm_side(spark):
    plan = plan_of(spark, "json_variant_get")
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_q18_filters_before_joins(spark):
    plan = plan_of(spark, "q18_large_volume_customer")
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan


def test_sessionize_single_exchange(spark):
    # Both window passes and the final aggregate share the user_id
    # hash partitioning: exactly one hash exchange over the events scan
    # (the only other exchange is the output orderBy's range partition).
    plan = plan_of(spark, "sessionize_gaps_islands")
    assert plan.count("hashpartitioning") == 1, plan


def test_bloom_runtime_filter_injected(spark):
    """join_bloom_runtime_filter: under the op's conf guard, the selective
    dim filter must inject a runtime Bloom filter (might_contain over the
    join-key hash) into the fact side of a non-broadcast join."""
    from etl_intraday_bidask_spark.operators.joins import (
        _bloom_confs,
        _bloom_join_frame,
    )
    from tests.conftest import SF_SMALL

    with _bloom_confs(spark):
        df = _bloom_join_frame(spark, SF_SMALL)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
    assert "might_contain" in plan, "runtime bloom filter not injected"
    assert "SortMergeJoin" in plan
    # And the guard must restore the broadcast threshold afterwards.
    assert spark.conf.get("spark.sql.autoBroadcastJoinThreshold") != "-1"


def test_skyline_has_no_global_window(spark):
    """skyline_pareto_2d runs the documented two-phase decomposition:
    bucket-partitioned local-skyline windows + broadcast anti-join merge.
    A global un-partitioned window would show as Exchange SinglePartition
    (the round-2/3 VERDICT scale-killer)."""
    plan = plan_of(spark, "skyline_pareto_2d")
    assert "SinglePartition" not in plan, plan
    assert "Window" in plan  # local pass still uses windows, partitioned


def test_range_frame_twins_agree(spark):
    """win_range_frame (global-window semantic anchor) and
    win_range_frame_dist (bucket-join scale path) must produce identical
    rows — the equality that justifies shipping the dist form at scale."""
    from tests.conftest import SF_MEDIUM

    reg = load_all_operators()
    a = sorted(map(tuple, reg["win_range_frame"].spark_fn(spark, SF_MEDIUM).collect()))
    b = sorted(map(tuple, reg["win_range_frame_dist"].spark_fn(spark, SF_MEDIUM).collect()))
    assert a == b


def test_lateral_topn_is_decorrelated(spark):
    """join_lateral_topn_per_key: Catalyst must decorrelate the LATERAL
    ORDER BY/LIMIT subquery into a window/rank over ONE custkey exchange
    — a per-customer re-scan would surface as a nested-loop join
    (round-4 addition; the decorrelation IS the capability under test)."""
    plan = plan_of(spark, "join_lateral_topn_per_key")
    assert "Window" in plan, "LATERAL not decorrelated to a window"
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan, (
        "LATERAL executed as per-row nested loop — decorrelation failed"
    )


def test_histogram_width_bucket_is_two_phase(spark):
    """agg_histogram_width_bucket: map-side combine must collapse to
    ≤10 groups before the shuffle — two HashAggregate phases, no sort-
    based fallback, nothing but the group-by exchange."""
    plan = plan_of(spark, "agg_histogram_width_bucket")
    assert plan.count("HashAggregate") >= 2, (
        "histogram must partial-aggregate map-side"
    )
    assert "CartesianProduct" not in plan
    assert "SortAggregate" not in plan


def test_interval_range_frame_single_partitioned_window(spark):
    """win_interval_range_frame: the INTERVAL-bound RANGE frame must
    execute as ONE window over the event_type exchange — never an
    unpartitioned (SinglePartition) window."""
    plan = plan_of(spark, "win_interval_range_frame")
    assert "Window" in plan
    assert "SinglePartition" not in plan, (
        "interval range frame collapsed to a single-task window"
    )
    assert "CartesianProduct" not in plan


def test_interval_overlap_is_equi_join(spark):
    """join_interval_overlap_bucketed: the overlap must execute as a
    (custkey, bucket) EQUALITY join — SortMergeJoin or shuffled hash,
    never a range-theta nested loop (round-5 addition; the bucketing
    IS the capability under test)."""
    plan = plan_of(spark, "join_interval_overlap_bucketed")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan, (
        "interval overlap fell back to a nested-loop theta join"
    )


def test_bitmap_rollup_is_two_phase(spark):
    """agg_bitmap_distinct_rollup: the bit_or mask build must partial-
    aggregate map-side (two HashAggregate phases around the exchange)
    — the additivity that makes the bitmap pattern incremental."""
    plan = plan_of(spark, "agg_bitmap_distinct_rollup")
    assert plan.count("HashAggregate") >= 2
    assert "CartesianProduct" not in plan


def test_repetition_ngram_is_narrow(spark):
    """text_repetition_dup_ngram: trigram materialization + distinct
    must stay fully narrow — a shuffle here means the per-row
    higher-order-function form regressed to an explode/groupBy."""
    plan = plan_of(spark, "text_repetition_dup_ngram")
    tree = plan.split("\n\n")[0]  # the plan tree, not the node details
    # The only exchange allowed is the final presentation sort's.
    assert tree.count("Exchange") <= 1, tree


def test_ordered_small_tails_have_no_range_sort(spark):
    """The four bounded-output headline queries order their result via
    ordered_small (coalesce(1) + in-partition sort) — the plan must
    carry NO RangePartitioning exchange and no boundary-sampling pass
    (plans/ordering.py). A refactor back to .orderBy would silently
    re-add ~2 scheduler jobs per query."""
    for name in (
        "json_get",
        "agg_pricing_summary",
        "agg_rollup",
        "join_broadcast_dims",
    ):
        plan = plan_of(spark, name)
        assert "rangepartitioning" not in plan.lower(), (
            f"{name}: range sort reintroduced"
        )
        assert "Coalesce" in plan, f"{name}: ordered_small tail missing"
        assert "Sort" in plan, f"{name}: presentation sort missing"


# The ordered_small call-site contract (ADVICE r7): coalesce(1) is safe
# ONLY for results whose cardinality is bounded by schema semantics, and
# nothing structural enforces that — so every caller is pinned here with
# its semantic bound. A new `.transform(ordered_small, ...)` on a
# data-scaling result will fail test_ordered_small_callers_pinned until
# it is listed, forcing the bound argument to be made explicitly.
ORDERED_SMALL_CALLERS = {
    # op -> (schema-semantics bound, why)
    "agg_pricing_summary": (8, "returnflag x linestatus domain"),
    "agg_rollup": (64, "rollup of 5 priorities x 2 statuses + subtotals"),
    "json_get": (8, "5 event types"),
    "join_broadcast_dims": (25, "nations domain"),
    # r13 commit 2c4e555 made stream_tumbling_1h an ordered_small
    # caller (final sort over hourly tumbling buckets). Bound argued
    # here per the pin's contract: the fixture events table spans 30
    # days => 720 hourly buckets x 5 event types = 3,600 rows, and the
    # output is CALENDAR-capped, not data-scaling — 100x more events in
    # the same 30-day window still yields <= 3,600 groups; a longer
    # calendar grows it linearly in wall-clock time, not in data volume.
    "stream_tumbling_1h": (3720, "720 fixture hours x 5 event types, calendar-capped"),
}


def test_ordered_small_callers_pinned(spark):
    """Every ordered_small call site in the package must be one of the
    pinned bounded-output ops, and each pinned op's result must actually
    sit under its schema-semantics bound at fixture SF — a caller on a
    result that scales with data fails the source scan until its bound
    is argued here."""
    import glob
    import os

    import etl_intraday_bidask_spark as pkg_mod

    pkg = os.path.dirname(os.path.abspath(pkg_mod.__file__))
    calling_files = set()
    for path in glob.glob(os.path.join(pkg, "**", "*.py"), recursive=True):
        rel = os.path.relpath(path, pkg)
        if rel == os.path.join("plans", "ordering.py"):
            continue
        with open(path) as f:
            src = f.read()
        # Count identifier uses beyond the import line — catches both
        # direct calls and the .transform(ordered_small, ...) form.
        import re

        lines = [
            ln
            for ln in src.splitlines()
            if "import" not in ln or "ordered_small" not in ln
        ]
        if any(re.search(r"\bordered_small\b", ln) for ln in lines):
            calling_files.add(rel)
    expected_files = {
        os.path.join("operators", "aggregates.py"),
        os.path.join("operators", "scalar_funcs.py"),
        os.path.join("operators", "joins.py"),
        # r13: stream_tumbling_1h's calendar-capped final sort
        # (bound argued in ORDERED_SMALL_CALLERS above).
        os.path.join("operators", "timeseries.py"),
    }
    assert calling_files == expected_files, (
        "ordered_small call sites moved — re-argue each new caller's "
        f"cardinality bound in ORDERED_SMALL_CALLERS: {calling_files}"
    )
    for name, (bound, why) in ORDERED_SMALL_CALLERS.items():
        n = REGISTRY[name].spark_fn(spark, SF_SMALL).count()
        assert n <= bound, (
            f"{name}: {n} rows exceeds its ordered_small bound {bound} "
            f"({why}) — coalesce(1) is no longer safe here"
        )


def test_doc_local_stats_stay_narrow(spark):
    """SCALE.md §23: doc-local statistics must not regress to the
    explode + re-aggregate shape. text_entropy_token (run-length fold)
    and text_fingerprint_rolling (position-weighted fold) allow only
    the presentation sort's exchange; the Jaccard-family size
    denominators must come from a narrow size(array_distinct(...)),
    i.e. no hashpartitioning(doc_id) feeding a lone count aggregate."""
    for name in ("text_entropy_token", "text_fingerprint_rolling"):
        plan = plan_of(spark, name)
        tree = plan.split("\n\n")[0]
        assert tree.count("Exchange") <= 1, f"{name} regrew a shuffle:\n{tree}"
        assert "Generate" not in tree, f"{name} regrew an explode:\n{tree}"


def test_decontaminate_distinct_is_doc_local(spark):
    """corpus_decontaminate_ngram: the per-doc shingle dedup must be
    array_distinct before the explode (narrow), leaving only the
    genuinely global exchanges — the (lang, gram) train-set distinct
    and the join/aggregate keys. A (doc_id, lang, gram) distinct
    exchange returning would re-shuffle the whole shingle volume."""
    plan = plan_of(spark, "corpus_decontaminate_ngram")
    assert "array_distinct" in plan, "per-doc dedup left the narrow path"
    # No exchange may carry gram together with doc_id: the only
    # distinct over grams must be keyed (lang, gram).
    import re

    # ADVICE r12 / VERDICT r13 item 2: capture to line end (same fix as
    # test_lsh_verify_scores_at_pair_grain) — the old [^)]* capture
    # stopped at the first ')' so a nested function call BEFORE the gram
    # column (e.g. knownfloatingpointnormalized(doc_id)) would truncate
    # the keys and blind the guard.
    pair_grain = re.compile(r"hashpartitioning\((.*)\)")

    # Synthetic guard: a nested-call partitioning expression must not
    # hide a trailing gram column from the capture.
    synthetic = "hashpartitioning(somefn(doc_id#1), gram#2, 32)"
    assert any(
        "doc_id" in k and "gram" in k
        for k in pair_grain.findall(synthetic)
    ), "pair-grain capture regex went blind on nested calls"

    for keys in pair_grain.findall(plan):
        assert not ("doc_id" in keys and "gram" in keys), (
            f"pair-grain distinct exchange returned: {keys}"
        )


def test_grouping_set_arithmetic_below_expand(spark):
    """Round-11 (the agg_rollup class from round 10, VERDICT r10 item
    3): GROUP BY ROLLUP/CUBE/GROUPING SETS expands every scan row into
    one copy per grouping set BEFORE the partial aggregate, and an
    aggregate-input expression is evaluated once per EXPANDED row — so
    the exact-cents chain must be projected in a subquery BELOW the
    Expand (evaluated once per scan row), not inside the aggregate
    call (2-4x the map-side arithmetic, growing with grouping-set
    count at every scale). Pin: each op's Expand node lists the
    pre-projected cents column among its INPUTS, and no floor()
    arithmetic appears in the Expand's own argument list."""
    import re

    for name, cents_col in (
        ("agg_rollup", "cents"),
        ("agg_cube", "qty_cents"),
        ("agg_grouping_sets", "bal_cents"),
        ("rollup_time_hierarchy", "v_cents"),
    ):
        plan = plan_of(spark, name)
        m = re.search(
            r"\(\d+\) Expand\s*\nInput \[\d+\]: \[([^\]]*)\]", plan
        )
        assert m, f"{name}: no Expand node in plan"
        assert cents_col in m.group(1), (
            f"{name}: {cents_col} not an Expand input — the cents "
            f"chain is above Expand again: {m.group(1)}"
        )
        assert "floor(" not in m.group(1).lower(), (
            f"{name}: arithmetic leaked into Expand input: {m.group(1)}"
        )


def test_grouping_id_expand_has_no_arithmetic(spark):
    """agg_rollup_grouping_id and agg_bitmap_rollup_multigrain were
    named in the same VERDICT r10 class but carry NO aggregate-input
    arithmetic: the former aggregates only count(1) + grouping markers
    (its Expand sits directly on the pruned scan), the latter is
    Generate-based with the per-row bit arithmetic below its FIRST
    aggregate and the fanout over bounded mask rows. Pin that so the
    class cannot silently reappear."""
    plan = plan_of(spark, "agg_rollup_grouping_id")
    assert "Expand" in plan
    assert "floor(" not in plan.lower()

    plan = plan_of(spark, "agg_bitmap_rollup_multigrain")
    assert "Expand" not in plan, "multigrain rollup should be Generate-based"
    assert "Generate" in plan


def test_lsh_verify_scores_at_pair_grain(spark):
    """Round-12 (SCALE.md §34, the pair-grain multiplication class):
    LSH candidate counts are quadratic in bucket size (6.16M pairs from
    5000 docs at sf0.1), so the exact-verify must score candidates at
    PAIR grain — doc-grain token/signature ARRAYS joined shuffle-hash,
    array_intersect / zip_with per pair — never by re-expanding the
    pair table to (pair x token) or (pair x coordinate) grain through a
    postings join (the round-11 1g-heap OOM). Pin: each re-planned op's
    physical plan carries the array scoring and a ShuffledHashJoin, and
    no exchange repartitions on a (pair-key, token) combination."""
    import re

    for name, needles in (
        ("dedup_minhash_est_error", ("array_intersect", "zip_with")),
        ("dedup_minhash_lsh", ("array_intersect",)),
        ("dedup_prefix_filter_jaccard", ("array_intersect",)),
    ):
        plan = plan_of(spark, name)
        for needle in needles:
            assert needle in plan, f"{name}: {needle} scoring missing"
        assert "ShuffledHashJoin" in plan, (
            f"{name}: pair-verify join is not shuffle-hash"
        )
        # ADVICE r12: capture to the END of the line, not the first ')',
        # so a nested function call inside the partitioning expression
        # (e.g. knownfloatingpointnormalized(...)) can't hide a trailing
        # token column from the guard.
        parts = re.findall(r"hashpartitioning\((.*)\)", plan)
        for keys in parts:
            assert not (
                ("doc_lo" in keys or "doc_hi" in keys) and "token" in keys
            ), f"{name}: pair x token exchange returned: {keys}"
        # Positive pin: the pair-verify exchanges on the doc keys alone
        # must exist — if the regex ever goes blind, this fails loudly
        # instead of silently passing.
        assert any(
            ("doc_lo" in keys or "doc_hi" in keys) for keys in parts
        ), f"{name}: no doc-key hashpartitioning found ({len(parts)} exchanges)"


def test_copurchase_pair_family_bounded(spark):
    """Round-13 (SCALE.md §35): the hourly co-purchase pair family is
    bucket-quadratic BY DECLARED SEMANTICS (the edge list is the
    operator's subject), so the scale guard is (a) plan shape — the
    pair self-join must stay equi-keyed on the hour bucket, never
    degrade to a cartesian/nested-loop whose cost would be corpus-
    quadratic instead of bucket-quadratic — and (b) the fixture
    envelope the family's measured cost class depends on: per-hour
    max bucket 3 users / 34 total pairs at sf0.001 (round-13 audit),
    pinned at 5x so a regenerated fixture that moves the family's
    cost class fails loudly instead of silently."""
    import pyspark.sql.functions as F

    from etl_intraday_bidask_spark.tables import load

    for name in (
        "graph_triangle_count",
        "graph_clustering_coefficient",
        "graph_triangle_participation",
    ):
        plan = plan_of(spark, name)
        assert "CartesianProduct" not in plan, f"{name}: cartesian pairs"
        # 1-row scalar basis builds legitimately appear as
        # BroadcastNestedLoopJoin Cross BuildRight; any OTHER nested-loop
        # join means a data-grain join lost its equi key.
        for line in plan.splitlines():
            # Tree-section lines only ("... BroadcastNestedLoopJoin Cross
            # BuildRight (91)"); the detail section repeats the bare node
            # name as "(91) BroadcastNestedLoopJoin" without the build
            # qualifier.
            if (
                "BroadcastNestedLoopJoin" in line
                and not line.strip().startswith("(")
            ):
                assert "Cross Build" in line, (
                    f"{name}: non-scalar nested-loop join: {line.strip()}"
                )
        # The pair self-join must keep the hour equi key, with the
        # user_id ordering as a RESIDUAL condition on a hash join — if
        # the h key were ever lost, the u<v condition alone cannot make
        # a hash join and this line disappears.
        assert any(
            "Join condition:" in line and "user_id" in line and "<" in line
            for line in plan.splitlines()
        ), f"{name}: keyed pair join with u<v residual not found"

    buckets = (
        load(spark, SF_SMALL, "events")
        .where(F.col("event_type") == "purchase")
        .select(F.date_trunc("hour", "ts").alias("h"), "user_id")
        .distinct()
        .groupBy("h")
        .count()
    )
    row = buckets.agg(
        F.max("count").alias("max_bucket"),
        F.sum(F.expr("count * (count - 1) / 2")).alias("pairs"),
    ).collect()[0]
    assert row["max_bucket"] <= 15, (
        f"sf0.001 max hourly co-purchase bucket {row['max_bucket']} "
        "outside the SCALE §35 envelope (measured 3, pinned 5x)"
    )
    assert row["pairs"] <= 170, (
        f"sf0.001 co-purchase pair count {row['pairs']} outside the "
        "SCALE §35 envelope (measured 34, pinned 5x)"
    )


def test_component_histogram_edges_star_contracted(spark):
    """Round-14 (SCALE.md §35 escalation path 1, implemented): the
    connectivity consumer's edge list must stay STAR-CONTRACTED —
    per-hour member->hub edges (sf-linear), never the C(n,2) pair
    clique (sf-quadratic). Pins: (a) the hub join is a broadcast hash
    join (hubs are calendar-bounded), (b) no u<v pair-join residual
    anywhere in the plan — the clique construction's signature — and
    (c) the edge COUNT obeys the star law 2*sum(n-1) over buckets of
    size >= 2, not the clique law 2*sum(C(n,2))."""
    import io
    import contextlib

    import pyspark.sql.functions as F

    from etl_intraday_bidask_spark.operators.staged_r12 import (
        copurchase_star_edges,
    )
    from etl_intraday_bidask_spark.tables import load

    edges = copurchase_star_edges(spark, SF_SMALL)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        edges.explain("formatted")
    plan = buf.getvalue()
    assert "BroadcastHashJoin" in plan, "hub join lost its broadcast"
    assert not any(
        "Join condition:" in line and "user_id" in line and "<" in line
        for line in plan.splitlines()
    ), "pair-clique self-join (u<v residual) returned to the plan"

    # Independent driver-side oracle over the tiny sf0.001 bucket table
    # (a few hundred rows): per hour, hub = min member; distinct
    # (hub, member) pairs across hours (the construction dedups the
    # same star edge recurring in multiple hours), bidirectional.
    rows = (
        load(spark, SF_SMALL, "events")
        .where(F.col("event_type") == "purchase")
        .select(F.date_trunc("hour", "ts").alias("h"), "user_id")
        .distinct()
        .collect()
    )
    by_hour: dict = {}
    for r in rows:
        by_hour.setdefault(r["h"], set()).add(r["user_id"])
    star_pairs = set()
    for members in by_hour.values():
        if len(members) >= 2:
            hub = min(members)
            star_pairs.update((hub, u) for u in members if u != hub)
    assert edges.count() == 2 * len(star_pairs), (
        "edge volume off the star law 2*|distinct hub-member pairs| — "
        "the construction is enumerating something other than one "
        "star per bucket"
    )
