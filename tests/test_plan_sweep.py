"""Global plan-quality sweep: every operator's physical plan is checked
for the two scale killers —

- ``CartesianProduct``: an unkeyed large-large join; never acceptable.
  (``BroadcastNestedLoopJoin`` is allowed: every occurrence in this
  engine broadcasts a tiny side — band tables, hash-parameter tables,
  query vectors, 1-row scalars — which is the intended pattern.)
- Python evaluation (``BatchEvalPython``/``ArrowEvalPython``/
  ``FlatMapGroupsInPandas``/UDTF) outside the operators that exist to
  grade the Python boundary: everything else must stay whole-stage
  codegen JVM-side.

This is plan inspection only (no execution), so it covers all operators
in seconds and fails the moment a refactor silently de-optimizes one.
"""

from __future__ import annotations

import contextlib
import io

import pytest

from etl_intraday_bidask_spark.registry import load_all_operators
from tests.conftest import SF_SMALL

REGISTRY = load_all_operators()

# Side-effecting or streaming-executing operators: building the plan
# already runs jobs, so they are exercised by test_parity instead.
EXECUTES_ON_BUILD = {
    "sink_parquet_partitioned",
    "sink_partition_overwrite_dynamic",
    "scan_schema_evolution",
    "dedup_connected_components",
    "dedup_keep_canonical",
    "scan_partition_pruned",
    "join_dynamic_partition_pruning",
    "source_csv_roundtrip",
    "source_orc_roundtrip",
    "source_json_roundtrip",
    "etl_star_pipeline",
    "stream_stateful_running_agg",
    "stream_foreachbatch_compact",
    "stream_tumbling_append_closed",
    "source_python_stream_datasource",
    "stream_session_append_closed",
    "stream_sliding_append_closed",
    "stream_interval_join_outer",
    "stream_dedup_within_watermark",
    "scan_csv_permissive_corrupt",
    "etl_quarantine_route",
    "multimodal_decode_stub",
    "observe_pipeline_metrics",
}

# The declared Python-boundary surface (SURVEY.md §2.11, §2.13, §2.28).
PYTHON_ALLOWED = {
    "udf_python_scalar",
    "udf_arrow_scalar",
    "udtf_mapinarrow",
    "udaf_grouped_pandas",
    "udaf_cogrouped_pandas",
    "udtf_python_ngrams",
    "udtf_dynamic_analyze",
    "udtf_table_argument",
    "multimodal_frame_sample",
    "multimodal_meta_extract",
    "multimodal_resize_stub",
}

PYTHON_MARKERS = (
    "BatchEvalPython",
    "ArrowEvalPython",
    "FlatMapGroupsInPandas",
    "FlatMapCoGroupsInPandas",
    "PythonUDTF",
)

SWEPT = sorted(set(REGISTRY) - EXECUTES_ON_BUILD)


@pytest.mark.parametrize("name", SWEPT)
def test_plan_has_no_scale_killers(spark, name):
    df = REGISTRY[name].spark_fn(spark, SF_SMALL)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "CartesianProduct" not in plan, (
        f"{name}: unkeyed cartesian join — add an equi/blocking key"
    )
    if name not in PYTHON_ALLOWED:
        hits = [m for m in PYTHON_MARKERS if m in plan]
        assert not hits, (
            f"{name}: Python evaluation {hits} outside the declared UDF "
            "surface — keep the hot path JVM-side"
        )
