"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All operators live in ``etl_intraday_bidask_spark`` (see SURVEY.md §2
for the declared contract); this module just adapts the registry to the
driver's three-function interface.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from etl_intraday_bidask_spark.registry import load_all_operators


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    registry = load_all_operators()
    return registry["agg_pricing_summary"].spark_fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.spark_fn for name, spec in load_all_operators().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL for every hash-checked operator; rows-only ops
    (sinks, approx sketches, watermark behavior) are omitted."""
    return {
        name: spec.oracle_sql
        for name, spec in load_all_operators().items()
        if spec.oracle_sql is not None
    }
