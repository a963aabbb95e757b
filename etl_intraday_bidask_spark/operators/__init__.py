"""Operator modules. Importing this package registers every SURVEY.md §2
operator into :mod:`etl_intraday_bidask_spark.registry`."""

from etl_intraday_bidask_spark.operators import (  # noqa: F401
    aggregates,
    dedup_advanced,
    joins,
    llm_ops,
    multimodal,
    projection,
    scalar_funcs,
    scans,
    setops,
    similarity,
    sorts,
    text_analysis,
    timeseries,
    quality,
    udfs,
    windows,
)

# The ETL pipeline operator lives under plans/ but registers like any other.
from etl_intraday_bidask_spark.plans import pipeline  # noqa: E402,F401
