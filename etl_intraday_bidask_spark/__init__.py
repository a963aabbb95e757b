"""PySpark-native analytics engine with the query surface of
``ucaiado/etl-intraday-bidask`` (see SURVEY.md).

The reference is an Airflow-orchestrated Spark ETL over intraday bid/ask
data landing Parquet in a star-schema data lake (SURVEY.md §0 — the
reference checkout is unavailable in this sandbox, so SURVEY.md §2 is the
binding capability contract). This package re-expresses that surface
Spark-first: declarative DataFrame/SQL plans optimized by Catalyst, with
Structured Streaming for the event-stream operators and Arrow-backed
pandas UDFs only where built-ins cannot express the semantics.

Layout
------
- ``session``    : SparkSession builder with scale-aware defaults.
- ``tables``     : parquet table loaders (schema-on-read).
- ``registry``   : QuerySpec registry — one entry per SURVEY.md §2 key,
                   holding the PySpark builder and its DuckDB oracle SQL.
- ``operators``  : relational / window / time-series / LLM-pipeline ops.
- ``sources``    : non-parquet sources and partitioned sinks.
- ``functions``  : reusable column expressions (vector math, text).
- ``streaming``  : Structured Streaming twins of the event-time ops.
"""

from etl_intraday_bidask_spark.registry import REGISTRY, QuerySpec, register

__all__ = ["REGISTRY", "QuerySpec", "register"]
