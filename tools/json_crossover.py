"""JSON-extraction crossover: raw re-parse vs parse-once typed path.

BASELINE.md records JSON extraction as the one measured engine-level
throughput gap (json_get 14-27x DuckDB across scales: Jackson
per-query re-parse vs DuckDB's vectorized JSON). The structural fix is
`etl_json_ingest_normalize` (SURVEY.md 2.28): parse `events.props`
ONCE into a typed column at ingest, land typed parquet, and aggregate
off the typed table. This tool measures all three paths on the same
10x (~1M-row events) fixture:

- spark_raw_ms:    registry `json_get` (from_json per query)
- spark_typed_ms:  the SAME aggregate off the staged typed parquet
                   (ingest cost reported separately as stage_ms —
                   paid once per byte, amortized over every query)
- duckdb_raw_ms:   the DuckDB oracle (json_extract_string per query)

Usage: python tools/json_crossover.py   (one JSON line; recorded in
BASELINE.md "JSON crossover" section).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import tempfile
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import duckdb

from tools.crossover_bench import generate


def median_of(fn, runs=3):
    samples = []
    for _ in range(runs):
        t0 = time.perf_counter()
        fn()
        samples.append(time.perf_counter() - t0)
    return round(statistics.median(samples) * 1000, 1)


def main() -> None:
    from etl_intraday_bidask_spark.operators.staged_r6 import (
        _INGEST_STAGE,
        etl_json_ingest_normalize,
    )
    from etl_intraday_bidask_spark.registry import load_all_operators
    from etl_intraday_bidask_spark.session import build_spark

    big = tempfile.mkdtemp(prefix="json_crossover_")
    generate(big)
    reg = load_all_operators()

    spark = build_spark(app_name="json-crossover", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set(
        "spark.sql.files.maxPartitionBytes", str(8 * 1024 * 1024)
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS "
        f"SELECT * FROM read_parquet('{big}/events.parquet')"
    )

    raw_fn = reg["json_get"].spark_fn
    raw_sql = reg["json_get"].oracle_sql

    # Ingest staging (parse-once): timed separately; the typed query
    # path below never touches raw JSON again.
    t0 = time.perf_counter()
    etl_json_ingest_normalize(spark, big).toPandas()
    stage_ms = round((time.perf_counter() - t0) * 1000, 1)
    assert big in _INGEST_STAGE

    for _ in range(2):  # warm all three paths
        raw_fn(spark, big).toPandas()
        etl_json_ingest_normalize(spark, big).toPandas()
        con.sql(raw_sql).fetchall()

    spark_raw_ms = median_of(lambda: raw_fn(spark, big).toPandas())
    spark_typed_ms = median_of(
        lambda: etl_json_ingest_normalize(spark, big).toPandas()
    )
    duckdb_raw_ms = median_of(lambda: con.sql(raw_sql).fetchall())

    print(
        json.dumps(
            {
                "metric": "json_crossover_10x",
                "stage_ms": stage_ms,
                "spark_raw_ms": spark_raw_ms,
                "spark_typed_ms": spark_typed_ms,
                "duckdb_raw_ms": duckdb_raw_ms,
                "raw_ratio": round(spark_raw_ms / duckdb_raw_ms, 2),
                "typed_ratio": round(spark_typed_ms / duckdb_raw_ms, 2),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
