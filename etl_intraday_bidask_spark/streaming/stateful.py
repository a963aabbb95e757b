"""Custom stateful streaming operator (SURVEY.md §2.9 extension):
per-user running aggregate via ``applyInPandasWithState``.

This is the escape hatch for stateful semantics Spark's built-in
streaming aggregates can't express (per-key custom state machines,
decaying counters, order-book reconstruction). State lives in the
executor state stores keyed by user_id; each micro-batch's rows for a
key arrive as Arrow-backed pandas batches, the handler folds them into
the state tuple and emits the running snapshot.

Hash-graded despite being streaming: the emitted running (count, max)
snapshots are monotone, so ``max`` over all emissions equals the final
per-user totals regardless of how the replay is micro-batched — which
is exactly ``SELECT user_id, count(*), max(value) GROUP BY user_id``
in the oracle.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from etl_intraday_bidask_spark.registry import register
from etl_intraday_bidask_spark.streaming.replay import (
    _read_events_stream,
    _run_to_memory,
)


def _running_agg(key, pdf_iter, state):
    # Imported lazily: the function body executes in the Python worker.
    import pandas as pd

    if state.exists:
        n, mx = state.get
    else:
        n, mx = 0, float("-inf")
    for pdf in pdf_iter:
        n += len(pdf)
        if len(pdf):
            mx = max(mx, float(pdf["value"].max()))
    state.update((n, mx))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "max_value": [mx]}
    )


@register(
    "stream_stateful_running_agg",
    oracle_sql="""
        SELECT user_id, count(*) AS n_events, max(value) AS max_value
        FROM events
        GROUP BY user_id
    """,
    description="applyInPandasWithState custom stateful operator: "
    "per-user running (event count, max value) maintained in executor "
    "state stores across micro-batches, replayed with availableNow. "
    "Monotone snapshots make the final max-over-emissions equal the "
    "batch aggregate, so this streaming op is hash-graded.",
)
def stream_stateful_running_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.streaming.state import GroupStateTimeout

    ev = _read_events_stream(spark, sf_dir)
    running = ev.groupBy("user_id").applyInPandasWithState(
        _running_agg,
        outputStructType="user_id bigint, n_events bigint, max_value double",
        stateStructType="n bigint, mx double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    emitted = _run_to_memory(running, "update")
    return emitted.groupBy("user_id").agg(
        F.max("n_events").alias("n_events"),
        F.max("max_value").alias("max_value"),
    )


@register(
    "stream_foreachbatch_compact",
    oracle_sql="""
        SELECT user_id, count(*) AS n_events
        FROM events
        GROUP BY user_id
    """,
    description="foreachBatch lake-landing pattern: each micro-batch "
    "appends its per-user partial counts to a staging parquet dir, and "
    "a compaction pass re-aggregates the partials after the replay — "
    "the additive-merge shape (counts, sums, sketches) that makes "
    "incremental ingestion deterministic regardless of micro-batching, "
    "which is exactly why it stays hash-gradable against the batch "
    "GROUP BY.",
)
def stream_foreachbatch_compact(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    from etl_intraday_bidask_spark.tables import scratch_dir

    ev = _read_events_stream(spark, sf_dir)
    staging = os.path.join(
        scratch_dir("foreachbatch"), "partials"
    )

    def land_batch(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.groupBy("user_id")
            .agg(F.count(F.lit(1)).alias("partial_n"))
            .write.mode("append")
            .parquet(staging)
        )

    query = (
        ev.writeStream.foreachBatch(land_batch)
        .option("checkpointLocation", scratch_dir("ckpt_fb"))
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return (
        spark.read.parquet(staging)
        .groupBy("user_id")
        .agg(F.sum("partial_n").alias("n_events"))
    )

