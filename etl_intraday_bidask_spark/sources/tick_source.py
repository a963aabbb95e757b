"""Custom Python Data Source (Spark 4 ``pyspark.sql.datasource`` API):
a deterministic synthetic tick generator.

This is the engine's demonstration of the V2 Python data source
surface — the extension point for reading systems Spark has no
built-in connector for (internal tick feeds, bespoke binary formats,
REST-paginated APIs). The source is **partitioned**: the driver plans
one InputPartition per shard and each executor task generates only its
shard — the same parallel-read contract a real connector implements,
so the scan scales horizontally exactly like a file scan.

Determinism is the point of the demo: every value is a pure LCG
function of the global row index, so ANY engine can reproduce the
stream arithmetically — which is what makes the operator hash-gradable
against a DuckDB ``generate_series`` oracle (operators/scans.py:
``source_python_datasource``).
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

TICKS_PER_SHARD = 2500
SHARDS = 4
# LCG constants (glibc): values fit comfortably in int64 for any
# realistic index (i * 1103515245 overflows only beyond ~8.3e9 rows
# per shard; a production source would use a 128-bit mixer).
LCG_A = 1103515245
LCG_C = 12345
LCG_M = 2**31


def tick_row(i: int) -> tuple[int, int, str]:
    """Row ``i`` of the synthetic feed: (tick_id, px_cents, side)."""
    h = (i * LCG_A + LCG_C) % LCG_M
    return i, h % 10000, "bid" if i % 2 == 0 else "ask"


class TickReader(DataSourceReader):
    def partitions(self):
        return [InputPartition(s) for s in range(SHARDS)]

    def read(self, partition):
        start = partition.value * TICKS_PER_SHARD
        for i in range(start, start + TICKS_PER_SHARD):
            yield tick_row(i)


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class TickStreamReader(DataSourceStreamReader):
    """Streaming side of the tick feed (Spark 4 DataSourceStreamReader):
    offsets are global row indices; each micro-batch's [start, end)
    range is split into SHARDS executor partitions. The feed is finite
    (latestOffset pins at SHARDS × TICKS_PER_SHARD), so an availableNow
    replay reads the identical row set as the batch reader — same LCG
    arithmetic, same hash-gradable oracle."""

    def initialOffset(self) -> dict:
        return {"i": 0}

    def latestOffset(self) -> dict:
        return {"i": SHARDS * TICKS_PER_SHARD}

    def partitions(self, start: dict, end: dict):
        lo, hi = start["i"], end["i"]
        if hi <= lo:
            return [_RangePartition(lo, lo)]
        step = max(1, (hi - lo + SHARDS - 1) // SHARDS)
        return [
            _RangePartition(s, min(s + step, hi))
            for s in range(lo, hi, step)
        ]

    def read(self, partition):
        for i in range(partition.start, partition.end):
            yield tick_row(i)

    def commit(self, end: dict) -> None:
        pass


class TickDataSource(DataSource):
    """spark.read.format("synthetic_ticks") after registration."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_ticks"

    def schema(self) -> str:
        return "tick_id bigint, px_cents bigint, side string"

    def reader(self, schema) -> TickReader:
        return TickReader()

    def streamReader(self, schema) -> TickStreamReader:
        return TickStreamReader()
