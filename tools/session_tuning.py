"""A/B the remaining stream_session_30m scale levers (VERDICT r12 item 6).

`stream_session_30m` is 37% of the 100x crossover suite wall. The
gaps-and-islands re-plan was A/B'd and REFUSED in round 12 (native
`session_window` wins 1.8x on Spark); what remains is tuning the
native path. Levers measured here, on the same 10x splittable fixture
the crossover uses (SPARK_GRAFT_CROSSOVER_REP=100 for 100x):

  - spark.sql.shuffle.partitions in {8, 16, 32, 64, 128}: the
    session_window aggregation shuffles on user_id; partition count
    trades scheduling overhead against per-task sort/merge size.
  - spark.sql.adaptive.enabled on/off at the winning partition count:
    AQE coalescing vs its per-stage re-plan cost.
  - checkpoint barrier before the final ORDER BY: the round-13 floor
    decomposition showed a global range sort's bounds-sampling job
    re-executes the whole upstream subtree — for this op that means
    running the session aggregation TWICE per query. localCheckpoint
    before the sort trades one materialization for the duplicate
    execution; the session grain is data-dependent so the distributed
    range sort itself must stay.

Method: one warmed session, variants interleaved round-robin (so a
window drift hits all variants equally), median of 5 per variant.
Output: one JSON line with the table + the session's warmed floor.

Usage: python tools/session_tuning.py
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.crossover_bench import generate  # same 10x fixture builder

RUNS = 5
PARTS = (8, 16, 32, 64, 128)


def main() -> None:
    from etl_intraday_bidask_spark.registry import load_all_operators
    from etl_intraday_bidask_spark.session import build_spark

    big = tempfile.mkdtemp(prefix="sess_tune_")
    generate(big)
    reg = load_all_operators()
    fn = reg["stream_session_30m"].spark_fn

    spark = build_spark(app_name="session-tuning", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set(
        "spark.sql.files.maxPartitionBytes", str(8 * 1024 * 1024)
    )

    variants: list[tuple[str, dict]] = [
        (f"p{p}_aqe_on", {"spark.sql.shuffle.partitions": str(p),
                          "spark.sql.adaptive.enabled": "true"})
        for p in PARTS
    ] + [
        (f"p{p}_aqe_off", {"spark.sql.shuffle.partitions": str(p),
                           "spark.sql.adaptive.enabled": "false"})
        for p in PARTS
    ]

    def run(conf: dict) -> float:
        for k, v in conf.items():
            spark.conf.set(k, v)
        t0 = time.perf_counter()
        fn(spark, big).toPandas()
        return time.perf_counter() - t0

    def body(sf_dir: str):
        # The op's session aggregation WITHOUT its final ORDER BY (sort
        # applied by the variant) — so the barrier variant measures
        # checkpoint-then-sort INSTEAD of the duplicate-execution sort,
        # not on top of it. ADVICE r13: sourced from the operator module
        # itself (shared body), not a hand-restated copy that could
        # silently A/B a different plan than the op it claims to tune.
        from etl_intraday_bidask_spark.operators.timeseries import (
            session_30m_unsorted,
        )

        return session_30m_unsorted(spark, sf_dir)

    def run_barrier(conf: dict) -> float:
        for k, v in conf.items():
            spark.conf.set(k, v)
        t0 = time.perf_counter()
        # Materialize the (unsorted) session aggregate once, then
        # range-sort the checkpoint — the sampling job reads the
        # checkpoint instead of re-running the aggregation.
        body(big).localCheckpoint(eager=False).orderBy(
            "user_id", "session_start_us"
        ).toPandas()
        return time.perf_counter() - t0

    barrier_variants = [
        ("p32_aqe_off_barrier", {"spark.sql.shuffle.partitions": "32",
                                 "spark.sql.adaptive.enabled": "false"}),
        ("p32_aqe_on_barrier", {"spark.sql.shuffle.partitions": "32",
                                "spark.sql.adaptive.enabled": "true"}),
    ]
    for _, conf in variants:  # warm every variant's codegen/shuffle path
        run(conf)
    for _, conf in barrier_variants:
        run_barrier(conf)
    samples: dict[str, list[float]] = {
        name: [] for name, _ in variants + barrier_variants
    }
    for _ in range(RUNS):
        for name, conf in variants:
            samples[name].append(run(conf))
        for name, conf in barrier_variants:
            samples[name].append(run_barrier(conf))

    floor = []
    for _ in range(15):
        t0 = time.perf_counter()
        spark.range(1).count()
        floor.append(time.perf_counter() - t0)

    out = {
        "metric": "session_30m_tuning",
        "n_rep": int(os.environ.get("SPARK_GRAFT_CROSSOVER_REP", "10")),
        "warmed_floor_ms": round(statistics.median(floor) * 1000, 1),
        "variants_ms": {
            name: round(statistics.median(xs) * 1000, 1)
            for name, xs in samples.items()
        },
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
