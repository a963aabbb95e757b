"""Presentation-order tails without the RangePartitioning tax.

A trailing ``df.orderBy(...)`` compiles to a global range sort: Spark
samples the input to compute range boundaries (one extra job), then
range-shuffles into sorted partitions (another). On a small aggregated
result that is pure overhead — measured on the headline suite at
sf0.1, the sampling+range pair costs ~2 scheduler jobs ≈ 135 ms per
query, ~28 % of a floor-bound query's wall, while the sort itself
touches a handful of rows.

``ordered_small`` emits the same totally-ordered output with ZERO
extra jobs: ``coalesce(1)`` is a narrow dependency (no exchange, no
sampling) and ``sortWithinPartitions`` on the single partition is a
total order.

Scale contract — when this is the RIGHT plan at 100 TB, not a local
trick: ``coalesce(1)`` propagates into the final aggregation stage, so
that stage executes as ONE task reading every map-side partial. That
is safe exactly when the group-key cardinality is HARD-BOUNDED by
schema semantics (returnflag×linestatus ≤ 12, nations ≤ 25, event
types = 5, a ROLLUP over two low-cardinality dims): map-side partial
aggregation caps each upstream task's output at the group count, so
the single final task reads ≤ groups × map_tasks tiny rows — the same
data volume any driver ``collect()`` of the result already implies.
For outputs that SCALE with the data (per-event as-of rows, per-user
sessions, top-k per customer, vocabulary-sized token counts), keep the
plain ``orderBy``: there the parallel range sort is the point, and the
sampling job is amortized by real work. Headline ops annotate which
side of the line they are on.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame


def ordered_small(df: DataFrame, *cols: Column | str) -> DataFrame:
    """Totally order a hard-bounded small result with no extra jobs.

    Equivalent to ``df.orderBy(*cols)`` for any consumer (same rows,
    same total order) but compiles to coalesce(1) + in-partition sort:
    no range-boundary sampling job, no range exchange. Only use when
    the result cardinality is bounded by schema semantics — see the
    module docstring for the 100 TB argument.
    """
    return df.coalesce(1).sortWithinPartitions(*cols)
