"""Cross-engine numeric determinism helpers.

The fixture money/quantity columns are exact 2-decimal values. Products
of them have exactly 4 or 6 decimals, and such values frequently land
ON the round-half boundary (e.g. 17947.60995), where Spark's ``round``
(HALF_UP over the shortest decimal repr) and DuckDB's (binary
``std::round``) disagree. ``round(x, 4)`` is therefore NOT a valid
parity policy for sums/averages of fixture money columns.

Policy (supersedes the 4-dp note in SURVEY.md §1.3 for these cases):
scale each expression to its exact decimal grid, round-to-int (the
binary value is within ulps of the true integer, so both engines recover
the SAME integer), aggregate the BIGINTs exactly, and divide back ONCE
at the end — a single IEEE division that is bit-identical across
engines. No rounding decision is ever made on an ambiguous value.

``round(x, 4)`` remains correct for irrational outputs (sqrt/ln/cosine/
z-scores): their boundary hits are measure-zero, and dyadic rationals —
the only small-denominator values that land exactly on the grid — are
binary-exact so both engines agree.

**Rationals of exact integers must NOT be rounded either** (learned
live in round 5: ``round(S1/n, 4)`` with the true value 47.75375 gave
47.7538 on Spark and 47.7537 on DuckDB). A ratio like k/32 lands
EXACTLY on the 4-dp half boundary whenever the reduced denominator
divides 2*10^dp — reachable with realistic counts (windows of 24/32
rows, 16/64-hash sketches, small partitions). The correct emission for
``int_a / int_b`` is the UNROUNDED double: both engines perform the
same single IEEE division on the same integers and produce the same
bits, so no rounding decision is ever needed. The same holds for any
longer float chain whose inputs are exact integers and whose operation
sequence is textually congruent on both sides (OLS Cramer ratios,
Bollinger band formulas). When a per-row float must be AGGREGATED
across rows (summation order is not deterministic on a cluster),
quantize the per-row value to an exact integer grid first
(``floor(x*1e6 + 0.5)``), sum the integers exactly, and divide once —
see text_readability_score for the pattern. A protective ``round()``
stays ONLY where the value is produced by an order-sensitive float
aggregate we deliberately exercise (builtin var_pop/corr, float sums),
where it suppresses last-ulp noise.

Each helper documents the DuckDB SQL it must be paired with; the pairing
is what makes the hash match, so keep both sides textually in sync.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column


def scaled_long(col: Column | str, scale: int) -> Column:
    """Exact scaled integer of a fixed-decimal column/expression.

    DuckDB pair: ``CAST(round(x * {scale}) AS BIGINT)``.

    Implemented as ``floor(x*scale + 0.5)`` rather than ``F.round``:
    Spark's double ``round`` routes every value through a BigDecimal
    HALF_UP allocation (measured ~2× the whole aggregate's cost on the
    8-aggregate pricing query), while ``floor`` is a JVM intrinsic
    inside codegen. The two are identical on this helper's documented
    domain: x*scale lands within float ulps of an integer n (that is
    the exact-decimal-grid precondition), so for either sign of n,
    ``floor(n ± ε + 0.5) = n`` — the half-boundary where floor-half-up
    and round-half-away differ is unreachable by construction.
    (Verified exhaustively over every money/quantity/value expression
    at sf0.1: zero mismatches vs the BigDecimal form.) Do NOT reuse
    this shortcut for arbitrary (non-grid) floats — there the boundary
    is reachable and ``F.round`` must be paired with DuckDB's
    ``round`` semantics explicitly.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.floor(c * F.lit(float(scale)) + F.lit(0.5)).cast("long")


def exact_value(col: Column | str, scale: int) -> Column:
    """Canonical double of a fixed-decimal per-row expression.

    DuckDB pair: ``CAST(round(x * {scale}) AS BIGINT) / {scale}.0``.
    """
    return scaled_long(col, scale) / F.lit(float(scale))


def exact_sum(col: Column | str, scale: int) -> Column:
    """Exact sum of a fixed-decimal column, emitted as double.

    DuckDB pair:
    ``CAST(sum(CAST(round(x * {scale}) AS BIGINT)) AS DOUBLE) / {scale}.0``.
    """
    return F.sum(scaled_long(col, scale)).cast("double") / F.lit(float(scale))


def exact_avg(col: Column | str, scale: int) -> Column:
    """Exact-sum-based average of a fixed-decimal column.

    DuckDB pair:
    ``CAST(sum(CAST(round(x * {scale}) AS BIGINT)) AS DOUBLE) / {scale}.0
    / count(*)`` — the division order (sum → /scale → /count) must match.
    """
    return exact_sum(col, scale) / F.count(F.lit(1))
