"""Table loaders — schema-on-read from Parquet footers.

All ten fixture tables (FIXTURES.md) load via ``spark.read.parquet``;
Spark's vectorized reader + Catalyst give predicate pushdown and column
pruning for free, so loaders stay thin. At data-lake scale the same call
points at a partitioned S3 prefix and partition pruning applies.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def ensure_session_confs(spark: SparkSession) -> None:
    """Set the runtime SQLConfs the engine's semantics depend on.

    Called on every load because the grading driver builds its OWN
    SparkSession (without session.py's defaults): without these, every
    events-table read throws PARQUET_TYPE_ILLEGAL (ns timestamps) and
    non-UTC sessions would shift date_trunc/timestamp-literal results
    away from the DuckDB oracle. Both are dynamic confs, safe to set
    per-session at runtime.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")


# Per-session memos of loaded tables / registered views. ``spark.read.
# parquet`` costs a driver-side file listing + footer/schema read plus
# several py4j round trips on EVERY call — measured 80-290 ms of pure
# plan-construction time per bench query. Fixture tables are static,
# and a DataFrame is an immutable logical plan, so reusing one per
# (session, dir, table) is semantics-free.
#
# The memo dict lives ON the session object (round-9 review): the
# previous module-level WeakKeyDictionary never released anything,
# because its VALUES are DataFrames, every DataFrame strongly
# references its session, and a weak-key entry whose value reaches the
# key is never collected. As a session attribute, the memo (a
# session→dict→DataFrame→session cycle) is reclaimed by the cycle
# collector exactly when the session object dies.


def session_memo(spark: SparkSession, attr: str) -> dict:
    """The named per-session memo dict, created on first access.

    Public: operators outside this module (e.g. quality.py's persisted-
    relation cache) key their own session-scoped state through it
    rather than importing a private helper (round-10 ADVICE)."""
    memo = getattr(spark, attr, None)
    if memo is None:
        memo = {}
        setattr(spark, attr, memo)
    return memo


# Backwards-compat private alias (pre-round-10 name).
_session_memo = session_memo


def load_memo(spark: SparkSession) -> dict:
    """The (sf_dir, table) -> DataFrame memo behind :func:`load`.
    Public so tests can inject fixture frames; :func:`view` re-registers
    its temp view whenever the injected frame's identity changes."""
    return _session_memo(spark, "_etl_graft_load_memo")


def normalize_event_time(df: DataFrame, col: str) -> DataFrame:
    """Normalize an event-time column to the engine's canonical
    ``TimestampType`` regardless of the parquet physical shape.

    The fixtures have shipped the same instant data three ways already:
    TIMESTAMP(NANOS) (read as LongType nanos under ``nanosAsLong``),
    TIMESTAMP(MICROS) ``isAdjustedToUTC=true`` (``TimestampType``), and
    TIMESTAMP(MICROS) ``isAdjustedToUTC=false`` (``TimestampNTZType``).
    Every downstream call site (``unix_micros``, ``withWatermark``,
    ``window``) requires ``TimestampType``, so the engine canonicalizes
    at the load boundary instead of assuming one physical type.

    Both conversions are value-preserving: the session timezone is
    pinned UTC (``ensure_session_confs``), so NTZ→Timestamp reinterprets
    the wall-clock as UTC — epoch-µs bit-identical to DuckDB's
    ``epoch_us`` on the same file. Long-nanos uses integer ``div`` (not
    ``/``): double division loses precision at epoch-nanos magnitudes
    (> 2^53).
    """
    dt = df.schema[col].dataType
    if isinstance(dt, T.LongType):
        return df.withColumn(col, F.expr(f"timestamp_micros({col} div 1000)"))
    if isinstance(dt, T.TimestampNTZType):
        return df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def normalize_date_ntz(df: DataFrame, col: str) -> DataFrame:
    """Canonicalize a date-like column to ``TimestampNTZType`` — the
    shape every driver grade since round 3 pinned for
    ``o_orderdate``/``l_shipdate``.

    No-op on the current fixtures (already µs NTZ); the other arms only
    activate if a regeneration flips the physical type again (the
    round-3 failure mode ``normalize_event_time`` armors ``events.ts``
    against): TIMESTAMP(NANOS)-as-long and tz-adjusted µs reinterpret
    to the same wall-clock under the pinned-UTC session, DATE becomes
    midnight. Value-preserving in every arm because the fixtures are
    generated in UTC.
    """
    dt = df.schema[col].dataType
    if isinstance(dt, T.TimestampNTZType):
        return df
    if isinstance(dt, T.LongType):
        return df.withColumn(
            col,
            F.expr(f"timestamp_micros({col} div 1000)").cast("timestamp_ntz"),
        )
    if isinstance(dt, (T.TimestampType, T.DateType)):
        return df.withColumn(col, F.col(col).cast("timestamp_ntz"))
    return df


# Date-like columns canonicalized to TIMESTAMP_NTZ at the load boundary.
_NTZ_DATE_COLS = {"orders": ("o_orderdate",), "lineitem": ("l_shipdate",)}


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table from ``{sf_dir}/{name}.parquet``."""
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    memo = load_memo(spark)
    if (sf_dir, name) in memo:
        return memo[(sf_dir, name)]
    ensure_session_confs(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        df = normalize_event_time(df, "ts")
    for col in _NTZ_DATE_COLS.get(name, ()):
        df = normalize_date_ntz(df, col)
    memo[(sf_dir, name)] = df
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load(spark, sf_dir, name) for name in TABLE_NAMES}


# Per-session memo of registered temp views over load()'s DataFrames
# (same session-attribute storage as load_memo — see above).
# Motive (round-8 dispatch-floor work): a query body built from ~50-150
# pyspark.sql.functions/Column calls pays ~1 ms of py4j latency PER
# CALL — 50-180 ms of pure driver-side construction per bench query,
# often exceeding the execution time at sf0.1. A spark.sql() text is
# ONE py4j round trip and parses JVM-side in a few ms, producing the
# SAME logical plan for Catalyst. View names embed a hash of sf_dir so
# two scale factors in one session can never alias each other's data.


def _view_memo(spark: SparkSession) -> dict:
    return _session_memo(spark, "_etl_graft_view_memo")


def view(spark: SparkSession, sf_dir: str, name: str) -> str:
    """Return a session temp-view name over ``load(spark, sf_dir, name)``.

    The returned name is deterministic (``{table}_v{md5(sf_dir)[:8]}``)
    and safe to splice into a ``spark.sql`` text. The memo is keyed on
    the IDENTITY of load()'s DataFrame, not just (sf_dir, table): if the
    frame behind load() changes within a session (tests inject frames
    via ``load_memo``; fuzz runs re-point a directory), the view is
    re-registered over the new frame instead of silently serving stale
    data — and because the name is deterministic per (sf_dir, table),
    re-registration REPLACES the old view, so a long session never
    accumulates temp views beyond one per distinct (sf_dir, table).
    """
    import hashlib

    memo = _view_memo(spark)
    key = (sf_dir, name)
    df = load(spark, sf_dir, name)
    cached = memo.get(key)
    if cached is not None and cached[1] is df:
        return cached[0]
    vname = (
        f"{name}_v{hashlib.md5(sf_dir.encode()).hexdigest()[:8]}"
    )
    df.createOrReplaceTempView(vname)
    memo[key] = (vname, df)
    return vname


_SCRATCH_PARENTS: dict[str, str] = {}


def scratch_dir(tag: str) -> str:
    """A fresh per-invocation temp directory, removed at interpreter
    exit — one memoized parent per tag, a unique subdirectory per call.

    For operators that write a table copy and read it back (sinks,
    roundtrips, partitioned-lake builds): a bare ``tempfile.mkdtemp``
    per invocation leaks directories across a long bench/fuzz/sweep
    session (round-8 ADVICE class, SCALE.md §29). This keeps the
    per-invocation isolation — a frame returned by an earlier
    invocation still reads ITS OWN files, no overwrite race — and
    bounds the garbage's lifetime to the process instead of forever,
    with ONE atexit handler per tag (not per invocation, which grew
    the atexit list unboundedly — round-10 review).

    Deliberate tradeoff: within ONE long process, disk grows by one
    small (test-SF-sized) subdirectory per invocation. Reclaiming
    earlier dirs mid-process is unsafe by construction — Spark pins
    concrete part-file names into any not-yet-collected frame at
    analysis time, so an eager rmtree (or a reused dir overwritten in
    place) turns a live lazy frame into FileNotFound. Process-lifetime
    cleanup is the only interleaving-safe point.
    """
    import tempfile

    parent = _SCRATCH_PARENTS.get(tag)
    if parent is None:
        import atexit
        import shutil

        # setdefault makes the memoization race-free (round-10 ADVICE:
        # the concurrency study submits ops from a thread pool, so two
        # first calls for one tag can both reach this branch). Exactly
        # one created parent wins and registers its atexit; the loser's
        # directory is empty by construction and removed immediately.
        created = tempfile.mkdtemp(prefix=f"{tag}_")
        parent = _SCRATCH_PARENTS.setdefault(tag, created)
        if parent is created:
            atexit.register(shutil.rmtree, parent, ignore_errors=True)
        else:
            shutil.rmtree(created, ignore_errors=True)
    return tempfile.mkdtemp(dir=parent)
