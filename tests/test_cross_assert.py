"""Cross-assertions between operator pairs that declare identical
semantics through different physical plans (SURVEY.md §5): the global
RANGE-window anchor vs its bucketed equi-join twin. Open since the
round-2 VERDICT; closes the `win_range_frame` design-debt item."""

from __future__ import annotations

from etl_intraday_bidask_spark.registry import load_all_operators
from tests.conftest import SF_SMALL

REGISTRY = load_all_operators()


def test_win_range_frame_equals_dist_twin(spark):
    """win_range_frame (semantic anchor: one global RANGE window) and
    win_range_frame_dist (scale path: two-bucket probe + equi join)
    must produce identical rows — the machine-checked proof that the
    distributed rewrite preserves the anchor's semantics."""
    anchor = REGISTRY["win_range_frame"].spark_fn(spark, SF_SMALL)
    dist = REGISTRY["win_range_frame_dist"].spark_fn(spark, SF_SMALL)
    assert sorted(anchor.columns) == sorted(dist.columns)
    a = sorted(map(tuple, anchor.collect()))
    d = sorted(map(tuple, dist.select(*anchor.columns).collect()))
    assert a == d, "bucketed rewrite diverges from the RANGE-window anchor"


def test_asof_family_survives_duplicate_timestamps(spark, tmp_path):
    """Fixture-drift armor (round-4 ADVICE, generalized in round 5):
    the as-of family must stay oracle-green on a fixture that DOES
    contain duplicate (user_id, ts) view rows — the case DuckDB's ASOF
    join leaves undefined and the shipped fixtures happen not to have.
    Builds an events variant where every 7th view is duplicated with a
    new event_id and a different value, then re-runs the full parity
    check for each op against its registered oracle on that variant."""
    import duckdb

    from etl_intraday_bidask_spark.tables import TABLE_NAMES, load
    from tests.test_parity import normalize

    import os

    variant = str(tmp_path / "dupfix")
    os.makedirs(variant)
    con = duckdb.connect()
    con.execute(f"""
        COPY (
            SELECT * FROM read_parquet('{SF_SMALL}/events.parquet')
            UNION ALL
            SELECT event_id + 10000000 AS event_id, ts, user_id,
                   event_type, value + 1.25 AS value, props
            FROM read_parquet('{SF_SMALL}/events.parquet')
            WHERE event_type = 'view' AND event_id % 7 = 0
        ) TO '{variant}/events.parquet' (FORMAT parquet)
    """)
    for name in TABLE_NAMES:
        dst = os.path.join(variant, f"{name}.parquet")
        if not os.path.exists(dst):
            os.symlink(os.path.join(SF_SMALL, f"{name}.parquet"), dst)
    vcon = duckdb.connect()
    for name in TABLE_NAMES:
        vcon.execute(
            f"CREATE VIEW {name} AS "
            f"SELECT * FROM read_parquet('{variant}/{name}.parquet')"
        )
    # Sanity: the variant genuinely contains duplicate (user_id, ts) views.
    ndup = vcon.sql("""
        SELECT count(*) FROM (
            SELECT user_id, ts FROM events WHERE event_type = 'view'
            GROUP BY 1, 2 HAVING count(*) > 1)
    """).fetchone()[0]
    assert ndup > 0, "variant failed to inject duplicate-ts views"

    for op in (
        "join_asof_bidask",
        "join_asof_tolerance",
        "bidask_effective_spread",
        "win_gap_fill_locf",
    ):
        spec = REGISTRY[op]
        df = spec.spark_fn(spark, variant)
        s_rows, s_cols = df.collect(), df.columns
        rel = vcon.sql(spec.oracle_sql)
        d_rows, d_cols = rel.fetchall(), list(rel.columns)
        assert sorted(s_cols) == sorted(d_cols), op
        assert len(s_rows) == len(d_rows), (
            f"{op}: rows {len(s_rows)} vs {len(d_rows)} on dup-ts fixture"
        )
        assert normalize(s_rows, s_cols) == normalize(d_rows, d_cols), (
            f"{op}: diverges from oracle once duplicate timestamps exist"
        )


def test_twa_quote_survives_same_instant_quotes(spark, tmp_path):
    """Degenerate-data guard: a user whose views ALL share one instant
    has zero total quote lifetime — the TWA must be NULL on both
    engines, not an ANSI divide-by-zero (found by the division audit;
    unreachable on shipped fixtures, one regeneration away)."""
    import os

    import duckdb

    from etl_intraday_bidask_spark.tables import TABLE_NAMES
    from tests.test_parity import normalize

    variant = str(tmp_path / "twafix")
    os.makedirs(variant)
    con = duckdb.connect()
    con.execute(f"""
        COPY (
            SELECT * FROM read_parquet('{SF_SMALL}/events.parquet')
            UNION ALL
            SELECT 20000000 + u.k AS event_id,
                   TIMESTAMP '2024-01-15 12:00:00' AS ts,
                   990 AS user_id, 'view' AS event_type,
                   10.0 + u.k AS value, '{{"k": 1}}' AS props
            FROM (SELECT unnest(range(3)) AS k) u
        ) TO '{variant}/events.parquet' (FORMAT parquet)
    """)
    for name in TABLE_NAMES:
        dst = os.path.join(variant, f"{name}.parquet")
        if not os.path.exists(dst):
            os.symlink(os.path.join(SF_SMALL, f"{name}.parquet"), dst)
    vcon = duckdb.connect()
    for name in TABLE_NAMES:
        vcon.execute(
            f"CREATE VIEW {name} AS "
            f"SELECT * FROM read_parquet('{variant}/{name}.parquet')"
        )
    spec = REGISTRY["bidask_twa_quote"]
    df = spec.spark_fn(spark, variant)
    s_rows, s_cols = df.collect(), df.columns
    rel = vcon.sql(spec.oracle_sql)
    d_rows, d_cols = rel.fetchall(), list(rel.columns)
    assert len(s_rows) == len(d_rows)
    assert normalize(s_rows, s_cols) == normalize(d_rows, d_cols)
    degenerate = [r for r in s_rows if r[0] == 990]
    assert degenerate and degenerate[0][2] is None, (
        "zero-lifetime user must yield NULL twa"
    )


def test_join_anti_nonvacuous(spark, tmp_path):
    """join_anti has graded 0-rows-vs-0-rows since round 1 — every
    fixture customer has at least one order, so the anti-join's hash
    grade never exercised a surviving row. Drop all orders for three
    customers and assert the full oracle parity on a NON-EMPTY result
    (the round-6/7 non-vacuous discipline applied to the oldest
    vacuous grade in the registry)."""
    import os

    import duckdb

    from etl_intraday_bidask_spark.tables import TABLE_NAMES
    from tests.test_parity import normalize

    REG = load_all_operators()
    variant = str(tmp_path / "antifix")
    os.makedirs(variant)
    con = duckdb.connect()
    con.execute(f"""
        COPY (
            SELECT * FROM read_parquet('{SF_SMALL}/orders.parquet')
            WHERE o_custkey NOT IN (7, 13, 42)
        ) TO '{variant}/orders.parquet' (FORMAT parquet)
    """)
    con.close()
    for name in TABLE_NAMES:
        dst = os.path.join(variant, f"{name}.parquet")
        if not os.path.exists(dst):
            os.symlink(os.path.join(SF_SMALL, f"{name}.parquet"), dst)
    vcon = duckdb.connect()
    for name in TABLE_NAMES:
        vcon.execute(
            f"CREATE VIEW {name} AS "
            f"SELECT * FROM read_parquet('{variant}/{name}.parquet')"
        )
    try:
        spec = REG["join_anti"]
        df = spec.spark_fn(spark, variant)
        s_rows, s_cols = df.collect(), df.columns
        rel = vcon.sql(spec.oracle_sql)
        d_rows, d_cols = rel.fetchall(), list(rel.columns)
        assert len(s_rows) == 3, f"expected 3 orderless customers, got {len(s_rows)}"
        assert len(d_rows) == 3
        assert normalize(s_rows, s_cols) == normalize(d_rows, d_cols)
    finally:
        vcon.close()


def test_range_frame_dist_keeps_null_key_peer_group(spark):
    """The bucketed twin must reproduce the window form's NULL-key
    semantics: a NULL ordering key forms its own peer group in a
    RANGE frame (each null row's frame = the null peers), while a
    null-unsafe bucket join silently drops those rows (round-7 review
    class; fixtures are null-free, so this is pinned on a synthetic
    frame). Device-level check of the same null-union construction
    win_range_frame_dist carries."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    rows = [(1, 100), (2, 500), (3, None), (4, 600), (5, None), (6, 100150)]
    full = spark.createDataFrame(rows, "o_orderkey int, price_cents long")
    w = Window.orderBy("price_cents").rangeBetween(-100000, Window.currentRow)
    anchor = sorted(
        map(
            tuple,
            full.select(
                "o_orderkey", F.count(F.lit(1)).over(w).alias("n_near")
            ).collect(),
        )
    )
    r = full.where(F.col("price_cents").isNotNull())
    nulls = full.where(F.col("price_cents").isNull())
    null_part = nulls.crossJoin(
        F.broadcast(nulls.agg(F.count(F.lit(1)).alias("n_near")))
    ).select("o_orderkey", "n_near")
    probe = r.withColumn(
        "cand",
        F.explode(
            F.array(
                F.expr("price_cents div 100000"),
                F.expr("price_cents div 100000") - 1,
            )
        ),
    )
    build = r.select(
        F.expr("price_cents div 100000").alias("b"),
        F.col("price_cents").alias("bc"),
    )
    dist = sorted(
        map(
            tuple,
            probe.join(
                build,
                (probe.cand == build.b)
                & (F.col("bc") >= F.col("price_cents") - 100000)
                & (F.col("bc") <= F.col("price_cents")),
            )
            .groupBy("o_orderkey")
            .agg(F.count(F.lit(1)).alias("n_near"))
            .unionByName(null_part)
            .collect(),
        )
    )
    assert anchor == dist, "null peer group lost by the bucketed twin"
    assert len(dist) == 6, "null-key rows must not be dropped"
