"""Approximate-nearest-neighbor search (SURVEY.md §2.10 extension).

``knn_cosine_topk`` (llm_ops) is the exact brute-force baseline; this
module adds the scale paths: random-hyperplane LSH bucketing (single
bucket and multi-probe) and IVF coarse cells (fixed and k-means-refined
centroids). Each vector gets an N_PLANES-bit bucket from the signs of
dot products with deterministic ±1 hyperplanes; search touches only the
probed buckets — at 100 TB the bucket/cell id becomes the shuffle/
partition key and each query reads probes/2^planes (resp. 1/cells) of
the collection. Deterministic pseudo-random hyperplanes are derived
from integer arithmetic shared verbatim with the oracle SQL, keeping
every approximate result hash-checkable; measured recall for all
variants is recorded in SCALE.md §6.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from etl_intraday_bidask_spark.functions.vector import as_double, cosine
from etl_intraday_bidask_spark.registry import register
from etl_intraday_bidask_spark.tables import load

# 4 planes → 16 buckets: measured at sf0.01 (2k vectors), 8 planes gave
# bucket occupancy ~8 and recall 0/10 vs exact; 4 planes gives ~128
# candidates/bucket and recall measured in SCALE.md. At lake scale the
# plane count grows with log2(collection/target-bucket-size), plus
# multi-probe (flip one sign bit) to recover recall without bigger buckets.
N_PLANES = 4
TOP_K = 10


def _sign_expr(i_col: F.Column, j_col: F.Column) -> F.Column:
    """±1 hyperplane component for (dimension i, plane j): an LCG over
    (i*8+j) with the high bit chopped — matches the SQL below exactly."""
    # The multiplier must be BIGINT: 1103515245 × (i*8+j) overflows int32
    # (Spark 4 runs ANSI mode and throws instead of wrapping).
    s = (
        F.lit(1103515245).cast("long") * (i_col * N_PLANES + j_col) + 12345
    ) % 2147483648
    return 2 * ((s / 65536).cast("long") % 2) - 1


# Module-level so ann_recall_report composes it by plain reference.
LSH_TOPK_SQL = f"""
        WITH exp AS (
            SELECT vec_id, label,
                   generate_subscripts(embedding, 1) - 1 AS i,
                   CAST(unnest(embedding) AS DOUBLE) AS x
            FROM embeddings
        ),
        planes(j) AS (SELECT * FROM generate_series(0, {N_PLANES - 1})),
        proj AS (
            SELECT e.vec_id, p.j,
                   sum(e.x * (2 * ((((1103515245 * (e.i * {N_PLANES} + p.j)
                                      + 12345) % 2147483648) // 65536) % 2)
                              - 1)) AS dotp
            FROM exp e CROSS JOIN planes p
            GROUP BY 1, 2
        ),
        buckets AS (
            SELECT vec_id,
                   sum(CASE WHEN dotp > 0
                            THEN CAST(pow(2, j) AS BIGINT) ELSE 0 END)
                       AS bucket
            FROM proj
            GROUP BY vec_id
        ),
        qb AS (SELECT bucket FROM buckets WHERE vec_id = 0),
        cand AS (
            SELECT b.vec_id
            FROM buckets b JOIN qb ON b.bucket = qb.bucket
            WHERE b.vec_id <> 0
        ),
        q AS (SELECT i, x AS y FROM exp WHERE vec_id = 0),
        dots AS (
            SELECT e.vec_id, e.label,
                   sum(e.x * q.y) AS dot,
                   sum(e.x * e.x) AS na2,
                   sum(q.y * q.y) AS nb2
            FROM exp e
            JOIN cand c ON e.vec_id = c.vec_id
            JOIN q ON e.i = q.i
            GROUP BY 1, 2
        )
        SELECT vec_id, label,
               round(dot / (sqrt(na2) * sqrt(nb2)), 4) AS cosine_sim
        FROM dots
        ORDER BY dot / (sqrt(na2) * sqrt(nb2)) DESC, vec_id
        LIMIT {TOP_K}
    """


@register(
    "knn_lsh_bucketed",
    oracle_sql=LSH_TOPK_SQL,
    description="ANN top-10 neighbors of vec_id=0 via random-hyperplane "
    "LSH: 4 deterministic ±1 hyperplanes → 16 buckets (plane count "
    "measured, see SCALE.md); candidates are the query's bucket only, "
    "then exact cosine re-rank. The scale path whose recall is measured "
    "against knn_cosine_topk.",
)
def knn_lsh_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb, buckets = _bucketize(spark, sf_dir)
    qb = buckets.where(F.col("vec_id") == 0).select(
        F.col("bucket").alias("qbucket")
    )
    cand_ids = (
        buckets.join(F.broadcast(qb), F.col("bucket") == F.col("qbucket"))
        .where(F.col("vec_id") != 0)
        .select("vec_id")
    )
    return _rerank(emb, cand_ids)


def _bucketize(spark: SparkSession, sf_dir: str):
    """(embeddings df, per-vector LSH bucket df) — shared by the
    single-bucket and multi-probe search operators.

    Deliberately NOT folded doc-locally (SCALE.md §23 class): the
    projections are per-vector, but dotp is a FLOAT sum feeding a
    sign threshold — re-ordering the addition (fold = ascending i,
    aggregate = combiner order) can flip a near-zero sign and change
    bucket membership, i.e. the graded result. The exchange it would
    save is 16 rows/vec after map-side combine, not corpus-sized, so
    the trade is not worth touching float ordering."""
    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id", "label", as_double("embedding").alias("v")
    )
    planes = spark.range(N_PLANES).select(F.col("id").cast("int").alias("j"))
    exp = emb.select("vec_id", F.posexplode("v").alias("i", "x"))
    proj = (
        exp.crossJoin(F.broadcast(planes))
        .groupBy("vec_id", "j")
        .agg(F.sum(F.col("x") * _sign_expr(F.col("i"), F.col("j"))).alias("dotp"))
    )
    buckets = proj.groupBy("vec_id").agg(
        F.sum(
            F.when(F.col("dotp") > 0, F.pow(2.0, F.col("j")).cast("bigint"))
            .otherwise(F.lit(0))
        ).alias("bucket")
    )
    return emb, buckets


def _rerank(emb: DataFrame, cand_ids: DataFrame) -> DataFrame:
    """Exact cosine re-rank of candidate ids against vec_id=0."""
    query = emb.where(F.col("vec_id") == 0).select(F.col("v").alias("qv"))
    sim = cosine(F.col("v"), F.col("qv"))
    return (
        emb.join(cand_ids, "vec_id")
        .crossJoin(F.broadcast(query))
        .select(
            "vec_id",
            "label",
            F.round(sim, 4).alias("cosine_sim"),
            sim.alias("_raw"),
        )
        .orderBy(F.col("_raw").desc(), "vec_id")
        .limit(TOP_K)
        .drop("_raw")
    )


N_CELLS = 8


@register(
    "knn_ivf_coarse",
    oracle_sql=f"""
        WITH cents AS (
            SELECT vec_id AS cid, embedding AS cv
            FROM embeddings WHERE vec_id < {N_CELLS}
        ),
        scored AS (
            SELECT e.vec_id, e.label, e.embedding, c.cid,
                   round(list_cosine_similarity(
                       CAST(e.embedding AS DOUBLE[]),
                       CAST(c.cv AS DOUBLE[])), 6) AS a
            FROM embeddings e CROSS JOIN cents c
        ),
        assign AS (
            SELECT vec_id, label, embedding, cid
            FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY vec_id ORDER BY a DESC, cid) AS rn
                FROM scored
            ) WHERE rn = 1
        ),
        qcell AS (
            SELECT cid AS qcid, embedding AS qv FROM assign WHERE vec_id = 0
        ),
        cand AS (
            SELECT a.vec_id, a.label, a.embedding, q.qv
            FROM assign a JOIN qcell q ON a.cid = q.qcid
            WHERE a.vec_id <> 0
        )
        SELECT vec_id, label,
               round(list_cosine_similarity(
                   CAST(embedding AS DOUBLE[]), CAST(qv AS DOUBLE[])), 4)
                   AS cosine_sim
        FROM cand
        ORDER BY list_cosine_similarity(
                   CAST(embedding AS DOUBLE[]), CAST(qv AS DOUBLE[])) DESC,
                 vec_id
        LIMIT {TOP_K}
    """,
    description="ANN top-10 via IVF coarse quantization (probe=1): 8 "
    "deterministic centroid vectors (vec_id<8 — training-free stand-in "
    "for k-means cells), every vector assigned to its argmax-cosine "
    "cell (6dp-rounded score with centroid-id tie-break for cross-"
    "engine stability), search touches only the query's cell, exact "
    "re-rank inside. At 100 TB the cell id is the partition key — each "
    "query reads ~1/cells of the collection; the assignment argmax "
    "becomes a max_by aggregate instead of a window.",
)
def knn_ivf_coarse(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id", "label", as_double("embedding").alias("v")
    )
    cents = emb.where(F.col("vec_id") < N_CELLS).select(
        F.col("vec_id").alias("cid"), F.col("v").alias("cv")
    )
    scored = emb.crossJoin(F.broadcast(cents)).select(
        "vec_id",
        "label",
        "v",
        "cid",
        F.round(cosine(F.col("v"), F.col("cv")), 6).alias("a"),
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("a").desc(), F.col("cid"))
    assign = (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("vec_id", "label", "v", "cid")
    )
    qcell = assign.where(F.col("vec_id") == 0).select(
        F.col("cid").alias("qcid"), F.col("v").alias("qv")
    )
    cand = assign.join(
        F.broadcast(qcell), F.col("cid") == F.col("qcid")
    ).where(F.col("vec_id") != 0)
    sim = cosine(F.col("v"), F.col("qv"))
    return (
        cand.select(
            "vec_id",
            "label",
            F.round(sim, 4).alias("cosine_sim"),
            sim.alias("_raw"),
        )
        .orderBy(F.col("_raw").desc(), "vec_id")
        .limit(TOP_K)
        .drop("_raw")
    )


KM_CELLS = 8
KM_SCALE = 10000


@register(
    "knn_ivf_kmeans",
    oracle_sql=f"""
        WITH exp AS (
            SELECT vec_id, label,
                   generate_subscripts(embedding, 1) - 1 AS i,
                   CAST(unnest(embedding) AS DOUBLE) AS x
            FROM embeddings
        ),
        cent0 AS (
            SELECT vec_id AS cid, i, x AS cval
            FROM exp WHERE vec_id < {KM_CELLS}
        ),
        normv AS (
            SELECT vec_id, sqrt(sum(x * x)) AS nv FROM exp GROUP BY vec_id
        ),
        norm0 AS (
            SELECT cid, sqrt(sum(cval * cval)) AS nc FROM cent0 GROUP BY cid
        ),
        score1 AS (
            SELECT e.vec_id, c.cid,
                   round(sum(e.x * c.cval) / (any_value(nv.nv)
                         * any_value(n0.nc)), 6) AS a
            FROM exp e
            JOIN cent0 c ON e.i = c.i
            JOIN normv nv ON nv.vec_id = e.vec_id
            JOIN norm0 n0 ON n0.cid = c.cid
            GROUP BY e.vec_id, c.cid
        ),
        assign1 AS (
            SELECT vec_id, cid FROM (
                SELECT vec_id, cid, row_number() OVER (
                    PARTITION BY vec_id ORDER BY a DESC, cid) AS rn
                FROM score1
            ) WHERE rn = 1
        ),
        cent1 AS (
            SELECT a.cid, e.i,
                   CAST(sum(CAST(round(e.x * {KM_SCALE}) AS BIGINT)) AS DOUBLE)
                       / count(*) / {KM_SCALE}.0 AS cval
            FROM exp e JOIN assign1 a ON e.vec_id = a.vec_id
            GROUP BY a.cid, e.i
        ),
        norm1 AS (
            SELECT cid, sqrt(sum(cval * cval)) AS nc FROM cent1 GROUP BY cid
        ),
        score2 AS (
            SELECT e.vec_id, c.cid,
                   round(sum(e.x * c.cval) / (any_value(nv.nv)
                         * any_value(n1.nc)), 6) AS a
            FROM exp e
            JOIN cent1 c ON e.i = c.i
            JOIN normv nv ON nv.vec_id = e.vec_id
            JOIN norm1 n1 ON n1.cid = c.cid
            GROUP BY e.vec_id, c.cid
        ),
        assign2 AS (
            SELECT vec_id, cid FROM (
                SELECT vec_id, cid, row_number() OVER (
                    PARTITION BY vec_id ORDER BY a DESC, cid) AS rn
                FROM score2
            ) WHERE rn = 1
        ),
        qcell AS (SELECT cid FROM assign2 WHERE vec_id = 0),
        cand AS (
            SELECT a.vec_id FROM assign2 a JOIN qcell q ON a.cid = q.cid
            WHERE a.vec_id <> 0
        ),
        q AS (SELECT i, x AS y FROM exp WHERE vec_id = 0),
        dots AS (
            SELECT e.vec_id, any_value(e.label) AS label,
                   sum(e.x * q.y) AS dot,
                   sum(e.x * e.x) AS na2,
                   sum(q.y * q.y) AS nb2
            FROM exp e
            JOIN cand c ON e.vec_id = c.vec_id
            JOIN q ON e.i = q.i
            GROUP BY e.vec_id
        )
        SELECT vec_id, label,
               round(dot / (sqrt(na2) * sqrt(nb2)), 4) AS cosine_sim
        FROM dots
        ORDER BY dot / (sqrt(na2) * sqrt(nb2)) DESC, vec_id
        LIMIT {TOP_K}
    """,
    description="IVF with k-means-refined centroids — the iterative-"
    "algorithm surface: seed cells from vec_id<8, one Lloyd update "
    "(centroid = exact scaled-integer mean of assigned vectors, so the "
    "iteration is bit-stable across engines), reassign, then probe=1 "
    "search with exact cosine re-rank. Each iteration is one join + two "
    "aggregates — at 100 TB iterations are linear passes with the "
    "centroid relation (cells × dims) broadcast, never a collect.",
)
def knn_ivf_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id", "label", as_double("embedding").alias("v")
    )
    exp = emb.select("vec_id", F.posexplode("v").alias("i", "x"))
    normv = exp.groupBy("vec_id").agg(
        F.sqrt(F.sum(F.col("x") * F.col("x"))).alias("nv")
    )

    def assign(centroids):
        """Long-form centroids (cid, i, cval) -> (vec_id, cid) argmax."""
        normc = centroids.groupBy("cid").agg(
            F.sqrt(F.sum(F.col("cval") * F.col("cval"))).alias("nc")
        )
        score = (
            exp.join(F.broadcast(centroids), "i")
            .groupBy("vec_id", "cid")
            .agg(F.sum(F.col("x") * F.col("cval")).alias("dot"))
            .join(normv, "vec_id")
            .join(F.broadcast(normc), "cid")
            .select(
                "vec_id",
                "cid",
                F.round(F.col("dot") / (F.col("nv") * F.col("nc")), 6).alias("a"),
            )
        )
        w = Window.partitionBy("vec_id").orderBy(F.col("a").desc(), F.col("cid"))
        return (
            score.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select("vec_id", "cid")
        )

    cent0 = exp.where(F.col("vec_id") < KM_CELLS).select(
        F.col("vec_id").alias("cid"), "i", F.col("x").alias("cval")
    )
    assign1 = assign(cent0)
    cent1 = (
        exp.join(assign1, "vec_id")
        .groupBy("cid", "i")
        .agg(
            (
                F.sum(F.round(F.col("x") * KM_SCALE).cast("long")).cast("double")
                / F.count(F.lit(1))
                / float(KM_SCALE)
            ).alias("cval")
        )
    )
    assign2 = assign(cent1)
    qcell = assign2.where(F.col("vec_id") == 0).select(
        F.col("cid").alias("qcid")
    )
    cand = (
        assign2.join(F.broadcast(qcell), F.col("cid") == F.col("qcid"))
        .where(F.col("vec_id") != 0)
        .select("vec_id")
    )
    query = emb.where(F.col("vec_id") == 0).select(F.col("v").alias("qv"))
    sim = cosine(F.col("v"), F.col("qv"))
    return (
        emb.join(cand, "vec_id")
        .crossJoin(F.broadcast(query))
        .select(
            "vec_id",
            "label",
            F.round(sim, 4).alias("cosine_sim"),
            sim.alias("_raw"),
        )
        .orderBy(F.col("_raw").desc(), "vec_id")
        .limit(TOP_K)
        .drop("_raw")
    )


N_TABLES = 4


def _sign_expr_mt(i_col: F.Column, t_col: F.Column, j_col: F.Column) -> F.Column:
    """±1 hyperplane component for (dimension i, table t, plane j).

    md5-arithmetic (the house cross-engine hash), NOT the LCG used for
    the single-table op: a single-round LCG over adjacent keys
    i*(L*P) + t*P + j produces near-identical planes across tables
    (measured on the round-6 clustered-geometry fixture: max
    cross-table plane correlation 0.97, so the 4 "independent" tables
    were effectively one table and union recall LAGGED the single
    4-plane bucket, 3/10 vs 7/10). md5 bits are independent per key
    (max cross-table correlation 0.28 on the same fixture; union
    recall 8/10). The sign matrix is |dims|x|tables|x|planes| = 1024
    entries — materialized once as a broadcast table, so the hash cost
    never scales with data volume."""
    key = F.concat_ws(
        ":",
        t_col.cast("string"),
        j_col.cast("string"),
        i_col.cast("string"),
    )
    h = F.conv(F.substring(F.md5(key), 1, 15), 16, 10).cast("long")
    return (2 * (h % 2) - 1).cast("double")


@register(
    "knn_lsh_multitable",
    oracle_sql=f"""
        WITH exp AS (
            SELECT vec_id, label,
                   generate_subscripts(embedding, 1) - 1 AS i,
                   CAST(unnest(embedding) AS DOUBLE) AS x
            FROM embeddings
        ),
        tabs(t) AS (SELECT * FROM generate_series(0, {N_TABLES - 1})),
        planes(j) AS (SELECT * FROM generate_series(0, {N_PLANES - 1})),
        signs AS (
            SELECT tb.t, p.j, d.i,
                   2 * (CAST('0x' || substr(md5(tb.t || ':' || p.j
                            || ':' || d.i), 1, 15) AS BIGINT) % 2) - 1
                       AS sgn
            FROM tabs tb CROSS JOIN planes p
            CROSS JOIN generate_series(0, 63) AS d(i)
        ),
        proj AS (
            SELECT e.vec_id, s.t, s.j, sum(e.x * s.sgn) AS dotp
            FROM exp e JOIN signs s ON e.i = s.i
            GROUP BY 1, 2, 3
        ),
        buckets AS (
            SELECT vec_id, t,
                   sum(CASE WHEN dotp > 0
                            THEN CAST(pow(2, j) AS BIGINT) ELSE 0 END)
                       AS bucket
            FROM proj
            GROUP BY vec_id, t
        ),
        qb AS (SELECT t, bucket FROM buckets WHERE vec_id = 0),
        cand AS (
            SELECT DISTINCT b.vec_id
            FROM buckets b
            JOIN qb ON b.t = qb.t AND b.bucket = qb.bucket
            WHERE b.vec_id <> 0
        ),
        q AS (SELECT i, x AS y FROM exp WHERE vec_id = 0),
        dots AS (
            SELECT e.vec_id, e.label,
                   sum(e.x * q.y) AS dot,
                   sum(e.x * e.x) AS na2,
                   sum(q.y * q.y) AS nb2
            FROM exp e
            JOIN cand c ON e.vec_id = c.vec_id
            JOIN q ON e.i = q.i
            GROUP BY 1, 2
        )
        SELECT vec_id, label,
               round(dot / (sqrt(na2) * sqrt(nb2)), 4) AS cosine_sim
        FROM dots
        ORDER BY dot / (sqrt(na2) * sqrt(nb2)) DESC, vec_id
        LIMIT {TOP_K}
    """,
    description="Multi-table LSH: 4 independent 4-plane hash tables; "
    "candidates are vectors sharing the query's bucket in ANY table "
    "(union), then exact cosine re-rank. The production recall lever "
    "orthogonal to multi-probe — more independent chances to co-bucket "
    "a true neighbor instead of widening one table's probe set; recall "
    "and candidate fraction measured in SCALE.md. At 100 TB each table "
    "is one equi join on its (t, bucket) key; candidate volume is "
    "L/2^planes of the collection in expectation.",
)
def knn_lsh_multitable(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id", "label", as_double("embedding").alias("v")
    )
    tabs = spark.range(N_TABLES).select(F.col("id").cast("int").alias("t"))
    planes = spark.range(N_PLANES).select(F.col("id").cast("int").alias("j"))
    # 64 = fixture embedding dim (embeddings schema); the sign matrix is
    # materialized ONCE (|dims|*|tables|*|planes| = 1024 rows) and
    # broadcast, so the md5 cost never scales with the data.
    dims = spark.range(64).select(F.col("id").cast("int").alias("i"))
    signs = (
        tabs.crossJoin(planes)
        .crossJoin(dims)
        .select(
            "t",
            "j",
            "i",
            _sign_expr_mt(F.col("i"), F.col("t"), F.col("j")).alias("sgn"),
        )
    )
    exp = emb.select("vec_id", F.posexplode("v").alias("i", "x"))
    proj = (
        exp.join(F.broadcast(signs), "i")
        .groupBy("vec_id", "t", "j")
        .agg(F.sum(F.col("x") * F.col("sgn")).alias("dotp"))
    )
    buckets = proj.groupBy("vec_id", "t").agg(
        F.sum(
            F.when(F.col("dotp") > 0, F.pow(2.0, F.col("j")).cast("bigint"))
            .otherwise(F.lit(0))
        ).alias("bucket")
    )
    qb = buckets.where(F.col("vec_id") == 0).select(
        F.col("t").alias("qt"), F.col("bucket").alias("qbucket")
    )
    cand_ids = (
        buckets.join(
            F.broadcast(qb),
            (F.col("t") == F.col("qt"))
            & (F.col("bucket") == F.col("qbucket")),
        )
        .where(F.col("vec_id") != 0)
        .select("vec_id")
        .distinct()
    )
    return _rerank(emb, cand_ids)


@register(
    "knn_lsh_multiprobe",
    oracle_sql=f"""
        WITH exp AS (
            SELECT vec_id, label,
                   generate_subscripts(embedding, 1) - 1 AS i,
                   CAST(unnest(embedding) AS DOUBLE) AS x
            FROM embeddings
        ),
        planes(j) AS (SELECT * FROM generate_series(0, {N_PLANES - 1})),
        proj AS (
            SELECT e.vec_id, p.j,
                   sum(e.x * (2 * ((((1103515245 * (e.i * {N_PLANES} + p.j)
                                      + 12345) % 2147483648) // 65536) % 2)
                              - 1)) AS dotp
            FROM exp e CROSS JOIN planes p
            GROUP BY 1, 2
        ),
        buckets AS (
            SELECT vec_id,
                   sum(CASE WHEN dotp > 0
                            THEN CAST(pow(2, j) AS BIGINT) ELSE 0 END)
                       AS bucket
            FROM proj
            GROUP BY vec_id
        ),
        qb AS (SELECT bucket FROM buckets WHERE vec_id = 0),
        probes AS (
            SELECT unnest([bucket, xor(bucket, 1), xor(bucket, 2),
                           xor(bucket, 4), xor(bucket, 8)]) AS pbucket
            FROM qb
        ),
        cand AS (
            SELECT DISTINCT b.vec_id
            FROM buckets b JOIN probes p ON b.bucket = p.pbucket
            WHERE b.vec_id <> 0
        ),
        q AS (SELECT i, x AS y FROM exp WHERE vec_id = 0),
        dots AS (
            SELECT e.vec_id, e.label,
                   sum(e.x * q.y) AS dot,
                   sum(e.x * e.x) AS na2,
                   sum(q.y * q.y) AS nb2
            FROM exp e
            JOIN cand c ON e.vec_id = c.vec_id
            JOIN q ON e.i = q.i
            GROUP BY 1, 2
        )
        SELECT vec_id, label,
               round(dot / (sqrt(na2) * sqrt(nb2)), 4) AS cosine_sim
        FROM dots
        ORDER BY dot / (sqrt(na2) * sqrt(nb2)) DESC, vec_id
        LIMIT {TOP_K}
    """,
    description="Multi-probe LSH: probe the query's bucket plus every "
    "one-bit-flip neighbor bucket (5 probes) — the standard recall "
    "recovery for hyperplane LSH without growing bucket size; recall "
    "measured against the exact top-10 in SCALE.md. At 100 TB the probe "
    "set is still an equi join on the bucket key (IN-list of 1+planes "
    "values), reading (1+planes)/2^planes of the collection.",
)
def knn_lsh_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb, buckets = _bucketize(spark, sf_dir)
    qb = buckets.where(F.col("vec_id") == 0).select(
        F.col("bucket").alias("qbucket")
    )
    probes = qb.select(
        F.explode(
            F.array(
                F.col("qbucket"),
                *[
                    F.expr(f"qbucket ^ {1 << j}")
                    for j in range(N_PLANES)
                ],
            )
        ).alias("pbucket")
    )
    cand_ids = (
        buckets.join(F.broadcast(probes), F.col("bucket") == F.col("pbucket"))
        .where(F.col("vec_id") != 0)
        .select("vec_id")
        .distinct()
    )
    return _rerank(emb, cand_ids)


N_IVF_PROBES = 2


@register(
    "knn_ivf_multiprobe",
    oracle_sql=f"""
        WITH cents AS (
            SELECT vec_id AS cid, embedding AS cv
            FROM embeddings WHERE vec_id < {N_CELLS}
        ),
        scored AS (
            SELECT e.vec_id, e.label, e.embedding, c.cid,
                   round(list_cosine_similarity(
                       CAST(e.embedding AS DOUBLE[]),
                       CAST(c.cv AS DOUBLE[])), 6) AS a
            FROM embeddings e CROSS JOIN cents c
        ),
        ranked AS (
            SELECT *, row_number() OVER (
                PARTITION BY vec_id ORDER BY a DESC, cid) AS rn
            FROM scored
        ),
        assign AS (
            SELECT vec_id, label, embedding, cid FROM ranked WHERE rn = 1
        ),
        qcells AS (
            SELECT cid AS qcid FROM ranked
            WHERE vec_id = 0 AND rn <= {N_IVF_PROBES}
        ),
        qv AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
        cand AS (
            SELECT a.vec_id, a.label, a.embedding
            FROM assign a JOIN qcells q ON a.cid = q.qcid
            WHERE a.vec_id <> 0
        )
        SELECT c.vec_id, c.label,
               round(list_cosine_similarity(
                   CAST(c.embedding AS DOUBLE[]), CAST(q.qv AS DOUBLE[])), 4)
                   AS cosine_sim
        FROM cand c CROSS JOIN qv q
        ORDER BY list_cosine_similarity(
                   CAST(c.embedding AS DOUBLE[]), CAST(q.qv AS DOUBLE[])) DESC,
                 c.vec_id
        LIMIT {TOP_K}
    """,
    description="IVF with multi-probe (probe=2): vectors assigned to "
    "their argmax-cosine cell as in knn_ivf_coarse, but the query "
    "searches its 2 nearest cells — the IVF analogue of LSH multi-probe, "
    "recovering the neighbors that straddle the query's cell boundary "
    "(the dominant IVF recall-loss mode). Recall measured in SCALE.md. "
    "At 100 TB the probe list is an IN-list equi join on the cell key, "
    "reading probes/cells of the collection.",
)
def knn_ivf_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id", "label", as_double("embedding").alias("v")
    )
    cents = emb.where(F.col("vec_id") < N_CELLS).select(
        F.col("vec_id").alias("cid"), F.col("v").alias("cv")
    )
    scored = emb.crossJoin(F.broadcast(cents)).select(
        "vec_id",
        "label",
        "v",
        "cid",
        F.round(cosine(F.col("v"), F.col("cv")), 6).alias("a"),
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("a").desc(), F.col("cid"))
    ranked = scored.withColumn("rn", F.row_number().over(w))
    assign = ranked.where(F.col("rn") == 1).select("vec_id", "label", "v", "cid")
    qcells = (
        ranked.where((F.col("vec_id") == 0) & (F.col("rn") <= N_IVF_PROBES))
        .select(F.col("cid").alias("qcid"))
    )
    cand_ids = (
        assign.join(F.broadcast(qcells), F.col("cid") == F.col("qcid"))
        .where(F.col("vec_id") != 0)
        .select("vec_id")
    )
    return _rerank(emb, cand_ids)


@register(
    "etl_embeddings_pipeline",
    oracle_sql=f"""
        WITH cents AS (
            SELECT vec_id AS cid, embedding AS cv
            FROM embeddings WHERE vec_id < {N_CELLS}
        ),
        scored AS (
            SELECT e.vec_id, e.label, c.cid,
                   round(list_cosine_similarity(
                       CAST(e.embedding AS DOUBLE[]),
                       CAST(c.cv AS DOUBLE[])), 6) AS a
            FROM embeddings e CROSS JOIN cents c
        ),
        assign AS (
            SELECT vec_id, label, cid, a
            FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY vec_id ORDER BY a DESC, cid) AS rn
                FROM scored
            ) WHERE rn = 1
        )
        SELECT cid,
               count(*) AS n_vecs,
               count(DISTINCT label) AS n_labels,
               round(avg(a), 4) AS avg_cell_cosine
        FROM assign
        GROUP BY cid
        ORDER BY cid
    """,
    description="ANN index BUILD as an ETL job: assign every vector to "
    "its argmax-cosine IVF cell (the same deterministic centroids and "
    "6dp/tie-break assignment the knn_ivf_* search ops use) and emit "
    "the per-cell index manifest — vector count, label diversity, mean "
    "within-cell cosine (the balance/compactness stats that decide "
    "whether to split or re-train cells). At 100 TB this job IS the "
    "index: its output partitioning (cell id) is the layout the "
    "search-side cell-equality join reads, so build and query share "
    "one key. One broadcast of 8 centroids + one argmax window + one "
    "aggregate — no all-pairs stage anywhere.",
)
def etl_embeddings_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id", "label", as_double("embedding").alias("v")
    )
    cents = emb.where(F.col("vec_id") < N_CELLS).select(
        F.col("vec_id").alias("cid"), F.col("v").alias("cv")
    )
    scored = emb.crossJoin(F.broadcast(cents)).select(
        "vec_id",
        "label",
        "cid",
        F.round(cosine(F.col("v"), F.col("cv")), 6).alias("a"),
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("a").desc(), F.col("cid"))
    assign = (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("vec_id", "label", "cid", "a")
    )
    return (
        assign.groupBy("cid")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.countDistinct("label").alias("n_labels"),
            F.round(F.avg("a"), 4).alias("avg_cell_cosine"),
        )
        .orderBy("cid")
    )


# ---------------------------------------------------------------------------
# ANN recall report — composes the exact baseline (llm_ops) and the LSH
# scale path above into a first-class graded metric. Both the SQL and the
# spark fn are referenced by plain import, not registry lookup, so there
# is no import-order coupling; k is derived from the shared constants
# (the assert keeps the two modules' k in lockstep).

from etl_intraday_bidask_spark.operators.llm_ops import (
    KNN_COSINE_TOPK_SQL,
    KNN_TOP_K,
    knn_cosine_topk,
)

assert KNN_TOP_K == TOP_K, "exact baseline and ANN paths must share k"


@register(
    "ann_recall_report",
    oracle_sql=f"""
        WITH exact_k AS (
            {KNN_COSINE_TOPK_SQL}
        ), approx_k AS (
            {LSH_TOPK_SQL}
        )
        SELECT count(*) AS hits,
               CAST({TOP_K} AS BIGINT) AS k,
               CAST(count(*) AS DOUBLE) / {TOP_K}.0 AS recall_at_k
        FROM exact_k e
        JOIN approx_k a USING (vec_id)
    """,
    description=f"Recall@{TOP_K} of the LSH-bucketed ANN path against "
    "the exact cosine top-k baseline, as a first-class graded metric — "
    "the honest-measurement loop every ANN deployment needs (SCALE.md "
    "records the same number narratively; this op pins it into the "
    "oracle-checked contract). Composes the two registered plans and "
    "semi-joins their vec_id sets; both inputs are deterministic, so "
    "the metric is too. At scale the same shape runs as a sampled "
    "audit (recall on a query sample), never the full corpus.",
)
def ann_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    exact = knn_cosine_topk(spark, sf_dir).select("vec_id")
    approx = knn_lsh_bucketed(spark, sf_dir).select("vec_id")
    hits = exact.join(approx, "vec_id")
    return hits.agg(
        F.count(F.lit(1)).alias("hits"),
        F.lit(TOP_K).cast("long").alias("k"),
        (F.count(F.lit(1)).cast("double") / float(TOP_K)).alias(
            "recall_at_k"
        ),
    )


# ---------------------------------------------------------------------------
# Product quantization: the memory-compressed ANN path. 64 dims split into
# PQ_M subspaces of 8; per-subspace codebook = the first PQ_K vectors'
# subvectors (training-free stand-in, same convention as the IVF cells).
# Every float accumulation is quantized per-TERM to an integer grid and
# summed exactly, so assignment and ADC scores are bit-identical on any
# engine and partitioning.

PQ_M = 8        # subspaces
PQ_SUB = 8      # dims per subspace (8 × 8 = 64)
PQ_K = 4        # codes per subspace
PQ_GRID = 1000000000  # 1e9 per-term quantization grid


@register(
    "knn_pq_adc",
    oracle_sql=f"""
        WITH exp AS (
            SELECT vec_id, label,
                   (generate_subscripts(embedding, 1) - 1) // {PQ_SUB} AS s,
                   (generate_subscripts(embedding, 1) - 1) % {PQ_SUB} AS j,
                   CAST(unnest(embedding) AS DOUBLE) AS x
            FROM embeddings
        ), codebook AS (
            SELECT vec_id AS c, s, j, x AS cx
            FROM exp WHERE vec_id < {PQ_K}
        ), dist AS (
            SELECT e.vec_id, e.s, cb.c,
                   sum(CAST(round((e.x - cb.cx) * (e.x - cb.cx) * {PQ_GRID})
                            AS BIGINT)) AS dsq
            FROM exp e
            JOIN codebook cb ON e.s = cb.s AND e.j = cb.j
            GROUP BY e.vec_id, e.s, cb.c
        ), assign AS (
            SELECT vec_id, s, c
            FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY vec_id, s ORDER BY dsq, c) AS rn
                FROM dist
            ) WHERE rn = 1
        ), qtab AS (
            SELECT cb.s, cb.c,
                   sum(CAST(round(q.x * cb.cx * {PQ_GRID}) AS BIGINT)) AS qdot
            FROM exp q
            JOIN codebook cb ON q.s = cb.s AND q.j = cb.j
            WHERE q.vec_id = 0
            GROUP BY cb.s, cb.c
        ), scored AS (
            SELECT a.vec_id,
                   CAST(sum(t.qdot) AS BIGINT) AS adc
            FROM assign a
            JOIN qtab t ON a.s = t.s AND a.c = t.c
            WHERE a.vec_id <> 0
            GROUP BY a.vec_id
        )
        SELECT s.vec_id, e.label,
               CAST(s.adc AS DOUBLE) / {PQ_GRID} AS adc_dot
        FROM scored s
        JOIN (SELECT DISTINCT vec_id, label FROM embeddings) e
          ON s.vec_id = e.vec_id
        ORDER BY s.adc DESC, s.vec_id
        LIMIT {TOP_K}
    """,
    description=f"ANN top-{TOP_K} via product quantization + asymmetric "
    "distance computation (ADC): 64 dims split into 8 subspaces, each "
    "vector encoded as 8 codebook ids (4 codes/subspace, training-free "
    "codebook = first vectors' subvectors, same convention as the IVF "
    "cells), query scored against every DB vector by summing its "
    "precomputed per-(subspace, code) dot-product table over the "
    "vector's codes — 8 lookups instead of 64 multiplies, and 8×2-bit "
    "codes instead of 256 float bytes (the memory-bound regime PQ "
    "exists for). Every accumulation is per-term-quantized to a 1e-9 "
    "grid and summed as exact BIGINTs, so encode and ADC scores are "
    "bit-identical across engines and partitionings. At 100 TB codes "
    "are a narrow per-row transform; the score is a broadcast of the "
    "32-entry query table + one exact-integer aggregate.",
)
def knn_pq_adc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    emb = load(spark, sf_dir, "embeddings")
    exp = emb.select(
        "vec_id",
        "label",
        F.posexplode(as_double("embedding")).alias("i", "x"),
    ).select(
        "vec_id",
        "label",
        F.expr(f"i div {PQ_SUB}").alias("s"),
        (F.col("i") % PQ_SUB).alias("j"),
        "x",
    )
    codebook = exp.where(F.col("vec_id") < PQ_K).select(
        F.col("vec_id").alias("c"), "s", "j", F.col("x").alias("cx")
    )
    diff = F.col("x") - F.col("cx")
    dist = (
        exp.join(F.broadcast(codebook), ["s", "j"])
        .groupBy("vec_id", "s", "c")
        .agg(
            F.sum(
                F.round(diff * diff * PQ_GRID).cast("long")
            ).alias("dsq")
        )
    )
    w = Window.partitionBy("vec_id", "s").orderBy("dsq", "c")
    assign = (
        dist.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("vec_id", "s", "c")
    )
    qtab = (
        exp.where(F.col("vec_id") == 0)
        .join(F.broadcast(codebook), ["s", "j"])
        .groupBy("s", "c")
        .agg(
            F.sum(
                F.round(F.col("x") * F.col("cx") * PQ_GRID).cast("long")
            ).alias("qdot")
        )
    )
    scored = (
        assign.where(F.col("vec_id") != 0)
        .join(F.broadcast(qtab), ["s", "c"])
        .groupBy("vec_id")
        .agg(F.sum("qdot").alias("adc"))
    )
    labels = emb.select("vec_id", "label").distinct()
    return (
        scored.join(labels, "vec_id")
        .select(
            "vec_id",
            "label",
            (F.col("adc").cast("double") / PQ_GRID).alias("adc_dot"),
            F.col("adc").alias("_raw"),
        )
        .orderBy(F.col("_raw").desc(), "vec_id")
        .limit(TOP_K)
        .drop("_raw")
    )
