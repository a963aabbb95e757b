"""Corpus-level training-data operators, wave 3 (SURVEY.md §2.26):
range similarity search, overlapping-stride chunking, and
deterministic contrastive negative sampling.

Scale notes: ``knn_range_search`` is the threshold (ε-ball) companion
to the top-k operators — a map-only scan with the query vector
broadcast, no shuffle before the result sort, and at lake scale the
same LSH/IVF bucketing as the top-k paths prunes candidates;
``text_chunk_overlap_stride`` is a narrow per-row generator (zero
shuffle) emitting the 50%-overlap context windows attention models
train on; ``sample_negative_pairs`` replaces RNG negative sampling
with pure hash arithmetic — membership is a row function, replayable
on any partitioning/engine/day, and the negatives join back to the
corpus on the generated key (an equi join that shuffles only the tiny
sample side when the sample is small, broadcast here).

Parity notes: negatives use 64-bit LCG/Knuth arithmetic shared
verbatim with the oracle SQL; chunk math is pure integer division;
the range-search cosine follows the knn_* rounding policy (round 4dp
for display, threshold compared on the raw double exactly as the
blocked sim join already does, PASS r1).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from etl_intraday_bidask_spark.functions.vector import as_double, cosine
from etl_intraday_bidask_spark.registry import register
from etl_intraday_bidask_spark.tables import load

# ε-ball threshold: same constant family as llm_ops.COSINE_THRESHOLD
# (same-label cosines top out ≈0.55 on the fixtures), chosen so the
# result is non-trivial but far from any float boundary cliff.
RANGE_COSINE = 0.35

CHUNK_TOKENS = 32
CHUNK_STRIDE = 16

NEG_K = 3  # negatives per sampled anchor doc


@register(
    "knn_range_search",
    oracle_sql=f"""
        WITH exp AS (
            SELECT vec_id, label,
                   generate_subscripts(embedding, 1) AS i,
                   CAST(unnest(embedding) AS DOUBLE) AS x
            FROM embeddings
        ),
        q AS (SELECT i, x AS y FROM exp WHERE vec_id = 0),
        dots AS (
            SELECT e.vec_id, e.label,
                   sum(e.x * q.y) AS dot,
                   sum(e.x * e.x) AS na2,
                   sum(q.y * q.y) AS nb2
            FROM exp e JOIN q ON e.i = q.i
            WHERE e.vec_id <> 0
            GROUP BY 1, 2
        )
        SELECT vec_id, label,
               round(dot / (sqrt(na2) * sqrt(nb2)), 4) AS cosine_sim
        FROM dots
        WHERE dot / (sqrt(na2) * sqrt(nb2)) >= {RANGE_COSINE}
        ORDER BY vec_id
    """,
    description=f"Range (ε-ball) similarity search: every vector with "
    f"cosine ≥ {RANGE_COSINE} to the query (vec_id=0, self excluded) — "
    "the threshold companion to knn_cosine_topk for dedup-style 'all "
    "near neighbors' retrieval, where k is unknown a priori. Broadcast "
    "query vector, map-only higher-order-fn cosine, threshold filter "
    "instead of a top-k heap; identical float expression on both "
    "engines so the boundary comparison cannot diverge.",
)
def knn_range_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id", "label", as_double("embedding").alias("v")
    )
    query = emb.where(F.col("vec_id") == 0).select(F.col("v").alias("qv"))
    sim = cosine(F.col("v"), F.col("qv"))
    return (
        emb.where(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(query))
        .where(sim >= RANGE_COSINE)
        .select("vec_id", "label", F.round(sim, 4).alias("cosine_sim"))
        .orderBy("vec_id")
    )


@register(
    "text_chunk_overlap_stride",
    oracle_sql=f"""
        WITH toks AS (
            SELECT doc_id, string_split(text, ' ') AS t
            FROM documents
        )
        SELECT doc_id,
               CAST(s // {CHUNK_STRIDE} AS BIGINT) AS chunk_idx,
               CAST(s AS BIGINT) AS start_tok,
               CAST(least({CHUNK_TOKENS}, len(t) - s) AS BIGINT) AS n_tokens,
               t[s + 1] AS first_token
        FROM toks, unnest(generate_series(0, len(t) - 1, {CHUNK_STRIDE}))
             AS g(s)
        ORDER BY doc_id, chunk_idx
    """,
    description=f"Overlapping-stride chunking: {CHUNK_TOKENS}-token "
    f"windows every {CHUNK_STRIDE} tokens (50% overlap) over each "
    "document — the sliding context-window slicing used when training "
    "examples must not lose cross-boundary context (the stride-less "
    "variant is text_chunk_fixed_tokens). Pure narrow generator: "
    "split → sequence of starts → posexplode, zero shuffle before the "
    "output sort; chunk bounds are integer division/min, engine-exact.",
)
def text_chunk_overlap_stride(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("t")
    )
    starts = F.sequence(
        F.lit(0), F.size("t") - 1, F.lit(CHUNK_STRIDE)
    )
    return (
        docs.select("doc_id", "t", F.explode(starts).alias("s"))
        .select(
            "doc_id",
            (F.col("s") / CHUNK_STRIDE).cast("long").alias("chunk_idx"),
            F.col("s").cast("long").alias("start_tok"),
            F.least(F.lit(CHUNK_TOKENS), F.size("t") - F.col("s"))
            .cast("long")
            .alias("n_tokens"),
            F.element_at("t", F.col("s") + 1).alias("first_token"),
        )
        .orderBy("doc_id", "chunk_idx")
    )


@register(
    "sample_negative_pairs",
    oracle_sql=f"""
        WITH n AS (SELECT count(*) AS n_docs FROM documents),
        anchors AS (
            SELECT doc_id AS a_id, lang AS a_lang
            FROM documents WHERE doc_id % 25 = 0
        ),
        pairs AS (
            SELECT a_id, a_lang, k.k,
                   (a_id * 1103515245 + 12345 + k.k * 2654435761) % n_docs
                       AS neg_id
            FROM anchors, n,
                 (VALUES (1), (2), (3)) AS k(k)
        )
        SELECT a_id, k AS neg_rank, neg_id, d.lang AS neg_lang,
               CAST(a_lang = d.lang AS BOOLEAN) AS same_lang
        FROM pairs JOIN documents d ON neg_id = d.doc_id
        WHERE neg_id <> a_id
        ORDER BY a_id, neg_rank
    """,
    description=f"Deterministic contrastive negative sampling: every "
    f"25th document anchors {NEG_K} pseudo-random negatives drawn by "
    "64-bit LCG/Knuth hash arithmetic over (doc_id, rank) modulo the "
    "corpus size — the negative-pair generation step contrastive "
    "embedding training needs, with hash replacing RNG so membership "
    "is a pure row function (replayable on any partitioning, engine, "
    "or day; accidental self-pairs dropped). The corpus size is a "
    "1-row broadcast; negatives join back to the corpus on the "
    "generated key. The same_lang flag audits how often uniform "
    "negatives collide with the anchor's language (hard-negative "
    "mining would bucket by it).",
)
def sample_negative_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    anchors = docs.filter(F.col("doc_id") % 25 == 0).select(
        F.col("doc_id").alias("a_id"), F.col("lang").alias("a_lang")
    )
    ranks = F.explode(F.sequence(F.lit(1), F.lit(NEG_K))).alias("neg_rank")
    pairs = (
        anchors.crossJoin(F.broadcast(n))
        .select("a_id", "a_lang", "n_docs", ranks)
        .select(
            "a_id",
            "a_lang",
            "neg_rank",
            (
                (
                    F.col("a_id") * F.lit(1103515245).cast("long")
                    + 12345
                    + F.col("neg_rank") * F.lit(2654435761).cast("long")
                )
                % F.col("n_docs")
            ).alias("neg_id"),
        )
        .filter(F.col("neg_id") != F.col("a_id"))
    )
    negs = docs.select(
        F.col("doc_id").alias("d_id"), F.col("lang").alias("neg_lang")
    )
    return (
        pairs.join(negs, F.col("neg_id") == F.col("d_id"))
        .select(
            "a_id",
            F.col("neg_rank"),
            "neg_id",
            "neg_lang",
            (F.col("a_lang") == F.col("neg_lang")).alias("same_lang"),
        )
        .orderBy("a_id", "neg_rank")
    )


# Power iteration constants: v scaled to a 1e3 integer grid per round
# (keeps w = G·v inside int64 at sf0.1 gram magnitudes; ANSI mode
# throws loudly rather than wrapping if a larger corpus overflows).
PI_ROUNDS = 3
PI_VSCALE = 1000


@register(
    "embed_power_iteration",
    oracle_sql=f"""
        WITH q AS (
            SELECT vec_id,
                   list_transform(
                       embedding,
                       v -> CAST(round(CAST(v AS DOUBLE) * 10000) AS BIGINT)
                   ) AS qv
            FROM embeddings
        ), a AS (
            SELECT vec_id, qv,
                   unnest(generate_series(1, len(qv))) AS i
            FROM q
        ), b AS (
            SELECT a.i, a.qv[a.i] AS qi,
                   unnest(generate_series(1, len(a.qv))) AS j,
                   a.qv
            FROM a
        ), g AS (
            SELECT CAST(i - 1 AS BIGINT) AS gi,
                   CAST(j - 1 AS BIGINT) AS gj,
                   CAST(sum(qi * qv[j]) AS BIGINT) AS gram
            FROM b GROUP BY 1, 2
        ), v0 AS (
            SELECT CAST(unnest(generate_series(0, 63)) AS BIGINT) AS i,
                   CAST({PI_VSCALE} AS BIGINT) AS v
        ),
        w1 AS (SELECT gi AS i, sum(gram * v) AS w
               FROM g JOIN v0 ON gj = v0.i GROUP BY gi),
        v1 AS (SELECT i, w // greatest((SELECT max(abs(w)) FROM w1)
                                       // {PI_VSCALE}, 1) AS v FROM w1),
        w2 AS (SELECT gi AS i, sum(gram * v) AS w
               FROM g JOIN v1 ON gj = v1.i GROUP BY gi),
        v2 AS (SELECT i, w // greatest((SELECT max(abs(w)) FROM w2)
                                       // {PI_VSCALE}, 1) AS v FROM w2),
        w3 AS (SELECT gi AS i, sum(gram * v) AS w
               FROM g JOIN v2 ON gj = v2.i GROUP BY gi),
        v3 AS (SELECT i, w // greatest((SELECT max(abs(w)) FROM w3)
                                       // {PI_VSCALE}, 1) AS v FROM w3)
        SELECT i, CAST(v AS BIGINT) AS component
        FROM v3
        ORDER BY i
    """,
    description=f"Top-principal-direction power iteration over the "
    f"exact-integer Gram matrix ({PI_ROUNDS} unrolled rounds): "
    "v ← G·v with v re-normalized to a 1e3 integer grid by "
    "max-component truncating division each round — the PCA/whitening "
    "building block (embed_gram_matrix supplies G) expressed as "
    "iterative DataFrame joins, the Pregel-as-DataFrame pattern "
    "graph_pagerank_fixedpoint uses for graphs applied to linear "
    "algebra. ALL arithmetic is int64 (quantized components, integer "
    "matvec, truncating-div normalization — Spark DIV and DuckDB // "
    "both truncate toward zero), so the iterative numeric result is "
    "bit-identical across engines and partitionings. At scale the "
    "matvec is a dim²-row broadcast join per round against a G that "
    "was reduced map-side — the corpus is touched once, by the Gram "
    "build.",
)
def embed_power_iteration(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    q = emb.select(
        F.transform(
            "embedding",
            lambda v: F.round(v.cast("double") * 10000.0).cast("long"),
        ).alias("qv")
    )
    a = q.select("qv", F.posexplode("qv").alias("i", "qi"))
    b = a.select("i", "qi", F.posexplode("qv").alias("j", "qj"))
    g = (
        b.groupBy(
            F.col("i").cast("long").alias("gi"),
            F.col("j").cast("long").alias("gj"),
        )
        .agg(F.sum(F.col("qi") * F.col("qj")).alias("gram"))
    )
    v = spark.range(64).select(
        F.col("id").alias("i"), F.lit(PI_VSCALE).cast("long").alias("v")
    )
    for _ in range(PI_ROUNDS):
        w = (
            g.join(F.broadcast(v), g.gj == v.i)
            .groupBy(F.col("gi").alias("i"))
            .agg(F.sum(F.col("gram") * F.col("v")).alias("w"))
        )
        m = w.agg(
            F.greatest(
                F.expr(f"max(abs(w)) div {PI_VSCALE}"), F.lit(1).cast("long")
            ).alias("m")
        )
        v = w.crossJoin(F.broadcast(m)).select(
            "i", F.expr("w div m").cast("long").alias("v")
        )
    return v.select("i", F.col("v").alias("component")).orderBy("i")
