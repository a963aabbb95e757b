"""Sketch-based near-duplicate detection (SURVEY.md §2.10 extension):
MinHash + LSH banding, SimHash, and embedding-cosine near-dup.

All hash functions are explicit universal hashes over integer token
ids — NOT engine hash() builtins (Spark's Murmur3 and DuckDB's hash
differ) — so both engines compute identical signatures and the
operators stay hash-checkable. The (a, b) parameter tables are
generated once below and embedded into BOTH the Spark plan and the
oracle SQL from the same Python list, so they cannot drift.

Token ids are derived arithmetically from the token bytes — the first
60 bits of md5(token) reduced mod the Mersenne prime — computed with
the same expression in Spark (``conv(substr(md5(t),1,15),16,10)``) and
DuckDB (``CAST('0x'||substr(md5(t),1,15) AS BIGINT)``). This replaces
the round-1 dense dictionary built with a global
``row_number().over(Window.orderBy(token))``, which funneled the whole
vocabulary through a single task at scale; the arithmetic id is a
narrow per-row projection, embarrassingly parallel at 100 TB.

Scale design: MinHash/LSH is the 100 TB dedup path — signatures are
O(docs × H), banding turns all-pairs comparison into equality joins on
(band, signature) buckets, and only bucket-cohabiting candidates pay an
exact-Jaccard verification. The exact-Jaccard operator
(llm_ops.dedup_near_jaccard) remains the semantic oracle the sketch is
validated against.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from etl_intraday_bidask_spark.functions.vector import as_double, cosine
from etl_intraday_bidask_spark.registry import register
from etl_intraday_bidask_spark.tables import load

MINHASH_P = 2147483647  # Mersenne prime 2^31-1
N_HASHES = 16
N_BANDS = 4  # 4 bands × 4 rows
ROWS_PER_BAND = N_HASHES // N_BANDS
# Deterministic universal-hash parameters h_i(x) = (a_i * x + b_i) % P.
MINHASH_PARAMS = [
    (i, (i * 7919 + 104729) % MINHASH_P, (i * 15485863 + 32452843) % MINHASH_P)
    for i in range(N_HASHES)
]
MINHASH_JACCARD = 0.9  # final verification threshold (== dedup_near_jaccard)

SIMHASH_BITS = 16

EMB_COSINE_THRESHOLD = 0.4  # validated on sf0.01: ≈150 all-pair matches

_PARAMS_SQL = ",\n                     ".join(
    f"({i}, {a}, {b})" for i, a, b in MINHASH_PARAMS
)

# Distributed token id: low 60 bits of md5(token), reduced mod P so every
# downstream universal-hash product a*tid stays < 2^62 (BIGINT-safe in
# both engines). Identical expression in both dialects — verified equal.
_TID_SQL = (
    "CAST(('0x' || substr(md5(token), 1, 15)) AS BIGINT) % " + str(MINHASH_P)
)


def _tid_col(token_col: str = "token"):
    """Spark twin of ``_TID_SQL`` — same md5-prefix arithmetic hash."""
    return (
        F.conv(F.substring(F.md5(token_col), 1, 15), 16, 10).cast("bigint")
        % MINHASH_P
    )


@register(
    "dedup_minhash_lsh",
    oracle_sql=f"""
        WITH tok AS (
            SELECT DISTINCT doc_id,
                   unnest(string_split(text, ' ')) AS token
            FROM documents
        ),
        params(i, a, b) AS (
            VALUES {_PARAMS_SQL}
        ),
        mh AS (
            SELECT t.doc_id, p.i,
                   min((p.a * ({_TID_SQL}) + p.b) % {MINHASH_P}) AS mhv
            FROM tok t
            CROSS JOIN params p
            GROUP BY 1, 2
        ),
        bands AS (
            SELECT doc_id, i // {ROWS_PER_BAND} AS band,
                   string_agg(CAST(mhv AS VARCHAR), '-' ORDER BY i) AS sig
            FROM mh
            GROUP BY 1, 2
        ),
        cands AS (
            SELECT DISTINCT x.doc_id AS doc_lo, y.doc_id AS doc_hi
            FROM bands x
            JOIN bands y
              ON x.band = y.band AND x.sig = y.sig
             AND x.doc_id < y.doc_id
        ),
        sz AS (SELECT doc_id, count(*) AS n FROM tok GROUP BY doc_id),
        verified AS (
            SELECT c.doc_lo, c.doc_hi, count(*) AS common
            FROM cands c
            JOIN tok ta ON ta.doc_id = c.doc_lo
            JOIN tok tb ON tb.doc_id = c.doc_hi AND tb.token = ta.token
            GROUP BY 1, 2
        )
        SELECT v.doc_lo, v.doc_hi,
               CAST(common AS DOUBLE) / (sa.n + sb.n - common) AS jaccard
        FROM verified v
        JOIN sz sa ON v.doc_lo = sa.doc_id
        JOIN sz sb ON v.doc_hi = sb.doc_id
        WHERE CAST(common AS DOUBLE) / (sa.n + sb.n - common)
              >= {MINHASH_JACCARD}
        ORDER BY doc_lo, doc_hi
    """,
    description="MinHash + LSH near-dup: 16 universal-hash minima per "
    "doc over md5-derived integer token ids, banded 4×4; docs sharing "
    "any band signature become candidates; candidates verified with "
    "exact Jaccard ≥ 0.9. The LSH equality-join candidate generation "
    "replaces the all-pairs token-postings join at scale, and the "
    "arithmetic token id replaces a dictionary (no global window, no "
    "vocab join).",
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Round-12 re-plan (SCALE.md §34, the pair-grain multiplication
    # class, found via dedup_minhash_est_error's 1g-heap OOM): this
    # corpus's band signatures collide heavily (6.16M candidate pairs
    # from 5000 docs at sf0.1, max bucket 2510), and the old
    # exact-verify joined cands back to token postings per TOKEN
    # (pair x ~23 rows ~ 145M intermediates). Re-planned to score at
    # PAIR grain: minhash once into a doc-grain signature array
    # (localCheckpoint — the materialized sketch), derive band
    # signatures by explode+slice of that array, and verify candidates
    # with array_intersect against doc-grain token arrays joined
    # shuffle-hash (build side docs-grain, the 6.2M-row pair stream
    # never sorts). Candidate-pair cardinality passes through the plan
    # exactly once.
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.array_distinct(F.split("text", " ")).alias("tok_arr")
    )
    tok = toks.select("doc_id", F.explode("tok_arr").alias("token"))
    params = spark.createDataFrame(MINHASH_PARAMS, "i int, a long, b long")
    mh = (
        tok.withColumn("tid", _tid_col())
        .crossJoin(F.broadcast(params))
        .groupBy("doc_id", "i")
        .agg(
            F.min((F.col("a") * F.col("tid") + F.col("b")) % MINHASH_P).alias(
                "mhv"
            )
        )
    )
    sig = mh.groupBy("doc_id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("i", "mhv"))),
            lambda s: s.getField("mhv"),
        ).alias("sig_arr")
    )
    sig = sig.localCheckpoint(eager=False)
    n_bands = N_HASHES // ROWS_PER_BAND
    bands = sig.select(
        "doc_id",
        F.explode(F.array(*[F.lit(b) for b in range(n_bands)])).alias("band"),
        "sig_arr",
    ).select(
        "doc_id",
        "band",
        F.array_join(
            F.transform(
                F.slice(
                    "sig_arr", F.col("band") * ROWS_PER_BAND + 1, ROWS_PER_BAND
                ),
                lambda v: v.cast("string"),
            ),
            "-",
        ).alias("sig"),
    )
    x = bands.alias("x")
    y = bands.alias("y")
    cands = (
        x.join(
            y,
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.sig") == F.col("y.sig"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select(
            F.col("x.doc_id").alias("doc_lo"), F.col("y.doc_id").alias("doc_hi")
        )
        .distinct()
    )
    pair = (
        cands.join(
            toks.select(
                F.col("doc_id").alias("doc_lo"),
                F.col("tok_arr").alias("tok_lo"),
            ).hint("shuffle_hash"),
            "doc_lo",
        )
        .join(
            toks.select(
                F.col("doc_id").alias("doc_hi"),
                F.col("tok_arr").alias("tok_hi"),
            ).hint("shuffle_hash"),
            "doc_hi",
        )
    )
    common = F.size(F.array_intersect("tok_lo", "tok_hi"))
    jac = common.cast("double") / (
        F.size("tok_lo") + F.size("tok_hi") - common
    )
    return (
        pair.where(jac >= MINHASH_JACCARD)
        .select("doc_lo", "doc_hi", jac.alias("jaccard"))
        .orderBy("doc_lo", "doc_hi")
    )


@register(
    "dedup_simhash",
    oracle_sql=f"""
        WITH tok AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS token
            FROM documents
        ),
        weights AS (
            SELECT doc_id, {_TID_SQL} AS tid, count(*) AS w
            FROM tok
            GROUP BY 1, 2
        ),
        bits(j) AS (SELECT * FROM generate_series(0, {SIMHASH_BITS - 1})),
        comps AS (
            SELECT w.doc_id, b.j,
                   sum(w.w * (2 * (((j * 7919 + 104729) * w.tid
                                    + j * 15485863 + 32452843)
                                   % {MINHASH_P} % 2) - 1)) AS s
            FROM weights w CROSS JOIN bits b
            GROUP BY 1, 2
        )
        SELECT doc_id,
               CAST(sum(CASE WHEN s > 0 THEN CAST(pow(2, j) AS BIGINT)
                        ELSE 0 END) AS BIGINT) AS simhash
        FROM comps
        GROUP BY doc_id
        ORDER BY doc_id
    """,
    description="SimHash document signature: 16 bit-hashes of weighted "
    "md5-derived token ids, each bit the sign of the weighted ±1 sum — "
    "near-dup docs land at small Hamming distance. Pure integer "
    "arithmetic, no vocabulary dictionary (scale-safe).",
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("token")
    )
    weights = (
        tok.groupBy("doc_id", _tid_col().alias("tid"))
        .agg(F.count(F.lit(1)).alias("w"))
    )
    bits = spark.range(SIMHASH_BITS).select(F.col("id").alias("j"))
    bit_val = (
        (F.col("j") * 7919 + 104729) * F.col("tid")
        + F.col("j") * 15485863
        + 32452843
    ) % MINHASH_P % 2
    comps = (
        weights.crossJoin(F.broadcast(bits))
        .groupBy("doc_id", "j")
        .agg(F.sum(F.col("w") * (2 * bit_val - 1)).alias("s"))
    )
    return (
        comps.groupBy("doc_id")
        .agg(
            F.sum(
                F.when(
                    F.col("s") > 0, F.pow(2.0, F.col("j")).cast("bigint")
                ).otherwise(F.lit(0))
            ).alias("simhash")
        )
        .orderBy("doc_id")
    )


@register(
    "dedup_embedding_cosine",
    oracle_sql=f"""
        WITH exp AS (
            SELECT vec_id,
                   generate_subscripts(embedding, 1) AS i,
                   CAST(unnest(embedding) AS DOUBLE) AS x
            FROM embeddings
        ),
        dots AS (
            SELECT a.vec_id AS a_id, b.vec_id AS b_id,
                   sum(a.x * b.x) AS dot,
                   sum(a.x * a.x) AS na2,
                   sum(b.x * b.x) AS nb2
            FROM exp a
            JOIN exp b ON a.i = b.i AND a.vec_id < b.vec_id
            GROUP BY 1, 2
        )
        SELECT a_id, b_id,
               round(dot / (sqrt(na2) * sqrt(nb2)), 4) AS cosine_sim
        FROM dots
        WHERE dot / (sqrt(na2) * sqrt(nb2)) >= {EMB_COSINE_THRESHOLD}
        ORDER BY a_id, b_id
    """,
    description="Embedding-space near-duplicate pairs: all-pairs cosine "
    "≥ 0.4 over the fixture collection (exact baseline; at scale the "
    "pair generation would be LSH/IVF-bucketed like knn_sim_join_blocked "
    "— this exact form is the recall oracle for those).",
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id", as_double("embedding").alias("v")
    )
    a = emb.alias("a")
    b = emb.alias("b")
    sim = cosine(F.col("a.v"), F.col("b.v"))
    return (
        a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("a_id"),
            F.col("b.vec_id").alias("b_id"),
            F.round(sim, 4).alias("cosine_sim"),
            sim.alias("_raw"),
        )
        .where(F.col("_raw") >= EMB_COSINE_THRESHOLD)
        .drop("_raw")
        .orderBy("a_id", "b_id")
    )


@register(
    "dedup_fuzzy_levenshtein",
    oracle_sql="""
        WITH d AS (
            SELECT doc_id, lang, n_chars, substring(text, 1, 30) AS s
            FROM documents
        )
        SELECT
            a.doc_id AS doc_lo,
            b.doc_id AS doc_hi,
            CAST(levenshtein(a.s, b.s) AS BIGINT) AS dist
        FROM d a
        JOIN d b
          ON a.lang = b.lang
         AND a.doc_id < b.doc_id
         AND abs(a.n_chars - b.n_chars) <= 5
        WHERE levenshtein(a.s, b.s) <= 15
    """,
    description="Edit-distance fuzzy dedup: document pairs whose 30-char "
    "prefixes are within levenshtein 15, blocked by (lang, |n_chars "
    "diff| <= 5) so the O(len^2) distance only runs on candidates that "
    "share a language and a size band. At 100 TB the blocking key "
    "becomes (lang, n_chars bucket) equi-join buckets, keeping the "
    "quadratic comparison inside small groups.",
)
def dedup_fuzzy_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars", F.substring("text", 1, 30).alias("s")
    )
    a = docs.select(
        F.col("doc_id").alias("doc_lo"),
        F.col("lang").alias("lang_a"),
        F.col("n_chars").alias("nc_a"),
        F.col("s").alias("s_a"),
    )
    b = docs.select(
        F.col("doc_id").alias("doc_hi"),
        F.col("lang").alias("lang_b"),
        F.col("n_chars").alias("nc_b"),
        F.col("s").alias("s_b"),
    )
    pairs = a.join(
        b,
        (F.col("lang_a") == F.col("lang_b"))
        & (F.col("doc_lo") < F.col("doc_hi"))
        & (F.abs(F.col("nc_a") - F.col("nc_b")) <= 5),
    )
    dist = F.levenshtein("s_a", "s_b")
    return pairs.where(dist <= 15).select(
        "doc_lo", "doc_hi", dist.cast("long").alias("dist")
    )
