"""Second wave of corpus-level training-data operators (SURVEY.md
§2.22): int8 embedding quantization, fixed-size token chunking, and
contiguous token-stream sequence packing — the storage-compression and
sequence-assembly steps of a pretraining data pipeline.

Scale notes: quantization is a narrow per-row transform (higher-order
functions over the embedding array, no shuffle before the small label
aggregate) — at 100 TB it runs scan-local and writes int8 payloads at
4× compression; chunking is a per-row generator (posexplode over an
arithmetic sequence), narrow and shuffle-free; packing needs one
running sum per language partition (the canonical concat-then-chunk
pretraining layout), a single window shuffle on lang — at 100 TB the
partition key becomes (lang, shard) with per-shard offsets merged by a
second tiny prefix-sum pass over shard totals (documented in SCALE.md),
keeping every partition's scan linear and independent.

Parity notes: all element arithmetic is upcast to DOUBLE on both
engines before any division (float32 → float64 is exact, and the
subsequent IEEE ops are bit-identical); quantized codes and token
counts are BIGINT on both sides; aggregates over them are exact
integer sums; every result carries a total-order ORDER BY.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from etl_intraday_bidask_spark.registry import register
from etl_intraday_bidask_spark.tables import load


@register(
    "embed_quantize_int8",
    oracle_sql="""
        WITH dv AS (
            SELECT label,
                   list_transform(embedding, v -> CAST(v AS DOUBLE)) AS e
            FROM embeddings
        ), mm AS (
            SELECT label, e,
                   list_min(e) AS vmin,
                   list_max(e) AS vmax
            FROM dv
        ), q AS (
            SELECT label,
                   list_transform(
                       e,
                       v -> CAST(floor((v - vmin) / (vmax - vmin) * 255.0
                                       + 0.5) AS BIGINT) - 128
                   ) AS qv
            FROM mm
            WHERE vmax > vmin
        )
        SELECT label,
               count(*) AS n_vecs,
               CAST(sum(CAST(list_sum(qv) AS BIGINT)) AS BIGINT) AS q_sum,
               CAST(min(list_min(qv)) AS BIGINT) AS q_min,
               CAST(max(list_max(qv)) AS BIGINT) AS q_max
        FROM q
        GROUP BY label
        ORDER BY label
    """,
    description="Per-vector int8 scalar quantization (min/max affine "
    "grid, codes in [-128, 127]) of the embedding column — the 4× "
    "storage compression step an embedding lake applies before ANN "
    "indexing — summarized per label as exact integer code statistics. "
    "Elements are upcast float32→float64 (exact) so the affine map is "
    "the same IEEE arithmetic on both engines; all aggregates are "
    "exact BIGINT sums/extrema. Narrow higher-order transforms, one "
    "10-group aggregate shuffle, no UDF.",
)
def embed_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    dv = emb.select(
        "label",
        F.transform("embedding", lambda v: v.cast("double")).alias("e"),
    )
    mm = dv.select(
        "label",
        "e",
        F.array_min("e").alias("vmin"),
        F.array_max("e").alias("vmax"),
    ).filter(F.col("vmax") > F.col("vmin"))
    q = mm.select(
        "label",
        F.transform(
            "e",
            lambda v: F.floor(
                (v - F.col("vmin")) / (F.col("vmax") - F.col("vmin")) * 255.0
                + 0.5
            ).cast("long")
            - 128,
        ).alias("qv"),
    )
    return (
        q.groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.sum(
                F.aggregate(
                    "qv", F.lit(0).cast("long"), lambda acc, x: acc + x
                )
            ).alias("q_sum"),
            F.min(F.array_min("qv")).alias("q_min"),
            F.max(F.array_max("qv")).alias("q_max"),
        )
        .orderBy("label")
    )


@register(
    "embed_gram_matrix",
    oracle_sql="""
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
            SELECT a.vec_id,
                   a.i, a.qv[a.i] AS qi,
                   unnest(generate_series(1, len(a.qv))) AS j,
                   a.qv
            FROM a
        )
        SELECT CAST(i - 1 AS BIGINT) AS i,
               CAST(j - 1 AS BIGINT) AS j,
               CAST(sum(qi * qv[j]) AS BIGINT) AS gram,
               count(*) AS n_vecs
        FROM b
        WHERE j >= i
        GROUP BY i, j
        ORDER BY i, j
    """,
    description="Exact distributed Gram matrix of the embedding "
    "corpus: X^T X over components quantized to the 1e-4 integer grid "
    "(float32 fixtures are exact there), upper triangle as (i, j, "
    "sum) cells — the covariance/PCA/whitening building block. The "
    "plan is two chained narrow generators (posexplode of the "
    "quantized vector, then of its pair component) followed by a "
    "4096-group two-phase exact-integer aggregate: no self-join, no "
    "shuffle proportional to the corpus — partial outer-product sums "
    "combine map-side, so at 100 TB the shuffle carries only "
    "num_partitions × dim² rows.",
)
def embed_gram_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    q = emb.select(
        "vec_id",
        # F.round (not the floor-half grid shortcut): embedding floats are
        # NOT on a decimal grid, so parity.py's policy requires the
        # BigDecimal round paired with DuckDB's round — the pairing proven
        # by embed_centroid_stats.
        F.transform(
            "embedding",
            lambda v: F.round(v.cast("double") * 10000.0).cast("long"),
        ).alias("qv"),
    )
    a = q.select("vec_id", "qv", F.posexplode("qv").alias("i", "qi"))
    b = a.select(
        "vec_id", "i", "qi", F.posexplode("qv").alias("j", "qj")
    ).filter(F.col("j") >= F.col("i"))
    return (
        b.groupBy(
            F.col("i").cast("long").alias("i"),
            F.col("j").cast("long").alias("j"),
        )
        .agg(
            F.sum(F.col("qi") * F.col("qj")).alias("gram"),
            F.count(F.lit(1)).alias("n_vecs"),
        )
        .orderBy("i", "j")
    )


@register(
    "text_chunk_fixed_tokens",
    oracle_sql="""
        WITH toks AS (
            SELECT doc_id,
                   string_split(text, ' ') AS t,
                   CAST(len(string_split(text, ' ')) AS BIGINT) AS n
            FROM documents
        )
        SELECT doc_id,
               CAST(unnest(generate_series(0, (n + 31) // 32 - 1))
                    AS BIGINT) AS chunk_id,
               CAST(least(32, n - 32 * unnest(generate_series(
                    0, (n + 31) // 32 - 1))) AS BIGINT) AS chunk_tokens,
               t[32 * unnest(generate_series(0, (n + 31) // 32 - 1)) + 1]
                   AS first_tok
        FROM toks
        ORDER BY doc_id, chunk_id
    """,
    description="Fixed-size token chunking: every document split into "
    "32-token chunks (the context-window slicing step before sequence "
    "packing), emitting the chunk id, its token count (last chunk "
    "ragged), and its first token. A narrow per-row generator — "
    "posexplode over an arithmetic sequence, no shuffle; positions and "
    "counts BIGINT on both engines.",
)
def text_chunk_fixed_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.split("text", " ").alias("t"),
        F.size(F.split("text", " ")).cast("long").alias("n"),
    )
    chunks = toks.select(
        "doc_id",
        "t",
        "n",
        F.posexplode(
            F.sequence(F.lit(0).cast("long"), F.expr("(n + 31) div 32") - 1)
        ).alias("pos", "chunk_id"),
    )
    return (
        chunks.select(
            "doc_id",
            F.col("chunk_id").cast("long").alias("chunk_id"),
            F.least(F.lit(32).cast("long"), F.col("n") - 32 * F.col("chunk_id"))
            .cast("long")
            .alias("chunk_tokens"),
            F.element_at("t", (32 * F.col("chunk_id") + 1).cast("int")).alias(
                "first_tok"
            ),
        )
        .orderBy("doc_id", "chunk_id")
    )


@register(
    "pack_token_sequences",
    oracle_sql="""
        WITH sized AS (
            SELECT doc_id, lang,
                   CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
            FROM documents
        ), offsets AS (
            SELECT lang, n_tokens,
                   sum(n_tokens) OVER (
                       PARTITION BY lang ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) - n_tokens AS start_off
            FROM sized
        )
        SELECT lang,
               CAST(start_off // 2048 AS BIGINT) AS seq_id,
               count(*) AS n_docs,
               CAST(sum(n_tokens) AS BIGINT) AS seq_tokens
        FROM offsets
        GROUP BY lang, seq_id
        ORDER BY lang, seq_id
    """,
    description="Contiguous token-stream sequence packing: documents "
    "are concatenated per language in doc_id order and cut into "
    "2048-token training sequences — the concat-then-chunk layout "
    "pretraining loaders use. Each doc's start offset is a per-lang "
    "running sum (one window shuffle on lang); the sequence id is an "
    "exact integer division of the offset. Emits docs-per-sequence and "
    "token counts per (lang, sequence). At 100 TB the partition key "
    "becomes (lang, shard) with shard totals merged by a tiny second "
    "prefix-sum pass (SCALE.md).",
)
def pack_token_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load(spark, sf_dir, "documents")
    sized = docs.select(
        "doc_id",
        "lang",
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
    )
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    offsets = sized.select(
        "lang",
        "n_tokens",
        (F.sum("n_tokens").over(w) - F.col("n_tokens")).alias("start_off"),
    )
    return (
        offsets.select(
            "lang",
            "n_tokens",
            F.expr("start_off div 2048").alias("seq_id"),
        )
        .groupBy("lang", "seq_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("seq_tokens"),
        )
        .orderBy("lang", "seq_id")
    )


@register(
    "corpus_decontaminate_ngram",
    oracle_sql="""
        WITH t AS (
            SELECT doc_id, lang, string_split(text, ' ') AS toks
            FROM documents
            WHERE len(string_split(text, ' ')) >= 3
        ), g AS (
            SELECT DISTINCT doc_id, lang,
                   toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2] AS gram
            FROM t, unnest(generate_series(1, len(toks) - 2)) AS u(i)
        ), ev AS (
            SELECT * FROM g WHERE doc_id % 50 = 0
        ), tr_d AS (
            SELECT DISTINCT lang, gram FROM g WHERE doc_id % 50 <> 0
        ), totals AS (
            SELECT doc_id, count(*) AS total
            FROM g WHERE doc_id % 50 = 0
            GROUP BY doc_id
        ), hits AS (
            SELECT e.doc_id, count(*) AS shared
            FROM ev e
            JOIN tr_d t ON e.gram = t.gram AND e.lang = t.lang
            GROUP BY e.doc_id
        )
        SELECT totals.doc_id AS eval_id,
               CAST(COALESCE(hits.shared, 0) AS BIGINT) AS shared_trigrams,
               CAST(totals.total AS BIGINT) AS total_trigrams,
               CAST(COALESCE(hits.shared, 0) AS DOUBLE)
                   / CAST(totals.total AS DOUBLE) AS contamination
        FROM totals
        LEFT JOIN hits ON totals.doc_id = hits.doc_id
        ORDER BY eval_id
    """,
    description="Benchmark decontamination: every held-out eval "
    "document (deterministic doc_id slice) is scored by the fraction "
    "of its distinct trigram shingles that also occur anywhere in the "
    "training split — the n-gram-overlap contamination check run "
    "before training on scraped corpora (eval answers leaking into "
    "the train set inflate benchmarks). Lang-blocked postings join "
    "against the DEDUPLICATED train shingle set, so the join is "
    "|eval shingles| × matches, never corpus-quadratic; contamination "
    "is one IEEE division of exact counts. At 100 TB the train "
    "shingle set shuffles once on (lang, gram) and the tiny eval side "
    "broadcasts.",
)
def corpus_decontaminate_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id", "lang", F.split("text", " ").alias("toks")
    ).where(F.size("toks") >= 3)
    # The distinct is per-document ((doc_id, lang) ⊇ the dedup key),
    # so it is doc-local: array_distinct before the explode replaces
    # a full-corpus (doc, lang, gram) distinct exchange.
    g = t.select(
        "doc_id",
        "lang",
        F.explode(
            F.expr(
                "array_distinct(transform(sequence(0, size(toks) - 3), "
                "i -> concat(toks[i], ' ', toks[i + 1], ' ', toks[i + 2])))"
            )
        ).alias("gram"),
    )
    ev = g.where(F.col("doc_id") % 50 == 0)
    tr_d = g.where(F.col("doc_id") % 50 != 0).select("lang", "gram").distinct()
    totals = ev.groupBy("doc_id").agg(F.count(F.lit(1)).alias("total"))
    hits = (
        ev.join(tr_d, ["lang", "gram"])
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    return (
        totals.join(hits, "doc_id", "left")
        .select(
            F.col("doc_id").alias("eval_id"),
            F.coalesce(F.col("shared"), F.lit(0)).cast("long").alias(
                "shared_trigrams"
            ),
            F.col("total").cast("long").alias("total_trigrams"),
            (
                F.coalesce(F.col("shared"), F.lit(0)).cast("double")
                / F.col("total").cast("double")
            ).alias("contamination"),
        )
        .orderBy("eval_id")
    )


@register(
    "sample_weighted_ares",
    oracle_sql="""
        WITH keyed AS (
            SELECT doc_id, lang, n_chars,
                   ln(((doc_id * 2654435761) % 2147483648 + 0.5)
                      / 2147483648.0)
                       / CAST(n_chars AS DOUBLE) AS k
            FROM documents
        )
        SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS n_chars
        FROM keyed
        ORDER BY k DESC, doc_id
        LIMIT 20
    """,
    description="Weighted sampling without replacement (Efraimidis-"
    "Spirakis A-Res): each doc draws priority u^(1/w) — compared in "
    "log space as ln(u)/w — from a deterministic Knuth-hash uniform "
    "and its length weight, and the global top-20 priorities are the "
    "exact-k weighted sample. Replayable on any partitioning (the "
    "hash replaces the RNG) and distributed as a TakeOrderedAndProject "
    "per-partition heap merge — the standard cluster-scale weighted "
    "reservoir. Deterministic doc_id tie-break; ln over identical "
    "doubles on both engines (same precedent as the LM logprob ops).",
)
def sample_weighted_ares(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    u = (
        (F.col("doc_id") * F.lit(2654435761)) % F.lit(2147483648)
        + F.lit(0.5)
    ) / F.lit(2147483648.0)
    keyed = docs.select(
        "doc_id",
        "lang",
        F.col("n_chars").cast("long").alias("n_chars"),
        (F.log(u) / F.col("n_chars").cast("double")).alias("k"),
    )
    return (
        keyed.orderBy(F.col("k").desc(), "doc_id")
        .limit(20)
        .select("doc_id", "lang", "n_chars")
    )


@register(
    "text_pmi_cooccurrence",
    oracle_sql="""
        WITH dt AS (
            SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS tok
            FROM documents
        ), n_docs AS (
            SELECT count(DISTINCT doc_id) AS nd FROM dt
        ), df AS (
            SELECT tok, count(*) AS c FROM dt GROUP BY tok
            HAVING count(*) >= 20
        ), keep AS (
            SELECT dt.doc_id, dt.tok, df.c
            FROM dt JOIN df ON dt.tok = df.tok
        ), pairs AS (
            SELECT a.tok AS tok_a, b.tok AS tok_b,
                   count(*) AS c_ab,
                   max(a.c) AS c_a,
                   max(b.c) AS c_b
            FROM keep a
            JOIN keep b ON a.doc_id = b.doc_id AND a.tok < b.tok
            GROUP BY a.tok, b.tok
        )
        SELECT tok_a, tok_b, c_ab,
               round(ln(CAST(c_ab AS DOUBLE) * nd
                        / (CAST(c_a AS DOUBLE) * c_b)), 4) AS pmi
        FROM pairs, n_docs
        ORDER BY c_ab DESC, tok_a, tok_b
        LIMIT 50
    """,
    description="Pointwise mutual information over document-level "
    "token co-occurrence: PMI(a,b) = ln(P(a,b)/(P(a)P(b))) from exact "
    "doc-frequency counts, for the 50 most co-occurring pairs of "
    "frequent tokens (df ≥ 20 bounds the pair space — the vocabulary "
    "pruning that keeps the self-join O(Σ df²) on frequent terms, not "
    "corpus-quadratic). The association-matrix statistic distribution "
    "semantics (collocations, PMI-SVD embeddings) build on; counts "
    "are exact integers, the single ln-of-ratio is applied once per "
    "output row and rounded 4dp (irrational-output policy). At 100 TB "
    "the doc-token postings shuffle once on doc_id for the pair join "
    "and once on the pair key for the count.",
)
def text_pmi_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    dt = docs.select(
        "doc_id",
        F.explode(F.array_distinct(F.split("text", " "))).alias("tok"),
    )
    nd_df = dt.agg(F.countDistinct("doc_id").alias("nd"))
    df = (
        dt.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") >= 20)
    )
    # df is vocabulary-grain (unbounded at web scale even after the
    # c >= 20 cut): no broadcast hint — stats auto-broadcast at fixture
    # SF, a real corpus hash-joins on the token key.
    keep = dt.join(df, "tok")
    a = keep.alias("a")
    b = keep.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.doc_id") == F.col("b.doc_id"))
            & (F.col("a.tok") < F.col("b.tok")),
        )
        .groupBy(
            F.col("a.tok").alias("tok_a"), F.col("b.tok").alias("tok_b")
        )
        .agg(
            F.count(F.lit(1)).alias("c_ab"),
            F.max(F.col("a.c")).alias("c_a"),
            F.max(F.col("b.c")).alias("c_b"),
        )
    )
    pmi = F.round(
        F.log(
            F.col("c_ab").cast("double")
            * F.col("nd").cast("double")
            / (F.col("c_a").cast("double") * F.col("c_b"))
        ),
        4,
    )
    return (
        pairs.crossJoin(F.broadcast(nd_df))
        .select("tok_a", "tok_b", "c_ab", pmi.alias("pmi"))
        .orderBy(F.col("c_ab").desc(), "tok_a", "tok_b")
        .limit(50)
    )


@register(
    "sample_stratified_split",
    oracle_sql="""
        WITH keyed AS (
            SELECT lang,
                   CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
                   (doc_id * 2654435761) % 100 AS bucket
            FROM documents
        )
        SELECT lang,
               CASE WHEN bucket < 80 THEN 'train'
                    WHEN bucket < 90 THEN 'val'
                    ELSE 'test' END AS split,
               count(*) AS n_docs,
               CAST(sum(n_tokens) AS BIGINT) AS n_tokens
        FROM keyed
        GROUP BY lang, split
        ORDER BY lang, split
    """,
    description="Stratified train/val/test split (80/10/10): every "
    "document lands in a split via a deterministic Knuth-hash bucket "
    "of its id — membership is a pure row function, so the split is "
    "replayable on any partitioning, any engine, any day (the property "
    "random_split cannot give), and per-language doc/token counts "
    "audit the stratification. The canonical ML dataset-split op; a "
    "narrow stateless projection plus one (lang, split) aggregate — "
    "at 100 TB the split column is typically materialized as a "
    "partition key so each split is a partition scan.",
)
def sample_stratified_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    bucket = (F.col("doc_id") * F.lit(2654435761)) % 100
    split = (
        F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")
    )
    return (
        docs.select(
            "lang",
            F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
            split.alias("split"),
        )
        .groupBy("lang", "split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
        )
        .orderBy("lang", "split")
    )
