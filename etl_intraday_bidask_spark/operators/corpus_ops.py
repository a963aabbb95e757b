"""Corpus-level training-data operators (SURVEY.md §2.19): unigram
language-model scoring, deterministic hash-bucket sampling, corpus
length histograms, and embedding centroid statistics.

These extend the §2.14 per-document text analysis with the
*corpus-wide* statistics a pretraining-data pipeline computes between
dedup and sampling: CCNet-style LM quality scores need a corpus
unigram table; sampling needs a deterministic, replayable doc filter;
curriculum/mix decisions need length and embedding-space diagnostics.

Scale notes: the unigram score is two shuffles (token agg, then doc
agg) plus one token-keyed equi join — the vocabulary side is Zipf-
bounded (≪ corpus size) and broadcastable when it fits; hash-bucket
sampling is a narrow stateless filter (zero shuffle before the final
tiny aggregate) and trivially reshardable because membership depends
only on doc_id; the histogram and centroid stats are single two-phase
hash aggregates. Centroid math quantizes float32 components onto an
exact 1e-4 integer grid so partial-sum order cannot perturb results —
the same scaled-integer policy as money columns (functions/parity.py).

Parity notes: every float emitted is either round(…, 4) of an
irrational (ln/avg-of-ln) or a bit-identical single division/sqrt over
exact BIGINTs; DuckDB's parallel ``unnest(range(len(e)))`` zips
positionally with ``unnest(e)``, matching Spark's ``posexplode``.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from etl_intraday_bidask_spark.registry import register
from etl_intraday_bidask_spark.tables import load


@register(
    "text_unigram_logprob",
    oracle_sql="""
        WITH toks AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS token
            FROM documents
        ), vocab AS (
            SELECT token, count(*) AS c FROM toks GROUP BY token
        ), tot AS (
            SELECT count(*) AS n_total FROM toks
        )
        SELECT t.doc_id,
               count(*) AS n_tokens,
               round(ln(max(tt.n_total)) - avg(ln(v.c)), 4) AS nll
        FROM toks t
        JOIN vocab v USING (token)
        CROSS JOIN tot tt
        GROUP BY t.doc_id
        ORDER BY t.doc_id
    """,
    description="CCNet-style unigram-LM quality score: per-document "
    "mean negative log-probability −avg(ln(c/N)) = ln(N) − avg(ln(c)) "
    "under the corpus's own unigram distribution (low = templated/"
    "repetitive, high = rare-token noise). Two shuffles: token-count "
    "agg, then doc-level agg; the Zipf-bounded vocab joins back on "
    "token and the 1-row total broadcasts.",
)
def text_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("token")
    )
    vocab = toks.groupBy("token").agg(F.count(F.lit(1)).alias("c"))
    total = toks.agg(F.count(F.lit(1)).alias("n_total"))
    return (
        toks.join(vocab, "token")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(F.ln(F.max("n_total")) - F.avg(F.ln("c")), 4).alias("nll"),
        )
        .orderBy("doc_id")
    )


@register(
    "sample_hash_bucket",
    oracle_sql="""
        SELECT lang,
               source,
               count(*) AS n_docs,
               CAST(sum(n_chars) AS BIGINT) AS sum_chars
        FROM documents
        WHERE (doc_id * 48271) % 2147483647 % 10 = 0
        GROUP BY lang, source
        ORDER BY lang, source
    """,
    description="Deterministic 1-in-10 hash-bucket sample: keep a doc "
    "iff Lehmer-hash(doc_id) mod 10 = 0 — replayable membership that "
    "depends only on the key, so reruns, backfills, and downstream "
    "joins see the same sample on any partitioning. A narrow stateless "
    "filter (no shuffle until the tiny per-(lang,source) audit agg); "
    "at lake scale swap the arithmetic hash for xxhash64 once "
    "cross-engine parity is no longer needed.",
)
def sample_hash_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    keep = (F.col("doc_id") * 48271) % 2147483647 % 10 == 0
    return (
        docs.where(keep)
        .groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
        )
        .orderBy("lang", "source")
    )


@register(
    "corpus_length_histogram",
    oracle_sql="""
        SELECT lang,
               n_chars // 64 AS bucket,
               count(*) AS n_docs,
               min(n_chars) AS min_chars,
               max(n_chars) AS max_chars
        FROM documents
        GROUP BY lang, bucket
        ORDER BY lang, bucket
    """,
    description="Corpus length histogram: doc counts per language in "
    "64-char integer buckets (exact integer division — no float "
    "log-bucket boundary ambiguity across engines). Single two-phase "
    "hash aggregate; the cut feeds length-filter thresholds in a "
    "curation pipeline.",
)
def corpus_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return (
        docs.groupBy("lang", F.expr("n_chars div 64").alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
        )
        .orderBy("lang", "bucket")
    )


@register(
    "embed_centroid_stats",
    oracle_sql="""
        WITH comp AS (
            SELECT label,
                   unnest(range(len(embedding))) AS pos,
                   CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 10000 + 0.5)
                        AS BIGINT) AS xq
            FROM embeddings
        ), per_dim AS (
            SELECT label, pos,
                   CAST(sum(xq) AS BIGINT) AS sq,
                   count(*) AS n
            FROM comp
            GROUP BY label, pos
        )
        SELECT label,
               CAST(max(n) AS BIGINT) AS n_vecs,
               count(*) AS dims,
               sqrt(CAST(sum(sq * sq) AS DOUBLE)) / 10000.0 / max(n)
                   AS centroid_norm
        FROM per_dim
        GROUP BY label
        ORDER BY label
    """,
    description="Per-label embedding centroid norm — the compactness "
    "diagnostic for class/cluster structure before ANN index design. "
    "Components are quantized to an exact 1e-4 integer grid, so every "
    "aggregate is an exact BIGINT sum; the norm is one sqrt and two "
    "divisions over those integers, bit-identical across engines "
    "regardless of partial-sum order. posexplode ⇔ DuckDB's zipped "
    "parallel unnest. Two hash aggs, shuffles keyed (label,pos) then "
    "label.",
)
def embed_centroid_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    comp = emb.select(
        "label", F.posexplode("embedding").alias("pos", "x")
    ).select(
        "label",
        "pos",
        F.floor(F.col("x").cast("double") * 10000 + F.lit(0.5))
        .cast("long")
        .alias("xq"),
    )
    per_dim = comp.groupBy("label", "pos").agg(
        F.sum("xq").alias("sq"), F.count(F.lit(1)).alias("n")
    )
    return (
        per_dim.groupBy("label")
        .agg(
            F.max("n").alias("n_vecs"),
            F.count(F.lit(1)).alias("dims"),
            (
                F.sqrt(F.sum(F.col("sq") * F.col("sq")).cast("double"))
                / 10000.0
                / F.max("n")
            ).alias("centroid_norm"),
        )
        .orderBy("label")
    )


@register(
    "dedup_containment",
    oracle_sql="""
        WITH tok AS (
            SELECT DISTINCT doc_id, lang,
                   unnest(string_split(text, ' ')) AS token
            FROM documents
        ),
        sz AS (SELECT doc_id, count(*) AS n FROM tok GROUP BY doc_id),
        inter AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
            FROM tok a
            JOIN tok b
              ON a.token = b.token AND a.lang = b.lang
             AND a.doc_id <> b.doc_id
            GROUP BY 1, 2
        )
        SELECT i.doc_a AS contained_doc,
               i.doc_b AS container_doc,
               CAST(i.c AS DOUBLE) / sa.n AS containment
        FROM inter i
        JOIN sz sa ON i.doc_a = sa.doc_id
        JOIN sz sb ON i.doc_b = sb.doc_id
        WHERE CAST(i.c AS DOUBLE) / sa.n >= 0.95
          AND sa.n < sb.n
        ORDER BY contained_doc, container_doc
    """,
    description="Containment near-dup (Broder's asymmetric measure): "
    "doc A is flagged against a strictly larger doc B when "
    "|A∩B|/|A| ≥ 0.95 over distinct token sets — catches quotes, "
    "excerpts, and wrapper pages that symmetric Jaccard misses "
    "(a 30-token excerpt inside a 300-token page has Jaccard ≤ 0.1 "
    "but containment 1.0). Same lang-blocked postings self-join "
    "backbone as the Jaccard ops, so the scale ladder (df-ceiling, "
    "MinHash banding) applies unchanged; the size predicate "
    "orients each surviving pair.",
)
def dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id",
        "lang",
        F.explode(F.array_distinct(F.split("text", " "))).alias("token"),
    )
    # |distinct tokens| is doc-local: a narrow size() on the doc row
    # replaces the postings re-aggregation — one docs-grain exchange
    # fewer and no second aggregation pass over the exploded postings.
    # NULL-text equivalence (ADVICE r7): unlike the old explode+groupBy
    # form, this emits a NULL-n row for a NULL-text doc (and -1 under
    # spark.sql.legacy.sizeOfNull) — harmless HERE because sz is only
    # consumed via inner joins from tok-derived doc_ids (a NULL-text doc
    # never appears in tok) and the fixture is null-free, but any new
    # consumer with outer-join or null-predicate semantics must filter
    # text IS NOT NULL first.
    sz = docs.select(
        "doc_id",
        F.size(F.array_distinct(F.split("text", " ")))
        .cast("long")
        .alias("n"),
    )
    a = tok.alias("a")
    b = tok.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.token") == F.col("b.token"))
            & (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.doc_id") != F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("c"))
    )
    sa = sz.alias("sa")
    sb = sz.alias("sb")
    contain = F.col("c").cast("double") / F.col("sa.n")
    # sz is corpus-grain (one row per doc): no broadcast hint — stats
    # auto-broadcast at fixture SF; at 100 TB the size lookup must stay
    # a distributed equi-join on doc_id.
    return (
        inter.join(sa, F.col("doc_a") == F.col("sa.doc_id"))
        .join(sb, F.col("doc_b") == F.col("sb.doc_id"))
        .where((contain >= 0.95) & (F.col("sa.n") < F.col("sb.n")))
        .select(
            F.col("doc_a").alias("contained_doc"),
            F.col("doc_b").alias("container_doc"),
            # Unrounded rational of exact counts (half-boundary trap).
            contain.alias("containment"),
        )
        .orderBy("contained_doc", "container_doc")
    )


@register(
    "sample_temperature_mix",
    oracle_sql="""
        WITH sizes AS (
            SELECT source, count(*) AS n_src
            FROM documents
            GROUP BY source
        ),
        tot AS (SELECT sum(n_src) AS n_all FROM sizes),
        -- T=2 temperature flattening: weight ∝ share^(1/2); keep-rate
        -- per source normalized so the max-share source keeps ~1/2.
        rates AS (
            SELECT s.source,
                   sqrt(CAST(s.n_src AS DOUBLE) / t.n_all)
                       / (2 * sqrt((SELECT max(CAST(n_src AS DOUBLE) / t2.n_all)
                                    FROM sizes, tot t2)))
                       AS keep_rate
            FROM sizes s, tot t
        )
        SELECT d.source,
               count(*) AS n_kept,
               round(max(r.keep_rate), 4) AS keep_rate
        FROM documents d
        JOIN rates r ON d.source = r.source
        WHERE CAST((d.doc_id * 48271) % 2147483647 AS DOUBLE) / 2147483647.0
              < r.keep_rate
        GROUP BY d.source
        ORDER BY d.source
    """,
    description="Temperature-scaled mix sampling (the pretraining "
    "data-mixing pattern): per-source keep rates ∝ share^(1/T) with "
    "T=2 flatten head sources and upweight the tail relative to "
    "natural sampling; membership is the deterministic Lehmer-hash "
    "uniform in [0,1) compared to the source's rate, so the sample is "
    "replayable and partitioning-independent (same property as "
    "sample_hash_bucket, per-stratum rates instead of a global one). "
    "The rate table is O(sources) and broadcast; the filter itself is "
    "narrow and shuffle-free.",
)
def sample_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    sizes = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_src"))
    tot = sizes.agg(F.sum("n_src").alias("n_all"))
    shares = sizes.crossJoin(F.broadcast(tot)).select(
        "source",
        (F.col("n_src").cast("double") / F.col("n_all")).alias("share"),
    )
    max_share = shares.agg(F.max("share").alias("max_share"))
    rates = shares.crossJoin(F.broadcast(max_share)).select(
        "source",
        (
            F.sqrt(F.col("share")) / (2 * F.sqrt(F.col("max_share")))
        ).alias("keep_rate"),
    )
    u = (
        ((F.col("doc_id") * 48271) % 2147483647).cast("double")
        / 2147483647.0
    )
    return (
        docs.join(F.broadcast(rates), "source")
        .where(u < F.col("keep_rate"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.round(F.max("keep_rate"), 4).alias("keep_rate"),
        )
        .orderBy("source")
    )


@register(
    "text_bigram_logprob",
    oracle_sql="""
        WITH t AS (
            SELECT doc_id, string_split(text, ' ') AS toks FROM documents
        ),
        g AS (
            SELECT doc_id, toks[i] || ' ' || toks[i + 1] AS gram,
                   toks[i] AS prefix
            FROM t, unnest(generate_series(1, greatest(len(toks) - 1, 1)))
                    AS u(i)
            WHERE i + 1 <= len(toks)
        ),
        cb AS (SELECT gram, count(*) AS nb FROM g GROUP BY gram),
        cp AS (SELECT prefix, count(*) AS np FROM g GROUP BY prefix)
        SELECT g.doc_id,
               count(*) AS n_bigrams,
               round(avg(ln(cp.np) - ln(cb.nb)), 4) AS nll
        FROM g
        JOIN cb USING (gram)
        JOIN cp USING (prefix)
        GROUP BY g.doc_id
        ORDER BY g.doc_id
    """,
    description="Bigram-LM quality score: per-document mean "
    "−ln P(w_i | w_{i-1}) under the corpus's own bigram counts "
    "(P = c(w1 w2)/c(w1·)) — the order-sensitive upgrade of "
    "text_unigram_logprob: token-shuffled spam scores near-random "
    "here while scoring fine under unigrams. Three token-keyed "
    "aggregates plus two equi joins against Zipf-bounded count "
    "tables; same broadcast-when-fits ladder as the unigram op.",
)
def text_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    t = docs.select("doc_id", F.split("text", " ").alias("toks"))
    grams = F.when(
        F.size("toks") >= 2,
        F.expr(
            "transform(sequence(1, size(toks) - 1), "
            "i -> concat(element_at(toks, i), ' ', element_at(toks, i + 1)))"
        ),
    ).otherwise(F.expr("cast(array() as array<string>)"))
    g = t.select("doc_id", F.explode(grams).alias("gram")).withColumn(
        "prefix", F.split("gram", " ")[0]
    )
    cb = g.groupBy("gram").agg(F.count(F.lit(1)).alias("nb"))
    cp = g.groupBy("prefix").agg(F.count(F.lit(1)).alias("np"))
    return (
        g.join(cb, "gram")
        .join(cp, "prefix")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(F.avg(F.ln("np") - F.ln("nb")), 4).alias("nll"),
        )
        .orderBy("doc_id")
    )
