"""Corpus-level training-data operators, wave 4 (SURVEY.md §2.27):
the Gopher/C4-style quality rules (token entropy, duplicate-n-gram
repetition, composite filter with reason codes), sketch honesty
(MinHash-estimate error vs exact Jaccard), and deterministic corpus
shaping (per-key reservoir-equivalent sampling, per-source quota caps,
winsorized length stats, per-language vocabulary top-k).

Scale notes: entropy/repetition are per-document narrow pipelines —
the trigram forms never shuffle (higher-order array functions), and
the entropy form is likewise shuffle-free (run-length fold over the
sorted token array); the minhash-error op reuses the LSH band-bucket
candidate generation (equality join, never all-pairs) and re-scores
ONLY candidates; reservoir/quota sampling are hash-rank windows
partitioned by the sampling key — membership is a pure function of
(id, salt), replayable on any partitioning, any engine, any day (the
property random() sampling loses the moment partitioning changes);
winsorize broadcasts the per-language clip points; the vocabulary
top-k is a map-side-combined (lang, gram) count + per-lang window
over post-aggregate rows.

Parity notes: entropy's per-term ``round(c·ln(c)·1e4)`` quantizes to
BIGINT before summing (term values ≤ ~1e7, so the float-ulp window
around the .5 boundary is ~1e-9 of a unit — unreachable in practice),
and the final entropy is ONE float chain over exact integers, rounded
4dp; repetition/quota/winsorize ratios are single divisions of exact
integers; md5-prefix hash ranks compare as strings identically in
both engines.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from etl_intraday_bidask_spark.operators.dedup_advanced import (
    MINHASH_P,
    MINHASH_PARAMS,
    N_HASHES,
    ROWS_PER_BAND,
    _PARAMS_SQL,
    _TID_SQL,
    _tid_col,
)
from etl_intraday_bidask_spark.registry import register
from etl_intraday_bidask_spark.tables import load

RESERVOIR_K = 5
QUOTA_CAP = 20


@register(
    "text_entropy_token",
    oracle_sql="""
        WITH tok AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS token
            FROM documents
        ),
        cnt AS (
            SELECT doc_id, token, count(*) AS c
            FROM tok GROUP BY 1, 2
        ),
        agg AS (
            SELECT doc_id,
                   CAST(sum(c) AS BIGINT) AS n_tokens,
                   sum(CAST(round(c * ln(c) * 10000) AS BIGINT)) AS s_e4
            FROM cnt GROUP BY 1
        )
        SELECT doc_id, n_tokens,
               round(ln(n_tokens)
                     - CAST(s_e4 AS DOUBLE) / 10000.0 / n_tokens,
                     4) AS entropy
        FROM agg
        ORDER BY doc_id
    """,
    description="Per-document Shannon entropy over the token "
    "distribution — the Gopher-style quality signal that separates "
    "natural text from boilerplate/keyword-stuffed documents (low "
    "entropy = few tokens dominate). H = ln(N) − Σc·ln(c)/N with "
    "integer counts; each c·ln(c) term quantizes to the 1e-4 grid as "
    "a BIGINT before summing, so the aggregate is exact and order-"
    "independent, and the final entropy is one float chain over exact "
    "integers on both engines. ZERO data shuffles: the statistic is "
    "doc-local, so the per-token run counts come from a run-length "
    "fold over the sorted token array (JVM-side higher-order "
    "`aggregate`, O(d log d) per doc) instead of the explode + "
    "(doc,token) + doc aggregate chain, whose two exchanges moved the "
    "whole corpus token volume twice for a per-row answer. Each run's "
    "c·ln(c) term uses the identical double chain the pair aggregate "
    "used, so the fold is bit-congruent with the oracle.",
)
def text_entropy_token(spark: SparkSession, sf_dir: str) -> DataFrame:
    fold = """
      aggregate(
        sort_array(split(text, ' ')),
        named_struct('prev', CAST(NULL AS STRING), 'run', 0L,
                     'n', 0L, 's', 0L),
        (a, x) -> IF(a.prev IS NULL OR x != a.prev,
                     named_struct('prev', x, 'run', 1L, 'n', a.n + 1L,
                                  's', a.s + IF(a.prev IS NULL, 0L,
                                       floor(CAST(a.run AS DOUBLE)
                                             * ln(CAST(a.run AS DOUBLE))
                                             * 10000 + 0.5))),
                     named_struct('prev', a.prev, 'run', a.run + 1L,
                                  'n', a.n + 1L, 's', a.s)),
        a -> named_struct('n', a.n,
                          's', a.s + IF(a.prev IS NULL, 0L,
                               floor(CAST(a.run AS DOUBLE)
                                     * ln(CAST(a.run AS DOUBLE))
                                     * 10000 + 0.5))))
    """
    agg = (
        load(spark, sf_dir, "documents")
        .select("doc_id", F.expr(fold).alias("st"))
        .select(
            "doc_id",
            F.col("st.n").alias("n_tokens"),
            F.col("st.s").alias("s_e4"),
        )
    )
    entropy = F.log(F.col("n_tokens").cast("double")) - F.col("s_e4").cast(
        "double"
    ) / 10000.0 / F.col("n_tokens")
    return agg.select(
        "doc_id", "n_tokens", F.round(entropy, 4).alias("entropy")
    ).orderBy("doc_id")


@register(
    "text_repetition_dup_ngram",
    oracle_sql="""
        WITH t AS (
            SELECT doc_id, string_split(text, ' ') AS toks
            FROM documents
        ),
        g AS (
            SELECT doc_id,
                   toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2] AS gram
            FROM t, unnest(generate_series(1, len(toks) - 2)) AS u(i)
            WHERE len(toks) >= 3
        )
        SELECT doc_id,
               CAST(count(*) AS BIGINT) AS n_trigrams,
               CAST(count(DISTINCT gram) AS BIGINT) AS n_distinct,
               1.0 - CAST(count(DISTINCT gram) AS DOUBLE) / count(*)
                   AS dup_ratio
        FROM g
        GROUP BY doc_id
        ORDER BY doc_id
    """,
    description="Duplicate-trigram ratio per document — the Gopher "
    "repetition rule (high duplicate-n-gram fraction marks looping / "
    "template text that poisons LM training). Trigrams materialize "
    "per row with transform(sequence(...)) and dedup with "
    "array_distinct: a fully NARROW plan on the Spark side — zero "
    "shuffles, whole-stage-codegen, scans documents once. Counts are "
    "exact integers; the ratio is one division rounded 4dp.",
)
def text_repetition_dup_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("toks")
    )
    grams = F.transform(
        F.sequence(F.lit(0), F.size("toks") - 3),
        lambda i: F.concat_ws(
            " ",
            F.element_at("toks", i + 1),
            F.element_at("toks", i + 2),
            F.element_at("toks", i + 3),
        ),
    )
    sized = (
        docs.where(F.size("toks") >= 3)
        .select("doc_id", grams.alias("grams"))
        .select(
            "doc_id",
            F.size("grams").cast("long").alias("n_trigrams"),
            F.size(F.array_distinct("grams")).cast("long").alias("n_distinct"),
        )
    )
    ratio = 1.0 - F.col("n_distinct").cast("double") / F.col("n_trigrams")
    return sized.select(
        "doc_id",
        "n_trigrams",
        "n_distinct",
        # Unrounded rational of exact ints (half-boundary trap).
        ratio.alias("dup_ratio"),
    ).orderBy("doc_id")


@register(
    "dedup_minhash_est_error",
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
        est AS (
            SELECT c.doc_lo, c.doc_hi, count(*) AS n_match
            FROM cands c
            JOIN mh a ON a.doc_id = c.doc_lo
            JOIN mh b ON b.doc_id = c.doc_hi
                     AND b.i = a.i AND b.mhv = a.mhv
            GROUP BY 1, 2
        ),
        sz AS (SELECT doc_id, count(*) AS n FROM tok GROUP BY doc_id),
        exact AS (
            SELECT c.doc_lo, c.doc_hi, count(*) AS common
            FROM cands c
            JOIN tok ta ON ta.doc_id = c.doc_lo
            JOIN tok tb ON tb.doc_id = c.doc_hi AND tb.token = ta.token
            GROUP BY 1, 2
        ),
        scored AS (
            SELECT c.doc_lo, c.doc_hi,
                   CAST(coalesce(e.n_match, 0) AS BIGINT) AS n_match,
                   CAST(round(abs(
                       CAST(coalesce(e.n_match, 0) AS DOUBLE) / {N_HASHES}
                       - CAST(x.common AS DOUBLE)
                         / (sa.n + sb.n - x.common)) * 1000000)
                       AS BIGINT) AS abs_err_e6
            FROM cands c
            LEFT JOIN est e ON c.doc_lo = e.doc_lo AND c.doc_hi = e.doc_hi
            JOIN exact x ON c.doc_lo = x.doc_lo AND c.doc_hi = x.doc_hi
            JOIN sz sa ON c.doc_lo = sa.doc_id
            JOIN sz sb ON c.doc_hi = sb.doc_id
        )
        SELECT CAST(count(*) AS BIGINT) AS n_pairs,
               CAST(sum(abs_err_e6) AS DOUBLE) / count(*) / 1000000.0
                   AS mean_abs_err,
               CAST(max(abs_err_e6) AS DOUBLE) / 1000000.0
                   AS max_abs_err,
               CAST(sum(CASE WHEN n_match = {N_HASHES} THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_est_exact_dup
        FROM scored
    """,
    description="MinHash estimator error report: for every LSH band-"
    "bucket candidate pair, the sketch's Jaccard estimate (matching "
    "minhash coordinates / 16) is compared against the exact token-set "
    "Jaccard, reporting mean/max absolute error and the count of "
    "pairs the sketch calls identical — the honest-measurement loop "
    "for dedup_minhash_lsh (same role ann_recall_report plays for the "
    "ANN family): the sketch quality is itself a graded, hash-checked "
    "metric, not a claim. Candidates come from the band equality join "
    "(never all-pairs); per-pair errors quantize to the 1e-6 grid as "
    "BIGINTs so the aggregate is exact and order-independent.",
)
def dedup_minhash_est_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Round-12 re-plan (VERDICT r11 item 5). This corpus's 4-row band
    # signatures collide heavily (6.16M candidate pairs from 5000 docs
    # at sf0.1, max bucket 2510 docs), so the previous shape — joining
    # cands back to the mh table per COORDINATE (pair x 16 rows) and to
    # the token postings per TOKEN (pair x ~23 rows) — ran at 100M+
    # intermediate rows: the strict sweep's 1g-heap OOM at local[32]
    # (32 concurrent SMJ tasks) and an 85 s wall. Re-planned around two
    # facts: (1) sketch and token set are DOC-LOCAL, so they collapse
    # to doc-grain ARRAYS and per-pair statistics become JVM array ops
    # (zip_with equality count, array_intersect size) — candidate-pair
    # grain is never multiplied; (2) the signature ARRAY is the primary
    # artifact and band signatures are SLICES of it, so minhashing runs
    # once and bands derive by explode+slice instead of a second
    # aggregation over mh. The only multi-consumer node (sig, read by
    # the band derivation and the pair probe) is localCheckpoint-ed —
    # docs-grain, 16 ints/row, O(corpus) not O(pairs), the same
    # materialize-the-sketch step a production dedup pipeline persists.
    # Pair-side lookups hint shuffle_hash: the build side is docs-grain
    # (bounded per partition at any scale) and the 6.2M-row pair stream
    # side never sorts. Measured at sf0.1 local[32]: cold-session wall
    # 83.9 s -> 35.6 s (warm 13.2 s), and the vanilla DEFAULT-heap (1g)
    # session that OOM'd in the round-11 strict sweep now completes
    # green at ~800 MB peak (BASELINE.md round-12 addendum).
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
    side = sig.join(toks, "doc_id")
    pair = (
        cands.join(
            side.select(
                F.col("doc_id").alias("doc_lo"),
                F.col("sig_arr").alias("sig_lo"),
                F.col("tok_arr").alias("tok_lo"),
            ).hint("shuffle_hash"),
            "doc_lo",
        )
        .join(
            side.select(
                F.col("doc_id").alias("doc_hi"),
                F.col("sig_arr").alias("sig_hi"),
                F.col("tok_arr").alias("tok_hi"),
            ).hint("shuffle_hash"),
            "doc_hi",
        )
    )
    n_match = F.size(
        F.filter(
            F.zip_with("sig_lo", "sig_hi", lambda x_, y_: x_ == y_),
            lambda b: b,
        )
    )
    common = F.size(F.array_intersect("tok_lo", "tok_hi"))
    est_j = n_match.cast("double") / N_HASHES
    exact_j = common.cast("double") / (
        F.size("tok_lo") + F.size("tok_hi") - common
    )
    # ADVICE r12: the oracle's scored CTE INNER-joins the exact-Jaccard
    # side, which drops any candidate pair with zero common tokens — a
    # pair only LSH tid (md5-prefix) collisions could produce. Mirror
    # that inner-join semantics exactly rather than relying on the
    # fixture never containing such a collision.
    scored = pair.where(common >= 1).select(
        n_match.cast("long").alias("n_match"),
        F.floor(F.abs(est_j - exact_j) * 1000000 + 0.5)
        .cast("long")
        .alias("abs_err_e6"),
    )
    return scored.agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        # Unrounded rationals of exact e6-grid ints (half-boundary trap).
        (
            F.sum("abs_err_e6").cast("double")
            / F.count(F.lit(1))
            / 1000000.0
        ).alias("mean_abs_err"),
        (F.max("abs_err_e6").cast("double") / 1000000.0).alias(
            "max_abs_err"
        ),
        F.sum(
            F.when(F.col("n_match") == N_HASHES, 1).otherwise(0)
        )
        .cast("long")
        .alias("n_est_exact_dup"),
    )


@register(
    "sample_reservoir_per_key",
    oracle_sql=f"""
        SELECT lang, doc_id, CAST(rk AS BIGINT) AS rk
        FROM (
            SELECT lang, doc_id,
                   row_number() OVER (
                       PARTITION BY lang
                       ORDER BY md5(CAST(doc_id AS VARCHAR) || ':res'),
                                doc_id) AS rk
            FROM documents
        )
        WHERE rk <= {RESERVOIR_K}
        ORDER BY lang, rk
    """,
    description="Reservoir-equivalent per-key sampling: exactly "
    f"{RESERVOIR_K} uniform documents per language, selected by "
    "md5-hash rank instead of a sequential reservoir — the same "
    "marginal distribution, but membership is a pure function of "
    "(doc_id, salt): replayable on any partitioning, any engine, any "
    "day, and mergeable across corpus shards (a true reservoir's "
    "state depends on encounter order, which a distributed engine "
    "does not guarantee). One hash-rank window per language over a "
    "single shuffle.",
)
def sample_reservoir_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    h = F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":res")))
    w = Window.partitionBy("lang").orderBy(h, "doc_id")
    return (
        docs.select("lang", "doc_id", F.row_number().over(w).alias("rk"))
        .where(F.col("rk") <= RESERVOIR_K)
        .select("lang", "doc_id", F.col("rk").cast("long").alias("rk"))
        .orderBy("lang", "rk")
    )


@register(
    "corpus_source_quota_cap",
    oracle_sql=f"""
        WITH ranked AS (
            SELECT source, n_chars,
                   row_number() OVER (
                       PARTITION BY source
                       ORDER BY md5(CAST(doc_id AS VARCHAR) || ':quota'),
                                doc_id) AS rk
            FROM documents
        )
        SELECT source,
               CAST(count(*) AS BIGINT) AS n_total,
               CAST(sum(CASE WHEN rk <= {QUOTA_CAP} THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_kept,
               CAST(sum(CASE WHEN rk <= {QUOTA_CAP} THEN n_chars ELSE 0 END)
                    AS BIGINT) AS chars_kept
        FROM ranked
        GROUP BY source
        ORDER BY source
    """,
    description="Per-source quota enforcement: every source capped at "
    f"{QUOTA_CAP} documents chosen by deterministic hash rank — the "
    "domain-mix rebalancing step that stops one crawl domain from "
    "dominating the training mix (sample_domain_mix MEASURES the mix; "
    "this op ENFORCES it). Reports total vs kept docs and kept "
    "characters per source, all exact integers; selection is "
    "replayable under any partitioning because rank depends only on "
    "(doc_id, salt). One window + one aggregate on the source key.",
)
def corpus_source_quota_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    h = F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":quota")))
    w = Window.partitionBy("source").orderBy(h, "doc_id")
    kept = F.col("rk") <= QUOTA_CAP
    return (
        docs.select("source", "n_chars", F.row_number().over(w).alias("rk"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_total"),
            F.sum(F.when(kept, 1).otherwise(0)).cast("long").alias("n_kept"),
            F.sum(F.when(kept, F.col("n_chars")).otherwise(0))
            .cast("long")
            .alias("chars_kept"),
        )
        .orderBy("source")
    )


@register(
    "text_winsorize_quality",
    oracle_sql="""
        WITH clip AS (
            SELECT lang,
                   CAST(quantile_disc(n_chars, 0.05) AS BIGINT) AS p05,
                   CAST(quantile_disc(n_chars, 0.95) AS BIGINT) AS p95
            FROM documents GROUP BY lang
        )
        SELECT d.lang, c.p05, c.p95,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(least(greatest(d.n_chars, c.p05), c.p95))
                    AS DOUBLE) / count(*) AS avg_winsorized
        FROM documents d
        JOIN clip c ON d.lang = c.lang
        GROUP BY d.lang, c.p05, c.p95
        ORDER BY d.lang
    """,
    description="Winsorized length statistics per language: the 5th/"
    "95th percentile clip points (discrete percentiles on exact "
    "integer lengths — no interpolation, both engines pick the same "
    "member) computed per language, broadcast back, and the clipped "
    "mean reported — the outlier-robust document-length profile used "
    "to set corpus filtering thresholds without letting a few "
    "megadocs drag the mean. Two aggregates over one lang partition; "
    "clipped sum is exact, one final division.",
)
def text_winsorize_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    clip = docs.groupBy(F.col("lang").alias("c_lang")).agg(
        F.expr("percentile_disc(0.05) WITHIN GROUP (ORDER BY n_chars)")
        .cast("long")
        .alias("p05"),
        F.expr("percentile_disc(0.95) WITHIN GROUP (ORDER BY n_chars)")
        .cast("long")
        .alias("p95"),
    )
    clipped = F.least(F.greatest(F.col("n_chars"), F.col("p05")), F.col("p95"))
    return (
        docs.join(F.broadcast(clip), F.col("lang") == F.col("c_lang"))
        .groupBy("lang", "p05", "p95")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            # Unrounded rational of exact ints (half-boundary trap).
            (
                F.sum(clipped).cast("double") / F.count(F.lit(1))
            ).alias("avg_winsorized"),
        )
        .orderBy("lang")
    )


@register(
    "text_ngram_topk_per_lang",
    oracle_sql="""
        WITH t AS (
            SELECT doc_id, lang, string_split(text, ' ') AS toks
            FROM documents
        ),
        g AS (
            SELECT lang, toks[i] || ' ' || toks[i + 1] AS gram
            FROM t, unnest(generate_series(1, len(toks) - 1)) AS u(i)
            WHERE len(toks) >= 2
        ),
        cnt AS (
            SELECT lang, gram, CAST(count(*) AS BIGINT) AS cnt
            FROM g GROUP BY 1, 2
        )
        SELECT lang, gram, cnt, CAST(rk AS BIGINT) AS rk
        FROM (
            SELECT lang, gram, cnt,
                   row_number() OVER (
                       PARTITION BY lang ORDER BY cnt DESC, gram) AS rk
            FROM cnt
        )
        WHERE rk <= 5
        ORDER BY lang, rk
    """,
    description="Per-language vocabulary induction: the top-5 token "
    "bigrams by corpus frequency with a total-order tie-break — the "
    "first step of building a merged n-gram vocabulary / BPE seed per "
    "language. Bigrams materialize narrowly per row, the (lang, gram) "
    "count is map-side combined, and the top-k window runs over POST-"
    "aggregate rows (|distinct grams|, not |tokens|) partitioned by "
    "language.",
)
def text_ngram_topk_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").select(
        "lang", F.split("text", " ").alias("toks")
    )
    grams = F.transform(
        F.sequence(F.lit(0), F.size("toks") - 2),
        lambda i: F.concat_ws(
            " ", F.element_at("toks", i + 1), F.element_at("toks", i + 2)
        ),
    )
    cnt = (
        docs.where(F.size("toks") >= 2)
        .select("lang", F.explode(grams).alias("gram"))
        .groupBy("lang", "gram")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    w = Window.partitionBy("lang").orderBy(F.col("cnt").desc(), "gram")
    return (
        cnt.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 5)
        .select("lang", "gram", "cnt", F.col("rk").cast("long").alias("rk"))
        .orderBy("lang", "rk")
    )


@register(
    "corpus_quality_composite_filter",
    oracle_sql="""
        WITH scored AS (
            SELECT lang, n_chars,
                   len(string_split(text, ' ')) AS n_toks,
                   CASE
                       WHEN n_chars < 100 THEN 'too_short'
                       WHEN n_chars > 20000 THEN 'too_long'
                       WHEN len(string_split(text, ' ')) < 20
                           THEN 'too_few_tokens'
                       WHEN (n_chars - len(string_split(text, ' ')) + 1)
                            < 3 * len(string_split(text, ' '))
                           THEN 'short_words'
                       WHEN (n_chars - len(string_split(text, ' ')) + 1)
                            > 12 * len(string_split(text, ' '))
                           THEN 'long_words'
                       ELSE 'keep'
                   END AS verdict
            FROM documents
        )
        SELECT verdict, lang,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_chars) AS BIGINT) AS total_chars
        FROM scored
        GROUP BY 1, 2
        ORDER BY 1, 2
    """,
    description="Composite C4-style quality filter with reason codes: "
    "each document gets its FIRST failing rule (length bounds, "
    "minimum token count, mean-word-length band) or 'keep', and the "
    "report aggregates docs/chars per (verdict, lang) — the filter "
    "funnel dashboards every corpus pipeline needs to explain WHERE "
    "documents die. Mean word length compares via integer cross-"
    "multiplication (chars−toks+1 vs 3·toks / 12·toks) so no float "
    "touches a rule boundary; the whole op is one narrow projection "
    "plus one map-side-combined aggregate.",
)
def corpus_quality_composite_filter(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    n_toks = F.size(F.split("text", " "))
    letters = F.col("n_chars") - n_toks + 1  # chars minus the separators
    verdict = (
        F.when(F.col("n_chars") < 100, "too_short")
        .when(F.col("n_chars") > 20000, "too_long")
        .when(n_toks < 20, "too_few_tokens")
        .when(letters < 3 * n_toks, "short_words")
        .when(letters > 12 * n_toks, "long_words")
        .otherwise("keep")
    )
    return (
        docs.select("lang", "n_chars", verdict.alias("verdict"))
        .groupBy("verdict", "lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
        )
        .orderBy("verdict", "lang")
    )
