"""LLM-training-data-pipeline operators (SURVEY.md §2.10): text
analysis, near-duplicate detection, similarity search.

Scale design notes (the 100 TB story):
- ``dedup_near_jaccard`` uses a token-postings self-join blocked by
  language — O(Σ_token df(token)²) instead of the O(n²) crossJoin. The
  fixture vocabulary is tiny (31 tokens) which makes postings dense; on
  a real Zipfian corpus the head tokens would be dropped by a df-ceiling
  (stop-token pruning) and MinHash-LSH banding (see functions/text.py
  roadmap) bounds candidate pairs; the exact-Jaccard semantics graded
  here stay the verification oracle for those approximations.
- ``knn_cosine_topk`` broadcasts the query vector — a map-only scan
  (no shuffle) followed by TakeOrderedAndProject: the exact-brute-force
  baseline that an IVF/LSH-bucketed variant must match.
- ``knn_sim_join_blocked`` blocks the self-join on the label column
  (in production: an LSH bucket / IVF centroid id) so each block is
  small enough for a broadcast or co-partitioned join.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from etl_intraday_bidask_spark.functions.vector import as_double, cosine
from etl_intraday_bidask_spark.registry import register
from etl_intraday_bidask_spark.tables import load, view

JACCARD_THRESHOLD = 0.9  # validated on sf0.01: ≈2.5k pairs (fixtures §FIXTURES.md)
COSINE_THRESHOLD = 0.35  # validated on sf0.01: same-label cosines top out ≈0.55
KNN_TOP_K = 10  # k for the exact baseline; ANN variants match it (similarity.py)

# Module-level so similarity.ann_recall_report can compose the exact
# baseline by plain import (no registry lookup at import time).
KNN_COSINE_TOPK_SQL = f"""
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
        ORDER BY dot / (sqrt(na2) * sqrt(nb2)) DESC, vec_id
        LIMIT {KNN_TOP_K}
    """


@register(
    "text_term_docfreq",
    oracle_sql="""
        SELECT lang, token, count(DISTINCT doc_id) AS df
        FROM (
            SELECT doc_id, lang, unnest(string_split(text, ' ')) AS token
            FROM documents
        )
        GROUP BY lang, token
        ORDER BY lang, token
    """,
    description="Document frequency of each token per language — the "
    "tf-idf / stop-token-pruning building block.",
)
def text_term_docfreq(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return (
        docs.select(
            "doc_id", "lang", F.explode(F.split("text", " ")).alias("token")
        )
        .groupBy("lang", "token")
        .agg(F.countDistinct("doc_id").alias("df"))
        .orderBy("lang", "token")
    )


@register(
    "text_stats_multimodal",
    oracle_sql="""
        SELECT lang,
               source,
               count(*) AS n_docs,
               avg(n_chars) AS avg_chars,
               avg(len(string_split(text, ' '))) AS avg_tokens
        FROM documents
        GROUP BY lang, source
        ORDER BY lang, source
    """,
    description="Per-(lang, source) corpus stats: doc count, average "
    "characters, average whitespace-token count (quality-scoring input).",
)
def text_stats_multimodal(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return (
        docs.groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.avg("n_chars").alias("avg_chars"),
            F.avg(F.size(F.split("text", " "))).alias("avg_tokens"),
        )
        .orderBy("lang", "source")
    )


# Shared CTE list (no WITH keyword): distinct-unigram-token sets,
# postings self-join blocked by lang, exact Jaccard ≥ JACCARD_THRESHOLD.
# Used by the dedup_near_jaccard oracle and as the edge set of the
# dedup_connected_components oracle.
UNIGRAM_PAIRS_CTES = f"""
        tok AS (
            SELECT DISTINCT doc_id, lang,
                   unnest(string_split(text, ' ')) AS token
            FROM documents
        ),
        usz AS (SELECT doc_id, count(*) AS n FROM tok GROUP BY doc_id),
        upairs AS (
            SELECT a.doc_id AS doc_lo, b.doc_id AS doc_hi, count(*) AS c
            FROM tok a
            JOIN tok b
              ON a.token = b.token AND a.lang = b.lang AND a.doc_id < b.doc_id
            GROUP BY 1, 2
        ),
        uscored AS (
            SELECT doc_lo, doc_hi,
                   CAST(c AS DOUBLE) / (sa.n + sb.n - c) AS jac
            FROM upairs
            JOIN usz sa ON doc_lo = sa.doc_id
            JOIN usz sb ON doc_hi = sb.doc_id
            WHERE CAST(c AS DOUBLE) / (sa.n + sb.n - c) >= {JACCARD_THRESHOLD}
        )"""


@register(
    "dedup_near_jaccard",
    oracle_sql=f"""
        WITH {UNIGRAM_PAIRS_CTES}
        SELECT doc_lo, doc_hi, jac AS jaccard
        FROM uscored
        ORDER BY doc_lo, doc_hi
    """,
    description="Near-duplicate document pairs: exact Jaccard ≥ 0.9 over "
    "distinct-token sets, blocked by language, via a token-postings "
    "self-join (no O(n²) crossJoin). Emits (doc_lo, doc_hi, jaccard).",
)
def dedup_near_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id",
        "lang",
        F.explode(F.array_distinct(F.split("text", " "))).alias("token"),
    )
    # |distinct tokens| is doc-local: narrow size() on the doc row —
    # one docs-grain exchange fewer and no second aggregation pass
    # over the exploded postings.
    sz = docs.select(
        "doc_id",
        F.size(F.array_distinct(F.split("text", " ")))
        .cast("long")
        .alias("n"),
    )
    a = tok.alias("a")
    b = tok.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.token") == F.col("b.token"))
            & (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_lo"), F.col("b.doc_id").alias("doc_hi")
        )
        .agg(F.count(F.lit(1)).alias("c"))
    )
    sa = sz.alias("sa")
    sb = sz.alias("sb")
    jac = F.col("c") * 1.0 / (F.col("sa.n") + F.col("sb.n") - F.col("c"))
    # sz is corpus-grain (one row per doc): no broadcast hint — stats
    # auto-broadcast it at fixture SF, while at 100 TB the size lookup
    # must stay a distributed equi-join on doc_id (a forced broadcast
    # of a billion-doc side would OOM the driver).
    return (
        pairs.join(sa, F.col("doc_lo") == F.col("sa.doc_id"))
        .join(sb, F.col("doc_hi") == F.col("sb.doc_id"))
        .where(jac >= JACCARD_THRESHOLD)
        .select("doc_lo", "doc_hi", jac.alias("jaccard"))  # unrounded rational: half-boundary trap
        .orderBy("doc_lo", "doc_hi")
    )


NGRAM_JACCARD = 0.8  # validated on sf0.01: 6 planted pairs ≥0.9, rest <0.5

# Shared CTE list (no WITH keyword): token-bigram shingle sets, postings
# self-join blocked by lang, exact Jaccard ≥ NGRAM_JACCARD. Used by the
# dedup_ngram_jaccard oracle below and as the edge set of the
# dedup_connected_components oracle.
NGRAM_PAIRS_CTES = f"""
        t AS (
            SELECT doc_id, lang, string_split(text, ' ') AS toks
            FROM documents
        ),
        g AS (
            SELECT DISTINCT doc_id, lang,
                   toks[i] || ' ' || toks[i + 1] AS gram
            FROM t, unnest(generate_series(1, greatest(len(toks) - 1, 1)))
                    AS u(i)
            WHERE i + 1 <= len(toks)
        ),
        sz AS (SELECT doc_id, count(*) AS n FROM g GROUP BY doc_id),
        pairs AS (
            SELECT a.doc_id AS doc_lo, b.doc_id AS doc_hi, count(*) AS c
            FROM g a
            JOIN g b
              ON a.gram = b.gram AND a.lang = b.lang
             AND a.doc_id < b.doc_id
            GROUP BY 1, 2
        ),
        scored AS (
            SELECT doc_lo, doc_hi,
                   CAST(c AS DOUBLE) / (sa.n + sb.n - c) AS jac
            FROM pairs
            JOIN sz sa ON doc_lo = sa.doc_id
            JOIN sz sb ON doc_hi = sb.doc_id
            WHERE CAST(c AS DOUBLE) / (sa.n + sb.n - c) >= {NGRAM_JACCARD}
        )"""


@register(
    "dedup_ngram_jaccard",
    oracle_sql=f"""
        WITH {NGRAM_PAIRS_CTES}
        SELECT doc_lo, doc_hi, jac AS jaccard
        FROM scored
        ORDER BY doc_lo, doc_hi
    """,
    description="N-gram (token-bigram shingle) Jaccard near-dup: distinct "
    "word-2-gram sets per document, postings self-join blocked by lang, "
    "exact Jaccard ≥ 0.8. Order-sensitive where unigram Jaccard is not — "
    "shuffled token order destroys bigrams — and cheaper at scale: bigram "
    "document frequencies are far below unigram ones (sf0.01: max df 46 "
    "vs 500 docs), so the Σdf² postings-join work shrinks by orders of "
    "magnitude. This is the shingle construction MinHash signatures are "
    "built over at 100 TB.",
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    t = docs.select("doc_id", "lang", F.split("text", " ").alias("toks"))
    grams = F.when(
        F.size("toks") >= 2,
        F.expr(
            "transform(sequence(1, size(toks) - 1), "
            "i -> concat(element_at(toks, i), ' ', element_at(toks, i + 1)))"
        ),
    ).otherwise(F.expr("cast(array() as array<string>)"))
    g = t.select(
        "doc_id", "lang", F.explode(F.array_distinct(grams)).alias("gram")
    )
    # |distinct bigrams| is doc-local — computed narrowly on the doc
    # row instead of aggregating the exploded shingle postings.
    sz = t.select(
        "doc_id",
        F.size(F.array_distinct(grams)).cast("long").alias("n"),
    )
    a = g.alias("a")
    b = g.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.gram") == F.col("b.gram"))
            & (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_lo"), F.col("b.doc_id").alias("doc_hi")
        )
        .agg(F.count(F.lit(1)).alias("c"))
    )
    sa = sz.alias("sa")
    sb = sz.alias("sb")
    jac = F.col("c") * 1.0 / (F.col("sa.n") + F.col("sb.n") - F.col("c"))
    # Corpus-grain sz: no broadcast hint (see dedup_near_jaccard).
    return (
        pairs.join(sa, F.col("doc_lo") == F.col("sa.doc_id"))
        .join(sb, F.col("doc_hi") == F.col("sb.doc_id"))
        .where(jac >= NGRAM_JACCARD)
        .select("doc_lo", "doc_hi", jac.alias("jaccard"))  # unrounded rational: half-boundary trap
        .orderBy("doc_lo", "doc_hi")
    )


@register(
    "knn_cosine_topk",
    oracle_sql=KNN_COSINE_TOPK_SQL,
    description=f"Exact top-{KNN_TOP_K} cosine neighbors of vec_id=0 "
    "(self excluded): broadcast the query vector, map-only "
    "higher-order-fn cosine, TakeOrderedAndProject top-k. Baseline for "
    "ANN variants.",
)
def knn_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    # SQL-text body (round-8 dispatch-floor work, see
    # agg_pricing_summary): the higher-order-function cosine is the
    # same aggregate/zip_with fold functions/vector.py builds — one
    # parse round trip instead of ~80 py4j Column calls; the ORDER BY
    # ... LIMIT still compiles to TakeOrderedAndProject and the 1-row
    # query side still broadcasts.
    emb = view(spark, sf_dir, "embeddings")
    return spark.sql(f"""
        WITH e AS (
            SELECT vec_id, label,
                   CAST(embedding AS ARRAY<DOUBLE>) AS v
            FROM {emb}
        ),
        q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
        scored AS (
            SELECT /*+ BROADCAST(q) */ vec_id, label,
                   aggregate(zip_with(v, qv, (x, y) -> x * y), 0.0D,
                             (acc, x) -> acc + x)
                   / (SQRT(aggregate(v, 0.0D, (acc, x) -> acc + x * x))
                      * SQRT(aggregate(qv, 0.0D,
                                       (acc, x) -> acc + x * x)))
                       AS sim
            FROM e CROSS JOIN q
            WHERE vec_id != 0
        )
        SELECT vec_id, label, ROUND(sim, 4) AS cosine_sim
        FROM scored
        ORDER BY sim DESC, vec_id
        LIMIT {KNN_TOP_K}
    """)


@register(
    "knn_sim_join_blocked",
    oracle_sql=f"""
        WITH exp AS (
            SELECT vec_id, label,
                   generate_subscripts(embedding, 1) AS i,
                   CAST(unnest(embedding) AS DOUBLE) AS x
            FROM embeddings
        ),
        dots AS (
            SELECT a.vec_id AS a_id, b.vec_id AS b_id, a.label AS label,
                   sum(a.x * b.x) AS dot,
                   sum(a.x * a.x) AS na2,
                   sum(b.x * b.x) AS nb2
            FROM exp a
            JOIN exp b
              ON a.i = b.i AND a.label = b.label AND a.vec_id < b.vec_id
            GROUP BY 1, 2, 3
        )
        SELECT a_id, b_id, label,
               round(dot / (sqrt(na2) * sqrt(nb2)), 4) AS cosine_sim
        FROM dots
        WHERE dot / (sqrt(na2) * sqrt(nb2)) >= {COSINE_THRESHOLD}
        ORDER BY a_id, b_id
    """,
    description="Similarity self-join blocked on label: all same-label "
    "pairs with cosine ≥ 0.35. The label stands in for an LSH/IVF bucket "
    "id at scale — the join never leaves its block.",
)
def knn_sim_join_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id", "label", as_double("embedding").alias("v")
    )
    a = emb.alias("a")
    b = emb.alias("b")
    sim = cosine(F.col("a.v"), F.col("b.v"))
    return (
        a.join(
            b,
            (F.col("a.label") == F.col("b.label"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("a_id"),
            F.col("b.vec_id").alias("b_id"),
            F.col("a.label").alias("label"),
            F.round(sim, 4).alias("cosine_sim"),
            sim.alias("_raw_sim"),
        )
        .where(F.col("_raw_sim") >= COSINE_THRESHOLD)
        .drop("_raw_sim")
        .orderBy("a_id", "b_id")
    )


@register(
    "sample_domain_mix",
    oracle_sql="""
        WITH ranked AS (
            SELECT source, doc_id,
                   CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
                   row_number() OVER (
                       PARTITION BY source ORDER BY doc_id) AS rn,
                   CASE WHEN CAST(substring(source, 4) AS INT) < 10
                        THEN 2 ELSE 5 END AS rate
            FROM documents
        )
        SELECT source,
               count(*) AS docs_in,
               CAST(count(*) FILTER (WHERE rn % rate = 1) AS BIGINT)
                   AS docs_kept,
               CAST(coalesce(sum(n_tokens) FILTER (WHERE rn % rate = 1), 0)
                    AS BIGINT) AS tokens_kept
        FROM ranked
        GROUP BY source
        ORDER BY source
    """,
    description="Weighted domain mixing — the LLM training-data sampling "
    "op: each source stratum keeps a deterministic systematic fraction "
    "(1-in-2 for src0-src9, 1-in-5 for the rest) selected by rank within "
    "the stratum, reported as per-source docs in/kept and tokens kept. "
    "Deterministic modular selection replaces seeded Bernoulli sampling "
    "so both engines pick identical rows (and reruns are reproducible — "
    "a pipeline requirement). At 100 TB this is one window per stratum "
    "key; with a monotonic doc_id the rank can be replaced by "
    "doc_id % rate, removing even the window.",
)
def sample_domain_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load(spark, sf_dir, "documents")
    rate = F.when(
        F.substring("source", 4, 10).cast("int") < 10, F.lit(2)
    ).otherwise(F.lit(5))
    w = Window.partitionBy("source").orderBy("doc_id")
    ranked = docs.select(
        "source",
        "doc_id",
        F.size(F.split("text", " ")).cast("bigint").alias("n_tokens"),
        F.row_number().over(w).alias("rn"),
        rate.alias("rate"),
    )
    kept = (F.col("rn") % F.col("rate") == 1).cast("bigint")
    return (
        ranked.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("docs_in"),
            F.sum(kept).cast("bigint").alias("docs_kept"),
            F.coalesce(F.sum(F.when(F.col("rn") % F.col("rate") == 1,
                                    F.col("n_tokens"))), F.lit(0))
            .cast("bigint")
            .alias("tokens_kept"),
        )
        .orderBy("source")
    )


@register(
    "text_redact_pii",
    oracle_sql="""
        SELECT
            c_custkey,
            regexp_replace(c_name, '[0-9]+', '<NUM>', 'g') AS name_redacted,
            CAST(len(regexp_extract_all(c_name, '[0-9]+')) AS BIGINT)
                AS n_redactions,
            md5(regexp_replace(c_name, '[0-9]+', '<NUM>', 'g'))
                AS redacted_hash
        FROM customer
        ORDER BY c_custkey
    """,
    description="PII-style redaction pass over the customer dimension: "
    "digit runs in c_name replaced by a <NUM> placeholder, per-row "
    "redaction count, and an md5 of the redacted form (the content key "
    "a scrubbed corpus dedups on). The same regexp_replace shape handles "
    "emails/phones at ingest; pure narrow JVM transforms, no shuffle, "
    "fully pushdown-friendly at lake scale.",
)
def text_redact_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    redacted = F.regexp_replace("c_name", "[0-9]+", "<NUM>")
    return cust.select(
        "c_custkey",
        redacted.alias("name_redacted"),
        F.size(F.regexp_extract_all("c_name", F.lit("[0-9]+"), 0))
        .cast("bigint")
        .alias("n_redactions"),
        F.md5(redacted).alias("redacted_hash"),
    ).orderBy("c_custkey")


@register(
    "dedup_connected_components",
    oracle_sql=f"""
        WITH RECURSIVE {UNIGRAM_PAIRS_CTES},
        edges AS (
            SELECT doc_lo AS src, doc_hi AS dst FROM uscored
            UNION ALL
            SELECT doc_hi AS src, doc_lo AS dst FROM uscored
        ),
        nodes AS (SELECT DISTINCT src AS doc_id FROM edges),
        reach(a, b) AS (
            SELECT doc_id, doc_id FROM nodes
            UNION
            SELECT r.a, e.dst FROM reach r JOIN edges e ON r.b = e.src
        ),
        comp AS (SELECT a AS doc_id, min(b) AS component FROM reach GROUP BY a),
        sizes AS (SELECT component, count(*) AS n_members
                  FROM comp GROUP BY component)
        SELECT c.doc_id, c.component, s.n_members
        FROM comp c JOIN sizes s ON c.component = s.component
        ORDER BY c.doc_id
    """,
    description="Duplicate-cluster assignment: connected components over "
    "the near-dup pair graph (unigram Jaccard ≥ 0.9 edges — at sf0.01 a "
    "2.4k-edge graph whose largest cluster has 95 docs, so transitivity "
    "genuinely matters), mapping each document to a canonical component "
    "id (the cluster's minimum doc_id) — the step after pairwise dedup "
    "that real pipelines need to keep ONE representative per duplicate "
    "cluster rather than dropping both ends of every pair. Implemented "
    "as distributed min-label propagation: labels start as doc_id and "
    "each iteration takes the min over neighbors (one equi join + one "
    "groupBy per iteration, lineage truncated via localCheckpoint), "
    "converging in graph-diameter iterations to an exact fixpoint "
    "checked with a per-iteration count. At 100 TB the same loop is the "
    "standard alternating large-star/small-star formulation (Kiveris et "
    "al., 'Connected Components in MapReduce'); the oracle computes the "
    "same fixpoint via a recursive transitive-closure CTE.",
)
def dedup_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_intraday_bidask_spark.registry import REGISTRY

    pairs = (
        REGISTRY["dedup_near_jaccard"]
        .spark_fn(spark, sf_dir)
        .select("doc_lo", "doc_hi")
    )
    edges = (
        pairs.select(F.col("doc_lo").alias("src"), F.col("doc_hi").alias("dst"))
        .unionByName(
            pairs.select(
                F.col("doc_hi").alias("src"), F.col("doc_lo").alias("dst")
            )
        )
        .localCheckpoint()  # pairs plan is re-used every iteration
    )
    labels = (
        edges.select(F.col("src").alias("doc_id"))
        .distinct()
        .withColumn("label", F.col("doc_id"))
    )
    # Same cap rationale as graph_component_size_histogram: plain
    # min-neighbor propagation is O(diameter) rounds, so a chain-shaped
    # input would spin unboundedly; 200 rounds is far past any shingle
    # near-dup cluster's diameter, and hitting the cap means the input
    # needs the large-star/small-star contraction, not more rounds.
    for _ in range(200):
        nmin = (
            edges.join(labels, edges.dst == labels.doc_id)
            .groupBy("src")
            .agg(F.min("label").alias("nmin"))
        )
        new_labels = (
            labels.join(nmin, labels.doc_id == nmin.src, "left")
            .select(
                "doc_id",
                F.least(
                    F.col("label"), F.coalesce("nmin", F.col("label"))
                ).alias("label"),
            )
            .localCheckpoint()  # truncate iterative lineage
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "doc_id")
            .where(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    else:
        raise RuntimeError(
            "dedup_connected_components: min-label propagation did not "
            "converge in 200 rounds (graph diameter > 200); this input "
            "needs the large-star/small-star contraction"
        )
    sizes = labels.groupBy("label").agg(F.count(F.lit(1)).alias("n_members"))
    # sizes is component-grain — worst case ~one component per doc, so
    # it scales with the corpus: no broadcast hint, the label equi-join
    # distributes (and reuses labels' hash partitioning from the agg).
    return (
        labels.join(sizes, "label")
        .select(
            "doc_id", F.col("label").alias("component"), "n_members"
        )
        .orderBy("doc_id")
    )


@register(
    "dedup_keep_canonical",
    oracle_sql=f"""
        WITH RECURSIVE {UNIGRAM_PAIRS_CTES},
        edges AS (
            SELECT doc_lo AS src, doc_hi AS dst FROM uscored
            UNION ALL
            SELECT doc_hi AS src, doc_lo AS dst FROM uscored
        ),
        nodes AS (SELECT DISTINCT src AS doc_id FROM edges),
        reach(a, b) AS (
            SELECT doc_id, doc_id FROM nodes
            UNION
            SELECT r.a, e.dst FROM reach r JOIN edges e ON r.b = e.src
        ),
        comp AS (SELECT a AS doc_id, min(b) AS component FROM reach GROUP BY a),
        ranked AS (
            SELECT c.component, c.doc_id, d.n_chars,
                   count(*) OVER (PARTITION BY c.component) AS n_members,
                   row_number() OVER (
                       PARTITION BY c.component
                       ORDER BY d.n_chars DESC, c.doc_id
                   ) AS rn
            FROM comp c JOIN documents d ON c.doc_id = d.doc_id
        )
        SELECT component,
               doc_id AS kept_doc,
               n_chars AS kept_chars,
               n_members
        FROM ranked
        WHERE rn = 1
        ORDER BY component
    """,
    description="Canonical-representative selection: within each near-"
    "duplicate cluster (the connected components of the unigram Jaccard "
    "graph) keep exactly one document — the longest, ties to the lowest "
    "doc_id. This is the survivor-pick that completes the dedup "
    "pipeline: pairwise detection → cluster assignment → ONE kept doc "
    "per cluster (keeping the most complete copy, not an arbitrary "
    "pair endpoint). One window over the tiny component relation after "
    "the propagation loop; the documents join is broadcast-size here "
    "and key-partitioned at lake scale.",
)
def dedup_keep_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from etl_intraday_bidask_spark.registry import REGISTRY

    comp = REGISTRY["dedup_connected_components"].spark_fn(spark, sf_dir)
    docs = load(spark, sf_dir, "documents").select("doc_id", "n_chars")
    w = Window.partitionBy("component").orderBy(
        F.col("n_chars").desc(), F.col("doc_id")
    )
    return (
        comp.join(docs, "doc_id")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "component",
            F.col("doc_id").alias("kept_doc"),
            F.col("n_chars").alias("kept_chars"),
            "n_members",
        )
        .orderBy("component")
    )


@register(
    "dedup_prefix_filter_jaccard",
    oracle_sql=f"""
        WITH {UNIGRAM_PAIRS_CTES}
        SELECT doc_lo, doc_hi, jac AS jaccard
        FROM uscored
        ORDER BY doc_lo, doc_hi
    """,
    description="PPJoin-style prefix-filtered similarity join: instead "
    "of indexing EVERY token (the dedup_near_jaccard postings join), "
    "each document indexes only its n − ceil(0.9·n) + 1 globally "
    "rarest tokens — the prefix-filtering theorem guarantees any pair "
    "with Jaccard ≥ 0.9 still shares an indexed token, so candidate "
    "generation shrinks ~8× while staying complete. Candidates are "
    "then exact-verified on full token sets. The oracle is the NAIVE "
    "full postings join: the hash match is a machine-checked proof "
    "that the optimization loses no pairs on this corpus. At 100 TB "
    "prefix filtering is the difference between indexing the corpus "
    "and indexing ~a tenth of it, with the same answer.",
)
def dedup_prefix_filter_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id",
        "lang",
        F.explode(F.array_distinct(F.split("text", " "))).alias("token"),
    )
    dfreq = tok.groupBy("lang", "token").agg(
        F.count(F.lit(1)).alias("dfreq")
    )
    wd = Window.partitionBy("doc_id").orderBy("dfreq", "token")
    wn = Window.partitionBy("doc_id")
    ranked = tok.join(dfreq, ["lang", "token"]).select(
        "doc_id",
        "lang",
        "token",
        F.row_number().over(wd).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    prefix = ranked.filter(
        F.col("rn") <= F.col("n") - F.expr("(9 * n + 9) div 10") + 1
    ).select("doc_id", "lang", "token")
    pa = prefix.alias("pa")
    pb = prefix.alias("pb")
    cand = (
        pa.join(
            pb,
            (F.col("pa.token") == F.col("pb.token"))
            & (F.col("pa.lang") == F.col("pb.lang"))
            & (F.col("pa.doc_id") < F.col("pb.doc_id")),
        )
        .select(
            F.col("pa.doc_id").alias("doc_lo"),
            F.col("pb.doc_id").alias("doc_hi"),
        )
        .distinct()
    )
    # Round-12 re-plan (SCALE.md §34, the pair-grain multiplication
    # class): 2.86M candidate pairs survive the prefix filter at sf0.1,
    # and the old exact-verify re-expanded them to (pair x ~23 token)
    # grain (~66M intermediate rows). Verification now scores at PAIR
    # grain: candidates join doc-grain token ARRAYS (shuffle-hash —
    # build side docs-grain, the pair stream never sorts) and the
    # intersection is a JVM array op. Candidates already require equal
    # lang, so full-array intersect equals the old per-(token, lang)
    # match count.
    toks = docs.select(
        "doc_id", F.array_distinct(F.split("text", " ")).alias("tok_arr")
    )
    pair = (
        cand.join(
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
    c = F.size(F.array_intersect("tok_lo", "tok_hi"))
    jac = c * 1.0 / (F.size("tok_lo") + F.size("tok_hi") - c)
    return (
        pair.where(jac >= JACCARD_THRESHOLD)
        .select("doc_lo", "doc_hi", jac.alias("jaccard"))  # unrounded rational: half-boundary trap
        .orderBy("doc_lo", "doc_hi")
    )
