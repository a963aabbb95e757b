"""STAGED round-11 operators (wave G seeds) — implemented and
parity-tested, NOT registered, NOT part of the wave B-F windows
(rounds 6-10). Same staging contract as staged_r6..r10: own
``STAGED_R11`` dict + leak guard (tests/test_staged_r11.py).

Seed themes: behavioral segment migration, cross-split language-model
evaluation, recursive changepoint segmentation — continuations of the
RFM, bigram-LM, and binseg families with the next level of structure.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from etl_intraday_bidask_spark.functions.parity import scaled_long
from etl_intraday_bidask_spark.registry import QuerySpec, SparkFn
from etl_intraday_bidask_spark.tables import load

STAGED_R11: dict[str, QuerySpec] = {}


def staged11(name: str, oracle_sql: str | None, description: str = ""):
    def deco(fn: SparkFn) -> SparkFn:
        STAGED_R11[name] = QuerySpec(name, fn, oracle_sql, description)
        return fn

    return deco


@staged11(
    "orders_rfm_migration_matrix",
    oracle_sql="""
        WITH spend AS (
            SELECT o_custkey,
                   CAST(year(o_orderdate) AS BIGINT) AS y,
                   CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                        AS BIGINT) AS cents
            FROM orders
            WHERE year(o_orderdate) IN (1995, 1996)
            GROUP BY o_custkey, y
        ), tiered AS (
            SELECT o_custkey, y,
                   ntile(3) OVER (PARTITION BY y
                       ORDER BY cents, o_custkey) AS tier
            FROM spend
        ), matrix AS (
            SELECT coalesce(a.tier, 0) AS tier_1995,
                   coalesce(b.tier, 0) AS tier_1996,
                   CAST(count(*) AS BIGINT) AS n_customers
            FROM (SELECT o_custkey, tier FROM tiered WHERE y = 1995) a
            FULL OUTER JOIN
                 (SELECT o_custkey, tier FROM tiered WHERE y = 1996) b
              ON a.o_custkey = b.o_custkey
            GROUP BY 1, 2
        )
        SELECT CAST(tier_1995 AS BIGINT) AS tier_1995,
               CAST(tier_1996 AS BIGINT) AS tier_1996,
               n_customers
        FROM matrix ORDER BY tier_1995, tier_1996
    """,
    description="Value-tier migration matrix 1995 -> 1996: customers "
    "terciled by annual spend within each year (ntile, custkey tie-"
    "break — SQL-standard distribution both engines), full-outer-"
    "joined so entrants (tier 0 -> t) and churners (t -> tier 0) "
    "appear as first-class matrix cells — the segment-flow view "
    "orders_rfm_segments' static snapshot cannot show (is the top "
    "tier stable or churning?; the revenue-bridge op shows the "
    "MONEY flow, this shows the PEOPLE flow). Two bounded windows + "
    "one key join.",
)
def orders_rfm_migration_matrix(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    spend = (
        load(spark, sf_dir, "orders")
        .where(F.year("o_orderdate").isin(1995, 1996))
        .groupBy(
            "o_custkey", F.year("o_orderdate").cast("long").alias("y")
        )
        .agg(F.sum(scaled_long("o_totalprice", 100)).alias("cents"))
    )
    tiered = spend.select(
        "o_custkey",
        "y",
        F.ntile(3)
        .over(
            Window.partitionBy("y").orderBy("cents", "o_custkey")
        )
        .alias("tier"),
    )
    a = tiered.where(F.col("y") == 1995).select(
        F.col("o_custkey").alias("ka"), F.col("tier").alias("ta")
    )
    b = tiered.where(F.col("y") == 1996).select(
        F.col("o_custkey").alias("kb"), F.col("tier").alias("tb")
    )
    matrix = (
        a.join(b, a.ka == b.kb, "full_outer")
        .select(
            F.coalesce(F.col("ta"), F.lit(0)).alias("tier_1995"),
            F.coalesce(F.col("tb"), F.lit(0)).alias("tier_1996"),
        )
        .groupBy("tier_1995", "tier_1996")
        .agg(F.count(F.lit(1)).cast("long").alias("n_customers"))
    )
    return matrix.select(
        F.col("tier_1995").cast("long").alias("tier_1995"),
        F.col("tier_1996").cast("long").alias("tier_1996"),
        "n_customers",
    ).orderBy("tier_1995", "tier_1996")


@staged11(
    "text_bigram_xent_split",
    oracle_sql="""
        WITH split AS (
            SELECT doc_id, text,
                   (doc_id * 48271) % 2147483647 % 10 < 8 AS is_train
            FROM documents
        ), toks AS (
            SELECT doc_id, is_train, string_split(text, ' ') AS t
            FROM split WHERE len(string_split(text, ' ')) >= 2
        ), bigrams AS (
            SELECT doc_id, is_train,
                   t[i] AS w1, t[i + 1] AS w2
            FROM toks, unnest(generate_series(1, len(t) - 1)) AS u(i)
        ), lm_bi AS (
            SELECT w1, w2, CAST(count(*) AS BIGINT) AS c2
            FROM bigrams WHERE is_train GROUP BY w1, w2
        ), lm_uni AS (
            SELECT w1, CAST(sum(c2) AS BIGINT) AS c1,
                   CAST(count(*) AS BIGINT) AS fanout
            FROM lm_bi GROUP BY w1
        ), test_scored AS (
            SELECT b.w1, b.w2,
                   CASE WHEN u.c1 IS NULL THEN NULL ELSE
                       CAST(floor(ln(
                           CAST(u.c1 + u.fanout AS DOUBLE)
                           / (coalesce(l.c2, 0) + 1)) * 1000000 + 0.5)
                           AS BIGINT)
                   END AS nll_ppm
            FROM bigrams b
            LEFT JOIN lm_uni u ON b.w1 = u.w1
            LEFT JOIN lm_bi l ON b.w1 = l.w1 AND b.w2 = l.w2
            WHERE NOT b.is_train
        )
        SELECT CAST(count(*) AS BIGINT) AS n_test_bigrams,
               CAST(count(nll_ppm) AS BIGINT) AS n_scored,
               CAST(count(*) - count(nll_ppm) AS BIGINT)
                   AS n_unseen_context,
               CAST(sum(nll_ppm) AS BIGINT) AS nll_sum_ppm,
               CAST(sum(nll_ppm) // nullif(count(nll_ppm), 0)
                    AS BIGINT) AS mean_nll_floor_ppm
        FROM test_scored
    """,
    description="Cross-split bigram cross-entropy: an add-one-"
    "smoothed bigram LM estimated on the 80% train split scores the "
    "20% test split — per test bigram, NLL = ln((c1 + V_w1)/(c2 + "
    "1)) with the train-side counts, quantized to ppm per term "
    "before summing (the float-crossing rule), unseen CONTEXTS "
    "(w1 absent from train) counted separately rather than "
    "back-off-faked — the held-out evaluation text_bigram_logprob's "
    "in-corpus scoring lacks, and the quantitative companion to "
    "text_oov_rate_split (OOV counts words; this prices them). "
    "Postings joins on the gram keys; smoothing denominator uses "
    "per-context fanout (observed-type smoothing), identical CTEs "
    "both engines.",
)
def text_bigram_xent_split(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    split = load(spark, sf_dir, "documents").select(
        "doc_id",
        "text",
        ((F.col("doc_id") * 48271) % 2147483647 % 10 < 8).alias(
            "is_train"
        ),
    )
    toks = split.select(
        "is_train", F.split("text", " ").alias("t")
    ).where(F.size("t") >= 2)
    bigrams = toks.select(
        "is_train",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("t") - 1),
                lambda i: F.struct(
                    F.element_at(F.col("t"), i).alias("w1"),
                    F.element_at(F.col("t"), i + 1).alias("w2"),
                ),
            )
        ).alias("bg"),
    ).select("is_train", F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
    lm_bi = (
        bigrams.where(F.col("is_train"))
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).cast("long").alias("c2"))
    )
    lm_uni = lm_bi.groupBy("w1").agg(
        F.sum("c2").cast("long").alias("c1"),
        F.count(F.lit(1)).cast("long").alias("fanout"),
    )
    test = bigrams.where(~F.col("is_train"))
    scored = (
        test.join(
            lm_uni.withColumnRenamed("w1", "uw1"),
            test.w1 == F.col("uw1"),
            "left",
        )
        .join(
            lm_bi.withColumnRenamed("w1", "bw1").withColumnRenamed(
                "w2", "bw2"
            ),
            (F.col("w1") == F.col("bw1")) & (F.col("w2") == F.col("bw2")),
            "left",
        )
        .select(
            F.when(
                F.col("c1").isNotNull(),
                F.floor(
                    F.log(
                        (F.col("c1") + F.col("fanout")).cast("double")
                        / (F.coalesce(F.col("c2"), F.lit(0)) + 1)
                    )
                    * 1000000
                    + 0.5
                ).cast("long"),
            ).alias("nll_ppm")
        )
    )
    return scored.agg(
        F.count(F.lit(1)).cast("long").alias("n_test_bigrams"),
        F.count("nll_ppm").cast("long").alias("n_scored"),
        (F.count(F.lit(1)) - F.count("nll_ppm"))
        .cast("long")
        .alias("n_unseen_context"),
        F.sum("nll_ppm").cast("long").alias("nll_sum_ppm"),
        F.expr("sum(nll_ppm) div nullif(count(nll_ppm), 0)")
        .cast("long")
        .alias("mean_nll_floor_ppm"),
    )


@staged11(
    "ts_changepoint_two_level",
    oracle_sql="""
        WITH daily AS (
            SELECT date_trunc('day', ts) AS d,
                   CAST(count(*) AS BIGINT) AS y
            FROM events GROUP BY d
        ), cum AS (
            SELECT d, y,
                   CAST(row_number() OVER (ORDER BY d) AS BIGINT) AS i,
                   CAST(sum(y) OVER (ORDER BY d) AS BIGINT) AS cy,
                   CAST(count(*) OVER () AS BIGINT) AS n,
                   CAST(sum(y) OVER () AS BIGINT) AS ty
            FROM daily
        ), best1 AS (
            SELECT i AS split1 FROM (
                SELECT i,
                       row_number() OVER (ORDER BY
                           (cy * (n - i) - (ty - cy) * i)
                           * (cy * (n - i) - (ty - cy) * i)
                           // (i * (n - i)) DESC, d) AS rk
                FROM cum WHERE i < n
            ) WHERE rk = 1
        ), seg AS (
            SELECT c.d, c.y, c.i,
                   CASE WHEN c.i <= b.split1 THEN 0 ELSE 1 END AS side
            FROM cum c, best1 b
        ), seg_cum AS (
            SELECT side, d, y,
                   CAST(row_number() OVER (PARTITION BY side
                       ORDER BY d) AS BIGINT) AS j,
                   CAST(sum(y) OVER (PARTITION BY side ORDER BY d)
                        AS BIGINT) AS cy,
                   CAST(count(*) OVER (PARTITION BY side) AS BIGINT)
                       AS m,
                   CAST(sum(y) OVER (PARTITION BY side) AS BIGINT)
                       AS sy
            FROM seg
        ), best2 AS (
            SELECT side, d, j, score FROM (
                SELECT side, d, j,
                       (cy * (m - j) - (sy - cy) * j)
                       * (cy * (m - j) - (sy - cy) * j)
                       // (j * (m - j)) AS score,
                       row_number() OVER (PARTITION BY side ORDER BY
                           (cy * (m - j) - (sy - cy) * j)
                           * (cy * (m - j) - (sy - cy) * j)
                           // (j * (m - j)) DESC, d) AS rk
                FROM seg_cum WHERE j < m
            ) WHERE rk = 1
        )
        SELECT CAST(side AS BIGINT) AS segment_side,
               CAST(epoch_us(d) AS BIGINT) AS split_day_us,
               CAST(j AS BIGINT) AS offset_in_segment,
               CAST(score AS BIGINT) AS score_scaled
        FROM best2 ORDER BY segment_side
    """,
    description="Two-level binary segmentation: the level-1 "
    "changepoint (ts_changepoint_binseg's exact cross-multiplied "
    "score) splits the daily series, then EACH half runs the same "
    "argmax independently — the documented recursion realized one "
    "level deeper, yielding the 3-segment structure (e.g. "
    "ramp-up / plateau / decay) a single split can't express. All "
    "scores exact integers; per-side windows partition by segment, "
    "so level-2 is embarrassingly parallel — exactly how recursive "
    "binseg distributes (each level is one partitioned pass, "
    "log-depth total). Date tie-breaks at both levels.",
)
def ts_changepoint_two_level(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    daily = (
        load(spark, sf_dir, "events")
        .groupBy(F.date_trunc("day", "ts").alias("d"))
        .agg(F.count(F.lit(1)).cast("long").alias("y"))
    )
    w = Window.orderBy("d")
    wall = Window.partitionBy()
    cum = daily.select(
        "d",
        "y",
        F.row_number().over(w).cast("long").alias("i"),
        F.sum("y")
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("cy"),
        F.count(F.lit(1)).over(wall).cast("long").alias("n"),
        F.sum("y").over(wall).alias("ty"),
    )
    score1 = F.expr(
        "(cy * (n - i) - (ty - cy) * i) "
        "* (cy * (n - i) - (ty - cy) * i) div (i * (n - i))"
    )
    best1 = (
        cum.where(F.col("i") < F.col("n"))
        .select(
            "i",
            F.row_number()
            .over(Window.orderBy(score1.desc(), "d"))
            .alias("rk"),
        )
        .where(F.col("rk") == 1)
        .select(F.col("i").alias("split1"))
    )
    seg = cum.crossJoin(F.broadcast(best1)).select(
        "d",
        "y",
        F.when(F.col("i") <= F.col("split1"), 0).otherwise(1).alias(
            "side"
        ),
    )
    ws = Window.partitionBy("side").orderBy("d")
    wside = Window.partitionBy("side")
    seg_cum = seg.select(
        "side",
        "d",
        "y",
        F.row_number().over(ws).cast("long").alias("j"),
        F.sum("y")
        .over(ws.rowsBetween(Window.unboundedPreceding, 0))
        .alias("cy"),
        F.count(F.lit(1)).over(wside).cast("long").alias("m"),
        F.sum("y").over(wside).alias("sy"),
    )
    score2 = F.expr(
        "(cy * (m - j) - (sy - cy) * j) "
        "* (cy * (m - j) - (sy - cy) * j) div (j * (m - j))"
    )
    best2 = (
        seg_cum.where(F.col("j") < F.col("m"))
        .select(
            "side",
            "d",
            "j",
            score2.alias("score"),
            F.row_number()
            .over(
                Window.partitionBy("side").orderBy(
                    score2.desc(), "d"
                )
            )
            .alias("rk"),
        )
        .where(F.col("rk") == 1)
    )
    return best2.select(
        F.col("side").cast("long").alias("segment_side"),
        F.unix_micros("d").alias("split_day_us"),
        F.col("j").alias("offset_in_segment"),
        F.col("score").cast("long").alias("score_scaled"),
    ).orderBy("segment_side")
