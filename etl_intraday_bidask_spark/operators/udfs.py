"""UDF / UDAF / UDTF surface (SURVEY.md §2.11).

UDFs are the slow path — everything else in this engine stays JVM-side.
These three operators exist to grade the Python-boundary plumbing itself:

- a scalar ``pandas_udf`` (Arrow-batched, vectorized — the only
  acceptable scalar-UDF form in the hot path; a row-at-a-time ``@udf``
  twin is tested for API parity in tests but not graded);
- ``applyInPandas`` grouped transform (the UDAF/cogroup surface) — each
  group becomes one pandas DataFrame in a Python worker; partitioning is
  the groupBy hash shuffle, so group count scales out but a single giant
  group is the skew hazard (fixtures: ≤ a few hundred events per user);
- a table function via ``posexplode`` (row → n rows), the codegen'd
  equivalent of an explode-like UDTF.

Float discipline: all Python-side math is float64 == JVM double ==
DuckDB DOUBLE; z-scores use population stddev on both sides and round
to 4 dp (SURVEY.md M5).
"""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType

from etl_intraday_bidask_spark.registry import register
from etl_intraday_bidask_spark.tables import load


# DoubleType() (not the DDL string "double") so the UDF can be defined at
# import time, before any SparkSession exists.
@pandas_udf(DoubleType())
def clamped_spread_score(value: pd.Series, k: pd.Series) -> pd.Series:
    """Vectorized scalar UDF: value scaled by the JSON ``k`` property,
    clamped to [0, 100] — an Arrow batch in, an Arrow batch out."""
    return (value * k / 10.0).clip(lower=0.0, upper=100.0)


@register(
    "udf_python_scalar",
    oracle_sql="""
        SELECT event_id,
               round(least(greatest(
                   value * CAST(json_extract_string(props, '$.k') AS INT) / 10.0,
                   0.0), 100.0), 4) AS score
        FROM events
        ORDER BY event_id
    """,
    description="Arrow-batched scalar pandas UDF computing a clamped "
    "spread score from value × props.k; oracle is the same arithmetic "
    "inline. Grades the Python↔JVM Arrow boundary.",
)
def udf_python_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int").cast("double")
    return ev.select(
        "event_id",
        F.round(clamped_spread_score(F.col("value"), k), 4).alias("score"),
    ).orderBy("event_id")


def _zscore_group(pdf: pd.DataFrame) -> pd.DataFrame:
    """Per-user z-score of value (population stddev), computed in pandas."""
    mean = pdf["value"].mean()
    std = pdf["value"].std(ddof=0)  # population stddev == stddev_pop
    z = (pdf["value"] - mean) / std if std > 0 else pd.Series(
        [float("nan")] * len(pdf), index=pdf.index
    )
    return pd.DataFrame(
        {"event_id": pdf["event_id"], "user_id": pdf["user_id"], "z": z.round(4)}
    )


@register(
    "udaf_grouped_pandas",
    oracle_sql="""
        SELECT event_id,
               user_id,
               round((value - avg(value) OVER w) / stddev_pop(value) OVER w,
                     4) AS z
        FROM events
        WINDOW w AS (PARTITION BY user_id)
        ORDER BY event_id
    """,
    description="Grouped-map applyInPandas: per-user z-score of value "
    "(population stddev). One pandas frame per user group in a Python "
    "worker; oracle is the equivalent window SQL.",
)
def udaf_grouped_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select("event_id", "user_id", "value")
    return (
        ev.groupBy("user_id")
        .applyInPandas(_zscore_group, "event_id long, user_id long, z double")
        .orderBy("event_id")
    )


@register(
    "udtf_explode_like",
    oracle_sql="""
        SELECT doc_id,
               CAST(generate_subscripts(string_split(text, ' '), 1) - 1
                    AS BIGINT) AS pos,
               unnest(string_split(text, ' ')) AS token
        FROM documents
        WHERE doc_id < 50
        ORDER BY doc_id, pos
    """,
    description="Table function (one row → n rows): token positions per "
    "document via posexplode — the codegen'd explode-like UDTF shape.",
)
def udtf_explode_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return (
        docs.where(F.col("doc_id") < 50)
        .select(
            "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "token")
        )
        .select("doc_id", F.col("pos").cast("bigint"), "token")
        .orderBy("doc_id", "pos")
    )


@register(
    "udtf_python_ngrams",
    oracle_sql="""
        WITH tok AS (
            SELECT doc_id,
                   generate_subscripts(string_split(text, ' '), 1) - 1 AS pos,
                   unnest(string_split(text, ' ')) AS token
            FROM documents
            WHERE doc_id < 20
        )
        SELECT a.doc_id,
               CAST(a.pos AS INT) AS pos,
               a.token || ' ' || b.token AS bigram
        FROM tok a
        JOIN tok b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
    """,
    description="Genuine Python UDTF (Spark 4 @udtf class, lateral join): "
    "one (doc_id, text) row expands to n-1 token-bigram rows inside a "
    "Python worker. Grades the real UDTF surface — udtf_explode_like is "
    "the codegen'd explode equivalent; this one exercises the "
    "class-based eval/yield protocol.",
)
def udtf_python_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udtf

    @udtf(returnType="doc_id bigint, pos int, bigram string")
    class TokenBigrams:
        def eval(self, doc_id: int, text: str):
            toks = text.split(" ")
            for i in range(len(toks) - 1):
                yield doc_id, i, toks[i] + " " + toks[i + 1]

    docs = load(spark, sf_dir, "documents").where(F.col("doc_id") < 20)
    spark.udtf.register("token_bigrams", TokenBigrams)
    docs.createOrReplaceTempView("documents_for_udtf")
    return spark.sql(
        "SELECT b.doc_id, b.pos, b.bigram "
        "FROM documents_for_udtf d, "
        "LATERAL token_bigrams(d.doc_id, d.text) b"
    )


def _merge_purchase_view(pdf_p: pd.DataFrame, pdf_v: pd.DataFrame) -> pd.DataFrame:
    """Cogroup handler: both sides of one user arrive as pandas frames.
    Exact integer cents keep the Python-side arithmetic oracle-stable."""
    n_p, n_v = len(pdf_p), len(pdf_v)
    sum_p = int(round(pdf_p["value"], 2).mul(100).round().sum()) if n_p else 0
    sum_v = int(round(pdf_v["value"], 2).mul(100).round().sum()) if n_v else 0
    user = pdf_p["user_id"].iloc[0] if n_p else pdf_v["user_id"].iloc[0]
    return pd.DataFrame(
        {
            "user_id": [int(user)],
            "n_purchases": [n_p],
            "n_views": [n_v],
            "sum_purchase": [sum_p / 100.0],
            "sum_view": [sum_v / 100.0],
        }
    )


@register(
    "udaf_cogrouped_pandas",
    oracle_sql="""
        WITH p AS (
            SELECT user_id, count(*) AS n_purchases,
                   sum(CAST(round(value * 100) AS BIGINT)) AS sp
            FROM events WHERE event_type = 'purchase' GROUP BY user_id
        ),
        v AS (
            SELECT user_id, count(*) AS n_views,
                   sum(CAST(round(value * 100) AS BIGINT)) AS sv
            FROM events WHERE event_type = 'view' GROUP BY user_id
        )
        SELECT
            coalesce(p.user_id, v.user_id) AS user_id,
            coalesce(n_purchases, 0) AS n_purchases,
            coalesce(n_views, 0) AS n_views,
            coalesce(sp, 0) / 100.0 AS sum_purchase,
            coalesce(sv, 0) / 100.0 AS sum_view
        FROM p FULL OUTER JOIN v ON p.user_id = v.user_id
    """,
    description="Cogrouped pandas (groupBy().cogroup().applyInPandas): "
    "each user's purchase and view streams arrive as two pandas frames "
    "in one Python worker call — the two-sided custom-merge surface "
    "(as-of matching, custom reconciliation). Exact cents arithmetic "
    "Python-side makes even this op hash-gradable.",
)
def udaf_cogrouped_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id", "value"
    )
    views = ev.where(F.col("event_type") == "view").select("user_id", "value")
    return (
        purchases.groupBy("user_id")
        .cogroup(views.groupBy("user_id"))
        .applyInPandas(
            _merge_purchase_view,
            "user_id long, n_purchases long, n_views long, "
            "sum_purchase double, sum_view double",
        )
    )


@register(
    "udf_arrow_scalar",
    oracle_sql="""
        SELECT event_id,
               upper(event_type) || ':' ||
                   CAST(CAST(floor(value) AS BIGINT) AS VARCHAR) AS tag
        FROM events
        ORDER BY event_id
    """,
    description="Arrow-optimized Python scalar UDF (Spark 4 "
    "@udf(useArrow=True)): rows cross the JVM↔Python boundary as Arrow "
    "batches instead of pickled rows, ~2-5× the row-at-a-time pickle "
    "path while keeping plain-Python (non-pandas) per-value semantics — "
    "the migration target for legacy @udf code that can't be "
    "vectorized. The function itself is trivial string math so the "
    "boundary, not the body, is what's graded.",
)
def udf_arrow_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udf
    from pyspark.sql.types import StringType

    @udf(StringType(), useArrow=True)
    def tag(event_type: str, value: float) -> str:
        import math

        return f"{event_type.upper()}:{int(math.floor(value))}"

    ev = load(spark, sf_dir, "events")
    return ev.select(
        "event_id", tag("event_type", "value").alias("tag")
    ).orderBy("event_id")


@register(
    "udtf_mapinarrow",
    oracle_sql="""
        SELECT event_type,
               count(*) AS n,
               CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
                   AS sum_cents
        FROM events
        GROUP BY event_type
        ORDER BY event_type
    """,
    description="mapInArrow partition transform: each task's rows "
    "arrive as pyarrow RecordBatches and are reduced with pyarrow "
    "compute kernels (C++-vectorized, zero pandas materialization) "
    "into per-batch partial (count, exact cent sum) rows; a JVM-side "
    "re-aggregation merges the partials. This is the lowest-overhead "
    "Python boundary Spark offers — the right escape hatch when the "
    "per-batch logic needs Arrow-native libraries (tokenizers, image "
    "codecs) rather than pandas. Additive partials keep it exactly "
    "hash-gradable, per the same argument as foreachbatch compaction.",
)
def udtf_mapinarrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pyarrow as pa

    def partial_cents(batches):
        import pyarrow.compute as pc

        for batch in batches:
            cents = pc.cast(
                pc.floor(pc.add(pc.multiply(batch.column("value"), 100.0), 0.5)),
                pa.int64(),
            )
            tbl = pa.table(
                {"event_type": batch.column("event_type"), "cents": cents}
            )
            agg = tbl.group_by("event_type").aggregate(
                [("cents", "sum"), ("cents", "count")]
            )
            # group_by may emit dictionary/chunked columns; cast back to
            # the exact declared output types before handing to the JVM.
            yield pa.RecordBatch.from_arrays(
                [
                    pc.cast(
                        agg.column("event_type").combine_chunks(), pa.string()
                    ),
                    pc.cast(agg.column("cents_count").combine_chunks(), pa.int64()),
                    pc.cast(agg.column("cents_sum").combine_chunks(), pa.int64()),
                ],
                names=["event_type", "pn", "pcents"],
            )

    ev = load(spark, sf_dir, "events").select("event_type", "value")
    partials = ev.mapInArrow(
        partial_cents, "event_type string, pn bigint, pcents bigint"
    )
    return (
        partials.groupBy("event_type")
        .agg(
            F.sum("pn").alias("n"),
            F.sum("pcents").alias("sum_cents"),
        )
        .orderBy("event_type")
    )


@register(
    "udaf_grouped_arrow",
    oracle_sql="""
        SELECT user_id,
               count(*) AS n,
               CAST(max(CAST(floor(value * 100 + 0.5) AS BIGINT))
                    - min(CAST(floor(value * 100 + 0.5) AS BIGINT))
                    AS DOUBLE) / 100.0 AS value_range
        FROM events
        GROUP BY user_id
        ORDER BY user_id
    """,
    description="applyInArrow grouped transform: each user's rows "
    "arrive as one pyarrow Table (no pandas conversion — the Arrow-"
    "native sibling of applyInPandas) and are reduced with compute "
    "kernels to (count, exact cent range). Completes the Arrow "
    "boundary surface: scalar (udf_arrow_scalar), partition-wise "
    "(udtf_mapinarrow), and grouped (this op). Same skew caveat as "
    "every groupBy-apply: one group = one task's Arrow table.",
)
def udaf_grouped_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pyarrow as pa

    def value_range(table: "pa.Table") -> "pa.Table":
        import pyarrow.compute as pc

        cents = pc.cast(
            pc.floor(pc.add(pc.multiply(table.column("value"), 100.0), 0.5)),
            pa.int64(),
        )
        lo = pc.min(cents).as_py()
        hi = pc.max(cents).as_py()
        return pa.table(
            {
                "user_id": pa.array(
                    [table.column("user_id")[0].as_py()], pa.int64()
                ),
                "n": pa.array([len(table)], pa.int64()),
                "value_range": pa.array([(hi - lo) / 100.0], pa.float64()),
            }
        )

    ev = load(spark, sf_dir, "events").select("user_id", "value")
    return (
        ev.groupBy("user_id")
        .applyInArrow(
            value_range, "user_id bigint, n bigint, value_range double"
        )
        .orderBy("user_id")
    )


@register(
    "udtf_dynamic_analyze",
    oracle_sql="""
        WITH toks AS (
            SELECT doc_id, string_split(text, ' ') AS t
            FROM documents
        )
        SELECT doc_id,
               t[1] AS tok0,
               t[2] AS tok1,
               t[3] AS tok2,
               t[4] AS tok3
        FROM toks
        ORDER BY doc_id
    """,
    description="Python UDTF with a dynamic analyze() (Spark 4 "
    "polymorphic table function): the OUTPUT SCHEMA is computed at "
    "analysis time from the constant k argument (k columns tok0..tok_"
    "{k-1}), the capability fixed-schema UDTFs (udtf_python_ngrams) "
    "cannot express — one registered function serves any width, the "
    "schema contract every downstream operator sees is still fully "
    "resolved at plan time. Rows stream through Arrow batches; the "
    "oracle indexes the split list (out-of-range → NULL on both "
    "engines).",
)
def udtf_dynamic_analyze(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udtf
    from pyspark.sql.types import StringType, StructField, StructType
    from pyspark.sql.udtf import AnalyzeArgument, AnalyzeResult

    class PrefixCols:
        @staticmethod
        def analyze(text: AnalyzeArgument, k: AnalyzeArgument) -> AnalyzeResult:
            n = int(k.value)
            return AnalyzeResult(
                StructType(
                    [StructField(f"tok{i}", StringType()) for i in range(n)]
                )
            )

        def eval(self, text, k):
            toks = (text or "").split(" ")
            yield tuple(
                toks[i] if i < len(toks) else None for i in range(int(k))
            )

    spark.udtf.register("prefix_cols_dyn", udtf(PrefixCols))
    load(spark, sf_dir, "documents").createOrReplaceTempView("docs_udtf_v")
    return spark.sql(
        """
        SELECT d.doc_id, p.*
        FROM docs_udtf_v d, LATERAL prefix_cols_dyn(d.text, 4) p
        ORDER BY d.doc_id
        """
    )
