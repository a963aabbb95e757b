"""Scalar-function operators: string / date / math / array / JSON
(SURVEY.md §2.8).

All built-in ``pyspark.sql.functions`` — JVM-side, whole-stage-codegen'd;
no Python boundary anywhere here. Dialect traps handled per SURVEY.md M2:
DuckDB ``date_diff('day', a, b)`` counts a→b while Spark ``datediff(end,
start)`` is end−start (argument order flipped); DuckDB ``year()`` returns
BIGINT while Spark returns INT (cast both to BIGINT).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from etl_intraday_bidask_spark.functions.parity import scaled_long
from etl_intraday_bidask_spark.plans.ordering import ordered_small
from etl_intraday_bidask_spark.registry import register
from etl_intraday_bidask_spark.tables import load, view


@register(
    "str_funcs",
    oracle_sql="""
        SELECT p_partkey,
               lower(p_name) AS name_lower,
               upper(p_brand) AS brand_upper,
               CAST(length(p_name) AS BIGINT) AS name_len,
               substring(p_type, 1, 6) AS type_prefix,
               concat(p_brand, ':', p_type) AS brand_type,
               regexp_extract(p_brand, '[0-9]+') AS brand_num,
               string_split(p_type, ' ')[1] AS type_first_word
        FROM part
        ORDER BY p_partkey
    """,
    description="String surface: lower/upper/length/substring/concat/"
    "regexp_extract/split-first-element over part columns.",
)
def str_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.lower("p_name").alias("name_lower"),
        F.upper("p_brand").alias("brand_upper"),
        F.length("p_name").cast("bigint").alias("name_len"),
        F.substring("p_type", 1, 6).alias("type_prefix"),
        F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
        F.regexp_extract("p_brand", "[0-9]+", 0).alias("brand_num"),
        F.split("p_type", " ").getItem(0).alias("type_first_word"),
    ).orderBy("p_partkey")


@register(
    "date_funcs",
    oracle_sql="""
        SELECT o_orderkey,
               CAST(year(o_orderdate) AS BIGINT) AS order_year,
               CAST(month(o_orderdate) AS BIGINT) AS order_month,
               CAST(quarter(o_orderdate) AS BIGINT) AS order_quarter,
               CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
               CAST(date_diff('day', o_orderdate,
                              TIMESTAMP '2001-12-31 00:00:00') AS BIGINT) AS days_to_eoy
        FROM orders
        ORDER BY o_orderkey
    """,
    description="Date surface: year/month/quarter/date_trunc/datediff. "
    "Arg-order trap: Spark datediff(end, start) == DuckDB "
    "date_diff('day', start, end).",
)
def date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.year("o_orderdate").cast("bigint").alias("order_year"),
        F.month("o_orderdate").cast("bigint").alias("order_month"),
        F.quarter("o_orderdate").cast("bigint").alias("order_quarter"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.datediff(
            F.lit("2001-12-31").cast("timestamp"), F.col("o_orderdate")
        )
        .cast("bigint")
        .alias("days_to_eoy"),
    ).orderBy("o_orderkey")


@register(
    "math_funcs",
    oracle_sql="""
        SELECT p_partkey,
               round(abs(p_retailprice - 1500.0), 4) AS dist_from_mid,
               round(ln(p_retailprice), 4) AS log_price,
               round(sqrt(p_retailprice), 4) AS sqrt_price,
               round(power(p_retailprice, 0.5) + power(p_size, 2), 4) AS poly,
               CAST(p_size % 7 AS BIGINT) AS size_mod7
        FROM part
        WHERE p_retailprice > 0
        ORDER BY p_partkey
    """,
    description="Math surface: round/abs/ln/sqrt/power/mod over prices.",
)
def math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load(spark, sf_dir, "part")
    return (
        part.where(F.col("p_retailprice") > 0)
        .select(
            "p_partkey",
            F.round(F.abs(F.col("p_retailprice") - 1500.0), 4).alias(
                "dist_from_mid"
            ),
            F.round(F.log(F.col("p_retailprice")), 4).alias("log_price"),
            F.round(F.sqrt("p_retailprice"), 4).alias("sqrt_price"),
            F.round(
                F.pow("p_retailprice", F.lit(0.5)) + F.pow("p_size", F.lit(2.0)),
                4,
            ).alias("poly"),
            (F.col("p_size") % 7).cast("bigint").alias("size_mod7"),
        )
        .orderBy("p_partkey")
    )


@register(
    "json_get",
    oracle_sql="""
        SELECT event_type,
               avg(CAST(json_extract_string(props, '$.k') AS INT)) AS avg_k,
               CAST(max(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS max_k
        FROM events
        GROUP BY event_type
        ORDER BY event_type
    """,
    description="Semi-structured JSON extraction from events.props "
    "(get_json_object), aggregated per event_type.",
)
def json_get(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Parse ONCE before the aggregate (inner subquery): referencing the
    # extraction inside two agg functions evaluates the JSON path per
    # function (no cross-aggregate subexpression elimination), doubling
    # the parse cost that dominates this query's wall (round-6 JSON
    # crossover lesson). SQL-text body (round-8 dispatch-floor work,
    # see agg_pricing_summary): identical logical plan, one parse
    # round trip. Bounded output (5 event types): ordered_small
    # replaces the global range sort (plans/ordering.py).
    ev = view(spark, sf_dir, "events")
    return ordered_small(
        spark.sql(f"""
            SELECT event_type, AVG(k) AS avg_k,
                   CAST(MAX(k) AS BIGINT) AS max_k
            FROM (
                SELECT event_type,
                       CAST(get_json_object(props, '$.k') AS INT) AS k
                FROM {ev}
            )
            GROUP BY event_type
        """),
        "event_type",
    )


@register(
    "array_explode_tokens",
    oracle_sql="""
        SELECT lang, token, count(*) AS n
        FROM (
            SELECT lang, unnest(string_split(text, ' ')) AS token
            FROM documents
        )
        GROUP BY lang, token
        HAVING count(*) > 5
        ORDER BY lang, token
    """,
    description="Tokenize text → explode → per-(lang, token) counts > 5 "
    "(text-analysis building block).",
)
def array_explode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    # SQL-text body (round-8 dispatch-floor work, see agg_pricing_summary):
    # identical logical plan, one parse round trip. The range sort stays —
    # (lang, token) cardinality is data-dependent, so coalesce(1) would be
    # dishonest at scale (the job-anatomy note in BASELINE.md).
    docs = view(spark, sf_dir, "documents")
    return spark.sql(f"""
        SELECT lang, token, COUNT(1) AS n
        FROM (SELECT lang, explode(split(text, ' ')) AS token FROM {docs})
        GROUP BY lang, token
        HAVING COUNT(1) > 5
        ORDER BY lang, token
    """)


@register(
    "array_funcs",
    oracle_sql="""
        SELECT vec_id,
               CAST(len(embedding) AS BIGINT) AS dim,
               round(CAST(embedding[1] AS DOUBLE), 4) + 0.0 AS first_component,
               round(list_aggregate(
                   list_transform(list_slice(embedding, 1, 8),
                                  x -> CAST(x AS DOUBLE)), 'sum'), 4) + 0.0 AS head_sum,
               list_contains(list_transform(embedding,
                                            x -> CAST(x AS DOUBLE) > 0.9), true) AS has_large
        FROM embeddings
        ORDER BY vec_id
    """,
    description="Array surface over embeddings: size / element access / "
    "slice+aggregate / existence predicate (higher-order functions). "
    "Rounded floats carry a `+ 0.0` on BOTH engines: DuckDB round() "
    "preserves IEEE signed zero (round(-0.00004,4) = -0.0) while Spark's "
    "BigDecimal-based round has no -0, so a near-zero negative component "
    "canonicalizes as '-0' vs '0' and hash-mismatches with zero numeric "
    "difference (first seen at sf0.1). `x + 0.0` maps -0.0 to +0.0 on "
    "both engines and is a no-op for every other value.",
)
def array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id",
        F.size("embedding").cast("bigint").alias("dim"),
        (F.round(F.col("embedding").getItem(0).cast("double"), 4) + 0.0).alias(
            "first_component"
        ),
        (
            F.round(
                F.aggregate(
                    F.slice("embedding", 1, 8),
                    F.lit(0.0),
                    lambda acc, x: acc + x.cast("double"),
                ),
                4,
            )
            + 0.0
        ).alias("head_sum"),
        F.exists("embedding", lambda x: x > 0.9).alias("has_large"),
    ).orderBy("vec_id")


@register(
    "array_higher_order",
    oracle_sql="""
        SELECT
            vec_id,
            round(list_sum(list_transform(CAST(embedding AS DOUBLE[]),
                                          x -> x * x)), 4) AS sum_sq,
            CAST(len(list_filter(CAST(embedding AS DOUBLE[]),
                                 x -> x > 0)) AS BIGINT) AS n_pos,
            len(list_filter(CAST(embedding AS DOUBLE[]),
                            x -> x > 2.0)) > 0 AS has_large
        FROM embeddings
    """,
    description="Higher-order array lambdas (transform/filter/exists) "
    "over the embedding column — all JVM-side Catalyst expressions, no "
    "Python boundary: the idiomatic way to process array columns at "
    "scale. 4dp rounding on the folded sum (sequential fold on both "
    "engines; error ulps below the grid).",
)
def array_higher_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    v = F.col("embedding").cast("array<double>")
    return emb.select(
        "vec_id",
        F.round(
            F.aggregate(
                F.transform(v, lambda x: x * x),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
            4,
        ).alias("sum_sq"),
        F.size(F.filter(v, lambda x: x > 0)).cast("long").alias("n_pos"),
        F.exists(v, lambda x: x > 2.0).alias("has_large"),
    )


@register(
    "json_map_funcs",
    oracle_sql="""
        SELECT
            event_id,
            CAST(len(json_keys(props)) AS BIGINT) AS n_keys,
            CAST(json_extract_string(props, '$.k') AS INT) AS k_val
        FROM events
    """,
    description="Semi-structured map surface: parse the props JSON into "
    "a typed map, count keys, extract a typed value — from_json/"
    "map_keys/element_at as the schema-on-read path for event payloads "
    "(vs json_get's string-path extraction).",
)
def json_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,int>")
    return ev.select(
        "event_id",
        F.size(F.map_keys(m)).cast("long").alias("n_keys"),
        F.element_at(m, "k").alias("k_val"),
    )


@register(
    "regexp_extract_all_counts",
    oracle_sql="""
        SELECT
            p_partkey,
            CAST(len(regexp_extract_all(p_name, '([a-z]+)', 1)) AS BIGINT)
                AS n_words,
            regexp_extract(p_name, '([a-z]+)', 1) AS first_word
        FROM part
    """,
    description="Multi-match regex extraction: all lowercase word runs "
    "per part name, count + first match. Java and RE2 regex dialects "
    "agree on this character-class subset — the dialect-safe zone the "
    "engine's regex surface sticks to (SURVEY.md M2 dialect note).",
)
def regexp_extract_all_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.size(F.regexp_extract_all("p_name", F.lit("([a-z]+)"), 1))
        .cast("long")
        .alias("n_words"),
        F.regexp_extract("p_name", "([a-z]+)", 1).alias("first_word"),
    )


@register(
    "json_variant_get",
    oracle_sql="""
        SELECT event_type,
               count(*) AS n,
               CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT))
                    AS BIGINT) AS sum_k,
               CAST(min(CAST(json_extract_string(props, '$.k') AS BIGINT))
                    AS BIGINT) AS min_k
        FROM events
        GROUP BY event_type
        ORDER BY event_type
    """,
    description="Spark 4 VARIANT path for semi-structured data: "
    "parse_json(props) produces the binary VARIANT encoding once, and "
    "variant_get('$.k') navigates it without re-parsing — on repeated "
    "multi-path extraction this replaces N string parses per row with "
    "one (the shredded-JSON lakehouse pattern); contrast json_get, "
    "which re-parses per extraction. Same aggregate contract as the "
    "string-path op, so the two are directly comparable.",
)
def json_variant_get(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    k = F.variant_get(F.parse_json(F.col("props")), "$.k", "bigint")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
        )
        .orderBy("event_type")
    )


@register(
    "scalar_try_funcs",
    oracle_sql="""
        SELECT event_id,
               CASE WHEN CAST(json_extract_string(props, '$.k') AS BIGINT) = 0
                    THEN NULL
                    ELSE CAST(floor(value * 100 + 0.5) AS BIGINT)
                         / CAST(json_extract_string(props, '$.k') AS BIGINT)
               END AS cents_per_k,
               TRY_CAST(event_type AS BIGINT) AS bad_cast,
               TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS good_cast
        FROM events
        ORDER BY event_id
    """,
    description="Error-safe scalar surface (ANSI-mode survival kit): "
    "try_divide yields NULL on a zero divisor and try_cast NULL on an "
    "uncastable value instead of failing the job — at 100 TB a single "
    "poisoned row must never kill a 6-hour pipeline, and NULL-routing "
    "bad rows to a quarantine filter is the standard pattern. The "
    "oracle mirrors try_divide with an explicit zero-guard CASE since "
    "DuckDB division errors on zero integers too.",
)
def scalar_try_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_intraday_bidask_spark.functions.parity import scaled_long

    ev = load(spark, sf_dir, "events")
    k = F.expr("try_cast(get_json_object(props, '$.k') AS BIGINT)")
    return ev.select(
        "event_id",
        F.try_divide(scaled_long("value", 100), k).alias("cents_per_k"),
        F.expr("try_cast(event_type AS BIGINT)").alias("bad_cast"),
        k.alias("good_cast"),
    ).orderBy("event_id")


@register(
    "array_explode_outer",
    oracle_sql="""
        WITH base AS (
            SELECT doc_id,
                   CASE WHEN doc_id % 7 = 0
                        THEN []::VARCHAR[]
                        ELSE string_split(text, ' ')[1:3] END AS toks
            FROM documents
            WHERE doc_id < 100
        )
        SELECT doc_id, u.token
        FROM base
        LEFT JOIN LATERAL (SELECT unnest(toks) AS token) u ON TRUE
        ORDER BY doc_id, token
    """,
    description="explode_outer null semantics: rows whose array is "
    "empty survive the lateral expansion with a NULL element instead "
    "of vanishing — the outer-unnest contract that keeps parent rows "
    "(documents with no extracted entities, orders with no lines in a "
    "denormalized feed) visible to downstream counts. Plain explode "
    "would silently drop every 7th doc here.",
)
def array_explode_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").where(F.col("doc_id") < 100)
    toks = F.when(
        F.col("doc_id") % 7 == 0, F.expr("cast(array() as array<string>)")
    ).otherwise(F.slice(F.split("text", " "), 1, 3))
    return (
        docs.select("doc_id", toks.alias("toks"))
        .select("doc_id", F.explode_outer("toks").alias("token"))
        .orderBy("doc_id", "token")
    )


@register(
    "date_interval_funcs",
    oracle_sql="""
        SELECT o_orderkey,
               CAST(o_orderdate + INTERVAL 3 MONTH AS TIMESTAMP)
                   AS plus_3m,
               CAST(last_day(CAST(o_orderdate AS DATE)) AS DATE)
                   AS month_end,
               CAST(date_diff('month', TIMESTAMP '1995-01-01', o_orderdate)
                    AS BIGINT) AS whole_months_since,
               CAST(date_part('dayofyear', o_orderdate) AS BIGINT) AS doy,
               CAST(date_part('week', o_orderdate) AS BIGINT) AS iso_week
        FROM orders
        WHERE o_orderkey <= 500
        ORDER BY o_orderkey
    """,
    description="Interval/calendar arithmetic surface: add_months, "
    "last_day, whole-month difference, day-of-year, and ISO week "
    "number — the calendar kit ETL date-spine and "
    "fiscal-rollup logic is built from. Narrow projection; the "
    "month-difference is floor-truncated identically on both engines "
    "(Spark months_between with roundOff folded to integer via "
    "floor; DuckDB date_diff('month')).",
)
def date_interval_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 500)
    return orders.select(
        "o_orderkey",
        (F.col("o_orderdate") + F.expr("INTERVAL 3 MONTHS")).alias("plus_3m"),
        F.last_day(F.col("o_orderdate").cast("date")).alias("month_end"),
        F.floor(
            F.months_between(
                F.col("o_orderdate"), F.lit("1995-01-01").cast("timestamp")
            )
        )
        .cast("long")
        .alias("whole_months_since"),
        F.dayofyear("o_orderdate").cast("long").alias("doy"),
        F.weekofyear("o_orderdate").cast("long").alias("iso_week"),
    ).orderBy("o_orderkey")


@register(
    "scalar_null_funcs",
    oracle_sql="""
        SELECT c_custkey,
               COALESCE(NULLIF(c_mktsegment, 'BUILDING'), 'OTHER')
                   AS seg_or_other,
               CASE WHEN c_acctbal < 0 THEN NULL
                    ELSE CAST(round(c_acctbal * 100) AS BIGINT)
               END AS pos_cents,
               COALESCE(CASE WHEN c_acctbal < 0 THEN NULL
                             ELSE CAST(round(c_acctbal * 100) AS BIGINT)
                        END, -1) AS pos_cents_filled,
               CAST(c_acctbal >= 0 AS BOOLEAN) IS NOT NULL AS has_balance
        FROM customer
        ORDER BY c_custkey
    """,
    description="Null-handling scalar surface: NULLIF demotion, "
    "COALESCE fallback chains, CASE-to-NULL promotion and refill — "
    "the defensive projection kit every silver-layer cleanup job is "
    "made of. Exact-cents integers for the numeric legs; narrow, "
    "codegen'd, no shuffle before the output sort.",
)
def scalar_null_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load(spark, sf_dir, "customer")
    pos_cents = F.when(
        F.col("c_acctbal") < 0, F.lit(None)
    ).otherwise(scaled_long("c_acctbal", 100))
    return customer.select(
        "c_custkey",
        F.coalesce(
            F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")), F.lit("OTHER")
        ).alias("seg_or_other"),
        pos_cents.alias("pos_cents"),
        F.coalesce(pos_cents, F.lit(-1)).alias("pos_cents_filled"),
        (F.col("c_acctbal") >= 0).isNotNull().alias("has_balance"),
    ).orderBy("c_custkey")


@register(
    "agg_map_group",
    oracle_sql="""
        WITH counts AS (
            SELECT user_id, event_type, count(*) AS n
            FROM events
            GROUP BY user_id, event_type
        )
        SELECT user_id,
               string_agg(event_type, ',' ORDER BY event_type) AS type_keys,
               string_agg(CAST(n AS VARCHAR), ',' ORDER BY event_type)
                   AS type_counts,
               count(*) AS n_types
        FROM counts
        GROUP BY user_id
        ORDER BY user_id
    """,
    description="Map-typed aggregation: per-user event_type→count "
    "built as a real MapType column (map_from_entries over the "
    "key-sorted entry array — deterministic iteration order), then "
    "emitted as parallel key/value CSV columns so the map CONTENT is "
    "hash-graded, not just its cardinality. The map-building shape "
    "feature stores use for per-entity feature bags; two-phase "
    "(user, type) count then per-user fold, both map-side combining.",
)
def agg_map_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    counts = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    entries = counts.groupBy("user_id").agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("event_type"), F.col("n")))
        ).alias("ents")
    )
    as_map = entries.select(
        "user_id", F.map_from_entries("ents").alias("m")
    )
    return as_map.select(
        "user_id",
        F.concat_ws(",", F.map_keys("m")).alias("type_keys"),
        F.concat_ws(
            ",", F.transform(F.map_values("m"), lambda v: v.cast("string"))
        ).alias("type_counts"),
        F.size(F.map_keys("m")).cast("long").alias("n_types"),
    ).orderBy("user_id")
