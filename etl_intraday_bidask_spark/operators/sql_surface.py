"""Spark 4 SQL-surface operators, wave 2 (SURVEY.md §2.24): recursive
CTEs, lateral column aliases, and parameterized queries — the SQL entry
points a reference user drives the engine through.

Scale notes: the recursive CTE is iterative joins under the hood — each
step an equi join of the frontier against the (tiny, broadcastable)
edge relation, frontier size bounded by the input; depth here is
O(log10 custkey), so 4-5 rounds. Lateral aliases and parameter markers
are purely analysis-time features — zero runtime cost, the optimized
plan is identical to the hand-expanded form.

Parity notes: DuckDB supports WITH RECURSIVE and lateral column
aliases natively, so the oracles are near-verbatim; the parameterized
query's oracle inlines the literals (parameter binding itself is the
Spark-side surface under test, not a semantic difference). All money
math uses the exact scaled-integer policy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from etl_intraday_bidask_spark.registry import register
from etl_intraday_bidask_spark.tables import load


@register(
    "sql_recursive_cte",
    oracle_sql="""
        WITH RECURSIVE walk(custkey, anc, depth) AS (
            SELECT c_custkey, c_custkey, 0
            FROM customer
            UNION ALL
            SELECT custkey, anc // 10, depth + 1
            FROM walk
            WHERE anc > 0
        )
        SELECT CAST(max(depth) AS BIGINT) AS depth,
               count(*) AS n_customers
        FROM (
            SELECT custkey, max(depth) AS depth
            FROM walk
            GROUP BY custkey
        )
        GROUP BY depth
        ORDER BY depth
    """,
    description="Recursive CTE (Spark 4 WITH RECURSIVE): each customer "
    "walks the synthetic decimal-digit hierarchy custkey → custkey//10 "
    "→ ... → 0 (a deterministic tree over the fixture key space — the "
    "org-chart/BOM traversal shape), and the result is the depth "
    "distribution. Execution is iterative frontier joins with depth "
    "O(log10 maxkey) ≈ 5 rounds; each round an equi join on the "
    "frontier, so the recursion is shuffle-bounded by input size, "
    "never row-exploding. Oracle is the same WITH RECURSIVE in DuckDB.",
)
def sql_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    load(spark, sf_dir, "customer").createOrReplaceTempView("customer_v")
    return spark.sql(
        """
        WITH RECURSIVE walk(custkey, anc, depth) AS (
            SELECT c_custkey, c_custkey, 0
            FROM customer_v
            UNION ALL
            SELECT custkey, CAST(floor(anc / 10) AS BIGINT), depth + 1
            FROM walk
            WHERE anc > 0
        )
        SELECT CAST(max(depth) AS BIGINT) AS depth,
               count(*) AS n_customers
        FROM (
            SELECT custkey, max(depth) AS depth
            FROM walk
            GROUP BY custkey
        )
        GROUP BY depth
        ORDER BY depth
        """
    )


@register(
    "sql_lateral_alias_chain",
    oracle_sql="""
        SELECT l_orderkey,
               l_linenumber,
               CAST(round(l_extendedprice * (1 - l_discount) * 10000)
                    AS BIGINT) AS net_e4,
               -- exact-integer half-up: net_e4*(1+tax) as
               -- (net_e4*(100+tax_e2)+50)//100 — no double product, so
               -- both engines compute the identical integer.
               CAST((net_e4 * (100 + CAST(round(l_tax * 100) AS BIGINT))
                     + 50) // 100 AS BIGINT) AS gross_e4,
               gross_e4 - CAST(round(l_extendedprice * 10000) AS BIGINT)
                   AS delta_e4
        FROM lineitem
        WHERE l_orderkey <= 80
        ORDER BY l_orderkey, l_linenumber
    """,
    description="Lateral column aliases (Spark 4 SQL): each computed "
    "column references the previous alias in the same SELECT "
    "(net → gross → delta), the spreadsheet-style derivation chain "
    "that previously required nested subqueries. Purely an "
    "analysis-time rewrite — the optimized plan equals the expanded "
    "form, so it stays a narrow scan-side projection. Exact scaled "
    "integers throughout; DuckDB supports the same aliasing.",
)
def sql_lateral_alias_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_v")
    return spark.sql(
        """
        SELECT l_orderkey,
               l_linenumber,
               CAST(floor(l_extendedprice * (1 - l_discount) * 10000 + 0.5)
                    AS BIGINT) AS net_e4,
               -- net_e4*(1+tax) in EXACT integers: tax has 2 decimals, so
               -- (net_e4*(100+tax_e2)+50) DIV 100 is half-up rounding with
               -- no double product — the floor(x+0.5) shortcut is only
               -- sound when x sits on a representable grid, which a
               -- bigint×double product does not (ADVICE.md round 2).
               (net_e4 * (100 + CAST(floor(l_tax * 100 + 0.5) AS BIGINT))
                + 50) DIV 100 AS gross_e4,
               gross_e4 - CAST(floor(l_extendedprice * 10000 + 0.5) AS BIGINT)
                   AS delta_e4
        FROM lineitem_v
        WHERE l_orderkey <= 80
        ORDER BY l_orderkey, l_linenumber
        """
    )


@register(
    "sql_parameterized_query",
    oracle_sql="""
        SELECT o_orderpriority,
               count(*) AS n_orders,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
                   / 100.0 AS sum_price
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1997-01-01'
          AND o_totalprice >= 1000.0
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """,
    description="Parameterized SQL (Spark 4 named parameter markers): "
    "the query text carries :start/:end/:min_price placeholders and "
    "values bind at spark.sql() call time — the injection-safe "
    "templating surface BI layers and job schedulers use. Binding is "
    "analysis-time only: the bound literals reach the scan as pushed "
    "filters exactly like inlined ones (the oracle inlines them).",
)
def sql_parameterized_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders_v")
    return spark.sql(
        """
        SELECT o_orderpriority,
               count(*) AS n_orders,
               CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                    AS DOUBLE) / 100.0 AS sum_price
        FROM orders_v
        WHERE o_orderdate >= CAST(:start AS TIMESTAMP)
          AND o_orderdate < CAST(:end AS TIMESTAMP)
          AND o_totalprice >= :min_price
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
        """,
        args={
            "start": "1996-01-01",
            "end": "1997-01-01",
            "min_price": 1000.0,
        },
    )


@register(
    "str_collation_group",
    oracle_sql="""
        WITH cased AS (
            SELECT CASE WHEN c_custkey % 2 = 0
                        THEN upper(c_mktsegment)
                        ELSE lower(c_mktsegment) END AS seg,
                   c_acctbal
            FROM customer
        )
        SELECT lower(seg) AS segment,
               count(*) AS n,
               CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS DOUBLE)
                   / 100.0 AS sum_bal
        FROM cased
        GROUP BY lower(seg)
        ORDER BY segment
    """,
    description="Collation-aware grouping (Spark 4 COLLATE): market "
    "segments are deliberately case-mangled per row, then grouped "
    "under UTF8_LCASE collation so 'AUTOMOBILE' and 'automobile' land "
    "in one group without any explicit lower() in the grouping key — "
    "the locale/case-insensitive semantics Spark 4 moved into the "
    "type system (the oracle mirrors with lower(), which is exactly "
    "the rewrite collations subsume). The emitted key is lowercased "
    "on both sides so the VALUE (not just the equivalence class) "
    "matches. Narrow projection + one 5-group aggregate.",
)
def str_collation_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    load(spark, sf_dir, "customer").createOrReplaceTempView(
        "customer_coll_v"
    )
    return spark.sql(
        """
        WITH cased AS (
            SELECT CASE WHEN c_custkey % 2 = 0
                        THEN upper(c_mktsegment)
                        ELSE lower(c_mktsegment) END
                       COLLATE UTF8_LCASE AS seg,
                   c_acctbal
            FROM customer_coll_v
        )
        SELECT CAST(lower(seg) AS STRING COLLATE UTF8_BINARY) AS segment,
               count(*) AS n,
               CAST(sum(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT))
                    AS DOUBLE) / 100.0 AS sum_bal
        FROM cased
        GROUP BY seg
        ORDER BY segment
        """
    )


@register(
    "sql_identifier_groupby_all",
    oracle_sql="""
        SELECT o_orderstatus,
               o_orderpriority,
               count(*) AS n_orders,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
                   / 100.0 AS sum_price
        FROM orders
        GROUP BY ALL
        ORDER BY o_orderstatus, o_orderpriority
    """,
    description="Spark 4 SQL surface pair: the IDENTIFIER() clause "
    "binds the table name as a typed parameter (injection-safe dynamic "
    "SQL over table/column names — string interpolation is the classic "
    "SQL-injection vector in templated jobs), and GROUP BY ALL infers "
    "the grouping set from the non-aggregate select list (the "
    "dashboard-authoring affordance). Binding and inference are both "
    "analysis-time only: the optimized plan equals the explicit "
    "GROUP BY, so the scan/aggregate shape is unchanged. DuckDB "
    "supports GROUP BY ALL natively; the identifier arrives inlined.",
)
def sql_identifier_groupby_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders_idq")
    return spark.sql(
        """
        SELECT o_orderstatus,
               o_orderpriority,
               count(*) AS n_orders,
               CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                    AS DOUBLE) / 100.0 AS sum_price
        FROM IDENTIFIER(:tbl)
        GROUP BY ALL
        ORDER BY o_orderstatus, o_orderpriority
        """,
        args={"tbl": "orders_idq"},
    )


@register(
    "join_lateral_topn_per_key",
    oracle_sql="""
        SELECT c_custkey, o_orderkey,
               CAST(round(o_totalprice * 100) AS BIGINT) AS price_c
        FROM customer,
        LATERAL (
            SELECT o_orderkey, o_totalprice
            FROM orders
            WHERE o_custkey = c_custkey
            ORDER BY o_totalprice DESC, o_orderkey
            LIMIT 2
        ) o
        WHERE c_mktsegment = 'BUILDING'
        ORDER BY c_custkey, price_c DESC, o_orderkey
    """,
    description="Correlated LATERAL subquery join with ORDER BY/LIMIT "
    "(Spark 4): the top-2 highest-value orders per BUILDING customer "
    "expressed as a per-row dependent subquery — the SQL-standard "
    "top-N-per-key formulation BI tools emit. Catalyst decorrelates "
    "it into the window/rank shape (win_topk_per_group is the "
    "DataFrame twin), so the executed plan is one custkey exchange + "
    "rank filter, NOT a per-customer re-scan — the decorrelation "
    "itself is the capability under test. Exact-cent output with a "
    "full tie-break; DuckDB runs the identical LATERAL.",
)
def join_lateral_topn_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    load(spark, sf_dir, "customer").createOrReplaceTempView("cust_lat_v")
    load(spark, sf_dir, "orders").createOrReplaceTempView("ord_lat_v")
    return spark.sql(
        """
        SELECT c_custkey, o_orderkey,
               CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS price_c
        FROM cust_lat_v,
        LATERAL (
            SELECT o_orderkey, o_totalprice
            FROM ord_lat_v
            WHERE o_custkey = c_custkey
            ORDER BY o_totalprice DESC, o_orderkey
            LIMIT 2
        ) o
        WHERE c_mktsegment = 'BUILDING'
        ORDER BY c_custkey, price_c DESC, o_orderkey
        """
    )
