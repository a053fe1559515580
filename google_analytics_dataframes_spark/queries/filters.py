"""§2.2 Projection, filters, predicates (SURVEY.md).

GA `filters` param semantics [K]: `==  !=  >  <  >=  <=`, substring `=@/!@`,
regex `=~/!~`, combined with `;` (AND) and `,` (OR); mandatory
`start-date`/`end-date` range.  All compile to Catalyst predicates that push
into the parquet scan — at 100 TB these are row-group/page skips, not
post-scan filters.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from google_analytics_dataframes_spark.registry import register
from google_analytics_dataframes_spark.queries._util import T


@register(
    "p1_select_rename",
    oracle="""
    SELECT o_orderkey AS order_id, o_orderpriority AS priority, o_orderstatus AS status
    FROM orders
    """,
)
def p1_select_rename(spark, sf_dir):
    """Projection + rename + reorder (GA `dimensions` list ordering [K])."""
    return T(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("order_id"),
        F.col("o_orderpriority").alias("priority"),
        F.col("o_orderstatus").alias("status"),
    )


@register(
    "p2_computed_col",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) AS revenue,
           l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charged
    FROM lineitem
    """,
)
def p2_computed_col(spark, sf_dir):
    """Derived metric arithmetic (GA v4 metric expressions [K]).  Per-row
    IEEE double arithmetic with identical expression shape on both engines
    is bit-deterministic — no rounding needed."""
    li = T(spark, sf_dir, "lineitem")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        rev.alias("revenue"),
        (rev * (1 + F.col("l_tax"))).alias("charged"),
    )


@register(
    "f1_eq",
    oracle="SELECT c_custkey, c_name, c_mktsegment FROM customer WHERE c_mktsegment = 'BUILDING'",
)
def f1_eq(spark, sf_dir):
    """Equality predicate (GA `filters=ga:country==US` [K])."""
    return (
        T(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey", "c_name", "c_mktsegment")
    )


@register(
    "f2_neq",
    oracle="SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderstatus <> 'F'",
)
def f2_neq(spark, sf_dir):
    """Inequality (GA `!=` [K])."""
    return (
        T(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") != "F")
        .select("o_orderkey", "o_orderstatus")
    )


@register(
    "f3_range_date",
    oracle="""
    SELECT o_orderkey, o_custkey, strftime(o_orderdate, '%Y-%m-%d') AS orderdate
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
    """,
)
def f3_range_date(spark, sf_dir):
    """Date-window range predicate (GA mandatory `start-date`/`end-date` [K]).
    Pushed to parquet row-group min/max — the scan-pruning analog of GA's
    server-side date slicing."""
    o = T(spark, sf_dir, "orders")
    return o.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    ).select(
        "o_orderkey",
        "o_custkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
    )


@register(
    "f4_contains",
    oracle="""
    SELECT p_partkey, p_name FROM part
    WHERE contains(p_name, 'widget') AND NOT contains(p_name, 'cold')
    """,
)
def f4_contains(spark, sf_dir):
    """Substring contains / not-contains (GA `=@` / `!@` [K])."""
    p = T(spark, sf_dir, "part")
    return p.filter(
        F.col("p_name").contains("widget") & ~F.col("p_name").contains("cold")
    ).select("p_partkey", "p_name")


@register(
    "f5_regex",
    oracle=r"""
    SELECT p_partkey, p_type FROM part
    WHERE regexp_matches(p_type, '^(PROMO|ECONOMY)') AND NOT regexp_matches(p_type, 'BRASS$')
    """,
)
def f5_regex(spark, sf_dir):
    """Regex match / not-match (GA `=~` / `!~` [K])."""
    p = T(spark, sf_dir, "part")
    return p.filter(
        F.col("p_type").rlike("^(PROMO|ECONOMY)") & ~F.col("p_type").rlike("BRASS$")
    ).select("p_partkey", "p_type")


@register(
    "f6_and_or",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_orderpriority, o_totalprice FROM orders
    WHERE (o_orderstatus = 'F' AND o_totalprice > 150000.0)
       OR (o_orderpriority = '1-URGENT' AND NOT o_orderstatus = 'P')
    """,
)
def f6_and_or(spark, sf_dir):
    """Boolean AND/OR/NOT combinators (GA `;` and `,` [K])."""
    o = T(spark, sf_dir, "orders")
    return o.filter(
        ((F.col("o_orderstatus") == "F") & (F.col("o_totalprice") > 150000.0))
        | ((F.col("o_orderpriority") == "1-URGENT") & ~(F.col("o_orderstatus") == "P"))
    ).select("o_orderkey", "o_orderstatus", "o_orderpriority", "o_totalprice")


@register(
    "f7_in_list",
    oracle="""
    SELECT n_nationkey, n_name FROM nation
    WHERE n_name IN ('NATION_1', 'NATION_5', 'NATION_13', 'NATION_24')
    """,
)
def f7_in_list(spark, sf_dir):
    """IN-list membership (GA OR-of-equalities idiom [K])."""
    return (
        T(spark, sf_dir, "nation")
        .filter(F.col("n_name").isin("NATION_1", "NATION_5", "NATION_13", "NATION_24"))
        .select("n_nationkey", "n_name")
    )


@register(
    "f8_null_handling",
    oracle="""
    SELECT o_orderkey,
           nullif(o_orderstatus, 'P') AS status_np,
           coalesce(nullif(o_orderstatus, 'P'), 'PENDING') AS status_filled,
           (nullif(o_orderstatus, 'P') IS NULL) AS is_pending,
           (nullif(o_orderstatus, 'P') IS NOT DISTINCT FROM 'F') AS nsafe_f
    FROM orders
    """,
)
def f8_null_handling(spark, sf_dir):
    """NULL-aware predicates + null-safe equality (GA `include-empty-rows`;
    pandas NaN semantics in the reference client [K]).  The testdata carries
    no physical NULLs, so nulls are introduced with `nullif` — exercising
    isNull / coalesce / <=> on a deterministic null pattern."""
    o = T(spark, sf_dir, "orders")
    status_np = F.nullif(F.col("o_orderstatus"), F.lit("P"))
    return o.select(
        "o_orderkey",
        status_np.alias("status_np"),
        F.coalesce(status_np, F.lit("PENDING")).alias("status_filled"),
        status_np.isNull().alias("is_pending"),
        status_np.eqNullSafe(F.lit("F")).alias("nsafe_f"),
    )
