"""§2.6 Sorts, limits, top-k (SURVEY.md).

GA params [K]: `sort=-ga:sessions,ga:source` (multi-key, `-` = desc),
`max-results` (page size, <=10,000), `start-index` (1-based offset).

Every LIMIT/OFFSET pairs with a *total* order (unique tiebreaker) so the
selected rowset is deterministic — the driver's hash is order-insensitive
but the *membership* of a page must match.

Physical notes: o2/o5 compile to TakeOrderedAndProject (per-partition top-k
+ driver merge — no global sort); o1's full sort is a range-partitioned
exchange that scales by sampling split points (no single-node sort at 100 TB).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from google_analytics_dataframes_spark.registry import register
from google_analytics_dataframes_spark.queries._util import T


@register(
    "o1_multisort",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC NULLS LAST, o_orderstatus ASC, o_orderkey ASC
    """,
)
def o1_multisort(spark, sf_dir):
    """Multi-key mixed-direction sort with explicit null ordering
    (GA `sort=-ga:metric,ga:dim` [K])."""
    return (
        T(spark, sf_dir, "orders")
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
        .orderBy(
            F.col("o_totalprice").desc_nulls_last(),
            F.col("o_orderstatus").asc(),
            F.col("o_orderkey").asc(),
        )
    )


@register(
    "o2_limit",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 100
    """,
)
def o2_limit(spark, sf_dir):
    """Global limit under total order (GA `max-results` [K])."""
    return (
        T(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(100)
    )


@register(
    "o3_offset_page",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 100 OFFSET 100
    """,
)
def o3_offset_page(spark, sf_dir):
    """Pagination page 2 (GA `start-index` [K]): offset+limit over a total
    order — exactly the reference's page-reassembly semantics."""
    return (
        T(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .offset(100)
        .limit(100)
    )


@register(
    "o4_topk_per_group",
    oracle="""
    SELECT c_custkey, o_orderkey, o_totalprice FROM (
      SELECT o_custkey AS c_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders) t
    WHERE rn <= 3
    """,
)
def o4_topk_per_group(spark, sf_dir):
    """Top-3 orders per customer — row_number window + filter; Spark prunes
    with WindowGroupLimit (rank-limit pushdown) so partitions never
    materialize the full sort at scale."""
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), "o_orderkey"
    )
    return (
        T(spark, sf_dir, "orders")
        .select(
            F.col("o_custkey").alias("c_custkey"),
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 3)
        .drop("rn")
    )


@register(
    "o5_global_topk",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
    ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 10
    """,
)
def o5_global_topk(spark, sf_dir):
    """Global top-k -> TakeOrderedAndProject (per-partition heap + merge)."""
    return (
        T(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy(F.col("l_extendedprice").desc(), "l_orderkey", "l_linenumber")
        .limit(10)
    )
