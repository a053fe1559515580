"""§2.7 Set operations (SURVEY.md).

GA clients reassemble paginated responses and merge multi-segment reports by
concatenation (`pd.concat`) [K]; the Spark equivalents are union/intersect/
except over two deterministic date slices of `orders` (overlapping so that
ALL vs DISTINCT semantics actually differ).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from google_analytics_dataframes_spark.registry import register
from google_analytics_dataframes_spark.queries._util import T

# Two overlapping half-year slices: Jan-Jun 1996 and Apr-Dec 1996.
_A_SQL = "SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-07-01'"
_B_SQL = "SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderdate >= TIMESTAMP '1996-04-01' AND o_orderdate < TIMESTAMP '1997-01-01'"


def _slice(spark: SparkSession, sf_dir: str, lo: str, hi: str) -> DataFrame:
    return (
        T(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= F.lit(lo).cast("timestamp"))
            & (F.col("o_orderdate") < F.lit(hi).cast("timestamp"))
        )
        .select("o_orderkey", "o_orderstatus")
    )


@register("u1_union_all", oracle=f"({_A_SQL}) UNION ALL ({_B_SQL})")
def u1_union_all(spark, sf_dir):
    """UNION ALL — the page/segment concat idiom (rows in the overlap
    appear twice)."""
    a = _slice(spark, sf_dir, "1996-01-01", "1996-07-01")
    b = _slice(spark, sf_dir, "1996-04-01", "1997-01-01")
    return a.unionByName(b)


@register("u2_union_distinct", oracle=f"({_A_SQL}) UNION ({_B_SQL})")
def u2_union_distinct(spark, sf_dir):
    """UNION with dedup."""
    a = _slice(spark, sf_dir, "1996-01-01", "1996-07-01")
    b = _slice(spark, sf_dir, "1996-04-01", "1997-01-01")
    return a.unionByName(b).distinct()


@register("u3_intersect", oracle=f"({_A_SQL}) INTERSECT ({_B_SQL})")
def u3_intersect(spark, sf_dir):
    """INTERSECT (distinct semantics) — the Apr-Jun overlap."""
    a = _slice(spark, sf_dir, "1996-01-01", "1996-07-01")
    b = _slice(spark, sf_dir, "1996-04-01", "1997-01-01")
    return a.intersect(b)


@register("u4_except", oracle=f"({_A_SQL}) EXCEPT ALL ({_B_SQL})")
def u4_except(spark, sf_dir):
    """EXCEPT ALL — Jan-Mar remainder, multiplicity-preserving."""
    a = _slice(spark, sf_dir, "1996-01-01", "1996-07-01")
    b = _slice(spark, sf_dir, "1996-04-01", "1997-01-01")
    return a.exceptAll(b)


@register("u6_except_distinct", oracle=f"({_A_SQL}) EXCEPT ({_B_SQL})")
def u6_except_distinct(spark, sf_dir):
    """EXCEPT (distinct semantics) — u4's multiplicity-blind sibling: one
    row per distinct Jan-Mar tuple absent from the second slice.  Spark
    plans both as a left-anti-style aggregate join; the distinct variant
    additionally dedups the left side in the same shuffle."""
    a = _slice(spark, sf_dir, "1996-01-01", "1996-07-01")
    b = _slice(spark, sf_dir, "1996-04-01", "1997-01-01")
    return a.subtract(b)


@register("u7_intersect_all", oracle=f"({_A_SQL}) INTERSECT ALL ({_B_SQL})")
def u7_intersect_all(spark, sf_dir):
    """INTERSECT ALL — multiplicity-preserving overlap (min of per-side
    duplicate counts per tuple; the slices have unique keys so it equals
    u3 here, but the OPERATOR is the bag-semantics one and the oracle
    holds on any input)."""
    a = _slice(spark, sf_dir, "1996-01-01", "1996-07-01")
    b = _slice(spark, sf_dir, "1996-04-01", "1997-01-01")
    return a.intersectAll(b)


@register(
    "u5_union_missing_cols",
    oracle="""
    SELECT o_orderkey, o_totalprice, CAST(NULL AS VARCHAR) AS o_orderpriority
    FROM orders WHERE o_orderstatus = 'F'
    UNION ALL
    SELECT o_orderkey, CAST(NULL AS DOUBLE) AS o_totalprice, o_orderpriority
    FROM orders WHERE o_orderstatus = 'O'
    """,
)
def u5_union_missing_cols(spark, sf_dir):
    """Union with schema evolution: each side is missing one column,
    null-filled by name (`unionByName(allowMissingColumns=True)`)."""
    o = T(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "F").select("o_orderkey", "o_totalprice")
    b = o.filter(F.col("o_orderstatus") == "O").select("o_orderkey", "o_orderpriority")
    return a.unionByName(b, allowMissingColumns=True)
