"""§2.14 Composite analytic suite — the 22 classic decision-support query
shapes (TPC-H Q1-Q22, public spec) adapted to the driver's trimmed star
schema (TESTDATA.md: no ``partsupp`` table; ``lineitem`` has no
commit/receipt dates or ship modes; ``customer`` has no phone).

Why this family exists: every individual operator in §2.2-2.8 is already
registered and oracle-proven, but a user of the reference runs *composite*
reports — multi-join, subquery-nested, aggregate-over-join plans where the
optimizer's join ordering, decorrelation, and pushdown decisions interact.
This suite registers the canonical public corpus of such shapes, one row
per query, each hash-checked against DuckDB like everything else:

* h1  pricing summary (full 8-aggregate form; a1/a2 cover only fragments)
* h2  correlated scalar MIN subquery over a derived part-supplier relation
* h3  top-k revenue over a 3-table join
* h4  EXISTS semi-join with a non-equi date conjunct
* h5  6-table snowflake join with a cross-dimension nation equality
* h6  tight-range scan aggregate (full pushdown)
* h7  bidirectional nation-pair volume (OR of AND over two dim branches)
* h8  market-share ratio (conditional sum / sum) per year
* h9  product profit (expression over 5-table join), by nation x year
* h10 returned-item revenue top-k
* h11 group-HAVING against a global scalar threshold
* h12 dual conditional counts after a date-arithmetic filter
* h13 distribution-of-counts (left join preserving empty groups, 2-level agg)
* h14 promo revenue share (conditional ratio, single row)
* h15 scalar MAX subquery over a named CTE used twice
* h16 COUNT(DISTINCT) per group with a NOT IN blacklist subquery
* h17 per-group mean threshold (decorrelated: pre-aggregated join)
* h18 IN (GROUP BY ... HAVING) subquery over the fact table
* h19 disjunction of three brand/size/quantity conjunct blocks
* h20 nested IN subqueries (parts by name -> suppliers by shipped volume)
* h21 EXISTS + NOT EXISTS self-joins on the fact table
* h22 anti-join with uncorrelated scalar average threshold

SQL-entry vs DataFrame-entry: h2/h15/h16/h18/h20/h21/h22 run through
``spark.sql`` over temp views so Catalyst's subquery machinery
(RewriteCorrelatedScalarSubquery, null-aware anti join for NOT IN,
ReuseSubquery for the CTE) is exercised as a user would hit it; the rest
build DataFrame plans directly.  Both entries land in the same optimizer,
so the suite doubles as evidence the two §3.2 entry points agree.

Float determinism: every money aggregate goes through the exact-decimal
``dsum``/``davg`` pair (determinism.py); mean-threshold comparisons are
restated multiplicatively (5*qty*cnt < sum instead of qty < 0.2*sum/cnt)
so no engine-divergent division decides row membership.

100-TB posture: dimension sides (region/nation/customer/supplier/part) are
megabytes at any scale and broadcast; every fact-side plan keeps the big
table un-sorted and un-replicated — aggregates reduce before joins where
the shape allows, and AQE re-plans the rest.  No query here collects or
iterates on the driver.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from google_analytics_dataframes_spark.registry import register
from google_analytics_dataframes_spark.queries._util import (
    T,
    davg,
    davg_sql,
    dsum,
    dsum_sql,
    fmt_d,
    FMT_D_SQL,
)


def _hv(spark, sf_dir, *names):
    """Register ``h_<table>`` temp views for the SQL-entry queries (overwrite
    semantics make the shared prefix safe across sf_dirs within a session)."""
    for n in names:
        T(spark, sf_dir, n).createOrReplaceTempView(f"h_{n}")


_REV = "l_extendedprice * (1 - l_discount)"


def _rev():
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


# --------------------------------------------------------------------------
# h1 — pricing summary report (Q1 shape, all eight aggregates)
# --------------------------------------------------------------------------
@register(
    "h1_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {dsum_sql('l_quantity')} AS sum_qty,
           {dsum_sql('l_extendedprice')} AS sum_base_price,
           {dsum_sql(_REV)} AS sum_disc_price,
           {dsum_sql('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
           {davg_sql('l_quantity')} AS avg_qty,
           {davg_sql('l_extendedprice')} AS avg_price,
           {davg_sql('l_discount')} AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-01'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def h1_pricing_summary(spark, sf_dir):
    """Q1 shape: the full eight-aggregate pricing summary.  One scan, one
    hash aggregate on a 6-value key — map-side partials do nearly all the
    work, so the shuffle carries 6 rows per partition at any scale.

    Round 14 (guide §2.5 input skew): the nine decimal partial aggregates
    are pipelined onto the scan, and a single-row-group local input scans
    as ONE partition — 1.9 s of BigDecimal accumulation on one core of 32.
    ``fanout(by=l_orderkey)`` engages every core ahead of the partials
    (hash exchange, no round-robin pre-sort) and is an explicit no-op on
    multi-split inputs, i.e. at any real scale.  Measured 1.57 -> 0.62 s;
    decimal sums are exactly associative, so the result is order-
    independent bit-for-bit."""
    from google_analytics_dataframes_spark.io import fanout

    li = fanout(
        T(spark, sf_dir, "lineitem").filter(
            F.col("l_shipdate") <= F.lit("2001-09-01").cast("timestamp")
        ),
        by=("l_orderkey",),
    )
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        dsum("l_quantity").alias("sum_qty"),
        dsum("l_extendedprice").alias("sum_base_price"),
        dsum(_rev()).alias("sum_disc_price"),
        dsum(_rev() * (1 + F.col("l_tax"))).alias("sum_charge"),
        davg("l_quantity").alias("avg_qty"),
        davg("l_extendedprice").alias("avg_price"),
        davg("l_discount").alias("avg_disc"),
        F.count("*").alias("count_order"),
    )


# --------------------------------------------------------------------------
# h2 — minimum-balance supplier per part (Q2 shape, adapted: the
# part-supplier relation is derived from lineitem since partsupp is absent,
# and the correlated MIN targets s_acctbal instead of ps_supplycost)
# --------------------------------------------------------------------------
_H2_BODY = """
    WITH qual_parts AS (
        SELECT p_partkey, p_name FROM {part}
        WHERE p_type = 'LARGE' AND p_size >= 40
    ),
    part_sup AS (
        SELECT DISTINCT l_partkey, l_suppkey FROM {li}
        WHERE l_partkey IN (SELECT p_partkey FROM qual_parts)
    )
    SELECT s.s_name, p.p_partkey, p.p_name, s.s_acctbal, n.n_name
    FROM qual_parts p
    JOIN part_sup ps ON p.p_partkey = ps.l_partkey
    JOIN {sup} s ON ps.l_suppkey = s.s_suppkey
    JOIN {nat} n ON s.s_nationkey = n.n_nationkey
    JOIN {reg} r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'EUROPE'
      AND s.s_acctbal = (
          SELECT MIN(s2.s_acctbal)
          FROM part_sup ps2
          JOIN {sup} s2 ON ps2.l_suppkey = s2.s_suppkey
          JOIN {nat} n2 ON s2.s_nationkey = n2.n_nationkey
          JOIN {reg} r2 ON n2.n_regionkey = r2.r_regionkey
          WHERE ps2.l_partkey = p.p_partkey AND r2.r_name = 'EUROPE')
"""


@register(
    "h2_min_bal_supplier",
    oracle=_H2_BODY.format(
        li="lineitem", part="part", sup="supplier", nat="nation", reg="region"
    ),
)
def h2_min_bal_supplier(spark, sf_dir):
    """Q2 shape: correlated scalar MIN subquery.  SQL entry on purpose —
    Catalyst decorrelates the subquery into an aggregate join on
    p_partkey (RewriteCorrelatedScalarSubquery), which is the plan a user
    writing the textbook SQL gets.  MIN is an exact selection (no float
    arithmetic), so the equality predicate is engine-stable.

    Scale note: the derived part-supplier relation is pre-restricted to
    qualifying parts (IN semi-join) BEFORE its DISTINCT — Catalyst does
    not push the outer part predicate through the subquery's aggregate on
    its own, and without it both part_sup branches distinct the full fact
    table (measured sf0.1: 20.1 s -> 2.5 s; at 100 TB the difference is a
    full-corpus shuffle x2)."""
    _hv(spark, sf_dir, "lineitem", "part", "supplier", "nation", "region")
    return spark.sql(
        _H2_BODY.format(
            li="h_lineitem",
            part="h_part",
            sup="h_supplier",
            nat="h_nation",
            reg="h_region",
        )
    )


# --------------------------------------------------------------------------
# h3 — shipping-priority top 10 (Q3 shape; o_orderpriority stands in for
# the absent o_shippriority)
# --------------------------------------------------------------------------
@register(
    "h3_shipping_priority",
    oracle=f"""
    SELECT l.l_orderkey AS o_orderkey,
           {dsum_sql(_REV)} AS revenue,
           {FMT_D_SQL.format(expr='o.o_orderdate')} AS orderdate,
           o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1997-03-15'
      AND l.l_shipdate > TIMESTAMP '1997-03-15'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, o.o_orderdate, l.l_orderkey
    LIMIT 10
    """,
)
def h3_shipping_priority(spark, sf_dir):
    """Q3 shape: unshipped-orders revenue top 10.  The customer dim filters
    to one segment and broadcasts; the orderkey tiebreak makes the LIMIT
    rowset total-ordered and deterministic."""
    c = T(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = T(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1997-03-15").cast("timestamp")
    )
    li = T(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1997-03-15").cast("timestamp")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(_rev()).alias("revenue"))
        .select(
            F.col("l_orderkey").alias("o_orderkey"),
            "revenue",
            fmt_d("o_orderdate").alias("orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.desc("revenue"), "orderdate", "o_orderkey")
        .limit(10)
    )


# --------------------------------------------------------------------------
# h4 — order-priority checking (Q4 shape, adapted: "late" = shipped more
# than 60 days after the order date, since commit/receipt dates are absent)
# --------------------------------------------------------------------------
@register(
    "h4_order_priority",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
      AND o.o_orderdate < TIMESTAMP '1997-04-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
    GROUP BY o_orderpriority
    """,
)
def h4_order_priority(spark, sf_dir):
    """Q4 shape: EXISTS with a non-equi date conjunct -> left-semi join on
    the equi key with the date predicate evaluated on co-located rows (no
    nested loop), then a 5-value-key count."""
    o = T(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    li = T(spark, sf_dir, "lineitem")
    late = (li.l_orderkey == o.o_orderkey) & (
        li.l_shipdate > o.o_orderdate + F.expr("INTERVAL 60 DAYS")
    )
    return (
        o.join(li, late, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


# --------------------------------------------------------------------------
# h5 — local-supplier volume (Q5 shape: the cross-dimension equality
# c_nationkey = s_nationkey is the defining feature)
# --------------------------------------------------------------------------
@register(
    "h5_local_supplier_volume",
    oracle=f"""
    SELECT n.n_name, {dsum_sql(_REV)} AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY n.n_name
    """,
)
def h5_local_supplier_volume(spark, sf_dir):
    """Q5 shape: 6-table snowflake with the customer-nation = supplier-nation
    equality.  supplier/nation/region broadcast; the fact table shuffles
    once on orderkey and the nation equality filters co-located rows."""
    c = T(spark, sf_dir, "customer")
    o = T(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = T(spark, sf_dir, "lineitem")
    s = T(spark, sf_dir, "supplier")
    n = T(spark, sf_dir, "nation")
    r = T(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(dsum(_rev()).alias("revenue"))
    )


# --------------------------------------------------------------------------
# h6 — forecast revenue change (Q6 shape: pure scan aggregate)
# --------------------------------------------------------------------------
@register(
    "h6_forecast_revenue",
    oracle=f"""
    SELECT {dsum_sql('l_extendedprice * l_discount')} AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount >= 0.05 AND l_discount <= 0.07
      AND l_quantity < 24
    """,
)
def h6_forecast_revenue(spark, sf_dir):
    """Q6 shape: tight multi-predicate scan -> single global aggregate.
    Every predicate pushes to the parquet scan; the aggregate ships one
    partial row per partition."""
    li = T(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(dsum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"))


# --------------------------------------------------------------------------
# h7 — volume shipping between two nations (Q7 shape)
# --------------------------------------------------------------------------
@register(
    "h7_volume_shipping",
    oracle=f"""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
           {dsum_sql(_REV)} AS volume
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
        OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
      AND l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY n1.n_name, n2.n_name, CAST(year(l.l_shipdate) AS BIGINT)
    """,
)
def h7_volume_shipping(spark, sf_dir):
    """Q7 shape: bidirectional nation pair.  Both nation branches broadcast;
    the OR-of-ANDs evaluates after the equi-joins on co-located rows."""
    li = T(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    o = T(spark, sf_dir, "orders")
    c = T(spark, sf_dir, "customer")
    s = T(spark, sf_dir, "supplier")
    n1 = T(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = T(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_7")
    ) | ((F.col("supp_nation") == "NATION_7") & (F.col("cust_nation") == "NATION_3"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), s.s_nationkey == F.col("n1_key"))
        .join(F.broadcast(n2), c.c_nationkey == F.col("n2_key"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(dsum(_rev()).alias("volume"))
    )


# --------------------------------------------------------------------------
# h8 — national market share (Q8 shape)
# --------------------------------------------------------------------------
@register(
    "h8_market_share",
    oracle=f"""
    SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
           {dsum_sql("CASE WHEN n2.n_name = 'NATION_5' THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0 END")}
           / {dsum_sql('l.l_extendedprice * (1 - l.l_discount)')} AS mkt_share
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
    JOIN region r ON n1.n_regionkey = r.r_regionkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
    WHERE r.r_name = 'AMERICA' AND p.p_type = 'ECONOMY'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1998-01-01'
    GROUP BY CAST(year(o.o_orderdate) AS BIGINT)
    """,
)
def h8_market_share(spark, sf_dir):
    """Q8 shape: one nation's share of a region's part-type volume per
    year.  Numerator and denominator are both exact-decimal sums, so the
    double division is bit-identical across engines."""
    li = T(spark, sf_dir, "lineitem")
    p = T(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    o = T(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    c = T(spark, sf_dir, "customer")
    n1 = T(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    r = T(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    s = T(spark, sf_dir, "supplier")
    n2 = T(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    vol = _rev()
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), c.c_nationkey == F.col("n1_key"))
        .join(F.broadcast(r), F.col("n1_region") == r.r_regionkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n2), s.s_nationkey == F.col("n2_key"))
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            (
                dsum(F.when(F.col("supp_nation") == "NATION_5", vol).otherwise(0.0))
                / dsum(vol)
            ).alias("mkt_share")
        )
    )


# --------------------------------------------------------------------------
# h9 — product-type profit (Q9 shape, adapted: cost proxy is
# 0.5 * p_retailprice since ps_supplycost is absent)
# --------------------------------------------------------------------------
@register(
    "h9_product_profit",
    oracle=f"""
    SELECT n.n_name AS nation, CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
           {dsum_sql('l.l_extendedprice * (1 - l.l_discount) - 0.5 * p.p_retailprice * l.l_quantity')} AS sum_profit
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE contains(p.p_name, 'red')
    GROUP BY n.n_name, CAST(year(o.o_orderdate) AS BIGINT)
    """,
)
def h9_product_profit(spark, sf_dir):
    """Q9 shape: profit expression over a 5-table join, grouped by supplier
    nation x order year.  The profit expression is evaluated left-to-right
    identically in both engines before the exact-decimal sum."""
    li = T(spark, sf_dir, "lineitem")
    p = T(spark, sf_dir, "part").filter(F.col("p_name").contains("red"))
    s = T(spark, sf_dir, "supplier")
    o = T(spark, sf_dir, "orders")
    n = T(spark, sf_dir, "nation")
    profit = _rev() - 0.5 * F.col("p_retailprice") * F.col("l_quantity")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(dsum(profit).alias("sum_profit"))
    )


# --------------------------------------------------------------------------
# h10 — returned-item reporting (Q10 shape, top 20)
# --------------------------------------------------------------------------
@register(
    "h10_returned_items",
    oracle=f"""
    SELECT c.c_custkey, c.c_name, {dsum_sql(_REV)} AS revenue,
           c.c_acctbal, n.n_name
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1996-10-01'
      AND o.o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
    """,
)
def h10_returned_items(spark, sf_dir):
    """Q10 shape: revenue lost to returns per customer, top 20.  Customer
    and nation broadcast; custkey tiebreak pins the LIMIT rowset."""
    c = T(spark, sf_dir, "customer")
    o = T(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-10-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = T(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = T(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(dsum(_rev()).alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


# --------------------------------------------------------------------------
# h11 — important part values (Q11 shape, adapted: per-part shipped value
# from two nations' suppliers, HAVING above a global-fraction threshold)
# --------------------------------------------------------------------------
@register(
    "h11_important_parts",
    oracle=f"""
    WITH vals AS (
        SELECT l.l_partkey, {dsum_sql(_REV)} AS value
        FROM lineitem l
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        WHERE n.n_name IN ('NATION_1', 'NATION_2')
        GROUP BY l.l_partkey
    )
    SELECT l_partkey, value FROM vals
    WHERE 2 * value * (SELECT COUNT(*) FROM vals)
          > 5 * (SELECT {dsum_sql('value')} FROM vals)
    """,
)
def h11_important_parts(spark, sf_dir):
    """Q11 shape: group values filtered against a global scalar threshold.
    The single-row global aggregate broadcasts back over the per-part
    values — no second scan of the fact table, no sort.

    The spec's fixed global fraction would be scale-DEpendent (at 10x the
    parts, every part's share of the total shrinks 10x and the result
    empties), so the threshold is 2.5x the mean per-part value, restated
    multiplicatively (2 * value * n > 5 * total) over exact-decimal sums
    — scale-free membership with no engine-divergent division."""
    li = T(spark, sf_dir, "lineitem")
    s = T(spark, sf_dir, "supplier")
    n = T(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_1", "NATION_2")
    )
    vals = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("l_partkey")
        .agg(dsum(_rev()).alias("value"))
    )
    total = vals.agg(
        dsum("value").alias("tot"), F.count("*").alias("n_parts")
    )
    return (
        vals.join(F.broadcast(total))
        .filter(2 * F.col("value") * F.col("n_parts") > 5 * F.col("tot"))
        .select("l_partkey", "value")
    )


# --------------------------------------------------------------------------
# h12 — shipping-delay priority counts (Q12 shape, adapted: group by
# l_linestatus since l_shipmode is absent; "late" = shipped >= 30 days
# after the order date)
# --------------------------------------------------------------------------
@register(
    "h12_priority_counts",
    oracle="""
    SELECT l.l_linestatus,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate >= o.o_orderdate + INTERVAL 30 DAY
      AND l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate < TIMESTAMP '1997-01-01'
    GROUP BY l.l_linestatus
    """,
)
def h12_priority_counts(spark, sf_dir):
    """Q12 shape: dual conditional counts over a date-arithmetic join
    filter.  Integer counts — no float surface at all."""
    li = T(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    o = T(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(
            o,
            (li.l_orderkey == o.o_orderkey)
            & (li.l_shipdate >= o.o_orderdate + F.expr("INTERVAL 30 DAYS")),
        )
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("long").alias("low_line_count"),
        )
    )


# --------------------------------------------------------------------------
# h13 — customer order-count distribution (Q13 shape; the order filter is
# on o_orderpriority since o_comment is absent)
# --------------------------------------------------------------------------
@register(
    "h13_count_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
        SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
        FROM customer c
        LEFT JOIN orders o ON c.c_custkey = o.o_custkey
                          AND o.o_orderpriority <> '4-NOT SPECIFIED'
        GROUP BY c.c_custkey
    )
    GROUP BY c_count
    """,
)
def h13_count_distribution(spark, sf_dir):
    """Q13 shape: distribution of per-customer order counts.  The LEFT join
    keeps customers whose every order is filtered out (c_count = 0) — the
    GA keep-empty-rows semantic at composite-query scale."""
    c = T(spark, sf_dir, "customer")
    o = T(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "4-NOT SPECIFIED"
    )
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy(c.c_custkey)
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


# --------------------------------------------------------------------------
# h14 — promotion revenue share (Q14 shape)
# --------------------------------------------------------------------------
@register(
    "h14_promo_share",
    oracle=f"""
    SELECT 100.0 * {dsum_sql("CASE WHEN p.p_type = 'PROMO' THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0 END")}
           / {dsum_sql('l.l_extendedprice * (1 - l.l_discount)')} AS promo_revenue
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-09-01'
      AND l.l_shipdate < TIMESTAMP '1996-10-01'
    """,
)
def h14_promo_share(spark, sf_dir):
    """Q14 shape: promo share of one month's revenue — conditional ratio,
    single output row.  Part broadcasts; both ratio legs are exact-decimal
    sums so the division is engine-stable."""
    li = T(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    p = T(spark, sf_dir, "part")
    vol = _rev()
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            (
                F.lit(100.0)
                * dsum(F.when(F.col("p_type") == "PROMO", vol).otherwise(0.0))
                / dsum(vol)
            ).alias("promo_revenue")
        )
    )


# --------------------------------------------------------------------------
# h15 — top supplier (Q15 shape: CTE + scalar MAX subquery over it)
# --------------------------------------------------------------------------
_H15_BODY = f"""
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               {dsum_sql(_REV)} AS total_revenue
        FROM {{li}}
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1996-04-01'
        GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM {{sup}} s JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
"""


@register(
    "h15_top_supplier",
    oracle=_H15_BODY.format(li="lineitem", sup="supplier"),
)
def h15_top_supplier(spark, sf_dir):
    """Q15 shape: quarter revenue per supplier, keep the max.  SQL entry:
    the CTE is referenced twice (join input + scalar MAX subquery) —
    Catalyst's subquery reuse surface.  MAX over identical exact-decimal
    doubles selects, never computes, so the equality is engine-stable."""
    _hv(spark, sf_dir, "lineitem", "supplier")
    return spark.sql(_H15_BODY.format(li="h_lineitem", sup="h_supplier"))


# --------------------------------------------------------------------------
# h16 — supplier-count by part attributes (Q16 shape: the part-supplier
# relation is derived from lineitem; blacklist = negative-balance suppliers)
# --------------------------------------------------------------------------
_H16_BODY = """
    SELECT p.p_brand, p.p_type, p.p_size,
           COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM {part} p JOIN {li} l ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#3' AND p.p_type <> 'PROMO'
      AND p.p_size IN (1, 10, 20, 30, 40, 50)
      AND l.l_suppkey NOT IN
          (SELECT s_suppkey FROM {sup} WHERE s_acctbal < 0)
    GROUP BY p.p_brand, p.p_type, p.p_size
"""


@register(
    "h16_supplier_counts",
    oracle=_H16_BODY.format(part="part", li="lineitem", sup="supplier"),
)
def h16_supplier_counts(spark, sf_dir):
    """Q16 shape: COUNT(DISTINCT supplier) per part attribute triple with a
    NOT IN blacklist.  SQL entry: NOT IN over a non-nullable key becomes
    Catalyst's null-aware anti join — a distinct physical surface from the
    DataFrame left_anti used by j8."""
    _hv(spark, sf_dir, "part", "lineitem", "supplier")
    return spark.sql(_H16_BODY.format(part="h_part", li="h_lineitem", sup="h_supplier"))


# --------------------------------------------------------------------------
# h17 — small-quantity-order revenue (Q17 shape, decorrelated join form;
# the mean threshold is restated multiplicatively to stay float-exact)
# --------------------------------------------------------------------------
@register(
    "h17_small_qty_revenue",
    oracle=f"""
    WITH pq AS (
        SELECT l_partkey, COUNT(*) AS cnt,
               SUM(CAST(l_quantity AS DECIMAL(30,6))) AS sq
        FROM lineitem
        WHERE l_partkey IN (SELECT p_partkey FROM part
                            WHERE p_brand = 'Brand#1')
        GROUP BY l_partkey
    )
    SELECT {dsum_sql('l.l_extendedprice')} / 7.0 AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN pq ON pq.l_partkey = p.p_partkey
    WHERE p.p_brand = 'Brand#1'
      AND 5 * CAST(l.l_quantity AS DECIMAL(30,6)) * pq.cnt < pq.sq
    """,
)
def h17_small_qty_revenue(spark, sf_dir):
    """Q17 shape: lineitems below 20% of their part's mean quantity.  The
    textbook correlated AVG subquery is written in its decorrelated form
    (pre-aggregated per-part join) — the plan Catalyst produces anyway —
    and the threshold `qty < 0.2 * avg` is restated as
    `5 * qty * cnt < sum` over exact decimals, so no float division
    decides membership in either engine.

    Scale note (h2's lesson applied here too, review r8): pq is
    pre-restricted to the brand's partkeys with a broadcast semi-join
    BEFORE its aggregate — the downstream equi-join discards every other
    pq row anyway, and Catalyst cannot push that restriction through the
    aggregate itself, so without it the per-part stats would group the
    full fact table for a 1/25-brand consumer."""
    li = T(spark, sf_dir, "lineitem")
    p = T(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1")
    pq = (
        li.join(
            F.broadcast(p.select("p_partkey")),
            li.l_partkey == F.col("p_partkey"),
            "left_semi",
        )
        .groupBy(F.col("l_partkey").alias("pq_partkey"))
        .agg(
            F.count("*").alias("cnt"),
            F.sum(F.col("l_quantity").cast("decimal(30,6)")).alias("sq"),
        )
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(pq, p.p_partkey == F.col("pq_partkey"))
        .filter(
            5 * F.col("l_quantity").cast("decimal(30,6)") * F.col("cnt")
            < F.col("sq")
        )
        .agg((dsum("l_extendedprice") / 7.0).alias("avg_yearly"))
    )


# --------------------------------------------------------------------------
# h18 — large-volume customers (Q18 shape)
# --------------------------------------------------------------------------
_H18_BODY = f"""
    SELECT c.c_name, c.c_custkey, o.o_orderkey,
           {{fmt_date}} AS orderdate,
           o.o_totalprice, {dsum_sql('l.l_quantity')} AS sum_qty
    FROM {{cust}} c
    JOIN {{ord}} o ON c.c_custkey = o.o_custkey
    JOIN {{li}} l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (
        SELECT l_orderkey FROM {{li}}
        GROUP BY l_orderkey
        HAVING SUM(CAST(l_quantity AS DECIMAL(30,6))) > 180
    )
    GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
    ORDER BY o.o_totalprice DESC, o.o_orderkey
    LIMIT 100
"""


@register(
    "h18_large_volume_customers",
    oracle=_H18_BODY.format(
        cust="customer",
        ord="orders",
        li="lineitem",
        fmt_date=FMT_D_SQL.format(expr="o.o_orderdate"),
    ),
)
def h18_large_volume_customers(spark, sf_dir):
    """Q18 shape: orders whose total quantity clears a threshold, via an
    IN (GROUP BY ... HAVING) subquery on the fact table.  SQL entry —
    Catalyst turns the IN into a left-semi join against the aggregated
    subquery; the HAVING sum is exact decimal so membership is stable."""
    _hv(spark, sf_dir, "customer", "orders", "lineitem")
    return spark.sql(
        _H18_BODY.format(
            cust="h_customer",
            ord="h_orders",
            li="h_lineitem",
            fmt_date="date_format(o.o_orderdate, 'yyyy-MM-dd')",
        )
    )


# --------------------------------------------------------------------------
# h19 — discounted revenue over disjunct blocks (Q19 shape; p_size ranges
# stand in for the absent p_container)
# --------------------------------------------------------------------------
@register(
    "h19_disjunct_revenue",
    oracle=f"""
    SELECT {dsum_sql(_REV)} AS revenue
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 5
           AND l.l_quantity >= 1 AND l.l_quantity <= 11)
       OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 10
           AND l.l_quantity >= 10 AND l.l_quantity <= 20)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity >= 20 AND l.l_quantity <= 30)
    """,
)
def h19_disjunct_revenue(spark, sf_dir):
    """Q19 shape: OR of three brand/size/quantity conjunct blocks.  The
    part side of each disjunct prunes the broadcast build; the quantity
    legs filter the probe side post-join."""
    li = T(spark, sf_dir, "lineitem")
    p = T(spark, sf_dir, "part")
    q = F.col("l_quantity")
    blocks = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 5)
            & (q >= 1)
            & (q <= 11)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(1, 10)
            & (q >= 10)
            & (q <= 20)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 15)
            & (q >= 20)
            & (q <= 30)
        )
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .filter(blocks)
        .agg(dsum(_rev()).alias("revenue"))
    )


# --------------------------------------------------------------------------
# h20 — potential excess suppliers (Q20 shape, adapted: shipped volume of
# 'red' parts stands in for the absent ps_availqty relation)
# --------------------------------------------------------------------------
_H20_BODY = """
    SELECT s.s_name, n.n_name
    FROM {sup} s JOIN {nat} n ON s.s_nationkey = n.n_nationkey
                 JOIN {reg} r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND s.s_suppkey IN (
          SELECT l_suppkey FROM {li}
          WHERE l_partkey IN
                (SELECT p_partkey FROM {part} WHERE contains(p_name, 'red'))
            AND l_shipdate >= TIMESTAMP '1996-01-01'
            AND l_shipdate < TIMESTAMP '1998-01-01'
          GROUP BY l_suppkey
          HAVING SUM(CAST(l_quantity AS DECIMAL(30,6))) > 150
      )
"""


@register(
    "h20_excess_suppliers",
    oracle=_H20_BODY.format(
        sup="supplier", nat="nation", reg="region", li="lineitem", part="part"
    ),
)
def h20_excess_suppliers(spark, sf_dir):
    """Q20 shape: nested IN subqueries — suppliers (in one region) whose
    two-year shipped volume of name-matched parts clears a threshold.
    SQL entry: the inner IN prunes the fact scan through a broadcast
    semi-join on partkey before the group-HAVING runs."""
    _hv(spark, sf_dir, "supplier", "nation", "region", "lineitem", "part")
    return spark.sql(
        _H20_BODY.format(
            sup="h_supplier",
            nat="h_nation",
            reg="h_region",
            li="h_lineitem",
            part="h_part",
        )
    )


# --------------------------------------------------------------------------
# h21 — suppliers who kept orders waiting (Q21 shape, adapted: "late" =
# shipped > 90 days after the order date, since receipt/commit dates are
# absent; supplier scope widened to a region so the result is non-trivial
# at small sf)
# --------------------------------------------------------------------------
_H21_BODY = """
    SELECT s.s_name, COUNT(*) AS numwait
    FROM {sup} s
    JOIN {nat} n ON s.s_nationkey = n.n_nationkey
    JOIN {reg} r ON n.n_regionkey = r.r_regionkey
    JOIN {li} l1 ON s.s_suppkey = l1.l_suppkey
    JOIN {ord} o ON o.o_orderkey = l1.l_orderkey
    WHERE r.r_name = 'ASIA' AND o.o_orderstatus = 'F'
      AND l1.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
      AND EXISTS (SELECT 1 FROM {li} l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM {li} l3
                      JOIN {ord} o3 ON o3.o_orderkey = l3.l_orderkey
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > o3.o_orderdate + INTERVAL 90 DAY)
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    LIMIT 20
"""


@register(
    "h21_waiting_orders",
    oracle=_H21_BODY.format(
        sup="supplier", nat="nation", reg="region", li="lineitem", ord="orders"
    ),
)
def h21_waiting_orders(spark, sf_dir):
    """Q21 shape: the sole late supplier on multi-supplier orders — EXISTS
    plus NOT EXISTS self-joins on the fact table, both correlated on the
    order key.  SQL entry: Catalyst plans them as semi/anti joins
    co-partitioned with the outer fact scan on l_orderkey."""
    _hv(spark, sf_dir, "supplier", "nation", "region", "lineitem", "orders")
    return spark.sql(
        _H21_BODY.format(
            sup="h_supplier",
            nat="h_nation",
            reg="h_region",
            li="h_lineitem",
            ord="h_orders",
        )
    )


# --------------------------------------------------------------------------
# h22 — global sales opportunity (Q22 shape, adapted: the country code is
# the last-two-digits slice of c_name since c_phone is absent, and the
# anti-join excludes customers with *urgent* orders since every customer
# here has at least one order)
# --------------------------------------------------------------------------
_H22_BODY = f"""
    SELECT cntrycode, COUNT(*) AS numcust,
           {dsum_sql('c_acctbal')} AS totacctbal
    FROM (
        SELECT substring(c.c_name, 17, 2) AS cntrycode, c.c_acctbal
        FROM {{cust}} c
        WHERE substring(c.c_name, 17, 2) IN ('13', '31', '23', '29', '30')
          AND CAST(c.c_acctbal AS DECIMAL(30,6)) *
              (SELECT COUNT(*) FROM {{cust}} c2
               WHERE c2.c_acctbal > 0.0
                 AND substring(c2.c_name, 17, 2)
                     IN ('13', '31', '23', '29', '30'))
              > (SELECT SUM(CAST(c2.c_acctbal AS DECIMAL(30,6)))
                 FROM {{cust}} c2
                 WHERE c2.c_acctbal > 0.0
                   AND substring(c2.c_name, 17, 2)
                       IN ('13', '31', '23', '29', '30'))
          AND NOT EXISTS (SELECT 1 FROM {{ord}} o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_orderpriority = '1-URGENT')
    )
    GROUP BY cntrycode
"""


@register(
    "h22_sales_opportunity",
    oracle=_H22_BODY.format(cust="customer", ord="orders"),
)
def h22_sales_opportunity(spark, sf_dir):
    """Q22 shape: above-average-balance customers with no urgent orders,
    grouped by country code.  SQL entry: two uncorrelated scalar
    subqueries (count + exact-decimal sum — the mean comparison restated
    multiplicatively, no division) plus a correlated NOT EXISTS anti
    join.  The scalar subqueries evaluate once and broadcast."""
    _hv(spark, sf_dir, "customer", "orders")
    return spark.sql(_H22_BODY.format(cust="h_customer", ord="h_orders"))
