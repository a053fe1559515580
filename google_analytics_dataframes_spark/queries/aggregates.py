"""§2.4 Aggregations (SURVEY.md) — the heart of the reference.

Every GA query is `GROUP BY dimensions -> aggregate metrics` [K]: `metrics`
are sums/counts (sessions, pageviews), count-distincts (users), ratios
(bounceRate) and averages (avgSessionDuration); `totalsForAllResults` is the
ungrouped twin; v4 adds `pivots` and `histogramBuckets`.

Spark physicals: HashAggregateExec with partial (map-side) + final phases —
the shuffle moves pre-aggregated partials, not raw rows, so a1-a16 scale with
group cardinality, not input size.  Float sums use exact decimal accumulation
(see queries/_util.py) so results are order-independent and hash-match DuckDB.

Type hygiene vs DuckDB: SUM(BIGINT) is HUGEINT in DuckDB and year() is
BIGINT — oracles cast to BIGINT; Spark casts year()/month() to long.
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
    r6,
)


@register(
    "a1_groupby_sum",
    oracle=f"""
    SELECT event_type, {dsum_sql('value')} AS sum_value, COUNT(*) AS n_events
    FROM events GROUP BY event_type
    """,
)
def a1_groupby_sum(spark, sf_dir):
    """Single-dimension report: "sessions by source" analog
    (GA `dimensions=ga:source&metrics=ga:sessions` [K])."""
    return (
        T(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(dsum("value").alias("sum_value"), F.count("*").alias("n_events"))
    )


@register(
    "a2_multi_agg",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {dsum_sql('l_quantity')} AS sum_qty,
           {dsum_sql('l_extendedprice')} AS sum_base_price,
           {dsum_sql('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
           {davg_sql('l_quantity')} AS avg_qty,
           MIN(l_extendedprice) AS min_price,
           MAX(l_extendedprice) AS max_price,
           COUNT(*) AS count_order
    FROM lineitem GROUP BY l_returnflag, l_linestatus
    """,
)
def a2_multi_agg(spark, sf_dir):
    """Multi-metric single pass (GA up-to-10-`metrics` [K]); TPC-H Q1 shape.

    Round 14: ``fanout(by=l_orderkey)`` ahead of the decimal partials —
    single-row-group local inputs pin the partial aggregation to one core
    (h1's finding, guide §2.5); hash fanout measured 1.23 -> 0.71 s at
    sf0.1 and is a no-op on any multi-split (real-scale) input.  Decimal
    sums are exactly associative, so the result is order-independent."""
    from google_analytics_dataframes_spark.io import fanout

    li = fanout(T(spark, sf_dir, "lineitem"), by=("l_orderkey",))
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        dsum("l_quantity").alias("sum_qty"),
        dsum("l_extendedprice").alias("sum_base_price"),
        dsum(disc_price).alias("sum_disc_price"),
        davg("l_quantity").alias("avg_qty"),
        F.min("l_extendedprice").alias("min_price"),
        F.max("l_extendedprice").alias("max_price"),
        F.count("*").alias("count_order"),
    )


@register(
    "a3_count_distinct",
    oracle="""
    SELECT event_type, COUNT(DISTINCT user_id) AS users, COUNT(*) AS hits
    FROM events GROUP BY event_type
    """,
)
def a3_count_distinct(spark, sf_dir):
    """Exact distinct count (GA `ga:users` [K]).  Spark plans this as a
    two-phase expand+agg; exact is fine at report cardinalities, a4 is the
    100-TB path."""
    return (
        T(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("users"),
            F.count("*").alias("hits"),
        )
    )


@register(
    "a4_approx_distinct",
    oracle="""
    SELECT event_type, COUNT(DISTINCT user_id) AS exact_users,
           TRUE AS within_rsd
    FROM events GROUP BY event_type
    """,
)
def a4_approx_distinct(spark, sf_dir):
    """Approximate distinct via HyperLogLog++ (GA `samplingLevel` tolerance
    analog [K]; the scale path for `users` at 100 TB — constant memory per
    group vs expand-shuffle for exact).  The raw estimate differs from
    DuckDB's HLL, so the query emits a TOLERANCE AUDIT the driver can hash
    (VERDICT r4 item #4 pattern, upgraded from rows-only in round 5): the
    exact per-group distinct count plus a flag asserting the HLL++ estimate
    (rsd 0.01) landed within 5x its configured rsd of the exact answer —
    a broken sketch flips the flag and fails the value hash.  The oracle
    recomputes the exact count and states the guarantee.

    The exact and approx aggregates run as TWO separate jobs joined on the
    5-row result, never one combined agg: Spark rewrites a mixed
    distinct/non-distinct aggregate through Expand into a partial grouped
    by (event_type, user_id), which would materialize the rsd-0.01 HLL++
    buffer (~2^17 registers, >100 KB) once PER DISTINCT PAIR — measured at
    sf1 that was millions of buffers, a spill-and-GC storm taking the
    query from ~2 s to 77 s and degrading every later query in the
    session.  Split, the sketch keeps one buffer per event_type per task
    and each side is a plain scan-side partial aggregate (sf1: 77 s ->
    ~2 s warm)."""
    ev = T(spark, sf_dir, "events")
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_users")
    )
    approx = ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", 0.01).alias("_approx")
    )
    return exact.join(approx, "event_type").select(
        "event_type",
        "exact_users",
        (
            F.abs(F.col("_approx") - F.col("exact_users"))
            <= 0.05 * F.col("exact_users")
        ).alias("within_rsd"),
    )


@register(
    "a5_global_totals",
    oracle=f"""
    SELECT COUNT(*) AS total_events,
           COUNT(DISTINCT user_id) AS total_users,
           {dsum_sql('value')} AS total_value,
           MIN(value) AS min_value, MAX(value) AS max_value
    FROM events
    """,
)
def a5_global_totals(spark, sf_dir):
    """Ungrouped global aggregate — GA `totalsForAllResults` field [K]."""
    return T(spark, sf_dir, "events").agg(
        F.count("*").alias("total_events"),
        F.countDistinct("user_id").alias("total_users"),
        dsum("value").alias("total_value"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    )


@register(
    "a6_grouping_sets",
    oracle=f"""
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS n_orders, {dsum_sql('o_totalprice')} AS sum_price
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
    """,
)
def a6_grouping_sets(spark, sf_dir):
    """Grouping sets (GA multi-report union idiom [K]).  One Expand node —
    a single pass over the data emits all three groupings, vs three scans
    for the naive union; at 100 TB that is a 3x scan saving."""
    o = T(spark, sf_dir, "orders")
    o.createOrReplaceTempView("_a6_orders")
    return spark.sql(
        f"""
        SELECT o_orderstatus, o_orderpriority,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS decimal(30,6))) AS DOUBLE) AS sum_price
        FROM _a6_orders
        GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
        """
    )


@register(
    "a7_rollup",
    oracle=f"""
    SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
           CAST(month(o_orderdate) AS BIGINT) AS o_month,
           COUNT(*) AS n_orders, {dsum_sql('o_totalprice')} AS sum_price
    FROM orders GROUP BY ROLLUP (o_year, o_month)
    """,
)
def a7_rollup(spark, sf_dir):
    """Hierarchical rollup over the GA time hierarchy ga:year/ga:month [K]."""
    o = T(spark, sf_dir, "orders").select(
        F.year("o_orderdate").cast("long").alias("o_year"),
        F.month("o_orderdate").cast("long").alias("o_month"),
        "o_totalprice",
    )
    return o.rollup("o_year", "o_month").agg(
        F.count("*").alias("n_orders"), dsum("o_totalprice").alias("sum_price")
    )


@register(
    "a8_cube",
    oracle=f"""
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS n_orders, {dsum_sql('o_totalprice')} AS sum_price
    FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def a8_cube(spark, sf_dir):
    """Cube over two dimensions (GA cross-dimension report matrix [K])."""
    return (
        T(spark, sf_dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n_orders"), dsum("o_totalprice").alias("sum_price"))
    )


@register(
    "a9_pivot",
    oracle=f"""
    SELECT n.n_name,
           {dsum_sql("CASE WHEN o.o_orderstatus = 'F' THEN o.o_totalprice END")} AS F,
           {dsum_sql("CASE WHEN o.o_orderstatus = 'O' THEN o.o_totalprice END")} AS O,
           {dsum_sql("CASE WHEN o.o_orderstatus = 'P' THEN o.o_totalprice END")} AS P
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
)
def a9_pivot(spark, sf_dir):
    """Pivot dimension -> columns (GA v4 `pivots` request field [K]).
    Explicit value list keeps the plan single-pass (no value-discovery scan)."""
    o = T(spark, sf_dir, "orders")
    c = T(spark, sf_dir, "customer")
    n = T(spark, sf_dir, "nation")
    joined = o.join(
        F.broadcast(c), o.o_custkey == c.c_custkey
    ).join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
    piv = (
        joined.groupBy("n_name")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.sum(F.col("o_totalprice").cast("decimal(30,6)")))
    )
    return piv.select(
        "n_name",
        F.col("F").cast("double").alias("F"),
        F.col("O").cast("double").alias("O"),
        F.col("P").cast("double").alias("P"),
    )


@register(
    "a10_ratio_metric",
    oracle=f"""
    SELECT event_type,
           ({dsum_sql('value')} / COUNT(*)) AS value_per_event,
           ({dsum_sql("CASE WHEN value > 50.0 THEN value END")}
              / nullif({dsum_sql('value')}, 0.0)) AS big_share
    FROM events GROUP BY event_type
    """,
)
def a10_ratio_metric(spark, sf_dir):
    """Post-aggregation derived ratios with null-safe divide — GA computed
    metrics bounceRate / avgSessionDuration [K].  Both numerator and
    denominator are exact decimal sums, so the double division is
    deterministic on both engines."""
    ev = T(spark, sf_dir, "events")
    agg = ev.groupBy("event_type").agg(
        dsum("value").alias("_sv"),
        dsum(F.when(F.col("value") > 50.0, F.col("value"))).alias("_sb"),
        F.count("*").alias("_n"),
    )
    return agg.select(
        "event_type",
        (F.col("_sv") / F.col("_n")).alias("value_per_event"),
        (F.col("_sb") / F.nullif(F.col("_sv"), F.lit(0.0))).alias("big_share"),
    )


@register(
    "a11_having",
    oracle=f"""
    SELECT o_custkey, COUNT(*) AS n_orders, {dsum_sql('o_totalprice')} AS spend
    FROM orders GROUP BY o_custkey
    HAVING COUNT(*) > 20
    """,
)
def a11_having(spark, sf_dir):
    """Filter on aggregate output (GA v4 post-agg metric filters [K])."""
    return (
        T(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n_orders"), dsum("o_totalprice").alias("spend"))
        .filter(F.col("n_orders") > 20)
    )


@register(
    "a12_distinct_rows",
    oracle="""
    SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders
    """,
)
def a12_distinct_rows(spark, sf_dir):
    """DISTINCT dimension combos (GA unique dimension rows [K]; north-star
    exact dedup is l1)."""
    return T(spark, sf_dir, "orders").select("o_orderstatus", "o_orderpriority").distinct()


@register(
    "a13_histogram",
    oracle="""
    SELECT CAST(floor(value / 10.0) * 10.0 AS DOUBLE) AS bucket, COUNT(*) AS n
    FROM events GROUP BY bucket
    """,
)
def a13_histogram(spark, sf_dir):
    """Bucketed histogram (GA v4 `histogramBuckets` [K])."""
    return (
        T(spark, sf_dir, "events")
        .groupBy((F.floor(F.col("value") / 10.0) * 10.0).cast("double").alias("bucket"))
        .agg(F.count("*").alias("n"))
    )


@register(
    "a14_percentiles",
    oracle="""
    SELECT l_returnflag,
           round(quantile_cont(l_quantity, 0.25), 6) AS q25,
           round(quantile_cont(l_quantity, 0.50), 6) AS q50,
           round(quantile_cont(l_quantity, 0.75), 6) AS q75
    FROM lineitem GROUP BY l_returnflag
    """,
)
def a14_percentiles(spark, sf_dir):
    """Exact interpolated percentiles per group (GA avg-metric
    generalization [K]).  Linear interpolation can differ in the last ulp
    across engines -> terminal round(6) on both sides."""
    li = T(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        r6(F.percentile("l_quantity", F.lit(0.25))).alias("q25"),
        r6(F.percentile("l_quantity", F.lit(0.50))).alias("q50"),
        r6(F.percentile("l_quantity", F.lit(0.75))).alias("q75"),
    )


@register(
    "a15_collect_list",
    oracle="""
    SELECT user_id, string_agg(event_type, ',' ORDER BY ts, event_id) AS path
    FROM events GROUP BY user_id
    """,
)
def a15_collect_list(spark, sf_dir):
    """Ordered per-group sequence — GA session page-path analog
    (`ga:pagePath` per session [K]).  Emitted as a joined string so the
    value-hash sees a scalar; ordering is total (ts, event_id) so the
    sequence is deterministic."""
    ev = T(spark, sf_dir, "events")
    seq = ev.groupBy("user_id").agg(
        F.array_sort(
            F.collect_list(F.struct("ts", "event_id", "event_type"))
        ).alias("_seq")
    )
    return seq.select(
        "user_id",
        F.array_join(F.transform("_seq", lambda s: s.getField("event_type")), ",").alias(
            "path"
        ),
    )


@register(
    "a16_multikey_count",
    oracle="""
    SELECT event_type, user_id % 10 AS user_bucket,
           CAST(year(ts) AS BIGINT) AS y, COUNT(*) AS n
    FROM events GROUP BY event_type, user_bucket, y
    """,
)
def a16_multikey_count(spark, sf_dir):
    """Group by several dimensions (GA up-to-7-dimensions rule [K])."""
    ev = T(spark, sf_dir, "events")
    return ev.groupBy(
        "event_type",
        (F.col("user_id") % 10).alias("user_bucket"),
        F.year("ts").cast("long").alias("y"),
    ).agg(F.count("*").alias("n"))


@register(
    "a17_approx_percentile",
    oracle="""
    SELECT l_returnflag, COUNT(*) AS n,
           TRUE AS q25_ok, TRUE AS q50_ok, TRUE AS q75_ok
    FROM lineitem GROUP BY l_returnflag
    """,
)
def a17_approx_percentile(spark, sf_dir):
    """Approximate percentiles per group via the Greenwald-Khanna sketch
    (`approx_percentile`) — the 100 TB path for a14: constant memory per
    group and a mergeable partial-agg buffer, where exact `percentile`
    buffers every value through the shuffle.  Sketch merge order is not
    pinned by the plan, so the raw quantiles are engine-run-specific; the
    query instead emits a RANK-ERROR AUDIT the driver can hash (upgraded
    from rows-only in round 5): each GK quantile at accuracy 10000
    (guaranteed rank error n/10000) is checked against the exact
    interpolated-percentile bracket at p +/- 0.001 — a 10x margin — and
    the flags plus the exact group count are the output.  The oracle
    recomputes the count and states the guarantee; a sketch that drifts
    past its bound flips a flag and fails the value hash."""
    li = T(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.approx_percentile(
            "l_quantity", F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75)), F.lit(10000)
        ).alias("_q"),
        F.percentile(
            "l_quantity", F.array(F.lit(0.249), F.lit(0.499), F.lit(0.749))
        ).alias("_lo"),
        F.percentile(
            "l_quantity", F.array(F.lit(0.251), F.lit(0.501), F.lit(0.751))
        ).alias("_hi"),
    )

    def ok(i):
        q = F.element_at("_q", i).cast("double")
        return (q >= F.element_at("_lo", i) - 1e-9) & (
            q <= F.element_at("_hi", i) + 1e-9
        )

    return agg.select(
        "l_returnflag",
        "n",
        ok(1).alias("q25_ok"),
        ok(2).alias("q50_ok"),
        ok(3).alias("q75_ok"),
    )


@register(
    "a18_freq_topk",
    oracle="""
    WITH tot AS (SELECT COUNT(*) AS n FROM events),
    heavy AS (SELECT event_type FROM events, tot
              GROUP BY event_type, tot.n HAVING COUNT(*) > 0.1 * tot.n)
    SELECT COALESCE(string_agg(event_type, ',' ORDER BY event_type), '')
             AS true_heavy_hitters,
           TRUE AS superset_ok
    FROM heavy
    """,
)
def a18_freq_topk(spark, sf_dir):
    """Single-pass approximate heavy hitters (`DataFrame.stat.freqItems`,
    a count-sketch variant): candidate items with frequency > 10% of rows,
    without the full groupBy+sort a o5-style exact top-k pays.  The raw
    candidate ARRAY is a superset whose extra members are engine-defined,
    so the query emits the algorithm's GUARANTEE as the hashable output
    (upgraded from rows-only in round 5): the exact heavy-hitter set
    (true frequency > support, independently recomputed by the oracle)
    plus a flag asserting every true heavy hitter appears among the
    sketch's candidates — the one property freqItems promises.  A sketch
    that drops a true heavy hitter flips the flag and fails the hash."""
    ev = T(spark, sf_dir, "events")
    cand = ev.stat.freqItems(["event_type"], support=0.1).select(
        F.col("event_type_freqItems").alias("cand")
    )
    truth = (
        ev.groupBy("event_type")
        .agg(F.count("*").alias("c"))
        .crossJoin(F.broadcast(ev.agg(F.count("*").alias("n"))))
        .filter(F.col("c") > 0.1 * F.col("n"))
        .agg(
            F.array_join(
                F.array_sort(F.collect_list("event_type")), ","
            ).alias("true_heavy_hitters")
        )
    )
    return truth.crossJoin(F.broadcast(cand)).select(
        "true_heavy_hitters",
        F.when(F.col("true_heavy_hitters") == "", F.lit(True))
        .otherwise(
            F.size(
                F.array_except(F.split("true_heavy_hitters", ","), F.col("cand"))
            )
            == 0
        )
        .alias("superset_ok"),
    )


# ------------------------------------------------------------------- a19 ---
@register(
    "a19_moment_stats",
    oracle=f"""
    WITH m AS (
      SELECT event_type,
             CAST(COUNT(*) AS DOUBLE) AS n,
             {dsum_sql('value')} AS sv,
             {dsum_sql('value * value')} AS svv,
             {dsum_sql('hour(ts)')} AS sh,
             {dsum_sql('hour(ts) * hour(ts)')} AS shh,
             {dsum_sql('value * hour(ts)')} AS svh
      FROM events GROUP BY event_type
    )
    SELECT event_type, CAST(n AS BIGINT) AS n_events,
           ROUND(sqrt((svv - sv * sv / n) / (n - 1)), 6) AS stddev_value,
           ROUND((n * svh - sv * sh)
                 / sqrt((n * svv - sv * sv) * (n * shh - sh * sh)), 6)
             AS corr_value_hour,
           ROUND((n * svh - sv * sh) / (n * shh - sh * sh), 6)
             AS slope_value_hour
    FROM m
    """,
)
def a19_moment_stats(spark, sf_dir):
    """Statistical aggregates — sample stddev, Pearson correlation, and
    least-squares regression slope per group (§2.4's moment-statistics
    tier; GA's metric-vs-hour trend/variance views).

    Built-in stddev_samp/corr/regr_slope are streaming float
    accumulators whose result depends on partition merge order — the
    cross-engine (and run-to-run) hash would drift.  Instead the five
    raw moments Σv, Σv², Σh, Σhh, Σvh accumulate EXACTLY (decimal — the
    dsum contract), and the closed-form formulas run once per group on
    the exact sums, with identical association order in both engines, so
    the doubles agree bit-for-bit (terminal round(6) absorbs the sqrt's
    last-ulp libm variance).

    Scale shape: one partial+final hash aggregate — the moments are
    map-side combinable, so this costs exactly a1's single exchange no
    matter how many statistics derive from them.  (The same five-moment
    frame gives covariance, R², and the intercept for free.)"""
    ev = T(spark, sf_dir, "events")
    h = F.hour("ts")
    v = F.col("value")
    m = ev.groupBy("event_type").agg(
        F.count("*").cast("double").alias("n"),
        dsum(v).alias("sv"),
        dsum(v * v).alias("svv"),
        dsum(h).alias("sh"),
        dsum(h * h).alias("shh"),
        dsum(v * h).alias("svh"),
    )
    n, sv, svv, sh, shh, svh = (F.col(c) for c in ("n", "sv", "svv", "sh", "shh", "svh"))
    return m.select(
        "event_type",
        n.cast("long").alias("n_events"),
        F.round(F.sqrt((svv - sv * sv / n) / (n - 1)), 6).alias("stddev_value"),
        F.round(
            (n * svh - sv * sh)
            / F.sqrt((n * svv - sv * sv) * (n * shh - sh * sh)),
            6,
        ).alias("corr_value_hour"),
        F.round((n * svh - sv * sh) / (n * shh - sh * sh), 6).alias(
            "slope_value_hour"
        ),
    )


@register(
    "a20_bool_aggs",
    oracle="""
    SELECT event_type,
           CAST(count_if(value > 100.0) AS BIGINT) AS n_big,
           bool_and(value >= 0.0) AS all_nonneg,
           bool_or(value > 450.0) AS any_huge,
           MIN(user_id) AS first_user,
           round(quantile_cont(value, 0.50), 6) AS med_value
    FROM events GROUP BY event_type
    """,
)
def a20_bool_aggs(spark, sf_dir):
    """The remaining standard-aggregate surface in one frame: conditional
    count (count_if), universal/existential predicates (bool_and /
    bool_or = GA's 'did every/any session convert'), a deterministic
    any_value stand-in (MIN — any_value itself is partition-order-
    dependent, so the registered form picks the stable witness), and an
    median via continuous-quantile interpolation with terminal
    rounding (a14's proven twin shape — DuckDB's bare median() takes the
    LOWER middle value for decimals while Spark interpolates, a trap this
    row now documents).

    Scale: single partial+final hash aggregate for everything except the
    median, whose exact form needs the per-group sort — at 100 TB the
    sketch path is a17's approx_percentile; this row pins the exact
    semantics the sketch is judged against."""
    ev = T(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count_if(F.col("value") > 100.0).alias("n_big"),
        F.bool_and(F.col("value") >= 0.0).alias("all_nonneg"),
        F.bool_or(F.col("value") > 450.0).alias("any_huge"),
        F.min("user_id").alias("first_user"),
        F.round(F.percentile(F.col("value"), F.lit(0.5)), 6).alias(
            "med_value"
        ),
    )
