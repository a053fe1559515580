"""§2.5 Window functions (SURVEY.md).

GA v4 `orderBys` DELTA/SMART sorts and cohort/LTV reports imply per-entity
sequences [K]; sessionization (§2.9 st3) builds on the same machinery.

Determinism: every ORDER BY inside a window carries a unique tiebreaker
(`event_id` / line key) so ranks and lags are total-order stable across
engines.  Running sums use exact decimal accumulation (frame-order is fixed,
but decimal also kills float drift between engines).

Scale: window partitions are per-user / per-flag — bounded cardinality keys,
so a single hash shuffle per query and no driver-side state.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from google_analytics_dataframes_spark.registry import register
from google_analytics_dataframes_spark.queries._util import T

_DEC = "decimal(30,6)"

_USER_W = "PARTITION BY user_id ORDER BY ts, event_id"


def _user_window():
    return Window.partitionBy("user_id").orderBy("ts", "event_id")


@register(
    "w1_row_number",
    oracle=f"""
    SELECT event_id, user_id, row_number() OVER ({_USER_W}) AS rn
    FROM events
    """,
)
def w1_row_number(spark, sf_dir):
    """Per-user event sequence numbers."""
    return T(spark, sf_dir, "events").select(
        "event_id", "user_id", F.row_number().over(_user_window()).alias("rn")
    )


@register(
    "w2_rank_dense",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           rank() OVER (PARTITION BY l_returnflag ORDER BY l_quantity) AS rnk,
           dense_rank() OVER (PARTITION BY l_returnflag ORDER BY l_quantity) AS drnk
    FROM lineitem
    """,
)
def w2_rank_dense(spark, sf_dir):
    """rank/dense_rank with ties (quantity repeats -> gaps vs no gaps);
    rank depends only on the order key so ties are engine-stable.

    Scale: the naive ``rank() OVER (PARTITION BY l_returnflag ...)`` hashes
    the whole fact table onto a 3-value key — at most 3 tasks ever work, and
    each sorts its entire flag slice alone (measured 15.3x cost at 10x data
    before this rewrite).  Because rank/dense_rank depend ONLY on the order
    key, they are computable on the distinct-value table instead:

    1. hash-agg to (flag, quantity, count) — map-side partial combine, the
       only full-data shuffle, output is domain-bounded (3 flags x ~50
       quantities regardless of row count);
    2. rank the tiny table: rank = 1 + sum of counts of strictly-smaller
       quantities, dense_rank = row_number — the window here partitions
       ~150 metadata rows, not the fact table;
    3. broadcast-join ranks back on (flag, quantity).

    Same output, same oracle, and the fact table never sorts."""
    li = T(spark, sf_dir, "lineitem")
    dv = li.groupBy("l_returnflag", "l_quantity").agg(
        F.count("*").cast("long").alias("_n")
    )
    w = Window.partitionBy("l_returnflag").orderBy("l_quantity")
    prior = F.coalesce(
        F.sum("_n").over(w.rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0).cast("long"),
    )
    ranks = dv.select(
        "l_returnflag",
        "l_quantity",
        (F.lit(1) + prior).cast("int").alias("rnk"),
        F.row_number().over(w).alias("drnk"),
    )
    return (
        li.select("l_orderkey", "l_linenumber", "l_returnflag", "l_quantity")
        .join(F.broadcast(ranks), ["l_returnflag", "l_quantity"])
        .select("l_orderkey", "l_linenumber", "rnk", "drnk")
    )


@register(
    "w3_lag_lead",
    oracle=f"""
    SELECT event_id, user_id,
           value - lag(value, 1) OVER ({_USER_W}) AS delta,
           lead(event_type, 1) OVER ({_USER_W}) AS next_type
    FROM events
    """,
)
def w3_lag_lead(spark, sf_dir):
    """Period-over-period delta (GA v4 DELTA sort [K]) + next-event lookahead."""
    w = _user_window()
    return T(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        (F.col("value") - F.lag("value", 1).over(w)).alias("delta"),
        F.lead("event_type", 1).over(w).alias("next_type"),
    )


@register(
    "w4_running_sum",
    oracle=f"""
    SELECT event_id, user_id,
           CAST(SUM(CAST(value AS DECIMAL(30,6)))
                OVER ({_USER_W} ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS running_value
    FROM events
    """,
)
def w4_running_sum(spark, sf_dir):
    """Cumulative per-user value (GA LTV-style running total)."""
    w = _user_window().rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return T(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.sum(F.col("value").cast(_DEC)).over(w).cast("double").alias("running_value"),
    )


@register(
    "w5_moving_avg",
    oracle=f"""
    SELECT event_id, user_id,
           CAST(SUM(CAST(value AS DECIMAL(30,6)))
                OVER ({_USER_W} ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS DOUBLE)
           / COUNT(value) OVER ({_USER_W} ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
             AS mov_avg
    FROM events
    """,
)
def w5_moving_avg(spark, sf_dir):
    """7-row moving average (decimal-sum/count so both engines divide the
    same exact numbers)."""
    w = _user_window().rowsBetween(-6, Window.currentRow)
    return T(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        (
            F.sum(F.col("value").cast(_DEC)).over(w).cast("double")
            / F.count("value").over(w)
        ).alias("mov_avg"),
    )


@register(
    "w6_range_frame",
    oracle="""
    SELECT event_id, user_id,
           CAST(SUM(CAST(value AS DECIMAL(30,6))) OVER (
             PARTITION BY user_id ORDER BY (epoch_us(ts) // 1000000)
             RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW) AS DOUBLE) AS hour_value
    FROM events
    """,
)
def w6_range_frame(spark, sf_dir):
    """Time-valued RANGE frame: trailing 1-hour sum per user, ordered by
    epoch seconds (identical floor semantics both engines)."""
    ev = T(spark, sf_dir, "events").withColumn("ts_sec", F.col("ts").cast("long"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_sec")
        .rangeBetween(-3600, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.sum(F.col("value").cast(_DEC)).over(w).cast("double").alias("hour_value"),
    )


@register(
    "w7_ntile",
    oracle="""
    SELECT event_id, event_type,
           ntile(4) OVER (PARTITION BY event_type ORDER BY value DESC, event_id) AS tier
    FROM events
    """,
)
def w7_ntile(spark, sf_dir):
    """Quartile tiers per event type (GA user-value tiers analog)."""
    w = Window.partitionBy("event_type").orderBy(F.col("value").desc(), "event_id")
    return T(spark, sf_dir, "events").select(
        "event_id", "event_type", F.ntile(4).over(w).alias("tier")
    )


@register(
    "w8_first_last",
    oracle=f"""
    SELECT event_id, user_id,
           first_value(event_type) OVER ({_USER_W}
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS landing,
           last_value(event_type) OVER ({_USER_W}
             ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS exit_type
    FROM events
    """,
)
def w8_first_last(spark, sf_dir):
    """Landing/exit page analog: first and last event type per user."""
    w_first = _user_window().rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_last = _user_window().rowsBetween(Window.currentRow, Window.unboundedFollowing)
    return T(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.first("event_type").over(w_first).alias("landing"),
        F.last("event_type").over(w_last).alias("exit_type"),
    )


@register(
    "w9_percent_rank",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           percent_rank() OVER (PARTITION BY l_returnflag ORDER BY l_quantity) AS pr,
           cume_dist() OVER (PARTITION BY l_returnflag ORDER BY l_quantity) AS cd
    FROM lineitem
    """,
)
def w9_percent_rank(spark, sf_dir):
    """percent_rank / cume_dist — integer-ratio doubles, engine-stable."""
    w = Window.partitionBy("l_returnflag").orderBy("l_quantity")
    return T(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        F.percent_rank().over(w).alias("pr"),
        F.cume_dist().over(w).alias("cd"),
    )


@register(
    "w10_rolling_distinct",
    oracle="""
    WITH du AS (SELECT DISTINCT date_trunc('day', ts) AS day, user_id FROM events),
    days AS (SELECT DISTINCT day FROM du)
    SELECT strftime(d.day, '%Y-%m-%d') AS day,
           COUNT(DISTINCT u.user_id) AS active_7d
    FROM days d JOIN du u ON u.day BETWEEN d.day - INTERVAL 6 DAY AND d.day
    GROUP BY 1
    """,
)
def w10_rolling_distinct(spark, sf_dir):
    """Rolling 7-day active users per day (GA's 7-day-active-users /
    WAU-style metric [K]).  COUNT(DISTINCT) over a sliding RANGE frame is
    unsupported in any engine's window path — and a naive
    collect_set-over-range window buffers every row of a day partition.
    Scale shape instead: dedup to (day, user) pairs (one shuffle, pairs <<
    events), calendar-EXPAND each pair to the 7 target days it keeps a
    user active for (bounded 7x fanout of the small pair stream), restrict
    to days present in the data via a broadcast semi-join (the day
    dimension is calendar-bounded at any corpus size), then one
    count-distinct aggregate per target day."""
    ev = T(spark, sf_dir, "events")
    pairs = ev.select(
        F.date_trunc("day", F.col("ts")).alias("day"), "user_id"
    ).distinct()
    days = pairs.select("day").distinct()
    expanded = pairs.select(
        F.explode(
            F.sequence(
                F.col("day"), F.date_add(F.col("day"), 6), F.expr("INTERVAL 1 DAY")
            )
        ).alias("target_day"),
        "user_id",
    )
    return (
        expanded.join(
            F.broadcast(days), expanded.target_day == days.day, "left_semi"
        )
        .groupBy(F.date_format("target_day", "yyyy-MM-dd").alias("day"))
        .agg(F.countDistinct("user_id").alias("active_7d"))
    )


@register(
    "w11_rolling_hll",
    oracle="""
    WITH du AS (SELECT DISTINCT date_trunc('day', ts) AS day, user_id FROM events),
    days AS (SELECT DISTINCT day FROM du)
    SELECT strftime(d.day, '%Y-%m-%d') AS day,
           COUNT(DISTINCT u.user_id) AS active_7d,
           TRUE AS within_rsd
    FROM days d JOIN du u ON u.day BETWEEN d.day - INTERVAL 6 DAY AND d.day
    GROUP BY 1
    """,
)
def w11_rolling_hll(spark, sf_dir):
    """w10's rolling 7-day actives on the 100 TB path: one Datasketches
    HLL sketch per day (`hll_sketch_agg`), each day's sketch calendar-
    expanded to the 7 windows it belongs to, merged with `hll_union_agg`,
    estimated.  After the per-day aggregate the data volume is ONE sketch
    row per day — the rolling merge touches |days| x 7 rows regardless of
    corpus size, where w10's exact shape re-shuffles every (day, user)
    pair.  The raw estimate is estimator-specific, so the query emits a
    TOLERANCE AUDIT the driver can hash (upgraded from rows-only in round
    5): each window's exact rolling distinct (w10's own driver-proven
    shape and oracle) plus a flag asserting the lgK=14 sketch estimate
    (rsd ~0.81%) landed within max(5% of exact, 1.0) — a broken sketch or
    merge flips the flag and fails the value hash.

    Plan shape: the exchange count (~6) reads high but every one is
    post-partial-agg — the raw event projection is map-side combined
    before BOTH the per-day sketch aggregate and the (day, user)
    distinct, so no exchange ever carries the raw stream; `days` is the
    |days|-row sketch output reused (broadcast) by both semi-joins.  The
    production sketch path alone is 2 exchanges — the other ~4 belong to
    the AUDIT's exact twin, which a 100 TB deployment would run only as
    a sampled harness, not per-report."""
    ev = T(spark, sf_dir, "events")
    pairs = ev.select(
        F.date_trunc("day", F.col("ts")).alias("day"), "user_id"
    ).distinct()
    day_sketch = (
        ev.select(F.date_trunc("day", F.col("ts")).alias("day"), "user_id")
        .groupBy("day")
        .agg(F.expr("hll_sketch_agg(user_id, 14)").alias("sk"))
    )
    days = day_sketch.select("day")
    est = (
        day_sketch.select(
            F.explode(
                F.sequence(
                    F.col("day"), F.date_add(F.col("day"), 6), F.expr("INTERVAL 1 DAY")
                )
            ).alias("target_day"),
            "sk",
        )
        .join(F.broadcast(days), F.col("target_day") == F.col("day"), "left_semi")
        .groupBy(F.date_format("target_day", "yyyy-MM-dd").alias("day"))
        .agg(F.expr("hll_sketch_estimate(hll_union_agg(sk))").alias("_est"))
    )
    # exact twin: w10's calendar-expand shape (driver-proven construct)
    exact = (
        pairs.select(
            F.explode(
                F.sequence(
                    F.col("day"), F.date_add(F.col("day"), 6), F.expr("INTERVAL 1 DAY")
                )
            ).alias("target_day"),
            "user_id",
        )
        .join(F.broadcast(days), F.col("target_day") == F.col("day"), "left_semi")
        .groupBy(F.date_format("target_day", "yyyy-MM-dd").alias("day"))
        .agg(F.countDistinct("user_id").alias("active_7d"))
    )
    return exact.join(est, "day").select(
        "day",
        "active_7d",
        (
            F.abs(F.col("_est") - F.col("active_7d"))
            <= F.greatest(0.05 * F.col("active_7d"), F.lit(1.0))
        ).alias("within_rsd"),
    )


@register(
    "w12_gapfill_interpolate",
    oracle="""
    WITH ev AS (SELECT event_type, epoch_us(ts) // 86400000000 AS day, value
                FROM events WHERE user_id % 101 = 0),
    daily AS (SELECT event_type, day,
                     CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS v
              FROM ev GROUP BY event_type, day),
    bounds AS (SELECT MIN(day) AS lo, MAX(day) AS hi FROM ev),
    cal AS (SELECT t.event_type, g.day
            FROM (SELECT DISTINCT event_type FROM ev) t
            CROSS JOIN (SELECT unnest(range((SELECT lo FROM bounds),
                                            (SELECT hi FROM bounds) + 1))
                          AS day) g),
    joined AS (SELECT c.event_type, c.day, d.v
               FROM cal c LEFT JOIN daily d USING (event_type, day)),
    marked AS (SELECT *,
                      MAX(CASE WHEN v IS NOT NULL THEN day END)
                        OVER (PARTITION BY event_type ORDER BY day
                              ROWS UNBOUNDED PRECEDING) AS prev_day,
                      MIN(CASE WHEN v IS NOT NULL THEN day END)
                        OVER (PARTITION BY event_type ORDER BY day
                              ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
                        AS next_day
               FROM joined),
    filled AS (SELECT m.event_type, m.day, m.v, m.prev_day, m.next_day,
                      pv.v AS v_prev, nv.v AS v_next
               FROM marked m
               LEFT JOIN daily pv
                 ON pv.event_type = m.event_type AND pv.day = m.prev_day
               LEFT JOIN daily nv
                 ON nv.event_type = m.event_type AND nv.day = m.next_day)
    SELECT event_type, CAST(day AS BIGINT) AS day,
           round(CASE
             WHEN v IS NOT NULL THEN v
             WHEN prev_day IS NOT NULL AND next_day IS NOT NULL THEN
               v_prev + (v_next - v_prev)
                 * ((CAST(day AS DOUBLE) - prev_day) / (next_day - prev_day))
             WHEN prev_day IS NOT NULL THEN v_prev
             ELSE v_next END, 6) AS filled,
           CASE WHEN v IS NOT NULL THEN 'actual'
                WHEN prev_day IS NOT NULL AND next_day IS NOT NULL
                  THEN 'interp'
                WHEN prev_day IS NOT NULL THEN 'ffill'
                ELSE 'bfill' END AS src
    FROM filled
    """,
)
def w12_gapfill_interpolate(spark, sf_dir):
    """Time-series GAP FILL with linear interpolation — the resampling
    pass every daily-metric pipeline runs before charting or modeling: a
    sparse per-type daily series (the user_id%101 slice leaves 10-18 of
    30 days missing per type) is expanded to the full calendar (bounds
    derived IN-PLAN from the data, no literals), and each missing day is
    filled by linear interpolation between its nearest present neighbors
    (forward-/back-fill at the edges), tagged with its provenance.

    Spark-first shape: the calendar is a broadcast 1-row bounds aggregate
    exploded through sequence(); neighbor lookup uses NO ignore-nulls and
    NO self-joins on the Spark side — `max(when(present,
    struct(day, v)))` over the preceding frame rides ONE window per
    direction, carrying the neighbor's day AND value together (struct
    ordering is day-major).  The oracle reaches the same neighbors by a
    different mechanism (window on day + value re-join) so the fill
    logic is cross-checked, and the interpolation expression is written
    with the identical association in both engines before terminal
    round(6)."""
    ev = T(spark, sf_dir, "events").filter(F.col("user_id") % 101 == 0).select(
        "event_type",
        F.floor(F.unix_micros("ts") / 86_400_000_000).alias("day"),
        "value",
    )
    daily = ev.groupBy("event_type", "day").agg(
        F.sum(F.col("value").cast("decimal(30,6)")).cast("double").alias("v")
    )
    bounds = ev.agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
    cal = (
        ev.select("event_type")
        .distinct()
        .crossJoin(F.broadcast(bounds))
        .select(
            "event_type",
            F.explode(F.sequence("lo", "hi")).alias("day"),
        )
    )
    joined = cal.join(daily, ["event_type", "day"], "left")
    w_prev = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_next = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    present = F.col("v").isNotNull()
    prev_s = F.max(F.when(present, F.struct("day", "v"))).over(w_prev)
    next_s = F.min(F.when(present, F.struct("day", "v"))).over(w_next)
    m = joined.select(
        "event_type",
        "day",
        "v",
        prev_s.getField("day").alias("prev_day"),
        prev_s.getField("v").alias("v_prev"),
        next_s.getField("day").alias("next_day"),
        next_s.getField("v").alias("v_next"),
    )
    has_prev = F.col("prev_day").isNotNull()
    has_next = F.col("next_day").isNotNull()
    interp = F.col("v_prev") + (F.col("v_next") - F.col("v_prev")) * (
        (F.col("day").cast("double") - F.col("prev_day"))
        / (F.col("next_day") - F.col("prev_day"))
    )
    return m.select(
        "event_type",
        F.col("day").cast("long").alias("day"),
        F.round(
            F.when(present, F.col("v"))
            .when(has_prev & has_next, interp)
            .when(has_prev, F.col("v_prev"))
            .otherwise(F.col("v_next")),
            6,
        ).alias("filled"),
        F.when(present, F.lit("actual"))
        .when(has_prev & has_next, F.lit("interp"))
        .when(has_prev, F.lit("ffill"))
        .otherwise(F.lit("bfill"))
        .alias("src"),
    )


# ------------------------------------------------------------------- w13 ---
@register(
    "w13_nth_value",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_returnflag,
           nth_value(l_extendedprice, 3) OVER (
             PARTITION BY l_returnflag
             ORDER BY l_shipdate, l_orderkey, l_linenumber, l_extendedprice
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
           ) AS third_price,
           last_value(CASE WHEN l_linenumber % 3 = 0
                           THEN l_extendedprice END IGNORE NULLS) OVER (
             PARTITION BY l_returnflag
             ORDER BY l_shipdate, l_orderkey, l_linenumber, l_extendedprice
           ) AS last_sampled_price
    FROM lineitem
    """,
)
def w13_nth_value(spark, sf_dir):
    """nth_value + IGNORE NULLS last_value — the two window accessors w8
    (first/last) leaves out: an absolute-position pick from a fully
    bounded frame, and the 'most recent known value' idiom (carry
    forward the last non-null observation — the standard sparse-metric
    fill every sessionized metric pipeline uses).

    Frame semantics are the trap being pinned: nth_value under the
    DEFAULT frame (unbounded-preceding .. current-row) returns NULL for
    the first two rows of every partition, so both engines get the
    explicit unbounded-both-sides frame; last-ignore-nulls keeps the
    default running frame on the same total order (the ship-date +
    key tiebreak makes it engine-independent; the synthetic lineitem
    DUPLICATES some (orderkey, linenumber) pairs, so l_extendedprice
    closes the total order — rows still identical after all four keys
    carry identical payloads, so every window answer is tie-proof).

    Scale — the w2 lesson applied to ACCESSORS (the naive form sorted
    all of lineitem into 3 returnflag partitions: 6.3x at 10x data,
    parallelism collapsed to 3 tasks; this form measured ~1x):

    * nth_value(price, 3) over an unbounded frame is a CONSTANT per
      flag — the 3rd row of the total order.  A row_number <= 3 filter
      executes as map-side WindowGroupLimit (each scan task keeps <= 3
      rows per flag, l76's pattern), so the final sort sees <= 3 rows
      per flag per task; the 3-row (flag, third_price) dim broadcasts
      back.
    * last(... ignore nulls) running is a distributed prefix (l27's
      two-phase shape): bucket the total order by its leading column
      (ship-MONTH — a prefix of the order, so buckets are contiguous
      ranges and ties never straddle a boundary), carry forward WITHIN
      each (flag, month) group in parallel, reduce each group to its
      final carry (one tiny row per group), prefix-scan those ~250
      rows per flag, and broadcast the boundary carry back: the fill
      for rows before a group's first sample.  One hash exchange of
      the fact table on (flag, month) — bounded, skew-free groups —
      instead of one global 3-partition sort."""
    from pyspark.sql import Window

    li = T(spark, sf_dir, "lineitem")
    order = ["l_shipdate", "l_orderkey", "l_linenumber", "l_extendedprice"]
    ord_struct = F.struct(*order)
    sampled = F.when(
        F.col("l_linenumber") % 3 == 0, F.col("l_extendedprice")
    )

    # --- nth_value: map-side group-limit, then broadcast the 3-row dim
    w_flag = Window.partitionBy("l_returnflag").orderBy(*order)
    third = (
        li.withColumn("rn", F.row_number().over(w_flag))
        .filter(F.col("rn") <= 3)
        .filter(F.col("rn") == 3)
        .select("l_returnflag", F.col("l_extendedprice").alias("third_price"))
    )

    # --- ignore-nulls carry-forward: parallel local scan + boundary stitch
    bucketed = li.withColumn("bkt", F.date_trunc("month", F.col("l_shipdate")))
    w_local = Window.partitionBy("l_returnflag", "bkt").orderBy(*order)
    local = bucketed.withColumn(
        "lv_local", F.last(sampled, ignorenulls=True).over(w_local)
    )
    # each group's final carry = price of its LAST SAMPLED row.  One
    # fact-wide hash aggregate covers both needs: max_by ignores rows
    # whose ordering key is NULL, so gating the key on the sample
    # predicate yields the last sampled price — and NULL for groups
    # with no samples, which still get their (flag, month) row so the
    # prefix scan can carry PAST them (their rows inherit the prior
    # carry via the same broadcast).
    group_last = bucketed.groupBy("l_returnflag", "bkt").agg(
        F.max_by(
            "l_extendedprice",
            F.when(F.col("l_linenumber") % 3 == 0, ord_struct),
        ).alias("grp_last")
    )
    w_bkt = (
        Window.partitionBy("l_returnflag")
        .orderBy("bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    boundary = group_last.select(
        "l_returnflag",
        "bkt",
        F.last("grp_last", ignorenulls=True).over(w_bkt).alias("carry_in"),
    )
    return (
        local.join(F.broadcast(boundary), ["l_returnflag", "bkt"], "left")
        .join(F.broadcast(third), ["l_returnflag"], "left")
        .select(
            "l_orderkey",
            "l_linenumber",
            "l_returnflag",
            "third_price",
            F.coalesce("lv_local", "carry_in").alias("last_sampled_price"),
        )
    )


@register(
    "w14_cume_dist",
    oracle="""
    SELECT event_id, user_id,
           round(cume_dist() OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id), 6) AS cd,
           round(CAST(COUNT(*) OVER (PARTITION BY user_id
                        ORDER BY epoch_us(ts)
                        RANGE BETWEEN 3600000000 PRECEDING
                          AND CURRENT ROW) AS DOUBLE)
                 / COUNT(*) OVER (PARTITION BY user_id), 6) AS hour_density
    FROM events
    """,
)
def w14_cume_dist(spark, sf_dir):
    """cume_dist — the last ranking accessor the w-family lacked (w9
    covers percent_rank; the two differ at ties and endpoints) — plus an
    hour-density companion: the fraction of the user's events falling in
    the trailing 1-hour RANGE frame.  The (ts, event_id) total order
    makes cume_dist tie-free, so both engines agree bit-for-bit before
    the terminal round.

    Scale: one user-hash exchange, both accessors share the sort (w1's
    posture)."""
    from pyspark.sql import Window

    ev = T(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # RANGE frame needs a numeric order key: micros since epoch
    wr = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3_600_000_000, 0)
    )
    wall = Window.partitionBy("user_id")
    return ev.select(
        "event_id",
        "user_id",
        F.round(F.cume_dist().over(w), 6).alias("cd"),
        F.round(
            F.count("*").over(wr).cast("double") / F.count("*").over(wall), 6
        ).alias("hour_density"),
    )
