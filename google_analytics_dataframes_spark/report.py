"""GA-style report builder — the reference's public API, reborn on Spark
(SURVEY.md §3.2 E1).

The reference's whole surface is one parameterized call [K]:

    ga.get(ids, start_date, end_date, metrics, dimensions,
           filters, sort, max_results, start_index)

re-expressed here as :func:`report`, a pure *constructor of a DataFrame
plan*: scan -> date-range filter -> GA-filter-DSL predicate -> groupBy(dims)
-> agg(metrics) -> orderBy -> offset/limit.  There is no private IR — the
unresolved Catalyst logical plan IS the IR, so Catalyst owns pushdown,
pruning and join/agg physical choices (SURVEY.md §4.2).

The GA `filters` mini-language [K] is parsed faithfully:
    operators  ==  !=  >  <  >=  <=  =@ (contains)  !@  =~ (regex)  !~
    combinators  `;` = AND (outer), `,` = OR (inner, binds tighter)
e.g. ``"event_type==view,event_type==click;value>10"``
   == (event_type==view OR event_type==click) AND value>10.

Metric strings mirror GA's aggregate metric types (SURVEY.md §1.1):
``count`` | ``sum:col`` | ``avg:col`` | ``min:col`` | ``max:col`` |
``users:col`` (count-distinct) | ``approx_users:col`` (HLL, the 100-TB
path).  Sums/avgs accumulate in exact decimal (queries/_util.py) so report
results are partition-order-independent.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import NumericType

from google_analytics_dataframes_spark.queries._util import davg, dsum

#: GA filter operators, longest-first so `>=` wins over `>` etc.
_OPS = ("==", "!=", ">=", "<=", "=@", "!@", "=~", "!~", ">", "<")


def _condition(df: DataFrame, expr: str) -> Column:
    for op in _OPS:
        i = expr.find(op)
        if i > 0:
            name, value = expr[:i], expr[i + len(op):]
            break
    else:
        raise ValueError(f"no GA operator in filter condition: {expr!r}")
    col = F.col(name)
    field = df.schema[name].dataType
    lit: Column | str | float = value
    if isinstance(field, NumericType):
        lit = float(value)
    if op == "==":
        return col == lit
    if op == "!=":
        return col != lit
    if op == ">":
        return col > lit
    if op == "<":
        return col < lit
    if op == ">=":
        return col >= lit
    if op == "<=":
        return col <= lit
    if op == "=@":
        return col.contains(value)
    if op == "!@":
        return ~col.contains(value)
    if op == "=~":
        return col.rlike(value)
    if op == "!~":
        return ~col.rlike(value)
    raise AssertionError(op)


def parse_ga_filters(df: DataFrame, filters: str) -> Column:
    """GA `filters` DSL -> Catalyst predicate: `;`=AND of `,`=OR groups."""
    pred: Column | None = None
    for group in filters.split(";"):
        ors: Column | None = None
        for cond in group.split(","):
            c = _condition(df, cond)
            ors = c if ors is None else (ors | c)
        pred = ors if pred is None else (pred & ors)
    assert pred is not None
    return pred


def _metric(name: str, spec: str) -> Column:
    kind, _, col = spec.partition(":")
    if kind == "count":
        return F.count("*").alias(name)
    if kind == "sum":
        return dsum(col).alias(name)
    if kind == "avg":
        return davg(col).alias(name)
    if kind == "min":
        return F.min(col).alias(name)
    if kind == "max":
        return F.max(col).alias(name)
    if kind == "users":
        return F.countDistinct(col).alias(name)
    if kind == "approx_users":
        return F.approx_count_distinct(col, 0.01).alias(name)
    raise ValueError(f"unknown metric spec {spec!r} for {name!r}")


def report(
    df: DataFrame,
    dimensions: list[str | Column],
    metrics: dict[str, str],
    filters: str | None = None,
    date_range: tuple[str, str, str] | None = None,
    sort: list[str] | None = None,
    limit: int | None = None,
    offset: int = 0,
    segment: tuple[str, str] | None = None,
    having: str | None = None,
) -> DataFrame:
    """Build a GA-style report plan.

    dimensions: column names or pre-aliased Columns (computed dims like
        date_trunc buckets — GA's ga:date/ga:hour analogs).
    metrics: {output_name: metric_spec} (see module docstring).
    filters: GA filter-DSL string, applied pre-aggregation.
    date_range: (ts_col, start_iso, end_iso) — GA's mandatory
        start-date/end-date, i.e. ts_col >= start AND ts_col < end.
    sort: GA sort syntax, '-name' = descending.
    limit/offset: GA max-results / start-index pagination.
    segment: GA `segment` param [K] — (entity_col, filter-DSL): keep rows of
        entities (users) that have ANY row matching the DSL anywhere in the
        table (GA "users::condition::" segments).  Physical shape: left-semi
        join against the distinct qualifying entity keys; the qualifier set
        is one small column, broadcast-eligible at any fact-table size.
    having: GA v4 `metricFilterClauses` [K] — same filter DSL evaluated over
        the *aggregated* metric columns (post-agg filter).
    """
    out = df
    if segment is not None:
        entity_col, seg_filters = segment
        qualifying = (
            df.filter(parse_ga_filters(df, seg_filters)).select(entity_col).distinct()
        )
        out = out.join(F.broadcast(qualifying), entity_col, "left_semi")
    if date_range is not None:
        ts, start, end = date_range
        out = out.filter(
            (F.col(ts) >= F.lit(start).cast("timestamp"))
            & (F.col(ts) < F.lit(end).cast("timestamp"))
        )
    if filters:
        out = out.filter(parse_ga_filters(df, filters))
    dims = [F.col(d) if isinstance(d, str) else d for d in dimensions]
    out = out.groupBy(*dims).agg(*[_metric(n, s) for n, s in metrics.items()])
    if having:
        out = out.filter(parse_ga_filters(out, having))
    if sort:
        order = [
            F.col(s[1:]).desc() if s.startswith("-") else F.col(s).asc() for s in sort
        ]
        out = out.orderBy(*order)
    if offset:
        out = out.offset(offset)
    if limit is not None:
        out = out.limit(limit)
    return out


def realtime_report(
    stream: DataFrame,
    dimensions: list[str | Column],
    metrics: dict[str, str],
    ts_col: str = "ts",
    window: str = "1 hour",
    lateness: str = "1 hour",
    filters: str | None = None,
) -> DataFrame:
    """GA Real-Time API analog [K]: the same dimensions/metrics/filters
    surface as :func:`report`, evaluated continuously over an event stream
    as a watermarked tumbling-window aggregation.

    Streaming restrictions honored: exact count-distinct (`users:`) is not
    streamable — use `approx_users:` (HLL sketches merge incrementally);
    sort/limit/pagination are sink-side concerns and deliberately absent.
    State per (window, dims) only; the watermark finalizes and evicts
    windows `lateness` behind the event-time front."""
    out = stream
    if filters:
        out = out.filter(parse_ga_filters(stream, filters))
    for spec in metrics.values():
        if spec.partition(":")[0] == "users":
            raise ValueError(
                "exact count-distinct is not streamable; use approx_users:"
            )
    dims = [F.col(d) if isinstance(d, str) else d for d in dimensions]
    agg = (
        out.withWatermark(ts_col, lateness)
        .groupBy(F.window(ts_col, window), *dims)
        .agg(*[_metric(n, s) for n, s in metrics.items()])
    )
    keep = [c for c in agg.columns if c != "window"]
    return agg.select(
        F.date_format(F.col("window.start"), "yyyy-MM-dd HH:mm:ss").alias(
            "window_start"
        ),
        *keep,
    )


def cohort_report(
    df: DataFrame,
    entity_col: str,
    ts_col: str,
    max_offset: int | None = None,
) -> DataFrame:
    """GA v4 `cohortGroup` retention report [K]: entities cohorted by
    first-activity week, one row per (cohort_week, week_offset) with the
    count of entities active that many weeks after their first touch.

    Physical shape: one groupBy(entity) to find first touch (shuffle on the
    entity key), a join back on the same key (co-partitioned — reuses the
    shuffle; broadcast when the entity dim is small), then a count-distinct
    per (cohort, offset) — cardinality bounded by weeks^2, tiny at any scale.
    """
    first = df.groupBy(entity_col).agg(F.min(ts_col).alias("_first_ts"))
    joined = df.select(entity_col, ts_col).join(first, entity_col)
    cohort = F.date_trunc("week", F.col("_first_ts"))
    offset = F.floor(
        F.datediff(F.date_trunc("day", F.col(ts_col)), F.date_trunc("day", cohort)) / 7
    ).cast("long")
    out = (
        joined.select(
            F.date_format(cohort, "yyyy-MM-dd").alias("cohort_week"),
            offset.alias("week_offset"),
            F.col(entity_col),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.countDistinct(entity_col).alias("active_users"))
    )
    if max_offset is not None:
        out = out.filter(F.col("week_offset") <= max_offset)
    return out


def compare_report(
    df: DataFrame,
    dimensions: list[str | Column],
    metrics: dict[str, str],
    ts_col: str,
    range_a: tuple[str, str],
    range_b: tuple[str, str],
) -> DataFrame:
    """GA v4 twin `dateRanges` with DELTA ordering [K]: the same metrics for
    a current (a) and comparison (b) window side-by-side plus the delta,
    computed as ONE pass of conditional aggregates — no self-join, no second
    scan.  Only sum/count metric kinds are meaningful per-window."""
    a0, a1 = range_a
    b0, b1 = range_b
    ts = F.col(ts_col)
    in_a = (ts >= F.lit(a0).cast("timestamp")) & (ts < F.lit(a1).cast("timestamp"))
    in_b = (ts >= F.lit(b0).cast("timestamp")) & (ts < F.lit(b1).cast("timestamp"))
    aggs: list[Column] = []
    deltas: list[Column] = []
    for name, spec in metrics.items():
        kind, _, col = spec.partition(":")
        if kind == "count":
            ma = F.count(F.when(in_a, F.lit(1))).alias(f"{name}_a")
            mb = F.count(F.when(in_b, F.lit(1))).alias(f"{name}_b")
        elif kind == "sum":
            ma = (
                F.coalesce(F.sum(F.when(in_a, F.col(col)).cast("decimal(30,6)")), F.lit(0))
                .cast("double")
                .alias(f"{name}_a")
            )
            mb = (
                F.coalesce(F.sum(F.when(in_b, F.col(col)).cast("decimal(30,6)")), F.lit(0))
                .cast("double")
                .alias(f"{name}_b")
            )
        else:
            raise ValueError(f"compare_report supports count/sum, got {spec!r}")
        aggs += [ma, mb]
        deltas.append(
            (F.col(f"{name}_a") - F.col(f"{name}_b")).alias(f"{name}_delta")
        )
    dims = [F.col(d) if isinstance(d, str) else d for d in dimensions]
    out = df.filter(in_a | in_b).groupBy(*dims).agg(*aggs)
    return out.select(*[F.col(c) for c in out.columns], *deltas)


def funnel_report(
    df: DataFrame,
    entity_col: str,
    ts_col: str,
    step_col: str,
    steps: list[str],
) -> DataFrame:
    """GA goal-funnel analysis [K]: how many entities completed step 1, then
    step 2 AFTER step 1, then step 3 AFTER step 2, ... (strict event-time
    ordering, first qualifying occurrence per step).

    Physical shape: one aggregation per step, each joined back on the entity
    key — every shuffle is on the same key, so at scale the exchanges reuse
    one partitioning (or disappear entirely on entity-bucketed tables).
    Output: one row per step with reached-entity count and conversion rate
    vs the previous step."""
    reached = None  # DataFrame[entity, _t]: first qualifying time per step
    counts: list[tuple[str, DataFrame]] = []
    for i, step in enumerate(steps):
        ev = df.filter(F.col(step_col) == step).select(
            F.col(entity_col).alias("_e"), F.col(ts_col).alias("_ts")
        )
        if reached is None:
            cur = ev.groupBy("_e").agg(F.min("_ts").alias("_t"))
        else:
            cur = (
                ev.join(reached, "_e")
                .filter(F.col("_ts") > F.col("_t"))
                .groupBy("_e")
                .agg(F.min("_ts").alias("_t"))
            )
        reached = cur
        counts.append((step, cur))
    from pyspark.sql import Window

    rows = None
    for i, (step, cur) in enumerate(counts):
        one = cur.agg(F.count("*").alias("users")).select(
            F.lit(i + 1).alias("step"), F.lit(step).alias("step_name"), "users"
        )
        rows = one if rows is None else rows.unionByName(one)
    prev = F.lag("users").over(Window.orderBy("step"))
    return rows.withColumn(
        "conversion",
        F.when(prev.isNull(), F.lit(1.0)).otherwise(
            F.round(F.col("users") / prev, 6)
        ),
    )
