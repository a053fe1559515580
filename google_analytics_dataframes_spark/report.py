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
    """
    out = df
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
