"""Report builder (E1): GA filter DSL semantics + end-to-end report shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from google_analytics_dataframes_spark.io import load_table
from google_analytics_dataframes_spark.report import parse_ga_filters, report
from tests.conftest import SF_DIR


def test_filter_dsl_or_binds_inside_and(spark):
    ev = load_table(spark, SF_DIR, "events")
    got = ev.filter(
        parse_ga_filters(ev, "event_type==view,event_type==click;value>10.0")
    )
    want = ev.filter(
        ((F.col("event_type") == "view") | (F.col("event_type") == "click"))
        & (F.col("value") > 10.0)
    )
    assert got.count() == want.count() > 0


def test_filter_dsl_contains_and_regex(spark):
    p = load_table(spark, SF_DIR, "part")
    assert (
        p.filter(parse_ga_filters(p, "p_name=@widget")).count()
        == p.filter(F.col("p_name").contains("widget")).count()
    )
    assert (
        p.filter(parse_ga_filters(p, "p_type=~^PROMO;p_name!@cold")).count()
        == p.filter(
            F.col("p_type").rlike("^PROMO") & ~F.col("p_name").contains("cold")
        ).count()
    )


def test_filter_dsl_numeric_comparators(spark):
    o = load_table(spark, SF_DIR, "orders")
    n = o.filter(parse_ga_filters(o, "o_totalprice>=100000.0;o_totalprice<200000.0"))
    m = o.filter(
        (F.col("o_totalprice") >= 100000.0) & (F.col("o_totalprice") < 200000.0)
    )
    assert n.count() == m.count() > 0


def test_report_matches_handbuilt_plan(spark):
    ev = load_table(spark, SF_DIR, "events")
    rep = report(
        ev,
        dimensions=["event_type"],
        metrics={"sessions": "count", "users": "users:user_id"},
        date_range=("ts", "2024-01-01", "2024-01-15"),
        sort=["-sessions"],
        limit=3,
    ).collect()
    hand = (
        ev.filter(
            (F.col("ts") >= F.lit("2024-01-01").cast("timestamp"))
            & (F.col("ts") < F.lit("2024-01-15").cast("timestamp"))
        )
        .groupBy("event_type")
        .agg(F.count("*").alias("sessions"), F.countDistinct("user_id").alias("users"))
        .orderBy(F.col("sessions").desc())
        .limit(3)
        .collect()
    )
    assert [r.asDict() for r in rep] == [r.asDict() for r in hand]


def test_report_pagination_disjoint_pages(spark):
    o = load_table(spark, SF_DIR, "orders")
    kw = dict(
        dimensions=["o_orderkey"],
        metrics={"n": "count"},
        sort=["-n", "o_orderkey"],
    )
    page1 = report(o, limit=20, **kw).collect()
    page2 = report(o, limit=20, offset=20, **kw).collect()
    keys1 = {r.o_orderkey for r in page1}
    keys2 = {r.o_orderkey for r in page2}
    assert len(keys1) == len(keys2) == 20 and not keys1 & keys2


def test_unknown_metric_and_bad_filter_raise(spark):
    ev = load_table(spark, SF_DIR, "events")
    import pytest

    with pytest.raises(ValueError, match="unknown metric"):
        report(ev, dimensions=["event_type"], metrics={"x": "median:value"}).collect()
    with pytest.raises(ValueError, match="no GA operator"):
        parse_ga_filters(ev, "event_type~~view")
