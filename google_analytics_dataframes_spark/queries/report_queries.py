"""Report-builder queries — the reference's end-user API exercised
end-to-end (SURVEY.md §3.2 E1): every GA request parameter (dimensions,
metrics, filters DSL, date range, sort, pagination) in one declarative plan.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from google_analytics_dataframes_spark.registry import register
from google_analytics_dataframes_spark.report import report
from google_analytics_dataframes_spark.queries._util import T, dsum_sql


@register(
    "rb1_report_events",
    oracle=f"""
    SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day, event_type,
           COUNT(*) AS sessions, {dsum_sql('value')} AS total_value,
           COUNT(DISTINCT user_id) AS users
    FROM events
    WHERE ts >= TIMESTAMP '2024-01-05' AND ts < TIMESTAMP '2024-01-20'
      AND (event_type = 'view' OR event_type = 'click') AND value > 10.0
    GROUP BY day, event_type
    ORDER BY sessions DESC, day, event_type
    LIMIT 50
    """,
)
def rb1_report_events(spark, sf_dir):
    """The canonical GA question through the report builder: sessions /
    value / users by (day, event_type), date-windowed, GA-filter-DSL
    filtered (`,`=OR binds inside `;`=AND), sorted, paginated."""
    ev = T(spark, sf_dir, "events")
    return report(
        ev,
        dimensions=[
            F.date_format(F.date_trunc("day", F.col("ts")), "yyyy-MM-dd").alias("day"),
            "event_type",
        ],
        metrics={
            "sessions": "count",
            "total_value": "sum:value",
            "users": "users:user_id",
        },
        filters="event_type==view,event_type==click;value>10.0",
        date_range=("ts", "2024-01-05", "2024-01-20"),
        sort=["-sessions", "day", "event_type"],
        limit=50,
    )


@register(
    "rb2_report_orders",
    oracle=f"""
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS n_orders, {dsum_sql('o_totalprice')} AS revenue,
           MAX(o_totalprice) AS top_order
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
      AND contains(o_orderpriority, 'URGENT') AND o_totalprice >= 1000.0
    GROUP BY o_orderstatus, o_orderpriority
    ORDER BY revenue DESC, o_orderstatus
    """,
)
def rb2_report_orders(spark, sf_dir):
    """Report over the star schema with the `=@` contains operator and a
    numeric `>=` filter — GA DSL against non-GA-shaped data."""
    o = T(spark, sf_dir, "orders")
    return report(
        o,
        dimensions=["o_orderstatus", "o_orderpriority"],
        metrics={
            "n_orders": "count",
            "revenue": "sum:o_totalprice",
            "top_order": "max:o_totalprice",
        },
        filters="o_orderpriority=@URGENT;o_totalprice>=1000.0",
        date_range=("o_orderdate", "1996-01-01", "1998-01-01"),
        sort=["-revenue", "o_orderstatus"],
    )
