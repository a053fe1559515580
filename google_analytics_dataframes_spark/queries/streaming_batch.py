"""§2.9 Streaming semantics, batch-first (SURVEY.md).

GA's server-side model is inherently streaming: sessions are
30-minutes-of-inactivity windows over a hit stream [K].  Each operator here
is the oracle-checkable *batch* formulation; `streaming/jobs.py` mirrors
st1/st3 (plus watermark/dedup/stateful st4-st7) on `readStream` with an
`availableNow` trigger, and tests assert stream == batch.

Window alignment: Spark's `window()` buckets align to the epoch, so the
DuckDB twin reconstructs starts from integer epoch-second arithmetic —
identical flooring on both engines.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from google_analytics_dataframes_spark.registry import register
from google_analytics_dataframes_spark.queries._util import T, dsum, dsum_sql

_DEC = "decimal(30,6)"


@register(
    "st1_tumbling",
    oracle=f"""
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type, COUNT(*) AS n, {dsum_sql('value')} AS sum_value
    FROM events GROUP BY window_start, event_type
    """,
)
def st1_tumbling(spark, sf_dir):
    """Tumbling 1-hour windows per event type — the groupBy(window(...))
    shape that runs unchanged under readStream."""
    ev = T(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count("*").alias("n"), dsum("value").alias("sum_value"))
        .select(
            F.date_format(F.col("window.start"), "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "event_type",
            "n",
            "sum_value",
        )
    )


@register(
    "st2_sliding",
    oracle=f"""
    WITH slid AS (
      SELECT TIMESTAMP '1970-01-01'
               + ((epoch_us(ts) // 1000000) // 900 * 900 - g.i * 900) * INTERVAL 1 SECOND
               AS wstart,
             event_type, value
      FROM events CROSS JOIN generate_series(0, 3) AS g(i))
    SELECT strftime(wstart, '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type, COUNT(*) AS n, {dsum_sql('value')} AS sum_value
    FROM slid GROUP BY window_start, event_type
    """,
)
def st2_sliding(spark, sf_dir):
    """Sliding windows (1 h length, 15 min slide): every event lands in
    exactly 4 windows.  Oracle materializes the same 4 epoch-aligned starts
    per event via a 0..3 offsets cross join."""
    ev = T(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "15 minutes"), "event_type")
        .agg(F.count("*").alias("n"), dsum("value").alias("sum_value"))
        .select(
            F.date_format(F.col("window.start"), "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "event_type",
            "n",
            "sum_value",
        )
    )


@register(
    "st3_sessionize",
    oracle=f"""
    WITH seq AS (
      SELECT user_id, event_id, value, epoch_us(ts) AS ts_us,
             lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev_us
      FROM events),
    flagged AS (
      SELECT *, CASE WHEN prev_us IS NULL
                       OR ts_us - prev_us >= 1800000000 THEN 1 ELSE 0 END AS is_new
      FROM seq),
    numbered AS (
      SELECT *, SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM flagged)
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           strftime(TIMESTAMP '1970-01-01' + (MIN(ts_us) // 1000000) * INTERVAL 1 SECOND,
                    '%Y-%m-%d %H:%M:%S') AS session_start,
           COUNT(*) AS n_events,
           {dsum_sql('value')} AS session_value,
           (MAX(ts_us) - MIN(ts_us)) // 1000000 AS duration_sec
    FROM numbered GROUP BY user_id, session_id
    """,
)
def st3_sessionize(spark, sf_dir):
    """Sessionization — GA's core session model [K]: a gap of 30+ minutes
    of inactivity starts a new session (gap >= 30 min, matching Spark's
    end-exclusive `session_window` [start, last+gap) so the streaming twin
    in streaming/jobs.py is boundary-identical).  Batch formulation:
    lag -> gap flag -> running sum as session id -> per-session metrics.
    One shuffle on user_id."""
    ev = T(spark, sf_dir, "events").select(
        "user_id", "event_id", "value", F.unix_micros("ts").alias("ts_us")
    )
    w_seq = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    flagged = ev.withColumn(
        "is_new",
        F.when(
            F.lag("ts_us").over(w_seq).isNull()
            | (F.col("ts_us") - F.lag("ts_us").over(w_seq) >= 1_800_000_000),
            1,
        ).otherwise(0),
    )
    numbered = flagged.withColumn(
        "session_id",
        F.sum("is_new").over(w_seq.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return numbered.groupBy("user_id", F.col("session_id").cast("long").alias("session_id")).agg(
        F.date_format(
            F.timestamp_seconds(F.floor(F.min("ts_us") / 1_000_000)),
            "yyyy-MM-dd HH:mm:ss",
        ).alias("session_start"),
        F.count("*").alias("n_events"),
        dsum("value").alias("session_value"),
        ((F.max("ts_us") - F.min("ts_us")) / F.lit(1_000_000)).cast("long").alias(
            "duration_sec"
        ),
    )
