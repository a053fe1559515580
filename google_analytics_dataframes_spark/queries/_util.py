"""Shared helpers for registered queries: table loading + re-exported
determinism builders (canonical home: ..determinism)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from google_analytics_dataframes_spark.determinism import (  # noqa: F401
    FMT_D_SQL,
    FMT_TS_SQL,
    davg,
    davg_sql,
    dsum,
    dsum_sql,
    fmt_d,
    fmt_ts,
    r6,
)
from google_analytics_dataframes_spark.io import load_table


def T(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load a driver table (lazy)."""
    return load_table(spark, sf_dir, name)
