"""Single-pass audit counters (operators/observability.py): the observe
API must report exact stage-level row accounting without any extra action
or scan — the counters ride the one pass the pipeline already runs."""

from __future__ import annotations

from pyspark.sql import functions as F

from google_analytics_dataframes_spark.io import load_table
from google_analytics_dataframes_spark.operators.observability import (
    audited_filter,
    audited_stage,
)
from tests.conftest import SF_DIR


def test_audited_filter_accounts_for_every_row(spark):
    docs = load_table(spark, SF_DIR, "documents")
    n_total = docs.count()
    cond = F.length("text") >= 200
    kept, obs = audited_filter(docs, cond, "len_gate")
    n_kept = kept.count()  # the ONE action; counters ride it
    got = obs.get
    assert got["rows_in"] == n_total
    assert got["rows_kept"] == n_kept
    assert got["rows_dropped"] == n_total - n_kept
    assert 0 < n_kept < n_total  # the gate actually split the corpus


def test_audited_stage_metrics_match_direct_aggregation(spark):
    ev = load_table(spark, SF_DIR, "events")
    # DISTINCT aggregates are rejected in observed metrics (they would
    # need a shuffle of their own, breaking the ride-along contract) —
    # the mergeable HLL sketch is the allowed and scale-correct form
    staged, obs = audited_stage(
        ev,
        "ingest",
        F.count(F.lit(1)).alias("n"),
        F.approx_count_distinct("user_id").alias("users"),
        F.sum(F.col("value").cast("decimal(30,6)")).cast("double").alias("v"),
    )
    # run a DOWNSTREAM aggregation as the single action — the stage
    # metrics must still see the full pre-aggregation row flow
    per_type = staged.groupBy("event_type").count()
    assert per_type.count() > 0
    direct = ev.agg(
        F.count(F.lit(1)).alias("n"),
        F.approx_count_distinct("user_id").alias("users"),
        F.sum(F.col("value").cast("decimal(30,6)")).cast("double").alias("v"),
    ).first()
    got = obs.get
    assert got["n"] == direct["n"]
    assert got["users"] == direct["users"]
    assert abs(got["v"] - direct["v"]) < 1e-9


def test_chained_audited_filters_compose(spark):
    """The funnel report every pipeline wants: N gates, one action, full
    drop accounting at every stage."""
    docs = load_table(spark, SF_DIR, "documents")
    s1, o1 = audited_filter(docs, F.length("text") >= 100, "min_len")
    s2, o2 = audited_filter(s1, F.col("lang") == "en", "lang_en")
    final = s2.count()
    g1, g2 = o1.get, o2.get
    assert g1["rows_kept"] == g2["rows_in"]  # stages chain exactly
    assert g2["rows_kept"] == final
    assert g1["rows_in"] == docs.count()
