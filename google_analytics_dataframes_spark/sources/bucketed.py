"""Bucketed-table layout for co-located, shuffle-free joins (SURVEY.md §4.2
"Partitioning & shuffle"; 100-TB posture BASELINE.json:6).

At 100 TB the dominant cost of the star-schema joins (orders x lineitem,
events x users) is the shuffle of both fact tables on the join key.  Writing
both sides bucketed BY THE SAME key into the SAME number of buckets makes the
join a per-bucket zip: Catalyst sees compatible `HashPartitioning` output from
both scans and plans a SortMergeJoin with ZERO Exchange operators — verified
by `tests/test_plans.py::test_bucketed_join_has_no_exchange`.

Bucket-count sizing: buckets are fixed at write time, so size them for the
TARGET scale — `rows_at_scale / rows_per_task` (e.g. 100 TB of lineitem at
~128 MB per bucket file per partition ≈ tens of thousands of buckets), not for
the toy factor.  Too few buckets at scale = giant tasks; AQE cannot re-split a
bucketed scan.

Requires a persistent metastore table (`saveAsTable`) — bucket metadata lives
in the catalog, not the parquet footers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int,
    sort_col: str | None = None,
    path: str | None = None,
) -> None:
    """Persist ``df`` bucketed (and optionally sorted) by ``bucket_col``.

    Sorting within buckets lets the later SortMergeJoin skip its sort too
    (plans collapse to scan -> join)."""
    w = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort_col is not None:
        w = w.sortBy(sort_col)
    if path is not None:
        w = w.option("path", path)
    w.format("parquet").saveAsTable(table)


def colocated_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on,
    how: str = "inner",
    merge_hint: bool = False,
) -> DataFrame:
    """Join two same-bucketed catalog tables.  With both sides bucketed on
    the join key into equal bucket counts, the physical plan contains no
    Exchange: each task reads bucket i of both sides and joins locally.

    ``merge_hint`` forces SortMergeJoin — use it when demonstrating/testing
    co-location on toy-sized tables, where Catalyst would otherwise pick a
    broadcast join (at the target scale neither fact table fits the
    broadcast threshold, so the SMJ path is the one that matters)."""
    left = spark.table(left_table)
    if merge_hint:
        left = left.hint("MERGE")
    return left.join(spark.table(right_table), on, how)
