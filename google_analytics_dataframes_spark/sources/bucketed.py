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
    options: dict | None = None,
) -> None:
    """Persist ``df`` bucketed (and optionally sorted) by ``bucket_col``.

    Sorting within buckets lets the later SortMergeJoin skip its sort too
    (plans collapse to scan -> join).  ``options`` forwards writer options
    (e.g. ``parquet.block.size`` — tests shrink it to reproduce, at toy
    scale, the many-row-groups-per-file structure a production-sized
    bucket file has naturally)."""
    w = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort_col is not None:
        w = w.sortBy(sort_col)
    if path is not None:
        w = w.option("path", path)
    for k, v in (options or {}).items():
        w = w.option(k, v)
    w.format("parquet").saveAsTable(table)


# Persistent dedup-index cache (VERDICT r7 item #7): the corpus side of the
# incremental near-dup join, materialized ONCE as a bucketed+sorted catalog
# table so every subsequent ingest batch joins against the STORED index —
# no per-run recomputation of corpus signatures, no corpus-side shuffle.
# Keyed like the streaming staging cache: (session, dataset, fingerprint),
# so a new session, another sf, or regenerated testdata rebuilds.
_GRAM_INDEX_CACHE: dict[tuple, str] = {}


def gram_index_table(
    spark: SparkSession, sf_dir: str, n_buckets: int = 8
) -> str:
    """Materialize (or reuse) the corpus-side char-3-gram signature index
    as a bucketed catalog table and return its name.

    Schema ``(doc_id, item, sz)``: one row per (corpus doc, distinct
    3-gram), with ``sz`` the doc's distinct-gram count denormalized onto
    every row so the verify step never joins back to a per-doc table.
    Bucketed AND sorted by ``item`` — the candidate-join key — so (a) an
    incoming batch joins with a ONE-SIDED exchange (only the batch
    moves; the 100-TB corpus index is already hash-placed), and (b)
    within each bucket file the sorted order gives parquet row groups
    narrow, disjoint ``item`` min/max ranges, so point/range predicates
    on the gram key prune row groups via footer stats alone
    (tests/test_plans.py::test_gram_index_row_groups_prunable).

    Bucket-count note (same as :func:`write_bucketed`): 8 suits the toy
    SFs; at the 100 TB target the index would be written with
    thousands of buckets sized ~128 MB each — the count is a caller
    decision fixed at write time."""
    import os

    from google_analytics_dataframes_spark.io import (
        scratch_dir,
        table_fingerprint,
    )

    fp = table_fingerprint(sf_dir, "documents")
    key = ("gram_index", spark.sparkContext.applicationId, sf_dir, fp)
    cached = _GRAM_INDEX_CACHE.get(key)
    if cached is not None and spark.catalog.tableExists(cached):
        return cached
    sf_tag = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    table = f"gram_index_{sf_tag}_{fp}"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    write_bucketed(
        corpus_gram_relation(spark, sf_dir),
        table,
        "item",
        n_buckets,
        sort_col="item",
        path=os.path.join(scratch_dir("gram_index"), table),
    )
    _GRAM_INDEX_CACHE[key] = table
    return table


def corpus_gram_relation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus-side signature relation the gram index stores: one row
    per (existing-corpus doc, distinct char-3-gram) with the per-doc
    distinct-gram count denormalized on.  Shared by
    :func:`gram_index_table` and the row-group-layout evidence test
    (tests/test_plans.py::test_gram_index_row_groups_prunable) so the
    tested bytes are built by the same lineage the query reads."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from google_analytics_dataframes_spark.io import load_table

    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.filter(F.length("source") == 4)
        .select(
            "doc_id",
            F.explode(
                F.array_distinct(
                    F.expr(
                        "transform(sequence(1, greatest(length(text) - 2, 1)),"
                        " p -> substring(text, p, 3))"
                    )
                )
            ).alias("item"),
        )
        .withColumn("sz", F.count("*").over(W.partitionBy("doc_id")))
    )


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
