#!/usr/bin/env python
"""Round-13 measurement of the SHIPPED prefix crossover threshold
(VERDICT r12 item #7).

The r12 planted-skew probe's index-path safety argument is structural:
"at the scale where df² would hurt, the router has already switched to
prefix" (operators/dedup.py jaccard_pairs, prefix_min_items=2M).  The
existing tests force the switch with parameters; nothing measures the
SHIPPED threshold on a corpus that actually crosses it.  This probe
synthesizes two corpora that bracket the default crossover and runs
``jaccard_pairs`` with ALL DEFAULTS and NO stats dict (the production
probe path):

* **over**  — ~2.08M (doc, item) index rows (52 000 docs x 40 slots,
  50 000-item vocabulary): the router must pick the ppjoin prefix
  strategy (plan signature: the ``array_intersect`` verify stage).
* **under** — ~1.9M rows (47 500 docs): the router must stay on the
  plain inverted-index join (no ``array_intersect`` in the plan).

Corpus shape: item = 'it' || xxhash64(base_doc, slot) % 50 000, all
engine-side (no driver materialization).  Planted near-dup twins at
doc_id % 1000 == 7: doc d+1 copies doc d's slots 0..37 (38 of ~40
items shared -> jaccard ≈ 0.90), everything else is hash-random (two
random docs share an expected 0.03 items — a >=60% accident is
impossible), so the expected answer is EXACTLY the planted twin set
and both strategies' recall is asserted, not just their wall time.

Per run: wall seconds + the heaviest stage's task-time histogram
(p50/max executorRunTime via the UI REST API, the same skew number the
r12 probe reports) under a per-run job group.

Usage: python tools/router_threshold_probe_r13.py
"""

from __future__ import annotations

import json
import sys
import time
import urllib.request

sys.path.insert(0, "/root/repo")

VOCAB = 50_000
SLOTS = 40
N_OVER = 52_000   # 2.08M rows: just past the shipped 2M crossover
N_UNDER = 47_500  # 1.90M rows: just under it


def rest(spark, path):
    base = spark.sparkContext.uiWebUrl
    with urllib.request.urlopen(f"{base}/api/v1/applications{path}") as r:
        return json.load(r)


def heaviest_stage_summary(spark, app_id, stage_ids):
    stages = rest(spark, f"/{app_id}/stages?status=complete")
    mine = [s for s in stages if s["stageId"] in stage_ids]
    if not mine:
        return None
    heavy = max(mine, key=lambda s: s.get("executorRunTime", 0))
    sid = heavy["stageId"]
    q = rest(spark, f"/{app_id}/stages/{sid}/0/taskSummary?quantiles=0.5,1.0")
    p50, mx = q["executorRunTime"]
    return {
        "stage": sid,
        "n_tasks": heavy["numCompleteTasks"],
        "task_p50_ms": round(p50, 1),
        "task_max_ms": round(mx, 1),
        "skew_ratio": round(mx / max(p50, 1e-9), 1),
    }


def synth_items(spark, n_docs):
    """(doc_id, item) with per-doc-distinct items, planted twins at
    doc_id % 1000 == 7 (doc d+1 copies d's slots 0..37)."""
    from pyspark.sql import functions as F

    docs = spark.range(n_docs).select(F.col("id").alias("doc_id"))
    slots = docs.select(
        "doc_id", F.explode(F.sequence(F.lit(0), F.lit(SLOTS - 1))).alias("slot")
    )
    base = F.when(
        (F.col("doc_id") % 1000 == 8) & (F.col("slot") < 38),
        F.col("doc_id") - 1,
    ).otherwise(F.col("doc_id"))
    item = F.concat(
        F.lit("it"), F.pmod(F.xxhash64(base, F.col("slot")), F.lit(VOCAB))
    )
    return slots.select("doc_id", item.alias("item")).distinct()


def main() -> None:
    import os

    from pyspark.sql import SparkSession

    from google_analytics_dataframes_spark.operators import dedup as D
    from google_analytics_dataframes_spark.plans import audit
    from google_analytics_dataframes_spark.session import configure

    spark = configure(
        SparkSession.builder.master("local[32]")
        .appName("router_threshold_probe_r13")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.retainedStages", "2000")
        .config(
            "spark.driver.memory",
            os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
        )
        .getOrCreate()
    )
    sc = spark.sparkContext
    sc.setLogLevel("ERROR")
    app_id = rest(spark, "")[0]["id"]

    results: dict = {"vocab": VOCAB, "slots": SLOTS}
    for label, n_docs, expect_prefix in (
        ("over", N_OVER, True),
        ("under", N_UNDER, False),
    ):
        items = synth_items(spark, n_docs)
        n_rows = items.count()
        planted = {
            (d, d + 1) for d in range(7, n_docs - 1, 1000)
        }
        sc.setJobGroup(label, label, interruptOnCancel=False)
        t0 = time.time()
        # ALL DEFAULTS, NO stats: the shipped router measures n_items and
        # the vocab cap itself — this is the threshold under test
        out = D.jaccard_pairs(items, 60)
        plan = audit.formatted_plan(out)
        has_prefix = "array_intersect" in plan
        assert has_prefix == expect_prefix, (
            f"{label}: n_rows={n_rows}, expected "
            f"{'prefix' if expect_prefix else 'index'} strategy, plan says "
            f"{'prefix' if has_prefix else 'index'}"
        )
        pairs = {(r.doc_a, r.doc_b) for r in out.collect()}
        wall = round(time.time() - t0, 2)
        sc.setJobGroup("idle", "idle")
        assert pairs == planted, (
            f"{label}: planted twin set mismatch "
            f"(missing={len(planted - pairs)}, extra={len(pairs - planted)})"
        )
        jobs = rest(spark, f"/{app_id}/jobs")
        stage_ids = {
            s
            for j in jobs
            if j.get("jobGroup") == label
            for s in j["stageIds"]
        }
        results[label] = {
            "n_docs": n_docs,
            "n_index_rows": n_rows,
            "strategy": "prefix" if has_prefix else "index",
            "wall_s": wall,
            "n_pairs": len(pairs),
            "heaviest_stage": heaviest_stage_summary(spark, app_id, stage_ids),
        }
        print(f"## {label}: {json.dumps(results[label])}", flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
