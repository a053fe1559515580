#!/usr/bin/env python
"""Round-12 planted-skew probe for the pair/LSH candidate-generation
family (VERDICT r11 item #6).

Every synth so far is uniform; real corpora are power-law.  This probe
PLANTS the power-law head — one hot 3-gram shared by >=20% of the
corpus (text || ' qzx' on doc_id % 100 == 5 over the src5 slice, the
l12/l29/l33 dedup corpus, whose ids are all ≡ 5 mod 20, so the
predicate selects exactly 1-in-5 of it; asserted 0.15-0.25 at run
time) — and measures what each candidate-generation strategy does
with it:

  index    plain inverted-index join (the adaptive router's choice below
           prefix_min_items): the hot gram enumerates ~(0.2 n)^2 pair
           rows, all hashed to ONE reducer by the gram key — the classic
           last-reducer skew this probe exists to expose.
  prefix   ppjoin prefix filter (the router's choice at scale): the hot
           gram is the corpus's most frequent item, so the global
           frequency order excludes it from every doc's prefix — zero
           candidates from the hot key BY CONSTRUCTION.
  bitmask  packed-mask broadcast (bounded-vocab regime, vocab cap raised
           to 4096 to admit the 1891-gram corpus): no per-item candidate
           enumeration exists at all; the hot gram is one bit.

Each strategy runs on the SKEWED and the CONTROL corpus under its own
Spark job group; pair-set parity across strategies is asserted on both
corpora (the planted gram must change candidates' ROUTING, never the
answer).  Task-time histograms come from the UI REST API
(/api/v1/.../stages taskSummary): for each (variant, corpus) the probe
reports the heaviest stage's task p50/max executorRunTime — the
max/p50 ratio IS the skew number the verdict asks for.

Usage: python tools/skew_probe_r12.py [SF_DIR]
"""

from __future__ import annotations

import json
import sys
import time
import urllib.request

sys.path.insert(0, "/root/repo")

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
# src5 doc_ids are all ≡ 5 (mod 20) by the generator's construction
# (residues mod 100 land uniformly on {5,25,45,65,85}), so % 100 == 5
# selects exactly 1-in-5 of the slice — the >=20% hot head the verdict
# asks for.  The same predicate holds at the 10x synth (copy offsets
# are multiples of 100).
HOT_MOD, HOT_RES = 100, 5


def rest(spark, path):
    base = spark.sparkContext.uiWebUrl
    with urllib.request.urlopen(f"{base}/api/v1/applications{path}") as r:
        return json.load(r)


def heaviest_stage_summary(spark, app_id, stage_ids):
    """(stage_id, task p50 ms, task max ms) for the stage with the
    largest total executorRunTime among ``stage_ids``."""
    stages = rest(spark, f"/{app_id}/stages?status=complete")
    mine = [s for s in stages if s["stageId"] in stage_ids]
    if not mine:
        return None
    heavy = max(mine, key=lambda s: s.get("executorRunTime", 0))
    sid = heavy["stageId"]
    q = rest(
        spark,
        f"/{app_id}/stages/{sid}/0/taskSummary?quantiles=0.5,1.0",
    )
    p50, mx = q["executorRunTime"]
    return {
        "stage": sid,
        "n_tasks": heavy["numCompleteTasks"],
        "task_p50_ms": round(p50, 1),
        "task_max_ms": round(mx, 1),
        "skew_ratio": round(mx / max(p50, 1e-9), 1),
    }


def main() -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from google_analytics_dataframes_spark.operators import dedup as D
    from google_analytics_dataframes_spark.session import configure

    import os

    spark = configure(
        SparkSession.builder.master("local[32]")
        .appName("skew_probe_r12")
        .config("spark.sql.shuffle.partitions", "32")
        .config(
            "spark.driver.memory",
            os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
        )
        .config("spark.ui.enabled", "true")  # the probe READS the task API
        .config("spark.ui.retainedStages", "2000")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .getOrCreate()
    )
    sc = spark.sparkContext
    from google_analytics_dataframes_spark.io import load_table

    docs = (
        load_table(spark, SF_DIR, "documents")
        .filter(F.col("source") == "src5")
        .select("doc_id", "text")
    )
    skewed = docs.withColumn(
        "text",
        F.when(
            F.col("doc_id") % HOT_MOD == HOT_RES,
            F.concat("text", F.lit(" qzx")),
        ).otherwise(F.col("text")),
    )

    def items_of(d):
        return d.select(
            "doc_id", F.explode(D.char_ngrams("text", 3)).alias("item")
        )

    # superhot: the gram in 100% of docs — the adversarial extreme that
    # FORCES the index path's single-reducer enumeration (df^2/2 pair
    # rows on one key) so the absorption claim is tested against a
    # visible failure mode, not just a mild one
    superhot = docs.withColumn("text", F.concat("text", F.lit(" qzx")))
    corpora = {
        "control": items_of(docs),
        "skewed": items_of(skewed),
        "superhot": items_of(superhot),
    }
    # hot-key audit: the planted gram's DOCUMENT frequency (distinct
    # docs, not gram rows — char_ngrams is not per-doc distinct, so a
    # natural 'qzx' occurrence would otherwise inflate the share and
    # trip the band assertion with a confusing number; ADVICE r12)
    hot_n = (
        corpora["skewed"]
        .filter(F.col("item") == "qzx")
        .select("doc_id")
        .distinct()
        .count()
    )
    n_docs = docs.count()
    assert 0.15 <= hot_n / n_docs <= 0.25, (hot_n, n_docs)

    variants = {
        # (kwargs for jaccard_pairs) — threshold 60, the l12 contract
        "index": dict(max_bitmask_vocab=1, prefix_min_items=10**12),
        "prefix": dict(max_bitmask_vocab=1, prefix_min_items=1),
        "bitmask": dict(max_bitmask_vocab=4096),
    }

    app_id = rest(spark, "")[0]["id"]
    results: dict = {
        "sf_dir": SF_DIR,
        "n_docs": n_docs,
        "hot_gram_docs": hot_n,
        "hot_share": round(hot_n / n_docs, 3),
    }
    pairsets: dict = {}
    for corpus_name, items in corpora.items():
        for vname, kw in variants.items():
            label = f"{vname}@{corpus_name}"
            sc.setJobGroup(label, label, interruptOnCancel=False)
            t0 = time.time()
            out = D.jaccard_pairs(items, 60, **kw)
            pairs = {
                (r.doc_a, r.doc_b, r.inter, r.uni) for r in out.collect()
            }
            wall = round(time.time() - t0, 2)
            sc.setJobGroup("idle", "idle")
            pairsets.setdefault(corpus_name, {})[vname] = pairs
            jobs = rest(spark, f"/{app_id}/jobs")
            stage_ids = {
                s
                for j in jobs
                if j.get("jobGroup") == label
                for s in j["stageIds"]
            }
            summ = heaviest_stage_summary(spark, app_id, stage_ids)
            results[label] = {
                "wall_s": wall,
                "n_pairs": len(pairs),
                "heaviest_stage": summ,
            }
            print(f"## {label}: {json.dumps(results[label])}", flush=True)
    for corpus_name, by_variant in pairsets.items():
        vals = list(by_variant.values())
        assert all(v == vals[0] for v in vals), (
            f"strategy pair sets diverge on {corpus_name}"
        )
        results[f"parity@{corpus_name}"] = len(vals[0])
    print(json.dumps(results))


if __name__ == "__main__":
    main()
