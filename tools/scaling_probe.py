#!/usr/bin/env python
"""Scaling probe: measure the five headline LLM-pipeline operators across
scale factors, including a synthetic 10x point ABOVE the largest shipped SF
(sf0.1), and print a sec-vs-sf table for BASELINE.md.

The synthetic "synth-sf1" documents table is 10 copies of sf0.1's documents
(50,000 docs): copy 0 verbatim, copies 1-9 with every token suffixed by the
copy index ("spark" -> "spark_3").  Suffixing makes the ten sub-corpora
pairwise DISJOINT in tokens, word shingles, and (almost all) char n-grams
while keeping each copy's internal near-dup structure isomorphic to the
original — so candidate-pair and cluster counts scale exactly linearly with
corpus size and the probe measures ENGINE scaling, not a duplication
artifact (a permutation variant was tried first: permuted copies keep
identical token multisets, so token/char-gram similarity ops saw every
copy-group as a 10-way near-dup cluster and pair counts grew ~45x —
quadratic by construction, not by engine fault).  n_chars is recomputed for
the suffixed text.  It is a MEASUREMENT artifact for scaling only —
correctness runs use the driver's own tables.

Protocol: per (sf, query) one untimed warm-up (codegen + any session-shared
materialization, matching BASELINE.md's warm protocol), then median of 3
timed runs through the noop sink.

Usage: python tools/scaling_probe.py [--skip-synth]
"""

from __future__ import annotations

import json
import os
import sys
import time
from statistics import median

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES = [
    "l2_near_dedup_minhash",
    "l7_string_simjoin",
    "l29_dedup_clusters",
    "l44_clean_corpus",
    "l45_corpus_shuffle",
    # round-4 token-pipeline representatives
    "l53_decontam_multi_n",
    "l56_bigram_logprob",
    "l60_incremental_neardup",
]

SYNTH_DIR = "/tmp/spark_graft_synth_sf1"


def build_synth(spark, base_dir: str) -> str:
    """10x documents from ``base_dir``: copy 0 verbatim, copies 1-9 with
    copy-suffixed tokens (disjoint isomorphic sub-corpora)."""
    import pyspark.sql.functions as F

    out = os.path.join(SYNTH_DIR, "documents.parquet")
    if os.path.exists(os.path.join(SYNTH_DIR, "_BUILT2")):
        return SYNTH_DIR
    docs = spark.read.parquet(os.path.join(base_dir, "documents.parquet"))
    n = docs.agg(F.max("doc_id")).first()[0] + 1
    rep = docs.select(
        F.explode(F.sequence(F.lit(0), F.lit(9))).alias("copy"), "*"
    )
    suffixed = F.expr(
        "array_join(transform(split(text, ' '), "
        "t -> concat(t, '_', cast(copy AS string))), ' ')"
    )
    text2 = F.when(F.col("copy") == 0, F.col("text")).otherwise(suffixed)
    synth = rep.select(
        (F.col("doc_id") + F.col("copy") * F.lit(n)).alias("doc_id"),
        text2.alias("text"),
        "lang",
        "source",
        F.length(text2).cast("long").alias("n_chars"),
    )
    synth.repartition(8).write.mode("overwrite").parquet(out)
    open(os.path.join(SYNTH_DIR, "_BUILT2"), "w").close()
    return SYNTH_DIR


def main() -> None:
    skip_synth = "--skip-synth" in sys.argv

    from google_analytics_dataframes_spark.registry import registry
    from google_analytics_dataframes_spark.session import get_spark

    spark = get_spark(app_name="scaling_probe")
    spark.sparkContext.setLogLevel("ERROR")
    reg = registry()

    points: list[tuple[str, float, str]] = [
        ("sf0.001", 0.001, "/root/testdata/sf0.001"),
        ("sf0.01", 0.01, "/root/testdata/sf0.01"),
        ("sf0.1", 0.1, "/root/testdata/sf0.1"),
    ]
    if not skip_synth:
        points.append(("synth-sf1", 1.0, build_synth(spark, "/root/testdata/sf0.1")))

    def run(name: str, sf_dir: str) -> float:
        t0 = time.time()
        reg[name].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        return time.time() - t0

    results: dict[str, dict[str, float]] = {q: {} for q in QUERIES}
    for label, _sf, d in points:
        for q in QUERIES:
            run(q, d)  # untimed warm-up
            results[q][label] = round(median(run(q, d) for _ in range(3)), 3)
            print(f"# {label} {q}: {results[q][label]}s", file=sys.stderr)

    print(json.dumps({"queries": results, "points": [p[0] for p in points]}))
    labels = [p[0] for p in points]
    print("\n| query | " + " | ".join(labels) + " |")
    print("|" + "---|" * (len(labels) + 1))
    for q in QUERIES:
        print(
            f"| {q} | "
            + " | ".join(f"{results[q].get(l, float('nan')):.2f}" for l in labels)
            + " |"
        )


if __name__ == "__main__":
    main()
