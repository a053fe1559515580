#!/usr/bin/env python
"""Benchmark harness (BASELINE.md protocol): run every registered query at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS], print ONE JSON line:

    {"metric": "total_query_sec", "value": N, "unit": "sec",
     "queries": {name: sec, ...}, "sf": 0.1}

Timing excludes driver-side result transfer: each plan executes fully via
the `noop` sink (scan + shuffles + aggs run, rows are discarded JVM-side),
which is the honest engine-throughput number.

Warm-up protocol (matches BASELINE.md's "warm" measurement): each query gets
ONE untimed warm-up execution — paying its own Janino/whole-stage-codegen
compile, parquet footer reads, and any session-level shared materialization —
before the timed run.  Round-3 verdict showed the old single-global-warm-up
protocol overstated big-fold plans ~10x (5-7 s cold-codegen vs 0.4-0.9 s
warm); the cold first-run times are still recorded in BENCH_DETAIL.json
under "cold_queries" for transparency.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).removeprefix("sf"))
    except ValueError:
        sf = -1.0

    from google_analytics_dataframes_spark.registry import registry
    from google_analytics_dataframes_spark.session import get_spark

    # Environment telemetry (VERDICT r4 item #6): the driver runs bench.py in
    # ITS container, so recording engine versions here surfaces the driver's
    # actual DuckDB/PySpark builds in BENCH_r{N}.json — closing the env-skew
    # hypothesis that r04's six hash failures raised (they pass bitwise
    # against local DuckDB 1.0.0).
    import platform

    import duckdb
    import pyspark

    env = {
        "python": platform.python_version(),
        "pyspark": pyspark.__version__,
        "duckdb": duckdb.__version__,
    }

    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")
    # session confs that change plans or hash-relevant semantics
    for k in (
        "spark.sql.shuffle.partitions",
        "spark.sql.adaptive.enabled",
        "spark.sql.session.timeZone",
        "spark.sql.execution.arrow.pyspark.enabled",
        "spark.master",
    ):
        try:
            env[k] = spark.conf.get(k)
        except Exception:
            env[k] = None
    reg = registry()

    def execute(name: str) -> float:
        t0 = time.time()
        df = reg[name].fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        return time.time() - t0

    # untimed global warm-up: JVM, noop sink classes, parquet footers
    execute("a1_groupby_sum")

    times: dict[str, float] = {}
    cold: dict[str, float] = {}
    for name in sorted(reg):
        try:
            cold[name] = round(execute(name), 3)  # untimed per-query warm-up (codegen)
            times[name] = round(execute(name), 3)  # timed warm run
        except Exception as e:  # a failing query must not hide the rest
            times[name] = -1.0
            print(f"# bench error {name}: {e}", file=sys.stderr)

    total = round(sum(t for t in times.values() if t >= 0), 3)

    # Full per-query detail goes to a FILE (132 entries overran the driver's
    # stdout-capture window in round 1 -> "parsed": null); the stdout JSON
    # line stays compact: totals, per-family rollups, and the slowest tail.
    detail = {
        "metric": "total_query_sec",
        "value": total,
        "unit": "sec",
        "queries": times,
        "cold_queries": cold,
        "cold_total_sec": round(sum(t for t in cold.values() if t >= 0), 3),
        "sf": sf,
        "env": env,
    }
    detail_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json")
    with open(detail_path, "w") as f:
        json.dump(detail, f, indent=1, sort_keys=True)

    import re
    from statistics import median

    families: dict[str, list[float]] = {}
    for name, t in times.items():
        if t < 0:
            continue
        fam = re.match(r"[a-z]+", name).group(0)
        families.setdefault(fam, []).append(t)
    fam_stats = {
        f"{fam}_total": round(sum(ts), 2) for fam, ts in sorted(families.items())
    }
    fam_stats.update(
        {f"{fam}_median": round(median(ts), 3) for fam, ts in sorted(families.items())}
    )
    slowest = dict(
        sorted(
            ((n, t) for n, t in times.items() if t >= 0),
            key=lambda kv: -kv[1],
        )[:10]
    )
    print(
        json.dumps(
            {
                "metric": "total_query_sec",
                "value": total,
                "unit": "sec",
                "queries": slowest,
                "n_queries": len(times),
                "n_errors": sum(1 for t in times.values() if t < 0),
                "families": fam_stats,
                "detail_file": "BENCH_DETAIL.json",
                "sf": sf,
                "env": env,
            }
        )
    )


if __name__ == "__main__":
    main()
