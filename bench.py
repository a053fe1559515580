#!/usr/bin/env python
"""Benchmark harness (BASELINE.md protocol): run every registered query at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS], print ONE JSON line:

    {"metric": "total_query_sec", "value": N, "unit": "sec",
     "queries": {name: sec, ...}, "sf": 0.1}

Timing excludes driver-side result transfer: each plan executes fully via
the `noop` sink (scan + shuffles + aggs run, rows are discarded JVM-side),
which is the honest engine-throughput number.  First query's JVM/codegen
warm-up is amortized with one untimed warm-up pass.
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

    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")
    reg = registry()

    def execute(name: str) -> float:
        t0 = time.time()
        df = reg[name].fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        return time.time() - t0

    # untimed warm-up: JVM, codegen, parquet footers
    execute("a1_groupby_sum")

    times: dict[str, float] = {}
    for name in sorted(reg):
        try:
            times[name] = round(execute(name), 3)
        except Exception as e:  # a failing query must not hide the rest
            times[name] = -1.0
            print(f"# bench error {name}: {e}", file=sys.stderr)

    total = round(sum(t for t in times.values() if t >= 0), 3)
    print(
        json.dumps(
            {
                "metric": "total_query_sec",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
