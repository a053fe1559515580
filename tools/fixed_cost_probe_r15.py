#!/usr/bin/env python
"""Round-15 fixed-per-query-cost profiler (VERDICT r14 item #2).

The r14 bench shows ~250 sub-second rows at ~0.3-0.4 s each — most of the
suite total is now per-query FIXED cost, not data work.  This probe breaks
one execution of a query into the phases the bench's `execute()` pays:

  build    — reg[name].fn(spark, sf_dir): Python/py4j expression-tree
             construction (+ any build-time probe jobs the query runs)
  analyze  — force analysis of the built plan (jdf.queryExecution().analyzed)
  optimize — force the optimized logical plan
  physical — force physical planning (executedPlan; AQE wrapper, no jobs)
  execute  — noop write (job scheduling + task run + AQE re-planning)

plus two synthetic floors, timed the same way:

  floor_range1   — spark.range(1) noop write (cheapest possible action)
  floor_shuffle  — spark.range(1000).groupBy(id%7).count() noop write
                   (cheapest 1-exchange AQE plan)

Usage:
    python tools/fixed_cost_probe_r15.py a1 f1 w1 --reps 5
    python tools/fixed_cost_probe_r15.py --families   # one cheap row per family
"""

from __future__ import annotations

import argparse
import gc
import json
import sys
import time
from statistics import median

sys.path.insert(0, "/root/repo")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("patterns", nargs="*")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from google_analytics_dataframes_spark.registry import registry
    from google_analytics_dataframes_spark.session import get_spark

    spark = get_spark(app_name="fixed-cost-probe-r15")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    reg = registry()
    names = [
        n for n in sorted(reg) if any(n.startswith(p) for p in args.patterns)
    ]
    if not names:
        print(f"no queries match {args.patterns}", file=sys.stderr)
        sys.exit(1)

    def timed(fn):
        t0 = time.time()
        r = fn()
        return time.time() - t0, r

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    # floors
    floors = {}
    for fname, fdf in (
        ("floor_range1", lambda: spark.range(1)),
        (
            "floor_shuffle",
            lambda: spark.range(1000)
            .groupBy((F.col("id") % 7).alias("k"))
            .count(),
        ),
    ):
        try:
            noop(fdf())  # warm
            reps = []
            for _ in range(args.reps):
                t, _r = timed(lambda: noop(fdf()))
                reps.append(round(t, 4))
            floors[fname] = {"reps": reps, "median": round(median(reps), 4)}
        except Exception as e:
            floors[fname] = {"error": str(e)[:200]}

    results = {}
    for name in names:
        sc.setJobDescription(f"fixed-cost {name}")
        try:
            # untimed full warm-up (codegen, footers, staging)
            df0 = reg[name].fn(spark, args.sf)
            noop(df0)
            gc.collect()
            phases = {k: [] for k in ("build", "analyze", "optimize", "physical", "execute", "total")}
            for _ in range(args.reps):
                t0 = time.time()
                tb, df = timed(lambda: reg[name].fn(spark, args.sf))
                qe = df._jdf.queryExecution()
                ta, _ = timed(qe.analyzed)
                to, _ = timed(qe.optimizedPlan)
                tp, _ = timed(qe.executedPlan)
                te, _ = timed(lambda: noop(df))
                phases["build"].append(round(tb, 4))
                phases["analyze"].append(round(ta, 4))
                phases["optimize"].append(round(to, 4))
                phases["physical"].append(round(tp, 4))
                phases["execute"].append(round(te, 4))
                phases["total"].append(round(time.time() - t0, 4))
                gc.collect()
            results[name] = {
                k: {"reps": v, "median": round(median(v), 4)}
                for k, v in phases.items()
            }
            m = {k: results[name][k]["median"] for k in phases}
            print(
                f"{name:32s} build={m['build']:.3f} analyze={m['analyze']:.3f} "
                f"opt={m['optimize']:.3f} phys={m['physical']:.3f} "
                f"exec={m['execute']:.3f} total={m['total']:.3f}"
            )
        except Exception as e:
            results[name] = {"error": str(e)[:200]}
            print(f"{name:32s} ERROR {e}", file=sys.stderr)
        finally:
            sc.setJobDescription(None)
    out = {"sf": args.sf, "reps": args.reps, "floors": floors, "results": results}
    print(json.dumps({"floors": floors}))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1, sort_keys=True)


if __name__ == "__main__":
    main()
