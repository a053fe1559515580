#!/usr/bin/env python
"""Round-14 optimization probe (guide §1): isolated per-query timing via the
noop sink + formatted-plan capture.

For each named query: build the DataFrame, optionally dump
``explain("formatted")`` to ``plans/r15/<name>_<tag>.txt``, run ONE untimed
warm-up execution (codegen, footers), then ``--reps`` timed noop executions;
report every reading and the median.  gc.collect() between queries mirrors
bench.py's session hygiene so readings are comparable to the bench's warm
numbers.  Jobs are labelled (guide §1.5) so a live UI/eventlog maps stages
to queries.

    python tools/opt_probe_r15.py rb26 l79 h1 --plans before
    python tools/opt_probe_r15.py rb26 --sf /root/testdata/sf0.1 --reps 5
"""

from __future__ import annotations

import argparse
import gc
import json
import os
import sys
import time
from statistics import median

sys.path.insert(0, "/root/repo")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("patterns", nargs="+")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument(
        "--plans",
        default=None,
        metavar="TAG",
        help="dump explain('formatted') to plans/r15/<name>_<TAG>.txt",
    )
    ap.add_argument("--out", default=None, help="also write results JSON here")
    args = ap.parse_args()

    def loadavg():
        try:
            with open("/proc/loadavg") as f:
                return [float(x) for x in f.read().split()[:3]]
        except Exception:
            return None

    load_before = loadavg()

    from google_analytics_dataframes_spark.registry import registry
    from google_analytics_dataframes_spark.session import get_spark

    spark = get_spark(app_name="opt-probe-r15")
    spark.sparkContext.setLogLevel("ERROR")
    reg = registry()
    names = [
        n for n in sorted(reg) if any(n.startswith(p) for p in args.patterns)
    ]
    if not names:
        print(f"no queries match {args.patterns}", file=sys.stderr)
        sys.exit(1)

    plans_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r15")
    if args.plans:
        os.makedirs(plans_dir, exist_ok=True)

    results: dict[str, dict] = {}
    for name in names:
        sc = spark.sparkContext
        try:
            df = reg[name].fn(spark, args.sf)
            if args.plans:
                from google_analytics_dataframes_spark.plans.audit import formatted_plan

                with open(os.path.join(plans_dir, f"{name}_{args.plans}.txt"), "w") as f:
                    f.write(formatted_plan(df))
            sc.setJobDescription(f"opt-probe warmup {name}")
            t0 = time.time()
            df2 = reg[name].fn(spark, args.sf)
            df2.write.format("noop").mode("overwrite").save()
            warm = time.time() - t0
            gc.collect()
            reps = []
            for r in range(args.reps):
                sc.setJobDescription(f"opt-probe {name} rep{r}")
                t0 = time.time()
                dfr = reg[name].fn(spark, args.sf)
                dfr.write.format("noop").mode("overwrite").save()
                reps.append(round(time.time() - t0, 3))
                gc.collect()
            results[name] = {
                "cold": round(warm, 3),
                "reps": reps,
                "median": round(median(reps), 3),
            }
            print(f"{name:32s} cold={warm:6.2f}  reps={reps}  median={median(reps):6.3f}")
        except Exception as e:
            results[name] = {"error": str(e)[:200]}
            print(f"{name:32s} ERROR {e}", file=sys.stderr)
        finally:
            sc.setJobDescription(None)
    out = {
        "sf": args.sf,
        "reps": args.reps,
        "load_before": load_before,
        "load_after": loadavg(),
        "results": results,
    }
    print(json.dumps(out))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1, sort_keys=True)


if __name__ == "__main__":
    main()
