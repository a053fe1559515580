#!/usr/bin/env python
"""In-suite vs isolated variance attribution (VERDICT r6 item #5).

The round-6 full-registry bench at synth-sf1 measured l61_exact_substr_spans
at 54.7 s IN-SUITE vs 18.1 s in its isolated probe (3x), and
s8_clustered_write at 16.3x its sf0.1 time.  Suspected cause: session
debris — block-manager blocks from localCheckpoint materializations,
lingering cached relations, and the JVM GC pressure they induce — left
behind by the ~90 queries that precede l61 in bench.py's sorted execution
order.  This probe MEASURES that attribution instead of shrugging:

  A  isolated        fresh session, warm + median-of-3 (the baseline)
  B  debris          execute the heavy suite predecessors (suite order)
  C  contaminated    l61 median-of-3 in the dirtied session
  D  swept           spark.catalog.clearCache() + ContextCleaner nudge
                     (System.gc()) , then l61 median-of-3
  E  recycled        spark.stop(), brand-new session, l61 median-of-3

If C >> A and E ~= A, the variance is session debris, not a plan effect;
if D ~= A the cheap sweep suffices and bench.py can run it per family
instead of recycling the JVM.  Results feed the BASELINE.md variance
section.

MEASURED (round 7, synth-sf1, l61): the debris hypothesis is REFUTED —
A_isolated 36.5 s, C_contaminated 17.7 s, D_swept 16.1 s, E_recycled
17.9 s.  Post-warm l61 runs ~17 s REGARDLESS of 170 s of heavy debris,
and the slow number is the FIRST measurement in a fresh JVM (A includes
C2-compilation of Spark's join/sort internals and cold page cache; E
reuses the warm JVM even after spark.stop(), so it stays fast).  No
sweep/recycle mode was added to bench.py — there is nothing to sweep;
see BASELINE.md "In-suite variance attribution" for the full table.

Usage: python tools/variance_probe.py [--target l61_exact_substr_spans]
         [--sf-dir /tmp/spark_graft_synth_sf1]
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time
from statistics import median

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Heavy suite predecessors of l61 (sorted bench order), by round-6
# BENCH_SF1_DETAIL.json time: the debris generators.  Each runs twice
# (bench.py's warm-up + timed pattern) to deposit the same block/GC state.
DEBRIS = [
    "a4_approx_distinct",
    "j4_left_outer",
    "j5_right_outer",
    "j13_multikey",
    "l7_string_simjoin",  # suite-orders AFTER l61, but shares the pair
    # materialization layer with l12/l29/l33 which run BEFORE it
    "l13_embed_neardup",
    "l35_dup_ngram_fraction",
    "l60_incremental_neardup",
]


def _flag(name: str, default: str) -> str:
    if name in sys.argv:
        return sys.argv[sys.argv.index(name) + 1]
    return default


def main() -> None:
    target = _flag("--target", "l61_exact_substr_spans")
    sf_dir = _flag("--sf-dir", "/tmp/spark_graft_synth_sf1")

    from google_analytics_dataframes_spark.registry import registry
    from google_analytics_dataframes_spark.session import get_spark

    reg = registry()

    def fresh_session():
        from pyspark.sql import SparkSession

        active = SparkSession.getActiveSession()
        if active is not None:
            active.stop()
        # get_spark re-applies every conf on the fresh builder, so no
        # builder-state reset is needed after stop() (a previous revision
        # carried a self-copy no-op here that claimed otherwise; ADVICE r7)
        spark = get_spark(app_name="variance_probe")
        spark.sparkContext.setLogLevel("ERROR")
        return spark

    def run(spark, name: str) -> float:
        t0 = time.time()
        reg[name].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        return time.time() - t0

    def timed(spark, name: str, warm: bool = True) -> float:
        if warm:
            run(spark, name)
        return round(median(run(spark, name) for _ in range(3)), 2)

    out: dict[str, object] = {"target": target, "sf_dir": sf_dir}

    spark = fresh_session()
    out["A_isolated"] = timed(spark, target)
    print(f"# A isolated: {out['A_isolated']}s", file=sys.stderr)

    t0 = time.time()
    for q in DEBRIS:
        for _ in range(2):  # warm-up + timed, like the suite
            run(spark, q)
        print(f"# debris {q} done", file=sys.stderr)
    out["B_debris_sec"] = round(time.time() - t0, 1)

    out["C_contaminated"] = timed(spark, target, warm=False)
    print(f"# C contaminated: {out['C_contaminated']}s", file=sys.stderr)

    # the sweep bench.py can afford per family: drop cached relations,
    # release Python-side DataFrame refs, nudge the ContextCleaner (it
    # frees localCheckpoint blocks only after their RDDs are GC'd)
    spark.catalog.clearCache()
    gc.collect()
    for _ in range(3):
        spark.sparkContext._jvm.System.gc()
        time.sleep(0.5)
    out["D_swept"] = timed(spark, target, warm=False)
    print(f"# D swept: {out['D_swept']}s", file=sys.stderr)

    spark = fresh_session()
    out["E_recycled"] = timed(spark, target)
    print(f"# E recycled: {out['E_recycled']}s", file=sys.stderr)

    a = float(out["A_isolated"])  # type: ignore[arg-type]
    out["contamination_x"] = round(float(out["C_contaminated"]) / a, 2)  # type: ignore[arg-type]
    out["sweep_recovers_x"] = round(float(out["D_swept"]) / a, 2)  # type: ignore[arg-type]
    out["recycle_recovers_x"] = round(float(out["E_recycled"]) / a, 2)  # type: ignore[arg-type]
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
