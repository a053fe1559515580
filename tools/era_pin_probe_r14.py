#!/usr/bin/env python
"""Round-14 pin of the residual 10x "era drift" vs r11 (VERDICT r13
item #1 — the last post-hoc band argument in the record).

BASELINE.md Addendum 2 attributes the uniform 10x drift vs the r11
detail (1.38x median at the first r13 point, 1.20x at the final 490.6 s
quiet point, no outlier beyond ~2x, plans unchanged) to the measurement
ERA — host memory/IO throughput shifting between rounds — rather than
to any code change.  The claim is plausible (no code touches all ~230
common rows, suite state was found/fixed/measured separately in r13)
but it rested on inference.  The r13 codec pin proved the decisive
protocol is cheap: run the SAME queries through the OLD code and the
NEW code in the same window via a git worktree, and the code-vs-era
question answers itself:

* old code ~= HEAD today on the movers  -> the r11 numbers came from a
  faster era; drift confirmed era-level (code acquitted).
* old code measurably faster than HEAD  -> a code regression isolated;
  the era story is falsified for that mover and it gets fixed.

Design (alternating fresh subprocesses, the TWS-floor A/B protocol):

* **sides** — HEAD (/root/repo) and a detached worktree at 8557a7a,
  the r11 final bench HEAD ("Final r11 snapshot ... 179.4 s / 287").
* **movers** — the top common-row 10x movers vs the r11 detail at the
  final r13 quiet point (BENCH_SF1_DETAIL vs 6de53d3's):
  l7_string_simjoin (1.27x), l35_dup_ngram_fraction (1.34x),
  l43_random_projection (1.33x), l80_keeper_election (1.20x), plus
  l61_exact_substr_spans (0.93x — named by the verdict; anchors the
  already-back case).
* **controls** — rb26_flow_reachability (0.96x) and h21_waiting_orders
  (0.99x): mid-weight rows that did NOT drift; if a window shift hits
  mid-probe they move on both sides together.
* **hygiene on BOTH sides** (the r13 requirement): the child builds the
  SparkSession itself with spark.cleaner.periodicGC.interval=1min and
  the same static confs HEAD's session factory uses, BEFORE importing
  the side's get_spark (whose getOrCreate then reuses it) — the r11
  worktree's factory predates the conf.  gc.collect() after every
  execution on both sides, outside the timed window.
* **schedule** — ROUNDS alternating child processes H,O,H,O,H,O (3 per
  side), each child warming every query once untimed then timing each
  once, at the 10x synth (/tmp/spark_graft_synth_sf1, built by
  tools/scaling_probe.py).  Per-side medians + raw triples + loadavg
  snapshots reported; the parent interleaving bounds window drift to
  one child's duration (~2 min).

Usage:
    python tools/era_pin_probe_r14.py            # parent (orchestrates)
    python tools/era_pin_probe_r14.py --child REPO OUT.json   # internal
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

R11_SHA = "8557a7a"
WORKTREE = "/tmp/era_pin_r11"
SYNTH = "/tmp/spark_graft_synth_sf1"
MOVERS = [
    "l61_exact_substr_spans",
    "l7_string_simjoin",
    "l35_dup_ngram_fraction",
    "l43_random_projection",
    "l80_keeper_election",
]
CONTROLS = ["rb26_flow_reachability", "h21_waiting_orders"]
NAMES = MOVERS + CONTROLS
ROUNDS = 3


def loadavg() -> list[float] | None:
    try:
        with open("/proc/loadavg") as f:
            return [float(x) for x in f.read().split()[:3]]
    except Exception:
        return None


def child(repo: str, out_path: str) -> None:
    """One fresh-JVM pass over NAMES at the 10x synth using REPO's code."""
    import gc
    import time

    # isolate the side's package: REPO first, the OTHER checkout purged
    others = {"/root/repo", WORKTREE} - {repo}
    sys.path = [repo] + [
        p for p in sys.path if p != repo and p.rstrip("/") not in others
    ]
    load_before = loadavg()

    # Hygiene first (r13 session finding), identically on both sides:
    # build the session with HEAD's static confs + periodicGC BEFORE the
    # side's get_spark runs — its builder.getOrCreate() then reuses this
    # context, so the r11 worktree (whose factory predates the conf)
    # runs under the same cleaner posture as HEAD.
    from pyspark.sql import SparkSession

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.appName("era_pin_probe_r14")
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.cleaner.periodicGC.interval", "1min")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from google_analytics_dataframes_spark.registry import registry
    from google_analytics_dataframes_spark.session import configure

    configure(spark)
    reg = registry()

    def execute(n: str) -> float:
        t0 = time.time()
        reg[n].fn(spark, SYNTH).write.format("noop").mode("overwrite").save()
        return time.time() - t0

    missing = [n for n in NAMES if n not in reg]
    for n in NAMES:  # untimed warm-up (codegen, parquet footers, any
        if n in reg:  # per-process index/stats builds)
            execute(n)
            gc.collect()
    times: dict[str, float] = {}
    for n in NAMES:
        if n in reg:
            times[n] = round(execute(n), 2)
            gc.collect()
    out = {
        "repo": repo,
        "times": times,
        "missing": missing,
        "load_before": load_before,
        "load_after": loadavg(),
    }
    with open(out_path, "w") as f:
        json.dump(out, f)
    spark.stop()


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        child(sys.argv[2], sys.argv[3])
        return

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if not os.path.isdir(os.path.join(WORKTREE, ".git")) and not os.path.isfile(
        os.path.join(WORKTREE, ".git")
    ):
        subprocess.run(
            ["git", "worktree", "add", "--detach", WORKTREE, R11_SHA],
            cwd=repo,
            check=True,
        )
    sides = {"head": repo, "r11": WORKTREE}
    runs: dict[str, list[dict]] = {s: [] for s in sides}
    sched = [("head", "r11")[i % 2] for i in range(2 * ROUNDS)]
    for i, side in enumerate(sched):
        out_path = f"/tmp/era_pin_{side}_{i}.json"
        print(f"# pass {i + 1}/{len(sched)}: {side}", file=sys.stderr)
        subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child",
             sides[side], out_path],
            cwd=sides[side],
            check=True,
        )
        with open(out_path) as f:
            runs[side].append(json.load(f))
    summary: dict[str, dict] = {}
    for n in NAMES:
        per = {}
        for side in sides:
            ts = [r["times"][n] for r in runs[side] if n in r["times"]]
            per[side] = {
                "median": statistics.median(ts) if ts else None,
                "runs": ts,
            }
        if per["head"]["median"] and per["r11"]["median"]:
            per["head_over_r11"] = round(
                per["head"]["median"] / per["r11"]["median"], 2
            )
        summary[n] = per
    print(
        json.dumps(
            {
                "synth": SYNTH,
                "r11_sha": R11_SHA,
                "movers": MOVERS,
                "controls": CONTROLS,
                "rounds": ROUNDS,
                "loads": {
                    s: [(r["load_before"], r["load_after"]) for r in runs[s]]
                    for s in sides
                },
                "summary": summary,
            }
        )
    )


if __name__ == "__main__":
    main()
