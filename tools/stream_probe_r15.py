#!/usr/bin/env python
"""Round-15 streaming probe (VERDICT r14 item #1): per-microbatch cost
breakdown + config A/B for the st family.

A StreamingQueryListener captures every progress event while the REGISTERED
query (staging + availableNow run + finalization fold) executes through the
bench's own noop-sink methodology, so we see exactly where each microbatch
spends: getBatch / queryPlanning / addBatch / walCommit / commitOffsets /
stateOperators commit times.

Config A/B: ``--conf k=v`` pairs are applied to the SESSION before the runs
and restored after, so a candidate lever (e.g. RocksDB changelog
checkpointing) is measured same-window against the default.

    python tools/stream_probe_r15.py st18 st19 --reps 3
    python tools/stream_probe_r15.py st18 --conf \
        spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled=true
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
    ap.add_argument("patterns", nargs="+")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--conf", action="append", default=[])
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    def loadavg():
        try:
            with open("/proc/loadavg") as f:
                return [float(x) for x in f.read().split()[:3]]
        except Exception:
            return None

    load_before = loadavg()

    from pyspark.sql.streaming import StreamingQueryListener

    from google_analytics_dataframes_spark.registry import registry
    from google_analytics_dataframes_spark.session import get_spark

    spark = get_spark(app_name="stream-probe-r15")
    spark.sparkContext.setLogLevel("ERROR")
    reg = registry()
    names = [
        n for n in sorted(reg) if any(n.startswith(p) for p in args.patterns)
    ]
    if not names:
        print(f"no queries match {args.patterns}", file=sys.stderr)
        sys.exit(1)

    overrides = {}
    for kv in args.conf:
        k, _, v = kv.partition("=")
        try:
            overrides[k] = spark.conf.get(k, None)
        except Exception:
            overrides[k] = None
        spark.conf.set(k, v)

    progress_log: list[dict] = []

    class Capture(StreamingQueryListener):
        def onQueryStarted(self, event):
            pass

        def onQueryProgress(self, event):
            try:
                progress_log.append(json.loads(event.progress.json))
            except Exception:
                pass

        def onQueryIdle(self, event):
            pass

        def onQueryTerminated(self, event):
            pass

    listener = Capture()
    spark.streams.addListener(listener)

    def execute(name):
        df = reg[name].fn(spark, args.sf)
        df.write.format("noop").mode("overwrite").save()

    results = {}
    try:
        for name in names:
            try:
                execute(name)  # untimed warm-up (staging, codegen)
                gc.collect()
                reps = []
                batches = None
                for r in range(args.reps):
                    progress_log.clear()
                    t0 = time.time()
                    execute(name)
                    reps.append(round(time.time() - t0, 3))
                    # summarize the LAST rep's batches
                    batches = [
                        {
                            "batchId": p.get("batchId"),
                            "numInputRows": p.get("numInputRows"),
                            "durationMs": p.get("durationMs"),
                            "stateRows": [
                                {
                                    "numRowsTotal": so.get("numRowsTotal"),
                                    "commitTimeMs": so.get("commitTimeMs"),
                                    "numShufflePartitions": so.get(
                                        "numShufflePartitions"
                                    ),
                                }
                                for so in (p.get("stateOperators") or [])
                            ],
                        }
                        for p in progress_log
                    ]
                    gc.collect()
                results[name] = {
                    "reps": reps,
                    "median": round(median(reps), 3),
                    "last_rep_batches": batches,
                }
                print(f"{name:32s} reps={reps} median={median(reps):6.3f}")
                for b in batches or []:
                    d = b["durationMs"] or {}
                    print(
                        f"    batch {b['batchId']}: rows={b['numInputRows']}"
                        f" trigger={d.get('triggerExecution')}ms"
                        f" addBatch={d.get('addBatch')}ms"
                        f" getBatch={d.get('getBatch')}ms"
                        f" plan={d.get('queryPlanning')}ms"
                        f" wal={d.get('walCommit')}ms"
                        f" offs={d.get('commitOffsets')}ms"
                        f" stateCommit={[s['commitTimeMs'] for s in b['stateRows']]}"
                    )
            except Exception as e:
                results[name] = {"error": str(e)[:300]}
                print(f"{name:32s} ERROR {e}", file=sys.stderr)
    finally:
        spark.streams.removeListener(listener)
        for k, old in overrides.items():
            if old is None:
                try:
                    spark.conf.unset(k)
                except Exception:
                    pass
            else:
                spark.conf.set(k, old)

    out = {
        "sf": args.sf,
        "reps": args.reps,
        "conf": args.conf,
        "load_before": load_before,
        "load_after": loadavg(),
        "results": results,
    }
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1, sort_keys=True)


if __name__ == "__main__":
    main()
