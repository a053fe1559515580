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
    ap.add_argument(
        "--ab",
        action="store_true",
        help="interleave reps: alternate base conf / --conf per rep inside "
        "one process so ambient waves hit both arms equally",
    )
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

    conf_pairs = []
    overrides = {}
    for kv in args.conf:
        k, _, v = kv.partition("=")
        try:
            overrides[k] = spark.conf.get(k, None)
        except Exception:
            overrides[k] = None
        conf_pairs.append((k, v))

    def apply_confs():
        for k, v in conf_pairs:
            spark.conf.set(k, v)

    def restore_confs():
        for k, old in overrides.items():
            if old is None:
                try:
                    spark.conf.unset(k)
                except Exception:
                    pass
            else:
                spark.conf.set(k, old)

    if not args.ab:
        apply_confs()

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
                reps_base, reps_conf = [], []
                batches = None
                n_reps = args.reps * 2 if args.ab else args.reps
                for r in range(n_reps):
                    if args.ab:
                        if r % 2 == 0:
                            restore_confs()
                        else:
                            apply_confs()
                    progress_log.clear()
                    t0 = time.time()
                    execute(name)
                    dt = round(time.time() - t0, 3)
                    if args.ab:
                        (reps_base if r % 2 == 0 else reps_conf).append(dt)
                    reps.append(dt)
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
                if args.ab:
                    results[name]["ab"] = {
                        "base_reps": reps_base,
                        "conf_reps": reps_conf,
                        "base_median": round(median(reps_base), 3),
                        "conf_median": round(median(reps_conf), 3),
                    }
                    print(
                        f"{name:32s} base={reps_base} med={median(reps_base):6.3f}"
                        f" | conf={reps_conf} med={median(reps_conf):6.3f}"
                    )
                else:
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
        restore_confs()

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
