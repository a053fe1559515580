#!/usr/bin/env python
"""Stream-layer probe (VERDICT r7 item #4, finishing VERDICT r6 item #7):
isolated measurements of the REAL streaming queries with the staged-fixture
write SPLIT OUT from the stream execution — the st14-style treatment,
extended to st9/st15 (and st10/st13 for the round-7 regression questions).

Why the split matters: each streaming query reads a staged source directory
(fixture scaffolding standing in for an existing bus/landing zone).  The
staging parquet write is cached per (session, dataset-fingerprint), so in
the driver bench the FIRST stream of a family pays it and the rest don't —
attributing it to whichever query runs first.  This probe times the staging
call alone (cache-cold), then medians 3 stream executions with staging
cached, so BASELINE.md's stream-layer table can report fixed-cost staging
and true stream cost separately.

Protocol: per (point, query): cold staging timed once; one untimed stream
warm-up; median of 3 timed stream runs through the noop sink.  Points:
sf0.1 and the Caesar-synth 10x (scaling_probe.build_synth — documents,
events, lineitem).

Usage: python tools/stream_probe.py [--skip-synth] [--queries st9,st15,...]
"""

from __future__ import annotations

import json
import os
import sys
import time
from statistics import median

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

#: query -> (staging fn name, staging kwargs) — resolved lazily against
#: queries.streaming_batch so the probe times EXACTLY the helper the query
#: calls (cache-keyed identically).
STAGERS = {
    "st9_stream_interval_join": ("_stage_stream_dir", {"ordered": True}),
    "st10_stream_static_enrich": ("_stage_stream_dir", {"ordered": False}),
    "st13_stream_windowed_agg": ("_stage_stream_dir", {"ordered": False}),
    # st14 stages via the FLUSH variant (ordered base + sentinel writes);
    # mapping it to the bare ordered stager timed the wrong helper and
    # pushed the sentinel cost into the untimed warm-up (code-review
    # finding, round 8)
    "st14_stream_sessionize": ("_stage_stream_dir_with_flush", {}),
    "st15_stream_content_dedup": ("_stage_doc_stream", {}),
    # round-8 additions: the outer join stages the 3-sentinel flush
    # variant; the restart query stages its two phase files
    "st16_stream_outer_join": ("_stage_stream_dir_with_flush", {"n_sentinels": 3}),
    "st17_stream_restart_resume": ("_stage_restart_phases", {}),
    # round-9 additions: the two TWS rows (typed-state census, timer
    # sessionization) so the stream-layer table carries their
    # staging-split numbers like the rest of the family
    "st18_stream_typed_state": ("_stage_stream_dir", {"ordered": False}),
    "st19_stream_timer_sessions": ("_stage_stream_dir_with_flush", {"n_sentinels": 3}),
}


def main() -> None:
    skip_synth = "--skip-synth" in sys.argv
    qarg = next(
        (a.split("=", 1)[1] for a in sys.argv if a.startswith("--queries=")),
        None,
    )
    wanted = qarg.split(",") if qarg else ["st9", "st10", "st13", "st14", "st15", "st16", "st17"]

    from google_analytics_dataframes_spark.queries import streaming_batch as SB
    from google_analytics_dataframes_spark.registry import registry
    from google_analytics_dataframes_spark.session import get_spark

    spark = get_spark(app_name="stream_probe")
    spark.sparkContext.setLogLevel("ERROR")
    reg = registry()
    queries = [
        n for n in STAGERS if any(n.startswith(p) for p in wanted)
    ]

    points: list[tuple[str, str]] = [("sf0.1", "/root/testdata/sf0.1")]
    if not skip_synth:
        from scaling_probe import build_synth

        points.append(("synth-sf1", build_synth(spark, "/root/testdata/sf0.1")))

    def run(name: str, sf_dir: str) -> float:
        t0 = time.time()
        reg[name].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        return time.time() - t0

    out: dict[str, dict] = {}
    for label, sf_dir in points:
        for name in queries:
            helper, kwargs = STAGERS[name]
            fn = getattr(SB, helper)
            t0 = time.time()
            fn(spark, sf_dir, **kwargs)  # cache-cold on first touch per point
            staging = time.time() - t0
            run(name, sf_dir)  # untimed warm-up (codegen; staging cached)
            stream = median(run(name, sf_dir) for _ in range(3))
            out.setdefault(name, {})[label] = {
                "staging_sec": round(staging, 2),
                "stream_sec": round(stream, 2),
            }
            print(
                f"# {label} {name}: staging={staging:.2f}s "
                f"stream={stream:.2f}s",
                file=sys.stderr,
            )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
