#!/usr/bin/env python
"""Round-13 pin of the codec rows' post-hardening cost (VERDICT r12
item #2 — the round's one weak row).

l26_multimodal_frames moved 1.40 s (r11) -> 3.93 s (r12 driver
artifact, +180%) in the same round its decode family was hardened
against decompression bombs (7d6136d bounded PNG/TIFF inflation + AVI
strh clearing; 3d91f73 TIFF pad tolerance + PNG zero-dim rejection).
The band explanation is strong (untouched rows moved just as much in
the same window) but the l48 lesson is explicit: pin movers with an
interleaved same-window A/B before calling them band.

Design (the l48 protocol, tools/l48_pin_probe_r12.py as template):

* **treatment rows** — l26_multimodal_frames (runs decode_avi, whose
  strh handling changed) and l64_png_roundtrip (runs decode_png, whose
  inflate bound + zero-dim rejection changed).
* **controls** — l72_gif_roundtrip and l68_wav_roundtrip: same
  mapInPandas multimodal family, same blob tables, decoders NOT
  touched by the r12 hardening.  If the hardening added real cost, the
  treatments sit above their r11 bands while the controls sit inside
  theirs; if the r12 artifact was window noise, all four sit in-band
  together.

One process, each query warmed once untimed, then timed 3x in
interleaved rotation through the same noop sink bench.py uses (so the
numbers compare directly to BENCH artifacts); medians + raw triples +
/proc/loadavg snapshots reported.

Reference points (per-query BENCH_DETAIL history, sf0.1):

* r11 driver artifact (pre-hardening): l26 1.40, l64 0.56, l72 0.60,
  l68 1.00.
* r12 driver artifact (the loaded window under test): l26 3.93,
  l64 1.10, l72 0.73, l68 1.82 — note the CONTROLS moved too.
* builder quiet run at final r12 HEAD (f9544f8, post-hardening):
  l26 1.48, l64 1.17, l72 0.53, l68 2.16 — l26 already in-band there,
  but no dedicated interleaved design existed; this probe is it.

Usage: python tools/codec_pin_probe_r13.py [SF_DIR]
"""

from __future__ import annotations

import json
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"


def loadavg() -> list[float] | None:
    try:
        with open("/proc/loadavg") as f:
            return [float(x) for x in f.read().split()[:3]]
    except Exception:
        return None


def main() -> None:
    load_before = loadavg()

    from google_analytics_dataframes_spark.registry import registry
    from google_analytics_dataframes_spark.session import get_spark

    spark = get_spark(app_name="codec_pin_probe_r13")
    spark.sparkContext.setLogLevel("ERROR")
    reg = registry()
    treatments = ["l26_multimodal_frames", "l64_png_roundtrip"]
    controls = ["l72_gif_roundtrip", "l68_wav_roundtrip"]
    names = [n for pair in zip(treatments, controls) for n in pair]

    def execute(n: str) -> float:
        t0 = time.time()
        reg[n].fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        return time.time() - t0

    for n in names:  # untimed warm-up (codegen + parquet footers)
        execute(n)
    times: dict = {n: [] for n in names}
    for _ in range(3):  # interleaved: treatment/control alternate
        for n in names:
            times[n].append(round(execute(n), 2))
    out = {
        "sf_dir": SF_DIR,
        "load_before": load_before,
        "load_after": loadavg(),
        "treatments": treatments,
        "controls": controls,
        **{
            n: {"median": statistics.median(ts), "runs": ts}
            for n, ts in times.items()
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
