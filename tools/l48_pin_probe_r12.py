#!/usr/bin/env python
"""Round-12 pin of l48_ppl_buckets' 6.23 s r11 driver artifact (VERDICT
r11 item #2).

l48 was the one >2x driver-to-driver mover of round 11 (1.99 s r10 ->
6.23 s r11) with ZERO code change (no commit touches it; PLAN_AUDIT
identical).  The st16/l4 precedent demands a same-window interleaved
A/B before calling it band: l48 is interleaved with two stable
neighbor rows — l34_unigram_logprob (the SAME token->freq->logprob
pipeline without the tercile cut: if l48's grouped_rank fan-out were
the regression, l48 would move and l34 would not) and l47_nearest
_centroid (a different table entirely — moves only with the host).
One process, each query warmed once untimed, then timed 3x in
interleaved rotation; medians + raw triples reported.

Usage: python tools/l48_pin_probe_r12.py [SF_DIR]
"""

from __future__ import annotations

import json
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"


def main() -> None:
    from google_analytics_dataframes_spark.registry import registry
    from google_analytics_dataframes_spark.session import get_spark

    spark = get_spark(app_name="l48_pin_probe_r12")
    reg = registry()
    names = ["l48_ppl_buckets", "l34_unigram_logprob", "l47_nearest_centroid"]

    rows_seen: dict = {}
    times: dict = {n: [] for n in names}
    for n in names:  # untimed warm-up (codegen + page cache)
        rows_seen[n] = reg[n].fn(spark, SF_DIR).count()
    for _ in range(3):
        for n in names:
            t0 = time.time()
            c = reg[n].fn(spark, SF_DIR).count()
            times[n].append(round(time.time() - t0, 2))
            assert c == rows_seen[n], (n, c, rows_seen[n])
    out = {
        "sf_dir": SF_DIR,
        **{
            n: {
                "rows": rows_seen[n],
                "median": statistics.median(ts),
                "runs": ts,
            }
            for n, ts in times.items()
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
