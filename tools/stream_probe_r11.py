#!/usr/bin/env python
"""Round-11 same-window A/B probes (VERDICT r10 items #2 and #3).

Methodology (identical to tools/stream_probe_r10.py): ONE process, ONE
SparkSession, variants interleaved A,B,A,B so ambient-load drift cancels
to first order; each variant warmed once untimed (staging cache +
codegen), then timed 3x; medians + raw triples reported; row parity
between variants asserted on every timed run.

Probes:
  st16  r10 shipped layout (3 sentinels at +2h/+4h/+6h, fpt=3 -> 3
        microbatches over 7 files) vs the r11 layout (1 sentinel at +3h,
        fpt=5 -> ONE data batch + the terminal no-data batch, 5 files).
        The r8 "one sentinel leaves the last lateness window unflushed"
        finding predates the two-rows-per-event-type sentinel fix and no
        longer reproduces; the no-data batch DOES evict outer-join state
        on this engine, and the +3h margin (lateness + 1h) keeps the
        applied watermark strictly past max(ts).
  l4    r10 scalar block kernel (Python loop, one np.lexsort PER ROW of
        each label block) vs the r11 vectorized kernel (ONE stable
        argsort per block after sorting the block by vec_id — the same
        (-cos, neighbor_id) order).  Prices whether l4's 11.9 s at the
        r10 10x point was kernel scaling or ambient band.

Usage: python tools/stream_probe_r11.py [SF_DIR]
"""

from __future__ import annotations

import json
import statistics
import sys
import time
import uuid

sys.path.insert(0, "/root/repo")

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"


def main() -> None:
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F

    from google_analytics_dataframes_spark.io import load_table
    from google_analytics_dataframes_spark.queries.streaming_batch import (
        _few_state_partitions,
        _stage_stream_dir_with_flush,
    )
    from google_analytics_dataframes_spark.session import get_spark
    from google_analytics_dataframes_spark.streaming import jobs

    spark = get_spark(app_name="stream_probe_r11")

    # ---- st16 variant runners (each returns emitted row count) -----------
    def run_st16(n_sentinels, hours, fpt) -> int:
        src = _stage_stream_dir_with_flush(
            spark, SF_DIR, n_sentinels=n_sentinels, sentinel_hours=hours
        )
        stream = jobs.read_event_stream(spark, src, files_per_trigger=fpt)
        with _few_state_partitions(spark):
            out = jobs.run_available_now_parquet(
                jobs.st16_attribution_left_join(stream),
                f"probe16_{uuid.uuid4().hex[:8]}",
            )
        return out.filter(F.col("user_id") >= 0).count()

    # ---- l4 kernels: r10 scalar loop (A) vs shipped vectorized (B) -------
    def knn_blocked_scalar(emb, k=3):
        """Verbatim r10 kernel (pre-commit form), kept here as the A side."""

        def per_block(pdf: pd.DataFrame) -> pd.DataFrame:
            m = np.stack(pdf["embedding"].to_numpy()).astype("float64")
            ids = pdf["vec_id"].to_numpy()
            norms = np.sqrt((m * m).sum(axis=1))
            sims = (m @ m.T) / np.outer(norms, norms)
            np.fill_diagonal(sims, -np.inf)
            out = []
            kk = min(k, len(ids) - 1)
            for i in range(len(ids)):
                order = np.lexsort((ids, -sims[i]))[:kk]
                for rank, j in enumerate(order, start=1):
                    out.append(
                        (
                            int(pdf["label"].iloc[0]),
                            int(ids[i]),
                            int(ids[j]),
                            round(float(sims[i, j]), 4),
                            rank,
                        )
                    )
            return pd.DataFrame(
                out, columns=["label", "vec_id", "neighbor_id", "cos", "rank"]
            )

        return emb.groupBy("label").applyInPandas(
            per_block,
            "label int, vec_id bigint, neighbor_id bigint, cos double, rank int",
        )

    def run_l4(vectorized: bool) -> int:
        from google_analytics_dataframes_spark.operators.similarity import (
            knn_join_blocked,
        )

        emb = load_table(spark, SF_DIR, "embeddings")
        df = knn_join_blocked(emb) if vectorized else knn_blocked_scalar(emb)
        # noop-equivalent action: full materialization without driver
        # transfer beyond the count
        return df.count()

    probes = {
        "st16": {
            "A(3 sentinels, fpt=3, shipped r10)": lambda: run_st16(3, None, 3),
            "B(1 sentinel +3h, fpt=5)": lambda: run_st16(1, (3,), 5),
        },
        "l4": {
            "A(scalar per-row lexsort, r10)": lambda: run_l4(False),
            "B(vectorized argsort, r11)": lambda: run_l4(True),
        },
    }

    results: dict = {"sf_dir": SF_DIR}
    for qname, variants in probes.items():
        rows_seen: dict = {}
        times: dict = {k: [] for k in variants}
        for label, fn in variants.items():  # untimed warm-up per variant
            rows_seen[label] = fn()
        for _ in range(3):  # interleaved timed runs
            for label, fn in variants.items():
                t0 = time.time()
                n = fn()
                times[label].append(round(time.time() - t0, 2))
                assert n == rows_seen[label], (qname, label, n, rows_seen[label])
        labels = list(variants)
        assert rows_seen[labels[0]] == rows_seen[labels[1]], (qname, rows_seen)
        results[qname] = {
            "rows": rows_seen[labels[0]],
            **{
                label: {"median": statistics.median(ts), "runs": ts}
                for label, ts in times.items()
            },
        }
        print(f"## {qname}: {json.dumps(results[qname])}", flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
