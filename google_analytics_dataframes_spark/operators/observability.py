"""Single-pass pipeline audit counters via ``DataFrame.observe``.

A 100 TB filtering pipeline must account for every dropped row — quality
gates, language slices, dedup keeps — but a second ``count()`` per stage
re-runs the whole scan chain, and caching the intermediate to count it
holds corpus-scale data hostage for a metadata-sized answer.  Spark's
observation API is the engine-native fix: named aggregate expressions are
evaluated AS THE ROWS FLOW THROUGH the already-running action
(accumulator-backed, exactly-once per action for deterministic
aggregates), so stage-level row accounting costs zero extra scans at any
corpus size.

These helpers wrap it into the two shapes a training-data pipeline needs:

* :func:`audited_stage` — attach arbitrary named metrics at a plan point.
* :func:`audited_filter` — the drop-accounting idiom: rows in, rows out,
  and the per-reason drop count for a filter stage, all riding the one
  pass.

The observed values are READ AFTER the first action on the returned
DataFrame (``Observation.get`` blocks until then); attach fresh
observations per action — Spark evaluates an Observation only for the
first action that touches its plan point.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F


def audited_stage(
    df: DataFrame, name: str, *metrics: Column
) -> tuple[DataFrame, Observation]:
    """Attach named single-pass metrics at this plan point.

    ``metrics`` are aggregate expressions (each MUST carry ``.alias``);
    they are computed over exactly the rows that flow through this point
    during the next action on the returned DataFrame.
    """
    obs = Observation(name)
    return df.observe(obs, *metrics), obs


def audited_filter(
    df: DataFrame, cond: Column, name: str
) -> tuple[DataFrame, Observation]:
    """Filter with built-in drop accounting — one observation at the
    PRE-filter plan point counting rows in / rows kept / rows dropped,
    so ``obs.get`` answers "what did this gate cost us" without any
    second action.

    The conditional-sum form (rather than observing before AND after)
    keeps the whole audit in one Observation, which matters because each
    Observation is bound to one plan point and one action.
    """
    keep = F.sum(cond.cast("long")).alias("rows_kept")
    obs = Observation(name)
    audited = df.observe(
        obs,
        F.count(F.lit(1)).alias("rows_in"),
        keep,
        (F.count(F.lit(1)) - F.sum(cond.cast("long"))).alias("rows_dropped"),
    )
    return audited.filter(cond), obs
