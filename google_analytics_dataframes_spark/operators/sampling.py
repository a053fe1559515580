"""Corpus sampling operators (training-data curation; north star
BASELINE.json:6).

Two tiers:

* :func:`weighted_sample` — deterministic mixture sampling: each slice
  (e.g. `source`) gets a keep-rate; membership is decided by a salted md5
  bucket of the row key, NOT an RNG.  Properties that matter in a 100 TB
  pipeline: reproducible across runs/engines/partitionings, stable under
  re-sharding and appends (a doc's fate never changes), and tunable per
  slice by editing one weight map.  Pure projection+filter — no shuffle,
  no sampling state, fully pushdown-friendly.
* :func:`stratified_sample` — Spark's native `sampleBy` (per-stratum
  Bernoulli with seed).  Faster to type, but engine-RNG-specific, so it is
  the R-tier surface; use weighted_sample when cross-run determinism is
  required.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Column
from pyspark.sql import functions as F


def sample_bucket(key: Column | str, salt: str) -> Column:
    """Deterministic bucket in [0, 100): first 16 bits of md5(salt||key).
    Distinct salts give independent buckets — the split hash
    (operators/text.py hash_split) and mixture hash must not correlate."""
    key = F.col(key) if isinstance(key, str) else key
    return (
        F.conv(F.substring(F.md5(F.concat(F.lit(salt), key.cast("string"))), 1, 4), 16, 10)
        .cast("long")
        % 100
    )


def weighted_sample(
    df: DataFrame,
    slice_col: str,
    weights: dict[str, float],
    default_weight: float,
    key_col: str,
    salt: str = "mix1",
) -> DataFrame:
    """Keep each row iff its bucket < 100*weight(slice).  Weight 1.0 keeps
    everything, 0.0 drops the slice."""
    rate = F.lit(int(round(default_weight * 100)))
    for value, w in sorted(weights.items()):
        rate = F.when(F.col(slice_col) == value, int(round(w * 100))).otherwise(rate)
    return df.filter(sample_bucket(key_col, salt) < rate)


def stratified_sample(
    df: DataFrame,
    slice_col: str,
    fractions: dict[str, float],
    seed: int = 42,
) -> DataFrame:
    """Native seeded per-stratum Bernoulli sampling (engine-specific RNG)."""
    return df.sampleBy(slice_col, fractions, seed=seed)
