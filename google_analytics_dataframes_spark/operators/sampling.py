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


def priority_sample(
    df: DataFrame,
    group_col: str,
    weight_col: str,
    key_col: str,
    k: int,
    salt: str = "ps1:",
    materialize: bool = True,
) -> DataFrame:
    """Weighted sampling WITHOUT replacement, exactly k rows per group —
    Priority Sampling (Duffield-Lund-Thorup, JACM 54(6) 2007).

    The family gap this fills: :func:`weighted_sample` / l49 are Bernoulli
    (keep-rate per row — output size is random), l24 is per-stratum
    uniform; none draws a FIXED-SIZE weighted subset.  Priority sampling
    does, with a near-optimal unbiased subset-sum estimator: each row
    draws u ~ U(0,1], gets priority q = w/u, the k largest per group are
    kept, and the (k+1)-th priority tau turns into the estimator
    w_hat = max(w, tau) (E[sum of w_hat over sample] = sum of w over the
    group; Szegedy STOC'06 proved variance within 1+1/(k-1) of optimal).

    Engine-exact by construction — the decision path uses ONLY IEEE ops
    that are identical on every engine:
    * u = (h+1) / 2^32 with h the first 32 md5 bits of salt||key — the
      numerator is an exact integer, and division by a POWER OF TWO is
      exact (not merely correctly rounded);
    * q = w/u — one correctly-rounded double division, bit-identical
      everywhere;
    * the rank order, tau, and max(w, tau) are comparisons/selections of
      those exact doubles.
    No pow/log (the classical u^(1/w) key formulation) — transcendental
    libm results may differ by an ulp between engines, which near a rank-k
    boundary flips WHICH row is sampled and breaks cross-engine equality.
    q = w/u orders identically to u^(1/w)'s inverse-priority form for
    the estimator's purposes and stays in exact arithmetic.

    Scale shape: the rank <= k+1 filter sits directly on a row_number
    window, which Spark rewrites to WindowGroupLimit — every map task
    keeps at most k+1 rows per group BEFORE the exchange (plan-pinned in
    tests/test_plans.py), so a 100 TB corpus moves O(tasks * groups * k)
    rows, not the corpus.  tau is a groups-sized aggregate broadcast back
    on.  Ties in q are broken by ``key_col`` in both engines; ``key_col``
    must be unique (doc ids are).

    Output: group, key, w, rank (1..k), tau (0.0 when the group has
    <= k rows — then every row is kept and w_hat = w exactly), w_hat.
    """
    from pyspark.sql import Window

    key = F.col(key_col)
    h = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(salt), key.cast("string"))), 1, 8),
            16,
            10,
        ).cast("long")
        + 1
    )
    u = h.cast("double") / F.lit(4294967296.0)
    q = (F.col(weight_col).cast("double") / u).alias("_q")
    rn = F.row_number().over(
        Window.partitionBy(group_col).orderBy(F.desc("_q"), key)
    )
    # Materialize the (groups x (k+1))-bounded frame: both the kept rows
    # and tau derive from it, and an unmaterialized reference would make
    # Catalyst re-expand the whole corpus scan + window twice (observed;
    # same reuse posture as grouped_rank below).  ``materialize=False``
    # exposes the raw single-reference plan for the WindowGroupLimit pin
    # (tests/test_plans.py).
    topk1 = (
        df.select(F.col(group_col), key, F.col(weight_col).cast("double").alias("w"), q)
        .withColumn("_rn", rn)
        .filter(F.col("_rn") <= k + 1)
    )
    if materialize:
        topk1 = topk1.localCheckpoint(eager=True)
    tau = topk1.groupBy(group_col).agg(
        F.coalesce(
            F.max(F.when(F.col("_rn") == k + 1, F.col("_q"))), F.lit(0.0)
        ).alias("tau")
    )
    return (
        topk1.filter(F.col("_rn") <= k)
        .join(F.broadcast(tau), group_col)
        .select(
            group_col,
            key_col,
            "w",
            F.col("_rn").cast("long").alias("rank"),
            "tau",
            F.greatest(F.col("w"), F.col("tau")).alias("w_hat"),
        )
    )


def global_shuffle(
    df: DataFrame, key_col: str, salt: str, docs_per_file: int = 64
) -> DataFrame:
    """Deterministic global shuffle order for training: every row gets a
    dense global position 1..N in md5(salt||key) order, plus the output
    file index `pos div docs_per_file` — the "shuffle then shard" step
    before sequence packing, reproducible across runs/engines/
    partitionings (same salted-hash contract as :func:`sample_bucket`).

    Scale shape — NO partition-less window (a global `row_number() OVER
    (ORDER BY hash)` would sort the corpus on one task):

    1. shard = first 2 hex chars of the hash (256 shards).  Because the
       shard is a PREFIX of the sort key, (shard, hash) order == global
       hash order.
    2. per-shard dense rank: `row_number` partitioned by shard — bounded
       partitions (~N/256), one hash exchange.
    3. shard offsets: per-shard counts (256 rows, cluster-sized not
       data-sized) get their exclusive prefix via a broadcast triangle
       join (same phase-2 as text.sequence_pack), broadcast back on.

    `key_col` values must be unique (ties would make positions ambiguous);
    doc ids are.  Positions are identical to the single-window
    formulation, so an exact ROW_NUMBER SQL oracle holds."""
    from pyspark.sql import Window

    key = F.col(key_col)
    hkey = F.md5(F.concat(F.lit(salt), key.cast("string")))
    keyed = df.select(key, hkey.alias("_hkey"), F.substring(hkey, 1, 2).alias("_shard"))

    counts = keyed.groupBy("_shard").agg(F.count("*").alias("_n"))
    a, b = counts.alias("a"), counts.alias("b")
    offsets = (
        a.join(F.broadcast(b), F.col("b._shard") < F.col("a._shard"), "left")
        .groupBy(F.col("a._shard").alias("_shard"))
        .agg(F.coalesce(F.sum("b._n"), F.lit(0).cast("long")).alias("_offset"))
    )

    rn = F.row_number().over(
        Window.partitionBy("_shard").orderBy("_hkey", key_col)
    )
    pos = (F.col("_offset") + rn).alias("pos")
    return (
        keyed.join(F.broadcast(offsets), "_shard")
        .select(key, pos)
        .select(
            key,
            F.col("pos"),
            F.expr(f"(pos - 1) div {docs_per_file}").alias("out_file"),
        )
    )


def grouped_rank(
    df: DataFrame,
    group_col: str,
    sortv_col: str,
    tiebreak_col: str,
    bucket_scale: int = 8,
    materialize: bool = True,
) -> DataFrame:
    """Dense rank 1..N_g within each ``group_col`` value under
    ``(sortv_col asc, tiebreak_col asc)`` order, plus the group size
    ``_gn`` — WITHOUT a per-group single-partition window.

    A ``row_number() OVER (PARTITION BY group ORDER BY sortv)`` hashes on
    the group alone, so a low-cardinality group column (languages: ~6
    values) sorts each group's entire slice on ONE task — the partition-
    less-window scale failure (see global_shuffle above) in per-group
    form.  Instead, the same three-phase shape as :func:`global_shuffle`,
    with a RANGE shard in place of the hash-prefix shard (the sort key is
    a double, so the shard must be order-compatible, not hash-derived):

    1. shard ``_bkt = floor(sortv * bucket_scale)`` — monotone in sortv,
       so (``_bkt``, sortv, tiebreak) order == (sortv, tiebreak) order.
       ``bucket_scale`` is exact (callers pass powers of two; sortv*8 is
       an exact IEEE op, so bucketing is engine-independent).
    2. per-(group, bucket) counts -> exclusive prefix offsets via the
       broadcast triangle join over the tiny (groups x buckets) table.
    3. ``row_number`` partitioned by (group, bucket) — bounded partitions
       provided sortv spreads across buckets; a pathological point mass
       lands one bucket on one task, which the caller accepts or re-scales.

    ``tiebreak_col`` must be unique within a group (doc ids are) or ranks
    are ambiguous.  Output = input columns + ``_rank`` + ``_gn``.

    ``materialize`` (default True): the shape references its input FIVE
    times (counts, the a/b triangle sides, totals, the final join), and
    Catalyst re-expands an unmaterialized frame per reference — with an
    expensive upstream (l48 feeds the whole l34 unigram-LM pipeline in:
    22 exchanges / 16 scans observed) the plan recomputes it five-fold.
    An eager ``localCheckpoint`` of the narrow keyed frame makes every
    reference a lineage-free block scan — the same materialize-before-
    reuse posture as the src5 dedup chain (llm_ops) and sequence packing
    (text.py).  Pass False only for inputs that are themselves cheap
    scans."""
    from pyspark.sql import Window

    keyed = df.withColumn(
        "_bkt", F.floor(F.col(sortv_col) * F.lit(float(bucket_scale))).cast("long")
    )
    if materialize:
        keyed = keyed.localCheckpoint(eager=True)
    counts = keyed.groupBy(group_col, "_bkt").agg(F.count("*").alias("_n"))
    a, b = counts.alias("a"), counts.alias("b")
    offsets = (
        a.join(
            F.broadcast(b),
            (F.col(f"b.{group_col}") == F.col(f"a.{group_col}"))
            & (F.col("b._bkt") < F.col("a._bkt")),
            "left",
        )
        .groupBy(
            F.col(f"a.{group_col}").alias(group_col), F.col("a._bkt").alias("_bkt")
        )
        .agg(F.coalesce(F.sum("b._n"), F.lit(0).cast("long")).alias("_off"))
    )
    totals = counts.groupBy(group_col).agg(F.sum("_n").cast("long").alias("_gn"))
    rn = F.row_number().over(
        Window.partitionBy(group_col, "_bkt").orderBy(sortv_col, tiebreak_col)
    )
    return (
        keyed.join(F.broadcast(offsets), [group_col, "_bkt"])
        .join(F.broadcast(totals), group_col)
        .withColumn("_rank", (F.col("_off") + rn).cast("long"))
        .drop("_bkt", "_off")
    )
