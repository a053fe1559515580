"""Dedup operator family over `documents` (SURVEY.md §2.11 l1/l2 +
extensions; north star BASELINE.json:6).

Four tiers, cheapest-first — exactly the cascade a 100 TB training-data
pipeline runs:

1. exact     — content hash groupBy (one shuffle on the hash).
2. MinHash   — shingle -> P permutation mins -> LSH bands -> equi-join on
               (band, sig) -> exact-Jaccard verify.  Candidate generation is
               a join on small keys, never O(N²).
3. SimHash   — 64 bit-vote aggregates -> one 64-bit signature per doc ->
               16-bit band join -> hamming verify via bit_count(xor).
4. n-gram    — character-shingle Jaccard via inverted-index join (shared
               machinery with token Jaccard, operators/text normalization).

Everything is built-in expressions (xxhash64, explode, groupBy, join) inside
whole-stage codegen; no Python in any hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def tokens(text: Column | str) -> Column:
    text = F.col(text) if isinstance(text, str) else text
    return F.split(text, " ")


def word_shingles(text: Column | str, k: int = 3) -> Column:
    """k-word shingles; docs shorter than k words collapse to one whole-text
    shingle."""
    toks = tokens(text)
    n = F.size(toks)
    shingle = lambda i: F.concat_ws(
        " ", *[F.element_at(toks, i + F.lit(j)) for j in range(k)]
    )
    return F.when(n >= k, F.transform(F.sequence(F.lit(1), n - (k - 1)), shingle)).otherwise(
        F.array(F.concat_ws(" ", toks))
    )


def char_ngrams(text: Column | str, n: int = 3) -> Column:
    """Distinct character n-grams."""
    text = F.col(text) if isinstance(text, str) else text
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.length(text) - (n - 1), F.lit(1))),
            lambda i: F.substring(text, i, n),
        )
    )


def exact_dedup_groups(docs: DataFrame) -> DataFrame:
    """Exact dedup by md5 content key: canonical survivor = min doc_id."""
    return (
        docs.select(F.md5("text").alias("h"), "doc_id")
        .groupBy("h")
        .agg(F.min("doc_id").alias("keep_id"), F.count("*").alias("n_copies"))
    )


def minhash_signatures(docs: DataFrame, num_perm: int = 32) -> DataFrame:
    """P permutation-min signatures per doc.  'Permutation' p is the
    xxhash64 family member seeded by p — one exploded-shingle pass computes
    all P mins (P aggregate expressions, single shuffle on doc_id)."""
    sh = docs.select(
        "doc_id", F.explode(F.array_distinct(word_shingles("text"))).alias("sh")
    )
    mins = [
        F.min(F.xxhash64(F.col("sh"), F.lit(p))).alias(f"mh{p}")
        for p in range(num_perm)
    ]
    return sh.groupBy("doc_id").agg(*mins)


def minhash_lsh_pairs(
    docs: DataFrame,
    num_perm: int = 32,
    bands: int = 8,
    jaccard_threshold_pct: int = 30,
) -> DataFrame:
    """Near-duplicate pairs: LSH band join for candidates, exact token-set
    Jaccard (integer-threshold compare) to verify.

    threshold is integer percent so the filter `100*|I| >= pct*|U|` is exact
    arithmetic — no float boundary flakiness.
    """
    rows = num_perm // bands
    sig = minhash_signatures(docs, num_perm)
    band_cols = F.array(
        *[
            F.xxhash64(*[F.col(f"mh{b * rows + j}") for j in range(rows)], F.lit(b))
            for b in range(bands)
        ]
    )
    banded = sig.select("doc_id", F.posexplode(band_cols).alias("band", "bsig"))
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bsig") == F.col("b.bsig"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    tok_sets = docs.select("doc_id", F.array_distinct(tokens("text")).alias("toks"))
    ta = tok_sets.select(F.col("doc_id").alias("doc_a"), F.col("toks").alias("toks_a"))
    tb = tok_sets.select(F.col("doc_id").alias("doc_b"), F.col("toks").alias("toks_b"))
    verified = (
        cand.join(ta, "doc_a")
        .join(tb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.size(F.array_intersect("toks_a", "toks_b")).alias("inter"),
            F.size(F.array_union("toks_a", "toks_b")).alias("uni"),
        )
        .filter(100 * F.col("inter") >= jaccard_threshold_pct * F.col("uni"))
    )
    return verified.select(
        "doc_a", "doc_b", (F.col("inter") / F.col("uni")).alias("jaccard")
    )


def jaccard_pairs(items: DataFrame, threshold_pct: int) -> DataFrame:
    """Set-similarity join via inverted index (PAPERS.md:6): `items` is
    (doc_id, item) with DISTINCT items per doc; pairs sharing >=1 item get
    |intersection| from the index join, |union| from per-doc sizes, and the
    integer-percent threshold keeps the filter exact.

    Scale shape: the self-join key is `item` — frequent items dominate the
    pair count, so at 100 TB a prefix-filter (drop the most frequent items
    before joining, per the positional/prefix filtering literature) bounds
    the blowup; here the vocabulary is small enough to join directly."""
    sizes = items.groupBy("doc_id").agg(F.count("*").alias("sz"))
    a, b = items.alias("a"), items.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.item") == F.col("b.item"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("sz").alias("sz_b"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "inter",
            (F.col("sz_a") + F.col("sz_b") - F.col("inter")).alias("uni"),
        )
        .filter(100 * F.col("inter") >= threshold_pct * F.col("uni"))
        .withColumn("jaccard", F.col("inter") / F.col("uni"))
    )


def simhash_signatures(docs: DataFrame) -> DataFrame:
    """64-bit SimHash per doc: per-token xxhash64, 64 bit-vote sums, bits
    with positive vote set.  64 aggregate expressions, one pass."""
    toks = docs.select(
        "doc_id", F.explode(F.array_distinct(tokens("text"))).alias("tok")
    ).withColumn("h", F.xxhash64("tok"))
    votes = toks.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.shiftrightunsigned(F.col("h"), i).bitwiseAND(1) == 1, 1).otherwise(-1)
            ).alias(f"v{i}")
            for i in range(64)
        ]
    )
    bit = lambda i: F.when(
        F.col(f"v{i}") > 0, F.shiftleft(F.lit(1).cast("long"), i)
    ).otherwise(F.lit(0).cast("long"))
    simhash = bit(0)
    for i in range(1, 64):
        simhash = simhash + bit(i)
    return votes.select("doc_id", simhash.alias("simhash"))


def simhash_pairs(docs: DataFrame, max_hamming: int = 8) -> DataFrame:
    """Near-dup candidates by SimHash: 4x16-bit band equi-join (any pair
    within hamming<=3 shares a band; wider radii trade recall), verified by
    bit_count(xor) <= max_hamming."""
    sig = simhash_signatures(docs)
    bands = sig.select(
        "doc_id",
        "simhash",
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned("simhash", 16 * b).bitwiseAND(0xFFFF)
                    for b in range(4)
                ]
            )
        ).alias("band", "bsig"),
    )
    a, b = bands.alias("a"), bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bsig") == F.col("b.bsig"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            ).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )
