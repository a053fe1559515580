"""Text-analysis operators over `documents` (SURVEY.md §2.11 l5/l8/l9 +
extensions: language-ID, quality scoring, token counting, fingerprinting).

All pure Spark expressions — the analyses a training-data pipeline runs per
document stay inside whole-stage codegen; only the (optional) model-scoring
stub l9 crosses to Python, Arrow-batched.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType, LongType, StructField, StructType

from google_analytics_dataframes_spark.io import fanout, fanout_by
from google_analytics_dataframes_spark.operators.dedup import tokens, word_shingles

#: Fixed "stopword" list from the synthetic analytics vocabulary
#: (FIXTURES.md: documents.text draws from spark/join/filter/window/...).
STOPWORDS = (
    "spark join filter window data query table row value agg".split()
)

#: Sentiment-ish lexica for the classifier stub (l9) — deterministic, no
#: external model (PAPERS.md:5 sentiment-on-Spark, reduced to a linear
#: scorer whose features are re-expressible in SQL).
NEG_WORDS = ("slow", "error", "fail", "scan")
POS_WORDS = ("fast", "cache", "index", "merge")


def tf_idf(docs: DataFrame) -> DataFrame:
    """Per (doc, term) TF-IDF: tf = in-doc occurrences, idf = ln(N/df).
    Two aggregations + one broadcast of the 1-row corpus count; df join is
    on `token` (bounded vocabulary -> broadcastable at any corpus size).

    Deliberately NOT a `count().over(Window.partitionBy(token))`: a window
    buffers each token's whole partition, so one hot token (stopword-like
    skew) OOMs/spills at scale, while the agg+broadcast-join shape reduces
    to |vocab| rows before any join.

    Partitioning: the one exchange is hash(doc_id) on the *compact* document
    stream, before the explode — hash(doc_id) satisfies the tf aggregate's
    ClusteredDistribution(doc_id, token), so the ~50x-larger exploded token
    stream never shuffles (only the |vocab|-sized df agg does)."""
    toks = fanout_by(docs, "doc_id").select(
        "doc_id", F.explode(tokens("text")).alias("token")
    )
    tf = toks.groupBy("doc_id", "token").agg(F.count("*").alias("tf"))
    df = tf.groupBy("token").agg(F.count("*").alias("df"))
    n = docs.agg(F.count("*").alias("n"))
    return (
        tf.join(F.broadcast(df), "token")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "token",
            "tf",
            F.round(
                F.col("tf") * F.log(F.col("n").cast("double") / F.col("df")), 4
            ).alias("tfidf"),
        )
    )


def language_profiles(docs: DataFrame, top_n: int = 10) -> DataFrame:
    """Self-trained word-level language profiles: top-N tokens per lang by
    frequency (deterministic tiebreak on token)."""
    from pyspark.sql import Window

    counts = (
        fanout(docs).select("lang", F.explode(tokens("text")).alias("token"))
        .groupBy("lang", "token")
        .agg(F.count("*").alias("cnt"))
    )
    w = Window.partitionBy("lang").orderBy(F.col("cnt").desc(), "token")
    return (
        counts.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= top_n)
        .select("lang", "token")
    )


def language_id(docs: DataFrame, top_n: int = 10) -> DataFrame:
    """n-gram-heuristic language ID: score each doc against each lang
    profile by distinct-token overlap; argmax with (overlap desc, lang asc)
    tiebreak.  Profiles are tiny -> broadcast; ONE shuffle total on the doc
    side: hash(doc_id) on the compact pre-explode stream satisfies both the
    score aggregate's ClusteredDistribution(doc_id, lang, cand_lang) and the
    argmax window's partitionBy(doc_id), so neither re-shuffles the exploded
    or scored rows."""
    from pyspark.sql import Window

    profiles = language_profiles(docs, top_n).withColumnRenamed("lang", "cand_lang")
    doc_toks = fanout_by(docs, "doc_id").select(
        "doc_id", "lang", F.explode(F.array_distinct(tokens("text"))).alias("token")
    )
    scores = (
        doc_toks.join(F.broadcast(profiles), "token")
        .groupBy("doc_id", "lang", "cand_lang")
        .agg(F.count("*").alias("overlap"))
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("overlap").desc(), "cand_lang")
    return (
        scores.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("doc_id", "lang", F.col("cand_lang").alias("pred_lang"), "overlap")
    )


def quality_scores(docs: DataFrame) -> DataFrame:
    """Per-doc quality features: length, type-token ratio, stopword ratio,
    non-letter ratio, composite logistic score (all ratios are exact int
    divisions; the logistic gets terminal round(4))."""
    toks = tokens("text")
    n_tok = F.size(toks)
    n_stop = F.size(
        F.filter(toks, lambda t: t.isin(*STOPWORDS))
    )
    n_alpha = F.length(F.regexp_replace("text", "[^a-z]", ""))
    ttr = F.size(F.array_distinct(toks)) / n_tok
    stop_ratio = n_stop / n_tok
    z = 0.5 * ttr + 0.3 * F.log(F.lit(1).cast("double") + n_tok) - 1.5 * stop_ratio
    return fanout(docs).select(
        "doc_id",
        "lang",
        F.col("n_chars").alias("n_chars"),
        n_tok.cast("long").alias("n_tokens"),
        F.round(ttr, 6).alias("ttr"),
        F.round(stop_ratio, 6).alias("stop_ratio"),
        F.round(n_alpha / F.col("n_chars"), 6).alias("alpha_ratio"),
        F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 4).alias("quality"),
    )


def token_counts(docs: DataFrame) -> DataFrame:
    """Whitespace tokens + BPE-ish subword chunks (greedy <=4-letter runs,
    digits, punctuation) — the cheap "how many training tokens" estimator."""
    bpe_pattern = "[a-z]{1,4}|[0-9]|[^a-z0-9 ]"
    return fanout(docs).select(
        "doc_id",
        F.size(tokens("text")).cast("long").alias("ws_tokens"),
        F.regexp_count("text", F.lit(bpe_pattern)).cast("long").alias("bpe_tokens"),
    )


def fingerprints(docs: DataFrame) -> DataFrame:
    """Rolling-hash document fingerprint: min md5 over 3-word shingles
    (winnowing reduced to window=whole-doc) — a stable near-identity key
    that survives local edits away from the minimum shingle."""
    return fanout(docs).select(
        "doc_id",
        F.array_min(F.transform(word_shingles("text"), F.md5)).alias("fingerprint"),
    )


def repetition_stats(docs: DataFrame) -> DataFrame:
    """Within-document repetition (Gopher/C4-style quality signal): fraction
    of duplicate 3-word shingles.  Boilerplate-heavy or looping generations
    score high; single-pass per row, no shuffle."""
    sh = word_shingles("text")
    n = F.size(sh)
    nd = F.size(F.array_distinct(sh))
    return fanout(docs).select(
        "doc_id",
        n.cast("long").alias("n_shingles"),
        nd.cast("long").alias("n_distinct"),
        F.round((n - nd) / n, 6).alias("dup_ratio"),
    )


#: (name, regex) PII-ish patterns — deliberately simple, identical semantics
#: in Java regex (Spark) and RE2 (DuckDB).
PII_PATTERNS: tuple[tuple[str, str], ...] = (
    ("emails", "[a-z0-9]+@[a-z0-9]+\\.[a-z]+"),
    ("phones", "[0-9]{3}-[0-9]{3}-[0-9]{4}"),
    ("ipv4s", "[0-9]+\\.[0-9]+\\.[0-9]+\\.[0-9]+"),
)


def pii_scan(docs: DataFrame) -> DataFrame:
    """Per-doc counts of PII-looking spans (emails / phone numbers / IPv4) —
    the redaction/filter precursor in a training-data pipeline.  Pure
    regexp_count projections, whole-stage codegen."""
    counts = [
        F.regexp_count(F.col("text"), F.lit(pat)).cast("long").alias(name)
        for name, pat in PII_PATTERNS
    ]
    out = fanout(docs).select("doc_id", *counts)
    total = sum((F.col(name) for name, _ in PII_PATTERNS), start=F.lit(0).cast("long"))
    return out.withColumn("any_pii", total > 0)


#: Redaction mask per PII pattern; masks contain no digits/@, so later
#: patterns can never re-match inside an earlier replacement.
PII_MASKS: tuple[tuple[str, str], ...] = (
    ("emails", "[EMAIL]"),
    ("phones", "[PHONE]"),
    ("ipv4s", "[IP]"),
)


def pii_redact(docs: DataFrame) -> DataFrame:
    """Apply-side of :func:`pii_scan`: replace every PII-looking span with
    its type mask — the redaction pass a training corpus runs after the
    scan flags documents.  A chain of `regexp_replace` projections inside
    whole-stage codegen (replace-all is Spark's default; the oracle's
    DuckDB twin passes the 'g' flag), mask order fixed by PII_PATTERNS."""
    masks = dict(PII_MASKS)
    redacted = F.col("text")
    for name, pat in PII_PATTERNS:
        redacted = F.regexp_replace(redacted, pat, masks[name])
    return fanout(docs).select("doc_id", redacted.alias("redacted"))


def compression_ratio(docs: DataFrame) -> DataFrame:
    """zlib compression ratio per document (compressed bytes / raw bytes) —
    the C4/Gopher-style redundancy signal: templated or repetitive text
    compresses far below natural prose, random noise compresses above it.
    zlib at a fixed level is bit-deterministic, so the ratio is stable
    across runs/partitionings; the codec runs as an Arrow-batched pandas
    UDF (no SQL twin exists — R-tier).  Verified invariants
    (tests/test_invariants.py test_compression_ratio_bounds_and_ordering):
    ratio in (0, 1.2] for ASCII text, and highly repetitive text
    compresses strictly below the corpus median."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import DoubleType

    @pandas_udf(DoubleType())
    def ratio(col: pd.Series) -> pd.Series:
        import zlib

        def one(s: str) -> float:
            raw = s.encode("utf-8")
            if not raw:
                return 0.0
            return round(len(zlib.compress(raw, 6)) / len(raw), 6)

        return col.map(one)

    return fanout(docs).select(
        "doc_id",
        F.octet_length("text").cast("long").alias("n_bytes"),
        ratio("text").alias("zlib_ratio"),
    )


def hash_split(
    docs: DataFrame,
    key_col: str = "doc_id",
    train_pct: int = 80,
    val_pct: int = 10,
) -> DataFrame:
    """Deterministic train/val/test assignment by content-independent key
    hash: bucket = first 16 bits of md5(key) mod 100.  Stable across runs,
    partitionings and engines (md5 is bit-identical everywhere), so the
    split never leaks when the corpus is re-sharded or appended.
    Projection-only — no shuffle, no sampling state.

    Bucket arithmetic is shared with operators/sampling.py (empty salt =
    plain md5(key), so existing split assignments are unchanged); mixture
    sampling uses a non-empty salt for an independent bucket stream."""
    from google_analytics_dataframes_spark.operators.sampling import sample_bucket

    bucket = sample_bucket(key_col, salt="")
    return fanout(docs).select(
        F.col(key_col),
        bucket.alias("bucket"),
        F.when(bucket < train_pct, "train")
        .when(bucket < train_pct + val_pct, "val")
        .otherwise("test")
        .alias("split"),
    )


def sequence_pack(
    docs: DataFrame,
    budget_tokens: int = 2048,
    order_col: str = "doc_id",
    materialize: bool = False,
) -> DataFrame:
    """Pack documents into ~budget_tokens training sequences: running token
    sum over a deterministic document order, bin = floor(cumsum_before /
    budget).  The distributed form of greedy packing; bins can overflow by at
    most one document, the standard approximation when packing at corpus
    scale.

    Two-phase distributed prefix sum — NO global partition-less window (a
    single `OVER (ORDER BY ...)` would pull the whole corpus onto one task):

    1. `repartitionByRange(order_col)` + `sortWithinPartitions` gives
       contiguous, globally ordered key ranges; an Arrow-batched
       `mapInPandas` scan then computes each partition's LOCAL exclusive
       running sum with NO further shuffle (a window partitioned by
       `spark_partition_id()` would be pure-JVM but forces a second
       corpus-sized hash exchange — Catalyst can't prove the range layout
       satisfies it; the per-partition linear scan is precisely the
       semantics built-in operators can't express in place).
    2. Per-partition token subtotals (one row per partition — cluster-sized,
       not data-sized) get their exclusive prefix via a broadcast triangle
       join (b.pid < a.pid), and the offsets broadcast back onto the local
       sums.  Fully lazy: no driver-side action, no partition-less window
       anywhere in the plan, ONE corpus-sized shuffle total (the range
       partitioning).

    Requires `order_col` values to be unique (a range partitioner may split
    ties across partitions, which would make pid order ambiguous); doc ids
    are.  Global bins are identical to the single-window formulation, so the
    exact SQL oracle still holds."""
    toks = F.size(tokens("text")).cast("long")
    ranged = (
        fanout(docs)
        .select(F.col(order_col), toks.alias("n_tokens"))
        .repartitionByRange(F.col(order_col))
        .sortWithinPartitions(F.col(order_col))
    )
    order_field = ranged.schema[order_col]

    # Phase 1: local exclusive running sum, one sequential Arrow scan per
    # partition; state carries across batches inside a partition.
    out_schema = StructType(
        [
            order_field,
            StructField("n_tokens", LongType()),
            StructField("pid", IntegerType()),
            StructField("local_before", LongType()),
        ]
    )

    def _local_scan(iterator):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        running = 0
        for pdf in iterator:
            n = pdf["n_tokens"].astype("int64")
            pdf["pid"] = pid
            pdf["local_before"] = n.cumsum() - n + running
            running += int(n.sum())
            yield pdf

    # `staged` has three consumers (both triangle-join sides derive the
    # subtotals from it, plus the final join), so the range shuffle + Python
    # scan must materialize ONCE and the other consumers read the
    # (order_col, n_tokens, pid, local_before) rows, ~28 B/row.  With
    # `materialize=True` that is an eager lineage-free localCheckpoint (no
    # persist registered, nothing accumulates across calls in a long-lived
    # session — prefer this for one-shot pipeline runs); the lazy default
    # persists instead, with the cache's lifetime owned by the returned
    # frame (dropped when the caller releases it).
    staged = ranged.mapInPandas(_local_scan, schema=out_schema)
    staged = staged.localCheckpoint(eager=True) if materialize else staged.persist()

    # Phase 2: exclusive prefix over the per-partition subtotals (tiny).
    subtot = staged.groupBy("pid").agg(F.sum("n_tokens").alias("part_tokens"))
    a, b = subtot.alias("a"), subtot.alias("b")
    offsets = (
        a.join(F.broadcast(b), F.col("b.pid") < F.col("a.pid"), "left")
        .groupBy(F.col("a.pid").alias("pid"))
        .agg(
            F.coalesce(F.sum("b.part_tokens"), F.lit(0).cast("long")).alias("offset")
        )
    )

    cum_before = F.col("local_before") + F.col("offset")
    return (
        staged.join(F.broadcast(offsets), "pid")
        .withColumn("bin", F.floor(cum_before / budget_tokens).cast("long"))
        .select(order_col, "n_tokens", "bin")
    )


# ----------------------------------------------------------------- BPE ----

_BPE_EOW = "▁"  # end-of-word sentinel (U+2581, never in corpus text)


def train_bpe_merges(
    word_freqs: dict[str, int], n_merges: int
) -> list[tuple[str, str]]:
    """Learn a greedy BPE merge list (Sennrich et al. 2016, the reference
    algorithm behind every production subword tokenizer) from a
    word-frequency table.

    Pure driver-side Python by DESIGN, not accident: production
    tokenizers are trained on a bounded SAMPLE (a few GB even for
    frontier-model vocabularies) and then applied to the full corpus —
    the training input here is bounded by the caller's sample contract,
    and only the apply path is distributed (see l77).

    Determinism: each iteration merges the pair with the highest
    frequency, ties broken by lexicographically smallest pair — no dict
    iteration order leaks into the result.
    """
    vocab: dict[tuple[str, ...], int] = {
        tuple(w) + (_BPE_EOW,): f for w, f in word_freqs.items() if w
    }
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for syms, f in vocab.items():
            for pair in zip(syms, syms[1:]):
                pairs[pair] = pairs.get(pair, 0) + f
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        merged = best[0] + best[1]
        new_vocab: dict[tuple[str, ...], int] = {}
        for syms, f in vocab.items():
            out: list[str] = []
            i = 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and syms[i] == best[0]
                    and syms[i + 1] == best[1]
                ):
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + f
        vocab = new_vocab
    return merges


def bpe_encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Encode one word with a learned merge table: repeatedly apply the
    LOWEST-rank applicable merge (all its occurrences, left to right) —
    the standard BPE apply order, deterministic for any input."""
    syms: list[str] = list(word) + [_BPE_EOW]
    while len(syms) > 1:
        best_rank = None
        best_pair = None
        for pair in zip(syms, syms[1:]):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_pair = r, pair
        if best_pair is None:
            break
        a, b = best_pair
        merged = a + b
        out: list[str] = []
        i = 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(merged)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def bpe_decode(tokens: list[str]) -> str:
    """Inverse of :func:`bpe_encode_word` over a whole word-token stream:
    concatenate and split back on the end-of-word sentinel."""
    return " ".join(w for w in "".join(tokens).split(_BPE_EOW) if w != "") \
        if tokens else ""
