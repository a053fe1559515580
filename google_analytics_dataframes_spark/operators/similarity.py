"""Vector similarity operators over `embeddings(vec_id, embedding float[64],
label)` (SURVEY.md §2.11 l3/l4, extensions l13/l14; PAPERS.md:7-8 top-k
similarity search).

Design for 100 TB:
* Brute-force cosine is the *correctness baseline* (O(N) per query, scan-
  parallel, no shuffle: the query vector is a broadcast literal).
* The scale paths cut candidates before the expensive math: random-
  hyperplane LSH buckets (`signature`) turn near-dup detection into an
  equi-join, and IVF (coarse quantizer = per-label centroids here) probes
  only `nprobe` partitions — both are shuffle-on-small-keys plans.
* All dot products run as JVM-side `aggregate(zip_with(...))` fold —
  sequential over the array, bit-reproducible, no Python in the loop.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from google_analytics_dataframes_spark.io import fanout


def as_double(vec: Column | str) -> Column:
    """float[] -> double[] (exact widening) so accumulation is f64 on both
    engines."""
    vec = F.col(vec) if isinstance(vec, str) else vec
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product (matches DuckDB list_dot_product order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (F.sqrt(dot(a, a)) * F.sqrt(dot(b, b)))


def brute_force_topk(emb: DataFrame, query_vec_id: int, k: int) -> DataFrame:
    """Exact top-k cosine against one stored vector.  The 1-row query side
    is broadcast — the big side is scanned once, no shuffle until the final
    TakeOrderedAndProject."""
    q = emb.filter(F.col("vec_id") == query_vec_id).select(
        as_double("embedding").alias("qv")
    )
    a = as_double(F.col("embedding"))
    b = F.col("qv")
    return (
        emb.crossJoin(F.broadcast(q))
        .select("vec_id", F.round(cosine(a, b), 4).alias("cos"))
        .orderBy(F.col("cos").desc(), "vec_id")
        .limit(k)
    )


def label_centroids(emb: DataFrame) -> DataFrame:
    """Per-label centroid vectors: posexplode to (label, dim, x), exact
    decimal mean per cell, re-assemble ordered arrays.  One shuffle on
    (label, dim) — 640 cells regardless of N."""
    cells = emb.select(
        "label", F.posexplode(as_double("embedding")).alias("dim", "x")
    ).groupBy("label", "dim").agg(
        (F.sum(F.col("x").cast("decimal(30,15)")).cast("double") / F.count("x")).alias(
            "cx"
        )
    )
    return cells.groupBy("label").agg(
        F.array_sort(F.collect_list(F.struct("dim", "cx"))).alias("_cells")
    ).select(
        "label", F.transform("_cells", lambda s: s.getField("cx")).alias("centroid")
    )


def ivf_topk(emb: DataFrame, query_vec_id: int, k: int, nprobe: int = 2) -> DataFrame:
    """IVF-style ANN: coarse quantizer = label centroids; probe the nprobe
    nearest cells; brute-force only inside them.  At 100 TB the per-cell
    scan is a partition-pruned read (data written partitionBy(cell))."""
    cents = label_centroids(emb)
    q = emb.filter(F.col("vec_id") == query_vec_id).select(
        as_double("embedding").alias("qv")
    )
    probe = (
        cents.crossJoin(F.broadcast(q))
        .select("label", cosine(F.col("centroid"), F.col("qv")).alias("ccos"))
        .orderBy(F.col("ccos").desc(), "label")
        .limit(nprobe)
        .select("label")
    )
    cand = emb.join(F.broadcast(probe), "label")
    a = as_double(F.col("embedding"))
    return (
        cand.crossJoin(F.broadcast(q))
        .select("vec_id", "label", F.round(cosine(a, F.col("qv")), 4).alias("cos"))
        .orderBy(F.col("cos").desc(), "vec_id")
        .limit(k)
    )


def knn_join_blocked(emb: DataFrame, k: int = 3) -> DataFrame:
    """k-NN self-join blocked by label: pairwise cosine within each label
    block via an Arrow-batched grouped-map (numpy matmul per block), top-k
    neighbors per vector.  Blocking bounds the pair count (N²/L per block);
    the LSH/IVF prefilter replaces `label` as the blocking key at scale."""

    def per_block(pdf: pd.DataFrame) -> pd.DataFrame:
        m = np.stack(pdf["embedding"].to_numpy()).astype("float64")
        ids = pdf["vec_id"].to_numpy()
        norms = np.sqrt((m * m).sum(axis=1))
        sims = (m @ m.T) / np.outer(norms, norms)
        np.fill_diagonal(sims, -np.inf)
        out = []
        kk = min(k, len(ids) - 1)
        for i in range(len(ids)):
            # stable top-k: sort by (-cos, neighbor_id)
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


def hyperplane_lsh_pairs(
    emb: DataFrame, n_planes: int = 16, min_cos: float = 0.9
) -> DataFrame:
    """Near-duplicate embedding pairs via random-hyperplane LSH: a fixed
    seeded hyperplane matrix signs each vector into an n_planes-bit bucket;
    only same-bucket pairs are verified with exact cosine.  Turns the O(N²)
    pair space into an equi-join on `sig`."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import LongType

    planes = np.random.RandomState(42).standard_normal((n_planes, 64))

    @pandas_udf(LongType())
    def signature(col: pd.Series) -> pd.Series:
        m = np.stack(col.to_numpy()).astype("float64")
        bits = (m @ planes.T) > 0
        return pd.Series(bits.dot(1 << np.arange(n_planes)).astype("int64"))

    sig = fanout(emb).select("vec_id", "embedding", signature("embedding").alias("sig"))
    a, b = sig.alias("a"), sig.alias("b")
    pairs = a.join(
        b,
        (F.col("a.sig") == F.col("b.sig")) & (F.col("a.vec_id") < F.col("b.vec_id")),
    ).select(
        F.col("a.vec_id").alias("vec_a"),
        F.col("b.vec_id").alias("vec_b"),
        F.round(
            cosine(as_double(F.col("a.embedding")), as_double(F.col("b.embedding"))), 4
        ).alias("cos"),
    )
    return pairs.filter(F.col("cos") >= min_cos)


def quantize_int8(emb: DataFrame) -> DataFrame:
    """Per-dimension affine int8 quantization of the embedding column — the
    4x storage cut a 100-TB vector corpus takes before ANN indexing.
    Dimension stats (min/max) are one tiny aggregate (64 rows) broadcast
    back; codes are round((x-min)/scale) in [0,255]; the emitted per-vector
    max |reconstruction error| is bounded by scale/2 per dim.

    All exact JVM arithmetic: stats use exact decimal extrema (no float-sum
    order dependence), codes are integer rounds — the same numbers on any
    partitioning/engine."""
    cells = fanout(emb).select(
        "vec_id", F.posexplode(as_double("embedding")).alias("dim", "x")
    )
    stats = cells.groupBy("dim").agg(
        F.min("x").alias("dmin"), F.max("x").alias("dmax")
    )
    # constant dimension (dmax == dmin): scale would be 0 and every code
    # NULL via divide-by-zero; force scale 1 so code = 0 and error = 0
    scale = (
        F.when(F.col("dmax") == F.col("dmin"), F.lit(1.0))
        .otherwise((F.col("dmax") - F.col("dmin")) / 255)
        .alias("scale")
    )
    withs = cells.join(F.broadcast(stats.select("dim", "dmin", scale)), "dim")
    code = F.round((F.col("x") - F.col("dmin")) / F.col("scale")).cast("int")
    recon = F.col("dmin") + code * F.col("scale")
    return (
        withs.select(
            "vec_id",
            "dim",
            code.alias("code"),
            F.abs(F.col("x") - recon).alias("err"),
        )
        .groupBy("vec_id")
        .agg(
            F.count("*").alias("n_dims"),
            F.min("code").alias("min_code"),
            F.max("code").alias("max_code"),
            F.round(F.max("err"), 9).alias("max_abs_err"),
        )
    )
