"""§2.11 LLM-data-pipeline operators (SURVEY.md; north star BASELINE.json:6)
plus the extended training-data operators the task brief requires: the full
dedup cascade (exact / MinHash-LSH / SimHash / n-gram / embedding), ANN
search (brute-force baseline + IVF + hyperplane-LSH), text analysis
(language-ID, quality, token counting, fingerprinting), and multimodal
binary-column plumbing.

O-tier rows pair with ANSI oracles; algorithm-defined ops (LSH families,
ANN, pandas-blocked kNN, binary plumbing) are R-tier with planted-fixture
self-tests in tests/.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import functions as F

from google_analytics_dataframes_spark.io import fanout, table_fingerprint
from google_analytics_dataframes_spark.registry import register
from google_analytics_dataframes_spark.queries._util import T
from google_analytics_dataframes_spark.operators import dedup as D
from google_analytics_dataframes_spark.operators import similarity as S
from google_analytics_dataframes_spark.operators import text as X
from google_analytics_dataframes_spark.operators import multimodal as M


# ---------------------------------------------------------------- dedup ----

# Shared materialization for the src5 dedup cascade.  l12 (pairs), l29
# (clusters) and l33 (keeper election) are three registered views over ONE
# physical computation: 3-gram explode -> Jaccard>=60% pairs -> connected
# components.  Registered independently they would re-run that chain three
# times per sweep (~24s of the round-2 bench was this single computation
# done thrice); a real pipeline materializes pairs/clusters once and fans
# the cheap finishing steps out from there.  The cache key includes the
# Spark application id (frames die with their session) and a content
# fingerprint of documents.parquet (a regenerated dataset must never be
# served stale pairs).  Values are `localCheckpoint`ed, so cache hits are
# lineage-free and re-joinable at no recompute cost.
_SRC5_CACHE: dict[tuple, object] = {}


def _src5_key(spark, sf_dir: str, what: str) -> tuple:
    return (what, spark.sparkContext.applicationId, sf_dir,
            table_fingerprint(sf_dir, "documents"))


def _simjoin_stats(spark, sf_dir):
    """l7-family router stats from the persisted catalog row (round 15,
    VERDICT r14 item #4) — one warm-up-time build per (session, dataset
    fingerprint), zero probe jobs in the timed path."""
    from google_analytics_dataframes_spark.sources.bucketed import (
        simjoin_token_stats,
    )

    return simjoin_token_stats(spark, sf_dir, _ASLICE_MOD, _ASLICE_RES)


def _src5_pairs(spark, sf_dir):
    """3-gram Jaccard>=60% near-dup pairs on the src5 slice, materialized
    once per (session, dataset): columns doc_a, doc_b, inter, uni, jaccard."""
    key = _src5_key(spark, sf_dir, "pairs")
    df = _SRC5_CACHE.get(key)
    if df is None:
        docs = T(spark, sf_dir, "documents").filter(F.col("source") == "src5")
        grams = fanout(docs).select(
            "doc_id", F.explode(D.char_ngrams("text", 3)).alias("item")
        )
        df = D.jaccard_pairs(grams, threshold_pct=60, materialize=True)
        _SRC5_CACHE[key] = df
    return df


def _src5_clusters(spark, sf_dir):
    """Connected components over :func:`_src5_pairs` (doc_id, cluster_id for
    every doc that appears in some pair), materialized once per (session,
    dataset)."""
    key = _src5_key(spark, sf_dir, "clusters")
    df = _SRC5_CACHE.get(key)
    if df is None:
        pairs = _src5_pairs(spark, sf_dir).select("doc_a", "doc_b")
        # connected_components localCheckpoints its label table internally,
        # so the returned frame is already cheap to re-read.
        df = D.connected_components(pairs)
        _SRC5_CACHE[key] = df
    return df


@register(
    "l1_exact_dedup",
    oracle="""
    SELECT md5(text) AS h, MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
    FROM documents GROUP BY h
    """,
)
def l1_exact_dedup(spark, sf_dir):
    """Exact content-hash dedup; survivor = min doc_id (deterministic)."""
    return D.exact_dedup_groups(T(spark, sf_dir, "documents"))


@register(
    "l2_near_dedup_minhash",
    oracle="""
    WITH t AS (SELECT doc_id,
                      len(list_distinct(string_split(text, ' '))) AS sz
               FROM documents WHERE doc_id < 10)
    SELECT doc_id AS doc_orig,
           CASE WHEN doc_id < 5 THEN 'exact' ELSE 'near' END AS kind,
           round(CASE WHEN doc_id < 5 THEN 1.0
                      ELSE sz / (sz + 1.0) END, 6) AS jaccard
    FROM t
    """,
)
def l2_near_dedup_minhash(spark, sf_dir):
    """MinHash(32 perms)/LSH(8 bands) near-dup pairs, exact-Jaccard
    verified at >=30% (operators/dedup.py), emitted as a PLANTED-PROBE
    RECALL AUDIT so the driver can hash-check it (upgraded from rows-only
    in round 5, VERDICT r4 item #3): docs 0-4 get exact clones and docs
    5-9 get one-token-appended near clones, all under fresh negative ids;
    the full LSH+verify pipeline runs over corpus ∪ probes and the query
    emits each intended (probe, source) pair with its verified Jaccard.
    The oracle recomputes the ground truth independently — the exact
    token-set Jaccard of (text, text) and (text, text+' zzqxneardup') is
    1.0 and sz/(sz+1) — so a missed recall fails the row count and a
    wrong verify fails the value hash.  Exact clones share the full
    signature (recall certain); the appended-token clones' band-collision
    probability is 1-(1-J^4)^8 at J=sz/(sz+1)≈0.99 — a ~5e-12 miss rate,
    and deterministic under the fixed hash family (locally confirmed at
    sf0.001/0.01/0.1).  The corpus-wide pair mining itself is exercised
    by tests/test_dedup_similarity.py.

    Scale shape: unchanged from the raw operator — probe construction is
    a 10-row transform unioned onto the scan; no extra shuffles."""
    docs = T(spark, sf_dir, "documents").select("doc_id", "text")
    base = docs.filter(F.col("doc_id") < 10)
    probes = base.select(
        (-F.col("doc_id") - 1).alias("doc_id"),
        F.when(F.col("doc_id") < 5, F.col("text"))
        .otherwise(F.concat("text", F.lit(" zzqxneardup")))
        .alias("text"),
    )
    pairs = D.minhash_lsh_pairs(docs.unionByName(probes))
    orig = (-F.col("doc_a") - 1).cast("long")
    return (
        pairs.filter((F.col("doc_a") < 0) & (F.col("doc_b") == orig))
        .select(
            F.col("doc_b").alias("doc_orig"),
            F.when(F.col("doc_b") < 5, "exact").otherwise("near").alias("kind"),
            F.round("jaccard", 6).alias("jaccard"),
        )
    )


@register(
    "l11_simhash_neardup",
    oracle="""
    SELECT doc_id AS doc_orig,
           CASE WHEN doc_id < 5 THEN 'exact' ELSE 'near' END AS kind,
           TRUE AS locality_ok
    FROM documents WHERE doc_id < 10
    """,
)
def l11_simhash_neardup(spark, sf_dir):
    """SimHash-64 near-dup candidates (16-bit band join, hamming<=8),
    emitted as a PLANTED-PROBE AUDIT so the driver can hash-check it
    (same upgrade pattern as l2, round 5), in two parts matching what the
    algorithm actually guarantees: docs 0-4 get EXACT clones under fresh
    negative ids and must be recalled by the FULL sign-band-verify
    pipeline at hamming 0 (identical signature -> band collision is
    certain); docs 5-9 get one-token-appended NEAR clones whose
    signature-level hamming must land in [1, 12] — the locality property
    (small edit -> few sign flips; measured 1-8 across
    sf0.001/0.01/0.1, vs ~32 expected for unrelated docs).  Near clones
    deliberately do NOT assert LSH detection: 4x16-bit bands only
    guarantee recall to hamming 3, and the measured flips scatter across
    bands (honest LSH behavior, documented rather than tuned around).
    A pipeline recall miss fails the row count; a signature regression
    flips locality_ok and fails the value hash.  Corpus-wide pair mining
    is exercised by tests/test_dedup_similarity.py.

    Scale shape: unchanged from the raw operator — probe construction is
    a 10-row transform unioned onto the scan; no extra shuffles."""
    docs = T(spark, sf_dir, "documents").select("doc_id", "text")
    base = docs.filter(F.col("doc_id") < 10)
    probes = base.select(
        (-F.col("doc_id") - 1).alias("doc_id"),
        F.when(F.col("doc_id") < 5, F.col("text"))
        .otherwise(F.concat("text", F.lit(" zzqxneardup")))
        .alias("text"),
    )
    # ONE signature pass over corpus ∪ probes, materialized — the band
    # self-join references its input twice and the near-audit reads it a
    # third time, so without this the 64-bit-vote aggregate (the dominant
    # cost) would run 3x.  The checkpoint blocks CANNOT be unpersisted
    # here: the returned frame is consumed lazily by the caller and a
    # localCheckpoint truncates lineage, so dropping the blocks early
    # would lose the only copy.  Cleanup relies on ContextCleaner GC'ing
    # the checkpointed RDD once the result frame is unreachable (~KB of
    # (doc_id, long) rows per invocation, bounded across a sweep).
    sig = D.simhash_signatures(docs.unionByName(probes)).localCheckpoint(
        eager=True
    )
    pairs = D.simhash_pairs(sig=sig)
    orig = (-F.col("doc_a") - 1).cast("long")
    det = pairs.filter(
        (F.col("doc_a") >= -5) & (F.col("doc_a") < 0) & (F.col("doc_b") == orig)
    ).select(
        F.col("doc_b").alias("doc_orig"),
        F.lit("exact").alias("kind"),
        (F.col("hamming") == 0).alias("locality_ok"),
    )
    sp = sig.filter(F.col("doc_id") < -5).select(
        (-F.col("doc_id") - 1).alias("doc_orig"), F.col("simhash").alias("_sp")
    )
    so = sig.filter((F.col("doc_id") >= 5) & (F.col("doc_id") < 10)).select(
        F.col("doc_id").alias("doc_orig"), F.col("simhash").alias("_so")
    )
    near = sp.join(so, "doc_orig").select(
        "doc_orig",
        F.lit("near").alias("kind"),
        F.bit_count(F.col("_sp").bitwiseXOR(F.col("_so")))
        .between(1, 12)
        .alias("locality_ok"),
    )
    return det.unionByName(near)


@register(
    "l12_ngram_jaccard",
    oracle="""
    WITH docs5 AS (SELECT doc_id, text FROM documents WHERE source = 'src5'),
    pos AS (SELECT doc_id, text,
                   unnest(range(1, greatest(len(text) - 2, 1) + 1)) AS p
            FROM docs5),
    grams AS (SELECT DISTINCT doc_id, substr(text, CAST(p AS INTEGER), 3) AS gram
              FROM pos),
    sizes AS (SELECT doc_id, COUNT(*) AS sz FROM grams GROUP BY doc_id),
    inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
              FROM grams a JOIN grams b
                ON a.gram = b.gram AND a.doc_id < b.doc_id
              GROUP BY 1, 2)
    SELECT i.doc_a, i.doc_b, i.inter,
           CAST(sa.sz + sb.sz - i.inter AS BIGINT) AS uni,
           (CAST(i.inter AS DOUBLE) / (sa.sz + sb.sz - i.inter)) AS jaccard
    FROM inter i
    JOIN sizes sa ON sa.doc_id = i.doc_a
    JOIN sizes sb ON sb.doc_id = i.doc_b
    WHERE 100 * i.inter >= 60 * (sa.sz + sb.sz - i.inter)
    """,
)
def l12_ngram_jaccard(spark, sf_dir):
    """Character-3-gram Jaccard near-dup pairs (>=60%) within one source
    slice — the token-free dedup signal for noisy text.  Reads the shared
    src5 pair materialization (header comment above): the gram->pairs
    pipeline runs once per session for l12/l29/l33 together."""
    out = _src5_pairs(spark, sf_dir)
    return out.select(
        "doc_a", "doc_b", "inter", F.col("uni").cast("long").alias("uni"), "jaccard"
    )


@register(
    "l73_triangle_count",
    oracle="""
    WITH docs5 AS (SELECT doc_id, text FROM documents WHERE source = 'src5'),
    pos AS (SELECT doc_id, text,
                   unnest(range(1, greatest(len(text) - 2, 1) + 1)) AS p
            FROM docs5),
    grams AS (SELECT DISTINCT doc_id, substr(text, CAST(p AS INTEGER), 3) AS gram
              FROM pos),
    sizes AS (SELECT doc_id, COUNT(*) AS sz FROM grams GROUP BY doc_id),
    inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
              FROM grams a JOIN grams b
                ON a.gram = b.gram AND a.doc_id < b.doc_id
              GROUP BY 1, 2),
    e AS (SELECT i.doc_a AS a, i.doc_b AS b FROM inter i
          JOIN sizes sa ON sa.doc_id = i.doc_a
          JOIN sizes sb ON sb.doc_id = i.doc_b
          WHERE 100 * i.inter >= 60 * (sa.sz + sb.sz - i.inter))
    SELECT CAST((SELECT COUNT(DISTINCT v) FROM
                 (SELECT a AS v FROM e UNION ALL SELECT b FROM e)) AS BIGINT)
             AS n_vertices,
           CAST((SELECT COUNT(*) FROM e) AS BIGINT) AS n_edges,
           CAST((SELECT COUNT(*) FROM e e1
                 JOIN e e2 ON e2.a = e1.a AND e2.b > e1.b
                 JOIN e e3 ON e3.a = e1.b AND e3.b = e2.b) AS BIGINT)
             AS n_triangles
    """,
)
def l73_triangle_count(spark, sf_dir):
    """Triangle census of the near-dup pair GRAPH — the structural health
    check a dedup pipeline runs on its pair set: triangles are the unit of
    cluster density (a clique of k near-dups has C(k,3) of them; a pair
    set whose triangle count collapses after a threshold change signals
    clusters shattering into chains), and triangle counting is the classic
    graph-at-scale benchmark.

    Spark-first algorithm — DEGREE-ORIENTED wedge join (Shank/
    Schank-Wagner; the MapReduce formulation of Suri-Vassilvitskii's
    'Counting Triangles and the Curse of the Last Reducer', WWW 2011) —
    never the naive 3-way self-join the oracle runs: orient every edge
    from its lower-(degree, id) endpoint to the higher one, build wedges
    only at each edge's SOURCE (so a vertex generates C(out_deg, 2)
    wedges with out_deg <= O(sqrt(m)) by the orientation bound, killing
    the high-degree-hub blowup), and close each wedge against the
    canonical edge set with one equi-join.  Each triangle is counted
    exactly once — at its unique minimum-(degree, id) corner.  Edges are
    l12's driver-proven >=60% 3-gram Jaccard pairs (the shared src5
    materialization, so l12/l29/l33/l73 price one pair computation per
    session)."""
    pairs = _src5_pairs(spark, sf_dir).select("doc_a", "doc_b")
    deg = (
        pairs.select(F.col("doc_a").alias("v"))
        .unionAll(pairs.select(F.col("doc_b").alias("v")))
        .groupBy("v")
        .agg(F.count("*").alias("deg"))
    )
    da = deg.select(F.col("v").alias("doc_a"), F.col("deg").alias("deg_a"))
    db = deg.select(F.col("v").alias("doc_b"), F.col("deg").alias("deg_b"))
    with_deg = pairs.join(F.broadcast(da), "doc_a").join(
        F.broadcast(db), "doc_b"
    )
    a_first = (F.col("deg_a") < F.col("deg_b")) | (
        (F.col("deg_a") == F.col("deg_b")) & (F.col("doc_a") < F.col("doc_b"))
    )
    oriented = with_deg.select(
        F.when(a_first, F.col("doc_a")).otherwise(F.col("doc_b")).alias("src"),
        F.when(a_first, F.col("doc_b")).otherwise(F.col("doc_a")).alias("dst"),
    )
    e1 = oriented.select("src", F.col("dst").alias("u"))
    e2 = oriented.select("src", F.col("dst").alias("w"))
    wedges = e1.join(e2, "src").filter(F.col("u") < F.col("w"))
    canon = pairs.select(
        F.col("doc_a").alias("u"), F.col("doc_b").alias("w")
    )  # doc_a < doc_b by construction
    tri = wedges.join(canon, ["u", "w"]).agg(
        F.count("*").alias("n_triangles")
    )
    census = pairs.agg(
        F.count("*").cast("long").alias("n_edges"),
    ).crossJoin(
        deg.agg(F.count("*").cast("long").alias("n_vertices"))
    )
    return census.crossJoin(tri).select(
        "n_vertices", "n_edges", F.col("n_triangles").cast("long")
    )


@register(
    "l74_thumbnail_pipeline",
    oracle="""
    WITH d AS (SELECT doc_id, 9 + doc_id % 8 AS w, 9 + doc_id % 6 AS h
               FROM documents),
    yy AS (SELECT doc_id, w, h, unnest(range(0, 8)) AS yy FROM d),
    xx AS (SELECT doc_id, w, h, yy, unnest(range(0, 8)) AS xx FROM yy),
    cc AS (SELECT doc_id, w, h, yy, xx, unnest(range(0, 3)) AS c FROM xx),
    px AS (SELECT doc_id,
                  (doc_id * 31 + (((yy * h) // 8) // 8) * 7
                   + (((xx * w) // 8) // 8) * 13 + c * 11) % 256 AS v
           FROM cc),
    agg AS (SELECT doc_id, CAST(SUM(v) AS BIGINT) AS thumb_sum
            FROM px GROUP BY doc_id)
    SELECT d.doc_id, CAST(d.w AS INTEGER) AS width,
           CAST(d.h AS INTEGER) AS height, agg.thumb_sum
    FROM d JOIN agg USING (doc_id)
    """,
)
def l74_thumbnail_pipeline(spark, sf_dir):
    """End-to-end THUMBNAILING pipeline — the composition a real
    image-ingest job runs, chaining five real codec stages per document:
    deterministic block-constant RGB image -> encode_bmp -> decode_real
    (magic-byte dispatch) -> resize_nearest to 8x8 -> encode_png ->
    decode_png, with bitwise equality between the resized array and the
    PNG round trip asserted in-task.  The emitted thumbnail pixel sum has
    a CLOSED FORM (nearest-neighbor picks source pixel (yy*h//8,
    xx*w//8), whose block determines its value), which the DuckDB oracle
    recomputes from doc_id — so every stage (BMP byte layout, dispatch,
    the resize index map, PNG filters+DEFLATE) is hash-audited through
    one number per doc.

    Scale shape: identical to the other codec rows — per-row
    Arrow-batched compute on the scan, no shuffle; this is the
    decode/transform/re-encode inner loop of a multimodal training-data
    pipeline, exercised over the binary-column plumbing for real."""
    import numpy as np

    def per_batch(batches):
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                w, h = 9 + d % 8, 9 + d % 6
                y, x, c = np.indices((h, w, 3), dtype=np.int64)
                img = (
                    (d * 31 + (y // 8) * 7 + (x // 8) * 13 + c * 11) % 256
                ).astype(np.uint8)
                dec = M.decode_real(M.encode_bmp(img))
                thumb = M.resize_nearest(dec["pixels"], 8, 8)
                back = M.decode_png(M.encode_png(thumb))
                if not np.array_equal(back, thumb):
                    raise ValueError(
                        f"thumbnail PNG round-trip mismatch for doc {d}"
                    )
                rows.append((d, w, h, int(back.astype(np.int64).sum())))
            yield pd.DataFrame(
                rows, columns=["doc_id", "width", "height", "thumb_sum"]
            )

    docs = fanout(T(spark, sf_dir, "documents").select("doc_id"))
    return docs.mapInPandas(
        per_batch, "doc_id long, width int, height int, thumb_sum long"
    )


@register(
    "l13_embed_neardup",
    oracle="""
    SELECT vec_id AS vec_orig, 1.0 AS cos
    FROM embeddings WHERE vec_id < 4
    """,
)
def l13_embed_neardup(spark, sf_dir):
    """Embedding near-dup pairs: 16-plane hyperplane-LSH buckets, exact
    cosine >= 0.9 verify (operators/similarity.py).

    The synthetic corpus contains no cos>=0.9 pairs at small sf, so the raw
    operator output is 0 rows — correct, but a rows-only driver check of an
    empty frame certifies nothing.  The query therefore unions four PLANTED
    probes into the input: exact clones of vec_id 0..3 scaled by 2 under
    fresh negative ids (no collision with real non-negative ids).  Scaling
    preserves every hyperplane sign (sign(2x.h) = sign(x.h)) and cosine
    exactly, so each probe provably lands in its source's bucket and
    verifies at cos 1.0 — the recorded rows ARE the operator's recall on
    known positives, not fixture echoes.  Planted via DataFrame transforms
    on the real table (nothing hand-written), deterministic at every sf.
    Verified invariant: all four probe pairs recalled at cos 1.0, no
    false positives below min_cos (tests/test_dedup_similarity.py
    test_l13_query_emits_planted_probe_pairs)."""
    emb = T(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    probes = emb.filter(F.col("vec_id") < 4).select(
        (-F.col("vec_id") - 1).alias("vec_id"),
        F.transform("embedding", lambda x: x * F.lit(2.0).cast("float")).alias(
            "embedding"
        ),
    )
    pairs = S.hyperplane_lsh_pairs(emb.unionByName(probes))
    # Full-oracle upgrade (round 5, VERDICT r4 item #3): emit the intended
    # (probe, source) pairs only — negative probe ids sort first, so the
    # probe is always vec_a and its source is vec_b == -vec_a-1.  Scaling
    # by 2 leaves cosine at exactly 1.0 after the operator's round(·, 4)
    # (doubling is distributive over the fold, so dot(x,2x) == 2·dot(x,x)
    # and |2x| == 2|x| bitwise), which the oracle states as a literal.  A
    # missed bucket collision drops a row (row-count FAIL); a cosine
    # mis-verify breaks the hash.
    return pairs.filter(
        (F.col("vec_a") < 0) & (F.col("vec_b") == (-F.col("vec_a") - 1).cast("long"))
    ).select(F.col("vec_b").alias("vec_orig"), "cos")


# --------------------------------------------------------- similarity ----


@register(
    "l3_topk_cosine",
    oracle="""
    WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0)
    SELECT e.vec_id,
           round(list_dot_product(CAST(e.embedding AS DOUBLE[]), q.qv)
                 / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
                                          CAST(e.embedding AS DOUBLE[])))
                    * sqrt(list_dot_product(q.qv, q.qv))), 4) AS cos
    FROM embeddings e, q
    ORDER BY cos DESC, e.vec_id LIMIT 10
    """,
)
def l3_topk_cosine(spark, sf_dir):
    """Brute-force top-10 cosine for a stored query vector — the exact ANN
    baseline (broadcast query, scan-parallel, TakeOrderedAndProject)."""
    return S.brute_force_topk(T(spark, sf_dir, "embeddings"), query_vec_id=0, k=10)


@register(
    "l4_knn_join",
    oracle="""
    WITH v AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e
               FROM embeddings),
    p AS (SELECT a.label AS label, a.vec_id AS vec_id, b.vec_id AS neighbor_id,
                 list_dot_product(a.e, b.e)
                   / (sqrt(list_dot_product(a.e, a.e))
                      * sqrt(list_dot_product(b.e, b.e))) AS c
          FROM v a JOIN v b ON a.label = b.label AND a.vec_id <> b.vec_id),
    r AS (SELECT label, vec_id, neighbor_id, c,
                 row_number() OVER (PARTITION BY vec_id
                                    ORDER BY round(c, 4) DESC, neighbor_id)
                   AS rank
          FROM p)
    SELECT CAST(label AS INTEGER) AS label, vec_id, neighbor_id,
           round(c, 4) AS cos, CAST(rank AS INTEGER) AS rank
    FROM r WHERE rank <= 3
    """,
)
def l4_knn_join(spark, sf_dir):
    """Blocked k-NN self-join (float64 numpy matmul per label block via
    applyInPandas), with a full SQL twin (upgraded from rows-only in round
    5): the oracle recomputes every within-label pair's cosine and ranks
    by (round(cos, 4) DESC, neighbor_id) — rank at EMITTED precision
    (round 11), so rank is a pure function of the values the row carries
    and the 1-ulp summation-order skew between numpy's pairwise matmul
    and DuckDB's sequential fold can no longer flip near-tied neighbors
    (it did at the 10x synth: 6/60 000 cells under the raw-cos order;
    l3/l14/l39 already ranked on their rounded cos).  Residual
    cross-engine risk is only a cosine sitting exactly on a 0.00005
    rounding boundary — the same class the emitted-value contract already
    carries.  Exact and rounded ties fall through to the neighbor_id
    tiebreak on both engines; emitted cos is rounded to 4dp (the l14
    contract).  Invariants additionally tested in
    tests/test_dedup_similarity.py test_knn_join_neighbors_within_label."""
    return S.knn_join_blocked(T(spark, sf_dir, "embeddings"), k=3)


@register(
    "l14_ann_ivf",
    oracle="""
    WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings
               WHERE vec_id = 7),
    cells AS (SELECT label, unnest(range(0, 64)) AS dim,
                     unnest(CAST(embedding AS DOUBLE[])) AS x
              FROM embeddings),
    cent AS (SELECT label, dim,
                    CAST(CAST(SUM(CAST(x AS DECIMAL(30,15))) AS STRING) AS DOUBLE)
                    / COUNT(x) AS cx
             FROM cells GROUP BY label, dim),
    cvec AS (SELECT label, list(cx ORDER BY dim) AS centroid FROM cent GROUP BY label),
    probe AS (SELECT label
              FROM cvec CROSS JOIN q
              ORDER BY list_dot_product(centroid, q.qv)
                       / (sqrt(list_dot_product(centroid, centroid))
                          * sqrt(list_dot_product(q.qv, q.qv))) DESC, label
              LIMIT 2),
    cand AS (SELECT e.vec_id, e.label, CAST(e.embedding AS DOUBLE[]) AS v
             FROM embeddings e SEMI JOIN probe p ON e.label = p.label)
    SELECT vec_id, label,
           round(list_dot_product(v, q.qv)
                 / (sqrt(list_dot_product(v, v))
                    * sqrt(list_dot_product(q.qv, q.qv))), 4) AS cos
    FROM cand CROSS JOIN q
    ORDER BY cos DESC, vec_id
    LIMIT 5
    """,
)
def l14_ann_ivf(spark, sf_dir):
    """IVF-style ANN: label-centroid coarse quantizer, nprobe=2 cells,
    exact rerank inside probed cells.  O-tier: unlike the LSH families,
    every step is deterministic — exact-decimal centroids, sequential-fold
    cosine (matches DuckDB list_dot_product order, same contract l3 relies
    on), total (ccos, label) / (cos, vec_id) orderings — so the full probe
    + rerank pipeline has an exact SQL twin.  The oracle's centroid render
    goes DECIMAL -> STRING -> DOUBLE (the dsum_sql hop, ADVICE r9): a
    direct DuckDB DECIMAL(30,15)->DOUBLE cast double-rounds above 2^53
    unscaled, which at scale 15 is |sum| > ~0.009 — the same defect pinned
    in tests/test_invariants.py::test_decimal_render_witness_above_2_53.
    l81's oracle is this one verbatim; l38/l47 share the cent CTE idiom."""
    return S.ivf_topk(T(spark, sf_dir, "embeddings"), query_vec_id=7, k=5, nprobe=2)


@register(
    "l81_ann_ivf_stored",
    oracle="""
    WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings
               WHERE vec_id = 7),
    cells AS (SELECT label, unnest(range(0, 64)) AS dim,
                     unnest(CAST(embedding AS DOUBLE[])) AS x
              FROM embeddings),
    cent AS (SELECT label, dim,
                    CAST(CAST(SUM(CAST(x AS DECIMAL(30,15))) AS STRING) AS DOUBLE)
                    / COUNT(x) AS cx
             FROM cells GROUP BY label, dim),
    cvec AS (SELECT label, list(cx ORDER BY dim) AS centroid FROM cent GROUP BY label),
    probe AS (SELECT label
              FROM cvec CROSS JOIN q
              ORDER BY list_dot_product(centroid, q.qv)
                       / (sqrt(list_dot_product(centroid, centroid))
                          * sqrt(list_dot_product(q.qv, q.qv))) DESC, label
              LIMIT 2),
    cand AS (SELECT e.vec_id, e.label, CAST(e.embedding AS DOUBLE[]) AS v
             FROM embeddings e SEMI JOIN probe p ON e.label = p.label)
    SELECT vec_id, label,
           round(list_dot_product(v, q.qv)
                 / (sqrt(list_dot_product(v, v))
                    * sqrt(list_dot_product(q.qv, q.qv))), 4) AS cos
    FROM cand CROSS JOIN q
    ORDER BY cos DESC, vec_id
    LIMIT 5
    """,
)
def l81_ann_ivf_stored(spark, sf_dir):
    """l14's IVF ANN query served from a PERSISTENT STORED INDEX (VERDICT
    r8 item #3 — the l69 treatment for vectors): sources/bucketed.
    ivf_index_tables materializes the coarse quantizer (exact-decimal
    label centroids) and the cell-PARTITIONED vector assignments as
    catalog tables ONCE per corpus fingerprint; the query probes the
    stored tables with zero quantizer recompute, and the fine scan is
    partition-pruned to the nprobe probed cells (dynamic partition
    pruning off the broadcast probe join — asserted in tests/
    test_plans.py::test_l81_stored_index_plan).  The oracle is l14's
    VERBATIM (same query vector, k, nprobe): a stored index is only an
    index if it returns the exact per-run-build answer.  At 100 TB the
    per-run build l14 demonstrates is the expensive half of ANN — this
    row is the serving path that amortizes it."""
    from google_analytics_dataframes_spark.sources.bucketed import (
        ivf_index_tables,
    )

    centroid_table, cells_table = ivf_index_tables(spark, sf_dir)
    qv = (
        T(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") == 7)
        .select(S.as_double("embedding").alias("qv"))
    )
    return S.ivf_topk_stored(
        spark, centroid_table, cells_table, qv, k=5, nprobe=2
    )


@register(
    "l10_embed_agg",
    oracle="""
    WITH cells AS (
      SELECT label,
             unnest(range(0, 64)) AS dim,
             unnest(CAST(embedding AS DOUBLE[])) AS x
      FROM embeddings)
    SELECT label, CAST(dim AS BIGINT) AS dim,
           round(CAST(CAST(SUM(CAST(x AS DECIMAL(30,15))) AS STRING) AS DOUBLE)
                 / COUNT(x), 9) AS cx
    FROM cells GROUP BY label, dim
    """,
)
def l10_embed_agg(spark, sf_dir):
    """Vector aggregation: per-label centroid cells (exact decimal mean per
    dimension).  Terminal round(9): DuckDB's int128-decimal -> double cast
    can land 1 ulp off Spark's correctly-rounded BigDecimal cast."""
    emb = T(spark, sf_dir, "embeddings")
    return emb.select(
        "label", F.posexplode(S.as_double("embedding")).alias("dim", "x")
    ).groupBy("label", F.col("dim").cast("long").alias("dim")).agg(
        F.round(
            F.sum(F.col("x").cast("decimal(30,15)")).cast("double") / F.count("x"), 9
        ).alias("cx")
    )


# ---------------------------------------------------- text / documents ----


@register(
    "l5_wordcount_tfidf",
    oracle="""
    WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token
                  FROM documents),
    tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
    df AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY 1),
    n AS (SELECT COUNT(*) AS n FROM documents)
    SELECT t.doc_id, t.token, t.tf,
           round(t.tf * ln(CAST(n.n AS DOUBLE) / d.df), 4) AS tfidf
    FROM tf t JOIN df d ON t.token = d.token CROSS JOIN n
    """,
)
def l5_wordcount_tfidf(spark, sf_dir):
    """Tokenize -> word count -> TF-IDF per (doc, term)."""
    return X.tf_idf(T(spark, sf_dir, "documents"))


@register(
    "l6_lang_slice",
    oracle="""
    SELECT lang, source, COUNT(*) AS n_docs,
           (CAST(SUM(CAST(n_chars AS DECIMAL(30,6))) AS DOUBLE) / COUNT(n_chars))
             AS avg_chars,
           MIN(n_chars) AS min_chars, MAX(n_chars) AS max_chars
    FROM documents GROUP BY lang, source
    """,
)
def l6_lang_slice(spark, sf_dir):
    """Per-(lang, source) corpus slice stats — the partition-routing view a
    multilingual pipeline writes `partitionBy(lang)`."""
    from google_analytics_dataframes_spark.queries._util import davg

    return (
        T(spark, sf_dir, "documents")
        .groupBy("lang", "source")
        .agg(
            F.count("*").alias("n_docs"),
            davg("n_chars").alias("avg_chars"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
        )
    )


@register(
    "l7_string_simjoin",
    oracle="""
    WITH en AS (SELECT doc_id, text FROM documents WHERE lang = 'en'),
    toks AS (SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS tok FROM en),
    sizes AS (SELECT doc_id, COUNT(*) AS sz FROM toks GROUP BY doc_id),
    inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
              FROM toks a JOIN toks b ON a.tok = b.tok AND a.doc_id < b.doc_id
              GROUP BY 1, 2)
    SELECT i.doc_a, i.doc_b, i.inter,
           CAST(sa.sz + sb.sz - i.inter AS BIGINT) AS uni,
           (CAST(i.inter AS DOUBLE) / (sa.sz + sb.sz - i.inter)) AS jaccard
    FROM inter i
    JOIN sizes sa ON sa.doc_id = i.doc_a
    JOIN sizes sb ON sb.doc_id = i.doc_b
    WHERE 100 * i.inter >= 40 * (sa.sz + sb.sz - i.inter)
    """,
)
def l7_string_simjoin(spark, sf_dir):
    """Token-set Jaccard similarity join (>=40%) over the English slice via
    inverted-index join (PAPERS.md:6).

    Round 15 (VERDICT r14 item #4): the router's (n_items, vocab) now
    comes from the persisted ``simjoin_token_stats`` catalog row instead
    of per-run probe jobs (persist + count + distinct-limit collect) —
    the corpus is the fingerprinted documents table, so its stats are
    table metadata.  Coverage of the served vocab is enforced in-plan
    (operators/dedup._guarded_masks).  When the stored vocabulary blows
    the bitmask bound (vocab None), fall back to the probe path
    unchanged: the index/prefix strategies re-read the item stream
    multiple times and NEED the probe's persist — stats would skip the
    persist and regress them (measured reasoning in OPTIMIZATION_r15.md)."""
    stats = _simjoin_stats(spark, sf_dir)
    docs = T(spark, sf_dir, "documents").filter(F.col("lang") == "en")
    toks = docs.select(
        "doc_id", F.explode(F.array_distinct(D.tokens("text"))).alias("item")
    )
    # materialize=True: executes eagerly and releases the probe persist —
    # this query is the pipeline's terminal consumer of these pairs.
    out = D.jaccard_pairs(
        toks,
        threshold_pct=40,
        materialize=True,
        stats=(
            {"n_items": stats["n_items"], "vocab": stats["vocab"]}
            if stats["vocab"] is not None
            and len(stats["vocab"]) <= 512  # jaccard_pairs' bitmask bound
            and stats["n_items"] <= 1_000_000
            else None
        ),
    )
    return out.select(
        "doc_a", "doc_b", "inter", F.col("uni").cast("long").alias("uni"), "jaccard"
    )


@register(
    "l8_text_stats",
    oracle="""
    SELECT lang, COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN len(text) = n_chars THEN 0 ELSE 1 END) AS BIGINT)
             AS n_len_mismatch,
           (CAST(SUM(CAST(n_chars AS DECIMAL(30,6))) AS DOUBLE) / COUNT(*)) AS avg_chars,
           (CAST(SUM(CAST(len(string_split(text, ' ')) AS DECIMAL(30,6))) AS DOUBLE)
             / COUNT(*)) AS avg_tokens
    FROM documents GROUP BY lang
    """,
)
def l8_text_stats(spark, sf_dir):
    """Per-lang text stats; `n_len_mismatch` doubles as the built-in golden
    check that n_chars == length(text) (FIXTURES.md)."""
    d = T(spark, sf_dir, "documents")
    return d.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.when(F.length("text") == F.col("n_chars"), 0).otherwise(1))
        .cast("long")
        .alias("n_len_mismatch"),
        (F.sum(F.col("n_chars").cast("decimal(30,6)")).cast("double") / F.count("*")).alias(
            "avg_chars"
        ),
        (
            F.sum(F.size(D.tokens("text")).cast("decimal(30,6)")).cast("double")
            / F.count("*")
        ).alias("avg_tokens"),
    )


@register(
    "l9_classify_udf",
    oracle="""
    WITH f AS (
      SELECT doc_id,
             CAST(len(string_split(text, ' ')) AS DOUBLE) AS n_tok,
             CAST(len(list_filter(string_split(text, ' '),
                    t -> t IN ('slow', 'error', 'fail', 'scan'))) AS DOUBLE) AS n_neg,
             CAST(len(list_filter(string_split(text, ' '),
                    t -> t IN ('fast', 'cache', 'index', 'merge'))) AS DOUBLE) AS n_pos
      FROM documents)
    SELECT doc_id,
           round(1.0 / (1.0 + exp(-( -0.8 + 2.5 * (n_pos / n_tok)
                                    - 2.5 * (n_neg / n_tok)
                                    + 0.3 * ln(1.0 + n_tok)))), 4) AS sentiment
    FROM f
    """,
)
def l9_classify_udf(spark, sf_dir):
    """Model-scoring column: deterministic featurizer + linear-logistic
    scorer inside an Arrow pandas UDF (PAPERS.md:5 sentiment-on-Spark,
    stubbed to a lexicon model — no external deps)."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import DoubleType

    neg, pos = set(X.NEG_WORDS), set(X.POS_WORDS)

    @pandas_udf(DoubleType())
    def sentiment(text: pd.Series) -> pd.Series:
        def score(t: str) -> float:
            toks = t.split(" ")
            n = float(len(toks))
            n_neg = float(sum(tok in neg for tok in toks))
            n_pos = float(sum(tok in pos for tok in toks))
            z = -0.8 + 2.5 * (n_pos / n) - 2.5 * (n_neg / n) + 0.3 * np.log(1.0 + n)
            return round(1.0 / (1.0 + np.exp(-z)), 4)

        return text.map(score)

    return fanout(T(spark, sf_dir, "documents")).select(
        "doc_id", sentiment("text").alias("sentiment")
    )


@register(
    "l15_langid",
    oracle="""
    WITH toks AS (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS token
                  FROM documents),
    counts AS (SELECT lang, token, COUNT(*) AS cnt FROM toks GROUP BY 1, 2),
    prof AS (SELECT lang AS cand_lang, token FROM (
               SELECT lang, token,
                      row_number() OVER (PARTITION BY lang ORDER BY cnt DESC, token)
                        AS rk
               FROM counts) r WHERE rk <= 10),
    dtoks AS (SELECT DISTINCT doc_id, lang, token FROM toks),
    scores AS (SELECT d.doc_id, d.lang, p.cand_lang, COUNT(*) AS overlap
               FROM dtoks d JOIN prof p ON d.token = p.token GROUP BY 1, 2, 3),
    best AS (SELECT *, row_number() OVER (PARTITION BY doc_id
                        ORDER BY overlap DESC, cand_lang) AS rk FROM scores)
    SELECT doc_id, lang, cand_lang AS pred_lang, overlap FROM best WHERE rk = 1
    """,
)
def l15_langid(spark, sf_dir):
    """Heuristic language ID: self-trained top-10-token profiles per lang,
    argmax overlap (deterministic tiebreaks)."""
    return X.language_id(T(spark, sf_dir, "documents"))


@register(
    "l16_quality_score",
    oracle="""
    SELECT doc_id, lang, n_chars,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
           round(CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
                 / len(string_split(text, ' ')), 6) AS ttr,
           round(CAST(len(list_filter(string_split(text, ' '),
                   t -> t IN ('spark','join','filter','window','data',
                              'query','table','row','value','agg'))) AS DOUBLE)
                 / len(string_split(text, ' ')), 6) AS stop_ratio,
           round(CAST(length(regexp_replace(text, '[^a-z]', '', 'g')) AS DOUBLE)
                 / n_chars, 6) AS alpha_ratio,
           round(1.0 / (1.0 + exp(-(
               0.5 * (CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
                      / len(string_split(text, ' ')))
             + 0.3 * ln(1.0 + len(string_split(text, ' ')))
             - 1.5 * (CAST(len(list_filter(string_split(text, ' '),
                        t -> t IN ('spark','join','filter','window','data',
                                   'query','table','row','value','agg'))) AS DOUBLE)
                      / len(string_split(text, ' ')))))), 4) AS quality
    FROM documents
    """,
)
def l16_quality_score(spark, sf_dir):
    """Document quality features + composite logistic score
    (operators/text.py)."""
    return X.quality_scores(T(spark, sf_dir, "documents"))


@register(
    "l17_token_count",
    oracle="""
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS ws_tokens,
           CAST(len(regexp_extract_all(text, '[a-z]{1,4}|[0-9]|[^a-z0-9 ]'))
             AS BIGINT) AS bpe_tokens
    FROM documents
    """,
)
def l17_token_count(spark, sf_dir):
    """Whitespace + BPE-ish-regex token counting."""
    return X.token_counts(T(spark, sf_dir, "documents"))


@register(
    "l18_fingerprint",
    oracle="""
    SELECT doc_id,
           CASE WHEN len(string_split(text, ' ')) >= 3
                THEN list_min(list_transform(
                       range(1, len(string_split(text, ' ')) - 1),
                       i -> md5(concat_ws(' ', string_split(text, ' ')[i],
                                               string_split(text, ' ')[i+1],
                                               string_split(text, ' ')[i+2]))))
                ELSE md5(text) END AS fingerprint
    FROM documents
    """,
)
def l18_fingerprint(spark, sf_dir):
    """Rolling-hash fingerprint: min md5 over 3-word shingles."""
    return X.fingerprints(T(spark, sf_dir, "documents"))


# ----------------------------------------------------------- multimodal ----


@register(
    "l19_multimodal_stub",
    oracle="""
    WITH pos AS (SELECT doc_id, text, unnest(range(1, len(text) + 1)) AS p
                 FROM documents),
    sums AS (SELECT doc_id, SUM(ord(substr(text, CAST(p AS INTEGER), 1))) AS s
             FROM pos GROUP BY doc_id)
    SELECT d.doc_id, CAST(len(d.text) AS BIGINT) AS n_bytes,
           CAST(CASE WHEN len(d.text) = 0 THEN -1
                     ELSE ord(substr(d.text, 1, 1)) END AS INTEGER) AS first_byte,
           CAST(COALESCE(s.s, 0) % 997 AS BIGINT) AS checksum
    FROM documents d LEFT JOIN sums s USING (doc_id)
    """,
)
def l19_multimodal_stub(spark, sf_dir):
    """Multimodal plumbing: text -> binary blob + metadata struct ->
    Arrow-batched 'decode' (deterministic fake features; real codec point
    stubbed with NotImplementedError — operators/multimodal.py).  O-tier:
    the corpus is pure ASCII, so the fake byte-features (length, first
    byte, mod-997 byte checksum) have exact SQL twins over code points —
    the oracle checks the whole blob->Arrow->features pipeline per doc."""
    blobs = M.to_multimodal(T(spark, sf_dir, "documents"))
    return M.fake_decode_features(blobs)


# --------------------------------------- training-data filters (C4/Gopher) ----


@register(
    "l20_repetition",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks, text
               FROM documents),
    sh AS (SELECT doc_id,
                  CASE WHEN len(toks) >= 3
                       THEN list_transform(range(1, len(toks) - 1),
                              i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))
                       ELSE [text] END AS s
           FROM t)
    SELECT doc_id,
           CAST(len(s) AS BIGINT) AS n_shingles,
           CAST(len(list_distinct(s)) AS BIGINT) AS n_distinct,
           round(CAST(len(s) - len(list_distinct(s)) AS DOUBLE) / len(s), 6)
             AS dup_ratio
    FROM sh
    """,
)
def l20_repetition(spark, sf_dir):
    """Within-doc duplicate-shingle fraction (Gopher/C4 repetition filter
    signal; operators/text.py repetition_stats)."""
    return X.repetition_stats(T(spark, sf_dir, "documents"))


@register(
    "l21_pii_scan",
    oracle="""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '[a-z0-9]+@[a-z0-9]+\\.[a-z]+'))
             AS BIGINT) AS emails,
           CAST(len(regexp_extract_all(text, '[0-9]{3}-[0-9]{3}-[0-9]{4}'))
             AS BIGINT) AS phones,
           CAST(len(regexp_extract_all(text, '[0-9]+\\.[0-9]+\\.[0-9]+\\.[0-9]+'))
             AS BIGINT) AS ipv4s,
           (len(regexp_extract_all(text, '[a-z0-9]+@[a-z0-9]+\\.[a-z]+'))
            + len(regexp_extract_all(text, '[0-9]{3}-[0-9]{3}-[0-9]{4}'))
            + len(regexp_extract_all(text, '[0-9]+\\.[0-9]+\\.[0-9]+\\.[0-9]+')))
             > 0 AS any_pii
    FROM documents
    """,
)
def l21_pii_scan(spark, sf_dir):
    """PII-looking span counts per doc (email/phone/IPv4 regexes identical
    under Java regex and RE2; operators/text.py pii_scan)."""
    return X.pii_scan(T(spark, sf_dir, "documents"))


@register(
    "l41_pii_redact",
    oracle="""
    SELECT doc_id,
           regexp_replace(regexp_replace(regexp_replace(text,
               '[a-z0-9]+@[a-z0-9]+\\.[a-z]+', '[EMAIL]', 'g'),
               '[0-9]{3}-[0-9]{3}-[0-9]{4}', '[PHONE]', 'g'),
               '[0-9]+\\.[0-9]+\\.[0-9]+\\.[0-9]+', '[IP]', 'g') AS redacted
    FROM documents
    """,
)
def l41_pii_redact(spark, sf_dir):
    """l21's apply side: every PII-looking span replaced with its type mask
    (operators/text.py pii_redact) — the redaction pass that runs between
    scan and training.  Masks contain no digits/@ so the chained patterns
    cannot re-match inside an earlier replacement; oracle is the identical
    regex chain under DuckDB's RE2 with the 'g' flag."""
    return X.pii_redact(T(spark, sf_dir, "documents"))


@register(
    "l40_compression_ratio",
    oracle="""
    WITH base AS (SELECT doc_id,
                         CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
                  FROM documents),
    probes(doc_id, n_bytes) AS (VALUES
        (CAST(-1 AS BIGINT), CAST(4000 AS BIGINT)),
        (CAST(-2 AS BIGINT), CAST(1280 AS BIGINT)))
    SELECT doc_id, n_bytes, TRUE AS band_ok
    FROM (SELECT * FROM base UNION ALL SELECT * FROM probes)
    """,
)
def l40_compression_ratio(spark, sf_dir):
    """zlib compression ratio per doc (operators/text.py compression_ratio)
    — the redundancy-based quality filter (repetitive/templated text
    compresses far below natural prose).  DuckDB has no codec, so the query
    emits a BAND AUDIT the driver can hash (upgraded from rows-only in
    round 5): every corpus doc's exact byte length plus a flag asserting
    its ratio landed in the ASCII-text band (0, 1.2], and two PLANTED
    EXTREME PROBES — 'ab'x2000 (must compress below 0.3; measured 0.007)
    and a 1280-char sha256-hex chain (near-incompressible, must stay above
    0.45; measured 0.561) — that pin the codec's direction at both ends.
    Any zlib-path regression (wrong level, truncation, encoding bug) flips
    a flag or shifts n_bytes and fails the value hash; the raw per-doc
    ratio surface remains available via the operator API.  zlib at a fixed
    level is bit-deterministic, so the bands are stable across
    runs/partitionings (tests/test_invariants.py
    test_compression_ratio_bounds_and_ordering)."""
    import hashlib

    rep = "ab" * 2000
    hx = "".join(
        hashlib.sha256(f"seed{i}".encode()).hexdigest() for i in range(20)
    )
    probes = spark.createDataFrame(
        [(-1, rep), (-2, hx)], "doc_id long, text string"
    )
    docs = (
        T(spark, sf_dir, "documents").select("doc_id", "text").unionByName(probes)
    )
    rat = X.compression_ratio(docs)
    band_ok = (
        F.when(F.col("doc_id") == -1, F.col("zlib_ratio") < 0.3)
        .when(F.col("doc_id") == -2, F.col("zlib_ratio") > 0.45)
        .otherwise((F.col("zlib_ratio") > 0) & (F.col("zlib_ratio") <= 1.2))
    )
    return rat.select("doc_id", "n_bytes", band_ok.alias("band_ok"))


@register(
    "l22_hash_split",
    oracle="""
    WITH b AS (SELECT doc_id,
                      try_cast(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))
                               AS BIGINT) % 100 AS bucket
               FROM documents)
    SELECT doc_id, bucket,
           CASE WHEN bucket < 80 THEN 'train'
                WHEN bucket < 90 THEN 'val'
                ELSE 'test' END AS split
    FROM b
    """,
)
def l22_hash_split(spark, sf_dir):
    """Deterministic 80/10/10 train/val/test split by md5(doc_id) bucket —
    re-shard- and append-stable, engine-independent (operators/text.py
    hash_split)."""
    return X.hash_split(T(spark, sf_dir, "documents"))


@register(
    "l23_mixture_sample",
    oracle="""
    WITH b AS (
      SELECT doc_id, source, lang,
             try_cast(concat('0x',
               substr(md5(concat('mix1', CAST(doc_id AS VARCHAR))), 1, 4))
               AS BIGINT) % 100 AS bucket
      FROM documents)
    SELECT source, COUNT(*) AS kept
    FROM b
    WHERE bucket < (CASE source WHEN 'src0' THEN 100 WHEN 'src1' THEN 50
                                WHEN 'src2' THEN 10 ELSE 25 END)
    GROUP BY source
    """,
)
def l23_mixture_sample(spark, sf_dir):
    """Deterministic corpus-mixture sampling (curriculum weighting): per-
    source keep rates decided by a salted md5 bucket of doc_id — stable
    across runs, engines, re-sharding and appends
    (operators/sampling.py weighted_sample)."""
    from google_analytics_dataframes_spark.operators.sampling import weighted_sample

    docs = T(spark, sf_dir, "documents")
    kept = weighted_sample(
        docs,
        slice_col="source",
        weights={"src0": 1.0, "src1": 0.5, "src2": 0.1},
        default_weight=0.25,
        key_col="doc_id",
        salt="mix1",
    )
    return kept.groupBy("source").agg(F.count("*").alias("kept"))


@register(
    "l24_stratified_sample",
    oracle="""
    WITH n AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_total
               FROM documents
               WHERE lang IN ('en', 'de', 'fr', 'es', 'zh')
               GROUP BY lang),
    p AS (SELECT lang, n_total,
                 CASE lang WHEN 'en' THEN 0.5 WHEN 'de' THEN 0.2
                           WHEN 'fr' THEN 0.2 WHEN 'es' THEN 0.2
                           ELSE 0.1 END AS frac
          FROM n)
    SELECT lang, n_total,
           CAST(GREATEST(floor(n_total * frac
                   - 5 * sqrt(n_total * frac * (1 - frac)) - 1), 0) AS BIGINT)
             AS lo,
           CAST(ceil(n_total * frac
                   + 5 * sqrt(n_total * frac * (1 - frac)) + 1) AS BIGINT)
             AS hi,
           1 AS within
    FROM p
    """,
)
def l24_stratified_sample(spark, sf_dir):
    """Native seeded per-stratum Bernoulli sampling (sampleBy), emitted as
    a TOLERANCE-BOUND AUDIT so the driver can hash-check it (upgraded
    from rows-only in round 5, VERDICT r4 item #3).  The engine RNG's
    exact keep-set is partitioning-dependent, so the raw sample can't be
    oracled; what CAN be is the binomial envelope: per stratum the query
    emits the source count, the [np - 5σ - 1, np + 5σ + 1] bounds, and an
    integer flag that the realized sample count landed inside them
    (P[violation] < 1e-6 per stratum for ANY seed realization).  The
    oracle recomputes the totals and bounds from the same table with the
    same formula — identical doubles, identical floor/ceil — and states
    within = 1, so a broken sampler (rate drift, dropped stratum,
    double-sampling) breaks the hash.  The deterministic sampling path
    remains l23; subset/reproducibility invariants stay in
    tests/test_invariants.py."""
    from google_analytics_dataframes_spark.operators.sampling import stratified_sample

    fracs = {"en": 0.5, "de": 0.2, "fr": 0.2, "es": 0.2, "zh": 0.1}
    docs = T(spark, sf_dir, "documents")
    kept = (
        stratified_sample(docs, "lang", fracs)
        .groupBy("lang")
        .agg(F.count("*").alias("kept"))
    )
    totals = (
        docs.filter(F.col("lang").isin(*fracs))
        .groupBy("lang")
        .agg(F.count("*").alias("n_total"))
    )
    frac = F.when(F.col("lang") == "en", 0.5).when(F.col("lang") == "zh", 0.1).otherwise(0.2)
    mu = F.col("n_total") * frac
    sigma = F.sqrt(F.col("n_total") * frac * (1 - frac))
    lo = F.greatest(F.floor(mu - 5 * sigma - 1), F.lit(0).cast("long")).cast("long")
    hi = F.ceil(mu + 5 * sigma + 1).cast("long")
    return (
        totals.join(kept, "lang", "left")
        .withColumn("kept", F.coalesce("kept", F.lit(0)))
        .select(
            "lang",
            "n_total",
            lo.alias("lo"),
            hi.alias("hi"),
            ((F.col("kept") >= lo) & (F.col("kept") <= hi))
            .cast("int")
            .alias("within"),
        )
    )


@register(
    "l25_multimodal_resize",
    oracle="""
    WITH j AS (SELECT doc_id, text, unnest(range(0, 64)) AS j FROM documents),
    px AS (SELECT doc_id, j,
                  CASE WHEN len(text) = 0 THEN 0
                       ELSE ord(substr(text,
                                CAST((j * len(text)) // 64 + 1 AS INTEGER), 1))
                  END AS b
           FROM j)
    SELECT doc_id, CAST(8 AS INTEGER) AS width, CAST(8 AS INTEGER) AS height,
           CAST(64 AS BIGINT) AS n_bytes, CAST(SUM(b) % 997 AS BIGINT) AS px_checksum
    FROM px GROUP BY doc_id
    """,
)
def l25_multimodal_resize(spark, sf_dir):
    """Multimodal resize plumbing: blob -> fixed 8x8 byte payload via
    strided sampling (real PIL resize stubbed; operators/multimodal.py).
    O-tier: the corpus is pure ASCII, so the oracle recomputes the strided
    sample positions `(j*size)//64` over code points and checks the payload
    size AND the mod-997 checksum of the sampled bytes per doc — the
    sampling arithmetic itself is driver-verified, not just cardinality."""
    blobs = M.to_multimodal(T(spark, sf_dir, "documents"))
    out = M.fake_resize(blobs)
    return out.select(
        "doc_id",
        "width",
        "height",
        F.octet_length("pixels").cast("long").alias("n_bytes"),
        "px_checksum",
    )


@register(
    "l26_multimodal_frames",
    oracle="""
    SELECT doc_id, CAST((len(text) // 16 + 3) // 4 AS BIGINT) AS n_frames
    FROM documents WHERE len(text) >= 16
    """,
)
def l26_multimodal_frames(spark, sf_dir):
    """Multimodal frame sampling plumbing: blob -> every-4th 16-byte frame,
    one row per frame (the fan-out shape of a real ffmpeg sampler).
    O-tier: per-doc sampled-frame count has a closed form over the ASCII
    byte length — ceil((len//16)/4) for docs with at least one frame — so
    the fan-out cardinality is driver-verified per doc.

    Round 11: REAL video legs run in-task alongside the plumbing — per
    doc, (3 + id % 5) deterministic 4x3 RGB frames are encoded as an
    uncompressed-DIB AVI (operators/multimodal.encode_avi), decoded
    back, and every-2nd-frame sampling is asserted bitwise; a second
    Motion-JPEG leg round-trips constant-gray frames through the
    container's own JPEG codec EXACTLY (DC-only blocks survive
    quantization, the l67 channel).  Any container or codec regression
    kills the row and the driver's row count.  The emitted columns and
    the oracle are unchanged (inter-frame video codecs remain the
    declared seam)."""
    import numpy as np

    blobs = M.to_multimodal(T(spark, sf_dir, "documents"))
    frames = M.fake_frame_sample(blobs)
    counts = frames.groupBy("doc_id").agg(F.count("*").alias("n_frames"))

    def avi_leg(batches):
        for pdf in batches:
            for doc_id, nf in zip(pdf["doc_id"], pdf["n_frames"]):
                d = int(doc_id)
                k = 3 + d % 5
                f, y, x, c = np.indices((k, 3, 4, 3), dtype=np.int64)
                vid = ((d * 17 + f * 29 + y * 7 + x * 3 + c * 11) % 256).astype(
                    np.uint8
                )
                dec = M.decode_avi(M.encode_avi(vid, fps=10))
                if dec["n_frames"] != k or not np.array_equal(
                    dec["frames"][::2], vid[::2]
                ):
                    raise ValueError(f"AVI round-trip mismatch for doc {d}")
                # Motion-JPEG leg (round 11): constant-gray frames are
                # DC-only and R=G=B (Cb=Cr=128), so the lossy codec is
                # bit-exact here — any MJPG regression kills the row.
                # Runs on a deterministic 1-in-101 doc subset: the full
                # JPEG pipeline costs ~0.15 ms/frame, so per-doc it
                # would dominate the query (35 s at sf0.1 measured);
                # the subset keeps cost proportional at every scale
                # while still failing the driver's row count on any
                # codec regression (~50 docs at sf0.01).
                if d % 101 == 0:
                    gv = ((d * 37 + np.arange(k) * 11) % 256).astype(
                        np.uint8
                    )
                    mj = np.broadcast_to(
                        gv[:, None, None, None], (k, 3, 4, 3)
                    ).copy()
                    mdec = M.decode_avi(
                        M.encode_avi(mj, fps=10, codec="MJPG")
                    )
                    if mdec["n_frames"] != k or not np.array_equal(
                        mdec["frames"], mj
                    ):
                        raise ValueError(
                            f"MJPG round-trip mismatch for doc {d}"
                        )
            yield pdf

    return counts.mapInPandas(avi_leg, "doc_id long, n_frames long")


@register(
    "l63_bmp_roundtrip",
    oracle="""
    WITH d AS (SELECT doc_id, 4 + doc_id % 5 AS w, 3 + doc_id % 7 AS h
               FROM documents),
    ys AS (SELECT doc_id, w, h, unnest(range(0, h)) AS y FROM d),
    xs AS (SELECT doc_id, w, h, y, unnest(range(0, w)) AS x FROM ys),
    cs AS (SELECT doc_id, w, h, y, x, unnest(range(0, 3)) AS c FROM xs),
    s AS (SELECT doc_id, w, h,
                 CAST(SUM((doc_id * 31 + y * 7 + x * 3 + c * 11) % 256)
                      AS BIGINT) AS px_sum
          FROM cs GROUP BY doc_id, w, h)
    SELECT doc_id, CAST(w AS INTEGER) AS width, CAST(h AS INTEGER) AS height,
           CAST(54 + h * (((3 * w + 3) // 4) * 4) AS BIGINT) AS n_bytes,
           px_sum
    FROM s
    """,
)
def l63_bmp_roundtrip(spark, sf_dir):
    """REAL image-codec round trip through the engine (round-6 upgrade of
    the multimodal seam, VERDICT r5 item #7): per document, build a
    deterministic doc_id-keyed RGB image (width 4+id%5, height 3+id%7,
    pixel (y,x,c) = (id*31 + y*7 + x*3 + c*11) mod 256), ENCODE it as an
    actual 24-bit BMP byte stream (54-byte header, bottom-up BGR rows,
    4-byte padding — operators/multimodal.encode_bmp), DECODE it back
    with the pure-numpy decoder behind decode_real, and require bitwise
    pixel equality in-task (a decode regression kills the row, failing
    the driver's row count).  Emitted per doc: the decoded dimensions,
    the BMP file size, and the decoded-pixel sum — all of which the
    DuckDB oracle recomputes ANALYTICALLY from doc_id (file size includes
    the spec's row padding: 54 + h*ceil4(3w)), so the driver hash checks
    the byte layout and the decoded values against closed forms, not
    against the code under test.

    Scale shape: pure per-row Arrow-batched compute on the scan — no
    shuffle, no driver involvement; the same shape a real thumbnailing /
    feature-extraction pass has over a binary image column.  A second
    leg (round 11) runs the SAME image through the baseline TIFF codec
    in all four lossless compressions (uncompressed IFD walk, LZW,
    PackBits, Deflate) and requires bitwise equality — TIFF's IFD walk
    is structurally unlike BMP's fixed header, so the legs fail
    independently.  Emitted columns and the oracle are unchanged.
    (JPEG/PNG/GIF round-trip in their own queries l67/l64/l72; TIFF's
    predictor/planar/tiled/JPEG-strip layouts are pinned by
    tests/test_invariants.py fixtures; CCITT and JPEGTables streams
    stay the declared seams.)"""
    import numpy as np

    def per_batch(batches):
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                w, h = 4 + d % 5, 3 + d % 7
                y, x, c = np.indices((h, w, 3), dtype=np.int64)
                img = ((d * 31 + y * 7 + x * 3 + c * 11) % 256).astype(
                    np.uint8
                )
                bmp = M.encode_bmp(img)
                dec = M.decode_real(bmp)
                if not np.array_equal(dec["pixels"], img):
                    raise ValueError(
                        f"BMP round-trip mismatch for doc {d}"
                    )
                # TIFF leg (round 11): same image through the baseline
                # TIFF codec in every compression this container
                # implements (uncompressed IFD walk + LZW + PackBits +
                # Deflate strips — per-doc images are ~100 bytes, so
                # the three extra kernels cost microseconds) — any
                # IFD/strip/entropy regression kills the row; columns
                # and oracle unchanged
                tdec = M.decode_real(M.encode_tiff(img))
                if not np.array_equal(tdec["pixels"], img):
                    raise ValueError(
                        f"TIFF round-trip mismatch for doc {d}"
                    )
                for ck in ("packbits", "lzw", "deflate"):
                    if not np.array_equal(
                        M.decode_tiff(M.encode_tiff(img, compression=ck)),
                        img,
                    ):
                        raise ValueError(
                            f"TIFF {ck} round-trip mismatch for doc {d}"
                        )
                rows.append((d, w, h, len(bmp), int(img.sum())))
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "width", "height", "n_bytes", "px_sum"],
            )

    docs = fanout(T(spark, sf_dir, "documents").select("doc_id"))
    return docs.mapInPandas(
        per_batch,
        "doc_id long, width int, height int, n_bytes long, px_sum long",
    )


@register(
    "l64_png_roundtrip",
    oracle="""
    WITH d AS (SELECT doc_id, 4 + doc_id % 6 AS w, 3 + doc_id % 5 AS h
               FROM documents),
    ys AS (SELECT doc_id, w, h, unnest(range(0, h)) AS y FROM d),
    xs AS (SELECT doc_id, w, h, y, unnest(range(0, w)) AS x FROM ys),
    cs AS (SELECT doc_id, w, h, y, x, unnest(range(0, 3)) AS c FROM xs),
    s AS (SELECT doc_id, w, h,
                 CAST(SUM((doc_id * 37 + y * 11 + x * 5 + c * 13) % 256)
                      AS BIGINT) AS px_sum
          FROM cs GROUP BY doc_id, w, h)
    SELECT doc_id, CAST(w AS INTEGER) AS width, CAST(h AS INTEGER) AS height,
           CAST(w * h * 3 AS BIGINT) AS n_px,
           CAST(LEAST(h, 5) AS INTEGER) AS n_filters,
           px_sum
    FROM s
    """,
)
def l64_png_roundtrip(spark, sf_dir):
    """REAL PNG round trip through the engine (VERDICT r6 item #6, the
    second real codec behind the multimodal seam): per document, build a
    deterministic doc_id-keyed RGB image (width 4+id%6, height 3+id%5,
    pixel (y,x,c) = (id*37 + y*11 + x*5 + c*13) mod 256), ENCODE it as an
    actual PNG byte stream — CRC-checked chunks, zlib DEFLATE, and a
    ROTATING scanline filter (y % 5: None/Sub/Up/Average/Paeth) so every
    un-filter path executes — then DECODE it back with the stdlib-zlib +
    numpy decoder behind decode_real and require bitwise pixel equality
    in-task (operators/multimodal.encode_png/decode_png).

    Oracle exactness: PNG's DEFLATE stream has no closed-form byte size,
    so unlike l63 the file size is NOT emitted; instead the driver checks
    the decoded dimensions, pixel count, the count of distinct filter
    types exercised (min(h,5) — heights run 3..7, so Paeth rows exist for
    h>=5 docs), and the decoded-pixel sum, all recomputed ANALYTICALLY
    from doc_id by the DuckDB oracle.  A decode or un-filter regression
    kills the row in-task, failing the driver's row count.

    Scale shape: identical to l63 — pure per-row Arrow-batched compute on
    the scan, no shuffle, no driver involvement.  JPEG stays an honest
    NotImplementedError seam (entropy coding needs codec libs)."""
    import numpy as np

    def per_batch(batches):
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                w, h = 4 + d % 6, 3 + d % 5
                y, x, c = np.indices((h, w, 3), dtype=np.int64)
                img = ((d * 37 + y * 11 + x * 5 + c * 13) % 256).astype(
                    np.uint8
                )
                png = M.encode_png(img)
                dec = M.decode_real(png)
                if not np.array_equal(dec["pixels"], img):
                    raise ValueError(
                        f"PNG round-trip mismatch for doc {d}"
                    )
                # round 11: the Adam7 and 16-bit paths execute IN-TASK on
                # the same per-doc image (alternating interlace by doc
                # parity); any regression kills the row and with it the
                # driver's row-count check — the emitted columns and the
                # oracle are unchanged.
                if not np.array_equal(
                    M.decode_png(M.encode_png(img, interlace=True)), img
                ):
                    raise ValueError(f"Adam7 round-trip mismatch for doc {d}")
                img16 = (img.astype(np.uint16) << 8) | (d % 256)
                if not np.array_equal(
                    M.decode_png(M.encode_png(img16, interlace=d % 2 == 0)),
                    img16,
                ):
                    raise ValueError(f"PNG16 round-trip mismatch for doc {d}")
                n_filters = len({yy % 5 for yy in range(h)})
                rows.append(
                    (d, w, h, w * h * 3, n_filters, int(img.sum()))
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "width", "height", "n_px", "n_filters",
                    "px_sum",
                ],
            )

    docs = fanout(T(spark, sf_dir, "documents").select("doc_id"))
    return docs.mapInPandas(
        per_batch,
        "doc_id long, width int, height int, n_px long, n_filters int, "
        "px_sum long",
    )


@register(
    "l67_jpeg_roundtrip",
    oracle="""
    WITH d AS (SELECT doc_id, 9 + doc_id % 8 AS w, 9 + doc_id % 6 AS h
               FROM documents),
    bys AS (SELECT doc_id, w, h, unnest(range(0, (h + 7) // 8)) AS by FROM d),
    bxs AS (SELECT doc_id, w, h, by, unnest(range(0, (w + 7) // 8)) AS bx
            FROM bys),
    px AS (SELECT doc_id,
                  CAST(SUM(((doc_id * 31 + by * 7 + bx * 13) % 256)
                       * LEAST(8, w - 8 * bx) * LEAST(8, h - 8 * by))
                       AS BIGINT) AS px_sum
           FROM bxs GROUP BY doc_id),
    cb AS (SELECT doc_id, unnest(range(0, 3)) AS b FROM documents),
    dc AS (SELECT doc_id,
                  CAST(SUM(((doc_id * 53 + b * 29) % 256) - 128) AS BIGINT)
                    AS dc_sum
           FROM cb GROUP BY doc_id),
    ck AS (SELECT doc_id, b, unnest(range(1, 64)) AS k FROM cb),
    ac AS (SELECT doc_id,
                  CAST(SUM(CASE WHEN (doc_id + b + k) % 7 = 0
                       THEN ((doc_id * 131 + b * 17 + k * 11) % 19) - 9
                       ELSE 0 END) AS BIGINT) AS ac_sum
           FROM ck GROUP BY doc_id)
    SELECT d.doc_id, CAST(d.w AS INTEGER) AS width,
           CAST(d.h AS INTEGER) AS height,
           px.px_sum, dc.dc_sum + ac.ac_sum AS coeff_sum
    FROM d JOIN px USING (doc_id) JOIN dc USING (doc_id)
           JOIN ac USING (doc_id)
    """,
)
def l67_jpeg_roundtrip(spark, sf_dir):
    """REAL baseline-JPEG round trip through the engine (VERDICT r7 item
    #3, closing the last major-format multimodal gap): two exactness
    channels per document, both verified in-task and both recomputed
    ANALYTICALLY from doc_id by the DuckDB oracle.

    1. PIXEL channel — JPEG is lossy in general, but a flat 8x8 block has
       only a DC coefficient, and with the default table's DC step 8 the
       coefficient 8*(v-128) quantizes exactly, so the FULL pipeline
       (level shift, FDCT, quantize, zigzag, DC-predicted Huffman coding
       with byte stuffing, marker framing, then the whole decoder in
       reverse) is bit-exact for block-constant images.  Per doc: width
       9+id%8, height 9+id%6 (NON-multiples of 8, so edge-replication
       padding executes), block (by,bx) = (id*31+by*7+bx*13) mod 256;
       encode_jpeg -> decode_jpeg must return the identical array, and
       the decoded pixel sum = sum of v * visible-block-area has a closed
       form the oracle recomputes.
    2. COEFFICIENT channel — the entropy layer (canonical Huffman, run
       lengths, ZRL, magnitude categories, DC differences across blocks,
       0xFF stuffing) is exactly invertible even where pixels are not:
       per doc, 3 blocks of sparse quantized coefficients (DC
       (id*53+b*29)%256-128; AC at zigzag k iff (id+b+k)%7=0, value
       (id*131+b*17+k*11)%19-9) go through encode_jpeg_coeffs ->
       decode_jpeg(return_coeffs=True) and must match integer-for-
       integer; the decoded coefficient sum has a closed form.

    A regression anywhere in the codec kills the row in-task (failing the
    driver's row count) or moves px_sum/coeff_sum off the closed form
    (failing the value hash).  Scale shape: identical to l63/l64 — pure
    per-row Arrow-batched compute on the scan, no shuffle, no driver
    involvement.  4:2:0 chroma subsampling decodes for real since round 9
    (tests/test_invariants.py round-trips a planted 4:2:0 fixture
    exactly); progressive JPEG and sampling factors above 2 stay honest
    NotImplementedError seams (operators/multimodal.decode_jpeg)."""
    import numpy as np

    def per_batch(batches):
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                w, h = 9 + d % 8, 9 + d % 6
                y, x = np.indices((h, w), dtype=np.int64)
                img = ((d * 31 + (y // 8) * 7 + (x // 8) * 13) % 256).astype(
                    np.uint8
                )
                jp = M.encode_jpeg(img)
                dec = M.decode_jpeg(jp)
                if not np.array_equal(dec, img):
                    raise ValueError(
                        f"JPEG pixel round-trip mismatch for doc {d}"
                    )
                blocks = np.zeros((1, 3, 64), np.int32)
                for b in range(3):
                    blocks[0, b, 0] = ((d * 53 + b * 29) % 256) - 128
                    for k in range(1, 64):
                        if (d + b + k) % 7 == 0:
                            blocks[0, b, k] = (
                                (d * 131 + b * 17 + k * 11) % 19
                            ) - 9
                jp2 = M.encode_jpeg_coeffs(blocks, 24, 8)
                _px, coeffs = M.decode_jpeg(jp2, return_coeffs=True)
                if not np.array_equal(coeffs[0], blocks):
                    raise ValueError(
                        f"JPEG coefficient round-trip mismatch for doc {d}"
                    )
                rows.append(
                    (d, w, h, int(dec.sum()), int(coeffs[0].sum()))
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "width", "height", "px_sum", "coeff_sum"],
            )

    docs = fanout(T(spark, sf_dir, "documents").select("doc_id"))
    return docs.mapInPandas(
        per_batch,
        "doc_id long, width int, height int, px_sum long, coeff_sum long",
    )


@register(
    "l68_wav_roundtrip",
    oracle="""
    WITH d AS (SELECT doc_id, 64 + doc_id % 37 AS n,
                      8000 + 100 * (doc_id % 5) AS rate
               FROM documents),
    i AS (SELECT doc_id, n, rate, unnest(range(0, n)) AS i FROM d),
    s AS (SELECT doc_id, i, ((doc_id * 13 + i * 7) % 2048) - 1024 AS v
          FROM i),
    agg AS (SELECT doc_id,
                   CAST(SUM(v) AS BIGINT) AS amp_sum,
                   CAST(SUM(v * v) AS BIGINT) AS energy_sum,
                   CAST(SUM(CASE WHEN i > 0 AND
                        ((((doc_id * 13 + (i - 1) * 7) % 2048) - 1024 < 0)
                         <> (v < 0)) THEN 1 ELSE 0 END) AS BIGINT)
                     AS zero_cross
            FROM s GROUP BY doc_id)
    SELECT d.doc_id, CAST(d.n AS BIGINT) AS n_samples,
           CAST(d.rate AS INTEGER) AS sample_rate,
           CAST(44 + 2 * d.n AS BIGINT) AS n_bytes,
           agg.amp_sum, agg.energy_sum, agg.zero_cross
    FROM d JOIN agg USING (doc_id)
    """,
)
def l68_wav_roundtrip(spark, sf_dir):
    """REAL audio-codec round trip (the cheap same-pattern follow-on to
    l67 that VERDICT r7 item #3 named): per document, synthesize a
    deterministic int16 PCM waveform (n = 64+id%37 samples at rate
    8000+100*(id%5), s[i] = (id*13 + i*7) mod 2048 - 1024), ENCODE it as
    an actual RIFF/WAVE byte stream (operators/multimodal.encode_wav),
    DECODE it back and require bitwise sample equality in-task — WAV is
    lossless, so unlike l67 no flat-block trick is needed.  Emitted per
    doc: sample count, rate, the canonical mono-PCM16 file size
    (44 + 2n — checks the header byte layout), and three audio features
    computed FROM THE DECODED SAMPLES — amplitude sum, energy (sum of
    squares), and zero-crossing count (sign-change census, the classic
    cheap voice-activity feature) — all of which the DuckDB oracle
    recomputes ANALYTICALLY from doc_id, so a codec bug that perturbs any
    sample moves a feature off its closed form and hash-fails the row.

    Scale shape: identical to l63/l64/l67 — per-row Arrow-batched compute
    on the scan, no shuffle.  Four lossy codec legs (round 11) run
    in-task on the same per-doc signal under tracking bounds: IMA ADPCM
    (0x11), MS ADPCM (2), and G.711 mu-law/A-law (7/6, bounds = the
    exhaustive-domain ceilings 644/512); non-PCM formats beyond those
    raise the honest NotImplementedError (decode_wav).  Video decodes
    for real too (encode_avi/decode_avi DIB + Motion-JPEG, exercised
    in-task by l26); inter-frame video codecs remain the seam."""
    import numpy as np

    def per_batch(batches):
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                n = 64 + d % 37
                rate = 8000 + 100 * (d % 5)
                i = np.arange(n, dtype=np.int64)
                s = (((d * 13 + i * 7) % 2048) - 1024).astype(np.int16)
                wav = M.encode_wav(s, rate)
                dec = M.decode_wav(wav)
                if (
                    dec["sample_rate"] != rate
                    or dec["n_channels"] != 1
                    or not np.array_equal(dec["samples"][:, 0], s)
                ):
                    raise ValueError(
                        f"WAV round-trip mismatch for doc {d}"
                    )
                # round 11: the IMA ADPCM path executes IN-TASK on the
                # same per-doc signal (lossy codec -> tracking-bound
                # assertion + exact length/rate; any structural
                # regression kills the row and the driver's row count).
                # The emitted columns and the oracle are unchanged.
                for enc, tag, bound in (
                    (M.encode_wav_adpcm, "IMA ADPCM", 2100),
                    (M.encode_wav_ms_adpcm, "MS ADPCM", 2100),
                    # G.711 (round 11): the exhaustive-domain ceilings
                    # from tests/test_invariants.py — mu 644, A 512
                    (M.encode_wav_ulaw, "G.711 mu-law", 644),
                    (M.encode_wav_alaw, "G.711 A-law", 512),
                ):
                    da = M.decode_wav(enc(s, rate))
                    if (
                        da["sample_rate"] != rate
                        or da["n_samples"] != n
                        or int(
                            np.abs(
                                da["samples"][:, 0].astype(np.int32)
                                - s.astype(np.int32)
                            ).max()
                        )
                        > bound
                    ):
                        raise ValueError(
                            f"{tag} round-trip out of bounds for doc {d}"
                        )
                v = dec["samples"][:, 0].astype(np.int64)
                rows.append(
                    (
                        d,
                        n,
                        rate,
                        len(wav),
                        int(v.sum()),
                        int((v * v).sum()),
                        int(((v[1:] < 0) != (v[:-1] < 0)).sum()),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "n_samples", "sample_rate", "n_bytes",
                    "amp_sum", "energy_sum", "zero_cross",
                ],
            )

    docs = fanout(T(spark, sf_dir, "documents").select("doc_id"))
    return docs.mapInPandas(
        per_batch,
        "doc_id long, n_samples long, sample_rate int, n_bytes long, "
        "amp_sum long, energy_sum long, zero_cross long",
    )


@register(
    "l72_gif_roundtrip",
    oracle="""
    WITH d AS (SELECT doc_id, 6 + doc_id % 7 AS w, 5 + doc_id % 6 AS h
               FROM documents),
    ys AS (SELECT doc_id, w, h, unnest(range(0, h)) AS y FROM d),
    xs AS (SELECT doc_id, w, h, y, unnest(range(0, w)) AS x FROM ys),
    px AS (SELECT doc_id, (doc_id * 31 + y * 7 + x * 3) % 256 AS i
           FROM xs),
    agg AS (SELECT doc_id,
                   CAST(SUM(i) AS BIGINT) AS idx_sum,
                   CAST(SUM((i * 7) % 256 + (i * 13) % 256 + (i * 29) % 256)
                        AS BIGINT) AS px_sum
            FROM px GROUP BY doc_id)
    SELECT d.doc_id, CAST(d.w AS INTEGER) AS width,
           CAST(d.h AS INTEGER) AS height, agg.idx_sum, agg.px_sum
    FROM d JOIN agg USING (doc_id)
    """,
)
def l72_gif_roundtrip(spark, sf_dir):
    """REAL GIF87a round trip — the third from-scratch entropy coder in
    the codec set (after PNG's DEFLATE-via-zlib and JPEG's canonical
    Huffman, the LZW stage here is fully hand-rolled: variable-width
    codes 9->12 bits, clear-code dictionary resets, the KwKwK corner,
    LSB-first bit packing, 255-byte sub-block framing).  Per document: a
    deterministic doc_id-keyed INDEX image (width 6+id%7, height 5+id%6,
    idx(y,x) = (id*31 + y*7 + x*3) mod 256) under a fixed 256-entry
    palette (entry i = (7i, 13i, 29i) mod 256) is encoded as an actual
    GIF87a byte stream and decoded back
    (operators/multimodal.encode_gif/decode_gif); bitwise index AND
    palette-mapped pixel equality are required in-task, and the emitted
    index sum + palette-mapped pixel sum have closed forms the DuckDB
    oracle recomputes from doc_id.  GIF is lossless for indexed content,
    so unlike JPEG no flat-block trick is needed — but unlike WAV the
    entropy stage is nontrivial.  Interlace/animation/local color tables
    stay honest NotImplementedError seams.

    Scale shape: identical to l63/l64/l67/l68 — per-row Arrow-batched
    compute on the scan, no shuffle, no driver involvement."""
    import numpy as np

    i = np.arange(256, dtype=np.int64)
    _PAL = np.stack(
        [(i * 7) % 256, (i * 13) % 256, (i * 29) % 256], axis=1
    ).astype(np.uint8)

    def per_batch(batches):
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                w, h = 6 + d % 7, 5 + d % 6
                y, x = np.indices((h, w), dtype=np.int64)
                idx = ((d * 31 + y * 7 + x * 3) % 256).astype(np.uint8)
                gif = M.encode_gif(idx, _PAL)
                dec = M.decode_gif(gif)
                if not np.array_equal(dec["indexed"], idx) or not np.array_equal(
                    dec["pixels"], _PAL[idx]
                ):
                    raise ValueError(
                        f"GIF round-trip mismatch for doc {d}"
                    )
                rows.append(
                    (
                        d,
                        w,
                        h,
                        int(dec["indexed"].sum()),
                        int(dec["pixels"].astype(np.int64).sum()),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "width", "height", "idx_sum", "px_sum"],
            )

    docs = fanout(T(spark, sf_dir, "documents").select("doc_id"))
    return docs.mapInPandas(
        per_batch,
        "doc_id long, width int, height int, idx_sum long, px_sum long",
    )


@register(
    "l27_sequence_pack",
    oracle="""
    WITH t AS (SELECT doc_id,
                      CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
               FROM documents),
    c AS (SELECT doc_id, n_tokens,
                 COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS cum_before
          FROM t)
    SELECT doc_id, n_tokens,
           CAST(floor(CAST(cum_before AS DOUBLE) / 2048) AS BIGINT) AS bin
    FROM c
    """,
)
def l27_sequence_pack(spark, sf_dir):
    """Sequence packing: docs -> ~2048-token training bins via running token
    sum over the doc_id order (operators/text.py sequence_pack)."""
    return X.sequence_pack(
        T(spark, sf_dir, "documents"), budget_tokens=2048, materialize=True
    )


@register(
    "l28_quantize_int8",
    oracle="""
    WITH cells AS (
      SELECT vec_id, unnest(range(0, 64)) AS dim,
             unnest(CAST(embedding AS DOUBLE[])) AS x
      FROM embeddings),
    stats AS (SELECT dim, MIN(x) AS dmin, MAX(x) AS dmax FROM cells GROUP BY dim),
    sc AS (SELECT dim, dmin,
                  CASE WHEN dmax = dmin THEN 1.0
                       ELSE (dmax - dmin) / 255 END AS scale
           FROM stats),
    q AS (SELECT c.vec_id,
                 CAST(round((c.x - s.dmin) / s.scale) AS INTEGER) AS code,
                 abs(c.x - (s.dmin
                   + CAST(round((c.x - s.dmin) / s.scale) AS INTEGER)
                     * s.scale)) AS err
          FROM cells c JOIN sc s ON c.dim = s.dim)
    SELECT vec_id, COUNT(*) AS n_dims,
           MIN(code) AS min_code, MAX(code) AS max_code,
           round(MAX(err), 9) AS max_abs_err
    FROM q GROUP BY vec_id
    """,
)
def l28_quantize_int8(spark, sf_dir):
    """Per-dimension affine int8 quantization + reconstruction-error stats
    (operators/similarity.py quantize_int8) — the 4x storage path a 100-TB
    vector corpus takes before ANN indexing."""
    return S.quantize_int8(T(spark, sf_dir, "embeddings"))


@register(
    "l29_dedup_clusters",
    oracle="""
    WITH RECURSIVE docs5 AS (SELECT doc_id, text FROM documents WHERE source = 'src5'),
    pos AS (SELECT doc_id, text,
                   unnest(range(1, greatest(len(text) - 2, 1) + 1)) AS p
            FROM docs5),
    grams AS (SELECT DISTINCT doc_id, substr(text, CAST(p AS INTEGER), 3) AS gram
              FROM pos),
    sizes AS (SELECT doc_id, COUNT(*) AS sz FROM grams GROUP BY doc_id),
    inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
              FROM grams a JOIN grams b
                ON a.gram = b.gram AND a.doc_id < b.doc_id
              GROUP BY 1, 2),
    pairs AS (SELECT i.doc_a, i.doc_b
              FROM inter i
              JOIN sizes sa ON sa.doc_id = i.doc_a
              JOIN sizes sb ON sb.doc_id = i.doc_b
              WHERE 100 * i.inter >= 60 * (sa.sz + sb.sz - i.inter)),
    edges AS (SELECT doc_a AS a, doc_b AS b FROM pairs
              UNION ALL SELECT doc_b, doc_a FROM pairs),
    reach AS (SELECT a, b FROM edges
              UNION
              SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
    comp AS (SELECT a AS doc_id, least(a, MIN(b)) AS cluster_id
             FROM reach GROUP BY a)
    SELECT d.doc_id, COALESCE(c.cluster_id, d.doc_id) AS cluster_id
    FROM docs5 d LEFT JOIN comp c USING (doc_id)
    """,
)
def l29_dedup_clusters(spark, sf_dir):
    """Pairs -> clusters: l12's 3-gram-Jaccard near-dup pairs collapsed
    into connected components (operators/dedup.py connected_components,
    iterative min-label propagation); docs in no pair are their own
    singleton cluster, cluster_id = min doc_id = the canonical-keeper
    election.  The oracle runs the same graph via a recursive-CTE
    transitive closure — an O-tier check of a genuinely iterative
    distributed algorithm.  Consumes the shared src5 pair/cluster
    materialization (header comment above)."""
    docs = T(spark, sf_dir, "documents").filter(F.col("source") == "src5")
    cc = _src5_clusters(spark, sf_dir)
    return docs.select("doc_id").join(cc, "doc_id", "left").select(
        "doc_id",
        F.coalesce(F.col("cluster_id"), F.col("doc_id")).alias("cluster_id"),
    )


@register(
    "l30_decontaminate",
    oracle="""
    WITH tr AS (SELECT doc_id, text FROM documents WHERE source = 'src1'),
    ev AS (SELECT text FROM documents WHERE source = 'src2'),
    trt AS (SELECT doc_id, string_split(text, ' ') AS w FROM tr),
    trp AS (SELECT doc_id, w,
                   unnest(range(1, greatest(len(w) - 2, 1) + 1)) AS p
            FROM trt),
    trs AS (SELECT DISTINCT doc_id,
                   CASE WHEN len(w) >= 3 THEN array_to_string(w[p:p+2], ' ')
                        ELSE array_to_string(w, ' ') END AS sh
            FROM trp),
    evt AS (SELECT string_split(text, ' ') AS w FROM ev),
    evp AS (SELECT w, unnest(range(1, greatest(len(w) - 2, 1) + 1)) AS p
            FROM evt),
    evs AS (SELECT DISTINCT
                   CASE WHEN len(w) >= 3 THEN array_to_string(w[p:p+2], ' ')
                        ELSE array_to_string(w, ' ') END AS sh
            FROM evp),
    shared AS (SELECT t.doc_id, COUNT(*) AS n_shared
               FROM trs t JOIN evs e ON t.sh = e.sh GROUP BY t.doc_id)
    SELECT tr.doc_id,
           COALESCE(s.n_shared, 0) AS n_shared_shingles,
           COALESCE(s.n_shared, 0) > 0 AS contaminated
    FROM tr LEFT JOIN shared s ON tr.doc_id = s.doc_id
    """,
)
def l30_decontaminate(spark, sf_dir):
    """Eval-set decontamination (the n-gram-overlap hygiene step every LLM
    training corpus runs): per training doc (source src1), the count of
    distinct word-3-shingles also present anywhere in the eval slice
    (src2), plus the contaminated flag.  Scale shape: the EVAL side
    reduces to a distinct-shingle set (eval sets are tiny vs the corpus)
    and broadcasts; the training shingle stream joins it map-side — no
    corpus-sized shuffle.  Production uses 13-grams; 3 here because the
    synthetic docs are ~54 tokens."""
    docs = T(spark, sf_dir, "documents")
    tr = docs.filter(F.col("source") == "src1")
    ev = docs.filter(F.col("source") == "src2")
    tr_sh = (
        fanout(tr)
        .select("doc_id", F.explode(D.word_shingles("text", 3)).alias("sh"))
        .distinct()
    )
    ev_sh = ev.select(F.explode(D.word_shingles("text", 3)).alias("sh")).distinct()
    shared = (
        tr_sh.join(F.broadcast(ev_sh), "sh")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_shared"))
    )
    return tr.select("doc_id").join(shared, "doc_id", "left").select(
        "doc_id",
        F.coalesce(F.col("n_shared"), F.lit(0)).alias("n_shared_shingles"),
        (F.coalesce(F.col("n_shared"), F.lit(0)) > 0).alias("contaminated"),
    )


# ------------------------------------------------- round-2 additions ----


@register(
    "l31_chunk_split",
    oracle="""
    WITH t AS (SELECT doc_id,
                      CAST(len(string_split(text, ' ')) AS BIGINT) AS n
               FROM documents),
    c AS (SELECT doc_id, n,
                 unnest(range(0, CAST(ceil(n / 512.0) AS BIGINT))) AS chunk_id
          FROM t)
    SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
           CAST(least(512, n - chunk_id * 512) AS BIGINT) AS chunk_tokens
    FROM c
    """,
)
def l31_chunk_split(spark, sf_dir):
    """Max-length chunking: split each document into consecutive <=512-token
    training chunks (the overflow-chunking step a tokenize-and-pack pipeline
    runs before l27's bin packing).  explode(sequence(...)) is a NARROW
    fan-out — chunk rows are emitted where the doc row lives, no shuffle at
    any corpus size."""
    docs = fanout(T(spark, sf_dir, "documents"))
    n = F.size(X.tokens("text")).cast("long")
    n_chunks = F.ceil(n / F.lit(512.0)).cast("long")
    return (
        docs.select("doc_id", n.alias("n"), n_chunks.alias("n_chunks"))
        .select(
            "doc_id",
            "n",
            F.explode(F.sequence(F.lit(0).cast("long"), F.col("n_chunks") - 1)).alias(
                "chunk_id"
            ),
        )
        .select(
            "doc_id",
            "chunk_id",
            F.least(F.lit(512).cast("long"), F.col("n") - F.col("chunk_id") * 512).alias(
                "chunk_tokens"
            ),
        )
    )


@register(
    "l32_domain_quota",
    oracle="""
    WITH ranked AS (
      SELECT doc_id, source,
             row_number() OVER (PARTITION BY source
                                ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
               AS rk
      FROM documents)
    SELECT doc_id, source, CAST(rk AS BIGINT) AS rk
    FROM ranked WHERE rk <= 50
    """,
)
def l32_domain_quota(spark, sf_dir):
    """Per-domain quota capping (the CommonCrawl "max N pages per host"
    step): keep at most 50 docs per source, chosen by deterministic hash
    order (md5 of doc_id — an unbiased, re-run-stable sample, unlike "first
    50 by id" which biases toward old pages).  The rank<=50 filter adjacent
    to row_number lets Spark plan a WindowGroupLimit: each partition keeps a
    50-row heap per source instead of sorting whole domains — the difference
    between O(quota) and O(domain size) state on a 10^9-page host."""
    docs = fanout(T(spark, sf_dir, "documents"))
    from pyspark.sql import Window

    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    return (
        docs.select("doc_id", "source")
        .withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= 50)
    )


@register(
    "l33_dedup_apply",
    oracle="""
    WITH RECURSIVE docs5 AS (SELECT doc_id, text FROM documents WHERE source = 'src5'),
    pos AS (SELECT doc_id, text,
                   unnest(range(1, greatest(len(text) - 2, 1) + 1)) AS p
            FROM docs5),
    grams AS (SELECT DISTINCT doc_id, substr(text, CAST(p AS INTEGER), 3) AS gram
              FROM pos),
    sizes AS (SELECT doc_id, COUNT(*) AS sz FROM grams GROUP BY doc_id),
    inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
              FROM grams a JOIN grams b
                ON a.gram = b.gram AND a.doc_id < b.doc_id
              GROUP BY 1, 2),
    pairs AS (SELECT i.doc_a, i.doc_b
              FROM inter i
              JOIN sizes sa ON sa.doc_id = i.doc_a
              JOIN sizes sb ON sb.doc_id = i.doc_b
              WHERE 100 * i.inter >= 60 * (sa.sz + sb.sz - i.inter)),
    edges AS (SELECT doc_a AS a, doc_b AS b FROM pairs
              UNION ALL SELECT doc_b, doc_a FROM pairs),
    reach AS (SELECT a, b FROM edges
              UNION
              SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
    comp AS (SELECT a AS doc_id, least(a, MIN(b)) AS cluster_id
             FROM reach GROUP BY a),
    labeled AS (SELECT d.doc_id, COALESCE(c.cluster_id, d.doc_id) AS cluster_id
                FROM docs5 d LEFT JOIN comp c USING (doc_id))
    SELECT cluster_id AS keep_id, COUNT(*) AS cluster_size
    FROM labeled GROUP BY cluster_id
    """,
)
def l33_dedup_apply(spark, sf_dir):
    """The last step of the dedup cascade: apply l29's cluster election to
    the corpus — one surviving document per near-dup cluster (the min
    doc_id keeper) with its cluster size.  Downstream a training run
    anti-joins the corpus against the non-keeper ids; here the keeper list
    itself is the checkable output.  Consumes l29's cluster frame via the
    shared src5 materialization (header comment above) — the gram->pairs->CC
    chain runs once per session for l12/l29/l33 together."""
    docs = T(spark, sf_dir, "documents").filter(F.col("source") == "src5")
    cc = _src5_clusters(spark, sf_dir)
    labeled = docs.select("doc_id").join(cc, "doc_id", "left").select(
        "doc_id",
        F.coalesce(F.col("cluster_id"), F.col("doc_id")).alias("cluster_id"),
    )
    return labeled.groupBy(F.col("cluster_id").alias("keep_id")).agg(
        F.count("*").alias("cluster_size")
    )


@register(
    "l34_unigram_logprob",
    oracle="""
    WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token
                 FROM documents),
    freq AS (SELECT token, COUNT(*) AS n FROM tok GROUP BY token),
    tot AS (SELECT SUM(n) AS total FROM freq)
    SELECT t.doc_id,
           COUNT(*) AS n_tokens,
           round(CAST(SUM(CAST(ln(f.n / CAST(tot.total AS DOUBLE))
                               AS DECIMAL(38,9))) AS DOUBLE) / COUNT(*), 6)
             AS avg_logprob
    FROM tok t JOIN freq f USING (token) CROSS JOIN tot
    GROUP BY t.doc_id
    """,
)
def l34_unigram_logprob(spark, sf_dir):
    """Unigram-LM quality score (the cheap perplexity proxy used for corpus
    filtering): avg log p(token) per document under the corpus's own
    unigram distribution — low scores flag gibberish / rare-token spam.
    The frequency table is vocabulary-sized -> broadcast; the token stream
    is never shuffled (fanout_by pre-partitions on doc_id so the final
    per-doc aggregation is exchange-free).

    Subtree economy (PLAN_AUDIT round-3 fix, 6 exchanges -> 4): Catalyst
    re-expands every reference to an unmaterialized frame, so deriving
    `total` from `freq` re-built the whole explode+groupBy token pipeline a
    third time.  `total` is instead one exchange-free aggregate over the
    BASE docs (sum of per-doc token counts — no explode), leaving exactly
    two token-stream builds: the freq branch (shuffles compressed
    token counts) and the per-doc join branch (never shuffles)."""
    from google_analytics_dataframes_spark.io import fanout_by

    docs = T(spark, sf_dir, "documents").select("doc_id", "text")
    tok = fanout_by(docs, "doc_id").select(
        "doc_id", F.explode(X.tokens("text")).alias("token")
    )
    freq = (
        fanout(docs)
        .select(F.explode(X.tokens("text")).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("n"))
    )
    tot = docs.agg(
        F.sum(F.size(X.tokens("text"))).cast("long").alias("total")
    )
    return (
        tok.join(F.broadcast(freq), "token")
        .join(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            # decimal-sum mean, not F.avg: the value doubles as l48's
            # cross-engine SORT KEY, where a last-digit FP summation-order
            # divergence would silently move a doc across a tercile
            # boundary — a sharper failure mode than a direct value diff
            F.round(
                F.sum(
                    F.log(F.col("n") / F.col("total")).cast("decimal(38,9)")
                ).cast("double")
                / F.count("*"),
                6,
            ).alias("avg_logprob"),
        )
    )


@register(
    "l39_batch_knn",
    oracle="""
    WITH q AS (SELECT vec_id AS q_id, CAST(embedding AS DOUBLE[]) AS qv
               FROM embeddings WHERE vec_id < 4),
    scored AS (SELECT q.q_id, e.vec_id,
                      round(list_dot_product(CAST(e.embedding AS DOUBLE[]), q.qv)
                            / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
                                                     CAST(e.embedding AS DOUBLE[])))
                               * sqrt(list_dot_product(q.qv, q.qv))), 4) AS cos
               FROM embeddings e CROSS JOIN q
               WHERE e.vec_id != q.q_id),
    ranked AS (SELECT q_id, vec_id, cos,
                      ROW_NUMBER() OVER (PARTITION BY q_id
                                         ORDER BY cos DESC, vec_id ASC) AS rk
               FROM scored)
    SELECT q_id, vec_id, cos, CAST(rk AS INTEGER) AS rk
    FROM ranked WHERE rk <= 3
    """,
)
def l39_batch_knn(spark, sf_dir):
    """Batch exact kNN for a query SET (vec_id < 4): every corpus vector
    scored against all queries in one scan, top-3 per query — the
    retrieval-eval shape (many probes, exact ground truth) that single-
    query l3 can't express.  The query block is broadcast, so the corpus
    is scanned once with |Q| fused cosine folds per row and never
    shuffles until the per-query top-k (WindowGroupLimit bounds the heap
    to k per query before any exchange).  At 100 TB with |Q| in the
    thousands this becomes the blocked GEMM of l4; the broadcast
    formulation is the |Q| <= hundreds fast path."""
    from pyspark.sql import Window

    emb = T(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    q = emb.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("q_id"), S.as_double("embedding").alias("qv")
    )
    scored = (
        emb.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            "vec_id",
            F.round(S.cosine(S.as_double(F.col("embedding")), F.col("qv")), 4).alias(
                "cos"
            ),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("vec_id").asc())
    return scored.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= 3)


@register(
    "l38_centroid_distances",
    oracle="""
    WITH cells AS (SELECT label, unnest(range(0, 64)) AS dim,
                          unnest(CAST(embedding AS DOUBLE[])) AS x
                   FROM embeddings),
    cent AS (SELECT label, dim,
                    CAST(CAST(SUM(CAST(x AS DECIMAL(30,15))) AS STRING) AS DOUBLE)
                    / COUNT(x) AS cx
             FROM cells GROUP BY label, dim),
    cvec AS (SELECT label, list(cx ORDER BY dim) AS c FROM cent GROUP BY label)
    SELECT a.label AS label_a, b.label AS label_b,
           round(sqrt(list_dot_product(a.c, a.c) - 2 * list_dot_product(a.c, b.c)
                      + list_dot_product(b.c, b.c)), 6) AS l2_dist,
           round(list_dot_product(a.c, b.c)
                 / (sqrt(list_dot_product(a.c, a.c))
                    * sqrt(list_dot_product(b.c, b.c))), 6) AS cos
    FROM cvec a JOIN cvec b ON a.label < b.label
    """,
)
def l38_centroid_distances(spark, sf_dir):
    """Pairwise distances between per-label centroids (the inter-cluster
    separation diagnostic for an IVF/clustering layout — close centroids
    mean nprobe must grow; SURVEY §2.11 l10's second half).  The centroid
    table is |labels| rows, so the pair join is a broadcast self-join of
    metadata-sized input at any corpus scale; L2 is computed from three
    dot products (||a-b||^2 = a.a - 2a.b + b.b) so both engines run the
    identical sequential-fold arithmetic that already matches DuckDB's
    list_dot_product in l3/l14.  The centroid table is localCheckpointed
    (lazily; |labels| rows) because Catalyst re-expands each self-join
    side — without it the corpus-sized centroid aggregation would run
    twice."""
    cents = S.label_centroids(T(spark, sf_dir, "embeddings")).localCheckpoint(
        eager=False
    )
    a = cents.select(F.col("label").alias("label_a"), F.col("centroid").alias("ca"))
    b = cents.select(F.col("label").alias("label_b"), F.col("centroid").alias("cb"))
    ca, cb = F.col("ca"), F.col("cb")
    aa, ab, bb = S.dot(ca, ca), S.dot(ca, cb), S.dot(cb, cb)
    return (
        a.join(F.broadcast(b), F.col("label_a") < F.col("label_b"))
        .select(
            "label_a",
            "label_b",
            F.round(F.sqrt(aa - 2 * ab + bb), 6).alias("l2_dist"),
            F.round(ab / (F.sqrt(aa) * F.sqrt(bb)), 6).alias("cos"),
        )
    )


@register(
    "l35_dup_ngram_fraction",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    pos AS (SELECT doc_id, w, unnest(range(1, greatest(len(w) - 2, 1) + 1)) AS p
            FROM t),
    g AS (SELECT doc_id,
                 CASE WHEN len(w) >= 3 THEN array_to_string(w[p:p+2], ' ')
                      ELSE array_to_string(w, ' ') END AS gram
          FROM pos),
    dg AS (SELECT doc_id, gram, COUNT(*) AS cnt FROM g GROUP BY 1, 2),
    df AS (SELECT gram, COUNT(*) AS n_docs FROM dg GROUP BY gram)
    SELECT d.doc_id,
           CAST(SUM(d.cnt) AS BIGINT) AS n_windows,
           CAST(SUM(CASE WHEN f.n_docs >= 2 THEN d.cnt ELSE 0 END) AS BIGINT)
             AS n_dup_windows,
           round(SUM(CASE WHEN f.n_docs >= 2 THEN d.cnt ELSE 0 END)
                 / CAST(SUM(d.cnt) AS DOUBLE), 6) AS dup_frac
    FROM dg d JOIN df f USING (gram)
    GROUP BY d.doc_id
    """,
)
def l35_dup_ngram_fraction(spark, sf_dir):
    """Duplicated-text fraction (the RefinedWeb/Gopher "rep" quality
    signal): per doc, the fraction of its word-3-gram windows whose gram
    also occurs in at least one OTHER document — high values flag
    boilerplate and templated spam before they dominate training batches.

    Scale shape: the exploded window stream is first compressed to
    (doc_id, gram, count) by a doc_id-clustered aggregate (fanout_by
    pre-partitions on doc_id, so this pays no extra exchange), and only
    that compressed stream — bounded by per-doc DISTINCT grams — shuffles
    on gram to meet the document-frequency table.  The df table is
    corpus-vocabulary-sized, so it joins shuffled, not broadcast; the final
    per-doc rollup re-shuffles the (now df-annotated) compressed stream
    once.  Word-3-grams (not the reference pipelines' 9/13-grams) because
    the synthetic docs are ~54 tokens."""
    from google_analytics_dataframes_spark.io import fanout_by

    docs = T(spark, sf_dir, "documents").select("doc_id", "text")
    grams = fanout_by(docs, "doc_id").select(
        "doc_id", F.explode(D.word_shingles("text", 3)).alias("gram")
    )
    dg = grams.groupBy("doc_id", "gram").agg(F.count("*").alias("cnt"))
    df = dg.groupBy("gram").agg(F.count("*").alias("n_docs"))
    dup_cnt = F.sum(F.when(F.col("n_docs") >= 2, F.col("cnt")).otherwise(0))
    return (
        dg.join(df, "gram")
        .groupBy("doc_id")
        .agg(
            F.sum("cnt").alias("n_windows"),
            dup_cnt.alias("n_dup_windows"),
            F.round(dup_cnt / F.sum("cnt"), 6).alias("dup_frac"),
        )
    )


@register(
    "l61_exact_substr_spans",
    oracle="""
    WITH w AS (
      SELECT doc_id, p, substr(text, CAST(p AS INTEGER), 30) AS win
      FROM (SELECT doc_id, text,
                   unnest(range(1, greatest(len(text) - 29, 0) + 1)) AS p
            FROM documents)
    ),
    m AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.p AS pa, b.p AS pb
          FROM w a JOIN w b ON a.win = b.win AND a.doc_id < b.doc_id),
    d AS (SELECT doc_a, doc_b, pa - pb AS diag, pa,
                 pa - row_number() OVER (PARTITION BY doc_a, doc_b, pa - pb
                                         ORDER BY pa) AS isl
          FROM m),
    r AS (SELECT doc_a, doc_b, COUNT(*) AS n_win,
                 MAX(pa) - MIN(pa) + 30 AS run_len
          FROM d GROUP BY doc_a, doc_b, diag, isl)
    SELECT doc_a, doc_b, CAST(SUM(n_win) AS BIGINT) AS shared_windows,
           CAST(MAX(run_len) AS BIGINT) AS max_run
    FROM r GROUP BY doc_a, doc_b
    """,
)
def l61_exact_substr_spans(spark, sf_dir):
    """Cross-document EXACT-SUBSTRING span detection — the ExactSubstr
    protocol of Lee et al. 2022 ("Deduplicating Training Data Makes
    Language Models Better"): for every document pair sharing a verbatim
    character run of >= L (= 30) chars, emit how many L-windows they
    share and the longest merged run.  Complements the gram-Jaccard
    family (l7/l12): Jaccard finds near-duplicate DOCUMENTS; this finds
    verbatim PASSAGES (boilerplate, licenses, quoted spans) inside
    otherwise-unrelated documents — the paper's dedup unit.

    Shape: L-char sliding windows are a doc-local array transform (no
    position self-join); one equi-join on the window string finds
    cross-doc matches; runs are merged with the islands trick — matches
    on one (pair, pa-pb) diagonal with consecutive pa belong to one
    verbatim run, so `pa - row_number()` is constant per run and a
    two-level aggregate emits (shared_windows, max_run) per pair.

    Scale: window stream is ~L x text bytes; at 100 TB the join key
    would be xxhash64(win) (8-byte shuffle keys, ~1e-19 collision odds
    at corpus scale, survivors re-verified on the raw span) — here the
    raw 30-char key keeps the DuckDB twin exact.  Join output is bounded
    by TRUE shared windows (random corpora collide nowhere); the islands
    window partitions by (pair, diagonal) — cardinality of real shared
    runs, never a hot key."""
    return D.exact_substr_spans(
        T(spark, sf_dir, "documents").select("doc_id", "text"), min_len=30
    )


@register(
    "l61b_exact_substr_hashed",
    oracle="""
    WITH w AS (
      SELECT doc_id, p, substr(text, CAST(p AS INTEGER), 30) AS win
      FROM (SELECT doc_id, text,
                   unnest(range(1, greatest(len(text) - 29, 0) + 1)) AS p
            FROM documents)
    ),
    m AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.p AS pa, b.p AS pb
          FROM w a JOIN w b ON a.win = b.win AND a.doc_id < b.doc_id),
    d AS (SELECT doc_a, doc_b, pa - pb AS diag, pa,
                 pa - row_number() OVER (PARTITION BY doc_a, doc_b, pa - pb
                                         ORDER BY pa) AS isl
          FROM m),
    r AS (SELECT doc_a, doc_b, COUNT(*) AS n_win,
                 MAX(pa) - MIN(pa) + 30 AS run_len
          FROM d GROUP BY doc_a, doc_b, diag, isl)
    SELECT doc_a, doc_b, CAST(SUM(n_win) AS BIGINT) AS shared_windows,
           CAST(MAX(run_len) AS BIGINT) AS max_run
    FROM r GROUP BY doc_a, doc_b
    """,
)
def l61b_exact_substr_hashed(spark, sf_dir):
    """ExactSubstr span detection, HASHED-KEY form — the 100-TB path the
    l61 docstring promises, now a first-class registered operator
    (VERDICT r5 item #3).  Identical output contract to l61 (same pairs,
    same shared_windows/max_run, same oracle — the driver proves the two
    physical strategies agree), different shuffle economics: the window
    equi-join keys on ``xxhash64(win)`` so the corpus-sized exchange
    carries an 8-byte long per window instead of the L-char string, and
    candidate pairs are re-verified EXACTLY on the raw span by joining
    each side's doc text back in (substring compare; candidates are true
    matches + ~2^-64 collisions, so the verify build side is tiny and
    AQE broadcasts it against the doc scan).  Measured at sf0.1 with
    broadcast disabled (the cluster join shape, BASELINE.md): the window
    exchange writes 24.4 MB vs l61's 33.3 MB over the same 1.34M window
    rows — only 1.36x ON THE WIRE because lz4 compresses the
    overlapping window text far better than incompressible hashes — but
    the UNCOMPRESSED row (what sort buffers, spill files, and the
    sort-merge comparator actually hold) shrinks ~2.5x at L=30 and
    ~(L+20)/20 generally, and the join comparator becomes a single long
    compare instead of a 30-char memcmp.  Wall at sf0.1 is parity (the
    corpus fits either way); the path exists for the regime where the
    window exchange dominates and L is large.  This is the Lee et al.
    2022 suffix-free variant: lossless by verification, not by trusting
    the hash.  tests/test_plans.py pins the plan: the window join must
    key on xxhash64 with no raw-window shuffle, and stay equi-join."""
    return D.exact_substr_spans(
        T(spark, sf_dir, "documents").select("doc_id", "text"),
        min_len=30,
        hashed=True,
    )


@register(
    "l62_semantic_decontam",
    oracle="""
    WITH ev AS (SELECT vec_id AS eval_id, CAST(embedding AS DOUBLE[]) AS e
                FROM embeddings WHERE label = 0),
    tr AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS t
           FROM embeddings WHERE label <> 0),
    c AS (SELECT tr.vec_id,
                 list_dot_product(t, e)
                   / (sqrt(list_dot_product(t, t))
                      * sqrt(list_dot_product(e, e))) AS c
          FROM tr CROSS JOIN ev),
    m AS (SELECT vec_id, MAX(c) AS mc FROM c GROUP BY vec_id)
    SELECT vec_id, round(mc, 4) AS max_eval_cos, mc >= 0.8 AS contaminated
    FROM m
    """,
)
def l62_semantic_decontam(spark, sf_dir):
    """SEMANTIC decontamination — the embedding-space complement of the
    n-gram protocols (l30/l53): for every training vector, its maximum
    cosine against the held-out eval set (label 0 plays the eval role),
    plus a >= 0.8 contamination flag.  N-gram overlap misses paraphrased
    or translated eval leakage; embedding similarity is the standard
    second net (e.g. phi-style decontamination).

    Scale shape: the eval set is bounded BY DESIGN (benchmarks are
    thousands of rows, not corpus-sized — the same premise as the
    centroid/codebook broadcasts), so it ships to every task as a
    broadcast float64 matrix and the train side streams scan-parallel
    through one Arrow-batched GEMM per batch (numpy matmul, the l4/LSH-
    verify convention) — no shuffle of the corpus at all, and no
    per-element interpreted fold (the zip_with/aggregate formulation ran
    |corpus| x |eval| interpreted lambdas: 8.2 s at sf0.1 vs well under
    1 s for the GEMM).  At 100 TB prune with the IVF/LSH prefilter
    (l13/l14) when |eval| grows past a few thousand.  Cross-engine
    determinism: float64 GEMM vs DuckDB's sequential fold differ by
    ~1e-15; the emitted max is terminally round(4) and the 0.8 threshold
    compare sits nowhere near that noise floor (the l4 contract)."""
    emb = T(spark, sf_dir, "embeddings")
    ev_rows = (
        emb.filter(F.col("label") == 0)
        .select(S.as_double("embedding").alias("e"))
        .collect()
    )  # bounded eval set — metadata-sized by the operator's premise
    E = np.stack([r.e for r in ev_rows]).astype("float64")
    En = E / np.linalg.norm(E, axis=1, keepdims=True)
    bc = spark.sparkContext.broadcast(En)
    tr = fanout(emb.filter(F.col("label") != 0)).select(
        "vec_id", S.as_double("embedding").alias("t")
    )

    def max_cos(batches):
        M = bc.value
        for pdf in batches:
            tm = np.stack(pdf["t"].to_numpy()).astype("float64")
            tm = tm / np.linalg.norm(tm, axis=1, keepdims=True)
            yield pd.DataFrame(
                {"vec_id": pdf["vec_id"], "mc": (tm @ M.T).max(axis=1)}
            )

    mc = tr.mapInPandas(max_cos, "vec_id long, mc double")
    return mc.select(
        "vec_id",
        F.round("mc", 4).alias("max_eval_cos"),
        (F.col("mc") >= 0.8).alias("contaminated"),
    )


@register(
    "l62b_semantic_decontam_ivf",
    oracle="""
    WITH ev AS (SELECT vec_id AS eval_id, CAST(embedding AS DOUBLE[]) AS e,
                       (CASE WHEN embedding[1] >= 0 THEN 1 ELSE 0 END
                        + CASE WHEN embedding[2] >= 0 THEN 2 ELSE 0 END
                        + CASE WHEN embedding[3] >= 0 THEN 4 ELSE 0 END
                        + CASE WHEN embedding[4] >= 0 THEN 8 ELSE 0 END) AS cell
                FROM embeddings WHERE label = 0),
    tr0 AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS t,
                   (CASE WHEN embedding[1] >= 0 THEN 1 ELSE 0 END
                    + CASE WHEN embedding[2] >= 0 THEN 2 ELSE 0 END
                    + CASE WHEN embedding[3] >= 0 THEN 4 ELSE 0 END
                    + CASE WHEN embedding[4] >= 0 THEN 8 ELSE 0 END) AS cell
            FROM embeddings WHERE label <> 0),
    pe AS (SELECT -vec_id - 1 AS vec_id,
                  list_transform(CAST(embedding AS DOUBLE[]), x -> x * 2) AS t,
                  (CASE WHEN embedding[1] >= 0 THEN 1 ELSE 0 END
                   + CASE WHEN embedding[2] >= 0 THEN 2 ELSE 0 END
                   + CASE WHEN embedding[3] >= 0 THEN 4 ELSE 0 END
                   + CASE WHEN embedding[4] >= 0 THEN 8 ELSE 0 END) AS cell
           FROM (SELECT vec_id, embedding FROM embeddings
                 WHERE label = 0 ORDER BY vec_id LIMIT 4)),
    tr AS (SELECT * FROM tr0 UNION ALL SELECT * FROM pe),
    pr AS (SELECT vec_id, t,
                  unnest([cell, xor(cell, 1), xor(cell, 2),
                          xor(cell, 4), xor(cell, 8)]) AS pcell
           FROM tr),
    c AS (SELECT pr.vec_id,
                 list_dot_product(t, e)
                   / (sqrt(list_dot_product(t, t))
                      * sqrt(list_dot_product(e, e))) AS c
          FROM pr JOIN ev ON ev.cell = pr.pcell),
    p AS (SELECT vec_id, MAX(c) AS mc FROM c GROUP BY vec_id),
    x AS (SELECT tr.vec_id,
                 MAX(list_dot_product(t, e)
                     / (sqrt(list_dot_product(t, t))
                        * sqrt(list_dot_product(e, e)))) AS mx
          FROM tr CROSS JOIN ev GROUP BY tr.vec_id)
    SELECT tr.vec_id,
           round(coalesce(p.mc, -2.0), 4) AS max_eval_cos,
           coalesce(p.mc >= 0.8, FALSE) AS contaminated,
           coalesce(p.mc >= 0.8, FALSE) = (x.mx >= 0.8) AS recall_ok
    FROM tr LEFT JOIN p USING (vec_id) JOIN x USING (vec_id)
    """,
)
def l62b_semantic_decontam_ivf(spark, sf_dir):
    """PREFILTERED semantic decontamination — the unbounded-eval-set path
    the l62 docstring promises, registered first-class (VERDICT r5 item
    #4).  A 4-bit sign-LSH coarse quantizer (axis-aligned hyperplanes on
    dims 1-4, 16 cells) partitions the eval set; each training vector
    probes its own cell plus the 4 hamming-1 neighbors (5/16 of eval in
    expectation, ~3.2x less per-train work) and takes its max cosine over
    ONLY the probed eval vectors.  The in-query audit column ``recall_ok``
    compares the prefiltered contamination flag against the EXACT flag
    (l62's full sweep, computed in the same Arrow batch) — so the driver
    hash records, per training vector, whether the prefilter's verdict
    matched exact decontamination; measured recall is part of the result,
    not a docstring claim.

    Scale shape: eval still broadcasts (as 16 per-own-cell concatenated
    probe matrices + the full matrix for the audit), the train side
    streams scan-parallel through one cell-grouped numpy GEMM per batch —
    zero corpus shuffle (same plan pin as l62).  At a 10x eval set the
    prefiltered GEMM row count grows ~10x but stays 5/16 of the exact
    sweep's (BASELINE.md probe); past broadcast limits the same cell key
    becomes an equi-join key and the corpus shuffles ONCE on it — the
    standard IVF trade.  Cross-engine determinism: identical to l62's
    contract (float64 GEMM vs DuckDB sequential fold ~1e-15, terminal
    round(4), thresholds far from the noise floor); cell assignment is
    integer-exact in both engines (sign compare on the same parquet
    floats).  A train vector whose 5 probed cells hold no eval vector
    emits the explicit -2.0 no-candidate sentinel (both engines), never
    NULL/NaN.

    The corpus contains no true cos>=0.8 contamination at any shipped
    SF, so recall_ok over the raw table alone would be trivially TRUE:
    four PLANTED probes (the l13 pattern) — the 4 smallest-id eval
    vectors scaled by 2 under fresh negative train ids — are unioned
    into the train side in BOTH engines.  Power-of-two scaling keeps
    every sign bit (same cell) and normalizes away bitwise, so each
    probe's exact max-cos is 1.0 against its source AND the prefilter
    provably probes the source's own cell — the planted rows exercise
    contaminated=TRUE and non-trivial recall on known positives."""
    emb = T(spark, sf_dir, "embeddings")
    ev_rows = (
        emb.filter(F.col("label") == 0)
        .select("vec_id", S.as_double("embedding").alias("e"))
        .collect()
    )  # bounded eval premise, same as l62; see docstring for the join form
    probe_ids = sorted(r.vec_id for r in ev_rows)[:4]
    probes = (
        emb.filter(F.col("label") == 0)
        .filter(F.col("vec_id").isin(probe_ids))
        .select(
            (-F.col("vec_id") - 1).alias("vec_id"),
            F.transform(
                "embedding", lambda x: x * F.lit(2.0).cast("float")
            ).alias("embedding"),
        )
    )
    E = np.stack([r.e for r in ev_rows]).astype("float64")
    En = E / np.linalg.norm(E, axis=1, keepdims=True)
    POW = np.array([1, 2, 4, 8])
    ev_cell = (E[:, :4] >= 0).astype(int) @ POW
    probe_mats = [
        En[np.isin(ev_cell, [c, c ^ 1, c ^ 2, c ^ 4, c ^ 8])] for c in range(16)
    ]
    bc = spark.sparkContext.broadcast((En, probe_mats))
    tr = fanout(
        emb.filter(F.col("label") != 0)
        .select("vec_id", "embedding")
        .unionByName(probes)
    ).select("vec_id", S.as_double("embedding").alias("t"))

    def sweep(batches):
        Efull, mats = bc.value
        for pdf in batches:
            tm = np.stack(pdf["t"].to_numpy()).astype("float64")
            tcell = (tm[:, :4] >= 0).astype(int) @ POW
            tm = tm / np.linalg.norm(tm, axis=1, keepdims=True)
            mc = np.full(len(tm), -2.0)
            mx = (tm @ Efull.T).max(axis=1)
            for c in np.unique(tcell):
                P = mats[c]
                if P.size:
                    rows = tcell == c
                    mc[rows] = (tm[rows] @ P.T).max(axis=1)
            yield pd.DataFrame(
                {"vec_id": pdf["vec_id"], "mc": mc, "mx": mx}
            )

    out = tr.mapInPandas(sweep, "vec_id long, mc double, mx double")
    pref = F.col("mc") >= 0.8
    return out.select(
        "vec_id",
        F.round("mc", 4).alias("max_eval_cos"),
        pref.alias("contaminated"),
        (pref == (F.col("mx") >= 0.8)).alias("recall_ok"),
    )


@register(
    "l36_char_entropy",
    oracle="""
    WITH ch AS (SELECT doc_id, substr(text, CAST(p AS INTEGER), 1) AS c
                FROM (SELECT doc_id, text, unnest(range(1, len(text) + 1)) AS p
                      FROM documents)),
    cc AS (SELECT doc_id, c, COUNT(*) AS cnt FROM ch GROUP BY 1, 2),
    n AS (SELECT doc_id, SUM(cnt) AS n_chars FROM cc GROUP BY doc_id)
    SELECT cc.doc_id, CAST(ANY_VALUE(n.n_chars) AS BIGINT) AS n_chars,
           round(-SUM((cnt / CAST(n.n_chars AS DOUBLE))
                      * log2(cnt / CAST(n.n_chars AS DOUBLE))), 6) AS entropy
    FROM cc JOIN n USING (doc_id)
    GROUP BY cc.doc_id
    """,
)
def l36_char_entropy(spark, sf_dir):
    """Character-level Shannon entropy per document — the cheap gibberish /
    low-diversity detector (near-zero entropy = single-character spam, high
    entropy = random bytes; natural text sits in a narrow band).  All
    built-in expressions: explode to chars, (doc, char) counts, one
    entropy fold — the char stream never shuffles because fanout_by
    pre-partitions the compact doc stream on doc_id and both aggregates
    cluster on it.  Terminal round(6) absorbs float-sum order differences
    across the <=|alphabet| per-doc terms."""
    from google_analytics_dataframes_spark.io import fanout_by

    docs = T(spark, sf_dir, "documents").select("doc_id", "text")
    chars = fanout_by(docs, "doc_id").select(
        "doc_id", F.explode(F.split("text", "")).alias("c")
    )
    cc = chars.groupBy("doc_id", "c").agg(F.count("*").alias("cnt"))
    n = cc.groupBy("doc_id").agg(F.sum("cnt").alias("n_chars"))
    p = F.col("cnt") / F.col("n_chars")
    return (
        cc.join(n, "doc_id")
        .groupBy("doc_id")
        .agg(
            F.any_value("n_chars").alias("n_chars"),
            F.round(-F.sum(p * F.log2(p)), 6).alias("entropy"),
        )
    )


@register(
    "l37_zipf_slope",
    oracle="""
    WITH tok AS (SELECT unnest(string_split(text, ' ')) AS token FROM documents),
    freq AS (SELECT token, COUNT(*) AS n FROM tok GROUP BY token),
    ranked AS (SELECT n, ROW_NUMBER() OVER (ORDER BY n DESC, token ASC) AS r
               FROM freq)
    SELECT CAST(COUNT(*) AS BIGINT) AS vocab_size,
           round(regr_slope(ln(CAST(n AS DOUBLE)), ln(CAST(r AS DOUBLE))), 4)
             AS zipf_slope
    FROM ranked
    """,
)
def l37_zipf_slope(spark, sf_dir):
    """Corpus-level Zipf diagnostic: the least-squares slope of log(freq)
    vs log(rank) over the token vocabulary (natural corpora sit near -1;
    a flat slope flags synthetic/templated text, a cliff flags dominated
    vocabularies).  The token stream reduces to a vocabulary-sized
    frequency table before anything else happens, so the regression input
    is tiny at any corpus size; rank ties break on (freq desc, token asc)
    in both engines, making the fit deterministic up to the terminal
    round(4)."""
    from pyspark.sql import Window

    docs = T(spark, sf_dir, "documents").select("doc_id", "text")
    tok = fanout(docs).select(F.explode(X.tokens("text")).alias("token"))
    freq = tok.groupBy("token").agg(F.count("*").alias("n"))
    ranked = freq.select(
        "n",
        F.row_number()
        .over(Window.orderBy(F.col("n").desc(), F.col("token").asc()))
        .alias("r"),
    )
    return ranked.agg(
        F.count("*").alias("vocab_size"),
        F.round(
            F.regr_slope(F.log(F.col("n").cast("double")), F.log(F.col("r").cast("double"))), 4
        ).alias("zipf_slope"),
    )


@register(
    "l42_dup_passages",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    pos AS (SELECT doc_id, w, unnest(range(1, greatest(len(w) - 4, 1) + 1)) AS p
            FROM t),
    g AS (SELECT doc_id,
                 CASE WHEN len(w) >= 5 THEN array_to_string(w[p:p+4], ' ')
                      ELSE array_to_string(w, ' ') END AS gram
          FROM pos),
    dg AS (SELECT doc_id, gram, COUNT(*) AS cnt FROM g GROUP BY 1, 2)
    SELECT gram, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(cnt) AS BIGINT) AS n_occ,
           MIN(doc_id) AS doc_lo, MAX(doc_id) AS doc_hi
    FROM dg GROUP BY gram HAVING COUNT(*) >= 2
    """,
)
def l42_dup_passages(spark, sf_dir):
    """Cross-document duplicated-passage inventory — the audit view behind
    exact-substring training-data dedup (Lee et al. 2022 drop repeated
    >=50-token spans; here the span unit is a word-5-gram, sized to the
    ~54-token synthetic docs): every 5-gram that occurs in >=2 distinct
    documents, with its document frequency, total occurrence count, and an
    example doc pair to inspect.  Complements l35 (which scores each DOC by
    its duplicated fraction) by inventorying the PASSAGES themselves — the
    table you'd feed a span-removal pass.

    Scale shape: identical to l35's df branch — the exploded gram stream is
    compressed to (doc_id, gram, cnt) by a doc_id-clustered aggregate
    (fanout_by pre-partitions on doc_id: no extra exchange), and only that
    per-doc-DISTINCT-gram stream shuffles once on gram for the inventory
    rollup.  Output is bounded by |distinct shared grams|, not corpus size."""
    from google_analytics_dataframes_spark.io import fanout_by

    docs = T(spark, sf_dir, "documents").select("doc_id", "text")
    grams = fanout_by(docs, "doc_id").select(
        "doc_id", F.explode(D.word_shingles("text", 5)).alias("gram")
    )
    dg = grams.groupBy("doc_id", "gram").agg(F.count("*").alias("cnt"))
    return (
        dg.groupBy("gram")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("cnt").alias("n_occ"),
            F.min("doc_id").alias("doc_lo"),
            F.max("doc_id").alias("doc_hi"),
        )
        .filter(F.col("n_docs") >= 2)
    )


def _jl_proj_expr(k: int) -> str:
    """One output coordinate of the seeded Johnson-Lindenstrauss projection:
    a sequential left-fold of emb[j] * R(j, k) with the matrix entry
    R(j, k) = ((j*31 + k*17 + 7) % 7) - 3 computed in exact integer
    arithmetic — so Spark and the DuckDB oracle evaluate the SAME float
    operations in the SAME order and agree bitwise before the terminal
    round(6)."""
    return (
        "round(aggregate(transform(sequence(0, size(embedding) - 1), "
        f"j -> CAST(element_at(embedding, j + 1) AS DOUBLE) "
        f"* CAST((j * 31 + {k} * 17 + 7) % 7 - 3 AS DOUBLE)), "
        f"CAST(0.0 AS DOUBLE), (a, x) -> a + x), 6) AS p{k}"
    )


@register(
    "l43_random_projection",
    oracle="SELECT vec_id, "
    + ", ".join(
        "round(list_reduce(list_transform(range(len(embedding)), "
        f"j -> CAST(embedding[j + 1] AS DOUBLE) "
        f"* ((j * 31 + {k} * 17 + 7) % 7 - 3)), (a, b) -> a + b), 6) AS p{k}"
        for k in range(16)
    )
    + " FROM embeddings",
)
def l43_random_projection(spark, sf_dir):
    """Seeded random projection (Johnson-Lindenstrauss) of the 64-d
    embeddings down to 16-d — the standard pre-ANN dimensionality reducer:
    project once, index/cluster in the cheap space, verify survivors in the
    original space (pairs with l13/l14).  The projection matrix is a fixed
    integer-deterministic sparse-JL surrogate (entries in [-3, 3] from a
    linear-congruential formula), so the op needs no fitted state, no
    broadcast, and re-runs identically on any executor.

    Scale shape: a pure narrow per-row map over one scan — zero exchanges,
    zero Python; 16 sequential folds inside whole-stage codegen.  The
    DuckDB oracle mirrors the exact fold order (left fold from +0.0), so
    values agree bitwise before the terminal round(6)."""
    emb = T(spark, sf_dir, "embeddings")
    return emb.select("vec_id", *[F.expr(_jl_proj_expr(k)) for k in range(16)])


@register(
    "l44_clean_corpus",
    oracle="""
    WITH RECURSIVE docs5 AS (SELECT doc_id, text FROM documents WHERE source = 'src5'),
    pos AS (SELECT doc_id, text,
                   unnest(range(1, greatest(len(text) - 2, 1) + 1)) AS p
            FROM docs5),
    grams AS (SELECT DISTINCT doc_id, substr(text, CAST(p AS INTEGER), 3) AS gram
              FROM pos),
    sizes AS (SELECT doc_id, COUNT(*) AS sz FROM grams GROUP BY doc_id),
    inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
              FROM grams a JOIN grams b
                ON a.gram = b.gram AND a.doc_id < b.doc_id
              GROUP BY 1, 2),
    pairs AS (SELECT i.doc_a, i.doc_b
              FROM inter i
              JOIN sizes sa ON sa.doc_id = i.doc_a
              JOIN sizes sb ON sb.doc_id = i.doc_b
              WHERE 100 * i.inter >= 60 * (sa.sz + sb.sz - i.inter)),
    edges AS (SELECT doc_a AS a, doc_b AS b FROM pairs
              UNION ALL SELECT doc_b, doc_a FROM pairs),
    reach AS (SELECT a, b FROM edges
              UNION
              SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
    comp AS (SELECT a AS doc_id, least(a, MIN(b)) AS cluster_id
             FROM reach GROUP BY a),
    dropped AS (SELECT doc_id FROM comp WHERE doc_id != cluster_id),
    w3 AS (SELECT doc_id, string_split(text, ' ') AS w FROM docs5),
    wp AS (SELECT doc_id, w,
                  unnest(range(1, greatest(len(w) - 2, 1) + 1)) AS p
           FROM w3),
    ws AS (SELECT DISTINCT doc_id,
                  CASE WHEN len(w) >= 3 THEN array_to_string(w[p:p+2], ' ')
                       ELSE array_to_string(w, ' ') END AS sh
           FROM wp),
    wsizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM ws GROUP BY doc_id),
    evt AS (SELECT string_split(text, ' ') AS w FROM documents
            WHERE source = 'src2'),
    evp AS (SELECT w, unnest(range(1, greatest(len(w) - 2, 1) + 1)) AS p
            FROM evt),
    evs AS (SELECT DISTINCT
                   CASE WHEN len(w) >= 3 THEN array_to_string(w[p:p+2], ' ')
                        ELSE array_to_string(w, ' ') END AS sh
            FROM evp),
    shared AS (SELECT t.doc_id, COUNT(*) AS n_shared
               FROM ws t JOIN evs e USING (sh) GROUP BY t.doc_id),
    q AS (SELECT doc_id,
                 CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
                 round(1.0 / (1.0 + exp(-(
                     0.5 * (CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
                            / len(string_split(text, ' ')))
                   + 0.3 * ln(1.0 + len(string_split(text, ' ')))
                   - 1.5 * (CAST(len(list_filter(string_split(text, ' '),
                              t -> t IN ('spark','join','filter','window','data',
                                         'query','table','row','value','agg'))) AS DOUBLE)
                            / len(string_split(text, ' ')))))), 4) AS quality
          FROM docs5)
    SELECT q.doc_id, q.quality,
           round(COALESCE(s.n_shared, 0) / CAST(z.n_sh AS DOUBLE), 6) AS contam_frac,
           try_cast(concat('0x', substr(md5('shard' || CAST(q.doc_id AS VARCHAR)), 1, 4))
                    AS BIGINT) % 8 AS shard,
           q.n_tokens
    FROM q JOIN wsizes z USING (doc_id)
    LEFT JOIN shared s USING (doc_id)
    WHERE q.doc_id NOT IN (SELECT doc_id FROM dropped)
      AND q.quality >= 0.68
      AND COALESCE(s.n_shared, 0) / CAST(z.n_sh AS DOUBLE) <= 0.05
    """,
)
def l44_clean_corpus(spark, sf_dir):
    """The capstone: one end-to-end corpus-cleaning pipeline a training run
    would actually execute, composed entirely from the registered operators
    — quality filter (l16's logistic score >= 0.68), eval-set
    decontamination (l30's shingle overlap vs the src2 eval slice, drop
    above 5% overlap fraction), near-dup cluster election (l29/l33's
    keeper-only survivors via the shared src5 chain — the gram->pairs->CC
    materialization is computed ONCE per session across l12/l29/l33/l44),
    and deterministic training-shard assignment (l22's md5 bucketing,
    independent salt).  Output: the surviving docs with their scores and
    shard — the manifest a trainer reads.

    Scale shape: the corpus is scanned narrowly for quality+tokens; the
    shingle stream is doc-local (array_distinct inside the row, no
    (doc, shingle) distinct shuffle) and pre-clustered on doc_id so the
    overlap aggregate is exchange-free; the eval side reduces then
    broadcasts; the drop-list (non-keeper ids) is cluster-bounded and
    broadcast anti-joined.  One doc_id shuffle to marry quality to
    contamination is the only corpus-sized exchange."""
    from google_analytics_dataframes_spark.io import fanout_by

    docs = T(spark, sf_dir, "documents").filter(F.col("source") == "src5")
    ev = T(spark, sf_dir, "documents").filter(F.col("source") == "src2")
    q = X.quality_scores(docs).select("doc_id", "n_tokens", "quality")
    sh = fanout_by(docs, "doc_id").select(
        "doc_id",
        F.explode(F.array_distinct(D.word_shingles("text", 3))).alias("sh"),
    )
    ev_sh = (
        ev.select(F.explode(D.word_shingles("text", 3)).alias("sh"))
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    contam = (
        sh.join(F.broadcast(ev_sh), "sh", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_sh"),
            F.sum(F.coalesce(F.col("_hit"), F.lit(0))).alias("n_shared"),
        )
    )
    cc = _src5_clusters(spark, sf_dir)
    dropped = cc.filter(F.col("doc_id") != F.col("cluster_id")).select("doc_id")
    frac = F.col("n_shared") / F.col("n_sh")
    shard = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("shard"), F.col("doc_id").cast("string"))), 1, 4
            ),
            16,
            10,
        ).cast("long")
        % 8
    ).alias("shard")
    return (
        q.join(contam, "doc_id")
        .join(F.broadcast(dropped), "doc_id", "left_anti")
        .filter((F.col("quality") >= 0.68) & (frac <= 0.05))
        .select(
            "doc_id",
            "quality",
            F.round(frac, 6).alias("contam_frac"),
            shard,
            "n_tokens",
        )
    )


@register(
    "l45_corpus_shuffle",
    oracle="""
    WITH p AS (
      SELECT doc_id,
             ROW_NUMBER() OVER (
               ORDER BY md5('l45:' || CAST(doc_id AS VARCHAR)), doc_id) AS pos
      FROM documents)
    SELECT doc_id, CAST(pos AS BIGINT) AS pos,
           CAST((pos - 1) // 64 AS BIGINT) AS out_file
    FROM p
    """,
)
def l45_corpus_shuffle(spark, sf_dir):
    """Deterministic global corpus shuffle (operators/sampling.py
    global_shuffle): every document gets a dense position 1..N in
    md5-of-key order plus its output file index — the "shuffle then
    shard" that fixes a reproducible training order before sequence
    packing (pairs with l27; same salted-hash determinism contract as
    l22's split).

    Scale shape: the oracle's `ROW_NUMBER() OVER (ORDER BY hash)` is
    exactly the plan this operator must NOT run — a partition-less window
    sorts the corpus on one task.  Instead: 256 hash-prefix shards, a
    per-shard bounded row_number (one exchange), and shard offsets via
    the 256-row broadcast triangle join (sequence_pack's phase 2).
    Positions are provably identical because the shard is a prefix of the
    sort key.  tests/test_plans.py pins the window's partition spec."""
    from google_analytics_dataframes_spark.operators.sampling import global_shuffle

    docs = T(spark, sf_dir, "documents").select("doc_id")
    return global_shuffle(docs, "doc_id", salt="l45:", docs_per_file=64)


@register(
    "l46_dsir_weights",
    oracle="""
    WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token
                 FROM documents),
    bg AS (SELECT token, COUNT(*) AS nb FROM tok GROUP BY token),
    tgt AS (SELECT token, COUNT(*) AS nt
            FROM (SELECT unnest(string_split(text, ' ')) AS token
                  FROM documents WHERE lang = 'en')
            GROUP BY token),
    tot AS (SELECT (SELECT COUNT(*) FROM tok) AS total_b,
                   (SELECT COUNT(*) FROM tok t
                      JOIN documents d USING (doc_id)
                     WHERE d.lang = 'en') AS total_t,
                   (SELECT COUNT(*) FROM bg) AS v),
    lm AS (SELECT bg.token,
                  ln(CAST(COALESCE(nt, 0) + 1 AS DOUBLE)
                     / CAST(total_t + v AS DOUBLE))
                  - ln(CAST(nb + 1 AS DOUBLE) / CAST(total_b + v AS DOUBLE))
                    AS lr
           FROM bg LEFT JOIN tgt USING (token) CROSS JOIN tot)
    SELECT t.doc_id, COUNT(*) AS n_tokens,
           round(CAST(SUM(CAST(lr AS DECIMAL(38,9))) AS DOUBLE), 6)
             AS dsir_logweight
    FROM tok t JOIN lm USING (token)
    GROUP BY t.doc_id
    """,
)
def l46_dsir_weights(spark, sf_dir):
    """DSIR-style importance weights (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): score every document by
    sum over its tokens of log p_target(w) - log p_background(w), with the
    target LM fit on the English slice and the background LM on the whole
    corpus, both add-1 smoothed over the background vocabulary.  High
    scores = "looks like the target distribution" — the standard cheap
    domain-upsampling signal before mixture sampling (l23).

    Scale shape (l34's subtree economy, tightened again round 4 — 6
    exchanges -> 4): BOTH LMs come out of ONE token pipeline — explode
    once with an ``is_en`` flag, then a single groupBy(token) computing
    ``nb = count(*)`` and ``nt0 = sum(is_en)`` (target tokens ⊆
    background vocab, so the flagged sum IS the oracle's ``coalesce(nt,
    0)`` with no left join at all).  Map-side combine compresses that one
    shuffle to |V| rows/partition.  The three scalars the smoothing needs
    — |V|, total background tokens, total target tokens — are window
    aggregates over the |V|-row count frame itself, not separate corpus
    scans: Catalyst re-expands every reference to an unmaterialized
    frame, and the first cut of this query paid 10 exchanges rebuilding
    the token pipeline for each scalar (round 3 got it to 6 with two
    pipelines; this cut merges them).  The partition-less window is
    vocab-sized (l37's documented exception).  The finished log-ratio
    table — |V| rows — broadcasts onto the doc-clustered token stream,
    so the per-doc sum is exchange-free.  Every arithmetic step
    (int->double cast, double division, ln) is evaluated identically by
    DuckDB; the per-doc sum uses decimal accumulation so the weight is
    summation-order-independent (it is l49's keep/drop input)."""
    from pyspark.sql import Window

    from google_analytics_dataframes_spark.io import fanout_by

    docs = T(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    tok = fanout_by(docs, "doc_id").select(
        "doc_id", F.explode(X.tokens("text")).alias("token")
    )
    counts = (
        fanout(docs)
        .select("lang", F.explode(X.tokens("text")).alias("token"))
        .groupBy("token")
        .agg(
            F.count("*").alias("nb"),
            F.sum(
                F.when(F.col("lang") == "en", F.lit(1)).otherwise(F.lit(0))
            ).alias("nt0"),
        )
    )
    w = Window.partitionBy()  # vocab-sized frame: |V| rows total
    counted = counts.select(
        "token",
        "nb",
        "nt0",
        F.count("*").over(w).cast("long").alias("v"),
        F.sum("nb").over(w).cast("long").alias("total_b"),
        F.sum("nt0").over(w).cast("long").alias("total_t"),
    )
    lr = (
        F.log(
            (F.col("nt0") + 1).cast("double")
            / (F.col("total_t") + F.col("v")).cast("double")
        )
        - F.log(
            (F.col("nb") + 1).cast("double")
            / (F.col("total_b") + F.col("v")).cast("double")
        )
    ).alias("lr")
    lm = counted.select("token", lr)
    return (
        tok.join(F.broadcast(lm), "token")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.round(
                F.sum(F.col("lr").cast("decimal(38,9)")).cast("double"), 6
            ).alias("dsir_logweight"),
        )
    )


@register(
    "l47_nearest_centroid",
    oracle="""
    WITH cells AS (SELECT label, unnest(range(0, 64)) AS dim,
                          unnest(CAST(embedding AS DOUBLE[])) AS x
                   FROM embeddings),
    cent AS (SELECT label, dim,
                    CAST(CAST(SUM(CAST(x AS DECIMAL(30,15))) AS STRING) AS DOUBLE)
                    / COUNT(x) AS cx
             FROM cells GROUP BY label, dim),
    cvec AS (SELECT label, list(cx ORDER BY dim) AS centroid
             FROM cent GROUP BY label),
    scored AS (SELECT e.vec_id, e.label AS true_label, c.label AS cell,
                      list_dot_product(e.v, c.centroid)
                      / (sqrt(list_dot_product(e.v, e.v))
                         * sqrt(list_dot_product(c.centroid, c.centroid))) AS cos
               FROM (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
                     FROM embeddings) e
               CROSS JOIN cvec c),
    best AS (SELECT vec_id, true_label, cell,
                    ROW_NUMBER() OVER (PARTITION BY vec_id
                                       ORDER BY cos DESC, cell) AS rk
             FROM scored)
    SELECT true_label, cell AS assigned_label,
           CAST(COUNT(*) AS BIGINT) AS n_vectors
    FROM best WHERE rk = 1 GROUP BY true_label, assigned_label
    """,
)
def l47_nearest_centroid(spark, sf_dir):
    """Nearest-centroid assignment over the whole embedding table — the
    k-means assignment step / clustering-purity audit: every vector is
    assigned to its max-cosine label centroid, output is the (true_label,
    assigned_label) confusion matrix.  Uses the exact-decimal centroids +
    sequential-fold cosine determinism contract from l14.

    Scale shape: the centroid table is aggregated once (640 cells), packed
    into ONE broadcast row as a cell-sorted array, and the per-vector
    argmax is a narrow fold over that array — the corpus is scanned once
    with ZERO data-sized exchanges (the oracle's per-vector ROW_NUMBER
    window would shuffle N x |cells| rows; the fold ships N rows into the
    final confusion-matrix aggregate, whose partial agg compresses each
    partition to <= |labels|^2 rows).  First-strictly-greater fold over
    the cell-ascending array == the oracle's (cos DESC, cell) tie-break."""
    from google_analytics_dataframes_spark.operators.similarity import (
        as_double,
        cosine,
        label_centroids,
    )

    emb = T(spark, sf_dir, "embeddings")
    cent_row = (
        label_centroids(emb)
        .select(F.struct(F.col("label").alias("cell"), "centroid").alias("c"))
        .agg(F.sort_array(F.collect_list("c")).alias("cents"))
    )
    v = as_double("embedding")
    scored = emb.select(
        "vec_id", F.col("label").alias("true_label"), v.alias("v")
    ).crossJoin(F.broadcast(cent_row))
    sc = F.transform(
        "cents",
        lambda c: F.struct(
            cosine(F.col("v"), c.getField("centroid")).alias("cos"),
            c.getField("cell").alias("cell"),
        ),
    )
    init = F.struct(
        F.lit(float("-inf")).alias("cos"), F.lit(-1).cast("int").alias("cell")
    )
    best = F.aggregate(
        sc, init, lambda acc, s: F.when(s.getField("cos") > acc.getField("cos"), s).otherwise(acc)
    )
    return (
        scored.select("true_label", best.getField("cell").alias("assigned_label"))
        .groupBy("true_label", "assigned_label")
        .agg(F.count("*").alias("n_vectors"))
    )


@register(
    "l48_ppl_buckets",
    oracle="""
    WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token
                 FROM documents),
    freq AS (SELECT token, COUNT(*) AS n FROM tok GROUP BY token),
    tot AS (SELECT SUM(n) AS total FROM freq),
    sc AS (SELECT t.doc_id, COUNT(*) AS n_tokens,
                  round(CAST(SUM(CAST(ln(f.n / CAST(tot.total AS DOUBLE))
                                      AS DECIMAL(38,9))) AS DOUBLE)
                        / COUNT(*), 6) AS s
           FROM tok t JOIN freq f USING (token) CROSS JOIN tot
           GROUP BY t.doc_id),
    lab AS (SELECT d.lang, sc.doc_id, sc.n_tokens, sc.s,
                   row_number() OVER (PARTITION BY d.lang
                                      ORDER BY sc.s DESC, sc.doc_id) AS rn,
                   COUNT(*) OVER (PARTITION BY d.lang) AS gn
            FROM sc JOIN documents d USING (doc_id)),
    til AS (SELECT *,
                   CASE WHEN rn <= (gn % 3) * (gn // 3 + 1)
                        THEN (rn + gn // 3) // (gn // 3 + 1)
                        ELSE (gn % 3)
                             + (rn - (gn % 3) * (gn // 3 + 1)
                                + GREATEST(gn // 3, 1) - 1)
                               // GREATEST(gn // 3, 1)
                   END AS tile
            FROM lab)
    SELECT lang,
           CASE tile WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
                     ELSE 'tail' END AS ppl_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           round(CAST(SUM(CAST(s AS DECIMAL(38,9))) AS DOUBLE) / COUNT(*), 6)
             AS avg_logprob,
           MIN(s) AS min_logprob, MAX(s) AS max_logprob,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
    FROM til GROUP BY lang, ppl_bucket
    """,
)
def l48_ppl_buckets(spark, sf_dir):
    """CCNet-style perplexity bucketing (Wenzek et al. 2020): per language,
    rank documents by unigram-LM score (l34's avg log-prob — the cheap
    perplexity proxy) and cut into head / middle / tail terciles; emit
    per-(lang, bucket) census stats.  CCNet keeps head+middle and drops or
    down-samples tail — this is the audit table that decision reads.

    Scale shape: the oracle's ``ntile(3) OVER (PARTITION BY lang ORDER BY
    s DESC)`` hash-partitions on lang alone — ~6 partitions each sorting
    its full language slice on one task, the per-group flavor of the
    partition-less-window failure.  The Spark side instead computes the
    per-lang rank with :func:`operators.sampling.grouped_rank` (range
    shards monotone in the sort key + broadcast prefix offsets + bounded
    per-(lang, shard) row_number) and converts rank -> tercile with the
    closed-form ntile formula (first N%3 tiles get one extra row).  Since
    round 5 the oracle states the SAME integer closed form over
    row_number + a group count (not SQL ntile()), so both engines consume
    the identical (s DESC, doc_id) total order AND the identical
    bucket-assignment arithmetic."""
    from google_analytics_dataframes_spark.operators.sampling import grouped_rank

    scored = l34_unigram_logprob(spark, sf_dir).select(
        "doc_id", "n_tokens", F.col("avg_logprob").alias("s")
    )
    docs = T(spark, sf_dir, "documents").select("doc_id", "lang")
    # sort key: s DESC, doc_id ASC  ==  (-s) ASC, doc_id ASC; -s in [0, ~10]
    # spreads over ~80 buckets at scale 8.
    lab = grouped_rank(
        scored.join(docs, "doc_id").withColumn("_sortv", -F.col("s")),
        group_col="lang",
        sortv_col="_sortv",
        tiebreak_col="doc_id",
        bucket_scale=8,
    )
    # ntile(3) closed form in PURE INTEGER arithmetic (ceil(a/b) as
    # (a+b-1) div b) — the oracle states the identical formula with
    # DuckDB's native `//`, so neither engine touches a double on the
    # bucket-assignment path (the r04 oracle used SQL ntile(); restating
    # both sides as one shared integer formula removes the last
    # cross-engine degree of freedom in this query).
    def _idiv(a, b):
        # exact integer division for non-negative longs: (a - a%b)/b is an
        # integer-valued double well under 2^53, so the cast is exact.
        return ((a - a % b) / b).cast("long")

    q = F.floor(F.col("_gn") / 3).cast("long")
    rem = (F.col("_gn") % 3).cast("long")
    cut = rem * (q + 1)
    qq = F.greatest(q, F.lit(1).cast("long"))
    r = F.col("_rank")
    tile = F.when(r <= cut, _idiv(r + q, q + 1)).otherwise(
        rem + _idiv(r - cut + qq - 1, qq)
    )
    bucket = (
        F.when(tile == 1, "head").when(tile == 2, "middle").otherwise("tail")
    )
    return (
        lab.select("lang", "n_tokens", "s", bucket.alias("ppl_bucket"))
        .groupBy("lang", "ppl_bucket")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(
                F.sum(F.col("s").cast("decimal(38,9)")).cast("double")
                / F.count("*"),
                6,
            ).alias("avg_logprob"),
            F.min("s").alias("min_logprob"),
            F.max("s").alias("max_logprob"),
            F.sum("n_tokens").alias("total_tokens"),
        )
    )


@register(
    "l49_importance_resample",
    oracle="""
    WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token
                 FROM documents),
    bg AS (SELECT token, COUNT(*) AS nb FROM tok GROUP BY token),
    tgt AS (SELECT token, COUNT(*) AS nt
            FROM (SELECT unnest(string_split(text, ' ')) AS token
                  FROM documents WHERE lang = 'en')
            GROUP BY token),
    tot AS (SELECT (SELECT COUNT(*) FROM tok) AS total_b,
                   (SELECT COUNT(*) FROM tok t
                      JOIN documents d USING (doc_id)
                     WHERE d.lang = 'en') AS total_t,
                   (SELECT COUNT(*) FROM bg) AS v),
    lm AS (SELECT bg.token,
                  ln(CAST(COALESCE(nt, 0) + 1 AS DOUBLE)
                     / CAST(total_t + v AS DOUBLE))
                  - ln(CAST(nb + 1 AS DOUBLE) / CAST(total_b + v AS DOUBLE))
                    AS lr
           FROM bg LEFT JOIN tgt USING (token) CROSS JOIN tot),
    w AS (SELECT t.doc_id, COUNT(*) AS n_tokens,
                 round(CAST(SUM(CAST(lr AS DECIMAL(38,9))) AS DOUBLE), 6)
                   AS dsir_logweight
          FROM tok t JOIN lm USING (token) GROUP BY t.doc_id),
    p AS (SELECT doc_id, n_tokens, dsir_logweight,
                 LEAST(GREATEST(0.5 + dsir_logweight / 20.0, 0.05), 0.95)
                   AS p_keep,
                 try_cast(concat('0x',
                     substr(md5(concat('l49:', CAST(doc_id AS VARCHAR))), 1, 8))
                   AS BIGINT) / 4294967296.0 AS u
          FROM w)
    SELECT doc_id, n_tokens, dsir_logweight, round(p_keep, 8) AS p_keep
    FROM p WHERE u < p_keep
    """,
)
def l49_importance_resample(spark, sf_dir):
    """DSIR's apply step (Xie et al. 2023): importance RESAMPLING of the
    corpus using l46's log importance weights.  Each document's keep
    probability is a monotone squash of its weight — here the piecewise-
    linear surrogate clamp(0.5 + w/20, 0.05, 0.95) rather than a sigmoid,
    chosen because +, /, LEAST/GREATEST are bit-exact IEEE ops in every
    engine while exp() is libm-dependent and could flip a keep decision at
    the u ~ p boundary.  The coin is the salted-md5 uniform (same
    determinism contract as l22/l23): reproducible across runs, engines,
    partitionings, and re-shards — a doc's fate never changes.

    Scale shape: inherits l46's economy (vocab-sized LM broadcast onto the
    doc-clustered token stream; per-doc sum exchange-free), then the
    resample itself is a pure projection+filter — no shuffle, no RNG
    state, pushdown-friendly."""
    w = l46_dsir_weights(spark, sf_dir)
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("l49:"), F.col("doc_id").cast("string"))), 1, 8
            ),
            16,
            10,
        ).cast("long")
        / F.lit(4294967296.0)
    )
    p = F.least(
        F.greatest(F.lit(0.5) + F.col("dsir_logweight") / 20.0, F.lit(0.05)),
        F.lit(0.95),
    )
    return (
        w.withColumn("p_keep", p)
        .withColumn("_u", u)
        .filter(F.col("_u") < F.col("p_keep"))
        .select(
            "doc_id",
            "n_tokens",
            "dsir_logweight",
            # w is 6-decimal (w = k*1e-6), so p = 0.5 + w/20 = 0.5 +
            # k*5e-8 has EXACTLY 8 decimal digits, the last one 0 or 5:
            # rounding at 6 or 7 digits sits ON a .5 tie for half the rows
            # and Spark (decimal HALF_UP) vs DuckDB (binary nearest) break
            # ties differently.  round(p, 8) is the identity on the
            # decimal value — never a tie, identical doubles both engines.
            F.round("p_keep", 8).alias("p_keep"),
        )
    )


@register(
    "l76_priority_sample",
    oracle="""
    WITH pri AS (
      SELECT lang, doc_id, CAST(n_chars AS DOUBLE) AS w,
             CAST(n_chars AS DOUBLE)
               / ((try_cast(concat('0x',
                      substr(md5(concat('ps1:', CAST(doc_id AS VARCHAR))), 1, 8))
                    AS BIGINT) + 1) / 4294967296.0) AS q
      FROM documents
    ),
    rk AS (SELECT *,
                  ROW_NUMBER() OVER (PARTITION BY lang
                                     ORDER BY q DESC, doc_id) AS rn
           FROM pri),
    tau AS (SELECT lang,
                   COALESCE(MAX(CASE WHEN rn = 17 THEN q END), 0.0) AS tau
            FROM rk WHERE rn <= 17 GROUP BY lang)
    SELECT r.lang, r.doc_id, r.w, CAST(r.rn AS BIGINT) AS rank, t.tau,
           GREATEST(r.w, t.tau) AS w_hat
    FROM rk r JOIN tau t USING (lang) WHERE r.rn <= 16
    """,
)
def l76_priority_sample(spark, sf_dir):
    """Weighted sampling WITHOUT replacement — the sampling-family member
    l23/l24/l49/l52 all miss (they are Bernoulli/uniform: random output
    size).  Priority Sampling (Duffield-Lund-Thorup JACM'07) draws exactly
    k=16 docs per language with probability increasing in weight
    (n_chars), plus the tau threshold whose max(w, tau) estimator makes
    the sample answer subset-sum queries unbiasedly (variance within
    1+1/(k-1) of optimal, Szegedy STOC'06) — the "keep a fixed-budget
    weighted sketch per slice" primitive of corpus curation.

    Cross-engine exactness is the design center: priority q = w/u avoids
    the classical u^(1/w) key because pow/log are libm-dependent and an
    ulp flip at the rank-k boundary changes WHICH doc is sampled; w/u is
    one correctly-rounded division over an EXACT u (32 md5 bits + 1 over
    2^32 — a power-of-two division is exact), so both engines rank, cut,
    and estimate on identical doubles (operators/sampling.py
    priority_sample).

    Scale shape: the rank filter sits directly on the row_number window,
    which Spark rewrites to WindowGroupLimit — map tasks keep <= k+1 rows
    per language BEFORE the exchange (plan-pinned), so the corpus never
    moves; tau is a languages-sized broadcast."""
    from google_analytics_dataframes_spark.operators.sampling import priority_sample

    return priority_sample(
        T(spark, sf_dir, "documents"),
        group_col="lang",
        weight_col="n_chars",
        key_col="doc_id",
        k=16,
    )


@register(
    "l80_keeper_election",
    oracle="""
    WITH RECURSIVE docs5 AS (SELECT doc_id, text, n_chars FROM documents
                             WHERE source = 'src5'),
    pos AS (SELECT doc_id, text,
                   unnest(range(1, greatest(len(text) - 2, 1) + 1)) AS p
            FROM docs5),
    grams AS (SELECT DISTINCT doc_id, substr(text, CAST(p AS INTEGER), 3) AS gram
              FROM pos),
    sizes AS (SELECT doc_id, COUNT(*) AS sz FROM grams GROUP BY doc_id),
    inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
              FROM grams a JOIN grams b
                ON a.gram = b.gram AND a.doc_id < b.doc_id
              GROUP BY 1, 2),
    pairs AS (SELECT i.doc_a, i.doc_b
              FROM inter i
              JOIN sizes sa ON sa.doc_id = i.doc_a
              JOIN sizes sb ON sb.doc_id = i.doc_b
              WHERE 100 * i.inter >= 60 * (sa.sz + sb.sz - i.inter)),
    edges AS (SELECT doc_a AS a, doc_b AS b FROM pairs
              UNION ALL SELECT doc_b, doc_a FROM pairs),
    reach AS (SELECT a, b FROM edges
              UNION
              SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
    comp AS (SELECT a AS doc_id, least(a, MIN(b)) AS cluster_id
             FROM reach GROUP BY a),
    labeled AS (SELECT d.doc_id, d.n_chars,
                       COALESCE(c.cluster_id, d.doc_id) AS cluster_id
                FROM docs5 d LEFT JOIN comp c USING (doc_id)),
    keep AS (SELECT cluster_id, doc_id AS keeper_id
             FROM (SELECT cluster_id, doc_id,
                          ROW_NUMBER() OVER (PARTITION BY cluster_id
                             ORDER BY n_chars DESC, doc_id) AS rk
                   FROM labeled) WHERE rk = 1)
    SELECT l.doc_id, l.cluster_id, k.keeper_id,
           l.doc_id = k.keeper_id AS is_keeper
    FROM labeled l JOIN keep k USING (cluster_id)
    """,
)
def l80_keeper_election(spark, sf_dir):
    """Quality-aware keeper election — the dedup-apply policy real
    pipelines use instead of l29/l33's min-id canonicalization: within
    each near-dup cluster keep the MOST COMPLETE duplicate (max n_chars,
    doc_id tie-break), since crawl duplicates routinely differ by
    truncation and the min-id pick throws away the fuller copy.
    Composition row: l12's 3-gram Jaccard pairs -> l29's connected
    components -> per-cluster argmax election.

    Scale: the election is a (n_chars, -doc_id) struct-max aggregate on
    the cluster id — one map-side-combinable pass over the labeled docs;
    the keeper table (one row per cluster) broadcasts back.  No window
    sort over the corpus."""
    docs = (
        T(spark, sf_dir, "documents")
        .filter(F.col("source") == "src5")
        .select("doc_id", "n_chars")
    )
    cc = _src5_clusters(spark, sf_dir)
    labeled = docs.join(cc, "doc_id", "left").select(
        "doc_id",
        "n_chars",
        F.coalesce("cluster_id", "doc_id").alias("cluster_id"),
    )
    keep = labeled.groupBy("cluster_id").agg(
        F.min(
            F.struct((-F.col("n_chars")).alias("neg"), F.col("doc_id").alias("d"))
        )
        .getField("d")
        .alias("keeper_id")
    )
    return labeled.join(F.broadcast(keep), "cluster_id").select(
        "doc_id",
        "cluster_id",
        "keeper_id",
        (F.col("doc_id") == F.col("keeper_id")).alias("is_keeper"),
    )


# --------------------------------- round-12 10x slice-audit twins ----------
# VERDICT r11 item #3: finish the 10x differential for the WITHIN-CORPUS
# pair-compare family (l7/l12/l29/l33/l44/l55/l61/l61b; l70's twin lives
# in corpus_ops next to l70).  Same recipe as the l60b/l69b/l75b cross
# twins: the naive SQL oracles' quadratic join intermediate is what
# exceeds DuckDB's memory at the 10x synth, so each twin restricts the
# LOWER-id side of every pair to one deterministic doc_id residue class
# — dividing the oracle's self-join intermediate by the modulus — while
# the OTHER side (full-corpus candidate generation, the actual scale
# risk) stays whole.  The engine side runs the same adaptive operators
# in their cross form (incoming = the residue slice, existing = the full
# corpus), so threshold algebra, candidate generation, and cluster
# machinery are exercised end-to-end at 10x.
#
# Residue choice (measured, tools-free duckdb probe, round 12): the src5
# generator plants ALL near-dup pairs with the lower id in residue 5
# (mod 20) at every shipped SF — so (20, 5) keeps the src5 twins'
# output maximally non-vacuous (identical pair set, 20x cheaper oracle);
# l7/l61 pairs spread across residues and stay non-vacuous at (20, 5)
# from sf0.001 through sf0.1 (l61: 2/3/53 pairs).  The 10x synth
# preserves residues: copies offset doc_id by k * 5000 and 5000 % 20 = 0.
_ASLICE_MOD = 20
_ASLICE_RES = 5

#: l12's oracle CTE chain with the residue slice on the gram join's a
#: side — shared verbatim by l12b/l29b/l33b/l44b (and l55b in
#: corpus_ops), exactly like the unsliced text is shared by the
#: originals.
_SLICED_SRC5_PAIRS_CTE = f"""
    docs5 AS (SELECT doc_id, text FROM documents WHERE source = 'src5'),
    pos AS (SELECT doc_id, text,
                   unnest(range(1, greatest(len(text) - 2, 1) + 1)) AS p
            FROM docs5),
    grams AS (SELECT DISTINCT doc_id, substr(text, CAST(p AS INTEGER), 3) AS gram
              FROM pos),
    sizes AS (SELECT doc_id, COUNT(*) AS sz FROM grams GROUP BY doc_id),
    inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
              FROM grams a JOIN grams b
                ON a.gram = b.gram AND a.doc_id < b.doc_id
              WHERE a.doc_id % {_ASLICE_MOD} = {_ASLICE_RES}
              GROUP BY 1, 2),
    pairs AS (SELECT i.doc_a, i.doc_b, i.inter,
                     CAST(sa.sz + sb.sz - i.inter AS BIGINT) AS uni
              FROM inter i
              JOIN sizes sa ON sa.doc_id = i.doc_a
              JOIN sizes sb ON sb.doc_id = i.doc_b
              WHERE 100 * i.inter >= 60 * (sa.sz + sb.sz - i.inter))
"""


def _src5_sliced_pairs(spark, sf_dir):
    """The sliced-pair materialization behind the src5 twins, cached per
    (session, dataset) exactly like :func:`_src5_pairs`: incoming =
    src5 grams in the residue class, existing = ALL src5 grams, joined
    by the adaptive cross operator; pairs kept with doc_ex > doc_in so
    each unordered pair is emitted once with its lower id first —
    matching the oracle's ``a.doc_id < b.doc_id AND a.doc_id % m = r``."""
    key = _src5_key(spark, sf_dir, "sliced_pairs")
    df = _SRC5_CACHE.get(key)
    if df is None:
        docs = T(spark, sf_dir, "documents").filter(F.col("source") == "src5")
        grams = fanout(docs).select(
            "doc_id", F.explode(D.char_ngrams("text", 3)).alias("item")
        )
        inc = grams.filter(
            F.col("doc_id") % _ASLICE_MOD == _ASLICE_RES
        )
        pairs = D.jaccard_pairs_cross(inc, grams, threshold_pct=60)
        df = (
            pairs.filter(F.col("doc_ex") > F.col("doc_in"))
            .select(
                F.col("doc_in").alias("doc_a"),
                F.col("doc_ex").alias("doc_b"),
                "inter",
                F.col("uni").cast("long").alias("uni"),
            )
        )
        _SRC5_CACHE[key] = df
    return df


def _src5_sliced_clusters(spark, sf_dir):
    """Connected components over :func:`_src5_sliced_pairs`, cached — the
    sliced twin of :func:`_src5_clusters`."""
    key = _src5_key(spark, sf_dir, "sliced_clusters")
    df = _SRC5_CACHE.get(key)
    if df is None:
        pairs = _src5_sliced_pairs(spark, sf_dir).select("doc_a", "doc_b")
        df = D.connected_components(pairs)
        _SRC5_CACHE[key] = df
    return df


@register(
    "l12b_ngram_jaccard_slice",
    oracle=f"""
    WITH {_SLICED_SRC5_PAIRS_CTE}
    SELECT doc_a, doc_b, inter, uni,
           round(inter / CAST(uni AS DOUBLE), 6) AS jaccard
    FROM pairs
    """,
)
def l12b_ngram_jaccard_slice(spark, sf_dir):
    """l12's 3-gram Jaccard pairs with the lower-id side sliced to the
    residue class — the 10x-RUNNABLE audit twin (family note above).
    On the shipped corpora the emitted pair set EQUALS l12's (the src5
    generator plants every pair's lower id in residue 5 mod 20), while
    the oracle's gram self-join intermediate divides by 20 — which is
    what makes the family's 10x differential executable at all."""
    p = _src5_sliced_pairs(spark, sf_dir)
    return p.select(
        "doc_a",
        "doc_b",
        "inter",
        "uni",
        F.round(F.col("inter") / F.col("uni").cast("double"), 6).alias("jaccard"),
    )


@register(
    "l29b_dedup_clusters_slice",
    oracle=f"""
    WITH RECURSIVE {_SLICED_SRC5_PAIRS_CTE},
    edges AS (SELECT doc_a AS a, doc_b AS b FROM pairs
              UNION ALL SELECT doc_b, doc_a FROM pairs),
    reach AS (SELECT a, b FROM edges
              UNION
              SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
    comp AS (SELECT a AS doc_id, least(a, MIN(b)) AS cluster_id
             FROM reach GROUP BY a)
    SELECT d.doc_id, COALESCE(c.cluster_id, d.doc_id) AS cluster_id
    FROM docs5 d LEFT JOIN comp c USING (doc_id)
    """,
)
def l29b_dedup_clusters_slice(spark, sf_dir):
    """l29's connected components over the SLICED pair graph — proves the
    iterative min-label propagation against the recursive-CTE closure at
    10x (the unsliced edge derivation is what the synth's DuckDB memory
    could not fit; the CC machinery itself is edge-bounded and cheap)."""
    docs = T(spark, sf_dir, "documents").filter(F.col("source") == "src5")
    cc = _src5_sliced_clusters(spark, sf_dir)
    return docs.select("doc_id").join(cc, "doc_id", "left").select(
        "doc_id",
        F.coalesce(F.col("cluster_id"), F.col("doc_id")).alias("cluster_id"),
    )


@register(
    "l33b_dedup_apply_slice",
    oracle=f"""
    WITH RECURSIVE {_SLICED_SRC5_PAIRS_CTE},
    edges AS (SELECT doc_a AS a, doc_b AS b FROM pairs
              UNION ALL SELECT doc_b, doc_a FROM pairs),
    reach AS (SELECT a, b FROM edges
              UNION
              SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
    comp AS (SELECT a AS doc_id, least(a, MIN(b)) AS cluster_id
             FROM reach GROUP BY a),
    labeled AS (SELECT d.doc_id, COALESCE(c.cluster_id, d.doc_id) AS cluster_id
                FROM docs5 d LEFT JOIN comp c USING (doc_id))
    SELECT cluster_id AS keep_id, COUNT(*) AS cluster_size
    FROM labeled GROUP BY cluster_id
    """,
)
def l33b_dedup_apply_slice(spark, sf_dir):
    """l33's keeper election applied to the sliced cluster frame — the
    twin completes the sliced cascade (pairs -> clusters -> keepers) so
    every stage of the dedup chain has 10x evidence."""
    docs = T(spark, sf_dir, "documents").filter(F.col("source") == "src5")
    cc = _src5_sliced_clusters(spark, sf_dir)
    labeled = docs.select("doc_id").join(cc, "doc_id", "left").select(
        "doc_id",
        F.coalesce(F.col("cluster_id"), F.col("doc_id")).alias("cluster_id"),
    )
    return labeled.groupBy(F.col("cluster_id").alias("keep_id")).agg(
        F.count("*").alias("cluster_size")
    )


@register(
    "l44b_clean_corpus_slice",
    oracle=f"""
    WITH RECURSIVE {_SLICED_SRC5_PAIRS_CTE},
    edges AS (SELECT doc_a AS a, doc_b AS b FROM pairs
              UNION ALL SELECT doc_b, doc_a FROM pairs),
    reach AS (SELECT a, b FROM edges
              UNION
              SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
    comp AS (SELECT a AS doc_id, least(a, MIN(b)) AS cluster_id
             FROM reach GROUP BY a),
    dropped AS (SELECT doc_id FROM comp WHERE doc_id != cluster_id),
    w3 AS (SELECT doc_id, string_split(text, ' ') AS w FROM docs5),
    wp AS (SELECT doc_id, w,
                  unnest(range(1, greatest(len(w) - 2, 1) + 1)) AS p
           FROM w3),
    ws AS (SELECT DISTINCT doc_id,
                  CASE WHEN len(w) >= 3 THEN array_to_string(w[p:p+2], ' ')
                       ELSE array_to_string(w, ' ') END AS sh
           FROM wp),
    wsizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM ws GROUP BY doc_id),
    evt AS (SELECT string_split(text, ' ') AS w FROM documents
            WHERE source = 'src2'),
    evp AS (SELECT w, unnest(range(1, greatest(len(w) - 2, 1) + 1)) AS p
            FROM evt),
    evs AS (SELECT DISTINCT
                   CASE WHEN len(w) >= 3 THEN array_to_string(w[p:p+2], ' ')
                        ELSE array_to_string(w, ' ') END AS sh
            FROM evp),
    shared AS (SELECT t.doc_id, COUNT(*) AS n_shared
               FROM ws t JOIN evs e USING (sh) GROUP BY t.doc_id),
    q AS (SELECT doc_id,
                 CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
                 round(1.0 / (1.0 + exp(-(
                     0.5 * (CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
                            / len(string_split(text, ' ')))
                   + 0.3 * ln(1.0 + len(string_split(text, ' ')))
                   - 1.5 * (CAST(len(list_filter(string_split(text, ' '),
                              t -> t IN ('spark','join','filter','window','data',
                                         'query','table','row','value','agg'))) AS DOUBLE)
                            / len(string_split(text, ' ')))))), 4) AS quality
          FROM docs5)
    SELECT q.doc_id, q.quality,
           round(COALESCE(s.n_shared, 0) / CAST(z.n_sh AS DOUBLE), 6) AS contam_frac,
           try_cast(concat('0x', substr(md5('shard' || CAST(q.doc_id AS VARCHAR)), 1, 4))
                    AS BIGINT) % 8 AS shard,
           q.n_tokens
    FROM q JOIN wsizes z USING (doc_id)
    LEFT JOIN shared s USING (doc_id)
    WHERE q.doc_id NOT IN (SELECT doc_id FROM dropped)
      AND q.quality >= 0.68
      AND COALESCE(s.n_shared, 0) / CAST(z.n_sh AS DOUBLE) <= 0.05
    """,
)
def l44b_clean_corpus_slice(spark, sf_dir):
    """l44's end-to-end cleaning pipeline with the drop-list derived from
    the SLICED cluster frame — the capstone's 10x audit twin: quality
    scoring, eval-set decontamination, and shard assignment are linear
    and identical to l44; only the near-dup election consumes the
    residue-sliced pair graph (the one quadratic-oracle ingredient)."""
    from google_analytics_dataframes_spark.io import fanout_by

    docs = T(spark, sf_dir, "documents").filter(F.col("source") == "src5")
    ev = T(spark, sf_dir, "documents").filter(F.col("source") == "src2")
    q = X.quality_scores(docs).select("doc_id", "n_tokens", "quality")
    sh = fanout_by(docs, "doc_id").select(
        "doc_id",
        F.explode(F.array_distinct(D.word_shingles("text", 3))).alias("sh"),
    )
    ev_sh = (
        ev.select(F.explode(D.word_shingles("text", 3)).alias("sh"))
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    contam = (
        sh.join(F.broadcast(ev_sh), "sh", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_sh"),
            F.sum(F.coalesce(F.col("_hit"), F.lit(0))).alias("n_shared"),
        )
    )
    cc = _src5_sliced_clusters(spark, sf_dir)
    dropped = cc.filter(F.col("doc_id") != F.col("cluster_id")).select("doc_id")
    frac = F.col("n_shared") / F.col("n_sh")
    shard = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("shard"), F.col("doc_id").cast("string"))), 1, 4
            ),
            16,
            10,
        ).cast("long")
        % 8
    ).alias("shard")
    return (
        q.join(contam, "doc_id")
        .join(F.broadcast(dropped), "doc_id", "left_anti")
        .filter((F.col("quality") >= 0.68) & (frac <= 0.05))
        .select(
            "doc_id",
            "quality",
            F.round(frac, 6).alias("contam_frac"),
            shard,
            "n_tokens",
        )
    )


@register(
    "l7b_simjoin_slice",
    oracle=f"""
    WITH en AS (SELECT doc_id, text FROM documents WHERE lang = 'en'),
    toks AS (SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS tok FROM en),
    sizes AS (SELECT doc_id, COUNT(*) AS sz FROM toks GROUP BY doc_id),
    inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
              FROM toks a JOIN toks b ON a.tok = b.tok AND a.doc_id < b.doc_id
              WHERE a.doc_id % {_ASLICE_MOD} = {_ASLICE_RES}
              GROUP BY 1, 2)
    SELECT i.doc_a, i.doc_b, i.inter,
           CAST(sa.sz + sb.sz - i.inter AS BIGINT) AS uni,
           round(CAST(i.inter AS DOUBLE) / (sa.sz + sb.sz - i.inter), 6)
             AS jaccard
    FROM inter i
    JOIN sizes sa ON sa.doc_id = i.doc_a
    JOIN sizes sb ON sb.doc_id = i.doc_b
    WHERE 100 * i.inter >= 40 * (sa.sz + sb.sz - i.inter)
    """,
)
def l7b_simjoin_slice(spark, sf_dir):
    """l7's token-set Jaccard join (>=40%, English slice) with the
    lower-id side residue-sliced — unlike the src5 twins this one prunes
    real output (en pairs spread across all residues, ~1/20 kept), and
    unlike them it exercises the LARGE-vocabulary cross regime (word
    tokens blow the bitmask bound, so the router takes the
    inverted-index/prefix path) at 10x.

    Round 15 (VERDICT r14 item #4): router stats served from the
    ``simjoin_token_stats`` catalog row (n_items = slice + corpus item
    rows, n_in_docs = slice docs, vocab coverage enforced in-plan) —
    probe jobs gone from the timed path.  Same bitmask-regime-only
    gating as l7: with the vocabulary past the bound the cross router's
    candidate-generation strategies need the probe path's persists, so
    the stats are withheld and behavior is unchanged (that is the 10x
    regime this docstring already describes)."""
    stats = _simjoin_stats(spark, sf_dir)
    docs = T(spark, sf_dir, "documents").filter(F.col("lang") == "en")
    toks = docs.select(
        "doc_id", F.explode(F.array_distinct(D.tokens("text"))).alias("item")
    )
    inc = toks.filter(F.col("doc_id") % _ASLICE_MOD == _ASLICE_RES)
    cross_stats = None
    if stats["vocab"] is not None:  # cross bitmask bound is 4096 = max_vocab
        cross_stats = {
            "n_items": stats["n_slice_items"] + stats["n_items"],
            "vocab": stats["vocab"],
            "n_in_docs": stats["n_slice_docs"],
        }
    pairs = D.jaccard_pairs_cross(inc, toks, threshold_pct=40, stats=cross_stats)
    return pairs.filter(F.col("doc_ex") > F.col("doc_in")).select(
        F.col("doc_in").alias("doc_a"),
        F.col("doc_ex").alias("doc_b"),
        "inter",
        F.col("uni").cast("long").alias("uni"),
        F.round(F.col("inter") / F.col("uni").cast("double"), 6).alias("jaccard"),
    )


_SLICED_SUBSTR_ORACLE = f"""
    WITH w AS (
      SELECT doc_id, p, substr(text, CAST(p AS INTEGER), 30) AS win
      FROM (SELECT doc_id, text,
                   unnest(range(1, greatest(len(text) - 29, 0) + 1)) AS p
            FROM documents)
    ),
    m AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.p AS pa, b.p AS pb
          FROM w a JOIN w b ON a.win = b.win AND a.doc_id < b.doc_id
          WHERE a.doc_id % {_ASLICE_MOD} = {_ASLICE_RES}),
    d AS (SELECT doc_a, doc_b, pa - pb AS diag, pa,
                 pa - row_number() OVER (PARTITION BY doc_a, doc_b, pa - pb
                                         ORDER BY pa) AS isl
          FROM m),
    r AS (SELECT doc_a, doc_b, COUNT(*) AS n_win,
                 MAX(pa) - MIN(pa) + 30 AS run_len
          FROM d GROUP BY doc_a, doc_b, diag, isl)
    SELECT doc_a, doc_b, CAST(SUM(n_win) AS BIGINT) AS shared_windows,
           CAST(MAX(run_len) AS BIGINT) AS max_run
    FROM r GROUP BY doc_a, doc_b
"""


@register("l61c_substr_slice", oracle=_SLICED_SUBSTR_ORACLE)
def l61c_substr_slice(spark, sf_dir):
    """l61's ExactSubstr span detection with the lower-id window stream
    residue-sliced (operators/dedup.exact_substr_spans a_residue hook) —
    the raw-key strategy's 10x audit twin: the b-side window stream
    (full-corpus candidate generation) stays whole."""
    return D.exact_substr_spans(
        T(spark, sf_dir, "documents").select("doc_id", "text"),
        min_len=30,
        a_residue=(_ASLICE_MOD, _ASLICE_RES),
    )


@register("l61d_substr_slice_hashed", oracle=_SLICED_SUBSTR_ORACLE)
def l61d_substr_slice_hashed(spark, sf_dir):
    """l61b's HASHED-key ExactSubstr strategy on the identical slice —
    shares l61c's oracle text by construction, so the driver proves the
    8-byte-shuffle plan and the raw-key plan emit the same span table at
    10x (the l60b/l69b 'two physical strategies, one answer' pattern)."""
    return D.exact_substr_spans(
        T(spark, sf_dir, "documents").select("doc_id", "text"),
        min_len=30,
        hashed=True,
        a_residue=(_ASLICE_MOD, _ASLICE_RES),
    )
