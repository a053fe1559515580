"""§2.10 UDF / UDAF / UDTF surface (SURVEY.md).

The reference's "UDF surface" is plain Python post-processing on pandas
DataFrames [K]; here it is formalized on Spark's three Python boundaries
(patterns per SNIPPETS.md:104-111, 156-181):

* ud1 row-scalar UDF — the slow path, kept ONLY as surface coverage; every
  hot-path operator elsewhere uses built-ins or Arrow-batched pandas UDFs.
* ud2/ud4 Arrow-vectorized scalar / grouped-agg pandas UDFs (~10-100x the
  row UDF's throughput — SURVEY.md §3.2's third boundary).
* ud3 applyInPandas grouped-map, ud5 UDTF, ud6 mapInPandas partition
  iterator (bounded batches — no per-group/partition collect).

Oracle pairing: each UDF's logic is deterministic arithmetic re-expressed in
ANSI SQL; transcendental outputs get terminal round(4).
"""

from __future__ import annotations

import math

import pandas as pd

from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf, udf
from pyspark.sql.types import DoubleType, LongType

from google_analytics_dataframes_spark.registry import register
from google_analytics_dataframes_spark.queries._util import T


@register(
    "ud1_scalar_udf",
    oracle="""
    SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words
    FROM documents
    """,
)
def ud1_scalar_udf(spark, sf_dir):
    """Row-at-a-time Python UDF (surface row — NOT the perf path)."""

    @udf(LongType())
    def word_count(text: str) -> int:
        return len(text.split(" ")) if text else 0

    return T(spark, sf_dir, "documents").select(
        "doc_id", word_count("text").alias("n_words")
    )


@register(
    "ud2_pandas_udf",
    oracle="""
    SELECT event_id,
           round(0.5 * value + ln(1 + CAST(json_extract_string(props, '$.k') AS BIGINT)), 4)
             AS score
    FROM events
    """,
)
def ud2_pandas_udf(spark, sf_dir):
    """Arrow-vectorized scalar pandas UDF (numpy batch math)."""
    import numpy as np

    @pandas_udf(DoubleType())
    def score(value: pd.Series, k: pd.Series) -> pd.Series:
        return (0.5 * value + np.log1p(k)).round(4)

    ev = T(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return ev.select("event_id", score(F.col("value"), k).alias("score"))


@register(
    "ud3_grouped_map",
    oracle="""
    SELECT event_id,
           round((value - avg(value) OVER (PARTITION BY event_type))
                 / stddev_samp(value) OVER (PARTITION BY event_type), 4) AS z
    FROM events
    """,
)
def ud3_grouped_map(spark, sf_dir):
    """Grouped-map applyInPandas: per-group z-score (SNIPPETS.md:73-77
    normalize pattern).  pandas' std is ddof=1 == stddev_samp."""

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        v = pdf["value"]
        return pd.DataFrame(
            {"event_id": pdf["event_id"], "z": ((v - v.mean()) / v.std()).round(4)}
        )

    ev = T(spark, sf_dir, "events").select("event_id", "event_type", "value")
    return ev.groupBy("event_type").applyInPandas(zscore, "event_id bigint, z double")


@register(
    "ud4_grouped_agg",
    oracle="""
    SELECT event_type,
           round(SUM(value * (1 + CAST(json_extract_string(props, '$.k') AS BIGINT)))
                 / SUM(1 + CAST(json_extract_string(props, '$.k') AS BIGINT)), 4)
             AS wmean
    FROM events GROUP BY event_type
    """,
)
def ud4_grouped_agg(spark, sf_dir):
    """Pandas UDAF (GROUPED_AGG): weighted mean with weight 1+k."""

    @pandas_udf(DoubleType())
    def wmean(value: pd.Series, weight: pd.Series) -> float:
        return round((value * weight).sum() / weight.sum(), 4)

    ev = T(spark, sf_dir, "events")
    w = (F.get_json_object("props", "$.k").cast("long") + F.lit(1)).cast("double")
    return ev.groupBy("event_type").agg(
        wmean(F.col("value"), w).alias("wmean")
    )


@register(
    "ud5_udtf",
    oracle="""
    SELECT doc_id,
           unnest(range(1, len(string_split(text, ' ')) + 1)) AS pos,
           unnest(string_split(text, ' ')) AS token
    FROM documents WHERE lang = 'de' AND source = 'src1'
    """,
)
def ud5_udtf(spark, sf_dir):
    """Python UDTF (Spark >=3.5): one row in, one row per token out —
    the generic one-to-many table function the reference genre does with
    pandas `.explode`."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="doc_id: bigint, pos: bigint, token: string")
    class Tokenize:
        def eval(self, doc_id: int, text: str):
            for i, tok in enumerate(text.split(" "), start=1):
                yield doc_id, i, tok

    d = (
        T(spark, sf_dir, "documents")
        .filter((F.col("lang") == "de") & (F.col("source") == "src1"))
        .select("doc_id", "text")
    )
    d.createOrReplaceTempView("_ud5_docs")
    spark.udtf.register("_ud5_tokenize", Tokenize)
    return spark.sql(
        "SELECT t.doc_id, t.pos, t.token FROM _ud5_docs d, "
        "LATERAL _ud5_tokenize(d.doc_id, d.text) t"
    )


@register(
    "ud6_mapinpandas",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) AS revenue
    FROM lineitem WHERE l_quantity > 40.0
    """,
)
def ud6_mapinpandas(spark, sf_dir):
    """mapInPandas whole-partition iterator: filter + derive in Arrow
    batches, never materializing the partition as one frame."""

    def per_batch(batches):
        for pdf in batches:
            out = pdf[pdf["l_quantity"] > 40.0]
            yield pd.DataFrame(
                {
                    "l_orderkey": out["l_orderkey"],
                    "l_linenumber": out["l_linenumber"],
                    "revenue": out["l_extendedprice"] * (1 - out["l_discount"]),
                }
            )

    li = T(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_discount"
    )
    return li.mapInPandas(
        per_batch, "l_orderkey bigint, l_linenumber int, revenue double"
    )


@register(
    "ud7_arrow_udf",
    oracle="""
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS BIGINT)
             * CAST(n_chars AS BIGINT) AS weight
    FROM documents
    """,
)
def ud7_arrow_udf(spark, sf_dir):
    """Arrow-OPTIMIZED Python UDF (Spark 4's ``useArrow=True``) — the
    fourth Python boundary: the same scalar signature as ud1's pickled
    row UDF, but arguments and results cross the JVM boundary as Arrow
    batches, closing most of the gap to pandas UDFs without changing the
    per-row function body.  The surface matters because it is the
    migration path for existing row-UDF code: flip one flag, keep the
    function.  Logic (word count x char count) is deterministic integer
    arithmetic the oracle restates in SQL."""

    @udf(LongType(), useArrow=True)
    def weight(text: str, n_chars: int) -> int:
        return (len(text.split(" ")) if text else 0) * n_chars

    return T(spark, sf_dir, "documents").select(
        "doc_id", weight("text", "n_chars").alias("weight")
    )


@register(
    "ud8_mapinarrow",
    oracle="""
    SELECT event_id, CAST(user_id % 97 AS BIGINT) AS bucket,
           value * 2.5 AS scaled
    FROM events
    """,
)
def ud8_mapinarrow(spark, sf_dir):
    """``mapInArrow`` partition iterator — the zero-copy sibling of ud6's
    mapInPandas: the function receives pyarrow RecordBatches directly
    (no pandas materialization), the right boundary when the Python side
    is itself Arrow-native (numpy views over batch columns here).  Same
    bounded-batch memory contract as mapInPandas; pure per-row
    arithmetic so the oracle is exact: 2.5 is exactly representable, so
    the single IEEE multiply produces bit-identical doubles in Python
    and both engines — no terminal rounding needed (Python round() is
    banker's, DuckDB's is half-away; omitting it removes the boundary
    class entirely)."""
    import pyarrow as pa

    def per_batch(batches):
        for batch in batches:
            # zero-copy numpy views over the Arrow buffers, vectorized
            # compute, arrays straight back into a RecordBatch — the
            # whole point of this boundary (a first version went through
            # to_pydict + per-row list comprehensions and measured 16.7x
            # at 10x data; this form is ~1x)
            uid = batch.column("user_id").to_numpy(zero_copy_only=False)
            val = batch.column("value").to_numpy(zero_copy_only=False)
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column("event_id"),
                    pa.array(uid % 97, pa.int64()),
                    pa.array(val * 2.5, pa.float64()),
                ],
                ["event_id", "bucket", "scaled"],
            )

    ev = T(spark, sf_dir, "events").select("event_id", "user_id", "value")
    from google_analytics_dataframes_spark.io import fanout

    return fanout(ev).mapInArrow(
        per_batch, "event_id long, bucket long, scaled double"
    )
