"""Multimodal column plumbing (SURVEY.md north star; task brief).

Images/audio/video ride through the engine as opaque `binary` columns with a
typed metadata struct; decode / feature-extraction runs as Arrow-batched
`mapInPandas` so each Python worker sees bounded batches, never a whole
partition.  The decode step itself is STUBBED (no image/audio libs in this
container): `fake_decode_features` computes deterministic stand-in features
from the raw bytes, and `decode_real` raises NotImplementedError where a
real codec would plug in.  The Spark-side plumbing — schema, batch shape,
partition flow — is real and oracle-testable via the deterministic fake.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from google_analytics_dataframes_spark.io import fanout

#: Schema of the decoded-feature output (plumbing contract).
FEATURE_SCHEMA = "doc_id bigint, n_bytes bigint, first_byte int, checksum bigint"


def to_multimodal(docs: DataFrame) -> DataFrame:
    """Wrap text payloads as the binary-blob + metadata shape a real
    image/audio table has: (id, blob binary, meta struct<n_bytes,mime>)."""
    blob = F.encode(F.col("text"), "UTF-8")
    return docs.select(
        "doc_id",
        blob.alias("blob"),
        F.struct(
            F.octet_length(blob).cast("long").alias("n_bytes"),
            F.lit("text/plain").alias("mime"),
        ).alias("meta"),
    )


def decode_real(blob: bytes) -> dict:
    """Where a real decoder (PIL / libsndfile / ffmpeg frame sampler) would
    run.  Deliberately stubbed: those libs are not in this container."""
    raise NotImplementedError(
        "real media decode is stubbed in this environment; "
        "use fake_decode_features for the plumbing path"
    )


def fake_decode_features(blobs: DataFrame) -> DataFrame:
    """Deterministic stand-in 'decode': per blob, emit byte length, first
    byte, and a mod-997 byte checksum.  Arrow batches in and out — the
    exact batch shape a real decoder UDF uses."""
    import numpy as np

    def per_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                arr = np.frombuffer(blob, dtype=np.uint8)
                feats.append(
                    (
                        int(doc_id),
                        int(arr.size),
                        int(arr[0]) if arr.size else -1,
                        int(arr.sum() % 997),
                    )
                )
            yield pd.DataFrame(
                feats, columns=["doc_id", "n_bytes", "first_byte", "checksum"]
            )

    return fanout(blobs.select("doc_id", "blob")).mapInPandas(per_batch, FEATURE_SCHEMA)


#: Plumbing contract of the resize stage: fixed-size feature payload + the
#: dimensions a real image resize would target; px_checksum (mod-997 byte
#: sum of the payload) makes the sampled bytes themselves oracle-checkable
#: without hashing raw binary across engines.
RESIZE_SCHEMA = "doc_id bigint, width int, height int, pixels binary, px_checksum bigint"

#: Plumbing contract of frame sampling: one row per sampled frame.
FRAME_SCHEMA = "doc_id bigint, frame_idx bigint, frame binary"


def fake_resize(blobs: DataFrame, width: int = 8, height: int = 8) -> DataFrame:
    """Deterministic stand-in 'resize': map each blob to a fixed
    width*height byte payload by strided byte sampling (where PIL's
    `Image.resize` would run).  Exercises the real contract — fixed-shape
    binary out, Arrow batches, per-row independence."""
    import numpy as np

    n_out = width * height

    def per_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                arr = np.frombuffer(blob, dtype=np.uint8)
                if arr.size == 0:
                    out = np.zeros(n_out, dtype=np.uint8)
                else:
                    idx = (np.arange(n_out) * arr.size) // n_out
                    out = arr[idx]
                rows.append(
                    (int(doc_id), width, height, out.tobytes(), int(out.sum() % 997))
                )
            yield pd.DataFrame(
                rows, columns=["doc_id", "width", "height", "pixels", "px_checksum"]
            )

    return fanout(blobs.select("doc_id", "blob")).mapInPandas(per_batch, RESIZE_SCHEMA)


def fake_frame_sample(
    blobs: DataFrame, frame_bytes: int = 16, every_nth: int = 4
) -> DataFrame:
    """Deterministic stand-in video 'frame sampler': treat the blob as
    consecutive `frame_bytes` frames, emit every `every_nth` one (1 row per
    sampled frame — the fan-OUT shape a real ffmpeg sampler has, so
    downstream per-frame operators see the true cardinality)."""

    def per_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                n_frames = len(blob) // frame_bytes
                for i in range(0, n_frames, every_nth):
                    rows.append(
                        (int(doc_id), i, blob[i * frame_bytes : (i + 1) * frame_bytes])
                    )
            yield pd.DataFrame(rows, columns=["doc_id", "frame_idx", "frame"])

    return fanout(blobs.select("doc_id", "blob")).mapInPandas(per_batch, FRAME_SCHEMA)
