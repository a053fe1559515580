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


def encode_bmp(img) -> bytes:
    """Encode an HxWx3 uint8 RGB array as a 24-bit uncompressed BMP
    (BI_RGB, bottom-up, BGR byte order, rows padded to 4 bytes) — the
    real on-disk format, written with struct+numpy only."""
    import struct

    import numpy as np

    img = np.asarray(img, dtype=np.uint8)
    h, w, c = img.shape
    if c != 3:
        raise ValueError("encode_bmp: expected HxWx3 RGB")
    row_size = (3 * w + 3) // 4 * 4
    data_size = row_size * h
    header = struct.pack("<2sIHHI", b"BM", 54 + data_size, 0, 0, 54)
    dib = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, data_size, 2835, 2835, 0, 0
    )
    rows = np.zeros((h, row_size), dtype=np.uint8)
    rows[:, : 3 * w] = img[::-1, :, ::-1].reshape(h, 3 * w)  # bottom-up BGR
    return header + dib + rows.tobytes()


def decode_bmp(blob: bytes):
    """Decode a 24-bit uncompressed BMP into an HxWx3 uint8 RGB array.
    Handles bottom-up and top-down rows and 4-byte row padding; rejects
    palettized/compressed variants explicitly."""
    import struct

    import numpy as np

    magic, _sz, _r1, _r2, off = struct.unpack_from("<2sIHHI", blob, 0)
    if magic != b"BM":
        raise ValueError("decode_bmp: not a BMP stream")
    _hdr, w, h, _planes, bpp, comp = struct.unpack_from("<IiiHHI", blob, 14)
    if bpp != 24 or comp != 0:
        raise NotImplementedError(
            f"decode_bmp: only 24-bit BI_RGB supported (got bpp={bpp}, "
            f"compression={comp})"
        )
    top_down = h < 0
    h = abs(h)
    row_size = (3 * w + 3) // 4 * 4
    rows = np.frombuffer(blob, np.uint8, row_size * h, off).reshape(h, row_size)
    px = rows[:, : 3 * w].reshape(h, w, 3)[:, :, ::-1]  # BGR -> RGB
    if not top_down:
        px = px[::-1]
    return np.ascontiguousarray(px)


def encode_ppm(img) -> bytes:
    """Encode an HxWx3 uint8 RGB array as binary PPM (P6, maxval 255)."""
    import numpy as np

    img = np.asarray(img, dtype=np.uint8)
    h, w, c = img.shape
    if c != 3:
        raise ValueError("encode_ppm: expected HxWx3 RGB")
    return b"P6\n%d %d\n255\n" % (w, h) + img.tobytes()


def decode_ppm(blob: bytes):
    """Decode a binary PPM (P6) into an HxWx3 uint8 RGB array, honoring
    '#' comments and arbitrary whitespace in the header per the spec."""
    import numpy as np

    if blob[:2] != b"P6":
        raise ValueError("decode_ppm: not a P6 stream")
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(blob) and blob[pos : pos + 1].isspace():
            pos += 1
        if blob[pos : pos + 1] == b"#":
            while pos < len(blob) and blob[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(blob) and not blob[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(blob[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval != 255:
        raise NotImplementedError("decode_ppm: only maxval 255 supported")
    return (
        np.frombuffer(blob, np.uint8, w * h * 3, pos).reshape(h, w, 3).copy()
    )


def resize_nearest(img, width: int, height: int):
    """Nearest-neighbor resize of an HxWxC uint8 array — a REAL image
    resize (the same kernel PIL calls NEAREST), pure numpy indexing."""
    import numpy as np

    img = np.asarray(img)
    h, w = img.shape[:2]
    yi = (np.arange(height) * h) // height
    xi = (np.arange(width) * w) // width
    return img[yi][:, xi]


def decode_real(blob: bytes) -> dict:
    """Real decode for the formats a pure-python/numpy codec can honestly
    implement: 24-bit BMP and binary PPM, dispatched on magic bytes.
    Everything else (JPEG/PNG entropy coding, audio, video) stays an
    explicit NotImplementedError seam — those need libs this container
    does not ship.  Returns {width, height, channels, pixels} with pixels
    an HxWx3 uint8 RGB array."""
    if blob[:2] == b"BM":
        px = decode_bmp(blob)
    elif blob[:2] == b"P6":
        px = decode_ppm(blob)
    else:
        raise NotImplementedError(
            "real decode implemented only for BMP (24-bit BI_RGB) and PPM "
            "(P6) in this container; JPEG/PNG/audio/video remain stubbed"
        )
    return {
        "width": px.shape[1],
        "height": px.shape[0],
        "channels": px.shape[2],
        "pixels": px,
    }


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
