"""Multimodal column plumbing (SURVEY.md north star; task brief).

Images/audio/video ride through the engine as opaque `binary` columns with a
typed metadata struct; decode / feature-extraction runs as Arrow-batched
`mapInPandas` so each Python worker sees bounded batches, never a whole
partition.  `decode_real` REALLY decodes the formats a stdlib+numpy codec
can honestly cover — 24-bit BMP, binary PPM (round 6), and 8-bit truecolor
PNG with zlib inflate + full scanline un-filtering (round 7) — and raises
NotImplementedError for JPEG/audio/video, which need libs this container
does not ship; `fake_decode_features` keeps a deterministic stand-in for
those.  The Spark-side plumbing — schema, batch shape, partition flow — is
real and oracle-testable either way.
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


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def encode_png(img, filter_mode: str = "mixed") -> bytes:
    """Encode an HxWx3 uint8 RGB array as a REAL PNG (8-bit truecolor,
    zlib/DEFLATE IDAT, CRC-checked chunks) with stdlib ``zlib`` + numpy
    only — no codec libs.

    ``filter_mode="mixed"`` applies scanline filter ``y % 5`` (None, Sub,
    Up, Average, Paeth in rotation) so a round-trip exercises every
    un-filter path in :func:`decode_png`, not just the trivial one;
    ``"none"`` writes filter 0 rows.  Filters operate on the bytes the
    decoder will have reconstructed — for the encoder that IS the raw
    image, so predictors read the raw array directly (bpp = 3 bytes = one
    pixel shift for RGB8)."""
    import struct
    import zlib

    import numpy as np

    img = np.asarray(img, dtype=np.uint8)
    h, w, c = img.shape
    if c != 3:
        raise ValueError("encode_png: expected HxWx3 RGB")
    raw = img.astype(np.int16)
    scan = bytearray()
    prev = np.zeros((w, 3), np.int16)
    for y in range(h):
        row = raw[y]
        ft = y % 5 if filter_mode == "mixed" else 0
        left = np.zeros((w, 3), np.int16)
        left[1:] = row[:-1]
        ul = np.zeros((w, 3), np.int16)
        ul[1:] = prev[:-1]
        if ft == 0:
            pred = np.zeros((w, 3), np.int16)
        elif ft == 1:
            pred = left
        elif ft == 2:
            pred = prev
        elif ft == 3:
            pred = (left + prev) // 2
        else:  # Paeth, vectorized over the row
            p = left + prev - ul
            pa, pb, pc = np.abs(p - left), np.abs(p - prev), np.abs(p - ul)
            pred = np.where(
                (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, ul)
            )
        scan.append(ft)
        scan += ((row - pred) % 256).astype(np.uint8).tobytes()
        prev = row

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(scan), 6))
        + chunk(b"IEND", b"")
    )


def decode_png(blob: bytes):
    """Decode an 8-bit truecolor (color type 2, non-interlaced) PNG into an
    HxWx3 uint8 RGB array: chunk walk with CRC verification, zlib inflate,
    and full scanline un-filtering (None/Sub/Up/Average/Paeth per the PNG
    spec, bpp=3).  Palette/alpha/16-bit/interlaced variants raise
    explicitly — this is the honest subset a stdlib-only codec covers."""
    import struct
    import zlib

    import numpy as np

    if blob[:8] != _PNG_SIG:
        raise ValueError("decode_png: not a PNG stream")
    pos, idat, w, h = 8, bytearray(), None, None
    while pos + 8 <= len(blob):
        (ln,) = struct.unpack_from(">I", blob, pos)
        # bound the declared length against the remaining stream BEFORE
        # slicing: a truncated/corrupt blob must fail as the documented
        # ValueError, not a struct.error from the CRC unpack below or a
        # silent loop exit when truncation lands inside a chunk (ADVICE r7)
        if pos + 12 + ln > len(blob):
            raise ValueError("decode_png: truncated chunk")
        typ = blob[pos + 4 : pos + 8]
        data = blob[pos + 8 : pos + 8 + ln]
        (crc,) = struct.unpack_from(">I", blob, pos + 8 + ln)
        if crc != zlib.crc32(typ + data) & 0xFFFFFFFF:
            raise ValueError(f"decode_png: bad CRC in {typ!r} chunk")
        if typ == b"IHDR":
            w, h, depth, ctype, comp, filt, inter = struct.unpack(
                ">IIBBBBB", data
            )
            if (depth, ctype, comp, filt, inter) != (8, 2, 0, 0, 0):
                raise NotImplementedError(
                    "decode_png: only 8-bit truecolor non-interlaced "
                    f"supported (depth={depth}, color={ctype}, "
                    f"interlace={inter})"
                )
        elif typ == b"IDAT":
            idat += data
        elif typ == b"IEND":
            break
        pos += 12 + ln
    if w is None:
        raise ValueError("decode_png: missing IHDR")
    raw = zlib.decompress(bytes(idat))
    stride = 3 * w
    if len(raw) != h * (stride + 1):
        raise ValueError("decode_png: scanline payload size mismatch")
    out = np.zeros((h, w, 3), np.int16)
    prev = np.zeros((w, 3), np.int16)
    zero3 = np.zeros(3, np.int16)
    for y in range(h):
        ft = raw[y * (stride + 1)]
        filt = (
            np.frombuffer(raw, np.uint8, stride, y * (stride + 1) + 1)
            .reshape(w, 3)
            .astype(np.int16)
        )
        if ft == 0:
            rec = filt
        elif ft == 2:
            rec = (filt + prev) % 256
        elif ft in (1, 3, 4):
            # Sub/Average/Paeth need the just-reconstructed left pixel:
            # sequential across the row (rows are short; cross-row state
            # is only `prev`, so scanlines stream in O(stride) memory)
            rec = np.zeros((w, 3), np.int16)
            for x in range(w):
                left = rec[x - 1] if x else zero3
                up = prev[x]
                if ft == 1:
                    pred = left
                elif ft == 3:
                    pred = (left + up) // 2
                else:
                    ul = prev[x - 1] if x else zero3
                    p = left + up - ul
                    pa, pb, pc = (
                        np.abs(p - left),
                        np.abs(p - up),
                        np.abs(p - ul),
                    )
                    pred = np.where(
                        (pa <= pb) & (pa <= pc),
                        left,
                        np.where(pb <= pc, up, ul),
                    )
                rec[x] = (filt[x] + pred) % 256
        else:
            raise ValueError(f"decode_png: unknown filter type {ft}")
        out[y] = rec
        prev = rec
    return out.astype(np.uint8)


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
    implement: 24-bit BMP, binary PPM, and 8-bit truecolor PNG (stdlib
    zlib inflate + full scanline un-filtering), dispatched on magic bytes.
    Everything else (JPEG entropy coding, audio, video) stays an explicit
    NotImplementedError seam — those need libs this container does not
    ship.  Returns {width, height, channels, pixels} with pixels an
    HxWx3 uint8 RGB array."""
    if blob[:2] == b"BM":
        px = decode_bmp(blob)
    elif blob[:2] == b"P6":
        px = decode_ppm(blob)
    elif blob[:8] == _PNG_SIG:
        px = decode_png(blob)
    else:
        raise NotImplementedError(
            "real decode implemented only for BMP (24-bit BI_RGB), PPM "
            "(P6) and PNG (8-bit truecolor) in this container; "
            "JPEG/audio/video remain stubbed"
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
