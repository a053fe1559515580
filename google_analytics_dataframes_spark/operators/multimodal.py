"""Multimodal column plumbing (SURVEY.md north star; task brief).

Images/audio/video ride through the engine as opaque `binary` columns with a
typed metadata struct; decode / feature-extraction runs as Arrow-batched
`mapInPandas` so each Python worker sees bounded batches, never a whole
partition.  `decode_real` REALLY decodes the formats a stdlib+numpy codec
can honestly cover — 24-bit BMP, binary PPM (round 6), 8-bit truecolor
PNG with zlib inflate + full scanline un-filtering (round 7; all 8-bit
color types round 10; 16-bit depth, Adam7 interlace AND sub-byte 1/2/4-bit
depths round 11 — the FULL spec depth/color matrix, no PNG seam remains),
and baseline
sequential JPEG with canonical-Huffman entropy coding, dequant, 8x8 IDCT
and YCbCr->RGB (round 8), 4:2:0 chroma subsampling (round 9), 4:2:2/4:1:1,
restart intervals, and PROGRESSIVE (SOF2) streams (round 10).  Audio
decodes for real via decode_wav (integer/float PCM + IMA and MS ADPCM,
round 11) and video via decode_avi (uncompressed-DIB AVI container,
round 11); the remaining declared seams are arithmetic-coded/12-bit
JPEG and codec'd (entropy-coded) video streams, which need libs this
container does not ship; `fake_decode_features` keeps a deterministic
stand-in for those.  The Spark-side plumbing — schema, batch shape,
partition flow — is real and oracle-testable either way.
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
    """Decode an uncompressed BMP into an HxWx3 uint8 RGB array: 24-bit
    BI_RGB (the :func:`encode_bmp` form), 32-bit BI_RGB (BGRX — the
    padding byte real writers leave is dropped; round 11), and 8-bit
    palettized (BGRX palette after the info header, biClrUsed 0 =
    full 256; round 11).  Handles bottom-up and top-down rows and
    4-byte row padding; RLE/bitfield compression and other depths
    raise the honest NotImplementedError."""
    import struct

    import numpy as np

    if blob[:2] != b"BM":
        raise ValueError("decode_bmp: not a BMP stream")
    if len(blob) < 54:  # fuzz finding (round 11): file + info header
        raise ValueError("decode_bmp: truncated header")
    magic, _sz, _r1, _r2, off = struct.unpack_from("<2sIHHI", blob, 0)
    hdr_sz, w, h, _planes, bpp, comp = struct.unpack_from("<IiiHHI", blob, 14)
    if w <= 0 or h == 0:
        raise ValueError("decode_bmp: bad dimensions")
    if hdr_sz < 40:  # BITMAPCOREHEADER's 16-bit fields don't fit this parse
        raise NotImplementedError(
            f"decode_bmp: only BITMAPINFOHEADER-family headers "
            f"(size {hdr_sz})"
        )
    if bpp not in (8, 24, 32) or comp != 0:
        raise NotImplementedError(
            f"decode_bmp: only 8/24/32-bit BI_RGB supported (got bpp={bpp}, "
            f"compression={comp})"
        )
    top_down = h < 0
    h = abs(h)
    bypp = bpp // 8
    row_size = (bypp * w + 3) // 4 * 4
    if off + row_size * h > len(blob):
        raise ValueError("decode_bmp: truncated pixel array")
    rows = np.frombuffer(blob, np.uint8, row_size * h, off).reshape(h, row_size)
    if bpp == 8:
        (used,) = struct.unpack_from("<I", blob, 14 + 32)
        n_pal = used or 256
        pal_off = 14 + hdr_sz
        if pal_off + 4 * n_pal > len(blob):
            raise ValueError("decode_bmp: truncated palette")
        pal = (
            np.frombuffer(blob, np.uint8, 4 * n_pal, pal_off)
            .reshape(n_pal, 4)[:, :3][:, ::-1]  # BGRX -> RGB
        )
        idx = rows[:, :w]
        if int(idx.max(initial=0)) >= n_pal:
            raise ValueError("decode_bmp: palette index out of range")
        px = pal[idx]
    else:
        px = rows[:, : bypp * w].reshape(h, w, bypp)[:, :, 2::-1]  # BGR(X)->RGB
    if not top_down:
        px = px[::-1]
    return np.ascontiguousarray(px)


def encode_ppm(img) -> bytes:
    """Encode an HxWx3 RGB array as binary PPM: uint8 -> P6 maxval 255;
    uint16 -> P6 maxval 65535 with 2-byte BIG-endian samples (round 11,
    per the netpbm spec's 'most significant byte first')."""
    import numpy as np

    img = np.asarray(img)
    h, w, c = img.shape
    if c != 3:
        raise ValueError("encode_ppm: expected HxWx3 RGB")
    # dtype.type, not dtype ==: a big-endian '>u2' array must take the
    # 16-bit path too (dtype equality is byte-order sensitive)
    if img.dtype.type is np.uint16:
        return b"P6\n%d %d\n65535\n" % (w, h) + img.astype(">u2").tobytes()
    return b"P6\n%d %d\n255\n" % (w, h) + img.astype(np.uint8).tobytes()


def _ppm_header(blob: bytes, magic: bytes = b"P6"):
    """Parse a netpbm binary header (P5/P6) — returns (w, h, maxval,
    data_pos) without touching the pixel payload, honoring '#' comments
    and arbitrary whitespace per the spec (shared by decode_ppm /
    decode_pgm and decode_real's cheap contract check)."""
    if blob[:2] != magic:
        name = "decode_pgm" if magic == b"P5" else "decode_ppm"
        raise ValueError(f"{name}: not a {magic.decode()} stream")
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
    return w, h, maxval, pos


def decode_ppm(blob: bytes):
    """Decode a binary PPM (P6) into an HxWx3 RGB array — uint8 for
    maxval 255, uint16 (from 2-byte big-endian samples) for maxval
    256..65535 (round 11) — honoring '#' comments and arbitrary
    whitespace in the header per the spec.  Sub-255 maxvals (whose
    samples would need scaling) stay a declared seam."""
    import numpy as np

    w, h, maxval, pos = _ppm_header(blob)
    if maxval == 255:
        return (
            np.frombuffer(blob, np.uint8, w * h * 3, pos)
            .reshape(h, w, 3)
            .copy()
        )
    if 256 <= maxval <= 65535:  # 2-byte big-endian samples (round 11)
        return (
            np.frombuffer(blob, ">u2", w * h * 3, pos)
            .reshape(h, w, 3)
            .astype(np.uint16)
        )
    if 1 <= maxval < 255:
        # spec-valid, but samples are PROPORTIONAL to maxval — emitting
        # them unscaled would silently darken the image, so this stays
        # an honest seam until a scaling contract is decided
        raise NotImplementedError(
            f"decode_ppm: sub-255 maxval ({maxval}) scaling not implemented"
        )
    raise ValueError(f"decode_ppm: maxval {maxval} outside the P6 spec")


def encode_pgm(img) -> bytes:
    """Encode an HxW grayscale array as binary PGM (P5): uint8 ->
    maxval 255; uint16 -> maxval 65535, 2-byte big-endian samples
    (round 11)."""
    import numpy as np

    img = np.asarray(img)
    if img.ndim != 2:
        raise ValueError("encode_pgm: expected HxW grayscale")
    h, w = img.shape
    if img.dtype.type is np.uint16:
        return b"P5\n%d %d\n65535\n" % (w, h) + img.astype(">u2").tobytes()
    return b"P5\n%d %d\n255\n" % (w, h) + img.astype(np.uint8).tobytes()


def decode_pgm(blob: bytes):
    """Decode a binary PGM (P5) into an HxW grayscale array — uint8
    for maxval 255, uint16 (2-byte big-endian) for maxval 256..65535
    (round 11); sub-255 maxvals stay the same declared scaling seam as
    P6's."""
    import numpy as np

    w, h, maxval, pos = _ppm_header(blob, b"P5")
    if maxval == 255:
        return np.frombuffer(blob, np.uint8, w * h, pos).reshape(h, w).copy()
    if 256 <= maxval <= 65535:
        return (
            np.frombuffer(blob, ">u2", w * h, pos)
            .reshape(h, w)
            .astype(np.uint16)
        )
    if 1 <= maxval < 255:
        raise NotImplementedError(
            f"decode_pgm: sub-255 maxval ({maxval}) scaling not implemented"
        )
    raise ValueError(f"decode_pgm: maxval {maxval} outside the P5 spec")


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


#: channel count -> PNG color type for 8-bit images
_PNG_CTYPE = {1: 0, 2: 4, 3: 2, 4: 6}

#: Adam7 pass grid: (x_start, y_start, x_step, y_step) per pass, spec
#: order.  Each pass is an independently-filtered sub-image; passes that
#: are empty for a given (w, h) contribute no bytes at all (not even
#: filter bytes).
_ADAM7 = (
    (0, 0, 8, 8),
    (4, 0, 8, 8),
    (0, 4, 4, 8),
    (2, 0, 4, 4),
    (0, 2, 2, 4),
    (1, 0, 2, 2),
    (0, 1, 1, 2),
)


def _png_filter_pass(rows, filter_mode: str) -> bytearray:
    """Filter one (sub-)image of reconstructed BYTES: ``rows`` is
    (h, w_eff, bpp) int16 where bpp is the byte distance between
    corresponding bytes of adjacent pixels (channels at 8-bit, 2x at
    16-bit, 1 for palette indices).  PNG filters are byte-wise at every
    depth, so this one helper serves 8-bit, 16-bit, palette, and every
    Adam7 pass (each pass filters independently — ``prev`` starts at
    zero here, per spec).  ``"mixed"`` rotates filter y % 5 so decode
    round-trips exercise every un-filter path."""
    import numpy as np

    h, w, bpp = rows.shape
    scan = bytearray()
    prev = np.zeros((w, bpp), np.int16)
    for y in range(h):
        row = rows[y]
        ft = y % 5 if filter_mode == "mixed" else 0
        left = np.zeros((w, bpp), np.int16)
        left[1:] = row[:-1]
        ul = np.zeros((w, bpp), np.int16)
        ul[1:] = prev[:-1]
        if ft == 0:
            pred = np.zeros((w, bpp), np.int16)
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
    return scan


def _png_byte_rows(img):
    """(h, w, c) uint8/uint16 image -> (h, w, c*sample_bytes) int16 byte
    matrix (16-bit samples serialize big-endian, network order per spec)."""
    import numpy as np

    if img.dtype == np.uint16:
        h, w, c = img.shape
        return (
            img.astype(">u2").view(np.uint8).reshape(h, w, 2 * c).astype(np.int16)
        )
    return img.astype(np.int16)


#: sub-byte gray depth -> 8-bit scale factor (255/(2^d - 1), exact)
_PNG_SUBBYTE_SCALE = {1: 255, 2: 85, 4: 17}


def _png_pack_bits(samples, depth: int):
    """Pack a (h, w) sample grid (values < 2^depth) into PNG's MSB-first
    sub-byte scanline bytes: (h, row_bytes, 1) int16, each row
    zero-padded to a whole byte per spec.  Serves both the gray 1/2/4-bit
    and palette 1/2/4-bit encoders, full image or any Adam7 pass."""
    import numpy as np

    h, w = samples.shape
    bitplane = (
        (samples[:, :, None].astype(np.uint8) >> np.arange(depth - 1, -1, -1))
        & 1
    ).astype(np.uint8)
    packed = np.packbits(bitplane.reshape(h, w * depth), axis=1)
    return packed[:, :, None].astype(np.int16)


def encode_png(
    img,
    filter_mode: str = "mixed",
    interlace: bool = False,
    depth: int = None,
) -> bytes:
    """Encode an 8- or 16-bit image as a REAL PNG (zlib/DEFLATE IDAT,
    CRC-checked chunks) with stdlib ``zlib`` + numpy only — no codec
    libs.  Channel count picks the color type: HxW or HxWx1 grayscale
    (0), HxWx2 gray+alpha (4), HxWx3 truecolor (2), HxWx4 RGBA (6).
    A uint16 input writes bit depth 16 (big-endian samples, round 11);
    anything else is encoded as 8-bit.

    ``filter_mode="mixed"`` applies scanline filter ``y % 5`` (None, Sub,
    Up, Average, Paeth in rotation) so a round-trip exercises every
    un-filter path in :func:`decode_png`, not just the trivial one;
    ``"none"`` writes filter 0 rows.  Filters operate on the bytes the
    decoder will have reconstructed — for the encoder that IS the raw
    image, so predictors read the raw array directly (byte distance =
    channels x sample bytes).

    ``interlace=True`` writes Adam7 (round 11): the IDAT payload is the
    concatenation of the 7 passes, each an independently-filtered
    sub-image on the spec's (x0, y0, xstep, ystep) grid; empty passes
    contribute no bytes.

    ``depth=1/2/4`` (round 11) writes SUB-BYTE grayscale: the input must
    be single-channel uint8 whose values sit on the spec's scaled grid
    (multiples of 255/(2^d - 1): 255, 85, 17), which is exactly what
    :func:`decode_png` emits for such streams — samples pack MSB-first
    with each scanline zero-padded to a whole byte, and the filter byte
    distance is 1."""
    import struct
    import zlib

    import numpy as np

    img = np.asarray(img)
    if depth is None:
        depth = 16 if img.dtype == np.uint16 else 8
    if depth in (1, 2, 4):
        img = img.astype(np.uint8)
        if img.ndim == 3:
            if img.shape[2] != 1:
                raise ValueError("encode_png: sub-byte depth is grayscale-only")
            img = img[:, :, 0]
        scale = _PNG_SUBBYTE_SCALE[depth]
        if (img % scale).any():
            raise ValueError(
                f"encode_png: depth-{depth} gray samples must be multiples "
                f"of {scale} (the 8-bit image of a {depth}-bit stream)"
            )
        samples, c, h, w = img // scale, 1, *img.shape
        if interlace:
            scan = bytearray()
            for x0, y0, xs, ys in _ADAM7:
                sub = samples[y0::ys, x0::xs]
                if sub.shape[0] and sub.shape[1]:
                    scan += _png_filter_pass(
                        _png_pack_bits(sub, depth), filter_mode
                    )
        else:
            scan = _png_filter_pass(_png_pack_bits(samples, depth), filter_mode)
    elif depth in (8, 16):
        img = img.astype(np.uint16 if depth == 16 else np.uint8)
        if img.ndim == 2:
            img = img[:, :, None]
        h, w, c = img.shape
        if c not in _PNG_CTYPE:
            raise ValueError("encode_png: expected 1/2/3/4 channels")
        rows = _png_byte_rows(img)
        if interlace:
            scan = bytearray()
            for x0, y0, xs, ys in _ADAM7:
                sub = rows[y0::ys, x0::xs]
                if sub.shape[0] and sub.shape[1]:
                    scan += _png_filter_pass(sub, filter_mode)
        else:
            scan = _png_filter_pass(rows, filter_mode)
    else:
        raise ValueError(f"encode_png: invalid bit depth {depth}")

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(
        ">IIBBBBB",
        w,
        h,
        depth,
        0 if depth in (1, 2, 4) else _PNG_CTYPE[c],
        0,
        0,
        1 if interlace else 0,
    )
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(scan), 6))
        + chunk(b"IEND", b"")
    )


def encode_png_palette(
    indexed,
    palette,
    filter_mode: str = "mixed",
    interlace: bool = False,
    depth: int = 8,
) -> bytes:
    """Encode an HxW uint8 INDEX array + an Nx3 palette as a REAL
    palettized PNG (8-bit color type 3, PLTE chunk, zlib IDAT) — round
    10\'s companion to the truecolor encoder.  Filtering follows the same
    ``y % 5`` rotation (pixel distance = 1 byte for indices), so a round
    trip exercises every bpp=1 un-filter path in :func:`decode_png`.
    Palette PNG is lossless on indexed content: decode returns
    palette[indexed] exactly."""
    import struct
    import zlib

    import numpy as np

    idx = np.asarray(indexed, np.uint8)
    pal = np.asarray(palette, np.uint8)
    if pal.ndim != 2 or pal.shape[1] != 3 or not 1 <= pal.shape[0] <= 256:
        raise ValueError("encode_png_palette: palette must be Nx3, N<=256")
    if int(idx.max(initial=0)) >= pal.shape[0]:
        raise ValueError("encode_png_palette: index out of palette range")
    if depth not in (1, 2, 4, 8):
        raise ValueError(f"encode_png_palette: invalid palette depth {depth}")
    if depth < 8 and int(idx.max(initial=0)) >= (1 << depth):
        raise ValueError(
            f"encode_png_palette: index out of depth-{depth} range"
        )
    h, w = idx.shape

    def pass_rows(sub):
        # depth 8: one index byte per pixel; 1/2/4: MSB-first packed
        if depth == 8:
            return sub.astype(np.int16)[:, :, None]
        return _png_pack_bits(sub, depth)

    if interlace:
        scan = bytearray()
        for x0, y0, xs, ys in _ADAM7:
            sub = idx[y0::ys, x0::xs]
            if sub.shape[0] and sub.shape[1]:
                scan += _png_filter_pass(pass_rows(sub), filter_mode)
    else:
        scan = _png_filter_pass(pass_rows(idx), filter_mode)

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, depth, 3, 0, 0, 1 if interlace else 0)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"PLTE", pal.tobytes())
        + chunk(b"IDAT", zlib.compress(bytes(scan), 6))
        + chunk(b"IEND", b"")
    )


def _png_unfilter(raw: bytes, w: int, h: int, ch: int):
    """Reconstruct scanlines from filtered PNG payload: filter byte +
    None/Sub/Up/Average/Paeth per row, pixel byte distance = ``ch``
    (channels x sample bytes at depth 8/16; 1 for palette indices; PNG
    filters are byte-wise at every depth, so 16-bit rows are just wider
    byte rows here).  Returns (h, w, ch) uint8 of reconstructed BYTES —
    the caller reassembles 16-bit samples."""
    import numpy as np

    stride = ch * w
    if len(raw) != h * (stride + 1):
        raise ValueError("decode_png: scanline payload size mismatch")
    out = np.zeros((h, w, ch), np.int16)
    prev = np.zeros((w, ch), np.int16)
    zero_ch = np.zeros(ch, np.int16)
    for y in range(h):
        ft = raw[y * (stride + 1)]
        filt = (
            np.frombuffer(raw, np.uint8, stride, y * (stride + 1) + 1)
            .reshape(w, ch)
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
            rec = np.zeros((w, ch), np.int16)
            for x in range(w):
                left = rec[x - 1] if x else zero_ch
                up = prev[x]
                if ft == 1:
                    pred = left
                elif ft == 3:
                    pred = (left + up) // 2
                else:
                    ul = prev[x - 1] if x else zero_ch
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


def decode_png(blob: bytes):
    """Decode ANY spec-valid PNG — every depth/color combination the
    standard defines (gray 1/2/4/8/16, palette 1/2/4/8, truecolor /
    gray+alpha / RGBA 8/16), interlaced or not — into an HxWxC array
    (uint16 at depth 16, else uint8; C = 1/3/2/4; palette resolves
    through PLTE to HxWx3; sub-byte gray scales to 8-bit by the spec's
    exact 255/(2^d - 1) factor): chunk walk with CRC verification, zlib
    inflate, full scanline un-filtering (None/Sub/Up/Average/Paeth, byte
    distance = ceil(bits-per-pixel/8)).  Depth 16 (round 11) reassembles
    big-endian byte pairs after the byte-wise un-filter; Adam7 (round
    11) walks the 7 passes as independently-filtered sub-images on the
    spec grid and scatters each into place (empty passes contribute no
    bytes); sub-byte rows (round 11) unpack MSB-first from
    byte-padded scanlines.  Spec-invalid combinations raise ValueError —
    no NotImplementedError seam remains in this codec."""
    import struct
    import zlib

    import numpy as np

    if blob[:8] != _PNG_SIG:
        raise ValueError("decode_png: not a PNG stream")
    pos, idat, w, h, ctype, plte = 8, bytearray(), None, None, None, None
    depth, inter = 8, 0
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
            # round 10: every 8-bit color type decodes — gray (0),
            # truecolor (2), palette (3), gray+alpha (4), RGBA (6);
            # round 11: depth 16, Adam7 interlace, AND sub-byte depths
            # (1/2/4 gray + palette) — the FULL spec depth/color matrix,
            # so any rejected combination is spec-invalid (ValueError),
            # not unimplemented.
            ok_depth = {
                0: (1, 2, 4, 8, 16),
                2: (8, 16),
                3: (1, 2, 4, 8),
                4: (8, 16),
                6: (8, 16),
            }
            if (
                comp != 0
                or filt != 0
                or inter not in (0, 1)
                or ctype not in ok_depth
                or depth not in ok_depth[ctype]
                # spec: width and height are >= 1 (review finding,
                # round 12 — a 0xN file decoded to an empty array where
                # decode_tiff's 'bad dimensions' convention refuses)
                or w == 0
                or h == 0
            ):
                raise ValueError(
                    "decode_png: invalid IHDR parameters "
                    f"(depth={depth}, color={ctype}, interlace={inter}, "
                    f"size={w}x{h})"
                )
        elif typ == b"PLTE":
            if ln % 3 or ln > 256 * 3:
                raise ValueError("decode_png: malformed PLTE chunk")
            plte = np.frombuffer(data, np.uint8).reshape(-1, 3)
        elif typ == b"IDAT":
            idat += data
        elif typ == b"IEND":
            break
        pos += 12 + ln
    if w is None:
        raise ValueError("decode_png: missing IHDR")
    # bits per pixel = channels (gray 1, truecolor 3, gray+alpha 2, RGBA
    # 4, palette indices 1) x depth; the filter byte distance is
    # ceil(bits/8) floored at 1 (spec: sub-byte pixels filter at
    # distance 1 over the PACKED bytes, each scanline zero-padded to a
    # whole byte)
    nch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[ctype]
    bits = nch * depth
    fbpp = max(1, bits // 8)
    # expected inflated payload, exactly per IHDR geometry: each
    # scanline is 1 filter byte + packed pixel bytes, summed over the 7
    # Adam7 sub-images when interlaced (empty passes contribute nothing)
    if inter == 0:
        expect = h * (1 + (w * bits + 7) // 8)
    else:
        expect = sum(
            ph * (1 + (pw * bits + 7) // 8)
            for x0, y0, xs, ys in _ADAM7
            for pw in [(w - x0 + xs - 1) // xs if w > x0 else 0]
            for ph in [(h - y0 + ys - 1) // ys if h > y0 else 0]
            if pw and ph
        )
    if expect > 1 << 30:
        # review finding (round 12): header-declared dimensions drive
        # allocations, same ceiling convention as decode_tiff
        raise ValueError(
            f"decode_png: declared image size {w}x{h}@{bits}bpp exceeds "
            f"the 1 GiB decode ceiling"
        )
    # review finding (round 12): inflate BOUNDED by the IHDR-derived
    # size — unbounded zlib.decompress lets a tiny crafted IDAT allocate
    # hundreds of MB before the scanline size check ever runs (deflate
    # bomb); requesting expect+1 detects overflow without paying for it
    d = zlib.decompressobj()
    try:
        raw = d.decompress(bytes(idat), expect + 1)
    except zlib.error as e:  # fuzz finding (round 11): corrupt IDAT
        raise ValueError(f"decode_png: bad IDAT stream ({e})")
    if len(raw) <= expect and not d.eof:
        # mid-stream truncation: decompressobj returns the partial
        # prefix silently where one-shot zlib.decompress raised
        raise ValueError("decode_png: bad IDAT stream (truncated)")
    if len(raw) != expect or d.unconsumed_tail or d.unused_data:
        raise ValueError("decode_png: scanline payload size mismatch")

    def unfilter_block(seg, pw, ph):
        """One (sub-)image -> (ph, pw, k) where k = bytes per pixel at
        depth>=8, else 1 unpacked sub-byte sample per pixel."""
        row_bytes = (pw * bits + 7) // 8
        rec = _png_unfilter(seg, row_bytes // fbpp, ph, fbpp).reshape(
            ph, row_bytes
        )
        if depth >= 8:
            return rec.reshape(ph, pw, bits // 8)
        plane = np.unpackbits(rec, axis=1)[:, : pw * depth].reshape(
            ph, pw, depth
        )
        weights = 1 << np.arange(depth - 1, -1, -1)
        return (plane * weights).sum(axis=2).astype(np.uint8)[:, :, None]

    k = bits // 8 if depth >= 8 else 1
    if inter == 0:
        rec = unfilter_block(raw, w, h)
    else:
        rec = np.zeros((h, w, k), np.uint8)
        off = 0
        for x0, y0, xs, ys in _ADAM7:
            pw = (w - x0 + xs - 1) // xs if w > x0 else 0
            ph = (h - y0 + ys - 1) // ys if h > y0 else 0
            if pw == 0 or ph == 0:
                continue  # empty pass: zero bytes, not even filter bytes
            n = ph * (1 + (pw * bits + 7) // 8)
            if off + n > len(raw):
                raise ValueError("decode_png: scanline payload size mismatch")
            rec[y0::ys, x0::xs] = unfilter_block(raw[off : off + n], pw, ph)
            off += n
        if off != len(raw):
            raise ValueError("decode_png: scanline payload size mismatch")
    if depth == 16:
        # reassemble big-endian sample pairs from the un-filtered bytes
        rec = (
            rec.reshape(h, w, nch, 2).astype(np.uint16)[..., 0] << 8
        ) | rec.reshape(h, w, nch, 2)[..., 1]
    if ctype == 3:
        if plte is None:
            raise ValueError("decode_png: palette image without PLTE chunk")
        idx = rec[:, :, 0]
        if int(idx.max(initial=0)) >= len(plte):
            raise ValueError("decode_png: palette index out of range")
        return plte[idx]
    if depth < 8:
        # spec sample scaling to 8-bit: 255/(2^d - 1) is exact for 1/2/4
        rec = rec * np.uint8(_PNG_SUBBYTE_SCALE[depth])
    return rec


def resize_nearest(img, width: int, height: int):
    """Nearest-neighbor resize of an HxWxC uint8 array — a REAL image
    resize (the same kernel PIL calls NEAREST), pure numpy indexing."""
    import numpy as np

    img = np.asarray(img)
    h, w = img.shape[:2]
    yi = (np.arange(height) * h) // height
    xi = (np.arange(width) * w) // width
    return img[yi][:, xi]


# ------------------------------------------------------------------ JPEG ---
# DCT JPEG (ITU-T T.81) in stdlib struct + numpy only — baseline sequential
# (round 8) AND progressive Huffman / Annex G (round 10), with restart
# markers and sampling factors to 4 (round 10).  Honest subset, mirroring
# the PNG codec's discipline: 8-bit samples, Huffman entropy coding;
# arithmetic coding, 12-bit precision, and fractional factor ratios
# raise NotImplementedError explicitly.  The encoder
# emits spec-legal canonical Huffman tables (embedded via DHT, as T.81
# allows — tables need not be the Annex K defaults), so streams decode in
# any conforming reader.

#: zigzag scan order: k-th entropy-coded coefficient -> (row, col).  Derived
#: from the spec's rule rather than transcribed: diagonals in order of
#: r + c, traversed up-right on even diagonals and down-left on odd ones.
_JPEG_ZZ = sorted(
    ((r, c) for r in range(8) for c in range(8)),
    key=lambda rc: (rc[0] + rc[1], rc[0] if (rc[0] + rc[1]) % 2 else -rc[0]),
)
_JPEG_ZZ_FLAT = [r * 8 + c for r, c in _JPEG_ZZ]

#: DC size-category code lengths (Annex K.3 luminance shape: 1x2, 5x3,
#: then one each of 4..9) and the custom canonical AC table: short codes
#: for EOB and the low-run/low-size symbols every block emits, 10-bit
#: codes for the long tail.  Kraft sum 0.82 < 1, so the all-ones code of
#: the maximum length is never assigned (T.81 reserves it).
_JPEG_DC_LENGTHS = [(s, ln) for s, ln in zip(range(12), (2, 3, 3, 3, 3, 3, 4, 5, 6, 7, 8, 9))]


def _jpeg_ac_lengths() -> list[tuple[int, int]]:
    head = [
        (0x00, 3), (0x01, 3), (0x02, 3),  # EOB and the two commonest sizes
        (0x11, 4), (0x21, 4), (0x03, 4),
        (0x31, 5), (0x12, 5), (0x04, 5),
        (0xF0, 6),  # ZRL
    ]
    seen = {s for s, _ in head}
    tail = [
        ((run << 4) | size, 10)
        for run in range(16)
        for size in range(1, 11)
        if ((run << 4) | size) not in seen
    ]
    return head + tail


_JPEG_AC_LENGTHS = _jpeg_ac_lengths()

#: Default quantization table: DC step 8 (divides the flat-block DC
#: 8*(v-128) exactly — the property l67's bit-exact round trip rests on),
#: AC steps growing with frequency like a real table.
_JPEG_DEFAULT_QT = [[8 if (r, c) == (0, 0) else 8 + 2 * (r + c) for c in range(8)] for r in range(8)]


def _jpeg_canonical(lengths: list[tuple[int, int]]):
    """T.81 Annex C code assignment: symbols sorted by code length get
    consecutive codes, left-shifted at each length increase.  Returns
    (bits16, huffval, enc) where enc maps symbol -> (code, length) and
    bits16/huffval are the DHT wire form."""
    syms = sorted(lengths, key=lambda sl: sl[1])
    bits = [0] * 16
    huffval, enc, code, prev = [], {}, 0, syms[0][1]
    for sym, ln in syms:
        code <<= ln - prev
        prev = ln
        enc[sym] = (code, ln)
        bits[ln - 1] += 1
        huffval.append(sym)
        code += 1
    return bits, huffval, enc


def _jpeg_decode_lut(bits: list[int], huffval: list[int]) -> dict:
    """Inverse of :func:`_jpeg_canonical` for tables read from DHT:
    {(length, code): symbol}."""
    lut, code, i = {}, 0, 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            lut[(ln, code)] = huffval[i]
            code += 1
            i += 1
        code <<= 1
    return lut


class _JpegBitWriter:
    """MSB-first bit accumulator with T.81 byte stuffing (0xFF -> 0xFF00)."""

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            b = (self.acc >> (self.n - 8)) & 0xFF
            self.buf.append(b)
            if b == 0xFF:
                self.buf.append(0x00)
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self) -> bytes:
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)  # pad with 1-bits per spec
        return bytes(self.buf)

    def restart(self, n: int) -> None:
        """Byte-align (1-bit padding; a padded 0xFF gets stuffed like any
        data byte) and emit a raw RST(n mod 8) marker — markers are never
        stuffed."""
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)
        self.buf += bytes((0xFF, 0xD0 + (n & 7)))


class _JpegBitReader:
    """MSB-first bit reader over entropy-coded data; removes 0xFF00
    stuffing and stops at any real marker."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0

    def _fill(self) -> None:
        if self.pos >= len(self.data):
            raise ValueError("decode_jpeg: truncated entropy data")
        b = self.data[self.pos]
        if b == 0xFF:
            if self.pos + 1 >= len(self.data):
                raise ValueError("decode_jpeg: truncated entropy data")
            nxt = self.data[self.pos + 1]
            if nxt != 0x00:
                raise ValueError(
                    f"decode_jpeg: marker 0xFF{nxt:02X} inside entropy data"
                )
            self.pos += 2
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.n += 8

    def read_bits(self, length: int) -> int:
        while self.n < length:
            self._fill()
        self.n -= length
        v = (self.acc >> self.n) & ((1 << length) - 1)
        self.acc &= (1 << self.n) - 1
        return v

    def read_symbol(self, lut: dict) -> int:
        code, ln = 0, 0
        while ln < 16:
            code = (code << 1) | self.read_bits(1)
            ln += 1
            sym = lut.get((ln, code))
            if sym is not None:
                return sym
        raise ValueError("decode_jpeg: invalid Huffman code")

    def sync_restart(self, n: int) -> None:
        """Consume an RSTn marker at a restart boundary: discard the
        current byte's padding bits (encoders pad with 1-bits before a
        marker, T.81 B.2.1.2) and require exactly 0xFFD0+n next — the
        modulo-8 sequence check is how real decoders detect dropped or
        duplicated entropy segments."""
        self.acc = 0
        self.n = 0
        if self.pos + 1 >= len(self.data):
            raise ValueError("decode_jpeg: truncated at restart boundary")
        if self.data[self.pos] != 0xFF or self.data[self.pos + 1] != 0xD0 + n:
            raise ValueError(
                f"decode_jpeg: expected RST{n} at {self.pos}, got "
                f"0x{self.data[self.pos]:02X}{self.data[self.pos + 1]:02X}"
            )
        self.pos += 2


def _jpeg_size(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def _jpeg_extend(bits: int, size: int) -> int:
    return bits if bits >= (1 << (size - 1)) else bits - (1 << size) + 1


def _jpeg_encode_block(bw, zz, pred: int, dc_enc: dict, ac_enc: dict) -> int:
    """Entropy-encode one zigzag-ordered quantized block; returns the new
    DC predictor."""
    dc = int(zz[0])
    diff = dc - pred
    s = _jpeg_size(diff)
    code, ln = dc_enc[s]
    bw.write(code, ln)
    if s:
        bw.write(diff if diff > 0 else diff + (1 << s) - 1, s)
    run = 0
    last = 0
    for k in range(63, 0, -1):
        if zz[k]:
            last = k
            break
    for k in range(1, last + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_enc[0xF0]  # ZRL: 16 zeros
            bw.write(code, ln)
            run -= 16
        s = _jpeg_size(v)
        code, ln = ac_enc[(run << 4) | s]
        bw.write(code, ln)
        bw.write(v if v > 0 else v + (1 << s) - 1, s)
        run = 0
    if last < 63:
        code, ln = ac_enc[0x00]  # EOB
        bw.write(code, ln)
    return dc


def _jpeg_decode_block(br, pred: int, dc_lut: dict, ac_lut: dict):
    import numpy as np

    zz = np.zeros(64, np.int32)
    s = br.read_symbol(dc_lut)
    if s > 15:  # corrupt DHT symbol: T.81 DC size categories are <= 15
        raise ValueError(f"decode_jpeg: bad DC size category {s}")
    diff = _jpeg_extend(br.read_bits(s), s) if s else 0
    if abs(pred + diff) > 1 << 30:  # corrupt-stream predictor runaway
        raise ValueError("decode_jpeg: DC predictor out of range")
    zz[0] = pred + diff
    k = 1
    while k < 64:
        sym = br.read_symbol(ac_lut)
        if sym == 0x00:  # EOB
            break
        run, s = sym >> 4, sym & 0x0F
        if s == 0:
            if run != 15:
                raise ValueError(f"decode_jpeg: bad AC symbol {sym:#04x}")
            k += 16  # ZRL
            continue
        k += run
        if k > 63:
            raise ValueError("decode_jpeg: coefficient index overran block")
        zz[k] = _jpeg_extend(br.read_bits(s), s)
        k += 1
    return zz, int(zz[0])


def _jpeg_dct_matrix():
    import numpy as np

    u = np.arange(8.0)
    m = np.cos((2 * u[None, :] + 1) * u[:, None] * np.pi / 16) / 2.0
    m[0] /= np.sqrt(2.0)
    return m  # orthonormal; equals T.81's FDCT scaling exactly


def rgb_to_ycbcr(img):
    """JFIF full-range RGB -> YCbCr, rounded to uint8."""
    import numpy as np

    f = np.asarray(img, np.float64)
    r, g, b = f[..., 0], f[..., 1], f[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168735892 * r - 0.331264108 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418687589 * g - 0.081312411 * b
    return np.clip(np.round(np.stack([y, cb, cr], axis=-1)), 0, 255).astype(
        np.uint8
    )


def ycbcr_to_rgb(arr):
    """JFIF YCbCr -> RGB, rounded and clamped to uint8."""
    import numpy as np

    f = np.asarray(arr, np.float64)
    y, cb, cr = f[..., 0], f[..., 1] - 128.0, f[..., 2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136286 * cb - 0.714136286 * cr
    b = y + 1.772 * cb
    return np.clip(np.round(np.stack([r, g, b], axis=-1)), 0, 255).astype(
        np.uint8
    )


def _jpeg_headers(
    w: int,
    h: int,
    qt_zz: bytes,
    n_comp: int,
    samps: list[int] | None = None,
    restart_interval: int = 0,
) -> bytes:
    import struct

    samps = samps or [0x11] * n_comp
    dc_bits, dc_vals, _ = _jpeg_canonical(_JPEG_DC_LENGTHS)
    ac_bits, ac_vals, _ = _jpeg_canonical(_JPEG_AC_LENGTHS)
    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + qt_zz  # DQT Pq=0 Tq=0
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)  # DRI
    sof = struct.pack(">BHHB", 8, h, w, n_comp)
    for cid in range(1, n_comp + 1):
        sof += bytes((cid, samps[cid - 1], 0))  # HiVi nibbles, quant table 0
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    for tc, bits, vals in ((0, dc_bits, dc_vals), (1, ac_bits, ac_vals)):
        seg = bytes((tc << 4,)) + bytes(bits) + bytes(vals)
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(seg)) + seg
    sos = bytes((n_comp,))
    for cid in range(1, n_comp + 1):
        sos += bytes((cid, 0x00))  # DC table 0, AC table 0 for every comp
    sos += bytes((0, 63, 0))  # Ss, Se, AhAl
    return bytes(out) + b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos


def _jpeg_component_coeffs(plane, qt):
    """FDCT + quantize one component plane (already edge-padded to
    multiples of 8); returns (hb, wb, 64) zigzag-ordered int32 blocks."""
    import numpy as np

    m = _jpeg_dct_matrix()
    h8, w8 = plane.shape
    blocks = (
        plane.astype(np.float64)
        .reshape(h8 // 8, 8, w8 // 8, 8)
        .transpose(0, 2, 1, 3)
        - 128.0
    )
    coeffs = m @ blocks @ m.T
    q = np.round(coeffs / np.asarray(qt, np.float64)).astype(np.int32)
    return q.reshape(h8 // 8, w8 // 8, 64)[..., _JPEG_ZZ_FLAT]


#: Chroma (horizontal, vertical) subsampling factors per JFIF notation;
#: the Y component carries the (fh, fv) sampling nibbles, chroma is 1x1.
_JPEG_SUBSAMP = {"4:4:4": (1, 1), "4:2:2": (2, 1), "4:2:0": (2, 2), "4:1:1": (4, 1)}


def encode_jpeg(
    img, qtable=None, subsampling: str = "4:4:4", restart_interval: int = 0
) -> bytes:
    """Encode an HxW grayscale or HxWx3 RGB uint8 array as a REAL baseline
    JPEG: level shift, 8x8 FDCT (orthonormal matrix — identical scaling to
    T.81's convention), quantization, zigzag, DC prediction, canonical
    Huffman entropy coding with byte stuffing, and SOI/APP0/DQT/SOF0/DHT/
    SOS/EOI framing.  Color uses the JFIF YCbCr transform at 4:4:4,
    4:2:2, 4:2:0 (round 9), or 4:1:1 (round 10): chroma is box-mean
    downsampled by the (fh, fv) factor (rounded half-up like the color
    transform) and the scan interleaved in 8*fh x 8*fv MCUs — 4:2:0's
    16x16 4Y+Cb+Cr is the layout most web JPEGs use.  Dimensions need
    not be block-aligned — edges replicate, as real encoders do (the pad
    target is the MCU, so the replicated margin keeps chroma flat).
    ``restart_interval=N`` (round 10) emits a DRI segment and an RSTn
    marker every N MCUs with DC-predictor resets — the T.81 error-
    resilience / parallel-decode machinery real camera files carry."""
    import numpy as np

    img = np.asarray(img, np.uint8)
    gray = img.ndim == 2
    h, w = img.shape[:2]
    qt = np.asarray(qtable if qtable is not None else _JPEG_DEFAULT_QT, np.int32)
    if subsampling not in _JPEG_SUBSAMP:
        raise ValueError(f"encode_jpeg: unsupported subsampling {subsampling!r}")
    fh, fv = _JPEG_SUBSAMP[subsampling]
    if gray or (fh, fv) == (1, 1):
        planes = (
            [img] if gray else [rgb_to_ycbcr(img)[..., i] for i in range(3)]
        )
        pad_h, pad_w = (-h) % 8, (-w) % 8
        comp_blocks = [
            _jpeg_component_coeffs(
                np.pad(p, ((0, pad_h), (0, pad_w)), mode="edge"), qt
            )
            for p in planes
        ]
        return _jpeg_entropy_assemble(
            comp_blocks, w, h, qt, restart_interval=restart_interval
        )
    ycc = np.pad(
        rgb_to_ycbcr(img),
        ((0, (-h) % (8 * fv)), (0, (-w) % (8 * fh)), (0, 0)),
        mode="edge",
    )
    hp, wp = ycc.shape[:2]
    planes = [ycc[..., 0]]
    for c in (1, 2):  # fh x fv box mean; exact on MCU-aligned flat chroma
        box = (
            ycc[..., c]
            .astype(np.float64)
            .reshape(hp // fv, fv, wp // fh, fh)
            .mean(axis=(1, 3))
        )
        planes.append(np.clip(np.floor(box + 0.5), 0, 255).astype(np.uint8))
    comp_blocks = [_jpeg_component_coeffs(p, qt) for p in planes]
    return _jpeg_entropy_assemble(
        comp_blocks,
        w,
        h,
        qt,
        samps=[(fh << 4) | fv, 0x11, 0x11],
        restart_interval=restart_interval,
    )


def encode_jpeg_coeffs(blocks, w: int, h: int, qtable=None) -> bytes:
    """Entropy-level encoder entry: take ALREADY-quantized zigzag-ordered
    coefficient blocks — shape (hb, wb, 64), one grayscale component — and
    emit a complete baseline JPEG stream.  This is the coefficient-exact
    half of l67's round trip: Huffman + DC prediction + stuffing +
    framing are bit-exactly invertible even though pixel-domain JPEG is
    lossy, so a decoder regression is caught by integer equality."""
    import numpy as np

    qt = np.asarray(qtable if qtable is not None else _JPEG_DEFAULT_QT, np.int32)
    blocks = np.asarray(blocks, np.int32)
    hb, wb = blocks.shape[:2]
    if (hb * 8 < h) or (wb * 8 < w) or h <= (hb - 1) * 8 or w <= (wb - 1) * 8:
        raise ValueError("encode_jpeg_coeffs: block grid does not match w/h")
    return _jpeg_entropy_assemble([blocks], w, h, qt)


def _jpeg_prog_ac_lengths() -> list[tuple[int, int]]:
    """Progressive AC Huffman alphabet: the baseline run/size symbols plus
    the 14 EOBn run-length symbols (0x10..0xE0) Annex G adds for EOB runs
    longer than one block.  Flat 10-bit tail keeps the canonical Kraft
    sum under 1 (0.83)."""
    return _jpeg_ac_lengths() + [((r << 4), 10) for r in range(1, 15)]


_JPEG_PROG_AC_LENGTHS = _jpeg_prog_ac_lengths()


def encode_jpeg_progressive(img, qtable=None, al_levels: int = 1) -> bytes:
    """Encode an HxW grayscale or HxWx3 RGB uint8 array as a REAL
    PROGRESSIVE JPEG (SOF2, Huffman, T.81 Annex G) — round 10's closure
    of the largest declared codec seam.  Six-scan script exercising every
    progressive scan type the decoder implements:

      1. DC first, all components interleaved, successive approximation
         Al=1 (arithmetic-shift point transform, baseline-style diffs);
      2. per component: AC first scans for spectral bands 1-5 and 6-63 at
         Al=1 (sign-magnitude point transform, ZRL + EOBn run coding);
      3. DC refinement (Ah=1, Al=0): one raw magnitude bit per block;
      4. per component: AC refinement for both bands (newly-visible
         coefficients as run/1 symbols + sign, correction bits for
         already-nonzero coefficients buffered across EOB runs exactly
         per the Annex G bit-ordering contract).

    The quantized coefficients are identical to :func:`encode_jpeg`'s for
    the same image+qtable, so decode(progressive) must equal
    decode(baseline) COEFFICIENT-exactly — the round-trip proof in
    tests/test_invariants.py.  Color is 4:4:4 only (progressive +
    subsampling stays a declared seam); grayscale uses single-component
    scans throughout."""
    import struct

    import numpy as np

    img = np.asarray(img, np.uint8)
    gray = img.ndim == 2
    h, w = img.shape[:2]
    qt = np.asarray(qtable if qtable is not None else _JPEG_DEFAULT_QT, np.int32)
    planes = [img] if gray else [rgb_to_ycbcr(img)[..., i] for i in range(3)]
    pad_h, pad_w = (-h) % 8, (-w) % 8
    blocks = [
        _jpeg_component_coeffs(
            np.pad(pl, ((0, pad_h), (0, pad_w)), mode="edge"), qt
        )
        for pl in planes
    ]
    n = len(blocks)
    hb, wb = blocks[0].shape[:2]
    _, _, dc_enc = _jpeg_canonical(_JPEG_DC_LENGTHS)
    _, _, ac_enc = _jpeg_canonical(_JPEG_PROG_AC_LENGTHS)

    # ---- headers: SOI APP0 DQT SOF2 DHT ----
    qt_zz = bytes(int(qt.reshape(64)[i]) for i in _JPEG_ZZ_FLAT)
    out = bytearray(b"\xff\xd8")
    out += b"\xff\xe0" + struct.pack(">H", 16)
    out += b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + qt_zz
    sof = struct.pack(">BHHB", 8, h, w, n)
    for cid in range(1, n + 1):
        sof += bytes((cid, 0x11, 0))
    out += b"\xff\xc2" + struct.pack(">H", 2 + len(sof)) + sof  # SOF2
    dc_bits, dc_vals, _ = _jpeg_canonical(_JPEG_DC_LENGTHS)
    ac_bits, ac_vals, _ = _jpeg_canonical(_JPEG_PROG_AC_LENGTHS)
    for tc, bits, vals in ((0, dc_bits, dc_vals), (1, ac_bits, ac_vals)):
        seg = bytes((tc << 4,)) + bytes(bits) + bytes(vals)
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(seg)) + seg

    def sos(comp_ids, ss, se, ah, al, entropy):
        hdr = bytes((len(comp_ids),))
        for cid in comp_ids:
            hdr += bytes((cid, 0x00))  # DC table 0 / AC table 0
        hdr += bytes((ss, se, (ah << 4) | al))
        out.extend(b"\xff\xda" + struct.pack(">H", 2 + len(hdr)) + hdr)
        out.extend(entropy)

    if not 1 <= al_levels <= 10:
        raise ValueError("encode_jpeg_progressive: al_levels must be 1-10")
    top = al_levels  # first scans at Al=top, refinements top-1 .. 0

    # ---- scan 1: DC first, interleaved, Al=top ----
    bw = _JpegBitWriter()
    preds = [0] * n
    for by in range(hb):
        for bx in range(wb):
            for ci in range(n):
                v = int(blocks[ci][by, bx, 0]) >> top  # arithmetic shift
                diff = v - preds[ci]
                preds[ci] = v
                sz = _jpeg_size(diff)
                code, ln = dc_enc[sz]
                bw.write(code, ln)
                if sz:
                    bw.write(diff if diff > 0 else diff + (1 << sz) - 1, sz)
    sos(list(range(1, n + 1)), 0, 0, 0, top, bw.flush())

    # ---- AC first scans per component and band, Al=1 ----
    def ac_first(ci, ss, se, al):
        bw = _JpegBitWriter()
        eobrun = 0

        def flush_eob():
            nonlocal eobrun
            if eobrun:
                r = eobrun.bit_length() - 1
                code, ln = ac_enc[r << 4]
                bw.write(code, ln)
                if r:
                    bw.write(eobrun - (1 << r), r)
                eobrun = 0

        for by in range(hb):
            for bx in range(wb):
                blk = blocks[ci][by, bx]
                r = 0
                for k in range(ss, se + 1):
                    t = int(blk[k])
                    tv = abs(t) >> al  # sign-magnitude point transform
                    if t < 0:
                        tv = -tv
                    if tv == 0:
                        r += 1
                        continue
                    flush_eob()
                    while r > 15:
                        code, ln = ac_enc[0xF0]
                        bw.write(code, ln)
                        r -= 16
                    sz = _jpeg_size(tv)
                    code, ln = ac_enc[(r << 4) | sz]
                    bw.write(code, ln)
                    bw.write(tv if tv > 0 else tv + (1 << sz) - 1, sz)
                    r = 0
                if r > 0:
                    eobrun += 1
                    if eobrun == 0x7FFF:
                        flush_eob()
        flush_eob()
        return bw.flush()

    for ci in range(n):
        sos([ci + 1], 1, 5, 0, top, ac_first(ci, 1, 5, top))
    for ci in range(n):
        sos([ci + 1], 6, 63, 0, top, ac_first(ci, 6, 63, top))

    # ---- DC refinements, interleaved, Ah=al+1 Al=al for al=top-1..0 ----
    for al in range(top - 1, -1, -1):
        bw = _JpegBitWriter()
        for by in range(hb):
            for bx in range(wb):
                for ci in range(n):
                    bw.write(
                        1 if int(blocks[ci][by, bx, 0]) & (1 << al) else 0, 1
                    )
        sos(list(range(1, n + 1)), 0, 0, al + 1, al, bw.flush())

    # ---- AC refinement per component and band, Ah=1 Al=0 ----
    def ac_refine(ci, ss, se, al):
        bw = _JpegBitWriter()
        eobrun = 0
        pending: list[int] = []

        def flush_eob():
            nonlocal eobrun, pending
            if eobrun:
                r = eobrun.bit_length() - 1
                code, ln = ac_enc[r << 4]
                bw.write(code, ln)
                if r:
                    bw.write(eobrun - (1 << r), r)
                for b in pending:
                    bw.write(b, 1)
                eobrun = 0
                pending = []

        for by in range(hb):
            for bx in range(wb):
                blk = blocks[ci][by, bx]
                absv = [abs(int(blk[k])) >> al for k in range(ss, se + 1)]
                eobk = ss - 1  # last newly-visible coefficient's k
                for i, t in enumerate(absv):
                    if t == 1:
                        eobk = ss + i
                r = 0
                brbits: list[int] = []
                for i, t in enumerate(absv):
                    k = ss + i
                    if t == 0:
                        r += 1
                        continue
                    # ZRLs not foldable into the EOB run (Annex G: only
                    # zero runs BEFORE the last newly-visible coefficient
                    # need ZRL); runs after eobk ride the EOB run.  The
                    # flush fires at EVERY nonzero so correction bits only
                    # ever buffer under r <= 15 — the invariant that keeps
                    # them inside the decoder's 16-zero ZRL walk.
                    while r > 15 and k <= eobk:
                        flush_eob()
                        code, ln = ac_enc[0xF0]
                        bw.write(code, ln)
                        r -= 16
                        for b in brbits:
                            bw.write(b, 1)
                        brbits = []
                    if t > 1:  # history-nonzero: one correction bit
                        brbits.append(t & 1)
                        continue
                    # newly-visible coefficient: run/1 + sign + buffered
                    flush_eob()
                    code, ln = ac_enc[(r << 4) | 1]
                    bw.write(code, ln)
                    bw.write(1 if int(blk[k]) >= 0 else 0, 1)
                    for b in brbits:
                        bw.write(b, 1)
                    brbits = []
                    r = 0
                if r > 0 or brbits:
                    eobrun += 1
                    pending.extend(brbits)
                    if eobrun == 0x7FFF:
                        flush_eob()
        flush_eob()
        return bw.flush()

    for al in range(top - 1, -1, -1):
        for ci in range(n):
            sos([ci + 1], 1, 5, al + 1, al, ac_refine(ci, 1, 5, al))
        for ci in range(n):
            sos([ci + 1], 6, 63, al + 1, al, ac_refine(ci, 6, 63, al))

    return bytes(out) + b"\xff\xd9"


def _jpeg_entropy_assemble(
    comp_blocks, w, h, qt, samps=None, restart_interval: int = 0
) -> bytes:
    import numpy as np

    qt_zz = bytes(
        int(np.asarray(qt, np.int32).reshape(64)[i]) for i in _JPEG_ZZ_FLAT
    )
    _, _, dc_enc = _jpeg_canonical(_JPEG_DC_LENGTHS)
    _, _, ac_enc = _jpeg_canonical(_JPEG_AC_LENGTHS)
    samps = samps or [0x11] * len(comp_blocks)
    factors = [(s >> 4, s & 0x0F) for s in samps]
    hmax = max(f[0] for f in factors)
    vmax = max(f[1] for f in factors)
    mcux, mcuy = -(-w // (8 * hmax)), -(-h // (8 * vmax))
    for cb, (hi, vi) in zip(comp_blocks, factors):
        if cb.shape[:2] != (mcuy * vi, mcux * hi):
            raise ValueError(
                "encode_jpeg: component block grid does not match its "
                f"sampling factors (got {cb.shape[:2]}, "
                f"want {(mcuy * vi, mcux * hi)})"
            )
    bw = _JpegBitWriter()
    preds = [0] * len(comp_blocks)
    ri, mcu_done, rst_n = restart_interval, 0, 0
    # T.81 interleaved MCU order: per MCU, each component contributes its
    # hi x vi blocks in raster order.  At 4:4:4 this degenerates to the
    # one-block-per-component order the encoder always used.
    for my in range(mcuy):
        for mx in range(mcux):
            for ci, cb in enumerate(comp_blocks):
                hi, vi = factors[ci]
                for byi in range(vi):
                    for bxi in range(hi):
                        preds[ci] = _jpeg_encode_block(
                            bw,
                            cb[my * vi + byi, mx * hi + bxi],
                            preds[ci],
                            dc_enc,
                            ac_enc,
                        )
            mcu_done += 1
            if ri and mcu_done % ri == 0 and mcu_done < mcux * mcuy:
                bw.restart(rst_n)  # byte-align + RST(n mod 8)
                rst_n = (rst_n + 1) & 7
                preds = [0] * len(comp_blocks)
    return (
        _jpeg_headers(
            w,
            h,
            qt_zz,
            len(comp_blocks),
            samps=samps,
            restart_interval=restart_interval,
        )
        + bw.flush()
        + b"\xff\xd9"
    )


def _jpeg_find_scan_end(blob: bytes, pos: int) -> int:
    """Position of the marker terminating the entropy-coded segment that
    starts at ``pos``: the next 0xFF not followed by a 0x00 stuffing
    byte.  (RSTn would also terminate it, but progressive decode rejects
    DRI up front, so any RST here surfaces as a marker error later.)"""
    i = pos
    n = len(blob)
    while i < n - 1:
        if blob[i] == 0xFF and blob[i + 1] != 0x00:
            return i
        i += 2 if blob[i] == 0xFF else 1
    raise ValueError("decode_jpeg: truncated entropy data")


def _jpeg_decode_prog_scan(
    br, scan_comps, ss, se, ah, al, prog_coeffs, dc_luts, ac_luts, comps, w, h
):
    """Decode ONE progressive scan (T.81 Annex G, Huffman): DC first /
    DC refinement (interleaved or single-component) and AC first / AC
    refinement (single-component spectral bands with EOB runs),
    accumulating successive-approximation bits into ``prog_coeffs``
    (zigzag order, python-int-safe int64).  Mirrors the libjpeg-style
    point-transform conventions exactly: DC uses arithmetic shifts on
    the signed value (refinement ORs magnitude bits — two's-complement
    OR, which python's arbitrary-precision ints honor), AC uses
    sign-magnitude shifts with per-coefficient correction bits."""
    if ss == 0 and se != 0:
        raise ValueError("decode_jpeg: DC scan must have Se = 0")
    if ss > se or se > 63:
        raise ValueError("decode_jpeg: bad spectral band")
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if ss == 0:  # ---- DC scan ----
        preds = [0] * len(scan_comps)
        if len(scan_comps) > 1:  # interleaved MCU raster
            mcux, mcuy = -(-w // (8 * hmax)), -(-h // (8 * vmax))
            for my in range(mcuy):
                for mx in range(mcux):
                    for ci, (comp, td, _ta) in enumerate(scan_comps):
                        cf = prog_coeffs[comp["id"]]
                        for byi in range(comp["v"]):
                            for bxi in range(comp["h"]):
                                by = my * comp["v"] + byi
                                bx = mx * comp["h"] + bxi
                                preds[ci] = _jpeg_prog_dc_block(
                                    br, cf, by, bx, dc_luts, td,
                                    preds[ci], ah, al,
                                )
        else:  # single component: its own ceil grid
            comp, td, _ta = scan_comps[0]
            cf = prog_coeffs[comp["id"]]
            hb = (-(-(h * comp["v"]) // vmax) + 7) // 8
            wb = (-(-(w * comp["h"]) // hmax) + 7) // 8
            for by in range(hb):
                for bx in range(wb):
                    preds[0] = _jpeg_prog_dc_block(
                        br, cf, by, bx, dc_luts, td, preds[0], ah, al
                    )
        return 0
    # ---- AC scan: exactly one component (T.81 B.2.3) ----
    if len(scan_comps) != 1:
        raise ValueError("decode_jpeg: progressive AC scan must be "
                         "single-component")
    comp, _td, ta = scan_comps[0]
    cf = prog_coeffs[comp["id"]]
    lut = ac_luts[ta]
    hb = (-(-(h * comp["v"]) // vmax) + 7) // 8
    wb = (-(-(w * comp["h"]) // hmax) + 7) // 8
    eobrun = 0
    p1 = 1 << al
    m1 = -p1
    for by in range(hb):
        for bx in range(wb):
            blk = cf[by, bx]
            if ah == 0:  # first AC scan for this band
                if eobrun > 0:
                    eobrun -= 1
                    continue
                k = ss
                while k <= se:
                    rs = br.read_symbol(lut)
                    r, sz = rs >> 4, rs & 15
                    if sz == 0:
                        if r == 15:
                            k += 16
                            continue
                        eobrun = (1 << r) - 1
                        if r:
                            eobrun += br.read_bits(r)
                        break
                    k += r
                    if k > se:
                        raise ValueError(
                            "decode_jpeg: AC run past band end"
                        )
                    blk[k] = _jpeg_extend(br.read_bits(sz), sz) * p1
                    k += 1
            else:  # AC refinement scan
                k = ss
                if eobrun == 0:
                    while k <= se:
                        rs = br.read_symbol(lut)
                        r, sz = rs >> 4, rs & 15
                        newval = 0
                        if sz == 0:
                            if r != 15:
                                eobrun = 1 << r
                                if r:
                                    eobrun += br.read_bits(r)
                                break
                            # r == 15: skip 16 zero-history coefficients
                        else:
                            if sz != 1:
                                raise ValueError(
                                    "decode_jpeg: AC refinement size "
                                    "must be 1"
                                )
                            newval = p1 if br.read_bits(1) else m1
                        while k <= se:
                            v = int(blk[k])
                            if v != 0:
                                if br.read_bits(1) and (v & p1) == 0:
                                    blk[k] = v + (p1 if v >= 0 else m1)
                            else:
                                if r == 0:
                                    break
                                r -= 1
                            k += 1
                        if newval:
                            if k > se:
                                raise ValueError(
                                    "decode_jpeg: AC refinement run "
                                    "past band end"
                                )
                            blk[k] = newval
                        k += 1
                if eobrun > 0:
                    while k <= se:
                        v = int(blk[k])
                        if v != 0:
                            if br.read_bits(1) and (v & p1) == 0:
                                blk[k] = v + (p1 if v >= 0 else m1)
                        k += 1
                    eobrun -= 1
    return eobrun


def _jpeg_prog_dc_block(br, cf, by, bx, dc_luts, td, pred, ah, al):
    """One block's DC contribution in a progressive scan: first scan
    (Ah=0) decodes a baseline-style DC diff of the point-transformed
    value and stores pred << Al; refinement (Ah>0) ORs one raw bit into
    bit position Al (two's-complement OR, matching the encoder's
    arithmetic-shift point transform)."""
    if ah == 0:
        sz = br.read_symbol(dc_luts[td])
        if sz > 15:  # corrupt DHT symbol: DC size categories are <= 15
            raise ValueError(f"decode_jpeg: bad DC size category {sz}")
        diff = _jpeg_extend(br.read_bits(sz), sz) if sz else 0
        pred += diff
        if abs(pred) > 1 << 30:  # corrupt-stream predictor runaway
            raise ValueError("decode_jpeg: DC predictor out of range")
        cf[by, bx, 0] = pred << al
        return pred
    if br.read_bits(1):
        cf[by, bx, 0] = int(cf[by, bx, 0]) | (1 << al)
    return pred


def decode_jpeg(blob: bytes, return_coeffs: bool = False):
    """Decode a baseline sequential OR progressive JPEG (grayscale or
    YCbCr) with
    stdlib struct + numpy: marker parse (DQT/DHT/SOF0/SOS; APPn/COM
    skipped), canonical Huffman decode with byte unstuffing, DC
    prediction, dequantization, inverse zigzag, 8x8 IDCT, level shift +
    clamp, and YCbCr->RGB for color.  Interleaved-MCU scans with
    sampling factors up to 4 decode for real (4:4:4 / 4:2:2 / 4:2:0 /
    4:1:1 — chroma reconstructed by sample replication, the exact
    inverse of the encoder's box mean on block-constant chroma), as do
    restart intervals (DRI + RSTn modulo-8 sequence check, DC-predictor
    resets, byte realignment — round 10), and PROGRESSIVE streams (SOF2,
    T.81 Annex G — round 10's closure of the largest declared seam):
    multi-scan spectral selection with EOB runs and successive
    approximation on both the DC path (arithmetic-shift point transform,
    raw refinement bits OR-ed into the magnitude) and the AC path
    (sign-magnitude first scans, correction-bit refinement with the
    Annex G buffering order), accumulated per component across scans and
    reconstructed once at EOI.  Fractional factor ratios (e.g. 3 vs 4),
    arithmetic coding (SOF9+), 12-bit precision, and DRI inside
    progressive scans raise NotImplementedError — the honest subset
    boundary.

    Returns HxW (grayscale) or HxWx3 (RGB) uint8 pixels; with
    ``return_coeffs=True`` returns (pixels, coeffs) where coeffs is a
    per-component list of (hb, wb, 64) zigzag-ordered quantized
    coefficient arrays, before dequantization — the entropy-exact view."""
    import struct

    import numpy as np

    if blob[:2] != b"\xff\xd8":
        raise ValueError("decode_jpeg: not a JPEG stream")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    dc_luts: dict[int, dict] = {}
    ac_luts: dict[int, dict] = {}
    comps = None
    w = h = None
    scan_comps = None
    restart_interval = 0
    progressive = False
    prog_coeffs = None  # per-component zigzag coeff arrays across scans
    prog_eobrun = 0
    while True:
        if pos + 2 > len(blob):
            raise ValueError("decode_jpeg: truncated before SOS")
        if blob[pos] != 0xFF:
            raise ValueError(f"decode_jpeg: expected marker at {pos}")
        marker = blob[pos + 1]
        if marker == 0xD9:  # EOI carries no length segment
            if progressive and prog_coeffs is not None:
                break
            raise ValueError("decode_jpeg: no scan data")
        if marker in (0xC1, 0xC3) or 0xC5 <= marker <= 0xCF and marker not in (0xC8, 0xC4, 0xCC):
            raise NotImplementedError(
                f"decode_jpeg: only baseline (SOF0) and progressive "
                f"Huffman (SOF2) supported, got SOF marker 0xFF{marker:02X}"
            )
        if pos + 4 > len(blob):
            raise ValueError("decode_jpeg: truncated before SOS")
        (seglen,) = struct.unpack_from(">H", blob, pos + 2)
        seg = blob[pos + 4 : pos + 2 + seglen]
        if pos + 2 + seglen > len(blob):
            raise ValueError("decode_jpeg: truncated segment")
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0x0F
                if pq != 0:
                    raise NotImplementedError(
                        "decode_jpeg: 16-bit quant tables unsupported"
                    )
                zz = np.frombuffer(seg, np.uint8, 64, i + 1).astype(np.int32)
                qt = np.zeros(64, np.int32)
                qt[_JPEG_ZZ_FLAT] = zz
                qtables[tq] = qt.reshape(8, 8)
                i += 65
        elif marker == 0xC4:  # DHT (possibly several tables per segment)
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0x0F
                bits = list(seg[i + 1 : i + 17])
                n = sum(bits)
                # bound the declared symbol count against the segment —
                # a corrupt bits[] count would otherwise slice short and
                # index past huffval (fuzz finding, round 10)
                if len(bits) < 16 or i + 17 + n > len(seg):
                    raise ValueError(
                        "decode_jpeg: truncated DHT segment"
                    )
                vals = list(seg[i + 17 : i + 17 + n])
                (dc_luts if tc == 0 else ac_luts)[th] = _jpeg_decode_lut(
                    bits, vals
                )
                i += 17 + n
        elif marker in (0xC0, 0xC2):  # SOF0 baseline / SOF2 progressive
            progressive = marker == 0xC2
            if len(seg) < 6:
                raise ValueError("decode_jpeg: truncated SOF segment")
            prec, h, w, nc = struct.unpack_from(">BHHB", seg, 0)
            if len(seg) < 6 + 3 * nc:
                raise ValueError("decode_jpeg: truncated SOF segment")
            if prec != 8:
                raise NotImplementedError("decode_jpeg: only 8-bit precision")
            comps = []
            for ci in range(nc):
                cid, samp, tq = seg[6 + 3 * ci : 9 + 3 * ci]
                hi, vi = samp >> 4, samp & 0x0F
                if not (1 <= hi <= 4 and 1 <= vi <= 4):
                    raise NotImplementedError(
                        "decode_jpeg: sampling factors above 4 unsupported "
                        f"(sampling {samp:#04x})"
                    )
                comps.append({"id": cid, "tq": tq, "h": hi, "v": vi})
        elif marker == 0xDD:  # DRI (round 10: restart intervals decode)
            if len(seg) < 2:
                raise ValueError("decode_jpeg: truncated DRI segment")
            restart_interval = struct.unpack_from(">H", seg, 0)[0]
        elif marker == 0xDA:  # SOS
            # malformed-stream contract: every structural defect raises
            # the documented ValueError, not TypeError/StopIteration/
            # KeyError (code-review finding, round 8)
            if comps is None:
                raise ValueError("decode_jpeg: SOS before SOF0")
            if len(seg) < 1 or len(seg) < 1 + 2 * seg[0] + 3:
                raise ValueError("decode_jpeg: truncated SOS segment")
            nc = seg[0]
            ss, se, ahal = seg[1 + 2 * nc : 4 + 2 * nc]
            ah, al = ahal >> 4, ahal & 0x0F
            scan_comps = []
            for ci in range(nc):
                cid, tables = seg[1 + 2 * ci], seg[2 + 2 * ci]
                comp = next((c for c in comps if c["id"] == cid), None)
                if comp is None:
                    raise ValueError(
                        f"decode_jpeg: scan references undefined "
                        f"component id {cid}"
                    )
                td, ta = tables >> 4, tables & 0x0F
                # a progressive DC scan never touches the AC table and
                # an AC scan never touches the DC table — require only
                # what the scan will actually read
                need_dc = (not progressive) or ss == 0
                need_ac = (not progressive) or se > 0
                if (need_dc and td not in dc_luts) or (
                    need_ac and ta not in ac_luts
                ):
                    raise ValueError(
                        f"decode_jpeg: scan references undefined Huffman "
                        f"table (dc={td}, ac={ta})"
                    )
                if comp["tq"] not in qtables:
                    raise ValueError(
                        f"decode_jpeg: component references undefined "
                        f"quant table {comp['tq']}"
                    )
                scan_comps.append((comp, td, ta))
            pos += 2 + seglen
            if not progressive:
                break
            # ---- progressive scan (round 10): accumulate coefficient
            # bits across scans; reconstruction happens after EOI ----
            if restart_interval:
                raise NotImplementedError(
                    "decode_jpeg: restart intervals inside progressive "
                    "scans unsupported"
                )
            if prog_coeffs is None:
                hmax_all = max(c["h"] for c in comps)
                vmax_all = max(c["v"] for c in comps)
                mcux = -(-w // (8 * hmax_all))
                mcuy = -(-h // (8 * vmax_all))
                prog_coeffs = {
                    c["id"]: np.zeros(
                        (mcuy * c["v"], mcux * c["h"], 64), np.int64
                    )
                    for c in comps
                }
            end = _jpeg_find_scan_end(blob, pos)
            prog_eobrun = _jpeg_decode_prog_scan(
                _JpegBitReader(blob, pos),
                scan_comps,
                ss,
                se,
                ah,
                al,
                prog_coeffs,
                dc_luts,
                ac_luts,
                comps,
                w,
                h,
            )
            del prog_eobrun  # per T.81 the EOB run never crosses a scan
            scan_comps = None
            pos = end
            continue
        pos += 2 + seglen
    if progressive:
        # every scan was consumed in the marker loop; reuse the shared
        # reconstruction below via a synthetic scan_comps (the table ids
        # are irrelevant after entropy decode)
        scan_comps = [(c, None, None) for c in comps]
    if comps is None or scan_comps is None or len(scan_comps) not in (1, 3):
        raise NotImplementedError(
            "decode_jpeg: only 1-component (grayscale) or 3-component "
            "(4:4:4 YCbCr) scans supported"
        )
    hmax = max(c["h"] for (c, _td, _ta) in scan_comps)
    vmax = max(c["v"] for (c, _td, _ta) in scan_comps)
    for (c, _td, _ta) in scan_comps:
        if hmax % c["h"] or vmax % c["v"]:
            raise NotImplementedError(
                "decode_jpeg: fractional chroma upsampling unsupported "
                f"(factors {c['h']}x{c['v']} vs max {hmax}x{vmax}); every "
                "factor must divide the max (4:4:4/4:2:2/4:2:0/4:1:1 do)"
            )
    coeffs = None
    if progressive:
        coeffs = [
            prog_coeffs[comp["id"]].astype(np.int32)
            for (comp, _td, _ta) in scan_comps
        ]
    br = _JpegBitReader(blob, pos)
    preds = [0] * len(scan_comps)
    ri = restart_interval
    mcu_done, rst_n = 0, 0

    def _maybe_restart(total_mcus: int) -> None:
        # T.81 restart machinery: every `ri` MCUs the entropy stream
        # byte-aligns and an RST(n mod 8) marker separates independently
        # decodable segments; DC predictors reset.  The final MCU is
        # followed by EOI, never RST.
        nonlocal mcu_done, rst_n, preds
        mcu_done += 1
        if ri and mcu_done % ri == 0 and mcu_done < total_mcus:
            br.sync_restart(rst_n)
            rst_n = (rst_n + 1) & 7
            preds = [0] * len(scan_comps)

    if coeffs is not None:
        pass  # progressive: coefficient planes already accumulated
    elif len(scan_comps) == 1:
        # non-interleaved scan: the component's own block grid, no MCU
        # padding (T.81 A.2.2); grayscale lands here with hi = vi = 1.
        # In a non-interleaved scan the MCU is ONE block (T.81 A.2.2),
        # so the restart cadence counts blocks.
        comp = scan_comps[0][0]
        hb = (-(-(h * comp["v"]) // vmax) + 7) // 8
        wb = (-(-(w * comp["h"]) // hmax) + 7) // 8
        coeffs = [np.zeros((hb, wb, 64), np.int32)]
        (_comp, td, ta) = scan_comps[0]
        for by in range(hb):
            for bx in range(wb):
                zz, preds[0] = _jpeg_decode_block(
                    br, preds[0], dc_luts[td], ac_luts[ta]
                )
                coeffs[0][by, bx] = zz
                _maybe_restart(hb * wb)
    else:
        # interleaved scan: MCU raster, each component contributing its
        # hi x vi blocks per MCU (this is where 4:2:0's 4Y+Cb+Cr lives)
        mcux, mcuy = -(-w // (8 * hmax)), -(-h // (8 * vmax))
        coeffs = [
            np.zeros((mcuy * c["v"], mcux * c["h"], 64), np.int32)
            for (c, _td, _ta) in scan_comps
        ]
        for my in range(mcuy):
            for mx in range(mcux):
                for ci, (comp, td, ta) in enumerate(scan_comps):
                    hi, vi = comp["h"], comp["v"]
                    for byi in range(vi):
                        for bxi in range(hi):
                            zz, preds[ci] = _jpeg_decode_block(
                                br, preds[ci], dc_luts[td], ac_luts[ta]
                            )
                            coeffs[ci][my * vi + byi, mx * hi + bxi] = zz
                _maybe_restart(mcux * mcuy)
    m = _jpeg_dct_matrix()
    planes = []
    for ci, (comp, _td, _ta) in enumerate(scan_comps):
        hb, wb = coeffs[ci].shape[:2]
        qt = qtables[comp["tq"]].reshape(64).astype(np.float64)
        deq = coeffs[ci].astype(np.float64) * qt[None, None, _JPEG_ZZ_FLAT]
        blocks = np.zeros((hb, wb, 64), np.float64)
        blocks[..., _JPEG_ZZ_FLAT] = deq
        px = m.T @ blocks.reshape(hb, wb, 8, 8) @ m + 128.0
        plane = (
            np.clip(np.round(px), 0, 255)
            .astype(np.uint8)
            .transpose(0, 2, 1, 3)
            .reshape(hb * 8, wb * 8)
        )
        # crop to the component's true dims (ceil(dim * factor / max)),
        # then upsample by sample replication back to full resolution —
        # the T.81-suggested simple reconstruction, and the exact inverse
        # of the encoder's box mean wherever chroma was block-constant
        ch = -(-(h * comp["v"]) // vmax)
        cw = -(-(w * comp["h"]) // hmax)
        plane = plane[:ch, :cw]
        ry, rx = vmax // comp["v"], hmax // comp["h"]
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        planes.append(plane[:h, :w])
    if len(planes) == 1:
        pixels = planes[0]
    else:
        pixels = ycbcr_to_rgb(np.stack(planes, axis=-1))
    return (pixels, coeffs) if return_coeffs else pixels


# ------------------------------------------------------------------- GIF ---
# GIF87a with REAL variable-width LZW, implemented from scratch (unlike the
# PNG codec, which leans on stdlib zlib for DEFLATE, the LZW entropy stage
# here is hand-rolled: dictionary growth 9->12 bits, clear/EOI codes,
# LSB-first bit packing, 255-byte sub-block framing).  Honest subset:
# single-frame, 8-bit global color table, optionally 4-pass interlaced
# (round 10); GIF89a extension blocks are skipped per spec; animation and
# local color tables raise explicitly.


def _gif_interlace_order(h: int) -> list[int]:
    """GIF 4-pass interlace row schedule (89a spec appendix E): storage
    row k holds display row order[k] — passes start at rows 0/4/2/1 with
    strides 8/8/4/2."""
    return (
        list(range(0, h, 8))
        + list(range(4, h, 8))
        + list(range(2, h, 4))
        + list(range(1, h, 2))
    )


def encode_gif(indexed, palette, interlace: bool = False) -> bytes:
    """Encode an HxW uint8 INDEX array + a 256x3 palette as a GIF87a byte
    stream: logical screen descriptor, global color table, image
    descriptor, and a real variable-width LZW-compressed index stream
    (min code size 8, dictionary 9->12 bits with clear-code resets,
    LSB-first bits, sub-block framing).  GIF is lossless for indexed
    content, so decode(encode(img)) round-trips bitwise.
    ``interlace=True`` (round 10) stores rows in the 4-pass schedule and
    sets the image-descriptor interlace flag — the progressive-render
    layout many real-world GIFs use."""
    import struct

    import numpy as np

    idx = np.asarray(indexed, np.uint8)
    pal = np.asarray(palette, np.uint8)
    if pal.shape != (256, 3):
        raise ValueError("encode_gif: palette must be 256x3")
    h, w = idx.shape
    if interlace:
        idx = idx[_gif_interlace_order(h)]
    out = bytearray(b"GIF87a")
    # logical screen: global color table, 8 bits/pixel, 256 entries
    out += struct.pack("<HHBBB", w, h, 0xF7, 0, 0)
    out += pal.tobytes()
    out += b"\x2c" + struct.pack(
        "<HHHHB", 0, 0, w, h, 0x40 if interlace else 0
    )  # image descriptor
    out.append(8)  # LZW minimum code size

    # --- LZW compress (variable width, MSB of stream = LSB-first bits) ---
    CLEAR, EOI = 256, 257
    acc = 0
    nbits = 0
    data = bytearray()

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits  # LSB-first: new bits above existing ones
        nbits += width
        while nbits >= 8:
            data.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table: dict[bytes, int] = {bytes((i,)): i for i in range(256)}
    next_code = 258
    width = 9
    emit(CLEAR, width)
    seq = b""
    for b in idx.tobytes():
        cand = seq + bytes((b,))
        if cand in table:
            seq = cand
            continue
        emit(table[seq], width)
        table[cand] = next_code
        next_code += 1
        # width grows when the NEXT code to be assigned no longer fits
        if next_code - 1 == (1 << width) and width < 12:
            width += 1
        elif next_code - 1 == (1 << 12):
            emit(CLEAR, width)
            table = {bytes((i,)): i for i in range(256)}
            next_code, width = 258, 9
        seq = bytes((b,))
    if seq:
        emit(table[seq], width)
        # mirror the decoder's bookkeeping for the TAIL code too: the
        # decoder appends one dictionary entry for it and, if that append
        # fills the current width (table size reaches 2^width), bumps the
        # width BEFORE reading the next code — which is our EOI.  Without
        # this the EOI is written one bit short at exactly those
        # boundaries; LSB-first zero padding usually masks the misread,
        # but a byte-aligned stream end turns it into a truncation error
        # (code-review finding, round 8).
        next_code += 1
        if next_code - 1 == (1 << width) and width < 12:
            width += 1
    emit(EOI, width)
    if nbits:
        data.append(acc & 0xFF)

    for i in range(0, len(data), 255):
        block = data[i : i + 255]
        out.append(len(block))
        out += block
    out += b"\x00\x3b"  # block terminator + trailer
    return bytes(out)


def _gif_skip_extension(blob: bytes, pos: int) -> int:
    """Skip one 0x21 extension block (label + sub-blocks), bounds-checked
    so truncation raises the documented ValueError."""
    pos += 2
    while True:
        if pos >= len(blob):
            raise ValueError("decode_gif: truncated extension block")
        ln = blob[pos]
        if ln == 0:
            return pos + 1
        if pos + 1 + ln > len(blob):
            raise ValueError("decode_gif: truncated extension block")
        pos += 1 + ln


def _gif_read_image(blob: bytes, pos: int, gct):
    """Parse ONE image block (``blob[pos] == 0x2C``): descriptor, optional
    local color table, LZW data sub-blocks; returns ``(left, top, idx,
    pal, new_pos)`` with ``idx`` the de-interlaced HxW index array and
    ``pal`` the table it maps through (LCT if present, else ``gct``)."""
    import struct

    import numpy as np

    if pos + 10 > len(blob):  # fuzz finding (round 11)
        raise ValueError("decode_gif: truncated image descriptor")
    left, top, iw, ih, iflags = struct.unpack_from("<HHHHB", blob, pos + 1)
    pos += 10
    interlaced = bool(iflags & 0x40)
    pal = gct
    if iflags & 0x80:  # local color table overrides the global
        lct_size = 2 << (iflags & 0x07)
        if pos + lct_size * 3 > len(blob):
            raise ValueError("decode_gif: truncated local color table")
        pal = np.frombuffer(blob, np.uint8, lct_size * 3, pos).reshape(-1, 3)
        pos += lct_size * 3
    if pal is None:
        raise ValueError("decode_gif: no color table (neither GCT nor LCT)")
    if pos >= len(blob):
        raise ValueError("decode_gif: truncated before LZW code size")
    min_code = blob[pos]
    if not 1 <= min_code <= 8:  # fuzz finding: 1<<min_code drives the
        # table allocation, so a wild byte here is a memory DoS
        raise ValueError(f"decode_gif: bad LZW minimum code size {min_code}")
    pos += 1
    data = bytearray()
    while True:
        if pos >= len(blob):
            raise ValueError("decode_gif: truncated image data")
        ln = blob[pos]
        if ln == 0:
            pos += 1
            break
        if pos + 1 + ln > len(blob):
            raise ValueError("decode_gif: truncated image data")
        data += blob[pos + 1 : pos + 1 + ln]
        pos += 1 + ln
    out = _gif_lzw_decode(bytes(data), min_code)
    if len(out) != iw * ih:
        raise ValueError("decode_gif: pixel count mismatch")
    idx = np.frombuffer(out, np.uint8).reshape(ih, iw)
    if interlaced:
        disp = np.empty_like(idx)
        disp[_gif_interlace_order(ih)] = idx
        idx = disp
    return left, top, idx, pal, pos


def _gif_lzw_decode(data: bytes, min_code: int) -> bytes:
    """Variable-width LZW decompression: clear-code resets, deferred width
    growth 9->12 bits, KwKwK corner, LSB-first bit order."""
    CLEAR, EOI = 1 << min_code, (1 << min_code) + 1
    acc = 0
    nbits = 0
    di = 0
    width = min_code + 1
    table: list[bytes] = [bytes((i,)) for i in range(1 << min_code)] + [b"", b""]
    out = bytearray()
    prev: bytes | None = None

    def read_code() -> int:
        nonlocal acc, nbits, di
        while nbits < width:
            if di >= len(data):
                raise ValueError("decode_gif: truncated LZW stream")
            acc |= data[di] << nbits
            di += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        return code

    while True:
        code = read_code()
        if code == CLEAR:
            table = table[: (1 << min_code) + 2]
            width = min_code + 1
            prev = None
            continue
        if code == EOI:
            break
        if prev is None:
            if code >= len(table):  # fuzz finding: first code after a
                raise ValueError("decode_gif: corrupt LZW code")  # clear
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):  # the KwKwK case
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("decode_gif: corrupt LZW code")
        out += entry
        prev = entry
        if len(table) == (1 << width) and width < 12:
            width += 1
    return bytes(out)


def decode_gif(blob: bytes):
    """Decode a single-frame GIF87a/89a stream: screen/image descriptors,
    global color table, extension-block skipping, and full variable-width
    LZW decompression (clear-code resets, deferred width growth, LSB-first
    bit order), including 4-pass interlaced images and per-image LOCAL
    color tables overriding the global one (both round 10: rows scattered
    back through the pass schedule; LCT read from the image descriptor).
    Returns {width, height, indexed, palette, pixels} with pixels the
    palette-mapped HxWx3 uint8 RGB array — `palette` is the table the
    pixels were mapped through.  Multi-frame animations raise
    NotImplementedError here; :func:`decode_gif_frames` (round 10)
    decodes them with full disposal/transparency compositing."""
    import struct

    import numpy as np

    if blob[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("decode_gif: not a GIF stream")
    if len(blob) < 13:  # fuzz finding (round 11): truncated LSD
        raise ValueError("decode_gif: truncated logical screen descriptor")
    w, h, flags, _bg, _ar = struct.unpack_from("<HHBBB", blob, 6)
    pos = 13
    pal = None  # a GIF may carry only a LOCAL table (round 10)
    if flags & 0x80:
        gct_size = 2 << (flags & 0x07)
        pal = np.frombuffer(blob, np.uint8, gct_size * 3, pos).reshape(-1, 3)
        pos += gct_size * 3

    skip_extension = lambda p: _gif_skip_extension(blob, p)  # noqa: E731

    while True:
        if pos >= len(blob):
            raise ValueError("decode_gif: truncated before image data")
        b0 = blob[pos]
        if b0 == 0x21:  # extension: label + sub-blocks, skip per spec
            pos = skip_extension(pos)
        elif b0 == 0x2C:
            break
        elif b0 == 0x3B:
            raise ValueError("decode_gif: no image block")
        else:
            raise ValueError(f"decode_gif: unknown block 0x{b0:02X}")
    _left, _top, idx, pal, pos = _gif_read_image(blob, pos, pal)
    ih, iw = idx.shape
    # honest-subset guard: a SECOND image block anywhere in the remainder
    # (real animations put graphics-control extensions between frames, so
    # a blob[pos] == 0x2C check would miss them — code-review finding,
    # round 8) must raise, not silently return frame 1 — the caller wants
    # decode_gif_frames for those
    while pos < len(blob):
        b0 = blob[pos]
        if b0 == 0x2C:
            raise NotImplementedError(
                "decode_gif: multi-frame GIFs unsupported here — use "
                "decode_gif_frames"
            )
        if b0 == 0x21:
            pos = skip_extension(pos)
        elif b0 == 0x3B:
            break
        else:
            raise ValueError(f"decode_gif: unknown block 0x{b0:02X}")
    return {
        "width": iw,
        "height": ih,
        "indexed": idx,
        "palette": pal,
        "pixels": pal[idx],
    }


def decode_gif_frames(blob: bytes):
    """Decode a GIF87a/89a ANIMATION (round 10; was the last declared GIF
    seam) with full per-frame compositing per the 89a disposal model:

    * graphic-control extensions (0x21 0xF9) supply each frame's delay,
      TRANSPARENCY index (transparent pixels leave the underlying canvas
      untouched), and disposal method;
    * disposal 0/1 leave the composited frame in place, 2 restores the
      frame's rect to the background color, 3 restores the pre-frame
      canvas (the "restore to previous" method);
    * frames may be sub-rects at any offset, interlaced, and carry local
      color tables — all via the shared :func:`_gif_read_image`.

    Returns {width, height, n_frames, frames} where each frame dict holds
    {delay_cs, disposal, canvas} — ``canvas`` the FULL logical-screen
    HxWx3 uint8 RGB snapshot a viewer shows during that frame's delay.
    This is the real input shape for per-frame sampling ops (l26's
    family): frame extraction at the container level, no video libs."""
    import struct

    import numpy as np

    if blob[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("decode_gif: not a GIF stream")
    if len(blob) < 13:  # fuzz finding (round 11): truncated LSD
        raise ValueError("decode_gif: truncated logical screen descriptor")
    w, h, flags, bg, _ar = struct.unpack_from("<HHBBB", blob, 6)
    pos = 13
    gct = None
    if flags & 0x80:
        gct_size = 2 << (flags & 0x07)
        gct = np.frombuffer(blob, np.uint8, gct_size * 3, pos).reshape(-1, 3)
        pos += gct_size * 3
    bg_rgb = (
        gct[bg] if gct is not None and bg < len(gct) else np.zeros(3, np.uint8)
    )
    canvas = np.broadcast_to(bg_rgb, (h, w, 3)).astype(np.uint8).copy()
    frames = []
    # pending graphic-control state for the NEXT image block
    delay_cs, disposal, t_index = 0, 0, None
    while pos < len(blob):
        b0 = blob[pos]
        if b0 == 0x3B:  # trailer
            break
        if b0 == 0x21:
            if pos + 1 < len(blob) and blob[pos + 1] == 0xF9:  # GCE
                if pos + 7 >= len(blob) or blob[pos + 2] != 4:
                    raise ValueError("decode_gif: malformed graphic control")
                packed = blob[pos + 3]
                delay_cs = struct.unpack_from("<H", blob, pos + 4)[0]
                t_index = blob[pos + 6] if packed & 0x01 else None
                disposal = (packed >> 2) & 0x07
            pos = _gif_skip_extension(blob, pos)
            continue
        if b0 != 0x2C:
            raise ValueError(f"decode_gif: unknown block 0x{b0:02X}")
        left, top, idx, pal, pos = _gif_read_image(blob, pos, gct)
        ih, iw = idx.shape
        if left + iw > w or top + ih > h:
            raise ValueError("decode_gif: frame rect outside logical screen")
        if int(idx.max(initial=0)) >= len(pal):
            raise ValueError("decode_gif: palette index out of range")
        before = canvas[top : top + ih, left : left + iw].copy()
        region = canvas[top : top + ih, left : left + iw]
        if t_index is None:
            region[:] = pal[idx]
        else:
            opaque = idx != t_index
            region[opaque] = pal[idx][opaque]
        frames.append(
            {
                "delay_cs": delay_cs,
                "disposal": disposal,
                "canvas": canvas.copy(),
            }
        )
        if disposal == 2:  # restore rect to background color
            canvas[top : top + ih, left : left + iw] = bg_rgb
        elif disposal == 3:  # restore to previous canvas
            canvas[top : top + ih, left : left + iw] = before
        delay_cs, disposal, t_index = 0, 0, None
    if not frames:
        raise ValueError("decode_gif: no image block")
    return {"width": w, "height": h, "n_frames": len(frames), "frames": frames}


# ------------------------------------------------------------- WAV/PCM ---


def encode_wav(samples, sample_rate: int = 16000) -> bytes:
    """Encode PCM samples — shape (n,) mono or (n, ch) interleaved — as a
    canonical RIFF/WAVE byte stream (44-byte header + little-endian
    sample data).  The sample dtype picks the wire format (round 10):
    int16 -> 16-bit integer PCM (format 1), float32/float64 -> IEEE-float
    PCM (format 3); anything else is encoded as int16 for compatibility.
    WAV is lossless, so unlike JPEG the round trip is bitwise for
    arbitrary content."""
    import struct

    import numpy as np

    s = np.asarray(samples)
    if s.dtype == np.float32:
        audio_fmt, wire, width = 3, "<f4", 4
    elif s.dtype == np.float64:
        audio_fmt, wire, width = 3, "<f8", 8
    else:
        s = s.astype(np.int16)
        audio_fmt, wire, width = 1, "<i2", 2
    if s.ndim == 1:
        s = s[:, None]
    n, ch = s.shape
    data = s.reshape(-1).astype(wire).tobytes()
    block_align = width * ch
    fmt = struct.pack(
        "<HHIIHH",
        audio_fmt,
        ch,
        sample_rate,
        sample_rate * block_align,
        block_align,
        8 * width,
    )
    return (
        b"RIFF"
        + struct.pack("<I", 36 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


#: IMA/DVI ADPCM tables (public spec: IMA Digital Audio Pack, also the
#: values in Microsoft's WAVE format 0x0011 documentation)
_IMA_INDEX_TABLE = (-1, -1, -1, -1, 2, 4, 6, 8, -1, -1, -1, -1, 2, 4, 6, 8)
_IMA_STEP_TABLE = (
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
)


def _ima_step(predictor: int, index: int, nibble: int):
    """One IMA ADPCM state transition (shared by encoder and decoder so
    both sides run the IDENTICAL integer arithmetic): reconstruct the
    difference from the 4-bit code at the current step size, update and
    clamp the predictor, then adapt the step index."""
    step = _IMA_STEP_TABLE[index]
    diff = step >> 3
    if nibble & 1:
        diff += step >> 2
    if nibble & 2:
        diff += step >> 1
    if nibble & 4:
        diff += step
    predictor = predictor - diff if nibble & 8 else predictor + diff
    predictor = max(-32768, min(32767, predictor))
    index = max(0, min(88, index + _IMA_INDEX_TABLE[nibble]))
    return predictor, index


def encode_wav_adpcm(samples, sample_rate: int = 16000) -> bytes:
    """Encode int16 PCM — (n,) mono or (n, ch) — as a RIFF/WAVE IMA ADPCM
    stream (wFormatTag 0x0011, round 11; was the declared audio seam):
    4-bit codes at ~4:1 compression, block_align = 256*ch so every block
    carries 505 samples per channel (4-byte per-channel block header =
    predictor int16 + step index + reserved, then channel-interleaved
    4-byte nibble words, LOW nibble first).  A `fact` chunk records the
    true sample count so the decoder trims final-block padding exactly.
    ADPCM is lossy by design — the companion test asserts tracking error
    bounds, not identity."""
    import struct

    import numpy as np

    s = np.asarray(samples).astype(np.int16)
    if s.ndim == 1:
        s = s[:, None]
    n, ch = s.shape
    if n == 0:
        raise ValueError("encode_wav_adpcm: empty input")
    block_align = 256 * ch
    spb = (block_align - 4 * ch) * 2 // ch + 1  # samples per block: 505
    data = bytearray()
    for b0 in range(0, n, spb):
        blk = s[b0 : b0 + spb]
        if blk.shape[0] < spb:  # pad the final block with its last frame
            blk = np.vstack([blk, np.repeat(blk[-1:], spb - blk.shape[0], 0)])
        preds = [int(blk[0, c]) for c in range(ch)]
        # the header re-seeds predictor+index per block, so any index
        # choice is spec-valid; 0 keeps the stream deterministic and
        # self-contained (no cross-block encoder state)
        idxs = [0] * ch
        for c in range(ch):
            data += struct.pack("<hBB", preds[c], idxs[c], 0)
        nibbles = [[] for _ in range(ch)]
        for i in range(1, spb):
            for c in range(ch):
                sample = int(blk[i, c])
                step = _IMA_STEP_TABLE[idxs[c]]
                diff = sample - preds[c]
                code = 0
                if diff < 0:
                    code = 8
                    diff = -diff
                if diff >= step:
                    code |= 4
                    diff -= step
                if diff >= step >> 1:
                    code |= 2
                    diff -= step >> 1
                if diff >= step >> 2:
                    code |= 1
                preds[c], idxs[c] = _ima_step(preds[c], idxs[c], code)
                nibbles[c].append(code)
        # (spb - 1) = 504 nibbles per channel = 63 4-byte words; channel
        # words interleave per spec: ch0 word, ch1 word, ...
        words = [
            [
                bytes(
                    (nibs[w * 8 + 2 * j] | (nibs[w * 8 + 2 * j + 1] << 4))
                    for j in range(4)
                )
                for w in range(len(nibs) // 8)
            ]
            for nibs in nibbles
        ]
        for w in range(len(words[0])):
            for c in range(ch):
                data += words[c][w]
    fmt = struct.pack(
        "<HHIIHHHH",
        0x11,
        ch,
        sample_rate,
        sample_rate * block_align // spb,  # avg bytes/sec (approximate)
        block_align,
        4,  # bits per (coded) sample
        2,  # cbSize
        spb,  # wSamplesPerBlock
    )
    fact = struct.pack("<I", n)
    return (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(fact) + 8 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"fact"
        + struct.pack("<I", len(fact))
        + fact
        + b"data"
        + struct.pack("<I", len(data))
        + bytes(data)
    )


def decode_wav(blob: bytes) -> dict:
    """Decode a RIFF/WAVE stream: chunk walk (unknown chunks like LIST are
    skipped per the RIFF spec, including odd-length padding); 8/16/24/32-
    bit integer PCM and 32/64-bit IEEE-float PCM (round 10 — 24-bit is
    unpacked from 3-byte frames with sign extension; 8-bit stays unsigned
    per the spec); IMA/DVI ADPCM (0x11), MS ADPCM (2) and G.711
    mu-law/A-law (7/6) all decode for real (round 11).  Formats beyond
    those (MP3-in-WAV, extensible sub-formats, ...) raise the honest
    NotImplementedError seam.  Returns {sample_rate, n_channels,
    n_samples, samples} with samples an (n, ch) array in the natural
    dtype (uint8 / int16 / int32 / float32 / float64; companded and
    ADPCM formats expand to int16)."""
    import struct

    import numpy as np

    if blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
        raise ValueError("decode_wav: not a RIFF/WAVE stream")
    pos, fmt, data, fmt_raw, fact_n = 12, None, None, b"", None
    while pos + 8 <= len(blob):
        cid = blob[pos : pos + 4]
        (ln,) = struct.unpack_from("<I", blob, pos + 4)
        if pos + 8 + ln > len(blob):
            raise ValueError("decode_wav: truncated chunk")
        if cid == b"fmt ":
            if ln < 16:  # review finding (round 11): a short fmt chunk
                # would read the NEXT chunk's bytes as format fields
                raise ValueError("decode_wav: short fmt chunk")
            fmt = struct.unpack_from("<HHIIHH", blob, pos + 8)
            fmt_raw = blob[pos + 8 : pos + 8 + ln]
        elif cid == b"fact" and ln >= 4:
            (fact_n,) = struct.unpack_from("<I", blob, pos + 8)
        elif cid == b"data":
            data = blob[pos + 8 : pos + 8 + ln]
        pos += 8 + ln + (ln & 1)  # RIFF pads odd chunks to even offsets
    if fmt is None or data is None:
        raise ValueError("decode_wav: missing fmt or data chunk")
    audio_fmt, ch, rate, _brate, _balign, bits = fmt
    if ch == 0:  # fuzz finding (round 11): 0 channels would divide by
        raise ValueError("decode_wav: zero channels")  # zero downstream
    if audio_fmt == 1:  # integer PCM; round 10 widens 16 -> 8/16/24/32
        if bits == 16:
            s = np.frombuffer(data, "<i2")
        elif bits == 8:  # 8-bit WAV is UNSIGNED per the spec
            s = np.frombuffer(data, np.uint8)
        elif bits == 32:
            s = np.frombuffer(data, "<i4")
        elif bits == 24:  # packed 3-byte little-endian, sign-extended
            raw24 = np.frombuffer(data, np.uint8)
            if len(raw24) % 3:
                raise ValueError("decode_wav: 24-bit data not 3-byte aligned")
            raw24 = raw24.reshape(-1, 3).astype(np.int32)
            s = raw24[:, 0] | (raw24[:, 1] << 8) | (raw24[:, 2] << 16)
            s = (s << 8) >> 8  # sign-extend bit 23 through the int32
        else:
            raise NotImplementedError(
                f"decode_wav: unsupported integer PCM width ({bits}-bit)"
            )
    elif audio_fmt == 3:  # IEEE float PCM (round 10; was a declared seam)
        if bits == 32:
            s = np.frombuffer(data, "<f4")
        elif bits == 64:
            s = np.frombuffer(data, "<f8")
        else:
            raise NotImplementedError(
                f"decode_wav: unsupported float width ({bits}-bit)"
            )
    elif audio_fmt == 0x11:  # IMA/DVI ADPCM (round 11; was the seam)
        if bits != 4:
            raise ValueError(f"decode_wav: IMA ADPCM must be 4-bit, got {bits}")
        if len(fmt_raw) < 20:
            raise ValueError("decode_wav: IMA ADPCM fmt missing wSamplesPerBlock")
        (spb,) = struct.unpack_from("<H", fmt_raw, 18)
        block_align = _balign
        if block_align < 4 * ch or (block_align - 4 * ch) % (4 * ch):
            raise ValueError("decode_wav: bad IMA ADPCM block align")
        if spb != (block_align - 4 * ch) * 2 // ch + 1:
            raise ValueError("decode_wav: IMA ADPCM samples/block mismatch")
        if len(data) % block_align:
            raise ValueError("decode_wav: IMA ADPCM data not block-aligned")
        out_rows = []
        for boff in range(0, len(data), block_align):
            preds, idxs = [], []
            for c in range(ch):
                p, ix, _r = struct.unpack_from("<hBB", data, boff + 4 * c)
                if ix > 88:
                    raise ValueError("decode_wav: IMA ADPCM step index > 88")
                preds.append(p)
                idxs.append(ix)
            # header predictor IS sample 0 of the block
            block = [[preds[c]] for c in range(ch)]
            body = data[boff + 4 * ch : boff + block_align]
            # channel-interleaved 4-byte words, LOW nibble first
            n_words = len(body) // (4 * ch)
            for w in range(n_words):
                for c in range(ch):
                    word = body[(w * ch + c) * 4 : (w * ch + c) * 4 + 4]
                    for byte in word:
                        for nib in (byte & 0x0F, byte >> 4):
                            preds[c], idxs[c] = _ima_step(preds[c], idxs[c], nib)
                            block[c].append(preds[c])
            for i in range(spb):
                out_rows.append([block[c][i] for c in range(ch)])
        s = np.asarray(out_rows, np.int16).reshape(-1)
        if fact_n is not None:
            s = s.reshape(-1, ch)[:fact_n].reshape(-1)
    elif audio_fmt == 0x02:  # MS ADPCM (round 11; the last audio seam)
        if bits != 4:
            raise ValueError(f"decode_wav: MS ADPCM must be 4-bit, got {bits}")
        if len(fmt_raw) < 22:
            raise ValueError("decode_wav: MS ADPCM fmt missing extension")
        (spb, ncoef) = struct.unpack_from("<HH", fmt_raw, 18)
        if len(fmt_raw) < 22 + 4 * ncoef or ncoef < 1:
            raise ValueError("decode_wav: MS ADPCM fmt missing coefficients")
        coefs = [
            struct.unpack_from("<hh", fmt_raw, 22 + 4 * i) for i in range(ncoef)
        ]
        block_align = _balign
        if block_align < 7 * ch or spb != (block_align - 7 * ch) * 2 // ch + 2:
            raise ValueError("decode_wav: MS ADPCM samples/block mismatch")
        if len(data) % block_align:
            raise ValueError("decode_wav: MS ADPCM data not block-aligned")
        out_rows = []
        for boff in range(0, len(data), block_align):
            preds = [data[boff + c] for c in range(ch)]
            if any(p >= ncoef for p in preds):
                raise ValueError("decode_wav: MS ADPCM predictor out of range")
            base = boff + ch
            deltas = [
                struct.unpack_from("<h", data, base + 2 * c)[0] for c in range(ch)
            ]
            s1 = [
                struct.unpack_from("<h", data, base + 2 * ch + 2 * c)[0]
                for c in range(ch)
            ]
            s2 = [
                struct.unpack_from("<h", data, base + 4 * ch + 2 * c)[0]
                for c in range(ch)
            ]
            block = [[s2[c], s1[c]] for c in range(ch)]
            nib_bytes = data[boff + 7 * ch : boff + block_align]
            cidx = 0
            for byte in nib_bytes:
                for nib in (byte >> 4, byte & 0x0F):  # HIGH nibble first
                    c = cidx % ch
                    c1, c2 = coefs[preds[c]]
                    new_s1, deltas[c] = _ms_step(
                        s1[c], s2[c], c1, c2, deltas[c], nib
                    )
                    s2[c], s1[c] = s1[c], new_s1
                    block[c].append(new_s1)
                    cidx += 1
            for i in range(spb):
                out_rows.append([block[c][i] for c in range(ch)])
        s = np.asarray(out_rows, np.int16).reshape(-1)
        if fact_n is not None:
            s = s.reshape(-1, ch)[:fact_n].reshape(-1)
    elif audio_fmt in (6, 7):  # G.711 A-law / mu-law (round 11)
        if bits != 8:
            raise ValueError(
                f"decode_wav: G.711 must be 8-bit, got {bits}"
            )
        codes = np.frombuffer(data, np.uint8)
        s = _alaw_expand(codes) if audio_fmt == 6 else _ulaw_expand(codes)
        if fact_n is not None:
            s = s.reshape(-1, ch)[:fact_n].reshape(-1)
    else:
        raise NotImplementedError(
            f"decode_wav: only integer (1), IEEE-float (3), MS ADPCM (2), "
            f"IMA ADPCM (0x11), A-law (6) and mu-law (7) supported "
            f"(format {audio_fmt}, {bits}-bit)"
        )
    if ch > 1:
        s = s.reshape(-1, ch)
    else:
        s = s[:, None]
    return {
        "sample_rate": rate,
        "n_channels": ch,
        "n_samples": s.shape[0],
        "samples": s,
    }


#: MS ADPCM (WAVE format 2) tables — public WAVE format documentation
_MS_ADAPT = (230, 230, 230, 230, 307, 409, 512, 614,
             768, 614, 512, 409, 307, 230, 230, 230)
_MS_COEF1 = (256, 512, 0, 192, 240, 460, 392)
_MS_COEF2 = (0, -256, 0, 64, 0, -208, -232)


def _ms_step(s1: int, s2: int, c1: int, c2: int, delta: int, nibble: int):
    """One MS ADPCM state transition (shared by encoder and decoder):
    linear prediction from the two prior samples, signed-nibble error
    term scaled by the adaptive delta, then delta adaptation (floored at
    16 per spec)."""
    signed = nibble - 16 if nibble >= 8 else nibble
    pred = ((s1 * c1 + s2 * c2) >> 8) + signed * delta
    pred = max(-32768, min(32767, pred))
    delta = max(16, (_MS_ADAPT[nibble] * delta) >> 8)
    return pred, delta


def encode_wav_ms_adpcm(samples, sample_rate: int = 16000) -> bytes:
    """Encode int16 PCM — (n,) mono or (n, ch) — as a RIFF/WAVE MS ADPCM
    stream (wFormatTag 0x0002, round 11; the last declared audio seam):
    per block and channel a 7-byte header (coefficient-pair index,
    initial delta, the two seed samples) then 4-bit codes, HIGH nibble
    first, channels interleaved per nibble pair in stereo.  Coefficient
    pair 0 (256, 0) — plain previous-sample prediction — keeps the
    encoder deterministic; the fmt chunk carries the full spec extension
    (wSamplesPerBlock + wNumCoef + the 7 canonical coefficient pairs)
    and a `fact` chunk records the true sample count for final-block
    trimming.  Lossy by design; tests assert tracking bounds."""
    import struct

    import numpy as np

    s = np.asarray(samples).astype(np.int16)
    if s.ndim == 1:
        s = s[:, None]
    n, ch = s.shape
    if n == 0:
        raise ValueError("encode_wav_ms_adpcm: empty input")
    block_align = 256 * ch
    spb = (block_align - 7 * ch) * 2 // ch + 2
    data = bytearray()
    for b0 in range(0, n, spb):
        blk = s[b0 : b0 + spb]
        if blk.shape[0] < spb:
            blk = np.vstack([blk, np.repeat(blk[-1:], spb - blk.shape[0], 0)])
        c1, c2 = _MS_COEF1[0], _MS_COEF2[0]
        s2 = [int(blk[0, c]) for c in range(ch)]
        s1 = [int(blk[1, c]) for c in range(ch)]
        deltas = []
        for c in range(ch):
            # seed delta from the early-block error scale, floored at 16
            diffs = np.abs(np.diff(blk[: min(len(blk), 16), c].astype(np.int32)))
            deltas.append(max(16, int(diffs.mean() // 4) if len(diffs) else 16))
        for c in range(ch):
            data += struct.pack("<B", 0)  # bPredictor: pair 0
        for c in range(ch):
            data += struct.pack("<h", deltas[c])
        for c in range(ch):
            data += struct.pack("<h", s1[c])
        for c in range(ch):
            data += struct.pack("<h", s2[c])
        nibs = []
        for i in range(2, spb):
            for c in range(ch):
                sample = int(blk[i, c])
                pred_base = (s1[c] * c1 + s2[c] * c2) >> 8
                err = sample - pred_base
                code = int(round(err / deltas[c]))
                code = max(-8, min(7, code))
                nib = code + 16 if code < 0 else code
                new_s1, new_delta = _ms_step(s1[c], s2[c], c1, c2, deltas[c], nib)
                s2[c], s1[c], deltas[c] = s1[c], new_s1, new_delta
                nibs.append(nib)
        if len(nibs) % 2:
            nibs.append(0)
        for j in range(0, len(nibs), 2):
            data.append((nibs[j] << 4) | nibs[j + 1])  # HIGH nibble first
    coefs = b"".join(
        struct.pack("<hh", a, b) for a, b in zip(_MS_COEF1, _MS_COEF2)
    )
    fmt = (
        struct.pack(
            "<HHIIHHHHH",
            0x02,
            ch,
            sample_rate,
            sample_rate * block_align // spb,
            block_align,
            4,
            4 + len(coefs),  # cbSize
            spb,
            7,  # wNumCoef
        )
        + coefs
    )
    fact = struct.pack("<I", n)
    return (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(fact) + 8 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"fact"
        + struct.pack("<I", len(fact))
        + fact
        + b"data"
        + struct.pack("<I", len(data))
        + bytes(data)
    )


#: G.711 (round 11): 8-bit logarithmic companding, the telephony codec
#: WAVE carries as format tags 6 (A-law) and 7 (mu-law).  Both kernels
#: are the classic public-domain CCITT reference recurrences (Sun
#: g711.c lineage), vectorized: mu-law biases by 0x84 and encodes
#: sign/3-bit exponent/4-bit mantissa ones-complemented; A-law works in
#: the 13-bit domain with the 0x55 toggle.  Each decoded value is its
#: quantization cell's reconstruction point, so compress(expand(code))
#: == code for every code except mu-law 0x7F (negative zero: 0x7F and
#: 0xFF both decode to 0, which re-encodes to +0 = 0xFF — inherent to
#: the format, same in the CCITT reference) — the exhaustive test pins
#: that plus the full-int16-domain error ceilings (mu 644 at the clip,
#: A 512).

_G711_BIAS = 0x84


def _ulaw_compress(x) -> "np.ndarray":
    """int16 linear -> mu-law codes (uint8), vectorized."""
    import numpy as np

    x = np.asarray(x, np.int32)
    sign = (x < 0).astype(np.int32)
    mag = np.minimum(np.abs(x), 32635) + _G711_BIAS
    # mag in [132, 32767]: frexp exponent is exact for ints in float64
    exp = np.frexp(mag.astype(np.float64))[1].astype(np.int32) - 8
    mant = (mag >> (exp + 3)) & 0x0F
    return (~((sign << 7) | (exp << 4) | mant) & 0xFF).astype(np.uint8)


def _ulaw_expand(codes) -> "np.ndarray":
    """mu-law codes (uint8) -> int16 linear, vectorized."""
    import numpy as np

    u = ~np.asarray(codes, np.uint8).astype(np.int32) & 0xFF
    mag = ((((u & 0x0F) << 3) + _G711_BIAS) << ((u >> 4) & 7)) - _G711_BIAS
    return np.where(u & 0x80, -mag, mag).astype(np.int16)


def _alaw_compress(x) -> "np.ndarray":
    """int16 linear -> A-law codes (uint8), vectorized."""
    import numpy as np

    x = np.asarray(x, np.int32)
    pcm = x >> 3  # 13-bit domain (arithmetic shift keeps the sign)
    mask = np.where(pcm >= 0, 0xD5, 0x55)
    pcm = np.where(pcm >= 0, pcm, -pcm - 1)
    pcm = np.minimum(pcm, 0x0FFF)
    # segment = how many of [0x1F,0x3F,...,0x7FF] the value exceeds
    exp = np.frexp(np.maximum(pcm, 0x1F).astype(np.float64))[1].astype(
        np.int32
    ) - 5  # 0 for <=0x1F .. 7 for <=0xFFF
    mant = np.where(exp < 2, (pcm >> 1) & 0x0F, (pcm >> exp) & 0x0F)
    return (((exp << 4) | mant) ^ mask).astype(np.uint8)


def _alaw_expand(codes) -> "np.ndarray":
    """A-law codes (uint8) -> int16 linear, vectorized."""
    import numpy as np

    a = np.asarray(codes, np.uint8).astype(np.int32) ^ 0x55
    mant = (a & 0x0F) << 4
    exp = (a >> 4) & 7
    t = np.where(
        exp == 0,
        mant + 8,
        (mant + 0x108) << np.maximum(exp - 1, 0),
    )
    return np.where(a & 0x80, t, -t).astype(np.int16)


def _encode_wav_g711(samples, sample_rate: int, law: str) -> bytes:
    """Shared G.711 WAV writer: compand int16 frames (mono (n,) or
    (n, ch)) to 8-bit codes and frame them as RIFF/WAVE with the spec's
    non-PCM fact chunk (wFormatTag 6 = A-law, 7 = mu-law, 8 bits,
    block align = n_channels, cbSize = 0 extension present as real
    telephony writers emit)."""
    import struct

    import numpy as np

    s = np.asarray(samples, np.int16)
    if s.ndim == 1:
        s = s[:, None]
    if s.ndim != 2 or s.shape[0] == 0:
        raise ValueError("encode_wav_g711: expected (n,) or (n, ch) int16")
    n, ch = s.shape
    tag, kern = (6, _alaw_compress) if law == "alaw" else (7, _ulaw_compress)
    codes = kern(s.reshape(-1)).tobytes()
    # RIFF word alignment (review finding, round 11): an odd data chunk
    # takes a pad byte NOT counted in its size field but counted in the
    # RIFF size — 8-bit G.711 is the one WAV form here that can be odd
    pad = b"\x00" if len(codes) & 1 else b""
    fmt = struct.pack(
        "<HHIIHHH", tag, ch, sample_rate, sample_rate * ch, ch, 8, 0
    )
    fact = struct.pack("<I", n)
    return (
        b"RIFF"
        + struct.pack(
            "<I",
            4 + 8 + len(fmt) + 8 + len(fact) + 8 + len(codes) + len(pad),
        )
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"fact"
        + struct.pack("<I", len(fact))
        + fact
        + b"data"
        + struct.pack("<I", len(codes))
        + codes
        + pad
    )


def encode_wav_ulaw(samples, sample_rate: int = 8000) -> bytes:
    """Encode int16 PCM as a G.711 mu-law RIFF/WAVE stream (format 7)."""
    return _encode_wav_g711(samples, sample_rate, "ulaw")


def encode_wav_alaw(samples, sample_rate: int = 8000) -> bytes:
    """Encode int16 PCM as a G.711 A-law RIFF/WAVE stream (format 6)."""
    return _encode_wav_g711(samples, sample_rate, "alaw")


#: 'MJPG' as the little-endian fourcc biCompression carries.
_MJPG_FOURCC = 0x47504A4D


def encode_avi(frames, fps: int = 10, codec: str = "DIB") -> bytes:
    """Encode (n, h, w, 3) uint8 RGB frames as a REAL AVI container
    (round 11; video was the one fully-stubbed modality): RIFF 'AVI '
    with the canonical hdrl (avih + one 'vids' strl), a movi LIST of
    frame chunks, and the idx1 index.  Two codecs:

    - ``codec="DIB"`` (default): handler 'DIB ' = uncompressed
      device-independent bitmaps — each '00db' chunk a bottom-up BGR
      DIB with 4-byte-padded rows, exactly BMP's pixel array.
    - ``codec="MJPG"`` (round 11): Motion-JPEG — each '00dc' chunk is
      a COMPLETE baseline JPEG from this container's own encoder
      (:func:`encode_jpeg`, 4:4:4 with tables in-stream, so any spec
      player decodes it), biCompression = 'MJPG'.  This closes the
      codec'd-video seam for the one codec whose per-frame entropy
      layer the container genuinely owns; inter-frame codecs
      (H.264/VP9/...) remain the declared seam in :func:`decode_avi`.

    Real players open both layouts."""
    import struct

    import numpy as np

    fr = np.asarray(frames, dtype=np.uint8)
    if fr.ndim != 4 or fr.shape[3] != 3 or fr.shape[0] == 0:
        raise ValueError("encode_avi: expected (n, h, w, 3) uint8 frames")
    if codec not in ("DIB", "MJPG"):
        raise ValueError(f"encode_avi: unsupported codec {codec!r}")
    if fps <= 0:
        raise ValueError("encode_avi: fps must be positive")
    n, h, w, _ = fr.shape
    stride = ((3 * w + 3) // 4) * 4
    pad = stride - 3 * w

    def dib(img):
        bgr = img[::-1, :, ::-1]  # bottom-up, BGR
        rows = bgr.reshape(h, 3 * w)
        if pad:
            rows = np.concatenate(
                [rows, np.zeros((h, pad), np.uint8)], axis=1
            )
        return rows.tobytes()

    if codec == "DIB":
        cid_frame, handler, compression = b"00db", b"DIB ", 0
        payloads = [dib(fr[i]) for i in range(n)]
    else:
        cid_frame, handler, compression = b"00dc", b"MJPG", _MJPG_FOURCC
        payloads = [encode_jpeg(fr[i]) for i in range(n)]
    frame_bytes = max(len(p) for p in payloads)

    def chunk(cid, data):
        return cid + struct.pack("<I", len(data)) + data + (b"\x00" * (len(data) & 1))

    def lst(kind, payload):
        return b"LIST" + struct.pack("<I", 4 + len(payload)) + kind + payload

    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        1_000_000 // fps,  # microseconds per frame
        frame_bytes * fps,  # max bytes/sec
        0,  # padding granularity
        0x10,  # AVIF_HASINDEX
        n, 0, 1, frame_bytes,  # total frames, initial, streams, buf size
        w, h, 0, 0, 0, 0,
    )
    strh = (
        b"vids"
        + handler
        + struct.pack("<IHHIIIIIIIII", 0, 0, 0, 0, 1, fps, 0, n, frame_bytes, 0, 0xFFFFFFFF, 0)
        + struct.pack("<hhhh", 0, 0, w, h)  # rcFrame
    )
    strf = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, compression, frame_bytes, 0, 0, 0, 0
    )
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi_payload = b""
    idx = b""
    for p in payloads:
        # idx1 offsets are relative to the 'movi' fourcc position
        idx += cid_frame + struct.pack("<III", 0x10, 4 + len(movi_payload), len(p))
        movi_payload += chunk(cid_frame, p)
    movi = lst(b"movi", movi_payload)
    body = hdrl + movi + chunk(b"idx1", idx)
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"AVI " + body


def decode_avi(blob: bytes) -> dict:
    """Decode an uncompressed-DIB or Motion-JPEG AVI (the
    :func:`encode_avi` subsets, and any player-produced BI_RGB 24-bit
    or MJPG file whose frames carry their own tables): RIFF walk into
    hdrl (avih + first 'vids' stream's strh/strf) and movi
    ('00db'/'00dc' chunks, nested 'rec ' LISTs included).  DIB frames
    un-pack from the bottom-up padded BGR rows; MJPG frames (round 11)
    route through this container's own :func:`decode_jpeg` (grayscale
    scans replicate to 3 channels; every frame must match the avih
    geometry).  Other compressed streams — an unknown handler or
    biCompression — raise the honest NotImplementedError (inter-frame
    codecs need libs this container does not ship); structural damage
    raises ValueError.  Returns {width, height, n_frames, fps, frames}
    with frames (n, h, w, 3) uint8."""
    import struct

    import numpy as np

    if blob[:4] != b"RIFF" or blob[8:12] != b"AVI ":
        raise ValueError("decode_avi: not a RIFF/AVI stream")
    w = h = None
    fps = None
    compression = handler = None
    frames_raw: list[bytes] = []

    # fccType of the most recent strh seen — a strl's strf belongs to
    # THAT stream, so an 'auds' strl listed before the video one must
    # not have its WAVEFORMAT blob parsed as a BITMAPINFOHEADER
    # (review finding, round 11)
    last_strh_type = None

    def walk(lo: int, hi: int, ctx: bytes) -> None:
        nonlocal w, h, fps, compression, handler, last_strh_type
        pos = lo
        while pos + 8 <= hi:
            cid = blob[pos : pos + 4]
            (ln,) = struct.unpack_from("<I", blob, pos + 4)
            if pos + 8 + ln > hi:
                raise ValueError("decode_avi: truncated chunk")
            if cid == b"LIST":
                kind = blob[pos + 8 : pos + 12]
                walk(pos + 12, pos + 8 + ln, kind)
            elif cid == b"avih" and ln >= 40:
                usec, _mb, _pg, _fl, _tf, _if, _ns, _bs, aw, ah = (
                    struct.unpack_from("<IIIIIIIIII", blob, pos + 8)
                )
                w, h = aw, ah
                if usec:
                    fps = round(1_000_000 / usec)
            elif cid == b"strh":
                # fccType needs only 4 bytes — track it for ANY strh so
                # a short non-video strh can't leave a stale 'vids'
                # classification on its strl's strf (review finding);
                # a degenerate <4-byte strh CLEARS it for the same
                # reason (review finding, round 12)
                last_strh_type = blob[pos + 8 : pos + 12] if ln >= 4 else None
                if last_strh_type == b"vids" and ln >= 48 and handler is None:
                    handler = blob[pos + 12 : pos + 16]
            elif (
                cid == b"strf"
                and ctx == b"strl"
                and last_strh_type == b"vids"
                and ln >= 40
                and compression is None
            ):
                _sz, bw, bh, _pl, bits, comp = struct.unpack_from(
                    "<IiiHHI", blob, pos + 8
                )
                compression = comp
                if comp == 0 and bits != 24:
                    raise NotImplementedError(
                        f"decode_avi: only 24-bit DIB frames ({bits}-bit)"
                    )
            elif cid in (b"00db", b"00dc") and ctx in (b"movi", b"rec "):
                frames_raw.append(blob[pos + 8 : pos + 8 + ln])
            pos += 8 + ln + (ln & 1)

    walk(12, len(blob), b"AVI ")
    if w is None or h is None:
        raise ValueError("decode_avi: missing avih header")
    if handler == b"MJPG" or compression == _MJPG_FOURCC:
        out = []
        for raw in frames_raw:
            px = decode_jpeg(bytes(raw))
            if px.ndim == 2:
                px = np.repeat(px[:, :, None], 3, axis=2)
            if px.shape[:2] != (h, w):
                raise ValueError(
                    f"decode_avi: MJPG frame geometry {px.shape[:2]} != "
                    f"avih ({h}, {w})"
                )
            out.append(px)
        return {
            "width": w,
            "height": h,
            "n_frames": len(out),
            "fps": fps,
            "frames": np.stack(out) if out else np.zeros((0, h, w, 3), np.uint8),
        }
    if handler not in (None, b"DIB ", b"\x00\x00\x00\x00") or (
        compression not in (None, 0)
    ):
        raise NotImplementedError(
            f"decode_avi: compressed video stream (handler={handler!r}, "
            f"biCompression={compression}) — inter-frame codec'd video "
            "needs libs this container does not ship"
        )
    stride = ((3 * w + 3) // 4) * 4
    out = []
    for raw in frames_raw:
        if len(raw) != stride * h:
            raise ValueError("decode_avi: frame size mismatch")
        rows = np.frombuffer(raw, np.uint8).reshape(h, stride)[:, : 3 * w]
        out.append(rows.reshape(h, w, 3)[::-1, :, ::-1])  # top-down, RGB
    return {
        "width": w,
        "height": h,
        "n_frames": len(out),
        "fps": fps,
        "frames": np.stack(out) if out else np.zeros((0, h, w, 3), np.uint8),
    }


def encode_tiff(img, compression: str = "none", predictor: bool = False) -> bytes:
    """Encode an HxWx3 uint8 RGB (or HxW grayscale) array as a REAL
    baseline TIFF 6.0 (round 11): little-endian header, one IFD with
    the baseline tags a reader needs (ImageWidth/Length, BitsPerSample,
    Compression, Photometric, StripOffsets, SamplesPerPixel,
    RowsPerStrip, StripByteCounts, PlanarConfig=1 chunky, plus
    Predictor when requested — 10 or 11 tags), pixel data in a single
    strip.  ``compression``: "none" (1), "packbits" (32773, Apple
    RLE), "lzw" (5, the spec's MSB-first 9->12-bit variable width
    codes), "deflate" (8, zlib) or "jpeg" (7, one complete
    tables-in-stream JPEG — the one LOSSY mode).  ``predictor=True``
    stores horizontal differences (tag 317 = 2, invalid with jpeg).
    Real viewers open these files; :func:`decode_tiff` reads this
    subset plus big-endian, multi-strip, tiled, planar-2 and
    WhiteIsZero layouts it never emits."""
    import struct

    import numpy as np

    img = np.asarray(img, np.uint8)
    gray = img.ndim == 2
    if not gray and (img.ndim != 3 or img.shape[2] != 3):
        raise ValueError("encode_tiff: expected HxW gray or HxWx3 RGB")
    h, w = img.shape[:2]
    if h == 0 or w == 0:  # decode_tiff rejects zero-area images too
        raise ValueError("encode_tiff: zero-area image")
    spp = 1 if gray else 3
    if predictor:
        # horizontal differencing (tag 317 = 2): store each sample as
        # the delta from its left neighbor mod 256 — the layout real
        # LZW/Deflate writers use because deltas compress better
        p3 = img if not gray else img[:, :, None]
        diffed = np.concatenate(
            [
                p3[:, :1],
                (
                    p3[:, 1:].astype(np.int16) - p3[:, :-1].astype(np.int16)
                ).astype(np.uint8),
            ],
            axis=1,
        )
        raw = diffed.tobytes()
    else:
        raw = img.tobytes()
    if compression == "none":
        comp_tag, data = 1, raw
    elif compression == "packbits":
        comp_tag, data = 32773, _packbits_encode(raw)
    elif compression == "lzw":
        comp_tag, data = 5, _tiff_lzw_encode(raw)
    elif compression == "deflate":
        import zlib

        comp_tag, data = 8, zlib.compress(raw, 6)
    elif compression == "jpeg":
        # new-style JPEG-in-TIFF: one strip holding a complete JPEG
        # stream from this container's own encoder (tables in-stream,
        # so no JPEGTables tag needed); lossy, unlike the other modes
        if predictor:
            raise ValueError("encode_tiff: predictor is not valid with jpeg")
        comp_tag, data = 7, encode_jpeg(img)
    else:
        raise ValueError(f"encode_tiff: unknown compression {compression!r}")
    n_tags = 11 if predictor else 10
    ifd_off = 8
    # BitsPerSample for RGB needs 3 SHORTs = 6 bytes -> stored off-IFD
    bps_off = ifd_off + 2 + 12 * n_tags + 4
    strip_off = bps_off + (6 if spp == 3 else 0)

    def tag(t, typ, cnt, val):
        return struct.pack("<HHI4s", t, typ, cnt, val)

    def short_v(v):
        return struct.pack("<HH", v, 0)

    def long_v(v):
        return struct.pack("<I", v)

    tags = b"".join(
        [
            tag(256, 4, 1, long_v(w)),
            tag(257, 4, 1, long_v(h)),
            (
                tag(258, 3, 3, long_v(bps_off))
                if spp == 3
                else tag(258, 3, 1, short_v(8))
            ),
            tag(259, 3, 1, short_v(comp_tag)),
            tag(262, 3, 1, short_v(2 if spp == 3 else 1)),  # RGB / BlackIsZero
            tag(273, 4, 1, long_v(strip_off)),
            tag(277, 3, 1, short_v(spp)),
            tag(278, 4, 1, long_v(h)),  # one strip holds every row
            tag(279, 4, 1, long_v(len(data))),
            tag(284, 3, 1, short_v(1)),  # chunky
        ]
        + ([tag(317, 3, 1, short_v(2))] if predictor else [])
    )
    out = (
        b"II*\x00" + struct.pack("<I", ifd_off)
        + struct.pack("<H", n_tags) + tags + struct.pack("<I", 0)
    )
    if spp == 3:
        out += struct.pack("<HHH", 8, 8, 8)
    return out + data


def _packbits_decode(data: bytes, expect: int) -> bytes:
    """Apple PackBits (TIFF compression 32773, round 11): n in 0..127
    copies n+1 literal bytes, n in -127..-1 repeats the next byte 1-n
    times, -128 is a no-op.  Decodes exactly ``expect`` bytes or raises
    ValueError."""
    out = bytearray()
    i, n_data = 0, len(data)
    while i < n_data and len(out) < expect:
        n = data[i] - 256 if data[i] > 127 else data[i]
        i += 1
        if n == -128:
            continue
        if n >= 0:
            if i + n + 1 > n_data:
                raise ValueError("packbits: truncated literal run")
            out += data[i : i + n + 1]
            i += n + 1
        else:
            if i >= n_data:
                raise ValueError("packbits: truncated repeat run")
            out += bytes([data[i]]) * (1 - n)
            i += 1
    if len(out) != expect:
        raise ValueError(
            f"packbits: decoded {len(out)} bytes, expected {expect}"
        )
    return bytes(out)


def _packbits_encode(data: bytes) -> bytes:
    """PackBits encoder (for round-trip testing and strip writing):
    greedy — runs of >= 2 identical bytes become repeat packets (max
    128), everything else literal packets (max 128)."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        run = 1
        while i + run < n and run < 128 and data[i + run] == data[i]:
            run += 1
        if run >= 2:
            out += bytes([(1 - run) & 0xFF, data[i]])
            i += run
            continue
        lit = i
        while (
            i < n
            and i - lit < 128
            and not (i + 1 < n and data[i + 1] == data[i])
        ):
            i += 1
        out += bytes([i - lit - 1]) + data[lit:i]
    return bytes(out)


def _tiff_lzw_decode(data: bytes, expect: int) -> bytes:
    """TIFF LZW (compression 5, round 11): MSB-first variable-width
    codes 9->12 bits with ClearCode 256 / EOI 257; the code width
    bumps when the decoder's table reaches 511/1023/2047 entries (the
    libtiff decoder's `free_entp > maxcodep` rule).  The second
    hand-rolled LZW in this container; GIF's is LSB-first with a
    different change rule, so the two share nothing but the idea."""
    out = bytearray()
    table: list[bytes] = []

    def reset():
        nonlocal table, width
        table = [bytes([i]) for i in range(256)] + [b"", b""]
        width = 9

    width = 9
    reset()
    acc = nbits = 0
    prev = None
    for byte in data:
        acc = (acc << 8) | byte
        nbits += 8
        while nbits >= width:
            code = (acc >> (nbits - width)) & ((1 << width) - 1)
            nbits -= width
            if code == 256:  # ClearCode
                reset()
                prev = None
                continue
            if code == 257:  # EndOfInformation
                if len(out) != expect:
                    raise ValueError(
                        f"tiff-lzw: decoded {len(out)} bytes, "
                        f"expected {expect}"
                    )
                return bytes(out)
            if prev is None:
                if code >= len(table):
                    raise ValueError("tiff-lzw: bad first code")
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            elif code == len(table):  # KwKwK
                entry = prev + prev[:1]
                table.append(entry)
            else:
                raise ValueError("tiff-lzw: code out of range")
            if len(table) > 4095:  # writers must clear before this
                raise ValueError("tiff-lzw: table overflow without clear")
            out += entry
            prev = entry
            # early change: width grows when the NEXT code could
            # overflow, one entry before the table actually fills
            if len(table) + 1 >= (1 << width) and width < 12:
                width += 1
            if len(out) > expect:
                raise ValueError("tiff-lzw: output exceeds strip size")
    raise ValueError("tiff-lzw: missing EndOfInformation")


def _tiff_lzw_encode(data: bytes) -> bytes:
    """TIFF LZW encoder — the exact inverse of :func:`_tiff_lzw_decode`.
    Code widths are driven by SIMULATING the decoder's table growth
    (its add for each emitted data code after a clear's first happens
    one code later than the encoder's own dictionary insert), so the
    two state machines can never disagree at a width boundary."""
    out = bytearray()
    acc = nbits = 0

    def emit(code):
        nonlocal acc, nbits
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            out.append((acc >> (nbits - 8)) & 0xFF)
            nbits -= 8

    def emit_data(code):
        # emit at the decoder's CURRENT width, then advance the
        # simulated decoder: every data code after the first since a
        # clear triggers one table add, and the decoder bumps its read
        # width when that table reaches 2^width - 1 entries
        nonlocal sim_size, width, first_since_clear
        emit(code)
        if first_since_clear:
            first_since_clear = False
        else:
            sim_size += 1
            if sim_size + 1 >= (1 << width) and width < 12:
                width += 1

    table = {bytes([i]): i for i in range(256)}
    next_code = 258
    width = 9
    sim_size = 258
    first_since_clear = True
    emit(256)  # spec: streams begin with a ClearCode
    cur = b""
    for b in data:
        cand = cur + bytes([b])
        if cand in table:
            cur = cand
            continue
        emit_data(table[cur])
        table[cand] = next_code
        next_code += 1
        if next_code >= 4094:  # table nearly full: reset per spec
            emit(256)
            table = {bytes([i]): i for i in range(256)}
            next_code = 258
            width = 9
            sim_size = 258
            first_since_clear = True
        cur = bytes([b])
    if cur:
        emit_data(table[cur])
    emit(257)  # EndOfInformation
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def decode_tiff(blob: bytes):
    """Decode a baseline TIFF 6.0 into an HxWx3 uint8 RGB array
    (round 11): both byte orders (II/MM), any strip layout
    (RowsPerStrip + StripOffsets/ByteCounts), 8-bit grayscale in either
    photometric polarity (WhiteIsZero inverts per spec) and 8-bit chunky
    RGB, uncompressed or per-strip LZW (5) / PackBits (32773)
    decompressed; grayscale replicates to 3 channels for the uniform
    pixel contract.  The horizontal-differencing predictor (tag 317 =
    2, the layout real LZW/Deflate writers use) is reconstructed by
    row-wise cumulative sum; an unknown predictor is REFUSED rather
    than silently ignored.  New-style JPEG-in-TIFF (7) routes each
    strip through this container's own JPEG decoder; planar
    configuration 2 (separate planes) assembles per-plane strips, and
    TILED layouts (322-325, 16-multiple tiles, edge padding, per-tile
    predictor reset) assemble in every non-JPEG compression.
    CCITT/old-style JPEG/abbreviated JPEGTables streams, tiled JPEG,
    and non-8-bit depths raise the honest NotImplementedError;
    structural damage raises ValueError."""
    import struct

    import numpy as np

    if blob[:4] == b"II*\x00":
        en = "<"
    elif blob[:4] == b"MM\x00*":
        en = ">"
    else:
        raise ValueError("decode_tiff: not a TIFF stream")
    if len(blob) < 8:
        raise ValueError("decode_tiff: truncated header")
    (ifd,) = struct.unpack_from(en + "I", blob, 4)
    if ifd + 2 > len(blob):
        raise ValueError("decode_tiff: truncated IFD")
    (n_tags,) = struct.unpack_from(en + "H", blob, ifd)
    if ifd + 2 + 12 * n_tags + 4 > len(blob):
        raise ValueError("decode_tiff: truncated IFD entries")

    type_size = {1: 1, 3: 2, 4: 4}

    def read_values(typ, cnt, raw_off):
        if typ not in type_size:
            raise NotImplementedError(f"decode_tiff: field type {typ}")
        if cnt == 0:  # fuzz finding: a zero-count field has no values
            raise ValueError("decode_tiff: empty field")
        total = type_size[typ] * cnt
        off = raw_off if total <= 4 else struct.unpack_from(
            en + "I", blob, raw_off
        )[0]
        if off + total > len(blob):
            raise ValueError("decode_tiff: field data out of bounds")
        fmt = {1: "B", 3: "H", 4: "I"}[typ]
        return list(struct.unpack_from(en + str(cnt) + fmt, blob, off))

    fields = {}
    for i in range(n_tags):
        eoff = ifd + 2 + 12 * i
        t, typ, cnt = struct.unpack_from(en + "HHI", blob, eoff)
        fields[t] = (typ, cnt, eoff + 8)

    def get(t, default=None):
        if t not in fields:
            if default is not None:
                return default
            raise ValueError(f"decode_tiff: missing required tag {t}")
        typ, cnt, raw = fields[t]
        return read_values(typ, cnt, raw)

    w = get(256)[0]
    h = get(257)[0]
    comp = get(259, [1])[0]
    if comp not in (1, 5, 7, 8, 32773, 32946):
        raise NotImplementedError(
            f"decode_tiff: only uncompressed (1), LZW (5), JPEG (7), "
            f"Deflate (8/32946) and PackBits (32773) supported, "
            f"got {comp}"
        )
    if comp == 7:  # new-style JPEG-in-TIFF (round 11): each strip is a
        # complete JPEG stream this container's own decoder reads —
        # the composition MJPEG-in-AVI already proved.  Abbreviated
        # streams (shared JPEGTables, tag 347) stay the seam.
        if 347 in fields:
            raise NotImplementedError(
                "decode_tiff: abbreviated JPEG streams (JPEGTables)"
            )
        if 322 in fields or 324 in fields:
            raise NotImplementedError("decode_tiff: tiled JPEG strips")
        if w <= 0 or h <= 0:
            raise ValueError("decode_tiff: bad dimensions")
        # the JPEG stream defines its own colorspace; photometric 0
        # (WhiteIsZero) still demands the spec inversion, and an
        # unknown photometric is refused, not silently accepted
        # (review finding — matches the non-JPEG paths)
        photo_j = get(262, [6])[0]
        if photo_j not in (0, 1, 2, 6):
            raise NotImplementedError(
                f"decode_tiff: photometric {photo_j} with JPEG"
            )
        offs_j = get(273)
        counts_j = get(279)
        if len(offs_j) != len(counts_j):
            raise ValueError("decode_tiff: strip offset/count mismatch")
        parts = []
        rows_seen = 0
        for o, c in zip(offs_j, counts_j):
            if o + c > len(blob):
                raise ValueError("decode_tiff: strip out of bounds")
            px_j = decode_jpeg(blob[o : o + c])
            if px_j.ndim == 2:
                px_j = np.repeat(px_j[:, :, None], 3, axis=2)
            if px_j.shape[1] != w:
                raise ValueError(
                    f"decode_tiff: JPEG strip width {px_j.shape[1]} != {w}"
                )
            parts.append(px_j)
            rows_seen += px_j.shape[0]
        if rows_seen != h:
            raise ValueError(
                f"decode_tiff: JPEG strips cover {rows_seen} rows, "
                f"expected {h}"
            )
        px_all = np.concatenate(parts, axis=0)
        if photo_j == 0:
            px_all = (255 - px_all.astype(np.int32)).astype(np.uint8)
        return np.ascontiguousarray(px_all)
    photo = get(262)[0]
    spp = get(277, [1])[0]
    planar = get(284, [1])[0]
    if planar not in (1, 2):
        raise ValueError(f"decode_tiff: bad planar configuration {planar}")
    bps = get(258, [8])
    if len(bps) not in (1, spp):  # structural damage, not a seam
        raise ValueError(
            f"decode_tiff: BitsPerSample count {len(bps)} != "
            f"SamplesPerPixel {spp}"
        )
    if any(b != 8 for b in bps):
        raise NotImplementedError(
            f"decode_tiff: only 8-bit samples supported ({bps})"
        )
    if (photo in (0, 1) and spp != 1) or (photo == 2 and spp != 3):
        raise ValueError(
            f"decode_tiff: photometric {photo} with {spp} samples"
        )
    if photo not in (0, 1, 2):
        raise NotImplementedError(f"decode_tiff: photometric {photo}")
    if w <= 0 or h <= 0:
        raise ValueError("decode_tiff: bad dimensions")
    if w * h * spp > 1 << 30:
        # review finding: header-declared dimensions drive allocations
        # (the tiled path's output buffer in particular), so absurd
        # headers must fail loudly, not as a multi-GiB MemoryError
        raise ValueError(
            f"decode_tiff: declared image size {w}x{h}x{spp} exceeds "
            f"the 1 GiB decode ceiling"
        )
    pred = get(317, [1])[0]
    if pred not in (1, 2):
        raise NotImplementedError(
            f"decode_tiff: predictor {pred} (only none/horizontal)"
        )

    def read_strip(o, c, expect):
        if o + c > len(blob):
            raise ValueError("decode_tiff: strip out of bounds")
        raw = blob[o : o + c]
        if comp == 1:  # review finding: short/oversized uncompressed
            # strips must fail structurally, not as a numpy reshape
            if len(raw) != expect:
                raise ValueError(
                    f"decode_tiff: strip {len(raw)} bytes, "
                    f"expected {expect}"
                )
        elif comp == 32773:
            raw = _packbits_decode(raw, expect)
        elif comp == 5:
            raw = _tiff_lzw_decode(raw, expect)
        elif comp in (8, 32946):  # Adobe/legacy Deflate: zlib streams
            import zlib

            # review finding (round 12): decompress BOUNDED by the
            # strip's declared size — an unbounded zlib.decompress lets
            # a tiny crafted strip allocate far past the 1 GiB header
            # ceiling (a classic deflate bomb).  Asking for expect+1
            # bytes detects overflow without materializing it, and a
            # non-empty unconsumed tail is the same structural lie.
            d = zlib.decompressobj()
            try:
                raw = d.decompress(raw, expect + 1)
            except zlib.error as e:
                raise ValueError(f"decode_tiff: bad deflate strip ({e})")
            # interop concession (review finding, round 12): some writers
            # pad an odd-length strip to an even StripByteCount and count
            # the pad — libtiff inflates `expect` bytes and ignores the
            # tail, so a single zero byte after the stream is tolerated;
            # anything else after the stream is a structural lie
            pad_ok = d.unused_data in (b"", b"\x00")
            if len(raw) != expect or d.unconsumed_tail or not pad_ok:
                raise ValueError(
                    f"decode_tiff: deflate strip {len(raw)} bytes "
                    f"(tail={len(d.unconsumed_tail) + len(d.unused_data)}),"
                    f" expected {expect}"
                )
        return raw

    if 322 in fields or 324 in fields:
        # tiled layout (round 11): fixed-size tiles, multiples of 16,
        # padded at the right/bottom edges, row-major over the tile
        # grid (plane-major under planar 2).  The predictor applies
        # WITHIN each tile (its left column is stored literally), so it
        # is undone per tile before edge-cropping into the image.
        tw = get(322)[0]
        th = get(323)[0]
        if tw <= 0 or th <= 0 or tw % 16 or th % 16:
            raise ValueError(f"decode_tiff: bad tile geometry {tw}x{th}")
        toffs = get(324)
        tcounts = get(325)
        if len(toffs) != len(tcounts):
            raise ValueError("decode_tiff: tile offset/count mismatch")
        across = (w + tw - 1) // tw
        down = (h + th - 1) // th
        n_planes = spp if (planar == 2 and spp > 1) else 1
        tile_spp = 1 if n_planes > 1 else spp
        if len(toffs) != across * down * n_planes:
            raise ValueError(
                f"decode_tiff: expected {across * down * n_planes} "
                f"tiles, got {len(toffs)}"
            )
        px = np.zeros((h, w, spp), np.uint8)
        for p in range(n_planes):
            for ty in range(down):
                for tx in range(across):
                    idx = (p * down + ty) * across + tx
                    raw = read_strip(
                        toffs[idx], tcounts[idx], tw * th * tile_spp
                    )
                    tile = np.frombuffer(raw, np.uint8).reshape(
                        th, tw, tile_spp
                    )
                    if pred == 2:
                        tile = np.cumsum(
                            tile, axis=1, dtype=np.uint32
                        ).astype(np.uint8)
                    ch = min(th, h - ty * th)
                    cw = min(tw, w - tx * tw)
                    if n_planes > 1:
                        px[
                            ty * th : ty * th + ch,
                            tx * tw : tx * tw + cw,
                            p,
                        ] = tile[:ch, :cw, 0]
                    else:
                        px[
                            ty * th : ty * th + ch, tx * tw : tx * tw + cw
                        ] = tile[:ch, :cw]
        if photo == 0:
            px = (255 - px.astype(np.int32)).astype(np.uint8)
        if spp == 1:
            px = np.repeat(px, 3, axis=2)
        return np.ascontiguousarray(px)

    offs = get(273)
    counts = get(279)
    if len(offs) != len(counts):
        raise ValueError("decode_tiff: strip offset/count mismatch")
    rps = get(278, [h])[0]
    if rps <= 0:
        raise ValueError("decode_tiff: bad RowsPerStrip")
    if planar == 2 and spp > 1:
        # separate planes (round 11): all of channel 0's strips, then
        # channel 1's, ... — per-strip sizes carry ONE sample per pixel
        spi = (h + rps - 1) // rps
        if len(offs) != spi * spp:
            raise ValueError(
                f"decode_tiff: planar-2 expects {spi * spp} strips, "
                f"got {len(offs)}"
            )
        planes = []
        for p in range(spp):
            rows_left, parts = h, []
            for s in range(spi):
                strip_rows = min(rps, rows_left)
                rows_left -= strip_rows
                parts.append(
                    read_strip(
                        offs[p * spi + s],
                        counts[p * spi + s],
                        strip_rows * w,
                    )
                )
            plane = b"".join(parts)
            if len(plane) != w * h:
                raise ValueError("decode_tiff: plane size mismatch")
            planes.append(np.frombuffer(plane, np.uint8).reshape(h, w))
        px = np.stack(planes, axis=2)
    else:
        chunks = []
        rows_left = h
        for o, c in zip(offs, counts):
            strip_rows = min(rps, rows_left)
            rows_left -= strip_rows
            chunks.append(read_strip(o, c, strip_rows * w * spp))
        data = b"".join(chunks)
        if len(data) != w * h * spp:
            raise ValueError("decode_tiff: pixel data size mismatch")
        # .copy(): frombuffer over bytes is read-only, and the RGB path
        # applies no transform — siblings (decode_bmp/ppm/png) all
        # return writable pixels
        px = np.frombuffer(data, np.uint8).reshape(h, w, spp).copy()
    if pred == 2:
        # horizontal differencing (tag 317, common with LZW/Deflate):
        # each stored sample is the delta from its left neighbor in
        # the same channel — reconstruct by cumulative sum mod 256
        # (each row starts literal, so the row-wise cumsum is exact
        # regardless of strip boundaries).  Ignoring this tag would
        # silently emit wrong pixels, so it is either applied or
        # refused, never skipped.
        px = np.cumsum(px, axis=1, dtype=np.uint32).astype(np.uint8)
    if photo == 0:  # WhiteIsZero: invert per spec
        px = (255 - px.astype(np.int32)).astype(np.uint8)
    if spp == 1:
        px = np.repeat(px, 3, axis=2)
    return np.ascontiguousarray(px)


def decode_real(blob: bytes) -> dict:
    """Real decode for the STILL-IMAGE formats a pure-python/numpy codec
    can honestly implement — BMP (24/32-bit + palettized), binary
    PPM/PGM, any spec-valid PNG, baseline/progressive JPEG, GIF, and
    baseline TIFF (uncompressed/LZW/PackBits/Deflate/new-style-JPEG
    strips or tiles, chunky or planar, predictor) — dispatched on
    magic bytes.  Audio routes through :func:`decode_wav` (PCM
    int/float, IMA + MS ADPCM, G.711 mu-law/A-law) and video through
    :func:`decode_avi` (uncompressed-DIB and Motion-JPEG containers);
    arithmetic-coded JPEG, CCITT/old-style-JPEG/JPEGTables TIFF, and
    inter-frame video codecs are the remaining declared seams.
    Returns {width, height, channels, pixels}; pixels is HxWx3 uint8
    RGB (HxWx1 for grayscale JPEG)."""
    if blob[:2] == b"BM":
        px = decode_bmp(blob)
    elif blob[:2] == b"P6":
        # header-only peek: rejecting a 16-bit PPM must not first
        # materialize its whole pixel array (review finding)
        if _ppm_header(blob)[2] > 255:
            # decode_real's contract is uint8 pixels; 16-bit PPMs are
            # decodable but exceed it — call decode_ppm directly
            raise NotImplementedError(
                "decode_real: 16-bit PPM exceeds the uint8 pixel "
                "contract; call decode_ppm directly"
            )
        px = decode_ppm(blob)
    elif blob[:2] == b"P5":  # PGM (round 11): grayscale netpbm
        if _ppm_header(blob, b"P5")[2] > 255:
            raise NotImplementedError(
                "decode_real: 16-bit PGM exceeds the uint8 pixel "
                "contract; call decode_pgm directly"
            )
        import numpy as _np

        px = _np.repeat(decode_pgm(blob)[:, :, None], 3, axis=2)
    elif blob[:8] == _PNG_SIG:
        px = decode_png(blob)
    elif blob[:2] == b"\xff\xd8":
        px = decode_jpeg(blob)
        if px.ndim == 2:
            px = px[:, :, None]
    elif blob[:6] in (b"GIF87a", b"GIF89a"):
        px = decode_gif(blob)["pixels"]
    elif blob[:4] in (b"II*\x00", b"MM\x00*"):
        px = decode_tiff(blob)
    else:
        raise NotImplementedError(
            "real image decode implemented for BMP (24/32-bit + "
            "palettized), PPM/PGM, PNG (all spec depths/interlace), "
            "JPEG (baseline/progressive Huffman), GIF, and baseline "
            "TIFF (5 compressions, strips/tiles, chunky/planar) in "
            "this container; audio decodes via decode_wav (PCM "
            "int/float, IMA/MS ADPCM, G.711) and video via decode_avi "
            "(uncompressed-DIB and Motion-JPEG AVI)"
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
