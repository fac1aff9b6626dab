"""Multimodal columns (north-star): image/audio/video as opaque
``binary`` columns + typed metadata, processed via Arrow-batched
``mapInPandas``.

The decode kernels are REAL for formats decodable in pure numpy —
BMP (24-bit uncompressed) and PPM (binary P6) — covering header
parse, pixel decode, nearest-neighbor resize, per-channel feature
extraction, and frame sampling over a length-prefixed frame
container. Compressed formats (JPEG/PNG/H.264) genuinely need codec
libraries this container doesn't ship; those paths raise
NotImplementedError explicitly (``require_codec``) rather than
pretending.

Batch shape: mapInPandas receives an iterator of Arrow record batches;
kernels stream batch-by-batch (never materialize the iterator) so peak
executor memory is one batch regardless of partition size — the
property that matters at 100 TB. Pixels live only inside the kernel;
what crosses back to the JVM is encoded bytes or scalar features.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("media_type", StringType(), False),  # image|audio|video
        StructField("content", BinaryType(), True),
        StructField("content_length", LongType(), True),
        StructField("source_uri", StringType(), True),
    ]
)

IMAGE_META_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("channels", IntegerType(), True),
        StructField("format", StringType(), True),
    ]
)

# Synthetic header-only layout kept for plumbing tests:
# b"FAKEIMG" + w(2) + h(2) + c(1). Carries no pixels.
_MAGIC = b"FAKEIMG"


def require_codec(fmt: str) -> None:
    """The honest gate for compressed formats: decoding them requires
    a codec library (Pillow / libjpeg / ffmpeg) absent from this
    container."""
    raise NotImplementedError(
        f"decoding {fmt} requires a codec library not present in this "
        "environment; BMP/PPM decode natively"
    )


# ---------------------------------------------------------------------------
# Pure-numpy codecs (BMP 24-bit BI_RGB, binary PPM P6)
# ---------------------------------------------------------------------------


def encode_bmp(arr) -> bytes:
    """(h, w, 3) uint8 RGB -> 24-bit uncompressed BMP bytes."""
    import numpy as np

    a = np.asarray(arr, dtype=np.uint8)
    h, w, c = a.shape
    assert c == 3, "BMP encoder expects RGB"
    row = w * 3
    pad = (-row) % 4
    body = bytearray()
    for y in range(h - 1, -1, -1):  # bottom-up rows, BGR order
        body += a[y, :, ::-1].tobytes() + b"\x00" * pad
    size = 54 + len(body)
    header = struct.pack("<2sIHHI", b"BM", size, 0, 0, 54) + struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0
    )
    return bytes(header + body)


def decode_bmp(b: bytes):
    """BMP bytes -> (h, w, 3) uint8 RGB array (24-bit BI_RGB only)."""
    import numpy as np

    if len(b) < 54 or b[:2] != b"BM":
        raise ValueError("not a BMP")
    offset = struct.unpack_from("<I", b, 10)[0]
    _, w, h, _, bpp, comp = struct.unpack_from("<IiiHHI", b, 14)
    if bpp != 24 or comp != 0:
        require_codec(f"BMP bpp={bpp} compression={comp}")
    flip = h > 0
    h = abs(h)
    row = w * 3
    stride = row + ((-row) % 4)
    px = np.frombuffer(b, np.uint8, count=stride * h, offset=offset)
    px = px.reshape(h, stride)[:, :row].reshape(h, w, 3)[:, :, ::-1]  # BGR->RGB
    return px[::-1] if flip else px


def encode_ppm(arr) -> bytes:
    """(h, w, 3) uint8 RGB -> binary PPM (P6)."""
    import numpy as np

    a = np.asarray(arr, dtype=np.uint8)
    h, w, _ = a.shape
    return f"P6\n{w} {h}\n255\n".encode() + a.tobytes()


def decode_ppm(b: bytes):
    """Binary PPM (P6) bytes -> (h, w, 3) uint8 RGB array."""
    import numpy as np

    if b[:2] != b"P6":
        raise ValueError("not a P6 PPM")
    # header = three whitespace-separated tokens after the magic
    pos, vals = 2, []
    while len(vals) < 3:
        while pos < len(b) and b[pos : pos + 1].isspace():
            pos += 1
        if b[pos : pos + 1] == b"#":  # comment line
            while pos < len(b) and b[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(b) and not b[pos : pos + 1].isspace():
            pos += 1
        vals.append(int(b[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = vals
    if maxval > 255:
        require_codec("16-bit PPM")
    px = np.frombuffer(b, np.uint8, count=w * h * 3, offset=pos)
    return px.reshape(h, w, 3)


# ---------------------------------------------------------------------------
# PNG (8-bit RGB, non-interlaced): zlib inflate + numpy unfiltering —
# the one compressed format reachable with primitives already in the
# container (zlib is stdlib; no Pillow/libpng needed). Palette/alpha/
# 16-bit/Adam7 variants still gate through require_codec.
# ---------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(typ: bytes, data: bytes) -> bytes:
    import zlib

    return (
        struct.pack(">I", len(data))
        + typ
        + data
        + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
    )


def _paeth_predictor(a, b, c):
    """Vectorized PNG Paeth predictor (spec 9.4): nearest of left/up/
    up-left to p = a + b - c, ties broken left, up, up-left."""
    import numpy as np

    p = a + b - c
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    return np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))


def encode_png(arr, filters=None) -> bytes:
    """(h, w, 3) uint8 RGB -> PNG bytes (8-bit truecolor, one IDAT).

    ``filters`` picks the per-scanline filter id (0..4); the default
    cycles 0,1,2,3,4 by row so a decode round-trip exercises every
    unfilter path — deliberate for the q147 oracle, and valid PNG
    (encoders may choose any filter per row)."""
    import numpy as np
    import zlib

    a = np.asarray(arr, dtype=np.uint8)
    h, w, c = a.shape
    assert c == 3, "PNG encoder expects RGB"
    stride = w * 3
    raw = bytearray()
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        cur = a[y].reshape(-1).astype(np.int32)
        ft = (y % 5) if filters is None else int(filters[y])
        left = np.concatenate([np.zeros(3, np.int32), cur[:-3]])
        if ft == 0:
            fr = cur
        elif ft == 1:
            fr = cur - left
        elif ft == 2:
            fr = cur - prev
        elif ft == 3:
            fr = cur - ((left + prev) >> 1)
        elif ft == 4:
            pleft = np.concatenate([np.zeros(3, np.int32), prev[:-3]])
            fr = cur - _paeth_predictor(left, prev, pleft)
        else:
            raise ValueError(f"invalid PNG filter {ft}")
        raw.append(ft)
        raw += (fr & 0xFF).astype(np.uint8).tobytes()
        prev = cur
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _png_chunk(b"IEND", b"")
    )


def decode_png(b: bytes):
    """PNG bytes -> (h, w, 3) uint8 RGB array.

    Supports 8-bit truecolor (color type 2), filter method 0, no
    interlace — CRC-checked chunk walk, zlib inflate, then scanline
    unfiltering: None/Up vectorized directly, Sub via a per-pixel
    cumsum (mod-256 distributes over addition), Average/Paeth with a
    per-pixel loop (serial data dependency on the reconstructed left
    neighbor). Other color types / depths / Adam7 gate through
    ``require_codec``; any structural damage (bad signature, short
    chunk, CRC mismatch, payload size, bad filter id) raises
    ValueError so corrupt files surface as null rows, not task
    failures."""
    import numpy as np
    import zlib

    if b[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos, ihdr, idat = 8, None, bytearray()
    while pos + 12 <= len(b):
        ln, typ = struct.unpack_from(">I4s", b, pos)
        data = b[pos + 8 : pos + 8 + ln]
        if len(data) != ln or pos + 12 + ln > len(b):
            raise ValueError("truncated PNG chunk")
        (crc,) = struct.unpack_from(">I", b, pos + 8 + ln)
        if zlib.crc32(typ + data) & 0xFFFFFFFF != crc:
            raise ValueError("PNG chunk CRC mismatch")
        if typ == b"IHDR":
            ihdr = data
        elif typ == b"IDAT":
            idat += data
        elif typ == b"IEND":
            break
        pos += 12 + ln
    if ihdr is None or len(ihdr) != 13:
        raise ValueError("PNG missing IHDR")
    w, h, depth, color, comp, filt, inter = struct.unpack(">IIBBBBB", ihdr)
    if depth != 8 or color != 2 or comp != 0 or filt != 0 or inter != 0:
        require_codec(
            f"PNG depth={depth} color-type={color} interlace={inter}"
        )
    try:
        raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    except zlib.error as e:
        raise ValueError(f"PNG IDAT inflate failed: {e}") from None
    stride = w * 3
    if raw.size != h * (stride + 1):
        raise ValueError("PNG pixel payload size mismatch")
    recon = np.zeros((h, stride), dtype=np.int32)
    prev = np.zeros(stride, dtype=np.int32)
    pos = 0
    for y in range(h):
        ft = int(raw[pos])
        row = raw[pos + 1 : pos + 1 + stride].astype(np.int32)
        pos += 1 + stride
        if ft == 0:
            cur = row
        elif ft == 1:  # Sub: mod-256 cumsum down the pixel axis
            cur = (
                row.reshape(w, 3).astype(np.int64).cumsum(axis=0) & 0xFF
            ).astype(np.int32).reshape(-1)
        elif ft == 2:
            cur = (row + prev) & 0xFF
        elif ft in (3, 4):
            cur = np.empty(stride, dtype=np.int32)
            left = np.zeros(3, dtype=np.int32)
            pleft = np.zeros(3, dtype=np.int32)
            for x in range(w):
                seg = slice(3 * x, 3 * x + 3)
                pr = (
                    (left + prev[seg]) >> 1
                    if ft == 3
                    else _paeth_predictor(left, prev[seg], pleft)
                )
                cur[seg] = (row[seg] + pr) & 0xFF
                left, pleft = cur[seg], prev[seg]
        else:
            raise ValueError(f"invalid PNG filter {ft}")
        recon[y] = cur
        prev = cur
    return recon.astype(np.uint8).reshape(h, w, 3)


def _decode_any(content) -> tuple:
    """(pixels|None, format|None) for one binary payload."""
    if content is None:
        return None, None
    b = bytes(content)
    try:
        if b[:2] == b"BM":
            return decode_bmp(b), "bmp"
        if b[:2] == b"P6":
            return decode_ppm(b), "ppm"
        if b[:8] == _PNG_SIG:
            return decode_png(b), "png"
    except (ValueError, struct.error, IndexError):
        return None, None
    return None, None


# ---------------------------------------------------------------------------
# Synthetic tables (deterministic pixels, no RNG)
# ---------------------------------------------------------------------------


def make_fake_image_bytes(width: int, height: int, channels: int = 3) -> bytes:
    return _MAGIC + width.to_bytes(2, "big") + height.to_bytes(2, "big") + bytes([channels])


def make_test_pixels(width: int, height: int, seed: int = 0):
    """Deterministic gradient pixels: value = (x + y + seed) mod 256
    per channel offset — cheap, reproducible, resize-checkable."""
    import numpy as np

    y = np.arange(height, dtype=np.int64)[:, None]
    x = np.arange(width, dtype=np.int64)[None, :]
    base = (x + y + seed) % 256
    return np.stack([base, (base + 85) % 256, (base + 170) % 256], axis=-1).astype(
        "uint8"
    )


def synthetic_media_table(spark, n: int = 100, real: bool = False) -> DataFrame:
    """Deterministic media table. ``real=False`` (default) emits the
    header-only FAKEIMG layout (plumbing tests); ``real=True`` emits
    actual decodable images — BMP for even ids, PPM for odd."""
    rows = []
    for i in range(n):
        w, h = 16 + (i % 8) * 4, 16 + (i % 5) * 4
        if real:
            px = make_test_pixels(w, h, seed=i)
            content = encode_bmp(px) if i % 2 == 0 else encode_ppm(px)
        else:
            content = make_fake_image_bytes(64 + (i % 8) * 32, 64 + (i % 5) * 48)
        rows.append((i, "image", content, None, f"mem://media/{i}.img"))
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    return df.withColumn("content_length", F.length("content").cast("long"))


def synthetic_png_table(spark, n: int = 80) -> DataFrame:
    """Deterministic PNG media table: the same gradient pixels as
    ``synthetic_media_table`` (different size formula so q147 can't
    accidentally pass against q139's corpus), encoded through the real
    DEFLATE path with the filter cycle 0..4 by row — so decoding
    exercises every unfilter branch on every image taller than 4 px."""
    rows = []
    for i in range(n):
        w, h = 16 + (i % 6) * 4, 16 + (i % 4) * 4
        px = make_test_pixels(w, h, seed=i)
        rows.append((i, "image", encode_png(px), None, f"mem://media/{i}.png"))
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    return df.withColumn("content_length", F.length("content").cast("long"))


# ---------------------------------------------------------------------------
# Kernels
# ---------------------------------------------------------------------------


def decode_image_meta(df: DataFrame, fake: bool = False) -> DataFrame:
    """Image dimensions/format via mapInPandas — REAL decode for BMP
    and PPM; ``fake=True`` additionally accepts the header-only
    FAKEIMG layout. Undecodable payloads yield null columns, never
    task failures (corrupt files must not kill a 100 TB scan)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:  # one Arrow batch at a time — bounded memory
            out = []
            for media_id, content in zip(pdf["media_id"], pdf["content"]):
                px, fmt = _decode_any(content)
                if px is not None:
                    h, w, c = px.shape
                    out.append((media_id, w, h, c, fmt))
                elif (
                    fake
                    and content is not None
                    and bytes(content[:7]) == _MAGIC
                ):
                    w = int.from_bytes(bytes(content[7:9]), "big")
                    h = int.from_bytes(bytes(content[9:11]), "big")
                    out.append((media_id, w, h, int(content[11]), "fakeimg"))
                else:
                    out.append((media_id, None, None, None, None))
            yield pd.DataFrame(
                out, columns=["media_id", "width", "height", "channels", "format"]
            )

    return df.select("media_id", "content").mapInPandas(kernel, IMAGE_META_SCHEMA)


def resize_images(
    df: DataFrame, target: tuple[int, int], fake: bool = False
) -> DataFrame:
    """Nearest-neighbor resize to (width, height), re-encoded as BMP —
    real numpy index-sampling for BMP/PPM payloads. ``fake=True``
    passes FAKEIMG payloads through as header rewrites (no pixels to
    resample)."""
    import numpy as np

    tw, th = target

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for media_id, content in zip(pdf["media_id"], pdf["content"]):
                px, _ = _decode_any(content)
                if px is not None:
                    h, w, _c = px.shape
                    iy = (np.arange(th) * h) // th
                    ix = (np.arange(tw) * w) // tw
                    out.append((media_id, encode_bmp(px[iy][:, ix])))
                elif (
                    fake
                    and content is not None
                    and bytes(content[:7]) == _MAGIC
                ):
                    out.append((media_id, make_fake_image_bytes(tw, th)))
                else:
                    out.append((media_id, None))
            yield pd.DataFrame(out, columns=["media_id", "content"])

    return df.select("media_id", "content").mapInPandas(
        kernel, "media_id long, content binary"
    )


def image_features(df: DataFrame) -> DataFrame:
    """Per-channel mean + luminance mean/std — real numpy feature
    extraction over decoded pixels (the 'feature-extract' stage of a
    multimodal training pipeline). Scalars cross back to the JVM;
    pixels never leave the kernel."""
    import numpy as np

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for media_id, content in zip(pdf["media_id"], pdf["content"]):
                px, fmt = _decode_any(content)
                if px is None:
                    out.append((media_id, None, None, None, None, None, None))
                    continue
                f = px.astype(np.float64)
                lum = f @ np.array([0.2126, 0.7152, 0.0722])
                out.append(
                    (
                        media_id,
                        fmt,
                        float(f[..., 0].mean()),
                        float(f[..., 1].mean()),
                        float(f[..., 2].mean()),
                        float(lum.mean()),
                        float(lum.std()),
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "media_id",
                    "format",
                    "mean_r",
                    "mean_g",
                    "mean_b",
                    "luma_mean",
                    "luma_std",
                ],
            )

    return df.select("media_id", "content").mapInPandas(
        kernel,
        "media_id long, format string, mean_r double, mean_g double, "
        "mean_b double, luma_mean double, luma_std double",
    )


# ---------------------------------------------------------------------------
# Audio: WAV PCM (pure struct/numpy, like BMP)
# ---------------------------------------------------------------------------


def encode_wav(samples, sample_rate: int = 16000) -> bytes:
    """(n,) or (n, channels) int16 array -> PCM WAV bytes."""
    import numpy as np

    a = np.asarray(samples, dtype=np.int16)
    if a.ndim == 1:
        a = a[:, None]
    n, ch = a.shape
    data = a.tobytes()  # interleaved frames
    byte_rate = sample_rate * ch * 2
    hdr = (
        b"RIFF"
        + struct.pack("<I", 36 + len(data))
        + b"WAVEfmt "
        + struct.pack("<IHHIIHH", 16, 1, ch, sample_rate, byte_rate, ch * 2, 16)
        + b"data"
        + struct.pack("<I", len(data))
    )
    return hdr + data


def decode_wav(b: bytes):
    """PCM WAV bytes -> ((n, channels) int16 array, sample_rate).
    Walks RIFF chunks, so extra chunks (LIST, fact) don't break it."""
    import numpy as np

    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a WAV")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(b):
        cid, size = b[pos : pos + 4], struct.unpack_from("<I", b, pos + 4)[0]
        body = b[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_fmt, ch, rate, _br, _ba, bits = fmt
    if audio_fmt != 1 or bits != 16:
        require_codec(f"WAV format={audio_fmt} bits={bits}")
    samples = np.frombuffer(data, np.int16, count=(len(data) // (2 * ch)) * ch)
    return samples.reshape(-1, ch), rate


def audio_features(df: DataFrame) -> DataFrame:
    """Duration, sample rate, RMS level, and peak per WAV payload —
    real decode + numpy reductions; undecodable bytes yield nulls."""
    import numpy as np

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for media_id, content in zip(pdf["media_id"], pdf["content"]):
                try:
                    samples, rate = decode_wav(bytes(content))
                except (ValueError, TypeError, struct.error):
                    out.append((media_id, None, None, None, None, None))
                    continue
                f = samples.astype(np.float64) / 32768.0
                out.append(
                    (
                        media_id,
                        int(samples.shape[1]),
                        int(rate),
                        float(samples.shape[0] / rate),
                        float(np.sqrt((f**2).mean())),
                        float(np.abs(f).max(initial=0.0)),
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "media_id",
                    "channels",
                    "sample_rate",
                    "duration_sec",
                    "rms",
                    "peak",
                ],
            )

    return df.select("media_id", "content").mapInPandas(
        kernel,
        "media_id long, channels int, sample_rate int, duration_sec double, "
        "rms double, peak double",
    )


def resample_audio(df: DataFrame, target_rate: int) -> DataFrame:
    """Nearest-sample resample to target_rate, re-encoded as WAV —
    the audio analog of nearest-neighbor image resize (linear-phase
    filters need DSP libs; index resampling is the honest numpy
    version)."""
    import numpy as np

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for media_id, content in zip(pdf["media_id"], pdf["content"]):
                try:
                    samples, rate = decode_wav(bytes(content))
                except (ValueError, TypeError, struct.error):
                    out.append((media_id, None))
                    continue
                n_out = int(samples.shape[0] * target_rate / rate)
                idx = (np.arange(n_out) * rate) // target_rate
                out.append((media_id, encode_wav(samples[idx], target_rate)))
            yield pd.DataFrame(out, columns=["media_id", "content"])

    return df.select("media_id", "content").mapInPandas(
        kernel, "media_id long, content binary"
    )


# ---------------------------------------------------------------------------
# Video: length-prefixed frame container
# ---------------------------------------------------------------------------

_VID_MAGIC = b"VIDF"


def encode_video(frames) -> bytes:
    """Concatenate encoded frames into b"VIDF" + u32 count +
    (u32 length + payload) per frame."""
    body = b"".join(struct.pack("<I", len(f)) + f for f in frames)
    return _VID_MAGIC + struct.pack("<I", len(frames)) + body


def sample_video_frames(df: DataFrame, every_n: int = 10) -> DataFrame:
    """Decode every n-th frame of a VIDF container — only the sampled
    frames are decoded (seek by length prefix, skip the rest), the
    access pattern that keeps frame-sampling linear in frames *kept*
    rather than frames stored."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_id, content in zip(pdf["media_id"], pdf["content"]):
                if content is None or bytes(content[:4]) != _VID_MAGIC:
                    continue
                b = bytes(content)
                n = struct.unpack_from("<I", b, 4)[0]
                pos = 8
                for fno in range(n):
                    ln = struct.unpack_from("<I", b, pos)[0]
                    if fno % every_n == 0:
                        rows.append((media_id, fno, b[pos + 4 : pos + 4 + ln]))
                    pos += 4 + ln
            yield pd.DataFrame(rows, columns=["media_id", "frame_no", "frame"])

    return df.select("media_id", "content").mapInPandas(
        kernel, "media_id long, frame_no int, frame binary"
    )


def synthetic_audio_table(spark, n: int = 50) -> DataFrame:
    """Deterministic WAV table for driver-verifiable audio decode:
    media_id i carries a constant-amplitude mono PCM signal —
    amplitude ``(i * 500) % 32768``, ``8000 + (i % 5) * 4000`` frames
    at 16 kHz — so duration, RMS, and peak all have closed forms an
    independent engine can recompute without decoding."""
    import numpy as np

    rows = []
    for i in range(n):
        amp = (i * 500) % 32768
        frames = 8000 + (i % 5) * 4000
        samples = np.full(frames, amp, dtype=np.int16)
        rows.append((i, "audio", encode_wav(samples, 16000), None,
                     f"mem://media/{i}.wav"))
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    return df.withColumn("content_length", F.length("content").cast("long"))


def image_exact_stats(df: DataFrame) -> DataFrame:
    """Integer-exact per-image pixel statistics — the driver-verifiable
    face of the feature-extract stage (``image_features`` keeps the
    float API). Per image: pixel count, exact channel sums, and exact
    sums of a micro-quantized luminance (lq = 2126*R + 7152*G + 722*B,
    i.e. Rec.709 x 1e4) and its square — all int64, so an independent
    engine that regenerates the deterministic pixels reproduces every
    value bit-for-bit; means/stds derive downstream as one
    correctly-rounded division/sqrt. Pixels never leave the kernel;
    five scalars per image cross back. Overflow headroom: lq <=
    2.55e6, lq^2 <= 6.5e12, so sum_lq2 stays under int64 through
    ~1.4e6 pixels per image (gate larger frames upstream)."""
    import numpy as np

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for media_id, content in zip(pdf["media_id"], pdf["content"]):
                px, fmt = _decode_any(content)
                if px is None:
                    out.append((media_id, None, None, None, None, None, None))
                    continue
                p = px.astype(np.int64)
                lq = p @ np.array([2126, 7152, 722], dtype=np.int64)
                out.append(
                    (
                        media_id,
                        int(p.shape[0] * p.shape[1]),
                        int(p[..., 0].sum()),
                        int(p[..., 1].sum()),
                        int(p[..., 2].sum()),
                        int(lq.sum()),
                        int((lq * lq).sum()),
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "media_id", "n_px", "sum_r", "sum_g", "sum_b",
                    "sum_lq", "sum_lq2",
                ],
            )

    return df.select("media_id", "content").mapInPandas(
        kernel,
        "media_id long, n_px long, sum_r long, sum_g long, sum_b long, "
        "sum_lq long, sum_lq2 long",
    )


def synthetic_video_table(spark, n: int = 20) -> DataFrame:
    """Deterministic VIDF table for driver-verifiable frame sampling:
    media i holds ``6 + (i % 5)`` PPM frames of size 16x(16 + (i%3)*4),
    frame f's pixels from ``make_test_pixels(w, h, seed=i * 100 + f)``
    — every sampled frame's pixel sums have a closed form an
    independent engine can recompute."""
    rows = []
    for i in range(n):
        w, h = 16, 16 + (i % 3) * 4
        frames = [
            encode_ppm(make_test_pixels(w, h, seed=i * 100 + f))
            for f in range(6 + (i % 5))
        ]
        rows.append((i, "video", encode_video(frames), None,
                     f"mem://media/{i}.vidf"))
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    return df.withColumn("content_length", F.length("content").cast("long"))


def frame_exact_stats(frames_df: DataFrame) -> DataFrame:
    """Integer-exact pixel stats per SAMPLED frame — the decode step
    downstream of ``sample_video_frames`` (only kept frames were ever
    extracted from the container, so this is linear in frames KEPT).
    Input: (media_id, frame_no, frame) from sample_video_frames;
    output int64 (n_px, sum_r, sum_g, sum_b) per frame."""
    import numpy as np

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for media_id, frame_no, frame in zip(
                pdf["media_id"], pdf["frame_no"], pdf["frame"]
            ):
                px, _fmt = _decode_any(frame)
                if px is None:
                    out.append((media_id, frame_no, None, None, None, None))
                    continue
                p = px.astype(np.int64)
                out.append(
                    (
                        media_id,
                        frame_no,
                        int(p.shape[0] * p.shape[1]),
                        int(p[..., 0].sum()),
                        int(p[..., 1].sum()),
                        int(p[..., 2].sum()),
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "media_id", "frame_no", "n_px", "sum_r", "sum_g", "sum_b",
                ],
            )

    return frames_df.mapInPandas(
        kernel,
        "media_id long, frame_no int, n_px long, sum_r long, sum_g long, "
        "sum_b long",
    )
