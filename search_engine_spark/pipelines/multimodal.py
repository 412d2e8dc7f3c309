"""Multimodal column plumbing: opaque ``binary`` payloads + typed metadata.

REAL decode paths with zero external dependencies: WAV audio (stdlib
``wave``), uncompressed BMP and binary PPM images (pure numpy container
parses), compressed PNG (stdlib ``zlib`` inflate + numpy scanline
unfiltering, all five filter types), and baseline JPEG (pure-numpy
Huffman + IDCT decoder, ``pipelines/jpeg.py`` — grayscale and YCbCr,
4:4:4/4:2:2/4:2:0, restart markers; progressive raises). Remaining
compressed formats (MP3/video, progressive JPEG) need codec libraries
the container does not ship, so those decodes are import-gated (Pillow)
or stubbed (``decode_payload`` raises ``NotImplementedError`` unless
``fake='deterministic'``); everything Spark-side is real and tested:

* schema: payloads travel as ``binary`` columns with a ``media_type`` tag;
* batching: feature extraction is an Arrow-batched ``mapInPandas`` whose
  per-batch cost is O(batch bytes) — the shape that holds when the payload
  is a 5 MB JPEG instead of a 500-byte text blob;
* partitioning: payload tables should be written with
  ``spark.sql.files.maxPartitionBytes`` sized so one task holds a bounded
  number of payloads; features are small rows that shuffle freely.

The deterministic fake decoder derives pseudo width/height from the payload
md5 so tests (and the DuckDB oracle) can verify the full pipeline without a
codec library.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

FEATURE_SCHEMA = "doc_id long, media_type string, n_bytes long, content_md5 string, fake_w int, fake_h int"


def attach_binary_payload(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", media_type: str = "text/plain"
) -> DataFrame:
    """Wrap a text column as an opaque binary payload + typed metadata
    (stand-in for real image/audio bytes; byte-exact: UTF-8 encoding)."""
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.lit(media_type).alias("media_type"),
    )


def decode_payload(payload: bytes, media_type: str, fake: str | None = None) -> dict:
    """Decode one payload to raw media.

    Real paths: WAV audio decodes with the stdlib ``wave`` parser
    (:func:`decode_wav` — always available); images decode with Pillow
    when it is installed (:func:`decode_image` — import-gated, raises
    ``NotImplementedError`` in codec-less containers like this one).
    ``fake='deterministic'`` returns md5-derived pseudo-dimensions —
    reproducible everywhere (used by tests and the SQL oracle for the
    codec-independent plumbing entries).
    """
    if fake == "deterministic":
        h = hashlib.md5(payload).hexdigest()
        return {
            "content_md5": h,
            "fake_w": int(h[:2], 16) % 64 + 1,
            "fake_h": int(h[2:4], 16) % 64 + 1,
        }
    if fake is not None:
        raise ValueError(f"unknown fake mode {fake!r}")
    if media_type in ("audio/wav", "audio/x-wav"):
        return decode_wav(payload)
    if media_type.startswith("image/"):
        return decode_image(payload)
    raise NotImplementedError(
        f"no decoder for {media_type!r} in this environment; WAV audio and "
        "(with Pillow installed) images decode for real — pass "
        "fake='deterministic' for the codec-independent test fake"
    )


def decode_wav(payload: bytes) -> dict:
    """REAL audio decode: parse a WAV container with the stdlib ``wave``
    module — channels, sample rate, frame count, duration, and the RMS
    amplitude of the 16-bit PCM stream. The integer sum of squares is
    exact in float64 for bounded clips, so RMS is bit-reproducible (the
    DuckDB oracle computes the same sum analytically for synthesized
    clips)."""
    import io
    import wave as _wave

    import numpy as np

    with _wave.open(io.BytesIO(payload), "rb") as w:
        channels = w.getnchannels()
        rate = w.getframerate()
        n_frames = w.getnframes()
        width = w.getsampwidth()
        frames = w.readframes(n_frames)
    out = {
        "channels": channels,
        "sample_rate": rate,
        "n_frames": n_frames,
        "duration_s": round(n_frames / float(rate), 6) if rate else 0.0,
    }
    if width == 2 and frames:
        s = np.frombuffer(frames, dtype="<i2").astype(np.int64)
        out["rms"] = round(float(np.sqrt(float((s * s).sum()) / len(s))), 6)
    else:
        out["rms"] = None
    return out


def decode_image(payload: bytes) -> dict:
    """Image decode. REAL paths with zero dependencies: uncompressed BMP
    (24/32 bpp, :func:`decode_bmp`), binary PPM (P6, :func:`decode_ppm`),
    compressed PNG (:func:`decode_png`, stdlib zlib + numpy unfilter)
    and baseline JPEG (:func:`decode_jpeg`, pure-numpy Huffman + IDCT) —
    format sniffed from the magic bytes. Remaining formats (WebP, GIF,
    progressive JPEG, ...) fall through to Pillow when installed
    (import-gated: a deployment with ``pillow`` gets them with no code
    change)."""
    import io

    if payload[:2] == b"BM":
        return decode_bmp(payload)
    if payload[:2] == b"P6":
        return decode_ppm(payload)
    if payload[:8] == PNG_SIGNATURE:
        return decode_png(payload)
    if payload[:3] == b"\xff\xd8\xff":
        try:
            return decode_jpeg(payload)
        except NotImplementedError:
            pass  # progressive/exotic JPEG: fall through to Pillow
    try:
        from PIL import Image
    except ImportError as e:  # pragma: no cover - container has no Pillow
        raise NotImplementedError(
            "this compressed-image variant requires pillow, which is not "
            "installed in this environment (BMP, PPM, PNG and baseline "
            "JPEG decode with pure numpy/stdlib zlib)"
        ) from e
    with Image.open(io.BytesIO(payload)) as im:  # pragma: no cover
        return {"width": im.width, "height": im.height,
                "channels": len(im.getbands()), "mean_px": None}


def _rgb_summary(rgb) -> dict:
    """(h, w, 3) uint8 -> the feature dict shared by all image decoders.
    ``mean_px`` is an exact-integer sum divided once in float64 — the
    same two integers divide to the same double in numpy and DuckDB, so
    the value is hash-comparable with NO rounding step."""
    import numpy as np

    h, w = rgb.shape[0], rgb.shape[1]
    s = int(rgb.astype(np.int64).sum())
    return {
        "width": int(w),
        "height": int(h),
        "channels": 3,
        "mean_px": s / float(w * h * 3),
    }


def decode_bmp(payload: bytes) -> dict:
    """REAL image decode, no codec library: parse an uncompressed
    BITMAPINFOHEADER BMP (24 bpp BGR or 32 bpp BGRA; bottom-up or
    top-down), strip the 4-byte row padding, and return
    (width, height, channels, mean_px) over the RGB planes (alpha
    dropped). Pure numpy reshape/slice — O(payload bytes)."""
    import struct

    import numpy as np

    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload (missing 'BM' magic)")
    pix_off = struct.unpack_from("<I", payload, 10)[0]
    w, h_raw = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    comp = struct.unpack_from("<I", payload, 30)[0]
    if comp != 0 or bpp not in (24, 32):
        raise NotImplementedError(
            f"only uncompressed 24/32 bpp BMP supported (bpp={bpp}, "
            f"compression={comp})"
        )
    h = abs(h_raw)
    nch = bpp // 8
    row_bytes = ((bpp * w + 31) // 32) * 4
    arr = np.frombuffer(payload, dtype=np.uint8, count=row_bytes * h,
                        offset=pix_off)
    arr = arr.reshape(h, row_bytes)[:, : w * nch].reshape(h, w, nch)
    if h_raw > 0:  # positive height = bottom-up storage
        arr = arr[::-1]
    return _rgb_summary(arr[:, :, 2::-1])  # BGR(A) -> RGB, alpha dropped


def decode_ppm(payload: bytes) -> dict:
    """REAL image decode, no codec library: binary PPM (P6) — tokenized
    header (whitespace-separated width/height/maxval, ``#`` comments
    honored) followed by raw RGB triplets."""
    import numpy as np

    vals: list[int] = []
    i = 2  # past 'P6'
    while len(vals) < 3:
        while i < len(payload) and payload[i : i + 1].isspace():
            i += 1
        if payload[i : i + 1] == b"#":
            while i < len(payload) and payload[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < len(payload) and not payload[j : j + 1].isspace():
            j += 1
        if j == i:
            raise ValueError("truncated PPM header")
        vals.append(int(payload[i:j]))
        i = j
    i += 1  # exactly one whitespace byte separates maxval from raster
    w, h, maxval = vals
    if maxval > 255:
        raise NotImplementedError("16-bit PPM not supported")
    rgb = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3,
                        offset=i).reshape(h, w, 3)
    return _rgb_summary(rgb)


PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"


def decode_png(payload: bytes) -> dict:
    """REAL compressed-image decode with zero codec dependencies: PNG via
    stdlib ``zlib`` inflate + per-scanline unfiltering in numpy. Supports
    the shape 99% of web PNGs use — 8-bit truecolor (color type 2) and
    truecolor+alpha (type 6), non-interlaced — and all five scanline
    filters (None/Sub/Up/Average/Paeth). Alpha is dropped, matching
    :func:`decode_bmp`'s 32 bpp path. Palette/gray/16-bit/interlaced
    variants raise ``NotImplementedError`` (Pillow path handles them in
    deployments that ship it).

    Cost: inflate is O(payload bytes); unfiltering is one numpy pass per
    scanline. Sub (and the left term of Average/Paeth) is a per-channel
    prefix recurrence, vectorized as a uint8 cumsum over the (w, nch)
    view; Average/Paeth's up-dependence makes rows sequential, which is
    fine — row count, not pixel count, bounds the Python-level loop.
    """
    import struct
    import zlib

    import numpy as np

    if payload[:8] != PNG_SIGNATURE:
        raise ValueError("not a PNG payload (bad signature)")
    w = h = None
    idat: list[bytes] = []
    pos = 8
    while pos + 8 <= len(payload):
        ln, typ = struct.unpack_from(">I4s", payload, pos)
        data = payload[pos + 8 : pos + 8 + ln]
        if typ == b"IHDR":
            w, h, depth, ctype, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if depth != 8 or ctype not in (2, 6) or interlace != 0:
                raise NotImplementedError(
                    f"only 8-bit non-interlaced truecolor(+alpha) PNG "
                    f"supported (depth={depth}, color_type={ctype}, "
                    f"interlace={interlace})"
                )
        elif typ == b"IDAT":
            idat.append(data)
        elif typ == b"IEND":
            break
        pos += 12 + ln
    if w is None or not idat:
        raise ValueError("truncated PNG (missing IHDR or IDAT)")
    nch = 4 if ctype == 6 else 3
    stride = w * nch
    raw = zlib.decompress(b"".join(idat))
    if len(raw) != h * (1 + stride):
        raise ValueError("PNG raster size mismatch")
    lines = np.frombuffer(raw, dtype=np.uint8).reshape(h, 1 + stride)
    filters = lines[:, 0]
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for r in range(h):
        f = int(filters[r])
        line = lines[r, 1:]
        if f == 0:  # None
            x = line.copy()
        elif f == 1:  # Sub: per-channel prefix sum (uint8 wraps == mod 256)
            x = line.reshape(w, nch).cumsum(axis=0, dtype=np.uint8).reshape(stride)
        elif f == 2:  # Up
            x = line + prev
        elif f == 3:  # Average: left-dependence is sequential per pixel
            x = np.empty(stride, dtype=np.uint8)
            for i in range(stride):
                left = int(x[i - nch]) if i >= nch else 0
                x[i] = (int(line[i]) + (left + int(prev[i])) // 2) & 0xFF
        elif f == 4:  # Paeth
            x = np.empty(stride, dtype=np.uint8)
            for i in range(stride):
                a = int(x[i - nch]) if i >= nch else 0
                b = int(prev[i])
                c = int(prev[i - nch]) if i >= nch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                x[i] = (int(line[i]) + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {f}")
        out[r] = x
        prev = x
    rgb = out.reshape(h, w, nch)[:, :, :3]
    return _rgb_summary(rgb)


def decode_jpeg(payload: bytes) -> dict:
    """REAL baseline-JPEG decode, no codec library (``pipelines/jpeg.py``:
    segment parse, Huffman entropy decode, dequantize, float64 IDCT,
    chroma upsample, YCbCr->RGB). Grayscale payloads report
    ``channels=1``; ``mean_px`` is the exact-integer pixel sum divided
    once in float64 (hash-comparable with the DuckDB oracle, same
    contract as :func:`_rgb_summary`)."""
    import numpy as np

    from search_engine_spark.pipelines.jpeg import decode_jpeg as _dec

    px = _dec(payload)
    if px.ndim == 2:
        h, w = px.shape
        return {
            "width": int(w),
            "height": int(h),
            "channels": 1,
            "mean_px": int(px.astype(np.int64).sum()) / float(w * h),
        }
    return _rgb_summary(px)


def synth_jpeg(doc_id: int) -> bytes:
    """Deterministic grayscale baseline JPEG for doc ``doc_id`` whose
    decode is EXACT (hash-comparable oracle like ``synth_bmp``): the
    image is constant within each 8x8 block — ``v(block_row, block_col)
    = (doc_id*37 + block_row*19 + block_col*11) % 256`` — so with the
    encoder's all-ones quantization tables every block is DC-only and
    the Huffman -> dequant -> IDCT round trip reproduces the raster
    bit-for-bit (AC coefficients are identically zero; the DC path is
    integer end to end). Dimensions ``w = 8*(1 + id%3)``, ``h = 8*(1 +
    id%2)``; odd ids add restart intervals (DRI + RSTn every 2 MCUs) so
    the predictor-reset path is exercised by the same oracle entry."""
    import numpy as np

    from search_engine_spark.pipelines.jpeg import encode_jpeg

    did = int(doc_id)
    wb, hb = 1 + did % 3, 1 + did % 2
    br = np.arange(hb, dtype=np.int64)[:, None]
    bc = np.arange(wb, dtype=np.int64)[None, :]
    blocks = ((did * 37 + br * 19 + bc * 11) % 256).astype(np.uint8)
    img = np.repeat(np.repeat(blocks, 8, axis=0), 8, axis=1)
    return encode_jpeg(img, restart_interval=2 if did % 2 else 0)


def _png_chunk(typ: bytes, data: bytes) -> bytes:
    import struct
    import zlib

    return (
        struct.pack(">I", len(data))
        + typ
        + data
        + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
    )


def synth_png(doc_id: int) -> bytes:
    """Deterministic 8-bit RGB PNG for doc ``doc_id``: same dimensions and
    integer pixel formula as :func:`synth_bmp` (so the DuckDB oracle is
    shared verbatim), with scanline ``r`` filtered as ``(doc_id + r) % 5``
    — every encode/decode round-trip exercises ALL five PNG filter types,
    not just the trivial None path."""
    import struct
    import zlib

    import numpy as np

    w = 4 + int(doc_id) % 5
    h = 3 + int(doc_id) % 4
    r = np.arange(h, dtype=np.int64)[:, None, None]
    c = np.arange(w, dtype=np.int64)[None, :, None]
    k = np.arange(3, dtype=np.int64)[None, None, :]
    rgb = ((int(doc_id) * 31 + r * 17 + c * 7 + k * 3) % 256).astype(np.uint8)
    nch, stride = 3, 3 * w
    flat = rgb.reshape(h, stride).astype(np.int64)
    scan = bytearray()
    prev = np.zeros(stride, dtype=np.int64)
    for row in range(h):
        f = (int(doc_id) + row) % 5
        cur = flat[row]
        left = np.zeros(stride, dtype=np.int64)
        left[nch:] = cur[:-nch]
        up_left = np.zeros(stride, dtype=np.int64)
        up_left[nch:] = prev[:-nch]
        if f == 0:
            filt = cur
        elif f == 1:
            filt = cur - left
        elif f == 2:
            filt = cur - prev
        elif f == 3:
            filt = cur - (left + prev) // 2
        else:  # Paeth predictor
            p = left + prev - up_left
            pa, pb, pc = np.abs(p - left), np.abs(p - prev), np.abs(p - up_left)
            pred = np.where(
                (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, up_left)
            )
            filt = cur - pred
        scan.append(f)
        scan += (filt % 256).astype(np.uint8).tobytes()
        prev = cur
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        PNG_SIGNATURE
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(scan)))
        + _png_chunk(b"IEND", b"")
    )


def synth_bmp(doc_id: int) -> bytes:
    """Deterministic 24 bpp BMP for doc ``doc_id``: width ``4 + id % 5``,
    height ``3 + id % 4`` (both ranges exercise every row-padding
    remainder), pixel ``v(row, col, chan) = (id*31 + row*17 + col*7 +
    chan*3) % 256`` in RGB channel order — a pure integer formula the
    DuckDB oracle evaluates with ``range()`` joins, so the real
    encode -> container-parse -> feature path is verifiable end to end
    without external media files (image analogue of :func:`synth_wav`)."""
    import struct

    import numpy as np

    w = 4 + int(doc_id) % 5
    h = 3 + int(doc_id) % 4
    r = np.arange(h, dtype=np.int64)[:, None, None]
    c = np.arange(w, dtype=np.int64)[None, :, None]
    k = np.arange(3, dtype=np.int64)[None, None, :]
    rgb = ((int(doc_id) * 31 + r * 17 + c * 7 + k * 3) % 256).astype(np.uint8)
    bgr = rgb[:, :, ::-1]
    row_bytes = (3 * w + 3) // 4 * 4
    rows = np.zeros((h, row_bytes), dtype=np.uint8)
    rows[:, : 3 * w] = bgr.reshape(h, 3 * w)
    pix = rows[::-1].tobytes()  # bottom-up
    header = struct.pack("<2sIHHI", b"BM", 54 + len(pix), 0, 0, 54)
    dib = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pix), 2835, 2835, 0, 0
    )
    return header + dib + pix


IMAGE_SCHEMA = (
    "doc_id long, width int, height int, channels int, mean_px double"
)


def image_features(payloads: DataFrame) -> DataFrame:
    """REAL image feature extraction over (doc_id, payload) BMP/PPM
    columns: -> (doc_id, width, height, channels, mean_px). Same
    Arrow-batched ``mapInPandas`` shape as :func:`audio_features`; the
    decode is the genuine numpy container parse — no fake, no codec
    stub."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                feats = decode_image(bytes(payload))
                rows.append({"doc_id": int(doc_id), **feats})
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "width", "height", "channels", "mean_px"],
            )

    return payloads.mapInPandas(run, schema=IMAGE_SCHEMA)


def synth_wav(doc_id: int) -> bytes:
    """Deterministic 8 kHz mono 16-bit WAV clip for doc ``doc_id``:
    ``n_frames = 800 + (doc_id % 5) * 160`` samples of
    ``s_i = (doc_id * 7919 + i * 997) % 65536 - 32768`` — a pure integer
    formula the DuckDB oracle evaluates with ``generate_series``, so the
    real encode -> parse -> feature path is verifiable end to end without
    external media files."""
    import io
    import wave as _wave

    import numpy as np

    n = 800 + (int(doc_id) % 5) * 160
    i = np.arange(n, dtype=np.int64)
    vals = ((int(doc_id) * 7919 + i * 997) % 65536 - 32768).astype("<i2")
    buf = io.BytesIO()
    with _wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(vals.tobytes())
    return buf.getvalue()


AUDIO_SCHEMA = (
    "doc_id long, channels int, sample_rate int, n_frames long, "
    "duration_s double, rms double"
)


def audio_features(payloads: DataFrame) -> DataFrame:
    """REAL audio feature extraction over (doc_id, payload) WAV columns:
    -> (doc_id, channels, sample_rate, n_frames, duration_s, rms).

    Same Arrow-batched ``mapInPandas`` shape as :func:`extract_features`,
    but the decode is the genuine stdlib WAV parse — no fake, no codec
    stub. Batch cost is O(batch bytes); output rows are small and shuffle
    freely."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                feats = decode_wav(bytes(payload))
                rows.append({"doc_id": int(doc_id), **feats})
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "channels", "sample_rate", "n_frames",
                         "duration_s", "rms"],
            )

    return payloads.mapInPandas(run, schema=AUDIO_SCHEMA)


def extract_features(payloads: DataFrame, fake: str = "deterministic") -> DataFrame:
    """Arrow-batched feature extraction over (doc_id, payload, media_type).

    -> (doc_id, media_type, n_bytes, content_md5, fake_w, fake_h). This is
    where a real pipeline would resize images / sample frames / embed audio;
    the batch loop, schema and partition behavior are identical.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload, mt in zip(
                pdf["doc_id"], pdf["payload"], pdf["media_type"]
            ):
                payload = bytes(payload)
                feats = decode_payload(payload, mt, fake=fake)
                rows.append(
                    {
                        "doc_id": int(doc_id),
                        "media_type": mt,
                        "n_bytes": len(payload),
                        **feats,
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "media_type",
                    "n_bytes",
                    "content_md5",
                    "fake_w",
                    "fake_h",
                ],
            )

    return payloads.mapInPandas(run, schema=FEATURE_SCHEMA)


RESIZE_SCHEMA = "doc_id long, media_type string, out_w int, out_h int, thumb_md5 string"


def resize_media(
    payloads: DataFrame, target_w: int = 32, target_h: int = 32, fake: str = "deterministic"
) -> DataFrame:
    """Resize step (STUB codec, real plumbing): -> (doc_id, media_type,
    out_w, out_h, thumb_md5).

    A real pipeline would decode + bilinear-resample here; the
    deterministic fake clamps the pseudo-dimensions to the target box and
    fingerprints the "thumbnail" as ``md5(payload || ':WxH')`` so the
    output is verifiable everywhere. Batch cost stays O(batch bytes);
    output rows are small and shuffle freely.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload, mt in zip(
                pdf["doc_id"], pdf["payload"], pdf["media_type"]
            ):
                payload = bytes(payload)
                feats = decode_payload(payload, mt, fake=fake)
                out_w = min(feats["fake_w"], target_w)
                out_h = min(feats["fake_h"], target_h)
                thumb = hashlib.md5(
                    payload + f":{out_w}x{out_h}".encode()
                ).hexdigest()
                rows.append(
                    {
                        "doc_id": int(doc_id),
                        "media_type": mt,
                        "out_w": out_w,
                        "out_h": out_h,
                        "thumb_md5": thumb,
                    }
                )
            yield pd.DataFrame(
                rows, columns=["doc_id", "media_type", "out_w", "out_h", "thumb_md5"]
            )

    return payloads.mapInPandas(run, schema=RESIZE_SCHEMA)


FRAME_SCHEMA = (
    "doc_id long, frame_idx int, frame_offset long, frame_bytes int, frame_md5 string"
)


def sample_frames(
    payloads: DataFrame, frame_size: int = 64, every: int = 4
) -> DataFrame:
    """Frame sampling (video analogue) over binary payloads: -> one row per
    sampled frame (doc_id, frame_idx, frame_offset, frame_bytes, frame_md5).

    Takes every ``every``-th ``frame_size``-byte window of the payload —
    the deterministic stand-in for keyframe extraction. The Spark-side
    plumbing is the real thing: variable per-doc fan-out inside
    ``mapInPandas`` (one input row -> N output rows without an explode
    shuffle), Arrow-batched, output bounded by payload bytes / stride.
    """
    stride = frame_size * every

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                for idx, off in enumerate(range(0, len(b), stride)):
                    fb = b[off : off + frame_size]
                    rows.append(
                        {
                            "doc_id": int(doc_id),
                            "frame_idx": idx,
                            "frame_offset": off,
                            "frame_bytes": len(fb),
                            "frame_md5": hashlib.md5(fb).hexdigest(),
                        }
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "frame_idx",
                    "frame_offset",
                    "frame_bytes",
                    "frame_md5",
                ],
            )

    return payloads.mapInPandas(run, schema=FRAME_SCHEMA)
