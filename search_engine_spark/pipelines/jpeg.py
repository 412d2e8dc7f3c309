"""Baseline JPEG codec — pure numpy + stdlib, zero codec dependencies.

Closes the last REAL-decode gap of the multimodal pipeline (reference
analogue: the vector/extract pipeline consumes arbitrary document
payloads, ``src/update/index_documents/extract/extract_vector_points.rs``
:1-427): BMP/PPM/PNG/WAV already decode with numpy/stdlib; this module
adds ITU-T81 baseline sequential DCT JPEG.

Decoder (:func:`decode_jpeg`): SOI/APP*/DQT/SOF0|1/DHT/DRI/SOS parsing,
Huffman entropy decode with byte-unstuffing and restart-marker handling,
dequantize -> de-zigzag -> float64 IDCT (exact 8x8 DCT-III via a basis
matrix product, no libjpeg fixed-point approximations), chroma
upsampling for 4:4:4 / 4:2:2 / 4:2:0, and YCbCr->RGB (BT.601, the T.871
JFIF constants). Grayscale (1 component) and YCbCr (3 components) only;
progressive (SOF2), arithmetic coding, 12-bit, and CMYK raise
``NotImplementedError`` — honest boundaries, stated in the error.

Encoder (:func:`encode_jpeg`): the deterministic test-vector source
(same role as ``synth_bmp``/``synth_png``/``synth_wav`` — the container
has no Pillow and no media files, so round-trip against our own encoder
is the verification path; a deployment with Pillow cross-checks via the
import-gated path in ``multimodal.decode_image``). Baseline, 4:4:4 or
4:2:0, optional restart intervals, canonical per-image Huffman tables
(the decoder reads whatever DHT declares, so custom tables exercise the
table parser harder than fixed Annex-K ones would). With the default
all-ones quantization tables the only loss is float DCT rounding —
and for images that are CONSTANT within each 8x8 block the round trip
is EXACT (DC-only blocks: AC coefficients are identically zero and the
DC path is integer end to end), which is what makes a hash-exact DuckDB
oracle possible (:func:`synth_jpeg` in ``multimodal``).

Scale shape: decoding is a per-payload Python kernel — it runs inside
``mapInPandas`` batches (see ``multimodal.image_features``) where the
unit of parallelism is the Spark partition; the kernel never sees more
than one payload at a time and holds one decoded image in memory.
"""

from __future__ import annotations

import struct

import numpy as np

# zigzag position -> raster index inside the 8x8 block (ITU-T81 fig. 5)
ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)


def _dct_basis() -> np.ndarray:
    """T[u, x] = 0.5 * C(u) * cos((2x+1) u pi / 16).

    Forward 2-D DCT of a block f: F = T @ f @ T.T; inverse: T.T @ F @ T.
    """
    u = np.arange(8, dtype=np.float64)[:, None]
    x = np.arange(8, dtype=np.float64)[None, :]
    t = 0.5 * np.cos((2.0 * x + 1.0) * u * np.pi / 16.0)
    t[0] *= 1.0 / np.sqrt(2.0)
    return t


_T = _dct_basis()


# ---------------------------------------------------------------------------
# bit I/O
# ---------------------------------------------------------------------------


class _BitReader:
    """Entropy-segment bit reader: 0xFF00 byte-unstuffing, explicit
    restart-marker consumption, hard error on any other marker inside
    entropy data (truncated/corrupt payloads fail loudly, they don't
    decode garbage)."""

    __slots__ = ("d", "i", "b", "n")

    def __init__(self, data: bytes, pos: int):
        self.d, self.i, self.b, self.n = data, pos, 0, 0

    def bit(self) -> int:
        if self.n == 0:
            d, i = self.d, self.i
            if i >= len(d):
                raise ValueError("jpeg: truncated entropy-coded segment")
            c = d[i]
            if c == 0xFF:
                nx = d[i + 1] if i + 1 < len(d) else None
                if nx != 0x00:
                    raise ValueError(
                        f"jpeg: marker 0xFF{nx:02X} inside entropy data"
                        if nx is not None else "jpeg: truncated after 0xFF"
                    )
                self.i = i + 2
            else:
                self.i = i + 1
            self.b, self.n = c, 8
        self.n -= 1
        return (self.b >> self.n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v

    def restart(self) -> None:
        """Byte-align, consume the RSTn marker (DC predictors reset by the
        caller)."""
        self.n = 0
        d, i = self.d, self.i
        if i + 1 >= len(d) or d[i] != 0xFF or not (0xD0 <= d[i + 1] <= 0xD7):
            raise ValueError("jpeg: expected restart marker")
        self.i = i + 2


class _BitWriter:
    __slots__ = ("out", "b", "n")

    def __init__(self):
        self.out = bytearray()
        self.b, self.n = 0, 0

    def write(self, value: int, length: int) -> None:
        for k in range(length - 1, -1, -1):
            self.b = (self.b << 1) | ((value >> k) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.b)
                if self.b == 0xFF:  # byte stuffing
                    self.out.append(0x00)
                self.b, self.n = 0, 0

    def flush(self) -> None:
        """Pad the final partial byte with 1-bits (ITU-T81 F.1.2.3)."""
        if self.n:
            self.write((1 << (8 - self.n)) - 1, 8 - self.n)


# ---------------------------------------------------------------------------
# Huffman tables
# ---------------------------------------------------------------------------


def _huff_decode_table(counts: list[int], symbols: bytes) -> dict:
    """(code_length, code) -> symbol, canonical assignment (ITU-T81 C.2)."""
    table: dict[tuple[int, int], int] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            table[(length, code)] = symbols[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _huff_read(r: _BitReader, table: dict) -> int:
    code, length = 0, 0
    while length < 16:
        code = (code << 1) | r.bit()
        length += 1
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("jpeg: invalid Huffman code")


def _extend(v: int, t: int) -> int:
    """DIFF/AC magnitude extension (ITU-T81 F.2.2.1)."""
    return v if t == 0 or v >= (1 << (t - 1)) else v - (1 << t) + 1


def _canonical_encode_table(syms: set[int]) -> tuple[list[int], bytes, dict]:
    """Uniform-length canonical Huffman table over exactly the symbols the
    image emits. Length L = ceil(log2(n+1)) leaves >= 1 unused slot, so no
    code is the all-ones pattern (ITU-T81 reserves it to keep entropy data
    free of 0xFF runs longer than stuffing handles). Returns (BITS counts,
    HUFFVAL bytes, symbol -> (code, length))."""
    ordered = sorted(syms)
    n = len(ordered)
    length = max(2, (n + 1 - 1).bit_length())  # 2^length >= n + 1
    counts = [0] * 16
    counts[length - 1] = n
    enc = {s: (i, length) for i, s in enumerate(ordered)}
    return counts, bytes(ordered), enc


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Decode a baseline JPEG to uint8 pixels: (h, w) for grayscale,
    (h, w, 3) RGB for YCbCr. Raises ``ValueError`` on corrupt payloads and
    ``NotImplementedError`` on progressive/arithmetic/12-bit/CMYK."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("jpeg: missing SOI marker")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict] = {}  # (class, id) -> decode table
    frame = None
    restart_interval = 0
    while pos < len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"jpeg: expected marker at byte {pos}")
        if pos + 1 >= len(payload):
            raise ValueError("jpeg: truncated stream after 0xFF")
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:  # TEM / bare RST
            continue
        if pos + 2 > len(payload):
            raise ValueError("jpeg: truncated segment header")
        (seg_len,) = struct.unpack(">H", payload[pos:pos + 2])
        seg = payload[pos + 2:pos + seg_len]
        if marker == 0xDB:  # DQT
            off = 0
            while off < len(seg):
                pq, tq = seg[off] >> 4, seg[off] & 15
                if pq != 0:
                    raise NotImplementedError("jpeg: 16-bit quant tables")
                qtables[tq] = np.frombuffer(
                    seg, dtype=np.uint8, count=64, offset=off + 1
                ).astype(np.int32)  # zigzag order, as stored
                off += 65
        elif marker == 0xC4:  # DHT
            off = 0
            while off < len(seg):
                tc, th = seg[off] >> 4, seg[off] & 15
                counts = list(seg[off + 1:off + 17])
                n = sum(counts)
                htables[(tc, th)] = _huff_decode_table(
                    counts, seg[off + 17:off + 17 + n])
                off += 17 + n
        elif marker in (0xC0, 0xC1):  # SOF0 baseline / SOF1 ext. sequential
            prec, h_img, w_img, ncomp = struct.unpack(">BHHB", seg[:6])
            if prec != 8:
                raise NotImplementedError("jpeg: only 8-bit precision")
            if ncomp not in (1, 3):
                raise NotImplementedError(
                    f"jpeg: {ncomp}-component images (CMYK?) unsupported")
            comps = []
            for c in range(ncomp):
                cid, hv, tq = seg[6 + 3 * c:9 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 15,
                              "tq": tq})
            frame = {"w": w_img, "h": h_img, "comps": comps}
        elif marker == 0xC2:
            raise NotImplementedError(
                "jpeg: progressive (SOF2) not supported; baseline only")
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"jpeg: SOF marker 0xFF{marker:02X} (non-baseline coding)")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("jpeg: SOS before SOF")
            ns = seg[0]
            if ns != len(frame["comps"]):
                raise NotImplementedError(
                    "jpeg: non-interleaved multi-scan baseline")
            sel = {}
            for c in range(ns):
                cs, tdta = seg[1 + 2 * c:3 + 2 * c]
                sel[cs] = (tdta >> 4, tdta & 15)
            planes = _decode_scan(
                payload, pos + seg_len, frame, sel, qtables, htables,
                restart_interval,
            )
            return _to_pixels(frame, planes)
        pos += seg_len
    raise ValueError("jpeg: no scan data found")


def _decode_scan(data, pos, frame, sel, qtables, htables, ri):
    comps = frame["comps"]
    h_max = max(c["h"] for c in comps)
    v_max = max(c["v"] for c in comps)
    mcux = -(-frame["w"] // (8 * h_max))
    mcuy = -(-frame["h"] // (8 * v_max))
    planes = []
    for c in comps:
        planes.append(np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8),
                               dtype=np.float64))
    r = _BitReader(data, pos)
    pred = [0] * len(comps)
    n_mcu = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if ri and n_mcu and n_mcu % ri == 0:
                r.restart()
                pred = [0] * len(comps)
            for ci, c in enumerate(comps):
                dc_t, ac_t = sel[c["id"]]
                dc_tab = htables[(0, dc_t)]
                ac_tab = htables[(1, ac_t)]
                q = qtables[c["tq"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        zz = np.zeros(64, dtype=np.int64)
                        t = _huff_read(r, dc_tab)
                        diff = _extend(r.bits(t), t) if t else 0
                        pred[ci] += diff
                        zz[0] = pred[ci]
                        k = 1
                        while k < 64:
                            rs = _huff_read(r, ac_tab)
                            rrrr, ssss = rs >> 4, rs & 15
                            if ssss == 0:
                                if rrrr == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += rrrr
                            if k > 63:
                                raise ValueError("jpeg: AC index overflow")
                            zz[k] = _extend(r.bits(ssss), ssss)
                            k += 1
                        block = np.zeros(64, dtype=np.float64)
                        block[ZIGZAG] = zz * q
                        f = _T.T @ block.reshape(8, 8) @ _T
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[ci][y0:y0 + 8, x0:x0 + 8] = f
            n_mcu += 1
    return planes


def _to_pixels(frame, planes):
    comps = frame["comps"]
    h_max = max(c["h"] for c in comps)
    v_max = max(c["v"] for c in comps)
    w, h = frame["w"], frame["h"]
    full = []
    for c, p in zip(comps, planes):
        if c["h"] != h_max or c["v"] != v_max:  # nearest-neighbour upsample
            p = np.repeat(np.repeat(p, v_max // c["v"], axis=0),
                          h_max // c["h"], axis=1)
        full.append(p[:h, :w] + 128.0)
    if len(full) == 1:
        return np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
    y, cb, cr = full
    cb, cr = cb - 128.0, cr - 128.0
    rgb = np.stack([
        y + 1.402 * cr,
        y - 0.344136 * cb - 0.714136 * cr,
        y + 1.772 * cb,
    ], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------


def _forward_blocks(plane: np.ndarray, q: np.ndarray) -> np.ndarray:
    """(h, w) float64 plane (already level-shifted) -> (n_blocks, 64) int64
    quantized coefficients in zigzag order, blocks in raster order."""
    h, w = plane.shape
    blocks = (
        plane.reshape(h // 8, 8, w // 8, 8)
        .transpose(0, 2, 1, 3)
        .reshape(-1, 8, 8)
    )
    coefs = np.einsum("ux,nxy,vy->nuv", _T, blocks, _T)
    zz = coefs.reshape(-1, 64)[:, ZIGZAG]
    return np.round(zz / q[None, :]).astype(np.int64)


def _pad_to(plane: np.ndarray, mult: int) -> np.ndarray:
    h, w = plane.shape
    ph, pw = -(-h // mult) * mult, -(-w // mult) * mult
    if (ph, pw) == (h, w):
        return plane
    return np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge")


def _symbolize(zz: np.ndarray, pred: int) -> tuple[list, int]:
    """One quantized zigzag block -> [(kind, symbol, extra_val, extra_len)]
    entropy tokens; returns (tokens, new DC predictor)."""
    toks = []
    diff = int(zz[0]) - pred
    mag = abs(diff)
    t = mag.bit_length()
    v = diff if diff >= 0 else diff + (1 << t) - 1
    toks.append(("dc", t, v, t))
    run = 0
    last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
    for k in range(1, 64):
        c = int(zz[k])
        if c == 0:
            if k > last_nz:
                toks.append(("ac", 0x00, 0, 0))  # EOB
                break
            run += 1
            if run == 16:
                toks.append(("ac", 0xF0, 0, 0))  # ZRL
                run = 0
            continue
        s = abs(c).bit_length()
        v = c if c >= 0 else c + (1 << s) - 1
        toks.append(("ac", (run << 4) | s, v, s))
        run = 0
    return toks, int(zz[0])


def encode_jpeg(
    img: np.ndarray,
    *,
    qtable: np.ndarray | None = None,
    subsample: str = "4:4:4",
    restart_interval: int = 0,
) -> bytes:
    """Baseline JPEG encode of uint8 pixels — (h, w) grayscale or
    (h, w, 3) RGB. Default quantization is all-ones (near-lossless: the
    only loss is DCT float rounding; constant 8x8 blocks round-trip
    exactly). ``subsample='4:2:0'`` averages chroma 2x2 (exercises the
    decoder's upsampling path); ``restart_interval`` emits DRI + RSTn
    markers every N MCUs (exercises predictor resets)."""
    if img.dtype != np.uint8:
        raise ValueError("encode_jpeg expects uint8 pixels")
    q = (np.ones(64, dtype=np.int64) if qtable is None
         else np.asarray(qtable, dtype=np.int64))
    gray = img.ndim == 2
    h_img, w_img = img.shape[:2]
    if gray:
        comps = [{"id": 1, "h": 1, "v": 1, "tq": 0}]
        planes = [_pad_to(img.astype(np.float64) - 128.0, 8)]
    else:
        if subsample not in ("4:4:4", "4:2:0"):
            raise ValueError("subsample must be '4:4:4' or '4:2:0'")
        sub = 2 if subsample == "4:2:0" else 1
        r = img[..., 0].astype(np.float64)
        g = img[..., 1].astype(np.float64)
        b = img[..., 2].astype(np.float64)
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        y = _pad_to(y, 8 * sub)
        cb, cr = _pad_to(cb, 8 * sub), _pad_to(cr, 8 * sub)
        if sub == 2:
            cb = cb.reshape(cb.shape[0] // 2, 2, cb.shape[1] // 2, 2).mean(
                axis=(1, 3))
            cr = cr.reshape(cr.shape[0] // 2, 2, cr.shape[1] // 2, 2).mean(
                axis=(1, 3))
        comps = [
            {"id": 1, "h": sub, "v": sub, "tq": 0},
            {"id": 2, "h": 1, "v": 1, "tq": 0},
            {"id": 3, "h": 1, "v": 1, "tq": 0},
        ]
        planes = [y - 128.0, cb - 128.0, cr - 128.0]

    h_max = max(c["h"] for c in comps)
    v_max = max(c["v"] for c in comps)
    mcux = planes[0].shape[1] // (8 * h_max)
    mcuy = planes[0].shape[0] // (8 * v_max)
    blocks = [_forward_blocks(p, q) for p in planes]
    widths = [p.shape[1] // 8 for p in planes]

    # pass 1: tokenize in scan order, collect DC/AC symbol sets
    def scan_tokens():
        pred = [0] * len(comps)
        n_mcu = 0
        for my in range(mcuy):
            for mx in range(mcux):
                if restart_interval and n_mcu and n_mcu % restart_interval == 0:
                    yield ("rst", (n_mcu // restart_interval - 1) % 8, 0, 0)
                    pred[:] = [0] * len(comps)
                for ci, c in enumerate(comps):
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            bi = (my * c["v"] + by) * widths[ci] + (
                                mx * c["h"] + bx)
                            toks, pred[ci] = _symbolize(
                                blocks[ci][bi], pred[ci])
                            yield from toks
                n_mcu += 1

    dc_syms, ac_syms = set(), set()
    for kind, sym, _v, _l in scan_tokens():
        if kind == "dc":
            dc_syms.add(sym)
        elif kind == "ac":
            ac_syms.add(sym)
    dc_counts, dc_vals, dc_enc = _canonical_encode_table(dc_syms or {0})
    ac_counts, ac_vals, ac_enc = _canonical_encode_table(ac_syms or {0})

    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" \
        + struct.pack(">HHBB", 1, 1, 0, 0)  # APP0, 1:1 aspect, no thumb
    out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([0]) \
        + q.astype(np.uint8).tobytes()  # DQT id 0, zigzag order
    sof = struct.pack(">BHHB", 8, h_img, w_img, len(comps))
    for c in comps:
        sof += bytes([c["id"], (c["h"] << 4) | c["v"], c["tq"]])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    for tc, counts, vals in ((0, dc_counts, dc_vals), (1, ac_counts, ac_vals)):
        seg = bytes([tc << 4]) + bytes(counts) + vals
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(seg)) + seg
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    sos = bytes([len(comps)])
    for c in comps:
        sos += bytes([c["id"], 0x00])  # DC table 0, AC table 0
    sos += b"\x00\x3f\x00"
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

    w = _BitWriter()
    for kind, sym, val, vlen in scan_tokens():
        if kind == "rst":
            w.flush()
            out += w.out
            out += bytes([0xFF, 0xD0 + sym])
            w = _BitWriter()
            continue
        code, length = (dc_enc if kind == "dc" else ac_enc)[sym]
        w.write(code, length)
        if vlen:
            w.write(val, vlen)
    w.flush()
    out += w.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)
