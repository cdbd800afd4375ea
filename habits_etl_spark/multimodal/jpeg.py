"""JPEG codec (baseline sequential + progressive), pure stdlib +
numpy — the third REAL image container for the multimodal pipeline
(after BMP and PNG), so image-kind payloads never hit a decode stub.

Decoder (ITU-T T.81 DCT, Huffman):
- marker walk (APPn/COM skipped), multi-table DQT/DHT segments, SOF0
  baseline and SOF2 progressive frames, DRI restart intervals, RSTn
  handling with DC-predictor reset;
- Huffman tables are read from the FILE's DHT segments (so third-party
  JPEGs decode too, not only our own), canonical-code reconstruction
  per T.81 Annex C;
- entropy decode with FF00 byte-unstuffing, DC prediction + magnitude
  extension, AC run/size with ZRL and EOB;
- progressive (r8): every scan's spectral-selection + successive-
  approximation pass (DC first/refine, AC first/refine with EOBn run
  codes, T.81 Annex G / the jdphuff control structure) accumulates
  into per-component coefficient arrays; dequantize + IDCT run once;
- dequantize -> inverse zigzag -> float IDCT (8x8 DCT-II basis matrix,
  the textbook orthonormal form) -> level shift -> per-component planes
  with integer-ratio chroma upsampling -> JFIF YCbCr->RGB.
- Unsupported shapes return None rather than mis-parse: extended-
  sequential/lossless/hierarchical frame classes, 12-bit precision,
  non-integer sampling ratios, arithmetic coding.

Encoder (what the synthetic generator and tests feed the decoder):
- 4:4:4 / 4:2:0 (or single-component grayscale), quality-scaled
  standard quantization tables (the libjpeg 5000/q | 200-2q scaling),
  float FDCT, and SELF-BUILT flat canonical Huffman tables (all DC
  symbols at 4 bits, all 162 AC symbols at 8 bits — valid prefix codes
  with the all-ones code unused, carried in DHT like any other table).
  Flat tables trade a few percent of compression for a table spec that
  is trivially auditable; decode correctness never depends on table
  choice because the decoder always reads tables from the stream.
- ``progressive=True`` emits a SOF2 scan script covering all four
  progressive pass kinds (see encode_jpeg), so the progressive decoder
  round-trips bit-identically against the baseline decode of the same
  quantized coefficients.

Round-trip is LOSSY by design (quantization); tests assert exact
dimensions, bounded pixel error, and determinism, not bit-identity.
"""

from __future__ import annotations

import math
import struct

import numpy as np

# --- shared constants ---------------------------------------------------------


def _zigzag_order() -> np.ndarray:
    """Natural (row-major) index of the k-th zigzag coefficient, generated
    by the diagonal walk (even diagonals run bottom-left -> top-right)."""
    order = []
    for s in range(15):
        diag = [(i, s - i) for i in range(max(0, s - 7), min(s, 7) + 1)]
        if s % 2 == 0:
            diag.reverse()
        order.extend(i * 8 + j for i, j in diag)
    return np.array(order, dtype=np.int64)


_ZZ = _zigzag_order()

# Standard quantization tables (ITU-T T.81 Annex K.1) — carried in DQT,
# so they are a starting point for quality scaling, not an interop need.
_QUANT_LUMA = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.int32,
)
_QUANT_CHROMA = np.array(
    [
        [17, 18, 24, 47, 99, 99, 99, 99],
        [18, 21, 26, 66, 99, 99, 99, 99],
        [24, 26, 56, 99, 99, 99, 99, 99],
        [47, 66, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
    ],
    dtype=np.int32,
)

# Orthonormal 8-point DCT-II basis: C[k,n] = a(k) cos((2n+1)k pi/16);
# FDCT(f) = C f C^T, IDCT(F) = C^T F C.
_C = np.array(
    [
        [
            (math.sqrt(1.0 / 8.0) if k == 0 else 0.5)
            * math.cos((2 * n + 1) * k * math.pi / 16.0)
            for n in range(8)
        ]
        for k in range(8)
    ]
)

# Encoder Huffman specs: flat canonical tables (see module docstring).
# DC: categories 0-11 at 4 bits; AC: EOB, ZRL and every (run 0-15,
# size 1-10) at 8 bits. 162 < 255 leaves the all-ones code unused.
_DC_SYMBOLS = list(range(12))
_AC_SYMBOLS = [0x00, 0xF0] + [
    (r << 4) | s for r in range(16) for s in range(1, 11)
]


def _flat_bits(n_symbols: int, length: int) -> list[int]:
    bits = [0] * 16
    bits[length - 1] = n_symbols
    return bits


_DC_BITS = _flat_bits(len(_DC_SYMBOLS), 4)
_AC_BITS = _flat_bits(len(_AC_SYMBOLS), 8)


def _canonical_codes(bits: list[int], symbols: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length), T.81 Annex C code assignment."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[symbols[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _canonical_decoder(bits: list[int], symbols: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol, for bit-serial decode."""
    out: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[(length, code)] = symbols[k]
            code += 1
            k += 1
        code <<= 1
    return out


class _JpegError(Exception):
    pass


# --- bit I/O ------------------------------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            b = (self.acc >> (self.n - 8)) & 0xFF
            self.buf.append(b)
            if b == 0xFF:  # byte stuffing
                self.buf.append(0x00)
            self.n -= 8
            self.acc &= (1 << self.n) - 1

    def flush(self) -> None:
        if self.n:
            pad = 8 - self.n
            b = ((self.acc << pad) | ((1 << pad) - 1)) & 0xFF
            self.buf.append(b)
            if b == 0xFF:
                self.buf.append(0x00)
            self.acc = 0
            self.n = 0


class _BitReader:
    """Entropy-segment reader with FF00 unstuffing; raises _JpegError on
    hitting a marker (the scan loop handles RSTn itself via restart())."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0

    def read_bit(self) -> int:
        if self.n == 0:
            if self.pos >= len(self.data):
                raise _JpegError("EOF in entropy data")
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                nxt = self.data[self.pos] if self.pos < len(self.data) else -1
                if nxt == 0x00:
                    self.pos += 1
                else:
                    raise _JpegError("marker inside entropy data")
            self.acc = b
            self.n = 8
        self.n -= 1
        return (self.acc >> self.n) & 1

    def read_bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.read_bit()
        return v

    def restart(self, expected: int) -> None:
        """Byte-align and consume the expected RSTn marker."""
        self.n = 0
        if (
            self.pos + 2 > len(self.data)
            or self.data[self.pos] != 0xFF
            or self.data[self.pos + 1] != 0xD0 + expected
        ):
            raise _JpegError("missing restart marker")
        self.pos += 2


def _read_huff(br: _BitReader, dec: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.read_bit()
        sym = dec.get((length, code))
        if sym is not None:
            return sym
    raise _JpegError("invalid Huffman code")


def _extend(raw: int, ssss: int) -> int:
    """DC/AC magnitude extension (T.81 F.2.2.1)."""
    if ssss == 0:
        return 0
    return raw if raw >= (1 << (ssss - 1)) else raw - (1 << ssss) + 1


# --- encoder ------------------------------------------------------------------


def _scale_quant(base: np.ndarray, quality: int) -> np.ndarray:
    quality = min(100, max(1, int(quality)))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int32)


def _rgb_to_ycbcr(arr: np.ndarray) -> list[np.ndarray]:
    r = arr[:, :, 0].astype(np.float64)
    g = arr[:, :, 1].astype(np.float64)
    b = arr[:, :, 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return [y, cb, cr]


def _encode_block(
    bw: _BitWriter,
    block: np.ndarray,
    qtab: np.ndarray,
    dc_codes: dict[int, tuple[int, int]],
    ac_codes: dict[int, tuple[int, int]],
    pred: int,
) -> int:
    coef = _C @ (block - 128.0) @ _C.T
    q = np.rint(coef / qtab).astype(np.int64)
    zz = q.reshape(64)[_ZZ]
    dc = int(zz[0])
    diff = dc - pred
    s = abs(diff).bit_length()
    code, length = dc_codes[s]
    bw.write(code, length)
    if s:
        bw.write(diff if diff > 0 else diff + (1 << s) - 1, s)
    run = 0
    nz = np.nonzero(zz[1:])[0]
    last = int(nz[-1]) + 1 if nz.size else 0
    for k in range(1, last + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_codes[0xF0]  # ZRL
            bw.write(code, length)
            run -= 16
        s = abs(v).bit_length()
        code, length = ac_codes[(run << 4) | s]
        bw.write(code, length)
        bw.write(v if v > 0 else v + (1 << s) - 1, s)
        run = 0
    if last < 63:
        code, length = ac_codes[0x00]  # EOB
        bw.write(code, length)
    return dc


def _pad_to(p: np.ndarray, ph: int, pw: int) -> np.ndarray:
    """Edge-replicate to (ph, pw)."""
    h, w = p.shape
    pp = np.empty((ph, pw))
    pp[:h, :w] = p
    if ph > h:
        pp[h:, :w] = p[h - 1 : h, :]
    if pw > w:
        pp[:, w:] = pp[:, w - 1 : w]
    return pp


def encode_jpeg(
    arr: np.ndarray,
    quality: int = 90,
    subsample: bool = False,
    restart_interval: int = 0,
    progressive: bool = False,
) -> bytes:
    """uint8 image -> JFIF bytes. Accepts (h, w) grayscale (one
    component) or (h, w, 3) RGB (YCbCr). ``subsample=True`` emits 4:2:0
    (luma 2x2, chroma 2x2-averaged) instead of 4:4:4, and
    ``restart_interval`` > 0 emits DRI + RSTn markers every that many
    MCUs — both exist so the decoder's general MCU geometry, chroma
    upsampling and restart paths are exercised by our own streams, not
    only by third-party files. ``progressive=True`` emits SOF2 with a
    spectral-selection + successive-approximation scan script (DC at
    Al=1, DC refinement, per-component AC first at Al=1, per-component
    AC refinement) so all four progressive decode passes round-trip
    against our own streams. Deterministic for given arguments."""
    if progressive and restart_interval:
        raise ValueError("restart_interval is not supported with progressive")
    gray = arr.ndim == 2
    h, w = arr.shape[:2]
    planes = [arr.astype(np.float64)] if gray else _rgb_to_ycbcr(arr)
    qtabs = [_scale_quant(_QUANT_LUMA, quality)]
    if not gray:
        qtabs.append(_scale_quant(_QUANT_CHROMA, quality))
    # per-component sampling factors (h, v)
    if gray:
        samp = [(1, 1)]
    elif subsample:
        samp = [(2, 2), (1, 1), (1, 1)]
        # 2x2 box-average chroma over an even-padded plane
        eh, ew = (h + 1) // 2 * 2, (w + 1) // 2 * 2
        for c in (1, 2):
            p = _pad_to(planes[c], eh, ew)
            planes[c] = (
                p.reshape(eh // 2, 2, ew // 2, 2).mean(axis=(1, 3))
            )
    else:
        samp = [(1, 1), (1, 1), (1, 1)]
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    nc = len(planes)

    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + bytes(
        [1, 1, 0]
    ) + struct.pack(">HH", 1, 1) + bytes([0, 0])
    for tq, qtab in enumerate(qtabs):
        out += b"\xff\xdb" + struct.pack(">H", 2 + 65) + bytes([tq])
        out += bytes(int(x) for x in qtab.reshape(64)[_ZZ])
    out += (b"\xff\xc2" if progressive else b"\xff\xc0") + struct.pack(
        ">HBHHB", 8 + 3 * nc, 8, h, w, nc
    )
    for c in range(nc):
        out += bytes(
            [c + 1, (samp[c][0] << 4) | samp[c][1], 0 if c == 0 else 1]
        )
    for tc, (bits, syms) in ((0, (_DC_BITS, _DC_SYMBOLS)), (1, (_AC_BITS, _AC_SYMBOLS))):
        out += b"\xff\xc4" + struct.pack(">H", 2 + 1 + 16 + len(syms))
        out += bytes([tc << 4]) + bytes(bits) + bytes(syms)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)

    dc_codes = _canonical_codes(_DC_BITS, _DC_SYMBOLS)
    ac_codes = _canonical_codes(_AC_BITS, _AC_SYMBOLS)
    padded = [
        _pad_to(planes[c], mcuy * 8 * samp[c][1], mcux * 8 * samp[c][0])
        for c in range(nc)
    ]
    if progressive:
        out += _encode_progressive_scans(
            padded, samp, qtabs, nc, mcux, mcuy, dc_codes, ac_codes,
            w, h, hmax, vmax,
        )
        out += b"\xff\xd9"  # EOI
        return bytes(out)
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * nc, nc)
    for c in range(nc):
        out += bytes([c + 1, 0x00])  # DC table 0, AC table 0 for all comps
    out += bytes([0, 63, 0])
    bw = _BitWriter()
    preds = [0] * nc
    rst = 0
    n_mcu = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and n_mcu and n_mcu % restart_interval == 0:
                bw.flush()
                bw.buf += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) & 7
                preds = [0] * nc
            for c in range(nc):
                ch, cv = samp[c]
                qtab = qtabs[0] if c == 0 else qtabs[1]
                for by in range(cv):
                    for bx in range(ch):
                        y0 = (my * cv + by) * 8
                        x0 = (mx * ch + bx) * 8
                        preds[c] = _encode_block(
                            bw,
                            padded[c][y0 : y0 + 8, x0 : x0 + 8],
                            qtab,
                            dc_codes,
                            ac_codes,
                            preds[c],
                        )
            n_mcu += 1
    bw.flush()
    out += bw.buf
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# --- decoder ------------------------------------------------------------------


def _decode_block(
    br: _BitReader,
    dc_dec: dict[tuple[int, int], int],
    ac_dec: dict[tuple[int, int], int],
    pred: int,
) -> tuple[np.ndarray, int]:
    zz = np.zeros(64, dtype=np.int64)
    s = _read_huff(br, dc_dec)
    if s > 15:  # T.81 F.1.2.1: DC size categories stop at 15; a corrupt
        raise _JpegError("bad DC size")  # DHT symbol must not drive read_bits
    dc = pred + _extend(br.read_bits(s), s)
    zz[0] = dc
    k = 1
    while k < 64:
        rs = _read_huff(br, ac_dec)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            break  # EOB
        k += r
        if k > 63:
            raise _JpegError("AC index out of range")
        zz[k] = _extend(br.read_bits(s), s)
        k += 1
    return zz, dc


def decode_jpeg(data: bytes) -> np.ndarray | None:
    """JPEG (baseline SOF0 or progressive SOF2) -> HxWx3 uint8 RGB array
    (grayscale replicated), or None if the payload is not a JPEG this
    parser supports (extended-sequential / lossless / 12-bit /
    arithmetic / fractional sampling return None rather than
    mis-parse)."""
    try:
        return _decode_jpeg(data)
    except (
        _JpegError,
        struct.error,
        IndexError,
        ValueError,
        MemoryError,
        OverflowError,
    ):
        # MemoryError: the geometry cap bounds declared dims, but any
        # allocator failure on untrusted bytes must still degrade to
        # None, never crash the Arrow UDF task. OverflowError: a corrupt
        # stream could otherwise push an unbounded Python int into an
        # int64 coefficient slot (found by mutation fuzzing; the DC-size
        # guard closes the known path, this closes the class).
        return None


def _decode_jpeg(data: bytes) -> np.ndarray | None:
    if len(data) < 4 or data[0:2] != b"\xff\xd8":
        return None
    pos = 2
    qt: dict[int, np.ndarray] = {}
    dc_dec: dict[int, dict] = {}
    ac_dec: dict[int, dict] = {}
    comps: list[dict] | None = None
    w = h = 0
    restart_interval = 0
    progressive = False
    while pos + 2 <= len(data):
        if data[pos] != 0xFF:
            return None
        marker = data[pos + 1]
        if marker == 0xD9:  # EOI before any scan
            return None
        if marker in (0x01,) or 0xD0 <= marker <= 0xD8:
            pos += 2
            continue
        if pos + 4 > len(data):
            return None
        (seg_len,) = struct.unpack_from(">H", data, pos + 2)
        seg = data[pos + 4 : pos + 2 + seg_len]
        if len(seg) != seg_len - 2:
            return None
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0x0F
                if pq != 0 or i + 65 > len(seg):
                    return None  # 8-bit tables only
                tbl = np.frombuffer(seg, np.uint8, 64, i + 1).astype(np.int64)
                nat = np.zeros(64, dtype=np.int64)
                nat[_ZZ] = tbl
                qt[tq] = nat.reshape(8, 8)
                i += 65
        elif marker == 0xC4:  # DHT (possibly several tables per segment)
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0x0F
                bits = list(seg[i + 1 : i + 17])
                n = sum(bits)
                syms = list(seg[i + 17 : i + 17 + n])
                if len(syms) != n:
                    return None
                dec = _canonical_decoder(bits, syms)
                (dc_dec if tc == 0 else ac_dec)[th] = dec
                i += 17 + n
        elif marker in (0xC0, 0xC2):  # SOF0 baseline / SOF2 progressive
            progressive = marker == 0xC2
            prec, h, w, nc = struct.unpack_from(">BHHB", seg, 0)
            if prec != 8 or h == 0 or w == 0 or nc not in (1, 3):
                return None
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c : 9 + 3 * c]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq}
                )
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            return None  # extended/lossless/arithmetic frame classes
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:  # SOS
            if comps is None:
                return None
            if progressive:
                return _decode_progressive(
                    data, pos, w, h, comps, qt, dc_dec, ac_dec,
                    restart_interval,
                )
            ns = seg[0]
            if ns != len(comps):
                return None
            for c in range(ns):
                cid, tdta = seg[1 + 2 * c : 3 + 2 * c]
                comp = next((x for x in comps if x["id"] == cid), None)
                if comp is None:
                    return None
                comp["td"], comp["ta"] = tdta >> 4, tdta & 0x0F
            return _decode_scan(
                data,
                pos + 2 + seg_len,
                w,
                h,
                comps,
                qt,
                dc_dec,
                ac_dec,
                restart_interval,
            )
        pos += 2 + seg_len
    return None


def _decode_scan(
    data: bytes,
    scan_pos: int,
    w: int,
    h: int,
    comps: list[dict],
    qt: dict[int, np.ndarray],
    dc_dec: dict[int, dict],
    ac_dec: dict[int, dict],
    restart_interval: int,
) -> np.ndarray:
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    # T.81 B.2.2 bounds sampling factors to 1-4; enforce BEFORE sizing any
    # allocation so a forged header can't request a multi-GiB plane.
    if hmax < 1 or vmax < 1 or hmax > 4 or vmax > 4 or any(
        c["h"] < 1 or c["v"] < 1 or hmax % c["h"] or vmax % c["v"] for c in comps
    ):
        raise _JpegError("unsupported sampling")
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    # Untrusted-payload geometry cap: header-declared dims drive the plane
    # allocations below, so bound the total float64 footprint (all planes +
    # the upsampled copies, <= 3x plane bytes) before touching numpy. 256 MB
    # covers any plausible corpus image; a forged 65500x65500 header is
    # rejected here instead of raising MemoryError inside an Arrow UDF task.
    plane_bytes = sum(
        (mcuy * 8 * c["v"]) * (mcux * 8 * c["h"]) * 8 for c in comps
    )
    if plane_bytes > 256 << 20:
        raise _JpegError("declared geometry exceeds decode budget")
    planes = [
        np.zeros((mcuy * 8 * c["v"], mcux * 8 * c["h"]), dtype=np.float64)
        for c in comps
    ]
    br = _BitReader(data, scan_pos)
    preds = [0] * len(comps)
    rst = 0
    n_mcu = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and n_mcu and n_mcu % restart_interval == 0:
                br.restart(rst)
                rst = (rst + 1) & 7
                preds = [0] * len(comps)
            for ci, c in enumerate(comps):
                q = qt.get(c["tq"])
                dd = dc_dec.get(c.get("td", 0))
                ad = ac_dec.get(c.get("ta", 0))
                if q is None or dd is None or ad is None:
                    raise _JpegError("missing table")
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        zz, preds[ci] = _decode_block(br, dd, ad, preds[ci])
                        nat = np.zeros(64, dtype=np.int64)
                        nat[_ZZ] = zz
                        block = _C.T @ (nat.reshape(8, 8) * q).astype(np.float64) @ _C
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = block + 128.0
            n_mcu += 1
    return _planes_to_rgb(planes, comps, hmax, vmax, w, h)


def _planes_to_rgb(
    planes: list[np.ndarray],
    comps: list[dict],
    hmax: int,
    vmax: int,
    w: int,
    h: int,
) -> np.ndarray:
    """Integer-ratio chroma upsample + crop + JFIF YCbCr->RGB (shared by
    the sequential and progressive decode paths)."""
    full = []
    for ci, c in enumerate(comps):
        p = planes[ci]
        p = np.repeat(np.repeat(p, vmax // c["v"], axis=0), hmax // c["h"], axis=1)
        full.append(p[:h, :w])
    if len(full) == 1:
        g = np.clip(np.rint(full[0]), 0, 255).astype(np.uint8)
        return np.ascontiguousarray(g[..., None].repeat(3, axis=-1))
    y, cb, cr = full
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=-1)
    return np.ascontiguousarray(np.clip(np.rint(rgb), 0, 255).astype(np.uint8))


# --- progressive decoder (ITU-T T.81 Annex G, Huffman) ------------------------


def _decode_progressive(
    data: bytes,
    pos: int,
    w: int,
    h: int,
    comps: list[dict],
    qt: dict[int, np.ndarray],
    dc_dec: dict[int, dict],
    ac_dec: dict[int, dict],
    restart_interval: int,
) -> np.ndarray:
    """Progressive DCT decode: walk every scan from the first SOS to EOI,
    accumulating spectral-selection + successive-approximation passes
    (T.81 G.1.2, the jdphuff control structure) into per-component
    zigzag coefficient arrays; dequantize + IDCT once at the end.
    ``pos`` points at the first SOS marker's 0xFF."""
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if hmax < 1 or vmax < 1 or hmax > 4 or vmax > 4 or any(
        c["h"] < 1 or c["v"] < 1 or hmax % c["h"] or vmax % c["v"] for c in comps
    ):
        raise _JpegError("unsupported sampling")
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    # Same untrusted-geometry budget as the sequential path: coefficient
    # arrays are int64[bh][bw][64], planes come later at the same order
    # of magnitude — bound both before any allocation.
    coef_bytes = sum(
        (mcuy * c["v"]) * (mcux * c["h"]) * 64 * 8 for c in comps
    )
    if coef_bytes > 256 << 20:
        raise _JpegError("declared geometry exceeds decode budget")
    for c in comps:
        c["bh"] = mcuy * c["v"]
        c["bw"] = mcux * c["h"]
        # non-interleaved scans code only the blocks covering the
        # component's actual samples (T.81 A.2.2), not the MCU padding
        c["bhu"] = (-(-h * c["v"] // vmax) + 7) // 8
        c["bwu"] = (-(-w * c["h"] // hmax) + 7) // 8
    coefs = [
        np.zeros((c["bh"], c["bw"], 64), dtype=np.int64) for c in comps
    ]
    saw_scan = False
    while pos + 2 <= len(data):
        if data[pos] != 0xFF:
            raise _JpegError("bad marker alignment between scans")
        marker = data[pos + 1]
        if marker == 0xD9:  # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if pos + 4 > len(data):
            raise _JpegError("truncated segment")
        (seg_len,) = struct.unpack_from(">H", data, pos + 2)
        seg = data[pos + 4 : pos + 2 + seg_len]
        if len(seg) != seg_len - 2:
            raise _JpegError("truncated segment")
        if marker == 0xDB:
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0x0F
                if pq != 0 or i + 65 > len(seg):
                    raise _JpegError("bad DQT")
                tbl = np.frombuffer(seg, np.uint8, 64, i + 1).astype(np.int64)
                nat = np.zeros(64, dtype=np.int64)
                nat[_ZZ] = tbl
                qt[tq] = nat.reshape(8, 8)
                i += 65
        elif marker == 0xC4:
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0x0F
                bits = list(seg[i + 1 : i + 17])
                n = sum(bits)
                syms = list(seg[i + 17 : i + 17 + n])
                if len(syms) != n:
                    raise _JpegError("bad DHT")
                dec = _canonical_decoder(bits, syms)
                (dc_dec if tc == 0 else ac_dec)[th] = dec
                i += 17 + n
        elif marker == 0xDD:
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:
            ns = seg[0]
            if ns < 1 or len(seg) != 4 + 2 * ns:
                raise _JpegError("bad SOS")
            scomps = []
            for i in range(ns):
                cid, tdta = seg[1 + 2 * i], seg[2 + 2 * i]
                ci = next(
                    (j for j, c in enumerate(comps) if c["id"] == cid), None
                )
                if ci is None:
                    raise _JpegError("SOS names unknown component")
                comps[ci]["td"] = tdta >> 4
                comps[ci]["ta"] = tdta & 0x0F
                scomps.append(ci)
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ahal = seg[3 + 2 * ns]
            ah, al = ahal >> 4, ahal & 0x0F
            pos = _decode_prog_scan(
                data, pos + 2 + seg_len, coefs, comps, scomps,
                ss, se, ah, al, dc_dec, ac_dec, restart_interval,
                mcux, mcuy,
            )
            saw_scan = True
            continue
        pos += 2 + seg_len
    if not saw_scan:
        raise _JpegError("no scan in progressive stream")
    planes = []
    for ci, c in enumerate(comps):
        q = qt.get(c["tq"])
        if q is None:
            raise _JpegError("missing quant table")
        nat = np.zeros((c["bh"], c["bw"], 64), dtype=np.float64)
        nat[:, :, _ZZ] = coefs[ci]
        blocks = nat.reshape(c["bh"], c["bw"], 8, 8) * q[None, None]
        spat = np.einsum("ij,abjk,kl->abil", _C.T, blocks, _C) + 128.0
        planes.append(
            spat.transpose(0, 2, 1, 3).reshape(c["bh"] * 8, c["bw"] * 8)
        )
    return _planes_to_rgb(planes, comps, hmax, vmax, w, h)


def _decode_prog_scan(
    data: bytes,
    pos: int,
    coefs: list[np.ndarray],
    comps: list[dict],
    scomps: list[int],
    ss: int,
    se: int,
    ah: int,
    al: int,
    dc_dec: dict[int, dict],
    ac_dec: dict[int, dict],
    restart_interval: int,
    mcux: int,
    mcuy: int,
) -> int:
    """Decode ONE progressive scan's entropy data; returns the byte
    position of the next marker after the scan."""
    br = _BitReader(data, pos)
    rst = 0
    if ss == 0:  # DC scan (first or refinement), possibly interleaved
        if se != 0 or al > 13 or (ah and ah != al + 1):
            raise _JpegError("bad DC scan parameters")
        preds = {ci: 0 for ci in scomps}
        n_unit = 0

        def dc_block(ci: int, by: int, bx: int) -> None:
            zz = coefs[ci][by, bx]
            if ah == 0:
                dd = dc_dec.get(comps[ci].get("td", 0))
                if dd is None:
                    raise _JpegError("missing DC table")
                s = _read_huff(br, dd)
                if s > 15:  # corrupt DHT symbol (see _decode_block)
                    raise _JpegError("bad DC size")
                preds[ci] += _extend(br.read_bits(s), s)
                zz[0] = preds[ci] << al
            else:  # refinement: one raw bit per block
                if br.read_bit():
                    zz[0] = int(zz[0]) | (1 << al)

        if len(scomps) > 1:  # interleaved: MCU order over the full grid
            for my in range(mcuy):
                for mx in range(mcux):
                    if (
                        restart_interval
                        and n_unit
                        and n_unit % restart_interval == 0
                    ):
                        br.restart(rst)
                        rst = (rst + 1) & 7
                        preds = {ci: 0 for ci in scomps}
                    for ci in scomps:
                        c = comps[ci]
                        for by in range(c["v"]):
                            for bx in range(c["h"]):
                                dc_block(
                                    ci, my * c["v"] + by, mx * c["h"] + bx
                                )
                    n_unit += 1
        else:  # single component: its used blocks in raster order
            ci = scomps[0]
            c = comps[ci]
            for by in range(c["bhu"]):
                for bx in range(c["bwu"]):
                    if (
                        restart_interval
                        and n_unit
                        and n_unit % restart_interval == 0
                    ):
                        br.restart(rst)
                        rst = (rst + 1) & 7
                        preds = {ci: 0 for ci in scomps}
                    dc_block(ci, by, bx)
                    n_unit += 1
    else:  # AC scan: always non-interleaved (T.81 B.2.3)
        if len(scomps) != 1 or se < ss or se > 63 or (ah and ah != al + 1):
            raise _JpegError("bad AC scan parameters")
        ci = scomps[0]
        c = comps[ci]
        ad = ac_dec.get(c.get("ta", 0))
        if ad is None:
            raise _JpegError("missing AC table")
        eobrun = 0
        n_unit = 0
        for by in range(c["bhu"]):
            for bx in range(c["bwu"]):
                if (
                    restart_interval
                    and n_unit
                    and n_unit % restart_interval == 0
                ):
                    br.restart(rst)
                    rst = (rst + 1) & 7
                    eobrun = 0
                zz = coefs[ci][by, bx]
                if ah == 0:
                    eobrun = _ac_first_block(br, ad, zz, ss, se, al, eobrun)
                else:
                    eobrun = _ac_refine_block(br, ad, zz, ss, se, al, eobrun)
                n_unit += 1
    # skip to the next real marker (stray RSTn / fill bytes tolerated)
    p = br.pos
    while p + 1 < len(data):
        if (
            data[p] == 0xFF
            and data[p + 1] != 0x00
            and not (0xD0 <= data[p + 1] <= 0xD7)
        ):
            return p
        p += 1
    raise _JpegError("no marker after scan")


def _ac_first_block(
    br: _BitReader,
    ad: dict,
    zz: np.ndarray,
    ss: int,
    se: int,
    al: int,
    eobrun: int,
) -> int:
    """One block of an AC first scan (Ah == 0): run/size coding of the
    band's coefficients at precision Al, with EOBn run codes
    (T.81 G.1.2.2; jdphuff decode_mcu_AC_first)."""
    if eobrun:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = _read_huff(br, ad)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            eobrun = (1 << r) - 1
            if r:
                eobrun += br.read_bits(r)
            break
        k += r
        if k > se:
            raise _JpegError("AC index out of band")
        zz[k] = _extend(br.read_bits(s), s) << al
        k += 1
    return eobrun


def _ac_refine_block(
    br: _BitReader,
    ad: dict,
    zz: np.ndarray,
    ss: int,
    se: int,
    al: int,
    eobrun: int,
) -> int:
    """One block of an AC refinement scan (Ah == Al + 1): newly
    significant coefficients arrive as run/1 codes with a sign bit;
    already-significant coefficients receive interleaved correction
    bits (T.81 G.1.2.3; jdphuff decode_mcu_AC_refine)."""
    p1 = 1 << al
    m1 = -(1 << al)

    def correct(k: int) -> None:
        c = int(zz[k])
        if br.read_bit() and not (c & p1):
            zz[k] = c + (p1 if c >= 0 else m1)

    k = ss
    if eobrun == 0:
        while k <= se:
            rs = _read_huff(br, ad)
            r, s = rs >> 4, rs & 0x0F
            val = 0
            if s == 0:
                if r != 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += br.read_bits(r)
                    break
                # r == 15: skip 16 zero-history coefficients
            else:
                if s != 1:
                    raise _JpegError("bad refinement size")
                val = p1 if br.read_bit() else m1
            # advance: correction bits on nonzero-history coefficients,
            # count down r on zero-history ones
            while k <= se:
                if int(zz[k]) != 0:
                    correct(k)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val:
                if k > se:
                    raise _JpegError("refinement overruns band")
                zz[k] = val
            k += 1
    if eobrun > 0:
        while k <= se:
            if int(zz[k]) != 0:
                correct(k)
            k += 1
        eobrun -= 1
    return eobrun


# --- progressive encoder (scan script: see encode_jpeg docstring) -------------


def _encode_progressive_scans(
    padded: list[np.ndarray],
    samp: list[tuple[int, int]],
    qtabs: list[np.ndarray],
    nc: int,
    mcux: int,
    mcuy: int,
    dc_codes: dict[int, tuple[int, int]],
    ac_codes: dict[int, tuple[int, int]],
    w: int,
    h: int,
    hmax: int,
    vmax: int,
) -> bytes:
    """Emit the SOS + entropy data for every scan of the progressive
    script. Refinement scans mirror the decoder's advance semantics
    exactly (T.81 G.1.2.3): correction bits for already-significant
    coefficients are interleaved at the positions the decoder will
    consume them, never batch-flushed."""
    zzs = []
    for c in range(nc):
        p = padded[c]
        bh, bwq = p.shape[0] // 8, p.shape[1] // 8
        blocks = p.reshape(bh, 8, bwq, 8).transpose(0, 2, 1, 3) - 128.0
        coef = np.einsum("ij,abjk,kl->abil", _C, blocks, _C.T)
        qtab = qtabs[0] if c == 0 else qtabs[1]
        qz = np.rint(coef / qtab[None, None]).astype(np.int64)
        zzs.append(qz.reshape(bh, bwq, 64)[:, :, _ZZ])
    used = [
        (
            (-(-h * samp[c][1] // vmax) + 7) // 8,
            (-(-w * samp[c][0] // hmax) + 7) // 8,
        )
        for c in range(nc)
    ]

    def sos(spec: list[tuple[int, int]], ss: int, se: int, ahal: int) -> bytes:
        b = bytearray(b"\xff\xda")
        b += struct.pack(">HB", 6 + 2 * len(spec), len(spec))
        for cid, tdta in spec:
            b += bytes([cid, tdta])
        b += bytes([ss, se, ahal])
        return bytes(b)

    def dc_blocks_mcu_order():
        for my in range(mcuy):
            for mx in range(mcux):
                for c in range(nc):
                    ch, cv = samp[c]
                    for by in range(cv):
                        for bx in range(ch):
                            yield c, my * cv + by, mx * ch + bx

    out = bytearray()
    # scan 1: DC first, interleaved, Al=1 (values arithmetic-shifted)
    out += sos([(c + 1, 0x00) for c in range(nc)], 0, 0, 0x01)
    bw = _BitWriter()
    preds = [0] * nc
    for c, by, bx in dc_blocks_mcu_order():
        dc = int(zzs[c][by, bx, 0]) >> 1
        diff = dc - preds[c]
        preds[c] = dc
        s = abs(diff).bit_length()
        code, ln = dc_codes[s]
        bw.write(code, ln)
        if s:
            bw.write(diff if diff > 0 else diff + (1 << s) - 1, s)
    bw.flush()
    out += bw.buf
    # scan 2: DC refinement, Ah=1 Al=0 — one raw bit per block
    out += sos([(c + 1, 0x00) for c in range(nc)], 0, 0, 0x10)
    bw = _BitWriter()
    for c, by, bx in dc_blocks_mcu_order():
        bw.write(int(zzs[c][by, bx, 0]) & 1, 1)
    bw.flush()
    out += bw.buf
    # per-component AC first scans: Ss=1 Se=63 Ah=0 Al=1
    for c in range(nc):
        out += sos([(c + 1, 0x00)], 1, 63, 0x01)
        bw = _BitWriter()
        for by in range(used[c][0]):
            for bx in range(used[c][1]):
                _emit_ac_first_block(bw, zzs[c][by, bx], 1, 63, 1, ac_codes)
        bw.flush()
        out += bw.buf
    # per-component AC refinement scans: Ss=1 Se=63 Ah=1 Al=0
    for c in range(nc):
        out += sos([(c + 1, 0x00)], 1, 63, 0x10)
        bw = _BitWriter()
        for by in range(used[c][0]):
            for bx in range(used[c][1]):
                _emit_ac_refine_block(bw, zzs[c][by, bx], 1, 63, 0, ac_codes)
        bw.flush()
        out += bw.buf
    return bytes(out)


def _emit_ac_first_block(
    bw: _BitWriter,
    zz: np.ndarray,
    ss: int,
    se: int,
    al: int,
    ac_codes: dict[int, tuple[int, int]],
) -> None:
    """AC first-scan block: run/size over sign(v)*(|v|>>Al), per-block
    EOB0 (no cross-block EOB runs — simpler, and the decoder's EOBRUN
    path is still exercised with run length 1)."""
    ts = []
    for k in range(ss, se + 1):
        v = int(zz[k])
        a = abs(v) >> al
        ts.append(a if v >= 0 else -a)
    nz = [i for i, t in enumerate(ts) if t]
    last = nz[-1] if nz else -1
    run = 0
    for i in range(last + 1):
        t = ts[i]
        if t == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_codes[0xF0]
            bw.write(code, ln)
            run -= 16
        s = abs(t).bit_length()
        code, ln = ac_codes[(run << 4) | s]
        bw.write(code, ln)
        bw.write(t if t > 0 else t + (1 << s) - 1, s)
        run = 0
    if last < len(ts) - 1:
        code, ln = ac_codes[0x00]
        bw.write(code, ln)


def _emit_ac_refine_block(
    bw: _BitWriter,
    zz: np.ndarray,
    ss: int,
    se: int,
    al: int,
    ac_codes: dict[int, tuple[int, int]],
) -> None:
    """AC refinement block (Ah = Al+1): newly significant coefficients
    (|v|>>Al == 1) as run/1 + sign, correction bits for
    already-significant ones interleaved exactly where the decoder's
    advance loop reads them, per-block EOB0 for the tail."""
    kinds: list[tuple[str, int]] = []
    for k in range(ss, se + 1):
        v = int(zz[k])
        a = abs(v)
        if a >> (al + 1):  # already significant at the previous pass
            kinds.append(("c", (a >> al) & 1))
        elif a >> al:  # newly significant: must be exactly +-1<<Al
            kinds.append(("n", 1 if v > 0 else 0))
        else:
            kinds.append(("z", 0))
    i = 0
    for j, (knd, sign) in enumerate(kinds):
        if knd != "n":
            continue
        r = sum(1 for x in kinds[i:j] if x[0] == "z")
        while r > 15:
            code, ln = ac_codes[0xF0]
            bw.write(code, ln)
            consumed = 0
            while consumed < 16:  # the decoder stops AT the 16th zero
                k2, pl = kinds[i]
                if k2 == "z":
                    consumed += 1
                else:
                    bw.write(pl, 1)
                i += 1
            r -= 16
        code, ln = ac_codes[(r << 4) | 1]
        bw.write(code, ln)
        bw.write(sign, 1)
        while i < j:
            k2, pl = kinds[i]
            if k2 == "c":
                bw.write(pl, 1)
            i += 1
        i = j + 1
    if i < len(kinds):  # anything left needs an EOB + its correction bits
        code, ln = ac_codes[0x00]
        bw.write(code, ln)
        for k2, pl in kinds[i:]:
            if k2 == "c":
                bw.write(pl, 1)
