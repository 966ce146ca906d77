"""Baseline JPEG (ITU T.81) codec in pure Python/numpy — no media
libraries.

Encoder and decoder implement the full baseline pipeline: JFIF color
transform (RGB ↔ YCbCr), 8×8 blocking with edge-replicate padding,
orthonormal 2-D DCT via matrix multiply, uniform quantization, zigzag
scan, DC-difference + AC run-length coding, and canonical Huffman
entropy coding with byte stuffing. The encoder writes its quantization
and Huffman tables into the file's DQT/DHT segments (as every JPEG
must), so the decoder is a general baseline decoder: it reads whatever
tables the file carries — including flat-length tables ours emits and
arbitrary canonical tables from other encoders — decodes interleaved
4:4:4 or single-component scans, honors restart markers, and rejects
progressive (SOF2) and arithmetic-coded streams.

JPEG is lossy: round-trip tests bound reconstruction error (RMSE under
the uniform quantizer) rather than demand bit-equality; geometry and
marker structure are exact. Scale shape: the codec is a per-row kernel
used inside actor-pool ``map_batches`` stages (see
``queries.jpeg_codec_guard``) — payload bytes never cross a shuffle.
"""

from __future__ import annotations

import struct

import numpy as np

# -- shared constants ----------------------------------------------------------


def _zigzag_order() -> np.ndarray:
    """The standard JPEG zigzag permutation, generated (not memorized):
    walk anti-diagonals, alternating direction, row-major indexing."""
    out = []
    for s in range(15):
        rng = range(max(0, s - 7), min(s, 7) + 1)
        for r in (rng if s % 2 else reversed(rng)):
            out.append(r * 8 + (s - r))
    return np.array(out, dtype=np.int64)


ZIGZAG = _zigzag_order()
assert list(ZIGZAG[:8]) == [0, 1, 8, 16, 9, 2, 3, 10]

_C = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _C[_k, _n] = np.sqrt((1 if _k else 0.5) / 4.0) * np.cos(
            (2 * _n + 1) * _k * np.pi / 16.0
        )

# Uniform quantization tables (written into DQT; any table is legal JPEG).
# DC finer than AC keeps block-average fidelity tight for the guard query.
_Q_LUMA = np.full(64, 10, np.uint8)
_Q_LUMA[0] = 4
_Q_CHROMA = np.full(64, 12, np.uint8)
_Q_CHROMA[0] = 4


def _flat_huff(n_symbols: int, length: int, symbols: list[int]):
    """A valid canonical Huffman spec with every symbol at one length:
    codes 0..n-1 of `length` bits (prefix-free, all-ones unused since
    n < 2^length). Returns (bits[16], values)."""
    assert n_symbols < (1 << length)
    bits = [0] * 16
    bits[length - 1] = n_symbols
    return bits, list(symbols)


_DC_SPEC = _flat_huff(12, 4, list(range(12)))
_AC_SYMBOLS = [0x00, 0xF0] + [
    (run << 4) | size for run in range(16) for size in range(1, 11)
]
_AC_SPEC = _flat_huff(len(_AC_SYMBOLS), 8, _AC_SYMBOLS)


def _canonical_codes(bits, values) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) per T.81 canonical code construction."""
    codes, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


# -- color transform -----------------------------------------------------------


def _rgb_to_ycbcr(rgb: np.ndarray) -> np.ndarray:
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.clip(np.stack([y, cb, cr], axis=-1).round(), 0, 255)


def _ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y, cb, cr = ycc[..., 0], ycc[..., 1] - 128.0, ycc[..., 2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.stack([r, g, b], axis=-1).round(), 0, 255).astype(np.uint8)


# -- bit I/O with byte stuffing ------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            byte = (self.acc >> (self.n - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # stuffing
                self.out.append(0x00)
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self) -> bytes:
        if self.n:
            self.write(0x7F, 8 - self.n)  # pad with 1-bits
        return bytes(self.out)


class _BitReader:
    """MSB-first reader over entropy-coded data; unstuffs 0xFF00 and
    stops at any other marker."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0
        self.marker: int | None = None

    def _fill(self) -> bool:
        d, p = self.data, self.pos
        if p >= len(d):
            return False
        b = d[p]
        if b == 0xFF:
            if p + 1 >= len(d):
                return False
            nxt = d[p + 1]
            if nxt == 0x00:
                self.pos = p + 2
            elif 0xD0 <= nxt <= 0xD7:  # restart marker: consumed by caller
                self.marker = nxt
                return False
            else:
                self.marker = nxt
                return False
        else:
            self.pos = p + 1
        self.acc = (self.acc << 8) | b
        self.n += 8
        return True

    def read_bit(self) -> int | None:
        if self.n == 0 and not self._fill():
            return None
        self.n -= 1
        return (self.acc >> self.n) & 1

    def read_bits(self, k: int) -> int | None:
        v = 0
        for _ in range(k):
            b = self.read_bit()
            if b is None:
                return None
            v = (v << 1) | b
        return v

    def sync_restart(self) -> bool:
        """Consume an expected RSTn marker and resync byte alignment."""
        self.acc = self.n = 0
        d, p = self.data, self.pos
        while p + 1 < len(d) and not (d[p] == 0xFF and 0xD0 <= d[p + 1] <= 0xD7):
            p += 1
        if p + 1 >= len(d):
            return False
        self.pos = p + 2
        self.marker = None
        return True


# -- encoder -------------------------------------------------------------------


def _encode_blocks(channel: np.ndarray, qtab: np.ndarray) -> list[np.ndarray]:
    """channel (H, W) float, H/W multiples of 8 → list of 64-long zigzag
    quantized int arrays, raster block order."""
    h, w = channel.shape
    shifted = channel - 128.0
    blocks = (
        shifted.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3)
    )  # (bh, bw, 8, 8)
    coeffs = np.einsum("ij,bcjk,lk->bcil", _C, blocks, _C)
    q = np.round(coeffs.reshape(-1, 64)[:, ZIGZAG] / qtab.astype(np.float64))
    return [row.astype(np.int64) for row in q]


def _category(v: int) -> int:
    return int(v).bit_length() if v else 0


def _emit_coeff(w: _BitWriter, codes, symbol: int, v: int, size: int) -> None:
    code, length = codes[symbol]
    w.write(code, length)
    if size:
        w.write(v if v > 0 else v + (1 << size) - 1, size)


def _pad_to_8(a: np.ndarray) -> np.ndarray:
    h, w = a.shape[:2]
    ph, pw = (-h) % 8, (-w) % 8
    if ph or pw:
        a = np.pad(a, [(0, ph), (0, pw)] + [(0, 0)] * (a.ndim - 2), mode="edge")
    return a


def encode_jpeg(img: np.ndarray, restart_interval: int = 0) -> bytes:
    """Encode (H, W, 3) RGB uint8 or (H, W) grayscale uint8 as a baseline
    JFIF 4:4:4 (or single-component) JPEG."""
    gray = img.ndim == 2
    h, w = img.shape[:2]
    if h < 1 or w < 1:
        raise ValueError("empty image")
    if gray:
        planes = [_pad_to_8(img.astype(np.float64))]
        qtabs = [_Q_LUMA.astype(np.int64)]
    else:
        ycc = _rgb_to_ycbcr(_pad_to_8(img).astype(np.float64))
        planes = [ycc[..., 0], ycc[..., 1], ycc[..., 2]]
        qtabs = [_Q_LUMA.astype(np.int64), _Q_CHROMA.astype(np.int64),
                 _Q_CHROMA.astype(np.int64)]
    comp_blocks = [_encode_blocks(p, q) for p, q in zip(planes, qtabs)]

    dc_codes = _canonical_codes(*_DC_SPEC)
    ac_codes = _canonical_codes(*_AC_SPEC)
    writer = _BitWriter()
    prev_dc = [0] * len(planes)
    n_mcu = len(comp_blocks[0])
    entropy_parts: list[bytes] = []
    mcus_done = 0
    rst = 0
    for m in range(n_mcu):
        if restart_interval and mcus_done == restart_interval:
            entropy_parts.append(writer.flush())
            entropy_parts.append(bytes([0xFF, 0xD0 + rst]))
            rst = (rst + 1) % 8
            writer = _BitWriter()
            prev_dc = [0] * len(planes)
            mcus_done = 0
        for c, blocks in enumerate(comp_blocks):
            blk = blocks[m]
            diff = int(blk[0]) - prev_dc[c]
            prev_dc[c] = int(blk[0])
            size = _category(abs(diff)) if diff else 0
            _emit_coeff(writer, dc_codes, size, diff, size)
            run = 0
            nz = np.nonzero(blk[1:])[0]
            last_nz = nz[-1] + 1 if len(nz) else 0
            for k in range(1, 64):
                v = int(blk[k])
                if k > last_nz:
                    _emit_coeff(writer, ac_codes, 0x00, 0, 0)  # EOB
                    break
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    _emit_coeff(writer, ac_codes, 0xF0, 0, 0)  # ZRL
                    run -= 16
                size = _category(abs(v))
                _emit_coeff(writer, ac_codes, (run << 4) | size, v, size)
                run = 0
        mcus_done += 1
    entropy_parts.append(writer.flush())
    entropy = b"".join(entropy_parts)

    def seg(marker: int, payload: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

    parts = [b"\xff\xd8"]  # SOI
    parts.append(seg(0xE0, b"JFIF\x00\x01\x01\x00" + struct.pack(">HH", 1, 1) + b"\x00\x00"))
    parts.append(seg(0xDB, bytes([0x00]) + bytes(_Q_LUMA)))
    if not gray:
        parts.append(seg(0xDB, bytes([0x01]) + bytes(_Q_CHROMA)))
    ncomp = 1 if gray else 3
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([ncomp])
    for cid in range(1, ncomp + 1):
        sof += bytes([cid, 0x11, 0 if cid == 1 else 1])
    parts.append(seg(0xC0, sof))
    for tc, (bits, values) in ((0, _DC_SPEC), (1, _AC_SPEC)):
        parts.append(seg(0xC4, bytes([tc << 4]) + bytes(bits) + bytes(values)))
    if restart_interval:
        parts.append(seg(0xDD, struct.pack(">H", restart_interval)))
    sos = bytes([ncomp])
    for cid in range(1, ncomp + 1):
        sos += bytes([cid, 0x00])
    sos += bytes([0, 63, 0])
    parts.append(seg(0xDA, sos))
    parts.append(entropy)
    parts.append(b"\xff\xd9")  # EOI
    return b"".join(parts)


# -- decoder -------------------------------------------------------------------


class _HuffTable:
    def __init__(self, bits, values):
        self.lookup = {}  # (length, code) -> symbol
        code, k = 0, 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                self.lookup[(length, code)] = values[k]
                code += 1
                k += 1
            code <<= 1

    def decode(self, r: _BitReader) -> int | None:
        code = 0
        for length in range(1, 17):
            b = r.read_bit()
            if b is None:
                return None
            code = (code << 1) | b
            sym = self.lookup.get((length, code))
            if sym is not None:
                return sym
        return None


def _extend(v: int, size: int) -> int:
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def decode_jpeg(p: bytes) -> dict | None:
    """Decode a baseline JPEG. Returns {width, height, pixels} with
    pixels (H, W, 3) RGB uint8 (grayscale replicated) or None on
    malformed/unsupported input (progressive, 12-bit, subsampled,
    arithmetic-coded)."""
    if len(p) < 4 or p[:2] != b"\xff\xd8":
        return None
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    dc_tabs: dict[int, _HuffTable] = {}
    ac_tabs: dict[int, _HuffTable] = {}
    sof = None
    restart_interval = 0
    while pos + 4 <= len(p):
        if p[pos] != 0xFF:
            return None
        # T.81 B.1.1.2: any number of 0xFF fill bytes may precede a marker
        while pos + 4 <= len(p) and p[pos + 1] == 0xFF:
            pos += 1
        if pos + 4 > len(p):
            return None
        marker = p[pos + 1]
        if marker == 0xD9:
            return None  # EOI before SOS
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            # TEM / stray RSTn: standalone markers carry no length segment
            pos += 2
            continue
        (length,) = struct.unpack_from(">H", p, pos + 2)
        seg_start, seg_end = pos + 4, pos + 2 + length
        if seg_end > len(p):
            return None
        body = p[seg_start:seg_end]
        if marker == 0xDB:
            bpos = 0
            while bpos < len(body):
                pq, tq = body[bpos] >> 4, body[bpos] & 0x0F
                if pq != 0 or bpos + 65 > len(body):
                    return None  # only 8-bit tables
                # DQT bytes are in zigzag order (T.81 B.2.4.1); keep them
                # that way — _decode_scan's blk is zigzag-ordered too, so
                # dequantization pairs entry k with coefficient k directly
                # (a natural-order table here mispaired every AC entry)
                qtabs[tq] = np.frombuffer(
                    body, np.uint8, 64, bpos + 1
                ).astype(np.int64)
                bpos += 65
        elif marker == 0xC4:
            bpos = 0
            while bpos + 17 <= len(body):
                tc, th = body[bpos] >> 4, body[bpos] & 0x0F
                bits = list(body[bpos + 1 : bpos + 17])
                n = sum(bits)
                if bpos + 17 + n > len(body):
                    return None
                values = list(body[bpos + 17 : bpos + 17 + n])
                (dc_tabs if tc == 0 else ac_tabs)[th] = _HuffTable(bits, values)
                bpos += 17 + n
        elif marker == 0xC0 or marker == 0xC1:
            if len(body) < 6:
                return None
            precision = body[0]
            h, w = struct.unpack_from(">HH", body, 1)
            ncomp = body[5]
            if precision != 8 or ncomp not in (1, 3) or len(body) < 6 + 3 * ncomp:
                return None
            comps = []
            for c in range(ncomp):
                cid, hv, tq = body[6 + 3 * c : 9 + 3 * c]
                if hv != 0x11:
                    return None  # subsampling unsupported
                comps.append({"id": cid, "tq": tq})
            sof = {"h": int(h), "w": int(w), "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            return None  # progressive / arithmetic / hierarchical
        elif marker == 0xDD:
            if len(body) != 2:
                return None
            (restart_interval,) = struct.unpack(">H", body)
        elif marker == 0xDA:
            if sof is None or len(body) < 1:
                return None
            ns = body[0]
            if ns != len(sof["comps"]) or len(body) < 1 + 2 * ns + 3:
                return None
            for c in range(ns):
                cid, tda = body[1 + 2 * c], body[2 + 2 * c]
                for comp in sof["comps"]:
                    if comp["id"] == cid:
                        comp["td"], comp["ta"] = tda >> 4, tda & 0x0F
            return _decode_scan(p, seg_end, sof, qtabs, dc_tabs, ac_tabs,
                                restart_interval)
        # APPn / COM / unknown: skip
        pos = seg_end
    return None


def _decode_scan(p, pos, sof, qtabs, dc_tabs, ac_tabs, restart_interval):
    h, w, comps = sof["h"], sof["w"], sof["comps"]
    if h < 1 or w < 1 or h * w > 1 << 24:
        return None
    for comp in comps:
        if comp["tq"] not in qtabs or comp.get("td") not in dc_tabs \
                or comp.get("ta") not in ac_tabs:
            return None
    bh, bw = (h + 7) // 8, (w + 7) // 8
    n_mcu = bh * bw
    planes = [np.zeros((bh * 8, bw * 8), np.float64) for _ in comps]
    reader = _BitReader(p, pos)
    prev_dc = [0] * len(comps)
    mcus_done = 0
    for m in range(n_mcu):
        if restart_interval and mcus_done == restart_interval:
            if not reader.sync_restart():
                return None
            prev_dc = [0] * len(comps)
            mcus_done = 0
        by, bx = divmod(m, bw)
        for c, comp in enumerate(comps):
            blk = np.zeros(64, np.int64)
            sym = dc_tabs[comp["td"]].decode(reader)
            if sym is None or sym > 11:
                return None
            if sym:
                v = reader.read_bits(sym)
                if v is None:
                    return None
                prev_dc[c] += _extend(v, sym)
            blk[0] = prev_dc[c]
            k = 1
            while k < 64:
                sym = ac_tabs[comp["ta"]].decode(reader)
                if sym is None:
                    return None
                if sym == 0x00:  # EOB
                    break
                if sym == 0xF0:  # ZRL
                    k += 16
                    continue
                run, size = sym >> 4, sym & 0x0F
                k += run
                if k > 63 or size == 0:
                    return None
                v = reader.read_bits(size)
                if v is None:
                    return None
                blk[k] = _extend(v, size)
                k += 1
            coeff = np.zeros(64, np.float64)
            coeff[ZIGZAG] = (blk * qtabs[comp["tq"]]).astype(np.float64)
            spatial = _C.T @ coeff.reshape(8, 8) @ _C + 128.0
            planes[c][by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = spatial
        mcus_done += 1
    if len(comps) == 1:
        gray = np.clip(planes[0][:h, :w].round(), 0, 255).astype(np.uint8)
        pixels = np.repeat(gray[:, :, None], 3, axis=2)
    else:
        ycc = np.stack([pl[:h, :w] for pl in planes], axis=-1)
        pixels = _ycbcr_to_rgb(np.clip(ycc, 0.0, 255.0))
    return {"width": w, "height": h, "pixels": pixels}


def jpeg_fixture_image(width: int, height: int, seed: int = 0) -> np.ndarray:
    """Deterministic smooth RGB test image (low-frequency gradients —
    representative of what a mild quantizer preserves well)."""
    yy, xx = np.meshgrid(np.arange(height), np.arange(width), indexing="ij")
    r = 128 + 96 * np.sin(2 * np.pi * (xx / max(width, 1) + seed * 0.13))
    g = 128 + 96 * np.cos(2 * np.pi * (yy / max(height, 1) - seed * 0.07))
    b = 128 + 64 * np.sin(2 * np.pi * ((xx + yy) / max(width + height, 1) + seed * 0.29))
    return np.clip(np.stack([r, g, b], axis=-1).round(), 0, 255).astype(np.uint8)
