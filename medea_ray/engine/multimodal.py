"""Multimodal column plumbing: decode / feature-extract over opaque
``binary`` payload columns with typed metadata.

``decoder="builtin"`` (the real path) parses three uncompressed container
formats in pure Python/numpy — no media libraries needed:

- **BMP** (24-bit BI_RGB, BITMAPINFOHEADER): header-parsed dimensions,
  4-byte-padded row stride, mean-RGB feature over the pixel grid.
- **PPM** (binary P6, maxval 255): whitespace/comment-tolerant header
  tokenizer, mean-RGB feature.
- **WAV** (RIFF; PCM16 + three real compressed-audio codecs): chunk walk
  to ``fmt ``/``fact``/``data``; format 1 PCM16, formats 6/7 G.711
  A-law/mu-law (vectorized LUT expansion), format 0x11 mono IMA ADPCM
  (predictor + step-index nibble decode). Feature is (sample_rate,
  bits, mean |amplitude|).
- **AVI / MJPEG** (RIFF 'AVI '): hdrl/strl/movi walk, 'vids'/'MJPG'
  stream header (fps = rate/scale), every '00dc' frame decoded through
  the in-repo baseline JPEG codec — real entropy-coded video without
  media libraries. ``decode_avi_frames`` returns the RGB frame list for
  frame-sampling stages.
- **PNG** (8-bit gray/RGB/RGBA, non-interlaced): CRC-verified chunk
  walk, full DEFLATE inflate of the concatenated IDAT stream (stdlib
  ``zlib``), and per-scanline unfiltering of all five PNG filter types
  (None/Sub/Up/Average/Paeth) — a real compressed-format decode, no
  media libraries.
- **GIF** (87a/89a, non-interlaced): block walk (extensions skipped),
  global/local color tables, and a full LZW decoder — variable-width
  codes growing 9→12 bits, clear/end codes, the KwKwK self-reference
  case. Animated GIFs decode to a frame list; ``FrameSampler`` is the
  video-style frame-sample stage (decode → every k-th frame → small
  typed per-frame stats).
- **JPEG** (baseline, via ``medea_ray.engine.jpeg``): full entropy-coded
  decode — canonical Huffman from the file's DHT, DC prediction, AC
  run-length, dequantize, IDCT, YCbCr→RGB — plus a matching encoder for
  deterministic fixtures. Lossy, so guards bound RMSE rather than demand
  bit-equality.

Anything unrecognized or malformed decodes to ``media_ok=false`` — a
corrupt payload is a row verdict, never a stage crash. Perceptual-model
codecs (MP3/AAC/H.264) still need real libraries: ``decoder="pil"``/
"ffmpeg" raise NotImplementedError until the corresponding library is
installed, and ``decoder="fake"`` remains the deterministic hash-derived
stand-in for plumbing tests.

``decode_pixels`` exposes the raw (h, w, 3) RGB grid for any still-image
format above, and ``resize_image`` / ``ImageResizer`` / ``resize_images``
are the vectorized resize verb between decode and feature-extract
(nearest = exact integer index arithmetic, SQL-recomputable; bilinear =
half-pixel-center convention) — an actor-pool ``map_batches`` stage like
the extractors.

Scale notes: binary payloads are large → run with a SMALL batch_size (the
default 64 here vs 8192 for text stages) so batch × concurrency fits the
worker heap; payload columns are dropped right after feature extraction so
only small typed features cross downstream stages.
"""

from __future__ import annotations

import hashlib
import struct
import zlib

import numpy as np
import pyarrow as pa

MEDIA_FEATURE_SCHEMA = pa.schema(
    [
        ("media_ok", pa.bool_()),
        ("media_format", pa.string()),
        ("media_width", pa.int32()),
        ("media_height", pa.int32()),
        ("media_n_bytes", pa.int64()),
        ("media_feature", pa.list_(pa.float32())),
    ]
)


def _fake_decode(payload: bytes) -> dict:
    """Deterministic stand-in for a real decoder: dimensions and an 8-dim
    feature vector derived from the payload hash."""
    h = hashlib.blake2b(payload, digest_size=16).digest()
    width = 64 + h[0] % 192
    height = 64 + h[1] % 192
    feat = (np.frombuffer(h[8:], dtype=np.uint8).astype(np.float32) / 255.0).tolist()
    return {
        "ok": True,
        "format": "fake/v1",
        "width": width,
        "height": height,
        "feature": feat,
    }


# -- pure-Python codecs (uncompressed containers) ------------------------------


def make_bmp(width: int, height: int, seed: int = 0) -> bytes:
    """Deterministic 24-bit uncompressed BMP (pixel bytes are a pure
    function of (seed, position))."""
    stride = ((3 * width + 3) // 4) * 4
    img_size = stride * height
    header = b"BM" + struct.pack("<IHHI", 54 + img_size, 0, 0, 54)
    dib = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0,
                      img_size, 2835, 2835, 0, 0)
    rows = np.zeros((height, stride), np.uint8)
    base = (
        np.arange(height, dtype=np.int64)[:, None] * (3 * width)
        + np.arange(3 * width, dtype=np.int64)[None, :]
        + seed * 7
    ) % 256
    rows[:, : 3 * width] = base
    return header + dib + rows.tobytes()


def make_ppm(width: int, height: int, seed: int = 0) -> bytes:
    """Deterministic binary PPM (P6, maxval 255)."""
    header = f"P6\n{width} {height}\n255\n".encode()
    px = ((np.arange(3 * width * height, dtype=np.int64) + seed * 11) % 256).astype(np.uint8)
    return header + px.tobytes()


def make_wav(n_frames: int, n_channels: int = 1, sample_rate: int = 8000,
             seed: int = 0) -> bytes:
    """Deterministic PCM16 WAV."""
    block_align = n_channels * 2
    samples = (
        (np.arange(n_frames * n_channels, dtype=np.int64) * 37 + seed * 13) % 20001
        - 10000
    ).astype(np.int16)
    d = samples.tobytes()
    fmt = struct.pack("<HHIIHH", 1, n_channels, sample_rate,
                      sample_rate * block_align, block_align, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", 16) + fmt \
        + b"data" + struct.pack("<I", len(d)) + d
    return b"RIFF" + struct.pack("<I", len(body)) + body


# -- G.711 companded + IMA ADPCM audio (entropy-reduced WAV codecs) ----------
#
# Real compressed-audio decode paths for the WAV container (audio formats
# 6 = A-law, 7 = mu-law, 0x11 = IMA ADPCM) implemented from the public
# G.711 / IMA specifications — no media libraries. The companded codecs
# decode as vectorized numpy LUT expansions; ADPCM is inherently
# sequential per block (predictor + step-index state), so it loops per
# nibble inside the actor stage over SMALL fixture-scale payloads.

_ULAW_BIAS = 0x84  # G.711 mu-law bias


def mulaw_decode_bytes(b: np.ndarray) -> np.ndarray:
    """Expand mu-law bytes to int16 PCM (G.711, vectorized LUT formula)."""
    u = (~b.astype(np.int32)) & 0xFF
    t = (((u & 0x0F) << 3) + _ULAW_BIAS) << ((u >> 4) & 7)
    return np.where(u & 0x80, _ULAW_BIAS - t, t - _ULAW_BIAS).astype(np.int16)


def mulaw_encode(x: np.ndarray) -> np.ndarray:
    """Compress int16 PCM to mu-law bytes (G.711 segmented quantizer)."""
    x = x.astype(np.int32)
    sign = np.where(x < 0, 0x80, 0)
    mag = np.minimum(np.abs(x), 32635) + _ULAW_BIAS
    # segment = msb(mag) - 7; frexp's exponent is msb+1, exact for ints
    seg = np.frexp(mag.astype(np.float64))[1] - 8
    mant = (mag >> (seg + 3)) & 0x0F
    return ((~(sign | (seg << 4) | mant)) & 0xFF).astype(np.uint8)


def alaw_decode_bytes(b: np.ndarray) -> np.ndarray:
    """Expand A-law bytes to int16 PCM (G.711; sign bit SET == positive)."""
    a = b.astype(np.int32) ^ 0x55
    seg = (a & 0x70) >> 4
    t = (a & 0x0F) << 4
    t = np.where(seg == 0, t + 8, np.where(seg == 1, t + 0x108,
                 (t + 0x108) << np.maximum(seg - 1, 0)))
    return np.where(a & 0x80, t, -t).astype(np.int16)


def alaw_encode(x: np.ndarray) -> np.ndarray:
    """Compress int16 PCM to A-law bytes (G.711 13-bit segmented)."""
    x = x.astype(np.int32)
    mask = np.where(x >= 0, 0xD5, 0x55)
    v = np.where(x >= 0, x >> 3, (-x - 1) >> 3)
    v = np.minimum(v, 0xFFF)
    # segment = first i with v <= 0x1F << i  (msb-based, exact via frexp)
    seg = np.maximum(np.frexp(np.maximum(v, 1).astype(np.float64))[1] - 5, 0)
    mant = np.where(seg < 2, (v >> 1) & 0x0F, (v >> seg) & 0x0F)
    return (((seg << 4) | mant) ^ mask).astype(np.uint8)


_IMA_STEPS = np.array([
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767], np.int32)
_IMA_INDEX_ADJ = np.array([-1, -1, -1, -1, 2, 4, 6, 8], np.int32)


def _ima_decode_nibbles(nibbles, pred: int, index: int) -> list[int]:
    """Sequential IMA ADPCM inner loop (public IMA/DVI algorithm)."""
    out = []
    for n in nibbles:
        step = int(_IMA_STEPS[index])
        diff = step >> 3
        if n & 1:
            diff += step >> 2
        if n & 2:
            diff += step >> 1
        if n & 4:
            diff += step
        if n & 8:
            diff = -diff
        pred = min(32767, max(-32768, pred + diff))
        index = min(88, max(0, index + int(_IMA_INDEX_ADJ[n & 7])))
        out.append(pred)
    return out


def ima_adpcm_decode(data: bytes, block_align: int) -> np.ndarray | None:
    """Decode mono IMA ADPCM WAV data chunk to int16 PCM. Each block:
    4-byte header (int16 predictor, uint8 step index, reserved) then
    2 nibbles/byte, low nibble first."""
    if block_align < 5:
        return None
    out: list[int] = []
    for off in range(0, len(data) - block_align + 1, block_align):
        pred, index = struct.unpack_from("<hB", data, off)
        if index > 88:
            return None
        out.append(pred)
        body = np.frombuffer(data, np.uint8, block_align - 4, off + 4)
        nibbles = np.empty(2 * len(body), np.uint8)
        nibbles[0::2] = body & 0x0F
        nibbles[1::2] = body >> 4
        out.extend(_ima_decode_nibbles(nibbles, pred, index))
    return np.array(out, np.int16)


def ima_adpcm_encode(x: np.ndarray, block_align: int = 256) -> bytes:
    """Encode mono int16 PCM as IMA ADPCM blocks (fixture encoder)."""
    samples_per_block = (block_align - 4) * 2 + 1
    out = bytearray()
    pos = 0
    x = x.astype(np.int64)
    # seed the step index from the opening slope (the block header carries
    # it, so any start index is decodable) — avoids the ramp-up error a
    # cold index=0 start would put on the first few samples
    index = (
        int(np.abs(_IMA_STEPS - abs(int(x[1]) - int(x[0]))).argmin())
        if len(x) > 1 else 0
    )
    while pos < len(x):
        chunk = x[pos : pos + samples_per_block]
        pred = int(chunk[0])
        out += struct.pack("<hBB", pred, index, 0)
        nibbles = []
        for s in chunk[1:]:
            step = int(_IMA_STEPS[index])
            delta = int(s) - pred
            n = 8 if delta < 0 else 0
            delta = abs(delta)
            if delta >= step:
                n |= 4
                delta -= step
            if delta >= step >> 1:
                n |= 2
                delta -= step >> 1
            if delta >= step >> 2:
                n |= 1
            # reconstruct exactly as the decoder will
            diff = step >> 3
            if n & 1:
                diff += step >> 2
            if n & 2:
                diff += step >> 1
            if n & 4:
                diff += step
            if n & 8:
                diff = -diff
            pred = min(32767, max(-32768, pred + diff))
            index = min(88, max(0, index + int(_IMA_INDEX_ADJ[n & 7])))
            nibbles.append(n)
        if len(nibbles) % 2:
            nibbles.append(0)
        packed = np.asarray(nibbles, np.uint8)
        out += (packed[0::2] | (packed[1::2] << 4)).tobytes()
        pad = (block_align - 4) - len(packed) // 2
        out += b"\x00" * pad  # final short block zero-padded to block_align
        pos += samples_per_block
    return bytes(out)


def _wav_container(fmt_tag: int, n_channels: int, sample_rate: int,
                   block_align: int, bits: int, data: bytes,
                   n_frames: int | None = None) -> bytes:
    """RIFF/WAVE wrapper; compressed formats carry a ``fact`` chunk with
    the true frame count (RIFF spec requires it for fmt != PCM)."""
    fmt = struct.pack("<HHIIHH", fmt_tag, n_channels, sample_rate,
                      sample_rate * block_align, block_align, bits)
    if fmt_tag == 0x11:
        fmt += struct.pack("<HH", 2, (block_align - 4) * 2 + 1)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    if n_frames is not None:
        body += b"fact" + struct.pack("<II", 4, n_frames)
    body += b"data" + struct.pack("<I", len(data)) + data
    if len(data) % 2:
        body += b"\x00"
    return b"RIFF" + struct.pack("<I", len(body)) + body


def mulaw_fixture_bytes(n: int, seed: int = 0) -> np.ndarray:
    """Deterministic mu-law byte pattern (SQL-recomputable: the driver
    oracle re-expands the same bytes with the G.711 formula in DuckDB)."""
    return ((np.arange(n, dtype=np.int64) * 37 + seed * 13) % 256).astype(np.uint8)


def make_wav_mulaw(n_frames: int, sample_rate: int = 8000, seed: int = 0) -> bytes:
    """Mono mu-law (format 7) WAV whose data bytes are the deterministic
    ``mulaw_fixture_bytes`` pattern."""
    d = mulaw_fixture_bytes(n_frames, seed).tobytes()
    return _wav_container(7, 1, sample_rate, 1, 8, d, n_frames)


def make_wav_alaw(n_frames: int, sample_rate: int = 8000, seed: int = 0) -> bytes:
    """Mono A-law (format 6) WAV over the same deterministic byte pattern."""
    d = mulaw_fixture_bytes(n_frames, seed).tobytes()
    return _wav_container(6, 1, sample_rate, 1, 8, d, n_frames)


def adpcm_fixture_pcm(n_frames: int, seed: int = 0) -> np.ndarray:
    """Smooth triangle-ish int16 signal (bounded per-sample delta) so the
    IMA predictor tracks it and round-trip error stays small."""
    t = np.arange(n_frames, dtype=np.int64) * 96 + seed * 17
    tri = np.abs((t % 16384) - 8192) - 4096  # triangle in [-4096, 4096]
    return tri.astype(np.int16)


def make_wav_adpcm(n_frames: int, sample_rate: int = 8000, seed: int = 0,
                   block_align: int = 256) -> bytes:
    """Mono IMA ADPCM (format 0x11) WAV encoding ``adpcm_fixture_pcm``."""
    d = ima_adpcm_encode(adpcm_fixture_pcm(n_frames, seed), block_align)
    return _wav_container(0x11, 1, sample_rate, block_align, 4, d, n_frames)


# -- AVI / MJPEG video (RIFF container over the in-repo baseline JPEG) -------


def _riff_list(kind: bytes, payload: bytes) -> bytes:
    return b"LIST" + struct.pack("<I", 4 + len(payload)) + kind + payload


def make_avi_mjpeg(width: int, height: int, n_frames: int = 4,
                   fps: int = 12, seed: int = 0) -> bytes:
    """Deterministic MJPEG AVI: a minimal RIFF 'AVI ' container (avih +
    one 'vids'/'MJPG' stream) whose '00dc' chunks are baseline JPEGs from
    the in-repo encoder over ``jpeg_fixture_image(width, height,
    seed*31 + frame)`` — an entropy-coded video fixture with no media
    libraries."""
    from medea_ray.engine.jpeg import encode_jpeg, jpeg_fixture_image

    frames = [
        encode_jpeg(jpeg_fixture_image(width, height, seed=seed * 31 + f))
        for f in range(n_frames)
    ]
    avih = b"avih" + struct.pack(
        "<I14I", 56, 1_000_000 // fps, 0, 0, 0x10, n_frames, 0, 1,
        max(len(f) for f in frames), width, height, 0, 0, 0, 0)
    strh = b"strh" + struct.pack(
        "<I", 56) + b"vidsMJPG" + struct.pack(
        "<IHHIIIIIIIIhhhh", 0, 0, 0, 0, 1, fps, 0, n_frames,
        max(len(f) for f in frames), 0xFFFFFFFF & -1, 0, 0, 0, width, height)
    strf = b"strf" + struct.pack(
        "<IIiiHHIIiiII", 40, 40, width, height, 1, 24,
        0x47504A4D, width * height * 3, 0, 0, 0, 0)  # 'MJPG' fourcc
    hdrl = _riff_list(b"hdrl", avih + _riff_list(b"strl", strh + strf))
    movi = b""
    for f in frames:
        movi += b"00dc" + struct.pack("<I", len(f)) + f
        if len(f) % 2:
            movi += b"\x00"
    body = b"AVI " + hdrl + _riff_list(b"movi", movi)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_avi_frames(p: bytes) -> dict | None:
    """Parse a RIFF 'AVI ' container and decode every MJPEG frame with the
    in-repo baseline JPEG decoder. Returns dims, fps (rate/scale from
    strh), declared frame count, and the decoded RGB frame list; None on
    any malformed structure (never raises on untrusted bytes)."""
    from medea_ray.engine.jpeg import decode_jpeg

    if len(p) < 12 or p[:4] != b"RIFF" or p[8:12] != b"AVI ":
        return None
    width = height = n_declared = None
    scale = rate = None
    payloads: list[bytes] = []

    def walk(lo: int, hi: int, depth: int = 0) -> bool:
        nonlocal width, height, n_declared, scale, rate
        if depth > 8:
            return False
        pos = lo
        while pos + 8 <= hi:
            cid = p[pos : pos + 4]
            (size,) = struct.unpack_from("<I", p, pos + 4)
            if pos + 8 + size > hi:
                return False
            if cid == b"LIST":
                if size < 4 or not walk(pos + 12, pos + 8 + size, depth + 1):
                    return False
            elif cid == b"avih" and size >= 56:
                vals = struct.unpack_from("<14I", p, pos + 8)
                n_declared, width, height = vals[4], vals[8], vals[9]
            elif cid == b"strh" and size >= 48:
                if p[pos + 8 : pos + 16] == b"vidsMJPG":
                    scale, rate = struct.unpack_from("<II", p, pos + 28)
            elif cid[2:4] in (b"dc", b"db") and cid[:2].isdigit():
                payloads.append(p[pos + 8 : pos + 8 + size])
            pos += 8 + size + (size & 1)
        return True

    if not walk(12, min(len(p), 8 + struct.unpack_from("<I", p, 4)[0])):
        return None
    if width is None or not payloads or not scale or not rate:
        return None
    frames = []
    for raw in payloads:
        d = decode_jpeg(raw)
        if d is None or d["width"] != width or d["height"] != height:
            return None
        frames.append(d["pixels"])
    return {
        "width": int(width), "height": int(height),
        "fps": float(rate) / float(scale),
        "n_declared": int(n_declared) if n_declared is not None else len(frames),
        "frames": frames,
    }


def _decode_avi_features(p: bytes) -> dict | None:
    d = decode_avi_frames(p)
    if d is None or not d["frames"]:
        return None
    luma = float(np.mean([f.astype(np.float64).mean() for f in d["frames"]])) / 255.0
    return {"ok": True, "format": "avi", "width": d["width"], "height": d["height"],
            "feature": [d["fps"], float(len(d["frames"])), luma]}


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def make_png(width: int, height: int, seed: int = 0, *, level: int = 0,
             filter_type: int = 0, color_type: int = 2) -> bytes:
    """Deterministic PNG (8-bit, non-interlaced). The fixture default
    ``level=0`` emits stored DEFLATE blocks, so for raw < 64 KiB the file
    size is exactly ``68 + height*(1 + channels*width)`` — arithmetic the
    DuckDB oracle can mirror. ``level>0``/``filter_type>0`` produce really
    compressed / filtered files for decoder tests (filter bytes are written
    per row; the pixel bytes are pre-filtered so decode still yields the
    canonical (seed, position) pattern)."""
    channels = {0: 1, 2: 3, 6: 4}[color_type]
    n = channels * width * height
    px = ((np.arange(n, dtype=np.int64) + seed * 11) % 256).astype(np.uint8)
    img = px.reshape(height, channels * width).astype(np.int64)
    rows = []
    for y in range(height):
        cur = img[y]
        if filter_type == 0:
            filt = cur
        elif filter_type == 1:  # Sub
            left = np.concatenate([np.zeros(channels, np.int64), cur[:-channels]])
            filt = (cur - left) % 256
        elif filter_type == 2:  # Up
            up = img[y - 1] if y > 0 else np.zeros_like(cur)
            filt = (cur - up) % 256
        else:
            raise ValueError("encoder supports filter types 0/1/2")
        rows.append(bytes([filter_type]) + filt.astype(np.uint8).tobytes())
    raw = b"".join(rows)
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw, level))
        + _png_chunk(b"IEND", b"")
    )


# -- GIF: real LZW codec + multi-frame container -------------------------------

_GIF_MIN_CODE_SIZE = 8  # 256-color tables throughout


def _lzw_encode(indices: bytes, min_code_size: int = _GIF_MIN_CODE_SIZE) -> bytes:
    """Standard GIF LZW: string table rebuilt on clear, codes widen from
    min+1 up to 12 bits (encoder bumps at next_code == 2^w + 1 to stay in
    lockstep with the decoder's one-code entry lag), table reset before
    the 4096-entry ceiling."""
    if not indices:
        raise ValueError("_lzw_encode: empty pixel-index stream")
    clear, end = 1 << min_code_size, (1 << min_code_size) + 1
    out = bytearray()
    acc = n_acc = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, n_acc
        acc |= code << n_acc  # GIF packs codes LSB-first
        n_acc += width
        while n_acc >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            n_acc -= 8

    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code, width = end + 1, min_code_size + 1
    emit(clear, width)
    buf = indices[:1]
    for b in indices[1:]:
        cand = buf + bytes([b])
        if cand in table:
            buf = cand
            continue
        emit(table[buf], width)
        table[cand] = next_code
        next_code += 1
        if next_code == (1 << width) + 1 and width < 12:
            width += 1
        if next_code >= 4094:  # reset comfortably before the 12-bit ceiling
            emit(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            next_code, width = end + 1, min_code_size + 1
        buf = bytes([b])
    emit(table[buf], width)
    emit(end, width)
    if n_acc:
        out.append(acc & 0xFF)
    return bytes(out)


def _lzw_decode(data: bytes, min_code_size: int) -> bytes | None:
    clear, end = 1 << min_code_size, (1 << min_code_size) + 1
    base = {i: bytes([i]) for i in range(clear)}
    table = dict(base)
    next_code, width = end + 1, min_code_size + 1
    out, prev = bytearray(), None
    acc = n_acc = pos = 0
    while True:
        while n_acc < width:
            if pos >= len(data):
                return None  # ran out before the end code
            acc |= data[pos] << n_acc
            pos += 1
            n_acc += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        n_acc -= width
        if code == end:
            return bytes(out)
        if code == clear:
            table = dict(base)
            next_code, width = end + 1, min_code_size + 1
            prev = None
            continue
        if prev is None:
            entry = table.get(code)
            if entry is None:
                return None
        elif code in table:
            entry = table[code]
        elif code == next_code:  # KwKwK
            entry = table[prev] + table[prev][:1]
        else:
            return None
        out += entry
        if prev is not None and next_code < 4096:
            table[next_code] = table[prev] + entry[:1]
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
        prev = code


def _gif_subblocks(data: bytes) -> bytes:
    """Wrap a byte stream in GIF ≤255-byte length-prefixed sub-blocks."""
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def gif_frame_pixels(width: int, height: int, frame: int, seed: int) -> np.ndarray:
    """Canonical fixture pixel indices for frame ``frame``: a pure
    function of (seed, frame, position). The grayscale-identity palette
    makes the decoded red channel equal the index, so integer pixel sums
    are SQL-recomputable (see oracle_sql()['gif_frame_stats'])."""
    n = width * height
    return ((np.arange(n, dtype=np.int64) + seed * 11 + frame * 7) % 256).astype(np.uint8)


def make_gif(width: int, height: int, n_frames: int = 1, seed: int = 0) -> bytes:
    """Deterministic animated GIF89a: 256-entry grayscale-identity global
    color table, one graphic-control extension + full-frame image per
    frame, really-LZW-compressed pixel data."""
    if width < 1 or height < 1:
        raise ValueError(f"make_gif: zero-area frame {width}x{height}")
    lsd = struct.pack("<HH", width, height) + bytes([0xF7, 0, 0])
    gct = b"".join(bytes([i, i, i]) for i in range(256))
    parts = [b"GIF89a", lsd, gct]
    for f in range(n_frames):
        parts.append(b"\x21\xf9\x04\x00" + struct.pack("<H", 10) + b"\x00\x00")
        parts.append(b"\x2c" + struct.pack("<HHHH", 0, 0, width, height) + b"\x00")
        idx = gif_frame_pixels(width, height, f, seed).tobytes()
        parts.append(bytes([_GIF_MIN_CODE_SIZE]) + _gif_subblocks(_lzw_encode(idx)))
    parts.append(b"\x3b")
    return b"".join(parts)


def decode_gif_frames(p: bytes) -> dict | None:
    """Parse a GIF87a/89a container into decoded frames. Returns
    {width, height, frames: [uint8 (fh, fw) index grid, ...],
    palettes: [uint8 (n, 3), ...]} or None on malformed input. Frames
    are independent grids (no disposal-method compositing); interlaced
    images are rejected."""
    if len(p) < 13 or p[:6] not in (b"GIF87a", b"GIF89a"):
        return None
    width, height = struct.unpack_from("<HH", p, 6)
    packed = p[10]
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        if pos + 3 * n > len(p):
            return None
        gct = np.frombuffer(p, np.uint8, 3 * n, pos).reshape(n, 3)
        pos += 3 * n
    frames, palettes = [], []
    while pos < len(p):
        marker = p[pos]
        pos += 1
        if marker == 0x3B:  # trailer
            if not frames or width <= 0 or height <= 0:
                return None
            return {"width": int(width), "height": int(height),
                    "frames": frames, "palettes": palettes}
        if marker == 0x21:  # extension: label + sub-blocks, skipped
            pos += 1
            while pos < len(p) and p[pos]:
                pos += 1 + p[pos]
            pos += 1
        elif marker == 0x2C:  # image descriptor
            if pos + 9 > len(p):
                return None
            _left, _top, fw, fh = struct.unpack_from("<HHHH", p, pos)
            flags = p[pos + 8]
            pos += 9
            if flags & 0x40:  # interlaced: unsupported
                return None
            pal = gct
            if flags & 0x80:
                n = 2 << (flags & 0x07)
                if pos + 3 * n > len(p):
                    return None
                pal = np.frombuffer(p, np.uint8, 3 * n, pos).reshape(n, 3)
                pos += 3 * n
            if pal is None or pos >= len(p) or fw <= 0 or fh <= 0:
                return None
            min_code = p[pos]
            pos += 1
            if not 2 <= min_code <= 8:
                return None
            chunks = []
            while pos < len(p) and p[pos]:
                size = p[pos]
                if pos + 1 + size > len(p):
                    return None
                chunks.append(p[pos + 1 : pos + 1 + size])
                pos += 1 + size
            if pos >= len(p):
                return None
            pos += 1  # sub-block terminator
            idx = _lzw_decode(b"".join(chunks), min_code)
            if idx is None or len(idx) != fw * fh:
                return None
            grid = np.frombuffer(idx, np.uint8).reshape(fh, fw)
            if int(grid.max(initial=0)) >= len(pal):
                return None
            frames.append(grid)
            palettes.append(pal)
        else:
            return None
    return None  # no trailer


def _decode_gif(p: bytes) -> dict | None:
    g = decode_gif_frames(p)
    if g is None:
        return None
    rgb = g["palettes"][0][g["frames"][0]].astype(np.float64)
    mean = rgb.reshape(-1, 3).mean(axis=0) / 255.0
    return {"ok": True, "format": "gif", "width": g["width"], "height": g["height"],
            "feature": [float(len(g["frames"]))] + [float(x) for x in mean]}


def media_dims(doc_id: int) -> tuple[str, int, int]:
    """(format, width, height) of the deterministic per-doc media fixture.
    For wav, width = n_frames and height = n_channels (the documented
    audio mapping of the shared feature schema). The DuckDB oracle in
    ``__ray_entry__.oracle_sql()['media_features']`` mirrors this
    arithmetic — keep them in lockstep."""
    kind = ("bmp", "ppm", "wav", "png")[doc_id % 4]
    if kind == "wav":
        return kind, 16 + doc_id % 50, 1 + doc_id % 2
    return kind, 4 + doc_id % 13, 3 + (doc_id // 13) % 11


def make_media_blob(doc_id: int) -> bytes:
    kind, w, h = media_dims(doc_id)
    if kind == "bmp":
        return make_bmp(w, h, seed=doc_id)
    if kind == "ppm":
        return make_ppm(w, h, seed=doc_id)
    if kind == "png":
        return make_png(w, h, seed=doc_id)
    return make_wav(w, n_channels=h, seed=doc_id)


def _bmp_raw(p: bytes) -> np.ndarray | None:
    """(h, w, 3) uint8 RGB, top-down row order (BMP stores BGR and, for
    positive heights, bottom-up — both are normalized here)."""
    if len(p) < 54 or p[:2] != b"BM":
        return None
    (offset,) = struct.unpack_from("<I", p, 10)
    (hdr_size,) = struct.unpack_from("<I", p, 14)
    if hdr_size < 40:
        return None
    width, height = struct.unpack_from("<ii", p, 18)
    _planes, bpp = struct.unpack_from("<HH", p, 26)
    (compression,) = struct.unpack_from("<I", p, 30)
    if bpp != 24 or compression != 0 or width <= 0 or height == 0:
        return None
    h = abs(height)  # negative height = top-down row order
    stride = ((3 * width + 3) // 4) * 4
    if offset + stride * h > len(p):
        return None
    px = (
        np.frombuffer(p, np.uint8, stride * h, offset)
        .reshape(h, stride)[:, : 3 * width]
        .reshape(h, width, 3)
    )
    if height > 0:
        px = px[::-1]
    return px[:, :, ::-1]  # BGR -> RGB


def _decode_bmp(p: bytes) -> dict | None:
    px = _bmp_raw(p)
    if px is None:
        return None
    h, width = px.shape[:2]
    mean_rgb = px.astype(np.float64).mean(axis=(0, 1)) / 255.0
    return {"ok": True, "format": "bmp", "width": width, "height": h,
            "feature": [float(x) for x in mean_rgb]}


def _ppm_raw(p: bytes) -> np.ndarray | None:
    """(h, w, 3) uint8 RGB from a binary P6 PPM."""
    if not p.startswith(b"P6"):
        return None
    pos, vals = 2, []
    while len(vals) < 3 and pos < len(p):
        while pos < len(p) and p[pos : pos + 1].isspace():
            pos += 1
        if p[pos : pos + 1] == b"#":
            nl = p.find(b"\n", pos)
            if nl < 0:
                return None
            pos = nl + 1
            continue
        start = pos
        while pos < len(p) and not p[pos : pos + 1].isspace():
            pos += 1
        tok = p[start:pos]
        if not tok.isdigit():
            return None
        vals.append(int(tok))
    if len(vals) < 3 or pos >= len(p):
        return None
    pos += 1  # exactly one whitespace byte after maxval, then raster
    w, h, maxval = vals
    if maxval != 255 or w <= 0 or h <= 0 or pos + 3 * w * h > len(p):
        return None
    return np.frombuffer(p, np.uint8, 3 * w * h, pos).reshape(h, w, 3)


def _decode_ppm(p: bytes) -> dict | None:
    px = _ppm_raw(p)
    if px is None:
        return None
    h, w = px.shape[:2]
    mean_rgb = px.astype(np.float64).mean(axis=(0, 1)) / 255.0
    return {"ok": True, "format": "ppm", "width": w, "height": h,
            "feature": [float(x) for x in mean_rgb]}


def _decode_wav(p: bytes) -> dict | None:
    """RIFF/WAVE decode: PCM16 (format 1) plus three real compressed-audio
    codecs — A-law 6 / mu-law 7 (G.711 companded, vectorized LUT expand)
    and mono IMA ADPCM 0x11 (predictor + step-index nibble decode). The
    ``fact`` chunk's frame count truncates ADPCM's final zero-padded
    block, per the RIFF spec for non-PCM formats."""
    if len(p) < 12 or p[:4] != b"RIFF" or p[8:12] != b"WAVE":
        return None
    pos, fmt, data, fact_frames = 12, None, None, None
    while pos + 8 <= len(p):
        cid = p[pos : pos + 4]
        (size,) = struct.unpack_from("<I", p, pos + 4)
        if pos + 8 + size > len(p):
            return None
        if cid == b"fmt ":
            fmt = p[pos + 8 : pos + 8 + size]
        elif cid == b"data":
            data = p[pos + 8 : pos + 8 + size]
        elif cid == b"fact" and size >= 4:
            (fact_frames,) = struct.unpack_from("<I", p, pos + 8)
        pos += 8 + size + (size & 1)  # chunks are 2-byte aligned
    if fmt is None or data is None or len(fmt) < 16:
        return None
    audio_fmt, n_ch, rate, _brate, block_align, bits = struct.unpack_from("<HHIIHH", fmt, 0)
    if n_ch < 1:
        return None
    if audio_fmt == 1:
        if bits != 16 or block_align != n_ch * 2:
            return None
        n_frames = len(data) // block_align
        x = np.frombuffer(data, np.int16, n_frames * n_ch).astype(np.float64)
    elif audio_fmt in (6, 7):
        if bits != 8 or block_align != n_ch:
            return None
        n_frames = len(data) // block_align
        raw = np.frombuffer(data, np.uint8, n_frames * n_ch)
        expand = alaw_decode_bytes if audio_fmt == 6 else mulaw_decode_bytes
        x = expand(raw).astype(np.float64)
    elif audio_fmt == 0x11:
        if bits != 4 or n_ch != 1:
            return None  # mono-only ADPCM path (fixture contract)
        pcm = ima_adpcm_decode(data, block_align)
        if pcm is None:
            return None
        if fact_frames is not None:
            pcm = pcm[:fact_frames]
        n_frames = len(pcm)
        x = pcm.astype(np.float64)
    else:
        return None
    mean_amp = float(np.abs(x).mean() / 32768.0) if len(x) else 0.0
    return {"ok": True, "format": "wav", "width": n_frames, "height": n_ch,
            "feature": [float(rate), float(bits), mean_amp]}


def _png_unfilter(raw: bytes, width: int, height: int, channels: int) -> np.ndarray | None:
    """Reverse PNG scanline filtering (spec filters 0-4). Returns the
    (height, width*channels) uint8 pixel grid or None on a malformed
    stream. Sub/Paeth are inherently sequential per pixel, so rows decode
    in a Python loop over width — fine at thumbnail scale; megapixel
    assets belong on decoder='pil' when a codec library is present."""
    rowbytes = channels * width
    if len(raw) != height * (1 + rowbytes):
        return None
    arr = np.frombuffer(raw, np.uint8).reshape(height, 1 + rowbytes)
    filters, data = arr[:, 0], arr[:, 1:].astype(np.int64)
    if filters.max(initial=0) > 4:
        return None
    out = np.zeros((height, rowbytes), np.int64)
    for y in range(height):
        f, cur = int(filters[y]), data[y]
        up = out[y - 1] if y > 0 else np.zeros(rowbytes, np.int64)
        if f == 0:
            out[y] = cur
        elif f == 2:  # Up — vectorized across the row
            out[y] = (cur + up) % 256
        else:  # Sub / Average / Paeth need the just-decoded left pixel
            row = out[y]
            for x in range(rowbytes):
                a = row[x - channels] if x >= channels else 0
                b = up[x]
                c = up[x - channels] if x >= channels else 0
                if f == 1:
                    pred = a
                elif f == 3:
                    pred = (a + b) // 2
                else:  # Paeth
                    pp = a + b - c
                    pa_, pb_, pc_ = abs(pp - a), abs(pp - b), abs(pp - c)
                    pred = a if (pa_ <= pb_ and pa_ <= pc_) else (b if pb_ <= pc_ else c)
                row[x] = (cur[x] + pred) % 256
    return out.astype(np.uint8)


def _png_raw(p: bytes) -> np.ndarray | None:
    """(h, w, channels) uint8 (native channel count: 1 gray / 3 RGB /
    4 RGBA) from an 8-bit non-interlaced PNG."""
    if len(p) < 8 or p[:8] != b"\x89PNG\r\n\x1a\n":
        return None
    pos, ihdr, idat, seen_end = 8, None, [], False
    while pos + 8 <= len(p):
        (size,) = struct.unpack_from(">I", p, pos)
        ctype = p[pos + 4 : pos + 8]
        if pos + 12 + size > len(p):
            return None
        data = p[pos + 8 : pos + 8 + size]
        (crc,) = struct.unpack_from(">I", p, pos + 8 + size)
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            return None
        if ctype == b"IHDR":
            ihdr = data
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            seen_end = True
            break
        pos += 12 + size
    if ihdr is None or not idat or not seen_end or len(ihdr) != 13:
        return None
    w, h, depth, color, comp, filt, interlace = struct.unpack(">IIBBBBB", ihdr)
    channels = {0: 1, 2: 3, 6: 4}.get(color)
    if (depth != 8 or channels is None or comp != 0 or filt != 0
            or interlace != 0 or w <= 0 or h <= 0 or w * h > 1 << 24):
        return None
    try:
        raw = zlib.decompress(b"".join(idat))
    except zlib.error:
        return None
    px = _png_unfilter(raw, w, h, channels)
    if px is None:
        return None
    return px.reshape(h, w, channels)


def _decode_png(p: bytes) -> dict | None:
    px = _png_raw(p)
    if px is None:
        return None
    h, w, channels = px.shape
    mean = px.reshape(h * w, channels).astype(np.float64).mean(axis=0) / 255.0
    return {"ok": True, "format": "png", "width": int(w), "height": int(h),
            "feature": [float(x) for x in mean]}


_NOT_MEDIA = {"ok": False, "format": None, "width": None, "height": None, "feature": None}


def builtin_decode(p: bytes) -> dict:
    """Magic-byte sniff + parse; malformed/unknown payloads → ok=False."""
    d = None
    if p[:2] == b"BM":
        d = _decode_bmp(p)
    elif p[:2] == b"P6":
        d = _decode_ppm(p)
    elif p[:4] == b"RIFF":
        d = _decode_avi_features(p) if p[8:12] == b"AVI " else _decode_wav(p)
    elif p[:8] == b"\x89PNG\r\n\x1a\n":
        d = _decode_png(p)
    elif p[:4] == b"GIF8":
        d = _decode_gif(p)
    elif p[:2] == b"\xff\xd8":
        d = _decode_jpeg_features(p)
    return d if d is not None else dict(_NOT_MEDIA)


def _decode_jpeg_features(p: bytes) -> dict | None:
    from medea_ray.engine.jpeg import decode_jpeg

    d = decode_jpeg(p)
    if d is None:
        return None
    mean = d["pixels"].reshape(-1, 3).astype(np.float64).mean(axis=0) / 255.0
    return {"ok": True, "format": "jpeg", "width": d["width"], "height": d["height"],
            "feature": [float(x) for x in mean]}


def decode_pixels(p: bytes) -> np.ndarray | None:
    """(h, w, 3) uint8 RGB pixel array for any still-image format the
    builtin decoder accepts (BMP / PPM / PNG / first GIF frame / JPEG),
    or None on anything unrecognized or malformed. PNG grayscale
    replicates to 3 channels; RGBA drops alpha."""
    if not isinstance(p, (bytes, bytearray, memoryview)) or len(p) < 2:
        return None
    p = bytes(p)
    if p[:2] == b"BM":
        return _bmp_raw(p)
    if p[:2] == b"P6":
        return _ppm_raw(p)
    if p[:8] == b"\x89PNG\r\n\x1a\n":
        px = _png_raw(p)
        if px is None:
            return None
        c = px.shape[2]
        if c == 1:
            return np.repeat(px, 3, axis=2)
        return px[:, :, :3]
    if p[:4] == b"GIF8":
        g = decode_gif_frames(p)
        if g is None or not g["frames"]:
            return None
        return g["palettes"][0][g["frames"][0]]
    if p[:2] == b"\xff\xd8":
        from medea_ray.engine.jpeg import decode_jpeg

        d = decode_jpeg(p)
        return None if d is None else d["pixels"]
    return None


def resize_image(px: np.ndarray, out_h: int, out_w: int,
                 method: str = "nearest") -> np.ndarray:
    """Vectorized image resize over an (h, w, c) uint8 array — the
    missing verb between decode and feature-extract for multimodal
    pipelines (thumbnailing, fixed-size model inputs).

    ``nearest``: source index = (target_index * src_dim) // out_dim —
    PURE integer arithmetic, so the result is platform-exact and
    SQL-recomputable (``image_resize_guard``'s DuckDB oracle recomputes
    resized-pixel sums closed-form from the fixture formula).
    ``bilinear``: half-pixel-center convention (the OpenCV/PIL default),
    float64 accumulation, round-half-up back to uint8; every output
    value is a convex combination of inputs, so it stays inside the
    source's [min, max]."""
    if out_h <= 0 or out_w <= 0:
        raise ValueError(f"resize target must be positive, got {out_h}x{out_w}")
    if px.ndim == 2:
        px = px[:, :, None]
    h, w = px.shape[:2]
    if method == "nearest":
        ys = (np.arange(out_h, dtype=np.int64) * h) // out_h
        xs = (np.arange(out_w, dtype=np.int64) * w) // out_w
        return px[ys[:, None], xs[None, :]]
    if method != "bilinear":
        raise ValueError(f"unknown resize method {method!r}")
    fy = (np.arange(out_h, dtype=np.float64) + 0.5) * (h / out_h) - 0.5
    fx = (np.arange(out_w, dtype=np.float64) + 0.5) * (w / out_w) - 0.5
    y0 = np.clip(np.floor(fy), 0, h - 1).astype(np.int64)
    x0 = np.clip(np.floor(fx), 0, w - 1).astype(np.int64)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    wy = np.clip(fy - y0, 0.0, 1.0)[:, None, None]
    wx = np.clip(fx - x0, 0.0, 1.0)[None, :, None]
    a = px[y0[:, None], x0[None, :]].astype(np.float64)
    b = px[y0[:, None], x1[None, :]].astype(np.float64)
    c = px[y1[:, None], x0[None, :]].astype(np.float64)
    d = px[y1[:, None], x1[None, :]].astype(np.float64)
    out = (a * (1.0 - wy) * (1.0 - wx) + b * (1.0 - wy) * wx
           + c * wy * (1.0 - wx) + d * wy * wx)
    return np.floor(out + 0.5).astype(np.uint8)


class ImageResizer:
    """Actor-pool ``map_batches`` stage: decode a binary image column,
    resize to per-row targets, emit typed stats (+ the resized raster as
    ``large_binary`` when ``keep_pixels`` — row-major RGB, for a
    downstream model-input stage). Targets come either from constants
    (``out_h``/``out_w``) or per-row columns (``out_h_col``/``out_w_col``).
    Undecodable payloads or invalid targets → ``resize_ok=false``, never
    a stage crash. Same scale contract as the other media stages: small
    batches, payload dropped right after the stage."""

    def __init__(self, payload_col: str = "blob", *, out_h: int | None = None,
                 out_w: int | None = None, out_h_col: str | None = None,
                 out_w_col: str | None = None, method: str = "nearest",
                 keep_pixels: bool = False):
        if (out_h is None) == (out_h_col is None):
            raise ValueError("exactly one of out_h / out_h_col is required")
        if (out_w is None) == (out_w_col is None):
            raise ValueError("exactly one of out_w / out_w_col is required")
        if method not in ("nearest", "bilinear"):
            raise ValueError(f"unknown resize method {method!r}")
        self.payload_col = payload_col
        self.out_h, self.out_w = out_h, out_w
        self.out_h_col, self.out_w_col = out_h_col, out_w_col
        self.method = method
        self.keep_pixels = keep_pixels

    def __call__(self, t: pa.Table) -> pa.Table:
        n = t.num_rows
        hs = (t.column(self.out_h_col).to_pylist() if self.out_h_col
              else [self.out_h] * n)
        ws = (t.column(self.out_w_col).to_pylist() if self.out_w_col
              else [self.out_w] * n)
        ok, rw, rh, sums, rasters = [], [], [], [], []
        for v, th, tw in zip(t.column(self.payload_col), hs, ws):
            px = decode_pixels(v.as_py())
            if px is None or th is None or tw is None or th <= 0 or tw <= 0:
                ok.append(False)
                rw.append(None)
                rh.append(None)
                sums.append(None)
                rasters.append(None)
                continue
            r = resize_image(px, int(th), int(tw), method=self.method)
            ok.append(True)
            rh.append(r.shape[0])
            rw.append(r.shape[1])
            sums.append(int(r.sum(dtype=np.int64)))
            rasters.append(r.tobytes() if self.keep_pixels else None)
        out = (
            t.drop_columns([self.payload_col])
            .append_column("resize_ok", pa.array(ok, pa.bool_()))
            .append_column("resized_width", pa.array(rw, pa.int32()))
            .append_column("resized_height", pa.array(rh, pa.int32()))
            .append_column("resized_sum", pa.array(sums, pa.int64()))
        )
        if self.keep_pixels:
            out = out.append_column(
                "resized_rgb", pa.array(rasters, pa.large_binary())
            )
        return out


def resize_images(ds, payload_col: str = "blob", *, batch_size: int = 64,
                  concurrency=None, **kwargs):
    """Actor-pool resize stage over a Dataset with a binary image column
    (see :class:`ImageResizer` for target/method/keep_pixels options).
    The default pool is FIXED at default_pool() size — Ray 2.49's pool
    autoscaler plateaus ~1 actor above the minimum (see default_pool)."""
    if concurrency is None:
        from medea_ray.engine.pipeline import default_pool

        concurrency = default_pool()
    return ds.map_batches(
        ImageResizer,
        fn_constructor_kwargs=dict(payload_col=payload_col, **kwargs),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=0.75,
    )


FRAME_STATS_SCHEMA = pa.schema(
    [
        ("frames_ok", pa.bool_()),
        ("n_frames", pa.int32()),
        ("n_sampled", pa.int32()),
        ("frame_width", pa.int32()),
        ("frame_height", pa.int32()),
        ("px_sum", pa.int64()),
    ]
)


class FrameSampler:
    """Video-style frame sampling over a binary column of animated GIFs
    or MJPEG AVIs: decode every frame, keep every ``every``-th (frames 0,
    every, 2*every, …), and emit small typed per-document stats — the
    decode / frame-sample / feature-extract shape the north rule asks of
    video columns, with both in-repo codecs (no media libraries).

    ``px_sum`` is the integer sum of the sampled frames' red-channel
    values. For GIF (== palette indices under the fixture's
    grayscale-identity palette) the whole decode → sample → reduce path
    is SQL-recomputable for the driver oracle; for AVI the frames are
    lossy JPEG, so exactness is guarded by ``mjpeg_avi_guard`` instead."""

    def __init__(self, payload_col: str = "blob", every: int = 2):
        if every < 1:
            raise ValueError("every must be >= 1")
        self.payload_col = payload_col
        self.every = every

    def _decode(self, p: bytes):
        """(n_frames, width, height, SAMPLED red-channel grids) or None.

        The every-th slice happens before the per-frame red-channel
        materialization (palette fancy-index / channel slice-copy), so
        skipped frames never allocate a full-size array."""
        if p[:4] == b"RIFF" and p[8:12] == b"AVI ":
            d = decode_avi_frames(p)
            if d is None:
                return None
            return len(d["frames"]), d["width"], d["height"], [
                f[:, :, 0] for f in d["frames"][:: self.every]
            ]
        g = decode_gif_frames(p)
        if g is None:
            return None
        return len(g["frames"]), g["width"], g["height"], [
            pal[grid, 0]
            for grid, pal in zip(
                g["frames"][:: self.every], g["palettes"][:: self.every]
            )
        ]

    def __call__(self, batch: pa.Table) -> pa.Table:
        ok, nf, ns, fw, fh, px = [], [], [], [], [], []
        for p in batch.column(self.payload_col).to_pylist():
            d = self._decode(p) if p is not None else None
            if d is None:
                ok.append(False)
                nf.append(None)
                ns.append(None)
                fw.append(None)
                fh.append(None)
                px.append(None)
                continue
            n, w, h, sampled = d
            total = sum(int(r.astype(np.int64).sum()) for r in sampled)
            ok.append(True)
            nf.append(n)
            ns.append(len(sampled))
            fw.append(w)
            fh.append(h)
            px.append(total)
        out = batch.drop_columns([self.payload_col])
        for (name, typ), vals in zip(
            [(f.name, f.type) for f in FRAME_STATS_SCHEMA], [ok, nf, ns, fw, fh, px]
        ):
            out = out.append_column(name, pa.array(vals, typ))
        return out


def sample_frames(
    ds,
    payload_col: str = "blob",
    every: int = 2,
    batch_size: int = 64,
    concurrency=(1, 8),
):
    """Actor-pool frame-sampling stage (small batches: payloads are
    multi-frame binaries); the binary column never flows downstream."""
    return ds.map_batches(
        FrameSampler,
        fn_constructor_kwargs=dict(payload_col=payload_col, every=every),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


class MediaFeatureExtractor:
    """Actor-pool map_batches stage over a binary column.

    A real deployment loads the codec/model once here in ``__init__`` (the
    same pattern as ValidatorActor); ``__call__`` decodes per row and emits
    small typed features, dropping the binary payload.
    """

    def __init__(self, payload_col: str = "html", decoder: str = "builtin"):
        self.payload_col = payload_col
        if decoder == "builtin":
            self.decode = builtin_decode
        elif decoder == "fake":
            self.decode = _fake_decode
        elif decoder in ("pil", "ffmpeg"):
            raise NotImplementedError(
                f"decoder {decoder!r} requires media libraries not present in "
                "this environment; decoder='builtin' handles BMP/PPM/WAV/PNG "
                "without them"
            )
        else:
            raise ValueError(f"unknown decoder {decoder!r}")

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column(self.payload_col).to_pylist()
        ok, fmt, w, h, nb, feat = [], [], [], [], [], []
        for p in payloads:
            if p is None:
                ok.append(False)
                fmt.append(None)
                w.append(None)
                h.append(None)
                nb.append(0)
                feat.append(None)
                continue
            d = self.decode(p)
            ok.append(d["ok"])
            fmt.append(d["format"])
            w.append(d["width"])
            h.append(d["height"])
            nb.append(len(p))
            feat.append(d["feature"])
        out = batch.drop_columns([self.payload_col])  # binary never flows on
        for name, vals, typ in [
            ("media_ok", ok, pa.bool_()),
            ("media_format", fmt, pa.string()),
            ("media_width", w, pa.int32()),
            ("media_height", h, pa.int32()),
            ("media_n_bytes", nb, pa.int64()),
            ("media_feature", feat, pa.list_(pa.float32())),
        ]:
            out = out.append_column(name, pa.array(vals, typ))
        return out


def extract_media_features(
    ds,
    payload_col: str = "html",
    decoder: str = "builtin",
    batch_size: int = 64,
    concurrency=(1, 8),
):
    """read → decode/feature-extract (actor pool, small batches) →
    narrow typed output."""
    return ds.map_batches(
        MediaFeatureExtractor,
        fn_constructor_kwargs=dict(payload_col=payload_col, decoder=decoder),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )
