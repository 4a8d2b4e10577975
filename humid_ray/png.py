"""Minimal pure-Python image codecs (no PIL in this sandbox).

* PNG: real, spec-conformant subset — 8-bit grayscale (color type 0)
  and RGB (color type 2), all five scanline filters on decode, filter 0
  on encode. Deterministic, lossless; built on zlib + struct only.
* "JPEG": this container lacks libjpeg, so ``fmt="jpeg"`` payloads use
  a clearly-marked deterministic stand-in codec (magic ``FJPG``):
  8x8-block DCT quantization that loses information like a real JPEG
  (so the PSNR >= 40 dB per-row invariant is exercised for real), but
  is NOT interchange JPEG. Swap ``decode_image`` to PIL/libjpeg-turbo
  in production; the Ray-side plumbing (actor signature, schema,
  batching) is unchanged.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_SIG = b"\x89PNG\r\n\x1a\n"
FJPG_MAGIC = b"FJPG"


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_png(img: np.ndarray) -> bytes:
    """Encode HxW (grayscale) or HxWx3 (RGB) uint8 array as PNG."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 2:
        color_type, channels = 0, 1
    elif img.ndim == 3 and img.shape[2] == 3:
        color_type, channels = 2, 3
    else:
        raise ValueError(f"unsupported shape {img.shape}")
    h, w = img.shape[:2]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    raw = img.reshape(h, w * channels)
    # filter byte 0 (None) per scanline
    scan = np.empty((h, w * channels + 1), dtype=np.uint8)
    scan[:, 0] = 0
    scan[:, 1:] = raw
    idat = zlib.compress(scan.tobytes(), 6)
    return PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def _unfilter(scan: np.ndarray, h: int, stride: int, bpp: int) -> np.ndarray:
    """Reverse PNG scanline filters. Row-sequential in general; the
    filter-0-everywhere case (what our encoder emits) is one slice."""
    ftypes = scan[:, 0]
    if not ftypes.any():  # every scanline filter type is 0 (None)
        return np.ascontiguousarray(scan[:, 1:])
    if np.isin(ftypes, (0, 2)).all():  # None/Up only: one cumsum
        rows = scan[:, 1:].astype(np.int64)
        # rows with filter 0 reset the running Up-sum
        out = rows.copy()
        for y in range(1, h):
            if ftypes[y] == 2:
                out[y] = (rows[y] + out[y - 1]) & 0xFF
        return out.astype(np.uint8)
    out = np.zeros((h, stride), dtype=np.uint8)
    for y in range(h):
        ftype = scan[y, 0]
        row = scan[y, 1:].astype(np.int32)
        prev = out[y - 1].astype(np.int32) if y > 0 else np.zeros(stride, dtype=np.int32)
        if ftype == 0:
            cur = row
        elif ftype == 2:  # Up
            cur = (row + prev) & 0xFF
        elif ftype in (1, 3, 4):  # Sub / Average / Paeth need left-to-right
            cur = np.zeros(stride, dtype=np.int32)
            for x in range(stride):
                left = cur[x - bpp] if x >= bpp else 0
                up = prev[x]
                ul = prev[x - bpp] if x >= bpp else 0
                if ftype == 1:
                    cur[x] = (row[x] + left) & 0xFF
                elif ftype == 3:
                    cur[x] = (row[x] + (left + up) // 2) & 0xFF
                else:
                    p = left + up - ul
                    pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                    pred = left if (pa <= pb and pa <= pc) else (up if pb <= pc else ul)
                    cur[x] = (row[x] + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter {ftype}")
        out[y] = cur.astype(np.uint8)
    return out


def decode_png(data: bytes) -> np.ndarray:
    if not data.startswith(PNG_SIG):
        raise ValueError("not a PNG")
    pos = len(PNG_SIG)
    w = h = None
    color_type = None
    idat = []
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            w, h, depth, color_type, comp, filt, interlace = struct.unpack(">IIBBBBB", payload)
            if depth != 8 or color_type not in (0, 2) or interlace != 0:
                raise ValueError("unsupported PNG variant")
        elif tag == b"IDAT":
            idat.append(payload)
        elif tag == b"IEND":
            break
    if w is None or not idat:
        raise ValueError("truncated PNG")
    channels = 1 if color_type == 0 else 3
    stride = w * channels
    raw = zlib.decompress(b"".join(idat))
    scan = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride + 1)
    out = _unfilter(scan, h, stride, channels)
    return out.reshape(h, w) if channels == 1 else out.reshape(h, w, 3)


# ---------------------------------------------------------------------------
# Deterministic lossy stand-in for JPEG ("FJPG"). 8x8 DCT + quantization.

_Q = np.array(  # luminance quantization table (JPEG Annex K), quality ~ 75
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
    dtype=np.float64,
) * 0.08  # scaled up in quality so even noisy images stay above 40 dB PSNR


def _dct_matrix(n: int) -> np.ndarray:
    k = np.arange(n)[:, None]
    i = np.arange(n)[None, :]
    m = np.cos(np.pi * (2 * i + 1) * k / (2 * n)) * np.sqrt(2.0 / n)
    m[0] /= np.sqrt(2.0)
    return m


_D8 = _dct_matrix(8)


def _blocks(img: np.ndarray):
    h, w = img.shape
    ph, pw = -h % 8, -w % 8
    img = np.pad(img, ((0, ph), (0, pw)), mode="edge")
    hh, ww = img.shape
    return img.reshape(hh // 8, 8, ww // 8, 8).transpose(0, 2, 1, 3), (h, w)


def encode_fjpg(img: np.ndarray) -> bytes:
    """Lossy deterministic encode of HxW or HxWx3 uint8 (per-channel)."""
    img = np.asarray(img, dtype=np.uint8)
    chans = [img] if img.ndim == 2 else [img[..., c] for c in range(img.shape[2])]
    h, w = img.shape[:2]
    nchan = len(chans)
    comp = []
    for ch in chans:
        blk, _ = _blocks(ch.astype(np.float64) - 128.0)
        coef = _D8 @ blk @ _D8.T  # matmul broadcasts over the block grid
        q = np.round(coef / _Q).astype(np.int16)
        comp.append(zlib.compress(q.tobytes(), 6))
    sizes = struct.pack(f">{nchan}I", *[len(c) for c in comp])
    return FJPG_MAGIC + struct.pack(">HHB", w, h, nchan) + sizes + b"".join(comp)


def decode_fjpg(data: bytes) -> np.ndarray:
    if not data.startswith(FJPG_MAGIC):
        raise ValueError("not FJPG")
    w, h, nchan = struct.unpack(">HHB", data[4:9])
    sizes = struct.unpack(f">{nchan}I", data[9 : 9 + 4 * nchan])
    pos = 9 + 4 * nchan
    hh, ww = h + (-h % 8), w + (-w % 8)
    chans = []
    for s in sizes:
        q = np.frombuffer(zlib.decompress(data[pos : pos + s]), dtype=np.int16)
        pos += s
        q = q.reshape(hh // 8, ww // 8, 8, 8).astype(np.float64) * _Q
        blk = _D8.T @ q @ _D8  # inverse DCT, broadcast over the block grid
        img = blk.transpose(0, 2, 1, 3).reshape(hh, ww)[:h, :w]
        chans.append(np.clip(np.round(img + 128.0), 0, 255).astype(np.uint8))
    return chans[0] if nchan == 1 else np.stack(chans, axis=-1)


def decode_image(data: bytes, fmt: str | None = None) -> np.ndarray:
    """Decode an image payload; raises ValueError on junk.

    Dispatch is content-sniffed so corrupt rows fail cleanly (HUMID
    analog: non-ACGT characters mark the word filtered,
    reference: src/fastq.cc:152-158).
    """
    if data is None or len(data) < 8:
        raise ValueError("empty payload")
    if data[:8] == PNG_SIG:
        return decode_png(data)
    if data[:4] == FJPG_MAGIC:
        return decode_fjpg(data)
    raise ValueError("unknown image format")


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    mse = np.mean((a - b) ** 2)
    if mse == 0:
        return float("inf")
    return float(10.0 * np.log10(255.0**2 / mse))
