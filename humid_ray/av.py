"""Deterministic stand-in audio/video codecs (no codec libs in this
sandbox; mirrors the FJPG approach in png.py).

* FWAV: mono 16-bit PCM in a zlib container — lossless, deterministic.
* FVID: a frame index + per-frame FJPG payloads — lossy like the image
  stand-in, with random access to single frames (the property a real
  frame sampler needs from a video container).

Swap ``decode_fwav``/``iter_fvid_frames`` for soundfile / PyAV in
production; the Ray-side plumbing in pipelines/multimodal.py (actor
signatures, schemas, batch sizes, output layout) is unchanged.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

from humid_ray.png import decode_fjpg, encode_fjpg

FWAV_MAGIC = b"FWAV"
FVID_MAGIC = b"FVID"


def encode_fwav(samples: np.ndarray, sr: int) -> bytes:
    """Mono int16 samples -> FWAV bytes."""
    s = np.asarray(samples, dtype=np.int16)
    payload = zlib.compress(s.tobytes(), 6)
    return FWAV_MAGIC + struct.pack(">II", sr, len(s)) + payload


def decode_fwav(data: bytes) -> tuple[np.ndarray, int]:
    """FWAV bytes -> (int16 samples, sample rate); raises on junk."""
    if data is None or len(data) < 12 or data[:4] != FWAV_MAGIC:
        raise ValueError("not FWAV")
    sr, n = struct.unpack(">II", data[4:12])
    samples = np.frombuffer(zlib.decompress(data[12:]), dtype=np.int16)
    if len(samples) != n:
        raise ValueError("truncated FWAV")
    return samples, sr


def encode_fvid(frames: list[np.ndarray], fps: int = 8) -> bytes:
    """Frame list -> FVID bytes (frame index + FJPG payloads)."""
    blobs = [encode_fjpg(f) for f in frames]
    head = FVID_MAGIC + struct.pack(">HH", fps, len(blobs))
    index = struct.pack(f">{len(blobs)}I", *[len(b) for b in blobs])
    return head + index + b"".join(blobs)


def fvid_info(data: bytes) -> tuple[int, int]:
    """(n_frames, fps) without decoding any frame."""
    if data is None or len(data) < 8 or data[:4] != FVID_MAGIC:
        raise ValueError("not FVID")
    fps, n = struct.unpack(">HH", data[4:8])
    return n, fps


def decode_fvid_frame(data: bytes, i: int) -> np.ndarray:
    """Random-access decode of frame ``i`` (no full-video decode)."""
    n, _ = fvid_info(data)
    if not 0 <= i < n:
        raise IndexError(f"frame {i} of {n}")
    sizes = struct.unpack(f">{n}I", data[8 : 8 + 4 * n])
    pos = 8 + 4 * n + sum(sizes[:i])
    return decode_fjpg(data[pos : pos + sizes[i]])


def audio_landmarks(samples: np.ndarray, sr: int, frame: int = 2048,
                    hop: int = 1024, tq: int = 4, fq: int = 4,
                    n_peaks: int = 3) -> np.ndarray:
    """Spectral landmark set of a clip (Shazam-style, deterministic):
    per analysis frame the ``n_peaks`` strongest rFFT bins, quantized
    in time (//tq frames) and frequency (//fq bins), each packed with
    its per-frame RANK into one int64 code. The rank keeps single-tone
    clips from colliding whenever their dominant bins merely coincide
    — two clips match only if their whole peak ORDERING agrees. Robust
    to small additive noise (peak bins and their order are stable),
    fully vectorized (one 2-D rFFT + one argpartition). Returns sorted
    unique int64 landmark codes."""
    x = np.asarray(samples, dtype=np.float64)
    if len(x) < frame:
        x = np.pad(x, (0, frame - len(x)))
    n_frames = 1 + (len(x) - frame) // hop
    idx = np.arange(frame)[None, :] + hop * np.arange(n_frames)[:, None]
    spec = np.abs(np.fft.rfft(x[idx] * np.hanning(frame)[None, :], axis=1))[:, 1:]
    k = min(n_peaks, spec.shape[1])
    top = np.argpartition(-spec, k - 1, axis=1)[:, :k]
    # order the top-k by magnitude desc (bin asc on exact ties)
    mags = np.take_along_axis(spec, top, axis=1)
    order = np.lexsort((top, -mags), axis=1)
    top = np.take_along_axis(top, order, axis=1) + 1  # undo DC skip
    t_codes = (np.arange(n_frames, dtype=np.int64) // tq)[:, None]
    rank = np.arange(k, dtype=np.int64)[None, :]
    codes = (t_codes << 24) | (rank << 16) | (top // fq).astype(np.int64)
    return np.unique(codes.reshape(-1))


def audio_features(samples: np.ndarray, sr: int) -> dict:
    """Deterministic features of a mono int16 clip, all vectorized:
    duration, RMS, zero-crossing rate, spectral centroid (rFFT)."""
    x = np.asarray(samples, dtype=np.float64) / 32768.0
    n = len(x)
    if n == 0:
        return {"duration": 0.0, "rms": 0.0, "zcr": 0.0, "centroid": 0.0}
    rms = float(np.sqrt(np.mean(x * x)))
    zcr = float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1]))) if n > 1 else 0.0
    spec = np.abs(np.fft.rfft(x))
    freqs = np.fft.rfftfreq(n, d=1.0 / sr)
    denom = spec.sum()
    centroid = float((freqs * spec).sum() / denom) if denom > 0 else 0.0
    return {
        "duration": round(n / sr, 6),
        "rms": round(rms, 6),
        "zcr": round(zcr, 6),
        "centroid": round(centroid, 4),
    }
