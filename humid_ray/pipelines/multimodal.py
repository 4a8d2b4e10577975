"""Multimodal (image/audio/video) column stages.

Payloads are opaque ``binary`` columns with typed metadata (the
input_hint schema). Decode / feature-extract / resize run as
actor-pool ``map_batches`` stages — decoder state built once per actor.

Environment note: this container ships no image/audio libraries, so
PNG decoding is the real pure-Python codec from ``humid_ray.png``,
"jpeg" is the deterministic FJPG stand-in, and audio/video decode are
STUBS gated behind NotImplementedError — the Ray-side plumbing
(schema, batch size, actor signature, output layout) is real and
tested; swap the codec call in the actor ``__init__`` for production.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from humid_ray.png import decode_image, encode_png
from humid_ray.synth import corpus_files


def read_corpus(corpus_dir: str, columns=None):
    return ray.data.read_parquet(corpus_files(corpus_dir), columns=columns)


class DecodeStats:
    """(image_id, ok, width, height, channels, mean_luma) per row.

    The feature-extraction stage shape: decode once, emit small
    numeric features; undecodable rows get ok=False (never crash the
    pipeline — HUMID's filtered-record rule)."""

    def __init__(self):
        self.decode = decode_image  # decoder "loaded" once per actor

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        ok = np.zeros(n, dtype=bool)
        w = np.zeros(n, dtype=np.int32)
        h = np.zeros(n, dtype=np.int32)
        c = np.zeros(n, dtype=np.int32)
        luma = np.zeros(n, dtype=np.float64)
        for i, v in enumerate(batch.column("bytes")):
            try:
                img = self.decode(v.as_py())
            except Exception:
                continue
            ok[i] = True
            h[i], w[i] = img.shape[:2]
            c[i] = 1 if img.ndim == 2 else img.shape[2]
            luma[i] = round(float(img.mean()), 4)
        return pa.table(
            {
                "image_id": batch.column("image_id"),
                "ok": pa.array(ok),
                "width": pa.array(w),
                "height": pa.array(h),
                "channels": pa.array(c),
                "mean_luma": pa.array(luma),
            }
        )


def decode_stats(corpus_dir: str, batch_size: int = 1024):
    return read_corpus(corpus_dir, columns=["image_id", "bytes"]).map_batches(
        DecodeStats, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=batch_size, concurrency=(1, 8),
    )


class Thumbnailer:
    """(image_id, thumb: binary PNG, tw, th) — decode -> mean-pool
    resize -> re-encode. Small batch size: rows carry binary payloads."""

    def __init__(self, size: int = 8):
        self.size = size

    def _pool(self, img: np.ndarray) -> np.ndarray:
        s = self.size
        hh, ww = img.shape[:2]
        if hh % s == 0 and ww % s == 0:
            # evenly divisible: one reshape-mean, no block loop
            blk = img.reshape(s, hh // s, s, ww // s, *img.shape[2:])
            out = blk.mean(axis=(1, 3))
            return np.clip(np.round(out), 0, 255).astype(np.uint8)
        ys = (np.arange(s + 1) * hh) // s
        xs = (np.arange(s + 1) * ww) // s
        out = np.zeros((s, s) + img.shape[2:], dtype=np.float64)
        for i in range(s):
            for j in range(s):
                out[i, j] = img[ys[i]:ys[i + 1], xs[j]:xs[j + 1]].mean(axis=(0, 1))
        return np.clip(np.round(out), 0, 255).astype(np.uint8)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, thumbs = [], []
        for i, v in enumerate(batch.column("bytes")):
            try:
                img = decode_image(v.as_py())
            except Exception:
                continue
            ids.append(batch.column("image_id")[i].as_py())
            thumbs.append(encode_png(self._pool(img)))
        return pa.table(
            {
                "image_id": pa.array(ids, type=pa.string()),
                "thumb": pa.array(thumbs, type=pa.binary()),
                "tw": pa.array([self.size] * len(ids), type=pa.int32()),
                "th": pa.array([self.size] * len(ids), type=pa.int32()),
            }
        )


def thumbnails(corpus_dir: str, size: int = 8, batch_size: int = 512):
    return read_corpus(corpus_dir, columns=["image_id", "bytes"]).map_batches(
        Thumbnailer, fn_constructor_kwargs={"size": size},
        batch_format="pyarrow", zero_copy_batch=True,
        batch_size=batch_size, concurrency=(1, 8),
    )


# --- audio / video stages (deterministic FWAV/FVID stand-in codecs; ------
# swap the decode call in __init__ for soundfile / PyAV in production —
# the Ray-side plumbing is identical)

class AudioFeatureExtractor:
    """(audio_id, ok, sr, n_samples, duration, rms, zcr, centroid) per
    row — decode once per row, emit small numeric features; undecodable
    rows get ok=False with nulled features (never crash the pipeline)."""

    def __init__(self):
        from humid_ray.av import audio_features, decode_fwav

        self.decode = decode_fwav       # <- soundfile.read in production
        self.features = audio_features

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        ok = np.zeros(n, dtype=bool)
        sr = np.zeros(n, dtype=np.int32)
        ns = np.zeros(n, dtype=np.int32)
        feats = {k: np.zeros(n, dtype=np.float64)
                 for k in ("duration", "rms", "zcr", "centroid")}
        for i, v in enumerate(batch.column("bytes")):
            try:
                samples, rate = self.decode(v.as_py())
            except Exception:
                continue
            ok[i] = True
            sr[i] = rate
            ns[i] = len(samples)
            for k, val in self.features(samples, rate).items():
                feats[k][i] = val
        return pa.table(
            {
                "audio_id": batch.column("audio_id"),
                "ok": pa.array(ok),
                "sr": pa.array(sr),
                "n_samples": pa.array(ns),
                **{k: pa.array(v) for k, v in feats.items()},
            }
        )


def audio_feature_stats(corpus_dir: str, batch_size: int = 1024):
    return read_corpus(corpus_dir, columns=["audio_id", "bytes"]).map_batches(
        AudioFeatureExtractor, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=batch_size, concurrency=(1, 8),
    )


class VideoFrameSampler:
    """One output row per SAMPLED frame (every ``stride``-th):
    (video_id, frame_idx, fw, fh, frame_phash) — random-access decode
    of only the sampled frames, never the whole clip."""

    def __init__(self, stride: int = 4):
        from humid_ray.av import decode_fvid_frame, fvid_info
        from humid_ray.functions.phash import phash_image

        self.info = fvid_info           # <- container probe in production
        self.frame = decode_fvid_frame  # <- PyAV seek+decode in production
        self.phash = phash_image
        self.stride = stride

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, idxs, ws, hs, phs = [], [], [], [], []
        for i, v in enumerate(batch.column("bytes")):
            data = v.as_py()
            try:
                n_frames, _ = self.info(data)
            except Exception:
                continue
            vid = batch.column("video_id")[i].as_py()
            for f in range(0, n_frames, self.stride):
                img = self.frame(data, f)
                ids.append(vid)
                idxs.append(f)
                hs.append(img.shape[0])
                ws.append(img.shape[1])
                phs.append(np.uint64(self.phash(img)).astype(np.int64).item())
        return pa.table(
            {
                "video_id": pa.array(ids, type=pa.string()),
                "frame_idx": pa.array(idxs, type=pa.int32()),
                "fw": pa.array(ws, type=pa.int32()),
                "fh": pa.array(hs, type=pa.int32()),
                "frame_phash": pa.array(phs, type=pa.int64()),
            }
        )


class _VideoDims:
    """(video_id, n_frames, w, h) per decodable clip — container probe
    plus ONE frame decode, matching the stored metadata columns (the
    SQL-oracle surface for the video decode path)."""

    def __init__(self):
        from humid_ray.av import decode_fvid_frame, fvid_info

        self.info = fvid_info
        self.frame = decode_fvid_frame

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, nf, ws, hs = [], [], [], []
        for i, v in enumerate(batch.column("bytes")):
            data = v.as_py()
            try:
                n_frames, _ = self.info(data)
                img = self.frame(data, 0)
            except Exception:
                continue
            ids.append(batch.column("video_id")[i].as_py())
            nf.append(n_frames)
            hs.append(img.shape[0])
            ws.append(img.shape[1])
        return pa.table(
            {
                "video_id": pa.array(ids, type=pa.string()),
                "n_frames": pa.array(nf, type=pa.int32()),
                "w": pa.array(ws, type=pa.int32()),
                "h": pa.array(hs, type=pa.int32()),
            }
        )


def video_decode_dims(corpus_dir: str, batch_size: int = 256):
    return read_corpus(corpus_dir, columns=["video_id", "bytes"]).map_batches(
        _VideoDims, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=batch_size, concurrency=(1, 8),
    )


def video_frame_samples(corpus_dir: str, stride: int = 4, batch_size: int = 256):
    return read_corpus(corpus_dir, columns=["video_id", "bytes"]).map_batches(
        VideoFrameSampler, fn_constructor_kwargs={"stride": stride},
        batch_format="pyarrow", zero_copy_batch=True,
        batch_size=batch_size, concurrency=(1, 8),
    )
