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


# --- stubs for modalities whose codecs are absent in this sandbox ---------

class AudioFeatureStub:
    """Shape-complete audio feature stage. Real implementation would
    hold a decoder (soundfile/librosa) in __init__; here decode raises.
    """

    def __init__(self):
        def _decode(_: bytes) -> np.ndarray:
            raise NotImplementedError(
                "audio decode requires an audio codec library; not "
                "available in this sandbox"
            )

        self.decode = _decode

    def __call__(self, batch: pa.Table) -> pa.Table:
        raise NotImplementedError("audio decoding not available in this sandbox")


class VideoFrameSampleStub:
    """Shape-complete video frame-sampling stage (stub, same contract:
    binary column in, per-frame rows out)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        raise NotImplementedError("video decoding not available in this sandbox")
