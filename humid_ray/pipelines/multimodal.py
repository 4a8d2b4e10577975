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


# --- audio/video near-duplicate pairs (the flagship dedup machinery on ----
# the A/V modalities: per-clip ITEM SETS — frame pHashes for video,
# spectral landmarks for audio — play the role of shingle sets)

def _set_signature_table(ids: list, flat: list, counts: list, n_perms: int) -> pa.Table:
    """(doc_id, minhash, items) rows from per-clip sorted item sets."""
    from humid_ray.functions.minhash import minhash_batch
    from humid_ray.util import UINT64, u64col

    offsets = np.zeros(len(counts) + 1, dtype=np.int64)
    np.cumsum(counts, out=offsets[1:])
    values = np.array(flat, dtype=np.uint64) if flat else np.empty(0, dtype=UINT64)
    mh = minhash_batch(values, offsets, n_perms)
    return pa.table(
        {
            "doc_id": pa.array(ids, type=pa.string()),
            "minhash": pa.FixedSizeListArray.from_arrays(
                u64col(mh.reshape(-1)), n_perms
            ),
            "items": pa.LargeListArray.from_arrays(
                pa.array(offsets, type=pa.int64()), u64col(values)
            ),
        }
    )


def set_neardup_pairs(sigs, threshold: float, n_perms: int, n_bands: int):
    """(doc_id, minhash, items) Dataset -> distinct (doc_a, doc_b,
    jaccard) pairs with EXACT item-set Jaccard >= threshold. MinHash
    banding generates candidates, the carried item sets verify exactly
    — the same candidates-are-a-sketch / edges-are-exact rule as the
    flagship."""
    from ray.data.aggregate import Min

    from humid_ray.functions.minhash import minhash_band_keys
    from humid_ray.util import UINT64

    def expand(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return pa.table(
                {"band_id": pa.array([], type=pa.int32()),
                 "band_key": pa.array([], type=pa.int64()),
                 "doc_id": pa.array([], type=pa.string()),
                 "items": pa.array([], type=pa.large_list(pa.int64()))}
            )
        from humid_ray.stages.lsh import _minhash_of

        mh = _minhash_of(batch)
        keys = minhash_band_keys(mh.view(UINT64), n_bands)
        idx = pa.array(np.repeat(np.arange(n, dtype=np.int64), n_bands))
        cols = {}
        for name in ("doc_id", "items"):
            col = batch.column(name)
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            cols[name] = col.take(idx)
        return pa.table(
            {
                "band_id": pa.array(
                    np.repeat(np.arange(n_bands, dtype=np.int32)[None, :], n, axis=0).reshape(-1)
                ),
                "band_key": pa.array(keys.reshape(-1).view(np.int64), type=pa.int64()),
                "doc_id": cols["doc_id"],
                "items": cols["items"],
            }
        )

    def verify(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {"doc_a": pa.array([], type=pa.string()),
             "doc_b": pa.array([], type=pa.string()),
             "jaccard": pa.array([], type=pa.float64())}
        )
        if group.num_rows < 2:
            return empty
        from humid_ray.stages.lsh import _list_segments
        from humid_ray.util import hash_u64_segments

        ids = np.asarray(group.column("doc_id").to_pylist(), dtype=object)
        order = np.argsort(ids, kind="stable")
        keep = np.r_[True, ids[order][1:] != ids[order][:-1]]
        idx = order[keep]
        ids = ids[idx]
        if len(ids) < 2:
            return empty
        vals, offs = _list_segments(group.column("items"))
        starts, ends = offs[idx], offs[idx + 1]
        # hot-bucket guard: many identical clips land in one bucket —
        # intersect once per UNIQUE item set (items are sorted, so the
        # segment hash is canonical), expand matches to clip pairs
        lens = ends - starts
        seg_offs = np.zeros(len(idx) + 1, dtype=np.int64)
        np.cumsum(lens, out=seg_offs[1:])
        packed = np.concatenate([vals[s:e] for s, e in zip(starts, ends)]) \
            if len(idx) else np.empty(0, dtype=vals.dtype)
        set_hash = hash_u64_segments(packed, seg_offs)
        uniq_h, inv = np.unique(set_hash, return_inverse=True)
        rep = np.zeros(len(uniq_h), dtype=np.int64)
        rep[inv] = np.arange(len(idx))  # any member as representative
        members = [np.flatnonzero(inv == u) for u in range(len(uniq_h))]
        out_a, out_b, out_j = [], [], []

        def emit(i, j, jac):
            a, b = str(ids[i]), str(ids[j])
            if a > b:
                a, b = b, a
            out_a.append(a)
            out_b.append(b)
            out_j.append(jac)

        for u in range(len(uniq_h)):
            mu = members[u]
            for x in range(len(mu)):       # identical sets: Jaccard 1.0
                for y in range(x + 1, len(mu)):
                    emit(mu[x], mu[y], 1.0)
            a = vals[starts[rep[u]]:ends[rep[u]]]
            for v in range(u + 1, len(uniq_h)):
                b = vals[starts[rep[v]]:ends[rep[v]]]
                inter = np.intersect1d(a, b, assume_unique=True).size
                union = a.size + b.size - inter
                if union and inter / union >= threshold:
                    jac = round(inter / union, 6)
                    for i in members[u]:
                        for j in members[v]:
                            emit(i, j, jac)
        return pa.table(
            {"doc_a": pa.array(out_a, type=pa.string()),
             "doc_b": pa.array(out_b, type=pa.string()),
             "jaccard": pa.array(out_j, type=pa.float64())}
        )

    pairs = sigs.map_batches(expand, batch_format="pyarrow", zero_copy_batch=True)
    verified = pairs.groupby(["band_id", "band_key"]).map_groups(
        verify, batch_format="pyarrow"
    )
    out = verified.groupby(["doc_a", "doc_b"]).aggregate(
        Min("jaccard", alias_name="jaccard")
    )
    if out.count() == 0:
        return pa.table(
            {"doc_a": pa.array([], type=pa.string()),
             "doc_b": pa.array([], type=pa.string()),
             "jaccard": pa.array([], type=pa.float64())}
        )
    return out


class _VideoSignature:
    """Per decodable clip: UNIQUE frame-pHash set + MinHash sketch."""

    def __init__(self, n_perms: int, stride: int = 1):
        from humid_ray.av import decode_fvid_frame, fvid_info
        from humid_ray.functions.phash import phash_image

        self.info, self.frame, self.phash = fvid_info, decode_fvid_frame, phash_image
        self.n_perms, self.stride = n_perms, stride

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, flat, counts = [], [], []
        for i, v in enumerate(batch.column("bytes")):
            data = v.as_py()
            try:
                n_frames, _ = self.info(data)
            except Exception:
                continue
            phs = {int(self.phash(self.frame(data, f)))
                   for f in range(0, n_frames, self.stride)}
            ids.append(batch.column("video_id")[i].as_py())
            srt = sorted(phs)
            flat.extend(srt)
            counts.append(len(srt))
        return _set_signature_table(ids, flat, counts, self.n_perms)


def video_neardup_pairs(corpus_dir: str, threshold: float = 0.6,
                        n_perms: int = 64, n_bands: int = 16):
    """Distinct video pairs whose frame-pHash sets have EXACT Jaccard
    >= threshold (the partial-re-upload dedup case)."""
    sigs = read_corpus(corpus_dir, columns=["video_id", "bytes"]).map_batches(
        _VideoSignature, fn_constructor_kwargs={"n_perms": n_perms},
        batch_format="pyarrow", zero_copy_batch=True,
        batch_size=256, concurrency=(1, 8),
    )
    return set_neardup_pairs(sigs, threshold, n_perms, n_bands)


class _AudioSignature:
    """Per decodable clip: spectral landmark set + MinHash sketch."""

    def __init__(self, n_perms: int):
        from humid_ray.av import audio_landmarks, decode_fwav

        self.decode, self.landmarks = decode_fwav, audio_landmarks
        self.n_perms = n_perms

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, flat, counts = [], [], []
        for i, v in enumerate(batch.column("bytes")):
            try:
                samples, sr = self.decode(v.as_py())
            except Exception:
                continue
            codes = self.landmarks(samples, sr)
            ids.append(batch.column("audio_id")[i].as_py())
            flat.extend(codes.tolist())
            counts.append(len(codes))
        return _set_signature_table(ids, flat, counts, self.n_perms)


def audio_neardup_pairs(corpus_dir: str, threshold: float = 0.6,
                        n_perms: int = 64, n_bands: int = 16):
    """Distinct audio pairs whose spectral-landmark sets have EXACT
    Jaccard >= threshold (re-encoded / noise-degraded re-upload dedup)."""
    sigs = read_corpus(corpus_dir, columns=["audio_id", "bytes"]).map_batches(
        _AudioSignature, fn_constructor_kwargs={"n_perms": n_perms},
        batch_format="pyarrow", zero_copy_batch=True,
        batch_size=512, concurrency=(1, 8),
    )
    return set_neardup_pairs(sigs, threshold, n_perms, n_bands)
