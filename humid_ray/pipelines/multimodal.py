"""Multimodal (image/audio/video) column stages.

Payloads are opaque ``binary`` columns with typed metadata (the
input_hint schema). Decode / feature-extract / resize run as
actor-pool ``map_batches`` stages — decoder state built once per actor.

Environment note: this container ships no image/audio libraries, so
PNG decoding is the real pure-Python codec from ``humid_ray.png``,
"jpeg" is the deterministic FJPG stand-in, and audio/video use the
FWAV/FVID stand-in containers — the Ray-side plumbing (schema, batch
size, actor signature, output layout) is real and tested. Every actor
resolves its decoder ONCE in ``__init__`` through the
``humid_ray.codecs`` registry: with Pillow / soundfile / PyAV
installed, ``codec="auto"`` (or ``GRAFT_CODEC=auto``) picks the real
library with per-payload fallback for the stand-in containers; decode-
valued outputs (pHash, decode stats) are codec-dependent by design.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from humid_ray.png import encode_png
from humid_ray.synth import corpus_files


def read_corpus(corpus_dir: str, columns=None):
    return ray.data.read_parquet(corpus_files(corpus_dir), columns=columns)


def decode_pool() -> tuple[int, int]:
    """Fixed-size decode pool (~7/8 of the node) — the flagship
    signature stage's sizing (stages/signatures.py:29). Every query in
    this module has exactly one actor stage and it is the bottleneck
    (pure-Python codec decode), so it gets the node; autoscaling pools
    were measured to stay near their floor on short jobs ((1,8) and
    (1,28) both ~11 s for 20k decode-stats rows vs 4.5 s fixed)."""
    from humid_ray.stages.signatures import default_sig_concurrency

    return default_sig_concurrency()


class DecodeStats:
    """(image_id, ok, width, height, channels, mean_luma) per row.

    The feature-extraction stage shape: decode once, emit small
    numeric features; undecodable rows get ok=False (never crash the
    pipeline — HUMID's filtered-record rule)."""

    def __init__(self, codec: str = "auto"):
        from humid_ray.codecs import image_decoder
        from humid_ray.functions.payloads import PayloadMemo

        # production codec seam: real library when importable
        self.decode = image_decoder(codec)
        self.memo = PayloadMemo()   # byte-identical payloads decode once

    def _one(self, seg) -> tuple:
        try:
            img = self.decode(bytes(seg))
        except Exception:  # noqa: BLE001 - undecodable row -> ok=False
            return (False, 0, 0, 0, 0.0)
        hh, ww = img.shape[:2]
        return (True, ww, hh, 1 if img.ndim == 2 else img.shape[2],
                round(float(img.mean()), 4))

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        ok = np.zeros(n, dtype=bool)
        w = np.zeros(n, dtype=np.int32)
        h = np.zeros(n, dtype=np.int32)
        c = np.zeros(n, dtype=np.int32)
        luma = np.zeros(n, dtype=np.float64)
        for i, hit in enumerate(self.memo.map(batch.column("bytes"),
                                              self._one)):
            ok[i], w[i], h[i], c[i], luma[i] = hit
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
        batch_size=batch_size, concurrency=decode_pool(),
    )


class Thumbnailer:
    """(image_id, thumb: binary PNG, tw, th) — decode -> mean-pool
    resize -> re-encode. Small batch size: rows carry binary payloads."""

    def __init__(self, size: int = 8, codec: str = "auto"):
        from humid_ray.codecs import image_decoder
        from humid_ray.functions.payloads import PayloadMemo

        self.size = size
        self.decode = image_decoder(codec)
        self.memo = PayloadMemo()  # byte-identical payloads resize once

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

    def _one(self, seg) -> bytes | bool:
        try:
            img = self.decode(bytes(seg))
        except Exception:  # noqa: BLE001 - undecodable row -> skipped
            return False
        return encode_png(self._pool(img))

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, thumbs = [], []
        for i, hit in enumerate(self.memo.map(batch.column("bytes"),
                                              self._one)):
            if hit is False:
                continue
            ids.append(batch.column("image_id")[i].as_py())
            thumbs.append(hit)
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
        batch_size=batch_size, concurrency=decode_pool(),
    )


# --- audio / video stages (deterministic FWAV/FVID stand-in codecs; ------
# swap the decode call in __init__ for soundfile / PyAV in production —
# the Ray-side plumbing is identical)

class AudioFeatureExtractor:
    """(audio_id, ok, sr, n_samples, duration, rms, zcr, centroid) per
    row — decode once per row, emit small numeric features; undecodable
    rows get ok=False with nulled features (never crash the pipeline)."""

    def __init__(self, codec: str = "auto"):
        from humid_ray.av import audio_features
        from humid_ray.codecs import audio_decoder

        self.decode = audio_decoder(codec)  # soundfile when importable
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
        batch_size=batch_size, concurrency=decode_pool(),
    )


class VideoFrameSampler:
    """One output row per SAMPLED frame (every ``stride``-th):
    (video_id, frame_idx, fw, fh, frame_phash) — random-access decode
    of only the sampled frames, never the whole clip."""

    def __init__(self, stride: int = 4, codec: str = "auto"):
        from humid_ray.av import fvid_info
        from humid_ray.codecs import video_frame_decoder
        from humid_ray.functions.phash import phash_image

        self.info = fvid_info           # <- container probe in production
        self.frame = video_frame_decoder(codec)  # PyAV when importable
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

    def __init__(self, codec: str = "auto"):
        from humid_ray.av import fvid_info
        from humid_ray.codecs import video_frame_decoder

        self.info = fvid_info
        self.frame = video_frame_decoder(codec)

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
        batch_size=batch_size, concurrency=decode_pool(),
    )


def video_frame_samples(corpus_dir: str, stride: int = 4, batch_size: int = 256):
    return read_corpus(corpus_dir, columns=["video_id", "bytes"]).map_batches(
        VideoFrameSampler, fn_constructor_kwargs={"stride": stride},
        batch_format="pyarrow", zero_copy_batch=True,
        batch_size=batch_size, concurrency=decode_pool(),
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


NO_SET_SALT = -1


def _set_band_counts(sigs, n_bands: int, hot_threshold: int) -> set:
    """Counting pre-pass: {(band_id, band_key)} of buckets whose member
    count exceeds ``hot_threshold`` (same pattern as the flagship's
    band_bucket_counts, stages/lsh.py). The hot set is bounded by the
    number of pathological buckets, not the corpus."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    from humid_ray.functions.minhash import minhash_band_keys
    from humid_ray.stages.lsh import _minhash_of
    from humid_ray.util import UINT64

    def partial(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return pa.table(
                {"band_id": pa.array([], type=pa.int32()),
                 "band_key": pa.array([], type=pa.int64()),
                 "n": pa.array([], type=pa.int64())}
            )
        keys = minhash_band_keys(_minhash_of(batch).view(UINT64), n_bands)
        flat = keys.reshape(-1).view(np.int64)
        bands = np.tile(np.arange(n_bands, dtype=np.int32), n)
        order = np.lexsort((flat, bands))
        fb, fk = bands[order], flat[order]
        new = np.r_[True, (fb[1:] != fb[:-1]) | (fk[1:] != fk[:-1])]
        s = np.flatnonzero(new)
        return pa.table(
            {"band_id": pa.array(fb[s], type=pa.int32()),
             "band_key": pa.array(fk[s], type=pa.int64()),
             "n": pa.array(np.diff(np.r_[s, len(fb)]).astype(np.int64))}
        )

    counts = sigs.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    ).groupby(["band_id", "band_key"]).aggregate(Sum("n", alias_name="n"))
    hot: set = set()
    hot_only = counts.map_batches(
        lambda t: t.filter(pc.greater(t.column("n"), hot_threshold)),
        batch_format="pyarrow",
    )
    for b in hot_only.iter_batches(batch_size=65536, batch_format="pyarrow"):
        hot.update(
            zip(b.column("band_id").to_pylist(), b.column("band_key").to_pylist())
        )
    return hot


def set_neardup_pairs(sigs, threshold: float, n_perms: int, n_bands: int,
                      hot_bucket_threshold: int = 256):
    """(doc_id, minhash, items) Dataset -> distinct (doc_a, doc_b,
    jaccard) pairs with EXACT item-set Jaccard >= threshold. MinHash
    banding generates candidates, the carried item sets verify exactly
    — the same candidates-are-a-sketch / edges-are-exact rule as the
    flagship.

    Skew handling (the flagship expand_bands pattern, stages/lsh.py):
    a counting pre-pass flags hot (band, key) buckets; their rows are
    re-emitted once per OTHER band with that band's key as a salt, so
    a hot bucket splits across tasks by second-band agreement.
    Identical item sets agree on every band and are never lost; a
    DISTINCT-set pair inside a hot bucket is kept iff it also agrees
    on some other band (P ≈ 1-(1-t^r)^(bands-1) at the threshold —
    the documented recall trade on pathological buckets only).
    In-kernel work is loop-free: identical sets collapse to one
    representative (hash + element-wise confirm, so a 64-bit collision
    can never fabricate a jaccard=1.0 edge), representative pairs are
    size-window-pruned (J >= t forces a size ratio >= t) and verified
    in memory-bounded chunks via one gathered lexsort per chunk."""
    from ray.data.aggregate import Min

    from humid_ray.functions.minhash import minhash_band_keys
    from humid_ray.util import UINT64

    if hasattr(sigs, "materialize"):
        # the counting pre-pass and the band expansion both consume the
        # signature table; materialize once so the decode actors don't
        # run twice (signature-shaped rows only — no payload)
        sigs = sigs.materialize()
    hot_keys = _set_band_counts(sigs, n_bands, hot_bucket_threshold)
    if n_bands == 1:
        # no other band exists to salt into — salting would silently
        # drop every hot row. Fall back to plain (cold) emission; the
        # chunked verify still bounds per-chunk memory.
        hot_keys = set()
    # per-band int64 key arrays for vectorized membership (a Python
    # set probe per row x band would dominate the banding stage once
    # any hot bucket exists)
    _no_hot = np.empty(0, dtype=np.int64)
    hot_by_band = {}
    for b, key in hot_keys:
        hot_by_band.setdefault(b, []).append(key)
    hot_by_band = {b: np.sort(np.asarray(v, dtype=np.int64))
                   for b, v in hot_by_band.items()}

    def expand(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        mh_type = pa.list_(pa.int64(), n_perms)
        if n == 0:
            return pa.table(
                {"band_id": pa.array([], type=pa.int32()),
                 "band_key": pa.array([], type=pa.int64()),
                 "salt_id": pa.array([], type=pa.int32()),
                 "salt_key": pa.array([], type=pa.int64()),
                 "doc_id": pa.array([], type=pa.string()),
                 "items": pa.array([], type=pa.large_list(pa.int64())),
                 "minhash": pa.array([], type=mh_type)}
            )
        from humid_ray.stages.lsh import _minhash_of

        mh = _minhash_of(batch)
        keys = minhash_band_keys(mh.view(UINT64), n_bands)  # (n, n_bands)
        take_idx, bids, bkeys, sids, skeys = [], [], [], [], []
        for band in range(n_bands):
            k = keys[:, band]
            band_hot = hot_by_band.get(band, _no_hot)
            if len(band_hot):
                hot_mask = np.isin(k.view(np.int64), band_hot)
            else:
                hot_mask = np.zeros(n, dtype=bool)
            cold = np.flatnonzero(~hot_mask)
            if len(cold):
                take_idx.append(cold)
                bids.append(np.full(len(cold), band, dtype=np.int32))
                bkeys.append(k[cold].view(np.int64))
                sids.append(np.full(len(cold), NO_SET_SALT, dtype=np.int32))
                skeys.append(np.zeros(len(cold), dtype=np.int64))
            hot = np.flatnonzero(hot_mask)
            if len(hot):
                for ob in range(n_bands):
                    if ob == band:
                        continue
                    take_idx.append(hot)
                    bids.append(np.full(len(hot), band, dtype=np.int32))
                    bkeys.append(k[hot].view(np.int64))
                    sids.append(np.full(len(hot), ob, dtype=np.int32))
                    skeys.append(keys[hot, ob].view(np.int64))
        idx = pa.array(np.concatenate(take_idx))
        cols = {}
        for name in ("doc_id", "items", "minhash"):
            col = batch.column(name)
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            cols[name] = col.take(idx)
        return pa.table(
            {
                "band_id": pa.array(np.concatenate(bids), type=pa.int32()),
                "band_key": pa.array(np.concatenate(bkeys), type=pa.int64()),
                "salt_id": pa.array(np.concatenate(sids), type=pa.int32()),
                "salt_key": pa.array(np.concatenate(skeys), type=pa.int64()),
                "doc_id": cols["doc_id"],
                "items": cols["items"],
                "minhash": cols["minhash"],
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
        from humid_ray.stages.lsh import _list_segments, _minhash_of
        from humid_ray.util import _gather_segments, hash_u64_segments, \
            pairwise_intersect_sizes

        band = int(group.column("band_id")[0].as_py())
        salt = int(group.column("salt_id")[0].as_py())
        ids = np.asarray(group.column("doc_id").to_pylist(), dtype=object)
        order = np.argsort(ids, kind="stable")
        keep = np.r_[True, ids[order][1:] != ids[order][:-1]]
        idx = order[keep]
        ids = ids[idx]
        n = len(ids)
        if n < 2:
            return empty
        vals, offs = _list_segments(group.column("items"))
        starts, ends = offs[idx], offs[idx + 1]
        lens = ends - starts
        mh = _minhash_of(group)[idx]

        # --- collapse identical item sets: hash, then ELEMENT-WISE
        # confirm within equal-(hash,len) runs so a collision can never
        # fabricate a jaccard=1.0 edge (colliding-but-different sets
        # fall back to being their own representatives and re-enter the
        # exact rep-pair verification below)
        seg_offs = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(lens, out=seg_offs[1:])
        packed = _gather_segments(vals, starts, lens)
        set_hash = hash_u64_segments(packed, seg_offs)
        gorder = np.lexsort((lens, set_hash.view(np.int64)))
        h_s, l_s = set_hash[gorder], lens[gorder]
        new_grp = np.r_[True, (h_s[1:] != h_s[:-1]) | (l_s[1:] != l_s[:-1])]
        gid_sorted = np.cumsum(new_grp) - 1
        rep_sorted = gorder[np.flatnonzero(new_grp)]     # run-rep row idx
        rep_of_row = rep_sorted[gid_sorted]
        mem_vals = _gather_segments(vals, starts[gorder], lens[gorder])
        rep_vals = _gather_segments(vals, starts[rep_of_row], lens[rep_of_row])
        eqflat = mem_vals == rep_vals
        row_offs = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(lens[gorder], out=row_offs[1:])
        okrow = np.ones(n, dtype=bool)
        nz = lens[gorder] > 0
        if nz.any():
            okrow[nz] = np.logical_and.reduceat(eqflat, row_offs[:-1][nz])
        if (~okrow).any():
            bad = np.flatnonzero(~okrow)
            gid_sorted = gid_sorted.copy()
            gid_sorted[bad] = gid_sorted.max() + 1 + np.arange(len(bad))
        gid = np.empty(n, dtype=np.int64)
        gid[gorder] = gid_sorted
        morder = np.argsort(gid, kind="stable")
        g_sorted = gid[morder]
        gbounds = np.flatnonzero(np.r_[True, g_sorted[1:] != g_sorted[:-1], True])
        grp_start, grp_end = gbounds[:-1], gbounds[1:]
        gsize = grp_end - grp_start
        n_groups = len(gsize)
        rep_rows = morder[grp_start]

        def salt_keep(ra: np.ndarray, rb: np.ndarray) -> np.ndarray:
            """First-equal-OTHER-band rule: a salted bucket emits a pair
            only when ``salt`` is the smallest other band the two
            minhashes agree on (locally recomputable, so each pair is
            produced by exactly one salt of this primary band)."""
            if salt == NO_SET_SALT or len(ra) == 0:
                return np.ones(len(ra), dtype=bool)
            ka = minhash_band_keys(mh[ra].view(UINT64), n_bands)
            kb = minhash_band_keys(mh[rb].view(UINT64), n_bands)
            eq = ka == kb
            eq[:, band] = False
            first = np.full(len(ra), n_bands, dtype=np.int64)
            for ob in range(n_bands - 1, -1, -1):
                first = np.where(eq[:, ob], ob, first)
            return first == salt

        def ordered(ra: np.ndarray, rb: np.ndarray):
            A, B = ids[ra], ids[rb]
            swap = A > B
            return np.where(swap, B, A), np.where(swap, A, B)

        parts_a, parts_b, parts_j = [], [], []

        # --- intra-group pairs: identical sets, jaccard exactly 1.0
        flat_pos = np.arange(n, dtype=np.int64)
        cnt = np.repeat(grp_end, gsize) - flat_pos - 1
        total = int(cnt.sum())
        if total:
            ii_f = np.repeat(flat_pos, cnt)
            within = np.arange(total, dtype=np.int64) - np.repeat(
                np.cumsum(np.r_[0, cnt[:-1]]), cnt
            )
            jj_f = ii_f + 1 + within
            ra, rb = morder[ii_f], morder[jj_f]
            km = salt_keep(ra, rb)
            if km.any():
                a, b = ordered(ra[km], rb[km])
                parts_a.append(a)
                parts_b.append(b)
                parts_j.append(np.ones(int(km.sum()), dtype=np.float64))

        # --- representative pairs: size-window candidates, exact
        # verification in memory-bounded chunks (never the full O(G^2)
        # triangle in one allocation)
        if n_groups >= 2:
            rsize = lens[rep_rows].astype(np.int64)
            rord = np.lexsort((np.arange(n_groups), rsize))
            rs = rsize[rord]
            hi = np.searchsorted(rs, rs.astype(np.float64) / max(threshold, 1e-9),
                                 side="right")
            wcnt = np.maximum(hi - np.arange(n_groups) - 1, 0)
            wtotal = int(wcnt.sum())
            wcum = np.cumsum(np.r_[0, wcnt[:-1]])
            max_len = int(lens.max()) if n else 1
            chunk = max(1024, (1 << 22) // max(1, 2 * max_len))
            for lo in range(0, wtotal, chunk):
                pids = np.arange(lo, min(lo + chunk, wtotal), dtype=np.int64)
                pu = np.searchsorted(wcum, pids, side="right") - 1
                pv = pu + 1 + (pids - wcum[pu])
                gu, gv = rord[pu], rord[pv]
                ru, rv = rep_rows[gu], rep_rows[gv]
                inter = pairwise_intersect_sizes(vals, starts, ends, ru, rv)
                union = lens[ru] + lens[rv] - inter
                ok = (union > 0) & (inter >= threshold * union)
                ok &= salt_keep(ru, rv)
                if not ok.any():
                    continue
                gu, gv, ru, rv = gu[ok], gv[ok], ru[ok], rv[ok]
                jac = np.round(inter[ok] / union[ok], 6)
                su, sv = gsize[gu], gsize[gv]
                cntm = su * sv
                totm = int(cntm.sum())
                pidx = np.repeat(np.arange(len(gu), dtype=np.int64), cntm)
                within = np.arange(totm, dtype=np.int64) - np.repeat(
                    np.cumsum(np.r_[0, cntm[:-1]]), cntm
                )
                a_loc = within // sv[pidx]
                b_loc = within % sv[pidx]
                ra = morder[grp_start[gu][pidx] + a_loc]
                rb = morder[grp_start[gv][pidx] + b_loc]
                a, b = ordered(ra, rb)
                parts_a.append(a)
                parts_b.append(b)
                parts_j.append(jac[pidx])
        if not parts_a:
            return empty
        return pa.table(
            {"doc_a": pa.array(np.concatenate(parts_a).tolist(), type=pa.string()),
             "doc_b": pa.array(np.concatenate(parts_b).tolist(), type=pa.string()),
             "jaccard": pa.array(np.concatenate(parts_j))}
        )

    pairs = sigs.map_batches(expand, batch_format="pyarrow", zero_copy_batch=True)
    verified = pairs.groupby(["band_id", "band_key", "salt_id", "salt_key"]).map_groups(
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

    def __init__(self, n_perms: int, stride: int = 1,
                 codec: str = "auto"):
        from humid_ray.av import fvid_info
        from humid_ray.codecs import video_frame_decoder
        from humid_ray.functions.phash import phash_image

        self.info, self.phash = fvid_info, phash_image
        self.frame = video_frame_decoder(codec)
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
        batch_size=256, concurrency=decode_pool(),
    )
    return set_neardup_pairs(sigs, threshold, n_perms, n_bands)


class _AudioSignature:
    """Per decodable clip: spectral landmark set + MinHash sketch."""

    def __init__(self, n_perms: int, codec: str = "auto"):
        from humid_ray.av import audio_landmarks
        from humid_ray.codecs import audio_decoder

        self.decode, self.landmarks = audio_decoder(codec), audio_landmarks
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
        batch_size=512, concurrency=decode_pool(),
    )
    return set_neardup_pairs(sigs, threshold, n_perms, n_bands)
