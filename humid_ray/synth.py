"""Deterministic synthetic image+caption corpus (input_hint schema).

Writes parquet with EXACTLY the columns
``(image_id, bytes, w, h, fmt, caption, phash)`` — the Lance-table
shape from BASELINE.json:input_hint (Lance itself is not installed in
this sandbox; parquet is the documented dev fallback).

The corpus plants the duplicate families from FIXTURES.md — exact-dup
multiplicities, 1-bit / m-bit / (m+1)-bit signature neighbors, the
count-skew directional chain (2,4,8,10,3 from reference
tests/test_cluster.cc:73-137), a hot LSH band, and filtered rows
(empty caption / empty bytes / undecodable bytes — the analog of
HUMID's N-base rule, reference src/fastq.cc:152-158).

Generation is pure per group id (seeded rng per group), so any row
range can be produced independently and in parallel; corpora are
cached on disk keyed by (n_rows, seed).
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from humid_ray.functions.phash import phash_image
from humid_ray.png import encode_fjpg, encode_png

H = W = 32  # default; overridable per corpus via img_hw

# group kind cycle; one full cycle = 14 groups / 49 rows
CYCLE = (
    ["uniq"] * 5 + ["pair"] * 2 + ["fam5"] + ["nbr"] * 2 + ["far"]
    + ["chain"] + ["hot"] + ["filtered"]
)
ROWS_PER = {"uniq": 1, "pair": 2, "fam5": 5, "nbr": 2, "far": 2,
            "chain": 27, "hot": 1, "filtered": 1}
CYCLE_ROWS = sum(ROWS_PER[k] for k in CYCLE)  # 49
CHAIN_MULTS = [2, 4, 8, 10, 3]  # reference tests/test_cluster.cc:73-137

VOCAB = [f"w{i:03d}" for i in range(256)]
HOT_TOP32 = 0x9E3779B9  # shared top-32 phash bits -> one hot LSH band


def _image(rng: np.random.Generator, hw: int = H) -> np.ndarray:
    kind = rng.integers(0, 3)
    x = np.arange(hw)[None, :]
    y = np.arange(hw)[:, None]
    if kind == 0:  # gradient
        a, b = rng.uniform(-4, 4, 2)
        img = a * x + b * y + rng.uniform(0, 255)
    elif kind == 1:  # sinusoid
        fx, fy = rng.uniform(0.1, 1.0, 2)
        img = 127 + 120 * np.sin(fx * x + fy * y + rng.uniform(0, 6))
    else:  # blocks
        img = np.kron(rng.uniform(0, 255, (4, 4)), np.ones((hw // 4, hw // 4)))
    img = img + rng.normal(0, 3, (hw, hw))
    return np.clip(img, 0, 255).astype(np.uint8)


def _caption(rng: np.random.Generator) -> str:
    n = int(rng.integers(6, 15))
    return " ".join(VOCAB[i] for i in rng.integers(0, len(VOCAB), n))


def _encode(rng: np.random.Generator, img: np.ndarray) -> tuple[bytes, str]:
    r = rng.uniform()
    if r < 0.5:
        return encode_png(img), "png"
    if r < 0.8:
        return encode_png(np.stack([img, np.roll(img, 1, 0), np.roll(img, 1, 1)], -1)), "png"
    return encode_fjpg(img), "jpeg"


def gen_group(gid: int, seed: int, max_distance: int, phash_part_bits: int,
              img_hw: int = H):
    """Rows + meta for one group; pure function of (gid, seed, config)."""
    kind = CYCLE[gid % len(CYCLE)]
    rng = np.random.default_rng([seed, gid])
    rows, meta = [], []

    def emit(sub: int, data: bytes, fmt: str, caption: str, ph: int | None):
        rid = gid * 64 + sub  # globally unique, order = generation order
        rows.append(
            {
                "image_id": f"img{rid:010d}",
                "bytes": data,
                "w": img_hw,
                "h": img_hw,
                "fmt": fmt,
                "caption": caption,
                "phash": None if ph is None
                else np.uint64(ph).astype(np.int64).item(),
            }
        )
        meta.append({"image_id": f"img{rid:010d}", "family": kind, "gid": gid})

    if kind == "filtered":
        style = gid % 3
        img = _image(rng, img_hw)
        data, fmt = _encode(rng, img)
        # undecodable/empty payloads carry a NULL stored phash — the
        # stored-mode fast path filters on phash IS NULL without ever
        # reading ``bytes`` (an ingester that can't decode a row can't
        # have computed its phash either)
        if style == 0:
            emit(0, data, fmt, "", phash_image(img))          # empty caption
        elif style == 1:
            emit(0, b"", fmt, _caption(rng), None)             # empty payload
        else:
            emit(0, b"JUNK" + bytes(rng.integers(0, 256, 64, dtype=np.uint8)),
                 fmt, _caption(rng), None)                     # undecodable
        return rows, meta

    img = _image(rng, img_hw)
    data, fmt = _encode(rng, img)
    caption = _caption(rng)
    ph = phash_image(img)

    def variant(strength: float) -> tuple[bytes, str]:
        """Pixel-perturbed re-encode: organic near-duplicate payloads
        so ``signature_source="recompute"`` (honest decode path) also
        sees near-dups, not only the surgical stored-phash flips the
        stored-mode ground truth uses."""
        v = img.astype(np.float64) + rng.normal(0, strength, img.shape)
        v = np.clip(v, 0, 255).astype(np.uint8)
        return _encode(np.random.default_rng([seed, gid, int(strength * 10)]), v)

    def flip(base: int, *bits: int) -> int:
        # flip bits within the phash budget part (top bits of the
        # composite word come from the top bits of phash)
        v = base
        for b in bits:
            v ^= 1 << (63 - (b % phash_part_bits))
        return v & 0xFFFFFFFFFFFFFFFF

    if kind == "uniq":
        emit(0, data, fmt, caption, ph)
    elif kind == "pair":
        emit(0, data, fmt, caption, ph)
        emit(1, data, fmt, caption, ph)
    elif kind == "fam5":
        for i in range(5):
            emit(i, data, fmt, caption, ph)
    elif kind == "nbr":
        emit(0, data, fmt, caption, ph)
        d1, f1 = variant(2.0)
        emit(1, d1, f1, caption, flip(ph, gid % phash_part_bits))
    elif kind == "far":
        emit(0, data, fmt, caption, ph)
        bits = [(gid + j) % phash_part_bits for j in range(max_distance + 1)]
        # ensure distinct bit positions
        bits = list(range(max_distance + 1)) if len(set(bits)) != len(bits) else bits
        d1, f1 = variant(40.0)
        emit(1, d1, f1, caption, flip(ph, *bits))
    elif kind == "chain":
        sub = 0
        cur = ph
        positions = rng.permutation(phash_part_bits)[: len(CHAIN_MULTS) - 1]
        for step, mult in enumerate(CHAIN_MULTS):
            step_data, step_fmt = (data, fmt) if step == 0 else variant(2.0 * step)
            if step > 0:
                cur = flip(cur, int(positions[step - 1]))
            for _ in range(mult):
                emit(sub, step_data, step_fmt, caption, cur)
                sub += 1
    elif kind == "hot":
        ph_hot = (HOT_TOP32 << 32) | (ph & 0xFFFFFFFF)
        emit(0, data, fmt, _caption(rng), ph_hot)
    return rows, meta


SCHEMA = pa.schema(
    [
        ("image_id", pa.string()),
        ("bytes", pa.binary()),
        ("w", pa.int32()),
        ("h", pa.int32()),
        ("fmt", pa.string()),
        ("caption", pa.string()),
        ("phash", pa.int64()),
    ]
)


def gen_rows(n_rows: int, seed: int = 42, max_distance: int = 1,
             phash_part_bits: int = 32, start_gid: int = 0, img_hw: int = H):
    """Generate >= n_rows rows (whole groups), truncated to n_rows."""
    rows, meta = [], []
    gid = start_gid
    while len(rows) < n_rows:
        r, m = gen_group(gid, seed, max_distance, phash_part_bits, img_hw)
        rows.extend(r)
        meta.extend(m)
        gid += 1
    rows, meta = rows[:n_rows], meta[:n_rows]
    table = pa.Table.from_pylist(rows, schema=SCHEMA)
    mtab = pa.Table.from_pylist(meta)
    return table, mtab


GEN_VERSION = 4  # bump when generated bytes change (invalidates caches)


def corpus_path(base_dir: str, n_rows: int, seed: int = 42, img_hw: int = H) -> str:
    suffix = "" if img_hw == H else f"_hw{img_hw}"
    return os.path.join(base_dir, f"corpus_v{GEN_VERSION}_n{n_rows}_s{seed}{suffix}")


def make_corpus(base_dir: str, n_rows: int, seed: int = 42,
                max_distance: int = 1, phash_part_bits: int = 32,
                rows_per_file: int = 50_000, img_hw: int = H) -> str:
    """Write (and cache) the corpus parquet dir; returns the dir path."""
    out = corpus_path(base_dir, n_rows, seed, img_hw)
    done = os.path.join(out, "_DONE.json")
    if os.path.exists(done):
        return out
    os.makedirs(out, exist_ok=True)
    written = 0
    part = 0
    gid = 0
    metas = []
    buf_rows: list = []
    buf_meta: list = []
    while written < n_rows:
        want = min(rows_per_file, n_rows - written)
        while len(buf_rows) < want:
            r, m = gen_group(gid, seed, max_distance, phash_part_bits, img_hw)
            buf_rows.extend(r)
            buf_meta.extend(m)
            gid += 1
        rows, buf_rows = buf_rows[:want], buf_rows[want:]
        meta, buf_meta = buf_meta[:want], buf_meta[want:]
        table = pa.Table.from_pylist(rows, schema=SCHEMA)
        pq.write_table(table, os.path.join(out, f"part-{part:05d}.parquet"))
        metas.append(pa.Table.from_pylist(meta))
        written += want
        part += 1
    # note: ".pq" extension so corpus readers globbing *.parquet skip it
    pq.write_table(pa.concat_tables(metas), os.path.join(out, "meta.pq"))
    with open(done, "w") as f:
        json.dump({"n_rows": n_rows, "seed": seed}, f)
    return out


def make_corpus_parallel(base_dir: str, n_rows: int, seed: int = 42,
                         max_distance: int = 1, phash_part_bits: int = 32,
                         cycles_per_part: int = 300, img_hw: int = H) -> str:
    """Ray-parallel corpus writer — identical bytes-for-bytes row set as
    ``make_corpus`` (generation is pure per group id; parts cover fixed
    cycle ranges so any part can be produced independently).

    One cycle = len(CYCLE) groups = CYCLE_ROWS rows; the final part is
    truncated to land exactly on ``n_rows``.
    """
    import ray

    out = corpus_path(base_dir, n_rows, seed, img_hw)
    done = os.path.join(out, "_DONE.json")
    if os.path.exists(done):
        return out
    if not ray.is_initialized():
        return make_corpus(base_dir, n_rows, seed, max_distance,
                           phash_part_bits, img_hw=img_hw)
    os.makedirs(out, exist_ok=True)
    n_cycles = -(-n_rows // CYCLE_ROWS)

    @ray.remote
    def gen_part(part: int, cyc_lo: int, cyc_hi: int, limit: int) -> int:
        rows, meta = [], []
        for gid in range(cyc_lo * len(CYCLE), cyc_hi * len(CYCLE)):
            r, m = gen_group(gid, seed, max_distance, phash_part_bits, img_hw)
            rows.extend(r)
            meta.extend(m)
        rows, meta = rows[:limit], meta[:limit]
        table = pa.Table.from_pylist(rows, schema=SCHEMA)
        pq.write_table(table, os.path.join(out, f"part-{part:05d}.parquet"))
        pq.write_table(pa.Table.from_pylist(meta), os.path.join(out, f"meta-{part:05d}.pq"))
        return len(rows)

    futs = []
    part = 0
    written_before_last = 0
    for lo in range(0, n_cycles, cycles_per_part):
        hi = min(lo + cycles_per_part, n_cycles)
        limit = min((hi - lo) * CYCLE_ROWS, n_rows - lo * CYCLE_ROWS)
        futs.append(gen_part.remote(part, lo, hi, limit))
        part += 1
        written_before_last += limit
    counts = ray.get(futs)
    with open(done, "w") as f:
        json.dump({"n_rows": int(sum(counts)), "seed": seed, "parallel": True}, f)
    return out


def corpus_files(corpus_dir: str) -> list[str]:
    return sorted(
        os.path.join(corpus_dir, f)
        for f in os.listdir(corpus_dir)
        if f.startswith("part-") and f.endswith(".parquet")
    )


# --- deterministic audio / video corpora (FWAV / FVID stand-in codecs) ----

AV_GEN_VERSION = 3  # bump when generated A/V bytes change

AUDIO_SCHEMA = pa.schema(
    [
        ("audio_id", pa.string()),
        ("bytes", pa.binary()),
        ("sr", pa.int32()),          # NULL on rows whose payload is invalid
        ("n_samples", pa.int32()),
        ("caption", pa.string()),
    ]
)

VIDEO_SCHEMA = pa.schema(
    [
        ("video_id", pa.string()),
        ("bytes", pa.binary()),
        ("n_frames", pa.int32()),    # NULL on rows whose payload is invalid
        ("fps", pa.int32()),
        ("w", pa.int32()),
        ("h", pa.int32()),
        ("caption", pa.string()),
    ]
)


def make_audio_corpus(base_dir: str, n_rows: int, seed: int = 42,
                      sr: int = 8000) -> str:
    """Deterministic FWAV clips (sine mixtures + noise); every 13th row
    carries an invalid payload with NULL metadata (the decodable-iff-
    metadata-non-null invariant the image corpus uses for phash);
    every 9th valid row is a PLANTED NEAR-DUPLICATE of its predecessor
    (same sines, fresh noise — a re-encoded re-upload)."""
    from humid_ray.av import encode_fwav

    out = os.path.join(base_dir, f"audio_v{AV_GEN_VERSION}_n{n_rows}_s{seed}")
    done = os.path.join(out, "_DONE.json")
    if os.path.exists(done):
        return out
    os.makedirs(out, exist_ok=True)
    rows = []
    prev_clean = None
    for i in range(n_rows):
        rng = np.random.default_rng([seed, 7, i])
        if i % 13 == 12:
            data = b"" if i % 2 else b"JUNKAUDIO" + bytes(rng.integers(0, 256, 32, dtype=np.uint8))
            rows.append({"audio_id": f"aud{i:08d}", "bytes": data, "sr": None,
                         "n_samples": None, "caption": _caption(rng)})
            continue
        if i % 9 == 8 and prev_clean is not None:
            sig = prev_clean
        else:
            n = int(rng.integers(sr // 2, sr * 2))
            t = np.arange(n) / sr
            sig = np.zeros(n)
            for _ in range(int(rng.integers(1, 4))):
                sig += rng.uniform(0.1, 0.5) * np.sin(
                    2 * np.pi * rng.uniform(80, 2000) * t + rng.uniform(0, 6.28)
                )
        prev_clean = sig
        noisy = sig + rng.normal(0, 0.02, len(sig))
        samples = np.clip(noisy * 12000, -32768, 32767).astype(np.int16)
        rows.append({"audio_id": f"aud{i:08d}", "bytes": encode_fwav(samples, sr),
                     "sr": sr, "n_samples": len(samples), "caption": _caption(rng)})
    pq.write_table(pa.Table.from_pylist(rows, schema=AUDIO_SCHEMA),
                   os.path.join(out, "part-00000.parquet"))
    with open(done, "w") as f:
        json.dump({"n_rows": n_rows, "seed": seed}, f)
    return out


def make_video_corpus(base_dir: str, n_rows: int, seed: int = 42,
                      hw: int = 32, fps: int = 8) -> str:
    """Deterministic FVID clips (drifting synthetic frames); every 11th
    row is invalid with NULL metadata; every 7th row is a PLANTED
    NEAR-DUPLICATE of its predecessor (same frames, the last one
    re-rendered — the partial-re-upload case video dedup must catch)."""
    from humid_ray.av import encode_fvid

    out = os.path.join(base_dir, f"video_v{AV_GEN_VERSION}_n{n_rows}_s{seed}_hw{hw}")
    done = os.path.join(out, "_DONE.json")
    if os.path.exists(done):
        return out
    os.makedirs(out, exist_ok=True)
    rows = []
    prev_frames = None
    for i in range(n_rows):
        rng = np.random.default_rng([seed, 9, i])
        if i % 11 == 10:
            rows.append({"video_id": f"vid{i:08d}", "bytes": b"NOTVIDEO",
                         "n_frames": None, "fps": None, "w": None, "h": None,
                         "caption": _caption(rng)})
            continue
        if i % 7 == 6 and prev_frames is not None and len(prev_frames) >= 5:
            frames = list(prev_frames[:-1])
            frames.append(np.clip(
                prev_frames[-1].astype(np.float64) + rng.normal(0, 40, prev_frames[-1].shape),
                0, 255).astype(np.uint8))
        else:
            n_frames = int(rng.integers(4, 12))
            base = _image(rng, hw).astype(np.float64)
            frames = []
            for f in range(n_frames):
                drift = np.roll(base, f, axis=1) + rng.normal(0, 2, base.shape)
                frames.append(np.clip(drift, 0, 255).astype(np.uint8))
        prev_frames = frames
        rows.append({"video_id": f"vid{i:08d}",
                     "bytes": encode_fvid(frames, fps), "n_frames": len(frames),
                     "fps": fps, "w": hw, "h": hw, "caption": _caption(rng)})
    pq.write_table(pa.Table.from_pylist(rows, schema=VIDEO_SCHEMA),
                   os.path.join(out, "part-00000.parquet"))
    with open(done, "w") as f:
        json.dump({"n_rows": n_rows, "seed": seed}, f)
    return out
