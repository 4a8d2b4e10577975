"""Vectorized SimHash over caption token shingles.

Plays the role of the caption-derived half of HUMID's word (the second
FastQ file's read prefix, reference: makeWord src/fastq.cc:146-161):
a 64-bit locality-sensitive fingerprint where small caption edits flip
few bits, so Hamming banding applies to it exactly like to pHash.

Algorithm (Charikar 2002): hash each k-token shingle to 64 bits; for
each bit position sum +1/-1 over shingles; sign -> bit. All steps are
numpy-vectorized across the whole batch (no per-row Python).
"""

from __future__ import annotations

import numpy as np

from humid_ray.util import UINT64, combine_hashes, segment_reduce, splitmix64

_BITS = np.arange(64, dtype=np.uint64)


def shingle_hashes(token_hashes: np.ndarray, row_offsets: np.ndarray, k: int):
    """k-token shingle hashes per row (shingles never cross rows).

    Rows with 1 <= n_tokens < k degrade to unigram shingles (so short
    captions still get a signature); rows with 0 tokens get 0 shingles.
    Returns (hashes: uint64[n_shingles], shingle_offsets: int64[n+1]).
    """
    row_offsets = np.asarray(row_offsets, dtype=np.int64)
    lens = row_offsets[1:] - row_offsets[:-1]
    n_rows = len(lens)
    if k <= 1:
        return token_hashes.astype(UINT64), row_offsets.copy()
    # windows of size k starting at each token index where the window
    # fits within the row
    n_sh_full = np.maximum(lens - (k - 1), 0)
    degenerate = (lens > 0) & (lens < k)  # unigram fallback
    n_sh = np.where(degenerate, lens, n_sh_full)
    out_offsets = np.zeros(n_rows + 1, dtype=np.int64)
    np.cumsum(n_sh, out=out_offsets[1:])
    total = int(out_offsets[-1])
    if total == 0:
        return np.empty(0, dtype=UINT64), out_offsets
    # global start index of each shingle window
    row_ids = np.repeat(np.arange(n_rows), n_sh)
    within = np.arange(total, dtype=np.int64) - np.repeat(out_offsets[:-1], n_sh)
    starts = row_offsets[:-1][row_ids] + within
    deg = degenerate[row_ids]
    acc = token_hashes[starts].astype(UINT64)
    for j in range(1, k):
        nxt = np.minimum(starts + j, row_offsets[1:][row_ids] - 1)
        step = token_hashes[nxt].astype(UINT64)
        upd = combine_hashes(acc, step)
        acc = np.where(deg, acc, upd)  # degenerate rows keep unigrams
    return splitmix64(acc), out_offsets


def simhash_from_shingles(sh: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """SimHash per row from shingle hashes. Rows with 0 shingles -> 0."""
    offsets = np.asarray(offsets, dtype=np.int64)
    n_rows = len(offsets) - 1
    if len(sh) == 0:
        return np.zeros(n_rows, dtype=UINT64)
    # (n_shingles, 64) in {-1, +1}
    bits = (((sh[:, None] >> _BITS[None, :]) & UINT64(1)).astype(np.int32) * 2) - 1
    sums = segment_reduce(bits, offsets, np.add, 0)
    lens = offsets[1:] - offsets[:-1]
    out = np.where(sums > 0, UINT64(1), UINT64(0))
    packed = np.zeros(n_rows, dtype=UINT64)
    for b in range(64):
        packed |= out[:, b] << UINT64(b)
    packed[lens == 0] = UINT64(0)
    return packed


def simhash_batch(token_hashes: np.ndarray, row_offsets: np.ndarray, k: int = 2):
    """(simhash: uint64[n], n_shingles: int64[n]) per row."""
    sh, offs = shingle_hashes(token_hashes, row_offsets, k)
    sig = simhash_from_shingles(sh, offs)
    n_sh = offs[1:] - offs[:-1]
    return sig, n_sh
