"""Vectorized MinHash signatures + LSH band keys.

This is the edit-distance analog path (HUMID's ``-e`` Levenshtein
neighbors, reference: src/humid.cc:140-158): variable-length payloads
have no fixed-bit pigeonhole, so near-duplicate candidates come from
MinHash-Jaccard banding over shingle sets instead (Broder 1997;
Leskovec/Rajaraman/Ullman ch. 3).
"""

from __future__ import annotations

import numpy as np

from humid_ray.util import UINT64, segment_reduce, splitmix64

_MERSENNE = UINT64(0xFFFFFFFFFFFFFFFF)


def _perm_params(n_perms: int, seed: int = 42):
    rng = np.random.default_rng(seed)
    a = rng.integers(1, 1 << 62, size=n_perms, dtype=np.uint64) | UINT64(1)
    b = rng.integers(0, 1 << 62, size=n_perms, dtype=np.uint64)
    return a, b


def minhash_batch(
    shingles: np.ndarray, offsets: np.ndarray, n_perms: int = 128, seed: int = 42
) -> np.ndarray:
    """MinHash matrix (n_rows, n_perms) uint64 from per-row shingle
    hash segments. Rows with 0 shingles get all-max sentinel rows."""
    a, b = _perm_params(n_perms, seed)
    offsets = np.asarray(offsets, dtype=np.int64)
    n_rows = len(offsets) - 1
    if len(shingles) == 0:
        return np.full((n_rows, n_perms), _MERSENNE, dtype=UINT64)
    with np.errstate(over="ignore"):
        # (n_shingles, n_perms) permuted hash values
        hv = shingles[:, None] * a[None, :] + b[None, :]
    return segment_reduce(hv, offsets, np.minimum, _MERSENNE)


def minhash_band_keys(mh: np.ndarray, n_bands: int) -> np.ndarray:
    """Collapse each band's rows-per-band slice to one uint64 band key.

    Returns (n_rows, n_bands) uint64. Rows whose minhash is the empty
    sentinel hash to a per-row-unique key so they never collide.
    """
    n_rows, n_perms = mh.shape
    if n_perms % n_bands:
        raise ValueError("n_perms must divide evenly into n_bands")
    r = n_perms // n_bands
    view = mh.reshape(n_rows, n_bands, r)
    acc = np.zeros((n_rows, n_bands), dtype=UINT64)
    with np.errstate(over="ignore"):
        for j in range(r):
            acc = splitmix64(acc * UINT64(0x100000001B3) + view[:, :, j])
    return acc


def jaccard_from_minhash(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Estimated Jaccard similarity between minhash rows (pairwise
    element-match fraction)."""
    return (a == b).mean(axis=-1)
