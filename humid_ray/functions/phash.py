"""Perceptual hash (pHash) over decoded pixels.

The image-derived half of the signature word (HUMID analog: the first
FastQ file's read prefix, reference: makeWord src/fastq.cc:146-161).
Standard DCT pHash (Zauner 2010): grayscale -> 32x32 mean-pool ->
2-D DCT-II -> 8x8 low-frequency block -> threshold at the median of
the 63 AC coefficients -> 64 bits (DC bit forced 0).
"""

from __future__ import annotations

import numpy as np

from humid_ray.util import UINT64

_N = 32
_K = 8


def _dct_matrix(n: int) -> np.ndarray:
    k = np.arange(n)[:, None]
    i = np.arange(n)[None, :]
    m = np.cos(np.pi * (2 * i + 1) * k / (2 * n)) * np.sqrt(2.0 / n)
    m[0] /= np.sqrt(2.0)
    return m


_D = _dct_matrix(_N)


_GRAY = np.array([0.299, 0.587, 0.114])


def _to_gray(img: np.ndarray) -> np.ndarray:
    if img.ndim == 3:
        return img @ _GRAY
    return img.astype(np.float64, copy=False)


def _pool(img: np.ndarray, n: int) -> np.ndarray:
    """Mean-pool an arbitrary HxW image to n x n (area interpolation)."""
    h, w = img.shape
    if h % n == 0 and w % n == 0:
        # evenly divisible (the common case): reshape-mean, no cumsum
        return img.reshape(n, h // n, n, w // n).mean(axis=(1, 3))
    ye = (np.arange(n + 1) * h) // n
    xe = (np.arange(n + 1) * w) // n
    csum = np.zeros((h + 1, w + 1))
    csum[1:, 1:] = img.cumsum(0).cumsum(1)
    s = (
        csum[ye[1:], :][:, xe[1:]]
        - csum[ye[:-1], :][:, xe[1:]]
        - csum[ye[1:], :][:, xe[:-1]]
        + csum[ye[:-1], :][:, xe[:-1]]
    )
    area = np.outer(ye[1:] - ye[:-1], xe[1:] - xe[:-1])
    return s / np.maximum(area, 1)


def phash_image(img: np.ndarray) -> int:
    """64-bit pHash of a decoded uint8 image (HxW or HxWx3)."""
    g = _pool(_to_gray(np.asarray(img, dtype=np.float64)), _N)
    coef = (_D @ g @ _D.T)[:_K, :_K].ravel()
    # median of the 63 AC coefficients == partition element 31 (odd
    # count -> the exact middle ELEMENT; bit-identical to np.median,
    # without its _ureduce dispatch overhead in this per-image path)
    med = np.partition(coef[1:], 31)[31]
    bits = coef > med
    bits[0] = False
    # Pack MSB-first: coefficient 0 (coarsest structure) lands on bit
    # 63, so truncating to the top-N bits (signature.py top_bits) keeps
    # the LOW-frequency half of the DCT block — the half that carries
    # near-duplicate structure.
    return int.from_bytes(np.packbits(bits.astype(np.uint8)).tobytes(), "big")


def phash_batch(images: list[np.ndarray | None]) -> np.ndarray:
    """pHash per image; None entries -> 0 (callers mark them filtered)."""
    out = np.zeros(len(images), dtype=UINT64)
    for i, img in enumerate(images):
        if img is not None:
            out[i] = UINT64(phash_image(img))
    return out
