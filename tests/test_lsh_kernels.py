"""Pure-kernel tests for LSH banding completeness and edge dedupe."""

import numpy as np

from humid_ray.config import HumidConfig
from humid_ray.oracle import brute_force_edges
from humid_ray.stages.lsh import (
    _pairs_within,
    band_keys,
    band_layout,
    first_equal_band,
    sub_band_keys,
    _sub_positions,
)
from humid_ray.util import UINT64, hamming64


def _planted_sigs(n=400, m=1, seed=3):
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 1 << 63, n, dtype=np.uint64)
    # plant near pairs: flip <= m bits of some sigs
    extra = []
    for i in range(0, n, 7):
        flips = rng.integers(0, 64, rng.integers(1, m + 1))
        v = base[i]
        for f in np.unique(flips):
            v ^= np.uint64(1) << np.uint64(f)
        extra.append(v)
    return np.unique(np.concatenate([base, np.array(extra, dtype=np.uint64)]))


def test_band_layout_covers_word():
    for wb, nb in [(64, 2), (64, 3), (48, 2), (33, 4)]:
        layout = band_layout(wb, nb)
        assert sum(w for _, w in layout) == wb
        assert layout[0][0] + layout[0][1] == 64  # starts at the MSB


def test_banding_complete_for_hamming_m():
    """pigeonhole: every pair at Hamming <= m agrees on >= 1 band."""
    for m in (1, 2):
        sigs = _planted_sigs(m=m)
        layout = band_layout(64, m + 1)
        truth = brute_force_edges(sigs, m)
        a = sigs[truth[:, 0]]
        b = sigs[truth[:, 1]]
        feb = first_equal_band(a, b, layout)
        assert (feb < len(layout)).all()


def test_pairs_within_matches_bruteforce():
    sigs = _planted_sigs(m=2)
    truth = brute_force_edges(sigs, 2)
    tset = {(int(sigs[i]), int(sigs[j])) for i, j in truth}
    got = _pairs_within(sigs, 2, cap=100000)
    assert got == tset
    # recursion path (tiny cap) finds the same pairs
    got_rec = _pairs_within(sigs, 2, cap=16)
    assert got_rec == tset


def test_sub_band_keys_pigeonhole():
    """within a band-equal bucket, pairs at distance <= m agree on >= 1
    sub-band over the remaining bit positions."""
    m = 1
    layout = band_layout(64, m + 1)
    rng = np.random.default_rng(5)
    base = rng.integers(0, 1 << 63, 50, dtype=np.uint64)
    # force equal band 0 (top 32 bits)
    base = (base & np.uint64(0xFFFFFFFF)) | (np.uint64(0xABCD1234) << np.uint64(32))
    nbr = base ^ (np.uint64(1) << np.uint64(7))  # 1-bit flips in the low half
    positions = _sub_positions(64, layout, 0)
    ka = sub_band_keys(base, positions, m + 1)
    kb = sub_band_keys(nbr, positions, m + 1)
    assert ((ka == kb).sum(axis=0) >= 1).all()
    assert (hamming64(base, nbr) == 1).all()
