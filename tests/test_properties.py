"""Hypothesis property tests for the core kernels' invariants
(pure-numpy, no Ray session needed)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from humid_ray.config import HumidConfig, bits_from_source
from humid_ray.stages.lsh import band_keys, band_layout, first_equal_band
from humid_ray.util import UINT64, hamming64, popcount64, segment_unique

u64 = st.integers(min_value=0, max_value=(1 << 64) - 1)


@given(st.lists(u64, min_size=1, max_size=50))
@settings(max_examples=200, deadline=None)
def test_popcount_matches_python(vals):
    arr = np.array(vals, dtype=UINT64)
    got = popcount64(arr)
    assert [int(x) for x in got] == [bin(v).count("1") for v in vals]


@given(u64, st.integers(min_value=0, max_value=3),
       st.integers(min_value=1, max_value=64),
       st.lists(st.integers(min_value=0, max_value=63), min_size=0, max_size=3,
                unique=True))
@settings(max_examples=300, deadline=None)
def test_banding_pigeonhole_complete(sig, m, word_bits, flip_positions):
    """Any pair within Hamming distance m over the TOP word_bits shares
    at least one of the m+1 bands (the completeness invariant behind
    the LSH edge stage)."""
    flips = [p for p in flip_positions if p < word_bits][:m]
    other = sig
    for p in flips:
        other ^= 1 << (63 - p)  # flip within the top word_bits
    a = np.array([sig], dtype=UINT64)
    b = np.array([other], dtype=UINT64)
    layout = band_layout(word_bits, m + 1)
    d = int(hamming64(a, b)[0])
    assert d <= m
    first = int(first_equal_band(a, b, layout)[0])
    assert first < len(layout), "pair within m must share a band"


@given(st.lists(st.lists(u64, min_size=0, max_size=20), min_size=1, max_size=10))
@settings(max_examples=200, deadline=None)
def test_segment_unique_matches_per_row_numpy(rows):
    flat = np.array([v for r in rows for v in r], dtype=UINT64)
    offsets = np.cumsum([0] + [len(r) for r in rows]).astype(np.int64)
    vals, offs = segment_unique(flat, offsets)
    for i, r in enumerate(rows):
        got = vals[offs[i]:offs[i + 1]].tolist()
        assert got == sorted(set(r)), i


@given(st.integers(min_value=1, max_value=16), st.integers(min_value=0, max_value=64))
@settings(max_examples=200, deadline=None)
def test_bits_from_source_partitions_budget(n_sources, total):
    parts = bits_from_source(n_sources, total)
    assert len(parts) == n_sources
    assert sum(parts) == total
    assert all(p >= 0 for p in parts)


@given(st.lists(st.lists(u64, min_size=0, max_size=12), min_size=1, max_size=8))
@settings(max_examples=150, deadline=None)
def test_pack_unpack_i64_list_roundtrip(rows):
    import pyarrow as pa

    from humid_ray.stages.lsh import _pack_i64_list, _unpack_i64_list

    flat = [np.int64(np.uint64(v).astype(np.int64)) for r in rows for v in r]
    offsets = np.cumsum([0] + [len(r) for r in rows]).astype(np.int64)
    ll = pa.LargeListArray.from_arrays(pa.array(offsets, type=pa.int64()),
                                       pa.array(flat, type=pa.int64()))
    back = _unpack_i64_list(_pack_i64_list(ll))
    assert back.equals(ll)
    # and through a slice (non-zero offset path)
    if len(rows) > 2:
        sl = ll.slice(1, len(rows) - 2)
        back2 = _unpack_i64_list(_pack_i64_list(sl))
        assert back2.to_pylist() == sl.to_pylist()


@given(st.text(alphabet="abc", max_size=12), st.text(alphabet="abc", max_size=12),
       st.integers(min_value=0, max_value=3))
@settings(max_examples=500, deadline=None)
def test_edit_distance_within_property(a, b, m):
    from humid_ray.functions.text import edit_distance_within

    def lev(x, y):
        dp = list(range(len(y) + 1))
        for i, cx in enumerate(x, 1):
            ndp = [i]
            for j, cy in enumerate(y, 1):
                ndp.append(min(dp[j] + 1, ndp[-1] + 1, dp[j - 1] + (cx != cy)))
            dp = ndp
        return dp[-1]

    assert edit_distance_within(a, b, m) == (lev(a, b) <= m)


@given(st.lists(st.integers(min_value=-2**63, max_value=2**63 - 1),
                max_size=40),
       st.lists(st.integers(min_value=-2**63, max_value=2**63 - 1),
                max_size=40))
@settings(max_examples=200, deadline=None)
def test_sorted_member_matches_isin(keys, probe):
    from humid_ray.stages.joins import sorted_member

    sk = np.unique(np.asarray(keys, dtype=np.int64))
    p = np.asarray(probe, dtype=np.int64)
    got = sorted_member(sk, p)
    want = np.isin(p, sk)
    assert np.array_equal(got, want)


@given(st.lists(st.tuples(
    st.integers(min_value=-2**63, max_value=2**63 - 1),
    st.integers(min_value=-2**63, max_value=2**63 - 1)), max_size=40),
       st.lists(st.integers(min_value=-2**63, max_value=2**63 - 1),
                max_size=40))
@settings(max_examples=200, deadline=None)
def test_apply_sorted_labels_matches_dict(pairs, probe):
    from humid_ray.stages.joins import apply_sorted_labels

    # dedupe keys (keep first) then sort — the caller's contract
    d = {}
    for k, v in pairs:
        d.setdefault(k, v)
    ks = np.array(sorted(d), dtype=np.int64)
    vs = np.array([d[k] for k in sorted(d)], dtype=np.int64)
    p = np.asarray(probe, dtype=np.int64)
    got = apply_sorted_labels(ks, vs, p)
    want = np.array([d.get(x, x) for x in p.tolist()], dtype=np.int64)
    assert np.array_equal(got, want)
    # input must be untouched (the helper returns a fresh array)
    assert np.array_equal(p, np.asarray(probe, dtype=np.int64))
