"""Low-level vectorized primitives shared across the engine.

Everything here is pure numpy over ``uint64`` with wrap-around
arithmetic (the semantics HUMID gets for free from C++ ``size_t``
math); no Python-level per-row loops.
"""

from __future__ import annotations

import numpy as np

UINT64 = np.uint64

# SplitMix64 constants (public domain; Steele et al., "Fast splittable
# pseudorandom number generators", OOPSLA 2014).
_SM_GAMMA = UINT64(0x9E3779B97F4A7C15)
_SM_M1 = UINT64(0xBF58476D1CE4E5B9)
_SM_M2 = UINT64(0x94D049BB133111EB)

# Polynomial string-hash base (an arbitrary odd 64-bit constant).
HASH_BASE = UINT64(0x100000001B3)  # FNV-ish prime


def _u64(x) -> np.ndarray:
    return np.asarray(x, dtype=UINT64)


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized SplitMix64 finalizer: a strong 64-bit bit mixer."""
    with np.errstate(over="ignore"):
        z = _u64(x) + _SM_GAMMA
        z = (z ^ (z >> UINT64(30))) * _SM_M1
        z = (z ^ (z >> UINT64(27))) * _SM_M2
        return z ^ (z >> UINT64(31))


def popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized population count for uint64 arrays (SWAR).

    numpy 1.26 lacks ``np.bitwise_count``; this is the classic
    parallel-bit-count (Hacker's Delight fig. 5-2) over uint64 lanes.
    """
    x = _u64(x).copy()
    m1 = UINT64(0x5555555555555555)
    m2 = UINT64(0x3333333333333333)
    m4 = UINT64(0x0F0F0F0F0F0F0F0F)
    h01 = UINT64(0x0101010101010101)
    x -= (x >> UINT64(1)) & m1
    x = (x & m2) + ((x >> UINT64(2)) & m2)
    x = (x + (x >> UINT64(4))) & m4
    with np.errstate(over="ignore"):
        x *= h01
    return (x >> UINT64(56)).astype(np.int64)


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Element-wise Hamming distance between two uint64 arrays."""
    return popcount64(_u64(a) ^ _u64(b))


def hash_bytes_segments(data: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """Stable 64-bit hash of each byte segment, fully vectorized.

    ``data`` is a flat uint8 array; ``offsets`` (len n+1, int64) bounds
    segment i as ``data[offsets[i]:offsets[i+1]]``. Returns uint64[n].

    Polynomial rolling hash h = sum(byte_j * B^(len-1-j)) mod 2^64,
    finalized with splitmix64 so nearby strings don't collide in the
    low bits. Empty segments hash to splitmix64(0).
    """
    offsets = np.asarray(offsets, dtype=np.int64)
    lens = offsets[1:] - offsets[:-1]
    n = len(lens)
    if n == 0:
        return np.empty(0, dtype=UINT64)
    total = int(offsets[-1] - offsets[0])
    if total == 0:
        return splitmix64(np.zeros(n, dtype=UINT64))
    base = int(offsets[0])
    data = np.asarray(data[base : base + total], dtype=np.uint8)
    # power table up to the longest segment
    maxlen = int(lens.max())
    pows = np.empty(maxlen, dtype=UINT64)
    pows[0] = UINT64(1)
    if maxlen > 1:
        with np.errstate(over="ignore"):
            np.multiply.accumulate(np.full(maxlen - 1, HASH_BASE, dtype=UINT64), out=pows[1:])
    idx = np.arange(total, dtype=np.int64)
    end_rep = np.repeat(offsets[1:] - base, lens)
    rpos = end_rep - 1 - idx  # position from the right within the segment
    with np.errstate(over="ignore"):
        contrib = data.astype(UINT64) * pows[rpos]
    seg_starts = (offsets[:-1] - base).astype(np.intp)
    h = np.zeros(n, dtype=UINT64)
    nonempty = lens > 0
    if nonempty.any():
        # reduceat misbehaves on empty segments (returns the element at
        # the index); restrict to non-empty segments and patch.
        with np.errstate(over="ignore"):
            sums = np.add.reduceat(contrib, seg_starts[nonempty])
        h[nonempty] = sums
    return splitmix64(h)


def hash_u64_segments(values: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """Order-sensitive 64-bit hash of each uint64 segment, vectorized.

    Same polynomial-rolling-hash construction as
    ``hash_bytes_segments`` but over uint64 token hashes instead of
    bytes: h = sum(v_j * B^(len-1-j)) mod 2^64, splitmix64-finalized.
    Empty segments hash to splitmix64(0).
    """
    offsets = np.asarray(offsets, dtype=np.int64)
    lens = offsets[1:] - offsets[:-1]
    n = len(lens)
    if n == 0:
        return np.empty(0, dtype=UINT64)
    total = int(offsets[-1] - offsets[0])
    if total == 0:
        return splitmix64(np.zeros(n, dtype=UINT64))
    base = int(offsets[0])
    vals = _u64(values[base : base + total])
    maxlen = int(lens.max())
    pows = np.empty(maxlen, dtype=UINT64)
    pows[0] = UINT64(1)
    if maxlen > 1:
        with np.errstate(over="ignore"):
            np.multiply.accumulate(np.full(maxlen - 1, HASH_BASE, dtype=UINT64), out=pows[1:])
    idx = np.arange(total, dtype=np.int64)
    end_rep = np.repeat(offsets[1:] - base, lens)
    rpos = end_rep - 1 - idx
    with np.errstate(over="ignore"):
        contrib = vals * pows[rpos]
    seg_starts = (offsets[:-1] - base).astype(np.intp)
    h = np.zeros(n, dtype=UINT64)
    nonempty = lens > 0
    if nonempty.any():
        with np.errstate(over="ignore"):
            sums = np.add.reduceat(contrib, seg_starts[nonempty])
        h[nonempty] = sums
    return splitmix64(h)


def combine_hashes(*hs: np.ndarray) -> np.ndarray:
    """Order-sensitive combine of equal-length uint64 hash arrays."""
    acc = _u64(hs[0]).copy()
    for nxt in hs[1:]:
        with np.errstate(over="ignore"):
            acc = splitmix64(acc * HASH_BASE + _u64(nxt))
    return acc


def segment_reduce(values: np.ndarray, offsets: np.ndarray, ufunc, empty):
    """Apply ``ufunc.reduceat`` per segment, handling empty segments.

    ``values`` may be 1-D or 2-D (reduction along axis 0 rows grouped
    by ``offsets``). Empty segments get ``empty``.
    """
    offsets = np.asarray(offsets, dtype=np.intp)
    lens = offsets[1:] - offsets[:-1]
    n = len(lens)
    shape = (n,) + values.shape[1:]
    out = np.full(shape, empty, dtype=values.dtype)
    nonempty = lens > 0
    if nonempty.any():
        with np.errstate(over="ignore"):
            red = ufunc.reduceat(values, offsets[:-1][nonempty], axis=0)
        out[nonempty] = red
    return out


def segment_unique(values: np.ndarray, offsets: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Per-segment sorted-unique, fully vectorized.

    ``values`` flat array segmented by ``offsets`` (len n+1). Returns
    (flat unique values sorted within each segment, new offsets).
    """
    offsets = np.asarray(offsets, dtype=np.int64)
    n = len(offsets) - 1
    if len(values) == 0:
        return values[:0], np.zeros(n + 1, dtype=np.int64)
    lens = offsets[1:] - offsets[:-1]
    row_ids = np.repeat(np.arange(n, dtype=np.int64), lens)
    order = np.lexsort((values, row_ids))
    sv, sr = values[order], row_ids[order]
    keep = np.r_[True, (sv[1:] != sv[:-1]) | (sr[1:] != sr[:-1])]
    sv, sr = sv[keep], sr[keep]
    new_offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(np.bincount(sr, minlength=n), out=new_offsets[1:])
    return sv, new_offsets


def _gather_segments(vals: np.ndarray, starts: np.ndarray, lens: np.ndarray) -> np.ndarray:
    """Concatenate vals[starts[i]:starts[i]+lens[i]] for all i, vectorized."""
    total = int(lens.sum())
    if total == 0:
        return vals[:0]
    out_pos = np.arange(total, dtype=np.int64)
    seg_of = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
    seg_start_out = np.repeat(np.cumsum(np.r_[0, lens[:-1]]), lens)
    return vals[starts[seg_of] + (out_pos - seg_start_out)]


def pairwise_intersect_sizes(
    vals: np.ndarray,
    starts: np.ndarray,
    ends: np.ndarray,
    ii: np.ndarray,
    jj: np.ndarray,
) -> np.ndarray:
    """|seg(ii[p]) ∩ seg(jj[p])| for candidate pairs, loop-free.

    Segments (``vals[starts[s]:ends[s]]``) must each hold UNIQUE values
    (sortedness not required). One gather + one lexsort over the total
    candidate mass replaces a per-pair ``np.intersect1d`` Python loop:
    within a pair, a value appearing twice means it came from both
    sides. Returns int64[len(ii)].
    """
    ii = np.asarray(ii, dtype=np.int64)
    jj = np.asarray(jj, dtype=np.int64)
    npairs = len(ii)
    if npairs == 0:
        return np.zeros(0, dtype=np.int64)
    starts = np.asarray(starts, dtype=np.int64)
    ends = np.asarray(ends, dtype=np.int64)
    la = ends[ii] - starts[ii]
    lb = ends[jj] - starts[jj]
    allv = np.concatenate(
        [_gather_segments(vals, starts[ii], la), _gather_segments(vals, starts[jj], lb)]
    )
    pid = np.concatenate(
        [np.repeat(np.arange(npairs, dtype=np.int64), la),
         np.repeat(np.arange(npairs, dtype=np.int64), lb)]
    )
    order = np.lexsort((allv, pid))
    sv, sp = allv[order], pid[order]
    dup = (sv[1:] == sv[:-1]) & (sp[1:] == sp[:-1])
    return np.bincount(sp[1:][dup], minlength=npairs).astype(np.int64)


def top_bits(h: np.ndarray, nbits: int, total: int = 64) -> np.ndarray:
    """Keep the ``nbits`` most-significant bits of ``h`` (as an integer
    value in [0, 2^nbits)); nbits == 0 -> zeros."""
    h = _u64(h)
    if nbits <= 0:
        return np.zeros_like(h)
    return h >> UINT64(total - nbits)


def pack_fields(fields: list[tuple[np.ndarray, int]]) -> np.ndarray:
    """Concatenate (value, nbits) fields MSB-first into one uint64.

    Total bits must be <= 64; the word occupies the TOP bits of the
    result (low bits zero when the budget is under 64), mirroring how
    HUMID's word is a fixed-length prefix code over its sources
    (reference: makeWord / getNucleotides, src/fastq.cc:96-161).
    """
    used = sum(nb for _, nb in fields)
    if used > 64:
        raise ValueError(f"bit budget {used} > 64")
    out = None
    shift = 64
    for val, nb in fields:
        if nb == 0:
            continue
        shift -= nb
        piece = (_u64(val) & UINT64((1 << nb) - 1)) << UINT64(shift)
        out = piece if out is None else out | piece
    if out is None:
        raise ValueError("no fields with bits")
    return out


def u64col(x) -> "object":
    """uint64 ndarray -> Arrow int64 column (bit-pattern view).

    Dataset-level columns are always int64: Ray Data's groupby /
    aggregate path degrades uint64 to pickled-object extension arrays
    (values above 2^63 don't fit pandas int64). Kernels view the
    numpy int64 back as uint64 with ``.view(UINT64)`` — zero-copy both
    ways.
    """
    import pyarrow as pa

    return pa.array(np.ascontiguousarray(x, dtype=UINT64).view(np.int64), type=pa.int64())


def uint64_to_int64(x: np.ndarray) -> np.ndarray:
    """Bit-preserving reinterpret (for storage as Arrow/parquet int64)."""
    return _u64(x).view(np.int64)


def round_half_away(x: np.ndarray, ndigits: int = 6) -> np.ndarray:
    """Round half AWAY from zero (SQL semantics; numpy rounds half to
    even, which diverges from DuckDB on exact ties like 105/128)."""
    scale = 10.0 ** ndigits
    return np.sign(x) * np.floor(np.abs(x) * scale + 0.5) / scale


def int64_to_uint64(x) -> np.ndarray:
    return np.asarray(x, dtype=np.int64).view(UINT64)


def weighted_discrete_quantiles(values: np.ndarray, counts: np.ndarray,
                                qs) -> list[int]:
    """Exact discrete quantiles of a VALUE HISTOGRAM (values need not
    be sorted or distinct; counts are per-value multiplicities).
    Index math is ceil(q*n)-1 in double precision, bit-matching
    DuckDB's quantile_disc — the one convention every quantile
    consumer (documents length stats, image payload sizes) must share
    so a future index-rule fix lands everywhere at once."""
    import math

    order = np.argsort(values, kind="stable")
    v, c = values[order], counts[order]
    keep = np.r_[True, v[1:] != v[:-1]]
    starts = np.flatnonzero(keep)
    v, c = v[starts], np.add.reduceat(c, starts)
    cum = np.cumsum(c)
    n = int(cum[-1])
    return [int(v[np.searchsorted(cum, math.ceil(q * n) - 1 + 1)])
            for q in qs]
