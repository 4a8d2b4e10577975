"""Winnowed k-gram fingerprints for substring-level deduplication.

The suffix-array substring dedup of Lee et al. 2022 ("Deduplicating
Training Data Makes Language Models Better") finds duplicated spans of
length >= L between documents. A distributed suffix array is an
all-to-all sort over the corpus; winnowing (Schleimer, Wilkerson,
Aiken, SIGMOD 2003 — the MOSS fingerprint) reaches the same detection
guarantee with a groupby-sized shuffle instead:

    select, in every window of w consecutive k-gram hashes, the
    (leftmost) minimal hash. Any substring shared by two documents
    with length >= w + k - 1 then shares at least one selected
    fingerprint AT THE SAME RELATIVE OFFSET in both occurrences
    (the span's global-min k-gram lies in some window fully inside
    the span on both sides), so a grouped-by-fingerprint shuffle
    plus greedy extension recovers every maximal duplicated span of
    length >= L = w + k - 1 exactly.

All kernels are flat-numpy over the batch's concatenated utf8 bytes;
no per-row Python loops.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from humid_ray.util import HASH_BASE, UINT64, splitmix64


def string_bytes(texts: pa.Array | pa.ChunkedArray) -> tuple[np.ndarray, np.ndarray]:
    """(flat utf8 bytes uint8[N], offsets int64[n+1]) of a string column."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    texts = pc.fill_null(pc.cast(texts, pa.string()), "")
    raw_offs = np.frombuffer(texts.buffers()[1], dtype=np.int32)
    offsets = raw_offs[texts.offset : texts.offset + len(texts) + 1].astype(np.int64)
    data = np.frombuffer(texts.buffers()[2], dtype=np.uint8)
    return data, offsets


def kgram_hashes(data: np.ndarray, offsets: np.ndarray, k: int):
    """Rolling k-gram hashes at every byte position where a full k-gram
    fits inside its row.

    Returns (hashes: uint64 flat per-row segments, h_offsets: int64[n+1]).
    Row i's hash j covers bytes [offsets[i]+j, offsets[i]+j+k).
    """
    offsets = np.asarray(offsets, dtype=np.int64)
    base = int(offsets[0])
    offsets = offsets - base
    lens = offsets[1:] - offsets[:-1]
    n = len(lens)
    nh = np.maximum(lens - (k - 1), 0)
    h_offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(nh, out=h_offsets[1:])
    total = int(h_offsets[-1])
    if total == 0:
        return np.empty(0, dtype=UINT64), h_offsets
    data = np.asarray(data[base : base + int(offsets[-1])], dtype=np.uint8)
    # hashes at ALL global positions (k shifted adds — k is small),
    # then gather the in-row ones
    m = len(data) - k + 1
    acc = np.zeros(m, dtype=UINT64)
    with np.errstate(over="ignore"):
        for j in range(k):
            acc = acc * HASH_BASE + data[j : j + m].astype(UINT64)
    row_ids = np.repeat(np.arange(n, dtype=np.int64), nh)
    within = np.arange(total, dtype=np.int64) - np.repeat(h_offsets[:-1], nh)
    starts = offsets[:-1][row_ids] + within
    return splitmix64(acc[starts]), h_offsets


def winnow_select(hashes: np.ndarray, h_offsets: np.ndarray, w: int):
    """Winnowing selection: per row, the (leftmost-min) fingerprint of
    every window of ``w`` consecutive k-gram hashes.

    Rows with fewer than ``w`` k-grams are skipped — they are shorter
    than the guarantee length and cannot hold a qualifying span.

    Returns (row_ids: int64[s], pos: int64[s], fp: uint64[s]) with
    ``pos`` the k-gram start offset within the row, deduplicated.
    """
    h_offsets = np.asarray(h_offsets, dtype=np.int64)
    nh = h_offsets[1:] - h_offsets[:-1]
    n = len(nh)
    nw = np.maximum(nh - (w - 1), 0)
    total_w = int(nw.sum())
    if total_w == 0 or len(hashes) < w:
        z = np.empty(0, dtype=np.int64)
        return z, z.copy(), np.empty(0, dtype=UINT64)
    wins = np.lib.stride_tricks.sliding_window_view(hashes, w)
    rel = wins.argmin(axis=1)
    row_ids_w = np.repeat(np.arange(n, dtype=np.int64), nw)
    within = np.arange(total_w, dtype=np.int64) - np.repeat(
        np.cumsum(np.r_[0, nw[:-1]]), nw
    )
    wstarts = h_offsets[:-1][row_ids_w] + within  # global window starts
    sel = wstarts + rel[wstarts]
    # dedupe (adjacent windows usually reselect the same fingerprint)
    sel = np.unique(sel)
    rows = np.searchsorted(h_offsets[1:], sel, side="right")
    pos = sel - h_offsets[:-1][rows]
    return rows, pos, hashes[sel]
