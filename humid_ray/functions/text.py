"""String/scalar helpers and vectorized tokenization.

The scalar helpers mirror HUMID's word-assembly string functions so the
unit-test parity matrix from the reference carries over:

* ``extract_last_field``  <-> reference src/fastq.cc:192-199
* ``valid_umi``           <-> reference src/fastq.cc:201-214 (hex here)
* ``make_string_size``    <-> reference src/fastq.cc:57-66
* ``extract_umi``         <-> reference src/fastq.cc:72-93 (header UMI:
  token before first space, last '_' field, else last ':' field)

Tokenization is Arrow-vectorized: lowercase + split on non-alnum; the
flattened token bytes + offsets feed the vectorized hash kernels.
"""

from __future__ import annotations

import string as _string

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from humid_ray.util import hash_bytes_segments

_HEX = set(_string.hexdigits)


def extract_last_field(s: str, sep: str) -> str:
    """Substring after the LAST ``sep``; empty if absent."""
    last = s.rfind(sep)
    if last == -1:
        return ""
    return s[last + 1 :]


def valid_umi(umi: str) -> bool:
    """A valid id-embedded UMI token: nonempty, all hex digits.

    (The reference requires ACGT over the DNA alphabet; the analog for
    image ids is a hex fingerprint token.)
    """
    return bool(umi) and all(c in _HEX for c in umi)


def make_string_size(s: str, size: int, padding: str) -> str:
    """Cut or right-pad ``s`` to exactly ``size`` chars."""
    if size <= len(s):
        return s[:size]
    return s + padding * (size - len(s))


def extract_umi(identifier: str) -> str:
    """UMI token from an id: before the first space, prefer the last
    '_' field, fall back to the last ':' field; invalid -> ''."""
    head = identifier.split(" ", 1)[0]
    umi = extract_last_field(head, "_")
    if valid_umi(umi):
        return umi
    umi = extract_last_field(head, ":")
    if valid_umi(umi):
        return umi
    return ""


def edit_distance_within(a: str, b: str, m: int) -> bool:
    """True iff Levenshtein(a, b) <= m, via the classic banded DP —
    O((2m+1) * len) like the reference's bounded trie walk
    (asymmetricLevenshtein, reference trie header used by
    src/humid.cc:146-147). Exact, not an approximation."""
    la, lb = len(a), len(b)
    if abs(la - lb) > m:
        return False
    if m == 0:
        return a == b
    INF = m + 1
    prev = list(range(min(m, lb) + 1)) + [INF] * max(0, lb - m)
    if lb > m:
        prev = [j if j <= m else INF for j in range(lb + 1)]
    for i in range(1, la + 1):
        lo = max(1, i - m)
        hi = min(lb, i + m)
        cur = [INF] * (lb + 1)
        if i <= m:
            cur[0] = i
        ca = a[i - 1]
        for j in range(lo, hi + 1):
            cost = 0 if ca == b[j - 1] else 1
            v = prev[j - 1] + cost
            if prev[j] + 1 < v:
                v = prev[j] + 1
            if cur[j - 1] + 1 < v:
                v = cur[j - 1] + 1
            cur[j] = v if v <= m else INF
        if all(c > m for c in cur[lo:hi + 1]) and (i > m or cur[0] > m):
            return False
        prev = cur
    return prev[lb] <= m


def tokenize_batch(texts: pa.Array | pa.ChunkedArray):
    """Lowercase + split texts into word tokens, Arrow-vectorized.

    Returns ``(token_hashes: uint64[n_tokens], row_offsets: int64[n+1])``
    where row i's token hashes are ``token_hashes[row_offsets[i]:row_offsets[i+1]]``.
    Null/empty texts produce zero tokens.
    """
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    texts = pc.fill_null(pc.cast(texts, pa.string()), "")
    lower = pc.utf8_lower(texts)
    toks = pc.split_pattern_regex(lower, r"[^0-9a-z]+")
    flat = toks.flatten()  # no nulls possible after fill_null
    row_offsets = np.asarray(toks.offsets, dtype=np.int64)
    row_offsets = row_offsets - row_offsets[0]
    n_rows = len(row_offsets) - 1
    nonempty = pc.utf8_length(flat).to_numpy(zero_copy_only=False) > 0
    # recompute row offsets after dropping empty tokens (split artifacts)
    lens = row_offsets[1:] - row_offsets[:-1]
    keep_per_row = np.zeros(n_rows, dtype=np.int64)
    has = lens > 0
    if has.any() and len(nonempty):
        sums = np.add.reduceat(nonempty.astype(np.int64), row_offsets[:-1][has])
        keep_per_row[has] = sums
    new_offsets = np.zeros(n_rows + 1, dtype=np.int64)
    np.cumsum(keep_per_row, out=new_offsets[1:])
    kept = flat.filter(pa.array(nonempty)) if len(flat) else flat
    if len(kept) == 0:
        return np.empty(0, dtype=np.uint64), new_offsets
    kept = kept.combine_chunks() if isinstance(kept, pa.ChunkedArray) else kept
    raw_offs = np.frombuffer(kept.buffers()[1], dtype=np.int32)
    buf_offsets = raw_offs[kept.offset : kept.offset + len(kept) + 1].astype(np.int64)
    data = np.frombuffer(kept.buffers()[2], dtype=np.uint8)
    token_hashes = hash_bytes_segments(data, buf_offsets)
    return token_hashes, new_offsets
