"""Shared payload-column helpers for decode-family actor stages.

A dedup corpus is byte-dup-heavy BY CONSTRUCTION, so every stage that
derives a value from raw payload bytes (pHash recompute, decode-stats
feature extraction, thumbnailing) repeats most of its work on
byte-identical payloads. ``PayloadMemo`` keys each payload by a
BLAKE2b-128 digest (the image_exact_dedup identity convention: one C
pass at GB/s against ~1 ms of inflate + DCT per decode) and computes
each DISTINCT payload once per actor — the memo lives across batches
in the actor, bounded by ``cap``.

Exactness: byte-equal payloads decode to equal pixels, hence equal
derived values; the digest is cryptographic. Payload bytes stay
zero-copy (memoryview slices over the flat Arrow buffer); only
distinct payloads pay the one ``bytes()`` copy a codec needs.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa


def flat_binary_view(col) -> tuple[memoryview, np.ndarray]:
    """Binary column -> (zero-copy memoryview of the FULL values
    buffer, absolute int64 offsets). Segment i is
    ``mv[offs[i] : offs[i+1]]`` — the offsets are absolute positions
    into the (possibly shared, possibly sliced-into) parent buffer, so
    they index ``mv`` directly; subtracting ``offs[0]`` would read the
    wrong bytes for any non-zero-offset (sliced) array."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    odt = np.int64 if pa.types.is_large_binary(col.type) else np.int32
    offs = np.frombuffer(col.buffers()[1], dtype=odt)[
        col.offset : col.offset + len(col) + 1
    ].astype(np.int64)
    buf = col.buffers()[2]
    mv = memoryview(buf) if buf is not None else memoryview(b"")
    return mv, offs


class PayloadMemo:
    """Per-actor bounded memo: payload digest -> computed value."""

    def __init__(self, cap: int = 262_144):
        self.cap = cap
        self.cache: dict[bytes, object] = {}

    def map(self, col, fn) -> list:
        """One ``fn(segment_memoryview)`` call per DISTINCT payload;
        returns the per-row value list. ``fn`` must not raise — wrap
        decode failures into a sentinel value inside ``fn`` (the
        sentinel memoizes too: a corrupt payload fails once) — and
        must not return None (None is the cache-miss marker)."""
        mv, offs = flat_binary_view(col)
        cache = self.cache
        out = []
        for i in range(len(offs) - 1):
            seg = mv[offs[i] : offs[i + 1]]
            key = hashlib.blake2b(seg, digest_size=16).digest()
            hit = cache.get(key)
            if hit is None:
                hit = fn(seg)
                if len(cache) >= self.cap:
                    cache.clear()  # bounded (~tens of MB at the cap)
                cache[key] = hit
            out.append(hit)
        return out
