"""Join helpers: broadcast (small side) and hash (both sides large).

HUMID analog: the second-pass ``trie.find(word)`` lookups that map a
record back to its leaf/cluster (reference src/humid.cc:220-223,
268-277). The trie is shared process memory there; here the small
side is put in the object store ONCE (``ray.put``) and every actor
reads it zero-copy — never re-shipped per batch. When the small side
isn't small, callers fall back to ``Dataset.join`` (hash shuffle).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

from humid_ray.util import UINT64


def hash_string_column(col: pa.Array | pa.ChunkedArray) -> np.ndarray:
    """Vectorized 64-bit hash of an Arrow string column (splitmix64
    over a polynomial byte hash) — lets string-keyed lookups ride the
    sorted-uint64 SigLookup machinery without per-row Python."""
    from humid_ray.functions.winnow import string_bytes
    from humid_ray.util import hash_bytes_segments

    data, offsets = string_bytes(col)
    return hash_bytes_segments(data, offsets)


class SigLookup:
    """Sorted-array uint64 key -> row index lookup (broadcastable)."""

    def __init__(self, keys: np.ndarray, columns: dict[str, np.ndarray]):
        order = np.argsort(keys, kind="stable")
        self.keys = np.ascontiguousarray(keys[order])
        self.columns = {k: v[order] for k, v in columns.items()}

    @classmethod
    def from_dataset(cls, ds, key: str, columns: list[str]) -> "SigLookup":
        tables = []
        for batch in ds.iter_batches(batch_size=262144, batch_format="pyarrow"):
            tables.append(batch.select([key] + columns))
        t = pa.concat_tables(tables) if tables else None
        if t is None or t.num_rows == 0:
            return cls(np.empty(0, dtype=UINT64), {c: np.empty(0) for c in columns})
        keys = t.column(key).to_numpy(zero_copy_only=False).view(UINT64)
        cols = {
            c: t.column(c).to_numpy(zero_copy_only=False) for c in columns
        }
        return cls(keys, cols)

    def lookup(self, probe: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """(found_mask, row_indices) for a probe uint64 array."""
        probe = np.asarray(probe, dtype=UINT64)
        idx = np.searchsorted(self.keys, probe)
        idx = np.minimum(idx, max(len(self.keys) - 1, 0))
        found = (
            (self.keys[idx] == probe) if len(self.keys) else np.zeros(len(probe), dtype=bool)
        )
        return found, idx

    def get(self, col: str, idx: np.ndarray) -> np.ndarray:
        return self.columns[col][idx]


def broadcast_lookup_ref(ds, key: str, columns: list[str]):
    """Materialize the small side into one SigLookup in the object
    store; returns the ObjectRef (read it in actor __init__)."""
    return ray.put(SigLookup.from_dataset(ds, key, columns))


def join_kwargs(*side_counts: int, bytes_per_row: int = 64,
                per_partition: int = 1024, cap: int = 64) -> dict:
    """``num_partitions`` + ``partition_size_hint`` kwargs for
    ``Dataset.join`` sized to the actual join sides.

    Without a hint, Ray's join estimates every partition at
    ``target_max_block_size`` (128 MiB) and each aggregator actor
    reserves ~7x that of logical memory — ~0.9 GiB x num_partitions
    PER JOIN. For the collapsed per-key sides these operators join
    (tens of bytes per row), that over-reserves by ~1000x, and a
    session running several joins back-to-back can exhaust the
    cluster's memory resource and deadlock the streaming executor
    (observed: 100 idle aggregators holding 87.5 GiB). The hint is the
    larger side's byte estimate split across partitions (floored at
    1 MiB), so reservations track reality.
    """
    import math

    nparts = join_partitions(*side_counts, per_partition=per_partition,
                             cap=cap)
    largest = max(side_counts) if side_counts else 0
    hint = max(1 << 20, math.ceil(largest * bytes_per_row / nparts))
    return {"num_partitions": nparts, "partition_size_hint": hint}


def join_partitions(*side_counts: int, per_partition: int = 1024,
                    cap: int = 64) -> int:
    """num_partitions for ``Dataset.join`` sized to the SMALLER side's
    row count.

    Ray's hash-join aggregator represents a partition that received
    zero rows of a side as a schema-less Arrow table, which acero then
    rejects ("No match ... for key field reference ... on left side"):
    any join whose key distribution leaves one partition empty crashes.
    Keeping >= ``per_partition`` rows of the smaller side per partition
    makes an empty partition statistically impossible (and exactly
    impossible at 1 partition, the tiny-input case), while large inputs
    still get min(cap, CPUs/2)-way parallelism — at the 100 TB design
    point every partition holds millions of keys and the clamp never
    binds.
    """
    import math

    import ray as _ray

    cpus = int(_ray.cluster_resources().get("CPU", 8))
    smallest = max(0, min(side_counts))
    return max(1, min(cap, cpus // 2,
                      math.ceil(smallest / per_partition)))


def copart_buckets(*side_counts: int, per_bucket: int = 65536,
                   lo: int = 8, hi: int = 4096) -> int:
    """Bucket count for a co-partitioned bucket join / bucketed
    groupby: enough buckets that one bucket's rows (all sides) fit
    comfortably in a task's heap, floored so small inputs still spread
    across workers. Scales with the LARGER side — at 100 TB the bucket
    count grows linearly while per-task work stays ~per_bucket rows."""
    import math

    largest = max(side_counts) if side_counts else 0
    return int(min(hi, max(lo, math.ceil(largest / per_bucket))))


def probe_sorted_side(key: np.ndarray, side_idx: np.ndarray,
                      probe: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Sort-merge probe of a bucket's dimension-side rows.

    ``key`` is the bucket table's full key column, ``side_idx`` the row
    indices belonging to the probed (dimension) side, ``probe`` the
    sorted-unique keys to look up. Sorts the side rows once, binary
    searches each probe key, and returns ``(match_mask_over_probe,
    original_row_indices_of_matches)`` — indices into the ORIGINAL
    bucket table, so callers fetch payload columns with Arrow ``take``
    (exact for null-bearing int64 columns, where a ``to_numpy`` of the
    whole column would detour through float64 and corrupt keys beyond
    2**53)."""
    ssort = side_idx[np.argsort(key[side_idx])]
    ks = key[ssort]
    pos = np.searchsorted(ks, probe)
    m = (pos < len(ks)) & (ks[np.minimum(pos, len(ks) - 1)] == probe)
    return m, ssort[pos[m]]


def sorted_member(sorted_keys: np.ndarray, probe: np.ndarray) -> np.ndarray:
    """Membership mask of ``probe`` in a PRE-SORTED key array — the
    broadcast-side probe used all over the image operators (keys are
    sorted once at build time; np.isin would re-sort them per batch)."""
    if not len(sorted_keys) or not len(probe):
        return np.zeros(len(probe), dtype=bool)
    pos = np.searchsorted(sorted_keys, probe)
    pos[pos == len(sorted_keys)] = 0
    return sorted_keys[pos] == probe


def apply_sorted_labels(sorted_keys: np.ndarray, labels: np.ndarray,
                        probe: np.ndarray) -> np.ndarray:
    """Map ``probe`` through a PRE-SORTED ``(sorted_keys -> labels)``
    table; keys not present keep their own value (the singleton-cluster
    fallback every label kernel uses). Returns a fresh array."""
    out = probe.copy()
    if len(sorted_keys) and len(probe):
        pos = np.searchsorted(sorted_keys, probe)
        pos[pos == len(sorted_keys)] = 0
        hit = sorted_keys[pos] == probe
        out[hit] = labels[pos[hit]]
    return out


def take_column(t: pa.Table, name: str, rows: np.ndarray) -> pa.Array:
    """Exact row gather of one column: combine chunks once, Arrow
    ``take`` — never converts the whole column through numpy first."""
    col = t.column(name)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return col.take(pa.array(rows, type=pa.int64()))


def key_buckets(keys, n_buckets: int):
    """splitmix64-mixed int64 bucket ids for a key column — raw
    sequential ids would stripe instead of hash under a plain ``%``."""
    import numpy as np

    from humid_ray.util import splitmix64

    return (
        splitmix64(np.asarray(keys).astype(np.uint64))
        % np.uint64(n_buckets)
    ).astype(np.int64)
