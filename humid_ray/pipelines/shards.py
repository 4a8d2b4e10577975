"""Token-aware shard packing: the distributed SCAN (global running
sum in a total key order) Ray Data has no native operator for.

An LLM training-data pipeline ends by packing documents into
fixed-token-budget shards in a deterministic order. That is a global
cumulative sum over doc_id order — an operation a groupby cannot
express (every row's result depends on ALL earlier rows) and a naive
implementation would serialize (sort + single-task cumsum, or a
driver loop over ``iter_rows``).

Scale shape (textbook two-phase scan, like MPI exscan):

1. Range-partition the key space: a bounded deterministic hash sample
   of doc_ids gives ~equal-frequency bucket boundaries (skew-safe for
   ANY id distribution — dense, sparse, clustered), broadcast once.
2. Per-bucket token totals: per-batch combiners emit (bucket, sum)
   partials -> tiny groupby -> driver computes the EXCLUSIVE prefix
   over bucket order (|buckets| rows, trivially small) -> broadcast.
3. One shuffle into buckets: each bucket kernel sorts its rows by
   doc_id, local cumsum + its bucket's global offset; shard_id =
   exclusive_prefix // capacity.

Nothing but (doc_id, n_tokens) ever shuffles; text is dropped at the
tokenize stage. The reference has no analog (HUMID emits in trie-walk
order, single-threaded); this is a beyond-reference operator per the
north_rule training-pipeline toolbox.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data
from ray.data.aggregate import Sum

from humid_ray.functions.text import tokenize_batch

N_RANGE_BUCKETS = 64
BOUNDARY_SAMPLE = 4096

_EMPTY_PACKED = {
    "doc_id": pa.array([], type=pa.int64()),
    "n_tokens": pa.array([], type=pa.int64()),
    "shard_id": pa.array([], type=pa.int64()),
}


def read_documents(sf_dir: str, columns=None):
    return ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=columns)


def _token_counts(sf_dir: str):
    """(doc_id, n_tokens) — text dropped before anything shuffles."""

    def kernel(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {"doc_id": pa.array([], type=pa.int64()),
                 "n_tokens": pa.array([], type=pa.int64())}
            )
        _, offs = tokenize_batch(batch.column("text"))
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_tokens": pa.array((offs[1:] - offs[:-1]).astype(np.int64)),
            }
        )

    return read_documents(sf_dir, columns=["doc_id", "text"]).map_batches(
        kernel, batch_format="pyarrow", zero_copy_batch=True
    )


def _range_boundaries(toks, n_buckets: int, seed: int = 2026) -> np.ndarray:
    """Equal-frequency bucket cut points from a bounded deterministic
    hash sample of doc_ids (every block contributes its local
    bottom-k by splitmix64(doc_id+seed), so the sample — and therefore
    the boundaries — is independent of block layout)."""
    from humid_ray.util import UINT64, splitmix64

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"doc_id": pa.array([], type=pa.int64()),
                             "_h": pa.array([], type=pa.int64())})
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        h = splitmix64(ids.astype(np.int64).view(UINT64) + UINT64(seed))
        k = min(BOUNDARY_SAMPLE, t.num_rows)
        sel = (np.argpartition(h, k - 1)[:k] if k < t.num_rows
               else np.arange(t.num_rows))
        return pa.table({"doc_id": pa.array(ids[sel].astype(np.int64)),
                         "_h": pa.array(h[sel].view(np.int64))})

    chunks = list(
        toks.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .select_columns(["doc_id", "_h"])
        .iter_batches(batch_size=65536, batch_format="pyarrow")
    )
    if not chunks:
        return np.empty(0, dtype=np.int64)
    t = pa.concat_tables(chunks)
    if t.num_rows == 0:
        return np.empty(0, dtype=np.int64)
    h = t.column("_h").to_numpy(zero_copy_only=False).view(UINT64)
    ids = t.column("doc_id").to_numpy(zero_copy_only=False)
    sample = np.sort(ids[np.argsort(h, kind="stable")[:BOUNDARY_SAMPLE]])
    if n_buckets <= 1 or len(sample) == 0:
        return np.empty(0, dtype=np.int64)
    cuts = sample[np.linspace(0, len(sample) - 1, n_buckets + 1)
                  .astype(np.int64)[1:-1]]
    return np.unique(cuts)


def pack_shards(sf_dir: str, capacity: int = 2048,
                n_buckets: int = N_RANGE_BUCKETS):
    """(doc_id, n_tokens, shard_id): pack documents, in ascending
    doc_id order, into training shards of ``capacity`` tokens — a doc
    lands in the shard holding its first token (shard_id = exclusive
    prefix-sum of tokens // capacity; oversized docs own their span's
    start shard). Deterministic for any block layout / parallelism.
    """
    toks = _token_counts(sf_dir).materialize()  # consumed 3x; 2 int64 cols
    if toks.count() == 0:
        # an empty Ray Data groupby drops its schema — hand back a
        # typed empty table instead
        return ray.data.from_arrow(pa.table(_EMPTY_PACKED))
    bounds = _range_boundaries(toks, n_buckets)
    bounds_ref = ray.put(bounds)

    def bucket_of(ids: np.ndarray, b: np.ndarray) -> np.ndarray:
        return np.searchsorted(b, ids, side="right").astype(np.int64)

    def tag(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.append_column("bucket", pa.array([], type=pa.int64()))
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        b = ray.get(bounds_ref)
        return batch.append_column(
            "bucket", pa.array(bucket_of(ids.astype(np.int64), b))
        )

    tagged = toks.map_batches(tag, batch_format="pyarrow",
                              zero_copy_batch=True)

    def totals_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"bucket": pa.array([], type=pa.int64()),
                             "total": pa.array([], type=pa.int64())})
        bk = t.column("bucket").to_numpy(zero_copy_only=False)
        nt = t.column("n_tokens").to_numpy(zero_copy_only=False)
        ub, inv = np.unique(bk, return_inverse=True)
        # exact int64 segment sums (float bincount weights round >2^53)
        total = np.zeros(len(ub), dtype=np.int64)
        np.add.at(total, inv, nt.astype(np.int64))
        return pa.table(
            {"bucket": pa.array(ub.astype(np.int64)),
             "total": pa.array(total)}
        )

    # phase 2: per-bucket totals -> driver-side exclusive prefix
    # (|buckets| rows; the ONLY driver materialization in the operator)
    tot = {}
    for b in (
        tagged.map_batches(totals_partial, batch_format="pyarrow")
        .groupby("bucket").aggregate(Sum("total", alias_name="total"))
        .iter_batches(batch_size=65536, batch_format="pyarrow")
    ):
        tot.update(zip(b.column("bucket").to_pylist(),
                       b.column("total").to_pylist()))
    n_b = len(bounds) + 1
    per_bucket = np.array([tot.get(i, 0) for i in range(n_b)], dtype=np.int64)
    offsets = np.zeros(n_b, dtype=np.int64)
    np.cumsum(per_bucket[:-1], out=offsets[1:])
    offsets_ref = ray.put(offsets)

    def pack_group(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table(_EMPTY_PACKED)
        ids = g.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        nt = g.column("n_tokens").to_numpy(zero_copy_only=False).astype(np.int64)
        bucket = int(g.column("bucket")[0].as_py())
        base = int(ray.get(offsets_ref)[bucket])
        order = np.argsort(ids, kind="stable")
        ids, nt = ids[order], nt[order]
        excl = base + np.cumsum(nt) - nt
        return pa.table(
            {
                "doc_id": pa.array(ids),
                "n_tokens": pa.array(nt),
                "shard_id": pa.array(excl // capacity),
            }
        )

    return (
        tagged.groupby("bucket")
        .map_groups(pack_group, batch_format="pyarrow")
    )


def shard_manifest(sf_dir: str, capacity: int = 2048,
                   n_buckets: int = N_RANGE_BUCKETS):
    """(shard_id, n_docs, n_tokens): the shard-level manifest a
    training loader reads — one groupby over the packed assignment."""
    from ray.data.aggregate import Count

    packed = pack_shards(sf_dir, capacity, n_buckets).materialize()
    if packed.count() == 0:
        return pa.table(
            {"shard_id": pa.array([], type=pa.int64()),
             "n_docs": pa.array([], type=pa.int64()),
             "n_tokens": pa.array([], type=pa.int64())}
        )
    return (
        packed.groupby("shard_id")
        .aggregate(Count(alias_name="n_docs"),
                   Sum("n_tokens", alias_name="n_tokens"))
    )
