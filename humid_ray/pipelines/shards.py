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


def _range_boundaries(ds, key_col: str, n_buckets: int,
                      seed: int = 2026) -> np.ndarray:
    """Equal-frequency bucket cut points for ``key_col`` from a
    bounded deterministic hash sample (every block contributes its
    local bottom-k by splitmix64(key+seed), so the sample — and
    therefore the boundaries — is independent of block layout).
    Returned array keeps the key dtype (int64 vs uint64 matters:
    numpy upcasts mixed comparisons to float64)."""
    from humid_ray.util import UINT64, splitmix64

    def _u64(keys: np.ndarray) -> np.ndarray:
        return (keys if keys.dtype == UINT64
                else keys.astype(np.int64).view(UINT64))

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"key": t.column(key_col),
                             "_h": pa.array([], type=pa.int64())})
        keys = t.column(key_col).to_numpy(zero_copy_only=False)
        h = splitmix64(_u64(keys) + UINT64(seed))
        k = min(BOUNDARY_SAMPLE, t.num_rows)
        sel = (np.argpartition(h, k - 1)[:k] if k < t.num_rows
               else np.arange(t.num_rows))
        return pa.table({"key": t.column(key_col).take(pa.array(sel)),
                         "_h": pa.array(h[sel].view(np.int64))})

    chunks = list(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .select_columns(["key", "_h"])
        .iter_batches(batch_size=65536, batch_format="pyarrow")
    )
    chunks = [c for c in chunks if c.num_rows]
    if not chunks:
        return np.empty(0, dtype=np.int64)
    t = pa.concat_tables(chunks)
    h = t.column("_h").to_numpy(zero_copy_only=False).view(UINT64)
    keys = t.column("key").to_numpy(zero_copy_only=False)
    sample = np.sort(keys[np.argsort(h, kind="stable")[:BOUNDARY_SAMPLE]])
    if n_buckets <= 1 or len(sample) == 0:
        return np.empty(0, dtype=keys.dtype)
    cuts = sample[np.linspace(0, len(sample) - 1, n_buckets + 1)
                  .astype(np.int64)[1:-1]]
    return np.unique(cuts)


def _exclusive_scan(keyed, key_col: str, weight_col: str | None,
                    n_buckets: int, finalize, empty_tbl: pa.Table):
    """Exclusive prefix-sum of ``weight_col`` (None = count 1 per row)
    over global ascending (``key_col``, doc_id) order — the two-phase
    distributed scan shared by every order-dependent operator here.

    ``keyed`` must be a MATERIALIZED narrow dataset carrying doc_id,
    the key and the weight. ``finalize(g_sorted_cols, excl)`` receives
    the group's column dict (sorted by key then doc_id) plus the
    exclusive-prefix array and returns the output table.
    """
    bounds = _range_boundaries(keyed, key_col, n_buckets)
    bounds_ref = ray.put(bounds)

    def tag(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.append_column("bucket", pa.array([], type=pa.int64()))
        keys = batch.column(key_col).to_numpy(zero_copy_only=False)
        b = ray.get(bounds_ref)
        bk = (np.searchsorted(b, keys, side="right").astype(np.int64)
              if len(b) else np.zeros(len(keys), dtype=np.int64))
        return batch.append_column("bucket", pa.array(bk))

    tagged = keyed.map_batches(tag, batch_format="pyarrow",
                               zero_copy_batch=True)

    def totals_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"bucket": pa.array([], type=pa.int64()),
                             "total": pa.array([], type=pa.int64())})
        bk = t.column("bucket").to_numpy(zero_copy_only=False)
        w = (t.column(weight_col).to_numpy(zero_copy_only=False)
             .astype(np.int64) if weight_col
             else np.ones(t.num_rows, dtype=np.int64))
        ub, inv = np.unique(bk, return_inverse=True)
        # exact int64 segment sums (float bincount weights round >2^53)
        total = np.zeros(len(ub), dtype=np.int64)
        np.add.at(total, inv, w)
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

    def scan_group(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return empty_tbl
        cols = {
            name: g.column(name).to_numpy(zero_copy_only=False)
            for name in g.column_names if name != "bucket"
        }
        bucket = int(g.column("bucket")[0].as_py())
        base = int(ray.get(offsets_ref)[bucket])
        ids = cols["doc_id"].astype(np.int64)
        keys = cols[key_col]
        order = (np.argsort(ids, kind="stable") if key_col == "doc_id"
                 else np.lexsort((ids, keys)))
        cols = {k: v[order] for k, v in cols.items()}
        w = (cols[weight_col].astype(np.int64) if weight_col
             else np.ones(len(ids), dtype=np.int64))
        excl = base + np.cumsum(w) - w
        return finalize(cols, excl)

    return tagged.groupby("bucket").map_groups(
        scan_group, batch_format="pyarrow"
    )


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

    def finalize(cols, excl):
        return pa.table(
            {
                "doc_id": pa.array(cols["doc_id"].astype(np.int64)),
                "n_tokens": pa.array(cols["n_tokens"].astype(np.int64)),
                "shard_id": pa.array(excl // capacity),
            }
        )

    return _exclusive_scan(toks, "doc_id", "n_tokens", n_buckets,
                           finalize, pa.table(_EMPTY_PACKED))


_EMPTY_SHUFFLE = {
    "doc_id": pa.array([], type=pa.int64()),
    "rank": pa.array([], type=pa.int64()),
}


def global_shuffle(sf_dir: str, n_buckets: int = N_RANGE_BUCKETS):
    """(doc_id, rank): deterministic seeded global permutation — the
    reproducible corpus shuffle a training run consumes (rank is
    1-based, ties in the 64-bit hash broken by doc_id).

    ``ds.random_shuffle()`` gives a different layout per run and no
    queryable rank; this is the scan instance with key =
    splitmix64(doc_id) and weight = 1, so the permutation is a pure
    row function plus a global rank — identical at any parallelism,
    resumable, and joinable back to payloads by doc_id.
    """
    from humid_ray.util import UINT64, splitmix64

    def key(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"doc_id": pa.array([], type=pa.int64()),
                             "h": pa.array([], type=pa.uint64())})
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        h = splitmix64(ids.astype(np.int64).view(UINT64))
        return pa.table({"doc_id": batch.column("doc_id"),
                         "h": pa.array(h, type=pa.uint64())})

    keyed = (
        read_documents(sf_dir, columns=["doc_id"])
        .map_batches(key, batch_format="pyarrow", zero_copy_batch=True)
        .materialize()
    )
    if keyed.count() == 0:
        return ray.data.from_arrow(pa.table(_EMPTY_SHUFFLE))

    def finalize(cols, excl):
        return pa.table(
            {
                "doc_id": pa.array(cols["doc_id"].astype(np.int64)),
                "rank": pa.array(excl + 1),
            }
        )

    return _exclusive_scan(keyed, "h", None, n_buckets,
                           finalize, pa.table(_EMPTY_SHUFFLE))


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


_EMPTY_RANKED = {
    "doc_id": pa.array([], type=pa.int64()),
    "n_chars": pa.array([], type=pa.int64()),
    "rank": pa.array([], type=pa.int64()),
}


def rank_by_length(sf_dir: str, n_buckets: int = N_RANGE_BUCKETS):
    """(doc_id, n_chars, rank): global ORDER BY — every document's
    1-based rank longest-first (ties by doc_id), the sorted-export /
    "give me the corpus in curriculum order" operator.

    The distributed-ORDER-BY instance of the exclusive scan: key =
    -n_chars, weight = 1. No global sort shuffle of the corpus — a
    sampled range partitioner buckets rows, each bucket lexsorts
    locally, and the driver exscans |buckets| totals; identical output
    at any parallelism and joinable back to payloads by doc_id."""

    def key(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"doc_id": pa.array([], type=pa.int64()),
                             "n_chars": pa.array([], type=pa.int64()),
                             "k": pa.array([], type=pa.int64())})
        nc = batch.column("n_chars").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        return pa.table({"doc_id": batch.column("doc_id"),
                         "n_chars": pa.array(nc),
                         "k": pa.array(-nc)})

    keyed = (
        read_documents(sf_dir, columns=["doc_id", "n_chars"])
        .map_batches(key, batch_format="pyarrow", zero_copy_batch=True)
        .materialize()
    )
    if keyed.count() == 0:
        return ray.data.from_arrow(pa.table(_EMPTY_RANKED))

    def finalize(cols, excl):
        return pa.table(
            {"doc_id": pa.array(cols["doc_id"].astype(np.int64)),
             "n_chars": pa.array(cols["n_chars"].astype(np.int64)),
             "rank": pa.array(excl + 1)}
        )

    return _exclusive_scan(keyed, "k", None, n_buckets,
                           finalize, pa.table(_EMPTY_RANKED))


def rank_by_length_sql(table: str = "documents") -> str:
    """DuckDB oracle for ``rank_by_length``."""
    return (
        "SELECT doc_id, n_chars, CAST(row_number() OVER "
        "(ORDER BY n_chars DESC, doc_id) AS BIGINT) AS \"rank\" "
        f"FROM {table}"
    )
