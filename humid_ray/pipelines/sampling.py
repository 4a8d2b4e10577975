"""Deterministic hash-based sampling / splitting over the
``documents`` table.

A 100 TB corpus can't be split by shuffling or row position — splits
must be a pure function of a stable key so every re-run (and every
node) agrees without coordination. The assignment is
splitmix64(doc_id) % n_buckets, the same mixer the dedup signatures
use (humid_ray/util.py), so it is reproducible in DuckDB HUGEINT
arithmetic for the oracle. No shuffle anywhere: the split is one
streaming vectorized map over the corpus.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from humid_ray.util import UINT64, splitmix64

N_BUCKETS = 100


def read_documents(sf_dir: str, columns=None):
    return ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=columns)


def hash_split(sf_dir: str, val_pct: int = 10, n_buckets: int = N_BUCKETS):
    """(doc_id, bucket, split) — deterministic train/val assignment:
    bucket = splitmix64(doc_id) % n_buckets, split = 'val' for buckets
    below val_pct else 'train'. Stable across runs, machines, and
    corpus growth (a doc's split never changes when other docs are
    added — the property positional or shuffled splits lack)."""

    def kernel(batch: pa.Table) -> pa.Table:
        d = batch.column("doc_id").to_numpy(zero_copy_only=False)
        bucket = (splitmix64(d.view(np.uint64)) % UINT64(n_buckets)).astype(
            np.int64
        )
        split = np.where(bucket < val_pct, "val", "train")
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "bucket": pa.array(bucket),
                "split": pa.array(split.astype(object), type=pa.string()),
            }
        )

    return read_documents(sf_dir, columns=["doc_id"]).map_batches(
        kernel, batch_format="pyarrow", zero_copy_batch=True
    )


def _topk_per_lang_kernel(k: int):
    """Top-k rows per lang by (n_chars DESC, doc_id ASC) — one lexsort
    + segment-rank pass, no per-group Python. Used both as the
    per-batch partial and the per-group final (top-k is a semigroup:
    topk(topk(A) ∪ topk(B)) == topk(A ∪ B))."""

    def kernel(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "lang": pa.array([], type=pa.string()),
                "doc_id": pa.array([], type=pa.int64()),
                "n_chars": pa.array([], type=pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        lang = np.asarray(t.column("lang").to_pylist(), dtype=object)
        doc = t.column("doc_id").to_numpy(zero_copy_only=False)
        nch = t.column("n_chars").to_numpy(zero_copy_only=False)
        codes = np.unique(lang, return_inverse=True)[1]
        order = np.lexsort((doc, -nch, codes))
        lang, doc, nch, codes = lang[order], doc[order], nch[order], codes[order]
        new = np.r_[True, codes[1:] != codes[:-1]]
        seg_start = np.maximum.accumulate(
            np.where(new, np.arange(len(codes)), 0)
        )
        rank = np.arange(len(codes)) - seg_start
        keep = rank < k
        return pa.table(
            {
                "lang": pa.array(lang[keep].tolist(), type=pa.string()),
                "doc_id": pa.array(doc[keep].astype(np.int64)),
                "n_chars": pa.array(nch[keep].astype(np.int64)),
            }
        )

    return kernel


def top_docs_per_lang(sf_dir: str, k: int = 10):
    """(lang, doc_id, n_chars, rank): the k longest documents per
    language — the distributed top-k-per-key pattern: a per-batch
    partial top-k (each batch contributes at most k rows per lang to
    the shuffle) followed by one tiny groupby(lang) final top-k.
    Deterministic tie-break (n_chars DESC, doc_id ASC) makes it
    SQL-oracled via row_number()."""

    partial = _topk_per_lang_kernel(k)
    final = _topk_per_lang_kernel(k)

    def with_rank(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "lang": pa.array([], type=pa.string()),
                    "doc_id": pa.array([], type=pa.int64()),
                    "n_chars": pa.array([], type=pa.int64()),
                    "rank": pa.array([], type=pa.int64()),
                }
            )
        out = final(t)
        return out.append_column(
            "rank", pa.array(np.arange(1, out.num_rows + 1, dtype=np.int64))
        )

    return (
        read_documents(sf_dir, columns=["doc_id", "lang", "n_chars"])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("lang")
        .map_groups(with_rank, batch_format="pyarrow")
    )


def hash_sample(sf_dir: str, pct: int = 10, n_buckets: int = N_BUCKETS,
                columns=None):
    """The deterministic pct% sample of the documents table (rows whose
    hash bucket falls below pct) — the seeded, coordination-free
    row-sampling primitive (same family as the IVF training sample in
    pipelines/ann.py)."""

    def kernel(batch: pa.Table) -> pa.Table:
        d = batch.column("doc_id").to_numpy(zero_copy_only=False)
        bucket = splitmix64(d.view(np.uint64)) % UINT64(n_buckets)
        return batch.filter(pa.array(bucket < pct))

    return read_documents(sf_dir, columns=columns).map_batches(
        kernel, batch_format="pyarrow", zero_copy_batch=True
    )
