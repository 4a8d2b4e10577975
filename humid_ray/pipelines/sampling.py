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
