"""Phase 2 — exact dedup: the trie's counting role as a hash shuffle.

HUMID analog: ``trie.add(word)`` bumping the leaf ``count`` per
duplicate (reference src/humid.cc:89-99, Leaf::count). In Ray Data the
exact-match index is not shared mutable state but a groupby on the
full signature: one shuffle keyed on ``sig`` yields
(sig, count, first_id) — the set of trie leaves.

Shuffle volume is cut by a per-batch partial aggregation (combiner)
before the wide groupby: duplicate sigs inside a batch collapse to one
row first, so the exchange carries at most |distinct sigs per batch|
rows, not |rows|.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ray.data.aggregate import Min, Sum


def _partial_unique(batch: pa.Table) -> pa.Table:
    """Per-batch combiner: collapse duplicate sigs, keep min image_id.

    ``count`` here is the partial multiplicity; ``first_id`` the
    partial min (HUMID's representative emission prefers the first
    file-order occurrence, reference src/humid.cc:220-234; our
    canonical order is min image_id).
    """
    sig = batch.column("sig").to_numpy(zero_copy_only=False)
    ids = batch.column("image_id")
    order = pc.sort_indices(
        batch, sort_keys=[("sig", "ascending"), ("image_id", "ascending")]
    )
    sig_sorted = sig[order.to_numpy()]
    uniq, start, counts = np.unique(sig_sorted, return_index=True, return_counts=True)
    first_ids = ids.take(order.take(pa.array(start, type=pa.int64())))
    return pa.table(
        {
            "sig": pa.array(uniq),
            "count": pa.array(counts, type=pa.int64()),
            "first_id": first_ids,
        }
    )


def unique_signatures(sig_ds):
    """signatures Dataset (usable rows only) -> (sig, count, first_id).

    DuckDB-oracle equivalent: SELECT sig, COUNT(*) AS count,
    MIN(image_id) AS first_id FROM sigs GROUP BY sig.
    """
    partial = sig_ds.select_columns(["sig", "image_id"]).map_batches(
        _partial_unique, batch_format="pyarrow", zero_copy_batch=True
    )
    return (
        partial.groupby("sig")
        .aggregate(
            Sum("count", alias_name="count"),
            Min("first_id", alias_name="first_id"),
        )
    )
