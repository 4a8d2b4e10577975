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


def _bottomk_by_hash_kernel(k: int):
    """Bottom-k rows per lang by (splitmix64(doc_id), doc_id) — the
    ascending-hash twin of ``_topk_per_lang_kernel``; bottom-k is the
    same semigroup, so it serves as both the per-batch partial and the
    per-group final."""

    def kernel(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "lang": pa.array([], type=pa.string()),
                "doc_id": pa.array([], type=pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        lang = np.asarray(t.column("lang").to_pylist(), dtype=object)
        doc = t.column("doc_id").to_numpy(zero_copy_only=False)
        h = splitmix64(doc.astype(np.int64).view(UINT64))
        codes = np.unique(lang, return_inverse=True)[1]
        order = np.lexsort((doc, h, codes))
        lang, doc, codes = lang[order], doc[order], codes[order]
        new = np.r_[True, codes[1:] != codes[:-1]]
        seg_start = np.maximum.accumulate(
            np.where(new, np.arange(len(codes)), 0)
        )
        keep = (np.arange(len(codes)) - seg_start) < k
        return pa.table(
            {
                "lang": pa.array(lang[keep].tolist(), type=pa.string()),
                "doc_id": pa.array(doc[keep].astype(np.int64)),
            }
        )

    return kernel


def stratified_sample(sf_dir: str, k: int = 20):
    """(lang, doc_id): a deterministic k-document quota sample per
    language — the balanced evaluation-set / inspection-set draw. The
    sample is the k docs with the smallest (splitmix64(doc_id),
    doc_id) per lang, so it is uniform-at-random in hash order yet
    reproducible with no RNG state and STABLE under corpus growth
    limited to higher hashes.

    Scale shape: distributed bottom-k-per-key — the per-batch partial
    caps each batch's contribution at k rows per lang, the final is a
    tiny groupby(lang) over ≤ k·|batches| collapsed rows. No full
    shuffle, no sort of the corpus."""
    partial = _bottomk_by_hash_kernel(k)
    final = _bottomk_by_hash_kernel(k)

    return (
        read_documents(sf_dir, columns=["doc_id", "lang"])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("lang")
        .map_groups(final, batch_format="pyarrow")
    )


def mixture_rebalance(sf_dir: str, n_buckets: int = 1000):
    """(doc_id, lang): the largest deterministic subset of the corpus
    with a (near-)uniform language mixture — the training-mixture
    rebalancing pass. Pass 1 computes per-lang counts (a |langs|-row
    groupby); every language keeps rate = (min_count * n_buckets) //
    count_lang hash buckets, so each surviving slice has ~min_count
    docs. Pass 2 is one streaming filter: keep iff
    splitmix64(doc_id) % n_buckets < rate[lang].

    Scale shape: the shuffle is the |langs|-row count groupby; the
    keep decision is a pure row-local function of (doc_id, lang) and a
    broadcast dict of |langs| rates — growth-stable and
    coordination-free like hash_split."""
    from ray.data.aggregate import Count

    counts = (
        read_documents(sf_dir, columns=["lang"])
        .groupby("lang")
        .aggregate(Count(alias_name="cnt"))
        .take_all()
    )
    if not counts:
        return ray.data.from_arrow(
            pa.table({"doc_id": pa.array([], type=pa.int64()),
                      "lang": pa.array([], type=pa.string())})
        )
    mn = min(r["cnt"] for r in counts)
    rate = {r["lang"]: (mn * n_buckets) // r["cnt"] for r in counts}

    def kernel(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        d = batch.column("doc_id").to_numpy(zero_copy_only=False)
        lang = np.asarray(batch.column("lang").to_pylist(), dtype=object)
        b = (splitmix64(d.astype(np.int64).view(UINT64))
             % UINT64(n_buckets)).astype(np.int64)
        uniq, inv = np.unique(lang, return_inverse=True)
        lim = np.array([rate.get(v, 0) for v in uniq], dtype=np.int64)
        return batch.filter(pa.array(b < lim[inv]))

    return read_documents(sf_dir, columns=["doc_id", "lang"]).map_batches(
        kernel, batch_format="pyarrow", zero_copy_batch=True
    )


def weighted_sample(sf_dir: str, k: int = 50):
    """(doc_id, weight, priority): k-document weighted sample WITHOUT
    replacement — integer priority sampling (Duffield/Lund/Thorup
    priorities with quantized uniforms): each doc draws the uniform
    u = splitmix64(doc_id), gets priority = u // weight (exact integer
    division), and the k smallest (priority, doc_id) win, so selection
    odds grow ~proportionally to weight yet the draw is a pure
    function of doc_id — reproducible, RNG-free, and growth-stable
    like every sampler in this module. Weight = character length of
    the text (floored at 1), the "sample long documents more" draw.

    All-integer arithmetic makes the whole draw SQL-expressible
    (``weighted_sample_sql`` re-derives it in DuckDB HUGEINT), unlike
    the classic float u^(1/w) Efraimidis-Spirakis key, whose pow()
    ULP differences across libms could flip the cut. ``priority`` is
    emitted as the order-preserving int64 (u64 value minus 2^63) so
    Arrow/parquet sort order equals the uint64 order.

    Scale shape: bottom-k is a semigroup — the per-batch partial caps
    each batch at k rows, the final sort+limit touches <= k x |blocks|
    collapsed rows. No corpus sort, no shuffle of payloads."""
    import pyarrow.compute as pc

    _empty = pa.table(
        {"doc_id": pa.array([], type=pa.int64()),
         "weight": pa.array([], type=pa.int64()),
         "priority": pa.array([], type=pa.int64())}
    )

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _empty
        d = batch.column("doc_id").to_numpy(zero_copy_only=False)
        wl = pc.utf8_length(
            pc.fill_null(pc.cast(batch.column("text"), pa.string()), "")
        ).to_numpy(zero_copy_only=False).astype(np.int64)
        w = np.maximum(wl, 1)
        u = splitmix64(d.astype(np.int64).view(UINT64))
        pr = u // w.astype(UINT64)
        # order-preserving int64 view: flip the top bit (value - 2^63)
        pr_i = (pr ^ UINT64(1 << 63)).view(np.int64)
        order = np.lexsort((d, pr_i))[:k]
        return pa.table(
            {"doc_id": pa.array(d[order].astype(np.int64)),
             "weight": pa.array(w[order]),
             "priority": pa.array(pr_i[order])}
        )

    return (
        read_documents(sf_dir, columns=["doc_id", "text"])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .sort(["priority", "doc_id"])
        .limit(k)
    )


def weighted_sample_sql(table: str = "documents", k: int = 50) -> str:
    """DuckDB oracle for ``weighted_sample``: the identical integer
    draw — splitmix64 HUGEINT chain, priority = u // weight, order by
    (priority, doc_id), limit k."""
    from humid_ray.oracles import _sm64_cols

    two63, two64 = 1 << 63, 1 << 64
    u = (f"(CAST(doc_id AS HUGEINT) + CASE WHEN doc_id < 0 "
         f"THEN CAST('{two64}' AS HUGEINT) ELSE 0 END)")
    return (
        f"WITH w AS (SELECT doc_id, greatest(length(coalesce(text, '')), 1) "
        f"AS weight FROM {table}), "
        f"h AS (SELECT doc_id, weight, {_sm64_cols(u, 'u')} FROM w), "
        f"p AS (SELECT doc_id, CAST(weight AS BIGINT) AS weight, "
        f"CAST(u // weight - {two63} AS BIGINT) AS priority FROM h) "
        f"SELECT doc_id, weight, priority FROM p "
        f"ORDER BY priority, doc_id LIMIT {k}"
    )
