"""Similarity search over the ``embeddings`` table.

* brute-force cosine top-k: the exact baseline — query matrix is
  broadcast ONCE via ``ray.put``; every batch does one numpy matmul
  against it and emits its local top-k; a tiny driver-side merge
  produces the global top-k. No shuffle at all.
* LSH-bucketed ANN: random-hyperplane signatures bucket the corpus
  (groupby shuffle); queries probe their own bucket (+ optional
  1-bit-flip multiprobe) — the scale path when the corpus half of the
  matmul no longer fits the wall-clock.
* embedding near-dup: all pairs with cosine >= threshold via the same
  hyperplane-bucket candidate generation + in-bucket exact verify
  (the embedding analog of the HUMID LSH+verify neighbor stage).
"""

from __future__ import annotations

import heapq

import numpy as np
import pyarrow as pa

import ray
import ray.data
from ray.data.aggregate import Min


def read_embeddings(sf_dir: str, columns=None):
    return ray.data.read_parquet(f"{sf_dir}/embeddings.parquet", columns=columns)


def _to_matrix(batch: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    ids = batch.column("vec_id").to_numpy(zero_copy_only=False)
    emb = batch.column("embedding")
    flat = emb.combine_chunks() if isinstance(emb, pa.ChunkedArray) else emb
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    values = np.asarray(flat.flatten(), dtype=np.float64)
    dim = len(values) // max(len(ids), 1)
    return ids, values.reshape(len(ids), dim)


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    return m / np.maximum(n, 1e-12)


class _TopKPartial:
    """Per-batch: cosine vs the broadcast query matrix, local top-k."""

    def __init__(self, query_ref, k: int):
        self.q_ids, q = ray.get(query_ref)
        self.q = _normalize(q)
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            # probe-filtered candidate blocks are routinely empty; a
            # (0,0) matrix would break the matmul against (nq, d)
            return pa.table(
                {"query_id": pa.array([], type=pa.int64()),
                 "neighbor_id": pa.array([], type=pa.int64()),
                 "cosine": pa.array([], type=pa.float64())}
            )
        ids, m = _to_matrix(batch)
        sims = _normalize(m) @ self.q.T  # (n, nq)
        k = min(self.k, len(ids))
        out_q, out_n, out_s = [], [], []
        # per query: local top-k by (sim desc, vec_id asc) for determinism
        for qi in range(sims.shape[1]):
            s = sims[:, qi]
            idx = np.lexsort((ids, -s))[:k]
            out_q.append(np.full(len(idx), self.q_ids[qi], dtype=np.int64))
            out_n.append(ids[idx])
            out_s.append(s[idx])
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q)),
                "neighbor_id": pa.array(np.concatenate(out_n)),
                "cosine": pa.array(np.concatenate(out_s)),
            }
        )


def _empty_topk() -> pa.Table:
    return pa.table({"query_id": pa.array([], type=pa.int64()),
                     "neighbor_id": pa.array([], type=pa.int64()),
                     "rank": pa.array([], type=pa.int64()),
                     "cosine": pa.array([], type=pa.float64())})


def _merge_topk(partial_ds, q_ids: np.ndarray, k: int) -> pa.Table:
    """Global top-k from per-block partial top-k rows. The driver only
    ever sees n_blocks * n_queries * k rows — tiny at any corpus size."""
    best: dict[int, list] = {int(i): [] for i in q_ids}
    for b in partial_ds.iter_batches(batch_size=65536, batch_format="pyarrow"):
        for qid, nid, s in zip(
            b.column("query_id").to_numpy(zero_copy_only=False),
            b.column("neighbor_id").to_numpy(zero_copy_only=False),
            b.column("cosine").to_numpy(zero_copy_only=False),
        ):
            heapq.heappush(best[int(qid)], (float(s), -int(nid)))
            if len(best[int(qid)]) > k:
                heapq.heappop(best[int(qid)])
    rows = []
    for qid in sorted(best):
        ranked = sorted(best[qid], key=lambda t: (-t[0], -t[1]))
        for rank, (s, negn) in enumerate(ranked, 1):
            rows.append(
                {
                    "query_id": qid,
                    "neighbor_id": -negn,
                    "rank": rank,
                    "cosine": round(s, 6),
                }
            )
    if not rows:
        return _empty_topk()
    return pa.Table.from_pylist(rows)


def _first_rows_by_id(ds, n: int) -> list[dict]:
    """First ``n`` rows by ascending vec_id WITHOUT a corpus-wide sort:
    each batch keeps its ``n`` smallest ids (bottom-k semigroup) and the
    driver merges the <= n-per-block partials. The query-row selector
    shared by every ANN variant."""

    def head_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        vid = t.column("vec_id").to_numpy(zero_copy_only=False)
        keep = np.argsort(vid, kind="stable")[:n]
        return t.take(pa.array(keep))

    rows: list[dict] = []
    for b in ds.map_batches(head_partial, batch_format="pyarrow",
                            zero_copy_batch=True).iter_batches(
            batch_size=65536, batch_format="pyarrow"):
        vid = b.column("vec_id").to_numpy(zero_copy_only=False)
        emb = b.column("embedding")
        rows.extend({"vec_id": int(vid[i]),
                     "embedding": emb[i].as_py()} for i in range(len(vid)))
    rows.sort(key=lambda r: r["vec_id"])
    return rows[:n]


def knn_bruteforce(sf_dir: str, k: int = 5, n_queries: int = 8):
    """Exact top-k cosine neighbors of the first ``n_queries`` vectors
    (by vec_id). Deterministic tie-break: (cosine desc, vec_id asc).
    Returns (query_id, neighbor_id, rank, cosine rounded to 6)."""
    ds = read_embeddings(sf_dir, columns=["vec_id", "embedding"])
    qt = _first_rows_by_id(ds, n_queries)
    if not qt:
        return _empty_topk()
    q_ids = np.array([r["vec_id"] for r in qt], dtype=np.int64)
    q = np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in qt])
    query_ref = ray.put((q_ids, q))
    partial = ds.map_batches(
        _TopKPartial,
        fn_constructor_kwargs={"query_ref": query_ref, "k": k},
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=(1, 4),
    )
    return _merge_topk(partial, q_ids, k)


# --- LSH-bucketed ANN (scale path) ---------------------------------------

def _hyperplanes(dim: int, n_bits: int, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_bits, dim))


def _bucket_of(m: np.ndarray, planes: np.ndarray) -> np.ndarray:
    bits = (m @ planes.T) > 0
    out = np.zeros(len(m), dtype=np.int64)
    for j in range(planes.shape[0]):
        out |= bits[:, j].astype(np.int64) << j
    return out


class _BucketTag:
    def __init__(self, planes_ref, multiprobe: int = 1):
        self.planes = ray.get(planes_ref)
        self.multiprobe = multiprobe

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {"vec_id": pa.array([], type=pa.int64()),
                 "bucket": pa.array([], type=pa.int64()),
                 "embedding": batch.column("embedding")}
            )
        ids, m = _to_matrix(batch)
        bucket = _bucket_of(_normalize(m), self.planes)
        return pa.table(
            {
                "vec_id": pa.array(ids),
                "bucket": pa.array(bucket),
                "embedding": batch.column("embedding"),
            }
        )


def ann_lsh(sf_dir: str, k: int = 5, n_queries: int = 8, n_bits: int = 8):
    """Approximate top-k: probe only the query's hyperplane bucket
    (+ all 1-bit-flip buckets). Returns the same schema as
    knn_bruteforce; recall is approximate by design."""
    ds = read_embeddings(sf_dir, columns=["vec_id", "embedding"])
    first = _first_rows_by_id(ds, n_queries)
    if not first:
        return _empty_topk()
    q_ids = np.array([r["vec_id"] for r in first], dtype=np.int64)
    q = _normalize(np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in first]))
    dim = q.shape[1]
    planes = _hyperplanes(dim, n_bits)
    planes_ref = ray.put(planes)
    tagged = ds.map_batches(
        _BucketTag, fn_constructor_kwargs={"planes_ref": planes_ref},
        batch_format="pyarrow", zero_copy_batch=True, concurrency=(1, 4),
    )
    qb = _bucket_of(q, planes)
    probe: set[int] = set()
    for b in qb.tolist():
        probe.add(b)
        for j in range(n_bits):
            probe.add(b ^ (1 << j))
    import pyarrow.compute as pc

    probe_arr = pa.array(sorted(probe), type=pa.int64())
    # candidates stay DISTRIBUTED: filter to probe buckets, then the
    # same per-block partial-top-k + tiny driver merge as bruteforce
    # (no take_all of candidate rows — probe buckets can be large)
    cand = tagged.map_batches(
        lambda t: t.filter(pc.is_in(t.column("bucket"), value_set=probe_arr))
        .select(["vec_id", "embedding"]),
        batch_format="pyarrow",
    )
    query_ref = ray.put((q_ids, q))
    partial = cand.map_batches(
        _TopKPartial,
        fn_constructor_kwargs={"query_ref": query_ref, "k": k},
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=(1, 4),
    )
    return _merge_topk(partial, q_ids, k)


# --- IVF (coarse-quantizer) ANN -------------------------------------------

def _hash_sample(ds, sample: int, seed: int = 2026) -> tuple[np.ndarray, np.ndarray]:
    """Seeded bottom-``sample``-by-hash row sample drawn uniformly
    across ALL blocks (``ds.limit(sample)`` reads only the first
    blocks — a biased training set when the table is sorted or
    clustered). Each batch keeps only its local bottom-``sample`` rows
    by ``splitmix64(vec_id + seed)``, so the driver pull is bounded by
    sample x n_blocks of (id, embedding) rows, and the global
    bottom-``sample`` merge is deterministic regardless of block
    layout. Returns (ids, matrix)."""
    from humid_ray.util import UINT64, splitmix64

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            # Column order must match the non-empty branch (vec_id,
            # embedding, _h) or concat_tables raises on mixed blocks.
            return pa.table(
                {"vec_id": pa.array([], type=pa.int64()),
                 "embedding": t.column("embedding"),
                 "_h": pa.array([], type=pa.int64())}
            )
        ids = t.column("vec_id").to_numpy(zero_copy_only=False)
        h = splitmix64(ids.astype(np.int64).view(UINT64) + UINT64(seed))
        k = min(sample, t.num_rows)
        sel = np.argpartition(h, k - 1)[:k] if k < t.num_rows else np.arange(t.num_rows)
        out = t.select(["vec_id", "embedding"]).take(pa.array(sel))
        return out.append_column("_h", pa.array(h[sel].view(np.int64)))

    chunks = list(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .iter_batches(batch_size=65536, batch_format="pyarrow")
    )
    if not chunks:
        return np.empty(0, dtype=np.int64), np.empty((0, 0))
    t = pa.concat_tables(chunks)
    if t.num_rows == 0:
        return np.empty(0, dtype=np.int64), np.empty((0, 0))
    hh = t.column("_h").to_numpy(zero_copy_only=False).view(UINT64)
    order = np.argsort(hh, kind="stable")[:sample]
    ids, m = _to_matrix(t.select(["vec_id", "embedding"]).take(pa.array(order)))
    return ids, m


def _spherical_kmeans(x: np.ndarray, k: int, iters: int = 15) -> np.ndarray:
    """Deterministic spherical k-means (Lloyd) on normalized vectors;
    init = first k points. Tiny driver-side model fit (sample ≪ corpus)."""
    x = _normalize(x)
    k = min(k, len(x))
    c = x[:k].copy()
    for _ in range(iters):
        assign = np.argmax(x @ c.T, axis=1)
        for j in range(k):
            m = assign == j
            if m.any():
                c[j] = x[m].mean(axis=0)
        c = _normalize(c)
    return c


def ann_ivf(sf_dir: str, k: int = 5, n_queries: int = 8, n_centroids: int = 64,
            nprobe: int = 8, sample: int = 4096, ds=None):
    """IVF ANN: spherical-k-means coarse quantizer trained on a bounded
    sample (driver-side numpy — the small model side), inverted-list
    assignment in ``map_batches`` against the broadcast centroids,
    queries probe their ``nprobe`` nearest lists, then the same
    per-block partial-top-k + tiny driver merge as ``knn_bruteforce``.
    With ``nprobe == n_centroids`` the result equals brute force
    exactly (pinned in tests); smaller nprobe trades recall for a
    1/(n_centroids/nprobe) scan fraction — the scale path."""
    if ds is None:
        ds = read_embeddings(sf_dir, columns=["vec_id", "embedding"])
    first = _first_rows_by_id(ds, max(n_queries, 1))
    if not first:
        # empty embeddings table: np.stack on an empty list raises
        return _empty_topk()
    q_ids = np.array([r["vec_id"] for r in first], dtype=np.int64)
    q = _normalize(np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in first]))

    # seeded hash sample across all blocks (not limit()'s first blocks)
    _, x = _hash_sample(ds, sample)
    centroids = _spherical_kmeans(x, n_centroids)
    cent_ref = ray.put(centroids)

    class IvfTag:
        def __init__(self):
            self.c = ray.get(cent_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                return pa.table(
                    {"vec_id": pa.array([], type=pa.int64()),
                     "ivf_list": pa.array([], type=pa.int64()),
                     "embedding": batch.column("embedding")}
                )
            ids, m = _to_matrix(batch)
            lst = np.argmax(_normalize(m) @ self.c.T, axis=1)
            return pa.table(
                {
                    "vec_id": pa.array(ids),
                    "ivf_list": pa.array(lst.astype(np.int64)),
                    "embedding": batch.column("embedding"),
                }
            )

    tagged = ds.map_batches(IvfTag, batch_format="pyarrow",
                            zero_copy_batch=True, concurrency=(1, 4))
    probe = np.argsort(-(q @ centroids.T), axis=1)[:, : min(nprobe, len(centroids))]
    import pyarrow.compute as pc

    probe_arr = pa.array(sorted(set(probe.reshape(-1).tolist())), type=pa.int64())
    cand = tagged.map_batches(
        lambda t: t.filter(pc.is_in(t.column("ivf_list"), value_set=probe_arr))
        .select(["vec_id", "embedding"]),
        batch_format="pyarrow",
    )
    query_ref = ray.put((q_ids, q))
    partial = cand.map_batches(
        _TopKPartial,
        fn_constructor_kwargs={"query_ref": query_ref, "k": k},
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=(1, 4),
    )
    return _merge_topk(partial, q_ids, k)


# --- embedding near-duplicate pairs --------------------------------------

def _pairs_in_bucket(threshold: float):
    def kernel(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {"vec_a": pa.array([], type=pa.int64()),
             "vec_b": pa.array([], type=pa.int64()),
             "cosine": pa.array([], type=pa.float64())}
        )
        if group.num_rows < 2:
            return empty
        ids, m = _to_matrix(group.select(["vec_id", "embedding"]))
        uniq, first = np.unique(ids, return_index=True)
        ids, m = ids[first], m[first]
        if len(ids) < 2:
            return empty
        m = _normalize(m)
        sims = m @ m.T
        ii, jj = np.nonzero(sims >= threshold)
        lt = ids[ii] < ids[jj]
        return pa.table(
            {
                "vec_a": pa.array(ids[ii[lt]].astype(np.int64)),
                "vec_b": pa.array(ids[jj[lt]].astype(np.int64)),
                "cosine": pa.array(np.round(sims[ii[lt], jj[lt]], 6)),
            }
        )

    return kernel


def embedding_neardup_exact(sf_dir: str, threshold: float = 0.4, ds=None):
    """ALL embedding pairs (vec_a < vec_b) with cosine >= threshold —
    the exact brute-force baseline behind ``embedding_neardup`` (the
    hyperplane-LSH variant is the scale path). The normalized matrix
    broadcasts once (the model-sized side at baseline scale — the same
    ceiling as knn_bruteforce's query broadcast, documented); the
    corpus streams through one blocked matmul kernel, each unordered
    pair produced exactly once (batch row u pairs with global v > u).
    Filter on the UNROUNDED cosine, round only the output (oracle
    WHERE-then-round order)."""
    if ds is None:
        ds = read_embeddings(sf_dir, columns=["vec_id", "embedding"])
    ids_l, m_l = [], []
    for b in ds.iter_batches(batch_size=65536, batch_format="pyarrow"):
        if b.num_rows == 0:
            continue
        ids_b, m_b = _to_matrix(b)
        ids_l.append(ids_b)
        m_l.append(m_b)
    empty = pa.table(
        {"vec_a": pa.array([], type=pa.int64()),
         "vec_b": pa.array([], type=pa.int64()),
         "cosine": pa.array([], type=pa.float64())}
    )
    if not ids_l:
        return empty
    all_ids = np.concatenate(ids_l).astype(np.int64)
    mat = _normalize(np.concatenate(m_l))
    mat_ref = ray.put((all_ids, mat))

    class PairScan:
        def __init__(self):
            self.ids, self.m = ray.get(mat_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                return empty
            ids_b, m_b = _to_matrix(batch)
            sims = _normalize(m_b) @ self.m.T
            ii, jj = np.nonzero(
                (sims >= threshold) & (ids_b[:, None] < self.ids[None, :])
            )
            from humid_ray.util import round_half_away

            return pa.table(
                {
                    "vec_a": pa.array(ids_b[ii].astype(np.int64)),
                    "vec_b": pa.array(self.ids[jj].astype(np.int64)),
                    "cosine": pa.array(round_half_away(sims[ii, jj], 6)),
                }
            )

    return ds.map_batches(
        PairScan, batch_format="pyarrow", zero_copy_batch=True,
        concurrency=(1, 8),
    )


def embedding_neardup(sf_dir: str, threshold: float = 0.95, n_bits: int = 6,
                      n_tables: int = 4, ds=None):
    """Near-duplicate embedding pairs (cosine >= threshold) via multiple
    hyperplane-LSH tables + in-bucket exact verify; distinct pairs.

    Note: the sandbox testdata embeddings contain NO near-duplicates
    (max pairwise cosine 0.51 at sf0.01), so an empty result there is
    the correct answer; recall is validated on planted duplicates in
    tests/test_ann.py. Pass ``ds`` to run over any (vec_id, embedding)
    Dataset."""
    if ds is None:
        ds = read_embeddings(sf_dir, columns=["vec_id", "embedding"])

    class MultiTag:
        def __init__(self, planes_ref):
            self.planes = ray.get(planes_ref)  # list of (n_bits, dim)

        def __call__(self, batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                return pa.table(
                    {"bucket": pa.array([], type=pa.int64()),
                     "vec_id": pa.array([], type=pa.int64()),
                     "embedding": batch.column("embedding")}
                )
            ids, m = _to_matrix(batch)
            mn = _normalize(m)
            tabs = []
            for ti, pl in enumerate(self.planes):
                bucket = _bucket_of(mn, pl) | (ti << 60)
                tabs.append(
                    pa.table(
                        {
                            "bucket": pa.array(bucket),
                            "vec_id": pa.array(ids),
                            "embedding": batch.column("embedding"),
                        }
                    )
                )
            return pa.concat_tables(tabs)

    # probe dim lazily from the first row
    one = ds.limit(1).take(1)
    if not one:
        return pa.table(
            {"vec_a": pa.array([], type=pa.int64()),
             "vec_b": pa.array([], type=pa.int64()),
             "cosine": pa.array([], type=pa.float64())}
        )
    dim = len(one[0]["embedding"])
    planes = [_hyperplanes(dim, n_bits, seed=42 + t) for t in range(n_tables)]
    planes_ref = ray.put(planes)
    tagged = ds.map_batches(
        MultiTag, fn_constructor_kwargs={"planes_ref": planes_ref},
        batch_format="pyarrow", zero_copy_batch=True, concurrency=(1, 4),
    )
    pairs = tagged.groupby("bucket").map_groups(
        _pairs_in_bucket(threshold), batch_format="pyarrow"
    )
    out = pairs.groupby(["vec_a", "vec_b"]).aggregate(Min("cosine", alias_name="cosine"))
    if out.count() == 0:
        # empty Ray Data aggregates drop the schema; give the driver a
        # typed empty table instead
        return pa.table(
            {"vec_a": pa.array([], type=pa.int64()),
             "vec_b": pa.array([], type=pa.int64()),
             "cosine": pa.array([], type=pa.float64())}
        )
    return out


# --- SemDeDup-style semantic dedup ----------------------------------------

def _semdedup_group_kernel(threshold: float, keep: str):
    """Per-cluster kernel: pairwise-cosine dup groups -> keep flags.

    ``keep="centroid_far"`` keeps the member LEAST similar to the
    cluster centroid (SemDeDup's rule: retain the outlier, drop the
    prototypical copies); ``keep="min_id"`` keeps the smallest vec_id
    (deterministic, SQL-expressible). Ties break on vec_id. The
    pairwise matmul is row-blocked so peak memory is block x |group|,
    never |group|^2 floats at once."""
    empty = pa.table(
        {"vec_id": pa.array([], type=pa.int64()),
         "cluster": pa.array([], type=pa.int64()),
         "keep": pa.array([], type=pa.bool_())}
    )

    def kernel(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return empty
        ids, m = _to_matrix(group.select(["vec_id", "embedding"]))
        cent_sim = group.column("cent_sim").to_numpy(zero_copy_only=False)
        cluster = int(group.column("cluster")[0].as_py())
        uniq, first = np.unique(ids, return_index=True)
        ids, m, cent_sim = ids[first], m[first], cent_sim[first]
        g = len(ids)
        mn = _normalize(m)
        # dup edges (positional, i < j), row-blocked matmul
        from humid_ray.stages.components import _UnionFind

        uf = _UnionFind()
        block = 2048
        for lo in range(0, g, block):
            hi = min(lo + block, g)
            sims = mn[lo:hi] @ mn.T
            ii, jj = np.nonzero(sims >= threshold)
            gi = ii + lo
            sel = gi < jj  # strict upper triangle only
            for a, b in zip(gi[sel].tolist(), jj[sel].tolist()):
                uf.union(a, b)
        roots = np.arange(g, dtype=np.int64)
        for x in uf.parent:
            roots[x] = uf.find(x)
        if keep == "centroid_far":
            order = np.lexsort((ids, cent_sim))
        else:  # "min_id"
            order = np.argsort(ids, kind="stable")
        # first row per component in `order` wins
        winners = np.zeros(g, dtype=bool)
        seen_first = {}
        for pos in order.tolist():
            r = int(roots[pos])
            if r not in seen_first:
                seen_first[r] = pos
        winners[list(seen_first.values())] = True
        return pa.table(
            {"vec_id": pa.array(ids.astype(np.int64)),
             "cluster": pa.array(np.full(g, cluster, dtype=np.int64)),
             "keep": pa.array(winners)}
        )

    return kernel


def semantic_dedup(sf_dir: str, threshold: float = 0.95, n_clusters: int = 64,
                   sample: int = 4096, keep: str = "centroid_far", ds=None):
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540) over the
    embeddings table: spherical k-means partitions the space (seeded
    hash-sampled training set, tiny driver-side fit — same model path
    as ``ann_ivf``), every embedding is tagged with its nearest
    centroid in ``map_batches`` against the broadcast centroids, and a
    ``groupby(cluster).map_groups`` stage finds within-cluster
    cosine->=threshold dup groups and keeps exactly one member per
    group. Returns (vec_id, cluster, keep) — one row per embedding.

    Scale shape: the only all-pairs work is per cluster; n_clusters
    grows with the corpus (SemDeDup runs 50k clusters at LAION scale)
    so |cluster| ~ n/k stays task-sized, and the shuffle carries
    (id, cluster, cent_sim, embedding) rows once. With
    ``n_clusters=1, keep="min_id"`` the result is SQL-expressible
    (cosine cross join + recursive closure; see ``oracle_sql()``) —
    the correctness anchor for the clustered scale path, mirroring how
    ``ann_ivf`` is oracled via its full-probe degenerate config."""
    if ds is None:
        ds = read_embeddings(sf_dir, columns=["vec_id", "embedding"])
    empty = pa.table(
        {"vec_id": pa.array([], type=pa.int64()),
         "cluster": pa.array([], type=pa.int64()),
         "keep": pa.array([], type=pa.bool_())}
    )
    _, x = _hash_sample(ds, sample)
    if len(x) == 0:
        return empty
    centroids = _spherical_kmeans(x, n_clusters)
    cent_ref = ray.put(centroids)

    class CentroidTag:
        def __init__(self):
            self.c = ray.get(cent_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                return pa.table(
                    {"vec_id": pa.array([], type=pa.int64()),
                     "cluster": pa.array([], type=pa.int64()),
                     "cent_sim": pa.array([], type=pa.float64()),
                     "embedding": batch.column("embedding")}
                )
            ids, m = _to_matrix(batch)
            sims = _normalize(m) @ self.c.T
            cl = np.argmax(sims, axis=1)
            return pa.table(
                {
                    "vec_id": pa.array(ids.astype(np.int64)),
                    "cluster": pa.array(cl.astype(np.int64)),
                    "cent_sim": pa.array(sims[np.arange(len(cl)), cl]),
                    "embedding": batch.column("embedding"),
                }
            )

    tagged = ds.map_batches(CentroidTag, batch_format="pyarrow",
                            zero_copy_batch=True, concurrency=(1, 4))
    out = tagged.groupby("cluster").map_groups(
        _semdedup_group_kernel(threshold, keep), batch_format="pyarrow"
    )
    return out


def semantic_dedup_exact(sf_dir: str, threshold: float = 0.4, ds=None):
    """Degenerate single-cluster SemDeDup with the deterministic
    keep-min-id rule — the DuckDB-oracled correctness anchor for
    ``semantic_dedup`` (cross-join cosine edges + recursive closure +
    min-id-per-component keep)."""
    return semantic_dedup(sf_dir, threshold=threshold, n_clusters=1,
                          keep="min_id", ds=ds)


# --- IVF-PQ: product-quantized inverted lists (the memory-scale path) ------

def _farthest_first(x: np.ndarray, k: int) -> np.ndarray:
    """Deterministic farthest-first-traversal k-means init (start at
    point 0, repeatedly add the point farthest from its nearest chosen
    center; ties -> lowest index). When the data has <= k distinct
    values this provably selects ALL of them (every uncovered value
    keeps a positive distance), which makes exact-codebook recovery —
    and the PQ == brute-force degenerate test — deterministic."""
    n = len(x)
    k = min(k, n)
    centers = np.zeros(k, dtype=np.int64)
    d2 = np.full(n, np.inf)
    for i in range(k):
        if i:
            centers[i] = int(np.argmax(d2))
        nd = ((x - x[centers[i]]) ** 2).sum(axis=1)
        d2 = np.minimum(d2, nd)
    return x[centers].copy()


def _kmeans_l2(x: np.ndarray, k: int, iters: int = 15) -> np.ndarray:
    """Plain Euclidean Lloyd with farthest-first init; an emptied
    cluster keeps its previous center. Tiny driver-side fit."""
    c = _farthest_first(x, k)
    for _ in range(iters):
        d = ((x[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
        assign = np.argmin(d, axis=1)
        for j in range(len(c)):
            m = assign == j
            if m.any():
                c[j] = x[m].mean(axis=0)
    return c


def ann_ivfpq(sf_dir: str, k: int = 5, n_queries: int = 8,
              n_centroids: int = 64, nprobe: int = 8, m_sub: int = 8,
              ksub: int = 32, sample: int = 4096, refine: int = 4,
              ds=None):
    """IVF-PQ ANN with exact re-ranking — the memory-scale tier of the
    ANN family (brute force -> LSH -> IVF -> IVF-PQ). Vectors are
    normalized once and stored as ``m_sub`` uint8 codes (8 bytes here
    vs 256 for float32x64: the compression that makes 10^12-vector
    indexes fit a cluster); cosine decomposes EXACTLY across PQ
    subspaces (sum of per-subspace inner products), so query-time
    scoring is a pure table lookup: per query, an (m_sub x ksub) LUT
    of subquery x codeword dot products is broadcast and each
    candidate costs m_sub gathers + adds, no FLOPs against the
    original vectors. The approximate top-(refine*k) per query is then
    re-ranked EXACTLY against the true embeddings of only those
    candidates (pc.is_in-pruned scan — the top_parts join-back
    pattern).

    Scale shape: codebooks train driver-side on the seeded cross-block
    hash sample; the encode stage is an actor pool writing the
    code table (checkpointed once at scale, re-queried forever);
    candidate scan = LUT gathers over probed lists only; the refine
    scan touches <= n_queries*refine*k full vectors."""
    import pyarrow.compute as pc

    if ds is None:
        ds = read_embeddings(sf_dir, columns=["vec_id", "embedding"])
    first = _first_rows_by_id(ds, max(n_queries, 1))
    if not first:
        return _empty_topk()
    q_ids = np.array([r["vec_id"] for r in first], dtype=np.int64)
    q = _normalize(np.stack(
        [np.asarray(r["embedding"], dtype=np.float64) for r in first]
    ))
    dim = q.shape[1]
    # adapt the subspace count down to a divisor of dim (1 always
    # works) so low-dimensional tables run instead of erroring
    while dim % m_sub:
        m_sub -= 1
    dsub = dim // m_sub

    _, xs = _hash_sample(ds, sample)
    if not len(xs):
        return _empty_topk()
    xn = _normalize(xs)
    coarse = _spherical_kmeans(xn, n_centroids)
    books = np.stack([
        _kmeans_l2(np.ascontiguousarray(xn[:, j * dsub:(j + 1) * dsub]),
                   ksub)
        for j in range(m_sub)
    ])  # (m_sub, ksub, dsub)
    model_ref = ray.put((coarse, books))

    class PqEncode:
        def __init__(self):
            self.coarse, self.books = ray.get(model_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                return pa.table(
                    {"vec_id": pa.array([], type=pa.int64()),
                     "ivf_list": pa.array([], type=pa.int64()),
                     "code": pa.FixedSizeListArray.from_arrays(
                         pa.array([], type=pa.uint8()), m_sub)}
                )
            ids, m = _to_matrix(batch)
            mn = _normalize(m)
            lst = np.argmax(mn @ self.coarse.T, axis=1).astype(np.int64)
            codes = np.empty((len(ids), m_sub), dtype=np.uint8)
            for j in range(m_sub):
                sub = mn[:, j * dsub:(j + 1) * dsub]
                cb = self.books[j]
                # argmin ||sub - c||^2 == argmax (sub.c - ||c||^2/2)
                codes[:, j] = np.argmax(
                    sub @ cb.T - 0.5 * (cb * cb).sum(axis=1)[None, :],
                    axis=1,
                ).astype(np.uint8)
            return pa.table(
                {"vec_id": pa.array(ids),
                 "ivf_list": pa.array(lst),
                 "code": pa.FixedSizeListArray.from_arrays(
                     pa.array(codes.reshape(-1)), m_sub)}
            )

    codes_ds = ds.map_batches(PqEncode, batch_format="pyarrow",
                              zero_copy_batch=True, concurrency=(1, 4))
    probe = np.argsort(-(q @ coarse.T), axis=1)[:, : min(nprobe, len(coarse))]
    probe_arr = pa.array(sorted(set(probe.reshape(-1).tolist())),
                         type=pa.int64())
    cand = codes_ds.map_batches(
        lambda t: t.filter(pc.is_in(t.column("ivf_list"),
                                    value_set=probe_arr))
        .select(["vec_id", "code"]),
        batch_format="pyarrow",
    )
    # per-query ADC lookup tables: LUT[qi, j, c] = q_sub . codeword
    lut = np.einsum("qjd,jcd->qjc", q.reshape(len(q), m_sub, dsub), books)
    lut_ref = ray.put((q_ids, lut))
    kprime = max(k, refine * k)

    class AdcTopK:
        def __init__(self):
            self.q_ids, self.lut = ray.get(lut_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            empty = pa.table(
                {"query_id": pa.array([], type=pa.int64()),
                 "neighbor_id": pa.array([], type=pa.int64()),
                 "cosine": pa.array([], type=pa.float64())}
            )
            if batch.num_rows == 0:
                return empty
            ids = batch.column("vec_id").to_numpy(zero_copy_only=False)
            code_col = batch.column("code")
            if isinstance(code_col, pa.ChunkedArray):
                code_col = code_col.combine_chunks()
            codes = np.asarray(code_col.flatten()).reshape(len(ids), m_sub)
            cols = np.arange(m_sub)[None, :]
            out_q, out_n, out_s = [], [], []
            kk = min(kprime, len(ids))
            for qi in range(len(self.q_ids)):
                s = self.lut[qi][cols, codes].sum(axis=1)
                idx = np.lexsort((ids, -s))[:kk]
                out_q.append(np.full(len(idx), self.q_ids[qi],
                                     dtype=np.int64))
                out_n.append(ids[idx].astype(np.int64))
                out_s.append(s[idx].astype(np.float64))
            return pa.table(
                {"query_id": pa.array(np.concatenate(out_q)),
                 "neighbor_id": pa.array(np.concatenate(out_n)),
                 "cosine": pa.array(np.concatenate(out_s))}
            )

    partial = cand.map_batches(AdcTopK, batch_format="pyarrow",
                               zero_copy_batch=True, concurrency=(1, 4))
    approx = _merge_topk(partial, q_ids, kprime)
    cand_ids = sorted({int(v) for v in approx.column("neighbor_id").to_pylist()})
    if not cand_ids:
        return _empty_topk()
    # exact re-rank: fetch ONLY the shortlisted vectors
    cand_set = pa.array(cand_ids, type=pa.int64())
    chunks = list(
        ds.map_batches(
            lambda t: t.filter(pc.is_in(t.column("vec_id"),
                                        value_set=cand_set)),
            batch_format="pyarrow",
        ).iter_batches(batch_size=65536, batch_format="pyarrow")
    )
    t = pa.concat_tables(chunks)
    cids, cm = _to_matrix(t)
    cmn = _normalize(cm)
    shortlist: dict[int, set] = {}
    for row in approx.to_pylist():
        shortlist.setdefault(int(row["query_id"]), set()).add(
            int(row["neighbor_id"])
        )
    pos = {int(v): i for i, v in enumerate(cids)}
    rows = []
    for qi, qid in enumerate(q_ids):
        members = sorted(shortlist.get(int(qid), ()))
        if not members:
            continue
        idx = np.array([pos[m] for m in members], dtype=np.int64)
        s = cmn[idx] @ q[qi]
        order = np.lexsort((np.array(members), -s))[:k]
        for rank, oi in enumerate(order, 1):
            rows.append({"query_id": int(qid),
                         "neighbor_id": int(members[oi]),
                         "rank": rank,
                         "cosine": round(float(s[oi]), 6)})
    return pa.Table.from_pylist(rows) if rows else _empty_topk()


# --- embedding-space eval-suite decontamination ----------------------------

def decontaminate_embeddings(sf_dir: str, threshold: float = 0.95,
                             eval_mod: int = 20,
                             broadcast_max_eval: int = 1_000_000):
    """(vec_id, nearest_eval_id, max_cosine, contaminated): embedding-
    space eval-suite decontamination — the embedding twin of
    decontaminate_docs / decontaminate_images. For every TRAIN vector
    (vec_id % eval_mod != 0) against the deterministic EVAL suite
    (vec_id % eval_mod == 0): the max cosine over all eval vectors,
    the eval id attaining it (tie -> min eval id), and a contaminated
    flag (UNROUNDED max >= threshold; max_cosine rounded to 6 for
    output only — the engine-wide filter-before-round convention).
    Returns empty when the corpus has no eval rows (no suite, no
    report).

    Scale shape: the eval side is small BY DEFINITION (benchmark
    suites are thousands of rows, not corpora) — streamed off the
    corpus in bounded chunks of ``broadcast_max_eval`` rows, each
    L2-normalized (row-wise, chunk-independent), id-sorted WITHIN the
    chunk, and ``ray.put`` as it fills: the driver never holds more
    than one chunk of the eval matrix at a time, so driver RAM is
    O(broadcast_max_eval), not O(suite). The train side streams
    through ONE vectorized matmul kernel per batch. No join, no
    train-side exchange, no top-k state: the reduction is a per-row
    (max, min-eval-id) fold across chunks — within a chunk np.argmax
    takes the FIRST maximum of the id-sorted rows, and across chunks
    an exact float tie updates only to a SMALLER eval id, so the
    tie -> min-eval-id contract (the oracle's ORDER BY cos DESC,
    eval_id) holds for ANY chunk order. Identical output to the
    one-chunk path is pinned by the forced-chunk equality test on
    this host; a BLAS build whose reduction order varies with matrix
    shape could differ in the last ULP across chunk boundaries (the
    declared output contract is rounded-to-6)."""
    ds = read_embeddings(sf_dir, columns=["vec_id", "embedding"])

    _empty = pa.table({
        "vec_id": pa.array([], type=pa.int64()),
        "nearest_eval_id": pa.array([], type=pa.int64()),
        "max_cosine": pa.array([], type=pa.float64()),
        "contaminated": pa.array([], type=pa.bool_()),
    })

    def eval_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        vid = t.column("vec_id").to_numpy(zero_copy_only=False)
        keep = np.flatnonzero(vid % eval_mod == 0)
        return t.take(pa.array(keep, type=pa.int64()))

    # Streaming chunk builder (the broadcast_max_labels convention,
    # driver-bounded): accumulate eval batches up to
    # ``broadcast_max_eval`` rows, then id-sort WITHIN the chunk,
    # normalize, ``ray.put``, and release — the driver never holds the
    # whole eval matrix, only the chunk being built. For suites within
    # one chunk (every test/bench config) this is bit-identical to the
    # old global-sort path: one chunk == globally id-sorted matrix.
    eval_refs = []
    pend_ids: list[np.ndarray] = []
    pend_mats: list[np.ndarray] = []
    pend_rows = 0

    def flush(final: bool) -> None:
        nonlocal pend_ids, pend_mats, pend_rows
        if not pend_rows:
            return
        ids = np.concatenate(pend_ids)
        m = np.concatenate(pend_mats, axis=0)
        order = np.argsort(ids, kind="stable")
        ids, m = ids[order], m[order]
        full = (len(ids) // broadcast_max_eval) * broadcast_max_eval
        stop = len(ids) if final else full
        # normalize per emitted chunk (row-wise, so chunking-invariant);
        # the carried remainder stays RAW — normalizing it here and
        # again on the next flush would drift by an ULP
        for i in range(0, stop, broadcast_max_eval):
            eval_refs.append(
                ray.put((ids[i:i + broadcast_max_eval],
                         _normalize(m[i:i + broadcast_max_eval]))))
        pend_ids = [ids[stop:]] if stop < len(ids) else []
        pend_mats = [m[stop:]] if stop < len(ids) else []
        pend_rows = len(ids) - stop

    for b in ds.map_batches(eval_partial, batch_format="pyarrow",
                            zero_copy_batch=True).iter_batches(
            batch_size=65536, batch_format="pyarrow"):
        if b.num_rows == 0:
            continue
        ids, m = _to_matrix(b)
        pend_ids.append(ids.astype(np.int64))
        pend_mats.append(m)
        pend_rows += len(ids)
        if pend_rows >= broadcast_max_eval:
            flush(final=False)
    flush(final=True)
    if not eval_refs:
        return ray.data.from_arrow(_empty)

    class _Contam:
        def __init__(self, eval_refs, threshold: float, eval_mod: int):
            self.eval_refs = eval_refs
            self.threshold = threshold
            self.eval_mod = eval_mod

        def __call__(self, batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                return _empty
            ids, m = _to_matrix(batch)
            train = ids % self.eval_mod != 0
            if not train.any():
                return _empty
            ids = ids[train].astype(np.int64)
            tm = _normalize(m[train])
            best = np.full(len(ids), -np.inf)
            best_id = np.zeros(len(ids), dtype=np.int64)
            for ref in self.eval_refs:
                ceids, cemat = ray.get(ref)
                sims = tm @ cemat.T
                arg = np.argmax(sims, axis=1)  # first max == min id in chunk
                mx = sims[np.arange(len(ids)), arg]
                cid = ceids[arg]
                # tie-aware across chunks: an exact float tie moves to
                # the smaller eval id, so tie -> min-eval-id holds for
                # ANY chunk order (chunks need not be globally sorted)
                upd = (mx > best) | ((mx == best) & (cid < best_id))
                best[upd] = mx[upd]
                best_id[upd] = cid[upd]
            from humid_ray.util import round_half_away

            return pa.table({
                "vec_id": pa.array(ids),
                "nearest_eval_id": pa.array(best_id),
                "max_cosine": pa.array(round_half_away(best, 6)),
                "contaminated": pa.array(best >= self.threshold),
            })

    return ds.map_batches(
        _Contam,
        fn_constructor_kwargs={"eval_refs": eval_refs,
                               "threshold": threshold,
                               "eval_mod": eval_mod},
        batch_format="pyarrow", zero_copy_batch=True, concurrency=(1, 4),
    )


def decontaminate_embeddings_sql(threshold: float = 0.95,
                                 eval_mod: int = 20) -> str:
    """DuckDB oracle for ``decontaminate_embeddings``: double-cast
    cross join + first-row window, flag on the unrounded cosine."""
    return (
        "WITH e AS (SELECT vec_id, "
        "list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v "
        "FROM embeddings), "
        f"ev AS (SELECT vec_id, v FROM e WHERE vec_id % {eval_mod} = 0), "
        f"tr AS (SELECT vec_id, v FROM e WHERE vec_id % {eval_mod} != 0), "
        "s AS (SELECT t.vec_id, ev.vec_id AS eval_id, "
        "list_inner_product(t.v, ev.v) / "
        "(greatest(sqrt(list_inner_product(t.v, t.v)), 1e-12) * "
        "greatest(sqrt(list_inner_product(ev.v, ev.v)), 1e-12)) AS cos "
        "FROM tr t CROSS JOIN ev), "
        "r AS (SELECT vec_id, eval_id, cos, "
        "row_number() OVER (PARTITION BY vec_id "
        "ORDER BY cos DESC, eval_id) AS rn FROM s) "
        "SELECT vec_id, eval_id AS nearest_eval_id, "
        "round(cos, 6) AS max_cosine, "
        f"cos >= {threshold} AS contaminated FROM r WHERE rn = 1"
    )
