"""Phase 4b — cluster assignment (per-component replay).

HUMID analog: findClusters walking leaves in trie order and running
assignMax/assignDirectionalCluster (reference src/humid.cc:167-193,
src/cluster.cc:39-87). Components are independent: the reference's
global walk only ever touches unassigned leaves inside the current
component, so replaying each component separately in ascending-sig
order and then ordering clusters globally by their seed signature
reproduces the reference's walk-order semantics exactly (SURVEY §2.7).

Execution shape: nodes and edges are tagged with their component
label, unioned into one dataset, grouped by component, and each group
replays the sequential semantics core (tiny graphs — dup clusters are
shallow). Isolated signatures never enter the shuffle: they are
singleton clusters by construction and stay on the vectorized path.

Cluster ids: the engine's canonical cluster key is the cluster's SEED
signature (unique, stable, distributed-friendly). ``dense_ids`` ranks
seeds ascending into 1..K — exactly the reference's walk-order
numbering (src/humid.cc:178) — via a driver-side rank, only sensible
when K is small enough to hold; at 10^12-row scale use seed keys.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

from humid_ray.config import HumidConfig
from humid_ray.stages.clustering_core import build_csr, cluster_component
from humid_ray.stages.joins import SigLookup
from humid_ray.util import UINT64, u64col

ASSIGN_SCHEMA = pa.schema(
    [
        ("sig", pa.int64()),
        ("count", pa.int64()),
        ("first_id", pa.string()),
        ("cluster_seed", pa.int64()),
        ("rep_sig", pa.int64()),
        ("rep_image_id", pa.string()),
        ("is_rep", pa.bool_()),
        ("cluster_size", pa.int64()),
    ]
)


N_REPLAY_BUCKETS = 256


def _replay(mode: str):
    """map_groups kernel over one BUCKET of components' node+edge rows.

    Components are hashed into a bounded number of buckets so one task
    replays many (tiny) components — per-group scheduling overhead is
    amortized. The semantics core already handles multiple disjoint
    components in one call (its walk skips assigned nodes), and
    ascending-sig walk order interleaved across components is
    state-equivalent to per-component order (SURVEY §2.7); global
    cluster numbering is by seed sig afterwards either way.
    """

    def kernel(group: pa.Table) -> pa.Table:
        kind = group.column("kind").to_numpy(zero_copy_only=False)
        sig = group.column("sig").to_numpy(zero_copy_only=False).view(UINT64)
        node_mask = kind == 0
        edge_mask = ~node_mask
        nsig = sig[node_mask]
        counts = group.column("count").to_numpy(zero_copy_only=False)[node_mask]
        first_id = np.asarray(group.column("first_id").to_pylist(), dtype=object)[node_mask]
        ea = sig[edge_mask]
        eb = group.column("sig_b").to_numpy(zero_copy_only=False).view(UINT64)[edge_mask]
        return replay_arrays(nsig, counts, first_id, ea, eb, mode)

    return kernel


def replay_arrays(nsig, counts, first_id, ea, eb, mode: str) -> pa.Table:
    """Run the clustering semantics over node/edge arrays -> assign
    table (ASSIGN_SCHEMA). Handles any number of disjoint components."""
    order = np.argsort(nsig, kind="stable")
    nsig, counts, first_id = nsig[order], counts[order], first_id[order]
    ia = np.searchsorted(nsig, ea)
    ib = np.searchsorted(nsig, eb)
    indptr, indices = build_csr(len(nsig), ia, ib)
    res = cluster_component(counts, indptr, indices, mode)
    local = res.cluster_of
    seed = np.asarray(res.seed_node, dtype=np.int64)
    maxn = np.asarray(res.max_node, dtype=np.int64)
    sizes = np.asarray(res.sizes, dtype=np.int64)
    return pa.table(
        {
            "sig": u64col(nsig),
            "count": pa.array(counts.astype(np.int64), type=pa.int64()),
            "first_id": pa.array(first_id.tolist(), type=pa.string()),
            "cluster_seed": u64col(nsig[seed][local]),
            "rep_sig": u64col(nsig[maxn][local]),
            "rep_image_id": pa.array(first_id[maxn][local].tolist(), type=pa.string()),
            "is_rep": pa.array(maxn[local] == np.arange(len(nsig))),
            "cluster_size": pa.array(sizes[local], type=pa.int64()),
        },
        schema=ASSIGN_SCHEMA,
    )


def _bucket_of(comp: np.ndarray) -> np.ndarray:
    from humid_ray.util import splitmix64

    return (splitmix64(comp.view(UINT64)) % UINT64(N_REPLAY_BUCKETS)).view(np.int64)


class _Singles:
    """uniq rows NOT in the comp map -> final singleton assignments."""

    def __init__(self, lookup_ref):
        self.lk: SigLookup = ray.get(lookup_ref)

    def __call__(self, batch: pa.Table) -> pa.Table:
        sig = batch.column("sig").to_numpy(zero_copy_only=False).view(UINT64)
        found, _ = self.lk.lookup(sig)
        miss = ~found
        count = batch.column("count").to_numpy(zero_copy_only=False)
        fid = batch.column("first_id")
        mask = pa.array(miss.astype(bool))
        return pa.table(
            {
                "sig": u64col(sig[miss]),
                "count": pa.array(count[miss].astype(np.int64), type=pa.int64()),
                "first_id": fid.filter(mask),
                "cluster_seed": u64col(sig[miss]),
                "rep_sig": u64col(sig[miss]),
                "rep_image_id": fid.filter(mask),
                "is_rep": pa.array(np.ones(int(miss.sum()), dtype=bool)),
                "cluster_size": pa.array(count[miss].astype(np.int64), type=pa.int64()),
            },
            schema=ASSIGN_SCHEMA,
        )


class _NodeRows:
    """uniq rows IN the comp map -> tagged node rows for the replay."""

    def __init__(self, lookup_ref):
        self.lk: SigLookup = ray.get(lookup_ref)

    def __call__(self, batch: pa.Table) -> pa.Table:
        sig = batch.column("sig").to_numpy(zero_copy_only=False).view(UINT64)
        found, idx = self.lk.lookup(sig)
        comp = self.lk.get("comp", idx) if len(self.lk.keys) else sig
        n = int(found.sum())
        mask = pa.array(found.astype(bool))
        comp_out = comp[found]
        if comp_out.dtype != np.int64:
            comp_out = comp_out.view(np.int64)
        return pa.table(
            {
                "bucket": pa.array(_bucket_of(comp_out), type=pa.int64()),
                "kind": pa.array(np.zeros(n, dtype=np.int8)),
                "sig": u64col(sig[found]),
                "count": pa.array(
                    batch.column("count").to_numpy(zero_copy_only=False)[found].astype(np.int64)
                ),
                "first_id": batch.column("first_id").filter(mask),
                "sig_b": pa.array(np.zeros(n, dtype=np.int64), type=pa.int64()),
            }
        )


class _EdgeRows:
    """edges -> tagged edge rows for the replay."""

    def __init__(self, lookup_ref):
        self.lk: SigLookup = ray.get(lookup_ref)

    def __call__(self, batch: pa.Table) -> pa.Table:
        a = batch.column("sig_a").to_numpy(zero_copy_only=False).view(UINT64)
        b = batch.column("sig_b").to_numpy(zero_copy_only=False).view(UINT64)
        found, idx = self.lk.lookup(a)
        if len(self.lk.keys):
            comp = np.where(found, self.lk.get("comp", idx).view(UINT64), a)
        else:
            comp = a
        n = len(a)
        return pa.table(
            {
                "bucket": pa.array(_bucket_of(np.asarray(comp, dtype=UINT64).view(np.int64)), type=pa.int64()),
                "kind": pa.array(np.ones(n, dtype=np.int8)),
                "sig": u64col(a),
                "count": pa.array(np.zeros(n, dtype=np.int64)),
                "first_id": pa.array([""] * n, type=pa.string()),
                "sig_b": u64col(b),
            }
        )


def assign_clusters(uniq_ds, edges_ds, comp_ds, cfg: HumidConfig,
                    edge_arrays: tuple | None = None):
    """(uniq, edges, comp labels) -> assignment Dataset (ASSIGN_SCHEMA).

    comp_ds holds labels only for sigs that appear in >=1 edge; all
    other sigs are singleton clusters handled without any shuffle. The
    comp label map is broadcast once via ``ray.put`` and read in each
    actor's ``__init__`` — never re-shipped per batch.
    """
    lk = SigLookup.from_dataset(comp_ds, "sig", ["comp"])
    lookup_ref = ray.put(lk)

    # stateless tasks, not actor pools: the broadcast lookup is read
    # from the object store per task (zero-copy plasma arrays), and
    # skipping pool spin-up wins for these cheap tag kernels
    kw = dict(batch_format="pyarrow", zero_copy_batch=True)
    singles = uniq_ds.map_batches(lambda t: _Singles(lookup_ref)(t), **kw)

    if len(lk.keys) <= cfg.broadcast_max_rows:
        # small-graph fast path: the cluster graph (nodes that have at
        # least one edge) is tiny relative to the corpus — replay it in
        # one place instead of paying a union + groupby shuffle. This
        # is the same size regime where the union-find CC already ran
        # locally; the distributed replay below is the scale path.
        node_tables = []
        for b in uniq_ds.iter_batches(batch_size=262144, batch_format="pyarrow"):
            sig = b.column("sig").to_numpy(zero_copy_only=False).view(UINT64)
            found, _ = lk.lookup(sig)
            node_tables.append(b.filter(pa.array(found.astype(bool))))
        nodes_t = pa.concat_tables(node_tables) if node_tables else None
        if edge_arrays is not None:
            ea = np.asarray(edge_arrays[0]).view(UINT64)
            eb = np.asarray(edge_arrays[1]).view(UINT64)
        else:
            ea_list, eb_list = [], []
            for b in edges_ds.iter_batches(batch_size=262144, batch_format="pyarrow"):
                ea_list.append(b.column("sig_a").to_numpy(zero_copy_only=False).view(UINT64))
                eb_list.append(b.column("sig_b").to_numpy(zero_copy_only=False).view(UINT64))
            ea = np.concatenate(ea_list) if ea_list else np.empty(0, dtype=UINT64)
            eb = np.concatenate(eb_list) if eb_list else np.empty(0, dtype=UINT64)
        if nodes_t is None or nodes_t.num_rows == 0:
            return singles
        assign_t = replay_arrays(
            nodes_t.column("sig").to_numpy(zero_copy_only=False).view(UINT64),
            nodes_t.column("count").to_numpy(zero_copy_only=False),
            np.asarray(nodes_t.column("first_id").to_pylist(), dtype=object),
            ea, eb, cfg.clustering,
        )
        return singles.union(ray.data.from_arrow(assign_t))

    nodes = uniq_ds.map_batches(lambda t: _NodeRows(lookup_ref)(t), **kw)
    edges = edges_ds.map_batches(lambda t: _EdgeRows(lookup_ref)(t), **kw)
    grouped = nodes.union(edges).groupby("bucket").map_groups(
        _replay(cfg.clustering), batch_format="pyarrow"
    )
    return grouped.union(singles)


def dense_cluster_ids(assign_ds) -> np.ndarray:
    """Sorted uint64 array of cluster seeds; a seed's dense id is its
    rank + 1 in ascending unsigned-sig order (the reference's
    walk-order numbering). Map seed arrays to ids with
    ``dense_ids_for`` — a searchsorted rank, no per-row Python.
    Only for small K (broadcast once via ``ray.put``)."""
    parts: list[np.ndarray] = []
    for batch in assign_ds.select_columns(["cluster_seed"]).iter_batches(
        batch_size=262144, batch_format="pyarrow"
    ):
        u = batch.column("cluster_seed").to_numpy(zero_copy_only=False).view(UINT64)
        parts.append(np.unique(u))
    if not parts:
        return np.empty(0, dtype=UINT64)
    # ascending unsigned seed sig == reference walk order
    return np.unique(np.concatenate(parts))


def dense_ids_for(seeds_sorted: np.ndarray, seed: np.ndarray,
                  valid: np.ndarray | None = None) -> np.ndarray:
    """Vectorized dense-id lookup: uint64 ids (rank + 1 in
    ``seeds_sorted``) for a seed array; 0 where the seed is unknown or
    ``valid`` is False (the reserved filtered-row id)."""
    seed = np.asarray(seed, dtype=UINT64)
    if len(seeds_sorted) == 0 or len(seed) == 0:
        return np.zeros(len(seed), dtype=np.uint64)
    idx = np.minimum(np.searchsorted(seeds_sorted, seed), len(seeds_sorted) - 1)
    found = seeds_sorted[idx] == seed
    if valid is not None:
        found = found & valid
    return np.where(found, (idx + 1).astype(np.uint64), np.uint64(0))
