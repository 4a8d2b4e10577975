"""Phase 4a — connected components over the verified edge list.

HUMID analog: the transitive closure implicit in findClusters'
recursive traversal (reference src/humid.cc:167-193,
src/cluster.cc:72-80). The edge list is orders of magnitude smaller
than the corpus (only near-duplicate signatures appear), so two
strategies are provided:

* ``local``  — stream the edges to one union-find reducer (path
  compression + union by size). Deterministic labels = min sig of the
  component. Right when edges fit one node (almost always; the
  reference holds the *entire corpus* in one process).
* ``distributed`` — iterative min-label propagation ("hash-to-min",
  Rastogi et al. 2013): each round joins labels onto edges and takes
  per-node minima; converges in O(log n) rounds for typical dup
  components (which are tiny and shallow). All rounds are Ray Data
  joins/groupbys — no driver-side state.

``auto`` picks local below ``cc_local_max_edges``, else distributed.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data
from ray.data.aggregate import Min

from humid_ray.config import HumidConfig
from humid_ray.util import UINT64, u64col


class _UnionFind:
    """Union-find over arbitrary uint64 keys (dict-backed, path halving)."""

    def __init__(self):
        self.parent: dict[int, int] = {}

    def find(self, x: int) -> int:
        p = self.parent
        root = x
        while p.get(root, root) != root:
            root = p[root]
        while p.get(x, x) != x:
            p[x], x = root, p[x]
        return root

    def union(self, a: int, b: int):
        ra, rb = self.find(a), self.find(b)
        if ra == rb:
            return
        # deterministic: smaller sig value wins as root
        if rb < ra:
            ra, rb = rb, ra
        self.parent[rb] = ra


def pull_edge_arrays(edges_ds) -> tuple[np.ndarray, np.ndarray]:
    """Stream the (small) edge list to the driver ONCE as int64 arrays;
    shared by local CC, the replay fast path, and the degree stats."""
    ea, eb = [], []
    for batch in edges_ds.iter_batches(batch_size=262144, batch_format="pyarrow"):
        ea.append(batch.column("sig_a").to_numpy(zero_copy_only=False))
        eb.append(batch.column("sig_b").to_numpy(zero_copy_only=False))
    if not ea:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    return np.concatenate(ea), np.concatenate(eb)


def components_from_arrays(ea: np.ndarray, eb: np.ndarray):
    """Union-find over edge arrays -> (sigs, comps) int64 arrays."""
    uf = _UnionFind()
    for x, y in zip(ea.tolist(), eb.tolist()):
        uf.union(x, y)
    if not uf.parent:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    sigs = np.fromiter(uf.parent.keys(), dtype=np.int64, count=len(uf.parent))
    roots = np.fromiter((uf.find(int(s)) for s in sigs), dtype=np.int64, count=len(sigs))
    all_sigs = np.concatenate([sigs, np.unique(roots)])
    all_comp = np.concatenate([roots, np.unique(roots)])
    order = np.argsort(all_sigs, kind="stable")
    all_sigs, all_comp = all_sigs[order], all_comp[order]
    keep = np.r_[True, all_sigs[1:] != all_sigs[:-1]]
    return all_sigs[keep], all_comp[keep]


def connected_components_local(edges_ds) -> "ray.data.Dataset":
    """Edges Dataset -> (sig, comp) Dataset via driver-side union-find.

    Streams edge batches to the driver (the edge list is the SMALL
    side; the corpus never leaves the cluster). Labels are the min sig
    per component. Only sigs that appear in edges are emitted —
    isolated sigs are singletons by definition.
    """
    uf = _UnionFind()
    for batch in edges_ds.iter_batches(batch_size=65536, batch_format="pyarrow"):
        a = batch.column("sig_a").to_numpy(zero_copy_only=False)
        b = batch.column("sig_b").to_numpy(zero_copy_only=False)
        for x, y in zip(a.tolist(), b.tolist()):
            uf.union(x, y)
    # keys are int64 bit-views of the sigs; sign order is irrelevant
    # (labels just need to be deterministic), bit pattern is preserved.
    if not uf.parent:
        empty = pa.table({"sig": pa.array([], type=pa.int64()),
                          "comp": pa.array([], type=pa.int64())})
        return ray.data.from_arrow(empty)
    sigs = np.fromiter(uf.parent.keys(), dtype=np.int64, count=len(uf.parent))
    roots = np.fromiter((uf.find(int(s)) for s in sigs), dtype=np.int64, count=len(sigs))
    # roots themselves are members too
    all_sigs = np.concatenate([sigs, np.unique(roots)])
    all_comp = np.concatenate([roots, np.unique(roots)])
    order = np.argsort(all_sigs, kind="stable")
    all_sigs, all_comp = all_sigs[order], all_comp[order]
    keep = np.r_[True, all_sigs[1:] != all_sigs[:-1]]
    table = pa.table(
        {
            "sig": u64col(all_sigs[keep]),
            "comp": u64col(all_comp[keep]),
        }
    )
    return ray.data.from_arrow(table)


def connected_components_distributed(edges_ds, max_rounds: int = 64) -> "ray.data.Dataset":
    """Min-label propagation, fully in Ray Data — join-free.

    State: labels(sig, comp), comp starts = sig. Each round is two
    groupby shuffles (no Dataset.join — robust to empty partitions):

      1. scatter: union(edge rows tagged (node, peer),
         label rows tagged (node, comp)) -> groupby(node) -> each
         group holds the node's current label + its adjacency; emit
         (sig=peer, cand=label) for every neighbor plus
         (sig=node, cand=label).
      2. gather: groupby(sig) -> new label = min(cand), plus a
         ``changed`` flag vs the group's old label; Sum(changed) == 0
         is the convergence witness.

    Converges in O(component diameter) rounds; near-dup components are
    shallow (stars/short chains around a popular signature), and
    ``max_rounds`` bounds pathological chains.
    """
    edges = edges_ds.materialize()

    def edge_rows(batch: pa.Table) -> pa.Table:
        a = _chunk(batch.column("sig_a"))
        b = _chunk(batch.column("sig_b"))
        node = pa.concat_arrays([a, b])
        peer = pa.concat_arrays([b, a])
        n = len(node)
        return pa.table(
            {
                "node": node,
                "peer": peer,
                "comp": pa.array(np.zeros(n, dtype=np.int64)),
                "is_label": pa.array(np.zeros(n, dtype=bool)),
            }
        )

    def seed(batch: pa.Table) -> pa.Table:
        a = batch.column("sig_a").to_numpy(zero_copy_only=False)
        b = batch.column("sig_b").to_numpy(zero_copy_only=False)
        s = np.unique(np.concatenate([a, b]))
        n = len(s)
        return pa.table(
            {
                "sig": pa.array(s, type=pa.int64()),
                "comp": pa.array(s, type=pa.int64()),
            }
        )

    directed = edges.map_batches(
        edge_rows, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    labels = (
        edges.map_batches(seed, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("sig")
        .aggregate(Min("comp", alias_name="comp"))
    ).materialize()

    def as_label_rows(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table(
            {
                "node": _chunk(batch.column("sig")),
                "peer": pa.array(np.zeros(n, dtype=np.int64)),
                "comp": _chunk(batch.column("comp")),
                "is_label": pa.array(np.ones(n, dtype=bool)),
            }
        )

    def scatter(group: pa.Table) -> pa.Table:
        is_label = group.column("is_label").to_numpy(zero_copy_only=False)
        comp = group.column("comp").to_numpy(zero_copy_only=False)[is_label]
        label = int(comp.min()) if len(comp) else 0
        peers = group.column("peer").to_numpy(zero_copy_only=False)[~is_label]
        node = int(group.column("node")[0].as_py())
        sigs = np.concatenate([peers, [node]])
        old = np.full(len(sigs), np.iinfo(np.int64).max, dtype=np.int64)
        old[-1] = label  # carry the node's previous label for the gather
        return pa.table(
            {
                "sig": pa.array(sigs.astype(np.int64)),
                "cand": pa.array(np.full(len(sigs), label, dtype=np.int64)),
                "old": pa.array(old),
            }
        )

    def gather(group: pa.Table) -> pa.Table:
        cand = group.column("cand").to_numpy(zero_copy_only=False)
        old = group.column("old").to_numpy(zero_copy_only=False)
        new = int(cand.min())
        prev = int(old.min())
        return pa.table(
            {
                "sig": pa.array([int(group.column("sig")[0].as_py())], type=pa.int64()),
                "comp": pa.array([new], type=pa.int64()),
                "changed": pa.array([int(new != prev)], type=pa.int64()),
            }
        )

    for _ in range(max_rounds):
        stacked = directed.union(
            labels.map_batches(as_label_rows, batch_format="pyarrow")
        )
        msgs = stacked.groupby("node").map_groups(scatter, batch_format="pyarrow")
        new_labels = msgs.groupby("sig").map_groups(
            gather, batch_format="pyarrow"
        ).materialize()
        changed = new_labels.sum("changed")
        labels = new_labels.select_columns(["sig", "comp"])
        if not changed:
            break
    return labels


def _chunk(col):
    return col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col


def connected_components(edges_ds, cfg: HumidConfig) -> "ray.data.Dataset":
    strategy = cfg.cc_strategy
    if strategy == "auto":
        n_edges = edges_ds.count()
        strategy = "local" if n_edges <= cfg.cc_local_max_edges else "distributed"
    if strategy == "local":
        return connected_components_local(edges_ds)
    return connected_components_distributed(edges_ds)
