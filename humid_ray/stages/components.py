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


def connected_components_distributed(edges_ds, max_rounds: int = 50) -> "ray.data.Dataset":
    """Min-label propagation, fully in Ray Data.

    labels(sig) start at sig; each round:
      candidates = labels(sig_a) pushed to sig_b, labels(sig_b) pushed
      to sig_a, plus current labels; new = min per sig.
    Stops when the global sum of labels stops changing (a cheap
    convergence witness: labels only ever decrease).
    """
    edges = edges_ds.materialize()

    def seed(batch: pa.Table) -> pa.Table:
        a = batch.column("sig_a").to_numpy(zero_copy_only=False)
        b = batch.column("sig_b").to_numpy(zero_copy_only=False)
        s = np.unique(np.concatenate([a, b]))
        return pa.table({"sig": u64col(s),
                         "comp": u64col(s)})

    labels = (
        edges.map_batches(seed, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("sig")
        .aggregate(Min("comp", alias_name="comp"))
    ).materialize()

    def edge_msgs(batch: pa.Table) -> pa.Table:
        # (node, neighbor) both directions; label lookup via join below
        a = batch.column("sig_a")
        b = batch.column("sig_b")
        return pa.table(
            {
                "node": pa.concat_arrays([a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a,
                                           b.combine_chunks() if isinstance(b, pa.ChunkedArray) else b]),
                "peer": pa.concat_arrays([b.combine_chunks() if isinstance(b, pa.ChunkedArray) else b,
                                           a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a]),
            }
        )

    directed = edges.map_batches(edge_msgs, batch_format="pyarrow", zero_copy_batch=True).materialize()
    for _ in range(max_rounds):
        # messages: peer's current label reaches node
        msgs = directed.join(
            labels.map_batches(
                lambda t: t.rename_columns(["peer", "comp"]), batch_format="pyarrow"
            ),
            join_type="inner",
            num_partitions=max(labels.num_blocks(), 8),
            on=("peer",),
        ).select_columns(["node", "comp"])
        msgs = msgs.map_batches(
            lambda t: t.rename_columns(["sig", "comp"]), batch_format="pyarrow"
        )
        combined = msgs.union(labels)
        new_labels = (
            combined.groupby("sig").aggregate(Min("comp", alias_name="comp"))
        ).materialize()
        # convergence witness: any label changed? (labels only decrease)
        old = labels.map_batches(
            lambda t: t.rename_columns(["sig", "comp_old"]), batch_format="pyarrow"
        )
        joined = new_labels.join(
            old, join_type="inner", num_partitions=max(new_labels.num_blocks(), 8),
            on=("sig",),
        )

        def count_changed(t: pa.Table) -> pa.Table:
            neq = np.sum(
                t.column("comp").to_numpy(zero_copy_only=False)
                != t.column("comp_old").to_numpy(zero_copy_only=False)
            )
            return pa.table({"changed": pa.array([int(neq)], type=pa.int64())})

        changed = joined.map_batches(count_changed, batch_format="pyarrow").sum("changed")
        labels = new_labels
        if not changed:
            break
    return labels


def connected_components(edges_ds, cfg: HumidConfig) -> "ray.data.Dataset":
    strategy = cfg.cc_strategy
    if strategy == "auto":
        n_edges = edges_ds.count()
        strategy = "local" if n_edges <= cfg.cc_local_max_edges else "distributed"
    if strategy == "local":
        return connected_components_local(edges_ds)
    return connected_components_distributed(edges_ds)
