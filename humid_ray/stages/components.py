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


CC_BUCKETS = 256
_I64_MAX = np.iinfo(np.int64).max


def _cc_bucket(sig: np.ndarray) -> np.ndarray:
    """Shuffle bucket per node: splitmix64(sig) % CC_BUCKETS. Bucketing
    (not per-node grouping) keeps every kernel invocation vectorized
    over thousands of nodes; the mixer spreads adjacent sig values."""
    from humid_ray.util import splitmix64

    h = splitmix64(np.asarray(sig, dtype=np.int64).view(UINT64))
    return (h % UINT64(CC_BUCKETS)).astype(np.int64)


def connected_components_distributed(edges_ds, max_rounds: int = 64) -> "ray.data.Dataset":
    """Min-label propagation, fully in Ray Data — join-free and
    vectorized (no per-node Python kernels).

    State: labels(sig, comp), comp starts = sig (int64 bit-view order,
    same convention as the local union-find). Each round:

      1. scatter: union(directed edge rows, label rows), both tagged
         with bucket = hash(node) % CC_BUCKETS -> groupby(bucket) ->
         ONE numpy kernel per bucket: sort the bucket's labels by
         node, searchsorted the bucket's edge endpoints against them,
         emit (sig=peer, cand=label(node)) per edge row plus the
         self-message (sig=node, cand=label, old=label).
      2. gather: groupby(sig).aggregate(Min(cand), Min(old)) — Ray
         Data's builtin (vectorized) aggregate; new label = min cand.
      3. convergence: sum over batches of (new != old) == 0. ``old``
         is carried only by the self-message (peer messages carry
         int64 max), so Min(old) is exactly the previous label.

    Per round: one groupby over ~(2|E| + |V|) rows hashed into
    CC_BUCKETS groups + one vectorized aggregate — no per-node groups,
    no Dataset.join (empty-partition fragile), no driver-side state.
    Converges in O(component diameter) rounds; near-dup components are
    shallow (stars/short chains), and ``max_rounds`` bounds chains.
    """
    empty = pa.table({"sig": pa.array([], type=pa.int64()),
                      "comp": pa.array([], type=pa.int64())})
    edges = edges_ds.materialize()
    if edges.count() == 0:
        return ray.data.from_arrow(empty)

    def edge_rows(batch: pa.Table) -> pa.Table:
        a = batch.column("sig_a").to_numpy(zero_copy_only=False)
        b = batch.column("sig_b").to_numpy(zero_copy_only=False)
        node = np.concatenate([a, b])
        peer = np.concatenate([b, a])
        return pa.table(
            {
                "bucket": pa.array(_cc_bucket(node)),
                "node": pa.array(node),
                "peer": pa.array(peer),
                "comp": pa.array(np.zeros(len(node), dtype=np.int64)),
                "is_label": pa.array(np.zeros(len(node), dtype=bool)),
            }
        )

    def seed(batch: pa.Table) -> pa.Table:
        a = batch.column("sig_a").to_numpy(zero_copy_only=False)
        b = batch.column("sig_b").to_numpy(zero_copy_only=False)
        s = np.unique(np.concatenate([a, b]))
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
        sig = batch.column("sig").to_numpy(zero_copy_only=False)
        n = len(sig)
        return pa.table(
            {
                "bucket": pa.array(_cc_bucket(sig)),
                "node": pa.array(sig),
                "peer": pa.array(np.zeros(n, dtype=np.int64)),
                "comp": _chunk(batch.column("comp")),
                "is_label": pa.array(np.ones(n, dtype=bool)),
            }
        )

    def scatter_bucket(group: pa.Table) -> pa.Table:
        """One call per BUCKET (vectorized over all its nodes/edges).
        Output rows are pre-bucketed by DESTINATION sig so the gather
        is another 256-group pass, not a per-sig aggregate."""
        is_label = group.column("is_label").to_numpy(zero_copy_only=False)
        node = group.column("node").to_numpy(zero_copy_only=False)
        node_l = node[is_label]
        comp_l = group.column("comp").to_numpy(zero_copy_only=False)[is_label]
        order = np.argsort(node_l, kind="stable")
        node_l, comp_l = node_l[order], comp_l[order]
        node_e = node[~is_label]
        peer_e = group.column("peer").to_numpy(zero_copy_only=False)[~is_label]
        lab_e = comp_l[np.searchsorted(node_l, node_e)] if len(node_e) else np.empty(0, dtype=np.int64)
        sig = np.concatenate([peer_e, node_l])
        return pa.table(
            {
                "bucket": pa.array(_cc_bucket(sig)),
                "sig": pa.array(sig),
                "cand": pa.array(np.concatenate([lab_e, comp_l])),
                # only the self-message carries the previous label
                "old": pa.array(np.concatenate(
                    [np.full(len(node_e), _I64_MAX, dtype=np.int64), comp_l]
                )),
            }
        )

    def gather_bucket(group: pa.Table) -> pa.Table:
        """Per-bucket vectorized min: sort messages by destination sig,
        ``np.minimum.reduceat`` per sig run — replaces a per-sig
        aggregate (|V| groups) with one numpy kernel per bucket."""
        sig = group.column("sig").to_numpy(zero_copy_only=False)
        cand = group.column("cand").to_numpy(zero_copy_only=False)
        old = group.column("old").to_numpy(zero_copy_only=False)
        order = np.argsort(sig, kind="stable")
        sig, cand, old = sig[order], cand[order], old[order]
        starts = np.flatnonzero(np.r_[True, sig[1:] != sig[:-1]])
        return pa.table(
            {
                "sig": pa.array(sig[starts]),
                "comp": pa.array(np.minimum.reduceat(cand, starts)),
                "old": pa.array(np.minimum.reduceat(old, starts)),
            }
        )

    def changed_partial(batch: pa.Table) -> pa.Table:
        new = batch.column("comp").to_numpy(zero_copy_only=False)
        old = batch.column("old").to_numpy(zero_copy_only=False)
        return pa.table({"changed": pa.array([int((new != old).sum())], type=pa.int64())})

    def query_rows(batch: pa.Table) -> pa.Table:
        """Shortcut lookups: node v asks bucket(L(v)) for L(L(v))."""
        sig = batch.column("sig").to_numpy(zero_copy_only=False)
        comp = batch.column("comp").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "bucket": pa.array(_cc_bucket(comp)),
                "node": pa.array(sig),
                "peer": pa.array(comp),  # the label being dereferenced
                "comp": pa.array(np.zeros(len(sig), dtype=np.int64)),
                "is_label": pa.array(np.zeros(len(sig), dtype=bool)),
            }
        )

    def shortcut_bucket(group: pa.Table) -> pa.Table:
        """L(v) <- L(L(v)) (pointer jumping): each query row carries
        (node=v, peer=L(v)); the bucket holds the label rows for every
        possible L(v) (bucket = hash(L(v)))."""
        is_label = group.column("is_label").to_numpy(zero_copy_only=False)
        node = group.column("node").to_numpy(zero_copy_only=False)
        node_l = node[is_label]
        comp_l = group.column("comp").to_numpy(zero_copy_only=False)[is_label]
        order = np.argsort(node_l, kind="stable")
        node_l, comp_l = node_l[order], comp_l[order]
        q_node = node[~is_label]
        q_target = group.column("peer").to_numpy(zero_copy_only=False)[~is_label]
        new = comp_l[np.searchsorted(node_l, q_target)] if len(q_node) else np.empty(0, dtype=np.int64)
        return pa.table({"sig": pa.array(q_node), "comp": pa.array(new)})

    n_blocks = max(8, int(ray.cluster_resources().get("CPU", 4)))
    for _ in range(max_rounds):
        # 1. min-propagation step
        stacked = directed.union(
            labels.map_batches(as_label_rows, batch_format="pyarrow",
                               zero_copy_batch=True)
        )
        new_labels = (
            stacked.groupby("bucket")
            .map_groups(scatter_bucket, batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(gather_bucket, batch_format="pyarrow")
            # coalesce: map_groups fans out to ~CC_BUCKETS blocks and
            # the round loop would otherwise DOUBLE block count every
            # round (observed 4 -> 1534 over 9 rounds; scheduling
            # overhead then dominates)
            .repartition(n_blocks, shuffle=False)
        ).materialize()
        changed = new_labels.map_batches(
            changed_partial, batch_format="pyarrow", zero_copy_batch=True
        ).sum("changed")
        labels = new_labels.select_columns(["sig", "comp"])
        if not changed:
            break
        # 2. pointer-jumping step: L(v) <- L(L(v)). Labels are node
        # ids present in the label table (min over neighbor sigs), so
        # the dereference always hits. Correctness is unaffected
        # (labels stay monotone non-increasing within the component);
        # convergence drops from O(diameter) to O(log diameter) rounds.
        labels = (
            labels.map_batches(query_rows, batch_format="pyarrow",
                               zero_copy_batch=True)
            .union(labels.map_batches(as_label_rows, batch_format="pyarrow",
                                      zero_copy_batch=True))
            .groupby("bucket")
            .map_groups(shortcut_bucket, batch_format="pyarrow")
            .repartition(n_blocks, shuffle=False)
        ).materialize()
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
