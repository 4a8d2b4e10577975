"""Cluster-assignment semantics (pure, single-component).

Reimplements the reference's clustering rules exactly, but iteratively
(the reference recursion segfaults on large clusters,
docs/troubleshooting.rst:6-18):

* ``maximum`` mode <-> assignMaxCluster (reference src/cluster.cc:72-80):
  flood-fill the whole connected component; representative = leaf with
  the highest count, first-visited-in-DFS-preorder wins ties (strict
  ``>`` in updateMaxCount_, src/cluster.cc:20-25).
* ``directional`` mode <-> assignDirectionalCluster
  (reference src/cluster.cc:39-87): hill-climb from the seed to a local
  maximum through unassigned neighbors with count >= 2x current
  (maxNeighbour_, restart scan after every hop), then DFS-absorb
  unassigned neighbors with count <= half of the current node
  (atLeastDouble_ gate, src/cluster.cc:31-33).

Determinism: the reference walks leaves in trie order (lexicographic
word order) and scans neighbor lists in insertion order. Our canonical
total order is ascending signature — nodes must be passed sorted by
sig and adjacency lists are scanned ascending. Cluster ids are
assigned in seed order (reference src/humid.cc:178-189 numbers them
1.. in walk order); callers re-rank seeds globally.

This module is shared by the distributed per-component replay stage
and by the test oracle; its behavior is pinned independently by unit
tests translated from the reference's tests/test_cluster.cc.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np


@dataclass
class ClusterResult:
    # per-node (aligned with the input node order)
    cluster_of: np.ndarray        # local cluster index per node
    # per-local-cluster
    seed_node: list[int] = field(default_factory=list)   # walk node that created it
    max_node: list[int] = field(default_factory=list)    # representative (maxLeaf)
    sizes: list[int] = field(default_factory=list)       # sum of member counts


def build_csr(n_nodes: int, edges_a: np.ndarray, edges_b: np.ndarray):
    """Symmetric CSR adjacency with neighbor lists sorted ascending.

    ``edges_*`` are node indices (0..n-1, already in ascending-sig
    order); each undirected edge appears once in the input.
    """
    if len(edges_a) == 0:
        indptr = np.zeros(n_nodes + 1, dtype=np.int64)
        return indptr, np.empty(0, dtype=np.int64)
    src = np.concatenate([edges_a, edges_b])
    dst = np.concatenate([edges_b, edges_a])
    order = np.lexsort((dst, src))
    src, dst = src[order], dst[order]
    indptr = np.zeros(n_nodes + 1, dtype=np.int64)
    np.add.at(indptr, src + 1, 1)
    np.cumsum(indptr, out=indptr)
    return indptr, dst


def cluster_component(
    counts: np.ndarray,
    indptr: np.ndarray,
    indices: np.ndarray,
    mode: str,
) -> ClusterResult:
    """Assign clusters over one (or more) components' nodes.

    Nodes are 0..n-1 in ascending-sig order; ``counts[i]`` is the
    exact-duplicate multiplicity (trie leaf count).
    """
    n = len(counts)
    cluster_of = np.full(n, -1, dtype=np.int64)
    res = ClusterResult(cluster_of)

    def neighbors(v: int):
        return indices[indptr[v] : indptr[v + 1]]

    for walk in range(n):
        if cluster_of[walk] != -1:
            continue
        cid = len(res.seed_node)
        res.seed_node.append(walk)
        res.sizes.append(0)
        res.max_node.append(-1)
        max_count = 0

        def assign(v: int):
            nonlocal max_count
            cluster_of[v] = cid
            res.sizes[cid] += int(counts[v])

        def update_max(v: int):
            # strict > : first visited wins ties (src/cluster.cc:20-25)
            nonlocal max_count
            if counts[v] > max_count:
                max_count = int(counts[v])
                res.max_node[cid] = v

        if mode == "maximum":
            # DFS preorder, assign+update at visit (src/cluster.cc:72-80)
            assign(walk)
            update_max(walk)
            stack = [(walk, 0)]
            while stack:
                v, i = stack.pop()
                nbs = neighbors(v)
                while i < len(nbs):
                    nb = int(nbs[i])
                    i += 1
                    if cluster_of[nb] == -1:
                        stack.append((v, i))
                        assign(nb)
                        update_max(nb)
                        stack.append((nb, 0))
                        break
        elif mode == "directional":
            # hill-climb to a local max (maxNeighbour_, src/cluster.cc:39-51)
            node = walk
            moved = True
            while moved:
                moved = False
                for nb in neighbors(node):
                    nb = int(nb)
                    if cluster_of[nb] == -1 and counts[nb] >= 2 * counts[node]:
                        node = nb
                        moved = True
                        break
            # root is the representative (updateMaxCount_ called once,
            # src/cluster.cc:82-87)
            update_max(node)
            # descend: absorb unassigned neighbors with count <= half
            # (assignDirectionalCluster_, src/cluster.cc:58-69)
            assign(node)
            stack = [(node, 0)]
            while stack:
                v, i = stack.pop()
                nbs = neighbors(v)
                while i < len(nbs):
                    nb = int(nbs[i])
                    i += 1
                    if cluster_of[nb] == -1 and counts[v] >= 2 * counts[nb]:
                        stack.append((v, i))
                        assign(nb)
                        stack.append((nb, 0))
                        break
        else:
            raise ValueError(f"unknown clustering mode {mode}")
    return res
