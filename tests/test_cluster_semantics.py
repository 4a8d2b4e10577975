"""Clustering-rule parity tests, translated from the reference's
tests/test_cluster.cc onto the shared semantics core.

Node ids double as "signatures": the core receives nodes in
ascending-sig order, so index order here == walk order there.
"""

import numpy as np

from humid_ray.stages.clustering_core import build_csr, cluster_component


def _graph(counts, edges):
    counts = np.asarray(counts, dtype=np.int64)
    if edges:
        ea = np.asarray([a for a, _ in edges])
        eb = np.asarray([b for _, b in edges])
    else:
        ea = eb = np.asarray([], dtype=np.int64)
    indptr, indices = build_csr(len(counts), ea, eb)
    return counts, indptr, indices


def test_lone_node_directional():
    # reference: "walking a node with no neighbours" (test_cluster.cc:23-28)
    counts, ip, ix = _graph([5], [])
    res = cluster_component(counts, ip, ix, "directional")
    assert res.cluster_of.tolist() == [0]
    assert res.max_node == [0] and res.sizes == [5]


def test_chain_walk_directional():
    # reference: "walking a chain of nodes" (test_cluster.cc:45-71):
    # 1 -> 2 -> 4 chain climbs to the 4-node; a 7-node neighbor of the
    # 4-node is NOT reached (7 < 2*4).
    counts, ip, ix = _graph([1, 2, 4, 7], [(0, 1), (1, 2), (2, 3)])
    res = cluster_component(counts, ip, ix, "directional")
    # seed 0 climbs 0->1->2, roots at node 2 (count 4)
    assert res.max_node[0] == 2
    # nodes 0,1,2 in cluster 0; node 3 forms its own cluster later
    assert res.cluster_of.tolist() == [0, 0, 0, 1]


def test_reference_chain_2_4_8_10_3():
    # reference: "assigning to cluster" (test_cluster.cc:73-137)
    # chain node1(2) - node2(4) - node3(8) - node4(10) - node5(3)
    counts, ip, ix = _graph(
        [2, 4, 8, 10, 3], [(0, 1), (1, 2), (2, 3), (3, 4)]
    )
    res = cluster_component(counts, ip, ix, "directional")
    assert res.cluster_of.tolist() == [0, 0, 0, 1, 1]
    assert res.sizes == [14, 13]
    assert res.max_node == [2, 3]  # maxLeaf = count-8 node, count-10 node
    assert [int(counts[m]) for m in res.max_node] == [8, 10]
    # seeds: node0 created cluster 0; node3 created cluster 1
    assert res.seed_node == [0, 3]


def test_reference_chain_maximum_mode():
    # same chain under -x: one flood-filled cluster, rep = count-10 node
    counts, ip, ix = _graph(
        [2, 4, 8, 10, 3], [(0, 1), (1, 2), (2, 3), (3, 4)]
    )
    res = cluster_component(counts, ip, ix, "maximum")
    assert res.cluster_of.tolist() == [0] * 5
    assert res.sizes == [27]
    assert res.max_node == [3]


def test_at_least_double_boundary():
    # reference atLeastDouble_ boundary (test_cluster.cc:17-21):
    # a>=2b: (1,0) yes, (2,1) yes, (3,2) no — probed via merge behavior.
    # 2-vs-1 merges; 3-vs-2 does not.
    counts, ip, ix = _graph([1, 2], [(0, 1)])
    res = cluster_component(counts, ip, ix, "directional")
    assert res.cluster_of.tolist() == [0, 0]
    counts, ip, ix = _graph([2, 3], [(0, 1)])
    res = cluster_component(counts, ip, ix, "directional")
    assert res.cluster_of.tolist() == [0, 1]


def test_assigned_neighbour_not_climbed():
    # reference: "walking node whose neighbour is already assigned"
    # (test_cluster.cc:30-43): once the 2-node is taken by an earlier
    # cluster, the 1-node stays alone. We emulate via walk order:
    # node0 (count 4) absorbs node1 (count 2) first; node2 (count 1),
    # whose only neighbor is node1, then seeds its own cluster.
    counts, ip, ix = _graph([4, 2, 1], [(0, 1), (1, 2)])
    res = cluster_component(counts, ip, ix, "directional")
    # walk 0: climb stays (2 < 8): root 0, absorb 1 (4>=4), then 2 (2>=2)
    assert res.cluster_of.tolist() == [0, 0, 0]
    # different shape: make node2 NOT absorbable (count 2 vs half=1)
    counts, ip, ix = _graph([4, 2, 2], [(0, 1), (1, 2)])
    res = cluster_component(counts, ip, ix, "directional")
    assert res.cluster_of.tolist() == [0, 0, 1]


def test_tie_break_first_visited_wins_maximum():
    # strict > in updateMaxCount_: equal counts -> first visited is rep
    counts, ip, ix = _graph([5, 5, 5], [(0, 1), (1, 2)])
    res = cluster_component(counts, ip, ix, "maximum")
    assert res.max_node == [0]


def test_directional_root_is_rep_even_with_larger_unreachable():
    # hill-climb gate: 10 is NOT 2x8, so the 8-seeded cluster roots at 8
    counts, ip, ix = _graph([8, 10], [(0, 1)])
    res = cluster_component(counts, ip, ix, "directional")
    assert res.cluster_of.tolist() == [0, 1]
    assert res.max_node == [0, 1]
