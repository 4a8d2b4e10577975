"""Brute-force oracle for the dedup pipeline (test-side ground truth).

Computes, without any LSH/banding shortcuts, exactly what the
reference engine computes on a corpus of (image_id, sig, filtered)
rows:

* unique signature table with counts (trie leaves,
  reference src/humid.cc:89-99);
* the complete neighbor edge list by O(n^2) Hamming comparison
  (reference findHammingNeighbours src/humid.cc:113-130);
* cluster assignments / representatives / histograms via the shared
  semantics core (whose behavior is pinned independently by unit tests
  translated from reference tests/test_cluster.cc).

Only for small n — tests and recall measurement, never the engine path.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from humid_ray.stages.clustering_core import build_csr, cluster_component
from humid_ray.util import UINT64, hamming64


def unique_sigs(sigs: np.ndarray, image_ids: np.ndarray):
    """(sorted unique sigs, counts, first image_id per sig)."""
    order = np.lexsort((image_ids, sigs))
    s, ids = sigs[order], image_ids[order]
    uniq, start, counts = np.unique(s, return_index=True, return_counts=True)
    return uniq, counts, ids[start]


def brute_force_edges(uniq: np.ndarray, max_distance: int) -> np.ndarray:
    """All index pairs (i, j), i<j, with Hamming(sig_i, sig_j) <= m."""
    n = len(uniq)
    out = []
    chunk = 2048
    for lo in range(0, n, chunk):
        hi = min(lo + chunk, n)
        d = hamming64(uniq[lo:hi, None], uniq[None, :])
        ii, jj = np.nonzero(d <= max_distance)
        ii = ii + lo
        keep = ii < jj
        out.append(np.stack([ii[keep], jj[keep]], axis=1))
    return np.concatenate(out, axis=0) if out else np.empty((0, 2), dtype=np.int64)


def oracle_cluster(
    sigs: np.ndarray,
    image_ids: np.ndarray,
    max_distance: int,
    mode: str,
) -> dict:
    """Full reference-semantics result on raw (sig, image_id) rows.

    Returns dict with: uniq, counts, first_id, edges (index pairs),
    assign (DataFrame sig/cluster_id/is_rep/rep_id/cluster_size),
    histograms.
    """
    sigs = np.asarray(sigs, dtype=UINT64)
    image_ids = np.asarray(image_ids)
    uniq, counts, first_id = unique_sigs(sigs, image_ids)
    edges = brute_force_edges(uniq, max_distance)
    indptr, indices = build_csr(len(uniq), edges[:, 0], edges[:, 1])
    res = cluster_component(counts, indptr, indices, mode)
    cluster_local = res.cluster_of
    # global cluster ids: rank of seed sig, 1-based (reference numbers
    # clusters 1.. in walk order, src/humid.cc:178)
    seed_sigs = uniq[np.asarray(res.seed_node)]
    rank = np.empty(len(seed_sigs), dtype=np.int64)
    rank[np.argsort(seed_sigs, kind="stable")] = np.arange(1, len(seed_sigs) + 1)
    cluster_id = rank[cluster_local]
    max_node = np.asarray(res.max_node)
    is_rep = np.zeros(len(uniq), dtype=bool)
    is_rep[max_node] = True
    sizes = np.asarray(res.sizes)[cluster_local]
    rep_id = first_id[max_node[cluster_local]]
    assign = pd.DataFrame(
        {
            "sig": uniq,
            "count": counts,
            "first_id": first_id,
            "cluster_id": cluster_id,
            "is_rep": is_rep,
            "cluster_size": sizes,
            "rep_image_id": rep_id,
        }
    )
    degree = indptr[1:] - indptr[:-1]
    hist = lambda v: pd.Series(v).value_counts().sort_index()  # noqa: E731
    return {
        "uniq": uniq,
        "counts": counts,
        "first_id": first_id,
        "edges": edges,
        "assign": assign,
        "count_hist": hist(counts),
        "neigh_hist": hist(degree),
        "cluster_hist": hist(np.asarray(res.sizes)),
        "n_clusters": len(res.seed_node),
    }


def edge_recall(found: set[tuple[int, int]], truth: set[tuple[int, int]]) -> float:
    """Dup-pair recall of a found edge set vs the brute-force truth."""
    if not truth:
        return 1.0
    return len(found & truth) / len(truth)
