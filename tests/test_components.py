"""Local union-find vs distributed min-label propagation equivalence."""

import numpy as np
import pyarrow as pa
import pytest

from humid_ray.stages.components import (
    connected_components_distributed,
    connected_components_local,
)
from humid_ray.util import u64col


def _edges_dataset(pairs):
    import ray.data

    a = np.array([p[0] for p in pairs], dtype=np.uint64)
    b = np.array([p[1] for p in pairs], dtype=np.uint64)
    return ray.data.from_arrow(
        pa.table({"sig_a": u64col(a), "sig_b": u64col(b)})
    )


def _labels_to_partition(ds):
    t = ds.to_pandas()
    comp = {}
    for s, c in zip(t.sig, t.comp):
        comp.setdefault(c, set()).add(s)
    return set(frozenset(v) for v in comp.values())


@pytest.mark.parametrize(
    "pairs",
    [
        [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (22, 23)],
        [(1, 2)],
        [(5, 6), (6, 7), (7, 5)],  # cycle
        [(i, i + 1) for i in range(1, 40)],  # long chain (many rounds)
    ],
)
def test_local_equals_distributed(ray_session, pairs):
    ds = _edges_dataset(pairs)
    local = _labels_to_partition(connected_components_local(ds))
    dist = _labels_to_partition(connected_components_distributed(ds))
    assert local == dist
    # sanity: the partition is the true transitive closure (tiny DFS)
    adj: dict[int, set[int]] = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    seen: set[int] = set()
    truth = set()
    for start in adj:
        if start in seen:
            continue
        comp, stack = set(), [start]
        while stack:
            v = stack.pop()
            if v in comp:
                continue
            comp.add(v)
            stack.extend(adj[v] - comp)
        seen |= comp
        truth.add(frozenset(comp))
    assert local == truth
