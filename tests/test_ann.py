"""Similarity-search correctness vs a local numpy oracle (sf0.001)."""

import numpy as np
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _local_knn(k=5, nq=8):
    t = pq.read_table(f"{SF}/embeddings.parquet").to_pandas().sort_values("vec_id")
    ids = t.vec_id.to_numpy()
    m = np.stack(t.embedding.to_numpy()).astype(np.float64)
    m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
    q_ids = ids[:nq]
    q = m[:nq]
    sims = m @ q.T
    out = {}
    for qi in range(nq):
        s = sims[:, qi]
        idx = np.lexsort((ids, -s))[:k]
        out[int(q_ids[qi])] = [(int(ids[i]), round(float(s[i]), 6)) for i in idx]
    return out


def test_knn_bruteforce_matches_numpy(ray_session):
    from humid_ray.pipelines.ann import knn_bruteforce

    res = knn_bruteforce(SF, k=5, n_queries=8).to_pandas()
    truth = _local_knn(k=5, nq=8)
    for qid, expected in truth.items():
        got = res[res.query_id == qid].sort_values("rank")
        assert [(int(n), float(c)) for n, c in zip(got.neighbor_id, got.cosine)] == expected


def test_ann_lsh_recall(ray_session):
    """LSH ANN must return rank-1 self matches and decent top-k recall."""
    from humid_ray.pipelines.ann import ann_lsh

    res = ann_lsh(SF, k=5, n_queries=8, n_bits=5).to_pandas()
    truth = _local_knn(k=5, nq=8)
    hits = total = 0
    for qid, expected in truth.items():
        got = set(res[res.query_id == qid].neighbor_id.tolist())
        # self is always in its own bucket -> rank-1 exact
        r1 = res[(res.query_id == qid) & (res["rank"] == 1)]
        assert int(r1.neighbor_id.iloc[0]) == expected[0][0]
        exp = {n for n, _ in expected}
        hits += len(got & exp)
        total += len(exp)
    assert hits / total >= 0.4  # multiprobe 1-bit; approximate by design


def test_embedding_neardup_thresholds(ray_session):
    from humid_ray.pipelines.ann import embedding_neardup

    res = embedding_neardup(SF, threshold=0.8).to_pandas()
    # verify every reported pair against the exact cosine
    t = pq.read_table(f"{SF}/embeddings.parquet").to_pandas().set_index("vec_id")
    for _, row in res.iterrows():
        a = np.asarray(t.loc[row.vec_a].embedding, dtype=np.float64)
        b = np.asarray(t.loc[row.vec_b].embedding, dtype=np.float64)
        cos = a @ b / (np.linalg.norm(a) * np.linalg.norm(b))
        assert cos >= 0.8 - 1e-9
        assert row.vec_a < row.vec_b
