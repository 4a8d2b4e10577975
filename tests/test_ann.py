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


def test_embedding_neardup_planted_recall(ray_session):
    """Recall and precision on PLANTED near-duplicates (base vectors +
    small noise copies) — the testdata itself has no near-dups."""
    import pyarrow as pa
    import ray.data

    from humid_ray.pipelines.ann import embedding_neardup

    rng = np.random.default_rng(11)
    base = rng.standard_normal((300, 64))
    noisy = base[:60] + rng.standard_normal((60, 64)) * 0.05  # ~cos 0.999
    m = np.vstack([base, noisy])
    ids = np.arange(len(m))
    ds = ray.data.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(ids, type=pa.int64()),
                "embedding": pa.FixedSizeListArray.from_arrays(
                    pa.array(m.reshape(-1), type=pa.float32()), 64
                ),
            }
        )
    )
    res = embedding_neardup("", threshold=0.95, ds=ds).to_pandas()
    found = set(zip(res.vec_a, res.vec_b))
    planted = {(i, 300 + i) for i in range(60)}
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    s = mn.astype(np.float64) @ mn.astype(np.float64).T
    np.fill_diagonal(s, -1)
    ii, jj = np.nonzero(np.triu(s >= 0.95))
    truth = set(zip(ii.tolist(), jj.tolist()))
    assert planted <= truth
    recall = len(found & truth) / len(truth)
    assert recall >= 0.95  # 4 LSH tables, 6 bits: near-identical pairs collide whp
    # precision: every reported pair really is >= threshold (float32 slack)
    for a, b in found:
        assert s[a, b] >= 0.95 - 1e-5


def test_embedding_neardup_empty_on_dissimilar_data(ray_session):
    """The sandbox embeddings have max pairwise cosine ~0.51 — an empty
    near-dup result at 0.95 is the CORRECT answer, not a bug."""
    from humid_ray.pipelines.ann import embedding_neardup

    assert len(embedding_neardup(SF, threshold=0.95).to_pandas()) == 0


def test_ann_ivf_full_probe_equals_bruteforce(ray_session):
    """nprobe == n_centroids degenerates to an exact scan: the IVF
    result must equal brute force row-for-row."""
    from humid_ray.pipelines.ann import ann_ivf, knn_bruteforce

    bf = knn_bruteforce(SF, k=5, n_queries=8).to_pandas()
    ivf = ann_ivf(SF, k=5, n_queries=8, n_centroids=16, nprobe=16).to_pandas()
    cols = ["query_id", "rank"]
    bf = bf.sort_values(cols).reset_index(drop=True)
    ivf = ivf.sort_values(cols).reset_index(drop=True)
    assert bf.equals(ivf)


def test_ann_ivf_partial_probe_recall(ray_session):
    """Partial probing keeps reasonable recall@k on the testdata."""
    from humid_ray.pipelines.ann import ann_ivf, knn_bruteforce

    bf = knn_bruteforce(SF, k=5, n_queries=8).to_pandas()
    ivf = ann_ivf(SF, k=5, n_queries=8, n_centroids=16, nprobe=6).to_pandas()
    hits = tot = 0
    for qid in bf.query_id.unique():
        want = set(bf[bf.query_id == qid].neighbor_id)
        got = set(ivf[ivf.query_id == qid].neighbor_id)
        hits += len(want & got)
        tot += len(want)
    assert hits / tot >= 0.5, hits / tot


def test_ann_empty_embeddings_table(ray_session, tmp_path):
    """Regression: driver-side np.stack on an empty take_all crashed
    every ANN entry point on an empty embeddings table."""
    import pyarrow as pa
    import pyarrow.parquet as pq_

    from humid_ray.pipelines.ann import (
        ann_ivf,
        ann_lsh,
        embedding_neardup,
        knn_bruteforce,
    )

    schema = pa.schema(
        [("vec_id", pa.int64()), ("embedding", pa.list_(pa.float32())),
         ("label", pa.int32())]
    )
    d = tmp_path / "empty_sf"
    d.mkdir()
    pq_.write_table(schema.empty_table(), d / "embeddings.parquet")
    for fn in (knn_bruteforce, ann_lsh, ann_ivf, embedding_neardup):
        out = fn(str(d))
        assert out.num_rows == 0


def test_ivf_hash_sample_spans_blocks(ray_session):
    """The k-means training sample must draw from EVERY region of a
    multi-block table, not just the first blocks (limit() bias)."""
    import pyarrow as pa
    import ray.data

    from humid_ray.pipelines.ann import _hash_sample

    def block(lo, hi):
        return pa.table(
            {"vec_id": pa.array(list(range(lo, hi)), type=pa.int64()),
             "embedding": pa.array([[float(i), 1.0] for i in range(lo, hi)])}
        )

    # 4 blocks with disjoint id ranges, sorted layout (the bias case)
    ds = ray.data.from_arrow([block(0, 250), block(250, 500),
                              block(500, 750), block(750, 1000)])
    ids, m = _hash_sample(ds, sample=100)
    assert len(ids) == 100 and m.shape == (100, 2)
    quartile = set(ids // 250)
    assert quartile == {0, 1, 2, 3}, f"sample biased to blocks {quartile}"
    # deterministic: same seed -> same sample
    ids2, _ = _hash_sample(ds, sample=100)
    assert np.array_equal(np.sort(ids), np.sort(ids2))


def test_embedding_neardup_exact_matches_numpy(ray_session):
    import numpy as np
    import pyarrow.parquet as pq

    from humid_ray.pipelines import ann
    from humid_ray.util import round_half_away

    sf = "/root/testdata/sf0.001"
    got = (
        ann.embedding_neardup_exact(sf)
        .to_pandas()
        .sort_values(["vec_a", "vec_b"])
        .reset_index(drop=True)
    )
    t = pq.read_table(f"{sf}/embeddings.parquet")
    ids = t.column("vec_id").to_numpy()
    m = np.stack(
        [np.asarray(v, dtype=np.float64) for v in t.column("embedding").to_pylist()]
    )
    m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
    sims = m @ m.T
    ii, jj = np.nonzero((sims >= 0.4) & (ids[:, None] < ids[None, :]))
    import pandas as pd

    want = pd.DataFrame(
        {
            "vec_a": ids[ii],
            "vec_b": ids[jj],
            "cosine": round_half_away(sims[ii, jj], 6),
        }
    ).sort_values(["vec_a", "vec_b"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
