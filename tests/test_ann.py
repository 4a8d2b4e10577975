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


def _planted_family_ds(n_families=12, fam_size=5, n_singletons=80, dim=24,
                       seed=7):
    """Well-separated random unit directions; each family is fam_size
    near-identical copies (tiny jitter), singletons are fresh random
    directions. Returns (ray Dataset, family id -> member vec_ids)."""
    import pyarrow as pa
    import ray.data

    rng = np.random.default_rng(seed)
    vecs, ids, fams = [], [], {}
    nxt = 0
    for f in range(n_families):
        base = rng.normal(size=dim)
        base /= np.linalg.norm(base)
        members = []
        for _ in range(fam_size):
            v = base + rng.normal(scale=1e-3, size=dim)
            vecs.append(v / np.linalg.norm(v))
            ids.append(nxt)
            members.append(nxt)
            nxt += 1
        fams[f] = members
    for _ in range(n_singletons):
        v = rng.normal(size=dim)
        vecs.append(v / np.linalg.norm(v))
        ids.append(nxt)
        nxt += 1
    t = pa.table(
        {"vec_id": pa.array(ids, type=pa.int64()),
         "embedding": pa.array([list(map(float, v)) for v in vecs],
                               type=pa.list_(pa.float32()))}
    )
    return ray.data.from_arrow(t).repartition(6), fams


def test_semantic_dedup_keeps_one_per_family(ray_session):
    """Clustered SemDeDup: exactly one keep per planted dup family;
    every singleton kept; one row per embedding."""
    from humid_ray.pipelines.ann import semantic_dedup

    ds, fams = _planted_family_ds()
    n_rows = ds.count()
    res = semantic_dedup(None, threshold=0.95, n_clusters=8, ds=ds).to_pandas()
    assert len(res) == n_rows
    assert res.vec_id.is_unique
    kept = set(res[res.keep].vec_id.tolist())
    fam_members = set()
    for members in fams.values():
        fam_members |= set(members)
        assert len(kept & set(members)) == 1, members
    # all singletons survive
    singles = set(res.vec_id.tolist()) - fam_members
    assert singles <= kept


def test_semantic_dedup_exact_matches_local_closure(ray_session):
    """Single-cluster keep-min-id config vs a local numpy union-find
    over the cosine>=tau graph (the same semantics the DuckDB
    recursive-closure oracle pins at sf0.01)."""
    from humid_ray.pipelines.ann import semantic_dedup

    ds, _ = _planted_family_ds(n_families=6, fam_size=4, n_singletons=30)
    tau = 0.95
    res = (semantic_dedup(None, threshold=tau, n_clusters=1, keep="min_id",
                          ds=ds)
           .to_pandas().sort_values("vec_id").reset_index(drop=True))
    # local truth
    rows = ds.take_all()
    ids = np.array([r["vec_id"] for r in rows], dtype=np.int64)
    m = np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in rows])
    m /= np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
    order = np.argsort(ids)
    ids, m = ids[order], m[order]
    sims = m @ m.T
    n = len(ids)
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for i in range(n):
        for j in range(i + 1, n):
            if sims[i, j] >= tau:
                ri, rj = find(i), find(j)
                if ri != rj:
                    parent[max(ri, rj)] = min(ri, rj)
    keep_truth = {}
    for i in range(n):
        r = find(i)
        keep_truth.setdefault(r, i)
    kept_ids = {int(ids[i]) for i in keep_truth.values()}
    got = set(res[res.keep].vec_id.tolist())
    assert got == kept_ids
    assert (res.cluster == 0).all()


def test_semantic_dedup_centroid_far_keeps_outlier(ray_session):
    """SemDeDup's keep rule retains the member FARTHEST from the
    cluster centroid: plant one family whose members straddle the
    centroid at different distances and check the far one survives."""
    import pyarrow as pa
    import ray.data

    from humid_ray.pipelines.ann import semantic_dedup

    rng = np.random.default_rng(3)
    dim = 16
    base = rng.normal(size=dim)
    base /= np.linalg.norm(base)
    ortho = rng.normal(size=dim)
    ortho -= ortho @ base * base
    ortho /= np.linalg.norm(ortho)
    # single cluster: centroid ~ mean direction; member 2 is rotated
    # farthest from it while staying cosine>=0.95 to the others
    vecs = []
    for ang in (0.00, 0.02, 0.28):
        v = np.cos(ang) * base + np.sin(ang) * ortho
        vecs.append(v / np.linalg.norm(v))
    t = pa.table(
        {"vec_id": pa.array([10, 11, 12], type=pa.int64()),
         "embedding": pa.array([list(map(float, v)) for v in vecs],
                               type=pa.list_(pa.float32()))}
    )
    ds = ray.data.from_arrow(t)
    res = semantic_dedup(None, threshold=0.95, n_clusters=1,
                         keep="centroid_far", ds=ds).to_pandas()
    assert set(res[res.keep].vec_id.tolist()) == {12}


def test_ann_ivfpq_exact_codebook_recovery(ray_session, tmp_path):
    """When every subvector is drawn from <= ksub distinct values, the
    farthest-first-initialized PQ training recovers the codebook
    exactly, ADC scores equal true cosines, and full-probe IVF-PQ
    equals brute force row-for-row."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from humid_ray.pipelines.ann import ann_ivfpq, knn_bruteforce

    rng = np.random.default_rng(11)
    m_sub, dsub, kv, n = 4, 4, 6, 120
    # codewords are +-0.5 sign patterns: EXACTLY unit norm in float32
    # and float64, so every composed row has norm exactly 2 and
    # per-row normalization maps each subspace onto the same kv
    # (<= ksub) distinct values — the codebook-recovery premise.
    # (Gaussian codewords fail it: float32 storage perturbs row norms
    # per pick combination, fanning kv values into ~n scaled copies.)
    # All products are exact binary fractions, so ADC sums equal
    # brute-force dots bit-for-bit.
    patterns = np.array(
        [[1 if (i >> b) & 1 else -1 for b in range(dsub)]
         for i in range(kv)],
        dtype=np.float64,
    )
    vocabs = np.stack([patterns * 0.5 for _ in range(m_sub)])
    picks = rng.integers(0, kv, size=(n, m_sub))
    vecs = np.concatenate(
        [vocabs[j][picks[:, j]] for j in range(m_sub)], axis=1
    ).astype(np.float32)
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(vecs.reshape(-1)), m_sub * dsub
            ).cast(pa.list_(pa.float32())),
            "label": pa.array(np.zeros(n, dtype=np.int32)),
        }
    )
    pq.write_table(tbl, tmp_path / "embeddings.parquet")
    bf = knn_bruteforce(str(tmp_path), k=5, n_queries=6).to_pandas()
    # sample = n covers every row; refine=1 so the shortlist is the
    # ADC top-k itself — parity here pins the ADC scoring path, not
    # just the exact re-rank
    pqr = ann_ivfpq(str(tmp_path), k=5, n_queries=6, n_centroids=8,
                    nprobe=8, m_sub=m_sub, ksub=16, sample=n,
                    refine=1).to_pandas()
    cols = ["query_id", "rank"]
    bf = bf.sort_values(cols).reset_index(drop=True)
    pqr = pqr.sort_values(cols).reset_index(drop=True)
    assert bf.equals(pqr)


def test_ann_ivfpq_recall_on_testdata(ray_session):
    """Compressed codes + partial probing keep useful recall@k on the
    real embeddings table, and the re-ranked cosines are TRUE cosines
    (every returned score matches brute force's score for that pair)."""
    from humid_ray.pipelines.ann import ann_ivfpq, knn_bruteforce

    bf = knn_bruteforce(SF, k=5, n_queries=8).to_pandas()
    got = ann_ivfpq(SF, k=5, n_queries=8, n_centroids=16, nprobe=8,
                    refine=8).to_pandas()
    hits = tot = 0
    for qid in bf.query_id.unique():
        want = set(bf[bf.query_id == qid].neighbor_id)
        have = set(got[got.query_id == qid].neighbor_id)
        hits += len(want & have)
        tot += len(want)
    assert hits / tot >= 0.5, hits / tot
    # exact re-rank: overlapping pairs carry identical scores
    m = bf.merge(got, on=["query_id", "neighbor_id"], suffixes=("_bf", "_pq"))
    assert (m["cosine_bf"] == m["cosine_pq"]).all()


# --- decontaminate_embeddings ------------------------------------------------

def test_decontaminate_embeddings_matches_duckdb(ray_session):
    import duckdb

    from humid_ray.pipelines.ann import (
        decontaminate_embeddings, decontaminate_embeddings_sql,
    )

    mine = (decontaminate_embeddings(SF).to_pandas()
            .sort_values("vec_id").reset_index(drop=True))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM "
                f"read_parquet('{SF}/embeddings.parquet')")
    orc = (con.execute(decontaminate_embeddings_sql()).df()
           .sort_values("vec_id").reset_index(drop=True))
    assert mine["vec_id"].tolist() == orc["vec_id"].tolist()
    assert mine["nearest_eval_id"].tolist() == orc["nearest_eval_id"].tolist()
    assert mine["contaminated"].tolist() == orc["contaminated"].tolist()
    # both sides are rounded to 6 (the declared output contract), but a
    # BLAS build with a different FMA/reduction order can flip a value
    # sitting ON the rounding boundary by one quantum — tolerate that
    # single quantum here (ids/flags above stay exact); the bit-wise
    # driver compare remains the hard gate on THIS host's BLAS
    a = mine["max_cosine"].to_numpy()
    b = orc["max_cosine"].to_numpy()
    assert np.allclose(a, b, rtol=0.0, atol=1.0000001e-06), \
        np.abs(a - b).max()


def test_decontaminate_embeddings_chunked_equals_single(ray_session):
    """broadcast_max_eval=1 forces one ray.put chunk PER EVAL ROW (the
    past-the-ceiling path); the running-max fold must reproduce the
    single-matmul output bit-for-bit, ties included."""
    from humid_ray.pipelines.ann import decontaminate_embeddings

    a = (decontaminate_embeddings(SF).to_pandas()
         .sort_values("vec_id").reset_index(drop=True))
    b = (decontaminate_embeddings(SF, broadcast_max_eval=1).to_pandas()
         .sort_values("vec_id").reset_index(drop=True))
    assert a.equals(b)


def test_decontaminate_embeddings_chunked_uneven(ray_session):
    """broadcast_max_eval=2 exercises the streaming chunk builder's
    full-chunk + remainder split (the driver-bounded path that replaced
    the full-matrix concatenation); output must equal the default
    one-chunk path."""
    from humid_ray.pipelines.ann import decontaminate_embeddings

    a = (decontaminate_embeddings(SF).to_pandas()
         .sort_values("vec_id").reset_index(drop=True))
    b = (decontaminate_embeddings(SF, broadcast_max_eval=2).to_pandas()
         .sort_values("vec_id").reset_index(drop=True))
    assert a.equals(b)


def test_decontaminate_embeddings_tie_unsorted_chunks(ray_session, tmp_path):
    """Eval vectors written in DESCENDING id order, two of them exact
    float ties for a train row; with per-row chunks the fold sees the
    larger eval id first and must still report the MIN eval id (the
    tie-aware cross-chunk update)."""
    import pyarrow as pa
    import pyarrow.parquet as pq_

    from humid_ray.pipelines.ann import decontaminate_embeddings

    d = tmp_path / "emb"
    # embeddings.parquet as a DIRECTORY of two files: the id-40 eval
    # row sorts lexicographically first -> its block (and so its chunk)
    # is folded BEFORE the id-20 tie
    (d / "embeddings.parquet").mkdir(parents=True)
    dim = 4
    e = np.zeros(dim); e[0] = 1.0

    def tb(ids, vecs):
        return pa.table({
            "vec_id": pa.array(ids, type=pa.int64()),
            "embedding": pa.array([v.tolist() for v in vecs],
                                  type=pa.list_(pa.float32())),
            "label": pa.array([0] * len(ids), type=pa.int32()),
        })

    pq_.write_table(tb([40], [e]), d / "embeddings.parquet" / "a.parquet")
    pq_.write_table(tb([20, 1], [e, e * 2]),
                    d / "embeddings.parquet" / "b.parquet")
    out = (decontaminate_embeddings(str(d), broadcast_max_eval=1)
           .to_pandas().set_index("vec_id"))
    assert out.loc[1, "nearest_eval_id"] == 20
    assert bool(out.loc[1, "contaminated"])


def test_decontaminate_embeddings_planted(ray_session, tmp_path):
    """A train vector equal to an eval vector must flag contaminated
    with that eval id; an orthogonal one must not."""
    import pyarrow as pa
    import pyarrow.parquet as pq_

    from humid_ray.pipelines.ann import decontaminate_embeddings

    d = tmp_path / "emb"
    d.mkdir()
    dim = 8
    e0 = np.zeros(dim); e0[0] = 1.0          # eval (vec_id 0)
    e20 = np.zeros(dim); e20[1] = 1.0        # eval (vec_id 20)
    t1 = e0 * 3.0                            # train: same direction as 0
    t2 = np.zeros(dim); t2[2] = 1.0          # train: orthogonal
    tbl = pa.table({
        "vec_id": pa.array([0, 20, 1, 2], type=pa.int64()),
        "embedding": pa.array([e0.tolist(), e20.tolist(),
                               t1.tolist(), t2.tolist()],
                              type=pa.list_(pa.float32())),
        "label": pa.array([0, 0, 0, 0], type=pa.int32()),
    })
    pq_.write_table(tbl, d / "embeddings.parquet")
    out = (decontaminate_embeddings(str(d)).to_pandas()
           .sort_values("vec_id").set_index("vec_id"))
    assert len(out) == 2  # eval rows never appear
    assert bool(out.loc[1, "contaminated"])
    assert out.loc[1, "nearest_eval_id"] == 0
    assert out.loc[1, "max_cosine"] == 1.0
    assert not bool(out.loc[2, "contaminated"])


def test_decontaminate_embeddings_no_eval_rows(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq_

    from humid_ray.pipelines.ann import decontaminate_embeddings

    d = tmp_path / "emb2"
    d.mkdir()
    tbl = pa.table({
        "vec_id": pa.array([1, 2, 3], type=pa.int64()),
        "embedding": pa.array([[1.0, 0.0]] * 3, type=pa.list_(pa.float32())),
        "label": pa.array([0, 0, 0], type=pa.int32()),
    })
    pq_.write_table(tbl, d / "embeddings.parquet")
    assert decontaminate_embeddings(str(d)).count() == 0
