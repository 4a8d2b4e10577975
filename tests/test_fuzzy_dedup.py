"""Fuzzy-dedup cluster assignment + decontamination invariants.

The SQL parity of minhash_cluster_docs / minhash_keep_docs /
decontaminate_docs is pinned by test_driver_contract (DuckDB oracles);
these tests pin the structural invariants and the broadcast/join
branch equivalence on the real testdata, plus planted contamination
on a tiny synthetic documents table.
"""

import sys

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

sys.path.insert(0, "/root/repo")

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def clusters(ray_session):
    from humid_ray.pipelines import dedup_text

    return dedup_text.minhash_clusters(SF).to_pandas()


def test_minhash_clusters_cover_every_doc_once(clusters):
    docs = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id"])
    ids = np.sort(docs.column("doc_id").to_numpy())
    got = np.sort(clusters["doc_id"].to_numpy())
    assert np.array_equal(ids, got)


def test_minhash_clusters_label_is_min_member(clusters):
    g = clusters.groupby("cluster_id")["doc_id"].min()
    assert (g.index.to_numpy() == g.to_numpy()).all()


def test_minhash_clusters_sizes_consistent(clusters):
    sizes = clusters.groupby("cluster_id")["doc_id"].count()
    m = clusters.merge(
        sizes.rename("expect"), left_on="cluster_id", right_index=True
    )
    assert (m["cluster_size"] == m["expect"]).all()


def test_minhash_pairs_are_coclustered(ray_session, clusters):
    from humid_ray.pipelines import dedup_text

    pairs = dedup_text.minhash_neardup_pairs(SF).to_pandas()
    label = dict(zip(clusters["doc_id"], clusters["cluster_id"]))
    for a, b in zip(pairs["doc_a"], pairs["doc_b"]):
        assert label[a] == label[b]


def test_minhash_clusters_join_branch_equals_broadcast(ray_session, clusters):
    from humid_ray.pipelines import dedup_text

    joined = dedup_text.minhash_clusters(
        SF, broadcast_max_members=0
    ).to_pandas()
    cols = ["doc_id", "cluster_id", "cluster_size"]
    a = clusters[cols].sort_values(cols).reset_index(drop=True)
    b = joined[cols].sort_values(cols).reset_index(drop=True)
    for c in cols:
        b[c] = b[c].astype(a[c].dtype)
    assert a.equals(b)


def test_minhash_keep_one_rep_per_cluster(ray_session, clusters):
    from humid_ray.pipelines import dedup_text

    keep = dedup_text.minhash_dedup_keep(SF).to_pandas()
    assert len(keep) == clusters["cluster_id"].nunique()
    assert set(keep["doc_id"]) == set(clusters["cluster_id"].unique())
    # kept sizes account for the full corpus
    assert keep["cluster_size"].sum() == len(clusters)


def test_decontaminate_planted(ray_session, tmp_path):
    from humid_ray.pipelines import dedup_text

    bench_text = "alpha beta gamma delta epsilon zeta eta theta"
    tbl = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3], type=pa.int64()),
            "text": pa.array(
                [
                    bench_text,                       # benchmark (id % 20 == 0)
                    bench_text,                       # exact copy -> frac 1.0
                    "unrelated words entirely here",  # no overlap
                    "",                               # zero shingles
                ]
            ),
        }
    )
    pq.write_table(tbl, tmp_path / "documents.parquet")
    out = (
        dedup_text.decontaminate(str(tmp_path))
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert list(out.index) == [1, 2, 3]  # benchmark doc excluded
    assert out.loc[1, "overlap_frac"] == 1.0 and out.loc[1, "contaminated"] == 1
    assert out.loc[2, "n_overlap"] == 0 and out.loc[2, "contaminated"] == 0
    assert out.loc[3, "n_shingles"] == 0 and out.loc[3, "overlap_frac"] == 0.0
    assert out.loc[3, "contaminated"] == 0


def test_curate_docs_composition(ray_session):
    import duckdb

    from humid_ray.pipelines import dedup_text

    kept = dedup_text.curate_docs(SF).to_pandas()
    docs = pq.read_table(f"{SF}/documents.parquet").to_pandas()
    # gates really fire: strictly fewer kept than total, more than zero
    assert 0 < len(kept) < len(docs)
    # no benchmark doc survives
    assert (kept["doc_id"] % 20 != 0).all()
    # every kept doc passes the token gate (DuckDB recomputation)
    con = duckdb.connect()
    con.register("docs", docs)
    toks = con.execute(
        "SELECT doc_id FROM docs WHERE len(regexp_extract_all("
        "lower(coalesce(text,'')), '[0-9a-z]+')) >= 30"
    ).df()
    assert set(kept["doc_id"]) <= set(toks["doc_id"])
    # kept ids are cluster representatives: pairwise-distinct, sizes >= 1
    assert kept["doc_id"].is_unique and (kept["cluster_size"] >= 1).all()


def test_minhash_hot_bucket_bounded(ray_session, tmp_path):
    """A pathological bucket (1k identical docs -> every band key
    shared) must complete with bounded memory (chunked lane compare)
    and emit exactly the full pair set."""
    from humid_ray.pipelines import dedup_text

    n = 1000
    tbl = pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "text": pa.array(["identical text payload repeated verbatim"] * n),
        }
    )
    pq.write_table(tbl, tmp_path / "documents.parquet")
    pairs = dedup_text.minhash_neardup_pairs(str(tmp_path)).to_pandas()
    assert len(pairs) == n * (n - 1) // 2
    assert (pairs["jaccard"] == 1.0).all()
    # and the cluster view collapses them to ONE cluster of size n
    cl = dedup_text.minhash_clusters(str(tmp_path)).to_pandas()
    assert (cl["cluster_id"] == 0).all() and (cl["cluster_size"] == n).all()


def test_minhash_keep_best_invariants(ray_session, clusters):
    """keep_best: one row per cluster; the kept member maximizes
    n_tokens (tie -> min doc_id) among its cluster; the joined
    assignment branch gives identical rows."""
    from humid_ray.pipelines import dedup_text, textstats

    best = dedup_text.minhash_dedup_keep_best(SF).to_pandas()
    assert len(best) == clusters["cluster_id"].nunique()
    assert set(best["cluster_id"]) == set(clusters["cluster_id"].unique())
    assert best["cluster_size"].sum() == len(clusters)
    ntok = textstats.token_counts(SF).to_pandas().set_index("doc_id")[
        "n_tokens"
    ]
    members = clusters.assign(n_tokens=clusters["doc_id"].map(ntok))
    for _, row in best.sample(n=min(len(best), 50), random_state=7).iterrows():
        grp = members[members["cluster_id"] == row["cluster_id"]]
        top = grp.sort_values(["n_tokens", "doc_id"],
                              ascending=[False, True]).iloc[0]
        assert row["doc_id"] == top["doc_id"]
        assert row["n_tokens"] == top["n_tokens"]
    joined = dedup_text.minhash_dedup_keep_best(
        SF, broadcast_max_members=0
    ).to_pandas()
    cols = ["doc_id", "cluster_id", "cluster_size", "n_tokens"]
    a = best[cols].sort_values(cols).reset_index(drop=True)
    b = joined[cols].sort_values(cols).reset_index(drop=True)
    for c in cols:
        b[c] = b[c].astype(a[c].dtype)
    assert a.equals(b)


def test_unigram_logprob_invariants(ray_session):
    """Self-trained unigram LM scores: every doc covered once,
    zero-token docs score 0, non-trivial docs score strictly negative
    (every unigram prob < 1 on a multi-token corpus), and docs made of
    more-frequent tokens score higher."""
    from humid_ray.pipelines import textstats

    lp = textstats.unigram_logprob(SF).to_pandas()
    docs = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id"])
    assert sorted(lp["doc_id"]) == sorted(docs.column("doc_id").to_pylist())
    zero = lp[lp["n_tokens"] == 0]
    assert (zero["avg_logprob"] == 0).all()
    assert (zero["logprob_micro"] == 0).all()
    nz = lp[lp["n_tokens"] > 0]
    assert (nz["avg_logprob"] < 0).all()
    # avg is the quantized sum divided by n (engine-side rounding rule)
    recon = (nz["logprob_micro"] / nz["n_tokens"]) / 1e6
    assert np.allclose(nz["avg_logprob"], recon, atol=5e-7)


def test_tiered_dedup_report_funnel(ray_session):
    """The tier funnel is internally consistent and each tier's count
    matches the independently-computed pandas value: tier 1 = distinct
    texts, tier 2 = number of MinHash clusters among the exact
    representatives."""
    from humid_ray.pipelines import dedup_text

    rep = dedup_text.tiered_dedup_report(SF).to_pandas()
    rep = rep.sort_values("tier").reset_index(drop=True)
    assert list(rep["name"]) == ["total", "exact", "minhash"]
    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas()
    assert rep.loc[0, "survivors"] == len(docs)
    assert rep.loc[0, "removed"] == 0
    n_exact = docs.groupby("text", dropna=False)["doc_id"].min().size
    assert rep.loc[1, "survivors"] == n_exact
    # survivors monotone non-increasing; removed telescopes
    s = rep["survivors"].to_numpy()
    assert (s[:-1] >= s[1:]).all()
    assert (rep["removed"].to_numpy()[1:] == s[:-1] - s[1:]).all()
    # tier 2 equals the cluster count of minhash over the exact reps
    reps = docs.loc[docs.groupby("text", dropna=False)["doc_id"]
                    .idxmin()].reset_index(drop=True)
    import ray

    reps_ds = ray.data.from_pandas(reps[["doc_id", "text"]])
    cl = dedup_text.minhash_clusters_over(reps_ds).to_pandas()
    assert rep.loc[2, "survivors"] == cl["cluster_id"].nunique()


def test_minhash_keep_best_empty_corpus(ray_session, tmp_path):
    """An empty documents table yields the TYPED empty keep list (a
    bare groupby on nothing would drop the schema)."""
    from humid_ray.pipelines import dedup_text

    tbl = pa.table(
        {
            "doc_id": pa.array([], type=pa.int64()),
            "text": pa.array([], type=pa.string()),
        }
    )
    pq.write_table(tbl, tmp_path / "documents.parquet")
    out = dedup_text.minhash_dedup_keep_best(str(tmp_path))
    assert out.count() == 0
    assert out.schema().names == ["doc_id", "cluster_id", "cluster_size",
                                  "n_tokens"]


def test_incremental_minhash_dedup_planted(ray_session, tmp_path):
    """Fuzzy incremental dedup: a NEW doc that is a near-copy (one
    token changed) of a BASE doc must be flagged with that base doc as
    its rep; novel new docs come back null; base docs never appear in
    the output. Pinned against the MinHash-in-SQL oracle."""
    import duckdb

    from humid_ray.pipelines import dedup_text
    from humid_ray.util import splitmix64

    ids = np.arange(1, 401, dtype=np.int64)
    is_new = (splitmix64(ids.view(np.uint64)) % np.uint64(100)) < 20
    new_ids = ids[is_new]
    base_ids = ids[~is_new]
    assert len(new_ids) >= 10 and len(base_ids) >= 10
    # every base doc is 30 UNIQUE tokens (no shared template), so a
    # near-copy can only match its own source and the 29/31 shingle
    # overlap makes both the banding hit and the >= 0.5 estimate
    # deterministic (seeded permutations, no test-time randomness)
    base_text = {
        int(b): " ".join(f"w{i}x{j}" for j in range(30))
        for i, b in enumerate(base_ids)
    }
    texts = {}
    planted = {}
    for j, nid in enumerate(new_ids):
        if j < 5:  # near-copy of base_ids[j]: mutate ONE middle token
            src = int(base_ids[j])
            planted[int(nid)] = src
            texts[int(nid)] = base_text[src].replace(f"w{j}x15", "changed")
        else:
            texts[int(nid)] = " ".join(f"n{j}y{t}" for t in range(12))
    texts.update(base_text)
    tbl = pa.table(
        {
            "doc_id": pa.array(ids),
            "text": pa.array([texts[int(i)] for i in ids],
                             type=pa.string()),
        }
    )
    pq.write_table(tbl, tmp_path / "documents.parquet")
    out = dedup_text.incremental_minhash_dedup(
        str(tmp_path), threshold=0.5
    ).to_pandas().set_index("doc_id")
    assert sorted(out.index) == sorted(new_ids.tolist())
    for nid, src in planted.items():
        assert bool(out.loc[nid, "is_dup"]), nid
        assert out.loc[nid, "base_rep"] == src
        assert out.loc[nid, "jaccard"] >= 0.5
    novel = out.drop(planted.keys())
    assert not novel["is_dup"].any()
    assert novel["base_rep"].isna().all()
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet')"
    )
    want = (con.execute(
        dedup_text.incremental_minhash_dedup_sql(threshold=0.5)
    ).df().set_index("doc_id").sort_index())
    got = out.sort_index()
    assert (got["is_dup"] == want["is_dup"]).all()
    gr, wr = got["base_rep"], want["base_rep"]
    assert (gr.isna() == wr.isna()).all()
    assert (gr.dropna() == wr.dropna()).all()


def test_incremental_minhash_dedup_no_dups(ray_session, tmp_path):
    """The common production case — a mostly/entirely NOVEL shard —
    must not crash the join-back (an empty or tiny reps side once
    aborted acero with partition counts keyed to the new-side rows):
    every new doc comes back novel with null rep/jaccard."""
    from humid_ray.pipelines import dedup_text
    from humid_ray.util import splitmix64

    ids = np.arange(1, 1001, dtype=np.int64)
    tbl = pa.table(
        {
            "doc_id": pa.array(ids),
            "text": pa.array(
                [" ".join(f"u{i}t{j}" for j in range(10)) for i in ids],
                type=pa.string(),
            ),
        }
    )
    pq.write_table(tbl, tmp_path / "documents.parquet")
    out = dedup_text.incremental_minhash_dedup(str(tmp_path)).to_pandas()
    n_new = int(((splitmix64(ids.view(np.uint64)) % np.uint64(100)) < 20)
                .sum())
    assert len(out) == n_new
    assert not out["is_dup"].any()
    assert out["base_rep"].isna().all()
    assert out["jaccard"].isna().all()


def test_cluster_safe_split_docs_leakage_free(ray_session, clusters):
    from humid_ray.pipelines import dedup_text
    from humid_ray.util import int64_to_uint64, splitmix64

    out = dedup_text.cluster_safe_split_docs(SF).to_pandas()
    assert len(out) == len(clusters)
    assert set(out.split) <= {"train", "val", "test"}
    m = out.merge(clusters[["doc_id", "cluster_id"]], on="doc_id")
    # one split per cluster — no near-dup straddles a boundary
    assert (m.groupby("cluster_id")["split"].nunique() == 1).all()
    # bucket chain parity with util.splitmix64
    cid = m["cluster_id"].to_numpy()
    b = (splitmix64(int64_to_uint64(cid)) % np.uint64(100)).astype(int)
    want = np.where(b < 10, "test", np.where(b < 20, "val", "train"))
    assert (m["split"].to_numpy() == want).all()


def test_dedup_sample_weights_docs_parity(ray_session, clusters):
    from humid_ray.pipelines import dedup_text
    from humid_ray.util import round_half_away

    out = dedup_text.dedup_sample_weights_docs(SF).to_pandas()
    m = out.merge(clusters[["doc_id", "cluster_size"]], on="doc_id",
                  suffixes=("", "_want"))
    assert (m["cluster_size"] == m["cluster_size_want"]).all()
    want_w = round_half_away(1.0 / m["cluster_size"].to_numpy())
    assert (m["weight"].to_numpy() == want_w).all()


def test_split_and_weights_docs_match_duckdb(ray_session):
    import duckdb

    from humid_ray.pipelines import dedup_text

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF}/documents.parquet')"
    )
    mine = (dedup_text.cluster_safe_split_docs(SF).to_pandas()
            .sort_values("doc_id").reset_index(drop=True))
    orc = (con.execute(dedup_text.cluster_safe_split_docs_sql()).df()
           .sort_values("doc_id").reset_index(drop=True))
    assert mine.doc_id.tolist() == orc.doc_id.tolist()
    assert mine.split.tolist() == orc.split.tolist()

    mine_w = (dedup_text.dedup_sample_weights_docs(SF).to_pandas()
              .sort_values("doc_id").reset_index(drop=True))
    orc_w = (con.execute(dedup_text.dedup_sample_weights_docs_sql()).df()
             .sort_values("doc_id").reset_index(drop=True))
    assert mine_w.cluster_size.tolist() == orc_w.cluster_size.tolist()
    assert mine_w.weight.tolist() == orc_w.weight.tolist()


# --- fused_dedup_docs (multi-evidence) --------------------------------------

def _docs_table(tmp_path, texts, name="fdocs"):
    d = tmp_path / name
    d.mkdir()
    tbl = pa.table({
        "doc_id": pa.array(range(len(texts)), type=pa.int64()),
        "text": pa.array(texts, type=pa.string()),
        "source": pa.array(["s"] * len(texts), type=pa.string()),
    })
    pq.write_table(tbl, d / "documents.parquet")
    return str(d)


FUSED_DOC_TEXTS = [
    "the cat sat on the mat and looked at the dog",       # 0 exact pair
    "the cat sat on the mat and looked at the dog",       # 1 with 0
    "the cat sat on the mat and gazed at the dog",        # 2 near of 0/1
    "completely different content about quantum physics", # 3 isolated
    "",                                                   # 4 empty pair
    None,                                                 # 5 NULL == empty
    "unique singleton document body here",                # 6 isolated
]


def test_fused_dedup_docs_planted(ray_session, tmp_path):
    from humid_ray.pipelines.dedup_text import fused_dedup_docs

    d = _docs_table(tmp_path, FUSED_DOC_TEXTS)
    out = (fused_dedup_docs(d).to_pandas()
           .sort_values("doc_id").set_index("doc_id"))
    assert len(out) == 7
    # exact pair 0-1 fuses; empty/null pair 4-5 fuses via exact tier
    assert out.loc[1, "cluster_rep"] == 0
    assert out.loc[0, "ev_exact"] and out.loc[1, "ev_exact"]
    assert out.loc[5, "cluster_rep"] == 4
    assert out.loc[4, "ev_exact"]
    # isolated docs are their own singleton reps with no evidence
    assert out.loc[3, "cluster_rep"] == 3
    assert not out.loc[3, ["ev_exact", "ev_minhash", "ev_simhash"]].any()
    assert out.loc[6, "keep"]
    # exactly one keep per cluster_rep value
    assert out.groupby("cluster_rep")["keep"].sum().eq(1).all()


def test_fused_dedup_docs_matches_duckdb(ray_session, tmp_path):
    import duckdb

    from humid_ray.oracles import fused_dedup_docs_sql
    from humid_ray.pipelines.dedup_text import fused_dedup_docs

    d = _docs_table(tmp_path, FUSED_DOC_TEXTS, name="fdocs2")
    mine = (fused_dedup_docs(d).to_pandas()
            .sort_values("doc_id").reset_index(drop=True))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{d}/documents.parquet')")
    orc = (con.execute(fused_dedup_docs_sql()).df()
           .sort_values("doc_id").reset_index(drop=True))
    for col in ("doc_id", "cluster_rep", "keep",
                "ev_exact", "ev_minhash", "ev_simhash"):
        assert mine[col].tolist() == orc[col].tolist(), col


def test_fused_dedup_docs_randomized_vs_duckdb(ray_session, tmp_path):
    """Randomized corpus built from a small phrase pool so every tier
    fires: exact repeats, one-word edits (minhash/simhash near-dups),
    and cross-tier chains the planted case can't reach."""
    import duckdb

    from humid_ray.oracles import fused_dedup_docs_sql
    from humid_ray.pipelines.dedup_text import fused_dedup_docs

    rng = np.random.default_rng(29)
    base = [
        "alpha beta gamma delta epsilon zeta eta theta",
        "one two three four five six seven eight nine ten",
        "the quick brown fox jumps over the lazy dog",
    ]
    words = ["red", "blue", "green"]
    texts = []
    for _ in range(60):
        r = rng.random()
        b = base[int(rng.integers(0, len(base)))]
        if r < 0.4:
            texts.append(b)                      # exact repeat
        elif r < 0.8:
            toks = b.split()
            toks[int(rng.integers(0, len(toks)))] = \
                words[int(rng.integers(0, len(words)))]
            texts.append(" ".join(toks))         # one-word edit
        else:
            texts.append(f"unique {rng.integers(0, 1 << 30)} filler")
    d = _docs_table(tmp_path, texts, name="fdocsr")
    mine = (fused_dedup_docs(d).to_pandas()
            .sort_values("doc_id").reset_index(drop=True))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{d}/documents.parquet')")
    orc = (con.execute(fused_dedup_docs_sql()).df()
           .sort_values("doc_id").reset_index(drop=True))
    for col in ("doc_id", "cluster_rep", "keep",
                "ev_exact", "ev_minhash", "ev_simhash"):
        assert mine[col].tolist() == orc[col].tolist(), col


def test_fused_dedup_docs_join_branch_equal(ray_session, tmp_path):
    """broadcast_max_labels=0 forces the distributed label-join path
    (and the per-tier evidence semi-joins); output must equal the
    broadcast path byte-for-byte."""
    from humid_ray.pipelines.dedup_text import fused_dedup_docs

    d = _docs_table(tmp_path, FUSED_DOC_TEXTS, name="fdocsj")
    a = (fused_dedup_docs(d).to_pandas()
         .sort_values("doc_id").reset_index(drop=True))
    b = (fused_dedup_docs(d, broadcast_max_labels=0).to_pandas()
         .sort_values("doc_id").reset_index(drop=True))
    for col in ("doc_id", "cluster_rep", "keep",
                "ev_exact", "ev_minhash", "ev_simhash"):
        assert a[col].tolist() == b[col].tolist(), col
