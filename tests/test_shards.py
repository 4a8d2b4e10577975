"""Shard packing (distributed prefix-sum) + vocabulary operators."""

import re

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _write_docs(tmp_path, texts, ids=None):
    ids = ids if ids is not None else list(range(len(texts)))
    pq.write_table(
        pa.table({"doc_id": pa.array(ids, type=pa.int64()),
                  "text": pa.array(texts, type=pa.string())}),
        str(tmp_path / "documents.parquet"),
    )
    return str(tmp_path)


def _brute_shards(texts, ids, capacity):
    order = np.argsort(ids, kind="stable")
    cum = 0
    out = {}
    for i in order:
        n = len(re.findall(r"[0-9a-z]+", (texts[i] or "").lower()))
        out[ids[i]] = (n, cum // capacity)
        cum += n
    return out


def test_pack_shards_matches_serial_scan(ray_session, tmp_path):
    from humid_ray.pipelines.shards import pack_shards

    texts = [f"word " * (i % 7 + 1) + f"tail{i}" for i in range(200)]
    # shuffled, non-dense ids: packing order is doc_id, not row order
    ids = [((i * 37) % 200) * 10 + 3 for i in range(200)]
    sf = _write_docs(tmp_path, texts, ids)
    got = pack_shards(sf, capacity=16, n_buckets=8).to_pandas()
    want = _brute_shards(texts, np.array(ids), 16)
    assert len(got) == 200
    for row in got.itertuples():
        n, s = want[row.doc_id]
        assert (row.n_tokens, row.shard_id) == (n, s), row.doc_id


def test_pack_shards_bucket_count_invariant(ray_session, tmp_path):
    """Same assignment no matter how many range buckets split the
    scan (the distributed result may not depend on partitioning)."""
    from humid_ray.pipelines.shards import pack_shards

    texts = [f"a b c d e f g"[: 2 * (i % 6 + 1)] for i in range(60)]
    sf = _write_docs(tmp_path, texts)
    a = pack_shards(sf, capacity=8, n_buckets=1).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    b = pack_shards(sf, capacity=8, n_buckets=13).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b)


def test_pack_shards_oversized_doc_owns_start_shard(ray_session, tmp_path):
    from humid_ray.pipelines.shards import pack_shards

    sf = _write_docs(tmp_path, ["x " * 50, "y", "z"])  # 50 tokens > cap 8
    got = pack_shards(sf, capacity=8, n_buckets=4).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert got.shard_id.tolist() == [0, 50 // 8, 51 // 8]


def test_shard_manifest_totals(ray_session, tmp_path):
    from humid_ray.pipelines.shards import pack_shards, shard_manifest

    texts = [f"one two three four"[: 3 * (i % 5 + 1)] for i in range(40)]
    sf = _write_docs(tmp_path, texts)
    man = shard_manifest(sf, capacity=8).to_pandas()
    packed = pack_shards(sf, capacity=8).to_pandas()
    assert man.n_docs.sum() == 40
    assert man.n_tokens.sum() == packed.n_tokens.sum()
    ref = packed.groupby("shard_id").n_tokens.sum()
    for row in man.itertuples():
        assert ref[row.shard_id] == row.n_tokens


def test_vocab_matches_python(ray_session):
    from humid_ray.pipelines.textstats import vocab

    got = vocab(SF).to_pandas().set_index("token")
    docs = pq.read_table(f"{SF}/documents.parquet").to_pandas()
    occ: dict[str, int] = {}
    df: dict[str, int] = {}
    for _, row in docs.iterrows():
        toks = re.findall(r"[0-9a-z]+", (row.text or "").lower())
        for t in toks:
            occ[t] = occ.get(t, 0) + 1
        for t in set(toks):
            df[t] = df.get(t, 0) + 1
    assert len(got) == len(occ)
    for t in list(occ)[:200]:
        assert got.loc[t].n_occurrences == occ[t]
        assert got.loc[t].n_docs == df[t]


def test_vocab_empty_and_null_texts(ray_session, tmp_path):
    from humid_ray.pipelines.textstats import vocab

    sf = _write_docs(tmp_path, ["", None, "a a b", "  ...  "])
    got = vocab(sf).to_pandas().set_index("token")
    assert sorted(got.index) == ["a", "b"]
    assert got.loc["a"].n_occurrences == 2 and got.loc["a"].n_docs == 1


def test_global_shuffle_is_permutation_and_stable(ray_session, tmp_path):
    from humid_ray.pipelines.shards import global_shuffle

    ids = [i * 7 + 1 for i in range(300)]
    sf = _write_docs(tmp_path, ["x"] * 300, ids)
    a = global_shuffle(sf, n_buckets=1).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    b = global_shuffle(sf, n_buckets=17).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    # ranks are a permutation of 1..n and independent of partitioning
    assert sorted(a["rank"]) == list(range(1, 301))
    assert a.equals(b)
    # matches the serial rule: ascending (splitmix64(doc_id), doc_id)
    from humid_ray.util import UINT64, splitmix64

    h = splitmix64(np.array(ids, dtype=np.int64).view(UINT64))
    order = np.lexsort((np.array(ids), h))
    want = {int(np.array(ids)[order][r]): r + 1 for r in range(300)}
    for row in a.itertuples():
        assert want[row.doc_id] == row.rank


def test_rank_by_length_matches_sql_and_bucket_invariant(ray_session):
    """Global ORDER BY rank equals the SQL window; identical at any
    bucket count (the parallelism-invariance property of the scan)."""
    import duckdb

    from humid_ray.pipelines.shards import rank_by_length, rank_by_length_sql

    sf = "/root/testdata/sf0.001"
    got = (rank_by_length(sf).to_pandas()
           .sort_values("rank").reset_index(drop=True))
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{sf}/documents.parquet')")
    exp = (con.sql(rank_by_length_sql()).df()
           .sort_values("rank").reset_index(drop=True))
    assert got.equals(exp)
    # rank 1 is a longest doc; ranks are a permutation
    assert got.n_chars.iloc[0] == got.n_chars.max()
    assert sorted(got["rank"]) == list(range(1, len(got) + 1))
    few = (rank_by_length(sf, n_buckets=3).to_pandas()
           .sort_values("rank").reset_index(drop=True))
    assert few.equals(got)
