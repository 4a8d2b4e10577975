"""Brute-force parity checks for the round-3 curation operators:
stratified sampling, mixture rebalancing, quantile band filtering,
and incremental (new-vs-base) exact dedup. Oracle parity at sf0.01 is
covered by the driver contract; these pin semantics against plain
python/numpy over sf0.001."""

import math

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _docs():
    return pq.read_table(f"{SF}/documents.parquet").to_pandas()


def _sm64(x: np.ndarray) -> np.ndarray:
    from humid_ray.util import UINT64, splitmix64

    return splitmix64(np.asarray(x, dtype=np.int64).view(UINT64))


def test_stratified_sample_bottom_k_by_hash(ray_session):
    from humid_ray.pipelines.sampling import stratified_sample

    k = 5
    out = (stratified_sample(SF, k=k).to_pandas()
           .sort_values(["lang", "doc_id"]).reset_index(drop=True))
    docs = _docs()
    docs["h"] = _sm64(docs.doc_id.to_numpy())
    expect = (
        docs.sort_values(["lang", "h", "doc_id"])
        .groupby("lang").head(k)[["lang", "doc_id"]]
        .sort_values(["lang", "doc_id"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out, expect, check_dtype=False)
    assert (out.groupby("lang").size() <= k).all()


def test_mixture_rebalance_near_uniform(ray_session):
    from humid_ray.pipelines.sampling import mixture_rebalance

    n_buckets = 1000
    out = mixture_rebalance(SF, n_buckets=n_buckets).to_pandas()
    docs = _docs()
    cnt = docs.groupby("lang").size()
    mn = int(cnt.min())
    rate = {l: (mn * n_buckets) // int(c) for l, c in cnt.items()}
    b = _sm64(docs.doc_id.to_numpy()) % n_buckets
    keep = b < docs.lang.map(rate).to_numpy()
    assert set(out.doc_id) == set(docs.loc[keep, "doc_id"])
    # every language's surviving slice is within sampling noise of mn
    kept = out.groupby("lang").size()
    for l, n in kept.items():
        assert n <= cnt[l]
        # expected ~ rate/1000 * cnt ~= mn (generous band: hash noise)
        assert abs(n - mn) <= max(10, mn)


def test_quantile_filter_band(ray_session):
    from humid_ray.pipelines.textstats import quantile_filter

    lo, hi = 0.05, 0.95
    out = quantile_filter(SF, lo=lo, hi=hi).to_pandas()
    docs = _docs()
    expect_ids = set()
    for lang, g in docs.groupby("lang"):
        ln = np.sort(g.n_chars.to_numpy())
        n = len(ln)
        ql = int(ln[math.ceil(lo * n) - 1])
        qh = int(ln[math.ceil(hi * n) - 1])
        expect_ids |= set(
            g.loc[(g.n_chars >= ql) & (g.n_chars <= qh), "doc_id"]
        )
    assert set(out.doc_id) == expect_ids
    assert list(out.columns) == ["doc_id", "lang", "n_chars"]


def test_incremental_dedup_vs_pandas(ray_session):
    from humid_ray.pipelines.dedup_text import incremental_exact_dedup

    new_pct, n_buckets = 20, 100
    out = (incremental_exact_dedup(SF, new_pct=new_pct,
                                   n_buckets=n_buckets).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    docs = _docs()
    b = _sm64(docs.doc_id.to_numpy()) % n_buckets
    is_new = b < new_pct
    base = docs.loc[~is_new].groupby("text").doc_id.min()
    new = docs.loc[is_new].copy()
    new["base_rep"] = new.text.map(base)
    new["is_dup"] = new.base_rep.notna()
    expect = (new[["doc_id", "is_dup", "base_rep"]]
              .sort_values("doc_id").reset_index(drop=True))
    assert out.doc_id.tolist() == expect.doc_id.tolist()
    assert out.is_dup.tolist() == expect.is_dup.tolist()
    got_rep = out.base_rep.fillna(-1).astype("int64").tolist()
    exp_rep = expect.base_rep.fillna(-1).astype("int64").tolist()
    assert got_rep == exp_rep
    assert (~out.is_dup).any()


def test_incremental_dedup_planted_dups(ray_session, tmp_path):
    """Planted corpus where some NEW docs repeat BASE texts: dup rows
    point at the smallest base doc_id holding the text."""
    import pyarrow as pa

    from humid_ray.pipelines.dedup_text import incremental_exact_dedup
    from humid_ray.util import UINT64, splitmix64

    n = 400
    ids = np.arange(n, dtype=np.int64)
    b = splitmix64(ids.view(UINT64)) % 100
    is_new = b < 20
    # 16 shared texts: every doc (base or new) with id % 25 == k < 16
    # carries text "shared k"; the rest are unique
    texts = [
        f"shared {i % 25}" if i % 25 < 16 else f"unique text {i}"
        for i in range(n)
    ]
    pq.write_table(
        pa.table({
            "doc_id": pa.array(ids),
            "text": pa.array(texts, type=pa.string()),
            "lang": pa.array(["en"] * n, type=pa.string()),
            "source": pa.array(["s"] * n, type=pa.string()),
            "n_chars": pa.array([len(t) for t in texts], type=pa.int64()),
        }),
        tmp_path / "documents.parquet",
    )
    out = (incremental_exact_dedup(str(tmp_path)).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    df = pd.DataFrame({"doc_id": ids, "text": texts, "is_new": is_new})
    base_min = df.loc[~df.is_new].groupby("text").doc_id.min()
    new = df.loc[df.is_new].copy()
    new["base_rep"] = new.text.map(base_min)
    assert out.doc_id.tolist() == new.doc_id.tolist()
    assert out.is_dup.tolist() == new.base_rep.notna().tolist()
    assert (out.base_rep.fillna(-1).astype("int64").tolist()
            == new.base_rep.fillna(-1).astype("int64").tolist())
    # both classes genuinely present
    assert out.is_dup.any() and (~out.is_dup).any()
    # the Bloom-prefiltered path agrees on a dup-positive corpus too
    from humid_ray.pipelines.dedup_text import incremental_dedup_bloom

    out_b = (incremental_dedup_bloom(str(tmp_path)).to_pandas()
             .sort_values("doc_id").reset_index(drop=True))
    assert out.equals(out_b)


def test_zscore_lengths_vs_numpy(ray_session):
    from humid_ray.pipelines.textstats import zscore_lengths
    from humid_ray.util import round_half_away

    out = (zscore_lengths(SF).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    docs = _docs().sort_values("doc_id").reset_index(drop=True)
    for lang, g in docs.groupby("lang"):
        x = g.n_chars.to_numpy().astype(np.int64)
        n = np.float64(len(x))
        mean = np.float64(x.sum()) / n
        var = np.float64((x * x).sum()) / n - mean * mean
        std = np.sqrt(var) if var > 0 else 0.0
        z = (x - mean) / std if std > 0 else np.zeros(len(x))
        got = out.loc[out.lang == lang].sort_values("doc_id").z.to_numpy()
        assert np.array_equal(got, round_half_away(z, 6))
    # normalized: per-lang mean ~ 0, std ~ 1
    assert abs(out.z.mean()) < 0.01


def test_length_deciles_exact_integer(ray_session):
    from humid_ray.pipelines.textstats import length_deciles

    out = (length_deciles(SF).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    docs = _docs()
    for lang, g in docs.groupby("lang"):
        x = np.sort(g.n_chars.to_numpy())
        n = len(x)
        for _, row in out.loc[out.lang == lang].iterrows():
            cle = int((x <= row.n_chars).sum())
            assert row.decile == (10 * cle + n - 1) // n
    assert set(out.decile) <= set(range(1, 11))
    assert out.decile.max() == 10


def test_tfidf_top_terms_vs_python(ray_session):
    import math
    import re
    from collections import Counter

    from humid_ray.pipelines.textstats import tfidf_top_terms

    k = 3
    out = (tfidf_top_terms(SF, k=k).to_pandas()
           .sort_values(["doc_id", "rank"]).reset_index(drop=True))
    docs = _docs()
    tok = {
        r.doc_id: re.findall(r"[0-9a-z]+", (r.text or "").lower())
        for r in docs.itertuples()
    }
    df = Counter()
    for ts in tok.values():
        df.update(set(ts))
    n = float(len(docs))
    expect = []
    for doc_id, ts in sorted(tok.items()):
        if not ts:
            continue
        tf = Counter(ts)
        scored = sorted(
            ((t, c * math.log(n / df[t])) for t, c in tf.items()),
            key=lambda p: (-p[1], p[0]),
        )[:k]
        for i, (t, s) in enumerate(scored):
            expect.append((doc_id, t, i + 1))
    assert list(zip(out.doc_id, out.token, out["rank"])) == expect


def test_inverted_index_vs_python(ray_session):
    import re
    from collections import defaultdict

    from humid_ray.pipelines.textstats import inverted_index

    max_df = 50
    out = (inverted_index(SF, max_df=max_df).to_pandas()
           .sort_values(["token", "doc_id"]).reset_index(drop=True))
    docs = _docs()
    posting = defaultdict(set)
    for r in docs.itertuples():
        for t in set(re.findall(r"[0-9a-z]+", (r.text or "").lower())):
            posting[t].add(r.doc_id)
    expect = sorted(
        (t, d) for t, ds in posting.items() if len(ds) <= max_df for d in ds
    )
    assert list(zip(out.token, out.doc_id)) == expect
    # the head exclusion actually dropped something at this corpus size
    assert any(len(ds) > max_df for ds in posting.values())


def test_incremental_bloom_equals_join_path(ray_session):
    """The Bloom-prefiltered variant must be byte-identical to the
    join-only path (the exact join is the backstop; Bloom FPs cannot
    leak and Bloom has no false negatives)."""
    from humid_ray.pipelines.dedup_text import (
        incremental_dedup_bloom,
        incremental_exact_dedup,
    )

    sf = "/root/testdata/sf0.001"
    a = (incremental_exact_dedup(sf).to_pandas()
         .sort_values("doc_id").reset_index(drop=True))
    b = (incremental_dedup_bloom(sf).to_pandas()
         .sort_values("doc_id").reset_index(drop=True))
    assert a.equals(b)
    # (cross-side dups at this sf may be zero; dup-positive coverage is
    # the planted-corpus test below and the sf0.01 oracle row)


def test_incremental_bloom_tiny_filter_still_exact(ray_session):
    """Force a saturated Bloom (1 bit/key -> most lookups positive):
    output must STILL equal the join path — FPs only cost join volume."""
    from humid_ray.pipelines.dedup_text import (
        incremental_dedup_bloom,
        incremental_exact_dedup,
    )

    sf = "/root/testdata/sf0.001"
    a = (incremental_exact_dedup(sf).to_pandas()
         .sort_values("doc_id").reset_index(drop=True))
    b = (incremental_dedup_bloom(sf, bits_per_key=1, n_hashes=1).to_pandas()
         .sort_values("doc_id").reset_index(drop=True))
    assert a.equals(b)


def test_weighted_sample_matches_bruteforce(ray_session):
    """The engine's distributed bottom-k equals the single-machine
    integer priority draw, and heavier docs are favored."""
    import pyarrow.parquet as pq

    from humid_ray.pipelines.sampling import weighted_sample
    from humid_ray.util import UINT64, splitmix64

    sf = "/root/testdata/sf0.001"
    k = 50
    t = pq.read_table(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    doc = t.column("doc_id").to_numpy(zero_copy_only=False)
    w = np.maximum(
        np.array([len(s) if s is not None else 0
                  for s in t.column("text").to_pylist()], dtype=np.int64), 1)
    pr = splitmix64(doc.astype(np.int64).view(UINT64)) // w.astype(UINT64)
    pr_i = (pr ^ UINT64(1 << 63)).view(np.int64)
    order = np.lexsort((doc, pr_i))[:k]
    expect = sorted(zip(pr_i[order].tolist(), doc[order].tolist()))

    got = (weighted_sample(sf, k=k).to_pandas()
           .sort_values(["priority", "doc_id"]).reset_index(drop=True))
    assert list(zip(got.priority, got.doc_id)) == expect
    # weighting sanity: the sample skews heavier than the corpus
    assert got.weight.mean() > w.mean()


def test_cms_overestimates_never_under(ray_session):
    """CMS guarantee: estimate >= exact count for every probe; exact
    counts agree with a Python Counter re-count."""
    import collections
    import re

    import pyarrow.parquet as pq

    from humid_ray.pipelines.textstats import cms_token_freq

    sf = "/root/testdata/sf0.001"
    got = cms_token_freq(sf, k=15).to_pandas()
    assert len(got) == 15
    assert (got.cms_count >= got.exact_count).all()

    texts = pq.read_table(f"{sf}/documents.parquet", columns=["text"]) \
        .column("text").to_pylist()
    cnt = collections.Counter(
        tok for s in texts for tok in re.findall(r"[0-9a-z]+", (s or "").lower())
    )
    for r in got.itertuples():
        assert cnt[r.token] == r.exact_count
    # top-k cut is the true top-k by (count desc, token asc)
    expect = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:15]
    assert sorted(got.token) == sorted(t for t, _ in expect)


def test_cms_tiny_sketch_still_sound(ray_session):
    """A deliberately under-sized sketch (2^4 counters, heavy
    collisions) must still never under-estimate."""
    from humid_ray.pipelines.textstats import cms_token_freq

    got = cms_token_freq("/root/testdata/sf0.001", k=10, w_bits=4, d=2) \
        .to_pandas()
    assert (got.cms_count >= got.exact_count).all()
    # collisions at 16 counters are certain for a ~100-token vocab
    assert (got.cms_count > got.exact_count).any()


def test_dup_rate_by_source_planted(ray_session, tmp_path):
    """Planted cross-source duplicates are attributed to EVERY source
    holding a copy; unique texts count only toward n_docs."""
    import pyarrow as pa

    t = pa.table(
        {"doc_id": pa.array(range(6), type=pa.int64()),
         "text": pa.array(["same", "same", "same", "solo a", "solo b",
                           "also same twice"]),
         "lang": pa.array(["en"] * 6),
         "source": pa.array(["feed1", "feed1", "feed2", "feed1", "feed2",
                             "feed3"]),
         "n_chars": pa.array([4, 4, 4, 6, 6, 15], type=pa.int64())}
    )
    pq.write_table(t, tmp_path / "documents.parquet")
    from humid_ray.pipelines.dedup_text import dup_rate_by_source

    got = (dup_rate_by_source(str(tmp_path)).to_pandas()
           .sort_values("source").reset_index(drop=True))
    assert got.source.tolist() == ["feed1", "feed2", "feed3"]
    assert got.n_docs.tolist() == [3, 2, 1]
    # feed1: two "same" copies are dups; feed2's single copy is a dup
    # because OTHER sources hold it; feed3's text is globally unique
    assert got.n_dup_docs.tolist() == [2, 1, 0]


def test_dup_rate_by_source_null_text(ray_session, tmp_path):
    """NULL texts normalize to '' on both sides (engine would
    otherwise crash in the sort shuffle; the oracle would drop the
    rows via null-inequality)."""
    import duckdb
    import pyarrow as pa

    t = pa.table(
        {"doc_id": pa.array(range(4), type=pa.int64()),
         "text": pa.array([None, None, "x", None], type=pa.string()),
         "lang": pa.array(["en"] * 4),
         "source": pa.array(["a", "b", "a", None]),
         "n_chars": pa.array([0, 0, 1, 0], type=pa.int64())}
    )
    pq.write_table(t, tmp_path / "documents.parquet")
    from humid_ray.pipelines.dedup_text import (
        dup_rate_by_source,
        dup_rate_by_source_sql,
    )

    got = (dup_rate_by_source(str(tmp_path)).to_pandas()
           .sort_values("source").reset_index(drop=True))
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{tmp_path}/documents.parquet')")
    exp = (con.sql(dup_rate_by_source_sql()).df()
           .sort_values("source").reset_index(drop=True))
    assert got.equals(exp)
    # the three ''-text docs count as mutual dups across sources
    assert int(got.n_dup_docs.sum()) == 3
