"""Text-analysis + text-dedup operator checks on sf0.001 documents."""

import numpy as np
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def test_token_counts_match_python(ray_session):
    import re

    from humid_ray.pipelines.textstats import token_counts

    res = token_counts(SF).to_pandas().set_index("doc_id")
    docs = pq.read_table(f"{SF}/documents.parquet").to_pandas()
    for _, row in docs.head(50).iterrows():
        toks = re.findall(r"[0-9a-z]+", (row.text or "").lower())
        assert res.loc[row.doc_id].n_tokens == len(toks)
        assert res.loc[row.doc_id].n_chars == len(row.text or "")


def test_langid_deterministic_and_covering(ray_session):
    from humid_ray.pipelines.textstats import langid

    a = langid(SF).to_pandas().sort_values("doc_id").reset_index(drop=True)
    b = langid(SF).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert (a.lang_pred == b.lang_pred).all()
    assert set(a.lang_pred) <= {"en", "de", "fr", "es", "und"}


def test_fingerprints_stable_and_distinct(ray_session):
    from humid_ray.pipelines.textstats import fingerprints

    fp = fingerprints(SF).to_pandas()
    docs = pq.read_table(f"{SF}/documents.parquet").to_pandas()
    merged = fp.merge(docs[["doc_id", "text"]], on="doc_id")
    # identical text -> identical fingerprint; distinct text -> (almost
    # surely) distinct fingerprint
    by_text = merged.groupby("text").fingerprint.nunique()
    assert (by_text == 1).all()
    n_text = merged.text.nunique()
    assert merged.fingerprint.nunique() >= n_text - 1


def test_minhash_neardup_verified_by_exact_jaccard(ray_session):
    import re

    from humid_ray.pipelines.dedup_text import minhash_neardup_pairs

    pairs = minhash_neardup_pairs(SF, threshold=0.8).to_pandas()
    docs = pq.read_table(f"{SF}/documents.parquet").to_pandas().set_index("doc_id")

    def shingles(text, k=3):
        toks = re.findall(r"[0-9a-z]+", (text or "").lower())
        if len(toks) < k:
            return set(toks)
        return {tuple(toks[i : i + k]) for i in range(len(toks) - k + 1)}

    # estimated-jaccard-accepted pairs should be genuinely similar
    for _, row in pairs.iterrows():
        sa = shingles(docs.loc[row.doc_a].text)
        sb = shingles(docs.loc[row.doc_b].text)
        j = len(sa & sb) / max(len(sa | sb), 1)
        assert j >= 0.5, (row.doc_a, row.doc_b, j)


def test_exact_dedup_docs_matches_pandas(ray_session):
    from humid_ray.pipelines.dedup_text import exact_dedup

    res = exact_dedup(SF).to_pandas().sort_values("text").reset_index(drop=True)
    docs = pq.read_table(f"{SF}/documents.parquet").to_pandas()
    exp = (
        docs.groupby("text", as_index=False)
        .agg(cnt=("doc_id", "size"), rep_id=("doc_id", "min"))
        .sort_values("text")
        .reset_index(drop=True)
    )
    assert len(res) == len(exp)
    assert (res.cnt.to_numpy() == exp.cnt.to_numpy()).all()
    assert (res.rep_id.to_numpy() == exp.rep_id.to_numpy()).all()


def test_langid_vectorized_matches_naive(ray_session):
    """Vectorized count_substring scorer == per-row bigram-dict scorer."""
    from humid_ray.pipelines.textstats import _PROFILES, langid

    pred = langid(SF).to_pandas().set_index("doc_id").lang_pred
    docs = pq.read_table(f"{SF}/documents.parquet").to_pandas()
    profiles = {lang: {bg: len(bgs) - i for i, bg in enumerate(bgs)}
                for lang, bgs in _PROFILES.items()}
    for _, row in docs.head(200).iterrows():
        t = (row.text or "").lower()
        bigrams = {}
        for i in range(len(t) - 1):
            bg = t[i:i + 2]
            if bg.isalpha():
                bigrams[bg] = bigrams.get(bg, 0) + 1
        best, best_score = "und", 0
        for lang, prof in profiles.items():
            score = sum(w * bigrams.get(bg, 0) for bg, w in prof.items())
            if score > best_score:
                best, best_score = lang, score
        assert pred.loc[row.doc_id] == best, row.doc_id


def test_bpe_token_counts(ray_session):
    """Arrow RE2 count == Python re.findall count of the same pattern."""
    import re

    from humid_ray.pipelines.textstats import BPE_PATTERN, bpe_token_counts

    got = bpe_token_counts(SF).to_pandas().set_index("doc_id").n_bpe_tokens
    docs = pq.read_table(f"{SF}/documents.parquet").to_pandas()
    rx = re.compile(BPE_PATTERN)
    for _, row in docs.head(200).iterrows():
        assert got.loc[row.doc_id] == len(rx.findall(row.text or "")), row.doc_id


def test_stopword_ratio(ray_session):
    """Hash-based stopword membership == string-compare oracle."""
    import re

    from humid_ray.pipelines.textstats import STOPWORDS, stopword_ratio

    got = stopword_ratio(SF).to_pandas().set_index("doc_id")
    docs = pq.read_table(f"{SF}/documents.parquet").to_pandas()
    sw = set(STOPWORDS)
    for _, row in docs.head(200).iterrows():
        toks = re.findall(r"[0-9a-z]+", (row.text or "").lower())
        nsw = sum(1 for t in toks if t in sw)
        r = got.loc[row.doc_id]
        assert r.n_tokens == len(toks)
        assert r.n_stopwords == nsw
        if toks:
            assert abs(r.stopword_ratio - nsw / len(toks)) < 1e-6


def test_repetition_stats_planted(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from humid_ray.pipelines import textstats

    tbl = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], type=pa.int64()),
            "text": pa.array(
                [
                    # same 3-token shingle repeated 4x: 10 windows, 3 distinct
                    "spam ham eggs spam ham eggs spam ham eggs spam ham eggs",
                    "every token here is fully unique today",
                    "",
                ]
            ),
        }
    )
    pq.write_table(tbl, tmp_path / "documents.parquet")
    out = (
        textstats.repetition_stats(str(tmp_path))
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert out.loc[0, "n_shingles_total"] == 10
    assert out.loc[0, "n_shingles_distinct"] == 3
    assert out.loc[0, "dup_frac"] == 0.7
    assert out.loc[1, "dup_frac"] == 0.0
    assert out.loc[2, "n_shingles_total"] == 0 and out.loc[2, "dup_frac"] == 0.0


def test_hash_oracles_uncapped_lengths(ray_session, tmp_path):
    """fingerprint/simhash SQL oracles must agree with the engine on
    docs longer than any fixed power-list cap (>128 tokens) and tokens
    longer than 128 bytes — the Horner list_reduce fold has no cap."""
    import duckdb
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from humid_ray import oracles
    from humid_ray.pipelines import dedup_text, textstats

    texts = [
        "hello world this is a normal short doc",
        " ".join(f"tok{i}" for i in range(300)),   # 300 tokens
        "a" * 256 + " " + "b" * 200,               # 256-byte token
        "",
        None,
        " ".join(f"w{i % 7}" for i in range(129)),  # boundary + dups
    ]
    tbl = pa.table(
        {"doc_id": pa.array(range(1, len(texts) + 1), pa.int64()),
         "text": pa.array(texts, pa.string())}
    )
    pq.write_table(tbl, tmp_path / "documents.parquet")
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet')"
    )
    for res, sql in [
        (textstats.fingerprints(str(tmp_path)), oracles.fingerprint_docs_sql()),
        (dedup_text.simhash_docs(str(tmp_path)), oracles.simhash_docs_sql()),
    ]:
        df = res.to_pandas().sort_values("doc_id").reset_index(drop=True)
        odf = con.execute(sql).df().sort_values("doc_id").reset_index(drop=True)
        pd.testing.assert_frame_equal(
            df[sorted(df.columns)], odf[sorted(odf.columns)], check_dtype=False
        )


def test_hash_split_deterministic_and_partitioning(ray_session):
    from humid_ray.pipelines import sampling

    sf = "/root/testdata/sf0.001"
    a = sampling.hash_split(sf).to_pandas().sort_values("doc_id").reset_index(drop=True)
    b = sampling.hash_split(sf).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b)  # pure function of doc_id
    assert set(a["split"]) <= {"train", "val"}
    assert ((a["bucket"] < 10) == (a["split"] == "val")).all()
    # sample == the val side of the split, rows intact
    s = sampling.hash_sample(sf).to_pandas()
    assert set(s["doc_id"]) == set(a.loc[a["split"] == "val", "doc_id"])
    assert {"text", "lang", "source", "n_chars"} <= set(s.columns)


def test_redact_pii_planted(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from humid_ray.pipelines.textstats import redact_pii

    texts = [
        "mail jane.doe+x@mail.example.co or call 123456789012 today",
        "two mails a@b.io c@d.org and 987654321",
        "account 123456789@digits.com embedded digits stay one email",
        "short digits 12345678 survive",
        None,
        "",
    ]
    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), type=pa.int64()),
            "text": pa.array(texts, type=pa.string()),
        }
    )
    pq.write_table(tbl, tmp_path / "documents.parquet")
    res = redact_pii(str(tmp_path)).to_pandas().sort_values("doc_id")
    assert list(res.redacted_text) == [
        "mail <EMAIL> or call <NUMBER> today",
        "two mails <EMAIL> <EMAIL> and <NUMBER>",
        "account <EMAIL> embedded digits stay one email",
        "short digits 12345678 survive",
        "",
        "",
    ]
    assert list(res.n_emails) == [1, 2, 1, 0, 0, 0]
    assert list(res.n_long_numbers) == [1, 1, 0, 0, 0, 0]


def test_redact_pii_matches_duckdb_on_planted(ray_session, tmp_path):
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from humid_ray.pipelines.textstats import redact_pii, redact_pii_sql

    texts = [f"user{i}.name@host{i}.example.com id {100000000+i}0 t" for i in range(40)]
    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), type=pa.int64()),
            "text": pa.array(texts, type=pa.string()),
        }
    )
    pq.write_table(tbl, tmp_path / "documents.parquet")
    eng = (
        redact_pii(str(tmp_path)).to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet')"
    )
    orc = con.execute(redact_pii_sql()).df().sort_values("doc_id").reset_index(drop=True)
    assert eng.equals(orc[list(eng.columns)])
    assert (eng.n_emails == 1).all() and (eng.n_long_numbers == 1).all()


def test_flat_bigrams_masks_row_boundaries():
    """No bigram may span two documents; empty/null/1-token rows yield
    nothing."""
    import pyarrow as pa

    from humid_ray.pipelines.textstats import _flat_bigrams

    col = pa.array(["a b c", None, "", "solo", "x y"])
    got = _flat_bigrams(col).to_pylist()
    assert got == ["a b", "b c", "x y"]
    assert _flat_bigrams(pa.array([], type=pa.string())).to_pylist() == []
    assert _flat_bigrams(pa.array(["one"])).to_pylist() == []


def test_top_bigrams_matches_duckdb(ray_session):
    """Engine top-k vs the DuckDB window oracle at sf0.001 — rank,
    count, and tie-break all pinned."""
    import duckdb

    from humid_ray.pipelines.textstats import top_bigrams, top_bigrams_sql

    got = top_bigrams(SF, k=25).to_pandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
    )
    want = con.execute(top_bigrams_sql(k=25)).df()
    assert len(got) == len(want) == 25
    assert got.bigram.tolist() == want.bigram.tolist()
    assert got.n.tolist() == want.n.tolist()
    assert got["rank"].tolist() == want["rank"].tolist()


def test_ccnet_buckets_invariants(ray_session):
    """Head/middle/tail cover every doc once; per-lang bucket sizes
    follow the exact ntile-of-3 rule; within a language every head doc
    scores >= every middle doc >= every tail doc; and avg_micro equals
    the rounded unigram average from unigram_logprob."""
    from humid_ray.pipelines import textstats

    b = textstats.ccnet_buckets(SF).to_pandas()
    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "lang"]).to_pandas()
    assert sorted(b["doc_id"]) == sorted(docs["doc_id"])
    assert (b["bucket"].map({"head": 1, "middle": 2, "tail": 3})
            == b["bucket_id"]).all()
    lp = textstats.unigram_logprob(SF).to_pandas().set_index("doc_id")
    want_micro = (lp["avg_logprob"] * 1e6).round().astype("int64")
    got_micro = b.set_index("doc_id")["avg_micro"]
    assert (got_micro == want_micro.reindex(got_micro.index)).all()
    for lang, grp in b.groupby("lang"):
        n = len(grp)
        sizes = grp["bucket_id"].value_counts().to_dict()
        # ntile rule: ceil(3*r/n) cut — bucket k holds the ranks r with
        # ceil(3r/n) = k
        r = np.arange(1, n + 1)
        want = np.bincount((3 * r + n - 1) // n, minlength=4)
        for k in (1, 2, 3):
            assert sizes.get(k, 0) == want[k], (lang, k)
        hi = grp.loc[grp["bucket_id"] == 1, "avg_micro"]
        mid = grp.loc[grp["bucket_id"] == 2, "avg_micro"]
        lo = grp.loc[grp["bucket_id"] == 3, "avg_micro"]
        if len(hi) and len(mid):
            assert hi.min() >= mid.max()
        if len(mid) and len(lo):
            assert mid.min() >= lo.max()


def test_ccnet_zero_token_docs_rank_tail(ray_session, tmp_path):
    """Token-free docs (empty / punctuation-only) carry no fluency
    evidence: they must score the sentinel (one micro-nat below the
    rarest token's log-prob) and land at the BOTTOM of the ranking
    (tail), never the head — and the DuckDB oracle agrees bit-for-bit."""
    import duckdb
    import pyarrow as pa

    from humid_ray.pipelines.textstats import ccnet_buckets, ccnet_buckets_sql

    tbl = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4, 5, 6], type=pa.int64()),
            "lang": pa.array(["en"] * 6, type=pa.string()),
            "text": pa.array(
                [
                    "the common words the common words",
                    "the common words again and again",
                    "rare zyzzyva qoph",
                    "another ordinary sentence of words",
                    "",          # token-free
                    "!!! ???",   # punctuation-only -> token-free
                ],
                type=pa.string(),
            ),
        }
    )
    pq.write_table(tbl, tmp_path / "documents.parquet")
    b = ccnet_buckets(str(tmp_path)).to_pandas().set_index("doc_id")
    # the two garbage docs tie on the sentinel, rank 5-6 of 6 -> tail
    assert b.loc[5, "bucket"] == "tail"
    assert b.loc[6, "bucket"] == "tail"
    assert b.loc[5, "avg_micro"] == b.loc[6, "avg_micro"]
    real = b.drop([5, 6])
    assert (b.loc[5, "avg_micro"] < real["avg_micro"]).all()
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet')"
    )
    want = (con.execute(ccnet_buckets_sql()).df()
            .set_index("doc_id").sort_index())
    got = b.sort_index()
    assert (got["avg_micro"] == want["avg_micro"]).all()
    assert (got["bucket_id"] == want["bucket_id"]).all()


def test_keyword_filter_planted(ray_session, tmp_path):
    """Blocklist screening: counts are case-insensitive, sum across
    terms and repeats, and clean/empty/null docs pass."""
    import pyarrow as pa

    from humid_ray.pipelines.textstats import keyword_filter

    tbl = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], type=pa.int64()),
            "text": pa.array(
                [
                    "Visit our CASINO today — best casino bonus, viagra!",
                    "a perfectly ordinary document",
                    "",
                    None,
                ],
                type=pa.string(),
            ),
        }
    )
    pq.write_table(tbl, tmp_path / "documents.parquet")
    out = (keyword_filter(str(tmp_path)).to_pandas()
           .set_index("doc_id").sort_index())
    assert out.loc[1, "n_hits"] == 3 and bool(out.loc[1, "blocked"])
    assert out.loc[2, "n_hits"] == 0 and not bool(out.loc[2, "blocked"])
    assert out.loc[3, "n_hits"] == 0
    assert out.loc[4, "n_hits"] == 0


def test_corpus_drift_planted(ray_session, tmp_path):
    """Disjoint vocabularies between the base and new splits drive JS
    to its ln(2) maximum; identical ones drive it to ~0; an empty
    corpus reports zeros."""
    import math

    import pyarrow as pa

    from humid_ray.pipelines.textstats import corpus_drift
    from humid_ray.util import splitmix64

    ids = np.arange(1, 301, dtype=np.int64)
    is_new = (splitmix64(ids.view(np.uint64)) % np.uint64(100)) < 20
    texts = ["newish tokens only here" if n else "basely words alone there"
             for n in is_new]
    tbl = pa.table({"doc_id": pa.array(ids),
                    "text": pa.array(texts, type=pa.string())})
    pq.write_table(tbl, tmp_path / "documents.parquet")
    out = corpus_drift(str(tmp_path)).to_pandas().iloc[0]
    assert out.base_vocab == 4 and out.new_vocab == 4
    assert abs(out.js_divergence - math.log(2)) < 1e-6
    # same text on both sides -> zero drift
    tbl2 = pa.table({"doc_id": pa.array(ids),
                     "text": pa.array(["same words everywhere"] * len(ids))})
    pq.write_table(tbl2, tmp_path / "documents.parquet")
    out2 = corpus_drift(str(tmp_path)).to_pandas().iloc[0]
    assert out2.js_divergence == 0.0
    # empty corpus -> one zero row
    pq.write_table(pa.table({"doc_id": pa.array([], type=pa.int64()),
                             "text": pa.array([], type=pa.string())}),
                   tmp_path / "documents.parquet")
    out3 = corpus_drift(str(tmp_path)).to_pandas().iloc[0]
    assert out3.base_tokens == 0 and out3.js_nano == 0


def test_corpus_checksum_properties(ray_session, tmp_path):
    """Order-independence (a shuffled copy checksums identically),
    content sensitivity (one changed row flips the checksum), and the
    empty-corpus fixed point (0, 0)."""
    import pyarrow as pa

    from humid_ray.pipelines.textstats import corpus_checksum

    def write(d, ids, texts):
        d.mkdir(exist_ok=True)
        pq.write_table(pa.table({
            "doc_id": pa.array(ids, type=pa.int64()),
            "text": pa.array(texts, type=pa.string()),
            "lang": pa.array(["en"] * len(ids), type=pa.string()),
            "source": pa.array(["s"] * len(ids), type=pa.string()),
            "n_chars": pa.array([len(t or "") for t in texts],
                                type=pa.int64()),
        }), d / "documents.parquet")
        return str(d)

    ids = list(range(20))
    texts = [f"doc number {i}" for i in ids]
    texts[3] = None  # NULL text hashes like ''
    a = corpus_checksum(write(tmp_path / "a", ids, texts)).to_pandas()
    # same rows, reversed order -> identical checksum
    b = corpus_checksum(
        write(tmp_path / "b", ids[::-1], texts[::-1])
    ).to_pandas()
    assert a.n_rows.tolist() == b.n_rows.tolist() == [20]
    assert a.checksum.tolist() == b.checksum.tolist()
    # one changed row -> different checksum
    texts2 = list(texts)
    texts2[7] = "doc number 7 CHANGED"
    c = corpus_checksum(write(tmp_path / "c", ids, texts2)).to_pandas()
    assert c.checksum.tolist() != a.checksum.tolist()
    # empty corpus
    e = corpus_checksum(write(tmp_path / "e", [], [])).to_pandas()
    assert e.n_rows.tolist() == [0] and e.checksum.tolist() == [0]


def test_lang_source_rollup_margins_consistent(ray_session):
    """Margins must equal the fold of their cells (consistency by
    construction) and the grand total must equal the corpus size."""
    from humid_ray.pipelines.textstats import lang_source_rollup

    out = lang_source_rollup(SF).to_pandas()
    cells = out[(out.lang != "ALL") & (out.source != "ALL")]
    lang_m = out[(out.lang != "ALL") & (out.source == "ALL")]
    grand = out[(out.lang == "ALL") & (out.source == "ALL")]
    assert len(grand) == 1
    assert grand.n_docs.iloc[0] == cells.n_docs.sum()
    assert grand.total_chars.iloc[0] == cells.total_chars.sum()
    per_lang = cells.groupby("lang")[["n_docs", "total_chars"]].sum()
    for _, r in lang_m.iterrows():
        assert r.n_docs == per_lang.loc[r.lang, "n_docs"]
        assert r.total_chars == per_lang.loc[r.lang, "total_chars"]
    docs = pq.read_table(f"{SF}/documents.parquet")
    assert grand.n_docs.iloc[0] == docs.num_rows


def test_gopher_rules_planted(ray_session, tmp_path):
    """Each rule must trip independently on a planted doc, words are
    whitespace runs (not [0-9a-z]+ tokens), and thresholds apply to
    UNROUNDED ratios."""
    import pyarrow as pa

    from humid_ray.pipelines.textstats import gopher_rules

    texts = [
        " ".join(["word"] * 20),            # 0: passes every rule
        "too few",                           # 1: n_words < 10
        " ".join(["x"] * 20),                # 2: mean_word_len 1 < 3
        " ".join(["12345"] * 20),            # 3: frac_alpha 0 < 0.8
        " ".join(["word"] * 20) + " " + "# " * 5,  # 4: symbol ratio 5/25=0.2
        None,                                 # 5: NULL text -> 0 words
    ]
    ids = list(range(len(texts)))
    pq.write_table(pa.table({
        "doc_id": pa.array(ids, type=pa.int64()),
        "text": pa.array(texts, type=pa.string()),
        "lang": pa.array(["en"] * len(ids), type=pa.string()),
        "source": pa.array(["s"] * len(ids), type=pa.string()),
        "n_chars": pa.array([len(t or "") for t in texts], type=pa.int64()),
    }), tmp_path / "documents.parquet")
    out = (gopher_rules(str(tmp_path)).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert out.keep.tolist() == [True, False, False, False, False, False]
    assert out.n_words.tolist() == [20, 2, 20, 20, 25, 0]
    assert out.mean_word_len.tolist()[0] == 4.0
    assert out.frac_alpha_words.tolist()[3] == 0.0
    assert out.symbol_ratio.tolist()[4] == 0.2
