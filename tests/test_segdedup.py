"""Cross-document segment dedup (line / token-chunk) checks: planted
boilerplate against a pure-Python oracle, plus edge cases (null/empty
texts, no-duplicate corpus, all-lines-removed documents)."""

import re
from collections import Counter

import pyarrow as pa
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _write_docs(tmp_path, texts):
    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), type=pa.int64()),
            "text": pa.array(texts, type=pa.string()),
        }
    )
    pq.write_table(tbl, tmp_path / "documents.parquet")
    return str(tmp_path)


def _python_line_dedup(texts, min_count=2):
    split = [(t or "").split("\n") for t in texts]
    counts = Counter(line for lines in split for line in lines)
    out = []
    for lines in split:
        kept = [ln for ln in lines if counts[ln] < min_count]
        out.append(("\n".join(kept), len(lines), len(lines) - len(kept)))
    return out


def test_line_dedup_planted_boilerplate(ray_session, tmp_path):
    from humid_ray.pipelines.segdedup import line_dedup

    boiler = "click here to subscribe"
    texts = [
        f"unique alpha {i}\n{boiler}\nunique beta {i}" for i in range(20)
    ] + ["totally unique document", None, "", boiler]
    sf = _write_docs(tmp_path, texts)
    res = line_dedup(sf).to_pandas().sort_values("doc_id")
    expect = _python_line_dedup(texts)
    for (_, row), (clean, n_seg, n_rm) in zip(res.iterrows(), expect):
        assert row.clean_text == clean
        assert row.n_segments == n_seg
        assert row.n_removed == n_rm
    # the boilerplate line is gone from every document
    assert not res.clean_text.str.contains(boiler).any()
    # doc consisting ONLY of the boilerplate -> empty but present
    assert res.iloc[-1].clean_text == "" and res.iloc[-1].n_removed == 1


def test_line_dedup_no_duplicates_is_identity(ray_session, tmp_path):
    from humid_ray.pipelines.segdedup import line_dedup

    texts = [f"only line {i}\nsecond {i}" for i in range(10)]
    sf = _write_docs(tmp_path, texts)
    res = line_dedup(sf).to_pandas().sort_values("doc_id")
    assert list(res.clean_text) == texts
    assert (res.n_removed == 0).all()


def test_chunk_dedup_matches_python(ray_session, tmp_path):
    from humid_ray.pipelines.segdedup import chunk_dedup

    k, min_count = 3, 2
    texts = [
        "shared boiler plate tokens here plus unique tail %d" % i
        for i in range(8)
    ] + ["one two", "", None]
    sf = _write_docs(tmp_path, texts)
    res = chunk_dedup(sf, k=k, min_count=min_count).to_pandas().sort_values(
        "doc_id"
    )

    def chunks(t):
        toks = re.findall(r"[0-9a-z]+", (t or "").lower())
        return [" ".join(toks[i : i + k]) for i in range(0, len(toks), k)]

    counts = Counter(c for t in texts for c in chunks(t))
    for (_, row), t in zip(res.iterrows(), texts):
        ch = chunks(t)
        kept = [c for c in ch if counts[c] < min_count]
        assert row.clean_text == " ".join(kept)
        assert row.n_segments == len(ch)
        assert row.n_removed == len(ch) - len(kept)


def test_chunk_dedup_sf_matches_duckdb(ray_session):
    import duckdb

    from humid_ray.pipelines.segdedup import chunk_dedup, chunk_dedup_sql

    eng = chunk_dedup(SF).to_pandas().sort_values("doc_id").reset_index(
        drop=True
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF}/documents.parquet')"
    )
    orc = (
        con.execute(chunk_dedup_sql())
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)[list(eng.columns)]
    )
    assert eng.n_removed.sum() > 0  # non-trivial on this corpus
    assert eng.equals(orc)


def test_chunk_export_overlap_invariants(ray_session):
    """Sliding chunks reconstruct the token stream: every stride-th
    token starts exactly one chunk; consecutive chunks of a doc
    overlap by size - stride tokens."""
    from humid_ray.pipelines.segdedup import chunk_export

    size, stride = 8, 3
    got = (chunk_export("/root/testdata/sf0.001", size=size, stride=stride)
           .to_pandas().sort_values(["doc_id", "chunk_idx"])
           .reset_index(drop=True))
    assert len(got) > 0
    for doc_id, g in got.groupby("doc_id"):
        toks = []
        for r in g.itertuples():
            chunk = r.chunk_text.split(" ")
            assert len(chunk) == r.n_tokens <= size
            start = r.chunk_idx * stride
            # rebuild the doc's token stream from chunk prefixes
            toks[start:start + len(chunk)] = chunk
        n = len(toks)
        # chunk count matches the closed form
        assert len(g) == (n - 1) // stride + 1
        # every chunk is a faithful window of the rebuilt stream
        for r in g.itertuples():
            start = r.chunk_idx * stride
            assert toks[start:start + size][:r.n_tokens] == \
                r.chunk_text.split(" ")


def test_chunk_export_matches_sql(ray_session):
    import duckdb

    from humid_ray.pipelines.segdedup import chunk_export, chunk_export_sql

    sf = "/root/testdata/sf0.001"
    got = (chunk_export(sf).to_pandas()
           .sort_values(["doc_id", "chunk_idx"]).reset_index(drop=True))
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{sf}/documents.parquet')")
    exp = (con.sql(chunk_export_sql()).df()
           .sort_values(["doc_id", "chunk_idx"]).reset_index(drop=True))
    assert got.equals(exp)
