"""Substring dedup (winnowed-fingerprint suffix-array analog) vs an
O(n*m) longest-common-substring oracle."""

from difflib import SequenceMatcher

import numpy as np
import pyarrow as pa

import ray.data

from humid_ray.functions.winnow import kgram_hashes, string_bytes, winnow_select
from humid_ray.pipelines.substring import substring_spans

K, MIN_LEN = 6, 16


def _lcs_len(a: str, b: str) -> int:
    m = SequenceMatcher(None, a, b, autojunk=False).find_longest_match(
        0, len(a), 0, len(b)
    )
    return m.size


def _mk_docs():
    rng = np.random.default_rng(7)
    alphabet = list("abcdefgh .,")

    def rand(n):
        return "".join(rng.choice(alphabet) for _ in range(n))

    shared_long = "the quick brown fox jumps over the lazy dog"   # 43 chars
    shared_short = "hello world!"                                  # 12 < MIN_LEN
    periodic = "ab" * 40                                           # 80 chars
    docs = {
        0: rand(60) + shared_long + rand(40),
        1: rand(25) + shared_long + rand(70),
        2: rand(50) + shared_short + rand(50),      # short share only
        3: rand(30) + shared_short + rand(80),
        4: rand(120),                                # no shares
        5: rand(20) + periodic + rand(30),           # periodic repetition
        6: rand(45) + periodic + rand(15),
        7: (docs_7 := rand(100)),                    # exact duplicate pair
        8: docs_7,
        9: "tiny",                                    # shorter than k
    }
    return docs


def test_substring_dedup_matches_lcs_oracle(ray_session):
    docs = _mk_docs()
    truth = {}
    ids = sorted(docs)
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            n = _lcs_len(docs[ids[i]], docs[ids[j]])
            if n >= MIN_LEN:
                truth[(ids[i], ids[j])] = n

    tbl = pa.table(
        {
            "doc_id": pa.array(ids, type=pa.int64()),
            "text": pa.array([docs[i] for i in ids]),
        }
    )
    spans = substring_spans(
        ray.data.from_arrow(tbl), min_len=MIN_LEN, k=K
    ).take_all()
    found = {}
    for r in spans:
        key = (r["doc_a"], r["doc_b"])
        found[key] = max(found.get(key, 0), r["length"])
        # soundness: every reported span is a real shared substring
        a, b = docs[r["doc_a"]], docs[r["doc_b"]]
        assert (
            a[r["start_a"] : r["start_a"] + r["length"]]
            == b[r["start_b"] : r["start_b"] + r["length"]]
        )
        assert r["length"] >= MIN_LEN

    assert set(found) == set(truth)
    for key, n in truth.items():
        assert found[key] == n, f"pair {key}: max span {found[key]} != LCS {n}"


def test_winnow_guarantee_randomized():
    """Any planted shared substring of length >= w+k-1 yields an
    ALIGNED shared fingerprint (the completeness invariant)."""
    rng = np.random.default_rng(3)
    k, w = 5, 8
    for trial in range(20):
        span_len = int(rng.integers(w + k - 1, 40))
        span = "".join(rng.choice(list("xyz")) for _ in range(span_len))
        pre_a, pre_b = int(rng.integers(0, 30)), int(rng.integers(0, 30))
        a = "".join(rng.choice(list("abc")) for _ in range(pre_a)) + span + "q" * 5
        b = "".join(rng.choice(list("abc")) for _ in range(pre_b)) + span + "p" * 5
        data, offs = string_bytes(pa.array([a, b]))
        h, hoffs = kgram_hashes(data, offs, k)
        rows, pos, fp = winnow_select(h, hoffs, w)
        sel = [set(), set()]
        for r, p, f in zip(rows.tolist(), pos.tolist(), fp.tolist()):
            start = pre_a if r == 0 else pre_b
            if start <= p <= start + span_len - k:
                sel[r].add((p - start, f))
        assert sel[0] & sel[1], f"trial {trial}: no aligned shared fingerprint"


def test_substring_boilerplate_heavy_corpus(ray_session):
    """Many docs sharing one boilerplate span: hot-fingerprint caps must
    keep the op bounded while every reported span stays byte-true."""
    rng = np.random.default_rng(11)
    boiler = "this content is provided as-is without warranty of any kind. "
    docs = {}
    for i in range(40):
        pad = "".join(rng.choice(list("abcdef ")) for _ in range(30))
        docs[i] = pad + boiler + "".join(rng.choice(list("uvwxyz ")) for _ in range(20))
    tbl = pa.table({"doc_id": pa.array(sorted(docs), type=pa.int64()),
                    "text": pa.array([docs[i] for i in sorted(docs)])})
    spans = substring_spans(ray.data.from_arrow(tbl), min_len=MIN_LEN, k=K).take_all()
    assert spans, "boilerplate pairs must be detected"
    for r in spans:
        a, b = docs[r["doc_a"]], docs[r["doc_b"]]
        assert (a[r["start_a"]:r["start_a"] + r["length"]]
                == b[r["start_b"]:r["start_b"] + r["length"]])
    # the capped pairer plus hot_fp_stats keeps nothing silent
    from humid_ray.pipelines.substring import hot_fp_stats
    hot = hot_fp_stats(ray.data.from_arrow(tbl), MIN_LEN, K, threshold=40).take_all()
    assert isinstance(hot, list)


def test_substring_null_and_empty_texts(ray_session):
    tbl = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], type=pa.int64()),
        "text": pa.array([None, "", "x" * 50, "x" * 50]),
    })
    spans = substring_spans(ray.data.from_arrow(tbl), min_len=16, k=6).take_all()
    pairs = {(r["doc_a"], r["doc_b"]) for r in spans}
    assert pairs == {(3, 4)}


def test_substring_no_duplicates(ray_session):
    rng = np.random.default_rng(5)
    docs = ["".join(rng.choice(list("abcdefgh"), size=80)) for _ in range(8)]
    tbl = pa.table({"doc_id": pa.array(range(8), type=pa.int64()),
                    "text": pa.array(docs)})
    spans = substring_spans(ray.data.from_arrow(tbl), min_len=24, k=8).take_all()
    assert spans == []
