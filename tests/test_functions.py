"""Unit parity tests for the word/signature construction helpers.

Translated from the reference's tests/test_fastq.cc (UMI extraction,
budget split, padding/truncation matrices) into the image+caption
signature domain."""

import numpy as np
import pyarrow as pa
import pytest

from humid_ray.config import HumidConfig, bits_from_source
from humid_ray.functions.signature import compose_signatures, umi_hex_to_bits
from humid_ray.functions.simhash import shingle_hashes, simhash_batch
from humid_ray.functions.text import (
    extract_last_field,
    extract_umi,
    make_string_size,
    tokenize_batch,
    valid_umi,
)
from humid_ray.util import hamming64, hash_bytes_segments, popcount64


# --- scalar helpers (reference tests/test_fastq.cc:168-202) ---------------

def test_extract_last_field():
    assert extract_last_field("a_b_c", "_") == "c"
    assert extract_last_field("abc", "_") == ""
    assert extract_last_field("a:b:cafe", ":") == "cafe"
    assert extract_last_field("trailing_", "_") == ""


def test_valid_umi():
    assert valid_umi("deadbeef")
    assert valid_umi("0123ABC")
    assert not valid_umi("")
    assert not valid_umi("xyz123")
    assert not valid_umi("cafe pow")


def test_make_string_size():
    assert make_string_size("abcdef", 3, "0") == "abc"
    assert make_string_size("ab", 5, "0") == "ab000"
    assert make_string_size("abc", 3, "0") == "abc"


def test_extract_umi():
    # underscore style wins (reference tests/test_fastq.cc:9-46)
    assert extract_umi("img0001_cafe") == "cafe"
    # colon fallback
    assert extract_umi("img:0001:beef") == "beef"
    # invalid token -> empty
    assert extract_umi("img0001_zzz") == ""
    # only the part before the first space counts
    assert extract_umi("img_cafe extra_f00d") == "cafe"
    assert extract_umi("plainid") == ""


# --- budget split (reference ntFromFile, tests/test_fastq.cc:112-155) -----

@pytest.mark.parametrize(
    "n,total,expected",
    [
        (1, 24, [24]),
        (2, 24, [12, 12]),
        (3, 24, [8, 8, 8]),
        (3, 25, [8, 8, 9]),
        (2, 1, [0, 1]),
        (4, 2, [0, 0, 0, 2]),
        (2, 64, [32, 32]),
    ],
)
def test_bits_from_source(n, total, expected):
    assert bits_from_source(n, total) == expected


def test_umi_hex_to_bits_cut_and_pad():
    # cut: token longer than the budget
    assert umi_hex_to_bits("ff00", 8) == 0xFF
    # pad: token shorter than the budget (zero nibbles appended)
    assert umi_hex_to_bits("f", 8) == 0xF0
    # non-nibble-aligned budget keeps top bits
    assert umi_hex_to_bits("f0", 6) == 0b111100
    assert umi_hex_to_bits("anything"[:0] or "c", 0) == 0


def test_compose_signature_layout():
    cfg = HumidConfig(word_bits=64)
    ph = np.array([0xAAAAAAAA00000000], dtype=np.uint64)
    sh = np.array([0x5555555500000000], dtype=np.uint64)
    sig = compose_signatures(cfg, ph, sh)
    # top 32 = top 32 of phash, low 32 = top 32 of simhash
    assert sig[0] == np.uint64((0xAAAAAAAA << 32) | 0x55555555)


def test_compose_signature_umi_precedence():
    cfg = HumidConfig(word_bits=64, umi_from_id=True)
    ph = np.array([0xFFFFFFFFFFFFFFFF], dtype=np.uint64)
    sh = np.array([0], dtype=np.uint64)
    umi = np.array([0xAB], dtype=np.uint64)
    sig = compose_signatures(cfg, ph, sh, umi, umi_bits=8)
    # 8 UMI bits first, then 28 phash bits, then 28 simhash bits
    assert int(sig[0]) >> 56 == 0xAB
    umi_used, per_source = cfg.source_bits(8)
    assert umi_used == 8 and per_source == [28, 28]
    # UMI larger than the whole budget is capped (reference preCompute)
    umi_used, per_source = cfg.source_bits(100)
    assert umi_used == 64 and per_source == [0, 0]


# --- hashing kernels ------------------------------------------------------

def test_popcount64():
    a = np.array([0, 1, 3, 0xFFFFFFFFFFFFFFFF, 1 << 63], dtype=np.uint64)
    assert popcount64(a).tolist() == [0, 1, 2, 64, 1]


def test_hash_segments_stable_and_distinct():
    toks = [b"hello", b"world", b"", b"hello"]
    data = np.frombuffer(b"".join(toks), dtype=np.uint8)
    offs = np.cumsum([0] + [len(t) for t in toks])
    h = hash_bytes_segments(data, offs)
    assert h[0] == h[3] and h[0] != h[1] and h[2] != h[0]
    # stable across calls
    assert np.array_equal(h, hash_bytes_segments(data, offs))


def test_tokenize_and_simhash():
    texts = pa.array(
        ["The quick brown fox", "the  QUICK brown fox", "", None, "one"]
    )
    th, offs = tokenize_batch(texts)
    assert (offs[1:] - offs[:-1]).tolist() == [4, 4, 0, 0, 1]
    sig, n_sh = simhash_batch(th, offs, k=2)
    assert sig[0] == sig[1]  # case/whitespace normalization
    assert n_sh.tolist() == [3, 3, 0, 0, 1]  # unigram fallback for short rows
    # near-identical captions land close in Hamming space
    t2, o2 = tokenize_batch(pa.array(["The quick brown fox", "The quick brown cat"]))
    s2, _ = simhash_batch(t2, o2, k=2)
    assert 0 < hamming64(s2[0:1], s2[1:2])[0] < 32


def test_shingle_hashes_do_not_cross_rows():
    t, o = tokenize_batch(pa.array(["a b", "c d"]))
    t2, o2 = tokenize_batch(pa.array(["a b c d"]))
    s1, _ = shingle_hashes(t, o, 2)
    s2, _ = shingle_hashes(t2, o2, 2)
    # "b c" shingle exists only in the single-row variant
    assert len(s1) == 2 and len(s2) == 3
    assert set(s1.tolist()) < set(s2.tolist()) or set(s1.tolist()) != set(s2.tolist())


def test_phash_msb_first_packing():
    """DCT coefficient i must land on bit 63-i (MSB-first): the coarse
    low-frequency coefficients survive top-bits truncation. Pinned
    against an in-test repack of the same threshold bits."""
    from humid_ray.functions.phash import _D, _K, _N, _pool, _to_gray, phash_image

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (40, 56), dtype=np.uint8)
    ph = phash_image(img)
    g = _pool(_to_gray(np.asarray(img, dtype=np.float64)), _N)
    coef = (_D @ g @ _D.T)[:_K, :_K].ravel()
    med = np.median(coef[1:])
    bits = coef > med
    bits[0] = False
    for i in range(64):
        assert ((ph >> (63 - i)) & 1) == int(bits[i])
    # DC bit forced 0 -> top bit always clear
    assert ph < 2**63


def test_stored_phash_null_safe_and_exact():
    """A null phash in the batch must NOT degrade the int64 column to
    float64 (values > 2^53 silently change); null rows are filtered."""
    import pyarrow as pa

    from humid_ray.config import HumidConfig
    from humid_ray.stages.signatures import SignatureExtractor

    big = (1 << 62) | 0x5DEECE66D  # not representable in float64
    batch = pa.table(
        {
            "image_id": ["a", "b", "c"],
            "caption": ["w1 w2 w3", "w1 w2 w3", "w4 w5 w6"],
            "phash": pa.array([big, None, big ^ 1], type=pa.int64()),
        }
    )
    cfg = HumidConfig(sources=("phash",), word_bits=64)
    out = SignatureExtractor(cfg, 0, {})(batch)
    sig = out.column("sig").to_numpy(zero_copy_only=False).view(np.uint64)
    filtered = out.column("filtered").to_numpy(zero_copy_only=False)
    assert sig[0] == big and sig[2] == big ^ 1  # exact bits, no float trip
    assert list(filtered) == [False, True, False]


def test_validate_payload_gate():
    """validate_payload=True additionally sniffs payload magic bytes;
    False trusts the stored phash (and never needs the bytes column)."""
    import pyarrow as pa

    from humid_ray.config import HumidConfig
    from humid_ray.png import encode_png
    from humid_ray.stages.signatures import SignatureExtractor

    ok_png = encode_png(np.zeros((8, 8), dtype=np.uint8))
    batch = pa.table(
        {
            "image_id": ["a", "b"],
            "caption": ["w1 w2 w3", "w1 w2 w3"],
            "bytes": pa.array([ok_png, b"JUNKJUNKJUNK"], type=pa.binary()),
            "phash": pa.array([123, 456], type=pa.int64()),
        }
    )
    lax = SignatureExtractor(HumidConfig(sources=("phash",), word_bits=64), 0, {})(batch)
    strict = SignatureExtractor(
        HumidConfig(sources=("phash",), word_bits=64, validate_payload=True), 0, {}
    )(batch)
    assert list(lax.column("filtered").to_pylist()) == [False, False]
    assert list(strict.column("filtered").to_pylist()) == [False, True]
    # fast path works WITHOUT the bytes column at all
    no_bytes = SignatureExtractor(HumidConfig(sources=("phash",), word_bits=64), 0, {})(
        batch.drop_columns(["bytes"])
    )
    assert no_bytes.num_rows == 2


def test_hash_u64_segments_matches_scalar_reference():
    """Vectorized polynomial segment hash == scalar mod-2^64 loop, and
    is order-sensitive."""
    from humid_ray.util import HASH_BASE, hash_u64_segments, splitmix64

    vals = np.array([3, 1, 4, 1, 5, 9, 2, 6], dtype=np.uint64)
    offs = np.array([0, 3, 3, 8], dtype=np.int64)  # [3,1,4], [], [1,5,9,2,6]
    got = hash_u64_segments(vals, offs)

    def scalar(seg):
        h = 0
        for v in seg:
            h = (h * int(HASH_BASE) + int(v)) % (1 << 64)
        return int(splitmix64(np.array([h], dtype=np.uint64))[0])

    assert int(got[0]) == scalar([3, 1, 4])
    assert int(got[1]) == scalar([])
    assert int(got[2]) == scalar([1, 5, 9, 2, 6])
    # order sensitivity
    swapped = hash_u64_segments(np.array([1, 3, 4], dtype=np.uint64),
                                np.array([0, 3], dtype=np.int64))
    assert int(swapped[0]) != int(got[0])


def test_pairwise_intersect_sizes_vs_sets():
    import numpy as np

    from humid_ray.util import pairwise_intersect_sizes

    rng = np.random.default_rng(7)
    segs = [np.unique(rng.integers(0, 50, size=rng.integers(0, 20)).astype(np.uint64))
            for _ in range(30)]
    vals = np.concatenate([s for s in segs]) if segs else np.empty(0, np.uint64)
    offs = np.zeros(len(segs) + 1, dtype=np.int64)
    np.cumsum([len(s) for s in segs], out=offs[1:])
    ii = rng.integers(0, len(segs), size=100)
    jj = rng.integers(0, len(segs), size=100)
    got = pairwise_intersect_sizes(vals, offs[:-1], offs[1:], ii, jj)
    exp = [len(set(segs[a].tolist()) & set(segs[b].tolist()))
           if a != b else len(segs[a]) for a, b in zip(ii, jj)]
    # self-pairs (a == b) duplicate every value; the helper assumes the
    # two sides are distinct segments, so only compare a != b pairs
    mask = ii != jj
    assert (got[mask] == np.array(exp, dtype=np.int64)[mask]).all()
    assert pairwise_intersect_sizes(vals, offs[:-1], offs[1:], [], []).size == 0


def test_payload_memo_computes_each_distinct_payload_once():
    import pyarrow as pa

    from humid_ray.functions.payloads import PayloadMemo

    calls = []

    def fn(seg):
        b = bytes(seg)
        calls.append(b)
        return (len(b), b[:1])

    col = pa.array([b"aaa", b"bb", b"aaa", b"", b"bb", b"aaa"],
                   type=pa.binary())
    memo = PayloadMemo()
    out = memo.map(col, fn)
    assert out == [(3, b"a"), (2, b"b"), (3, b"a"), (0, b""),
                   (2, b"b"), (3, b"a")]
    assert sorted(calls) == [b"", b"aaa", b"bb"]  # one call per distinct
    # second batch: cache persists across map() calls (the actor shape)
    memo.map(pa.array([b"bb", b"aaa"], type=pa.binary()), fn)
    assert sorted(calls) == [b"", b"aaa", b"bb"]


def test_payload_memo_sliced_column_offsets():
    """A sliced (non-zero offset) Arrow array must hash the RIGHT
    segments — the flat-buffer view is shared with the parent."""
    import pyarrow as pa

    from humid_ray.functions.payloads import PayloadMemo

    parent = pa.array([b"xx", b"yyy", b"z", b"wwww"], type=pa.binary())
    sliced = parent.slice(1, 2)  # [b"yyy", b"z"]
    out = PayloadMemo().map(sliced, lambda seg: bytes(seg))
    assert out == [b"yyy", b"z"]


def test_payload_memo_large_binary_and_cap():
    import pyarrow as pa

    from humid_ray.functions.payloads import PayloadMemo

    col = pa.array([b"a", b"b", b"c", b"a"], type=pa.large_binary())
    memo = PayloadMemo(cap=2)
    out = memo.map(col, lambda seg: bytes(seg))
    assert out == [b"a", b"b", b"c", b"a"]
    assert len(memo.cache) <= 2  # the cap cleared mid-stream
