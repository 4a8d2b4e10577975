"""Planted-input checks for the image-side curation operators
(pipelines/images.py). Oracle parity at sf0.01 is covered by the
driver contract; these pin the semantics on a corpus small enough to
verify by hand: byte-identity grouping, canonical selection, the
usable gate, and Hamming-cluster representative selection."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _corpus(tmp_path, rows):
    t = pa.table(
        {
            "image_id": pa.array([r[0] for r in rows], type=pa.string()),
            "bytes": pa.array([r[1] for r in rows], type=pa.binary()),
            "w": pa.array([4] * len(rows), type=pa.int32()),
            "h": pa.array([4] * len(rows), type=pa.int32()),
            "fmt": pa.array(["png"] * len(rows), type=pa.string()),
            "caption": pa.array([f"cap {r[0]}" for r in rows],
                                type=pa.string()),
            "phash": pa.array([r[2] for r in rows], type=pa.int64()),
        }
    )
    d = tmp_path / "corpus"
    d.mkdir()
    pq.write_table(t, d / "part-0.parquet")
    return str(d)


ROWS = [
    # (image_id, bytes, phash)
    ("img_a", b"\x01\x02\x03\x04", 0x10),   # byte-dup group {a, b}
    ("img_b", b"\x01\x02\x03\x04", 0x10),
    ("img_c", b"\x05\x06\x07", 0x11),        # Hamming(0x10, 0x11) = 1
    ("img_d", b"\x99\x99", 0xF0),            # isolated cluster
    ("img_e", b"", None),                     # unusable (null phash)
]


def test_image_exact_dedup_planted(ray_session, tmp_path):
    from humid_ray.pipelines.images import image_exact_dedup

    corpus = _corpus(tmp_path, ROWS)
    out = (image_exact_dedup(corpus).to_pandas()
           .sort_values("image_id").reset_index(drop=True))
    assert out.image_id.tolist() == [r[0] for r in ROWS]
    assert out.canonical_id.tolist() == [
        "img_a", "img_a", "img_c", "img_d", "img_e"
    ]
    assert out.keep.tolist() == [True, False, True, True, True]


def test_image_exact_dedup_second_hash_differs():
    """The two payload hashes must be independent functions of the
    bytes (a pair colliding on h1 alone must not collide on h2)."""
    from humid_ray.pipelines.images import _byte_identity_kernel

    payloads = [b"abc", b"abd", b"", b"\x00" * 8, bytes(range(64))]
    flat = b"".join(payloads)
    offs = np.cumsum([0] + [len(p) for p in payloads])
    t = pa.table({
        "image_id": pa.array([f"i{k}" for k in range(len(payloads))]),
        "bytes": pa.array(payloads, type=pa.binary()),
    })
    out = _byte_identity_kernel()(t)
    h1 = out.column("h1").to_numpy()
    h2 = out.column("h2").to_numpy()
    ln = out.column("ln").to_numpy()
    # identity is the (h1, h2, ln) composite: the polynomial hash maps
    # b"" and b"\x00"*n to the same value (zero contributions), but the
    # length column separates them — distinct payloads, distinct keys
    keys = set(zip(h1.tolist(), h2.tolist(), ln.tolist()))
    assert len(keys) == len(payloads)
    # not the same function: h2 != h1 for non-trivial payloads
    assert (h1 != h2).any()
    assert ln.tolist() == [len(p) for p in payloads]


def test_curate_images_planted(ray_session, tmp_path):
    from humid_ray.pipelines.images import curate_images

    corpus = _corpus(tmp_path, ROWS)
    out = (curate_images(corpus).to_pandas()
           .sort_values("image_id").reset_index(drop=True))
    # img_e is unusable (null phash) and must be absent
    assert out.image_id.tolist() == ["img_a", "img_b", "img_c", "img_d"]
    assert out.canonical_id.tolist() == ["img_a", "img_a", "img_c", "img_d"]
    # {a, b, c} share one Hamming<=1 cluster (rep = min id); d isolated
    assert out.cluster_rep.tolist() == ["img_a", "img_a", "img_a", "img_d"]
    assert out.keep.tolist() == [True, False, False, True]


def test_curate_images_join_branch_equals_broadcast(ray_session, tmp_path):
    from humid_ray.pipelines.images import curate_images

    corpus = _corpus(tmp_path, ROWS)
    a = (curate_images(corpus).to_pandas()
         .sort_values("image_id").reset_index(drop=True))
    b = (curate_images(corpus, broadcast_max_labels=0).to_pandas()
         .sort_values("image_id").reset_index(drop=True))
    assert a.equals(b)


def test_curate_images_matches_duckdb_oracle(ray_session, tmp_path):
    import duckdb

    from humid_ray.pipelines.images import curate_images, curate_images_sql

    corpus = _corpus(tmp_path, ROWS)
    mine = (curate_images(corpus).to_pandas()
            .sort_values("image_id").reset_index(drop=True))
    oracle = (duckdb.sql(curate_images_sql(f"{corpus}/*.parquet")).df()
              .sort_values("image_id").reset_index(drop=True))
    assert mine.image_id.tolist() == oracle.image_id.tolist()
    assert mine.canonical_id.tolist() == oracle.canonical_id.tolist()
    assert mine.cluster_rep.tolist() == oracle.cluster_rep.tolist()
    assert mine.keep.tolist() == oracle.keep.tolist()


# --- round-3 additions: format stats, caption ops, image tier funnel ------

COLLIDE_ROWS = [
    # (image_id, bytes, phash, caption)
    ("img_a", b"\x01\x02", 0x10, "same caption"),   # variant 1
    ("img_b", b"\x01\x02", 0x10, "same caption"),   # dup of variant 1
    ("img_c", b"\x03\x04", 0x11, "same caption"),   # variant 2 -> collision
    ("img_d", b"\x05\x06", 0x40, "other caption"),  # single variant
    ("img_e", b"\x07\x08", None, "same caption"),   # variant 3 (null phash)
    ("img_f", b"\x09\x0a", 0xF0, ""),               # empty caption
]


def _corpus_cap(tmp_path, rows):
    t = pa.table(
        {
            "image_id": pa.array([r[0] for r in rows], type=pa.string()),
            "bytes": pa.array([r[1] for r in rows], type=pa.binary()),
            "w": pa.array([4] * len(rows), type=pa.int32()),
            "h": pa.array([4] * len(rows), type=pa.int32()),
            "fmt": pa.array(["png" if i % 2 else "jpeg"
                             for i in range(len(rows))], type=pa.string()),
            "caption": pa.array([r[3] for r in rows], type=pa.string()),
            "phash": pa.array([r[2] for r in rows], type=pa.int64()),
        }
    )
    d = tmp_path / "corpus_cap"
    d.mkdir()
    pq.write_table(t, d / "part-0.parquet")
    return str(d)


def test_image_format_stats_planted(ray_session, tmp_path):
    from humid_ray.pipelines.images import image_format_stats

    corpus = _corpus_cap(tmp_path, COLLIDE_ROWS)
    out = (image_format_stats(corpus).to_pandas()
           .sort_values("fmt").reset_index(drop=True))
    # rows 0,2,4 jpeg; rows 1,3,5 png; every payload is 2 bytes
    assert out.fmt.tolist() == ["jpeg", "png"]
    assert out.n.tolist() == [3, 3]
    assert out.total_bytes.tolist() == [6, 6]
    assert out.avg_bytes.tolist() == [2.0, 2.0]


def test_caption_collisions_planted(ray_session, tmp_path):
    from humid_ray.pipelines.images import caption_collisions

    corpus = _corpus_cap(tmp_path, COLLIDE_ROWS)
    out = caption_collisions(corpus).to_pandas()
    # only "same caption" spans >1 distinct payload (3 variants, 4 rows)
    assert out.caption.tolist() == ["same caption"]
    assert out.n_rows.tolist() == [4]
    assert out.n_variants.tolist() == [3]


def test_caption_phash_neardup_planted(ray_session, tmp_path):
    from humid_ray.pipelines.images import caption_phash_neardup

    corpus = _corpus_cap(tmp_path, COLLIDE_ROWS)
    out = (caption_phash_neardup(corpus, max_distance=2).to_pandas()
           .sort_values(["image_a", "image_b"]).reset_index(drop=True))
    # within "same caption": nodes (0x10 rep=img_a, 0x11 rep=img_c),
    # Hamming=1 <= 2 -> one pair; img_e excluded (null phash); img_f
    # excluded (empty caption); img_d alone in its caption group
    assert out.image_a.tolist() == ["img_a"]
    assert out.image_b.tolist() == ["img_c"]
    assert out.dist.tolist() == [1]


def test_tiered_dedup_report_images_planted(ray_session, tmp_path):
    from humid_ray.pipelines.images import tiered_dedup_report_images

    corpus = _corpus_cap(tmp_path, COLLIDE_ROWS)
    out = tiered_dedup_report_images(corpus).to_pandas()
    assert out.tier.tolist() == [0, 1, 2, 3]
    assert out.name.tolist() == ["total", "usable", "exact_bytes",
                                 "phash_cluster"]
    # 6 rows; 5 usable (img_e null phash); 4 distinct payloads among
    # usable (img_a == img_b); phashes {0x10, 0x11, 0x40, 0xF0}:
    # 0x10~0x11 merge (Hamming 1) -> 3 clusters
    assert out.survivors.tolist() == [6, 5, 4, 3]
    assert out.removed.tolist() == [0, 1, 1, 1]


def test_new_image_ops_empty_corpus(ray_session, tmp_path):
    from humid_ray.pipelines.images import (
        caption_collisions, caption_phash_neardup, image_format_stats,
        tiered_dedup_report_images,
    )

    corpus = _corpus_cap(tmp_path, [])
    assert image_format_stats(corpus).count() == 0
    assert caption_collisions(corpus).count() == 0
    assert caption_phash_neardup(corpus).count() == 0
    rep = tiered_dedup_report_images(corpus).to_pandas()
    assert rep.survivors.tolist() == [0, 0, 0, 0]
    assert rep.removed.tolist() == [0, 0, 0, 0]


# --- round-3: quality-aware (keep-best) image curation ---------------------

BEST_ROWS = [
    # (image_id, bytes, phash) — Hamming cluster {a, b, c} where the
    # LARGEST payload belongs to img_c (not the min id), byte-dup pair
    # {a, b}; img_d isolated; img_e unusable.
    ("img_a", b"\x01\x02\x03\x04", 0x10),
    ("img_b", b"\x01\x02\x03\x04", 0x10),
    ("img_c", b"\x05\x06\x07\x08\x09\x0a", 0x11),
    ("img_d", b"\x99\x99", 0xF0),
    ("img_e", b"", None),
]


def test_curate_images_keep_best_planted(ray_session, tmp_path):
    from humid_ray.pipelines.images import curate_images_keep_best

    corpus = _corpus(tmp_path, BEST_ROWS)
    out = (curate_images_keep_best(corpus).to_pandas()
           .sort_values("image_id").reset_index(drop=True))
    assert out.image_id.tolist() == ["img_a", "img_b", "img_c", "img_d"]
    assert out.canonical_id.tolist() == ["img_a", "img_a", "img_c", "img_d"]
    # cluster {a, b, c}: img_c has the longest payload -> rep, even
    # though img_a is the min id
    assert out.cluster_rep.tolist() == ["img_c", "img_c", "img_c", "img_d"]
    assert out.keep.tolist() == [False, False, True, True]


def test_curate_images_keep_best_tie_min_id(ray_session, tmp_path):
    """Equal payload lengths fall back to min image_id (and byte-dup
    pairs always tie, so every cluster has a deterministic rep)."""
    from humid_ray.pipelines.images import curate_images_keep_best

    corpus = _corpus(tmp_path, ROWS)  # cluster {a,b,c}: max ln = 4 @ a,b
    out = (curate_images_keep_best(corpus).to_pandas()
           .sort_values("image_id").reset_index(drop=True))
    assert out.cluster_rep.tolist() == ["img_a", "img_a", "img_a", "img_d"]
    assert out.keep.tolist() == [True, False, False, True]


def test_curate_images_keep_best_matches_duckdb(ray_session, tmp_path):
    import duckdb

    from humid_ray.pipelines.images import (
        curate_images_keep_best, curate_images_keep_best_sql,
    )

    corpus = _corpus(tmp_path, BEST_ROWS)
    mine = (curate_images_keep_best(corpus).to_pandas()
            .sort_values("image_id").reset_index(drop=True))
    oracle = (duckdb.sql(curate_images_keep_best_sql(f"{corpus}/*.parquet"))
              .df().sort_values("image_id").reset_index(drop=True))
    for col in ("image_id", "canonical_id", "cluster_rep", "keep"):
        assert mine[col].tolist() == oracle[col].tolist()


def test_curate_images_keep_best_join_branch(ray_session, tmp_path):
    from humid_ray.pipelines.images import curate_images_keep_best

    corpus = _corpus(tmp_path, BEST_ROWS)
    a = (curate_images_keep_best(corpus).to_pandas()
         .sort_values("image_id").reset_index(drop=True))
    b = (curate_images_keep_best(corpus, broadcast_max_labels=0).to_pandas()
         .sort_values("image_id").reset_index(drop=True))
    assert a.equals(b)


# --- round-3: top duplicated clusters + caption/payload correlation --------

DUP_ROWS = [
    # cluster {0x10, 0x11}: 4 rows; cluster {0xF0}: 2 rows; {0x40}: 1
    ("img_a", b"\x01", 0x10),
    ("img_b", b"\x02", 0x10),
    ("img_c", b"\x03", 0x11),
    ("img_d", b"\x04", 0x11),
    ("img_e", b"\x05", 0xF0),
    ("img_f", b"\x06", 0xF0),
    ("img_g", b"\x07", 0x40),
    ("img_h", b"", None),  # unusable
]


def test_top_dup_clusters_planted(ray_session, tmp_path):
    from humid_ray.pipelines.images import top_dup_clusters

    corpus = _corpus(tmp_path, DUP_ROWS)
    out = top_dup_clusters(corpus, k=2).to_pandas()
    assert out.rep_sig.tolist() == [0x10, 0xF0]
    assert out.n_images.tolist() == [4, 2]
    full = top_dup_clusters(corpus, k=10).to_pandas()
    assert full.rep_sig.tolist() == [0x10, 0xF0, 0x40]
    assert full.n_images.tolist() == [4, 2, 1]


def test_top_dup_clusters_matches_duckdb(ray_session, tmp_path):
    import duckdb

    from humid_ray.pipelines.images import (
        top_dup_clusters, top_dup_clusters_sql,
    )

    corpus = _corpus(tmp_path, DUP_ROWS)
    mine = top_dup_clusters(corpus, k=2).to_pandas()
    oracle = duckdb.sql(top_dup_clusters_sql(f"{corpus}/*.parquet", k=2)).df()
    assert mine.rep_sig.tolist() == oracle.rep_sig.tolist()
    assert mine.n_images.tolist() == oracle.n_images.tolist()


def test_top_dup_clusters_unsigned_rep(ray_session, tmp_path):
    """rep_sig is the UNSIGNED-min member: a phash with the sign bit
    set (negative int64 view) must lose to a small positive one."""
    from humid_ray.pipelines.images import top_dup_clusters

    neg = np.uint64(0x8000000000000010).astype(np.int64).item()
    neg2 = np.uint64(0x8000000000000011).astype(np.int64).item()
    rows = [("img_a", b"\x01", neg), ("img_b", b"\x02", neg2)]
    corpus = _corpus(tmp_path, rows)
    out = top_dup_clusters(corpus, k=5).to_pandas()
    # one Hamming-1 cluster; unsigned min = ...10 (int64-negative view)
    assert out.rep_sig.tolist() == [neg]
    assert out.n_images.tolist() == [2]


def test_top_dup_clusters_empty(ray_session, tmp_path):
    from humid_ray.pipelines.images import top_dup_clusters

    corpus = _corpus(tmp_path, [])
    assert top_dup_clusters(corpus).count() == 0


def test_caption_payload_corr_matches_numpy_and_duckdb(ray_session, tmp_path):
    import duckdb

    from humid_ray.pipelines.images import (
        caption_payload_corr, caption_payload_corr_sql,
    )

    rng = np.random.default_rng(7)
    rows = []
    for i in range(50):
        nb = int(rng.integers(1, 400))
        rows.append((f"img_{i:03d}", bytes(rng.integers(0, 256, nb).astype(np.uint8)), i))
    t = pa.table({
        "image_id": pa.array([r[0] for r in rows], type=pa.string()),
        "bytes": pa.array([r[1] for r in rows], type=pa.binary()),
        "w": pa.array([4] * len(rows), type=pa.int32()),
        "h": pa.array([4] * len(rows), type=pa.int32()),
        "fmt": pa.array(["png"] * len(rows), type=pa.string()),
        "caption": pa.array(
            ["x" * int(rng.integers(0, 60)) for _ in rows], type=pa.string()
        ),
        "phash": pa.array([r[2] for r in rows], type=pa.int64()),
    })
    d = tmp_path / "corpus"
    d.mkdir()
    import pyarrow.parquet as _pq
    _pq.write_table(t, d / "part-0.parquet")

    out = caption_payload_corr(str(d)).to_pandas()
    x = np.array([len(c) for c in t.column("caption").to_pylist()])
    y = np.array([len(b) for b in t.column("bytes").to_pylist()])
    expect = np.corrcoef(x, y)[0, 1]
    assert out.n_rows.tolist() == [50]
    assert abs(out["corr"].iloc[0] - expect) < 1e-6

    oracle = duckdb.sql(caption_payload_corr_sql(f"{d}/*.parquet")).df()
    assert out["corr"].iloc[0] == oracle["corr"].iloc[0]
    assert out.n_rows.iloc[0] == oracle.n_rows.iloc[0]


def test_caption_payload_corr_degenerate(ray_session, tmp_path):
    """Zero variance (constant captions) -> NULL corr; row count still
    reported."""
    from humid_ray.pipelines.images import caption_payload_corr

    rows = [("img_a", b"\x01\x02", 1), ("img_b", b"\x03", 2)]
    corpus = _corpus(tmp_path, rows)  # captions differ -> use constant
    import pandas as pd
    out = caption_payload_corr(corpus).to_pandas()
    assert out.n_rows.tolist() == [2]
    # _corpus gives distinct captions ("cap img_a"/"cap img_b") of EQUAL
    # length -> x variance 0 -> NULL
    assert pd.isna(out["corr"].iloc[0])


# --- incremental image dedup -------------------------------------------------

def _incr_rows(rng, n=60):
    """Corpus with planted byte-dup groups and Hamming-1 phash pairs."""
    rows = []
    for i in range(n):
        g = i % 7
        if g == 0:
            payload = b"shared-payload-A"       # byte-dup group
            ph = 0x100
        elif g == 1:
            payload = bytes(rng.integers(0, 256, 24).astype(np.uint8))
            ph = 0x101                           # Hamming(0x100,0x101)=1
        elif g == 2:
            payload = b"shared-payload-B"
            ph = 0x200
        elif g == 3:
            payload = bytes(rng.integers(0, 256, 16).astype(np.uint8))
            ph = None                            # unusable
        else:
            payload = bytes(rng.integers(0, 256, 20).astype(np.uint8))
            ph = int(rng.integers(0, 2**62))     # scattered
        rows.append((f"img_{i:04d}", payload, ph))
    return rows


def test_incremental_image_dedup_oracle_and_bruteforce(ray_session, tmp_path):
    """Engine == DuckDB oracle == an independent numpy brute force on
    a planted corpus (byte-dup groups, Hamming-1 pairs, null phash)."""
    import duckdb

    from humid_ray.pipelines.images import (
        incremental_image_dedup, incremental_image_dedup_sql,
    )
    from humid_ray.stages.joins import hash_string_column

    rng = np.random.default_rng(11)
    rows = _incr_rows(rng)
    corpus = _corpus(tmp_path, rows)
    # wide split so both sides are populated on 60 rows
    out = (incremental_image_dedup(corpus, new_pct=40, n_buckets=100)
           .to_pandas().sort_values("image_id").reset_index(drop=True))
    oracle = (duckdb.sql(
        incremental_image_dedup_sql(f"{corpus}/*.parquet",
                                    new_pct=40, n_buckets=100)
    ).df().sort_values("image_id").reset_index(drop=True))
    assert out.image_id.tolist() == oracle.image_id.tolist()
    assert out.exact_dup.tolist() == oracle.exact_dup.tolist()
    assert out.exact_rep.fillna("-").tolist() == \
        oracle.exact_rep.fillna("-").tolist()
    assert out.near_dup.tolist() == oracle.near_dup.tolist()
    assert out.near_rep.fillna("-").tolist() == \
        oracle.near_rep.fillna("-").tolist()

    # independent brute force (no SQL, no engine machinery)
    usable = [r for r in rows if r[2] is not None]
    ids = pa.array([r[0] for r in usable], type=pa.string())
    is_new = (hash_string_column(ids) % np.uint64(100)) < np.uint64(40)
    new = [r for r, m in zip(usable, is_new) if m]
    base = [r for r, m in zip(usable, is_new) if not m]
    assert len(new) > 5 and len(base) > 5  # both sides exercised
    expect = {}
    for rid, payload, ph in new:
        ex = sorted(b[0] for b in base if b[1] == payload)
        nr = sorted(b[0] for b in base
                    if bin((b[2] ^ ph) & (2**64 - 1)).count("1") <= 1)
        expect[rid] = (ex[0] if ex else None, nr[0] if nr else None)
    assert set(out.image_id) == set(expect)
    for _, r in out.iterrows():
        ex, nr = expect[r.image_id]
        assert (r.exact_rep if r.exact_dup else None) == ex, r.image_id
        assert (r.near_rep if r.near_dup else None) == nr, r.image_id


def test_incremental_image_dedup_join_branch_equals_broadcast(
        ray_session, tmp_path):
    """broadcast_max_base=0 forces the three-join scale path; the
    default broadcast probe kernel must produce identical rows."""
    from humid_ray.pipelines.images import incremental_image_dedup

    rng = np.random.default_rng(11)
    corpus = _corpus(tmp_path, _incr_rows(rng))
    a = (incremental_image_dedup(corpus, new_pct=40, n_buckets=100)
         .to_pandas().sort_values("image_id").reset_index(drop=True))
    b = (incremental_image_dedup(corpus, new_pct=40, n_buckets=100,
                                 broadcast_max_base=0)
         .to_pandas().sort_values("image_id").reset_index(drop=True))
    assert len(a) > 0 and a.equals(b)


def test_incremental_image_dedup_degenerate_splits(ray_session, tmp_path):
    """new_pct=0 -> no new rows -> empty; new_pct=n_buckets -> empty
    base -> every new row novel on both tiers."""
    from humid_ray.pipelines.images import incremental_image_dedup

    corpus = _corpus(tmp_path, ROWS)
    assert incremental_image_dedup(corpus, new_pct=0).count() == 0
    out = (incremental_image_dedup(corpus, new_pct=100)
           .to_pandas().sort_values("image_id").reset_index(drop=True))
    # all four usable rows appear, none a dup (base is empty)
    assert out.image_id.tolist() == ["img_a", "img_b", "img_c", "img_d"]
    assert not out.exact_dup.any() and not out.near_dup.any()
    assert out.exact_rep.isna().all() and out.near_rep.isna().all()


def test_incremental_image_dedup_empty(ray_session, tmp_path):
    from humid_ray.pipelines.images import incremental_image_dedup

    corpus = _corpus(tmp_path, [])
    assert incremental_image_dedup(corpus).count() == 0


# --- phash distance histogram -----------------------------------------------

def test_phash_distance_histogram_planted(ray_session, tmp_path):
    """Engine == in-test DuckDB oracle == numpy brute force on a
    corpus whose distinct-phash pair distances are hand-checkable."""
    import duckdb

    from humid_ray.pipelines.images import (
        phash_distance_histogram, phash_distance_histogram_sql,
    )

    # distinct sigs: 0b0000, 0b0001, 0b0011, 0b10111, far outlier
    phs = [0b0000, 0b0001, 0b0011, 0b10111, 1 << 40]
    rows = [(f"img_{i}", bytes([i]), p) for i, p in enumerate(phs)]
    rows.append(("img_dup", b"\xff", 0b0000))  # duplicate sig collapses
    rows.append(("img_null", b"\xfe", None))   # unusable
    corpus = _corpus(tmp_path, rows)

    out = (phash_distance_histogram(corpus, max_distance=4)
           .to_pandas().sort_values("dist").reset_index(drop=True))
    # brute force over distinct sigs
    import itertools
    expect = {}
    for a, b in itertools.combinations(sorted(set(phs)), 2):
        d = bin(a ^ b).count("1")
        if d <= 4:
            expect[d] = expect.get(d, 0) + 1
    assert dict(zip(out.dist, out.n_pairs)) == expect

    oracle = (duckdb.sql(
        phash_distance_histogram_sql(f"{corpus}/*.parquet", max_distance=4)
    ).df().sort_values("dist").reset_index(drop=True))
    assert out.dist.tolist() == oracle.dist.tolist()
    assert out.n_pairs.tolist() == oracle.n_pairs.tolist()


def test_phash_distance_histogram_random_vs_bruteforce(ray_session,
                                                       tmp_path):
    """Randomized parity: clustered random sigs, engine vs numpy."""
    from humid_ray.pipelines.images import phash_distance_histogram

    rng = np.random.default_rng(5)
    # bit 63 excluded from centers AND flips: test sigs stay < 2^63 so
    # Python-int -> int64 conversions below can't overflow on a seed
    # change (the engine's uint64 view handles negatives; the planted
    # test covers that via ROWS)
    centers = rng.integers(0, 2**62, 8, dtype=np.int64)
    sigs = []
    for c in centers:
        sigs.append(int(c))
        for _ in range(6):  # scatter within radius ~3
            v = int(c)
            for bit in rng.integers(0, 63, int(rng.integers(0, 4))):
                v ^= 1 << int(bit)
            sigs.append(v)
    rows = [(f"img_{i:03d}", bytes([i % 251]), s)
            for i, s in enumerate(sigs)]
    corpus = _corpus(tmp_path, rows)
    out = (phash_distance_histogram(corpus, max_distance=3)
           .to_pandas().sort_values("dist").reset_index(drop=True))
    uniq = np.array(sorted(set(sigs)), dtype=np.int64).view(np.uint64)
    x = uniq[:, None] ^ uniq[None, :]
    d = np.zeros_like(x, dtype=np.int64)
    for shift in range(64):
        d += ((x >> np.uint64(shift)) & np.uint64(1)).astype(np.int64)
    iu = np.triu_indices(len(uniq), k=1)
    dv = d[iu]
    expect = {int(k): int(v) for k, v in
              zip(*np.unique(dv[dv <= 3], return_counts=True))}
    assert dict(zip(out.dist, out.n_pairs)) == expect


def test_phash_distance_histogram_empty(ray_session, tmp_path):
    from humid_ray.pipelines.images import phash_distance_histogram

    corpus = _corpus(tmp_path, [])
    assert phash_distance_histogram(corpus).count() == 0


# --- dup rate by format ------------------------------------------------------

def test_dup_rate_by_format_planted(ray_session, tmp_path):
    """Cross-format byte-dup counting matches an in-test DuckDB oracle
    and a hand-derived expectation."""
    import duckdb

    from humid_ray.pipelines.images import (
        dup_rate_by_format, dup_rate_by_format_sql,
    )

    rows = [
        ("img_a", b"dup-1", 1), ("img_b", b"dup-1", 2),   # png dup pair
        ("img_c", b"dup-2", 3), ("img_d", b"dup-2", 4),   # png/jpg cross
        ("img_e", b"uniq-1", 5), ("img_f", b"uniq-2", None),
    ]
    t = pa.table({
        "image_id": pa.array([r[0] for r in rows], type=pa.string()),
        "bytes": pa.array([r[1] for r in rows], type=pa.binary()),
        "w": pa.array([4] * len(rows), type=pa.int32()),
        "h": pa.array([4] * len(rows), type=pa.int32()),
        "fmt": pa.array(["png", "png", "png", "jpg", "jpg", "png"],
                        type=pa.string()),
        "caption": pa.array([f"cap {r[0]}" for r in rows],
                            type=pa.string()),
        "phash": pa.array([r[2] for r in rows], type=pa.int64()),
    })
    d = tmp_path / "corpus"
    d.mkdir()
    pq.write_table(t, d / "part-0.parquet")

    out = (dup_rate_by_format(str(d)).to_pandas()
           .sort_values("fmt").reset_index(drop=True))
    # jpg: img_d (dup via cross-format pair), img_e unique -> 2 rows 1 dup
    # png: a,b dup; c dup (cross); f unique -> 4 rows 3 dup
    assert out.fmt.tolist() == ["jpg", "png"]
    assert out.n_images.tolist() == [2, 4]
    assert out.n_dup_images.tolist() == [1, 3]

    oracle = (duckdb.sql(dup_rate_by_format_sql(f"{d}/*.parquet")).df()
              .sort_values("fmt").reset_index(drop=True))
    assert out.fmt.tolist() == oracle.fmt.tolist()
    assert out.n_images.tolist() == oracle.n_images.tolist()
    assert out.n_dup_images.tolist() == oracle.n_dup_images.tolist()


def test_dup_rate_by_format_empty(ray_session, tmp_path):
    from humid_ray.pipelines.images import dup_rate_by_format

    corpus = _corpus(tmp_path, [])
    assert dup_rate_by_format(corpus).count() == 0


# --- image size quantiles ----------------------------------------------------

def test_image_size_quantiles_planted(ray_session, tmp_path):
    """Per-format discrete quantiles match DuckDB quantile_disc and a
    numpy expectation on hand-sized payloads."""
    import duckdb

    from humid_ray.pipelines.images import (
        image_size_quantiles, image_size_quantiles_sql,
    )

    rng = np.random.default_rng(3)
    rows, fmts = [], []
    sizes = {"png": [], "jpg": []}
    for i in range(40):
        fmt = "png" if i % 2 == 0 else "jpg"
        nb = int(rng.integers(1, 500))
        sizes[fmt].append(nb)
        rows.append((f"img_{i:03d}",
                     bytes(rng.integers(0, 256, nb).astype(np.uint8)), i))
        fmts.append(fmt)
    t = pa.table({
        "image_id": pa.array([r[0] for r in rows], type=pa.string()),
        "bytes": pa.array([r[1] for r in rows], type=pa.binary()),
        "w": pa.array([4] * len(rows), type=pa.int32()),
        "h": pa.array([4] * len(rows), type=pa.int32()),
        "fmt": pa.array(fmts, type=pa.string()),
        "caption": pa.array([f"cap {r[0]}" for r in rows],
                            type=pa.string()),
        "phash": pa.array([r[2] for r in rows], type=pa.int64()),
    })
    d = tmp_path / "corpus"
    d.mkdir()
    pq.write_table(t, d / "part-0.parquet")

    out = (image_size_quantiles(str(d)).to_pandas()
           .sort_values("fmt").reset_index(drop=True))
    oracle = (duckdb.sql(image_size_quantiles_sql(f"{d}/*.parquet")).df()
              .sort_values("fmt").reset_index(drop=True))
    import math
    for fmt in ("jpg", "png"):
        vals = np.sort(np.array(sizes[fmt]))
        r = out[out.fmt == fmt].iloc[0]
        assert r.n_images == len(vals)
        for col, q in zip(("p25", "p50", "p75", "p90", "p99"),
                          (0.25, 0.5, 0.75, 0.9, 0.99)):
            assert r[col] == vals[math.ceil(q * len(vals)) - 1], (fmt, col)
    for col in ("fmt", "n_images", "p25", "p50", "p75", "p90", "p99"):
        assert out[col].tolist() == oracle[col].tolist(), col


def test_image_size_quantiles_empty(ray_session, tmp_path):
    from humid_ray.pipelines.images import image_size_quantiles

    corpus = _corpus(tmp_path, [])
    assert image_size_quantiles(corpus).count() == 0


# --- caption language mixture ------------------------------------------------

def test_caption_langid_hist_planted(ray_session, tmp_path):
    """Caption-language histogram matches the documents LangId scorer
    applied per caption, and the in-test DuckDB oracle."""
    import duckdb

    from humid_ray.pipelines.images import (
        caption_langid_hist, caption_langid_hist_sql,
    )
    from humid_ray.pipelines.textstats import LangId

    caps = [
        "the weather in there is rather fine",   # en-ish
        "ich bin ein berliner und schreibe",      # de-ish
        "le monde est grand et les gens",         # fr-ish
        "0123 9999",                               # no profile bigram -> und
        "",                                        # empty -> und
    ] * 4
    rows = [(f"img_{i:03d}", bytes([i]), i) for i in range(len(caps))]
    t = pa.table({
        "image_id": pa.array([r[0] for r in rows], type=pa.string()),
        "bytes": pa.array([r[1] for r in rows], type=pa.binary()),
        "w": pa.array([4] * len(rows), type=pa.int32()),
        "h": pa.array([4] * len(rows), type=pa.int32()),
        "fmt": pa.array(["png"] * len(rows), type=pa.string()),
        "caption": pa.array(caps, type=pa.string()),
        "phash": pa.array([r[2] for r in rows], type=pa.int64()),
    })
    d = tmp_path / "corpus"
    d.mkdir()
    pq.write_table(t, d / "part-0.parquet")

    out = (caption_langid_hist(str(d)).to_pandas()
           .sort_values("lang_pred").reset_index(drop=True))
    # reference: run the documents scorer on the captions directly
    ref = LangId()(pa.table({"doc_id": pa.array(range(len(caps))),
                             "text": pa.array(caps, type=pa.string())}))
    import collections
    expect = collections.Counter(ref.column("lang_pred").to_pylist())
    assert dict(zip(out.lang_pred, out.n_captions)) == dict(expect)

    oracle = (duckdb.sql(caption_langid_hist_sql(f"{d}/*.parquet")).df()
              .sort_values("lang_pred").reset_index(drop=True))
    assert out.lang_pred.tolist() == oracle.lang_pred.tolist()
    assert out.n_captions.tolist() == oracle.n_captions.tolist()


def test_caption_langid_hist_empty(ray_session, tmp_path):
    from humid_ray.pipelines.images import caption_langid_hist

    corpus = _corpus(tmp_path, [])
    assert caption_langid_hist(corpus).count() == 0


# --- eval-set decontamination (image axis) ----------------------------------

def test_decontaminate_images_oracle_and_bruteforce(ray_session, tmp_path):
    """Engine == DuckDB oracle == an independent numpy brute force on
    the planted incremental-dedup corpus (byte-dup groups, Hamming-1
    phash pairs, null phash)."""
    import duckdb

    from humid_ray.pipelines.images import (
        decontaminate_images, decontaminate_images_sql,
    )
    from humid_ray.stages.joins import hash_string_column

    rng = np.random.default_rng(23)
    rows = _incr_rows(rng)
    corpus = _corpus(tmp_path, rows)
    out = (decontaminate_images(corpus, eval_pct=40, n_buckets=100)
           .to_pandas().sort_values("image_id").reset_index(drop=True))
    oracle = (duckdb.sql(
        decontaminate_images_sql(f"{corpus}/*.parquet",
                                 eval_pct=40, n_buckets=100)
    ).df().sort_values("image_id").reset_index(drop=True))
    assert out.image_id.tolist() == oracle.image_id.tolist()
    assert out.exact_contam.tolist() == oracle.exact_contam.tolist()
    assert out.near_contam.tolist() == oracle.near_contam.tolist()

    # independent brute force (no SQL, no engine machinery)
    usable = [r for r in rows if r[2] is not None]
    ids = pa.array([r[0] for r in usable], type=pa.string())
    is_eval = (hash_string_column(ids) % np.uint64(100)) < np.uint64(40)
    ev = [r for r, m in zip(usable, is_eval) if m]
    tr = [r for r, m in zip(usable, is_eval) if not m]
    assert len(ev) > 5 and len(tr) > 5  # both sides exercised
    ev_bytes = {r[1] for r in ev}
    ev_ph = {r[2] for r in ev}
    expect = {
        rid: (payload in ev_bytes,
              any(bin((p ^ ph) & (2**64 - 1)).count("1") <= 1
                  for p in ev_ph))
        for rid, payload, ph in tr
    }
    assert set(out.image_id) == set(expect)
    for _, r in out.iterrows():
        assert (r.exact_contam, r.near_contam) == expect[r.image_id], \
            r.image_id
    # the planted corpus must actually exercise both contamination
    # tiers (byte-dup groups + Hamming-1 pairs straddle the split)
    assert out.exact_contam.any() and out.near_contam.any()


def test_decontaminate_images_distance2_bruteforce(ray_session, tmp_path):
    """max_distance=2 probes (the triu pair masks) vs brute force."""
    from humid_ray.pipelines.images import decontaminate_images
    from humid_ray.stages.joins import hash_string_column

    rng = np.random.default_rng(31)
    rows = _incr_rows(rng, n=40)
    corpus = _corpus(tmp_path, rows)
    out = (decontaminate_images(corpus, eval_pct=40, n_buckets=100,
                                max_distance=2)
           .to_pandas().sort_values("image_id").reset_index(drop=True))
    usable = [r for r in rows if r[2] is not None]
    ids = pa.array([r[0] for r in usable], type=pa.string())
    is_eval = (hash_string_column(ids) % np.uint64(100)) < np.uint64(40)
    ev_ph = {r[2] for r, m in zip(usable, is_eval) if m}
    tr = [r for r, m in zip(usable, is_eval) if not m]
    expect = {rid: any(bin((p ^ ph) & (2**64 - 1)).count("1") <= 2
                       for p in ev_ph)
              for rid, _, ph in tr}
    assert dict(zip(out.image_id, out.near_contam)) == expect


def test_decontaminate_images_degenerate_splits(ray_session, tmp_path):
    """eval_pct=0 -> empty eval -> nothing contaminated;
    eval_pct=100 -> empty train -> empty output; distance>2 raises."""
    import pytest as _pytest

    from humid_ray.pipelines.images import decontaminate_images

    corpus = _corpus(tmp_path, ROWS)
    out = (decontaminate_images(corpus, eval_pct=0)
           .to_pandas().sort_values("image_id").reset_index(drop=True))
    assert out.image_id.tolist() == ["img_a", "img_b", "img_c", "img_d"]
    assert not out.exact_contam.any() and not out.near_contam.any()
    assert decontaminate_images(corpus, eval_pct=100).count() == 0
    with _pytest.raises(ValueError):
        decontaminate_images(corpus, max_distance=3).count()


def test_decontaminate_images_empty(ray_session, tmp_path):
    from humid_ray.pipelines.images import decontaminate_images

    corpus = _corpus(tmp_path, [])
    assert decontaminate_images(corpus).count() == 0


# --- signature-health audit (per-bit pHash statistics) -----------------------

def test_phash_bit_stats_planted(ray_session, tmp_path):
    """Hand-checkable bit counts incl. the int64 sign bit, plus
    DuckDB parity on the same corpus."""
    import duckdb

    from humid_ray.pipelines.images import (
        phash_bit_stats, phash_bit_stats_sql,
    )

    rows = [
        ("img_a", b"\x01", -1),      # all 64 bits set
        ("img_b", b"\x02", 0),       # no bits
        ("img_c", b"\x03", 0x10),    # bit 4 only
        ("img_d", b"", None),        # unusable, excluded
    ]
    corpus = _corpus(tmp_path, rows)
    out = (phash_bit_stats(corpus).to_pandas()
           .sort_values("bit").reset_index(drop=True))
    assert out.bit.tolist() == list(range(64))
    assert (out.n_rows == 3).all()
    expect = [2 if b == 4 else 1 for b in range(64)]
    assert out.n_ones.tolist() == expect

    oracle = (duckdb.sql(phash_bit_stats_sql(f"{corpus}/*.parquet")).df()
              .sort_values("bit").reset_index(drop=True))
    assert out.bit.tolist() == oracle.bit.tolist()
    assert out.n_ones.tolist() == oracle.n_ones.tolist()
    assert out.n_rows.tolist() == oracle.n_rows.tolist()


def test_phash_bit_stats_random_vs_numpy(ray_session, tmp_path):
    """Random multi-row corpus vs a direct numpy popcount-per-bit."""
    from humid_ray.pipelines.images import phash_bit_stats

    rng = np.random.default_rng(7)
    ph = rng.integers(-2**63, 2**63, 500, dtype=np.int64)
    rows = [(f"img_{i:04d}", bytes([i % 256]), int(p))
            for i, p in enumerate(ph)]
    corpus = _corpus(tmp_path, rows)
    out = (phash_bit_stats(corpus).to_pandas()
           .sort_values("bit").reset_index(drop=True))
    expect = [int(((ph.view(np.uint64) >> np.uint64(b))
                   & np.uint64(1)).sum()) for b in range(64)]
    assert out.n_ones.tolist() == expect
    assert (out.n_rows == 500).all()


def test_phash_bit_stats_empty(ray_session, tmp_path):
    """Empty corpus still yields the full 64-row report (all zero)."""
    from humid_ray.pipelines.images import phash_bit_stats

    corpus = _corpus(tmp_path, [])
    out = (phash_bit_stats(corpus).to_pandas()
           .sort_values("bit").reset_index(drop=True))
    assert out.bit.tolist() == list(range(64))
    assert (out.n_ones == 0).all() and (out.n_rows == 0).all()


# --- label-noise audit: captions per near-dup cluster ------------------------

def test_cluster_caption_consistency_planted(ray_session, tmp_path):
    """Planted clusters with known caption multiplicity, plus DuckDB
    parity: {0x10,0x11} carries 2 captions, 0xF0 carries 1, 0x200
    carries 2 (two rows, two captions); null phash excluded."""
    import duckdb

    from humid_ray.pipelines.images import (
        cluster_caption_consistency, cluster_caption_consistency_sql,
    )

    rows = [
        ("img_a", b"\x01", 0x10, "capX"),
        ("img_b", b"\x02", 0x10, "capX"),     # same caption, same phash
        ("img_c", b"\x03", 0x11, "capY"),     # Hamming-1 neighbor
        ("img_d", b"\x04", 0xF0, "capZ"),     # isolated, 1 caption
        ("img_e", b"\x05", 0x200, "capP"),    # isolated phash ...
        ("img_f", b"\x06", 0x200, "capQ"),    # ... with 2 captions
        ("img_g", b"", None, "capN"),         # unusable
    ]
    corpus = _corpus_cap(tmp_path, rows)
    out = (cluster_caption_consistency(corpus).to_pandas()
           .sort_values("n_captions").reset_index(drop=True))
    assert dict(zip(out.n_captions, out.n_clusters)) == {1: 1, 2: 2}

    oracle = (duckdb.sql(
        cluster_caption_consistency_sql(f"{corpus}/*.parquet")
    ).df().sort_values("n_captions").reset_index(drop=True))
    assert out.n_captions.tolist() == oracle.n_captions.tolist()
    assert out.n_clusters.tolist() == oracle.n_clusters.tolist()


def _reencode_png(data: bytes, level: int) -> bytes:
    """Same pixels, different bytes: re-deflate a (filter-0) PNG's raw
    scanlines at another zlib level — the cross-encoder case byte
    identity misses and pixel identity must catch."""
    import struct
    import zlib

    from humid_ray.png import PNG_SIG, _chunk

    pos = len(PNG_SIG)
    ihdr = None
    idat = []
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos:pos + 4])
        tag = data[pos + 4:pos + 8]
        payload = data[pos + 8:pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            ihdr = payload
        elif tag == b"IDAT":
            idat.append(payload)
    raw = zlib.decompress(b"".join(idat))
    out = (PNG_SIG + _chunk(b"IHDR", ihdr)
           + _chunk(b"IDAT", zlib.compress(raw, level))
           + _chunk(b"IEND", b""))
    assert out != data  # the point: different bytes
    return out


def test_pixel_exact_dedup_planted(ray_session, tmp_path):
    """Byte dups AND cross-encoding re-compressions land in one
    pixel-identity group; a lossy re-encode of the same pixels does
    NOT (its decoded pixels differ); undecodable rows are excluded."""
    from humid_ray.pipelines.images import pixel_exact_dedup
    from humid_ray.png import decode_image, encode_fjpg, encode_png

    rng = np.random.default_rng(9)
    base = rng.integers(0, 256, size=(16, 16), dtype=np.uint8)
    other = rng.integers(0, 256, size=(16, 16), dtype=np.uint8)
    p6 = encode_png(base)
    p1 = _reencode_png(p6, 1)          # same pixels, different bytes
    fj = encode_fjpg(base)             # lossy: different pixels
    assert not np.array_equal(decode_image(fj), base)
    rows = [
        ("img_a", p6, "", 0x10),
        ("img_b", p6, "", 0x10),       # byte dup of a
        ("img_c", p1, "", 0x10),       # pixel dup of a, byte-distinct
        ("img_d", fj, "", 0x11),       # lossy re-encode: own group
        ("img_e", encode_png(other), "", 0x400),  # different image
        ("img_f", b"JUNKJUNKJUNK", "", 0x800),    # undecodable
        ("img_g", p6, "", None),       # unusable (null phash)
    ]
    corpus = _fused_corpus(tmp_path, rows, name="pixcorpus")
    out = (pixel_exact_dedup(corpus).to_pandas()
           .sort_values("image_id").set_index("image_id"))
    assert "img_f" not in out.index and "img_g" not in out.index
    assert len(out) == 5
    assert out.loc[["img_a", "img_b", "img_c"], "pixel_rep"].tolist() == \
        ["img_a", "img_a", "img_a"]
    assert out.loc["img_d", "pixel_rep"] == "img_d"
    assert out.loc["img_e", "pixel_rep"] == "img_e"
    assert out.keep.tolist() == [True, False, False, True, True]


def test_cluster_caption_vote_planted(ray_session, tmp_path):
    """Majority caption wins per pHash cluster; count ties break to
    the lexicographically smallest caption; singleton clusters vote
    for their own caption; unusable rows excluded. DuckDB parity on
    the same corpus."""
    import duckdb

    from humid_ray.pipelines.images import (
        cluster_caption_vote, cluster_caption_vote_sql,
    )

    rows = [
        ("img_a", b"\x01", 0x10, "capX"),     # cluster {0x10, 0x11}:
        ("img_b", b"\x02", 0x10, "capX"),     # capX x2 beats capY x1
        ("img_c", b"\x03", 0x11, "capY"),
        ("img_d", b"\x04", 0xF0, "capZ"),     # singleton: own caption
        ("img_e", b"\x05", 0x200, "capQ"),    # tie 1-1 ->
        ("img_f", b"\x06", 0x200, "capP"),    # capP (lex smaller) wins
        ("img_g", b"", None, "capN"),         # unusable: excluded
    ]
    corpus = _corpus_cap(tmp_path, rows)
    out = (cluster_caption_vote(corpus).to_pandas()
           .sort_values("image_id").set_index("image_id"))
    assert len(out) == 6
    assert out.voted_caption.tolist() == [
        "capX", "capX", "capX", "capZ", "capP", "capP"]
    assert out.agree.tolist() == [True, True, False, True, False, True]

    oracle = (duckdb.sql(
        cluster_caption_vote_sql(f"{corpus}/*.parquet")
    ).df().sort_values("image_id").set_index("image_id"))
    assert out.caption.tolist() == oracle.caption.tolist()
    assert out.voted_caption.tolist() == oracle.voted_caption.tolist()
    assert out.agree.tolist() == oracle.agree.tolist()


def test_cluster_caption_vote_join_branch_equals_broadcast(ray_session,
                                                           tmp_path):
    """broadcast_max_labels=0 forces the distributed vote-map join."""
    from humid_ray.pipelines.images import cluster_caption_vote

    rows = [
        ("img_a", b"\x01", 0x10, "capX"),
        ("img_b", b"\x02", 0x10, "capX"),
        ("img_c", b"\x03", 0x11, "capY"),
        ("img_d", b"\x04", 0xF0, "capZ"),
        ("img_e", b"\x05", 0x200, "capQ"),
        ("img_f", b"\x06", 0x200, "capP"),
    ]
    corpus = _corpus_cap(tmp_path, rows)
    a = (cluster_caption_vote(corpus).to_pandas()
         .sort_values("image_id").reset_index(drop=True))
    b = (cluster_caption_vote(corpus, broadcast_max_labels=0).to_pandas()
         .sort_values("image_id").reset_index(drop=True))
    assert len(a) == 6 and a.equals(b)


def test_cluster_caption_consistency_null_caption(ray_session, tmp_path):
    """Null and empty captions coalesce to the same '' identity on
    both engine and oracle sides."""
    import duckdb
    import pyarrow.parquet as _pq

    from humid_ray.pipelines.images import (
        cluster_caption_consistency, cluster_caption_consistency_sql,
    )

    t = pa.table({
        "image_id": pa.array(["a", "b", "c"], type=pa.string()),
        "bytes": pa.array([b"\x01", b"\x02", b"\x03"], type=pa.binary()),
        "w": pa.array([4, 4, 4], type=pa.int32()),
        "h": pa.array([4, 4, 4], type=pa.int32()),
        "fmt": pa.array(["png"] * 3, type=pa.string()),
        "caption": pa.array([None, "", "x"], type=pa.string()),
        "phash": pa.array([0x40, 0x40, 0x41], type=pa.int64()),
    })
    d = tmp_path / "corpus_null"
    d.mkdir()
    _pq.write_table(t, d / "part-0.parquet")
    out = (cluster_caption_consistency(str(d)).to_pandas()
           .sort_values("n_captions").reset_index(drop=True))
    # one cluster {0x40, 0x41}; captions {'', 'x'} (null == '')
    assert dict(zip(out.n_captions, out.n_clusters)) == {2: 1}
    oracle = (duckdb.sql(
        cluster_caption_consistency_sql(f"{d}/*.parquet")
    ).df().sort_values("n_captions").reset_index(drop=True))
    assert out.n_captions.tolist() == oracle.n_captions.tolist()
    assert out.n_clusters.tolist() == oracle.n_clusters.tolist()


def test_cluster_caption_consistency_empty(ray_session, tmp_path):
    from humid_ray.pipelines.images import cluster_caption_consistency

    corpus = _corpus_cap(tmp_path, [])
    assert cluster_caption_consistency(corpus).count() == 0


# --- storage-savings report --------------------------------------------------

def test_dedup_storage_savings_planted(ray_session, tmp_path):
    """Hand-checkable per-format row/byte sums, DuckDB parity, and
    internal consistency with curate_images_keep_best's keep flags."""
    import duckdb

    from humid_ray.pipelines.images import (
        dedup_storage_savings, dedup_storage_savings_sql,
    )

    rows = [
        # _corpus_cap fmt: i=0 jpeg, 1 png, 2 jpeg, 3 png, 4 jpeg
        ("img_a", b"\x01\x02\x03\x04", 0x10, "ca"),       # jpeg, removed
        ("img_b", b"\x01\x02\x03\x04", 0x10, "cb"),       # png, removed
        ("img_c", b"\x05\x06\x07\x08\x09\x0a", 0x11, "cc"),  # jpeg, keeper
        ("img_d", b"\x99\x99", 0xF0, "cd"),               # png, keeper
        ("img_e", b"", None, "ce"),                        # jpeg, excluded
    ]
    corpus = _corpus_cap(tmp_path, rows)
    out = (dedup_storage_savings(corpus).to_pandas()
           .sort_values("fmt").reset_index(drop=True))
    assert out.fmt.tolist() == ["jpeg", "png"]
    assert out.rows_kept.tolist() == [1, 1]
    assert out.rows_removed.tolist() == [1, 1]
    assert out.bytes_kept.tolist() == [6, 2]
    assert out.bytes_removed.tolist() == [4, 4]

    oracle = (duckdb.sql(
        dedup_storage_savings_sql(f"{corpus}/*.parquet")
    ).df().sort_values("fmt").reset_index(drop=True))
    for col in ("fmt", "rows_kept", "rows_removed",
                "bytes_kept", "bytes_removed"):
        assert out[col].tolist() == oracle[col].tolist(), col


def test_dedup_storage_savings_randomized(ray_session, tmp_path):
    """Randomized corpus vs the DuckDB oracle (clusters, byte-dups,
    nulls all present)."""
    import duckdb

    from humid_ray.pipelines.images import (
        dedup_storage_savings, dedup_storage_savings_sql,
    )

    rng = np.random.default_rng(41)
    rows = _incr_rows(rng, n=80)
    corpus = _corpus(tmp_path, rows)
    out = (dedup_storage_savings(corpus).to_pandas()
           .sort_values("fmt").reset_index(drop=True))
    oracle = (duckdb.sql(
        dedup_storage_savings_sql(f"{corpus}/*.parquet")
    ).df().sort_values("fmt").reset_index(drop=True))
    for col in ("fmt", "rows_kept", "rows_removed",
                "bytes_kept", "bytes_removed"):
        assert out[col].tolist() == oracle[col].tolist(), col
    # totals reconcile with the keep-best keep-list itself
    from humid_ray.pipelines.images import curate_images_keep_best
    kb = curate_images_keep_best(corpus).to_pandas()
    assert out.rows_kept.sum() == int(kb.keep.sum())
    assert out.rows_removed.sum() == int((~kb.keep).sum())


def test_dedup_storage_savings_empty(ray_session, tmp_path):
    from humid_ray.pipelines.images import dedup_storage_savings

    corpus = _corpus_cap(tmp_path, [])
    assert dedup_storage_savings(corpus).count() == 0


# --- chaining audit: cluster diameter histogram -------------------------------

def test_cluster_diameter_hist_planted(ray_session, tmp_path):
    """Chain 0x00-0x01-0x03 closes at diameter 2 under distance-1
    edges (the chaining artifact this audit exists to expose); a
    Hamming-1 pair reports 1; an isolated sig reports 0."""
    import duckdb

    from humid_ray.pipelines.images import (
        cluster_diameter_hist, cluster_diameter_hist_sql,
    )

    rows = [
        ("img_a", b"\x01", 0x00, "c"),
        ("img_b", b"\x02", 0x01, "c"),     # 1 from a
        ("img_c", b"\x03", 0x03, "c"),     # 1 from b, 2 from a
        ("img_d", b"\x04", 0xF0, "c"),     # isolated (>=3 from all)
        ("img_e", b"\x05", 0x3C0, "c"),
        ("img_f", b"\x06", 0x3C1, "c"),    # pair at 1 (>=4 from chain)
        ("img_g", b"", None, "c"),          # unusable
    ]
    corpus = _corpus_cap(tmp_path, rows)
    out = (cluster_diameter_hist(corpus).to_pandas()
           .sort_values("diameter").reset_index(drop=True))
    assert dict(zip(out.diameter, out.n_clusters)) == {0: 1, 1: 1, 2: 1}

    oracle = (duckdb.sql(
        cluster_diameter_hist_sql(f"{corpus}/*.parquet")
    ).df().sort_values("diameter").reset_index(drop=True))
    assert out.diameter.tolist() == oracle.diameter.tolist()
    assert out.n_clusters.tolist() == oracle.n_clusters.tolist()


def test_cluster_diameter_hist_randomized(ray_session, tmp_path):
    """Random low-entropy phashes (dense Hamming graph) vs DuckDB."""
    import duckdb

    from humid_ray.pipelines.images import (
        cluster_diameter_hist, cluster_diameter_hist_sql,
    )

    rng = np.random.default_rng(43)
    # 6-bit space forces many collisions, chains, and multi-node
    # clusters at distance 1
    ph = rng.integers(0, 64, 90)
    rows = [(f"img_{i:04d}", bytes([i % 256]), int(p))
            for i, p in enumerate(ph)]
    corpus = _corpus(tmp_path, rows)
    out = (cluster_diameter_hist(corpus).to_pandas()
           .sort_values("diameter").reset_index(drop=True))
    oracle = (duckdb.sql(
        cluster_diameter_hist_sql(f"{corpus}/*.parquet")
    ).df().sort_values("diameter").reset_index(drop=True))
    assert out.diameter.tolist() == oracle.diameter.tolist()
    assert out.n_clusters.tolist() == oracle.n_clusters.tolist()
    # chaining must actually occur in this corpus for the test to bite
    assert out.diameter.max() > 1


def test_cluster_diameter_hist_empty(ray_session, tmp_path):
    from humid_ray.pipelines.images import cluster_diameter_hist

    corpus = _corpus_cap(tmp_path, [])
    assert cluster_diameter_hist(corpus).count() == 0


# --- A/B-axis agreement report ------------------------------------------------

def _bf_agreement(rows, max_distance=1):
    """Brute force: all usable row pairs, caption equality vs
    union-find pHash closure membership."""
    usable = [(rid, ph, cap) for rid, _b, ph, cap in rows if ph is not None]
    sigs = sorted({ph for _r, ph, _c in usable})
    parent = {s: s for s in sigs}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for i, a in enumerate(sigs):
        for b in sigs[i + 1:]:
            if bin((a ^ b) & (2**64 - 1)).count("1") <= max_distance:
                parent[find(a)] = find(b)
    both = cap_only = clus_only = 0
    for i in range(len(usable)):
        for j in range(i + 1, len(usable)):
            same_cap = usable[i][2] == usable[j][2]
            same_clu = find(usable[i][1]) == find(usable[j][1])
            if same_cap and same_clu:
                both += 1
            elif same_cap:
                cap_only += 1
            elif same_clu:
                clus_only += 1
    return {"both": both, "caption_only": cap_only,
            "cluster_only": clus_only}


def test_caption_cluster_agreement_planted(ray_session, tmp_path):
    """Hand-checkable relations + DuckDB parity: cluster {0x10,0x11}
    holds rows a,b,c with captions (same,same,other) -> pairs a-b both,
    a-c/b-c cluster_only; d shares a's caption but not its cluster ->
    caption_only pairs a-d and b-d."""
    import duckdb

    from humid_ray.pipelines.images import (
        caption_cluster_agreement, caption_cluster_agreement_sql,
    )

    rows = [
        ("img_a", b"\x01", 0x10, "capX"),
        ("img_b", b"\x02", 0x10, "capX"),
        ("img_c", b"\x03", 0x11, "capY"),
        ("img_d", b"\x04", 0xF0, "capX"),
        ("img_e", b"", None, "capX"),     # unusable, excluded
    ]
    corpus = _corpus_cap(tmp_path, rows)
    out = (caption_cluster_agreement(corpus).to_pandas()
           .sort_values("relation").reset_index(drop=True))
    got = dict(zip(out.relation, out.n_pairs))
    assert got == {"both": 1, "caption_only": 2, "cluster_only": 2}
    assert got == _bf_agreement(rows)

    oracle = (duckdb.sql(
        caption_cluster_agreement_sql(f"{corpus}/*.parquet")
    ).df().sort_values("relation").reset_index(drop=True))
    assert out.relation.tolist() == oracle.relation.tolist()
    assert out.n_pairs.tolist() == oracle.n_pairs.tolist()


def test_caption_cluster_agreement_randomized(ray_session, tmp_path):
    """Random dense-Hamming corpus with few captions vs brute force
    and DuckDB."""
    import duckdb

    from humid_ray.pipelines.images import (
        caption_cluster_agreement, caption_cluster_agreement_sql,
    )

    rng = np.random.default_rng(47)
    rows = []
    for i in range(70):
        if i % 13 == 5:
            ph = None                          # unusable
        elif i % 3:
            ph = int(rng.integers(0, 48))      # dense Hamming region
        else:
            ph = int(rng.integers(0, 2**62))   # scattered singletons
        cap = f"cap{int(rng.integers(0, 6))}"
        rows.append((f"img_{i:04d}", bytes([i % 256]), ph, cap))
    corpus = _corpus_cap(tmp_path, rows)
    out = (caption_cluster_agreement(corpus).to_pandas()
           .sort_values("relation").reset_index(drop=True))
    got = dict(zip(out.relation, out.n_pairs))
    assert got == _bf_agreement(rows)
    assert min(got.values()) > 0  # all three relations exercised

    oracle = (duckdb.sql(
        caption_cluster_agreement_sql(f"{corpus}/*.parquet")
    ).df().sort_values("relation").reset_index(drop=True))
    assert out.n_pairs.tolist() == oracle.n_pairs.tolist()


def test_caption_cluster_agreement_empty(ray_session, tmp_path):
    """Empty corpus still reports the three relations, all zero (the
    oracle's scalar folds do the same)."""
    from humid_ray.pipelines.images import caption_cluster_agreement

    corpus = _corpus_cap(tmp_path, [])
    out = (caption_cluster_agreement(corpus).to_pandas()
           .sort_values("relation").reset_index(drop=True))
    assert out.relation.tolist() == ["both", "caption_only",
                                     "cluster_only"]
    assert out.n_pairs.tolist() == [0, 0, 0]


# --- banding-health audit ------------------------------------------------------

def test_phash_band_entropy_planted(ray_session, tmp_path):
    """Two 32-bit bands at max_distance=1: hand-checked key counts
    incl. a negative phash (sign handling), plus DuckDB parity."""
    import duckdb

    from humid_ray.pipelines.images import (
        phash_band_entropy, phash_band_entropy_sql,
    )

    rows = [
        ("img_a", b"\x01", 0x1_0000_0000),   # band0 key 1, band1 key 0
        ("img_b", b"\x02", 0x2_0000_0000),   # band0 key 2, band1 key 0
        ("img_c", b"\x03", 0x1_0000_0005),   # band0 key 1, band1 key 5
        ("img_d", b"\x04", -1),              # keys 0xFFFFFFFF / 0xFFFFFFFF
        ("img_e", b"", None),                # excluded
    ]
    corpus = _corpus(tmp_path, rows)
    out = (phash_band_entropy(corpus).to_pandas()
           .sort_values("band").reset_index(drop=True))
    assert out.band.tolist() == [0, 1]
    assert out["shift"].tolist() == [32, 0]
    assert out.width.tolist() == [32, 32]
    # band0 keys {1: 2, 2: 1, 0xFFFFFFFF: 1}; band1 {0: 2, 5: 1, F..F: 1}
    assert out.n_keys.tolist() == [3, 3]
    assert out.max_rows.tolist() == [2, 2]
    assert out.n_rows.tolist() == [4, 4]

    oracle = (duckdb.sql(
        phash_band_entropy_sql(f"{corpus}/*.parquet")
    ).df().sort_values("band").reset_index(drop=True))
    for col in ("band", "shift", "width", "n_keys", "max_rows", "n_rows"):
        assert out[col].tolist() == oracle[col].tolist(), col


def test_phash_band_entropy_distance2_randomized(ray_session, tmp_path):
    """Three-band layout (21/21/22 bits) on random phashes vs DuckDB."""
    import duckdb

    from humid_ray.pipelines.images import (
        phash_band_entropy, phash_band_entropy_sql,
    )

    rng = np.random.default_rng(53)
    ph = rng.integers(-2**63, 2**63, 300, dtype=np.int64)
    rows = [(f"img_{i:04d}", bytes([i % 256]), int(p))
            for i, p in enumerate(ph)]
    corpus = _corpus(tmp_path, rows)
    out = (phash_band_entropy(corpus, max_distance=2).to_pandas()
           .sort_values("band").reset_index(drop=True))
    assert out.width.tolist() == [21, 21, 22]
    assert out["shift"].tolist() == [43, 22, 0]
    oracle = (duckdb.sql(
        phash_band_entropy_sql(f"{corpus}/*.parquet", max_distance=2)
    ).df().sort_values("band").reset_index(drop=True))
    for col in ("band", "shift", "width", "n_keys", "max_rows", "n_rows"):
        assert out[col].tolist() == oracle[col].tolist(), col


def test_phash_band_entropy_empty(ray_session, tmp_path):
    """Empty corpus still yields one zero row per band."""
    from humid_ray.pipelines.images import phash_band_entropy

    corpus = _corpus(tmp_path, [])
    out = (phash_band_entropy(corpus).to_pandas()
           .sort_values("band").reset_index(drop=True))
    assert out.band.tolist() == [0, 1]
    assert (out.n_keys == 0).all() and (out.n_rows == 0).all()
    assert (out.max_rows == 0).all()


# --- aspect-ratio profile -------------------------------------------------------

def _corpus_wh(tmp_path, rows):
    """rows: (image_id, w, h, fmt)."""
    t = pa.table({
        "image_id": pa.array([r[0] for r in rows], type=pa.string()),
        "bytes": pa.array([b"\x00"] * len(rows), type=pa.binary()),
        "w": pa.array([r[1] for r in rows], type=pa.int32()),
        "h": pa.array([r[2] for r in rows], type=pa.int32()),
        "fmt": pa.array([r[3] for r in rows], type=pa.string()),
        "caption": pa.array(["c"] * len(rows), type=pa.string()),
        "phash": pa.array([0] * len(rows), type=pa.int64()),
    })
    d = tmp_path / "corpus_wh"
    d.mkdir()
    pq.write_table(t, d / "part-0.parquet")
    return str(d)


def test_aspect_ratio_stats_planted(ray_session, tmp_path):
    import duckdb

    from humid_ray.pipelines.images import (
        aspect_ratio_stats, aspect_ratio_stats_sql,
    )

    rows = [
        ("img_a", 1920, 1080, "jpeg"),   # landscape, 2.0736 MP
        ("img_b", 1080, 1920, "jpeg"),   # portrait
        ("img_c", 512, 512, "png"),      # square, 0.262144 MP
        ("img_d", 256, 256, "png"),      # square, 0.065536 MP
        ("img_e", 640, 480, "jpeg"),     # landscape, 0.3072 MP
    ]
    corpus = _corpus_wh(tmp_path, rows)
    out = (aspect_ratio_stats(corpus).to_pandas()
           .sort_values(["fmt", "orientation"]).reset_index(drop=True))
    assert list(zip(out.fmt, out.orientation, out.n)) == [
        ("jpeg", "landscape", 2), ("jpeg", "portrait", 1),
        ("png", "square", 2),
    ]
    # (2.0736 + 0.3072) / 2 = 1.1904; (0.262144 + 0.065536) / 2
    assert out.avg_megapixels.tolist() == [1.1904, 2.0736, 0.16384]

    oracle = (duckdb.sql(aspect_ratio_stats_sql(f"{corpus}/*.parquet"))
              .df().sort_values(["fmt", "orientation"])
              .reset_index(drop=True))
    for col in ("fmt", "orientation", "n", "avg_megapixels"):
        assert out[col].tolist() == oracle[col].tolist(), col


def test_aspect_ratio_stats_empty(ray_session, tmp_path):
    from humid_ray.pipelines.images import aspect_ratio_stats

    corpus = _corpus_wh(tmp_path, [])
    assert aspect_ratio_stats(corpus).count() == 0


# --- multi-evidence fused dedup ---------------------------------------------

def _fused_corpus(tmp_path, rows, name="fcorpus"):
    t = pa.table({
        "image_id": pa.array([r[0] for r in rows], type=pa.string()),
        "bytes": pa.array([r[1] for r in rows], type=pa.binary()),
        "w": pa.array([4] * len(rows), type=pa.int32()),
        "h": pa.array([4] * len(rows), type=pa.int32()),
        "fmt": pa.array(["png"] * len(rows), type=pa.string()),
        "caption": pa.array([r[2] for r in rows], type=pa.string()),
        "phash": pa.array([r[3] for r in rows], type=pa.int64()),
    })
    d = tmp_path / name
    d.mkdir()
    pq.write_table(t, d / "part-0.parquet")
    return str(d)


FUSED_ROWS = [
    # (image_id, bytes, caption, phash)
    ("img_a", b"\x01\x02", "cat photo", 0x10),   # byte-dup with b
    ("img_b", b"\x01\x02", "unrelated1", 0x40),  # byte link a-b
    ("img_c", b"\x03\x04", "cat photo", 0x80),   # caption link a-c
    ("img_d", b"\x05\x06", "", 0x81),            # Hamming link c-d
    ("img_e", b"\x07\x08", "", None),            # isolated
    ("img_f", b"\x09\x0a", "dog", 0x200),        # phash-equal pair f-g
    ("img_g", b"\x0b\x0c", "bird", 0x200),
    ("img_h", b"", "", None),                    # empty payloads h-i
    ("img_i", b"", "", None),                    #   byte-link each other
]


def test_fused_dedup_images_planted(ray_session, tmp_path):
    """Transitive chain across ALL THREE tiers (byte a-b, caption a-c,
    Hamming c-d), a pHash-equal-only pair, the empty-payload clique,
    and an isolated row; empty captions must NOT link."""
    from humid_ray.pipelines.images import fused_dedup_images

    corpus = _fused_corpus(tmp_path, FUSED_ROWS)
    out = (fused_dedup_images(corpus).to_pandas()
           .sort_values("image_id").reset_index(drop=True))
    assert out.cluster_rep.tolist() == [
        "img_a", "img_a", "img_a", "img_a", "img_e",
        "img_f", "img_f", "img_h", "img_h",
    ]
    assert out.keep.tolist() == [
        True, False, False, False, True, True, False, True, False,
    ]
    # cluster {a,b,c,d}: all three tiers fired; {f,g}: phash only
    # (equal phash, different bytes+captions); {h,i}: byte only
    assert out.ev_byte.tolist() == [
        True, True, True, True, False, False, False, True, True]
    assert out.ev_caption.tolist() == [
        True, True, True, True, False, False, False, False, False]
    assert out.ev_phash.tolist() == [
        True, True, True, True, False, True, True, False, False]


def test_fused_dedup_images_matches_duckdb(ray_session, tmp_path):
    import duckdb

    from humid_ray.pipelines.images import (
        fused_dedup_images, fused_dedup_images_sql,
    )

    corpus = _fused_corpus(tmp_path, FUSED_ROWS)
    mine = (fused_dedup_images(corpus).to_pandas()
            .sort_values("image_id").reset_index(drop=True))
    oracle = (duckdb.sql(fused_dedup_images_sql(f"{corpus}/*.parquet"))
              .df().sort_values("image_id").reset_index(drop=True))
    for col in ("image_id", "cluster_rep", "keep",
                "ev_byte", "ev_caption", "ev_phash"):
        assert mine[col].tolist() == oracle[col].tolist(), col


def test_fused_dedup_images_randomized_vs_duckdb(ray_session, tmp_path):
    """Randomized corpus with heavy collisions in every tier —
    exercises multi-group buckets, hot equality groups, and chains
    the planted case can't reach."""
    import duckdb

    from humid_ray.pipelines.images import (
        fused_dedup_images, fused_dedup_images_sql,
    )

    rng = np.random.default_rng(7)
    rows = []
    payloads = [bytes([b]) * 3 for b in range(8)]
    captions = ["", "alpha", "beta", "gamma"]
    for i in range(120):
        ph = (int(rng.integers(0, 16)) << 2) | int(rng.integers(0, 4))
        rows.append((
            f"img_{i:03d}",
            payloads[int(rng.integers(0, len(payloads)))],
            captions[int(rng.integers(0, len(captions)))],
            None if rng.random() < 0.1 else ph,
        ))
    corpus = _fused_corpus(tmp_path, rows, name="rcorpus")
    mine = (fused_dedup_images(corpus).to_pandas()
            .sort_values("image_id").reset_index(drop=True))
    oracle = (duckdb.sql(fused_dedup_images_sql(f"{corpus}/*.parquet"))
              .df().sort_values("image_id").reset_index(drop=True))
    for col in ("image_id", "cluster_rep", "keep",
                "ev_byte", "ev_caption", "ev_phash"):
        assert mine[col].tolist() == oracle[col].tolist(), col


def test_fused_dedup_images_pixel_reencode_chain(ray_session, tmp_path):
    """The pixel tier links a re-encode chain the byte tier can't:
    a (original PNG) -pixel- b (zlib re-encode, different bytes)
    -byte- c (byte copy of b). pHashes are >1 bit apart and captions
    distinct, so ONLY pixel+byte evidence fuses {a,b,c}; ev_pixel and
    ev_byte fire, ev_caption/ev_phash don't. Plus containment: on this
    all-decodable corpus every ev_byte cluster is an ev_pixel cluster
    (byte-equal decodables are pixel-equal)."""
    from humid_ray.pipelines.images import fused_dedup_images
    from humid_ray.png import encode_png

    rng = np.random.default_rng(11)
    base = rng.integers(0, 256, size=(16, 16), dtype=np.uint8)
    other = rng.integers(0, 256, size=(16, 16), dtype=np.uint8)
    third = rng.integers(0, 256, size=(16, 16), dtype=np.uint8)
    p6 = encode_png(base)
    p1 = _reencode_png(p6, 1)
    rows = [
        ("img_a", p6, "capA", 0x10),
        ("img_b", p1, "capB", 0x800),            # pixel dup of a only
        ("img_c", p1, "capC", 0xF000),           # byte dup of b
        ("img_d", encode_png(other), "capD", 0x3),   # isolated
        ("img_e", encode_png(third), "capE", 0x5000),  # byte pair e-f
        ("img_f", encode_png(third), "capF", 0xA000),
    ]
    corpus = _fused_corpus(tmp_path, rows, name="pxchain")
    out = (fused_dedup_images(corpus).to_pandas()
           .sort_values("image_id").reset_index(drop=True))
    assert out.cluster_rep.tolist() == [
        "img_a", "img_a", "img_a", "img_d", "img_e", "img_e"]
    assert out.ev_pixel.tolist() == [
        True, True, True, False, True, True]
    assert out.ev_byte.tolist() == [
        True, True, True, False, True, True]
    assert out.ev_caption.tolist() == [False] * 6
    assert out.ev_phash.tolist() == [False] * 6
    # tier containment on decodable rows: byte evidence -> pixel
    assert (~out.ev_byte | out.ev_pixel).all()


def test_fused_dedup_images_lossy_reencode_not_pixel(ray_session, tmp_path):
    """A LOSSY re-encode of the same source pixels decodes to
    different pixels: no pixel edge, no byte edge — the pair only
    fuses if some other tier links it (here: none)."""
    from humid_ray.pipelines.images import fused_dedup_images
    from humid_ray.png import decode_image, encode_fjpg, encode_png

    rng = np.random.default_rng(13)
    base = rng.integers(0, 256, size=(16, 16), dtype=np.uint8)
    p = encode_png(base)
    fj = encode_fjpg(base)
    assert not np.array_equal(decode_image(fj), base)
    rows = [
        ("img_a", p, "x", 0x10),
        ("img_b", fj, "y", 0x800),
    ]
    corpus = _fused_corpus(tmp_path, rows, name="pxlossy")
    out = (fused_dedup_images(corpus).to_pandas()
           .sort_values("image_id").reset_index(drop=True))
    assert out.cluster_rep.tolist() == ["img_a", "img_b"]
    assert not out.ev_pixel.any()


def test_fused_pixel_tier_matches_byte_on_synth_corpus(ray_session,
                                                       corpus_dir):
    """The oracle premise for ev_pixel (fused_dedup_images_sql): the
    synthetic corpus contains no re-encodes, so the pixel-identity
    partition coincides with the byte-identity partition on decodable
    (phash-valid) rows. If the generator ever grows re-encoded
    variants, this fails and the SQL tier must become decode-aware."""
    from humid_ray.pipelines.images import (
        image_exact_dedup, pixel_exact_dedup,
    )

    px = pixel_exact_dedup(corpus_dir).to_pandas()
    by = image_exact_dedup(corpus_dir).to_pandas()
    pm = dict(zip(px.image_id, px.pixel_rep))
    bm = dict(zip(by.image_id, by.canonical_id))
    assert pm and all(pm[i] == bm[i] for i in pm)


def test_fused_dedup_images_empty(ray_session, tmp_path):
    from humid_ray.pipelines.images import fused_dedup_images

    corpus = _fused_corpus(tmp_path, [], name="ecorpus")
    assert fused_dedup_images(corpus).count() == 0


# --- threshold-sensitivity audit: cluster merging across radii ---------------

def test_cluster_merge_profile_planted(ray_session, tmp_path):
    """Two m1 families that merge at m2 (2 subclusters), one m1 family
    isolated at both radii, one untouched singleton."""
    from humid_ray.pipelines.images import cluster_merge_profile

    phs = [0x0F0, 0x0F1,                     # family A (d=1)
           0x0F6, 0x0F7,                     # family B; A-B at d=2 only
           0xF00, 0xF01,                     # family C, far from A/B
           0xAAAA,                           # singleton
           None]                             # unusable
    rows = [(f"img_{i}", bytes([i]) * 2, f"c{i}", p)
            for i, p in enumerate(phs)]
    corpus = _fused_corpus(tmp_path, rows, name="mcorpus")
    out = (cluster_merge_profile(corpus).to_pandas()
           .sort_values("n_subclusters").reset_index(drop=True))
    # m2 clusters: {A u B} = 2 subclusters; C = 1; singleton = 1
    assert list(zip(out.n_subclusters, out.n_clusters)) == [(1, 2), (2, 1)]


def test_cluster_merge_profile_randomized_vs_duckdb(ray_session, tmp_path):
    import duckdb

    from humid_ray.pipelines.images import (
        cluster_merge_profile, cluster_merge_profile_sql,
    )

    rng = np.random.default_rng(13)
    # 10-bit space: dense enough to chain, sparse enough to fragment
    phs = [int(x) for x in rng.integers(0, 1024, size=150)]
    rows = [(f"img_{i:03d}", bytes([i % 9]) * 2, "", p)
            for i, p in enumerate(phs)]
    corpus = _fused_corpus(tmp_path, rows, name="mrcorpus")
    mine = (cluster_merge_profile(corpus).to_pandas()
            .sort_values("n_subclusters").reset_index(drop=True))
    oracle = (duckdb.sql(cluster_merge_profile_sql(f"{corpus}/*.parquet"))
              .df().sort_values("n_subclusters").reset_index(drop=True))
    assert mine.values.tolist() == oracle.values.tolist()
    # sanity: some merging must actually occur at this density
    assert (mine.n_subclusters > 1).any()


def test_cluster_merge_profile_empty(ray_session, tmp_path):
    from humid_ray.pipelines.images import cluster_merge_profile

    corpus = _fused_corpus(tmp_path, [], name="mecorpus")
    assert cluster_merge_profile(corpus).count() == 0


def test_fused_dedup_images_null_captions(ray_session, tmp_path):
    """NULL captions (not just empty strings) must not link rows and
    must not crash the caption-hash kernel's fill_null path."""
    import duckdb

    from humid_ray.pipelines.images import (
        fused_dedup_images, fused_dedup_images_sql,
    )

    rows = [("a", b"\x01", None, 5), ("b", b"\x02", None, 5),
            ("c", b"\x03", "x", None)]
    corpus = _fused_corpus(tmp_path, rows, name="ncorpus")
    mine = (fused_dedup_images(corpus).to_pandas()
            .sort_values("image_id").reset_index(drop=True))
    oracle = (duckdb.sql(fused_dedup_images_sql(f"{corpus}/*.parquet"))
              .df().sort_values("image_id").reset_index(drop=True))
    for col in mine.columns:
        assert mine[col].tolist() == oracle[col].tolist(), col
    # a-b link via equal phash only; c isolated
    assert mine.cluster_rep.tolist() == ["a", "a", "c"]
    assert mine.ev_phash.tolist() == [True, True, False]
    assert mine.ev_caption.tolist() == [False, False, False]


def test_fused_dedup_images_join_branch_equals_broadcast(ray_session,
                                                         tmp_path):
    from humid_ray.pipelines.images import fused_dedup_images

    corpus = _fused_corpus(tmp_path, FUSED_ROWS, name="jcorpus")
    a = (fused_dedup_images(corpus).to_pandas()
         .sort_values("image_id").reset_index(drop=True))
    b = (fused_dedup_images(corpus, broadcast_max_labels=0).to_pandas()
         .sort_values("image_id").reset_index(drop=True))
    assert a.equals(b)


# --- per-row curation drop report --------------------------------------------

def test_image_drop_report_planted(ray_session, tmp_path):
    from humid_ray.pipelines.images import image_drop_report

    corpus = _corpus(tmp_path, ROWS)
    out = (image_drop_report(corpus).to_pandas()
           .sort_values("image_id").reset_index(drop=True))
    assert out.image_id.tolist() == [r[0] for r in ROWS]
    assert out.drop_reason.tolist() == [
        "kept", "byte_dup", "near_dup", "kept", "unusable"]
    assert out.keep.tolist() == [True, False, False, True, False]


def test_image_drop_report_matches_duckdb(ray_session, tmp_path):
    import duckdb

    from humid_ray.pipelines.images import (
        image_drop_report, image_drop_report_sql,
    )

    corpus = _corpus(tmp_path, ROWS)
    mine = (image_drop_report(corpus).to_pandas()
            .sort_values("image_id").reset_index(drop=True))
    oracle = (duckdb.sql(image_drop_report_sql(f"{corpus}/*.parquet"))
              .df().sort_values("image_id").reset_index(drop=True))
    for c in ("image_id", "keep", "drop_reason"):
        assert mine[c].tolist() == oracle[c].tolist(), c


def test_image_drop_report_empty(ray_session, tmp_path):
    from humid_ray.pipelines.images import image_drop_report

    corpus = _corpus(tmp_path, [])
    assert image_drop_report(corpus).count() == 0


# --- A-axis near-dup: caption SimHash neighbors ------------------------------

def test_caption_simhash_neardup_randomized_vs_duckdb(ray_session, tmp_path):
    """Randomized near-identical captions (0-2 word edits of a base
    sentence) MUST yield some Hamming<=3 SimHash pairs, and the edge
    set must match the bit-for-bit HUGEINT SimHash oracle."""
    import duckdb

    from humid_ray.pipelines.images import (
        caption_simhash_neardup, caption_simhash_neardup_sql,
    )

    rng = np.random.default_rng(5)
    words = ["red", "blue", "cat", "dog", "park", "night", "photo",
             "city", "tree", "old"]
    base = ("a photo of a cat sitting on an old bench in the city "
            "park at night")
    caps = []
    for _ in range(150):
        toks = base.split()
        for _ in range(int(rng.integers(0, 3))):
            toks[int(rng.integers(0, len(toks)))] = \
                words[int(rng.integers(0, len(words)))]
        caps.append(" ".join(toks))
    caps += ["", "totally unrelated caption about spacecraft engines",
             None]
    rows = [(f"img_{i:03d}", b"x", c, i) for i, c in enumerate(caps)]
    corpus = _fused_corpus(tmp_path, rows, name="cscorpus")
    mine = (caption_simhash_neardup(corpus).to_pandas()
            .sort_values(["sig_a", "sig_b"]).reset_index(drop=True))
    oracle = (duckdb.sql(
        caption_simhash_neardup_sql(f"{corpus}/*.parquet"))
        .df().sort_values(["sig_a", "sig_b"]).reset_index(drop=True))
    assert mine.values.tolist() == oracle.values.tolist()
    assert len(mine) > 0


def test_caption_simhash_neardup_empty(ray_session, tmp_path):
    from humid_ray.pipelines.images import caption_simhash_neardup

    corpus = _fused_corpus(tmp_path, [], name="csecorpus")
    res = caption_simhash_neardup(corpus)
    n = res.num_rows if isinstance(res, pa.Table) else res.count()
    assert n == 0
    # the zero-pair result must keep its (sig_a, sig_b) schema
    names = (res.schema.names if isinstance(res, pa.Table)
             else res.schema().names)
    assert names == ["sig_a", "sig_b"]


# --- image-axis ranked similarity search (Hamming top-k) ---------------------

def test_phash_knn_randomized_vs_duckdb(ray_session, tmp_path):
    import duckdb

    from humid_ray.pipelines.images import phash_knn, phash_knn_sql

    rng = np.random.default_rng(3)
    n = 120
    phs = [int(x) for x in rng.integers(-2**62, 2**62, size=n)]
    phs[5] = None  # unusable row must be neither query nor neighbor
    # planted exact-dup pair: rank-1 neighbor at dist 0
    phs[1] = phs[0]
    rows = [(f"img_{i:03d}", b"x", "", p) for i, p in enumerate(phs)]
    corpus = _fused_corpus(tmp_path, rows, name="knncorpus")
    res = phash_knn(corpus)
    mine = ((res.to_pandas() if hasattr(res, "to_pandas") else res)
            .sort_values(["query_id", "rank"]).reset_index(drop=True))
    oracle = (duckdb.sql(phash_knn_sql(f"{corpus}/*.parquet")).df()
              .sort_values(["query_id", "rank"]).reset_index(drop=True))
    for c in ("query_id", "neighbor_id", "rank", "dist"):
        assert mine[c].tolist() == oracle[c].tolist(), c
    first = mine[mine.query_id == "img_000"].iloc[0]
    assert first.neighbor_id == "img_001" and first.dist == 0


def test_phash_knn_empty(ray_session, tmp_path):
    from humid_ray.pipelines.images import phash_knn

    corpus = _fused_corpus(tmp_path, [], name="knnecorpus")
    res = phash_knn(corpus)
    assert res.num_rows == 0
    assert res.schema.names == ["query_id", "neighbor_id", "rank", "dist"]


# ---------------------------------------------------------------------------
# cluster_safe_split / dedup_sample_weights
# ---------------------------------------------------------------------------


def test_cluster_safe_split_leakage_free(ray_session, tmp_path):
    """Near-dup cluster members never straddle splits; every row gets
    exactly one split; the bucket chain matches util.splitmix64."""
    from humid_ray.pipelines.images import cluster_safe_split
    from humid_ray.util import int64_to_uint64, splitmix64

    corpus = _corpus(tmp_path, ROWS)
    out = (cluster_safe_split(corpus).to_pandas()
           .sort_values("image_id").reset_index(drop=True))
    assert out.image_id.tolist() == [r[0] for r in ROWS]
    assert set(out.split) <= {"train", "val", "test"}
    by = dict(zip(out.image_id, out.split))
    # {a, b} byte/phash-equal and c within Hamming 1 -> one cluster
    assert by["img_a"] == by["img_b"] == by["img_c"]
    # cluster label = min unsigned member sig = 0x10
    lab = np.array([0x10], dtype=np.int64)
    b = int(splitmix64(int64_to_uint64(lab))[0] % np.uint64(100))
    want = "test" if b < 10 else ("val" if b < 20 else "train")
    assert by["img_a"] == want


def test_cluster_safe_split_pct_bounds(ray_session, tmp_path):
    from humid_ray.pipelines.images import cluster_safe_split

    corpus = _corpus(tmp_path, ROWS)
    allt = cluster_safe_split(corpus, val_pct=0, test_pct=100).to_pandas()
    assert set(allt.split) == {"test"}
    trn = cluster_safe_split(corpus, val_pct=0, test_pct=0).to_pandas()
    assert set(trn.split) == {"train"}
    with pytest.raises(ValueError):
        cluster_safe_split(corpus, val_pct=60, test_pct=60)


def test_cluster_safe_split_matches_duckdb_oracle(ray_session, tmp_path):
    import duckdb

    from humid_ray.pipelines.images import (cluster_safe_split,
                                            cluster_safe_split_sql)

    corpus = _corpus(tmp_path, ROWS)
    mine = (cluster_safe_split(corpus).to_pandas()
            .sort_values("image_id").reset_index(drop=True))
    oracle = (duckdb.sql(cluster_safe_split_sql(f"{corpus}/*.parquet"))
              .df().sort_values("image_id").reset_index(drop=True))
    assert mine.image_id.tolist() == oracle.image_id.tolist()
    assert mine.split.tolist() == oracle.split.tolist()


def test_dedup_sample_weights_planted(ray_session, tmp_path):
    from humid_ray.pipelines.images import dedup_sample_weights

    corpus = _corpus(tmp_path, ROWS)
    out = (dedup_sample_weights(corpus).to_pandas()
           .sort_values("image_id").reset_index(drop=True))
    assert out.image_id.tolist() == [r[0] for r in ROWS]
    # {a, b, c} one cluster of 3 rows; d isolated; e unusable -> 1
    assert out.cluster_size.tolist() == [3, 3, 3, 1, 1]
    assert out.weight.tolist() == [0.333333, 0.333333, 0.333333, 1.0, 1.0]


def test_dedup_sample_weights_join_branch_equal(ray_session, tmp_path):
    from humid_ray.pipelines.images import dedup_sample_weights

    corpus = _corpus(tmp_path, ROWS)
    a = (dedup_sample_weights(corpus).to_pandas()
         .sort_values("image_id").reset_index(drop=True))
    b = (dedup_sample_weights(corpus, broadcast_max_labels=0).to_pandas()
         .sort_values("image_id").reset_index(drop=True))
    assert a.equals(b)


def test_dedup_sample_weights_matches_duckdb_oracle(ray_session, tmp_path):
    import duckdb

    from humid_ray.pipelines.images import (dedup_sample_weights,
                                            dedup_sample_weights_sql)

    corpus = _corpus(tmp_path, ROWS)
    mine = (dedup_sample_weights(corpus).to_pandas()
            .sort_values("image_id").reset_index(drop=True))
    oracle = (duckdb.sql(dedup_sample_weights_sql(f"{corpus}/*.parquet"))
              .df().sort_values("image_id").reset_index(drop=True))
    assert mine.image_id.tolist() == oracle.image_id.tolist()
    assert mine.cluster_size.tolist() == oracle.cluster_size.tolist()
    assert mine.weight.tolist() == oracle.weight.tolist()


def test_split_and_weights_empty_corpus(ray_session, tmp_path):
    from humid_ray.pipelines.images import (cluster_safe_split,
                                            dedup_sample_weights)

    corpus = _corpus(tmp_path, [])
    assert cluster_safe_split(corpus).count() == 0
    assert dedup_sample_weights(corpus).count() == 0


def test_pack_shards_images_invariants(ray_session, tmp_path):
    """Every usable image packed once; shard ids are a contiguous
    prefix 0..max; per-shard byte totals respect the capacity rule
    (each shard except possibly the last begins before the budget
    line); order = ascending id digest."""
    from humid_ray.pipelines.images import pack_shards_images
    from humid_ray.stages.joins import hash_string_column

    rows = [(f"img_{i:03d}", bytes([i % 251]) * (50 + 13 * (i % 7)),
             0x100 + i) for i in range(40)]
    rows.append(("img_bad", b"x", None))    # unusable: excluded
    corpus = _corpus(tmp_path, rows)
    cap = 400
    out = (pack_shards_images(corpus, capacity_bytes=cap).to_pandas()
           .sort_values("image_id").reset_index(drop=True))
    assert len(out) == 40 and "img_bad" not in set(out.image_id)
    assert (out.n_bytes == [50 + 13 * (i % 7) for i in range(40)]).all()
    # recompute expected shard ids by brute force in digest order
    ids = pa.array(out.image_id.tolist(), type=pa.string())
    h = hash_string_column(ids)
    order = np.argsort(h, kind="stable")
    nb = out.n_bytes.to_numpy()[order]
    excl = np.cumsum(nb) - nb
    want = dict(zip(out.image_id.to_numpy()[order], excl // cap))
    assert all(want[i] == s for i, s in zip(out.image_id, out.shard_id))
    sids = np.sort(out.shard_id.unique())
    assert sids[0] == 0 and (np.diff(sids) == 1).all()


def test_pack_shards_images_matches_duckdb_oracle(ray_session, tmp_path):
    import duckdb

    from humid_ray.pipelines.images import (pack_shards_images,
                                            pack_shards_images_sql)

    rows = [(f"img_{i:03d}", bytes([i % 251]) * (50 + 13 * (i % 7)),
             0x100 + i) for i in range(40)]
    corpus = _corpus(tmp_path, rows)
    mine = (pack_shards_images(corpus, capacity_bytes=400).to_pandas()
            .sort_values("image_id").reset_index(drop=True))
    orc = (duckdb.sql(pack_shards_images_sql(f"{corpus}/*.parquet",
                                             capacity_bytes=400))
           .df().sort_values("image_id").reset_index(drop=True))
    assert mine.image_id.tolist() == orc.image_id.tolist()
    assert mine.n_bytes.tolist() == orc.n_bytes.tolist()
    assert mine.shard_id.tolist() == orc.shard_id.tolist()


def test_pack_shards_images_empty_and_validation(ray_session, tmp_path):
    from humid_ray.pipelines.images import pack_shards_images

    corpus = _corpus(tmp_path, [])
    assert pack_shards_images(corpus).count() == 0
    with pytest.raises(ValueError):
        pack_shards_images(corpus, capacity_bytes=0)


# --- lang_partitioned_image_dedup -------------------------------------------

# captions chosen to hit distinct LangId profiles deterministically:
# "the thing" -> en, "chchch" -> de, "lelele" -> fr (see textstats._PROFILES)
LPART_ROWS = [
    # (image_id, bytes, caption, phash)
    ("img_a", b"\x01", "the thing", 0x10),   # en cluster seed
    ("img_b", b"\x02", "the thing", 0x10),   # same phash, same lang -> same
    ("img_c", b"\x03", "the things", 0x11),  # Hamming 1, en -> joins a/b
    ("img_d", b"\x04", "chchch", 0x10),      # same phash, DE -> separate
    ("img_e", b"\x05", "lelele", 0x11),      # Hamming-1 value, FR -> alone
    ("img_f", b"\x06", "the thing", None),   # unusable: dropped
    ("img_g", b"\x07", "", 0x400),           # und singleton
]


def test_lang_partitioned_image_dedup_planted(ray_session, tmp_path):
    from humid_ray.pipelines.images import lang_partitioned_image_dedup

    corpus = _fused_corpus(tmp_path, LPART_ROWS, name="lpcorpus")
    out = (lang_partitioned_image_dedup(corpus).to_pandas()
           .set_index("image_id"))
    assert len(out) == 6  # img_f dropped (NULL phash)
    assert out.loc["img_a", "lang_pred"] == "en"
    assert out.loc["img_d", "lang_pred"] == "de"
    assert out.loc["img_e", "lang_pred"] == "fr"
    assert out.loc["img_g", "lang_pred"] == "und"
    # en partition: a, b, c one cluster (rep = min id)
    assert out.loc["img_a", "cluster_rep"] == "img_a"
    assert out.loc["img_b", "cluster_rep"] == "img_a"
    assert out.loc["img_c", "cluster_rep"] == "img_a"
    # SAME phash value under de is a separate, singleton cluster
    assert out.loc["img_d", "cluster_rep"] == "img_d"
    # Hamming-1 neighbor value under fr never links cross-language
    assert out.loc["img_e", "cluster_rep"] == "img_e"
    assert out.loc["img_g", "cluster_rep"] == "img_g"
    assert out["keep"].tolist() == [
        out.index[i] == out["cluster_rep"].iloc[i] for i in range(len(out))
    ]


def test_lang_partitioned_image_dedup_matches_duckdb(ray_session, tmp_path):
    import duckdb

    from humid_ray.pipelines.images import (
        lang_partitioned_image_dedup, lang_partitioned_image_dedup_sql,
    )

    corpus = _fused_corpus(tmp_path, LPART_ROWS, name="lpcorpus2")
    mine = (lang_partitioned_image_dedup(corpus).to_pandas()
            .sort_values("image_id").reset_index(drop=True))
    oracle = (duckdb.sql(
        lang_partitioned_image_dedup_sql(f"{corpus}/*.parquet"))
        .df().sort_values("image_id").reset_index(drop=True))
    for col in ("image_id", "lang_pred", "cluster_rep", "keep"):
        assert mine[col].tolist() == oracle[col].tolist(), col


def test_lang_partitioned_image_dedup_randomized_vs_duckdb(
        ray_session, tmp_path):
    """Randomized corpus: dense phash collisions + Hamming-1 chains
    across four languages — exercises multi-language buckets, label
    collisions across partitions, and chains the planted case misses."""
    import duckdb

    from humid_ray.pipelines.images import (
        lang_partitioned_image_dedup, lang_partitioned_image_dedup_sql,
    )

    rng = np.random.default_rng(13)
    caps = ["the thing", "chchch", "lelele", "de la los", ""]
    rows = []
    for i in range(150):
        ph = None if rng.random() < 0.08 else int(rng.integers(0, 32))
        rows.append((f"img_{i:03d}", bytes([i % 251]),
                     caps[int(rng.integers(0, len(caps)))], ph))
    corpus = _fused_corpus(tmp_path, rows, name="lprand")
    mine = (lang_partitioned_image_dedup(corpus).to_pandas()
            .sort_values("image_id").reset_index(drop=True))
    oracle = (duckdb.sql(
        lang_partitioned_image_dedup_sql(f"{corpus}/*.parquet"))
        .df().sort_values("image_id").reset_index(drop=True))
    for col in ("image_id", "lang_pred", "cluster_rep", "keep"):
        assert mine[col].tolist() == oracle[col].tolist(), col


def test_lang_partitioned_image_dedup_join_branch_equal(ray_session,
                                                        tmp_path):
    """broadcast_max_labels=0 forces the distributed two-key join path;
    output must equal the broadcast path byte-for-byte."""
    from humid_ray.pipelines.images import lang_partitioned_image_dedup

    rng = np.random.default_rng(17)
    caps = ["the thing", "chchch", "lelele", ""]
    rows = [(f"img_{i:03d}", bytes([i % 251]),
             caps[int(rng.integers(0, len(caps)))],
             None if rng.random() < 0.1 else int(rng.integers(0, 24)))
            for i in range(120)]
    corpus = _fused_corpus(tmp_path, rows, name="lpjoin")
    a = (lang_partitioned_image_dedup(corpus).to_pandas()
         .sort_values("image_id").reset_index(drop=True))
    b = (lang_partitioned_image_dedup(corpus, broadcast_max_labels=0)
         .to_pandas().sort_values("image_id").reset_index(drop=True))
    for col in ("image_id", "lang_pred", "cluster_rep", "keep"):
        assert a[col].tolist() == b[col].tolist(), col


# --- cluster_psnr_report ------------------------------------------------------

def test_cluster_psnr_report_planted(ray_session, tmp_path):
    """The per-row dedup invariant as an audit: byte dup -> pixel_equal;
    lossy re-encode of the same pixels -> PSNR >= 40 dB; a genuinely
    different image in the cluster -> far below 40; dims mismatch and
    undecodable payloads flagged; singletons excluded."""
    from humid_ray.pipelines.images import cluster_psnr_report
    from humid_ray.png import encode_fjpg, encode_png

    rng = np.random.default_rng(5)
    base = rng.integers(0, 256, size=(16, 16), dtype=np.uint8)
    other = rng.integers(0, 256, size=(16, 16), dtype=np.uint8)
    small = rng.integers(0, 256, size=(8, 8), dtype=np.uint8)
    rows = [
        ("img_a1", encode_png(base), "", 0x10),    # rep
        ("img_a2", encode_png(base), "", 0x10),    # byte dup
        ("img_a3", encode_fjpg(base), "", 0x10),   # lossy re-encode
        ("img_a4", encode_png(other), "", 0x11),   # different image, H1
        ("img_a5", encode_png(small), "", 0x10),   # dims mismatch
        ("img_b1", encode_png(other), "", 0x400),  # singleton: excluded
        ("img_c1", b"JUNKJUNKJUNK", "", 0x800),    # undecodable rep
        ("img_c2", encode_png(base), "", 0x800),
    ]
    corpus = _fused_corpus(tmp_path, rows, name="psnrcorpus")
    out = (cluster_psnr_report(corpus).to_pandas()
           .sort_values("image_id").set_index("image_id"))
    assert "img_b1" not in out.index          # singleton excluded
    assert len(out) == 7
    assert bool(out.loc["img_a2", "pixel_equal"])
    assert np.isnan(out.loc["img_a2", "psnr"])  # infinite -> NULL
    assert out.loc["img_a3", "psnr"] >= 40.0    # lossy invariant holds
    assert not out.loc["img_a3", "pixel_equal"]
    assert out.loc["img_a4", "psnr"] < 20.0     # true near-dup it is not
    assert not out.loc["img_a5", "dims_match"]
    assert not out.loc["img_c1", "decoded"] and out.loc["img_c1", "is_rep"]
    assert bool(out.loc["img_c2", "decoded"])
    assert (out.loc[out["is_rep"], "cluster_rep"]
            == out.loc[out["is_rep"]].index).all()


def test_cluster_psnr_report_join_branch_equals_broadcast(ray_session,
                                                          tmp_path):
    """broadcast_max_members=0 forces the distributed label-join path
    (distributed CC + inner Dataset.join instead of the broadcast
    member map); the audit output must be identical — labels may
    differ in value between the paths, but only the member PARTITION
    reaches the output."""
    from humid_ray.pipelines.images import cluster_psnr_report
    from humid_ray.png import encode_fjpg, encode_png

    rng = np.random.default_rng(7)
    base = rng.integers(0, 256, size=(16, 16), dtype=np.uint8)
    other = rng.integers(0, 256, size=(16, 16), dtype=np.uint8)
    rows = [
        ("img_a1", encode_png(base), "", 0x10),
        ("img_a2", encode_png(base), "", 0x10),    # byte dup
        ("img_a3", encode_fjpg(base), "", 0x11),   # lossy + Hamming edge
        ("img_b1", encode_png(other), "", 0x400),  # phash-equal pair
        ("img_b2", encode_png(other), "", 0x400),
        ("img_c1", encode_png(base), "", 0x4000),  # singleton: excluded
    ]
    corpus = _fused_corpus(tmp_path, rows, name="psnrjoin")
    a = (cluster_psnr_report(corpus).to_pandas()
         .sort_values("image_id").reset_index(drop=True))
    b = (cluster_psnr_report(corpus, broadcast_max_members=0).to_pandas()
         .sort_values("image_id").reset_index(drop=True))
    assert len(a) == 5 and a.equals(b)


def test_cluster_psnr_report_no_dups(ray_session, tmp_path):
    from humid_ray.pipelines.images import cluster_psnr_report
    from humid_ray.png import encode_png

    rng = np.random.default_rng(6)
    # pairwise Hamming distance 8 — no near-dup edges anywhere
    rows = [(f"img_{i}", encode_png(
        rng.integers(0, 256, size=(8, 8), dtype=np.uint8)), "",
        0xFF << (8 * i)) for i in range(4)]
    corpus = _fused_corpus(tmp_path, rows, name="psnrsingl")
    assert cluster_psnr_report(corpus).count() == 0


def test_caption_simhash_distance_hist_bruteforce(ray_session, tmp_path):
    """Engine histogram == brute-force O(n^2) Hamming histogram over
    the distinct caption SimHash values, on a corpus with planted
    near-identical captions (nonempty at the test radius); DuckDB
    parity on the same corpus."""
    import duckdb

    from humid_ray.functions.simhash import (
        shingle_hashes, simhash_from_shingles,
    )
    from humid_ray.functions.text import tokenize_batch
    from humid_ray.pipelines.images import (
        caption_simhash_distance_hist, caption_simhash_distance_hist_sql,
    )
    from humid_ray.util import hamming64

    caps = (["the quick brown fox jumps over the lazy dog"] * 2
            + ["the quick brown fox jumps over the lazy cat",
               "the quick brown fox leaps over the lazy dog",
               "a completely different caption about mountains",
               "a completely different caption about oceans",
               "short one", "short two", ""])
    rows = [(f"img_{i:02d}", bytes([i]), 0x10 + i, c)
            for i, c in enumerate(caps)]
    corpus = _corpus_cap(tmp_path, rows)

    out = (caption_simhash_distance_hist(corpus, max_distance=32)
           .to_pandas().sort_values("dist").reset_index(drop=True))

    import pyarrow as _pa

    th, offs = tokenize_batch(_pa.chunked_array([_pa.array(caps)]))
    sh, sh_offs = shingle_hashes(th, offs, 2)
    sims = np.unique(simhash_from_shingles(sh, sh_offs))
    a, b = np.triu_indices(len(sims), k=1)
    d = hamming64(sims[a].view(np.int64), sims[b].view(np.int64))
    d = d[d <= 32]
    vals, cnts = np.unique(d, return_counts=True)
    assert out.dist.tolist() == vals.astype(int).tolist()
    assert out.n_pairs.tolist() == cnts.astype(int).tolist()
    assert len(out) > 0  # the planted corpus must exercise the radius

    orc = (duckdb.sql(caption_simhash_distance_hist_sql(
        f"{corpus}/*.parquet", max_distance=32))
        .df().sort_values("dist").reset_index(drop=True))
    assert out.dist.tolist() == orc.dist.tolist()
    assert out.n_pairs.tolist() == orc.n_pairs.tolist()


def test_payload_digests_sliced_column():
    """Byte-identity digests of a SLICED (non-zero-offset) column must
    hash the right segments — absolute offsets index the shared parent
    buffer directly (a base-subtraction regression read the wrong
    bytes for sliced arrays)."""
    from humid_ray.pipelines.images import _flat_binary, _payload_digests

    parent = pa.array([b"xx", b"yyy", b"z", b"wwww"], type=pa.binary())
    sliced = parent.slice(1, 2)  # [b"yyy", b"z"]
    data, offs = _flat_binary(sliced)
    h1s, h2s = _payload_digests(data, offs, 2)
    fresh = pa.array([b"yyy", b"z"], type=pa.binary())
    data2, offs2 = _flat_binary(fresh)
    h1f, h2f = _payload_digests(data2, offs2, 2)
    assert (h1s == h1f).all() and (h2s == h2f).all()


def test_pixel_tier_contains_byte_tier(ray_session, tmp_path):
    """Tier containment on a mixed corpus: rows byte-identical to each
    other are necessarily pixel-identical, so every byte-identity
    group must sit INSIDE one pixel-identity group (the tier-funnel
    invariant: unique_pixel_groups <= unique_byte_groups never holds
    the other way)."""
    from humid_ray.pipelines.images import (
        image_exact_dedup, pixel_exact_dedup,
    )
    from humid_ray.png import encode_png

    rng = np.random.default_rng(12)
    imgs = [rng.integers(0, 256, size=(8, 8), dtype=np.uint8)
            for _ in range(3)]
    p = [encode_png(im) for im in imgs]
    rows = [
        ("img_a", p[0], "", 0x10), ("img_b", p[0], "", 0x10),  # byte dup
        ("img_c", _reencode_png(p[0], 1), "", 0x10),  # pixel-only dup
        ("img_d", p[1], "", 0x20), ("img_e", p[1], "", 0x20),  # byte dup
        ("img_f", p[2], "", 0x40),
    ]
    corpus = _fused_corpus(tmp_path, rows, name="tiercorpus")
    byte_rep = (image_exact_dedup(corpus).to_pandas()
                .set_index("image_id").canonical_id)
    pix_rep = (pixel_exact_dedup(corpus).to_pandas()
               .set_index("image_id").pixel_rep)
    # byte-equal pair => pixel-rep-equal
    for a, b in [("img_a", "img_b"), ("img_d", "img_e")]:
        assert byte_rep[a] == byte_rep[b]
        assert pix_rep[a] == pix_rep[b]
    # the pixel tier merges the re-encoded copy the byte tier cannot
    assert byte_rep["img_c"] != byte_rep["img_a"]
    assert pix_rep["img_c"] == pix_rep["img_a"]
    # containment: byte groups never split across pixel groups
    import collections
    by_byte = collections.defaultdict(set)
    for img, rep in byte_rep.items():
        by_byte[rep].add(pix_rep[img])
    assert all(len(v) == 1 for v in by_byte.values())


def test_new_ops_all_unusable_corpus(ray_session, tmp_path):
    """Null-phash-only corpora produce clean empty outputs."""
    from humid_ray.pipelines.images import (
        cluster_caption_vote, pixel_exact_dedup,
    )

    rows = [("img_a", b"", "cap", None), ("img_b", b"x", "", None)]
    corpus = _fused_corpus(tmp_path, rows, name="unusable2")
    assert pixel_exact_dedup(corpus).count() == 0
    assert cluster_caption_vote(corpus).count() == 0
