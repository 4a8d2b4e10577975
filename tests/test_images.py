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
