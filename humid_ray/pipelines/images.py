"""Image-corpus curation operators over the flagship image+caption
corpus (input_hint schema: image_id, bytes, w, h, fmt, caption,
phash).

Two operators compose the flagship machinery into the image-side
keep-list a training pipeline actually consumes:

- ``image_exact_dedup``: byte-identical dedup (re-crawled / mirrored
  files) — the cheap first gate before any perceptual pass.
- ``curate_images``: the composed curation run — usable gate ->
  exact-byte dedup -> pHash Hamming clustering (the flagship's
  banded-LSH + connected components, reference src/humid.cc neighbor
  walk re-expressed) -> one keep row per near-dup cluster.

Payload bytes NEVER transit a shuffle: the only stage that touches
``bytes`` hashes it in-batch to a (h1, h2, len) triple; everything
downstream moves 8-byte columns. Exact-byte identity is asserted on
the 128-bit+length composite — a BLAKE2b-128 digest split into two
64-bit words, collision probability ~n^2 / 2^129 corpus-wide (zero at
any feasible corpus size); the DuckDB oracle groups by the raw bytes,
so the compare would catch a digest collision at test scale.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data
from ray.data.aggregate import Count

from humid_ray.config import HumidConfig
from humid_ray.pipelines.multimodal import read_corpus
from humid_ray.stages.components import connected_components
from humid_ray.stages.lsh import band_bucket_counts, find_edges
from humid_ray.util import UINT64, u64col


def _flat_binary(col) -> tuple[np.ndarray, np.ndarray]:
    """Binary column -> (flat uint8 buffer, absolute int64 offsets).

    Zero-copy views of the Arrow buffers; the identity kernel slices
    the flat buffer per segment via the absolute offsets.
    """
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    odt = np.int64 if pa.types.is_large_binary(col.type) else np.int32
    offs = np.frombuffer(col.buffers()[1], dtype=odt)[
        col.offset : col.offset + len(col) + 1
    ].astype(np.int64)
    data = np.frombuffer(col.buffers()[2], dtype=np.uint8)
    return data, offs


_CANON_BUCKETS = 256


def _byte_identity_kernel(extra_cols: tuple[str, ...] = ()):
    """map_batches kernel: (image_id, bytes, *extra) ->
    (image_id, h1, h2, ln, bucket, *extra) — the payload stays in this
    task; ``bucket`` = h1 % 256 keys the canonicalization groupby (256
    buckets, so the per-bucket kernel is one vectorized pass instead
    of one Python call per distinct payload)."""

    out_schema = {
        "image_id": pa.string(),
        "h1": pa.int64(),
        "h2": pa.int64(),
        "ln": pa.int64(),
        "bucket": pa.int64(),
        **{c: pa.int64() for c in extra_cols},
    }

    def kernel(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({k: pa.array([], type=t)
                             for k, t in out_schema.items()})
        data, offs = _flat_binary(batch.column("bytes"))
        # ONE C-speed BLAKE2b pass per payload, 16-byte digest split
        # into (h1, h2). For ~100 KB payloads a per-segment C call at
        # GB/s beats the "vectorized" byte-polynomial by >20x: that
        # kernel materializes ~40 bytes of int64 temporaries PER
        # PAYLOAD BYTE (and would do it twice) — memory traffic, not
        # compute, was the wall. The rows-per-batch loop costs ~1 µs
        # per row against ~70 µs of hashing. memoryview slices of the
        # flat Arrow buffer keep it zero-copy.
        import hashlib

        n = batch.num_rows
        h1 = np.empty(n, dtype=UINT64)
        h2 = np.empty(n, dtype=UINT64)
        mv = memoryview(data)
        base = int(offs[0])
        for i in range(n):
            d = hashlib.blake2b(
                mv[offs[i] - base:offs[i + 1] - base], digest_size=16
            ).digest()
            h1[i] = int.from_bytes(d[:8], "little")
            h2[i] = int.from_bytes(d[8:], "little")
        cols = {
            "image_id": batch.column("image_id"),
            "h1": u64col(h1),
            "h2": u64col(h2),
            "ln": pa.array((offs[1:] - offs[:-1]).astype(np.int64)),
            "bucket": pa.array((h1 % UINT64(_CANON_BUCKETS))
                               .astype(np.int64)),
        }
        for c in extra_cols:
            cols[c] = batch.column(c)
        return pa.table(cols)

    return kernel


def _canonical_bucket(extra_cols: tuple[str, ...] = ()):
    """map_groups kernel over ONE hash bucket (h1 % 256): many
    byte-identity groups per call, canonicalized with a single lexsort
    + segment pass — no per-group Python. canonical = min image_id
    within each (h1, h2, ln) segment."""

    def kernel(g: pa.Table) -> pa.Table:
        out = {
            "image_id": pa.array([], type=pa.string()),
            "canonical_id": pa.array([], type=pa.string()),
            **{c: pa.array([], type=pa.int64()) for c in extra_cols},
        }
        if g.num_rows == 0:
            return pa.table(out)
        ids = np.asarray(g.column("image_id").to_pylist(), dtype=object)
        h1 = g.column("h1").to_numpy(zero_copy_only=False)
        h2 = g.column("h2").to_numpy(zero_copy_only=False)
        ln = g.column("ln").to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, ln, h2, h1))
        h1s, h2s, lns = h1[order], h2[order], ln[order]
        new = np.r_[True, (h1s[1:] != h1s[:-1]) | (h2s[1:] != h2s[:-1])
                    | (lns[1:] != lns[:-1])]
        seg_start = np.maximum.accumulate(
            np.where(new, np.arange(len(new)), 0)
        )
        ids_sorted = ids[order]
        canon_sorted = ids_sorted[seg_start]
        inv = np.empty(len(order), dtype=np.int64)
        inv[order] = np.arange(len(order))
        cols = {
            "image_id": g.column("image_id"),
            "canonical_id": pa.array(canon_sorted[inv].tolist(),
                                     type=pa.string()),
        }
        for c in extra_cols:
            cols[c] = g.column(c)
        return pa.table(cols)

    return kernel


def image_exact_dedup(corpus_dir: str):
    """(image_id, canonical_id, keep): byte-identical image dedup —
    canonical_id = min image_id among byte-equal rows, keep iff the
    row IS its group's canonical.

    Scale shape: bytes are hashed in-batch to (h1, h2, len) and never
    shuffle; the groupby moves three int64 columns + the id. Identity
    is the 128-bit+length composite (module docstring); the oracle
    partitions by the raw bytes."""
    rows = read_corpus(corpus_dir, columns=["image_id", "bytes"]).map_batches(
        _byte_identity_kernel(), batch_format="pyarrow", zero_copy_batch=True
    )
    canon = rows.groupby("bucket").map_groups(
        _canonical_bucket(), batch_format="pyarrow"
    )

    def finish(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"image_id": pa.array([], type=pa.string()),
                             "canonical_id": pa.array([], type=pa.string()),
                             "keep": pa.array([], type=pa.bool_())})
        return pa.table({
            "image_id": t.column("image_id"),
            "canonical_id": t.column("canonical_id"),
            "keep": pc.equal(t.column("image_id"), t.column("canonical_id")),
        })

    return canon.map_batches(finish, batch_format="pyarrow")


def image_exact_dedup_sql(corpus_glob: str) -> str:
    """DuckDB oracle for ``image_exact_dedup``: partition by raw bytes."""
    return (
        "SELECT image_id, "
        "min(image_id) OVER (PARTITION BY bytes) AS canonical_id, "
        "image_id = min(image_id) OVER (PARTITION BY bytes) AS \"keep\" "
        f"FROM read_parquet('{corpus_glob}')"
    )


def curate_images(corpus_dir: str, broadcast_max_labels: int = 1_000_000):
    """(image_id, canonical_id, cluster_rep, keep): the composed image
    curation keep-list — usable gate (non-NULL stored phash, the
    flagship's stored-mode filter) -> exact-byte canonical -> pHash
    Hamming<=1 near-dup clusters (the flagship's counting pre-pass +
    salted banded LSH + distributed connected components, phash-only
    config) -> cluster_rep = min image_id per cluster, keep one row
    per cluster.

    Scale shape: the payload never shuffles (byte identity via the
    in-batch 128-bit hash); the cluster graph is built over DISTINCT
    phash values only (the flagship uniq collapse); the phash->cluster
    label map is edge-bounded and broadcast once via ``ray.put`` below
    ``broadcast_max_labels``, else applied with a distributed
    left-outer ``Dataset.join`` — the same auto-switch as the flagship
    annotate stage (stages/outputs.py)."""
    cfg = HumidConfig(sources=("phash",), clustering="maximum")

    def usable(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        return batch.filter(pc.is_valid(batch.column("phash")))

    rows = read_corpus(
        corpus_dir, columns=["image_id", "bytes", "phash"]
    ).map_batches(usable, batch_format="pyarrow", zero_copy_batch=True)
    hashed = rows.map_batches(
        _byte_identity_kernel(extra_cols=("phash",)),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    # materialize the canonical map ONCE: four downstream consumers
    # (uniq collapse, hot-key pre-pass, edge finder, final labeling)
    # would otherwise each re-execute the payload-hashing scan through
    # Dataset lineage — the 100 TB column read x4. canon is the NARROW
    # projection (id, canonical, phash); at flagship scale this slot is
    # the per-phase parquet checkpoint (state/checkpoints.py) instead.
    canon = hashed.groupby("bucket").map_groups(
        _canonical_bucket(extra_cols=("phash",)), batch_format="pyarrow"
    ).materialize()

    # cluster graph over DISTINCT phash values (uniq collapse)
    uniq_ds = (
        canon.groupby("phash")
        .aggregate(Count(alias_name="count"))
        .map_batches(
            lambda t: pa.table({"sig": t.column("phash"),
                                "count": t.column("count")}),
            batch_format="pyarrow",
        )
    ).materialize()
    bc = band_bucket_counts(uniq_ds, cfg)

    def only_hot(t: pa.Table) -> pa.Table:
        return t.filter(pc.greater(t.column("n"), cfg.hot_band_threshold))

    hot_tab = bc.map_batches(only_hot, batch_format="pyarrow").take_all()
    hot_keys = {(int(r["band_id"]), int(r["band_key"])) for r in hot_tab}
    edges = find_edges(uniq_ds, cfg, hot_keys or None)
    # (sig, comp); edge-touched only — tiny (edge-bounded)
    comp = connected_components(edges, cfg).materialize()

    n_labels = comp.count()
    if n_labels <= broadcast_max_labels:
        parts = [
            (b.column("sig").to_numpy(zero_copy_only=False),
             b.column("comp").to_numpy(zero_copy_only=False))
            for b in comp.iter_batches(batch_size=65536,
                                       batch_format="pyarrow")
        ]
        if parts:
            sig_arr = np.concatenate([p[0] for p in parts])
            lab_arr = np.concatenate([p[1] for p in parts])
            order = np.argsort(sig_arr, kind="stable")
            sig_arr, lab_arr = sig_arr[order], lab_arr[order]
        else:
            sig_arr = np.empty(0, dtype=np.int64)
            lab_arr = np.empty(0, dtype=np.int64)
        ref = ray.put((sig_arr, lab_arr))

        def label_kernel(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return pa.table({"image_id": pa.array([], type=pa.string()),
                                 "canonical_id": pa.array([], type=pa.string()),
                                 "label": pa.array([], type=pa.int64())})
            keys, labs = ray.get(ref)
            ph = t.column("phash").to_numpy(zero_copy_only=False)
            lab = ph.astype(np.int64).copy()
            if len(keys):
                pos = np.searchsorted(keys, lab)
                pos[pos == len(keys)] = 0
                hit = keys[pos] == lab
                lab[hit] = labs[pos[hit]]
            return pa.table({"image_id": t.column("image_id"),
                             "canonical_id": t.column("canonical_id"),
                             "label": pa.array(lab)})

        labeled = canon.map_batches(label_kernel, batch_format="pyarrow")
    else:
        from humid_ray.stages.joins import join_kwargs

        # comp is the smaller side (edge-touched distinct sigs only)
        joined = canon.join(comp, join_type="left_outer", on=("phash",),
                            right_on=("sig",), **join_kwargs(n_labels))

        def fill(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return pa.table({"image_id": pa.array([], type=pa.string()),
                                 "canonical_id": pa.array([], type=pa.string()),
                                 "label": pa.array([], type=pa.int64())})
            lab = pc.coalesce(t.column("comp"), t.column("phash"))
            return pa.table({"image_id": t.column("image_id"),
                             "canonical_id": t.column("canonical_id"),
                             "label": lab})

        labeled = joined.map_batches(fill, batch_format="pyarrow")

    # cluster_rep = min image_id per label. One co-partitioning
    # exchange on hashed label + a vectorized per-bucket segment kernel
    # (the stages/joins.py bucket pattern) — a per-LABEL map_groups
    # here would invoke a Python kernel once per cluster (~corpus-many
    # tiny groups), which measured as the dominant cost of this query.
    from humid_ray.stages.joins import copart_buckets, key_buckets

    nb = copart_buckets(canon.count())

    def tag(t: pa.Table) -> pa.Table:
        lab = t.column("label").to_numpy(zero_copy_only=False)
        return t.append_column("bucket", pa.array(key_buckets(lab, nb)))

    def rep_bucket(g: pa.Table) -> pa.Table:
        out = {"image_id": pa.array([], type=pa.string()),
               "canonical_id": pa.array([], type=pa.string()),
               "cluster_rep": pa.array([], type=pa.string()),
               "keep": pa.array([], type=pa.bool_())}
        if g.num_rows == 0:
            return pa.table(out)
        ids = np.asarray(g.column("image_id").to_pylist(), dtype=object)
        lab = g.column("label").to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, lab))
        labs = lab[order]
        new = np.r_[True, labs[1:] != labs[:-1]]
        seg_start = np.maximum.accumulate(
            np.where(new, np.arange(len(new)), 0)
        )
        ids_sorted = ids[order]
        rep_sorted = ids_sorted[seg_start]
        inv = np.empty(len(order), dtype=np.int64)
        inv[order] = np.arange(len(order))
        rep = rep_sorted[inv]
        return pa.table({
            "image_id": g.column("image_id"),
            "canonical_id": g.column("canonical_id"),
            "cluster_rep": pa.array(rep.tolist(), type=pa.string()),
            "keep": pa.array(ids == rep),
        })

    return (
        labeled.map_batches(tag, batch_format="pyarrow",
                            zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(rep_bucket, batch_format="pyarrow")
    )


_SB = "-9223372036854775808"  # sign-flip for unsigned int64 ordering


def curate_images_sql(corpus_glob: str, max_distance: int = 1) -> str:
    """DuckDB oracle for ``curate_images``: window-min canonical over
    raw bytes + recursive Hamming closure over distinct phash."""
    return (
        "WITH RECURSIVE u AS (SELECT image_id, bytes, phash "
        f"FROM read_parquet('{corpus_glob}') WHERE phash IS NOT NULL), "
        "canon AS (SELECT image_id, "
        "min(image_id) OVER (PARTITION BY bytes) AS canonical_id, phash "
        "FROM u), "
        "nodes AS (SELECT DISTINCT phash AS sig FROM u), "
        "e AS (SELECT a.sig AS sa, b.sig AS sb FROM nodes a JOIN nodes b "
        f"ON a.sig != b.sig AND bit_count(xor(a.sig, b.sig)) <= {max_distance}), "
        "reach(src, dst) AS (SELECT sig, sig FROM nodes UNION "
        "SELECT r.src, e.sb FROM reach r JOIN e ON e.sa = r.dst), "
        "comp AS (SELECT src AS sig, "
        f"xor(min(xor(dst, {_SB})), {_SB}) AS label FROM reach GROUP BY src), "
        "lab AS (SELECT c.image_id, c.canonical_id, m.label "
        "FROM canon c JOIN comp m ON m.sig = c.phash) "
        "SELECT image_id, canonical_id, "
        "min(image_id) OVER (PARTITION BY label) AS cluster_rep, "
        "image_id = min(image_id) OVER (PARTITION BY label) AS \"keep\" "
        "FROM lab"
    )
