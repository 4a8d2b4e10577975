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
from humid_ray.pipelines.multimodal import decode_pool, read_corpus
from humid_ray.stages.components import connected_components
from humid_ray.stages.joins import apply_sorted_labels, sorted_member
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


def _payload_digests(data: np.ndarray, offs: np.ndarray,
                     n: int) -> tuple[np.ndarray, np.ndarray]:
    """(h1, h2) uint64 digests per payload segment.

    ONE C-speed BLAKE2b pass per payload, 16-byte digest split into
    (h1, h2). For ~100 KB payloads a per-segment C call at GB/s beats
    the "vectorized" byte-polynomial by >20x: that kernel materializes
    ~40 bytes of int64 temporaries PER PAYLOAD BYTE (and would do it
    twice) — memory traffic, not compute, was the wall. The
    rows-per-batch loop costs ~1 µs per row against ~70 µs of hashing.
    memoryview slices of the flat Arrow buffer keep it zero-copy."""
    import hashlib

    h1 = np.empty(n, dtype=UINT64)
    h2 = np.empty(n, dtype=UINT64)
    mv = memoryview(data)
    # offsets are ABSOLUTE positions into the full values buffer —
    # subtracting offs[0] would read the wrong segments for any
    # sliced (non-zero-offset) array sharing a parent buffer
    for i in range(n):
        d = hashlib.blake2b(
            mv[offs[i]:offs[i + 1]], digest_size=16
        ).digest()
        h1[i] = int.from_bytes(d[:8], "little")
        h2[i] = int.from_bytes(d[8:], "little")
    return h1, h2


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
        n = batch.num_rows
        h1, h2 = _payload_digests(data, offs, n)
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


def _uniq_with_min_node(ds, value_col: str):
    """(node, <value_col>) Dataset -> (sig, count, node = min node) per
    DISTINCT value: the uniq collapse carrying a representative node,
    with a per-batch combiner before the groupby (materialized — every
    caller consumes it at least twice). Shared by the fused-dedup
    pipelines (image + document axes)."""
    from ray.data.aggregate import Min, Sum

    def partial(t: pa.Table) -> pa.Table:
        out = {"sig": pa.array([], type=pa.int64()),
               "count": pa.array([], type=pa.int64()),
               "node": pa.array([], type=pa.int64())}
        if t.num_rows == 0:
            return pa.table(out)
        g = t.group_by(value_col).aggregate([(value_col, "count"),
                                             ("node", "min")])
        return pa.table({"sig": g.column(value_col),
                         "count": g.column(f"{value_col}_count"),
                         "node": g.column("node_min")})

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("sig")
        .aggregate(Sum("count", alias_name="count"),
                   Min("node", alias_name="node"))
    ).materialize()


def _edges_to_node_space(value_edges, uniq_ds):
    """VALUE-level edge Dataset (sig_a, sig_b) -> representative-node
    endpoint arrays (na, nb). Pulls ONLY the edge-touched (sig, node)
    rows of ``uniq_ds`` (edge-bounded — the flagship's own CC pull),
    then maps both endpoints by sorted lookup. Shared by the
    fused-dedup pipelines (image + document axes)."""
    ea_parts, eb_parts = [], []
    for b in value_edges.iter_batches(batch_size=65536,
                                      batch_format="pyarrow"):
        ea_parts.append(b.column("sig_a").to_numpy(zero_copy_only=False))
        eb_parts.append(b.column("sig_b").to_numpy(zero_copy_only=False))
    if not ea_parts:
        return (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64))
    ea = np.concatenate(ea_parts)
    eb = np.concatenate(eb_parts)
    if not len(ea):
        return (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64))
    touched = np.unique(np.concatenate([ea, eb]))
    tref = ray.put(touched)

    def touched_only(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"sig": pa.array([], type=pa.int64()),
                             "node": pa.array([], type=pa.int64())})
        sig = t.column("sig").to_numpy(zero_copy_only=False)
        # `touched` is already sorted (np.unique) — probe it with
        # searchsorted rather than np.isin, which re-sorts per batch
        keep = sorted_member(ray.get(tref), sig)
        return pa.table({"sig": pa.array(sig[keep]),
                         "node": pc.array_filter(
                             t.column("node"), pa.array(keep))})

    mparts = [
        (b.column("sig").to_numpy(zero_copy_only=False),
         b.column("node").to_numpy(zero_copy_only=False))
        for b in uniq_ds.map_batches(touched_only, batch_format="pyarrow")
        .iter_batches(batch_size=65536, batch_format="pyarrow")
    ]
    msig = np.concatenate([p[0] for p in mparts]) if mparts \
        else np.empty(0, dtype=np.int64)
    mnode = np.concatenate([p[1] for p in mparts]) if mparts \
        else np.empty(0, dtype=np.int64)
    order = np.argsort(msig, kind="stable")
    msig, mnode = msig[order], mnode[order]
    return mnode[np.searchsorted(msig, ea)], mnode[np.searchsorted(msig, eb)]


def _edges_with_hot_salting(uniq_ds, cfg: HumidConfig):
    """uniq (sig, count) Dataset -> verified edge Dataset via the
    flagship chain: counting pre-pass -> hot (band, key) set ->
    salted banded LSH + per-bucket Hamming verify. Shared by every
    image operator that builds the phash cluster graph (curate,
    tiered report, top clusters, distance histogram)."""
    bc = band_bucket_counts(uniq_ds, cfg)
    hot_tab = bc.map_batches(
        lambda t: t.filter(pc.greater(t.column("n"),
                                      cfg.hot_band_threshold)),
        batch_format="pyarrow",
    ).take_all()
    hot_keys = {(int(r["band_id"]), int(r["band_key"])) for r in hot_tab}
    return find_edges(uniq_ds, cfg, hot_keys or None)


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


def curate_images(corpus_dir: str, broadcast_max_labels: int = 1_000_000,
                  *, _rep_by_size: bool = False):
    """(image_id, canonical_id, cluster_rep, keep): the composed image
    curation keep-list — usable gate (non-NULL stored phash, the
    flagship's stored-mode filter) -> exact-byte canonical -> pHash
    Hamming<=1 near-dup clusters (the flagship's counting pre-pass +
    salted banded LSH + distributed connected components, phash-only
    config) -> cluster_rep = min image_id per cluster, keep one row
    per cluster. With ``_rep_by_size`` (see
    ``curate_images_keep_best``) the representative is instead the
    member with the LARGEST encoded payload, tie -> min image_id.

    Scale shape: the payload never shuffles (byte identity via the
    in-batch 128-bit hash); the cluster graph is built over DISTINCT
    phash values only (the flagship uniq collapse); the phash->cluster
    label map is edge-bounded and broadcast once via ``ray.put`` below
    ``broadcast_max_labels``, else applied with a distributed
    left-outer ``Dataset.join`` — the same auto-switch as the flagship
    annotate stage (stages/outputs.py)."""
    cfg = HumidConfig(sources=("phash",), clustering="maximum")
    canon_extra = ("phash", "ln") if _rep_by_size else ("phash",)

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
        _canonical_bucket(extra_cols=canon_extra), batch_format="pyarrow"
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
    edges = _edges_with_hot_salting(uniq_ds, cfg)
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
                cols = {"image_id": pa.array([], type=pa.string()),
                        "canonical_id": pa.array([], type=pa.string()),
                        "label": pa.array([], type=pa.int64())}
                if _rep_by_size:
                    cols["ln"] = pa.array([], type=pa.int64())
                return pa.table(cols)
            keys, labs = ray.get(ref)
            ph = t.column("phash").to_numpy(zero_copy_only=False)
            lab = apply_sorted_labels(keys, labs,
                                      ph.astype(np.int64, copy=False))
            cols = {"image_id": t.column("image_id"),
                    "canonical_id": t.column("canonical_id"),
                    "label": pa.array(lab)}
            if _rep_by_size:
                cols["ln"] = t.column("ln")
            return pa.table(cols)

        labeled = canon.map_batches(label_kernel, batch_format="pyarrow")
    else:
        from humid_ray.stages.joins import join_kwargs

        # comp is the smaller side (edge-touched distinct sigs only)
        joined = canon.join(comp, join_type="left_outer", on=("phash",),
                            right_on=("sig",), **join_kwargs(n_labels))

        def fill(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                cols = {"image_id": pa.array([], type=pa.string()),
                        "canonical_id": pa.array([], type=pa.string()),
                        "label": pa.array([], type=pa.int64())}
                if _rep_by_size:
                    cols["ln"] = pa.array([], type=pa.int64())
                return pa.table(cols)
            lab = pc.coalesce(t.column("comp"), t.column("phash"))
            cols = {"image_id": t.column("image_id"),
                    "canonical_id": t.column("canonical_id"),
                    "label": lab}
            if _rep_by_size:
                cols["ln"] = t.column("ln")
            return pa.table(cols)

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
        if _rep_by_size:
            ln = g.column("ln").to_numpy(zero_copy_only=False)
            # largest payload first, tie -> min id: segment head wins
            order = np.lexsort((ids, -ln, lab))
        else:
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


def curate_images_keep_best(corpus_dir: str,
                            broadcast_max_labels: int = 1_000_000):
    """(image_id, canonical_id, cluster_rep, keep): ``curate_images``
    with a QUALITY-AWARE representative — among each pHash near-dup
    cluster keep the member with the largest encoded payload (most
    bytes survived compression ≈ highest-fidelity copy of the
    re-crawled/re-encoded family), tie -> min image_id. The image-axis
    analog of ``dedup_text.minhash_dedup_keep_best``.

    Scale shape: identical to ``curate_images`` — the quality key is
    the payload length the byte-identity kernel already computes, so
    keep-best costs ZERO extra passes; bytes still never shuffle."""
    return curate_images(corpus_dir, broadcast_max_labels,
                         _rep_by_size=True)


def curate_images_keep_best_sql(corpus_glob: str,
                                max_distance: int = 1) -> str:
    """DuckDB oracle for ``curate_images_keep_best``: the
    ``curate_images`` closure with the representative window ranked by
    payload length DESC then image_id."""
    return (
        "WITH RECURSIVE u AS (SELECT image_id, bytes, phash, "
        "CAST(octet_length(bytes) AS BIGINT) AS ln "
        f"FROM read_parquet('{corpus_glob}') WHERE phash IS NOT NULL), "
        "canon AS (SELECT image_id, "
        "min(image_id) OVER (PARTITION BY bytes) AS canonical_id, "
        "phash, ln FROM u), "
        "nodes AS (SELECT DISTINCT phash AS sig FROM u), "
        "e AS (SELECT a.sig AS sa, b.sig AS sb FROM nodes a JOIN nodes b "
        f"ON a.sig != b.sig AND bit_count(xor(a.sig, b.sig)) <= {max_distance}), "
        "reach(src, dst) AS (SELECT sig, sig FROM nodes UNION "
        "SELECT r.src, e.sb FROM reach r JOIN e ON e.sa = r.dst), "
        "comp AS (SELECT src AS sig, "
        f"xor(min(xor(dst, {_SB})), {_SB}) AS label FROM reach GROUP BY src), "
        "lab AS (SELECT c.image_id, c.canonical_id, c.ln, m.label "
        "FROM canon c JOIN comp m ON m.sig = c.phash) "
        "SELECT image_id, canonical_id, "
        "first_value(image_id) OVER "
        "(PARTITION BY label ORDER BY ln DESC, image_id) AS cluster_rep, "
        "image_id = first_value(image_id) OVER "
        "(PARTITION BY label ORDER BY ln DESC, image_id) AS \"keep\" "
        "FROM lab"
    )


# --- per-format payload stats ---------------------------------------------

def image_format_stats(corpus_dir: str):
    """(fmt, n, total_bytes, avg_bytes): payload footprint per encoded
    format — the storage-planning report an image-corpus ingester runs
    first (which formats dominate, what a re-encode pass would save).

    Scale shape: one pruned (fmt, bytes) scan; byte lengths come from
    the Arrow offsets (the payload itself is never copied), per-batch
    Arrow ``group_by`` collapses to |fmts| partial rows, so the global
    groupby moves |fmts| x blocks tiny rows. ``avg_bytes`` is one
    float64 division per format performed once after the integer sums
    (order-independent-exact, DuckDB-bit-equal)."""
    from ray.data.aggregate import Sum

    from humid_ray.util import round_half_away

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"fmt": pa.array([], type=pa.string()),
                             "n": pa.array([], type=pa.int64()),
                             "total_bytes": pa.array([], type=pa.int64())})
        _, offs = _flat_binary(batch.column("bytes"))
        lens = (offs[1:] - offs[:-1]).astype(np.int64)
        t = pa.table({"fmt": batch.column("fmt"), "ln": pa.array(lens)})
        g = t.group_by("fmt").aggregate([("ln", "sum"), ("ln", "count")])
        return pa.table({"fmt": g.column("fmt"),
                         "n": g.column("ln_count"),
                         "total_bytes": g.column("ln_sum")})

    agg = (
        read_corpus(corpus_dir, columns=["fmt", "bytes"])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("fmt")
        .aggregate(Sum("n", alias_name="n"),
                   Sum("total_bytes", alias_name="total_bytes"))
    )

    def finish(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"fmt": pa.array([], type=pa.string()),
                             "n": pa.array([], type=pa.int64()),
                             "total_bytes": pa.array([], type=pa.int64()),
                             "avg_bytes": pa.array([], type=pa.float64())})
        n = t.column("n").to_numpy(zero_copy_only=False).astype(np.float64)
        tot = t.column("total_bytes").to_numpy(zero_copy_only=False)
        avg = round_half_away(tot.astype(np.float64) / n)
        return pa.table({"fmt": t.column("fmt"), "n": t.column("n"),
                         "total_bytes": t.column("total_bytes"),
                         "avg_bytes": pa.array(avg)})

    return agg.map_batches(finish, batch_format="pyarrow")


def image_format_stats_sql(corpus_glob: str) -> str:
    """DuckDB oracle for ``image_format_stats``."""
    return (
        "SELECT fmt, CAST(count(*) AS BIGINT) AS n, "
        "CAST(sum(octet_length(bytes)) AS BIGINT) AS total_bytes, "
        "round(CAST(sum(octet_length(bytes)) AS DOUBLE) / count(*), 6) "
        "AS avg_bytes "
        f"FROM read_parquet('{corpus_glob}') GROUP BY fmt"
    )


# --- caption collisions (same caption, different payload) ------------------

def caption_collisions(corpus_dir: str):
    """(caption, n_rows, n_variants): captions attached to MORE THAN
    ONE distinct image payload — the label-quality screen of an
    image+caption corpus (a caption reused across genuinely different
    images is a weak supervision signal; a crawler stamping one alt
    text on every thumbnail shows up here first).

    Scale shape: the payload is collapsed in-batch to the 128-bit+len
    identity triple (module docstring) and never shuffles; per-batch
    Arrow ``group_by`` dedupes (caption, identity) combos with row
    counts, so the single exchange carries batch-distinct combos
    keyed by caption-hash bucket (256 buckets — the per-bucket kernel
    is two C-speed Arrow group_bys, never a per-caption Python call).
    Variant identity is the BLAKE2b-128+length composite; a digest
    collision would undercount n_variants (probability ~n^2/2^129)."""
    from humid_ray.util import hash_bytes_segments

    def partial(batch: pa.Table) -> pa.Table:
        out = {"caption": pa.array([], type=pa.string()),
               "h1": pa.array([], type=pa.int64()),
               "h2": pa.array([], type=pa.int64()),
               "ln": pa.array([], type=pa.int64()),
               "rows": pa.array([], type=pa.int64()),
               "bucket": pa.array([], type=pa.int64())}
        if batch.num_rows == 0:
            return pa.table(out)
        data, offs = _flat_binary(batch.column("bytes"))
        h1, h2 = _payload_digests(data, offs, batch.num_rows)
        t = pa.table({
            "caption": batch.column("caption"),
            "h1": u64col(h1),
            "h2": u64col(h2),
            "ln": pa.array((offs[1:] - offs[:-1]).astype(np.int64)),
        })
        g = t.group_by(["caption", "h1", "h2", "ln"]).aggregate(
            [("caption", "count")]
        )
        cap = g.column("caption").combine_chunks()
        cdata, coffs = _flat_str(cap)
        ch = hash_bytes_segments(cdata, coffs)
        return pa.table({
            "caption": g.column("caption"),
            "h1": g.column("h1"), "h2": g.column("h2"),
            "ln": g.column("ln"),
            "rows": g.column("caption_count"),
            "bucket": pa.array((ch % UINT64(_CANON_BUCKETS))
                               .astype(np.int64)),
        })

    def per_bucket(g: pa.Table) -> pa.Table:
        out = {"caption": pa.array([], type=pa.string()),
               "n_rows": pa.array([], type=pa.int64()),
               "n_variants": pa.array([], type=pa.int64())}
        if g.num_rows == 0:
            return pa.table(out)
        combos = g.group_by(["caption", "h1", "h2", "ln"]).aggregate(
            [("rows", "sum")]
        )
        caps = combos.group_by("caption").aggregate(
            [("rows_sum", "sum"), ("h1", "count")]
        )
        res = pa.table({"caption": caps.column("caption"),
                        "n_rows": caps.column("rows_sum_sum"),
                        "n_variants": caps.column("h1_count")})
        return res.filter(pc.greater(res.column("n_variants"), 1))

    return (
        read_corpus(corpus_dir, columns=["caption", "bytes"])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pyarrow")
    )


def caption_collisions_sql(corpus_glob: str) -> str:
    """DuckDB oracle for ``caption_collisions`` (raw-bytes variants)."""
    return (
        "SELECT caption, CAST(count(*) AS BIGINT) AS n_rows, "
        "CAST(count(DISTINCT bytes) AS BIGINT) AS n_variants "
        f"FROM read_parquet('{corpus_glob}') GROUP BY caption "
        "HAVING count(DISTINCT bytes) > 1"
    )


def _flat_str(col: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """String array -> (flat utf8 uint8 buffer, absolute int64 offsets)."""
    odt = np.int64 if pa.types.is_large_string(col.type) else np.int32
    offs = np.frombuffer(col.buffers()[1], dtype=odt)[
        col.offset : col.offset + len(col) + 1
    ].astype(np.int64)
    data = np.frombuffer(col.buffers()[2], dtype=np.uint8)
    return data, offs


# --- joint caption+pHash near-dup (the A+B axes pair finder) ---------------

_NEARDUP_PAIR_CAP = 200_000


def caption_phash_neardup(corpus_dir: str, max_distance: int = 2):
    """(image_a, image_b, dist): near-duplicate pairs confirmed by BOTH
    modalities — caption byte-equality as the blocking key, pHash
    Hamming <= ``max_distance`` as the visual verify (reference
    neighbor semantics, src/humid.cc findHammingNeighbours). The
    joint rule is the high-precision tier of image+caption dedup: a
    re-crawled photo keeps its alt text, so requiring agreement
    suppresses the false pairs either modality alone would emit.

    Scale shape: rows collapse in-batch to distinct (caption, phash)
    nodes carrying the min image_id (the flagship uniq collapse), so
    the one exchange moves nodes, not rows; empty captions (a hot
    junk key at crawl scale) are excluded up front. The per-bucket
    kernel walks caption segments calling the flagship's
    ``_pairs_within`` (capped + pigeonhole-recursive, lsh.py) — a
    pathological caption with thousands of distinct phashes
    sub-splits instead of going O(g^2). Pairs are emitted once,
    normalized image_a < image_b."""
    from humid_ray.stages.lsh import _pairs_within
    from humid_ray.util import hamming64, hash_bytes_segments

    def partial(batch: pa.Table) -> pa.Table:
        out = {"caption": pa.array([], type=pa.string()),
               "phash": pa.array([], type=pa.int64()),
               "rep": pa.array([], type=pa.string()),
               "bucket": pa.array([], type=pa.int64())}
        if batch.num_rows == 0:
            return pa.table(out)
        keep = pc.and_(pc.is_valid(batch.column("phash")),
                       pc.not_equal(batch.column("caption"), ""))
        batch = batch.filter(keep)
        if batch.num_rows == 0:
            return pa.table(out)
        g = batch.group_by(["caption", "phash"]).aggregate(
            [("image_id", "min")]
        )
        cap = g.column("caption").combine_chunks()
        cdata, coffs = _flat_str(cap)
        ch = hash_bytes_segments(cdata, coffs)
        return pa.table({
            "caption": g.column("caption"),
            "phash": g.column("phash"),
            "rep": g.column("image_id_min"),
            "bucket": pa.array((ch % UINT64(_CANON_BUCKETS))
                               .astype(np.int64)),
        })

    def per_bucket(g: pa.Table) -> pa.Table:
        out = {"image_a": pa.array([], type=pa.string()),
               "image_b": pa.array([], type=pa.string()),
               "dist": pa.array([], type=pa.int64())}
        if g.num_rows == 0:
            return pa.table(out)
        nodes = g.group_by(["caption", "phash"]).aggregate(
            [("rep", "min")]
        )
        cap_idx = nodes.column("caption").combine_chunks() \
            .dictionary_encode().indices.to_numpy(zero_copy_only=False)
        ph = nodes.column("phash").to_numpy(zero_copy_only=False) \
            .view(UINT64)
        reps = np.asarray(nodes.column("rep_min").to_pylist(), dtype=object)
        order = np.lexsort((ph.view(np.int64), cap_idx))
        cs, ps, rs = cap_idx[order], ph[order], reps[order]
        bounds = np.flatnonzero(np.r_[True, cs[1:] != cs[:-1], True])
        ia, ib, dd = [], [], []
        for s, e in zip(bounds[:-1], bounds[1:]):
            if e - s < 2:
                continue
            seg = ps[s:e]  # distinct phashes, ascending as int64
            pairs = _pairs_within(seg, max_distance, _NEARDUP_PAIR_CAP)
            if not pairs:
                continue
            pa_arr = np.fromiter((p[0] for p in pairs), dtype=UINT64,
                                 count=len(pairs))
            pb_arr = np.fromiter((p[1] for p in pairs), dtype=UINT64,
                                 count=len(pairs))
            seg_sorted = np.sort(seg.view(np.int64)).view(UINT64)
            seg_reps = rs[s:e][np.argsort(seg.view(np.int64),
                                          kind="stable")]
            ra = seg_reps[np.searchsorted(seg_sorted.view(np.int64),
                                          pa_arr.view(np.int64))]
            rb = seg_reps[np.searchsorted(seg_sorted.view(np.int64),
                                          pb_arr.view(np.int64))]
            d = hamming64(pa_arr, pb_arr).astype(np.int64)
            swap = ra > rb
            ra2 = np.where(swap, rb, ra)
            rb2 = np.where(swap, ra, rb)
            ia.extend(ra2.tolist())
            ib.extend(rb2.tolist())
            dd.extend(d.tolist())
        return pa.table({"image_a": pa.array(ia, type=pa.string()),
                         "image_b": pa.array(ib, type=pa.string()),
                         "dist": pa.array(dd, type=pa.int64())})

    return (
        read_corpus(corpus_dir, columns=["image_id", "caption", "phash"])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pyarrow")
    )


def caption_phash_neardup_sql(corpus_glob: str, max_distance: int = 2) -> str:
    """DuckDB oracle for ``caption_phash_neardup``."""
    return (
        "WITH u AS (SELECT caption, phash, min(image_id) AS rep "
        f"FROM read_parquet('{corpus_glob}') "
        "WHERE phash IS NOT NULL AND caption <> '' "
        "GROUP BY caption, phash) "
        "SELECT CASE WHEN a.rep < b.rep THEN a.rep ELSE b.rep END "
        "AS image_a, "
        "CASE WHEN a.rep < b.rep THEN b.rep ELSE a.rep END AS image_b, "
        "CAST(bit_count(xor(a.phash, b.phash)) AS BIGINT) AS dist "
        "FROM u a JOIN u b ON a.caption = b.caption AND a.phash < b.phash "
        f"WHERE bit_count(xor(a.phash, b.phash)) <= {max_distance}"
    )


# --- the image-axis tier-dedup funnel --------------------------------------

def tiered_dedup_report_images(corpus_dir: str):
    """The TIER-DEDUP funnel on the image axis: how many rows each
    curation tier keeps and removes. Tier 0 = raw corpus; tier 1 =
    usable rows (non-NULL stored phash — the flagship's stored-mode
    gate); tier 2 = byte-exact dedup survivors (distinct payload
    identity among usable rows); tier 3 = pHash Hamming clusters (the
    flagship's banded-LSH + connected components over DISTINCT phash,
    one keep per cluster — exactly ``curate_images``'s keep count).
    Returns one row per tier: (tier, name, survivors, removed).

    Scale shape: counts only — nothing corpus-sized reaches the
    driver. The byte tier hashes payloads in-batch (identity triple,
    bytes never shuffle) and counts distinct combos per hash bucket
    (256 tiny rows to the driver); the cluster tier reuses the
    flagship uniq-collapse -> counting pre-pass -> salted banded LSH
    -> distributed CC machinery, and derives the cluster count as
    n_distinct_phash - n_edge_touched + n_distinct_labels (comp covers
    edge-touched sigs only). At 100 TB each tier reads the per-phase
    parquet checkpoint of the previous one (state/checkpoints.py)
    instead of re-deriving it by lineage."""
    from ray.data.aggregate import Count

    cfg = HumidConfig(sources=("phash",), clustering="maximum")

    ph = read_corpus(corpus_dir, columns=["phash"])
    total = ph.count()

    def usable_only(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        return t.filter(pc.is_valid(t.column("phash")))

    usable_ds = ph.map_batches(
        usable_only, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    n_usable = usable_ds.count()

    # tier 2: distinct payload identities among usable rows
    def ident_partial(batch: pa.Table) -> pa.Table:
        out = {"h1": pa.array([], type=pa.int64()),
               "h2": pa.array([], type=pa.int64()),
               "ln": pa.array([], type=pa.int64()),
               "bucket": pa.array([], type=pa.int64())}
        if batch.num_rows == 0:
            return pa.table(out)
        batch = batch.filter(pc.is_valid(batch.column("phash")))
        if batch.num_rows == 0:
            return pa.table(out)
        data, offs = _flat_binary(batch.column("bytes"))
        h1, h2 = _payload_digests(data, offs, batch.num_rows)
        t = pa.table({
            "h1": u64col(h1), "h2": u64col(h2),
            "ln": pa.array((offs[1:] - offs[:-1]).astype(np.int64)),
            "bucket": pa.array((h1 % UINT64(_CANON_BUCKETS))
                               .astype(np.int64)),
        })
        return t.group_by(["h1", "h2", "ln", "bucket"]).aggregate([])

    def count_distinct(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table({"n": pa.array([], type=pa.int64())})
        d = g.group_by(["h1", "h2", "ln"]).aggregate([])
        return pa.table({"n": pa.array([d.num_rows], type=pa.int64())})

    per_bucket = (
        read_corpus(corpus_dir, columns=["bytes", "phash"])
        .map_batches(ident_partial, batch_format="pyarrow",
                     zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(count_distinct, batch_format="pyarrow")
        .take_all()
    )
    n_exact = int(sum(r["n"] for r in per_bucket))

    # tier 3: Hamming clusters over distinct phash (flagship machinery)
    uniq_ds = (
        usable_ds.groupby("phash")
        .aggregate(Count(alias_name="count"))
        .map_batches(
            lambda t: pa.table({"sig": t.column("phash"),
                                "count": t.column("count")}),
            batch_format="pyarrow",
        )
    ).materialize()
    n_uniq = uniq_ds.count()
    if n_uniq:
        edges = _edges_with_hot_salting(uniq_ds, cfg)
        comp = connected_components(edges, cfg).materialize()
        n_touched = comp.count()
        n_labels = (
            comp.groupby("comp").aggregate(Count(alias_name="c")).count()
            if n_touched else 0
        )
        n_clusters = n_uniq - n_touched + n_labels
    else:
        n_clusters = 0

    return pa.table({
        "tier": pa.array([0, 1, 2, 3], type=pa.int64()),
        "name": pa.array(["total", "usable", "exact_bytes",
                          "phash_cluster"], type=pa.string()),
        "survivors": pa.array([total, n_usable, n_exact, n_clusters],
                              type=pa.int64()),
        "removed": pa.array([0, total - n_usable, n_usable - n_exact,
                             n_exact - n_clusters], type=pa.int64()),
    })


def tiered_dedup_report_images_sql(corpus_glob: str,
                                   max_distance: int = 1) -> str:
    """DuckDB oracle for ``tiered_dedup_report_images``: the
    curate_images recursive Hamming closure, reduced to tier counts."""
    return (
        "WITH RECURSIVE u AS (SELECT image_id, bytes, phash "
        f"FROM read_parquet('{corpus_glob}') WHERE phash IS NOT NULL), "
        "nodes AS (SELECT DISTINCT phash AS sig FROM u), "
        "e AS (SELECT a.sig AS sa, b.sig AS sb FROM nodes a JOIN nodes b "
        f"ON a.sig != b.sig AND bit_count(xor(a.sig, b.sig)) <= {max_distance}), "
        "reach(src, dst) AS (SELECT sig, sig FROM nodes UNION "
        "SELECT r.src, e.sb FROM reach r JOIN e ON e.sa = r.dst), "
        "comp AS (SELECT src AS sig, "
        f"xor(min(xor(dst, {_SB})), {_SB}) AS label FROM reach GROUP BY src), "
        f"tot AS (SELECT count(*) AS n FROM read_parquet('{corpus_glob}')), "
        "usa AS (SELECT count(*) AS n FROM u), "
        "exn AS (SELECT count(DISTINCT bytes) AS n FROM u), "
        "cln AS (SELECT count(DISTINCT label) AS n FROM comp) "
        "SELECT CAST(0 AS BIGINT) AS tier, 'total' AS name, "
        "CAST(t.n AS BIGINT) AS survivors, CAST(0 AS BIGINT) AS removed "
        "FROM tot t "
        "UNION ALL SELECT 1, 'usable', CAST(u2.n AS BIGINT), "
        "CAST(t.n - u2.n AS BIGINT) FROM tot t, usa u2 "
        "UNION ALL SELECT 2, 'exact_bytes', CAST(e2.n AS BIGINT), "
        "CAST(u2.n - e2.n AS BIGINT) FROM usa u2, exn e2 "
        "UNION ALL SELECT 3, 'phash_cluster', CAST(c.n AS BIGINT), "
        "CAST(e2.n - c.n AS BIGINT) FROM exn e2, cln c"
    )


# --- round-3: duplication hot-spot report + bivariate profiling -------------

def top_dup_clusters(corpus_dir: str, k: int = 10, max_distance: int = 1):
    """(rep_sig, n_images): the k most-duplicated pHash near-dup
    clusters — "which images does the crawler keep re-fetching" —
    ordered by member count DESC, then unsigned rep_sig ASC. rep_sig =
    the cluster's minimum member phash in UNSIGNED 64-bit order (a
    content-derived, corpus-stable cluster name); n_images counts
    usable ROWS (byte-dups individually), i.e. Σ exact-dup counts over
    the cluster's distinct phashes.

    Scale shape: the flagship funnel — usable gate -> uniq collapse
    (the ONLY corpus-wide exchange, of an 8-byte column) -> counting
    pre-pass + salted banded LSH + CC over DISTINCT sigs -> labels
    broadcast once -> |labels|-row groupby -> per-block partial top-k
    (a semigroup) -> ≤ k×blocks-row driver merge. Payload and caption
    are never read."""
    from ray.data.aggregate import Min, Sum

    cfg = HumidConfig(sources=("phash",), clustering="maximum")
    sb = np.int64(-(2 ** 63))  # sign-bit flip: signed order == unsigned

    out_empty = pa.table({"rep_sig": pa.array([], type=pa.int64()),
                          "n_images": pa.array([], type=pa.int64())})

    def usable(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        return batch.filter(pc.is_valid(batch.column("phash")))

    uniq_ds = (
        read_corpus(corpus_dir, columns=["phash"])
        .map_batches(usable, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("phash")
        .aggregate(Count(alias_name="count"))
        .map_batches(
            lambda t: pa.table({"sig": t.column("phash"),
                                "count": t.column("count")}),
            batch_format="pyarrow",
        )
    ).materialize()

    edges = _edges_with_hot_salting(uniq_ds, cfg)
    comp = connected_components(edges, cfg).materialize()

    parts = [
        (b.column("sig").to_numpy(zero_copy_only=False),
         b.column("comp").to_numpy(zero_copy_only=False))
        for b in comp.iter_batches(batch_size=65536, batch_format="pyarrow")
    ]
    if parts:
        keys = np.concatenate([p[0] for p in parts])
        labs = np.concatenate([p[1] for p in parts])
        order = np.argsort(keys, kind="stable")
        keys, labs = keys[order], labs[order]
    else:
        keys = np.empty(0, dtype=np.int64)
        labs = np.empty(0, dtype=np.int64)
    ref = ray.put((keys, labs))

    def label_kernel(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"label": pa.array([], type=pa.int64()),
                             "count": pa.array([], type=pa.int64()),
                             "flip": pa.array([], type=pa.int64())})
        ks, ls = ray.get(ref)
        sig = t.column("sig").to_numpy(zero_copy_only=False)
        lab = apply_sorted_labels(ks, ls, sig)
        # flip the sign bit so signed Min == unsigned min of the sig
        return pa.table({"label": pa.array(lab),
                         "count": t.column("count"),
                         "flip": pa.array(sig ^ sb)})

    agg = (
        uniq_ds.map_batches(label_kernel, batch_format="pyarrow",
                            zero_copy_batch=True)
        .groupby("label")
        .aggregate(Sum(on="count", alias_name="n_images"),
                   Min(on="flip", alias_name="rep_flip"))
    )

    def partial_topk(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_empty
        n = t.column("n_images").to_numpy(zero_copy_only=False)
        rep = t.column("rep_flip").to_numpy(zero_copy_only=False)
        order = np.lexsort((rep, -n))[:k]
        return pa.table({"rep_sig": pa.array(rep[order] ^ sb),
                         "n_images": pa.array(n[order])})

    cand = agg.map_batches(partial_topk, batch_format="pyarrow").take_all()
    if not cand:
        return ray.data.from_arrow(out_empty)
    n = np.array([r["n_images"] for r in cand], dtype=np.int64)
    rep = np.array([r["rep_sig"] for r in cand], dtype=np.int64)
    order = np.lexsort((rep ^ sb, -n))[:k]
    return ray.data.from_arrow(pa.table({
        "rep_sig": pa.array(rep[order]),
        "n_images": pa.array(n[order]),
    }))


def top_dup_clusters_sql(corpus_glob: str, k: int = 10,
                         max_distance: int = 1) -> str:
    """DuckDB oracle for ``top_dup_clusters``: recursive Hamming
    closure over distinct phash, per-component row sums, unsigned-min
    rep, deterministic (count DESC, unsigned rep ASC) top-k."""
    return (
        "WITH RECURSIVE u AS (SELECT phash "
        f"FROM read_parquet('{corpus_glob}') WHERE phash IS NOT NULL), "
        "cnt AS (SELECT phash AS sig, CAST(count(*) AS BIGINT) AS c "
        "FROM u GROUP BY phash), "
        "nodes AS (SELECT sig FROM cnt), "
        "e AS (SELECT a.sig AS sa, b.sig AS sb FROM nodes a JOIN nodes b "
        f"ON a.sig != b.sig AND bit_count(xor(a.sig, b.sig)) <= {max_distance}), "
        "reach(src, dst) AS (SELECT sig, sig FROM nodes UNION "
        "SELECT r.src, e.sb FROM reach r JOIN e ON e.sa = r.dst), "
        "comp AS (SELECT src AS sig, "
        f"xor(min(xor(dst, {_SB})), {_SB}) AS label FROM reach GROUP BY src), "
        "agg AS (SELECT comp.label, "
        "CAST(sum(cnt.c) AS BIGINT) AS n_images, "
        f"xor(min(xor(cnt.sig, {_SB})), {_SB}) AS rep_sig "
        "FROM cnt JOIN comp USING (sig) GROUP BY comp.label) "
        "SELECT rep_sig, n_images FROM agg "
        f"ORDER BY n_images DESC, xor(rep_sig, {_SB}) LIMIT {k}"
    )


def caption_payload_corr(corpus_dir: str):
    """One row (n_rows, corr): Pearson correlation between caption
    length (UTF-8 code points) and encoded payload size — the
    label-vs-content covariance screen ("are longer captions attached
    to richer images, or is the labeling pipeline decoupled?").

    Scale shape: shuffle-free — per-batch exact int64 moment partials
    (n, Σx, Σy, Σx², Σy², Σxy), a ≤|blocks|-row driver fold in
    unbounded Python ints, ONE float expression at the end. The float
    op order (cast each exact integer to double, multiply, sqrt,
    divide) matches the oracle token for token, so round6 is
    bit-equal. Zero variance or n < 2 -> NULL corr."""

    def partial(batch: pa.Table) -> pa.Table:
        cols = ("n", "sx", "sy", "sxx", "syy", "sxy")
        if batch.num_rows == 0:
            return pa.table({c: pa.array([], type=pa.int64()) for c in cols})
        cap = pc.fill_null(batch.column("caption"), "")
        x = pc.utf8_length(cap).to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        _, offs = _flat_binary(batch.column("bytes"))
        y = (offs[1:] - offs[:-1]).astype(np.int64)
        vals = (len(x), int(x.sum()), int(y.sum()), int((x * x).sum()),
                int((y * y).sum()), int((x * y).sum()))
        return pa.table({c: pa.array([v], type=pa.int64())
                         for c, v in zip(cols, vals)})

    parts = read_corpus(
        corpus_dir, columns=["caption", "bytes"]
    ).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    ).take_all()

    n = sum(int(r["n"]) for r in parts)
    sx = sum(int(r["sx"]) for r in parts)
    sy = sum(int(r["sy"]) for r in parts)
    sxx = sum(int(r["sxx"]) for r in parts)
    syy = sum(int(r["syy"]) for r in parts)
    sxy = sum(int(r["sxy"]) for r in parts)
    num = n * sxy - sx * sy
    va = n * sxx - sx * sx
    vb = n * syy - sy * sy
    if n < 2 or va == 0 or vb == 0:
        corr = None
    else:
        import math

        from humid_ray.util import round_half_away

        r = float(num) / math.sqrt(float(va) * float(vb))
        corr = float(round_half_away(np.array([r]), 6)[0])
    return ray.data.from_arrow(pa.table({
        "n_rows": pa.array([n], type=pa.int64()),
        "corr": pa.array([corr], type=pa.float64()),
    }))


def caption_payload_corr_sql(corpus_glob: str) -> str:
    """DuckDB oracle for ``caption_payload_corr``: the same exact
    HUGEINT moments and the same double expression (cast, multiply,
    sqrt, divide), so the round6 value is bit-equal."""
    return (
        "WITH m AS (SELECT CAST(count(*) AS HUGEINT) AS n, "
        "CAST(sum(length(coalesce(caption, ''))) AS HUGEINT) AS sx, "
        "CAST(sum(octet_length(bytes)) AS HUGEINT) AS sy, "
        "CAST(sum(length(coalesce(caption, '')) * "
        "length(coalesce(caption, ''))) AS HUGEINT) AS sxx, "
        "CAST(sum(octet_length(bytes) * octet_length(bytes)) AS HUGEINT) "
        "AS syy, "
        "CAST(sum(length(coalesce(caption, '')) * octet_length(bytes)) "
        "AS HUGEINT) AS sxy "
        f"FROM read_parquet('{corpus_glob}')) "
        "SELECT CAST(n AS BIGINT) AS n_rows, "
        "CASE WHEN n < 2 OR n * sxx - sx * sx = 0 OR n * syy - sy * sy = 0 "
        "THEN NULL ELSE round(CAST(n * sxy - sx * sy AS DOUBLE) / "
        "sqrt(CAST(n * sxx - sx * sx AS DOUBLE) * "
        "CAST(n * syy - sy * sy AS DOUBLE)), 6) END AS corr FROM m"
    )

# --- incremental image dedup (daily-crawl increment vs base corpus) ---------

_INCR_IMG_EMPTY = pa.table({
    "image_id": pa.array([], type=pa.string()),
    "exact_dup": pa.array([], type=pa.bool_()),
    "exact_rep": pa.array([], type=pa.string()),
    "near_dup": pa.array([], type=pa.bool_()),
    "near_rep": pa.array([], type=pa.string()),
})


def _incr_img_tag_kernel(new_pct: int, n_buckets: int):
    """(image_id, bytes, phash) -> (image_id, h1, h2, ln, phash,
    is_new): usable gate (non-NULL stored phash, the flagship's
    stored-mode filter), side membership by splitmix64-hash of the id
    string, byte identity hashed in-batch — the payload never leaves
    this task, and this is the ONLY stage that reads it (both sides
    derive from this one scan)."""
    from humid_ray.stages.joins import hash_string_column

    empty = pa.table({
        "image_id": pa.array([], type=pa.string()),
        "h1": pa.array([], type=pa.int64()),
        "h2": pa.array([], type=pa.int64()),
        "ln": pa.array([], type=pa.int64()),
        "phash": pa.array([], type=pa.int64()),
        "is_new": pa.array([], type=pa.bool_()),
    })

    def kernel(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return empty
        batch = batch.filter(pc.is_valid(batch.column("phash")))
        if batch.num_rows == 0:
            return empty
        idh = hash_string_column(batch.column("image_id"))
        mask = (idh % UINT64(n_buckets)) < UINT64(new_pct)
        data, offs = _flat_binary(batch.column("bytes"))
        h1, h2 = _payload_digests(data, offs, batch.num_rows)
        return pa.table({
            "image_id": batch.column("image_id"),
            "h1": u64col(h1),
            "h2": u64col(h2),
            "ln": pa.array((offs[1:] - offs[:-1]).astype(np.int64)),
            "phash": batch.column("phash"),
            "is_new": pa.array(mask),
        })

    return kernel


def _side(tagged, want_new: bool):
    def pick(t: pa.Table) -> pa.Table:
        keep = t.column("is_new") if want_new else pc.invert(
            t.column("is_new"))
        return t.filter(keep).drop_columns(["is_new"])

    return tagged.map_batches(pick, batch_format="pyarrow",
                              zero_copy_batch=True)


def _incr_img_finish(t: pa.Table) -> pa.Table:
    if t.num_rows == 0:
        return _INCR_IMG_EMPTY
    names = set(t.column_names)
    exact = (t.column("exact_rep") if "exact_rep" in names
             else pa.nulls(t.num_rows, type=pa.string()))
    near = (t.column("near_rep") if "near_rep" in names
            else pa.nulls(t.num_rows, type=pa.string()))
    return pa.table({
        "image_id": t.column("image_id"),
        "exact_dup": pc.is_valid(exact),
        "exact_rep": exact,
        "near_dup": pc.is_valid(near),
        "near_rep": near,
    })


def _incr_img_broadcast(new, base_ident, base):
    """Broadcast fast path of ``incremental_image_dedup``: the two
    collapsed base indexes (identity triple -> min id; distinct phash
    -> min id) pull once as sorted arrays, ship via ONE ``ray.put``,
    and the new side streams through a single vectorized probe kernel
    — zero ``Dataset.join`` aggregator pools in the hot path. String
    reps min-fold as RANKS into the sorted-unique rep array (same
    lexicographic order as the Min aggregate on ASCII ids)."""
    from ray.data.aggregate import Min

    # exact index: sort by primary key h1; probe verifies h2/ln
    ih1, ih2, iln, ireps = [], [], [], []
    for b in base_ident.iter_batches(batch_size=262144,
                                     batch_format="pyarrow"):
        ih1.append(b.column("h1").to_numpy(zero_copy_only=False))
        ih2.append(b.column("h2").to_numpy(zero_copy_only=False))
        iln.append(b.column("ln").to_numpy(zero_copy_only=False))
        ireps.append(np.asarray(b.column("exact_rep").to_pylist(),
                                dtype=object))
    h1s = np.concatenate(ih1)
    h2s = np.concatenate(ih2)
    lns = np.concatenate(iln)
    ereps = np.concatenate(ireps)
    order = np.argsort(h1s, kind="stable")
    h1s, h2s, lns, ereps = h1s[order], h2s[order], lns[order], ereps[order]

    # near index: distinct base phash -> min id, rep strings as ranks
    base_ph = base.groupby("phash").aggregate(
        Min("image_id", alias_name="ph_rep")
    )
    bps, brs = [], []
    for b in base_ph.iter_batches(batch_size=262144,
                                  batch_format="pyarrow"):
        bps.append(b.column("phash").to_numpy(zero_copy_only=False))
        brs.append(np.asarray(b.column("ph_rep").to_pylist(),
                              dtype=object))
    bph = np.concatenate(bps)
    brep = np.concatenate(brs)
    order = np.argsort(bph, kind="stable")
    bph, brep = bph[order], brep[order]
    uniq_reps, rep_rank = np.unique(brep, return_inverse=True)

    ref = ray.put((h1s, h2s, lns, ereps, bph, rep_rank, uniq_reps))
    _FLIPS = np.concatenate(
        [np.zeros(1, dtype=UINT64),
         (np.uint64(1) << np.arange(64, dtype=UINT64))]
    )

    def probe(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _INCR_IMG_EMPTY
        kh1, kh2, kln, kerep, kbph, krank, kuniq = ray.get(ref)
        n = t.num_rows
        h1 = t.column("h1").to_numpy(zero_copy_only=False)
        h2 = t.column("h2").to_numpy(zero_copy_only=False)
        ln = t.column("ln").to_numpy(zero_copy_only=False)
        ph = t.column("phash").to_numpy(zero_copy_only=False)
        # exact tier: h1 run + h2/ln verify (h1 runs are length 1 short
        # of a 64-bit digest collision; longer runs scan in Python)
        lo = np.searchsorted(kh1, h1, side="left")
        hi = np.searchsorted(kh1, h1, side="right")
        pos = np.minimum(lo, max(len(kh1) - 1, 0))
        exact = np.full(n, -1, dtype=np.int64)
        if len(kh1):
            single = (hi - lo == 1)
            m1 = single & (kh2[pos] == h2) & (kln[pos] == ln)
            exact[m1] = pos[m1]
            for i in np.flatnonzero(hi - lo > 1):
                for j in range(lo[i], hi[i]):
                    if kh2[j] == h2[i] and kln[j] == ln[i]:
                        exact[i] = j
                        break
        # near tier: 65 exhaustive Hamming<=1 probes, min-rank fold
        probes = (
            ph.view(UINT64)[:, None] ^ _FLIPS[None, :]
        ).view(np.int64).ravel()
        big = np.int64(np.iinfo(np.int64).max)
        ranks = np.full(n * 65, big, dtype=np.int64)
        if len(kbph):
            p = np.searchsorted(kbph, probes)
            p_c = np.minimum(p, len(kbph) - 1)
            hit = kbph[p_c] == probes
            ranks[hit] = krank[p_c[hit]]
        minrank = ranks.reshape(n, 65).min(axis=1)
        near_hit = minrank < big
        return pa.table({
            "image_id": t.column("image_id"),
            "exact_dup": pa.array(exact >= 0),
            "exact_rep": pa.array(
                [kerep[j] if j >= 0 else None for j in exact],
                type=pa.string()),
            "near_dup": pa.array(near_hit),
            "near_rep": pa.array(
                [kuniq[r] if h else None
                 for r, h in zip(minrank, near_hit)],
                type=pa.string()),
        })

    return new.map_batches(probe, batch_format="pyarrow",
                           zero_copy_batch=True)


def incremental_image_dedup(corpus_dir: str, new_pct: int = 20,
                            n_buckets: int = 100,
                            broadcast_max_base: int = 4_000_000):
    """(image_id, exact_dup, exact_rep, near_dup, near_rep) per NEW
    usable row: the image-axis daily-crawl increment — a shard of new
    images is scored against the existing corpus on BOTH dedup tiers
    (byte identity and pHash Hamming <= 1) without re-clustering the
    base. base/new is the deterministic hash split
    (splitmix64-id-hash % n_buckets < new_pct -> new), standing in for
    yesterday's corpus vs today's shard; exact_rep / near_rep are the
    smallest base image_id byte-equal / within Hamming 1 (NULL when
    novel on that tier).

    Scale shape (asymmetric by design: |new| << |base| daily):
    payloads hash to (h1, h2, ln) in-batch and never shuffle, in ONE
    corpus scan whose 40-byte-per-row identity output is materialized
    and consumed by both sides (at the real daily-increment scale the
    base side is the flagship's already-checkpointed uniq tables, so
    the daily run reads yesterday's index + today's shard — never the
    base corpus). Exact tier = one left-outer ``Dataset.join`` on the
    identity triple. Near tier probes, not bands: each DISTINCT new
    phash expands to 65 probes (identity + every 1-bit flip,
    exhaustive for Hamming <= 1 — no banding recall caveat),
    inner-joined against the base phash reps and min-folded per new
    phash; the 65x blowup rides the SMALL side only.
    Candidate-bounded joins sized via ``join_kwargs``. Below
    ``broadcast_max_base`` distinct base rows, both collapsed indexes
    ship as ONE sorted broadcast lookup and the new side streams
    through a single probe kernel instead of the three joins — the
    repo's broadcast/join auto-switch convention (forced-path
    equality pinned in tests/test_images.py)."""
    from ray.data.aggregate import Min

    from humid_ray.stages.joins import join_kwargs

    rows = read_corpus(corpus_dir, columns=["image_id", "bytes", "phash"])
    tagged = rows.map_batches(
        _incr_img_tag_kernel(new_pct, n_buckets),
        batch_format="pyarrow", zero_copy_batch=True,
    ).materialize()
    new = _side(tagged, True)
    n_new = new.count()
    if n_new == 0:
        return ray.data.from_arrow(_INCR_IMG_EMPTY)
    base = _side(tagged, False)
    n_base = base.count()
    if n_base == 0:
        return new.map_batches(_incr_img_finish, batch_format="pyarrow")

    # exact tier: distinct base identities -> min id, left join new
    base_ident = base.groupby(["h1", "h2", "ln"]).aggregate(
        Min("image_id", alias_name="exact_rep")
    )
    if n_base <= broadcast_max_base:
        return _incr_img_broadcast(new, base_ident, base)
    new2 = new.join(
        base_ident, join_type="left_outer", on=("h1", "h2", "ln"),
        **join_kwargs(n_new, n_base),
    )

    # near tier: 65 exhaustive Hamming<=1 probes per distinct new phash
    base_ph = base.groupby("phash").aggregate(
        Min("image_id", alias_name="ph_rep")
    ).rename_columns(["probe", "ph_rep"])

    def expand_probes(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"probe": pa.array([], type=pa.int64()),
                             "new_phash": pa.array([], type=pa.int64())})
        ph = t.column("phash").to_numpy(zero_copy_only=False).view(UINT64)
        flips = np.concatenate(
            [np.zeros(1, dtype=UINT64),
             (np.uint64(1) << np.arange(64, dtype=UINT64))]
        )
        probes = np.repeat(ph, 65) ^ np.tile(flips, len(ph))
        return pa.table({
            "probe": u64col(probes),
            "new_phash": pa.array(np.repeat(
                ph.view(np.int64), 65)),
        })

    new_ph = new.groupby("phash").aggregate(Count()).select_columns(["phash"])
    probes = new_ph.map_batches(expand_probes, batch_format="pyarrow",
                                zero_copy_batch=True)
    matched = probes.join(
        base_ph, join_type="inner", on=("probe",),
        **join_kwargs(n_new * 65, n_base),
    )
    # materialize: the count guard AND the new3 join both consume it
    # (un-materialized, the 65x expansion + join lineage would run
    # twice), and its TRUE row count sizes the rep join — sizing by
    # n_new would spread a tiny rep table over many partitions, and an
    # empty partition side crashes acero (see join_partitions)
    near = matched.groupby("new_phash").aggregate(
        Min("ph_rep", alias_name="near_rep")
    ).rename_columns(["phash", "near_rep"]).materialize()
    n_near = near.count()
    if n_near == 0:
        return new2.map_batches(_incr_img_finish, batch_format="pyarrow")
    new3 = new2.join(
        near, join_type="left_outer", on=("phash",),
        **join_kwargs(n_new, n_near),
    )
    return new3.map_batches(_incr_img_finish, batch_format="pyarrow")


def incremental_image_dedup_sql(corpus_glob: str, new_pct: int = 20,
                                n_buckets: int = 100) -> str:
    """DuckDB oracle for ``incremental_image_dedup``: the id-hash
    split chain (polynomial byte fold + splitmix64, HUGEINT
    arithmetic, = stages/joins.hash_string_column), byte-equality and
    bit_count(xor) <= 1 joins against the base."""
    from humid_ray.oracles import _horner_fold, _sm64_cols

    byte_list = (
        "list_transform(range(1, CAST(octet_length(tb) + 1 AS BIGINT)), "
        "jj -> CAST(CAST('0x' || substr(hex(tb), "
        "CAST(2*jj-1 AS INTEGER), 2) AS UBIGINT) AS HUGEINT))"
    )
    return (
        f"WITH c AS (SELECT image_id, bytes, phash, encode(image_id) AS tb "
        f"FROM read_parquet('{corpus_glob}') WHERE phash IS NOT NULL), "
        f"braw AS (SELECT image_id, bytes, phash, "
        f"{_horner_fold(byte_list)} AS hraw FROM c), "
        f"th AS (SELECT image_id, bytes, phash, "
        f"{_sm64_cols('hraw', 'ih')} FROM braw), "
        f"split AS (SELECT image_id, bytes, phash, "
        f"(ih % {n_buckets} < {new_pct}) AS is_new FROM th), "
        "base_b AS (SELECT bytes, min(image_id) AS exact_rep "
        "FROM split WHERE NOT is_new GROUP BY bytes), "
        "base_p AS (SELECT phash, min(image_id) AS ph_rep "
        "FROM split WHERE NOT is_new GROUP BY phash), "
        "newr AS (SELECT image_id, bytes, phash FROM split WHERE is_new), "
        "near AS (SELECT n.image_id, min(b.ph_rep) AS near_rep "
        "FROM newr n JOIN base_p b "
        "ON bit_count(xor(n.phash, b.phash)) <= 1 GROUP BY n.image_id) "
        "SELECT n.image_id, e.exact_rep IS NOT NULL AS exact_dup, "
        "e.exact_rep, nr.near_rep IS NOT NULL AS near_dup, nr.near_rep "
        "FROM newr n LEFT JOIN base_b e USING (bytes) "
        "LEFT JOIN near nr USING (image_id)"
    )


# --- Hamming-distance histogram (threshold calibration) ---------------------

def phash_distance_histogram(corpus_dir: str, max_distance: int = 4):
    """(dist, n_pairs): how many UNORDERED pairs of DISTINCT usable
    phash values sit at each Hamming distance 1..max_distance — the
    threshold-calibration report behind every near-dup run ("where
    does the distance mass sit? is max_distance=1 leaving obvious
    near-dups on the table?"). Run once at a wider radius before
    committing the production threshold.

    Scale shape: the corpus collapses to DISTINCT phashes (the
    flagship uniq collapse) before anything pairs; pairs come from the
    flagship pigeonhole-banded LSH (exhaustive for <= max_distance by
    construction: max_distance+1 bands, counting pre-pass + salted
    hot buckets), so no quadratic scan ever runs; the histogram is
    per-batch bincount partials over the edge-bounded pair list,
    folded driver-side — shuffle-free past the banding exchange."""
    from humid_ray.util import hamming64

    cfg = HumidConfig(sources=("phash",), max_distance=max_distance)

    def usable(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"phash": pa.array([], type=pa.int64())})
        return batch.filter(pc.is_valid(batch.column("phash")))

    uniq_ds = (
        read_corpus(corpus_dir, columns=["phash"])
        .map_batches(usable, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("phash")
        .aggregate(Count(alias_name="count"))
        .map_batches(
            lambda t: pa.table({"sig": t.column("phash"),
                                "count": t.column("count")}),
            batch_format="pyarrow",
        )
    ).materialize()
    edges = _edges_with_hot_salting(uniq_ds, cfg)

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"dist": pa.array([], type=pa.int64()),
                             "n_pairs": pa.array([], type=pa.int64())})
        d = hamming64(
            t.column("sig_a").to_numpy(zero_copy_only=False),
            t.column("sig_b").to_numpy(zero_copy_only=False),
        ).astype(np.int64)
        hist = np.bincount(d, minlength=max_distance + 1)
        nz = np.flatnonzero(hist)
        return pa.table({"dist": pa.array(nz.astype(np.int64)),
                         "n_pairs": pa.array(hist[nz].astype(np.int64))})

    acc = np.zeros(max_distance + 1, dtype=np.int64)
    for b in edges.map_batches(
        partial, batch_format="pyarrow"
    ).iter_batches(batch_size=4096, batch_format="pyarrow"):
        dv = b.column("dist").to_numpy(zero_copy_only=False)
        nv = b.column("n_pairs").to_numpy(zero_copy_only=False)
        np.add.at(acc, dv, nv)
    nz = np.flatnonzero(acc)
    return ray.data.from_arrow(pa.table({
        "dist": pa.array(nz.astype(np.int64)),
        "n_pairs": pa.array(acc[nz]),
    }))


def phash_distance_histogram_sql(corpus_glob: str,
                                 max_distance: int = 4) -> str:
    """DuckDB oracle for ``phash_distance_histogram``: quadratic
    bit_count join over DISTINCT phashes (each unordered pair once via
    a.sig < b.sig — any consistent total order picks the same pair
    set)."""
    return (
        "WITH nodes AS (SELECT DISTINCT phash AS sig "
        f"FROM read_parquet('{corpus_glob}') WHERE phash IS NOT NULL), "
        "pairs AS (SELECT CAST(bit_count(xor(a.sig, b.sig)) AS BIGINT) "
        "AS dist FROM nodes a JOIN nodes b ON a.sig < b.sig "
        f"AND bit_count(xor(a.sig, b.sig)) <= {max_distance}) "
        "SELECT dist, CAST(count(*) AS BIGINT) AS n_pairs "
        "FROM pairs GROUP BY dist"
    )


# --- per-format duplication report ------------------------------------------

def dup_rate_by_format(corpus_dir: str):
    """(fmt, n_images, n_dup_images): per-encoder duplication report —
    for each format, how many of its rows are byte-identical to some
    other row ANYWHERE in the corpus (identity-group size > 1). The
    crawl-health cross-cut that tells you WHICH ingestion path is
    re-fetching payloads before you pay for a full dedup pass (the
    image analog of ``dedup_text.dup_rate_by_source``).

    Scale shape: join-free and the payload never shuffles — the
    per-batch combiner hashes bytes to the identity triple and
    collapses to distinct (identity, fmt) partial counts; ONE
    hash-bucket exchange (h1 % 256) lets the per-bucket kernel handle
    thousands of identity groups with a single Arrow group_by + one
    lexsort/reduceat pass; a final |fmt|-row groupby sums."""
    from ray.data.aggregate import Sum

    _empty_pairs = pa.table({
        "h1": pa.array([], type=pa.int64()),
        "h2": pa.array([], type=pa.int64()),
        "ln": pa.array([], type=pa.int64()),
        "bucket": pa.array([], type=pa.int64()),
        "fmt": pa.array([], type=pa.string()),
        "c": pa.array([], type=pa.int64()),
    })

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _empty_pairs
        data, offs = _flat_binary(batch.column("bytes"))
        h1, h2 = _payload_digests(data, offs, batch.num_rows)
        t = pa.table({
            "h1": u64col(h1),
            "h2": u64col(h2),
            "ln": pa.array((offs[1:] - offs[:-1]).astype(np.int64)),
            "fmt": pc.fill_null(
                pc.cast(batch.column("fmt"), pa.string()), ""),
        })
        g = t.group_by(["h1", "h2", "ln", "fmt"]).aggregate([("fmt", "count")])
        gh1 = g.column("h1").to_numpy(zero_copy_only=False)
        return pa.table({
            "h1": g.column("h1"),
            "h2": g.column("h2"),
            "ln": g.column("ln"),
            "bucket": pa.array(
                (gh1.view(UINT64) % UINT64(_CANON_BUCKETS)).astype(np.int64)),
            "fmt": g.column("fmt"),
            "c": g.column("fmt_count").cast(pa.int64()),
        })

    _empty_out = pa.table({
        "fmt": pa.array([], type=pa.string()),
        "n_images": pa.array([], type=pa.int64()),
        "n_dup_images": pa.array([], type=pa.int64()),
    })

    def per_bucket(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return _empty_out
        # partials of the same (identity, fmt) may arrive from several
        # batches: collapse first, then share each identity's total
        m = g.group_by(["h1", "h2", "ln", "fmt"]).aggregate([("c", "sum")])
        h1 = m.column("h1").to_numpy(zero_copy_only=False)
        h2 = m.column("h2").to_numpy(zero_copy_only=False)
        ln = m.column("ln").to_numpy(zero_copy_only=False)
        c = m.column("c_sum").to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((ln, h2, h1))
        h1s, h2s, lns, cs = h1[order], h2[order], ln[order], c[order]
        new = np.r_[True, (h1s[1:] != h1s[:-1]) | (h2s[1:] != h2s[:-1])
                    | (lns[1:] != lns[:-1])]
        seg_id = np.cumsum(new) - 1
        totals = np.zeros(int(seg_id[-1]) + 1, dtype=np.int64)
        np.add.at(totals, seg_id, cs)
        dup = np.where(totals[seg_id] > 1, cs, 0)
        inv = np.empty(len(order), dtype=np.int64)
        inv[order] = np.arange(len(order))
        return pa.table({
            "fmt": m.column("fmt"),
            "n_images": pa.array(cs[inv]),
            "n_dup_images": pa.array(dup[inv]),
        })

    return (
        read_corpus(corpus_dir, columns=["bytes", "fmt"])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pyarrow")
        .groupby("fmt")
        .aggregate(Sum("n_images", alias_name="n_images"),
                   Sum("n_dup_images", alias_name="n_dup_images"))
    )


def dup_rate_by_format_sql(corpus_glob: str) -> str:
    """DuckDB oracle for ``dup_rate_by_format`` (groups raw bytes, so
    a digest collision at test scale would be caught)."""
    return (
        "WITH t AS (SELECT coalesce(fmt, '') AS fmt, bytes, "
        f"CAST(count(*) AS BIGINT) AS c FROM read_parquet('{corpus_glob}') "
        "GROUP BY 1, 2), "
        "tot AS (SELECT bytes, SUM(c) AS tc FROM t GROUP BY 1) "
        "SELECT fmt, CAST(SUM(c) AS BIGINT) AS n_images, "
        "CAST(SUM(CASE WHEN tc > 1 THEN c ELSE 0 END) AS BIGINT) "
        "AS n_dup_images FROM t JOIN tot USING (bytes) GROUP BY fmt"
    )


# --- per-format payload size quantiles --------------------------------------

def image_size_quantiles(corpus_dir: str):
    """(fmt, n_images, p25, p50, p75, p90, p99): EXACT per-format
    discrete quantiles of encoded payload size — the corpus-QA outlier
    screen ("which encoder is shipping 10 MB images?") run before any
    decode budget is committed.

    Scale shape: the textstats value-histogram pattern
    (length_quantiles) — byte lengths come from Arrow offsets (payload
    never read past the offsets buffer), the per-batch combiner
    collapses to distinct (fmt, ln, count) rows, the per-fmt kernel
    folds the histogram through the SHARED quantile helper
    (util.weighted_discrete_quantiles, bit-matching DuckDB's
    quantile_disc). Shuffle volume = distinct (fmt, size) pairs."""
    from humid_ray.util import weighted_discrete_quantiles

    qcols = ["p25", "p50", "p75", "p90", "p99"]
    qvals = (0.25, 0.5, 0.75, 0.9, 0.99)

    _empty_partial = pa.table({
        "fmt": pa.array([], type=pa.string()),
        "ln": pa.array([], type=pa.int64()),
        "n": pa.array([], type=pa.int64()),
    })

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _empty_partial
        _, offs = _flat_binary(batch.column("bytes"))
        t = pa.table({
            "fmt": pc.fill_null(
                pc.cast(batch.column("fmt"), pa.string()), ""),
            "ln": pa.array((offs[1:] - offs[:-1]).astype(np.int64)),
        })
        g = t.group_by(["fmt", "ln"]).aggregate([("ln", "count")])
        return pa.table({"fmt": g.column("fmt"), "ln": g.column("ln"),
                         "n": g.column("ln_count").cast(pa.int64())})

    def per_fmt(g: pa.Table) -> pa.Table:
        empty = {"fmt": pa.array([], type=pa.string()),
                 "n_images": pa.array([], type=pa.int64()),
                 **{c: pa.array([], type=pa.int64()) for c in qcols}}
        if g.num_rows == 0:
            return pa.table(empty)
        ln = g.column("ln").to_numpy(zero_copy_only=False)
        cnt = g.column("n").to_numpy(zero_copy_only=False)
        n = int(cnt.sum())
        out = {"fmt": g.column("fmt").slice(0, 1),
               "n_images": pa.array([n], type=pa.int64())}
        for c, val in zip(qcols,
                          weighted_discrete_quantiles(ln, cnt, qvals)):
            out[c] = pa.array([val], type=pa.int64())
        return pa.table(out)

    return (
        read_corpus(corpus_dir, columns=["bytes", "fmt"])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("fmt")
        .map_groups(per_fmt, batch_format="pyarrow")
    )


def image_size_quantiles_sql(corpus_glob: str) -> str:
    """DuckDB oracle for ``image_size_quantiles``."""
    return (
        "SELECT coalesce(fmt, '') AS fmt, "
        "CAST(count(*) AS BIGINT) AS n_images, "
        + ", ".join(
            f"CAST(quantile_disc(octet_length(bytes), {q}) AS BIGINT) "
            f"AS p{str(q)[2:].ljust(2, '0')}"
            for q in (0.25, 0.5, 0.75, 0.9, 0.99)
        )
        + f" FROM read_parquet('{corpus_glob}') GROUP BY 1"
    )


# --- caption language mixture ------------------------------------------------

def caption_langid_hist(corpus_dir: str):
    """(lang_pred, n_captions): language mixture of the caption side —
    the multimodal-corpus report ("what languages label this image
    corpus?") behind per-language sampling quotas. Same deterministic
    bigram-profile scorer as the documents langid stage
    (textstats.LangId; a real model swaps in at the same actor-pool
    seam), applied to captions.

    Scale shape: shuffle-free scoring (Arrow ``count_substring`` per
    profile bigram — no per-row Python) + per-batch count combiner;
    the one exchange moves |langs| rows per batch."""
    from ray.data.aggregate import Sum

    from humid_ray.pipelines.textstats import LangId

    scorer = LangId()  # ONE scorer instance; profiles built once

    _empty = pa.table({"lang_pred": pa.array([], type=pa.string()),
                       "n": pa.array([], type=pa.int64())})

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _empty
        scored = scorer(pa.table({
            "doc_id": pa.array(np.arange(batch.num_rows)),
            "text": batch.column("caption"),
        }))
        out = np.asarray(scored.column("lang_pred").to_pylist(),
                         dtype=object)
        u, c = np.unique(out, return_counts=True)
        return pa.table({"lang_pred": pa.array(u.tolist(), type=pa.string()),
                         "n": pa.array(c.astype(np.int64))})

    return (
        read_corpus(corpus_dir, columns=["caption"])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("lang_pred")
        .aggregate(Sum("n", alias_name="n_captions"))
    )


def caption_langid_hist_sql(corpus_glob: str) -> str:
    """DuckDB oracle for ``caption_langid_hist``: the SHARED langid
    score + first-max-CASE builders (humid_ray.oracles — same
    expressions as the langid_docs oracle) over the caption column."""
    from humid_ray.oracles import langid_pred_case_sql, langid_score_sql

    return (
        f"WITH s AS (SELECT {langid_score_sql('en')} AS s_en, "
        f"{langid_score_sql('de')} AS s_de, "
        f"{langid_score_sql('fr')} AS s_fr, "
        f"{langid_score_sql('es')} AS s_es "
        "FROM (SELECT lower(coalesce(caption, '')) AS t "
        f"FROM read_parquet('{corpus_glob}'))), "
        f"p AS (SELECT {langid_pred_case_sql()} AS lang_pred FROM s) "
        "SELECT lang_pred, CAST(count(*) AS BIGINT) AS n_captions "
        "FROM p GROUP BY lang_pred"
    )


# --- language-partitioned near-dup (partition-scoped dedup) ------------------

def lang_partitioned_image_dedup(corpus_dir: str,
                                 broadcast_max_labels: int = 1_000_000):
    """(image_id, lang_pred, cluster_rep, keep): pHash Hamming<=1
    near-dup clusters computed WITHIN caption-language partitions —
    the production trick of sharding a global dedup all-to-all by a
    cheap partition key (language / domain / crawl shard): edges never
    cross partitions, so every partition clusters independently and
    the widest per-partition exchange shrinks to the largest partition.

    Semantics: usable rows (non-NULL stored phash, the flagship's
    stored-mode gate); ``lang_pred`` = the shared deterministic bigram
    scorer over the caption (same model as langid_docs /
    caption_langid_hist); nodes = DISTINCT (lang, phash); edges =
    same-language pairs within Hamming 1; ``cluster_rep`` = min
    image_id per (lang, component), ``keep`` iff the row IS its rep.
    The same phash under two languages is two independent nodes —
    partitioned semantics, by design (the global variant is
    ``curate_images``).

    Scale shape: ONE narrow scan scores languages (materialized: the
    global uniq, the node set, and the final labeling all consume it);
    the Hamming edge graph is built ONCE over global distinct phashes
    with the flagship's counting pre-pass + salted banded LSH, then
    assigned to partitions by joining node membership onto BOTH
    endpoints (edge-bounded joins — the corpus never re-shuffles);
    per-language CC is a groupby(lang).map_groups union-find (each
    partition's edge list fits a task — the same edges << corpus bound
    as the flagship's local CC mode; stages/components.py's
    distributed label-prop drops in per partition when it doesn't);
    the (lang, phash)->label map is edge-bounded and broadcast once
    via ``ray.put`` below ``broadcast_max_labels``, else applied with
    a distributed two-key left-outer ``Dataset.join``."""
    from humid_ray.pipelines.textstats import LangId
    from humid_ray.stages.components import components_from_arrays
    from humid_ray.stages.joins import copart_buckets, join_kwargs, key_buckets

    cfg = HumidConfig(sources=("phash",), clustering="maximum")
    scorer = LangId()  # ONE scorer; profiles built once per actor
    lang_vocab = list(scorer.profiles) + ["und"]

    _scored_empty = pa.table({"image_id": pa.array([], type=pa.string()),
                              "lang": pa.array([], type=pa.string()),
                              "phash": pa.array([], type=pa.int64())})

    def score(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.is_valid(batch.column("phash")))
        if batch.num_rows == 0:
            return _scored_empty
        scored = scorer(pa.table({
            "doc_id": pa.array(np.arange(batch.num_rows)),
            "text": batch.column("caption"),
        }))
        return pa.table({"image_id": batch.column("image_id"),
                         "lang": scored.column("lang_pred"),
                         "phash": batch.column("phash")})

    scored = read_corpus(
        corpus_dir, columns=["image_id", "caption", "phash"]
    ).map_batches(score, batch_format="pyarrow",
                  zero_copy_batch=True).materialize()

    # global edge graph over DISTINCT phash values — Hamming edges do
    # not depend on the partition, so ONE banding pass serves every
    # language; membership filtering below yields the partitioned graph
    uniq_ds = (
        scored.groupby("phash").aggregate(Count(alias_name="count"))
        .map_batches(
            lambda t: pa.table({"sig": t.column("phash"),
                                "count": t.column("count")}),
            batch_format="pyarrow",
        )
    ).materialize()
    edges = _edges_with_hot_salting(uniq_ds, cfg).materialize()
    n_edges = edges.count()

    # node set: one row per (lang, phash)
    nodes = (
        scored.groupby(["lang", "phash"]).aggregate(Count(alias_name="_n"))
        .select_columns(["lang", "phash"])
    ).materialize()
    n_nodes = nodes.count()

    _comp_empty = pa.table({"lang": pa.array([], type=pa.string()),
                            "phash": pa.array([], type=pa.int64()),
                            "label": pa.array([], type=pa.int64())})

    def cc_lang(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return _comp_empty
        sa = g.column("sig_a").to_numpy(zero_copy_only=False)
        sb = g.column("sig_b").to_numpy(zero_copy_only=False)
        sigs, comps = components_from_arrays(sa, sb)
        lang = g.column("lang")[0].as_py()
        return pa.table({
            "lang": pa.array(np.repeat(lang, len(sigs)), type=pa.string()),
            "phash": u64col(sigs),
            "label": u64col(comps),
        })

    if n_edges == 0:
        comp = ray.data.from_arrow(_comp_empty)
    else:
        # assign each global edge to every language containing BOTH
        # endpoints: two inner joins of the edge-bounded list against
        # the node set (per-endpoint language fan-out <= |langs|)
        n_a = nodes.rename_columns(["la", "sig_a"])
        n_b = nodes.rename_columns(["lb", "sig_b"])
        e1 = edges.join(n_a, join_type="inner", on=("sig_a",),
                        **join_kwargs(n_edges, n_nodes))
        e2 = e1.join(n_b, join_type="inner", on=("sig_b",),
                     **join_kwargs(n_edges * len(lang_vocab), n_nodes))

        def same_lang(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return pa.table({"lang": pa.array([], type=pa.string()),
                                 "sig_a": pa.array([], type=pa.int64()),
                                 "sig_b": pa.array([], type=pa.int64())})
            t = t.filter(pc.equal(t.column("la"), t.column("lb")))
            return pa.table({"lang": t.column("la"),
                             "sig_a": t.column("sig_a"),
                             "sig_b": t.column("sig_b")})

        lang_edges = e2.map_batches(same_lang, batch_format="pyarrow")
        comp = lang_edges.groupby("lang").map_groups(
            cc_lang, batch_format="pyarrow"
        ).materialize()

    _labeled_empty = pa.table({"image_id": pa.array([], type=pa.string()),
                               "lang": pa.array([], type=pa.string()),
                               "label": pa.array([], type=pa.int64())})
    n_labels = comp.count() if n_edges else 0
    if n_labels <= broadcast_max_labels:
        per_lang: dict[str, tuple[np.ndarray, np.ndarray]] = {}
        if n_labels:
            acc: dict[str, list[tuple[np.ndarray, np.ndarray]]] = {}
            for b in comp.iter_batches(batch_size=65536,
                                       batch_format="pyarrow"):
                langs = np.asarray(b.column("lang").to_pylist(), dtype=object)
                ph = b.column("phash").to_numpy(zero_copy_only=False)
                lab = b.column("label").to_numpy(zero_copy_only=False)
                for lg in np.unique(langs):
                    m = langs == lg
                    acc.setdefault(str(lg), []).append((ph[m], lab[m]))
            for lg, parts in acc.items():
                keys = np.concatenate([p[0] for p in parts])
                labs = np.concatenate([p[1] for p in parts])
                order = np.argsort(keys, kind="stable")
                per_lang[lg] = (keys[order], labs[order])
        ref = ray.put(per_lang)

        def label_kernel(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return _labeled_empty
            maps = ray.get(ref)
            ph = t.column("phash").to_numpy(zero_copy_only=False)
            lab = ph.copy()  # default: own phash (singleton / untouched)
            langs = np.asarray(t.column("lang").to_pylist(), dtype=object)
            for lg in np.unique(langs):
                entry = maps.get(str(lg))
                if entry is None:
                    continue
                m = langs == lg
                lab[m] = apply_sorted_labels(entry[0], entry[1], ph[m])
            return pa.table({"image_id": t.column("image_id"),
                             "lang": t.column("lang"),
                             "label": pa.array(lab)})

        labeled = scored.map_batches(label_kernel, batch_format="pyarrow")
    else:
        comp2 = comp.rename_columns(["lang", "phash", "label"])
        joined = scored.join(comp2, join_type="left_outer",
                             on=("lang", "phash"),
                             **join_kwargs(scored.count(), n_labels))

        def fill(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return _labeled_empty
            return pa.table({
                "image_id": t.column("image_id"),
                "lang": t.column("lang"),
                "label": pc.coalesce(t.column("label"), t.column("phash")),
            })

        labeled = joined.map_batches(fill, batch_format="pyarrow")

    # rep/keep per (lang, label): one co-partitioning exchange on the
    # hashed composite key + a vectorized per-bucket segment kernel
    # (labels may collide ACROSS languages — the kernel orders by the
    # composite, and the bucket key mixes both)
    nb = copart_buckets(scored.count())
    vocab = pa.array(lang_vocab, type=pa.string())

    def tag(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column("bucket", pa.array([], type=pa.int64()))
        lidx = pc.fill_null(
            pc.index_in(t.column("lang"), value_set=vocab), len(lang_vocab)
        ).to_numpy(zero_copy_only=False).astype(np.int64)
        lab = t.column("label").to_numpy(zero_copy_only=False)
        # mix the small language index into the hashed key so equal
        # labels in different languages spread across buckets
        return t.append_column(
            "bucket", pa.array(key_buckets(lab ^ (lidx + 1), nb))
        )

    _out_empty = pa.table({"image_id": pa.array([], type=pa.string()),
                           "lang_pred": pa.array([], type=pa.string()),
                           "cluster_rep": pa.array([], type=pa.string()),
                           "keep": pa.array([], type=pa.bool_())})

    def rep_bucket(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return _out_empty
        ids = np.asarray(g.column("image_id").to_pylist(), dtype=object)
        langs = np.asarray(g.column("lang").to_pylist(), dtype=object)
        lab = g.column("label").to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, lab, langs))
        labs_s, langs_s = lab[order], langs[order]
        new = np.r_[True, (labs_s[1:] != labs_s[:-1])
                    | (langs_s[1:] != langs_s[:-1])]
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
            "lang_pred": g.column("lang"),
            "cluster_rep": pa.array(rep.tolist(), type=pa.string()),
            "keep": pa.array(ids == rep),
        })

    return (
        labeled.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(rep_bucket, batch_format="pyarrow")
    )


def lang_partitioned_image_dedup_sql(corpus_glob: str) -> str:
    """DuckDB oracle for ``lang_partitioned_image_dedup``: the SHARED
    langid score/CASE builders over the caption column + a recursive
    Hamming-1 closure over DISTINCT (lang, phash) nodes, edges
    restricted to same-language pairs."""
    from humid_ray.oracles import langid_pred_case_sql, langid_score_sql

    return (
        "WITH RECURSIVE raw AS (SELECT image_id, phash, "
        "lower(coalesce(caption, '')) AS t "
        f"FROM read_parquet('{corpus_glob}') WHERE phash IS NOT NULL), "
        f"s AS (SELECT image_id, phash, {langid_score_sql('en')} AS s_en, "
        f"{langid_score_sql('de')} AS s_de, "
        f"{langid_score_sql('fr')} AS s_fr, "
        f"{langid_score_sql('es')} AS s_es FROM raw), "
        f"p AS (SELECT image_id, phash, {langid_pred_case_sql()} AS lang "
        "FROM s), "
        "nodes AS (SELECT DISTINCT lang, phash AS sig FROM p), "
        "e AS (SELECT a.lang, a.sig AS sa, b.sig AS sb "
        "FROM nodes a JOIN nodes b ON a.lang = b.lang AND a.sig != b.sig "
        "AND bit_count(xor(a.sig, b.sig)) <= 1), "
        "reach(lang, src, dst) AS (SELECT lang, sig, sig FROM nodes UNION "
        "SELECT r.lang, r.src, e.sb FROM reach r "
        "JOIN e ON e.lang = r.lang AND e.sa = r.dst), "
        "comp AS (SELECT lang, src AS sig, "
        f"xor(min(xor(dst, {_SB})), {_SB}) AS label "
        "FROM reach GROUP BY lang, src), "
        "lab AS (SELECT p.image_id, p.lang, m.label FROM p "
        "JOIN comp m ON m.lang = p.lang AND m.sig = p.phash) "
        "SELECT image_id, lang AS lang_pred, "
        "min(image_id) OVER (PARTITION BY lang, label) AS cluster_rep, "
        "image_id = min(image_id) OVER (PARTITION BY lang, label) AS \"keep\" "
        "FROM lab"
    )


# --- eval-set decontamination (image axis) -----------------------------------

class _ContamProbe:
    """Broadcast eval-side probe state, built ONCE on the driver from
    the (small) eval split and read per actor:

    - exact tier: eval identity triples (h1, h2, ln) sorted by h1;
      probes expand h1-run candidates via the repeat/arange segment
      gather, so equal-h1 digest runs (vanishingly rare but possible)
      are checked exhaustively — membership is exact on the full
      128-bit+length composite, never a further-compressed key.
    - near tier: the sorted np.unique of every eval phash XOR every
      <= max_distance bit-flip mask (exhaustive by construction, the
      incremental_image_dedup probe idea with d in {0, 1, 2}) —
      train membership is one searchsorted per batch.
    """

    def __init__(self, h1: np.ndarray, h2: np.ndarray, ln: np.ndarray,
                 phash: np.ndarray, max_distance: int):
        order = np.lexsort((ln, h2, h1))
        self.h1 = np.ascontiguousarray(h1[order])
        self.h2 = np.ascontiguousarray(h2[order])
        self.ln = np.ascontiguousarray(ln[order])
        ph = np.unique(phash.view(UINT64))
        masks = [np.zeros(1, dtype=UINT64)]
        if max_distance >= 1:
            masks.append(np.uint64(1) << np.arange(64, dtype=UINT64))
        if max_distance >= 2:
            i, j = np.triu_indices(64, k=1)
            masks.append((np.uint64(1) << i.astype(UINT64))
                         | (np.uint64(1) << j.astype(UINT64)))
        if max_distance > 2:
            raise ValueError("max_distance > 2 not supported (probe blowup)")
        flips = np.concatenate(masks)
        self.probes = np.unique(
            (ph[:, None] ^ flips[None, :]).ravel()
        ) if len(ph) else np.empty(0, dtype=UINT64)

    def exact_member(self, h1: np.ndarray, h2: np.ndarray,
                     ln: np.ndarray) -> np.ndarray:
        from humid_ray.util import _gather_segments

        n = len(h1)
        member = np.zeros(n, dtype=bool)
        if not len(self.h1) or not n:
            return member
        lo = np.searchsorted(self.h1, h1, side="left")
        hi = np.searchsorted(self.h1, h1, side="right")
        width = hi - lo
        cand = np.flatnonzero(width)
        if not len(cand):
            return member
        lens = width[cand]
        idx = _gather_segments(
            np.arange(len(self.h1), dtype=np.int64), lo[cand], lens)
        pi = np.repeat(cand, lens)
        ok = (self.h2[idx] == h2[pi]) & (self.ln[idx] == ln[pi])
        member[pi[ok]] = True
        return member

    def near_member(self, phash: np.ndarray) -> np.ndarray:
        if not len(phash):
            return np.zeros(0, dtype=bool)
        return sorted_member(self.probes, phash.view(UINT64))


_DECONTAM_EMPTY = pa.table({
    "image_id": pa.array([], type=pa.string()),
    "exact_contam": pa.array([], type=pa.bool_()),
    "near_contam": pa.array([], type=pa.bool_()),
})


def decontaminate_images(corpus_dir: str, eval_pct: int = 10,
                         n_buckets: int = 100, max_distance: int = 1):
    """(image_id, exact_contam, near_contam) per usable TRAIN row:
    benchmark decontamination on the image axis — the eval suite's
    images must not leak into training data, neither byte-identical
    (re-crawled eval files) nor perceptually (resized / re-encoded
    eval images within pHash Hamming <= max_distance). The image-side
    twin of ``dedup_text.decontaminate``. eval/train is the
    deterministic splitmix64-id-hash split (standing in for the real
    held-out suite), reusing the ``incremental_image_dedup`` tag
    kernel with is_new == is_eval.

    Scale shape (the OPPOSITE asymmetry to the daily increment:
    |eval| is a benchmark suite, thousands of rows, while train is
    the 10^12-image corpus): the eval side collapses to distinct
    identities + distinct phashes and BROADCASTS once via ``ray.put``
    (``dedup_text.decontaminate``'s bench-union pattern); the train
    side then streams through one shuffle-free membership kernel —
    no join, no train-side exchange at all. Payloads hash in-batch
    in the single corpus scan both sides derive from; exact
    membership is checked on the full 128-bit+length composite
    (h1-run candidates expanded and verified, never a compressed
    key); near membership is exhaustive <= max_distance bit-flip
    probes (no banding recall caveat). Reference parity: the eval
    probes play trie.find (src/humid.cc:223) against a pre-built
    index, with the index side tiny and replicated."""
    tagged = read_corpus(
        corpus_dir, columns=["image_id", "bytes", "phash"]
    ).map_batches(
        _incr_img_tag_kernel(eval_pct, n_buckets),
        batch_format="pyarrow", zero_copy_batch=True,
    ).materialize()
    ev = _side(tagged, True)
    parts = [
        b.select(["h1", "h2", "ln", "phash"])
        for b in ev.iter_batches(batch_size=65536, batch_format="pyarrow")
    ]
    if parts:
        evt = pa.concat_tables(parts)
        probe = _ContamProbe(
            evt.column("h1").to_numpy(zero_copy_only=False),
            evt.column("h2").to_numpy(zero_copy_only=False),
            evt.column("ln").to_numpy(zero_copy_only=False),
            evt.column("phash").to_numpy(zero_copy_only=False),
            max_distance,
        )
    else:
        probe = _ContamProbe(*(np.empty(0, dtype=np.int64),) * 3,
                             np.empty(0, dtype=np.int64), max_distance)
    ref = ray.put(probe)

    class _Screen:
        def __init__(self):
            self.probe: _ContamProbe = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return _DECONTAM_EMPTY
            h1 = t.column("h1").to_numpy(zero_copy_only=False)
            h2 = t.column("h2").to_numpy(zero_copy_only=False)
            ln = t.column("ln").to_numpy(zero_copy_only=False)
            ph = t.column("phash").to_numpy(zero_copy_only=False)
            return pa.table({
                "image_id": t.column("image_id"),
                "exact_contam": pa.array(self.probe.exact_member(h1, h2, ln)),
                "near_contam": pa.array(self.probe.near_member(ph)),
            })

    return _side(tagged, False).map_batches(
        _Screen, batch_format="pyarrow", zero_copy_batch=True,
        concurrency=(1, 4),
    )


def decontaminate_images_sql(corpus_glob: str, eval_pct: int = 10,
                             n_buckets: int = 100,
                             max_distance: int = 1) -> str:
    """DuckDB oracle for ``decontaminate_images``: the same id-hash
    split chain as ``incremental_image_dedup_sql``, then raw-bytes /
    bit_count(xor) EXISTS probes against the eval side."""
    from humid_ray.oracles import _horner_fold, _sm64_cols

    byte_list = (
        "list_transform(range(1, CAST(octet_length(tb) + 1 AS BIGINT)), "
        "jj -> CAST(CAST('0x' || substr(hex(tb), "
        "CAST(2*jj-1 AS INTEGER), 2) AS UBIGINT) AS HUGEINT))"
    )
    return (
        f"WITH c AS (SELECT image_id, bytes, phash, encode(image_id) AS tb "
        f"FROM read_parquet('{corpus_glob}') WHERE phash IS NOT NULL), "
        f"braw AS (SELECT image_id, bytes, phash, "
        f"{_horner_fold(byte_list)} AS hraw FROM c), "
        f"th AS (SELECT image_id, bytes, phash, "
        f"{_sm64_cols('hraw', 'ih')} FROM braw), "
        f"split AS (SELECT image_id, bytes, phash, "
        f"(ih % {n_buckets} < {eval_pct}) AS is_eval FROM th), "
        "eval_b AS (SELECT DISTINCT bytes FROM split WHERE is_eval), "
        "eval_p AS (SELECT DISTINCT phash FROM split WHERE is_eval) "
        "SELECT t.image_id, "
        "EXISTS(SELECT 1 FROM eval_b e WHERE e.bytes = t.bytes) "
        "AS exact_contam, "
        "EXISTS(SELECT 1 FROM eval_p p "
        f"WHERE bit_count(xor(p.phash, t.phash)) <= {max_distance}) "
        "AS near_contam "
        "FROM split t WHERE NOT t.is_eval"
    )


# --- signature-health audit (per-bit pHash statistics) -----------------------

def phash_bit_stats(corpus_dir: str):
    """(bit, n_ones, n_rows) for every bit 0..63 of the stored pHash
    over usable rows: the signature-health audit behind the flagship's
    banding math. The pigeonhole guarantee needs every band to carry
    entropy — a degenerate bit (always 0 / always 1: a DC term the
    hash forgot to drop, a stuck encoder) silently concentrates band
    keys and turns "salted hot buckets" into "every bucket is hot".
    Run this before trusting a new signature source; n_ones far from
    n_rows/2 on any bit is the alarm.

    Scale shape: shuffle-free — one streaming pass of per-batch
    ``np.unpackbits`` partials (a 64-int vector per batch), folded
    driver-side like ``phash_distance_histogram``; nothing but the
    64-row report ever leaves the tasks."""

    def partial(batch: pa.Table) -> pa.Table:
        out = {"bit": pa.array([], type=pa.int64()),
               "n_ones": pa.array([], type=pa.int64()),
               "n_rows": pa.array([], type=pa.int64())}
        if batch.num_rows == 0:
            return pa.table(out)
        batch = batch.filter(pc.is_valid(batch.column("phash")))
        if batch.num_rows == 0:
            return pa.table(out)
        ph = batch.column("phash").to_numpy(zero_copy_only=False)
        # little-endian uint8 view: unpacked column j == bit j (the
        # value of (phash >> j) & 1)
        bits = np.unpackbits(
            np.ascontiguousarray(ph.view(UINT64)).view(np.uint8)
            .reshape(-1, 8),
            axis=1, bitorder="little",
        )
        ones = bits.sum(axis=0, dtype=np.int64)
        return pa.table({
            "bit": pa.array(np.arange(64, dtype=np.int64)),
            "n_ones": pa.array(ones),
            "n_rows": pa.array(
                np.full(64, batch.num_rows, dtype=np.int64)),
        })

    # fold keyed on the carried bit column — iter_batches re-batches
    # freely (concatenating / splitting partials), so positional
    # alignment cannot be assumed
    acc = np.zeros(64, dtype=np.int64)
    rows = np.zeros(64, dtype=np.int64)
    for b in read_corpus(corpus_dir, columns=["phash"]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    ).iter_batches(batch_size=4096, batch_format="pyarrow"):
        if b.num_rows == 0:
            continue
        bit = b.column("bit").to_numpy(zero_copy_only=False)
        np.add.at(acc, bit, b.column("n_ones").to_numpy(zero_copy_only=False))
        np.add.at(rows, bit,
                  b.column("n_rows").to_numpy(zero_copy_only=False))
    n_rows = int(rows[0])
    return ray.data.from_arrow(pa.table({
        "bit": pa.array(np.arange(64, dtype=np.int64)),
        "n_ones": pa.array(acc),
        "n_rows": pa.array(np.full(64, n_rows, dtype=np.int64)),
    }))


def phash_bit_stats_sql(corpus_glob: str) -> str:
    """DuckDB oracle for ``phash_bit_stats``. DuckDB's ``>>`` on
    BIGINT is a logical (zero-fill) shift, so ``(phash >> bit) & 1``
    extracts every bit including the sign bit; the LEFT JOIN keeps
    all 64 report rows even over an empty corpus."""
    return (
        "WITH u AS (SELECT phash "
        f"FROM read_parquet('{corpus_glob}') WHERE phash IS NOT NULL) "
        "SELECT jj AS bit, "
        "CAST(coalesce(sum((phash >> CAST(jj AS INTEGER)) & 1), 0) "
        "AS BIGINT) AS n_ones, "
        "CAST(count(phash) AS BIGINT) AS n_rows "
        "FROM range(0, 64) t(jj) LEFT JOIN u ON TRUE GROUP BY jj"
    )


# --- label-noise audit: caption consistency per near-dup cluster -------------

def _phash_uniq_ds(corpus_dir: str):
    """Materialized ``(sig, count)`` dataset of DISTINCT non-null
    phashes — the uniq input every phash-cluster audit builds its
    flagship banding run from. One pruned column scan + one groupby;
    moves one row per distinct signature."""
    ph = read_corpus(corpus_dir, columns=["phash"])

    def usable_only(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        return t.filter(pc.is_valid(t.column("phash")))

    return (
        ph.map_batches(usable_only, batch_format="pyarrow",
                       zero_copy_batch=True)
        .groupby("phash").aggregate(Count(alias_name="count"))
        .map_batches(
            lambda t: pa.table({"sig": t.column("phash"),
                                "count": t.column("count")}),
            batch_format="pyarrow",
        )
    ).materialize()


def _phash_label_arrays(uniq_ds, cfg: HumidConfig):
    """DISTINCT-phash uniq (sig, count) Dataset -> (sig_arr, lab_arr):
    sorted-by-sig numpy int64 arrays mapping each EDGE-TOUCHED sig to
    its component label (untouched singletons are absent — probe with
    searchsorted and fall back to the sig itself). Edge-bounded driver
    pull; callers ``ray.put`` the tuple and probe per batch."""
    edges = _edges_with_hot_salting(uniq_ds, cfg)
    comp = connected_components(edges, cfg)
    parts = [
        (b.column("sig").to_numpy(zero_copy_only=False),
         b.column("comp").to_numpy(zero_copy_only=False))
        for b in comp.iter_batches(batch_size=65536, batch_format="pyarrow")
    ]
    if parts:
        sig_arr = np.concatenate([p[0] for p in parts])
        lab_arr = np.concatenate([p[1] for p in parts])
        order = np.argsort(sig_arr, kind="stable")
        return sig_arr[order], lab_arr[order]
    return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)


def _phash_label_kernel(ref, carry: dict[str, "pa.DataType"]):
    """Batch-kernel factory: map the ``phash`` column through the
    broadcast ``(sig, label)`` arrays from ``_phash_label_arrays``
    (fallback: own phash = singleton cluster), carrying the ``carry``
    columns (name -> Arrow type for the typed empty) alongside."""
    from humid_ray.stages.joins import apply_sorted_labels

    def kernel(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            cols = {"label": pa.array([], type=pa.int64())}
            cols.update({c: pa.array([], type=ty)
                         for c, ty in carry.items()})
            return pa.table(cols)
        keys, labs = ray.get(ref)
        lab = apply_sorted_labels(
            keys, labs,
            t.column("phash").to_numpy(zero_copy_only=False)
            .astype(np.int64, copy=False))
        cols = {"label": pa.array(lab)}
        cols.update({c: t.column(c) for c in carry})
        return pa.table(cols)

    return kernel


def cluster_caption_consistency(corpus_dir: str, max_distance: int = 1):
    """(n_captions, n_clusters): how many pHash near-dup clusters
    carry exactly n distinct captions — the label-noise audit of an
    image+caption corpus. A multi-caption cluster is the same picture
    labeled differently across crawls (contradictory supervision —
    and the cluster representative silently picks ONE of them); the
    histogram says whether that is a corner case or the corpus norm.
    Joins the A axis (caption) onto the B-axis cluster structure —
    the report-side complement of ``caption_phash_neardup``.

    Scale shape: captions never shuffle — each batch collapses to
    batch-distinct (phash, caption-hash) pairs via one C-speed Arrow
    ``group_by``; clusters come from the flagship chain over DISTINCT
    phashes (uniq collapse -> counting pre-pass -> salted banded LSH
    -> connected components), labels broadcast once (edge-bounded);
    the remaining exchanges carry two-int64 rows bounded by the
    distinct-pair count, never the corpus. Caption identity is the
    64-bit ``hash_string_column`` digest; a collision would
    undercount n_captions (probability ~pairs^2/2^65 within one
    cluster; the DuckDB oracle counts the raw strings and would
    surface it at test scale)."""
    from humid_ray.stages.joins import hash_string_column

    cfg = HumidConfig(sources=("phash",), clustering="maximum",
                      max_distance=max_distance)

    def pairs_partial(batch: pa.Table) -> pa.Table:
        out = {"phash": pa.array([], type=pa.int64()),
               "caphash": pa.array([], type=pa.int64())}
        if batch.num_rows == 0:
            return pa.table(out)
        batch = batch.filter(pc.is_valid(batch.column("phash")))
        if batch.num_rows == 0:
            return pa.table(out)
        ch = hash_string_column(
            pc.fill_null(batch.column("caption"), "").combine_chunks()
        )
        t = pa.table({
            "phash": batch.column("phash"),
            "caphash": pa.array(ch.view(np.int64)),
        })
        return t.group_by(["phash", "caphash"]).aggregate([]).select(
            ["phash", "caphash"])

    # batch-distinct -> globally distinct (phash, caphash) pairs
    pairs = read_corpus(
        corpus_dir, columns=["phash", "caption"]
    ).map_batches(
        pairs_partial, batch_format="pyarrow", zero_copy_batch=True
    ).groupby(["phash", "caphash"]).aggregate(Count()).select_columns(
        ["phash", "caphash"]
    ).materialize()

    # flagship cluster graph over the DISTINCT phashes
    uniq_ds = pairs.groupby("phash").aggregate(
        Count(alias_name="count")
    ).map_batches(
        lambda t: pa.table({"sig": t.column("phash"),
                            "count": t.column("count")}),
        batch_format="pyarrow",
    ).materialize()
    ref = ray.put(_phash_label_arrays(uniq_ds, cfg))
    label_kernel = _phash_label_kernel(ref, {"caphash": pa.int64()})

    # distinct (label, caption) per cluster -> captions per cluster ->
    # histogram; every exchange is two int64 columns, edge-bounded
    percl = (
        pairs.map_batches(label_kernel, batch_format="pyarrow",
                          zero_copy_batch=True)
        .groupby(["label", "caphash"]).aggregate(Count())
        .groupby("label").aggregate(Count(alias_name="n_captions"))
    )

    def finish(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({
                "n_captions": pa.array([], type=pa.int64()),
                "n_clusters": pa.array([], type=pa.int64())})
        return pa.table({"n_captions": t.column("n_captions"),
                         "n_clusters": t.column("count()")})

    return percl.groupby("n_captions").aggregate(Count()).map_batches(
        finish, batch_format="pyarrow")


def pixel_exact_dedup(corpus_dir: str):
    """(image_id, pixel_rep, keep) per DECODABLE usable row: exact-
    PIXEL dedup — the tier between byte identity and pHash near-dup.
    Byte identity misses re-encodes of the very same pixels (a
    different zlib level, PNG filter choice, or container produces
    different bytes); pHash admits genuinely different pixels. Here
    two rows are duplicates iff their decoded arrays are equal:
    identity = BLAKE2b-128 over (dims, channels, raw pixel buffer).
    ``pixel_rep`` = min image_id of the pixel-identity group; one
    ``keep`` per group. Undecodable rows are excluded (they have no
    pixels to compare — the byte tier handles them).

    Scale shape: decode runs once per DISTINCT payload (PayloadMemo,
    per-actor); only the 16-byte pixel digest ever shuffles — pixels
    and payloads stay inside the decode task. The canonicalization is
    the ``image_exact_dedup`` bucket-groupby over (h1, h2, ln) with
    ln = the pixel-buffer length, reusing ``_canonical_bucket``.
    Decode-valued, so no SQL oracle (the multimodal-family
    convention); pinned by planted re-encode tests."""
    from humid_ray.functions.payloads import PayloadMemo

    class PixelIdentity:
        def __init__(self):
            from humid_ray.codecs import image_decoder

            self.memo = PayloadMemo()
            self.decode = image_decoder()  # codec seam: once per actor

        def _one(self, seg) -> tuple:
            import hashlib as _hl

            try:
                img = self.decode(bytes(seg))
            except Exception:  # noqa: BLE001 - undecodable -> excluded
                return (0, 0, -1)
            arr = np.ascontiguousarray(img)
            d = _hl.blake2b(
                repr((arr.shape, arr.dtype.str)).encode() + arr.tobytes(),
                digest_size=16,
            ).digest()
            return (int.from_bytes(d[:8], "little"),
                    int.from_bytes(d[8:], "little"), int(arr.nbytes))

        def __call__(self, batch: pa.Table) -> pa.Table:
            out = {"image_id": pa.array([], type=pa.string()),
                   "h1": pa.array([], type=pa.int64()),
                   "h2": pa.array([], type=pa.int64()),
                   "ln": pa.array([], type=pa.int64()),
                   "bucket": pa.array([], type=pa.int64())}
            if batch.num_rows == 0:
                return pa.table(out)
            batch = batch.filter(pc.is_valid(batch.column("phash")))
            if batch.num_rows == 0:
                return pa.table(out)
            hits = self.memo.map(batch.column("bytes"), self._one)
            h1 = np.fromiter((h[0] for h in hits), dtype=UINT64,
                             count=len(hits))
            h2 = np.fromiter((h[1] for h in hits), dtype=UINT64,
                             count=len(hits))
            ln = np.fromiter((h[2] for h in hits), dtype=np.int64,
                             count=len(hits))
            ok = ln >= 0
            t = batch.filter(pa.array(ok))
            if t.num_rows == 0:
                return pa.table(out)
            h1, h2, ln = h1[ok], h2[ok], ln[ok]
            return pa.table({
                "image_id": t.column("image_id"),
                "h1": u64col(h1),
                "h2": u64col(h2),
                "ln": pa.array(ln),
                "bucket": pa.array((h1 % UINT64(_CANON_BUCKETS))
                                   .astype(np.int64)),
            })

    hashed = read_corpus(
        corpus_dir, columns=["image_id", "bytes", "phash"]
    ).map_batches(PixelIdentity, batch_format="pyarrow",
                  zero_copy_batch=True, batch_size=1024,
                  concurrency=decode_pool())
    canon = hashed.groupby("bucket").map_groups(
        _canonical_bucket(), batch_format="pyarrow"
    )

    def finish(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({
                "image_id": pa.array([], type=pa.string()),
                "pixel_rep": pa.array([], type=pa.string()),
                "keep": pa.array([], type=pa.bool_()),
            })
        return pa.table({
            "image_id": t.column("image_id"),
            "pixel_rep": t.column("canonical_id"),
            "keep": pc.equal(t.column("image_id"),
                             t.column("canonical_id")),
        })

    return canon.map_batches(finish, batch_format="pyarrow")


def cluster_caption_vote(corpus_dir: str, max_distance: int = 1,
                         broadcast_max_labels: int = 1_000_000):
    """(image_id, caption, voted_caption, agree) per usable row: label
    consolidation over the B-axis cluster structure — every image in a
    pHash Hamming<=max_distance near-dup cluster gets the cluster's
    MAJORITY caption (tie -> lexicographically smallest), the
    LAION-style fix for the label noise ``cluster_caption_consistency``
    only measures. ``agree`` flags rows whose own caption already is
    the vote (the re-captioned rows are ``~agree``).

    Scale shape: vote counting pre-combines per batch to distinct
    (label, caption, n) rows before ONE label-bucket groupby — the
    exchange carries per-batch-distinct captions (dup-heavy corpora
    collapse hard), never payload bytes; the cluster labels come from
    the flagship chain over DISTINCT phashes and broadcast once
    (edge-bounded). The (label -> voted caption) map broadcasts under
    ``broadcast_max_labels`` MULTI-caption labels, else applies with a
    distributed left-outer ``Dataset.join`` (labels whose vote is
    trivially the row's own caption — single-caption clusters — never
    enter the map on either path)."""
    from ray.data.aggregate import Sum

    from humid_ray.stages.joins import copart_buckets, key_buckets

    cfg = HumidConfig(sources=("phash",), clustering="maximum",
                      max_distance=max_distance)

    rows = read_corpus(corpus_dir, columns=["image_id", "caption", "phash"])

    def usable(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        return batch.filter(pc.is_valid(batch.column("phash")))

    rows = rows.map_batches(usable, batch_format="pyarrow",
                            zero_copy_batch=True).materialize()

    uniq_ds = (
        rows.select_columns(["phash"])
        .groupby("phash").aggregate(Count(alias_name="count"))
        .map_batches(
            lambda t: pa.table({"sig": t.column("phash"),
                                "count": t.column("count")}),
            batch_format="pyarrow",
        )
    ).materialize()
    ref = ray.put(_phash_label_arrays(uniq_ds, cfg))
    label_kernel = _phash_label_kernel(
        ref, {"image_id": pa.string(), "caption": pa.string()})
    labeled = rows.map_batches(
        lambda t: label_kernel(
            t.set_column(t.schema.get_field_index("caption"), "caption",
                         pc.fill_null(t.column("caption"), ""))
            if t.num_rows else t
        ),
        batch_format="pyarrow", zero_copy_batch=True,
    ).materialize()

    # vote counting: per-batch (label, caption) combine -> global sum
    def vote_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"label": pa.array([], type=pa.int64()),
                             "caption": pa.array([], type=pa.string()),
                             "n": pa.array([], type=pa.int64())})
        g = pa.table({"label": t.column("label"),
                      "caption": t.column("caption")}).group_by(
            ["label", "caption"]).aggregate([("caption", "count")])
        return pa.table({"label": g.column("label"),
                         "caption": g.column("caption"),
                         "n": g.column("caption_count").cast(pa.int64())})

    cnt = labeled.map_batches(
        vote_partial, batch_format="pyarrow", zero_copy_batch=True
    ).groupby(["label", "caption"]).aggregate(Sum("n", alias_name="n"))

    nb = copart_buckets(uniq_ds.count())

    def tag(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column("bucket", pa.array([], type=pa.int64()))
        lab = t.column("label").to_numpy(zero_copy_only=False)
        return t.append_column("bucket", pa.array(key_buckets(lab, nb)))

    def vote_bucket(g: pa.Table) -> pa.Table:
        out = {"label": pa.array([], type=pa.int64()),
               "voted_caption": pa.array([], type=pa.string())}
        if g.num_rows == 0:
            return pa.table(out)
        lab = g.column("label").to_numpy(zero_copy_only=False)
        cap = np.asarray(g.column("caption").to_pylist(), dtype=object)
        n = g.column("n").to_numpy(zero_copy_only=False)
        # single-caption labels are trivially their own vote: only
        # MULTI-caption labels enter the map (keeps it edge-bounded)
        order = np.lexsort((cap, -n, lab))
        labs = lab[order]
        new = np.r_[True, labs[1:] != labs[:-1]]
        run_id = np.cumsum(new) - 1
        multi = np.bincount(run_id) > 1
        head = new & multi[run_id]
        return pa.table({
            "label": pa.array(labs[head]),
            "voted_caption": pa.array(cap[order][head].tolist(),
                                      type=pa.string()),
        })

    votes = (
        cnt.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket").map_groups(vote_bucket, batch_format="pyarrow")
    ).materialize()

    _empty = pa.table({
        "image_id": pa.array([], type=pa.string()),
        "caption": pa.array([], type=pa.string()),
        "voted_caption": pa.array([], type=pa.string()),
        "agree": pa.array([], type=pa.bool_()),
    })

    n_votes = votes.count()
    if n_votes <= broadcast_max_labels:
        vl, vc = [], []
        for b in votes.iter_batches(batch_size=262144,
                                    batch_format="pyarrow"):
            vl.append(b.column("label").to_numpy(zero_copy_only=False))
            vc.append(np.asarray(b.column("voted_caption").to_pylist(),
                                 dtype=object))
        if vl:
            vla = np.concatenate(vl)
            vca = np.concatenate(vc)
            order = np.argsort(vla, kind="stable")
            vla, vca = vla[order], vca[order]
        else:
            vla = np.empty(0, dtype=np.int64)
            vca = np.empty(0, dtype=object)
        vref = ray.put((vla, vca))

        def emit(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return _empty
            keys, caps = ray.get(vref)
            lab = t.column("label").to_numpy(zero_copy_only=False)
            own = np.asarray(t.column("caption").to_pylist(), dtype=object)
            voted = own.copy()
            if len(keys):
                pos = np.searchsorted(keys, lab)
                pos_c = np.minimum(pos, len(keys) - 1)
                hit = keys[pos_c] == lab
                voted[hit] = caps[pos_c[hit]]
            return pa.table({
                "image_id": t.column("image_id"),
                "caption": t.column("caption"),
                "voted_caption": pa.array(voted.tolist(),
                                          type=pa.string()),
                "agree": pa.array(own == voted),
            })

        return labeled.map_batches(emit, batch_format="pyarrow",
                                   zero_copy_batch=True)

    from humid_ray.stages.joins import join_kwargs

    joined = labeled.join(votes, join_type="left_outer", on=("label",),
                          **join_kwargs(n_votes))

    def emit_joined(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _empty
        voted = pc.coalesce(t.column("voted_caption"), t.column("caption"))
        return pa.table({
            "image_id": t.column("image_id"),
            "caption": t.column("caption"),
            "voted_caption": voted,
            "agree": pc.equal(t.column("caption"), voted),
        })

    return joined.map_batches(emit_joined, batch_format="pyarrow")


def cluster_caption_vote_sql(corpus_glob: str,
                             max_distance: int = 1) -> str:
    """DuckDB oracle for ``cluster_caption_vote``: the
    ``curate_images_sql`` recursive Hamming closure, caption mode per
    component via a count-DESC/caption-ASC window, one row per usable
    image."""
    return (
        "WITH RECURSIVE u AS (SELECT image_id, "
        "coalesce(caption, '') AS caption, phash "
        f"FROM read_parquet('{corpus_glob}') WHERE phash IS NOT NULL), "
        "nodes AS (SELECT DISTINCT phash AS sig FROM u), "
        "e AS (SELECT a.sig AS sa, b.sig AS sb FROM nodes a JOIN nodes b "
        "ON a.sig != b.sig "
        f"AND bit_count(xor(a.sig, b.sig)) <= {max_distance}), "
        "reach(src, dst) AS (SELECT sig, sig FROM nodes UNION "
        "SELECT r.src, e.sb FROM reach r JOIN e ON e.sa = r.dst), "
        "comp AS (SELECT src AS sig, "
        f"xor(min(xor(dst, {_SB})), {_SB}) AS label FROM reach GROUP BY src), "
        "lab AS (SELECT r.image_id, r.caption, m.label FROM u r "
        "JOIN comp m ON m.sig = r.phash), "
        "cnt AS (SELECT label, caption, count(*) AS c "
        "FROM lab GROUP BY label, caption), "
        "vote AS (SELECT label, caption AS voted FROM cnt "
        "QUALIFY row_number() OVER (PARTITION BY label "
        "ORDER BY c DESC, caption) = 1) "
        "SELECT l.image_id, l.caption, v.voted AS voted_caption, "
        "l.caption = v.voted AS agree "
        "FROM lab l JOIN vote v USING (label)"
    )


def cluster_caption_consistency_sql(corpus_glob: str,
                                    max_distance: int = 1) -> str:
    """DuckDB oracle for ``cluster_caption_consistency``: recursive
    Hamming closure over distinct phash (the ``curate_images_sql``
    chain), count(DISTINCT caption) per component, histogram."""
    return (
        "WITH RECURSIVE u AS (SELECT coalesce(caption, '') AS caption, "
        f"phash FROM read_parquet('{corpus_glob}') "
        "WHERE phash IS NOT NULL), "
        "nodes AS (SELECT DISTINCT phash AS sig FROM u), "
        "e AS (SELECT a.sig AS sa, b.sig AS sb FROM nodes a JOIN nodes b "
        "ON a.sig != b.sig "
        f"AND bit_count(xor(a.sig, b.sig)) <= {max_distance}), "
        "reach(src, dst) AS (SELECT sig, sig FROM nodes UNION "
        "SELECT r.src, e.sb FROM reach r JOIN e ON e.sa = r.dst), "
        "comp AS (SELECT src AS sig, "
        f"xor(min(xor(dst, {_SB})), {_SB}) AS label FROM reach GROUP BY src), "
        "lab AS (SELECT m.label, c.caption FROM u c "
        "JOIN comp m ON m.sig = c.phash), "
        "percl AS (SELECT label, "
        "CAST(count(DISTINCT caption) AS BIGINT) AS n_captions "
        "FROM lab GROUP BY label) "
        "SELECT n_captions, CAST(count(*) AS BIGINT) AS n_clusters "
        "FROM percl GROUP BY n_captions"
    )


# --- storage-savings report (bytes reclaimed by the keep-best dedup) ---------

_SAVINGS_EMPTY = pa.table({
    "fmt": pa.array([], type=pa.string()),
    "rows_kept": pa.array([], type=pa.int64()),
    "rows_removed": pa.array([], type=pa.int64()),
    "bytes_kept": pa.array([], type=pa.int64()),
    "bytes_removed": pa.array([], type=pa.int64()),
})


def dedup_storage_savings(corpus_dir: str):
    """(fmt, rows_kept, rows_removed, bytes_kept, bytes_removed): what
    the quality-aware dedup actually reclaims, per encoded format —
    the capacity-planning number behind a 100 TB dedup run ("the jpeg
    tier shrinks 38%, the png tier 4%"). Keep decisions are exactly
    ``curate_images_keep_best``'s (usable gate -> byte-exact canonical
    -> pHash Hamming cluster, keep = largest payload, tie min id);
    scope is usable rows (non-NULL stored phash), like every curate
    operator.

    Scale shape: the keep-list side collapses to ONE image_id per
    cluster (the keep rows), pulled bounded and broadcast once via
    ``ray.put`` — the same |labels|-bounded driver pull the curate
    family already makes; the corpus side then streams through a
    shuffle-free membership + per-batch (fmt, keep) Arrow group_by
    combiner, byte lengths from the Arrow offsets (payload never
    copied, never shuffled); the global exchange moves |fmt|x2-row
    partials. At 10^12 rows the keep side would read the curate
    keep-list checkpoint instead of re-deriving it by lineage."""
    kb = curate_images_keep_best(corpus_dir)
    rep_parts = []
    for b in kb.iter_batches(batch_size=65536, batch_format="pyarrow"):
        if b.num_rows:
            rep_parts.append(b.filter(b.column("keep")).column("image_id"))
    reps = (pa.concat_arrays([c for ca in rep_parts for c in ca.chunks])
            if rep_parts else pa.array([], type=pa.string()))
    ref = ray.put(reps)

    def partial(batch: pa.Table) -> pa.Table:
        out = {"fmt": pa.array([], type=pa.string()),
               "keep": pa.array([], type=pa.bool_()),
               "n": pa.array([], type=pa.int64()),
               "b": pa.array([], type=pa.int64())}
        if batch.num_rows == 0:
            return pa.table(out)
        batch = batch.filter(pc.is_valid(batch.column("phash")))
        if batch.num_rows == 0:
            return pa.table(out)
        keep_ids = ray.get(ref)
        _, offs = _flat_binary(batch.column("bytes"))
        t = pa.table({
            "fmt": batch.column("fmt"),
            "keep": pc.is_in(batch.column("image_id"),
                             value_set=keep_ids),
            "ln": pa.array((offs[1:] - offs[:-1]).astype(np.int64)),
        })
        g = t.group_by(["fmt", "keep"]).aggregate(
            [("ln", "sum"), ("ln", "count")])
        return pa.table({"fmt": g.column("fmt"), "keep": g.column("keep"),
                         "n": g.column("ln_count"),
                         "b": g.column("ln_sum")})

    def pivot(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return _SAVINGS_EMPTY
        keep = g.column("keep").to_numpy(zero_copy_only=False)
        n = g.column("n").to_numpy(zero_copy_only=False)
        b = g.column("b").to_numpy(zero_copy_only=False)
        return pa.table({
            "fmt": g.column("fmt").slice(0, 1),
            "rows_kept": pa.array([int(n[keep].sum())], type=pa.int64()),
            "rows_removed": pa.array([int(n[~keep].sum())],
                                     type=pa.int64()),
            "bytes_kept": pa.array([int(b[keep].sum())], type=pa.int64()),
            "bytes_removed": pa.array([int(b[~keep].sum())],
                                      type=pa.int64()),
        })

    return (
        read_corpus(corpus_dir,
                    columns=["image_id", "fmt", "bytes", "phash"])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("fmt")
        .map_groups(pivot, batch_format="pyarrow")
    )


def dedup_storage_savings_sql(corpus_glob: str,
                              max_distance: int = 1) -> str:
    """DuckDB oracle for ``dedup_storage_savings``: the
    ``curate_images_keep_best`` closure + window, folded to per-format
    row/byte sums."""
    return (
        "WITH RECURSIVE u AS (SELECT image_id, bytes, fmt, phash, "
        "CAST(octet_length(bytes) AS BIGINT) AS ln "
        f"FROM read_parquet('{corpus_glob}') WHERE phash IS NOT NULL), "
        "nodes AS (SELECT DISTINCT phash AS sig FROM u), "
        "e AS (SELECT a.sig AS sa, b.sig AS sb FROM nodes a JOIN nodes b "
        f"ON a.sig != b.sig AND bit_count(xor(a.sig, b.sig)) <= {max_distance}), "
        "reach(src, dst) AS (SELECT sig, sig FROM nodes UNION "
        "SELECT r.src, e.sb FROM reach r JOIN e ON e.sa = r.dst), "
        "comp AS (SELECT src AS sig, "
        f"xor(min(xor(dst, {_SB})), {_SB}) AS label FROM reach GROUP BY src), "
        "k AS (SELECT c.fmt, c.ln, c.image_id = first_value(c.image_id) "
        "OVER (PARTITION BY m.label ORDER BY c.ln DESC, c.image_id) "
        "AS keep FROM u c JOIN comp m ON m.sig = c.phash) "
        "SELECT fmt, "
        "CAST(count(*) FILTER (keep) AS BIGINT) AS rows_kept, "
        "CAST(count(*) FILTER (NOT keep) AS BIGINT) AS rows_removed, "
        "CAST(coalesce(sum(ln) FILTER (keep), 0) AS BIGINT) AS bytes_kept, "
        "CAST(coalesce(sum(ln) FILTER (NOT keep), 0) AS BIGINT) "
        "AS bytes_removed "
        "FROM k GROUP BY fmt"
    )


# --- chaining audit: near-dup cluster diameter histogram ---------------------

def cluster_diameter_hist(corpus_dir: str, max_distance: int = 1):
    """(diameter, n_clusters): histogram of the max pairwise Hamming
    distance WITHIN each pHash near-dup cluster — the chaining audit.
    Transitive closure over <=d edges happily merges A-B-C where
    Hamming(A, C) = 2d; a heavy tail here means clusters are chains of
    barely-related images and the single kept representative is
    discarding non-duplicates. Singleton clusters report diameter 0.

    Scale shape: runs entirely on the DISTINCT-phash cluster table
    (uniq collapse -> counting pre-pass -> salted banded LSH ->
    distributed CC — the flagship chain, edge-bounded and tiny
    relative to the corpus); the per-cluster all-pairs max is
    inherently quadratic IN THE CLUSTER, computed as chunked
    vectorized XOR+popcount inside one map_groups kernel per label
    (memory bounded by chunk x members, never materializing the full
    pair matrix); the final exchange is one int64 per cluster."""
    from ray.data.aggregate import Count as _Count

    from humid_ray.util import popcount64

    cfg = HumidConfig(sources=("phash",), clustering="maximum",
                      max_distance=max_distance)

    uniq_ds = _phash_uniq_ds(corpus_dir)
    n_uniq = uniq_ds.count()
    empty = pa.table({"diameter": pa.array([], type=pa.int64()),
                      "n_clusters": pa.array([], type=pa.int64())})
    if n_uniq == 0:
        return ray.data.from_arrow(empty)

    edges = _edges_with_hot_salting(uniq_ds, cfg)
    comp = connected_components(edges, cfg).materialize()
    n_touched = comp.count()

    def diam_kernel(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table({"diameter": pa.array([], type=pa.int64())})
        sigs = np.ascontiguousarray(
            g.column("sig").to_numpy(zero_copy_only=False)).view(UINT64)
        best = 0
        for lo in range(0, len(sigs), 512):
            chunk = sigs[lo:lo + 512]
            d = popcount64(chunk[:, None] ^ sigs[None, :])
            best = max(best, int(d.max()))
        return pa.table({"diameter": pa.array([best], type=pa.int64())})

    hist: dict[int, int] = {}
    if n_touched:
        per = (comp.groupby("comp").map_groups(
            diam_kernel, batch_format="pyarrow")
            .groupby("diameter").aggregate(_Count(alias_name="n")))
        for b in per.iter_batches(batch_size=4096, batch_format="pyarrow"):
            for d, n in zip(b.column("diameter").to_pylist(),
                            b.column("n").to_pylist()):
                hist[int(d)] = hist.get(int(d), 0) + int(n)
    n_single = n_uniq - n_touched
    if n_single:
        hist[0] = hist.get(0, 0) + n_single
    ds = sorted(hist)
    return ray.data.from_arrow(pa.table({
        "diameter": pa.array(ds, type=pa.int64()),
        "n_clusters": pa.array([hist[d] for d in ds], type=pa.int64()),
    }))


def cluster_diameter_hist_sql(corpus_glob: str,
                              max_distance: int = 1) -> str:
    """DuckDB oracle for ``cluster_diameter_hist``: recursive Hamming
    closure over distinct phash, max pairwise bit_count per component
    (LEFT JOIN keeps singletons at diameter 0), histogram."""
    return (
        "WITH RECURSIVE u AS (SELECT phash "
        f"FROM read_parquet('{corpus_glob}') WHERE phash IS NOT NULL), "
        "nodes AS (SELECT DISTINCT phash AS sig FROM u), "
        "e AS (SELECT a.sig AS sa, b.sig AS sb FROM nodes a JOIN nodes b "
        f"ON a.sig != b.sig AND bit_count(xor(a.sig, b.sig)) <= {max_distance}), "
        "reach(src, dst) AS (SELECT sig, sig FROM nodes UNION "
        "SELECT r.src, e.sb FROM reach r JOIN e ON e.sa = r.dst), "
        "comp AS (SELECT src AS sig, "
        f"xor(min(xor(dst, {_SB})), {_SB}) AS label FROM reach GROUP BY src), "
        "diam AS (SELECT a.label, "
        "max(bit_count(xor(a.sig, b.sig))) AS d "
        "FROM comp a JOIN comp b ON a.label = b.label AND a.sig < b.sig "
        "GROUP BY a.label), "
        "percl AS (SELECT label FROM comp GROUP BY label) "
        "SELECT CAST(coalesce(d.d, 0) AS BIGINT) AS diameter, "
        "CAST(count(*) AS BIGINT) AS n_clusters "
        "FROM percl p LEFT JOIN diam d ON d.label = p.label "
        "GROUP BY diameter"
    )


# --- A/B-axis agreement: caption identity vs pHash cluster -------------------

def caption_cluster_agreement(corpus_dir: str, max_distance: int = 1):
    """(relation, n_pairs) with relation in {both, caption_only,
    cluster_only}: of all unordered usable-row pairs related on EITHER
    axis, how many share a caption AND a pHash near-dup cluster, how
    many share only the caption (same label, visually unrelated — the
    stock-photo-caption smell), and how many share only the cluster
    (same picture, different labels — the supervision-noise smell).
    The summary-number complement of ``caption_phash_neardup`` (which
    emits the joint pairs) and ``cluster_caption_consistency`` (the
    per-cluster histogram).

    Scale shape: NO pair is ever materialized — every count is a
    sum of C(n, 2) over group sizes. One corpus scan collapses to
    distinct (caption-hash, phash) counts via per-batch Arrow
    group_by; cluster labels come from the flagship chain over
    DISTINCT phashes and broadcast once; the three pair-sums fold
    from the (label, caphash, n) table via three tiny aggregations
    (distinct-pair-bounded, never the corpus). C(n, 2) stays inside
    int64 for any group under ~4.3e9 rows — beyond any real caption
    or cluster multiplicity; the BIGINT oracle shares the bound.
    Caption identity is the 64-bit ``hash_string_column`` digest
    (collision caveat as ``cluster_caption_consistency``)."""
    from ray.data.aggregate import Sum

    from humid_ray.stages.joins import hash_string_column

    cfg = HumidConfig(sources=("phash",), clustering="maximum",
                      max_distance=max_distance)

    def pairs_partial(batch: pa.Table) -> pa.Table:
        out = {"phash": pa.array([], type=pa.int64()),
               "caphash": pa.array([], type=pa.int64()),
               "n": pa.array([], type=pa.int64())}
        if batch.num_rows == 0:
            return pa.table(out)
        batch = batch.filter(pc.is_valid(batch.column("phash")))
        if batch.num_rows == 0:
            return pa.table(out)
        ch = hash_string_column(
            pc.fill_null(batch.column("caption"), "").combine_chunks()
        )
        t = pa.table({
            "phash": batch.column("phash"),
            "caphash": pa.array(ch.view(np.int64)),
        })
        g = t.group_by(["phash", "caphash"]).aggregate([("phash", "count")])
        return pa.table({"phash": g.column("phash"),
                         "caphash": g.column("caphash"),
                         "n": g.column("phash_count")})

    cells = (
        read_corpus(corpus_dir, columns=["phash", "caption"])
        .map_batches(pairs_partial, batch_format="pyarrow",
                     zero_copy_batch=True)
        .groupby(["phash", "caphash"]).aggregate(Sum("n", alias_name="n"))
    ).materialize()

    uniq_ds = cells.groupby("phash").aggregate(
        Count(alias_name="count")
    ).map_batches(
        lambda t: pa.table({"sig": t.column("phash"),
                            "count": t.column("count")}),
        batch_format="pyarrow",
    ).materialize()
    ref = ray.put(_phash_label_arrays(uniq_ds, cfg))
    label_kernel = _phash_label_kernel(
        ref, {"caphash": pa.int64(), "n": pa.int64()})

    # (label, caphash, n) cells: collapse possible multi-phash cells
    # of one (label, caption) pair before any C(n,2)
    g = (cells.map_batches(label_kernel, batch_format="pyarrow",
                           zero_copy_batch=True)
         .groupby(["label", "caphash"]).aggregate(Sum("n", alias_name="n"))
         ).materialize()

    def _pair_sum(ds, key: str | None) -> int:
        """sum of C(n,2) over ds['n'], optionally re-grouped by key."""
        if key is not None:
            ds = ds.groupby(key).aggregate(Sum("n", alias_name="n"))

        def partial(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return pa.table({"s": pa.array([], type=pa.int64())})
            n = t.column("n").to_numpy(zero_copy_only=False)
            # C(n,2) with the halving applied BEFORE the product so the
            # int64 intermediate holds up to the same ~4.3e9-row groups
            # as the final value (n*(n-1) alone wraps at n~3.04e9)
            pairs = (n // 2) * (n - 1) + (n % 2) * (n // 2)
            return pa.table({"s": pa.array(
                [int(pairs.sum())], type=pa.int64())})

        total = 0
        for b in ds.map_batches(
            partial, batch_format="pyarrow"
        ).iter_batches(batch_size=4096, batch_format="pyarrow"):
            if b.num_rows:
                total += int(pc.sum(b.column("s")).as_py() or 0)
        return total

    both = _pair_sum(g, None)
    cap = _pair_sum(g, "caphash")
    clus = _pair_sum(g, "label")
    return ray.data.from_arrow(pa.table({
        "relation": pa.array(["both", "caption_only", "cluster_only"],
                             type=pa.string()),
        "n_pairs": pa.array([both, cap - both, clus - both],
                            type=pa.int64()),
    }))


def caption_cluster_agreement_sql(corpus_glob: str,
                                  max_distance: int = 1) -> str:
    """DuckDB oracle for ``caption_cluster_agreement``: recursive
    Hamming closure, then three sum-of-C(n,2) folds over the
    (caption, label) cell counts (`//` = integer division)."""
    return (
        "WITH RECURSIVE u AS (SELECT coalesce(caption, '') AS caption, "
        f"phash FROM read_parquet('{corpus_glob}') "
        "WHERE phash IS NOT NULL), "
        "nodes AS (SELECT DISTINCT phash AS sig FROM u), "
        "e AS (SELECT a.sig AS sa, b.sig AS sb FROM nodes a JOIN nodes b "
        "ON a.sig != b.sig "
        f"AND bit_count(xor(a.sig, b.sig)) <= {max_distance}), "
        "reach(src, dst) AS (SELECT sig, sig FROM nodes UNION "
        "SELECT r.src, e.sb FROM reach r JOIN e ON e.sa = r.dst), "
        "comp AS (SELECT src AS sig, "
        f"xor(min(xor(dst, {_SB})), {_SB}) AS label FROM reach GROUP BY src), "
        "lab AS (SELECT c.caption, m.label FROM u c "
        "JOIN comp m ON m.sig = c.phash), "
        "g AS (SELECT caption, label, CAST(count(*) AS BIGINT) AS n "
        "FROM lab GROUP BY caption, label), "
        "b AS (SELECT coalesce(sum(n * (n - 1) // 2), 0) AS v FROM g), "
        "capv AS (SELECT coalesce(sum(c * (c - 1) // 2), 0) AS v FROM "
        "(SELECT sum(n) AS c FROM g GROUP BY caption)), "
        "cluv AS (SELECT coalesce(sum(m * (m - 1) // 2), 0) AS v FROM "
        "(SELECT sum(n) AS m FROM g GROUP BY label)) "
        "SELECT 'both' AS relation, CAST(b.v AS BIGINT) AS n_pairs FROM b "
        "UNION ALL SELECT 'caption_only', CAST(capv.v - b.v AS BIGINT) "
        "FROM capv, b "
        "UNION ALL SELECT 'cluster_only', CAST(cluv.v - b.v AS BIGINT) "
        "FROM cluv, b"
    )


# --- banding-health audit: per-band key distribution --------------------------

def phash_band_entropy(corpus_dir: str, max_distance: int = 1):
    """(band, shift, width, n_keys, max_rows, n_rows) for each band of
    the FLAGSHIP's LSH layout (``band_layout(64, max_distance+1)`` —
    the same pigeonhole split ``find_edges`` buckets by): how many
    distinct keys the band produces over usable rows, how many rows the
    hottest key holds, and the row total. The bucket-level complement
    of ``phash_bit_stats``: a band whose ``max_rows`` approaches
    ``n_rows`` (one mega-bucket) defeats banding even when every
    individual bit looks healthy, and is exactly the shape the hot-band
    salting exists for — this report says whether the salting threshold
    is conservative or load-bearing on a given corpus.

    Scale shape: band keys are shift/mask numpy ops per batch; the only
    exchange carries distinct (band, key) partial counts (bounded by
    bands x distinct sigs, never the corpus); the per-band fold is a
    |bands|-group aggregate; missing bands zero-fill driver-side so the
    report always has ``max_distance + 1`` rows."""
    from ray.data.aggregate import Max, Sum

    from humid_ray.stages.lsh import band_keys, band_layout

    layout = band_layout(64, max_distance + 1)

    def partial(batch: pa.Table) -> pa.Table:
        out = {"band": pa.array([], type=pa.int64()),
               "key": pa.array([], type=pa.int64()),
               "n": pa.array([], type=pa.int64())}
        if batch.num_rows == 0:
            return pa.table(out)
        batch = batch.filter(pc.is_valid(batch.column("phash")))
        if batch.num_rows == 0:
            return pa.table(out)
        ph = batch.column("phash").to_numpy(zero_copy_only=False)
        keys = band_keys(ph.view(UINT64), layout)
        t = pa.table({
            "band": pa.array(np.repeat(
                np.arange(len(layout), dtype=np.int64), batch.num_rows)),
            "key": pa.array(keys.ravel().view(np.int64)),
        })
        g = t.group_by(["band", "key"]).aggregate([("key", "count")])
        return pa.table({"band": g.column("band"), "key": g.column("key"),
                         "n": g.column("key_count")})

    per_band = (
        read_corpus(corpus_dir, columns=["phash"])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["band", "key"]).aggregate(Sum("n", alias_name="n"))
        .groupby("band").aggregate(Count(alias_name="n_keys"),
                                   Max("n", alias_name="max_rows"),
                                   Sum("n", alias_name="n_rows"))
    )

    rows = {int(r["band"]): (int(r["n_keys"]), int(r["max_rows"]),
                             int(r["n_rows"]))
            for b in per_band.iter_batches(batch_size=4096,
                                           batch_format="pyarrow")
            for r in b.to_pylist()}
    return ray.data.from_arrow(pa.table({
        "band": pa.array(range(len(layout)), type=pa.int64()),
        "shift": pa.array([s for s, _w in layout], type=pa.int64()),
        "width": pa.array([w for _s, w in layout], type=pa.int64()),
        "n_keys": pa.array([rows.get(b, (0, 0, 0))[0]
                            for b in range(len(layout))], type=pa.int64()),
        "max_rows": pa.array([rows.get(b, (0, 0, 0))[1]
                              for b in range(len(layout))],
                             type=pa.int64()),
        "n_rows": pa.array([rows.get(b, (0, 0, 0))[2]
                            for b in range(len(layout))], type=pa.int64()),
    }))


def phash_band_entropy_sql(corpus_glob: str, max_distance: int = 1) -> str:
    """DuckDB oracle for ``phash_band_entropy``: one UNION ALL branch
    per band of the same layout (``>>`` on BIGINT is zero-fill, so the
    shift/mask matches the numpy uint64 path bit-for-bit)."""
    from humid_ray.stages.lsh import band_layout

    layout = band_layout(64, max_distance + 1)
    branches = []
    for b, (shift, width) in enumerate(layout):
        mask = (1 << width) - 1
        branches.append(
            f"SELECT CAST({b} AS BIGINT) AS band, "
            f"CAST({shift} AS BIGINT) AS shift, "
            f"CAST({width} AS BIGINT) AS width, "
            "CAST(coalesce(count(*), 0) AS BIGINT) AS n_keys, "
            "CAST(coalesce(max(n), 0) AS BIGINT) AS max_rows, "
            "CAST(coalesce(sum(n), 0) AS BIGINT) AS n_rows FROM "
            f"(SELECT (phash >> {shift}) & {mask} AS key, count(*) AS n "
            "FROM u GROUP BY 1)"
        )
    return (
        "WITH u AS (SELECT phash "
        f"FROM read_parquet('{corpus_glob}') WHERE phash IS NOT NULL) "
        + " UNION ALL ".join(branches)
    )


# --- aspect-ratio / resolution profile ----------------------------------------

def aspect_ratio_stats(corpus_dir: str):
    """(fmt, orientation, n, avg_megapixels): resolution profile per
    format and orientation (landscape w>h / portrait w<h / square) —
    the batch-shape planning report for a decode/resize stage (GPU
    batch geometry wants same-orientation grouping; megapixels size
    the decode-stage memory budget).

    Scale shape: shuffle-free row-local kernel over the two int32
    metadata columns only (``bytes`` is never read); per-batch
    (fmt, orientation) Arrow group_by partials with exact int64
    pixel sums, one |fmt x 3|-row exchange; the float division
    happens ONCE per output row after the integer sums (DuckDB
    bit-equal, the ``image_format_stats`` convention)."""
    from ray.data.aggregate import Sum

    from humid_ray.util import round_half_away

    def partial(batch: pa.Table) -> pa.Table:
        out = {"fmt": pa.array([], type=pa.string()),
               "orientation": pa.array([], type=pa.string()),
               "n": pa.array([], type=pa.int64()),
               "px": pa.array([], type=pa.int64())}
        if batch.num_rows == 0:
            return pa.table(out)
        w = batch.column("w").to_numpy(zero_copy_only=False).astype(np.int64)
        h = batch.column("h").to_numpy(zero_copy_only=False).astype(np.int64)
        ori = np.where(w > h, "landscape", np.where(w < h, "portrait",
                                                    "square"))
        t = pa.table({"fmt": batch.column("fmt"),
                      "orientation": pa.array(ori),
                      "px": pa.array(w * h)})
        g = t.group_by(["fmt", "orientation"]).aggregate(
            [("px", "sum"), ("px", "count")])
        return pa.table({"fmt": g.column("fmt"),
                         "orientation": g.column("orientation"),
                         "n": g.column("px_count"),
                         "px": g.column("px_sum")})

    agg = (
        read_corpus(corpus_dir, columns=["fmt", "w", "h"])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["fmt", "orientation"])
        .aggregate(Sum("n", alias_name="n"), Sum("px", alias_name="px"))
    )

    def finish(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({
                "fmt": pa.array([], type=pa.string()),
                "orientation": pa.array([], type=pa.string()),
                "n": pa.array([], type=pa.int64()),
                "avg_megapixels": pa.array([], type=pa.float64())})
        n = t.column("n").to_numpy(zero_copy_only=False)
        px = t.column("px").to_numpy(zero_copy_only=False)
        avg = round_half_away(px.astype(np.float64) / 1e6
                              / n.astype(np.float64))
        return pa.table({"fmt": t.column("fmt"),
                         "orientation": t.column("orientation"),
                         "n": t.column("n"),
                         "avg_megapixels": pa.array(avg)})

    return agg.map_batches(finish, batch_format="pyarrow")


def aspect_ratio_stats_sql(corpus_glob: str) -> str:
    """DuckDB oracle for ``aspect_ratio_stats`` (same sum-then-divide
    order: exact integer pixel sums, ONE double division, round 6)."""
    return (
        "SELECT fmt, CASE WHEN w > h THEN 'landscape' "
        "WHEN w < h THEN 'portrait' ELSE 'square' END AS orientation, "
        "CAST(count(*) AS BIGINT) AS n, "
        "round(CAST(sum(CAST(w AS BIGINT) * h) AS DOUBLE) / 1e6 "
        "/ count(*), 6) AS avg_megapixels "
        f"FROM read_parquet('{corpus_glob}') GROUP BY fmt, orientation"
    )


# --- multi-evidence FUSED dedup (tier union with provenance) -----------------
#
# The tier-dedup funnel (tiered_dedup_report_images) applies the
# evidence tiers SEQUENTIALLY and reports counts; the fused operator
# answers the other production question: "link two images into ONE
# identity when ANY tier connects them — byte-identical payload, the
# same non-empty caption, or pHash within Hamming<=m — and tell me
# which tiers fired per cluster". One connected-components pass over
# the UNION of the three evidence graphs (reference semantics:
# src/humid.cc findClusters' transitive closure, here over a
# multi-relation edge set), with per-cluster provenance flags.


def _star_edges(ds, key_cols: tuple[str, ...], bucket_col: str):
    """Clique contraction for an EQUALITY evidence tier: rows sharing
    the key become star edges (member node -> group-min node), so a
    group of n byte-identical crawls contributes n-1 edges, never the
    C(n,2) clique. ONE bucket exchange (int64 columns only); the
    per-bucket kernel canonicalizes MANY groups with a single lexsort
    + segment pass — no per-group Python."""

    def kernel(g: pa.Table) -> pa.Table:
        out = {"sig_a": pa.array([], type=pa.int64()),
               "sig_b": pa.array([], type=pa.int64())}
        if g.num_rows == 0:
            return pa.table(out)
        node = g.column("node").to_numpy(zero_copy_only=False)
        keys = [g.column(c).to_numpy(zero_copy_only=False)
                for c in key_cols]
        # primary = key_cols[0], ..., then node ascending (int64 view)
        order = np.lexsort((node, *reversed(keys)))
        ns = node[order]
        ks = [k[order] for k in keys]
        new = np.zeros(len(ns), dtype=bool)
        new[0] = True
        for k in ks:
            new[1:] |= k[1:] != k[:-1]
        seg_start = np.maximum.accumulate(
            np.where(new, np.arange(len(new)), 0)
        )
        centers = ns[seg_start]
        mask = ns != centers  # group members other than the center
        if not mask.any():
            return pa.table(out)
        return pa.table({"sig_a": pa.array(ns[mask]),
                         "sig_b": pa.array(centers[mask])})

    return ds.groupby(bucket_col).map_groups(kernel, batch_format="pyarrow")


def _distinct_i64(ds, col: str) -> np.ndarray:
    """Distinct values of an int64 column, pulled driver-side.
    Per-batch ``np.unique`` partials bound the transfer by the
    distinct count (callers only use this on edge-bounded datasets)."""

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({col: pa.array([], type=pa.int64())})
        return pa.table({col: pa.array(np.unique(
            t.column(col).to_numpy(zero_copy_only=False)))})

    parts = [b.column(col).to_numpy(zero_copy_only=False)
             for b in ds.map_batches(partial, batch_format="pyarrow")
             .iter_batches(batch_size=65536, batch_format="pyarrow")]
    if not parts:
        return np.empty(0, dtype=np.int64)
    return np.unique(np.concatenate(parts))


def fused_dedup_images(corpus_dir: str, max_distance: int = 1,
                       broadcast_max_labels: int = 1_000_000):
    """(image_id, cluster_rep, keep, ev_byte, ev_pixel, ev_caption,
    ev_phash): multi-evidence fused dedup — images are one identity
    when ANY evidence tier links them (transitively):

    * ``byte``    — byte-identical payload (the 128-bit+len composite),
    * ``pixel``   — identical DECODED pixels (the tier between byte
      identity and pHash: catches re-encodes of the same pixels —
      zlib level, filter choice, container — with zero near-dup
      false-positive risk; usable rows whose payload decodes),
    * ``caption`` — the same NON-EMPTY caption (A axis),
    * ``phash``   — pHash within Hamming <= ``max_distance``, equal
      phashes included (B axis; reference neighbor semantics,
      src/humid.cc:113-130).

    ``cluster_rep`` = min image_id of the fused cluster, ``keep`` one
    row per cluster; ``ev_*`` are CLUSTER-level flags: tier t is true
    iff some edge of tier t is internal to the cluster. Every row is
    a node (rows with NULL phash / empty caption still byte-group).
    Tier containment: among decodable rows byte-equal payloads are
    pixel-equal, so byte evidence implies pixel evidence except for
    clusters whose only byte dups are undecodable (asserted by the
    containment test).

    Scale shape: payload bytes hash AND decode in-batch (one actor-
    pool scan; ``PayloadMemo`` decodes each distinct payload once per
    actor) and never shuffle — only digests do; each equality tier is
    clique-CONTRACTED to member->group-min star edges (O(rows), one
    bucket exchange each); the Hamming tier runs the flagship chain
    over DISTINCT phashes (counting pre-pass -> salted banded LSH ->
    capped verify) and its edge list maps to per-phash representative
    nodes through an is_in-filtered, edge-bounded pull. One
    connected-components pass over the union (auto local/distributed);
    the node->label map and the four evidence label sets are
    edge-bounded and broadcast once via ``ray.put`` — above that
    ceiling the label application switches to the distributed-join
    pattern of ``curate_images``. Node ids are 64-bit image_id digests
    (collision ~n^2/2^65; the DuckDB oracle links by the raw strings
    and would surface one at test scale)."""
    from humid_ray.functions.payloads import PayloadMemo
    from humid_ray.util import hash_bytes_segments, splitmix64

    cfg = HumidConfig(sources=("phash",), clustering="maximum",
                      max_distance=max_distance)
    nb = UINT64(_CANON_BUCKETS)

    _narrow_empty = pa.table(
        {"image_id": pa.array([], type=pa.string()),
         "node": pa.array([], type=pa.int64()),
         "h1": pa.array([], type=pa.int64()),
         "h2": pa.array([], type=pa.int64()),
         "ln": pa.array([], type=pa.int64()),
         "bb": pa.array([], type=pa.int64()),
         "px1": pa.array([], type=pa.int64()),
         "px2": pa.array([], type=pa.int64()),
         "pxln": pa.array([], type=pa.int64()),
         "pxb": pa.array([], type=pa.int64()),
         "cap_h": pa.array([], type=pa.int64()),
         "cb": pa.array([], type=pa.int64()),
         "phash": pa.array([], type=pa.int64()),
         "pb": pa.array([], type=pa.int64())})

    class _FusedNarrow:
        def __init__(self):
            from humid_ray.codecs import image_decoder

            self.memo = PayloadMemo()
            self.decode = image_decoder()  # codec seam: once per actor

        def _pixels(self, seg) -> tuple:
            import hashlib as _hl

            try:
                img = self.decode(bytes(seg))
            except Exception:  # noqa: BLE001 - undecodable -> no pixels
                return (0, 0, -1)
            arr = np.ascontiguousarray(img)
            d = _hl.blake2b(
                repr((arr.shape, arr.dtype.str)).encode() + arr.tobytes(),
                digest_size=16,
            ).digest()
            return (int.from_bytes(d[:8], "little"),
                    int.from_bytes(d[8:], "little"), int(arr.nbytes))

        def __call__(self, batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                return _narrow_empty
            n = batch.num_rows
            ids = batch.column("image_id").combine_chunks()
            idata, ioffs = _flat_str(ids)
            node = hash_bytes_segments(idata, ioffs)
            data, offs = _flat_binary(batch.column("bytes"))
            h1, h2 = _payload_digests(data, offs, n)
            cap = batch.column("caption").combine_chunks()
            cap_ok = pc.and_(pc.is_valid(cap), pc.not_equal(
                pc.fill_null(cap, ""), "")).to_numpy(zero_copy_only=False)
            cdata, coffs = _flat_str(pc.fill_null(cap, "")
                                     if cap.null_count else cap)
            cap_h = hash_bytes_segments(cdata, coffs)
            ph = batch.column("phash")
            ph_ok = pc.is_valid(ph).to_numpy(zero_copy_only=False)
            ph_filled = pc.fill_null(ph, 0).to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            # pixel identity, usable rows only (the pixel_exact_dedup
            # convention): decode once per DISTINCT payload per actor
            hits = self.memo.map(batch.column("bytes"), self._pixels)
            px1 = np.fromiter((h[0] for h in hits), dtype=UINT64, count=n)
            px2 = np.fromiter((h[1] for h in hits), dtype=UINT64, count=n)
            pxln = np.fromiter((h[2] for h in hits), dtype=np.int64,
                               count=n)
            px_ok = ph_ok & (pxln >= 0)
            return pa.table({
                "image_id": batch.column("image_id"),
                "node": u64col(node),
                "h1": u64col(h1),
                "h2": u64col(h2),
                "ln": pa.array((offs[1:] - offs[:-1]).astype(np.int64)),
                "bb": pa.array((h1 % nb).astype(np.int64)),
                "px1": pa.array(px1.view(np.int64), mask=~px_ok),
                "px2": pa.array(px2.view(np.int64)),
                "pxln": pa.array(pxln),
                "pxb": pa.array((px1 % nb).astype(np.int64)),
                "cap_h": pa.array(cap_h.view(np.int64), mask=~cap_ok),
                "cb": pa.array((cap_h % nb).astype(np.int64)),
                "phash": ph,
                "pb": pa.array((splitmix64(ph_filled.view(UINT64)) % nb)
                               .astype(np.int64)),
            })

    rows = read_corpus(
        corpus_dir, columns=["image_id", "bytes", "caption", "phash"]
    ).map_batches(_FusedNarrow, batch_format="pyarrow",
                  zero_copy_batch=True, batch_size=1024,
                  concurrency=decode_pool())
    # one narrow projection, five consumers (three tiers, the uniq
    # collapse, the final labeling) — at flagship scale this slot is
    # the per-phase parquet checkpoint (state/checkpoints.py)
    rows = rows.materialize()

    # each stars dataset has TWO consumers (the CC edge union and the
    # evidence-center pull) — materialize so the corpus-wide bucket
    # exchange runs once, not once per consumer (edge-bounded output)
    stars_b = _star_edges(
        rows.select_columns(["node", "h1", "h2", "ln", "bb"]),
        ("h1", "h2", "ln"), "bb").materialize()

    def px_valid(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_valid(t.column("px1")))

    stars_px = _star_edges(
        rows.select_columns(["node", "px1", "px2", "pxln", "pxb"])
        .map_batches(px_valid, batch_format="pyarrow"),
        ("px1", "px2", "pxln"), "pxb").materialize()

    def cap_valid(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_valid(t.column("cap_h")))

    stars_c = _star_edges(
        rows.select_columns(["node", "cap_h", "cb"]).map_batches(
            cap_valid, batch_format="pyarrow"),
        ("cap_h",), "cb").materialize()

    def ph_valid(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_valid(t.column("phash")))

    ph_rows = rows.select_columns(["node", "phash", "pb"]).map_batches(
        ph_valid, batch_format="pyarrow")
    stars_p = _star_edges(ph_rows, ("phash",), "pb").materialize()

    # DISTINCT-phash uniq collapse carrying a representative node,
    # then Hamming edges over phash VALUES -> representative-node
    # space; everything edge-bounded (the flagship's own CC pull)
    uniq_ph = _uniq_with_min_node(ph_rows, "phash")
    ph_edges = _edges_with_hot_salting(
        uniq_ph.select_columns(["sig", "count"]), cfg)
    na, nbv = _edges_to_node_space(ph_edges, uniq_ph)
    ph_node_edges = ray.data.from_arrow(pa.table(
        {"sig_a": pa.array(na), "sig_b": pa.array(nbv)}))

    all_edges = stars_b.union(stars_px, stars_c, stars_p, ph_node_edges)
    comp = connected_components(all_edges, cfg).materialize()
    n_labels = comp.count()

    # tier-t star centers / Hamming-edge endpoints: tier t fired in
    # cluster c iff c contains one of these nodes (all appear in comp)
    centers_by_tier = (
        _distinct_i64(stars_b, "sig_b"),
        _distinct_i64(stars_px, "sig_b"),
        _distinct_i64(stars_c, "sig_b"),
        np.unique(np.concatenate([
            _distinct_i64(stars_p, "sig_b"), na, nbv])),
    )

    from humid_ray.stages.joins import (copart_buckets, join_kwargs,
                                        key_buckets)

    nbk = copart_buckets(rows.count())
    narrow_ids = rows.select_columns(["image_id", "node"])

    if n_labels <= broadcast_max_labels:
        # broadcast path: node -> label map pulled once (edge-bounded;
        # fallback label = own node), evidence labels by searchsorted
        cparts = [
            (b.column("sig").to_numpy(zero_copy_only=False),
             b.column("comp").to_numpy(zero_copy_only=False))
            for b in comp.iter_batches(batch_size=65536,
                                       batch_format="pyarrow")
        ]
        if cparts:
            csig = np.concatenate([p[0] for p in cparts])
            clab = np.concatenate([p[1] for p in cparts])
            order = np.argsort(csig, kind="stable")
            csig, clab = csig[order], clab[order]
        else:
            csig = np.empty(0, dtype=np.int64)
            clab = np.empty(0, dtype=np.int64)

        def lab_of(nodes: np.ndarray) -> np.ndarray:
            return apply_sorted_labels(csig, clab, nodes)

        ev_sets = [np.unique(lab_of(c)) for c in centers_by_tier]
        mref = ray.put((csig, clab))

        def label_kernel(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return pa.table(
                    {"image_id": pa.array([], type=pa.string()),
                     "label": pa.array([], type=pa.int64()),
                     "bucket": pa.array([], type=pa.int64())})
            ks, kl = ray.get(mref)
            node = t.column("node").to_numpy(zero_copy_only=False)
            lab = apply_sorted_labels(ks, kl, node)
            return pa.table({"image_id": t.column("image_id"),
                             "label": pa.array(lab),
                             "bucket": pa.array(key_buckets(lab, nbk))})

        labeled = narrow_ids.map_batches(label_kernel,
                                         batch_format="pyarrow")
    else:
        # distributed path: the label map never leaves the cluster —
        # one left-outer Dataset.join (comp is the small side), and
        # each tier's evidence labels come from an inner semi-join
        joined = narrow_ids.join(
            comp, join_type="left_outer", on=("node",),
            right_on=("sig",), **join_kwargs(n_labels))

        def fill(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return pa.table(
                    {"image_id": pa.array([], type=pa.string()),
                     "label": pa.array([], type=pa.int64()),
                     "bucket": pa.array([], type=pa.int64())})
            lab = pc.coalesce(t.column("comp"), t.column("node")) \
                .to_numpy(zero_copy_only=False)
            return pa.table({"image_id": t.column("image_id"),
                             "label": pa.array(lab),
                             "bucket": pa.array(key_buckets(lab, nbk))})

        labeled = joined.map_batches(fill, batch_format="pyarrow")
        ev_sets = []
        for c in centers_by_tier:
            if not len(c):
                ev_sets.append(np.empty(0, dtype=np.int64))
                continue
            cds = ray.data.from_arrow(pa.table({"sig": pa.array(c)}))
            j = cds.join(comp, join_type="inner", on=("sig",),
                         **join_kwargs(len(c), n_labels))
            ev_sets.append(_distinct_i64(j, "comp"))
    ref = ray.put((ev_sets[0], ev_sets[1], ev_sets[2], ev_sets[3]))

    def rep_bucket(g: pa.Table) -> pa.Table:
        out = {"image_id": pa.array([], type=pa.string()),
               "cluster_rep": pa.array([], type=pa.string()),
               "keep": pa.array([], type=pa.bool_()),
               "ev_byte": pa.array([], type=pa.bool_()),
               "ev_pixel": pa.array([], type=pa.bool_()),
               "ev_caption": pa.array([], type=pa.bool_()),
               "ev_phash": pa.array([], type=pa.bool_())}
        if g.num_rows == 0:
            return pa.table(out)
        evb, evpx, evc, evp = ray.get(ref)
        ids = np.asarray(g.column("image_id").to_pylist(), dtype=object)
        lab = g.column("label").to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, lab))
        labs = lab[order]
        new = np.r_[True, labs[1:] != labs[:-1]]
        seg_start = np.maximum.accumulate(
            np.where(new, np.arange(len(new)), 0))
        ids_sorted = ids[order]
        rep_sorted = ids_sorted[seg_start]
        inv = np.empty(len(order), dtype=np.int64)
        inv[order] = np.arange(len(order))
        rep = rep_sorted[inv]

        def member(s: np.ndarray) -> np.ndarray:
            return sorted_member(s, lab)

        return pa.table({
            "image_id": g.column("image_id"),
            "cluster_rep": pa.array(rep.tolist(), type=pa.string()),
            "keep": pa.array(ids == rep),
            "ev_byte": pa.array(member(evb)),
            "ev_pixel": pa.array(member(evpx)),
            "ev_caption": pa.array(member(evc)),
            "ev_phash": pa.array(member(evp)),
        })

    return (
        labeled.groupby("bucket")
        .map_groups(rep_bucket, batch_format="pyarrow")
    )


def fused_dedup_images_sql(corpus_glob: str, max_distance: int = 1) -> str:
    """DuckDB oracle for ``fused_dedup_images``: star edges per
    equality tier + distinct-phash Hamming edges over representative
    ids, recursive closure over the union, per-label evidence via
    count-vs-distinct / pairwise bit_count.

    The pixel tier is decode-valued, so SQL derives it from two
    properties of the synthetic corpus (each verified separately):
    a row is decodable iff its stored phash is non-null (the synth
    generator invariant every image oracle uses), and the corpus
    contains no re-encodes — pixel-equality among decodable rows
    coincides with byte-equality (asserted by
    test_fused_pixel_tier_matches_byte_on_synth_corpus; re-encode
    behavior itself is pinned by the planted-re-encode tests on tmp
    corpora). Hence ev_pixel = byte-grouping restricted to
    phash-valid rows, and pixel edges (a subset of byte edges here)
    don't change the closure."""
    m = max_distance
    return (
        "WITH RECURSIVE r AS (SELECT image_id, bytes, caption, phash "
        f"FROM read_parquet('{corpus_glob}')), "
        "sb AS (SELECT image_id AS a, "
        "min(image_id) OVER (PARTITION BY bytes) AS b FROM r), "
        "sc AS (SELECT image_id AS a, "
        "min(image_id) OVER (PARTITION BY caption) AS b FROM r "
        "WHERE caption IS NOT NULL AND caption <> ''), "
        "sp AS (SELECT image_id AS a, "
        "min(image_id) OVER (PARTITION BY phash) AS b FROM r "
        "WHERE phash IS NOT NULL), "
        "pu AS (SELECT phash, min(image_id) AS rep FROM r "
        "WHERE phash IS NOT NULL GROUP BY phash), "
        "sh AS (SELECT x.rep AS a, y.rep AS b FROM pu x JOIN pu y "
        "ON x.phash < y.phash "
        f"AND bit_count(xor(x.phash, y.phash)) <= {m}), "
        "e0 AS (SELECT a, b FROM sb WHERE a <> b "
        "UNION SELECT a, b FROM sc WHERE a <> b "
        "UNION SELECT a, b FROM sp WHERE a <> b "
        "UNION SELECT a, b FROM sh), "
        "e AS (SELECT a, b FROM e0 UNION SELECT b, a FROM e0), "
        "reach(src, dst) AS (SELECT image_id, image_id FROM r "
        "UNION SELECT rr.src, e.b FROM reach rr JOIN e ON e.a = rr.dst), "
        "comp AS (SELECT src AS image_id, min(dst) AS label "
        "FROM reach GROUP BY src), "
        "lab AS (SELECT r.image_id, r.bytes, r.caption, r.phash, c.label "
        "FROM r JOIN comp c ON c.image_id = r.image_id), "
        "evb AS (SELECT label FROM lab GROUP BY label "
        "HAVING count(*) > count(DISTINCT bytes)), "
        "evpx AS (SELECT label FROM lab WHERE phash IS NOT NULL "
        "GROUP BY label HAVING count(*) > count(DISTINCT bytes)), "
        "evc AS (SELECT label FROM lab "
        "WHERE caption IS NOT NULL AND caption <> '' GROUP BY label "
        "HAVING count(*) > count(DISTINCT caption)), "
        "pl AS (SELECT DISTINCT label, phash FROM lab "
        "WHERE phash IS NOT NULL), "
        "evp AS (SELECT label FROM lab WHERE phash IS NOT NULL "
        "GROUP BY label HAVING count(*) > count(DISTINCT phash) "
        "UNION SELECT DISTINCT p1.label FROM pl p1 JOIN pl p2 "
        "ON p1.label = p2.label AND p1.phash < p2.phash "
        f"AND bit_count(xor(p1.phash, p2.phash)) <= {m}) "
        "SELECT l.image_id, "
        "min(l.image_id) OVER (PARTITION BY l.label) AS cluster_rep, "
        "l.image_id = min(l.image_id) OVER (PARTITION BY l.label) "
        "AS \"keep\", "
        "l.label IN (SELECT label FROM evb) AS ev_byte, "
        "l.label IN (SELECT label FROM evpx) AS ev_pixel, "
        "l.label IN (SELECT label FROM evc) AS ev_caption, "
        "l.label IN (SELECT label FROM evp) AS ev_phash "
        "FROM lab l"
    )


# --- threshold-sensitivity audit: cluster merging across radii ---------------

def cluster_merge_profile(corpus_dir: str, m1: int = 1, m2: int = 2):
    """(n_subclusters, n_clusters): for each pHash near-dup cluster at
    the WIDER radius ``m2``, how many radius-``m1`` clusters it chains
    together — the threshold-sensitivity companion to
    ``phash_distance_histogram`` (which calibrates the radius) and
    ``cluster_diameter_hist`` (which audits chaining at one radius).
    A histogram dominated by n_subclusters=1 says loosening m1 -> m2
    barely changes the partition; a heavy tail says the extra bit of
    distance is fusing previously-distinct duplicate families.

    Scale shape: ONE banding run at the wider radius (the flagship
    chain over DISTINCT phashes: uniq collapse -> counting pre-pass ->
    salted banded LSH -> capped verify) emits the edge list once with
    Hamming distances attached; the m1 graph is a FILTER of that edge
    list (pairs within m1 are a subset of pairs within m2, and
    pigeonhole banding at m2 is exhaustive for both), so the second
    radius costs no second shuffle. Both component maps are
    edge-bounded driver pulls (the flagship CC pattern); the pair
    fold is one lexsort over touched sigs."""
    from humid_ray.util import hamming64

    if not (0 <= m1 < m2):
        raise ValueError("need 0 <= m1 < m2")
    cfg2 = HumidConfig(sources=("phash",), clustering="maximum",
                       max_distance=m2)

    uniq_ds = _phash_uniq_ds(corpus_dir)
    n_uniq = uniq_ds.count()
    empty = pa.table({"n_subclusters": pa.array([], type=pa.int64()),
                      "n_clusters": pa.array([], type=pa.int64())})
    if n_uniq == 0:
        return ray.data.from_arrow(empty)

    def with_dist(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"sig_a": pa.array([], type=pa.int64()),
                             "sig_b": pa.array([], type=pa.int64()),
                             "dist": pa.array([], type=pa.int64())})
        a = t.column("sig_a").to_numpy(zero_copy_only=False).view(UINT64)
        b = t.column("sig_b").to_numpy(zero_copy_only=False).view(UINT64)
        return t.append_column(
            "dist", pa.array(hamming64(a, b).astype(np.int64)))

    edges2 = _edges_with_hot_salting(uniq_ds, cfg2).map_batches(
        with_dist, batch_format="pyarrow").materialize()

    def le_m1(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"sig_a": pa.array([], type=pa.int64()),
                             "sig_b": pa.array([], type=pa.int64())})
        keep = t.filter(pc.less_equal(t.column("dist"), m1))
        return keep.select(["sig_a", "sig_b"])

    comp2 = connected_components(
        edges2.select_columns(["sig_a", "sig_b"]), cfg2)
    comp1 = connected_components(
        edges2.map_batches(le_m1, batch_format="pyarrow"), cfg2)

    def _pull(comp) -> tuple[np.ndarray, np.ndarray]:
        parts = [
            (b.column("sig").to_numpy(zero_copy_only=False),
             b.column("comp").to_numpy(zero_copy_only=False))
            for b in comp.iter_batches(batch_size=65536,
                                       batch_format="pyarrow")
        ]
        if not parts:
            return (np.empty(0, dtype=np.int64),
                    np.empty(0, dtype=np.int64))
        s = np.concatenate([p[0] for p in parts])
        c = np.concatenate([p[1] for p in parts])
        order = np.argsort(s, kind="stable")
        return s[order], c[order]

    s2, c2 = _pull(comp2)
    s1, c1 = _pull(comp1)
    # m1 label of each m2-touched sig (fallback: singleton = own sig)
    l1 = apply_sorted_labels(s1, c1, s2)
    hist: dict[int, int] = {}
    if len(s2):
        order = np.lexsort((l1, c2))
        c2s, l1s = c2[order], l1[order]
        new_pair = np.r_[True, (c2s[1:] != c2s[:-1]) | (l1s[1:] != l1s[:-1])]
        pc2 = c2s[new_pair]  # one row per distinct (comp2, lab1)
        new_lab = np.r_[True, pc2[1:] != pc2[:-1]]
        bounds = np.flatnonzero(np.r_[new_lab, True])
        nsub = np.diff(bounds)
        for k, n in zip(*np.unique(nsub, return_counts=True)):
            hist[int(k)] = hist.get(int(k), 0) + int(n)
    # sigs untouched at m2 are singleton m2 clusters with 1 subcluster
    n_single = n_uniq - len(s2)
    if n_single:
        hist[1] = hist.get(1, 0) + int(n_single)
    ks = sorted(hist)
    return ray.data.from_arrow(pa.table({
        "n_subclusters": pa.array(ks, type=pa.int64()),
        "n_clusters": pa.array([hist[k] for k in ks], type=pa.int64()),
    }))


def cluster_merge_profile_sql(corpus_glob: str, m1: int = 1,
                              m2: int = 2) -> str:
    """DuckDB oracle for ``cluster_merge_profile``: two recursive
    Hamming closures over distinct phash (radii m1 and m2), distinct
    m1-labels per m2-label, histogram."""
    return (
        "WITH RECURSIVE u AS (SELECT phash "
        f"FROM read_parquet('{corpus_glob}') WHERE phash IS NOT NULL), "
        "nodes AS (SELECT DISTINCT phash AS sig FROM u), "
        "e2 AS (SELECT a.sig AS sa, b.sig AS sb FROM nodes a JOIN nodes b "
        f"ON a.sig != b.sig AND bit_count(xor(a.sig, b.sig)) <= {m2}), "
        "e1 AS (SELECT sa, sb FROM e2 "
        f"WHERE bit_count(xor(sa, sb)) <= {m1}), "
        "r2(src, dst) AS (SELECT sig, sig FROM nodes UNION "
        "SELECT r.src, e2.sb FROM r2 r JOIN e2 ON e2.sa = r.dst), "
        "r1(src, dst) AS (SELECT sig, sig FROM nodes UNION "
        "SELECT r.src, e1.sb FROM r1 r JOIN e1 ON e1.sa = r.dst), "
        "c2 AS (SELECT src AS sig, "
        f"xor(min(xor(dst, {_SB})), {_SB}) AS lab2 FROM r2 GROUP BY src), "
        "c1 AS (SELECT src AS sig, "
        f"xor(min(xor(dst, {_SB})), {_SB}) AS lab1 FROM r1 GROUP BY src), "
        "per AS (SELECT c2.lab2, "
        "CAST(count(DISTINCT c1.lab1) AS BIGINT) AS n_subclusters "
        "FROM c2 JOIN c1 ON c1.sig = c2.sig GROUP BY c2.lab2) "
        "SELECT n_subclusters, CAST(count(*) AS BIGINT) AS n_clusters "
        "FROM per GROUP BY n_subclusters"
    )


# --- per-row curation drop report (the keep-list, with reasons) --------------

def image_drop_report(corpus_dir: str):
    """(image_id, keep, drop_reason): the production curation artifact
    — every corpus row tagged with WHY it survives or falls:

    * ``unusable`` — NULL stored phash (undecodable; the flagship's
      usable gate, reference filtered-word semantics src/humid.cc:94-98),
    * ``byte_dup`` — dropped and byte-identical to an earlier-id row,
    * ``near_dup`` — dropped as a non-representative of its pHash
      Hamming<=1 cluster (byte-distinct content),
    * ``kept``    — the cluster representative.

    A pure projection over ``curate_images`` (same clusters, same
    representative rule) plus the unusable rows the keep-list omits —
    the funnel counts of ``tiered_dedup_report_images`` per-row.

    Scale shape: inherits curate_images' (payload never shuffles,
    DISTINCT-phash cluster graph, broadcast/join label auto-switch);
    the unusable side is one shuffle-free metadata scan."""
    curated = curate_images(corpus_dir)

    def project(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"image_id": pa.array([], type=pa.string()),
                             "keep": pa.array([], type=pa.bool_()),
                             "drop_reason": pa.array([], type=pa.string())})
        kept = t.column("keep")
        byte_dup = pc.not_equal(t.column("canonical_id"),
                                t.column("image_id"))
        reason = pc.if_else(
            kept, pa.scalar("kept"),
            pc.if_else(byte_dup, pa.scalar("byte_dup"),
                       pa.scalar("near_dup")))
        return pa.table({"image_id": t.column("image_id"),
                         "keep": kept,
                         "drop_reason": reason})

    def unusable(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"image_id": pa.array([], type=pa.string()),
                             "keep": pa.array([], type=pa.bool_()),
                             "drop_reason": pa.array([], type=pa.string())})
        bad = t.filter(pc.is_null(t.column("phash")))
        n = bad.num_rows
        return pa.table({
            "image_id": bad.column("image_id"),
            "keep": pa.array(np.zeros(n, dtype=bool)),
            "drop_reason": pa.array(["unusable"] * n, type=pa.string()),
        })

    bad_rows = read_corpus(
        corpus_dir, columns=["image_id", "phash"]
    ).map_batches(unusable, batch_format="pyarrow", zero_copy_batch=True)
    return curated.map_batches(
        project, batch_format="pyarrow").union(bad_rows)


def image_drop_report_sql(corpus_glob: str, max_distance: int = 1) -> str:
    """DuckDB oracle for ``image_drop_report``: the curate_images
    closure wrapped in a drop-reason CASE, plus the unusable rows."""
    inner = curate_images_sql(corpus_glob, max_distance)
    return (
        f"WITH curated AS ({inner}) "
        "SELECT image_id, \"keep\", "
        "CASE WHEN \"keep\" THEN 'kept' "
        "WHEN canonical_id <> image_id THEN 'byte_dup' "
        "ELSE 'near_dup' END AS drop_reason FROM curated "
        "UNION ALL "
        "SELECT image_id, FALSE AS \"keep\", 'unusable' AS drop_reason "
        f"FROM read_parquet('{corpus_glob}') WHERE phash IS NULL"
    )


# --- A-axis NEAR-dup: caption SimHash neighbors on the image corpus ----------

def caption_simhash_neardup(corpus_dir: str, max_distance: int = 3):
    """(sig_a, sig_b): distinct unordered pairs of DISTINCT caption
    SimHash values within Hamming <= ``max_distance`` over the image
    corpus — the A-axis NEAR-duplicate finder (caption_collisions and
    the caption tier of fused_dedup_images stop at byte equality; this
    catches paraphrase-level caption reuse). Same 2-token-shingle
    SimHash as the flagship's caption signature source and the
    documents operator (functions/simhash.py), so the DuckDB oracle is
    the existing bit-for-bit HUGEINT SimHash chain re-pointed at the
    caption column.

    Scale shape: the per-batch kernel collapses rows to (image_id,
    simhash); the uniq combiner + groupby moves one row per DISTINCT
    sim value; pairs come from the flagship pigeonhole banding
    (exhaustive at this distance) + in-bucket verify. Captions sharing
    one simhash are exact-dup groups handled by the equality tiers,
    not edges (the flagship's uniq/edges split)."""
    from humid_ray.functions.simhash import (
        shingle_hashes, simhash_from_shingles,
    )
    from humid_ray.functions.text import tokenize_batch
    from humid_ray.stages.exact import unique_signatures
    from humid_ray.stages.lsh import find_edges

    def sim_kernel(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"image_id": pa.array([], type=pa.string()),
                             "sig": pa.array([], type=pa.int64())})
        th, offs = tokenize_batch(batch.column("caption"))
        sh, sh_offs = shingle_hashes(th, offs, 2)
        sim = simhash_from_shingles(sh, sh_offs)
        return pa.table({"image_id": batch.column("image_id"),
                         "sig": u64col(sim)})

    sigs = read_corpus(
        corpus_dir, columns=["image_id", "caption"]
    ).map_batches(sim_kernel, batch_format="pyarrow", zero_copy_batch=True)
    uniq = unique_signatures(sigs)
    cfg = HumidConfig(word_bits=64, max_distance=max_distance)
    out = find_edges(uniq, cfg, None)
    if out.count() == 0:
        # a zero-row Dataset loses its schema through to_pandas; the
        # typed Arrow table keeps (sig_a, sig_b) visible downstream
        return pa.table(
            {"sig_a": pa.array([], type=pa.int64()),
             "sig_b": pa.array([], type=pa.int64())})
    return out


def caption_simhash_neardup_sql(corpus_glob: str,
                                max_distance: int = 3) -> str:
    """DuckDB oracle: the bit-for-bit HUGEINT SimHash chain
    (humid_ray/oracles.py) over the caption column."""
    from humid_ray.oracles import simhash_neardup_sql

    src = (f"(SELECT image_id AS doc_id, caption AS text "
           f"FROM read_parquet('{corpus_glob}'))")
    return simhash_neardup_sql(table=src, max_distance=max_distance)


def caption_simhash_distance_hist(corpus_dir: str, max_distance: int = 6):
    """(dist, n_pairs): Hamming-distance mass over distinct unordered
    caption-SimHash pairs at distance 1..max_distance — the A-axis
    twin of ``phash_distance_histogram`` (threshold calibration for
    ``caption_simhash_neardup``: run once at a wider radius before
    committing the production distance).

    Scale shape: rows collapse to DISTINCT SimHash values first (the
    flagship uniq combiner), pairs come from the pigeonhole banding
    (exhaustive at this radius — no quadratic scan), and the histogram
    is per-batch bincount partials folded driver-side."""
    from humid_ray.functions.simhash import (
        shingle_hashes, simhash_from_shingles,
    )
    from humid_ray.functions.text import tokenize_batch
    from humid_ray.stages.exact import unique_signatures
    from humid_ray.stages.lsh import find_edges
    from humid_ray.util import hamming64

    def sim_kernel(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"image_id": pa.array([], type=pa.string()),
                             "sig": pa.array([], type=pa.int64())})
        th, offs = tokenize_batch(batch.column("caption"))
        sh, sh_offs = shingle_hashes(th, offs, 2)
        sim = simhash_from_shingles(sh, sh_offs)
        return pa.table({"image_id": batch.column("image_id"),
                         "sig": u64col(sim)})

    sigs = read_corpus(
        corpus_dir, columns=["image_id", "caption"]
    ).map_batches(sim_kernel, batch_format="pyarrow", zero_copy_batch=True)
    uniq = unique_signatures(sigs)
    cfg = HumidConfig(word_bits=64, max_distance=max_distance)
    edges = find_edges(uniq, cfg, None)

    acc = np.zeros(max_distance + 1, dtype=np.int64)
    for b in edges.iter_batches(batch_size=65536, batch_format="pyarrow"):
        d = hamming64(
            b.column("sig_a").to_numpy(zero_copy_only=False),
            b.column("sig_b").to_numpy(zero_copy_only=False),
        ).astype(np.int64)
        np.add.at(acc, np.minimum(d, max_distance), np.ones_like(d))
    nz = np.flatnonzero(acc)
    # typed Arrow table, not a Dataset: a zero-row Dataset loses its
    # schema through to_pandas (no pairs at this radius is a real
    # outcome on a clean corpus)
    return pa.table({
        "dist": pa.array(nz.astype(np.int64)),
        "n_pairs": pa.array(acc[nz]),
    })


def caption_simhash_distance_hist_sql(corpus_glob: str,
                                      max_distance: int = 6) -> str:
    """DuckDB oracle: the HUGEINT SimHash chain's pair query at the
    wider radius, aggregated to a distance histogram."""
    from humid_ray.oracles import simhash_neardup_sql

    src = (f"(SELECT image_id AS doc_id, caption AS text "
           f"FROM read_parquet('{corpus_glob}'))")
    inner = simhash_neardup_sql(table=src, max_distance=max_distance)
    return (
        f"WITH pairs AS ({inner}) "
        "SELECT CAST(bit_count(xor(sig_a, sig_b)) AS BIGINT) AS dist, "
        "CAST(count(*) AS BIGINT) AS n_pairs FROM pairs GROUP BY dist"
    )


# --- Hamming-space k-NN over pHash (image-axis similarity search) ------------

_KNN_EMPTY = pa.table({
    "query_id": pa.array([], type=pa.string()),
    "neighbor_id": pa.array([], type=pa.string()),
    "rank": pa.array([], type=pa.int64()),
    "dist": pa.array([], type=pa.int64()),
})


def phash_knn(corpus_dir: str, k: int = 5, n_queries: int = 8):
    """(query_id, neighbor_id, rank, dist): exact Hamming top-k over
    the pHash column for the first ``n_queries`` usable images (by
    image_id) — the image-axis similarity search (the embedding kNN's
    sibling; radius search is the LSH stage, this is ranked retrieval,
    e.g. "find the k most visually similar images to these").
    Deterministic tie-break: (dist asc, neighbor_id asc); the query
    row itself is excluded.

    Scale shape: queries broadcast once via ``ray.put``; every batch
    computes an 8 x B XOR+popcount matrix and emits its LOCAL top-k
    per query (the top-k semigroup — k x blocks x queries rows reach
    the driver, never the corpus). Same partial/merge pattern as
    ann.knn_bruteforce."""
    from humid_ray.util import popcount64

    ds = read_corpus(corpus_dir, columns=["image_id", "phash"])

    def usable(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        return t.filter(pc.is_valid(t.column("phash")))

    ds = ds.map_batches(usable, batch_format="pyarrow",
                        zero_copy_batch=True)

    # first-n_queries selection via the bottom-k semigroup: each batch
    # keeps its n_queries smallest ids, the driver merges — no
    # corpus-wide sort shuffle just to pick 8 query rows
    def head_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"image_id": pa.array([], type=pa.string()),
                             "phash": pa.array([], type=pa.int64())})
        # C-speed bottom-n_queries selection — no Python-object sort
        keep = pc.sort_indices(t.column("image_id"))[:n_queries]
        return t.select(["image_id", "phash"]).take(keep)

    hq, hp = [], []
    for b in ds.map_batches(head_partial, batch_format="pyarrow",
                            zero_copy_batch=True).iter_batches(
            batch_size=65536, batch_format="pyarrow"):
        hq.extend(b.column("image_id").to_pylist())
        hp.extend(b.column("phash").to_pylist())
    if not hq:
        return _KNN_EMPTY
    horder = np.argsort(np.asarray(hq, dtype=object),
                        kind="stable")[:n_queries]
    q_ids = np.asarray(hq, dtype=object)[horder]
    q_ph = np.asarray(hp, dtype=np.int64)[horder].view(UINT64)
    qref = ray.put((q_ids, q_ph))

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _KNN_EMPTY.drop_columns(["rank"])
        qi, qp = ray.get(qref)
        ids = np.asarray(t.column("image_id").to_pylist(), dtype=object)
        ph = np.ascontiguousarray(
            t.column("phash").to_numpy(zero_copy_only=False)).view(UINT64)
        d = popcount64(qp[:, None] ^ ph[None, :]).astype(np.int64)
        out_q, out_n, out_d = [], [], []
        for j in range(len(qi)):
            mask = ids != qi[j]
            cand_ids = ids[mask]
            cand_d = d[j][mask]
            if not len(cand_ids):
                continue
            order = np.lexsort((cand_ids, cand_d))[:k]
            out_q.extend([qi[j]] * len(order))
            out_n.extend(cand_ids[order].tolist())
            out_d.extend(cand_d[order].tolist())
        return pa.table({
            "query_id": pa.array(out_q, type=pa.string()),
            "neighbor_id": pa.array(out_n, type=pa.string()),
            "dist": pa.array(out_d, type=pa.int64()),
        })

    rows_q, rows_n, rows_d = [], [], []
    for b in ds.map_batches(partial, batch_format="pyarrow",
                            zero_copy_batch=True).iter_batches(
            batch_size=65536, batch_format="pyarrow"):
        rows_q.extend(b.column("query_id").to_pylist())
        rows_n.extend(b.column("neighbor_id").to_pylist())
        rows_d.extend(b.column("dist").to_pylist())
    if not rows_q:
        return _KNN_EMPTY
    rq = np.asarray(rows_q, dtype=object)
    rn = np.asarray(rows_n, dtype=object)
    rd = np.asarray(rows_d, dtype=np.int64)
    out_q, out_n, out_r, out_d = [], [], [], []
    for j in range(len(q_ids)):
        mask = rq == q_ids[j]
        if not mask.any():
            continue
        order = np.lexsort((rn[mask], rd[mask]))[:k]
        nn, dd = rn[mask][order], rd[mask][order]
        out_q.extend([q_ids[j]] * len(order))
        out_n.extend(nn.tolist())
        out_r.extend(range(1, len(order) + 1))
        out_d.extend(dd.tolist())
    return pa.table({
        "query_id": pa.array(out_q, type=pa.string()),
        "neighbor_id": pa.array(out_n, type=pa.string()),
        "rank": pa.array(out_r, type=pa.int64()),
        "dist": pa.array(out_d, type=pa.int64()),
    })


def phash_knn_sql(corpus_glob: str, k: int = 5, n_queries: int = 8) -> str:
    """DuckDB oracle for ``phash_knn``: row_number over
    (bit_count asc, neighbor_id asc) per query."""
    return (
        "WITH u AS (SELECT image_id, phash "
        f"FROM read_parquet('{corpus_glob}') WHERE phash IS NOT NULL), "
        f"q AS (SELECT image_id AS qid, phash AS qph FROM u "
        f"ORDER BY image_id LIMIT {n_queries}), "
        "d AS (SELECT q.qid AS query_id, u.image_id AS neighbor_id, "
        "CAST(bit_count(xor(q.qph, u.phash)) AS BIGINT) AS dist "
        "FROM q JOIN u ON u.image_id <> q.qid), "
        "r AS (SELECT *, row_number() OVER (PARTITION BY query_id "
        "ORDER BY dist, neighbor_id) AS rk FROM d) "
        "SELECT query_id, neighbor_id, CAST(rk AS BIGINT) AS rank, dist "
        f"FROM r WHERE rk <= {k}"
    )


# ---------------------------------------------------------------------------
# Leakage-safe training splits + soft dedup weights
# ---------------------------------------------------------------------------

_SPLIT_EMPTY = pa.table({
    "image_id": pa.array([], type=pa.string()),
    "split": pa.array([], type=pa.string()),
})


def cluster_safe_split(corpus_dir: str, val_pct: int = 10,
                       test_pct: int = 10, max_distance: int = 1,
                       n_buckets: int = 100):
    """(image_id, split): leakage-free train/val/test assignment — the
    split key is the pHash near-dup CLUSTER label, not the row, so two
    images within Hamming <= ``max_distance`` can never straddle
    splits (near-duplicate train/eval leakage is the classic
    eval-inflation bug a row-hash split silently commits; HUMID's
    cluster = one identity, src/humid.cc:167-193, so one identity gets
    one split). bucket = splitmix64(cluster_label) % n_buckets:
    < test_pct -> 'test', < test_pct + val_pct -> 'val', else 'train'.
    Rows with a NULL phash carry no detectable pHash-tier near-dup
    risk; they split by their own id digest (``hash_string_column``,
    the incremental-dedup shard-split chain).

    Scale shape: labels come from the flagship chain over DISTINCT
    phashes (counting pre-pass -> salted banding -> capped verify ->
    CC); the broadcast (sig -> label) map is EDGE-BOUNDED (untouched
    singletons fall back to their own phash, which hashes to the same
    bucket everywhere), so the only corpus-sized work is ONE pruned
    (image_id, phash) scan through a shuffle-free kernel."""
    from humid_ray.stages.joins import hash_string_column
    from humid_ray.util import int64_to_uint64, splitmix64

    if not (0 <= test_pct and 0 <= val_pct
            and test_pct + val_pct <= n_buckets):
        raise ValueError("need 0 <= test_pct + val_pct <= n_buckets")
    cfg = HumidConfig(sources=("phash",), clustering="maximum",
                      max_distance=max_distance)
    uniq_ds = _phash_uniq_ds(corpus_dir)
    if uniq_ds.count() == 0:
        ref = ray.put((np.empty(0, dtype=np.int64),
                       np.empty(0, dtype=np.int64)))
    else:
        ref = ray.put(_phash_label_arrays(uniq_ds, cfg))

    nb = np.uint64(n_buckets)

    def kernel(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _SPLIT_EMPTY
        keys, labs = ray.get(ref)
        ph = t.column("phash")
        valid = pc.is_valid(ph).to_numpy(zero_copy_only=False)
        bucket = np.zeros(t.num_rows, dtype=np.uint64)
        if valid.any():
            phv = pc.fill_null(ph, 0).to_numpy(zero_copy_only=False)
            lab = apply_sorted_labels(keys, labs, phv[valid])
            bucket[valid] = splitmix64(int64_to_uint64(lab))
        if not valid.all():
            idh = hash_string_column(t.column("image_id"))
            bucket[~valid] = idh[~valid]
        b = (bucket % nb).astype(np.int64)
        split = np.where(
            b < test_pct, "test",
            np.where(b < test_pct + val_pct, "val", "train"))
        return pa.table({"image_id": t.column("image_id"),
                         "split": pa.array(split.tolist(),
                                           type=pa.string())})

    rows = read_corpus(corpus_dir, columns=["image_id", "phash"])
    return rows.map_batches(kernel, batch_format="pyarrow",
                            zero_copy_batch=True)


def cluster_safe_split_sql(corpus_glob: str, val_pct: int = 10,
                           test_pct: int = 10, max_distance: int = 1,
                           n_buckets: int = 100) -> str:
    """DuckDB oracle for ``cluster_safe_split``: recursive Hamming
    closure -> per-cluster splitmix64 bucket (HUGEINT chain, =
    util.splitmix64); NULL-phash rows bucket by the id-digest chain
    (polynomial byte fold + splitmix64, = joins.hash_string_column)."""
    from humid_ray.oracles import TWO64, _horner_fold, _sm64_cols

    byte_list = (
        "list_transform(range(1, CAST(octet_length(tb) + 1 AS BIGINT)), "
        "jj -> CAST(CAST('0x' || substr(hex(tb), "
        "CAST(2*jj-1 AS INTEGER), 2) AS UBIGINT) AS HUGEINT))"
    )
    lab_u = (f"CASE WHEN label < 0 THEN CAST(label AS HUGEINT) + {TWO64} "
             "ELSE CAST(label AS HUGEINT) END")
    return (
        "WITH RECURSIVE c AS (SELECT image_id, phash "
        f"FROM read_parquet('{corpus_glob}')), "
        "u AS (SELECT image_id, phash FROM c WHERE phash IS NOT NULL), "
        "nodes AS (SELECT DISTINCT phash AS sig FROM u), "
        "e AS (SELECT a.sig AS sa, b.sig AS sb FROM nodes a JOIN nodes b "
        f"ON a.sig != b.sig AND bit_count(xor(a.sig, b.sig)) <= {max_distance}), "
        "reach(src, dst) AS (SELECT sig, sig FROM nodes UNION "
        "SELECT r.src, e.sb FROM reach r JOIN e ON e.sa = r.dst), "
        # CC labels are min-SIGNED members (components._UnionFind keeps
        # the smaller int64 root), so min(dst), NOT the unsigned xor
        # trick the seed-exposing flagship oracles use
        "comp AS (SELECT src AS sig, "
        "min(dst) AS label FROM reach GROUP BY src), "
        "lab AS (SELECT u.image_id, m.label FROM u "
        "JOIN comp m ON m.sig = u.phash), "
        f"lz AS (SELECT image_id, {_sm64_cols(lab_u, 'z')} FROM lab), "
        f"us AS (SELECT image_id, CAST(z % {n_buckets} AS BIGINT) "
        "AS bucket FROM lz), "
        "nn AS (SELECT image_id, encode(image_id) AS tb FROM c "
        "WHERE phash IS NULL), "
        f"braw AS (SELECT image_id, {_horner_fold(byte_list)} AS hraw "
        "FROM nn), "
        f"th AS (SELECT image_id, {_sm64_cols('hraw', 'ih')} FROM braw), "
        f"un AS (SELECT image_id, CAST(ih % {n_buckets} AS BIGINT) "
        "AS bucket FROM th), "
        "allb AS (SELECT * FROM us UNION ALL SELECT * FROM un) "
        f"SELECT image_id, CASE WHEN bucket < {test_pct} THEN 'test' "
        f"WHEN bucket < {test_pct + val_pct} THEN 'val' "
        "ELSE 'train' END AS split FROM allb"
    )


_WEIGHTS_EMPTY = pa.table({
    "image_id": pa.array([], type=pa.string()),
    "cluster_size": pa.array([], type=pa.int64()),
    "weight": pa.array([], type=pa.float64()),
})


def dedup_sample_weights(corpus_dir: str, max_distance: int = 1,
                         broadcast_max_labels: int = 1_000_000):
    """(image_id, cluster_size, weight): SOFT dedup — keep every row
    and down-weight it by its pHash near-dup cluster's total ROW
    population (exact copies included): weight =
    round(1/cluster_size, 6). Training on weighted rows removes
    duplication bias without the hard drop the keep-lists
    (``curate_images``) commit to — the standard alternative when the
    duplicated content is still wanted at reduced influence. Rows
    with a NULL phash carry cluster_size 1 / weight 1.0.

    Scale shape: one pruned (image_id, phash) scan labels rows through
    the EDGE-BOUNDED broadcast map (fallback: own phash); cluster
    sizes are a (label)-keyed row count — a label-bounded exchange.
    The (label -> size) application broadcasts when the label count is
    under ``broadcast_max_labels``, else falls back to one distributed
    left-outer ``Dataset.join`` on the label (``curate_images``'
    switch). Payload bytes are never read."""
    from ray.data.aggregate import Count as _C

    from humid_ray.stages.joins import join_kwargs
    from humid_ray.util import round_half_away

    cfg = HumidConfig(sources=("phash",), clustering="maximum",
                      max_distance=max_distance)
    uniq_ds = _phash_uniq_ds(corpus_dir)
    if uniq_ds.count() == 0:
        ref = ray.put((np.empty(0, dtype=np.int64),
                       np.empty(0, dtype=np.int64)))
    else:
        ref = ray.put(_phash_label_arrays(uniq_ds, cfg))

    lab_empty = pa.table({
        "image_id": pa.array([], type=pa.string()),
        "label": pa.array([], type=pa.int64()),
    })

    def label_rows(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return lab_empty
        keys, labs = ray.get(ref)
        ph = t.column("phash")
        valid = pc.is_valid(ph).to_numpy(zero_copy_only=False)
        phv = pc.fill_null(ph, 0).to_numpy(zero_copy_only=False)
        lab = apply_sorted_labels(keys, labs, phv)
        # NULL-phash rows stay unlabeled (null) -> cluster_size 1
        return pa.table({
            "image_id": t.column("image_id"),
            "label": pa.array(lab, type=pa.int64(), mask=~valid),
        })

    rows = read_corpus(corpus_dir, columns=["image_id", "phash"])
    rows_lab = rows.map_batches(label_rows, batch_format="pyarrow",
                                zero_copy_batch=True).materialize()
    n_rows = rows_lab.count()
    if n_rows == 0:
        return ray.data.from_arrow(_WEIGHTS_EMPTY)

    def labeled_only(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        return t.filter(pc.is_valid(t.column("label")))

    sizes = (rows_lab.map_batches(labeled_only, batch_format="pyarrow",
                                  zero_copy_batch=True)
             .groupby("label").aggregate(_C(alias_name="cluster_size"))
             ).materialize()
    n_labels = sizes.count()

    def finish_bcast(sref):
        def kernel(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return _WEIGHTS_EMPTY
            ls, sz = ray.get(sref)
            lab_col = t.column("label")
            valid = pc.is_valid(lab_col).to_numpy(zero_copy_only=False)
            lab = pc.fill_null(lab_col, 0).to_numpy(zero_copy_only=False)
            size = np.ones(t.num_rows, dtype=np.int64)
            if len(ls):
                pos = np.searchsorted(ls, lab)
                pos[pos == len(ls)] = 0
                hit = (ls[pos] == lab) & valid
                size[hit] = sz[pos[hit]]
            w = round_half_away(1.0 / size)
            return pa.table({"image_id": t.column("image_id"),
                             "cluster_size": pa.array(size),
                             "weight": pa.array(w)})
        return kernel

    if n_labels <= broadcast_max_labels:
        parts = [
            (b.column("label").to_numpy(zero_copy_only=False),
             b.column("cluster_size").to_numpy(zero_copy_only=False))
            for b in sizes.iter_batches(batch_size=65536,
                                        batch_format="pyarrow")
        ]
        if parts:
            ls = np.concatenate([p[0] for p in parts])
            sz = np.concatenate([p[1] for p in parts])
            order = np.argsort(ls, kind="stable")
            ls, sz = ls[order], sz[order]
        else:
            ls = np.empty(0, dtype=np.int64)
            sz = np.empty(0, dtype=np.int64)
        sref = ray.put((ls, sz))
        return rows_lab.map_batches(finish_bcast(sref),
                                    batch_format="pyarrow",
                                    zero_copy_batch=True)

    joined = rows_lab.join(
        sizes, join_type="left_outer", on=("label",),
        **join_kwargs(n_rows, n_labels),
    )

    def finish_join(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _WEIGHTS_EMPTY
        size = pc.fill_null(t.column("cluster_size"), 1).to_numpy(
            zero_copy_only=False).astype(np.int64, copy=False)
        w = round_half_away(1.0 / size)
        return pa.table({"image_id": t.column("image_id"),
                         "cluster_size": pa.array(size),
                         "weight": pa.array(w)})

    return joined.map_batches(finish_join, batch_format="pyarrow")


def dedup_sample_weights_sql(corpus_glob: str,
                             max_distance: int = 1) -> str:
    """DuckDB oracle for ``dedup_sample_weights``: recursive Hamming
    closure -> rows per cluster label -> round(1/size, 6) (DuckDB
    round = half away from zero, matched by util.round_half_away)."""
    return (
        "WITH RECURSIVE c AS (SELECT image_id, phash "
        f"FROM read_parquet('{corpus_glob}')), "
        "u AS (SELECT image_id, phash FROM c WHERE phash IS NOT NULL), "
        "nodes AS (SELECT DISTINCT phash AS sig FROM u), "
        "e AS (SELECT a.sig AS sa, b.sig AS sb FROM nodes a JOIN nodes b "
        f"ON a.sig != b.sig AND bit_count(xor(a.sig, b.sig)) <= {max_distance}), "
        "reach(src, dst) AS (SELECT sig, sig FROM nodes UNION "
        "SELECT r.src, e.sb FROM reach r JOIN e ON e.sa = r.dst), "
        # min-SIGNED label to match components._UnionFind (the value
        # cancels out of this size-only query, but stay consistent)
        "comp AS (SELECT src AS sig, "
        "min(dst) AS label FROM reach GROUP BY src), "
        "lab AS (SELECT u.image_id, m.label FROM u "
        "JOIN comp m ON m.sig = u.phash), "
        "sz AS (SELECT label, CAST(count(*) AS BIGINT) AS cluster_size "
        "FROM lab GROUP BY label), "
        "allr AS (SELECT l.image_id, s.cluster_size "
        "FROM lab l JOIN sz s USING (label) "
        "UNION ALL SELECT image_id, CAST(1 AS BIGINT) "
        "FROM c WHERE phash IS NULL) "
        "SELECT image_id, cluster_size, "
        "round(1.0 / cluster_size, 6) AS weight FROM allr"
    )


_PACK_IMG_EMPTY = pa.table({
    "image_id": pa.array([], type=pa.string()),
    "n_bytes": pa.array([], type=pa.int64()),
    "shard_id": pa.array([], type=pa.int64()),
})


def pack_shards_images(corpus_dir: str, capacity_bytes: int = 1 << 22,
                       n_buckets: int | None = None):
    """(image_id, n_bytes, shard_id): pack the usable images into
    training shards of ``capacity_bytes`` payload bytes, in ascending
    id-DIGEST order — a deterministic seeded permutation, so shards
    are pre-shuffled (the property a training run wants) yet the
    layout is identical at any parallelism and resumable. An image
    lands in the shard holding its first byte (shard_id = exclusive
    prefix-sum of payload length // capacity; oversized payloads own
    their span's start shard). The image-axis sibling of
    ``shards.pack_shards``; compose with the ``image_drop_report``
    keep column upstream to shard a curated corpus.

    Scale shape: the two-phase distributed range scan of
    ``shards._exclusive_scan`` — per-bucket int64 totals to the driver
    (|buckets| rows, the only driver materialization), then per-bucket
    local scans. Payload bytes are measured in-batch and never
    shuffle; the exchange carries (digest, length, id) rows. Order
    ties are digest collisions (~n^2/2^65, the fused-dedup node-id
    bound) — the DuckDB oracle orders by the raw id there and would
    surface one at test scale."""
    from humid_ray.pipelines.shards import N_RANGE_BUCKETS, _exclusive_scan
    from humid_ray.stages.joins import hash_string_column

    if capacity_bytes <= 0:
        raise ValueError("capacity_bytes must be positive")
    nb = N_RANGE_BUCKETS if n_buckets is None else n_buckets

    keyed_empty = pa.table({
        "image_id": pa.array([], type=pa.string()),
        "doc_id": pa.array([], type=pa.int64()),
        "h": pa.array([], type=pa.uint64()),
        "ln": pa.array([], type=pa.int64()),
    })

    def key(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return keyed_empty
        batch = batch.filter(pc.is_valid(batch.column("phash")))
        if batch.num_rows == 0:
            return keyed_empty
        h = hash_string_column(batch.column("image_id"))
        _, offs = _flat_binary(batch.column("bytes"))
        return pa.table({
            "image_id": batch.column("image_id"),
            "doc_id": pa.array(h.view(np.int64)),
            "h": pa.array(h, type=pa.uint64()),
            "ln": pa.array((offs[1:] - offs[:-1]).astype(np.int64)),
        })

    keyed = read_corpus(
        corpus_dir, columns=["image_id", "bytes", "phash"]
    ).map_batches(key, batch_format="pyarrow",
                  zero_copy_batch=True).materialize()
    if keyed.count() == 0:
        return ray.data.from_arrow(_PACK_IMG_EMPTY)

    def finalize(cols, excl):
        return pa.table({
            "image_id": pa.array(cols["image_id"], type=pa.string()),
            "n_bytes": pa.array(cols["ln"].astype(np.int64)),
            "shard_id": pa.array(excl // capacity_bytes),
        })

    return _exclusive_scan(keyed, "h", "ln", nb, finalize,
                           _PACK_IMG_EMPTY)


def pack_shards_images_sql(corpus_glob: str,
                           capacity_bytes: int = 1 << 22) -> str:
    """DuckDB oracle for ``pack_shards_images``: the id-digest chain +
    a running-sum window over (digest, image_id) order."""
    from humid_ray.oracles import _horner_fold, _sm64_cols

    byte_list = (
        "list_transform(range(1, CAST(octet_length(tb) + 1 AS BIGINT)), "
        "jj -> CAST(CAST('0x' || substr(hex(tb), "
        "CAST(2*jj-1 AS INTEGER), 2) AS UBIGINT) AS HUGEINT))"
    )
    return (
        "WITH c AS (SELECT image_id, "
        "CAST(octet_length(bytes) AS BIGINT) AS ln, "
        f"encode(image_id) AS tb FROM read_parquet('{corpus_glob}') "
        "WHERE phash IS NOT NULL), "
        f"braw AS (SELECT image_id, ln, {_horner_fold(byte_list)} "
        "AS hraw FROM c), "
        f"th AS (SELECT image_id, ln, {_sm64_cols('hraw', 'ih')} "
        "FROM braw), "
        "o AS (SELECT image_id, ln, "
        "sum(ln) OVER (ORDER BY ih, image_id "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - ln "
        "AS excl FROM th) "
        "SELECT image_id, ln AS n_bytes, "
        f"CAST(excl // {capacity_bytes} AS BIGINT) AS shard_id FROM o"
    )


# --- per-row invariant audit: PSNR within near-dup clusters -----------------

_MISS = object()  # decode-memo miss sentinel (None = undecodable)

def cluster_psnr_report(corpus_dir: str, max_distance: int = 1,
                        broadcast_max_members: int = 4_000_000):
    """(image_id, cluster_rep, is_rep, decoded, dims_match, pixel_equal,
    psnr): the per-row dedup invariant (decoded-pixel equality for
    lossless formats, PSNR >= 40 dB for lossy re-encodes) surfaced as a
    runtime audit over every NON-SINGLETON pHash Hamming<=max_distance
    cluster — what a production dedup run ships alongside its keep list
    to prove the clusters are perceptually sound. ``psnr`` is vs the
    cluster representative (min image_id), rounded to 3; NULL when the
    pair is pixel-identical (infinite), when dims differ, or when
    either side fails to decode (each case distinguishable from the
    flags). Pinned by planted pytest (lossy re-encode >= 40 dB,
    cross-image pairs far below) — decode is the sandbox codec, so no
    SQL oracle (the multimodal-family convention).

    Scale shape: the member set is dup-bounded (phashes with count >= 2
    plus edge-touched phashes — a small fraction of the corpus by the
    nature of dedup); below ``broadcast_max_members`` the (member phash
    -> label) map broadcasts once and the corpus streams through a
    membership probe; above it (the dup-heavy-100TB case) the labels
    come from the distributed CC and are applied with one inner
    ``Dataset.join`` instead (the curate_images pattern — no
    driver-sized object; the switch decides from COUNTS, never
    materializing the member set it guards against). Either way, ONLY
    member rows' payloads transit the label-bucket exchange that
    co-locates each cluster for decoding (a per-pair join would ship
    the representative's payload once per member instead)."""
    from humid_ray.codecs import image_decoder
    from humid_ray.png import psnr as _psnr

    decode_image = image_decoder()  # codec seam (resolved at build)
    from humid_ray.stages.components import components_from_arrays
    from humid_ray.stages.joins import (apply_sorted_labels, copart_buckets,
                                        key_buckets, sorted_member)
    from humid_ray.util import round_half_away

    cfg = HumidConfig(sources=("phash",), clustering="maximum",
                      max_distance=max_distance)

    rows = read_corpus(corpus_dir, columns=["image_id", "bytes", "phash"])

    def usable(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        return batch.filter(pc.is_valid(batch.column("phash")))

    rows = rows.map_batches(usable, batch_format="pyarrow",
                            zero_copy_batch=True)

    # value-level cluster graph (the curate_images chain, narrow scan)
    uniq_ds = (
        rows.select_columns(["phash"])
        .groupby("phash").aggregate(Count(alias_name="count"))
        .map_batches(
            lambda t: pa.table({"sig": t.column("phash"),
                                "count": t.column("count")}),
            batch_format="pyarrow",
        )
    ).materialize()
    edges = _edges_with_hot_salting(uniq_ds, cfg).materialize()
    multi_ds = uniq_ds.map_batches(
        lambda t: t.filter(pc.greater(t.column("count"), 1))
                   .select(["sig"]),
        batch_format="pyarrow",
    ).materialize()
    n_multi, n_edges = multi_ds.count(), edges.count()
    if n_multi == 0 and n_edges == 0:
        return ray.data.from_arrow(_PSNR_EMPTY)
    # member upper bound WITHOUT a driver pull: every member phash is a
    # multi-count value or an edge endpoint — the switch below must not
    # itself materialize the set it is guarding against
    member_bound = n_multi + 2 * n_edges
    nb = copart_buckets(member_bound * 4)

    _member_empty = pa.table({
        "image_id": pa.array([], type=pa.string()),
        "bytes": pa.array([], type=pa.large_binary()),
        "label": pa.array([], type=pa.int64()),
        "bucket": pa.array([], type=pa.int64()),
    })

    if member_bound <= broadcast_max_members:
        # broadcast path: edge-bounded pull, driver union-find, ONE
        # sorted (member, label) table in the object store
        ea, eb = _pull_edge_cols(edges)
        sigs, comps = components_from_arrays(ea, eb)
        multi_parts = [
            b.column("sig").to_numpy(zero_copy_only=False)
            for b in multi_ds.iter_batches(batch_size=65536,
                                           batch_format="pyarrow")
        ]
        multi = np.concatenate(multi_parts) if multi_parts \
            else np.empty(0, dtype=np.int64)
        member_ph = np.unique(np.concatenate([multi, ea, eb]))
        if not len(member_ph):
            return ray.data.from_arrow(_PSNR_EMPTY)
        order = np.argsort(sigs, kind="stable")
        mref = ray.put((member_ph, sigs[order], comps[order]))

        def tag_members(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return _member_empty
            members, ks, kl = ray.get(mref)
            ph = t.column("phash").to_numpy(zero_copy_only=False)
            keep = sorted_member(members, ph)
            t = t.filter(pa.array(keep))
            if t.num_rows == 0:
                return _member_empty
            lab = apply_sorted_labels(ks, kl, ph[keep])
            return pa.table({
                "image_id": t.column("image_id"),
                "bytes": t.column("bytes").cast(pa.large_binary()),
                "label": pa.array(lab),
                "bucket": pa.array(key_buckets(lab, nb)),
            })

        members_ds = rows.map_batches(tag_members, batch_format="pyarrow",
                                      zero_copy_batch=True)
    else:
        # distributed path (member set above the broadcast ceiling —
        # the dup-heavy-corpus case): distributed CC over the edge
        # Dataset, member labels = CC label for edge-touched phashes /
        # own value for multi-count-only phashes (the same fallback
        # apply_sorted_labels encodes), applied to the corpus with ONE
        # inner Dataset.join on phash — the curate_images label-map
        # join pattern; labels differ in value but not in partition,
        # and only the partition reaches the output (cluster_rep =
        # min image_id per label segment).
        from humid_ray.stages.components import connected_components
        from humid_ray.stages.joins import join_kwargs

        comp = connected_components(edges, cfg).materialize()
        mem = multi_ds.union(
            comp.map_batches(lambda t: t.select(["sig"]),
                             batch_format="pyarrow")
        ).groupby("sig").aggregate(Count(alias_name="_n")).map_batches(
            lambda t: t.select(["sig"]), batch_format="pyarrow"
        )
        labels_ds = mem.join(
            comp, join_type="left_outer", on=("sig",),
            **join_kwargs(member_bound)
        ).map_batches(
            lambda t: pa.table({
                "sig": t.column("sig"),
                "label": pc.coalesce(t.column("comp"), t.column("sig")),
            }),
            batch_format="pyarrow",
        )
        joined = rows.join(
            labels_ds, join_type="inner", on=("phash",),
            right_on=("sig",),
            **join_kwargs(member_bound, bytes_per_row=65536)
        )

        def tag_joined(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return _member_empty
            lab = t.column("label").to_numpy(zero_copy_only=False)
            return pa.table({
                "image_id": t.column("image_id"),
                "bytes": t.column("bytes").cast(pa.large_binary()),
                "label": t.column("label"),
                "bucket": pa.array(key_buckets(lab, nb)),
            })

        members_ds = joined.map_batches(tag_joined, batch_format="pyarrow")

    def audit_bucket(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return _PSNR_EMPTY
        ids = np.asarray(g.column("image_id").to_pylist(), dtype=object)
        lab = g.column("label").to_numpy(zero_copy_only=False)
        payload = g.column("bytes")
        if isinstance(payload, pa.ChunkedArray):
            payload = payload.combine_chunks()

        # per-SEGMENT decode memo: clusters are byte-dup-heavy by
        # construction, and members byte-equal to EACH OTHER (not just
        # to the rep) must not decode repeatedly. Byte-dups can only
        # recur within one label segment (byte-equal payloads share a
        # phash and therefore a label), so the memo is cleared at every
        # segment boundary; within a pathological segment of many LARGE
        # distinct images a cumulative-nbytes cap bounds worker heap
        # (the old entry-count cap could hold gigabytes of ndarrays)
        decoded: dict[bytes, object] = {}
        decoded_nbytes = 0

        def dec(b):
            nonlocal decoded_nbytes
            img = decoded.get(b, _MISS)
            if img is _MISS:
                try:
                    img = decode_image(b)
                except Exception:  # noqa: BLE001 - undecodable -> None
                    img = None
                if decoded_nbytes > 256 << 20:
                    decoded.clear()
                    decoded_nbytes = 0
                decoded[b] = img
                if img is not None:
                    decoded_nbytes += img.nbytes
            return img

        order = np.lexsort((ids, lab))
        out_id, out_rep, out_isrep = [], [], []
        out_dec, out_dm, out_pe, out_ps = [], [], [], []
        i = 0
        n = len(order)
        while i < n:
            j = i
            while j < n and lab[order[j]] == lab[order[i]]:
                j += 1
            seg = order[i:j]
            i = j
            if len(seg) < 2:  # cannot happen (a label is fully
                continue      # co-located and has >= 2 members) — belt
            decoded.clear()   # byte-dups never span label segments
            decoded_nbytes = 0
            rep_row = seg[0]  # ids ascend within the label segment
            rep_id = ids[rep_row]
            rep_bytes = payload[rep_row].as_py()
            rep_img = dec(rep_bytes)
            for r in seg:
                out_id.append(ids[r])
                out_rep.append(rep_id)
                is_rep = r == rep_row
                out_isrep.append(bool(is_rep))
                if is_rep:
                    out_dec.append(rep_img is not None)
                    out_dm.append(rep_img is not None)
                    out_pe.append(rep_img is not None)
                    out_ps.append(None)
                    continue
                mb = payload[r].as_py()
                if mb == rep_bytes:
                    # byte-equal member: decoded pixels ARE the rep's
                    # (the invariant the whole engine rests on) — skip
                    # the decode; flags mirror the rep's decodability
                    out_dec.append(rep_img is not None)
                    out_dm.append(rep_img is not None)
                    out_pe.append(rep_img is not None)
                    out_ps.append(None)
                    continue
                img = dec(mb)
                if img is None or rep_img is None:
                    out_dec.append(img is not None)
                    out_dm.append(False)
                    out_pe.append(False)
                    out_ps.append(None)
                    continue
                out_dec.append(True)
                if img.shape != rep_img.shape:
                    out_dm.append(False)
                    out_pe.append(False)
                    out_ps.append(None)
                    continue
                out_dm.append(True)
                if np.array_equal(img, rep_img):
                    out_pe.append(True)
                    out_ps.append(None)  # infinite
                else:
                    out_pe.append(False)
                    out_ps.append(float(round_half_away(
                        np.array([_psnr(rep_img, img)]), 3)[0]))
        return pa.table({
            "image_id": pa.array(out_id, type=pa.string()),
            "cluster_rep": pa.array(out_rep, type=pa.string()),
            "is_rep": pa.array(out_isrep, type=pa.bool_()),
            "decoded": pa.array(out_dec, type=pa.bool_()),
            "dims_match": pa.array(out_dm, type=pa.bool_()),
            "pixel_equal": pa.array(out_pe, type=pa.bool_()),
            "psnr": pa.array(out_ps, type=pa.float64()),
        })

    return members_ds.groupby("bucket").map_groups(
        audit_bucket, batch_format="pyarrow")


_PSNR_EMPTY = pa.table({
    "image_id": pa.array([], type=pa.string()),
    "cluster_rep": pa.array([], type=pa.string()),
    "is_rep": pa.array([], type=pa.bool_()),
    "decoded": pa.array([], type=pa.bool_()),
    "dims_match": pa.array([], type=pa.bool_()),
    "pixel_equal": pa.array([], type=pa.bool_()),
    "psnr": pa.array([], type=pa.float64()),
})


def _pull_edge_cols(edges_ds) -> tuple[np.ndarray, np.ndarray]:
    """Edge Dataset -> (sig_a, sig_b) int64 arrays (edge-bounded pull)."""
    ea, eb = [], []
    for b in edges_ds.iter_batches(batch_size=65536,
                                   batch_format="pyarrow"):
        ea.append(b.column("sig_a").to_numpy(zero_copy_only=False))
        eb.append(b.column("sig_b").to_numpy(zero_copy_only=False))
    if not ea:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    return np.concatenate(ea), np.concatenate(eb)
