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
    base = int(offs[0])
    for i in range(n):
        d = hashlib.blake2b(
            mv[offs[i] - base:offs[i + 1] - base], digest_size=16
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
                cols = {"image_id": pa.array([], type=pa.string()),
                        "canonical_id": pa.array([], type=pa.string()),
                        "label": pa.array([], type=pa.int64())}
                if _rep_by_size:
                    cols["ln"] = pa.array([], type=pa.int64())
                return pa.table(cols)
            keys, labs = ray.get(ref)
            ph = t.column("phash").to_numpy(zero_copy_only=False)
            lab = ph.astype(np.int64).copy()
            if len(keys):
                pos = np.searchsorted(keys, lab)
                pos[pos == len(keys)] = 0
                hit = keys[pos] == lab
                lab[hit] = labs[pos[hit]]
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
        bc = band_bucket_counts(uniq_ds, cfg)
        hot_tab = bc.map_batches(
            lambda t: t.filter(pc.greater(t.column("n"),
                                          cfg.hot_band_threshold)),
            batch_format="pyarrow",
        ).take_all()
        hot_keys = {(int(r["band_id"]), int(r["band_key"]))
                    for r in hot_tab}
        edges = find_edges(uniq_ds, cfg, hot_keys or None)
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

    bc = band_bucket_counts(uniq_ds, cfg)
    hot_tab = bc.map_batches(
        lambda t: t.filter(pc.greater(t.column("n"), cfg.hot_band_threshold)),
        batch_format="pyarrow",
    ).take_all()
    hot_keys = {(int(r["band_id"]), int(r["band_key"])) for r in hot_tab}
    edges = find_edges(uniq_ds, cfg, hot_keys or None)
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
        lab = sig.copy()
        if len(ks):
            pos = np.searchsorted(ks, sig)
            pos[pos == len(ks)] = 0
            hit = ks[pos] == sig
            lab[hit] = ls[pos[hit]]
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
