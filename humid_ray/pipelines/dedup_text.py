"""Text/document dedup operators over the ``documents`` table.

The HUMID dedup semantics generalized to large-scale training-data
curation: exact dedup (groupby-first), MinHash+LSH near-dup
(shingle -> minhash -> band -> bucket groupby -> verify), SimHash
fingerprints, and n-gram Jaccard verification. All kernels are the
same vectorized primitives the flagship pipeline uses.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data
from ray.data.aggregate import Count, Min, Sum

from humid_ray.functions.minhash import minhash_band_keys, minhash_batch
from humid_ray.functions.simhash import shingle_hashes, simhash_from_shingles
from humid_ray.functions.text import tokenize_batch
from humid_ray.util import UINT64, u64col


def read_documents(sf_dir: str, columns=None):
    return ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=columns)


# --- exact dedup (HUMID T1/A1 analog; SQL-expressible) --------------------

def _partial_exact(batch: pa.Table) -> pa.Table:
    """Per-batch combiner: collapse duplicate texts BEFORE the shuffle
    (same pattern as stages/exact.py:_partial_unique for sigs) — the
    exchange then carries one row per distinct text per block, not one
    per row, which is what keeps the raw-text shuffle affordable on a
    duplicate-heavy corpus."""
    g = batch.select(["text", "doc_id"]).group_by("text").aggregate(
        [("doc_id", "count"), ("doc_id", "min")]
    )
    return pa.table(
        {
            "text": g.column("text"),
            "cnt": g.column("doc_id_count"),
            "rep_id": g.column("doc_id_min"),
        }
    )


def exact_dedup(sf_dir: str):
    """One row per distinct text: (text, cnt, rep_id=min doc_id).

    Oracle: SELECT text, COUNT(*) AS cnt, MIN(doc_id) AS rep_id
            FROM documents GROUP BY text.
    """
    ds = read_documents(sf_dir, columns=["doc_id", "text"])
    partial = ds.map_batches(
        _partial_exact, batch_format="pyarrow", zero_copy_batch=True
    )
    return partial.groupby("text").aggregate(
        Sum("cnt", alias_name="cnt"), Min("rep_id", alias_name="rep_id")
    )


def dup_count_hist(sf_dir: str):
    """Histogram of exact-duplicate multiplicities (counts.dat analog)."""
    return (
        exact_dedup(sf_dir)
        .groupby("cnt")
        .aggregate(Count(alias_name="n"))
    )


def dedup_stats(sf_dir: str):
    """total/usable/unique summary (stats.dat analog) as one row."""
    ds = read_documents(sf_dir, columns=["doc_id", "text"])

    def partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        text = batch.column("text")
        usable = pc.sum(
            pc.cast(pc.greater(pc.utf8_length(pc.fill_null(text, "")), 0), pa.int64())
        ).as_py() or 0
        return pa.table(
            {
                "total": pa.array([batch.num_rows], type=pa.int64()),
                "usable": pa.array([int(usable)], type=pa.int64()),
            }
        )

    totals = ds.map_batches(partial, batch_format="pyarrow").sum(["total", "usable"])
    unique = exact_dedup(sf_dir).count()
    # Dataset.sum yields None per column on an empty dataset
    return pa.table(
        {
            "total": pa.array([int(totals["sum(total)"] or 0)], type=pa.int64()),
            "usable": pa.array([int(totals["sum(usable)"] or 0)], type=pa.int64()),
            "unique": pa.array([int(unique)], type=pa.int64()),
        }
    )


# --- fingerprints ---------------------------------------------------------

class SimHashDocs:
    """Actor kernel: documents -> (doc_id, simhash) (shingle SimHash)."""

    def __init__(self, k: int = 2):
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        th, offs = tokenize_batch(batch.column("text"))
        sh, sh_offs = shingle_hashes(th, offs, self.k)
        sim = simhash_from_shingles(sh, sh_offs)
        return pa.table(
            {"doc_id": batch.column("doc_id"), "simhash": u64col(sim)}
        )


def simhash_docs(sf_dir: str):
    ds = read_documents(sf_dir, columns=["doc_id", "text"])
    return ds.map_batches(SimHashDocs, batch_format="pyarrow", zero_copy_batch=True,
                          concurrency=(1, 4))


class MinHashDocs:
    """documents -> one row per (band, band_key) with doc_id + minhash
    kept for downstream verification."""

    def __init__(self, k: int = 3, n_perms: int = 128, n_bands: int = 16):
        self.k, self.n_perms, self.n_bands = k, n_perms, n_bands

    def __call__(self, batch: pa.Table) -> pa.Table:
        th, offs = tokenize_batch(batch.column("text"))
        sh, sh_offs = shingle_hashes(th, offs, self.k)
        mh = minhash_batch(sh, sh_offs, self.n_perms)
        keys = minhash_band_keys(mh, self.n_bands)  # (n, n_bands)
        n = batch.num_rows
        doc = batch.column("doc_id").to_numpy(zero_copy_only=False)
        bids = np.repeat(np.arange(self.n_bands, dtype=np.int32)[None, :], n, axis=0)
        flat_docs = np.repeat(doc, self.n_bands)
        return pa.table(
            {
                "band_id": pa.array(bids.reshape(-1)),
                "band_key": u64col(keys.reshape(-1)),
                "doc_id": pa.array(flat_docs),
                "minhash": pa.FixedSizeListArray.from_arrays(
                    u64col(np.repeat(mh, self.n_bands, axis=0).reshape(-1)),
                    self.n_perms,
                ),
            }
        )


def _verify_minhash_group(threshold: float):
    def kernel(group: pa.Table) -> pa.Table:
        from humid_ray.stages.lsh import _minhash_of

        empty = pa.table(
            {
                "doc_a": pa.array([], type=pa.int64()),
                "doc_b": pa.array([], type=pa.int64()),
                "jaccard": pa.array([], type=pa.float64()),
            }
        )
        if group.num_rows < 2:
            return empty
        doc = group.column("doc_id").to_numpy(zero_copy_only=False)
        order = np.argsort(doc, kind="stable")
        doc = doc[order]
        keep_first = np.r_[True, doc[1:] != doc[:-1]]
        order = order[keep_first]
        doc = doc[keep_first]
        if len(doc) < 2:
            return empty
        # vectorized FixedSizeList flatten (no per-row .as_py loop)
        mh = _minhash_of(group)[order]
        n, n_perms = mh.shape
        # hot-bucket safety: the n x n x n_perms lane-equality tensor
        # is computed in row chunks so a pathological bucket (every doc
        # sharing one band key) peaks at O(chunk * n * n_perms) memory
        # instead of O(n^2 * n_perms); outputs are identical
        chunk = max(1, min(n, 32_000_000 // max(n * n_perms, 1)))
        out_a, out_b, out_j = [], [], []
        for s in range(0, n, chunk):
            e = min(n, s + chunk)
            sim = (mh[s:e, None, :] == mh[None, :, :]).mean(axis=2)
            ii, jj = np.nonzero(sim >= threshold)
            gi = ii + s
            lt = gi < jj
            out_a.append(doc[gi[lt]].astype(np.int64))
            out_b.append(doc[jj[lt]].astype(np.int64))
            out_j.append(sim[ii[lt], jj[lt]].astype(np.float64))
        return pa.table(
            {
                "doc_a": pa.array(np.concatenate(out_a)),
                "doc_b": pa.array(np.concatenate(out_b)),
                "jaccard": pa.array(np.concatenate(out_j)),
            }
        )

    return kernel


def minhash_neardup_pairs_over(docs, threshold: float = 0.8):
    """minhash_neardup_pairs over an arbitrary (doc_id, text) Dataset
    (e.g. a gated survivor subset — see curate_docs)."""
    bands = docs.map_batches(
        MinHashDocs, batch_format="pyarrow", zero_copy_batch=True, concurrency=(1, 4)
    )
    pairs = bands.groupby(["band_id", "band_key"]).map_groups(
        _verify_minhash_group(threshold), batch_format="pyarrow"
    )
    # a pair can surface from several bands -> distinct
    return pairs.groupby(["doc_a", "doc_b"]).aggregate(
        Min("jaccard", alias_name="jaccard")
    )


def minhash_neardup_pairs(sf_dir: str, threshold: float = 0.8):
    """Candidate pairs from MinHash-LSH buckets, verified by estimated
    Jaccard >= threshold; distinct (doc_a < doc_b) pairs."""
    return minhash_neardup_pairs_over(
        read_documents(sf_dir, columns=["doc_id", "text"]), threshold
    )


def ngram_jaccard_of_text_pairs(texts: pa.Array, k: int) -> np.ndarray:
    """Exact unique-k-shingle Jaccard of text pairs (i, n+i) for a
    2n-element text column, fully vectorized (segment-unique shingles +
    one gathered lexsort for all intersections — no per-pair Python)."""
    from humid_ray.util import pairwise_intersect_sizes, segment_unique

    th, offs = tokenize_batch(texts)
    sh, sh_offs = shingle_hashes(th, offs, k)
    uvals, uoffs = segment_unique(sh, sh_offs)
    n = len(texts) // 2
    ii = np.arange(n, dtype=np.int64)
    jj = n + ii
    starts, ends = uoffs[:-1], uoffs[1:]
    inter = pairwise_intersect_sizes(uvals, starts, ends, ii, jj)
    union = (ends[ii] - starts[ii]) + (ends[jj] - starts[jj]) - inter
    return np.where(union > 0, inter / np.maximum(union, 1), 0.0)


class NgramJaccard:
    """Exact n-gram (token shingle) Jaccard for given doc pairs; the
    verification stage behind minhash_neardup_pairs (broadcast texts).
    Emits the UNROUNDED jaccard — callers filter first and round only
    the surviving output column (matching the SQL oracles'
    WHERE-then-round order)."""

    def __init__(self, text_ref, k: int = 3):
        import ray

        self.texts: dict[int, str] = ray.get(text_ref)
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        a_ids = batch.column("doc_a").to_numpy(zero_copy_only=False)
        b_ids = batch.column("doc_b").to_numpy(zero_copy_only=False)
        texts = pa.array(
            [self.texts.get(int(i), "") for i in a_ids]
            + [self.texts.get(int(i), "") for i in b_ids]
        )
        jac = ngram_jaccard_of_text_pairs(texts, self.k)
        out = batch.select(["doc_a", "doc_b"])
        return out.append_column("ngram_jaccard", pa.array(jac))


def pull_candidate_texts(ds, cand, id_col: str = "doc_id",
                         text_col: str = "text", as_bytes: bool = False):
    """(materialized cand, text_ref or None) — collect the doc ids that
    appear in candidate (doc_a, doc_b) pairs, pull ONLY those texts via
    a vectorized ``pc.is_in`` semi-join (candidates ≪ corpus — the
    whole point of candidate generation; the corpus streams, never the
    driver), and broadcast them once. None when there are no
    candidates."""
    import pyarrow.compute as pc

    import ray

    cand = cand.materialize()
    ids: set[int] = set()
    for b in cand.iter_batches(batch_size=65536, batch_format="pyarrow"):
        ids.update(b.column("doc_a").to_pylist())
        ids.update(b.column("doc_b").to_pylist())
    if not ids:
        return cand, None
    id_arr = pa.array(sorted(ids), type=pa.int64())
    cand_docs = ds.select_columns([id_col, text_col]).map_batches(
        lambda t: t.filter(pc.is_in(t.column(id_col), value_set=id_arr)),
        batch_format="pyarrow",
    )
    texts: dict = {}
    for b in cand_docs.iter_batches(batch_size=65536, batch_format="pyarrow"):
        for d, s in zip(b.column(id_col).to_pylist(), b.column(text_col).to_pylist()):
            texts[int(d)] = (s or "").encode("utf-8") if as_bytes else (s or "")
    return cand, ray.put(texts)


_EMPTY_JACCARD = {
    "doc_a": pa.array([], type=pa.int64()),
    "doc_b": pa.array([], type=pa.int64()),
    "ngram_jaccard": pa.array([], type=pa.float64()),
}

# above this many candidate-side rows the verify stage switches from
# ONE broadcast text dict to two distributed hash joins — a
# boilerplate-heavy corpus at 100 TB can make "candidates" too large
# for a single driver-built object (same switch as
# find_edges_minhash's broadcast/join split, stages/lsh.py)
BROADCAST_MAX_CANDIDATE_IDS = 2_000_000


def count_candidate_ids(cand) -> int:
    """Exact DISTINCT doc-id count of a (doc_a, doc_b) pair table —
    the quantity the broadcast/join switch actually bounds (the
    broadcast dict holds one text per distinct id, not per pair: a
    boilerplate cluster can have 10^6 pairs over 10^3 docs). One small
    groupby over the already-materialized candidate table."""
    from ray.data.aggregate import Count as _Count

    a = cand.map_batches(
        lambda t: pa.table({"i": t.column("doc_a")}), batch_format="pyarrow"
    )
    b = cand.map_batches(
        lambda t: pa.table({"i": t.column("doc_b")}), batch_format="pyarrow"
    )
    return a.union(b).groupby("i").aggregate(_Count(alias_name="n")).count()


def join_candidate_texts(ds, cand, id_col: str = "doc_id",
                         text_col: str = "text",
                         num_partitions: int | None = None):
    """Scale path of ``pull_candidate_texts``: texts reach the pairs
    through two hash joins (pairs ⋈ texts on doc_a, then on doc_b) —
    the candidate id set and the texts never land on the driver or in
    one monolithic broadcast object. Emits the candidate columns plus
    ``text_a``/``text_b``."""
    import ray

    if num_partitions is None:
        cpus = int(ray.cluster_resources().get("CPU", 4))
        num_partitions = max(2, min(64, cpus // 2))
    base = ds.select_columns([id_col, text_col])
    ta = base.rename_columns(["doc_a", "text_a"])
    tb = base.rename_columns(["doc_b", "text_b"])
    j = cand.join(ta, join_type="inner", on=("doc_a",),
                  num_partitions=num_partitions)
    return j.join(tb, join_type="inner", on=("doc_b",),
                  num_partitions=num_partitions)


class NgramJaccardJoined:
    """Exact n-gram Jaccard over pairs whose texts arrived via the
    hash-join path (``text_a``/``text_b`` columns) — same kernel math
    as NgramJaccard, no broadcast dict anywhere."""

    def __init__(self, k: int = 3):
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        if batch.num_rows == 0:
            return pa.table(_EMPTY_JACCARD)
        cat = pa.concat_tables(
            [pa.table({"t": pc.fill_null(batch.column("text_a"), "")}),
             pa.table({"t": pc.fill_null(batch.column("text_b"), "")})]
        )
        jac = ngram_jaccard_of_text_pairs(cat.column("t"), self.k)
        out = batch.select(["doc_a", "doc_b"])
        return out.append_column("ngram_jaccard", pa.array(jac))


def _verify_pairs_exact(cand, sf_dir: str, threshold: float, k: int,
                        round6: bool = False,
                        broadcast_max_ids: int | None = None):
    """Re-verify candidate (doc_a, doc_b) pairs with EXACT n-gram
    Jaccard and filter to >= threshold. Small candidate ID sets verify
    against ONE broadcast text dict; past ``broadcast_max_ids``
    DISTINCT candidate ids the texts are hash-joined to the pairs
    instead — identical outputs, no driver-sized object."""
    if broadcast_max_ids is None:
        broadcast_max_ids = BROADCAST_MAX_CANDIDATE_IDS
    cand = cand.materialize()
    n_pairs = cand.count()
    if n_pairs == 0:
        # zero candidates: empty Ray Data pipelines drop the schema —
        # hand back a typed empty table instead
        return pa.table(_EMPTY_JACCARD)
    docs = read_documents(sf_dir, columns=["doc_id", "text"])
    # distinct ids <= 2 * n_pairs, so a small pair count already proves
    # the broadcast path safe — only pay the distinct-count shuffle
    # near the switch point
    if (n_pairs * 2 > broadcast_max_ids
            and count_candidate_ids(cand) > broadcast_max_ids):
        verified = join_candidate_texts(docs, cand).map_batches(
            NgramJaccardJoined, fn_constructor_kwargs={"k": k},
            batch_format="pyarrow", concurrency=(1, 4),
        )
    else:
        cand, text_ref = pull_candidate_texts(docs, cand)
        if text_ref is None:
            return pa.table(_EMPTY_JACCARD)
        verified = cand.map_batches(
            NgramJaccard,
            fn_constructor_kwargs={"text_ref": text_ref, "k": k},
            batch_format="pyarrow",
            concurrency=(1, 4),
        )
    return verified.map_batches(
        _threshold_then_round(threshold, round6), batch_format="pyarrow"
    )


def _threshold_then_round(threshold: float, round6: bool):
    """Filter on the UNROUNDED jaccard, then round only the emitted
    column — the same WHERE-then-round order as the DuckDB oracle (a
    pair in [threshold-5e-7, threshold) must be dropped, not rounded
    up into the result)."""
    import pyarrow.compute as pc

    def kernel(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater_equal(t.column("ngram_jaccard"), threshold))
        if round6:
            from humid_ray.util import round_half_away

            jac = round_half_away(
                t.column("ngram_jaccard").to_numpy(zero_copy_only=False), 6
            )
            t = t.set_column(
                t.schema.get_field_index("ngram_jaccard"),
                "ngram_jaccard", pa.array(jac),
            )
        return t

    return kernel


def ngram_jaccard_pairs(sf_dir: str, threshold: float = 0.8, k: int = 3,
                        broadcast_max_ids: int | None = None):
    """MinHash-LSH candidates re-verified with EXACT n-gram Jaccard.

    The candidate aggregate is passed un-projected: an empty Ray Data
    aggregate drops its schema, so a select_columns here would crash on
    a candidate-free corpus (the verify kernel projects internally)."""
    cand = minhash_neardup_pairs(sf_dir, threshold=max(0.5, threshold - 0.2))
    return _verify_pairs_exact(cand, sf_dir, threshold, k, round6=True,
                               broadcast_max_ids=broadcast_max_ids)


def simhash_neardup(sf_dir: str, max_distance: int = 3):
    """SimHash near-dup edges over the documents table: distinct
    unordered pairs of DISTINCT simhash values within Hamming <=
    max_distance — the flagship's pigeonhole-banded LSH + salted
    in-bucket verify stage (stages/lsh.py) reused verbatim on another
    64-bit fingerprint column. Returns (sig_a, sig_b) int64 bit
    patterns; docs sharing one simhash are exact-dup groups handled by
    exact dedup, not edges (the flagship's uniq/edges split)."""
    from humid_ray.config import HumidConfig
    from humid_ray.stages.exact import unique_signatures
    from humid_ray.stages.lsh import find_edges

    sigs = simhash_docs(sf_dir).map_batches(
        lambda t: pa.table(
            {"image_id": t.column("doc_id"), "sig": t.column("simhash")}
        ),
        batch_format="pyarrow",
    )
    uniq = unique_signatures(sigs)
    cfg = HumidConfig(word_bits=64, max_distance=max_distance)
    out = find_edges(uniq, cfg, None)
    if out.count() == 0:
        return pa.table(
            {"sig_a": pa.array([], type=pa.int64()),
             "sig_b": pa.array([], type=pa.int64())}
        )
    return out


# --- fuzzy-dedup cluster assignment (flagship CC applied to docs) ---------

# above this many component-member rows the doc->cluster assignment
# switches from one broadcast lookup to a distributed left join — the
# same broadcast/join split as the flagship output stage (outputs.py)
BROADCAST_MAX_COMPONENT_MEMBERS = 4_000_000


def _singleton_clusters(docs):
    """Every doc its own cluster of size 1 (the no-edges degenerate
    case). Non-doc_id columns pass through."""
    def kernel(t: pa.Table) -> pa.Table:
        d = t.column("doc_id")
        cols = {
            "doc_id": d,
            "cluster_id": d,
            "cluster_size": pa.array(np.ones(t.num_rows, dtype=np.int64)),
        }
        for name in t.column_names:
            if name != "doc_id":
                cols[name] = t.column(name)
        return pa.table(cols)

    return docs.map_batches(kernel, batch_format="pyarrow")


class _AssignDocCluster:
    """Broadcast (member -> component label, label -> size) lookup;
    docs outside any component are singletons of themselves."""

    def __init__(self, comp_ref):
        import ray

        self.members, self.labels, self.ulabels, self.usizes = ray.get(comp_ref)

    def __call__(self, t: pa.Table) -> pa.Table:
        d = t.column("doc_id").to_numpy(zero_copy_only=False)
        if len(self.members):
            pos = np.searchsorted(self.members, d)
            pos_c = np.minimum(pos, len(self.members) - 1)
            hit = self.members[pos_c] == d
            cluster = np.where(hit, self.labels[pos_c], d)
            spos = np.searchsorted(self.ulabels, cluster)
            spos_c = np.minimum(spos, len(self.ulabels) - 1)
            size = np.where(
                hit & (self.ulabels[spos_c] == cluster), self.usizes[spos_c], 1
            )
        else:
            cluster = d
            size = np.ones(len(d), dtype=np.int64)
        cols = {
            "doc_id": t.column("doc_id"),
            "cluster_id": pa.array(cluster.astype(np.int64)),
            "cluster_size": pa.array(size.astype(np.int64)),
        }
        for name in t.column_names:
            if name != "doc_id":
                cols[name] = t.column(name)
        return pa.table(cols)


def minhash_clusters_over(docs, threshold: float = 0.8,
                          broadcast_max_members: int | None = None,
                          with_n_tokens: bool = False):
    """minhash_clusters over an arbitrary (doc_id, text) Dataset.
    ``with_n_tokens`` adds an ``n_tokens`` column computed in the same
    streaming pass (no extra exchange) — the quality signal the
    best-representative selection ranks on."""
    from humid_ray.config import HumidConfig
    from humid_ray.stages.components import connected_components

    if broadcast_max_members is None:
        broadcast_max_members = BROADCAST_MAX_COMPONENT_MEMBERS
    # docs is consumed twice (bands, then assignment) — lineage
    # re-execution keeps both passes streaming; never materialized
    pairs = minhash_neardup_pairs_over(docs, threshold=threshold).materialize()
    if with_n_tokens:
        def _ntok(t: pa.Table) -> pa.Table:
            _, offs = tokenize_batch(t.column("text"))
            return pa.table(
                {"doc_id": t.column("doc_id"),
                 "n_tokens": pa.array(
                     (offs[1:] - offs[:-1]).astype(np.int64))}
            )

        docs = docs.map_batches(_ntok, batch_format="pyarrow",
                                zero_copy_batch=True)
    else:
        docs = docs.select_columns(["doc_id"])
    if pairs.count() == 0:
        return _singleton_clusters(docs)
    edges = pairs.map_batches(
        lambda t: pa.table(
            {"sig_a": t.column("doc_a"), "sig_b": t.column("doc_b")}
        ),
        batch_format="pyarrow",
    )
    comp = connected_components(edges, HumidConfig()).materialize()
    if comp.count() > broadcast_max_members:
        return _assign_clusters_joined(docs, comp)
    members_l, labels_l = [], []
    for b in comp.iter_batches(batch_size=262144, batch_format="pyarrow"):
        members_l.append(
            b.column("sig").to_numpy(zero_copy_only=False).astype(np.int64)
        )
        labels_l.append(
            b.column("comp").to_numpy(zero_copy_only=False).astype(np.int64)
        )
    members = np.concatenate(members_l)
    labels = np.concatenate(labels_l)
    order = np.argsort(members, kind="stable")
    members, labels = members[order], labels[order]
    ulabels, usizes = np.unique(labels, return_counts=True)
    import ray

    comp_ref = ray.put((members, labels, ulabels, usizes.astype(np.int64)))
    return docs.map_batches(
        _AssignDocCluster,
        fn_constructor_kwargs={"comp_ref": comp_ref},
        batch_format="pyarrow",
        concurrency=(1, 4),
    )


def minhash_clusters(sf_dir: str, threshold: float = 0.8,
                     broadcast_max_members: int | None = None):
    """Near-dup CLUSTER assignment over documents — the canonical
    fuzzy-dedup composition (the flagship's uniq→edges→CC chain applied
    to the documents table): MinHash-LSH pairs at estimated Jaccard >=
    threshold become edges, connected components label every member
    with the component's min doc_id, and every document gets
    (doc_id, cluster_id, cluster_size); docs with no near-dup edge are
    singletons of themselves.

    Scale shape: the edge list and the component-member table are the
    SMALL side (only near-duplicate docs appear — candidates are a
    sketch, membership is verified); below ``broadcast_max_members``
    the member->label map is broadcast once (ray.put) and the corpus
    streams through one vectorized searchsorted kernel; above it the
    assignment switches to a distributed left join + size groupby
    (no driver-sized object anywhere).
    """
    return minhash_clusters_over(
        read_documents(sf_dir, columns=["doc_id", "text"]),
        threshold=threshold, broadcast_max_members=broadcast_max_members,
    )


def _assign_clusters_joined(docs, comp):
    """Distributed path of minhash_clusters: docs ⟕ components on
    doc_id (nulls -> singleton), then cluster sizes via one small
    groupby joined back on cluster_id."""
    import pyarrow.compute as pc

    import ray
    from ray.data.aggregate import Count as _Count

    cpus = int(ray.cluster_resources().get("CPU", 4))
    nparts = max(2, min(64, cpus // 2))
    labels = comp.map_batches(
        lambda t: pa.table(
            {
                "doc_id": pc.cast(t.column("sig"), pa.int64()),
                "comp_label": pc.cast(t.column("comp"), pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )
    j = docs.join(labels, join_type="left_outer", on=("doc_id",),
                  num_partitions=nparts)

    def resolve(t: pa.Table) -> pa.Table:
        cid = pc.coalesce(t.column("comp_label"), t.column("doc_id"))
        cols = {"doc_id": t.column("doc_id"), "cluster_id": cid}
        for name in t.column_names:
            if name not in ("doc_id", "comp_label"):
                cols[name] = t.column(name)
        return pa.table(cols)

    assigned = j.map_batches(resolve, batch_format="pyarrow").materialize()
    passthrough = [c for c in assigned.schema().names
                   if c not in ("doc_id", "cluster_id")]
    sizes = assigned.groupby("cluster_id").aggregate(_Count(alias_name="cluster_size"))
    out = assigned.join(sizes, join_type="inner", on=("cluster_id",),
                        num_partitions=nparts)
    keep_cols = ["doc_id", "cluster_id", "cluster_size"] + passthrough
    return out.map_batches(
        lambda t: t.select(keep_cols), batch_format="pyarrow"
    )


def minhash_dedup_keep(sf_dir: str, threshold: float = 0.8,
                       broadcast_max_members: int | None = None):
    """The fuzzy-dedup KEEP list: one representative (min doc_id) per
    near-dup cluster, with the cluster size it stands for — what a
    training-data pipeline actually writes out after near-dedup."""
    import pyarrow.compute as pc

    cl = minhash_clusters(sf_dir, threshold=threshold,
                          broadcast_max_members=broadcast_max_members)
    return cl.map_batches(
        lambda t: t.filter(
            pc.equal(t.column("doc_id"), t.column("cluster_id"))
        ).select(["doc_id", "cluster_size"]),
        batch_format="pyarrow",
    )


def minhash_dedup_keep_best(sf_dir: str, threshold: float = 0.8,
                            broadcast_max_members: int | None = None):
    """QUALITY-AWARE fuzzy-dedup keep list: per near-dup cluster, keep
    the member with the MOST tokens (tie -> min doc_id) instead of
    minhash_dedup_keep's arbitrary min-id — the usual production rule
    (drop the truncated / boilerplate copy, keep the content-rich one;
    cf. Lee et al. 2022 keep-longest). Returns (doc_id, cluster_id,
    cluster_size, n_tokens) for the kept representative of every
    cluster. n_tokens is integer-exact, so the argmax is deterministic
    and SQL-oracle-able.

    Scale shape: cluster assignment computes n_tokens in its own
    streaming pass (no extra exchange), then ONE co-partitioning
    exchange buckets rows by hashed cluster_id and a vectorized kernel
    (one lexsort per bucket) takes each cluster's first row — the
    bucket-join pattern (stages/joins.py), never a per-cluster
    map_groups or a driver-sized broadcast."""
    from humid_ray.stages.joins import copart_buckets, key_buckets

    _empty_best = pa.table(
        {"doc_id": pa.array([], type=pa.int64()),
         "cluster_id": pa.array([], type=pa.int64()),
         "cluster_size": pa.array([], type=pa.int64()),
         "n_tokens": pa.array([], type=pa.int64())}
    )
    docs = read_documents(sf_dir, columns=["doc_id", "text"])
    n_docs = docs.count()
    if n_docs == 0:
        # a Ray Data groupby on an empty dataset drops its schema —
        # hand back the typed empty table instead
        return ray.data.from_arrow(_empty_best)
    assigned = minhash_clusters_over(
        docs, threshold=threshold,
        broadcast_max_members=broadcast_max_members, with_n_tokens=True,
    )
    n_buckets = copart_buckets(n_docs)

    def tag(t: pa.Table) -> pa.Table:
        cid = t.column("cluster_id").to_numpy(zero_copy_only=False)
        return t.append_column(
            "bucket", pa.array(key_buckets(cid, n_buckets))
        )

    def best(g: pa.Table) -> pa.Table:
        empty = pa.table(
            {"doc_id": pa.array([], type=pa.int64()),
             "cluster_id": pa.array([], type=pa.int64()),
             "cluster_size": pa.array([], type=pa.int64()),
             "n_tokens": pa.array([], type=pa.int64())}
        )
        if g.num_rows == 0:
            return empty
        cid = g.column("cluster_id").to_numpy(zero_copy_only=False)
        ntok = g.column("n_tokens").to_numpy(zero_copy_only=False)
        did = g.column("doc_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((did, -ntok, cid))
        first = np.r_[True, cid[order][1:] != cid[order][:-1]]
        idx = pa.array(order[first])
        return pa.table(
            {
                "doc_id": g.column("doc_id").take(idx),
                "cluster_id": g.column("cluster_id").take(idx),
                "cluster_size": g.column("cluster_size").take(idx),
                "n_tokens": g.column("n_tokens").take(idx),
            }
        )

    return (
        assigned.map_batches(tag, batch_format="pyarrow",
                             zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(best, batch_format="pyarrow")
    )


def tiered_dedup_report(sf_dir: str, threshold: float = 0.8):
    """The TIER-DEDUP funnel report: how many rows each dedup tier
    keeps and removes. Tier 0 = raw corpus; tier 1 = exact dedup (one
    min-doc_id representative per byte-identical text); tier 2 =
    MinHash-LSH fuzzy dedup among the exact survivors — the standard
    staged production pipeline (cheap exact pass first so the fuzzy
    tier never re-verifies byte-identical copies). Returns one row per
    tier: (tier, name, survivors, removed-at-this-tier).

    Scale shape: counts only — the exact tier is the uniq-table
    groupby the flagship already checkpoints; the fuzzy tier streams
    the survivor set through minhash_clusters_over and counts cluster
    representatives. Nothing corpus-sized ever reaches the driver (the
    result is 3 rows). At 100 TB you would checkpoint the survivor
    table between tiers (state/checkpoints.py) instead of re-deriving
    it by lineage, exactly like the flagship's 02_uniq phase."""
    import pyarrow.compute as _pc

    docs = read_documents(sf_dir, columns=["doc_id", "text"])
    total = docs.count()
    # materialize the survivor set: it is consumed three times (count
    # here, band pass + assignment pass inside minhash_clusters_over),
    # and without this the corpus-wide exact-dedup text shuffle — the
    # funnel's most expensive exchange — would re-execute per consumer
    # via lineage (the in-sandbox stand-in for the per-tier checkpoint
    # the docstring describes)
    reps = exact_dedup(sf_dir).map_batches(
        lambda t: pa.table(
            {"doc_id": t.column("rep_id"), "text": t.column("text")}
        ),
        batch_format="pyarrow",
    ).materialize()
    n_exact = reps.count()
    clusters = minhash_clusters_over(reps, threshold=threshold)
    # cluster label = min member doc_id, so representatives are the
    # rows with doc_id == cluster_id; their count = number of clusters
    n_fuzzy = clusters.map_batches(
        lambda t: t.filter(
            _pc.equal(t.column("doc_id"), t.column("cluster_id"))
        ).select(["doc_id"]),
        batch_format="pyarrow",
    ).count()
    return pa.table(
        {
            "tier": pa.array([0, 1, 2], type=pa.int64()),
            "name": pa.array(["total", "exact", "minhash"],
                             type=pa.string()),
            "survivors": pa.array([total, n_exact, n_fuzzy],
                                  type=pa.int64()),
            "removed": pa.array(
                [0, total - n_exact, n_exact - n_fuzzy], type=pa.int64()
            ),
        }
    )


# --- decontamination against a benchmark shingle set ----------------------

def _bench_overlap(bench: np.ndarray, text_col, k: int):
    """(n_shingles, n_overlap, frac, token_offsets) of each doc's
    DISTINCT k-shingles against the sorted benchmark union — the ONE
    membership/cumsum implementation shared by the decontamination
    scorer and the curation survivor gate (they must agree on what
    counts as contaminated)."""
    from humid_ray.util import segment_unique

    th, offs = tokenize_batch(text_col)
    sh, sh_offs = shingle_hashes(th, offs, k)
    uvals, uoffs = segment_unique(sh, sh_offs)
    if len(bench):
        pos = np.searchsorted(bench, uvals)
        pos_c = np.minimum(pos, len(bench) - 1)
        hit = (bench[pos_c] == uvals).astype(np.int64)
    else:
        hit = np.zeros(len(uvals), dtype=np.int64)
    cs = np.r_[0, np.cumsum(hit)]
    n_overlap = (cs[uoffs[1:]] - cs[uoffs[:-1]]).astype(np.int64)
    n_shingles = (uoffs[1:] - uoffs[:-1]).astype(np.int64)
    frac = np.divide(
        n_overlap.astype(np.float64),
        n_shingles.astype(np.float64),
        out=np.zeros(len(n_shingles), dtype=np.float64),
        where=n_shingles > 0,
    )
    return n_shingles, n_overlap, frac, offs


class _ContamScorer:
    """Per-batch kernel: distinct k-shingle overlap of each training
    doc against the broadcast benchmark shingle union (sorted array +
    searchsorted membership; per-doc counts via offset cumsum — no
    Python in the loop)."""

    def __init__(self, bench_ref, k: int, frac_threshold: float):
        import ray

        self.bench: np.ndarray = ray.get(bench_ref)  # sorted uint64
        self.k, self.frac_threshold = k, frac_threshold

    def __call__(self, t: pa.Table) -> pa.Table:
        from humid_ray.util import round_half_away

        if t.num_rows == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], type=pa.int64()),
                    "n_shingles": pa.array([], type=pa.int64()),
                    "n_overlap": pa.array([], type=pa.int64()),
                    "overlap_frac": pa.array([], type=pa.float64()),
                    "contaminated": pa.array([], type=pa.int64()),
                }
            )
        n_shingles, n_overlap, frac, _ = _bench_overlap(
            self.bench, t.column("text"), self.k
        )
        contaminated = (frac >= self.frac_threshold).astype(np.int64)
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "n_shingles": pa.array(n_shingles),
                "n_overlap": pa.array(n_overlap),
                "overlap_frac": pa.array(round_half_away(frac, 6)),
                "contaminated": pa.array(contaminated),
            }
        )


def bench_shingle_union(docs, bench_mod: int = 20, k: int = 3):
    """ObjectRef of the sorted uint64 union of BENCHMARK documents'
    (doc_id % bench_mod == 0) distinct k-shingle hashes. Eval suites
    are fixed-size (MBs) while the corpus is 100 TB — the union is the
    SMALL side by construction, collected once and broadcast."""
    import ray
    from humid_ray.util import segment_unique

    def bench_shingles(t: pa.Table) -> pa.Table:
        d = t.column("doc_id").to_numpy(zero_copy_only=False)
        t = t.filter(pa.array(d % bench_mod == 0))
        if t.num_rows == 0:
            return pa.table({"fp": pa.array([], type=pa.uint64())})
        th, offs = tokenize_batch(t.column("text"))
        sh, sh_offs = shingle_hashes(th, offs, k)
        uvals, _ = segment_unique(sh, sh_offs)
        return pa.table({"fp": u64col(np.unique(uvals))})

    parts = []
    for b in (
        docs.map_batches(bench_shingles, batch_format="pyarrow")
        .iter_batches(batch_size=262144, batch_format="pyarrow")
    ):
        # u64col stores bit patterns as int64 (Dataset-column rule);
        # view back to uint64 so ordering matches the scorer's uvals
        parts.append(
            b.column("fp").to_numpy(zero_copy_only=False).view(np.uint64)
        )
    bench = (
        np.unique(np.concatenate(parts)) if parts
        else np.empty(0, dtype=np.uint64)
    )
    return ray.put(bench)


def decontaminate(sf_dir: str, bench_mod: int = 20, k: int = 3,
                  frac_threshold: float = 0.2):
    """Benchmark decontamination: for every TRAINING document (doc_id %
    bench_mod != 0), the distinct-k-shingle overlap against the union
    of all BENCHMARK documents' shingles (doc_id % bench_mod == 0 — in
    production this is the held-out eval suite), with ``contaminated``
    flagging overlap_frac >= frac_threshold (compared unrounded; only
    the emitted column is rounded, the repo's WHERE-then-round order).

    Scale shape: the benchmark union broadcasts once via ray.put; the
    corpus streams through one vectorized membership kernel and never
    shuffles.
    """
    docs = read_documents(sf_dir, columns=["doc_id", "text"])
    bench_ref = bench_shingle_union(docs, bench_mod, k)
    train = docs.map_batches(
        lambda t: t.filter(
            pa.array(
                t.column("doc_id").to_numpy(zero_copy_only=False) % bench_mod
                != 0
            )
        ),
        batch_format="pyarrow",
    )
    return train.map_batches(
        _ContamScorer,
        fn_constructor_kwargs={
            "bench_ref": bench_ref, "k": k, "frac_threshold": frac_threshold,
        },
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=(1, 4),
    )


# --- end-to-end curation (the composed training-data pipeline) ------------

class _SurvivorGate:
    """One streaming pass deciding which documents enter dedup:
    quality gates (token count, alpha ratio — both UNROUNDED, the SQL
    oracle's order) + benchmark exclusion + contamination gate against
    the broadcast benchmark shingle union. Emits surviving
    (doc_id, text) rows."""

    def __init__(self, bench_ref, bench_mod: int, k: int,
                 min_tokens: int, min_alpha: float, contam_frac: float):
        import ray

        self.bench: np.ndarray = ray.get(bench_ref)
        self.bench_mod, self.k = bench_mod, k
        self.min_tokens, self.min_alpha = min_tokens, min_alpha
        self.contam_frac = contam_frac

    def __call__(self, t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        d = t.column("doc_id").to_numpy(zero_copy_only=False)
        t = t.filter(pa.array(d % self.bench_mod != 0))
        if t.num_rows == 0:
            return t.select(["doc_id", "text"])
        text = pc.fill_null(t.column("text"), "")
        nchars = pc.utf8_length(text).to_numpy(zero_copy_only=False)
        lower = pc.utf8_lower(text)
        nalpha = pc.utf8_length(
            pc.replace_substring_regex(lower, "[^a-z]", "")
        ).to_numpy(zero_copy_only=False)
        alpha = np.where(nchars > 0, nalpha / np.maximum(nchars, 1), 0.0)
        _, _, frac, offs = _bench_overlap(self.bench, t.column("text"), self.k)
        ntok = (offs[1:] - offs[:-1]).astype(np.int64)
        keep = (
            (ntok >= self.min_tokens)
            & (alpha >= self.min_alpha)
            & (frac < self.contam_frac)
        )
        return t.select(["doc_id", "text"]).filter(pa.array(keep))


def curate_docs(sf_dir: str, min_tokens: int = 30, min_alpha: float = 0.8,
                bench_mod: int = 20, k: int = 3, contam_frac: float = 0.2,
                threshold: float = 0.8,
                broadcast_max_members: int | None = None):
    """The composed curation pipeline a training-data team actually
    runs: quality gates -> benchmark exclusion + decontamination ->
    fuzzy dedup among the SURVIVORS (clusters are computed over the
    gated subset, the production order — removing a bridge doc first
    can split a near-dup component) -> keep list
    (doc_id, cluster_size) of one min-id representative per cluster.

    Every stage streams: the gate is one vectorized pass (benchmark
    union broadcast once), dedup shuffles only MinHash band rows of
    survivors, and CC runs over the (small) verified edge list.
    """
    docs = read_documents(sf_dir, columns=["doc_id", "text"])
    bench_ref = bench_shingle_union(docs, bench_mod, k)
    survivors = docs.map_batches(
        _SurvivorGate,
        fn_constructor_kwargs={
            "bench_ref": bench_ref, "bench_mod": bench_mod, "k": k,
            "min_tokens": min_tokens, "min_alpha": min_alpha,
            "contam_frac": contam_frac,
        },
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=(1, 4),
    )
    cl = minhash_clusters_over(
        survivors, threshold=threshold,
        broadcast_max_members=broadcast_max_members,
    )
    import pyarrow.compute as pc

    return cl.map_batches(
        lambda t: t.filter(
            pc.equal(t.column("doc_id"), t.column("cluster_id"))
        ).select(["doc_id", "cluster_size"]),
        batch_format="pyarrow",
    )


# --- exact all-pairs n-gram Jaccard (prefix filtering) --------------------

class ShinglePrefixIndex:
    """documents -> (fp, doc_id) inverted-index rows over each doc's
    PREFIX shingles only.

    Prefix filtering (Bayardo/Ma/Srikant, WWW 2007 "Scaling Up All
    Pairs Similarity Search"): order each doc's unique shingles by a
    global total order (hash value); two docs with Jaccard >= t must
    share a shingle within their first floor((1-t)*|d|)+1 shingles —
    so indexing only prefixes keeps EXACT recall while pruning the
    bucket shuffle to a small fraction of the shingle mass."""

    def __init__(self, k: int, threshold: float):
        self.k, self.threshold = k, threshold

    def __call__(self, batch: pa.Table) -> pa.Table:
        from humid_ray.util import segment_unique

        th, offs = tokenize_batch(batch.column("text"))
        sh, sh_offs = shingle_hashes(th, offs, self.k)
        uvals, uoffs = segment_unique(sh, sh_offs)
        sizes = uoffs[1:] - uoffs[:-1]
        p = np.minimum(
            np.floor((1.0 - self.threshold) * sizes).astype(np.int64) + 1, sizes
        )
        total = int(p.sum())
        row_ids = np.repeat(np.arange(len(sizes), dtype=np.int64), p)
        within = np.arange(total, dtype=np.int64) - np.repeat(
            np.cumsum(np.r_[0, p[:-1]]), p
        )
        sel = uoffs[:-1][row_ids] + within
        doc = batch.column("doc_id").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "fp": u64col(uvals[sel]),
                "doc_id": pa.array(doc[row_ids].astype(np.int64)),
                # shingle-set size rides along for the size filter
                "size": pa.array(sizes[row_ids], type=pa.int64()),
            }
        )


def _make_prefix_pairer(threshold: float):
    """groupby(fp) kernel -> candidate pairs, size-filtered BEFORE pair
    materialization: docs are sorted by shingle-set size and each doc
    pairs only with the following docs inside its t-ratio window
    (J >= t forces min/max size ratio >= t), so a hot fingerprint never
    allocates the full O(n^2) triangle — only the ratio-passing pairs,
    which are exactly the candidates the lemma requires (recall stays
    exact)."""

    def kernel(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {"doc_a": pa.array([], type=pa.int64()),
             "doc_b": pa.array([], type=pa.int64())}
        )
        if group.num_rows < 2:
            return empty
        doc_all = group.column("doc_id").to_numpy(zero_copy_only=False)
        size_all = group.column("size").to_numpy(zero_copy_only=False)
        doc, first = np.unique(doc_all, return_index=True)
        if len(doc) < 2:
            return empty
        size = size_all[first].astype(np.int64)
        order = np.lexsort((doc, size))
        doc, size = doc[order], size[order]
        n = len(doc)
        # window end per i: last j with size[j] <= size[i] / t
        hi = np.searchsorted(size, size.astype(np.float64) / max(threshold, 1e-9),
                             side="right")
        counts = np.maximum(hi - np.arange(n) - 1, 0)
        total = int(counts.sum())
        if total == 0:
            return empty
        ii = np.repeat(np.arange(n), counts)
        within = np.arange(total, dtype=np.int64) - np.repeat(
            np.cumsum(np.r_[0, counts[:-1]]), counts
        )
        jj = ii + 1 + within
        a, b = doc[ii], doc[jj]
        return pa.table(
            {"doc_a": pa.array(np.minimum(a, b).astype(np.int64)),
             "doc_b": pa.array(np.maximum(a, b).astype(np.int64))}
        )

    return kernel


def ngram_jaccard_exact(sf_dir: str, threshold: float = 0.8, k: int = 3,
                        broadcast_max_ids: int | None = None):
    """ALL document pairs with exact k-token-shingle Jaccard >=
    threshold (doc_a < doc_b, jaccard rounded to 6). Deterministic and
    SQL-oracled: candidates come from a prefix-filtered shingle
    inverted index (exact recall — see ShinglePrefixIndex), then exact
    set-Jaccard verification; no sketches anywhere."""
    from ray.data.aggregate import Count as _Count

    idx = read_documents(sf_dir, columns=["doc_id", "text"]).map_batches(
        ShinglePrefixIndex, fn_constructor_kwargs={"k": k, "threshold": threshold},
        batch_format="pyarrow", zero_copy_batch=True, concurrency=(1, 4),
    )
    pairs = idx.groupby("fp").map_groups(
        _make_prefix_pairer(threshold), batch_format="pyarrow"
    )
    # no select_columns on the aggregate: empty aggregates drop their
    # schema (the verify kernel projects doc_a/doc_b internally)
    cand = pairs.groupby(["doc_a", "doc_b"]).aggregate(_Count(alias_name="_n"))
    return _verify_pairs_exact(cand, sf_dir, threshold, k, round6=True,
                               broadcast_max_ids=broadcast_max_ids)


# --- incremental dedup (new shard vs existing corpus) ----------------------

# shared by incremental_exact_dedup AND incremental_dedup_bloom (they
# share one SQL oracle; a drifting copy would silently diverge them)
_INCR_EMPTY = pa.table(
    {"doc_id": pa.array([], type=pa.int64()),
     "is_dup": pa.array([], type=pa.bool_()),
     "base_rep": pa.array([], type=pa.int64())}
)


def _incr_split_kernel(new_side: bool, new_pct: int, n_buckets: int):
    """Deterministic base/new split: splitmix64(doc_id) % n_buckets."""
    from humid_ray.util import splitmix64

    def kernel(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        d = batch.column("doc_id").to_numpy(zero_copy_only=False)
        b = splitmix64(d.astype(np.int64).view(UINT64)) % UINT64(n_buckets)
        mask = b < new_pct if new_side else b >= new_pct
        return batch.filter(pa.array(mask))

    return kernel


def _incr_novel_rows(batch: pa.Table) -> pa.Table:
    """Rows known novel without a join: is_dup=False, base_rep NULL."""
    return pa.table(
        {"doc_id": batch.column("doc_id"),
         "is_dup": pa.array(np.zeros(batch.num_rows, dtype=bool)),
         "base_rep": pa.nulls(batch.num_rows, type=pa.int64())}
    )


def _incr_finish(batch: pa.Table) -> pa.Table:
    """Left-join output -> (doc_id, is_dup, base_rep)."""
    import pyarrow.compute as pc

    if batch.num_rows == 0:
        return _INCR_EMPTY
    rep = batch.column("base_rep")
    rep = rep.combine_chunks() if isinstance(rep, pa.ChunkedArray) else rep
    return pa.table(
        {"doc_id": batch.column("doc_id"),
         "is_dup": pc.is_valid(rep),
         "base_rep": rep}
    )


def incremental_exact_dedup(sf_dir: str, new_pct: int = 20,
                            n_buckets: int = 100):
    """(doc_id, is_dup, base_rep): dedup NEW arrivals against the
    EXISTING corpus — the daily-crawl shape (a shard arrives; only its
    rows are scored, the base is touched as an index). The base/new
    split here is the deterministic hash split (splitmix64(doc_id) %
    n_buckets < new_pct -> new), standing in for yesterday's corpus vs
    today's shard. A new doc is a dup iff its exact text occurs in the
    base; base_rep is the smallest base doc_id with that text (null
    when novel).

    Scale shape: the base collapses to one (text, rep) row per
    DISTINCT text before anything transits (at scale this is the
    already-checkpointed uniq table — pass 1 of the flagship — so the
    daily run reuses it instead of rescanning the base). Then ONE
    distributed left-outer ``Dataset.join`` co-partitions new rows
    with base reps by text; neither side is collected."""
    from humid_ray.stages.joins import join_kwargs

    docs = read_documents(sf_dir, columns=["doc_id", "text"])
    new = docs.map_batches(_incr_split_kernel(True, new_pct, n_buckets),
                           batch_format="pyarrow", zero_copy_batch=True)
    n_new = new.count()
    if n_new == 0:
        return ray.data.from_arrow(_INCR_EMPTY)
    base = docs.map_batches(_incr_split_kernel(False, new_pct, n_buckets),
                            batch_format="pyarrow", zero_copy_batch=True)
    n_base = base.count()
    if n_base == 0:
        return new.map_batches(_incr_novel_rows, batch_format="pyarrow")
    base_reps = base.groupby("text").aggregate(
        Min("doc_id", alias_name="base_rep")
    )
    # texts are wide: size the hint by observed mean text bytes
    joined = new.join(
        base_reps,
        join_type="left_outer", on=("text",),
        **join_kwargs(n_new, n_base, bytes_per_row=1024),
    )
    return joined.map_batches(_incr_finish, batch_format="pyarrow")


def incremental_exact_dedup_sql(table: str = "documents",
                                new_pct: int = 20,
                                n_buckets: int = 100) -> str:
    """DuckDB oracle for ``incremental_exact_dedup`` (splitmix64 split
    in HUGEINT arithmetic + text-equality left join)."""
    from humid_ray.oracles import _sm64_cols

    return (
        f"WITH sm AS (SELECT doc_id, "
        f"{_sm64_cols('CAST(doc_id AS HUGEINT)', 'z')} FROM {table}), "
        f"split AS (SELECT d.doc_id, d.text, "
        f"(z % {n_buckets} < {new_pct}) AS is_new "
        f"FROM {table} d JOIN sm USING (doc_id)), "
        "base AS (SELECT text, min(doc_id) AS base_rep FROM split "
        "WHERE NOT is_new GROUP BY text) "
        "SELECT s.doc_id, b.base_rep IS NOT NULL AS is_dup, b.base_rep "
        "FROM split s LEFT JOIN base b USING (text) WHERE s.is_new"
    )


def incremental_dedup_bloom(sf_dir: str, new_pct: int = 20,
                            n_buckets: int = 100, bits_per_key: int = 16,
                            n_hashes: int = 4):
    """``incremental_exact_dedup`` with a broadcast BLOOM pre-filter:
    the base's text hashes build a mergeable bitset (per-batch OR
    partials, double-hashing h1 + i*h2), `ray.put` once; new rows that
    miss ANY bit are novel immediately and never enter the join — only
    Bloom-positive rows (true dups + ~0.1% FPs at 16 bits/key) reach
    the exact text join, which remains the correctness backstop, so
    the output is IDENTICAL to the join-only path (same DuckDB
    oracle). No false negatives by construction.

    Scale shape: for a mostly-novel daily shard this prunes the join's
    build side shuffle to the dup fraction. The single broadcast bitset
    fits base corpora to ~10^10 texts (16 bits/key = 2 GB per 10^9);
    beyond that, partition the filter by text-hash range or fall back
    to ``incremental_exact_dedup``'s plain join."""
    import pyarrow.compute as pc

    from humid_ray.stages.joins import hash_string_column, join_kwargs
    from humid_ray.util import UINT64, splitmix64

    docs = read_documents(sf_dir, columns=["doc_id", "text"])
    new = docs.map_batches(_incr_split_kernel(True, new_pct, n_buckets),
                           batch_format="pyarrow", zero_copy_batch=True)
    base = docs.map_batches(_incr_split_kernel(False, new_pct, n_buckets),
                            batch_format="pyarrow", zero_copy_batch=True)
    # the ONLY full pre-pass: n_base sizes the filter. (An empty `new`
    # side flows through every kernel and yields the empty result; no
    # count pass is spent proving it first.)
    n_base = base.count()
    if n_base == 0:
        return new.map_batches(_incr_novel_rows, batch_format="pyarrow")

    m_bits = 1 << max(10, int(np.ceil(np.log2(bits_per_key * n_base))))
    mask = UINT64(m_bits - 1)

    def _positions(texts) -> tuple[np.ndarray, np.ndarray]:
        h1 = hash_string_column(texts)
        h2 = splitmix64(h1)
        return h1, h2

    def bloom_partial(batch: pa.Table) -> pa.Table:
        # emit the batch's SET-BIT POSITIONS (deduped), not a full
        # bitset: a partial is <= rows x n_hashes x 8 bytes regardless
        # of filter size, where a per-batch bitset would ship
        # m_bits/8 bytes per batch (2 GB per batch at the documented
        # 10^9-key ceiling)
        if batch.num_rows == 0:
            pos = np.empty(0, dtype=UINT64)
        else:
            h1, h2 = _positions(batch.column("text"))
            pos = np.unique(np.concatenate(
                [(h1 + UINT64(i) * h2) & mask for i in range(n_hashes)]
            ))
        return pa.table({"pos": pa.array([pos.tobytes()], type=pa.binary())})

    # set the merged positions driver-side (one bitset, like the IVF
    # centroids); total transfer ~ distinct positions, never rows
    bloom = np.zeros(m_bits // 64, dtype=np.uint64)
    for b in (base.map_batches(bloom_partial, batch_format="pyarrow",
                               zero_copy_batch=True)
              .iter_batches(batch_size=1024, batch_format="pyarrow")):
        for v in b.column("pos"):
            pos = np.frombuffer(v.as_py(), dtype=UINT64)
            np.bitwise_or.at(
                bloom, (pos >> UINT64(6)).astype(np.int64),
                UINT64(1) << (pos & UINT64(63)),
            )
    bloom_ref = ray.put(bloom)

    class BloomTag:
        def __init__(self):
            self.bits = ray.get(bloom_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                return batch.append_column("_pos", pa.array([], type=pa.bool_()))
            h1, h2 = _positions(batch.column("text"))
            hit = np.ones(batch.num_rows, dtype=bool)
            for i in range(n_hashes):
                pos = (h1 + UINT64(i) * h2) & mask
                word = self.bits[(pos >> UINT64(6)).astype(np.int64)]
                hit &= (word >> (pos & UINT64(63))) & UINT64(1) != 0
            return batch.append_column("_pos", pa.array(hit))

    tagged = new.map_batches(BloomTag, batch_format="pyarrow",
                             zero_copy_batch=True, concurrency=(1, 8))
    # tagged feeds BOTH branches and `cand` is additionally counted
    # and joined: without a checkpoint the read+split+BloomTag lineage
    # re-executes per consumer (~4 corpus scans). `cand` is the
    # Bloom-positive slice — by construction the small dup fraction —
    # so materializing IT is cheap; `novel` (the big side) stays lazy
    # and re-derives from one tagged pass at final consumption.
    novel = tagged.map_batches(
        lambda t: _incr_novel_rows(
            t.filter(pc.invert(t.column("_pos").combine_chunks()
                               if isinstance(t.column("_pos"), pa.ChunkedArray)
                               else t.column("_pos")))),
        batch_format="pyarrow",
    )
    cand = tagged.map_batches(
        lambda t: t.filter(t.column("_pos")).drop_columns(["_pos"]),
        batch_format="pyarrow",
    ).materialize()
    n_cand = cand.count()
    if n_cand == 0:
        return novel
    base_reps = base.groupby("text").aggregate(
        Min("doc_id", alias_name="base_rep")
    )
    joined = cand.join(
        base_reps, join_type="left_outer", on=("text",),
        **join_kwargs(n_cand, n_base, bytes_per_row=1024),
    )
    return joined.map_batches(_incr_finish,
                              batch_format="pyarrow").union(novel)


_INCR_MH_EMPTY = pa.table(
    {"doc_id": pa.array([], type=pa.int64()),
     "is_dup": pa.array([], type=pa.bool_()),
     "base_rep": pa.array([], type=pa.int64()),
     "jaccard": pa.array([], type=pa.float64())}
)


def _verify_minhash_cross(threshold: float):
    """Per-(band, band_key) bucket kernel for the incremental fuzzy
    path: verify NEW docs against BASE docs only (never new x new or
    base x base — incremental dedup scores arrivals, it does not
    re-dedup either side). Same chunked lane-equality tensor as
    ``_verify_minhash_group`` so a hot bucket stays memory-bounded."""
    from humid_ray.stages.lsh import _minhash_of

    empty = pa.table(
        {"doc_id": pa.array([], type=pa.int64()),
         "base_doc": pa.array([], type=pa.int64()),
         "jaccard": pa.array([], type=pa.float64())}
    )

    def _side_rows(doc: np.ndarray, idx: np.ndarray) -> np.ndarray:
        if not len(idx):  # np.r_[True, ...] would index the empty array
            return idx
        order = idx[np.argsort(doc[idx], kind="stable")]
        keep = np.r_[True, doc[order][1:] != doc[order][:-1]]
        return order[keep]

    def kernel(group: pa.Table) -> pa.Table:
        if group.num_rows < 2:
            return empty
        doc = group.column("doc_id").to_numpy(zero_copy_only=False)
        side = group.column("side").to_numpy(zero_copy_only=False)
        ni = _side_rows(doc, np.flatnonzero(side == 1))
        bi = _side_rows(doc, np.flatnonzero(side == 0))
        if not len(ni) or not len(bi):
            return empty
        mh = _minhash_of(group)
        mn, mb = mh[ni], mh[bi]
        dn, db = doc[ni], doc[bi]
        n_perms = mh.shape[1]
        chunk = max(1, min(len(ni), 32_000_000 // max(len(bi) * n_perms, 1)))
        out_n, out_b, out_j = [], [], []
        for s in range(0, len(ni), chunk):
            e = min(len(ni), s + chunk)
            sim = (mn[s:e, None, :] == mb[None, :, :]).mean(axis=2)
            ii, jj = np.nonzero(sim >= threshold)
            out_n.append(dn[ii + s].astype(np.int64))
            out_b.append(db[jj].astype(np.int64))
            out_j.append(sim[ii, jj].astype(np.float64))
        return pa.table(
            {"doc_id": pa.array(np.concatenate(out_n)),
             "base_doc": pa.array(np.concatenate(out_b)),
             "jaccard": pa.array(np.concatenate(out_j))}
        )

    return kernel


def incremental_minhash_dedup(sf_dir: str, threshold: float = 0.8,
                              new_pct: int = 20, n_buckets: int = 100):
    """(doc_id, is_dup, base_rep, jaccard): FUZZY incremental dedup —
    score NEW arrivals against the EXISTING corpus by MinHash-LSH
    near-duplication, the operation a production pipeline runs when a
    fresh crawl shard lands (its boilerplate-mutated copies of base
    documents won't be byte-identical, so ``incremental_exact_dedup``
    misses them). A new doc is a dup iff it shares >= 1 full LSH band
    with some base doc at estimated Jaccard >= threshold; base_rep is
    the smallest matching base doc_id and jaccard the lane-equality
    estimate against it (both NULL for novel rows). The base/new split
    is the same deterministic splitmix64(doc_id) hash split as the
    exact variant.

    Scale shape: both sides band with the streaming ``MinHashDocs``
    kernel (at 100 TB the base's band table is the checkpointed
    artifact of yesterday's run — only the shard is re-banded), ONE
    (band, key) co-shuffle brings candidates together, and the bucket
    kernel verifies new x base ONLY with the chunked lane-equality
    tensor. Per-new-doc representative selection is a hash-bucketed
    lexsort kernel (the keep_best pattern); novel rows join back via
    one distributed left-outer join — nothing corpus-sized is
    collected."""
    from humid_ray.stages.joins import (copart_buckets, join_kwargs,
                                        key_buckets)

    docs = read_documents(sf_dir, columns=["doc_id", "text"])
    # both splits are consumed more than once (count + banding, and
    # the new side again as the join's left): materialize each so the
    # corpus read + splitmix64 split doesn't re-execute per consumer
    # via lineage (the in-sandbox stand-in for the checkpointed split
    # the docstring describes; the Bloom variant does the same)
    new = docs.map_batches(_incr_split_kernel(True, new_pct, n_buckets),
                           batch_format="pyarrow",
                           zero_copy_batch=True).materialize()
    n_new = new.count()
    if n_new == 0:
        return ray.data.from_arrow(_INCR_MH_EMPTY)
    base = docs.map_batches(_incr_split_kernel(False, new_pct, n_buckets),
                            batch_format="pyarrow",
                            zero_copy_batch=True).materialize()
    n_base = base.count()

    def _tag(side_val: int):
        def kernel(t: pa.Table) -> pa.Table:
            return t.append_column(
                "side", pa.array(np.full(t.num_rows, side_val,
                                         dtype=np.int8))
            )

        return kernel

    def _novel_mh(t: pa.Table) -> pa.Table:
        return _incr_novel_rows(t).append_column(
            "jaccard", pa.nulls(t.num_rows, type=pa.float64())
        )

    if n_base == 0:
        return new.map_batches(_novel_mh, batch_format="pyarrow")
    new_bands = new.map_batches(
        MinHashDocs, batch_format="pyarrow", zero_copy_batch=True,
        concurrency=(1, 4),
    ).map_batches(_tag(1), batch_format="pyarrow", zero_copy_batch=True)
    base_bands = base.map_batches(
        MinHashDocs, batch_format="pyarrow", zero_copy_batch=True,
        concurrency=(1, 4),
    ).map_batches(_tag(0), batch_format="pyarrow", zero_copy_batch=True)
    pairs = new_bands.union(base_bands).groupby(
        ["band_id", "band_key"]
    ).map_groups(_verify_minhash_cross(threshold), batch_format="pyarrow")
    # a pair can surface from several bands (same estimate each time);
    # the per-new-doc rep is min base_doc — one bucketed lexsort kernel
    nb = copart_buckets(n_new)

    def _bucket(t: pa.Table) -> pa.Table:
        d = t.column("doc_id").to_numpy(zero_copy_only=False)
        return t.append_column("bucket", pa.array(key_buckets(d, nb)))

    def _rep(g: pa.Table) -> pa.Table:
        empty = pa.table(
            {"doc_id": pa.array([], type=pa.int64()),
             "base_rep": pa.array([], type=pa.int64()),
             "jaccard": pa.array([], type=pa.float64())}
        )
        if g.num_rows == 0:
            return empty
        d = g.column("doc_id").to_numpy(zero_copy_only=False)
        b = g.column("base_doc").to_numpy(zero_copy_only=False)
        order = np.lexsort((b, d))
        first = np.r_[True, d[order][1:] != d[order][:-1]]
        idx = pa.array(order[first])
        return pa.table(
            {"doc_id": g.column("doc_id").take(idx),
             "base_rep": g.column("base_doc").take(idx),
             "jaccard": g.column("jaccard").take(idx)}
        )

    reps = (
        pairs.map_batches(_bucket, batch_format="pyarrow",
                          zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(_rep, batch_format="pyarrow")
    ).materialize()
    # size the join by the ACTUAL reps count: a mostly-novel shard has
    # few (or zero) dup rows, and partition count keyed to n_new would
    # leave right-side partitions empty — the acero crash
    # join_partitions' docstring warns about
    n_reps = reps.count()
    if n_reps == 0:
        return new.map_batches(_novel_mh, batch_format="pyarrow")
    joined = new.select_columns(["doc_id"]).join(
        reps, join_type="left_outer", on=("doc_id",),
        **join_kwargs(n_new, n_reps, bytes_per_row=32),
    )

    def _finish(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _INCR_MH_EMPTY
        jac = t.column("jaccard")
        jac = jac.combine_chunks() if isinstance(jac, pa.ChunkedArray) else jac
        # shared left-join finalization (doc_id, is_dup, base_rep) +
        # this operator's jaccard column
        return _incr_finish(t.select(["doc_id", "base_rep"])).append_column(
            "jaccard", jac
        )

    return joined.map_batches(_finish, batch_format="pyarrow")


def incremental_minhash_dedup_sql(table: str = "documents",
                                  threshold: float = 0.8,
                                  new_pct: int = 20,
                                  n_buckets: int = 100,
                                  n_perms: int = 128,
                                  n_bands: int = 16) -> str:
    """DuckDB oracle for ``incremental_minhash_dedup``: the MinHash
    machinery re-derived in HUGEINT SQL (oracles._minhash_pair_ctes),
    restricted to pairs crossing the splitmix64 new/base split; rep =
    min matching base doc, jaccard = that pair's equal-lane fraction
    (exactly representable in float64 on both sides)."""
    from humid_ray.oracles import _minhash_pair_ctes, _sm64_cols

    return (
        f"WITH {_minhash_pair_ctes(table, n_perms, n_bands)}, "
        f"sm AS (SELECT doc_id, "
        f"{_sm64_cols('CAST(doc_id AS HUGEINT)', 'z')} FROM {table}), "
        f"split AS (SELECT doc_id, (z % {n_buckets} < {new_pct}) AS is_new "
        "FROM sm), "
        "xp AS (SELECT CASE WHEN sa.is_new THEN m.da ELSE m.db END AS nd, "
        "CASE WHEN sa.is_new THEN m.db ELSE m.da END AS bd, m.neq "
        "FROM mhagg m JOIN split sa ON sa.doc_id = m.da "
        "JOIN split sb2 ON sb2.doc_id = m.db "
        f"WHERE m.sb = 1 AND CAST(m.neq AS DOUBLE) / {n_perms} >= "
        f"{threshold} AND sa.is_new <> sb2.is_new), "
        "rep AS (SELECT nd, min(bd) AS base_rep FROM xp GROUP BY nd), "
        "repj AS (SELECT r.nd, r.base_rep, "
        f"CAST(max(x.neq) AS DOUBLE) / {n_perms} AS jaccard "
        "FROM rep r JOIN xp x ON x.nd = r.nd AND x.bd = r.base_rep "
        "GROUP BY r.nd, r.base_rep) "
        "SELECT s.doc_id, j.base_rep IS NOT NULL AS is_dup, "
        "j.base_rep, j.jaccard "
        "FROM split s LEFT JOIN repj j ON j.nd = s.doc_id WHERE s.is_new"
    )


def dup_rate_by_source(sf_dir: str):
    """(source, n_docs, n_dup_docs): per-source duplication report —
    for every source, how many of its documents' texts also appear
    elsewhere in the corpus (count > 1 across ALL sources). The
    crawl-health metric that tells you WHICH feed is pumping
    boilerplate before you pay for a full dedup pass.

    Scale shape: join-free. The per-batch combiner collapses to
    distinct (text, source) rows with counts, the text groupby sees
    collapsed partials only, and each text group emits one
    (source, n, is-dup share) row per member source — a second tiny
    groupby(source) sums them. Shuffle volume = distinct
    (text, source) pairs, never raw duplicate rows."""
    from ray.data.aggregate import Sum as _Sum

    _empty_pairs = pa.table(
        {"text": pa.array([], type=pa.string()),
         "source": pa.array([], type=pa.string()),
         "c": pa.array([], type=pa.int64())}
    )

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _empty_pairs
        import pyarrow.compute as pc

        # NULLs normalize to '' on BOTH sides (the oracle coalesces):
        # Ray's sort-based groupby cannot partition None keys, and SQL
        # JOIN USING(text) would silently drop null-text rows
        g = pa.table(
            {"text": pc.fill_null(
                pc.cast(batch.column("text"), pa.string()), ""),
             "source": pc.fill_null(
                 pc.cast(batch.column("source"), pa.string()), "")}
        ).group_by(["text", "source"]).aggregate([("source", "count")])
        return pa.table(
            {"text": g.column("text"), "source": g.column("source"),
             "c": g.column("source_count").cast(pa.int64())}
        )

    _empty_out = pa.table(
        {"source": pa.array([], type=pa.string()),
         "n_docs": pa.array([], type=pa.int64()),
         "n_dup_docs": pa.array([], type=pa.int64())}
    )

    def per_text(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return _empty_out
        # partials of the same (text, source) may arrive from several
        # batches: collapse first, then share the group total
        m = g.group_by(["text", "source"]).aggregate([("c", "sum")])
        c = m.column("c_sum").to_numpy(zero_copy_only=False).astype(np.int64)
        total = int(c.sum())
        return pa.table(
            {"source": m.column("source"),
             "n_docs": pa.array(c),
             "n_dup_docs": pa.array(c if total > 1
                                    else np.zeros(len(c), dtype=np.int64))}
        )

    return (
        read_documents(sf_dir, columns=["text", "source"])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("text")
        .map_groups(per_text, batch_format="pyarrow")
        .groupby("source")
        .aggregate(_Sum("n_docs", alias_name="n_docs"),
                   _Sum("n_dup_docs", alias_name="n_dup_docs"))
    )


def dup_rate_by_source_sql(table: str = "documents") -> str:
    """DuckDB oracle for ``dup_rate_by_source``."""
    return (
        f"WITH t AS (SELECT coalesce(source, '') AS source, "
        f"coalesce(text, '') AS text, CAST(count(*) AS BIGINT) AS c "
        f"FROM {table} GROUP BY 1, 2), "
        "tot AS (SELECT text, SUM(c) AS tc FROM t GROUP BY 1) "
        "SELECT source, CAST(SUM(c) AS BIGINT) AS n_docs, "
        "CAST(SUM(CASE WHEN tc > 1 THEN c ELSE 0 END) AS BIGINT) "
        "AS n_dup_docs FROM t JOIN tot USING (text) GROUP BY source"
    )


def cluster_safe_split_docs(sf_dir: str, val_pct: int = 10,
                            test_pct: int = 10, threshold: float = 0.8,
                            n_buckets: int = 100):
    """(doc_id, split): leakage-free train/val/test over documents —
    the split key is the MinHash near-dup CLUSTER id from
    ``minhash_clusters`` (min doc_id of the component), so two
    documents at estimated Jaccard >= threshold never straddle splits.
    bucket = splitmix64(cluster_id) % n_buckets: < test_pct -> 'test',
    < test_pct + val_pct -> 'val', else 'train'. The B-axis sibling of
    ``images.cluster_safe_split``.

    Scale shape: inherits minhash_clusters' — the component map is the
    small (near-dup-bounded) side; the split kernel is a shuffle-free
    per-batch projection."""
    import pyarrow.compute as pc

    from humid_ray.util import int64_to_uint64, splitmix64

    if not (0 <= test_pct and 0 <= val_pct
            and test_pct + val_pct <= n_buckets):
        raise ValueError("need 0 <= test_pct + val_pct <= n_buckets")
    assigned = minhash_clusters(sf_dir, threshold=threshold)

    def kernel(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"doc_id": pa.array([], type=pa.int64()),
                             "split": pa.array([], type=pa.string())})
        cid = t.column("cluster_id").to_numpy(zero_copy_only=False)
        b = (splitmix64(int64_to_uint64(cid))
             % np.uint64(n_buckets)).astype(np.int64)
        split = np.where(
            b < test_pct, "test",
            np.where(b < test_pct + val_pct, "val", "train"))
        return pa.table({"doc_id": t.column("doc_id"),
                         "split": pa.array(split.tolist(),
                                           type=pa.string())})

    return assigned.map_batches(kernel, batch_format="pyarrow")


def cluster_safe_split_docs_sql(table: str = "documents",
                                val_pct: int = 10, test_pct: int = 10,
                                threshold: float = 0.8,
                                n_buckets: int = 100) -> str:
    """DuckDB oracle for ``cluster_safe_split_docs``: the minhash
    cluster closure + the HUGEINT splitmix64 bucket chain."""
    from humid_ray.oracles import (TWO64, _minhash_cluster_ctes,
                                   _sm64_cols)

    cid_u = ("CASE WHEN cluster_id < 0 THEN CAST(cluster_id AS HUGEINT) "
             f"+ {TWO64} ELSE CAST(cluster_id AS HUGEINT) END")
    return (
        f"{_minhash_cluster_ctes(table, threshold)}, "
        f"lz AS (SELECT doc_id, {_sm64_cols(cid_u, 'z')} FROM compsz) "
        f"SELECT doc_id, CASE WHEN z % {n_buckets} < {test_pct} "
        f"THEN 'test' WHEN z % {n_buckets} < {test_pct + val_pct} "
        "THEN 'val' ELSE 'train' END AS split FROM lz"
    )


def dedup_sample_weights_docs(sf_dir: str, threshold: float = 0.8):
    """(doc_id, cluster_size, weight): soft dedup over documents —
    weight = round(1/cluster_size, 6) by the MinHash near-dup cluster's
    row population (``minhash_clusters`` sizes). The B-axis sibling of
    ``images.dedup_sample_weights``: keep every document, de-bias the
    duplication instead of dropping it."""
    from humid_ray.util import round_half_away

    assigned = minhash_clusters(sf_dir, threshold=threshold)

    def kernel(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"doc_id": pa.array([], type=pa.int64()),
                             "cluster_size": pa.array([], type=pa.int64()),
                             "weight": pa.array([], type=pa.float64())})
        size = t.column("cluster_size").to_numpy(zero_copy_only=False)
        w = round_half_away(1.0 / size)
        return pa.table({"doc_id": t.column("doc_id"),
                         "cluster_size": t.column("cluster_size"),
                         "weight": pa.array(w)})

    return assigned.map_batches(kernel, batch_format="pyarrow")


def dedup_sample_weights_docs_sql(table: str = "documents",
                                  threshold: float = 0.8) -> str:
    """DuckDB oracle for ``dedup_sample_weights_docs``."""
    from humid_ray.oracles import _minhash_cluster_ctes

    return (
        f"{_minhash_cluster_ctes(table, threshold)} "
        "SELECT doc_id, cluster_size, "
        "round(1.0 / cluster_size, 6) AS weight FROM compsz"
    )


# --- multi-evidence fused dedup (document axis) ----------------------------

def fused_dedup_docs(sf_dir: str, threshold: float = 0.8,
                     simhash_distance: int = 3,
                     broadcast_max_labels: int = 1_000_000):
    """(doc_id, cluster_rep, keep, ev_exact, ev_minhash, ev_simhash):
    multi-evidence fused dedup over documents — the document twin of
    images.fused_dedup_images: docs are ONE identity when ANY evidence
    tier links them (transitively):

    * ``exact``   — identical text (NULL treated as empty string),
    * ``minhash`` — >= 1 shared LSH band AND estimated MinHash Jaccard
      >= ``threshold`` (the minhash_neardup_docs pair rule),
    * ``simhash`` — SimHash within Hamming <= ``simhash_distance``,
      equal values included.

    ``cluster_rep`` = min doc_id of the fused cluster, ``keep`` one row
    per cluster; ``ev_*`` are CLUSTER-level flags: tier t is true iff
    some tier-t edge is internal to the cluster.

    Scale shape: text never transits an exchange for the equality tier
    (it hashes in-batch and clique-CONTRACTS to member->group-min star
    edges — one bucket exchange of int64 columns); the simhash tier
    runs the flagship counting-pre-pass + salted banded LSH over
    DISTINCT simhash values and maps its edge list to per-value
    representative docs through an edge-bounded pull, plus equal-value
    star edges; the minhash tier is the verified LSH pair stage (pairs
    are doc-level already). ONE connected-components pass over the
    union (auto local/distributed); the doc->label map and the three
    evidence label sets are edge-bounded and broadcast once via
    ``ray.put`` below ``broadcast_max_labels``, else applied with the
    distributed-join pattern of curate_images. Text-equality grouping
    uses a 64-bit in-batch hash (collision ~n^2/2^65; the DuckDB
    oracle groups by the raw text and would surface one at test
    scale)."""
    import ray

    from humid_ray.config import HumidConfig
    from humid_ray.pipelines.images import (  # shared fused-dedup kernels
        _distinct_i64, _edges_to_node_space, _edges_with_hot_salting,
        _star_edges, _uniq_with_min_node,
    )
    from humid_ray.stages.components import connected_components
    from humid_ray.stages.joins import (apply_sorted_labels, copart_buckets,
                                        hash_string_column, join_kwargs,
                                        key_buckets, sorted_member)
    from humid_ray.util import splitmix64

    nb_eq = UINT64(256)
    sim_kernel = SimHashDocs()

    _narrow_empty = pa.table({
        "node": pa.array([], type=pa.int64()),
        "text_h": pa.array([], type=pa.int64()),
        "tb": pa.array([], type=pa.int64()),
        "simhash": pa.array([], type=pa.int64()),
        "shb": pa.array([], type=pa.int64()),
    })

    def narrow(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _narrow_empty
        import pyarrow.compute as pc

        th = hash_string_column(pc.fill_null(batch.column("text"), ""))
        sh = sim_kernel(batch).column("simhash") \
            .to_numpy(zero_copy_only=False)
        return pa.table({
            "node": batch.column("doc_id"),
            "text_h": u64col(th),
            "tb": pa.array((th % nb_eq).astype(np.int64)),
            "simhash": pa.array(sh),
            "shb": pa.array((splitmix64(sh.view(UINT64)) % nb_eq)
                            .astype(np.int64)),
        })

    docs = read_documents(sf_dir, columns=["doc_id", "text"])
    # one narrow projection, four consumers (two equality tiers, the
    # simhash uniq collapse, the final labeling); the minhash tier
    # re-reads the source text independently (streaming lineage)
    rows = docs.map_batches(narrow, batch_format="pyarrow",
                            zero_copy_batch=True).materialize()

    stars_ex = _star_edges(
        rows.select_columns(["node", "text_h", "tb"]),
        ("text_h",), "tb").materialize()
    stars_sh = _star_edges(
        rows.select_columns(["node", "simhash", "shb"]),
        ("simhash",), "shb").materialize()

    # DISTINCT-simhash uniq collapse carrying a representative node,
    # then simhash VALUE edges -> representative-node space (both
    # shared fused-dedup helpers; everything edge-bounded)
    uniq_sh = _uniq_with_min_node(
        rows.select_columns(["node", "simhash"]), "simhash")
    sh_cfg = HumidConfig(word_bits=64, max_distance=simhash_distance)
    sh_edges = _edges_with_hot_salting(
        uniq_sh.select_columns(["sig", "count"]), sh_cfg)
    na, nbv = _edges_to_node_space(sh_edges, uniq_sh)
    sh_node_edges = ray.data.from_arrow(pa.table(
        {"sig_a": pa.array(na), "sig_b": pa.array(nbv)}))

    # minhash tier: verified doc-level pairs (the oracled pair rule)
    mh_pairs = minhash_neardup_pairs(sf_dir, threshold=threshold)

    def _mh_edge_cols(t: pa.Table) -> pa.Table:
        # an empty Ray Data aggregate drops its schema — emit the typed
        # empty instead of projecting columns that aren't there
        if t.num_rows == 0:
            return pa.table({"sig_a": pa.array([], type=pa.int64()),
                             "sig_b": pa.array([], type=pa.int64())})
        return pa.table({"sig_a": t.column("doc_a"),
                         "sig_b": t.column("doc_b")})

    mh_edges = mh_pairs.map_batches(
        _mh_edge_cols, batch_format="pyarrow").materialize()

    all_edges = stars_ex.union(stars_sh, sh_node_edges, mh_edges)
    comp = connected_components(all_edges, HumidConfig()).materialize()
    n_labels = comp.count()

    centers_by_tier = (
        _distinct_i64(stars_ex, "sig_b"),
        np.unique(np.concatenate([
            _distinct_i64(mh_edges, "sig_a"),
            _distinct_i64(mh_edges, "sig_b")])),
        np.unique(np.concatenate([
            _distinct_i64(stars_sh, "sig_b"), na, nbv])),
    )

    nbk = copart_buckets(rows.count())
    narrow_ids = rows.select_columns(["node"])

    _labeled_empty = pa.table({"doc_id": pa.array([], type=pa.int64()),
                               "label": pa.array([], type=pa.int64()),
                               "bucket": pa.array([], type=pa.int64())})

    if n_labels <= broadcast_max_labels:
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

        ev_sets = [np.unique(apply_sorted_labels(csig, clab, c))
                   for c in centers_by_tier]
        mref = ray.put((csig, clab))

        def label_kernel(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return _labeled_empty
            ks, kl = ray.get(mref)
            node = t.column("node").to_numpy(zero_copy_only=False)
            lab = apply_sorted_labels(ks, kl, node)
            return pa.table({"doc_id": t.column("node"),
                             "label": pa.array(lab),
                             "bucket": pa.array(key_buckets(lab, nbk))})

        labeled = narrow_ids.map_batches(label_kernel,
                                         batch_format="pyarrow")
    else:
        joined = narrow_ids.join(
            comp, join_type="left_outer", on=("node",),
            right_on=("sig",), **join_kwargs(n_labels))

        def fill(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            if t.num_rows == 0:
                return _labeled_empty
            lab = pc.coalesce(t.column("comp"), t.column("node")) \
                .to_numpy(zero_copy_only=False)
            return pa.table({"doc_id": t.column("node"),
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
    ref = ray.put((ev_sets[0], ev_sets[1], ev_sets[2]))

    _out_empty = pa.table({"doc_id": pa.array([], type=pa.int64()),
                           "cluster_rep": pa.array([], type=pa.int64()),
                           "keep": pa.array([], type=pa.bool_()),
                           "ev_exact": pa.array([], type=pa.bool_()),
                           "ev_minhash": pa.array([], type=pa.bool_()),
                           "ev_simhash": pa.array([], type=pa.bool_())})

    def rep_bucket(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return _out_empty
        evx, evm, evs = ray.get(ref)
        ids = g.column("doc_id").to_numpy(zero_copy_only=False)
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
        return pa.table({
            "doc_id": g.column("doc_id"),
            "cluster_rep": pa.array(rep),
            "keep": pa.array(ids == rep),
            "ev_exact": pa.array(sorted_member(evx, lab)),
            "ev_minhash": pa.array(sorted_member(evm, lab)),
            "ev_simhash": pa.array(sorted_member(evs, lab)),
        })

    return (
        labeled.groupby("bucket")
        .map_groups(rep_bucket, batch_format="pyarrow")
    )
