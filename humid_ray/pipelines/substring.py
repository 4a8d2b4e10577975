"""Substring-level duplicate detection (suffix-array-class dedup).

Finds every document pair sharing a byte-level substring of length
>= ``min_len`` and the exact length of the longest shared span —
the substring dedup of Lee et al. 2022, expressed Ray-Data-first:
a distributed suffix array is an all-to-all sort over the corpus,
so instead winnowed k-gram fingerprints (see functions/winnow.py for
the detection-guarantee argument) feed a groupby-sized shuffle:

    map_batches(winnow) -> groupby(fp) cross-doc candidate seeds
    -> greedy seed extension against the candidate texts
    -> groupby(pair).max(length)

Soundness: every emitted span is byte-verified. Completeness: the
winnowing guarantee puts a shared fingerprint at the SAME relative
offset inside any shared span of length >= w + k - 1 = min_len, and
extension from that seed recovers the span maximally, so ``max_len``
equals the true longest-common-substring length whenever it is
>= min_len (pinned against an O(n*m) LCS oracle in
tests/test_substring.py).

Scale shape: the corpus streams once through the winnow kernel (flat
numpy over batch bytes); the fingerprint shuffle moves ~len/w rows per
doc (not the text); only CANDIDATE texts (candidates ≪ corpus) are
pulled via a vectorized semi-join and broadcast once for extension.
Hot fingerprints (boilerplate) are capped per bucket — caps are
reported via ``hot_fp_stats``, not silently dropped.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

from ray.data.aggregate import Count, Max

from humid_ray.functions.winnow import kgram_hashes, string_bytes, winnow_select
from humid_ray.pipelines.dedup_text import read_documents
from humid_ray.util import u64col


class WinnowFingerprints:
    """Actor kernel: documents -> (doc_id, pos, fp) winnowed k-gram
    fingerprints. Rows shorter than min_len contribute nothing (they
    cannot hold a qualifying span)."""

    def __init__(self, k: int, w: int, id_col: str = "doc_id", text_col: str = "text"):
        self.k, self.w = k, w
        self.id_col, self.text_col = id_col, text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        data, offsets = string_bytes(batch.column(self.text_col))
        hashes, h_offsets = kgram_hashes(data, offsets, self.k)
        rows, pos, fp = winnow_select(hashes, h_offsets, self.w)
        ids = batch.column(self.id_col)
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        return pa.table(
            {
                "doc_id": ids.take(pa.array(rows)),
                "pos": pa.array(pos, type=pa.int64()),
                "fp": u64col(fp),
            }
        )


def _make_pairer(max_docs_per_fp: int, max_pos_per_doc: int):
    """groupby(fp) kernel: cross-doc candidate seed pairs
    (doc_a, pos_a, doc_b, pos_b), doc_a < doc_b."""

    def kernel(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "doc_a": pa.array([], type=pa.int64()),
                "pos_a": pa.array([], type=pa.int64()),
                "doc_b": pa.array([], type=pa.int64()),
                "pos_b": pa.array([], type=pa.int64()),
            }
        )
        if group.num_rows < 2:
            return empty
        doc = group.column("doc_id").to_numpy(zero_copy_only=False)
        pos = group.column("pos").to_numpy(zero_copy_only=False)
        order = np.lexsort((pos, doc))
        doc, pos = doc[order], pos[order]
        # cap positions per doc (internal repetition), then docs per fp
        # (boilerplate); hot_fp_stats reports what the caps touch
        new_doc = np.r_[True, doc[1:] != doc[:-1]]
        rank_in_doc = np.arange(len(doc)) - np.maximum.accumulate(
            np.where(new_doc, np.arange(len(doc)), -1)
        )
        keep = rank_in_doc < max_pos_per_doc
        doc, pos = doc[keep], pos[keep]
        uniq_docs = np.unique(doc)
        if len(uniq_docs) < 2:
            return empty
        if len(uniq_docs) > max_docs_per_fp:
            cutoff = uniq_docs[max_docs_per_fp]
            m = doc < cutoff
            doc, pos = doc[m], pos[m]
        n = len(doc)
        ii, jj = np.triu_indices(n, k=1)
        cross = doc[ii] != doc[jj]
        ii, jj = ii[cross], jj[cross]
        return pa.table(
            {
                "doc_a": pa.array(doc[ii].astype(np.int64)),
                "pos_a": pa.array(pos[ii], type=pa.int64()),
                "doc_b": pa.array(doc[jj].astype(np.int64)),
                "pos_b": pa.array(pos[jj], type=pa.int64()),
            }
        )

    return kernel


def winnow_fingerprints_ds(ds, min_len: int, k: int,
                           id_col: str = "doc_id", text_col: str = "text"):
    w = min_len - k + 1
    if w < 1:
        raise ValueError("min_len must be >= k")
    cols = ds.select_columns([id_col, text_col])
    return cols.map_batches(
        WinnowFingerprints,
        fn_constructor_kwargs={"k": k, "w": w, "id_col": id_col, "text_col": text_col},
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=(1, 8),
    )


def hot_fp_stats(ds, min_len: int, k: int, threshold: int = 64):
    """(fp, n) for fingerprint buckets at/above ``threshold`` rows —
    the buckets the pairer's caps may touch (lineage: no silent caps)."""
    import pyarrow.compute as pc

    counts = (
        winnow_fingerprints_ds(ds, min_len, k)
        .groupby("fp")
        .aggregate(Count(alias_name="n"))
    )
    return counts.map_batches(
        lambda t: t.filter(pc.greater_equal(t.column("n"), threshold)),
        batch_format="pyarrow",
    )


def _extend_spans(da, db, pa_, pb_, text_of_a, text_of_b, k: int,
                  min_len: int) -> pa.Table:
    """Shared seed-extension loop: the seed k-gram is byte-checked
    (hash collisions rejected), then extended greedily left and right
    — ``os.path.commonprefix`` runs at C speed."""
    out_a, out_b, sa_, sb_, ln_ = [], [], [], [], []
    for i in range(len(da)):
        a = text_of_a(i)
        b = text_of_b(i)
        if a is None or b is None:
            continue
        x, y = int(pa_[i]), int(pb_[i])
        if a[x : x + k] != b[y : y + k]:
            continue  # fingerprint hash collision
        right = len(os.path.commonprefix([a[x + k :], b[y + k :]]))
        left = len(os.path.commonprefix([a[:x][::-1], b[:y][::-1]]))
        length = left + k + right
        if length < min_len:
            continue
        out_a.append(int(da[i]))
        out_b.append(int(db[i]))
        sa_.append(x - left)
        sb_.append(y - left)
        ln_.append(length)
    return pa.table(
        {
            "doc_a": pa.array(out_a, type=pa.int64()),
            "doc_b": pa.array(out_b, type=pa.int64()),
            "start_a": pa.array(sa_, type=pa.int64()),
            "start_b": pa.array(sb_, type=pa.int64()),
            "length": pa.array(ln_, type=pa.int64()),
        }
    )


class SpanExtender:
    """Candidate seed pairs -> byte-verified maximal spans >= min_len.
    Texts arrive as one broadcast dict (candidate docs only)."""

    def __init__(self, text_ref, k: int, min_len: int):
        import ray

        self.texts: dict[int, bytes] = ray.get(text_ref)
        self.k, self.min_len = k, min_len

    def __call__(self, batch: pa.Table) -> pa.Table:
        da = batch.column("doc_a").to_numpy(zero_copy_only=False)
        db = batch.column("doc_b").to_numpy(zero_copy_only=False)
        pa_ = batch.column("pos_a").to_numpy(zero_copy_only=False)
        pb_ = batch.column("pos_b").to_numpy(zero_copy_only=False)
        return _extend_spans(
            da, db, pa_, pb_,
            lambda i: self.texts.get(int(da[i])),
            lambda i: self.texts.get(int(db[i])),
            self.k, self.min_len,
        )


class SpanExtenderJoined:
    """Scale path of SpanExtender: texts arrive per pair via the two
    hash joins of ``join_candidate_texts`` (``text_a``/``text_b``
    columns) — no broadcast dict; same extension loop, byte offsets
    into the utf-8 encoding exactly as the winnow kernel hashed them."""

    def __init__(self, k: int, min_len: int):
        self.k, self.min_len = k, min_len

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(_EMPTY_SPANS)
        da = batch.column("doc_a").to_numpy(zero_copy_only=False)
        db = batch.column("doc_b").to_numpy(zero_copy_only=False)
        pa_ = batch.column("pos_a").to_numpy(zero_copy_only=False)
        pb_ = batch.column("pos_b").to_numpy(zero_copy_only=False)
        ta = [(s or "").encode("utf-8") for s in batch.column("text_a").to_pylist()]
        tb = [(s or "").encode("utf-8") for s in batch.column("text_b").to_pylist()]
        return _extend_spans(
            da, db, pa_, pb_, lambda i: ta[i], lambda i: tb[i],
            self.k, self.min_len,
        )


def substring_spans(ds, min_len: int = 32, k: int = 8,
                    max_docs_per_fp: int = 64, max_pos_per_doc: int = 4,
                    id_col: str = "doc_id", text_col: str = "text",
                    broadcast_max_ids: int | None = None):
    """Byte-verified duplicated spans (doc_a, doc_b, start_a, start_b,
    length >= min_len); one row per surviving seed (spans repeat when
    several seeds land inside them — aggregate downstream). Small
    candidate ID sets extend against ONE broadcast text dict; past
    ``broadcast_max_ids`` DISTINCT candidate ids texts are hash-joined
    to the seed pairs instead — identical outputs, no driver-sized
    object. (The switch counts distinct ids, not pairs: a boilerplate
    cluster has quadratically many pairs over a small doc set, and the
    broadcast dict holds one text per DOC.)"""
    import ray.data

    from humid_ray.pipelines.dedup_text import (
        BROADCAST_MAX_CANDIDATE_IDS,
        count_candidate_ids,
        join_candidate_texts,
        pull_candidate_texts,
    )

    if broadcast_max_ids is None:
        broadcast_max_ids = BROADCAST_MAX_CANDIDATE_IDS
    fps = winnow_fingerprints_ds(ds, min_len, k, id_col, text_col)
    cand = fps.groupby("fp").map_groups(
        _make_pairer(max_docs_per_fp, max_pos_per_doc), batch_format="pyarrow"
    )
    cand = cand.materialize()
    n_pairs = cand.count()
    if n_pairs == 0:
        # typed empty DATASET (a schema-less empty pipeline would lose
        # the doc_a/doc_b/... columns downstream)
        return ray.data.from_arrow(pa.table(_EMPTY_SPANS))
    # distinct ids <= 2 * n_pairs: a small pair count proves broadcast
    # safe without paying the distinct-count shuffle
    if (n_pairs * 2 > broadcast_max_ids
            and count_candidate_ids(cand) > broadcast_max_ids):
        joined = join_candidate_texts(ds, cand, id_col, text_col)
        return joined.map_batches(
            SpanExtenderJoined,
            fn_constructor_kwargs={"k": k, "min_len": min_len},
            batch_format="pyarrow",
            concurrency=(1, 4),
        )
    cand, text_ref = pull_candidate_texts(ds, cand, id_col, text_col, as_bytes=True)
    if text_ref is None:
        return ray.data.from_arrow(pa.table(_EMPTY_SPANS))
    return cand.map_batches(
        SpanExtender,
        fn_constructor_kwargs={"text_ref": text_ref, "k": k, "min_len": min_len},
        batch_format="pyarrow",
        concurrency=(1, 4),
    )


_EMPTY_SPANS = {
    c: pa.array([], type=pa.int64())
    for c in ("doc_a", "doc_b", "start_a", "start_b", "length")
}


def substring_dedup_sql(min_len: int = 32) -> str:
    """DuckDB oracle for ``substring_dedup_pairs``: the true
    longest-common-substring length per doc pair, restricted to pairs
    whose LCS is >= min_len — computed without the winnowing machinery.

    Method: explode every length-``min_len`` gram of every doc
    (1-based start i), join grams across docs (doc_a < doc_b), and
    observe that a maximal shared span of length L on byte diagonal
    d = i_a - i_b is exactly a run of L - min_len + 1 consecutive
    matching grams on that diagonal; gaps-and-islands (i_a minus its
    rank within the diagonal) recovers each run, so
    max_len = max over islands of (run_count + min_len - 1).

    Positions are 1-based characters in SQL vs 0-based bytes in the
    engine, but the corpus is pure ASCII (asserted in
    tests/test_substring.py) and only lengths surface in the output,
    so the two coordinate systems agree. Only sound when the engine's
    per-bucket caps don't bite (they don't at driver scale — the
    hot_fp_stats lineage report is the production guard)."""
    m = int(min_len)
    return (
        "WITH d AS (SELECT doc_id, coalesce(text,'') AS t FROM documents "
        f"WHERE length(coalesce(text,'')) >= {m}), "
        "g0 AS (SELECT doc_id, t, "
        f"CAST(unnest(range(1, CAST(length(t) - {m} + 2 AS BIGINT))) AS BIGINT) "
        "AS i FROM d), "
        f"g AS (SELECT doc_id, i, substr(t, CAST(i AS INTEGER), {m}) AS gram "
        "FROM g0), "
        "mm AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, "
        "a.i AS ia, a.i - b.i AS diag "
        "FROM g a JOIN g b ON a.gram = b.gram AND a.doc_id < b.doc_id), "
        "runs AS (SELECT doc_a, doc_b, diag, "
        "ia - row_number() OVER (PARTITION BY doc_a, doc_b, diag ORDER BY ia) "
        "AS island FROM mm), "
        "spans AS (SELECT doc_a, doc_b, "
        f"CAST(COUNT(*) + {m} - 1 AS BIGINT) AS span_len "
        "FROM runs GROUP BY doc_a, doc_b, diag, island) "
        "SELECT doc_a, doc_b, CAST(MAX(span_len) AS BIGINT) AS max_len "
        "FROM spans GROUP BY doc_a, doc_b"
    )


def substring_dedup_pairs(sf_dir: str, min_len: int = 32, k: int = 8,
                          broadcast_max_ids: int | None = None):
    """(doc_a, doc_b, max_len): document pairs sharing a substring of
    length >= min_len, with the exact longest-shared-span length."""
    ds = read_documents(sf_dir, columns=["doc_id", "text"])
    spans = substring_spans(ds, min_len=min_len, k=k,
                            broadcast_max_ids=broadcast_max_ids)
    out = spans.groupby(["doc_a", "doc_b"]).aggregate(
        Max("length", alias_name="max_len")
    )
    if out.count() == 0:
        # empty Ray Data aggregates drop the schema
        return pa.table(
            {"doc_a": pa.array([], type=pa.int64()),
             "doc_b": pa.array([], type=pa.int64()),
             "max_len": pa.array([], type=pa.int64())}
        )
    return out
