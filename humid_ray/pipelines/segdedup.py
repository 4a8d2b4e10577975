"""Cross-document SEGMENT deduplication over the ``documents`` table:
the C4/Gopher-style curation step that removes a line (or fixed-width
token chunk) from EVERY document once it occurs at least ``min_count``
times corpus-wide (C4 §2.2 drops any three-sentence span occurring more
than once; Gopher's repetition filters work per-document — this is the
corpus-wide variant).

Reference parity: this generalizes HUMID's exact-duplicate counting
(reference ``src/humid.cc`` trie-count phase) from whole-record
granularity to intra-record segments — count segments globally, then
stream the corpus once more and drop the hot ones.

Scale shape (the same two-pass design as the flagship uniq phase,
``stages/exact.py``):

* pass 1 counts segments with a vocab-style per-batch combiner: an
  Arrow C-speed ``group_by`` collapses each batch to its DISTINCT
  segments before the shuffle, so a boilerplate segment that appears in
  every row costs ONE int64 partial per batch — the hot-key shuffle is
  skew-proof by construction (same argument as ``textstats.vocab``).
* the hot set (``count >= min_count``) contains only *duplicated*
  segments — tiny relative to the corpus — and is collected once and
  broadcast via ``ray.put`` (the ``decontaminate`` broadcast pattern).
  At a scale where the duplicated-segment set outgrows one worker's
  heap, swap the membership kernel for the broadcast/``Dataset.join``
  switch the minhash verify path uses (``stages/lsh.py``).
* pass 2 streams the corpus through one vectorized membership kernel:
  ``pc.is_in`` (exact STRING membership — no hash-collision risk),
  kept segments reassembled per row with ``pc.binary_join``. No
  shuffle; the corpus text never transits the object store twice.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data
from ray.data.aggregate import Sum

from humid_ray.pipelines.textstats import _flat_tokens


def read_documents(sf_dir: str, columns=None):
    return ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=columns)


_EMPTY_SEG_PARTIAL = {
    "segment": pa.array([], type=pa.string()),
    "n": pa.array([], type=pa.int64()),
}


def _combine(arr):
    return arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr


def segment_lines(texts) -> tuple[pa.Array, np.ndarray]:
    """Newline-delimited lines of each text as a flat string array plus
    int64 row offsets. ``split('')`` is ``['']`` (one empty line), so
    every row owns >= 1 segment; nulls count as empty text — both
    matching DuckDB ``string_split(coalesce(text,''), chr(10))``."""
    texts = pc.fill_null(pc.cast(_combine(texts), pa.string()), "")
    lines = pc.split_pattern(texts, "\n")
    flat = _combine(lines.flatten())
    offs = np.asarray(lines.offsets, dtype=np.int64)
    return flat, offs - offs[0]


def segment_chunks(texts, k: int) -> tuple[pa.Array, np.ndarray]:
    """Non-overlapping ``k``-token chunks of each text (tokens =
    ``[0-9a-z]+`` runs of lower(text), the repo-wide rule), each chunk
    rendered as its space-joined token string. A row with ``L`` tokens
    yields ``ceil(L/k)`` chunks (the last may be short); zero-token
    rows yield zero chunks. Chunk boundaries are built as one offsets
    array over the flat token buffer (chunk ends meet the next chunk's
    start, also across row boundaries), so the whole segmentation is a
    single ``ListArray`` + ``binary_join`` — no per-row Python."""
    kept, offs = _flat_tokens(texts)
    lens = offs[1:] - offs[:-1]
    counts = -(-lens // k)
    total = int(counts.sum())
    nrows = len(lens)
    seg_offs = np.zeros(nrows + 1, dtype=np.int64)
    np.cumsum(counts, out=seg_offs[1:])
    if total == 0:
        return pa.array([], type=pa.string()), seg_offs
    row_of = np.repeat(np.arange(nrows, dtype=np.int64), counts)
    within = np.arange(total, dtype=np.int64) - seg_offs[:-1][row_of]
    starts = offs[:-1][row_of] + k * within
    ch_offs = np.append(starts, offs[-1])
    chunk_list = pa.ListArray.from_arrays(
        pa.array(ch_offs, type=pa.int32()), kept
    )
    return _combine(pc.binary_join(chunk_list, " ")), seg_offs


def hot_segments_ref(docs, segment_fn, min_count: int):
    """ObjectRef of the flat string array of segments occurring at
    least ``min_count`` times corpus-wide (pass 1)."""
    import ray

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(_EMPTY_SEG_PARTIAL)
        segs, _ = segment_fn(t.column("text"))
        if len(segs) == 0:
            return pa.table(_EMPTY_SEG_PARTIAL)
        g = pa.table({"segment": segs}).group_by("segment").aggregate(
            [("segment", "count")]
        )
        return pa.table(
            {
                "segment": g.column("segment"),
                "n": g.column("segment_count").cast(pa.int64()),
            }
        )

    hot = (
        docs.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("segment")
        .aggregate(Sum("n", alias_name="n"))
        .map_batches(
            lambda t: t.filter(
                pc.greater_equal(t.column("n"), pa.scalar(min_count))
            ).select(["segment"]),
            batch_format="pyarrow",
        )
    )
    parts = [
        _combine(b.column("segment"))
        for b in hot.iter_batches(batch_size=262144, batch_format="pyarrow")
    ]
    merged = (
        pa.concat_arrays(parts) if parts else pa.array([], type=pa.string())
    )
    return ray.put(merged)


class _SegmentFilter:
    """Pass-2 actor kernel: membership-test every segment against the
    broadcast hot set (fetched ONCE per actor in ``__init__``) and
    reassemble the kept segments."""

    def __init__(self, hot_ref, segment_fn, join_sep: str):
        import ray

        self.hot: pa.Array = ray.get(hot_ref)
        self.segment_fn = segment_fn
        self.join_sep = join_sep

    def __call__(self, t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], type=pa.int64()),
                    "clean_text": pa.array([], type=pa.string()),
                    "n_segments": pa.array([], type=pa.int64()),
                    "n_removed": pa.array([], type=pa.int64()),
                }
            )
        segs, offs = self.segment_fn(t.column("text"))
        lens = offs[1:] - offs[:-1]
        if len(segs):
            keep = np.invert(
                pc.is_in(segs, value_set=self.hot).to_numpy(
                    zero_copy_only=False
                )
            )
        else:
            keep = np.empty(0, dtype=bool)
        kept_per_row = np.zeros(len(lens), dtype=np.int64)
        has = lens > 0
        if has.any():
            kept_per_row[has] = np.add.reduceat(
                keep.astype(np.int64), offs[:-1][has]
            )
        new_offs = np.zeros(len(offs), dtype=np.int64)
        np.cumsum(kept_per_row, out=new_offs[1:])
        kept_flat = segs.filter(pa.array(keep)) if len(segs) else segs
        out_list = pa.ListArray.from_arrays(
            pa.array(new_offs, type=pa.int32()), _combine(kept_flat)
        )
        clean = pc.binary_join(out_list, self.join_sep)
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "clean_text": clean,
                "n_segments": pa.array(lens),
                "n_removed": pa.array(lens - kept_per_row),
            }
        )


def _segment_dedup(sf_dir: str, segment_fn, join_sep: str, min_count: int):
    docs = read_documents(sf_dir, columns=["doc_id", "text"])
    hot_ref = hot_segments_ref(docs, segment_fn, min_count)
    return docs.map_batches(
        _SegmentFilter,
        fn_constructor_kwargs={
            "hot_ref": hot_ref,
            "segment_fn": segment_fn,
            "join_sep": join_sep,
        },
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=(1, 8),
    )


def line_dedup(sf_dir: str, min_count: int = 2):
    """(doc_id, clean_text, n_segments, n_removed): drop every
    newline-delimited line occurring >= min_count times corpus-wide
    from ALL documents (the C4 boilerplate-line rule)."""
    return _segment_dedup(sf_dir, segment_lines, "\n", min_count)


def chunk_dedup(sf_dir: str, k: int = 4, min_count: int = 2):
    """(doc_id, clean_text, n_segments, n_removed): drop every
    non-overlapping k-token chunk occurring >= min_count times
    corpus-wide; clean_text is the space-joined surviving chunks (the
    normalized-token rendering, matching the SQL oracle)."""
    return _segment_dedup(
        sf_dir, lambda tx: segment_chunks(tx, k), " ", min_count
    )


def line_dedup_sql(min_count: int = 2) -> str:
    """DuckDB oracle for ``line_dedup`` over the ``documents`` view."""
    return (
        "WITH l AS (SELECT doc_id, "
        "unnest(string_split(coalesce(text,''), chr(10))) AS seg, "
        "generate_subscripts(string_split(coalesce(text,''), chr(10)), 1) "
        "AS ord FROM documents), "
        f"hot AS (SELECT seg FROM l GROUP BY seg HAVING count(*) >= {min_count}), "
        "kept AS (SELECT doc_id, seg, ord FROM l "
        "WHERE seg NOT IN (SELECT seg FROM hot)), "
        "agg AS (SELECT doc_id, string_agg(seg, chr(10) ORDER BY ord) "
        "AS clean_text, count(*) AS n_kept FROM kept GROUP BY doc_id), "
        "nl AS (SELECT doc_id, count(*) AS n FROM l GROUP BY doc_id) "
        "SELECT d.doc_id, coalesce(a.clean_text, '') AS clean_text, "
        "CAST(coalesce(nl.n, 0) AS BIGINT) AS n_segments, "
        "CAST(coalesce(nl.n, 0) - coalesce(a.n_kept, 0) AS BIGINT) "
        "AS n_removed "
        "FROM documents d LEFT JOIN nl USING (doc_id) "
        "LEFT JOIN agg a USING (doc_id)"
    )


def chunk_dedup_sql(k: int = 4, min_count: int = 2) -> str:
    """DuckDB oracle for ``chunk_dedup`` over the ``documents`` view."""
    return (
        "WITH toks AS (SELECT doc_id, "
        "regexp_extract_all(lower(coalesce(text,'')), '[0-9a-z]+') AS t "
        "FROM documents), "
        "l AS (SELECT doc_id, "
        f"unnest(list_transform(range(0, CAST(ceil(len(t)/{k}.0) AS BIGINT)), "
        f"i -> array_to_string(t[i*{k}+1 : i*{k}+{k}], ' '))) AS seg, "
        f"generate_subscripts(list_transform(range(0, "
        f"CAST(ceil(len(t)/{k}.0) AS BIGINT)), i -> i), 1) AS ord FROM toks), "
        f"hot AS (SELECT seg FROM l GROUP BY seg HAVING count(*) >= {min_count}), "
        "kept AS (SELECT doc_id, seg, ord FROM l "
        "WHERE seg NOT IN (SELECT seg FROM hot)), "
        "agg AS (SELECT doc_id, string_agg(seg, ' ' ORDER BY ord) "
        "AS clean_text, count(*) AS n_kept FROM kept GROUP BY doc_id), "
        "nl AS (SELECT doc_id, count(*) AS n FROM l GROUP BY doc_id) "
        "SELECT d.doc_id, coalesce(a.clean_text, '') AS clean_text, "
        "CAST(coalesce(nl.n, 0) AS BIGINT) AS n_segments, "
        "CAST(coalesce(nl.n, 0) - coalesce(a.n_kept, 0) AS BIGINT) "
        "AS n_removed "
        "FROM documents d LEFT JOIN nl USING (doc_id) "
        "LEFT JOIN agg a USING (doc_id)"
    )


def chunk_export(sf_dir: str, size: int = 64, stride: int = 32):
    """(doc_id, chunk_idx, n_tokens, chunk_text): sliding-window token
    chunks — every document split into ``size``-token windows advancing
    by ``stride`` (overlapping when stride < size), the standard prep
    for embedding indexes / context-window training sets. chunk_text
    is the normalized space-joined token rendering (the same rendering
    ``chunk_dedup``'s oracle pins); zero-token docs emit no chunks.

    Scale shape: shuffle-free — one streaming pass; chunk expansion is
    pure repeat/arange index math and ONE Arrow take + binary_join per
    batch (no per-doc or per-chunk Python). Output rows ~ n_tokens /
    stride per doc, written directly to the sink."""
    import pyarrow.compute as pc

    from humid_ray.pipelines.textstats import _flat_tokens

    assert 0 < stride <= size

    _empty = pa.table(
        {"doc_id": pa.array([], type=pa.int64()),
         "chunk_idx": pa.array([], type=pa.int64()),
         "n_tokens": pa.array([], type=pa.int64()),
         "chunk_text": pa.array([], type=pa.string())}
    )

    def kernel(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _empty
        kept, offs = _flat_tokens(batch.column("text"))
        n = offs[1:] - offs[:-1]
        doc = batch.column("doc_id").to_numpy(zero_copy_only=False)
        n_chunks = np.where(n > 0, (np.maximum(n, 1) - 1) // stride + 1, 0)
        total = int(n_chunks.sum())
        if total == 0:
            return _empty
        d_rep = np.repeat(doc, n_chunks).astype(np.int64)
        base = np.repeat(offs[:-1], n_chunks)
        ci = (np.arange(total, dtype=np.int64)
              - np.repeat(np.cumsum(np.r_[0, n_chunks[:-1]]), n_chunks))
        start = ci * stride
        n_rep = np.repeat(n, n_chunks)
        clen = np.minimum(start + size, n_rep) - start
        tok_total = int(clen.sum())
        pos_in = (np.arange(tok_total, dtype=np.int64)
                  - np.repeat(np.r_[0, np.cumsum(clen)[:-1]], clen))
        flat_idx = np.repeat(base + start, clen) + pos_in
        flat = kept.take(pa.array(flat_idx))
        flat = flat.combine_chunks() if isinstance(flat, pa.ChunkedArray) else flat
        lst = pa.ListArray.from_arrays(
            pa.array(np.r_[0, np.cumsum(clen)].astype(np.int32)), flat
        )
        return pa.table(
            {"doc_id": pa.array(d_rep),
             "chunk_idx": pa.array(ci),
             "n_tokens": pa.array(clen.astype(np.int64)),
             "chunk_text": pc.binary_join(lst, " ")}
        )

    return read_documents(sf_dir, columns=["doc_id", "text"]).map_batches(
        kernel, batch_format="pyarrow", zero_copy_batch=True
    )


def chunk_export_sql(size: int = 64, stride: int = 32,
                     table: str = "documents") -> str:
    """DuckDB oracle for ``chunk_export``."""
    return (
        "WITH toks AS (SELECT doc_id, "
        f"regexp_extract_all(lower(coalesce(text,'')), '[0-9a-z]+') AS t "
        f"FROM {table}), "
        "nn AS (SELECT doc_id, t, len(t) AS n FROM toks WHERE len(t) > 0), "
        "x AS (SELECT doc_id, t, n, "
        f"unnest(range(0, (n - 1) // {stride} + 1)) AS i FROM nn) "
        "SELECT doc_id, i AS chunk_idx, "
        f"CAST(least(i*{stride} + {size}, n) - i*{stride} AS BIGINT) "
        "AS n_tokens, "
        f"array_to_string(t[i*{stride} + 1 : least(i*{stride} + {size}, n)], "
        "' ') AS chunk_text FROM x"
    )
