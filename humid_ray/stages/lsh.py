"""Phase 3 — neighbor search: LSH banding + per-bucket Hamming verify.

HUMID analog: findHammingNeighbours — for every word, every word
within Hamming distance m, each unordered pair exactly once
(reference src/humid.cc:113-130, asymmetric trie walk). The in-memory
trie neighbor scan becomes a shuffle:

  uniq(sig) --flat_map--> (m+1) band rows --groupby(band key)-->
  per-bucket pairwise Hamming verify --> distinct edge list

Correctness: pigeonhole — split the word's bits into m+1 contiguous
blocks; two words at Hamming <= m agree on at least one block, so the
pair co-locates in at least one band bucket. Each pair is emitted
exactly once: only by the FIRST band (and, under salting, first
sub-band) on which the two sigs agree — a local, recomputable rule, so
no global distinct-shuffle is needed.

Skew: bucket sizes are data-dependent (near-constant images pile into
one band key). A cheap counting pre-pass flags hot (band, key) buckets;
their rows are re-expanded with m+1 *sub-band* keys over the remaining
bit positions (pigeonhole again, so completeness is preserved) which
splits the hot bucket across tasks. Oversized groups that still slip
through are verified with an in-kernel recursive sub-split instead of
O(g^2) brute force.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data.aggregate import Sum

from humid_ray.config import HumidConfig, bits_from_source
from humid_ray.util import UINT64, hamming64, u64col

NO_SALT = -1


def band_layout(word_bits: int, n_bands: int) -> list[tuple[int, int]]:
    """[(shift, width)] per band over the TOP ``word_bits`` of a uint64;
    widths split like the word budget (remainder to last,
    reference ntFromFile src/fastq.cc:220-230)."""
    widths = bits_from_source(n_bands, word_bits)
    out = []
    pos = 64
    for wdt in widths:
        pos -= wdt
        out.append((pos, wdt))
    return out


def band_keys(sig: np.ndarray, layout: list[tuple[int, int]]) -> np.ndarray:
    """(n_bands, n) uint64 band keys."""
    sig = np.asarray(sig, dtype=UINT64)
    out = np.empty((len(layout), len(sig)), dtype=UINT64)
    for b, (shift, width) in enumerate(layout):
        mask = UINT64((1 << width) - 1) if width < 64 else UINT64(0xFFFFFFFFFFFFFFFF)
        out[b] = (sig >> UINT64(shift)) & mask
    return out


def first_equal_band(a: np.ndarray, b: np.ndarray, layout) -> np.ndarray:
    """For sig pairs (a[i], b[i]): index of the first band whose keys
    agree; len(layout) if none."""
    ka = band_keys(a, layout)
    kb = band_keys(b, layout)
    eq = ka == kb
    first = np.full(len(a), len(layout), dtype=np.int64)
    for band in range(len(layout) - 1, -1, -1):
        first = np.where(eq[band], band, first)
    return first


def _sub_positions(word_bits: int, layout, band: int) -> np.ndarray:
    """MSB-ordered bit positions of the word NOT covered by ``band``."""
    shift, width = layout[band]
    pos = np.arange(63, 63 - word_bits, -1)
    covered = (pos >= shift) & (pos < shift + width)
    return pos[~covered]


def sub_band_keys(sig: np.ndarray, positions: np.ndarray, n_sub: int) -> np.ndarray:
    """(n_sub, n) keys: gather the given bit positions, split into
    n_sub contiguous blocks (pigeonhole over the remaining bits)."""
    sig = np.asarray(sig, dtype=UINT64)
    widths = bits_from_source(n_sub, len(positions))
    out = np.zeros((n_sub, len(sig)), dtype=UINT64)
    start = 0
    for j, wdt in enumerate(widths):
        acc = np.zeros(len(sig), dtype=UINT64)
        for p in positions[start : start + wdt]:
            acc = (acc << UINT64(1)) | ((sig >> UINT64(int(p))) & UINT64(1))
        out[j] = acc
        start += wdt
    return out


def expand_bands(cfg: HumidConfig, hot_keys: set[tuple[int, int]] | None = None):
    """map_batches kernel factory: uniq rows -> band rows.

    Emits (band_id, band_key, salt_id, salt_key, sig, count). Buckets
    in ``hot_keys`` are split into m+1 salted sub-band rows.
    """
    layout = band_layout(cfg.word_bits, cfg.bands)
    n_sub = cfg.max_distance + 1
    word_bits = cfg.word_bits

    def kernel(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            # all-filtered / empty corpus (or an empty.parquet resume
            # placeholder): yield an empty band table, don't crash
            return pa.table(
                {
                    "band_id": pa.array([], type=pa.int32()),
                    "band_key": pa.array([], type=pa.int64()),
                    "salt_id": pa.array([], type=pa.int32()),
                    "salt_key": pa.array([], type=pa.int64()),
                    "sig": pa.array([], type=pa.int64()),
                }
            )
        sig = batch.column("sig").to_numpy(zero_copy_only=False).view(UINT64)
        count = batch.column("count").to_numpy(zero_copy_only=False)
        keys = band_keys(sig, layout)
        bids, bkeys, sids, skeys, sigs_out, counts_out = [], [], [], [], [], []
        for band in range(len(layout)):
            k = keys[band]
            if hot_keys:
                hot_mask = np.fromiter(
                    ((band, int(v)) in hot_keys for v in k), dtype=bool, count=len(k)
                )
            else:
                hot_mask = np.zeros(len(k), dtype=bool)
            cold = ~hot_mask
            if cold.any():
                m = int(cold.sum())
                bids.append(np.full(m, band, dtype=np.int32))
                bkeys.append(k[cold])
                sids.append(np.full(m, NO_SALT, dtype=np.int32))
                skeys.append(np.zeros(m, dtype=UINT64))
                sigs_out.append(sig[cold])
                counts_out.append(count[cold])
            if hot_mask.any():
                hsig = sig[hot_mask]
                hcount = count[hot_mask]
                hkey = k[hot_mask]
                positions = _sub_positions(word_bits, layout, band)
                sk = sub_band_keys(hsig, positions, n_sub)
                for j in range(n_sub):
                    m = len(hsig)
                    bids.append(np.full(m, band, dtype=np.int32))
                    bkeys.append(hkey)
                    sids.append(np.full(m, j, dtype=np.int32))
                    skeys.append(sk[j])
                    sigs_out.append(hsig)
                    counts_out.append(hcount)
        return pa.table(
            {
                "band_id": pa.array(np.concatenate(bids), type=pa.int32()),
                "band_key": u64col(np.concatenate(bkeys)),
                "salt_id": pa.array(np.concatenate(sids), type=pa.int32()),
                "salt_key": u64col(np.concatenate(skeys)),
                "sig": u64col(np.concatenate(sigs_out)),
            }
        )

    return kernel


def _pairs_within(sigs: np.ndarray, m: int, cap: int) -> set[tuple[int, int]]:
    """All sig-value pairs (a<b) with Hamming <= m within one bucket.

    Brute force in memory-bounded chunks; groups larger than ``cap``
    recurse by pigeonhole sub-splitting (handles pathological buckets
    without O(g^2) blowup).
    """
    n = len(sigs)
    if n < 2:
        return set()
    if n > cap:
        # recursive pigeonhole: split on m+1 blocks of the full word;
        # members here agree on some shuffle key but the full sig still
        # distinguishes them.
        out: set[tuple[int, int]] = set()
        layout = band_layout(64, m + 1)
        keys = band_keys(sigs, layout)
        for band in range(m + 1):
            order = np.argsort(keys[band], kind="stable")
            ks = keys[band][order]
            bounds = np.flatnonzero(np.r_[True, ks[1:] != ks[:-1], True])
            for s, e in zip(bounds[:-1], bounds[1:]):
                if e - s > 1:
                    sub = sigs[order[s:e]]
                    if len(sub) < n:
                        out |= _pairs_within(sub, m, cap)
                    else:  # cannot split further; brute force after all
                        return _pairs_within(sigs, m, n)
        return out
    out = set()
    chunk = max(1, min(n, (1 << 22) // max(n, 1)))
    for lo in range(0, n, chunk):
        hi = min(lo + chunk, n)
        d = hamming64(sigs[lo:hi, None], sigs[None, :])
        ii, jj = np.nonzero(d <= m)
        sa, sb = sigs[ii + lo], sigs[jj]
        lt = sa < sb
        out.update(zip(sa[lt].tolist(), sb[lt].tolist()))
    return out


def make_verifier(cfg: HumidConfig):
    """map_groups kernel: one (band,key[,salt]) bucket -> verified edges.

    Emits each unordered pair once globally (first-equal-band rule; for
    salted buckets additionally first-equal-sub-band).
    """
    layout = band_layout(cfg.word_bits, cfg.bands)
    m = cfg.max_distance
    n_sub = m + 1
    word_bits = cfg.word_bits
    cap = cfg.max_group_bruteforce

    def kernel(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {"sig_a": u64col([]), "sig_b": u64col([])}
        )
        if group.num_rows < 2:
            return empty
        band = int(group.column("band_id")[0].as_py())
        salt = int(group.column("salt_id")[0].as_py())
        sigs = np.unique(group.column("sig").to_numpy(zero_copy_only=False).view(UINT64))
        pairs = _pairs_within(sigs, m, cap)
        if not pairs:
            return empty
        a = np.fromiter((p[0] for p in pairs), dtype=UINT64, count=len(pairs))
        b = np.fromiter((p[1] for p in pairs), dtype=UINT64, count=len(pairs))
        keep = first_equal_band(a, b, layout) == band
        if salt != NO_SALT:
            positions = _sub_positions(word_bits, layout, band)
            ska = sub_band_keys(a, positions, n_sub)
            skb = sub_band_keys(b, positions, n_sub)
            eq = ska == skb
            first = np.full(len(a), n_sub, dtype=np.int64)
            for j in range(n_sub - 1, -1, -1):
                first = np.where(eq[j], j, first)
            keep &= first == salt
        a, b = a[keep], b[keep]
        order = np.lexsort((b, a))
        return pa.table(
            {"sig_a": u64col(a[order]),
             "sig_b": u64col(b[order])}
        )

    return kernel


def _partial_band_counts(cfg: HumidConfig):
    layout = band_layout(cfg.word_bits, cfg.bands)

    def kernel(batch: pa.Table) -> pa.Table:
        sig = batch.column("sig").to_numpy(zero_copy_only=False).view(UINT64)
        keys = band_keys(sig, layout)
        bids, bkeys, cnts = [], [], []
        for band in range(len(layout)):
            uniq, counts = np.unique(keys[band], return_counts=True)
            bids.append(np.full(len(uniq), band, dtype=np.int32))
            bkeys.append(uniq)
            cnts.append(counts)
        return pa.table(
            {
                "band_id": pa.array(np.concatenate(bids), type=pa.int32()),
                "band_key": u64col(np.concatenate(bkeys)),
                "n": pa.array(np.concatenate(cnts), type=pa.int64()),
            }
        )

    return kernel


def band_bucket_counts(uniq_ds, cfg: HumidConfig):
    """(band_id, band_key, n) bucket sizes — drives hot-bucket salting
    and the candidate-pair lineage metric."""
    partial = uniq_ds.select_columns(["sig"]).map_batches(
        _partial_band_counts(cfg), batch_format="pyarrow", zero_copy_batch=True
    )
    return partial.groupby(["band_id", "band_key"]).aggregate(Sum("n", alias_name="n"))


def find_edges(uniq_ds, cfg: HumidConfig, hot_keys: set[tuple[int, int]] | None):
    """uniq Dataset -> distinct verified edge Dataset (sig_a < sig_b)."""
    bands = uniq_ds.map_batches(
        expand_bands(cfg, hot_keys), batch_format="pyarrow", zero_copy_batch=True
    )
    return bands.groupby(["band_id", "band_key", "salt_id", "salt_key"]).map_groups(
        make_verifier(cfg), batch_format="pyarrow"
    )


# ---------------------------------------------------------------------------
# MinHash-Jaccard edge path (HUMID's -e Levenshtein-neighbor analog,
# reference src/humid.cc:140-158): variable-length payloads have no
# fixed-bit pigeonhole, so candidates come from MinHash banding over
# the caption shingle sets and verification is estimated Jaccard >=
# cfg.jaccard_threshold. Documented config switch — NOT bit-identical
# to edit distance, the semantically-equivalent similarity for this
# domain (SURVEY §2.7 G2).


def _minhash_of(batch: pa.Table) -> np.ndarray:
    mh = batch.column("minhash")
    flat = mh.combine_chunks() if isinstance(mh, pa.ChunkedArray) else mh
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    vals = np.asarray(flat.flatten(), dtype=np.int64)
    n = batch.num_rows
    return vals.reshape(n, -1)


# band_id of the edit-mode exhaustive short-caption fallback buckets
SHORT_BAND = -1


def _short_token_cutoff(cfg: HumidConfig) -> int:
    if cfg.edit_short_tokens >= 0:
        return cfg.edit_short_tokens
    return cfg.shingle_k + 2 * cfg.max_distance


def _caption_salts(caps, n_salts: int) -> np.ndarray:
    """Deterministic salt in [0, n_salts) per caption string — the SAME
    vectorized byte hash in the band expander and the verifier, so both
    agree on which block pair owns a short-caption pair."""
    import pyarrow.compute as pc

    from humid_ray.util import hash_bytes_segments

    lb = pc.cast(caps, pa.large_binary())
    if isinstance(lb, pa.ChunkedArray):
        lb = lb.combine_chunks()
    offs = np.frombuffer(lb.buffers()[1], dtype=np.int64)[
        lb.offset : lb.offset + len(lb) + 1
    ]
    data = np.frombuffer(lb.buffers()[2] or b"", dtype=np.uint8)
    h = hash_bytes_segments(data, offs)
    return (h % UINT64(n_salts)).astype(np.int64)


def _caption_token_counts(captions) -> np.ndarray:
    """Token count per caption (null -> 0), vectorized."""
    from humid_ray.functions.text import tokenize_batch

    _, offs = tokenize_batch(captions)
    return np.diff(offs)


def expand_minhash_bands(cfg: HumidConfig):
    from humid_ray.functions.minhash import minhash_band_keys

    carry_shingles = cfg.minhash_verify == "exact"
    carry_caption = cfg.minhash_verify == "edit"

    def kernel(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        nb = cfg.minhash_bands
        if n == 0:
            cols = {
                "band_id": pa.array([], type=pa.int32()),
                "band_key": pa.array([], type=pa.int64()),
                "sig": pa.array([], type=pa.int64()),
                "minhash": pa.array([], type=pa.list_(pa.int64(), cfg.minhash_perms)),
            }
            if carry_shingles:
                cols["shingles"] = pa.array([], type=pa.large_list(pa.int64()))
            if carry_caption:
                cols["caption"] = pa.array([], type=pa.string())
            return pa.table(cols)
        sig = batch.column("sig").to_numpy(zero_copy_only=False).view(UINT64)
        mh = _minhash_of(batch)
        keys = minhash_band_keys(mh.view(UINT64), cfg.minhash_bands)
        cols = {
            "band_id": pa.array(
                np.repeat(np.arange(nb, dtype=np.int32)[None, :], n, axis=0).reshape(-1)
            ),
            "band_key": pa.array(keys.reshape(-1).view(np.int64), type=pa.int64()),
            "sig": pa.array(np.repeat(sig.view(np.int64), nb), type=pa.int64()),
            "minhash": pa.FixedSizeListArray.from_arrays(
                pa.array(np.repeat(mh, nb, axis=0).reshape(-1), type=pa.int64()),
                mh.shape[1],
            ),
        }
        if carry_shingles or carry_caption:
            # rows-outer / bands-inner ordering, same as every column above
            idx = pa.array(np.repeat(np.arange(n, dtype=np.int64), nb))
            name = "shingles" if carry_shingles else "caption"
            col = batch.column(name)
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            cols[name] = col.take(idx)
        out = pa.table(cols)
        if not carry_caption:
            return out
        # edit mode: exhaustive fallback for SHORT captions. The
        # reference enumerates ALL pairs within edit distance m
        # (trie.asymmetricLevenshtein, src/humid.cc:146-147); shingle
        # banding can miss a pair whose few shingles are all destroyed
        # by m edits. Such captions have <= cutoff tokens, and any
        # edit-distance-<=m partner of one is itself short (m char
        # edits change the token count by <= m), so routing every
        # short caption into char-length buckets q = len // (m+1) and
        # q+1 makes BOTH-short pairs exhaustive: |len diff| <= m
        # implies the pair shares bucket max(q_a, q_b). The verifier
        # emits a short-bucket pair only there (no double emission)
        # and drops both-short pairs from regular bands.
        import pyarrow.compute as pc

        cap = batch.column("caption")
        if isinstance(cap, pa.ChunkedArray):
            cap = cap.combine_chunks()
        filled = pc.fill_null(cap, "")
        short = _caption_token_counts(filled) <= _short_token_cutoff(cfg)
        if not short.any():
            return out
        sidx = np.flatnonzero(short)
        clen = pc.utf8_length(filled).to_numpy(zero_copy_only=False)[sidx]
        q = (clen // (cfg.max_distance + 1)).astype(np.int64)
        # Salted block-pair decomposition: a bare q bucket funnels every
        # short caption of one length class corpus-wide into ONE verify
        # task. Each caption gets salt s = hash(caption) % S and lands
        # in the S blocks (min(s,t), max(s,t)); a pair meets in exactly
        # block (min(s_a,s_b), max(s_a,s_b)) of its owner q bucket, so
        # exhaustiveness holds while per-task size drops to ~2n/S.
        S = max(1, cfg.edit_short_salt)
        salt = _caption_salts(filled.take(pa.array(sidx)), S)
        tt = np.arange(S, dtype=np.int64)
        blk = (np.minimum(salt[:, None], tt[None, :]) * S
               + np.maximum(salt[:, None], tt[None, :]))       # (ns, S)
        qq = np.stack([q, q + 1], axis=1)                      # (ns, 2)
        keys2 = (qq[:, :, None] * (S * S) + blk[:, None, :]).reshape(-1)
        rows2 = pa.array(np.repeat(sidx, 2 * S))
        extra = pa.table(
            {
                "band_id": pa.array(
                    np.full(len(keys2), SHORT_BAND, dtype=np.int32)
                ),
                "band_key": pa.array(keys2, type=pa.int64()),
                "sig": pa.array(
                    np.repeat(sig.view(np.int64)[sidx], 2 * S), type=pa.int64()
                ),
                "minhash": pa.FixedSizeListArray.from_arrays(
                    pa.array(
                        np.repeat(mh[sidx], 2 * S, axis=0).reshape(-1),
                        type=pa.int64(),
                    ),
                    mh.shape[1],
                ),
                "caption": filled.take(rows2),
            }
        )
        return pa.concat_tables([out, extra])

    return kernel


def _list_segments(col) -> tuple[np.ndarray, np.ndarray]:
    """(flat uint64 values, absolute int64 offsets) of a (Large)List
    column — offsets index ``values`` directly even for sliced arrays."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    offs = col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    vals = np.asarray(col.values, dtype=np.int64).view(UINT64)
    return vals, offs


def _pack_i64_list(col) -> pa.Array:
    """(FixedSize|Large)List<int64> -> large_binary (8 bytes/element).

    Arrow acero hash joins reject list-typed non-key columns; binary
    passes through. Zero-copy-ish: one flat tobytes + an offsets array.
    """
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if isinstance(col, pa.FixedSizeListArray):
        width = col.type.list_size
        flat = np.asarray(col.flatten(), dtype=np.int64)
        data = flat.tobytes()
        offsets = (np.arange(n + 1, dtype=np.int64) * width * 8)
    else:
        offs = col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        vals = np.asarray(col.values, dtype=np.int64)
        data = vals[offs[0]:offs[-1]].tobytes()
        offsets = (offs - offs[0]) * 8
    return pa.Array.from_buffers(
        pa.large_binary(), n,
        [None, pa.py_buffer(offsets.tobytes()), pa.py_buffer(data)],
    )


def _unpack_i64_list(col, fixed_width: int | None = None) -> pa.Array:
    """Inverse of ``_pack_i64_list``: large_binary -> FixedSizeList
    (when ``fixed_width``) or LargeList of int64."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    raw = np.frombuffer(col.buffers()[1], dtype=np.int64)
    offs = raw[col.offset : col.offset + len(col) + 1]
    data = np.frombuffer(col.buffers()[2] or b"", dtype=np.uint8)
    vals = np.frombuffer(
        data[offs[0]:offs[-1]].tobytes(), dtype=np.int64
    )
    if fixed_width is not None:
        return pa.FixedSizeListArray.from_arrays(
            pa.array(vals, type=pa.int64()), fixed_width
        )
    return pa.LargeListArray.from_arrays(
        pa.array((offs - offs[0]) // 8, type=pa.int64()),
        pa.array(vals, type=pa.int64()),
    )


def make_minhash_verifier(cfg: HumidConfig):
    from humid_ray.functions.minhash import minhash_band_keys

    threshold = cfg.jaccard_threshold
    nb = cfg.minhash_bands
    exact = cfg.minhash_verify == "exact"
    edit = cfg.minhash_verify == "edit"
    max_dist = cfg.max_distance
    # estimated prefilter: loose enough that true matches at the
    # threshold survive estimator noise, tight enough to bound the
    # per-bucket exact-verification work
    prefilter = max(0.0, threshold - cfg.jaccard_est_slack) if exact else threshold

    def kernel(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {"sig_a": pa.array([], type=pa.int64()), "sig_b": pa.array([], type=pa.int64())}
        )
        if group.num_rows < 2:
            return empty
        band = int(group.column("band_id")[0].as_py())
        sig = group.column("sig").to_numpy(zero_copy_only=False).view(UINT64)
        mh = _minhash_of(group)
        order = np.argsort(sig, kind="stable")
        keep = np.r_[True, sig[order][1:] != sig[order][:-1]]
        idx = order[keep]
        sig, mh = sig[idx], mh[idx]
        if len(sig) < 2:
            return empty
        if edit:
            # -e parity: EXACT banded-Levenshtein verification. Work is
            # deduplicated to UNIQUE captions (hot buckets funnel many
            # sigs with one caption into one group — one DP per caption
            # pair, not per sig pair), candidate caption pairs are
            # generated only inside the |len diff| <= m window (sorted
            # + searchsorted, never the full triangle), and expansion
            # back to sig pairs is bounded by the true edge output.
            from humid_ray.functions.text import edit_distance_within

            caps_all = group.column("caption").to_pylist()
            caps = np.array([caps_all[i] or "" for i in idx.tolist()], dtype=object)
            ucaps, inv = np.unique(caps, return_inverse=True)
            ulens = np.fromiter((len(c) for c in ucaps), dtype=np.int64,
                                count=len(ucaps))
            # shortness per unique caption: both-short pairs belong to
            # the SHORT_BAND fallback buckets exclusively (exhaustive
            # there, dropped from regular bands — no double emission)
            short_cut = _short_token_cutoff(cfg)
            ushort = _caption_token_counts(
                pa.array(ucaps.tolist(), type=pa.string())
            ) <= short_cut
            if band == SHORT_BAND:
                S = max(1, cfg.edit_short_salt)
                key0 = int(group.column("band_key")[0].as_py())
                bucket_q, blk0 = key0 // (S * S), key0 % (S * S)
                bucket_i, bucket_j = blk0 // S, blk0 % S
                uq = ulens // (max_dist + 1)
                usalt = _caption_salts(
                    pa.array(ucaps.tolist(), type=pa.string()), S
                )
            order_u = np.argsort(ulens, kind="stable")
            ul = ulens[order_u]
            nu = len(ul)
            hi = np.searchsorted(ul, ul + max_dist, side="right")
            counts = np.maximum(hi - np.arange(nu) - 1, 0)
            total = int(counts.sum())
            cu = np.repeat(np.arange(nu), counts)
            within = np.arange(total, dtype=np.int64) - np.repeat(
                np.cumsum(np.r_[0, counts[:-1]]), counts
            )
            cv = cu + 1 + within
            # one-pass segment index: members_list[c] = sig indices of
            # unique caption c (no per-caption scans)
            by_cap = np.argsort(inv, kind="stable")
            caps_sorted = inv[by_cap]
            bounds = np.flatnonzero(
                np.r_[True, caps_sorted[1:] != caps_sorted[:-1], True]
            )
            members_list = [by_cap[bounds[c]:bounds[c + 1]] for c in range(nu)]

            def _pair_here(u: int, v: int) -> bool:
                """Emission ownership: SHORT buckets own both-short
                pairs (at bucket max(q_a, q_b), salt block
                (min(s_a,s_b), max(s_a,s_b)) only), regular bands own
                the rest."""
                a, b = order_u[u], order_u[v]
                both_short = bool(ushort[a] and ushort[b])
                if band == SHORT_BAND:
                    if not both_short or max(int(uq[a]), int(uq[b])) != bucket_q:
                        return False
                    sa, sb = int(usalt[a]), int(usalt[b])
                    return (min(sa, sb), max(sa, sb)) == (bucket_i, bucket_j)
                return not both_short

            matched = [(int(u), int(u)) for u in range(nu)
                       if len(members_list[order_u[u]]) > 1
                       and _pair_here(int(u), int(u))]
            for u, v in zip(cu.tolist(), cv.tolist()):
                if _pair_here(u, v) and edit_distance_within(
                    ucaps[order_u[u]], ucaps[order_u[v]], max_dist
                ):
                    matched.append((u, v))
            members = {u: members_list[order_u[u]] for u in range(nu)}
            ii_parts, jj_parts = [], []
            for u, v in matched:
                gu, gv = members[u], members[v]
                if u == v:
                    a, b = np.triu_indices(len(gu), k=1)
                    ii_parts.append(gu[a])
                    jj_parts.append(gu[b])
                else:
                    mesh_a = np.repeat(gu, len(gv))
                    mesh_b = np.tile(gv, len(gu))
                    ii_parts.append(np.minimum(mesh_a, mesh_b))
                    jj_parts.append(np.maximum(mesh_a, mesh_b))
            if ii_parts:
                ii = np.concatenate(ii_parts)
                jj = np.concatenate(jj_parts)
            else:
                ii = jj = np.empty(0, dtype=np.int64)
        else:
            est = (mh[:, None, :] == mh[None, :, :]).mean(axis=2)
            ii, jj = np.nonzero(est >= prefilter)
            lt = ii < jj
            ii, jj = ii[lt], jj[lt]
            if exact and len(ii):
                from humid_ray.util import pairwise_intersect_sizes

                vals, offs = _list_segments(group.column("shingles"))
                starts, ends = offs[idx], offs[idx + 1]
                inter = pairwise_intersect_sizes(vals, starts, ends, ii, jj)
                union = (ends[ii] - starts[ii]) + (ends[jj] - starts[jj]) - inter
                ok = (union > 0) & (inter >= threshold * union)
                ii, jj = ii[ok], jj[ok]
        if not len(ii):
            return empty
        if edit and band == SHORT_BAND:
            # short-bucket pairs are already deduped by the max-q
            # ownership rule above, not by minhash bands
            keepb = np.ones(len(ii), dtype=bool)
        else:
            # first-equal-band dedupe (recomputable from the minhashes)
            ka = minhash_band_keys(mh[ii].view(UINT64), nb)
            kb = minhash_band_keys(mh[jj].view(UINT64), nb)
            eq = ka == kb
            first = np.full(len(ii), nb, dtype=np.int64)
            for b in range(nb - 1, -1, -1):
                first = np.where(eq[:, b], b, first)
            keepb = first == band
        a, b = sig[ii[keepb]], sig[jj[keepb]]
        order = np.lexsort((b, a))
        return pa.table(
            {
                "sig_a": pa.array(a[order].view(np.int64), type=pa.int64()),
                "sig_b": pa.array(b[order].view(np.int64), type=pa.int64()),
            }
        )

    return kernel


def find_edges_minhash(sig_ds, uniq_ds, cfg: HumidConfig,
                       broadcast_max_rows: int = 5_000_000):
    """Edges between unique sigs whose representative-row minhashes
    estimate Jaccard >= threshold. The representative row is the sig's
    first occurrence (min image_id), matching the word the reference
    indexes (a leaf stores one word; trie.add is idempotent on content).

    The (first_id -> representative row) semi-join is vectorized and
    streaming at both scales: below ``broadcast_max_rows`` the sorted
    first_id array is broadcast once (``ray.put``) and each batch
    filters with ``pc.is_in`` (Arrow kernel, no Python row loop);
    above it, a distributed hash semi-join (``Dataset.join``) keeps
    the id set off the driver entirely.
    """
    import pyarrow.compute as pc

    import ray

    carry = ["sig", "minhash"]
    if cfg.minhash_verify == "exact":
        carry.append("shingles")
    elif cfg.minhash_verify == "edit":
        carry.append("caption")
    n_uniq = uniq_ds.count()
    if n_uniq <= broadcast_max_rows:
        chunks = []
        for b in uniq_ds.select_columns(["first_id"]).iter_batches(
            batch_size=262144, batch_format="pyarrow"
        ):
            chunks.append(b.column("first_id"))
        if chunks:
            id_array = pa.concat_tables(
                [pa.table({"first_id": c}) for c in chunks]
            ).column("first_id").combine_chunks()
        else:  # all-filtered / empty corpus
            id_array = pa.array([], type=pa.string())
        ids_ref = ray.put(id_array)

        class FirstRows:
            def __init__(self):
                self.ids: pa.Array = ray.get(ids_ref)

            def __call__(self, batch: pa.Table) -> pa.Table:
                keep = pc.is_in(batch.column("image_id"), value_set=self.ids)
                return batch.filter(keep).select(carry)

        firsts = sig_ds.map_batches(
            FirstRows, batch_format="pyarrow", zero_copy_batch=True, concurrency=(1, 8)
        )
    else:
        # distributed hash semi-join (the >broadcast_max_rows scale
        # path). Arrow acero joins reject list-typed non-key columns,
        # so minhash/shingles travel as packed large_binary and are
        # unpacked after the join.
        cpus = int(ray.cluster_resources().get("CPU", 4))
        packed_cols = [c for c in carry if c in ("minhash", "shingles")]

        def pack(t: pa.Table) -> pa.Table:
            cols = {"image_id": t.column("image_id"), "sig": t.column("sig")}
            for c in packed_cols:
                cols[f"{c}_bin"] = _pack_i64_list(t.column(c))
            if "caption" in carry:
                cols["caption"] = t.column("caption")
            return pa.table(cols)

        perms = cfg.minhash_perms

        def unpack(t: pa.Table) -> pa.Table:
            cols = {"sig": t.column("sig")}
            if "minhash" in packed_cols:
                cols["minhash"] = _unpack_i64_list(t.column("minhash_bin"), perms)
            if "shingles" in packed_cols:
                cols["shingles"] = _unpack_i64_list(t.column("shingles_bin"))
            if "caption" in carry:
                cols["caption"] = t.column("caption")
            return pa.table(cols)

        packed = sig_ds.select_columns(["image_id", *carry]).map_batches(
            pack, batch_format="pyarrow", zero_copy_batch=True
        )
        firsts = packed.join(
            uniq_ds.select_columns(["first_id"]).rename_columns(["image_id"]),
            join_type="inner", on=("image_id",),
            num_partitions=max(2, min(64, cpus // 2)),
        ).map_batches(unpack, batch_format="pyarrow", zero_copy_batch=True)
    bands = firsts.map_batches(
        expand_minhash_bands(cfg), batch_format="pyarrow", zero_copy_batch=True
    )
    return bands.groupby(["band_id", "band_key"]).map_groups(
        make_minhash_verifier(cfg), batch_format="pyarrow"
    )
