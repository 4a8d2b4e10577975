"""Text-analysis operators over the ``documents`` table: language-ID,
quality scoring, token counting, document fingerprinting. All
vectorized ``map_batches`` kernels (Arrow/numpy), no per-row Python in
hot paths except the bounded lang-ID profile scoring."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data
from ray.data.aggregate import Count

from humid_ray.functions.text import tokenize_batch
from humid_ray.util import UINT64, round_half_away, u64col


def read_documents(sf_dir: str, columns=None):
    return ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=columns)


def lang_hist(sf_dir: str):
    """Rows per declared language. Oracle: SELECT lang, COUNT(*) AS n
    FROM documents GROUP BY lang."""
    return (
        read_documents(sf_dir, columns=["lang"])
        .groupby("lang")
        .aggregate(Count(alias_name="n"))
    )


def token_counts(sf_dir: str):
    """(doc_id, n_tokens, n_chars) — whitespace/punct token counting.

    Oracle: n_tokens = number of [0-9a-z]+ runs of lower(text)."""

    def kernel(batch: pa.Table) -> pa.Table:
        th, offs = tokenize_batch(batch.column("text"))
        ntok = (offs[1:] - offs[:-1]).astype(np.int64)
        nchars = pc.utf8_length(pc.fill_null(batch.column("text"), "")).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_tokens": pa.array(ntok),
                "n_chars": pa.array(nchars),
            }
        )

    return read_documents(sf_dir, columns=["doc_id", "text"]).map_batches(
        kernel, batch_format="pyarrow", zero_copy_batch=True
    )


def quality_scores(sf_dir: str):
    """(doc_id, n_chars, n_tokens, mean_token_len, alpha_ratio) —
    length/character-class quality heuristics, all exactly computable
    in SQL for the oracle (ratios rounded to 6)."""

    def kernel(batch: pa.Table) -> pa.Table:
        text = pc.fill_null(batch.column("text"), "")
        nchars = pc.utf8_length(text).to_numpy(zero_copy_only=False).astype(np.int64)
        th, offs = tokenize_batch(batch.column("text"))
        ntok = (offs[1:] - offs[:-1]).astype(np.int64)
        # alpha chars = count of [a-z] in lowered text
        lower = pc.utf8_lower(text)
        stripped = pc.replace_substring_regex(lower, "[^a-z]", "")
        nalpha = pc.utf8_length(stripped).to_numpy(zero_copy_only=False).astype(np.int64)
        alpha_ratio = round_half_away(
            np.where(nchars > 0, nalpha / np.maximum(nchars, 1), 0.0), 6
        )
        # mean token length over alnum runs
        runs = pc.replace_substring_regex(lower, "[^0-9a-z]+", " ")
        runs_len = pc.utf8_length(
            pc.replace_substring_regex(runs, " ", "")
        ).to_numpy(zero_copy_only=False).astype(np.int64)
        mean_tok = round_half_away(
            np.where(ntok > 0, runs_len / np.maximum(ntok, 1), 0.0), 6
        )
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_chars": pa.array(nchars),
                "n_tokens": pa.array(ntok),
                "mean_token_len": pa.array(mean_tok),
                "alpha_ratio": pa.array(alpha_ratio),
            }
        )

    return read_documents(sf_dir, columns=["doc_id", "text"]).map_batches(
        kernel, batch_format="pyarrow", zero_copy_batch=True
    )


# a BPE-ish pre-tokenizer (GPT-2-style word/number/punct split,
# RE2-safe: no lookahead) — both Arrow and DuckDB run RE2, so
# non-overlapping leftmost-match counts agree exactly
BPE_PATTERN = r"'(?:s|t|re|ve|m|ll|d)| ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9\s]+|\s+"

STOPWORDS = ("the", "a", "an", "and", "or", "of", "to", "in", "is", "on",
             "for", "with", "as", "at", "by", "it")


def bpe_token_counts(sf_dir: str):
    """(doc_id, n_bpe_tokens) — BPE-style pre-tokenizer segment count.

    Oracle: len(regexp_extract_all(text, BPE_PATTERN))."""

    def kernel(batch: pa.Table) -> pa.Table:
        text = pc.fill_null(batch.column("text"), "")
        n = pc.count_substring_regex(text, BPE_PATTERN).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        return pa.table(
            {"doc_id": batch.column("doc_id"), "n_bpe_tokens": pa.array(n)}
        )

    return read_documents(sf_dir, columns=["doc_id", "text"]).map_batches(
        kernel, batch_format="pyarrow", zero_copy_batch=True
    )


def stopword_ratio(sf_dir: str):
    """(doc_id, n_tokens, n_stopwords, stopword_ratio) — quality
    heuristic. Vectorized: stopword membership is tested on the token
    HASHES (np.isin against the 16 precomputed stopword hashes), no
    per-token string compares."""
    from humid_ray.util import hash_bytes_segments

    flat = "".join(STOPWORDS).encode()
    offs = np.cumsum([0] + [len(s) for s in STOPWORDS])
    sw_hashes = hash_bytes_segments(
        np.frombuffer(flat, dtype=np.uint8), offs.astype(np.int64)
    )

    def kernel(batch: pa.Table) -> pa.Table:
        th, offsets = tokenize_batch(batch.column("text"))
        ntok = (offsets[1:] - offsets[:-1]).astype(np.int64)
        is_sw = np.isin(th, sw_hashes).astype(np.int64)
        nsw = np.zeros(len(ntok), dtype=np.int64)
        nonempty = ntok > 0
        if nonempty.any() and len(is_sw):
            nsw[nonempty] = np.add.reduceat(is_sw, offsets[:-1][nonempty])
        ratio = round_half_away(
            np.where(ntok > 0, nsw / np.maximum(ntok, 1), 0.0), 6
        )
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_tokens": pa.array(ntok),
                "n_stopwords": pa.array(nsw),
                "stopword_ratio": pa.array(ratio),
            }
        )

    return read_documents(sf_dir, columns=["doc_id", "text"]).map_batches(
        kernel, batch_format="pyarrow", zero_copy_batch=True
    )


# --- language-ID heuristic (no SQL oracle: model-scored) ------------------

_PROFILES = {
    # tiny character-bigram profiles; deterministic stand-in for a real
    # langid model (fasttext etc. not installed). Actor-pool stage shape
    # is the real thing: profiles load once per actor.
    "en": ["th", "he", "in", "er", "an", "re"],
    "de": ["en", "er", "ch", "de", "ei", "ie"],
    "fr": ["es", "le", "de", "en", "re", "nt"],
    "es": ["de", "es", "en", "el", "la", "os"],
}


class LangId:
    """Vectorized bigram-profile scorer: one Arrow ``count_substring``
    per (lang, bigram) — no per-row Python. Every profile bigram has
    two DISTINCT characters, so non-overlapping occurrence counts equal
    position counts (an overlap would need bg[0] == bg[1]); and all
    profile bigrams are alphabetic, so the per-position isalpha gate of
    a naive scorer is a no-op. Ties go to the first language in
    profile order; score 0 -> 'und'."""

    def __init__(self):
        self.profiles = {
            lang: {bg: len(bgs) - i for i, bg in enumerate(bgs)}
            for lang, bgs in _PROFILES.items()
        }

    def __call__(self, batch: pa.Table) -> pa.Table:
        lower = pc.utf8_lower(pc.fill_null(batch.column("text"), ""))
        langs = list(self.profiles)
        scores = np.zeros((batch.num_rows, len(langs)), dtype=np.int64)
        for li, lang in enumerate(langs):
            for bg, w in self.profiles[lang].items():
                cnt = pc.count_substring(lower, bg).to_numpy(zero_copy_only=False)
                scores[:, li] += w * cnt.astype(np.int64)
        best = np.argmax(scores, axis=1)  # first max wins (profile order)
        maxsc = scores[np.arange(len(best)), best] if len(best) else np.empty(0, dtype=np.int64)
        lang_arr = np.array(langs, dtype=object)
        out = np.where(maxsc > 0, lang_arr[best], "und")
        return pa.table(
            {"doc_id": batch.column("doc_id"), "lang_pred": pa.array(out)}
        )


def langid(sf_dir: str):
    return read_documents(sf_dir, columns=["doc_id", "text"]).map_batches(
        LangId, batch_format="pyarrow", zero_copy_batch=True, concurrency=(1, 4)
    )


def repetition_stats(sf_dir: str, k: int = 3):
    """(doc_id, n_shingles_total, n_shingles_distinct, dup_frac) —
    intra-document repetition: the fraction of k-token shingle windows
    that are repeats of an earlier window in the SAME document (the
    Gopher-style "fraction of duplicate n-grams" quality signal; Rae
    et al. 2021 §A1.1). dup_frac = 1 - distinct/total (0 for docs with
    no shingles), rounded to 6 after the exact float64 division —
    fully SQL-expressible (COUNT vs COUNT(DISTINCT) per doc over the
    shingle CTEs)."""
    from humid_ray.functions.simhash import shingle_hashes
    from humid_ray.util import segment_unique

    def kernel(batch: pa.Table) -> pa.Table:
        th, offs = tokenize_batch(batch.column("text"))
        sh, sh_offs = shingle_hashes(th, offs, k)
        total = (sh_offs[1:] - sh_offs[:-1]).astype(np.int64)
        _, uoffs = segment_unique(sh, sh_offs)
        distinct = (uoffs[1:] - uoffs[:-1]).astype(np.int64)
        frac = 1.0 - np.divide(
            distinct.astype(np.float64),
            total.astype(np.float64),
            out=np.ones(len(total), dtype=np.float64),
            where=total > 0,
        )
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_shingles_total": pa.array(total),
                "n_shingles_distinct": pa.array(distinct),
                "dup_frac": pa.array(round_half_away(frac, 6)),
            }
        )

    return read_documents(sf_dir, columns=["doc_id", "text"]).map_batches(
        kernel, batch_format="pyarrow", zero_copy_batch=True
    )


def fingerprints(sf_dir: str):
    """(doc_id, fingerprint) — order-sensitive polynomial rolling hash
    over the token-hash sequence (winnowing-style document
    fingerprint), one vectorized reduceat kernel per batch — no
    per-document Python loop. Zero-token docs fingerprint to 0,
    keeping them distinguishable from any splitmix64-finalized
    content hash."""
    from humid_ray.util import hash_u64_segments

    def kernel(batch: pa.Table) -> pa.Table:
        th, offs = tokenize_batch(batch.column("text"))
        fp = hash_u64_segments(th, offs)
        # preserve the previous convention: docs with no tokens get 0
        lens = np.asarray(offs[1:]) - np.asarray(offs[:-1])
        fp = np.where(lens > 0, fp, UINT64(0))
        return pa.table(
            {"doc_id": batch.column("doc_id"), "fingerprint": u64col(fp)}
        )

    return read_documents(sf_dir, columns=["doc_id", "text"]).map_batches(
        kernel, batch_format="pyarrow", zero_copy_batch=True
    )


QUANTILES = (0.25, 0.5, 0.75, 0.9, 0.99)


_LENGTH_HIST_EMPTY = {
    "lang": pa.array([], type=pa.string()),
    "n_chars": pa.array([], type=pa.int64()),
    "n": pa.array([], type=pa.int64()),
}


def _length_hist_partial(t: pa.Table) -> pa.Table:
    """Per-batch (lang, n_chars) value-histogram combiner shared by
    length_quantiles / quantile_filter / length_deciles: the shuffle
    carries one row per distinct (lang, length) pair, never documents."""
    if t.num_rows == 0:
        return pa.table(_LENGTH_HIST_EMPTY)
    lang = np.asarray(t.column("lang").to_pylist(), dtype=object)
    ln = t.column("n_chars").to_numpy(zero_copy_only=False)
    order = np.lexsort((ln, lang))
    lang, ln = lang[order], ln[order]
    new = np.r_[True, (lang[1:] != lang[:-1]) | (ln[1:] != ln[:-1])]
    starts = np.flatnonzero(new)
    return pa.table(
        {"lang": pa.array(lang[starts].tolist(), type=pa.string()),
         "n_chars": pa.array(ln[starts].astype(np.int64)),
         "n": pa.array(np.diff(np.r_[starts, len(ln)]).astype(np.int64))}
    )


def _merged_length_hist(g: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    """Group-kernel prologue shared by the three consumers: partials
    from different batches repeat values — sort by length and
    re-aggregate to one (sorted lengths, counts) histogram."""
    ln = g.column("n_chars").to_numpy(zero_copy_only=False)
    cnt = g.column("n").to_numpy(zero_copy_only=False)
    order = np.argsort(ln, kind="stable")
    ln, cnt = ln[order], cnt[order]
    keep = np.r_[True, ln[1:] != ln[:-1]]
    starts = np.flatnonzero(keep)
    return ln[starts], np.add.reduceat(cnt, starts)


def length_quantiles(sf_dir: str):
    """(lang, n_docs, p25, p50, p75, p90, p99): EXACT per-language
    discrete quantiles of document length.

    Scale shape: a distributed exact quantile normally needs a full
    sort, but the value domain (n_chars) is small-cardinality, so the
    per-batch combiner collapses each batch to (lang, n_chars, count)
    rows — a VALUE HISTOGRAM. Shuffle volume is distinct (lang, len)
    pairs, never documents; the per-lang kernel folds the histogram
    through the shared helper (util.weighted_discrete_quantiles,
    ceil(q*n)-1 index math bit-matching DuckDB's quantile_disc)."""
    from humid_ray.util import weighted_discrete_quantiles

    partial = _length_hist_partial

    cols = ["p25", "p50", "p75", "p90", "p99"]

    def quantile_group(g: pa.Table) -> pa.Table:
        empty = {"lang": pa.array([], type=pa.string()),
                 "n_docs": pa.array([], type=pa.int64()),
                 **{c: pa.array([], type=pa.int64()) for c in cols}}
        if g.num_rows == 0:
            return pa.table(empty)
        ln, cnt = _merged_length_hist(g)
        out = {"lang": g.column("lang").slice(0, 1),
               "n_docs": pa.array([int(cnt.sum())], type=pa.int64())}
        for c, val in zip(cols,
                          weighted_discrete_quantiles(ln, cnt, QUANTILES)):
            out[c] = pa.array([val], type=pa.int64())
        return pa.table(out)

    return (
        read_documents(sf_dir, columns=["lang", "n_chars"])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("lang")
        .map_groups(quantile_group, batch_format="pyarrow")
    )


def _flat_tokens(texts) -> tuple[pa.Array, np.ndarray]:
    """Lowercase word tokens of each text as a flat Arrow string array
    plus int64 row offsets (the string twin of
    ``functions.text.tokenize_batch``, same token rule: [0-9a-z]+ runs
    of lower(text); null/empty texts yield zero tokens)."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    texts = pc.fill_null(pc.cast(texts, pa.string()), "")
    toks = pc.split_pattern_regex(pc.utf8_lower(texts), r"[^0-9a-z]+")
    flat = toks.flatten()
    offs = np.asarray(toks.offsets, dtype=np.int64)
    offs = offs - offs[0]
    nonempty = (pc.utf8_length(flat).to_numpy(zero_copy_only=False) > 0
                if len(flat) else np.empty(0, dtype=bool))
    lens = offs[1:] - offs[:-1]
    keep_per_row = np.zeros(len(offs) - 1, dtype=np.int64)
    has = lens > 0
    if has.any() and len(nonempty):
        keep_per_row[has] = np.add.reduceat(
            nonempty.astype(np.int64), offs[:-1][has]
        )
    new_offs = np.zeros(len(offs), dtype=np.int64)
    np.cumsum(keep_per_row, out=new_offs[1:])
    kept = flat.filter(pa.array(nonempty)) if len(flat) else flat
    if isinstance(kept, pa.ChunkedArray):
        kept = kept.combine_chunks()
    return kept, new_offs


_EMPTY_VOCAB_PARTIAL = {
    "token": pa.array([], type=pa.string()),
    "n_occurrences": pa.array([], type=pa.int64()),
    "n_docs": pa.array([], type=pa.int64()),
}


def vocab(sf_dir: str):
    """(token, n_occurrences, n_docs): global vocabulary — corpus-wide
    token frequency plus document frequency (the TF/DF table a
    tokenizer-training or TF-IDF stage consumes).

    The canonical hot-key shuffle ("the" appears in every document):
    the per-batch combiner collapses each batch to one row per
    DISTINCT token (Arrow C-speed group_by, no Python per token), so
    the shuffle carries |batch vocab| partials, never token
    occurrences, and a hot token costs one int64 add per batch in the
    final groupby — skew-proof by construction. Document frequency
    dedupes (row, token) pairs inside the same kernel before counting.
    """
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(_EMPTY_VOCAB_PARTIAL)
        kept, offs = _flat_tokens(batch.column("text"))
        if len(kept) == 0:
            return pa.table(_EMPTY_VOCAB_PARTIAL)
        rows = np.repeat(
            np.arange(batch.num_rows, dtype=np.int64), np.diff(offs)
        )
        pairs = pa.table({"token": kept, "row": pa.array(rows)})
        occ = pairs.group_by("token").aggregate([("row", "count")])
        dist = pairs.group_by(["token", "row"]).aggregate([])
        docs = dist.group_by("token").aggregate([("row", "count")])
        merged = occ.join(docs, keys="token", right_suffix="_d")
        return pa.table(
            {
                "token": merged.column("token"),
                "n_occurrences": merged.column("row_count").cast(pa.int64()),
                "n_docs": merged.column("row_count_d").cast(pa.int64()),
            }
        )

    return (
        read_documents(sf_dir, columns=["text"])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("token")
        .aggregate(Sum("n_occurrences", alias_name="n_occurrences"),
                   Sum("n_docs", alias_name="n_docs"))
    )


# --- PII redaction ---------------------------------------------------------

# RE2 patterns, portable verbatim to DuckDB's regexp_* (also RE2):
# tests/test_textstats.py pins engine/oracle parity on planted PII.
EMAIL_PATTERN = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
LONG_NUMBER_PATTERN = r"[0-9]{9,}"


def redact_pii(sf_dir: str):
    """(doc_id, redacted_text, n_emails, n_long_numbers): mask email
    addresses then 9+-digit runs (phone/account/SSN-class) — the
    standard pre-training scrub pass. Number counting runs AFTER email
    redaction (a digit run inside an address is one email, not two
    findings), the same composition order as the SQL oracle.

    Scale shape: one streaming ``map_batches`` over pruned columns;
    RE2 kernels (`pc.replace_substring_regex` / `count_substring_regex`)
    at C speed, no shuffle, no state."""

    def kernel(batch: pa.Table) -> pa.Table:
        text = pc.fill_null(pc.cast(batch.column("text"), pa.string()), "")
        n_emails = pc.count_substring_regex(text, EMAIL_PATTERN)
        no_email = pc.replace_substring_regex(
            text, pattern=EMAIL_PATTERN, replacement="<EMAIL>"
        )
        n_nums = pc.count_substring_regex(no_email, LONG_NUMBER_PATTERN)
        redacted = pc.replace_substring_regex(
            no_email, pattern=LONG_NUMBER_PATTERN, replacement="<NUMBER>"
        )
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "redacted_text": redacted,
                "n_emails": n_emails.cast(pa.int64()),
                "n_long_numbers": n_nums.cast(pa.int64()),
            }
        )

    return read_documents(sf_dir, columns=["doc_id", "text"]).map_batches(
        kernel, batch_format="pyarrow", zero_copy_batch=True
    )


def redact_pii_sql() -> str:
    """DuckDB oracle for ``redact_pii`` (same RE2 patterns, same
    email-then-number composition order)."""
    return (
        "SELECT doc_id, "
        f"regexp_replace(regexp_replace(coalesce(text,''), '{EMAIL_PATTERN}', "
        f"'<EMAIL>', 'g'), '{LONG_NUMBER_PATTERN}', '<NUMBER>', 'g') "
        "AS redacted_text, "
        f"CAST(len(regexp_extract_all(coalesce(text,''), '{EMAIL_PATTERN}')) "
        "AS BIGINT) AS n_emails, "
        f"CAST(len(regexp_extract_all(regexp_replace(coalesce(text,''), "
        f"'{EMAIL_PATTERN}', '<EMAIL>', 'g'), '{LONG_NUMBER_PATTERN}')) "
        "AS BIGINT) AS n_long_numbers "
        "FROM documents"
    )


def quantile_filter(sf_dir: str, lo: float = 0.05, hi: float = 0.95):
    """(doc_id, lang, n_chars): documents whose length lies inside the
    per-language [lo, hi] discrete-quantile band — the
    percentile-based quality gate (drop per-language outliers: empty
    shells below p05, concatenation blobs above p95).

    Scale shape: the thresholds come from the same value-histogram
    combiner as ``length_quantiles`` (shuffle = distinct (lang, len)
    pairs, never rows; a |langs|-row driver pull), then one streaming
    vectorized filter with a broadcast |langs|-dict. Index math is
    ceil(q*n)-1, bit-matching DuckDB quantile_disc."""
    import math

    partial = _length_hist_partial

    def band_group(g: pa.Table) -> pa.Table:
        empty = {"lang": pa.array([], type=pa.string()),
                 "ql": pa.array([], type=pa.int64()),
                 "qh": pa.array([], type=pa.int64())}
        if g.num_rows == 0:
            return pa.table(empty)
        ln, cnt = _merged_length_hist(g)
        cum = np.cumsum(cnt)
        n = int(cum[-1])
        vals = []
        for q in (lo, hi):
            idx = math.ceil(q * n) - 1
            vals.append(int(ln[np.searchsorted(cum, idx + 1)]))
        return pa.table({"lang": g.column("lang").slice(0, 1),
                         "ql": pa.array([vals[0]], type=pa.int64()),
                         "qh": pa.array([vals[1]], type=pa.int64())})

    bands = (
        read_documents(sf_dir, columns=["lang", "n_chars"])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("lang")
        .map_groups(band_group, batch_format="pyarrow")
        .take_all()
    )
    band = {r["lang"]: (r["ql"], r["qh"]) for r in bands}

    def keep_kernel(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        lang = np.asarray(batch.column("lang").to_pylist(), dtype=object)
        ln = batch.column("n_chars").to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(lang, return_inverse=True)
        ql = np.array([band.get(v, (1, 0))[0] for v in uniq], dtype=np.int64)
        qh = np.array([band.get(v, (1, 0))[1] for v in uniq], dtype=np.int64)
        return batch.filter(pa.array((ln >= ql[inv]) & (ln <= qh[inv])))

    return read_documents(
        sf_dir, columns=["doc_id", "lang", "n_chars"]
    ).map_batches(keep_kernel, batch_format="pyarrow", zero_copy_batch=True)


def quantile_filter_sql(table: str = "documents",
                        lo: float = 0.05, hi: float = 0.95) -> str:
    """DuckDB oracle for ``quantile_filter``."""
    return (
        f"WITH t AS (SELECT lang, "
        f"quantile_disc(n_chars, {lo}) AS ql, "
        f"quantile_disc(n_chars, {hi}) AS qh FROM {table} GROUP BY lang) "
        f"SELECT d.doc_id, d.lang, d.n_chars FROM {table} d "
        "JOIN t USING (lang) WHERE d.n_chars BETWEEN t.ql AND t.qh"
    )


def zscore_lengths(sf_dir: str):
    """(doc_id, lang, n_chars, z): per-language z-score of document
    length — the per-group feature-normalization pass (z = (x - mean) /
    population std), the window-function shape ``(x - AVG(x) OVER
    lang) / STDDEV_POP(x) OVER lang``.

    Scale shape: pass 1 collapses each batch to one (lang, n, sum,
    sumsq) row (sums exact in int64), a |langs|-row groupby + driver
    pull; pass 2 is one streaming map with a broadcast |langs| dict.
    Mean/std are derived from the integer sums in the same float64
    operation order as the SQL oracle, so round6 matches bit-for-bit.
    Degenerate groups (std == 0) emit z = 0, like the oracle's CASE."""
    _empty = {
        "lang": pa.array([], type=pa.string()),
        "n": pa.array([], type=pa.int64()),
        "s1": pa.array([], type=pa.int64()),
        "s2": pa.array([], type=pa.int64()),
    }

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(_empty)
        lang = np.asarray(t.column("lang").to_pylist(), dtype=object)
        x = t.column("n_chars").to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(lang, return_inverse=True)
        g = len(uniq)
        n = np.bincount(inv, minlength=g).astype(np.int64)
        s1 = np.zeros(g, dtype=np.int64)
        np.add.at(s1, inv, x)
        s2 = np.zeros(g, dtype=np.int64)
        np.add.at(s2, inv, x * x)
        return pa.table(
            {"lang": pa.array(uniq.tolist(), type=pa.string()),
             "n": pa.array(n), "s1": pa.array(s1), "s2": pa.array(s2)}
        )

    from ray.data.aggregate import Sum

    moments = (
        read_documents(sf_dir, columns=["lang", "n_chars"])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("lang")
        .aggregate(Sum("n", alias_name="n"), Sum("s1", alias_name="s1"),
                   Sum("s2", alias_name="s2"))
        .take_all()
    )
    stats = {}
    for r in moments:
        n = np.float64(r["n"])
        mean = np.float64(r["s1"]) / n
        var = np.float64(r["s2"]) / n - mean * mean
        std = np.sqrt(var) if var > 0 else np.float64(0.0)
        stats[r["lang"]] = (mean, std)

    def kernel(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {"doc_id": pa.array([], type=pa.int64()),
                 "lang": pa.array([], type=pa.string()),
                 "n_chars": pa.array([], type=pa.int64()),
                 "z": pa.array([], type=pa.float64())}
            )
        lang = np.asarray(batch.column("lang").to_pylist(), dtype=object)
        x = batch.column("n_chars").to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(lang, return_inverse=True)
        mean = np.array([stats.get(v, (0.0, 0.0))[0] for v in uniq])
        std = np.array([stats.get(v, (0.0, 0.0))[1] for v in uniq])
        m, s = mean[inv], std[inv]
        with np.errstate(invalid="ignore", divide="ignore"):
            z = np.where(s > 0, (x - m) / s, 0.0)
        return pa.table(
            {"doc_id": batch.column("doc_id"),
             "lang": batch.column("lang"),
             "n_chars": batch.column("n_chars"),
             "z": pa.array(round_half_away(z, 6))}
        )

    return read_documents(
        sf_dir, columns=["doc_id", "lang", "n_chars"]
    ).map_batches(kernel, batch_format="pyarrow", zero_copy_batch=True)


def zscore_lengths_sql(table: str = "documents") -> str:
    """DuckDB oracle for ``zscore_lengths`` — same integer sums, same
    float64 operation order (mean = s1/n; var = s2/n - mean^2)."""
    return (
        f"WITH s AS (SELECT lang, count(*) AS n, sum(n_chars) AS s1, "
        f"sum(n_chars * n_chars) AS s2 FROM {table} GROUP BY lang), "
        "m AS (SELECT lang, CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS mean, "
        "CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE) "
        "- (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)) "
        "* (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)) AS var FROM s) "
        f"SELECT d.doc_id, d.lang, d.n_chars, "
        "CASE WHEN m.var > 0 THEN round((d.n_chars - m.mean) "
        "/ sqrt(m.var), 6) ELSE 0.0 END AS z "
        f"FROM {table} d JOIN m USING (lang)"
    )


def length_deciles(sf_dir: str):
    """(doc_id, lang, n_chars, decile): per-language decile of document
    length, decile = ceil(10 * cume_dist) computed in EXACT integer
    arithmetic (ceil(10*cle/n) = (10*cle + n - 1) // n, cle = docs with
    length <= x in the language) — deterministic under ties, no
    floating-point boundary flips.

    Scale shape: the same value-histogram combiner as
    ``length_quantiles`` (shuffle = distinct (lang, len) pairs); the
    per-lang cumulative table is a broadcast dict keyed by lang with a
    sorted value array + decile array, probed by searchsorted in one
    streaming pass."""
    partial = _length_hist_partial

    def decile_group(g: pa.Table) -> pa.Table:
        empty = {"lang": pa.array([], type=pa.string()),
                 "n_chars": pa.array([], type=pa.int64()),
                 "decile": pa.array([], type=pa.int64())}
        if g.num_rows == 0:
            return pa.table(empty)
        ln, cnt = _merged_length_hist(g)
        cle = np.cumsum(cnt)
        n = int(cle[-1])
        dec = (10 * cle + n - 1) // n
        return pa.table(
            {"lang": pa.array([g.column("lang")[0].as_py()] * len(ln),
                              type=pa.string()),
             "n_chars": pa.array(ln.astype(np.int64)),
             "decile": pa.array(dec.astype(np.int64))}
        )

    table = (
        read_documents(sf_dir, columns=["lang", "n_chars"])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("lang")
        .map_groups(decile_group, batch_format="pyarrow")
        .take_all()
    )
    lut: dict[str, tuple[np.ndarray, np.ndarray]] = {}
    by_lang: dict[str, list[tuple[int, int]]] = {}
    for r in table:
        by_lang.setdefault(r["lang"], []).append((r["n_chars"], r["decile"]))
    for k, rows in by_lang.items():
        rows.sort()
        lut[k] = (np.array([a for a, _ in rows], dtype=np.int64),
                  np.array([b for _, b in rows], dtype=np.int64))

    def kernel(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {"doc_id": pa.array([], type=pa.int64()),
                 "lang": pa.array([], type=pa.string()),
                 "n_chars": pa.array([], type=pa.int64()),
                 "decile": pa.array([], type=pa.int64())}
            )
        lang = np.asarray(batch.column("lang").to_pylist(), dtype=object)
        x = batch.column("n_chars").to_numpy(zero_copy_only=False)
        dec = np.zeros(len(x), dtype=np.int64)
        for v in np.unique(lang):
            vals, decs = lut.get(v, (np.empty(0, np.int64),
                                     np.empty(0, np.int64)))
            mask = lang == v
            if len(vals):
                dec[mask] = decs[np.searchsorted(vals, x[mask])]
        return pa.table(
            {"doc_id": batch.column("doc_id"),
             "lang": batch.column("lang"),
             "n_chars": batch.column("n_chars"),
             "decile": pa.array(dec)}
        )

    return read_documents(
        sf_dir, columns=["doc_id", "lang", "n_chars"]
    ).map_batches(kernel, batch_format="pyarrow", zero_copy_batch=True)


def length_deciles_sql(table: str = "documents") -> str:
    """DuckDB oracle for ``length_deciles`` — the same exact integer
    ceil-division over cumulative counts."""
    return (
        f"WITH c AS (SELECT lang, n_chars, count(*) AS cnt FROM {table} "
        "GROUP BY lang, n_chars), "
        "agg AS (SELECT lang, n_chars, "
        "sum(cnt) OVER (PARTITION BY lang ORDER BY n_chars) AS cle, "
        "sum(cnt) OVER (PARTITION BY lang) AS n FROM c) "
        f"SELECT d.doc_id, d.lang, d.n_chars, "
        "CAST((10 * a.cle + a.n - 1) // a.n AS BIGINT) AS decile "
        f"FROM {table} d JOIN agg a USING (lang, n_chars)"
    )


def tfidf_top_terms(sf_dir: str, k: int = 3):
    """(doc_id, token, score, rank): the k highest-TF-IDF tokens per
    document (score = tf * ln(N / df), rank by score DESC then token
    ASC) — the per-document keyword/indexing operator.

    Scale shape: document frequencies come from the skew-proof
    ``vocab`` combiner; the (token -> idf) table is broadcast ONCE via
    ``ray.put`` as sorted arrays probed with searchsorted (document
    the ceiling: a natural-language vocabulary is ~1e8 tokens — far
    under worker heap; beyond that, hash-join tf rows to the df table
    like the candidate-text verify path, dedup_text.py). Scoring is
    one streaming pass: per-batch (row, token) tf via lexsort +
    segment counts, top-k per row via one more lexsort — no per-row
    Python. idf uses scalar libm ``math.log`` per DISTINCT vocab
    token (numpy's vectorized log differs from libm in the last ulp,
    which would break hash parity with DuckDB's ``ln``)."""
    import math

    import ray as _ray

    n_total = read_documents(sf_dir, columns=["doc_id"]).count()
    _empty = pa.table(
        {"doc_id": pa.array([], type=pa.int64()),
         "token": pa.array([], type=pa.string()),
         "score": pa.array([], type=pa.float64()),
         "rank": pa.array([], type=pa.int64())}
    )
    if n_total == 0:
        return ray.data.from_arrow(_empty)

    parts = [
        (np.asarray(b.column("token").to_pylist(), dtype=object),
         b.column("n_docs").to_numpy(zero_copy_only=False))
        for b in vocab(sf_dir).iter_batches(batch_size=262144,
                                            batch_format="pyarrow")
    ]
    if parts:
        vtok = np.concatenate([p[0] for p in parts])
        vdf = np.concatenate([p[1] for p in parts])
        order = np.argsort(vtok, kind="stable")
        vtok, vdf = vtok[order], vdf[order]
    else:
        vtok = np.empty(0, dtype=object)
        vdf = np.empty(0, dtype=np.int64)
    # scalar libm log per distinct token: bit-parity with DuckDB ln
    vidf = np.array([math.log(float(n_total) / d) for d in vdf.tolist()],
                    dtype=np.float64)
    ref = _ray.put((vtok, vidf))

    def kernel(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _empty
        keys, idf = _ray.get(ref)
        flat, offs = _flat_tokens(batch.column("text"))
        if len(flat) == 0:
            return _empty
        toks = np.asarray(flat.to_pylist(), dtype=object)
        doc = batch.column("doc_id").to_numpy(zero_copy_only=False)
        rows = np.repeat(np.arange(batch.num_rows), offs[1:] - offs[:-1])
        # (row, token) term frequencies: one lexsort + segment count
        order = np.lexsort((toks, rows))
        rs, ts = rows[order], toks[order]
        new = np.r_[True, (rs[1:] != rs[:-1]) | (ts[1:] != ts[:-1])]
        starts = np.flatnonzero(new)
        tf = np.diff(np.r_[starts, len(rs)]).astype(np.int64)
        rs, ts = rs[starts], ts[starts]
        pos = np.searchsorted(keys, ts)
        pos = np.minimum(pos, max(len(keys) - 1, 0))
        score = tf.astype(np.float64) * idf[pos]
        # top-k per row by (score DESC, token ASC)
        sel = np.lexsort((ts, -score, rs))
        rs2 = rs[sel]
        first = np.r_[True, rs2[1:] != rs2[:-1]]
        seg_start = np.maximum.accumulate(
            np.where(first, np.arange(len(rs2)), 0)
        )
        rank = np.arange(len(rs2)) - seg_start
        keep = rank < k
        sel = sel[keep]
        return pa.table(
            {"doc_id": pa.array(doc[rs[sel]].astype(np.int64)),
             "token": pa.array(ts[sel].tolist(), type=pa.string()),
             "score": pa.array(round_half_away(score[sel], 6)),
             "rank": pa.array((rank[keep] + 1).astype(np.int64))}
        )

    return read_documents(
        sf_dir, columns=["doc_id", "text"]
    ).map_batches(kernel, batch_format="pyarrow", zero_copy_batch=True)


def tfidf_top_terms_sql(table: str = "documents", k: int = 3) -> str:
    """DuckDB oracle for ``tfidf_top_terms`` (same token rule as
    vocab_docs; ln over the same doubles; ranking on the unrounded
    score)."""
    return (
        "WITH toks AS (SELECT doc_id, unnest(regexp_extract_all("
        f"lower(coalesce(text,'')), '[0-9a-z]+')) AS token FROM {table}), "
        "tf AS (SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf "
        "FROM toks GROUP BY doc_id, token), "
        "df AS (SELECT token, count(DISTINCT doc_id) AS df "
        "FROM toks GROUP BY token), "
        f"n AS (SELECT count(*) AS n FROM {table}), "
        "scored AS (SELECT tf.doc_id, tf.token, "
        "CAST(tf.tf AS DOUBLE) * ln(CAST(n.n AS DOUBLE) / df.df) AS score "
        "FROM tf JOIN df USING (token), n), "
        "r AS (SELECT doc_id, token, score, row_number() OVER "
        "(PARTITION BY doc_id ORDER BY score DESC, token) AS \"rank\" "
        "FROM scored) "
        "SELECT doc_id, token, round(score, 6) AS score, "
        f"CAST(\"rank\" AS BIGINT) AS \"rank\" FROM r WHERE \"rank\" <= {k}"
    )


def inverted_index(sf_dir: str, max_df: int = 100):
    """(token, doc_id): the exploded posting lists of the inverted
    index, restricted to tokens with document frequency <= ``max_df``
    (the useful tail — Zipf-head tokens like "the" appear in every
    document, and their posting lists are both enormous and useless
    for lookup; real systems stopword them out).

    Scale shape: the head exclusion IS the skew fix — pass 1 finds
    hot tokens (df > max_df) with the vocab combiner (shuffle =
    distinct tokens per batch) and broadcasts the SMALL hot set (the
    head of a Zipf distribution is short by definition); pass 2
    dedupes (doc, token) pairs per batch, drops hot tokens before the
    shuffle, and a final groupby dedupes cross-batch. No group ever
    exceeds max_df rows."""
    import ray as _ray

    hot_parts = [
        np.asarray(b.column("token").to_pylist(), dtype=object)[
            b.column("n_docs").to_numpy(zero_copy_only=False) > max_df
        ]
        for b in vocab(sf_dir).iter_batches(batch_size=262144,
                                            batch_format="pyarrow")
    ]
    hot = (np.sort(np.concatenate(hot_parts)) if hot_parts
           else np.empty(0, dtype=object))
    ref = _ray.put(hot)

    _empty = pa.table({"token": pa.array([], type=pa.string()),
                       "doc_id": pa.array([], type=pa.int64())})

    def pairs(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _empty
        hot_keys = _ray.get(ref)
        flat, offs = _flat_tokens(batch.column("text"))
        if len(flat) == 0:
            return _empty
        toks = np.asarray(flat.to_pylist(), dtype=object)
        doc = batch.column("doc_id").to_numpy(zero_copy_only=False)
        rows = np.repeat(np.arange(batch.num_rows), offs[1:] - offs[:-1])
        order = np.lexsort((toks, rows))
        rs, ts = rows[order], toks[order]
        keep = np.r_[True, (rs[1:] != rs[:-1]) | (ts[1:] != ts[:-1])]
        rs, ts = rs[keep], ts[keep]
        if len(hot_keys):
            pos = np.searchsorted(hot_keys, ts)
            pos = np.minimum(pos, len(hot_keys) - 1)
            cold = hot_keys[pos] != ts
            rs, ts = rs[cold], ts[cold]
        return pa.table(
            {"token": pa.array(ts.tolist(), type=pa.string()),
             "doc_id": pa.array(doc[rs].astype(np.int64))}
        )

    def drop_count(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _empty
        return t.select(["token", "doc_id"])

    # cross-batch dedupe as a plain pair aggregate (no per-group
    # Python); batch-level dedupe above already collapsed the volume
    return (
        read_documents(sf_dir, columns=["doc_id", "text"])
        .map_batches(pairs, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["token", "doc_id"])
        .aggregate(Count(alias_name="_n"))
        .map_batches(drop_count, batch_format="pyarrow")
    )


def inverted_index_sql(table: str = "documents", max_df: int = 100) -> str:
    """DuckDB oracle for ``inverted_index``."""
    return (
        "WITH toks AS (SELECT DISTINCT doc_id, "
        "unnest(regexp_extract_all(lower(coalesce(text,'')), '[0-9a-z]+')) "
        f"AS token FROM {table}), "
        "df AS (SELECT token, count(*) AS df FROM toks GROUP BY token) "
        "SELECT t.token, t.doc_id FROM toks t JOIN df USING (token) "
        f"WHERE df.df <= {max_df}"
    )


# --- corpus-wide n-gram heavy hitters --------------------------------------

_EMPTY_BIGRAM_PARTIAL = {
    "bigram": pa.array([], type=pa.string()),
    "n": pa.array([], type=pa.int64()),
}


def _flat_bigrams(texts) -> pa.Array:
    """Adjacent within-document token bigrams ("tok1 tok2") of a text
    column as one flat Arrow string array — vectorized: token pair
    starts are every flat position whose successor lies in the same
    row (row boundaries masked out), joined with one Arrow kernel."""
    kept, offs = _flat_tokens(texts)
    n = len(kept)
    if n < 2:
        return pa.array([], type=pa.string())
    valid = np.ones(n - 1, dtype=bool)
    ends = offs[1:-1]  # interior row boundaries: i = end-1 crosses rows
    ends = ends[(ends > 0) & (ends < n)]
    valid[ends - 1] = False
    if not valid.any():
        return pa.array([], type=pa.string())
    vmask = pa.array(valid)
    lhs = kept.slice(0, n - 1).filter(vmask)
    rhs = kept.slice(1, n - 1).filter(vmask)
    return pc.binary_join_element_wise(lhs, rhs, " ")


def top_bigrams(sf_dir: str, k: int = 50) -> pa.Table:
    """(bigram, n, rank): the k most frequent within-document token
    bigrams corpus-wide, rank ordered by count desc then bigram asc
    (deterministic cut). The heavy-hitters shape: each batch collapses
    to one partial row per DISTINCT bigram (Arrow C-speed group_by) so
    the shuffle carries batch-vocabulary partials, never occurrences —
    a boilerplate bigram appearing in every document costs one int64
    add per batch downstream. Global top-k = per-block local top-k
    (<= k rows leave each block) + a <= k x n_blocks driver merge,
    the same scale shape as ``relational.top_parts_by_revenue``."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(_EMPTY_BIGRAM_PARTIAL)
        bg = _flat_bigrams(batch.column("text"))
        if len(bg) == 0:
            return pa.table(_EMPTY_BIGRAM_PARTIAL)
        cnt = pa.table({"bigram": bg}).group_by("bigram").aggregate(
            [("bigram", "count")]
        )
        return pa.table(
            {"bigram": cnt.column("bigram"),
             "n": cnt.column("bigram_count").cast(pa.int64())}
        )

    agg = (
        read_documents(sf_dir, columns=["text"])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bigram")
        .aggregate(Sum("n", alias_name="n"))
    )

    def local_topk(t: pa.Table) -> pa.Table:
        if t.num_rows <= k:
            return t
        nn = t.column("n").to_numpy(zero_copy_only=False)
        order = np.lexsort(
            (np.asarray(t.column("bigram")), -nn)
        )[:k]
        return t.take(pa.array(np.sort(order)))

    chunks = list(
        agg.map_batches(local_topk, batch_format="pyarrow")
        .iter_batches(batch_size=65536, batch_format="pyarrow")
    )
    empty = pa.table(
        {"bigram": pa.array([], type=pa.string()),
         "n": pa.array([], type=pa.int64()),
         "rank": pa.array([], type=pa.int64())}
    )
    if not chunks:
        return empty
    cand = pa.concat_tables(chunks)
    if cand.num_rows == 0:
        return empty
    nn = cand.column("n").to_numpy(zero_copy_only=False)
    win = np.lexsort((np.asarray(cand.column("bigram")), -nn))[:k]
    out = cand.take(pa.array(win))
    return out.append_column(
        "rank", pa.array(np.arange(1, out.num_rows + 1, dtype=np.int64))
    )


def top_bigrams_sql(table: str = "documents", k: int = 50) -> str:
    """DuckDB oracle for ``top_bigrams`` (same token rule as
    ``_flat_tokens``; same count-desc-then-bigram-asc deterministic
    cut)."""
    return (
        "WITH toks AS (SELECT regexp_extract_all(lower(coalesce(text,'')), "
        f"'[0-9a-z]+') AS t FROM {table}), "
        "bg AS (SELECT unnest(list_transform(range(1, len(t)), "
        "i -> t[i] || ' ' || t[i+1])) AS bigram FROM toks "
        "WHERE len(t) >= 2), "
        "cnt AS (SELECT bigram, CAST(count(*) AS BIGINT) AS n "
        "FROM bg GROUP BY bigram) "
        "SELECT bigram, n, CAST(row_number() OVER "
        "(ORDER BY n DESC, bigram) AS BIGINT) AS rank "
        f"FROM cnt ORDER BY rank LIMIT {k}"
    )


# --- text normalization -----------------------------------------------------

def normalize_text(sf_dir: str):
    """(doc_id, norm_text, n_chars_norm): canonical text for
    downstream dedup — lowercase, whitespace runs collapsed to one
    space, trimmed. Pure Arrow kernels per batch (RE2, portable
    verbatim to the DuckDB oracle); a cheap map stage with no shuffle."""

    def kernel(batch: pa.Table) -> pa.Table:
        txt = pc.fill_null(pc.cast(batch.column("text"), pa.string()), "")
        # trim SPACES only (pc.utf8_trim_whitespace is Unicode-aware
        # and would strip chars like \x0b/U+2028 that neither RE2 \s+
        # nor DuckDB trim() touches — engine/oracle divergence); after
        # the RE2 collapse every \s edge run is already ' '
        norm = pc.utf8_trim(
            pc.replace_substring_regex(pc.utf8_lower(txt), r"\s+", " "),
            characters=" ",
        )
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "norm_text": norm,
                "n_chars_norm": pc.utf8_length(norm).cast(pa.int64()),
            }
        )

    return read_documents(sf_dir, columns=["doc_id", "text"]).map_batches(
        kernel, batch_format="pyarrow", zero_copy_batch=True
    )


def normalize_text_sql(table: str = "documents") -> str:
    """DuckDB oracle for ``normalize_text`` (same RE2 semantics)."""
    return (
        "SELECT doc_id, trim(regexp_replace(lower(coalesce(text, '')), "
        "'\\s+', ' ', 'g'), ' ') AS norm_text, "
        "CAST(length(trim(regexp_replace(lower(coalesce(text, '')), "
        "'\\s+', ' ', 'g'), ' ')) AS BIGINT) AS n_chars_norm "
        f"FROM {table}"
    )


# --- Count-min sketch frequency estimation -----------------------------------

CMS_W_BITS = 12  # 4096 counters per row
CMS_D = 4        # hash rows


def cms_token_freq(sf_dir: str, k: int = 20, w_bits: int = CMS_W_BITS,
                   d: int = CMS_D):
    """(token, exact_count, cms_count): Count-min-sketch frequency
    estimates (Cormode & Muthukrishnan, J.Alg 2005) for the corpus's
    top-k tokens, next to their exact counts — the fixed-memory
    frequency sketch completing the mergeable-sketch trio (HLL =
    distinct, HDR histogram = quantiles, CMS = frequency). Guarantee:
    cms_count >= exact_count always (counters only over-count).

    Scale shape: the sketch is a d x 2^w int64 counter matrix built as
    per-batch partials (one vectorized np.add.at per hash row over the
    batch's token occurrences) and merged by elementwise SUM — the
    shuffle carries |partials| x 128 KiB matrices, never tokens. Probe
    tokens come from the exact ``vocab`` aggregate (collapsed per-batch
    vocab partials), sorted (count DESC, token ASC) and cut at k.

    Positions use double hashing pos_i = (h1 + i*h2) mod 2^w with
    h1 = the engine's standard token hash and h2 = splitmix64(h1) —
    pure integer arithmetic, so the ENTIRE sketch re-derives
    bit-for-bit in DuckDB (``cms_token_freq_sql``), like the HLL and
    HDR oracles."""
    from humid_ray.stages.joins import hash_string_column
    from humid_ray.util import splitmix64

    m = 1 << w_bits
    mask = UINT64(m - 1)

    def sk_partial(t: pa.Table) -> pa.Table:
        cms = np.zeros((d, m), dtype=np.int64)
        if t.num_rows:
            h1, _ = tokenize_batch(t.column("text"))
            if len(h1):
                h2 = splitmix64(h1)
                for i in range(d):
                    with np.errstate(over="ignore"):
                        pos = ((h1 + UINT64(i) * h2) & mask).astype(np.int64)
                    np.add.at(cms[i], pos, 1)
        return pa.table({"cms": pa.array([cms.tobytes()], type=pa.binary())})

    # elementwise-sum the fixed-size partials driver-side (one 128 KiB
    # matrix, like the Bloom bitset OR-merge); rows never leave workers
    cms = np.zeros((d, m), dtype=np.int64)
    sk = read_documents(sf_dir, columns=["text"]).map_batches(
        sk_partial, batch_format="pyarrow", zero_copy_batch=True
    )
    for b in sk.iter_batches(batch_size=1024, batch_format="pyarrow"):
        for v in b.column("cms"):
            cms += np.frombuffer(v.as_py(), dtype=np.int64).reshape(d, m)

    # probe top-k without a global sort: after the vocab groupby each
    # token appears exactly once, so per-block local top-k (<= k rows
    # leave each block) + a <= k x |blocks| driver merge is exact —
    # the same cut top_bigrams uses
    def local_topk(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        idx = pc.sort_indices(
            t, sort_keys=[("n_occurrences", "descending"),
                          ("token", "ascending")]
        )[:k]
        return t.take(idx)

    cand = (vocab(sf_dir)
            .map_batches(local_topk, batch_format="pyarrow")
            .take_all())
    top = sorted(cand, key=lambda r: (-r["n_occurrences"], r["token"]))[:k]
    _empty = pa.table(
        {"token": pa.array([], type=pa.string()),
         "exact_count": pa.array([], type=pa.int64()),
         "cms_count": pa.array([], type=pa.int64())}
    )
    if not top:
        return _empty
    toks = [r["token"] for r in top]
    exact = np.array([r["n_occurrences"] for r in top], dtype=np.int64)
    h1 = hash_string_column(pa.array(toks, type=pa.string()))
    h2 = splitmix64(h1)
    est = np.full(len(toks), np.iinfo(np.int64).max, dtype=np.int64)
    for i in range(d):
        with np.errstate(over="ignore"):
            pos = ((h1 + UINT64(i) * h2) & mask).astype(np.int64)
        est = np.minimum(est, cms[i][pos])
    return pa.table(
        {"token": pa.array(toks, type=pa.string()),
         "exact_count": pa.array(exact),
         "cms_count": pa.array(est)}
    )


def cms_token_freq_sql(table: str = "documents", k: int = 20,
                       w_bits: int = CMS_W_BITS, d: int = CMS_D) -> str:
    """DuckDB oracle for ``cms_token_freq``: the whole sketch
    re-derived in SQL — token hash chain (polynomial byte fold +
    splitmix64), double-hashed positions, per-(row, position) counter
    sums over ALL token occurrences, min-over-rows estimate for the
    top-k probe tokens. All HUGEINT integer arithmetic: bit-exact."""
    from humid_ray.oracles import _horner_fold, _sm64_cols

    m = 1 << w_bits
    two64 = 1 << 64
    byte_list = (
        "list_transform(range(1, CAST(octet_length(encode(tok)) + 1 AS BIGINT)), "
        "jj -> CAST(CAST('0x' || substr(hex(encode(tok)), "
        "CAST(2*jj-1 AS INTEGER), 2) AS UBIGINT) AS HUGEINT))"
    )
    return (
        f"WITH toks AS (SELECT regexp_extract_all(lower(coalesce(text, '')), "
        f"'[0-9a-z]+') AS t FROM {table}), "
        "occ AS (SELECT unnest(t) AS tok FROM toks), "
        "cnt AS (SELECT tok, CAST(count(*) AS BIGINT) AS n FROM occ "
        "GROUP BY tok), "
        f"dh0 AS (SELECT tok, {_horner_fold(byte_list)} AS hraw FROM cnt), "
        f"dh1 AS (SELECT tok, {_sm64_cols('hraw', 'h')} FROM dh0), "
        f"dh AS (SELECT tok, h, {_sm64_cols('h', 'h2')} FROM dh1), "
        "ii AS (SELECT unnest(range(0, " + str(d) + ")) AS i), "
        f"cells AS (SELECT ii.i, ((dh.h + ii.i * dh.h2) % {two64}) % {m} "
        "AS pos, SUM(cnt.n) AS cell FROM cnt JOIN dh USING (tok) "
        "CROSS JOIN ii GROUP BY 1, 2), "
        f"probes AS (SELECT tok, n FROM cnt ORDER BY n DESC, tok LIMIT {k}), "
        f"pp AS (SELECT p.tok, p.n, ii.i, "
        f"((dh.h + ii.i * dh.h2) % {two64}) % {m} AS pos "
        "FROM probes p JOIN dh USING (tok) CROSS JOIN ii), "
        "est AS (SELECT pp.tok, pp.n, min(c.cell) AS e FROM pp "
        "JOIN cells c ON pp.i = c.i AND pp.pos = c.pos GROUP BY 1, 2) "
        "SELECT tok AS token, n AS exact_count, CAST(e AS BIGINT) "
        "AS cms_count FROM est"
    )


# --- unigram LM log-probability scoring ------------------------------------

def _unigram_sums(batch: pa.Table, tokens, llq) -> tuple[np.ndarray,
                                                         np.ndarray]:
    """Shared token-scoring body of the unigram LM scorers: tokenize
    the batch, probe the broadcast model with ``pc.index_in`` (C-speed
    string lookup), and return (n_tokens, int64 micro-nat log-prob
    sums) per document."""
    n = batch.num_rows
    kept, offs = _flat_tokens(batch.column("text"))
    ntok = (offs[1:] - offs[:-1]).astype(np.int64)
    sums = np.zeros(n, dtype=np.int64)
    if len(kept):
        idx = pc.fill_null(
            pc.index_in(kept, value_set=tokens), -1
        ).to_numpy(zero_copy_only=False)
        # every scored token was seen in the training pass (same
        # corpus); an out-of-vocab token would only appear if the two
        # passes read different data — score it 0 rather than crash
        # (the filtered-record rule). The empty-model branch matters:
        # np.where evaluates both arms, so indexing a zero-length llq
        # would raise even under the mask.
        if len(llq):
            llq_tok = np.where(idx >= 0, llq[np.maximum(idx, 0)], 0)
        else:
            llq_tok = np.zeros(len(idx), dtype=np.int64)
        has = ntok > 0
        sums[has] = np.add.reduceat(llq_tok, offs[:-1][has])
    return ntok, sums


class _UnigramScorer:
    """Per-doc average unigram log-probability under a broadcast
    (token -> quantized log-prob) model — ray.get once per actor,
    ``pc.index_in`` probe per batch (C-speed string lookup)."""

    def __init__(self, model_ref):
        import ray

        self.tokens, self.llq = ray.get(model_ref)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ntok, sums = _unigram_sums(batch, self.tokens, self.llq)
        n = batch.num_rows
        avg = np.zeros(n, dtype=np.float64)
        nz = ntok > 0
        avg[nz] = round_half_away(
            (sums[nz].astype(np.float64) / ntok[nz]) / 1e6, 6
        )
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_tokens": pa.array(ntok),
                "logprob_micro": pa.array(sums),
                "avg_logprob": pa.array(avg),
            }
        )


def _train_unigram_model(sf_dir: str):
    """Pass 1 of the unigram LM operators: corpus token counts via the
    skew-proof distinct-token combiner + one vocab-sized groupby, then
    per-token log-probs quantized to int64 MICRO-NATS (``math.log`` per
    DISTINCT count value — libm bit-parity with DuckDB ``ln``, and
    distinct counts are few even for huge vocabularies). Returns a
    ray.put ref to (tokens: pa.Array, llq: int64 np.ndarray); a
    token-free corpus yields an empty-vocab model (every doc then
    scores 0, matching the oracles' LEFT JOIN zeros). At 100 TB the
    model is vocab-sized (a few MB) — broadcast once, never
    reshuffled."""
    import math

    import ray
    from ray.data.aggregate import Sum as _Sum

    def count_partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {"token": pa.array([], type=pa.string()),
                 "cnt": pa.array([], type=pa.int64())}
            )
        kept, _ = _flat_tokens(batch.column("text"))
        if len(kept) == 0:
            return pa.table(
                {"token": pa.array([], type=pa.string()),
                 "cnt": pa.array([], type=pa.int64())}
            )
        agg = pa.table({"token": kept}).group_by("token").aggregate(
            [("token", "count")]
        )
        return pa.table(
            {"token": agg.column("token"),
             "cnt": agg.column("token_count").cast(pa.int64())}
        )

    counts = (
        read_documents(sf_dir, columns=["text"])
        .map_batches(count_partial, batch_format="pyarrow",
                     zero_copy_batch=True)
        .groupby("token")
        .aggregate(_Sum("cnt", alias_name="cnt"))
    )
    tok_chunks, cnt_chunks = [], []
    for b in counts.iter_batches(batch_size=262144, batch_format="pyarrow"):
        tok_chunks.append(b.column("token"))
        cnt_chunks.append(
            b.column("cnt").to_numpy(zero_copy_only=False).astype(np.int64)
        )
    if not tok_chunks:
        return ray.put((pa.array([], type=pa.string()),
                        np.empty(0, dtype=np.int64)))
    tokens = pa.concat_arrays(
        [c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c
         for c in tok_chunks]
    )
    cnt = np.concatenate(cnt_chunks)
    total = int(cnt.sum())
    ucnt, inv = np.unique(cnt, return_inverse=True)
    ullq = np.array(
        [math.log(int(c) / total) * 1e6 for c in ucnt], dtype=np.float64
    )
    llq = round_half_away(ullq, 0).astype(np.int64)[inv]
    return ray.put((tokens, llq))


def unigram_logprob(sf_dir: str):
    """(doc_id, n_tokens, logprob_micro, avg_logprob): each document's
    average token log-probability under the corpus's OWN unigram
    distribution — the CCNet/KenLM-class LM quality proxy (Wenzek et
    al. 2020 use an external LM; self-trained unigram is its
    model-free analog: gibberish and boilerplate-free rare-token soup
    score low, fluent common-token text scores high).

    Two-pass broadcast-model shape: pass 1 trains (the skew-proof
    ``vocab`` combiner collapses batches to distinct-token partials,
    one small groupby yields corpus counts; the vocabulary — NOT the
    corpus — is pulled once and quantized); pass 2 streams documents
    through an actor pool probing the broadcast model. Per-token
    log-probs are quantized to int64 MICRO-NATS before summation so
    the per-doc sum is associative and bit-equal to the SQL oracle
    regardless of reduction order (ln itself is bit-identical here:
    both numpy-side ``math.log`` and DuckDB ``ln`` call the platform
    libm; verified empirically over 3k values). At 100 TB the model is
    vocab-sized (a few MB) — broadcast once, never reshuffled."""
    model_ref = _train_unigram_model(sf_dir)
    return read_documents(sf_dir, columns=["doc_id", "text"]).map_batches(
        _UnigramScorer, fn_constructor_kwargs={"model_ref": model_ref},
        batch_format="pyarrow", zero_copy_batch=True, concurrency=(1, 8),
    )


def _unigram_per_ctes(table: str) -> str:
    """CTE chain ending in per(doc_id, n_tokens, s): per-doc token
    count and int64 micro-nat quantized unigram log-prob sum — shared
    by the unigram LM oracles."""
    return (
        "toks AS (SELECT doc_id, "
        "unnest(regexp_extract_all(lower(coalesce(text,'')), '[0-9a-z]+')) "
        f"AS token FROM {table}), "
        "freq AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS cnt "
        "FROM toks GROUP BY token), "
        "tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS total FROM freq), "
        "llq AS (SELECT token, CAST(round(ln(CAST(cnt AS DOUBLE) / total) "
        "* 1000000.0, 0) AS BIGINT) AS q FROM freq, tot), "
        "per AS (SELECT t.doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens, "
        "CAST(SUM(l.q) AS BIGINT) AS s FROM toks t "
        "JOIN llq l USING (token) GROUP BY t.doc_id)"
    )


def unigram_logprob_sql(table: str = "documents") -> str:
    """DuckDB oracle for ``unigram_logprob``: same tokenization as
    ``vocab``, per-token log-prob quantized to int64 micro-nats before
    the per-doc sum (associative — any reduction order gives the same
    bits), average divided in the same (sum / n) / 1e6 order."""
    return (
        f"WITH {_unigram_per_ctes(table)} "
        "SELECT d.doc_id, coalesce(p.n_tokens, 0) AS n_tokens, "
        "coalesce(p.s, 0) AS logprob_micro, "
        "round(CASE WHEN coalesce(p.n_tokens, 0) > 0 "
        "THEN (CAST(p.s AS DOUBLE) / p.n_tokens) / 1000000.0 "
        "ELSE 0 END, 6) AS avg_logprob "
        f"FROM {table} d LEFT JOIN per p USING (doc_id)"
    )


# --- CCNet-style head/middle/tail quality buckets ---------------------------

_EMPTY_CCNET = pa.table(
    {"doc_id": pa.array([], type=pa.int64()),
     "lang": pa.array([], type=pa.string()),
     "avg_micro": pa.array([], type=pa.int64()),
     "bucket_id": pa.array([], type=pa.int64()),
     "bucket": pa.array([], type=pa.string())}
)


class _CcnetScorer:
    """Like ``_UnigramScorer`` but emits the per-doc INTEGER average
    (micro-nats per token, round half away from zero) plus the lang
    column — the exact sort key the bucket rank runs on.

    Token-free documents (empty text, punctuation-only) carry NO
    fluency evidence, so they must rank WORST, not best: every real
    score is strictly negative, and a 0 average would put garbage at
    the head of the ranking. They get a sentinel one micro-nat below
    the rarest token's log-prob (``min(llq) - 1``; ``-1`` for an
    empty-vocab corpus, where every doc ties) — matched bit-for-bit
    by the oracle's ``coalesce(min(q), 0) - 1``."""

    def __init__(self, model_ref):
        import ray

        self.tokens, self.llq = ray.get(model_ref)
        self.sentinel = (int(self.llq.min()) - 1) if len(self.llq) else -1

    def __call__(self, batch: pa.Table) -> pa.Table:
        ntok, sums = _unigram_sums(batch, self.tokens, self.llq)
        avg_micro = np.full(batch.num_rows, self.sentinel, dtype=np.int64)
        nz = ntok > 0
        avg_micro[nz] = round_half_away(
            sums[nz].astype(np.float64) / ntok[nz], 0
        ).astype(np.int64)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "lang": batch.column("lang"),
                "avg_micro": pa.array(avg_micro),
            }
        )


def ccnet_buckets(sf_dir: str):
    """(doc_id, lang, avg_micro, bucket_id, bucket): the CCNet
    head/middle/tail split (Wenzek et al. 2020) — per LANGUAGE, rank
    documents by LM quality (average unigram log-prob, integer
    micro-nats; best first, doc_id tiebreak) and cut the ranking into
    thirds: bucket 1 = 'head' (most fluent), 2 = 'middle',
    3 = 'tail'. The bucket rule is ntile-style EXACT integer math,
    ceil(3*rank/n) — deterministic under ties and bit-matched by the
    SQL window oracle.

    Scale shape: pass 1 trains the broadcast unigram model; pass 2
    streams docs through the scorer actor pool; the per-lang rank is
    the shared distributed exclusive scan (sampled range partitioner,
    |buckets|-row driver exscan) over a composite int64 key
    (lang_idx << 34 | 2^32 - avg_micro), with per-lang rank offsets
    from a |langs|-row count groupby — no corpus-sized sort or
    materialization anywhere."""
    import ray
    from ray.data.aggregate import Count as _Count

    from humid_ray.pipelines.shards import N_RANGE_BUCKETS, _exclusive_scan

    model_ref = _train_unigram_model(sf_dir)
    scored = read_documents(
        sf_dir, columns=["doc_id", "lang", "text"]
    ).map_batches(
        _CcnetScorer, fn_constructor_kwargs={"model_ref": model_ref},
        batch_format="pyarrow", zero_copy_batch=True, concurrency=(1, 8),
    ).materialize()
    # |langs|-row stats: deterministic lang -> idx, per-lang start rank
    lang_rows: dict = {}
    for b in (
        scored.groupby("lang").aggregate(_Count(alias_name="n"))
        .iter_batches(batch_size=65536, batch_format="pyarrow")
    ):
        lang_rows.update(zip(b.column("lang").to_pylist(),
                             b.column("n").to_pylist()))
    if not lang_rows:
        # an empty Ray Data groupby drops its schema — hand back a
        # typed empty table instead of running the scan on nothing
        return ray.data.from_arrow(_EMPTY_CCNET)
    langs = sorted(lang_rows, key=lambda x: (x is None, x))
    lang_idx = {v: i for i, v in enumerate(langs)}
    lang_n = np.array([lang_rows[v] for v in langs], dtype=np.int64)
    lang_start = np.zeros(len(langs), dtype=np.int64)
    np.cumsum(lang_n[:-1], out=lang_start[1:])
    idx_ref = ray.put(lang_idx)

    def keyed(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column("key", pa.array([], type=pa.int64()))
        lm = ray.get(idx_ref)
        li = np.array([lm[v] for v in t.column("lang").to_pylist()],
                      dtype=np.int64)
        am = t.column("avg_micro").to_numpy(zero_copy_only=False)
        key = (li << 34) | ((np.int64(1) << 32) - am)
        return t.append_column("key", pa.array(key))

    keyed_ds = scored.map_batches(
        keyed, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    names = np.array(["head", "middle", "tail"], dtype=object)

    def finalize(cols, excl):
        li = (cols["key"] >> 34).astype(np.int64)
        rn = excl - lang_start[li] + 1
        n = lang_n[li]
        bucket_id = (3 * rn + n - 1) // n
        return pa.table(
            {
                "doc_id": pa.array(cols["doc_id"].astype(np.int64)),
                "lang": pa.array(cols["lang"].tolist(), type=pa.string()),
                "avg_micro": pa.array(cols["avg_micro"].astype(np.int64)),
                "bucket_id": pa.array(bucket_id.astype(np.int64)),
                "bucket": pa.array(names[bucket_id - 1].tolist(),
                                   type=pa.string()),
            }
        )

    return _exclusive_scan(keyed_ds, "key", None, N_RANGE_BUCKETS,
                           finalize, _EMPTY_CCNET)


def ccnet_buckets_sql(table: str = "documents") -> str:
    """DuckDB oracle for ``ccnet_buckets``: the same quantized unigram
    scores, ranked per lang by avg_micro DESC (doc_id tiebreak) with
    the identical ceil(3*rank/n) integer cut."""
    return (
        f"WITH {_unigram_per_ctes(table)}, "
        "sc AS (SELECT d.doc_id, d.lang, "
        "CASE WHEN coalesce(p.n_tokens, 0) > 0 THEN "
        "CAST(round(CAST(p.s AS DOUBLE) / p.n_tokens, 0) AS BIGINT) "
        "ELSE (SELECT coalesce(min(q), 0) - 1 FROM llq) END AS avg_micro "
        f"FROM {table} d LEFT JOIN per p USING (doc_id)), "
        "r AS (SELECT doc_id, lang, avg_micro, "
        "row_number() OVER (PARTITION BY lang "
        "ORDER BY avg_micro DESC, doc_id ASC) AS rn, "
        "COUNT(*) OVER (PARTITION BY lang) AS n FROM sc) "
        "SELECT doc_id, lang, avg_micro, "
        "CAST((3 * rn + n - 1) // n AS BIGINT) AS bucket_id, "
        "CASE (3 * rn + n - 1) // n WHEN 1 THEN 'head' "
        "WHEN 2 THEN 'middle' ELSE 'tail' END AS bucket FROM r"
    )


# --- keyword blocklist filter ----------------------------------------------

BLOCKLIST_TERMS = ("casino", "viagra", "lottery", "jackpot", "betting")


def keyword_filter(sf_dir: str, terms: tuple[str, ...] = BLOCKLIST_TERMS):
    """(doc_id, n_hits, blocked): per-document occurrence count of a
    blocklist term set (case-insensitive substring semantics — the
    standard spam/toxicity keyword screen a curation pipeline runs
    before any model-based scoring). ``n_hits`` sums non-overlapping
    occurrences over all terms; ``blocked`` flags any hit.

    Scale shape: shuffle-free — the term list is a constant closure
    (broadcast-by-capture; for a 10^5-term production list swap the
    per-term loop for one Aho-Corasick automaton in an actor pool,
    same stage shape), each batch is lowered once and scanned with
    Arrow's C-speed ``count_substring`` per term."""
    terms = tuple(t.lower() for t in terms)

    def kernel(t: pa.Table) -> pa.Table:
        n = t.num_rows
        if n == 0:
            return pa.table(
                {"doc_id": pa.array([], type=pa.int64()),
                 "n_hits": pa.array([], type=pa.int64()),
                 "blocked": pa.array([], type=pa.bool_())}
            )
        lt = pc.utf8_lower(pc.coalesce(t.column("text"), ""))
        hits = np.zeros(n, dtype=np.int64)
        for term in terms:
            hits += pc.count_substring(lt, term).to_numpy(
                zero_copy_only=False
            ).astype(np.int64)
        return pa.table(
            {"doc_id": t.column("doc_id"),
             "n_hits": pa.array(hits),
             "blocked": pa.array(hits > 0)}
        )

    return read_documents(sf_dir, columns=["doc_id", "text"]).map_batches(
        kernel, batch_format="pyarrow", zero_copy_batch=True
    )


def keyword_filter_sql(table: str = "documents",
                       terms: tuple[str, ...] = BLOCKLIST_TERMS) -> str:
    """DuckDB oracle for ``keyword_filter``: per term, the
    replace-shrinkage count (character-length delta / term length)
    equals Arrow's non-overlapping ``count_substring`` for terms that
    cannot overlap themselves (true of the default list); summed over
    a VALUES term table."""
    vals = ", ".join(
        "('{}')".format(t.lower().replace("'", "''")) for t in terms
    )
    return (
        f"WITH pats(p) AS (VALUES {vals}), "
        "lt AS (SELECT doc_id, lower(coalesce(text, '')) AS s "
        f"FROM {table}), "
        "h AS (SELECT doc_id, CAST(SUM((length(s) - "
        "length(replace(s, p, ''))) // length(p)) AS BIGINT) "
        "AS n_hits FROM lt CROSS JOIN pats GROUP BY doc_id) "
        "SELECT doc_id, n_hits, n_hits > 0 AS blocked FROM h"
    )


# --- corpus drift report (Jensen-Shannon divergence) ------------------------

def corpus_drift(sf_dir: str, new_pct: int = 20, n_buckets: int = 100):
    """One-row report (base_tokens, new_tokens, base_vocab, new_vocab,
    js_nano, js_divergence): token-distribution drift between the BASE
    corpus and the NEW shard (same deterministic splitmix64(doc_id)
    split as the incremental-dedup family) measured as Jensen-Shannon
    divergence — the monitor a production pipeline alarms on when a
    new crawl's language mix shifts. JS is computed per token as
    0.5*p*ln(p/m) + 0.5*q*ln(q/m) (m the mixture), each contribution
    QUANTIZED to int64 nano-nats before summation, so the total is
    associative and bit-equal to the SQL oracle in any reduction
    order (ln is the platform libm on both sides — the unigram-LM
    precedent).

    Scale shape: one streaming pass; the per-batch combiner collapses
    each batch to (token, side) counts via Arrow's C-speed group_by,
    one vocab-sized groupby sums them, and only the VOCABULARY (a few
    MB at 100 TB — the unigram-model precedent) reaches the driver
    for the scalar fold."""
    import math

    from ray.data.aggregate import Sum as _Sum

    from humid_ray.util import splitmix64

    def partial(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {"token": pa.array([], type=pa.string()),
             "nb": pa.array([], type=pa.int64()),
             "nn": pa.array([], type=pa.int64())}
        )
        if batch.num_rows == 0:
            return empty
        d = batch.column("doc_id").to_numpy(zero_copy_only=False)
        is_new = (splitmix64(d.astype(np.int64).view(UINT64))
                  % UINT64(n_buckets)) < new_pct
        kept, offs = _flat_tokens(batch.column("text"))
        if len(kept) == 0:
            return empty
        side = np.repeat(is_new, (offs[1:] - offs[:-1]))
        agg = pa.table(
            {"token": kept, "new": pa.array(side)}
        ).group_by(["token", "new"]).aggregate([("token", "count")])
        cnt = agg.column("token_count").to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        nw = agg.column("new").to_numpy(zero_copy_only=False)
        return pa.table(
            {"token": agg.column("token"),
             "nb": pa.array(np.where(nw, 0, cnt)),
             "nn": pa.array(np.where(nw, cnt, 0))}
        )

    counts = (
        read_documents(sf_dir, columns=["doc_id", "text"])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("token")
        .aggregate(_Sum("nb", alias_name="nb"),
                   _Sum("nn", alias_name="nn"))
    )
    nb_parts, nn_parts = [], []
    for b in counts.iter_batches(batch_size=262144, batch_format="pyarrow"):
        nb_parts.append(b.column("nb").to_numpy(zero_copy_only=False)
                        .astype(np.int64))
        nn_parts.append(b.column("nn").to_numpy(zero_copy_only=False)
                        .astype(np.int64))
    nb = np.concatenate(nb_parts) if nb_parts else np.empty(0, np.int64)
    nn = np.concatenate(nn_parts) if nn_parts else np.empty(0, np.int64)
    tb, tn = int(nb.sum()), int(nn.sum())
    js_nano = np.int64(0)
    if len(nb):
        # per-token double math in the EXACT association order of the
        # SQL oracle; only the final int64 sum is order-free
        p = np.where(nb > 0, nb.astype(np.float64) / max(tb, 1), 0.0)
        q = np.where(nn > 0, nn.astype(np.float64) / max(tn, 1), 0.0)
        m = 0.5 * (p + q)
        with np.errstate(divide="ignore", invalid="ignore"):
            cb = np.where(nb > 0, 0.5 * (p * np.log(p / m)), 0.0)
            cn = np.where(nn > 0, 0.5 * (q * np.log(q / m)), 0.0)
        js_nano = round_half_away((cb + cn) * 1e9, 0).astype(np.int64).sum()
    return pa.table(
        {
            "base_tokens": pa.array([tb], type=pa.int64()),
            "new_tokens": pa.array([tn], type=pa.int64()),
            "base_vocab": pa.array([int((nb > 0).sum())], type=pa.int64()),
            "new_vocab": pa.array([int((nn > 0).sum())], type=pa.int64()),
            "js_nano": pa.array([int(js_nano)], type=pa.int64()),
            # half-AWAY rounding like DuckDB round(); Python's builtin
            # round is half-to-even and diverges on representable ties
            "js_divergence": pa.array(
                [float(round_half_away(
                    np.float64(int(js_nano) / 1e9), 6))],
                type=pa.float64(),
            ),
        }
    )


def corpus_drift_sql(table: str = "documents", new_pct: int = 20,
                     n_buckets: int = 100) -> str:
    """DuckDB oracle for ``corpus_drift``: identical tokenization,
    split, and per-token double arithmetic (CAST-to-DOUBLE divisions,
    same association order, libm ln), quantized to nano-nats before
    the integer sum."""
    from humid_ray.oracles import _sm64_cols

    return (
        f"WITH sm AS (SELECT doc_id, "
        f"{_sm64_cols('CAST(doc_id AS HUGEINT)', 'z')} FROM {table}), "
        f"split AS (SELECT d.doc_id, d.text, "
        f"(z % {n_buckets} < {new_pct}) AS is_new "
        f"FROM {table} d JOIN sm USING (doc_id)), "
        "toks AS (SELECT is_new, "
        "unnest(regexp_extract_all(lower(coalesce(text,'')), '[0-9a-z]+')) "
        "AS token FROM split), "
        "f AS (SELECT token, "
        "CAST(SUM(CASE WHEN is_new THEN 0 ELSE 1 END) AS BIGINT) AS nb, "
        "CAST(SUM(CASE WHEN is_new THEN 1 ELSE 0 END) AS BIGINT) AS nn "
        "FROM toks GROUP BY token), "
        "tot AS (SELECT CAST(coalesce(SUM(nb), 0) AS BIGINT) AS tb, "
        "CAST(coalesce(SUM(nn), 0) AS BIGINT) AS tn FROM f), "
        "c AS (SELECT CAST(round(("
        "CASE WHEN nb > 0 THEN 0.5 * ((CAST(nb AS DOUBLE) / "
        "greatest(tb, 1)) * ln((CAST(nb AS DOUBLE) / greatest(tb, 1)) / "
        "(0.5 * ((CASE WHEN nb > 0 THEN CAST(nb AS DOUBLE) / "
        "greatest(tb, 1) ELSE 0 END) + (CASE WHEN nn > 0 THEN "
        "CAST(nn AS DOUBLE) / greatest(tn, 1) ELSE 0 END))))) ELSE 0 END "
        "+ CASE WHEN nn > 0 THEN 0.5 * ((CAST(nn AS DOUBLE) / "
        "greatest(tn, 1)) * ln((CAST(nn AS DOUBLE) / greatest(tn, 1)) / "
        "(0.5 * ((CASE WHEN nb > 0 THEN CAST(nb AS DOUBLE) / "
        "greatest(tb, 1) ELSE 0 END) + (CASE WHEN nn > 0 THEN "
        "CAST(nn AS DOUBLE) / greatest(tn, 1) ELSE 0 END))))) ELSE 0 END"
        ") * 1e9, 0) AS BIGINT) AS cn FROM f, tot) "
        "SELECT tot.tb AS base_tokens, tot.tn AS new_tokens, "
        "(SELECT CAST(count(*) AS BIGINT) FROM f WHERE nb > 0) "
        "AS base_vocab, "
        "(SELECT CAST(count(*) AS BIGINT) FROM f WHERE nn > 0) "
        "AS new_vocab, "
        "CAST(coalesce((SELECT SUM(cn) FROM c), 0) AS BIGINT) AS js_nano, "
        "round(CAST(coalesce((SELECT SUM(cn) FROM c), 0) AS DOUBLE) "
        "/ 1e9, 6) AS js_divergence FROM tot"
    )


# --- order-independent corpus checksum --------------------------------------

def corpus_checksum(sf_dir: str):
    """(n_rows, checksum): a single-row content fingerprint of the
    documents table — checksum = sum over rows of
    splitmix64(texthash XOR splitmix64(doc_id)) mod 2^64, emitted as
    the int64 bit pattern. Because the fold is a modular SUM it is
    reduction-order-independent, so any plan / parallelism / block
    layout yields identical bits: the cheap way to certify that two
    copies of a 100 TB corpus (or an engine migration, like this
    repo vs its oracle) hold exactly the same rows without moving
    them. NULL text hashes like '' (both sides coalesce).

    Scale shape: shuffle-free — each batch emits ONE (n, partial-sum)
    row; the driver folds the per-batch partials (blocks-many rows)
    with the same wrapping add."""
    from humid_ray.stages.joins import hash_string_column
    from humid_ray.util import splitmix64, uint64_to_int64

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"n": pa.array([0], type=pa.int64()),
                             "s": pa.array([0], type=pa.int64())})
        txt = pc.fill_null(batch.column("text"), "")
        th = hash_string_column(txt)
        did = batch.column("doc_id").to_numpy(zero_copy_only=False)
        dh = splitmix64(did.astype(np.int64).view(UINT64))
        comb = splitmix64(th ^ dh)
        with np.errstate(over="ignore"):
            s = np.add.reduce(comb, dtype=UINT64)
        return pa.table({
            "n": pa.array([batch.num_rows], type=pa.int64()),
            "s": pa.array(uint64_to_int64(np.array([s]))),
        })

    parts = read_documents(sf_dir, columns=["doc_id", "text"]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    n_total = 0
    acc = np.uint64(0)
    for b in parts.iter_batches(batch_size=4096, batch_format="pyarrow"):
        n_total += int(pc.sum(b.column("n")).as_py() or 0)
        sv = b.column("s").to_numpy(zero_copy_only=False).view(UINT64)
        with np.errstate(over="ignore"):
            acc = np.uint64(acc + np.add.reduce(sv, dtype=UINT64))
    return pa.table({
        "n_rows": pa.array([n_total], type=pa.int64()),
        "checksum": pa.array(uint64_to_int64(np.array([acc]))),
    })


# --- GROUPING SETS rollup (multi-level aggregate in one pass) ---------------

def lang_source_rollup(sf_dir: str):
    """(lang, source, n_docs, total_chars) at THREE aggregation
    levels in one corpus pass — (lang, source), (lang, ALL) and
    (ALL, ALL), the GROUPING SETS / ROLLUP shape every mixture report
    wants (per-cell counts plus their margins, consistent by
    construction because the margins are folded from the same cells).

    Scale shape: the corpus is touched ONCE — per-batch Arrow
    ``group_by`` collapses each batch to its distinct (lang, source)
    partial rows, a single groupby exchange sums them, and the margin
    levels are folded from the |lang x source| aggregate rows
    driver-side (cells, not corpus rows — bounded by the key-domain
    product, ~10^3 for any real mixture). 'ALL' marks a rolled-up
    level; both aggregates are int64 sums, so every level is exact."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"lang": pa.array([], type=pa.string()),
                             "source": pa.array([], type=pa.string()),
                             "n": pa.array([], type=pa.int64()),
                             "chars": pa.array([], type=pa.int64())})
        g = batch.select(["lang", "source", "n_chars"]).group_by(
            ["lang", "source"]
        ).aggregate([("n_chars", "sum"), ("n_chars", "count")])
        return pa.table({"lang": g.column("lang"),
                         "source": g.column("source"),
                         "n": g.column("n_chars_count"),
                         "chars": g.column("n_chars_sum")})

    cells = (
        read_documents(sf_dir, columns=["lang", "source", "n_chars"])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["lang", "source"])
        .aggregate(Sum("n", alias_name="n"), Sum("chars", alias_name="chars"))
        .take_all()
    )
    langs = [r["lang"] for r in cells]
    srcs = [r["source"] for r in cells]
    ns = np.array([r["n"] for r in cells], dtype=np.int64)
    chs = np.array([r["chars"] for r in cells], dtype=np.int64)
    out_lang, out_src = list(langs), list(srcs)
    out_n, out_ch = ns.tolist(), chs.tolist()
    # (lang, ALL) margins
    ul, inv = np.unique(np.asarray(langs, dtype=object), return_inverse=True)
    for i, lv in enumerate(ul):
        m = inv == i
        out_lang.append(str(lv))
        out_src.append("ALL")
        out_n.append(int(ns[m].sum()))
        out_ch.append(int(chs[m].sum()))
    # (ALL, ALL) grand total
    if len(cells):
        out_lang.append("ALL")
        out_src.append("ALL")
        out_n.append(int(ns.sum()))
        out_ch.append(int(chs.sum()))
    return pa.table({
        "lang": pa.array(out_lang, type=pa.string()),
        "source": pa.array(out_src, type=pa.string()),
        "n_docs": pa.array(out_n, type=pa.int64()),
        "total_chars": pa.array(out_ch, type=pa.int64()),
    })


def lang_source_rollup_sql(table: str = "documents") -> str:
    """DuckDB oracle for ``lang_source_rollup``."""
    return (
        "SELECT CASE WHEN GROUPING(lang) = 1 THEN 'ALL' ELSE lang END "
        "AS lang, "
        "CASE WHEN GROUPING(source) = 1 THEN 'ALL' ELSE source END "
        "AS source, "
        "CAST(count(*) AS BIGINT) AS n_docs, "
        "CAST(sum(n_chars) AS BIGINT) AS total_chars "
        f"FROM {table} "
        "GROUP BY GROUPING SETS ((lang, source), (lang), ())"
    )


# --- Gopher quality rules (Rae et al. 2021, arXiv:2112.11446 Table A1) ------

def gopher_rules(sf_dir: str, min_words: int = 10, max_words: int = 10_000,
                 min_mean_len: float = 3.0, max_mean_len: float = 10.0,
                 min_alpha_frac: float = 0.8, max_symbol_ratio: float = 0.1):
    """(doc_id, n_words, mean_word_len, frac_alpha_words,
    symbol_ratio, keep): the Gopher repetition-free quality screen —
    word-count window, mean-word-length window, fraction of words
    containing a letter, and symbol-to-word ratio ('#' and '...'),
    conjunction as the keep flag. Words are whitespace-separated runs
    (the paper's definition), unlike the [0-9a-z]+ tokens of
    ``quality_scores``. Thresholds are tested on UNROUNDED values
    (round only the emitted columns), matching the oracle's
    WHERE-then-round order.

    Scale shape: shuffle-free row-local kernels — one whitespace
    split, flat per-word lengths + a regex letter test folded per row
    with reduceat, two C-speed substring counts. Ratios are single
    divisions of exact int64 sums, so engine and DuckDB agree
    bit-for-bit."""

    out_empty = {
        "doc_id": pa.array([], type=pa.int64()),
        "n_words": pa.array([], type=pa.int64()),
        "mean_word_len": pa.array([], type=pa.float64()),
        "frac_alpha_words": pa.array([], type=pa.float64()),
        "symbol_ratio": pa.array([], type=pa.float64()),
        "keep": pa.array([], type=pa.bool_()),
    }

    def kernel(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(out_empty)
        text = pc.fill_null(batch.column("text"), "")
        words = pc.utf8_split_whitespace(text)
        if isinstance(words, pa.ChunkedArray):
            words = words.combine_chunks()
        # whitespace split emits '' segments at string edges (leading/
        # trailing blanks); drop them to match \S+ extraction
        flat = words.flatten()
        wlen = pc.utf8_length(flat).to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        has_alpha = pc.match_substring_regex(flat, "[A-Za-z]").to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        offs = words.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        offs = offs - offs[0]
        nonempty = (wlen > 0).astype(np.int64)
        cs_n = np.r_[0, np.cumsum(nonempty)]
        cs_len = np.r_[0, np.cumsum(wlen)]
        cs_alpha = np.r_[0, np.cumsum(has_alpha * nonempty)]
        n_words = cs_n[offs[1:]] - cs_n[offs[:-1]]
        tot_len = cs_len[offs[1:]] - cs_len[offs[:-1]]
        n_alpha = cs_alpha[offs[1:]] - cs_alpha[offs[:-1]]
        n_sym = (
            pc.count_substring(text, "#").to_numpy(zero_copy_only=False)
            .astype(np.int64)
            + pc.count_substring(text, "...").to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        nz = np.maximum(n_words, 1).astype(np.float64)
        mean_len = np.where(n_words > 0, tot_len / nz, 0.0)
        frac_alpha = np.where(n_words > 0, n_alpha / nz, 0.0)
        sym_ratio = np.where(n_words > 0, n_sym / nz, 0.0)
        keep = (
            (n_words >= min_words) & (n_words <= max_words)
            & (mean_len >= min_mean_len) & (mean_len <= max_mean_len)
            & (frac_alpha >= min_alpha_frac)
            & (sym_ratio <= max_symbol_ratio)
        )
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "n_words": pa.array(n_words),
            "mean_word_len": pa.array(round_half_away(mean_len)),
            "frac_alpha_words": pa.array(round_half_away(frac_alpha)),
            "symbol_ratio": pa.array(round_half_away(sym_ratio)),
            "keep": pa.array(keep),
        })

    return read_documents(sf_dir, columns=["doc_id", "text"]).map_batches(
        kernel, batch_format="pyarrow", zero_copy_batch=True
    )


def gopher_rules_sql(table: str = "documents", min_words: int = 10,
                     max_words: int = 10_000, min_mean_len: float = 3.0,
                     max_mean_len: float = 10.0,
                     min_alpha_frac: float = 0.8,
                     max_symbol_ratio: float = 0.1) -> str:
    """DuckDB oracle for ``gopher_rules`` (thresholds on unrounded
    values, round only the emitted columns)."""
    return (
        "WITH w AS (SELECT doc_id, "
        "regexp_extract_all(coalesce(text, ''), '\\S+') AS ws, "
        f"coalesce(text, '') AS t FROM {table}), "
        "m AS (SELECT doc_id, CAST(len(ws) AS BIGINT) AS n_words, "
        "CASE WHEN len(ws) > 0 THEN "
        "CAST(list_sum(list_transform(ws, x -> length(x))) AS DOUBLE) "
        "/ len(ws) ELSE 0e0 END AS ml, "
        "CASE WHEN len(ws) > 0 THEN "
        "CAST(len(list_filter(ws, x -> regexp_matches(x, '[A-Za-z]'))) "
        "AS DOUBLE) / len(ws) ELSE 0e0 END AS fa, "
        "CASE WHEN len(ws) > 0 THEN "
        "CAST(len(regexp_extract_all(t, '#')) "
        "+ len(regexp_extract_all(t, '\\.\\.\\.')) AS DOUBLE) / len(ws) "
        "ELSE 0e0 END AS sr FROM w) "
        "SELECT doc_id, n_words, round(ml, 6) AS mean_word_len, "
        "round(fa, 6) AS frac_alpha_words, round(sr, 6) AS symbol_ratio, "
        f"(n_words >= {min_words} AND n_words <= {max_words} "
        f"AND ml >= {min_mean_len} AND ml <= {max_mean_len} "
        f"AND fa >= {min_alpha_frac} AND sr <= {max_symbol_ratio}) "
        'AS "keep" FROM m'
    )
