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
from humid_ray.util import UINT64, combine_hashes, round_half_away, u64col


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
    def __init__(self):
        self.profiles = {
            lang: {bg: len(bgs) - i for i, bg in enumerate(bgs)}
            for lang, bgs in _PROFILES.items()
        }

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = pc.utf8_lower(pc.fill_null(batch.column("text"), "")).to_pylist()
        out = []
        for t in texts:
            if not t:
                out.append("und")
                continue
            bigrams = {}
            for i in range(len(t) - 1):
                bg = t[i : i + 2]
                if bg.isalpha():
                    bigrams[bg] = bigrams.get(bg, 0) + 1
            best, best_score = "und", 0
            for lang, prof in self.profiles.items():
                score = sum(w * bigrams.get(bg, 0) for bg, w in prof.items())
                if score > best_score:
                    best, best_score = lang, score
            out.append(best)
        return pa.table(
            {"doc_id": batch.column("doc_id"), "lang_pred": pa.array(out)}
        )


def langid(sf_dir: str):
    return read_documents(sf_dir, columns=["doc_id", "text"]).map_batches(
        LangId, batch_format="pyarrow", zero_copy_batch=True, concurrency=(1, 4)
    )


def fingerprints(sf_dir: str):
    """(doc_id, fingerprint) — order-sensitive rolling hash over the
    token-hash sequence (winnowing-style document fingerprint)."""

    def kernel(batch: pa.Table) -> pa.Table:
        th, offs = tokenize_batch(batch.column("text"))
        n = len(offs) - 1
        fp = np.zeros(n, dtype=UINT64)
        for i in range(n):
            seg = th[offs[i] : offs[i + 1]]
            if len(seg):
                acc = seg[:1]
                for j in range(1, len(seg)):
                    acc = combine_hashes(acc, seg[j : j + 1])
                fp[i] = acc[0]
        return pa.table(
            {"doc_id": batch.column("doc_id"), "fingerprint": u64col(fp)}
        )

    return read_documents(sf_dir, columns=["doc_id", "text"]).map_batches(
        kernel, batch_format="pyarrow", zero_copy_batch=True
    )
