"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship near-duplicate pipeline on a
deterministic synthetic image+caption corpus at sf0.001 scale;
``queries()`` exposes every implemented operator (SURVEY.md §2 plus
the training-data-pipeline extensions) as sf_dir-parameterized
callables; ``oracle_sql()`` gives DuckDB equivalents for the
SQL-expressible ones.

Ray is initialised by the driver BEFORE this module is imported: no
ray.init()/ray.shutdown() anywhere in the library or in these
callables.

The image corpus (input_hint schema) does not exist under
/root/testdata, so corpus-based queries synthesize it deterministically
per scale factor (seeded; cached under /tmp/humid_corpus) — no
external data. Document/embedding queries run on the provided
testdata tables directly.
"""

from __future__ import annotations

import os
import re
from collections.abc import Callable
from typing import Any

_CORPUS_BASE = "/tmp/humid_corpus"


def _sf_of(sf_dir: str) -> float:
    m = re.search(r"sf([0-9.]+)", sf_dir)
    try:
        return float(m.group(1).rstrip(".")) if m else 0.01
    except ValueError:
        return 0.01


def _corpus_for(sf_dir: str) -> str:
    from humid_ray.synth import make_corpus

    n = max(500, min(int(1_000_000 * _sf_of(sf_dir)), 200_000))
    return make_corpus(_CORPUS_BASE, n)


def _audio_corpus_for(sf_dir: str) -> str:
    from humid_ray.synth import make_audio_corpus

    n = max(200, min(int(200_000 * _sf_of(sf_dir)), 20_000))
    return make_audio_corpus(_CORPUS_BASE, n)


def _video_corpus_for(sf_dir: str) -> str:
    from humid_ray.synth import make_video_corpus

    n = max(100, min(int(100_000 * _sf_of(sf_dir)), 10_000))
    return make_video_corpus(_CORPUS_BASE, n)


def _pipeline_result(sf_dir: str, wd_suffix: str = "", **cfg_over):
    from humid_ray.config import HumidConfig
    from humid_ray.pipelines.humid import HumidPipeline

    corpus = _corpus_for(sf_dir)
    wd = os.path.join("/tmp/humid_runs", os.path.basename(corpus) + wd_suffix)
    kwargs = dict(write_annotated=True, write_filtered=True,
                  write_stats=True, resume=True)
    kwargs.update(cfg_over)
    cfg = HumidConfig(workdir=wd, **kwargs)
    return HumidPipeline(cfg).run(corpus), corpus


# phash-only signature + maximum clustering: the one flagship
# configuration whose EVERY phase is ANSI-SQL-expressible (sig ==
# stored phash bit-for-bit; Hamming = bit_count(xor); connected
# components = recursive transitive closure) — gives the core
# uniq/edges/assign machinery a hard DuckDB oracle. The full
# multi-source config stays pinned by the pytest brute-force oracles.
_PHASH_CFG = dict(sources=("phash",), clustering="maximum",
                  wd_suffix="_phash_max", write_annotated=False)

# order-preserving uint64 view of an int64 bit pattern (flip sign bit)
_SB = "-9223372036854775808"


def _humid_uniq_sql(sf_dir: str):
    res, _ = _pipeline_result(sf_dir, **_PHASH_CFG)
    return res.dataset("02_uniq")


def _humid_edges_sql(sf_dir: str):
    res, _ = _pipeline_result(sf_dir, **_PHASH_CFG)
    return res.dataset("03_edges")


def _humid_stats_sql(sf_dir: str):
    import pyarrow as pa

    res, _ = _pipeline_result(sf_dir, **_PHASH_CFG)
    s = res.stats["summary"]
    return pa.table({k: [int(v)] for k, v in s.items()})


def _phash_hist(sf_dir: str, key: str):
    import pyarrow as pa

    res, _ = _pipeline_result(sf_dir, **_PHASH_CFG)
    df = res.stats[key]
    return pa.table({"value": df["value"].astype("int64"),
                     "n": df["n"].astype("int64")})


def _humid_counts_hist_sql(sf_dir: str):
    return _phash_hist(sf_dir, "counts")


def _humid_neigh_hist_sql(sf_dir: str):
    return _phash_hist(sf_dir, "neigh")


def _humid_cluster_hist_sql(sf_dir: str):
    return _phash_hist(sf_dir, "clusters")


def _humid_assign_sql(sf_dir: str):
    """Cluster MEMBERSHIP under the phash-only config: (sig, count,
    first_id, cluster_seed, cluster_size) — the columns that are
    walk-order-independent and hence exactly SQL-expressible. The
    representative (max-leaf) tie-break follows the reference's DFS
    preorder from the seed (src/cluster.cc:72-80), which SQL cannot
    express declaratively; it is pinned by the reference-translated
    graph tests instead."""
    res, _ = _pipeline_result(sf_dir, **_PHASH_CFG)
    ds = res.dataset("04_assign")
    return ds.map_batches(
        lambda t: t.select(["sig", "count", "first_id", "cluster_seed",
                            "cluster_size"]),
        batch_format="pyarrow",
    )


# FULL default signature config (phash top-32 || caption-simhash
# top-32) under maximum clustering: the composite-word analog of the
# phash-only `_sql` family — every phase below is SQL-expressible via
# the HUGEINT hash chain in humid_ray/oracles.py plus the recursive
# transitive closure, giving the multi-source uniq -> edges -> CC ->
# stats machinery its own hard DuckDB oracle.
_FULLMAX_CFG = dict(clustering="maximum", wd_suffix="_fullmax",
                    write_annotated=False)


def _humid_assign_full_sql(sf_dir: str):
    res, _ = _pipeline_result(sf_dir, **_FULLMAX_CFG)
    ds = res.dataset("04_assign")
    return ds.map_batches(
        lambda t: t.select(["sig", "count", "first_id", "cluster_seed",
                            "cluster_size"]),
        batch_format="pyarrow",
    )


def _humid_stats_full_sql(sf_dir: str):
    import pyarrow as pa

    res, _ = _pipeline_result(sf_dir, **_FULLMAX_CFG)
    s = res.stats["summary"]
    return pa.table({k: [int(v)] for k, v in s.items()})


def _fullmax_hist(sf_dir: str, key: str):
    import pyarrow as pa

    res, _ = _pipeline_result(sf_dir, **_FULLMAX_CFG)
    df = res.stats[key]
    return pa.table({"value": df["value"].astype("int64"),
                     "n": df["n"].astype("int64")})


def _humid_counts_hist_full_sql(sf_dir: str):
    return _fullmax_hist(sf_dir, "counts")


def _humid_neigh_hist_full_sql(sf_dir: str):
    return _fullmax_hist(sf_dir, "neigh")


def _humid_cluster_hist_full_sql(sf_dir: str):
    return _fullmax_hist(sf_dir, "clusters")


def entry() -> Any:
    """Flagship pipeline at sf0.001 scale; returns the assignment table
    (one row per unique signature with cluster id / representative).
    Runs the shipped async-checkpoint mode: phases stream through the
    object store while their checkpoints write in the background, so
    the smoke covers the production configuration; a rerun resumes
    from the async-written checkpoints."""
    res, _ = _pipeline_result("/root/testdata/sf0.001",
                              checkpoint_phases="async")
    return res.dataset("04_assign")


# ---------------------------------------------------------------------------


def _humid_assign(sf_dir: str):
    res, _ = _pipeline_result(sf_dir)
    return res.dataset("04_assign")


def _humid_edges(sf_dir: str):
    res, _ = _pipeline_result(sf_dir)
    return res.dataset("03_edges")


def _humid_uniq(sf_dir: str):
    res, _ = _pipeline_result(sf_dir)
    return res.dataset("02_uniq")


def _humid_filtered_output(sf_dir: str):
    res, _ = _pipeline_result(sf_dir)
    import pyarrow as pa

    ds = res.dataset("05_filtered")
    return ds.map_batches(
        lambda t: t.select(["image_id", "fmt", "caption", "phash"]),
        batch_format="pyarrow",
    )


def _humid_stats(sf_dir: str):
    import pyarrow as pa

    res, _ = _pipeline_result(sf_dir)
    s = res.stats["summary"]
    return pa.table({k: [v] for k, v in s.items()})


def _humid_cluster_hist(sf_dir: str):
    import pyarrow as pa

    res, _ = _pipeline_result(sf_dir)
    df = res.stats["clusters"]
    return pa.Table.from_pandas(df, preserve_index=False)


def _filter_usable_docs(sf_dir: str):
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "n_chars"]
    )

    def kernel(t: pa.Table) -> pa.Table:
        keep = pc.greater(pc.utf8_length(pc.fill_null(t.column("text"), "")), 0)
        return t.filter(keep).select(["doc_id", "n_chars"])

    return ds.map_batches(kernel, batch_format="pyarrow", zero_copy_batch=True)


def _make_string_size_docs(sf_dir: str):
    """M4 analog: cut/right-pad text to 24 chars with 'N'."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def kernel(t: pa.Table) -> pa.Table:
        s = pc.utf8_slice_codeunits(pc.fill_null(t.column("text"), ""), 0, 24)
        s = pc.utf8_rpad(s, 24, "N")
        return pa.table({"doc_id": t.column("doc_id"), "fixed": s})

    return ds.map_batches(kernel, batch_format="pyarrow", zero_copy_batch=True)


def _extract_last_field_docs(sf_dir: str):
    """M3 analog: substring after the LAST 'r' of source (greedy regex)."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "source"])

    def kernel(t: pa.Table) -> pa.Table:
        last = pc.replace_substring_regex(t.column("source"), "^.*r", "")
        return pa.table({"doc_id": t.column("doc_id"), "last_field": last})

    return ds.map_batches(kernel, batch_format="pyarrow", zero_copy_batch=True)


def _embedding_norms(sf_dir: str):
    import numpy as np
    import pyarrow as pa
    import ray.data

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])

    def kernel(t: pa.Table) -> pa.Table:
        from humid_ray.pipelines.ann import _to_matrix

        ids, m = _to_matrix(t)
        from humid_ray.util import round_half_away
        norm = round_half_away(np.sqrt((m * m).sum(axis=1)), 6)
        return pa.table({"vec_id": pa.array(ids), "norm": pa.array(norm)})

    return ds.map_batches(kernel, batch_format="pyarrow", zero_copy_batch=True)


def queries() -> dict[str, Callable[[str], Any]]:
    from humid_ray.pipelines import (
        ann,
        dedup_text,
        events,
        images,
        multimodal,
        relational,
        sampling,
        segdedup,
        shards,
        substring,
        textstats,
    )

    def corpus_decode_stats(sf_dir: str):
        return multimodal.decode_stats(_corpus_for(sf_dir))

    def _audio_decode_dims(sf_dir: str):
        """Decoded (sr, n_samples) of every decodable clip — oracled
        against the audio corpus's stored metadata (decodable iff
        stored sr is non-null, by construction)."""
        ds = multimodal.audio_feature_stats(_audio_corpus_for(sf_dir))
        return ds.map_batches(
            lambda t: t.filter(t.column("ok")).select(["audio_id", "sr", "n_samples"]),
            batch_format="pyarrow",
        )

    def _audio_durations(sf_dir: str):
        """Decoded clip durations — SQL-oracled vs stored metadata
        (duration_s = round(n_samples/sr, 6), computed from the DECODED
        sr/n_samples with DuckDB's half-away rounding)."""
        import numpy as np
        import pyarrow as pa

        from humid_ray.util import round_half_away

        ds = multimodal.audio_feature_stats(_audio_corpus_for(sf_dir))

        def kernel(t: pa.Table) -> pa.Table:
            t = t.filter(t.column("ok"))
            ns = t.column("n_samples").to_numpy(zero_copy_only=False).astype(np.float64)
            sr = t.column("sr").to_numpy(zero_copy_only=False).astype(np.float64)
            dur = round_half_away(
                np.divide(ns, sr, out=np.zeros_like(ns), where=sr > 0), 6
            )
            return pa.table(
                {"audio_id": t.column("audio_id"), "duration_s": pa.array(dur)}
            )

        return ds.map_batches(kernel, batch_format="pyarrow")

    def _video_sampled_frames(sf_dir: str):
        """Per-video count of SAMPLED frames (every stride-th) — SQL-
        oracled as ceil(n_frames/stride) vs the stored frame count."""
        from ray.data.aggregate import Count

        ds = multimodal.video_frame_samples(_video_corpus_for(sf_dir))
        return ds.groupby("video_id").aggregate(Count(alias_name="n_sampled"))

    def corpus_decode_dims(sf_dir: str):
        """Decoded dimensions of every decodable row — SQL-oracled
        against the corpus's stored (w, h) metadata columns (a row is
        decodable iff its stored phash is non-null, by construction)."""
        import pyarrow as pa

        ds = multimodal.decode_stats(_corpus_for(sf_dir))
        return ds.map_batches(
            lambda t: t.filter(t.column("ok")).select(["image_id", "width", "height"]),
            batch_format="pyarrow",
        )

    def corpus_thumbnails(sf_dir: str):
        import pyarrow as pa
        import pyarrow.compute as pc

        ds = multimodal.thumbnails(_corpus_for(sf_dir))
        return ds.map_batches(
            lambda t: pa.table(
                {
                    "image_id": t.column("image_id"),
                    "thumb_len": pc.binary_length(t.column("thumb")),
                    "tw": t.column("tw"),
                    "th": t.column("th"),
                }
            ),
            batch_format="pyarrow",
        )

    q = {
        # flagship near-dup pipeline (corpus; brute-force-oracle-tested in pytest)
        "humid_assign": _humid_assign,
        "humid_edges": _humid_edges,
        "humid_uniq": _humid_uniq,
        "humid_filtered_output": _humid_filtered_output,
        "humid_stats": _humid_stats,
        "humid_cluster_hist": _humid_cluster_hist,
        # flagship phases under the SQL-expressible phash-only config
        # (hard DuckDB oracle for the uniq/edges/assign machinery)
        "humid_uniq_sql": _humid_uniq_sql,
        "humid_edges_sql": _humid_edges_sql,
        "humid_assign_sql": _humid_assign_sql,
        "humid_stats_sql": _humid_stats_sql,
        "humid_counts_hist_sql": _humid_counts_hist_sql,
        "humid_neigh_hist_sql": _humid_neigh_hist_sql,
        "humid_cluster_hist_sql": _humid_cluster_hist_sql,
        # flagship phases under the FULL composite-word config with
        # maximum clustering (DuckDB HUGEINT hash chain + recursive CC)
        "humid_assign_full_sql": _humid_assign_full_sql,
        "humid_stats_full_sql": _humid_stats_full_sql,
        "humid_counts_hist_full_sql": _humid_counts_hist_full_sql,
        "humid_neigh_hist_full_sql": _humid_neigh_hist_full_sql,
        "humid_cluster_hist_full_sql": _humid_cluster_hist_full_sql,
        # documents: exact dedup + histograms (SQL-oracled)
        "exact_dedup_docs": dedup_text.exact_dedup,
        "dup_count_hist_docs": dedup_text.dup_count_hist,
        "dedup_stats_docs": dedup_text.dedup_stats,
        "filter_usable_docs": _filter_usable_docs,
        "make_string_size_docs": _make_string_size_docs,
        "extract_last_field_docs": _extract_last_field_docs,
        # documents: near-dup suite
        "simhash_docs": dedup_text.simhash_docs,
        # the flagship banded-Hamming LSH stage reused on the simhash
        # column (brute-force-oracle-tested edge-set parity)
        "simhash_neardup_docs": dedup_text.simhash_neardup,
        "minhash_neardup_docs": dedup_text.minhash_neardup_pairs,
        # fuzzy-dedup composition: MinHash edges -> connected
        # components -> per-doc cluster assignment + keep list
        # (SQL-oracled: MinHash-in-SQL + recursive closure)
        "minhash_cluster_docs": dedup_text.minhash_clusters,
        # B-axis leakage-free split / soft dedup weights (cluster-keyed)
        "cluster_safe_split_docs": dedup_text.cluster_safe_split_docs,
        "dedup_sample_weights_docs": dedup_text.dedup_sample_weights_docs,
        "minhash_keep_docs": dedup_text.minhash_dedup_keep,
        # quality-aware keep list: per cluster, the most-token-rich
        # member wins (tie -> min doc_id); one co-partitioned bucket
        # argmax exchange (SQL-oracled: closure CTEs + window rank)
        "minhash_keep_best_docs": dedup_text.minhash_dedup_keep_best,
        # the tier-dedup funnel: raw -> exact dedup -> fuzzy (MinHash)
        # dedup among exact survivors, survivors/removed per tier
        # (SQL-oracled: exact GROUP BY + closure CTEs over survivors)
        "tiered_dedup_report_docs": dedup_text.tiered_dedup_report,
        # multi-evidence fused dedup (doc twin of fused_dedup_images):
        # ONE CC over the exact-text / MinHash / SimHash edge union,
        # per-cluster tier-provenance flags (SQL-oracled: all three
        # tiers re-derived in DuckDB + recursive closure)
        "fused_dedup_docs": dedup_text.fused_dedup_docs,
        # benchmark decontamination (distinct-shingle overlap vs the
        # deterministic doc_id % 20 == 0 "eval suite"; SQL-oracled)
        "decontaminate_docs": dedup_text.decontaminate,
        # the composed curation pipeline: quality gates + decontam ->
        # fuzzy dedup among survivors -> keep list (SQL-oracled)
        "curate_docs": dedup_text.curate_docs,
        # exact all-pairs shingle Jaccard via prefix filtering (SQL-oracled)
        "ngram_jaccard_docs": dedup_text.ngram_jaccard_exact,
        # MinHash-LSH candidates re-verified with exact n-gram Jaccard
        "ngram_jaccard_lsh": dedup_text.ngram_jaccard_pairs,
        # substring-level dedup (winnowed-fingerprint suffix-array
        # analog; LCS-oracle-pinned in tests/test_substring.py)
        "substring_dedup_docs": substring.substring_dedup_pairs,
        # cross-document segment dedup (C4 boilerplate rule): count
        # segments with a skew-proof combiner, broadcast the hot set,
        # one streaming membership+reassembly pass (both SQL-oracled)
        "line_dedup_docs": segdedup.line_dedup,
        "chunk_dedup_docs": segdedup.chunk_dedup,
        # incremental dedup: new arrivals (deterministic hash shard)
        # scored against the base corpus's collapsed (text, rep) index
        # via one distributed left-outer join (SQL-oracled)
        "incremental_dedup_docs": dedup_text.incremental_exact_dedup,
        # Bloom-prefiltered variant: identical output (exact join is
        # the backstop), join pruned to Bloom-positive rows
        "incremental_dedup_bloom": dedup_text.incremental_dedup_bloom,
        # FUZZY incremental: new arrivals scored against the base by
        # MinHash-LSH near-duplication (one band co-shuffle, new x base
        # verify only; SQL-oracled via the MinHash-in-SQL machinery)
        "incremental_minhash_dedup": dedup_text.incremental_minhash_dedup,
        # per-source duplication report (join-free combiner chain;
        # SQL-oracled)
        "dup_by_source_docs": dedup_text.dup_rate_by_source,
        # sliding-window token chunk export (embedding-index prep;
        # shuffle-free, SQL-oracled)
        "chunk_export_docs": segdedup.chunk_export,
        # text analysis (SQL-oracled where exactly expressible)
        "lang_hist_docs": textstats.lang_hist,
        "token_count_docs": textstats.token_counts,
        "quality_docs": textstats.quality_scores,
        "langid_docs": textstats.langid,
        "fingerprint_docs": textstats.fingerprints,
        # intra-document repetition (Gopher-style duplicate-ngram
        # fraction; SQL-oracled)
        "repetition_stats_docs": textstats.repetition_stats,
        # self-trained unigram LM quality proxy (two-pass broadcast
        # model, int64 micro-nat quantization; SQL-oracled bit-exact)
        "unigram_logprob_docs": textstats.unigram_logprob,
        # CCNet head/middle/tail per-language LM-quality thirds
        # (broadcast unigram model + distributed rank scan; SQL-oracled
        # bit-exact via integer micro-nat scores + window rank)
        "ccnet_buckets_docs": textstats.ccnet_buckets,
        # deterministic hash-based splitting / sampling (SQL-oracled)
        "hash_split_docs": sampling.hash_split,
        "hash_sample_docs": sampling.hash_sample,
        # distributed top-k-per-key (partial top-k -> tiny final; SQL-oracled)
        "top_docs_per_lang": sampling.top_docs_per_lang,
        # per-language quota sample: bottom-k by doc hash (SQL-oracled)
        "stratified_sample_docs": sampling.stratified_sample,
        # weighted sample w/o replacement: integer priority sampling
        # (all-integer draw — SQL-oracled bit-for-bit)
        "weighted_sample_docs": sampling.weighted_sample,
        # training-mixture rebalancing to uniform language mix
        # (|langs|-row count pass + streaming hash-rate filter; SQL-oracled)
        "mixture_rebalance_docs": sampling.mixture_rebalance,
        # per-language length-quantile quality band (SQL-oracled)
        "quantile_filter_docs": textstats.quantile_filter,
        # per-group window-function parity: z-score normalization and
        # exact-integer decile assignment (both SQL-oracled)
        "zscore_lengths_docs": textstats.zscore_lengths,
        "length_deciles_docs": textstats.length_deciles,
        # per-document TF-IDF keywords over the global vocab DF
        # (SQL-oracled; libm-parity idf so the hash compare holds)
        "tfidf_top_terms_docs": textstats.tfidf_top_terms,
        # corpus-wide bigram heavy hitters (exact, combiner-based)
        "top_bigrams_docs": textstats.top_bigrams,
        # Count-min-sketch token frequencies for the exact top-k
        # tokens (mergeable counter matrix; oracled bit-for-bit)
        "cms_token_freq_docs": textstats.cms_token_freq,
        # canonical lowercase/whitespace normalization (pre-dedup)
        "normalize_text_docs": textstats.normalize_text,
        # inverted-index posting lists (Zipf-head exclusion is the
        # skew fix; SQL-oracled)
        "inverted_index_docs": textstats.inverted_index,
        "bpe_token_count_docs": textstats.bpe_token_counts,
        "stopword_ratio_docs": textstats.stopword_ratio,
        # PII scrub: email-then-long-number RE2 redaction (SQL-oracled;
        # planted-PII parity pinned in tests/test_textstats.py)
        "redact_pii_docs": textstats.redact_pii,
        # blocklist keyword screen: shuffle-free per-term substring
        # counts (SQL-oracled via replace-shrinkage math)
        "keyword_filter_docs": textstats.keyword_filter,
        # corpus drift monitor: JS divergence between the base/new
        # hash splits' token distributions, nano-nat-quantized for a
        # bit-exact integer-sum oracle
        "corpus_drift_docs": textstats.corpus_drift,
        # global vocabulary: corpus-wide token + document frequency
        # (hot-key-proof per-batch combiner; SQL-oracled)
        "vocab_docs": textstats.vocab,
        # token-aware shard packing: distributed prefix-sum scan over
        # doc_id order + shard-level manifest (both SQL-oracled)
        "pack_shards_docs": shards.pack_shards,
        "shard_manifest_docs": shards.shard_manifest,
        # deterministic global permutation rank (seeded training
        # shuffle; scan instance with key=splitmix64(doc_id), SQL-oracled)
        "shuffle_rank_docs": shards.global_shuffle,
        # global ORDER BY rank (curriculum/sorted export): the scan
        # instance with key = -n_chars (SQL-oracled)
        "rank_by_length_docs": shards.rank_by_length,
        # events: windowed aggregate + gap sessionization (SQL-oracled)
        "events_windowed": events.windowed_counts,
        # hopping (sliding) windows: in-kernel event fan-out, partials
        # shuffle (SQL-oracled)
        "events_hopping": events.hopping_counts,
        "events_sessions": events.sessionize,
        "events_session_stats": events.session_stats,
        # exact distinct-count: salted two-level dedupe (SQL-oracled)
        "events_distinct_users": events.distinct_users,
        # structured-field extraction from raw JSON payloads (SQL-oracled)
        "events_props_extract": events.props_extract,
        # as-of join: last click at-or-before each purchase (SQL-oracled
        # via IGNORE NULLS window fill, deterministic tie-breaks)
        "events_asof_join": events.asof_join,
        # banded RANGE join: every match in the attribution window
        # (SQL-oracled vs a plain inequality join)
        "events_range_join": events.range_join,
        # HyperLogLog approximate distinct (mergeable sketch; pytest
        # pins the estimate within 3% of exact — no SQL oracle, the
        # value is sketch-derived)
        "events_distinct_users_approx": events.distinct_users_approx,
        # HDR-histogram approximate quantiles (oracled sketch)
        "events_value_quantiles": events.value_quantiles_sketch,
        # ordered funnel completion (greedy earliest chain ≡ existence;
        # SQL-oracled via chained min-ts CTEs)
        "events_funnel": events.funnel_counts,
        # retention triangle: first-event-week cohorts x week offsets
        # (distinct (user, week) combiner + ONE user-bucket exchange;
        # SQL-oracled)
        "events_cohort_retention": events.cohort_retention,
        # anomaly windows: count > mean + 3σ, tested in EXACT integer
        # arithmetic so the boundary can't float-flip (SQL-oracled)
        "events_spikes": events.window_spikes,
        # unbounded-preceding window function in int64 cents (SQL-oracled)
        "events_running_totals": events.running_totals,
        # LAG window: per-user per-day cents + delta vs the previous
        # ACTIVE day (per-batch user-day combiner, hashed user buckets)
        "events_daily_deltas": events.daily_deltas,
        # CDC/upsert compaction: last-writer-wins per key (per-batch
        # arg-max combiner, ONE user-bucket exchange; SQL-oracled)
        "events_latest_per_user": events.latest_per_user,
        # order-independent corpus content fingerprint (shuffle-free
        # modular sum of per-row hashes; SQL-oracled bit-for-bit)
        "corpus_checksum_docs": textstats.corpus_checksum,
        # GROUPING SETS rollup: one corpus pass, margins folded from
        # the cell aggregate (SQL-oracled)
        "lang_source_rollup_docs": textstats.lang_source_rollup,
        # Gopher quality screen (Rae et al. 2021): shuffle-free
        # row-local rules, thresholds on unrounded ratios (SQL-oracled)
        "gopher_rules_docs": textstats.gopher_rules,
        # exact distributed quantiles via value-histogram combiner
        "length_quantiles_docs": textstats.length_quantiles,
        # relational shapes over the fact/dimension tables (all three
        # SQL-oracled; money summed as int64 cents so the aggregate is
        # bit-exact under any reduction order)
        "lineitem_pricing_summary": relational.pricing_summary,
        "orders_by_nation": relational.orders_by_nation,
        "top_parts_by_revenue": relational.top_parts_by_revenue,
        # fact x fact distributed hash join: neither side broadcastable
        "priority_revenue": relational.priority_revenue,
        # 3-fact-table chained hash join with per-key collapse before
        # each shuffle (SQL-oracled)
        "segment_revenue": relational.segment_revenue,
        # left-anti join (TPC-H Q22 core): single co-partitioning
        # exchange, orders collapsed to batch-distinct keys, no
        # broadcast key set (SQL-oracled)
        "customers_without_orders": relational.customers_without_orders,
        # TPC-H Q3 shape: segment semi-join -> date-filtered bucket
        # join -> per-order revenue -> distributed top-k (SQL-oracled)
        "shipping_priority": relational.shipping_priority,
        # embeddings: similarity search + near-dup
        "embedding_norms": _embedding_norms,
        "knn_bruteforce": ann.knn_bruteforce,
        "ann_lsh": ann.ann_lsh,
        # IVF coarse-quantizer ANN (scale path; full-probe degenerate
        # case proven equal to brute force in tests/test_ann.py)
        "ann_ivf": ann.ann_ivf,
        # IVF-PQ: product-quantized codes (uint8 per subspace) + ADC
        # LUT scoring + exact re-rank of the shortlist — the
        # memory-scale ANN tier; codebook-recovery config pinned
        # equal to brute force in tests/test_ann.py
        "ann_ivfpq": ann.ann_ivfpq,
        # degenerate IVF config (nprobe == n_centroids) is EXACTLY
        # brute force, so the whole IVF machinery (kmeans training,
        # inverted-list tagging, probe + partial top-k merge) gets the
        # brute-force DuckDB oracle
        "ann_ivf_fullprobe": lambda sf: ann.ann_ivf(
            sf, n_centroids=16, nprobe=16
        ),
        "embedding_neardup": ann.embedding_neardup,
        # exact all-pairs baseline behind the LSH near-dup (SQL-oracled)
        "embedding_neardup_exact": ann.embedding_neardup_exact,
        # SemDeDup (k-means partition + within-cluster cosine prune);
        # the single-cluster keep-min-id degenerate config is
        # SQL-oracled (cosine cross join + recursive closure)
        "semantic_dedup": ann.semantic_dedup,
        "semantic_dedup_exact": ann.semantic_dedup_exact,
        # embedding-space eval-suite decontamination: broadcast eval
        # matrix, one streaming matmul kernel (SQL-oracled cross join)
        "decontaminate_embeddings": ann.decontaminate_embeddings,
        # multimodal stages (corpus)
        "multimodal_decode_stats": corpus_decode_stats,
        "multimodal_decode_dims": corpus_decode_dims,
        "multimodal_thumbnails": corpus_thumbnails,
        # audio / video (deterministic FWAV/FVID stand-in codecs;
        # decode-dims variants are SQL-oracled vs stored metadata)
        "audio_features": lambda sf: multimodal.audio_feature_stats(_audio_corpus_for(sf)),
        "audio_decode_dims": _audio_decode_dims,
        "audio_durations": _audio_durations,
        "video_sampled_frames": _video_sampled_frames,
        "video_frame_samples": lambda sf: multimodal.video_frame_samples(_video_corpus_for(sf)),
        "video_decode_dims": lambda sf: multimodal.video_decode_dims(_video_corpus_for(sf)),
        # the flagship dedup machinery applied to the A/V modalities
        # (frame-pHash / spectral-landmark sets; exact-Jaccard-verified
        # MinHash candidates)
        "video_neardup": lambda sf: multimodal.video_neardup_pairs(_video_corpus_for(sf)),
        "audio_neardup": lambda sf: multimodal.audio_neardup_pairs(_audio_corpus_for(sf)),
        # image-side curation: byte-identical dedup (payload hashed
        # in-batch, bytes never shuffle) and the composed usable ->
        # exact-dedup -> pHash-cluster keep list (both SQL-oracled
        # against raw-bytes windows + a recursive Hamming closure)
        "image_exact_dedup": lambda sf: images.image_exact_dedup(_corpus_for(sf)),
        # exact-PIXEL dedup: the tier between byte identity (misses
        # re-encodes of the same pixels) and pHash near-dup (admits
        # different pixels) — decode-valued, so pytest-pinned (planted
        # re-encode corpus), no SQL oracle
        "pixel_exact_dedup":
            lambda sf: images.pixel_exact_dedup(_corpus_for(sf)),
        "curate_images": lambda sf: images.curate_images(_corpus_for(sf)),
        # quality-aware variant: keep the largest-payload member per
        # pHash cluster (tie min id) — the image-axis analog of
        # minhash_dedup_keep_best; zero extra passes over bytes
        "curate_images_keep_best":
            lambda sf: images.curate_images_keep_best(_corpus_for(sf)),
        # duplication hot-spot report: k most-duplicated pHash clusters
        # (uniq collapse -> LSH+CC over distinct sigs -> partial top-k)
        "top_dup_clusters":
            lambda sf: images.top_dup_clusters(_corpus_for(sf)),
        # label-vs-content covariance screen: exact int64 moment
        # partials, one float expression (DuckDB-bit-equal)
        "caption_payload_corr":
            lambda sf: images.caption_payload_corr(_corpus_for(sf)),
        # per-format payload footprint (combiner partials; avg is ONE
        # float64 division after the integer sums — DuckDB-bit-equal)
        "image_format_stats":
            lambda sf: images.image_format_stats(_corpus_for(sf)),
        # label-quality screen: captions reused across DISTINCT
        # payloads (identity triple in-batch; bytes never shuffle)
        "caption_collisions":
            lambda sf: images.caption_collisions(_corpus_for(sf)),
        # joint A+B near-dup: caption-equality blocking + pHash
        # Hamming verify over distinct (caption, phash) nodes
        "caption_phash_neardup":
            lambda sf: images.caption_phash_neardup(_corpus_for(sf)),
        # the image-axis tier-dedup funnel (total -> usable ->
        # byte-exact -> pHash-cluster), flagship machinery throughout
        "tiered_dedup_report_images":
            lambda sf: images.tiered_dedup_report_images(_corpus_for(sf)),
        # daily-crawl increment: new shard scored against the base on
        # both tiers (byte identity + exhaustive 65-probe Hamming<=1)
        "incremental_image_dedup":
            lambda sf: images.incremental_image_dedup(_corpus_for(sf)),
        # threshold calibration: Hamming-distance mass over distinct
        # phash pairs at a wider radius (flagship banding, no O(n^2))
        "phash_distance_histogram":
            lambda sf: images.phash_distance_histogram(_corpus_for(sf)),
        # per-encoder crawl-health: byte-dup share per format
        # (join-free; image analog of dup_by_source_docs)
        "dup_rate_by_format":
            lambda sf: images.dup_rate_by_format(_corpus_for(sf)),
        # payload-size outlier screen: exact per-format quantiles via
        # the value-histogram combiner (bytes never read past offsets)
        "image_size_quantiles":
            lambda sf: images.image_size_quantiles(_corpus_for(sf)),
        # caption-side language mixture (documents langid scorer over
        # the caption column; per-batch count combiner)
        "caption_langid_hist":
            lambda sf: images.caption_langid_hist(_corpus_for(sf)),
        # partition-scoped dedup: pHash Hamming clusters WITHIN
        # caption-language partitions (one global banding pass, edges
        # assigned to partitions by node-membership joins, per-language
        # CC) — the shard-the-all-to-all-by-a-cheap-key production trick
        "lang_partitioned_image_dedup":
            lambda sf: images.lang_partitioned_image_dedup(_corpus_for(sf)),
        # the per-row dedup invariant (pixel equality / PSNR >= 40 dB
        # for lossy) as a runtime audit over non-singleton clusters;
        # decode is the sandbox codec -> pytest-pinned, no SQL oracle
        "cluster_psnr_report":
            lambda sf: images.cluster_psnr_report(_corpus_for(sf)),
        # eval-suite decontamination on the image axis: byte-identity
        # + exhaustive Hamming-probe membership against the broadcast
        # eval side (the image twin of decontaminate_docs)
        "decontaminate_images":
            lambda sf: images.decontaminate_images(_corpus_for(sf)),
        # signature-health audit: per-bit pHash population counts
        # (degenerate bits break the banding pigeonhole)
        "phash_bit_stats":
            lambda sf: images.phash_bit_stats(_corpus_for(sf)),
        # label-noise audit: distinct captions per pHash near-dup
        # cluster (A-axis labels over the B-axis cluster structure)
        "cluster_caption_consistency":
            lambda sf: images.cluster_caption_consistency(_corpus_for(sf)),
        # label consolidation: every image gets its cluster's MAJORITY
        # caption (tie -> min caption) — the fix for the noise the
        # consistency audit measures
        "cluster_caption_vote":
            lambda sf: images.cluster_caption_vote(_corpus_for(sf)),
        # capacity planning: rows/bytes reclaimed per format by the
        # quality-aware keep-best dedup
        "dedup_storage_savings":
            lambda sf: images.dedup_storage_savings(_corpus_for(sf)),
        # chaining audit: max intra-cluster Hamming distance histogram
        # (transitive closure can merge A-B-C with Hamming(A,C)=2d)
        "cluster_diameter_hist":
            lambda sf: images.cluster_diameter_hist(_corpus_for(sf)),
        # A/B-axis agreement: pairs sharing caption vs pHash cluster
        # (pure C(n,2) counting, no pair ever materialized)
        "caption_cluster_agreement":
            lambda sf: images.caption_cluster_agreement(_corpus_for(sf)),
        # banding-health audit: per-band distinct keys + hottest key
        # over the flagship's actual pigeonhole layout
        "phash_band_entropy":
            lambda sf: images.phash_band_entropy(_corpus_for(sf)),
        # decode/resize batch-geometry planning: orientation + pixel
        # budget per format (metadata columns only)
        "aspect_ratio_stats":
            lambda sf: images.aspect_ratio_stats(_corpus_for(sf)),
        # multi-evidence FUSED dedup: one CC over the union of the
        # byte/caption/pHash evidence graphs + per-cluster provenance
        "fused_dedup_images":
            lambda sf: images.fused_dedup_images(_corpus_for(sf)),
        # threshold-sensitivity audit: how radius-1 clusters chain
        # together at radius 2 (one banding run, two CC passes)
        "cluster_merge_profile":
            lambda sf: images.cluster_merge_profile(_corpus_for(sf)),
        # the per-row curation artifact: keep + drop reason
        # (unusable / byte_dup / near_dup / kept)
        "image_drop_report":
            lambda sf: images.image_drop_report(_corpus_for(sf)),
        # A-axis NEAR-dup: caption SimHash Hamming<=3 pairs
        "caption_simhash_neardup":
            lambda sf: images.caption_simhash_neardup(_corpus_for(sf)),
        # A-axis threshold calibration: SimHash distance mass at a
        # wider radius (the caption twin of phash_distance_histogram)
        "caption_simhash_distance_hist":
            lambda sf: images.caption_simhash_distance_hist(_corpus_for(sf)),
        # image-axis ranked similarity search: exact Hamming top-k
        "phash_knn":
            lambda sf: images.phash_knn(_corpus_for(sf)),
        # leakage-free train/val/test: split key = near-dup cluster
        "cluster_safe_split":
            lambda sf: images.cluster_safe_split(_corpus_for(sf)),
        # soft dedup: weight = 1/cluster row population per image
        "dedup_sample_weights":
            lambda sf: images.dedup_sample_weights(_corpus_for(sf)),
        # byte-budgeted pre-shuffled shard layout (export step)
        "pack_shards_images":
            lambda sf: images.pack_shards_images(_corpus_for(sf)),
    }
    return _driver_window_order(q)


# The correctness driver hash-checks exactly the FIRST 50 queries()
# entries in insertion order. Rounds 1-3 spent that window on the
# flagship + documents families; round 4 rotated it onto the
# images / relational / sampling / shards families. Round 5 finishes
# the rotation: this list is `tools/verify_ledger.py --window 50`
# output — six pinned names whose code paths changed THIS round
# (flagship 4: the humid.py phase loop was rewritten for streaming;
# fused_dedup_images: gained the ev_pixel evidence tier;
# decontaminate_embeddings: driver-pull bound) followed by the 44
# never-driver-verified oracled queries in least-recently-verified
# order. The one gap the 50-slot window can't fit
# (caption_simhash_distance_hist) is covered by a recorded sweep in
# tools/sweeps/. Regenerate with the ledger, don't hand-edit.
_DRIVER_WINDOW = [
    # pinned: code paths modified in round 5
    "humid_uniq",
    "humid_edges",
    "humid_assign_full_sql",
    "humid_stats_full_sql",
    "fused_dedup_images",
    "decontaminate_embeddings",
    # never-driver-verified oracled queries (ledger order)
    "fingerprint_docs",
    "repetition_stats_docs",
    "unigram_logprob_docs",
    "ccnet_buckets_docs",
    "hash_sample_docs",
    "top_docs_per_lang",
    "mixture_rebalance_docs",
    "quantile_filter_docs",
    "zscore_lengths_docs",
    "length_deciles_docs",
    "tfidf_top_terms_docs",
    "top_bigrams_docs",
    "cms_token_freq_docs",
    "normalize_text_docs",
    "inverted_index_docs",
    "redact_pii_docs",
    "keyword_filter_docs",
    "corpus_drift_docs",
    "vocab_docs",
    "shard_manifest_docs",
    "events_hopping",
    "events_session_stats",
    "events_distinct_users",
    "events_props_extract",
    "events_asof_join",
    "events_range_join",
    "events_distinct_users_approx",
    "events_value_quantiles",
    "events_funnel",
    "events_cohort_retention",
    "events_spikes",
    "events_running_totals",
    "events_daily_deltas",
    "events_latest_per_user",
    "corpus_checksum_docs",
    "lang_source_rollup_docs",
    "gopher_rules_docs",
    "length_quantiles_docs",
    "shipping_priority",
    "ann_ivf_fullprobe",
    "embedding_neardup_exact",
    "audio_durations",
    "video_sampled_frames",
    "cluster_caption_vote",
]


def _driver_window_order(q: dict) -> dict:
    window = [k for k in _DRIVER_WINDOW if k in q]
    rest = {k: v for k, v in q.items() if k not in set(window)}
    return {**{k: q[k] for k in window}, **rest}


def _langid_score_sql(lang: str) -> str:
    """Shared builder: humid_ray.oracles.langid_score_sql."""
    from humid_ray.oracles import langid_score_sql

    return langid_score_sql(lang)


def _decode_dims_oracle() -> str:
    """The corpus's stored (w, h) metadata is ground truth for the
    decode path; a row is decodable iff its stored phash is non-null
    (synth generator invariant). The corpus is generated here if the
    driver runs oracles before queries (idempotent, cached)."""
    corpus = _corpus_for("sf0.01")  # correctness gate runs at sf0.01
    return (
        f"SELECT image_id, w AS width, h AS height "
        f"FROM read_parquet('{corpus}/*.parquet') WHERE phash IS NOT NULL"
    )


def _audio_dims_oracle() -> str:
    corpus = _audio_corpus_for("sf0.01")
    return (
        f"SELECT audio_id, sr, n_samples "
        f"FROM read_parquet('{corpus}/*.parquet') WHERE sr IS NOT NULL"
    )


def _video_dims_oracle() -> str:
    corpus = _video_corpus_for("sf0.01")
    return (
        f"SELECT video_id, n_frames, w, h "
        f"FROM read_parquet('{corpus}/*.parquet') WHERE n_frames IS NOT NULL"
    )


def _audio_durations_oracle() -> str:
    corpus = _audio_corpus_for("sf0.01")
    return (
        f"SELECT audio_id, round(CAST(n_samples AS DOUBLE) / sr, 6) AS duration_s "
        f"FROM read_parquet('{corpus}/*.parquet') WHERE sr IS NOT NULL"
    )


def _video_sampled_frames_oracle(stride: int = 4) -> str:
    corpus = _video_corpus_for("sf0.01")
    return (
        f"SELECT video_id, CAST(ceil(n_frames / {stride}.0) AS BIGINT) AS n_sampled "
        f"FROM read_parquet('{corpus}/*.parquet') WHERE n_frames IS NOT NULL"
    )


def _phash_flagship_oracles() -> dict[str, str]:
    """DuckDB oracles for the phash-only flagship phases over the
    synthetic corpus parquet (generated here if the driver runs oracles
    before queries — idempotent, cached). Uses xor-with-sign-bit to
    compare int64 bit patterns in uint64 order, bit_count(xor) for
    Hamming distance, and a recursive transitive closure for connected
    components (max_distance=1, maximum clustering: cluster == CC,
    seed == min-sig member, rep == first count-argmax in ascending
    unsigned sig order)."""
    corpus = _corpus_for("sf0.01")
    src = f"read_parquet('{corpus}/*.parquet')"
    uniq = (
        f"SELECT phash AS sig, COUNT(*) AS \"count\", MIN(image_id) AS first_id "
        f"FROM {src} WHERE phash IS NOT NULL GROUP BY phash"
    )
    edges = (
        f"WITH nodes AS (SELECT DISTINCT phash AS sig FROM {src} "
        "WHERE phash IS NOT NULL) "
        "SELECT a.sig AS sig_a, b.sig AS sig_b FROM nodes a JOIN nodes b "
        f"ON xor(a.sig, {_SB}) < xor(b.sig, {_SB}) "
        "AND bit_count(xor(a.sig, b.sig)) <= 1"
    )
    assign = (
        f"WITH RECURSIVE nodes AS ({uniq}), "
        "e AS (SELECT a.sig AS sa, b.sig AS sb FROM nodes a JOIN nodes b "
        "ON a.sig != b.sig AND bit_count(xor(a.sig, b.sig)) <= 1), "
        "reach(src, dst) AS (SELECT sig, sig FROM nodes UNION "
        "SELECT r.src, e.sb FROM reach r JOIN e ON e.sa = r.dst), "
        "comp AS (SELECT src AS sig, "
        f"xor(min(xor(dst, {_SB})), {_SB}) AS cluster_seed "
        "FROM reach GROUP BY src), "
        "cl AS (SELECT cluster_seed, sum(\"count\") AS cluster_size "
        "FROM comp JOIN nodes USING (sig) GROUP BY cluster_seed) "
        "SELECT n.sig, n.\"count\", n.first_id, c.cluster_seed, "
        "CAST(cl.cluster_size AS BIGINT) AS cluster_size "
        "FROM nodes n JOIN comp c USING (sig) JOIN cl USING (cluster_seed)"
    )
    cc_prefix = (
        f"WITH RECURSIVE nodes AS ({uniq}), "
        "e AS (SELECT a.sig AS sa, b.sig AS sb FROM nodes a JOIN nodes b "
        "ON a.sig != b.sig AND bit_count(xor(a.sig, b.sig)) <= 1), "
        "reach(src, dst) AS (SELECT sig, sig FROM nodes UNION "
        "SELECT r.src, e.sb FROM reach r JOIN e ON e.sa = r.dst), "
        "comp AS (SELECT src AS sig, "
        f"xor(min(xor(dst, {_SB})), {_SB}) AS cluster_seed "
        "FROM reach GROUP BY src)"
    )
    stats = (
        f"{cc_prefix} "
        f"SELECT (SELECT count(*) FROM {src}) AS total, "
        f"(SELECT count(phash) FROM {src}) AS usable, "
        "(SELECT count(*) FROM nodes) AS \"unique\", "
        "(SELECT count(DISTINCT cluster_seed) FROM comp) AS clusters"
    )
    counts_hist = (
        f"WITH nodes AS ({uniq}) "
        "SELECT \"count\" AS value, count(*) AS n FROM nodes GROUP BY \"count\""
    )
    neigh_hist = (
        f"WITH nodes AS ({uniq}), "
        "deg AS (SELECT a.sig, count(*) AS d FROM nodes a JOIN nodes b "
        "ON a.sig != b.sig AND bit_count(xor(a.sig, b.sig)) <= 1 GROUP BY a.sig) "
        "SELECT value, n FROM ("
        "SELECT d AS value, count(*) AS n FROM deg GROUP BY d "
        "UNION ALL SELECT 0 AS value, "
        "(SELECT count(*) FROM nodes) - (SELECT count(*) FROM deg) AS n"
        ") WHERE n > 0"
    )
    cluster_hist = (
        f"{cc_prefix} "
        "SELECT value, count(*) AS n FROM ("
        "SELECT CAST(sum(\"count\") AS BIGINT) AS value FROM comp "
        "JOIN nodes USING (sig) GROUP BY cluster_seed) GROUP BY value"
    )
    return {
        "humid_uniq_sql": uniq,
        "humid_edges_sql": edges,
        "humid_assign_sql": assign,
        "humid_stats_sql": stats,
        "humid_counts_hist_sql": counts_hist,
        "humid_neigh_hist_sql": neigh_hist,
        "humid_cluster_hist_sql": cluster_hist,
    }


def _textstats_oracles() -> dict[str, str]:
    from humid_ray.pipelines.textstats import BPE_PATTERN, STOPWORDS

    pat_sql = BPE_PATTERN.replace("'", "''")
    sw = ", ".join(f"'{s}'" for s in STOPWORDS)
    return {
        "bpe_token_count_docs": (
            f"SELECT doc_id, len(regexp_extract_all(coalesce(text,''), "
            f"'{pat_sql}')) AS n_bpe_tokens FROM documents"
        ),
        "stopword_ratio_docs": (
            "SELECT doc_id, len(toks) AS n_tokens, "
            f"len(list_filter(toks, t -> t IN ({sw}))) AS n_stopwords, "
            "round(CASE WHEN len(toks) > 0 THEN "
            f"CAST(len(list_filter(toks, t -> t IN ({sw}))) AS DOUBLE) / len(toks) "
            "ELSE 0 END, 6) AS stopword_ratio "
            "FROM (SELECT doc_id, regexp_extract_all(lower(coalesce(text,'')), "
            "'[0-9a-z]+') AS toks FROM documents)"
        ),
    }


_KNN_ORACLE_SQL = (
    "WITH e AS (SELECT vec_id, "
    "list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings), "
    "q AS (SELECT vec_id AS query_id, v AS qv FROM e ORDER BY vec_id LIMIT 8), "
    "s AS (SELECT q.query_id, e.vec_id AS neighbor_id, "
    "list_inner_product(q.qv, e.v) / "
    "(greatest(sqrt(list_inner_product(q.qv, q.qv)), 1e-12) * "
    "greatest(sqrt(list_inner_product(e.v, e.v)), 1e-12)) AS cos "
    "FROM q CROSS JOIN e) "
    "SELECT query_id, neighbor_id, "
    "CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) "
    "AS BIGINT) AS \"rank\", round(cos, 6) AS cosine "
    "FROM s QUALIFY \"rank\" <= 5"
)


def oracle_sql() -> dict[str, str]:
    from humid_ray import oracles as _orc
    from humid_ray.pipelines import ann as _ann_mod
    from humid_ray.pipelines import dedup_text as _dedup_mod
    from humid_ray.pipelines import events as _events_mod
    from humid_ray.pipelines import images as _images_mod
    from humid_ray.pipelines import relational as _relational_mod
    from humid_ray.pipelines import sampling as _sampling_mod
    from humid_ray.pipelines import segdedup as _segdedup
    from humid_ray.pipelines import shards as _shards_mod
    from humid_ray.pipelines import substring as _substring_mod
    from humid_ray.pipelines import textstats as _textstats_mod

    return {
        **_phash_flagship_oracles(),
        **_textstats_oracles(),
        # hash-valued oracles: the engine's deterministic 64-bit chain
        # (splitmix64 / polynomial byte hash / shingle combine)
        # re-expressed in DuckDB HUGEINT arithmetic (humid_ray/oracles.py)
        "simhash_docs": _orc.simhash_docs_sql(),
        "simhash_neardup_docs": _orc.simhash_neardup_sql(),
        "fingerprint_docs": _orc.fingerprint_docs_sql(),
        # MinHash-in-SQL: permutation constants baked at build time,
        # band membership = all rows-per-band lanes equal
        "minhash_neardup_docs": _orc.minhash_neardup_sql(),
        "ngram_jaccard_lsh": _orc.ngram_jaccard_lsh_sql(),
        "minhash_cluster_docs": _orc.minhash_cluster_sql(),
        "cluster_safe_split_docs":
            _dedup_mod.cluster_safe_split_docs_sql(),
        "dedup_sample_weights_docs":
            _dedup_mod.dedup_sample_weights_docs_sql(),
        "minhash_keep_docs": _orc.minhash_keep_sql(),
        "minhash_keep_best_docs": _orc.minhash_keep_best_sql(),
        "tiered_dedup_report_docs": _orc.tiered_dedup_report_sql(),
        "fused_dedup_docs": _orc.fused_dedup_docs_sql(),
        "decontaminate_docs": _orc.decontaminate_sql(),
        "curate_docs": _orc.curate_docs_sql(),
        "repetition_stats_docs": _orc.repetition_stats_sql(),
        "unigram_logprob_docs": _textstats_mod.unigram_logprob_sql(),
        "ccnet_buckets_docs": _textstats_mod.ccnet_buckets_sql(),
        "hash_split_docs": _orc.hash_split_sql(),
        "hash_sample_docs": _orc.hash_sample_sql(),
        "top_docs_per_lang": (
            "SELECT lang, doc_id, n_chars, "
            "CAST(row_number() OVER (PARTITION BY lang "
            "ORDER BY n_chars DESC, doc_id) AS BIGINT) AS \"rank\" "
            "FROM documents QUALIFY \"rank\" <= 10"
        ),
        # FULL default flagship config (phash top-32 || caption-simhash
        # top-32): the caption SimHash being SQL-expressible makes the
        # composite-word uniq/edges phases oracle-able too (clustering
        # phases stay pytest-pinned: directional walk order is not SQL)
        "humid_uniq": _orc.flagship_uniq_sql(
            f"{_corpus_for('sf0.01')}/*.parquet"
        ),
        "humid_edges": _orc.flagship_edges_sql(
            f"{_corpus_for('sf0.01')}/*.parquet"
        ),
        "humid_assign_full_sql": _orc.flagship_assign_sql(
            f"{_corpus_for('sf0.01')}/*.parquet"
        ),
        "humid_stats_full_sql": _orc.flagship_stats_sql(
            f"{_corpus_for('sf0.01')}/*.parquet"
        ),
        "humid_counts_hist_full_sql": _orc.flagship_counts_hist_sql(
            f"{_corpus_for('sf0.01')}/*.parquet"
        ),
        "humid_neigh_hist_full_sql": _orc.flagship_neigh_hist_sql(
            f"{_corpus_for('sf0.01')}/*.parquet"
        ),
        "humid_cluster_hist_full_sql": _orc.flagship_cluster_hist_sql(
            f"{_corpus_for('sf0.01')}/*.parquet"
        ),
        "ngram_jaccard_docs": (
            "WITH toks AS (SELECT doc_id, "
            "regexp_extract_all(lower(coalesce(text,'')), '[0-9a-z]+') AS t "
            "FROM documents), "
            "sh AS (SELECT doc_id, list_distinct(CASE WHEN len(t) >= 3 THEN "
            "list_transform(range(1, len(t)-1), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]) "
            "ELSE t END) AS s FROM toks) "
            "SELECT doc_a, doc_b, round(jac, 6) AS ngram_jaccard FROM ("
            "SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, "
            "CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) / "
            "NULLIF(len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)), 0) AS jac "
            "FROM sh a JOIN sh b ON a.doc_id < b.doc_id) WHERE jac >= 0.8"
        ),
        "knn_bruteforce": _KNN_ORACLE_SQL,
        "embedding_neardup_exact": (
            "WITH e AS (SELECT vec_id, "
            "list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings), "
            "s AS (SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, "
            "list_inner_product(a.v, b.v) / "
            "(greatest(sqrt(list_inner_product(a.v, a.v)), 1e-12) * "
            "greatest(sqrt(list_inner_product(b.v, b.v)), 1e-12)) AS cos "
            "FROM e a JOIN e b ON a.vec_id < b.vec_id) "
            "SELECT vec_a, vec_b, round(cos, 6) AS cosine FROM s "
            "WHERE cos >= 0.4"
        ),
        # full-probe IVF == brute force exactly (equality pinned in
        # tests/test_ann.py) -> same oracle
        "ann_ivf_fullprobe": _KNN_ORACLE_SQL,
        # single-cluster keep-min-id SemDeDup: dup components over the
        # cosine>=0.4 graph (recursive closure), keep = min vec_id
        "semantic_dedup_exact": (
            "WITH RECURSIVE e AS (SELECT vec_id, "
            "list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v "
            "FROM embeddings), "
            "edges AS (SELECT a.vec_id AS sa, b.vec_id AS sb "
            "FROM e a JOIN e b ON a.vec_id != b.vec_id "
            "AND list_inner_product(a.v, b.v) / "
            "(greatest(sqrt(list_inner_product(a.v, a.v)), 1e-12) * "
            "greatest(sqrt(list_inner_product(b.v, b.v)), 1e-12)) >= 0.4), "
            "reach(src, dst) AS (SELECT vec_id, vec_id FROM e UNION "
            "SELECT r.src, edges.sb FROM reach r JOIN edges "
            "ON edges.sa = r.dst), "
            "comp AS (SELECT src AS vec_id, min(dst) AS root "
            "FROM reach GROUP BY src) "
            "SELECT vec_id, CAST(0 AS BIGINT) AS cluster, "
            "(vec_id = root) AS keep FROM comp"
        ),
        "decontaminate_embeddings": _ann_mod.decontaminate_embeddings_sql(),
        "events_windowed": (
            "SELECT time_bucket(INTERVAL 1 hour, ts) AS window_start, "
            "event_type, COUNT(*) AS n, round(SUM(value), 6) AS total "
            "FROM events GROUP BY 1, 2"
        ),
        "events_hopping": (
            "WITH x AS (SELECT time_bucket(INTERVAL 15 minute, ts) "
            "- to_minutes(15*i) AS ws, event_type, value "
            "FROM events, range(0, 4) t(i)) "
            "SELECT ws AS window_start, event_type, COUNT(*) AS n, "
            "round(SUM(value), 6) AS total FROM x GROUP BY ws, event_type"
        ),
        "lineitem_pricing_summary": (
            "SELECT l_returnflag, l_linestatus, "
            "CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty, "
            "CAST(SUM(CAST(round(l_extendedprice*100, 0) AS BIGINT)) AS BIGINT) "
            "AS sum_base_cents, "
            "CAST(SUM(CAST(round(l_extendedprice*(1-l_discount)*100, 0) AS BIGINT)) "
            "AS BIGINT) AS sum_disc_cents, "
            "COUNT(*) AS count_order, "
            "round(CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE) / COUNT(*), 6) "
            "AS avg_qty, "
            "round(CAST(SUM(CAST(round(l_extendedprice*100, 0) AS BIGINT)) AS DOUBLE) "
            "/ 100 / COUNT(*), 6) AS avg_price "
            "FROM lineitem GROUP BY l_returnflag, l_linestatus"
        ),
        "orders_by_nation": (
            "SELECT n_name, COUNT(*) AS n_orders, "
            "CAST(SUM(CAST(round(o_totalprice*100, 0) AS BIGINT)) AS BIGINT) "
            "AS total_cents "
            "FROM orders JOIN customer ON o_custkey = c_custkey "
            "JOIN nation ON c_nationkey = n_nationkey GROUP BY n_name"
        ),
        "top_parts_by_revenue": (
            "WITH r AS (SELECT l_partkey, "
            "CAST(SUM(CAST(round(l_extendedprice*(1-l_discount)*100, 0) AS BIGINT)) "
            "AS BIGINT) AS revenue_cents FROM lineitem GROUP BY l_partkey) "
            "SELECT p.p_partkey, p.p_name, r.revenue_cents, "
            "CAST(row_number() OVER (ORDER BY r.revenue_cents DESC, p.p_partkey) "
            "AS BIGINT) AS \"rank\" "
            "FROM r JOIN part p ON p.p_partkey = r.l_partkey "
            "QUALIFY \"rank\" <= 10"
        ),
        "events_distinct_users_approx": _orc.hll_distinct_users_sql(),
        "events_value_quantiles": _orc.value_quantiles_sketch_sql(),
        "events_sessions": (
            "WITH o AS (SELECT user_id, ts, event_id, value, "
            "CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) "
            "> INTERVAL 30 minute THEN 1 ELSE 0 END AS brk FROM events), "
            "s AS (SELECT *, SUM(brk) OVER (PARTITION BY user_id "
            "ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS sess FROM o) "
            "SELECT user_id, MIN(ts) AS session_start, MAX(ts) AS session_end, "
            "CAST(COUNT(*) AS BIGINT) AS n_events, round(SUM(value), 6) AS total_value "
            "FROM s GROUP BY user_id, sess"
        ),
        "events_session_stats": (
            "WITH o AS (SELECT user_id, ts, event_id, "
            "CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) "
            "> INTERVAL 30 minute THEN 1 ELSE 0 END AS brk FROM events), "
            "s AS (SELECT *, SUM(brk) OVER (PARTITION BY user_id "
            "ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS sess FROM o), "
            "g AS (SELECT user_id, sess, COUNT(*) AS n_events "
            "FROM s GROUP BY user_id, sess) "
            "SELECT CAST(COUNT(*) AS BIGINT) AS n_sessions, "
            "CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users, "
            "CAST(MAX(n_events) AS BIGINT) AS max_session_events FROM g"
        ),
        "priority_revenue": (
            "WITH r AS (SELECT l_orderkey, "
            "CAST(SUM(CAST(round(l_extendedprice*(1-l_discount)*100, 0) "
            "AS BIGINT)) AS BIGINT) AS revenue_cents "
            "FROM lineitem GROUP BY l_orderkey) "
            "SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders, "
            "CAST(SUM(r.revenue_cents) AS BIGINT) AS revenue_cents "
            "FROM r JOIN orders ON o_orderkey = r.l_orderkey "
            "GROUP BY o_orderpriority"
        ),
        "events_distinct_users": (
            "SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, "
            "event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users "
            "FROM events GROUP BY 1, 2"
        ),
        "events_asof_join": (
            # sort clicks (side 0) before a same-ts purchase so a click
            # AT the purchase timestamp counts as "at or before",
            # matching the engine's (ts, side, event_id) lexsort
            "WITH u AS ("
            "SELECT user_id, ts, event_id, 0 AS side FROM events "
            "WHERE event_type = 'click' "
            "UNION ALL "
            "SELECT user_id, ts, event_id, 1 AS side FROM events "
            "WHERE event_type = 'purchase'), "
            "w AS (SELECT *, "
            "last_value(CASE WHEN side = 0 THEN ts END IGNORE NULLS) "
            "OVER (PARTITION BY user_id ORDER BY ts, side, event_id "
            "ROWS UNBOUNDED PRECEDING) AS click_ts, "
            "last_value(CASE WHEN side = 0 THEN event_id END IGNORE NULLS) "
            "OVER (PARTITION BY user_id ORDER BY ts, side, event_id "
            "ROWS UNBOUNDED PRECEDING) AS click_id FROM u) "
            "SELECT user_id, event_id AS purchase_id, ts AS purchase_ts, "
            "click_id, click_ts, "
            "CAST(epoch_us(ts) - epoch_us(click_ts) AS BIGINT) AS wait_us "
            "FROM w WHERE side = 1"
        ),
        "events_running_totals": (
            "SELECT event_id, user_id, ts, "
            "CAST(SUM(CAST(round(value*100, 0) AS BIGINT)) OVER "
            "(PARTITION BY user_id ORDER BY ts, event_id "
            "ROWS UNBOUNDED PRECEDING) AS BIGINT) AS running_cents "
            "FROM events"
        ),
        "events_daily_deltas": _events_mod.daily_deltas_sql(),
        "events_latest_per_user": _events_mod.latest_per_user_sql(),
        "corpus_checksum_docs": _orc.corpus_checksum_sql(),
        "lang_source_rollup_docs": _textstats_mod.lang_source_rollup_sql(),
        "gopher_rules_docs": _textstats_mod.gopher_rules_sql(),
        "length_quantiles_docs": (
            "SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs, "
            "CAST(quantile_disc(n_chars, 0.25) AS BIGINT) AS p25, "
            "CAST(quantile_disc(n_chars, 0.5) AS BIGINT) AS p50, "
            "CAST(quantile_disc(n_chars, 0.75) AS BIGINT) AS p75, "
            "CAST(quantile_disc(n_chars, 0.9) AS BIGINT) AS p90, "
            "CAST(quantile_disc(n_chars, 0.99) AS BIGINT) AS p99 "
            "FROM documents GROUP BY lang"
        ),
        "langid_docs": (
            f"WITH s AS (SELECT doc_id, {_langid_score_sql('en')} AS s_en, "
            f"{_langid_score_sql('de')} AS s_de, {_langid_score_sql('fr')} AS s_fr, "
            f"{_langid_score_sql('es')} AS s_es "
            "FROM (SELECT doc_id, lower(coalesce(text,'')) AS t FROM documents)) "
            f"SELECT doc_id, {_orc.langid_pred_case_sql()} AS lang_pred FROM s"
        ),
        "multimodal_decode_dims": _decode_dims_oracle(),
        "audio_decode_dims": _audio_dims_oracle(),
        "video_decode_dims": _video_dims_oracle(),
        "audio_durations": _audio_durations_oracle(),
        "video_sampled_frames": _video_sampled_frames_oracle(),
        "exact_dedup_docs": (
            "SELECT text, COUNT(*) AS cnt, MIN(doc_id) AS rep_id "
            "FROM documents GROUP BY text"
        ),
        "dup_count_hist_docs": (
            "SELECT cnt, COUNT(*) AS n FROM (SELECT text, COUNT(*) AS cnt "
            "FROM documents GROUP BY text) GROUP BY cnt"
        ),
        "dedup_stats_docs": (
            "SELECT COUNT(*) AS total, "
            "COUNT(CASE WHEN length(coalesce(text,'')) > 0 THEN 1 END) AS usable, "
            "COUNT(DISTINCT text) AS \"unique\" FROM documents"
        ),
        "filter_usable_docs": (
            "SELECT doc_id, n_chars FROM documents "
            "WHERE length(coalesce(text,'')) > 0"
        ),
        "make_string_size_docs": (
            "SELECT doc_id, rpad(substr(coalesce(text,''), 1, 24), 24, 'N') AS fixed "
            "FROM documents"
        ),
        "extract_last_field_docs": (
            "SELECT doc_id, regexp_replace(source, '^.*r', '') AS last_field "
            "FROM documents"
        ),
        "lang_hist_docs": "SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang",
        "substring_dedup_docs": _substring_mod.substring_dedup_sql(),
        "line_dedup_docs": _segdedup.line_dedup_sql(),
        "chunk_dedup_docs": _segdedup.chunk_dedup_sql(),
        "redact_pii_docs": _textstats_mod.redact_pii_sql(),
        "events_props_extract": _events_mod.props_extract_sql(),
        "events_range_join": _events_mod.range_join_sql(),
        "segment_revenue": _relational_mod.segment_revenue_sql(),
        "customers_without_orders":
            _relational_mod.customers_without_orders_sql(),
        "shipping_priority": _relational_mod.shipping_priority_sql(),
        "stratified_sample_docs": _orc.stratified_sample_sql(),
        "weighted_sample_docs": _sampling_mod.weighted_sample_sql(),
        "events_funnel": _events_mod.funnel_counts_sql(),
        "events_spikes": _events_mod.window_spikes_sql(),
        "events_cohort_retention": _events_mod.cohort_retention_sql(),
        "keyword_filter_docs": _textstats_mod.keyword_filter_sql(),
        "corpus_drift_docs": _textstats_mod.corpus_drift_sql(),
        "dup_by_source_docs": _dedup_mod.dup_rate_by_source_sql(),
        "chunk_export_docs": _segdedup.chunk_export_sql(),
        "cms_token_freq_docs": _textstats_mod.cms_token_freq_sql(),
        "mixture_rebalance_docs": _orc.mixture_rebalance_sql(),
        "quantile_filter_docs": _textstats_mod.quantile_filter_sql(),
        "zscore_lengths_docs": _textstats_mod.zscore_lengths_sql(),
        "length_deciles_docs": _textstats_mod.length_deciles_sql(),
        "tfidf_top_terms_docs": _textstats_mod.tfidf_top_terms_sql(),
        "top_bigrams_docs": _textstats_mod.top_bigrams_sql(),
        "normalize_text_docs": _textstats_mod.normalize_text_sql(),
        "inverted_index_docs": _textstats_mod.inverted_index_sql(),
        "incremental_dedup_docs": _dedup_mod.incremental_exact_dedup_sql(),
        "incremental_dedup_bloom": _dedup_mod.incremental_exact_dedup_sql(),
        "incremental_minhash_dedup":
            _dedup_mod.incremental_minhash_dedup_sql(),
        "image_exact_dedup": _images_mod.image_exact_dedup_sql(
            _corpus_for("sf0.01") + "/*.parquet"
        ),
        "curate_images": _images_mod.curate_images_sql(
            _corpus_for("sf0.01") + "/*.parquet"
        ),
        "curate_images_keep_best": _images_mod.curate_images_keep_best_sql(
            _corpus_for("sf0.01") + "/*.parquet"
        ),
        "top_dup_clusters": _images_mod.top_dup_clusters_sql(
            _corpus_for("sf0.01") + "/*.parquet"
        ),
        "caption_payload_corr": _images_mod.caption_payload_corr_sql(
            _corpus_for("sf0.01") + "/*.parquet"
        ),
        "image_format_stats": _images_mod.image_format_stats_sql(
            _corpus_for("sf0.01") + "/*.parquet"
        ),
        "caption_collisions": _images_mod.caption_collisions_sql(
            _corpus_for("sf0.01") + "/*.parquet"
        ),
        "caption_phash_neardup": _images_mod.caption_phash_neardup_sql(
            _corpus_for("sf0.01") + "/*.parquet"
        ),
        "tiered_dedup_report_images":
            _images_mod.tiered_dedup_report_images_sql(
                _corpus_for("sf0.01") + "/*.parquet"
            ),
        "incremental_image_dedup": _images_mod.incremental_image_dedup_sql(
            _corpus_for("sf0.01") + "/*.parquet"
        ),
        "phash_distance_histogram":
            _images_mod.phash_distance_histogram_sql(
                _corpus_for("sf0.01") + "/*.parquet"
            ),
        "dup_rate_by_format": _images_mod.dup_rate_by_format_sql(
            _corpus_for("sf0.01") + "/*.parquet"
        ),
        "image_size_quantiles": _images_mod.image_size_quantiles_sql(
            _corpus_for("sf0.01") + "/*.parquet"
        ),
        "caption_langid_hist": _images_mod.caption_langid_hist_sql(
            _corpus_for("sf0.01") + "/*.parquet"
        ),
        "lang_partitioned_image_dedup":
            _images_mod.lang_partitioned_image_dedup_sql(
                _corpus_for("sf0.01") + "/*.parquet"
            ),
        "decontaminate_images": _images_mod.decontaminate_images_sql(
            _corpus_for("sf0.01") + "/*.parquet"
        ),
        "phash_bit_stats": _images_mod.phash_bit_stats_sql(
            _corpus_for("sf0.01") + "/*.parquet"
        ),
        "cluster_caption_consistency":
            _images_mod.cluster_caption_consistency_sql(
                _corpus_for("sf0.01") + "/*.parquet"
            ),
        "cluster_caption_vote": _images_mod.cluster_caption_vote_sql(
            _corpus_for("sf0.01") + "/*.parquet"
        ),
        "dedup_storage_savings": _images_mod.dedup_storage_savings_sql(
            _corpus_for("sf0.01") + "/*.parquet"
        ),
        "cluster_diameter_hist": _images_mod.cluster_diameter_hist_sql(
            _corpus_for("sf0.01") + "/*.parquet"
        ),
        "caption_cluster_agreement":
            _images_mod.caption_cluster_agreement_sql(
                _corpus_for("sf0.01") + "/*.parquet"
            ),
        "phash_band_entropy": _images_mod.phash_band_entropy_sql(
            _corpus_for("sf0.01") + "/*.parquet"
        ),
        "aspect_ratio_stats": _images_mod.aspect_ratio_stats_sql(
            _corpus_for("sf0.01") + "/*.parquet"
        ),
        "fused_dedup_images": _images_mod.fused_dedup_images_sql(
            _corpus_for("sf0.01") + "/*.parquet"
        ),
        "cluster_merge_profile": _images_mod.cluster_merge_profile_sql(
            _corpus_for("sf0.01") + "/*.parquet"
        ),
        "image_drop_report": _images_mod.image_drop_report_sql(
            _corpus_for("sf0.01") + "/*.parquet"
        ),
        "caption_simhash_neardup": _images_mod.caption_simhash_neardup_sql(
            _corpus_for("sf0.01") + "/*.parquet"
        ),
        "caption_simhash_distance_hist":
            _images_mod.caption_simhash_distance_hist_sql(
                _corpus_for("sf0.01") + "/*.parquet"
            ),
        "phash_knn": _images_mod.phash_knn_sql(
            _corpus_for("sf0.01") + "/*.parquet"
        ),
        "cluster_safe_split": _images_mod.cluster_safe_split_sql(
            _corpus_for("sf0.01") + "/*.parquet"
        ),
        "dedup_sample_weights": _images_mod.dedup_sample_weights_sql(
            _corpus_for("sf0.01") + "/*.parquet"
        ),
        "pack_shards_images": _images_mod.pack_shards_images_sql(
            _corpus_for("sf0.01") + "/*.parquet"
        ),
        "token_count_docs": (
            "SELECT doc_id, "
            "len(regexp_extract_all(lower(coalesce(text,'')), '[0-9a-z]+')) AS n_tokens, "
            "length(coalesce(text,'')) AS n_chars FROM documents"
        ),
        "vocab_docs": (
            "WITH toks AS (SELECT doc_id, unnest(regexp_extract_all("
            "lower(coalesce(text,'')), '[0-9a-z]+')) AS token FROM documents) "
            "SELECT token, CAST(COUNT(*) AS BIGINT) AS n_occurrences, "
            "CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs "
            "FROM toks GROUP BY token"
        ),
        "pack_shards_docs": (
            "WITH t AS (SELECT doc_id, CAST(len(regexp_extract_all("
            "lower(coalesce(text,'')), '[0-9a-z]+')) AS BIGINT) AS n_tokens "
            "FROM documents), "
            "c AS (SELECT doc_id, n_tokens, SUM(n_tokens) OVER "
            "(ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) "
            "AS cum FROM t) "
            "SELECT doc_id, n_tokens, "
            "CAST((cum - n_tokens) // 2048 AS BIGINT) AS shard_id FROM c"
        ),
        "shuffle_rank_docs": _orc.shuffle_rank_sql(),
        "rank_by_length_docs": _shards_mod.rank_by_length_sql(),
        "shard_manifest_docs": (
            "WITH t AS (SELECT doc_id, CAST(len(regexp_extract_all("
            "lower(coalesce(text,'')), '[0-9a-z]+')) AS BIGINT) AS n_tokens "
            "FROM documents), "
            "c AS (SELECT doc_id, n_tokens, SUM(n_tokens) OVER "
            "(ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) "
            "AS cum FROM t), "
            "p AS (SELECT n_tokens, CAST((cum - n_tokens) // 2048 AS BIGINT) "
            "AS shard_id FROM c) "
            "SELECT shard_id, CAST(COUNT(*) AS BIGINT) AS n_docs, "
            "CAST(SUM(n_tokens) AS BIGINT) AS n_tokens "
            "FROM p GROUP BY shard_id"
        ),
        "quality_docs": (
            "SELECT doc_id, length(coalesce(text,'')) AS n_chars, "
            "len(regexp_extract_all(lower(coalesce(text,'')), '[0-9a-z]+')) AS n_tokens, "
            "round(CASE WHEN len(regexp_extract_all(lower(coalesce(text,'')), '[0-9a-z]+')) > 0 "
            " THEN CAST(length(regexp_replace(lower(coalesce(text,'')), '[^0-9a-z]', '', 'g')) AS DOUBLE) "
            "      / len(regexp_extract_all(lower(coalesce(text,'')), '[0-9a-z]+')) ELSE 0 END, 6) AS mean_token_len, "
            "round(CASE WHEN length(coalesce(text,'')) > 0 "
            " THEN CAST(length(regexp_replace(lower(coalesce(text,'')), '[^a-z]', '', 'g')) AS DOUBLE) "
            "      / length(coalesce(text,'')) ELSE 0 END, 6) AS alpha_ratio "
            "FROM documents"
        ),
        "embedding_norms": (
            "SELECT vec_id, round(sqrt(list_sum(list_transform(embedding, "
            "x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 6) AS norm FROM embeddings"
        ),
    }
