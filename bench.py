#!/usr/bin/env python
"""Benchmark harness.

Plain run: one JSON line —
  {"metric": "...", "value": <headline sec>, "unit": "sec",
   "queries": {...}, "sf": ..., "num_cpus": N, ...}

Headline = the flagship near-duplicate pipeline (read -> signatures ->
exact dedup -> LSH+verify -> clustering -> outputs) over the
deterministic synthetic image+caption corpus sized to $GRAFT_SF_DIR's
scale factor; plus per-query timings for the document/embedding
operator suite over the testdata tables.

--scaling: run the headline pipeline in FRESH processes at
num_cpus=8 and num_cpus=32 on the same (pre-generated, page-warm)
input and report both throughputs + scaling efficiency
(eff = (t_lo / t_hi) / (cpus_hi / cpus_lo); 1.0 = linear).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
CORPUS_BASE = "/tmp/humid_corpus"


def corpus_rows(sf_dir: str) -> int:
    import re

    override = os.environ.get("GRAFT_CORPUS_ROWS")
    if override:
        return int(override)
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else 0.01
    return max(500, min(int(2_000_000 * sf), 200_000))


def run_bench() -> dict:
    import ray

    ray.init(
        address="local",
        num_cpus=NUM_CPUS,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
        # keep stdout pure JSON: raylet/worker warnings otherwise leak
        # into the driver's captured output ahead of the result line
        log_to_driver=False,
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    from humid_ray.config import HumidConfig
    from humid_ray.pipelines import ann, dedup_text, multimodal, substring, textstats
    from humid_ray.pipelines.humid import HumidPipeline
    from humid_ray.synth import make_corpus_parallel

    n_rows = corpus_rows(SF_DIR)
    # 256x256 images: realistic per-image decode cost (the 32x32 test
    # corpus makes decode trivially cheap and the bench all overhead)
    corpus = make_corpus_parallel(CORPUS_BASE, n_rows, img_hw=256,
                                  cycles_per_part=10)

    # warm the page cache so we measure compute + shuffle, not cold disk
    import pyarrow.parquet as pq
    from humid_ray.synth import corpus_files

    for f in corpus_files(corpus):
        pq.read_table(f)

    if os.environ.get("GRAFT_BENCH_GEN_ONLY"):
        ray.shutdown()
        return {"generated": corpus, "rows": n_rows}

    # warm the Ray worker pool before anything is timed: a fresh
    # process's first Dataset execution pays worker spawn + module
    # imports (~2-3 s) that a long-lived cluster — the thing the bench
    # models — never pays per job. One spread-out map plus one parquet
    # read touches every worker and the datasource path.
    ray.data.range(
        10_000, override_num_blocks=NUM_CPUS * 2
    ).map_batches(lambda b: b, batch_format="pyarrow").count()
    ray.data.read_parquet(corpus_files(corpus)[0]).count()

    queries: dict[str, float] = {}
    all_trials: dict[str, list[float]] = {}

    # the expensive / historically noisy queries get best-of-N with
    # every trial recorded, so a cross-round swing (e.g. r2's
    # multimodal_decode_stats 37 -> 49.5 s) is attributable to noise
    # vs a real regression instead of being a single sample
    TRIAL_QUERIES = {
        "multimodal_decode_stats", "substring_dedup_docs",
        "audio_features", "ngram_jaccard_docs", "minhash_neardup_docs",
        "knn_bruteforce", "embedding_neardup",
        # the payload-scan image family — the most expensive suite
        # queries as of round 3 — gets trials too, so cross-round
        # swings are attributable to noise vs regression
        "incremental_image_dedup", "dedup_storage_savings",
        "fused_dedup_images", "image_drop_report",
        # the only two r2->r3 regressions (ann_ivf +38%,
        # events_sessions +71%) had no recorded trials, so noise vs
        # real couldn't be told apart — record them from round 4 on
        "ann_ivf", "events_sessions",
        # most expensive suite query in r3 (38.9 s), rebuilt in r4
        # (byte-equal members skip decode; distributed join fallback)
        "cluster_psnr_report",
        # the ten untrialed r3->r4 single-sample regressions
        # (+33..+68%): recorded from round 5 on so each delta is
        # either reproduced or shown to be spread (twice before,
        # "noise" deltas of this size were 4x / 43x real bugs)
        "dup_by_source_docs", "phash_knn", "cluster_safe_split",
        "chunk_export_docs", "events_spikes", "phash_band_entropy",
        "curate_images", "dup_rate_by_format", "image_exact_dedup",
        "top_parts_by_revenue",
    }

    def timed(name, fn, consume="count"):
        reps = n_trials if name in TRIAL_QUERIES else 1
        times, res = [], None
        for _ in range(reps):
            t0 = time.perf_counter()
            res = fn()
            if consume == "count" and hasattr(res, "count"):
                res.count()
            times.append(round(time.perf_counter() - t0, 3))
        queries[name] = min(times)
        if reps > 1:
            all_trials[name] = times
        return res

    # single-node wall times vary ±20-30% with page-cache / writeback
    # state: run each headline config best-of-N (fresh workdir per
    # trial) and report every trial so regressions are distinguishable
    # from cache noise
    n_trials = 1 if os.environ.get("GRAFT_BENCH_HEADLINE_ONLY") else int(
        os.environ.get("GRAFT_BENCH_TRIALS", "3")
    )

    def pipeline_trials(tag: str, **cfg_over):
        times = []
        result = None
        for trial in range(n_trials):
            wd = f"/tmp/humid_bench/wd_{tag}_{NUM_CPUS}_{trial}"
            shutil.rmtree(wd, ignore_errors=True)
            cfg = HumidConfig(workdir=wd, resume=False, **cfg_over)
            t0 = time.perf_counter()
            result = HumidPipeline(cfg).run(corpus)
            times.append(round(time.perf_counter() - t0, 3))
            shutil.rmtree(wd, ignore_errors=True)
        return min(times), times, result

    # headline: full pipeline in RECOMPUTE mode — decode every image,
    # recompute pHash from pixels (the honest image-dedup workload:
    # stateful decode actors dominate, as they would at 100 TB)
    # sig_batch_size 1024 (was 256): with the PayloadMemo decode cache
    # a bigger batch raises the in-batch dup hit rate and cuts
    # per-batch dispatch — measured ~1.5 s off the sf0.1 headline
    # checkpoint_phases="async": phases stream through the object
    # store while their parquet checkpoints write in the background —
    # streaming speed (measured: checkpoint_wait 0.0, fully
    # overlapped) AND the per-partition resumability the north rule
    # requires, in the same timed run
    headline, rec_trials, result = pipeline_trials(
        "rec", write_filtered=True, write_annotated=False, write_stats=True,
        signature_source="recompute", sig_batch_size=1024,
        filtered_output="manifest", checkpoint_phases="async",
    )
    queries["humid_pipeline_recompute"] = headline

    if os.environ.get("GRAFT_BENCH_HEADLINE_ONLY"):
        out = {
            "metric": "humid dedup pipeline wall time (synthetic image+caption corpus)",
            "value": headline, "unit": "sec", "queries": queries,
            "sf": SF_DIR, "num_cpus": NUM_CPUS, "corpus_rows": n_rows,
            "images_per_sec": round(n_rows / headline, 1),
        }
        ray.shutdown()
        return out

    # stored-phash fast path: trusts the phash column; the pruned scan
    # never reads the payload bytes (validate_payload off by default)
    stored_best, stored_trials, _ = pipeline_trials(
        "stored", write_filtered=False, write_annotated=False, write_stats=True,
        checkpoint_phases="async",
    )
    queries["humid_pipeline_stored"] = stored_best

    # operator suite over the provided testdata tables
    timed("exact_dedup_docs", lambda: dedup_text.exact_dedup(SF_DIR))
    timed("minhash_neardup_docs", lambda: dedup_text.minhash_neardup_pairs(SF_DIR))
    timed("simhash_docs", lambda: dedup_text.simhash_docs(SF_DIR))
    timed("token_count_docs", lambda: textstats.token_counts(SF_DIR))
    timed("quality_docs", lambda: textstats.quality_scores(SF_DIR))
    from humid_ray.pipelines import events

    timed("events_windowed", lambda: events.windowed_counts(SF_DIR))
    timed("events_sessions", lambda: events.sessionize(SF_DIR))
    timed("events_distinct_users", lambda: events.distinct_users(SF_DIR))
    timed("events_asof_join", lambda: events.asof_join(SF_DIR))
    timed("events_running_totals", lambda: events.running_totals(SF_DIR))
    timed("events_latest_per_user", lambda: events.latest_per_user(SF_DIR))
    timed("corpus_checksum_docs",
          lambda: textstats.corpus_checksum(SF_DIR), consume=None)
    timed("length_quantiles_docs", lambda: textstats.length_quantiles(SF_DIR))
    timed("minhash_cluster_docs", lambda: dedup_text.minhash_clusters(SF_DIR))
    timed("cluster_safe_split_docs",
          lambda: dedup_text.cluster_safe_split_docs(SF_DIR))
    timed("dedup_sample_weights_docs",
          lambda: dedup_text.dedup_sample_weights_docs(SF_DIR))
    timed("curate_docs", lambda: dedup_text.curate_docs(SF_DIR))
    timed("decontaminate_docs", lambda: dedup_text.decontaminate(SF_DIR))
    timed("repetition_stats_docs", lambda: textstats.repetition_stats(SF_DIR))
    timed("ngram_jaccard_docs", lambda: dedup_text.ngram_jaccard_exact(SF_DIR))
    timed("substring_dedup_docs", lambda: substring.substring_dedup_pairs(SF_DIR))
    timed("langid_docs", lambda: textstats.langid(SF_DIR))
    timed("knn_bruteforce", lambda: ann.knn_bruteforce(SF_DIR), consume=None)
    timed("ann_ivf", lambda: ann.ann_ivf(SF_DIR), consume=None)
    timed("embedding_neardup", lambda: ann.embedding_neardup(SF_DIR))
    timed("multimodal_decode_stats", lambda: multimodal.decode_stats(corpus))
    from humid_ray.synth import make_audio_corpus, make_video_corpus

    audio_corpus = make_audio_corpus(CORPUS_BASE, max(200, n_rows // 10))
    video_corpus = make_video_corpus(CORPUS_BASE, max(100, n_rows // 20))
    timed("audio_features", lambda: multimodal.audio_feature_stats(audio_corpus))
    timed("video_frame_samples", lambda: multimodal.video_frame_samples(video_corpus))
    from humid_ray.pipelines import relational

    timed("lineitem_pricing_summary", lambda: relational.pricing_summary(SF_DIR))
    timed("orders_by_nation", lambda: relational.orders_by_nation(SF_DIR))
    timed("top_parts_by_revenue",
          lambda: relational.top_parts_by_revenue(SF_DIR), consume=None)
    timed("priority_revenue", lambda: relational.priority_revenue(SF_DIR))
    from humid_ray.pipelines import shards

    timed("vocab_docs", lambda: textstats.vocab(SF_DIR))
    timed("pack_shards_docs", lambda: shards.pack_shards(SF_DIR))
    timed("shuffle_rank_docs", lambda: shards.global_shuffle(SF_DIR))
    from humid_ray.pipelines import images, sampling, segdedup

    timed("segment_revenue", lambda: relational.segment_revenue(SF_DIR))
    timed("customers_without_orders",
          lambda: relational.customers_without_orders(SF_DIR))
    timed("shipping_priority",
          lambda: relational.shipping_priority(SF_DIR), consume=None)
    timed("line_dedup_docs", lambda: segdedup.line_dedup(SF_DIR))
    timed("incremental_dedup_docs",
          lambda: dedup_text.incremental_exact_dedup(SF_DIR))
    timed("quantile_filter_docs", lambda: textstats.quantile_filter(SF_DIR))
    timed("mixture_rebalance_docs", lambda: sampling.mixture_rebalance(SF_DIR))
    # the 70+ queries above streamed the testdata tables + A/V corpora
    # through memory and evicted the image corpus pages; re-warm so the
    # payload-scan operators below measure compute, not cold disk (the
    # same policy as the warm-up at bench start — measured 46 s cold vs
    # 7 s warm for image_exact_dedup at sf0.1)
    for f in corpus_files(corpus):
        pq.read_table(f)
    timed("image_exact_dedup", lambda: images.image_exact_dedup(corpus))
    timed("pixel_exact_dedup", lambda: images.pixel_exact_dedup(corpus))
    timed("curate_images", lambda: images.curate_images(corpus))
    timed("image_format_stats", lambda: images.image_format_stats(corpus))
    timed("caption_collisions", lambda: images.caption_collisions(corpus))
    timed("caption_phash_neardup",
          lambda: images.caption_phash_neardup(corpus))
    timed("tiered_dedup_report_images",
          lambda: images.tiered_dedup_report_images(corpus))
    timed("incremental_image_dedup",
          lambda: images.incremental_image_dedup(corpus))
    timed("phash_distance_histogram",
          lambda: images.phash_distance_histogram(corpus), consume=None)
    timed("dup_rate_by_format", lambda: images.dup_rate_by_format(corpus))
    timed("image_size_quantiles",
          lambda: images.image_size_quantiles(corpus))
    timed("caption_langid_hist",
          lambda: images.caption_langid_hist(corpus))
    timed("lang_partitioned_image_dedup",
          lambda: images.lang_partitioned_image_dedup(corpus))
    timed("cluster_psnr_report",
          lambda: images.cluster_psnr_report(corpus))
    timed("decontaminate_images",
          lambda: images.decontaminate_images(corpus))
    timed("phash_bit_stats",
          lambda: images.phash_bit_stats(corpus), consume=None)
    timed("cluster_caption_consistency",
          lambda: images.cluster_caption_consistency(corpus))
    timed("cluster_caption_vote",
          lambda: images.cluster_caption_vote(corpus))
    timed("dedup_storage_savings",
          lambda: images.dedup_storage_savings(corpus))
    timed("cluster_diameter_hist",
          lambda: images.cluster_diameter_hist(corpus), consume=None)
    timed("caption_cluster_agreement",
          lambda: images.caption_cluster_agreement(corpus), consume=None)
    timed("phash_band_entropy",
          lambda: images.phash_band_entropy(corpus), consume=None)
    timed("aspect_ratio_stats",
          lambda: images.aspect_ratio_stats(corpus))
    timed("fused_dedup_images",
          lambda: images.fused_dedup_images(corpus))
    timed("cluster_merge_profile",
          lambda: images.cluster_merge_profile(corpus))
    timed("image_drop_report",
          lambda: images.image_drop_report(corpus))
    timed("caption_simhash_neardup",
          lambda: images.caption_simhash_neardup(corpus))
    timed("caption_simhash_distance_hist",
          lambda: images.caption_simhash_distance_hist(corpus))
    timed("phash_knn", lambda: images.phash_knn(corpus), consume=None)
    timed("cluster_safe_split", lambda: images.cluster_safe_split(corpus))
    timed("dedup_sample_weights",
          lambda: images.dedup_sample_weights(corpus))
    timed("pack_shards_images", lambda: images.pack_shards_images(corpus))
    timed("tfidf_top_terms_docs", lambda: textstats.tfidf_top_terms(SF_DIR))
    timed("events_range_join", lambda: events.range_join(SF_DIR))
    timed("semantic_dedup", lambda: ann.semantic_dedup(SF_DIR))
    timed("decontaminate_embeddings",
          lambda: ann.decontaminate_embeddings(SF_DIR))
    timed("top_bigrams_docs", lambda: textstats.top_bigrams(SF_DIR),
          consume=None)
    timed("normalize_text_docs", lambda: textstats.normalize_text(SF_DIR))
    timed("gopher_rules_docs", lambda: textstats.gopher_rules(SF_DIR))
    timed("incremental_dedup_bloom",
          lambda: dedup_text.incremental_dedup_bloom(SF_DIR))
    timed("fused_dedup_docs", lambda: dedup_text.fused_dedup_docs(SF_DIR))
    timed("incremental_minhash_dedup",
          lambda: dedup_text.incremental_minhash_dedup(SF_DIR))
    timed("ann_ivfpq", lambda: ann.ann_ivfpq(SF_DIR), consume=None)
    timed("events_funnel", lambda: events.funnel_counts(SF_DIR))
    timed("weighted_sample_docs", lambda: sampling.weighted_sample(SF_DIR))
    timed("cms_token_freq_docs",
          lambda: textstats.cms_token_freq(SF_DIR), consume=None)
    timed("events_spikes", lambda: events.window_spikes(SF_DIR))
    timed("events_daily_deltas", lambda: events.daily_deltas(SF_DIR))
    timed("dup_by_source_docs", lambda: dedup_text.dup_rate_by_source(SF_DIR))
    timed("chunk_export_docs", lambda: segdedup.chunk_export(SF_DIR))
    timed("rank_by_length_docs", lambda: shards.rank_by_length(SF_DIR))

    out = {
        "metric": "humid dedup pipeline wall time (synthetic image+caption corpus)",
        "value": round(headline, 3),
        "unit": "sec",
        "queries": queries,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "corpus_rows": n_rows,
        "images_per_sec": round(n_rows / headline, 1),
        "trials": {
            "humid_pipeline_recompute": rec_trials,
            "humid_pipeline_stored": stored_trials,
            **all_trials,
        },
        "trial_spread_pct": {
            name: round(100 * (max(ts) - min(ts)) / min(ts), 1)
            for name, ts in {
                "humid_pipeline_recompute": rec_trials,
                "humid_pipeline_stored": stored_trials,
                **all_trials,
            }.items()
        },
        "pipeline_metrics": {
            k: v for k, v in result.metrics.items()
            if k in ("rows_scanned", "unique_sigs", "candidate_pairs",
                     "verified_dup_pairs", "clusters", "timings_sec")
        },
    }
    ray.shutdown()
    return out


def run_scaling():
    """Same job, same input, fresh processes at N and 4N CPUs.

    The scaling input is a LARGER corpus than the per-query bench
    (default 1M rows, override $GRAFT_SCALING_ROWS): the criterion
    models a multi-node 100 TB run, where per-row work dominates and
    single-node fixed costs (phase exchanges, actor-pool spin-up,
    checkpoint round-trips — ~12 s here regardless of input size)
    amortize away. Measuring it on a 20-second job would mostly
    measure those fixed costs. Two trials per level, best taken —
    wall-time variance shrinks with run length, and the minimum is the
    cleanest estimate of each level's capability. The corpus
    pre-generates once at FULL parallelism before any timed child.
    """
    lo, hi = 4, 16
    rows = os.environ.get("GRAFT_SCALING_ROWS", "1000000")
    # pre-generate + page-warm at full parallelism (cached afterwards;
    # the 4-CPU child must not pay corpus generation)
    subprocess.run(
        [sys.executable, os.path.abspath(__file__)],
        env=dict(os.environ, GRAFT_BENCH_GEN_ONLY="1",
                 GRAFT_CORPUS_ROWS=rows),
        capture_output=True, text=True, check=True,
        cwd=os.path.dirname(os.path.abspath(__file__)),
    )
    results: dict[int, dict] = {}
    for ncpu in (lo, hi):
        best = None
        for _ in range(2):
            env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu),
                       GRAFT_BENCH_HEADLINE_ONLY="1",
                       GRAFT_CORPUS_ROWS=rows)
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                env=env, capture_output=True, text=True, check=True,
                cwd=os.path.dirname(os.path.abspath(__file__)),
            ).stdout
            r = json.loads(out.strip().splitlines()[-1])
            if best is None or r["value"] < best["value"]:
                best = r
        results[ncpu] = best
    t_lo, t_hi = results[lo]["value"], results[hi]["value"]
    eff = (t_lo / t_hi) / (hi / lo)
    print(
        json.dumps(
            {
                "sec_lo": t_lo,
                "sec_hi": t_hi,
                "cpus_lo": lo,
                "cpus_hi": hi,
                "images_per_sec_lo": results[lo]["images_per_sec"],
                "images_per_sec_hi": results[hi]["images_per_sec"],
                "scaling_efficiency": round(eff, 3),
            }
        )
    )


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        run_scaling()
    else:
        print(json.dumps(run_bench()))
