"""The flagship near-duplicate detection + clustering pipeline.

Ray-Data restatement of HUMID's lifecycle (reference
src/humid.cc:369-409; SURVEY §3):

  1. signatures   read corpus -> actor-pool map_batches -> (id, sig, filtered)
  2. uniq         groupby(sig) -> (sig, count, first_id)        [trie leaves]
  3. edges        LSH bands -> salted groupby -> verify          [neighbors]
  4. assign       connected components -> per-component replay   [clusters]
  5. outputs      second pass: filtered / annotated / stats      [writers]

Each phase checkpoints to ``cfg.workdir`` with a lineage manifest;
``resume=True`` skips finished phases.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa

import ray
import ray.data

from humid_ray.config import HumidConfig
from humid_ray.stages.clustering import ASSIGN_SCHEMA, assign_clusters, dense_cluster_ids
from humid_ray.stages.components import connected_components
from humid_ray.stages.exact import unique_signatures
from humid_ray.stages.lsh import band_bucket_counts, find_edges
from humid_ray.stages.outputs import (
    AnnotatedWriter,
    FilteredWriter,
    assignment_lookup_ref,
    compute_stats,
    write_stats_files,
)
from humid_ray.stages.signatures import (
    extract_signatures,
    probe_umi_bits,
    resolve_custom_sources,
)
from humid_ray.state import checkpoints as cp

SIG_SCHEMA = pa.schema(
    [("image_id", pa.string()), ("sig", pa.int64()), ("filtered", pa.bool_())]
)
UNIQ_SCHEMA = pa.schema(
    [("sig", pa.int64()), ("count", pa.int64()), ("first_id", pa.string())]
)
EDGE_SCHEMA = pa.schema([("sig_a", pa.int64()), ("sig_b", pa.int64())])


@dataclass
class PipelineResult:
    workdir: str
    metrics: dict = field(default_factory=dict)
    stats: dict | None = None
    # streaming runs (checkpoint_phases=False) keep phases 1-4 here as
    # materialized Datasets instead of parquet checkpoints
    datasets: dict = field(default_factory=dict)

    def dataset(self, phase: str) -> "ray.data.Dataset":
        if phase in self.datasets:
            return self.datasets[phase]
        return ray.data.read_parquet(os.path.join(self.workdir, phase))


def corpus_identity(corpus) -> str:
    """Short digest of the INPUT corpus identity, folded into the phase
    fingerprint: resume=True against the same workdir but a different
    corpus must invalidate every checkpoint (same-config/stale-data
    reuse would silently produce results for the wrong data).

    Path inputs hash the file inventory (name, size, mtime); Dataset
    inputs hash input_files() when available, else schema + row count
    (both metadata-only for parquet sources)."""
    import hashlib

    h = hashlib.sha256()
    if isinstance(corpus, str):
        if os.path.isdir(corpus):
            for root, _, files in sorted(os.walk(corpus)):
                for f in sorted(files):
                    p = os.path.join(root, f)
                    st = os.stat(p)
                    h.update(f"{os.path.relpath(p, corpus)}:{st.st_size}:{st.st_mtime_ns}\n".encode())
        elif os.path.exists(corpus):
            st = os.stat(corpus)
            h.update(f"{corpus}:{st.st_size}:{st.st_mtime_ns}\n".encode())
        else:
            h.update(corpus.encode())
    else:
        files = []
        try:
            files = corpus.input_files()
        except Exception:  # noqa: BLE001 - non-file-backed Dataset
            pass
        if files:
            for p in sorted(files):
                try:
                    st = os.stat(p)
                    h.update(f"{p}:{st.st_size}:{st.st_mtime_ns}\n".encode())
                except OSError:
                    h.update(p.encode())
        else:
            h.update(str(corpus.schema()).encode())
            h.update(str(corpus.count()).encode())
    return h.hexdigest()[:12]


def read_corpus(path: str) -> "ray.data.Dataset":
    """Corpus reader — Lance when available, else parquet (dev fallback
    documented in FIXTURES.md). ``path`` may be a dir or file list."""
    try:  # pragma: no cover - lance not installed in this sandbox
        import lance  # noqa: F401

        if os.path.isdir(path) and path.endswith(".lance"):
            return ray.data.read_lance(path)
    except ImportError:
        pass
    return ray.data.read_parquet(path, file_extensions=["parquet"])


class HumidPipeline:
    def __init__(self, cfg: HumidConfig | None = None):
        self.cfg = cfg or HumidConfig()

    def run(self, corpus, workdir: str | None = None) -> PipelineResult:
        """corpus: path or Dataset. Returns PipelineResult with lineage
        metrics; outputs under ``workdir`` (default cfg.workdir)."""
        cfg = self.cfg
        wd = workdir or cfg.workdir
        os.makedirs(wd, exist_ok=True)
        if cfg.target_max_block_size:
            from ray.data import DataContext

            DataContext.get_current().target_max_block_size = cfg.target_max_block_size
        rows = read_corpus(corpus) if isinstance(corpus, str) else corpus
        # fingerprint = semantic config + corpus identity: a checkpoint
        # is only reusable for the SAME input data
        fp = f"{cfg.fingerprint()}-{corpus_identity(corpus)}"
        timings: dict[str, float] = {}
        metrics: dict = {"config_fingerprint": fp}

        # phase persistence: synchronous parquet checkpoints
        # (checkpoint_phases=True — write-then-reread), object-store
        # materialization only (False — fastest, not resumable), or
        # "async" — downstream phases consume the materialized blocks
        # immediately while the parquet checkpoint writes in a
        # background thread; the run waits for every write before
        # returning, so durability matches the synchronous mode. All
        # modes share the manifest shape (rows / bytes / metrics).
        stream = cfg.checkpoint_phases is not True
        ck_async = cfg.checkpoint_phases == "async"
        mem: dict[str, "ray.data.Dataset"] = {}
        import concurrent.futures

        ck_pool = (concurrent.futures.ThreadPoolExecutor(
            max_workers=2, thread_name_prefix="ck")
            if ck_async else None)
        ck_futures: list = []

        def persist(name, path, compute, resume=None, phase_metrics=None,
                    schema_hint=None):
            if not stream:
                return cp.run_phase(
                    name, path, fp, compute,
                    cfg.resume if resume is None else resume,
                    metrics=phase_metrics, schema_hint=schema_hint,
                )
            if (ck_async
                    and (cfg.resume if resume is None else resume)
                    and cp.phase_is_done(path, fp)):
                return cp.read_phase(path), cp.load_manifest(path), False
            # every phase-1..4 output is signature-shaped (narrow,
            # payloads never enter a phase checkpoint), but inherits
            # ONE BLOCK PER UPSTREAM TASK (a 1M-row corpus leaves
            # ~500 blocks of ~50 KB each) and every downstream shuffle
            # then pays per-block overhead instead of moving data —
            # coalesce INSIDE the same execution (measured: uniq over
            # 1M sigs 11.8s -> 2.8s; chaining the repartition avoids a
            # second materialize pass)
            ncpus = int(ray.cluster_resources().get("CPU", 4))
            ds = compute().repartition(max(16, ncpus)).materialize()
            n = ds.count()
            if n == 0 and schema_hint is not None:
                # mirror write_phase's empty-output handling: keep the
                # schema readable for downstream kernels
                ds = ray.data.from_arrow(schema_hint.empty_table())
            mem[os.path.basename(path)] = ds
            mf = {"rows": n, "bytes": int(ds.size_bytes() or 0),
                  "metrics": phase_metrics or {}}
            if ck_async:
                # write the checkpoint from the ALREADY-materialized
                # blocks (no recompute) while the caller moves on
                ck_futures.append(ck_pool.submit(
                    cp.write_phase, ds, path, fp,
                    phase_metrics, schema_hint))
            return ds, mf, True

        # phase 0: probe UMI budget (reference peekUMI src/humid.cc:24-33).
        # The probe is its own tiny Dataset execution (~1 s of fixed
        # cost) — only pay it when UMI parsing is on; probe_umi_bits
        # returns 0 unconditionally otherwise.
        umi_bits = 0
        if cfg.umi_from_id:
            first = rows.limit(1).take(1)
            umi_bits = probe_umi_bits(
                first[0]["image_id"] if first else None, cfg)
        metrics["umi_bits"] = umi_bits

        # phase 1: signatures
        t0 = time.perf_counter()
        sig_path = os.path.join(wd, "01_signatures")
        sig_ds, sig_mf, fresh = persist(
            "signatures", sig_path,
            lambda: extract_signatures(rows, cfg, umi_bits),
            schema_hint=SIG_SCHEMA,
        )
        total_rows = sig_mf["rows"]
        timings["signatures"] = time.perf_counter() - t0
        metrics["rows_scanned"] = total_rows

        def usable_only(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            return t.filter(pc.invert(t.column("filtered")))

        # phase 2: uniq (exact dedup)
        t0 = time.perf_counter()
        uniq_path = os.path.join(wd, "02_uniq")
        uniq_ds, uniq_mf, _ = persist(
            "uniq", uniq_path,
            lambda: unique_signatures(
                sig_ds.map_batches(usable_only, batch_format="pyarrow", zero_copy_batch=True)
            ),
            schema_hint=UNIQ_SCHEMA,
        )
        timings["uniq"] = time.perf_counter() - t0
        metrics["unique_sigs"] = uniq_mf["rows"]

        # phase 3: neighbor edges (LSH + verify)
        t0 = time.perf_counter()
        edges_path = os.path.join(wd, "03_edges")
        if ((not stream or ck_async) and cfg.resume
                and cp.phase_is_done(edges_path, fp)):
            edges_ds, edges_mf = cp.read_phase(edges_path), cp.load_manifest(edges_path)
        elif cfg.distance == "minhash-jaccard":
            from humid_ray.stages.lsh import find_edges_minhash

            usable_sigs = sig_ds.map_batches(
                usable_only, batch_format="pyarrow", zero_copy_batch=True
            )
            edges_ds, edges_mf, _ = persist(
                "edges", edges_path,
                lambda: find_edges_minhash(usable_sigs, uniq_ds, cfg,
                                           broadcast_max_rows=cfg.broadcast_max_rows),
                resume=False,
                phase_metrics={"candidate_pairs": None, "hot_buckets": 0},
                schema_hint=EDGE_SCHEMA,
            )
        else:
            bc = band_bucket_counts(uniq_ds, cfg)

            def bucket_fold(t: pa.Table) -> pa.Table:
                """Per-batch partial: ONE summary row (candidate-pair
                and hot-bucket partial sums) plus the hot bucket keys
                themselves, so metrics AND salting keys come out of a
                single execution of the bucket groupby (the old
                two-pass version recomputed the groupby to re-find the
                hot rows)."""
                import numpy as np

                n = t.column("n").to_numpy(zero_copy_only=False)
                # halve before multiplying: n*(n-1) wraps int64 at
                # n~3.04e9 while C(n,2) itself is still representable
                cand = (n // 2) * (n - 1) + (n % 2) * (n // 2)
                hot = np.flatnonzero(n > cfg.hot_band_threshold)
                nh = len(hot)
                return pa.table({
                    "kind": pa.array([0] + [1] * nh, type=pa.int8()),
                    "cand": pa.array([int(cand.sum())] + [0] * nh,
                                     type=pa.int64()),
                    "hot": pa.array([nh] + [0] * nh, type=pa.int64()),
                    "band_id": pa.array(
                        np.r_[0, t.column("band_id")
                              .to_numpy(zero_copy_only=False)[hot]],
                        type=pa.int64()),
                    "band_key": pa.array(
                        np.r_[0, t.column("band_key")
                              .to_numpy(zero_copy_only=False)[hot]],
                        type=pa.int64()),
                })

            folded = bc.map_batches(bucket_fold,
                                    batch_format="pyarrow").take_all()
            candidate_pairs = sum(r["cand"] for r in folded
                                  if r["kind"] == 0)
            n_hot = sum(r["hot"] for r in folded if r["kind"] == 0)
            hot_keys = {(int(r["band_id"]), int(r["band_key"]))
                        for r in folded if r["kind"] == 1}
            edges_ds, edges_mf, _ = persist(
                "edges", edges_path,
                lambda: find_edges(uniq_ds, cfg, hot_keys or None),
                resume=False,
                phase_metrics={"candidate_pairs": candidate_pairs, "hot_buckets": n_hot},
                schema_hint=EDGE_SCHEMA,
            )
        timings["edges"] = time.perf_counter() - t0
        metrics["candidate_pairs"] = edges_mf["metrics"].get("candidate_pairs")
        metrics["hot_buckets"] = edges_mf["metrics"].get("hot_buckets")
        metrics["verified_dup_pairs"] = edges_mf["rows"]

        # phase 4: clustering. Small-graph coordinator: when the edge
        # list fits the driver (same regime as local union-find), pull
        # it ONCE and share the arrays between CC, the replay fast path
        # and the degree statistics — three dataset executions become one.
        t0 = time.perf_counter()
        assign_path = os.path.join(wd, "04_assign")
        edge_arrays = None
        deg_hist = None
        small_graph = (
            cfg.cc_strategy != "distributed"
            and edges_mf["rows"] <= cfg.cc_local_max_edges
        )
        if small_graph:
            from humid_ray.stages.components import (
                components_from_arrays,
                pull_edge_arrays,
            )
            from humid_ray.stages.outputs import degree_hist_from_arrays

            edge_arrays = pull_edge_arrays(edges_ds)
            deg_hist = degree_hist_from_arrays(*edge_arrays)
            comp_sigs, comp_labels = components_from_arrays(*edge_arrays)
            comp_ds = ray.data.from_arrow(
                pa.table(
                    {
                        "sig": pa.array(comp_sigs, type=pa.int64()),
                        "comp": pa.array(comp_labels, type=pa.int64()),
                    }
                )
            )
        else:
            comp_ds = connected_components(edges_ds, cfg)
        assign_ds, assign_mf, _ = persist(
            "assign", assign_path,
            lambda: assign_clusters(uniq_ds, edges_ds, comp_ds, cfg,
                                    edge_arrays=edge_arrays),
            schema_hint=ASSIGN_SCHEMA,
        )
        timings["assign"] = time.perf_counter() - t0

        # phase 5: outputs
        t0 = time.perf_counter()
        join_strategy = cfg.join_strategy
        if join_strategy == "auto":
            # rows AND bytes must fit: the manifest records the phase's
            # uncompressed size, so a wide-id corpus can't push a
            # multi-GB lookup through ray.put under a row-only cap
            join_strategy = (
                "broadcast"
                if (assign_mf["rows"] <= cfg.broadcast_max_rows
                    and cp.manifest_bytes(assign_mf, assign_path)
                    <= cfg.broadcast_max_bytes)
                else "hash"
            )
        metrics["output_join_strategy"] = join_strategy
        dense_map = None
        dense_ref = None
        if cfg.dense_ids:
            from humid_ray.stages.clustering import dense_cluster_ids

            dense_map = dense_cluster_ids(assign_ds)
            dense_ref = ray.put(dense_map)
        assign_ref = assignment_lookup_ref(assign_ds) if join_strategy == "broadcast" else None
        sig_map_ref = None
        # the sig-map broadcast only feeds the payload-carrying output
        # writers (FilteredWriter / AnnotatedWriter re-use phase-1
        # signatures instead of re-decoding); manifest-only runs never
        # consult it — skip the driver-side checkpoint pull entirely
        need_sig_map = (
            (cfg.write_filtered and cfg.filtered_output == "payload")
            or cfg.write_annotated
        )
        if (join_strategy == "broadcast" and need_sig_map
                and total_rows <= cfg.broadcast_max_rows
                and cp.manifest_bytes(sig_mf, sig_path)
                <= cfg.broadcast_max_bytes):
            # phase-1 checkpoint reuse as a sorted-array lookup keyed on
            # hashed image_id — fully vectorized build and probe (no
            # per-row dict loop). A 64-bit key collision (odds ~1e-6 at
            # the 5M-row broadcast cap) falls back to recompute.
            from humid_ray.stages.joins import SigLookup, hash_string_column

            chunks = []
            for b in sig_ds.select_columns(["image_id", "sig", "filtered"]).iter_batches(
                batch_size=262144, batch_format="pyarrow"
            ):
                chunks.append(b)
            t = pa.concat_tables(chunks) if chunks else None
            if t is None:
                h = np.empty(0)
            else:
                h = hash_string_column(t.column("image_id"))
            if t is not None and len(np.unique(h)) == t.num_rows:
                lk = SigLookup(
                    h,
                    {
                        "sig": t.column("sig").to_numpy(zero_copy_only=False),
                        "filtered": t.column("filtered").to_numpy(zero_copy_only=False),
                    },
                )
                sig_map_ref = ray.put(lk)
        from humid_ray.stages.signatures import default_sig_concurrency

        out_kwargs = dict(
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=cfg.sig_batch_size,
            concurrency=cfg.sig_concurrency or default_sig_concurrency(),
            num_cpus=cfg.sig_num_cpus,
            fn_constructor_kwargs={
                "cfg": cfg,
                "umi_bits": umi_bits,
                "assign_ref": assign_ref,
                "dense_ref": dense_ref,
                "custom_sources": resolve_custom_sources(cfg),
                "sig_map_ref": sig_map_ref,
            },
        )
        # stats run CONCURRENTLY with the payload-heavy output writes
        # (separate streaming executions share the cluster; stats only
        # touch the small signature-shaped checkpoints)
        import concurrent.futures

        stats = None
        with concurrent.futures.ThreadPoolExecutor(max_workers=1) as pool:
            stats_fut = None
            if cfg.write_stats:
                stats_fut = pool.submit(
                    compute_stats, sig_ds, uniq_ds, edges_ds, assign_ds,
                    total_rows, edges_mf["rows"], cfg.cc_local_max_edges,
                    deg_hist,
                )
            if cfg.write_filtered:
                fpath = os.path.join(wd, "05_filtered")
                if not ((not stream or ck_async) and cfg.resume
                        and cp.phase_is_done(fpath, fp)):
                    if cfg.filtered_output == "manifest":
                        if join_strategy == "hash":
                            from humid_ray.stages.outputs import (
                                filtered_manifest_hash_join,
                            )

                            out_ds = filtered_manifest_hash_join(sig_ds, assign_ds)
                        else:
                            from humid_ray.stages.outputs import filtered_manifest

                            out_ds = filtered_manifest(sig_ds, assign_ref, dense_ref)
                    elif join_strategy == "hash":
                        from humid_ray.stages.outputs import filtered_output_hash_join

                        out_ds = filtered_output_hash_join(rows, sig_ds, assign_ds)
                    else:
                        out_ds = rows.map_batches(FilteredWriter, **out_kwargs)
                    cp.write_phase(out_ds, fpath, fp)
            if cfg.write_annotated:
                apath = os.path.join(wd, "05_annotated")
                if not ((not stream or ck_async) and cfg.resume
                        and cp.phase_is_done(apath, fp)):
                    if join_strategy == "hash":
                        from humid_ray.stages.outputs import annotated_output_hash_join

                        out_ds = annotated_output_hash_join(rows, sig_ds, assign_ds, dense_map)
                    else:
                        out_ds = rows.map_batches(AnnotatedWriter, **out_kwargs)
                    cp.write_phase(out_ds, apath, fp)
            if stats_fut is not None:
                stats = stats_fut.result()
                write_stats_files(stats, os.path.join(wd, "05_stats"))
                metrics.update(stats["summary"])
        timings["outputs"] = time.perf_counter() - t0

        if ck_futures:
            # durability barrier: every async checkpoint write must
            # land before the run reports success (usually already
            # done — the writes overlapped later phases)
            t0 = time.perf_counter()
            for f in ck_futures:
                f.result()
            timings["checkpoint_wait"] = time.perf_counter() - t0
        if ck_pool is not None:
            ck_pool.shutdown(wait=True)

        metrics["timings_sec"] = {k: round(v, 3) for k, v in timings.items()}
        with open(os.path.join(wd, "metrics.json"), "w") as f:
            json.dump(metrics, f, indent=1, default=str)
        return PipelineResult(workdir=wd, metrics=metrics, stats=stats,
                              datasets=mem)
