"""Per-phase checkpointing with lineage manifests.

Each pipeline phase persists its output as a parquet directory under
the workdir plus a ``_MANIFEST.json`` recording: the semantic config
fingerprint, per-file (per-partition) row counts read back from the
parquet footers, and the phase's lineage metrics (rows scanned,
candidate pairs, verified dups, ...). A rerun with ``resume=True``
skips any phase whose manifest matches the fingerprint — this is what
"resumable from per-partition checkpoints" means for a batch pipeline
(the reference has nothing like it; a crash reruns everything).

Writes are atomic: data lands in ``<path>.tmp`` and is renamed into
place only after the manifest is written.
"""

from __future__ import annotations

import json
import os
import shutil

import pyarrow.parquet as pq

import ray.data

MANIFEST = "_MANIFEST.json"


def _data_files(path: str) -> list[str]:
    return sorted(
        f for f in os.listdir(path)
        if f.endswith(".parquet") and not f.startswith(("_", "."))
    )


def load_manifest(path: str) -> dict | None:
    mf = os.path.join(path, MANIFEST)
    if not os.path.exists(mf):
        return None
    with open(mf) as f:
        return json.load(f)


def phase_is_done(path: str, fingerprint: str) -> bool:
    m = load_manifest(path)
    return bool(m) and m.get("fingerprint") == fingerprint


def read_phase(path: str) -> "ray.data.Dataset":
    return ray.data.read_parquet(path)


def write_phase(
    ds: "ray.data.Dataset",
    path: str,
    fingerprint: str,
    metrics: dict | None = None,
    schema_hint=None,
) -> "ray.data.Dataset":
    """Persist ``ds`` at ``path`` atomically + manifest; returns the
    re-read Dataset (so downstream reads the checkpoint, giving each
    phase durable lineage instead of recomputing the chain)."""
    tmp = path + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    shutil.rmtree(path, ignore_errors=True)
    os.makedirs(tmp, exist_ok=True)
    ds.write_parquet(tmp)
    files = _data_files(tmp)
    if not files and schema_hint is not None:
        # fully-empty phase output (e.g. no edges): keep schema readable
        pq.write_table(schema_hint.empty_table(), os.path.join(tmp, "empty.parquet"))
        files = _data_files(tmp)
    partitions = {}
    total = 0
    total_bytes = 0
    for f in files:
        md = pq.ParquetFile(os.path.join(tmp, f)).metadata
        partitions[f] = md.num_rows
        total += md.num_rows
        # uncompressed table size — what a broadcast of this phase
        # would put in the object store (row counts alone under-guard
        # wide-id corpora; see HumidConfig.broadcast_max_bytes)
        total_bytes += sum(
            md.row_group(i).total_byte_size for i in range(md.num_row_groups)
        )
    manifest = {
        "fingerprint": fingerprint,
        "rows": total,
        "bytes": total_bytes,
        "partitions": partitions,
        "metrics": metrics or {},
    }
    with open(os.path.join(tmp, MANIFEST), "w") as f:
        json.dump(manifest, f, indent=1)
    os.rename(tmp, path)
    return read_phase(path)


def manifest_bytes(manifest: dict, path: str) -> int:
    """Uncompressed byte size of a phase checkpoint, for broadcast-cap
    decisions. Manifests written since the byte-cap landed record it;
    for a LEGACY manifest (or an old workdir resumed under new code)
    the size is re-stat'd from the parquet footers rather than
    defaulting to 0 — a zero default would silently disarm
    ``broadcast_max_bytes`` for exactly the wide-id multi-GB case it
    guards against."""
    if "bytes" in manifest:
        return int(manifest["bytes"])
    total = 0
    try:
        for f in _data_files(path):
            md = pq.ParquetFile(os.path.join(path, f)).metadata
            total += sum(
                md.row_group(i).total_byte_size
                for i in range(md.num_row_groups)
            )
    except OSError:
        # unreadable checkpoint: assume the broadcast would be large
        return 1 << 62
    return total


def update_metrics(path: str, extra: dict):
    """Merge extra lineage metrics into an existing phase manifest."""
    m = load_manifest(path) or {}
    m.setdefault("metrics", {}).update(extra)
    with open(os.path.join(path, MANIFEST), "w") as f:
        json.dump(m, f, indent=1)


def run_phase(
    name: str,
    path: str,
    fingerprint: str,
    compute,
    resume: bool,
    metrics: dict | None = None,
    schema_hint=None,
):
    """Compute-or-reload a phase. Returns (dataset, manifest, fresh)."""
    if resume and phase_is_done(path, fingerprint):
        return read_phase(path), load_manifest(path), False
    ds = compute()
    out = write_phase(ds, path, fingerprint, metrics=metrics, schema_hint=schema_hint)
    return out, load_manifest(path), True
