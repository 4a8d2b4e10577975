"""Phase 5 — outputs: dedup-filtered rows, annotated rows, statistics.

HUMID analog: writeFiltered / writeAnnotated / runStatistics
(reference src/humid.cc:203-292, 301-357). Like the reference, output
is a SECOND PASS over the input that recomputes each row's signature
and looks its cluster up — the explicit memory-for-IO trade the
reference makes (SURVEY §3): image payloads never transit a shuffle,
so the per-row invariant (byte-identical payload/caption on surviving
rows) holds by construction.

* filtered output: exactly one row per cluster — the first-occurrence
  (min image_id) row of the cluster's representative signature
  (maxLeaf, reference src/humid.cc:220-234); filtered rows dropped.
* annotated output: every row + ``cluster_id`` (0 for filtered rows,
  reference src/humid.cc:268-285, docs/output.rst:15-17).
* stats: counts/neigh/clusters histograms + summary, written both as
  reference-format ``.dat`` text files (docs/output.rst:26-54) and as
  a JSON metrics blob.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

import ray
from ray.data.aggregate import Count

from humid_ray.config import HumidConfig
from humid_ray.stages.joins import SigLookup
from humid_ray.stages.signatures import SignatureExtractor
from humid_ray.util import UINT64, u64col


def assignment_lookup_ref(assign_ds):
    """Broadcast (sig -> cluster_seed, rep_image_id, cluster_size) once."""
    lk = SigLookup.from_dataset(
        assign_ds, "sig", ["cluster_seed", "rep_image_id", "cluster_size"]
    )
    return ray.put(lk)


class _OutputBase:
    def __init__(self, cfg: HumidConfig, umi_bits: int, assign_ref, dense_ref=None,
                 custom_sources: dict | None = None, sig_map_ref=None):
        self.extract = SignatureExtractor(cfg, umi_bits, custom_sources or {})
        self.lk: SigLookup = ray.get(assign_ref)
        # sorted seed array: dense id == rank + 1 (vectorized searchsorted)
        self.dense: np.ndarray | None = ray.get(dense_ref) if dense_ref is not None else None
        # phase-1 checkpoint reuse: hashed-image_id -> (sig, filtered)
        # sorted-array lookup (vectorized probe). When it fits the
        # broadcast budget the second pass skips re-decoding entirely
        # (the reference re-reads AND re-computes, src/humid.cc:220-234
        # — our checkpoint makes that redundant); None -> recompute
        # like the reference (or use the hash-join path).
        self.sig_map: SigLookup | None = ray.get(sig_map_ref) if sig_map_ref is not None else None

    def _row_signatures(self, batch: pa.Table):
        if self.sig_map is not None:
            from humid_ray.stages.joins import hash_string_column

            h = hash_string_column(batch.column("image_id"))
            found, idx = self.sig_map.lookup(h)
            if len(self.sig_map.keys):
                sig = np.where(found, self.sig_map.get("sig", idx).view(UINT64), UINT64(0))
                filtered = np.where(found, self.sig_map.get("filtered", idx), True)
            else:
                sig = np.zeros(len(h), dtype=UINT64)
                filtered = np.ones(len(h), dtype=bool)
            return sig, filtered
        sigt = self.extract(batch)
        return (
            sigt.column("sig").to_numpy(zero_copy_only=False).view(UINT64),
            sigt.column("filtered").to_numpy(zero_copy_only=False),
        )

    def _resolve(self, batch: pa.Table):
        sig, filtered = self._row_signatures(batch)
        found, idx = self.lk.lookup(sig)
        found &= ~filtered
        if len(self.lk.keys):
            seed = np.where(found, self.lk.get("cluster_seed", idx).view(UINT64), UINT64(0))
        else:
            seed = np.zeros(len(sig), dtype=UINT64)
        if self.dense is not None:
            from humid_ray.stages.clustering import dense_ids_for

            cluster_id = dense_ids_for(self.dense, seed, found)
        else:
            cluster_id = np.where(found, seed, UINT64(0))
        rep_id = self.lk.get("rep_image_id", idx) if len(self.lk.keys) else np.array([None] * len(sig), dtype=object)
        return sig, filtered, found, cluster_id, rep_id


def filtered_manifest(sig_ds, assign_ref, dense_ref=None):
    """Keep-list variant of the filtered output: one row per cluster
    (image_id, sig, cluster_id, cluster_size), derived entirely from
    the signature checkpoint — the corpus payload is never re-read.
    This is the web-scale shape of HUMID's writeFiltered: the manifest
    selects the surviving rows; copying 100 TB of payload is a
    separate, optional materialization."""

    # plain task map (no actor pool): the lookup arrives via ray.get
    # per task — a local plasma read, vs the ~1 s an autoscaling actor
    # pool spends spinning up for this signature-shaped pass (a pure
    # fixed cost that dominated the low-CPU scaling configs)
    def kernel(batch: pa.Table) -> pa.Table:
        lk: SigLookup = ray.get(assign_ref)
        dense = ray.get(dense_ref) if dense_ref is not None else None
        sig = batch.column("sig").to_numpy(zero_copy_only=False).view(UINT64)
        filtered = batch.column("filtered").to_numpy(zero_copy_only=False)
        ids = np.asarray(batch.column("image_id").to_pylist(), dtype=object)
        found, idx = lk.lookup(sig)
        found &= ~filtered
        rep_id = lk.get("rep_image_id", idx)
        seed = lk.get("cluster_seed", idx).view(UINT64)
        size = lk.get("cluster_size", idx)
        keep = found & (ids == rep_id)
        if dense is not None:
            from humid_ray.stages.clustering import dense_ids_for

            cid = dense_ids_for(dense, seed[keep])
        else:
            cid = seed[keep]
        mask = pa.array(keep.astype(bool))
        return pa.table(
            {
                "image_id": batch.column("image_id").filter(mask),
                "sig": batch.column("sig").filter(mask),
                "cluster_id": u64col(cid),
                "cluster_size": pa.array(size[keep].astype(np.int64)),
            }
        )

    return sig_ds.map_batches(kernel, batch_format="pyarrow",
                              zero_copy_batch=True)


def filtered_manifest_hash_join(sig_ds, assign_ds, num_partitions: int | None = None):
    """Manifest keep-list via hash join (assignments too big to
    broadcast): signature-shaped rows only, no payload anywhere."""
    import pyarrow.compute as pc

    if num_partitions is None:
        num_partitions = _join_partitions()
    pairs = sig_ds.map_batches(
        lambda t: t.filter(pc.invert(t.column("filtered"))).select(["image_id", "sig"]),
        batch_format="pyarrow",
    )
    dec = pairs.join(
        assign_ds.select_columns(["sig", "rep_image_id", "cluster_seed", "cluster_size"]),
        join_type="inner", num_partitions=num_partitions, on=("sig",),
    )
    return dec.map_batches(
        lambda t: t.filter(pc.equal(t.column("image_id"), t.column("rep_image_id")))
        .select(["image_id", "sig", "cluster_seed", "cluster_size"])
        .rename_columns(["image_id", "sig", "cluster_id", "cluster_size"]),
        batch_format="pyarrow",
    )


class FilteredWriter(_OutputBase):
    """Corpus batch -> only cluster-representative rows (payload
    byte-identical; schema unchanged)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        sig, filtered, found, cluster_id, rep_id = self._resolve(batch)
        ids = np.asarray(batch.column("image_id").to_pylist(), dtype=object)
        keep = found & (ids == rep_id)
        return batch.filter(pa.array(keep))


class AnnotatedWriter(_OutputBase):
    """Corpus batch -> all rows + sig + cluster_id (0 = filtered)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        sig, filtered, found, cluster_id, rep_id = self._resolve(batch)
        batch = batch.append_column("sig", u64col(sig))
        return batch.append_column("cluster_id", u64col(cluster_id))


def _join_partitions() -> int:
    """Hash-join partition count sized to the cluster: each partition
    is an aggregator actor, so too many of them deadlock a small node
    (observed: 64 partitions on a 4-CPU session never schedules)."""
    cpus = int(ray.cluster_resources().get("CPU", 4))
    return max(2, min(64, cpus // 2))


def filtered_output_hash_join(rows_ds, sig_ds, assign_ds, num_partitions: int | None = None):
    """Scale path for the dedup-filtered output (broadcast too big):

      (image_id, sig) ⋈ assignments on sig  ->  representative row ids
      corpus ⋈ rep ids on image_id          ->  surviving payload rows

    Signature-shaped rows shuffle twice; the payload moves through
    exactly ONE hash join (unavoidable without recompute+broadcast).
    """
    import pyarrow.compute as pc

    if num_partitions is None:
        num_partitions = _join_partitions()
    pairs = sig_ds.map_batches(
        lambda t: t.filter(pc.invert(t.column("filtered"))).select(["image_id", "sig"]),
        batch_format="pyarrow",
    )
    dec = pairs.join(
        assign_ds.select_columns(["sig", "rep_image_id"]),
        join_type="inner",
        num_partitions=num_partitions,
        on=("sig",),
    )
    reps = dec.map_batches(
        lambda t: t.filter(
            pc.equal(t.column("image_id"), t.column("rep_image_id"))
        ).select(["image_id"]),
        batch_format="pyarrow",
    )
    return rows_ds.join(
        reps, join_type="inner", num_partitions=num_partitions, on=("image_id",)
    )


def annotated_output_hash_join(rows_ds, sig_ds, assign_ds, dense_map=None,
                               num_partitions: int | None = None):
    """Scale path for the annotated output: corpus ⋈ per-row cluster
    ids on image_id. Filtered rows keep their REAL computed sig with
    cluster_id 0 — identical output to the broadcast AnnotatedWriter,
    so the join-strategy choice never changes results."""
    import pyarrow.compute as pc

    if num_partitions is None:
        num_partitions = _join_partitions()
    usable = sig_ds.map_batches(
        lambda t: t.filter(pc.invert(t.column("filtered"))).select(["image_id", "sig"]),
        batch_format="pyarrow",
    )
    dec = usable.join(
        assign_ds.select_columns(["sig", "cluster_seed"]),
        join_type="inner", num_partitions=num_partitions, on=("sig",),
    )

    def to_cluster_id(t: pa.Table) -> pa.Table:
        seed = t.column("cluster_seed").to_numpy(zero_copy_only=False).view(UINT64)
        if dense_map is not None:
            from humid_ray.stages.clustering import dense_ids_for

            cid = dense_ids_for(dense_map, seed)
        else:
            cid = seed
        return pa.table(
            {"image_id": t.column("image_id"),
             "sig": t.column("sig"),
             "cluster_id": u64col(cid)}
        )

    dec = dec.map_batches(to_cluster_id, batch_format="pyarrow")
    # filtered rows contribute (image_id, real sig, cluster 0) so the
    # left join below annotates EVERY corpus row with its computed sig
    def dropped_rows(t: pa.Table) -> pa.Table:
        ft = t.filter(t.column("filtered")).select(["image_id", "sig"])
        return ft.append_column(
            "cluster_id", pa.array(np.zeros(ft.num_rows, dtype=np.int64))
        )

    dropped = sig_ds.map_batches(dropped_rows, batch_format="pyarrow")
    joined = rows_ds.join(
        dec.union(dropped), join_type="left_outer",
        num_partitions=num_partitions, on=("image_id",),
    )

    def fill_missing(t: pa.Table) -> pa.Table:
        cid = t.column("cluster_id")
        sig = t.column("sig")
        return (
            t.drop_columns(["cluster_id", "sig"])
            .append_column("sig", pc.fill_null(sig, 0))
            .append_column("cluster_id", pc.fill_null(cid, 0))
        )

    return joined.map_batches(fill_missing, batch_format="pyarrow")


def _hist_to_pandas(ds, key: str):
    import pandas as pd

    df = ds.groupby(key).aggregate(Count(alias_name="n")).to_pandas()
    if key not in df.columns:
        return pd.DataFrame({key: pd.Series(dtype="int64"), "n": pd.Series(dtype="int64")})
    return df.sort_values(key).reset_index(drop=True)


def _hist_small_domain(ds, key: str):
    """Histogram via per-block partial counts + a tiny driver merge —
    NO shuffle. Correct whenever the histogram DOMAIN is small
    (multiplicities, degrees, cluster sizes — all naturally bounded),
    no matter how many rows feed it: the heavy pass stays distributed,
    only (value, count) partials reach the driver."""
    import pandas as pd

    def partial(t: pa.Table) -> pa.Table:
        v = t.column(key).to_numpy(zero_copy_only=False)
        uniq, counts = np.unique(v, return_counts=True)
        return pa.table({"value": pa.array(uniq.astype(np.int64)),
                         "n": pa.array(counts.astype(np.int64))})

    acc: dict[int, int] = {}
    for b in ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True).iter_batches(
        batch_size=65536, batch_format="pyarrow"
    ):
        for v, n in zip(b.column("value").to_numpy(zero_copy_only=False),
                        b.column("n").to_numpy(zero_copy_only=False)):
            acc[int(v)] = acc.get(int(v), 0) + int(n)
    items = sorted(acc.items())
    return pd.DataFrame({"value": [v for v, _ in items], "n": [n for _, n in items]})


def degree_hist_from_arrays(ea: np.ndarray, eb: np.ndarray):
    """Degree histogram (value, n) straight from driver-held edge arrays."""
    import pandas as pd

    if len(ea) == 0:
        return pd.DataFrame({"value": pd.Series(dtype="int64"),
                             "n": pd.Series(dtype="int64")})
    both = np.concatenate([ea, eb])
    _, deg = np.unique(both, return_counts=True)
    vals, cnts = np.unique(deg, return_counts=True)
    return pd.DataFrame({"value": vals.astype(np.int64), "n": cnts.astype(np.int64)})


def compute_stats(sig_ds, uniq_ds, edges_ds, assign_ds, total_rows: int,
                  edges_rows: int | None = None,
                  local_edges_max: int = 5_000_000,
                  deg_hist=None):
    """All reference statistics as small pandas frames / scalars.

    counts.dat  <- histogram of exact-duplicate multiplicities
                   (reference src/humid.cc:301-311)
    neigh.dat   <- histogram of per-signature neighbor degree,
                   including degree 0 (reference src/humid.cc:309)
    clusters.dat<- histogram of cluster sizes (reference src/cluster.cc:89-95)
    stats.dat   <- total / usable / unique / clusters
                   (reference src/humid.cc:351-356)
    """
    import pandas as pd

    counts_hist = _hist_small_domain(uniq_ds, "count")
    # usable = sum(count * multiplicity); unique = number of leaves —
    # both derivable from the histogram, no extra pass
    usable = int((counts_hist["value"] * counts_hist["n"]).sum()) if len(counts_hist) else 0
    unique = int(counts_hist["n"].sum()) if len(counts_hist) else 0

    # degree histogram: degree per sig from the edge endpoints; sigs
    # with no edges contribute the degree-0 bucket (= unique - |deg>0|)
    if deg_hist is not None:
        pass  # precomputed by the small-graph coordinator (one edge pull)
    elif edges_rows is not None and edges_rows <= local_edges_max:
        # edges fit one pass: count degrees directly (edge list is the
        # SMALL side; same regime as the local union-find)
        acc: dict[int, int] = {}
        for b in edges_ds.iter_batches(batch_size=262144, batch_format="pyarrow"):
            both = np.concatenate([
                b.column("sig_a").to_numpy(zero_copy_only=False),
                b.column("sig_b").to_numpy(zero_copy_only=False),
            ])
            u, c = np.unique(both, return_counts=True)
            for s, n in zip(u.tolist(), c.tolist()):
                acc[s] = acc.get(s, 0) + n
        deg_vals, deg_cnt = np.unique(
            np.fromiter(acc.values(), dtype=np.int64, count=len(acc)),
            return_counts=True,
        ) if acc else (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64))
        deg_hist = pd.DataFrame({"value": deg_vals, "n": deg_cnt})
    else:

        def endpoints(batch: pa.Table) -> pa.Table:
            a = batch.column("sig_a")
            b = batch.column("sig_b")
            a = a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a
            b = b.combine_chunks() if isinstance(b, pa.ChunkedArray) else b
            return pa.table({"sig": pa.concat_arrays([a, b])})

        deg_hist = _hist_small_domain(
            edges_ds.map_batches(endpoints, batch_format="pyarrow", zero_copy_batch=True)
            .groupby("sig")
            .aggregate(Count(alias_name="degree")),
            "degree",
        )
    n_deg0 = unique - int(deg_hist["n"].sum() if len(deg_hist) else 0)
    neigh_hist = pd.concat(
        [pd.DataFrame({"value": [0], "n": [n_deg0]}), deg_hist], ignore_index=True
    )
    neigh_hist = neigh_hist[neigh_hist["n"] > 0].sort_values("value").reset_index(drop=True)

    reps = assign_ds.map_batches(
        lambda t: t.filter(t.column("is_rep")).select(["cluster_size"]),
        batch_format="pyarrow",
    )
    cluster_hist = _hist_small_domain(reps, "cluster_size")

    n_clusters = int(cluster_hist["n"].sum()) if len(cluster_hist) else 0
    summary = {
        "total": int(total_rows),
        "usable": usable,
        "unique": unique,
        "clusters": n_clusters,
    }
    return {
        "counts": counts_hist,
        "neigh": neigh_hist,
        "clusters": cluster_hist,
        "summary": summary,
    }


def write_stats_files(stats: dict, dirname: str):
    """Reference-format space-separated .dat files (docs/output.rst:26-54)."""
    os.makedirs(dirname, exist_ok=True)
    for name in ("counts", "neigh", "clusters"):
        df = stats[name]
        with open(os.path.join(dirname, f"{name}.dat"), "w") as f:
            for _, row in df.iterrows():
                f.write(f"{int(row['value'])} {int(row['n'])}\n")
    with open(os.path.join(dirname, "stats.dat"), "w") as f:
        for k in ("total", "usable", "unique", "clusters"):
            f.write(f"{k}: {stats['summary'][k]}\n")
