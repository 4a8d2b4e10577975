"""Full pipeline with cc_strategy='distributed' must equal 'local'."""

import os

import numpy as np
import pyarrow.parquet as pq

from humid_ray.config import HumidConfig
from humid_ray.pipelines.humid import HumidPipeline

U = np.uint64


def _assign(wd):
    df = pq.read_table(os.path.join(wd, "04_assign")).to_pandas()
    for c in ("sig", "cluster_seed", "rep_sig"):
        df[c] = df[c].to_numpy().view(U)
    return df.sort_values("sig").reset_index(drop=True)


def test_distributed_cc_pipeline_equals_local(ray_session, corpus_dir, workdir):
    for strat in ("local", "distributed"):
        cfg = HumidConfig(workdir=workdir + "_" + strat, cc_strategy=strat,
                          resume=False, write_filtered=False, write_stats=False)
        HumidPipeline(cfg).run(corpus_dir)
    a = _assign(workdir + "_local")
    b = _assign(workdir + "_distributed")
    assert len(a) == len(b)
    assert (a.sig.to_numpy() == b.sig.to_numpy()).all()
    assert (a.cluster_seed.to_numpy() == b.cluster_seed.to_numpy()).all()
    assert (a.is_rep.to_numpy() == b.is_rep.to_numpy()).all()
    assert (a.cluster_size.to_numpy() == b.cluster_size.to_numpy()).all()


def test_all_distributed_branches_equal_local(ray_session, corpus_dir, workdir):
    """Force EVERY scale branch at once — distributed CC, distributed
    assign replay (broadcast_max_rows=0), distributed degree histogram
    (cc_local_max_edges=0), hash-join outputs — and require identical
    assignments, stats and annotated rows vs the all-local defaults."""
    import json

    cfgs = {
        "local": HumidConfig(workdir=workdir + "_dl", resume=False,
                             write_filtered=False, write_annotated=True,
                             write_stats=True),
        "dist": HumidConfig(workdir=workdir + "_dd", resume=False,
                            write_filtered=False, write_annotated=True,
                            write_stats=True, cc_strategy="distributed",
                            broadcast_max_rows=0, cc_local_max_edges=0,
                            join_strategy="hash"),
    }
    stats = {}
    for name, cfg in cfgs.items():
        res = HumidPipeline(cfg).run(corpus_dir)
        stats[name] = {k: res.metrics[k] for k in
                       ("total", "usable", "unique_sigs", "clusters")}
    assert stats["local"] == stats["dist"]

    a = _assign(workdir + "_dl")
    b = _assign(workdir + "_dd")
    for col in ("sig", "count", "cluster_seed", "rep_sig", "is_rep",
                "cluster_size"):
        assert (a[col].to_numpy() == b[col].to_numpy()).all(), col

    for fname in ("counts.dat", "neigh.dat", "clusters.dat", "stats.dat"):
        with open(os.path.join(workdir + "_dl", "05_stats", fname)) as f1, \
             open(os.path.join(workdir + "_dd", "05_stats", fname)) as f2:
            assert f1.read() == f2.read(), fname

    def annotated(wd):
        df = pq.read_table(os.path.join(wd, "05_annotated")).to_pandas()
        df["sig"] = df.sig.to_numpy().view(U)
        df["cluster_id"] = df.cluster_id.to_numpy().view(U)
        return df[["image_id", "sig", "cluster_id"]].sort_values(
            "image_id").reset_index(drop=True)

    assert annotated(workdir + "_dl").equals(annotated(workdir + "_dd"))
