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
