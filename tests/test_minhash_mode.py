"""-e mode (MinHash-Jaccard neighbor path) end-to-end."""

import os

import numpy as np
import pyarrow.parquet as pq

from humid_ray.config import HumidConfig
from humid_ray.pipelines.humid import HumidPipeline

U = np.uint64


def test_minhash_mode_pipeline(ray_session, corpus_dir, workdir):
    cfg = HumidConfig(
        workdir=workdir, distance="minhash-jaccard", jaccard_threshold=0.8,
        resume=False, write_annotated=False,
    )
    res = HumidPipeline(cfg).run(corpus_dir)
    assert res.metrics["clusters"] > 0

    # oracle: brute-force estimated jaccard over the per-sig
    # representative minhashes (first occurrence per sig)
    sig = pq.read_table(os.path.join(workdir, "01_signatures")).to_pandas()
    us = sig[~sig.filtered].copy()
    us["mh"] = us.minhash.apply(tuple)
    firsts = (
        us.sort_values("image_id").groupby("sig", as_index=False).first()
    )
    mh = np.array([list(t) for t in firsts.mh], dtype=np.int64)
    sigs = firsts.sig.to_numpy().view(U)
    est = (mh[:, None, :] == mh[None, :, :]).mean(axis=2)
    ii, jj = np.nonzero(est >= cfg.jaccard_threshold)
    lt = sigs[ii] < sigs[jj]
    truth = set(zip(sigs[ii[lt]].tolist(), sigs[jj[lt]].tolist()))

    edges = pq.read_table(os.path.join(workdir, "03_edges")).to_pandas()
    found = set(
        zip(edges.sig_a.to_numpy().view(U).tolist(),
            edges.sig_b.to_numpy().view(U).tolist())
    )
    # LSH banding with 16 bands of 8 perms has >0.99 collision prob at
    # jaccard >= 0.8 but is probabilistic; planted dups here are
    # jaccard == 1.0 (identical captions) so recall must be exact, and
    # anything found must satisfy the threshold (no false positives)
    exact = {(a, b) for a, b in truth}
    assert found <= exact or found == exact
    missed = exact - found
    assert len(missed) / max(len(exact), 1) <= 0.01


def test_cli_smoke(ray_session, corpus_dir, tmp_path):
    from humid_ray.cli import main

    out = tmp_path / "cliout"
    rc = main([corpus_dir, "-d", str(out), "-s", "-a", "--no-resume"])
    assert rc == 0
    assert (out / "05_stats" / "stats.dat").exists()
    assert (out / "05_annotated").exists()
