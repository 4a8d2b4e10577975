"""End-to-end pipeline tests against the brute-force oracle — the
correctness pyramid the reference lacks (SURVEY §5): planted-duplicate
corpora, O(n^2) Hamming oracle, per-row invariants, resume."""

import collections
import json
import os

import numpy as np
import pyarrow.parquet as pq
import pytest

from humid_ray.config import HumidConfig
from humid_ray.oracle import oracle_cluster
from humid_ray.pipelines.humid import HumidPipeline
from humid_ray.png import decode_image, psnr

U = np.uint64


def _run(corpus_dir, workdir, **over):
    cfg = HumidConfig(
        workdir=workdir,
        write_annotated=True,
        hot_band_threshold=over.pop("hot_band_threshold", 40),
        **over,
    )
    return cfg, HumidPipeline(cfg).run(corpus_dir)


def _truth(workdir, mode):
    sig = pq.read_table(os.path.join(workdir, "01_signatures")).to_pandas()
    us = sig[~sig.filtered]
    return sig, oracle_cluster(
        us.sig.to_numpy().view(U), us.image_id.to_numpy(), 1, mode
    )


def _canon(pairs):
    m = collections.defaultdict(list)
    for s, g in pairs:
        m[g].append(s)
    return set(frozenset(v) for v in m.values())


@pytest.mark.parametrize("mode", ["directional", "maximum"])
def test_pipeline_matches_oracle(ray_session, corpus_dir, workdir, mode):
    cfg, res = _run(corpus_dir, workdir, clustering=mode)
    sig, truth = _truth(workdir, mode)

    # edges: dup-pair recall must be >= 0.99 (here: exact)
    edges = pq.read_table(os.path.join(workdir, "03_edges")).to_pandas()
    found = set(
        zip(edges.sig_a.to_numpy().view(U).tolist(),
            edges.sig_b.to_numpy().view(U).tolist())
    )
    u = truth["uniq"]
    tpairs = {(int(u[i]), int(u[j])) for i, j in truth["edges"]}
    assert found == tpairs

    # assignments: identical partition, representatives, sizes
    assign = pq.read_table(os.path.join(workdir, "04_assign")).to_pandas()
    for c in ("sig", "cluster_seed", "rep_sig"):
        assign[c] = assign[c].to_numpy().view(U)
    ta = truth["assign"]
    merged = assign.merge(ta, on="sig", suffixes=("_e", "_t"))
    assert len(merged) == len(ta) == len(assign)
    assert _canon(zip(merged.sig, merged.cluster_seed)) == _canon(
        zip(merged.sig, merged.cluster_id)
    )
    assert set(ta[ta.is_rep].sig) == set(merged[merged.is_rep_e].sig)
    assert (merged.cluster_size_e == merged.cluster_size_t).all()
    assert (merged.rep_image_id_e == merged.rep_image_id_t).all()

    # outputs: one row per cluster; annotated covers everything
    filt = pq.read_table(os.path.join(workdir, "05_filtered")).to_pandas()
    ann = pq.read_table(os.path.join(workdir, "05_annotated")).to_pandas()
    assert len(filt) == truth["n_clusters"]
    assert len(ann) == len(sig)
    assert (ann.cluster_id == 0).sum() == sig.filtered.sum()

    # lineage metrics present
    assert res.metrics["verified_dup_pairs"] == len(tpairs)
    assert res.metrics["rows_scanned"] == len(sig)
    mf = json.load(open(os.path.join(workdir, "03_edges", "_MANIFEST.json")))
    assert "candidate_pairs" in mf["metrics"]


def test_per_row_invariant_on_representatives(ray_session, corpus_dir, workdir):
    """Every surviving representative row must be byte-identical to its
    input row; decoded pixels equal (PSNR >= 40 dB for lossy formats)."""
    from humid_ray.synth import corpus_files

    _run(corpus_dir, workdir)
    inp = (
        pq.read_table(corpus_files(corpus_dir)[0])
        .to_pandas()
        .set_index("image_id")
    )
    out = pq.read_table(os.path.join(workdir, "05_filtered")).to_pandas()
    assert len(out) > 0
    for _, row in out.iterrows():
        src = inp.loc[row.image_id]
        assert row["bytes"] == src["bytes"]           # payload byte-equal
        assert row.caption == src.caption             # caption byte-equal
        img_out = decode_image(row["bytes"])
        img_in = decode_image(src["bytes"])
        if row.fmt == "jpeg":
            assert psnr(img_in, img_out) >= 40.0
        else:
            assert np.array_equal(img_in, img_out)


def test_resume_skips_completed_phases(ray_session, corpus_dir, workdir):
    cfg, _ = _run(corpus_dir, workdir, resume=True)
    sig_path = os.path.join(workdir, "01_signatures")
    mtime = os.path.getmtime(os.path.join(sig_path, "_MANIFEST.json"))
    # simulate a mid-pipeline crash: later phases gone, early ones kept
    import shutil

    shutil.rmtree(os.path.join(workdir, "04_assign"))
    shutil.rmtree(os.path.join(workdir, "05_filtered"))
    _, res2 = _run(corpus_dir, workdir, resume=True)
    # phase 1 untouched (not recomputed)
    assert os.path.getmtime(os.path.join(sig_path, "_MANIFEST.json")) == mtime
    # later phases rebuilt and consistent
    assert os.path.exists(os.path.join(workdir, "04_assign", "_MANIFEST.json"))
    assert res2.metrics["clusters"] > 0


def test_config_change_invalidates_checkpoints(ray_session, corpus_dir, workdir):
    _run(corpus_dir, workdir, resume=True)
    a1 = pq.read_table(os.path.join(workdir, "04_assign")).num_rows
    # different clustering mode -> new fingerprint -> assign recomputed
    _, res = _run(corpus_dir, workdir, resume=True, clustering="maximum")
    mf = json.load(open(os.path.join(workdir, "04_assign", "_MANIFEST.json")))
    assert mf["fingerprint"].startswith(HumidConfig(clustering="maximum").fingerprint())
    assert a1 > 0 and res.metrics["clusters"] > 0


def test_corpus_change_invalidates_checkpoints(ray_session, corpus_dir, workdir):
    """Same config + same workdir + DIFFERENT corpus must not reuse
    stale checkpoints (the fingerprint folds in the corpus identity)."""
    from humid_ray.synth import make_corpus

    _run(corpus_dir, workdir, resume=True)
    n1 = pq.read_table(os.path.join(workdir, "01_signatures")).num_rows
    other = make_corpus("/tmp/humid_pytest", 300)
    _, res = _run(other, workdir, resume=True)
    n2 = pq.read_table(os.path.join(workdir, "01_signatures")).num_rows
    assert n1 == 600 and n2 == 300
    assert res.metrics["rows_scanned"] == 300


def test_salting_preserves_edges(ray_session, corpus_dir, workdir):
    """Hot-band salting must not change the verified edge set."""
    _, _ = _run(corpus_dir, workdir, hot_band_threshold=5, resume=False)
    e1 = pq.read_table(os.path.join(workdir, "03_edges")).to_pandas()
    s1 = set(zip(e1.sig_a.tolist(), e1.sig_b.tolist()))
    wd2 = workdir + "_nosalt"
    _, _ = _run(corpus_dir, wd2, hot_band_threshold=10**9, resume=False)
    e2 = pq.read_table(os.path.join(wd2, "03_edges")).to_pandas()
    s2 = set(zip(e2.sig_a.tolist(), e2.sig_b.tolist()))
    assert s1 == s2


def test_streaming_phases_equal_checkpointed(ray_session, corpus_dir,
                                             workdir):
    """checkpoint_phases=False streams phases 1-4 through the object
    store (no parquet round-trips); every result surface — uniq /
    edges / assign tables, stats summary, lineage counters, filtered
    output — must equal the checkpointed run's."""
    _, ck = _run(corpus_dir, workdir, resume=False)
    wd2 = workdir + "_stream"
    _, st = _run(corpus_dir, wd2, resume=False, checkpoint_phases=False)

    # streaming wrote no intermediate checkpoints, but outputs landed
    assert not os.path.exists(os.path.join(wd2, "01_signatures"))
    assert os.path.exists(os.path.join(wd2, "05_filtered"))

    for phase, key in (("02_uniq", ["sig"]),
                       ("03_edges", ["sig_a", "sig_b"]),
                       ("04_assign", ["sig"])):
        a = (ck.dataset(phase).to_pandas()
             .sort_values(key).reset_index(drop=True))
        b = (st.dataset(phase).to_pandas()
             .sort_values(key).reset_index(drop=True))
        assert a.equals(b), phase

    assert ck.stats["summary"] == st.stats["summary"]
    for k in ("rows_scanned", "unique_sigs", "candidate_pairs",
              "verified_dup_pairs"):
        assert ck.metrics[k] == st.metrics[k], k

    fa = pq.read_table(os.path.join(workdir, "05_filtered")).to_pandas()
    fb = pq.read_table(os.path.join(wd2, "05_filtered")).to_pandas()
    key = [c for c in ("image_id",) if c in fa.columns] or list(fa.columns[:1])
    fa = fa.sort_values(key).reset_index(drop=True)
    fb = fb.sort_values(key).reset_index(drop=True)
    assert fa.equals(fb)


def test_async_checkpoints_equal_and_resumable(ray_session, corpus_dir,
                                               workdir):
    """checkpoint_phases='async' streams like the no-checkpoint mode
    but still lands every phase checkpoint (written in the background
    from the materialized blocks, awaited before the run returns):
    results equal the synchronous run, manifests validate, and a
    second resume=True run skips all four phases."""
    _, sync_res = _run(corpus_dir, workdir, resume=False)
    wd2 = workdir + "_async"
    _, a = _run(corpus_dir, wd2, resume=False, checkpoint_phases="async")

    from humid_ray.state import checkpoints as cp

    fp = a.metrics["config_fingerprint"]
    mtimes = {}
    for phase in ("01_signatures", "02_uniq", "03_edges", "04_assign"):
        path = os.path.join(wd2, phase)
        assert cp.phase_is_done(path, fp), phase
        mtimes[phase] = os.path.getmtime(os.path.join(path, "_MANIFEST.json"))
        want = (sync_res.dataset(phase).to_pandas()
                .sort_values(list(sync_res.dataset(phase).schema().names))
                .reset_index(drop=True))
        got = (pq.read_table(path).to_pandas()
               .sort_values(list(want.columns)).reset_index(drop=True))
        assert want.equals(got), phase

    # resume run: every phase skipped -> checkpoints untouched
    _, b = _run(corpus_dir, wd2, resume=True, checkpoint_phases="async")
    for phase, m in mtimes.items():
        assert os.path.getmtime(
            os.path.join(wd2, phase, "_MANIFEST.json")) == m, phase
    assert b.metrics["unique_sigs"] == a.metrics["unique_sigs"]
