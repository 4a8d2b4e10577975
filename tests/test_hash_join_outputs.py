"""join_strategy='hash' must produce the same outputs as broadcast."""

import os

import pyarrow.parquet as pq


def _run(corpus_dir, wd, strategy):
    from humid_ray.config import HumidConfig
    from humid_ray.pipelines.humid import HumidPipeline

    cfg = HumidConfig(workdir=wd, join_strategy=strategy, resume=False,
                      write_annotated=True, write_stats=False)
    return HumidPipeline(cfg).run(corpus_dir)


def test_hash_join_outputs_match_broadcast(ray_session, corpus_dir, workdir):
    res_b = _run(corpus_dir, workdir + "_b", "broadcast")
    res_h = _run(corpus_dir, workdir + "_h", "hash")
    assert res_b.metrics["output_join_strategy"] == "broadcast"
    assert res_h.metrics["output_join_strategy"] == "hash"

    fb = pq.read_table(os.path.join(workdir + "_b", "05_filtered")).to_pandas()
    fh = pq.read_table(os.path.join(workdir + "_h", "05_filtered")).to_pandas()
    assert set(fb.image_id) == set(fh.image_id)
    # payload byte-equality on the hash-join side too
    m = fb.set_index("image_id")["bytes"].to_dict()
    for _, row in fh.iterrows():
        assert row["bytes"] == m[row.image_id]

    ab = pq.read_table(os.path.join(workdir + "_b", "05_annotated")).to_pandas()
    ah = pq.read_table(os.path.join(workdir + "_h", "05_annotated")).to_pandas()
    assert len(ab) == len(ah)
    # full parity including the sig column: filtered rows must carry
    # their REAL computed sig (cluster 0) in BOTH join strategies
    assert set(zip(ab.image_id, ab.sig, ab.cluster_id)) == set(
        zip(ah.image_id, ah.sig, ah.cluster_id)
    )
