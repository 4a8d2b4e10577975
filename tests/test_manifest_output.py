"""filtered_output='manifest' keep-list must select exactly the same
rows as the payload-copy mode, in both join strategies."""

import os

import pyarrow.parquet as pq

from humid_ray.config import HumidConfig
from humid_ray.pipelines.humid import HumidPipeline


def _ids(wd):
    return set(
        pq.read_table(os.path.join(wd, "05_filtered")).column("image_id").to_pylist()
    )


def test_manifest_matches_payload_mode(ray_session, corpus_dir, workdir):
    HumidPipeline(
        HumidConfig(workdir=workdir + "_p", resume=False, write_stats=False)
    ).run(corpus_dir)
    HumidPipeline(
        HumidConfig(workdir=workdir + "_m", resume=False, write_stats=False,
                    filtered_output="manifest")
    ).run(corpus_dir)
    HumidPipeline(
        HumidConfig(workdir=workdir + "_mh", resume=False, write_stats=False,
                    filtered_output="manifest", join_strategy="hash")
    ).run(corpus_dir)
    ids_p, ids_m, ids_mh = _ids(workdir + "_p"), _ids(workdir + "_m"), _ids(workdir + "_mh")
    assert ids_p == ids_m == ids_mh
    t = pq.read_table(os.path.join(workdir + "_m", "05_filtered"))
    assert set(t.schema.names) == {"image_id", "sig", "cluster_id", "cluster_size"}
