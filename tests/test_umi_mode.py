"""UMI-precedence mode end-to-end (header-UMI analog).

Ids carry a hex token (``..._<hex>``); its nibbles take budget
precedence over the content sources (reference preCompute,
src/humid.cc:38-59). Rows without a valid token are filtered
(reference: empty UMI -> word can't assemble)."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray.data

from humid_ray.config import HumidConfig
from humid_ray.pipelines.humid import HumidPipeline
from humid_ray.synth import corpus_files

U = np.uint64


def test_umi_pipeline(ray_session, corpus_dir, workdir):
    t = pq.read_table(corpus_files(corpus_dir)[0])
    # give every row an 8-nibble UMI derived from its row index; two
    # rows per "umi family" share a token -> exact dups under a
    # umi-only budget regardless of content
    ids = [f"img{i:06d}_{(i // 2):08x}" for i in range(t.num_rows)]
    # one invalid-token row (NOT the first: the probe peeks the first
    # row to size the UMI, exactly like the reference's peekUMI)
    ids[5] = "plainid"
    t = t.set_column(t.schema.get_field_index("image_id"), "image_id",
                     pa.array(ids, type=pa.string()))
    ds = ray.data.from_arrow(t)

    cfg = HumidConfig(workdir=workdir, umi_from_id=True, word_bits=32,
                      resume=False, write_filtered=False, write_annotated=True,
                      write_stats=True)
    res = HumidPipeline(cfg).run(ds)
    # probe saw 8 hex chars -> 32 bits -> whole budget is UMI
    assert res.metrics["umi_bits"] == 32

    sig = pq.read_table(f"{workdir}/01_signatures").to_pandas()
    sig["u"] = sig.sig.to_numpy().view(U)
    ok = sig[~sig.filtered].copy()
    # the word is exactly the UMI in the top 32 bits
    tok = ok.image_id.str.extract(r"_([0-9a-f]{8})$")[0]
    expect = tok.apply(lambda h: np.uint64(int(h, 16)) << np.uint64(32))
    assert (ok.u.to_numpy() == expect.to_numpy().astype(np.uint64)).all()
    # invalid-token row is filtered
    assert bool(sig.set_index("image_id").loc["plainid", "filtered"])
    # rows sharing a token collapse into one signature (count >= 2),
    # except tokens whose partner row was itself filtered
    uniq = pq.read_table(f"{workdir}/02_uniq").to_pandas()
    assert (uniq["count"] >= 1).all() and (uniq["count"] == 2).sum() > 0
