"""User-extension surface: custom signature sources + dense ids."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from humid_ray.config import HumidConfig
from humid_ray.functions.registry import (
    clear_registry,
    register_signature_source,
)
from humid_ray.pipelines.humid import HumidPipeline


@pytest.fixture(autouse=True)
def _clean_registry():
    yield
    clear_registry()


def test_custom_source_in_signature(ray_session, corpus_dir, workdir):
    """A registered source's top bits end up in the composite word."""

    def fmt_hash(batch: pa.Table):
        from humid_ray.util import hash_bytes_segments

        vals = [(f or "").encode() for f in batch.column("fmt").to_pylist()]
        data = np.frombuffer(b"".join(vals), dtype=np.uint8)
        offs = np.cumsum([0] + [len(v) for v in vals])
        return hash_bytes_segments(data, offs), np.ones(batch.num_rows, dtype=bool)

    register_signature_source("fmt", fmt_hash)
    cfg = HumidConfig(workdir=workdir, sources=("phash", "fmt"),
                      resume=False, write_filtered=False, write_stats=False)
    res = HumidPipeline(cfg).run(corpus_dir)
    assert res.metrics["unique_sigs"] > 0
    # png and jpeg rows of the same image now differ in the low 32 bits
    sig = pq.read_table(os.path.join(workdir, "01_signatures")).to_pandas()
    assert sig.sig.nunique() > 1


def test_unknown_source_raises(ray_session, corpus_dir, workdir):
    cfg = HumidConfig(workdir=workdir, sources=("phash", "nope"),
                      resume=False, write_filtered=False, write_stats=False)
    with pytest.raises(Exception, match="nope"):
        HumidPipeline(cfg).run(corpus_dir)


def test_dense_ids_annotated(ray_session, corpus_dir, workdir):
    cfg = HumidConfig(workdir=workdir, dense_ids=True, write_annotated=True,
                      write_filtered=False, resume=False)
    res = HumidPipeline(cfg).run(corpus_dir)
    ann = pq.read_table(os.path.join(workdir, "05_annotated")).to_pandas()
    ids = sorted(set(ann.cluster_id) - {0})
    k = res.metrics["clusters"]
    # dense walk-order numbering: exactly 1..K
    assert ids == list(range(1, k + 1))


def test_sig_repr():
    from humid_ray.functions.signature import sig_repr

    cfg = HumidConfig()
    s = sig_repr(0xAABBCCDD00112233, cfg)
    assert s.startswith("aabbccdd00112233")
    assert "phash=" in s and "simhash=" in s
