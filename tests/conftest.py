import os
import shutil

import pytest


@pytest.fixture(scope="session")
def ray_session():
    import ray
    from ray.data import DataContext

    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def corpus_dir():
    """Deterministic 600-row planted corpus (see humid_ray/synth.py)."""
    from humid_ray.synth import make_corpus

    base = "/tmp/humid_pytest"
    os.makedirs(base, exist_ok=True)
    return make_corpus(base, 600)


@pytest.fixture()
def workdir(tmp_path):
    wd = tmp_path / "run"
    yield str(wd)
    shutil.rmtree(wd, ignore_errors=True)
