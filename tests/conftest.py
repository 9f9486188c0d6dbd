import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def ray_session():
    """One Ray session for the whole pytest run (driver instruction)."""
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=4,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def small_corpus(tmp_path_factory):
    """A 300-page synthetic corpus on disk, shared across tests."""
    from crawler_seo_ray import datagen

    out = str(tmp_path_factory.mktemp("corpus") / "c300")
    manifest = datagen.write_corpus(out, 300, rows_per_shard=64, dim_base=16, dim_mod=33)
    return out, manifest
