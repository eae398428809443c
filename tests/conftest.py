"""Shared fixtures. Ray is initialised ONCE per pytest session."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def ray_session():
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=4, include_dashboard=False,
                 ignore_reinit_error=True)
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def small_corpus_dir(tmp_path_factory):
    """Sharded fixture corpus on disk (6 docs per family, 4 shards)."""
    from webtext.synth import write_corpus

    path = tmp_path_factory.mktemp("corpus")
    write_corpus(str(path), n_per_family=6, seed=42, rows_per_file=30)
    return str(path)
