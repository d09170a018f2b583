"""Session-scoped Ray fixture: init ONCE per pytest session."""

from __future__ import annotations

import os

import pytest

os.environ.setdefault("POLARS_MAX_THREADS", "1")


@pytest.fixture(scope="session")
def ray_session():
    import ray

    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    yield ray
    ray.shutdown()


@pytest.fixture(scope="session")
def small_corpus(tmp_path_factory):
    """120-page deterministic corpus written once per session."""
    from kgray.fixtures import write_pages_corpus

    d = tmp_path_factory.mktemp("pages")
    paths = write_pages_corpus(str(d), 120, shard_rows=40)
    return paths
