"""Session-scoped Ray init — one Ray per pytest session (driver contract)."""

from __future__ import annotations

import pytest
import ray


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    ray.init(address="local", num_cpus=4, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    # the engine's production shuffle strategy — the whole suite (incl. the
    # DuckDB oracle gate) runs on the hash-shuffle path
    from pixcrawler_ray.stages.shuffle import enable_hash_shuffle
    enable_hash_shuffle(4)
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def sf_tiny() -> str:
    return "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def sf_small() -> str:
    return "/root/testdata/sf0.01"
