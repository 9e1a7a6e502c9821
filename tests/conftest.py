"""Session-scoped Ray + fixture setup (driver instruction: init Ray ONCE)."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def ray_session():
    import ray

    if not ray.is_initialized():
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
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def fixture_dir(tmp_path_factory):
    """Deterministic synthetic pages corpus, written once per session."""
    from repostcheckerbot_ray.fixtures import write_fixture

    d = tmp_path_factory.mktemp("fixture")
    write_fixture(str(d))
    return str(d)
