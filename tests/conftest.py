from __future__ import annotations

import logging
import sys

import pytest

sys.path.insert(0, "/root/repo")  # __ray_entry__ lives at the repo root


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    import os

    import ray
    from ray.data import DataContext

    # worker processes must be able to unpickle classes defined in test
    # modules (they import by module name)
    extra = "/root/repo/tests:/root/repo"
    prev = os.environ.get("PYTHONPATH", "")
    os.environ["PYTHONPATH"] = f"{extra}:{prev}" if prev else extra
    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    logging.getLogger("ray.data").setLevel(logging.ERROR)
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return "/root/testdata/sf0.001"
