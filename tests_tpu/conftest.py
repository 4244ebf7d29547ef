"""On-chip test lane (VERDICT round-1 item 7): run with

    python -m pytest tests_tpu -q

on a machine with a real TPU.  The default suite (``tests/``) forces an
8-device virtual CPU mesh, so the Pallas kernel there runs in interpret mode
— a Mosaic lowering regression would keep tests green while the product
breaks.  This lane executes the real Mosaic path and the on-chip engine
pipeline.  It is intentionally small (remote compiles cost ~20-60s each on
the tunnel; the persistent compilation cache amortizes reruns).
"""

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/h10x_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")

import jax
import numpy as np
import pytest


def pytest_collection_modifyitems(config, items):
    if jax.default_backend() != "tpu":
        skip = pytest.mark.skip(reason="tests_tpu needs a real TPU backend")
        for item in items:
            item.add_marker(skip)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
