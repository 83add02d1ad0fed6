"""Test configuration: CPU backend with 8 virtual devices + float64.

Tests run on CPU (the real TPU chip is reserved for benchmarking; the image's
``sitecustomize`` registers the remote-TPU "axon" PJRT plugin in every
process, so we must actively force CPU) with an 8-device virtual mesh so the
shard_map paths are exercised exactly as the driver's ``dryrun_multichip``
does, and with x64 enabled so the ``double`` precision policy reproduces the
reference's complex128 numerics.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

# The axon plugin ignores JAX_PLATFORMS once registered; this does not.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)


def pytest_sessionstart(session):
    assert jax.devices()[0].platform == "cpu"
    assert len(jax.devices()) == 8, jax.devices()
