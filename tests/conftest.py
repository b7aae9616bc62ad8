"""Test configuration: force an 8-device virtual CPU mesh so sharding
semantics (half/data axes) are testable without TPU hardware.

The environment may preload a remote-TPU PJRT plugin via sitecustomize
(PALLAS_AXON_POOL_IPS) and bake JAX_PLATFORMS=axon into jax.config at import
time — os.environ overrides are too late. ``jax.config.update`` still wins
as long as no backend has been initialized, so do that here (conftest runs
before any test imports trigger device lookup)."""

import os

# tests run on CPU: the persistent compile cache is for the remote TPU
# (entries embed machine features; cross-host reload risks SIGILL)
os.environ.setdefault("THUNDER_NO_COMPILE_CACHE", "1")

# must be set before the CPU backend is first initialized
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running e2e / multi-process tests "
        "(deselect with -m 'not slow')")


@pytest.fixture(scope="session", autouse=True)
def _isolate_cwd(tmp_path_factory):
    """Run the whole session from a scratch directory so tests that leave
    ``Para.output_directory`` at its ``./`` default (e2e fixtures) drop their
    round dumps (Sig_/Tau_/Timing_/FSC_ files) outside the repo tree."""
    prev = os.getcwd()
    os.chdir(tmp_path_factory.mktemp("cwd"))
    yield
    os.chdir(prev)


@pytest.fixture
def rng():
    return np.random.default_rng(12345)
