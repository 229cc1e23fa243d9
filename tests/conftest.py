"""Test fixture wiring (SURVEY.md §4).

Tests run on the CPU backend with 8 virtual devices so every multi-chip code
path (mesh construction, shard_map DP, sharding-annotated jit) is exercised in
one process without TPU hardware — set DMV3D_TEST_TPU=1 to run on real chips
instead. Must run before the first jax import.
"""

import os

if not os.environ.get("DMV3D_TEST_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

# XLA compiles are remote in this environment (slow round trips even for the
# CPU backend) — persist everything compiled across test runs.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

if not os.environ.get("DMV3D_TEST_TPU"):
    # sitecustomize.py (axon TPU plugin) force-sets jax_platforms at
    # interpreter start, overriding the env var — override it back before
    # the first backend initialization so tests really run on the 8-device
    # virtual CPU mesh.
    jax.config.update("jax_platforms", "cpu")
    assert jax.default_backend() == "cpu", jax.devices()
    assert len(jax.devices()) == 8, jax.devices()


@pytest.fixture(scope="session")
def devices():
    return jax.devices()


@pytest.fixture()
def rng():
    return np.random.default_rng(0)


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "tpu: requires real TPU hardware (DMV3D_TEST_TPU=1)")
    config.addinivalue_line(
        "markers", "slow: integration-weight test (deselect with -m 'not slow')")


def pytest_collection_modifyitems(config, items):
    on_tpu = bool(os.environ.get("DMV3D_TEST_TPU"))
    skip = pytest.mark.skip(reason="needs real TPU (set DMV3D_TEST_TPU=1)")
    for item in items:
        if "tpu" in item.keywords and not on_tpu:
            item.add_marker(skip)
