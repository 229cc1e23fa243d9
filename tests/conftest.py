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

# XLA compiles dominate the fast tier on this 1-core host — persist every
# compiled executable across test runs. Env vars are NOT enough here: the
# axon sitecustomize imports jax at interpreter start, so jax.config read
# its env-var defaults before this file ran (the same reason the platform
# override above uses jax.config.update). Setting the config directly is
# the only path that actually enables the cache under pytest.
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                 "/root/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


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
