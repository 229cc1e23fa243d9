"""Aux-subsystem tests: debug_mode NaN tripwire + TraceWindow windowing
(SURVEY.md §5 sanitizer/tracing analogs — both wired into cli/train)."""

import os

import jax
import jax.numpy as jnp
import pytest

from dynamic_multiview_3d_tpu.utils import debugging, profiling


def test_debug_mode_raises_on_nan():
    with pytest.raises(FloatingPointError):
        with debugging.debug_mode():
            jnp.log(jnp.zeros(4) - 1.0).block_until_ready()


def test_debug_mode_restores_flag():
    prev = jax.config.jax_debug_nans
    with debugging.debug_mode():
        assert jax.config.jax_debug_nans
        jnp.square(jnp.ones(2)).block_until_ready()   # clean ops still fine
    assert jax.config.jax_debug_nans == prev


def test_trace_window_snaps_to_dispatch_boundaries(tmp_path):
    tw = profiling.TraceWindow(str(tmp_path), (3, 5))
    # dispatches of 2 steps: [0,2) misses the window start
    tw.maybe_start(0, 2)
    assert not tw.active
    tw.maybe_start(2, 4)                               # 2 <= 3 < 4 -> start
    assert tw.active
    tw.maybe_stop(4)                                   # 4 < 5: keep going
    assert tw.active
    tw.maybe_stop(6, block_on=jnp.ones(2))
    assert not tw.active
    # an xplane capture landed on disk
    found = [f for _, _, fs in os.walk(tmp_path) for f in fs]
    assert any("xplane" in f or f.endswith(".json.gz") for f in found), found


def test_trace_window_disabled_without_logdir():
    tw = profiling.TraceWindow(None, (0, 1))
    tw.maybe_start(0, 1)
    assert not tw.active
    tw.close()
