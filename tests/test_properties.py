"""Hypothesis property tests for the geometry ops (SURVEY.md §4.2)."""

import hypothesis
import hypothesis.strategies as st
import jax
import jax.numpy as jnp
import numpy as np

from dynamic_multiview_3d_tpu.ops import pose as pose_ops
from dynamic_multiview_3d_tpu.ops import sampling

SETTINGS = dict(max_examples=20, deadline=None,
                suppress_health_check=[hypothesis.HealthCheck.too_slow])


@hypothesis.given(
    shift=st.integers(min_value=-5, max_value=5),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
@hypothesis.settings(**SETTINGS)
def test_integer_flow_is_exact_shift(shift, seed):
    rng = np.random.default_rng(seed)
    img = jnp.asarray(rng.standard_normal((1, 12, 12, 2), dtype=np.float32))
    flow = jnp.full((1, 12, 12, 2), 0.0).at[..., 0].set(float(shift))
    out = np.asarray(sampling.flow_warp(img, flow, padding_mode="border"))
    ref = np.asarray(img)
    if shift >= 0:
        np.testing.assert_allclose(out[0, :, : 12 - shift],
                                   ref[0, :, shift:], atol=1e-5)
    else:
        np.testing.assert_allclose(out[0, :, -shift:],
                                   ref[0, :, : 12 + shift], atol=1e-5)


@hypothesis.given(
    value=st.floats(min_value=-1.0, max_value=1.0),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
@hypothesis.settings(**SETTINGS)
def test_constant_image_invariant_under_warp(value, seed):
    rng = np.random.default_rng(seed)
    img = jnp.full((1, 10, 10, 1), np.float32(value))
    flow = jnp.asarray(rng.uniform(-4, 4, (1, 10, 10, 2)).astype(np.float32))
    out = np.asarray(sampling.flow_warp(img, flow, padding_mode="border"))
    np.testing.assert_allclose(out, value, atol=1e-5)


@hypothesis.given(
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
@hypothesis.settings(**SETTINGS)
def test_sampled_values_within_image_range(seed):
    """Bilinear interpolation never exceeds the source value range."""
    rng = np.random.default_rng(seed)
    img = jnp.asarray(rng.uniform(0, 1, (1, 9, 9, 1)).astype(np.float32))
    grid = jnp.asarray(rng.uniform(-1, 1, (1, 6, 6, 2)).astype(np.float32))
    out = np.asarray(sampling.grid_sample(img, grid, align_corners=True,
                                          padding_mode="border"))
    assert out.min() >= float(np.asarray(img).min()) - 1e-6
    assert out.max() <= float(np.asarray(img).max()) + 1e-6


@hypothesis.given(
    az=st.floats(min_value=-6.0, max_value=6.0),
    el=st.floats(min_value=-1.4, max_value=1.4),
    r=st.floats(min_value=0.5, max_value=5.0),
)
@hypothesis.settings(**SETTINGS)
def test_extrinsics_always_rigid(az, el, r):
    t = np.asarray(pose_ops.look_at_extrinsics(
        jnp.array([az, el, r], jnp.float32)))
    rot = t[:3, :3]
    np.testing.assert_allclose(rot @ rot.T, np.eye(3), atol=1e-4)
    np.testing.assert_allclose(np.linalg.det(rot), 1.0, atol=1e-4)
    # camera center maps to (0,0,r)
    np.testing.assert_allclose(t @ np.array([0, 0, 0, 1.0]),
                               [0, 0, r, 1.0], atol=1e-4)


@hypothesis.given(
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
@hypothesis.settings(**SETTINGS)
def test_warp_is_linear_in_image(seed):
    """grid_sample(a*I1 + b*I2) == a*warp(I1) + b*warp(I2)."""
    rng = np.random.default_rng(seed)
    i1 = jnp.asarray(rng.standard_normal((1, 8, 8, 1), dtype=np.float32))
    i2 = jnp.asarray(rng.standard_normal((1, 8, 8, 1), dtype=np.float32))
    grid = jnp.asarray(rng.uniform(-1, 1, (1, 8, 8, 2)).astype(np.float32))
    a, b = 0.3, -1.7

    def w(img):
        return np.asarray(sampling.grid_sample(img, grid))

    np.testing.assert_allclose(w(a * i1 + b * i2), a * w(i1) + b * w(i2),
                               atol=1e-4)
