"""Pallas kernel tests (SURVEY.md §7 M5).

On CPU the kernels run in interpret mode, bit-compared against the jnp
gather reference (itself torch-oracle-verified in test_grid_sample.py) for
forward AND both gradients. The @tpu-marked test compiles the real Mosaic
kernel on hardware (DMV3D_TEST_TPU=1)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dynamic_multiview_3d_tpu.kernels import grid_sample_pallas as gsp
from dynamic_multiview_3d_tpu.ops import sampling

INTERP = jax.default_backend() != "tpu"


def _data(rng, n=2, h=16, w=24, c=3, ho=12, wo=20, spread=1.4):
    img = rng.standard_normal((n, h, w, c), dtype=np.float32)
    grid = rng.uniform(-spread, spread, size=(n, ho, wo, 2)) \
        .astype(np.float32)
    return jnp.asarray(img), jnp.asarray(grid)


@pytest.mark.parametrize("padding_mode", ["zeros", "border"])
@pytest.mark.parametrize("align_corners", [True, False])
def test_forward_matches_jnp(rng, padding_mode, align_corners):
    img, grid = _data(rng)
    ours = gsp.grid_sample(img, grid, align_corners=align_corners,
                           padding_mode=padding_mode, interpret=INTERP)
    ref = sampling.grid_sample(img, grid, align_corners=align_corners,
                               padding_mode=padding_mode, impl="jnp")
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("padding_mode", ["zeros", "border"])
def test_gradients_match_jnp(rng, padding_mode):
    img, grid = _data(rng, n=1, h=10, w=12, ho=8, wo=8, spread=1.1)
    cot = jnp.asarray(
        rng.standard_normal((1, 8, 8, 3), dtype=np.float32))

    def loss(fn):
        def f(i, g):
            return jnp.sum(fn(i, g) * cot)
        return jax.grad(f, argnums=(0, 1))

    ours_fn = functools.partial(gsp.grid_sample, padding_mode=padding_mode,
                                interpret=INTERP)
    ref_fn = functools.partial(sampling.grid_sample,
                               padding_mode=padding_mode, impl="jnp")
    d_img_o, d_grid_o = loss(ours_fn)(img, grid)
    d_img_r, d_grid_r = loss(ref_fn)(img, grid)
    np.testing.assert_allclose(np.asarray(d_img_o), np.asarray(d_img_r),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(d_grid_o), np.asarray(d_grid_r),
                               rtol=1e-4, atol=1e-4)


def test_flow_warp_matches_jnp(rng):
    img = jnp.asarray(rng.standard_normal((2, 16, 16, 3), dtype=np.float32))
    flow = jnp.asarray(rng.uniform(-4, 4, (2, 16, 16, 2)).astype(np.float32))
    ours = gsp.flow_warp(img, flow, interpret=INTERP)
    ref = sampling.flow_warp(img, flow, impl="jnp")
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_nondivisible_sizes(rng):
    # Ho*Wo prime-ish: exercises the single-block fallback path.
    img, grid = _data(rng, n=1, h=9, w=11, ho=7, wo=5)
    ours = gsp.grid_sample(img, grid, interpret=INTERP)
    ref = sampling.grid_sample(img, grid, impl="jnp")
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_wide_channels_fall_back(rng):
    img = jnp.asarray(
        rng.standard_normal((1, 8, 8, 64), dtype=np.float32))
    grid = jnp.asarray(rng.uniform(-1, 1, (1, 8, 8, 2)).astype(np.float32))
    out = gsp.grid_sample(img, grid, interpret=INTERP)  # routes to jnp
    ref = sampling.grid_sample(img, grid, impl="jnp")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_vmem_planner_decisions():
    """Large shapes are *decided* (table-capped pixel block or jnp
    fallback), not discovered as Mosaic VMEM failures (VERDICT r2 weak #5).
    Expected values mirror the hardware-probed _VALIDATED_PB table."""
    # The validated hot paths keep their full 2048-pixel block.
    assert gsp._plan(128 * 128, 3, 128, 128, "exact") == 2048
    assert gsp._plan(128 * 128, 3, 128, 128, "fast") == 2048   # inherits
    assert gsp._plan(256 * 256, 3, 256, 256, "fast") == 2048
    # exact at 256² OOMed on hardware at pb>=1024 -> table caps it at 512.
    assert gsp._plan(256 * 256, 3, 256, 256, "exact") == 512
    # 512² runs with planned-down blocks in both modes.
    assert gsp._plan(512 * 512, 3, 512, 512, "exact") == 256
    assert gsp._plan(512 * 512, 3, 512, 512, "fast") == 512
    assert gsp.kernel_supported(3, 512 * 512, 512, 512, "exact")
    # Max-channel 512² is off-table and the model rejects every pb ->
    # decided jnp fallback.
    assert gsp._vmem_words(16, 512, 512, 128) > gsp.VMEM_BUDGET_WORDS
    assert not gsp.kernel_supported(16, 512 * 512, 512, 512)
    # The zeros-padding backward (reproject path) needs more Mosaic stack
    # than the border-probed caps (measured 16.28 MB > the 16 MB limit at
    # 128²/pb=2048) -> it plans on the conservative model, landing at 1024
    # (probed green on v5e, both precisions, 2026-08-17).
    assert gsp._plan(128 * 128, 3, 128, 128, "exact", zeros_bwd=True) == 1024
    assert gsp._plan(128 * 128, 3, 128, 128, "fast", zeros_bwd=True) == 1024


def test_large_image_planned_block_matches_jnp(rng):
    """Exercise a shape whose pixel block was actually shrunk by the VMEM
    planner (c=16 at 256² is off-table: the fitted model shrinks pb) end to
    end. Sampling an 8×256 output grid keeps interpret mode cheap while the
    *image* dims (which set the planner's estimate) stay at 256²."""
    c, h, w, ho, wo = 16, 256, 256, 8, 256
    pb = gsp._plan(ho * wo, c, h, w)
    assert pb < 2048, "shape no longer exercises the shrink path"
    assert gsp.kernel_supported(c, ho * wo, h, w)
    img = jnp.asarray(rng.standard_normal((1, h, w, c), dtype=np.float32))
    grid = jnp.asarray(rng.uniform(-1, 1, (1, ho, wo, 2)).astype(np.float32))
    ours = gsp.grid_sample(img, grid, interpret=INTERP)
    ref = sampling.grid_sample(img, grid, impl="jnp")
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.tpu
@pytest.mark.slow
def test_flow_warp_512_compiled_on_tpu(rng):
    """The 512² planned-down block compiles and matches jnp on hardware."""
    img = jnp.asarray(rng.standard_normal((1, 512, 512, 3), dtype=np.float32))
    flow = jnp.asarray(rng.uniform(-32, 32, (1, 512, 512, 2))
                       .astype(np.float32))
    ours = gsp.flow_warp(img, flow, interpret=False)
    ref = sampling.flow_warp(img, flow, impl="jnp")
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.tpu
def test_compiled_on_tpu_matches_jnp(rng):
    img, grid = _data(rng, n=2, h=64, w=64, c=3, ho=64, wo=64)
    ours = gsp.grid_sample(img, grid, interpret=False)
    ref = sampling.grid_sample(img, grid, impl="jnp")
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)

    def f(i, g):
        return jnp.sum(gsp.grid_sample(i, g, interpret=False) ** 2)

    def fr(i, g):
        return jnp.sum(sampling.grid_sample(i, g, impl="jnp") ** 2)

    d_o = jax.grad(f, argnums=(0, 1))(img, grid)
    d_r = jax.grad(fr, argnums=(0, 1))(img, grid)
    for a, b in zip(d_o, d_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-3)


def test_fast_precision_close_to_exact(rng):
    """'fast' mode (single-pass bf16 against exact one-hots) only loses the
    image's bf16 truncation — within ~1e-2 absolute on unit-scale data."""
    img, grid = _data(rng, n=1, h=16, w=16, ho=16, wo=16, spread=1.1)
    exact = gsp.grid_sample(img, grid, interpret=INTERP, precision="exact")
    fast = gsp.grid_sample(img, grid, interpret=INTERP, precision="fast")
    np.testing.assert_allclose(np.asarray(fast), np.asarray(exact),
                               rtol=2e-2, atol=2e-2)

    def loss(prec):
        def f(i, g):
            out = gsp.grid_sample(i, g, interpret=INTERP, precision=prec)
            return jnp.sum(out ** 2)
        return jax.grad(f, argnums=(0, 1))

    d_e = loss("exact")(img, grid)
    d_f = loss("fast")(img, grid)
    for a, b in zip(d_f, d_e):
        a, b = np.asarray(a), np.asarray(b)
        # bf16-relative: tolerance scales with the gradient's magnitude
        np.testing.assert_allclose(a, b, rtol=5e-2,
                                   atol=5e-3 * np.abs(b).max())


def test_fused_depth_reproject_matches_reference(rng):
    from dynamic_multiview_3d_tpu.kernels import reproject_pallas
    from dynamic_multiview_3d_tpu.ops import pose as pose_ops
    from dynamic_multiview_3d_tpu.ops import reproject as reproject_ops

    h = w = 16
    img = jnp.asarray(rng.standard_normal((2, h, w, 3), dtype=np.float32))
    depth = jnp.asarray(rng.uniform(1.5, 2.5, (2, h, w)).astype(np.float32))
    k = pose_ops.intrinsics_matrix(jnp.full((2,), 16.0), (w - 1) / 2,
                                   (h - 1) / 2)
    pa = jnp.asarray(rng.uniform(0.1, 1.0, (2, 3)).astype(np.float32)
                     + [0, 0, 1.5])
    pb_ = jnp.asarray(rng.uniform(0.1, 1.0, (2, 3)).astype(np.float32)
                      + [0, 0, 1.5])
    rel = pose_ops.relative_transform(pose_ops.look_at_extrinsics(pa),
                                      pose_ops.look_at_extrinsics(pb_))

    view_f, valid_f = reproject_pallas.depth_reproject_sample(
        img, depth, k, rel, INTERP)
    view_r, valid_r = reproject_ops.depth_reproject_sample(
        img, depth, k, rel, padding_mode="zeros", impl="jnp")
    np.testing.assert_allclose(np.asarray(valid_f), np.asarray(valid_r),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(view_f), np.asarray(view_r),
                               rtol=1e-4, atol=1e-4)

    # gradients (image + depth) flow and match the reference composition
    def loss(fn):
        def f(i, d):
            out, _ = fn(i, d)
            return jnp.sum(out ** 2)
        return jax.grad(f, argnums=(0, 1))

    g_f = loss(lambda i, d: reproject_pallas.depth_reproject_sample(
        i, d, k, rel, INTERP))(img, depth)
    g_r = loss(lambda i, d: reproject_ops.depth_reproject_sample(
        i, d, k, rel, padding_mode="zeros", impl="jnp"))(img, depth)
    for a, b in zip(g_f, g_r):
        a, b = np.asarray(a), np.asarray(b)
        # scale-aware: TPU division rounds differently at tap boundaries
        np.testing.assert_allclose(a, b, rtol=1e-3,
                                   atol=1e-4 * max(np.abs(b).max(), 1.0))


@pytest.mark.tpu
def test_fused_depth_reproject_compiled_on_tpu(rng):
    from dynamic_multiview_3d_tpu.kernels import reproject_pallas
    from dynamic_multiview_3d_tpu.ops import pose as pose_ops
    from dynamic_multiview_3d_tpu.ops import reproject as reproject_ops

    h = w = 64
    img = jnp.asarray(rng.standard_normal((2, h, w, 3), dtype=np.float32))
    depth = jnp.asarray(rng.uniform(1.5, 2.5, (2, h, w)).astype(np.float32))
    k = pose_ops.intrinsics_matrix(jnp.full((2,), 64.0), (w - 1) / 2,
                                   (h - 1) / 2)
    pa = jnp.asarray(rng.uniform(0.1, 1.0, (2, 3)).astype(np.float32)
                     + [0, 0, 1.5])
    pb_ = jnp.asarray(rng.uniform(0.1, 1.0, (2, 3)).astype(np.float32)
                      + [0, 0, 1.5])
    rel = pose_ops.relative_transform(pose_ops.look_at_extrinsics(pa),
                                      pose_ops.look_at_extrinsics(pb_))
    view_f, valid_f = reproject_pallas.depth_reproject_sample(
        img, depth, k, rel, False)
    view_r, valid_r = reproject_ops.depth_reproject_sample(
        img, depth, k, rel, padding_mode="zeros", impl="jnp")
    np.testing.assert_allclose(np.asarray(valid_f), np.asarray(valid_r),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(view_f), np.asarray(view_r),
                               rtol=1e-3, atol=1e-3)


@pytest.mark.parametrize("precision", ["exact", "fast"])
def test_flow_warp_composite_matches_unfused(rng, precision):
    """Fused warp+composite+validity kernel == the unfused jnp composition,
    forward and all four gradients (image, flow, mask, rgb)."""
    n, h, w, c = 2, 16, 16, 3
    img = jnp.asarray(rng.standard_normal((n, h, w, c), dtype=np.float32))
    flow = jnp.asarray(rng.uniform(-6, 6, (n, h, w, 2)).astype(np.float32))
    mask = jnp.asarray(rng.uniform(0.1, 0.9, (n, h, w, 1)).astype(np.float32))
    rgb = jnp.asarray(rng.standard_normal((n, h, w, c), dtype=np.float32))

    view_f, warped_f, valid_f = gsp.flow_warp_composite(
        img, flow, mask, rgb, interpret=INTERP, precision=precision)
    warped_r = sampling.flow_warp(img, flow, impl="jnp")
    valid_r = sampling.in_bounds_mask(flow, h, w)
    view_r = mask * warped_r + (1.0 - mask) * rgb
    tol = 1e-5 if precision == "exact" else 2e-2
    np.testing.assert_allclose(np.asarray(valid_f), np.asarray(valid_r),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(warped_f), np.asarray(warped_r),
                               rtol=tol, atol=tol)
    np.testing.assert_allclose(np.asarray(view_f), np.asarray(view_r),
                               rtol=tol, atol=tol)

    cot = jnp.asarray(rng.standard_normal((n, h, w, c), dtype=np.float32))

    def loss_fused(i, f, m, r):
        v, w_, _ = gsp.flow_warp_composite(i, f, m, r, interpret=INTERP,
                                           precision=precision)
        return jnp.sum(v * cot) + jnp.sum(w_ ** 2) * 0.1

    def loss_ref(i, f, m, r):
        w_ = sampling.flow_warp(i, f, impl="jnp")
        v = m * w_ + (1.0 - m) * r
        return jnp.sum(v * cot) + jnp.sum(w_ ** 2) * 0.1

    g_f = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(img, flow, mask, rgb)
    g_r = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(img, flow, mask, rgb)
    gtol = 1e-4 if precision == "exact" else 5e-2
    for a, b in zip(g_f, g_r):
        a, b = np.asarray(a), np.asarray(b)
        np.testing.assert_allclose(a, b, rtol=gtol,
                                   atol=gtol * max(np.abs(b).max(), 1.0))


def _depth_inputs(rng, n=2, h=16, w=16):
    from dynamic_multiview_3d_tpu.ops import pose as pose_ops
    img = jnp.asarray(rng.standard_normal((n, h, w, 3), dtype=np.float32))
    depth = jnp.asarray(rng.uniform(1.5, 2.5, (n, h, w)).astype(np.float32))
    k = pose_ops.intrinsics_matrix(jnp.full((n,), float(w)), (w - 1) / 2,
                                   (h - 1) / 2)
    pa = jnp.asarray(rng.uniform(0.1, 1.0, (n, 3)).astype(np.float32)
                     + [0, 0, 1.5])
    pb_ = jnp.asarray(rng.uniform(0.1, 1.0, (n, 3)).astype(np.float32)
                      + [0, 0, 1.5])
    rel = pose_ops.relative_transform(pose_ops.look_at_extrinsics(pa),
                                      pose_ops.look_at_extrinsics(pb_))
    return img, depth, k, rel


def test_depth_reproject_fast_close_to_exact(rng):
    """The depth kernel honors precision='fast' (VERDICT r2 #3): bf16
    truncation error only, forward and both gradients."""
    from dynamic_multiview_3d_tpu.kernels import reproject_pallas
    img, depth, k, rel = _depth_inputs(rng)
    v_e, _ = reproject_pallas.depth_reproject_sample(
        img, depth, k, rel, INTERP, "exact")
    v_f, _ = reproject_pallas.depth_reproject_sample(
        img, depth, k, rel, INTERP, "fast")
    np.testing.assert_allclose(np.asarray(v_f), np.asarray(v_e),
                               rtol=2e-2, atol=2e-2)

    def loss(precision):
        def f(i, d):
            out, _ = reproject_pallas.depth_reproject_sample(
                i, d, k, rel, INTERP, precision)
            return jnp.sum(out ** 2)
        return jax.grad(f, argnums=(0, 1))

    for a, b in zip(loss("fast")(img, depth), loss("exact")(img, depth)):
        a, b = np.asarray(a), np.asarray(b)
        np.testing.assert_allclose(a, b, rtol=5e-2,
                                   atol=5e-3 * max(np.abs(b).max(), 1.0))


@pytest.mark.parametrize("precision", ["exact", "fast"])
def test_depth_reproject_composite_matches_unfused(rng, precision):
    """Fused reproject+composite+validity (the depth twin of
    flow_warp_composite) == the unfused jnp composition, forward and all
    four gradients (image, depth, mask, rgb)."""
    from dynamic_multiview_3d_tpu.kernels import reproject_pallas
    from dynamic_multiview_3d_tpu.ops import reproject as reproject_ops
    n, h, w, c = 2, 16, 16, 3
    img, depth, k, rel = _depth_inputs(rng, n, h, w)
    mask = jnp.asarray(rng.uniform(0.1, 0.9, (n, h, w, 1)).astype(np.float32))
    rgb = jnp.asarray(rng.standard_normal((n, h, w, c), dtype=np.float32))

    view_f, geo_f, valid_f = reproject_pallas.depth_reproject_composite(
        img, depth, k, rel, mask, rgb, INTERP, precision)
    geo_r, valid_r = reproject_ops.depth_reproject_sample(
        img, depth, k, rel, padding_mode="zeros", impl="jnp")
    view_r = mask * geo_r + (1.0 - mask) * rgb
    tol = 1e-4 if precision == "exact" else 2e-2
    np.testing.assert_allclose(np.asarray(valid_f), np.asarray(valid_r),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(geo_f), np.asarray(geo_r),
                               rtol=tol, atol=tol)
    np.testing.assert_allclose(np.asarray(view_f), np.asarray(view_r),
                               rtol=tol, atol=tol)

    cot = jnp.asarray(rng.standard_normal((n, h, w, c), dtype=np.float32))

    def loss_fused(i, d, m, r):
        v, g, _ = reproject_pallas.depth_reproject_composite(
            i, d, k, rel, m, r, INTERP, precision)
        return jnp.sum(v * cot) + jnp.sum(g ** 2) * 0.1

    def loss_ref(i, d, m, r):
        g, _ = reproject_ops.depth_reproject_sample(
            i, d, k, rel, padding_mode="zeros", impl="jnp")
        v = m * g + (1.0 - m) * r
        return jnp.sum(v * cot) + jnp.sum(g ** 2) * 0.1

    g_f = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(img, depth, mask, rgb)
    g_r = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(img, depth, mask, rgb)
    gtol = 1e-3 if precision == "exact" else 5e-2
    for a, b in zip(g_f, g_r):
        a, b = np.asarray(a), np.asarray(b)
        np.testing.assert_allclose(a, b, rtol=gtol,
                                   atol=gtol * max(np.abs(b).max(), 1.0))

