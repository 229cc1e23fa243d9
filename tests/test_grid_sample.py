"""grid_sample / flow_warp vs the torch CPU oracle (SURVEY.md §4.1-§4.2)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from dynamic_multiview_3d_tpu.ops import sampling as gs


def _torch_grid_sample(img_nhwc, grid, align_corners, padding_mode):
    t_img = torch.from_numpy(np.transpose(img_nhwc, (0, 3, 1, 2)))
    t_grid = torch.from_numpy(grid)
    out = F.grid_sample(t_img, t_grid, mode="bilinear",
                        padding_mode=padding_mode, align_corners=align_corners)
    return np.transpose(out.numpy(), (0, 2, 3, 1))


@pytest.mark.parametrize("align_corners", [True, False])
@pytest.mark.parametrize("padding_mode", ["zeros", "border"])
def test_matches_torch_forward(rng, align_corners, padding_mode):
    img = rng.standard_normal((2, 13, 17, 3), dtype=np.float32)
    # Include well-out-of-bounds coords to exercise padding.
    grid = rng.uniform(-1.5, 1.5, size=(2, 9, 11, 2)).astype(np.float32)
    ours = gs.grid_sample(jnp.asarray(img), jnp.asarray(grid),
                          align_corners=align_corners,
                          padding_mode=padding_mode)
    ref = _torch_grid_sample(img, grid, align_corners, padding_mode)
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("align_corners", [True, False])
def test_matches_torch_gradients(rng, align_corners):
    img = rng.standard_normal((1, 8, 8, 2), dtype=np.float32)
    grid = rng.uniform(-0.9, 0.9, size=(1, 6, 6, 2)).astype(np.float32)
    cot = rng.standard_normal((1, 6, 6, 2), dtype=np.float32)

    def loss(i, g):
        out = gs.grid_sample(i, g, align_corners=align_corners,
                             padding_mode="zeros")
        return jnp.sum(out * jnp.asarray(cot))

    d_img, d_grid = jax.grad(loss, argnums=(0, 1))(
        jnp.asarray(img), jnp.asarray(grid))

    t_img = torch.from_numpy(np.transpose(img, (0, 3, 1, 2))).requires_grad_()
    t_grid = torch.from_numpy(grid).requires_grad_()
    out = F.grid_sample(t_img, t_grid, mode="bilinear", padding_mode="zeros",
                        align_corners=align_corners)
    out.backward(torch.from_numpy(np.transpose(cot, (0, 3, 1, 2))))
    ref_d_img = np.transpose(t_img.grad.numpy(), (0, 2, 3, 1))

    np.testing.assert_allclose(np.asarray(d_img), ref_d_img,
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(d_grid), t_grid.grad.numpy(),
                               rtol=1e-4, atol=1e-5)


def test_identity_grid_is_identity(rng):
    img = rng.standard_normal((1, 12, 16, 3), dtype=np.float32)
    grid = gs.normalize_coords(gs.base_grid(12, 16), 12, 16,
                               align_corners=True)[None]
    out = gs.grid_sample(jnp.asarray(img), grid, align_corners=True)
    np.testing.assert_allclose(np.asarray(out), img, rtol=1e-5, atol=1e-5)


def test_zero_flow_warp_is_identity(rng):
    img = rng.standard_normal((2, 16, 16, 3), dtype=np.float32)
    flow = np.zeros((2, 16, 16, 2), dtype=np.float32)
    out = gs.flow_warp(jnp.asarray(img), jnp.asarray(flow))
    np.testing.assert_allclose(np.asarray(out), img, rtol=1e-5, atol=1e-5)


def test_constant_image_warp_is_constant(rng):
    img = np.full((1, 16, 16, 1), 0.7, dtype=np.float32)
    flow = rng.uniform(-3, 3, size=(1, 16, 16, 2)).astype(np.float32)
    out = gs.flow_warp(jnp.asarray(img), jnp.asarray(flow),
                       padding_mode="border")
    np.testing.assert_allclose(np.asarray(out), img, rtol=1e-5, atol=1e-5)


def test_integer_shift_flow(rng):
    img = rng.standard_normal((1, 8, 8, 1), dtype=np.float32)
    flow = np.zeros((1, 8, 8, 2), dtype=np.float32)
    flow[..., 0] = 2.0  # sample 2 px to the right
    out = np.asarray(gs.flow_warp(jnp.asarray(img), jnp.asarray(flow),
                                  padding_mode="border"))
    np.testing.assert_allclose(out[0, :, :6, 0], img[0, :, 2:, 0],
                               rtol=1e-5, atol=1e-5)


def test_grid_gradient_matches_finite_differences(rng):
    img = jnp.asarray(rng.standard_normal((1, 10, 10, 1), dtype=np.float32))
    grid = jnp.asarray(rng.uniform(-0.7, 0.7, size=(1, 4, 4, 2))
                       .astype(np.float32))

    def f(g):
        return jnp.sum(gs.grid_sample(img, g, align_corners=True) ** 2)

    grad = np.asarray(jax.grad(f)(grid))
    eps = 1e-3
    for idx in [(0, 0, 0, 0), (0, 1, 2, 1), (0, 3, 3, 0)]:
        g_plus = grid.at[idx].add(eps)
        g_minus = grid.at[idx].add(-eps)
        fd = (f(g_plus) - f(g_minus)) / (2 * eps)
        np.testing.assert_allclose(grad[idx], fd, rtol=2e-2, atol=1e-3)


def test_in_bounds_mask():
    flow = np.zeros((1, 4, 4, 2), dtype=np.float32)
    flow[0, 0, 0] = [-1.0, 0.0]   # x -> -1: out
    flow[0, 3, 3] = [0.0, 0.5]    # y -> 3.5: out (max is 3)
    mask = np.asarray(gs.in_bounds_mask(jnp.asarray(flow), 4, 4))
    assert mask[0, 0, 0] == 0.0
    assert mask[0, 3, 3] == 0.0
    assert mask[0, 1, 1] == 1.0


def test_odd_size_routes_to_jnp_not_single_block(rng):
    """Non-128-multiple pixel counts above MAX_SINGLE_BLOCK_PIXELS must fall
    back to the jnp path instead of compiling the whole output as ONE Pallas
    block (VMEM hazard — round-1 review). 130*98=12740 is such a shape."""
    from dynamic_multiview_3d_tpu.kernels import grid_sample_pallas as gsp

    assert not gsp.kernel_supported(3, 130 * 98)
    assert gsp.kernel_supported(3, 128 * 128)       # 128-multiple: fine
    assert gsp.kernel_supported(3, 33 * 33)         # small single block: fine
    assert not gsp.kernel_supported(99, 128 * 128)  # channel cap still holds

    img = rng.standard_normal((1, 64, 64, 3), dtype=np.float32)
    grid = rng.uniform(-1, 1, size=(1, 130, 98, 2)).astype(np.float32)
    # The pallas wrapper must produce the jnp result (fallback), regardless
    # of backend.
    out_pallas_api = gsp.grid_sample(jnp.asarray(img), jnp.asarray(grid))
    out_jnp = gs.grid_sample(jnp.asarray(img), jnp.asarray(grid))
    np.testing.assert_allclose(np.asarray(out_pallas_api),
                               np.asarray(out_jnp), rtol=1e-6, atol=1e-6)
