"""Differentiable bilinear grid sampling + appearance-flow warp (SURVEY.md R9/R10).

This is the pure-jax.numpy correctness reference (gather-based; XLA lowers the
indexing to its native gather/scatter, which is already fast on TPU). The
Pallas one-hot-MXU implementation in ``kernels/grid_sample_pallas.py`` is
bit-compared against this in tests and selected with ``impl='pallas'``.

Conventions (chosen to match ``torch.nn.functional.grid_sample``, which tests
use as the numerical oracle — torch installed CPU-only per SURVEY.md §2d):
- images are NHWC (TPU-native layout)
- ``grid`` holds normalized (x, y) in [-1, 1]; x indexes width, y height
- ``align_corners=True``: -1/+1 map to corner pixel *centers* (TF1
  ``tf.contrib.resampler`` era behavior); ``False``: torch default mapping
- ``padding_mode``: "zeros" (out-of-bounds reads 0) or "border" (clamp)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def base_grid(height: int, width: int, dtype=jnp.float32) -> jnp.ndarray:
    """Identity pixel-coordinate grid [H, W, 2] holding (x, y)."""
    ys = jnp.arange(height, dtype=dtype)
    xs = jnp.arange(width, dtype=dtype)
    grid_y, grid_x = jnp.meshgrid(ys, xs, indexing="ij")
    return jnp.stack([grid_x, grid_y], axis=-1)


def normalize_coords(pix: jnp.ndarray, height: int, width: int,
                     align_corners: bool = True) -> jnp.ndarray:
    """Pixel (x, y) -> normalized [-1, 1] (x, y)."""
    x, y = pix[..., 0], pix[..., 1]
    if align_corners:
        x = 2.0 * x / (width - 1) - 1.0
        y = 2.0 * y / (height - 1) - 1.0
    else:
        x = (2.0 * x + 1.0) / width - 1.0
        y = (2.0 * y + 1.0) / height - 1.0
    return jnp.stack([x, y], axis=-1)


def unnormalize_coords(grid: jnp.ndarray, height: int, width: int,
                       align_corners: bool) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Normalized grid -> continuous source pixel coords (ix, iy)."""
    x, y = grid[..., 0], grid[..., 1]
    if align_corners:
        ix = (x + 1.0) * 0.5 * (width - 1)
        iy = (y + 1.0) * 0.5 * (height - 1)
    else:
        ix = ((x + 1.0) * width - 1.0) * 0.5
        iy = ((y + 1.0) * height - 1.0) * 0.5
    return ix, iy


@functools.partial(jax.jit, static_argnames=("align_corners", "padding_mode"))
def _grid_sample_jnp(image: jnp.ndarray, grid: jnp.ndarray,
                     align_corners: bool, padding_mode: str) -> jnp.ndarray:
    n, h, w, c = image.shape
    ix, iy = unnormalize_coords(grid.astype(jnp.float32), h, w, align_corners)

    x0 = jnp.floor(ix)
    y0 = jnp.floor(iy)
    x1, y1 = x0 + 1.0, y0 + 1.0

    # Bilinear weights.
    wx1 = ix - x0
    wy1 = iy - y0
    wx0 = 1.0 - wx1
    wy0 = 1.0 - wy1

    def gather(xi, yi):
        xc = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        yc = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        batch = jnp.arange(n).reshape((n,) + (1,) * (grid.ndim - 2))
        vals = image[batch, yc, xc]                      # [N, ..., C]
        if padding_mode == "zeros":
            inside = ((xi >= 0) & (xi <= w - 1) & (yi >= 0) & (yi <= h - 1))
            vals = vals * inside[..., None].astype(vals.dtype)
        return vals

    out = (
        gather(x0, y0) * (wx0 * wy0)[..., None]
        + gather(x1, y0) * (wx1 * wy0)[..., None]
        + gather(x0, y1) * (wx0 * wy1)[..., None]
        + gather(x1, y1) * (wx1 * wy1)[..., None]
    )
    return out.astype(image.dtype)


def grid_sample(image: jnp.ndarray, grid: jnp.ndarray, *,
                align_corners: bool = True, padding_mode: str = "zeros",
                impl: str = "jnp", precision: str = "exact") -> jnp.ndarray:
    """Bilinear sample ``image`` [N,H,W,C] at normalized ``grid`` [N,Ho,Wo,2].

    Fully differentiable in both ``image`` and ``grid``. ``impl='pallas'``
    dispatches to the TPU kernel (kernels/grid_sample_pallas.py).
    """
    if padding_mode not in ("zeros", "border"):
        raise ValueError(f"unknown padding_mode: {padding_mode}")
    if impl == "pallas":
        from dynamic_multiview_3d_tpu.kernels import grid_sample_pallas
        return grid_sample_pallas.grid_sample(
            image, grid, align_corners=align_corners,
            padding_mode=padding_mode, precision=precision)
    return _grid_sample_jnp(image, grid, align_corners, padding_mode)


def grid_sample_nchw(image: jnp.ndarray, grid: jnp.ndarray, **kw) -> jnp.ndarray:
    """Torch-layout convenience wrapper: image [N,C,H,W] -> out [N,C,Ho,Wo]."""
    out = grid_sample(jnp.transpose(image, (0, 2, 3, 1)), grid, **kw)
    return jnp.transpose(out, (0, 3, 1, 2))


def flow_warp(image: jnp.ndarray, flow: jnp.ndarray, *,
              padding_mode: str = "border", impl: str = "jnp",
              precision: str = "exact") -> jnp.ndarray:
    """Appearance-flow warp: sample ``image`` at (base grid + flow) pixels.

    image [N,H,W,C]; flow [N,H,W,2] in *pixel* displacement units (x, y).
    out(p) = image(p + flow(p)), bilinear. This is the decoder's warp head
    (SURVEY.md R9): the model predicts flow, the warp resamples the source.
    """
    if impl == "pallas":
        from dynamic_multiview_3d_tpu.kernels import grid_sample_pallas
        return grid_sample_pallas.flow_warp(image, flow,
                                            padding_mode=padding_mode,
                                            precision=precision)
    n, h, w, _ = image.shape
    coords = base_grid(h, w, dtype=jnp.float32)[None] + flow.astype(jnp.float32)
    grid = normalize_coords(coords, h, w, align_corners=True)
    return grid_sample(image, grid, align_corners=True,
                       padding_mode=padding_mode, impl=impl)


def in_bounds_mask(flow: jnp.ndarray, height: int, width: int) -> jnp.ndarray:
    """1.0 where base+flow lands inside the image — supervises the mask head."""
    coords = base_grid(height, width, dtype=flow.dtype)[None] + flow
    x, y = coords[..., 0], coords[..., 1]
    inside = ((x >= 0) & (x <= width - 1) & (y >= 0) & (y <= height - 1))
    return inside.astype(flow.dtype)
