"""Depth unprojection + reprojection layers (SURVEY.md R11 -> T2).

Given a depth map in the *target* camera, camera intrinsics, and the rigid
transform taking target-camera coords to source-camera coords, compute for
every target pixel its continuous source-pixel correspondence; sampling the
source image there synthesizes the target view geometrically.

All math is batched einsum/broadcast — XLA fuses it with the surrounding
graph; the sampling itself reuses grid_sample (Pallas-capable).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from dynamic_multiview_3d_tpu.ops import sampling as gs

# 3x3 projective matmuls in f32 regardless of backend default (bf16 on TPU).
_einsum = functools.partial(jnp.einsum, precision=jax.lax.Precision.HIGHEST)


def inv3x3(m: jnp.ndarray) -> jnp.ndarray:
    """Closed-form (adjugate) inverse of batched 3x3 matrices.

    Deliberately NOT ``jnp.linalg.inv``: on CPU that lowers to LAPACK FFI
    custom calls (``lapack_sgetrf_ffi``/``lapack_strsm_ffi``) whose
    handlers jaxlib registers only when a linalg op is traced live in the
    process — a ``jax.export`` artifact carrying them SEGFAULTS in a fresh
    "jax + numpy only" serving process (pre-existing bug found in round 5;
    regression-guarded by test_serving.py's custom-call scan). The
    adjugate form is pure arithmetic — custom-call-free on every backend —
    and a handful of FMAs beats a batched LU for camera matrices anyway.
    """
    a, b, c = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    d, e, f = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    g, h, i = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    co_a = e * i - f * h
    co_b = f * g - d * i
    co_c = d * h - e * g
    det = a * co_a + b * co_b + c * co_c
    adj = jnp.stack([
        jnp.stack([co_a, c * h - b * i, b * f - c * e], -1),
        jnp.stack([co_b, a * i - c * g, c * d - a * f], -1),
        jnp.stack([co_c, b * g - a * h, a * e - b * d], -1),
    ], -2)
    return adj / det[..., None, None]


def reproject_coords(depth: jnp.ndarray, intrinsics: jnp.ndarray,
                     t_tgt2src: jnp.ndarray, eps: float = 1e-6
                     ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Pixel correspondences from target view into source view.

    depth      [N, H, W]     — depth along +z in the target camera
    intrinsics [N, 3, 3]     — shared pinhole K for both views
    t_tgt2src  [N, 4, 4]     — rigid transform target-cam -> source-cam

    Returns (coords [N, H, W, 2] continuous source pixels (x, y),
             valid  [N, H, W]   1.0 where reprojected depth > eps).
    """
    n, h, w = depth.shape
    grid = gs.base_grid(h, w, dtype=depth.dtype)                 # [H, W, 2]
    ones = jnp.ones((h, w, 1), depth.dtype)
    pix_h = jnp.concatenate([grid, ones], axis=-1)               # [H, W, 3]

    k_inv = inv3x3(intrinsics)                                   # [N, 3, 3]
    rays = _einsum("nij,hwj->nhwi", k_inv, pix_h)             # [N, H, W, 3]
    pts_tgt = rays * depth[..., None]                            # X_tgt

    rot = t_tgt2src[:, :3, :3]
    trans = t_tgt2src[:, :3, 3]
    pts_src = _einsum("nij,nhwj->nhwi", rot, pts_tgt) + trans[:, None, None]

    z = pts_src[..., 2]
    valid = (z > eps).astype(depth.dtype)
    z_safe = jnp.where(z > eps, z, jnp.ones_like(z))
    proj = _einsum("nij,nhwj->nhwi", intrinsics, pts_src / z_safe[..., None])
    return proj[..., :2], valid


def depth_reproject_sample(src_image: jnp.ndarray, depth: jnp.ndarray,
                           intrinsics: jnp.ndarray, t_tgt2src: jnp.ndarray, *,
                           padding_mode: str = "zeros", impl: str = "jnp",
                           precision: str = "exact"
                           ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Synthesize the target view by sampling ``src_image`` at reprojections.

    src_image [N, H, W, C]; returns (view [N, H, W, C], valid [N, H, W]).
    Differentiable in depth (and image) — usable as a training-time layer.
    """
    n, h, w, _ = src_image.shape
    coords, valid = reproject_coords(depth, intrinsics, t_tgt2src)
    grid = gs.normalize_coords(coords, h, w, align_corners=True)
    out = gs.grid_sample(src_image, grid, align_corners=True,
                         padding_mode=padding_mode, impl=impl,
                         precision=precision)
    return out * valid[..., None].astype(out.dtype), valid
