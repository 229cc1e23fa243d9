"""Camera pose encoding + extrinsics/intrinsics math (SURVEY.md R3 -> T2).

The reference (TF1-era, BASELINE.json:5) encodes ShapeNet-style camera poses
(azimuth, elevation, radius) for conditioning the bottleneck; we support both
the classic sin/cos angle encoding and flattened-extrinsics encoding, plus the
full 4x4 camera math needed by the depth-reprojection path (R11).

Conventions:
- pose vector: ``[azimuth, elevation, radius]`` (radians, radians, world units)
- extrinsics: world->camera, right-handed, camera looks down +z (OpenCV style)
- all functions broadcast over leading batch dims and are jit/vmap-safe.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# Camera math is tiny (3x3/4x4) but precision-critical: force f32 matmuls —
# the default matmul precision on TPU (and this jaxlib's CPU path) is bf16.
_einsum = functools.partial(jnp.einsum, precision=jax.lax.Precision.HIGHEST)


def pose_to_features(pose: jnp.ndarray) -> jnp.ndarray:
    """(az, el, r) -> (sin az, cos az, sin el, cos el, r). [..., 3] -> [..., 5]."""
    az, el, r = pose[..., 0], pose[..., 1], pose[..., 2]
    return jnp.stack(
        [jnp.sin(az), jnp.cos(az), jnp.sin(el), jnp.cos(el), r], axis=-1
    )


def encode_view_pair(src_pose: jnp.ndarray, tgt_pose: jnp.ndarray) -> jnp.ndarray:
    """Relative view-change encoding used to condition the bottleneck.

    Azimuth enters as a *difference* (the synthesis task is equivariant to a
    global azimuth rotation of ShapeNet-style turntable data); elevation and
    radius enter absolutely for both views. [..., 3] x2 -> [..., 8].
    """
    d_az = tgt_pose[..., 0] - src_pose[..., 0]
    return jnp.stack(
        [
            jnp.sin(d_az), jnp.cos(d_az),
            jnp.sin(src_pose[..., 1]), jnp.cos(src_pose[..., 1]),
            jnp.sin(tgt_pose[..., 1]), jnp.cos(tgt_pose[..., 1]),
            src_pose[..., 2], tgt_pose[..., 2],
        ],
        axis=-1,
    )


def encode_pose(src_pose: jnp.ndarray, tgt_pose: jnp.ndarray,
                mode: str = "sincos") -> jnp.ndarray:
    """Pose conditioning feature for the bottleneck.

    mode="sincos": relative angle encoding (8 dims).
    mode="mat":    flattened relative extrinsics tgt->src (12 dims, top 3x4).
    """
    if mode == "sincos":
        return encode_view_pair(src_pose, tgt_pose)
    if mode == "mat":
        t_src = look_at_extrinsics(src_pose)
        t_tgt = look_at_extrinsics(tgt_pose)
        rel = relative_transform(t_src, t_tgt)          # tgt cam -> src cam
        return rel[..., :3, :].reshape(*rel.shape[:-2], 12)
    raise ValueError(f"unknown pose mode: {mode}")


def look_at_extrinsics(pose: jnp.ndarray, center: jnp.ndarray | None = None
                       ) -> jnp.ndarray:
    """World->camera 4x4 for a camera on a sphere looking at ``center``.

    pose [..., 3] = (azimuth, elevation, radius). Camera +z points at the
    center (OpenCV), +x right, +y down. Returns [..., 4, 4].
    """
    az, el, r = pose[..., 0], pose[..., 1], pose[..., 2]
    cos_el, sin_el = jnp.cos(el), jnp.sin(el)
    eye = jnp.stack(
        [r * cos_el * jnp.cos(az), r * cos_el * jnp.sin(az), r * sin_el],
        axis=-1,
    )
    if center is not None:
        eye = eye + center
    else:
        center = jnp.zeros_like(eye)

    fwd = center - eye
    fwd = fwd / (jnp.linalg.norm(fwd, axis=-1, keepdims=True) + 1e-9)
    world_up = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0], fwd.dtype), fwd.shape)
    right = jnp.cross(fwd, world_up)
    right = right / (jnp.linalg.norm(right, axis=-1, keepdims=True) + 1e-9)
    down = jnp.cross(fwd, right)  # +y down so K projects with v growing downward

    rot = jnp.stack([right, down, fwd], axis=-2)            # [..., 3, 3] rows
    trans = -_einsum("...ij,...j->...i", rot, eye)          # [..., 3]
    top = jnp.concatenate([rot, trans[..., :, None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], pose.dtype), top.shape[:-2] + (1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def intrinsics_matrix(focal, cx, cy, dtype=jnp.float32) -> jnp.ndarray:
    """Pinhole K [..., 3, 3] from (broadcastable) focal length + principal point."""
    focal = jnp.asarray(focal, dtype)
    cx = jnp.broadcast_to(jnp.asarray(cx, dtype), focal.shape)
    cy = jnp.broadcast_to(jnp.asarray(cy, dtype), focal.shape)
    zero = jnp.zeros_like(focal)
    one = jnp.ones_like(focal)
    rows = [
        jnp.stack([focal, zero, cx], axis=-1),
        jnp.stack([zero, focal, cy], axis=-1),
        jnp.stack([zero, zero, one], axis=-1),
    ]
    return jnp.stack(rows, axis=-2)


def relative_transform(t_src_w2c: jnp.ndarray, t_tgt_w2c: jnp.ndarray
                       ) -> jnp.ndarray:
    """Transform taking target-camera coords to source-camera coords.

    X_src = T_rel @ X_tgt with T_rel = T_src_w2c @ inv(T_tgt_w2c). Uses the
    closed-form rigid inverse (R^T, -R^T t) — no general 4x4 solve.
    """
    r_tgt = t_tgt_w2c[..., :3, :3]
    t_tgt = t_tgt_w2c[..., :3, 3]
    r_inv = jnp.swapaxes(r_tgt, -1, -2)
    t_inv = -_einsum("...ij,...j->...i", r_inv, t_tgt)
    inv_top = jnp.concatenate([r_inv, t_inv[..., :, None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], t_tgt_w2c.dtype),
        inv_top.shape[:-2] + (1, 4),
    )
    t_tgt_inv = jnp.concatenate([inv_top, bottom], axis=-2)
    return _einsum("...ij,...jk->...ik", t_src_w2c, t_tgt_inv)
