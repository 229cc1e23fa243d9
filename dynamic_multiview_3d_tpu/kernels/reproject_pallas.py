"""Fused Pallas depth-reprojection sampling (SURVEY.md R11 -> T0).

The geometric synthesis path computes, per target pixel (u, v) with predicted
depth d, its source-view correspondence and bilinearly samples there. The
whole chain fuses into ONE kernel: with M = K R K^-1 and m = K t
(precomputed per batch on host/XLA, 12 scalars),

    q  = d * (M @ [u, v, 1]) + m          # 9 FMAs on the VPU
    ix = q.x / q.z,  iy = q.y / q.z       # valid iff q.z > eps
    out = bilinear_sample(src, ix, iy)    # same one-hot-MXU body as the
                                          # flow-warp kernel

so the correspondence field is never materialized in HBM. Invalid pixels
(behind the source camera) sample at a far-out coordinate -> zeros padding
returns 0, matching ops.reproject.depth_reproject_sample's `out * valid`.

VJP: gradients flow to the image and the depth (the trainable quantities) by
differentiating the jnp reference composition — the fused kernel is a
forward-speed optimization, and the reference path is oracle-verified.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dynamic_multiview_3d_tpu.kernels import grid_sample_pallas as gsp

_EPS = 1e-6
_FAR = -1e6   # coordinate guaranteed to sample as 0 under zeros padding


def _fused_kernel(params_ref, depth_ref, img_ref, out_ref, valid_ref, *,
                  channels, h, w, pb):
    # params: [1, 1, 12] SMEM scalars = rows of M (9) then m (3).
    m = [params_ref[0, 0, i] for i in range(9)]
    t = [params_ref[0, 0, 9 + i] for i in range(3)]

    base = pl.program_id(1) * pb
    idx = base + jax.lax.broadcasted_iota(jnp.int32, (1, pb), 1)
    u = (idx % w).astype(jnp.float32)                     # [1, P]
    v = (idx // w).astype(jnp.float32)
    d = depth_ref[0, 0]                                   # [1, P]

    qx = d * (m[0] * u + m[1] * v + m[2]) + t[0]
    qy = d * (m[3] * u + m[4] * v + m[5]) + t[1]
    qz = d * (m[6] * u + m[7] * v + m[8]) + t[2]
    valid = qz > _EPS
    qz_safe = jnp.where(valid, qz, 1.0)
    ix = jnp.where(valid, qx / qz_safe, _FAR)
    iy = jnp.where(valid, qy / qz_safe, _FAR)
    valid_ref[0, 0] = valid.astype(jnp.float32)

    wy_t, _ = gsp._weights_t(iy, h, "zeros")              # [H, P]
    wx_t, _ = gsp._weights_t(ix, w, "zeros")              # [W, P]
    for c in range(channels):
        tmp_t = gsp._contract_first(img_ref[0, c], wy_t)  # [W, P]
        out_ref[0, c, 0] = jnp.sum(tmp_t * wx_t, axis=0, keepdims=True)


def _host_params(intrinsics, t_tgt2src):
    """[N, 12]: M = K R K^-1 (row-major 9) then m = K t (3)."""
    k_inv = jnp.linalg.inv(intrinsics)
    rot = t_tgt2src[:, :3, :3]
    trans = t_tgt2src[:, :3, 3]
    m = jnp.einsum("nij,njk,nkl->nil", intrinsics, rot, k_inv,
                   precision=jax.lax.Precision.HIGHEST)
    mt = jnp.einsum("nij,nj->ni", intrinsics, trans,
                    precision=jax.lax.Precision.HIGHEST)
    return jnp.concatenate([m.reshape(-1, 9), mt], axis=-1)


def _call_fused(img_nchw, depth, params, interpret):
    n, c, h, w = img_nchw.shape
    total = h * w
    pb = gsp._plan(total)
    nb = total // pb
    depth4 = depth.reshape(n, nb, 1, pb)
    kernel = functools.partial(_fused_kernel, channels=c, h=h, w=w, pb=pb)
    out, valid = pl.pallas_call(
        kernel,
        grid=(n, nb),
        in_specs=[
            pl.BlockSpec((1, 1, 12), lambda ni, bi: (ni, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 1, pb), lambda ni, bi: (ni, bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c, h, w), lambda ni, bi: (ni, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, c, 1, 1, pb), lambda ni, bi: (ni, 0, bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, pb), lambda ni, bi: (ni, bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, c, nb, 1, pb), jnp.float32),
            jax.ShapeDtypeStruct((n, nb, 1, pb), jnp.float32),
        ],
        interpret=interpret,
    )(params.reshape(-1, 1, 12), depth4, img_nchw)
    return out.reshape(n, c, total), valid.reshape(n, total)


def _reference(img_nhwc, depth, intrinsics, t_tgt2src):
    from dynamic_multiview_3d_tpu.ops import reproject as reproject_ops
    out, valid = reproject_ops.depth_reproject_sample(
        img_nhwc, depth, intrinsics, t_tgt2src, padding_mode="zeros",
        impl="jnp")
    return out, valid


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def depth_reproject_sample(img_nhwc, depth, intrinsics, t_tgt2src,
                           interpret=False):
    """Fused geometric synthesis: (view [N,H,W,C], valid [N,H,W]).

    Same semantics as ops.reproject.depth_reproject_sample (zeros padding).
    """
    n, h, w, c = img_nhwc.shape
    if not gsp.kernel_supported(c):
        return _reference(img_nhwc, depth, intrinsics, t_tgt2src)
    params = _host_params(intrinsics.astype(jnp.float32),
                          t_tgt2src.astype(jnp.float32))
    img_nchw = jnp.transpose(img_nhwc.astype(jnp.float32), (0, 3, 1, 2))
    out, valid = _call_fused(img_nchw, depth.reshape(n, h * w), params,
                             interpret)
    view = jnp.transpose(out.reshape(n, c, h, w), (0, 2, 3, 1))
    valid = valid.reshape(n, h, w)
    return view.astype(img_nhwc.dtype) * valid[..., None], valid


def _fwd(img, depth, intrinsics, t_tgt2src, interpret):
    out = depth_reproject_sample(img, depth, intrinsics, t_tgt2src, interpret)
    return out, (img, depth, intrinsics, t_tgt2src)


def _bwd(interpret, res, cotangents):
    img, depth, intrinsics, t = res
    d_view, d_valid = cotangents
    # Differentiate the (oracle-verified) reference composition; `valid` is a
    # step function -> zero gradient, matching the reference path.
    _, vjp = jax.vjp(
        lambda i, d, k, tt: _reference(i, d, k, tt)[0], img, depth,
        intrinsics, t)
    return vjp(d_view)


depth_reproject_sample.defvjp(_fwd, _bwd)
