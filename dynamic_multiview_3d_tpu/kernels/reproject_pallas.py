"""Fused Pallas depth-reprojection sampling (SURVEY.md R11 -> T0).

The geometric synthesis path computes, per target pixel (u, v) with predicted
depth d, its source-view correspondence and bilinearly samples there. The
whole chain fuses into ONE kernel: with M = K R K^-1 and m = K t
(precomputed per batch on host/XLA, 12 scalars),

    q  = d * (M @ [u, v, 1]) + m          # 9 FMAs on the VPU
    ix = q.x / q.z,  iy = q.y / q.z       # valid iff q.z > eps
    out = bilinear_sample(src, ix, iy)    # same tent-MXU body as the
                                          # flow-warp kernel

so the correspondence field is never materialized in HBM. Invalid pixels
(behind the source camera) sample at a far-out coordinate -> zeros padding
returns 0, matching ops.reproject.depth_reproject_sample's `out * valid`.

Round 3 brings this kernel to flow-path parity (VERDICT r2 #3):

- both entry points honor ``precision`` ("exact" = 3-pass f32 MXU dots,
  "fast" = single-pass bf16 matmuls with f32 accumulate — the same
  ``_sample_rows`` body the flow kernel uses), forward AND backward;
- ``depth_reproject_composite`` additionally fuses the model's compositing
  (mask*geo + (1-mask)*rgb) into the same kernel, exactly as
  ``flow_warp_composite`` does for the flow path, so depth-mode synthesis
  also never round-trips HBM between heads, warp and composite.

VJP: the backward reuses the flow-warp kernel's Pallas backward
(grid_sample_pallas._call_bwd) for d_image and the pixel-coordinate
cotangents, then chain-rules those to the depth analytically:

    a  = M @ [u, v, 1]                    # d q / d depth
    d ix / dd = (a.x q.z - q.x a.z) / q.z^2   (same for iy)

Camera parameters (K, T) receive zero cotangents — they are fixed inputs in
this model family, never trained. Gradients are tested against the jnp
reference composition.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dynamic_multiview_3d_tpu.kernels import grid_sample_pallas as gsp
from dynamic_multiview_3d_tpu.ops import reproject as reproject_ops

_EPS = 1e-6
_FAR = -1e6   # coordinate guaranteed to sample as 0 under zeros padding


def _correspondence(params_ref, depth_ref, *, w, pb):
    """In-kernel coordinate math: (ix, iy, valid) rows, each [1, P]."""
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
    return ix, iy, valid.astype(jnp.float32)


def _fused_kernel(params_ref, depth_ref, img_ref, out_ref, valid_ref, *,
                  channels, h, w, pb, mode):
    ix, iy, valid = _correspondence(params_ref, depth_ref, w=w, pb=pb)
    valid_ref[0, 0] = valid
    for c, val in gsp._sample_rows(ix, iy, lambda c: img_ref[0, c],
                                   channels=channels, h=h,
                                   w=w, padding_mode="zeros", mode=mode):
        out_ref[0, c, 0] = val


def _fused_composite_kernel(params_ref, depth_ref, img_ref, mask_ref,
                            rgb_ref, view_ref, geo_ref, valid_ref, *,
                            channels, h, w, pb, mode):
    """Correspondence + sample + masked composite in one kernel:
    geo = sample * valid;  view = mask * geo + (1-mask) * rgb."""
    ix, iy, valid = _correspondence(params_ref, depth_ref, w=w, pb=pb)
    valid_ref[0, 0] = valid
    m = mask_ref[0, 0]                                    # [1, P]
    for c, val in gsp._sample_rows(ix, iy, lambda c: img_ref[0, c],
                                   channels=channels, h=h,
                                   w=w, padding_mode="zeros", mode=mode):
        geo = val * valid
        geo_ref[0, c, 0] = geo
        view_ref[0, c, 0] = m * geo + (1.0 - m) * rgb_ref[0, c, 0]


def _host_params(intrinsics, t_tgt2src):
    """[N, 12]: M = K R K^-1 (row-major 9) then m = K t (3)."""
    # closed-form inverse: keeps exported modules LAPACK-custom-call-free
    # (see ops/reproject.inv3x3 for the serving segfault this avoids)
    k_inv = reproject_ops.inv3x3(intrinsics)
    rot = t_tgt2src[:, :3, :3]
    trans = t_tgt2src[:, :3, 3]
    m = jnp.einsum("nij,njk,nkl->nil", intrinsics, rot, k_inv,
                   precision=jax.lax.Precision.HIGHEST)
    mt = jnp.einsum("nij,nj->ni", intrinsics, trans,
                    precision=jax.lax.Precision.HIGHEST)
    return jnp.concatenate([m.reshape(-1, 9), mt], axis=-1)


def _call_fused(img_nchw, depth, params, interpret, mode):
    n, c, h, w = img_nchw.shape
    total = h * w
    pb = gsp._plan(total, c, h, w, mode)
    nb = total // pb
    depth4 = depth.reshape(n, nb, 1, pb)
    kernel = functools.partial(_fused_kernel, channels=c, h=h, w=w, pb=pb,
                               mode=mode)
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


def _call_fused_composite(img_nchw, depth, params, mask, rgb_ncp, interpret,
                          mode):
    """mask [N, P], rgb [N, C, P] -> (view, geo [N,C,P], valid [N,P])."""
    n, c, h, w = img_nchw.shape
    total = h * w
    pb = gsp._plan(total, c, h, w, mode)
    nb = total // pb
    depth4 = depth.reshape(n, nb, 1, pb)
    mask4 = mask.reshape(n, nb, 1, pb)
    rgb5 = rgb_ncp.reshape(n, c, nb, 1, pb)
    kernel = functools.partial(_fused_composite_kernel, channels=c, h=h,
                               w=w, pb=pb, mode=mode)
    pix_spec = pl.BlockSpec((1, 1, 1, pb), lambda ni, bi: (ni, bi, 0, 0),
                            memory_space=pltpu.VMEM)
    chan_spec = pl.BlockSpec((1, c, 1, 1, pb),
                             lambda ni, bi: (ni, 0, bi, 0, 0),
                             memory_space=pltpu.VMEM)
    view, geo, valid = pl.pallas_call(
        kernel,
        grid=(n, nb),
        in_specs=[
            pl.BlockSpec((1, 1, 12), lambda ni, bi: (ni, 0, 0),
                         memory_space=pltpu.SMEM),
            pix_spec,
            pl.BlockSpec((1, c, h, w), lambda ni, bi: (ni, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pix_spec, chan_spec,
        ],
        out_specs=[chan_spec, chan_spec, pix_spec],
        out_shape=[
            jax.ShapeDtypeStruct((n, c, nb, 1, pb), jnp.float32),
            jax.ShapeDtypeStruct((n, c, nb, 1, pb), jnp.float32),
            jax.ShapeDtypeStruct((n, nb, 1, pb), jnp.float32),
        ],
        interpret=interpret,
    )(params.reshape(-1, 1, 12), depth4, img_nchw, mask4, rgb5)
    return (view.reshape(n, c, total), geo.reshape(n, c, total),
            valid.reshape(n, total))


def _reference(img_nhwc, depth, intrinsics, t_tgt2src):
    from dynamic_multiview_3d_tpu.ops import reproject as reproject_ops
    out, valid = reproject_ops.depth_reproject_sample(
        img_nhwc, depth, intrinsics, t_tgt2src, padding_mode="zeros",
        impl="jnp")
    return out, valid


def _coords_and_ddepth(depth_flat, params, h, w):
    """Replicates the kernel's coordinate math in XLA (elementwise, fuses
    into the backward) and returns (ix, iy, valid, dix/dd, diy/dd)."""
    n = depth_flat.shape[0]
    idx = jnp.arange(h * w, dtype=jnp.int32)[None, :]
    u = (idx % w).astype(jnp.float32)
    v = (idx // w).astype(jnp.float32)
    m = params[:, :9]
    t = params[:, 9:]

    def row(i):
        return (m[:, 3 * i, None] * u + m[:, 3 * i + 1, None] * v
                + m[:, 3 * i + 2, None])

    ax, ay, az = row(0), row(1), row(2)                   # dq/dd, [N, P]
    qx = depth_flat * ax + t[:, 0, None]
    qy = depth_flat * ay + t[:, 1, None]
    qz = depth_flat * az + t[:, 2, None]
    valid = qz > _EPS
    qz_s = jnp.where(valid, qz, 1.0)
    ix = jnp.where(valid, qx / qz_s, _FAR)
    iy = jnp.where(valid, qy / qz_s, _FAR)
    inv_qz2 = 1.0 / (qz_s * qz_s)
    dix_dd = jnp.where(valid, (ax * qz - qx * az) * inv_qz2, 0.0)
    diy_dd = jnp.where(valid, (ay * qz - qy * az) * inv_qz2, 0.0)
    return ix, iy, valid.astype(jnp.float32), dix_dd, diy_dd


def _sampling_bwd(img, depth, intrinsics, t, ds_ncp, interpret, precision):
    """Shared backward tail: sampling cotangent [N,C,P] (already masked by
    `valid`) -> (dimg NHWC, ddepth). Runs the Pallas sampler backward, then
    chain-rules pixel-coordinate cotangents to the depth analytically."""
    n, h, w, c = img.shape
    params = _host_params(intrinsics.astype(jnp.float32),
                          t.astype(jnp.float32))
    depth_flat = depth.reshape(n, h * w).astype(jnp.float32)
    ix, iy, _, dix_dd, diy_dd = _coords_and_ddepth(depth_flat, params, h, w)
    img_nchw = jnp.transpose(img.astype(jnp.float32), (0, 3, 1, 2))
    dimg_nchw, dix, diy = gsp._call_bwd(img_nchw, ix, iy, ds_ncp, "zeros",
                                        interpret, precision)
    dimg = jnp.transpose(dimg_nchw, (0, 2, 3, 1)).astype(img.dtype)
    ddepth = (dix * dix_dd + diy * diy_dd).reshape(depth.shape) \
        .astype(depth.dtype)
    return dimg, ddepth


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def depth_reproject_sample(img_nhwc, depth, intrinsics, t_tgt2src,
                           interpret=False, precision="exact"):
    """Fused geometric synthesis: (view [N,H,W,C], valid [N,H,W]).

    Same semantics as ops.reproject.depth_reproject_sample (zeros padding).
    precision as in grid_sample_pallas.sample_pixel_coords.
    """
    n, h, w, c = img_nhwc.shape
    if not gsp.kernel_supported(c, h * w, h, w, precision):
        return _reference(img_nhwc, depth, intrinsics, t_tgt2src)
    params = _host_params(intrinsics.astype(jnp.float32),
                          t_tgt2src.astype(jnp.float32))
    img_nchw = jnp.transpose(img_nhwc.astype(jnp.float32), (0, 3, 1, 2))
    out, valid = _call_fused(img_nchw, depth.reshape(n, h * w), params,
                             interpret, precision)
    view = jnp.transpose(out.reshape(n, c, h, w), (0, 2, 3, 1))
    valid = valid.reshape(n, h, w)
    return view.astype(img_nhwc.dtype) * valid[..., None], valid


def _fwd(img, depth, intrinsics, t_tgt2src, interpret, precision):
    out = depth_reproject_sample(img, depth, intrinsics, t_tgt2src,
                                 interpret, precision)
    return out, (img, depth, intrinsics, t_tgt2src)


def _bwd(interpret, precision, res, cotangents):
    img, depth, intrinsics, t = res
    d_view, _ = cotangents                 # `valid` is a step fn: zero grad
    n, h, w, c = img.shape
    if not gsp.kernel_supported(c, h * w, h, w, precision):
        _, vjp = jax.vjp(
            lambda i, d: _reference(i, d, intrinsics, t)[0], img, depth)
        dimg, ddepth = vjp(d_view)
        return dimg, ddepth, jnp.zeros_like(intrinsics), jnp.zeros_like(t)

    params = _host_params(intrinsics.astype(jnp.float32),
                          t.astype(jnp.float32))
    _, _, valid, _, _ = _coords_and_ddepth(
        depth.reshape(n, h * w).astype(jnp.float32), params, h, w)
    # view = sample * valid, so the sampling cotangent carries the mask.
    dout = jnp.transpose(
        d_view.astype(jnp.float32)
        * valid.reshape(n, h, w)[..., None], (0, 3, 1, 2)).reshape(n, c, -1)
    dimg, ddepth = _sampling_bwd(img, depth, intrinsics, t, dout, interpret,
                                 precision)
    return dimg, ddepth, jnp.zeros_like(intrinsics), jnp.zeros_like(t)


depth_reproject_sample.defvjp(_fwd, _bwd)


# ---------------------------------------------------------------------------
# Fused reproject + composite — depth-path twin of flow_warp_composite.
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def depth_reproject_composite(img_nhwc, depth, intrinsics, t_tgt2src, mask,
                              rgb, interpret=False, precision="exact"):
    """Fused depth-mode synthesis (NHWC), one Pallas kernel:

        geo   = bilinear(img, correspondence(depth, K, T)) * valid
        view  = mask * geo + (1 - mask) * rgb
        valid = in-front-of-camera(depth)      # the mask-loss target

    img [N,H,W,C]; depth [N,H,W]; mask [N,H,W,1]; rgb [N,H,W,C]
    -> (view, geo [N,H,W,C], valid [N,H,W]), all float32.
    Differentiable in img, depth, mask, rgb; valid has zero gradient.
    Falls back to the unfused jnp composition on unsupported shapes.
    """
    n, h, w, c = img_nhwc.shape
    if not gsp.kernel_supported(c, h * w, h, w, precision):
        geo, valid = _reference(img_nhwc.astype(jnp.float32), depth,
                                intrinsics, t_tgt2src)
        view = mask * geo + (1.0 - mask) * rgb
        return view, geo, valid
    params = _host_params(intrinsics.astype(jnp.float32),
                          t_tgt2src.astype(jnp.float32))
    img_nchw = jnp.transpose(img_nhwc.astype(jnp.float32), (0, 3, 1, 2))
    rgb_ncp = jnp.transpose(rgb.astype(jnp.float32),
                            (0, 3, 1, 2)).reshape(n, c, h * w)
    view, geo, valid = _call_fused_composite(
        img_nchw, depth.reshape(n, h * w), params,
        mask.astype(jnp.float32).reshape(n, h * w), rgb_ncp, interpret,
        precision)

    def back(x):
        return jnp.transpose(x.reshape(n, c, h, w), (0, 2, 3, 1))
    return back(view), back(geo), valid.reshape(n, h, w)


def _cmp_fwd(img, depth, intrinsics, t, mask, rgb, interpret, precision):
    out = depth_reproject_composite(img, depth, intrinsics, t, mask, rgb,
                                    interpret, precision)
    view, geo, valid = out
    return out, (img, depth, intrinsics, t, mask, rgb, geo, valid)


def _cmp_bwd(interpret, precision, res, cots):
    img, depth, intrinsics, t, mask, rgb, geo, valid = res
    d_view, d_geo, _ = cots                # valid is a step fn: no grad
    n, h, w, c = img.shape
    d_view = d_view.astype(jnp.float32)
    m = mask.astype(jnp.float32)
    # chain rule through the composite (elementwise — XLA fuses):
    # geo cotangent accumulates the view path; valid masks the sampler's.
    dg = d_view * m + d_geo.astype(jnp.float32)
    dmask = jnp.sum(d_view * (geo - rgb.astype(jnp.float32)), axis=-1,
                    keepdims=True)
    drgb = (d_view * (1.0 - m)).astype(rgb.dtype)
    if not gsp.kernel_supported(c, h * w, h, w, precision):
        _, vjp = jax.vjp(
            lambda i, d: _reference(i.astype(jnp.float32), d, intrinsics,
                                    t)[0], img, depth)
        dimg, ddepth = vjp(dg)
        return (dimg.astype(img.dtype), ddepth,
                jnp.zeros_like(intrinsics), jnp.zeros_like(t),
                dmask.astype(mask.dtype), drgb)
    ds = jnp.transpose(dg * valid[..., None],
                       (0, 3, 1, 2)).reshape(n, c, h * w)
    dimg, ddepth = _sampling_bwd(img, depth, intrinsics, t, ds, interpret,
                                 precision)
    return (dimg, ddepth, jnp.zeros_like(intrinsics), jnp.zeros_like(t),
            dmask.astype(mask.dtype), drgb)


depth_reproject_composite.defvjp(_cmp_fwd, _cmp_bwd)
