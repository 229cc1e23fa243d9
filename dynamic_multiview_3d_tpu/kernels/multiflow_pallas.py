"""Fused multi-source warp + confidence blend + composite (Pallas TPU).

The multiflow twin of ``grid_sample_pallas.flow_warp_composite`` (SURVEY.md
R9+R12; BASELINE.json north-star "kernels fused with the adjacent" ops).
``models.dmv3d._multiflow_composite`` previously sampled every source frame
through ``sample_pixel_coords`` and ran the softmax blend in XLA, which
materializes a ``[B, K, H, W, T, 3]`` warped intermediate (T x the
single-flow warp HBM traffic) plus two 6-D transposes. This kernel keeps
the whole chain in VMEM per pixel block:

    valid_t = in-bounds(ix_t, iy_t)                    # per source
    wts     = softmax_t(conf + (valid - 1) * 30)       # OOB ~excluded
    multi   = sum_t wts_t * bilinear(img_t, ix_t, iy_t)
    view    = mask * multi + (1 - mask) * rgb
    any_valid = max_t valid_t

Sampling reuses the tent-weight MXU formulation (see grid_sample_pallas):
sources are a static in-kernel loop like channels, so each source's tent
matrices are built once per block and feed both the gather matmuls and —
in the backward kernel — the gradient algebra, which is the transpose of
the same matmuls plus the softmax Jacobian:

    d wts_t  = sum_c d_multi_c * val_tc (+ direct wts cotangent)
    d conf_t = wts_t * (d wts_t - sum_s wts_s d wts_s)
    d img_t / d ix_t / d iy_t: tent algebra with cotangent wts_t * d_multi

The validity bias and any_valid are step functions of the coords — zero
gradient, matching JAX autodiff through the jnp composition (parity tested
in interpret mode, fwd + every gradient: tests/test_multiflow_kernel.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dynamic_multiview_3d_tpu.kernels.grid_sample_pallas import (
    MAX_KERNEL_CHANNELS,
    _pixel_block,
    _sample_rows,
    _tent_grad_t,
    _tent_t,
    _contract_first,
    _contract_last,
    _contract_lo,
)

# Hardware-validated pixel blocks per (mode, T, H, W): the largest block
# that compiled AND ran the BACKWARD kernel on v5e (probed 2026-08-18 via
# the verify harness: fwd + all six gradients vs the jnp reference on
# chip). Off-table shapes use the conservative VMEM model below
# (calibration procedure as in grid_sample_pallas._VALIDATED_PB).
_VALIDATED_PB: dict[tuple[str, int, int, int], int] = {
    ("fast", 3, 64, 64): 2048,
    ("fast", 8, 128, 128): 1024,
    ("exact", 8, 128, 128): 1024,
}

_VMEM_BUDGET_WORDS = 4 * 1024 * 1024      # 16 MB scoped VMEM, in f32 words


def _vmem_words(t: int, c: int, h: int, w: int, pb: int) -> int:
    """Conservative f32-word model of the backward kernel's footprint:
    all T source images + their gradient accumulators stay resident
    (2*T*C*H*W), one source's tent/grad/temp matrices at a time
    (10*pb*(h+w), the fitted constant from grid_sample_pallas), plus the
    [T, pb] conf/weight/g rows (8*pb*t)."""
    return 2 * t * c * h * w + 10 * pb * (h + w) + 8 * pb * t


def _plan(total: int, t: int, c: int, h: int, w: int, mode: str) -> int:
    """Pixel-block size (lane axis) — divides ``total``, 128-aligned."""
    if total % 128 != 0:
        return 0 if total > 2048 else total
    cap = _VALIDATED_PB.get((mode, t, h, w))
    pb = 128 * _pixel_block(total // 128, target=16)      # pb <= 2048
    if cap is not None:
        while pb > cap:
            pb = 128 * _pixel_block(total // 128, target=pb // 128 - 1)
        return pb
    while pb > 128 and _vmem_words(t, c, h, w, pb) > _VMEM_BUDGET_WORDS:
        pb = 128 * _pixel_block(total // 128, target=pb // 128 - 1)
    if _vmem_words(t, c, h, w, pb) > _VMEM_BUDGET_WORDS:
        return 0
    return pb


def kernel_supported(t: int, c: int, total: int, h: int, w: int,
                     mode: str) -> bool:
    if c > MAX_KERNEL_CHANNELS:
        return False
    return _plan(total, t, c, h, w, mode) > 0


def _blend_weights(ixs, iys, confs, h, w):
    """Per-source validity + softmax over sources. ixs/iys/confs are
    length-T lists of [1, P] rows; returns (wts [T][1,P], valid [T][1,P])."""
    t = len(ixs)
    valid = [(((ix >= 0.0) & (ix <= float(w - 1))
               & (iy >= 0.0) & (iy <= float(h - 1))).astype(jnp.float32))
             for ix, iy in zip(ixs, iys)]
    z = [confs[i] + (valid[i] - 1.0) * 30.0 for i in range(t)]
    zmax = z[0]
    for i in range(1, t):
        zmax = jnp.maximum(zmax, z[i])
    ez = [jnp.exp(z[i] - zmax) for i in range(t)]
    denom = ez[0]
    for i in range(1, t):
        denom = denom + ez[i]
    wts = [ez[i] / denom for i in range(t)]
    return wts, valid


def _fwd_kernel(ix_ref, iy_ref, conf_ref, img_ref, mask_ref, rgb_ref,
                view_ref, multi_ref, valid_ref, wts_ref,
                *, num_sources, channels, h, w, padding_mode, mode):
    t = num_sources
    ixs = [ix_ref[0, s, 0] for s in range(t)]              # [1, P] each
    iys = [iy_ref[0, s, 0] for s in range(t)]
    confs = [conf_ref[0, s, 0] for s in range(t)]
    m = mask_ref[0, 0]                                     # [1, P]

    wts, valid = _blend_weights(ixs, iys, confs, h, w)
    any_valid = valid[0]
    for s in range(1, t):
        any_valid = jnp.maximum(any_valid, valid[s])
    valid_ref[0, 0] = any_valid

    acc = [jnp.zeros_like(m) for _ in range(channels)]
    for s in range(t):
        wts_ref[0, s, 0] = wts[s]
        for c, val in _sample_rows(ixs[s], iys[s],
                                   lambda c, s=s: img_ref[0, s, c],
                                   channels=channels, h=h, w=w,
                                   padding_mode=padding_mode, mode=mode):
            acc[c] = acc[c] + wts[s] * val
    for c in range(channels):
        multi_ref[0, c, 0] = acc[c]
        view_ref[0, c, 0] = m * acc[c] + (1.0 - m) * rgb_ref[0, c, 0]


def _bwd_kernel(ix_ref, iy_ref, conf_ref, img_ref, mask_ref, rgb_ref,
                dview_ref, dmulti_ref, dwts_ref,
                dimg_ref, dix_ref, diy_ref, dconf_ref, dmask_ref, drgb_ref,
                *, num_sources, channels, h, w, padding_mode, mode):
    t = num_sources
    ixs = [ix_ref[0, s, 0] for s in range(t)]
    iys = [iy_ref[0, s, 0] for s in range(t)]
    confs = [conf_ref[0, s, 0] for s in range(t)]
    m = mask_ref[0, 0]                                     # [1, P]

    @pl.when(pl.program_id(1) == 0)
    def _():
        dimg_ref[0] = jnp.zeros_like(dimg_ref[0])

    wts, _ = _blend_weights(ixs, iys, confs, h, w)

    dview = [dview_ref[0, c, 0] for c in range(channels)]
    # total cotangent reaching the blended warp
    dmulti = [dview[c] * m + dmulti_ref[0, c, 0] for c in range(channels)]

    fast = mode != "exact"
    multi = [jnp.zeros_like(m) for _ in range(channels)]
    g = []                                                 # d L / d wts_s
    for s in range(t):
        wy_t = _tent_t(iys[s], h, padding_mode)            # [H, P]
        uy_t = _tent_grad_t(iys[s], h, padding_mode)
        wx_t = _tent_t(ixs[s], w, padding_mode)            # [W, P]
        ux_t = _tent_grad_t(ixs[s], w, padding_mode)
        if fast:
            wy_b, uy_b, wx_b = (wy_t.astype(jnp.bfloat16),
                                uy_t.astype(jnp.bfloat16),
                                wx_t.astype(jnp.bfloat16))
        gs = dwts_ref[0, s, 0]                             # direct cotangent
        dix = jnp.zeros_like(m)
        diy = jnp.zeros_like(m)
        for c in range(channels):
            img = img_ref[0, s, c]                         # [H, W]
            ds = wts[s] * dmulti[c]                        # sample cotangent
            if fast:
                img_b = img.astype(jnp.bfloat16)
                dimg_ref[0, s, c] += _contract_lo(
                    (wy_t * ds).astype(jnp.bfloat16), wx_b, last=True)
                tmp_t = _contract_lo(img_b, wy_b)          # [W, P]
                dtmp_dy_t = _contract_lo(img_b, uy_b)
            else:
                dimg_ref[0, s, c] += _contract_last(wy_t * ds, wx_t)
                tmp_t = _contract_first(img, wy_t)
                dtmp_dy_t = _contract_first(img, uy_t)
            val = jnp.sum(tmp_t * wx_t, axis=0, keepdims=True)
            multi[c] = multi[c] + wts[s] * val
            gs = gs + dmulti[c] * val
            dix += jnp.sum(tmp_t * ux_t, axis=0, keepdims=True) * ds
            diy += jnp.sum(dtmp_dy_t * wx_t, axis=0, keepdims=True) * ds
        g.append(gs)
        dix_ref[0, s, 0] = dix
        diy_ref[0, s, 0] = diy

    gbar = wts[0] * g[0]
    for s in range(1, t):
        gbar = gbar + wts[s] * g[s]
    for s in range(t):
        dconf_ref[0, s, 0] = wts[s] * (g[s] - gbar)

    dmask = jnp.zeros_like(m)
    for c in range(channels):
        dmask = dmask + dview[c] * (multi[c] - rgb_ref[0, c, 0])
        drgb_ref[0, c, 0] = dview[c] * (1.0 - m)
    dmask_ref[0, 0] = dmask


def _specs(t, c, h, w, pb):
    src = pl.BlockSpec((1, t, 1, 1, pb), lambda ni, bi: (ni, 0, bi, 0, 0),
                       memory_space=pltpu.VMEM)             # per-source rows
    pix = pl.BlockSpec((1, 1, 1, pb), lambda ni, bi: (ni, bi, 0, 0),
                       memory_space=pltpu.VMEM)             # per-pixel rows
    chan = pl.BlockSpec((1, c, 1, 1, pb), lambda ni, bi: (ni, 0, bi, 0, 0),
                        memory_space=pltpu.VMEM)            # per-channel rows
    img = pl.BlockSpec((1, t, c, h, w), lambda ni, bi: (ni, 0, 0, 0, 0),
                       memory_space=pltpu.VMEM)             # all T sources
    return src, pix, chan, img


def _call_fwd(imgs, ix, iy, conf, mask, rgb, padding_mode, interpret, mode):
    n, t, c, h, w = imgs.shape
    total = ix.shape[2]
    pb = _plan(total, t, c, h, w, mode)
    nb = total // pb
    src, pix, chan, img = _specs(t, c, h, w, pb)
    r = lambda x: x.reshape(n, t, nb, 1, pb)
    kernel = functools.partial(_fwd_kernel, num_sources=t, channels=c,
                               h=h, w=w, padding_mode=padding_mode, mode=mode)
    view, multi, valid, wts = pl.pallas_call(
        kernel,
        grid=(n, nb),
        in_specs=[src, src, src, img, pix, chan],
        out_specs=[chan, chan, pix, src],
        out_shape=[
            jax.ShapeDtypeStruct((n, c, nb, 1, pb), jnp.float32),
            jax.ShapeDtypeStruct((n, c, nb, 1, pb), jnp.float32),
            jax.ShapeDtypeStruct((n, nb, 1, pb), jnp.float32),
            jax.ShapeDtypeStruct((n, t, nb, 1, pb), jnp.float32),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * n * t * c * total * h,
            bytes_accessed=4 * n * (t * c * h * w + (3 * t + 2 * c) * total),
            transcendentals=n * t * total),
    )(r(ix), r(iy), r(conf), imgs,
      mask.reshape(n, nb, 1, pb), rgb.reshape(n, c, nb, 1, pb))
    return (view.reshape(n, c, total), multi.reshape(n, c, total),
            valid.reshape(n, total), wts.reshape(n, t, total))


def _call_bwd(imgs, ix, iy, conf, mask, rgb, dview, dmulti, dwts,
              padding_mode, interpret, mode):
    n, t, c, h, w = imgs.shape
    total = ix.shape[2]
    pb = _plan(total, t, c, h, w, mode)
    nb = total // pb
    src, pix, chan, img = _specs(t, c, h, w, pb)
    r = lambda x: x.reshape(n, t, nb, 1, pb)
    rc = lambda x: x.reshape(n, c, nb, 1, pb)
    kernel = functools.partial(_bwd_kernel, num_sources=t, channels=c,
                               h=h, w=w, padding_mode=padding_mode, mode=mode)
    dimg, dix, diy, dconf, dmask, drgb = pl.pallas_call(
        kernel,
        grid=(n, nb),
        in_specs=[src, src, src, img, pix, chan, chan, chan, src],
        out_specs=[img, src, src, src, pix, chan],
        out_shape=[
            jax.ShapeDtypeStruct((n, t, c, h, w), jnp.float32),
            jax.ShapeDtypeStruct((n, t, nb, 1, pb), jnp.float32),
            jax.ShapeDtypeStruct((n, t, nb, 1, pb), jnp.float32),
            jax.ShapeDtypeStruct((n, t, nb, 1, pb), jnp.float32),
            jax.ShapeDtypeStruct((n, nb, 1, pb), jnp.float32),
            jax.ShapeDtypeStruct((n, c, nb, 1, pb), jnp.float32),
        ],
        interpret=interpret,
    )(r(ix), r(iy), r(conf), imgs, mask.reshape(n, nb, 1, pb), rc(rgb),
      rc(dview), rc(dmulti), r(dwts))
    back = lambda x: x.reshape(n, t, total)
    return (dimg, back(dix), back(diy), back(dconf),
            dmask.reshape(n, total), drgb.reshape(n, c, total))


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def multiflow_composite_pix(imgs, ix, iy, conf, mask, rgb,
                            padding_mode="border", interpret=False,
                            precision="fast"):
    """Fused multi-source synthesis at pixel coords.

    imgs [N,T,C,H,W]; ix/iy/conf [N,T,P]; mask [N,P]; rgb [N,C,P] ->
    (view [N,C,P], multi [N,C,P], any_valid [N,P], wts [N,T,P]), all f32.
    Differentiable in imgs/coords/conf/mask/rgb; any_valid (and the
    validity bias inside the softmax) are step functions with zero grad.
    """
    return _call_fwd(imgs.astype(jnp.float32), ix.astype(jnp.float32),
                     iy.astype(jnp.float32), conf.astype(jnp.float32),
                     mask.astype(jnp.float32), rgb.astype(jnp.float32),
                     padding_mode, interpret, precision)


def _mf_fwd(imgs, ix, iy, conf, mask, rgb, padding_mode, interpret, precision):
    out = multiflow_composite_pix(imgs, ix, iy, conf, mask, rgb,
                                  padding_mode, interpret, precision)
    return out, (imgs, ix, iy, conf, mask, rgb, out[1])


def _mf_bwd(padding_mode, interpret, precision, res, cots):
    imgs, ix, iy, conf, mask, rgb, multi = res
    d_view, d_multi, _, d_wts = cots           # any_valid: zero grad
    dimg, dix, diy, dconf, dmask, drgb = _call_bwd(
        imgs.astype(jnp.float32), ix.astype(jnp.float32),
        iy.astype(jnp.float32), conf.astype(jnp.float32),
        mask.astype(jnp.float32), rgb.astype(jnp.float32),
        d_view.astype(jnp.float32), d_multi.astype(jnp.float32),
        d_wts.astype(jnp.float32), padding_mode, interpret, precision)
    return (dimg.astype(imgs.dtype), dix.astype(ix.dtype),
            diy.astype(iy.dtype), dconf.astype(conf.dtype),
            dmask.astype(mask.dtype), drgb.astype(rgb.dtype))


multiflow_composite_pix.defvjp(_mf_fwd, _mf_bwd)
