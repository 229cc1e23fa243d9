"""Pallas TPU bilinear grid-sample / flow-warp (SURVEY.md R10/R9 -> T0).

TPU-first formulation — no gather, no scatter. For a block of P output
pixels with continuous source coords (ix, iy):

    W_y[p, h] = (1-fy_p) * [h == y0_p]  +  fy_p * [h == y0_p + 1]
    tmp       = W_y @ img                    # [P,H] @ [H,W]  — MXU
    out[p]    = sum_w tmp[p, w] * W_x[p, w]  # fused x-lerp    — VPU

The y-direction gather *and* lerp collapse into one matmul against a
two-nonzero one-hot matrix; the x direction is a weighted lane reduction.
The backward pass is the transpose of the same algebra, so the scatter-add
of gradients to 4 neighbors (the classically painful part on TPU,
SURVEY.md §7 hard-part #1) is also just matmuls:

    d_img  = W_y^T @ (W_x * d_out)           # MXU scatter-add
    d_ix   = d_out * sum_w tmp * U_x         # U_* = d W_* / d coord
    d_iy   = d_out * sum_w (U_y @ img) * W_x

Padding modes: "zeros" masks the weights of out-of-range taps (values and
coord-gradients match torch's grid_sample); "border" clamps tap indices
(weights then sum correctly at the edge).

Kernel layout: grid (batch, pixel-block); channels are a static in-kernel
loop so the one-hot weights are built once per block and shared. Images are
NCHW inside the kernel ([H, W] tiles, W on lanes); pixels ride the LANE axis
everywhere else (coords/outputs [.., 1, P], transposed weights [H|W, P]),
so the kernel body has zero relayouts and zero lane-padding waste. The
public wrappers take and return the framework's NHWC. d_img accumulates
across pixel-block grid steps (consecutive revisits of the same output
block — pipeline-safe).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Above this channel count the per-(n) image tile no longer fits VMEM
# comfortably; the jnp gather path is used instead (ops/sampling.py).
MAX_KERNEL_CHANNELS = 16

# Outputs whose pixel count is not a multiple of 128 run as ONE kernel block
# (_plan falls through to `total`); above this count the single block's
# one-hot weight matrices ([H|W, total] f32) would blow VMEM, so those
# shapes route to the jnp path instead (kernel_supported).
MAX_SINGLE_BLOCK_PIXELS = 2048


def _pixel_block(total: int, target: int = 2048) -> int:
    """Largest divisor of ``total`` that is <= target (block of output pixels)."""
    best = 1
    for d in range(1, int(total ** 0.5) + 1):
        if total % d == 0:
            for cand in (d, total // d):
                if cand <= target:
                    best = max(best, cand)
    return best


def _plan(total: int) -> int:
    """Pixel-block size pb for coords shaped [N, nb, 1, pb], block (1,1,1,pb).

    Pixels ride the LANE axis end to end: the one-hot weights are built
    transposed ([H, P] / [W, P], lane-oriented), the gather matmul contracts
    over sublanes via dot_general, and the x-reduction collapses the sublane
    axis into a (1, P) lane vector — no relayouts, and none of the 128x
    VMEM/DMA padding a (P, 1) sublane layout would cost. pb must divide
    ``total`` and (compiled) be a multiple of 128 — callers fall back to the
    jnp path otherwise (kernel_supported)."""
    if total % 128 == 0:
        return 128 * _pixel_block(total // 128, target=16)   # pb <= 2048
    return total                                             # single block


def _taps_t(coord_row, size, padding_mode):
    """coord [1, P] -> (oh0, oh1 [size, P] masked EXACT one-hots;
    w0, w1, u0, u1 [1, P] lerp factors and their d/dcoord).

    The composed weight matrix is W = oh0*w0 + oh1*w1 (two nonzeros per
    column) and U = oh0*u0 + oh1*u1. The masked one-hots hold only 0/1 —
    exact in bf16 — which the fast path exploits. Lane-oriented (P lanes)."""
    c0 = jnp.floor(coord_row)
    frac = coord_row - c0                                 # [1, P]
    i0 = c0.astype(jnp.int32)
    i1 = i0 + 1
    if padding_mode == "zeros":
        ok0 = ((i0 >= 0) & (i0 <= size - 1))
        ok1 = ((i1 >= 0) & (i1 <= size - 1))
        w0 = (1.0 - frac)
        w1 = frac
        u0 = -jnp.ones_like(frac)
        u1 = jnp.ones_like(frac)
    else:  # border: clamp tap indices, weights unchanged
        ok0 = ok1 = None
        w0 = 1.0 - frac
        w1 = frac
        u0 = -jnp.ones_like(frac)
        u1 = jnp.ones_like(frac)
    i0c = jnp.clip(i0, 0, size - 1)
    i1c = jnp.clip(i1, 0, size - 1)
    p = coord_row.shape[1]
    iota = jax.lax.broadcasted_iota(jnp.int32, (size, p), 0)
    onehot0 = (iota == i0c)
    onehot1 = (iota == i1c)
    if ok0 is not None:  # fold the zeros-padding mask into the one-hots
        onehot0 = onehot0 & ok0
        onehot1 = onehot1 & ok1
    return (onehot0.astype(jnp.float32), onehot1.astype(jnp.float32),
            w0, w1, u0, u1)


def _weights_t(coord_row, size, padding_mode):
    """Composed (W [size, P], U [size, P]) for the exact path."""
    oh0, oh1, w0, w1, u0, u1 = _taps_t(coord_row, size, padding_mode)
    return oh0 * w0 + oh1 * w1, oh0 * u0 + oh1 * u1


_HI = jax.lax.Precision.HIGHEST


def _contract_first(a, b):
    """[K, M] x [K, N] -> [M, N], contracting the leading (sublane) dim."""
    return jax.lax.dot_general(
        a, b, dimension_numbers=(((0,), (0,)), ((), ())),
        precision=_HI, preferred_element_type=jnp.float32)


def _contract_last(a, b):
    """[M, K] x [N, K] -> [M, N], contracting the trailing (lane) dim."""
    return jax.lax.dot_general(
        a, b, dimension_numbers=(((1,), (1,)), ((), ())),
        precision=_HI, preferred_element_type=jnp.float32)


def _contract_lo(a, b, last: bool = False):
    """Single-pass (DEFAULT-precision) bf16 contraction, f32 accumulate."""
    dims = ((1,), (1,)) if last else ((0,), (0,))
    return jax.lax.dot_general(
        a, b, dimension_numbers=(dims, ((), ())),
        precision=jax.lax.Precision.DEFAULT,
        preferred_element_type=jnp.float32)


def _fwd_kernel(ix_ref, iy_ref, img_ref, out_ref, *, channels, h, w,
                padding_mode, mode):
    ix = ix_ref[0, 0]                                     # [1, P] lanes
    iy = iy_ref[0, 0]
    if mode == "exact":
        wy_t, _ = _weights_t(iy, h, padding_mode)         # [H, P]
        wx_t, _ = _weights_t(ix, w, padding_mode)         # [W, P]
        for c in range(channels):                         # static unroll
            # img [H,W] x wy_t [H,P] -> tmp_t [W,P]: gather+y-lerp on MXU
            tmp_t = _contract_first(img_ref[0, c], wy_t)
            # x-lerp: weighted sublane reduction -> (1, P) lane vector
            out_ref[0, c, 0] = jnp.sum(tmp_t * wx_t, axis=0, keepdims=True)
        return
    # fast: the one-hots are EXACT in bf16 (0/1), so split the y-lerp out of
    # the matmul — two single-pass bf16 matmuls + f32 VPU lerp instead of one
    # 3-pass f32 matmul. Only the image's bf16 truncation remains as error.
    oh0y, oh1y, w0y, w1y, _, _ = _taps_t(iy, h, padding_mode)
    oh0x, oh1x, w0x, w1x, _, _ = _taps_t(ix, w, padding_mode)
    wx_t = oh0x * w0x + oh1x * w1x                        # f32, VPU side
    oh0y = oh0y.astype(jnp.bfloat16)
    oh1y = oh1y.astype(jnp.bfloat16)
    for c in range(channels):
        img_b = img_ref[0, c].astype(jnp.bfloat16)
        t0 = _contract_lo(img_b, oh0y)                    # [W, P] f32 out
        t1 = _contract_lo(img_b, oh1y)
        tmp_t = t0 * w0y + t1 * w1y                       # y-lerp on VPU
        out_ref[0, c, 0] = jnp.sum(tmp_t * wx_t, axis=0, keepdims=True)


def _bwd_kernel(ix_ref, iy_ref, img_ref, dout_ref,
                dimg_ref, dix_ref, diy_ref, *, channels, h, w, padding_mode,
                mode):
    ix = ix_ref[0, 0]                                     # [1, P] lanes
    iy = iy_ref[0, 0]
    p = ix.shape[1]

    @pl.when(pl.program_id(1) == 0)
    def _():
        dimg_ref[0] = jnp.zeros_like(dimg_ref[0])

    dix = jnp.zeros((1, p), jnp.float32)
    diy = jnp.zeros((1, p), jnp.float32)

    if mode == "exact":
        wy_t, uy_t = _weights_t(iy, h, padding_mode)      # [H, P]
        wx_t, ux_t = _weights_t(ix, w, padding_mode)      # [W, P]
        for c in range(channels):
            img = img_ref[0, c]                           # [H, W]
            dout = dout_ref[0, c, 0]                      # [1, P]
            # d_img[h,w] = sum_p wy_t[h,p]*dout[p]*wx_t[w,p]: contract the
            # pixel (lane) dim on the MXU — the scatter-add, as a matmul.
            dimg_ref[0, c] += _contract_last(wy_t * dout, wx_t)
            tmp_t = _contract_first(img, wy_t)            # [W, P]
            dtmp_dy_t = _contract_first(img, uy_t)        # [W, P]
            dix += jnp.sum(tmp_t * ux_t, axis=0, keepdims=True) * dout
            diy += jnp.sum(dtmp_dy_t * wx_t, axis=0, keepdims=True) * dout
        dix_ref[0, 0] = dix
        diy_ref[0, 0] = diy
        return

    # fast: u0=-1/u1=+1 with masks folded into the one-hots, so
    # dtmp/dy = t1 - t0 falls out of the forward's two exact matmuls free.
    oh0y, oh1y, w0y, w1y, _, _ = _taps_t(iy, h, padding_mode)
    oh0x, oh1x, w0x, w1x, _, _ = _taps_t(ix, w, padding_mode)
    wy_t = oh0y * w0y + oh1y * w1y
    wx_t = oh0x * w0x + oh1x * w1x
    ux_t = oh1x - oh0x
    oh0y_b = oh0y.astype(jnp.bfloat16)
    oh1y_b = oh1y.astype(jnp.bfloat16)
    for c in range(channels):
        img_b = img_ref[0, c].astype(jnp.bfloat16)
        dout = dout_ref[0, c, 0]                          # [1, P]
        dimg_ref[0, c] += _contract_lo((wy_t * dout).astype(jnp.bfloat16),
                                       wx_t.astype(jnp.bfloat16), last=True)
        t0 = _contract_lo(img_b, oh0y_b)                  # [W, P]
        t1 = _contract_lo(img_b, oh1y_b)
        tmp_t = t0 * w0y + t1 * w1y
        dix += jnp.sum(tmp_t * ux_t, axis=0, keepdims=True) * dout
        diy += jnp.sum((t1 - t0) * wx_t, axis=0, keepdims=True) * dout
    dix_ref[0, 0] = dix
    diy_ref[0, 0] = diy


def _call_fwd(img_nchw, ix, iy, padding_mode, interpret, mode):
    n, c, h, w = img_nchw.shape
    total = ix.shape[1]
    pb = _plan(total)
    nb = total // pb
    ix4 = ix.reshape(n, nb, 1, pb)
    iy4 = iy.reshape(n, nb, 1, pb)
    kernel = functools.partial(_fwd_kernel, channels=c, h=h, w=w,
                               padding_mode=padding_mode, mode=mode)
    coord_spec = pl.BlockSpec((1, 1, 1, pb), lambda ni, bi: (ni, bi, 0, 0),
                              memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(n, nb),
        in_specs=[
            coord_spec, coord_spec,
            pl.BlockSpec((1, c, h, w), lambda ni, bi: (ni, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, c, 1, 1, pb),
                               lambda ni, bi: (ni, 0, bi, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, c, nb, 1, pb), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * n * c * total * h,  # the gather matmuls dominate
            bytes_accessed=4 * n * c * (h * w + 3 * total),
            transcendentals=0),
    )(ix4, iy4, img_nchw)
    return out.reshape(n, c, total)


def _call_bwd(img_nchw, ix, iy, dout, padding_mode, interpret, mode):
    n, c, h, w = img_nchw.shape
    total = ix.shape[1]
    pb = _plan(total)
    nb = total // pb
    ix4 = ix.reshape(n, nb, 1, pb)
    iy4 = iy.reshape(n, nb, 1, pb)
    dout5 = dout.reshape(n, c, nb, 1, pb)
    kernel = functools.partial(_bwd_kernel, channels=c, h=h, w=w,
                               padding_mode=padding_mode, mode=mode)
    coord_spec = pl.BlockSpec((1, 1, 1, pb), lambda ni, bi: (ni, bi, 0, 0),
                              memory_space=pltpu.VMEM)
    img_spec = pl.BlockSpec((1, c, h, w), lambda ni, bi: (ni, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    dout_spec = pl.BlockSpec((1, c, 1, 1, pb),
                             lambda ni, bi: (ni, 0, bi, 0, 0),
                             memory_space=pltpu.VMEM)
    dimg, dix, diy = pl.pallas_call(
        kernel,
        grid=(n, nb),
        in_specs=[coord_spec, coord_spec, img_spec, dout_spec],
        out_specs=[img_spec, coord_spec, coord_spec],
        out_shape=[
            jax.ShapeDtypeStruct((n, c, h, w), jnp.float32),
            jax.ShapeDtypeStruct((n, nb, 1, pb), jnp.float32),
            jax.ShapeDtypeStruct((n, nb, 1, pb), jnp.float32),
        ],
        interpret=interpret,
    )(ix4, iy4, img_nchw, dout5)
    return dimg, dix.reshape(n, total), diy.reshape(n, total)


# ---------------------------------------------------------------------------
# Differentiable pixel-coordinate sampler (custom VJP around the kernels).
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def sample_pixel_coords(img_nchw, ix, iy, padding_mode="zeros",
                        interpret=False, precision="exact"):
    """Bilinear-sample ``img_nchw`` [N,C,H,W] at pixel coords ix/iy [N,P].

    Returns [N, C, P] float32. Differentiable in image and coords.
    precision="exact" keeps f32 everywhere (3-pass MXU dots);
    "fast" runs single-pass bf16 matmuls against exact one-hots — only the
    image/gradient values see bf16 truncation (~3 decimal digits), ~2-3x
    faster. The model uses "fast" by default (cfg.model.warp_precision).
    """
    return _call_fwd(img_nchw.astype(jnp.float32), ix.astype(jnp.float32),
                     iy.astype(jnp.float32), padding_mode, interpret,
                     precision)


def _sample_fwd(img, ix, iy, padding_mode, interpret, precision):
    out = sample_pixel_coords(img, ix, iy, padding_mode, interpret, precision)
    return out, (img, ix, iy)


def _sample_bwd(padding_mode, interpret, precision, res, dout):
    img, ix, iy = res
    dimg, dix, diy = _call_bwd(
        img.astype(jnp.float32), ix.astype(jnp.float32),
        iy.astype(jnp.float32), dout.astype(jnp.float32),
        padding_mode, interpret, precision)
    return dimg.astype(img.dtype), dix.astype(ix.dtype), diy.astype(iy.dtype)


sample_pixel_coords.defvjp(_sample_fwd, _sample_bwd)


def kernel_supported(channels: int, total_pixels: int | None = None) -> bool:
    """Whether the Pallas kernel handles this shape (else: jnp fallback).

    channels bounds the per-grid-step image VMEM tile; non-128-multiple
    pixel counts are only safe as a single block up to
    MAX_SINGLE_BLOCK_PIXELS (see _plan).
    """
    if channels > MAX_KERNEL_CHANNELS:
        return False
    if (total_pixels is not None and total_pixels % 128 != 0
            and total_pixels > MAX_SINGLE_BLOCK_PIXELS):
        return False
    return True


# ---------------------------------------------------------------------------
# Public NHWC wrappers matching ops/sampling.py semantics.
# ---------------------------------------------------------------------------

def grid_sample(image, grid, *, align_corners=True, padding_mode="zeros",
                interpret=False, precision="exact"):
    """NHWC/normalized-grid API, Pallas path. See ops.sampling.grid_sample."""
    from dynamic_multiview_3d_tpu.ops import sampling
    n, h, w, c = image.shape
    ho, wo = grid.shape[1:3]
    if not kernel_supported(c, ho * wo):
        return sampling._grid_sample_jnp(image, grid, align_corners,
                                         padding_mode)
    ix, iy = sampling.unnormalize_coords(grid.astype(jnp.float32), h, w,
                                         align_corners)
    img_nchw = jnp.transpose(image, (0, 3, 1, 2))
    out = sample_pixel_coords(img_nchw, ix.reshape(n, ho * wo),
                              iy.reshape(n, ho * wo), padding_mode, interpret,
                              precision)
    out = out.reshape(n, c, ho, wo)
    return jnp.transpose(out, (0, 2, 3, 1)).astype(image.dtype)


def flow_warp(image, flow, *, padding_mode="border", interpret=False,
              precision="exact"):
    """Appearance-flow warp, Pallas path: skips grid normalization entirely —
    pixel coords = base grid + flow feed the kernel directly."""
    from dynamic_multiview_3d_tpu.ops import sampling
    n, h, w, c = image.shape
    if not kernel_supported(c, h * w):
        return sampling.flow_warp(image, flow, padding_mode=padding_mode,
                                  impl="jnp")
    coords = sampling.base_grid(h, w, jnp.float32)[None] \
        + flow.astype(jnp.float32)
    img_nchw = jnp.transpose(image, (0, 3, 1, 2))
    out = sample_pixel_coords(
        img_nchw, coords[..., 0].reshape(n, h * w),
        coords[..., 1].reshape(n, h * w), padding_mode, interpret, precision)
    return jnp.transpose(out.reshape(n, c, h, w), (0, 2, 3, 1)) \
        .astype(image.dtype)
