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
NCHW inside the kernel ([H, W] tiles, W on lanes); the public wrappers take
and return the framework's NHWC. d_img accumulates across pixel-block grid
steps (consecutive revisits of the same output block — pipeline-safe).
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
    """Pixel-block size pb for coords shaped [N, total, 1], block (1, pb, 1).

    Pixels ride the SUBLANE axis (the one-hot matmuls want [P, H] with P on
    sublanes, so no in-kernel relayout happens); the trailing size-1 lane
    axis equals the full array dim, which Mosaic accepts. pb must divide
    ``total`` and (for compiled mode) be a multiple of 8 — callers fall back
    to the jnp path when that's impossible (kernel_supported)."""
    # NOTE pb stays modest: the (pb, 1) coordinate/output buffers are padded
    # to 128 lanes in VMEM, so each costs pb*128*4 bytes — pb=512 keeps the
    # whole working set (coords, outputs, one-hots, double buffers) well
    # under the 16 MB VMEM budget.
    if total % 8 == 0:
        pb = 8 * _pixel_block(total // 8, target=64)    # pb <= 512
    else:
        pb = total                                      # single full block
    return pb


def _weights(coord, size, padding_mode):
    """coord [P,1] -> (W [P,size], U [P,size]) lerp weights + d/dcoord."""
    c0 = jnp.floor(coord)
    frac = coord - c0
    i0 = c0.astype(jnp.int32)
    i1 = i0 + 1
    if padding_mode == "zeros":
        ok0 = ((i0 >= 0) & (i0 <= size - 1)).astype(jnp.float32)
        ok1 = ((i1 >= 0) & (i1 <= size - 1)).astype(jnp.float32)
        w0 = (1.0 - frac) * ok0
        w1 = frac * ok1
        u0 = -ok0
        u1 = ok1
    else:  # border: clamp tap indices, weights unchanged
        w0 = 1.0 - frac
        w1 = frac
        u0 = -jnp.ones_like(frac)
        u1 = jnp.ones_like(frac)
    i0c = jnp.clip(i0, 0, size - 1)
    i1c = jnp.clip(i1, 0, size - 1)
    p = coord.shape[0]
    iota = jax.lax.broadcasted_iota(jnp.int32, (p, size), 1)
    onehot0 = (iota == i0c).astype(jnp.float32)
    onehot1 = (iota == i1c).astype(jnp.float32)
    return onehot0 * w0 + onehot1 * w1, onehot0 * u0 + onehot1 * u1


def _fwd_kernel(ix_ref, iy_ref, img_ref, out_ref, *, channels, h, w,
                padding_mode):
    ix = ix_ref[0]                                        # [P, 1] sublanes
    iy = iy_ref[0]
    wy, _ = _weights(iy, h, padding_mode)                 # [P, H]
    wx, _ = _weights(ix, w, padding_mode)                 # [P, W]
    for c in range(channels):                             # static unroll
        tmp = jnp.dot(wy, img_ref[0, c], precision=jax.lax.Precision.HIGHEST,
                      preferred_element_type=jnp.float32)  # [P, W] on MXU
        out_ref[0, c] = jnp.sum(tmp * wx, axis=1, keepdims=True)


def _bwd_kernel(ix_ref, iy_ref, img_ref, dout_ref,
                dimg_ref, dix_ref, diy_ref, *, channels, h, w, padding_mode):
    ix = ix_ref[0]                                        # [P, 1] sublanes
    iy = iy_ref[0]
    p = ix.shape[0]
    wy, uy = _weights(iy, h, padding_mode)
    wx, ux = _weights(ix, w, padding_mode)

    @pl.when(pl.program_id(1) == 0)
    def _():
        dimg_ref[0] = jnp.zeros_like(dimg_ref[0])

    dix = jnp.zeros((p, 1), jnp.float32)
    diy = jnp.zeros((p, 1), jnp.float32)
    for c in range(channels):
        img = img_ref[0, c]                               # [H, W]
        dout = dout_ref[0, c]                             # [P, 1]
        # d_img = W_y^T @ (dout * W_x): the P dim contracts on the MXU —
        # this IS the 4-neighbor scatter-add, as a matmul.
        dimg_ref[0, c] += jax.lax.dot_general(
            wy, dout * wx, dimension_numbers=(((0,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)
        tmp = jnp.dot(wy, img, precision=jax.lax.Precision.HIGHEST,
                      preferred_element_type=jnp.float32)
        dtmp_dy = jnp.dot(uy, img, precision=jax.lax.Precision.HIGHEST,
                          preferred_element_type=jnp.float32)
        dix += jnp.sum(tmp * ux, axis=1, keepdims=True) * dout
        diy += jnp.sum(dtmp_dy * wx, axis=1, keepdims=True) * dout
    dix_ref[0] = dix
    diy_ref[0] = diy


def _call_fwd(img_nchw, ix, iy, padding_mode, interpret):
    n, c, h, w = img_nchw.shape
    total = ix.shape[1]
    pb = _plan(total)
    ix3 = ix.reshape(n, total, 1)
    iy3 = iy.reshape(n, total, 1)
    kernel = functools.partial(_fwd_kernel, channels=c, h=h, w=w,
                               padding_mode=padding_mode)
    coord_spec = pl.BlockSpec((1, pb, 1), lambda ni, bi: (ni, bi, 0),
                              memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(n, total // pb),
        in_specs=[
            coord_spec, coord_spec,
            pl.BlockSpec((1, c, h, w), lambda ni, bi: (ni, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, c, pb, 1), lambda ni, bi: (ni, 0, bi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, c, total, 1), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * n * c * total * h,  # the W_y @ img matmuls dominate
            bytes_accessed=4 * n * c * (h * w + 3 * total),
            transcendentals=0),
    )(ix3, iy3, img_nchw)
    return out.reshape(n, c, total)


def _call_bwd(img_nchw, ix, iy, dout, padding_mode, interpret):
    n, c, h, w = img_nchw.shape
    total = ix.shape[1]
    pb = _plan(total)
    ix3 = ix.reshape(n, total, 1)
    iy3 = iy.reshape(n, total, 1)
    dout4 = dout.reshape(n, c, total, 1)
    kernel = functools.partial(_bwd_kernel, channels=c, h=h, w=w,
                               padding_mode=padding_mode)
    coord_spec = pl.BlockSpec((1, pb, 1), lambda ni, bi: (ni, bi, 0),
                              memory_space=pltpu.VMEM)
    img_spec = pl.BlockSpec((1, c, h, w), lambda ni, bi: (ni, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    dimg, dix, diy = pl.pallas_call(
        kernel,
        grid=(n, total // pb),
        in_specs=[
            coord_spec, coord_spec, img_spec,
            pl.BlockSpec((1, c, pb, 1), lambda ni, bi: (ni, 0, bi, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[img_spec, coord_spec, coord_spec],
        out_shape=[
            jax.ShapeDtypeStruct((n, c, h, w), jnp.float32),
            jax.ShapeDtypeStruct((n, total, 1), jnp.float32),
            jax.ShapeDtypeStruct((n, total, 1), jnp.float32),
        ],
        interpret=interpret,
    )(ix3, iy3, img_nchw, dout4)
    return dimg, dix.reshape(n, total), diy.reshape(n, total)


# ---------------------------------------------------------------------------
# Differentiable pixel-coordinate sampler (custom VJP around the kernels).
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def sample_pixel_coords(img_nchw, ix, iy, padding_mode="zeros",
                        interpret=False):
    """Bilinear-sample ``img_nchw`` [N,C,H,W] at pixel coords ix/iy [N,P].

    Returns [N, C, P] float32. Differentiable in image and coords.
    """
    return _call_fwd(img_nchw.astype(jnp.float32), ix.astype(jnp.float32),
                     iy.astype(jnp.float32), padding_mode, interpret)


def _sample_fwd(img, ix, iy, padding_mode, interpret):
    out = sample_pixel_coords(img, ix, iy, padding_mode, interpret)
    return out, (img, ix, iy)


def _sample_bwd(padding_mode, interpret, res, dout):
    img, ix, iy = res
    dimg, dix, diy = _call_bwd(
        img.astype(jnp.float32), ix.astype(jnp.float32),
        iy.astype(jnp.float32), dout.astype(jnp.float32),
        padding_mode, interpret)
    return dimg.astype(img.dtype), dix.astype(ix.dtype), diy.astype(iy.dtype)


sample_pixel_coords.defvjp(_sample_fwd, _sample_bwd)


def kernel_supported(channels: int) -> bool:
    return channels <= MAX_KERNEL_CHANNELS


# ---------------------------------------------------------------------------
# Public NHWC wrappers matching ops/sampling.py semantics.
# ---------------------------------------------------------------------------

def grid_sample(image, grid, *, align_corners=True, padding_mode="zeros",
                interpret=False):
    """NHWC/normalized-grid API, Pallas path. See ops.sampling.grid_sample."""
    from dynamic_multiview_3d_tpu.ops import sampling
    n, h, w, c = image.shape
    if not kernel_supported(c):
        return sampling._grid_sample_jnp(image, grid, align_corners,
                                         padding_mode)
    ho, wo = grid.shape[1:3]
    ix, iy = sampling.unnormalize_coords(grid.astype(jnp.float32), h, w,
                                         align_corners)
    img_nchw = jnp.transpose(image, (0, 3, 1, 2))
    out = sample_pixel_coords(img_nchw, ix.reshape(n, ho * wo),
                              iy.reshape(n, ho * wo), padding_mode, interpret)
    out = out.reshape(n, c, ho, wo)
    return jnp.transpose(out, (0, 2, 3, 1)).astype(image.dtype)


def flow_warp(image, flow, *, padding_mode="border", interpret=False):
    """Appearance-flow warp, Pallas path: skips grid normalization entirely —
    pixel coords = base grid + flow feed the kernel directly."""
    from dynamic_multiview_3d_tpu.ops import sampling
    n, h, w, c = image.shape
    if not kernel_supported(c):
        return sampling.flow_warp(image, flow, padding_mode=padding_mode,
                                  impl="jnp")
    coords = sampling.base_grid(h, w, jnp.float32)[None] \
        + flow.astype(jnp.float32)
    img_nchw = jnp.transpose(image, (0, 3, 1, 2))
    out = sample_pixel_coords(
        img_nchw, coords[..., 0].reshape(n, h * w),
        coords[..., 1].reshape(n, h * w), padding_mode, interpret)
    return jnp.transpose(out.reshape(n, c, h, w), (0, 2, 3, 1)) \
        .astype(image.dtype)
