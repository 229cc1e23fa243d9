"""Pallas TPU bilinear grid-sample / flow-warp (SURVEY.md R10/R9 -> T0).

TPU-first formulation — no gather, no scatter. For a block of P output
pixels with continuous source coords (ix, iy), the bilinear weight of source
row h for coordinate iy is the TENT function

    W_y[h, p] = relu(1 - |h - iy_p|)         # built in 3 VPU passes

(a two-nonzero column holding exactly (1-frac, frac) at rows floor(iy),
floor(iy)+1 — the y-direction gather AND lerp in one matrix), so

    tmp    = img^T-contract W_y              # [H,W] x [H,P] — MXU
    out[p] = sum_w tmp[w, p] * W_x[w, p]     # x-lerp: lane reduction — VPU

Round 1 built W from 4 explicit masked one-hot matrices (~8 VPU passes per
axis and two matmuls per channel in fast mode); the tent form is the round-2
profile fix — the kernel was VPU-bound on weight construction (2.84 ms of an
11.1 ms c2 forward), not MXU-bound. The backward pass is the transpose of
the same algebra, so the scatter-add of gradients to 4 neighbors (the
classically painful part on TPU, SURVEY.md §7 hard-part #1) is also just
matmuls:

    d_img  = W_y contract_P (W_x * d_out)    # MXU scatter-add
    d_ix   = d_out * sum_w tmp * U_x         # U_* = d W_* / d coord
    d_iy   = d_out * sum_w (U_y-contract img) * W_x

with U the tent's subgradient under the floor-tap convention (matches
torch): -1 on -1 < h-c <= 0, +1 on 0 < h-c <= 1, else 0.

Padding modes: "zeros" — out-of-range taps have no rows, so the tent masks
them for free (values and coord-gradients match torch's grid_sample);
"border" — coords are clamped before the tent and coordinate gradients are
zeroed outside the valid range (torch's clip_coordinates behavior).

Kernel layout: grid (batch, pixel-block); channels are a static in-kernel
loop so the tent weights are built once per block and shared. Images are
NCHW inside the kernel ([H, W] tiles, W on lanes); pixels ride the LANE axis
everywhere else (coords/outputs [.., 1, P], transposed weights [H|W, P]),
so the kernel body has zero relayouts and zero lane-padding waste. The
public wrappers take and return the framework's NHWC. d_img accumulates
across pixel-block grid steps (consecutive revisits of the same output
block — pipeline-safe).

``flow_warp_composite`` additionally fuses the model's compositing
(mask*warped + (1-mask)*rgb) and the mask-loss validity target into the same
kernel, so heads -> warp -> composite never round-trips HBM
(BASELINE.json north_star: kernels "fused with the adjacent" ops).
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


# Scoped-VMEM planning. The BACKWARD kernel is the binding constraint, and
# its true per-grid-step footprint is Mosaic's to decide (input/output
# pipelining buffers, matmul staging), so the planner is calibrated
# EMPIRICALLY: _VALIDATED_PB records the largest pixel block per
# (mode, H, W) that compiled AND ran on v5e hardware (probed 2026-08-17;
# the probe also mapped the failure boundary — exact 256² OOMs scoped VMEM
# at pb=1024 with 19.9 MB and 512² at pb=512 with 25.3 MB against the
# 16 MB limit). "fast" (single-pass bf16 matmuls) is strictly lighter than
# "exact", so a fast lookup falls back to the exact entry. Off-table shapes
# use a conservative linear model fitted to the measured Mosaic stack
# sizes, shrinking pb until it fits — or rejecting the kernel outright
# (kernel_supported), so big shapes are *decided* onto the jnp path
# instead of discovered as Mosaic VMEM failures.
_VALIDATED_PB = {
    ("exact", 64, 64): 2048,
    ("exact", 128, 128): 2048,
    ("exact", 256, 256): 512,
    ("exact", 512, 512): 256,
    ("fast", 256, 256): 2048,
    ("fast", 512, 512): 512,
}

VMEM_BUDGET_WORDS = 4 * 1024 * 1024        # 16 MB scoped VMEM, in f32 words


def _validated_cap(mode: str, h: int, w: int, c: int) -> int | None:
    if c > 4:        # table was probed at c=3; RGB(+A) images only
        return None
    cap = _VALIDATED_PB.get((mode, h, w))
    if cap is None and mode == "fast":      # fast fits wherever exact does
        cap = _VALIDATED_PB.get(("exact", h, w))
    return cap


def _vmem_words(c: int, h: int, w: int, pb: int) -> int:
    """Conservative f32-word model of the backward kernel's Mosaic stack for
    OFF-TABLE shapes, fitted to measured failures (c=3: 39.1 MB at
    256²/pb2048, 19.9 MB at 256²/pb1024, 25.3 MB at 512²/pb512): the
    image-sized buffers (img + dimg with pipelining, matmul staging) scale
    with C·H·W; the tent/grad/temp matrices scale with pb·(H+W)."""
    return (5 * c + 2) * h * w // 2 + 10 * pb * (h + w)


def _plan(total: int, c: int | None = None, h: int | None = None,
          w: int | None = None, mode: str = "exact",
          zeros_bwd: bool = False) -> int:
    """Pixel-block size pb for coords shaped [N, nb, 1, pb], block (1,1,1,pb).

    Pixels ride the LANE axis end to end: the one-hot weights are built
    transposed ([H, P] / [W, P], lane-oriented), the gather matmul contracts
    over sublanes via dot_general, and the x-reduction collapses the sublane
    axis into a (1, P) lane vector — no relayouts, and none of the 128x
    VMEM/DMA padding a (P, 1) sublane layout would cost. pb must divide
    ``total`` and (compiled) be a multiple of 128 — callers fall back to the
    jnp path otherwise (kernel_supported).

    With image dims (c, h, w) given, pb is additionally capped by the
    hardware-validated table for (mode, h, w), else shrunk until the
    conservative VMEM model fits; kernel_supported rejects shapes where
    even pb=128 won't fit."""
    if total % 128 != 0:
        return total                                         # single block
    pb = 128 * _pixel_block(total // 128, target=16)         # pb <= 2048
    if c is None:
        return pb
    # The zeros-padding BACKWARD needs ~2% more Mosaic stack than the
    # border-padding probe behind _VALIDATED_PB (measured: 16.28 MB vs the
    # 16 MB scoped limit at 128²/pb=2048 under jvp-transpose, 2026-08-17) —
    # the table's caps don't transfer, so it plans on the conservative
    # model instead (128² lands at pb=1024: 11 MB modeled, probed green on
    # v5e for both precisions).
    cap = None if zeros_bwd else _validated_cap(mode, h, w, c)
    if cap is not None:
        while pb > cap:
            # next-smaller 128-multiple divisor of total
            pb = 128 * _pixel_block(total // 128, target=pb // 128 - 1)
        return pb
    while pb > 128 and _vmem_words(c, h, w, pb) > VMEM_BUDGET_WORDS:
        pb = 128 * _pixel_block(total // 128, target=pb // 128 - 1)
    return pb


def _tent_t(coord_row, size, padding_mode):
    """coord [1, P] -> W [size, P] bilinear tent weights, f32.

    W[h, p] = relu(1 - |h - c_p|): a two-nonzero column holding exactly
    (1-frac, frac) at rows floor(c), floor(c)+1. In "zeros" mode an
    out-of-range tap simply has no row, which masks it for free; in
    "border" mode the coordinate is clamped first (the edge row then gets
    the full weight)."""
    if padding_mode == "border":
        coord_row = jnp.clip(coord_row, 0.0, float(size - 1))
    p = coord_row.shape[1]
    iota = jax.lax.broadcasted_iota(jnp.int32, (size, p), 0) \
        .astype(jnp.float32)                  # Mosaic: iota must be integer
    return jnp.maximum(0.0, 1.0 - jnp.abs(iota - coord_row))


def _tent_grad_t(coord_row, size, padding_mode):
    """U [size, P] = dW/dcoord under the floor-tap convention (matches
    torch): -1 where -1 < h-c <= 0, +1 where 0 < h-c <= 1, else 0 — so at
    exactly-integer coords the gradient is the forward difference
    img[c+1] - img[c], like the explicit (floor, floor+1) tap pair. In
    border mode the gradient is zeroed where the original coordinate is
    out of range (clamp has zero slope there)."""
    inb = None
    if padding_mode == "border":
        inb = ((coord_row >= 0.0) & (coord_row <= float(size - 1)))
        inb = inb.astype(jnp.float32)
        coord_row = jnp.clip(coord_row, 0.0, float(size - 1))
    p = coord_row.shape[1]
    iota = jax.lax.broadcasted_iota(jnp.int32, (size, p), 0) \
        .astype(jnp.float32)
    d = iota - coord_row
    u = jnp.where((d > -1.0) & (d <= 0.0), -1.0,
                  jnp.where((d > 0.0) & (d <= 1.0), 1.0, 0.0))
    if inb is not None:
        u = u * inb
    return u


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


def _sample_rows(ix, iy, load, *, channels, h, w, padding_mode, mode):
    """Shared sampling body: yields (c, sampled [1, P]) per channel.

    ``load(c)`` returns the channel's [H, W] image tile — a callable rather
    than a ref so multi-source kernels can index interior batch dims
    directly (Mosaic rejects ``.at[]`` sub-refs whose trailing dims aren't
    tile-aligned; plain integer indexing has no such constraint)."""
    wx_t = _tent_t(ix, w, padding_mode)                   # [W, P] f32
    wy_t = _tent_t(iy, h, padding_mode)                   # [H, P] f32
    if mode == "exact":
        for c in range(channels):                         # static unroll
            # img [H,W] x wy_t [H,P] -> tmp_t [W,P]: gather+y-lerp on MXU
            tmp_t = _contract_first(load(c), wy_t)
            # x-lerp: weighted sublane reduction -> (1, P) lane vector
            yield c, jnp.sum(tmp_t * wx_t, axis=0, keepdims=True)
        return
    # fast: single-pass bf16 matmul (f32 accumulate); only the image's and
    # weights' bf16 truncation remains as error (~3 decimal digits).
    wy_b = wy_t.astype(jnp.bfloat16)
    for c in range(channels):
        img_b = load(c).astype(jnp.bfloat16)
        tmp_t = _contract_lo(img_b, wy_b)                 # [W, P] f32 out
        yield c, jnp.sum(tmp_t * wx_t, axis=0, keepdims=True)


def _fwd_kernel(ix_ref, iy_ref, img_ref, out_ref, *, channels, h, w,
                padding_mode, mode):
    ix = ix_ref[0, 0]                                     # [1, P] lanes
    iy = iy_ref[0, 0]
    for c, val in _sample_rows(ix, iy, lambda c: img_ref[0, c],
                               channels=channels, h=h, w=w,
                               padding_mode=padding_mode, mode=mode):
        out_ref[0, c, 0] = val


def _fwd_composite_kernel(ix_ref, iy_ref, img_ref, mask_ref, rgb_ref,
                          view_ref, warped_ref, valid_ref, *, channels, h, w,
                          padding_mode, mode):
    """Fused heads->warp->composite: view = mask*warp + (1-mask)*rgb, plus
    the warp itself and the in-bounds validity (the mask-loss target)."""
    ix = ix_ref[0, 0]                                     # [1, P] lanes
    iy = iy_ref[0, 0]
    m = mask_ref[0, 0]                                    # [1, P]
    valid_ref[0, 0] = (((ix >= 0.0) & (ix <= float(w - 1))
                        & (iy >= 0.0) & (iy <= float(h - 1)))
                       .astype(jnp.float32))
    for c, val in _sample_rows(ix, iy, lambda c: img_ref[0, c],
                               channels=channels, h=h, w=w,
                               padding_mode=padding_mode, mode=mode):
        warped_ref[0, c, 0] = val
        view_ref[0, c, 0] = m * val + (1.0 - m) * rgb_ref[0, c, 0]


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

    wy_t = _tent_t(iy, h, padding_mode)                   # [H, P]
    uy_t = _tent_grad_t(iy, h, padding_mode)
    wx_t = _tent_t(ix, w, padding_mode)                   # [W, P]
    ux_t = _tent_grad_t(ix, w, padding_mode)

    if mode == "exact":
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

    # fast: single-pass bf16 matmuls, f32 accumulate. U is exactly ±1/0 in
    # bf16; the tent weights and image values see bf16 truncation.
    wy_b = wy_t.astype(jnp.bfloat16)
    uy_b = uy_t.astype(jnp.bfloat16)
    wx_b = wx_t.astype(jnp.bfloat16)
    for c in range(channels):
        img_b = img_ref[0, c].astype(jnp.bfloat16)
        dout = dout_ref[0, c, 0]                          # [1, P]
        dimg_ref[0, c] += _contract_lo((wy_t * dout).astype(jnp.bfloat16),
                                       wx_b, last=True)
        tmp_t = _contract_lo(img_b, wy_b)                 # [W, P]
        dtmp_dy_t = _contract_lo(img_b, uy_b)             # [W, P]
        dix += jnp.sum(tmp_t * ux_t, axis=0, keepdims=True) * dout
        diy += jnp.sum(dtmp_dy_t * wx_t, axis=0, keepdims=True) * dout
    dix_ref[0, 0] = dix
    diy_ref[0, 0] = diy


def _call_fwd(img_nchw, ix, iy, padding_mode, interpret, mode):
    n, c, h, w = img_nchw.shape
    total = ix.shape[1]
    pb = _plan(total, c, h, w, mode)
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
    pb = _plan(total, c, h, w, mode, zeros_bwd=(padding_mode == "zeros"))
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


def _call_fwd_composite(img_nchw, ix, iy, mask, rgb, padding_mode, interpret,
                        mode):
    """mask [N, P], rgb [N, C, P] -> (view, warped [N,C,P], valid [N,P])."""
    n, c, h, w = img_nchw.shape
    total = ix.shape[1]
    pb = _plan(total, c, h, w, mode)
    nb = total // pb
    ix4 = ix.reshape(n, nb, 1, pb)
    iy4 = iy.reshape(n, nb, 1, pb)
    mask4 = mask.reshape(n, nb, 1, pb)
    rgb5 = rgb.reshape(n, c, nb, 1, pb)
    kernel = functools.partial(_fwd_composite_kernel, channels=c, h=h, w=w,
                               padding_mode=padding_mode, mode=mode)
    coord_spec = pl.BlockSpec((1, 1, 1, pb), lambda ni, bi: (ni, bi, 0, 0),
                              memory_space=pltpu.VMEM)
    chan_spec = pl.BlockSpec((1, c, 1, 1, pb),
                             lambda ni, bi: (ni, 0, bi, 0, 0),
                             memory_space=pltpu.VMEM)
    view, warped, valid = pl.pallas_call(
        kernel,
        grid=(n, nb),
        in_specs=[
            coord_spec, coord_spec,
            pl.BlockSpec((1, c, h, w), lambda ni, bi: (ni, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            coord_spec, chan_spec,
        ],
        out_specs=[chan_spec, chan_spec, coord_spec],
        out_shape=[
            jax.ShapeDtypeStruct((n, c, nb, 1, pb), jnp.float32),
            jax.ShapeDtypeStruct((n, c, nb, 1, pb), jnp.float32),
            jax.ShapeDtypeStruct((n, nb, 1, pb), jnp.float32),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * n * c * total * h,
            bytes_accessed=4 * n * c * (h * w + 6 * total),
            transcendentals=0),
    )(ix4, iy4, img_nchw, mask4, rgb5)
    return (view.reshape(n, c, total), warped.reshape(n, c, total),
            valid.reshape(n, total))


# ---------------------------------------------------------------------------
# Differentiable pixel-coordinate sampler (custom VJP around the kernels).
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def sample_pixel_coords(img_nchw, ix, iy, padding_mode="zeros",
                        interpret=False, precision="exact"):
    """Bilinear-sample ``img_nchw`` [N,C,H,W] at pixel coords ix/iy [N,P].

    Returns [N, C, P] float32. Differentiable in image and coords.
    precision="exact" keeps f32 everywhere (3-pass MXU dots);
    "fast" runs single-pass bf16 matmuls — image, tent weights and gradient
    values see bf16 truncation (~3 decimal digits), several times faster.
    The model uses "fast" by default (cfg.model.warp_precision).
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


def kernel_supported(channels: int, total_pixels: int | None = None,
                     height: int | None = None, width: int | None = None,
                     mode: str = "exact") -> bool:
    """Whether the Pallas kernel handles this shape (else: jnp fallback).

    channels bounds the per-grid-step image VMEM tile; non-128-multiple
    pixel counts are only safe as a single block up to
    MAX_SINGLE_BLOCK_PIXELS (see _plan). With image dims given, the shape
    must either sit in the hardware-validated (mode, h, w) table or fit the
    conservative VMEM model at the planned pixel block — shapes that can't
    fit even at pb=128 are *decided* onto the jnp path instead of
    discovered as Mosaic VMEM failures.
    """
    if channels > MAX_KERNEL_CHANNELS:
        return False
    if (total_pixels is not None and total_pixels % 128 != 0
            and total_pixels > MAX_SINGLE_BLOCK_PIXELS):
        return False
    if height is not None and total_pixels is not None:
        if _validated_cap(mode, height, width, channels) is not None:
            return True
        pb = _plan(total_pixels, channels, height, width, mode)
        if _vmem_words(channels, height, width, pb) > VMEM_BUDGET_WORDS:
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
    if not kernel_supported(c, ho * wo, h, w, precision):
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
    if not kernel_supported(c, h * w, h, w, precision):
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


# ---------------------------------------------------------------------------
# Fused warp + composite (+ validity) — the north-star fusion (BASELINE.json).
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def _warp_composite_pix(img_nchw, ix, iy, mask, rgb, padding_mode="border",
                        interpret=False, precision="exact"):
    """Fused (view, warped, valid) at pixel coords; mask [N,P], rgb [N,C,P].

    view = mask * sample(img, ix, iy) + (1-mask) * rgb;
    valid = 1 where (ix, iy) lands inside the image (mask-loss target).
    Differentiable in img, coords, mask, rgb; valid has zero gradient.
    """
    return _call_fwd_composite(
        img_nchw.astype(jnp.float32), ix.astype(jnp.float32),
        iy.astype(jnp.float32), mask.astype(jnp.float32),
        rgb.astype(jnp.float32), padding_mode, interpret, precision)


def _wc_fwd(img, ix, iy, mask, rgb, padding_mode, interpret, precision):
    out = _warp_composite_pix(img, ix, iy, mask, rgb, padding_mode,
                              interpret, precision)
    view, warped, valid = out
    return out, (img, ix, iy, mask, rgb, warped)


def _wc_bwd(padding_mode, interpret, precision, res, cots):
    img, ix, iy, mask, rgb, warped = res
    d_view, d_warped, _ = cots                 # valid is a step fn: no grad
    d_view = d_view.astype(jnp.float32)
    m = mask.astype(jnp.float32)[:, None, :]   # [N,1,P]
    # chain rule through the composite (all elementwise — XLA fuses):
    ds = d_view * m + d_warped.astype(jnp.float32)       # sample cotangent
    dmask = jnp.sum(d_view * (warped - rgb.astype(jnp.float32)), axis=1)
    drgb = (d_view * (1.0 - m)).astype(rgb.dtype)
    dimg, dix, diy = _call_bwd(
        img.astype(jnp.float32), ix.astype(jnp.float32),
        iy.astype(jnp.float32), ds, padding_mode, interpret, precision)
    return (dimg.astype(img.dtype), dix.astype(ix.dtype),
            diy.astype(iy.dtype), dmask.astype(mask.dtype), drgb)


_warp_composite_pix.defvjp(_wc_fwd, _wc_bwd)


def flow_warp_composite(image, flow, mask, rgb, *, padding_mode="border",
                        interpret=False, precision="exact"):
    """Fused appearance-flow synthesis (NHWC):

        warped = bilinear(image, base_grid + flow)
        view   = mask * warped + (1 - mask) * rgb
        valid  = in-bounds(base_grid + flow)     # the mask-loss target

    in ONE Pallas kernel — the decoder heads' outputs feed the warp and the
    composite without round-tripping HBM (SURVEY.md R9/R13; the
    BASELINE.json north-star "fused with the adjacent" mandate). Falls back
    to the unfused jnp composition off-TPU/unsupported shapes.

    image [N,H,W,C]; flow [N,H,W,2] (pixel units); mask [N,H,W,1];
    rgb [N,H,W,C] -> (view, warped, valid[N,H,W]), all float32.
    """
    from dynamic_multiview_3d_tpu.ops import sampling
    n, h, w, c = image.shape
    if not kernel_supported(c, h * w, h, w, precision):
        warped = sampling.flow_warp(image.astype(jnp.float32), flow,
                                    padding_mode=padding_mode, impl="jnp")
        valid = sampling.in_bounds_mask(flow.astype(jnp.float32), h, w)
        view = mask * warped + (1.0 - mask) * rgb
        return view, warped, valid
    coords = sampling.base_grid(h, w, jnp.float32)[None] \
        + flow.astype(jnp.float32)
    img_nchw = jnp.transpose(image, (0, 3, 1, 2))
    rgb_ncp = jnp.transpose(rgb, (0, 3, 1, 2)).reshape(n, c, h * w)
    view, warped, valid = _warp_composite_pix(
        img_nchw, coords[..., 0].reshape(n, h * w),
        coords[..., 1].reshape(n, h * w), mask.reshape(n, h * w), rgb_ncp,
        padding_mode, interpret, precision)
    def back(x):
        return jnp.transpose(x.reshape(n, c, h, w), (0, 2, 3, 1))
    return back(view), back(warped), valid.reshape(n, h, w)
