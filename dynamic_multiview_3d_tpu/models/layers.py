"""Building-block layers (SURVEY.md R6/R12 -> T3).

All convs are NHWC (TPU-native); normalization is GroupNorm — no batch
statistics, so data-parallel training needs no cross-device stat sync and
eval == train numerics. Compute dtype is configurable (bf16 on TPU keeps the
MXU fed); parameters stay float32.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def _num_groups(features: int) -> int:
    g = min(8, features)
    while features % g:
        g -= 1
    return g


class FastGroupNorm(nn.Module):
    """GroupNorm whose stats come from fused bf16->f32 reductions.

    flax's ``nn.GroupNorm`` converts the whole activation to f32 before the
    reductions; at 128² decoder shapes that materialized f32 copy was
    ~0.8 ms per call in the round-2 xprof trace (the decoder's single
    biggest non-conv cost). Here the converts fuse INTO the reduces (no
    f32 tensor ever lands in HBM) and the normalization is one fused
    per-channel scale/shift in the compute dtype. Same math and param names
    (scale/bias) as nn.GroupNorm up to dtype rounding, EXCEPT epsilon:
    flax defaults to 1e-6; this uses 1e-5 — torch's GroupNorm default,
    matching the torch-CPU stand-in reference the benchmarks compare
    against (benchmarks/torch_oracle.py), and what every shipped
    checkpoint was trained with."""

    num_groups: int
    dtype: Any = jnp.float32
    epsilon: float = 1e-5            # torch parity; flax would be 1e-6

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        g = self.num_groups
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        n = x.shape[0]
        spatial = int(np.prod(x.shape[1:-1]))
        xg = x.reshape(n, spatial, g, c // g)
        xf = xg.astype(jnp.float32)
        mean = jnp.mean(xf, axis=(1, 3))                       # [n, g]
        mean2 = jnp.mean(jnp.square(xf), axis=(1, 3))
        inv = jax.lax.rsqrt(jnp.maximum(mean2 - mean * mean, 0.0)
                            + self.epsilon)
        # fold group stats + channel affine into one scale/shift per (n, c)
        s = inv[:, :, None] * scale.reshape(g, -1)[None]       # [n, g, c/g]
        b = bias.reshape(g, -1)[None] - mean[:, :, None] * s
        shape = (n,) + (1,) * (x.ndim - 2) + (c,)
        s = s.reshape(shape).astype(self.dtype)
        b = b.reshape(shape).astype(self.dtype)
        return x.astype(self.dtype) * s + b


class ConvBlock(nn.Module):
    """Conv -> GroupNorm -> activation, the encoder/decoder workhorse."""

    features: int
    stride: int = 1
    kernel: int = 3
    norm: str = "group"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride), padding="SAME",
                    dtype=self.dtype, name="conv")(x)
        if self.norm == "group":
            x = FastGroupNorm(num_groups=_num_groups(self.features),
                              dtype=self.dtype, name="norm")(x)
        return nn.relu(x)


class ConvGRUCell(nn.Module):
    """Convolutional GRU over spatial feature maps (SURVEY.md R12).

    Carries dynamic-scene state across video frames; applied at the
    bottleneck resolution under ``jax.lax.scan`` (models/dmv3d.py), so the
    whole recurrence — forward and backward — stays inside one XLA program.
    """

    features: int
    kernel: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, h: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
        k = (self.kernel, self.kernel)
        hx = jnp.concatenate([h, x], axis=-1)
        gates = nn.Conv(2 * self.features, k, padding="SAME",
                        dtype=self.dtype, name="gates")(hx)
        z, r = jnp.split(gates, 2, axis=-1)
        z = nn.sigmoid(z)
        r = nn.sigmoid(r)
        cand = nn.Conv(self.features, k, padding="SAME",
                       dtype=self.dtype, name="cand")(
            jnp.concatenate([r * h, x], axis=-1))
        cand = jnp.tanh(cand)
        return (1.0 - z) * h + z * cand

    @staticmethod
    def init_state(batch: int, height: int, width: int, features: int,
                   dtype: Any = jnp.float32) -> jnp.ndarray:
        return jnp.zeros((batch, height, width, features), dtype)


class ConvLSTMCell(nn.Module):
    """Convolutional LSTM (the reference genre's other recurrent choice,
    BASELINE.json:5 "ConvLSTM/GRU-style"). State is (h, c) packed along the
    channel axis so both cells share one carry signature in the scan."""

    features: int
    kernel: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, state: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
        h, c = jnp.split(state, 2, axis=-1)
        k = (self.kernel, self.kernel)
        gates = nn.Conv(4 * self.features, k, padding="SAME",
                        dtype=self.dtype, name="gates")(
            jnp.concatenate([h, x], axis=-1))
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        i = nn.sigmoid(i)
        f = nn.sigmoid(f + 1.0)          # forget-gate bias init trick
        g = jnp.tanh(g)
        o = nn.sigmoid(o)
        c = f * c + i * g
        h = o * jnp.tanh(c)
        return jnp.concatenate([h, c], axis=-1)

    @staticmethod
    def init_state(batch: int, height: int, width: int, features: int,
                   dtype: Any = jnp.float32) -> jnp.ndarray:
        return jnp.zeros((batch, height, width, 2 * features), dtype)

    @staticmethod
    def hidden(state: jnp.ndarray, features: int) -> jnp.ndarray:
        return state[..., :features]


def upsample2x(x: jnp.ndarray) -> jnp.ndarray:
    """Nearest-neighbor 2x upsample via reshape/broadcast.

    Pure data movement that XLA fuses into the following conv — cheaper and
    layout-friendlier on TPU than transposed convolution, and free of its
    checkerboard artifacts.
    """
    n, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (n, h, 2, w, 2, c))
    return x.reshape(n, 2 * h, 2 * w, c)


def depth_to_space2(x: jnp.ndarray) -> jnp.ndarray:
    """[N, H, W, 4C] -> [N, 2H, 2W, C] (pixel shuffle, phase order (dy, dx)).

    The decoder's subpixel upsampling: a conv at LOW resolution emits the
    4 high-res phases as channels; this reshuffle is pure data movement
    that XLA folds into the surrounding ops."""
    n, h, w, c4 = x.shape
    c = c4 // 4
    x = x.reshape(n, h, w, 2, 2, c)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
    return x.reshape(n, 2 * h, 2 * w, c)
