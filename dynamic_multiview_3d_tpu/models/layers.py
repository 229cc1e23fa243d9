"""Building-block layers (SURVEY.md R6/R12 -> T3).

All convs are NHWC (TPU-native); normalization is GroupNorm — no batch
statistics, so data-parallel training needs no cross-device stat sync and
eval == train numerics. Compute dtype is configurable (bf16 on TPU keeps the
MXU fed); parameters stay float32.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp


def _num_groups(features: int) -> int:
    g = min(8, features)
    while features % g:
        g -= 1
    return g


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
            x = nn.GroupNorm(num_groups=_num_groups(self.features),
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


def upsample2x(x: jnp.ndarray) -> jnp.ndarray:
    """Nearest-neighbor 2x upsample via reshape/broadcast.

    Pure data movement that XLA fuses into the following conv — cheaper and
    layout-friendlier on TPU than transposed convolution, and free of its
    checkerboard artifacts.
    """
    n, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (n, h, 2, w, 2, c))
    return x.reshape(n, 2 * h, 2 * w, c)
