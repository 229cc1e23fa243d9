"""Flax model family (SURVEY.md T3): pose-conditioned encoder-decoder with

skip connections, ConvGRU temporal recurrence, flow/mask/rgb(/depth) heads."""

from dynamic_multiview_3d_tpu.models.layers import ConvBlock, ConvGRUCell
from dynamic_multiview_3d_tpu.models.dmv3d import (
    DMV3D,
    Decoder,
    Encoder,
    PoseBottleneck,
)

__all__ = ["ConvBlock", "ConvGRUCell", "DMV3D", "Decoder", "Encoder",
           "PoseBottleneck"]
