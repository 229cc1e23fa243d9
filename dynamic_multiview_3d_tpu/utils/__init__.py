"""Shared utilities: profiling, debugging, tree helpers."""

from dynamic_multiview_3d_tpu.utils.profiling import profile_trace
from dynamic_multiview_3d_tpu.utils.debugging import debug_mode

__all__ = ["profile_trace", "debug_mode"]
