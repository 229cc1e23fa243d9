"""Shared utilities: profiling, debugging, tree helpers."""

from dynamic_multiview_3d_tpu.utils.profiling import TraceWindow
from dynamic_multiview_3d_tpu.utils.debugging import debug_mode

__all__ = ["TraceWindow", "debug_mode"]
