"""Input pipeline (SURVEY.md T1): synthetic renderer, frame-folder video

source, Grain host pipeline with per-process sharding, native C++ packer."""

from dynamic_multiview_3d_tpu.data.synthetic import SyntheticScenes

__all__ = ["SyntheticScenes"]
