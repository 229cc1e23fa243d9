"""Geometry ops (SURVEY.md T2): pose encodings, camera math, sampling.

Pure jax.numpy implementations are the correctness reference; the hot ones
(grid_sample / flow_warp) have Pallas TPU implementations in ``kernels/``
selected via ``impl='pallas'``.
"""

from dynamic_multiview_3d_tpu.ops.pose import (
    encode_pose,
    encode_view_pair,
    intrinsics_matrix,
    look_at_extrinsics,
    pose_to_features,
    relative_transform,
)
from dynamic_multiview_3d_tpu.ops.sampling import (
    base_grid,
    flow_warp,
    grid_sample,
    grid_sample_nchw,
)
from dynamic_multiview_3d_tpu.ops.reproject import (
    depth_reproject_sample,
    reproject_coords,
)

__all__ = [
    "encode_pose", "encode_view_pair", "intrinsics_matrix",
    "look_at_extrinsics", "pose_to_features", "relative_transform",
    "base_grid", "flow_warp", "grid_sample", "grid_sample_nchw",
    "depth_reproject_sample", "reproject_coords",
]
