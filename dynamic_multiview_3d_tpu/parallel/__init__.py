"""Parallelism layer (SURVEY.md §2b/§2c).

Data parallelism via ``shard_map`` + ``psum`` over an ICI mesh is the
required strategy; an optional 'model' mesh axis shards the widest
conv/dense channels through GSPMD sharding annotations (plumbing exercised
even though this small convnet doesn't need TP). No user-level communication
library — the backend is XLA collectives over ICI/DCN.
"""

from dynamic_multiview_3d_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    replicate,
)

__all__ = ["batch_sharding", "make_mesh", "replicate"]
