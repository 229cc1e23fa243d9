"""Pallas TPU grid-sample (placeholder — M5 replaces with the one-hot-MXU

kernel; until then the jnp gather path is used so ``impl='pallas'`` is safe
to request anywhere)."""

from dynamic_multiview_3d_tpu.ops import sampling as _sampling


def grid_sample(image, grid, *, align_corners=True, padding_mode="zeros"):
    return _sampling._grid_sample_jnp(image, grid, align_corners, padding_mode)
