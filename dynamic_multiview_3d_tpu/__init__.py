"""dynamic_multiview_3d_tpu — TPU-native dynamic multiview 3D view synthesis.

A brand-new JAX/XLA/Pallas framework with the capabilities of the TF1-era
research codebase ``aclike/dynamic_multiview_3d`` (reference checkout empty at
survey time — see SURVEY.md §0; capability surface defined by BASELINE.json):

- pose-conditioned conv encoder–decoder with skip connections
- appearance-flow bilinear warping + soft visibility mask compositing
- depth-reprojection view synthesis layers
- ConvGRU recurrence over video frames (dynamic scenes) via ``jax.lax.scan``
- ``predict(image_seq, target_poses) -> novel-view tensors`` public API
- checkpoint-loadable model definition (Orbax)
- data-parallel training via ``shard_map`` + ``psum`` over ICI meshes

Layout (SURVEY.md §1b):
    kernels/   Pallas TPU kernels (grid-sample / flow-warp as one-hot MXU matmuls)
    ops/       geometry ops: pose math, grid-sample, depth reprojection
    models/    Flax modules: Encoder, PoseBottleneck, Decoder, ConvGRU, DMV3D
    data/      synthetic renderer + Grain/host input pipeline + native packer
    train/     losses, train state, jitted train step, Orbax ckpt, metrics
    parallel/  mesh construction + sharding rules (dp + optional model axis)
    cli/       train / eval / predict entry points
"""

from dynamic_multiview_3d_tpu import config

__version__ = "0.1.0"

__all__ = ["config", "Model", "predict", "__version__"]


def __getattr__(name):
    # Lazy: importing the package must not pull in flax/orbax for users who
    # only need ops/config (and keeps `import dynamic_multiview_3d_tpu` cheap).
    if name in ("Model", "predict"):
        from dynamic_multiview_3d_tpu import api
        return getattr(api, name)
    raise AttributeError(name)
