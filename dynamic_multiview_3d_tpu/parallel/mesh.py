"""Device mesh construction + sharding helpers (SURVEY.md T7/§2b).

Mesh axes: ('data', 'model'). All code is mesh-shape-agnostic: the same
train step runs on 1 chip, a v5e-8 slice, or a multi-host v5e-32 (DCN x ICI)
— only the mesh changes. ``jax.make_mesh`` orders devices so that, on real
slices, the trailing axes ride ICI.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dynamic_multiview_3d_tpu.config import MeshConfig


def make_mesh(cfg: MeshConfig | None = None, devices=None) -> Mesh:
    cfg = cfg or MeshConfig()
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    model = max(1, cfg.model)
    data = cfg.data if cfg.data > 0 else n // model
    if data * model > n:
        raise ValueError(
            f"mesh {data}x{model} needs {data * model} devices, have {n}")
    dev = np.asarray(devices[: data * model]).reshape(data, model)
    return Mesh(dev, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batches shard along 'data' on their leading axis, replicated on 'model'."""
    return NamedSharding(mesh, P("data"))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: dict, spec: P | None = None) -> dict:
    """Host numpy batch -> global device arrays sharded along 'data'.

    Works identically single-host (device_put splits locally) and multi-host
    (each process contributes its local shard of the global batch via
    make_array_from_process_local_data). ``spec`` overrides the default
    leading-axis P('data') — e.g. P(None, 'data') for steps_per_dispatch
    batches whose leading axis is the dispatch's scan axis.
    """
    sharding = (batch_sharding(mesh) if spec is None
                else NamedSharding(mesh, spec))
    if jax.process_count() == 1:
        return jax.device_put(batch, sharding)
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(sharding, x), batch)


def model_axis_rules(params, mesh: Mesh, min_size: int = 128):
    """NamedSharding pytree for params: shard the output-channel dim of
    large conv kernels / dense matrices along 'model'; replicate the rest.

    This is the optional tensor-parallel plumbing (SURVEY.md §2b): with
    model=1 it degenerates to full replication.
    """
    model_n = mesh.shape["model"]

    def rule(x):
        if (model_n > 1 and hasattr(x, "ndim") and x.ndim >= 2
                and x.shape[-1] >= min_size and x.shape[-1] % model_n == 0):
            spec = (None,) * (x.ndim - 1) + ("model",)
            return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    return jax.tree.map(rule, params)
