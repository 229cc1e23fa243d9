"""Checkpointing (SURVEY.md R16 -> Orbax).

The reference's ``tf.train.Saver`` role is filled by Orbax (pytree,
tensorstore-backed, atomic commits). Two surfaces:

- model checkpoints: ``save_model`` / ``load_model`` — the
  "checkpoint-loadable model definition" of the public API (BASELINE.json:5);
  the config rides along as JSON so ``Model.from_checkpoint(path)`` is
  self-contained.
- training checkpoints: ``make_manager`` — CheckpointManager with
  ``max_to_keep`` + ``save_interval_steps`` for exact resume (params, opt
  state, step). Restart-from-checkpoint is the failure-recovery policy
  (SURVEY.md §5); fault-injection tests assert exact resume.

A TF1 import shim (``import_tf1_checkpoint``) maps reference Saver
checkpoints onto our pytree — mechanism shipped, name map TODO until a real
reference checkout exists (SURVEY.md §0).
"""

from __future__ import annotations

import json
import os

import jax
import orbax.checkpoint as ocp

from dynamic_multiview_3d_tpu import config as config_lib


def save_model(path: str, params, cfg: config_lib.Config, step: int = 0
               ) -> None:
    path = os.path.abspath(path)
    os.makedirs(path, exist_ok=True)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(os.path.join(path, f"params_{step}"), params, force=True)
    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump({"config": config_lib.to_dict(cfg), "step": step}, f,
                  indent=2)


def load_model(path: str):
    """-> (params, cfg, step)."""
    path = os.path.abspath(path)
    with open(os.path.join(path, "config.json")) as f:
        meta = json.load(f)
    cfg = config_lib.from_dict(meta["config"])
    step = meta["step"]
    with ocp.StandardCheckpointer() as ckptr:
        params = ckptr.restore(os.path.join(path, f"params_{step}"))
    return params, cfg, step


def make_manager(ckpt_dir: str, max_to_keep: int = 3,
                 save_interval_steps: int = 1000) -> ocp.CheckpointManager:
    return ocp.CheckpointManager(
        os.path.abspath(ckpt_dir),
        options=ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep,
            save_interval_steps=save_interval_steps,
            create=True,
        ),
    )


def import_tf1_checkpoint(tf1_ckpt_prefix: str, name_map: dict[str, str],
                          template_params):
    """Map a TF1 ``tf.train.Saver`` checkpoint onto our params pytree.

    name_map: TF1 variable name -> '/'-joined pytree path. Requires the real
    reference checkout to derive (SURVEY.md §0) — mechanism only for now.
    Uses tf.compat.v1 from the installed TF (SURVEY.md §2d); imported lazily
    so the framework never depends on TF.
    """
    import numpy as np
    from tensorflow.python.training import py_checkpoint_reader

    reader = py_checkpoint_reader.NewCheckpointReader(tf1_ckpt_prefix)
    flat = jax.tree_util.tree_flatten_with_path(template_params)[0]
    by_path = {
        "/".join(str(getattr(k, "key", getattr(k, "name", k))) for k in path):
            leaf
        for path, leaf in flat
    }
    out = dict(by_path)
    for tf_name, our_path in name_map.items():
        arr = np.asarray(reader.get_tensor(tf_name))
        if our_path not in by_path:
            raise KeyError(f"pytree path {our_path!r} not in params")
        want = by_path[our_path].shape
        if arr.ndim == 4 and arr.shape != want:
            # TF1 conv kernels are HWIO like flax; FC kernels may need .T
            raise ValueError(f"shape mismatch {arr.shape} vs {want}")
        if arr.ndim == 2 and arr.shape != want:
            arr = arr.T
        out[our_path] = arr
    # Rebuild the pytree in original structure.
    leaves, treedef = jax.tree_util.tree_flatten(template_params)
    paths = ["/".join(str(getattr(k, "key", getattr(k, "name", k)))
                      for k in p)
             for p, _ in flat]
    return jax.tree_util.tree_unflatten(
        treedef, [out[p] for p in paths])
