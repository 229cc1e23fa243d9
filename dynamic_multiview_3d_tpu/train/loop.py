"""Training loop (SURVEY.md §3.1 target call stack).

Host work per step is batch assembly + one async dispatch; everything else
(preprocess remnants, fwd, bwd, psum, Adam) lives in the single jitted step.
Checkpoint/resume is exact: params + optimizer state + step via Orbax, and
the data iterator is a pure function of the step index, so resuming at step
N replays the identical batch sequence (SURVEY.md §5 failure recovery; the
``fail_after_step`` flag fault-injects for the resume tests).
"""

from __future__ import annotations

import time

import jax
import numpy as np
import orbax.checkpoint as ocp

from dynamic_multiview_3d_tpu import config as config_lib
from dynamic_multiview_3d_tpu.parallel import mesh as mesh_lib
from dynamic_multiview_3d_tpu.train import checkpoint as ckpt_lib
from dynamic_multiview_3d_tpu.train import metrics as metrics_lib
from dynamic_multiview_3d_tpu.train import step as step_lib


class FaultInjected(RuntimeError):
    pass


def restore_latest(mgr: ocp.CheckpointManager,
                   template: step_lib.TrainState) -> step_lib.TrainState | None:
    latest = mgr.latest_step()
    if latest is None:
        return None
    abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, template)
    return mgr.restore(latest, args=ocp.args.StandardRestore(abstract))


def train(cfg: config_lib.Config, *, writer: metrics_lib.MetricsWriter | None
          = None, data_source=None, parallel_mode: str = "shard_map"):
    """Run training per cfg. Returns (final_state, last_metrics)."""
    if cfg.mesh.multihost and jax.process_count() == 1:
        jax.distributed.initialize()

    mesh = mesh_lib.make_mesh(cfg.mesh)
    n_data = mesh.shape["data"]
    if cfg.data.batch_size % n_data:
        raise ValueError(
            f"global batch {cfg.data.batch_size} not divisible by data={n_data}")

    if data_source is None:
        from dynamic_multiview_3d_tpu.data import pipeline as pipeline_lib
        data_source = pipeline_lib.make_source(cfg.data)
    batch_for_step = _make_batch_fn(cfg, data_source)

    state = step_lib.init_state(cfg)
    mgr = ckpt_lib.make_manager(cfg.train.ckpt_dir, cfg.train.max_to_keep,
                                cfg.train.ckpt_every)
    restored = restore_latest(mgr, state)
    start_step = 0
    if restored is not None:
        state = restored
        start_step = int(np.asarray(state.step))

    state = jax.device_put(state, mesh_lib.replicate(mesh))
    step_fn = step_lib.make_train_step(cfg, mesh=mesh, mode=parallel_mode)

    last_metrics: dict = {}
    t_last = time.perf_counter()
    for step in range(start_step, cfg.train.num_steps):
        batch = mesh_lib.shard_batch(mesh, batch_for_step(step))
        state, metrics = step_fn(state, batch)

        if cfg.train.fail_after_step >= 0 and step >= cfg.train.fail_after_step:
            # flush a checkpoint exactly as a healthy run would have, then die
            mgr.save(step + 1, args=ocp.args.StandardSave(state), force=True)
            mgr.wait_until_finished()
            raise FaultInjected(f"injected failure after step {step}")

        if (step + 1) % cfg.train.log_every == 0 or step == start_step:
            metrics = {k: float(v) for k, v in metrics.items()}
            now = time.perf_counter()
            denom = cfg.train.log_every if step != start_step else 1
            metrics["steps_per_sec"] = denom / max(now - t_last, 1e-9)
            t_last = now
            last_metrics = metrics
            if writer is not None:
                writer.write(step + 1, metrics)
        mgr.save(step + 1, args=ocp.args.StandardSave(state))

    mgr.wait_until_finished()
    # Export in the Model.from_checkpoint format for eval/predict (T5).
    if jax.process_index() == 0:
        import os
        ckpt_lib.save_model(os.path.join(cfg.train.ckpt_dir, "model"),
                            jax.device_get(state.params), cfg,
                            int(np.asarray(state.step)))
    return state, last_metrics


def _make_batch_fn(cfg: config_lib.Config, data_source):
    """Deterministic step -> global numpy batch (resume == replay)."""
    bsz = cfg.data.batch_size

    def batch_for_step(step: int) -> dict:
        return data_source.batch(range(step * bsz, (step + 1) * bsz))

    return batch_for_step
