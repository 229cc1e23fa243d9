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
from jax.sharding import PartitionSpec as P

from dynamic_multiview_3d_tpu import config as config_lib
from dynamic_multiview_3d_tpu.parallel import mesh as mesh_lib
from dynamic_multiview_3d_tpu.train import checkpoint as ckpt_lib
from dynamic_multiview_3d_tpu.train import metrics as metrics_lib
from dynamic_multiview_3d_tpu.train import step as step_lib
from dynamic_multiview_3d_tpu.utils import profiling


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
          = None, data_source=None, parallel_mode: str = "shard_map",
          profile_dir: str | None = None,
          profile_steps: tuple[int, int] = (10, 15)):
    """Run training per cfg. Returns (final_state, last_metrics).

    profile_dir: when set, steps [profile_steps) are captured with
    jax.profiler.trace for xprof/tensorboard (SURVEY.md §5 tracing)."""
    if cfg.mesh.multihost:
        # Must run before anything initializes the XLA backends (even
        # jax.process_count() would); tolerate launchers that already did it.
        try:
            jax.distributed.initialize()
        except RuntimeError:
            pass

    mesh = mesh_lib.make_mesh(cfg.mesh)
    n_data = mesh.shape["data"]
    if cfg.data.batch_size % n_data:
        raise ValueError(
            f"global batch {cfg.data.batch_size} not divisible by data={n_data}")

    spd = max(1, cfg.train.steps_per_dispatch)
    if spd > 1:
        for nm in ("num_steps", "ckpt_every", "log_every"):
            if getattr(cfg.train, nm) % spd:
                raise ValueError(
                    f"train.{nm}={getattr(cfg.train, nm)} must be a "
                    f"multiple of train.steps_per_dispatch={spd}")
        if cfg.train.fail_after_step >= 0 \
                and (cfg.train.fail_after_step + 1) % spd:
            # failure injection is dispatch-granular: the forced checkpoint
            # lands at a dispatch boundary, so a misaligned threshold would
            # silently run up to spd-1 extra optimizer steps first.
            raise ValueError(
                f"train.fail_after_step={cfg.train.fail_after_step}: "
                f"fail_after_step+1 must be a multiple of "
                f"steps_per_dispatch={spd} (failure fires at dispatch "
                "boundaries)")

    from dynamic_multiview_3d_tpu.data import pipeline as pipeline_lib
    grain_iter = None
    resident = None
    if cfg.data.streaming:
        # Grain streaming: worker-process decode + prefetch; iterator state
        # rides with checkpoints for exact resume. Residency needs the
        # whole bank up front — incompatible with a streamed iterator.
        if cfg.data.device_resident == "on" or cfg.data.device_sampling:
            raise ValueError(
                "data.streaming is incompatible with data.device_resident="
                "on / data.device_sampling (the HBM-resident modes need "
                "the full packed bank; use the index-batch path)")
        grain_iter = pipeline_lib.make_grain_iterator(cfg.data,
                                                      num_epochs=None)
        if spd == 1:
            batch_for_step = lambda step: next(grain_iter)  # noqa: E731
        else:
            def batch_for_step(step):
                return _stack_subbatches(
                    [next(grain_iter) for _ in range(spd)])
    else:
        if data_source is None:
            data_source = pipeline_lib.make_source(cfg.data)
        resident = _maybe_resident(cfg, data_source, mesh,
                                   parallel_mode=parallel_mode)
        if cfg.data.device_sampling:
            if resident is None:
                raise ValueError("data.device_sampling requires a "
                                 "device-resident dataset "
                                 "(data.device_resident)")
            batch_for_step = lambda step: None  # noqa: E731 — zero host input
        else:
            batch_for_step = _make_batch_fn(cfg, data_source,
                                            resident=resident,
                                            steps_per_dispatch=spd)

    state = step_lib.init_state(cfg)
    mgr = ckpt_lib.make_manager(cfg.train.ckpt_dir, cfg.train.max_to_keep,
                                cfg.train.ckpt_every)
    if jax.process_index() == 0:
        # Persist the resolved config next to the manager steps so an
        # intermediate checkpoint is recoverable into an eval-ready model
        # dir (cli.snapshot) even if the run never reaches num_steps —
        # previously only the end-of-run model/ export carried the config.
        import json
        import os
        os.makedirs(os.path.abspath(cfg.train.ckpt_dir), exist_ok=True)
        with open(os.path.join(os.path.abspath(cfg.train.ckpt_dir),
                               "train_config.json"), "w") as f:
            json.dump(config_lib.to_dict(cfg), f, indent=2)
    restored = restore_latest(mgr, state)
    start_step = 0
    if restored is not None:
        state = restored
        start_step = int(np.asarray(state.step))
        if start_step % spd:
            raise ValueError(
                f"resume step {start_step} is not aligned to "
                f"steps_per_dispatch={spd} (checkpoint from a different "
                "dispatch granularity — set a compatible value)")
        if grain_iter is not None:
            _restore_grain_state(cfg.train.ckpt_dir, start_step, grain_iter)

    state = jax.device_put(state, mesh_lib.replicate(mesh))
    step_fn = step_lib.make_train_step(cfg, mesh=mesh, mode=parallel_mode,
                                       resident=resident)
    render_fn = None          # jitted once, reused for every image summary
    preview_batch = None      # first host batch, kept for summaries (never
                              # consumes extra items from a streaming iterator)

    last_metrics: dict = {}
    t_last = time.perf_counter()
    # one iteration = one host dispatch = `spd` optimizer steps (spd=1: the
    # classic loop; spd>1: the t5x-style scanned host loop). `end` is the
    # number of completed optimizer steps after the dispatch.
    trace = profiling.TraceWindow(profile_dir, profile_steps)
    for step in range(start_step, cfg.train.num_steps, spd):
        end = step + spd
        trace.maybe_start(step, end)
        host_batch = batch_for_step(step)
        if preview_batch is None:
            if resident is not None:   # host pixels for summaries only
                pv = data_source.batch(range(2), raw=True)
            elif spd > 1:
                pv = {k: np.asarray(v[0]) for k, v in host_batch.items()}
            else:
                pv = host_batch
            preview_batch = {k: np.asarray(v[:2]) for k, v in pv.items()}
        batch = None if host_batch is None else mesh_lib.shard_batch(
            mesh, host_batch,
            spec=P(None, "data") if spd > 1 else None)
        state, metrics = step_fn(state, batch)
        trace.maybe_stop(end, block_on=metrics)

        if cfg.train.fail_after_step >= 0 and end > cfg.train.fail_after_step:
            # flush a checkpoint exactly as a healthy run would have, then die
            trace.close()
            mgr.save(end, args=ocp.args.StandardSave(state), force=True)
            mgr.wait_until_finished()
            if grain_iter is not None:
                _save_grain_state(cfg.train.ckpt_dir, end, grain_iter)
            raise FaultInjected(f"injected failure after step {end - 1}")

        if (writer is not None and writer.has_images
                and end % cfg.train.ckpt_every == 0):
            if render_fn is None:
                from dynamic_multiview_3d_tpu.models import DMV3D
                render_fn = jax.jit(DMV3D(cfg.model).apply)
            _write_image_summaries(render_fn, writer, state, preview_batch,
                                   end)

        if end % cfg.train.log_every == 0 or step == start_step:
            metrics = {k: float(v) for k, v in metrics.items()}
            now = time.perf_counter()
            denom = cfg.train.log_every if step != start_step else spd
            metrics["steps_per_sec"] = denom / max(now - t_last, 1e-9)
            metrics["host_rss_mb"] = _host_rss_mb()
            t_last = now
            last_metrics = metrics
            if writer is not None:
                writer.write(end, metrics)
        saved = mgr.save(end, args=ocp.args.StandardSave(state))
        if saved and grain_iter is not None:
            _save_grain_state(cfg.train.ckpt_dir, end, grain_iter)

    trace.close()
    mgr.wait_until_finished()
    # Export in the Model.from_checkpoint format for eval/predict (T5).
    if jax.process_index() == 0:
        import os
        export_params = (state.ema_params if state.ema_params is not None
                         else state.params)
        ckpt_lib.save_model(os.path.join(cfg.train.ckpt_dir, "model"),
                            jax.device_get(export_params), cfg,
                            int(np.asarray(state.step)))
    return state, last_metrics


def _host_rss_mb() -> float:
    """Trainer-process resident memory, logged with every metrics line.

    Observability for host-side input/transfer leaks: this machine's TPU
    relay plugin leaks every host->device buffer (BASELINE.md), which is
    invisible in device metrics — a linear climb here is the tell."""
    try:
        with open("/proc/self/status") as f:
            for line in f:
                if line.startswith("VmRSS"):
                    return float(line.split()[1]) / 1024.0
    except OSError:
        pass
    return 0.0


def _grain_state_path(ckpt_dir: str, step: int) -> str:
    import os
    return os.path.join(os.path.abspath(ckpt_dir),
                        f"grain_state_{step}_p{jax.process_index()}.json")


def _save_grain_state(ckpt_dir: str, step: int, grain_iter) -> None:
    """Grain iterator state rides next to the Orbax step (SURVEY.md §5)."""
    try:
        state = grain_iter.get_state()
    except AttributeError:
        return
    import os
    os.makedirs(os.path.abspath(ckpt_dir), exist_ok=True)
    with open(_grain_state_path(ckpt_dir, step), "wb") as f:
        f.write(state if isinstance(state, bytes) else bytes(state))


def _restore_grain_state(ckpt_dir: str, step: int, grain_iter) -> None:
    import os
    path = _grain_state_path(ckpt_dir, step)
    if os.path.exists(path):
        with open(path, "rb") as f:
            grain_iter.set_state(f.read())


def _write_image_summaries(render_fn, writer, state, batch, step):
    """Pred-vs-target grids to tensorboard (SURVEY.md R18)."""
    from dynamic_multiview_3d_tpu.data import pipeline as pipeline_lib
    from dynamic_multiview_3d_tpu.data.synthetic import to_uint8

    small = {k: jax.device_put(v) for k, v in batch.items()}
    small = pipeline_lib.preprocess(small)
    view = render_fn(
        {"params": state.params}, small["image_seq"], small["src_poses"],
        small["tgt_poses"])["view"]
    pred = np.asarray(view)[:, 0]
    tgt = np.asarray(small["tgt_images"])[:, 0]
    grid = np.concatenate([pred, tgt], axis=2)      # side by side
    writer.write_images(step, "pred_vs_target", to_uint8(grid))


def _maybe_resident(cfg: config_lib.Config, data_source, mesh,
                    parallel_mode: str = "shard_map"):
    """Build the HBM-resident dataset when configured/eligible
    (data/resident.py — auto requires: frames source, packed banks,
    single process, fits data.resident_budget_mb). With
    data.resident_sharding='scenes' the bank is sharded by scene along
    the 'data' mesh axis instead of replicated (multi-chip/multi-host:
    per-device HBM divides by the mesh size; needs device_sampling +
    shard_map)."""
    from dynamic_multiview_3d_tpu.data import resident as resident_lib
    mode = cfg.data.device_resident
    if mode == "off":
        return None

    # materialize_packed: decode a non-packed source (png / tfrecords /
    # shapenet_dir) once into in-memory banks so it passes the packed
    # eligibility below (data/frames.py:materialize_packed).
    resident_src = cfg.data.source in ("frames", "tfrecords",
                                       "shapenet_dir")
    if (cfg.data.materialize_packed and resident_src
            and hasattr(data_source, "materialize_packed")):
        data_source.materialize_packed()

    if cfg.data.resident_sharding == "scenes":
        if not cfg.data.device_sampling or parallel_mode != "shard_map":
            raise ValueError(
                "data.resident_sharding='scenes' requires "
                "data.device_sampling and the shard_map parallel mode "
                "(a shard can only address its local scene rows)")
        n = mesh.shape["data"]
        eligible = (resident_src
                    and resident_lib.fits_budget(data_source, cfg.data,
                                                 num_shards=n))
        if not eligible:
            if mode == "on":
                raise ValueError(
                    "resident_sharding='scenes' needs a packed frames "
                    "dataset fitting data.resident_budget_mb per shard")
            return None
        from jax.sharding import NamedSharding
        return resident_lib.ResidentFrames(
            data_source, cfg.data,
            sharding=NamedSharding(mesh, P("data")), num_shards=n)

    eligible = (resident_src and jax.process_count() == 1
                and resident_lib.fits_budget(data_source, cfg.data))
    if mode == "on" and not eligible:
        raise ValueError(
            "data.device_resident=on needs a packed single-process frames "
            "dataset within data.resident_budget_mb")
    if not eligible:
        # The host-pixel path leaks ~batch-bytes/step through this
        # sandbox's relay plugin (BASELINE.md) — a long run silently
        # landing here is exactly what OOM-killed round 2's host. Warn
        # when residency was plausible (a frames dataset) but auto
        # resolved to OFF; host_rss_mb in the metrics is the tripwire.
        if mode == "auto" and resident_src:
            import warnings
            why = ("multi-process" if jax.process_count() > 1
                   else "banks not packed/uniform or over "
                        "data.resident_budget_mb")
            warnings.warn(
                f"data.device_resident=auto resolved to OFF ({why}); "
                "training will stream host pixels every step — watch "
                "host_rss_mb for transfer-buffer leaks on long runs",
                stacklevel=2)
        return None
    return resident_lib.ResidentFrames(data_source, cfg.data,
                                       sharding=mesh_lib.replicate(mesh))


def _make_batch_fn(cfg: config_lib.Config, data_source, resident=None,
                   steps_per_dispatch: int = 1):
    """Deterministic step -> THIS PROCESS's slice of the global batch
    (resume == replay). Each process materializes only its contiguous
    local rows; mesh_lib.shard_batch assembles the global array from the
    per-process slices (make_array_from_process_local_data). Single-process
    this is simply the whole batch.

    With device_preprocess, images stay uint8 on the host and are
    normalized inside the jitted step (data.pipeline.preprocess). With a
    resident dataset the host emits only int32 row indices — the identical
    example stream (same sample_indices draws), ~KB instead of MB per step."""
    import inspect
    bsz = cfg.data.batch_size
    pcnt = jax.process_count()
    local = bsz // pcnt
    lo_off = jax.process_index() * local
    raw = cfg.data.device_preprocess
    has_raw = "raw" in inspect.signature(data_source.batch).parameters

    def one(step: int) -> dict:
        lo = step * bsz + lo_off
        idx = range(lo, lo + local)
        if resident is not None:
            return resident.index_batch(idx)
        if has_raw:
            return data_source.batch(idx, raw=raw)
        return data_source.batch(idx)  # custom sources without a raw path

    if steps_per_dispatch == 1:
        return one

    def stacked(step: int) -> dict:
        return _stack_subbatches(
            [one(step + j) for j in range(steps_per_dispatch)])

    return stacked


def _stack_subbatches(subs: list[dict]) -> dict:
    """[spd] per-step batches -> one dispatch batch with a leading [spd]
    axis (scanned by the step; sharded P(None, 'data'))."""
    return {k: np.stack([s[k] for s in subs]) for k in subs[0]}
