"""The jitted train step (SURVEY.md §3.1 target stack).

ONE compiled XLA program per step: forward (scan recurrence included), loss,
backward, gradient ``psum`` over the 'data' mesh axis, Adam update. Two
parallelization modes, both mesh-shape-agnostic:

- "shard_map" (default, the BASELINE.json:5 mandate): explicit
  ``jax.shard_map`` over the mesh; per-shard grads are ``lax.pmean``'d over
  'data' — lowers to an ICI all-reduce on real slices.
- "auto": ``jit`` with NamedSharding on inputs; GSPMD inserts the
  collectives, and the optional 'model' axis shards wide channels
  (parallel/mesh.model_axis_rules).
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
import optax
from flax.training import train_state as flax_train_state
from jax.sharding import NamedSharding, PartitionSpec as P

from dynamic_multiview_3d_tpu.config import Config
from dynamic_multiview_3d_tpu.models import DMV3D
from dynamic_multiview_3d_tpu.train import losses as losses_lib


class TrainState(flax_train_state.TrainState):
    # EMA of params (train.ema_decay > 0) — rides in the state pytree so
    # checkpoints/resume carry it; None (an empty pytree leaf-set) when
    # disabled, keeping old checkpoints loadable unchanged.
    ema_params: object = None


def make_lr(cfg: Config):
    """Learning-rate schedule (the reference's Adam trainer exposed lr as a
    flag, SURVEY.md R15; decay is the standard extension). Returns a float
    for "constant" (keeps optimizer state schedule-free) else an optax
    schedule over train.num_steps with optional linear warmup."""
    t = cfg.train
    if t.lr_schedule == "constant":
        return t.lr
    if t.lr_schedule == "cosine":
        decay = optax.cosine_decay_schedule(
            t.lr, decay_steps=max(t.num_steps - t.warmup_steps, 1),
            alpha=t.lr_final / t.lr if t.lr else 0.0)
        if t.warmup_steps:
            return optax.join_schedules(
                [optax.linear_schedule(0.0, t.lr, t.warmup_steps), decay],
                boundaries=[t.warmup_steps])
        return decay
    raise ValueError(f"unknown lr_schedule: {t.lr_schedule}")


def make_optimizer(cfg: Config) -> optax.GradientTransformation:
    t = cfg.train
    lr = make_lr(cfg)
    if t.optimizer == "sgd":
        return optax.sgd(lr)
    if t.optimizer == "adamw" or (t.optimizer == "adam" and t.weight_decay > 0):
        return optax.adamw(lr, b1=t.beta1, b2=t.beta2,
                           weight_decay=t.weight_decay)
    if t.optimizer == "adam":
        return optax.adam(lr, b1=t.beta1, b2=t.beta2)
    raise ValueError(f"unknown optimizer: {t.optimizer}")


def init_state(cfg: Config, seed: int | None = None) -> TrainState:
    m = cfg.model
    module = DMV3D(m)
    seq = jnp.zeros((1, cfg.data.seq_len, m.image_size, m.image_size, 3))
    src = jnp.zeros((1, cfg.data.seq_len, 3))
    tgt = jnp.zeros((1, cfg.data.num_targets, 3))
    params = jax.jit(module.init)(
        jax.random.key(cfg.train.seed if seed is None else seed),
        seq, src, tgt)["params"]
    return TrainState.create(
        apply_fn=module.apply, params=params, tx=make_optimizer(cfg),
        # EMA starts as a COPY: the state is donated into the jitted step,
        # and aliased params/ema buffers would be donated twice.
        ema_params=(jax.tree.map(jnp.copy, params)
                    if cfg.train.ema_decay > 0 else None))


def _loss_and_metrics(apply_fn: Callable, params, batch, tcfg,
                      synthesis: str = "flow"):
    out = apply_fn({"params": params}, batch["image_seq"],
                   batch["src_poses"], batch["tgt_poses"])
    return losses_lib.total_loss(out, batch, tcfg, synthesis=synthesis)


def make_train_step(cfg: Config, mesh=None, mode: str = "shard_map",
                    apply_fn: Callable | None = None,
                    resident=None) -> Callable:
    """-> step(state, batch) -> (state, metrics). Donates state buffers.

    On-device preprocessing (uint8 normalize + optional view-pair
    subsampling) runs inside this jitted step — see data.pipeline.preprocess.

    resident: a data.resident.ResidentFrames. The returned step then takes
    the tiny int32 index batch; the pixel gather from the HBM-resident
    banks happens inside the compiled step (the banks ride along as
    non-donated args, so there is no per-step transfer of them).
    """
    from dynamic_multiview_3d_tpu.data import pipeline as pipeline_lib
    from dynamic_multiview_3d_tpu.data import resident as resident_lib

    tcfg = cfg.train
    synthesis = cfg.model.synthesis
    k_sample = cfg.data.targets_per_step
    data_seed = cfg.data.seed
    apply_fn = apply_fn or DMV3D(cfg.model).apply

    spd = cfg.train.steps_per_dispatch
    if cfg.data.device_sampling and resident is None:
        # loop.train raises the same way; direct callers (benchmarks,
        # __graft_entry__) would otherwise crash opaquely inside
        # preprocess on a None batch.
        raise ValueError("data.device_sampling requires a device-resident "
                         "dataset (pass resident=)")
    device_sampling = bool(cfg.data.device_sampling and resident is not None)
    sample_meta = resident.sample_meta() if device_sampling else None
    bsz = cfg.data.batch_size
    n_data = mesh.shape["data"] if mesh is not None else 1

    def _step(state: TrainState, batch: dict | None, res_frames=None,
              res_poses=None, *, pmean_axis: str | None):
        if spd > 1:
            # t5x-style host loop: scan `spd` optimizer steps in THIS one
            # compiled program. batch leaves carry a leading [spd] axis
            # (device_sampling: no xs at all — the scan runs data-free).
            def body(st, sub_batch):
                return _one_step(st, sub_batch, res_frames, res_poses,
                                 pmean_axis=pmean_axis)
            state, ms = jax.lax.scan(
                body, state, batch, length=spd if batch is None else None)
            return state, jax.tree.map(lambda x: jnp.mean(x, axis=0), ms)
        return _one_step(state, batch, res_frames, res_poses,
                         pmean_axis=pmean_axis)

    def _one_step(state: TrainState, batch: dict | None, res_frames=None,
                  res_poses=None, *, pmean_axis: str | None):
        key = jax.random.fold_in(jax.random.key(data_seed), state.step)
        if device_sampling:
            lb = bsz // n_data if pmean_axis is not None else bsz
            off = (jax.lax.axis_index(pmean_axis) * lb
                   if pmean_axis is not None else 0)
            key, k_samp = jax.random.split(key)
            batch = resident_lib.ResidentFrames.device_sample(
                res_frames, res_poses, sample_meta, k_samp, lb,
                index_offset=off)
        elif res_frames is not None:
            batch = resident_lib.ResidentFrames.gather(
                res_frames, res_poses, batch)
        # Subsampling keys are folded over the GLOBAL example index so every
        # shard draws independent target subsets and 'shard_map' == 'auto'
        # numerically: shard i holds the contiguous slice starting at
        # i * local_batch of the P('data')-sharded batch.
        if pmean_axis is not None:
            offset = (jax.lax.axis_index(pmean_axis)
                      * batch["tgt_poses"].shape[0])
        else:
            offset = 0
        batch = pipeline_lib.preprocess(batch, key=key,
                                        targets_per_step=k_sample,
                                        index_offset=offset)

        def loss_fn(params):
            return _loss_and_metrics(apply_fn, params, batch, tcfg,
                                     synthesis=synthesis)

        (_, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        if pmean_axis is not None:
            grads = jax.lax.pmean(grads, pmean_axis)
            metrics = jax.lax.pmean(metrics, pmean_axis)
        state = state.apply_gradients(grads=grads)
        if cfg.train.ema_decay > 0:
            d = cfg.train.ema_decay
            state = state.replace(ema_params=jax.tree.map(
                lambda e, q: d * e + (1.0 - d) * q,
                state.ema_params, state.params))
        return state, metrics

    def _bind(jitted):
        """Resident banks ride as trailing non-donated args; callers always
        see step(state, batch). device_sampling ignores the batch (None —
        an empty pytree: the dispatch consumes no host input)."""
        if resident is None:
            return jitted
        frames, poses = resident.frames, resident.poses
        if device_sampling:
            return lambda state, batch=None: jitted(state, None, frames,
                                                    poses)
        return lambda state, batch: jitted(state, batch, frames, poses)

    n_res = 0 if resident is None else 2
    # replicated banks: P(); scene-sharded banks: split on 'data' rows
    res_sharded = resident is not None and resident.num_shards > 1
    res_spec = P("data") if res_sharded else P()
    if res_sharded and mode != "shard_map":
        raise ValueError("scene-sharded residency requires mode='shard_map'")
    # with steps_per_dispatch>1 batches carry a leading [spd] axis; the
    # data-parallel shard axis moves to position 1
    batch_spec = P(None, "data") if spd > 1 else P("data")

    if mesh is None:
        return _bind(jax.jit(functools.partial(_step, pmean_axis=None),
                             donate_argnums=0))

    if mode == "shard_map":
        sharded = jax.shard_map(
            functools.partial(_step, pmean_axis="data"),
            mesh=mesh,
            in_specs=(P(), batch_spec) + (res_spec,) * n_res,
            out_specs=(P(), P()),
            check_vma=False,
        )
        return _bind(jax.jit(sharded, donate_argnums=0))

    if mode == "auto":
        batch_sh = NamedSharding(mesh, batch_spec)
        repl = NamedSharding(mesh, P())
        return _bind(jax.jit(
            functools.partial(_step, pmean_axis=None),
            in_shardings=(None, batch_sh) + (repl,) * n_res,
            out_shardings=(None, repl),
            donate_argnums=0,
        ))

    raise ValueError(f"unknown parallel mode: {mode}")


def make_eval_step(cfg: Config, apply_fn: Callable | None = None) -> Callable:
    """Jitted forward + PSNR/SSIM for eval loops."""
    from dynamic_multiview_3d_tpu.train import metrics as metrics_lib
    apply_fn = apply_fn or DMV3D(cfg.model).apply

    @jax.jit
    def eval_step(params, batch):
        out = apply_fn({"params": params}, batch["image_seq"],
                       batch["src_poses"], batch["tgt_poses"])
        return {
            "eval/psnr": metrics_lib.psnr(out["view"], batch["tgt_images"]),
            "eval/ssim": metrics_lib.ssim(out["view"], batch["tgt_images"]),
        }

    return eval_step
