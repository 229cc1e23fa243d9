"""Training tests (SURVEY.md §4): losses, overfit-one-batch sanity,

checkpoint/resume with fault injection."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dynamic_multiview_3d_tpu import config as config_lib
from dynamic_multiview_3d_tpu.data.synthetic import SyntheticScenes
from dynamic_multiview_3d_tpu.train import checkpoint as ckpt_lib
from dynamic_multiview_3d_tpu.train import loop as loop_lib
from dynamic_multiview_3d_tpu.train import losses as losses_lib
from dynamic_multiview_3d_tpu.train import metrics as metrics_lib
from dynamic_multiview_3d_tpu.train import step as step_lib


def tiny_cfg(tmpdir, **over):
    cfg = config_lib.override(config_lib.Config(), [
        "model.image_size=32", "model.num_levels=3", "model.base_features=8",
        "model.max_features=16", "model.gru_features=16",
        "model.pose_embed_dim=8", "model.dtype=float32",
        "model.use_pallas=False",
        "data.image_size=32", "data.batch_size=4", "data.num_scenes=2",
        "train.lr=1e-3", "train.num_steps=3", "train.log_every=1",
        f"train.ckpt_dir={tmpdir}/ckpt", "train.ckpt_every=1",
        "mesh.data=1",
    ])
    return config_lib.override(cfg, list(over.pop("overrides", [])))


# ---------------------------------------------------------------- losses
def test_losses_zero_when_perfect(rng):
    b, k, h, w = 1, 1, 8, 8
    tgt = jnp.asarray(rng.uniform(-1, 1, (b, k, h, w, 3)).astype(np.float32))
    out = {
        "view": tgt,
        "flow": jnp.zeros((b, k, h, w, 2)),
        "mask": jnp.full((b, k, h, w, 1), 1.0 - 1e-6),
    }
    loss, metrics = losses_lib.total_loss(
        out, {"tgt_images": tgt}, config_lib.TrainConfig())
    assert float(metrics["loss/l1"]) == 0.0
    # zero flow is fully in-bounds -> mask target 1 -> BCE ~ 0
    assert float(metrics["loss/mask"]) < 1e-4


def test_mask_loss_supervises_in_bounds(rng):
    b, k, h, w = 1, 1, 8, 8
    flow = jnp.full((b, k, h, w, 2), 100.0)      # everything out of bounds
    validity = losses_lib.flow_validity(flow)
    assert float(validity.max()) == 0.0
    mask_open = jnp.full((b, k, h, w, 1), 0.99)
    mask_closed = jnp.full((b, k, h, w, 1), 0.01)
    assert float(losses_lib.mask_loss(mask_closed, validity)) < float(
        losses_lib.mask_loss(mask_open, validity))


def test_depth_mode_mask_supervision(rng):
    """With synthesis='depth' the mask is supervised against geo_valid, not
    the flow in-bounds mask (round-1 review fix: it trained the compositing
    mask toward the wrong validity signal in depth mode)."""
    b, k, h, w = 1, 1, 8, 8
    tgt = jnp.zeros((b, k, h, w, 3))
    out = {
        "view": tgt,
        "flow": jnp.zeros((b, k, h, w, 2)),      # fully IN bounds
        "mask": jnp.full((b, k, h, w, 1), 0.01),  # closed mask
        "depth": jnp.ones((b, k, h, w)),
        "geo_view": tgt,
        "geo_valid": jnp.zeros((b, k, h, w)),    # reprojection fully INVALID
    }
    tcfg = config_lib.TrainConfig()
    _, m_flow = losses_lib.total_loss(out, {"tgt_images": tgt}, tcfg,
                                      synthesis="flow")
    _, m_depth = losses_lib.total_loss(out, {"tgt_images": tgt}, tcfg,
                                       synthesis="depth")
    # flow mode: target=1 (in bounds) -> closed mask is heavily penalized;
    # depth mode: target=0 (geo invalid) -> closed mask is correct.
    assert float(m_depth["loss/mask"]) < 0.05
    assert float(m_flow["loss/mask"]) > 1.0


def test_psnr_ssim_basics(rng):
    a = jnp.asarray(rng.uniform(-1, 1, (1, 1, 32, 32, 3)).astype(np.float32))
    assert float(metrics_lib.psnr(a, a)) > 100
    assert float(metrics_lib.ssim(a, a)) > 0.999
    b = jnp.clip(a + 0.5, -1, 1)
    assert float(metrics_lib.psnr(a, b)) < 20
    assert float(metrics_lib.ssim(a, b)) < 0.9


# ---------------------------------------------------------------- train step
def test_overfit_one_batch(rng, tmp_path):
    """Loss must drop markedly when training repeatedly on one batch."""
    cfg = tiny_cfg(tmp_path)
    src = SyntheticScenes(num_scenes=1, image_size=32, seq_len=1,
                          num_targets=1)
    batch = jax.device_put(src.batch(range(4)))
    state = step_lib.init_state(cfg)
    step_fn = step_lib.make_train_step(cfg)
    first = None
    # 45 steps: the l1 term halves well before this; the mask BCE term is
    # noisy on a one-batch overfit (flow saturation flips its target), so
    # the margin is deliberately loose.
    for _ in range(45):
        state, m = step_fn(state, batch)
        if first is None:
            first = float(m["loss/total"])
    last = float(m["loss/total"])
    assert last < 0.5 * first, (first, last)


def test_eval_step(rng, tmp_path):
    cfg = tiny_cfg(tmp_path)
    src = SyntheticScenes(num_scenes=1, image_size=32)
    batch = jax.device_put(src.batch(range(2)))
    state = step_lib.init_state(cfg)
    ev = step_lib.make_eval_step(cfg)(state.params, batch)
    assert np.isfinite(float(ev["eval/psnr"]))
    assert -1.0 <= float(ev["eval/ssim"]) <= 1.0


# ---------------------------------------------------------------- loop + resume
def test_train_loop_runs_and_checkpoints(tmp_path):
    cfg = tiny_cfg(tmp_path)
    writer = metrics_lib.MetricsWriter(str(tmp_path / "logs"),
                                       use_tensorboard=False)
    state, metrics = loop_lib.train(cfg, writer=writer)
    assert int(np.asarray(state.step)) == 3
    assert "loss/total" in metrics
    mgr = ckpt_lib.make_manager(cfg.train.ckpt_dir)
    assert mgr.latest_step() == 3


@pytest.mark.slow
def test_fault_injection_and_exact_resume(tmp_path):
    """Kill training mid-run; resuming must replay to the identical state
    (same params bit pattern) as an uninterrupted run (SURVEY.md §5)."""
    # Uninterrupted 4-step run.
    cfg_a = tiny_cfg(tmp_path, overrides=[
        "train.num_steps=4", f"train.ckpt_dir={tmp_path}/a"])
    state_a, _ = loop_lib.train(cfg_a)

    # Interrupted after step 1, then resumed to 4.
    cfg_b = tiny_cfg(tmp_path, overrides=[
        "train.num_steps=4", f"train.ckpt_dir={tmp_path}/b",
        "train.fail_after_step=1"])
    with pytest.raises(loop_lib.FaultInjected):
        loop_lib.train(cfg_b)
    cfg_b2 = tiny_cfg(tmp_path, overrides=[
        "train.num_steps=4", f"train.ckpt_dir={tmp_path}/b"])
    state_b, _ = loop_lib.train(cfg_b2)

    assert int(np.asarray(state_b.step)) == 4
    for pa, pb in zip(jax.tree.leaves(state_a.params),
                      jax.tree.leaves(state_b.params)):
        np.testing.assert_allclose(np.asarray(pa), np.asarray(pb),
                                   rtol=0, atol=0)


def test_dynamic_sequence_training_with_remat(tmp_path):
    """Config-3 shape (SURVEY.md M4): scan over T frames, remat on the scan
    body, fwd+bwd+Adam in one jitted step, loss drops on a fixed batch."""
    cfg = tiny_cfg(tmp_path, overrides=[
        "data.seq_len=4", "data.num_targets=2", "data.dynamic=true",
        "model.remat_scan=true", "train.lr=1e-3",
    ])
    src = SyntheticScenes(num_scenes=1, image_size=32, seq_len=4,
                          num_targets=2, dynamic=True)
    batch = jax.device_put(src.batch(range(2)))
    state = step_lib.init_state(cfg)
    step_fn = step_lib.make_train_step(cfg)
    first = None
    for _ in range(15):
        state, m = step_fn(state, batch)
        if first is None:
            first = float(m["loss/total"])
    assert np.isfinite(float(m["loss/total"]))
    assert float(m["loss/total"]) < 0.8 * first


@pytest.mark.slow
def test_device_preprocess_uint8_matches_float(tmp_path):
    """uint8 batches normalized on-device give the same loss as host floats."""
    cfg = tiny_cfg(tmp_path)
    src = SyntheticScenes(num_scenes=1, image_size=32)
    batch_f = jax.device_put(src.batch(range(4)))
    batch_u = jax.device_put(src.batch(range(4), raw=True))
    assert batch_u["image_seq"].dtype == jnp.uint8
    state = step_lib.init_state(cfg)
    step_fn = step_lib.make_train_step(cfg)
    _, m_f = step_fn(state, batch_f)
    state2 = step_lib.init_state(cfg)
    _, m_u = step_fn(state2, batch_u)
    np.testing.assert_allclose(float(m_f["loss/total"]),
                               float(m_u["loss/total"]), rtol=1e-6)


def test_on_device_target_subsampling(tmp_path):
    """targets_per_step picks K' of K targets inside the jitted step."""
    from dynamic_multiview_3d_tpu.data import pipeline as pipeline_lib
    cfg = tiny_cfg(tmp_path, overrides=[
        "data.num_targets=4", "data.targets_per_step=2"])
    src = SyntheticScenes(num_scenes=1, image_size=32, num_targets=4)
    batch = jax.device_put(src.batch(range(2), raw=True))
    pre = pipeline_lib.preprocess(batch, key=jax.random.key(0),
                                  targets_per_step=2)
    assert pre["tgt_poses"].shape == (2, 2, 3)
    assert pre["tgt_images"].shape[1] == 2
    # different steps pick different subsets (statistically)
    pre2 = pipeline_lib.preprocess(batch, key=jax.random.key(1),
                                   targets_per_step=2)
    assert not np.allclose(np.asarray(pre["tgt_poses"]),
                           np.asarray(pre2["tgt_poses"]))
    # and the full train step runs with it
    state = step_lib.init_state(cfg)
    step_fn = step_lib.make_train_step(cfg)
    _, m = step_fn(state, batch)
    assert np.isfinite(float(m["loss/total"]))


@pytest.mark.slow
def test_streaming_grain_training_with_state_checkpoint(tmp_path):
    """Streaming mode: batches from the Grain iterator; iterator state is
    saved beside the Orbax step and restored on resume (SURVEY.md §5)."""
    import os
    cfg = tiny_cfg(tmp_path, overrides=[
        "data.streaming=true", "data.grain_workers=0", "data.num_scenes=8",
        "data.batch_size=4", "train.num_steps=2",
        f"train.ckpt_dir={tmp_path}/stream",
    ])
    state, metrics = loop_lib.train(cfg)
    assert int(np.asarray(state.step)) == 2
    assert np.isfinite(metrics["loss/total"])
    # grain state file exists next to the checkpoint
    files = os.listdir(f"{tmp_path}/stream")
    assert any(f.startswith("grain_state_2") for f in files), files
    # resume continues from the saved iterator state
    cfg2 = tiny_cfg(tmp_path, overrides=[
        "data.streaming=true", "data.grain_workers=0", "data.num_scenes=8",
        "data.batch_size=4", "train.num_steps=4",
        f"train.ckpt_dir={tmp_path}/stream",
    ])
    state2, _ = loop_lib.train(cfg2)
    assert int(np.asarray(state2.step)) == 4


def test_depth_head_receives_gradient(tmp_path):
    """geo_weight supervises the depth head (review fix: it trained on zero
    gradient before)."""
    cfg = tiny_cfg(tmp_path, overrides=["model.predict_depth=true"])
    src = SyntheticScenes(num_scenes=1, image_size=32)
    batch = jax.device_put(src.batch(range(2)))
    state = step_lib.init_state(cfg)
    before = np.asarray(
        state.params["decoder"]["depth_head"]["kernel"]).copy()
    step_fn = step_lib.make_train_step(cfg)
    state, m = step_fn(state, batch)
    after = np.asarray(state.params["decoder"]["depth_head"]["kernel"])
    assert "loss/geo_l1" in m
    assert np.abs(after - before).max() > 0, "depth head got zero gradient"


def test_ssim_matches_torch_reference(rng):
    """Our Gaussian-window SSIM vs an independent torch/f64 implementation
    of the Wang et al. formulation (round-1 review: SSIM had no oracle)."""
    import torch
    import torch.nn.functional as F

    def torch_ssim(pred_nchw, target_nchw, data_range=2.0):
        x = torch.arange(11, dtype=torch.float64) - 5.0
        g = torch.exp(-(x ** 2) / (2 * 1.5 ** 2))
        g = g / g.sum()
        win = torch.outer(g, g)[None, None]
        c = pred_nchw.shape[1]
        win = win.repeat(c, 1, 1, 1)

        def filt(z):
            return F.conv2d(z, win, groups=c)

        mu_p, mu_t = filt(pred_nchw), filt(target_nchw)
        mu_pp, mu_tt, mu_pt = mu_p * mu_p, mu_t * mu_t, mu_p * mu_t
        sig_p = filt(pred_nchw * pred_nchw) - mu_pp
        sig_t = filt(target_nchw * target_nchw) - mu_tt
        sig_pt = filt(pred_nchw * target_nchw) - mu_pt
        c1 = (0.01 * data_range) ** 2
        c2 = (0.03 * data_range) ** 2
        num = (2 * mu_pt + c1) * (2 * sig_pt + c2)
        den = (mu_pp + mu_tt + c1) * (sig_p + sig_t + c2)
        return float((num / den).mean())

    a = rng.uniform(-1, 1, (2, 24, 24, 3)).astype(np.float32)
    b = np.clip(a + 0.2 * rng.standard_normal(a.shape).astype(np.float32),
                -1, 1)
    ours = float(metrics_lib.ssim(jnp.asarray(a), jnp.asarray(b)))
    ref = torch_ssim(torch.from_numpy(a).permute(0, 3, 1, 2).double(),
                     torch.from_numpy(b).permute(0, 3, 1, 2).double())
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_lr_schedule_cosine_with_warmup():
    """make_lr: linear warmup to peak, cosine decay to lr_final over
    num_steps (SURVEY.md R15 — the Adam trainer's lr flag, extended)."""
    cfg = config_lib.override(config_lib.Config(), [
        "train.lr=1e-3", "train.lr_schedule=cosine", "train.warmup_steps=10",
        "train.lr_final=1e-5", "train.num_steps=110",
    ])
    sched = step_lib.make_lr(cfg)
    assert float(sched(0)) == 0.0
    assert abs(float(sched(10)) - 1e-3) < 1e-9          # peak after warmup
    assert abs(float(sched(110)) - 1e-5) < 1e-7          # cosine floor
    assert float(sched(60)) < 1e-3                       # strictly decaying
    # constant stays a plain float (schedule-free optimizer state)
    assert step_lib.make_lr(config_lib.Config()) == 2e-4
    with pytest.raises(ValueError):
        step_lib.make_lr(config_lib.override(
            config_lib.Config(), ["train.lr_schedule=nope"]))


def test_ssim_loss_term(tmp_path):
    """train.ssim_weight adds a differentiable DSSIM term to the loss."""
    import dataclasses

    from dynamic_multiview_3d_tpu.train import losses as losses_lib

    rng = np.random.default_rng(0)
    out = {"view": jnp.asarray(rng.uniform(-1, 1, (2, 1, 16, 16, 3))
                               .astype(np.float32)),
           "flow": jnp.zeros((2, 1, 16, 16, 2)),
           "mask": jnp.full((2, 1, 16, 16, 1), 0.5)}
    batch = {"tgt_images": jnp.asarray(
        rng.uniform(-1, 1, (2, 1, 16, 16, 3)).astype(np.float32))}
    tcfg = dataclasses.replace(config_lib.TrainConfig(), ssim_weight=0.5)
    loss, m = losses_lib.total_loss(out, batch, tcfg)
    base, _ = losses_lib.total_loss(out, batch, config_lib.TrainConfig())
    assert "loss/dssim" in m and float(m["loss/dssim"]) > 0
    np.testing.assert_allclose(float(loss),
                               float(base) + 0.5 * float(m["loss/dssim"]),
                               rtol=1e-6)
    g = jax.grad(lambda v: losses_lib.total_loss(
        {**out, "view": v}, batch, tcfg)[0])(out["view"])
    assert bool(jnp.all(jnp.isfinite(g))) and float(jnp.abs(g).max()) > 0


def test_ema_params_track_and_export(tmp_path):
    """train.ema_decay: the state carries an EMA of params that moves
    slower than the raw params; the exported model dir carries the EMA."""
    cfg = tiny_cfg(tmp_path)
    import dataclasses
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, ema_decay=0.9,
                                       num_steps=6, ckpt_every=6,
                                       log_every=6))
    from dynamic_multiview_3d_tpu.data.synthetic import SyntheticScenes
    from dynamic_multiview_3d_tpu.parallel import mesh as mesh_lib
    from dynamic_multiview_3d_tpu.train import step as step_lib

    mesh = mesh_lib.make_mesh(config_lib.MeshConfig(data=1))
    state = jax.device_put(step_lib.init_state(cfg),
                           mesh_lib.replicate(mesh))
    src = SyntheticScenes(num_scenes=1, image_size=cfg.data.image_size,
                          num_targets=cfg.data.num_targets)
    step_fn = step_lib.make_train_step(cfg, mesh=mesh)
    batch = jax.device_put(src.batch(range(cfg.data.batch_size)))
    p0 = jax.device_get(state.params)
    for _ in range(3):
        state, _ = step_fn(state, batch)
    p = jax.device_get(state.params)
    e = jax.device_get(state.ema_params)

    def dist(a, b):
        la, lb = jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)
        return float(sum(np.abs(x - y).sum() for x, y in zip(la, lb)))

    assert dist(e, p0) < dist(p, p0)          # EMA lags the raw params
    assert dist(e, p0) > 0                    # ...but does move


def test_c3mf_preset_out_of_the_box(tmp_path):
    """The flagship preset must train with NO prior setup (VERDICT r3 #7):
    empty data.root resolves to the in-memory synthetic frame bank, which
    materializes packed banks, goes HBM/device-resident and samples
    in-program (device_sampling) — shrunk shapes, full mechanism."""
    cfg = config_lib.get_config("c3mf", [
        "model.image_size=16", "model.num_levels=2", "model.base_features=8",
        "model.max_features=16", "model.gru_features=16",
        "model.pose_embed_dim=8", "model.dtype=float32",
        "model.use_pallas=False",
        "data.image_size=16", "data.batch_size=2", "data.num_scenes=2",
        "data.seq_len=3",
        "train.num_steps=16", "train.log_every=16", "train.ckpt_every=16",
        "train.steps_per_dispatch=16", f"train.ckpt_dir={tmp_path}/ckpt",
        "mesh.data=1",
    ])
    assert cfg.data.source == "frames" and cfg.data.root == ""
    assert cfg.model.synthesis == "multiflow"
    assert cfg.data.src_views == "orbit" and cfg.data.device_sampling
    with pytest.warns(UserWarning, match="SyntheticFrames"):
        state, metrics = loop_lib.train(cfg)
    assert int(np.asarray(state.step)) == 16
    assert np.isfinite(metrics["loss/total"])


def test_snapshot_cli_exports_intermediate_step(tmp_path):
    """A run cut short of num_steps must still be exportable: cli.snapshot
    restores an Orbax manager step + the persisted train_config.json into a
    Model.from_checkpoint dir (SURVEY.md §5 failure recovery — evaluate the
    survivor, not just resume it)."""
    import json

    from dynamic_multiview_3d_tpu.api import Model
    from dynamic_multiview_3d_tpu.cli import snapshot as snapshot_cli

    cfg = tiny_cfg(tmp_path, overrides=[
        "train.num_steps=4", f"train.ckpt_dir={tmp_path}/ckpt",
        "train.fail_after_step=1"])          # dies after step 2's ckpt
    with pytest.raises(loop_lib.FaultInjected):
        loop_lib.train(cfg)
    assert not (tmp_path / "ckpt" / "model").exists()   # no end-of-run export

    out = tmp_path / "snap"
    snapshot_cli.main(["--ckpt-dir", str(tmp_path / "ckpt"),
                       "--out", str(out)])
    with open(out / "config.json") as f:
        assert json.load(f)["step"] == 2
    model = Model.from_checkpoint(str(out))
    views = model.predict(
        np.zeros((1, 32, 32, 3), np.float32), np.zeros((1, 3), np.float32))
    assert views.shape == (1, 32, 32, 3)
