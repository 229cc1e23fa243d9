"""Model/shape tests (SURVEY.md §4.3): forward at 64² and 128², all heads,

static and dynamic paths, scan-vs-python-loop recurrence equivalence."""

import chex
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dynamic_multiview_3d_tpu import config as config_lib
from dynamic_multiview_3d_tpu.models import DMV3D, ConvGRUCell


def _cfg(size=64, levels=4, **kw):
    base = dict(image_size=size, num_levels=levels, base_features=8,
                max_features=32, gru_features=32, pose_embed_dim=16,
                dtype="float32", use_pallas=False)
    base.update(kw)
    return config_lib.ModelConfig(**base)


def _inputs(rng, b=2, t=1, k=1, size=64):
    return (
        jnp.asarray(rng.uniform(-1, 1, (b, t, size, size, 3))
                    .astype(np.float32)),
        jnp.asarray(rng.uniform(0, 1, (b, t, 3)).astype(np.float32) + [0, 0, 1]),
        jnp.asarray(rng.uniform(0, 1, (b, k, 3)).astype(np.float32) + [0, 0, 1]),
    )


@pytest.mark.parametrize("size,levels", [
    (64, 4),
    pytest.param(128, 5, marks=pytest.mark.slow),
])
def test_forward_shapes(rng, size, levels):
    cfg = _cfg(size, levels)
    model = DMV3D(cfg)
    seq, src, tgt = _inputs(rng, b=2, t=1, k=3, size=size)
    variables = jax.jit(model.init)(jax.random.key(0), seq, src, tgt)
    out = jax.jit(model.apply)(variables, seq, src, tgt)
    assert out["view"].shape == (2, 3, size, size, 3)
    assert out["flow"].shape == (2, 3, size, size, 2)
    assert out["mask"].shape == (2, 3, size, size, 1)
    assert out["rgb"].shape == (2, 3, size, size, 3)
    assert np.all(np.isfinite(np.asarray(out["view"])))


@pytest.mark.slow
def test_dynamic_sequence_and_depth(rng):
    cfg = _cfg(predict_depth=True)
    model = DMV3D(cfg)
    seq, src, tgt = _inputs(rng, b=1, t=4, k=2)
    variables = jax.jit(model.init)(jax.random.key(0), seq, src, tgt)
    out = jax.jit(model.apply)(variables, seq, src, tgt)
    assert out["depth"].shape == (1, 2, 64, 64)
    assert out["geo_view"].shape == (1, 2, 64, 64, 3)
    assert np.all(np.asarray(out["depth"]) > 0)


def test_depth_synthesis_mode(rng):
    cfg = _cfg(predict_depth=True, synthesis="depth")
    model = DMV3D(cfg)
    seq, src, tgt = _inputs(rng, b=1, t=1, k=1)
    variables = jax.jit(model.init)(jax.random.key(0), seq, src, tgt)
    out = jax.jit(model.apply)(variables, seq, src, tgt)
    assert out["view"].shape == (1, 1, 64, 64, 3)


def test_temporal_state_matters(rng):
    """Different frame histories must give different outputs (GRU works)."""
    cfg = _cfg()
    model = DMV3D(cfg)
    seq, src, tgt = _inputs(rng, b=1, t=3, k=1)
    variables = jax.jit(model.init)(jax.random.key(0), seq, src, tgt)
    fwd = jax.jit(model.apply)
    out_a = fwd(variables, seq, src, tgt)["view"]
    seq_b = seq.at[:, 0].set(-seq[:, 0])  # perturb an EARLY frame only
    out_b = fwd(variables, seq_b, src, tgt)["view"]
    assert float(jnp.abs(out_a - out_b).max()) > 1e-6


def test_scan_matches_python_loop(rng):
    """lax.scan recurrence == manual per-frame python unroll of the SAME
    step module with the SAME params (SURVEY.md §4.3)."""
    import flax.linen as nn
    from dynamic_multiview_3d_tpu.models import dmv3d as dmv3d_lib

    cfg = _cfg()
    model = DMV3D(cfg)
    seq, src, tgt = _inputs(rng, b=1, t=3, k=1)
    variables = jax.jit(model.init)(jax.random.key(0), seq, src, tgt)
    rec_params = {"params": variables["params"]["recurrent"]}

    h0 = ConvGRUCell.init_state(1, cfg.bottleneck_size, cfg.bottleneck_size,
                                cfg.gru_features, jnp.float32)
    skips0 = tuple(jnp.zeros(s, jnp.float32) for s in model.skip_shapes(1))

    # the scan exactly as the model builds it
    step_scan = nn.scan(dmv3d_lib._RecurrentStep,
                        variable_broadcast="params",
                        split_rngs={"params": False},
                        in_axes=1, out_axes=1)(cfg)
    (h_scan, skips_scan), _ = jax.jit(step_scan.apply)(
        rec_params, (h0, skips0), seq)

    # manual python unroll of one step at a time, shared params
    step_one = dmv3d_lib._RecurrentStep(cfg)
    carry = (h0, skips0)
    step_fn = jax.jit(step_one.apply)
    for t in range(seq.shape[1]):
        carry, _ = step_fn(rec_params, carry, seq[:, t])
    h_loop, skips_loop = carry

    chex.assert_trees_all_close(h_scan, h_loop, atol=1e-5)
    chex.assert_trees_all_close(skips_scan, skips_loop, atol=1e-5)

    # remat path must be numerically identical to the scan
    fwd = jax.jit(model.apply)
    out_scan = fwd(variables, seq, src, tgt)["view"]
    cfg_r = _cfg(remat_scan=True)
    model_r = DMV3D(cfg_r)
    out_remat = jax.jit(model_r.apply)(variables, seq, src, tgt)["view"]
    chex.assert_trees_all_close(out_scan, out_remat, atol=1e-5)


def test_convgru_cell_direct(rng):
    cell = ConvGRUCell(features=8)
    h = ConvGRUCell.init_state(2, 4, 4, 8)
    x = jnp.asarray(rng.standard_normal((2, 4, 4, 8), dtype=np.float32))
    variables = jax.jit(cell.init)(jax.random.key(0), h, x)
    h1 = jax.jit(cell.apply)(variables, h, x)
    assert h1.shape == h.shape
    # zero state + zero input stays bounded in (-1, 1)
    h2 = jax.jit(cell.apply)(variables, jnp.zeros_like(h), jnp.zeros_like(x))
    assert float(jnp.abs(h2).max()) < 1.0


@pytest.mark.slow
def test_bf16_compute_path(rng):
    cfg = _cfg(dtype="bfloat16")
    model = DMV3D(cfg)
    seq, src, tgt = _inputs(rng)
    variables = jax.jit(model.init)(jax.random.key(0), seq, src, tgt)
    out = jax.jit(model.apply)(variables, seq, src, tgt)
    # heads are f32 regardless of compute dtype
    assert out["view"].dtype == jnp.float32
    assert np.all(np.isfinite(np.asarray(out["view"])))
    # params stay f32
    assert all(p.dtype == jnp.float32
               for p in jax.tree.leaves(variables["params"]))


def test_heads_dtype_follows_model_dtype():
    """heads_dtype='' resolves to model.dtype; explicit values win. Keeps
    f32 presets (c1, goldens) bit-stable while bf16 models get the
    HBM-cheap bf16 head convs (BASELINE.md round-2 roofline)."""
    from dynamic_multiview_3d_tpu import config as config_lib
    assert config_lib.ModelConfig().heads_compute_dtype == "bfloat16"
    assert config_lib.ModelConfig(dtype="float32").heads_compute_dtype == \
        "float32"
    assert config_lib.ModelConfig(
        dtype="float32", heads_dtype="bfloat16").heads_compute_dtype == \
        "bfloat16"


def test_multiflow_shapes_and_weights(rng):
    """multiflow: per-source flows/confidences, softmax weights sum to 1,
    every in-bounds source can contribute; view is a convex combination of
    warped sources and rgb wherever mask is."""
    cfg = _cfg(synthesis="multiflow")
    model = DMV3D(cfg)
    seq, src, tgt = _inputs(rng, b=2, t=3, k=2)
    variables = jax.jit(model.init)(jax.random.key(0), seq, src, tgt)
    out = jax.jit(model.apply)(variables, seq, src, tgt)
    assert out["view"].shape == (2, 2, 64, 64, 3)
    assert out["flow"].shape == (2, 2, 3, 64, 64, 2)     # [B, K, T, H, W, 2]
    assert out["conf_weights"].shape == (2, 2, 64, 64, 3)
    assert out["flow_valid"].shape == (2, 2, 64, 64)
    w = np.asarray(out["conf_weights"])
    np.testing.assert_allclose(w.sum(-1), 1.0, atol=1e-5)
    assert np.all(np.isfinite(np.asarray(out["view"])))
    # inputs in [-1,1] + convex blends stay bounded
    assert float(jnp.abs(out["view"]).max()) <= 1.0 + 1e-5


def test_multiflow_every_source_contributes(rng):
    """Gradients must reach EVERY source frame's pixels through its own
    warp — the single-flow path only back-props into the last frame."""
    cfg = _cfg(synthesis="multiflow")
    model = DMV3D(cfg)
    seq, src, tgt = _inputs(rng, b=1, t=3, k=1)
    variables = jax.jit(model.init)(jax.random.key(0), seq, src, tgt)

    def total(s):
        return jnp.sum(model.apply(variables, s, src, tgt)["view"])

    g = jax.jit(jax.grad(total))(seq)
    for t in range(3):
        assert float(jnp.abs(g[:, t]).max()) > 1e-8, f"source {t} unused"


def test_multiflow_pallas_composite_matches_jnp(rng, monkeypatch):
    """Same heads through the Pallas (interpret) and jnp multiflow
    composites — the synthesis layout/transposes must agree exactly.
    (Whole-model pallas-vs-jnp comparisons on TPU differ at bf16-conv level
    because the two XLA programs fuse differently — that drift is upstream
    of the synthesis and identical for the single-flow path.)"""
    from dynamic_multiview_3d_tpu.models import dmv3d as dmv3d_lib

    cfg = _cfg(synthesis="multiflow", warp_precision="exact")
    model = DMV3D(cfg)
    b, t, k, s = 1, 3, 2, 64
    seq = jnp.asarray(rng.uniform(-1, 1, (b, t, s, s, 3)).astype(np.float32))
    heads = {
        "flow": jnp.asarray(rng.uniform(-20, 20, (b * k, s, s, t, 2))
                            .astype(np.float32)),
        "conf": jnp.asarray(rng.standard_normal((b * k, s, s, t))
                            .astype(np.float32)),
        "mask": jnp.asarray(rng.uniform(0, 1, (b * k, s, s, 1))
                            .astype(np.float32)),
        "rgb": jnp.asarray(rng.uniform(-1, 1, (b * k, s, s, 3))
                           .astype(np.float32)),
    }
    monkeypatch.setattr(dmv3d_lib, "_PALLAS_INTERPRET", True)
    out_p = model._multiflow_composite(heads, seq, "pallas")
    out_j = model._multiflow_composite(heads, seq, "jnp")
    for key in ("view", "warped", "flow_valid", "conf_weights"):
        np.testing.assert_allclose(np.asarray(out_p[key]),
                                   np.asarray(out_j[key]),
                                   rtol=1e-4, atol=1e-4, err_msg=key)


def test_multiflow_rejects_predict_depth(rng):
    cfg = _cfg(synthesis="multiflow", predict_depth=True)
    model = DMV3D(cfg)
    seq, src, tgt = _inputs(rng, b=1, t=2, k=1)
    with pytest.raises(ValueError, match="multiflow"):
        model.init(jax.random.key(0), seq, src, tgt)


def test_multidepth_shapes_and_weights(rng):
    """multidepth: ONE depth per target + per-source confidences; blend
    weights sum to 1; depth positive; view bounded (convex blend of
    border-padded samples and rgb)."""
    cfg = _cfg(synthesis="multidepth")
    model = DMV3D(cfg)
    seq, src, tgt = _inputs(rng, b=2, t=3, k=2)
    variables = jax.jit(model.init)(jax.random.key(0), seq, src, tgt)
    out = jax.jit(model.apply)(variables, seq, src, tgt)
    assert out["view"].shape == (2, 2, 64, 64, 3)
    assert out["depth"].shape == (2, 2, 64, 64)
    assert out["conf_weights"].shape == (2, 2, 64, 64, 3)
    assert out["geo_valid"].shape == (2, 2, 64, 64)
    assert "flow" not in out                    # no flow fields in this mode
    w = np.asarray(out["conf_weights"])
    np.testing.assert_allclose(w.sum(-1), 1.0, atol=1e-5)
    assert np.all(np.asarray(out["depth"]) > 0)
    assert np.all(np.isfinite(np.asarray(out["view"])))
    assert float(jnp.abs(out["view"]).max()) <= 1.0 + 1e-5


def test_multidepth_every_source_contributes(rng):
    """Appearance gradients must reach EVERY source frame through its own
    reprojection — the single-source depth path only back-props into the
    last frame."""
    cfg = _cfg(synthesis="multidepth")
    model = DMV3D(cfg)
    seq, src, tgt = _inputs(rng, b=1, t=3, k=1)
    variables = jax.jit(model.init)(jax.random.key(0), seq, src, tgt)

    def total(s):
        return jnp.sum(model.apply(variables, s, src, tgt)["view"])

    g = jax.jit(jax.grad(total))(seq)
    for t in range(3):
        assert float(jnp.abs(g[:, t]).max()) > 1e-8, f"source {t} unused"


def test_multidepth_depth_is_learnable(rng):
    """The view must be differentiable IN THE GEOMETRY: gradients flow from
    the blended view back into the depth head's parameters (the whole point
    of constraining correspondences to one surface)."""
    cfg = _cfg(synthesis="multidepth")
    model = DMV3D(cfg)
    seq, src, tgt = _inputs(rng, b=1, t=2, k=1)
    variables = jax.jit(model.init)(jax.random.key(0), seq, src, tgt)

    def loss(params):
        return jnp.sum(model.apply({"params": params}, seq, src, tgt)["view"])

    g = jax.jit(jax.grad(loss))(variables["params"])
    gd = g["decoder"]["depth_head"]["kernel"]
    assert float(jnp.abs(gd).max()) > 1e-10, "no gradient into depth head"


def test_multidepth_pallas_composite_matches_jnp(rng, monkeypatch):
    """Same heads through the fused-kernel (interpret) and jnp multidepth
    composites — reprojection layout, z-bias folding, and transposes must
    agree exactly."""
    from dynamic_multiview_3d_tpu.models import dmv3d as dmv3d_lib

    cfg = _cfg(synthesis="multidepth", warp_precision="exact")
    model = DMV3D(cfg)
    b, t, k, s = 1, 3, 2, 64
    seq = jnp.asarray(rng.uniform(-1, 1, (b, t, s, s, 3)).astype(np.float32))
    src = jnp.asarray(rng.uniform(0, 1, (b, t, 3)).astype(np.float32)
                      + [0, 0, 1])
    tgt = jnp.asarray(rng.uniform(0, 1, (b, k, 3)).astype(np.float32)
                      + [0, 0, 1])
    heads = {
        "depth": jnp.asarray(rng.uniform(0.5, 2.5, (b * k, s, s))
                             .astype(np.float32)),
        "conf": jnp.asarray(rng.standard_normal((b * k, s, s, t))
                            .astype(np.float32)),
        "mask": jnp.asarray(rng.uniform(0, 1, (b * k, s, s, 1))
                            .astype(np.float32)),
        "rgb": jnp.asarray(rng.uniform(-1, 1, (b * k, s, s, 3))
                           .astype(np.float32)),
    }
    monkeypatch.setattr(dmv3d_lib, "_PALLAS_INTERPRET", True)
    out_p = model._multidepth_composite(heads, seq, src, tgt, "pallas")
    out_j = model._multidepth_composite(heads, seq, src, tgt, "jnp")
    for key in ("view", "warped", "geo_view", "geo_valid", "conf_weights"):
        np.testing.assert_allclose(np.asarray(out_p[key]),
                                   np.asarray(out_j[key]),
                                   rtol=1e-4, atol=1e-4, err_msg=key)


def test_multidepth_correct_depth_reconstructs(rng):
    """Ground-truth geometry sanity: render a flat textured plane at known
    depth, give the composite the TRUE depth and uniform confidences — the
    blended view must reconstruct the target view far better than a wrong
    depth does (pure geometry, no learned parts)."""
    from dynamic_multiview_3d_tpu.models import dmv3d as dmv3d_lib
    from dynamic_multiview_3d_tpu.ops import pose as pose_ops
    from dynamic_multiview_3d_tpu.ops import reproject as reproject_ops

    cfg = _cfg(synthesis="multidepth")
    model = DMV3D(cfg)
    b, t, k, s = 1, 2, 1, 64
    # target camera straight on; sources slightly rotated on the orbit
    tgt = jnp.asarray([[[0.0, 0.0, 2.0]]], jnp.float32)          # [1,1,3]
    src = jnp.asarray([[[0.06, 0.0, 2.0], [-0.06, 0.03, 2.0]]],
                      jnp.float32)                               # [1,2,3]
    # scene: textured plane z=const in the TARGET camera. Render each source
    # view by reprojecting the target image with the true depth (the same
    # geometry the composite should invert). The texture must be SMOOTH:
    # the source render + composite re-sample is a double bilinear
    # interpolation, which annihilates per-pixel noise even with perfect
    # geometry — low-frequency sinusoids survive it almost exactly.
    yy, xx = np.meshgrid(np.linspace(0, 2 * np.pi, s),
                         np.linspace(0, 2 * np.pi, s), indexing="ij")
    tex = jnp.asarray(np.stack([np.sin(2 * xx) * np.cos(yy),
                                np.sin(xx + 2 * yy),
                                np.cos(3 * xx) * np.sin(2 * yy)],
                               -1)[None].astype(np.float32))
    depth_true = jnp.full((b * k, s, s), 1.7, jnp.float32)
    focal = jnp.full((b * k * t,), float(s), jnp.float32)
    intr = pose_ops.intrinsics_matrix(focal, (s - 1) / 2, (s - 1) / 2)
    t_tgt = pose_ops.look_at_extrinsics(tgt.reshape(1, 3))
    t_src = pose_ops.look_at_extrinsics(src.reshape(t, 3))
    # source images: sample the target texture where each SOURCE pixel's ray
    # (at the plane depth in the source camera... approximated by rendering
    # from the target instead: warp tex into each source with rel inverted)
    rel_s2t = pose_ops.relative_transform(
        jnp.broadcast_to(t_tgt, (t, 4, 4)), t_src)      # src-cam -> tgt-cam
    # depth of the plane as seen from each source ≈ same order; use the
    # true value — small rotations keep the approximation tight enough for
    # the contrast assertion below (correct vs clearly-wrong depth).
    d_src = jnp.full((t, s, s), 1.7, jnp.float32)
    src_imgs, _ = reproject_ops.depth_reproject_sample(
        jnp.broadcast_to(tex, (t, s, s, 3)), d_src,
        intr[:t], rel_s2t, padding_mode="border")
    seq = src_imgs[None]                                  # [1, T, H, W, 3]

    def render(depth_val):
        heads = {
            "depth": jnp.full((b * k, s, s), depth_val, jnp.float32),
            "conf": jnp.zeros((b * k, s, s, t), jnp.float32),
            "mask": jnp.ones((b * k, s, s, 1), jnp.float32),
            "rgb": jnp.zeros((b * k, s, s, 3), jnp.float32),
        }
        out = model._multidepth_composite(heads, seq, src, tgt, "jnp")
        v = np.asarray(out["view"])[0, 0]
        gv = np.asarray(out["geo_valid"])[0, 0] > 0.5
        err = np.abs(v - np.asarray(tex)[0])[gv]
        return float(err.mean())

    err_true, err_wrong = render(1.7), render(0.6)
    assert err_true < 0.5 * err_wrong, (err_true, err_wrong)


def test_multidepth_rejects_predict_depth(rng):
    cfg = _cfg(synthesis="multidepth", predict_depth=True)
    model = DMV3D(cfg)
    seq, src, tgt = _inputs(rng, b=1, t=2, k=1)
    with pytest.raises(ValueError, match="multidepth"):
        model.init(jax.random.key(0), seq, src, tgt)


def test_multidepth_total_loss(rng):
    """losses.total_loss consumes multidepth outputs: mask supervision uses
    geo_valid, the geo_l1 term supervises the blended geometric view, and
    the smoothness term is a no-op (no flow fields)."""
    from dynamic_multiview_3d_tpu.train import losses as losses_lib

    cfg = _cfg(synthesis="multidepth")
    model = DMV3D(cfg)
    seq, src, tgt = _inputs(rng, b=1, t=2, k=2)
    variables = jax.jit(model.init)(jax.random.key(0), seq, src, tgt)
    out = jax.jit(model.apply)(variables, seq, src, tgt)
    batch = {"tgt_images": jnp.zeros_like(out["view"])}
    tc = config_lib.TrainConfig(smooth_weight=0.1)
    loss, metrics = losses_lib.total_loss(out, batch, tc,
                                          synthesis="multidepth")
    assert np.isfinite(float(loss))
    assert "loss/geo_l1" in metrics and "loss/smooth" not in metrics


@pytest.mark.slow
def test_convlstm_recurrence(rng):
    cfg = _cfg(rnn="lstm")
    model = DMV3D(cfg)
    seq, src, tgt = _inputs(rng, b=1, t=3, k=2)
    variables = jax.jit(model.init)(jax.random.key(0), seq, src, tgt)
    fwd = jax.jit(model.apply)
    out = fwd(variables, seq, src, tgt)
    assert out["view"].shape == (1, 2, 64, 64, 3)
    # early-frame perturbation must change the output (state carries info)
    out_b = fwd(variables, seq.at[:, 0].set(-seq[:, 0]), src, tgt)
    assert float(jnp.abs(out["view"] - out_b["view"]).max()) > 1e-6


@pytest.mark.parametrize("up_order,skip_fusion", [
    pytest.param("norm_first", "split", marks=pytest.mark.slow),
    pytest.param("d2s_first", "concat", marks=pytest.mark.slow),
    ("norm_first", "concat"),      # both levers on — fast-tier coverage
])
def test_decoder_variant_forward_and_grad(rng, up_order, skip_fusion):
    """The round-3 decoder A/B variants (up_order / skip_fusion — the
    restructurable-HBM levers from VERDICT r2 #4) produce the same output
    shapes and carry finite gradients; the default ("d2s_first","split")
    is covered by every other test."""
    cfg = _cfg(size=32, levels=3, up_order=up_order, skip_fusion=skip_fusion)
    model = DMV3D(cfg)
    seq, src, tgt = _inputs(rng, b=2, t=1, k=2, size=32)
    variables = jax.jit(model.init)(jax.random.key(0), seq, src, tgt)
    out = jax.jit(model.apply)(variables, seq, src, tgt)
    assert out["view"].shape == (2, 2, 32, 32, 3)
    assert np.all(np.isfinite(np.asarray(out["view"])))

    def loss(v):
        return jnp.mean(model.apply(v, seq, src, tgt)["view"] ** 2)

    g = jax.jit(jax.grad(loss))(variables)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(bool(jnp.all(jnp.isfinite(x))) for x in leaves)
    # concat mode folds the skip conv into fuse{i}_x (no fuse{i}_skip param)
    dec = variables["params"]["decoder"]
    assert ("fuse0_skip" in dec) == (skip_fusion == "split")


@pytest.mark.parametrize("synthesis", ["multiflow", "multidepth"])
def test_shared_heads_variable_t(rng, synthesis):
    """multi_head_mode='shared' (round 5, VERDICT r4 missing #4): the
    per-source head carries no T in its param shapes, so ONE checkpoint
    serves any source count — init at T=4, apply at T=2 and T=6."""
    cfg = _cfg(synthesis=synthesis)
    assert cfg.multi_head_mode == "shared"   # the round-5 default
    model = DMV3D(cfg)
    seq4, src4, tgt = _inputs(rng, b=2, t=4, k=2, size=64)
    variables = jax.jit(model.init)(jax.random.key(0), seq4, src4, tgt)
    # no param shape depends on T
    flat = jax.tree_util.tree_leaves_with_path(variables["params"])
    for path, leaf in flat:
        assert 4 not in leaf.shape or "srchead" not in str(path), path
    for t in (2, 6):
        seq, src, _ = _inputs(rng, b=2, t=t, k=2, size=64)
        out = model.apply(variables, seq, src, tgt)
        assert out["view"].shape == (2, 2, 64, 64, 3)
        assert out["conf_weights"].shape[-1] == t
        w = np.asarray(out["conf_weights"])
        np.testing.assert_allclose(w.sum(-1), 1.0, atol=1e-5)
        assert np.all(np.isfinite(np.asarray(out["view"])))


@pytest.mark.parametrize("synthesis", ["multiflow", "multidepth"])
def test_baked_heads_compat_mode(rng, synthesis):
    """multi_head_mode='baked' reproduces the rounds-3/4 layout (one conv
    with T baked into its channel count) — pre-round-5 checkpoints keep
    loading — and applying it at a different T fails loudly instead of
    silently mis-slicing."""
    cfg = _cfg(synthesis=synthesis, multi_head_mode="baked")
    model = DMV3D(cfg)
    seq, src, tgt = _inputs(rng, b=2, t=3, k=2, size=64)
    variables = jax.jit(model.init)(jax.random.key(0), seq, src, tgt)
    dec = variables["params"]["decoder"]
    assert "heads_multi" in dec          # the T-baked conv
    assert "srchead_out" not in dec
    out = model.apply(variables, seq, src, tgt)
    assert out["view"].shape == (2, 2, 64, 64, 3)
    seq2, src2, _ = _inputs(rng, b=2, t=5, k=2, size=64)
    with pytest.raises(Exception):       # flax param-shape mismatch
        model.apply(variables, seq2, src2, tgt)


def test_shared_heads_grad_finite(rng):
    """Gradients flow through the shared per-source head (FiLM add + 1x1
    convs) for every input, multiflow and multidepth."""
    for synthesis in ("multiflow", "multidepth"):
        cfg = _cfg(synthesis=synthesis)
        model = DMV3D(cfg)
        seq, src, tgt = _inputs(rng, b=1, t=3, k=1, size=64)
        variables = jax.jit(model.init)(jax.random.key(0), seq, src, tgt)

        def loss(v):
            return jnp.mean(model.apply(v, seq, src, tgt)["view"] ** 2)

        g = jax.jit(jax.grad(loss))(variables)
        leaves = jax.tree_util.tree_leaves(g)
        assert all(bool(jnp.all(jnp.isfinite(x))) for x in leaves)
        # the per-source head params actually receive gradient
        gd = g["params"]["decoder"]
        assert float(jnp.abs(gd["srchead_out"]["kernel"]).max()) > 0
        assert float(jnp.abs(gd["srchead_pose"]["kernel"]).max()) > 0


def test_shared_heads_source_order_matters(rng):
    """The per-source FiLM conditioning discriminates sources: permuting
    which pose goes with which frame changes the output (the pooled
    bottleneck alone would be permutation-blind)."""
    cfg = _cfg(synthesis="multidepth")
    model = DMV3D(cfg)
    seq, src, tgt = _inputs(rng, b=1, t=4, k=1, size=64)
    variables = jax.jit(model.init)(jax.random.key(0), seq, src, tgt)
    out = model.apply(variables, seq, src, tgt)
    out_p = model.apply(variables, seq, src[:, ::-1], tgt)
    assert float(jnp.abs(out["view"] - out_p["view"]).max()) > 1e-6
