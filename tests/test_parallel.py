"""Distributed tests without a cluster (SURVEY.md §4.4): 8-device CPU mesh.

DP loss/grads must match the single-device run (psum of identical math), in
both shard_map and GSPMD-auto modes; the 2-D ('data','model') mesh must
compile and run; multi-host Grain sharding logic is unit-tested with faked
process indices."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dynamic_multiview_3d_tpu import config as config_lib
from dynamic_multiview_3d_tpu.data.synthetic import SyntheticScenes
from dynamic_multiview_3d_tpu.parallel import mesh as mesh_lib
from dynamic_multiview_3d_tpu.train import step as step_lib


def _cfg(**kw):
    over = [
        "model.image_size=32", "model.num_levels=3", "model.base_features=8",
        "model.max_features=16", "model.gru_features=16",
        "model.pose_embed_dim=8", "model.dtype=float32",
        "model.use_pallas=False",
        "data.image_size=32", "data.batch_size=8", "data.num_scenes=2",
        "train.lr=1e-3",
    ] + list(kw.pop("overrides", []))
    return config_lib.override(config_lib.Config(), over)


@pytest.fixture(scope="module")
def batch():
    src = SyntheticScenes(num_scenes=2, image_size=32, seq_len=1,
                          num_targets=1)
    return src.batch(range(8))


def test_mesh_shapes():
    mesh = mesh_lib.make_mesh(config_lib.MeshConfig(data=4, model=2))
    assert mesh.shape == {"data": 4, "model": 2}
    mesh = mesh_lib.make_mesh(config_lib.MeshConfig())  # all devices on data
    assert mesh.shape["data"] == len(jax.devices())


@pytest.mark.parametrize("mode", [
    "shard_map",
    pytest.param("auto", marks=pytest.mark.slow),
])
def test_dp_matches_single_device(batch, mode):
    """8-way DP step == single-device step on the same global batch.

    SGD for the comparison: Adam's step-1 update is sign(g)-scaled, so the
    1e-7-level reduction-order differences between a global mean and a pmean
    of shard means would flip near-zero grads into +-2*lr param diffs.
    """
    cfg = _cfg(overrides=["train.optimizer=sgd"])
    state0 = step_lib.init_state(cfg)

    single = step_lib.make_train_step(cfg)
    s1, m1 = single(state0, jax.device_put(batch))

    mesh = mesh_lib.make_mesh(config_lib.MeshConfig(data=8, model=1))
    state_r = jax.device_put(step_lib.init_state(cfg),
                             mesh_lib.replicate(mesh))
    dp = step_lib.make_train_step(cfg, mesh=mesh, mode=mode)
    s8, m8 = dp(state_r, mesh_lib.shard_batch(mesh, batch))

    np.testing.assert_allclose(float(m1["loss/total"]),
                               float(m8["loss/total"]), rtol=2e-5)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s8.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=2e-5)


def test_2d_mesh_model_axis_runs(batch):
    """('data','model')=(4,2) mesh with channel-sharded wide params."""
    cfg = _cfg()
    mesh = mesh_lib.make_mesh(config_lib.MeshConfig(data=4, model=2))
    state = step_lib.init_state(cfg)
    rules = mesh_lib.model_axis_rules(state.params, mesh, min_size=16)
    state = state.replace(
        params=jax.device_put(state.params, rules),
        opt_state=jax.device_put(state.opt_state,
                                 mesh_lib.replicate(mesh)))
    step = step_lib.make_train_step(cfg, mesh=mesh, mode="auto")
    s2, m2 = step(state, mesh_lib.shard_batch(mesh, batch))
    assert np.isfinite(float(m2["loss/total"]))


def test_multihost_grain_sharding_logic():
    """Per-process Grain sharding covers the index space disjointly
    (faked process indices — SURVEY.md §4.4)."""
    from dynamic_multiview_3d_tpu.data import pipeline as pipeline_lib
    dcfg = config_lib.DataConfig(image_size=32, batch_size=8, num_scenes=16,
                                 grain_workers=0, seed=0)
    seen = []
    for pidx in range(2):
        it = pipeline_lib.make_grain_iterator(
            dcfg, process_index=pidx, process_count=2, num_epochs=1)
        for b in it:
            assert b["image_seq"].shape[0] == 4  # per-host share
            seen.append(np.asarray(b["src_poses"]))
    assert len(seen) >= 4  # 16 records / 2 hosts / 4 per batch = 2 each
    # disjointness: no duplicated pose rows across hosts
    allp = np.concatenate([s.reshape(-1, 3) for s in seen])
    uniq = np.unique(np.round(allp, 5), axis=0)
    assert uniq.shape[0] == allp.shape[0]


def test_shard_batch_places_on_data_axis(batch):
    mesh = mesh_lib.make_mesh(config_lib.MeshConfig(data=8, model=1))
    global_batch = mesh_lib.shard_batch(mesh, batch)
    arr = global_batch["image_seq"]
    assert arr.shape[0] == 8
    assert len(arr.sharding.device_set) == 8


@pytest.mark.slow
def test_subsampling_shard_map_matches_auto():
    """On-device view-pair subsampling must fold the GLOBAL example index:
    every shard draws an independent subset and 'shard_map' == 'auto'
    numerically (round-1 review: shards drew correlated permutations)."""
    cfg = _cfg(overrides=["train.optimizer=sgd", "data.num_targets=4",
                          "data.targets_per_step=2"])
    src = SyntheticScenes(num_scenes=2, image_size=32, seq_len=1,
                          num_targets=4)
    batch8 = src.batch(range(8))
    mesh = mesh_lib.make_mesh(config_lib.MeshConfig(data=8, model=1))

    state0 = step_lib.init_state(cfg)
    state_a = jax.device_put(state0, mesh_lib.replicate(mesh))
    sm = step_lib.make_train_step(cfg, mesh=mesh, mode="shard_map")
    _, m_sm = sm(state_a, mesh_lib.shard_batch(mesh, batch8))

    state_b = jax.device_put(step_lib.init_state(cfg),
                             mesh_lib.replicate(mesh))
    auto = step_lib.make_train_step(cfg, mesh=mesh, mode="auto")
    _, m_auto = auto(state_b, mesh_lib.shard_batch(mesh, batch8))

    np.testing.assert_allclose(float(m_sm["loss/total"]),
                               float(m_auto["loss/total"]), rtol=2e-5)


def test_make_batch_fn_slices_per_process(monkeypatch):
    """Non-streaming multihost: each process must materialize only ITS
    contiguous slice of the global batch (round-2 fix — every process built
    the full global batch, which make_array_from_process_local_data would
    then mis-assemble)."""
    from dynamic_multiview_3d_tpu.train import loop as loop_lib
    cfg = _cfg()
    src = SyntheticScenes(num_scenes=2, image_size=32, seq_len=1,
                          num_targets=1)
    full = loop_lib._make_batch_fn(cfg, src)(3)     # 1-process: whole batch
    assert full["image_seq"].shape[0] == 8

    slices = []
    monkeypatch.setattr(jax, "process_count", lambda: 2)
    for pidx in (0, 1):
        monkeypatch.setattr(jax, "process_index", lambda p=pidx: p)
        part = loop_lib._make_batch_fn(cfg, src)(3)
        assert part["image_seq"].shape[0] == 4
        slices.append(part)
    glued = np.concatenate([slices[0]["image_seq"], slices[1]["image_seq"]])
    np.testing.assert_array_equal(glued, np.asarray(full["image_seq"]))
