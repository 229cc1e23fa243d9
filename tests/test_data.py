"""Synthetic data source tests + numpy/jax camera-math agreement."""

import numpy as np
import jax.numpy as jnp

from dynamic_multiview_3d_tpu.data import synthetic
from dynamic_multiview_3d_tpu.ops import pose as pose_ops


def test_look_at_np_matches_jax(rng):
    for _ in range(5):
        pose = rng.uniform(0.1, 1.0, 3).astype(np.float32) + [0, 0, 1.5]
        t_np = synthetic.look_at_np(pose)
        t_jx = np.asarray(pose_ops.look_at_extrinsics(jnp.asarray(pose)))
        np.testing.assert_allclose(t_np, t_jx, atol=1e-5)


def test_render_determinism():
    s = synthetic.SyntheticScenes(num_scenes=4, image_size=64)
    pose = np.array([0.5, 0.3, 2.0], np.float32)
    a = s.render(1, pose)
    b = s.render(1, pose)
    np.testing.assert_array_equal(a, b)
    # different scenes differ
    c = s.render(2, pose)
    assert np.abs(a.astype(int) - c.astype(int)).mean() > 1


def test_render_pose_sensitivity():
    s = synthetic.SyntheticScenes(num_scenes=4, image_size=64)
    a = s.render(0, np.array([0.0, 0.3, 2.0], np.float32))
    b = s.render(0, np.array([0.6, 0.3, 2.0], np.float32))
    assert np.abs(a.astype(int) - b.astype(int)).mean() > 1


def test_dynamic_scenes_move():
    s = synthetic.SyntheticScenes(num_scenes=4, image_size=64, dynamic=True)
    pose = np.array([0.5, 0.3, 2.0], np.float32)
    a = s.render(0, pose, time=0.0)
    b = s.render(0, pose, time=3.0)
    assert np.abs(a.astype(int) - b.astype(int)).mean() > 0.5


def test_example_shapes_and_range():
    s = synthetic.SyntheticScenes(num_scenes=4, image_size=64, seq_len=3,
                                  num_targets=2, dynamic=True)
    ex = s.example(7)
    assert ex["image_seq"].shape == (3, 64, 64, 3)
    assert ex["tgt_images"].shape == (2, 64, 64, 3)
    assert ex["src_poses"].shape == (3, 3)
    assert ex["tgt_poses"].shape == (2, 3)
    assert ex["image_seq"].min() >= -1.0 and ex["image_seq"].max() <= 1.0
    # deterministic per index
    ex2 = s.example(7)
    np.testing.assert_array_equal(ex["image_seq"], ex2["image_seq"])


def test_batch():
    s = synthetic.SyntheticScenes(num_scenes=4, image_size=32)
    b = s.batch(range(3))
    assert b["image_seq"].shape == (3, 1, 32, 32, 3)
    assert b["tgt_poses"].shape == (3, 1, 3)


def test_uint8_roundtrip():
    img = np.random.default_rng(0).integers(0, 256, (4, 4, 3), dtype=np.uint8)
    np.testing.assert_array_equal(
        synthetic.to_uint8(synthetic.to_model(img)), img)
