"""Pose encoding + camera math unit tests."""

import jax.numpy as jnp
import numpy as np

from dynamic_multiview_3d_tpu.ops import pose as P


def test_pose_to_features_shape_and_values():
    pose = jnp.array([[0.0, jnp.pi / 2, 2.0]])
    feats = np.asarray(P.pose_to_features(pose))
    np.testing.assert_allclose(feats, [[0.0, 1.0, 1.0, 0.0, 2.0]], atol=1e-6)


def test_encode_view_pair_azimuth_equivariance(rng):
    src = rng.uniform(0, 2 * np.pi, (4, 3)).astype(np.float32)
    tgt = rng.uniform(0, 2 * np.pi, (4, 3)).astype(np.float32)
    src[:, 2] = tgt[:, 2] = 2.0
    shift = 1.234
    a = P.encode_view_pair(jnp.asarray(src), jnp.asarray(tgt))
    src2, tgt2 = src.copy(), tgt.copy()
    src2[:, 0] += shift
    tgt2[:, 0] += shift
    b = P.encode_view_pair(jnp.asarray(src2), jnp.asarray(tgt2))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_look_at_camera_sees_center():
    # Any camera on the sphere must map the world origin to (0, 0, r) in cam.
    for az, el, r in [(0.0, 0.0, 2.0), (1.0, 0.5, 3.0), (-2.0, -0.3, 1.5)]:
        t = np.asarray(P.look_at_extrinsics(jnp.array([az, el, r])))
        origin_cam = t @ np.array([0.0, 0.0, 0.0, 1.0])
        np.testing.assert_allclose(origin_cam[:3], [0.0, 0.0, r], atol=1e-5)
        # Rotation block is orthonormal.
        rot = t[:3, :3]
        np.testing.assert_allclose(rot @ rot.T, np.eye(3), atol=1e-5)


def test_relative_transform_identity():
    t = P.look_at_extrinsics(jnp.array([0.7, 0.2, 2.0]))
    rel = np.asarray(P.relative_transform(t, t))
    np.testing.assert_allclose(rel, np.eye(4), atol=1e-5)


def test_relative_transform_composition(rng):
    pa = jnp.asarray(rng.uniform(0.1, 1.0, 3).astype(np.float32) + [0, 0, 1.5])
    pb = jnp.asarray(rng.uniform(0.1, 1.0, 3).astype(np.float32) + [0, 0, 1.5])
    ta, tb = P.look_at_extrinsics(pa), P.look_at_extrinsics(pb)
    rel = np.asarray(P.relative_transform(ta, tb))
    # X_a = rel @ X_b for a world point seen in both cameras.
    world = np.array([0.3, -0.2, 0.1, 1.0], np.float32)
    xa = np.asarray(ta) @ world
    xb = np.asarray(tb) @ world
    np.testing.assert_allclose(rel @ xb, xa, atol=1e-4)


def test_encode_pose_modes(rng):
    src = jnp.asarray(rng.uniform(0, 1, (2, 3)).astype(np.float32) + [0, 0, 1.5])
    tgt = jnp.asarray(rng.uniform(0, 1, (2, 3)).astype(np.float32) + [0, 0, 1.5])
    assert P.encode_pose(src, tgt, "sincos").shape == (2, 8)
    assert P.encode_pose(src, tgt, "mat").shape == (2, 12)


def test_intrinsics_matrix():
    k = np.asarray(P.intrinsics_matrix(100.0, 32.0, 32.0))
    np.testing.assert_allclose(
        k, [[100, 0, 32], [0, 100, 32], [0, 0, 1]], atol=1e-6)
