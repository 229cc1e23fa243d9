"""Depth-reprojection closed-form tests (SURVEY.md §4.1)."""

import jax
import jax.numpy as jnp
import numpy as np

from dynamic_multiview_3d_tpu.ops import pose as P
from dynamic_multiview_3d_tpu.ops import reproject as R
from dynamic_multiview_3d_tpu.ops import sampling as gs


def _k(h, w, f=None):
    f = f or float(max(h, w))
    return P.intrinsics_matrix(
        jnp.full((1,), f), (w - 1) / 2.0, (h - 1) / 2.0)


def test_inv3x3_matches_numpy(rng):
    """Closed-form adjugate inverse == np.linalg.inv on random
    well-conditioned batches AND real intrinsics matrices. inv3x3 exists
    so exported artifacts carry no LAPACK custom calls (fresh-process
    serving segfault, round 5 — see test_serving.py)."""
    m = rng.uniform(-1, 1, (16, 3, 3)).astype(np.float32)
    m += 3.0 * np.eye(3, dtype=np.float32)          # keep well-conditioned
    got = np.asarray(R.inv3x3(jnp.asarray(m)))
    want = np.linalg.inv(m)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6)
    k = np.asarray(_k(64, 64)).repeat(4, axis=0)
    np.testing.assert_allclose(np.asarray(R.inv3x3(jnp.asarray(k))),
                               np.linalg.inv(k), rtol=1e-5, atol=1e-7)


def test_identity_pose_gives_identity_field():
    h = w = 8
    depth = jnp.full((1, h, w), 2.0)
    coords, valid = R.reproject_coords(depth, _k(h, w), jnp.eye(4)[None])
    expected = gs.base_grid(h, w)[None]
    np.testing.assert_allclose(np.asarray(coords), np.asarray(expected),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(valid), 1.0)


def test_z_translation_gives_radial_field():
    # Moving the source camera back (target point appears closer to center in
    # source view): coords shrink toward the principal point.
    h = w = 9
    depth = jnp.full((1, h, w), 2.0)
    t = jnp.eye(4).at[2, 3].set(2.0)[None]    # X_src = X_tgt + 2 z
    coords, valid = R.reproject_coords(depth, _k(h, w), t)
    c = np.asarray(coords)[0]
    center = np.array([(w - 1) / 2, (h - 1) / 2])
    base = np.asarray(gs.base_grid(h, w))
    # depth 2 -> 4 halves the offset from the principal point.
    np.testing.assert_allclose(c - center, (base - center) * 0.5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(valid), 1.0)


def test_points_behind_camera_are_invalid():
    h = w = 4
    depth = jnp.full((1, h, w), 1.0)
    t = jnp.eye(4).at[2, 3].set(-5.0)[None]   # pushes all points behind src cam
    _, valid = R.reproject_coords(depth, _k(h, w), t)
    np.testing.assert_allclose(np.asarray(valid), 0.0)


def test_reprojection_consistency_with_lookat_cameras():
    # A world point at the origin must land at both principal points.
    h = w = 17
    pose_src = jnp.array([[0.4, 0.3, 2.0]])
    pose_tgt = jnp.array([[0.9, 0.1, 2.5]])
    t_src = P.look_at_extrinsics(pose_src)
    t_tgt = P.look_at_extrinsics(pose_tgt)
    rel = P.relative_transform(t_src, t_tgt)
    # Depth of the origin in the target camera is its radius (look-at).
    depth = jnp.full((1, h, w), 2.5)
    coords, valid = R.reproject_coords(depth, _k(h, w), rel)
    cx = cy = (h - 1) / 2
    # The center pixel's ray hits the origin at depth r; it must reproject to
    # the source principal point.
    c = np.asarray(coords)[0, int(cy), int(cx)]
    np.testing.assert_allclose(c, [cx, cy], atol=1e-3)
    assert np.asarray(valid)[0, int(cy), int(cx)] == 1.0


def test_depth_reproject_sample_identity(rng):
    h = w = 8
    img = jnp.asarray(rng.standard_normal((1, h, w, 3), dtype=np.float32))
    depth = jnp.full((1, h, w), 2.0)
    out, valid = R.depth_reproject_sample(img, depth, _k(h, w),
                                          jnp.eye(4)[None])
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-4)


def test_differentiable_wrt_depth():
    h = w = 8
    img = jnp.ones((1, h, w, 1))
    k = _k(h, w)
    t = jnp.eye(4).at[0, 3].set(0.5)[None]

    def f(d):
        out, _ = R.depth_reproject_sample(img, d, k, t)
        return jnp.sum(out)

    g = jax.grad(f)(jnp.full((1, h, w), 2.0))
    assert np.all(np.isfinite(np.asarray(g)))
