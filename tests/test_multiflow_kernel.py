"""Parity tests for the fused multiflow kernel (kernels/multiflow_pallas.py)
against an independent jnp composition — forward outputs AND the gradients
of every differentiable input, in interpret mode on CPU (SURVEY.md §4.1)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dynamic_multiview_3d_tpu.kernels import multiflow_pallas
from dynamic_multiview_3d_tpu.ops import sampling


def _ref(imgs, ix, iy, conf, mask, rgb):
    """jnp reference: imgs [N,T,C,H,W]; ix/iy/conf [N,T,P]; mask [N,P];
    rgb [N,C,P] -> (view, multi, any_valid, wts)."""
    n, t, c, h, w = imgs.shape
    p = ix.shape[-1]
    valid = ((ix >= 0) & (ix <= w - 1) & (iy >= 0) & (iy <= h - 1)
             ).astype(jnp.float32)                        # [N,T,P]
    wts = jax.nn.softmax(conf + (valid - 1.0) * 30.0, axis=1)
    nhwc = imgs.transpose(0, 1, 3, 4, 2).reshape(n * t, h, w, c)
    grid = sampling.normalize_coords(
        jnp.stack([ix, iy], -1).reshape(n * t, 1, p, 2), h, w,
        align_corners=True)
    warped = sampling.grid_sample(nhwc, grid, align_corners=True,
                                  padding_mode="border")  # [N*T,1,P,C]
    warped = warped.reshape(n, t, p, c).transpose(0, 1, 3, 2)   # [N,T,C,P]
    multi = jnp.sum(wts[:, :, None] * warped, axis=1)     # [N,C,P]
    view = mask[:, None] * multi + (1.0 - mask[:, None]) * rgb
    return view, multi, jnp.max(valid, axis=1), wts


def _case(rng, n=2, t=3, c=3, h=32, w=32, k=2):
    p = k * h * w
    imgs = jnp.asarray(rng.uniform(-1, 1, (n, t, c, h, w)).astype(np.float32))
    # coords spill past the borders on purpose (validity + clamping paths)
    ix = jnp.asarray(rng.uniform(-6, w + 5, (n, t, p)).astype(np.float32))
    iy = jnp.asarray(rng.uniform(-6, h + 5, (n, t, p)).astype(np.float32))
    conf = jnp.asarray(rng.standard_normal((n, t, p)).astype(np.float32))
    mask = jnp.asarray(rng.uniform(0, 1, (n, p)).astype(np.float32))
    rgb = jnp.asarray(rng.uniform(-1, 1, (n, c, p)).astype(np.float32))
    return imgs, ix, iy, conf, mask, rgb


@pytest.mark.parametrize("precision,tol", [("exact", 1e-4), ("fast", 3e-2)])
def test_forward_matches_jnp(rng, precision, tol):
    args = _case(rng)
    got = multiflow_pallas.multiflow_composite_pix(
        *args, "border", True, precision)
    want = _ref(*args)
    for g, w_, name in zip(got, want, ("view", "multi", "any_valid", "wts")):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w_),
                                   rtol=tol, atol=tol, err_msg=name)


@pytest.mark.parametrize("precision,tol", [("exact", 1e-4),
                                           pytest.param("fast", 5e-2,
                                                        marks=pytest.mark.slow)])
def test_gradients_match_jnp(rng, precision, tol):
    """Every differentiable input: imgs, ix, iy, conf, mask, rgb — through
    a loss that exercises all three differentiable outputs."""
    args = _case(rng, n=1, t=3, h=16, w=16, k=1)
    cv = jnp.asarray(rng.standard_normal((1, 3, 256)).astype(np.float32))
    cm = jnp.asarray(rng.standard_normal((1, 3, 256)).astype(np.float32))
    cw = jnp.asarray(rng.standard_normal((1, 3, 256)).astype(np.float32))

    def loss(fn):
        def f(*a):
            view, multi, _, wts = fn(*a)
            return (jnp.sum(view * cv) + jnp.sum(multi * cm)
                    + jnp.sum(wts * cw))
        return f

    g_pallas = jax.grad(loss(lambda *a: multiflow_pallas.
                             multiflow_composite_pix(*a, "border", True,
                                                     precision)),
                        argnums=tuple(range(6)))(*args)
    g_ref = jax.grad(loss(_ref), argnums=tuple(range(6)))(*args)
    names = ("imgs", "ix", "iy", "conf", "mask", "rgb")
    for gp, gr, name in zip(g_pallas, g_ref, names):
        np.testing.assert_allclose(np.asarray(gp), np.asarray(gr),
                                   rtol=tol, atol=tol, err_msg=name)


def test_planner_rejects_oversized_shapes():
    # 512² with T=8 can't fit the backward's image stash in scoped VMEM
    assert not multiflow_pallas.kernel_supported(8, 3, 8 * 512 * 512, 512, 512,
                                                 "fast")
    # the flagship c3mf shape must stay on the kernel
    assert multiflow_pallas.kernel_supported(8, 3, 2 * 128 * 128, 128, 128,
                                             "fast")
    # non-128-multiple pixel counts above the single-block cap fall back
    assert not multiflow_pallas.kernel_supported(2, 3, 3000, 64, 64, "fast")


# --- on-chip regression tier (VERDICT r4 missing #2): the kernel the
# flagship trains on must verify compiled on real hardware, not only in
# interpret mode — a Mosaic/jax upgrade could silently break it.

@pytest.mark.tpu
@pytest.mark.parametrize("precision,ftol,gtol", [
    ("exact", 5e-6, 1e-4), ("fast", 3e-2, 5e-2)])
def test_compiled_on_tpu_matches_jnp(rng, precision, ftol, gtol):
    """Forward + all six gradients, compiled (interpret=False) on the chip,
    at a 64²-image shape."""
    args = _case(rng, n=1, t=3, h=64, w=64, k=1)
    got = multiflow_pallas.multiflow_composite_pix(
        *args, "border", False, precision)
    want = _ref(*args)
    for g, w_, name in zip(got, want, ("view", "multi", "any_valid", "wts")):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w_),
                                   rtol=ftol, atol=ftol, err_msg=name)

    p = args[1].shape[-1]
    cv = jnp.asarray(rng.standard_normal((1, 3, p)).astype(np.float32))

    def loss(fn):
        def f(*a):
            view, multi, _, wts = fn(*a)
            return (jnp.sum(view * cv) + jnp.sum(multi ** 2)
                    + jnp.sum(wts ** 2))
        return f

    g_tpu = jax.jit(jax.grad(loss(
        lambda *a: multiflow_pallas.multiflow_composite_pix(
            *a, "border", False, precision)),
        argnums=tuple(range(6))))(*args)
    g_ref = jax.grad(loss(_ref), argnums=tuple(range(6)))(*args)
    for gp, gr, name in zip(g_tpu, g_ref,
                            ("imgs", "ix", "iy", "conf", "mask", "rgb")):
        np.testing.assert_allclose(
            np.asarray(gp), np.asarray(gr), rtol=gtol,
            atol=gtol * max(1.0, float(np.abs(np.asarray(gr)).max())),
            err_msg=name)


@pytest.mark.tpu
@pytest.mark.slow
def test_flagship_shape_compiled_on_tpu(rng):
    """The exact c3mf/c3md flagship kernel shape (T=8, 128², K=2 targets,
    batch rides the grid) — fwd + bwd on hardware, fast precision, against
    the jnp reference (BASELINE.md chip-parity bounds)."""
    args = _case(rng, n=2, t=8, c=3, h=128, w=128, k=2)
    got = multiflow_pallas.multiflow_composite_pix(
        *args, "border", False, "fast")
    want = _ref(*args)
    for g, w_, name in zip(got, want, ("view", "multi", "any_valid", "wts")):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w_),
                                   rtol=3e-2, atol=3e-2, err_msg=name)

    def f(imgs, conf):
        view, _, _, _ = multiflow_pallas.multiflow_composite_pix(
            imgs, *args[1:3], conf, *args[4:], "border", False, "fast")
        return jnp.sum(view ** 2)

    def fr(imgs, conf):
        view = _ref(imgs, *args[1:3], conf, *args[4:])[0]
        return jnp.sum(view ** 2)

    gi, gc = jax.jit(jax.grad(f, argnums=(0, 1)))(args[0], args[3])
    ri, rc = jax.grad(fr, argnums=(0, 1))(args[0], args[3])
    for a, b, name in ((gi, ri, "imgs"), (gc, rc, "conf")):
        a, b = np.asarray(a), np.asarray(b)
        np.testing.assert_allclose(a, b, rtol=5e-2,
                                   atol=5e-2 * max(1.0, np.abs(b).max()),
                                   err_msg=name)
