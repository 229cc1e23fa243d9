"""Microbenchmark: Pallas one-hot-MXU grid-sample vs the XLA gather path.

Measures fwd and fwd+bwd at the flagship shape (flow_warp of the last frame
at 128², batch = B*K = 128, C=3) with the relay-proof loop-differencing
method. Decides the default `use_pallas` setting with data, not vibes.

    python benchmarks/kernel_bench.py
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from dynamic_multiview_3d_tpu.kernels import grid_sample_pallas as gsp
from dynamic_multiview_3d_tpu.ops import sampling


def loop_time(body, n_iters=20, trials=3):
    def looped(iters):
        @jax.jit
        def f():
            return jax.lax.fori_loop(0, iters, lambda _, a: body(a),
                                     jnp.float32(0.0))
        return f
    f1, fn = looped(1), looped(n_iters)
    float(f1()); float(fn())

    def timed(f):
        t0 = time.perf_counter(); float(f()); return time.perf_counter() - t0
    t1 = min(timed(f1) for _ in range(trials))
    tn = min(timed(fn) for _ in range(trials))
    return max(tn - t1, 1e-9) / (n_iters - 1)


def main(n=128, hw=128, c=3):
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.standard_normal((n, hw, hw, c), dtype=np.float32))
    flow = jnp.asarray(
        rng.uniform(-20, 20, (n, hw, hw, 2)).astype(np.float32))

    mask = jnp.asarray(rng.uniform(0, 1, (n, hw, hw, 1)).astype(np.float32))
    rgb = jnp.asarray(rng.standard_normal((n, hw, hw, c), dtype=np.float32))

    def fwd_body(impl, precision="exact"):
        def body(acc):
            out = sampling.flow_warp(img, flow + acc * 1e-9, impl=impl,
                                     precision=precision)
            return jnp.mean(out)
        return body

    def bwd_body(impl, precision="exact"):
        def loss(f):
            return jnp.mean(sampling.flow_warp(img, f, impl=impl,
                                               precision=precision) ** 2)
        def body(acc):
            g = jax.grad(loss)(flow + acc * 1e-9)
            return jnp.mean(g)
        return body

    def fused_fwd_body(precision):
        def body(acc):
            v, _, _ = gsp.flow_warp_composite(img, flow + acc * 1e-9, mask,
                                              rgb, precision=precision)
            return jnp.mean(v)
        return body

    def fused_bwd_body(precision):
        def loss(f, m, r):
            v, _, _ = gsp.flow_warp_composite(img, f, m, r,
                                              precision=precision)
            return jnp.mean(v ** 2)
        def body(acc):
            g = jax.grad(loss, argnums=(0, 1, 2))(flow + acc * 1e-9, mask,
                                                  rgb)
            return jnp.mean(g[0])
        return body

    results = {"shape": [n, hw, hw, c],
               "backend": jax.default_backend()}
    for impl, prec in (("jnp", "exact"), ("pallas", "exact"),
                       ("pallas", "fast")):
        tag = impl if prec == "exact" else f"{impl}_{prec}"
        results[f"{tag}_fwd_ms"] = round(
            loop_time(fwd_body(impl, prec)) * 1e3, 3)
        results[f"{tag}_fwdbwd_ms"] = round(
            loop_time(bwd_body(impl, prec), n_iters=10) * 1e3, 3)
    for prec in ("exact", "fast"):
        results[f"fused_{prec}_fwd_ms"] = round(
            loop_time(fused_fwd_body(prec)) * 1e3, 3)
        results[f"fused_{prec}_fwdbwd_ms"] = round(
            loop_time(fused_bwd_body(prec), n_iters=10) * 1e3, 3)
    results["fwd_speedup_pallas"] = round(
        results["jnp_fwd_ms"] / results["pallas_fwd_ms"], 2)
    results["fwdbwd_speedup_pallas"] = round(
        results["jnp_fwdbwd_ms"] / results["pallas_fwdbwd_ms"], 2)

    # --- depth-reprojection path (VERDICT r2 #3: flow-kernel parity rows).
    from dynamic_multiview_3d_tpu.kernels import reproject_pallas
    from dynamic_multiview_3d_tpu.ops import pose as pose_ops
    from dynamic_multiview_3d_tpu.ops import reproject as reproject_ops

    depth = jnp.asarray(rng.uniform(1.5, 2.5, (n, hw, hw)).astype(np.float32))
    intr = pose_ops.intrinsics_matrix(jnp.full((n,), float(hw)),
                                      (hw - 1) / 2, (hw - 1) / 2)
    pa = jnp.asarray(rng.uniform(0.1, 1.0, (n, 3)).astype(np.float32)
                     + [0, 0, 1.5])
    pb_ = jnp.asarray(rng.uniform(0.1, 1.0, (n, 3)).astype(np.float32)
                      + [0, 0, 1.5])
    rel = pose_ops.relative_transform(pose_ops.look_at_extrinsics(pa),
                                      pose_ops.look_at_extrinsics(pb_))

    def geo_fwd_body(kind, precision="exact"):
        def body(acc):
            d = depth + acc * 1e-9
            if kind == "jnp":
                v, _ = reproject_ops.depth_reproject_sample(
                    img, d, intr, rel, padding_mode="zeros", impl="jnp")
            elif kind == "pallas":
                v, _ = reproject_pallas.depth_reproject_sample(
                    img, d, intr, rel, False, precision)
            else:                       # fused composite (in-kernel blend)
                v, _, _ = reproject_pallas.depth_reproject_composite(
                    img, d, intr, rel, mask, rgb, False, precision)
            return jnp.mean(v)
        return body

    def geo_bwd_body(kind, precision="exact"):
        def loss(d, m, r):
            if kind == "jnp":
                v, _ = reproject_ops.depth_reproject_sample(
                    img, d, intr, rel, padding_mode="zeros", impl="jnp")
                v = m * v + (1.0 - m) * r
            elif kind == "pallas":
                v, _ = reproject_pallas.depth_reproject_sample(
                    img, d, intr, rel, False, precision)
                v = m * v + (1.0 - m) * r
            else:
                v, _, _ = reproject_pallas.depth_reproject_composite(
                    img, d, intr, rel, m, r, False, precision)
            return jnp.mean(v ** 2)
        def body(acc):
            g = jax.grad(loss, argnums=(0, 1, 2))(depth + acc * 1e-9, mask,
                                                  rgb)
            return jnp.mean(g[0])
        return body

    for kind, prec in (("jnp", "exact"), ("pallas", "exact"),
                       ("pallas", "fast"), ("fused", "exact"),
                       ("fused", "fast")):
        tag = f"geo_{kind}" if prec == "exact" else f"geo_{kind}_{prec}"
        results[f"{tag}_fwd_ms"] = round(
            loop_time(geo_fwd_body(kind, prec)) * 1e3, 3)
        results[f"{tag}_fwdbwd_ms"] = round(
            loop_time(geo_bwd_body(kind, prec), n_iters=10) * 1e3, 3)
    results["geo_fwdbwd_speedup_pallas"] = round(
        results["geo_jnp_fwdbwd_ms"] / results["geo_pallas_fwdbwd_ms"], 2)

    # --- multiflow composite (VERDICT r3 #5) at the c3mf flagship shape:
    # B=8 examples x T=8 orbit sources blended into K=2 targets at 128².
    from dynamic_multiview_3d_tpu.kernels import multiflow_pallas

    mb, mt, mk = 8, 8, 2
    mp = mk * hw * hw
    mimgs = jnp.asarray(
        rng.uniform(-1, 1, (mb, mt, c, hw, hw)).astype(np.float32))
    mix = jnp.asarray(
        rng.uniform(-6, hw + 5, (mb, mt, mp)).astype(np.float32))
    miy = jnp.asarray(
        rng.uniform(-6, hw + 5, (mb, mt, mp)).astype(np.float32))
    mconf = jnp.asarray(rng.standard_normal((mb, mt, mp)).astype(np.float32))
    mmask = jnp.asarray(rng.uniform(0, 1, (mb, mp)).astype(np.float32))
    mrgb = jnp.asarray(rng.uniform(-1, 1, (mb, c, mp)).astype(np.float32))

    def mf_ref(imgs, ixx, iyy, conf, msk, rgbp, sampler):
        """The pre-fusion composition: per-source sampling (jnp gather or
        the single-source Pallas kernel) + softmax blend/composite in XLA —
        materializes the [N,T,C,P] warped intermediate the fused kernel
        keeps in VMEM (models/dmv3d.py:404 docstring)."""
        nn_, tt, pp = ixx.shape
        valid = ((ixx >= 0) & (ixx <= hw - 1) & (iyy >= 0)
                 & (iyy <= hw - 1)).astype(jnp.float32)
        wts = jax.nn.softmax(conf + (valid - 1.0) * 30.0, axis=1)
        if sampler == "jnp":
            nhwc = imgs.transpose(0, 1, 3, 4, 2).reshape(nn_ * tt, hw, hw, c)
            grid = sampling.normalize_coords(
                jnp.stack([ixx, iyy], -1).reshape(nn_ * tt, 1, pp, 2),
                hw, hw, align_corners=True)
            warped = sampling.grid_sample(
                nhwc, grid, align_corners=True, padding_mode="border")
            warped = warped.reshape(nn_, tt, pp, c).transpose(0, 1, 3, 2)
        else:                                   # single-source Pallas sampler
            warped = gsp.sample_pixel_coords(
                imgs.reshape(nn_ * tt, c, hw, hw),
                ixx.reshape(nn_ * tt, pp), iyy.reshape(nn_ * tt, pp),
                "border", False, "fast").reshape(nn_, tt, c, pp)
        multi = jnp.sum(wts[:, :, None] * warped, axis=1)
        return msk[:, None] * multi + (1.0 - msk[:, None]) * rgbp

    def mf_fwd_body(kind):
        def body(acc):
            ixj = mix + acc * 1e-9
            if kind == "fused":
                v, _, _, _ = multiflow_pallas.multiflow_composite_pix(
                    mimgs, ixj, miy, mconf, mmask, mrgb, "border", False,
                    "fast")
            else:
                v = mf_ref(mimgs, ixj, miy, mconf, mmask, mrgb, kind)
            return jnp.mean(v)
        return body

    def mf_bwd_body(kind):
        def loss(ixx, conf, msk):
            if kind == "fused":
                v, _, _, _ = multiflow_pallas.multiflow_composite_pix(
                    mimgs, ixx, miy, conf, msk, mrgb, "border", False,
                    "fast")
            else:
                v = mf_ref(mimgs, ixx, miy, conf, msk, mrgb, kind)
            return jnp.mean(v ** 2)
        def body(acc):
            g = jax.grad(loss, argnums=(0, 1, 2))(mix + acc * 1e-9, mconf,
                                                  mmask)
            return jnp.mean(g[0])
        return body

    for kind in ("jnp", "pallas", "fused"):
        tag = {"jnp": "mf_jnp", "pallas": "mf_semifused",
               "fused": "mf_fused"}[kind]
        results[f"{tag}_fwd_ms"] = round(
            loop_time(mf_fwd_body(kind)) * 1e3, 3)
        results[f"{tag}_fwdbwd_ms"] = round(
            loop_time(mf_bwd_body(kind), n_iters=10) * 1e3, 3)
    results["mf_fwdbwd_speedup_fused"] = round(
        results["mf_jnp_fwdbwd_ms"] / results["mf_fused_fwdbwd_ms"], 2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
