"""Probe hardware-validated pixel-block caps for the fused multiflow kernel.

The planner in ``kernels/multiflow_pallas.py`` sizes its pixel block from a
conservative analytic VMEM model unless the shape has an entry in
``_VALIDATED_PB`` (a cap probed on real hardware — the analytic model once
missed a 284 KB Mosaic-stack overshoot that only a chip run caught,
BASELINE.md). This script IS that probe, committed and repeatable
(VERDICT r4 weak #4): for each shape it walks pixel-block candidates from
the largest 128-multiple downward, and for each candidate compiles + runs
the FORWARD AND BACKWARD kernels on the chip and checks parity against the
jnp reference. Output: ``_VALIDATED_PB`` entries to paste, with the probe
date.

    python benchmarks/probe_multiflow_pb.py            # default shape set
    python benchmarks/probe_multiflow_pb.py T H W K mode [...]

Probing rides the same monkeypatch surface the tests use: a candidate cap
is installed in _VALIDATED_PB (caps only ever shrink the analytic plan,
so installing a larger cap is how a larger-than-model block is exercised).
"""

from __future__ import annotations

import datetime
import os
import sys

# Robust under `python benchmarks/probe_multiflow_pb.py` (which puts
# benchmarks/ — not the repo root — on sys.path).
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from dynamic_multiview_3d_tpu.kernels import multiflow_pallas as mf
from dynamic_multiview_3d_tpu.ops import sampling

# (T, H, W, K, mode): flagship + study shapes. c3mf/c3md (T=8 128²),
# the T-scaling arms (T=2/4/16 at 128²), c5md 256² at T=4 and T=8.
DEFAULT_SHAPES = [
    (2, 128, 128, 2, "fast"),
    (4, 128, 128, 2, "fast"),
    (8, 128, 128, 2, "fast"),
    (16, 128, 128, 2, "fast"),
    (4, 256, 256, 2, "fast"),
    (8, 256, 256, 2, "fast"),
    (8, 128, 128, 2, "exact"),
]

C = 3  # image channels (the model's RGB path)


def _ref(imgs, ix, iy, conf, mask, rgb):
    n, t, c, h, w = imgs.shape
    p = ix.shape[-1]
    valid = ((ix >= 0) & (ix <= w - 1) & (iy >= 0) & (iy <= h - 1)
             ).astype(jnp.float32)
    wts = jax.nn.softmax(conf + (valid - 1.0) * 30.0, axis=1)
    nhwc = imgs.transpose(0, 1, 3, 4, 2).reshape(n * t, h, w, c)
    grid = sampling.normalize_coords(
        jnp.stack([ix, iy], -1).reshape(n * t, 1, p, 2), h, w,
        align_corners=True)
    warped = sampling.grid_sample(nhwc, grid, align_corners=True,
                                  padding_mode="border")
    warped = warped.reshape(n, t, p, c).transpose(0, 1, 3, 2)
    multi = jnp.sum(wts[:, :, None] * warped, axis=1)
    view = mask[:, None] * multi + (1.0 - mask[:, None]) * rgb
    return view, multi, jnp.max(valid, axis=1), wts


def _case(rng, t, h, w, k):
    p = k * h * w
    return (jnp.asarray(rng.uniform(-1, 1, (1, t, C, h, w)).astype(np.float32)),
            jnp.asarray(rng.uniform(-6, w + 5, (1, t, p)).astype(np.float32)),
            jnp.asarray(rng.uniform(-6, h + 5, (1, t, p)).astype(np.float32)),
            jnp.asarray(rng.standard_normal((1, t, p)).astype(np.float32)),
            jnp.asarray(rng.uniform(0, 1, (1, p)).astype(np.float32)),
            jnp.asarray(rng.uniform(-1, 1, (1, C, p)).astype(np.float32)))


def _try_pb(args, t, h, w, mode, pb) -> tuple[bool, str]:
    """Compile + run fwd AND bwd at cap pb; parity-check vs jnp."""
    key = (mode, t, h, w)
    old = mf._VALIDATED_PB.get(key)
    mf._VALIDATED_PB[key] = pb
    try:
        planned = mf._plan(args[1].shape[-1], t, C, h, w, mode)
        if planned != pb:
            return False, f"planner chose {planned} (pb not reachable)"

        def loss(*a):
            view, multi, _, wts = mf.multiflow_composite_pix(
                *a, "border", False, mode)
            return jnp.sum(view ** 2) + jnp.sum(multi ** 2) + jnp.sum(wts ** 2)

        got = jax.jit(lambda *a: mf.multiflow_composite_pix(
            *a, "border", False, mode))(*args)
        want = _ref(*args)
        ftol = 1e-4 if mode == "exact" else 3e-2
        for g, w_ in zip(got, want):
            err = float(jnp.max(jnp.abs(g - w_)))
            if not np.isfinite(err) or err > ftol:
                return False, f"fwd parity {err:.2e} > {ftol}"
        grads = jax.jit(jax.grad(loss, argnums=tuple(range(6))))(*args)
        gref = jax.grad(lambda *a: (lambda v, m_, _, w2:
                                    jnp.sum(v ** 2) + jnp.sum(m_ ** 2)
                                    + jnp.sum(w2 ** 2))(*_ref(*a)),
                        argnums=tuple(range(6)))(*args)
        gtol = 1e-3 if mode == "exact" else 6e-2
        for g, r in zip(grads, gref):
            scale = max(1.0, float(jnp.max(jnp.abs(r))))
            err = float(jnp.max(jnp.abs(g - r))) / scale
            if not np.isfinite(err) or err > gtol:
                return False, f"bwd parity {err:.2e} > {gtol}"
        return True, "ok"
    except Exception as e:  # Mosaic VMEM/compile failures land here
        return False, type(e).__name__ + ": " + str(e).split("\n")[0][:100]
    finally:
        if old is None:
            mf._VALIDATED_PB.pop(key, None)
        else:
            mf._VALIDATED_PB[key] = old


def main(shapes):
    rng = np.random.default_rng(0)
    today = datetime.date.today().isoformat()
    print(f"# probed {today} on", jax.devices()[0].device_kind)
    for t, h, w, k, mode in shapes:
        total = k * h * w
        analytic = mf._plan(total, t, C, h, w, mode)
        args = _case(rng, t, h, w, k)
        best, note = 0, "no candidate fit"
        pb = 128 * mf._pixel_block(total // 128, target=16)  # largest plan
        while pb >= 128:
            ok, why = _try_pb(args, t, h, w, mode, pb)
            print(f"  ({mode!r:8}, {t:2}, {h:3}, {w:3}) pb={pb:5}: "
                  f"{'OK' if ok else 'fail — ' + why}", flush=True)
            if ok:
                best, note = pb, "ok"
                break
            nxt = 128 * mf._pixel_block(total // 128, target=pb // 128 - 1)
            if nxt >= pb:
                break
            pb = nxt
        tag = (" (= analytic plan)" if best == analytic
               else f" (analytic plan was {analytic})")
        if best:
            print(f'    ("{mode}", {t}, {h}, {w}): {best},'
                  f'   # probed {today}{tag}', flush=True)
        else:
            print(f"    # ({mode}, {t}, {h}, {w}): UNSUPPORTED — {note}",
                  flush=True)


if __name__ == "__main__":
    argv = sys.argv[1:]
    if argv:
        ts = [(int(argv[i]), int(argv[i + 1]), int(argv[i + 2]),
               int(argv[i + 3]), argv[i + 4]) for i in range(0, len(argv), 5)]
    else:
        ts = DEFAULT_SHAPES
    main(ts)
