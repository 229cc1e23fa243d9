"""Per-component timing of a preset's forward on the real chip.

    python benchmarks/component_bench.py [c2|c3|...]

Times each model stage separately (encoder / recurrent scan / pose
bottleneck / decoder / heads / warp / composite) with the relay-proof
loop-differencing method (docs/ARCHITECTURE.md §7: block_until_ready is a
no-op through the axon relay, so run N iterations inside one jitted
fori_loop with a data-dependent carry and difference N-vs-1 walls).

For dynamic presets (seq_len > 1) it additionally times the nn.scan
temporal encode as a unit and the full fwd+bwd (grad through the remat
scan) — the round-3 dynamic-path profile (VERDICT r2 #2).

Also prints XLA cost-analysis FLOPs per component -> per-component MFU.
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dynamic_multiview_3d_tpu import config as config_lib
from dynamic_multiview_3d_tpu.models import DMV3D

PEAK_FLOPS = 197e12  # v5e bf16 peak (per chip)


def loop_time(fn, args, iters=20, reps=3):
    """Seconds per call via (t_N - t_1) / (N - 1); fn(*args, eps)->scalar."""
    def make(n):
        @jax.jit
        def looped(*a):
            def body(_, acc):
                return fn(*a, acc * 1e-9)
            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))
        return looped

    f1, fn_ = make(1), make(iters)
    float(f1(*args))
    float(fn_(*args))

    def timed(f):
        t0 = time.perf_counter()
        float(f(*args))
        return time.perf_counter() - t0

    t1 = min(timed(f1) for _ in range(reps))
    tn = min(timed(fn_) for _ in range(reps))
    return max(tn - t1, 1e-9) / (iters - 1)


def flops_of(fn, args):
    try:
        a = jax.jit(fn).lower(*args, 0.0).compile().cost_analysis()
        if isinstance(a, list):
            a = a[0]
        return float(a.get("flops", 0.0))
    except Exception:
        return float("nan")


def main(preset="c2", *overrides):
    """component_bench.py [preset] [section.field=value ...] — overrides
    use the CLI --set syntax (e.g. model.up_order=norm_first) so decoder
    A/B variants can be timed without a config edit."""
    cfg = config_lib.get_config(preset, overrides)
    m = cfg.model
    b, k, t = cfg.data.batch_size, cfg.data.num_targets, cfg.data.seq_len
    size = m.image_size
    dt = jnp.dtype(m.dtype)

    rng = np.random.default_rng(0)
    seq = jnp.asarray(rng.uniform(-1, 1, (b, t, size, size, 3)).astype(np.float32))
    src = jnp.asarray(rng.uniform(0, 1, (b, t, 3)).astype(np.float32) + [0, 0, 1])
    tgt = jnp.asarray(rng.uniform(0, 1, (b, k, 3)).astype(np.float32) + [0, 0, 1])

    module = DMV3D(m)
    params = jax.jit(module.init)(jax.random.key(0), seq, src, tgt)["params"]

    from dynamic_multiview_3d_tpu.models.dmv3d import (
        Decoder, Encoder, PoseBottleneck)
    from dynamic_multiview_3d_tpu.ops import pose as pose_ops
    from dynamic_multiview_3d_tpu.ops import sampling

    enc = Encoder(m)
    bott = PoseBottleneck(m)
    dec = Decoder(m)

    bk = b * k
    # representative intermediates (shapes as in DMV3D.__call__)
    bott_in = jnp.zeros((bk, m.bottleneck_size, m.bottleneck_size,
                         m.gru_features), dt)
    if m.synthesis in ("multiflow", "multidepth"):
        # multi-source modes condition the bottleneck on EVERY source pose
        # (dmv3d.py DMV3D.__call__) — the code is [B*K, T*P], not [B*K, P]
        src_rep = jnp.repeat(src, k, axis=0)
        tgt_rep = jnp.broadcast_to(tgt.reshape(bk, 1, -1), src_rep.shape)
        pose_code = pose_ops.encode_pose(
            src_rep, tgt_rep, mode=m.pose_mode).reshape(bk, -1)
    else:
        pose_code = pose_ops.encode_pose(
            jnp.repeat(src[:, -1], k, axis=0), tgt.reshape(bk, -1),
            mode=m.pose_mode)
    z = jnp.zeros_like(bott_in)
    # decoder takes per-example skips [B] and broadcasts over K internally
    skip_shapes = module.skip_shapes(b)
    skips = tuple(jnp.zeros(s, dt) for s in skip_shapes)
    frame = jnp.zeros((b, size, size, 3), jnp.float32)
    frame_k = jnp.zeros((bk, size, size, 3), jnp.float32)
    flow = jnp.asarray(rng.uniform(-20, 20, (bk, size, size, 2))
                       .astype(np.float32))
    mask = jnp.ones((bk, size, size, 1), jnp.float32)
    rgbh = jnp.zeros((bk, size, size, 3), jnp.float32)

    impl = "pallas" if jax.default_backend() == "tpu" else "jnp"

    cases = {
        "full_forward": (
            lambda p, s, sr, tg, e: jnp.mean(module.apply(
                {"params": p}, s + e, sr, tg)["view"]),
            (params, seq, src, tgt)),
        "encoder_B": (
            lambda p, f, e: jnp.mean(enc.apply(
                {"params": p}, f + e)[0].astype(jnp.float32)),
            (params["recurrent"]["encoder"], frame)),
        "bottleneck_BK": (
            lambda p, x, pc, e: jnp.mean(bott.apply(
                {"params": p}, x + jnp.asarray(e, dt), pc)
                .astype(jnp.float32)),
            (params["bottleneck"], bott_in, pose_code)),
        "decoder+heads_BK": (
            # "mask" exists in every synthesis mode's head dict;
            # num_sources sizes the multi-source heads (multiflow/-depth)
            lambda p, x, sk, e: jnp.mean(dec.apply(
                {"params": p}, x + jnp.asarray(e, dt), sk, k,
                num_sources=t)["mask"]),
            (params["decoder"], z, skips)),
        "warp_BK": (
            lambda img, fl, e: jnp.mean(sampling.flow_warp(
                img, fl + e, padding_mode="border", impl=impl,
                precision=m.warp_precision)),
            (frame_k, flow)),
        "composite_BK": (
            lambda w_, mk, rh, e: jnp.mean(mk * (w_ + e) + (1 - mk) * rh),
            (frame_k, mask, rgbh)),
    }

    if t > 1:
        # Dynamic-path units (VERDICT r2 #2): the temporal nn.scan encode
        # (encoder x T + GRU gates, state+skips in carry) and the full
        # fwd+bwd — the training-relevant cost, dominated by
        # grad-through-the-remat-scan. The scanned module is built exactly
        # as DMV3D.__call__ builds it, applied with the model's own
        # `recurrent` params.
        from flax import linen as nn
        from dynamic_multiview_3d_tpu.models.dmv3d import _RecurrentStep
        from dynamic_multiview_3d_tpu.models.layers import (
            ConvGRUCell, ConvLSTMCell)

        cell = ConvLSTMCell if m.rnn == "lstm" else ConvGRUCell
        h0 = cell.init_state(b, m.bottleneck_size, m.bottleneck_size,
                             m.gru_features, dt)
        skips0 = tuple(jnp.zeros(s, dt) for s in skip_shapes)
        step_cls = nn.remat(_RecurrentStep) if m.remat_scan else _RecurrentStep
        scan_mod = nn.scan(step_cls, variable_broadcast="params",
                           split_rngs={"params": False},
                           in_axes=1, out_axes=1)(m)

        def scan_encode(p, s, e):
            (state, sk), _ = scan_mod.apply({"params": p}, (h0, skips0),
                                            s + e)
            return (jnp.mean(state.astype(jnp.float32))
                    + jnp.mean(sk[0].astype(jnp.float32)))

        cases["scan_encode_T"] = (scan_encode, (params["recurrent"], seq))

        def fwd_bwd(p, s, sr, tg, e):
            def loss(pp):
                return jnp.mean(module.apply(
                    {"params": pp}, s + e, sr, tg)["view"] ** 2)
            g = jax.grad(loss)(p)
            return jnp.mean(g["bottleneck"]["pose_fc1"]["kernel"])

        cases["fwd_bwd"] = (fwd_bwd, (params, seq, src, tgt))

    results = {}
    for name, (fn, args) in cases.items():
        dt_s = loop_time(fn, args)
        fl = flops_of(fn, args)
        results[name] = {
            "ms": round(dt_s * 1e3, 3),
            "gflops": round(fl / 1e9, 2) if np.isfinite(fl) else None,
            # below ~50 µs the loop-differencing floor dominates — an MFU
            # quotient against it is meaningless noise
            "mfu_pct": round(100 * fl / dt_s / PEAK_FLOPS, 1)
            if np.isfinite(fl) and dt_s > 5e-5 else None,
        }
        print(json.dumps({name: results[name]}), flush=True)

    full = results["full_forward"]["ms"]
    acct = sum(results[n]["ms"] for n in
               ("encoder_B", "bottleneck_BK", "decoder+heads_BK", "warp_BK",
                "composite_BK"))
    print(json.dumps({"accounted_ms": round(acct, 3), "full_ms": full,
                      "views_per_s": round(bk / (full / 1e3), 1)}))


if __name__ == "__main__":
    main(*sys.argv[1:])
