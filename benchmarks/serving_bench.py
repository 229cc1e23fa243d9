"""Serving-artifact throughput on the real chip vs the live model.

    python benchmarks/serving_bench.py [ckpt_dir] [--batch 8] [--targets 8]

Exports the checkpoint's forward as a StableHLO artifact with
``platforms=("tpu",)`` (serving.export_predict), loads it back through
``ServedModel.load`` (the model-code-free path a deployment would use),
and times artifact-vs-live inference with the relay-proof
loop-differencing method (docs/ARCHITECTURE.md §7): N iterations inside
one jitted ``fori_loop`` with a data-dependent carry — ``block_until_ready``
is a no-op through the axon relay, so never wall-clock single dispatches.

This is the measured half of the reference's frozen-graph serving story
(SURVEY.md R17/T5): the artifact must match the live model's outputs
bit-for-bit-ish (report max |Δ|) and its throughput must be the same
compiled program's — any gap is serialization overhead, not XLA's.
"""

import argparse
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

from dynamic_multiview_3d_tpu import serving
from dynamic_multiview_3d_tpu.api import Model


def loop_time(call, args, sizes=(5, 15, 30, 60), reps=3):
    """Seconds per call, with the raw walls for auditing.

    ``call(*args)`` -> array; the loop feeds a scalar derived from the
    output back into the first (float image) argument so XLA cannot
    collapse the iterations. The relay adds ~1 s of constant per-dispatch
    overhead with jitter of the same order as a handful of model calls, so
    no single pair of loop sizes is trustworthy (early runs of this bench
    read a 5.2 ms model at 1.0 ms/call off one bad wall). Instead: time a
    loop at each of ``sizes`` (min over ``reps``) and least-squares-fit
    wall = overhead + n * sec_per_call; returns (slope, walls_ms)."""

    def make(n):
        @jax.jit
        def looped(*a):
            def body(_, acc):
                perturbed = (a[0] + acc * 1e-9,) + a[1:]
                return jnp.mean(call(*perturbed)).astype(jnp.float32)
            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))
        return looped

    fns = [make(n) for n in sizes]
    for f in fns:                   # compile + warm
        float(f(*args))

    def timed(f):
        t0 = time.perf_counter()
        float(f(*args))
        return time.perf_counter() - t0

    walls = [min(timed(f) for _ in range(reps)) for f in fns]
    n = np.asarray(sizes, np.float64)
    w = np.asarray(walls, np.float64)
    slope = float(((n - n.mean()) * (w - w.mean())).sum()
                  / ((n - n.mean()) ** 2).sum())
    return max(slope, 1e-9), [round(x * 1e3, 1) for x in walls]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("ckpt", nargs="?", default="/root/runs/c3mf_ckpt/model")
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--targets", type=int, default=8)
    p.add_argument("--seq-len", type=int, nargs="+", default=None,
                   help="source count(s) to export; several values produce "
                        "a multi-signature artifact (timed at the first)")
    p.add_argument("--artifact", default="/tmp/dmv3d_serving_tpu.zip")
    args = p.parse_args()

    model = Model.from_checkpoint(args.ckpt)
    cfg = model.cfg
    ts = tuple(args.seq_len) if args.seq_len else (cfg.data.seq_len,)
    t, s = ts[0], cfg.model.image_size
    b, k = args.batch, args.targets

    t0 = time.perf_counter()
    serving.export_predict(model, args.artifact, batch=b, seq_len=ts,
                           num_targets=k, platforms=("tpu",))
    export_s = time.perf_counter() - t0
    size_mb = os.path.getsize(args.artifact) / 1e6

    t0 = time.perf_counter()
    served = serving.ServedModel.load(args.artifact)
    load_s = time.perf_counter() - t0

    rng = np.random.default_rng(0)
    seq = jnp.asarray(rng.uniform(-1, 1, (b, t, s, s, 3)).astype(np.float32))
    src = jnp.asarray(rng.uniform(0, 1, (b, t, 3)).astype(np.float32)
                      + [0, 0, 1])
    tgt = jnp.asarray(rng.uniform(0, 1, (b, k, 3)).astype(np.float32)
                      + [0, 0, 1])

    # parity first: artifact output == live model output
    live_fn = jax.jit(lambda pr, q, sp, tp: model.module.apply(
        {"params": pr}, q, sp, tp)["view"])
    live_out = np.asarray(live_fn(model.params, seq, src, tgt))
    served_out = np.asarray(served.predict(seq, tgt, source_poses=src))
    max_delta = float(np.abs(live_out - served_out).max())

    # throughput: same loop-differencing on both paths
    params_tuple = served._params
    call = served.call_for(t)
    sec_served, walls_served = loop_time(
        lambda q, pt, sp, tp: call(pt, q, sp, tp), (seq, params_tuple, src, tgt))
    sec_live, walls_live = loop_time(
        lambda q, pr, sp, tp: live_fn(pr, q, sp, tp), (seq, model.params, src, tgt))

    views = b * k
    result = {
        "ckpt": args.ckpt,
        "shape": {"batch": b, "seq_len": t, "targets": k, "size": s},
        "exported_seq_lens": list(ts),
        "platforms": served.manifest["platforms"],
        "artifact_mb": round(size_mb, 2),
        "export_s": round(export_s, 2),
        "load_s": round(load_s, 2),
        "max_abs_delta_vs_live": max_delta,
        "served_ms_per_call": round(sec_served * 1e3, 3),
        "live_ms_per_call": round(sec_live * 1e3, 3),
        "served_views_per_s": round(views / sec_served, 1),
        "live_views_per_s": round(views / sec_live, 1),
        # raw loop walls (ms) at sizes (5,15,30,60) — sanity-check that
        # walls actually scale with n before trusting the slopes above
        "walls_served_ms": walls_served,
        "walls_live_ms": walls_live,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
