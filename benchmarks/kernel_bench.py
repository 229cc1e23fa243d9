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

    def fwd_body(impl):
        def body(acc):
            out = sampling.flow_warp(img, flow + acc * 1e-9, impl=impl)
            return jnp.mean(out)
        return body

    def bwd_body(impl):
        def loss(f):
            return jnp.mean(sampling.flow_warp(img, f, impl=impl) ** 2)
        def body(acc):
            g = jax.grad(loss)(flow + acc * 1e-9)
            return jnp.mean(g)
        return body

    results = {"shape": [n, hw, hw, c],
               "backend": jax.default_backend()}
    for impl in ("jnp", "pallas"):
        results[f"{impl}_fwd_ms"] = round(loop_time(fwd_body(impl)) * 1e3, 3)
        results[f"{impl}_fwdbwd_ms"] = round(
            loop_time(bwd_body(impl), n_iters=10) * 1e3, 3)
    results["fwd_speedup_pallas"] = round(
        results["jnp_fwd_ms"] / results["pallas_fwd_ms"], 2)
    results["fwdbwd_speedup_pallas"] = round(
        results["jnp_fwdbwd_ms"] / results["pallas_fwdbwd_ms"], 2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
