"""Headline benchmark — prints ONE JSON line.

Primary metric (BASELINE.json:2): novel views/sec/chip at 128x128, config-2
shape (static multiview: batch=16, 8 target poses, flow-warp decoder,
BASELINE.json:8), flagship DMV3D in bf16 on the local chip.

``vs_baseline`` is measured against the reference stand-in: the identical
architecture in torch on CPU (benchmarks/torch_oracle.py) — the real
TF1 reference is unavailable (empty checkout, SURVEY.md §0); the stand-in
number is cached in benchmarks/baseline_standin.json and labeled as such in
BASELINE.md. Target: >=5x (BASELINE.json:5).
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

_STANDIN_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "benchmarks", "baseline_standin.json")


def _standin_views_per_sec() -> float:
    if os.path.exists(_STANDIN_CACHE):
        with open(_STANDIN_CACHE) as f:
            return json.load(f)["standin_reference_views_per_sec_cpu"]
    from benchmarks.torch_oracle import measure_views_per_sec
    vps = measure_views_per_sec(iters=3, warmup=1)
    with open(_STANDIN_CACHE, "w") as f:
        json.dump({"standin_reference_views_per_sec_cpu": vps,
                   "note": "same-architecture torch CPU model; stand-in for "
                           "the unavailable TF1 reference (SURVEY.md §0/§6)"},
                  f, indent=2)
    return vps


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from dynamic_multiview_3d_tpu import config as config_lib
    from dynamic_multiview_3d_tpu.models import DMV3D

    cfg = config_lib.get_config("c2")          # 128², batch 16, K=8
    m = cfg.model
    b, k, t = cfg.data.batch_size, cfg.data.num_targets, cfg.data.seq_len

    rng = np.random.default_rng(0)
    seq = jnp.asarray(rng.uniform(-1, 1, (b, t, m.image_size, m.image_size, 3))
                      .astype(np.float32))
    src = jnp.asarray(rng.uniform(0, 1, (b, t, 3)).astype(np.float32)
                      + [0, 0, 1])
    tgt = jnp.asarray(rng.uniform(0, 1, (b, k, 3)).astype(np.float32)
                      + [0, 0, 1])

    module = DMV3D(m)
    params = jax.jit(module.init)(jax.random.key(0), seq, src, tgt)["params"]

    # In this environment the device is reached through a relay whose
    # block_until_ready is a no-op and whose host fetches are slow, so
    # naive wall-clock loops measure the tunnel, not the chip. Instead run
    # N forwards inside ONE jitted fori_loop (data-dependent carry so
    # iterations can't be hoisted/CSE'd), fetch a scalar, and difference
    # the N-iteration and 1-iteration walls to cancel dispatch+fetch cost.
    def make_looped(iters):
        @jax.jit
        def looped(params, seq, src, tgt):
            def body(_, acc):
                view = module.apply({"params": params}, seq + acc * 1e-9,
                                    src, tgt)["view"]
                return jnp.mean(view)
            return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))
        return looped

    n_iters = 20
    f1, fn = make_looped(1), make_looped(n_iters)
    float(f1(params, seq, src, tgt))          # compile + warm
    float(fn(params, seq, src, tgt))

    def timed(f):
        t0 = time.perf_counter()
        float(f(params, seq, src, tgt))       # scalar fetch forces execution
        return time.perf_counter() - t0

    t_1 = min(timed(f1) for _ in range(3))
    t_n = min(timed(fn) for _ in range(3))
    dt = max(t_n - t_1, 1e-9) / (n_iters - 1)
    views_per_sec = b * k / dt

    baseline = _standin_views_per_sec()
    print(json.dumps({
        "metric": "novel_views_per_sec_per_chip_128px",
        "value": round(views_per_sec, 2),
        "unit": "views/s",
        "vs_baseline": round(views_per_sec / baseline, 2),
    }))


if __name__ == "__main__":
    # keep stdout to the single JSON line; route stray logs to stderr
    main()
