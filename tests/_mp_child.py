"""Child process for the real 2-process distributed test (not a test file).

Usage: python tests/_mp_child.py <coordinator_port> <process_id>

Runs jax.distributed.initialize over two CPU processes (4 virtual devices
each -> one 8-device global mesh), pulls THIS process's Grain shard, builds
the global batch with make_array_from_process_local_data, executes one
shard_map DP train step, and prints the (globally pmean'd) loss as JSON.
"""

import json
import os
import sys


def main() -> None:
    port, pid = sys.argv[1], int(sys.argv[2])
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

    import jax
    jax.config.update("jax_platforms", "cpu")   # sitecustomize override
    jax.distributed.initialize(f"localhost:{port}", num_processes=2,
                               process_id=pid)
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 8, jax.devices()
    assert len(jax.local_devices()) == 4

    from dynamic_multiview_3d_tpu import config as config_lib
    from dynamic_multiview_3d_tpu.data import pipeline as pipeline_lib
    from dynamic_multiview_3d_tpu.parallel import mesh as mesh_lib
    from dynamic_multiview_3d_tpu.train import step as step_lib

    cfg = config_lib.override(config_lib.Config(), [
        "model.image_size=32", "model.num_levels=3", "model.base_features=8",
        "model.max_features=16", "model.gru_features=16",
        "model.pose_embed_dim=8", "model.dtype=float32",
        "model.use_pallas=False",
        "data.image_size=32", "data.batch_size=8", "data.num_scenes=16",
        "data.grain_workers=0", "train.optimizer=sgd", "train.lr=1e-3",
    ])

    # per-process Grain shard: 4 of the global 8 examples
    it = pipeline_lib.make_grain_iterator(cfg.data, num_epochs=1)
    local_batch = next(it)
    assert local_batch["image_seq"].shape[0] == 4

    mesh = mesh_lib.make_mesh(config_lib.MeshConfig(data=8, model=1))
    state = step_lib.init_state(cfg)          # same seed -> same params
    state = jax.device_put(state, mesh_lib.replicate(mesh))
    global_batch = mesh_lib.shard_batch(mesh, local_batch)
    assert global_batch["image_seq"].shape[0] == 8

    step_fn = step_lib.make_train_step(cfg, mesh=mesh, mode="shard_map")
    state, metrics = step_fn(state, global_batch)

    # --- phase 2: scene-sharded HBM residency across the two processes.
    # The 8-scene bank shards over the 8-device global mesh (1 scene per
    # shard); each process materializes only its 4 addressable scenes via
    # make_array_from_callback, and the step samples in-program.
    loss_res = None
    if len(sys.argv) > 3:
        from dynamic_multiview_3d_tpu.train import loop as loop_lib
        cfg2 = config_lib.override(cfg, [
            "data.source=frames", f"data.root={sys.argv[3]}",
            "data.seq_len=2", "data.num_targets=2",
            "data.device_sampling=true", "data.resident_sharding=scenes",
        ])
        src2 = pipeline_lib.make_source(cfg2.data)
        res = loop_lib._maybe_resident(cfg2, src2, mesh)
        assert res is not None and res.num_shards == 8
        state2 = jax.device_put(step_lib.init_state(cfg2),
                                mesh_lib.replicate(mesh))
        step_res = step_lib.make_train_step(cfg2, mesh=mesh, resident=res)
        state2, m2 = step_res(state2, None)
        loss_res = float(m2["loss/total"])

    # --- phase 3: per-process streaming-Grain iterator state checkpoint.
    # Each live process streams its own shard, saves its iterator state
    # through the loop's per-process grain-state files (shared ckpt_dir,
    # filenames keyed by process_index), restores into a FRESH iterator,
    # and must continue bit-identically to the uninterrupted stream.
    stream_ok = None
    stream_digest = None
    if len(sys.argv) > 4:
        import hashlib

        import numpy as np

        from dynamic_multiview_3d_tpu.train import loop as loop_lib

        ckpt_dir = sys.argv[4]
        it_s = pipeline_lib.make_grain_iterator(cfg.data)
        for _ in range(3):
            next(it_s)                              # consume a prefix
        loop_lib._save_grain_state(ckpt_dir, 3, it_s)
        expect = [next(it_s) for _ in range(2)]     # uninterrupted tail

        it_r = pipeline_lib.make_grain_iterator(cfg.data)
        loop_lib._restore_grain_state(ckpt_dir, 3, it_r)
        got = [next(it_r) for _ in range(2)]

        stream_ok = all(
            sorted(e.keys()) == sorted(g.keys())
            and all(np.array_equal(e[k], g[k]) for k in e)
            for e, g in zip(expect, got))
        h = hashlib.sha256()
        for b in expect:
            for k in sorted(b):
                h.update(np.ascontiguousarray(b[k]).tobytes())
        stream_digest = h.hexdigest()

    print(json.dumps({"pid": pid,
                      "loss": float(metrics["loss/total"]),
                      "l1": float(metrics["loss/l1"]),
                      "loss_resident": loss_res,
                      "stream_ok": stream_ok,
                      "stream_digest": stream_digest}), flush=True)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
