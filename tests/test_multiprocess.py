"""REAL 2-process distributed integration test (SURVEY.md §2b multi-host DP).

Round-1 only unit-tested the multi-host pieces with faked process indices;
this launches two actual processes through ``jax.distributed.initialize``
(CPU backend, 4 virtual devices each -> one 8-device global mesh), so the
coordinator bootstrap, per-process Grain sharding,
``make_array_from_process_local_data`` batch assembly, and the cross-process
shard_map psum all run for real. The pmean'd loss must agree across both
processes AND with a single-process run over the union of the two Grain
shards.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_distributed_matches_single(tmp_path):
    port = _free_port()
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    child = os.path.join(REPO, "tests", "_mp_child.py")

    # phase-2 input: an 8-scene packed export, scene-sharded over the
    # 8-device global mesh inside the children (1 scene per shard, each
    # process materializes only its 4 local scenes)
    from dynamic_multiview_3d_tpu.data import frames as frames_lib
    res_root = str(tmp_path / "res_ds")
    frames_lib.export_synthetic(res_root, num_scenes=8, image_size=32,
                                num_views=3, seq_len=2, fmt="packed")

    grain_dir = str(tmp_path / "grain_ckpt")
    procs = [
        subprocess.Popen([sys.executable, child, str(port), str(pid),
                          res_root, grain_dir],
                         stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                         env=env, cwd=REPO, text=True)
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=480)
        assert p.returncode == 0, f"child failed:\n{err[-4000:]}"
        outs.append(json.loads(out.strip().splitlines()[-1]))

    losses = {o["pid"]: o["loss"] for o in outs}
    # both processes see the same global (pmean'd) loss
    np.testing.assert_allclose(losses[0], losses[1], rtol=1e-6)
    # scene-sharded resident step: cross-process pmean agrees too
    res_losses = {o["pid"]: o["loss_resident"] for o in outs}
    assert res_losses[0] is not None
    np.testing.assert_allclose(res_losses[0], res_losses[1], rtol=1e-6)

    # phase 3: BOTH live processes saved + restored their own streaming
    # Grain iterator state (per-process files in one shared ckpt_dir) and
    # continued bit-identically; their post-restore streams are disjoint
    # shards, so the digests must differ.
    assert all(o["stream_ok"] for o in outs), outs
    assert outs[0]["stream_digest"] != outs[1]["stream_digest"]
    saved = sorted(os.listdir(tmp_path / "grain_ckpt"))
    assert saved == ["grain_state_3_p0.json", "grain_state_3_p1.json"], saved

    # single-process oracle: the union of both processes' Grain shards
    # through the single-device step gives the same loss
    from dynamic_multiview_3d_tpu import config as config_lib
    from dynamic_multiview_3d_tpu.data import pipeline as pipeline_lib
    from dynamic_multiview_3d_tpu.train import step as step_lib
    import jax

    cfg = config_lib.override(config_lib.Config(), [
        "model.image_size=32", "model.num_levels=3", "model.base_features=8",
        "model.max_features=16", "model.gru_features=16",
        "model.pose_embed_dim=8", "model.dtype=float32",
        "model.use_pallas=False",
        "data.image_size=32", "data.batch_size=8", "data.num_scenes=16",
        "data.grain_workers=0", "train.optimizer=sgd", "train.lr=1e-3",
    ])
    shards = []
    for pidx in (0, 1):
        it = pipeline_lib.make_grain_iterator(
            cfg.data, process_index=pidx, process_count=2, num_epochs=1)
        shards.append(next(it))
    union = {k: np.concatenate([shards[0][k], shards[1][k]])
             for k in shards[0]}
    state = step_lib.init_state(cfg)
    single = step_lib.make_train_step(cfg)
    _, m = single(state, jax.device_put(union))
    np.testing.assert_allclose(losses[0], float(m["loss/total"]), rtol=2e-5)
