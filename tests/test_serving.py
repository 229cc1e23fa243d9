"""Serving export (jax.export StableHLO artifact — the frozen-graph
analog; `serving.py`)."""

import numpy as np
import pytest

from dynamic_multiview_3d_tpu import config as config_lib
from dynamic_multiview_3d_tpu import serving
from dynamic_multiview_3d_tpu.api import Model


def _tiny_cfg():
    return config_lib.Config(
        model=config_lib.ModelConfig(
            image_size=32, num_levels=3, base_features=8, max_features=32,
            gru_features=16, pose_embed_dim=16, dtype="float32",
            use_pallas=False),
        data=config_lib.DataConfig(image_size=32, seq_len=2, num_targets=2),
    )


@pytest.fixture(scope="module")
def artifact(tmp_path_factory):
    model = Model.init_random(_tiny_cfg(), seed=0)
    path = str(tmp_path_factory.mktemp("serve") / "model.dmv3d")
    manifest = serving.export_predict(model, path, batch=2, num_targets=2)
    return model, path, manifest


def test_export_roundtrip_matches_live_model(artifact, rng):
    model, path, manifest = artifact
    served = serving.ServedModel.load(path)
    seq = rng.uniform(-1, 1, (2, 2, 32, 32, 3)).astype(np.float32)
    src = rng.uniform(0, 1, (2, 2, 3)).astype(np.float32) + [0, 0, 1]
    tgt = rng.uniform(0, 1, (2, 2, 3)).astype(np.float32) + [0, 0, 1]
    got = np.asarray(served.predict(seq, tgt, source_poses=src))
    want = np.asarray(model.predict(seq, tgt, source_poses=src))
    assert got.shape == tuple(manifest["view"])
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_artifact_is_self_contained(artifact):
    """The zip carries weights + config + manifest; weights are plain npz
    (inspectable without this package)."""
    import io
    import json
    import zipfile
    _, path, _ = artifact
    with zipfile.ZipFile(path) as z:
        names = set(z.namelist())
        assert {"predict.stablehlo", "params.npz", "config.json",
                "manifest.json"} <= names
        with np.load(io.BytesIO(z.read("params.npz"))) as npz:
            assert len(npz.files) > 10
        cfg = json.loads(z.read("config.json"))
        assert cfg["model"]["image_size"] == 32


def test_fixed_shape_contract_is_loud(artifact, rng):
    _, path, _ = artifact
    served = serving.ServedModel.load(path)
    seq_bad = rng.uniform(-1, 1, (1, 2, 32, 32, 3)).astype(np.float32)
    tgt = rng.uniform(0, 1, (1, 2, 3)).astype(np.float32)
    with pytest.raises(ValueError, match="fixed-shape"):
        served.predict(seq_bad, tgt)


def test_future_version_rejected(artifact, tmp_path):
    import json
    import shutil
    import zipfile
    _, path, _ = artifact
    path2 = tmp_path / "future.dmv3d"
    shutil.copy(path, path2)
    with zipfile.ZipFile(path) as z:
        blob, npz = z.read("predict.stablehlo"), z.read("params.npz")
        cfg = z.read("config.json")
        man = json.loads(z.read("manifest.json"))
    man["version"] = serving.MANIFEST_VERSION + 1
    with zipfile.ZipFile(path2, "w") as z:
        z.writestr("predict.stablehlo", blob)
        z.writestr("params.npz", npz)
        z.writestr("config.json", cfg)
        z.writestr("manifest.json", json.dumps(man))
    with pytest.raises(ValueError, match="newer"):
        serving.ServedModel.load(str(path2))


def test_sharded_serving_matches_single_device(artifact, rng):
    """predict(mesh=...) shards the batch over the 'data' axis and GSPMD
    partitions the exported StableHLO — outputs equal the unsharded call
    and land distributed over all 8 virtual devices."""
    import jax
    from jax.sharding import Mesh

    model, path, _ = artifact
    served = serving.ServedModel.load(path)
    seq = rng.uniform(-1, 1, (2, 2, 32, 32, 3)).astype(np.float32)
    src = rng.uniform(0, 1, (2, 2, 3)).astype(np.float32) + [0, 0, 1]
    tgt = rng.uniform(0, 1, (2, 2, 3)).astype(np.float32) + [0, 0, 1]
    mesh = Mesh(np.array(jax.devices()[:2]), ("data",))
    got = served.predict(seq, tgt, source_poses=src, mesh=mesh)
    want = served.predict(seq, tgt, source_poses=src)
    assert len(got.sharding.device_set) == 2
    # GSPMD partitioning reorders GroupNorm stat reductions: f32 noise only
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-3, atol=1e-4)


def test_default_pose_rides_in_the_manifest(artifact, rng):
    """predict(source_poses=None) must not import this package's model
    code — the default pose is manifest data (VERDICT r3 weak #6)."""
    model, path, manifest = artifact
    assert manifest["default_pose"] == [0.0, 0.3, 2.0]
    served = serving.ServedModel.load(path)
    m = served.manifest
    seq = rng.uniform(-1, 1, m["image_seq"]).astype(np.float32)
    tgt = rng.uniform(0.2, 1.0, m["tgt_poses"]).astype(np.float32)
    got = np.asarray(served.predict(seq, tgt))            # no source_poses
    src = np.broadcast_to(np.asarray(m["default_pose"], np.float32),
                          tuple(m["src_poses"]))
    want = np.asarray(served.predict(seq, tgt, source_poses=src))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_artifact_is_custom_call_free_and_loads_in_fresh_process(tmp_path, rng):
    """Round-5 segfault regression. The multidepth reprojection path used
    ``jnp.linalg.inv`` for the 3x3 intrinsics, which lowers to LAPACK FFI
    custom calls on CPU; jaxlib registers those handlers only when a
    linalg op is traced LIVE, so a fresh "jax + numpy only" serving
    process executing the deserialized module SEGFAULTED outright. Two
    guards: (1) exports are custom-call-free (ops/reproject.inv3x3),
    recorded in the manifest for audit; (2) the artifact actually loads
    and predicts in a genuinely fresh python process."""
    import dataclasses
    import os
    import subprocess
    import sys
    cfg = _tiny_cfg()
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, synthesis="multidepth"),
        data=dataclasses.replace(cfg.data, seq_len=3, src_views="orbit"))
    model = Model.init_random(cfg, seed=0)
    path = str(tmp_path / "fresh.dmv3d")
    manifest = serving.export_predict(model, path, batch=2, num_targets=2)
    assert manifest["custom_calls"] == [], manifest["custom_calls"]
    driver = (
        "import jax; jax.config.update('jax_platforms', 'cpu')\n"
        "import sys, numpy as np\n"
        f"sys.path.insert(0, {os.getcwd()!r})\n"
        "from dynamic_multiview_3d_tpu import serving\n"
        f"served = serving.ServedModel.load({path!r})\n"
        "m = served.manifest\n"
        "rng = np.random.default_rng(0)\n"
        "seq = rng.uniform(-1, 1, m['image_seq']).astype(np.float32)\n"
        "src = (rng.uniform(0, 1, m['src_poses']) + [0, 0, 1]).astype(np.float32)\n"
        "tgt = (rng.uniform(0, 1, m['tgt_poses']) + [0, 0, 1]).astype(np.float32)\n"
        "out = np.asarray(served.predict(seq, tgt, source_poses=src))\n"
        "print('FRESH_OK', out.shape)\n")
    proc = subprocess.run([sys.executable, "-c", driver],
                          capture_output=True, text=True, timeout=600)
    assert proc.returncode == 0, (proc.returncode, proc.stderr[-2000:])
    assert "FRESH_OK" in proc.stdout


def test_multi_seq_len_artifact_dispatches_on_source_count(tmp_path, rng):
    """seq_len=(2, 4) exports one StableHLO signature per T into ONE
    artifact; the loader dispatches on image_seq.shape[1] and each branch
    matches the live model — the serving half of the variable-T predict
    contract (shared heads, BASELINE.md round 5). An unexported T is loud,
    and a pre-"signatures" manifest still loads single-T (back-compat)."""
    import dataclasses
    import json
    import shutil
    import zipfile
    cfg = _tiny_cfg()
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, synthesis="multidepth"),
        data=dataclasses.replace(cfg.data, seq_len=4, src_views="orbit"))
    model = Model.init_random(cfg, seed=0)   # multi_head_mode="shared"
    path = str(tmp_path / "multi_t.dmv3d")
    manifest = serving.export_predict(model, path, batch=2, seq_len=(2, 4),
                                      num_targets=2)
    assert sorted(manifest["signatures"]) == ["2", "4"]
    served = serving.ServedModel.load(path)
    assert served.seq_lens == (2, 4)
    tgt = (rng.uniform(0, 1, (2, 2, 3)) + [0, 0, 1]).astype(np.float32)
    for t in (2, 4):
        seq = rng.uniform(-1, 1, (2, t, 32, 32, 3)).astype(np.float32)
        src = (rng.uniform(0, 1, (2, t, 3)) + [0, 0, 1]).astype(np.float32)
        got = np.asarray(served.predict(seq, tgt, source_poses=src))
        want = np.asarray(model.predict(seq, tgt, source_poses=src))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
    seq3 = rng.uniform(-1, 1, (2, 3, 32, 32, 3)).astype(np.float32)
    with pytest.raises(ValueError, match="T in \\[2, 4\\]"):
        served.predict(seq3, tgt)
    # back-compat: strip "signatures" (an old-style manifest) — the legacy
    # entry still serves the primary T
    path2 = tmp_path / "legacy.dmv3d"
    shutil.copy(path, path2)
    with zipfile.ZipFile(path) as z:
        blob, npz = z.read("predict.stablehlo"), z.read("params.npz")
        cfg_blob = z.read("config.json")
        man = json.loads(z.read("manifest.json"))
    del man["signatures"]
    with zipfile.ZipFile(path2, "w") as z:
        z.writestr("predict.stablehlo", blob)
        z.writestr("params.npz", npz)
        z.writestr("config.json", cfg_blob)
        z.writestr("manifest.json", json.dumps(man))
    legacy = serving.ServedModel.load(str(path2))
    assert legacy.seq_lens == (2,)
    seq = rng.uniform(-1, 1, (2, 2, 32, 32, 3)).astype(np.float32)
    src = (rng.uniform(0, 1, (2, 2, 3)) + [0, 0, 1]).astype(np.float32)
    got = np.asarray(legacy.predict(seq, tgt, source_poses=src))
    want = np.asarray(model.predict(seq, tgt, source_poses=src))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_multisource_artifact_requires_source_poses(tmp_path, rng):
    """Artifacts exported from multiflow/multidepth checkpoints record
    their synthesis in the manifest and refuse the default-pose fallback
    (VERDICT r4 weak #1) — plus trained seq_len/src_views for audit."""
    import dataclasses
    cfg = _tiny_cfg()
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, synthesis="multidepth"),
        data=dataclasses.replace(cfg.data, seq_len=3, src_views="orbit"))
    model = Model.init_random(cfg, seed=0)
    path = str(tmp_path / "md.dmv3d")
    manifest = serving.export_predict(model, path, batch=2, num_targets=2)
    assert manifest["synthesis"] == "multidepth"
    assert manifest["trained_seq_len"] == 3
    assert manifest["src_views"] == "orbit"
    served = serving.ServedModel.load(path)
    seq = rng.uniform(-1, 1, (2, 3, 32, 32, 3)).astype(np.float32)
    tgt = (rng.uniform(0, 1, (2, 2, 3)) + [0, 0, 1]).astype(np.float32)
    with pytest.raises(ValueError, match="source_poses"):
        served.predict(seq, tgt)
    src = (rng.uniform(0, 1, (2, 3, 3)) + [0, 0, 1]).astype(np.float32)
    out = np.asarray(served.predict(seq, tgt, source_poses=src))
    live = np.asarray(model.predict(seq, tgt, source_poses=src))
    np.testing.assert_allclose(out, live, atol=1e-5)
