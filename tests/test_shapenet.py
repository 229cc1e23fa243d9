"""Reference-layout (3D-R2N2 ShapeNet renderings) ingestion tests.

VERDICT r2 missing #2 / SURVEY.md R1: the framework must read the genre's
standard on-disk layout without a conversion step. The fixture here writes
procedural scenes INTO the foreign layout; the reader then serves the
normal example contract and a short training run consumes it end to end.
"""

import os

import numpy as np
import pytest

from dynamic_multiview_3d_tpu import config as config_lib
from dynamic_multiview_3d_tpu.data import pipeline as pipeline_lib
from dynamic_multiview_3d_tpu.data import shapenet
from dynamic_multiview_3d_tpu.train import loop as loop_lib


@pytest.fixture(scope="module")
def fixture_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("shapenet"))
    shapenet.export_fixture(root, num_scenes=3, image_size=48, num_views=6,
                            with_synset_level=True, rgba=True)
    # one extra model WITHOUT the synset level or rendering/ subdir,
    # plain-RGB frames (the flattened mirror arrangement)
    shapenet.export_fixture(root, num_scenes=1, image_size=48, num_views=6,
                            with_synset_level=False, rgba=False,
                            nested_rendering=False, model_prefix="flat",
                            seed=7)
    return root


def _cfg(root, **kw):
    import dataclasses
    return dataclasses.replace(
        config_lib.DataConfig(), source="shapenet_dir", root=root,
        image_size=32, seq_len=1, num_targets=2, batch_size=2, **kw)


def test_discovers_all_layout_variants(fixture_root):
    src = pipeline_lib.make_source(_cfg(fixture_root))
    # 3 synset-nested models + 1 flat model
    assert len(src.scenes) == 4


def test_example_contract(fixture_root):
    src = shapenet.ShapeNetDirScenes(_cfg(fixture_root))
    ex = src.example(0)
    assert ex["image_seq"].shape == (1, 32, 32, 3)
    assert ex["tgt_images"].shape == (2, 32, 32, 3)
    assert ex["src_poses"].shape == (1, 3)
    assert ex["tgt_poses"].shape == (2, 3)
    # normalized to [-1, 1], not blank
    assert ex["image_seq"].min() >= -1.001 and ex["image_seq"].max() <= 1.001
    assert ex["image_seq"].std() > 0.05
    # poses round-trip the degree<->radian conversion: az in [0, 2pi)
    meta = src._meta(src.scenes[0])
    assert meta["poses"].shape == (6, 3)
    assert 0.0 <= meta["poses"][:, 0].min() and \
        meta["poses"][:, 0].max() < 2 * np.pi + 1e-5
    assert meta["poses"][:, 2].min() > 0.5        # radius column is distance


def test_rgba_composite_matches_rgb_render(fixture_root, tmp_path):
    """Opaque-RGBA fixture frames must decode to the same pixels as the
    plain-RGB render (compositing over white is exact for alpha=255)."""
    from dynamic_multiview_3d_tpu.data.synthetic import SyntheticScenes
    src = shapenet.ShapeNetDirScenes(_cfg(fixture_root))
    scene = src.scenes[0]                       # synset-nested, rgba=True
    frame = src._read_frame(scene, 0, 0)
    ref_src = SyntheticScenes(num_scenes=3, image_size=48, dynamic=False,
                              seed=0)
    pose = src._meta(scene)["poses"][0]
    ref = ref_src.render(0, pose, time=0.0)
    np.testing.assert_array_equal(frame, ref)


@pytest.mark.slow
def test_training_runs_on_foreign_layout(fixture_root, tmp_path):
    """VERDICT r2 #6 'done' criterion: training runs against a fixture in
    the foreign layout without conversion."""
    cfg = config_lib.override(config_lib.Config(), [
        "model.image_size=32", "model.num_levels=3", "model.base_features=8",
        "model.max_features=16", "model.gru_features=16",
        "model.pose_embed_dim=8", "model.dtype=float32",
        "model.use_pallas=False",
        "data.source=shapenet_dir", f"data.root={fixture_root}",
        "data.image_size=32", "data.batch_size=2", "data.num_targets=2",
        "train.lr=1e-3", "train.num_steps=6", "train.log_every=3",
        f"train.ckpt_dir={tmp_path}/ckpt", "train.ckpt_every=6",
        "mesh.data=1",
    ])
    _, metrics = loop_lib.train(cfg)
    assert np.isfinite(metrics["loss/total"])
