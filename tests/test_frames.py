"""Frame-folder dataset + native packer tests (config-5 input path)."""

import numpy as np
import pytest

from dynamic_multiview_3d_tpu import config as config_lib
from dynamic_multiview_3d_tpu.data import frames as frames_lib
from dynamic_multiview_3d_tpu.data import native


@pytest.fixture(scope="module")
def dataset_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("frames_ds"))
    frames_lib.export_synthetic(root, num_scenes=2, image_size=48,
                                num_views=4, seq_len=3)
    return root


def test_example_contract(dataset_root):
    cfg = config_lib.DataConfig(source="frames", root=dataset_root,
                                image_size=32, seq_len=2, num_targets=2)
    ds = frames_lib.FrameFolderScenes(cfg)
    ex = ds.example(0)
    assert ex["image_seq"].shape == (2, 32, 32, 3)      # resized 48 -> 32
    assert ex["tgt_images"].shape == (2, 32, 32, 3)
    assert ex["src_poses"].shape == (2, 3)
    assert ex["tgt_poses"].shape == (2, 3)
    assert -1.0 <= ex["image_seq"].min() and ex["image_seq"].max() <= 1.0
    # deterministic per index
    ex2 = ds.example(0)
    np.testing.assert_array_equal(ex["image_seq"], ex2["image_seq"])


def test_batch_and_pipeline_make_source(dataset_root):
    from dynamic_multiview_3d_tpu.data import pipeline
    cfg = config_lib.DataConfig(source="frames", root=dataset_root,
                                image_size=48, seq_len=1, num_targets=1)
    ds = pipeline.make_source(cfg)
    b = ds.batch(range(3))
    assert b["image_seq"].shape == (3, 1, 48, 48, 3)


def test_missing_root_raises():
    cfg = config_lib.DataConfig(source="frames", root="/nonexistent/xyz")
    with pytest.raises(FileNotFoundError):
        frames_lib.FrameFolderScenes(cfg)


def test_native_matches_numpy_normalize(rng):
    img = rng.integers(0, 256, (2, 16, 16, 3), dtype=np.uint8)
    out = native.resize_normalize_pack(img, 16, 16)
    np.testing.assert_allclose(out, img.astype(np.float32) / 127.5 - 1.0,
                               atol=1e-6)


def test_native_resize_constant(rng):
    img = np.full((1, 20, 20, 3), 100, np.uint8)
    out = native.resize_normalize_pack(img, 40, 40)
    np.testing.assert_allclose(out, 100 / 127.5 - 1.0, atol=1e-5)


def test_native_gather(rng):
    store = rng.integers(0, 256, (6, 4, 4, 3), dtype=np.uint8)
    out = native.gather_pack(store, np.array([5, 0, 2]))
    np.testing.assert_allclose(
        out, store[[5, 0, 2]].astype(np.float32) / 127.5 - 1.0, atol=1e-6)


def test_native_degenerate_one_pixel_input(rng):
    """1-pixel-tall/wide inputs must not read out of bounds (round-1 review:
    the bilinear clamp went to -1); nearest/copy semantics instead."""
    img = np.full((1, 1, 1, 3), 200, np.uint8)
    out = native.resize_normalize_pack(img, 4, 4)
    np.testing.assert_allclose(out, 200 / 127.5 - 1.0, atol=1e-6)
    row = rng.integers(0, 256, (1, 1, 7, 3)).astype(np.uint8)
    out_row = native.resize_normalize_pack(row, 3, 7)
    assert out_row.shape == (1, 3, 7, 3)
    assert np.isfinite(out_row).all()
    # every output row equals the (normalized) input row
    ref = row[0, 0].astype(np.float32) / 127.5 - 1.0
    for y in range(3):
        np.testing.assert_allclose(out_row[0, y], ref, atol=1e-6)


def test_packed_format_matches_png(tmp_path):
    """fmt='packed' (memory-mapped uint8 banks) yields identical examples
    to the PNG-decode path — same scenes, same sampling."""
    from dynamic_multiview_3d_tpu.data.frames import (FrameFolderScenes,
                                                      export_synthetic)
    from dynamic_multiview_3d_tpu.config import DataConfig
    kw = dict(num_scenes=2, image_size=32, num_views=3, seq_len=2,
              dynamic=True, seed=3)
    export_synthetic(str(tmp_path / "png"), fmt="png", **kw)
    export_synthetic(str(tmp_path / "packed"), fmt="packed", **kw)
    dc = lambda root: DataConfig(source="frames", root=root, image_size=32,
                                 seq_len=2, num_targets=2, seed=3)
    a = FrameFolderScenes(dc(str(tmp_path / "png")))
    b = FrameFolderScenes(dc(str(tmp_path / "packed")))
    ea, eb = a.example(5, raw=True), b.example(5, raw=True)
    for key in ea:
        np.testing.assert_array_equal(ea[key], eb[key])


def test_packed_f32_gather_path_matches_per_frame(tmp_path):
    """The f32 fast path (native.gather_pack off the mmap bank, taken when
    packed + no resize) must equal the generic per-frame read path."""
    from dynamic_multiview_3d_tpu.data.frames import (FrameFolderScenes,
                                                      export_synthetic)
    from dynamic_multiview_3d_tpu.config import DataConfig
    kw = dict(num_scenes=2, image_size=32, num_views=3, seq_len=3,
              dynamic=True, seed=5)
    export_synthetic(str(tmp_path / "pk"), fmt="packed", **kw)
    export_synthetic(str(tmp_path / "png"), fmt="png", **kw)
    dc = lambda root: DataConfig(source="frames", root=root, image_size=32,
                                 seq_len=2, num_targets=2, seed=5)
    fast = FrameFolderScenes(dc(str(tmp_path / "pk")))
    slow = FrameFolderScenes(dc(str(tmp_path / "png")))
    for i in (0, 3, 7):
        ef, es = fast.example(i), slow.example(i)
        for key in ef:
            np.testing.assert_allclose(ef[key], es[key], atol=1e-6)


def test_scene_offset_gives_disjoint_scenes(tmp_path):
    from dynamic_multiview_3d_tpu.data.frames import export_synthetic
    export_synthetic(str(tmp_path / "d"), num_scenes=1, image_size=32,
                     num_views=2, seq_len=1, fmt="packed", seed=0)
    export_synthetic(str(tmp_path / "d"), num_scenes=1, image_size=32,
                     num_views=2, seq_len=1, fmt="packed", seed=0,
                     scene_offset=1)
    import os
    dirs = sorted(os.listdir(tmp_path / "d"))
    assert dirs == ["scene_00000", "scene_00001"]
    b0 = np.load(tmp_path / "d" / "scene_00000" / "frames.npy")
    b1 = np.load(tmp_path / "d" / "scene_00001" / "frames.npy")
    assert not np.array_equal(b0, b1)   # different procedural geometry


def test_orbit_src_views(dataset_root):
    """cfg.src_views='orbit': each frame comes from its own camera (true
    multiview evidence), poses are per-frame, stream stays deterministic."""
    cfg = config_lib.DataConfig(source="frames", root=dataset_root,
                                image_size=32, seq_len=3, num_targets=2,
                                src_views="orbit")
    ds = frames_lib.FrameFolderScenes(cfg)
    # with V=4 >= T=3 the draws are distinct views
    distinct = [len(set(ds.sample_indices(i)[1].tolist())) for i in range(8)]
    assert all(d == 3 for d in distinct), distinct
    ex = ds.example(1)
    assert ex["src_poses"].shape == (3, 3)
    # per-frame poses actually differ across the sequence
    assert np.abs(np.diff(ex["src_poses"], axis=0)).max() > 1e-3
    np.testing.assert_array_equal(ex["image_seq"],
                                  ds.example(1)["image_seq"])


def test_fixed_src_views_stream_unchanged(dataset_root):
    """The round-2 'fixed' stream is bit-stable: orbit support must not
    perturb existing draws (resume/regression safety)."""
    cfg = config_lib.DataConfig(source="frames", root=dataset_root,
                                image_size=32, seq_len=2, num_targets=2)
    ds = frames_lib.FrameFolderScenes(cfg)
    scene_i, src_views, tgt_views, t0 = ds.sample_indices(5)
    # fixed mode: one camera films the whole sequence
    assert src_views.shape == (2,) and len(set(src_views.tolist())) == 1
    ex = ds.example(5)
    assert np.abs(np.diff(ex["src_poses"], axis=0)).max() < 1e-6


# ------------------------------------------------- disk-free synthetic frames
def test_synthetic_frames_source_contract():
    """SyntheticFrames: the frames contract with zero prior setup — fixed
    per-scene cameras, orbit draws, deterministic examples, and the packed
    protocol after materialize (the c3mf out-of-the-box path)."""
    cfg = config_lib.DataConfig(source="frames", root="", image_size=32,
                                seq_len=3, num_targets=2, num_scenes=4,
                                src_views="orbit", dynamic=True)
    ds = frames_lib.SyntheticFrames(cfg)
    assert len(ds.scenes) == 4
    distinct = [len(set(ds.sample_indices(i)[1].tolist())) for i in range(8)]
    assert all(d == 3 for d in distinct), distinct
    ex = ds.example(1)
    assert ex["image_seq"].shape == (3, 32, 32, 3)
    assert np.abs(np.diff(ex["src_poses"], axis=0)).max() > 1e-3
    np.testing.assert_array_equal(ex["image_seq"],
                                  ds.example(1)["image_seq"])
    # packed protocol: ineligible before materialize, eligible after,
    # and the example stream is unchanged by materialization
    from dynamic_multiview_3d_tpu.data import resident as resident_lib
    assert not resident_lib.fits_budget(ds, cfg)
    before = ds.batch(range(4))
    ds.materialize_packed()
    assert resident_lib.fits_budget(ds, cfg)
    after = ds.batch(range(4))
    for key in before:
        np.testing.assert_allclose(before[key], after[key], atol=1e-6,
                                   err_msg=key)


def test_make_source_empty_root_falls_back_to_synthetic_frames():
    from dynamic_multiview_3d_tpu.data import pipeline as pipeline_lib
    cfg = config_lib.DataConfig(source="frames", root="", image_size=32,
                                num_scenes=2)
    with pytest.warns(UserWarning, match="SyntheticFrames"):
        src = pipeline_lib.make_source(cfg)
    assert isinstance(src, frames_lib.SyntheticFrames)


def test_synthetic_frames_disjoint_scene_offsets():
    """Disjoint scene_offset ranges give disjoint geometry — the
    held-out-scene eval protocol without any export."""
    mk = lambda off: frames_lib.SyntheticFrames(config_lib.DataConfig(
        source="frames", root="", image_size=32, num_scenes=2,
        scene_offset=off))
    a, b = mk(0), mk(2)
    fa = a._read_frame(a.scenes[0], 0, 0)
    fb = b._read_frame(b.scenes[0], 0, 0)
    assert np.abs(fa.astype(int) - fb.astype(int)).max() > 8
