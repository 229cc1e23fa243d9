"""TFRecord ingestion (SURVEY.md R1 "frame files or tfrecords")."""

import numpy as np
import pytest

from dynamic_multiview_3d_tpu import config as config_lib
from dynamic_multiview_3d_tpu.data import tfrecords as tfr_lib

tf = pytest.importorskip("tensorflow")


@pytest.fixture(scope="module")
def tfr_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("tfr")
    tfr_lib.export_tfrecords(str(root), num_scenes=3, image_size=32,
                             num_views=4, seq_len=2, dynamic=True, seed=0,
                             shards=2)
    return str(root)


def test_framing_is_tf_io_compatible(tfr_root):
    """Our pure-python writer's framing (incl. masked crc32c) parses with
    tf.data.TFRecordDataset, and tf.io.TFRecordWriter output parses with
    our span walker — byte-level format parity both ways."""
    import glob
    import os
    shard = sorted(glob.glob(tfr_root + "/*.tfrecord"))[0]
    if tf.executing_eagerly():
        ours = [r.numpy() for r in tf.data.TFRecordDataset(shard)]
    else:
        # test_checkpoint's TF1 Saver test disables eager for the whole
        # process (tf1.disable_eager_execution is one-way); the v1 record
        # iterator reads the same framing in either mode.
        ours = list(tf.compat.v1.io.tf_record_iterator(shard))
    spans = list(tfr_lib.iter_record_spans(shard))
    assert len(ours) == len(spans) > 0
    with open(shard, "rb") as f:
        data = f.read()
    for payload, (off, length) in zip(ours, spans):
        assert data[off:off + length] == payload

    theirs = os.path.join(tfr_root, "tfio.tfrecord")
    with tf.io.TFRecordWriter(theirs) as w:
        for payload in ours[:3]:
            w.write(payload)
    back = [data[o:o + n] for o, n in
            [(off, length) for off, length in
             tfr_lib.iter_record_spans(theirs)]]
    with open(theirs, "rb") as f:
        tdata = f.read()
    got = [tdata[o:o + n] for o, n in tfr_lib.iter_record_spans(theirs)]
    assert got == ours[:3]
    del back


def test_reader_reassembles_scenes_across_shards(tfr_root):
    cfg = config_lib.DataConfig(source="tfrecords", root=tfr_root,
                                image_size=32, seq_len=2, num_targets=2)
    ds = tfr_lib.TFRecordScenes(cfg)
    assert ds.scenes == ["scene_00000", "scene_00001", "scene_00002"]
    meta = ds._meta(ds.scenes[0])
    assert meta["num_views"] == 4 and meta["seq_len"] == 2
    assert meta["poses"].shape == (4, 3)
    ex = ds.example(7)
    assert ex["image_seq"].shape == (2, 32, 32, 3)
    assert ex["tgt_images"].shape == (2, 32, 32, 3)
    assert ex["src_poses"].shape == (2, 3)
    # deterministic stream
    np.testing.assert_array_equal(ex["image_seq"], ds.example(7)["image_seq"])


def test_tfrecord_frames_match_synthetic_render(tfr_root):
    """Pixel parity with the procedural renderer the export drew from."""
    from dynamic_multiview_3d_tpu.data.synthetic import SyntheticScenes
    cfg = config_lib.DataConfig(source="tfrecords", root=tfr_root,
                                image_size=32, seq_len=1, num_targets=1)
    ds = tfr_lib.TFRecordScenes(cfg)
    src = SyntheticScenes(num_scenes=3, image_size=32, seq_len=2,
                          dynamic=True, seed=0)
    rng = np.random.default_rng(0 + 11)
    poses = src.sample_poses(rng, 4)            # scene 0's export draw
    frame = ds._read_frame("scene_00000", 2, 1)
    expect = src.render(0, poses[2], time=1.0)
    np.testing.assert_array_equal(frame, expect)


def test_pipeline_source_dispatch(tfr_root):
    from dynamic_multiview_3d_tpu.data import pipeline as pipeline_lib
    cfg = config_lib.DataConfig(source="tfrecords", root=tfr_root,
                                image_size=32, seq_len=2, num_targets=1)
    src = pipeline_lib.make_source(cfg)
    assert isinstance(src, tfr_lib.TFRecordScenes)
    batch = src.batch(range(4))
    assert batch["image_seq"].shape == (4, 2, 32, 32, 3)


def test_missing_frame_is_loud(tfr_root, tmp_path):
    """A scene with a missing (view, t) frame fails at INIT, not mid-train."""
    import glob
    import shutil
    root2 = tmp_path / "broken"
    root2.mkdir()
    shards = sorted(glob.glob(tfr_root + "/frames-*.tfrecord"))
    shutil.copy(shards[0], root2 / "frames-00000-of-00001.tfrecord")
    cfg = config_lib.DataConfig(source="tfrecords", root=str(root2),
                                image_size=32)
    with pytest.raises(ValueError, match="missing frames"):
        tfr_lib.TFRecordScenes(cfg)


def test_framing_roundtrip_property():
    """Property: arbitrary payloads survive write->span-walk byte-exact."""
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=20, deadline=None)
    @given(st.lists(st.binary(min_size=0, max_size=300), min_size=1,
                    max_size=8))
    def check(payloads):
        import tempfile
        import os
        fd, path = tempfile.mkstemp(suffix=".tfrecord")
        os.close(fd)
        try:
            tfr_lib.write_records(path, payloads)
            with open(path, "rb") as f:
                data = f.read()
            got = [data[o:o + n]
                   for o, n in tfr_lib.iter_record_spans(path)]
            assert got == payloads
        finally:
            os.unlink(path)

    check()


def test_materialized_tfrecords_ride_the_resident_path():
    """data.materialize_packed: a tfrecords source decodes once into
    in-memory banks and becomes HBM-resident eligible; a short
    device-sampling training run consumes ZERO host batches."""
    import tempfile

    import jax

    from dynamic_multiview_3d_tpu.data import resident as resident_lib
    from dynamic_multiview_3d_tpu.parallel import mesh as mesh_lib
    from dynamic_multiview_3d_tpu.train import loop as loop_lib

    with tempfile.TemporaryDirectory() as root:
        tfr_lib.export_tfrecords(root, num_scenes=2, image_size=32,
                                 num_views=4, seq_len=2, dynamic=True,
                                 seed=0, shards=2)
        cfg = config_lib.get_config("default", [
            "data.source=tfrecords", f"data.root={root}",
            "data.image_size=32", "model.image_size=32",
            "model.num_levels=3", "model.base_features=8",
            "model.gru_features=16", "data.seq_len=2",
            "data.num_targets=1", "data.batch_size=4",
            "data.materialize_packed=true", "data.device_sampling=true",
            "mesh.data=1",
        ])
        src = tfr_lib.TFRecordScenes(cfg.data)
        mesh = mesh_lib.make_mesh(cfg.mesh)
        res = loop_lib._maybe_resident(cfg, src, mesh)
        assert isinstance(res, resident_lib.ResidentFrames)
        # the materialized bank matches per-frame decode exactly
        bank = src._packed(src.scenes[0])
        np.testing.assert_array_equal(
            np.asarray(bank[1, 1]), src._read_frame(src.scenes[0], 1, 1))

        from dynamic_multiview_3d_tpu.train import step as step_lib
        state = jax.device_put(step_lib.init_state(cfg),
                               mesh_lib.replicate(mesh))
        step_fn = step_lib.make_train_step(cfg, mesh=mesh, resident=res)
        state, m = step_fn(state, None)          # zero host input
        assert np.isfinite(float(m["loss/total"]))


def test_verify_crc_catches_payload_bitflip(tfr_root, tmp_path):
    """data.verify_crc: framing alone can't see a bit-flip INSIDE a payload
    (it parses fine, feeding garbage pixels) — the opt-in CRC pass must."""
    import os
    import shutil
    import struct

    root = tmp_path / "corrupt"
    shutil.copytree(tfr_root, root)
    shard = sorted(str(p) for p in root.glob("*.tfrecord"))[0]
    # locate a record payload and flip one byte in its middle
    off, length = next(tfr_lib.iter_record_spans(shard))
    with open(shard, "r+b") as f:
        f.seek(off + length // 2)
        b = f.read(1)
        f.seek(off + length // 2)
        f.write(bytes([b[0] ^ 0x10]))

    ok_cfg = config_lib.DataConfig(source="tfrecords", root=str(root),
                                   image_size=32, seq_len=2, num_targets=1)
    tfr_lib.TFRecordScenes(ok_cfg)        # framing-only: corruption unseen
    crc_cfg = config_lib.DataConfig(source="tfrecords", root=str(root),
                                    image_size=32, seq_len=2, num_targets=1,
                                    verify_crc=True)
    with pytest.raises(ValueError, match="payload-CRC mismatch"):
        tfr_lib.TFRecordScenes(crc_cfg)
    # the clean export passes a verifying pass
    clean = config_lib.DataConfig(source="tfrecords", root=tfr_root,
                                  image_size=32, seq_len=2, num_targets=1,
                                  verify_crc=True)
    tfr_lib.TFRecordScenes(clean)
