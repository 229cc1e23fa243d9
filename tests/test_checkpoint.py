"""TF1 Saver import shim (SURVEY.md §5 checkpoint/resume; R16).

Generates a real ``tf.compat.v1`` Saver checkpoint with the installed TF and
round-trips it through ``import_tf1_checkpoint`` into a flax-style pytree —
the mechanism the reference's Saver-era checkpoints would use (name map
remains TODO until a real reference checkout exists, SURVEY.md §0)."""

import numpy as np
import pytest

from dynamic_multiview_3d_tpu.train import checkpoint as ckpt_lib


@pytest.mark.slow
def test_import_tf1_checkpoint_roundtrip(tmp_path, rng):
    tf = pytest.importorskip("tensorflow")
    tf1 = tf.compat.v1
    tf1.disable_eager_execution()

    conv_k = rng.standard_normal((3, 3, 4, 8)).astype(np.float32)
    fc_w = rng.standard_normal((5, 7)).astype(np.float32)  # TF1 [in, out]
    prefix = str(tmp_path / "tf1" / "model.ckpt")

    with tf1.Graph().as_default():
        tf1.get_variable("enc/conv1/weights", initializer=conv_k)
        tf1.get_variable("fc/weights", initializer=fc_w)
        saver = tf1.train.Saver()
        with tf1.Session() as sess:
            sess.run(tf1.global_variables_initializer())
            saver.save(sess, prefix)

    template = {
        "encoder": {"conv1": {"kernel": np.zeros((3, 3, 4, 8), np.float32),
                              "bias": np.ones((8,), np.float32)}},
        "dense": {"kernel": np.zeros((7, 5), np.float32)},
    }
    name_map = {
        "enc/conv1/weights": "encoder/conv1/kernel",
        "fc/weights": "dense/kernel",   # 2-D, shape mismatch: shim transposes
    }
    out = ckpt_lib.import_tf1_checkpoint(prefix, name_map, template)
    np.testing.assert_allclose(out["encoder"]["conv1"]["kernel"], conv_k)
    # 2-D kernels whose shape mismatches are transposed into place
    np.testing.assert_allclose(out["dense"]["kernel"], fc_w.T)
    # unmapped leaves keep the template values
    np.testing.assert_allclose(out["encoder"]["conv1"]["bias"],
                               template["encoder"]["conv1"]["bias"])
    # bad path raises
    with pytest.raises(KeyError):
        ckpt_lib.import_tf1_checkpoint(prefix, {"enc/conv1/weights": "nope"},
                                       template)
