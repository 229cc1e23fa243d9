"""Golden-file regression (SURVEY.md §4.5): a seeded tiny model's predicted
views are pinned; drift beyond float-noise fails CI.

Goldens were generated on the CPU backend (the test environment) with
regenerate_golden(). If the real reference ever appears, replace the golden
with reference outputs to prove the BASELINE parity claim (SURVEY.md §0/§6).
"""

import os

import jax
import numpy as np

from dynamic_multiview_3d_tpu import config as config_lib
from dynamic_multiview_3d_tpu.api import Model
from dynamic_multiview_3d_tpu.data.synthetic import SyntheticScenes

GOLDEN = os.path.join(os.path.dirname(__file__), "goldens",
                      "tiny_model_views.npy")


def _cfg():
    return config_lib.override(config_lib.Config(), [
        "model.image_size=32", "model.num_levels=3", "model.base_features=8",
        "model.max_features=16", "model.gru_features=16",
        "model.pose_embed_dim=8", "model.dtype=float32",
        "model.use_pallas=False", "data.image_size=32",
    ])


def _views():
    src = SyntheticScenes(num_scenes=2, image_size=32, seq_len=2,
                          num_targets=2)
    ex = src.example(1)
    model = Model.init_random(_cfg(), seed=123)
    return np.asarray(model.predict(ex["image_seq"], ex["tgt_poses"],
                                    source_poses=ex["src_poses"]))


def regenerate_golden():
    os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
    np.save(GOLDEN, _views())


def test_golden_views_unchanged():
    assert os.path.exists(GOLDEN), \
        "golden missing — run tests/test_golden.py:regenerate_golden()"
    golden = np.load(GOLDEN)
    views = _views()
    assert views.shape == golden.shape
    mse = float(np.mean((views - golden) ** 2))
    psnr = 10 * np.log10(4.0 / max(mse, 1e-16))   # range [-1,1] -> 4
    assert psnr >= 60.0, f"golden drift: PSNR {psnr:.1f} dB"


if __name__ == "__main__":
    regenerate_golden()
    print("golden regenerated at", GOLDEN)
