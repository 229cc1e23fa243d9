"""Preset/config surface (SURVEY.md R19)."""

from dynamic_multiview_3d_tpu import config as config_lib


def test_c3mf_preset():
    """The flagship multiflow+orbit recipe is one preset flag."""
    cfg = config_lib.get_config("c3mf")
    assert cfg.model.synthesis == "multiflow"
    assert cfg.data.src_views == "orbit"
    assert cfg.data.device_sampling and cfg.train.steps_per_dispatch == 16


def test_decoder_variant_flags_roundtrip_config_dict():
    cfg = config_lib.get_config("c2", ["model.up_order=norm_first",
                                       "model.skip_fusion=concat"])
    back = config_lib.from_dict(config_lib.to_dict(cfg))
    assert back.model.up_order == "norm_first"
    assert back.model.skip_fusion == "concat"
