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


def test_c3md_preset():
    """The best-quality recipe is reproducible by name (VERDICT r4 weak #2):
    c3md == c3mf with multidepth synthesis."""
    from dynamic_multiview_3d_tpu import config as config_lib
    md = config_lib.get_config("c3md")
    mf = config_lib.get_config("c3mf")
    assert md.model.synthesis == "multidepth"
    import dataclasses
    assert dataclasses.replace(md.model, synthesis="multiflow") == mf.model
    assert md.data == mf.data and md.train == mf.train


def test_multi_head_mode_checkpoint_compat():
    """Config JSON serialized before multi_head_mode existed must load as
    'baked' (those checkpoints trained the T-baked heads); new configs
    round-trip whatever they carry."""
    from dynamic_multiview_3d_tpu import config as config_lib
    cfg = config_lib.Config()
    d = config_lib.to_dict(cfg)
    assert config_lib.from_dict(d).model.multi_head_mode == "shared"
    legacy = config_lib.to_dict(cfg)
    del legacy["model"]["multi_head_mode"]
    del legacy["model"]["src_head_features"]    # also post-dates round 4
    assert config_lib.from_dict(legacy).model.multi_head_mode == "baked"
