"""Config tree: presets, dot-path overrides, CLI override parsing."""

import pytest

from dmm_net_tpu.config import Config, preset
from dmm_net_tpu.utils.cli import parse_overrides


def test_all_presets_load():
    for name in ("p1_matcher_only", "p2_single_object", "p3_multi_object",
                 "p3_480p", "p4_ytvos_stream", "p5_train"):
        cfg = preset(name)
        assert cfg.name == name
        assert cfg.matching.max_templates >= 1
        assert cfg.model.image_size[0] % 32 == 0


def test_unknown_preset_raises():
    with pytest.raises(KeyError):
        preset("nope")


def test_override_nested_and_immutable():
    cfg = Config()
    cfg2 = cfg.override(**{"matching.solver": "pgd", "train.lr": 3e-4,
                           "model.image_size": (64, 96)})
    assert cfg2.matching.solver == "pgd"
    assert cfg2.train.lr == 3e-4
    assert cfg2.model.image_size == (64, 96)
    # original untouched (frozen dataclasses)
    assert cfg.matching.solver == "sinkhorn"


def test_parse_overrides_types():
    out = parse_overrides(["a.b=3", "c.d=0.5", "e.f=true", "g.h=False",
                           "i.j=64,96", "k.l=resnet50"])
    assert out == {"a.b": 3, "c.d": 0.5, "e.f": True, "g.h": False,
                   "i.j": (64, 96), "k.l": "resnet50"}


def test_preset_configs_match_driver_acceptance():
    """BASELINE.json configs 1-5 sanity: the presets encode their axes."""
    p1 = preset("p1_matcher_only")
    assert p1.data.batch_size == 1 and p1.matching.solver == "sinkhorn"
    p2 = preset("p2_single_object")
    assert p2.matching.max_templates == 1 and p2.data.dataset == "davis"
    p3 = preset("p3_multi_object")
    assert p3.matching.max_templates > 1 and p3.data.batch_size > 1
    p4 = preset("p4_ytvos_stream")
    assert p4.data.dataset == "ytvos" and p4.data.prefetch_depth >= 3
    # config #4 spec: "more objects, higher proposal counts" than p3
    assert p4.matching.max_templates > p3.matching.max_templates
    assert p4.matching.max_proposals > p3.matching.max_proposals
    p5 = preset("p5_train")
    assert p5.data.dataset == "davis" and p5.data.clip_length >= 2


def test_pgd_with_pallas_rejected():
    """The fused Pallas kernel is Sinkhorn-only; solver='pgd' +
    use_pallas=True used to silently run Sinkhorn (VERDICT r3 weak #5).
    Now it raises at config construction, including via override on the
    p3 preset (use_pallas=True)."""
    with pytest.raises(ValueError, match="Sinkhorn-only"):
        Config().override(**{"matching.solver": "pgd",
                             "matching.use_pallas": True})
    with pytest.raises(ValueError, match="Sinkhorn-only"):
        preset("p3_multi_object").override(**{"matching.solver": "pgd"})
    # the documented escape hatch works
    cfg = preset("p3_multi_object").override(
        **{"matching.solver": "pgd", "matching.use_pallas": False})
    assert cfg.matching.solver == "pgd" and not cfg.matching.use_pallas


def test_bad_solver_and_decode_rejected():
    with pytest.raises(ValueError, match="solver"):
        Config().override(**{"matching.solver": "hungarian"})
    with pytest.raises(ValueError, match="decode"):
        Config().override(**{"matching.decode": "sinkhorn"})


def test_config_from_dict_legacy_architecture_defaults():
    """A blob saved before an arch-affecting field existed must restore
    to the architecture it was trained with, not the current default
    (config._LEGACY_DEFAULTS). Regression: the r5 decoder_obj_fine_level
    default moved to "c3"; restoring a pre-field blob under "c3" crashed
    infer.py on missing detail_basis params (the committed fallback
    artifact hit exactly this)."""
    from dmm_net_tpu.config import config_from_dict

    d = Config(name="x").to_dict()
    # simulate a blob written before the r5 fields existed
    for k in ("decoder_obj_fine_level", "decoder_obj_merge_fine_k",
              "decoder_detail_dim", "decoder_detail_basis_k"):
        del d["model"][k]
    cfg = config_from_dict(d)
    assert cfg.model.decoder_obj_fine_level == ""      # legacy, not "c3"
    assert cfg.model.decoder_obj_merge_fine_k == 3
    assert cfg.model.decoder_detail_dim == 16
    assert cfg.model.decoder_detail_basis_k == 3       # legacy, not 1
    # present keys still win over legacy defaults
    d["model"]["decoder_obj_fine_level"] = "c3"
    assert config_from_dict(d).model.decoder_obj_fine_level == "c3"
