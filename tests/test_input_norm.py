"""DMM frame-input normalization contract (cfg.model.input_norm).

The failure this pins: raw01-trained weights collapsed at serve time the
moment readers switched to uint8 frames, because extract_features
ImageNet-normalized uint8 but passed floats through (day-one drill J&F
0.976 -> 0.29). uint8 and float [0,1] frames must produce IDENTICAL
features under either convention.
"""

import jax
import jax.numpy as jnp
import numpy as np

from dmm_net_tpu.config import Config, DataConfig, MatchingConfig, ModelConfig


def _model(norm):
    from dmm_net_tpu.models.dmm import DMMNet
    cfg = Config(model=ModelConfig(backbone="resnet18", feature_dim=8,
                                   decoder_dim=8, decoder_obj_dim=4,
                                   backbone_dtype="float32",
                                   input_norm=norm, image_size=(32, 32)),
                 matching=MatchingConfig(max_templates=2, max_proposals=2,
                                         use_pallas=False),
                 data=DataConfig(dataset="synthetic"))
    return DMMNet(cfg)


def _feats(model, frames):
    from dmm_net_tpu.models.dmm import DMMNet
    v = model.init(jax.random.PRNGKey(0), jnp.asarray(frames),
                   method=DMMNet.extract_features)
    return model.apply(v, jnp.asarray(frames),
                       method=DMMNet.extract_features)


def test_uint8_equals_float01_under_both_conventions():
    rng = np.random.RandomState(0)
    u8 = (rng.rand(1, 32, 32, 3) * 255).astype(np.uint8)
    f01 = u8.astype(np.float32) / 255.0
    for norm in ("raw01", "imagenet"):
        m = _model(norm)
        fa = _feats(m, u8)
        fb = _feats(m, f01)
        for k in fa:
            np.testing.assert_allclose(np.asarray(fa[k]),
                                       np.asarray(fb[k]), atol=1e-5,
                                       err_msg=f"{norm}/{k}")


def test_imagenet_mode_actually_normalizes():
    """The two conventions must differ (imagenet subtracts mean/std) —
    guards against the knob becoming a no-op."""
    rng = np.random.RandomState(1)
    f01 = rng.rand(1, 32, 32, 3).astype(np.float32)
    fa = _feats(_model("raw01"), f01)
    fb = _feats(_model("imagenet"), f01)
    assert np.abs(np.asarray(fa["c5"]) - np.asarray(fb["c5"])).max() > 1e-3
