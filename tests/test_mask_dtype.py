"""bf16 mask-path tests (ModelConfig.mask_dtype, VERDICT r2 perf work).

The inference presets carry proposal/template masks in bfloat16 to halve
the dominant HBM traffic of the frame step (models/dmm.py). These tests
pin the contract: the bf16 path must agree with f32 to mask-level
tolerance, carry dtypes must stay stable across scan steps (lax.scan
requires it), and paste_masks must emit the requested dtype.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dmm_net_tpu.config import Config, MatchingConfig, ModelConfig
from dmm_net_tpu.models.dmm import DMMNet, init_frame_state


def _cfg(mask_dtype):
    return Config(
        name="t",
        model=ModelConfig(backbone="resnet18", backbone_dtype="float32",
                          feature_dim=32, decoder_dim=32, decoder_obj_dim=16,
                          image_size=(64, 64), mask_dtype=mask_dtype),
        matching=MatchingConfig(max_templates=4, max_proposals=8,
                                sinkhorn_iters=10, use_pallas=False),
    )


def _inputs(cfg, B=2, seed=0):
    H, W = cfg.model.image_size
    M, N = cfg.matching.max_templates, cfg.matching.max_proposals
    rng = np.random.RandomState(seed)
    frame = jnp.asarray(rng.rand(B, H, W, 3), jnp.float32)
    pm = jnp.asarray(rng.rand(B, N, H, W) > 0.7, jnp.float32)
    pv = jnp.ones((B, N), bool)
    tf_ = jnp.asarray(rng.randn(B, M, cfg.model.feature_dim), jnp.float32)
    tv = jnp.ones((B, M), bool)
    tm = jnp.asarray(rng.rand(B, M, H, W) > 0.7, jnp.float32)
    return frame, pm, pv, tf_, tv, tm


def test_bf16_path_close_to_f32():
    cfg32, cfg16 = _cfg("float32"), _cfg("bfloat16")
    frame, pm, pv, tf_, tv, tm = _inputs(cfg32)
    model32, model16 = DMMNet(cfg32), DMMNet(cfg16)
    vs = model32.init(jax.random.PRNGKey(0), frame, pm, pv, tf_, tv,
                      init_frame_state(cfg32, tm))
    out32, st32 = model32.apply(vs, frame, pm, pv, tf_, tv,
                                init_frame_state(cfg32, tm))
    out16, st16 = model16.apply(vs, frame, pm, pv, tf_, tv,
                                init_frame_state(cfg16, tm))
    # assignments: identical inputs to an fp32 solver up to bf16 mask
    # rounding in the resized IoU masks
    assert np.max(np.abs(np.asarray(out32.assignment)
                         - np.asarray(out16.assignment))) < 5e-2
    # aggregated masks in [0,1]: bf16 einsum with f32 accumulation
    assert np.max(np.abs(np.asarray(out32.agg_masks)
                         - np.asarray(out16.agg_masks))) < 2e-2
    # logits through the decoder
    d = np.abs(np.asarray(out32.logits) - np.asarray(out16.logits))
    assert np.percentile(d, 99) < 0.1, np.percentile(d, 99)


def test_bf16_carry_dtype_stable():
    cfg = _cfg("bfloat16")
    frame, pm, pv, tf_, tv, tm = _inputs(cfg)
    model = DMMNet(cfg)
    state = init_frame_state(cfg, tm)
    assert state.template_masks.dtype == jnp.bfloat16
    vs = model.init(jax.random.PRNGKey(0), frame, pm, pv, tf_, tv, state)
    out, st2 = model.apply(vs, frame, pm, pv, tf_, tv, state)
    # identical pytree dtypes/shapes: the lax.scan carry contract
    assert st2.template_masks.dtype == state.template_masks.dtype
    assert st2.decoder_state.dtype == state.decoder_state.dtype
    assert st2.template_masks.shape == state.template_masks.shape
    # a second step must be traceable with the first step's output state
    out2, st3 = model.apply(vs, frame, pm, pv, tf_, tv, st2)
    assert st3.template_masks.dtype == jnp.bfloat16
    # padded-row exact zero survives bf16
    tv_pad = tv.at[:, -1].set(False)
    out3, _ = model.apply(vs, frame, pm, pv, tf_, tv_pad, state)
    assert float(jnp.abs(out3.agg_masks[:, -1]).max()) == 0.0


def test_stride4_residency_close_to_full():
    """mask_res=stride4: logits stay full-res, agg/templates live at H/4,
    and outputs agree with the full-res path to boundary tolerance
    (aggregation is linear, so stride-4 aggregation == resized full-res
    aggregation up to resize-of-resize blur in the cost masks)."""
    from dmm_net_tpu.models.dmm import mask_hw

    cfg_f = _cfg("float32")
    cfg_s = cfg_f.override(**{"model.mask_res": "stride4"})
    frame, pm, pv, tf_, tv, tm = _inputs(cfg_f)
    H, W = cfg_f.model.image_size
    model_f, model_s = DMMNet(cfg_f), DMMNet(cfg_s)
    vs = model_f.init(jax.random.PRNGKey(0), frame, pm, pv, tf_, tv,
                      init_frame_state(cfg_f, tm))
    out_f, st_f = model_f.apply(vs, frame, pm, pv, tf_, tv,
                                init_frame_state(cfg_f, tm))
    st0 = init_frame_state(cfg_s, tm)
    assert st0.template_masks.shape[-2:] == (H // 4, W // 4)
    out_s, st_s = model_s.apply(vs, frame, pm, pv, tf_, tv, st0)
    assert out_s.logits.shape == out_f.logits.shape          # full-res
    assert out_s.agg_masks.shape[-2:] == mask_hw(cfg_s)      # stride-4
    assert st_s.template_masks.shape[-2:] == mask_hw(cfg_s)
    # assignments from slightly blurrier cost masks: close, not exact
    assert np.max(np.abs(np.asarray(out_f.assignment)
                         - np.asarray(out_s.assignment))) < 0.1
    # stride-4 agg == full-res agg downsampled (linearity), up to the
    # assignment difference above
    agg_f_s4 = jax.image.resize(out_f.agg_masks,
                                out_f.agg_masks.shape[:2] + mask_hw(cfg_s),
                                method="bilinear")
    assert np.percentile(np.abs(np.asarray(agg_f_s4)
                                - np.asarray(out_s.agg_masks)), 99) < 0.1
    # (label-level agreement is only meaningful with trained weights —
    # untrained logits are near-zero noise and argmax flips everywhere;
    # the trained-weights A/B measured J&F 0.8240 stride4 vs 0.8245 full)


def test_paste_masks_dtype():
    from dmm_net_tpu.models.proposal.maskrcnn import paste_masks
    rng = np.random.RandomState(0)
    m28 = jnp.asarray(rng.rand(3, 28, 28), jnp.float32)
    boxes = jnp.asarray([[2.0, 2.0, 30.0, 40.0],
                         [10.0, 5.0, 50.0, 60.0],
                         [0.0, 0.0, 64.0, 64.0]], jnp.float32)
    valid = jnp.asarray([True, True, False])
    f32 = paste_masks(m28, boxes, valid, (64, 64))
    b16 = paste_masks(m28, boxes, valid, (64, 64), dtype=jnp.bfloat16)
    assert f32.dtype == jnp.float32 and b16.dtype == jnp.bfloat16
    # thresholded binary masks: dtype changes representation, not values
    np.testing.assert_array_equal(np.asarray(f32),
                                  np.asarray(b16, np.float32))
