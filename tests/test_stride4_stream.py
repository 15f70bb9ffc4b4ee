"""stride-4 residency through the gated streaming path (p4 shape).

Covers the mask_res=stride4 interaction with live_from gating and
compact proposals: the template carry lives at (H/4, W/4), the host's
full-res GT templates are resized+cast at the merge sites (_grid_like),
and compact proposals are pasted directly at the mask grid with
per-axis box scaling.
"""

import numpy as np
import jax
import jax.numpy as jnp

from dmm_net_tpu.config import preset
from dmm_net_tpu.infer.engine import InferenceEngine
from dmm_net_tpu.models.dmm import DMMNet, init_frame_state, mask_hw


def test_stride4_gated_compact_stream():
    cfg = preset("p4_ytvos_stream").override(**{
        "model.image_size": (64, 64), "model.backbone": "resnet18",
        "matching.max_templates": 4, "matching.max_proposals": 8,
        "matching.use_pallas": False})
    assert cfg.model.mask_res == "stride4"
    B, T = 1, 6
    H, W = cfg.model.image_size
    M, N = cfg.matching.max_templates, cfg.matching.max_proposals
    rng = np.random.RandomState(0)
    model = DMMNet(cfg)
    frame = jnp.asarray(rng.rand(B, H, W, 3), jnp.float32)
    pm = jnp.asarray(rng.rand(B, N, H, W) > 0.7, jnp.float32)
    pv = jnp.ones((B, N), bool)
    tm_full = np.asarray(rng.rand(B, M, H, W) > 0.7, np.float32)
    tv = np.ones((B, M), bool)
    state = init_frame_state(cfg, jnp.asarray(tm_full))
    assert state.template_masks.shape[-2:] == mask_hw(cfg)
    vs = model.init(jax.random.PRNGKey(0), frame, pm, pv,
                    jnp.zeros((B, M, cfg.model.feature_dim)), tv, state)
    eng = InferenceEngine(cfg, model=model, variables=vs,
                          update_templates=True)

    def stream():
        for _ in range(T):
            yield {"frame": np.asarray(rng.rand(B, H, W, 3), np.float32),
                   "prop_boxes": np.tile([4, 4, 40, 40],
                                         (B, N, 1)).astype(np.float32),
                   "prop_masks28": (rng.rand(B, N, 28, 28) > 0.5)
                   .astype(np.float32),
                   "prop_valid": np.ones((B, N), bool)}

    res = eng.run_stream_chunked(
        stream(), tm_full, tv,
        np.asarray(rng.rand(B, H, W, 3), np.float32), chunk=3,
        live_from=np.asarray([[0, 0, 2, 4]], np.int32),
        tmpl_frames=np.repeat(
            np.asarray(rng.rand(B, 1, H, W, 3), np.float32), M, axis=1))
    assert res["labels"].shape == (T, B, H, W)
    assert res["labels"].dtype == np.uint8
    # objects gated by live_from must not appear before their start frame
    assert not (res["labels"][0] == 3).any()   # object 3 lives from t=2
    assert not (res["labels"][:3] == 4).any()  # object 4 lives from t=4
