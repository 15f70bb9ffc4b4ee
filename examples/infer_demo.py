#!/usr/bin/env python3
"""Full-pipeline inference demo: synthetic moving-shape video -> streamed
per-frame inference -> DAVIS J&F score + palette PNG masks.

Usage: [JAX_PLATFORMS=cpu] python examples/infer_demo.py [--out /tmp/dmm_demo]

The model is *untrained*; the demo verifies the plumbing (matcher drives
aggregation; J&F of the matcher-aggregated masks against GT should be high
because synthetic proposals contain near-perfect candidates). It reports
both the aggregated-mask J&F (matcher quality, should be ~1) and the
decoder-output J&F (untrained, low).
"""

import argparse

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import os

import jax
import numpy as np

from dmm_net_tpu.config import Config, MatchingConfig, ModelConfig
from dmm_net_tpu.data.synthetic import synthetic_sequence
from dmm_net_tpu.eval.davis_jf import evaluate_sequence
from dmm_net_tpu.infer.engine import InferenceEngine
from dmm_net_tpu.models.dmm import DMMNet, FrameState, decoder_state_dim
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/dmm_demo")
    ap.add_argument("--size", type=int, default=64)
    ap.add_argument("--frames", type=int, default=6)
    args = ap.parse_args()

    cfg = Config(
        name="infer_demo",
        model=ModelConfig(backbone="resnet18", backbone_dtype="float32",
                          feature_dim=32, decoder_dim=16,
                          image_size=(args.size, args.size),
                          template_update="aggregation"),
        matching=MatchingConfig(max_templates=4, max_proposals=8,
                                sinkhorn_iters=20, epsilon=0.02),
    )
    seq = synthetic_sequence(seed=3, T=args.frames, H=args.size, W=args.size,
                             num_objects=2, num_proposals=8)
    M = cfg.matching.max_templates

    def pad_m(x, axis=0):
        pad = [(0, 0)] * x.ndim
        pad[axis] = (0, M - x.shape[axis])
        return np.pad(x, pad)

    model = DMMNet(cfg)
    B, H, W = 1, args.size, args.size
    tmpl_masks = pad_m(seq["tmpl_masks"])[None]
    tmpl_valid = pad_m(seq["tmpl_valid"])[None]
    state0 = FrameState(
        template_masks=jnp.asarray(tmpl_masks, jnp.float32),
        decoder_state=jnp.zeros((B, M, H // 32, W // 32, decoder_state_dim(cfg))))
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.asarray(seq["frames"][:1]),
                           jnp.asarray(seq["prop_masks"][:1]),
                           jnp.asarray(seq["prop_valid"][:1]),
                           jnp.zeros((B, M, cfg.model.feature_dim)),
                           jnp.asarray(tmpl_valid), state0)

    # template_update="aggregation": templates track object motion via the
    # matcher's own aggregated masks — the decoder is untrained here, so its
    # refined predictions can't be fed back yet.
    engine = InferenceEngine(cfg, model=model, variables=variables,
                             update_templates=True)

    def stream():
        for t in range(args.frames):
            yield {"frame": seq["frames"][t][None],
                   "prop_masks": seq["prop_masks"][t][None],
                   "prop_valid": seq["prop_valid"][t][None]}

    res = engine.run_sequence(stream(), tmpl_masks, tmpl_valid,
                              seq["frames"][0][None])
    labels = res["labels"][:, 0]                       # (T, H, W)

    # matcher quality: aggregate GT-planted proposals with the assignment
    X = res["assignments"][:, 0]                       # (T, M, N)
    agg = np.einsum("tmn,tnhw->tmhw", X, seq["prop_masks"])
    agg_labels = np.zeros((args.frames, H, W), np.int32)
    for t in range(args.frames):
        scores = np.concatenate([np.full((1, H, W), 0.5), agg[t, :2]], 0)
        agg_labels[t] = np.argmax(scores, 0)

    gt_labels = np.zeros_like(agg_labels)
    for i in range(2):
        gt_labels[seq["gt_masks"][:, i] > 0.5] = i + 1

    # oracle: aggregate using the *planted* optimal assignment — this is the
    # ceiling set by proposal jitter, independent of matcher quality
    oracle_labels = np.zeros_like(agg_labels)
    for t in range(args.frames):
        picks = seq["prop_masks"][t][seq["gt_assignment"][t]]
        scores = np.concatenate([np.full((1, H, W), 0.5), picks], 0)
        oracle_labels[t] = np.argmax(scores, 0)

    r_agg = evaluate_sequence(gt_labels, agg_labels)
    r_orc = evaluate_sequence(gt_labels, oracle_labels)
    r_dec = evaluate_sequence(gt_labels, labels)
    print(f"matcher-aggregated J&F = {r_agg['J&F']:.3f} "
          f"(J={r_agg['J']:.3f} F={r_agg['F']:.3f})")
    print(f"oracle-assignment  J&F = {r_orc['J&F']:.3f}  <- proposal ceiling")
    print(f"decoder (untrained) J&F = {r_dec['J&F']:.3f}")

    os.makedirs(args.out, exist_ok=True)
    for t in range(args.frames):
        engine.write_png(labels[t], os.path.join(args.out, f"{t:05d}.png"))
    print(f"wrote {args.frames} palette PNGs to {args.out}")
    # the matcher must recover (essentially) the oracle assignment
    assert r_agg["J&F"] > r_orc["J&F"] - 0.03, "matcher pipeline degraded"


if __name__ == "__main__":
    main()
