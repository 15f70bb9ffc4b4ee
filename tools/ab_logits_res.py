#!/usr/bin/env python3
"""Quality A/B for model.logits_res on shipped flagship weights.

Loads a {"config","variables"} msgpack (e.g. runs/dmm448/dmm.msgpack),
scores held-out synthetic sequences at the flagship geometry under
logits_res="full" (decoder upsamples; legacy) vs "mask" (fused
upsample+argmax resolve, kernels/resolve.py) with the rest of the
production perf path (bf16 masks, stride-4 residency) held fixed.
Backs the DAYONE.md §5 claim that the fused resolve is quality-neutral."""
import argparse
import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default="runs/dmm448/dmm.msgpack")
    ap.add_argument("--seqs", type=int, default=6)
    ap.add_argument("--frames", type=int, default=6)
    ap.add_argument("--cpu", action="store_true",
                    help="force CPU (the tunnel's ~1-2 MB/s H2D makes "
                    "per-frame full-res proposal upload infeasible; the "
                    "kernel's compiled-TPU parity is checked separately "
                    "by bench.py and tools/tpu_resolve_parity)")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import numpy as np
    from flax import serialization

    from dmm_net_tpu.config import config_from_dict
    from dmm_net_tpu.data.synthetic import synthetic_sequence
    from dmm_net_tpu.eval.davis_jf import evaluate_sequence
    from dmm_net_tpu.infer.engine import InferenceEngine
    from dmm_net_tpu.models.dmm import DMMNet

    with open(args.ckpt, "rb") as f:
        blob = serialization.msgpack_restore(f.read())
    cfg0 = config_from_dict(blob["config"])
    variables = blob["variables"]
    H, W = cfg0.model.image_size
    print(f"ckpt={args.ckpt} image={H}x{W} backbone={cfg0.model.backbone}")

    def score(logits_res):
        cfg = dataclasses.replace(cfg0, model=dataclasses.replace(
            cfg0.model, mask_dtype="bfloat16", decoder_dtype="bfloat16",
            mask_res="stride4", logits_res=logits_res))
        eng = InferenceEngine(cfg, model=DMMNet(cfg), variables=variables,
                              update_templates=True)
        M = cfg.matching.max_templates
        jfs = []
        for s in range(args.seqs):
            seq = synthetic_sequence(seed=990 + s, T=args.frames, H=H, W=W,
                                     num_objects=2,
                                     num_proposals=cfg.matching.max_proposals)

            def pad_m(x):
                p = [(0, M - x.shape[0])] + [(0, 0)] * (x.ndim - 1)
                return np.pad(x, p)

            tm, tv = pad_m(seq["tmpl_masks"])[None], pad_m(seq["tmpl_valid"])[None]

            def stream():
                for t in range(args.frames):
                    yield {"frame": seq["frames"][t][None],
                           "prop_masks": seq["prop_masks"][t][None],
                           "prop_valid": seq["prop_valid"][t][None]}

            labels = eng.run_sequence(stream(), tm, tv,
                                      seq["frames"][0][None])["labels"][:, 0]
            gt = np.zeros_like(labels)
            for i in range(2):
                gt[seq["gt_masks"][:, i] > 0.5] = i + 1
            jfs.append(evaluate_sequence(gt, labels)["J&F"])
        return jfs

    per = {lr: score(lr) for lr in ("full", "mask")}
    for lr, jfs in per.items():
        print(f"logits_res={lr:4s}  held-out J&F = {float(np.mean(jfs)):.4f}  "
              f"per-seq {[round(x, 4) for x in jfs]}  "
              f"(backend={jax.default_backend()})")
    d = [m - f for f, m in zip(per["full"], per["mask"])]
    print(f"per-seq delta (mask - full): {[round(x, 4) for x in d]}")


if __name__ == "__main__":
    main()
