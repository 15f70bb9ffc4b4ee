#!/usr/bin/env python3
"""Paired quality A/B over per-object decoder architectures.

The decoder dominates the production step (~4.6 ms of 6.9 ms at p3/B=8,
ROUND_NOTES r3 audit), and most of its per-object FLOPs sit in the
finest-level 3x3 convs at 25-50% MXU lane utilization. This driver trains
K architecture variants (obj_fuse mode x fine-level width taper) in ONE
process over the SAME precomputed synthetic pool / seed / LR schedule,
then scores each on the same held-out sequences — the paired protocol of
the r3 PGD-vs-Sinkhorn ablation (SURVEY.md §5.2 tier-7 proxy gate).

One process on purpose: TPU-tunnel compiles are expensive and killed runs
can wedge the relay; all variants share the data pool and exit cleanly.

Usage:
  python tools/ab_decoder_arch.py                 # default variant set
  python tools/ab_decoder_arch.py --variants base conv1 none taper \
      --steps 2000 --size 128 --backbone resnet34
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# name -> (decoder_obj_fuse, decoder_obj_dim_fine relative mode)
# taper values are halves of --obj-dim, resolved at runtime.
VARIANTS = {
    "base": {"decoder_obj_fuse": "conv3", "decoder_obj_dim_fine": 0},
    "conv1": {"decoder_obj_fuse": "conv1", "decoder_obj_dim_fine": 0},
    "none": {"decoder_obj_fuse": "none", "decoder_obj_dim_fine": 0},
    "taper": {"decoder_obj_fuse": "conv3", "decoder_obj_dim_fine": "half"},
    "none+taper": {"decoder_obj_fuse": "none", "decoder_obj_dim_fine": "half"},
    # r4 levers on top of the adopted taper (production = taper):
    # 1x1 fuse at every level (fatter-fewer candidate) and the SHARED
    # FPN path tapered at the finest level (its merge/fuse 3x3 convs are
    # the decoder's largest FLOP block)
    "conv1+taper": {"decoder_obj_fuse": "conv1",
                    "decoder_obj_dim_fine": "half"},
    # r5 lane-utilization levers stacked on the production conv1+taper
    # (bench fps at p3/B=16: conv1 2306.7, mergek1 2399.5, objc3 2757.9):
    "mergek1": {"decoder_obj_fuse": "conv1", "decoder_obj_dim_fine": "half",
                "decoder_obj_merge_fine_k": 1},
    "objc3": {"decoder_obj_fuse": "conv1", "decoder_obj_dim_fine": "half",
              "decoder_obj_fine_level": "c3"},
    "objc3+k1": {"decoder_obj_fuse": "conv1", "decoder_obj_dim_fine": "half",
                 "decoder_obj_fine_level": "c3",
                 "decoder_obj_merge_fine_k": 1},
    # shared stride-4 taper stacked on the adopted objc3 production
    # (bench 2793.6 vs 2755.9, +1.4%)
    "objc3+shared_half": {"decoder_obj_fuse": "conv1",
                          "decoder_obj_dim_fine": "half",
                          "decoder_obj_fine_level": "c3",
                          "decoder_dim_fine": "half_f"},
    # wider dynamic-mix basis: bench-neutral (2750.1 vs 2755.9), so any
    # quality gain would be free
    "objc3+detail32": {"decoder_obj_fuse": "conv1",
                       "decoder_obj_dim_fine": "half",
                       "decoder_obj_fine_level": "c3",
                       "decoder_detail_dim": 32},
    # pointwise basis conv (per-op profile: the 3x3 basis conv is the
    # step's largest single op; bench 2880.9 vs 2755.9, +4.5%)
    "objc3+basisk1": {"decoder_obj_fuse": "conv1",
                      "decoder_obj_dim_fine": "half",
                      "decoder_obj_fine_level": "c3",
                      "decoder_detail_basis_k": 1},
    "taper+shared_half": {"decoder_obj_fuse": "conv3",
                          "decoder_obj_dim_fine": "half",
                          "decoder_dim_fine": "half_f"},
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variants", nargs="*", default=list(VARIANTS))
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--size", type=int, default=128)
    ap.add_argument("--backbone", default="resnet34")
    ap.add_argument("--obj-dim", type=int, default=32)
    ap.add_argument("--seqs", type=int, default=8)
    ap.add_argument("--eval-frames", type=int, default=6)
    ap.add_argument("--objects", type=int, default=2)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--distinct-batches", type=int, default=64)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    unknown = [v for v in args.variants if v not in VARIANTS]
    if unknown:
        # validate BEFORE training anything: a typo in a later variant
        # must not waste the earlier variants' multi-thousand-step runs
        ap.error(f"unknown variants {unknown}; have {sorted(VARIANTS)}")

    from dmm_net_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import dataclasses

    import jax.numpy as jnp
    import numpy as np

    from dmm_net_tpu.config import (Config, DataConfig, MatchingConfig,
                                    ModelConfig, TrainConfig)
    from dmm_net_tpu.data.synthetic import (synthetic_clip_batch,
                                            synthetic_sequence)
    from dmm_net_tpu.eval.davis_jf import evaluate_sequence
    from dmm_net_tpu.infer.engine import InferenceEngine
    from dmm_net_tpu.models.dmm import DMMNet
    from dmm_net_tpu.train.loop import create_train_state, make_train_step

    S = args.size
    base_cfg = Config(
        name="ab_decoder_arch",
        model=ModelConfig(backbone=args.backbone, backbone_dtype="float32",
                          feature_dim=32, decoder_dim=32,
                          decoder_variant="shared",
                          decoder_obj_dim=args.obj_dim,
                          image_size=(S, S), template_update="aggregation"),
        matching=MatchingConfig(max_templates=4, max_proposals=8,
                                sinkhorn_iters=15, epsilon=0.03),
        data=DataConfig(dataset="synthetic", batch_size=4, clip_length=3),
        train=TrainConfig(lr=3e-4, warmup_steps=20, total_steps=args.steps,
                          loss_iou_weight=0.5),
    )
    print(f"devices: {jax.devices()}  backbone={args.backbone} size={S} "
          f"steps={args.steps} obj_dim={args.obj_dim}")

    def make_batch(seed):
        return {k: jnp.asarray(v) for k, v in synthetic_clip_batch(
            seed=seed, batch=base_cfg.data.batch_size,
            T=base_cfg.data.clip_length, H=S, W=S,
            num_objects=args.objects,
            num_proposals=base_cfg.matching.max_proposals,
            pad_objects=base_cfg.matching.max_templates).items()}

    batches = [make_batch(s) for s in range(args.distinct_batches)]
    eval_seqs = [synthetic_sequence(seed=990 + s, T=args.eval_frames,
                                    H=S, W=S, num_objects=args.objects,
                                    num_proposals=base_cfg.matching.max_proposals)
                 for s in range(args.seqs)]

    def run(name):
        kn = dict(VARIANTS[name])
        if kn["decoder_obj_dim_fine"] == "half":
            kn["decoder_obj_dim_fine"] = max(args.obj_dim // 2, 4)
        if kn.get("decoder_dim_fine") == "half_f":
            kn["decoder_dim_fine"] = max(base_cfg.model.decoder_dim // 2, 8)
        cfg = dataclasses.replace(
            base_cfg, model=dataclasses.replace(base_cfg.model, **kn))
        state = create_train_state(cfg, jax.random.PRNGKey(args.seed),
                                   batches[0])
        step = make_train_step(cfg)
        t0, tc = time.time(), None
        for i in range(args.steps):
            state, metrics = step(state, batches[i % len(batches)])
            if i == 0:
                jax.tree_util.tree_map(np.asarray, metrics)  # D2H barrier
                tc = time.time() - t0
                t0 = time.time()
        loss = float(np.asarray(metrics["loss"]))
        sps = (args.steps - 1) / (time.time() - t0)

        variables = {"params": state.params,
                     "batch_stats": state.batch_stats}
        eng = InferenceEngine(cfg, model=DMMNet(cfg), variables=variables,
                              update_templates=True)
        M = cfg.matching.max_templates
        jfs = []
        for seq in eval_seqs:
            def pad_m(x):
                p = [(0, M - x.shape[0])] + [(0, 0)] * (x.ndim - 1)
                return np.pad(x, p)
            tm = pad_m(seq["tmpl_masks"])[None]
            tv = pad_m(seq["tmpl_valid"])[None]

            def stream():
                for t in range(args.eval_frames):
                    yield {"frame": seq["frames"][t][None],
                           "prop_masks": seq["prop_masks"][t][None],
                           "prop_valid": seq["prop_valid"][t][None]}

            labels = eng.run_sequence(stream(), tm, tv,
                                      seq["frames"][0][None])["labels"][:, 0]
            gt = np.zeros_like(labels)
            for i in range(args.objects):
                gt[seq["gt_masks"][:, i] > 0.5] = i + 1
            jfs.append(evaluate_sequence(gt, labels)["J&F"])
        return {"jf": float(np.mean(jfs)), "per_seq": jfs, "loss": loss,
                "steps_per_s": sps, "compile_s": tc, "knobs": kn}

    results = {}
    for name in args.variants:
        print(f"\n=== {name} ===", flush=True)
        results[name] = r = run(name)
        print(f"{name}: J&F={r['jf']:.4f} loss={r['loss']:.4f} "
              f"steps/s={r['steps_per_s']:.1f} compile={r['compile_s']:.0f}s "
              f"per-seq {[round(x, 3) for x in r['per_seq']]}", flush=True)

    print("\n| variant | obj_fuse | g_fine | held-out J&F | steps/s |")
    print("|---|---|---|---|---|")
    for name, r in results.items():
        print(f"| {name} | {r['knobs']['decoder_obj_fuse']} | "
              f"{r['knobs']['decoder_obj_dim_fine'] or args.obj_dim} | "
              f"{r['jf']:.4f} | {r['steps_per_s']:.1f} |")


if __name__ == "__main__":
    main()
