#!/usr/bin/env python3
"""End-to-end learning proof: train DMM-Net on synthetic clips, then run the
streaming inference engine with the trained weights and score DAVIS J&F.

Usage: python examples/train_and_eval_synthetic.py [--steps 300] [--size 64]

Expected: decoder J&F rises from ~0 (untrained) to >0.7 (it learns to
refine the matcher-aggregated masks), approaching the matcher-aggregation
score.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--size", type=int, default=64, help="image height")
    ap.add_argument("--width", type=int, default=0,
                    help="image width (0 = square --size x --size)")
    ap.add_argument("--eval-frames", type=int, default=6)
    ap.add_argument("--objects", type=int, default=2,
                    help="objects per synthetic video (train AND eval); "
                    "raise with matching.max_templates for the multi-"
                    "object W3 regime")
    ap.add_argument("--decoder-variant", default="shared",
                    choices=["shared", "legacy"])
    ap.add_argument("--obj-dim", type=int, default=16)
    ap.add_argument("--backbone", default="resnet18")
    ap.add_argument("--feature-dim", type=int, default=32)
    ap.add_argument("--decoder-dim", type=int, default=32)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--distinct-batches", type=int, default=64,
                    help="synthetic batches are precomputed once and "
                    "cycled, so long runs are device-bound, not host-bound")
    ap.add_argument("--save", default=None,
                    help="write the trained DMM variables as flax msgpack "
                    "(consumed by examples/full_system_synthetic.py)")
    ap.add_argument("--mrcnn", default=None,
                    help="train on DETECTOR proposals: replace the planted "
                    "(jittered-GT) proposals of every training batch with "
                    "detections from this Mask R-CNN msgpack — the "
                    "reference's actual training protocol (it trains on "
                    "cached Mask R-CNN proposals, SURVEY.md §1.1/§4.3)")
    ap.add_argument("--mrcnn-backbone", default="resnet18")
    ap.add_argument("--mrcnn-classes", type=int, default=4)
    ap.add_argument("--set", nargs="*", default=[],
                    help="dotted config overrides applied to the built "
                    "config, e.g. --set matching.solver=pgd "
                    "matching.pgd_iters=30 (the SURVEY §8.5 solver "
                    "ablation: the reference trains through unrolled "
                    "PGD+Dykstra; our default is Sinkhorn)")
    ap.add_argument("--eval-seqs", type=int, default=1,
                    help="held-out sequences to score (seeds 999, 998, ...)")
    ap.add_argument("--eval-chunk", type=int, default=4,
                    help="frames per scan chunk in the tunnel-safe eval")
    ap.add_argument("--min-jf", type=float, default=0.5,
                    help="quality gate: exit nonzero (and leave only a "
                    "*.unverified blob) if held-out J&F falls below this. "
                    "Makes shipping unmeasured weights impossible "
                    "(VERDICT r3 next #1)")
    ap.add_argument("--per-frame-eval", action="store_true",
                    help="legacy eval dispatch: run_sequence with full-res "
                    "proposal H2D per frame. The default eval routes "
                    "through run_stream_chunked with COMPACT proposals "
                    "(boxes + 28x28 crops pasted on device) — safe over "
                    "the ~1-2 MB/s axon tunnel where the per-frame "
                    "full-res path dies at flagship geometry")
    ap.add_argument("--ablate", action="store_true",
                    help="after training, score the SAME weights under "
                    "decode soft/argmax/hungarian and both template-update "
                    "sources (SURVEY.md §4.2 verify-flags; VERDICT r1 #8)")
    args = ap.parse_args()

    from dmm_net_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from dmm_net_tpu.config import (Config, DataConfig, MatchingConfig,
                                    ModelConfig, TrainConfig)
    from dmm_net_tpu.data.synthetic import synthetic_clip_batch, synthetic_sequence
    from dmm_net_tpu.eval.davis_jf import evaluate_sequence
    from dmm_net_tpu.infer.engine import InferenceEngine
    from dmm_net_tpu.models.dmm import DMMNet
    from dmm_net_tpu.train.loop import create_train_state, make_train_step

    S = args.size
    SW = args.width or S
    cfg = Config(
        name="train_and_eval",
        model=ModelConfig(backbone=args.backbone, backbone_dtype="float32",
                          feature_dim=args.feature_dim,
                          decoder_dim=args.decoder_dim,
                          decoder_variant=args.decoder_variant,
                          decoder_obj_dim=args.obj_dim,
                          image_size=(S, SW), template_update="aggregation"),
        matching=MatchingConfig(max_templates=4, max_proposals=8,
                                sinkhorn_iters=15, epsilon=0.03),
        data=DataConfig(dataset="synthetic", batch_size=4, clip_length=3),
        train=TrainConfig(lr=3e-4, warmup_steps=20, total_steps=args.steps,
                          loss_iou_weight=0.5),
    )
    if args.set:
        from dmm_net_tpu.utils.cli import parse_overrides
        cfg = cfg.override(**parse_overrides(args.set))
        print(f"overrides: {args.set}")
    print(f"devices: {jax.devices()}")

    def make_batch(seed):
        return {k: jnp.asarray(v) for k, v in synthetic_clip_batch(
            seed=seed, batch=cfg.data.batch_size, T=cfg.data.clip_length,
            H=S, W=SW, num_objects=args.objects,
            num_proposals=cfg.matching.max_proposals,
            pad_objects=cfg.matching.max_templates).items()}

    batches = [make_batch(s) for s in range(args.distinct_batches)]

    if args.mrcnn:
        # Reference protocol: the DMM trains against the proposal
        # distribution it will see at inference (cached detector output,
        # SURVEY.md §1.1/§4.3) — not an idealized jittered-GT set. The
        # r3 regen skipped this and trained on planted proposals only;
        # the day-one drill then collapsed (J&F 0.489) on the detector's
        # dilated soft-edged masks while scoring 0.95+ on planted — the
        # exact train/serve skew this flag exists to close.
        #
        # Everything stays ON DEVICE: batches are device-resident jnp
        # arrays, detection + paste + threshold run under one jit per
        # batch (lax.map keeps the detector's B=1 top-k semantics), and
        # the result replaces prop_masks in place. The old per-frame
        # device_get pulled ~3.7 MB x B x T x batches over the link —
        # GBs through the axon tunnel.
        from flax import serialization
        from dmm_net_tpu.models.proposal.maskrcnn import MaskRCNN, paste_masks
        N = cfg.matching.max_proposals
        det = MaskRCNN(image_size=(S, SW), backbone_name=args.mrcnn_backbone,
                       num_classes=args.mrcnn_classes, score_thresh=0.05,
                       max_detections=N)
        with open(args.mrcnn, "rb") as f:
            det_vars = serialization.msgpack_restore(f.read())

        @jax.jit
        def detect_batch(frames):            # (B, T, H, W, 3) on device
            def one(img):
                out = det.apply(det_vars, img[None])
                full = paste_masks(out["masks"], out["boxes"], out["valid"],
                                   (S, SW))
                order = jnp.argsort(-jnp.where(out["valid"], out["scores"],
                                               -jnp.inf))
                return ((full[order] > 0.5).astype(jnp.float32),
                        out["valid"][order])
            B_, T_ = frames.shape[:2]
            flat = frames.reshape((B_ * T_,) + frames.shape[2:])
            pm, pv = jax.lax.map(one, flat)
            return (pm.reshape((B_, T_) + pm.shape[1:]),
                    pv.reshape(B_, T_, -1))

        t_det = time.time()
        for b in batches:
            b["prop_masks"], b["prop_valid"] = detect_batch(b["frames"])
        jax.block_until_ready(batches[-1]["prop_masks"])
        print(f"replaced planted proposals with detector output for "
              f"{len(batches)} batches in {time.time() - t_det:.0f}s")
    state = create_train_state(cfg, jax.random.PRNGKey(args.seed), batches[0])
    step = make_train_step(cfg)
    t0 = time.time()
    for i in range(args.steps):
        state, metrics = step(state, batches[i % args.distinct_batches])
        if i == 0:
            print(f"first step (compile): {time.time() - t0:.1f}s")
            t0 = time.time()
        if (i + 1) % 50 == 0:
            print(f"step {i + 1}: loss={float(metrics['loss']):.4f}")
    sps = (args.steps - 1) / (time.time() - t0)
    print(f"steps/sec: {sps:.2f}")

    # ---- save (unverified until the eval gate passes) --------------------
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    saved_tmp = None
    if args.save:
        from flax import serialization
        os.makedirs(os.path.dirname(os.path.abspath(args.save)), exist_ok=True)
        # write immediately (a 20-min flagship train must survive an eval
        # crash), but under .unverified: the verified name appears only
        # after the quality gate below passes — unmeasured weights can
        # never ship under the artifact's real name (VERDICT r3 next #1)
        saved_tmp = args.save + ".unverified"
        with open(saved_tmp, "wb") as f:
            f.write(serialization.msgpack_serialize(
                {"config": cfg.to_dict(),
                 "variables": jax.device_get(variables)}))
        print(f"saved (unverified) DMM variables + config to {saved_tmp}")

    # ---- tunnel-safe eval: compact proposals + chunked scan --------------
    # run_stream_chunked ships boxes + 28x28 crops (~KBs/frame) and pastes
    # on device — the production dispatch bench.py measures, feasible over
    # the slow axon tunnel where per-frame full-res H2D dies.
    from dmm_net_tpu.infer.compact import compact_stream
    model = DMMNet(cfg)
    engine = InferenceEngine(cfg, model=model, variables=variables,
                             update_templates=True)
    M = cfg.matching.max_templates

    def pad_m(x, axis=0):
        p = [(0, 0)] * x.ndim
        p[axis] = (0, M - x.shape[axis])
        return np.pad(x, p)

    seq = None
    jfs = []
    for k in range(args.eval_seqs):
        seq = synthetic_sequence(seed=999 - k, T=args.eval_frames, H=S, W=SW,
                                 num_objects=args.objects,
                                 num_proposals=cfg.matching.max_proposals)
        tmpl_masks = pad_m(seq["tmpl_masks"])[None]
        tmpl_valid = pad_m(seq["tmpl_valid"])[None]
        if args.per_frame_eval:
            def stream():
                for t in range(args.eval_frames):
                    yield {"frame": seq["frames"][t][None],
                           "prop_masks": seq["prop_masks"][t][None],
                           "prop_valid": seq["prop_valid"][t][None]}
            res = engine.run_sequence(stream(), tmpl_masks, tmpl_valid,
                                      seq["frames"][0][None])
        else:
            res = engine.run_stream_chunked(
                compact_stream(seq["frames"], seq["prop_masks"],
                               seq["prop_valid"]),
                tmpl_masks, tmpl_valid, seq["frames"][0][None],
                chunk=args.eval_chunk)
        labels = res["labels"][:, 0]
        gt_labels = np.zeros_like(labels)
        for i in range(args.objects):
            gt_labels[seq["gt_masks"][:, i] > 0.5] = i + 1
        rk = evaluate_sequence(gt_labels, labels)
        jfs.append(rk)
        print(f"  eval seq {999 - k}: J&F={rk['J&F']:.3f} "
              f"(J={rk['J']:.3f} F={rk['F']:.3f})")
    r = {k: float(np.mean([x[k] for x in jfs])) for k in ("J", "F", "J&F")}
    print(f"decoder (trained {args.steps} steps) J&F = {r['J&F']:.3f} "
          f"(J={r['J']:.3f} F={r['F']:.3f}) over {args.eval_seqs} held-out "
          f"seq(s), {'per-frame' if args.per_frame_eval else 'chunked-compact'}"
          " eval")
    if saved_tmp is not None and r["J&F"] >= args.min_jf:
        os.replace(saved_tmp, args.save)
        print(f"quality gate passed (J&F {r['J&F']:.3f} >= {args.min_jf}); "
              f"verified blob at {args.save}")

    if args.ablate:
        import dataclasses

        def stream():   # ablation runs per-frame on the LAST eval sequence
            for t in range(args.eval_frames):
                yield {"frame": seq["frames"][t][None],
                       "prop_masks": seq["prop_masks"][t][None],
                       "prop_valid": seq["prop_valid"][t][None]}

        print("\n--- decode / template-update ablation (same weights) ---")
        for decode in ("soft", "argmax", "hungarian"):
            for tupd in ("aggregation", "decoder"):
                for upd in (True, False):
                    if not upd and tupd == "decoder":
                        continue  # template source irrelevant w/o updates
                    c = dataclasses.replace(
                        cfg,
                        matching=dataclasses.replace(cfg.matching,
                                                     decode=decode),
                        model=dataclasses.replace(cfg.model,
                                                  template_update=tupd))
                    eng = InferenceEngine(c, model=DMMNet(c),
                                          variables=variables,
                                          update_templates=upd)
                    rr = eng.run_sequence(stream(), tmpl_masks, tmpl_valid,
                                          seq["frames"][0][None])
                    lab = rr["labels"][:, 0]
                    ra = evaluate_sequence(gt_labels, lab)
                    print(f"decode={decode:9s} tmpl={tupd:11s} "
                          f"update={str(upd):5s} J&F={ra['J&F']:.3f} "
                          f"(J={ra['J']:.3f} F={ra['F']:.3f})")

    if r["J&F"] < args.min_jf:
        print(f"FAIL: held-out J&F {r['J&F']:.3f} < --min-jf {args.min_jf}"
              + (f" (weights left at {saved_tmp}, NOT promoted)"
                 if saved_tmp else ""))
        sys.exit(1)
    print("OK")


if __name__ == "__main__":
    main()
