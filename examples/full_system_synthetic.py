#!/usr/bin/env python3
"""Full-system synthetic benchmark: LEARNED proposals end to end.

The reference's production topology (SURVEY.md §1, §4.3) is a two-stage
pipeline: an offline Mask R-CNN produces mask proposals, and DMM-Net
matches/refines them. Every quality number so far evaluated DMM with the
*planted* (GT-jittered) proposals the synthetic generator emits. This
script closes the loop with no GT in the proposal path:

  frames -> trained Mask R-CNN -> paste_masks -> top-N proposals
         -> DMM matcher/decoder -> labels -> J&F

and reports, over held-out synthetic videos:
  * J&F with DETECTOR proposals  (the production topology)
  * J&F with PLANTED proposals   (the upper bound the generator gives)
  * per-frame proposal recall@0.5 of the detector vs video GT

Weights come from:
  * --dmm   : examples/train_and_eval_synthetic.py --save   (DMM + config)
  * --mrcnn : train_proposal.py --save (optionally fine-tuned on video-
              domain frames with --data video --init <detection weights> —
              the synthetic analog of the reference's COCO->YT-VOS
              detector fine-tune)

Usage:
  python examples/full_system_synthetic.py --dmm runs/dmm128/dmm.msgpack \
      --mrcnn runs/proposal_video/mrcnn.msgpack [--eval-seqs 8] [--frames 8]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dmm", required=True)
    ap.add_argument("--mrcnn", required=True)
    ap.add_argument("--mrcnn-backbone", default="resnet18")
    ap.add_argument("--mrcnn-classes", type=int, default=3)
    ap.add_argument("--eval-seqs", type=int, default=8)
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--seed0", type=int, default=5000,
                    help="first sequence seed (held out: training pools use "
                    "seeds < distinct_batches and >= 10000 for detection)")
    ap.add_argument("--score-thresh", type=float, default=0.05)
    ap.add_argument("--chunk", type=int, default=4,
                    help="frames per scan chunk (the eval dispatches through "
                    "run_stream_chunked with compact proposals — tunnel-safe)")
    ap.add_argument("--min-jf", type=float, default=0.0,
                    help="exit nonzero if mean detector-proposal J&F falls "
                    "below this (regen_artifacts.sh gate: a broken artifact "
                    "pair must fail the script, ADVICE r3 #1)")
    ap.add_argument("--min-recall", type=float, default=0.0,
                    help="exit nonzero if mean proposal recall@0.5 falls "
                    "below this")
    args = ap.parse_args()

    from dmm_net_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from flax import serialization

    from dmm_net_tpu.config import config_from_dict
    from dmm_net_tpu.data.synthetic import synthetic_sequence
    from dmm_net_tpu.eval.davis_jf import evaluate_sequence
    from dmm_net_tpu.infer.engine import InferenceEngine
    from dmm_net_tpu.models.dmm import DMMNet
    from dmm_net_tpu.models.proposal.maskrcnn import MaskRCNN, paste_masks

    with open(args.dmm, "rb") as f:
        blob = serialization.msgpack_restore(f.read())
    cfg = config_from_dict(blob["config"])
    dmm_vars = blob["variables"]
    H, W = cfg.model.image_size
    M, N = cfg.matching.max_templates, cfg.matching.max_proposals

    det = MaskRCNN(image_size=(H, W), backbone_name=args.mrcnn_backbone,
                   num_classes=args.mrcnn_classes,
                   score_thresh=args.score_thresh, max_detections=N)
    with open(args.mrcnn, "rb") as f:
        det_vars = serialization.msgpack_restore(f.read())

    @jax.jit
    def detect(img, gt):
        """One frame -> COMPACT detections + device-side recall.

        Returns (boxes (D, 4), masks28 (D, 28, 28), valid (D,),
        best_iou (G,)): the compact form feeds the engine's chunked
        dispatch directly (no full-res masks ever cross the host
        boundary — the per-frame full-res H2D of the old path dies over
        the ~1-2 MB/s axon tunnel at flagship geometry), and recall@0.5
        is computed against GT on device so only a G-vector returns."""
        out = det.apply(det_vars, img)
        full = paste_masks(out["masks"], out["boxes"], out["valid"], (H, W))
        fb = (full > 0.5).astype(jnp.float32)           # (D, H, W)
        g = gt.astype(jnp.float32)                      # (G, H, W)
        inter = jnp.einsum("dhw,ghw->dg", fb, g)
        union = (fb.sum((1, 2))[:, None] + g.sum((1, 2))[None, :] - inter)
        iou = inter / jnp.maximum(union, 1.0)
        iou = jnp.where(out["valid"][:, None], iou, 0.0)
        return out["boxes"], out["masks"], out["valid"], iou.max(axis=0)

    engine = InferenceEngine(cfg, model=DMMNet(cfg), variables=dmm_vars,
                             update_templates=True)

    def pad_m(x, axis=0):
        p = [(0, 0)] * x.ndim
        p[axis] = (0, M - x.shape[axis])
        return np.pad(x, p)

    def run(seq, items):
        """items: per-frame compact proposal stream (tunnel-safe: the
        production run_stream_chunked dispatch — one K-frame lax.scan per
        H2D batch, proposals as boxes + 28x28 crops pasted on device)."""
        tmpl_masks = pad_m(seq["tmpl_masks"])[None]
        tmpl_valid = pad_m(seq["tmpl_valid"])[None]
        res = engine.run_stream_chunked(iter(items), tmpl_masks, tmpl_valid,
                                        seq["frames"][0][None],
                                        chunk=args.chunk)
        labels = res["labels"][:, 0]
        gt_labels = np.zeros_like(labels)
        m_live = seq["gt_masks"].shape[1]
        for i in range(m_live):
            gt_labels[seq["gt_masks"][:, i] > 0.5] = i + 1
        return evaluate_sequence(gt_labels, labels)

    from dmm_net_tpu.infer.compact import compact_stream

    rows = []
    for s in range(args.seed0, args.seed0 + args.eval_seqs):
        seq = synthetic_sequence(seed=s, T=args.frames, H=H, W=W,
                                 num_objects=2, num_proposals=N)
        # --- detector proposals, no GT in the loop -------------------
        T = seq["frames"].shape[0]
        det_items = []
        recalls = []
        for t in range(T):
            # MaskRCNN takes a batch-1 image but returns unbatched
            # (D, ...) detections (D = max_detections)
            gt_t = seq["gt_masks"][t] > 0.5
            boxes, m28, valid, best_iou = jax.device_get(
                detect(jnp.asarray(seq["frames"][t][None]),
                       jnp.asarray(gt_t)))
            det_items.append({"frame": seq["frames"][t][None],
                              "prop_boxes": boxes[None],
                              "prop_masks28": m28[None],
                              "prop_valid": valid[None]})
            live = gt_t.any(axis=(1, 2))
            recalls.append(((best_iou >= 0.5) & live).sum()
                           / max(live.sum(), 1))

        r_det = run(seq, det_items)
        r_gt = run(seq, compact_stream(seq["frames"], seq["prop_masks"],
                                       seq["prop_valid"]))
        rows.append((s, np.mean(recalls), r_det["J&F"], r_gt["J&F"]))
        print(f"seq {s}: recall@0.5={np.mean(recalls):.3f}  "
              f"J&F detector={r_det['J&F']:.3f}  planted={r_gt['J&F']:.3f}")

    rec = float(np.mean([r[1] for r in rows]))
    jf_det = float(np.mean([r[2] for r in rows]))
    jf_gt = float(np.mean([r[3] for r in rows]))
    print(f"\nmean over {len(rows)} held-out sequences:")
    print(f"  detector-proposal recall@0.5 : {rec:.3f}")
    print(f"  J&F with DETECTOR proposals  : {jf_det:.3f}")
    print(f"  J&F with PLANTED proposals   : {jf_gt:.3f}")
    if jf_det < args.min_jf or rec < args.min_recall:
        print(f"FAIL: detector-proposal J&F {jf_det:.3f} < {args.min_jf} "
              f"or recall {rec:.3f} < {args.min_recall}")
        sys.exit(1)
    print("OK")


if __name__ == "__main__":
    main()
