#!/usr/bin/env python3
"""Offline proposal extraction (reference stage 0, SURVEY.md §4.3).

Runs the flax Mask R-CNN over every frame of a DAVIS/YT-VOS split and
caches {boxes, scores, RLE masks} per frame as json — the exact format
dmm_net_tpu.data.{davis,ytvos} readers consume.

Usage:
  python tools/extract_proposals.py --dataset davis --root /data/DAVIS \
      --out /data/proposals [--params maskrcnn.msgpack] [--sequences a b]

Without --params the net runs with random weights (useful only for
pipeline plumbing tests; real caches need imported weights).
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", choices=["davis", "ytvos"], default="davis")
    ap.add_argument("--root", required=True)
    ap.add_argument("--split", default=None)
    ap.add_argument("--out", required=True)
    ap.add_argument("--params", default=None)
    ap.add_argument("--image-size", type=int, nargs=2, default=(256, 448))
    ap.add_argument("--backbone", default="resnet50")
    ap.add_argument("--num-classes", type=int, default=81,
                    help="must match the trained net (train_proposal.py "
                    "default is 3 for the synthetic detection set)")
    ap.add_argument("--max-detections", type=int, default=64)
    ap.add_argument("--score-thresh", type=float, default=0.05)
    ap.add_argument("--sequences", nargs="*", default=None)
    ap.add_argument("--input-norm", choices=["raw01", "imagenet"],
                    default="raw01",
                    help="input distribution the WEIGHTS were trained on. "
                    "Every in-repo trainer (train_proposal.py, the --mrcnn "
                    "fine-tune path) feeds raw [0,1] RGB, so raw01 is the "
                    "default; torch/COCO-imported weights expect "
                    "ImageNet-normalized inputs -> pass imagenet. Feeding "
                    "the wrong distribution silently wrecks detections "
                    "(caught by tests/test_dayone_cli.py)")
    args = ap.parse_args()

    from dmm_net_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from dmm_net_tpu.models.proposal.maskrcnn import MaskRCNN, paste_masks
    from dmm_net_tpu.ops import rle as rle_codec
    from dmm_net_tpu.utils.logging import get_logger

    log = get_logger("extract")
    H, W = args.image_size
    model = MaskRCNN(image_size=(H, W), backbone_name=args.backbone,
                     num_classes=args.num_classes,
                     score_thresh=args.score_thresh,
                     max_detections=args.max_detections)
    # host-CPU init (shape-only; eager init over the axon relay stalls —
    # see utils/hostinit)
    from dmm_net_tpu.utils.hostinit import host_init
    variables = host_init(lambda: model.init(
        jax.random.PRNGKey(0), np.zeros((1, H, W, 3), np.float32)))
    if args.params:
        from flax import serialization
        with open(args.params, "rb") as f:
            loaded = serialization.msgpack_restore(f.read())
        variables = {**variables, **loaded}
        log.info("loaded params from %s", args.params)
    else:
        log.warning("running with RANDOM weights — plumbing test only")

    @jax.jit
    def infer(img):
        out = model.apply(variables, img)
        full = paste_masks(out["masks"], out["boxes"], out["valid"], (H, W))
        return out["boxes"], out["scores"], out["valid"], full

    if args.dataset == "davis":
        from dmm_net_tpu.data.davis import DavisDataset
        ds = DavisDataset(args.root, split=args.split or "val",
                          image_size=(H, W))
        seqs = args.sequences or ds.sequences
        frame_lists = {s: ds.frame_paths(s) for s in seqs}
        load = ds.load_frame
    else:
        from dmm_net_tpu.data.ytvos import YTVOSDataset
        ds = YTVOSDataset(args.root, split=args.split or "valid",
                          image_size=(H, W))
        seqs = args.sequences or ds.videos
        frame_lists = {s: ds.frame_paths(s) for s in seqs}
        load = ds.load_frame

    from dmm_net_tpu.data.pipeline import IMAGENET_MEAN, IMAGENET_STD
    for seq in seqs:
        os.makedirs(os.path.join(args.out, seq), exist_ok=True)
        for fp in frame_lists[seq]:
            # cache key = raw frame STEM: on DAVIS stems equal the raw
            # index; on YT-VOS they diverge (frames every ~5th), and all
            # readers (sequence_stream, clip_batches) resolve by stem
            stem = os.path.splitext(os.path.basename(fp))[0]
            img = load(fp).astype(np.float32) / 255.0
            if args.input_norm == "imagenet":
                img = (img - IMAGENET_MEAN) / IMAGENET_STD
            boxes, scores, valid, masks = (
                np.asarray(x) for x in infer(jnp.asarray(img[None])))
            props = []
            for i in range(args.max_detections):
                if not valid[i]:
                    continue
                rle = rle_codec.encode(masks[i] > 0.5)
                props.append({
                    "bbox": boxes[i].tolist(),
                    "score": float(scores[i]),
                    "rle": {"size": [int(x) for x in rle["size"]],
                            "counts": rle["counts"].decode("latin1")},
                })
            with open(os.path.join(args.out, seq, f"{stem}.json"), "w") as f:
                json.dump(props, f)
        log.info("%s: %d frames", seq, len(frame_lists[seq]))


if __name__ == "__main__":
    main()
