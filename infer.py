#!/usr/bin/env python3
"""Inference + evaluation CLI (reference test.py equivalent, SURVEY.md §3.1 #12/#13).

Usage:
  python infer.py --preset p3_multi_object --davis-root /data/DAVIS \
                  [--ckpt runs/x/ckpt] [--out results/p3] [--sequences bike-packing]
  python infer.py --preset p4_ytvos_stream --dataset ytvos \
                  --ytvos-root /data/YouTubeVOS --out results/p4

DAVIS: per-sequence streaming inference, palette PNGs + results JSON with
J, F, J&F per sequence and overall (the driver metric, BASELINE.json:2).
YT-VOS: chunked-scan streaming inference (config #4), writes the official
submission tree (Annotations/<vid>/<stem>.png at original resolution).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="p3_multi_object")
    ap.add_argument("--set", nargs="*", default=[],
                    help="dot-path overrides, e.g. model.backbone=resnet18")
    ap.add_argument("--dataset", choices=["davis", "ytvos"], default="davis")
    ap.add_argument("--davis-root", default="/root/data/DAVIS")
    ap.add_argument("--ytvos-root", default="/root/data/YouTubeVOS")
    ap.add_argument("--chunk", type=int, default=8,
                    help="frames per scan chunk (ytvos streaming)")
    ap.add_argument("--split", default=None)
    ap.add_argument("--proposal-dir", default=None)
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--out", default="results/default")
    ap.add_argument("--sequences", nargs="*", default=None)
    ap.add_argument("--no-eval", action="store_true")
    ap.add_argument("--score-at-model-res", action="store_true",
                    help="legacy: score against GT resized to model "
                    "resolution instead of the protocol's native 480p")
    ap.add_argument("--no-template-update", action="store_true",
                    help="keep frame-1 template masks for the cost IoU "
                    "term instead of updating with the previous prediction")
    args = ap.parse_args()
    # decode choice (soft/argmax/hungarian) and template-update source
    # (decoder/aggregation) are config knobs:
    #   --set matching.decode=hungarian model.template_update=aggregation

    from dmm_net_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from dmm_net_tpu.config import preset
    from dmm_net_tpu.utils.cli import parse_overrides
    from dmm_net_tpu.data.davis import DavisDataset
    from dmm_net_tpu.data.pipeline import RingStager
    from dmm_net_tpu.eval.davis_jf import evaluate_sequence, upsample_labels
    from dmm_net_tpu.infer.engine import InferenceEngine
    from dmm_net_tpu.models.dmm import DMMNet, init_frame_state
    from dmm_net_tpu.utils.logging import get_logger

    log = get_logger("infer")
    cfg = preset(args.preset).override(**parse_overrides(getattr(args, "set")))
    if args.dataset == "davis":
        ds = DavisDataset(args.davis_root, split=args.split or "val",
                          image_size=cfg.model.image_size,
                          proposal_dir=args.proposal_dir,
                          max_objects=cfg.matching.max_templates,
                          max_proposals=cfg.matching.max_proposals)
        seqs = args.sequences or ds.sequences
        if not seqs:
            raise SystemExit(f"no sequences found under {args.davis_root}")
    else:
        from dmm_net_tpu.data.ytvos import YTVOSDataset
        ds = YTVOSDataset(args.ytvos_root, split=args.split or "valid",
                          image_size=cfg.model.image_size,
                          proposal_dir=args.proposal_dir,
                          max_objects=cfg.matching.max_templates,
                          max_proposals=cfg.matching.max_proposals)
        seqs = args.sequences or ds.videos
        if not seqs:
            raise SystemExit(f"no videos found under {args.ytvos_root}")

    model = DMMNet(cfg)
    H, W = cfg.model.image_size
    M = cfg.matching.max_templates
    N = cfg.matching.max_proposals

    # init or load variables
    rng = np.random.RandomState(0)
    state0 = init_frame_state(cfg, jnp.zeros((1, M, H, W), jnp.float32))
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, H, W, 3)),
                           jnp.zeros((1, N, H, W)), jnp.ones((1, N), bool),
                           jnp.zeros((1, M, cfg.model.feature_dim)),
                           jnp.ones((1, M), bool), state0)
    if args.ckpt:
        from dmm_net_tpu.train.loop import create_train_state  # noqa: F401
        from dmm_net_tpu.utils.checkpoint import Checkpointer
        import orbax.checkpoint as ocp
        ckpt = Checkpointer(args.ckpt)
        step = ckpt.latest_step()
        if step is None:
            raise SystemExit(f"no checkpoint found under {args.ckpt}")
        target = {"state": {"params": jax.tree.map(
            ocp.utils.to_shape_dtype_struct, variables["params"])}}
        # restore params only (inference needs no optimizer state)
        restored = ckpt.manager.restore(step, args=ocp.args.Composite(
            state=ocp.args.StandardRestore(target["state"])))
        variables = {**variables, "params": restored["state"]["params"]}
        log.info("loaded params from %s step %s", args.ckpt, step)

    engine = InferenceEngine(cfg, model=model, variables=variables,
                             update_templates=not args.no_template_update)

    from dmm_net_tpu.data.pipeline import normalize_frames  # noqa: F401
    results = {}
    total_frames = 0
    infer_seconds = 0.0
    for seq_name in seqs:
        sd = ds.sequence_stream(seq_name)
        stream = RingStager(sd["frames"], depth=2)
        if args.dataset == "ytvos":
            # chunked-scan streaming (config #4): one dispatch per K frames;
            # live_from/tmpl_frames gate mid-video objects correctly
            t0 = time.time()
            res = engine.run_stream_chunked(
                iter(stream), sd["tmpl_masks"], sd["tmpl_valid"],
                sd["first_frame"], chunk=args.chunk,
                live_from=sd["live_from"], tmpl_frames=sd["tmpl_frames"])
            infer_seconds += time.time() - t0
            labels = res["labels"][:, 0]
            total_frames += labels.shape[0]
            from dmm_net_tpu.data.ytvos import write_submission
            # the server wants a PNG for every frame listed in meta.json
            # (the valid split's Annotations/ holds only first frames)
            meta_objs = ds.meta.get(seq_name, {}).get("objects", {})
            meta_stems = sorted({s for od in meta_objs.values()
                                 for s in od.get("frames", [])})
            stems = meta_stems or sd["annotated_stems"] or sd["frame_stems"]
            pick = [sd["frame_stems"].index(s) for s in stems
                    if s in sd["frame_stems"]]
            # the server expects original-resolution PNGs
            full_size = None
            ann_dir = os.path.join(args.ytvos_root, args.split or "valid",
                                   "Annotations", seq_name)
            if os.path.isdir(ann_dir):
                from PIL import Image as _Image
                first = sorted(os.listdir(ann_dir))
                if first:
                    with _Image.open(os.path.join(ann_dir, first[0])) as im:
                        full_size = (im.height, im.width)
            write_submission(args.out, seq_name,
                             [sd["frame_stems"][i] for i in pick],
                             labels[pick], sd["object_ids"],
                             full_size=full_size)
            log.info("%s: %d frames -> submission", seq_name, labels.shape[0])
            continue
        t0 = time.time()
        res = engine.run_sequence(iter(stream), sd["tmpl_masks"],
                                  sd["tmpl_valid"], sd["first_frame"])
        infer_seconds += time.time() - t0
        labels = res["labels"][:, 0]
        total_frames += labels.shape[0]
        seq_out = os.path.join(args.out, seq_name)
        for t in range(labels.shape[0]):
            engine.write_png(labels[t], os.path.join(seq_out, f"{t:05d}.png"))
        if not args.no_eval:
            # Official protocol (SURVEY.md §4.5): score at the annotation's
            # NATIVE resolution — upsample predictions, never downsample GT.
            if args.score_at_model_res:
                gt = np.stack([ds.load_annotation(p)
                               for p in sd["annotations"]])
                pred = labels[:gt.shape[0]]
            else:
                gt = np.stack([ds.load_annotation_native(p)
                               for p in sd["annotations"]])
                pred = upsample_labels(labels[:gt.shape[0]], gt.shape[1:3])
            # remap GT ids to template slots 1..K
            remap = np.zeros(256, np.int32)
            for i, oid in enumerate(sd["object_ids"]):
                remap[oid] = i + 1
            gt_mapped = remap[gt]
            r = evaluate_sequence(gt_mapped, pred,
                                  object_ids=list(
                                      range(1, len(sd["object_ids"]) + 1)))
            results[seq_name] = {k: r[k] for k in
                                 ("J", "F", "J&F", "J_recall", "J_decay",
                                  "F_recall", "F_decay")}
            log.info("%s: J&F=%.3f", seq_name, r["J&F"])
    summary = {
        "sequences": results,
        "J": float(np.mean([r["J"] for r in results.values()])) if results else None,
        "F": float(np.mean([r["F"] for r in results.values()])) if results else None,
        "J&F": float(np.mean([r["J&F"] for r in results.values()])) if results else None,
        # inference-only rate (decode+engine; excludes eval + PNG writing)
        "fps": total_frames / max(infer_seconds, 1e-9),
        "frames": total_frames,
    }
    os.makedirs(args.out, exist_ok=True)
    with open(os.path.join(args.out, "results.json"), "w") as f:
        json.dump(summary, f, indent=2)
    log.info("overall: %s", {k: v for k, v in summary.items() if k != "sequences"})


if __name__ == "__main__":
    main()
