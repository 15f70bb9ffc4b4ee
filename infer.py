#!/usr/bin/env python3
"""Inference + evaluation CLI (reference test.py equivalent, SURVEY.md §3.1 #12/#13).

Usage:
  python infer.py --preset p3_multi_object --davis-root /data/DAVIS \
                  [--ckpt runs/dmm448/dmm.msgpack] [--out results/p3]
  python infer.py --preset p4_ytvos_stream --dataset ytvos \
                  --ytvos-root /data/YouTubeVOS --out results/p4

Both datasets run the PRODUCTION chunked-scan dispatch by default — the
same jitted function bench.py measures (one K-frame lax.scan per device
dispatch; BASELINE.json:2's fps is produced by this exact code path).
`--per-frame` restores the one-dispatch-per-frame loop (required for the
Hungarian decode ablation). `--data-parallel` shards a batch of sequences
over all visible chips (sequences chip-local; no collectives).

DAVIS: palette PNGs + results JSON with J, F, J&F per sequence and overall
(the driver metric, BASELINE.json:2), scored at the annotation's native
resolution. YT-VOS: the official submission tree
(Annotations/<vid>/<stem>.png at original resolution).

--ckpt accepts either an orbax checkpoint directory (train.py output) or
a flax msgpack blob {"config", "variables"} (what
examples/train_and_eval_synthetic.py --save / full_system_synthetic.py
write — including the shipped flagship runs/dmm448/dmm.msgpack). A msgpack
blob carries its own model config, which becomes the base config (CLI
--set overrides still apply on top).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def load_msgpack_ckpt(path):
    """Load a flax msgpack blob {"config": ..., "variables": ...}."""
    from flax import serialization
    from dmm_net_tpu.config import config_from_dict
    with open(path, "rb") as f:
        blob = serialization.msgpack_restore(f.read())
    if not isinstance(blob, dict) or "variables" not in blob:
        raise SystemExit(f"{path}: not a DMM msgpack checkpoint "
                         "(expected {'config', 'variables'})")
    cfg = config_from_dict(blob["config"]) if "config" in blob else None
    return cfg, blob["variables"]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="p3_multi_object")
    ap.add_argument("--set", nargs="*", default=[],
                    help="dot-path overrides, e.g. model.backbone=resnet18")
    ap.add_argument("--dataset", choices=["davis", "ytvos"], default="davis")
    ap.add_argument("--davis-root", default="/root/data/DAVIS")
    ap.add_argument("--ytvos-root", default="/root/data/YouTubeVOS")
    ap.add_argument("--chunk", type=int, default=8,
                    help="frames per scan chunk (chunked dispatch)")
    ap.add_argument("--per-frame", action="store_true",
                    help="one device dispatch per frame instead of the "
                    "chunked scan (slower; needed for hungarian decode)")
    ap.add_argument("--data-parallel", action="store_true",
                    help="shard a batch of sequences over all visible "
                    "chips (mesh 'data' axis; sequences stay chip-local)")
    ap.add_argument("--split", default=None)
    ap.add_argument("--proposal-dir", default=None)
    ap.add_argument("--ckpt", default=None,
                    help="orbax checkpoint dir OR flax msgpack blob")
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
    from dmm_net_tpu.infer.batching import batch_sequence_streams
    from dmm_net_tpu.infer.engine import InferenceEngine
    from dmm_net_tpu.models.dmm import DMMNet, init_frame_state
    from dmm_net_tpu.utils.logging import get_logger

    log = get_logger("infer")

    # ---- config + weights -------------------------------------------------
    # A msgpack checkpoint pins the model geometry it was trained with; it
    # becomes the base config so day one is literally
    #   infer.py --ckpt runs/dmm448/dmm.msgpack --davis-root ...
    msgpack_ckpt = args.ckpt and os.path.isfile(args.ckpt)
    variables = None
    if msgpack_ckpt:
        ckpt_cfg, variables = load_msgpack_ckpt(args.ckpt)
        cfg = ckpt_cfg or preset(args.preset)
        log.info("loaded variables%s from %s",
                 "" if ckpt_cfg is None else " + config", args.ckpt)
    else:
        cfg = preset(args.preset)
    cfg = cfg.override(**parse_overrides(getattr(args, "set")))

    hungarian = cfg.matching.decode == "hungarian"
    if hungarian and not args.per_frame:
        log.info("hungarian decode requires per-frame dispatch; "
                 "forcing --per-frame")
        args.per_frame = True
    if args.per_frame and args.data_parallel:
        raise SystemExit("--per-frame and --data-parallel are exclusive "
                         "(the sharded path is the chunked scan)")

    mesh = None
    group_size = 1
    if args.data_parallel:
        from dmm_net_tpu.parallel.mesh import make_mesh
        mesh = make_mesh(data=len(jax.devices()))
        group_size = mesh.shape["data"]
        log.info("data-parallel inference over %d device(s)", group_size)

    # ---- dataset -----------------------------------------------------------
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

    # init (random) variables only when no msgpack blob supplied them —
    # on host CPU (eager init over the axon relay stalls; utils/hostinit)
    if variables is None:
        from dmm_net_tpu.utils.hostinit import host_init

        def _init():
            state0 = init_frame_state(
                cfg, jnp.zeros((1, M, H, W), jnp.float32))
            return model.init(jax.random.PRNGKey(0),
                              np.zeros((1, H, W, 3), np.float32),
                              np.zeros((1, N, H, W), np.float32),
                              np.ones((1, N), bool),
                              np.zeros((1, M, cfg.model.feature_dim),
                                       np.float32),
                              np.ones((1, M), bool), state0)

        variables = host_init(_init)
    if args.ckpt and not msgpack_ckpt:
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
                             update_templates=not args.no_template_update,
                             mesh=mesh)

    # ---- per-sequence-group loop -------------------------------------------
    def eval_davis(seq_name, labels, annotations, object_ids):
        if args.score_at_model_res:
            gt = np.stack([ds.load_annotation(p) for p in annotations])
            pred = labels[:gt.shape[0]]
        else:
            # Official protocol (SURVEY.md §4.5): score at the annotation's
            # NATIVE resolution — upsample predictions, never downsample GT.
            gt = np.stack([ds.load_annotation_native(p)
                           for p in annotations])
            pred = upsample_labels(labels[:gt.shape[0]], gt.shape[1:3])
        remap = np.zeros(256, np.int32)   # GT ids -> template slots 1..K
        for i, oid in enumerate(object_ids):
            remap[oid] = i + 1
        gt_mapped = remap[gt]
        r = evaluate_sequence(gt_mapped, pred,
                              object_ids=list(range(1, len(object_ids) + 1)))
        results[seq_name] = {k: r[k] for k in
                             ("J", "F", "J&F", "J_recall", "J_decay",
                              "F_recall", "F_decay")}
        log.info("%s: J&F=%.3f", seq_name, r["J&F"])

    def write_ytvos(seq_name, labels):
        from dmm_net_tpu.data.ytvos import write_submission
        # the server wants a PNG for every frame listed in meta.json
        # (the valid split's Annotations/ holds only first frames)
        sd0 = per_seq[seq_name]
        meta_objs = ds.meta.get(seq_name, {}).get("objects", {})
        meta_stems = sorted({s for od in meta_objs.values()
                             for s in od.get("frames", [])})
        stems = meta_stems or sd0["annotated_stems"] or sd0["frame_stems"]
        pick = [sd0["frame_stems"].index(s) for s in stems
                if s in sd0["frame_stems"]]
        full_size = None    # the server expects original-resolution PNGs
        ann_dir = os.path.join(args.ytvos_root, args.split or "valid",
                               "Annotations", seq_name)
        if os.path.isdir(ann_dir):
            from PIL import Image as _Image
            first = sorted(os.listdir(ann_dir))
            if first:
                with _Image.open(os.path.join(ann_dir, first[0])) as im:
                    full_size = (im.height, im.width)
        write_submission(args.out, seq_name,
                         [sd0["frame_stems"][i] for i in pick],
                         labels[pick], sd0["object_ids"],
                         full_size=full_size)
        log.info("%s: %d frames -> submission", seq_name, labels.shape[0])

    results = {}
    total_frames = 0
    infer_seconds = 0.0
    groups = [seqs[i:i + group_size] for i in range(0, len(seqs), group_size)]
    for group in groups:
        names = list(group)
        while len(names) < group_size:   # pad the last group (dups skipped)
            names.append(group[-1])
        # one stream dict PER LANE: a padded duplicate name must get its
        # own frames generator (batch_sequence_streams advances each lane's
        # iterator every timestep — two lanes sharing one generator would
        # interleave and exhaust it halfway)
        sds = [ds.sequence_stream(name) for name in names]
        per_seq = dict(zip(names, sds))   # static-metadata lookup only
        sd = batch_sequence_streams(sds)
        stream = RingStager(sd["frames"], depth=2)
        t0 = time.time()
        if args.per_frame:
            lf = sd.get("live_from")
            if lf is not None and np.any(np.asarray(lf) > 0):
                # run_sequence has no live_from gating: objects appearing
                # mid-video would get frame-0 template features and emit
                # garbage from frame 0. Refuse instead of silently
                # mis-scoring (the chunked default handles gating).
                raise SystemExit(
                    "--per-frame does not support mid-video objects "
                    "(live_from > 0 in this sequence group); use the "
                    "default chunked dispatch")
            res = engine.run_sequence(iter(stream), sd["tmpl_masks"],
                                      sd["tmpl_valid"], sd["first_frame"])
        else:
            res = engine.run_stream_chunked(
                iter(stream), sd["tmpl_masks"], sd["tmpl_valid"],
                sd["first_frame"], chunk=args.chunk,
                live_from=sd.get("live_from"),
                tmpl_frames=sd.get("tmpl_frames"))
        infer_seconds += time.time() - t0
        all_labels = res["labels"]        # (T_max, B, H, W)
        done = set()
        for b, seq_name in enumerate(names):
            if seq_name in done:
                continue
            done.add(seq_name)
            labels = all_labels[:sd["lengths"][b], b]
            total_frames += labels.shape[0]
            if args.dataset == "ytvos":
                write_ytvos(seq_name, labels)
                continue
            seq_out = os.path.join(args.out, seq_name)
            for t in range(labels.shape[0]):
                engine.write_png(labels[t],
                                 os.path.join(seq_out, f"{t:05d}.png"))
            if not args.no_eval:
                eval_davis(seq_name, labels,
                           per_seq[seq_name]["annotations"],
                           sd["object_ids"][b])
    summary = {
        "sequences": results,
        "J": float(np.mean([r["J"] for r in results.values()])) if results else None,
        "F": float(np.mean([r["F"] for r in results.values()])) if results else None,
        "J&F": float(np.mean([r["J&F"] for r in results.values()])) if results else None,
        # inference-only rate (decode+engine; excludes eval + PNG writing)
        "fps": total_frames / max(infer_seconds, 1e-9),
        "frames": total_frames,
        "dispatch": "per_frame" if args.per_frame else "chunked_scan",
        "chunk": None if args.per_frame else args.chunk,
        "data_parallel": group_size if args.data_parallel else None,
    }
    os.makedirs(args.out, exist_ok=True)
    with open(os.path.join(args.out, "results.json"), "w") as f:
        json.dump(summary, f, indent=2)
    log.info("overall: %s", {k: v for k, v in summary.items() if k != "sequences"})


if __name__ == "__main__":
    main()
