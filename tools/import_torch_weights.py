#!/usr/bin/env python3
"""Import torchvision-format ResNet weights into the flax backbone tree.

SURVEY.md §8.3 stage 3 / hard part #3: metric parity with the reference
without full retraining requires loading its released `.pth` backbone
(torchvision ResNet-50 layout, as used by the reference's feature
extractor). Layout mapping:

  torch OIHW conv kernels        -> flax HWIO       (transpose 2,3,1,0)
  torch bnX.{weight,bias}        -> flax BatchNorm {scale,bias}
  torch bnX.{running_mean,var}   -> flax batch_stats {mean,var}
  layer{i}.{j}.conv{k}           -> ResNet_/BottleneckBlock_{idx}/Conv_{k-1}
  layer{i}.{j}.downsample.{0,1}  -> conv_proj / norm_proj

Usage:
  python tools/import_torch_weights.py --pth resnet50.pth --out params.msgpack
  (also importable: `load_torch_resnet(state_dict, stage_sizes)`)

The .pth may be a raw state_dict or a checkpoint dict containing one.
Torch/COCO-lineage weights expect ImageNet-normalized inputs: run the DMM
with `--set model.input_norm=imagenet` (and extract_proposals with
`--input-norm imagenet`) — the in-repo raw01 default silently degrades
imported backbones just like raw weights degrade under imagenet inputs.
Verification: tools is covered by tests/test_weight_import.py, which
builds a torch-like state dict from random arrays, imports it, and checks
flax forward == a reference numpy conv/bn pipeline on the stem.
"""

import argparse
import os
import sys
from typing import Dict, Mapping, Tuple

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _t(w: np.ndarray) -> np.ndarray:
    """torch conv OIHW -> flax HWIO."""
    return np.transpose(w, (2, 3, 1, 0))


def load_torch_resnet(state_dict: Mapping[str, np.ndarray],
                      stage_sizes=(3, 4, 6, 3),
                      bottleneck: bool = True) -> Tuple[Dict, Dict]:
    """Convert a torchvision ResNet state_dict (numpy values) into
    (params, batch_stats) pytrees matching models/resnet.ResNet."""
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    params: Dict = {}
    stats: Dict = {}

    def put(tree, path, leaf):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = leaf

    def conv(flax_name, torch_prefix):
        put(params, (flax_name, "kernel"), _t(sd[f"{torch_prefix}.weight"]))

    def bn(flax_name, torch_prefix):
        put(params, (flax_name, "scale"), sd[f"{torch_prefix}.weight"])
        put(params, (flax_name, "bias"), sd[f"{torch_prefix}.bias"])
        put(stats, (flax_name, "mean"), sd[f"{torch_prefix}.running_mean"])
        put(stats, (flax_name, "var"), sd[f"{torch_prefix}.running_var"])

    conv("conv_init", "conv1")
    bn("bn_init", "bn1")

    block_cls = "BottleneckBlock" if bottleneck else "BasicBlock"
    n_convs = 3 if bottleneck else 2
    block_idx = 0
    for stage, n_blocks in enumerate(stage_sizes, start=1):
        for j in range(n_blocks):
            tp = f"layer{stage}.{j}"
            fb = f"{block_cls}_{block_idx}"
            sub_p: Dict = {}
            sub_s: Dict = {}
            for k in range(n_convs):
                sub_p[f"Conv_{k}"] = {
                    "kernel": _t(sd[f"{tp}.conv{k + 1}.weight"])}
                sub_p[f"BatchNorm_{k}"] = {
                    "scale": sd[f"{tp}.bn{k + 1}.weight"],
                    "bias": sd[f"{tp}.bn{k + 1}.bias"]}
                sub_s[f"BatchNorm_{k}"] = {
                    "mean": sd[f"{tp}.bn{k + 1}.running_mean"],
                    "var": sd[f"{tp}.bn{k + 1}.running_var"]}
            if f"{tp}.downsample.0.weight" in sd:
                sub_p["conv_proj"] = {
                    "kernel": _t(sd[f"{tp}.downsample.0.weight"])}
                sub_p["norm_proj"] = {
                    "scale": sd[f"{tp}.downsample.1.weight"],
                    "bias": sd[f"{tp}.downsample.1.bias"]}
                sub_s["norm_proj"] = {
                    "mean": sd[f"{tp}.downsample.1.running_mean"],
                    "var": sd[f"{tp}.downsample.1.running_var"]}
            params[fb] = sub_p
            stats[fb] = sub_s
            block_idx += 1

    return params, stats


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pth", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--arch", default="resnet50",
                    choices=["resnet18", "resnet34", "resnet50", "resnet101"])
    args = ap.parse_args()

    import torch
    ckpt = torch.load(args.pth, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict) and "state_dict" in ckpt:
        ckpt = ckpt["state_dict"]
    sd = {k.replace("module.", ""): v.numpy() for k, v in ckpt.items()
          if hasattr(v, "numpy")}
    stage_sizes = {"resnet18": (2, 2, 2, 2), "resnet34": (3, 4, 6, 3),
                   "resnet50": (3, 4, 6, 3), "resnet101": (3, 4, 23, 3)}
    bottleneck = args.arch in ("resnet50", "resnet101")
    params, stats = load_torch_resnet(sd, stage_sizes[args.arch], bottleneck)

    from flax import serialization
    blob = serialization.msgpack_serialize(
        {"params": params, "batch_stats": stats})
    with open(args.out, "wb") as f:
        f.write(blob)
    n = sum(x.size for x in np_tree_leaves(params))
    print(f"wrote {args.out}: {n / 1e6:.1f} M params")


def np_tree_leaves(tree):
    if isinstance(tree, dict):
        for v in tree.values():
            yield from np_tree_leaves(v)
    else:
        yield tree


if __name__ == "__main__":
    main()
