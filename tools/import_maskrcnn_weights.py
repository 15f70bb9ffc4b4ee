#!/usr/bin/env python3
"""Import torchvision `maskrcnn_resnet50_fpn` weights into the flax
proposal net (models/proposal/maskrcnn.MaskRCNN).

The reference's proposal stage is maskrcnn-benchmark R-50-FPN
(SURVEY.md §4.3); torchvision's maskrcnn_resnet50_fpn is its maintained
descendant with the same architecture, and its checkpoint layout is the
one publicly distributed. Mapping:

  backbone.body.*                  -> backbone (via tools/import_torch_weights)
  backbone.fpn.inner_blocks.{i}    -> fpn lateral_c{i+2}
  backbone.fpn.layer_blocks.{i}    -> fpn post_p{i+2}
  rpn.head.conv / cls_logits / bbox_pred  -> rpn
  roi_heads.box_head.fc6/fc7       -> box_head fc6/fc7
  roi_heads.box_predictor.*        -> box_head cls_score/bbox_pred
  roi_heads.mask_head.mask_fcn{i}  -> mask_head mask_fcn{i}
  roi_heads.mask_predictor.*       -> mask_head conv5_mask/mask_fcn_logits

Usage:
  python tools/import_maskrcnn_weights.py --pth maskrcnn.pth --out mrcnn.msgpack
"""

import argparse
import os
import sys
from typing import Dict, Mapping, Tuple

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.import_torch_weights import load_torch_resnet  # noqa: E402


def _t(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))       # OIHW -> HWIO


def _t_deconv(w: np.ndarray) -> np.ndarray:
    # torch ConvTranspose2d weight is (in, out, kh, kw) with gradient-
    # derived (flipped-kernel) semantics; flax nn.ConvTranspose defaults to
    # transpose_kernel=False (unflipped correlation), so the spatial dims
    # must be flipped in addition to the layout transpose.
    return np.transpose(w, (2, 3, 0, 1))[::-1, ::-1].copy()


def _dense(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (1, 0))             # (out, in) -> (in, out)


def _dense_from_chw(w: np.ndarray, c: int, h: int, ww: int) -> np.ndarray:
    """Dense layer consuming flattened conv features: torch flattens
    (C, H, W), flax flattens (H, W, C) — reorder the input axis."""
    out = w.shape[0]
    w = w.reshape(out, c, h, ww).transpose(0, 2, 3, 1).reshape(out, -1)
    return np.transpose(w, (1, 0))


def _get(sd: Mapping[str, np.ndarray], *names: str) -> np.ndarray:
    """First present key (torchvision renamed conv containers across
    versions: 'rpn.head.conv.weight' vs 'rpn.head.conv.0.0.weight')."""
    for n in names:
        if n in sd:
            return sd[n]
    raise KeyError(f"none of {names} in state dict")


def load_torchvision_maskrcnn(state_dict: Mapping[str, np.ndarray]
                              ) -> Tuple[Dict, Dict]:
    """Returns (params, batch_stats) for models/proposal/maskrcnn.MaskRCNN."""
    sd = {k: np.asarray(v) for k, v in state_dict.items()}

    body = {k[len("backbone.body."):]: v for k, v in sd.items()
            if k.startswith("backbone.body.")}
    bb_params, bb_stats = load_torch_resnet(body, (3, 4, 6, 3),
                                            bottleneck=True)

    fpn: Dict = {}
    for i, lvl in enumerate(("c2", "c3", "c4", "c5")):
        fpn[f"lateral_{lvl}"] = {
            "kernel": _t(_get(sd, f"backbone.fpn.inner_blocks.{i}.weight",
                              f"backbone.fpn.inner_blocks.{i}.0.weight")),
            "bias": _get(sd, f"backbone.fpn.inner_blocks.{i}.bias",
                         f"backbone.fpn.inner_blocks.{i}.0.bias")}
    for i, lvl in enumerate(("p2", "p3", "p4", "p5")):
        fpn[f"post_{lvl}"] = {
            "kernel": _t(_get(sd, f"backbone.fpn.layer_blocks.{i}.weight",
                              f"backbone.fpn.layer_blocks.{i}.0.weight")),
            "bias": _get(sd, f"backbone.fpn.layer_blocks.{i}.bias",
                         f"backbone.fpn.layer_blocks.{i}.0.bias")}

    rpn = {
        "conv": {"kernel": _t(_get(sd, "rpn.head.conv.weight",
                                   "rpn.head.conv.0.0.weight")),
                 "bias": _get(sd, "rpn.head.conv.bias",
                              "rpn.head.conv.0.0.bias")},
        "cls_logits": {"kernel": _t(sd["rpn.head.cls_logits.weight"]),
                       "bias": sd["rpn.head.cls_logits.bias"]},
        "bbox_pred": {"kernel": _t(sd["rpn.head.bbox_pred.weight"]),
                      "bias": sd["rpn.head.bbox_pred.bias"]},
    }

    box_head = {
        # fc6 consumes the flattened 7x7x256 ROI features: reorder CHW->HWC
        "fc6": {"kernel": _dense_from_chw(
                    sd["roi_heads.box_head.fc6.weight"], 256, 7, 7),
                "bias": sd["roi_heads.box_head.fc6.bias"]},
        "fc7": {"kernel": _dense(sd["roi_heads.box_head.fc7.weight"]),
                "bias": sd["roi_heads.box_head.fc7.bias"]},
        "cls_score": {"kernel": _dense(sd["roi_heads.box_predictor.cls_score.weight"]),
                      "bias": sd["roi_heads.box_predictor.cls_score.bias"]},
        "bbox_pred": {"kernel": _dense(sd["roi_heads.box_predictor.bbox_pred.weight"]),
                      "bias": sd["roi_heads.box_predictor.bbox_pred.bias"]},
    }

    mask_head = {}
    for i in range(1, 5):
        mask_head[f"mask_fcn{i}"] = {
            "kernel": _t(_get(sd, f"roi_heads.mask_head.mask_fcn{i}.weight",
                              f"roi_heads.mask_head.{i - 1}.0.weight")),
            "bias": _get(sd, f"roi_heads.mask_head.mask_fcn{i}.bias",
                         f"roi_heads.mask_head.{i - 1}.0.bias")}
    mask_head["conv5_mask"] = {
        "kernel": _t_deconv(sd["roi_heads.mask_predictor.conv5_mask.weight"]),
        "bias": sd["roi_heads.mask_predictor.conv5_mask.bias"]}
    mask_head["mask_fcn_logits"] = {
        "kernel": _t(sd["roi_heads.mask_predictor.mask_fcn_logits.weight"]),
        "bias": sd["roi_heads.mask_predictor.mask_fcn_logits.bias"]}

    params = {"backbone": bb_params, "fpn": fpn, "rpn": rpn,
              "box_head": box_head, "mask_head": mask_head}
    stats = {"backbone": bb_stats}
    return params, stats


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pth", required=True)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    import torch
    ckpt = torch.load(args.pth, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict) and "state_dict" in ckpt:
        ckpt = ckpt["state_dict"]
    sd = {k.replace("module.", ""): v.numpy() for k, v in ckpt.items()
          if hasattr(v, "numpy")}
    params, stats = load_torchvision_maskrcnn(sd)

    from flax import serialization
    with open(args.out, "wb") as f:
        f.write(serialization.msgpack_serialize(
            {"params": params, "batch_stats": stats}))
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
