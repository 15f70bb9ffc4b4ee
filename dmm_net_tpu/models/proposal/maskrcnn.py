"""Mask R-CNN (R-50-FPN) proposal generator in flax — the TPU-native
equivalent of the reference's offline maskrcnn-benchmark stage
(SURVEY.md §4.3). Inference path, static shapes throughout:

    backbone(c2..c5) → FPN(p2..p6) → RPN head (objectness + deltas)
      → per-level top-k → joint NMS → K proposals
      → ROI-Align (all levels, level-mask select) → box head → class boxes
      → ROI-Align → mask head → 28x28 mask logits → paste to image

Differences from the CUDA reference, by design:
  * no dynamic proposal counts anywhere: every stage carries a fixed K
    with a validity mask (XLA static shapes);
  * NMS is the jit fixed-k greedy op (ops/nms.py) — no nms.cu;
  * ROI-Align is the dense gather formulation (ops/roi_pool.py) evaluated
    on every FPN level then blended by the level-assignment mask — trades
    4x flops on a tiny tensor for zero dynamic control flow (the
    TPU-friendly variant of fpn_level_mapper);
  * mask pasting is a vectorized bilinear resize into the padded image
    grid, not a per-box CPU paste loop.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from dmm_net_tpu.models.proposal.anchors import (
    clip_to_image,
    decode_boxes,
    generate_anchors,
    level_slices,
)
from dmm_net_tpu.models.proposal.fpn import FPN
from dmm_net_tpu.models.resnet import backbone_by_name
from dmm_net_tpu.ops.nms import nms_boxes
from dmm_net_tpu.ops.roi_pool import roi_align_mxu


class RPNHead(nn.Module):
    """Shared 3x3 conv + objectness/delta 1x1 heads (applied per level)."""

    num_anchors: int = 3
    channels: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        t = nn.relu(nn.Conv(self.channels, (3, 3), dtype=self.dtype,
                            param_dtype=jnp.float32, name="conv")(x))
        logits = nn.Conv(self.num_anchors, (1, 1), dtype=self.dtype,
                         param_dtype=jnp.float32, name="cls_logits")(t)
        deltas = nn.Conv(self.num_anchors * 4, (1, 1), dtype=self.dtype,
                         param_dtype=jnp.float32, name="bbox_pred")(t)
        return logits, deltas


class BoxHead(nn.Module):
    """2-FC box head (representation 1024), class + box outputs."""

    num_classes: int = 81
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):                         # (K, 7, 7, C)
        x = x.reshape(x.shape[0], -1)
        x = nn.relu(nn.Dense(1024, dtype=self.dtype, name="fc6")(x))
        x = nn.relu(nn.Dense(1024, dtype=self.dtype, name="fc7")(x))
        scores = nn.Dense(self.num_classes, dtype=self.dtype,
                          name="cls_score")(x)
        deltas = nn.Dense(self.num_classes * 4, dtype=self.dtype,
                          name="bbox_pred")(x)
        return scores, deltas


class MaskHead(nn.Module):
    """4-conv + deconv mask FCN head, 28x28 per-class logits."""

    num_classes: int = 81
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):                         # (K, 14, 14, C)
        for i in range(4):
            x = nn.relu(nn.Conv(256, (3, 3), dtype=self.dtype,
                                name=f"mask_fcn{i + 1}")(x))
        x = nn.relu(nn.ConvTranspose(256, (2, 2), strides=(2, 2),
                                     dtype=self.dtype, name="conv5_mask")(x))
        return nn.Conv(self.num_classes, (1, 1), dtype=self.dtype,
                       name="mask_fcn_logits")(x)  # (K, 28, 28, classes)


def _multilevel_roi_align(pyramid: Dict[str, jnp.ndarray], boxes: jnp.ndarray,
                          out_size: Tuple[int, int]) -> jnp.ndarray:
    """ROI-Align with FPN level assignment, static-shape variant: align on
    every level, then select per box by the canonical level formula
    lvl = floor(4 + log2(sqrt(area)/224)) clipped to [2, 5]."""
    areas = jnp.maximum((boxes[:, 2] - boxes[:, 0]) *
                        (boxes[:, 3] - boxes[:, 1]), 1e-6)
    lvl = jnp.floor(4.0 + jnp.log2(jnp.sqrt(areas) / 224.0 + 1e-9))
    lvl = jnp.clip(lvl, 2, 5).astype(jnp.int32)
    outs = []
    for i, name in enumerate(("p2", "p3", "p4", "p5")):
        stride = 2 ** (i + 2)
        feat = pyramid[name][0]                    # single image
        pooled = roi_align_mxu(feat, boxes, out_size=out_size,
                               sampling_ratio=2, spatial_scale=1.0 / stride)
        outs.append(pooled)
    stacked = jnp.stack(outs)                      # (4, K, oh, ow, C)
    sel = jax.nn.one_hot(lvl - 2, 4, axis=0)       # (4, K)
    return jnp.einsum("lkhwc,lk->khwc", stacked, sel)


class MaskRCNN(nn.Module):
    """Single-image inference Mask R-CNN. Static output sizes:
    pre_nms_top_n per level, post_nms_top_n proposals, max_detections."""

    image_size: Tuple[int, int] = (256, 448)
    backbone_name: str = "resnet50"
    num_classes: int = 81
    pre_nms_top_n: int = 256
    post_nms_top_n: int = 128
    max_detections: int = 64
    rpn_nms_thresh: float = 0.7
    box_nms_thresh: float = 0.5
    score_thresh: float = 0.05
    dtype: Any = jnp.float32
    # DCNv2 stages ("c3","c4","c5") for deformable-backbone configs
    # (SURVEY.md 15e); () matches the shipped plain R-50-FPN.
    deform_stages: Tuple[str, ...] = ()

    def setup(self):
        self.backbone = backbone_by_name(self.backbone_name, dtype=self.dtype,
                                         deform_stages=self.deform_stages)
        self.fpn = FPN(dtype=self.dtype)
        self.rpn = RPNHead(dtype=self.dtype)
        self.box_head = BoxHead(num_classes=self.num_classes, dtype=self.dtype)
        self.mask_head = MaskHead(num_classes=self.num_classes,
                                  dtype=self.dtype)
        self._anchors = jnp.asarray(generate_anchors(self.image_size))
        self._slices = level_slices(self.image_size)

    def __call__(self, image: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        """image (1, H, W, 3) float RGB in the distribution the weights
        were trained on — the in-repo trainers feed raw [0,1]; apply
        ImageNet normalization externally only for torch/COCO-lineage
        weights (tools/extract_proposals.py --input-norm). Returns dict:
        boxes (D, 4), scores (D,), classes (D,), masks (D, 28, 28),
        valid (D,) with D = max_detections."""
        feats = self.backbone(image)
        feats = {k: v.astype(jnp.float32) for k, v in feats.items()}
        pyramid = self.fpn(feats)

        # ---- RPN over levels ----
        obj_flat, delta_flat = [], []
        for name in ("p2", "p3", "p4", "p5", "p6"):
            logits, deltas = self.rpn(pyramid[name])
            obj_flat.append(logits.reshape(-1))
            delta_flat.append(deltas.reshape(-1, 4))
        obj = jnp.concatenate(obj_flat)
        deltas = jnp.concatenate(delta_flat, 0)

        # per-level top-k, then joint NMS
        cand_idx = []
        for (start, stop) in self._slices:
            k = min(self.pre_nms_top_n, stop - start)
            _, idx = jax.lax.top_k(obj[start:stop], k)
            cand_idx.append(idx + start)
        cand = jnp.concatenate(cand_idx)
        cand_boxes = decode_boxes(deltas[cand], self._anchors[cand])
        cand_boxes = clip_to_image(cand_boxes, self.image_size)
        cand_scores = obj[cand]
        # drop degenerate boxes
        wh_ok = ((cand_boxes[:, 2] - cand_boxes[:, 0] > 1e-3) &
                 (cand_boxes[:, 3] - cand_boxes[:, 1] > 1e-3))
        keep_idx, keep_mask = nms_boxes(cand_boxes, cand_scores, wh_ok,
                                        iou_threshold=self.rpn_nms_thresh,
                                        max_out=self.post_nms_top_n)
        safe = jnp.maximum(keep_idx, 0)
        proposals = cand_boxes[safe]              # (P, 4)
        prop_valid = keep_mask

        # ---- box head ----
        box_feats = _multilevel_roi_align(pyramid, proposals, (7, 7))
        cls_scores, box_deltas = self.box_head(box_feats)
        probs = jax.nn.softmax(cls_scores, -1)
        # best non-background class per proposal
        fg = probs[:, 1:]
        best_cls = jnp.argmax(fg, -1)             # 0-based fg class
        best_score = jnp.max(fg, -1) * prop_valid
        bd = box_deltas.reshape(-1, self.num_classes, 4)
        sel_deltas = jnp.take_along_axis(
            bd, (best_cls + 1)[:, None, None].repeat(4, -1), axis=1)[:, 0]
        det_boxes = clip_to_image(
            decode_boxes(sel_deltas, proposals, weights=(10., 10., 5., 5.)),
            self.image_size)

        # class-aware NMS via the batched-NMS trick: offset boxes by
        # class id x (image diagonal) so boxes of different classes never
        # overlap, then run one plain NMS (exactly per-class suppression)
        ok = best_score > self.score_thresh
        offset = (best_cls + 1).astype(jnp.float32)[:, None] * float(
            self.image_size[0] + self.image_size[1])
        d_idx, d_mask = nms_boxes(det_boxes + offset, best_score, ok,
                                  iou_threshold=self.box_nms_thresh,
                                  max_out=self.max_detections)
        dsafe = jnp.maximum(d_idx, 0)
        final_boxes = det_boxes[dsafe]
        final_scores = best_score[dsafe] * d_mask
        final_classes = (best_cls[dsafe] + 1) * d_mask

        # ---- mask head ----
        mask_feats = _multilevel_roi_align(pyramid, final_boxes, (14, 14))
        mask_logits = self.mask_head(mask_feats)  # (D, 28, 28, classes)
        sel = jax.nn.one_hot(final_classes, self.num_classes)
        masks = jnp.einsum("khwc,kc->khw", mask_logits, sel)

        return {"boxes": final_boxes, "scores": final_scores,
                "classes": final_classes, "masks": jax.nn.sigmoid(masks),
                "valid": d_mask}

    def train_forward(self, image: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        """Training-mode forward: raw RPN outputs over all anchors plus
        box/mask head outputs on the (stop-gradient) RPN proposals —
        everything models/proposal/losses.py consumes. Single image."""
        feats = self.backbone(image)
        feats = {k: v.astype(jnp.float32) for k, v in feats.items()}
        pyramid = self.fpn(feats)

        obj_flat, delta_flat = [], []
        for name in ("p2", "p3", "p4", "p5", "p6"):
            logits, deltas = self.rpn(pyramid[name])
            obj_flat.append(logits.reshape(-1))
            delta_flat.append(deltas.reshape(-1, 4))
        obj = jnp.concatenate(obj_flat)
        deltas = jnp.concatenate(delta_flat, 0)

        # proposals: same selection as inference, but gradients stop at the
        # boxes (standard two-stage training: heads don't backprop through
        # proposal coordinates)
        cand_idx = []
        for (start, stop) in self._slices:
            k = min(self.pre_nms_top_n, stop - start)
            _, idx = jax.lax.top_k(jax.lax.stop_gradient(obj[start:stop]), k)
            cand_idx.append(idx + start)
        cand = jnp.concatenate(cand_idx)
        cand_boxes = decode_boxes(jax.lax.stop_gradient(deltas)[cand],
                                  self._anchors[cand])
        cand_boxes = clip_to_image(cand_boxes, self.image_size)
        wh_ok = ((cand_boxes[:, 2] - cand_boxes[:, 0] > 1e-3) &
                 (cand_boxes[:, 3] - cand_boxes[:, 1] > 1e-3))
        keep_idx, keep_mask = nms_boxes(
            cand_boxes, jax.lax.stop_gradient(obj)[cand], wh_ok,
            iou_threshold=self.rpn_nms_thresh, max_out=self.post_nms_top_n)
        proposals = cand_boxes[jnp.maximum(keep_idx, 0)]
        prop_valid = keep_mask

        box_feats = _multilevel_roi_align(pyramid, proposals, (7, 7))
        cls_scores, box_deltas = self.box_head(box_feats)
        mask_feats = _multilevel_roi_align(pyramid, proposals, (14, 14))
        mask_logits = self.mask_head(mask_feats)

        return {"rpn_objectness": obj, "rpn_deltas": deltas,
                "anchors": self._anchors,
                "proposals": proposals, "prop_valid": prop_valid,
                "cls_scores": cls_scores, "box_deltas": box_deltas,
                "mask_logits": mask_logits}


def _paste_interp(coord: jnp.ndarray, m: int) -> jnp.ndarray:
    """Per-output-pixel bilinear row weights into an m-bin source axis.

    coord (..., P) continuous source coordinates; returns (..., P, m) with
    R[..., p, i] = bilinear weight of source bin i at output pixel p, and
    all-zero rows for pixels outside (-0.5, m - 0.5) (outside the box).
    Border semantics match ROI-Align edge-replication: coordinates in the
    half-pixel border clamp to the edge bin with full weight."""
    inside = (coord > -0.5) & (coord < m - 0.5)
    c0 = jnp.clip(jnp.floor(coord), 0, m - 1)
    d = jnp.clip(coord - c0, 0.0, 1.0)
    c0i = c0.astype(jnp.int32)
    c1i = jnp.clip(c0i + 1, 0, m - 1)
    R = ((1.0 - d)[..., None] * jax.nn.one_hot(c0i, m, dtype=jnp.float32)
         + d[..., None] * jax.nn.one_hot(c1i, m, dtype=jnp.float32))
    return R * inside[..., None]


def paste_masks(masks: jnp.ndarray, boxes: jnp.ndarray, valid: jnp.ndarray,
                image_size: Tuple[int, int],
                threshold: float = 0.5,
                dtype: jnp.dtype = jnp.float32) -> jnp.ndarray:
    """Paste (D, 28, 28) box masks into (D, H, W) image masks.

    Separable inverse-mapping: bilinear upsampling factors into
    independent row/column interpolations, so the paste is two MXU
    einsums per mask —

        out = R_v @ m @ R_u^T,   R_v (H, mh), R_u (W, mw)

    where R_v/R_u carry the per-box bilinear weights and zero rows for
    pixels outside the box (the product of a zero row with anything is 0,
    which reproduces the outside-box masking exactly). This replaces both
    the reference's per-box CPU Masker paste loop and a naive per-pixel
    gather formulation — gathers of 4*H*W scalars per mask lower
    catastrophically on TPU (measured ~1.4 s/frame at N=128, 256x448,
    vs sub-ms for the einsum form), while (H, mh) x (mh, mw) x (mw, W)
    matmuls are exactly what the MXU is for.

    Pixel i samples at its center i + 0.5 (same convention as roi_align /
    crop_gt_mask); sampling at the raw index would shift masks 0.5 px.

    `dtype` sets the output element type: callers on the bandwidth-bound
    inference path pass the config's mask_dtype (bf16) so the full-res
    masks are *written* at their travel dtype instead of being converted
    in a separate 59 MB/frame pass."""
    H, W = image_size
    D, mh, mw = masks.shape
    ys = jnp.arange(H, dtype=jnp.float32)[None, :]           # (1, H)
    xs = jnp.arange(W, dtype=jnp.float32)[None, :]           # (1, W)
    x1, y1 = boxes[:, 0][:, None], boxes[:, 1][:, None]
    bw = jnp.maximum(boxes[:, 2][:, None] - x1, 1e-3)
    bh = jnp.maximum(boxes[:, 3][:, None] - y1, 1e-3)
    u = (xs + 0.5 - x1) / bw * mw - 0.5                      # (D, W)
    v = (ys + 0.5 - y1) / bh * mh - 0.5                      # (D, H)
    Rv = _paste_interp(v, mh)                                # (D, H, mh)
    Ru = _paste_interp(u, mw)                                # (D, W, mw)
    t = jnp.einsum("dhi,dij->dhj", Rv, masks.astype(jnp.float32))
    out = jnp.einsum("dhj,dwj->dhw", t, Ru)
    out = jnp.where(valid[:, None, None], out, 0.0)
    return (out > threshold).astype(dtype)
