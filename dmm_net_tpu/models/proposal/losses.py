"""Proposal-network training losses (maskrcnn-benchmark rpn/loss.py +
roi_heads losses, re-expressed jit-safe with dense static shapes).

Differences from the CUDA lineage, by design:
  * anchor/proposal target assignment is computed densely for ALL anchors
    (one box-IoU matmul) instead of with random minibatch subsampling; the
    pos/neg balance is handled by normalizing each side separately
    (equivalent in expectation, deterministic, no host RNG);
  * smooth-L1 and BCE are plain jnp (XLA fuses); no SigmoidFocalLoss CUDA
    kernel needed (SURVEY.md 15d).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from dmm_net_tpu.models.proposal.anchors import encode_boxes
from dmm_net_tpu.ops.nms import box_iou


def smooth_l1(x: jnp.ndarray, beta: float = 1.0 / 9.0) -> jnp.ndarray:
    ax = jnp.abs(x)
    return jnp.where(ax < beta, 0.5 * ax * ax / beta, ax - 0.5 * beta)


def assign_anchors(anchors: jnp.ndarray, gt_boxes: jnp.ndarray,
                   gt_valid: jnp.ndarray,
                   pos_thresh: float = 0.7, neg_thresh: float = 0.3
                   ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-anchor labels: 1 = positive, 0 = negative, -1 = ignore.

    anchors (A, 4); gt_boxes (G, 4) padded; gt_valid (G,) bool.
    Returns (labels (A,), matched_gt (A,) int32)."""
    iou = box_iou(anchors, gt_boxes)                    # (A, G)
    iou = jnp.where(gt_valid[None, :], iou, -1.0)
    best_gt = jnp.argmax(iou, axis=1)
    best_iou = jnp.max(iou, axis=1)
    labels = jnp.where(best_iou >= pos_thresh, 1,
                       jnp.where(best_iou < neg_thresh, 0, -1))
    # force-match the best anchor of every valid gt (low-quality matches)
    best_anchor = jnp.argmax(iou, axis=0)               # (G,)
    labels = labels.at[best_anchor].set(
        jnp.where(gt_valid, 1, labels[best_anchor]))
    return labels, best_gt.astype(jnp.int32)


def rpn_loss(objectness: jnp.ndarray, deltas: jnp.ndarray,
             anchors: jnp.ndarray, gt_boxes: jnp.ndarray,
             gt_valid: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """objectness (A,), deltas (A, 4) vs padded GT."""
    labels, matched = assign_anchors(anchors, gt_boxes, gt_valid)
    pos = labels == 1
    neg = labels == 0
    obj_t = pos.astype(jnp.float32)
    per = optax.sigmoid_binary_cross_entropy(objectness, obj_t)
    n_pos = jnp.maximum(jnp.sum(pos), 1)
    n_neg = jnp.maximum(jnp.sum(neg), 1)
    cls_loss = (jnp.sum(jnp.where(pos, per, 0.0)) / n_pos +
                jnp.sum(jnp.where(neg, per, 0.0)) / n_neg) * 0.5

    targets = encode_boxes(gt_boxes[matched], anchors)
    reg = jnp.sum(smooth_l1(deltas - targets), axis=-1)
    reg_loss = jnp.sum(jnp.where(pos, reg, 0.0)) / n_pos
    return {"rpn_cls": cls_loss, "rpn_reg": reg_loss}


def assign_proposals(proposals: jnp.ndarray, prop_valid: jnp.ndarray,
                     gt_boxes: jnp.ndarray, gt_labels: jnp.ndarray,
                     gt_valid: jnp.ndarray, fg_thresh: float = 0.5
                     ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-proposal class targets (0 = background) + matched gt index."""
    iou = box_iou(proposals, gt_boxes)
    iou = jnp.where(gt_valid[None, :], iou, -1.0)
    best_gt = jnp.argmax(iou, axis=1)
    best_iou = jnp.max(iou, axis=1)
    cls_t = jnp.where((best_iou >= fg_thresh) & prop_valid,
                      gt_labels[best_gt], 0)
    return cls_t.astype(jnp.int32), best_gt.astype(jnp.int32)


def box_head_loss(cls_scores: jnp.ndarray, box_deltas: jnp.ndarray,
                  proposals: jnp.ndarray, prop_valid: jnp.ndarray,
                  gt_boxes: jnp.ndarray, gt_labels: jnp.ndarray,
                  gt_valid: jnp.ndarray,
                  box_weights=(10.0, 10.0, 5.0, 5.0)) -> Dict[str, jnp.ndarray]:
    """cls_scores (P, C), box_deltas (P, C*4)."""
    P, C = cls_scores.shape
    cls_t, matched = assign_proposals(proposals, prop_valid, gt_boxes,
                                      gt_labels, gt_valid)
    ce = optax.softmax_cross_entropy_with_integer_labels(cls_scores, cls_t)
    n_valid = jnp.maximum(jnp.sum(prop_valid), 1)
    cls_loss = jnp.sum(jnp.where(prop_valid, ce, 0.0)) / n_valid

    fg = (cls_t > 0) & prop_valid
    targets = encode_boxes(gt_boxes[matched], proposals,
                           weights=box_weights)
    bd = box_deltas.reshape(P, C, 4)
    sel = jnp.take_along_axis(bd, cls_t[:, None, None].repeat(4, -1),
                              axis=1)[:, 0]
    reg = jnp.sum(smooth_l1(sel - targets), axis=-1)
    n_fg = jnp.maximum(jnp.sum(fg), 1)
    reg_loss = jnp.sum(jnp.where(fg, reg, 0.0)) / n_fg
    return {"box_cls": cls_loss, "box_reg": reg_loss}


def crop_gt_mask(gt_mask: jnp.ndarray, box: jnp.ndarray,
                 out: int = 28) -> jnp.ndarray:
    """Bilinear crop of a full-image GT mask (H, W) to (out, out) inside
    `box` — the jit-safe equivalent of project_masks_on_boxes."""
    H, W = gt_mask.shape
    x1, y1, x2, y2 = box[0], box[1], box[2], box[3]
    xs = x1 + (jnp.arange(out) + 0.5) / out * jnp.maximum(x2 - x1, 1e-3)
    ys = y1 + (jnp.arange(out) + 0.5) / out * jnp.maximum(y2 - y1, 1e-3)
    xi = jnp.clip(xs - 0.5, 0, W - 1)
    yi = jnp.clip(ys - 0.5, 0, H - 1)
    x0 = jnp.floor(xi).astype(jnp.int32)
    y0 = jnp.floor(yi).astype(jnp.int32)
    x1i = jnp.minimum(x0 + 1, W - 1)
    y1i = jnp.minimum(y0 + 1, H - 1)
    dx = xi - x0
    dy = yi - y0
    g = gt_mask
    top = g[y0][:, x0] * (1 - dx)[None, :] + g[y0][:, x1i] * dx[None, :]
    bot = g[y1i][:, x0] * (1 - dx)[None, :] + g[y1i][:, x1i] * dx[None, :]
    return top * (1 - dy)[:, None] + bot * dy[:, None]


def mask_head_loss(mask_logits: jnp.ndarray, proposals: jnp.ndarray,
                   cls_t: jnp.ndarray, matched: jnp.ndarray,
                   gt_masks: jnp.ndarray) -> jnp.ndarray:
    """mask_logits (P, 28, 28, C); gt_masks (G, H, W). BCE on the matched
    class channel for foreground proposals."""
    P, mh, mw, C = mask_logits.shape
    sel = jnp.take_along_axis(
        mask_logits, cls_t[:, None, None, None].repeat(mh, 1).repeat(mw, 2),
        axis=3)[..., 0]                                  # (P, 28, 28)
    crops = jax.vmap(lambda m, b: crop_gt_mask(m, b, mh))(
        gt_masks[matched], proposals)
    per = optax.sigmoid_binary_cross_entropy(sel, crops).mean(axis=(1, 2))
    fg = cls_t > 0
    return jnp.sum(jnp.where(fg, per, 0.0)) / jnp.maximum(jnp.sum(fg), 1)
