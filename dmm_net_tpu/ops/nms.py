"""Padded fixed-k NMS, jit-compatible (SURVEY.md §3.2 component 15a).

The reference uses maskrcnn-benchmark's nms.cu (greedy suppression with
dynamic output count). TPU rebuild: greedy NMS is inherently sequential,
so we keep the sequential *selection* loop (K steps, K = max kept, small)
but make each suppression step a dense vector op over all N candidates —
`lax.fori_loop` over K with static shapes, no host sync, no dynamic
output: returns (keep_idx (K,) int32 padded with -1, keep_mask (K,) bool).

Two IoU backends:
  * `nms_boxes`: box IoU computed on the fly (N small, cheap);
  * `nms_masks`: takes a precomputed (N, N) mask-IoU matrix (one MXU
    matmul via ops.cost.mask_iou) — for mask proposals where box IoU is
    too loose.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def box_iou(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Pairwise IoU of (N, 4) and (M, 4) boxes (x1, y1, x2, y2)."""
    area_a = jnp.maximum(a[:, 2] - a[:, 0], 0) * jnp.maximum(a[:, 3] - a[:, 1], 0)
    area_b = jnp.maximum(b[:, 2] - b[:, 0], 0) * jnp.maximum(b[:, 3] - b[:, 1], 0)
    lt = jnp.maximum(a[:, None, :2], b[None, :, :2])
    rb = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = jnp.maximum(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    union = area_a[:, None] + area_b[None, :] - inter
    return inter / jnp.maximum(union, 1e-9)


def _greedy_nms(iou: jnp.ndarray, scores: jnp.ndarray, valid: jnp.ndarray,
                iou_threshold: float, max_out: int):
    """Shared greedy loop. iou (N, N), scores (N,), valid (N,) bool."""
    N = scores.shape[0]
    NEG = jnp.float32(-jnp.inf)

    def body(k, carry):
        live_scores, keep_idx, keep_mask = carry
        i = jnp.argmax(live_scores)
        ok = live_scores[i] > NEG
        keep_idx = keep_idx.at[k].set(jnp.where(ok, i, -1))
        keep_mask = keep_mask.at[k].set(ok)
        # suppress i itself and everything overlapping it
        suppress = (iou[i] > iou_threshold) | (
            jnp.arange(N) == i)
        live_scores = jnp.where(ok & suppress, NEG, live_scores)
        return live_scores, keep_idx, keep_mask

    live0 = jnp.where(valid, scores.astype(jnp.float32), NEG)
    init = (live0, jnp.full((max_out,), -1, jnp.int32),
            jnp.zeros((max_out,), bool))
    _, keep_idx, keep_mask = jax.lax.fori_loop(0, max_out, body, init)
    return keep_idx, keep_mask


@partial(jax.jit, static_argnames=("iou_threshold", "max_out"))
def nms_boxes(boxes: jnp.ndarray, scores: jnp.ndarray,
              valid: jnp.ndarray | None = None,
              iou_threshold: float = 0.5, max_out: int = 100):
    """Greedy box NMS. boxes (N, 4), scores (N,).

    Returns (keep_idx (max_out,) int32 padded -1, keep_mask (max_out,) bool).
    """
    if valid is None:
        valid = jnp.ones(scores.shape, bool)
    iou = box_iou(boxes, boxes)
    return _greedy_nms(iou, scores, valid, iou_threshold, max_out)


@partial(jax.jit, static_argnames=("iou_threshold", "max_out"))
def nms_masks(mask_iou_matrix: jnp.ndarray, scores: jnp.ndarray,
              valid: jnp.ndarray | None = None,
              iou_threshold: float = 0.5, max_out: int = 100):
    """Greedy NMS on a precomputed (N, N) mask-IoU matrix."""
    if valid is None:
        valid = jnp.ones(scores.shape, bool)
    return _greedy_nms(mask_iou_matrix, scores, valid, iou_threshold, max_out)
