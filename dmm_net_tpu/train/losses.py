"""Mask losses (SURVEY.md §3.1 component #11).

Reference trains with pixel-wise BCE on per-object mask logits, with a
soft-IoU auxiliary (flagged verify in the survey; both are standard for
the RVOS lineage). Everything is mask-aware: padded objects and padded
frames contribute exactly zero loss and zero gradient.
"""

from __future__ import annotations

import jax.numpy as jnp
import optax


def mask_bce_loss(logits: jnp.ndarray, targets: jnp.ndarray,
                  valid: jnp.ndarray) -> jnp.ndarray:
    """Pixel-wise sigmoid BCE averaged over valid objects' pixels.

    logits, targets: (..., M, H, W); valid: (..., M) bool."""
    per_px = optax.sigmoid_binary_cross_entropy(logits, targets.astype(jnp.float32))
    per_obj = per_px.mean(axis=(-2, -1))
    v = valid.astype(jnp.float32)
    return jnp.sum(per_obj * v) / jnp.maximum(jnp.sum(v), 1.0)


def soft_iou_loss(logits: jnp.ndarray, targets: jnp.ndarray,
                  valid: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """1 - soft Jaccard, averaged over valid objects."""
    p = jnp.clip(jnp.exp(-jnp.logaddexp(0.0, -logits)), 0.0, 1.0)  # sigmoid
    t = targets.astype(jnp.float32)
    inter = jnp.sum(p * t, axis=(-2, -1))
    union = jnp.sum(p + t - p * t, axis=(-2, -1))
    iou = inter / jnp.maximum(union, eps)
    # empty-GT frames (object occluded / not yet present) have inter == 0
    # with zero gradient — a constant 1 that only mis-scales the loss; BCE
    # supervises those pixels, so mask them out of the IoU term
    nonempty = (jnp.sum(t, axis=(-2, -1)) > 0).astype(jnp.float32)
    v = valid.astype(jnp.float32) * nonempty
    return jnp.sum((1.0 - iou) * v) / jnp.maximum(jnp.sum(v), 1.0)


def clip_loss(logits: jnp.ndarray, targets: jnp.ndarray, valid: jnp.ndarray,
              bce_weight: float = 1.0, iou_weight: float = 0.5) -> jnp.ndarray:
    """Combined clip loss over (B, T, M, H, W) logits/targets, (B, M) valid.

    valid broadcasts over T; frames where an object hasn't appeared yet are
    still supervised against its (empty) GT mask, matching the reference's
    clip-BPTT training (SURVEY.md §4.1)."""
    v = valid[:, None, :] if valid.ndim == 2 else valid
    v = jnp.broadcast_to(v, logits.shape[:3])
    total = bce_weight * mask_bce_loss(logits, targets, v)
    if iou_weight:
        total = total + iou_weight * soft_iou_loss(logits, targets, v)
    return total
