"""Pairwise template-proposal cost matrix.

c_ij = lam * (1 - IoU(mask_i, mask_j)) + (1 - lam) * (1 - cos(f_i, f_j))

(reference paper arXiv:1909.12471 §3.2; SURVEY.md §3.1 component #7). The
reference computes mask IoU via cocoapi's C RLE codec on host; on TPU we
never touch RLE on device — masks are dense, downsampled soft masks in
[0, 1] laid out as (M, P) / (N, P) pixel matrices so that

    intersection = T @ P^T        (one MXU matmul)
    union        = area_t + area_p - intersection

and the cosine term is another matmul over L2-normalized features. Both
terms are therefore MXU-shaped; XLA fuses the elementwise fusion tail, and
the fused Pallas matcher kernel (kernels/matcher.py) computes the whole
cost in VMEM right before the solver iterations.

Soft-IoU on soft masks reduces to exact IoU when masks are binary.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-6
# Cost entries feed a low-temperature solver: sub-1e-3 noise in the cosine
# term visibly perturbs assignments, so pin full fp32 MXU passes here.
_PRECISION = jax.lax.Precision.HIGHEST


def mask_iou(tmpl_masks: jnp.ndarray, prop_masks: jnp.ndarray) -> jnp.ndarray:
    """Pairwise soft IoU.

    tmpl_masks: (..., M, P) in [0, 1]; prop_masks: (..., N, P) in [0, 1],
    P = flattened downsampled pixels. Returns (..., M, N).
    """
    t = tmpl_masks.astype(jnp.float32)
    p = prop_masks.astype(jnp.float32)
    inter = jnp.einsum("...mp,...np->...mn", t, p, precision=_PRECISION)
    area_t = jnp.sum(t, axis=-1)[..., :, None]
    area_p = jnp.sum(p, axis=-1)[..., None, :]
    union = area_t + area_p - inter
    return inter / jnp.maximum(union, _EPS)


def cosine_similarity(tmpl_feats: jnp.ndarray, prop_feats: jnp.ndarray) -> jnp.ndarray:
    """Pairwise cosine similarity. tmpl: (..., M, D), prop: (..., N, D) -> (..., M, N)."""
    t = tmpl_feats.astype(jnp.float32)
    p = prop_feats.astype(jnp.float32)
    # sqrt(sum + eps) keeps the gradient finite for all-zero (padded) rows;
    # plain norm has d||x||/dx = x/||x|| = 0/0 = NaN at x = 0, and the NaN
    # survives max(norm, eps) because 0 * NaN = NaN in the chain rule.
    t = t * jax.lax.rsqrt(jnp.sum(t * t, axis=-1, keepdims=True) + _EPS * _EPS)
    p = p * jax.lax.rsqrt(jnp.sum(p * p, axis=-1, keepdims=True) + _EPS * _EPS)
    return jnp.einsum("...md,...nd->...mn", t, p, precision=_PRECISION)


def cost_matrix(tmpl_masks: jnp.ndarray, prop_masks: jnp.ndarray,
                tmpl_feats: jnp.ndarray, prop_feats: jnp.ndarray,
                row_mask: jnp.ndarray | None = None,
                col_mask: jnp.ndarray | None = None,
                iou_weight: float = 0.3,
                pad_cost: float = 10.0) -> jnp.ndarray:
    """Fused cost: lam*(1-IoU) + (1-lam)*(1-cos). Padded pairs get pad_cost
    (large but finite so Sinkhorn's exp(-C/eps) underflows cleanly)."""
    iou = mask_iou(tmpl_masks, prop_masks)
    cos = cosine_similarity(tmpl_feats, prop_feats)
    C = iou_weight * (1.0 - iou) + (1.0 - iou_weight) * (1.0 - cos)
    if row_mask is not None and col_mask is not None:
        pair = row_mask[..., :, None] & col_mask[..., None, :]
        C = jnp.where(pair, C, pad_cost)
    return C
