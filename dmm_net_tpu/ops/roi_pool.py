"""ROI / mask-feature pooling (SURVEY.md §3.1 component #6, §3.2 15b).

Two pooling primitives:

  * `mask_avg_pool` — mask-weighted average of a feature map: the pooled
    vector for object k is sum_hw(mask_k * feat) / sum_hw(mask_k). This is
    DMM-Net's per-mask feature (the paper pools features under each
    template/proposal mask). On TPU it is one einsum: (K, HW) @ (HW, C),
    MXU-shaped, batched over frames — no gather, no dynamic shapes.

  * `roi_align` — bilinear-sampled box pooling, the maskrcnn-benchmark
    ROIAlign (csrc/ROIAlign_*.cu) equivalent used by the proposal
    subsystem. Implemented as a dense gather formulation: for static
    (out_h, out_w, sampling) each output cell reads 4 corners per sample
    point via jnp.take along flattened HW — XLA lowers to dynamic-gather.
    A Pallas variant lives in kernels/roi_align.py for the hot path.

Both are jit/vmap-safe with static output shapes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_PRECISION = jax.lax.Precision.HIGHEST


def mask_avg_pool(feats: jnp.ndarray, masks: jnp.ndarray,
                  eps: float = 1e-6) -> jnp.ndarray:
    """Mask-weighted average pooling.

    feats: (..., H, W, C) feature map.
    masks: (..., K, h, w) soft masks (any resolution; resized to (H, W)).
    Returns (..., K, C). Empty masks give the zero vector.
    """
    H, W, C = feats.shape[-3:]
    if masks.shape[-2:] != (H, W):
        masks = jax.image.resize(
            masks, masks.shape[:-2] + (H, W), method="bilinear")
    m = masks.astype(jnp.float32).reshape(masks.shape[:-2] + (H * W,))
    f = feats.astype(jnp.float32).reshape(feats.shape[:-3] + (H * W, C))
    pooled = jnp.einsum("...kp,...pc->...kc", m, f, precision=_PRECISION)
    denom = jnp.sum(m, axis=-1, keepdims=True)
    return pooled / jnp.maximum(denom, eps)


def roi_align(feats: jnp.ndarray, boxes: jnp.ndarray,
              out_size: tuple[int, int] = (7, 7),
              sampling_ratio: int = 2,
              spatial_scale: float = 1.0) -> jnp.ndarray:
    """ROI-Align with bilinear sampling (aligned=True semantics: half-pixel
    offset, matching detectron2 / modern maskrcnn-benchmark).

    feats: (H, W, C) single feature map.
    boxes: (K, 4) as (x1, y1, x2, y2) in input coordinates.
    Returns (K, out_h, out_w, C).
    """
    H, W, C = feats.shape
    out_h, out_w = out_size
    s = sampling_ratio
    boxes = boxes.astype(jnp.float32) * spatial_scale
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    bw = jnp.maximum(x2 - x1, 1e-3)
    bh = jnp.maximum(y2 - y1, 1e-3)
    cell_w = bw / out_w
    cell_h = bh / out_h

    # sample grid: (out, s) offsets within the box, half-pixel aligned
    gx = (jnp.arange(out_w)[:, None] + (jnp.arange(s)[None, :] + 0.5) / s)
    gy = (jnp.arange(out_h)[:, None] + (jnp.arange(s)[None, :] + 0.5) / s)
    # absolute coords: (K, out, s); clamp sample positions to the map so
    # border boxes put full weight on the edge pixel (torch aligned
    # semantics — clamping only the *indices* would leak weight inward)
    sx = x1[:, None, None] + gx[None] * cell_w[:, None, None] - 0.5
    sy = y1[:, None, None] + gy[None] * cell_h[:, None, None] - 0.5
    sx = jnp.clip(sx, 0.0, W - 1.0)
    sy = jnp.clip(sy, 0.0, H - 1.0)

    def bilinear(yy, xx):
        """yy: (K, out_h, s), xx: (K, out_w, s) -> (K, out_h, s, out_w, s, C)"""
        y0 = jnp.floor(yy)
        x0 = jnp.floor(xx)
        wy1 = yy - y0
        wx1 = xx - x0
        y0i = jnp.clip(y0.astype(jnp.int32), 0, H - 1)
        y1i = jnp.clip(y0i + 1, 0, H - 1)
        x0i = jnp.clip(x0.astype(jnp.int32), 0, W - 1)
        x1i = jnp.clip(x0i + 1, 0, W - 1)
        flat = feats.reshape(H * W, C)

        def g(yi, xi):
            idx = yi[:, :, :, None, None] * W + xi[:, None, None, :, :]
            return jnp.take(flat, idx.reshape(idx.shape[0], -1), axis=0).reshape(
                idx.shape + (C,))

        wy1e = wy1[:, :, :, None, None, None]
        wx1e = wx1[:, None, None, :, :, None]
        out = (g(y0i, x0i) * (1 - wy1e) * (1 - wx1e)
               + g(y0i, x1i) * (1 - wy1e) * wx1e
               + g(y1i, x0i) * wy1e * (1 - wx1e)
               + g(y1i, x1i) * wy1e * wx1e)
        # zero out samples that fell outside the map (torch keeps clamped
        # border values for in-box samples; out-of-image handling below
        # matches aligned ROIAlign's clamping, so nothing to mask here)
        return out

    vals = bilinear(sy, sx)                       # (K, oh, s, ow, s, C)
    return vals.mean(axis=(2, 4))                 # average the s*s samples


def roi_align_batched(feats: jnp.ndarray, boxes: jnp.ndarray, **kw) -> jnp.ndarray:
    """feats (B, H, W, C), boxes (B, K, 4) -> (B, K, oh, ow, C)."""
    return jax.vmap(lambda f, b: roi_align(f, b, **kw))(feats, boxes)


# ---------------------------------------------------------------------------
# MXU-native ROI-Align: separable interpolation as two matmuls.
#
# Bilinear ROI-Align is separable: pooled[k] = A_y(k) @ feat @ A_x(k)^T,
# where A_y (out_h, H) / A_x (out_w, W) are per-ROI interpolation matrices
# (each row: bilinear weights of the s sample points averaged per output
# cell). On TPU this turns the gather-heavy CUDA formulation into two small
# matmuls per ROI — exactly what the MXU wants, and what SURVEY.md §3.2 15b
# calls for. The Pallas variant (kernels/roi_align.py) additionally keeps
# the level's feature map VMEM-resident across ALL ROIs (one HBM read total
# instead of one gather stream per ROI).
# ---------------------------------------------------------------------------

def _interp_matrix(start: jnp.ndarray, size: jnp.ndarray, out: int, s: int,
                   dim: int) -> jnp.ndarray:
    """Per-ROI 1D interpolation matrix (out, dim): rows average the s
    bilinear sample points of each output cell (aligned=True semantics)."""
    pos = start + (jnp.arange(out * s) + 0.5) / (out * s) * \
        jnp.maximum(size, 1e-3) - 0.5
    pos = jnp.clip(pos, 0.0, dim - 1.0)   # border clamp (torch semantics)
    p0 = jnp.floor(pos)
    d = pos - p0
    p0c = jnp.clip(p0.astype(jnp.int32), 0, dim - 1)
    p1c = jnp.clip(p0c + 1, 0, dim - 1)
    R = ((1.0 - d)[:, None] * jax.nn.one_hot(p0c, dim, dtype=jnp.float32)
         + d[:, None] * jax.nn.one_hot(p1c, dim, dtype=jnp.float32))
    return R.reshape(out, s, dim).mean(axis=1)


def roi_align_mxu(feats: jnp.ndarray, boxes: jnp.ndarray,
                  out_size: tuple[int, int] = (7, 7),
                  sampling_ratio: int = 2,
                  spatial_scale: float = 1.0) -> jnp.ndarray:
    """Separable-matmul ROI-Align. Same API/semantics as `roi_align`
    (aligned=True, border clamping); all FLOPs land on the MXU."""
    H, W, C = feats.shape
    oh, ow = out_size
    s = sampling_ratio
    b = boxes.astype(jnp.float32) * spatial_scale

    def one(box):
        Ay = _interp_matrix(box[1], box[3] - box[1], oh, s, H)   # (oh, H)
        Ax = _interp_matrix(box[0], box[2] - box[0], ow, s, W)   # (ow, W)
        t = jnp.einsum("yh,hwc->ywc", Ay, feats,
                       precision=_PRECISION)
        return jnp.einsum("xw,ywc->yxc", Ax, t, precision=_PRECISION)

    return jax.vmap(one)(b)
