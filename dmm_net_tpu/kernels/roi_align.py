"""Pallas ROI-Align kernel (SURVEY.md §3.2 15b).

Design: the separable-interpolation formulation (ops/roi_pool.roi_align_mxu)
inside one kernel with the level's feature map held in VMEM across the
whole ROI grid — the map is read from HBM once total, not once per ROI:

    grid = (K,)                         # one program per ROI
    feat (H, W, C)    -> VMEM, same block every step (revisited, cached)
    boxes (K, 4)      -> VMEM, row k
    out  (K, oh, ow, C)

Per program: build A_y (oh, H) and A_x (ow, W) interpolation matrices from
the box scalars with broadcasted_iota + one_hot-free arithmetic, then two
MXU dot_generals. Falls back to interpret mode off-TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interp_rows(start, size, out: int, s: int, dim: int):
    """(out, dim) interpolation matrix built from vectorized arithmetic
    (no one_hot gather — compare-based, VPU-friendly)."""
    pos = start + (jax.lax.broadcasted_iota(jnp.float32, (out * s, 1), 0)
                   + 0.5) / (out * s) * jnp.maximum(size, 1e-3) - 0.5
    pos = jnp.clip(pos, 0.0, dim - 1.0)   # border clamp (torch semantics)
    p0 = jnp.floor(pos)
    d = pos - p0                                           # (out*s, 1)
    cols = jax.lax.broadcasted_iota(jnp.float32, (out * s, dim), 1)
    p0c = jnp.clip(p0, 0.0, dim - 1.0)
    p1c = jnp.clip(p0 + 1.0, 0.0, dim - 1.0)
    R = ((cols == p0c) * (1.0 - d) + (cols == p1c) * d)
    # note: when p0c == p1c (clamped at border) both terms hit the same
    # column and sum to 1 — matching the reference's border clamping.
    return R.reshape(out, s, dim).mean(axis=1)


def _roi_align_kernel(boxes_ref, feat_ref, out_ref, *, oh, ow, s, scale):
    box = boxes_ref[0, :]                                   # (4,)
    feat = feat_ref[:]                                      # (H, W, C)
    H, W, C = feat.shape
    x1 = box[0] * scale
    y1 = box[1] * scale
    x2 = box[2] * scale
    y2 = box[3] * scale
    Ay = _interp_rows(y1, y2 - y1, oh, s, H)                # (oh, H)
    Ax = _interp_rows(x1, x2 - x1, ow, s, W)                # (ow, W)
    t = jax.lax.dot_general(Ay, feat.reshape(H, W * C),
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    t = t.reshape(oh, W, C)
    # contract W: (ow, W) x (oh, W, C) -> (oh, ow, C)
    t2 = jax.lax.dot_general(Ax, t.transpose(1, 0, 2).reshape(W, oh * C),
                             (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    out_ref[0] = t2.reshape(ow, oh, C).transpose(1, 0, 2)


def roi_align_pallas(feats: jnp.ndarray, boxes: jnp.ndarray,
                     out_size=(7, 7), sampling_ratio: int = 2,
                     spatial_scale: float = 1.0,
                     interpret: bool | None = None) -> jnp.ndarray:
    """feats (H, W, C), boxes (K, 4) -> (K, oh, ow, C)."""
    if interpret is None:
        from dmm_net_tpu.kernels import auto_interpret
        interpret = auto_interpret()
    H, W, C = feats.shape
    K = boxes.shape[0]
    oh, ow = out_size
    kern = functools.partial(_roi_align_kernel, oh=oh, ow=ow,
                             s=sampling_ratio, scale=spatial_scale)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((K, oh, ow, C), jnp.float32),
        grid=(K,),
        in_specs=[
            pl.BlockSpec((1, 4), lambda k: (k, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, W, C), lambda k: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, oh, ow, C), lambda k: (k, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(boxes.astype(jnp.float32), feats.astype(jnp.float32))
