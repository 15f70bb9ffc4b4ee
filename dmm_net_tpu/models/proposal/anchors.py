"""Anchor generation + box encode/decode (maskrcnn-benchmark equivalents
of anchor_generator.py / box_coder.py, SURVEY.md dep rows).

All functions are static-shape and jit-safe: anchors for a fixed image
size are a compile-time constant folded by XLA.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp
import numpy as np


def generate_anchors(image_size: Tuple[int, int],
                     strides: Sequence[int] = (4, 8, 16, 32, 64),
                     sizes: Sequence[float] = (32, 64, 128, 256, 512),
                     ratios: Sequence[float] = (0.5, 1.0, 2.0)) -> np.ndarray:
    """All anchors over an FPN pyramid, (A_total, 4) xyxy, numpy
    (compile-time constant)."""
    H, W = image_size
    out = []
    for stride, size in zip(strides, sizes):
        # ceil division: every pyramid level comes from stride-2 SAME convs
        # (ceil at each halving; ceil composes, so level dims = ceil(d/s)).
        # Floor would undercount anchors whenever a dim isn't divisible by
        # the stride (e.g. W=96 at stride 64 -> 2 cells, not 1).
        fh, fw = -(-H // stride), -(-W // stride)
        cy = (np.arange(fh) + 0.5) * stride
        cx = (np.arange(fw) + 0.5) * stride
        cyx = np.stack(np.meshgrid(cy, cx, indexing="ij"), -1)  # (fh, fw, 2)
        shapes = []
        for r in ratios:
            h = size * np.sqrt(r)
            w = size / np.sqrt(r)
            shapes.append((h, w))
        shapes = np.asarray(shapes)                            # (R, 2)
        ctr = np.broadcast_to(cyx[:, :, None, :], (fh, fw, len(ratios), 2))
        hw = np.broadcast_to(shapes[None, None], (fh, fw, len(ratios), 2))
        boxes = np.concatenate([
            ctr[..., ::-1] - hw[..., ::-1] / 2,                # x1, y1
            ctr[..., ::-1] + hw[..., ::-1] / 2,                # x2, y2
        ], axis=-1)
        out.append(boxes.reshape(-1, 4))
    return np.concatenate(out, 0).astype(np.float32)


def level_slices(image_size, strides=(4, 8, 16, 32, 64), num_ratios=3):
    """Start/stop index of each pyramid level in the flat anchor list."""
    H, W = image_size
    sizes = [(-(-H // s)) * (-(-W // s)) * num_ratios for s in strides]
    stops = np.cumsum(sizes)
    starts = np.concatenate([[0], stops[:-1]])
    return list(zip(starts.tolist(), stops.tolist()))


def encode_boxes(boxes: jnp.ndarray, anchors: jnp.ndarray,
                 weights=(1.0, 1.0, 1.0, 1.0)) -> jnp.ndarray:
    """Box -> (dx, dy, dw, dh) regression targets wrt anchors (Faster R-CNN
    parameterization, matching maskrcnn-benchmark BoxCoder.encode)."""
    wx, wy, ww, wh = weights
    aw = anchors[..., 2] - anchors[..., 0]
    ah = anchors[..., 3] - anchors[..., 1]
    ax = anchors[..., 0] + aw / 2
    ay = anchors[..., 1] + ah / 2
    bw = boxes[..., 2] - boxes[..., 0]
    bh = boxes[..., 3] - boxes[..., 1]
    bx = boxes[..., 0] + bw / 2
    by = boxes[..., 1] + bh / 2
    return jnp.stack([
        wx * (bx - ax) / jnp.maximum(aw, 1e-6),
        wy * (by - ay) / jnp.maximum(ah, 1e-6),
        ww * jnp.log(jnp.maximum(bw, 1e-6) / jnp.maximum(aw, 1e-6)),
        wh * jnp.log(jnp.maximum(bh, 1e-6) / jnp.maximum(ah, 1e-6)),
    ], axis=-1)


def decode_boxes(deltas: jnp.ndarray, anchors: jnp.ndarray,
                 weights=(1.0, 1.0, 1.0, 1.0),
                 clip: float = 4.135) -> jnp.ndarray:
    """(dx, dy, dw, dh) -> xyxy boxes (BoxCoder.decode; clip = log(1000/16))."""
    wx, wy, ww, wh = weights
    aw = anchors[..., 2] - anchors[..., 0]
    ah = anchors[..., 3] - anchors[..., 1]
    ax = anchors[..., 0] + aw / 2
    ay = anchors[..., 1] + ah / 2
    dx = deltas[..., 0] / wx
    dy = deltas[..., 1] / wy
    dw = jnp.clip(deltas[..., 2] / ww, -clip, clip)
    dh = jnp.clip(deltas[..., 3] / wh, -clip, clip)
    cx = ax + dx * aw
    cy = ay + dy * ah
    w = aw * jnp.exp(dw)
    h = ah * jnp.exp(dh)
    return jnp.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], -1)


def clip_to_image(boxes: jnp.ndarray, image_size: Tuple[int, int]) -> jnp.ndarray:
    H, W = image_size
    return jnp.stack([
        jnp.clip(boxes[..., 0], 0, W), jnp.clip(boxes[..., 1], 0, H),
        jnp.clip(boxes[..., 2], 0, W), jnp.clip(boxes[..., 3], 0, H)], -1)
