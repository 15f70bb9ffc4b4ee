"""Clip-consistent training augmentation (SURVEY.md §3.1 #3 "augment").

RVOS-lineage augmentation for VOS training: horizontal flip, scale-jitter +
crop, photometric jitter — applied with the SAME parameters to every frame
of a clip (temporal consistency is what the recurrent decoder learns from).
Host-side numpy on uint8/float arrays; runs inside the Prefetcher's loader
thread, so it overlaps device compute.

All geometry ops transform frames, GT masks, template masks and proposal
masks together; validity masks are untouched.
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def _resize_nhwc(x: np.ndarray, H: int, W: int, nearest: bool) -> np.ndarray:
    """Resize the last (H, W[, C]) dims of an array of any leading shape."""
    import cv2
    lead = x.shape[:-3] if x.ndim >= 3 and x.shape[-1] in (1, 3) else x.shape[:-2]
    interp = cv2.INTER_NEAREST if nearest else cv2.INTER_LINEAR
    if x.ndim >= 3 and x.shape[-1] in (1, 3):
        flat = x.reshape((-1,) + x.shape[-3:])
        out = np.stack([cv2.resize(f, (W, H), interpolation=interp)
                        for f in flat])
        if out.ndim == 3:  # cv2 drops the channel dim for C=1
            out = out[..., None]
        return out.reshape(lead + (H, W) + x.shape[-1:])
    flat = x.reshape((-1,) + x.shape[-2:])
    out = np.stack([cv2.resize(f, (W, H), interpolation=interp)
                    for f in flat])
    return out.reshape(lead + (H, W))


def augment_clip(batch_item: Dict[str, np.ndarray], rng: np.random.RandomState,
                 flip_prob: float = 0.5, scale_range=(0.8, 1.2),
                 brightness: float = 0.15, contrast: float = 0.15
                 ) -> Dict[str, np.ndarray]:
    """Augment one clip (no batch dim):
      frames (T, H, W, 3) float[0,1] or uint8
      gt_masks (T, M, H, W), prop_masks (T, N, H, W), tmpl_masks (M, H, W)
    Returns a new dict with the same keys/shapes."""
    out = dict(batch_item)
    frames = out["frames"]
    T, H, W = frames.shape[:3]
    was_uint8 = frames.dtype == np.uint8
    frames = frames.astype(np.float32) / (255.0 if was_uint8 else 1.0)

    # ---- horizontal flip ----
    if rng.rand() < flip_prob:
        frames = frames[:, :, ::-1].copy()
        for k in ("gt_masks", "prop_masks"):
            out[k] = out[k][..., ::-1].copy()
        out["tmpl_masks"] = out["tmpl_masks"][..., ::-1].copy()

    # ---- scale jitter + crop back to (H, W) ----
    s = rng.uniform(*scale_range)
    if abs(s - 1.0) > 1e-3:
        nh, nw = max(int(round(H * s)), H // 2), max(int(round(W * s)), W // 2)
        frames = _resize_nhwc(frames, nh, nw, nearest=False)
        gt = _resize_nhwc(out["gt_masks"], nh, nw, nearest=True)
        pm = _resize_nhwc(out["prop_masks"], nh, nw, nearest=True)
        tm = _resize_nhwc(out["tmpl_masks"], nh, nw, nearest=True)
        if s > 1.0:   # crop
            y0 = rng.randint(0, nh - H + 1)
            x0 = rng.randint(0, nw - W + 1)
            frames = frames[:, y0:y0 + H, x0:x0 + W]
            gt = gt[..., y0:y0 + H, x0:x0 + W]
            pm = pm[..., y0:y0 + H, x0:x0 + W]
            tm = tm[..., y0:y0 + H, x0:x0 + W]
        else:         # pad (reflect frames, zero masks)
            py, px = H - nh, W - nw
            y0, x0 = rng.randint(0, py + 1), rng.randint(0, px + 1)
            frames = np.pad(frames, ((0, 0), (y0, py - y0), (x0, px - x0),
                                     (0, 0)), mode="reflect")

            def zpad(a):
                pad = [(0, 0)] * (a.ndim - 2) + [(y0, py - y0), (x0, px - x0)]
                return np.pad(a, pad)
            gt, pm, tm = zpad(gt), zpad(pm), zpad(tm)
        out["gt_masks"], out["prop_masks"], out["tmpl_masks"] = gt, pm, tm

    # ---- photometric (frames only, clip-consistent) ----
    b = 1.0 + rng.uniform(-brightness, brightness)
    c = 1.0 + rng.uniform(-contrast, contrast)
    mean = frames.mean(axis=(1, 2, 3), keepdims=True)
    frames = np.clip((frames - mean) * c + mean * b, 0.0, 1.0)

    out["frames"] = ((frames * 255).astype(np.uint8) if was_uint8
                     else frames.astype(np.float32))
    return out


def augment_batch(batch: Dict[str, np.ndarray], seed: int,
                  **kw) -> Dict[str, np.ndarray]:
    """Apply augment_clip independently per batch element."""
    B = batch["frames"].shape[0]
    items = []
    for b in range(B):
        rng = np.random.RandomState(seed * 9973 + b)
        item = {k: v[b] for k, v in batch.items()}
        aug = augment_clip({k: item[k] for k in
                            ("frames", "gt_masks", "prop_masks", "tmpl_masks")},
                           rng, **kw)
        item.update(aug)
        items.append(item)
    return {k: np.stack([it[k] for it in items]) for k in batch}
