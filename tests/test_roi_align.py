"""ROI-Align parity: gather formulation vs separable-MXU vs Pallas kernel,
plus a torch golden check of bilinear semantics."""

import jax.numpy as jnp
import numpy as np
import pytest

from dmm_net_tpu.kernels.roi_align import roi_align_pallas
from dmm_net_tpu.ops.roi_pool import mask_avg_pool, roi_align, roi_align_mxu


def _feats_and_boxes(seed=0, H=32, W=48, C=8, K=5):
    rng = np.random.RandomState(seed)
    feats = jnp.asarray(rng.randn(H, W, C), jnp.float32)
    x1 = rng.rand(K) * (W - 10)
    y1 = rng.rand(K) * (H - 10)
    w = rng.rand(K) * 12 + 3
    h = rng.rand(K) * 12 + 3
    boxes = jnp.asarray(np.stack([x1, y1, np.minimum(x1 + w, W - 1),
                                  np.minimum(y1 + h, H - 1)], 1), jnp.float32)
    return feats, boxes


def test_mxu_matches_gather_formulation():
    feats, boxes = _feats_and_boxes()
    a = np.asarray(roi_align(feats, boxes, out_size=(7, 7), sampling_ratio=2))
    b = np.asarray(roi_align_mxu(feats, boxes, out_size=(7, 7),
                                 sampling_ratio=2))
    np.testing.assert_allclose(a, b, atol=1e-4, rtol=1e-4)


def test_pallas_matches_mxu():
    feats, boxes = _feats_and_boxes(seed=1)
    a = np.asarray(roi_align_mxu(feats, boxes, out_size=(7, 7),
                                 sampling_ratio=2))
    b = np.asarray(roi_align_pallas(feats, boxes, out_size=(7, 7),
                                    sampling_ratio=2, interpret=True))
    np.testing.assert_allclose(a, b, atol=1e-4, rtol=1e-4)


def test_spatial_scale_and_shapes():
    feats, boxes = _feats_and_boxes(seed=2, H=16, W=16, C=4, K=3)
    out = roi_align_mxu(feats, boxes * 4.0, out_size=(5, 3),
                        sampling_ratio=2, spatial_scale=0.25)
    assert out.shape == (3, 5, 3, 4)
    ref = roi_align(feats, boxes * 4.0, out_size=(5, 3), sampling_ratio=2,
                    spatial_scale=0.25)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_constant_map_pools_constant():
    feats = jnp.ones((20, 20, 3))
    boxes = jnp.asarray([[2.0, 2.0, 10.0, 12.0]])
    for fn in (roi_align, roi_align_mxu):
        out = np.asarray(fn(feats, boxes, out_size=(7, 7)))
        np.testing.assert_allclose(out, 1.0, atol=1e-5)


def test_golden_vs_torch_grid_sample_semantics():
    """Check one interior sample point against torch bilinear arithmetic."""
    torch = pytest.importorskip("torch")
    rng = np.random.RandomState(3)
    H = W = 10
    feats = rng.randn(H, W, 1).astype(np.float32)
    # box exactly one output cell, sampling_ratio=1 -> single sample at the
    # box center
    cx, cy = 4.3, 5.7
    box = jnp.asarray([[cx - 0.5, cy - 0.5, cx + 0.5, cy + 0.5]])
    out = float(roi_align_mxu(jnp.asarray(feats), box, out_size=(1, 1),
                              sampling_ratio=1)[0, 0, 0, 0])
    # torch bilinear at (cx - 0.5, cy - 0.5) in pixel-center coords
    x, y = cx - 0.5, cy - 0.5
    x0, y0 = int(np.floor(x)), int(np.floor(y))
    dx, dy = x - x0, y - y0
    t = feats[..., 0]
    want = (t[y0, x0] * (1 - dy) * (1 - dx) + t[y0, x0 + 1] * (1 - dy) * dx
            + t[y0 + 1, x0] * dy * (1 - dx) + t[y0 + 1, x0 + 1] * dy * dx)
    np.testing.assert_allclose(out, want, atol=1e-5)


def test_mask_avg_pool_resizes_and_normalizes():
    feats = jnp.ones((8, 8, 4)) * jnp.arange(1, 5)
    masks = jnp.zeros((2, 16, 16)).at[0, :8, :].set(1.0)
    out = np.asarray(mask_avg_pool(feats, masks))
    np.testing.assert_allclose(out[0], [1, 2, 3, 4], atol=1e-5)
    np.testing.assert_allclose(out[1], 0.0, atol=1e-6)  # empty mask
