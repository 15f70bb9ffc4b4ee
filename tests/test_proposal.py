"""Proposal subsystem tests: anchors/box-coder round trip (vs torch golden),
FPN shapes, full Mask R-CNN inference smoke, mask pasting."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dmm_net_tpu.models.proposal.anchors import (
    clip_to_image,
    decode_boxes,
    encode_boxes,
    generate_anchors,
    level_slices,
)
from dmm_net_tpu.models.proposal.maskrcnn import MaskRCNN, paste_masks


def test_anchor_counts_and_levels():
    anchors = generate_anchors((64, 128))
    slices = level_slices((64, 128))
    total = sum(stop - start for start, stop in slices)
    assert anchors.shape == (total, 4)
    # level 0: stride 4 -> 16*32 positions * 3 ratios
    assert slices[0] == (0, 16 * 32 * 3)
    # all anchors centered correctly: first anchor center at (2, 2)
    c = (anchors[0, :2] + anchors[0, 2:]) / 2
    np.testing.assert_allclose(c, [2.0, 2.0], atol=1e-5)


def test_box_coder_roundtrip():
    rng = np.random.RandomState(0)
    anchors = jnp.asarray(rng.rand(50, 4).astype(np.float32) * 50)
    anchors = anchors.at[:, 2:].set(anchors[:, :2] + 10 + anchors[:, 2:])
    boxes = jnp.asarray(rng.rand(50, 4).astype(np.float32) * 50)
    boxes = boxes.at[:, 2:].set(boxes[:, :2] + 5 + boxes[:, 2:])
    deltas = encode_boxes(boxes, anchors)
    back = decode_boxes(deltas, anchors)
    np.testing.assert_allclose(np.asarray(back), np.asarray(boxes),
                               atol=1e-3, rtol=1e-4)


def test_box_coder_golden_vs_torch_formulas():
    torch = pytest.importorskip("torch")
    rng = np.random.RandomState(1)
    a = rng.rand(20, 4).astype(np.float32) * 40
    a[:, 2:] += a[:, :2] + 8
    d = rng.randn(20, 4).astype(np.float32) * 0.2

    # torch re-expression of maskrcnn-benchmark BoxCoder.decode
    ta, td = torch.tensor(a), torch.tensor(d)
    widths = ta[:, 2] - ta[:, 0]
    heights = ta[:, 3] - ta[:, 1]
    ctr_x = ta[:, 0] + 0.5 * widths
    ctr_y = ta[:, 1] + 0.5 * heights
    pred_ctr_x = td[:, 0] * widths + ctr_x
    pred_ctr_y = td[:, 1] * heights + ctr_y
    pred_w = torch.exp(td[:, 2]) * widths
    pred_h = torch.exp(td[:, 3]) * heights
    want = torch.stack([pred_ctr_x - pred_w / 2, pred_ctr_y - pred_h / 2,
                        pred_ctr_x + pred_w / 2, pred_ctr_y + pred_h / 2],
                       dim=1).numpy()
    got = np.asarray(decode_boxes(jnp.asarray(d), jnp.asarray(a)))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_clip_to_image():
    b = jnp.asarray([[-5.0, -5.0, 200.0, 300.0]])
    out = np.asarray(clip_to_image(b, (64, 128)))
    np.testing.assert_allclose(out, [[0, 0, 128, 64]])


@pytest.mark.slow
def test_maskrcnn_inference_smoke():
    model = MaskRCNN(image_size=(64, 128), backbone_name="resnet18",
                     num_classes=8, pre_nms_top_n=32, post_nms_top_n=16,
                     max_detections=8)
    img = jnp.asarray(np.random.RandomState(0).rand(1, 64, 128, 3),
                      jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), img)
    out = model.apply(variables, img)
    assert out["boxes"].shape == (8, 4)
    assert out["masks"].shape == (8, 28, 28)
    assert out["valid"].dtype == jnp.bool_
    for v in out.values():
        assert np.isfinite(np.asarray(v, np.float32)).all()
    # boxes inside image
    b = np.asarray(out["boxes"])
    assert (b[:, 0] >= 0).all() and (b[:, 2] <= 128).all()
    assert (b[:, 1] >= 0).all() and (b[:, 3] <= 64).all()


def test_paste_masks_geometry():
    D, H, W = 2, 32, 48
    masks = jnp.ones((D, 28, 28), jnp.float32)
    boxes = jnp.asarray([[8, 4, 24, 20], [40, 28, 47, 31]], jnp.float32)
    valid = jnp.asarray([True, False])
    out = np.asarray(paste_masks(masks, boxes, valid, (H, W)))
    assert out.shape == (D, H, W)
    # mask 0 fills its box interior, zero outside
    assert out[0, 10, 12] == 1.0
    assert out[0, 2, 2] == 0.0
    assert out[0, 10, 30] == 0.0
    # invalid mask contributes nothing
    assert out[1].sum() == 0
