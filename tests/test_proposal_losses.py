"""Proposal-net loss tests: target assignment correctness, loss values at
perfect predictions, gradient sanity."""

import jax
import jax.numpy as jnp
import numpy as np

from dmm_net_tpu.models.proposal.anchors import encode_boxes
from dmm_net_tpu.models.proposal.losses import (
    assign_anchors,
    assign_proposals,
    box_head_loss,
    crop_gt_mask,
    mask_head_loss,
    rpn_loss,
    smooth_l1,
)


def test_smooth_l1_shape_and_values():
    x = jnp.asarray([0.0, 0.05, 1.0])
    out = np.asarray(smooth_l1(x, beta=1.0 / 9.0))
    beta = 1.0 / 9.0
    np.testing.assert_allclose(out[0], 0.0, atol=1e-7)
    np.testing.assert_allclose(out[1], 0.5 * 0.05 ** 2 / beta, atol=1e-6)
    np.testing.assert_allclose(out[2], 1.0 - 0.5 * beta, atol=1e-6)


def test_assign_anchors_pos_neg_ignore():
    anchors = jnp.asarray([
        [0, 0, 10, 10],      # == gt0 -> pos (IoU 1.0)
        [1, 1, 11, 11],      # IoU 0.68 but best-anchor force-match keeps pos rules intact
        [2, 2, 12, 12],      # IoU 0.47 -> ignore (between 0.3 and 0.7)
        [50, 50, 60, 60],    # no overlap -> neg
    ], jnp.float32)
    gt = jnp.asarray([[0, 0, 10, 10], [0, 0, 0, 0]], jnp.float32)
    gv = jnp.asarray([True, False])
    labels, matched = assign_anchors(anchors, gt, gv)
    lab = np.asarray(labels)
    assert lab[0] == 1 and lab[3] == 0
    assert lab[2] == -1
    assert np.asarray(matched)[0] == 0


def test_rpn_loss_zero_at_perfect_prediction():
    anchors = jnp.asarray([[0, 0, 10, 10], [50, 50, 60, 60]], jnp.float32)
    gt = jnp.asarray([[0, 0, 10, 10]], jnp.float32)
    gv = jnp.asarray([True])
    # perfect: +inf logit on positive anchor, -inf on negative, exact deltas
    obj = jnp.asarray([20.0, -20.0])
    deltas = encode_boxes(gt[jnp.asarray([0, 0])], anchors)
    losses = rpn_loss(obj, deltas, anchors, gt, gv)
    assert float(losses["rpn_cls"]) < 1e-6
    # reg loss only counts positives; anchor0 target is exact
    assert float(losses["rpn_reg"]) < 1e-6


def test_assign_proposals_classes():
    props = jnp.asarray([[0, 0, 10, 10], [48, 48, 62, 62], [100, 100, 110, 110]],
                        jnp.float32)
    pv = jnp.asarray([True, True, True])
    gt = jnp.asarray([[0, 0, 10, 10], [50, 50, 60, 60]], jnp.float32)
    gl = jnp.asarray([3, 7])
    gv = jnp.asarray([True, True])
    cls_t, matched = assign_proposals(props, pv, gt, gl, gv)
    assert np.asarray(cls_t).tolist() == [3, 7, 0]


def test_box_head_loss_gradients_finite():
    rng = np.random.RandomState(0)
    P, C = 8, 5
    props = jnp.asarray(rng.rand(P, 4) * 30, jnp.float32)
    props = props.at[:, 2:].add(20)
    pv = jnp.ones((P,), bool)
    gt = jnp.asarray([[5, 5, 25, 25]], jnp.float32)
    gl = jnp.asarray([2])
    gv = jnp.asarray([True])

    def loss(scores, deltas):
        d = box_head_loss(scores, deltas, props, pv, gt, gl, gv)
        return d["box_cls"] + d["box_reg"]

    s = jnp.asarray(rng.randn(P, C), jnp.float32)
    d = jnp.asarray(rng.randn(P, C * 4), jnp.float32) * 0.1
    gs, gd = jax.grad(loss, argnums=(0, 1))(s, d)
    assert np.isfinite(np.asarray(gs)).all()
    assert np.isfinite(np.asarray(gd)).all()


def test_crop_gt_mask_identity_box():
    m = jnp.zeros((28, 28)).at[10:20, 5:15].set(1.0)
    crop = crop_gt_mask(m, jnp.asarray([0.0, 0.0, 28.0, 28.0]), out=28)
    np.testing.assert_allclose(np.asarray(crop), np.asarray(m), atol=0.51)
    # sub-box crop zooms in
    crop2 = crop_gt_mask(m, jnp.asarray([5.0, 10.0, 15.0, 20.0]), out=28)
    assert float(crop2.mean()) > 0.9


def test_mask_head_loss_prefers_correct_masks():
    rng = np.random.RandomState(1)
    P, C = 4, 3
    H = W = 32
    # all-ones GT avoids fractional bilinear targets at the box boundary
    gt_masks = jnp.ones((2, H, W))
    props = jnp.asarray([[8, 8, 24, 24]] * P, jnp.float32)
    cls_t = jnp.asarray([1, 1, 0, 0], jnp.int32)
    matched = jnp.zeros((P,), jnp.int32)
    good = jnp.full((P, 28, 28, C), -10.0).at[:, :, :, 1].set(10.0)
    bad = jnp.full((P, 28, 28, C), -10.0).at[:, :, :, 1].set(-10.0)
    l_good = float(mask_head_loss(good, props, cls_t, matched, gt_masks))
    l_bad = float(mask_head_loss(bad, props, cls_t, matched, gt_masks))
    assert l_good < 0.01 < l_bad
