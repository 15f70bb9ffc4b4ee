"""Mask R-CNN weight importer: structure fidelity against MaskRCNN.init."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dmm_net_tpu.models.proposal.maskrcnn import MaskRCNN
from tests.test_weight_import import _fake_torch_resnet_sd
from tools.import_maskrcnn_weights import load_torchvision_maskrcnn


def _fake_torchvision_maskrcnn_sd(rng, num_classes=81):
    sd = {}
    body = _fake_torch_resnet_sd((3, 4, 6, 3), True, rng)
    sd.update({f"backbone.body.{k}": v for k, v in body.items()})

    def conv(name, cin, cout, k):
        sd[f"{name}.weight"] = rng.randn(cout, cin, k, k).astype(np.float32) * .05
        sd[f"{name}.bias"] = rng.randn(cout).astype(np.float32) * .01

    chans = [256, 512, 1024, 2048]
    for i in range(4):
        conv(f"backbone.fpn.inner_blocks.{i}", chans[i], 256, 1)
        conv(f"backbone.fpn.layer_blocks.{i}", 256, 256, 3)
    conv("rpn.head.conv", 256, 256, 3)
    conv("rpn.head.cls_logits", 256, 3, 1)
    conv("rpn.head.bbox_pred", 256, 12, 1)

    def dense(name, cin, cout):
        sd[f"{name}.weight"] = rng.randn(cout, cin).astype(np.float32) * .05
        sd[f"{name}.bias"] = rng.randn(cout).astype(np.float32) * .01

    dense("roi_heads.box_head.fc6", 7 * 7 * 256, 1024)
    dense("roi_heads.box_head.fc7", 1024, 1024)
    dense("roi_heads.box_predictor.cls_score", 1024, num_classes)
    dense("roi_heads.box_predictor.bbox_pred", 1024, num_classes * 4)
    for i in range(1, 5):
        conv(f"roi_heads.mask_head.mask_fcn{i}", 256, 256, 3)
    # torch ConvTranspose2d weight: (in, out, kh, kw)
    sd["roi_heads.mask_predictor.conv5_mask.weight"] = \
        rng.randn(256, 256, 2, 2).astype(np.float32) * .05
    sd["roi_heads.mask_predictor.conv5_mask.bias"] = \
        rng.randn(256).astype(np.float32) * .01
    conv("roi_heads.mask_predictor.mask_fcn_logits", 256, num_classes, 1)
    return sd


def _shapes(t):
    return jax.tree.map(lambda x: tuple(x.shape), t)


@pytest.mark.slow
def test_import_structure_matches_init():
    rng = np.random.RandomState(0)
    sd = _fake_torchvision_maskrcnn_sd(rng)
    params, stats = load_torchvision_maskrcnn(sd)

    model = MaskRCNN(image_size=(64, 128), num_classes=81,
                     pre_nms_top_n=16, post_nms_top_n=8, max_detections=4)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 128, 3)))
    want_p = jax.tree.map(np.asarray, variables["params"])
    want_s = jax.tree.map(np.asarray, variables["batch_stats"])
    assert _shapes(params) == _shapes(want_p)
    assert _shapes(stats) == _shapes(want_s)

    # imported net runs
    out = model.apply({"params": params, "batch_stats": stats},
                      jnp.asarray(rng.rand(1, 64, 128, 3), jnp.float32))
    assert np.isfinite(np.asarray(out["boxes"])).all()


def test_deconv_conversion_golden_vs_torch():
    """flax ConvTranspose with the converted kernel must equal torch
    ConvTranspose2d on the same input."""
    torch = pytest.importorskip("torch")
    import flax.linen as nn
    from tools.import_maskrcnn_weights import _t_deconv

    rng = np.random.RandomState(0)
    cin, cout, k, s = 3, 5, 2, 2
    w = rng.randn(cin, cout, k, k).astype(np.float32) * 0.3
    b = rng.randn(cout).astype(np.float32) * 0.1
    x = rng.randn(1, 4, 6, cin).astype(np.float32)

    tconv = torch.nn.ConvTranspose2d(cin, cout, k, stride=s)
    with torch.no_grad():
        tconv.weight.copy_(torch.tensor(w))
        tconv.bias.copy_(torch.tensor(b))
        want = tconv(torch.tensor(x.transpose(0, 3, 1, 2)))
    want = want.detach().numpy().transpose(0, 2, 3, 1)

    mod = nn.ConvTranspose(cout, (k, k), strides=(s, s))
    variables = {"params": {"kernel": jnp.asarray(_t_deconv(w)),
                            "bias": jnp.asarray(b)}}
    got = np.asarray(mod.apply(variables, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_fc6_flatten_order_golden_vs_torch():
    """torch Linear on CHW-flattened features == flax Dense with the
    reordered kernel on HWC-flattened features."""
    torch = pytest.importorskip("torch")
    from tools.import_maskrcnn_weights import _dense_from_chw

    rng = np.random.RandomState(1)
    C, H, W, out = 6, 7, 7, 10
    w = rng.randn(out, C * H * W).astype(np.float32) * 0.1
    feat = rng.randn(H, W, C).astype(np.float32)

    want = torch.tensor(w) @ torch.tensor(
        feat.transpose(2, 0, 1).reshape(-1))      # torch flattens (C,H,W)
    got = jnp.asarray(feat.reshape(-1)) @ jnp.asarray(
        _dense_from_chw(w, C, H, W))              # flax flattens (H,W,C)
    np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=1e-4)
