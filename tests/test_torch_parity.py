"""LIVE-torch golden parity for the weight importers (VERDICT r3 next #2;
SURVEY.md §5.2 tier 2, §8.5 hard part #3).

tests/test_weight_import.py checks tree-structure fidelity against fake
state dicts; these tests forward REAL torch modules. torchvision is not
installed in this image, so the torch reference models are hand-built in
torchvision's exact architecture and state_dict layout (verified key names:
conv1/bn1/layer{i}.{j}.conv{k}/downsample.{0,1},
backbone.fpn.inner_blocks.{i}, rpn.head.*, roi_heads.*) — random-init,
eval-mode, randomized BN running stats so a silent conv-padding/BN-epsilon/
layout mismatch cannot hide. Conversion goes through the ACTUAL importers
(tools/import_torch_weights.load_torch_resnet,
tools/import_maskrcnn_weights.load_torchvision_maskrcnn) and parity is
asserted per stage at f32 (<=1e-4 relative), including:

  * the s2d stem's exact-transform claim (even input -> space-to-depth
    4x4/s1 path) AND the plain 7x7/s2 fallback (odd input),
  * NCHW->NHWC activation layout + OIHW->HWIO kernels,
  * the box head's flattened-ROI axis reorder (CHW vs HWC flatten),
  * the mask head's ConvTranspose kernel-flip semantics.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as tF  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from tools.import_torch_weights import load_torch_resnet  # noqa: E402
from tools.import_maskrcnn_weights import load_torchvision_maskrcnn  # noqa: E402


# --------------------------------------------------------------------------
# torch reference models, torchvision layout
# --------------------------------------------------------------------------

class _Bottleneck(tnn.Module):
    expansion = 4

    def __init__(self, inplanes, planes, stride=1):
        super().__init__()
        self.conv1 = tnn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(planes)
        self.conv2 = tnn.Conv2d(planes, planes, 3, stride, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(planes)
        self.conv3 = tnn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(planes * 4)
        self.downsample = None
        if stride != 1 or inplanes != planes * 4:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(inplanes, planes * 4, 1, stride, bias=False),
                tnn.BatchNorm2d(planes * 4))

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        y = tF.relu(self.bn1(self.conv1(x)))
        y = tF.relu(self.bn2(self.conv2(y)))
        y = self.bn3(self.conv3(y))
        return tF.relu(y + idt)


class _BasicBlock(tnn.Module):
    expansion = 1

    def __init__(self, inplanes, planes, stride=1):
        super().__init__()
        self.conv1 = tnn.Conv2d(inplanes, planes, 3, stride, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(planes)
        self.conv2 = tnn.Conv2d(planes, planes, 3, 1, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(planes)
        self.downsample = None
        if stride != 1 or inplanes != planes:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(inplanes, planes, 1, stride, bias=False),
                tnn.BatchNorm2d(planes))

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        y = tF.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        return tF.relu(y + idt)


class _TorchResNet(tnn.Module):
    def __init__(self, stage_sizes, block):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.maxpool = tnn.MaxPool2d(3, 2, 1)
        inplanes = 64
        for i, n in enumerate(stage_sizes):
            planes = 64 * 2 ** i
            blocks = []
            for j in range(n):
                stride = 2 if (i > 0 and j == 0) else 1
                blocks.append(block(inplanes, planes, stride))
                inplanes = planes * block.expansion
            setattr(self, f"layer{i + 1}", tnn.Sequential(*blocks))

    def forward(self, x):
        x = tF.relu(self.bn1(self.conv1(x)))
        feats = {"c1": x}
        x = self.maxpool(x)
        for i in range(4):
            x = getattr(self, f"layer{i + 1}")(x)
            feats[f"c{i + 2}"] = x
        return feats


class _TorchFPN(tnn.Module):
    """torchvision FPN: 1x1 inner + top-down nearest + 3x3 layer, P6 by
    stride-2 maxpool of P5."""

    def __init__(self, in_channels=(256, 512, 1024, 2048), out=256):
        super().__init__()
        self.inner_blocks = tnn.ModuleList(
            [tnn.Conv2d(c, out, 1) for c in in_channels])
        self.layer_blocks = tnn.ModuleList(
            [tnn.Conv2d(out, out, 3, padding=1) for _ in in_channels])

    def forward(self, feats):
        cs = [feats[f"c{i}"] for i in (2, 3, 4, 5)]
        laterals = [m(c) for m, c in zip(self.inner_blocks, cs)]
        for i in (2, 1, 0):
            laterals[i] = laterals[i] + tF.interpolate(
                laterals[i + 1], size=laterals[i].shape[-2:], mode="nearest")
        out = {f"p{i + 2}": m(l)
               for i, (m, l) in enumerate(zip(self.layer_blocks, laterals))}
        out["p6"] = tF.max_pool2d(out["p5"], 1, 2)
        return out


class _TorchRPNHead(tnn.Module):
    def __init__(self, channels=256, num_anchors=3):
        super().__init__()
        self.conv = tnn.Conv2d(channels, channels, 3, padding=1)
        self.cls_logits = tnn.Conv2d(channels, num_anchors, 1)
        self.bbox_pred = tnn.Conv2d(channels, num_anchors * 4, 1)

    def forward(self, x):
        t = tF.relu(self.conv(x))
        return self.cls_logits(t), self.bbox_pred(t)


class _TorchBoxHead(tnn.Module):
    def __init__(self, num_classes, in_ch=256):
        super().__init__()
        self.fc6 = tnn.Linear(in_ch * 7 * 7, 1024)
        self.fc7 = tnn.Linear(1024, 1024)

    def forward(self, x):                      # (K, C, 7, 7)
        x = x.flatten(1)
        x = tF.relu(self.fc6(x))
        return tF.relu(self.fc7(x))


class _TorchBoxPredictor(tnn.Module):
    def __init__(self, num_classes):
        super().__init__()
        self.cls_score = tnn.Linear(1024, num_classes)
        self.bbox_pred = tnn.Linear(1024, num_classes * 4)

    def forward(self, x):
        return self.cls_score(x), self.bbox_pred(x)


class _TorchMaskHead(tnn.Module):
    def __init__(self, ch=256):
        super().__init__()
        for i in range(1, 5):
            setattr(self, f"mask_fcn{i}", tnn.Conv2d(ch, ch, 3, padding=1))

    def forward(self, x):
        for i in range(1, 5):
            x = tF.relu(getattr(self, f"mask_fcn{i}")(x))
        return x


class _TorchMaskPredictor(tnn.Module):
    def __init__(self, num_classes, ch=256):
        super().__init__()
        self.conv5_mask = tnn.ConvTranspose2d(ch, ch, 2, 2)
        self.mask_fcn_logits = tnn.Conv2d(ch, num_classes, 1)

    def forward(self, x):
        return self.mask_fcn_logits(tF.relu(self.conv5_mask(x)))


class _TorchMaskRCNNStack(tnn.Module):
    """Everything load_torchvision_maskrcnn reads, under torchvision's
    module paths (backbone.body, backbone.fpn, rpn.head, roi_heads.*)."""

    def __init__(self, num_classes=5):
        super().__init__()
        self.backbone = tnn.Module()
        self.backbone.body = _TorchResNet((3, 4, 6, 3), _Bottleneck)
        self.backbone.fpn = _TorchFPN()
        self.rpn = tnn.Module()
        self.rpn.head = _TorchRPNHead()
        self.roi_heads = tnn.Module()
        self.roi_heads.box_head = _TorchBoxHead(num_classes)
        self.roi_heads.box_predictor = _TorchBoxPredictor(num_classes)
        self.roi_heads.mask_head = _TorchMaskHead()
        self.roi_heads.mask_predictor = _TorchMaskPredictor(num_classes)


def _randomize(model, seed=0):
    """Nontrivial weights AND BN running stats (a BN-eps or stats-layout
    bug must not hide behind identity stats), then eval mode."""
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, (tnn.Conv2d, tnn.ConvTranspose2d, tnn.Linear)):
                m.weight.normal_(0, 0.05, generator=g)
                if m.bias is not None:
                    m.bias.normal_(0, 0.1, generator=g)
            elif isinstance(m, tnn.BatchNorm2d):
                m.weight.uniform_(0.5, 1.5, generator=g)
                m.bias.normal_(0, 0.1, generator=g)
                m.running_mean.normal_(0, 0.1, generator=g)
                m.running_var.uniform_(0.5, 1.5, generator=g)
    model.eval()
    return model


def _sd(model):
    return {k: v.numpy() for k, v in model.state_dict().items()}


def _rel(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    return np.max(np.abs(a - b)) / (np.max(np.abs(b)) + 1e-12)


def _nchw(x_nhwc):
    return torch.from_numpy(np.ascontiguousarray(
        np.transpose(x_nhwc, (0, 3, 1, 2))))


def _to_nhwc(t):
    return np.transpose(t.detach().numpy(), (0, 2, 3, 1))


# --------------------------------------------------------------------------
# ResNet importer
# --------------------------------------------------------------------------

def _resnet_parity(arch, stage_sizes, block, flax_name, H, W, tol=1e-4):
    from dmm_net_tpu.models.resnet import backbone_by_name
    tmodel = _randomize(_TorchResNet(stage_sizes, block), seed=1)
    params, stats = load_torch_resnet(
        _sd(tmodel), stage_sizes, bottleneck=(block is _Bottleneck))
    fmodel = backbone_by_name(flax_name, dtype=jnp.float32)
    rng = np.random.RandomState(0)
    x = rng.rand(1, H, W, 3).astype(np.float32)
    with torch.no_grad():
        ref = tmodel(_nchw(x))
    got = fmodel.apply({"params": params, "batch_stats": stats},
                       jnp.asarray(x))
    for lvl in ("c1", "c2", "c3", "c4", "c5"):
        r = _rel(np.asarray(got[lvl]), _to_nhwc(ref[lvl]))
        assert r < tol, f"{arch} {lvl} ({H}x{W}): rel err {r:.2e}"


def test_resnet50_live_torch_parity_s2d_stem():
    """Even input -> the s2d 4x4/s1 stem path must be EXACTLY the 7x7/s2
    conv torch runs (plus f32 conv noise through 50 layers)."""
    _resnet_parity("resnet50", (3, 4, 6, 3), _Bottleneck, "resnet50", 64, 96)


def test_resnet50_live_torch_parity_plain_stem():
    """Odd input falls back to the plain 7x7/s2 conv path."""
    _resnet_parity("resnet50", (3, 4, 6, 3), _Bottleneck, "resnet50", 63, 95)


def test_resnet18_live_torch_parity():
    _resnet_parity("resnet18", (2, 2, 2, 2), _BasicBlock, "resnet18", 64, 64)


# --------------------------------------------------------------------------
# Mask R-CNN head-stack importer
# --------------------------------------------------------------------------

@pytest.fixture(scope="module")
def mrcnn_pair():
    tmodel = _randomize(_TorchMaskRCNNStack(num_classes=5), seed=2)
    params, stats = load_torchvision_maskrcnn(_sd(tmodel))
    return tmodel, params, stats


def test_maskrcnn_backbone_fpn_parity(mrcnn_pair):
    from dmm_net_tpu.models.resnet import ResNet50
    from dmm_net_tpu.models.proposal.fpn import FPN
    tmodel, params, stats = mrcnn_pair
    rng = np.random.RandomState(1)
    x = rng.rand(1, 64, 96, 3).astype(np.float32)
    with torch.no_grad():
        tc = tmodel.backbone.body(_nchw(x))
        tp = tmodel.backbone.fpn(tc)
    fc = ResNet50(dtype=jnp.float32).apply(
        {"params": params["backbone"], "batch_stats": stats["backbone"]},
        jnp.asarray(x))
    fp = FPN().apply({"params": params["fpn"]},
                     {k: v.astype(jnp.float32) for k, v in fc.items()})
    for lvl in ("p2", "p3", "p4", "p5", "p6"):
        r = _rel(np.asarray(fp[lvl]), _to_nhwc(tp[lvl]))
        assert r < 1e-4, f"fpn {lvl}: rel err {r:.2e}"


def test_maskrcnn_rpn_head_parity(mrcnn_pair):
    from dmm_net_tpu.models.proposal.maskrcnn import RPNHead
    tmodel, params, _ = mrcnn_pair
    rng = np.random.RandomState(2)
    x = rng.randn(1, 8, 12, 256).astype(np.float32)
    with torch.no_grad():
        tl, td = tmodel.rpn.head(_nchw(x))
    fl, fd = RPNHead().apply({"params": params["rpn"]}, jnp.asarray(x))
    assert _rel(np.asarray(fl), _to_nhwc(tl)) < 1e-5
    assert _rel(np.asarray(fd), _to_nhwc(td)) < 1e-5


def test_maskrcnn_box_head_parity(mrcnn_pair):
    """Covers the CHW-vs-HWC flatten reorder of fc6 (importer
    _dense_from_chw): torch flattens (C, 7, 7), flax flattens (7, 7, C)."""
    from dmm_net_tpu.models.proposal.maskrcnn import BoxHead
    tmodel, params, _ = mrcnn_pair
    rng = np.random.RandomState(3)
    rois = rng.randn(6, 7, 7, 256).astype(np.float32)
    with torch.no_grad():
        rep = tmodel.roi_heads.box_head(_nchw(rois))
        ts, td = tmodel.roi_heads.box_predictor(rep)
    fs, fd = BoxHead(num_classes=5).apply({"params": params["box_head"]},
                                          jnp.asarray(rois))
    assert _rel(np.asarray(fs), ts.numpy()) < 1e-4
    assert _rel(np.asarray(fd), td.numpy()) < 1e-4


def test_maskrcnn_mask_head_parity(mrcnn_pair):
    """Covers the ConvTranspose kernel-flip semantics (importer
    _t_deconv)."""
    from dmm_net_tpu.models.proposal.maskrcnn import MaskHead
    tmodel, params, _ = mrcnn_pair
    rng = np.random.RandomState(4)
    rois = rng.randn(6, 14, 14, 256).astype(np.float32)
    with torch.no_grad():
        tm = tmodel.roi_heads.mask_predictor(tmodel.roi_heads.mask_head(
            _nchw(rois)))
    fm = MaskHead(num_classes=5).apply({"params": params["mask_head"]},
                                       jnp.asarray(rois))
    assert _rel(np.asarray(fm), _to_nhwc(tm)) < 1e-4
