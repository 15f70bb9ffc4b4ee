"""flax ResNet backbone with multi-scale skip taps.

TPU-native rebuild of the reference's feature extractor (SURVEY.md §3.1
component #5: ResNet-50, ImageNet-pretrained, RVOS-lineage `base.py`).
Differences from a torch translation, by design:

  * NHWC layout (TPU conv layout; torch is NCHW) — the weight importer
    (tools/import_torch_weights.py) transposes kernels HWIO<-OIHW.
  * bfloat16 compute / float32 params by default: convs hit the MXU in
    bf16, batch-norm statistics stay fp32.
  * Returns a pyramid dict {"c1": /2, "c2": /4, "c3": /8, "c4": /16,
    "c5": /32} for the refinement decoder's skip connections.
  * BatchNorm runs in inference mode (frozen running stats) unless
    `train_bn=True`; the reference fine-tunes with frozen BN in the
    backbone, standard for detection-lineage models.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

ModuleDef = Any


class _S2DStemConv(nn.Module):
    """The stem 7x7/stride-2 conv, computed via space-to-depth.

    A stride-2 conv on 3-channel input is MXU-hostile: the contraction
    dim (7*7*3) pads to the 128-lane register and the systolic array runs
    ~4% occupied — the stem alone measured ~14% of the whole frame step.
    The standard TPU fix (MLPerf ResNet lineage): zero-pad the kernel
    7->8 on the leading edge, regroup both kernel and input into 2x2
    space-to-depth blocks, and run the EXACTLY equivalent 4x4/stride-1
    conv on 12 input channels:

        out[i,j] = sum_{a,b} K[a,b] x[2i+a-3, 2j+b-3]
                 = sum_{s,r}  Kpad[2s+r] x2[i+s-2, (r, c)]   (per axis)

    with Kpad = [0, K[0..6]] so index arithmetic 2s+r covers 0..7.
    The parameter keeps the canonical (7, 7, C, F) shape under the same
    "conv_init" scope, so torch-weight import and existing checkpoints
    are untouched; only the compute graph changes.
    """

    features: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        F = self.features
        kernel = self.param(
            "kernel",
            nn.initializers.variance_scaling(1.0, "fan_in",
                                             "truncated_normal"),
            (7, 7, C, F), jnp.float32)
        k = jnp.pad(kernel, ((1, 0), (1, 0), (0, 0), (0, 0)))  # (8,8,C,F)
        k = k.reshape(4, 2, 4, 2, C, F).transpose(0, 2, 1, 3, 4, 5) \
             .reshape(4, 4, 4 * C, F)                          # (sy,sx,ryrxc,F)
        x2 = x.reshape(B, H // 2, 2, W // 2, 2, C) \
              .transpose(0, 1, 3, 2, 4, 5).reshape(B, H // 2, W // 2, 4 * C)
        return jax.lax.conv_general_dilated(
            x2.astype(self.dtype), k.astype(self.dtype),
            window_strides=(1, 1), padding=[(2, 1), (2, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))


class BottleneckBlock(nn.Module):
    """ResNet-v1 bottleneck: 1x1 -> 3x3 -> 1x1 with residual.

    `conv3x3` lets a stage swap the spatial conv for DCNv2
    (`ops/deform_conv.DeformConv`) — the reference's deformable-ResNet
    variants (SURVEY.md §3.2 15e) replace exactly this conv in c3..c5.
    """

    filters: int
    strides: Tuple[int, int]
    conv: ModuleDef
    norm: ModuleDef
    act: Callable
    conv3x3: ModuleDef = None

    @nn.compact
    def __call__(self, x):
        # Explicit (1,1) padding: flax "SAME" on a stride-2 3x3 conv pads
        # (0,1) — one pixel misaligned vs torch's symmetric pad=1 grid.
        # Equal at stride 1; at the stage-transition convs the asymmetry
        # silently breaks torch-weight import parity (caught by
        # tests/test_torch_parity.py: c3 rel err 0.24 before this fix).
        conv3x3 = self.conv3x3 or (
            lambda f, s: self.conv(f, (3, 3), s, padding=[(1, 1), (1, 1)]))
        residual = x
        y = self.conv(self.filters, (1, 1))(x)
        y = self.norm()(y)
        y = self.act(y)
        y = conv3x3(self.filters, self.strides)(y)
        y = self.norm()(y)
        y = self.act(y)
        y = self.conv(self.filters * 4, (1, 1))(y)
        y = self.norm(scale_init=nn.initializers.zeros_init())(y)
        if residual.shape != y.shape:
            residual = self.conv(self.filters * 4, (1, 1), self.strides,
                                 name="conv_proj")(residual)
            residual = self.norm(name="norm_proj")(residual)
        return self.act(y + residual)


class BasicBlock(nn.Module):
    """ResNet-v1 basic block (for ResNet-18/34 test-scale backbones)."""

    filters: int
    strides: Tuple[int, int]
    conv: ModuleDef
    norm: ModuleDef
    act: Callable
    conv3x3: ModuleDef = None

    @nn.compact
    def __call__(self, x):
        # explicit (1,1) pad: see BottleneckBlock (torch stride-2 parity)
        conv3x3 = self.conv3x3 or (
            lambda f, s: self.conv(f, (3, 3), s, padding=[(1, 1), (1, 1)]))
        residual = x
        y = conv3x3(self.filters, self.strides)(x)
        y = self.norm()(y)
        y = self.act(y)
        y = conv3x3(self.filters, (1, 1))(y)
        y = self.norm(scale_init=nn.initializers.zeros_init())(y)
        if residual.shape != y.shape:
            residual = self.conv(self.filters, (1, 1), self.strides,
                                 name="conv_proj")(residual)
            residual = self.norm(name="norm_proj")(residual)
        return self.act(y + residual)


class ResNet(nn.Module):
    """ResNet backbone returning the {c1..c5} feature pyramid.

    stage_sizes: blocks per stage, e.g. (3, 4, 6, 3) for ResNet-50.
    """

    stage_sizes: Sequence[int]
    block_cls: ModuleDef = BottleneckBlock
    num_filters: int = 64
    dtype: Any = jnp.bfloat16
    train_bn: bool = False
    # Pyramid levels whose blocks use DCNv2 for the 3x3 conv, e.g.
    # ("c3", "c4", "c5") — the deformable-ResNet configs of the reference
    # (SURVEY.md 15e). Empty (default) = plain convs, matching the shipped
    # R-50-FPN config, and keeps torch-weight-import naming unchanged.
    deform_stages: Sequence[str] = ()
    # Space-to-depth stem (exact graph transform of the 7x7/s2 conv; see
    # _S2DStemConv). Requires even H, W — true for every shipped config.
    s2d_stem: bool = True

    @nn.compact
    def __call__(self, x):
        conv = partial(nn.Conv, use_bias=False, dtype=self.dtype,
                       param_dtype=jnp.float32)
        norm = partial(nn.BatchNorm, use_running_average=not self.train_bn,
                       momentum=0.9, epsilon=1e-5, dtype=self.dtype,
                       param_dtype=jnp.float32)
        act = nn.relu

        x = x.astype(self.dtype)
        if self.s2d_stem and x.shape[-3] % 2 == 0 and x.shape[-2] % 2 == 0:
            x = _S2DStemConv(self.num_filters, dtype=self.dtype,
                             name="conv_init")(x)
        else:
            x = conv(self.num_filters, (7, 7), (2, 2),
                     padding=[(3, 3), (3, 3)], name="conv_init")(x)
        x = norm(name="bn_init")(x)
        x = act(x)
        feats = {"c1": x}                                   # stride 2
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        from dmm_net_tpu.ops.deform_conv import DeformConv
        for i, block_count in enumerate(self.stage_sizes):
            conv3x3 = None
            if f"c{i + 2}" in self.deform_stages:
                conv3x3 = lambda f, s: DeformConv(  # noqa: E731
                    f, (3, 3), strides=s, dtype=self.dtype)
            for j in range(block_count):
                strides = (2, 2) if i > 0 and j == 0 else (1, 1)
                x = self.block_cls(self.num_filters * 2 ** i, strides=strides,
                                   conv=conv, norm=norm, act=act,
                                   conv3x3=conv3x3)(x)
            feats[f"c{i + 2}"] = x                          # strides 4,8,16,32
        return feats


ResNet18 = partial(ResNet, stage_sizes=(2, 2, 2, 2), block_cls=BasicBlock)
ResNet34 = partial(ResNet, stage_sizes=(3, 4, 6, 3), block_cls=BasicBlock)
ResNet50 = partial(ResNet, stage_sizes=(3, 4, 6, 3), block_cls=BottleneckBlock)
ResNet101 = partial(ResNet, stage_sizes=(3, 4, 23, 3), block_cls=BottleneckBlock)


def backbone_by_name(name: str, **kw) -> nn.Module:
    table = {"resnet18": ResNet18, "resnet34": ResNet34,
             "resnet50": ResNet50, "resnet101": ResNet101}
    if name not in table:
        raise KeyError(f"unknown backbone {name!r}; have {sorted(table)}")
    return table[name](**kw)


def feature_dims(name: str) -> dict:
    """Channel count of each pyramid level for a given backbone."""
    expansion = 1 if name in ("resnet18", "resnet34") else 4
    return {"c1": 64, "c2": 64 * expansion, "c3": 128 * expansion,
            "c4": 256 * expansion, "c5": 512 * expansion}
