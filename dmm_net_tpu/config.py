"""Single frozen-dataclass config tree with named presets.

The reference carries two coexisting config systems (RVOS-lineage argparse
`args.py` plus yacs YAML for the proposal net — SURVEY.md §6 "Config/flag
system"). This rebuild collapses them into one typed tree with dot-path CLI
overrides, and ships five presets matching the driver acceptance configs
(BASELINE.json:6-12).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Optional, Tuple


@dataclass(frozen=True)
class MatchingConfig:
    """Differentiable matching layer (SURVEY.md §4.4).

    `solver`: "sinkhorn" (entropic, TPU-friendly default) or "pgd"
    (projected gradient + Dykstra alternating projections, the reference
    paper's §3.2 formulation). Both solve
        min <C, X>  s.t.  X >= 0, sum_j X[i,j] = 1, sum_i X[i,j] <= 1
    over padded (M_max, N_max) matrices with validity masks.
    """

    solver: str = "sinkhorn"
    # Sinkhorn
    epsilon: float = 0.05          # entropic temperature
    epsilon_init: float = 0.0      # >epsilon enables geometric eps-annealing
    sinkhorn_iters: int = 30
    implicit_grad: bool = False    # stop-grad duals, differentiate last recompute
    # PGD + Dykstra
    pgd_iters: int = 20
    pgd_step: float = 0.1
    dykstra_iters: int = 10
    # padding
    max_templates: int = 16        # M_max (pad rows)
    max_proposals: int = 128       # N_max (pad cols)
    use_pallas: bool = False       # fused Pallas cost+matcher kernel
    # Assignment decode feeding the aggregation (SURVEY.md §4.2 "verify"):
    # "soft" (soft aggregation over X, the training behavior), "argmax"
    # (row-wise hard argmax, jittable), or "hungarian" (one-to-one scipy
    # decode — engine-level, inference only; each proposal used once).
    decode: str = "soft"

    def __post_init__(self):
        if self.solver not in ("sinkhorn", "pgd"):
            raise ValueError(f"matching.solver={self.solver!r}: expected "
                             "'sinkhorn' or 'pgd'")
        if self.decode not in ("soft", "argmax", "hungarian"):
            raise ValueError(f"matching.decode={self.decode!r}: expected "
                             "'soft', 'argmax' or 'hungarian'")
        if self.solver == "pgd" and self.use_pallas:
            # the fused Pallas kernel implements Sinkhorn only; silently
            # running Sinkhorn under a pgd request (the old behavior,
            # models/dmm.py match_assignment checks use_pallas first)
            # invalidated --set matching.solver=pgd on p2-p4 presets
            raise ValueError(
                "matching.solver='pgd' is incompatible with "
                "matching.use_pallas=True (the fused kernel is "
                "Sinkhorn-only); add matching.use_pallas=false to run the "
                "unrolled PGD+Dykstra path")


@dataclass(frozen=True)
class CostConfig:
    """Pairwise cost: c_ij = lam * (1 - IoU_ij) + (1 - lam) * (1 - cos_ij)."""

    iou_weight: float = 0.3        # lambda; paper fuses mask-IoU and cosine
    mask_size: Tuple[int, int] = (64, 64)  # masks downsampled for dense IoU
    feature_dim: int = 256


@dataclass(frozen=True)
class ModelConfig:
    backbone: str = "resnet50"
    backbone_dtype: str = "bfloat16"
    feature_dim: int = 256         # pooled mask-feature dim
    decoder_dim: int = 128
    decoder_dtype: str = "float32"  # "bfloat16" halves decoder HBM traffic
    # Dtype masks travel in (proposal masks, template carry, aggregation).
    # The frame step is HBM-bandwidth-bound and full-resolution proposal
    # masks are its largest tensors (N=128 @ 256x448 f32 = 59 MB/frame,
    # read 3x: pool-resize, cost-resize, aggregation) — "bfloat16" halves
    # that traffic. Cost/IoU math still runs fp32 on the small downsampled
    # mask matrices, and soft masks in [0,1] lose nothing material at
    # bf16's 8-bit mantissa. Training presets keep float32.
    mask_dtype: str = "float32"
    # Resolution masks live at inside the frame step: "full" (H, W) or
    # "stride4" (H/4, W/4). Aggregation is LINEAR in the proposal masks,
    # so resize(sum_j X_ij m_j) == sum_j X_ij resize(m_j) exactly — and
    # with template_update="decoder" the decoder only ever *downsamples*
    # the aggregated mask (its finest skip is stride 4), so stride4
    # residency changes nothing the decoder sees while cutting all
    # full-resolution proposal-mask traffic (paste, resizes, aggregation)
    # by 16x. Output logits stay full-resolution (the decoder upsamples
    # at the end as before). Cost/pool masks are derived from the
    # stride-4 masks (a resize of a resize — quality-validated A/B).
    mask_res: str = "full"
    # Resolution of the per-object logits the frame step RETURNS: "full"
    # (H, W — required for training loss and the legacy per-frame paths)
    # or "mask" (the decoder's native mask grid, H/4 x W/4 under
    # mask_res="stride4"). "mask" removes the step's largest avoidable
    # HBM traffic — the decoder's final upsample materialized
    # (B, M, H, W) f32 only for label-argmax to reduce it away — and the
    # engine instead resolves labels with the fused upsample+argmax
    # Pallas kernel (kernels/resolve.py), reading ~0.5 MB/frame instead
    # of ~120. Template update is unaffected (it consumes the mask grid
    # either way). Production inference presets (p3, p4) use "mask".
    logits_res: str = "full"
    decoder_fine_level: str = "c2"  # "c3" = fast mode (~80% fewer decoder FLOPs)
    decoder_recurrent: bool = True  # ConvGRU state carried across frames
    # Decoder structure: "shared" = object-proportional SharedFPNDecoder
    # (mask-independent FPN runs once per frame; per-object path at
    # decoder_obj_dim width — ~6-8x fewer FLOPs at M=16, the production
    # default); "legacy" = RefinementDecoder (full-width conv stack
    # broadcast per object slot).
    decoder_variant: str = "shared"
    decoder_obj_dim: int = 32      # per-object path width ("shared" variant)
    # Per-object path A/B knobs ("shared" variant; ROUND_NOTES r3 decoder
    # audit — the finest-level 3x3 convs dominate decoder FLOPs):
    # obj_fuse "conv3" (shipped) | "conv1" | "none" picks the residual fuse
    # conv; obj_dim_fine 0 = decoder_obj_dim, else tapers the per-object
    # width at the finest level only. Defaults = shipped architecture.
    # conv; obj_dim_fine=16 is the measured sweet spot: paired 128px A/B
    # (tools/ab_decoder_arch.py, ROUND_NOTES r3) scored taper 0.9000 vs
    # base 0.8827 held-out J&F, and bench.py at p3/B=16 went 1662 ->
    # 2158 fps (obj_fuse="none" is NOT safe: one eval sequence collapsed
    # to 0.0 in the same A/B). Production presets (p3, p4) taper to 16.
    # obj_fuse="conv1" adopted r5: paired 2k-step A/B scored 0.8982 vs
    # conv3's 0.8993 with a sequence-for-sequence identical profile (the
    # two hard seqs are hard under both), +6.7% bench fps (r4 sweep) and
    # +11% train steps/s. Checkpoints embed their config, so conv3
    # artifacts keep loading as conv3.
    decoder_obj_fuse: str = "conv1"
    decoder_obj_dim_fine: int = 0
    # r5 lane-utilization levers (models/decoder.py SharedFPNDecoder):
    # merge-conv kernel at the finest per-object level (1 = pointwise),
    # and "c3" to stop the per-object loop at stride 8, recovering
    # stride-4 detail via the shared-basis dynamic-mix head (detail_dim
    # basis channels). Defaults = shipped architecture.
    # obj_fine_level="c3" adopted r5: paired 2k-step A/B scored 0.8978 vs
    # ""(stride-4 object path)'s 0.8982 — neutral, no per-seq collapse —
    # at +19.6% bench fps (2757.9 vs 2306.7 at p3/B=16; the per-object
    # stride-4 convs were 1.65 ms of the step at fractional MXU lanes).
    # obj_merge_fine_k=1 REFUTED for quality (0.8899 alone, 0.8851
    # stacked on c3): the pointwise merge loses ~0.01 J&F for +4% fps.
    # Checkpoints embed their config, so older artifacts load unchanged.
    decoder_obj_merge_fine_k: int = 3
    decoder_obj_fine_level: str = "c3"
    decoder_detail_dim: int = 16
    # basis_k=1 adopted r5: the 3x3 basis conv was the step's single
    # largest op (per-op xplane profile, 0.47 ms/frame-batch, input-read
    # bound at 16 cout); pointwise scored 0.8991 vs 0.8978 paired J&F
    # (the shared c2 features behind it already carry two 3x3 convs of
    # spatial context) at +4.5% bench fps (2880.9). Old blobs restore
    # with 3 via _LEGACY_DEFAULTS.
    decoder_detail_basis_k: int = 1
    # SHARED-path fine-level taper (A/B lever, r4): the frame-shared FPN's
    # merge/fuse 3x3 convs at the finest (stride-4) level are the largest
    # single FLOP block of the decoder; 0 = full decoder_dim there,
    # else run the finest shared level at this width.
    decoder_dim_fine: int = 0
    # Source of next-frame template masks for the cost IoU term:
    # "decoder" (refined prediction, the reference's behavior) or
    # "aggregation" (matcher-aggregated proposals — robust without trained
    # decoder weights, e.g. matcher-only deployments).
    template_update: str = "decoder"
    # Frame-input distribution the DMM backbone was trained on, applied
    # IDENTICALLY at train and serve time (the checkpoint carries it):
    #   "raw01"    — [0,1] RGB (every in-repo trainer's convention;
    #                uint8 frames are just /255 on device)
    #   "imagenet" — ImageNet mean/std normalization on top (torch/COCO-
    #                lineage imported backbones expect this)
    # History: extract_features used to ImageNet-normalize uint8 frames
    # but pass floats through — so raw01-trained weights collapsed
    # (day-one drill J&F 0.29) the moment the uint8 native loader landed,
    # while every float-fed eval stayed green. Same failure class as the
    # r3 extract_proposals --input-norm bug, now closed on the DMM side.
    input_norm: str = "raw01"
    image_size: Tuple[int, int] = (256, 448)  # H, W (DAVIS 480p downscaled)
    num_skip_levels: int = 4       # backbone taps C2..C5
    # BatchNorm statistics during training. False (default) = frozen BN:
    # the reference fine-tunes ImageNet/COCO-lineage backbones with frozen
    # BN (small per-GPU batches make batch statistics noisy — the standard
    # detection recipe). True = train-mode BN: batch statistics normalize
    # the forward pass and running stats update every step (threaded
    # through the frame scan and saved in checkpoints) — the right setting
    # for from-scratch training, e.g. the synthetic quality ladder.
    # Inference ALWAYS uses running averages regardless of this flag
    # (only DMMNet(train=True), built by the train step, enables it).
    train_bn: bool = False


@dataclass(frozen=True)
class DataConfig:
    dataset: str = "synthetic"     # synthetic | davis | ytvos
    root: str = "/root/data"
    # Cached detector proposals (tools/extract_proposals.py output tree).
    # The reference trains on cached Mask R-CNN proposals (SURVEY §1.1/
    # §4.3); empty = GT-synthesized proposals (plumbing/dev runs only).
    proposal_dir: str = ""
    clip_length: int = 4           # frames per training clip
    batch_size: int = 2            # clips per step (global)
    num_workers: int = 4
    prefetch_depth: int = 2        # double-buffered host->device staging
    augment: bool = True


@dataclass(frozen=True)
class TrainConfig:
    lr: float = 1e-4
    weight_decay: float = 1e-5
    warmup_steps: int = 200
    total_steps: int = 20000
    grad_accum: int = 1
    loss_bce_weight: float = 1.0
    loss_iou_weight: float = 0.5   # soft-IoU auxiliary
    checkpoint_every: int = 500
    checkpoint_dir: str = "checkpoints"
    seed: int = 0
    remat: bool = False            # jax.checkpoint the per-frame step
                                   # (recompute activations in backward —
                                   # memory ∝ 1 frame instead of T frames)


@dataclass(frozen=True)
class ParallelConfig:
    """Mesh axes. Reference parallelism is DataParallel only (SURVEY.md §3.3);
    the TPU rebuild shards the batch over a 'data' axis and leaves a 'model'
    axis declared for future TP."""

    data_axis: int = 1             # number of chips on the data axis
    model_axis: int = 1


@dataclass(frozen=True)
class Config:
    matching: MatchingConfig = field(default_factory=MatchingConfig)
    cost: CostConfig = field(default_factory=CostConfig)
    model: ModelConfig = field(default_factory=ModelConfig)
    data: DataConfig = field(default_factory=DataConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    parallel: ParallelConfig = field(default_factory=ParallelConfig)
    name: str = "default"

    def override(self, **dotted: Any) -> "Config":
        """Return a new Config with dot-path overrides applied.

        >>> cfg.override(**{"matching.solver": "pgd", "train.lr": 3e-4})

        All overrides touching one sub-config are applied in a single
        dataclasses.replace, so cross-field validation (__post_init__)
        sees only the FINAL state — e.g. {"matching.solver": "pgd",
        "matching.use_pallas": False} must not trip the pgd/pallas guard
        through an invalid intermediate.
        """
        nested: dict = {}
        for path, value in dotted.items():
            d = nested
            parts = path.split(".")
            for p in parts[:-1]:
                d = d.setdefault(p, {})
            d[parts[-1]] = value
        return _replace_nested(self, nested)

    def to_dict(self) -> dict:
        """Nested plain-python dict (msgpack/json-safe; tuples -> lists —
        dataclasses.asdict alone keeps tuples, which msgpack rejects)."""
        def detuple(x):
            if isinstance(x, dict):
                return {k: detuple(v) for k, v in x.items()}
            if isinstance(x, (list, tuple)):
                return [detuple(v) for v in x]
            return x
        return detuple(dataclasses.asdict(self))


# Architecture-affecting fields added AFTER checkpoints existed in the
# wild, with the value that reproduces the PRE-field architecture. A
# restored blob that predates a field must get the architecture it was
# trained with — not the current default (which may have moved on; e.g.
# decoder_obj_fine_level defaulted to "c3" in r5, but blobs saved before
# the field existed were trained with the stride-4 per-object path, and
# restoring them under "c3" crashes on the missing detail_basis params).
# Maintain this map whenever an arch-affecting config field is added.
_LEGACY_DEFAULTS = {
    "decoder_obj_merge_fine_k": 3,
    "decoder_obj_fine_level": "",
    "decoder_detail_dim": 16,
    "decoder_detail_basis_k": 3,
}


def config_from_dict(d: dict) -> Config:
    """Inverse of Config.to_dict. Lists are coerced back to tuples (the
    only tuple-typed fields are int pairs; no config field is a list).
    Fields missing from ``d`` (blobs saved before the field existed) take
    their ``_LEGACY_DEFAULTS`` entry when one exists, so old checkpoints
    keep the architecture they were trained with."""
    def build(cls, node):
        kwargs = {}
        for f in dataclasses.fields(cls):
            if f.name not in node:
                if f.name in _LEGACY_DEFAULTS:
                    kwargs[f.name] = _LEGACY_DEFAULTS[f.name]
                continue
            v = node[f.name]
            if f.default_factory is not dataclasses.MISSING and \
                    dataclasses.is_dataclass(f.default_factory()):
                v = build(type(f.default_factory()), v)
            elif isinstance(v, list):
                v = tuple(v)
            kwargs[f.name] = v
        return cls(**kwargs)
    return build(Config, d)


def _replace_nested(node, changes: dict):
    kwargs = {}
    for key, value in changes.items():
        current = getattr(node, key)   # KeyError-equivalent for bad paths
        if isinstance(value, dict) and dataclasses.is_dataclass(current):
            kwargs[key] = _replace_nested(current, value)
        else:
            kwargs[key] = value
    return dataclasses.replace(node, **kwargs)


# ---------------------------------------------------------------------------
# Presets: one per driver acceptance config (BASELINE.json:6-12).
# ---------------------------------------------------------------------------

def preset(name: str) -> Config:
    if name not in _PRESETS:
        raise KeyError(f"unknown preset {name!r}; have {sorted(_PRESETS)}")
    return _PRESETS[name]()


def _p1_matcher_only() -> Config:
    # "Matching layer only: precomputed feats + Sinkhorn on 1 DAVIS clip (CPU, batch 1)"
    return Config(
        name="p1_matcher_only",
        matching=MatchingConfig(solver="sinkhorn", max_templates=8, max_proposals=64),
        data=DataConfig(dataset="synthetic", batch_size=1, clip_length=2),
    )


def _p2_single_object() -> Config:
    # "Full inference: backbone + cost + matching + refinement, single-object clips"
    return Config(
        name="p2_single_object",
        matching=MatchingConfig(max_templates=1, max_proposals=64,
                                use_pallas=True),
        model=ModelConfig(decoder_dtype="bfloat16", mask_dtype="bfloat16",
                          mask_res="stride4"),
        data=DataConfig(dataset="davis", batch_size=1),
    )


def _p3_multi_object() -> Config:
    # "Multi-object DAVIS val: variable counts, padded matrices, batched frames"
    return Config(
        name="p3_multi_object",
        matching=MatchingConfig(max_templates=16, max_proposals=128,
                                use_pallas=True),
        model=ModelConfig(decoder_dtype="bfloat16", mask_dtype="bfloat16",
                          mask_res="stride4", logits_res="mask",
                          decoder_obj_dim_fine=16),
        data=DataConfig(dataset="davis", batch_size=4),
    )


def _p3_480p() -> Config:
    # p3 at the REFERENCE'S native DAVIS operating point (SURVEY.md §4.2:
    # the reference ran 480p). 854 is not a /32 multiple; 864 = 27*32 pads
    # the width (the davis reader resizes to model size; scoring upsamples
    # to the annotation's native resolution either way). Everything else
    # matches p3 so fps rows at the two geometries are comparable.
    return Config(
        name="p3_480p",
        matching=MatchingConfig(max_templates=16, max_proposals=128,
                                use_pallas=True),
        model=ModelConfig(decoder_dtype="bfloat16", mask_dtype="bfloat16",
                          mask_res="stride4", logits_res="mask",
                          decoder_obj_dim_fine=16, image_size=(480, 864)),
        data=DataConfig(dataset="davis", batch_size=4),
    )


def _p4_ytvos_stream() -> Config:
    # "YouTube-VOS val: longer sequences, more objects, streaming pipeline"
    # M=32 / N=256 per the workload spec (BASELINE.json config #4: "more
    # objects, higher proposal counts" than p3's 16/128). N=256 spans two
    # 128-lane tiles in the fused Pallas matcher (parity tested at this
    # size); per-sequence object bucketing keeps the common few-object
    # case from paying the padded-M decoder cost.
    return Config(
        name="p4_ytvos_stream",
        matching=MatchingConfig(max_templates=32, max_proposals=256,
                                use_pallas=True),
        model=ModelConfig(decoder_dtype="bfloat16", mask_dtype="bfloat16",
                          mask_res="stride4", logits_res="mask",
                          decoder_obj_dim_fine=16),
        data=DataConfig(dataset="ytvos", batch_size=1, clip_length=8, prefetch_depth=3),
    )


def _p5_train() -> Config:
    # "End-to-end training: backbone + matching + refinement fine-tune on DAVIS train"
    return Config(
        name="p5_train",
        matching=MatchingConfig(max_templates=8, max_proposals=64),
        data=DataConfig(dataset="davis", batch_size=4, clip_length=4),
    )


_PRESETS = {
    "p1_matcher_only": _p1_matcher_only,
    "p2_single_object": _p2_single_object,
    "p3_multi_object": _p3_multi_object,
    "p3_480p": _p3_480p,
    "p4_ytvos_stream": _p4_ytvos_stream,
    "p5_train": _p5_train,
}
