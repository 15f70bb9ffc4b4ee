"""DMM-Net: full model — backbone → pooling → cost → matching → aggregation → decoder.

Rebuild of the reference's L4 model (SURVEY.md §2, §3.1 components 5-10),
restructured for XLA:

  * one jittable `__call__` per *frame* with explicit carried state
    (template masks for the IoU term + decoder ConvGRU state) so the
    caller can `lax.scan` over the frame axis — the TPU-native analog of
    the reference's Python frame loop (SURVEY.md §6 "long-context" row);
  * all object/proposal axes padded to (M_max, N_max) with validity masks;
  * the cost+matcher step optionally runs as the fused Pallas kernel.

Template semantics (paper §3.2, SURVEY.md §1.3): template *features* are
pooled once from frame 1 and stay fixed; the template *mask* used for the
IoU term is updated each frame with the previous frame's prediction
(flag-switchable via `update_template_masks` at the engine level).
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from dmm_net_tpu.config import Config
from dmm_net_tpu.kernels.matcher import fused_pool_cost_match
from dmm_net_tpu.models.decoder import RefinementDecoder, SharedFPNDecoder
from dmm_net_tpu.models.resnet import backbone_by_name
from dmm_net_tpu.ops.cost import cost_matrix
from dmm_net_tpu.ops.matching import sinkhorn_match, pgd_match
from dmm_net_tpu.ops.roi_pool import mask_avg_pool


class FrameState(NamedTuple):
    """Carried across frames of one sequence."""

    template_masks: jnp.ndarray   # (B, M, h, w) soft masks for the IoU term
    decoder_state: jnp.ndarray    # (B, M, H/32, W/32, F) ConvGRU hidden


class FrameOutput(NamedTuple):
    logits: jnp.ndarray           # (B, M, H, W) per-object mask logits
    assignment: jnp.ndarray       # (B, M, N) soft assignment X
    agg_masks: jnp.ndarray        # (B, M, H, W) matcher-aggregated masks


class DMMNet(nn.Module):
    """Differentiable Mask-Matching network (one frame step).

    `train=True` (built only by train/loop.py) enables train-mode BN when
    cfg.model.train_bn is set; inference engines always construct the
    default train=False, so BN uses running averages there regardless."""

    config: Config
    train: bool = False

    def setup(self):
        cfg = self.config
        self.backbone = backbone_by_name(
            cfg.model.backbone,
            train_bn=self.train and cfg.model.train_bn,
            dtype=jnp.bfloat16 if cfg.model.backbone_dtype == "bfloat16"
            else jnp.float32)
        self.feat_proj = nn.Conv(cfg.model.feature_dim, (1, 1), name="feat_proj",
                                 dtype=jnp.float32, param_dtype=jnp.float32)
        dec_dtype = (jnp.bfloat16 if cfg.model.decoder_dtype == "bfloat16"
                     else jnp.float32)
        if cfg.model.decoder_variant == "shared":
            self.decoder = SharedFPNDecoder(
                features=cfg.model.decoder_dim,
                features_fine=cfg.model.decoder_dim_fine,
                obj_features=cfg.model.decoder_obj_dim,
                obj_fuse=cfg.model.decoder_obj_fuse,
                obj_features_fine=cfg.model.decoder_obj_dim_fine,
                obj_merge_fine_k=cfg.model.decoder_obj_merge_fine_k,
                obj_fine_level=cfg.model.decoder_obj_fine_level,
                detail_dim=cfg.model.decoder_detail_dim,
                detail_basis_k=cfg.model.decoder_detail_basis_k,
                recurrent=cfg.model.decoder_recurrent,
                dtype=dec_dtype,
                fine_level=cfg.model.decoder_fine_level)
        else:
            self.decoder = RefinementDecoder(
                features=cfg.model.decoder_dim,
                recurrent=cfg.model.decoder_recurrent,
                dtype=dec_dtype,
                fine_level=cfg.model.decoder_fine_level)

    def extract_features(self, frames: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        """frames (B, H, W, 3) -> pyramid dict; c4 additionally projected to
        the matching feature space as key 'emb' (stride 16).

        Input contract (cfg.model.input_norm — carried by checkpoints so
        train and serve can never diverge): frames are RAW [0,1] RGB,
        shipped either as float or as uint8 (1 byte/px over PCIe; /255
        happens here on device). Under input_norm="imagenet" (torch-
        imported backbones) ImageNet mean/std normalization is applied on
        top — to BOTH dtypes. The old behavior (normalize uint8, pass
        floats through) silently skewed every uint8-reader serve path
        against the float-fed raw01 trainers.

        The pyramid keeps the backbone's compute dtype (bf16 in the
        inference presets — downstream consumers cast where they need f32,
        so materializing f32 copies here would only double HBM traffic);
        'emb' is always f32 (the cost matrix is precision-pinned)."""
        if frames.dtype == jnp.uint8:
            frames = frames.astype(jnp.float32) / 255.0
        if self.config.model.input_norm == "imagenet":
            from dmm_net_tpu.data.pipeline import IMAGENET_MEAN, IMAGENET_STD
            frames = ((frames.astype(jnp.float32) - IMAGENET_MEAN)
                      / IMAGENET_STD)
        feats = dict(self.backbone(frames))
        feats["emb"] = self.feat_proj(feats["c4"].astype(jnp.float32))
        return feats

    def pool_mask_features(self, feats: Dict[str, jnp.ndarray],
                           masks: jnp.ndarray) -> jnp.ndarray:
        """masks (B, K, h, w) -> (B, K, D) pooled embedding vectors."""
        return mask_avg_pool(feats["emb"], masks)

    def match_step(self, tmpl_masks, prop_masks, tmpl_feats, prop_feats,
                   row_mask, col_mask):
        """Cost + matching on downsampled masks (jnp path). Shapes:
        tmpl_masks (B, M, h, w), prop_masks (B, N, h, w), feats (B, K, D).
        Returns X (B, M, N)."""
        cfg = self.config
        mh, mw = cfg.cost.mask_size

        def flat(m):
            m = jax.image.resize(m, m.shape[:2] + (mh, mw), method="bilinear")
            return m.reshape(m.shape[0], m.shape[1], mh * mw)

        tm, pm = flat(tmpl_masks), flat(prop_masks)
        C = cost_matrix(tm, pm, tmpl_feats, prop_feats,
                        row_mask=row_mask, col_mask=col_mask,
                        iou_weight=cfg.cost.iou_weight)
        if cfg.matching.solver == "pgd":
            return pgd_match(C, row_mask, col_mask,
                             step=cfg.matching.pgd_step,
                             pgd_iters=cfg.matching.pgd_iters,
                             dykstra_iters=cfg.matching.dykstra_iters)
        eps_init = cfg.matching.epsilon_init or None
        return sinkhorn_match(C, row_mask, col_mask,
                              epsilon=cfg.matching.epsilon,
                              iters=cfg.matching.sinkhorn_iters,
                              implicit_grad=cfg.matching.implicit_grad,
                              epsilon_init=eps_init)

    @staticmethod
    def aggregate(X: jnp.ndarray, prop_masks: jnp.ndarray,
                  row_mask: jnp.ndarray) -> jnp.ndarray:
        """Soft aggregation (component #9): M̂_i = Σ_j X_ij · mask_j.

        X (B, M, N), prop_masks (B, N, H, W) -> (B, M, H, W) f32.
        Runs at the masks' dtype (bf16 under mask_dtype=bfloat16 — the
        full-res mask read dominates this op) with f32 accumulation."""
        agg = jnp.einsum("bmn,bnhw->bmhw", X.astype(prop_masks.dtype),
                         prop_masks,
                         preferred_element_type=jnp.float32)
        return jnp.where(row_mask[..., None, None], agg, 0.0)

    def __call__(self, frame: jnp.ndarray,
                 prop_masks: jnp.ndarray, prop_valid: jnp.ndarray,
                 tmpl_feats: jnp.ndarray, tmpl_valid: jnp.ndarray,
                 state: FrameState,
                 feats: Dict[str, jnp.ndarray] | None = None
                 ) -> Tuple[FrameOutput, FrameState]:
        """One frame step.

        frame (B, H, W, 3) normalized RGB; prop_masks (B, N, H, W) in [0,1];
        prop_valid (B, N) bool; tmpl_feats (B, M, D) fixed frame-1 features;
        tmpl_valid (B, M) bool; state carries template masks + decoder state.
        feats: optionally precomputed extract_features(frame) — callers that
        already ran the backbone on this frame (e.g. template pooling on
        frame 0 of a training clip) pass it to avoid a second backbone pass.
        """
        feats, X = self.match_assignment(frame, prop_masks, prop_valid,
                                         tmpl_feats, tmpl_valid, state, feats)
        cfg = self.config
        if cfg.matching.decode == "argmax":
            # row-wise hard argmax (jittable): each template takes its best
            # proposal outright; proposals may be reused across templates
            from dmm_net_tpu.ops.matching import hard_assignment
            idx = hard_assignment(X, tmpl_valid, prop_valid)
            X = (jax.nn.one_hot(jnp.clip(idx, 0), X.shape[-1], dtype=X.dtype)
                 * (idx >= 0)[..., None])
        return self.decode_from_assignment(feats, X, prop_masks, tmpl_valid,
                                           state)

    def match_assignment(self, frame: jnp.ndarray, prop_masks: jnp.ndarray,
                         prop_valid: jnp.ndarray, tmpl_feats: jnp.ndarray,
                         tmpl_valid: jnp.ndarray, state: FrameState,
                         feats: Dict[str, jnp.ndarray] | None = None):
        """Backbone + pooling + cost + matching; returns (feats, soft X).
        The first jitted half of the frame step (see decode_from_assignment
        for why it splits)."""
        if feats is None:
            feats = self.extract_features(frame)
        cfg = self.config
        # Masks travel at mask_dtype (bf16 in inference presets): the
        # full-res (B, N, H, W) proposal tensor dominates this phase's HBM
        # traffic and is only ever *read* here (resized down for pooling
        # and the cost IoU — both fp32-upcast on the small side). Under
        # mask_res="stride4" masks additionally live at (H/4, W/4):
        # callers that already provide stride-4 masks (the engine's
        # compact paste) pass through untouched; full-res inputs are
        # downsampled once here.
        mdt = _mask_dtype(cfg)
        mhw = mask_hw(cfg)
        prop_masks = _to_mask_grid(prop_masks.astype(mdt), mhw)
        state = state._replace(template_masks=_to_mask_grid(
            state.template_masks.astype(mdt), mhw))
        if cfg.matching.use_pallas:
            # fused Pallas path: pooling + cost + Sinkhorn in ONE kernel
            # (HBM round trip per frame instead of per op)
            emb = feats["emb"]
            B, eh, ew, D = emb.shape
            mh, mw = cfg.cost.mask_size

            def rs(m, hw):
                return jax.image.resize(m, m.shape[:2] + hw, method="bilinear")

            # resizes read the (possibly bf16) full-res masks; the small
            # downsampled results are pinned back to f32 for the kernel's
            # precision-sensitive cost/solver math
            pm_pool = rs(prop_masks, (eh, ew)).reshape(
                B, prop_masks.shape[1], -1).astype(jnp.float32)
            tm_cost = rs(state.template_masks, (mh, mw)).reshape(
                B, state.template_masks.shape[1], -1).astype(jnp.float32)
            pm_cost = rs(prop_masks, (mh, mw)).reshape(
                B, prop_masks.shape[1], -1).astype(jnp.float32)
            X = fused_pool_cost_match(
                emb.reshape(B, eh * ew, D), pm_pool, tm_cost, pm_cost,
                tmpl_feats, tmpl_valid, prop_valid,
                epsilon=cfg.matching.epsilon,
                iters=cfg.matching.sinkhorn_iters,
                iou_weight=cfg.cost.iou_weight,
                epsilon_init=cfg.matching.epsilon_init or None)
        else:
            prop_feats = self.pool_mask_features(feats, prop_masks)
            X = self.match_step(state.template_masks, prop_masks,
                                tmpl_feats, prop_feats, tmpl_valid, prop_valid)
        return feats, X

    def decode_from_assignment(self, feats: Dict[str, jnp.ndarray],
                               X: jnp.ndarray, prop_masks: jnp.ndarray,
                               tmpl_valid: jnp.ndarray, state: FrameState
                               ) -> Tuple[FrameOutput, FrameState]:
        """Aggregation + refinement from a (possibly hardened) assignment.

        Split out of __call__ so the engine's Hungarian decode — a host-side
        one-to-one solve that cannot live under jit — can harden X between
        two jitted halves (SURVEY.md §4.2 inference decode, flagged verify)."""
        prop_masks = _to_mask_grid(
            prop_masks.astype(_mask_dtype(self.config)),
            mask_hw(self.config))
        agg = self.aggregate(X, prop_masks, tmpl_valid)
        # logits_res="mask": keep logits at the decoder's native grid — the
        # final upsample is deferred into the engine's fused upsample+
        # argmax resolve (kernels/resolve.py), which never materializes
        # the (B, M, H, W) tensor. "full" keeps the legacy contract (the
        # training loss and the per-frame paths consume full-res logits).
        out_hw = (mask_hw(self.config)
                  if self.config.model.logits_res == "mask"
                  else self.config.model.image_size)
        logits, dec_state = self.decoder(feats, agg, state.decoder_state,
                                         out_hw=out_hw)
        logits = jnp.where(tmpl_valid[..., None, None], logits, -1e4)
        out = FrameOutput(logits=logits, assignment=X, agg_masks=agg)
        if self.config.model.template_update == "aggregation":
            new_templates = jnp.clip(agg, 0.0, 1.0)   # already at mask_hw
        else:
            new_templates = _to_mask_grid(jax.nn.sigmoid(logits),
                                          mask_hw(self.config))
        new_state = FrameState(
            template_masks=new_templates.astype(_mask_dtype(self.config)),
            decoder_state=dec_state)
        return out, new_state

    # ------------------------------------------------------------------
    # convenience: initial state from frame-1 ground-truth templates
    # ------------------------------------------------------------------
    def init_state(self, tmpl_masks: jnp.ndarray) -> FrameState:
        return init_frame_state(self.config, tmpl_masks)


def _mask_dtype(cfg: Config):
    return (jnp.bfloat16 if cfg.model.mask_dtype == "bfloat16"
            else jnp.float32)


def mask_hw(cfg: Config) -> Tuple[int, int]:
    """The (h, w) grid masks live on inside the frame step (see
    ModelConfig.mask_res)."""
    H, W = cfg.model.image_size
    if cfg.model.mask_res == "stride4":
        return (H // 4, W // 4)
    return (H, W)


def _to_mask_grid(m: jnp.ndarray, hw: Tuple[int, int]) -> jnp.ndarray:
    """Resize trailing (h, w) of a mask stack to the config's mask grid
    (no-op when already there)."""
    if m.shape[-2:] == hw:
        return m
    return jax.image.resize(m, m.shape[:-2] + hw, method="bilinear")


def decoder_state_dim(cfg: Config) -> int:
    """Channel width of the carried ConvGRU state (variant-dependent)."""
    if cfg.model.decoder_variant == "shared":
        return cfg.model.decoder_obj_dim
    return cfg.model.decoder_dim


def init_frame_state(cfg: Config, tmpl_masks: jnp.ndarray) -> FrameState:
    """Initial FrameState from frame-1 templates (any resolution; stored
    at the config's mask grid) — the single source of truth for the
    carried-state shape (callers must not hardcode it)."""
    B, M = tmpl_masks.shape[:2]
    H, W = cfg.model.image_size
    h32, w32 = H // 32, W // 32
    dec = jnp.zeros((B, M, h32, w32, decoder_state_dim(cfg)), jnp.float32)
    tm = _to_mask_grid(tmpl_masks.astype(_mask_dtype(cfg)), mask_hw(cfg))
    return FrameState(template_masks=tm, decoder_state=dec)
