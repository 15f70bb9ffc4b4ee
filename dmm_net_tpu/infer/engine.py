"""Per-sequence inference engine (SURVEY.md §4.2 rebuilt for TPU).

The reference's test.py loops frames in Python with a per-frame H2D/D2H
round trip — its latency bottleneck. Here:

  * the per-frame step (backbone → pool → cost → match → decode → argmax)
    is ONE jitted function with carried state; only the final uint8 label
    map comes back to host;
  * frames are staged ahead of compute through a double-buffered
    host->device prefetcher (data/pipeline.py), so decode overlaps TPU
    compute;
  * overlapping objects are resolved by pixel-wise argmax over
    (background, object_1..M) exactly like the reference, then written as
    DAVIS-palette indexed PNGs.

Template semantics: features fixed from frame 1; template masks for the
IoU term updated with the previous frame's prediction
(`update_templates=True`, the survey's best reconstruction — flag kept so
both behaviors are testable).
"""

from __future__ import annotations

import os
from typing import Dict, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from dmm_net_tpu.config import Config
from dmm_net_tpu.models.dmm import DMMNet

# 256-entry DAVIS palette: the standard VOC/DAVIS colormap generator.
def _davis_palette() -> np.ndarray:
    palette = np.zeros((256, 3), np.uint8)
    for i in range(256):
        lab = i
        r = g = b = 0
        for j in range(8):
            r |= ((lab >> 0) & 1) << (7 - j)
            g |= ((lab >> 1) & 1) << (7 - j)
            b |= ((lab >> 2) & 1) << (7 - j)
            lab >>= 3
        palette[i] = (r, g, b)
    return palette


DAVIS_PALETTE = _davis_palette()


def _grid_like(m: jnp.ndarray, ref: jnp.ndarray) -> jnp.ndarray:
    """Match a host-provided mask stack to the carried template grid
    (dtype + resolution — masks live at mask_hw under mask_res=stride4)."""
    if m.shape[-2:] != ref.shape[-2:]:
        m = jax.image.resize(m, m.shape[:-2] + ref.shape[-2:],
                             method="bilinear")
    return m.astype(ref.dtype)


def resolve_overlaps(logits: jnp.ndarray, tmpl_valid: jnp.ndarray,
                     bg_threshold: float = 0.5) -> jnp.ndarray:
    """Pixel-wise argmax over background + objects.

    logits (B, M, H, W) -> labels (B, H, W) int32 in [0, M], where 0 is
    background. Background "logit" is the sigmoid threshold in logit
    space, matching the reference's p>0.5-then-argmax semantics."""
    bg_logit = jnp.log(bg_threshold / (1 - bg_threshold))
    masked = jnp.where(tmpl_valid[..., None, None], logits, -1e4)
    # No materialized (B, M+1, H, W) concat: argmax+max over the object
    # axis fuse into one reduction pass, then the background competes as
    # a scalar compare. Tie semantics match the old concat-argmax form:
    # argmax breaks object ties toward the lower index, and best==bg
    # resolves to background (bg was index 0, the argmax winner on ties).
    idx = jnp.argmax(masked, axis=1)
    best = jnp.max(masked, axis=1)
    # uint8: labels fit (M <= 255) and the D2H label stream shrinks 4x
    return jnp.where(best > bg_logit, idx + 1, 0).astype(jnp.uint8)


def resolve_labels(logits: jnp.ndarray, tmpl_valid: jnp.ndarray,
                   image_hw, use_pallas: bool = True,
                   mesh=None) -> jnp.ndarray:
    """Logits at ANY resolution -> uint8 labels at image_hw.

    Full-res logits take the plain fused argmax (resolve_overlaps).
    Mask-grid logits (model.logits_res="mask") go through the fused
    bilinear-upsample+argmax kernel (kernels/resolve.py) so the
    (B, M, H, W) tensor is never materialized — the round-3 roofline cut.

    `mesh`: when the caller runs data-parallel (batch axis sharded on
    "data"), the Pallas kernel is wrapped in shard_map so GSPMD sees an
    explicitly chip-local computation. A bare pallas_call is an opaque
    custom call to the partitioner — without the manual region it may
    replicate operands (inserting the very all-gathers the DP design
    forbids) instead of splitting the grid."""
    if logits.shape[-2:] == tuple(image_hw):
        return resolve_overlaps(logits, tmpl_valid)
    from dmm_net_tpu.kernels.resolve import (fused_resolve_upsample,
                                             resolve_upsample_jnp)
    if use_pallas and jax.default_backend() == "tpu":
        fn = lambda lg, tv: fused_resolve_upsample(lg, tv, tuple(image_hw))
        if mesh is not None:
            from jax import shard_map
            from jax.sharding import PartitionSpec as P
            fn = shard_map(fn, mesh=mesh,
                           in_specs=(P("data"), P("data")),
                           out_specs=P("data"), check_rep=False)
        return fn(logits, tmpl_valid)
    return resolve_upsample_jnp(logits, tmpl_valid, tuple(image_hw))


_BUCKETS = (1, 2, 4, 8, 16, 32)


def bucket_objects(count: int, m_max: int) -> int:
    """Smallest bucket size >= count (capped at m_max). The decoder's cost
    is linear in the padded object count M, and most real sequences have
    <= 4 objects while M_max is 16 — per-sequence bucketing cuts decoder
    work ~4x without dynamic shapes (one cached compile per bucket)."""
    for b in _BUCKETS:
        if b >= max(count, 1):
            return min(b, m_max)
    return m_max


class InferenceEngine:
    """Streaming per-sequence inference."""

    def __init__(self, cfg: Config, model: Optional[DMMNet] = None,
                 variables=None, update_templates: bool = True,
                 bucket_templates: bool = True, mesh=None):
        """`mesh`: optional jax.sharding.Mesh with a "data" axis. When set,
        the batched chunked paths shard the sequence-batch axis across the
        mesh — sequences stay chip-local (frames of one video are serially
        dependent, SURVEY.md §3.3 SP row), so XLA SPMD inserts NO
        collectives and throughput scales linearly with chips. This is a
        TPU-native extension: the reference had no multi-GPU inference."""
        self.cfg = cfg
        self.model = model or DMMNet(cfg)
        self.variables = variables
        self.update_templates = update_templates
        self.bucket_templates = bucket_templates
        self.mesh = mesh
        self._step = jax.jit(self._frame_step)
        self._step_compact = jax.jit(self._frame_step_compact)
        self._init_feats = jax.jit(self._template_features)
        self._match_jit = jax.jit(self._match_phase)
        self._decode_jit = jax.jit(self._decode_phase)

    # -- mesh placement helpers (no-ops when mesh is None) -----------------
    def _seq_sharded(self, x, time_leading: bool = False):
        """Place an array with the sequence-batch axis sharded on "data".
        time_leading: the array is (K, B, ...) instead of (B, ...)."""
        if self.mesh is None or x is None:
            return jnp.asarray(x) if x is not None else None
        from jax.sharding import NamedSharding, PartitionSpec as P
        spec = P(None, "data") if time_leading else P("data")
        return jax.device_put(jnp.asarray(x), NamedSharding(self.mesh, spec))

    def _replicated_variables(self):
        """Model variables replicated across the mesh (cached; keyed on the
        variables object — by identity, holding a strong reference: a bare
        id() key could alias a NEW dict allocated at a freed dict's address
        and silently serve stale weights — so reassigning engine.variables,
        e.g. loading new weights, invalidates the cache)."""
        if self.mesh is None:
            return self.variables
        if getattr(self, "_vars_replicated_src", None) is not self.variables:
            from jax.sharding import NamedSharding, PartitionSpec as P
            rep = NamedSharding(self.mesh, P())
            self._vars_replicated = jax.device_put(self.variables, rep)
            self._vars_replicated_src = self.variables
        return self._vars_replicated

    def _bucket_slice(self, tmpl_masks, tmpl_valid, extras=()):
        """Slice template arrays down to the active-object bucket. Valid
        slots must be contiguous from 0 (all readers construct them so).
        Returns (M_b, sliced tmpl_masks, sliced tmpl_valid, sliced extras)."""
        M = tmpl_valid.shape[1]
        if not self.bucket_templates:
            return M, tmpl_masks, tmpl_valid, extras
        count = int(np.asarray(tmpl_valid).sum(axis=1).max())
        valid_np = np.asarray(tmpl_valid)
        # bucketing requires contiguous validity; fall back otherwise
        if not all((v[:v.sum()].all() and not v[v.sum():].any())
                   for v in valid_np):
            return M, tmpl_masks, tmpl_valid, extras
        M_b = bucket_objects(count, M)
        if M_b >= M:
            return M, tmpl_masks, tmpl_valid, extras
        return (M_b, tmpl_masks[:, :M_b], tmpl_valid[:, :M_b],
                tuple(None if e is None else e[:, :M_b] for e in extras))

    # -- jitted pieces ----------------------------------------------------
    def _template_features(self, variables, frame0, tmpl_masks):
        feats = self.model.apply(variables, frame0,
                                 method=DMMNet.extract_features)
        return self.model.apply(variables, feats, tmpl_masks,
                                method=DMMNet.pool_mask_features)

    def _template_features_per_object(self, variables, obj_frames, tmpl_masks):
        """Pool each object's template features from ITS OWN first annotated
        frame (YT-VOS objects appear mid-video — pooling everything from
        frame 0 would put background under a later-frame mask).
        obj_frames (B, M, H, W, 3); tmpl_masks (B, M, H, W) -> (B, M, D)."""
        B, M = obj_frames.shape[:2]
        flat_frames = obj_frames.reshape((B * M,) + obj_frames.shape[2:])
        feats = self.model.apply(variables, flat_frames,
                                 method=DMMNet.extract_features)
        flat_masks = tmpl_masks.reshape((B * M, 1) + tmpl_masks.shape[2:])
        pooled = self.model.apply(variables, feats, flat_masks,
                                  method=DMMNet.pool_mask_features)
        return pooled.reshape(B, M, -1)

    def _resolve(self, logits, tmpl_valid):
        """Logits -> full-resolution uint8 labels (see resolve_labels)."""
        return resolve_labels(logits, tmpl_valid, self.cfg.model.image_size,
                              use_pallas=self.cfg.matching.use_pallas,
                              mesh=self.mesh)

    def _frame_step(self, variables, frame, prop_masks, prop_valid,
                    tmpl_feats, tmpl_valid, state):
        out, new_state = self.model.apply(variables, frame, prop_masks,
                                          prop_valid, tmpl_feats, tmpl_valid,
                                          state)
        labels = self._resolve(out.logits, tmpl_valid)
        if not self.update_templates:
            new_state = new_state._replace(template_masks=state.template_masks)
        return labels, out.assignment, new_state

    def _frame_step_compact(self, variables, frame, prop_boxes, prop_masks28,
                            prop_valid, tmpl_feats, tmpl_valid, state):
        """Compact-proposal step: the host ships boxes (B, N, 4) + box-local
        masks (B, N, mh, mw) (~0.4 MB/frame) instead of full-resolution
        masks (~58 MB/frame at 256x448, N=128); pasting to (B, N, H, W)
        happens on device. This is what keeps the PCIe/tunnel H2D path off
        the critical path for streaming inference."""
        from dmm_net_tpu.models.dmm import _mask_dtype, mask_hw
        from dmm_net_tpu.models.proposal.maskrcnn import paste_masks
        H, W = self.cfg.model.image_size
        mh, mw = mask_hw(self.cfg)
        # per-axis (x, y) scale: mh/H == mw/W only for div-4 sizes
        scale = jnp.asarray([mw / W, mh / H, mw / W, mh / H], jnp.float32)
        mdt = _mask_dtype(self.cfg)
        pm = jax.vmap(
            lambda m, b, v: paste_masks(m, b * scale, v, (mh, mw), dtype=mdt))(
            prop_masks28.astype(jnp.float32), prop_boxes, prop_valid)
        return self._frame_step(variables, frame, pm, prop_valid,
                                tmpl_feats, tmpl_valid, state)

    def _match_phase(self, variables, frame, prop_masks, prop_valid,
                     tmpl_feats, tmpl_valid, state):
        """First jitted half of the Hungarian-decode step: up to soft X."""
        return self.model.apply(variables, frame, prop_masks, prop_valid,
                                tmpl_feats, tmpl_valid, state,
                                method=DMMNet.match_assignment)

    def _decode_phase(self, variables, feats, X, prop_masks, tmpl_valid,
                      state):
        """Second jitted half: aggregation + refinement from a (hardened)
        assignment injected by the host between the two halves."""
        out, new_state = self.model.apply(
            variables, feats, X, prop_masks, tmpl_valid, state,
            method=DMMNet.decode_from_assignment)
        labels = self._resolve(out.logits, tmpl_valid)
        if not self.update_templates:
            new_state = new_state._replace(template_masks=state.template_masks)
        return labels, out.assignment, new_state

    def _hungarian_step(self, variables, frame, prop_masks, prop_valid,
                        tmpl_feats, tmpl_valid, state):
        """One-to-one decode (SURVEY.md §4.2 flagged verify; VERDICT r1 #8):
        soft X on device -> scipy Hungarian on host -> one-hot X back to
        the jitted decode half. Two dispatches/frame — ablation path, not
        the throughput path."""
        from dmm_net_tpu.models.dmm import _mask_dtype, _to_mask_grid, \
            mask_hw
        from dmm_net_tpu.ops.matching import hard_assignment_hungarian
        # convert the full-res proposal tensor to the mask grid ONCE: the
        # two jitted halves each convert internally, and XLA cannot CSE
        # across dispatches — without this the dominant HBM read of the
        # step is paid twice per frame
        if not hasattr(self, "_prep_jit"):
            self._prep_jit = jax.jit(lambda pm: _to_mask_grid(
                pm.astype(_mask_dtype(self.cfg)), mask_hw(self.cfg)))
        prop_masks = self._prep_jit(prop_masks)
        feats, X = self._match_jit(variables, frame, prop_masks, prop_valid,
                                   tmpl_feats, tmpl_valid, state)
        Xn = np.asarray(X)
        idx = hard_assignment_hungarian(Xn, np.asarray(tmpl_valid),
                                        np.asarray(prop_valid))
        Xh = np.zeros_like(Xn)
        b_ix, m_ix = np.nonzero(idx >= 0)
        Xh[b_ix, m_ix, idx[b_ix, m_ix]] = 1.0
        return self._decode_jit(variables, feats, jnp.asarray(Xh),
                                prop_masks, tmpl_valid, state)

    # -- host loop --------------------------------------------------------
    def run_sequence(self, frames_iter: Iterator[Dict[str, np.ndarray]],
                     tmpl_masks: np.ndarray, tmpl_valid: np.ndarray,
                     first_frame: np.ndarray) -> Dict[str, np.ndarray]:
        """frames_iter yields, per timestep (already batched; B=1 typical):
          {"frame": (B,H,W,3), "prop_masks": (B,N,H,W), "prop_valid": (B,N)}
        or the compact form (pasted to full resolution on device):
          {"frame": ..., "prop_boxes": (B,N,4), "prop_masks28": (B,N,mh,mw),
           "prop_valid": (B,N)}.
        tmpl_* come from frame 1 GT. Returns stacked labels (T, B, H, W)
        and assignments (padded back to M_max when bucketing is active)."""
        variables = self.variables
        M_full = tmpl_valid.shape[1]
        _, tmpl_masks, tmpl_valid, _ = self._bucket_slice(
            np.asarray(tmpl_masks), np.asarray(tmpl_valid))
        tmpl_masks = jnp.asarray(tmpl_masks)
        tmpl_valid = jnp.asarray(tmpl_valid)
        tmpl_feats = self._init_feats(variables, jnp.asarray(first_frame),
                                      tmpl_masks)
        state = self.model.apply(variables, tmpl_masks,
                                 method=DMMNet.init_state)
        hungarian = self.cfg.matching.decode == "hungarian"
        labels_out, assign_out = [], []
        for item in frames_iter:
            if hungarian:
                assert "prop_boxes" not in item, (
                    "hungarian decode supports full-mask items only")
                labels, X, state = self._hungarian_step(
                    variables, jnp.asarray(item["frame"]),
                    jnp.asarray(item["prop_masks"]),
                    jnp.asarray(item["prop_valid"]),
                    tmpl_feats, tmpl_valid, state)
            elif "prop_boxes" in item:
                labels, X, state = self._step_compact(
                    variables, jnp.asarray(item["frame"]),
                    jnp.asarray(item["prop_boxes"]),
                    jnp.asarray(item["prop_masks28"]),
                    jnp.asarray(item["prop_valid"]),
                    tmpl_feats, tmpl_valid, state)
            else:
                labels, X, state = self._step(
                    variables, jnp.asarray(item["frame"]),
                    jnp.asarray(item["prop_masks"]),
                    jnp.asarray(item["prop_valid"]),
                    tmpl_feats, tmpl_valid, state)
            # keep device arrays: converting per frame would block on D2H
            # every step and serialize dispatch; one sync at the end lets
            # the per-frame dispatches pipeline
            labels_out.append(labels)
            assign_out.append(X)
        labels_out = [np.asarray(x) for x in labels_out]
        assign_out = [np.asarray(x) for x in assign_out]
        assignments = np.stack(assign_out)
        if assignments.shape[2] < M_full:   # pad bucketed slots back
            assignments = np.pad(assignments, ((0, 0), (0, 0),
                                               (0, M_full - assignments.shape[2]),
                                               (0, 0)))
        return {"labels": np.stack(labels_out), "assignments": assignments}

    # -- chunked-scan streaming (config #4: long YT-VOS sequences) --------
    def _chunk_step(self, variables, frames, prop_masks, prop_valid,
                    tmpl_feats, tmpl_valid, state,
                    t0=None, live_from=None, tmpl_masks0=None):
        """lax.scan over a chunk of K frames in ONE device dispatch.
        frames (K, B, H, W, 3) etc. Returns stacked labels/assignments.

        Mid-video objects (YT-VOS): with `live_from` (B, M) frame indices
        and the chunk's global start index `t0`, a template slot only
        participates from its first annotated frame — before that it is
        masked out of matching/labels and its template mask is pinned to
        the initial GT (`tmpl_masks0`) so the aggregation feedback can't
        wipe it."""
        gated = live_from is not None

        def step(carry, xs):
            st, t = carry
            frame, pmask, pvalid = xs
            valid_t = (tmpl_valid & (t >= live_from)) if gated else tmpl_valid
            out, new_st = self.model.apply(variables, frame, pmask, pvalid,
                                           tmpl_feats, valid_t, st)
            labels = self._resolve(out.logits, valid_t)
            if not self.update_templates:
                new_st = new_st._replace(template_masks=st.template_masks)
            elif gated:
                live_px = valid_t[..., None, None]
                new_st = new_st._replace(template_masks=jnp.where(
                    live_px, new_st.template_masks,
                    _grid_like(tmpl_masks0, new_st.template_masks)))
            return (new_st, t + 1), (labels, out.assignment)

        t_start = jnp.asarray(0, jnp.int32) if t0 is None else t0
        (state, _), (labels, X) = jax.lax.scan(
            step, (state, t_start), (frames, prop_masks, prop_valid))
        return labels, X, state

    def _chunk_step_compact(self, variables, frames, prop_boxes, prop_masks28,
                            prop_valid, tmpl_feats, tmpl_valid, state,
                            t0=None, live_from=None, tmpl_masks0=None):
        """Compact-proposal chunk scan: boxes + 28x28 masks cross the host
        boundary (~0.4 MB/frame vs ~58 MB full-res); pasting happens inside
        the scan. With K-frame chunks this is ONE H2D batch per K frames —
        the production streaming configuration (config #4)."""
        from dmm_net_tpu.models.dmm import _mask_dtype, mask_hw
        from dmm_net_tpu.models.proposal.maskrcnn import paste_masks
        H, W = self.cfg.model.image_size
        mh, mw = mask_hw(self.cfg)
        # per-axis (x, y) scale: mh/H == mw/W only for div-4 sizes
        scale = jnp.asarray([mw / W, mh / H, mw / W, mh / H], jnp.float32)
        mdt = _mask_dtype(self.cfg)
        gated = live_from is not None

        def step(carry, xs):
            st, t = carry
            frame, boxes, m28, pvalid = xs
            pmask = jax.vmap(
                lambda m, b, v: paste_masks(m, b * scale, v, (mh, mw),
                                            dtype=mdt))(
                m28.astype(jnp.float32), boxes, pvalid)
            valid_t = (tmpl_valid & (t >= live_from)) if gated else tmpl_valid
            out, new_st = self.model.apply(variables, frame, pmask, pvalid,
                                           tmpl_feats, valid_t, st)
            labels = self._resolve(out.logits, valid_t)
            if not self.update_templates:
                new_st = new_st._replace(template_masks=st.template_masks)
            elif gated:
                live_px = valid_t[..., None, None]
                new_st = new_st._replace(template_masks=jnp.where(
                    live_px, new_st.template_masks,
                    _grid_like(tmpl_masks0, new_st.template_masks)))
            return (new_st, t + 1), (labels, out.assignment)

        t_start = jnp.asarray(0, jnp.int32) if t0 is None else t0
        (state, _), (labels, X) = jax.lax.scan(
            step, (state, t_start),
            (frames, prop_boxes, prop_masks28, prop_valid))
        return labels, X, state

    def _reject_hungarian(self, where: str) -> None:
        """Hungarian decode runs host-side scipy between two device phases
        (run_sequence only); inside a K-frame scan it would silently fall
        back to soft decode. Fail loudly instead (VERDICT r2 weak #4 —
        infer.py auto-routes hungarian presets to --per-frame)."""
        if self.cfg.matching.decode == "hungarian":
            raise ValueError(
                f"{where} cannot apply matching.decode='hungarian' (host-"
                "side two-phase decode); use run_sequence / --per-frame")

    def run_sequence_chunked(self, frames: np.ndarray, prop_masks: np.ndarray,
                             prop_valid: np.ndarray, tmpl_masks: np.ndarray,
                             tmpl_valid: np.ndarray, chunk: int = 8
                             ) -> Dict[str, np.ndarray]:
        """Whole-sequence inference with K-frame scan chunks: one device
        dispatch per K frames instead of per frame — the low-latency path
        for long sequences (the last partial chunk is padded and sliced).

        frames (T, B, H, W, 3); prop_masks (T, B, N, H, W);
        prop_valid (T, B, N); tmpl_masks (B, M, H, W); tmpl_valid (B, M).
        """
        self._reject_hungarian("run_sequence_chunked")
        if not hasattr(self, "_chunk_jit"):
            self._chunk_jit = jax.jit(self._chunk_step)
        if self.mesh is not None:
            n_data = self.mesh.shape["data"]
            if frames.shape[1] % n_data:
                raise ValueError(
                    f"sequence batch {frames.shape[1]} not divisible by "
                    f"mesh data axis {n_data}")
        variables = self._replicated_variables()
        T = frames.shape[0]
        tmpl_masks = self._seq_sharded(tmpl_masks)
        tmpl_valid = self._seq_sharded(tmpl_valid)
        tmpl_feats = self._init_feats(variables,
                                      self._seq_sharded(frames[0]),
                                      tmpl_masks)
        state = self.model.apply(variables, tmpl_masks,
                                 method=DMMNet.init_state)
        if self.mesh is not None:
            state = jax.tree_util.tree_map(self._seq_sharded, state)
        labels_out, assign_out = [], []
        for t0 in range(0, T, chunk):
            t1 = min(t0 + chunk, T)
            k = t1 - t0

            def pad(x):
                if k == chunk:
                    return self._seq_sharded(x[t0:t1], time_leading=True)
                padding = [(0, chunk - k)] + [(0, 0)] * (x.ndim - 1)
                return self._seq_sharded(np.pad(x[t0:t1], padding,
                                                mode="edge"),
                                         time_leading=True)

            labels, X, state = self._chunk_jit(
                variables, pad(frames), pad(prop_masks),
                pad(prop_valid), tmpl_feats, tmpl_valid, state)
            labels_out.append(np.asarray(labels[:k]))
            assign_out.append(np.asarray(X[:k]))
        return {"labels": np.concatenate(labels_out),
                "assignments": np.concatenate(assign_out)}

    def run_stream_chunked(self, frames_iter: Iterator[Dict[str, np.ndarray]],
                           tmpl_masks: np.ndarray, tmpl_valid: np.ndarray,
                           first_frame: np.ndarray, chunk: int = 8,
                           live_from: Optional[np.ndarray] = None,
                           tmpl_frames: Optional[np.ndarray] = None
                           ) -> Dict[str, np.ndarray]:
        """Streaming variant of run_sequence_chunked: consumes the per-frame
        item stream (so only `chunk` frames of proposals are host-resident
        at once — full-sequence stacks would be GBs for long YT-VOS videos),
        stacks K frames, and dispatches one scan per chunk.

        YT-VOS mid-video objects: pass `live_from` (B, M) first-frame
        indices and `tmpl_frames` (B, M, H, W, 3) per-object template
        frames; template features are pooled from each object's own frame
        and slots stay inactive before their first frame.

        With a mesh, the sequence-batch axis B is sharded on "data" and
        variables are replicated: sequences stay chip-local (frames of one
        video are serially dependent — SURVEY.md §3.3 SP row), so the
        compiled step contains NO collectives and throughput scales
        linearly with chips (asserted in tests/test_parallel.py)."""
        self._reject_hungarian("run_stream_chunked")
        if not hasattr(self, "_chunk_jit"):
            self._chunk_jit = jax.jit(self._chunk_step,
                                      static_argnames=())
        if self.mesh is not None:
            n_data = self.mesh.shape["data"]
            if tmpl_valid.shape[0] % n_data:
                raise ValueError(
                    f"sequence batch {tmpl_valid.shape[0]} not divisible "
                    f"by mesh data axis {n_data}")
        variables = self._replicated_variables()
        M_full = tmpl_valid.shape[1]
        _, tmpl_masks, tmpl_valid, (live_from, tmpl_frames) = \
            self._bucket_slice(np.asarray(tmpl_masks), np.asarray(tmpl_valid),
                               extras=(live_from, tmpl_frames))
        tmpl_masks = self._seq_sharded(tmpl_masks)
        tmpl_valid = self._seq_sharded(tmpl_valid)
        if tmpl_frames is not None:
            if not hasattr(self, "_init_feats_per_obj"):
                self._init_feats_per_obj = jax.jit(
                    self._template_features_per_object)
            tmpl_feats = self._init_feats_per_obj(
                variables, self._seq_sharded(tmpl_frames), tmpl_masks)
        else:
            tmpl_feats = self._init_feats(variables,
                                          self._seq_sharded(first_frame),
                                          tmpl_masks)
        state = self.model.apply(variables, tmpl_masks,
                                 method=DMMNet.init_state)
        if self.mesh is not None:
            state = jax.tree_util.tree_map(self._seq_sharded, state)
        live = (None if live_from is None
                else self._seq_sharded(np.asarray(live_from, np.int32)))
        labels_out, assign_out = [], []
        buf: list = []
        t_seen = 0

        compact_jit = None

        def flush():
            nonlocal state, t_seen, compact_jit
            if not buf:
                return
            k = len(buf)

            def stack(key):
                xs = np.stack([b[key] for b in buf])
                if k < chunk:   # pad last chunk with edge frames
                    xs = np.pad(xs, [(0, chunk - k)] + [(0, 0)] * (xs.ndim - 1),
                                mode="edge")
                return self._seq_sharded(xs, time_leading=True)

            if "prop_boxes" in buf[0]:
                if compact_jit is None:
                    if not hasattr(self, "_chunk_compact_jit"):
                        self._chunk_compact_jit = jax.jit(
                            self._chunk_step_compact)
                    compact_jit = self._chunk_compact_jit
                labels, X, state = compact_jit(
                    variables, stack("frame"), stack("prop_boxes"),
                    stack("prop_masks28"), stack("prop_valid"),
                    tmpl_feats, tmpl_valid, state,
                    jnp.asarray(t_seen, jnp.int32), live,
                    tmpl_masks if live is not None else None)
            else:
                labels, X, state = self._chunk_jit(
                    variables, stack("frame"), stack("prop_masks"),
                    stack("prop_valid"), tmpl_feats, tmpl_valid, state,
                    jnp.asarray(t_seen, jnp.int32), live,
                    tmpl_masks if live is not None else None)
            labels_out.append(labels[:k])
            assign_out.append(X[:k])
            t_seen += k
            buf.clear()

        for item in frames_iter:
            buf.append(item)
            if len(buf) == chunk:
                flush()
        flush()
        labels_out = [np.asarray(x) for x in labels_out]
        assign_out = [np.asarray(x) for x in assign_out]
        assignments = np.concatenate(assign_out)
        if assignments.shape[2] < M_full:   # pad bucketed slots back
            assignments = np.pad(assignments, ((0, 0), (0, 0),
                                               (0, M_full - assignments.shape[2]),
                                               (0, 0)))
        return {"labels": np.concatenate(labels_out),
                "assignments": assignments}

    @staticmethod
    def write_png(labels: np.ndarray, path: str) -> None:
        """Write an (H, W) int label map as a DAVIS palette-indexed PNG.

        NB: PIL's Image.fromarray(arr, mode="P") silently corrupts index
        values on save (bit-depth optimization); frombytes + putpalette
        preserves raw indices exactly."""
        from PIL import Image
        d = os.path.dirname(path)
        if d:   # bare filenames have no directory component to create
            os.makedirs(d, exist_ok=True)
        lab = np.ascontiguousarray(labels.astype(np.uint8))
        img = Image.frombytes("P", (lab.shape[1], lab.shape[0]), lab.tobytes())
        img.putpalette(DAVIS_PALETTE.flatten().tolist())
        img.save(path)
