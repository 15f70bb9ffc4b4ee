"""Mask-refinement decoder with per-object recurrence.

Rebuild of the reference's RVOS-lineage refinement head (SURVEY.md §3.1
component #10: encoder-decoder with backbone skips and a recurrent
ConvLSTM/ConvGRU cell carried across frames). TPU-first choices:

  * the object axis is folded into the batch axis (B*M) so every conv is
    one large NHWC MXU op instead of a Python loop over objects;
  * recurrence across *frames* is a single ConvGRU cell at the coarsest
    level whose state is carried through `lax.scan` in the caller
    (models/dmm.py) — compiler-friendly, no Python frame loop;
  * upsampling is `jax.image.resize` bilinear (XLA lowers this to
    gather/convs it can fuse); all shapes static.

Inputs per frame: the backbone pyramid {c2..c5}, the matcher's aggregated
soft mask per object, and the previous recurrent state. Output: per-object
mask logits at input resolution plus the new state.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


def _resize(x: jnp.ndarray, hw: Tuple[int, int]) -> jnp.ndarray:
    # NOTE (r4 refutation): an exact elementwise scale-2 fast path
    # (shifted blends + interleave instead of resize's spatial-contraction
    # dot_generals) was built and measured through the production bench:
    # 2246 -> 1909 fps, i.e. jax.image.resize's matmul lowering BEATS the
    # slice/concat/stack formulation for the 128-channel upsamples here.
    # The pathological resizes were the 1-channel MASK ones — fixed by
    # channel-free residency (_resize_hw3), not by replacing resize.
    return jax.image.resize(x, x.shape[:-3] + hw + x.shape[-1:], method="bilinear")


def _resize_hw3(m: jnp.ndarray, hw: Tuple[int, int]) -> jnp.ndarray:
    """Bilinear-resize a channel-free mask stack (..., h, w) on its
    trailing dims. Same math as _resize on (..., h, w, 1), but the minor
    dim stays w (lanes ~full) instead of a singleton channel (lanes 1/128
    occupied — the intra-decoder breakdown measured the (B*M, h, w, 1)
    mask resizes at ~1.4 ms of a 9 ms step for ~4 MB of real bytes)."""
    if m.shape[-2:] == hw:
        return m
    return jax.image.resize(m, m.shape[:-2] + hw, method="bilinear")


class _ConvParams(nn.Module):
    """Parameters of an ``nn.Conv`` (same tree: kernel + bias, same init)
    without the conv call — lets the owner fuse several convs over the
    same input into one ``lax.conv`` with concatenated kernels while
    keeping the checkpoint layout of the separate-conv formulation."""

    features: int
    in_features: int
    kernel: Tuple[int, int] = (3, 3)

    @nn.compact
    def __call__(self):
        kh, kw = self.kernel
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (kh, kw, self.in_features, self.features),
                       jnp.float32)
        b = self.param("bias", nn.initializers.zeros_init(),
                       (self.features,), jnp.float32)
        return k, b


class ConvGRUCell(nn.Module):
    """Convolutional GRU over NHWC maps.

    The z and r gates read the same ``concat([x, h])`` input, and a conv
    is linear in its output channels — so both gates run as ONE conv with
    kernels concatenated along cout (exact same math and the exact
    param tree of the two-conv formulation; shipped checkpoints load
    unchanged). The GRU runs at batch B*M on tiny stride-32 maps where
    per-op overhead, not FLOPs, is the cost (bench/bench_convmarginal.py),
    so one fewer conv per frame is a real win."""

    features: int
    kernel: Tuple[int, int] = (3, 3)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, h, x):
        f = self.features
        xh = jnp.concatenate([x, h], axis=-1)
        cin = xh.shape[-1]
        kz, bz = _ConvParams(f, cin, self.kernel, name="gate_z")()
        kr, br = _ConvParams(f, cin, self.kernel, name="gate_r")()
        kc, bc = _ConvParams(f, cin, self.kernel, name="cand")()

        def conv(v, k, b):
            y = jax.lax.conv_general_dilated(
                v.astype(self.dtype), k.astype(self.dtype), (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return y + b.astype(self.dtype)

        zr = nn.sigmoid(conv(xh, jnp.concatenate([kz, kr], axis=-1),
                             jnp.concatenate([bz, br])))
        z, r = zr[..., :f], zr[..., f:]
        cand = nn.tanh(conv(jnp.concatenate([x, r * h], axis=-1), kc, bc))
        return (1.0 - z) * h + z * cand


class _UpBlock(nn.Module):
    """Upsample 2x, merge a lateral skip, fuse with two convs."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, skip):
        x = _resize(x, skip.shape[-3:-1])
        lat = nn.Conv(self.features, (1, 1), dtype=self.dtype,
                      param_dtype=jnp.float32, name="lateral")(skip)
        x = nn.Conv(self.features, (3, 3), dtype=self.dtype,
                    param_dtype=jnp.float32, name="merge")(x)
        x = nn.relu(x + lat)
        x = nn.relu(nn.Conv(self.features, (3, 3), dtype=self.dtype,
                            param_dtype=jnp.float32, name="fuse")(x))
        return x


class RefinementDecoder(nn.Module):
    """Per-object mask refinement.

    __call__(feats, agg_masks, state) with
      feats: dict c2 (B,H/4,W/4,C2) .. c5 (B,H/32,W/32,C5)
      agg_masks: (B, M, H, W) soft masks in [0, 1] from the matcher
      state: (B, M, H/32, W/32, F) ConvGRU hidden or None
    returns (logits (B, M, H, W), new_state).
    """

    features: int = 128
    recurrent: bool = True
    dtype: Any = jnp.float32
    # finest skip level consumed: "c2" (full quality, stride-4 detail) or
    # "c3" (fast mode: skips the two stride-4 convs, ~80% of decoder FLOPs)
    fine_level: str = "c2"

    @nn.compact
    def __call__(self, feats: Dict[str, jnp.ndarray], agg_masks: jnp.ndarray,
                 state: Optional[jnp.ndarray] = None,
                 out_hw: Optional[Tuple[int, int]] = None):
        # Output resolution: under mask_res="stride4" the aggregated masks
        # arrive at (H/4, W/4) while logits must stay full-res, so the
        # caller passes the true image size (c2*4 is only exact for
        # div-4 sizes; c2 is ceil-sized otherwise).
        B, M = agg_masks.shape[:2]
        H, W = out_hw or (feats["c2"].shape[-3] * 4, feats["c2"].shape[-2] * 4)
        mh, mw = agg_masks.shape[2:]
        f = self.features

        # Broadcast frame features over objects, fold objects into batch.
        def fold(x):          # (B, h, w, c) -> (B*M, h, w, c)
            x = jnp.broadcast_to(x[:, None], (B, M) + x.shape[1:])
            return x.reshape((B * M,) + x.shape[2:])

        # channel-free mask residency (see _resize_hw3)
        mask3 = agg_masks.reshape(B * M, mh, mw).astype(self.dtype)

        c5 = fold(feats["c5"]).astype(self.dtype)
        h32 = c5.shape[-3:-1]
        m32 = _resize_hw3(mask3, h32)[..., None]
        x = jnp.concatenate([c5, m32], axis=-1)
        x = nn.relu(nn.Conv(f, (3, 3), dtype=self.dtype,
                            param_dtype=jnp.float32, name="head")(x))

        if self.recurrent:
            if state is None:
                state = jnp.zeros((B, M) + h32 + (f,), self.dtype)
            h_prev = state.reshape((B * M,) + h32 + (f,)).astype(self.dtype)
            x = ConvGRUCell(f, dtype=self.dtype, name="gru")(h_prev, x)
            # carry stays f32 so scan carries have a stable dtype under bf16
            new_state = x.reshape((B, M) + h32 + (f,)).astype(jnp.float32)
        else:
            # f32 like the recurrent branch: scan carries need stable dtypes
            new_state = jnp.zeros((B, M) + h32 + (f,), jnp.float32)

        levels = ("c4", "c3", "c2")
        levels = levels[:levels.index(self.fine_level) + 1]
        for level in levels:
            skip = fold(feats[level]).astype(self.dtype)
            sk_hw = skip.shape[-3:-1]
            m_lvl = _resize_hw3(mask3, sk_hw)[..., None]
            skip = jnp.concatenate([skip, m_lvl], axis=-1)
            x = _UpBlock(f, dtype=self.dtype, name=f"up_{level}")(x, skip)

        logits = nn.Conv(1, (3, 3), dtype=jnp.float32, param_dtype=jnp.float32,
                         name="out")(x)[..., 0]               # (B*M, H/4, W/4)
        logits = _resize_hw3(logits, (H, W))   # channel-free: w in lanes
        return logits.reshape(B, M, H, W), new_state


class _SplitConcatConv(nn.Module):
    """3x3 conv over ``concat(parts)`` where some parts are frame-shared.

    The per-object path concatenates per-object maps (batch B*M) with
    frame-shared maps broadcast to every object slot (``fold(proj[level])``
    in the naive formulation). Convolution is linear in the input channels,
    so ``conv(concat([x, q, m])) == conv_x(x) + conv_q(q) + conv_m(m) + b``
    with kernel slices — and the frame-shared slice can run at batch B
    instead of B*M, then broadcast-add into the object grid. At M=16 that
    removes (M-1)/M of the shared-slice FLOPs (~16 GF/frame-batch at the
    p3 c2 level) AND never materializes the (B*M, h, w, g) broadcast input
    in HBM (the step is bandwidth-bound; see ROUND_NOTES r3 decoder audit).

    The parameter tree (``kernel`` (kh, kw, sum_cin, features) + ``bias``)
    is exactly ``nn.Conv(features, kernel)`` over the concatenation — init
    distribution included (lecun_normal over the FULL fan-in) — so shipped
    checkpoints trained with the concat formulation load unchanged. Each
    partial conv accumulates in f32 on the MXU and rounds to ``dtype``, so
    the split equals the concat conv up to float summation order (tested in
    tests/test_decoder.py::test_split_concat_conv_matches_naive).
    """

    features: int
    kernel: Tuple[int, int] = (3, 3)
    dtype: Any = jnp.float32
    split: bool = True     # False = naive concat conv (test/debug reference)

    @nn.compact
    def __call__(self, parts, B: int, M: int):
        """parts: ordered [(array, is_shared)] — per-object arrays are
        (B*M, h, w, c), frame-shared arrays are (B, h, w, c); channel
        order defines the kernel slice layout (must match the naive
        concat order)."""
        kh, kw = self.kernel
        cin = sum(int(p.shape[-1]) for p, _ in parts)
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (kh, kw, cin, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros_init(),
                          (self.features,), jnp.float32)

        def part_conv(p, k):
            # partial outputs stay at the decoder dtype (bf16 in production)
            # so the split adds no HBM traffic over the concat conv; the MXU
            # still accumulates each partial in f32 internally
            return jax.lax.conv_general_dilated(
                p.astype(self.dtype), k.astype(self.dtype), (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ).astype(self.dtype)

        bias = bias.astype(self.dtype)
        if not self.split:
            def unfold(p, shared):   # broadcast shared maps over objects
                if not shared:
                    return p
                p = jnp.broadcast_to(p[:, None], (B, M) + p.shape[1:])
                return p.reshape((B * M,) + p.shape[2:])
            full = jnp.concatenate([unfold(p, sh) for p, sh in parts], axis=-1)
            return part_conv(full, kernel) + bias

        # ONE conv per {per-object, shared} group, not one per part: conv
        # is linear in cin, so conv(concat(inputs), concat(kernel slices))
        # == the sum of the per-part convs — and per-op cost, not FLOPs,
        # prices the per-object path (bench/bench_convmarginal.py). The
        # kernel slices are gathered in part order, so the param layout
        # (and shipped checkpoints) are untouched.
        bounds, off = [], 0
        for p, _ in parts:
            bounds.append((off, off + int(p.shape[-1])))
            off += int(p.shape[-1])

        def group_conv(flag):
            idx = [i for i, (_, sh) in enumerate(parts) if sh == flag]
            if not idx:
                return None
            xs = [parts[i][0] for i in idx]
            ks = [kernel[:, :, bounds[i][0]:bounds[i][1], :] for i in idx]
            x = xs[0] if len(xs) == 1 else jnp.concatenate(
                [v.astype(self.dtype) for v in xs], axis=-1)
            k = ks[0] if len(ks) == 1 else jnp.concatenate(ks, axis=2)
            return part_conv(x, k)

        obj_acc = group_conv(False)
        shared_acc = group_conv(True)
        if obj_acc is None:
            out = jnp.broadcast_to((shared_acc + bias)[:, None],
                                   (B, M) + shared_acc.shape[1:])
            return out.reshape((B * M,) + shared_acc.shape[1:])
        hw_c = obj_acc.shape[1:]
        out = obj_acc.reshape((B, M) + hw_c)
        if shared_acc is not None:
            out = out + shared_acc[:, None]
        return (out + bias).reshape((B * M,) + hw_c)


class SharedFPNDecoder(nn.Module):
    """Object-proportional refinement decoder (the production variant).

    The legacy ``RefinementDecoder`` broadcasts the frame pyramid to all M
    padded object slots and runs the full `features`-wide conv stack per
    slot — at M_max=16 with 2-3 live objects that is ~6-16x redundant
    compute (the decoder is ~99% of the frame step; SURVEY.md §4.1 "HOT
    LOOP #2"). This variant splits the work:

      * a **shared frame path** — an FPN top-down stack at `features`
        width (lateral 1x1 + merge/fuse 3x3 per level) — runs ONCE per
        frame on the plain batch axis B. This is where ~all the FLOPs
        live, and it is mask-independent, so per-object slots add nothing.
      * a **per-object path** at `obj_features` width (default 32 vs 128)
        consumes 1x1-projected shared features plus the object's soft
        mask at every scale, with a ConvGRU recurrence at stride 32.
        Per-slot cost drops ~15x; total decoder FLOPs at M=16 drop ~6-8x.

    Same interface as RefinementDecoder; state is (B, M, H/32, W/32,
    obj_features).
    """

    features: int = 128        # shared frame-path width
    obj_features: int = 32     # per-object path width
    recurrent: bool = True
    dtype: Any = jnp.float32
    fine_level: str = "c2"
    # Per-object path architecture knobs (A/B levers for the decoder-
    # dominated step; ROUND_NOTES r3 FLOP audit: the two 3x3 convs at the
    # finest level are ~75% of the per-object FLOPs and run at 32-65
    # channels, i.e. fractional MXU lane utilization). Defaults reproduce
    # the shipped architecture exactly (checkpoint-compatible).
    obj_fuse: str = "conv3"    # "conv3" (shipped) | "conv1" | "none"
    obj_features_fine: int = 0  # 0 = obj_features; else per-object width
    #                             at the finest level only (taper)
    features_fine: int = 0     # 0 = features; else SHARED-path width at
    #                            the finest level only (the stride-4
    #                            merge/fuse convs are the decoder's
    #                            largest FLOP block — r4 A/B lever)
    # r5 lane-utilization levers (the step is neither FLOP- nor HBM-bound;
    # utils/bytes_model.py r4 calibration). Defaults reproduce the shipped
    # architecture exactly.
    obj_merge_fine_k: int = 3  # merge-conv kernel at the finest PER-OBJECT
    #                            level only (1 = pointwise; the 3x3 spatial
    #                            context then comes from the out conv)
    obj_fine_level: str = ""   # "" = fine_level. "c3": stop the per-object
    #                            loop at stride 8 and recover stride-4
    #                            detail from the SHARED fine-level features
    #                            via a dynamic-mix head: a detail_dim-wide
    #                            shared basis (full-lane conv at batch B)
    #                            contracted with per-object mixing weights
    #                            on the MXU — per-object stride-4 convs
    #                            (obj_c2: 1.65 ms of the 8.8 ms p3/B=16
    #                            step) disappear entirely.
    detail_dim: int = 16       # basis width of the dynamic-mix detail head
    detail_basis_k: int = 3    # basis conv kernel (per-op profile r5: the
    #                            3x3 128->16 basis conv is the step's
    #                            single largest op, 0.47 ms/frame-batch,
    #                            input-read bound; 1 = pointwise probe)

    @nn.compact
    def __call__(self, feats: Dict[str, jnp.ndarray], agg_masks: jnp.ndarray,
                 state: Optional[jnp.ndarray] = None,
                 out_hw: Optional[Tuple[int, int]] = None,
                 stop_at: Optional[str] = None):
        # stop_at (static; profiling only — bench/bench_breakdown.py's
        # intra-decoder prefixes): return (x, state) right after the named
        # block, one of "shared", "proj", "gru", "obj_c4", "obj_c3",
        # "obj_c2". Zero cost when None (Python-level branch at trace
        # time); outputs are NOT the decoder contract, just live tensors
        # for the bench's DCE guard.
        # see RefinementDecoder: masks may arrive at stride-4 residency;
        # the caller passes the true output size
        B, M = agg_masks.shape[:2]
        H, W = out_hw or (feats["c2"].shape[-3] * 4, feats["c2"].shape[-2] * 4)
        mh, mw = agg_masks.shape[2:]
        f, g = self.features, self.obj_features
        levels = ("c4", "c3", "c2")
        levels = levels[:levels.index(self.fine_level) + 1]

        def conv(ch, k, name, dt=None):
            return nn.Conv(ch, (k, k), dtype=dt or self.dtype,
                           param_dtype=jnp.float32, name=name)

        # ---- shared frame path: FPN top-down, batch B only ----------
        x = nn.relu(conv(f, 3, "head")(feats["c5"].astype(self.dtype)))
        shared = {"c5": x}
        for level in levels:
            f_l = f
            if level == levels[-1] and self.features_fine:
                f_l = self.features_fine
            skip = feats[level].astype(self.dtype)
            x = _resize(x, skip.shape[-3:-1])
            lat = conv(f_l, 1, f"lat_{level}")(skip)
            x = nn.relu(conv(f_l, 3, f"merge_{level}")(x) + lat)
            x = nn.relu(conv(f_l, 3, f"fuse_{level}")(x))
            shared[level] = x
            if stop_at == f"shared_{level}":
                return x, state
        if stop_at == "shared":
            return x, state
        # cheap 1x1 projections f -> g feeding the per-object path
        proj = {k: conv(g, 1, f"toobj_{k}")(v) for k, v in shared.items()}
        if stop_at == "proj":
            return sum(p.sum() for p in proj.values()).reshape(1, 1), state

        # ---- per-object path: batch B*M at g channels ----------------
        # Frame-shared projections enter per-object convs through
        # _SplitConcatConv: the shared kernel slice runs at batch B and is
        # broadcast-added, so proj[level] is never folded to (B*M, ...) —
        # checkpoint-compatible with the naive concat formulation.
        # channel-free (B*M, h, w) residency for the soft masks: every
        # resize keeps w in the lanes; the singleton channel appears only
        # at each concat site (see _resize_hw3)
        mask3 = agg_masks.reshape(B * M, mh, mw).astype(self.dtype)
        h32 = proj["c5"].shape[-3:-1]
        m32 = _resize_hw3(mask3, h32)[..., None]
        x = nn.relu(_SplitConcatConv(g, dtype=self.dtype, name="obj_head")(
            [(proj["c5"], True), (m32, False)], B, M))
        if stop_at == "obj_head":
            return x, state

        if self.recurrent:
            if state is None:
                state = jnp.zeros((B, M) + h32 + (g,), self.dtype)
            h_prev = state.reshape((B * M,) + h32 + (g,)).astype(self.dtype)
            x = ConvGRUCell(g, dtype=self.dtype, name="gru")(h_prev, x)
            new_state = x.reshape((B, M) + h32 + (g,)).astype(jnp.float32)
        else:
            new_state = jnp.zeros((B, M) + h32 + (g,), jnp.float32)
        if stop_at == "gru":
            return x, new_state

        obj_levels = levels
        if self.obj_fine_level:
            if self.obj_fine_level not in levels:
                raise ValueError(
                    f"obj_fine_level {self.obj_fine_level!r} not within "
                    f"fine_level {self.fine_level!r}'s pyramid {levels}")
            obj_levels = levels[:levels.index(self.obj_fine_level) + 1]
        for level in obj_levels:
            g_l = g
            k_l = 3
            if level == obj_levels[-1]:
                if self.obj_features_fine:
                    g_l = self.obj_features_fine
                k_l = self.obj_merge_fine_k
            hw = proj[level].shape[-3:-1]
            x = _resize(x, hw)
            m_lvl = _resize_hw3(mask3, hw)[..., None]
            x = nn.relu(
                _SplitConcatConv(g_l, kernel=(k_l, k_l), dtype=self.dtype,
                                 name=f"obj_merge_{level}")(
                    [(x, False), (proj[level], True), (m_lvl, False)], B, M))
            if self.obj_fuse == "conv3":
                x = x + nn.relu(conv(g_l, 3, f"obj_fuse_{level}")(x))
            elif self.obj_fuse == "conv1":
                x = x + nn.relu(conv(g_l, 1, f"obj_fuse_{level}")(x))
            elif self.obj_fuse != "none":
                raise ValueError(f"unknown obj_fuse {self.obj_fuse!r}")
            if stop_at == f"obj_{level}":
                return x, new_state

        logits = nn.Conv(1, (3, 3), dtype=jnp.float32, param_dtype=jnp.float32,
                         name="out")(x)[..., 0]         # (B*M, h_obj, w_obj)
        if obj_levels is not levels:
            # dynamic-mix detail head: the per-object path stopped above
            # the finest shared level, so stride-fine detail comes from
            # the SHARED fine features — a detail_dim-wide basis (conv at
            # batch B, full MXU lanes) contracted with per-object mixing
            # weights derived from the object's coarse features. The
            # contraction is one (h*w, D) x (D, M) matmul per frame —
            # full-lane MXU work in place of fractional-lane per-object
            # stride-4 convs.
            hw_f = proj[levels[-1]].shape[-3:-1]
            logits = _resize_hw3(logits, hw_f)          # (B*M, h4, w4)
            kb = self.detail_basis_k
            basis = nn.Conv(self.detail_dim, (kb, kb), dtype=self.dtype,
                            param_dtype=jnp.float32, name="detail_basis")(
                                shared[levels[-1]])     # (B, h4, w4, D)
            pooled = x.mean(axis=(1, 2)).reshape(B, M, -1)
            mix = nn.Dense(self.detail_dim, param_dtype=jnp.float32,
                           dtype=jnp.float32, name="detail_mix")(
                               pooled.astype(jnp.float32))   # (B, M, D)
            detail = jnp.einsum("bhwd,bmd->bmhw", basis, mix,
                                preferred_element_type=jnp.float32)
            logits = (logits.reshape(B, M, *hw_f) + detail).reshape(
                (B * M,) + hw_f)
        logits = _resize_hw3(logits, (H, W))   # channel-free: w in lanes
        return logits.reshape(B, M, H, W), new_state
