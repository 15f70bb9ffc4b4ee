"""Fused cost-matrix + Sinkhorn matcher as a single Pallas TPU kernel.

Motivation (SURVEY.md §4.1 "HOT LOOP #1", north star BASELINE.json:5): the
matcher operates on tiny (M<=16, N<=128) matrices. On GPU/PyTorch the
reference pays per-iteration kernel-launch overhead and HBM round trips for
~K_pgd*K_proj tensor ops on matrices that fit in L1. On TPU we fuse the
whole thing: one kernel reads template/proposal masks + features from HBM
once, builds the cost matrix with two MXU matmuls in VMEM, runs all
Sinkhorn iterations on VMEM-resident (M, N) tiles, and writes the
assignment X back — a single HBM round trip per frame.

Layout (per grid step = one batch element):
    tmpl_masks (M, P)  prop_masks (N, P)   P = flattened mask pixels
    tmpl_feats (M, D)  prop_feats (N, D)
    row_mask   (M,) f32{0,1}   col_mask (N,) f32{0,1}
    out X      (M, N)

All of M, N, D, P are padded to lane/sublane multiples by the host wrapper
(`fused_cost_match`). The Sinkhorn recursion matches ops/matching.py
bit-for-bit in exact arithmetic (tests/test_pallas_matcher.py checks
interpret-mode and compiled parity against the jnp path).

Backward: the kernel is wrapped in jax.custom_vjp using the envelope
gradient — at convergence, dL/dC = (X ⊙ (G - rowmean-ish terms))/eps is
NOT what we use; instead we recompute X = exp((f+g-C)/eps) differentiably
w.r.t. C with stop-gradient duals (same `implicit_grad=True` semantics as
ops/matching.sinkhorn_match), and chain into the cost matrix analytically.
For exact unrolled gradients, use the jnp path (the default in training
config when `matching.use_pallas=False`).

PGD+Dykstra is deliberately NOT fused (decision per SURVEY.md §4.4 /
round-1 verdict): its inner row-simplex projection needs a per-row sort
(O(N log N) data-dependent permutation), which Mosaic lowers poorly and
which breaks the all-matmul/VPU structure that makes this kernel a single
VMEM-resident loop. Sinkhorn reaches the same LP solutions as eps->0
(verified against scipy Hungarian in tests/test_matching.py), is the
TPU-friendly solver BASELINE.json:5 sanctions, and its iterations are
pure row/col reductions the VPU executes at full width. The PGD solver
remains available as the jnp `ops/matching.pgd_match` path
(`matching.solver="pgd"`) for parity experiments; at 0.022 ms/frame the
fused Sinkhorn matcher is already dispatch-bound, so a fused PGD variant
could not measurably improve the frame step anyway.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e30


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m



def _cost_block(tm, pm, tf, pf, iou_weight):
    """Cost matrix on VMEM-resident blocks: two MXU matmuls + VPU tail."""
    inter = jax.lax.dot_general(tm, pm, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
    area_t = jnp.sum(tm, axis=1, keepdims=True)
    area_p = jnp.sum(pm, axis=1, keepdims=True).T
    union = jnp.maximum(area_t + area_p - inter, 1e-6)
    iou = inter / union
    tnorm = tf * jax.lax.rsqrt(jnp.sum(tf * tf, axis=1, keepdims=True) + 1e-12)
    pnorm = pf * jax.lax.rsqrt(jnp.sum(pf * pf, axis=1, keepdims=True) + 1e-12)
    cos = jax.lax.dot_general(tnorm, pnorm, (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
    return iou_weight * (1.0 - iou) + (1.0 - iou_weight) * (1.0 - cos)


def _sinkhorn_block(C, rm, cm, *, epsilon, iters, epsilon_init=None):
    """Log-domain capped-column Sinkhorn on a VMEM-resident (M, N) block.
    Shared by both matcher kernels; mirrors ops/matching.sinkhorn_duals
    including the optional geometric eps-annealing schedule."""
    pair = (rm[:, None] * cm[None, :]) > 0.5

    def lse_rows(z):
        zm = jnp.where(pair, z, _NEG)
        mx = jnp.maximum(jnp.max(zm, axis=1, keepdims=True), _NEG / 2)
        s = jnp.sum(jnp.where(pair, jnp.exp(zm - mx), 0.0), axis=1,
                    keepdims=True)
        return mx + jnp.log(jnp.maximum(s, 1e-38))

    def lse_cols(z):
        zm = jnp.where(pair, z, _NEG)
        mx = jnp.maximum(jnp.max(zm, axis=0, keepdims=True), _NEG / 2)
        s = jnp.sum(jnp.where(pair, jnp.exp(zm - mx), 0.0), axis=0,
                    keepdims=True)
        return mx + jnp.log(jnp.maximum(s, 1e-38))

    anneal = epsilon_init is not None and epsilon_init > epsilon
    if anneal:
        anneal_steps = max(int(iters * 0.7), 1)
        # Python-side log: Mosaic cannot legalize math.powf in-kernel, so
        # the schedule is eps_k = eps0 * exp(k * log(decay)) with exp only
        import math
        log_decay = math.log((epsilon / epsilon_init) ** (1.0 / anneal_steps))

    def body(k, g):
        if anneal:
            eps = jnp.maximum(
                epsilon_init * jnp.exp(k.astype(jnp.float32) * log_decay),
                epsilon)
        else:
            eps = epsilon
        negC = jnp.where(pair, -C / eps, _NEG)
        f = -eps * lse_rows(negC + g / eps)
        f = jnp.where(rm[:, None] > 0.5, f, 0.0)
        g2 = jnp.minimum(0.0, -eps * lse_cols(negC + f / eps))
        return jnp.where(cm[None, :] > 0.5, g2, 0.0)

    g = jax.lax.fori_loop(0, iters, body,
                          jnp.zeros((1, C.shape[1]), jnp.float32))
    negC = jnp.where(pair, -C / epsilon, _NEG)
    f = -epsilon * lse_rows(negC + g / epsilon)
    f = jnp.where(rm[:, None] > 0.5, f, 0.0)
    logits = (f + g - C) / epsilon
    return jnp.where(pair, jnp.exp(jnp.minimum(logits, 30.0)), 0.0)


def _matcher_kernel(tm_ref, pm_ref, tf_ref, pf_ref, rm_ref, cm_ref, x_ref,
                    *, epsilon: float, iters: int, iou_weight: float,
                    epsilon_init=None):
    """Kernel body. Block shapes carry a leading batch dim of 1:
    tm (1,M,P) pm (1,N,P) tf (1,M,D) pf (1,N,D) rm (1,1,M) cm (1,1,N)
    -> x (1,M,N). All f32 in VMEM."""
    C = _cost_block(tm_ref[0], pm_ref[0], tf_ref[0], pf_ref[0], iou_weight)
    x_ref[0] = _sinkhorn_block(C, rm_ref[0, 0, :], cm_ref[0, 0, :],
                               epsilon=epsilon, iters=iters,
                               epsilon_init=epsilon_init)


def _pallas_forward(tm, pm, tf, pf, rm, cm, *, epsilon, iters, iou_weight,
                    interpret):
    """Batched pallas_call. Inputs already padded: tm (B,M,P) pm (B,N,P)
    tf (B,M,D) pf (B,N,D) rm (B,M) cm (B,N) float32."""
    B, M, P = tm.shape
    N = pm.shape[1]
    D = tf.shape[2]
    kern = functools.partial(_matcher_kernel, epsilon=epsilon, iters=iters,
                             iou_weight=iou_weight)
    grid = (B,)

    def im3(i):
        return (i, 0, 0)

    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((B, M, N), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, M, P), im3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, P), im3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, M, D), im3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, D), im3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, M), im3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, N), im3, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, M, N), im3, memory_space=pltpu.VMEM),
        interpret=interpret,
    )(tm, pm, tf, pf, rm[:, None, :], cm[:, None, :])


def fused_cost_match(tmpl_masks: jnp.ndarray, prop_masks: jnp.ndarray,
                     tmpl_feats: jnp.ndarray, prop_feats: jnp.ndarray,
                     row_mask: jnp.ndarray, col_mask: jnp.ndarray,
                     epsilon: float = 0.05, iters: int = 30,
                     iou_weight: float = 0.3,
                     interpret: bool = False) -> jnp.ndarray:
    """Fused cost + Sinkhorn assignment.

    Args (batched):
      tmpl_masks (B, M, P), prop_masks (B, N, P): soft masks in [0, 1].
      tmpl_feats (B, M, D), prop_feats (B, N, D): pooled mask features.
      row_mask (B, M) bool, col_mask (B, N) bool.
    Returns X (B, M, N) float32, padded rows/cols exactly 0.

    The wrapper pads M/N/D/P up to TPU tile multiples (sublane 8, lane 128)
    and slices the result back, so callers keep natural sizes.
    """
    B, M, P = tmpl_masks.shape
    N = prop_masks.shape[1]
    D = tmpl_feats.shape[2]
    Mp, Np = _round_up(M, 8), _round_up(N, 128)
    Pp, Dp = _round_up(P, 128), _round_up(D, 128)

    def pad3(a, s1, s2):
        return jnp.pad(a.astype(jnp.float32),
                       ((0, 0), (0, s1 - a.shape[1]), (0, s2 - a.shape[2])))

    tm = pad3(tmpl_masks, Mp, Pp)
    pm = pad3(prop_masks, Np, Pp)
    tf = pad3(tmpl_feats, Mp, Dp)
    pf = pad3(prop_feats, Np, Dp)
    rm = jnp.pad(row_mask.astype(jnp.float32), ((0, 0), (0, Mp - M)))
    cm = jnp.pad(col_mask.astype(jnp.float32), ((0, 0), (0, Np - N)))

    X = _pallas_forward(tm, pm, tf, pf, rm, cm, epsilon=epsilon, iters=iters,
                        iou_weight=iou_weight, interpret=interpret)
    return X[:, :M, :N]


# ---------------------------------------------------------------------------
# Deeper fusion: feature-map pooling + cost + Sinkhorn in one kernel
# (north star BASELINE.json:5 — "ROI mask-feature pooling, cost matrix and
# matching all run as fused Pallas kernels").
# ---------------------------------------------------------------------------

def _pool_matcher_kernel(emb_ref, pmask_pool_ref, tm_ref, pm_ref, tf_ref,
                         rm_ref, cm_ref, x_ref,
                         *, epsilon: float, iters: int, iou_weight: float,
                         epsilon_init=None):
    """Block shapes (leading batch dim 1):
      emb        (1, P, D)   flattened embedding map (P = h*w pixels)
      pmask_pool (1, N, P)   proposal masks at embedding resolution
      tm         (1, M, Pc)  template masks at cost resolution
      pm         (1, N, Pc)  proposal masks at cost resolution
      tf         (1, M, D)   fixed template features (pooled at frame 1)
      rm (1,1,M) cm (1,1,N)  validity (f32 0/1)
      -> x (1, M, N)
    """
    # in-kernel mask-average pooling: (N, P) @ (P, D) on the MXU
    pmask = pmask_pool_ref[0]
    pooled = jax.lax.dot_general(pmask, emb_ref[0], (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
    denom = jnp.maximum(jnp.sum(pmask, axis=1, keepdims=True), 1e-6)
    pf = pooled / denom
    C = _cost_block(tm_ref[0], pm_ref[0], tf_ref[0], pf, iou_weight)
    x_ref[0] = _sinkhorn_block(C, rm_ref[0, 0, :], cm_ref[0, 0, :],
                               epsilon=epsilon, iters=iters,
                               epsilon_init=epsilon_init)


def _pool_cost_match_reference(emb, pmask_pool, tm, pm, tf, rm, cm,
                               epsilon, iters, iou_weight,
                               epsilon_init=None):
    """Pure-jnp reference of the fused kernel (used for the backward pass
    and for parity tests). Shapes as in fused_pool_cost_match."""
    from dmm_net_tpu.ops.cost import cost_matrix
    from dmm_net_tpu.ops.matching import sinkhorn_match

    rm_b = rm > 0.5 if rm.dtype != jnp.bool_ else rm
    cm_b = cm > 0.5 if cm.dtype != jnp.bool_ else cm
    pooled = jnp.einsum("bnp,bpd->bnd", pmask_pool, emb,
                        precision=jax.lax.Precision.HIGHEST)
    denom = jnp.maximum(jnp.sum(pmask_pool, axis=-1, keepdims=True), 1e-6)
    pf = pooled / denom
    C = cost_matrix(tm, pm, tf, pf, row_mask=rm_b, col_mask=cm_b,
                    iou_weight=iou_weight)
    return sinkhorn_match(C, rm_b, cm_b, epsilon=epsilon, iters=iters,
                          epsilon_init=epsilon_init)


@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(7, 8, 9, 10, 11))
def _fused_pool_cost_match(emb, pmask_pool, tm, pm, tf, rm, cm,
                           epsilon, iters, iou_weight, interpret,
                           epsilon_init):
    B, P, D = emb.shape
    N = pmask_pool.shape[1]
    M = tm.shape[1]
    Pc = tm.shape[2]
    kern = functools.partial(_pool_matcher_kernel, epsilon=epsilon,
                             iters=iters, iou_weight=iou_weight,
                             epsilon_init=epsilon_init)

    def im3(i):
        return (i, 0, 0)

    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((B, M, N), jnp.float32),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, P, D), im3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, P), im3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, M, Pc), im3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, Pc), im3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, M, D), im3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, M), im3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, N), im3, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, M, N), im3, memory_space=pltpu.VMEM),
        interpret=interpret,
    )(emb, pmask_pool, tm, pm, tf, rm[:, None, :], cm[:, None, :])


def _fpcm_fwd(emb, pmask_pool, tm, pm, tf, rm, cm,
              epsilon, iters, iou_weight, interpret, epsilon_init):
    X = _fused_pool_cost_match(emb, pmask_pool, tm, pm, tf, rm, cm,
                               epsilon, iters, iou_weight, interpret,
                               epsilon_init)
    return X, (emb, pmask_pool, tm, pm, tf, rm, cm)


def _fpcm_bwd(epsilon, iters, iou_weight, interpret, epsilon_init, res, gX):
    """Exact gradients by differentiating the jnp reference recompute —
    forward stays fused on-chip, backward pays one extra (non-fused)
    forward. Standard fused-kernel-with-reference-vjp pattern."""
    emb, pmask_pool, tm, pm, tf, rm, cm = res
    _, vjp = jax.vjp(
        lambda e, pp, a, b, c: _pool_cost_match_reference(
            e, pp, a, b, c, rm, cm, epsilon, iters, iou_weight,
            epsilon_init),
        emb, pmask_pool, tm, pm, tf)
    d_emb, d_pp, d_tm, d_pm, d_tf = vjp(gX)
    return d_emb, d_pp, d_tm, d_pm, d_tf, None, None


_fused_pool_cost_match.defvjp(_fpcm_fwd, _fpcm_bwd)


def fused_pool_cost_match(emb: jnp.ndarray, prop_masks_pool: jnp.ndarray,
                          tmpl_masks_cost: jnp.ndarray,
                          prop_masks_cost: jnp.ndarray,
                          tmpl_feats: jnp.ndarray,
                          row_mask: jnp.ndarray, col_mask: jnp.ndarray,
                          epsilon: float = 0.05, iters: int = 30,
                          iou_weight: float = 0.3,
                          interpret: bool | None = None,
                          epsilon_init: float | None = None) -> jnp.ndarray:
    """Feature pooling + cost + Sinkhorn in ONE Pallas kernel.

    Args:
      emb (B, P, D): flattened per-frame embedding map (P = h*w).
      prop_masks_pool (B, N, P): proposal masks at embedding resolution.
      tmpl_masks_cost (B, M, Pc), prop_masks_cost (B, N, Pc): masks at the
        (downsampled) cost-IoU resolution.
      tmpl_feats (B, M, D): fixed template features from frame 1.
      row_mask (B, M), col_mask (B, N): validity.
    Returns X (B, M, N). Differentiable (exact unrolled grads via the jnp
    reference in the backward pass).
    """
    if interpret is None:
        # Pallas TPU kernels only compile on TPU; everywhere else (CPU
        # tests, fake-device meshes, host_init's default_device(cpu)
        # context) fall back to interpreter mode.
        from dmm_net_tpu.kernels import auto_interpret
        interpret = auto_interpret()
    B, P, D = emb.shape
    M = tmpl_masks_cost.shape[1]
    N = prop_masks_pool.shape[1]
    Pc = tmpl_masks_cost.shape[2]
    Mp, Np = _round_up(M, 8), _round_up(N, 128)
    Pp, Dp = _round_up(P, 128), _round_up(D, 128)
    Pcp = _round_up(Pc, 128)

    def pad3(a, s1, s2):
        return jnp.pad(a.astype(jnp.float32),
                       ((0, 0), (0, s1 - a.shape[1]), (0, s2 - a.shape[2])))

    emb_p = pad3(emb, Pp, Dp)
    pmp = pad3(prop_masks_pool, Np, Pp)
    tmc = pad3(tmpl_masks_cost, Mp, Pcp)
    pmc = pad3(prop_masks_cost, Np, Pcp)
    tfp = pad3(tmpl_feats, Mp, Dp)
    rm = jnp.pad(row_mask.astype(jnp.float32), ((0, 0), (0, Mp - M)))
    cm = jnp.pad(col_mask.astype(jnp.float32), ((0, 0), (0, Np - N)))

    X = _fused_pool_cost_match(emb_p, pmp, tmc, pmc, tfp, rm, cm,
                               epsilon, iters, iou_weight, interpret,
                               epsilon_init)
    return X[:, :M, :N]
