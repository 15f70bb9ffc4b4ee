"""Fused bilinear-upsample + overlap-argmax label resolution.

Why this kernel exists (round-3 roofline work): the production frame step
is HBM-bandwidth-bound (bench.py `hbm_roofline_pct` ~110% of the XLA
bytes proxy), and its single largest avoidable traffic was the full-
resolution per-object logits round trip — the decoder's final
`jax.image.resize` materialized (B, M, H, W) float32 (~58 MB per 8-frame
batch at the p3 geometry) only for `resolve_overlaps` to immediately
reduce it to (B, H, W) uint8 labels. Under `model.logits_res="mask"` the
decoder keeps logits at its native stride-4 grid and this kernel produces
full-resolution labels directly:

    reads  logits (B, M, H/4, W/4) bf16     (~0.25 MB/frame)
    writes labels (B, H, W) int32           (~0.5 MB/frame)

instead of ~120 MB/frame of materialized upsampled logits. Bilinear
upsampling is expressed as two matmuls against row/column interpolation
matrices (MXU work, ~0.5 GFLOP/frame — noise): ONE column-pass matmul for
all objects at once ((M*h, w) is a contiguous reshape, MXU-friendly),
then a static per-object loop of row-pass matmuls with the running
max/argmax kept VMEM-resident. The interpolation matrices are extracted
from `jax.image.resize` itself (resize of an identity matrix), so the
kernel's upsampling matches the separable bilinear the rest of the
codebase uses, up to bf16 rounding of the operands.

All matmul operands are EXPLICITLY bf16 (weights are k/8 fractions for
the stride-4 case — exact in bf16; logits lose ~3 decimal digits, which
only moves exact-tie boundary pixels — quality A/B'd on flagship weights
in ROUND_NOTES r3). This makes the single-MXU-pass semantics part of the
function's contract, so the jnp fallback reproduces it exactly on every
backend instead of chasing precision flags: an earlier f32 version needed
Precision.HIGHEST (6 MXU passes, 2x slower) for kernel<->fallback parity
because DEFAULT-precision f32 dots round operands to bf16 invisibly.

Template validity is fused as an argmax GUARD (invalid objects never win)
rather than a -1e4 pre-mask of the logits, which removes a full
read+write pass over the logits tensor outside the kernel.

Gather-free by construction (see memory: gathers are poison on TPU; an
interp-matrix matmul is the house idiom, same as ops/roi_align).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.lru_cache(maxsize=32)
def _interp_matrix(n_in: int, n_out: int) -> np.ndarray:
    """(n_in, n_out) matrix I with resize(x, axis) == x @ I: triangle
    (bilinear) weights at half-pixel sample centers with edge clamp — the
    same convention jax.image.resize(method="bilinear") uses for
    UPsampling (antialias only changes downscales), asserted equal in
    tests/test_resolve_kernel.py. Pure numpy on purpose: this runs at
    TRACE time inside jitted steps (a jnp implementation would turn into
    a tracer and break np.asarray). Cached: shapes are static per config."""
    out = np.zeros((n_in, n_out), np.float32)
    if n_in == n_out:
        np.fill_diagonal(out, 1.0)
        return out
    scale = n_in / n_out
    for o in range(n_out):
        x = min(max((o + 0.5) * scale - 0.5, 0.0), n_in - 1.0)
        i0 = int(np.floor(x))
        f = x - i0
        i1 = min(i0 + 1, n_in - 1)
        out[i0, o] += 1.0 - f
        out[i1, o] += f
    return out


def _resolve_kernel(v_ref, lg_ref, r_ref, c_ref, out_ref, *, M: int,
                    bg_logit: float):
    """One batch element: labels = argmax over upsampled object logits.

    v_ref (B, M) int32 validity in SMEM (whole array — SMEM blocks can't
    split the batch dim; indexed by program_id); lg_ref (1, M, h, w) bf16;
    r_ref (1, H, h) bf16 row-interp (transposed so the matmul is R @ U1);
    c_ref (1, w, W) bf16 col-interp; out (1, H, W) int32.
    Strict `>` keeps the earlier object on exact ties — same semantics as
    jnp.argmax — and `best > bg_logit` sends ties-with-background to
    background, matching resolve_overlaps. Invalid slots are excluded by
    the update guard, so they can never win no matter their logits.
    """
    b = pl.program_id(0)
    R = r_ref[0]                                    # (H, h)
    C = c_ref[0]                                    # (w, W)
    H, W = R.shape[0], C.shape[1]
    h, w = lg_ref.shape[2], lg_ref.shape[3]
    U1 = jax.lax.dot_general(lg_ref[0].reshape(M * h, w), C,
                             (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    U1 = U1.astype(jnp.bfloat16)                    # row-pass operand
    best = jnp.full((H, W), -jnp.inf, jnp.float32)
    idx = jnp.zeros((H, W), jnp.int32)
    for m in range(M):                              # static: M <= 16/32
        U = jax.lax.dot_general(R, U1[m * h:(m + 1) * h],
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        upd = (U > best) & (v_ref[b, m] != 0)
        best = jnp.where(upd, U, best)
        idx = jnp.where(upd, m, idx)
    out_ref[0] = jnp.where(best > bg_logit, idx + 1, 0)


def fused_resolve_upsample(logits: jnp.ndarray, tmpl_valid: jnp.ndarray,
                           out_hw, bg_threshold: float = 0.5,
                           interpret: bool | None = None) -> jnp.ndarray:
    """logits (B, M, h, w) at the mask grid -> labels (B, H, W) uint8 at
    full resolution, without materializing upsampled logits."""
    if interpret is None:
        # Pallas TPU kernels only compile on TPU; everywhere else (CPU
        # tests, fake-device meshes, host_init's default_device(cpu)
        # context) fall back to interpreter mode.
        from dmm_net_tpu.kernels import auto_interpret
        interpret = auto_interpret()
    B, M, h, w = logits.shape
    H, W = out_hw
    bg_logit = float(math.log(bg_threshold / (1.0 - bg_threshold)))

    # lane/sublane padding: last dim -> x128, second-to-last -> x8.
    # Zero padding is correct: R/C rows+cols for padded samples are zero,
    # so padded logits contribute exactly 0 to every in-range output.
    wp, Wp = _round_up(w, 128), _round_up(W, 128)
    hp, Hp = _round_up(h, 8), _round_up(H, 8)
    lg = jnp.pad(logits.astype(jnp.bfloat16),
                 ((0, 0), (0, 0), (0, hp - h), (0, wp - w)))
    R = jnp.asarray(_interp_matrix(h, H)).T         # (H, h)
    C = jnp.asarray(_interp_matrix(w, W))           # (w, W)
    R = jnp.pad(R, ((0, Hp - H), (0, hp - h))).astype(jnp.bfloat16)
    C = jnp.pad(C, ((0, wp - w), (0, Wp - W))).astype(jnp.bfloat16)
    valid = tmpl_valid.astype(jnp.int32)            # (B, M) -> SMEM

    kern = functools.partial(_resolve_kernel, M=M, bg_logit=bg_logit)

    labels = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((B, Hp, Wp), jnp.int32),
        grid=(B,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # valid: whole (B, M)
            pl.BlockSpec((1, M, hp, wp), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Hp, hp), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, wp, Wp), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, Hp, Wp), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(valid, lg, R[None], C[None])
    return labels[:, :H, :W].astype(jnp.uint8)


def resolve_upsample_jnp(logits: jnp.ndarray, tmpl_valid: jnp.ndarray,
                         out_hw, bg_threshold: float = 0.5) -> jnp.ndarray:
    """jnp reference/fallback (CPU tests, non-TPU backends): the SAME
    bf16 operands and column-then-row association as the kernel, so both
    agree everywhere except exact floating ties, on every backend."""
    B, M, h, w = logits.shape
    H, W = out_hw
    bg_logit = float(math.log(bg_threshold / (1.0 - bg_threshold)))
    lg = logits.astype(jnp.bfloat16)
    R = jnp.asarray(_interp_matrix(h, H)).astype(jnp.bfloat16)  # (h, H)
    C = jnp.asarray(_interp_matrix(w, W)).astype(jnp.bfloat16)  # (w, W)
    u1 = jnp.einsum("bmhw,wW->bmhW", lg, C,
                    preferred_element_type=jnp.float32).astype(jnp.bfloat16)
    up = jnp.einsum("hH,bmhW->bmHW", R, u1,
                    preferred_element_type=jnp.float32)
    up = jnp.where(tmpl_valid[..., None, None], up, -jnp.inf)
    idx = jnp.argmax(up, axis=1)
    best = jnp.max(up, axis=1)
    return jnp.where(best > bg_logit, idx + 1, 0).astype(jnp.uint8)
