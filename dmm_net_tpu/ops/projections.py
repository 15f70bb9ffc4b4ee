"""Euclidean projections onto the relaxed assignment polytope's factor sets.

The DMM-Net matching layer (reference paper arXiv:1909.12471 §3.2; SURVEY.md
§4.4) relaxes bipartite matching of m templates to n proposals (n >= m) to

    min <C, X>   s.t.   X >= 0,  sum_j X[i, j] = 1 (rows),  sum_i X[i, j] <= 1 (cols)

and solves it by projected gradient descent, each projection computed by
Dykstra's alternating projections between the two factor sets:

  * rows: the probability simplex  {x >= 0, sum x = 1}   (closed form,
    sort + threshold — Duchi et al. 2008),
  * cols: the "capped" set {x >= 0, sum x <= 1} (clip at zero; if the sum
    still exceeds 1, fall through to the simplex projection).

All functions are pure jnp, fully vectorized over rows/cols (sort + cumsum
— no data-dependent control flow), mask-aware for padded shapes, and safe
under jit/vmap/grad. TPU note: these are VPU-bound ops on tiny (M, N)
tiles; the fused Pallas matcher kernel (kernels/matcher.py) keeps the whole
iteration in VMEM instead of round-tripping HBM per step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_NEG = -1e30  # effective -inf that survives arithmetic in float32


def project_simplex(v: jnp.ndarray, mask: jnp.ndarray | None = None,
                    radius: float | jnp.ndarray = 1.0) -> jnp.ndarray:
    """Euclidean projection of the last axis of `v` onto the simplex
    {x >= 0, sum x = radius}, restricted to `mask`-valid entries.

    Invalid entries get exactly 0. Vectorized over leading axes.
    Algorithm: sort descending, tau = (cumsum - radius)/k at the largest k
    with v_(k) - (cumsum_k - radius)/k > 0, then x = max(v - tau, 0).
    """
    n = v.shape[-1]
    if mask is None:
        mask = jnp.ones(v.shape, dtype=bool)
    else:
        mask = jnp.broadcast_to(mask, v.shape)
    vm = jnp.where(mask, v, _NEG)
    u = jnp.sort(vm, axis=-1)[..., ::-1]                    # descending
    k = jnp.arange(1, n + 1, dtype=v.dtype)
    css = jnp.cumsum(u, axis=-1)
    valid_k = (u * k) > (css - radius)
    # invalid (masked) entries have u = _NEG, so valid_k is False there;
    # rho = number of True entries (prefix property of the condition)
    rho = jnp.sum(valid_k, axis=-1, keepdims=True)          # (..., 1) int
    rho = jnp.maximum(rho, 1)
    css_rho = jnp.take_along_axis(css, rho - 1, axis=-1)    # cumsum at rho
    tau = (css_rho - radius) / rho.astype(v.dtype)
    x = jnp.maximum(v - tau, 0.0)
    return jnp.where(mask, x, 0.0)


def project_capped_simplex(v: jnp.ndarray, mask: jnp.ndarray | None = None,
                           cap: float = 1.0) -> jnp.ndarray:
    """Euclidean projection onto {x >= 0, sum x <= cap} along the last axis.

    If clip(v, 0)' sums to <= cap that is the projection; otherwise the
    projection lies on the face sum x = cap, i.e. the simplex projection.
    """
    if mask is None:
        mask = jnp.ones(v.shape, dtype=bool)
    else:
        mask = jnp.broadcast_to(mask, v.shape)
    clipped = jnp.where(mask, jnp.maximum(v, 0.0), 0.0)
    s = jnp.sum(clipped, axis=-1, keepdims=True)
    on_face = project_simplex(v, mask=mask, radius=cap)
    return jnp.where(s <= cap, clipped, on_face)


def project_rows_simplex(X: jnp.ndarray, row_mask: jnp.ndarray,
                         col_mask: jnp.ndarray) -> jnp.ndarray:
    """Project each valid row of X (M, N) onto the simplex over valid cols.

    Padded rows/cols are zeroed. Batched over leading axes of X;
    row_mask: (..., M) bool, col_mask: (..., N) bool.
    """
    m = row_mask[..., :, None] & col_mask[..., None, :]
    out = project_simplex(X, mask=m)
    return jnp.where(row_mask[..., :, None], out, 0.0)


def project_cols_capped(X: jnp.ndarray, row_mask: jnp.ndarray,
                        col_mask: jnp.ndarray, cap: float = 1.0) -> jnp.ndarray:
    """Project each valid column of X (M, N) onto {x >= 0, sum <= cap}."""
    Xt = jnp.swapaxes(X, -1, -2)                            # (..., N, M)
    m = col_mask[..., :, None] & row_mask[..., None, :]
    out = project_capped_simplex(Xt, mask=m, cap=cap)
    return jnp.swapaxes(out, -1, -2)


def dykstra_project(X: jnp.ndarray, row_mask: jnp.ndarray, col_mask: jnp.ndarray,
                    iters: int = 10) -> jnp.ndarray:
    """Dykstra's alternating projection onto the intersection
    {rows on simplex} ∩ {cols capped at 1}, mask-aware.

    Unlike plain alternating projections, Dykstra converges to the *Euclidean
    projection* onto the intersection, which is what PGD requires. Uses
    lax.scan so the unrolled autodiff graph stays compact.
    """

    def body(carry, _):
        x, p, q = carry
        y = project_rows_simplex(x + p, row_mask, col_mask)
        p = x + p - y
        x2 = project_cols_capped(y + q, row_mask, col_mask)
        q = y + q - x2
        return (x2, p, q), None

    zeros = jnp.zeros_like(X)
    (out, _, _), _ = jax.lax.scan(body, (X, zeros, zeros), None, length=iters)
    return out
