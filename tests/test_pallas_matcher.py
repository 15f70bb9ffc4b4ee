"""Fused Pallas cost+matcher kernel vs the pure-jnp path (SURVEY.md §5.2(3)).

On CPU the kernel runs in interpreter mode; on TPU the same test runs
compiled (bench/ covers the perf side)."""

import jax.numpy as jnp
import numpy as np

from dmm_net_tpu.kernels import fused_cost_match
from dmm_net_tpu.ops import cost_matrix
from dmm_net_tpu.ops.matching import sinkhorn_match


def _problem(seed, B=2, M=8, N=64, P=256, D=64, m=3, n=20):
    """Planted problem with well-separated optima: template i copies
    proposal j's mask and a lightly-noised copy of its feature. Near-tie
    problems make iterative solvers amplify fp noise, which would test
    solver conditioning rather than kernel parity."""
    rng = np.random.RandomState(seed)
    tm = np.zeros((B, M, P), np.float32)
    pm = np.zeros((B, N, P), np.float32)
    tf = np.zeros((B, M, D), np.float32)
    pf = np.zeros((B, N, D), np.float32)
    for b in range(B):
        pm[b, :n] = (rng.rand(n, P) > 0.7).astype(np.float32)
        pf[b, :n] = rng.randn(n, D).astype(np.float32)
        pick = rng.permutation(n)[:m]
        tm[b, :m] = pm[b, pick]
        tf[b, :m] = pf[b, pick] + 0.05 * rng.randn(m, D).astype(np.float32)
    rm = np.zeros((B, M), bool)
    rm[:, :m] = True
    cm = np.zeros((B, N), bool)
    cm[:, :n] = True
    return map(jnp.asarray, (tm, pm, tf, pf, rm, cm))


def test_fused_kernel_matches_jnp_path():
    tm, pm, tf, pf, rm, cm = _problem(0)
    eps, iters, lam = 0.05, 30, 0.3
    Xk = fused_cost_match(tm, pm, tf, pf, rm, cm, epsilon=eps, iters=iters,
                          iou_weight=lam, interpret=True)
    C = cost_matrix(tm, pm, tf, pf, row_mask=rm, col_mask=cm, iou_weight=lam)
    Xj = sinkhorn_match(C, rm, cm, epsilon=eps, iters=iters)
    np.testing.assert_allclose(np.asarray(Xk), np.asarray(Xj), atol=1e-4)


def test_fused_kernel_unaligned_sizes_pad_and_slice():
    # natural sizes not multiples of (8, 128): wrapper pads internally
    tm, pm, tf, pf, rm, cm = _problem(1, B=1, M=5, N=37, P=100, D=48, m=2, n=11)
    Xk = fused_cost_match(tm, pm, tf, pf, rm, cm, interpret=True)
    assert Xk.shape == (1, 5, 37)
    C = cost_matrix(tm, pm, tf, pf, row_mask=rm, col_mask=cm, iou_weight=0.3)
    Xj = sinkhorn_match(C, rm, cm, epsilon=0.05, iters=30)
    np.testing.assert_allclose(np.asarray(Xk), np.asarray(Xj), atol=1e-4)
    # padded region never receives mass
    assert (np.asarray(Xk)[0, 2:] == 0).all()
    assert (np.asarray(Xk)[0, :, 11:] == 0).all()


def test_fused_kernel_p4_scale_m32_n256():
    """p4's spec size (SURVEY.md §1 config #4: more objects, higher
    proposal counts): M=32, N=256 — N spans two 128-lane tiles. Parity
    with the jnp path + zero mass in padded rows/cols (VERDICT r3 #6)."""
    tm, pm, tf, pf, rm, cm = _problem(2, B=1, M=32, N=256, P=256, D=64,
                                      m=13, n=70)
    Xk = fused_cost_match(tm, pm, tf, pf, rm, cm, interpret=True)
    assert Xk.shape == (1, 32, 256)
    C = cost_matrix(tm, pm, tf, pf, row_mask=rm, col_mask=cm, iou_weight=0.3)
    Xj = sinkhorn_match(C, rm, cm, epsilon=0.05, iters=30)
    np.testing.assert_allclose(np.asarray(Xk), np.asarray(Xj), atol=1e-4)
    assert (np.asarray(Xk)[0, 13:] == 0).all()
    assert (np.asarray(Xk)[0, :, 70:] == 0).all()
