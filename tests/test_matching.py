"""Numerics tests for the differentiable matching layer (SURVEY.md §5.2(1)).

Covers: constraint satisfaction, LP optimality vs scipy's Hungarian oracle,
permutation equivariance, padding-leak freedom, gradient checks vs finite
differences, and a torch golden-parity check of the Sinkhorn recursion.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.optimize import linear_sum_assignment

from dmm_net_tpu.ops.matching import (
    hard_assignment,
    match,
    pgd_match,
    sinkhorn_match,
)

SOLVERS = ["sinkhorn", "pgd"]


def _rand_cost(rng, m, n):
    return rng.rand(m, n).astype(np.float32)


def _solve(C, rm=None, cm=None, solver="sinkhorn", **kw):
    C = jnp.asarray(C)
    if rm is None:
        rm = jnp.ones(C.shape[:-1], bool)
    if cm is None:
        cm = jnp.ones(C.shape[:-2] + C.shape[-1:], bool)
    if solver == "sinkhorn":
        kw.setdefault("epsilon", 0.02)
        kw.setdefault("iters", 200)
        return np.asarray(sinkhorn_match(C, rm, cm, **kw))
    kw.setdefault("pgd_iters", 100)
    kw.setdefault("dykstra_iters", 30)
    return np.asarray(pgd_match(C, rm, cm, **kw))


@pytest.mark.parametrize("solver", SOLVERS)
@pytest.mark.parametrize("seed", range(3))
def test_constraints(solver, seed):
    rng = np.random.RandomState(seed)
    C = _rand_cost(rng, 5, 20)
    X = _solve(C, solver=solver)
    assert (X >= -1e-6).all()
    np.testing.assert_allclose(X.sum(-1), 1.0, atol=2e-3)
    assert (X.sum(-2) <= 1.0 + 2e-3).all()


@pytest.mark.parametrize("solver", SOLVERS)
@pytest.mark.parametrize("seed", range(5))
def test_lp_optimum_matches_hungarian(solver, seed):
    """On random C the relaxed LP has a unique vertex optimum = the
    assignment found by Hungarian; low-temperature Sinkhorn / converged PGD
    must place ~all row mass on those columns."""
    rng = np.random.RandomState(100 + seed)
    m, n = 4, 12
    C = _rand_cost(rng, m, n)
    X = _solve(C, solver=solver)
    ri, ci = linear_sum_assignment(C)
    opt = C[ri, ci].sum()
    relaxed = (X * C).sum()
    # relaxed optimum <= integral optimum; near-tight when solution is a vertex
    assert relaxed <= opt + 0.05
    # hard decode recovers the Hungarian assignment
    hard = X.argmax(-1)
    assert (hard == ci).mean() >= 0.75  # allow near-ties


@pytest.mark.parametrize("solver", SOLVERS)
def test_square_case_recovers_permutation(solver):
    rng = np.random.RandomState(7)
    n = 6
    # well-separated costs: a permutation matrix plus noise
    perm = rng.permutation(n)
    C = np.ones((n, n), np.float32) + rng.rand(n, n).astype(np.float32) * 0.1
    C[np.arange(n), perm] = 0.0
    X = _solve(C, solver=solver)
    assert (X.argmax(-1) == perm).all()
    # mass concentrated
    assert X[np.arange(n), perm].min() > 0.8


@pytest.mark.parametrize("solver", SOLVERS)
def test_permutation_equivariance(solver):
    rng = np.random.RandomState(11)
    C = _rand_cost(rng, 4, 10)
    pr = rng.permutation(4)
    pc = rng.permutation(10)
    X = _solve(C, solver=solver)
    Xp = _solve(C[pr][:, pc], solver=solver)
    np.testing.assert_allclose(Xp, X[pr][:, pc], atol=5e-3)


@pytest.mark.parametrize("solver", SOLVERS)
def test_padding_does_not_leak(solver):
    """Solving a padded (M_max, N_max) problem must equal solving the
    unpadded one on the valid block — SURVEY.md §5.2(4)."""
    rng = np.random.RandomState(13)
    m, n, M, N = 3, 8, 8, 32
    C_small = _rand_cost(rng, m, n)
    C_big = np.full((M, N), 7.7, np.float32)  # junk in the padding
    C_big[:m, :n] = C_small
    rm = jnp.zeros((M,), bool).at[:m].set(True)
    cm = jnp.zeros((N,), bool).at[:n].set(True)
    X_small = _solve(C_small, solver=solver)
    X_big = _solve(C_big, rm, cm, solver=solver)
    np.testing.assert_allclose(X_big[:m, :n], X_small, atol=5e-3)
    assert (X_big[m:] == 0).all()
    assert (X_big[:, n:] == 0).all()


def test_sinkhorn_gradient_vs_finite_differences():
    rng = np.random.RandomState(17)
    C = jnp.asarray(_rand_cost(rng, 3, 7))
    rm = jnp.ones((3,), bool)
    cm = jnp.ones((7,), bool)
    W = jnp.asarray(rng.randn(3, 7).astype(np.float32))

    def loss(c):
        return jnp.sum(sinkhorn_match(c, rm, cm, epsilon=0.1, iters=50) * W)

    g = np.asarray(jax.grad(loss)(C))
    eps = 1e-3
    for _ in range(10):
        i, j = rng.randint(3), rng.randint(7)
        e = jnp.zeros_like(C).at[i, j].set(eps)
        fd = (loss(C + e) - loss(C - e)) / (2 * eps)
        np.testing.assert_allclose(g[i, j], float(fd), atol=2e-2, rtol=5e-2)


def test_pgd_gradient_finite_and_nonzero():
    rng = np.random.RandomState(19)
    C = jnp.asarray(_rand_cost(rng, 3, 7))
    rm = jnp.ones((3,), bool)
    cm = jnp.ones((7,), bool)

    def loss(c):
        return jnp.sum(pgd_match(c, rm, cm, pgd_iters=10, dykstra_iters=5) ** 2)

    g = np.asarray(jax.grad(loss)(C))
    assert np.isfinite(g).all()
    assert np.abs(g).max() > 0


def test_implicit_grad_close_to_unrolled():
    rng = np.random.RandomState(23)
    C = jnp.asarray(_rand_cost(rng, 4, 9))
    rm = jnp.ones((4,), bool)
    cm = jnp.ones((9,), bool)
    W = jnp.asarray(rng.randn(4, 9).astype(np.float32))

    def mk(implicit):
        def loss(c):
            return jnp.sum(
                sinkhorn_match(c, rm, cm, epsilon=0.1, iters=300,
                               implicit_grad=implicit) * W)
        return jax.grad(loss)

    g_unrolled = np.asarray(mk(False)(C))
    g_implicit = np.asarray(mk(True)(C))
    # same direction, similar magnitude (implicit drops dual sensitivity)
    cos = (g_unrolled * g_implicit).sum() / (
        np.linalg.norm(g_unrolled) * np.linalg.norm(g_implicit) + 1e-9)
    assert cos > 0.7


def test_golden_parity_sinkhorn_vs_torch():
    """Re-express the log-domain capped-column Sinkhorn recursion in torch
    (CPU) and require elementwise agreement — SURVEY.md §5.2(2)."""
    torch = pytest.importorskip("torch")
    rng = np.random.RandomState(29)
    m, n, eps, iters = 4, 10, 0.07, 60
    C = _rand_cost(rng, m, n)

    tC = torch.tensor(C, dtype=torch.float64)
    g = torch.zeros(n, dtype=torch.float64)
    for _ in range(iters):
        f = -eps * torch.logsumexp((g[None, :] - tC) / eps, dim=1)
        g = torch.clamp(-eps * torch.logsumexp((f[:, None] - tC) / eps, dim=0), max=0.0)
    f = -eps * torch.logsumexp((g[None, :] - tC) / eps, dim=1)
    X_torch = torch.exp((f[:, None] + g[None, :] - tC) / eps).numpy()

    X_jax = _solve(C, solver="sinkhorn", epsilon=eps, iters=iters)
    np.testing.assert_allclose(X_jax, X_torch, atol=1e-4)


def test_match_dispatch_and_hard_assignment():
    rng = np.random.RandomState(31)
    C = jnp.asarray(_rand_cost(rng, 3, 6))
    X = match(C, solver="sinkhorn", epsilon=0.02, iters=100)
    rm = jnp.ones((3,), bool)
    cm = jnp.ones((6,), bool)
    h = np.asarray(hard_assignment(X, rm, cm))
    assert h.shape == (3,)
    assert (h >= 0).all() and (h < 6).all()
    rm2 = rm.at[2].set(False)
    h2 = np.asarray(hard_assignment(X, rm2, cm))
    assert h2[2] == -1


def test_batched_vmap_consistency():
    rng = np.random.RandomState(37)
    Cs = np.stack([_rand_cost(rng, 4, 12) for _ in range(5)])
    rm = jnp.ones((5, 4), bool)
    cm = jnp.ones((5, 12), bool)
    Xb = np.asarray(sinkhorn_match(jnp.asarray(Cs), rm, cm, epsilon=0.05, iters=50))
    for b in range(5):
        Xs = np.asarray(sinkhorn_match(jnp.asarray(Cs[b]), rm[b], cm[b],
                                       epsilon=0.05, iters=50))
        np.testing.assert_allclose(Xb[b], Xs, atol=1e-5)


def test_epsilon_annealing_converges_faster():
    """ε-scaling: 12 annealed iterations should reach the low-temperature
    optimum that plain Sinkhorn needs many more iterations for."""
    rng = np.random.RandomState(41)
    C = _rand_cost(rng, 5, 15)
    ri, ci = linear_sum_assignment(C)
    rm = jnp.ones((5,), bool)
    cm = jnp.ones((15,), bool)
    X_ann = np.asarray(sinkhorn_match(jnp.asarray(C), rm, cm, epsilon=0.01,
                                      iters=12, epsilon_init=0.5))
    X_plain = np.asarray(sinkhorn_match(jnp.asarray(C), rm, cm, epsilon=0.01,
                                        iters=12))
    # annealed: recovers the Hungarian assignment and tight objective
    assert (X_ann.argmax(-1) == ci).all()
    obj_ann = (X_ann * C).sum()
    obj_plain = (X_plain * C).sum()
    opt = C[ri, ci].sum()
    assert obj_ann <= opt + 0.03
    # annealed at least as good as plain at equal iteration count
    assert obj_ann <= obj_plain + 1e-3
    # constraints approximately hold (12 iters at eps=0.01 leaves a small
    # column residual; tight satisfaction at convergence is tested above)
    np.testing.assert_allclose(X_ann.sum(-1), 1.0, atol=1e-2)
    assert (X_ann.sum(-2) <= 1.0 + 5e-2).all()


def test_hungarian_decode_one_to_one():
    from dmm_net_tpu.ops.matching import hard_assignment_hungarian

    # craft X where greedy argmax would double-assign proposal 0
    X = np.asarray([[0.9, 0.05, 0.05, 0.0],
                    [0.8, 0.15, 0.05, 0.0],
                    [0.0, 0.0, 0.0, 0.0]], np.float32)
    rm = np.asarray([True, True, False])
    cm = np.asarray([True, True, True, False])
    greedy = np.asarray(hard_assignment(jnp.asarray(X), jnp.asarray(rm),
                                        jnp.asarray(cm)))
    assert greedy[0] == greedy[1] == 0       # greedy double-assigns
    hung = hard_assignment_hungarian(X, rm, cm)
    assert hung[2] == -1
    assert sorted(hung[:2].tolist()) == [0, 1]   # one-to-one
    # total mass maximized: row0->0 (0.9) + row1->1 (0.15) > row0->1+row1->0
    assert hung[0] == 0 and hung[1] == 1
    # batched form
    hb = hard_assignment_hungarian(X[None], rm[None], cm[None])
    np.testing.assert_array_equal(hb[0], hung)
