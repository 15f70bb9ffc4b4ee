"""Numerics tests for simplex / capped-simplex / Dykstra projections."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dmm_net_tpu.ops.projections import (
    dykstra_project,
    project_capped_simplex,
    project_cols_capped,
    project_rows_simplex,
    project_simplex,
)


def _np_project_simplex(v, radius=1.0):
    """Reference numpy implementation (Duchi et al. 2008)."""
    u = np.sort(v)[::-1]
    css = np.cumsum(u)
    ks = np.arange(1, len(v) + 1)
    cond = u - (css - radius) / ks > 0
    rho = np.nonzero(cond)[0][-1] + 1
    tau = (css[rho - 1] - radius) / rho
    return np.maximum(v - tau, 0.0)


@pytest.mark.parametrize("seed", range(5))
@pytest.mark.parametrize("n", [3, 17, 128])
def test_simplex_matches_numpy_oracle(seed, n):
    rng = np.random.RandomState(seed)
    v = rng.randn(n).astype(np.float32) * 3
    got = np.asarray(project_simplex(jnp.asarray(v)))
    want = _np_project_simplex(v.astype(np.float64))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_simplex_properties_batched():
    rng = np.random.RandomState(0)
    v = rng.randn(4, 7, 32).astype(np.float32)
    x = np.asarray(project_simplex(jnp.asarray(v)))
    assert (x >= 0).all()
    np.testing.assert_allclose(x.sum(-1), 1.0, atol=1e-5)


def test_simplex_masked_entries_get_zero_and_sum_one():
    rng = np.random.RandomState(1)
    v = rng.randn(6, 16).astype(np.float32)
    mask = jnp.asarray(rng.rand(6, 16) > 0.4)
    mask = mask.at[:, 0].set(True)  # ensure at least one valid per row
    x = np.asarray(project_simplex(jnp.asarray(v), mask=mask))
    assert (x[~np.asarray(mask)] == 0).all()
    np.testing.assert_allclose(x.sum(-1), 1.0, atol=1e-5)
    # masked projection == unmasked projection of the valid subvector
    for i in range(6):
        mi = np.asarray(mask[i])
        want = _np_project_simplex(v[i][mi].astype(np.float64))
        np.testing.assert_allclose(x[i][mi], want, atol=1e-5)


def test_simplex_idempotent_and_fixed_point():
    v = jnp.asarray([0.2, 0.3, 0.5], dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(project_simplex(v)), np.asarray(v), atol=1e-6)


def test_capped_interior_point_unchanged():
    v = jnp.asarray([0.1, 0.2, -0.5, 0.05], dtype=jnp.float32)
    x = np.asarray(project_capped_simplex(v))
    np.testing.assert_allclose(x, [0.1, 0.2, 0.0, 0.05], atol=1e-6)


def test_capped_exceeding_point_lands_on_face():
    rng = np.random.RandomState(2)
    v = (rng.rand(10, 24) * 2).astype(np.float32)  # positive, sum >> 1
    x = np.asarray(project_capped_simplex(jnp.asarray(v)))
    assert (x >= 0).all()
    np.testing.assert_allclose(x.sum(-1), 1.0, atol=1e-5)
    # must equal simplex projection in this regime
    want = np.asarray(project_simplex(jnp.asarray(v)))
    np.testing.assert_allclose(x, want, atol=1e-6)


def test_dykstra_constraints_hold():
    rng = np.random.RandomState(3)
    M, N = 5, 12
    X = jnp.asarray(rng.randn(M, N).astype(np.float32))
    rm = jnp.ones((M,), bool).at[4].set(False)
    cm = jnp.ones((N,), bool).at[11].set(False)
    out = np.asarray(dykstra_project(X, rm, cm, iters=50))
    assert (out >= -1e-6).all()
    np.testing.assert_allclose(out[:4].sum(-1), 1.0, atol=1e-4)
    assert (out[4] == 0).all()
    assert (out[:, 11] == 0).all()
    assert (out.sum(0) <= 1.0 + 1e-4).all()


def test_dykstra_is_euclidean_projection_vs_cvx_style_oracle():
    """Dykstra output must be the closest feasible point. Oracle: brute
    projected-gradient on the distance objective with many iterations via
    scipy-free verification: check variational inequality <y - x*, x0 - x*> <= 0
    for random feasible y."""
    rng = np.random.RandomState(4)
    M, N = 3, 6
    X0 = rng.randn(M, N).astype(np.float32)
    rm = jnp.ones((M,), bool)
    cm = jnp.ones((N,), bool)
    xs = np.asarray(dykstra_project(jnp.asarray(X0), rm, cm, iters=200))
    # random feasible points: rows from Dirichlet, rejection on col caps
    count = 0
    while count < 20:
        y = rng.dirichlet(np.ones(N), size=M)
        if (y.sum(0) <= 1.0).all():
            assert ((y - xs) * (X0 - xs)).sum() <= 1e-3
            count += 1


def test_rows_cols_wrappers_batched():
    rng = np.random.RandomState(5)
    B, M, N = 3, 4, 9
    X = jnp.asarray(rng.randn(B, M, N).astype(np.float32))
    rm = jnp.ones((B, M), bool)
    cm = jnp.ones((B, N), bool)
    r = np.asarray(project_rows_simplex(X, rm, cm))
    np.testing.assert_allclose(r.sum(-1), 1.0, atol=1e-5)
    c = np.asarray(project_cols_capped(X, rm, cm))
    assert (c.sum(-2) <= 1.0 + 1e-5).all()
    assert (c >= 0).all()


def test_projection_gradients_finite():
    def f(v):
        return jnp.sum(project_simplex(v) ** 2)

    g = jax.grad(f)(jnp.asarray([0.5, -0.2, 1.5], jnp.float32))
    assert np.isfinite(np.asarray(g)).all()
