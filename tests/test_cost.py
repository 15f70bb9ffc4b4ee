"""Tests for the cost-matrix construction (SURVEY.md component #7)."""

import jax.numpy as jnp
import numpy as np
import pytest

from dmm_net_tpu.ops.cost import cosine_similarity, cost_matrix, mask_iou


def test_mask_iou_binary_exact():
    # two 4-pixel masks with known overlap
    t = jnp.asarray([[1, 1, 0, 0], [0, 0, 1, 1]], jnp.float32)
    p = jnp.asarray([[1, 0, 0, 0], [1, 1, 1, 1], [0, 0, 0, 1]], jnp.float32)
    iou = np.asarray(mask_iou(t, p))
    want = np.array([[1 / 2, 2 / 4, 0.0], [0.0, 2 / 4, 1 / 2]])
    np.testing.assert_allclose(iou, want, atol=1e-6)


def test_mask_iou_self_is_one():
    rng = np.random.RandomState(0)
    m = (rng.rand(5, 64) > 0.5).astype(np.float32)
    m[0] = 1.0  # avoid empty masks
    iou = np.asarray(mask_iou(jnp.asarray(m), jnp.asarray(m)))
    np.testing.assert_allclose(np.diag(iou), 1.0, atol=1e-5)


def test_mask_iou_empty_mask_is_zero():
    t = jnp.zeros((1, 16), jnp.float32)
    p = jnp.ones((2, 16), jnp.float32)
    iou = np.asarray(mask_iou(t, p))
    np.testing.assert_allclose(iou, 0.0, atol=1e-6)


def test_cosine_similarity_range_and_self():
    rng = np.random.RandomState(1)
    f = rng.randn(6, 32).astype(np.float32)
    cos = np.asarray(cosine_similarity(jnp.asarray(f), jnp.asarray(f)))
    np.testing.assert_allclose(np.diag(cos), 1.0, atol=1e-5)
    assert (cos <= 1.0 + 1e-5).all() and (cos >= -1.0 - 1e-5).all()


def test_cost_matrix_convex_combination_and_padding():
    rng = np.random.RandomState(2)
    M, N, P, D = 3, 5, 64, 16
    tm = (rng.rand(M, P) > 0.5).astype(np.float32)
    pm = (rng.rand(N, P) > 0.5).astype(np.float32)
    tf = rng.randn(M, D).astype(np.float32)
    pf = rng.randn(N, D).astype(np.float32)
    lam = 0.4
    C = np.asarray(cost_matrix(jnp.asarray(tm), jnp.asarray(pm),
                               jnp.asarray(tf), jnp.asarray(pf),
                               iou_weight=lam))
    iou = np.asarray(mask_iou(jnp.asarray(tm), jnp.asarray(pm)))
    cos = np.asarray(cosine_similarity(jnp.asarray(tf), jnp.asarray(pf)))
    np.testing.assert_allclose(C, lam * (1 - iou) + (1 - lam) * (1 - cos), atol=1e-5)

    rm = jnp.asarray([True, True, False])
    cm = jnp.asarray([True, True, True, False, False])
    Cp = np.asarray(cost_matrix(jnp.asarray(tm), jnp.asarray(pm),
                                jnp.asarray(tf), jnp.asarray(pf),
                                row_mask=rm, col_mask=cm, iou_weight=lam,
                                pad_cost=10.0))
    assert (Cp[2, :] == 10.0).all()
    assert (Cp[:, 3:] == 10.0).all()
    np.testing.assert_allclose(Cp[:2, :3], C[:2, :3], atol=1e-5)


def test_golden_parity_cost_vs_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.RandomState(3)
    M, N, P, D = 4, 7, 32, 8
    tm = (rng.rand(M, P) > 0.5).astype(np.float32)
    pm = (rng.rand(N, P) > 0.5).astype(np.float32)
    tf = rng.randn(M, D).astype(np.float32)
    pf = rng.randn(N, D).astype(np.float32)

    ttm, tpm = torch.tensor(tm), torch.tensor(pm)
    ttf, tpf = torch.tensor(tf), torch.tensor(pf)
    inter = ttm @ tpm.T
    union = ttm.sum(1, keepdim=True) + tpm.sum(1)[None, :] - inter
    iou_t = inter / union.clamp(min=1e-6)
    cos_t = torch.nn.functional.normalize(ttf, dim=1) @ \
        torch.nn.functional.normalize(tpf, dim=1).T
    lam = 0.3
    C_t = (lam * (1 - iou_t) + (1 - lam) * (1 - cos_t)).numpy()

    C_j = np.asarray(cost_matrix(jnp.asarray(tm), jnp.asarray(pm),
                                 jnp.asarray(tf), jnp.asarray(pf), iou_weight=lam))
    np.testing.assert_allclose(C_j, C_t, atol=1e-5)
