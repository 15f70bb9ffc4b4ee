"""Parity + gradient tests for the pool+cost+match fused kernel and the
model's use_pallas path."""

import jax
import jax.numpy as jnp
import numpy as np

from dmm_net_tpu.kernels.matcher import (
    _pool_cost_match_reference,
    fused_pool_cost_match,
)


def _problem(seed=0, B=2, M=4, N=16, P=64, D=32, Pc=256):
    rng = np.random.RandomState(seed)
    emb = rng.randn(B, P, D).astype(np.float32)
    pm_pool = (rng.rand(B, N, P) > 0.6).astype(np.float32)
    tm_cost = (rng.rand(B, M, Pc) > 0.6).astype(np.float32)
    pm_cost = (rng.rand(B, N, Pc) > 0.6).astype(np.float32)
    tf = rng.randn(B, M, D).astype(np.float32)
    rm = np.zeros((B, M), bool)
    rm[:, :3] = True
    cm = np.zeros((B, N), bool)
    cm[:, :10] = True
    return map(jnp.asarray, (emb, pm_pool, tm_cost, pm_cost, tf, rm, cm))


def test_fused_matches_reference():
    emb, pm_pool, tm_cost, pm_cost, tf, rm, cm = _problem()
    Xk = fused_pool_cost_match(emb, pm_pool, tm_cost, pm_cost, tf, rm, cm,
                               epsilon=0.05, iters=30, interpret=True)
    Xr = _pool_cost_match_reference(emb, pm_pool, tm_cost, pm_cost, tf,
                                    rm, cm, 0.05, 30, 0.3)
    np.testing.assert_allclose(np.asarray(Xk), np.asarray(Xr), atol=2e-4)
    # padded region zero
    assert (np.asarray(Xk)[:, 3:] == 0).all()
    assert (np.asarray(Xk)[:, :, 10:] == 0).all()


def test_fused_gradients_match_reference():
    emb, pm_pool, tm_cost, pm_cost, tf, rm, cm = _problem(seed=1, B=1)
    W = jnp.asarray(np.random.RandomState(2).randn(1, 4, 16), jnp.float32)

    def loss_fused(e, t):
        X = fused_pool_cost_match(e, pm_pool, tm_cost, pm_cost, t, rm, cm,
                                  epsilon=0.1, iters=30, interpret=True)
        return jnp.sum(X * W)

    def loss_ref(e, t):
        X = _pool_cost_match_reference(e, pm_pool, tm_cost, pm_cost, t,
                                       rm, cm, 0.1, 30, 0.3)
        return jnp.sum(X * W)

    ge, gt = jax.grad(loss_fused, argnums=(0, 1))(emb, tf)
    re, rt = jax.grad(loss_ref, argnums=(0, 1))(emb, tf)
    np.testing.assert_allclose(np.asarray(ge), np.asarray(re), atol=1e-5)
    np.testing.assert_allclose(np.asarray(gt), np.asarray(rt), atol=1e-5)
    assert np.abs(np.asarray(ge)).max() > 0


def test_model_pallas_path_matches_jnp_path():
    import dataclasses
    from dmm_net_tpu.config import Config, MatchingConfig, ModelConfig
    from dmm_net_tpu.data.synthetic import synthetic_clip_batch
    from dmm_net_tpu.models.dmm import DMMNet, FrameState, decoder_state_dim

    cfg = Config(
        model=ModelConfig(backbone="resnet18", backbone_dtype="float32",
                          feature_dim=16, decoder_dim=8, image_size=(64, 64)),
        matching=MatchingConfig(max_templates=4, max_proposals=8,
                                sinkhorn_iters=10, use_pallas=False))
    b = synthetic_clip_batch(seed=0, batch=1, T=1, H=64, W=64, num_objects=2,
                             num_proposals=8, pad_objects=4)
    model = DMMNet(cfg)
    B, M = 1, 4
    state0 = FrameState(
        template_masks=jnp.asarray(b["tmpl_masks"]),
        decoder_state=jnp.zeros((B, M, 2, 2, decoder_state_dim(cfg))))
    args = (jnp.asarray(b["frames"][:, 0]), jnp.asarray(b["prop_masks"][:, 0]),
            jnp.asarray(b["prop_valid"][:, 0]),
            jnp.zeros((B, M, 16)), jnp.asarray(b["tmpl_valid"]), state0)
    variables = model.init(jax.random.PRNGKey(0), *args)
    out_jnp, _ = model.apply(variables, *args)

    cfg_p = dataclasses.replace(
        cfg, matching=dataclasses.replace(cfg.matching, use_pallas=True))
    model_p = DMMNet(cfg_p)
    out_pal, _ = model_p.apply(variables, *args)
    np.testing.assert_allclose(np.asarray(out_pal.assignment),
                               np.asarray(out_jnp.assignment), atol=2e-3)
