"""Model smoke + integration tests: backbone pyramid, frame step, clip scan,
and a short training run on synthetic data (loss must drop)."""

import jax
import jax.numpy as jnp
import numpy as np

from dmm_net_tpu.config import Config, DataConfig, MatchingConfig, ModelConfig, TrainConfig
from dmm_net_tpu.data.synthetic import synthetic_clip_batch
from dmm_net_tpu.models.dmm import DMMNet, FrameState, decoder_state_dim
from dmm_net_tpu.models.resnet import backbone_by_name, feature_dims
from dmm_net_tpu.train.loop import create_train_state, make_train_step


def tiny_config():
    return Config(
        name="test_tiny",
        model=ModelConfig(backbone="resnet18", backbone_dtype="float32",
                          feature_dim=32, decoder_dim=16,
                          image_size=(64, 64)),
        matching=MatchingConfig(max_templates=4, max_proposals=8,
                                sinkhorn_iters=10),
        data=DataConfig(dataset="synthetic", batch_size=2, clip_length=3),
        train=TrainConfig(lr=1e-3, warmup_steps=2, total_steps=50,
                          loss_iou_weight=0.5),
    )


def _batch(cfg, seed=0):
    return {k: jnp.asarray(v) for k, v in synthetic_clip_batch(
        seed=seed, batch=2, T=3, H=64, W=64, num_objects=2,
        num_proposals=cfg.matching.max_proposals,
        pad_objects=cfg.matching.max_templates).items()}


def test_backbone_pyramid_shapes():
    model = backbone_by_name("resnet18", dtype=jnp.float32)
    x = jnp.zeros((1, 64, 64, 3))
    vars_ = model.init(jax.random.PRNGKey(0), x)
    feats = model.apply(vars_, x)
    dims = feature_dims("resnet18")
    for lvl, stride in [("c1", 2), ("c2", 4), ("c3", 8), ("c4", 16), ("c5", 32)]:
        assert feats[lvl].shape == (1, 64 // stride, 64 // stride, dims[lvl]), lvl


def test_frame_step_shapes_and_finiteness():
    cfg = tiny_config()
    model = DMMNet(cfg)
    batch = _batch(cfg)
    B, T, H, W, _ = batch["frames"].shape
    M = cfg.matching.max_templates
    N = cfg.matching.max_proposals
    state0 = FrameState(
        template_masks=batch["tmpl_masks"],
        decoder_state=jnp.zeros((B, M, H // 32, W // 32,
                                 decoder_state_dim(cfg))))
    variables = model.init(jax.random.PRNGKey(0), batch["frames"][:, 0],
                           batch["prop_masks"][:, 0], batch["prop_valid"][:, 0],
                           jnp.zeros((B, M, cfg.model.feature_dim)),
                           batch["tmpl_valid"], state0)
    out, new_state = model.apply(variables, batch["frames"][:, 0],
                                 batch["prop_masks"][:, 0],
                                 batch["prop_valid"][:, 0],
                                 jnp.zeros((B, M, cfg.model.feature_dim)),
                                 batch["tmpl_valid"], state0)
    assert out.logits.shape == (B, M, H, W)
    assert out.assignment.shape == (B, M, N)
    assert np.isfinite(np.asarray(out.logits)).all()
    X = np.asarray(out.assignment)
    valid = np.asarray(batch["tmpl_valid"])
    np.testing.assert_allclose(X.sum(-1)[valid], 1.0, atol=5e-2)
    assert (X.sum(-1)[~valid] < 1e-6).all()
    assert new_state.template_masks.shape == (B, M, H, W)


def test_training_loss_decreases():
    cfg = tiny_config()
    batch = _batch(cfg)
    state = create_train_state(cfg, jax.random.PRNGKey(0), batch)
    step = make_train_step(cfg)
    losses = []
    for _ in range(8):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses


def test_training_with_remat_and_bf16_decoder_matches_loss_scale():
    import dataclasses
    cfg = tiny_config()
    cfg = dataclasses.replace(
        cfg,
        model=dataclasses.replace(cfg.model, decoder_dtype="bfloat16"),
        train=dataclasses.replace(cfg.train, remat=True))
    batch = _batch(cfg)
    state = create_train_state(cfg, jax.random.PRNGKey(0), batch)
    step = make_train_step(cfg)
    losses = []
    for _ in range(3):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_grad_accumulation_matches_large_batch_direction():
    """optax.MultiSteps: two accumulated half-batches must apply the same
    update as one full batch (same data)."""
    import dataclasses
    cfg = tiny_config()
    # warmup starts at LR 0 — the single update in this test would be zero
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, warmup_steps=0))
    cfg_acc = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, grad_accum=2))
    batch = _batch(cfg)
    half1 = {k: v[:1] for k, v in batch.items()}
    half2 = {k: v[1:] for k, v in batch.items()}

    s_full = create_train_state(cfg, jax.random.PRNGKey(0), batch)
    s_acc = create_train_state(cfg_acc, jax.random.PRNGKey(0), batch)
    # same initial params
    for a, b in zip(jax.tree.leaves(s_full.params), jax.tree.leaves(s_acc.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    step_full = make_train_step(cfg)
    step_acc = make_train_step(cfg_acc)
    s_full, _ = step_full(s_full, batch)
    s_acc, _ = step_acc(s_acc, half1)
    s_acc, _ = step_acc(s_acc, half2)
    # updates should be close (mean of grads == grad of mean for equal-size
    # halves up to loss-normalization detail; direction must agree strongly)
    got = np.concatenate([np.asarray(x).ravel() for x in
                          jax.tree.leaves(s_acc.params)])
    want = np.concatenate([np.asarray(x).ravel() for x in
                           jax.tree.leaves(s_full.params)])
    init = np.concatenate([np.asarray(x).ravel() for x in
                           jax.tree.leaves(
                               create_train_state(
                                   cfg, jax.random.PRNGKey(0), batch).params)])
    du_got = got - init
    du_want = want - init
    cos = (du_got * du_want).sum() / (
        np.linalg.norm(du_got) * np.linalg.norm(du_want) + 1e-12)
    assert cos > 0.9, cos


def test_train_bn_updates_batch_stats():
    """cfg.model.train_bn=True: BN running stats move every step (threaded
    through the frame scan and stored back in TrainState); default frozen
    BN leaves them bit-identical (VERDICT r2 weak-#2 resolution)."""
    import dataclasses
    cfg = tiny_config()
    batch = _batch(cfg)

    def stats_vec(state):
        return np.concatenate([np.asarray(x).ravel()
                               for x in jax.tree.leaves(state.batch_stats)])

    # frozen (default): stats bit-identical after an update
    state = create_train_state(cfg, jax.random.PRNGKey(0), batch)
    before = stats_vec(state)
    state, _ = make_train_step(cfg)(state, batch)
    np.testing.assert_array_equal(stats_vec(state), before)

    # train-mode BN: stats move and stay finite; params structure unchanged
    cfg_bn = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, train_bn=True))
    state = create_train_state(cfg_bn, jax.random.PRNGKey(0), batch)
    before = stats_vec(state)
    step = make_train_step(cfg_bn)
    state, metrics = step(state, batch)
    after = stats_vec(state)
    assert after.shape == before.shape
    assert np.isfinite(after).all()
    assert np.abs(after - before).max() > 1e-6
    # and they keep moving (momentum update, not a one-shot overwrite)
    state, _ = step(state, batch)
    assert np.abs(stats_vec(state) - after).max() > 1e-7
    assert np.isfinite(float(metrics["loss"]))


def test_decoder_fine_level_fast_mode():
    import dataclasses
    cfg = tiny_config()
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, decoder_fine_level="c3"))
    batch = _batch(cfg)
    model = DMMNet(cfg)
    B, T, H, W, _ = batch["frames"].shape
    M = cfg.matching.max_templates
    state0 = FrameState(
        template_masks=batch["tmpl_masks"],
        decoder_state=jnp.zeros((B, M, H // 32, W // 32,
                                 decoder_state_dim(cfg))))
    variables = model.init(jax.random.PRNGKey(0), batch["frames"][:, 0],
                           batch["prop_masks"][:, 0], batch["prop_valid"][:, 0],
                           jnp.zeros((B, M, cfg.model.feature_dim)),
                           batch["tmpl_valid"], state0)
    out, _ = model.apply(variables, batch["frames"][:, 0],
                         batch["prop_masks"][:, 0], batch["prop_valid"][:, 0],
                         jnp.zeros((B, M, cfg.model.feature_dim)),
                         batch["tmpl_valid"], state0)
    assert out.logits.shape == (B, M, H, W)   # still full-res output
    assert np.isfinite(np.asarray(out.logits)).all()
