"""Multi-device (fake 8-CPU mesh) tests: sharded train step == single-device
step; mesh helpers (SURVEY.md §5.2(6))."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dmm_net_tpu.config import Config, DataConfig, MatchingConfig, ModelConfig, TrainConfig
from dmm_net_tpu.data.synthetic import synthetic_clip_batch
from dmm_net_tpu.parallel.mesh import batch_sharding, make_mesh, shard_batch
from dmm_net_tpu.train.loop import create_train_state, make_train_step


def _cfg():
    return Config(
        name="test_parallel",
        model=ModelConfig(backbone="resnet18", backbone_dtype="float32",
                          feature_dim=16, decoder_dim=8, image_size=(64, 64)),
        matching=MatchingConfig(max_templates=4, max_proposals=8,
                                sinkhorn_iters=5),
        data=DataConfig(batch_size=8, clip_length=2),
        train=TrainConfig(lr=1e-3, warmup_steps=1, total_steps=10),
    )


@pytest.fixture(scope="module")
def devices():
    ds = jax.devices()
    if len(ds) < 8:
        pytest.skip("needs 8 fake CPU devices")
    return ds


def test_make_mesh_shapes(devices):
    mesh = make_mesh(data=8, model=1)
    assert mesh.shape == {"data": 8, "model": 1}
    mesh2 = make_mesh(data=4, model=2)
    assert mesh2.shape == {"data": 4, "model": 2}


def test_sharded_step_matches_single_device(devices):
    cfg = _cfg()
    batch = {k: np.asarray(v) for k, v in synthetic_clip_batch(
        seed=0, batch=8, T=2, H=64, W=64, num_objects=2,
        num_proposals=cfg.matching.max_proposals,
        pad_objects=cfg.matching.max_templates).items()}

    state_a = create_train_state(cfg, jax.random.PRNGKey(0), batch)
    state_b = jax.tree.map(lambda x: x.copy() if hasattr(x, "copy") else x,
                           state_a)

    single = make_train_step(cfg, mesh=None)
    sa, ma = single(state_a, jax.tree.map(jnp.asarray, batch))

    mesh = make_mesh(data=8, model=1)
    sharded_step = make_train_step(cfg, mesh=mesh)
    sb, mb = sharded_step(state_b, shard_batch(batch, mesh))

    np.testing.assert_allclose(float(ma["loss"]), float(mb["loss"]),
                               rtol=1e-4, atol=1e-5)
    # parameters after update must agree
    la = jax.tree.leaves(sa.params)
    lb = jax.tree.leaves(sb.params)
    for a, b in zip(la, lb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-5)


def test_sharded_step_matches_single_device_pallas(devices):
    """Same sharded-vs-single equality with the FUSED PALLAS matcher in the
    traced graph (interpret mode on the CPU mesh). VERDICT r4 weak #5: the
    fused-kernel path was never exercised under a mesh."""
    cfg = _cfg().override(**{"matching.use_pallas": True})
    assert cfg.matching.use_pallas
    batch = {k: np.asarray(v) for k, v in synthetic_clip_batch(
        seed=3, batch=8, T=2, H=64, W=64, num_objects=2,
        num_proposals=cfg.matching.max_proposals,
        pad_objects=cfg.matching.max_templates).items()}

    state_a = create_train_state(cfg, jax.random.PRNGKey(0), batch)
    state_b = jax.tree.map(lambda x: x.copy() if hasattr(x, "copy") else x,
                           state_a)

    single = make_train_step(cfg, mesh=None)
    sa, ma = single(state_a, jax.tree.map(jnp.asarray, batch))

    mesh = make_mesh(data=8, model=1)
    sharded_step = make_train_step(cfg, mesh=mesh)
    sb, mb = sharded_step(state_b, shard_batch(batch, mesh))

    np.testing.assert_allclose(float(ma["loss"]), float(mb["loss"]),
                               rtol=1e-4, atol=1e-5)
    for a, b in zip(jax.tree.leaves(sa.params), jax.tree.leaves(sb.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-5)


def test_batch_sharding_places_shards(devices):
    mesh = make_mesh(data=8, model=1)
    x = np.arange(8 * 4, dtype=np.float32).reshape(8, 4)
    y = jax.device_put(x, batch_sharding(mesh))
    assert len(y.sharding.device_set) == 8
    np.testing.assert_array_equal(np.asarray(y), x)


def test_sharded_batched_inference_matches_single_device(devices):
    """Batched-sequence inference sharded over the data axis must produce
    identical labels to single-device execution (each sequence is
    chip-local; no cross-chip state)."""
    import jax.numpy as jnp
    from dmm_net_tpu.infer.engine import resolve_overlaps
    from dmm_net_tpu.models.dmm import DMMNet, FrameState, decoder_state_dim
    from dmm_net_tpu.parallel.mesh import replicated_sharding

    cfg = _cfg()
    model = DMMNet(cfg)
    B = 8
    S = 64
    M, N = cfg.matching.max_templates, cfg.matching.max_proposals
    rng = np.random.RandomState(0)
    frame = jnp.asarray(rng.rand(B, S, S, 3), jnp.float32)
    pm = jnp.asarray(rng.rand(B, N, S, S) > 0.8, jnp.float32)
    pv = jnp.ones((B, N), bool)
    tf_ = jnp.asarray(rng.randn(B, M, cfg.model.feature_dim), jnp.float32)
    tv = jnp.ones((B, M), bool)
    st = FrameState(
        template_masks=jnp.asarray(rng.rand(B, M, S, S) > 0.8, jnp.float32),
        decoder_state=jnp.zeros((B, M, S // 32, S // 32,
                                 decoder_state_dim(cfg))))
    variables = model.init(jax.random.PRNGKey(0), frame, pm, pv, tf_, tv, st)

    def fwd(frame, pm, pv, tf_, tv, st):
        out, new_st = model.apply(variables, frame, pm, pv, tf_, tv, st)
        return out.logits, resolve_overlaps(out.logits, tv)

    logits_1, labels_1 = jax.jit(fwd)(frame, pm, pv, tf_, tv, st)

    mesh = make_mesh(data=8, model=1)
    data = batch_sharding(mesh)
    sharded_fwd = jax.jit(fwd, in_shardings=(data, data, data, data, data,
                                             FrameState(data, data)),
                          out_shardings=(data, data))
    args = [jax.device_put(x, data) for x in (frame, pm, pv, tf_, tv)]
    st_sh = FrameState(*(jax.device_put(x, data) for x in st))
    logits_8, labels_8 = sharded_fwd(*args, st_sh)
    # Different partitionings legally reassociate float reductions (conv
    # tiling differs between the B=8 program and the per-device B=1
    # program), so logits match to float tolerance, not bit-for-bit; the
    # label argmax may flip only on exact ties of those logits.
    np.testing.assert_allclose(np.asarray(logits_1), np.asarray(logits_8),
                               atol=2e-4, rtol=2e-4)
    mismatch = (np.asarray(labels_1) != np.asarray(labels_8)).mean()
    assert mismatch < 1e-3, mismatch


def test_sharded_inference_matches_single_device(devices):
    """Mesh-sharded batched inference (engine `mesh=` arg): 8 sequences
    sharded over the 8-device data axis produce the same labels and
    assignments as the unsharded engine. Sequences are chip-local, so
    this path must need zero collectives (SURVEY.md §3.3 SP row)."""
    from dmm_net_tpu.data.synthetic import synthetic_sequence
    from dmm_net_tpu.infer.engine import InferenceEngine
    from dmm_net_tpu.models.dmm import DMMNet, FrameState, decoder_state_dim

    cfg = _cfg()
    model = DMMNet(cfg)
    seqs = [synthetic_sequence(seed=100 + b, T=4, H=64, W=64, num_objects=2,
                               num_proposals=cfg.matching.max_proposals)
            for b in range(8)]
    M = cfg.matching.max_templates

    def pad_m(x, axis=0):
        p = [(0, 0)] * x.ndim
        p[axis] = (0, M - x.shape[axis])
        return np.pad(x, p)

    frames = np.stack([s["frames"] for s in seqs], axis=1)   # (T, B, ...)
    pm = np.stack([s["prop_masks"] for s in seqs], axis=1)
    pv = np.stack([s["prop_valid"] for s in seqs], axis=1)
    tm = np.stack([pad_m(s["tmpl_masks"]) for s in seqs])    # (B, M, H, W)
    tv = np.stack([pad_m(s["tmpl_valid"]) for s in seqs])

    st0 = FrameState(
        template_masks=jnp.asarray(tm),
        decoder_state=jnp.zeros((8, M, 2, 2, decoder_state_dim(cfg))))
    variables = model.init(jax.random.PRNGKey(0), frames[0], pm[0], pv[0],
                           jnp.zeros((8, M, cfg.model.feature_dim)), tv,
                           st0)

    plain = InferenceEngine(cfg, model=model, variables=variables,
                            bucket_templates=False)
    r0 = plain.run_sequence_chunked(frames, pm, pv, tm, tv, chunk=3)

    mesh = make_mesh(data=8, model=1)
    sharded = InferenceEngine(cfg, model=model, variables=variables,
                              bucket_templates=False, mesh=mesh)
    r1 = sharded.run_sequence_chunked(frames, pm, pv, tm, tv, chunk=3)

    # Labels: argmax over logits. SPMD partitioning reorders conv/reduce
    # fusion, so logits differ by float-reassociation noise and a pixel
    # sitting exactly on an object boundary can legitimately flip
    # (observed: 1 / 131072 after the s2d-stem lowering change). Assert
    # near-exact agreement rather than bitwise equality.
    mismatch = np.mean(r0["labels"] != r1["labels"])
    assert mismatch < 1e-4, f"label mismatch fraction {mismatch}"
    np.testing.assert_allclose(r0["assignments"], r1["assignments"],
                               rtol=1e-5, atol=1e-5)

    # batch not divisible by the data axis -> explicit error
    with pytest.raises(ValueError, match="not divisible"):
        sharded.run_sequence_chunked(frames[:, :6], pm[:, :6], pv[:, :6],
                                     tm[:6], tv[:6], chunk=3)


def test_sharded_stream_chunked_matches_single_device(devices):
    """run_stream_chunked — the PRODUCTION streaming path infer.py drives —
    honors the mesh: 8 sequences sharded over the data axis produce the
    same labels as the unsharded engine (VERDICT r2 next #4; previously
    only run_sequence_chunked implemented mesh placement)."""
    from dmm_net_tpu.data.synthetic import synthetic_sequence
    from dmm_net_tpu.infer.engine import InferenceEngine
    from dmm_net_tpu.models.dmm import DMMNet, FrameState, decoder_state_dim

    cfg = _cfg()
    model = DMMNet(cfg)
    B, T = 8, 4
    seqs = [synthetic_sequence(seed=200 + b, T=T, H=64, W=64, num_objects=2,
                               num_proposals=cfg.matching.max_proposals)
            for b in range(B)]
    M = cfg.matching.max_templates

    def pad_m(x, axis=0):
        p = [(0, 0)] * x.ndim
        p[axis] = (0, M - x.shape[axis])
        return np.pad(x, p)

    tm = np.stack([pad_m(s["tmpl_masks"]) for s in seqs])
    tv = np.stack([pad_m(s["tmpl_valid"]) for s in seqs])
    first = np.stack([s["frames"][0] for s in seqs])

    st0 = FrameState(
        template_masks=jnp.asarray(tm),
        decoder_state=jnp.zeros((B, M, 2, 2, decoder_state_dim(cfg))))
    variables = model.init(
        jax.random.PRNGKey(0), first,
        np.stack([s["prop_masks"][0] for s in seqs]),
        np.stack([s["prop_valid"][0] for s in seqs]),
        jnp.zeros((B, M, cfg.model.feature_dim)), tv, st0)

    def stream():
        for t in range(T):
            yield {"frame": np.stack([s["frames"][t] for s in seqs]),
                   "prop_masks": np.stack([s["prop_masks"][t] for s in seqs]),
                   "prop_valid": np.stack([s["prop_valid"][t] for s in seqs])}

    plain = InferenceEngine(cfg, model=model, variables=variables,
                            bucket_templates=False)
    r0 = plain.run_stream_chunked(stream(), tm, tv, first, chunk=3)

    mesh = make_mesh(data=8, model=1)
    sharded = InferenceEngine(cfg, model=model, variables=variables,
                              bucket_templates=False, mesh=mesh)
    r1 = sharded.run_stream_chunked(stream(), tm, tv, first, chunk=3)

    mismatch = np.mean(r0["labels"] != r1["labels"])
    assert mismatch < 1e-4, f"label mismatch fraction {mismatch}"
    np.testing.assert_allclose(r0["assignments"], r1["assignments"],
                               rtol=1e-5, atol=1e-5)

    # batch not divisible by the data axis -> explicit error
    with pytest.raises(ValueError, match="not divisible"):
        sharded.run_stream_chunked(stream(), tm[:6], tv[:6], first[:6],
                                   chunk=3)


_COLLECTIVES = ("all-reduce", "all-gather", "reduce-scatter",
                "collective-permute", "all-to-all")


def test_inference_has_no_collectives_train_has_allreduce(devices):
    """Compiled-HLO structure check (SURVEY.md §3.3): DP inference keeps
    every sequence chip-local (NO collectives in the compiled module),
    while the DP train step carries the gradient all-reduce."""
    from dmm_net_tpu.data.synthetic import synthetic_clip_batch, \
        synthetic_sequence
    from dmm_net_tpu.infer.engine import InferenceEngine
    from dmm_net_tpu.models.dmm import DMMNet, FrameState, decoder_state_dim

    cfg = _cfg()
    model = DMMNet(cfg)
    mesh = make_mesh(data=8, model=1)
    B, T, M = 8, 3, cfg.matching.max_templates
    N = cfg.matching.max_proposals
    rng = np.random.RandomState(0)

    # --- inference chunk step, inputs sharded exactly as the engine does
    engine = InferenceEngine(cfg, model=model, variables=None, mesh=mesh)
    frames = engine._seq_sharded(
        rng.rand(T, B, 64, 64, 3).astype(np.float32), time_leading=True)
    pm = engine._seq_sharded(
        (rng.rand(T, B, N, 64, 64) > 0.8).astype(np.float32),
        time_leading=True)
    pv = engine._seq_sharded(np.ones((T, B, N), bool), time_leading=True)
    tf_ = engine._seq_sharded(rng.randn(B, M, cfg.model.feature_dim)
                              .astype(np.float32))
    tv = engine._seq_sharded(np.ones((B, M), bool))
    st = FrameState(
        template_masks=engine._seq_sharded(
            (rng.rand(B, M, 64, 64) > 0.8).astype(np.float32)),
        decoder_state=engine._seq_sharded(
            np.zeros((B, M, 2, 2, decoder_state_dim(cfg)), np.float32)))
    variables = model.init(jax.random.PRNGKey(0), frames[0], pm[0], pv[0],
                           tf_, tv, st)
    engine.variables = variables
    vrep = engine._replicated_variables()
    hlo = (jax.jit(engine._chunk_step)
           .lower(vrep, frames, pm, pv, tf_, tv, st).compile().as_text())
    found = [c for c in _COLLECTIVES if c in hlo]
    assert not found, f"inference step contains collectives: {found}"

    # --- train step: the gradient all-reduce must be there
    from dmm_net_tpu.train.loop import create_train_state, make_train_step
    batch = {k: np.asarray(v) for k, v in synthetic_clip_batch(
        seed=0, batch=8, T=2, H=64, W=64, num_objects=2,
        num_proposals=N, pad_objects=M).items()}
    state = create_train_state(cfg, jax.random.PRNGKey(0), batch)
    step = make_train_step(cfg, mesh=mesh)
    hlo_train = step.lower(state, shard_batch(batch, mesh)).compile().as_text()
    assert "all-reduce" in hlo_train, "train step lost the gradient all-reduce"


def test_create_train_state_mesh_places_replicated(devices):
    """create_train_state(mesh=...) must place the variables on the
    replicated NamedSharding that make_train_step declares as its
    in_shardings — not hard-commit them to jax.devices()[0]
    (ADVICE r4 medium #2)."""
    from dmm_net_tpu.parallel.mesh import replicated_sharding

    cfg = _cfg()
    batch = {k: np.asarray(v) for k, v in synthetic_clip_batch(
        seed=5, batch=8, T=2, H=64, W=64, num_objects=2,
        num_proposals=cfg.matching.max_proposals,
        pad_objects=cfg.matching.max_templates).items()}
    mesh = make_mesh(data=8, model=1)
    state = create_train_state(cfg, jax.random.PRNGKey(0), batch, mesh=mesh)
    repl = replicated_sharding(mesh)
    leaf = jax.tree.leaves(state.params)[0]
    assert leaf.sharding.is_equivalent_to(repl, ndim=leaf.ndim), (
        leaf.sharding, repl)
    # and the sharded step consumes it without resharding errors
    step = make_train_step(cfg, mesh=mesh)
    state2, metrics = step(state, shard_batch(batch, mesh))
    assert np.isfinite(float(metrics["loss"]))


def test_train_step_on_nontrivial_model_axis(devices):
    """SURVEY §3.3's TP row promises the layers stay shard_map/pjit
    compatible so a model axis can be added later. Executable evidence:
    the SAME train step runs on a (data=4, model=2) mesh — params
    replicated over "model" by the declared shardings, batch sharded
    over "data" — and produces the single-device loss."""
    cfg = _cfg()
    batch = {k: np.asarray(v) for k, v in synthetic_clip_batch(
        seed=11, batch=4, T=2, H=64, W=64, num_objects=2,
        num_proposals=cfg.matching.max_proposals,
        pad_objects=cfg.matching.max_templates).items()}
    mesh = make_mesh(data=4, model=2)
    state = create_train_state(cfg, jax.random.PRNGKey(0), batch, mesh=mesh)
    step = make_train_step(cfg, mesh=mesh)
    _, metrics = step(state, shard_batch(batch, mesh))
    loss_tp = float(metrics["loss"])

    state1 = create_train_state(cfg, jax.random.PRNGKey(0), batch)
    step1 = make_train_step(cfg)
    _, metrics1 = step1(state1, {k: jnp.asarray(v)
                                 for k, v in batch.items()})
    np.testing.assert_allclose(loss_tp, float(metrics1["loss"]),
                               rtol=2e-5)
