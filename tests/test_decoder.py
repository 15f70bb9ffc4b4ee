"""Refinement decoder tests (SURVEY.md §3.1 component #10).

Covers both decoder variants:
  * legacy RefinementDecoder — full-width conv stack broadcast per object;
  * SharedFPNDecoder — object-proportional split (shared frame FPN once per
    frame + thin per-object path), the production default.

Key claims verified here:
  1. interface parity: same input/output shapes, finite values, f32 state;
  2. per-object independence: one slot's mask cannot leak into another
     slot's logits (padding discipline at the decoder level);
  3. the FLOP claim behind the restructure: at padded M the shared variant
     compiles to a small fraction of the legacy variant's FLOPs.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dmm_net_tpu.models.decoder import RefinementDecoder, SharedFPNDecoder


def _pyramid(B, H, W, key=0):
    rng = np.random.RandomState(key)
    dims = {"c2": 16, "c3": 24, "c4": 32, "c5": 48}
    return {
        lvl: jnp.asarray(rng.randn(B, H // s, W // s, dims[lvl]),
                         jnp.float32)
        for lvl, s in [("c2", 4), ("c3", 8), ("c4", 16), ("c5", 32)]
    }


def _build(variant, B=2, M=4, H=64, W=64, seed=0):
    feats = _pyramid(B, H, W)
    rng = np.random.RandomState(seed)
    agg = jnp.asarray(rng.rand(B, M, H, W), jnp.float32)
    if variant == "shared":
        dec = SharedFPNDecoder(features=32, obj_features=8)
    else:
        dec = RefinementDecoder(features=32)
    vars_ = dec.init(jax.random.PRNGKey(0), feats, agg, None)
    return dec, vars_, feats, agg


@pytest.mark.parametrize("variant", ["legacy", "shared"])
def test_decoder_shapes_state_and_finiteness(variant):
    B, M, H, W = 2, 4, 64, 64
    dec, vars_, feats, agg = _build(variant, B, M, H, W)
    logits, state = dec.apply(vars_, feats, agg, None)
    assert logits.shape == (B, M, H, W)
    assert np.isfinite(np.asarray(logits)).all()
    sdim = 8 if variant == "shared" else 32
    assert state.shape == (B, M, H // 32, W // 32, sdim)
    assert state.dtype == jnp.float32
    # recurrence: feeding the state back must change the output
    logits2, _ = dec.apply(vars_, feats, agg, state)
    assert not np.allclose(np.asarray(logits), np.asarray(logits2))


@pytest.mark.parametrize("variant", ["legacy", "shared"])
def test_decoder_object_slots_independent(variant):
    """Slot j's mask must not leak into slot i's logits (the object axis is
    folded into batch — convs cannot mix slots)."""
    B, M, H, W = 1, 4, 64, 64
    dec, vars_, feats, agg = _build(variant, B, M, H, W)
    base, _ = dec.apply(vars_, feats, agg, None)
    perturbed = agg.at[:, 2].set(0.0)
    out, _ = dec.apply(vars_, feats, perturbed, None)
    np.testing.assert_array_equal(np.asarray(base[:, [0, 1, 3]]),
                                  np.asarray(out[:, [0, 1, 3]]))
    assert not np.allclose(np.asarray(base[:, 2]), np.asarray(out[:, 2]))


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_split_concat_conv_matches_naive(dtype):
    """_SplitConcatConv's split formulation (shared slices convolved at
    batch B, broadcast-added) must equal the naive concat conv with the
    SAME parameters — the split is algebra, not a new layer, so shipped
    checkpoints stay valid."""
    from dmm_net_tpu.models.decoder import _SplitConcatConv
    rng = np.random.RandomState(0)
    B, M, h, w = 2, 4, 6, 10
    x = jnp.asarray(rng.randn(B * M, h, w, 8), jnp.float32)
    q = jnp.asarray(rng.randn(B, h, w, 8), jnp.float32)       # frame-shared
    m = jnp.asarray(rng.rand(B * M, h, w, 1), jnp.float32)
    parts = [(x, False), (q, True), (m, False)]

    split = _SplitConcatConv(12, dtype=dtype, split=True)
    naive = _SplitConcatConv(12, dtype=dtype, split=False)
    vars_ = split.init(jax.random.PRNGKey(3), parts, B, M)
    assert vars_["params"]["kernel"].shape == (3, 3, 17, 12)  # nn.Conv layout
    a = np.asarray(split.apply(vars_, parts, B, M), np.float32)
    b = np.asarray(naive.apply(vars_, parts, B, M), np.float32)
    tol = 1e-5 if dtype == jnp.float32 else 2e-2
    np.testing.assert_allclose(a, b, rtol=tol, atol=tol)

    # shared-only input (the obj_head case with no live per-object conv
    # except the mask channel): still well-formed and B*M-shaped
    parts2 = [(q, True), (m, False)]
    vars2 = split.init(jax.random.PRNGKey(4), parts2, B, M)
    a2 = np.asarray(split.apply(vars2, parts2, B, M), np.float32)
    b2 = np.asarray(naive.apply(vars2, parts2, B, M), np.float32)
    assert a2.shape == (B * M, h, w, 12)
    np.testing.assert_allclose(a2, b2, rtol=tol, atol=tol)


def test_split_conv_cuts_shared_slice_flops():
    """The split's reason to exist: per-object merge convs no longer pay
    M x for the frame-shared slice, so SharedFPNDecoder FLOPs drop
    measurably at padded M (exact transform — see matching test above)."""
    B, M, H, W = 1, 8, 64, 64
    feats = _pyramid(B, H, W)
    agg = jnp.asarray(np.random.RandomState(0).rand(B, M, H, W), jnp.float32)
    dec = SharedFPNDecoder(features=32, obj_features=8)
    vars_ = dec.init(jax.random.PRNGKey(0), feats, agg, None)
    fn = jax.jit(lambda f, a: dec.apply(vars_, f, a, None))
    cost = fn.lower(feats, agg).compile().cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    # Regression bound: with the naive concat formulation this decoder
    # measured ~2.6 GF at these shapes; the split lands well under it.
    assert cost["flops"] < 2.3e9, cost["flops"]


def test_shared_variant_flops_fraction_of_legacy():
    """The restructure's reason to exist: at M=8 padded slots the shared
    variant must compile to well under half the legacy FLOPs (VERDICT r1
    next-round #1 targets >=2x fps; FLOP ratio is the compile-time proxy)."""
    B, M, H, W = 1, 8, 64, 64
    feats = _pyramid(B, H, W)
    agg = jnp.asarray(np.random.RandomState(0).rand(B, M, H, W), jnp.float32)

    def flops(dec):
        vars_ = dec.init(jax.random.PRNGKey(0), feats, agg, None)
        fn = jax.jit(lambda f, a: dec.apply(vars_, f, a, None))
        cost = fn.lower(feats, agg).compile().cost_analysis()
        if isinstance(cost, list):  # older jax returns [dict]
            cost = cost[0]
        return cost["flops"]

    legacy = flops(RefinementDecoder(features=32))
    shared = flops(SharedFPNDecoder(features=32, obj_features=8))
    assert shared < 0.5 * legacy, (shared, legacy)


@pytest.mark.parametrize("fuse,g_fine", [("conv1", 0), ("none", 0),
                                         ("conv3", 4), ("none", 4)])
def test_obj_path_ab_variants(fuse, g_fine):
    """The per-object A/B knobs (obj_fuse, obj_features_fine) must produce
    well-formed outputs and strictly fewer FLOPs than the shipped
    architecture (they exist to attack the decoder-dominated step)."""
    B, M, H, W = 1, 8, 64, 64
    feats = _pyramid(B, H, W)
    agg = jnp.asarray(np.random.RandomState(0).rand(B, M, H, W), jnp.float32)

    def flops(dec):
        vars_ = dec.init(jax.random.PRNGKey(0), feats, agg, None)
        fn = jax.jit(lambda f, a: dec.apply(vars_, f, a, None))
        cost = fn.lower(feats, agg).compile().cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        out, _ = fn(feats, agg)
        assert out.shape == (B, M, H, W)
        assert np.isfinite(np.asarray(out)).all()
        return cost["flops"]

    base = flops(SharedFPNDecoder(features=32, obj_features=8))
    ab = flops(SharedFPNDecoder(features=32, obj_features=8,
                                obj_fuse=fuse, obj_features_fine=g_fine))
    assert ab < base, (fuse, g_fine, ab, base)


@pytest.mark.parametrize("kw", [dict(obj_merge_fine_k=1),
                                dict(obj_fine_level="c3"),
                                dict(obj_fine_level="c3",
                                     obj_merge_fine_k=1)])
def test_obj_fine_levers_r5(kw):
    """r5 lane-utilization levers: pointwise finest-level merge and the
    stride-8 per-object cutoff with the shared-basis dynamic-mix detail
    head. Well-formed finite outputs, fewer FLOPs than shipped, and the
    DEFAULT knob values must leave the param tree and output bit-identical
    to the pre-knob architecture (checkpoint compatibility)."""
    B, M, H, W = 1, 8, 64, 64
    feats = _pyramid(B, H, W)
    agg = jnp.asarray(np.random.RandomState(0).rand(B, M, H, W), jnp.float32)

    def run(dec):
        vars_ = dec.init(jax.random.PRNGKey(0), feats, agg, None)
        fn = jax.jit(lambda f, a: dec.apply(vars_, f, a, None))
        cost = fn.lower(feats, agg).compile().cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        out, _ = fn(feats, agg)
        assert out.shape == (B, M, H, W)
        assert np.isfinite(np.asarray(out)).all()
        return vars_, out, cost["flops"]

    v0, out0, base = run(SharedFPNDecoder(features=32, obj_features=8))
    _, _, ab = run(SharedFPNDecoder(features=32, obj_features=8, **kw))
    assert ab < base, (kw, ab, base)
    # explicit defaults == pre-knob architecture, bit for bit
    v1, out1, _ = run(SharedFPNDecoder(features=32, obj_features=8,
                                       obj_merge_fine_k=3,
                                       obj_fine_level="", detail_dim=16))
    assert jax.tree.all(jax.tree.map(
        lambda a, b: bool((a == b).all()), v0, v1))
    assert np.array_equal(np.asarray(out0), np.asarray(out1))


def test_obj_fine_level_invalid_rejected():
    feats = _pyramid(1, 32, 32)
    agg = jnp.zeros((1, 2, 32, 32), jnp.float32)
    dec = SharedFPNDecoder(features=16, obj_features=8,
                           fine_level="c3", obj_fine_level="c2")
    with pytest.raises(ValueError, match="obj_fine_level"):
        dec.init(jax.random.PRNGKey(0), feats, agg, None)


def test_obj_fuse_unknown_rejected():
    feats = _pyramid(1, 32, 32)
    agg = jnp.zeros((1, 2, 32, 32), jnp.float32)
    dec = SharedFPNDecoder(features=16, obj_features=8, obj_fuse="bogus")
    with pytest.raises(ValueError, match="obj_fuse"):
        dec.init(jax.random.PRNGKey(0), feats, agg, None)


def test_convgru_fused_gates_match_separate_convs():
    """ConvGRUCell computes z and r with ONE conv over concatenated
    kernels (per-op overhead, not FLOPs, prices the GRU's tiny maps —
    bench/bench_convmarginal.py). The math and the param tree must both
    equal the naive two-nn.Conv formulation, so shipped checkpoints load
    and reproduce bit-comparable outputs."""
    from dmm_net_tpu.models.decoder import ConvGRUCell
    import flax.linen as nn

    class NaiveGRU(nn.Module):
        features: int

        @nn.compact
        def __call__(self, h, x):
            conv = lambda name: nn.Conv(self.features, (3, 3), name=name)  # noqa: E731
            xh = jnp.concatenate([x, h], axis=-1)
            z = nn.sigmoid(conv("gate_z")(xh))
            r = nn.sigmoid(conv("gate_r")(xh))
            cand = nn.tanh(conv("cand")(jnp.concatenate([x, r * h], -1)))
            return (1.0 - z) * h + z * cand

    rng = np.random.RandomState(0)
    f, B, H, W = 8, 2, 6, 7
    x = jnp.asarray(rng.randn(B, H, W, f), jnp.float32)
    h = jnp.asarray(rng.randn(B, H, W, f), jnp.float32)
    naive = NaiveGRU(f)
    vars_ = naive.init(jax.random.PRNGKey(1), h, x)
    fused = ConvGRUCell(f)
    # identical param TREE: the naive variables must load as-is
    fused_shapes = jax.tree_util.tree_map(
        jnp.shape, fused.init(jax.random.PRNGKey(2), h, x))
    assert fused_shapes == jax.tree_util.tree_map(jnp.shape, vars_)
    out_naive = naive.apply(vars_, h, x)
    out_fused = fused.apply(vars_, h, x)
    np.testing.assert_allclose(np.asarray(out_naive), np.asarray(out_fused),
                               atol=1e-6)


def test_shared_decoder_stop_at_prefixes_run():
    """stop_at early exits (profiling support for bench_breakdown's
    intra-decoder mode) must execute with full variables and return
    finite tensors; stop_at=None must be unaffected."""
    dec, vars_, feats, agg = _build("shared")
    full, _ = dec.apply(vars_, feats, agg, None)
    for stop in ["shared", "proj", "gru", "obj_c4", "obj_c3", "obj_c2"]:
        x, _ = dec.apply(vars_, feats, agg, None, stop_at=stop)
        assert np.isfinite(np.asarray(x, np.float32)).all(), stop
    again, _ = dec.apply(vars_, feats, agg, None, stop_at=None)
    np.testing.assert_array_equal(np.asarray(full), np.asarray(again))


def test_resize_hw3_matches_rank4_resize():
    """Masks travel channel-free (B*M, h, w) through the decoder (the
    1-channel-minor layout made mask resizes ~1.4 ms of a 9 ms step);
    _resize_hw3 must equal the rank-4 singleton-channel bilinear resize
    in both directions (up and down), f32 and bf16."""
    from dmm_net_tpu.models.decoder import _resize, _resize_hw3
    rng = np.random.RandomState(3)
    for shape, hw in [((6, 16, 28), (8, 14)), ((6, 8, 14), (32, 56)),
                      ((2, 5, 7), (9, 13))]:
        for dt in (jnp.float32, jnp.bfloat16):
            x = jnp.asarray(rng.rand(*shape), dt)
            got = _resize_hw3(x, hw)
            assert got.dtype == dt
            want = _resize(x[..., None], hw)[..., 0]
            tol = 1e-6 if dt == jnp.float32 else 2e-2
            np.testing.assert_allclose(
                np.asarray(got, np.float32), np.asarray(want, np.float32),
                atol=tol)
