"""Fused upsample+argmax label resolution (kernels/resolve.py) and the
model.logits_res="mask" path it serves (round-3 roofline work: the
full-res (B, M, H, W) logits tensor must never materialize in the
production step)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from dmm_net_tpu.config import Config, MatchingConfig, ModelConfig
from dmm_net_tpu.infer.engine import resolve_labels, resolve_overlaps
from dmm_net_tpu.kernels.resolve import (fused_resolve_upsample,
                                         resolve_upsample_jnp)


def _rand_logits(seed=0, B=2, M=5, h=16, w=28):
    rng = np.random.RandomState(seed)
    lg = rng.randn(B, M, h, w).astype(np.float32) * 3.0
    valid = rng.rand(B, M) > 0.3
    valid[:, 0] = True
    return jnp.asarray(lg), jnp.asarray(valid)


def test_interp_matrix_matches_jax_image_resize():
    """The numpy bilinear weights (trace-time constants) must equal
    jax.image.resize's upsampling weights exactly: resizing an identity
    extracts jax's matrix; ours must match."""
    from dmm_net_tpu.kernels.resolve import _interp_matrix

    for n_in, n_out in [(16, 64), (9, 36), (13, 52), (7, 7), (64, 256)]:
        want = np.asarray(jax.image.resize(
            jnp.eye(n_in, dtype=jnp.float32), (n_in, n_out),
            method="bilinear"))
        got = _interp_matrix(n_in, n_out)
        np.testing.assert_allclose(got, want, atol=1e-6,
                                   err_msg=f"{n_in}->{n_out}")


def test_jnp_fallback_matches_image_resize_reference():
    """The interp-matrix upsample must reproduce jax.image.resize bilinear:
    labels from (matmul-upsample -> argmax) == (resize -> argmax) except
    at exact floating ties."""
    lg, valid = _rand_logits()
    H, W = 64, 112
    got = np.asarray(resolve_upsample_jnp(lg, valid, (H, W)))

    masked = jnp.where(valid[..., None, None], lg, -1e4)
    up = jax.image.resize(masked, masked.shape[:2] + (H, W),
                          method="bilinear")
    want = np.asarray(resolve_overlaps(up, valid))
    assert got.shape == want.shape == (2, H, W)
    # bf16 operands (the kernel's single-MXU-pass contract) vs the f32
    # resize reference: flips confined to near-tie boundary pixels
    assert (got != want).mean() < 3e-3


def test_pallas_kernel_matches_jnp_fallback():
    lg, valid = _rand_logits(seed=1)
    H, W = 64, 112
    want = np.asarray(resolve_upsample_jnp(lg, valid, (H, W)))
    got = np.asarray(fused_resolve_upsample(lg, valid, (H, W),
                                            interpret=True))
    # identical math modulo matmul association; labels should agree
    # everywhere but exact ties
    assert (got != want).mean() < 1e-3


def test_non_lane_aligned_shapes():
    """Odd sizes exercise the kernel's lane/sublane padding."""
    lg, valid = _rand_logits(seed=2, B=1, M=3, h=9, w=13)
    H, W = 36, 52
    want = np.asarray(resolve_upsample_jnp(lg, valid, (H, W)))
    got = np.asarray(fused_resolve_upsample(lg, valid, (H, W),
                                            interpret=True))
    assert got.shape == (1, H, W)
    assert (got != want).mean() < 1e-3


def test_invalid_slots_never_win():
    lg = jnp.full((1, 4, 8, 8), 5.0)       # every slot loudly positive
    valid = jnp.asarray([[True, False, False, False]])
    lab = np.asarray(resolve_upsample_jnp(lg, valid, (16, 16)))
    assert set(np.unique(lab)) == {1}      # only the valid slot
    none = np.asarray(resolve_upsample_jnp(
        lg, jnp.zeros((1, 4), bool), (16, 16)))
    assert (none == 0).all()               # all-invalid -> background


def test_model_logits_res_mask_and_engine_labels_agree_with_full():
    """Same weights, logits_res='mask' vs 'full': logits come out at the
    mask grid, and the engine's resolved labels agree wherever the model
    is CONFIDENT (argmax margin above bf16 rounding). At init weights the
    object slots emit near-identical logits, so unconditional agreement
    is a coin flip on ties — the margin-gated comparison is the honest
    plumbing check (trained-weights quality parity is A/B'd separately,
    tools/ab_logits_res.py: 0.9083 == 0.9083 mean J&F)."""
    from dmm_net_tpu.data.synthetic import synthetic_sequence
    from dmm_net_tpu.infer.engine import InferenceEngine
    from dmm_net_tpu.models.dmm import DMMNet, mask_hw

    S = 64
    base = Config(
        model=ModelConfig(backbone="resnet18", backbone_dtype="float32",
                          feature_dim=16, decoder_dim=8, image_size=(S, S),
                          mask_res="stride4", template_update="aggregation"),
        matching=MatchingConfig(max_templates=4, max_proposals=8,
                                sinkhorn_iters=8, epsilon=0.05))
    cfg_m = dataclasses.replace(
        base, model=dataclasses.replace(base.model, logits_res="mask"))

    seq = synthetic_sequence(seed=5, T=3, H=S, W=S, num_objects=2,
                             num_proposals=8)
    M = base.matching.max_templates
    pad = lambda x: np.pad(x, [(0, M - x.shape[0])] + [(0, 0)] * (x.ndim - 1))  # noqa: E731
    tmpl_masks = pad(seq["tmpl_masks"])[None]
    tmpl_valid = pad(seq["tmpl_valid"])[None]

    from dmm_net_tpu.models.dmm import init_frame_state

    model_f = DMMNet(base)
    state0 = init_frame_state(base, jnp.asarray(tmpl_masks, jnp.float32))
    variables = model_f.init(
        jax.random.PRNGKey(0), jnp.asarray(seq["frames"][:1]),
        jnp.asarray(seq["prop_masks"][:1]), jnp.asarray(seq["prop_valid"][:1]),
        jnp.zeros((1, M, 16)), jnp.asarray(tmpl_valid), state0)

    # logits shape contract
    model_m = DMMNet(cfg_m)
    out_m, _ = model_m.apply(variables, jnp.asarray(seq["frames"][:1]),
                             jnp.asarray(seq["prop_masks"][:1]),
                             jnp.asarray(seq["prop_valid"][:1]),
                             jnp.zeros((1, M, 16)), jnp.asarray(tmpl_valid),
                             state0)
    assert out_m.logits.shape == (1, M) + mask_hw(cfg_m)
    out_f, _ = model_f.apply(variables, jnp.asarray(seq["frames"][:1]),
                             jnp.asarray(seq["prop_masks"][:1]),
                             jnp.asarray(seq["prop_valid"][:1]),
                             jnp.zeros((1, M, 16)), jnp.asarray(tmpl_valid),
                             state0)
    assert out_f.logits.shape == (1, M, S, S)

    # Brief overfit so logits become DECISIVE: at init every object slot
    # emits logits within bf16 eps of each other and of the background
    # threshold, so labels are coin flips and comparing them tests
    # nothing. 60 steps on one tiny batch is enough for wide margins
    # (correctness on held-out data is irrelevant here — both arms share
    # the weights).
    from dmm_net_tpu.config import TrainConfig
    from dmm_net_tpu.data.synthetic import synthetic_clip_batch
    from dmm_net_tpu.train.loop import create_train_state, make_train_step

    cfg_t = dataclasses.replace(
        base, train=TrainConfig(lr=3e-3, warmup_steps=5, total_steps=60))
    tb = {k: jnp.asarray(v) for k, v in synthetic_clip_batch(
        seed=1, batch=2, T=2, H=S, W=S, num_objects=2,
        num_proposals=8, pad_objects=M).items()}
    st_t = create_train_state(cfg_t, jax.random.PRNGKey(1), tb)
    tstep = make_train_step(cfg_t)
    for _ in range(60):
        st_t, _ = tstep(st_t, tb)
    variables = {"params": st_t.params, "batch_stats": st_t.batch_stats}

    def run(cfg):
        eng = InferenceEngine(cfg, model=DMMNet(cfg), variables=variables,
                              update_templates=True)

        def stream():
            for t in range(3):
                yield {"frame": seq["frames"][t][None],
                       "prop_masks": seq["prop_masks"][t][None],
                       "prop_valid": seq["prop_valid"][t][None]}

        return eng.run_sequence(stream(), tmpl_masks, tmpl_valid,
                                seq["frames"][0][None])["labels"]

    lab_f = run(base)
    lab_m = run(cfg_m)
    assert lab_f.shape == lab_m.shape            # labels stay full-res

    # Confidence margin per pixel from a manual rollout of the FULL-res
    # arm (labels never feed back into state, so both arms see identical
    # logits pre-resolve): margin = top1 - top2 over {objects, background}.
    st = state0
    margins = []
    for t in range(3):
        out, st = model_f.apply(variables, jnp.asarray(seq["frames"][t])[None],
                                jnp.asarray(seq["prop_masks"][t])[None],
                                jnp.asarray(seq["prop_valid"][t])[None],
                                jnp.zeros((1, M, 16)),
                                jnp.asarray(tmpl_valid), st)
        lg = jnp.where(jnp.asarray(tmpl_valid)[..., None, None],
                       out.logits, -jnp.inf)
        stacked = jnp.concatenate(
            [lg, jnp.zeros((1, 1) + lg.shape[-2:])], axis=1)  # bg logit = 0
        top2 = jax.lax.top_k(jnp.moveaxis(stacked, 1, -1), 2)[0]
        margins.append(np.asarray(top2[..., 0] - top2[..., 1])[0])
    margin = np.stack(margins)                   # (T, S, S)
    conf = margin > 0.25                         # >> bf16 eps at this scale
    assert conf.mean() > 0.5                     # the gate must have teeth
    dis = (lab_f[:, 0] != lab_m[:, 0])
    assert dis[conf].mean() < 1e-3, dis[conf].mean()
