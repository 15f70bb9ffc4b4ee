"""Inference-engine tests: per-frame vs chunked-scan equivalence, overlap
resolution semantics."""

import jax
import jax.numpy as jnp
import numpy as np

from dmm_net_tpu.config import Config, MatchingConfig, ModelConfig
from dmm_net_tpu.data.synthetic import synthetic_sequence
from dmm_net_tpu.infer.engine import InferenceEngine, resolve_overlaps
from dmm_net_tpu.models.dmm import DMMNet, FrameState


def _setup(T=5, S=64):
    cfg = Config(
        model=ModelConfig(backbone="resnet18", backbone_dtype="float32",
                          feature_dim=16, decoder_dim=8, image_size=(S, S),
                          template_update="aggregation"),
        matching=MatchingConfig(max_templates=4, max_proposals=8,
                                sinkhorn_iters=8, epsilon=0.05))
    seq = synthetic_sequence(seed=11, T=T, H=S, W=S, num_objects=2,
                             num_proposals=8)
    M = cfg.matching.max_templates
    pad = lambda x: np.pad(x, [(0, M - x.shape[0])] + [(0, 0)] * (x.ndim - 1))  # noqa: E731
    model = DMMNet(cfg)
    tmpl_masks = pad(seq["tmpl_masks"])[None]
    tmpl_valid = pad(seq["tmpl_valid"])[None]
    state0 = FrameState(
        template_masks=jnp.asarray(tmpl_masks, jnp.float32),
        decoder_state=jnp.zeros((1, M, S // 32, S // 32, 8)))
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.asarray(seq["frames"][:1]),
                           jnp.asarray(seq["prop_masks"][:1]),
                           jnp.asarray(seq["prop_valid"][:1]),
                           jnp.zeros((1, M, 16)), jnp.asarray(tmpl_valid),
                           state0)
    return cfg, model, variables, seq, tmpl_masks, tmpl_valid


def test_chunked_matches_per_frame():
    cfg, model, variables, seq, tmpl_masks, tmpl_valid = _setup(T=5)
    engine = InferenceEngine(cfg, model=model, variables=variables,
                             update_templates=True)

    def stream():
        for t in range(5):
            yield {"frame": seq["frames"][t][None],
                   "prop_masks": seq["prop_masks"][t][None],
                   "prop_valid": seq["prop_valid"][t][None]}

    r1 = engine.run_sequence(stream(), tmpl_masks, tmpl_valid,
                             seq["frames"][0][None])
    r2 = engine.run_sequence_chunked(
        seq["frames"][:, None], seq["prop_masks"][:, None],
        seq["prop_valid"][:, None], tmpl_masks, tmpl_valid, chunk=2)
    np.testing.assert_array_equal(r1["labels"], r2["labels"])
    np.testing.assert_allclose(r1["assignments"], r2["assignments"],
                               atol=1e-5)


def test_resolve_overlaps_semantics():
    # object 2 wins where its logit is higher; background where all below
    logits = jnp.full((1, 2, 4, 4), -10.0)
    logits = logits.at[0, 0, :2, :].set(3.0)
    logits = logits.at[0, 1, :2, :2].set(5.0)
    valid = jnp.asarray([[True, True]])
    lab = np.asarray(resolve_overlaps(logits, valid))[0]
    assert (lab[:2, :2] == 2).all()
    assert (lab[:2, 2:] == 1).all()
    assert (lab[2:, :] == 0).all()
    # invalid template never wins
    valid2 = jnp.asarray([[True, False]])
    lab2 = np.asarray(resolve_overlaps(logits, valid2))[0]
    assert (lab2[:2, :2] == 1).all()
