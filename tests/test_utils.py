"""Utils tests: checkify wrapper, stage timer, metrics writer, checkpointer."""

import json
import os

import jax.numpy as jnp
import numpy as np
import pytest

from dmm_net_tpu.utils.debug import checked
from dmm_net_tpu.utils.logging import MetricsWriter
from dmm_net_tpu.utils.profiling import StageTimer


def test_checked_raises_on_nan():
    def f(x):
        return jnp.log(x)  # NaN for negative input

    g = checked(f)
    assert np.isfinite(float(g(jnp.asarray(2.0))))
    with pytest.raises(Exception):
        g(jnp.asarray(-1.0))


def test_stage_timer_accumulates():
    t = StageTimer()
    with t.stage("a"):
        sum(range(1000))
    with t.stage("a"):
        sum(range(1000))
    with t.stage("b"):
        pass
    assert t.counts["a"] == 2 and t.counts["b"] == 1
    rep = t.report()
    assert "a" in rep and "ms/call" in rep


def test_metrics_writer_jsonl(tmp_path):
    w = MetricsWriter(str(tmp_path))
    w.write(1, {"loss": 0.5})
    w.write(2, {"loss": 0.25, "fps": 10.0})
    w.close()
    lines = [json.loads(l) for l in open(tmp_path / "metrics.jsonl")]
    assert lines[0]["step"] == 1 and lines[0]["loss"] == 0.5
    assert lines[1]["fps"] == 10.0


def test_checkpointer_roundtrip(tmp_path):
    import jax
    from dmm_net_tpu.config import Config, DataConfig, MatchingConfig, \
        ModelConfig, TrainConfig
    from dmm_net_tpu.data.synthetic import synthetic_clip_batch
    from dmm_net_tpu.train.loop import create_train_state
    from dmm_net_tpu.utils.checkpoint import Checkpointer

    cfg = Config(
        model=ModelConfig(backbone="resnet18", backbone_dtype="float32",
                          feature_dim=8, decoder_dim=8, image_size=(64, 64)),
        matching=MatchingConfig(max_templates=2, max_proposals=4,
                                sinkhorn_iters=3),
        data=DataConfig(batch_size=1, clip_length=1),
        train=TrainConfig())
    batch = {k: jnp.asarray(v) for k, v in synthetic_clip_batch(
        seed=0, batch=1, T=1, H=64, W=64, num_objects=2, num_proposals=4,
        pad_objects=2).items()}
    state = create_train_state(cfg, jax.random.PRNGKey(0), batch)
    state = state.replace(step=jnp.asarray(7, jnp.int32))

    ck = Checkpointer(str(tmp_path / "ckpt"), async_save=False)
    ck.save(state)
    ck.wait()
    assert ck.latest_step() == 7

    fresh = create_train_state(cfg, jax.random.PRNGKey(1), batch)
    restored = ck.restore(fresh)
    assert int(restored.step) == 7
    a = jax.tree.leaves(state.params)
    b = jax.tree.leaves(restored.params)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    ck.close()
