"""Regression tests for utils.hostinit + kernels.auto_interpret.

Round-4 showstopper (VERDICT r4 weak #1, BENCH_r04 rc=1): host_init runs
model.init under jax.default_device(cpu), but the Pallas kernels picked
interpret mode from jax.default_backend(), which still reports the process
backend ("tpu") inside that context — so the init forward lowered a
compiled pallas_call for CPU and raised "Only interpret mode is supported
on CPU backend" on every use_pallas TPU entry point (bench.py, infer.py,
train/loop.py, train_proposal.py). These tests pin the fix: interpret-mode
selection reads jax.config.jax_default_device first (kernels.auto_interpret)
and host_init works over a use_pallas=True model even when the default
backend claims to be non-CPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dmm_net_tpu.kernels import auto_interpret
from dmm_net_tpu.utils.hostinit import host_init


def test_auto_interpret_plain_cpu():
    # No default_device context; CPU test backend -> interpret.
    assert auto_interpret() is True


def test_auto_interpret_respects_default_device_over_backend(monkeypatch):
    # The round-4 regression scenario: the process backend reports "tpu"
    # (monkeypatched here; true on real hardware) while a default_device
    # context pins dispatch to the host CPU. interpret must be True.
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        assert auto_interpret() is True
    # Outside the context, the (fake) tpu backend -> compiled kernel.
    assert auto_interpret() is False


def test_auto_interpret_string_default_device(monkeypatch):
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    with jax.default_device("cpu"):
        assert auto_interpret() is True


def test_host_init_use_pallas_model_under_fake_tpu_backend(monkeypatch):
    # End-to-end pin: host_init over a use_pallas=True DMMNet init must not
    # dispatch a compiled pallas_call on the CPU even when
    # jax.default_backend() claims "tpu". Before the fix this raised
    # ValueError("Only interpret mode is supported on CPU backend").
    from dmm_net_tpu.config import preset
    from dmm_net_tpu.models.dmm import DMMNet
    from dmm_net_tpu.utils.bench_inputs import make_frame_inputs

    cfg = preset("p3_multi_object").override(**{
        "model.backbone": "resnet18",
        "model.image_size": (64, 64),
        "matching.max_templates": 4,
        "matching.max_proposals": 8,
        "data.batch_size": 1,
    })
    assert cfg.matching.use_pallas
    model = DMMNet(cfg)
    frame, pm, pv, tf_, tv, state = make_frame_inputs(cfg, B=1)
    z = lambda t: jax.tree.map(lambda x: np.zeros(x.shape, x.dtype), t)
    args = (z(frame), z(pm), z(pv), z(tf_), z(tv), z(state))

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    variables = host_init(lambda: model.init(jax.random.PRNGKey(0), *args))
    assert "params" in variables


def test_host_init_cpu_identity():
    # CPU target: the tree is returned as produced, no copy.
    tree = {"a": jnp.ones((2, 2)), "b": jnp.zeros((3,))}
    out = host_init(lambda: tree)
    assert out["a"] is tree["a"]


def test_host_init_accepts_sharding():
    # ADVICE r4 medium: a replicated NamedSharding target must be honored
    # so the jitted step's in_shardings match with no resharding.
    from jax.sharding import Mesh, NamedSharding, PartitionSpec

    mesh = Mesh(np.array(jax.devices()[:4]).reshape(4), ("data",))
    sharding = NamedSharding(mesh, PartitionSpec())
    out = host_init(lambda: {"w": jnp.arange(8.0)}, device=sharding)
    assert out["w"].sharding.is_equivalent_to(sharding, ndim=1)
    np.testing.assert_array_equal(np.asarray(out["w"]), np.arange(8.0))
