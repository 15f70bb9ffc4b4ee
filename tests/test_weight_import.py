"""Weight-importer tests: tree-structure fidelity against model.init and a
numeric stem check against direct numpy conv/BN."""

import jax
import jax.numpy as jnp
import numpy as np

from dmm_net_tpu.models.resnet import ResNet18, ResNet50
from tools.import_torch_weights import load_torch_resnet


def _fake_torch_resnet_sd(stage_sizes, bottleneck, rng):
    """Random arrays in exact torchvision ResNet state_dict layout."""
    sd = {}
    width = 64

    def add_conv(name, cin, cout, k):
        sd[f"{name}.weight"] = rng.randn(cout, cin, k, k).astype(np.float32) * 0.05

    def add_bn(name, c):
        sd[f"{name}.weight"] = rng.rand(c).astype(np.float32) + 0.5
        sd[f"{name}.bias"] = rng.randn(c).astype(np.float32) * 0.1
        sd[f"{name}.running_mean"] = rng.randn(c).astype(np.float32) * 0.1
        sd[f"{name}.running_var"] = rng.rand(c).astype(np.float32) + 0.5

    add_conv("conv1", 3, width, 7)
    add_bn("bn1", width)
    cin = width
    for stage, n in enumerate(stage_sizes, start=1):
        planes = width * 2 ** (stage - 1)
        cout = planes * (4 if bottleneck else 1)
        for j in range(n):
            tp = f"layer{stage}.{j}"
            if bottleneck:
                add_conv(f"{tp}.conv1", cin, planes, 1)
                add_bn(f"{tp}.bn1", planes)
                add_conv(f"{tp}.conv2", planes, planes, 3)
                add_bn(f"{tp}.bn2", planes)
                add_conv(f"{tp}.conv3", planes, cout, 1)
                add_bn(f"{tp}.bn3", cout)
            else:
                add_conv(f"{tp}.conv1", cin, planes, 3)
                add_bn(f"{tp}.bn1", planes)
                add_conv(f"{tp}.conv2", planes, planes, 3)
                add_bn(f"{tp}.bn2", planes)
            if j == 0 and cin != cout:
                add_conv(f"{tp}.downsample.0", cin, cout, 1)
                add_bn(f"{tp}.downsample.1", cout)
            cin = cout
    return sd


def _tree_shapes(t):
    return jax.tree.map(lambda x: tuple(x.shape), t)


def test_import_matches_flax_init_structure_resnet50():
    rng = np.random.RandomState(0)
    sd = _fake_torch_resnet_sd((3, 4, 6, 3), True, rng)
    params, stats = load_torch_resnet(sd, (3, 4, 6, 3), bottleneck=True)

    model = ResNet50(dtype=jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    want_p = jax.tree.map(np.asarray, variables["params"])
    want_s = jax.tree.map(np.asarray, variables["batch_stats"])
    assert _tree_shapes(params) == _tree_shapes(want_p)
    assert _tree_shapes(stats) == _tree_shapes(want_s)


def test_imported_stem_forward_matches_numpy():
    rng = np.random.RandomState(1)
    sd = _fake_torch_resnet_sd((2, 2, 2, 2), False, rng)
    params, stats = load_torch_resnet(sd, (2, 2, 2, 2), bottleneck=False)

    model = ResNet18(dtype=jnp.float32)
    x = rng.randn(1, 32, 32, 3).astype(np.float32)
    feats = model.apply({"params": params, "batch_stats": stats},
                        jnp.asarray(x))
    c1 = np.asarray(feats["c1"])  # stem output: conv7x7 s2 + BN + relu

    # numpy oracle for the stem
    w = sd["conv1.weight"]  # (64, 3, 7, 7)
    xp = np.pad(x[0], ((3, 3), (3, 3), (0, 0)))
    H, W = 16, 16
    out = np.zeros((H, W, 64), np.float32)
    for oy in range(H):
        for ox in range(W):
            patch = xp[oy * 2:oy * 2 + 7, ox * 2:ox * 2 + 7, :]  # (7,7,3)
            out[oy, ox] = np.tensordot(patch, np.transpose(w, (2, 3, 1, 0)),
                                       axes=([0, 1, 2], [0, 1, 2]))
    g, b = sd["bn1.weight"], sd["bn1.bias"]
    mu, var = sd["bn1.running_mean"], sd["bn1.running_var"]
    out = (out - mu) / np.sqrt(var + 1e-5) * g + b
    out = np.maximum(out, 0)
    np.testing.assert_allclose(c1[0], out, atol=2e-4, rtol=1e-3)


def test_imported_full_forward_runs_and_finite():
    rng = np.random.RandomState(2)
    sd = _fake_torch_resnet_sd((2, 2, 2, 2), False, rng)
    params, stats = load_torch_resnet(sd, (2, 2, 2, 2), bottleneck=False)
    model = ResNet18(dtype=jnp.float32)
    feats = model.apply({"params": params, "batch_stats": stats},
                        jnp.asarray(rng.randn(2, 64, 64, 3), jnp.float32))
    for k, v in feats.items():
        assert np.isfinite(np.asarray(v)).all(), k


def test_pth_cli_roundtrip_released_checkpoint_shape(tmp_path):
    """Day-one dress rehearsal (VERDICT r4 next #8): a full
    released-checkpoint-shaped .pth — torchvision R-50 key layout wrapped
    in a {"state_dict": ...} dict with DataParallel "module." prefixes,
    exactly what reference-era torch.save'd checkpoints look like —
    round-tripped through the REAL tools/import_torch_weights.py CLI into
    msgpack, then deserialized and forwarded through the flax backbone."""
    import os
    import subprocess
    import sys

    import torch
    from flax import serialization

    rng = np.random.RandomState(7)
    sd = _fake_torch_resnet_sd((3, 4, 6, 3), True, rng)
    # released-checkpoint dressing: module. prefixes + wrapper dict with
    # non-tensor metadata entries the importer must skip
    ckpt = {"state_dict": {f"module.{k}": torch.from_numpy(v)
                           for k, v in sd.items()},
            "epoch": 12, "arch": "resnet50"}
    pth = str(tmp_path / "dmm_release.pth")
    out = str(tmp_path / "backbone.msgpack")
    torch.save(ckpt, pth)

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("XLA_FLAGS", None)
    r = subprocess.run(
        [sys.executable, "tools/import_torch_weights.py", "--pth", pth,
         "--out", out, "--arch", "resnet50"],
        cwd=repo, env=env, capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "M params" in r.stdout

    with open(out, "rb") as f:
        tree = serialization.msgpack_restore(f.read())
    model = ResNet50(dtype=jnp.float32)
    want = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    assert _tree_shapes(tree["params"]) == _tree_shapes(
        jax.tree.map(np.asarray, want["params"]))
    assert _tree_shapes(tree["batch_stats"]) == _tree_shapes(
        jax.tree.map(np.asarray, want["batch_stats"]))
    # numeric spot check: the msgpack values ARE the .pth values
    np.testing.assert_array_equal(
        tree["params"]["conv_init"]["kernel"],
        np.transpose(sd["conv1.weight"], (2, 3, 1, 0)))
    feats = model.apply(tree, jnp.asarray(rng.randn(1, 64, 64, 3),
                                          jnp.float32))
    for k, v in feats.items():
        assert np.isfinite(np.asarray(v)).all(), k
