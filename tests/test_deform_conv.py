"""Deformable conv v2 (SURVEY.md §3.2 15e rebuild) numerics.

Oracle strategy (§5.2 tiers 1-2): zero-offset DCN must equal a standard
XLA convolution exactly; integer offsets must equal a hand-shifted
gather; bilinear and boundary behavior checked against a numpy
reference; gradients vs finite differences.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dmm_net_tpu.ops.deform_conv import DeformConv, deform_conv2d


def _np_deform(x, offsets, weights, modulation=None, strides=(1, 1),
               dilation=(1, 1)):
    """Straight-line numpy reference (no vectorization tricks)."""
    B, H, W, Ci = x.shape
    kh, kw, _, Co = weights.shape
    sh, sw = strides
    Ho, Wo = -(-H // sh), -(-W // sw)
    out = np.zeros((B, Ho, Wo, Co), np.float64)
    for b in range(B):
        for i in range(Ho):
            for j in range(Wo):
                for k in range(kh * kw):
                    ky, kx = divmod(k, kw)
                    py = (i * sh + (ky - (kh - 1) / 2) * dilation[0]
                          + offsets[b, i, j, k, 0])
                    px = (j * sw + (kx - (kw - 1) / 2) * dilation[1]
                          + offsets[b, i, j, k, 1])
                    y0, x0 = int(np.floor(py)), int(np.floor(px))
                    fy, fx = py - y0, px - x0
                    v = np.zeros(Ci)
                    for dy, dx, wgt in ((0, 0, (1 - fy) * (1 - fx)),
                                        (0, 1, (1 - fy) * fx),
                                        (1, 0, fy * (1 - fx)),
                                        (1, 1, fy * fx)):
                        yy, xx = y0 + dy, x0 + dx
                        if 0 <= yy < H and 0 <= xx < W:
                            v += wgt * x[b, yy, xx]
                    if modulation is not None:
                        v *= modulation[b, i, j, k]
                    out[b, i, j] += v @ weights[ky, kx]
    return out


def _mk(seed, B=1, H=6, W=7, Ci=3, Co=4, kh=3, kw=3):
    rng = np.random.RandomState(seed)
    x = rng.randn(B, H, W, Ci).astype(np.float32)
    w = rng.randn(kh, kw, Ci, Co).astype(np.float32) * 0.2
    return x, w


def test_zero_offsets_equals_standard_conv():
    x, w = _mk(0)
    B, H, W, _ = x.shape
    off = jnp.zeros((B, H, W, 9, 2))
    got = deform_conv2d(jnp.asarray(x), off, jnp.asarray(w))
    want = jax.lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(w), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_zero_offsets_strided():
    x, w = _mk(1, H=8, W=8)
    off = jnp.zeros((1, 4, 4, 9, 2))
    got = deform_conv2d(jnp.asarray(x), off, jnp.asarray(w), strides=(2, 2))
    # torch DCN padding convention: symmetric (k-1)//2, kernel centered at
    # i*stride (XLA "SAME" at stride 2 pads asymmetrically instead).
    want = jax.lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(w), (2, 2), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("seed", [2, 3])
def test_random_offsets_vs_numpy(seed):
    x, w = _mk(seed, B=2, H=5, W=6)
    rng = np.random.RandomState(seed + 100)
    off = rng.uniform(-2, 2, (2, 5, 6, 9, 2)).astype(np.float32)
    mod = rng.uniform(0, 1.5, (2, 5, 6, 9)).astype(np.float32)
    got = deform_conv2d(jnp.asarray(x), jnp.asarray(off), jnp.asarray(w),
                        jnp.asarray(mod))
    want = _np_deform(x, off, w, mod)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)


def test_integer_offset_is_exact_shift():
    # offset (0, +1) on a 1x1 kernel = sample the pixel to the right.
    rng = np.random.RandomState(7)
    x = rng.randn(1, 4, 5, 2).astype(np.float32)
    w = np.eye(2, dtype=np.float32).reshape(1, 1, 2, 2)
    off = np.zeros((1, 4, 5, 1, 2), np.float32)
    off[..., 1] = 1.0
    got = np.asarray(deform_conv2d(jnp.asarray(x), jnp.asarray(off),
                                   jnp.asarray(w)))
    want = np.zeros_like(x)
    want[:, :, :-1] = x[:, :, 1:]   # out-of-bounds right column -> 0
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_out_of_bounds_samples_are_zero():
    x = np.ones((1, 3, 3, 1), np.float32)
    w = np.ones((1, 1, 1, 1), np.float32)
    off = np.full((1, 3, 3, 1, 2), 100.0, np.float32)
    got = np.asarray(deform_conv2d(jnp.asarray(x), jnp.asarray(off),
                                   jnp.asarray(w)))
    np.testing.assert_allclose(got, 0.0)


def test_gradients_vs_finite_differences():
    x, w = _mk(11, B=1, H=4, W=4, Ci=2, Co=2)
    rng = np.random.RandomState(12)
    off = rng.uniform(-1, 1, (1, 4, 4, 9, 2)).astype(np.float32)

    def f(xo):
        xx, oo = xo
        return jnp.sum(jnp.sin(deform_conv2d(xx, oo, jnp.asarray(w))))

    args = (jnp.asarray(x), jnp.asarray(off))
    g = jax.grad(f)(args)
    eps = 1e-3
    for gi, ai, idx in ((0, 0, (0, 1, 2, 1)), (1, 1, (0, 2, 2, 4, 0))):
        a_p = [np.array(a) for a in args]
        a_m = [np.array(a) for a in args]
        a_p[ai][idx] += eps
        a_m[ai][idx] -= eps
        fd = (float(f([jnp.asarray(v) for v in a_p]))
              - float(f([jnp.asarray(v) for v in a_m]))) / (2 * eps)
        np.testing.assert_allclose(float(np.asarray(g[gi])[idx]), fd,
                                   rtol=5e-2, atol=5e-3)


def test_module_init_equals_plain_conv():
    """Zero-init offset predictor + 2*sigmoid(0) modulation = plain conv."""
    x, _ = _mk(20, H=6, W=6, Ci=3, Co=8)
    m = DeformConv(8, (3, 3))
    variables = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    got = m.apply(variables, jnp.asarray(x))
    w = variables["params"]["kernel"]
    want = jax.lax.conv_general_dilated(
        jnp.asarray(x), w, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_deform_backbone_smoke():
    """ResNet with deform_stages runs and changes the param tree only by
    adding offset convs + kernels at the flagged stages."""
    from dmm_net_tpu.models.resnet import backbone_by_name
    x = jnp.zeros((1, 32, 32, 3))
    net = backbone_by_name("resnet18", dtype=jnp.float32,
                           deform_stages=("c5",))
    v = net.init(jax.random.PRNGKey(0), x)
    feats = net.apply(v, x, mutable=False)
    assert feats["c5"].shape == (1, 1, 1, 512)
    leaves = jax.tree_util.tree_leaves_with_path(v["params"])
    assert any("offset_conv" in jax.tree_util.keystr(p) for p, _ in leaves)
