"""Native C++ image loader (native/loader/imgloader.cpp) vs PIL/jax oracles.

The .so is built on demand (session-scoped fixture) so these tests run
the REAL native code path, not just the fallback — the suite's earlier
native-RLE test skipped when unbuilt, which left the C++ untested in CI.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module", autouse=True)
def built_loader():
    r = subprocess.run([sys.executable, os.path.join(REPO, "native",
                                                     "build.py")],
                       capture_output=True, text=True)
    if r.returncode != 0:
        pytest.skip(f"native build failed: {r.stderr[-400:]}")
    # module import caches the handle; force a re-probe after building
    from dmm_net_tpu.data import native_loader
    native_loader._TRIED = False
    native_loader._LIB = None
    if not native_loader.available():
        pytest.skip("libimgloader.so not loadable")


def _write_jpeg(path, h=97, w=113, seed=0):
    from PIL import Image
    rng = np.random.RandomState(seed)
    # smooth-ish content: JPEG of pure noise stresses nothing real
    base = rng.rand(h // 8 + 2, w // 8 + 2, 3)
    img = np.asarray(Image.fromarray(
        (base * 255).astype(np.uint8)).resize((w, h), Image.BILINEAR))
    Image.fromarray(img).save(path, quality=90)
    return img


def _write_palette_png(path, h=53, w=71, seed=1, n_labels=4):
    from PIL import Image
    rng = np.random.RandomState(seed)
    lab = rng.randint(0, n_labels, (h, w)).astype(np.uint8)
    im = Image.fromarray(lab, mode="P")
    im.putpalette([v for i in range(256) for v in (i, 0, 255 - i)])
    im.save(path)
    return lab


def test_jpeg_decode_matches_pil_exactly(tmp_path):
    """Same libjpeg underneath -> native-size decode must be bit-equal."""
    from PIL import Image
    from dmm_net_tpu.data import native_loader as nl

    p = str(tmp_path / "f.jpg")
    _write_jpeg(p)
    got = nl.load_rgb_native_size(p)
    want = np.asarray(Image.open(p).convert("RGB"))
    np.testing.assert_array_equal(got, want)


def test_palette_png_decode_exact(tmp_path):
    from dmm_net_tpu.data import native_loader as nl

    p = str(tmp_path / "a.png")
    lab = _write_palette_png(p)
    got = nl.load_label_native_size(p)
    np.testing.assert_array_equal(got, lab)


def test_resize_matches_jax_bilinear_within_one_step(tmp_path):
    """Downscale (antialiased triangle) and upscale vs jax.image.resize:
    float conventions match; only the final uint8 rounding may differ."""
    import jax
    import jax.numpy as jnp
    from PIL import Image
    from dmm_net_tpu.data import native_loader as nl

    p = str(tmp_path / "f.jpg")
    _write_jpeg(p, h=120, w=214, seed=3)
    src = np.asarray(Image.open(p).convert("RGB")).astype(np.float32)
    for hw in [(64, 112), (37, 61), (240, 428)]:   # down, odd-down, up
        got = nl.load_rgb_batch([p], hw)[0].astype(np.float32)
        want = np.asarray(jax.image.resize(
            jnp.asarray(src), hw + (3,), method="bilinear"))
        assert np.abs(got - want).max() <= 1.0 + 1e-3, hw


def test_label_batch_nearest_no_new_labels(tmp_path):
    from dmm_net_tpu.data import native_loader as nl

    p = str(tmp_path / "a.png")
    lab = _write_palette_png(p, h=97, w=53, n_labels=5)
    got = nl.load_label_batch([p, p], (48, 32))
    assert got.shape == (2, 48, 32)
    np.testing.assert_array_equal(got[0], got[1])
    assert set(np.unique(got)) <= set(np.unique(lab))
    # half-pixel nearest oracle in numpy
    ys = np.minimum(((np.arange(48) + 0.5) * (97 / 48)).astype(int), 96)
    xs = np.minimum(((np.arange(32) + 0.5) * (53 / 32)).astype(int), 52)
    np.testing.assert_array_equal(got[0], lab[np.ix_(ys, xs)])


def test_batch_threading_matches_serial(tmp_path):
    from dmm_net_tpu.data import native_loader as nl

    paths = []
    for i in range(12):
        p = str(tmp_path / f"f{i}.jpg")
        _write_jpeg(p, h=80 + i, w=100 + 2 * i, seed=i)
        paths.append(p)
    a = nl.load_rgb_batch(paths, (48, 64), threads=8)
    b = nl.load_rgb_batch(paths, (48, 64), threads=1)
    np.testing.assert_array_equal(a, b)
    assert a.shape == (12, 48, 64, 3)


def test_pil_fallback_agrees_when_native_disabled(tmp_path):
    """The fallback is the oracle: same file, native vs PIL resize paths
    agree within a couple uint8 steps (different rounding/fixed-point)."""
    from dmm_net_tpu.data import native_loader as nl

    p = str(tmp_path / "f.jpg")
    _write_jpeg(p, h=140, w=240, seed=7)
    native = nl.load_rgb_batch([p], (64, 112))[0].astype(int)
    lib, tried = nl._LIB, nl._TRIED
    try:
        nl._LIB, nl._TRIED = None, True     # force PIL path
        pil = nl.load_rgb_batch([p], (64, 112))[0].astype(int)
    finally:
        nl._LIB, nl._TRIED = lib, tried
    assert np.abs(native - pil).max() <= 3   # PIL uses 8-bit fixed point
    assert np.abs(native - pil).mean() < 0.2


def test_missing_file_falls_back_with_error(tmp_path):
    from dmm_net_tpu.data import native_loader as nl

    with pytest.raises(Exception):
        nl.load_rgb_batch([str(tmp_path / "nope.jpg")], (32, 32))
