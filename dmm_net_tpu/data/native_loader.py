"""Native (C++) image loading with a PIL fallback/oracle.

The reference's data layer decodes JPEG/PNG through PIL/cv2's C code
inside multi-process DataLoader workers (SURVEY.md §3.2 #16). The TPU
rebuild keeps everything in ONE process (the staging pipeline in
data/pipeline.py is thread-based), so the decode path must not hold the
GIL: `native/loader/imgloader.cpp` runs libjpeg/libpng decode plus the
antialiased separable bilinear resize in a C++ thread pool, called
through ctypes (`ctypes` releases the GIL for the duration of the call).

Semantics:
  * frames  -> uint8 RGB, resized with half-pixel antialiased triangle
    weights (the jax.image.resize(method="bilinear") convention; agrees
    with PIL BILINEAR within +-1/255 — bit-exactness across libraries is
    undefined because each rounds differently);
  * labels  -> uint8 palette INDEX maps, half-pixel NEAREST (labels are
    never interpolated).

`load_rgb_batch` / `load_label_batch` transparently fall back to PIL
when the .so is absent (`python native/build.py` creates it). The PIL
path is also the correctness oracle in tests/test_native_loader.py.
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional, Sequence, Tuple

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _native() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    so = os.path.abspath(os.path.join(
        os.path.dirname(__file__), "..", "..", "native", "loader",
        "libimgloader.so"))
    if not os.path.exists(so):
        return None
    lib = ctypes.CDLL(so)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    lib.imgl_probe.restype = ctypes.c_int
    lib.imgl_probe.argtypes = [ctypes.c_char_p, ctypes.POINTER(ctypes.c_int),
                               ctypes.POINTER(ctypes.c_int),
                               ctypes.POINTER(ctypes.c_int)]
    lib.imgl_decode_rgb.restype = ctypes.c_int
    lib.imgl_decode_rgb.argtypes = [
        ctypes.c_char_p, u8p, ctypes.c_long,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
    lib.imgl_decode_palette.restype = ctypes.c_int
    lib.imgl_decode_palette.argtypes = lib.imgl_decode_rgb.argtypes
    lib.imgl_load_rgb_batch.restype = ctypes.c_int
    lib.imgl_load_rgb_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, u8p, ctypes.c_int]
    lib.imgl_load_palette_batch.restype = ctypes.c_int
    lib.imgl_load_palette_batch.argtypes = lib.imgl_load_rgb_batch.argtypes
    _LIB = lib
    return _LIB


def available() -> bool:
    """True when the C++ loader is built and loadable."""
    return _native() is not None


def _paths_array(paths: Sequence[str]):
    arr = (ctypes.c_char_p * len(paths))()
    arr[:] = [p.encode() for p in paths]
    return arr


def probe(path: str) -> Tuple[int, int, int]:
    """(h, w, channels) without a Python-side decode."""
    lib = _native()
    if lib is not None:
        h = ctypes.c_int()
        w = ctypes.c_int()
        c = ctypes.c_int()
        if lib.imgl_probe(path.encode(), ctypes.byref(h), ctypes.byref(w),
                          ctypes.byref(c)) == 0:
            return h.value, w.value, c.value
    from PIL import Image
    with Image.open(path) as im:
        return im.height, im.width, 1 if im.mode in ("P", "L") else 3


def load_rgb_batch(paths: Sequence[str], hw: Tuple[int, int],
                   threads: int = 8) -> np.ndarray:
    """Decode + resize frames -> (N, H, W, 3) uint8."""
    H, W = hw
    if not paths:
        return np.zeros((0, H, W, 3), np.uint8)
    lib = _native()
    if lib is not None:
        out = np.empty((len(paths), H, W, 3), np.uint8)
        fails = lib.imgl_load_rgb_batch(
            _paths_array(paths), len(paths), H, W,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), threads)
        if fails == 0:
            return out
        # fall through to PIL for a readable per-file error
    from PIL import Image
    out = np.empty((len(paths), H, W, 3), np.uint8)
    for i, p in enumerate(paths):
        with Image.open(p) as im:
            out[i] = np.asarray(
                im.convert("RGB").resize((W, H), Image.BILINEAR))
    return out


def load_label_batch(paths: Sequence[str], hw: Tuple[int, int],
                     threads: int = 8) -> np.ndarray:
    """Decode palette/gray annotations + NEAREST resize -> (N, H, W) uint8."""
    H, W = hw
    if not paths:
        return np.zeros((0, H, W), np.uint8)
    lib = _native()
    if lib is not None:
        out = np.empty((len(paths), H, W), np.uint8)
        fails = lib.imgl_load_palette_batch(
            _paths_array(paths), len(paths), H, W,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), threads)
        if fails == 0:
            return out
    from PIL import Image
    out = np.empty((len(paths), H, W), np.uint8)
    for i, p in enumerate(paths):
        with Image.open(p) as im:
            a = np.asarray(im.resize((W, H), Image.NEAREST))
            out[i] = a[..., 0] if a.ndim == 3 else a   # RGB-coded labels
    return out


def load_rgb_native_size(path: str) -> np.ndarray:
    """One frame at its native resolution -> (h, w, 3) uint8."""
    lib = _native()
    if lib is not None:
        h, w, _ = probe(path)
        out = np.empty((h, w, 3), np.uint8)
        oh = ctypes.c_int()
        ow = ctypes.c_int()
        r = lib.imgl_decode_rgb(
            path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            out.nbytes, ctypes.byref(oh), ctypes.byref(ow))
        if r >= 0:
            return out
    from PIL import Image
    with Image.open(path) as im:
        return np.asarray(im.convert("RGB"))


def load_label_native_size(path: str) -> np.ndarray:
    """One annotation at native resolution -> (h, w) uint8 index map."""
    lib = _native()
    if lib is not None:
        h, w, _ = probe(path)
        out = np.empty((h, w), np.uint8)
        oh = ctypes.c_int()
        ow = ctypes.c_int()
        r = lib.imgl_decode_palette(
            path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            out.nbytes, ctypes.byref(oh), ctypes.byref(ow))
        if r >= 0:
            return out
    from PIL import Image
    with Image.open(path) as im:
        return np.asarray(im)
