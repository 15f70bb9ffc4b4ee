"""COCO-style RLE mask codec (SURVEY.md §3.2 component #17).

The reference depends on cocoapi's C `maskApi.c` for RLE
encode/decode/area/IoU — used for the proposal cache on disk and the
YouTube-VOS submission format. Rebuild strategy:

  * host-side codec here, API-compatible with pycocotools' dict format
    {"size": [h, w], "counts": <compressed bytes>} including the LEB128-
    style char compression, so caches written by the reference tooling are
    readable and our submissions are valid;
  * a C++ implementation (native/rle/maskrle.cpp, loaded via ctypes) is
    used when built — `python native/build.py` — with this numpy code as
    the always-available fallback and the correctness oracle;
  * device-side mask IoU never touches RLE (dense matmul in ops/cost.py).

Column-major ("F") order throughout, matching COCO.
"""

from __future__ import annotations

import ctypes
import os
from typing import Dict, List, Optional

import numpy as np

# ---------------------------------------------------------------------------
# optional native backend
# ---------------------------------------------------------------------------

_LIB: Optional[ctypes.CDLL] = None


def _native() -> Optional[ctypes.CDLL]:
    global _LIB
    if _LIB is None:
        so = os.path.join(os.path.dirname(__file__), "..", "..", "native",
                          "rle", "libmaskrle.so")
        so = os.path.abspath(so)
        if os.path.exists(so):
            lib = ctypes.CDLL(so)
            lib.rle_encode.restype = ctypes.c_int
            lib.rle_encode.argtypes = [
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(ctypes.c_uint32), ctypes.c_int]
            lib.rle_decode.restype = ctypes.c_int
            lib.rle_decode.argtypes = [
                ctypes.POINTER(ctypes.c_uint32), ctypes.c_int,
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_int]
            lib.rle_iou.restype = ctypes.c_double
            lib.rle_iou.argtypes = [
                ctypes.POINTER(ctypes.c_uint32), ctypes.c_int,
                ctypes.POINTER(ctypes.c_uint32), ctypes.c_int]
            _LIB = lib
        else:
            _LIB = False  # probed, not available
    return _LIB or None


# ---------------------------------------------------------------------------
# raw counts <-> binary mask
# ---------------------------------------------------------------------------

def encode_counts(mask: np.ndarray) -> np.ndarray:
    """Binary mask (h, w) -> uint32 run lengths (column-major, starting
    with the zero-run, possibly of length 0)."""
    flat = np.asfortranarray(mask.astype(np.uint8)).reshape(-1, order="F")
    lib = _native()
    if lib is not None:
        out = np.zeros(flat.size + 2, np.uint32)
        n = lib.rle_encode(flat.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                           int(mask.shape[0]), int(mask.shape[1]),
                           out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
                           out.size)
        return out[:n].copy()
    if flat.size == 0:
        return np.zeros(0, np.uint32)
    change = np.nonzero(np.diff(flat))[0] + 1
    bounds = np.concatenate([[0], change, [flat.size]])
    runs = np.diff(bounds).astype(np.uint32)
    if flat[0] == 1:
        runs = np.concatenate([[np.uint32(0)], runs])
    return runs


def decode_counts(counts: np.ndarray, h: int, w: int) -> np.ndarray:
    """uint32 run lengths -> binary mask (h, w) uint8."""
    counts = np.asarray(counts, np.uint32)
    lib = _native()
    if lib is not None:
        out = np.zeros(h * w, np.uint8)
        lib.rle_decode(counts.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
                       counts.size,
                       out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                       out.size)
        return out.reshape((h, w), order="F")
    vals = np.zeros(len(counts), np.uint8)
    vals[1::2] = 1
    flat = np.repeat(vals, counts)
    flat = np.resize(flat, h * w) if flat.size != h * w else flat
    return flat.reshape((h, w), order="F")


# ---------------------------------------------------------------------------
# COCO compressed string format (LEB128-ish with delta encoding)
# ---------------------------------------------------------------------------

def _counts_to_string(counts: np.ndarray) -> bytes:
    s = bytearray()
    cnts = counts.astype(np.int64)
    for i, x in enumerate(cnts):
        if i > 2:
            x = x - cnts[i - 2]
        x = int(x)
        more = True
        while more:
            c = x & 0x1F
            x >>= 5
            more = not ((x == 0 and not (c & 0x10)) or (x == -1 and (c & 0x10)))
            if more:
                c |= 0x20
            s.append(c + 48)
    return bytes(s)


def _string_to_counts(s: bytes) -> np.ndarray:
    counts: List[int] = []
    i = 0
    while i < len(s):
        x = 0
        k = 0
        more = True
        while more:
            c = s[i] - 48
            x |= (c & 0x1F) << (5 * k)
            more = bool(c & 0x20)
            i += 1
            k += 1
            if not more and (c & 0x10):
                x |= -1 << (5 * k)
        if len(counts) > 2:
            x += counts[-2]
        counts.append(x)
    return np.asarray(counts, np.uint32)


def encode(mask: np.ndarray) -> Dict:
    """Binary mask -> COCO RLE dict (compressed counts)."""
    h, w = mask.shape
    return {"size": [int(h), int(w)],
            "counts": _counts_to_string(encode_counts(mask))}


def decode(rle: Dict) -> np.ndarray:
    """COCO RLE dict -> binary mask uint8 (h, w)."""
    h, w = rle["size"]
    counts = rle["counts"]
    if isinstance(counts, (bytes, str)):
        if isinstance(counts, str):
            counts = counts.encode()
        counts = _string_to_counts(counts)
    return decode_counts(np.asarray(counts, np.uint32), h, w)


def area(rle: Dict) -> int:
    counts = rle["counts"]
    if isinstance(counts, (bytes, str)):
        if isinstance(counts, str):
            counts = counts.encode()
        counts = _string_to_counts(counts)
    return int(np.asarray(counts[1::2], np.int64).sum())


def iou(rle_a: Dict, rle_b: Dict) -> float:
    """IoU of two RLE masks (decodes; the native path intersects runs)."""
    lib = _native()
    if lib is not None:
        ca = rle_a["counts"]
        cb = rle_b["counts"]
        if isinstance(ca, (bytes, str)):
            ca = _string_to_counts(ca if isinstance(ca, bytes) else ca.encode())
        if isinstance(cb, (bytes, str)):
            cb = _string_to_counts(cb if isinstance(cb, bytes) else cb.encode())
        ca = np.ascontiguousarray(ca, np.uint32)
        cb = np.ascontiguousarray(cb, np.uint32)
        return float(lib.rle_iou(
            ca.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)), ca.size,
            cb.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)), cb.size))
    a = decode(rle_a).astype(bool)
    b = decode(rle_b).astype(bool)
    union = (a | b).sum()
    return float((a & b).sum() / union) if union else 0.0
