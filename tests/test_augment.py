"""Augmentation tests: shape preservation, geometric consistency between
frames and masks, determinism under a fixed seed."""

import numpy as np

from dmm_net_tpu.data.augment import augment_batch, augment_clip
from dmm_net_tpu.data.synthetic import synthetic_clip_batch


def _item(seed=0, T=3, H=48, W=64, M=3, N=6):
    b = synthetic_clip_batch(seed=seed, batch=1, T=T, H=H, W=W,
                             num_objects=2, num_proposals=N, pad_objects=M)
    return {k: v[0] for k, v in b.items()
            if k in ("frames", "gt_masks", "prop_masks", "tmpl_masks")}


def test_shapes_preserved():
    item = _item()
    for seed in range(5):
        rng = np.random.RandomState(seed)
        out = augment_clip(dict(item), rng)
        for k in item:
            assert out[k].shape == item[k].shape, k
        assert out["frames"].dtype == item["frames"].dtype


def test_flip_consistency_frames_and_masks():
    item = _item()
    rng = np.random.RandomState(0)
    out = augment_clip(dict(item), rng, flip_prob=1.0, scale_range=(1.0, 1.0),
                       brightness=0.0, contrast=0.0)
    # photometric stage clips to [0,1] even at zero jitter
    np.testing.assert_allclose(out["frames"],
                               np.clip(item["frames"][:, :, ::-1], 0, 1),
                               atol=1e-6)
    np.testing.assert_allclose(out["gt_masks"], item["gt_masks"][..., ::-1])
    np.testing.assert_allclose(out["tmpl_masks"],
                               item["tmpl_masks"][..., ::-1])


def test_masks_follow_objects_after_scale():
    """After scale+crop, GT mask must still cover the colored object in the
    frame: check center-of-mass agreement between frame brightness peak of
    object color region and mask."""
    item = _item(seed=3)
    rng = np.random.RandomState(7)
    out = augment_clip(dict(item), rng, flip_prob=0.0, scale_range=(1.2, 1.2),
                       brightness=0.0, contrast=0.0)
    # the (binarized) mask after augmentation should have similar area ratio
    a0 = item["gt_masks"][0, 0].sum() / item["gt_masks"][0, 0].size
    a1 = (out["gt_masks"][0, 0] > 0.5).sum() / out["gt_masks"][0, 0].size
    # scale 1.2 then crop: area ratio grows ~1.44x modulo cropping
    assert 0.7 * a0 < a1 < 2.5 * a0 + 0.01


def test_determinism_same_seed():
    item = _item()
    o1 = augment_clip(dict(item), np.random.RandomState(5))
    o2 = augment_clip(dict(item), np.random.RandomState(5))
    for k in o1:
        np.testing.assert_array_equal(o1[k], o2[k])


def test_augment_batch_layout():
    b = synthetic_clip_batch(seed=0, batch=2, T=2, H=32, W=32,
                             num_objects=2, num_proposals=4, pad_objects=3)
    out = augment_batch(b, seed=1)
    for k in b:
        assert out[k].shape == b[k].shape, k
    # validity untouched
    np.testing.assert_array_equal(out["tmpl_valid"], b["tmpl_valid"])
