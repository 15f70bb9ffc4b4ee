"""NMS tests vs a plain-numpy greedy oracle; YT-VOS reader smoke test on a
temp directory tree."""

import json
import os

import jax.numpy as jnp
import numpy as np

from dmm_net_tpu.ops.nms import box_iou, nms_boxes, nms_masks
from dmm_net_tpu.ops.cost import mask_iou


def _np_nms(boxes, scores, thr):
    idx = np.argsort(-scores)
    keep = []
    while idx.size:
        i = idx[0]
        keep.append(i)
        rest = idx[1:]
        if not rest.size:
            break
        # numpy IoU
        xx1 = np.maximum(boxes[i, 0], boxes[rest, 0])
        yy1 = np.maximum(boxes[i, 1], boxes[rest, 1])
        xx2 = np.minimum(boxes[i, 2], boxes[rest, 2])
        yy2 = np.minimum(boxes[i, 3], boxes[rest, 3])
        inter = np.maximum(xx2 - xx1, 0) * np.maximum(yy2 - yy1, 0)
        a_i = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
        a_r = (boxes[rest, 2] - boxes[rest, 0]) * (boxes[rest, 3] - boxes[rest, 1])
        iou = inter / np.maximum(a_i + a_r - inter, 1e-9)
        idx = rest[iou <= thr]
    return keep


def test_box_iou_known_values():
    a = jnp.asarray([[0, 0, 10, 10]], jnp.float32)
    b = jnp.asarray([[0, 0, 10, 10], [5, 5, 15, 15], [20, 20, 30, 30]],
                    jnp.float32)
    iou = np.asarray(box_iou(a, b))[0]
    np.testing.assert_allclose(iou, [1.0, 25 / 175, 0.0], atol=1e-6)


def test_nms_matches_numpy_oracle():
    rng = np.random.RandomState(0)
    for seed in range(5):
        rng = np.random.RandomState(seed)
        N = 40
        ctr = rng.rand(N, 2) * 80
        wh = rng.rand(N, 2) * 30 + 5
        boxes = np.concatenate([ctr - wh / 2, ctr + wh / 2], 1).astype(np.float32)
        scores = rng.rand(N).astype(np.float32)
        keep_idx, keep_mask = nms_boxes(jnp.asarray(boxes), jnp.asarray(scores),
                                        iou_threshold=0.5, max_out=N)
        got = [int(i) for i, m in zip(np.asarray(keep_idx), np.asarray(keep_mask)) if m]
        want = _np_nms(boxes, scores, 0.5)
        assert got == want


def test_nms_respects_valid_and_max_out():
    boxes = jnp.asarray([[0, 0, 10, 10], [100, 0, 110, 10], [0, 100, 10, 110]],
                        jnp.float32)
    scores = jnp.asarray([0.9, 0.8, 0.7])
    valid = jnp.asarray([True, False, True])
    ki, km = nms_boxes(boxes, scores, valid, iou_threshold=0.5, max_out=2)
    got = [int(i) for i, m in zip(np.asarray(ki), np.asarray(km)) if m]
    assert got == [0, 2]
    ki2, km2 = nms_boxes(boxes, scores, None, iou_threshold=0.5, max_out=2)
    assert np.asarray(km2).sum() == 2  # truncated at max_out


def test_mask_nms_suppresses_duplicates():
    rng = np.random.RandomState(1)
    base = (rng.rand(3, 256) > 0.6).astype(np.float32)
    # duplicates of mask 0 and 1 plus distinct mask 2
    masks = np.stack([base[0], base[0], base[1], base[2], base[1]])
    iou = mask_iou(jnp.asarray(masks), jnp.asarray(masks))
    scores = jnp.asarray([0.9, 0.95, 0.8, 0.7, 0.6])
    ki, km = nms_masks(iou, scores, iou_threshold=0.9, max_out=5)
    got = [int(i) for i, m in zip(np.asarray(ki), np.asarray(km)) if m]
    assert got == [1, 2, 3]


def test_ytvos_reader_smoke(tmp_path):
    from PIL import Image
    from dmm_net_tpu.data.ytvos import YTVOSDataset, write_submission

    root = str(tmp_path)
    vid = "video01"
    os.makedirs(os.path.join(root, "valid", "JPEGImages", vid))
    os.makedirs(os.path.join(root, "valid", "Annotations", vid))
    H0, W0 = 64, 96
    for t in range(6):
        img = (np.random.RandomState(t).rand(H0, W0, 3) * 255).astype(np.uint8)
        Image.fromarray(img).save(
            os.path.join(root, "valid", "JPEGImages", vid, f"{t:05d}.jpg"))
    # annotate frames 0 and 5; object 2 appears at frame 5
    ann0 = np.zeros((H0, W0), np.uint8)
    ann0[10:30, 10:30] = 1
    ann5 = np.zeros((H0, W0), np.uint8)
    ann5[12:32, 12:32] = 1
    ann5[40:60, 50:80] = 2
    for t, ann in [(0, ann0), (5, ann5)]:
        im = Image.fromarray(ann)  # L-mode: exact values survive
        im.save(os.path.join(root, "valid", "Annotations", vid, f"{t:05d}.png"))
    meta = {"videos": {vid: {"objects": {
        "1": {"frames": ["00000", "00005"]},
        "2": {"frames": ["00005"]}}}}}
    with open(os.path.join(root, "valid", "meta.json"), "w") as f:
        json.dump(meta, f)

    ds = YTVOSDataset(root, split="valid", image_size=(64, 96),
                      max_objects=4, max_proposals=8)
    assert ds.videos == [vid]
    sd = ds.sequence_stream(vid)
    assert sd["object_ids"] == [1, 2]
    assert sd["tmpl_valid"][0, :2].tolist() == [True, True]
    assert list(sd["live_from"][0, :2]) == [0, 5]
    assert sd["tmpl_frames"].shape == (1, 4, 64, 96, 3)
    items = list(sd["frames"])
    assert len(items) == 6
    assert items[0]["prop_valid"].any()

    labels = np.zeros((2, 64, 96), np.int32)
    labels[0, :10, :10] = 1
    labels[1, 20:30, 20:30] = 2
    write_submission(str(tmp_path / "sub"), vid, ["00000", "00005"], labels,
                     [1, 2], full_size=(H0, W0))
    out0 = np.asarray(Image.open(
        tmp_path / "sub" / "Annotations" / vid / "00000.png"))
    assert out0.shape == (H0, W0)
    assert set(np.unique(out0)) <= {0, 1, 2}


def test_class_aware_nms_via_offset_trick():
    """Boxes of different classes must not suppress each other when offset
    by class id x diagonal (the batched-NMS trick used by MaskRCNN)."""
    boxes = jnp.asarray([[0, 0, 10, 10], [1, 1, 11, 11]], jnp.float32)
    scores = jnp.asarray([0.9, 0.8])
    # same class: second box suppressed
    ki, km = nms_boxes(boxes, scores, iou_threshold=0.5, max_out=2)
    assert np.asarray(km).sum() == 1
    # different classes: offset separates them -> both kept
    cls = jnp.asarray([1.0, 2.0])[:, None] * 1000.0
    ki2, km2 = nms_boxes(boxes + cls, scores, iou_threshold=0.5, max_out=2)
    assert np.asarray(km2).sum() == 2
