"""Detection AP evaluator + rich synthetic detection data (VERDICT r1 #4).

Hand-computed oracles for the COCO-protocol AP (101-point interpolation,
greedy score-ordered matching) — pycocotools is not installed in this
environment, so the oracle cases are small enough to verify on paper.
"""

import numpy as np

from dmm_net_tpu.data.synthetic import synthetic_detection_frame
from dmm_net_tpu.eval.detection_ap import (box_iou_matrix, evaluate_detections,
                                           mask_iou_matrix)


def _gt(boxes, labels):
    boxes = np.asarray(boxes, np.float32)
    return {"boxes": boxes, "labels": np.asarray(labels, np.int32),
            "valid": np.ones(len(boxes), bool)}


def _pred(boxes, scores, classes):
    return {"boxes": np.asarray(boxes, np.float32),
            "scores": np.asarray(scores, np.float32),
            "classes": np.asarray(classes, np.int32)}


def test_perfect_predictions_map_1():
    gt = _gt([[0, 0, 10, 10], [20, 20, 40, 40]], [1, 2])
    pred = _pred([[0, 0, 10, 10], [20, 20, 40, 40]], [0.9, 0.8], [1, 2])
    r = evaluate_detections([pred], [gt])
    assert r["mAP"] == 1.0 and r["AP50"] == 1.0 and r["AP75"] == 1.0
    assert r["AR"] == 1.0


def test_no_predictions_ap_0():
    gt = _gt([[0, 0, 10, 10]], [1])
    pred = _pred(np.zeros((0, 4)), [], [])
    r = evaluate_detections([pred], [gt])
    assert r["mAP"] == 0.0 and r["AR"] == 0.0


def test_half_recall_ap():
    # 2 GT, 1 perfect detection: precision 1 up to recall 0.5 -> AP=51/101
    gt = _gt([[0, 0, 10, 10], [50, 50, 60, 60]], [1, 1])
    pred = _pred([[0, 0, 10, 10]], [0.9], [1])
    r = evaluate_detections([pred], [gt])
    np.testing.assert_allclose(r["AP50"], 51 / 101, atol=1e-9)


def test_duplicate_detection_is_fp():
    # second hit on an already-matched GT counts as FP
    gt = _gt([[0, 0, 10, 10]], [1])
    pred = _pred([[0, 0, 10, 10], [0, 0, 10, 10]], [0.9, 0.8], [1, 1])
    r = evaluate_detections([pred], [gt])
    # recall hits 1.0 at precision 1 (first det), envelope keeps AP=1
    assert r["AP50"] == 1.0
    # but a higher-scored FP first drags the envelope down
    pred2 = _pred([[100, 100, 110, 110], [0, 0, 10, 10]], [0.95, 0.8], [1, 1])
    r2 = evaluate_detections([pred2], [gt])
    np.testing.assert_allclose(r2["AP50"], 0.5, atol=1e-2)


def test_localization_quality_separates_ap50_ap75():
    # IoU ~0.6 box: counts at 0.5, not at 0.75
    gt = _gt([[0, 0, 10, 10]], [1])
    pred = _pred([[0, 0, 10, 7.4]], [0.9], [1])  # IoU = 0.74: in (0.5, 0.75)
    iou = box_iou_matrix(pred["boxes"], gt["boxes"])[0, 0]
    assert 0.5 < iou < 0.75
    r = evaluate_detections([pred], [gt])
    assert r["AP50"] == 1.0 and r["AP75"] == 0.0


def test_mask_iou_branch():
    H = W = 32
    m_gt = np.zeros((1, H, W)); m_gt[0, :16] = 1
    m_pred = np.zeros((2, H, W)); m_pred[0, :16] = 1; m_pred[1, 16:] = 1
    assert mask_iou_matrix(m_pred, m_gt)[0, 0] == 1.0
    gt = {"boxes": np.zeros((1, 4)), "labels": np.array([1]),
          "valid": np.array([True]), "masks": m_gt}
    pred = {"boxes": np.zeros((2, 4)), "scores": np.array([0.9, 0.8]),
            "classes": np.array([1, 1]), "masks": m_pred}
    r = evaluate_detections([pred], [gt], iou_type="mask")
    assert r["AP50"] == 1.0


def test_classes_scored_independently():
    gt = _gt([[0, 0, 10, 10], [20, 20, 30, 30]], [1, 2])
    # class 1 perfect; class 2 missed entirely
    pred = _pred([[0, 0, 10, 10]], [0.9], [1])
    r = evaluate_detections([pred], [gt])
    np.testing.assert_allclose(r["mAP"], 0.5, atol=1e-9)


def test_detection_frame_properties():
    seen_classes = set()
    sizes = []
    for seed in range(12):
        d = synthetic_detection_frame(seed=seed, H=96, W=96, max_objects=6,
                                      num_classes=4)
        assert d["image"].shape == (96, 96, 3)
        assert d["image"].min() >= 0 and d["image"].max() <= 1
        v = d["valid"]
        for i in np.nonzero(v)[0]:
            x1, y1, x2, y2 = d["boxes"][i]
            assert x2 > x1 and y2 > y1
            ys, xs = np.nonzero(d["masks"][i] > 0.5)
            # boxes tight on the visible mask
            assert x1 == xs.min() and y1 == ys.min()
            assert x2 == xs.max() + 1 and y2 == ys.max() + 1
            assert 1 <= d["labels"][i] <= 3
            seen_classes.add(int(d["labels"][i]))
            sizes.append((x2 - x1) * (y2 - y1))
        # invisible slots fully zeroed
        for i in np.nonzero(~v)[0]:
            assert d["masks"][i].sum() == 0 and d["labels"][i] == 0
    assert seen_classes == {1, 2, 3}
    # multi-scale: at least 4x area spread across the benchmark
    assert max(sizes) / max(min(sizes), 1) > 4


def test_detection_frame_deterministic():
    a = synthetic_detection_frame(seed=3)
    b = synthetic_detection_frame(seed=3)
    np.testing.assert_array_equal(a["image"], b["image"])
    np.testing.assert_array_equal(a["boxes"], b["boxes"])


def test_occlusion_produces_partial_masks():
    # find a seed with real overlap: a visible mask clearly smaller than
    # its full shape would be, while still valid
    found = False
    for seed in range(40):
        d = synthetic_detection_frame(seed=seed, H=96, W=96, max_objects=8)
        v = d["valid"]
        if v.sum() >= 3:
            # overlapping boxes among valid objects?
            bx = d["boxes"][v]
            iou = box_iou_matrix(bx, bx)
            np.fill_diagonal(iou, 0)
            if iou.max() > 0.05:
                found = True
                break
    assert found, "benchmark never produced overlapping objects"
