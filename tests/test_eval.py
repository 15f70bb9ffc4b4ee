"""Tests for the DAVIS J&F scorer (bit-faithfulness properties)."""

import numpy as np

from dmm_net_tpu.eval.davis_jf import (
    db_eval_boundary,
    db_eval_iou,
    evaluate_sequence,
)


def _square(H, W, y0, x0, s):
    m = np.zeros((H, W), bool)
    m[y0:y0 + s, x0:x0 + s] = True
    return m


def test_iou_exact_values():
    a = _square(32, 32, 4, 4, 10)
    assert db_eval_iou(a, a) == 1.0
    b = _square(32, 32, 4, 9, 10)  # half-overlap in x
    # inter = 10*5, union = 10*15
    assert abs(db_eval_iou(a, b) - (50 / 150)) < 1e-9
    assert db_eval_iou(a, np.zeros((32, 32), bool)) == 0.0
    assert db_eval_iou(np.zeros((32, 32), bool), np.zeros((32, 32), bool)) == 1.0


def test_boundary_perfect_and_disjoint():
    a = _square(64, 64, 10, 10, 20)
    assert db_eval_boundary(a, a) == 1.0
    far = _square(64, 64, 40, 40, 10)
    assert db_eval_boundary(a, far) < 0.2


def test_boundary_tolerates_small_shift():
    a = _square(256, 256, 50, 50, 100)
    shifted = _square(256, 256, 51, 50, 100)  # 1px shift << tolerance
    assert db_eval_boundary(a, shifted) > 0.95


def test_evaluate_sequence_label_maps():
    T, H, W = 4, 64, 64
    gt = np.zeros((T, H, W), np.int32)
    for t in range(T):
        gt[t, 10 + t:30 + t, 10:30] = 1
        gt[t, 40:55, 40 + t:55 + t] = 2
    res = evaluate_sequence(gt, gt)
    assert res["J"] == 1.0 and res["F"] == 1.0 and res["J&F"] == 1.0
    assert res["object_ids"] == [1, 2]

    # degrade object 2 completely
    pred = gt.copy()
    pred[pred == 2] = 0
    res2 = evaluate_sequence(gt, pred)
    assert res2["J_per_object"][0] == 1.0
    assert res2["J_per_object"][1] == 0.0
    assert 0.4 < res2["J&F"] < 0.6


def test_first_last_frame_exclusion():
    T, H, W = 3, 32, 32
    gt = np.zeros((T, H, W), np.int32)
    gt[:, 5:15, 5:15] = 1
    pred = gt.copy()
    pred[0] = 0   # ruin first frame: excluded by protocol
    pred[2] = 0   # ruin last frame: excluded
    res = evaluate_sequence(gt, pred)
    assert res["J"] == 1.0


def test_ytvos_local_scorer():
    from dmm_net_tpu.eval.ytvos_local import evaluate_video, summarize

    H = W = 32
    sq = lambda y, x, s: _square(H, W, y, x, s)  # noqa: E731
    gt = {}
    pred = {}
    for i, stem in enumerate(["00000", "00005", "00010"]):
        g = np.zeros((H, W), np.int32)
        g[sq(4 + i, 4, 10)] = 1
        if stem >= "00005":
            g[sq(20, 20, 8)] = 2
        gt[stem] = g
    # perfect prediction for obj 1; object 2 predicted empty
    for stem, g in gt.items():
        p = g.copy()
        p[p == 2] = 0
        pred[stem] = p
    res = evaluate_video(gt, pred, {1: "00000", 2: "00005"})
    assert res[1]["J"] == 1.0 and res[1]["F"] == 1.0
    assert res[2]["J"] == 0.0
    s = summarize({"v": res})
    assert 0.4 < s["overall"]["G"] < 0.6
    s2 = summarize({"v": res}, seen_categories={"v": [1]})
    assert s2["seen"]["G"] == 1.0 and s2["unseen"]["G"] < 0.1


def test_ytvos_local_scorer_from_written_submission(tmp_path):
    """End-to-end drill (VERDICT r2 next #8): engine labels -> the official
    submission tree (palette PNGs, original resolution via write_submission)
    -> read back -> local protocol score. Proves the bytes the server would
    receive score correctly, not just in-memory arrays."""
    import os

    from PIL import Image

    from dmm_net_tpu.data.ytvos import write_submission
    from dmm_net_tpu.eval.ytvos_local import evaluate_video, summarize

    H, W = 32, 48
    full = (64, 96)                     # original resolution != model res
    stems = ["00000", "00005", "00010"]
    labels = np.zeros((3, H, W), np.uint8)
    labels[:, 4:14, 4:14] = 1           # slot 1
    labels[1:, 18:26, 30:40] = 2        # slot 2 appears at its live frame
    object_ids = [3, 7]                 # non-contiguous original ids
    write_submission(str(tmp_path), "vidA", stems, labels, object_ids,
                     full_size=full)

    pred = {}
    for stem in stems:
        p = os.path.join(str(tmp_path), "Annotations", "vidA", f"{stem}.png")
        with Image.open(p) as im:
            assert im.mode == "P"       # server wants palette PNGs
            arr = np.asarray(im)
        assert arr.shape == full
        pred[stem] = arr.astype(np.int32)
    assert set(np.unique(pred["00005"])) == {0, 3, 7}

    # GT at original resolution = the exact upsampled masks
    gt = {s: np.asarray(Image.fromarray(
        np.asarray([0, 3, 7], np.uint8)[labels[i]]).resize(
            (full[1], full[0]), Image.NEAREST)).astype(np.int32)
        for i, s in enumerate(stems)}
    res = evaluate_video(gt, pred, {3: "00000", 7: "00005"})
    assert res[3]["J"] == 1.0 and res[3]["F"] == 1.0
    assert res[7]["J"] == 1.0
    assert summarize({"vidA": res})["overall"]["G"] == 1.0


def test_recall_and_decay_statistics():
    T, H, W = 10, 32, 32
    gt = np.zeros((T, H, W), np.int32)
    gt[:, 5:20, 5:20] = 1
    # prediction degrades over time: full box early, shrinking late
    pred = np.zeros_like(gt)
    for t in range(T):
        sz = 15 - t  # 15 down to 6
        pred[t, 5:5 + sz, 5:5 + sz] = 1
    res = evaluate_sequence(gt, pred)
    assert 0 < res["J"] < 1
    # decay positive: early frames better than late
    assert res["J_decay"] > 0.1
    # recall: fraction of frames with J > 0.5
    assert 0 <= res["J_recall"] <= 1
    # perfect prediction: recall 1, decay 0
    r2 = evaluate_sequence(gt, gt)
    assert r2["J_recall"] == 1.0 and abs(r2["J_decay"]) < 1e-9


def test_native_resolution_scoring_differs_from_model_res():
    """Protocol fidelity (VERDICT r1 #3): scoring at the annotation's
    native resolution must use upsample_labels(pred) vs native GT; on fine
    structure this gives a different (here: lower, honest) score than the
    legacy GT-downsampled-to-model-res shortcut."""
    from PIL import Image
    from dmm_net_tpu.eval.davis_jf import upsample_labels

    T, Hn, Wn, Hm, Wm = 5, 128, 128, 32, 32
    rng = np.random.RandomState(0)
    # native GT with fine structure: a blob plus thin 2px protrusions that
    # vanish at model resolution
    gt_native = np.zeros((T, Hn, Wn), np.int32)
    for t in range(T):
        y = 30 + 2 * t
        gt_native[t, y:y + 40, 30:70] = 1
        for k in range(6):           # thin spikes off the blob
            x = 32 + 6 * k
            gt_native[t, y - 10:y, x:x + 2] = 1
    # model-res prediction: the GT seen at 32x32 (what a model could emit)
    pred_model = np.stack([
        np.asarray(Image.fromarray(gt_native[t].astype(np.uint8)).resize(
            (Wm, Hm), Image.NEAREST)) for t in range(T)]).astype(np.int32)

    up = upsample_labels(pred_model, (Hn, Wn))
    assert up.shape == (T, Hn, Wn)
    r_native = evaluate_sequence(gt_native, up)
    # legacy shortcut: GT downsampled to model res
    gt_model = np.stack([
        np.asarray(Image.fromarray(gt_native[t].astype(np.uint8)).resize(
            (Wm, Hm), Image.NEAREST)) for t in range(T)]).astype(np.int32)
    r_model = evaluate_sequence(gt_model, pred_model)
    # the two protocols must measurably differ on fine structure, and the
    # model-res shortcut overstates quality (it hides the lost spikes)
    assert abs(r_native["J&F"] - r_model["J&F"]) > 0.02, (
        r_native["J&F"], r_model["J&F"])
    assert r_model["J&F"] > r_native["J&F"]
