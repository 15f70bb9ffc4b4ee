"""Seen/unseen YouTube-VOS scoring, end to end from a category-labeled
meta.json fixture (VERDICT r3 next #8; SURVEY.md §3.1 #14).

Pipeline under test: label maps -> write_submission (server-format palette
PNG tree) -> read the submission back as predictions -> evaluate_video ->
seen_split_from_meta + summarize -> overall/seen/unseen G.
"""

import json
import os

import numpy as np
from PIL import Image

from dmm_net_tpu.data.ytvos import write_submission
from dmm_net_tpu.eval.ytvos_local import (evaluate_video,
                                          seen_split_from_meta, summarize)

H, W = 48, 64


def _square(y, x, s=12):
    m = np.zeros((H, W), np.uint8)
    m[y:y + s, x:x + s] = 1
    return m


def _meta():
    # v_a: object 1 = person (seen), object 2 = unicycle (unseen);
    # v_b: object 1 = dog (seen)
    return {
        "v_a": {"objects": {
            "1": {"category": "person", "frames": ["00000", "00005",
                                                   "00010"]},
            "2": {"category": "unicycle", "frames": ["00005", "00010"]},
        }},
        "v_b": {"objects": {
            "1": {"category": "dog", "frames": ["00000", "00005",
                                                "00010"]},
        }},
    }


def test_seen_split_from_meta():
    split = seen_split_from_meta(_meta(), ["person", "dog"])
    assert split == {"v_a": [1], "v_b": [1]}


def test_submission_to_seen_unseen_g(tmp_path):
    meta = _meta()
    stems = ["00000", "00005", "00010"]

    # GT: v_a object 1 static square, object 2 appears at 00005;
    # v_b object 1 moves 2px per annotated frame
    gt = {
        "v_a": {"00000": _square(4, 4) * 1,
                "00005": _square(4, 4) * 1 + _square(28, 40) * 2,
                "00010": _square(4, 4) * 1 + _square(28, 42) * 2},
        "v_b": {s: _square(10, 10 + 2 * i) * 1
                for i, s in enumerate(stems)},
    }
    # predictions: v_a object 1 perfect, object 2 shifted by 6px (partial
    # IoU); v_b perfect -> seen G should be 1.0, unseen G in (0, 1)
    pred_labels = {
        "v_a": np.stack([
            _square(4, 4) * 1,
            _square(4, 4) * 1 + _square(28, 46) * 2,
            _square(4, 4) * 1 + _square(28, 48) * 2]),
        "v_b": np.stack([gt["v_b"][s] for s in stems]),
    }

    out = str(tmp_path / "submission")
    for vid in ("v_a", "v_b"):
        write_submission(out, vid, stems, pred_labels[vid],
                         object_ids=[1, 2] if vid == "v_a" else [1])

    # read the submission tree back — the server-side view
    per_video = {}
    for vid in ("v_a", "v_b"):
        preds = {}
        for s in stems:
            p = os.path.join(out, "Annotations", vid, f"{s}.png")
            assert os.path.exists(p), p
            preds[s] = np.asarray(Image.open(p))
        first = {int(o): od["frames"][0]
                 for o, od in meta[vid]["objects"].items()}
        per_video[vid] = evaluate_video(gt[vid], preds, first)

    split = seen_split_from_meta(meta, ["person", "dog"])
    summary = summarize(per_video, seen_categories=split)

    assert summary["seen"]["G"] > 0.99          # both seen objects perfect
    assert 0.0 < summary["unseen"]["G"] < 0.9   # shifted unicycle
    # overall mixes all three objects
    lo, hi = summary["unseen"]["G"], summary["seen"]["G"]
    assert lo < summary["overall"]["G"] < hi
