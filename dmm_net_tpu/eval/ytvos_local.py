"""Local YouTube-VOS scoring (SURVEY.md §3.1 #14).

The official metric is served by the evaluation server (our submission
writer produces its input); this local scorer reproduces the protocol for
*annotated* validation data you hold GT for — e.g. held-out train videos:

  per video, per object: J and F on annotated frames AFTER the object's
  first annotated frame (the template frame itself is excluded);
  overall G = mean over objects of (mean J + mean F) / 2.

Seen/unseen category splits require category labels (meta.json of the
full release); when absent, everything is scored as one group.
"""

from __future__ import annotations

from typing import Dict, List, Mapping, Optional, Sequence

import numpy as np

from dmm_net_tpu.eval.davis_jf import db_eval_boundary, db_eval_iou


def evaluate_video(gt_by_stem: Mapping[str, np.ndarray],
                   pred_by_stem: Mapping[str, np.ndarray],
                   object_first_stem: Mapping[int, str]) -> Dict:
    """gt/pred: stem -> (H, W) integer label maps. object_first_stem: the
    first annotated stem per object id (that frame is excluded)."""
    stems = sorted(set(gt_by_stem) & set(pred_by_stem))
    out = {}
    for oid, first in object_first_stem.items():
        js, fs = [], []
        for stem in stems:
            if stem <= first:
                continue
            g = gt_by_stem[stem] == oid
            p = pred_by_stem[stem] == oid
            js.append(db_eval_iou(g, p))
            fs.append(db_eval_boundary(g, p))
        if js:
            out[oid] = {"J": float(np.mean(js)), "F": float(np.mean(fs))}
    return out


def seen_split_from_meta(meta_videos: Mapping[str, Dict],
                         seen_category_names: Sequence[str]
                         ) -> Dict[str, List[int]]:
    """Category-labeled meta.json -> summarize()'s seen-split mapping.

    meta_videos: the "videos" dict of a full-release meta.json, where each
    object carries its category name:
        {vid: {"objects": {"1": {"category": "person", "frames": [...]}}}}
    seen_category_names: the categories present in the TRAIN split (the
    official seen/unseen definition — unseen categories never appear in
    training). Returns {video: [object ids whose category is seen]}.
    """
    seen = set(seen_category_names)
    out: Dict[str, List[int]] = {}
    for vid, vd in meta_videos.items():
        out[vid] = [int(oid) for oid, od in vd.get("objects", {}).items()
                    if od.get("category") in seen]
    return out


def summarize(per_video: Mapping[str, Dict],
              seen_categories: Optional[Mapping[str, Sequence[int]]] = None
              ) -> Dict:
    """per_video: video -> {oid: {J, F}}. Returns overall G (+ seen/unseen
    splits when category info is provided as video -> seen object ids)."""
    def agg(items: List[Dict]) -> Dict:
        if not items:
            return {"J": None, "F": None, "G": None}
        J = float(np.mean([x["J"] for x in items]))
        F = float(np.mean([x["F"] for x in items]))
        return {"J": J, "F": F, "G": (J + F) / 2}

    all_items, seen_items, unseen_items = [], [], []
    for vid, objs in per_video.items():
        seen_ids = set(seen_categories.get(vid, [])) if seen_categories else None
        for oid, scores in objs.items():
            all_items.append(scores)
            if seen_ids is not None:
                (seen_items if oid in seen_ids else unseen_items).append(scores)
    out = {"overall": agg(all_items)}
    if seen_categories is not None:
        out["seen"] = agg(seen_items)
        out["unseen"] = agg(unseen_items)
    return out
