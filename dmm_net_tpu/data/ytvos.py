"""YouTube-VOS dataset reader + submission writer (SURVEY.md §3.1 #3, #14).

Layout (standard YouTube-VOS 2018/2019 release):
    <root>/<split>/JPEGImages/<video_id>/00000.jpg ...
    <root>/<split>/Annotations/<video_id>/00000.png ...
    <root>/<split>/meta.json:
        {"videos": {vid: {"objects": {oid: {"frames": [...]} } } }}

YouTube-VOS specifics vs DAVIS (SURVEY.md §1 config #4):
  * objects appear mid-sequence — each object's template comes from its own
    first annotated frame, not frame 0;
  * only every 5th frame is annotated; inference runs on all frames,
    scoring uses the annotated subset;
  * the eval server consumes palette PNGs per annotated frame; the
    submission writer below produces exactly that tree (plus optional RLE
    json for compactness).

Clip sampling for training mirrors the DAVIS reader (batch layout of
train/loop.py).
"""

from __future__ import annotations

import json
import os
import zlib
from typing import Dict, Iterator, List, Optional, Tuple

import numpy as np

from dmm_net_tpu.data.davis import _imread, _resize_image


class YTVOSDataset:
    def __init__(self, root: str, split: str = "valid",
                 image_size: Tuple[int, int] = (256, 448),
                 proposal_dir: Optional[str] = None,
                 max_objects: int = 16, max_proposals: int = 128):
        self.root = root
        self.split = split
        self.image_size = image_size
        self.proposal_dir = proposal_dir
        self.max_objects = max_objects
        self.max_proposals = max_proposals
        meta_path = os.path.join(root, split, "meta.json")
        if os.path.exists(meta_path):
            with open(meta_path) as f:
                self.meta = json.load(f)["videos"]
        else:
            img_root = os.path.join(root, split, "JPEGImages")
            self.meta = {v: {"objects": {}} for v in
                         (sorted(os.listdir(img_root))
                          if os.path.isdir(img_root) else [])}
        self.videos = sorted(self.meta)

    # ------------------------------------------------------------------
    def frame_paths(self, vid: str) -> List[str]:
        d = os.path.join(self.root, self.split, "JPEGImages", vid)
        return [os.path.join(d, f) for f in sorted(os.listdir(d))
                if f.endswith((".jpg", ".png"))]

    def annotation_paths(self, vid: str) -> Dict[str, str]:
        d = os.path.join(self.root, self.split, "Annotations", vid)
        if not os.path.isdir(d):
            return {}
        return {os.path.splitext(f)[0]: os.path.join(d, f)
                for f in sorted(os.listdir(d)) if f.endswith(".png")}

    def load_frame(self, path: str) -> np.ndarray:
        return _resize_image(_imread(path), self.image_size).astype(np.uint8)

    def load_annotation(self, path: str) -> np.ndarray:
        ann = _imread(path)
        if ann.ndim == 3:
            ann = ann[..., 0]
        return _resize_image(ann, self.image_size, nearest=True)

    # ------------------------------------------------------------------
    def object_first_frames(self, vid: str) -> Dict[int, str]:
        """Map object id -> stem of its first annotated frame."""
        info = self.meta.get(vid, {}).get("objects", {})
        out = {}
        if info:
            for oid, od in info.items():
                frames = od.get("frames", [])
                if frames:
                    out[int(oid)] = frames[0]
        else:
            anns = self.annotation_paths(vid)
            seen = set()
            for stem, path in anns.items():
                ann = self.load_annotation(path)
                for oid in set(np.unique(ann)) - {0}:
                    if oid not in seen:
                        seen.add(oid)
                        out[int(oid)] = stem
        return out

    def sequence_stream(self, vid: str) -> Dict:
        """Streaming inputs for the inference engine. Objects appearing
        mid-video: their template slots activate at the first annotated
        frame (tmpl_live (T, M) mask tells the engine when each slot is
        live; slots are zero-templated before that)."""
        frames = self.frame_paths(vid)
        stems = [os.path.splitext(os.path.basename(f))[0] for f in frames]
        anns = self.annotation_paths(vid)
        first = self.object_first_frames(vid)
        oids = sorted(first)[: self.max_objects]
        M = self.max_objects
        H, W = self.image_size

        tmpl = np.zeros((M, H, W), np.float32)
        tv = np.zeros((M,), bool)
        live_from = np.full((M,), len(frames), np.int64)
        tmpl_frames = np.zeros((M, H, W, 3), np.uint8)
        for i, oid in enumerate(oids):
            stem = first[oid]
            if stem in anns:
                ann = self.load_annotation(anns[stem])
                tmpl[i] = (ann == oid)
                tv[i] = True
                t_idx = stems.index(stem) if stem in stems else 0
                live_from[i] = t_idx
                # each object's template features come from ITS first frame
                tmpl_frames[i] = self.load_frame(frames[t_idx])

        def gen() -> Iterator[Dict[str, np.ndarray]]:
            for t, fp in enumerate(frames):
                img = self.load_frame(fp)
                gt = (self.load_annotation(anns[stems[t]])
                      if stems[t] in anns else None)
                pm, pv = self._proposals(vid, t, gt)
                yield {"frame": img[None], "prop_masks": pm[None],
                       "prop_valid": pv[None]}

        return {"name": vid, "frames": gen(), "tmpl_masks": tmpl[None],
                "tmpl_valid": tv[None], "object_ids": oids,
                "live_from": live_from[None],
                "tmpl_frames": tmpl_frames[None],
                "first_frame": self.load_frame(frames[0])[None],
                "frame_stems": stems,
                "annotated_stems": sorted(anns),
                "num_frames": len(frames)}

    def _proposals(self, vid: str, t: int, gt_labels):
        N = self.max_proposals
        H, W = self.image_size
        masks = np.zeros((N, H, W), np.float32)
        valid = np.zeros((N,), bool)
        if self.proposal_dir is not None:
            pf = os.path.join(self.proposal_dir, vid, f"{t:05d}.json")
            if os.path.exists(pf):
                from dmm_net_tpu.ops import rle as rle_codec
                with open(pf) as f:
                    props = json.load(f)
                props = sorted(props, key=lambda p: -p.get("score", 0.0))[:N]
                for i, p in enumerate(props):
                    m = rle_codec.decode(p["rle"]).astype(np.uint8) * 255
                    masks[i] = _resize_image(m, self.image_size,
                                             nearest=True) > 127
                    valid[i] = True
                return masks, valid
        if gt_labels is not None:
            rng = np.random.RandomState(
                (zlib.crc32(vid.encode()) + t) % (2 ** 31))
            i = 0
            for oid in sorted(set(np.unique(gt_labels)) - {0}):
                if i >= N:
                    break
                masks[i] = (gt_labels == oid)
                valid[i] = True
                i += 1
            for _ in range(min(N - i, i * 2)):
                src = masks[rng.randint(max(i, 1))]
                dy, dx = rng.randint(-10, 11, 2)
                masks[i] = np.roll(np.roll(src, dy, 0), dx, 1)
                valid[i] = True
                i += 1
        return masks, valid


def write_submission(out_dir: str, vid: str, stems: List[str],
                     labels: np.ndarray, object_ids: List[int],
                     full_size: Optional[Tuple[int, int]] = None) -> None:
    """Write YouTube-VOS server-format palette PNGs.

    labels (T, H, W) int in [0, M]; slot i maps back to original object id
    object_ids[i]. Only the frames named in `stems` are written (the
    annotated subset). full_size restores the original resolution."""
    from dmm_net_tpu.infer.engine import InferenceEngine

    remap = np.zeros(labels.max() + 1 if labels.size else 1, np.uint8)
    for i, oid in enumerate(object_ids):
        if i + 1 < len(remap):
            remap[i + 1] = oid
    for t, stem in enumerate(stems):
        lab = labels[t]
        if full_size is not None and lab.shape != tuple(full_size):
            from PIL import Image
            lab = np.asarray(Image.fromarray(lab.astype(np.uint8)).resize(
                (full_size[1], full_size[0]), Image.NEAREST))
        lab = remap[lab]
        InferenceEngine.write_png(
            lab, os.path.join(out_dir, "Annotations", vid, f"{stem}.png"))
