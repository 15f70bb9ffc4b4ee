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

from dmm_net_tpu.data.davis import _resize_image


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
        from dmm_net_tpu.data import native_loader
        return native_loader.load_rgb_batch([path], self.image_size)[0]

    def load_annotation(self, path: str) -> np.ndarray:
        from dmm_net_tpu.data import native_loader
        return native_loader.load_label_batch([path], self.image_size)[0]

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
                pm, pv = self._proposals(vid, stems[t], gt)
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

    def _proposals(self, vid: str, stem: str, gt_labels):
        """Cached proposals for the RAW frame named `stem` (the cache key
        tools/extract_proposals.py writes). YT-VOS raw-frame stems and
        annotated-timeline indices diverge (every ~5th frame annotated),
        so all lookups go by stem — never by a loop index."""
        N = self.max_proposals
        H, W = self.image_size
        masks = np.zeros((N, H, W), np.float32)
        valid = np.zeros((N,), bool)
        if self.proposal_dir is not None:
            pf = os.path.join(self.proposal_dir, vid, f"{stem}.json")
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
                zlib.crc32(f"{vid}/{stem}".encode()) % (2 ** 31))
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


    # ------------------------------------------------------------------
    def clip_batches(self, batch_size: int, clip_length: int,
                     seed: int = 0, max_objects: Optional[int] = None
                     ) -> Iterator[Dict[str, np.ndarray]]:
        """Random training clips (SURVEY.md §1.6: train on YouTube-VOS).

        YT-VOS specifics vs the DAVIS sampler:
          * the clip timeline is the video's ANNOTATED frames (every ~5th
            raw frame) — the reference's training recipe supervises only
            annotated frames;
          * objects may appear mid-clip: each object's template mask comes
            from its own first annotated frame inside the clip, exported
            as `live_from` (B, M) clip indices (the training analog of the
            engine's live_from gating), and `gt_valid` (B, T, M) masks the
            loss to frames where the object is live.
        Yields the train/loop.py batch layout + live_from + gt_valid.
        """
        rng = np.random.RandomState(seed)
        M = max_objects or self.max_objects
        H, W = self.image_size
        # only videos with at least one annotated frame can train
        vids = [v for v in self.videos if self.annotation_paths(v)]
        if not vids:
            raise ValueError(f"no annotated videos under {self.root}/"
                             f"{self.split}")
        while True:
            batch = {"frames": [], "prop_masks": [], "prop_valid": [],
                     "gt_masks": [], "tmpl_masks": [], "tmpl_valid": [],
                     "live_from": [], "gt_valid": []}
            for _ in range(batch_size):
                vid = vids[rng.randint(len(vids))]
                anns = self.annotation_paths(vid)
                stems = sorted(anns)
                frame_by_stem = {
                    os.path.splitext(os.path.basename(p))[0]: p
                    for p in self.frame_paths(vid)}
                stems = [s for s in stems if s in frame_by_stem]
                t0 = rng.randint(0, max(len(stems) - clip_length + 1, 1))
                ts = stems[t0:t0 + clip_length]
                ts = ts + [ts[-1]] * (clip_length - len(ts))  # pad short

                gts, frames, pms, pvs = [], [], [], []
                for t, stem in enumerate(ts):
                    frames.append(self.load_frame(frame_by_stem[stem]))
                    gts.append(self.load_annotation(anns[stem]))
                    pm, pv = self._proposals(vid, stem, gts[-1])
                    pms.append(pm)
                    pvs.append(pv)

                # objects present in the clip, templated at their first
                # annotated clip frame
                tm = np.zeros((M, H, W), np.float32)
                tv = np.zeros((M,), bool)
                live = np.zeros((M,), np.int32)
                gt_m = np.zeros((clip_length, M, H, W), np.float32)
                gt_v = np.zeros((clip_length, M), bool)
                slot = 0
                seen: Dict[int, int] = {}
                for t, gt in enumerate(gts):
                    for oid in sorted(set(np.unique(gt)) - {0}):
                        if oid not in seen and slot < M:
                            seen[oid] = slot
                            tm[slot] = (gt == oid)
                            tv[slot] = True
                            live[slot] = t
                            slot += 1
                        if oid in seen:
                            i = seen[oid]
                            gt_m[t, i] = (gt == oid)
                # every clip frame is annotated by construction, so a live
                # object is supervised at every t >= live_from — including
                # occlusion frames, where its (empty) GT teaches "absent"
                for i in range(slot):
                    gt_v[:, i] = np.arange(clip_length) >= live[i]

                batch["frames"].append(np.stack(frames))
                batch["prop_masks"].append(np.stack(pms))
                batch["prop_valid"].append(np.stack(pvs))
                batch["gt_masks"].append(gt_m)
                batch["tmpl_masks"].append(tm)
                batch["tmpl_valid"].append(tv)
                batch["live_from"].append(live)
                batch["gt_valid"].append(gt_v)
            yield {k: np.stack(v) for k, v in batch.items()}


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
