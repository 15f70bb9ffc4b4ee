"""YT-VOS cached-proposal indexing (VERDICT r2 weak #1 / next #3).

The proposal cache written by tools/extract_proposals.py is keyed by frame
STEM (for DAVIS the stem equals the raw index, so both conventions agree
there; on YT-VOS only every ~5th frame is annotated, so the annotated-
timeline index and the raw-frame stem diverge). Both YTVOSDataset paths —
sequence_stream (raw timeline) and clip_batches (annotated timeline) —
must resolve the SAME cache file for a given frame: the one named by its
stem. Before the fix, clip_batches looked up `t0 + t` on the annotated
timeline and silently loaded the wrong frames' proposals (or none).
"""

import json
import os

import numpy as np
import pytest
from PIL import Image

from dmm_net_tpu.data.ytvos import YTVOSDataset
from dmm_net_tpu.ops import rle as rle_codec

H0, W0 = 40, 64


def _fake_ytvos_with_cache(tmp_path, n_frames=11, ann_every=5):
    """YT-VOS-layout tree (raw frames 00000..000NN, annotations every 5th)
    plus a stem-keyed proposal cache whose mask for raw frame k is a
    horizontal marker bar at row k — so the test can tell exactly which
    cached frame a loaded proposal came from."""
    root = str(tmp_path / "YTVOS")
    vid = "v001"
    os.makedirs(os.path.join(root, "train", "JPEGImages", vid))
    os.makedirs(os.path.join(root, "train", "Annotations", vid))
    stems = [f"{t:05d}" for t in range(n_frames)]
    ann_stems = stems[::ann_every]
    for t, stem in enumerate(stems):
        rng = np.random.RandomState(t)
        Image.fromarray((rng.rand(H0, W0, 3) * 255).astype(np.uint8)).save(
            os.path.join(root, "train", "JPEGImages", vid, f"{stem}.jpg"))
    for stem in ann_stems:
        ann = np.zeros((H0, W0), np.uint8)
        ann[10:30, 20:50] = 1
        Image.fromarray(ann).save(
            os.path.join(root, "train", "Annotations", vid, f"{stem}.png"))
    meta = {"videos": {vid: {"objects": {"1": {"frames": ann_stems}}}}}
    with open(os.path.join(root, "train", "meta.json"), "w") as f:
        json.dump(meta, f)

    cache = str(tmp_path / "proposals")
    os.makedirs(os.path.join(cache, vid))
    for t, stem in enumerate(stems):
        m = np.zeros((H0, W0), np.uint8)
        m[t, :] = 1                       # marker row = raw frame index
        r = rle_codec.encode(m > 0)
        props = [{"bbox": [0, t, W0, t + 1], "score": 0.9,
                  "rle": {"size": [int(x) for x in r["size"]],
                          "counts": r["counts"].decode("latin1")}}]
        with open(os.path.join(cache, vid, f"{stem}.json"), "w") as f:
            json.dump(props, f)
    return root, vid, cache, stems, ann_stems


def _marker_row(mask):
    """Row index of the marker bar in a loaded proposal mask (or -1)."""
    rows = np.where(mask.sum(axis=1) > mask.shape[1] * 0.5)[0]
    return int(rows[0]) if len(rows) else -1


def test_sequence_stream_loads_stem_keyed_cache(tmp_path):
    root, vid, cache, stems, _ = _fake_ytvos_with_cache(tmp_path)
    ds = YTVOSDataset(root, split="train", image_size=(H0, W0),
                      proposal_dir=cache, max_objects=4, max_proposals=4)
    sd = ds.sequence_stream(vid)
    for t, item in enumerate(sd["frames"]):
        pm, pv = item["prop_masks"][0], item["prop_valid"][0]
        assert pv[0] and not pv[1:].any(), \
            f"frame {t}: expected exactly the 1 cached proposal"
        assert _marker_row(pm[0]) == t, \
            f"frame {t}: got cache entry for frame {_marker_row(pm[0])}"


def test_clip_batches_load_cache_for_annotated_stems(tmp_path):
    """THE bug: clips sample the ANNOTATED timeline (stems 00000, 00005,
    00010 here); their proposals must come from those raw frames' cache
    entries, not from annotated-index-keyed files."""
    root, vid, cache, stems, ann_stems = _fake_ytvos_with_cache(tmp_path)
    ds = YTVOSDataset(root, split="train", image_size=(H0, W0),
                      proposal_dir=cache, max_objects=4, max_proposals=4)
    clip_length = len(ann_stems)          # every clip covers all 3 stems
    batch = next(ds.clip_batches(batch_size=2, clip_length=clip_length,
                                 seed=0))
    pm = batch["prop_masks"]              # (B, T, N, H, W)
    pv = batch["prop_valid"]              # (B, T, N)
    expected_rows = [int(s) for s in ann_stems]
    for b in range(pm.shape[0]):
        for t in range(clip_length):
            assert pv[b, t, 0] and not pv[b, t, 1:].any(), \
                f"clip frame {t}: cache entry not found/loaded"
            got = _marker_row(pm[b, t, 0])
            assert got == expected_rows[t], \
                (f"clip frame {t} (stem {ann_stems[t]}): loaded cache for "
                 f"raw frame {got}, want {expected_rows[t]}")
