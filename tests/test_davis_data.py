"""DAVIS reader integration test on a synthetic on-disk DAVIS tree, plus
proposal-cache reading through the RLE codec."""

import json
import os

import numpy as np
import pytest
from PIL import Image

from dmm_net_tpu.data.davis import DavisDataset
from dmm_net_tpu.ops import rle as rle_codec


@pytest.fixture()
def davis_tree(tmp_path):
    root = str(tmp_path / "DAVIS")
    seqs = ["bear", "bike"]
    H0, W0 = 60, 100
    for seq in seqs:
        os.makedirs(os.path.join(root, "JPEGImages", "480p", seq))
        os.makedirs(os.path.join(root, "Annotations", "480p", seq))
        for t in range(4):
            rng = np.random.RandomState(hash(seq) % 1000 + t)
            img = (rng.rand(H0, W0, 3) * 255).astype(np.uint8)
            Image.fromarray(img).save(
                os.path.join(root, "JPEGImages", "480p", seq, f"{t:05d}.jpg"))
            ann = np.zeros((H0, W0), np.uint8)
            ann[10 + t:30 + t, 20:50] = 1
            if seq == "bike":
                ann[35:55, 60 + t:90 + t] = 2
            pim = Image.fromarray(ann)  # L-mode: exact values survive
            pim.save(
                os.path.join(root, "Annotations", "480p", seq, f"{t:05d}.png"))
    os.makedirs(os.path.join(root, "ImageSets", "2017"))
    with open(os.path.join(root, "ImageSets", "2017", "val.txt"), "w") as f:
        f.write("\n".join(seqs) + "\n")
    return root, (H0, W0)


def test_sequences_and_stream(davis_tree):
    root, _ = davis_tree
    ds = DavisDataset(root, split="val", image_size=(64, 96),
                      max_objects=4, max_proposals=8)
    assert ds.sequences == ["bear", "bike"]
    sd = ds.sequence_stream("bike")
    assert sd["object_ids"] == [1, 2]
    assert sd["tmpl_masks"].shape == (1, 4, 64, 96)
    items = list(sd["frames"])
    assert len(items) == 4
    assert items[0]["frame"].shape == (1, 64, 96, 3)
    assert items[0]["prop_valid"].any()
    # GT-synthesized proposals include the true objects
    pm = items[0]["prop_masks"][0]
    tm = np.asarray(sd["tmpl_masks"][0, 0] > 0.5)
    ious = [((pm[i] > 0.5) & tm).sum() / max(((pm[i] > 0.5) | tm).sum(), 1)
            for i in range(8)]
    assert max(ious) > 0.9


def test_clip_batches_layout(davis_tree):
    root, _ = davis_tree
    ds = DavisDataset(root, split="val", image_size=(64, 96),
                      max_objects=4, max_proposals=8)
    b = next(ds.clip_batches(batch_size=2, clip_length=3))
    assert b["frames"].shape == (2, 3, 64, 96, 3)
    assert b["prop_masks"].shape == (2, 3, 8, 64, 96)
    assert b["gt_masks"].shape == (2, 3, 4, 64, 96)
    assert b["tmpl_valid"].dtype == bool


def test_proposal_cache_preferred(davis_tree, tmp_path):
    root, (H0, W0) = davis_tree
    pdir = str(tmp_path / "props")
    seq = "bear"
    os.makedirs(os.path.join(pdir, seq))
    mask = np.zeros((64, 96), np.uint8)
    mask[5:25, 5:35] = 1
    d = rle_codec.encode(mask)
    props = [{"score": 0.9, "rle": {"size": d["size"],
                                    "counts": d["counts"].decode("latin1")}}]
    for t in range(4):
        with open(os.path.join(pdir, seq, f"{t:05d}.json"), "w") as f:
            json.dump(props, f)
    ds = DavisDataset(root, split="val", image_size=(64, 96),
                      proposal_dir=pdir, max_objects=4, max_proposals=8)
    pm, pv = ds.load_proposals(seq, 0)
    assert pv[0] and not pv[1]
    got = pm[0] > 0.5
    np.testing.assert_array_equal(got, mask.astype(bool))


def test_engine_write_png_preserves_indices(tmp_path):
    """Regression: PIL fromarray(mode='P') corrupts label values on save;
    the engine writer must round-trip indices exactly."""
    from dmm_net_tpu.infer.engine import InferenceEngine

    lab = np.zeros((16, 24), np.int32)
    lab[0, :] = 1
    lab[1, :] = 2
    lab[2, :] = 3
    lab[3, :] = 15
    path = str(tmp_path / "seq" / "00000.png")
    InferenceEngine.write_png(lab, path)
    back = np.asarray(Image.open(path))
    np.testing.assert_array_equal(back, lab.astype(np.uint8))
    # and it actually carries the DAVIS palette
    im = Image.open(path)
    assert im.mode == "P" and im.getpalette() is not None
