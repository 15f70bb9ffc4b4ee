"""Proposal-subsystem round trip (SURVEY.md §4.3; VERDICT r1 #5):
train_proposal.py --save -> tools/extract_proposals.py --params ->
RLE cache on disk -> DavisDataset.load_proposals -> infer.py -> J&F,
all on a synthetic DAVIS-layout fixture tree.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from tests.test_cli import TINY, _fake_davis, _run

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_train_proposal_detection_data_with_ap_eval(tmp_path):
    """The COCO-like synthetic data path + held-out AP report run end to
    end (VERDICT r1 missing #4: detection-metric evidence for the
    proposal subsystem)."""
    r = _run(["train_proposal.py", "--steps", "4", "--image-size", "64",
              "64", "--backbone", "resnet18", "--data", "detection",
              "--num-classes", "4", "--distinct-frames", "4",
              "--eval-images", "2", "--logdir", str(tmp_path / "plog")])
    assert r.returncode == 0, r.stderr[-3000:]
    assert "held-out box AP" in r.stderr or "held-out box AP" in r.stdout
    assert "held-out mask AP" in r.stderr or "held-out mask AP" in r.stdout


@pytest.mark.slow
def test_proposal_loop_end_to_end(tmp_path):
    root = _fake_davis(tmp_path, n_seq=1, T=3)
    ckpt = str(tmp_path / "mrcnn.msgpack")
    cache = str(tmp_path / "proposals")
    out = str(tmp_path / "results")

    # 1. train the proposal net briefly and save its variables
    r = _run(["train_proposal.py", "--steps", "5", "--image-size", "64", "96",
              "--backbone", "resnet18", "--logdir", str(tmp_path / "plog"),
              "--save", ckpt])
    assert r.returncode == 0, r.stderr[-3000:]
    assert os.path.exists(ckpt)

    # 2. extract proposals over the fixture tree with the trained weights
    r = _run(["tools/extract_proposals.py", "--dataset", "davis",
              "--root", root, "--out", cache, "--params", ckpt,
              "--image-size", "64", "96", "--backbone", "resnet18",
              "--num-classes", "3", "--max-detections", "8",
              "--score-thresh", "0.0"])
    assert r.returncode == 0, r.stderr[-3000:]

    # 3. the cache is valid reader input: every frame has a json whose RLE
    # decodes to the extraction resolution
    from dmm_net_tpu.data.davis import DavisDataset
    from dmm_net_tpu.ops import rle as rle_codec
    for t in range(3):
        pf = os.path.join(cache, "seq0", f"{t:05d}.json")
        assert os.path.exists(pf), os.listdir(os.path.join(cache, "seq0"))
        with open(pf) as f:
            props = json.load(f)
        for p in props:
            m = rle_codec.decode({"size": p["rle"]["size"],
                                  "counts": p["rle"]["counts"].encode(
                                      "latin1")})
            assert m.shape == (64, 96)

    ds = DavisDataset(root, split="val", image_size=(64, 96),
                      proposal_dir=cache, max_objects=4, max_proposals=8)
    pm, pv = ds.load_proposals("seq0", 0)
    assert pm.shape == (8, 64, 96)
    # an untrained-ish net may emit zero detections on some frames; the
    # reader must stay well-formed either way
    assert pv.dtype == bool

    # 4. inference consumes the cache end-to-end and scores J&F
    r = _run(["infer.py", "--preset", "p3_multi_object", "--davis-root", root,
              "--proposal-dir", cache, "--out", out, "--set"] + TINY)
    assert r.returncode == 0, r.stderr[-3000:]
    with open(os.path.join(out, "results.json")) as f:
        summary = json.load(f)
    assert "seq0" in summary["sequences"]
    assert np.isfinite(summary["J&F"])
    assert 0.0 <= summary["J&F"] <= 1.0
