"""Day-one CLI drill (VERDICT r2 next #1, #2).

Proves the exact command sequence real-data day one will run, using the
ACTUAL shipped flagship artifacts:

    tools/extract_proposals.py --params runs/proposal_video448/mrcnn.msgpack
    infer.py --ckpt runs/dmm448/dmm.msgpack --proposal-dir ...

over a synthetic DAVIS-layout tree written at native 854x480 (the model
runs at its checkpoint-pinned 256x448; scoring upsamples predictions to
native resolution per the official protocol). Also asserts the production
chunked dispatch and the per-frame path agree on DAVIS CLI output.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest
from PIL import Image

from tests.test_cli import TINY, _fake_davis, _run

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DMM_CKPT = os.path.join(REPO, "runs", "dmm448", "dmm.msgpack")
MRCNN_CKPT = os.path.join(REPO, "runs", "proposal_video448", "mrcnn.msgpack")

NATIVE_H, NATIVE_W = 480, 854


def _synthetic_davis_tree(tmp_path, T=4, seeds=(7001,)):
    """DAVIS-2017-layout tree at native 854x480 rendered from the synthetic
    video generator (held-out seeds; training pools used seeds <64 and
    >=10000)."""
    from dmm_net_tpu.data.synthetic import synthetic_sequence
    root = str(tmp_path / "DAVIS")
    names = []
    for i, seed in enumerate(seeds):
        seq = f"seq{i}"
        names.append(seq)
        s = synthetic_sequence(seed=seed, T=T, H=NATIVE_H, W=NATIVE_W,
                               num_objects=2, num_proposals=4)
        jdir = os.path.join(root, "JPEGImages", "480p", seq)
        adir = os.path.join(root, "Annotations", "480p", seq)
        os.makedirs(jdir)
        os.makedirs(adir)
        for t in range(T):
            img = (s["frames"][t] * 255).astype(np.uint8)
            Image.fromarray(img).save(os.path.join(jdir, f"{t:05d}.jpg"),
                                      quality=95)
            lab = np.zeros((NATIVE_H, NATIVE_W), np.uint8)
            for m in range(s["gt_masks"].shape[1]):
                lab[s["gt_masks"][t, m] > 0.5] = m + 1
            Image.fromarray(lab).save(os.path.join(adir, f"{t:05d}.png"))
    os.makedirs(os.path.join(root, "ImageSets", "2017"))
    for split in ("train", "val"):
        with open(os.path.join(root, "ImageSets", "2017",
                               f"{split}.txt"), "w") as f:
            f.write("\n".join(names) + "\n")
    return root


@pytest.mark.slow
def test_dayone_flagship_artifacts_to_native_jf(tmp_path):
    """Flagship weights -> one command -> native-resolution J&F."""
    if not (os.path.exists(DMM_CKPT) and os.path.exists(MRCNN_CKPT)):
        # runs/ is gitignored; fresh clones must regenerate the weights.
        # REQUIRE_ARTIFACTS=1 (the regen/driver invocation) restores the
        # hard failure so a broken artifact pipeline can't read as a
        # green (skipped) suite (ADVICE r3 #4).
        msg = ("shipped flagship artifacts missing — run "
               "tools/regen_artifacts.sh (~20 min on one v5e), "
               "then re-run this drill")
        if os.environ.get("REQUIRE_ARTIFACTS"):
            pytest.fail(msg)
        pytest.skip(msg)
    root = _synthetic_davis_tree(tmp_path, T=4)
    cache = str(tmp_path / "proposals")
    out = str(tmp_path / "results")

    # stage 0: offline proposal extraction with the shipped detector
    r = _run(["tools/extract_proposals.py", "--dataset", "davis",
              "--root", root, "--out", cache, "--params", MRCNN_CKPT,
              "--image-size", "256", "448", "--backbone", "resnet18",
              "--num-classes", "4", "--max-detections", "8",
              "--score-thresh", "0.05"], timeout=1200)
    assert r.returncode == 0, r.stderr[-3000:]
    assert os.path.exists(os.path.join(cache, "seq0", "00000.json"))

    # day-one command: model config comes from the msgpack blob itself
    r = _run(["infer.py", "--ckpt", DMM_CKPT, "--davis-root", root,
              "--proposal-dir", cache, "--out", out, "--chunk", "4"],
             timeout=1800)
    assert r.returncode == 0, r.stderr[-3000:]
    with open(os.path.join(out, "results.json")) as f:
        summary = json.load(f)
    assert summary["dispatch"] == "chunked_scan"
    assert summary["frames"] == 4
    # Measured on the r4 artifacts (detector-proposal-trained flagship +
    # input_norm fix): native J&F 0.950 on this tree (model-res 0.962;
    # clean-render full system 0.960 over 6 seqs). Gate = measured - 0.05
    # margin (VERDICT r3 weak #6: the old 0.8 gate would pass a
    # 0.97 -> 0.82 regression silently).
    assert summary["J&F"] > 0.90, summary
    # PNGs written at model resolution; scoring happened at native 480p
    png = np.asarray(Image.open(os.path.join(out, "seq0", "00000.png")))
    assert png.shape == (256, 448)


FALLBACK_CKPT = os.path.join(REPO, "artifacts", "dmm128_fallback.msgpack")


@pytest.mark.slow
def test_dayone_fallback_artifact_always_runs(tmp_path):
    """Git-TRACKED fallback drill (VERDICT r4 next #2): a fresh clone must
    never be able to silently skip every day-one drill. artifacts/
    dmm128_fallback.msgpack (R-18 @ 128x224, trained by
    tools/train_fallback_artifact.sh) is committed to the repo, so this
    test FAILS — it does not skip — when the artifact is missing.

    Planted-proposal variant of the flagship drill: DAVIS-layout tree at
    native 854x480, proposals planted from annotations (jittered + decoys,
    data/davis.py) — one infer.py command, scored at native resolution."""
    assert os.path.exists(FALLBACK_CKPT), (
        "tracked fallback artifact missing from the clone — it is "
        "committed to git; regenerate with tools/train_fallback_artifact.sh")
    root = _synthetic_davis_tree(tmp_path, T=4, seeds=(7003,))
    out = str(tmp_path / "results")
    r = _run(["infer.py", "--ckpt", FALLBACK_CKPT, "--davis-root", root,
              "--out", out, "--chunk", "4"], timeout=1800)
    assert r.returncode == 0, r.stderr[-3000:]
    with open(os.path.join(out, "results.json")) as f:
        summary = json.load(f)
    assert summary["dispatch"] == "chunked_scan"
    # Gate = save-time measured J&F minus 0.05 margin (the artifact's
    # README records the measurement; gate updated alongside the blob).
    assert summary["J&F"] > 0.85, summary


@pytest.mark.slow
def test_davis_cli_chunked_equals_per_frame(tmp_path):
    """The shipped DAVIS path (chunked scan — the benchmarked dispatch)
    and the per-frame loop produce the same masks and scores."""
    root = _fake_davis(tmp_path, n_seq=1, T=5)
    out_c = str(tmp_path / "res_chunked")
    out_f = str(tmp_path / "res_frame")
    common = ["infer.py", "--preset", "p3_multi_object",
              "--davis-root", root, "--set"] + TINY
    r = _run(common + ["--out", out_c, "--chunk", "3"])
    assert r.returncode == 0, r.stderr[-3000:]
    r = _run(common + ["--out", out_f, "--per-frame"])
    assert r.returncode == 0, r.stderr[-3000:]
    with open(os.path.join(out_c, "results.json")) as f:
        sc = json.load(f)
    with open(os.path.join(out_f, "results.json")) as f:
        sf = json.load(f)
    assert sc["dispatch"] == "chunked_scan" and sf["dispatch"] == "per_frame"
    assert abs(sc["J&F"] - sf["J&F"]) < 5e-3, (sc["J&F"], sf["J&F"])
    # per-pixel agreement of the written masks (scan vs per-frame jit may
    # fuse differently; labels must still agree essentially everywhere)
    for t in range(5):
        a = np.asarray(Image.open(os.path.join(out_c, "seq0", f"{t:05d}.png")))
        b = np.asarray(Image.open(os.path.join(out_f, "seq0", f"{t:05d}.png")))
        assert (a != b).mean() < 1e-3, f"frame {t}: masks diverge"
