"""CLI smoke tests: train.py and infer.py run end-to-end as subprocesses on
tiny configs (marked slow: each run pays a jit compile)."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest
from PIL import Image

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

TINY = ["model.backbone=resnet18", "model.backbone_dtype=float32",
        "model.feature_dim=16", "model.decoder_dim=8",
        "model.image_size=64,96",
        "matching.max_templates=4", "matching.max_proposals=8",
        "matching.sinkhorn_iters=5"]


def _run(args, timeout=540):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("XLA_FLAGS", None)
    return subprocess.run([sys.executable] + args, cwd=REPO, env=env,
                          capture_output=True, text=True, timeout=timeout)


def _fake_davis(tmp_path, n_seq=1, T=3, H0=60, W0=100):
    root = str(tmp_path / "DAVIS")
    names = [f"seq{i}" for i in range(n_seq)]
    for seq in names:
        os.makedirs(os.path.join(root, "JPEGImages", "480p", seq))
        os.makedirs(os.path.join(root, "Annotations", "480p", seq))
        for t in range(T):
            rng = np.random.RandomState(t)
            Image.fromarray((rng.rand(H0, W0, 3) * 255).astype(np.uint8)).save(
                os.path.join(root, "JPEGImages", "480p", seq, f"{t:05d}.jpg"))
            ann = np.zeros((H0, W0), np.uint8)
            ann[20 + t:40 + t, 30:60] = 1
            Image.fromarray(ann).save(
                os.path.join(root, "Annotations", "480p", seq, f"{t:05d}.png"))
    os.makedirs(os.path.join(root, "ImageSets", "2017"))
    for split in ("train", "val"):
        with open(os.path.join(root, "ImageSets", "2017",
                               f"{split}.txt"), "w") as f:
            f.write("\n".join(names) + "\n")
    return root


@pytest.mark.slow
def test_train_cli_synthetic(tmp_path):
    r = _run(["train.py", "--preset", "p5_train", "--steps", "3",
              "--logdir", str(tmp_path / "run"),
              "--set", "data.dataset=synthetic", "data.batch_size=1",
              "data.clip_length=2", "train.checkpoint_every=1000"] + TINY)
    assert r.returncode == 0, r.stderr[-3000:]
    # final checkpoint written
    assert os.path.isdir(tmp_path / "run" / "ckpt")


@pytest.mark.slow
def test_infer_cli_on_fake_davis(tmp_path):
    root = _fake_davis(tmp_path)
    out = str(tmp_path / "results")
    r = _run(["infer.py", "--preset", "p3_multi_object",
              "--davis-root", root, "--out", out,
              "--set"] + TINY)
    assert r.returncode == 0, r.stderr[-3000:]
    with open(os.path.join(out, "results.json")) as f:
        summary = json.load(f)
    assert "seq0" in summary["sequences"]
    assert summary["frames"] == 3
    assert 0.0 <= summary["J&F"] <= 1.0
    pngs = os.listdir(os.path.join(out, "seq0"))
    assert len(pngs) == 3


def _fake_ytvos(tmp_path, T=6, H0=60, W0=100):
    import json
    root = str(tmp_path / "YTVOS")
    vid = "v001"
    os.makedirs(os.path.join(root, "valid", "JPEGImages", vid))
    os.makedirs(os.path.join(root, "valid", "Annotations", vid))
    for t in range(T):
        rng = np.random.RandomState(t)
        Image.fromarray((rng.rand(H0, W0, 3) * 255).astype(np.uint8)).save(
            os.path.join(root, "valid", "JPEGImages", vid, f"{t:05d}.jpg"))
    ann = np.zeros((H0, W0), np.uint8)
    ann[10:30, 20:50] = 1
    Image.fromarray(ann).save(
        os.path.join(root, "valid", "Annotations", vid, "00000.png"))
    ann5 = np.zeros((H0, W0), np.uint8)
    ann5[15:35, 25:55] = 1
    Image.fromarray(ann5).save(
        os.path.join(root, "valid", "Annotations", vid, "00005.png"))
    meta = {"videos": {vid: {"objects": {
        "1": {"frames": ["00000", "00005"]}}}}}
    with open(os.path.join(root, "valid", "meta.json"), "w") as f:
        json.dump(meta, f)
    return root, vid


@pytest.mark.slow
def test_infer_cli_ytvos_submission(tmp_path):
    root, vid = _fake_ytvos(tmp_path)
    out = str(tmp_path / "sub")
    r = _run(["infer.py", "--preset", "p4_ytvos_stream", "--dataset", "ytvos",
              "--ytvos-root", root, "--out", out, "--chunk", "3",
              "--set"] + TINY + ["model.decoder_dtype=float32"])
    assert r.returncode == 0, r.stderr[-3000:]
    pngs = sorted(os.listdir(os.path.join(out, "Annotations", vid)))
    assert pngs == ["00000.png", "00005.png"]
    im = np.asarray(Image.open(os.path.join(out, "Annotations", vid, pngs[0])))
    assert im.shape == (60, 100) or im.shape == (64, 96)


@pytest.mark.slow
def test_train_cli_resume(tmp_path):
    """Train 2 steps, resume for 2 more: the resumed run must pick up the
    checkpoint step and finish at step 4."""
    args = ["train.py", "--preset", "p5_train", "--logdir",
            str(tmp_path / "run"), "--set", "data.dataset=synthetic",
            "data.batch_size=1", "data.clip_length=2",
            "train.checkpoint_every=1000"] + TINY
    r1 = _run(args + ["--steps", "2"])
    assert r1.returncode == 0, r1.stderr[-2000:]
    r2 = _run(args + ["--steps", "4", "--resume"])
    assert r2.returncode == 0, r2.stderr[-2000:]
    assert "resumed at step 2" in (r2.stderr + r2.stdout)
    assert "done at step 4" in (r2.stderr + r2.stdout)


@pytest.mark.slow
def test_infer_cli_data_parallel_padded_group(tmp_path):
    """--data-parallel with a sequence count NOT divisible by the device
    count: the last group pads by duplicating a name, and each lane must
    own its OWN frames generator (a shared generator interleaves next()
    calls across lanes and exhausts halfway — the exact shipped bug this
    reproduces). 3 sequences over 2 fake devices -> groups [2, 1+pad]."""
    root = _fake_davis(tmp_path, n_seq=3)
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=2")
    out = str(tmp_path / "results_dp")
    r = subprocess.run(
        [sys.executable, "infer.py", "--preset", "p3_multi_object",
         "--davis-root", root, "--out", out, "--chunk", "2",
         "--data-parallel", "--set"] + TINY,
        cwd=REPO, env=env, capture_output=True, text=True, timeout=540)
    assert r.returncode == 0, r.stderr[-3000:]
    with open(os.path.join(out, "results.json")) as f:
        dp = json.load(f)
    assert sorted(dp["sequences"]) == ["seq0", "seq1", "seq2"]
    assert dp["frames"] == 9          # 3 seqs x 3 frames, dups skipped
    assert dp["data_parallel"] == 2
    for name, res in dp["sequences"].items():
        assert 0.0 <= res["J&F"] <= 1.0, (name, res)
