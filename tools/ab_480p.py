#!/usr/bin/env python3
"""Quality A/B at the reference's native DAVIS geometry (VERDICT r3 #5).

Builds the day-one synthetic DAVIS tree at native 854x480 (held-out
seeds), extracts detector proposals once per model geometry, and runs the
production chunked dispatch with the SHIPPED flagship weights at
256x448 (the trained geometry) and at 480x864 (p3_480p, padded 854->864),
scoring both at the annotation's native resolution. The DMM is fully
convolutional, so the 480p run reuses the 256x448-trained weights with
--set model.image_size overrides.

Usage: python tools/ab_480p.py [--seeds 7001 7002] [--frames 4]
"""
import argparse
import json
import os
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, nargs="*", default=[7001, 7002])
    ap.add_argument("--frames", type=int, default=4)
    ap.add_argument("--dmm", default="runs/dmm448/dmm.msgpack")
    ap.add_argument("--mrcnn", default="runs/proposal_video448/mrcnn.msgpack")
    ap.add_argument("--workdir", default=None)
    args = ap.parse_args()

    import pathlib
    from tests.test_dayone_cli import _synthetic_davis_tree

    work = pathlib.Path(args.workdir or tempfile.mkdtemp(prefix="ab480_"))
    work.mkdir(exist_ok=True)
    root = _synthetic_davis_tree(work, T=args.frames,
                                 seeds=tuple(args.seeds))

    def run(cmd):
        r = subprocess.run([sys.executable] + cmd, capture_output=True,
                           text=True, cwd=os.path.dirname(
                               os.path.dirname(os.path.abspath(__file__))))
        if r.returncode != 0:
            sys.exit(f"FAILED: {cmd}\n{r.stderr[-3000:]}")
        return r

    rows = {}
    for tag, (h, w) in (("256x448", (256, 448)), ("480x864", (480, 864))):
        cache = str(work / f"props_{tag}")
        out = str(work / f"res_{tag}")
        run(["tools/extract_proposals.py", "--dataset", "davis", "--root",
             root, "--out", cache, "--params", args.mrcnn,
             "--image-size", str(h), str(w), "--backbone", "resnet18",
             "--num-classes", "4", "--max-detections", "8",
             "--score-thresh", "0.05"])
        run(["infer.py", "--ckpt", args.dmm, "--davis-root", root,
             "--proposal-dir", cache, "--out", out, "--chunk", "4",
             "--set", f"model.image_size={h},{w}"])
        with open(os.path.join(out, "results.json")) as f:
            s = json.load(f)
        rows[tag] = {k: round(s[k], 4) for k in ("J", "F", "J&F")}
        rows[tag]["fps"] = round(s["fps"], 1)
        print(tag, rows[tag])
    print(json.dumps({"ab_480p": rows,
                      "note": "native-resolution scoring; flagship weights "
                              "trained at 256x448, run convolutionally at "
                              "both geometries"}))


if __name__ == "__main__":
    main()
