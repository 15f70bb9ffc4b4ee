#!/bin/bash
# Train + verify the git-TRACKED fallback artifact
#
#   artifacts/dmm128_fallback.msgpack   R-18 @ 128x224 DMM (planted-proposal
#                                       protocol; ~48 MB f32)
#
# Unlike runs/ (gitignored — flagship weights evaporate at every clone
# boundary, VERDICT r4 missing #3), artifacts/ is committed, so
# tests/test_dayone_cli.py::test_dayone_fallback_artifact_always_runs can
# HARD-FAIL when the blob is absent: a fresh clone can never again read
# green while every day-one drill silently skips.
#
# ~6 min on one v5e. The eval gate (--min-jf) must pass for the verified
# name to appear — unmeasured weights cannot ship (VERDICT r3 next #1).
set -e
cd "$(dirname "$0")/.."
mkdir -p artifacts

python examples/train_and_eval_synthetic.py --size 128 --width 224 \
  --backbone resnet18 --feature-dim 32 --decoder-dim 32 --obj-dim 16 \
  --steps "${FALLBACK_STEPS:-2500}" --eval-seqs 2 \
  --min-jf "${FALLBACK_MIN_JF:-0.90}" \
  --save artifacts/dmm128_fallback.msgpack

# the drill the artifact exists to serve — run it on the fresh blob
python -m pytest "tests/test_dayone_cli.py::test_dayone_fallback_artifact_always_runs" -q
