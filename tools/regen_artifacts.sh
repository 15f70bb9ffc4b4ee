#!/bin/bash
# Regenerate the shipped flagship artifacts (runs/ is gitignored, so
# trained weights do not survive a fresh clone / round boundary).
#
#   runs/dmm448/dmm.msgpack              flagship DMM (256x448 / R-50,
#                                        tapered decoder obj_dim_fine=16)
#   runs/proposal_video448/mrcnn.msgpack proposal Mask R-CNN (256x448 /
#                                        R-18 / 4 classes, video domain)
#
# One sequential process chain on purpose: TPU-tunnel compiles are
# expensive and killed runs can wedge the relay (ROUND_NOTES r3) — run
# this start-to-finish, ~20 min on one v5e chip. tests/test_dayone_cli.py
# consumes the artifacts; it skips with a pointer here when they are
# missing.
set -e
cd "$(dirname "$0")/.."
mkdir -p runs/dmm448 runs/proposal_video448

# Detector FIRST: the DMM trains on ITS cached proposals (the reference's
# actual protocol, SURVEY.md §1.1/§4.3). Training on planted jittered-GT
# proposals only (the r3 regen) left the DMM brittle to the detector's
# dilated soft-edged masks — day-one drill collapsed to J&F 0.489 while
# planted-proposal eval read 0.95+.
python train_proposal.py --data video --image-size 256 448 \
  --backbone resnet18 --num-classes 4 --steps "${MRCNN_STEPS:-4000}" \
  --batch 2 --logdir runs/proposal_video448 \
  --save runs/proposal_video448/mrcnn.msgpack

# DMM on detector proposals. The held-out eval is tunnel-safe
# (chunked-compact dispatch) and GATES the artifact — the verified name
# appears only above --min-jf, so unmeasured/regressed weights cannot
# ship (VERDICT r3 next #1).
python examples/train_and_eval_synthetic.py --size 256 --width 448 \
  --backbone resnet50 --feature-dim 64 --decoder-dim 64 --obj-dim 32 \
  --steps "${DMM_STEPS:-4000}" --set model.decoder_obj_dim_fine=16 \
  --mrcnn runs/proposal_video448/mrcnn.msgpack --mrcnn-classes 4 \
  --eval-seqs 2 --min-jf "${DMM_MIN_JF:-0.90}" \
  --save runs/dmm448/dmm.msgpack

# full-system gate: learned proposals end to end on held-out videos;
# exits nonzero (failing this script under set -e) if the artifact PAIR
# scores below the floor — the day-one drill's expectation
python examples/full_system_synthetic.py --dmm runs/dmm448/dmm.msgpack \
  --mrcnn runs/proposal_video448/mrcnn.msgpack --mrcnn-classes 4 \
  --eval-seqs 6 --frames 6 --min-jf "${SYS_MIN_JF:-0.85}" --min-recall 0.9

# Drill on the artifacts just produced — REQUIRE_ARTIFACTS turns the
# drill's missing-artifact skip into a hard failure, so this script
# cannot exit green unless the drill actually RAN and PASSED
# (VERDICT r4 weak #4: the flag existed but nothing ever set it).
REQUIRE_ARTIFACTS=1 python -m pytest tests/test_dayone_cli.py -q
