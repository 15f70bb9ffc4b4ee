"""Proposal subsystem (SURVEY.md §2 L3): Mask R-CNN proposal generation.

The reference consumes precomputed proposals from an offline
maskrcnn-benchmark stage (§4.3). This package is the TPU-native equivalent:
a flax R-50-FPN Mask R-CNN (anchors → RPN → NMS → ROI-Align box head →
ROI-Align mask head) producing per-frame {boxes, scores, masks} that
tools/extract_proposals.py caches to disk in the same RLE-json format the
data readers consume.
"""

from dmm_net_tpu.models.proposal.fpn import FPN  # noqa: F401
from dmm_net_tpu.models.proposal.anchors import generate_anchors, decode_boxes  # noqa: F401
from dmm_net_tpu.models.proposal.maskrcnn import MaskRCNN  # noqa: F401
