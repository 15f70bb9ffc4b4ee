"""Inference: per-sequence streaming engine, overlap resolution, PNG output."""

from dmm_net_tpu.infer.engine import InferenceEngine, resolve_overlaps  # noqa: F401
