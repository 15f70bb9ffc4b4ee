"""Pallas TPU kernels: fused cost+matcher, ROI-Align."""

from dmm_net_tpu.kernels.matcher import fused_cost_match  # noqa: F401
