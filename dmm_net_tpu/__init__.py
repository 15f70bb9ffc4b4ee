"""dmm_net_tpu — TPU-native differentiable mask-matching for video object segmentation.

A from-scratch JAX / XLA / Pallas / pjit framework with the capabilities of
the PyTorch reference ZENGXH/DMM_Net (DMM-Net, ICCV 2019, arXiv:1909.12471):
semi-supervised video object segmentation by differentiable bipartite
matching of per-frame mask proposals against first-frame template masks.

Not a port: the compute path is designed TPU-first —
  * cost matrix (mask-IoU + cosine feature similarity) and the matching
    solver (Sinkhorn / projected-gradient on the relaxed assignment
    polytope) run fused in VMEM as a single Pallas kernel;
  * the backbone / decoder are flax modules compiled by XLA (MXU convs,
    NHWC, bfloat16-friendly);
  * variable template/proposal counts become static padded shapes with
    explicit validity masks (no recompiles);
  * data parallelism is a `jax.sharding.Mesh` + jit shardings (XLA SPMD
    collectives over ICI), never hand-written comm.

Blueprint: /root/repo/SURVEY.md. Reference targets: /root/repo/BASELINE.md.
"""

__version__ = "0.1.0"

import os as _os

import jax as _jax

# Restore JAX_PLATFORMS env semantics: the axon TPU plugin's sitecustomize
# overrides jax_platforms at interpreter start, so an explicit
# JAX_PLATFORMS=cpu request would otherwise silently run through the TPU
# tunnel. Only effective if no backend has been initialized yet.
if _os.environ.get("JAX_PLATFORMS") == "cpu":
    try:
        _jax.config.update("jax_platforms", "cpu")
    except Exception:  # backend already initialized; leave as-is
        pass

from dmm_net_tpu.config import Config, preset  # noqa: F401
