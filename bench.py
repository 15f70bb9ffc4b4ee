#!/usr/bin/env python3
"""Headline benchmark: end-to-end frames/sec/chip (matching + refine).

Driver contract: prints ONE JSON line
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Measures the steady-state per-frame inference step of the flagship
ResNet-50 model (multi-object DAVIS config p3: 256x448, M=16 templates,
N=128 proposals) on the default JAX device — the BASELINE.json:2 metric
"end-to-end frames/sec/chip (matching+refine)". Proposal generation is
excluded, matching the reference's offline-proposal protocol
(SURVEY.md §4.3).

vs_baseline uses the reference-GPU estimate recorded in BASELINE.md
(no exact published fps exists; see the provenance note there).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Reference GPU end-to-end fps (matching+refine). No exact number is
# published (BASELINE.md); 10 fps is the recorded estimate for the
# reference's per-frame GPU loop at 480p. Update when measurable.
REFERENCE_GPU_FPS = 10.0


def main():
    from dmm_net_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from dmm_net_tpu.config import preset
    from dmm_net_tpu.infer.engine import resolve_overlaps
    from dmm_net_tpu.models.dmm import DMMNet, FrameState

    # B=4 batched frames (acceptance config #3 explicitly allows batched
    # frames); bench/bench_e2e.py sweep shows B=4 is the v5e throughput knee.
    B = int(os.environ.get("BENCH_BATCH", "4"))
    cfg = preset("p3_multi_object")
    H, W = cfg.model.image_size
    M, N = cfg.matching.max_templates, cfg.matching.max_proposals
    model = DMMNet(cfg)
    rng = np.random.RandomState(0)
    frame = jnp.asarray(rng.rand(B, H, W, 3), jnp.float32)
    pm = jnp.asarray(rng.rand(B, N, H, W) > 0.8, jnp.float32)
    pv = jnp.ones((B, N), bool)
    tf_ = jnp.asarray(rng.randn(B, M, cfg.model.feature_dim), jnp.float32)
    tv = jnp.ones((B, M), bool)
    state = FrameState(
        template_masks=jnp.asarray(rng.rand(B, M, H, W) > 0.8, jnp.float32),
        decoder_state=jnp.zeros((B, M, H // 32, W // 32,
                                 cfg.model.decoder_dim)))
    variables = model.init(jax.random.PRNGKey(0), frame, pm, pv, tf_, tv,
                           state)

    @jax.jit
    def step(frame, pm, pv, tf_, tv, state):
        out, new_state = model.apply(variables, frame, pm, pv, tf_, tv, state)
        return resolve_overlaps(out.logits, tv), new_state

    labels, state = step(frame, pm, pv, tf_, tv, state)
    jax.block_until_ready(labels)

    iters = int(os.environ.get("BENCH_ITERS", "30"))
    t0 = time.perf_counter()
    for _ in range(iters):
        labels, state = step(frame, pm, pv, tf_, tv, state)
    jax.block_until_ready((labels, state))
    dt = time.perf_counter() - t0
    fps = iters * B / dt

    print(json.dumps({
        "metric": "end_to_end_frames_per_sec_per_chip_matching_refine",
        "value": round(fps, 3),
        "unit": "frames/sec",
        "vs_baseline": round(fps / REFERENCE_GPU_FPS, 3),
    }))


if __name__ == "__main__":
    main()
