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

    import __graft_entry__ as graft

    fn, args = graft.entry()
    step = jax.jit(fn)

    # warmup / compile
    out = step(*args)
    jax.block_until_ready(out)

    # steady state: feed the carried state back like the real engine
    iters = int(os.environ.get("BENCH_ITERS", "30"))
    state = out[2]
    t0 = time.perf_counter()
    for _ in range(iters):
        labels, X, state = step(args[0], args[1], args[2], args[3], args[4],
                                state)
    jax.block_until_ready((labels, X, state))
    dt = time.perf_counter() - t0
    fps = iters / dt

    print(json.dumps({
        "metric": "end_to_end_frames_per_sec_per_chip_matching_refine",
        "value": round(fps, 3),
        "unit": "frames/sec",
        "vs_baseline": round(fps / REFERENCE_GPU_FPS, 3),
    }))


if __name__ == "__main__":
    main()
