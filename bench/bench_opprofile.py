#!/usr/bin/env python3
"""Per-op time profile of the production chunked step via jax.profiler.

The prefix-delta breakdown (bench_breakdown) localizes cost to blocks
but not ops; this tool traces real dispatches and aggregates XLA-op
durations from the xplane, answering exactly which HLOs eat the step
(the intra-decoder breakdown found 3.4 ms of 9 sitting on tiny
stride-16/32 tensors — per-op evidence beats guessing).

Usage: python bench/bench_opprofile.py   [BENCH_BATCH / BENCH_SET as in bench.py]
Prints the top-K ops by total device time across the traced dispatches.
"""

import os
import re
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from dmm_net_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from dmm_net_tpu.config import preset
    from dmm_net_tpu.infer.engine import InferenceEngine
    from dmm_net_tpu.models.dmm import DMMNet

    B = int(os.environ.get("BENCH_BATCH", "16"))
    K = int(os.environ.get("BENCH_CHUNK", "16"))
    cfg = preset(os.environ.get("BENCH_PRESET", "p3_multi_object"))
    overrides = os.environ.get("BENCH_SET", "")
    if overrides:
        from dmm_net_tpu.utils.cli import parse_overrides
        cfg = cfg.override(
            **parse_overrides(overrides.replace(";", " ").split()))
    H, W = cfg.model.image_size
    M, N = cfg.matching.max_templates, cfg.matching.max_proposals
    model = DMMNet(cfg)
    rng = np.random.RandomState(0)

    from dmm_net_tpu.utils.bench_inputs import make_frame_inputs
    frame, pm, pv, tf_, tv, state = make_frame_inputs(cfg, B)
    variables = model.init(jax.random.PRNGKey(0), frame, pm, pv, tf_, tv,
                           state)
    engine = InferenceEngine(cfg, model=model, variables=variables,
                             update_templates=True)
    frames_u8 = jnp.asarray((rng.rand(K, B, H, W, 3) * 255).astype(np.uint8))
    cy = rng.rand(K, B, N, 1) * H
    cx = rng.rand(K, B, N, 1) * W
    bh = rng.rand(K, B, N, 1) * H * 0.3 + 8
    bw = rng.rand(K, B, N, 1) * W * 0.3 + 8
    boxes = jnp.asarray(np.concatenate(
        [cx - bw / 2, cy - bh / 2, cx + bw / 2, cy + bh / 2],
        axis=-1).astype(np.float32))
    m28 = jnp.asarray((rng.rand(K, B, N, 28, 28) > 0.4).astype(np.uint8))
    pvk = jnp.ones((K, B, N), bool)

    step = jax.jit(engine._chunk_step_compact)
    args = (variables, frames_u8, boxes, m28, pvk, tf_, tv, state)
    labels, X, st = step(*args)
    np.asarray(labels[-1, 0, ::64, ::64])      # warm + D2H barrier

    tracedir = "/tmp/opprofile"
    os.makedirs(tracedir, exist_ok=True)
    with jax.profiler.trace(tracedir):
        for _ in range(2):
            labels, X, st = step(*args)
        np.asarray(labels[-1, 0, ::64, ::64])

    # newest .xplane.pb under tracedir
    paths = []
    for root, _, files in os.walk(tracedir):
        paths += [os.path.join(root, f) for f in files
                  if f.endswith(".xplane.pb")]
    path = max(paths, key=os.path.getmtime)
    data = jax.profiler.ProfileData.from_file(path)
    dev_planes = [pl for pl in data.planes
                  if "TPU" in pl.name or "Device" in pl.name]
    if not dev_planes:
        print("planes:", [pl.name for pl in data.planes])
        return
    tot = defaultdict(float)
    cnt = defaultdict(int)
    for pl in dev_planes:
        for line in pl.lines:
            for ev in line.events:
                d = ev.duration_ns
                name = ev.name
                tot[name] += d / 1e3   # us
                cnt[name] += 1
    grand = sum(tot.values())
    print(f"plane(s): {[pl.name for pl in dev_planes]}  "
          f"total {grand/1e3:.2f} ms over 2 dispatches of K={K}")
    # group fusions by stripping trailing .N indices
    grouped = defaultdict(float)
    for name, us in tot.items():
        grouped[re.sub(r"\.\d+$", "", name)] += us
    for name, us in sorted(grouped.items(), key=lambda kv: -kv[1])[:45]:
        print(f"{us/1e3:9.3f} ms  {name}")


if __name__ == "__main__":
    main()
