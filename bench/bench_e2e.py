#!/usr/bin/env python3
"""End-to-end frame-step benchmark: fps vs batch size, fp32 vs bf16 decoder,
jnp vs fused-pallas matcher. Prints a table; use to pick bench.py defaults.

Usage: python bench/bench_e2e.py [--batches 1 2 4 8] [--iters 20]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, nargs="*", default=[1, 2, 4, 8])
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--pallas", action="store_true")
    args = ap.parse_args()

    from dmm_net_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    import dataclasses
    import jax

    from dmm_net_tpu.config import preset
    from dmm_net_tpu.infer.engine import resolve_labels
    from dmm_net_tpu.models.dmm import DMMNet

    base = preset("p3_multi_object")
    if args.pallas:
        base = dataclasses.replace(
            base, matching=dataclasses.replace(base.matching, use_pallas=True))
    H, W = base.model.image_size
    M = base.matching.max_templates
    N = base.matching.max_proposals
    print(f"backend={jax.default_backend()} image={H}x{W} M={M} N={N} "
          f"pallas={base.matching.use_pallas}")

    model = DMMNet(base)
    variables = None
    for B in args.batches:
        # on-device input generation (utils/bench_inputs.py; shared across benches)
        from dmm_net_tpu.utils.bench_inputs import make_frame_inputs
        frame, pm, pv, tf_, tv, st = make_frame_inputs(base, B, seed=B)
        if variables is None:
            variables = model.init(jax.random.PRNGKey(0), frame, pm, pv,
                                   tf_, tv, st)

        @jax.jit
        def step(frame, pm, pv, tf_, tv, st):
            out, new_st = model.apply(variables, frame, pm, pv, tf_, tv, st)
            return resolve_labels(out.logits, tv, (H, W),
                                  use_pallas=base.matching.use_pallas), new_st

        labels, st2 = step(frame, pm, pv, tf_, tv, st)
        jax.block_until_ready(labels)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            labels, st2 = step(frame, pm, pv, tf_, tv, st2)
        jax.block_until_ready(labels)
        dt = (time.perf_counter() - t0) / args.iters
        print(f"B={B:2d}: {dt * 1e3:8.2f} ms/step  "
              f"{B / dt:8.1f} frames/sec/chip")


if __name__ == "__main__":
    main()
