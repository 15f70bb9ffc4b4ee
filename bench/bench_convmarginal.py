#!/usr/bin/env python3
"""Marginal per-conv cost at decoder shapes, via chain-depth deltas.

The objpack microbench (one conv per scan iteration) turned out to be
floor-dominated: an elementwise add on a 0.9 MB tensor measured ~0.6 ms
per iteration, i.e. the harness's per-scan-iteration overhead swamps any
op under ~1 ms, so layout comparisons at these sizes were meaningless.
This bench times chains of DEPTH convs per iteration and reports
(t_deep - t_1)/(DEPTH-1): the true marginal cost of one conv with the
iteration overhead differenced out.

Questions it answers (ROUND_NOTES r4 decoder attack):
  * is the production decoder per-OP-overhead-bound (marginals tiny,
    op count is the cost) or genuinely slow per conv (marginals ~the
    single-op measurements)?
  * what does a conv at 128 channels cost vs 16/32 at the same pixels
    (lane-padding tax)?
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from dmm_net_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    reps = int(os.environ.get("BENCH_REPS", "30"))
    depth = int(os.environ.get("BENCH_DEPTH", "9"))
    dt = jnp.bfloat16
    rng = np.random.RandomState(0)

    def conv(a, k):
        return jax.lax.conv_general_dilated(
            a, k, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def timed(fn, x, d):
        @jax.jit
        def rep(x):
            def body(c, _):
                out = x + c.astype(x.dtype)
                for _ in range(d):
                    out = fn(out)
                return out.astype(jnp.float32).mean() * 1e-12, None
            tot, _ = jax.lax.scan(body, jnp.float32(0), None, length=reps)
            return tot
        np.asarray(rep(x))                     # compile + warm
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(rep(x))
            best = min(best, (time.perf_counter() - t0) / reps * 1e3)
        return best

    # decoder-shaped cases: (B*M or B, h, w, c)
    cases = [
        (256, 64, 112, 16),    # per-object stride4, tapered
        (256, 64, 112, 32),    # per-object stride4, untapered
        (256, 8, 14, 32),      # GRU grid (stride 32)
        (16, 64, 112, 128),    # shared path stride4
        (16, 8, 14, 64),       # fused-GRU-at-B candidate grid
    ]
    for shape in cases:
        g = shape[-1]
        k = jnp.asarray(rng.randn(3, 3, g, g) * 0.1, dt)
        x = jnp.asarray(rng.randn(*shape), dt)
        t1 = timed(lambda a: conv(a, k), x, 1)
        td = timed(lambda a: conv(a, k), x, depth)
        marg = (td - t1) / (depth - 1)
        fl = 2 * int(np.prod(shape)) * 9 * g
        print(json.dumps({
            "shape": list(shape), "t1_ms": round(t1, 4),
            "marginal_ms": round(marg, 4),
            "eff_tflops": round(fl / (max(marg, 1e-6) / 1e3) / 1e12, 2),
            "eff_gbps": round(2 * int(np.prod(shape)) * 2 * 2
                              / (max(marg, 1e-6) / 1e3) / 1e9, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
