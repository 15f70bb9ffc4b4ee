#!/usr/bin/env python3
"""Matcher microbenchmarks: jnp path vs fused Pallas kernel.

Usage: python bench/bench_matcher.py [--batch 8] [--iters 50]
Prints per-variant wall time per call (steady state, block_until_ready).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, iters=50):
    out = fn(*args)
    import jax
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--M", type=int, default=16)
    ap.add_argument("--N", type=int, default=128)
    ap.add_argument("--P", type=int, default=448)    # 16x28 emb pixels
    ap.add_argument("--D", type=int, default=256)
    ap.add_argument("--Pc", type=int, default=4096)  # 64x64 cost pixels
    ap.add_argument("--sinkhorn", type=int, default=30)
    args = ap.parse_args()

    from dmm_net_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from dmm_net_tpu.kernels.matcher import (
        _pool_cost_match_reference,
        fused_pool_cost_match,
    )

    B, M, N, P, D, Pc = (args.batch, args.M, args.N, args.P, args.D, args.Pc)
    rng = np.random.RandomState(0)
    emb = jnp.asarray(rng.randn(B, P, D), jnp.float32)
    pm_pool = jnp.asarray(rng.rand(B, N, P) > 0.7, jnp.float32)
    tm_cost = jnp.asarray(rng.rand(B, M, Pc) > 0.7, jnp.float32)
    pm_cost = jnp.asarray(rng.rand(B, N, Pc) > 0.7, jnp.float32)
    tf = jnp.asarray(rng.randn(B, M, D), jnp.float32)
    rm = jnp.ones((B, M), bool)
    cm = jnp.ones((B, N), bool)

    on_tpu = jax.default_backend() == "tpu"
    print(f"backend: {jax.default_backend()} devices={jax.devices()}")

    jnp_path = jax.jit(lambda e, pp, a, b, c, r, cmask: _pool_cost_match_reference(
        e, pp, a, b, c, r, cmask, 0.05, args.sinkhorn, 0.3))
    t = timeit(jnp_path, emb, pm_pool, tm_cost, pm_cost, tf, rm, cm,
               iters=args.iters)
    print(f"jnp path:          {t * 1e3:8.3f} ms/call "
          f"({B / t:9.1f} frames/sec)")

    fused = jax.jit(lambda e, pp, a, b, c, r, cmask: fused_pool_cost_match(
        e, pp, a, b, c, r, cmask, epsilon=0.05, iters=args.sinkhorn,
        iou_weight=0.3, interpret=not on_tpu))
    t = timeit(fused, emb, pm_pool, tm_cost, pm_cost, tf, rm, cm,
               iters=args.iters)
    print(f"fused pallas:      {t * 1e3:8.3f} ms/call "
          f"({B / t:9.1f} frames/sec)")


if __name__ == "__main__":
    main()
