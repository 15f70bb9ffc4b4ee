#!/usr/bin/env python3
"""Streaming-pipeline benchmark (config #4 north star: "pipelined
preprocessing so the matcher never stalls on host I/O").

Simulates host decode cost per frame (sleep ~ JPEG decode of a 480p frame)
and measures end-to-end fps three ways:
  1. serial:   decode frame -> step (no overlap)
  2. prefetch: RingStager/Prefetcher thread decodes ahead (overlap)
  3. device-bound ceiling: all frames pre-decoded

Usage: python bench/bench_stream.py [--frames 64] [--decode-ms 8]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=64)
    ap.add_argument("--decode-ms", type=float, default=8.0)
    ap.add_argument("--size", type=int, nargs=2, default=(256, 448))
    args = ap.parse_args()

    from dmm_net_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from dmm_net_tpu.config import preset
    from dmm_net_tpu.data.pipeline import Prefetcher
    from dmm_net_tpu.infer.engine import InferenceEngine
    from dmm_net_tpu.models.dmm import DMMNet, FrameState

    cfg = preset("p4_ytvos_stream")
    H, W = args.size
    cfg = cfg.override(**{"model.image_size": (H, W)})
    M, N = cfg.matching.max_templates, cfg.matching.max_proposals
    model = DMMNet(cfg)
    rng = np.random.RandomState(0)

    def decode(t):
        """Pretend to decode frame t (sleep = host JPEG cost)."""
        time.sleep(args.decode_ms / 1e3)
        r = np.random.RandomState(t)
        return {"frame": r.rand(1, H, W, 3).astype(np.float32),
                "prop_masks": (r.rand(1, N, H, W) > 0.8).astype(np.float32),
                "prop_valid": np.ones((1, N), bool)}

    tmpl_masks = (rng.rand(1, M, H, W) > 0.8).astype(np.float32)
    tmpl_valid = np.ones((1, M), bool)
    first = rng.rand(1, H, W, 3).astype(np.float32)
    engine = InferenceEngine(cfg, model=model, variables=None)
    state0 = FrameState(
        template_masks=jnp.asarray(tmpl_masks),
        decoder_state=jnp.zeros((1, M, H // 32, W // 32,
                                 cfg.model.decoder_dim)))
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.asarray(first),
                           jnp.zeros((1, N, H, W)), jnp.ones((1, N), bool),
                           jnp.zeros((1, M, cfg.model.feature_dim)),
                           jnp.asarray(tmpl_valid), state0)
    engine.variables = variables

    T = args.frames

    # warm up compile
    _ = engine.run_sequence(iter([decode(0)]), tmpl_masks, tmpl_valid, first)

    # 1. serial
    t0 = time.perf_counter()
    engine.run_sequence((decode(t) for t in range(T)),
                        tmpl_masks, tmpl_valid, first)
    serial = T / (time.perf_counter() - t0)

    # 2. prefetch (threaded decode, depth 3)
    t0 = time.perf_counter()
    pf = Prefetcher(range(T), decode, depth=3, device_put=True)
    engine.run_sequence(iter(pf), tmpl_masks, tmpl_valid, first)
    prefetch = T / (time.perf_counter() - t0)

    # 3. ceiling: pre-decoded
    items = [decode(t) for t in range(T)]
    t0 = time.perf_counter()
    engine.run_sequence(iter(items), tmpl_masks, tmpl_valid, first)
    ceiling = T / (time.perf_counter() - t0)

    print(f"decode={args.decode_ms}ms/frame, {T} frames, image {H}x{W}")
    print(f"serial (no overlap):   {serial:7.1f} fps")
    print(f"prefetch (depth 3):    {prefetch:7.1f} fps")
    print(f"device-bound ceiling:  {ceiling:7.1f} fps")
    print(f"overlap recovers {100 * (prefetch - serial) / max(ceiling - serial, 1e-9):.0f}% "
          "of the decode stall")


if __name__ == "__main__":
    main()
