#!/usr/bin/env python3
"""Streaming-pipeline benchmark (config #4 north star: "pipelined
preprocessing so the matcher never stalls on host I/O").

Uses the production streaming path: compact proposals (boxes + 28x28
box-local masks, ~0.4 MB/frame H2D) pasted on device, uint8 frames
normalized on device. Host decode cost is simulated with a sleep.

Measures fps three ways:
  1. serial:   decode frame -> step (no overlap)
  2. prefetch: threaded decode-ahead (depth 3)
  3. ceiling:  all frames pre-decoded (device-bound)

Usage: python bench/bench_stream.py [--frames 64] [--decode-ms 8]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=48)
    ap.add_argument("--decode-ms", type=float, default=8.0)
    ap.add_argument("--objects", type=int, default=3)
    args = ap.parse_args()

    from dmm_net_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from dmm_net_tpu.config import preset
    from dmm_net_tpu.data.pipeline import Prefetcher
    from dmm_net_tpu.infer.engine import InferenceEngine
    from dmm_net_tpu.models.dmm import DMMNet, FrameState, decoder_state_dim

    cfg = preset("p4_ytvos_stream")
    H, W = cfg.model.image_size
    M, N = cfg.matching.max_templates, cfg.matching.max_proposals
    model = DMMNet(cfg)
    rng = np.random.RandomState(0)

    # pre-generate compact proposals once (the expensive 58 MB/frame
    # full-res masks never exist on host in this path)
    def make_item(t):
        r = np.random.RandomState(t)
        boxes = np.zeros((1, N, 4), np.float32)
        m28 = np.zeros((1, N, 28, 28), np.float32)
        pv = np.zeros((1, N), bool)
        n = 16
        x1 = r.rand(n) * (W - 60)
        y1 = r.rand(n) * (H - 60)
        boxes[0, :n] = np.stack([x1, y1, x1 + 30 + r.rand(n) * 30,
                                 y1 + 30 + r.rand(n) * 30], 1)
        m28[0, :n] = r.rand(n, 28, 28) > 0.4
        pv[0, :n] = True
        frame = (r.rand(1, H, W, 3) * 255).astype(np.uint8)
        return {"frame": frame, "prop_boxes": boxes, "prop_masks28": m28,
                "prop_valid": pv}

    pregen = [make_item(t) for t in range(args.frames)]

    def decode(t):
        time.sleep(args.decode_ms / 1e3)   # simulated JPEG decode
        return pregen[t]

    tmpl_masks = np.zeros((1, M, H, W), np.float32)
    tmpl_valid = np.zeros((1, M), bool)
    tmpl_masks[0, :args.objects] = rng.rand(args.objects, H, W) > 0.8
    tmpl_valid[0, :args.objects] = True
    first = (rng.rand(1, H, W, 3) * 255).astype(np.uint8)

    state0 = FrameState(
        template_masks=jnp.zeros((1, M, H, W)),
        decoder_state=jnp.zeros((1, M, H // 32, W // 32,
                                 decoder_state_dim(cfg))))
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, H, W, 3)),
                           jnp.zeros((1, N, H, W)), jnp.ones((1, N), bool),
                           jnp.zeros((1, M, cfg.model.feature_dim)),
                           jnp.asarray(tmpl_valid), state0)
    engine = InferenceEngine(cfg, model=model, variables=variables)

    T = args.frames
    # warm up compiles (bucketed step)
    engine.run_sequence(iter(pregen[:2]), tmpl_masks, tmpl_valid, first)

    t0 = time.perf_counter()
    engine.run_sequence((decode(t) for t in range(T)),
                        tmpl_masks, tmpl_valid, first)
    serial = T / (time.perf_counter() - t0)

    t0 = time.perf_counter()
    pf = Prefetcher(range(T), decode, depth=3, device_put=True)
    engine.run_sequence(iter(pf), tmpl_masks, tmpl_valid, first)
    prefetch = T / (time.perf_counter() - t0)

    t0 = time.perf_counter()
    engine.run_sequence(iter(pregen), tmpl_masks, tmpl_valid, first)
    ceiling = T / (time.perf_counter() - t0)

    # production config #4: compact proposals + K-frame chunked scan +
    # threaded decode-ahead (one H2D batch and one dispatch per K frames)
    engine.run_stream_chunked(iter(pregen[:8]), tmpl_masks, tmpl_valid,
                              first, chunk=8)   # warm
    t0 = time.perf_counter()
    pf = Prefetcher(range(T), decode, depth=3, device_put=False)
    engine.run_stream_chunked(iter(pf), tmpl_masks, tmpl_valid, first,
                              chunk=8)
    chunked = T / (time.perf_counter() - t0)

    print(f"decode={args.decode_ms}ms/frame, {T} frames, {H}x{W}, "
          f"{args.objects} objects (bucketed), compact proposals")
    print(f"serial (no overlap):   {serial:7.1f} fps")
    print(f"prefetch (depth 3):    {prefetch:7.1f} fps")
    print(f"device-bound ceiling:  {ceiling:7.1f} fps")
    print(f"chunked scan (K=8) + prefetch: {chunked:7.1f} fps")
    if ceiling > serial:
        rec = 100 * (prefetch - serial) / (ceiling - serial)
        print(f"overlap recovers {rec:.0f}% of the decode stall")


if __name__ == "__main__":
    main()
