#!/usr/bin/env python3
"""End-to-end training demo on synthetic clips (no dataset required).

Usage: [JAX_PLATFORMS=cpu] python examples/train_synthetic.py [--steps N]

Exercises the full training path: synthetic data -> jit'd train step
(backbone + matcher + decoder, lax.scan over frames) -> loss curve.
"""

import argparse

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import jax
import numpy as np

from dmm_net_tpu.config import Config, DataConfig, MatchingConfig, ModelConfig, TrainConfig
from dmm_net_tpu.data.synthetic import synthetic_clip_batch
from dmm_net_tpu.train.loop import create_train_state, make_train_step


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--size", type=int, default=64)
    args = ap.parse_args()

    cfg = Config(
        name="train_synthetic",
        model=ModelConfig(backbone="resnet18", backbone_dtype="float32",
                          feature_dim=32, decoder_dim=16,
                          image_size=(args.size, args.size)),
        matching=MatchingConfig(max_templates=4, max_proposals=8,
                                sinkhorn_iters=10),
        data=DataConfig(dataset="synthetic", batch_size=2, clip_length=3),
        train=TrainConfig(lr=1e-3, warmup_steps=5, total_steps=1000),
    )
    print(f"devices: {jax.devices()}")
    batch = {k: np.asarray(v) for k, v in synthetic_clip_batch(
        seed=0, batch=2, T=3, H=args.size, W=args.size, num_objects=2,
        num_proposals=cfg.matching.max_proposals,
        pad_objects=cfg.matching.max_templates).items()}
    state = create_train_state(cfg, jax.random.PRNGKey(0), batch)
    n_params = sum(x.size for x in jax.tree.leaves(state.params))
    print(f"params: {n_params / 1e6:.2f} M")
    step = make_train_step(cfg)
    t0 = time.time()
    for i in range(args.steps):
        state, metrics = step(state, batch)
        if i == 0:
            print(f"first step (incl. compile): {time.time() - t0:.1f}s")
            t0 = time.time()
        if (i + 1) % 5 == 0 or i == 0:
            print(f"step {i + 1}: loss={float(metrics['loss']):.4f} "
                  f"grad_norm={float(metrics['grad_norm']):.3f}")
    dt = (time.time() - t0) / max(args.steps - 1, 1)
    print(f"steady-state step time: {dt * 1e3:.1f} ms")


if __name__ == "__main__":
    main()
