#!/usr/bin/env python3
"""Training CLI (reference train.py equivalent, SURVEY.md §3.1 #1).

Usage:
  python train.py --preset p5_train [--set train.lr=3e-4 data.dataset=synthetic]
                  [--steps 1000] [--resume] [--logdir runs/x]

Builds the dataset stream, initializes or resumes TrainState, runs the
jit'd data-parallel train loop with orbax checkpoints + jsonl metrics.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="p5_train")
    ap.add_argument("--set", nargs="*", default=[],
                    help="dot-path overrides, e.g. train.lr=3e-4")
    ap.add_argument("--steps", type=int, default=None)
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--logdir", default="runs/default")
    ap.add_argument("--data-parallel", type=int, default=0,
                    help="devices on the data axis (0 = all)")
    args = ap.parse_args()

    from dmm_net_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    import jax
    import numpy as np

    from dmm_net_tpu.config import preset
    from dmm_net_tpu.utils.cli import parse_overrides
    from dmm_net_tpu.data.synthetic import synthetic_clip_batch
    from dmm_net_tpu.parallel.mesh import make_mesh
    from dmm_net_tpu.train.loop import create_train_state, train_loop
    from dmm_net_tpu.utils.checkpoint import Checkpointer
    from dmm_net_tpu.utils.logging import MetricsWriter, get_logger

    log = get_logger("train")
    cfg = preset(args.preset).override(**parse_overrides(args.set))
    steps = args.steps or cfg.train.total_steps
    log.info("config %s, %d steps, devices=%s", cfg.name, steps, jax.devices())

    n_data = args.data_parallel or len(jax.devices())
    mesh = make_mesh(data=n_data) if n_data > 1 else None

    # resume discovery must happen before the stream is built so the data
    # pipeline fast-forwards to exactly where the checkpoint left off
    # (deterministic stream position == exact resume, SURVEY.md §6)
    start_step = 0
    ckpt = Checkpointer(os.path.join(args.logdir, "ckpt"))
    if args.resume and ckpt.latest_step() is not None:
        start_step = int(ckpt.latest_step())

    H, W = cfg.model.image_size
    if cfg.data.dataset == "synthetic":
        def batches():
            i = start_step
            while i < steps:
                yield {k: np.asarray(v) for k, v in synthetic_clip_batch(
                    seed=i, batch=cfg.data.batch_size, T=cfg.data.clip_length,
                    H=H, W=W, num_objects=2,
                    num_proposals=cfg.matching.max_proposals,
                    pad_objects=cfg.matching.max_templates).items()}
                i += 1
        if start_step >= steps:
            raise SystemExit(f"nothing to do: resumed at step {start_step} "
                             f">= --steps {steps}")
        stream = batches()
        sample = next(iter(batches()))
    elif cfg.data.dataset == "davis":
        from dmm_net_tpu.data.davis import DavisDataset
        ds = DavisDataset(cfg.data.root, split="train",
                          image_size=cfg.model.image_size,
                          proposal_dir=cfg.data.proposal_dir or None,
                          max_objects=cfg.matching.max_templates,
                          max_proposals=cfg.matching.max_proposals)
        if not ds.sequences:
            raise SystemExit(f"no DAVIS data under {cfg.data.root}")
        # seed offset by the resume step: the RNG stream position is a pure
        # function of the step, so resumed runs see fresh, reproducible data
        gen = ds.clip_batches(cfg.data.batch_size, cfg.data.clip_length,
                              seed=cfg.train.seed + start_step)
        import itertools
        stream = itertools.islice(gen, max(steps - start_step, 0))
        sample = next(ds.clip_batches(cfg.data.batch_size,
                                      cfg.data.clip_length))
    elif cfg.data.dataset == "ytvos":
        from dmm_net_tpu.data.ytvos import YTVOSDataset
        ds = YTVOSDataset(cfg.data.root, split="train",
                          image_size=cfg.model.image_size,
                          proposal_dir=cfg.data.proposal_dir or None,
                          max_objects=cfg.matching.max_templates,
                          max_proposals=cfg.matching.max_proposals)
        if not ds.videos:
            raise SystemExit(f"no YouTube-VOS data under {cfg.data.root}")
        gen = ds.clip_batches(cfg.data.batch_size, cfg.data.clip_length,
                              seed=cfg.train.seed + start_step)
        import itertools
        stream = itertools.islice(gen, max(steps - start_step, 0))
        sample = next(ds.clip_batches(cfg.data.batch_size,
                                      cfg.data.clip_length))
    else:
        raise SystemExit(f"unknown dataset {cfg.data.dataset!r}")

    state = create_train_state(cfg, jax.random.PRNGKey(cfg.train.seed),
                               sample, mesh=mesh)
    if args.resume:
        state = ckpt.restore(state)
        log.info("resumed at step %d", int(state.step))
    writer = MetricsWriter(args.logdir)

    from dmm_net_tpu.data.pipeline import Prefetcher
    from dmm_net_tpu.parallel.mesh import batch_sharding

    if cfg.data.augment:
        from dmm_net_tpu.data.augment import augment_batch
        stream = ({"__seed": i, **b}
                  for i, b in enumerate(stream, start=start_step))

        def load(b):
            seed = b.pop("__seed")
            return augment_batch(b, seed=seed)
    else:
        def load(b):
            return b

    staged = Prefetcher(stream, load, depth=cfg.data.prefetch_depth,
                        sharding=batch_sharding(mesh) if mesh else None)

    state = train_loop(cfg, state, staged, mesh=mesh, writer=writer,
                       checkpointer=ckpt)
    ckpt.save(state)
    ckpt.wait()
    log.info("done at step %d", int(state.step))


if __name__ == "__main__":
    main()
