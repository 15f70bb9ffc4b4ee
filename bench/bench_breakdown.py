#!/usr/bin/env python3
"""Per-stage timing of the frame step at the bench config (B=4):
backbone, pool+cost+match, aggregation, decoder, overlap-argmax.
Each stage is jitted separately (upper bound: fusion across stages is lost),
so treat as relative weight, not exact latency."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, iters=30):
    import jax
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    from dmm_net_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from dmm_net_tpu.config import preset
    from dmm_net_tpu.infer.engine import resolve_overlaps
    from dmm_net_tpu.models.dmm import DMMNet, FrameState, decoder_state_dim

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
    st = FrameState(
        template_masks=jnp.asarray(rng.rand(B, M, H, W) > 0.8, jnp.float32),
        decoder_state=jnp.zeros((B, M, H // 32, W // 32,
                                 decoder_state_dim(cfg))))
    variables = model.init(jax.random.PRNGKey(0), frame, pm, pv, tf_, tv, st)

    extract = jax.jit(lambda f: model.apply(variables, f,
                                            method=DMMNet.extract_features))
    feats = extract(frame)

    pool = jax.jit(lambda fe, m: model.apply(variables, fe, m,
                                             method=DMMNet.pool_mask_features))
    pf = pool(feats, pm)

    match = jax.jit(lambda tm, p, tfeat, pfeat: model.apply(
        variables, tm, p, tfeat, pfeat, tv, pv, method=DMMNet.match_step))
    X = match(st.template_masks, pm, tf_, pf)

    agg = jax.jit(lambda x, p: DMMNet.aggregate(x, p, tv))
    A = agg(X, pm)

    dec = jax.jit(lambda fe, a, s: model.apply(
        variables, fe, a, s, method=lambda m, *args: m.decoder(*args)))
    logits, _ = dec(feats, A, st.decoder_state)

    res = jax.jit(lambda lg: resolve_overlaps(lg, tv))

    full = jax.jit(lambda f, p, v, t, tvv, s: model.apply(
        variables, f, p, v, t, tvv, s))

    stages = {
        "backbone+proj": (extract, (frame,)),
        "mask pooling": (pool, (feats, pm)),
        "cost+match": (match, (st.template_masks, pm, tf_, pf)),
        "aggregation": (agg, (X, pm)),
        "decoder": (dec, (feats, A, st.decoder_state)),
        "argmax": (res, (logits,)),
        "FULL step": (full, (frame, pm, pv, tf_, tv, st)),
    }
    print(f"B={B} image={H}x{W} M={M} N={N} backend={jax.default_backend()}")
    for name, (fn, args) in stages.items():
        t = timeit(fn, *args)
        print(f"{name:16s} {t * 1e3:8.3f} ms")


if __name__ == "__main__":
    main()
