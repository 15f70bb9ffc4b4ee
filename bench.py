#!/usr/bin/env python3
"""Headline benchmark: end-to-end frames/sec/chip (matching + refine).

Driver contract: prints ONE JSON line
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
plus pinned-config fields (batch, preset, decoder variant, GFLOP/frame,
%-of-bf16-peak) for round-over-round comparability.

Measures the steady-state per-frame inference step of the flagship
ResNet-50 model (multi-object DAVIS config p3: 256x448, M=16 templates,
N=128 proposals, fused Pallas matcher) on the default JAX device — the
BASELINE.json:2 metric "end-to-end frames/sec/chip (matching+refine)".
Proposal generation is excluded, matching the reference's offline-proposal
protocol (SURVEY.md §4.3).

On TPU the session also runs a compiled parity check of the fused Pallas
matcher against the jnp path (interpret-mode tests alone cannot catch
Mosaic lowering bugs — see ROUND_NOTES round 1, the math.powf lesson).

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

# TPU v5e peak: 197 TFLOP/s bf16 (394 int8). Used only for the MFU field.
V5E_BF16_PEAK_FLOPS = 197e12


def main():
    from dmm_net_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from dmm_net_tpu.config import preset
    from dmm_net_tpu.infer.engine import resolve_overlaps
    from dmm_net_tpu.models.dmm import DMMNet, FrameState, decoder_state_dim

    # B=4 batched frames (acceptance config #3 explicitly allows batched
    # frames); bench/bench_e2e.py sweep shows B=4 is the v5e throughput knee.
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
    state = FrameState(
        template_masks=jnp.asarray(rng.rand(B, M, H, W) > 0.8, jnp.float32),
        decoder_state=jnp.zeros((B, M, H // 32, W // 32,
                                 decoder_state_dim(cfg))))
    variables = model.init(jax.random.PRNGKey(0), frame, pm, pv, tf_, tv,
                           state)

    @jax.jit
    def step(frame, pm, pv, tf_, tv, state):
        out, new_state = model.apply(variables, frame, pm, pv, tf_, tv, state)
        return resolve_overlaps(out.logits, tv), new_state

    # ---- compiled Pallas-vs-jnp matcher parity (TPU only) --------------
    parity = None
    if jax.default_backend() == "tpu" and cfg.matching.use_pallas:
        cfg_jnp = cfg.override(**{"matching.use_pallas": False})
        model_jnp = DMMNet(cfg_jnp)

        @jax.jit
        def x_pallas(frame, pm, pv, tf_, tv, state):
            out, _ = model.apply(variables, frame, pm, pv, tf_, tv, state)
            return out.assignment

        @jax.jit
        def x_jnp(frame, pm, pv, tf_, tv, state):
            out, _ = model_jnp.apply(variables, frame, pm, pv, tf_, tv, state)
            return out.assignment

        xa = np.asarray(x_pallas(frame, pm, pv, tf_, tv, state))
        xb = np.asarray(x_jnp(frame, pm, pv, tf_, tv, state))
        parity = float(np.max(np.abs(xa - xb)))
        assert parity < 5e-3, f"compiled Pallas/jnp divergence {parity}"

    labels, state = step(frame, pm, pv, tf_, tv, state)
    jax.block_until_ready(labels)

    iters = int(os.environ.get("BENCH_ITERS", "30"))
    t0 = time.perf_counter()
    for _ in range(iters):
        labels, state = step(frame, pm, pv, tf_, tv, state)
    jax.block_until_ready((labels, state))
    dt = time.perf_counter() - t0
    fps = iters * B / dt

    # ---- MFU: XLA-counted FLOPs per frame vs v5e bf16 peak --------------
    gflop_per_frame = mfu_pct = None
    try:
        cost = step.lower(frame, pm, pv, tf_, tv, state).compile() \
                   .cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        flops = float(cost.get("flops", 0.0))
        if flops > 0:
            gflop_per_frame = flops / B / 1e9
            mfu_pct = 100.0 * flops * fps / B / V5E_BF16_PEAK_FLOPS
    except Exception:
        pass

    print(json.dumps({
        "metric": "end_to_end_frames_per_sec_per_chip_matching_refine",
        "value": round(fps, 3),
        "unit": "frames/sec",
        "vs_baseline": round(fps / REFERENCE_GPU_FPS, 3),
        # pinned context for round-over-round comparability
        "batch": B,
        "preset": cfg.name,
        "image_size": [H, W],
        "M": M, "N": N,
        "decoder_variant": cfg.model.decoder_variant,
        "use_pallas": cfg.matching.use_pallas,
        "pallas_parity_max_abs": parity,
        "gflop_per_frame": None if gflop_per_frame is None
        else round(gflop_per_frame, 2),
        "mfu_pct_bf16_peak": None if mfu_pct is None else round(mfu_pct, 2),
    }))


if __name__ == "__main__":
    main()
