"""Shared bench helpers.

make_frame_inputs generates the representative frame-step inputs ALL
benches use, ON DEVICE: the full-res proposal tensor alone is hundreds of
MB at the p3 shapes and the tunnel's H2D can drop to 1-2 MB/s, so a
host-numpy version spends minutes uploading before the first measurement
(memory: axon-tpu-tunnel-caveats). One definition keeps bench.py,
bench_e2e.py and bench_breakdown.py measuring identical inputs — a
shape/dtype tweak in one bench must not silently diverge the others.
"""

from __future__ import annotations


def make_frame_inputs(cfg, B: int, seed: int = 0):
    """(frame, prop_masks, prop_valid, tmpl_feats, tmpl_valid, state) for
    one frame step at batch B, generated on the default device.

    init_frame_state owns the carried grid/dtype (mask_res / mask_dtype):
    a hand-built full-res f32 state would differ from the state the step
    returns and recompile inside a timed loop.
    """
    import jax
    import jax.numpy as jnp

    from dmm_net_tpu.models.dmm import init_frame_state

    H, W = cfg.model.image_size
    M, N = cfg.matching.max_templates, cfg.matching.max_proposals
    ks = jax.random.split(jax.random.PRNGKey(seed), 4)
    frame = jax.jit(lambda k: jax.random.uniform(k, (B, H, W, 3)))(ks[0])
    pm = jax.jit(lambda k: (jax.random.uniform(k, (B, N, H, W)) > 0.8)
                 .astype(jnp.float32))(ks[1])
    pv = jnp.ones((B, N), bool)
    tf_ = jax.jit(lambda k: jax.random.normal(
        k, (B, M, cfg.model.feature_dim)))(ks[2])
    tv = jnp.ones((B, M), bool)
    state = init_frame_state(
        cfg, jax.jit(lambda k: (jax.random.uniform(k, (B, M, H, W)) > 0.8)
                     .astype(jnp.float32))(ks[3]))
    return frame, pm, pv, tf_, tv, state
