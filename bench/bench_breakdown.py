#!/usr/bin/env python3
"""Per-stage cost of the frame step via cumulative-prefix deltas.

Old approach (jit each stage separately) double-counts dispatch latency
and loses cross-stage fusion; relay dispatch overhead also swings 0.5-9 ms
between sessions (ROUND_NOTES r2), drowning sub-ms stages. Instead each
measurement jits a PREFIX of the pipeline (backbone; +match; +aggregate;
+decoder; +resolve = full), all inside one dispatch, and reports deltas —
true fused incremental cost per stage. XLA cost-analysis FLOPs and bytes
deltas are printed alongside (effective GB/s per stage exposes which
stages sit on the HBM roofline).

The DCE guard: every prefix returns reductions of all live outputs, so
the compiler cannot drop earlier stages.
"""

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

    from dmm_net_tpu.config import preset
    from dmm_net_tpu.infer.engine import resolve_labels
    from dmm_net_tpu.models.dmm import DMMNet, _to_mask_grid, mask_hw

    B = int(os.environ.get("BENCH_BATCH", "8"))
    iters = int(os.environ.get("BENCH_ITERS", "30"))
    cfg = preset("p3_multi_object")
    H, W = cfg.model.image_size
    M, N = cfg.matching.max_templates, cfg.matching.max_proposals
    model = DMMNet(cfg)
    # inputs generated ON DEVICE (utils/bench_inputs.py; shared across benches)
    from dmm_net_tpu.utils.bench_inputs import make_frame_inputs
    frame, pm, pv, tf_, tv, state = make_frame_inputs(cfg, B)
    variables = model.init(jax.random.PRNGKey(0), frame, pm, pv, tf_, tv,
                           state)

    def backbone(frame, pm, pv, tf_, tv, state):
        feats = model.apply(variables, frame, method=DMMNet.extract_features)
        return [v.sum() for v in feats.values()]

    def match(frame, pm, pv, tf_, tv, state):
        feats, X = model.apply(variables, frame, pm, pv, tf_, tv, state,
                               method=DMMNet.match_assignment)
        return [v.sum() for v in feats.values()] + [X.sum()]

    def agg(frame, pm, pv, tf_, tv, state):
        feats, X = model.apply(variables, frame, pm, pv, tf_, tv, state,
                               method=DMMNet.match_assignment)
        # aggregate at the config mask grid — the production step under p3
        # (mask_res="stride4") aggregates H/4 x W/4 masks inside
        # decode_from_assignment; full-res pm here would inflate this
        # stage ~16x and understate the (+)decoder delta
        A = DMMNet.aggregate(
            X, _to_mask_grid(pm.astype(state.template_masks.dtype),
                             mask_hw(cfg)), tv)
        return [v.sum() for v in feats.values()] + [X.sum(), A.sum()]

    def decoder(frame, pm, pv, tf_, tv, state):
        out, st = model.apply(variables, frame, pm, pv, tf_, tv, state)
        return out.logits.sum(), st

    def full(frame, pm, pv, tf_, tv, state):
        out, st = model.apply(variables, frame, pm, pv, tf_, tv, state)
        return resolve_labels(out.logits, tv, (H, W),
                              use_pallas=cfg.matching.use_pallas), st

    def dec_prefix(stop):
        # cumulative prefix ENDING inside the decoder (stop_at) — the
        # intra-decoder breakdown (BENCH_DECODER=1). Mirrors
        # decode_from_assignment's aggregate + decoder dispatch.
        def run(m, frame, pm, pv, tf_, tv, state):
            feats, X = m.match_assignment(frame, pm, pv, tf_, tv, state)
            pmg = _to_mask_grid(pm.astype(state.template_masks.dtype),
                                mask_hw(cfg))
            A = m.aggregate(X, pmg, tv)
            out_hw = (mask_hw(cfg) if cfg.model.logits_res == "mask"
                      else (H, W))
            x, st = m.decoder(feats, A, state.decoder_state, out_hw=out_hw,
                              stop_at=stop)
            return x.astype(jnp.float32).sum(), st

        def fn(frame, pm, pv, tf_, tv, state):
            return model.apply(variables, frame, pm, pv, tf_, tv, state,
                               method=run)
        return fn

    args = (frame, pm, pv, tf_, tv, state)
    print(f"B={B} image={H}x{W} M={M} N={N} mask_res={cfg.model.mask_res} "
          f"backend={jax.default_backend()}")
    stages = [("backbone+proj", backbone), ("(+)pool/cost/match", match),
              ("(+)aggregate", agg), ("(+)decoder", decoder),
              ("(+)resolve = FULL", full)]
    if os.environ.get("BENCH_DECODER"):
        # intra-decoder prefixes (models/decoder.py stop_at). The obj
        # stages follow the config's EFFECTIVE per-object pyramid — with
        # decoder_obj_fine_level="c3" (r5 default) the loop stops at
        # stride 8 and an "obj_c2" stop would silently fall through to
        # the full decoder.
        levels = ("c4", "c3", "c2")
        levels = levels[:levels.index(cfg.model.decoder_fine_level) + 1]
        obj_levels = levels
        if cfg.model.decoder_obj_fine_level:
            obj_levels = levels[
                :levels.index(cfg.model.decoder_obj_fine_level) + 1]
        stages = ([("(+)agg", agg)] +
                  [(f"(+)dec.shared_{l}", dec_prefix(f"shared_{l}"))
                   for l in levels[:-1]] +
                  [("(+)dec.shared", dec_prefix("shared")),
                   ("(+)dec.proj", dec_prefix("proj")),
                   ("(+)dec.obj_head", dec_prefix("obj_head")),
                   ("(+)dec.gru", dec_prefix("gru"))] +
                  [(f"(+)dec.obj_{l}", dec_prefix(f"obj_{l}"))
                   for l in obj_levels] +
                  [("(+)dec.out = decoder", decoder)])
    prev = (0.0, 0.0, 0.0)
    for name, fn in stages:
        # Repeat the prefix INSIDE one jit (scan over perturbed inputs):
        # per-dispatch timing is hopeless on the tunnel backend — dispatch
        # overhead swings 0.5-9 ms between sessions and adds to EVERY
        # call (r3 measured the resolve delta at 0.35 ms in-jit while
        # per-dispatch runs said 3-6 ms). The perturbation makes every
        # matcher input iteration-variant so XLA can't hoist stage work.
        def rep(frame, pm, pv, tf_, tv, state, fn=fn):
            def body(c, i):
                e = 1e-6 * i
                out = fn(frame + e, pm * (1.0 + e), pv, tf_ + e, tv, state)
                leaves = jax.tree_util.tree_leaves(out)
                return c + leaves[0].ravel()[0].astype(jnp.float32), 0
            tot, _ = jax.lax.scan(body, jnp.float32(0),
                                  jnp.arange(iters, dtype=jnp.float32))
            return tot

        jrep = jax.jit(rep)
        r = jrep(*args)
        np.asarray(r)   # D2H barrier: block_until_ready can return early
                        # on the tunnel (memory "axon-tpu-tunnel-caveats")
        dt = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(jrep(*args))
            dt = min(dt, (time.perf_counter() - t0) / iters * 1e3)
        # FLOPs/bytes from a single-shot compile: XLA's cost analysis
        # reports a scan body once, not trip_count times, so the scan
        # executable can't provide per-call numbers. (The extra compile
        # is cached across sessions.)
        c = jax.jit(fn).lower(*args).compile().cost_analysis()
        if isinstance(c, list):
            c = c[0]
        fl = float(c.get("flops", 0)) / 1e9
        by = float(c.get("bytes accessed", 0)) / 1e6
        d_dt, d_fl, d_by = dt - prev[0], fl - prev[1], by - prev[2]
        eff = d_by / max(d_dt, 0.05)   # MB/ms == GB/s; clamp: deltas
                                       # under 50us are timing noise
        print(f"{name:20s} {dt:8.3f} ms  (delta {d_dt:7.3f} ms, "
              f"{d_fl:7.2f} GF, {d_by:8.1f} MB, "
              f"{eff:6.0f} GB/s eff = {100 * eff / 819:3.0f}% of v5e HBM)")
        prev = (dt, fl, by)


if __name__ == "__main__":
    main()
