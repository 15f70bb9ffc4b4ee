#!/usr/bin/env python3
"""Object-into-lanes packing microbench (VERDICT r3 next #3, lever 3).

The SharedFPNDecoder's per-object path convs run at g=16-32 channels —
a fraction of the MXU's 128 lanes (the r3 audit measured the decoder at
~14% MFU with these convs as the bulk of its time). The kernel weights
are SHARED across the M object slots, so the same math admits several
layouts; this bench times them at the exact p3 per-object shapes:

  obj_batch   (B*M, h, w, g)   conv g->g            (shipped layout)
  lane_packed (B, h, w, M*g)   feature_group_count=M (objects fill lanes)
  fat_ref     (B, h, w, M*g)   dense M*g -> M*g      (full-lane ceiling,
                               M x the FLOPs — calibrates what saturated
                               lanes buy; NOT a candidate, just a ruler)

In-jit lax.scan repetition (dispatch noise excluded), bf16 operands,
D2H barrier. Prints one JSON line per (level, g, layout).
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

    B, M = int(os.environ.get("BENCH_BATCH", "8")), 16
    H, W = 256, 448
    reps = int(os.environ.get("BENCH_REPS", "50"))
    dt = jnp.bfloat16

    def timeit(fn, x, *rest):
        # The conv INPUT must depend on the carry, or XLA's while-loop
        # LICM hoists the whole conv out of the scan (first version of
        # this bench measured fat_ref at 849 "TF/s" — 4x over v5e peak —
        # because only the output sum was carry-coupled).
        @jax.jit
        def rep(x, *a):
            def body(c, _):
                out = fn(x + c.astype(x.dtype), *a)
                return out.astype(jnp.float32).mean() * 1e-12, None
            tot, _ = jax.lax.scan(body, jnp.float32(0), None, length=reps)
            return tot
        np.asarray(rep(x, *rest))              # compile + warm
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(rep(x, *rest))
            best = min(best, (time.perf_counter() - t0) / reps * 1e3)
        return best

    def conv(x, k, groups=1):
        return jax.lax.conv_general_dilated(
            x, k, (1, 1), "SAME", feature_group_count=groups,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def blockdiag(k_g, n):
        """(3,3,g,g) -> (3,3,n*g,n*g) block-diagonal numpy kernel."""
        k_g = np.asarray(k_g, np.float32)
        g = k_g.shape[2]
        k = np.zeros((3, 3, n * g, n * g), np.float32)
        for i in range(n):
            k[:, :, i * g:(i + 1) * g, i * g:(i + 1) * g] = k_g
        return k

    rng = np.random.RandomState(0)
    for stride in (4, 8, 32):
        h, w = H // stride, W // stride
        for g in (16, 32):
            flops = 2 * B * M * h * w * 9 * g * g      # the real math
            x_bm = jnp.asarray(rng.randn(B * M, h, w, g), dt)
            k_g = jnp.asarray(rng.randn(3, 3, g, g) * 0.1, dt)
            x_pk = jnp.asarray(np.asarray(x_bm, np.float32)
                               .reshape(B, M, h, w, g)
                               .transpose(0, 2, 3, 1, 4)
                               .reshape(B, h, w, M * g), dt)
            # grouped kernel: (3, 3, g, M*g) with group i's slice = k_g
            k_pk = jnp.asarray(np.tile(np.asarray(k_g, np.float32),
                                       (1, 1, 1, M)), dt)
            # pack128: k = 128//g objects per group -> per-group channels
            # saturate the 128 MXU lanes; kernel is block-diagonal inside
            # each group, so the math is IDENTICAL to obj_batch (the
            # off-block FLOPs multiply zeros) — checkpoint-compatible.
            kobj = max(128 // g, 1)
            G = M // kobj
            bd = blockdiag(k_g, kobj)                      # (3,3,kg,kg)
            k_128 = jnp.asarray(np.concatenate([bd] * G, axis=3), dt)
            # fat_masked: ONE dense (M*g -> M*g) conv, block-diagonal
            # kernel — same math, M x the (mostly-zero) FLOPs, full lanes.
            k_fm = jnp.asarray(blockdiag(k_g, M), dt)
            k_fat = jnp.asarray(rng.randn(3, 3, M * g, M * g) * 0.01, dt)

            # rowfold: objects into the ROW axis with one zero separator
            # row per object — (B*M, h, w, g) -> (B, M*(h+1), w, g).
            # A 3x3 SAME conv sees zeros across the seam exactly like its
            # own zero padding, so slicing each object's h rows back out
            # is EXACT math; batch drops 256 -> 16 (tests whether the
            # flat-vs-stride conv times are per-batch-element overhead).
            x_rf = jnp.asarray(
                np.pad(np.asarray(x_bm, np.float32).reshape(B, M, h, w, g),
                       ((0, 0), (0, 0), (0, 1), (0, 0), (0, 0)))
                .reshape(B, M * (h + 1), w, g), dt)

            # one-time numerics check: packed layouts == obj_batch
            ref = np.asarray(conv(x_bm, k_g), np.float32)
            ref_pk = (ref.reshape(B, M, h, w, g).transpose(0, 2, 3, 1, 4)
                      .reshape(B, h, w, M * g))
            for nm, out in (("lane_packed", conv(x_pk, k_pk, groups=M)),
                            ("pack128", conv(x_pk, k_128, groups=G)),
                            ("fat_masked", conv(x_pk, k_fm))):
                err = np.max(np.abs(np.asarray(out, np.float32) - ref_pk))
                assert err < 0.15, (nm, stride, g, err)   # bf16 conv tol
            out_rf = np.asarray(conv(x_rf, k_g), np.float32) \
                .reshape(B, M, h + 1, w, g)[:, :, :h] \
                .reshape(B * M, h, w, g)
            err = np.max(np.abs(out_rf - ref))
            assert err < 0.15, ("rowfold", stride, g, err)

            rows = [
                ("obj_batch", timeit(lambda a: conv(a, k_g), x_bm), flops),
                ("lane_packed",
                 timeit(lambda a: conv(a, k_pk, groups=M), x_pk), flops),
                ("pack128",
                 timeit(lambda a: conv(a, k_128, groups=G), x_pk),
                 flops * kobj),
                ("fat_masked", timeit(lambda a: conv(a, k_fm), x_pk),
                 flops * M),
                ("fat_ref", timeit(lambda a: conv(a, k_fat), x_pk),
                 flops * M),
                ("rowfold", timeit(lambda a: conv(a, k_g), x_rf),
                 flops),
            ]
            for name, ms, fl in rows:
                print(json.dumps({
                    "level": f"stride{stride}", "g": g, "layout": name,
                    "ms": round(ms, 4),
                    "eff_tflops": round(fl / (ms / 1e3) / 1e12, 2),
                }))


if __name__ == "__main__":
    main()
