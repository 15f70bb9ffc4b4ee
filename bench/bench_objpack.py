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

    def timeit(fn, *args):
        @jax.jit
        def rep(*a):
            def body(c, _):
                out = fn(*a)
                # data-dependent perturbation defeats loop-invariant hoisting
                return c + out.astype(jnp.float32).sum(), None
            tot, _ = jax.lax.scan(body, jnp.float32(0), None, length=reps)
            return tot
        np.asarray(rep(*args))                 # compile + warm
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(rep(*args))
            best = min(best, (time.perf_counter() - t0) / reps * 1e3)
        return best

    def conv(x, k, groups=1):
        return jax.lax.conv_general_dilated(
            x, k, (1, 1), "SAME", feature_group_count=groups,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    rng = np.random.RandomState(0)
    for stride in (4, 8):
        h, w = H // stride, W // stride
        for g in (16, 32):
            flops = 2 * B * M * h * w * 9 * g * g      # the real math
            x_bm = jnp.asarray(rng.randn(B * M, h, w, g), dt)
            k_g = jnp.asarray(rng.randn(3, 3, g, g) * 0.1, dt)
            x_pk = jnp.asarray(x_bm.reshape(B, M, h, w, g)
                               .transpose(0, 2, 3, 1, 4)
                               .reshape(B, h, w, M * g))
            # grouped kernel: (3, 3, g, M*g) with group i's slice = k_g
            k_pk = jnp.asarray(np.tile(np.asarray(k_g), (1, 1, 1, M)), dt)
            k_fat = jnp.asarray(rng.randn(3, 3, M * g, M * g) * 0.01, dt)

            rows = [
                ("obj_batch", timeit(lambda a: conv(a, k_g), x_bm), flops),
                ("lane_packed",
                 timeit(lambda a: conv(a, k_pk, groups=M), x_pk), flops),
                ("fat_ref", timeit(lambda a: conv(a, k_fat), x_pk),
                 flops * M),
            ]
            for name, ms, fl in rows:
                print(json.dumps({
                    "level": f"stride{stride}", "g": g, "layout": name,
                    "ms": round(ms, 4),
                    "eff_tflops": round(fl / (ms / 1e3) / 1e12, 2),
                }))


if __name__ == "__main__":
    main()
