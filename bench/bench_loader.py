#!/usr/bin/env python3
"""Host image-loading throughput: native C++ pool vs PIL thread loop.

The fps north star (BASELINE.json:5) is won or lost partly in the
decode->HBM pipeline (SURVEY §8.5 #5); this measures the host half.
DAVIS-480p-like JPEGs, decode + resize to the flagship 256x448.

Usage: python bench/bench_loader.py [--files 64] [--threads 8]
"""

import argparse
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--files", type=int, default=64)
    ap.add_argument("--threads", type=int, default=8)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import numpy as np
    from PIL import Image

    from dmm_net_tpu.data import native_loader as nl

    if not nl.available():
        import subprocess
        subprocess.run([sys.executable, os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "native", "build.py")], check=True)
        nl._TRIED = False
        nl._LIB = None

    rng = np.random.RandomState(0)
    with tempfile.TemporaryDirectory() as d:
        paths = []
        for i in range(args.files):
            # smooth 854x480 content, DAVIS-ish JPEG size
            base = (rng.rand(60, 107, 3) * 255).astype(np.uint8)
            img = Image.fromarray(base).resize((854, 480), Image.BILINEAR)
            p = os.path.join(d, f"{i:05d}.jpg")
            img.save(p, quality=90)
            paths.append(p)

        def timed(fn):
            fn()                                     # warm (page cache)
            best = float("inf")
            for _ in range(args.reps):
                t0 = time.perf_counter()
                fn()
                best = min(best, time.perf_counter() - t0)
            return args.files / best

        native_fps = timed(
            lambda: nl.load_rgb_batch(paths, (256, 448),
                                      threads=args.threads))

        def pil_batch():
            out = np.empty((len(paths), 256, 448, 3), np.uint8)
            for i, p in enumerate(paths):
                with Image.open(p) as im:
                    out[i] = np.asarray(
                        im.convert("RGB").resize((448, 256), Image.BILINEAR))
            return out

        pil_fps = timed(pil_batch)

        # PIL under the pipeline's thread pool (GIL-bound comparison)
        from concurrent.futures import ThreadPoolExecutor

        def pil_threaded():
            def one(p):
                with Image.open(p) as im:
                    return np.asarray(
                        im.convert("RGB").resize((448, 256), Image.BILINEAR))
            with ThreadPoolExecutor(args.threads) as ex:
                return list(ex.map(one, paths))

        pil_thr_fps = timed(pil_threaded)

    print(f"files={args.files} 854x480 JPEG -> 256x448 uint8, "
          f"threads={args.threads}, host cores={os.cpu_count()}")
    # NOTE: this environment is a 1-core VM — thread pools cannot beat
    # serial decode here regardless of language. The C++ pool's value is
    # (a) GIL-free decode that doesn't stall data/pipeline.py's staging
    # threads, (b) scaling on real multi-core production hosts.
    print(f"native C++ pool     {native_fps:8.1f} files/s")
    print(f"PIL serial          {pil_fps:8.1f} files/s")
    print(f"PIL thread pool     {pil_thr_fps:8.1f} files/s")
    print(f"speedup vs PIL-threaded: {native_fps / pil_thr_fps:.2f}x")


if __name__ == "__main__":
    main()
