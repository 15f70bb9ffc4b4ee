#!/usr/bin/env python3
"""Build the native host libraries (C++ via g++; no external deps).

Usage: python native/build.py [--debug]
Produces native/rle/libmaskrle.so, loaded lazily by dmm_net_tpu/ops/rle.py.
"""

import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent


def build_rle(debug: bool = False) -> Path:
    src = ROOT / "rle" / "maskrle.cpp"
    out = ROOT / "rle" / "libmaskrle.so"
    flags = ["-O0", "-g"] if debug else ["-O3", "-march=native"]
    cmd = ["g++", "-std=c++17", "-shared", "-fPIC", *flags,
           str(src), "-o", str(out)]
    print(" ".join(cmd))
    subprocess.run(cmd, check=True)
    return out


def build_loader(debug: bool = False) -> Path:
    src = ROOT / "loader" / "imgloader.cpp"
    out = ROOT / "loader" / "libimgloader.so"
    flags = ["-O0", "-g"] if debug else ["-O3", "-march=native"]
    cmd = ["g++", "-std=c++17", "-shared", "-fPIC", *flags,
           str(src), "-o", str(out), "-ljpeg", "-lpng", "-lpthread"]
    print(" ".join(cmd))
    subprocess.run(cmd, check=True)
    return out


if __name__ == "__main__":
    debug = "--debug" in sys.argv
    for so in (build_rle(debug), build_loader(debug)):
        print(f"built {so}")
