"""Build the native host library (native/warp.cc -> native/libvgm_host.so).

Plain g++ (no cmake/bazel needed for one TU):
    python tools/build_native.py
"""

import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = os.path.join(ROOT, "native", "warp.cc")
OUT = os.path.join(ROOT, "native", "libvgm_host.so")


def build(verbose: bool = True) -> str:
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
           SRC, "-o", OUT]
    if verbose:
        print(" ".join(cmd))
    subprocess.run(cmd, check=True)
    return OUT


if __name__ == "__main__":
    build()
    print(f"built {OUT}")
    sys.exit(0)
