"""Build the native library: ``python -m dig_tpu.native.build``."""
from __future__ import annotations

import os
import subprocess
import sys


def build(verbose: bool = True) -> str:
    here = os.path.dirname(os.path.abspath(__file__))
    src = os.path.join(here, "partition.cpp")
    out = os.path.join(here, "libdig_native.so")
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
           src, "-o", out]
    if verbose:
        print(" ".join(cmd))
    subprocess.check_call(cmd)
    return out


if __name__ == "__main__":
    path = build()
    print(f"built {path}")
    from . import available
    # force a fresh load check in this process
    import dig_tpu.native as native
    native._TRIED = False
    print("loadable:", native.available())
