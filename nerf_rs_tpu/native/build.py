"""Build the native host batch assembler into libnerf_host.so.

Invoked lazily by data/native_loader.py on first use (and cached), or
explicitly: ``python -m nerf_rs_tpu.native.build`` / ``make -C
nerf_rs_tpu/native``.
"""

from __future__ import annotations

import os
import subprocess
import sys

_DIR = os.path.dirname(os.path.abspath(__file__))
SRC = os.path.join(_DIR, "batch_loader.cc")
LIB = os.path.join(_DIR, "libnerf_host.so")


def build(force: bool = False) -> str:
    """Compile if missing/stale; returns the .so path."""
    if (
        not force
        and os.path.exists(LIB)
        and os.path.getmtime(LIB) >= os.path.getmtime(SRC)
    ):
        return LIB
    cmd = [
        "g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-pthread",
        SRC, "-o", LIB,
    ]
    subprocess.run(cmd, check=True, capture_output=True, text=True)
    return LIB


if __name__ == "__main__":
    print(build(force="--force" in sys.argv))
