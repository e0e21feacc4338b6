"""Build the native ingest shared library.

Usage: python demuxlet_tpu/native/build.py
Produces _ingest.so next to this file; the package falls back to the pure
Python ingest when the library is absent or fails to load.
"""

from __future__ import annotations

import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
SRC = os.path.join(HERE, "ingest.cpp")
OUT = os.path.join(HERE, "_ingest.so")


def build(force: bool = False) -> str:
    if (
        not force
        and os.path.exists(OUT)
        and os.path.getmtime(OUT) >= os.path.getmtime(SRC)
    ):
        return OUT
    cmd = [
        "g++",
        "-O2",
        "-march=native",
        "-std=c++17",
        "-shared",
        "-fPIC",
        "-o",
        OUT,
        SRC,
        "-lz",
        "-llzma",
        "-lpthread",
        "-ldl",
    ]
    subprocess.run(cmd, check=True)
    return OUT


if __name__ == "__main__":
    path = build(force="--force" in sys.argv)
    print(path)
