#!/usr/bin/env python
"""Build the UPSTREAM demuxlet binary against validation/htshim.

Compiles the reference sources UNMODIFIED and READ-ONLY from
/root/reference (no reference code is copied into this repository)
against the from-scratch htslib API shim in validation/htshim, producing
a real `demuxlet` executable limited to plain-text SAM/VCF inputs.

The resulting binary is the golden oracle for byte-level output parity:
its .single/.sing2/.pair/.best files come from the reference's own
algorithm code (cmd_cram_demuxlet.cpp, bcf_filtered_reader.cpp,
PhredHelper.cpp, sc_drop_seq.cpp, hts_utils.cpp, ...).

Usage: python validation/build_reference.py [--ref-dir DIR]
Prints the binary path on success; exits nonzero if the reference tree
is unavailable (e.g. outside this sandbox).
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
SHIM = os.path.join(HERE, "htshim")

REF_TUS = [
    "cmd_cram_demuxlet",
    "sc_drop_seq",
    "sam_filtered_reader",
    "bcf_filtered_reader",
    "bcf_chunked_reader",
    "genomeChunk",
    "genome_interval",
    "reference_sequence",
    "tsv_reader",
    "utils",
    "params",
    "Error",
    "PhredHelper",
    "hts_utils",
]
SHIM_TUS = ["shim", "shim_vcf", "shim_bcf", "shim_cram", "filter_stub"]


def build(ref_dir: str = "/root/reference", out_dir: str | None = None) -> str:
    if not os.path.exists(os.path.join(ref_dir, "cmd_cram_demuxlet.cpp")):
        raise FileNotFoundError(f"reference tree not found at {ref_dir}")
    out_dir = out_dir or os.path.join(HERE, "build")
    os.makedirs(out_dir, exist_ok=True)
    exe = os.path.join(out_dir, "demuxlet_ref")

    srcs = [(os.path.join(ref_dir, t + ".cpp"), t) for t in REF_TUS]
    srcs += [(os.path.join(SHIM, t + ".cpp"), t) for t in SHIM_TUS]
    newest = max(
        [os.path.getmtime(s) for s, _ in srcs]
        + [
            os.path.getmtime(os.path.join(SHIM, "htslib", f))
            for f in os.listdir(os.path.join(SHIM, "htslib"))
        ]
    )
    if os.path.exists(exe) and os.path.getmtime(exe) >= newest:
        return exe

    objs = []
    for src, name in srcs:
        obj = os.path.join(out_dir, name + ".o")
        objs.append(obj)
        if os.path.exists(obj) and os.path.getmtime(obj) >= max(
            os.path.getmtime(src), newest - 1e9
        ):
            pass
        subprocess.run(
            ["g++", "-std=c++11", "-O2", "-I", SHIM, "-I", ref_dir,
             "-c", src, "-o", obj],
            check=True,
        )
    subprocess.run(["g++", "-O2"] + objs + ["-o", exe, "-lz"], check=True)
    return exe


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ref-dir", default="/root/reference")
    args = ap.parse_args()
    try:
        print(build(args.ref_dir))
    except FileNotFoundError as e:
        print(str(e), file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
