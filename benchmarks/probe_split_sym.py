#!/usr/bin/env python
"""A/B the per-plane sym-split (pallas_pair.plan_groups) at a tiled
pool shape (round-5 verdict #3).

The split is env-gated, and jit caches ignore env changes within a
process, so each arm runs in its own process:

    DEMUX_TPU_SPLIT_SYM=0 python benchmarks/probe_split_sym.py [V] [A]
    DEMUX_TPU_SPLIT_SYM=1 python benchmarks/probe_split_sym.py [V] [A]

Round-5 measurement on v5e at V=32/A=5 (same session, minutes apart):
fast 104,974 (OFF) vs 101,308 (ON) b/s — the split re-streams the t/g
input blocks through a second pallas_call, which costs the
bandwidth-lean f32 kernel more than the saved dots; exact 6,143 (OFF)
vs 6,558 (ON) b/s (+6.8%) — the df kernel is ALU-bound, so the saved
dot3 chains show through. Defaults follow: fast OFF, exact ON.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import bench

    v = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    a = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    r = bench.measure_tpu(v, a, include_xla=False, iters=2)
    print("SPLIT=%s V=%d A=%d: fast %.1f b/s (%.2f ms), "
          "exact %.1f b/s (%.2f ms)"
          % (os.environ.get("DEMUX_TPU_SPLIT_SYM", "<default>"), v, a,
             r["barcodes_per_s"], r["step_ms"],
             r["exact_barcodes_per_s"], r["exact_step_ms"]))


if __name__ == "__main__":
    main()
