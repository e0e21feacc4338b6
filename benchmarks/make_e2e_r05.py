#!/usr/bin/env python
"""Assemble E2E_r05.json from the round's recorded runs.

Pulls every round-5 e2e row from benchmarks/E2E_RUNS.jsonl (plus the
probe_e2e_overhead evidence pasted below), keeps the best warm engine
number per (mode, profile) WITH its link condition, and writes the
ceiling accounting. Honest-reporting rules: every rate carries the
link-bandwidth probe measured in the same run; the relay drifted
9-77 MB/s across round-5 windows (CLAUDE.md), so cross-run comparisons
without conditions are meaningless.
"""
import json
import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))


def main():
    rows = []
    with open(os.path.join(HERE, "E2E_RUNS.jsonl")) as fh:
        for line in fh:
            try:
                r = json.loads(line)
            except Exception:
                continue
            if "profile" in r:  # round-5 schema
                rows.append(r)
    best = {}
    for r in rows:
        key = (r["mode"], r["profile"])
        passes = r.get("phases_s", {}).get("engine_passes") or [
            r["phases_s"]["engine"]]
        warm = min(passes)
        ent = {
            "warm_engine_s": warm,
            "warm_bps": round(r["cells"] / warm, 1),
            "bytes_per_barcode": r["transport"]["bytes_per_barcode"],
            "h2d_link_MBps": r["transport"]["h2d_link_MBps"],
            "ceiling_here_bps": r["transport"]["ceiling_here_bps"],
            "ceiling_pcie8GBps_bps": r["transport"][
                "ceiling_pcie8GBps_bps"],
            "engine_parts": r["phases_s"].get("engine_parts"),
            "wire_cfg": r.get("wire_cfg"),
        }
        if key not in best or ent["warm_bps"] > best[key]["warm_bps"]:
            best[key] = ent
    out = {
        "metric": "e2e_demux_barcodes_per_s",
        "round": 5,
        "cells": 100000,
        "baseline_bps": 213.6,
        "probe_e2e_overhead_best": {
            # benchmarks/probe_e2e_overhead.py at 102,400 cells, uniform
            # profile, best warm run per mode across round-5 windows
            # (raw runs in the session logs; windows drifted 9-82 MB/s)
            "fast": {"warm_s": 7.02, "warm_bps": 14597.1,
                     "warm_ms_per_block": 140.4, "vs_baseline": 68.3},
            "exact": {"warm_s": 7.28, "warm_bps": 14056.4,
                      "warm_ms_per_block": 145.6, "vs_baseline": 65.8},
            "worst_window_same_code": {
                "fast_warm_bps": 3597.6, "exact_warm_bps": 5531.8},
            "round4_best_for_reference": {
                "fast_warm_bps": 9891.4, "exact_warm_bps": 12103.4},
        },
        "realistic_baseline_note": (
            "vs_baseline for the realistic profile uses the uniform "
            "workload's C++ rate (213.6 b/s); realistic cells carry "
            "~2.4x the observations (1,214 obs + deep UMIs vs 1,000x2), "
            "so the reference would run correspondingly slower there — "
            "the printed multiples are conservative"),
        "best_by_mode_profile": {
            f"{m}/{p}": v for (m, p), v in sorted(best.items())
        },
        "wire_v2": {
            "uniform_bytes_per_barcode": {"v1": 3151.1, "v2": 2621.2},
            "realistic_bytes_per_barcode": {
                "v1_projected": "34-266 KB/cell (dense U-lane planes at "
                                "the deep-UMI block maxima)",
                "v2": 5168.3,
            },
            "uniform_floor_note": (
                "the uniform synthetic has no sentinel waste (exactly 2 "
                "UMIs/slot, BQ uniform over 28 values): its information "
                "content is 2 codes x log2(56) + 1 delta x ~6.2 bits "
                "= ~17.8 bits/slot = ~2.28 KB/barcode, so v2's 2.62 KB "
                "sits ~15% above the entropy floor for this workload"),
        },
        "conditions_note": (
            "the tunneled relay's H2D bandwidth drifted 9-77 MB/s across "
            "round-5 measurement windows (each row carries its own "
            "same-run probe); round-4's 70-88 MB/s windows were never "
            "available this round, so warm rates are not comparable "
            "across rounds without the link column"),
        "north_star_status": (
            "in-sandbox >=100x requires ~21.4K b/s warm; the v2-wire "
            "transport ceiling at an 80 MB/s window is 80e6/2621 = "
            "30.5K b/s = 143x, and the per-block model (H2D 67 ms + "
            "~30 ms relay fixed + ~35 ms device step = ~132 ms -> "
            "15.5K b/s = 73x) MATCHES the best measured window "
            "(140.4 ms/block, 14,597 b/s = 68x). The residual gap to "
            "100x in this sandbox is the relay's ~30 ms fixed "
            "per-transfer cost plus the serialized H2D/compute (both "
            "environment properties; overlap and coalescing are "
            "measured dead ends, CLAUDE.md), not wire volume or host "
            "work (prep is ~5 s/100K across 4 threads). On a PCIe "
            "host the pipeline is full-device-step-bound at ~158K b/s "
            "(~740x)."),
    }
    path = os.environ.get("E2E_R05", "/root/repo/E2E_r05.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out, indent=1)[:2000])


if __name__ == "__main__":
    main()
