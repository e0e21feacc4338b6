"""Append-only JSONL records for bench/e2e runs (VERDICT r2 #8).

The sandbox's host-load-dependent variance (README "e2e ranges": the VM's
overcommitted host memory swings host phases ~10x) makes single prose
numbers useless for regression tracking. Every e2e/bench run appends one
machine-readable line here instead, carrying the load condition alongside
the timings, so later rounds can diff like-for-like runs.

Usage:
    from benchmarks.record import record
    record("benchmarks/E2E_RUNS.jsonl", {...})
"""

from __future__ import annotations

import json
import os
import time


def load_condition() -> dict:
    """Snapshot the host-load facts that explain sandbox variance."""
    out: dict = {}
    try:
        with open("/proc/loadavg") as fh:
            out["loadavg_1m"] = float(fh.read().split()[0])
    except OSError:
        pass
    try:
        mem = {}
        with open("/proc/meminfo") as fh:
            for line in fh:
                k, v = line.split(":", 1)
                mem[k] = int(v.strip().split()[0])
        out["mem_available_gb"] = round(mem.get("MemAvailable", 0) / 2**20, 2)
        out["mem_total_gb"] = round(mem.get("MemTotal", 0) / 2**20, 2)
    except OSError:
        pass
    return out


def record(path: str, obj: dict) -> dict:
    """Append obj (+ timestamp + load condition) as one JSON line."""
    row = dict(obj)
    row.setdefault("ts", time.strftime("%Y-%m-%dT%H:%M:%S"))
    row.setdefault("load", load_condition())
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "a") as fh:
        fh.write(json.dumps(row) + "\n")
    return row
