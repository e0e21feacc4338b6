#!/usr/bin/env python
"""End-of-round benchmark: pair-search barcodes/s vs single-thread C++.

Workload (BASELINE.json config 4/5 shape): doublet pair search over V=8
samples x A=5 alpha grid, 1024 covered SNPs per barcode, 2 UMIs per
(barcode, SNP), 8192 distinct SNPs.

Baseline: bench/ref_pairsearch.cpp — a from-scratch single-thread C++
replica of the reference's pass-2 loop nest (cmd_cram_demuxlet.cpp:542-709),
measured on this machine (the reference publishes no numbers, BASELINE.md).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "barcodes/s", "vs_baseline": N, ...}
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, ROOT)

# Workload parameters (match C++ baseline exactly).
S_PER_CELL = 1024
UMIS_PER_SNP = 2
NV = 8        # headline shape; extra rows bench other (V, A) below
NALPHA = 5
NSNPS = 8192
CAP_BQ = 40

# extra workload rows (fast + exact-df only): the tutorial jurkat/293T
# shape (V=2, default [0, .5] grid) and the large-pool shapes the tiled
# kernels unlock. Each costs ~2 compiles + short runs on the real chip.
EXTRA_SHAPES = [(2, 2), (16, 5), (32, 2), (32, 5), (64, 2)]

BASE_CELLS = int(os.environ.get("BENCH_BASE_CELLS", "256"))
TPU_BLOCK = int(os.environ.get("BENCH_TPU_BLOCK", "2048"))
TPU_ITERS = int(os.environ.get("BENCH_TPU_ITERS", "8"))
SLOT_CHUNK = int(os.environ.get("BENCH_SLOT_CHUNK", "128"))
DTYPE_NAME = os.environ.get("BENCH_DTYPE", "f64")


def measure_cpp_baseline(nv: int = NV, nalpha: int = NALPHA,
                         cells: int = BASE_CELLS) -> float:
    """Compile + run the single-thread C++ replica; returns barcodes/s.

    Best of two runs — the baseline deserves its peak rate on a possibly
    contended host."""
    exe = os.path.join(ROOT, "bench", "ref_pairsearch")
    src = os.path.join(ROOT, "bench", "ref_pairsearch.cpp")
    if not os.path.exists(exe) or os.path.getmtime(exe) < os.path.getmtime(src):
        subprocess.run(
            ["g++", "-O2", "-march=native", "-o", exe, src, "-lm"],
            check=True,
        )
    best = 0.0
    for _ in range(2):
        out = subprocess.run(
            [
                exe,
                str(cells),
                str(S_PER_CELL),
                str(UMIS_PER_SNP),
                str(nv),
                str(nalpha),
                str(NSNPS),
            ],
            check=True,
            capture_output=True,
            text=True,
        )
        best = max(best, float(json.loads(out.stdout)["barcodes_per_s"]))
    return best


def _synth_block(B: int, rng: np.random.Generator, nv: int = NV):
    """Synthetic slot tensors matching the C++ baseline's workload.

    Returns (cnt, msk, gps, gp0, codes): dense counts for the XLA kernels
    and the equivalent per-UMI codes for the codes-path kernels."""
    nq = CAP_BQ + 1
    nb = 2 * nq
    codes = np.zeros((B, S_PER_CELL, UMIS_PER_SNP), dtype=np.uint8)
    cnt = np.zeros((B, S_PER_CELL, nb), dtype=np.int32)
    # UMIS_PER_SNP observations per slot: random allele x qual in [13, 40]
    for u in range(UMIS_PER_SNP):
        al = rng.integers(0, 2, size=(B, S_PER_CELL))
        bq = rng.integers(13, CAP_BQ + 1, size=(B, S_PER_CELL))
        codes[:, :, u] = (al * nq + bq).astype(np.uint8)
        np.add.at(
            cnt.reshape(B * S_PER_CELL, nb),
            (np.arange(B * S_PER_CELL), (al * nq + bq).ravel()),
            1,
        )
    msk = np.ones((B, S_PER_CELL), dtype=bool)
    gps = rng.dirichlet(np.ones(3), size=(B, S_PER_CELL, nv))
    gp0 = gps.mean(axis=2)
    return cnt, msk, gps, gp0, codes


def measure_tpu(nv: int = NV, nalpha: int = NALPHA,
                include_xla: bool = True, block: int = TPU_BLOCK,
                iters: int = TPU_ITERS) -> dict:
    """Pair-search throughput, fast (f32 Pallas) and exact (df32 Pallas /
    f64 XLA) modes at an (nv, nalpha) workload shape.

    Timing protocol: inputs device-resident, each timed iteration chains a
    scalar reduction consumed on host — on the tunneled axon backend,
    block_until_ready does not synchronize and full-tensor readback costs
    ~100ms/MB, so a scalar round trip is the honest completion barrier.
    """
    import jax

    from demuxlet_tpu.utils.jaxcfg import enable_compilation_cache

    enable_compilation_cache()
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from demuxlet_tpu.models.likelihood import pair_llks
    from demuxlet_tpu.ops import luts
    from demuxlet_tpu.ops.pallas_pair import (
        dedup_channels,
        pack_block,
        pair_llks_pallas,
    )

    grid = np.linspace(0.0, 0.5, nalpha).tolist()
    w = luts.pair_lut(grid, CAP_BQ)
    cols, expand = dedup_channels(grid)
    rng = np.random.default_rng(0)
    cnt, msk, gps, gp0, codes = _synth_block(block, rng, nv)

    def timeit(fn, *args, iters):
        """Two-point protocol: time `iters` and `2*iters` async-queued
        calls, each closed by a scalar round trip; the difference cancels
        the tunnel's fixed sync cost (~30 ms/readback on axon), which at
        small iteration counts otherwise inflates per-step time by
        30/iters ms."""

        def run(n):
            t0 = time.time()
            for _ in range(n):
                out = fn(*args)
            float(out)  # scalar round trip = completion barrier
            return time.time() - t0

        out = fn(*args)
        float(out)  # compile + settle
        run(iters)  # warm the dispatch path
        # the relay's throughput drifts minute to minute; a single
        # two-point pair is a noisy difference estimator, so take the
        # median of three pairs (min would bias a difference low)
        ests = []
        for _ in range(3):
            t1 = run(iters)
            t2 = run(2 * iters)
            dt = (t2 - t1) / iters
            # noise guard: never report faster than the raw 2N-run
            # average could justify (dt <= 0 => raw avg)
            ests.append(dt if dt > 0 else t2 / (2 * iters))
        ests.sort()
        return ests[1]

    # ---- fast mode: f32 Pallas kernel (production config: channel-deduped
    # mixture table, pallas_pair.dedup_channels)
    cnt_t, gps_t, wt = pack_block(cnt, msk, gps, w)
    wt = wt[:, list(cols)]
    cnt_d = jax.device_put(jnp.asarray(cnt_t))
    gps_d = jax.device_put(jnp.asarray(gps_t))
    wt_d = jax.device_put(jnp.asarray(wt))
    interpret = jax.default_backend() != "tpu"

    @jax.jit
    def fast_step(cnt_t, gps_t, wt):
        ab, z0 = pair_llks_pallas(
            cnt_t, gps_t, wt, nalpha, nv, interpret=interpret,
            a0_sep=True, sym_a=nalpha - 1, expand=expand,
        )
        return jnp.sum(ab) + jnp.sum(z0)

    dt_fast = timeit(fast_step, cnt_d, gps_d, wt_d, iters=iters)

    # ---- exact mode: f64 XLA kernels (byte-parity path); skipped for the
    # extra workload rows (its device_put alone ships ~86 MB over the
    # tunneled link)
    dt_exact, nexact = None, max(64, block // 8)
    if include_xla:
        cnt_e = jax.device_put(jnp.asarray(cnt[:nexact]))
        msk_e = jax.device_put(jnp.asarray(msk[:nexact]))
        gps_e = jax.device_put(jnp.asarray(gps[:nexact]))
        gp0_e = jax.device_put(jnp.asarray(gp0[:nexact]))
        w_d = jax.device_put(jnp.asarray(w))

        @jax.jit
        def exact_step(cnt, msk, gps, gp0, w):
            ab, z0 = pair_llks(
                cnt, msk, gps, gp0, w, nalpha, slot_chunk=SLOT_CHUNK,
                dtype=jnp.float64,
            )
            return jnp.sum(ab) + jnp.sum(z0)

        dt_exact = timeit(exact_step, cnt_e, msk_e, gps_e, gp0_e, w_d,
                          iters=2)

    # ---- exact mode, production TPU path: df32 (double-single f32)
    # Pallas kernel (ops/pallas_pair_exact.py), same workload as fast
    from demuxlet_tpu.models.engine import compute_gp0
    from demuxlet_tpu.ops import pallas_pair_exact as PE
    from demuxlet_tpu.ops.luts import singlet_lut

    # per-slot gps in the bench are per-(cell,slot); the engine path uses a
    # SNP table + idx gather -- emulate with an identity-style table
    NSNP = 4096
    table_gps = rng.dirichlet(np.ones(3), size=(NSNP, nv))
    table_gp0 = compute_gp0(table_gps)
    idx = rng.integers(0, NSNP, size=(block, S_PER_CELL)).astype(np.int32)
    gps_pair, gp0_pair, tabs, meta = PE.split_tables(
        table_gps, table_gp0, w, singlet_lut(CAP_BQ)
    )
    dev = lambda pair: tuple(jax.device_put(jnp.asarray(x)) for x in pair)
    codes_d = jax.device_put(jnp.asarray(codes))
    idx_d = jax.device_put(jnp.asarray(idx))
    msk_d = jax.device_put(jnp.asarray(msk))
    gps_p, gp0_p, tabs_p = map(dev, (gps_pair, gp0_pair, tabs))

    @jax.jit
    def exact_df_step(codes, idx, msk, gps_p, gp0_p, tabs_p):
        llk, llk0, ab, z0 = PE.demux_block_exact_impl(
            codes, idx, msk, gps_p, gp0_p, tabs_p, meta,
            nalpha, nv, interpret=interpret, a0_zero=True,
            sym_a=nalpha - 1,
        )
        return (jnp.sum(ab[0]) + jnp.sum(ab[1]) + jnp.sum(llk[0])
                + jnp.sum(z0[0]))

    dt_exact_df = timeit(
        exact_df_step, codes_d, idx_d, msk_d, gps_p, gp0_p, tabs_p,
        iters=max(2, iters // 2),
    )

    # ---- roofline accounting for the exact df32 kernel: analytic f32 op
    # model mirroring _pair_kernel_df's structure (df mul ~15 ops via the
    # Veltkamp split, df add ~13, dot3 = 3 mul + 2 add; a0_sep separable
    # alpha=0 plane, sym_a mirrored alpha=0.5 plane). The result lands at
    # the v5e VPU's practical f32 ceiling — the exact kernel is ALU-bound;
    # further gains need op-count algebra, not scheduling.
    DF_MUL, DF_ADD = 15, 13
    DOT3 = 3 * DF_MUL + 2 * DF_ADD
    n_acc_est = (
        nv * nv * (nalpha - 1) - nv * (nv - 1) // 2  # ab minus sym mirrors
        + (nalpha - 1)                               # m0
        + (nv + 1)                                   # pass-1
        + 2 * nv + 2                                 # separable a0 factors
    )
    u_stage_df = nv * ((nalpha - 1) * 3 + 1) * DOT3
    inner_df = (nv * nv * (nalpha - 1) - nv * (nv - 1) // 2) * DOT3
    acc_df = n_acc_est * (DF_MUL + 8)
    misc_df = (nv + 1) * DOT3 + (nalpha - 1) * DOT3 + nv * 2 * DF_ADD
    exact_ops_slot = u_stage_df + inner_df + acc_df + misc_df
    exact_vpu_gflops = (
        exact_ops_slot * block * S_PER_CELL / dt_exact_df / 1e9
    )

    # ---- roofline accounting for the fast kernel (VERDICT r1 #6):
    # analytic per-(cell,slot) op counts; transcendental logs excluded
    # from the FLOP tally (VPU log is multi-op; counted separately).
    u_stage = nv * nalpha * 3 * 5          # 3 mul + 2 add per U entry
    inner_stage = nv * nv * nalpha * 6     # 3 mul + 2 add + 1 acc add
    bg_stage = nalpha * (15 + 6) + 3 * nv  # llk00 + g0 mean
    vpu_flops_slot = u_stage + inner_stage + bg_stage
    n_logs_slot = nv * nv * nalpha + nalpha
    mxu_front_slot = 2 * (2 * (CAP_BQ + 1)) * len(cols)  # cnt @ W (deduped)
    cells_slots = block * S_PER_CELL
    fast_vpu_gflops = vpu_flops_slot * cells_slots / dt_fast / 1e9
    fast_logs_gops = n_logs_slot * cells_slots / dt_fast / 1e9
    fast_mxu_gflops = mxu_front_slot * cells_slots / dt_fast / 1e9

    return {
        "barcodes_per_s": block / dt_fast,
        "step_ms": dt_fast * 1e3,
        "exact_barcodes_per_s": block / dt_exact_df,
        "exact_step_ms": dt_exact_df * 1e3,
        "exact_xla_f64_barcodes_per_s": (
            nexact / dt_exact if dt_exact else None
        ),
        "exact_vpu_gflops": exact_vpu_gflops,
        "fast_vpu_gflops": fast_vpu_gflops,
        "fast_log_gops": fast_logs_gops,
        "fast_mxu_front_gflops": fast_mxu_gflops,
        "platform": jax.devices()[0].platform,
        "dtype": "f32-fast",
    }


def _extra_rows() -> list:
    """Bench rows beyond the headline V=8/A=5 shape: the tutorial V=2
    (jurkat/293T, default [0,.5] grid) and the large pools (V=16-64) the
    pair-tiled kernels serve. Fast + exact-df only (the XLA f64 row's
    device_put alone ships ~86 MB over the tunnel); fewer iters. A row
    that fails records the error instead of killing the headline bench."""
    rows = []
    for nv, nalpha in EXTRA_SHAPES:
        row = {"workload": f"V={nv} A={nalpha} S/cell={S_PER_CELL} "
                           f"umis/slot={UMIS_PER_SNP}"}
        try:
            # C++ baseline cells scaled down for the V^2 cost (and its
            # nsnps*nv^2*9 f64 gpAB: 2.4 GB at V=64)
            cells = BASE_CELLS if nv <= 16 else 32
            base = measure_cpp_baseline(nv, nalpha, cells=cells)
            t = measure_tpu(nv, nalpha, include_xla=False,
                            iters=max(2, TPU_ITERS // 4))
            row.update(
                barcodes_per_s=round(t["barcodes_per_s"], 1),
                step_ms=round(t["step_ms"], 2),
                exact_barcodes_per_s=round(t["exact_barcodes_per_s"], 1),
                exact_step_ms=round(t["exact_step_ms"], 2),
                baseline_cpp_barcodes_per_s=round(base, 1),
                vs_baseline=round(t["barcodes_per_s"] / base, 2),
            )
        except Exception as e:  # noqa: BLE001 — record, don't kill
            row["error"] = f"{type(e).__name__}: {e}"[:300]
        rows.append(row)
    return rows


def _backend_alive(timeout_s: float) -> bool:
    """Bounded backend-init probe: a dead relay otherwise hangs the
    first device op forever (observed when the axon tunnel went down
    mid-round-5). Runs jax.devices() on a daemon thread."""
    import threading

    ok = {}

    def _probe():
        try:
            import jax

            ok["devices"] = jax.devices()
        except Exception as e:  # noqa: BLE001
            ok["err"] = str(e)

    t = threading.Thread(target=_probe, daemon=True)
    t.start()
    t.join(timeout=timeout_s)
    return "devices" in ok


def main():
    base = measure_cpp_baseline()
    timeout_s = float(os.environ.get("BENCH_BACKEND_TIMEOUT", "900"))
    if not _backend_alive(timeout_s):
        print(json.dumps({
            "metric": "pair_search_barcodes_per_s",
            "value": None,
            "unit": "barcodes/s",
            "error": "accelerator backend failed to initialize within "
                     f"{timeout_s:.0f}s (relay down?); kernel bench "
                     "skipped",
            "baseline_cpp_barcodes_per_s": round(base, 1),
        }))
        return
    tpu = measure_tpu()
    extra = _extra_rows()
    # headline run-to-run spread (VERDICT r4 #7): the relay drifts
    # 0.8-3.6 ms/step between runs, so the headline carries min/med/max
    # over 3 TIME-SEPARATED measurements (the extra rows between run 1
    # and runs 2-3 provide minutes of separation), not one median
    sep = [tpu["barcodes_per_s"]]
    for _ in range(2):
        sep.append(measure_tpu(include_xla=False)["barcodes_per_s"])
    sep.sort()
    result = {
        "metric": "pair_search_barcodes_per_s",
        "value": round(sep[1], 1),
        "unit": "barcodes/s",
        "value_spread_minmax": [round(sep[0], 1), round(sep[-1], 1)],
        "vs_baseline": round(sep[1] / base, 2),
        "baseline_cpp_barcodes_per_s": round(base, 1),
        "exact_f64_barcodes_per_s": round(tpu["exact_barcodes_per_s"], 1),
        "exact_kernel": "pallas-df32",
        "exact_step_ms": round(tpu["exact_step_ms"], 2),
        "exact_xla_f64_barcodes_per_s": round(
            tpu["exact_xla_f64_barcodes_per_s"], 1
        ),
        "exact_vpu_gflops": round(tpu["exact_vpu_gflops"], 1),
        "fast_vpu_gflops": round(tpu["fast_vpu_gflops"], 1),
        "fast_log_gops": round(tpu["fast_log_gops"], 2),
        "fast_mxu_front_gflops": round(tpu["fast_mxu_front_gflops"], 1),
        "workload": f"V={NV} A={NALPHA} S/cell={S_PER_CELL} umis/slot={UMIS_PER_SNP}",
        "platform": tpu["platform"],
        "dtype": tpu["dtype"],
        "step_ms": round(tpu["step_ms"], 2),
        "extra_workloads": extra,
    }
    try:  # append the run record (load condition + timings) for diffing
        from benchmarks.record import record

        record(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "benchmarks", "BENCH_RUNS.jsonl"), dict(result))
    except Exception:
        pass  # recording must never fail the bench
    print(json.dumps(result))


if __name__ == "__main__":
    main()
