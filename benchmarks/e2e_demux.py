#!/usr/bin/env python
"""End-to-end demux benchmark at production scale (BASELINE config 5 shape).

Generates a synthetic 100K-barcode scATAC-style pileup (CSR form — ingest is
benchmarked separately by the native-ingest tests/bench), runs the full
engine (fast mode) + decision/output rendering, and reports wall-clock
barcodes/s per pipeline phase.

Every run appends one machine-readable line to benchmarks/E2E_RUNS.jsonl
(benchmarks/record.py: timings + host-load condition) and prints the
transport-ceiling accounting: measured H2D bytes/barcode x measured link
bandwidth -> the e2e rate ceiling on THIS host, plus the projection on a
standard PCIe host (VERDICT r2 #2/#8 evidence). Set E2E_ARTIFACT=path to
also write the full summary JSON artifact.

Usage: python benchmarks/e2e_demux.py [n_cells] [snps_per_cell] [nv]
           [nalpha] [mode] [profile]

profile (default "uniform"):
  uniform    every cell covers snps_per_cell SNPs at exactly 2 UMIs each,
             BQ uniform over [13, 40] — the round-1..4 workload (kept
             for cross-round comparability; its wide BQ alphabet and
             full-lane slots are the wire format's WORST case).
  realistic  what actual droplet data looks like, each property sourced:
             BQ binned to {23, 37} (NovaSeq RTA3 emits 4 quality bins;
             after the default min-BQ 13 filter two survive), per-cell
             coverage lognormal around snps_per_cell (library-size
             skew), SNPs drawn as per-gene runs with zipf gene
             popularity (expression concentrates on few genes; covered
             SNPs cluster inside genes), UMIs/slot 1 + Poisson(0.15)
             with rare PCR-hot slots (deep-lane tail).
"""

from __future__ import annotations

import io
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_CELLS = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
S_PER_CELL = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
NV = int(sys.argv[3]) if len(sys.argv) > 3 else 8
NA = int(sys.argv[4]) if len(sys.argv) > 4 else 5
MODE = sys.argv[5] if len(sys.argv) > 5 else "fast"
PROFILE = sys.argv[6] if len(sys.argv) > 6 else "uniform"
NSNPS = 50_000
UMIS = 2


def synth_csr(rng):
    from demuxlet_tpu.host.csr import CsrPileup

    nobs = N_CELLS * S_PER_CELL * UMIS
    # each cell covers S_PER_CELL distinct random SNPs, UMIS umis each
    # (distinct via strided offsets so per-slot UMI counts stay == UMIS)
    base = rng.integers(0, NSNPS // S_PER_CELL, size=(N_CELLS, S_PER_CELL))
    snps_per_cell = base + np.arange(S_PER_CELL) * (NSNPS // S_PER_CELL)
    obs_snp = np.repeat(snps_per_cell.reshape(-1), UMIS).astype(np.int32)
    obs_cell = np.repeat(
        np.arange(N_CELLS, dtype=np.int64), S_PER_CELL * UMIS
    )
    obs_allele = rng.integers(0, 2, size=nobs).astype(np.uint8)
    obs_bq = rng.integers(13, 41, size=nobs).astype(np.uint8)
    barcodes = ["BC%06d" % i for i in range(N_CELLS)]
    totl = np.full(N_CELLS, S_PER_CELL * UMIS, dtype=np.int64)
    return CsrPileup.from_arrays(
        [f"S{i}" for i in range(NV)], NSNPS, barcodes, totl, totl, totl,
        obs_cell, obs_snp.astype(np.int64), obs_allele, obs_bq,
    )


def synth_csr_realistic(rng):
    """Droplet-realistic pileup (see module docstring for sources).
    Exercises the paths the uniform profile cannot: coverage-sorted
    blocking (engine._blocks), the wire-v2 4-bit dict + deep-lane tail,
    and narrow deltas over gene-run SNP clusters."""
    from demuxlet_tpu.host.csr import CsrPileup

    gene_len = 25  # SNPs per gene cluster
    n_genes = NSNPS // gene_len
    pop = 1.0 / np.arange(1, n_genes + 1) ** 0.9  # zipf popularity
    pop /= pop.sum()
    gene_perm = rng.permutation(n_genes)  # popular genes spread genomewide
    cdf = np.cumsum(pop)

    # per-cell coverage: lognormal around S_PER_CELL, sd ~0.6 dex
    s_c = np.clip(
        rng.lognormal(np.log(S_PER_CELL), 0.6, size=N_CELLS),
        40, 6 * S_PER_CELL,
    ).astype(np.int64)
    genes_per_cell = np.maximum(s_c // 12, 1)  # ~12 covered SNPs/gene

    cell_parts, snp_parts = [], []
    step = 4096
    for lo in range(0, N_CELLS, step):
        hi = min(lo + step, N_CELLS)
        ng = genes_per_cell[lo:hi]
        tot = int(ng.sum())
        g = gene_perm[
            np.searchsorted(cdf, rng.random(tot)).clip(0, n_genes - 1)
        ]
        cell_of_gene = np.repeat(np.arange(lo, hi), ng)
        # covered run inside the gene: random start + length ~12
        run = rng.integers(6, 19, size=tot)
        start = rng.integers(0, gene_len - 5, size=tot)
        run = np.minimum(run, gene_len - start)
        snp0 = g * gene_len + start
        snps = np.repeat(snp0, run) + _ranges(run)
        cells = np.repeat(cell_of_gene, run)
        cell_parts.append(cells)
        snp_parts.append(snps)
    obs_cell1 = np.concatenate(cell_parts)
    obs_snp1 = np.concatenate(snp_parts).astype(np.int64)

    # UMIs per covered slot: 1 + Poisson(0.15), plus rare PCR-hot slots
    occ = 1 + rng.poisson(0.15, size=len(obs_snp1))
    hot = rng.random(len(obs_snp1)) < 5e-4
    occ[hot] += rng.integers(4, 20, size=int(hot.sum()))
    obs_cell = np.repeat(obs_cell1, occ)
    obs_snp = np.repeat(obs_snp1, occ)
    nobs = len(obs_snp)
    obs_allele = rng.integers(0, 2, size=nobs).astype(np.uint8)
    # post-min-BQ NovaSeq bins
    obs_bq = np.where(rng.random(nobs) < 0.85, 37, 23).astype(np.uint8)
    barcodes = ["BC%06d" % i for i in range(N_CELLS)]
    totl = np.bincount(obs_cell, minlength=N_CELLS).astype(np.int64)
    return CsrPileup.from_arrays(
        [f"S{i}" for i in range(NV)], NSNPS, barcodes, totl, totl, totl,
        obs_cell, obs_snp, obs_allele, obs_bq,
    )


def _ranges(lengths):
    """concatenate([arange(n) for n in lengths]) without the loop."""
    tot = int(lengths.sum())
    out = np.ones(tot, dtype=np.int64)
    out[0] = 0
    ends = np.cumsum(lengths)[:-1]
    out[ends] = 1 - lengths[:-1]
    return np.cumsum(out)


def main():
    import jax

    from demuxlet_tpu.utils.jaxcfg import enable_compilation_cache

    enable_compilation_cache()
    jax.config.update("jax_enable_x64", True)  # match the CLI (f64 decide)
    # backend init (~10s tunnel connect) overlaps workload generation,
    # mirroring the CLI's early-init thread
    import threading

    threading.Thread(target=jax.devices, daemon=True).start()
    t0 = time.time()
    rng = np.random.default_rng(0)
    csr = synth_csr_realistic(rng) if PROFILE == "realistic" else (
        synth_csr(rng))
    gps = rng.dirichlet(np.ones(3), size=(NSNPS, NV))
    t_gen = time.time() - t0
    mean_cov = len(csr.obs_snp) / N_CELLS
    print(f"# workload[{PROFILE}]: {N_CELLS} cells, "
          f"{mean_cov:.0f} obs/cell mean, V={NV} A={NA} "
          f"(gen {t_gen:.1f}s)", flush=True)

    from demuxlet_tpu.models.engine import DemuxEngine, cell_stats
    from demuxlet_tpu.models import outputs as out_mod

    grid = np.linspace(0.0, 0.5, NA).tolist()
    eng = DemuxEngine(gps, grid, cell_block=2048, mode=MODE,
                      exact_kernel="pallas" if MODE == "exact" else "auto")
    # Per-process FIXED cost (jit trace + compile-cache executable load +
    # first-touch) is paid once and amortizes over a production run; time
    # it separately via a one-block warmup at the production shape so the
    # engine phase reports the MARGINAL rate (probe_e2e_overhead measured
    # the round-3 "exact-only engine overhead" to be exactly this fixed
    # cost: fast ~10 s, exact ~20 s incl. a 20 MB executable).
    t0 = time.time()
    from demuxlet_tpu.host.csr import CsrPileup

    def sub_csr(ids):
        ids = np.asarray(list(ids), dtype=np.int64)
        obs_idx = np.concatenate([
            np.arange(csr.cell_ptr[i], csr.cell_ptr[i + 1]) for i in ids
        ]) if len(ids) else np.zeros(0, np.int64)
        lens = np.diff(csr.cell_ptr)[ids]
        return CsrPileup.from_arrays(
            csr.sample_ids, csr.nsnps, [csr.barcodes[i] for i in ids],
            csr.cell_totl[ids], csr.cell_pass[ids], csr.cell_uniq[ids],
            np.repeat(np.arange(len(ids), dtype=np.int64), lens),
            csr.obs_snp[obs_idx].astype(np.int64),
            csr.obs_allele[obs_idx], csr.obs_bq[obs_idx],
        )

    # warm with one FULL pass: wire-v2 metas (U0/K2p/Kp per shape key)
    # are data-dependent, so per-bucket single-block warmups miss
    # variants whose trace+load (~5-10 s each) would then pollute the
    # timed marginal phase; a full pass touches every compiled shape
    # exactly like production steady state (probe_e2e_overhead's
    # two-run methodology, now inline)
    _ = sub_csr  # kept for ad-hoc probing
    eng.run_compact(csr, doublet_prior=0.5)
    t_fixed = time.time() - t0
    print(f"# fixed+first-pass (trace+executable load, full warm pass): "
          f"{t_fixed:.1f}s", flush=True)

    # two timed passes: the relay's throughput drifts minute to minute,
    # so report the better of two warm passes (and both raw times)
    passes = []
    for _p in range(2):
        t0 = time.time()
        llks, llk0s, compact = eng.run_compact(csr, doublet_prior=0.5)
        passes.append(time.time() - t0)
        print(f"# engine pass{_p} ({MODE}+device decisions): "
              f"{passes[-1]:.1f}s -> {N_CELLS / passes[-1]:.0f} b/s; "
              f"phases {dict((k, round(v, 1)) for k, v in eng.phase_s.items())}",
              flush=True)
    t_engine = min(passes)

    t0 = time.time()
    stats = cell_stats(csr)
    t_stats = time.time() - t0
    s2 = io.StringIO()
    sb = io.StringIO()
    out_mod.write_pass2_compact(
        stats, csr.sample_ids, compact, grid, 0.5, s2, sb
    )
    t_out = time.time() - t0
    print(f"#   (cell_stats {t_stats:.1f}s, render {t_out - t_stats:.1f}s)",
          flush=True)
    total = t_gen * 0 + t_engine + t_out
    print(f"# outputs (.sing2/.best): {t_out:.1f}s", flush=True)

    # ---- transport-ceiling accounting (VERDICT r2 #2) ----
    # measure the actual H2D link with one 8 MB buffer, median of 3
    import jax.numpy as jnp

    probe = np.zeros(2 << 20, np.int32)  # 8 MB
    h2d = []
    for i in range(4):
        probe[0] = i  # defeat any host-side caching of the same buffer
        t1 = time.time()
        float(jnp.sum(jnp.asarray(probe)[:8]))  # ship + tiny round trip
        h2d.append(time.time() - t1)
    h2d_bps = probe.nbytes / float(np.median(sorted(h2d)[:-1]))
    bpb = eng.h2d_bytes / N_CELLS  # wire bytes per barcode (measured)
    ceil_here = h2d_bps / bpb
    PCIE_GBPS = 8.0  # conservative effective H2D on a real PCIe4 host
    ceil_pcie = PCIE_GBPS * 1e9 / bpb
    base_bps = 213.6  # measured single-thread C++ baseline (BASELINE.md)
    rate = N_CELLS / total
    print(f"# transport: {eng.h2d_bytes / 1e6:.1f} MB H2D "
          f"({bpb:.0f} B/barcode), {eng.d2h_bytes / 1e6:.1f} MB D2H; "
          f"link probe {h2d_bps / 1e6:.1f} MB/s", flush=True)
    print(f"# ceiling here: {ceil_here:.0f} b/s ({ceil_here / base_bps:.0f}x"
          f" baseline); PCIe-host projection: {ceil_pcie:.0f} b/s "
          f"(transport) -> e2e ~min(kernel, transport)", flush=True)

    row = {
        "metric": "e2e_demux_barcodes_per_s",
        "mode": MODE,
        "profile": PROFILE,
        "wire_cfg": None if eng._wire_cfg is None else {
            "n_dict": eng._wire_cfg.n_real,
            "code_w": eng._wire_cfg.code_w,
            "delta_w": eng._wire_cfg.delta_w,
            "u_cap": eng._wire_cfg.u_cap,
        },
        "value": round(rate, 1),
        "unit": "barcodes/s",
        "vs_baseline": round(rate / base_bps, 1),
        "cold_bps": round(N_CELLS / (total + t_fixed), 1),
        "cold_vs_baseline": round(N_CELLS / (total + t_fixed) / base_bps, 1),
        "cells": N_CELLS,
        "snps_per_cell": S_PER_CELL,
        "nv": NV,
        "nalpha": NA,
        "phases_s": {"gen": round(t_gen, 2), "fixed": round(t_fixed, 2),
                     "engine": round(t_engine, 2),
                     "engine_passes": [round(p, 2) for p in passes],
                     "engine_parts": {k: round(v, 2)
                                      for k, v in eng.phase_s.items()},
                     "cell_stats": round(t_stats, 2),
                     "render": round(t_out - t_stats, 2)},
        "transport": {
            "h2d_bytes": int(eng.h2d_bytes),
            "d2h_bytes": int(eng.d2h_bytes),
            "bytes_per_barcode": round(bpb, 1),
            "h2d_link_MBps": round(h2d_bps / 1e6, 1),
            "ceiling_here_bps": round(ceil_here, 1),
            "ceiling_pcie8GBps_bps": round(ceil_pcie, 1),
        },
        "baseline_bps": base_bps,
    }
    from benchmarks.record import record

    record(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "E2E_RUNS.jsonl"), dict(row))
    art = os.environ.get("E2E_ARTIFACT")
    if art:
        import json

        with open(art, "w") as fh:
            json.dump(row, fh, indent=1)
    import json

    print(json.dumps(row))


if __name__ == "__main__":
    main()
