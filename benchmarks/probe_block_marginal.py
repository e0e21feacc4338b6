#!/usr/bin/env python
"""Decompose the WARM per-block engine cost (probe_e2e_overhead found
~230-260 ms/block for both modes vs a 79 ms pure-H2D floor): how much is
host prep (build_codes_block + shrink), H2D transport, and device step
dispatch/compute?

Usage: python benchmarks/probe_block_marginal.py [cells] [snps] [nv] [na]
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(sys.argv[1]) if len(sys.argv) > 1 else 20_480
S = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
NV = int(sys.argv[3]) if len(sys.argv) > 3 else 8
NA = int(sys.argv[4]) if len(sys.argv) > 4 else 5


def main():
    import jax
    import jax.numpy as jnp

    from demuxlet_tpu.utils.jaxcfg import enable_compilation_cache

    enable_compilation_cache()
    jax.config.update("jax_enable_x64", True)
    import threading

    threading.Thread(target=jax.devices, daemon=True).start()
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import e2e_demux as E
    from e2e_demux import synth_csr

    E.N_CELLS, E.S_PER_CELL, E.NV, E.NA = N, S, NV, NA
    rng = np.random.default_rng(0)
    csr = synth_csr(rng)
    gps = rng.dirichlet(np.ones(3), size=(E.NSNPS, NV))

    from demuxlet_tpu.host.csr import build_codes_block
    from demuxlet_tpu.models.engine import DemuxEngine, _to_wire

    grid = np.linspace(0.0, 0.5, NA).tolist()
    eng = DemuxEngine(gps, grid, cell_block=2048, mode="fast")
    n = csr.nbcs
    blocks, pads = eng._blocks(n, csr)
    pads = pads or [None] * len(blocks)

    # warm the page cache on the obs arrays (overcommitted-VM first-touch)
    for a in (csr.obs_snp, csr.obs_allele, csr.obs_bq):
        float(np.asarray(a[:: max(1, len(a) // 1000000)]).sum())

    out = {"cells": N, "n_blocks": len(blocks)}

    # 1. host prep alone (serial)
    t0 = time.time()
    preps = []
    for cells, pad in zip(blocks, pads):
        kw = {} if pad is None else {"pad_slots_to": pad}
        preps.append(eng._shrink_codes_blk(build_codes_block(
            csr, cells, cap_bq=eng.cap_bq, pad_cells_to=eng.cell_block,
            **kw)))
    t_prep = time.time() - t0
    out["prep_serial_s"] = round(t_prep, 2)

    # 2. wire-buffer build alone
    wires = []
    t0 = time.time()
    for codes, idx, msk in preps:
        assert msk is None and isinstance(idx, tuple)
        buf, wire = _to_wire(codes, idx)
        wires.append((buf, wire))
    out["to_wire_s"] = round(time.time() - t0, 2)
    out["wire_mb"] = round(sum(b.nbytes for b, _ in wires) / 1e6, 1)

    # 3. H2D alone (device_put each buffer, force with tiny readback)
    for rep in range(2):
        t0 = time.time()
        devs = [jnp.asarray(b) for b, _ in wires]
        float(jnp.sum(jnp.stack([d[0, 0] for d in devs])))
        out["h2d_only_s" if rep else "h2d_cold_s"] = round(
            time.time() - t0, 2)

    # 4. dispatch from DEVICE-RESIDENT buffers (pure step compute+decide)
    from demuxlet_tpu.models import decision as D

    w_ext, logf_ext, expand = eng._fast_tables()
    dbl_w = jnp.asarray(D.doublet_weights(NV, grid, 0.5))
    dbl_msk = jnp.asarray(D.doublet_mask(NV, NA))

    def step(dev, wire):
        return D.demux_block_fast_compact(
            dev, None, None, eng._gps_dev, eng._gp0_dev, w_ext, logf_ext,
            dbl_w, dbl_msk, NA, NV, 0.5,
            a0_sep=True, sym_a=eng._sym_a(), expand=expand, wire=wire)

    outs = [step(d, w[1]) for d, w in zip(devs, wires)]  # compile warm
    _ = np.asarray(jnp.concatenate(outs, 0))
    t0 = time.time()
    outs = [step(d, w[1]) for d, w in zip(devs, wires)]
    _ = np.asarray(jnp.concatenate(outs, 0))
    out["step_device_resident_s"] = round(time.time() - t0, 2)

    # 5. full loop as the engine runs it (H2D + step, serial dispatch)
    t0 = time.time()
    outs = [step(jnp.asarray(b), w) for b, w in wires]
    _ = np.asarray(jnp.concatenate(outs, 0))
    out["h2d_plus_step_s"] = round(time.time() - t0, 2)

    # 6. coalesced H2D: ONE stacked buffer then device-side slices
    same = len({b.shape for b, _ in wires}) == 1
    if same:
        big = np.stack([b for b, _ in wires])
        t0 = time.time()
        dev = jnp.asarray(big)
        outs = [step(dev[i], wires[i][1]) for i in range(len(wires))]
        _ = np.asarray(jnp.concatenate(outs, 0))
        out["coalesced_h2d_step_s"] = round(time.time() - t0, 2)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
