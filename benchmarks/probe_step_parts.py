#!/usr/bin/env python
"""Decompose the fast-mode device STEP time (probe_block_marginal saw
~35 ms/2048-cell block device-resident vs the bench kernel's ~3.2 ms):
time each stage of demux_block_fast_compact separately on device-resident
wire buffers — unpack only, unpack+front(one-hot counts+einsum), full
LLK step, LLK+decision pass — to find where the difference lives.

Usage: python benchmarks/probe_step_parts.py [cells]
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
S = 1000
NV, NA = 8, 5


def main():
    import jax
    import jax.numpy as jnp

    from demuxlet_tpu.utils.jaxcfg import enable_compilation_cache

    enable_compilation_cache()
    jax.config.update("jax_enable_x64", True)
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import e2e_demux as E
    from e2e_demux import synth_csr

    E.N_CELLS, E.S_PER_CELL, E.NV, E.NA = N, S, NV, NA
    rng = np.random.default_rng(0)
    csr = synth_csr(rng)
    gps = rng.dirichlet(np.ones(3), size=(E.NSNPS, NV))

    from demuxlet_tpu.models import decision as D
    from demuxlet_tpu.models.engine import DemuxEngine, _to_wire
    from demuxlet_tpu.ops import pallas_pair as PP

    grid = np.linspace(0.0, 0.5, NA).tolist()
    eng = DemuxEngine(gps, grid, cell_block=2048, mode="fast")
    blocks, pads = eng._blocks(csr.nbcs, csr)
    pads = pads or [None] * len(blocks)
    cells, pad = blocks[0], pads[0]
    codes, idxt, _ = eng._prep_codes_blk(csr, cells, pad)
    buf, wire = _to_wire(codes, idxt)
    dev = jax.device_put(jnp.asarray(buf))
    w_ext, logf_ext, expand = eng._fast_tables()
    dbl_w = jnp.asarray(D.doublet_weights(NV, grid, 0.5))
    dbl_msk = jnp.asarray(D.doublet_mask(NV, NA))

    import functools

    @functools.partial(jax.jit, static_argnames=("wire",))
    def f_unpack(buf, wire):
        c, i, m = PP.unpack_block_inputs(buf, None, None, wire)
        return jnp.sum(i) + jnp.sum(c.astype(jnp.int32)) + jnp.sum(m)

    @functools.partial(jax.jit, static_argnames=("wire",))
    def f_full(buf, gps_t, gp0_t, w, lf, wire):
        llk, llk0, ab, z0 = PP.demux_block_fast_impl(
            buf, None, None, gps_t, gp0_t, w, lf, NA, NV,
            a0_sep=True, sym_a=NA - 1, expand=expand, wire=wire)
        return jnp.sum(llk) + jnp.sum(ab) + jnp.sum(z0)

    @functools.partial(jax.jit, static_argnames=("wire",))
    def f_compact(buf, gps_t, gp0_t, w, lf, dw, dm, wire):
        out = D.demux_block_fast_compact.__wrapped__(
            buf, None, None, gps_t, gp0_t, w, lf, dw, dm, NA, NV, 0.5,
            a0_sep=True, sym_a=NA - 1, expand=expand, wire=wire)
        return jnp.sum(out)

    def timeit(fn, *args):
        out = fn(*args)
        float(jnp.sum(out))
        ests = []
        for _ in range(3):
            def run(n):
                t0 = time.time()
                for _ in range(n):
                    o = fn(*args)
                float(jnp.sum(o))
                return time.time() - t0
            t1, t2 = run(4), run(8)
            dt = (t2 - t1) / 4
            ests.append(dt if dt > 0 else t2 / 8)
        ests.sort()
        return ests[1] * 1e3

    out = {"cells_block": int(codes.shape[0])}
    out["unpack_ms"] = round(timeit(f_unpack, dev, wire), 2)
    out["full_llk_ms"] = round(timeit(
        f_full, dev, eng._gps_dev, eng._gp0_dev, w_ext, logf_ext, wire), 2)
    out["compact_ms"] = round(timeit(
        f_compact, dev, eng._gps_dev, eng._gp0_dev, w_ext, logf_ext,
        dbl_w, dbl_msk, wire), 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
