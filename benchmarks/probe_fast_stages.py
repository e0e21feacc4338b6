"""Stage-level timing of the fast-mode pair-search step on the real chip.

Splits pair_llks_pallas (ops/pallas_pair.py) into its pipeline stages and
times each with the scalar-round-trip barrier (block_until_ready is a no-op
on the tunneled axon backend):

  A. einsum front        lograw = einsum('nbs,nx->xbs', cnt_t, wt)   [MXU]
  B. front + normalize   t = _norm_t(lograw, 0)                      [VPU exp]
  C. kernel only         _call_pair_kernel(t, gps_t, ...) on a
                         precomputed device-resident t
  D. full step           pair_llks_pallas(...)

Usage: python benchmarks/probe_fast_stages.py  (serialize with other TPU
processes — never overlap two).
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax

    from demuxlet_tpu.utils.jaxcfg import enable_compilation_cache

    enable_compilation_cache()
    import jax.numpy as jnp

    import bench
    from demuxlet_tpu.ops import luts
    from demuxlet_tpu.ops.pallas_pair import (
        _call_pair_kernel,
        _norm_t,
        pack_block,
        pair_llks_pallas,
    )

    NALPHA, NV, CAP_BQ, B = bench.NALPHA, bench.NV, bench.CAP_BQ, bench.TPU_BLOCK
    grid = np.linspace(0.0, 0.5, NALPHA).tolist()
    w = luts.pair_lut(grid, CAP_BQ)
    rng = np.random.default_rng(0)
    cnt, msk, gps, gp0, codes = bench._synth_block(B, rng)
    cnt_t, gps_t, wt = pack_block(cnt, msk, gps, w)
    cnt_d = jax.device_put(jnp.asarray(cnt_t))
    gps_d = jax.device_put(jnp.asarray(gps_t))
    wt_d = jax.device_put(jnp.asarray(wt))
    interpret = jax.default_backend() != "tpu"

    def timeit(fn, *args, iters=20):
        out = fn(*args)
        float(out)
        t0 = time.time()
        for _ in range(iters):
            out = fn(*args)
        float(out)
        return (time.time() - t0) / iters * 1e3

    @jax.jit
    def stage_a(cnt_t, wt):
        return jnp.sum(jnp.einsum("nbs,nx->xbs", cnt_t, wt,
                                  preferred_element_type=jnp.float32))

    @jax.jit
    def stage_b(cnt_t, wt):
        lograw = jnp.einsum("nbs,nx->xbs", cnt_t, wt,
                            preferred_element_type=jnp.float32)
        return jnp.sum(_norm_t(lograw, 0))

    @jax.jit
    def make_t(cnt_t, wt):
        lograw = jnp.einsum("nbs,nx->xbs", cnt_t, wt,
                            preferred_element_type=jnp.float32)
        return _norm_t(lograw, 0)

    @jax.jit
    def stage_c(t, gps_t):
        ab, z0 = _call_pair_kernel(t, gps_t, NV, NALPHA, interpret)
        return jnp.sum(ab) + jnp.sum(z0)

    @jax.jit
    def stage_d(cnt_t, gps_t, wt):
        ab, z0 = pair_llks_pallas(cnt_t, gps_t, wt, NALPHA, NV,
                                  interpret=interpret)
        return jnp.sum(ab) + jnp.sum(z0)

    t_d = jax.device_put(make_t(cnt_d, wt_d))
    ms_a = timeit(stage_a, cnt_d, wt_d)
    ms_b = timeit(stage_b, cnt_d, wt_d)
    ms_c = timeit(stage_c, t_d, gps_d)
    ms_d = timeit(stage_d, cnt_d, gps_d, wt_d)
    print({
        "einsum_ms": round(ms_a, 3),
        "einsum_norm_ms": round(ms_b, 3),
        "kernel_only_ms": round(ms_c, 3),
        "full_ms": round(ms_d, 3),
        "block": B,
    })


if __name__ == "__main__":
    main()
