"""Stage-level timing of the exact-mode (df32) block step on the real chip.

Splits demux_block_exact_impl (ops/pallas_pair_exact.py) into its pipeline
stages. Uses the two-point protocol (N vs 2N queued iterations, difference)
to cancel the tunnel's fixed ~30ms scalar-readback sync cost — see
bench.py:timeit.

  A. pair gather    codes -> per-slot df product planes (C,B,S) via ONE
                    fused-LUT take per two UMIs (kernel layout direct)
  D. g gather       ONE fused gps|gp0 hi|lo take + mask + kernel layout
  F. kernel only    _call_pair_kernel_df on precomputed inputs (includes
                    the in-kernel mixture/GL normalization front)
  G. full           demux_block_exact_impl

Usage: python benchmarks/probe_exact_stages.py  (serialize with other TPU
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
    from demuxlet_tpu.models.engine import compute_gp0
    from demuxlet_tpu.ops import pallas_pair_exact as PE
    from demuxlet_tpu.ops import luts

    NALPHA, NV, CAP_BQ, B = bench.NALPHA, bench.NV, bench.CAP_BQ, bench.TPU_BLOCK
    S = bench.S_PER_CELL
    grid = np.linspace(0.0, 0.5, NALPHA).tolist()
    w = luts.pair_lut(grid, CAP_BQ)
    rng = np.random.default_rng(0)
    cnt, msk, gps, gp0, codes = bench._synth_block(B, rng)
    NSNP = 4096
    table_gps = rng.dirichlet(np.ones(3), size=(NSNP, NV))
    table_gp0 = compute_gp0(table_gps)
    idx = rng.integers(0, NSNP, size=(B, S)).astype(np.int32)
    gps_pair, gp0_pair, tabs, meta = PE.split_tables(
        table_gps, table_gp0, w, luts.singlet_lut(CAP_BQ)
    )
    C, expand_w, expand_gl = meta
    dev = lambda pair: tuple(jax.device_put(jnp.asarray(x)) for x in pair)
    codes_d = jax.device_put(jnp.asarray(codes))
    idx_d = jax.device_put(jnp.asarray(idx))
    msk_d = jax.device_put(jnp.asarray(msk))
    gps_p, gp0_p, tabs_p = map(dev, (gps_pair, gp0_pair, tabs))
    interpret = jax.default_backend() != "tpu"
    V, A = NV, NALPHA

    def timeit(fn, *args, iters=8):
        def run(n):
            t0 = time.time()
            for _ in range(n):
                out = fn(*args)
            float(out)
            return time.time() - t0

        out = fn(*args)
        float(out)
        run(iters)
        t1 = run(iters)
        t2 = run(2 * iters)
        dt = (t2 - t1) / iters
        return (dt if dt > 0 else t2 / (2 * iters)) * 1e3

    n_rows = int(round(np.sqrt(tabs[0].shape[0])))
    none_row = n_rows - 1

    def codes_i32(codes):
        return jnp.where(codes >= 254, jnp.uint8(none_row), codes).astype(
            jnp.int32
        )

    @jax.jit
    def stage_a(codes):
        mh, ml, ef = PE._pair_prod_gather(tabs_p[:3], codes_i32(codes), n_rows)
        return jnp.sum(mh) + jnp.sum(ef)

    def g_fused(idx, msk):
        NSt = gps_p[0].shape[0]
        W3 = V * 3 + 3
        fused_g = jnp.concatenate(
            [gps_p[0].reshape(NSt, V * 3), gp0_p[0],
             gps_p[1].reshape(NSt, V * 3), gp0_p[1]], axis=1)
        gall = jnp.transpose(jnp.take(fused_g, idx, axis=0), (2, 0, 1))
        neutral_c = np.zeros((2 * W3, 1, 1), dtype=np.float32)
        neutral_c[0 : V * 3 : 3] = 1.0
        neutral_c[V * 3] = 1.0
        return jnp.where(msk[None], gall, neutral_c)

    @jax.jit
    def stage_d(idx, msk):
        return jnp.sum(g_fused(idx, msk))

    # kernel-only: precompute all kernel inputs once, device-resident
    w_used = sorted(set(expand_w))
    cmask = None
    if w_used != list(range(C)):
        cmask = tuple(i in w_used for i in range(C))

    @jax.jit
    def make_inputs(codes, idx, msk):
        c = codes_i32(codes)
        mh, ml, ef = PE._pair_prod_gather(tabs_p[:3], c, n_rows)
        gall = g_fused(idx, msk)
        return (mh, ml, ef, gall, msk[None].astype(jnp.float32))

    ins = [jax.device_put(x) for x in make_inputs(codes_d, idx_d, msk_d)]

    @jax.jit
    def stage_f(mh, ml, ef, gall, mskf):
        ab, z0, sing = PE._call_pair_kernel_df(
            (mh, ml, ef), gall, mskf,
            V, A, interpret, a0_zero=True, expand=expand_w,
            sym_a=NALPHA - 1, cmask=cmask, gsel=expand_gl,
        )
        return jnp.sum(ab[0]) + jnp.sum(z0[0]) + jnp.sum(sing[0])

    @jax.jit
    def stage_g(codes, idx, msk):
        llk, llk0, ab, z0 = PE.demux_block_exact_impl(
            codes, idx, msk, gps_p, gp0_p, tabs_p, meta,
            NALPHA, NV, interpret=interpret, a0_zero=True,
            sym_a=NALPHA - 1, front="pair",
        )
        return (jnp.sum(ab[0]) + jnp.sum(ab[1]) + jnp.sum(llk[0])
                + jnp.sum(z0[0]))

    @jax.jit
    def stage_h(codes, idx, msk):
        llk, llk0, ab, z0 = PE.demux_block_exact_impl(
            codes, idx, msk, gps_p, gp0_p, tabs_p, meta,
            NALPHA, NV, interpret=interpret, a0_zero=True,
            sym_a=NALPHA - 1, front="onehot",
        )
        return (jnp.sum(ab[0]) + jnp.sum(ab[1]) + jnp.sum(llk[0])
                + jnp.sum(z0[0]))

    res = {
        "pair_gather_ms": timeit(stage_a, codes_d),
        "g_gather_ms": timeit(stage_d, idx_d, msk_d),
        "kernel_incl_front_ms": timeit(stage_f, *ins),
        "full_pair_ms": timeit(stage_g, codes_d, idx_d, msk_d),
        "full_onehot_ms": timeit(stage_h, codes_d, idx_d, msk_d),
        "n_uniq_channels": C,
        "block": B,
    }
    print({k: (round(v, 3) if isinstance(v, float) else v)
           for k, v in res.items()})


if __name__ == "__main__":
    main()
