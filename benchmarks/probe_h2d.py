"""Transport economics of the tunneled backend for the fast e2e path.

Times, for the production 2048x1024 e2e block shape:
  A. pure H2D of the fused wire buffer (device_put + 1-element readback)
  B. compact step on device-RESIDENT inputs (compute only)
  C. full compact step from host numpy (H2D + compute + packed D2H)
and derives the effective H2D bandwidth and the share of C that is
transfer. Decides whether further wire-packing work pays.

Usage: python benchmarks/probe_h2d.py  (serialize TPU procs).
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def sync(x):
    import jax.numpy as jnp

    return float(jnp.sum(x[..., :1].astype(jnp.float32)))


def timeit(fn, n=4):
    fn()
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    import jax
    import jax.numpy as jnp

    from demuxlet_tpu.utils.jaxcfg import enable_compilation_cache

    enable_compilation_cache()
    jax.config.update("jax_enable_x64", True)

    from demuxlet_tpu.host.csr import CsrPileup, build_codes_block
    from demuxlet_tpu.models import decision as D
    from demuxlet_tpu.models.engine import DemuxEngine, _to_wire

    B, S_PER_CELL, NV, NA, NSNPS, UMIS = 2048, 1000, 8, 5, 50_000, 2
    rng = np.random.default_rng(0)
    base = rng.integers(0, NSNPS // S_PER_CELL, size=(B, S_PER_CELL))
    snps = base + np.arange(S_PER_CELL) * (NSNPS // S_PER_CELL)
    obs_snp = np.repeat(snps.reshape(-1), UMIS).astype(np.int64)
    obs_cell = np.repeat(np.arange(B, dtype=np.int64), S_PER_CELL * UMIS)
    nobs = obs_snp.size
    obs_allele = rng.integers(0, 2, size=nobs).astype(np.uint8)
    obs_bq = rng.integers(13, 41, size=nobs).astype(np.uint8)
    totl = np.full(B, S_PER_CELL * UMIS, dtype=np.int64)
    csr = CsrPileup.from_arrays(
        [f"S{i}" for i in range(NV)], NSNPS, ["BC%06d" % i for i in range(B)],
        totl, totl, totl, obs_cell, obs_snp, obs_allele, obs_bq)
    gps = rng.dirichlet(np.ones(3), size=(NSNPS, NV))
    grid = np.linspace(0.0, 0.5, NA).tolist()
    eng = DemuxEngine(gps, grid, cell_block=B, mode="fast")

    cells = list(range(B))
    blk = eng._shrink_codes_blk(
        build_codes_block(csr, cells, cap_bq=eng.cap_bq, pad_cells_to=B))
    codes, idx, msk = blk
    assert msk is None and isinstance(idx, tuple), "wire path expected"
    wire_codes, wire_meta = _to_wire(codes, idx)
    mb = wire_codes.nbytes / 1e6
    print(f"wire buffer: {wire_codes.shape} {wire_codes.dtype} = {mb:.2f} MB")

    # A: pure H2D
    def h2d():
        d = jax.device_put(wire_codes)
        sync(d)

    t_a = timeit(h2d)
    print(f"A pure H2D: {t_a*1e3:.1f} ms -> {mb/t_a:.1f} MB/s")

    # B: compute on device-resident inputs
    w_ext, logf_ext, expand = eng._fast_tables()
    dbl_w = jnp.asarray(D.doublet_weights(NV, grid, 0.5))
    dbl_msk = jnp.asarray(D.doublet_mask(NV, NA))
    dev_codes = jax.device_put(wire_codes)
    sync(dev_codes)

    def step(c):
        return D.demux_block_fast_compact(
            c, None, None, eng._gps_dev, eng._gp0_dev, w_ext, logf_ext,
            dbl_w, dbl_msk, NA, NV, 0.5, interpret=False,
            a0_sep=True, sym_a=eng._sym_a(), expand=expand, wire=wire_meta)

    def compute_only():
        np.asarray(step(dev_codes))

    t_b = timeit(compute_only)
    print(f"B compute+packedD2H (resident input): {t_b*1e3:.1f} ms")

    # C: full from host
    def full():
        np.asarray(step(jnp.asarray(wire_codes)))

    t_c = timeit(full)
    print(f"C full step from host: {t_c*1e3:.1f} ms")
    print(f"   -> transfer share ~ {(t_c-t_b)/t_c*100:.0f}%  "
          f"({B/t_c:.0f} barcodes/s/block at steady state)")


if __name__ == "__main__":
    main()
