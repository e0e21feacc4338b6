"""Variants of the exact-mode pair-product front, timed on the real chip.

The pair-code LUT take (v1, production) measured 7.4 ms/block — gathers
defeat XLA's fusion the same way the fast path's take-front did before the
one-hot MXU rewrite (25.5 -> 5.4 ms). Candidates:

  v1  fused (R^2, 3C) take over pair codes + transpose   [production]
  v2  per-UMI one-hot (R, B, S*U) einsum -> (3C, B, S*U), df-mul combine
  v3  v2 with the exponent plane via ONE counts einsum (integer-exact)
      and only mantissa hi|lo per-UMI (2C channels instead of 3C)

Each variant returns the (C, B, S) df product planes; v2/v3 replace the
host-exact pair product with a device df mul (~1e-14 rel — within the
1e-9 exact contract; identical to the existing U>2 path). Correctness is
cross-checked against v1 before timing.

Usage: python benchmarks/probe_exact_front.py  (serialize TPU procs).
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax
    import jax.numpy as jnp

    from demuxlet_tpu.utils.jaxcfg import enable_compilation_cache

    enable_compilation_cache()

    import bench
    from demuxlet_tpu.models.engine import compute_gp0
    from demuxlet_tpu.ops import df32 as df
    from demuxlet_tpu.ops import luts
    from demuxlet_tpu.ops import pallas_pair_exact as PE

    NALPHA, NV, CAP_BQ, B = bench.NALPHA, bench.NV, bench.CAP_BQ, bench.TPU_BLOCK
    S = bench.S_PER_CELL
    grid = np.linspace(0.0, 0.5, NALPHA).tolist()
    w = luts.pair_lut(grid, CAP_BQ)
    rng = np.random.default_rng(0)
    _, msk, _, _, codes = bench._synth_block(B, rng)
    table_gps = rng.dirichlet(np.ones(3), size=(64, NV))
    gps_pair, gp0_pair, tabs, meta = PE.split_tables(
        table_gps, compute_gp0(table_gps), w, luts.singlet_lut(CAP_BQ)
    )
    C = meta[0]
    tabs_p = tuple(jax.device_put(jnp.asarray(x)) for x in tabs)
    n_rows = int(round(np.sqrt(tabs[0].shape[0])))
    none_row = n_rows - 1
    codes_d = jax.device_put(jnp.asarray(codes))
    U = codes.shape[-1]

    # single-code tables: recover from the pair LUT's none-row pairs
    # (row c*R + none == value of code c alone)
    pm_h, pm_l, pe = (np.asarray(x) for x in tabs[:3])
    sel = np.arange(n_rows) * n_rows + none_row
    s_h, s_l, s_e = pm_h[sel], pm_l[sel], pe[sel]  # (R, C)
    sing3 = jnp.asarray(np.concatenate([s_h, s_l, s_e], axis=1))  # (R, 3C)
    sing2 = jnp.asarray(np.concatenate([s_h, s_l], axis=1))  # (R, 2C)
    e_tab = jnp.asarray(s_e)  # (R, C)

    def codes_i32(codes):
        return jnp.where(codes == 255, jnp.uint8(none_row), codes).astype(
            jnp.int32
        )

    HIGH = jax.lax.Precision.HIGHEST

    @jax.jit
    def v1(codes):
        mh, ml, ef = PE._pair_prod_gather(tabs_p[:3], codes_i32(codes), n_rows)
        return mh, ml, ef

    def combine_umis(h, l, e):
        """(C, B, S, U) planes -> df product over U with renorm."""
        oh, ol, oe = h[..., 0], l[..., 0], e[..., 0]
        for u in range(1, h.shape[-1]):
            oh, ol = df.mul(oh, ol, h[..., u], l[..., u])
            oh, ol, oe = PE._renorm(oh, ol, oe + e[..., u])
        return oh, ol, oe

    @jax.jit
    def v2(codes):
        c = codes_i32(codes).reshape(B, S * U)
        ar = jnp.arange(n_rows, dtype=jnp.int32)
        ohm = (c[None] == ar[:, None, None]).astype(jnp.float32)
        g = jnp.einsum("nbs,nx->xbs", ohm, sing3,
                       preferred_element_type=jnp.float32, precision=HIGH)
        g = g.reshape(3 * C, B, S, U)
        return combine_umis(g[:C], g[C : 2 * C], g[2 * C :])

    @jax.jit
    def v3(codes):
        ci = codes_i32(codes)
        c = ci.reshape(B, S * U)
        ar = jnp.arange(n_rows, dtype=jnp.int32)
        ohm = (c[None] == ar[:, None, None]).astype(jnp.float32)
        g = jnp.einsum("nbs,nx->xbs", ohm, sing2,
                       preferred_element_type=jnp.float32, precision=HIGH)
        g = g.reshape(2 * C, B, S, U)
        # exponents: one counts einsum (sums of integer-valued f32, exact)
        cntm = jnp.sum(
            (ci.reshape(B, S, U)[None] == ar[:, None, None, None]).astype(
                jnp.float32
            ),
            axis=-1,
        )  # (R, B, S)
        esum = jnp.einsum("nbs,nx->xbs", cntm, e_tab,
                          preferred_element_type=jnp.float32, precision=HIGH)
        h, l = g[:C, ..., 0], g[C:, ..., 0]
        for u in range(1, U):
            h, l = df.mul(h, l, g[:C, ..., u], g[C:, ..., u])
            bits = df._bits(h)
            ee = ((bits >> 23) & 0xFF) - 127
            sc = df._pow2(-ee)
            h, l = h * sc, l * sc
            esum = esum + ee.astype(jnp.float32)
        return h, l, esum

    # correctness vs v1 (values, not bits: df mul is ~1e-14 rel)
    r1 = [np.asarray(x) for x in v1(codes_d)]
    for name, fn in (("v2", v2), ("v3", v3)):
        r = [np.asarray(x) for x in fn(codes_d)]
        val1 = df.to_f64(r1[0], r1[1]) * np.exp2(r1[2].astype(np.float64))
        val = df.to_f64(r[0], r[1]) * np.exp2(r[2].astype(np.float64))
        rel = np.abs(val - val1) / np.maximum(np.abs(val1), 1e-300)
        assert rel.max() < 1e-12, (name, rel.max())

    def timeit(fn, *args, iters=8):
        def run(n):
            t0 = time.time()
            for _ in range(n):
                out = fn(*args)
            float(jnp.sum(out[0]))
            return time.time() - t0

        out = fn(*args)
        float(jnp.sum(out[0]))
        run(iters)
        t1 = run(iters)
        t2 = run(2 * iters)
        dt = (t2 - t1) / iters
        return (dt if dt > 0 else t2 / (2 * iters)) * 1e3

    print({
        "v1_take_ms": round(timeit(v1, codes_d), 3),
        "v2_perumi_einsum_ms": round(timeit(v2, codes_d), 3),
        "v3_counts_exp_ms": round(timeit(v3, codes_d), 3),
        "C": C,
        "block": B,
    })


if __name__ == "__main__":
    main()
