"""Does Mosaic serialize per-channel scratch read-modify-writes?

The exact pair kernel updates ~320 df accumulators per grid step as
individual `ref[i] = f(ref[i], x_i)` ops. If Mosaic treats those as a
serial chain (no alias analysis across dynamic/static ref indices), the
kernel is latency-bound — consistent with the measured ~1.0 Tops/s vs the
1.83 Tops/s independent-stream ceiling (probe_vpu.py).

  perch   C accumulators updated one ref-index at a time (production shape)
  plane   same math on the whole (C, TB, TS) scratch in ONE vector op

Usage: python benchmarks/probe_scratch_acc.py  (serialize TPU procs).
"""

import functools
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from demuxlet_tpu.utils.jaxcfg import enable_compilation_cache

    enable_compilation_cache()

    C, TB, TS = 256, 8, 128
    B, S = 64, 1024  # grid = (B//TB, S//TS) = (8, 8) steps
    n_s = S // TS

    def mul2ish(h, x):
        # ~8-op stand-in for the df acc (mul + renorm-ish), no refs inside
        p = h * x
        e = h * np.float32(1e-7) + x * np.float32(1e-7)
        p = p + e
        bits = jax.lax.bitcast_convert_type(p, jnp.int32)
        ee = ((bits >> 23) & 0xFF) - 127
        sc = jax.lax.bitcast_convert_type(
            (jnp.int32(127) - ee + jnp.int32(127)) << 23, jnp.float32
        )
        return p * sc * np.float32(0.5) + e

    def kern_percha(x_ref, o_ref, m_ref, *, C):
        s = pl.program_id(1)

        @pl.when(s == 0)
        def _():
            m_ref[:] = jnp.ones_like(m_ref)

        x = x_ref[...]
        for i in range(C):
            m_ref[i] = mul2ish(m_ref[i], x * np.float32(1.0 + 1e-6 * i))

        @pl.when(s == n_s - 1)
        def _():
            o_ref[...] = jnp.sum(m_ref[...], axis=0)

    def kern_plane(x_ref, o_ref, m_ref, *, C):
        s = pl.program_id(1)

        @pl.when(s == 0)
        def _():
            m_ref[:] = jnp.ones_like(m_ref)

        x = x_ref[...]
        xs = jnp.stack(
            [x * np.float32(1.0 + 1e-6 * i) for i in range(C)], axis=0
        )
        m_ref[:] = mul2ish(m_ref[...], xs)

        @pl.when(s == n_s - 1)
        def _():
            o_ref[...] = jnp.sum(m_ref[...], axis=0)

    x = jnp.asarray(np.random.rand(B, S).astype(np.float32) + 0.5)

    def run(kern):
        f = jax.jit(
            lambda x: pl.pallas_call(
                functools.partial(kern, C=C),
                grid=(B // TB, n_s),
                in_specs=[pl.BlockSpec((TB, TS), lambda ib, is_: (ib, is_))],
                out_specs=pl.BlockSpec((TB, TS), lambda ib, is_: (ib, ib * 0)),
                out_shape=jax.ShapeDtypeStruct((B, TS), jnp.float32),
                scratch_shapes=[pltpu.VMEM((C, TB, TS), jnp.float32)],
            )(x)
        )

        def step(xx):
            return jnp.sum(f(xx))

        sj = jax.jit(step)
        float(sj(x))

        def t(n):
            t0 = time.time()
            for _ in range(n):
                out = sj(x)
            float(out)
            return time.time() - t0

        t(4)
        t1 = t(8)
        t2 = t(16)
        dt = (t2 - t1) / 8
        if dt <= 0:
            dt = t2 / 16
        # ~10 ops per element-channel (8 mul2ish + 1 scale mul + stack)
        return B * S * C * 10 / dt / 1e12

    print({
        "percha_tops": round(run(kern_percha), 3),
        "plane_tops": round(run(kern_plane), 3),
        "C": C,
    })


if __name__ == "__main__":
    main()
