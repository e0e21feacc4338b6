"""VPU f32 throughput probe: independent vs dependent op chains in Mosaic.

Measures achievable f32 elementwise ops/s inside a Pallas kernel at two
ILP extremes, to locate the exact-mode pair kernel (~1 Top/s of df32
scalar-equivalent work) on the issue-width vs dependency-stall axis:

  indep  K independent mul-add streams per block (max ILP)
  chain  one serial mul-add chain (latency-bound floor)

Usage: python benchmarks/probe_vpu.py  (serialize — never overlap TPU procs).
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    from demuxlet_tpu.utils.jaxcfg import enable_compilation_cache

    enable_compilation_cache()

    B, S = 256, 512  # (32 sublane-tiles) x (4 lane-tiles)
    G = 16  # grid steps (amortize call overhead)
    REPS = 64  # mul-add pairs per stream per grid step
    K = 8  # independent streams

    def kern_indep(x_ref, o_ref):
        xs = [x_ref[...] * np.float32(1.0 + 1e-7 * i) for i in range(K)]
        a = np.float32(0.999999)
        b = np.float32(1e-9)
        for _ in range(REPS):
            xs = [x * a + b for x in xs]
        acc = xs[0]
        for x in xs[1:]:
            acc = acc + x
        o_ref[...] = acc

    def kern_chain(x_ref, o_ref):
        x = x_ref[...]
        a = np.float32(0.999999)
        b = np.float32(1e-9)
        for _ in range(REPS * K):
            x = x * a + b
        o_ref[...] = x

    x = jnp.asarray(np.random.rand(G * B, S).astype(np.float32))

    def run(kern, n_ops):
        f = jax.jit(
            lambda x: pl.pallas_call(
                kern,
                grid=(G,),
                in_specs=[pl.BlockSpec((B, S), lambda i: (i, i * 0))],
                out_specs=pl.BlockSpec((B, S), lambda i: (i, i * 0)),
                out_shape=jax.ShapeDtypeStruct((G * B, S), jnp.float32),
            )(x)
        )

        def step(xx):
            return jnp.sum(f(xx))

        step_j = jax.jit(step)
        float(step_j(x))

        def t(n):
            t0 = time.time()
            for _ in range(n):
                out = step_j(x)
            float(out)
            return time.time() - t0

        t(8)
        t1 = t(8)
        t2 = t(16)
        dt = (t2 - t1) / 8
        if dt <= 0:
            dt = t2 / 16
        return G * B * S * n_ops / dt / 1e12

    ops_indep = 2 * REPS * K + K  # mul+add per rep per stream + final adds
    ops_chain = 2 * REPS * K
    print({
        "indep_tops": round(run(kern_indep, ops_indep), 3),
        "chain_tops": round(run(kern_chain, ops_chain), 3),
        "shape": (B, S),
        "reps": REPS,
        "streams": K,
    })


if __name__ == "__main__":
    main()
