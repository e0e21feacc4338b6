#!/usr/bin/env python
"""Probe: does Mosaic contract `mul + sub` into a single-rounded FMA?

If a Pallas TPU kernel computing
    p = a * b
    e = opaque_cse_break(a) * b - p
yields e == the EXACT f32 rounding residual of a*b (checked in f64 on
host), the backend fused the second multiply with the subtract into an
FMA — and two_prod can drop the Veltkamp split (~17 ops -> 2), roughly
halving the df32 exact kernel's op count (ops/pallas_pair_exact.py).
If e == 0, the backend CSE'd or didn't contract; if e is something else,
contraction is double-rounded. Either non-exact outcome keeps the split.

Run standalone on the real chip (serialize with other TPU work).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    from demuxlet_tpu.utils.jaxcfg import enable_compilation_cache

    enable_compilation_cache()

    F32_MAX = np.float32(3.4028235e38)

    def kernel(a_ref, b_ref, p_ref, e_ref):
        a = a_ref[:]
        b = b_ref[:]
        p = a * b
        # clamp = value-preserving CSE breaker; the second a*b stays a
        # distinct multiply that the backend MAY contract with the sub
        a2 = jnp.minimum(jnp.maximum(a, -F32_MAX), F32_MAX)
        e = a2 * b - p
        p_ref[:] = p
        e_ref[:] = e

    rng = np.random.default_rng(7)
    a = rng.uniform(0.5, 2.0, (8, 128)).astype(np.float32)
    b = rng.uniform(0.5, 2.0, (8, 128)).astype(np.float32)

    p, e = pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct(a.shape, jnp.float32),
            jax.ShapeDtypeStruct(a.shape, jnp.float32),
        ],
    )(a, b)
    p = np.asarray(p)
    e = np.asarray(e)
    exact = (a.astype(np.float64) * b.astype(np.float64)
             - p.astype(np.float64)).astype(np.float32)
    n_exact = int((e == exact).sum())
    n_zero = int((e == 0).sum())
    n_res_zero = int((exact == 0).sum())
    print(f"residual matches exact: {n_exact}/{e.size}")
    print(f"residual zero:          {n_zero}/{e.size} "
          f"(truly-zero residuals: {n_res_zero})")
    if n_exact == e.size and n_zero < e.size:
        print("VERDICT: FMA contraction ACTIVE and single-rounded -> "
              "fast two_prod is sound")
    elif n_zero == e.size:
        print("VERDICT: no contraction (or CSE) -> keep Veltkamp split")
    else:
        print("VERDICT: inconsistent residuals -> keep Veltkamp split")


if __name__ == "__main__":
    main()
