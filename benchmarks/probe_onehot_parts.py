"""Probe: where did the in-kernel one-hot front's 90 ms go?

probe_exact_stages after the r3 rewrite: kernel 20.6 -> 111 ms. Variants:
  k0_slice   read (TB,54,TS) gall block, 54 sublane slices, sum
  k1_front   full one-hot front: per-b MXU sels + stack(axis=1) + df mul
  k2_nostack per-b MXU sels consumed WITHOUT the (54,TB,TS) stack
  k3_justdot per-b MXU sels, summed per-b (no stack, no df)
  k4_iota    one-hot build only (iota compare), no dot

Usage: python benchmarks/probe_onehot_parts.py (serialize TPU use).
"""

import functools
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax

    from demuxlet_tpu.utils.jaxcfg import enable_compilation_cache

    enable_compilation_cache()
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from demuxlet_tpu.ops import pallas_pair_exact as PE

    B, S = 2048, 1024
    TB, TS = PE.TB, PE.TS
    C3 = 54
    rng = np.random.default_rng(0)
    gall_h = rng.random((B, C3, S), dtype=np.float32)
    codes_h = rng.integers(0, 82, size=(2, B, S)).astype(np.int32)
    tT_h = (rng.random((C3, 128), dtype=np.float32) + 0.5)
    gall = jax.device_put(jnp.asarray(gall_h))
    codes = jax.device_put(jnp.asarray(codes_h))
    tT = jax.device_put(jnp.asarray(tT_h))
    interpret = jax.default_backend() != "tpu"

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
        ests = []
        for _ in range(3):
            t1 = run(iters)
            t2 = run(2 * iters)
            dt = (t2 - t1) / iters
            ests.append(dt if dt > 0 else t2 / (2 * iters))
        ests.sort()
        return ests[1] * 1e3

    def build(kernel, specs):
        return jax.jit(lambda *a: jnp.sum(pl.pallas_call(
            kernel,
            grid=(B // TB, S // TS),
            in_specs=specs,
            out_specs=pl.BlockSpec((8, 128), lambda ib, is_: (0, ib * 0)),
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 2**20),
            interpret=interpret,
        )(*a)))

    gall_spec = pl.BlockSpec((TB, C3, TS), lambda ib, is_: (ib, 0, is_))
    c_spec = pl.BlockSpec((2, TB, TS), lambda ib, is_: (0, ib, is_))
    t_spec = pl.BlockSpec((C3, 128), lambda ib, is_: (0, 0))

    def k0(g_ref, o_ref):
        acc = None
        for i in range(C3):
            p = g_ref[:, i, :]
            acc = p if acc is None else acc + p
        o_ref[...] = acc

    def k1(c_ref, t_ref, o_ref):
        c = c_ref[...]
        tt = t_ref[...]
        ph = plm = None
        for u in range(2):
            sel = PE._sel_rows(c[u], tt)
            h2, l2 = sel[: C3 // 3], sel[C3 // 3 : 2 * (C3 // 3)]
            if ph is None:
                ph, plm = h2, l2
            else:
                ph, plm = PE._mul2(ph, plm, h2, l2, False)
        o_ref[...] = jnp.sum(ph, axis=0) + jnp.sum(plm, axis=0)

    def k2(c_ref, t_ref, o_ref):
        c = c_ref[...]
        tt = t_ref[...]
        rid = jax.lax.broadcasted_iota(jnp.int32, (128, TS), 0)
        acc = jnp.zeros((TB, TS), jnp.float32)
        for u in range(2):
            for b in range(TB):
                oh = (rid == c[u, b : b + 1, :]).astype(jnp.float32)
                sel = jax.lax.dot_general(
                    tt, oh, (((1,), (0,)), ((), ())),
                    precision=jax.lax.Precision.HIGHEST,
                    preferred_element_type=jnp.float32,
                )  # (C3, TS)
                acc = acc + jnp.sum(sel, axis=0, keepdims=True)
        o_ref[...] = acc

    def k3(c_ref, t_ref, o_ref):
        c = c_ref[...]
        tt = t_ref[...]
        rid = jax.lax.broadcasted_iota(jnp.int32, (128, TS), 0)
        acc = jnp.zeros((C3, TS), jnp.float32)
        for u in range(2):
            for b in range(TB):
                oh = (rid == c[u, b : b + 1, :]).astype(jnp.float32)
                acc = acc + jax.lax.dot_general(
                    tt, oh, (((1,), (0,)), ((), ())),
                    precision=jax.lax.Precision.HIGHEST,
                    preferred_element_type=jnp.float32,
                )
        o_ref[...] = jnp.sum(acc, axis=0, keepdims=True) * jnp.ones(
            (8, 128), jnp.float32)

    def k4(c_ref, t_ref, o_ref):
        c = c_ref[...]
        rid = jax.lax.broadcasted_iota(jnp.int32, (128, TS), 0)
        acc = jnp.zeros((128, TS), jnp.float32)
        for u in range(2):
            for b in range(TB):
                acc = acc + (rid == c[u, b : b + 1, :]).astype(jnp.float32)
        o_ref[...] = acc[:8]

    res = {
        "k0_slice": timeit(build(k0, [gall_spec]), gall),
        "k1_front": timeit(build(k1, [c_spec, t_spec]), codes, tT),
        "k2_nostack": timeit(build(k2, [c_spec, t_spec]), codes, tT),
        "k3_justdot": timeit(build(k3, [c_spec, t_spec]), codes, tT),
        "k4_iota": timeit(build(k4, [c_spec, t_spec]), codes, tT),
    }
    print({k: round(v, 3) for k, v in res.items()})


if __name__ == "__main__":
    main()
