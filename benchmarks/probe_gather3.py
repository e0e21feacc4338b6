"""Probe: kill the exact-path gather costs (round 3).

probe_exact_stages (r2 final): pair gather 9.9 ms, g gather 16.9 ms,
kernel 20.6 ms, full 37.1 ms at B=2048. Gathers are ~45% of the step.
Candidates measured here on the real chip:

  g-stage (idx-gather of the fused (NSNP, 54) gps|gp0 hi|lo table):
    w0_takeT      take + XLA transpose to (54,B,S)   [current impl form]
    w1_take       take only, no transpose            [isolates transpose]
    w2_take64     take from a 64-ch padded table     [256 B pow2 rows]
    w4_takeT2     take + XLA transpose to (B,54,S)   [minor-dims only]
    w6_kslice     take + (B,54,S) transpose + PALLAS kernel consuming
                  (TB,54,TS) blocks via sublane channel slices
                  [the layout the pair kernel could adopt]

  pair-stage (code-pair LUT -> (3C,B,S) product planes):
    p0_take       current fused (R^2, 3C) take + transpose
    p1_onehot     PALLAS kernel: codes (U,B,S) i32 planes in, one-hot
                  over the R=82-row SINGLE-code table via per-cell-row
                  MXU matmuls (precision=HIGHEST -> exact bf16x3
                  selection), df-mul of the two row sets in VMEM.
                  Bit-exactness of the MXU selection checked vs np take.

Usage: python benchmarks/probe_gather3.py  (serialize TPU use).
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

    B, S, V, NSNP = 2048, 1024, 8, 4096
    TB, TS = 8, 128
    rng = np.random.default_rng(0)
    g54_h = rng.random((NSNP, 54), dtype=np.float32)
    idx_h = rng.integers(0, NSNP, size=(B, S)).astype(np.int32)
    g54 = jax.device_put(jnp.asarray(g54_h))
    g64 = jax.device_put(jnp.asarray(
        np.pad(g54_h, ((0, 0), (0, 10)))))
    idx = jax.device_put(jnp.asarray(idx_h))
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

    @jax.jit
    def w0_takeT(idx):
        g = jnp.transpose(jnp.take(g54, idx, axis=0), (2, 0, 1))
        return jnp.sum(g)

    @jax.jit
    def w1_take(idx):
        return jnp.sum(jnp.take(g54, idx, axis=0))

    @jax.jit
    def w2_take64(idx):
        return jnp.sum(jnp.take(g64, idx, axis=0)[..., :54])

    @jax.jit
    def w4_takeT2(idx):
        g = jnp.transpose(jnp.take(g54, idx, axis=0), (0, 2, 1))
        return jnp.sum(g)

    # w6: (B,54,S) layout consumed by a kernel via sublane channel slices
    def kslice_kernel(g_ref, o_ref):
        acc = None
        for c in range(54):
            p = g_ref[:, c, :]  # (TB, TS)
            acc = p if acc is None else acc + p
        o_ref[...] = jnp.broadcast_to(
            jnp.sum(acc, axis=0, keepdims=True), (8, 128))

    kslice = pl.pallas_call(
        kslice_kernel,
        grid=(B // TB, S // TS),
        in_specs=[pl.BlockSpec((TB, 54, TS), lambda ib, is_: (ib, 0, is_))],
        out_specs=pl.BlockSpec((8, 128), lambda ib, is_: (0, ib * 0)),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        interpret=interpret,
    )

    @jax.jit
    def w6_kslice(idx):
        g = jnp.transpose(jnp.take(g54, idx, axis=0), (0, 2, 1))
        return jnp.sum(kslice(g))

    # w7: take (B,S,54) + kernel reads (TB,TS,54) blocks, transposing
    # per cell row via an MXU identity matmul (exact under HIGHEST)
    ident = jax.device_put(jnp.asarray(np.eye(TS, dtype=np.float32)))

    def ktmxu_kernel(g_ref, i_ref, o_ref):
        I = i_ref[...]
        acc = None
        for b in range(TB):
            x = g_ref[b]  # (TS, 54)
            xt = jax.lax.dot_general(
                x, I, (((0,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32,
            )  # (54, TS)
            acc = xt if acc is None else acc + xt
        o_ref[...] = jnp.broadcast_to(
            jnp.sum(acc, axis=1, keepdims=True), (54, 128))

    ktmxu = pl.pallas_call(
        ktmxu_kernel,
        grid=(B // TB, S // TS),
        in_specs=[
            pl.BlockSpec((TB, TS, 54), lambda ib, is_: (ib, is_, 0)),
            pl.BlockSpec((TS, TS), lambda ib, is_: (ib * 0, ib * 0)),
        ],
        out_specs=pl.BlockSpec((54, 128), lambda ib, is_: (0, ib * 0)),
        out_shape=jax.ShapeDtypeStruct((54, 128), jnp.float32),
        interpret=interpret,
    )

    @jax.jit
    def w7_ktmxu(idx):
        g = jnp.take(g54, idx, axis=0)  # (B, S, 54)
        return jnp.sum(ktmxu(g, ident))

    # w8/w9: FORCED (C,B,S) materialization — take + transpose(2,0,1)
    # consumed by a kernel with leading-dim channel blocks (the real
    # kernel's layout). w9 = 36-channel table (df VALUE pairs, no exp
    # plane). w10 = w8 + neutral-row idx redirect (no XLA where).
    def lead_kernel(C):
        def k(g_ref, o_ref):
            acc = None
            for i in range(C):
                pp = g_ref[i]
                acc = pp if acc is None else acc + pp
            o_ref[...] = acc
        return pl.pallas_call(
            k,
            grid=(B // TB, S // TS),
            in_specs=[pl.BlockSpec((C, TB, TS),
                                   lambda ib, is_: (0, ib, is_))],
            out_specs=pl.BlockSpec((8, 128), lambda ib, is_: (0, ib * 0)),
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            interpret=interpret,
        )

    lead54 = lead_kernel(54)
    lead36 = lead_kernel(36)
    g36 = jax.device_put(jnp.asarray(g54_h[:, :36].copy()))
    g55 = jax.device_put(jnp.asarray(
        np.concatenate([g54_h, np.zeros((1, 54), np.float32)], axis=0)))
    mskb = jax.device_put(jnp.asarray(
        rng.random((B, S)) < 0.9))

    @jax.jit
    def w8_lead54(idx):
        g = jnp.transpose(jnp.take(g54, idx, axis=0), (2, 0, 1))
        return jnp.sum(lead54(g))

    @jax.jit
    def w9_lead36(idx):
        g = jnp.transpose(jnp.take(g36, idx, axis=0), (2, 0, 1))
        return jnp.sum(lead36(g))

    @jax.jit
    def w10_redirect(idx, msk):
        idx_m = jnp.where(msk, idx, NSNP)
        g = jnp.transpose(jnp.take(g55, idx_m, axis=0), (2, 0, 1))
        return jnp.sum(lead54(g))

    neutral_c = np.zeros((54, 1, 1), dtype=np.float32)
    neutral_c[0:24:3] = 1.0

    @jax.jit
    def w11_where(idx, msk):
        g = jnp.transpose(jnp.take(g54, idx, axis=0), (2, 0, 1))
        g = jnp.where(msk[None], g, jnp.asarray(neutral_c))
        return jnp.sum(lead54(g))

    # ---- pair stage ----
    R = 82
    C3 = 54  # 3C with C=18
    tab_h = (rng.random((R * R, C3), dtype=np.float32) + 0.5)
    tab = jax.device_put(jnp.asarray(tab_h))
    codes_h = rng.integers(0, R, size=(B, S, 2)).astype(np.int32)
    codes = jax.device_put(jnp.asarray(codes_h))
    codesP = jax.device_put(jnp.asarray(
        np.transpose(codes_h, (2, 0, 1)).copy()))  # (2, B, S)

    @jax.jit
    def p0_take(codes):
        pc = codes[..., 0] * R + codes[..., 1]
        g = jnp.transpose(jnp.take(tab, pc, axis=0), (2, 0, 1))
        return jnp.sum(g)

    # single-code table, padded to 128 rows for the MXU contraction
    stab_h = np.zeros((128, C3), dtype=np.float32)
    stab_h[:R] = rng.random((R, C3), dtype=np.float32) + 0.5
    stabT = jax.device_put(jnp.asarray(stab_h.T.copy()))  # (54, 128)

    def _sel_rows(c_plane, tT):
        """MXU one-hot selection: c_plane (TB,TS) int32 -> (C3,TB,TS)."""
        outs = []
        rid = jax.lax.broadcasted_iota(jnp.int32, (128, TS), 0)
        for b in range(TB):
            cb = c_plane[b : b + 1, :]
            oh = (rid == cb).astype(jnp.float32)  # (128, TS)
            sel = jax.lax.dot_general(
                tT, oh, (((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32,
            )  # (C3, TS)
            outs.append(sel)
        return jnp.stack(outs, axis=1)  # (C3, TB, TS)

    def onehot_kernel(c_ref, t_ref, o_ref, acc_ref, *, n_s):
        s_step = pl.program_id(1)

        @pl.when(s_step == 0)
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        tT = t_ref[...]  # (C3, 128) f32
        r0 = _sel_rows(c_ref[0], tT)
        r1 = _sel_rows(c_ref[1], tT)
        prod = r0 * r1
        s2 = jnp.sum(prod, axis=2)  # (C3, TB)
        acc_ref[...] += jnp.broadcast_to(
            jnp.sum(s2, axis=1, keepdims=True), acc_ref.shape)

        @pl.when(s_step == n_s - 1)
        def _():
            o_ref[...] = acc_ref[...]

    onehot = pl.pallas_call(
        functools.partial(onehot_kernel, n_s=S // TS),
        grid=(B // TB, S // TS),
        in_specs=[
            pl.BlockSpec((2, TB, TS), lambda ib, is_: (ib * 0, ib, is_)),
            pl.BlockSpec((C3, 128), lambda ib, is_: (ib * 0, ib * 0)),
        ],
        out_specs=pl.BlockSpec((C3, 128), lambda ib, is_: (0, ib * 0)),
        out_shape=jax.ShapeDtypeStruct((C3, 128), jnp.float32),
        scratch_shapes=[pltpu.VMEM((C3, 128), jnp.float32)],
        interpret=interpret,
    )

    @jax.jit
    def p1_onehot(codesP):
        return jnp.sum(onehot(codesP, stabT))

    # exactness check of MXU one-hot selection vs a host take
    def sel_kernel(c_ref, t_ref, o_ref):
        o_ref[...] = _sel_rows(c_ref[0], t_ref[...])

    selk = pl.pallas_call(
        sel_kernel,
        grid=(B // TB, S // TS),
        in_specs=[
            pl.BlockSpec((2, TB, TS), lambda ib, is_: (ib * 0, ib, is_)),
            pl.BlockSpec((C3, 128), lambda ib, is_: (ib * 0, ib * 0)),
        ],
        out_specs=pl.BlockSpec((C3, TB, TS), lambda ib, is_: (0, ib, is_)),
        out_shape=jax.ShapeDtypeStruct((C3, B, S), jnp.float32),
        interpret=interpret,
    )
    got = np.asarray(jax.jit(selk)(codesP, stabT))
    want = np.transpose(stab_h[codes_h[:, :, 0]], (2, 0, 1))
    exact = bool(np.array_equal(got, want))

    res = {
        "w0_takeT": timeit(w0_takeT, idx),
        "w1_take": timeit(w1_take, idx),
        "w2_take64": timeit(w2_take64, idx),
        "w4_takeT2": timeit(w4_takeT2, idx),
        "w6_kslice": timeit(w6_kslice, idx),
        "w7_ktmxu": timeit(w7_ktmxu, idx),
        "w8_lead54": timeit(w8_lead54, idx),
        "w9_lead36": timeit(w9_lead36, idx),
        "w10_redirect": timeit(w10_redirect, idx, mskb),
        "w11_where": timeit(w11_where, idx, mskb),
        "p0_take": timeit(p0_take, codes),
        "p1_onehot": timeit(p1_onehot, codesP),
        "onehot_bitexact": exact,
    }
    print({k: (round(v, 3) if isinstance(v, float) else v)
           for k, v in res.items()})


if __name__ == "__main__":
    main()
