"""Pallas TPU kernel for the doublet pair-search pass in df32 precision
("exact" mode on TPU).

The byte-parity contract (models/likelihood.py) needs ~1e-10 absolute
agreement with the reference's f64 loops — far tighter than f32 but well
within double-single f32 (ops/df32.py, ~6e-15/op). The TPU has no f64
ALUs, so the XLA f64 kernels run ~50x slower than fast mode; computing in
df32 recovers most of the gap while keeping exact-mode outputs at
reference-printed precision.

Arithmetic strategy — probability-domain products, like the reference
itself (cmd_cram_demuxlet.cpp:606-663), NOT exp(sum of logs):
  * XLA front (gathers only): ONE pair-code LUT gather per two UMIs
    (host-precomputed f64-exact products, stored as mantissa df + f32
    exponent planes over channel-DEDUPED columns — the A*9 mixture
    columns collapse to the unique p values and share the three singlet
    GL columns; all three planes fused into a single wide take);
    leftover pairs multiplied in df with exponent renormalization — no
    df exp anywhere. Everything runs in channel-LEADING (C, B, S) layout
    so each df op fills all 128 lanes, and the gps|gp0 hi|lo gathers
    fuse into one wide take (probe_gather_variants: ~4x over split
    takes). Pass 1 shares the pair-code gather.
  * In-kernel normalization front: the telescoped max-division, +1e-6
    smoothing and final renormalization (mixture table t) and the pass-1
    GL table run in the kernel preamble from the raw product planes —
    as XLA stages they cost ~9 ms/1024-cell block in HBM round trips
    (every df op in the chain materialized a (C,B,S) array and the
    reductions broke fusion); per tile they are VMEM-resident VPU ops.
  * Pallas kernel (VPU): per-(cell,slot) U[j,a,m] = sum_l g[j,l] t[a,l,m];
    inner[j,k,a] = sum_m g[k,m] U[j,a,m]; the slot accumulation multiplies
    inner into a per-(j,k,a) df mantissa with exponent tracking — ONE df
    log per (j,k,a) per cell-tile at the end (a log per slot-step was the
    dominant cost), followed by a roll-butterfly compensated lane
    reduction (a plain f32 lane sum would lose ~1e-4). The alpha == 0
    plane accumulates separably (a0_sep) and the alpha == 0.5 plane only
    for j <= k (sym_a mirror) — see _pair_kernel_df.

Padded slots are exactly neutral: none-codes hit the LUT's 1.0 row, so
the slot's product table is all-ones, normalizing to t == 1 exactly, and
neutral (1,0,0) gps rows make inner == 1 -> the mantissa product and
exponent stay untouched (pinned by the empty-block test).

Kernel tile: TB=8 cells x TS=128 slots. All df product accumulators
(llk_ab channels + llks00 + pass-1 + a0_sep separable factors) live in
ONE stacked (n_acc, TB, TS) scratch triple updated by plane-wide df muls
in 64-channel chunks: per-channel `ref[i] = f(ref[i], x)` updates
serialize in Mosaic (no alias analysis across indices; measured ~4x
slower, benchmarks/probe_scratch_acc.py — the rewrite took the kernel
from 22.7 to 9.8 ms/1024-cell block at V=8, A=5), while one full-width
op blows the 16 MB scoped-VMEM limit on its transients.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from demuxlet_tpu.ops import df32 as df

TB = 8  # cells per tile (the native f32 sublane tile)
TS = 128  # slots per tile (lanes)
_ACC_CHUNK = 64  # stacked-accumulator channels per plane op (VMEM bound)

_SMOOTH = 1e-6
_K_HI = np.float32(1.0 / (1.0 + _SMOOTH))
_K_SMOOTH = (
    _K_HI,
    np.float32(np.float64(1.0 / (1.0 + _SMOOTH)) - np.float64(_K_HI)),
)
# 1e-6 as a df pair: f32(1e-6) alone is 1.2e-14 off, which shows up as
# ~2.5e-9 RELATIVE error on t values near the smoothing floor
_SMOOTH_DF = (
    np.float32(_SMOOTH),
    np.float32(np.float64(_SMOOTH) - np.float64(np.float32(_SMOOTH))),
)


def _renorm(h, l, e_acc):
    """Rescale a positive df mantissa to [1, 2), accumulating the shed
    exponent into e_acc (f32 integer-valued; exact to 2^24)."""
    bits = df._bits(h)
    ee = ((bits >> 23) & 0xFF) - 127
    sc = df._pow2(-ee)
    return h * sc, l * sc, e_acc + ee.astype(jnp.float32)


def _lane_prod_df(h, l, e, fence, width=TS, axis=1):
    """df32 PRODUCT over the lane axis via a roll butterfly, with f32
    exponent-sum tracking. After log2(width) stages every lane holds the
    full product; the caller reads column 0 and takes the log in XLA —
    one log per (j,k,a) per cell ROW instead of one per lane (the in-
    kernel df.log + compensated lane-sum was ~60%% of the finish cost).

    Mantissas enter in [1, 2); the hi product of n in-range mantissas
    stays < 2^n, so no per-stage renorm is needed until the factor count
    approaches the f32 exponent range (renorm at > 64). Tree order
    differs from the reference's sequential slot order — irrelevant at
    df precision (~1e-13 << printed 1e-4/1e-5)."""
    n_acc = 1
    sh = width // 2
    while sh >= 1:
        if 2 * n_acc > 64:
            h, l, e = _renorm(h, l, e)
            n_acc = 1
        # np.int32: a bare Python int traces as i64 under x64 and Mosaic's
        # dynamic_rotate requires an i32 shift
        h2 = pltpu.roll(h, shift=np.int32(sh), axis=axis)
        l2 = pltpu.roll(l, shift=np.int32(sh), axis=axis)
        e = e + pltpu.roll(e, shift=np.int32(sh), axis=axis)
        h, l = _mul2(h, l, h2, l2, fence)
        n_acc *= 2
        sh //= 2
    return h, l, e


def _presplit(h):
    """Veltkamp halves of a plane, computed once and reused by every
    product that touches it (two_prod re-splits both operands on every
    call — the dominant cost when operands are reused V or A times)."""
    c = np.float32(df.SPLIT) * h
    hi = c - (c - h)
    return hi, h - hi


def _mul_raw(a, b, fence):
    """df*df with presplit operands -> UNNORMALIZED (p, e).

    a, b are (h, l, sp_hi, sp_lo) quads. p is the rounded hi product, e
    the exact split residual plus the lo cross terms (|e| <= ~4 ulp(p));
    callers renormalize once per dot, not per product.

    fence: guard p against downstream FMA contraction (needed under
    XLA/LLVM, i.e. interpret mode; Mosaic does not contract mul+add —
    benchmarks/probe_fma.py verdict on this backend — so the real-TPU
    trace elides the clamps)."""
    ah, al, a0, a1 = a
    bh, bl, b0, b1 = b
    p = ah * bh
    if fence:
        p = df._opaque(p)
    e = ((a0 * b0 - p) + a0 * b1 + a1 * b0) + a1 * b1
    return p, e + (ah * bl + al * bh)


def _mul2(ah, al, bh, bl, fence):
    """df*df for unsplit operands (used where neither side is reused)."""
    p = ah * bh
    if fence:
        p = df._opaque(p)
    a0, a1 = _presplit(ah)
    b0, b1 = _presplit(bh)
    e = ((a0 * b0 - p) + a0 * b1 + a1 * b0) + a1 * b1
    return df.fast_two_sum(p, e + (ah * bl + al * bh))


def _mul_pair(a, b, fence):
    """quad*quad -> normalized df pair."""
    return df.fast_two_sum(*_mul_raw(a, b, fence))


def _dot3(ga, gb, gc, ta, tb, tc, fence):
    """sum_l g[l]*t[l] in df via Dot2: exact two_sum chain on the hi
    products, all residuals accumulated in f32 (terms are non-negative
    probabilities, ~2^-46 relative — no cancellation), one final
    renormalization. Args are presplit quads."""
    p1, e1 = _mul_raw(ga, ta, fence)
    p2, e2 = _mul_raw(gb, tb, fence)
    p3, e3 = _mul_raw(gc, tc, fence)
    s, t1 = df.two_sum(p1, p2)
    s, t2 = df.two_sum(s, p3)
    return df.fast_two_sum(s, ((e1 + e2) + (e3 + t1)) + t2)


def _quad(h, l):
    s0, s1 = _presplit(h)
    return (h, l, s0, s1)


def _acc_slots(V, A, a0_zero, a0_sep, sym_a):
    """Ordered registry of the kernel's df product accumulators.

    Returns (keys, index) where keys[i] identifies accumulator slot i in
    the stacked (n_acc, TB, TS) scratch and index maps key -> slot. Keys:
      ('ab', j, k, a)  llk_ab channels not covered by a0_sep/sym_a
      ('m0', a)        llks00 channels (a >= 1 when a0_sep)
      ('s', j)         pass-1 singlet products, j == V is gp0
      ('d', j) ('gs', k) ('u00',) ('g0s',)  a0_sep separable factors
    The accumulators live in ONE stacked scratch updated by a single
    plane-wide df mul per slot step: per-channel `ref[i] = f(ref[i])`
    updates serialize in Mosaic (no alias analysis across indices) and
    measured ~4x slower (benchmarks/probe_scratch_acc.py)."""
    keys = []
    for j in range(V):
        for k in range(V):
            for a in range(A):
                if a0_sep and a == 0:
                    continue
                if sym_a == a and j > k:
                    continue
                keys.append(("ab", j, k, a))
    for a in range(A):
        if a0_sep and a == 0:
            continue
        keys.append(("m0", a))
    for j in range(V + 1):
        keys.append(("s", j))
    if a0_sep:
        keys += [("d", j) for j in range(V)]
        keys += [("gs", k) for k in range(V)]
        keys += [("u00",), ("g0s",)]
    return keys, {k: i for i, k in enumerate(keys)}


def _pair_kernel_df(
    ph_ref, pl_ref, pe_ref, gall_ref, mskf_ref,
    outh_ref, outl_ref, oute_ref, out0h_ref, out0l_ref, out0e_ref,
    outsh_ref, outsl_ref, outse_ref,
    mh_ref, ml_ref, me_ref,
    *, V, A, n_s, fence, a0_zero, n_tch, expand, a0_sep, sym_a,
    cmask, gsel,
):
    """a0_sep: the alpha == 0 plane factorizes COMPLETELY — llk_ab[j,k,0]
    = (prod_s d_s[j]) * (prod_s gsum_s[k]) with d[j] = sum_l g[j,l] t0[l]
    and gsum[k] = sum_m g[k,m] — so instead of V*V accumulators the
    kernel keeps V+V separable ones and the XLA caller combines logs.
    sym_a: the alpha == 0.5 plane is (j,k)-symmetric (p(l,m,.5) =
    p(m,l,.5), bit-identical via channel dedup), so j > k entries are
    skipped and mirrored at finish. Both cut the per-slot accumulate
    count and the finish butterflies (~35%% for the A=5 bench grid, ~60%%
    for the default [0, .5] grid).

    All accumulators share ONE stacked (n_acc, TB, TS) scratch triple
    (mantissa hi, lo, exponent) updated by a single plane-wide df mul +
    renorm per slot step — see _acc_slots."""
    s_step = pl.program_id(1)
    keys, slot = _acc_slots(V, A, a0_zero, a0_sep, sym_a)
    n_acc = len(keys)
    # interpret mode (XLA CPU) has no scoped-VMEM limit and runs the
    # full-width op ~2x faster than the chunked form
    chunk = n_acc if fence else _ACC_CHUNK

    @pl.when(s_step == 0)
    def _():
        mh_ref[:] = jnp.ones_like(mh_ref)
        ml_ref[:] = jnp.zeros_like(ml_ref)
        me_ref[:] = jnp.zeros_like(me_ref)

    # Normalize the raw pair-code product planes into the mixture table t
    # and the pass-1 GL table IN VMEM: the XLA-front versions of these
    # stages cost ~9 ms/1024-cell block in HBM round trips (each df op in
    # the chain materializes a (C,B,S) f32 array; the reductions break
    # fusion), while per-tile they are a few hundred VPU ops per slot.
    # Masked slots carry none-row products (exact 1s), so t == 1 there
    # with no mask; the GL table needs the explicit neutral substitution.
    ph = ph_ref[:]
    plm = pl_ref[:]
    pe = pe_ref[:]
    t_h, t_l = _mixture_table_df(ph, plm, pe, axis=0,
                                 chan_mask=_cmask_arr(cmask, n_tch))
    # deduped mixture channels: quad/presplit once per UNIQUE column, then
    # expand to the logical a*9 + l*3 + m order via the static map
    t_u = [_quad(t_h[x], t_l[x]) for x in range(n_tch)]
    t = [t_u[expand[x]] for x in range(A * 9)]
    glh, gll = _gl_table_df(
        jnp.stack([ph[i] for i in gsel]),
        jnp.stack([plm[i] for i in gsel]),
        jnp.stack([pe[i] for i in gsel]),
    )
    mb = mskf_ref[0] != np.float32(0.0)
    one, zero = np.float32(1.0), np.float32(0.0)
    glt = [
        _quad(jnp.where(mb, glh[0], one), jnp.where(mb, gll[0], zero)),
        _quad(jnp.where(mb, glh[1], zero), jnp.where(mb, gll[1], zero)),
        _quad(jnp.where(mb, glh[2], zero), jnp.where(mb, gll[2], zero)),
    ]
    # gall carries gps-hi|gp0-hi|gps-lo|gp0-lo in one plane stack (the
    # XLA-side 4-way slice of the fused gather measured 2.4x slower than
    # handing the whole stack to the kernel — probe_gather_variants v13)
    W3 = V * 3 + 3
    g = [_quad(gall_ref[i], gall_ref[W3 + i]) for i in range(V * 3)]
    g0 = [_quad(gall_ref[V * 3 + i], gall_ref[W3 + V * 3 + i])
          for i in range(3)]

    inners = [None] * n_acc

    def put(key, inner):
        inners[slot[key]] = inner

    # alpha[0] == 0 degeneracy (static): t[0,l,m] is bit-identical across
    # m (p = 0.5l + (m-l)*0.5*alpha depends only on l at alpha=0, and the
    # LUT/normalization pipeline applies identical ops to identical
    # columns), so inner[j,k,0] = (sum_l g[j,l] t[0,l]) * (sum_m g[k,m]).
    # With a0_sep the two factors accumulate separably (see docstring);
    # otherwise one df mul replaces the 3-term dot per (j,k).
    if a0_zero:
        gsum = []
        for k in range(V):
            s1 = df.add_pos(g[k * 3][0], g[k * 3][1],
                            g[k * 3 + 1][0], g[k * 3 + 1][1])
            s1 = df.add_pos(*s1, g[k * 3 + 2][0], g[k * 3 + 2][1])
            gsum.append(_quad(*s1))
        g0sum = df.add_pos(g0[0][0], g0[0][1], g0[1][0], g0[1][1])
        g0sum = _quad(*df.add_pos(*g0sum, g0[2][0], g0[2][1]))
    if a0_sep:
        for k in range(V):
            put(("gs", k), (gsum[k][0], gsum[k][1]))
        put(("g0s",), (g0sum[0], g0sum[1]))

    for j in range(V):
        u = []
        for a in range(A):
            if a0_zero and a == 0:
                d = _quad(*_dot3(
                    g[j * 3], g[j * 3 + 1], g[j * 3 + 2],
                    t[0], t[3], t[6], fence,
                ))
                u += [d, d, d]
                continue
            for m in range(3):
                u.append(_quad(*_dot3(
                    g[j * 3], g[j * 3 + 1], g[j * 3 + 2],
                    t[a * 9 + m], t[a * 9 + 3 + m], t[a * 9 + 6 + m],
                    fence,
                )))
        if a0_sep:
            put(("d", j), (u[0][0], u[0][1]))
        for k in range(V):
            for a in range(A):
                if sym_a == a and j > k:
                    continue  # mirrored from (k, j, a) at finish
                if a0_zero and a == 0:
                    if a0_sep:
                        continue  # separable accumulators above
                    inner = _mul_pair(gsum[k], u[0], fence)
                else:
                    inner = _dot3(
                        g[k * 3], g[k * 3 + 1], g[k * 3 + 2],
                        u[a * 3], u[a * 3 + 1], u[a * 3 + 2], fence,
                    )
                put(("ab", j, k, a), inner)

    # background pair term llks00 (:700-709), host-exact gp0 planes
    for a in range(A):
        if a0_zero and a == 0:
            u00 = _quad(*_dot3(g0[0], g0[1], g0[2],
                               t[0], t[3], t[6], fence))
            if a0_sep:
                put(("u00",), (u00[0], u00[1]))
                continue
            inner0 = _mul_pair(g0sum, u00, fence)
        else:
            u0 = [_quad(*_dot3(
                      g0[0], g0[1], g0[2],
                      t[a * 9 + m], t[a * 9 + 3 + m], t[a * 9 + 6 + m],
                      fence))
                  for m in range(3)]
            inner0 = _dot3(g0[0], g0[1], g0[2], u0[0], u0[1], u0[2], fence)
        put(("m0", a), inner0)

    # pass 1 (:415-461): contrib = sum_l gl[l] * gps[j,l]; the XLA front
    # ships the normalized+smoothed GL table, this kernel accumulates the
    # per-cell slot product (one log per cell at the end)
    for j in range(V + 1):
        src = g0 if j == V else g[j * 3 : j * 3 + 3]
        put(("s", j),
            _dot3(glt[0], glt[1], glt[2], src[0], src[1], src[2], fence))

    # Plane-wide accumulate: stack the per-slot inner pairs and fold them
    # into the scratch with ONE df mul per 64-channel chunk (the
    # per-channel RMW form serializes; a single full-width op blows the
    # 16 MB scoped-VMEM limit on its transients at V=8, A=5).
    # Renorm every THIRD step (+ the last, so the finish butterfly sees
    # [1,2) mantissas): inner >= ~1e-6 (smoothing floor) so three
    # unrenormalized muls keep the mantissa >= ~1e-18 and its lo limb
    # >= ~1e-26 — comfortably above the f32 denormal flush (~1.2e-38)
    # that would silently drop the lo limb at every-4 or beyond.
    # np.int32 literals: bare Python ints promote the traced i32 scalar
    # to i64 under x64 (the bench/CLI enable x64) and the conversion
    # recurses — same pitfall as the index_map `ib * 0` notes
    do_rn = (jax.lax.rem(s_step, np.int32(3)) == np.int32(2)) | (
        s_step == np.int32(n_s - 1)
    )
    _fold_acc(inners, mh_ref, ml_ref, me_ref, do_rn, chunk, fence)

    @pl.when(s_step == n_s - 1)
    def _():
        # Butterfly-PRODUCT over lanes, one chunk of the stacked scratch
        # at a time (same VMEM-transient bound as the accumulate);
        # outputs are (mantissa hi, mantissa lo, exponent) — the caller
        # takes the log in XLA (elementwise over (B, V*V*A), negligible
        # there). Channels skipped by a0_sep emit the neutral (1, 0, 0)
        # triple (log == 0; the caller overwrites them from the separable
        # accumulators); sym_a mirror channels reuse the (k, j) slot.
        rows = _butterfly_rows(mh_ref, ml_ref, me_ref, n_acc, chunk, fence)

        def write(refs, picks):
            one = jnp.ones_like(rows[0][0])
            zero = jnp.zeros_like(one)
            cols = [[], [], []]
            for key in picks:
                res = (one, zero, zero) if key is None else rows[slot[key]]
                for c, v in zip(cols, res):
                    c.append(v)
            for ref, c in zip(refs, cols):
                while len(c) < ref.shape[1]:
                    c.append(zero)
                ref[:] = jnp.stack(c, axis=1)

        def ab_pick(i):
            a = i % A
            jk = i // A
            j, k = jk // V, jk % V
            if a0_sep and a == 0:
                return None
            if sym_a == a and j > k:
                return ("ab", k, j, a)
            return ("ab", j, k, a)

        write((outh_ref, outl_ref, oute_ref),
              [ab_pick(i) for i in range(V * V * A)])
        write((out0h_ref, out0l_ref, out0e_ref),
              [None if (a0_sep and a == 0) else ("m0", a)
               for a in range(A)])
        sing_picks = [("s", j) for j in range(V + 1)]
        if a0_sep:
            sing_picks += [("d", j) for j in range(V)]
            sing_picks += [("gs", k) for k in range(V)]
            sing_picks += [("u00",), ("g0s",)]
        write((outsh_ref, outsl_ref, outse_ref), sing_picks)


def _log_mantissa(mh, ml, ee):
    """(mantissa, exponent) kernel outputs -> df log values (XLA side)."""
    lgh, lgl = df.log(mh, ml)
    th_, tl_ = df.two_prod(ee, df._LN2_HI)
    tl_ = tl_ + ee * df._LN2_LO
    return df.add(lgh, lgl, th_, tl_)


def _call_pair_kernel_df(prod, gall, mskf, V, A, interpret, gsel,
                         a0_zero=False, expand=None, sym_a=None,
                         cmask=None):
    ph, plm, pe = prod
    n_tch, B, S = ph.shape
    if expand is None:
        expand = tuple(range(A * 9))
    a0_sep = a0_zero and 3 * V + 3 <= 128
    n_sing = (3 * V + 3) if a0_sep else (V + 1)
    n_s = S // TS
    n_acc = len(_acc_slots(V, A, a0_zero, a0_sep, sym_a)[0])
    w_ab = -(-(V * V * A) // 128) * 128
    kernel = functools.partial(_pair_kernel_df, V=V, A=A, n_s=n_s,
                               fence=bool(interpret), a0_zero=a0_zero,
                               n_tch=n_tch, expand=tuple(expand),
                               a0_sep=a0_sep, sym_a=sym_a,
                               cmask=cmask, gsel=tuple(gsel),
                               )
    in_spec3 = lambda C: pl.BlockSpec((C, TB, TS), lambda ib, is_: (ib * 0, ib, is_))
    out_spec = lambda W: pl.BlockSpec((TB, W), lambda ib, is_: (ib, ib * 0))
    shp = lambda W: jax.ShapeDtypeStruct((B, W), jnp.float32)
    outs = pl.pallas_call(
        kernel,
        grid=(B // TB, n_s),
        in_specs=[in_spec3(n_tch), in_spec3(n_tch), in_spec3(n_tch),
                  in_spec3(2 * (V * 3 + 3)), in_spec3(1)],
        out_specs=[out_spec(w_ab)] * 3 + [out_spec(128)] * 6,
        out_shape=[shp(w_ab)] * 3 + [shp(128)] * 6,
        scratch_shapes=[
            pltpu.VMEM((n_acc, TB, TS), jnp.float32),
            pltpu.VMEM((n_acc, TB, TS), jnp.float32),
            pltpu.VMEM((n_acc, TB, TS), jnp.float32),
        ],
        interpret=interpret,
    )(ph, plm, pe, gall, mskf)
    outh, outl, oute, out0h, out0l, out0e, outsh, outsl, outse = outs
    n_ab = V * V * A
    ab = _log_mantissa(outh[:, :n_ab], outl[:, :n_ab], oute[:, :n_ab])
    z0 = _log_mantissa(out0h[:, :A], out0l[:, :A], out0e[:, :A])
    sall = _log_mantissa(
        outsh[:, :n_sing], outsl[:, :n_sing], outse[:, :n_sing]
    )
    sing = (sall[0][:, : V + 1], sall[1][:, : V + 1])
    if a0_sep:
        # recombine the separable alpha=0 logs:
        # llk_ab[j,k,0] = logD[j] + logG[k]; llk00[0] = logD0 + logG0
        sl_ = lambda p, a, b: (sall[0][:, a:b], sall[1][:, a:b])
        logD = sl_(sall, V + 1, 2 * V + 1)
        logG = sl_(sall, 2 * V + 1, 3 * V + 1)
        d0h, d0l = sall[0][:, 3 * V + 1], sall[1][:, 3 * V + 1]
        g0h_, g0l_ = sall[0][:, 3 * V + 2], sall[1][:, 3 * V + 2]
        ph, pl_ = df.add(
            logD[0][:, :, None], logD[1][:, :, None],
            logG[0][:, None, :], logG[1][:, None, :],
        )  # (B, V, V)
        abh = ab[0].reshape(B, V, V, A).at[..., 0].set(ph)
        abl = ab[1].reshape(B, V, V, A).at[..., 0].set(pl_)
        ab = (abh.reshape(B, n_ab), abl.reshape(B, n_ab))
        zh, zl = df.add(d0h, d0l, g0h_, g0l_)
        z0 = (z0[0].at[:, 0].set(zh), z0[1].at[:, 0].set(zl))
    return ab, z0, sing


# ------------------------------------------------------------- tiled path
#
# Same motivation as pallas_pair's tiled kernel (round-3 verdict #1): the
# unrolled df kernel's trace time and stacked-scratch size scale ~V^2*A,
# unusable past V~12. Pools beyond pallas_pair._UNROLL_CAP channels tile
# the (j,k) pair axis: grid (B/TB, n_tiles, n_s) with slots innermost,
# per-tile stacked df scratch (Jt*Kt*Ac, TB, TS) x3 flat in V; the
# O(V)-channel rest (pass-1 singlet, llks00, the separable alpha=0
# factors) moves to a companion extras kernel. The mixture-table
# normalization preamble is recomputed per tile (VPU ops on VMEM-resident
# planes, a few percent of the tile body). gps planes arrive INTERLEAVED
# per padded sample (hi0 hi1 hi2 lo0 lo1 lo2) so a (Jt*6)-plane BlockSpec
# slices one tile's samples; gp0 rides as the final 6 planes (only the
# extras kernel reads it).


def plan_pair_tiles_df(V, A, a0_zero, sym_a):
    """Tile plan for the exact kernel, or None to run unrolled.

    Mirrors pallas_pair.plan_pair_tiles, with the df-specific scratch
    bound: three stacked (Jt*Kt*Ac, TB, TS) planes must fit VMEM, so the
    tile extent drops to 8 when 16x16 tiles would blow the budget (the
    5-alpha grid's Ac=4). alpha[0] == 0 is ALWAYS separable here (the
    extras kernel has no 128-channel width limit — outputs pad)."""
    from demuxlet_tpu.ops.pallas_pair import _UNROLL_CAP, _VMEM_BUDGET

    if V * V * A <= _UNROLL_CAP:
        return None
    ac_list = [a for a in range(A) if not (a0_zero and a == 0)]
    nA = len(ac_list)
    budget = _VMEM_BUDGET - 3 * 2**20  # input-block + transient headroom
    for Jt in (16, 8, 4):
        if Jt == 16 and V % 16:
            continue  # 16-tiles only when they pad nothing
        if max(1, nA) * 3 * (Jt * Jt) * TB * TS * 4 <= budget:
            break
    else:
        raise AssertionError(
            f"exact pair tile does not fit VMEM even at Jt=4 "
            f"(V={V}, A={A}, nA={nA}); shrink the alpha grid"
        )
    Vp = -(-V // Jt) * Jt
    n_t = Vp // Jt
    triangular = a0_zero and ac_list == [sym_a]
    if triangular:
        tiles = [(jt, kt) for jt in range(n_t) for kt in range(jt, n_t)]
    else:
        tiles = [(jt, kt) for jt in range(n_t) for kt in range(n_t)]
    return Jt, Jt, Vp, tiles, ac_list, triangular


def _extras_slots(V, A, a0_zero):
    """Ordered accumulator registry for the extras kernel: pass-1 singlet
    products ('s', j; j == V is gp0), the a0 separable factors, and the
    non-separable llks00 channels. Same key scheme as _acc_slots."""
    keys = [("s", j) for j in range(V + 1)]
    if a0_zero:
        keys += [("d", j) for j in range(V)]
        keys += [("gs", k) for k in range(V)]
        keys += [("u00",), ("g0s",)]
    keys += [("m0", a) for a in range(A) if not (a0_zero and a == 0)]
    return keys, {k: i for i, k in enumerate(keys)}


def _cmask_arr(cmask, n_tch):
    """Static channel mask as an iota comparison (pallas_call rejects
    captured constant arrays)."""
    if cmask is None:
        return None
    ch = jax.lax.broadcasted_iota(jnp.int32, (n_tch, 1, 1), 0)
    sel = [i for i, b in enumerate(cmask) if b]
    arr = ch == np.int32(sel[0])
    for i in sel[1:]:
        arr = arr | (ch == np.int32(i))
    return arr


def _fold_acc(inners, mh_ref, ml_ref, me_ref, do_rn, chunk, fence):
    """Fold per-slot inner df pairs into the stacked product scratch with
    one plane-wide df mul per chunk, renormalizing on do_rn steps (shared
    by the unrolled, tiled and extras kernels — see _pair_kernel_df)."""
    n_acc = len(inners)
    for c0 in range(0, n_acc, chunk):
        c1 = min(c0 + chunk, n_acc)
        ih = jnp.stack([inners[i][0] for i in range(c0, c1)], axis=0)
        il = jnp.stack([inners[i][1] for i in range(c0, c1)], axis=0)
        nh, nl = _mul2(mh_ref[c0:c1], ml_ref[c0:c1], ih, il, fence)

        @pl.when(do_rn)
        def _(c0=c0, c1=c1, nh=nh, nl=nl):
            h2, l2, e2 = _renorm(nh, nl, me_ref[c0:c1])
            mh_ref[c0:c1] = h2
            ml_ref[c0:c1] = l2
            me_ref[c0:c1] = e2

        @pl.when(jnp.logical_not(do_rn))
        def _(c0=c0, c1=c1, nh=nh, nl=nl):
            mh_ref[c0:c1] = nh
            ml_ref[c0:c1] = nl


def _butterfly_rows(mh_ref, ml_ref, me_ref, n_acc, chunk, fence):
    """Lane-product butterfly over the stacked scratch, one chunk at a
    time; returns per-channel (hi, lo, exp) column triples."""
    rows = []
    for c0 in range(0, n_acc, chunk):
        c1 = min(c0 + chunk, n_acc)
        rh, rl, re = _lane_prod_df(
            mh_ref[c0:c1], ml_ref[c0:c1], me_ref[c0:c1], fence, axis=2
        )
        rows += [(rh[i, :, 0], rl[i, :, 0], re[i, :, 0])
                 for i in range(c1 - c0)]
    return rows


def _write_rows(refs, rows_cols):
    """Stack per-channel column triples into the (TB, W) output refs,
    zero-padding to the ref width."""
    zero = jnp.zeros_like(rows_cols[0][0])
    for ref, c in zip(refs, [list(c) for c in zip(*rows_cols)]):
        while len(c) < ref.shape[1]:
            c.append(zero)
        ref[:] = jnp.stack(c, axis=1)


def _pair_kernel_df_tiled(
    tj_ref, tk_ref, ph_ref, pl_ref, pe_ref, gj_ref, gk_ref,
    outh_ref, outl_ref, oute_ref, mh_ref, ml_ref, me_ref,
    *, Jt, Kt, ac_list, n_s, fence, n_tch, expand, cmask, A, tri=False,
):
    """One (Jt x Kt) pair tile of 'ab' df accumulators per grid step.
    Same per-channel math as _pair_kernel_df's ab path; U[dj, a, m] is
    recomputed per tile (3/Kt of the inner dot3s). gj/gk blocks carry the
    tile's samples in the interleaved (hi0 hi1 hi2 lo0 lo1 lo2) layout.
    tri: diagonal tiles of the symmetric plane — only dk >= dj channels,
    packed by pallas_pair.tri_index (mirror at reassembly)."""
    from demuxlet_tpu.ops.pallas_pair import tri_index

    s_step = pl.program_id(2)
    nA = len(ac_list)
    t_idx, n_tri = tri_index(Jt, Kt)
    n_acc = (n_tri if tri else Jt * Kt) * nA
    chunk = n_acc if fence else _ACC_CHUNK

    @pl.when(s_step == 0)
    def _():
        mh_ref[:] = jnp.ones_like(mh_ref)
        ml_ref[:] = jnp.zeros_like(ml_ref)
        me_ref[:] = jnp.zeros_like(me_ref)

    t_h, t_l = _mixture_table_df(
        ph_ref[:], pl_ref[:], pe_ref[:], axis=0,
        chan_mask=_cmask_arr(cmask, n_tch),
    )
    t_u = [_quad(t_h[x], t_l[x]) for x in range(n_tch)]
    t = [t_u[expand[x]] for x in range(A * 9)]
    gj = [[_quad(gj_ref[dj * 6 + l], gj_ref[dj * 6 + 3 + l])
           for l in range(3)] for dj in range(Jt)]
    gk = [[_quad(gk_ref[dk * 6 + l], gk_ref[dk * 6 + 3 + l])
           for l in range(3)] for dk in range(Kt)]

    inners = [None] * n_acc
    for dj in range(Jt):
        u = []
        for a in ac_list:
            for m in range(3):
                u.append(_quad(*_dot3(
                    gj[dj][0], gj[dj][1], gj[dj][2],
                    t[a * 9 + m], t[a * 9 + 3 + m], t[a * 9 + 6 + m],
                    fence,
                )))
        for dk in range(dj if tri else 0, Kt):
            for ai in range(nA):
                ch = (t_idx[(dj, dk)] if tri else dj * Kt + dk) * nA + ai
                inners[ch] = _dot3(
                    gk[dk][0], gk[dk][1], gk[dk][2],
                    u[ai * 3], u[ai * 3 + 1], u[ai * 3 + 2], fence,
                )

    do_rn = (jax.lax.rem(s_step, np.int32(3)) == np.int32(2)) | (
        s_step == np.int32(n_s - 1)
    )
    _fold_acc(inners, mh_ref, ml_ref, me_ref, do_rn, chunk, fence)

    @pl.when(s_step == n_s - 1)
    def _():
        rows = _butterfly_rows(mh_ref, ml_ref, me_ref, n_acc, chunk, fence)
        _write_rows((outh_ref, outl_ref, oute_ref), rows)


def _extras_kernel_df(
    ph_ref, pl_ref, pe_ref, gall_ref, mskf_ref,
    outh_ref, outl_ref, oute_ref, mh_ref, ml_ref, me_ref,
    *, V, Vp, A, n_s, fence, a0_zero, n_tch, expand, cmask, gsel,
):
    """O(V)-channel companion: pass-1 singlet products, the separable
    alpha=0 factors (d[j], gsum[k], u00, g0sum) and the non-separable
    llks00 channels. gall carries the interleaved padded-sample planes +
    gp0 (the final 6); pad samples are skipped statically."""
    s_step = pl.program_id(1)
    keys, slot = _extras_slots(V, A, a0_zero)
    n_acc = len(keys)
    chunk = n_acc if fence else _ACC_CHUNK

    @pl.when(s_step == 0)
    def _():
        mh_ref[:] = jnp.ones_like(mh_ref)
        ml_ref[:] = jnp.zeros_like(ml_ref)
        me_ref[:] = jnp.zeros_like(me_ref)

    ph = ph_ref[:]
    plm = pl_ref[:]
    pe = pe_ref[:]
    t_h, t_l = _mixture_table_df(ph, plm, pe, axis=0,
                                 chan_mask=_cmask_arr(cmask, n_tch))
    t_u = [_quad(t_h[x], t_l[x]) for x in range(n_tch)]
    t = [t_u[expand[x]] for x in range(A * 9)]
    glh, gll = _gl_table_df(
        jnp.stack([ph[i] for i in gsel]),
        jnp.stack([plm[i] for i in gsel]),
        jnp.stack([pe[i] for i in gsel]),
    )
    mb = mskf_ref[0] != np.float32(0.0)
    one, zero = np.float32(1.0), np.float32(0.0)
    glt = [
        _quad(jnp.where(mb, glh[0], one), jnp.where(mb, gll[0], zero)),
        _quad(jnp.where(mb, glh[1], zero), jnp.where(mb, gll[1], zero)),
        _quad(jnp.where(mb, glh[2], zero), jnp.where(mb, gll[2], zero)),
    ]
    g = [[_quad(gall_ref[j * 6 + l], gall_ref[j * 6 + 3 + l])
          for l in range(3)] for j in range(V)]
    g0 = [_quad(gall_ref[Vp * 6 + l], gall_ref[Vp * 6 + 3 + l])
          for l in range(3)]

    inners = [None] * n_acc

    def put(key, inner):
        inners[slot[key]] = inner

    for j in range(V + 1):
        src = g0 if j == V else g[j]
        put(("s", j),
            _dot3(glt[0], glt[1], glt[2], src[0], src[1], src[2], fence))

    if a0_zero:
        for k in range(V):
            s1 = df.add_pos(g[k][0][0], g[k][0][1], g[k][1][0], g[k][1][1])
            s1 = df.add_pos(*s1, g[k][2][0], g[k][2][1])
            put(("gs", k), s1)
        g0sum = df.add_pos(g0[0][0], g0[0][1], g0[1][0], g0[1][1])
        g0sum = df.add_pos(*g0sum, g0[2][0], g0[2][1])
        put(("g0s",), g0sum)
        for j in range(V):
            put(("d", j), _dot3(g[j][0], g[j][1], g[j][2],
                                t[0], t[3], t[6], fence))
        put(("u00",), _dot3(g0[0], g0[1], g0[2], t[0], t[3], t[6], fence))

    for a in range(A):
        if a0_zero and a == 0:
            continue
        u0 = [_quad(*_dot3(
                  g0[0], g0[1], g0[2],
                  t[a * 9 + m], t[a * 9 + 3 + m], t[a * 9 + 6 + m],
                  fence))
              for m in range(3)]
        put(("m0", a),
            _dot3(g0[0], g0[1], g0[2], u0[0], u0[1], u0[2], fence))

    do_rn = (jax.lax.rem(s_step, np.int32(3)) == np.int32(2)) | (
        s_step == np.int32(n_s - 1)
    )
    _fold_acc(inners, mh_ref, ml_ref, me_ref, do_rn, chunk, fence)

    @pl.when(s_step == n_s - 1)
    def _():
        rows = _butterfly_rows(mh_ref, ml_ref, me_ref, n_acc, chunk, fence)
        _write_rows((outh_ref, outl_ref, oute_ref), rows)


def _call_pair_kernel_df_tiled(prod, gall, mskf, V, A, interpret, gsel,
                               plan, a0_zero, expand, sym_a, cmask):
    """(j,k)-tiled exact pair-search: tiled ab kernel + extras kernel +
    XLA df reassembly. gall: (Vp*6+6, B, S) INTERLEAVED planes (see
    demux_block_exact_impl's tiled branch). Returns the same (ab, z0,
    sing) df-pair contract as _call_pair_kernel_df."""
    ph, plm, pe = prod
    n_tch, B, S = ph.shape
    Jt, Kt, Vp, tiles, ac_list, triangular = plan
    from demuxlet_tpu.ops.pallas_pair import (plan_groups, tile_pos_map,
                                              tri_index)

    groups = plan_groups(plan, sym_a, default=True)[3]
    nA = len(ac_list)
    n_s = S // TS
    n_ab = V * V * A

    def run_part(part_tiles, tri, ac):
        n_ch = (tri_index(Jt, Kt)[1] if tri else Jt * Kt) * len(ac)
        Wp = -(-n_ch // 128) * 128
        tile_j = jnp.asarray([jt for jt, _ in part_tiles], jnp.int32)
        tile_k = jnp.asarray([kt for _, kt in part_tiles], jnp.int32)
        kernel = functools.partial(
            _pair_kernel_df_tiled, Jt=Jt, Kt=Kt, ac_list=tuple(ac),
            n_s=n_s, fence=bool(interpret), n_tch=n_tch,
            expand=tuple(expand), cmask=cmask, A=A, tri=tri,
        )
        in3 = lambda C: pl.BlockSpec(
            (C, TB, TS), lambda ib, jk, is_, tj, tk: (ib * 0, ib, is_))
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(B // TB, len(part_tiles), n_s),
            in_specs=[
                in3(n_tch), in3(n_tch), in3(n_tch),
                pl.BlockSpec((Jt * 6, TB, TS),
                             lambda ib, jk, is_, tj, tk: (tj[jk], ib, is_)),
                pl.BlockSpec((Kt * 6, TB, TS),
                             lambda ib, jk, is_, tj, tk: (tk[jk], ib, is_)),
            ],
            out_specs=[pl.BlockSpec(
                (TB, Wp), lambda ib, jk, is_, tj, tk: (ib, jk))] * 3,
            scratch_shapes=[
                pltpu.VMEM((n_ch, TB, TS), jnp.float32)] * 3,
        )
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=[jax.ShapeDtypeStruct((B, len(part_tiles) * Wp),
                                            jnp.float32)] * 3,
            interpret=interpret,
        )(tile_j, tile_k, ph, plm, pe, gall, gall), Wp

    if nA > 0:
        outs, group_maps, off = [], [], 0
        for g_ac, g_tiles, g_tri in groups:
            tiles_diag = [tt for tt in g_tiles
                          if g_tri and tt[0] == tt[1]]
            tiles_full = [tt for tt in g_tiles if tt not in tiles_diag]
            parts_g = []
            if tiles_full:
                o, Wp = run_part(tiles_full, False, g_ac)
                outs.append(o)
                parts_g.append((tiles_full, Jt, Kt, Wp, False, off))
                off += o[0].shape[1]
            if tiles_diag:
                o, Wp = run_part(tiles_diag, True, g_ac)
                outs.append(o)
                parts_g.append((tiles_diag, Jt, Kt, Wp, True, off))
                off += o[0].shape[1]
            group_maps.append((g_ac, parts_g, g_tri))
        if len(outs) == 1:
            outh, outl, oute = outs[0]
        else:
            outh, outl, oute = (
                jnp.concatenate([o[i] for o in outs], axis=1)
                for i in range(3)
            )

    keys, _slot = _extras_slots(V, A, a0_zero)
    n_x = len(keys)
    Wx = -(-n_x // 128) * 128
    xkernel = functools.partial(
        _extras_kernel_df, V=V, Vp=Vp, A=A, n_s=n_s, fence=bool(interpret),
        a0_zero=a0_zero, n_tch=n_tch, expand=tuple(expand), cmask=cmask,
        gsel=tuple(gsel),
    )
    in3x = lambda C: pl.BlockSpec(
        (C, TB, TS), lambda ib, is_: (ib * 0, ib, is_))
    exh, exl, exe = pl.pallas_call(
        xkernel,
        grid=(B // TB, n_s),
        in_specs=[in3x(n_tch), in3x(n_tch), in3x(n_tch),
                  in3x(Vp * 6 + 6), in3x(1)],
        out_specs=[pl.BlockSpec(
            (TB, Wx), lambda ib, is_: (ib, ib * 0))] * 3,
        out_shape=[jax.ShapeDtypeStruct((B, Wx), jnp.float32)] * 3,
        scratch_shapes=[pltpu.VMEM((n_x, TB, TS), jnp.float32)] * 3,
        interpret=interpret,
    )(ph, plm, pe, gall, mskf)
    ex = _log_mantissa(exh[:, :n_x], exl[:, :n_x], exe[:, :n_x])

    # reassembly: host position map into the tiled channel layout, lower
    # triangle mirrored when only upper tiles ran (df triples identical
    # to the unrolled kernel's sym_a mirror); per-group maps merge
    # column-wise in ac_list order
    if nA > 0:
        posa = {}
        for g_ac, parts_g, g_tri in group_maps:
            pos_g = tile_pos_map(V, len(g_ac), parts_g, g_tri)
            for i, a in enumerate(g_ac):
                posa[a] = pos_g[:, :, i]
        pos = np.stack([posa[a] for a in ac_list], axis=2)
        pidx = jnp.asarray(pos.reshape(-1))
        abt = _log_mantissa(jnp.take(outh, pidx, axis=1),
                            jnp.take(outl, pidx, axis=1),
                            jnp.take(oute, pidx, axis=1))
    else:
        z = jnp.zeros((B, V, V, 0), jnp.float32)
        abt = (z, z)

    def xs(a, b):
        return ex[0][:, a:b], ex[1][:, a:b]

    sing = xs(0, V + 1)
    if a0_zero:
        logD = xs(V + 1, 2 * V + 1)
        logG = xs(2 * V + 1, 3 * V + 1)
        a0h, a0l = df.add(
            logD[0][:, :, None], logD[1][:, :, None],
            logG[0][:, None, :], logG[1][:, None, :],
        )  # (B, V, V)
        abh = jnp.concatenate(
            [a0h[..., None], abt[0].reshape(B, V, V, nA)], axis=3)
        abl = jnp.concatenate(
            [a0l[..., None], abt[1].reshape(B, V, V, nA)], axis=3)
        u00h, u00l = ex[0][:, 3 * V + 1], ex[1][:, 3 * V + 1]
        g0sh, g0sl = ex[0][:, 3 * V + 2], ex[1][:, 3 * V + 2]
        z0h, z0l = df.add(u00h, u00l, g0sh, g0sl)
        m0 = xs(3 * V + 3, 3 * V + 3 + A - 1)
        z0 = (jnp.concatenate([z0h[:, None], m0[0]], axis=1),
              jnp.concatenate([z0l[:, None], m0[1]], axis=1))
    else:
        abh = abt[0].reshape(B, V, V, nA)
        abl = abt[1].reshape(B, V, V, nA)
        z0 = xs(V + 1, V + 1 + A)
    ab = (abh.reshape(B, n_ab), abl.reshape(B, n_ab))
    return ab, z0, sing


# ---------------------------------------------------------------- XLA front
def _sel_rows(c_plane, tT):
    """One-hot MXU selection: c_plane (TB, TS) int32 row ids -> the
    selected LUT rows as (3C, TB, TS) planes. tT is the (3C, n_pad)
    transposed single-code table (n_pad = 128-multiple >= n_rows; columns
    beyond n_rows zero-padded).

    dot_general at precision=HIGHEST selects BIT-EXACTLY: the bf16x3
    input split is an exact decomposition of f32 (8+8+8 mantissa bits)
    and each output lane sums exactly one nonzero partial, so the f32
    accumulation never rounds (pinned by probe_gather3 onehot_bitexact
    and tests/test_pallas_exact.py::test_onehot_front_matches_pair)."""
    outs = []
    rid = jax.lax.broadcasted_iota(
        jnp.int32, (tT.shape[1], c_plane.shape[1]), 0
    )
    for b in range(c_plane.shape[0]):
        oh = (rid == c_plane[b : b + 1, :]).astype(jnp.float32)
        outs.append(jax.lax.dot_general(
            tT, oh, (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        ))
    return jnp.stack(outs, axis=1)  # (3C, TB, TS)


def _onehot_front_kernel(c_ref, tT_ref, oh_ref, ol_ref, oe_ref, *,
                         C, fence):
    tT = tT_ref[...]
    U = c_ref.shape[0]
    h = l = e = None
    for u in range(U):
        sel = _sel_rows(c_ref[u], tT)
        h2, l2, e2 = sel[:C], sel[C : 2 * C], sel[2 * C :]
        if h is None:
            h, l, e = h2, l2, e2
        else:
            h, l = _mul2(h, l, h2, l2, fence)
            h, l, e = _renorm(h, l, e + e2)
    oh_ref[...] = h
    ol_ref[...] = l
    oe_ref[...] = e


def _onehot_prod_front(cP, tT, interpret):
    """Per-slot probability products via a STANDALONE one-hot Pallas
    kernel: each UMI code selects its (C,) LUT column by an MXU one-hot
    matmul over the 128-padded single-code table (bit-exact, see
    _sel_rows), and consecutive selections multiply in df with exponent
    renormalization in VMEM.

    Replaces the XLA pair-code LUT take for the TPU path: the (R^2, 3C)
    take is HBM-row-transaction-bound (~9.9 ms/2048-cell block at U=2)
    while this kernel only streams the (U, B, S) i32 code planes in and
    the (3C, B, S) product planes out (~2.6 ms compute,
    benchmarks/probe_gather3.py p1_onehot vs p0_take). Kept OUT of the
    main pair kernel on purpose: fusing it there regressed the kernel
    20.6 -> 110 ms (Mosaic scheduling pathology, probe_onehot_parts).

    cP (U, B, S) int32; tT (3C, n_pad). Returns (mh, ml, ef) each
    (C, B, S), the _pair_prod_gather contract."""
    C3, n_pad = tT.shape
    C = C3 // 3
    U, B, S = cP.shape
    kernel = functools.partial(_onehot_front_kernel, C=C, fence=interpret)
    out = pl.pallas_call(
        kernel,
        grid=(B // TB, S // TS),
        in_specs=[
            pl.BlockSpec((U, TB, TS), lambda ib, is_: (ib * 0, ib, is_)),
            pl.BlockSpec((C3, n_pad), lambda ib, is_: (ib * 0, ib * 0)),
        ],
        out_specs=[pl.BlockSpec((C, TB, TS),
                                lambda ib, is_: (ib * 0, ib, is_))] * 3,
        out_shape=[jax.ShapeDtypeStruct((C, B, S), jnp.float32)] * 3,
        interpret=interpret,
    )(cP, tT)
    return out


def _pair_prod_gather(tabs, codes_i32, n_rows):
    """Per-slot probability products via the PAIR-code LUT: codes are
    consumed two at a time (c0 * n_rows + c1 indexes the host-built
    (n_rows^2, C) product table), halving gather traffic and eliminating
    the per-UMI device df mul + renorm entirely for U == 2 — the host
    pair products are f64-exact, tighter than a device df mul. Odd
    trailing UMIs pair with the none row (exact *1.0).

    All three planes ride ONE take per code pair (the (R^2, 3C) fused
    table): measured on v5e, a single 54-channel take runs ~2x faster
    than three 18-channel takes (benchmarks/probe_gather_variants.py
    v8 vs v1/v9 — narrow takes are row-transaction-bound). Output is in
    kernel/channel-leading layout so every downstream df op runs at full
    lane width.

    Returns (mh, ml, ef) each (C, B, S): value = (mh + ml) * 2^ef,
    mh in [1, 2)."""
    pm_h, pm_l, pe = tabs
    C = pm_h.shape[1]
    fused = jnp.concatenate([pm_h, pm_l, pe], axis=1)  # (R^2, 3C)
    U = codes_i32.shape[-1]
    none = n_rows - 1
    h = l = e = None
    for u in range(0, U, 2):
        c1 = codes_i32[..., u + 1] if u + 1 < U else none
        pc = codes_i32[..., u] * n_rows + c1
        g = jnp.transpose(jnp.take(fused, pc, axis=0), (2, 0, 1))
        h2, l2, e2 = g[:C], g[C : 2 * C], g[2 * C :]
        if h is None:
            h, l, e = h2, l2, e2
        else:
            h, l = df.mul(h, l, h2, l2)
            h, l, e = _renorm(h, l, e + e2)
    return h, l, e


def _normalize_prod(mh, ml, ef, axis=-1, chan_mask=None):
    """(m, e) table -> reference-normalized values in [0, 1]:
    v = (m/m_max) * 2^(e - e_max) over `axis`.

    key = e + (m - 1) orders (e, m) pairs exactly (e integer-valued,
    m - 1 in [0, 1)). chan_mask (np bool over `axis`, optional) restricts
    the max to a channel subset (the mixture channels, when the deduped
    table also carries GL-only columns) while still scaling every
    channel."""
    key = ef + (mh - np.float32(1.0))
    if chan_mask is not None:
        key = jnp.where(chan_mask, key, np.float32(-np.inf))
    kmax = jnp.max(key, axis=axis, keepdims=True)
    mask = key == kmax
    ninf = np.float32(-np.inf)
    e_max = jnp.max(jnp.where(mask, ef, ninf), axis=axis, keepdims=True)
    mm_h = jnp.max(jnp.where(mask, mh, ninf), axis=axis, keepdims=True)
    mm_l = jnp.max(jnp.where(mask, ml, ninf), axis=axis, keepdims=True)
    rh, rl = df.div(np.float32(1.0), np.float32(0.0), mm_h, mm_l)
    vh, vl = df.mul(mh, ml, rh, rl)
    d_e = ef - e_max  # <= 0
    under = d_e < np.float32(-126.0)
    sc = df._pow2(jnp.maximum(d_e, np.float32(-126.0)))
    zero = np.float32(0.0)
    vh = jnp.where(under, zero, vh * sc)
    vl = jnp.where(under, zero, vl * sc)
    return vh, vl


def _mixture_table_df(mh, ml, ef, axis=-1, chan_mask=None):
    """Product table -> reference-normalized mixture table t (df):
    t = (v + 1e-6) / (1 + 1e-6). The per-UMI max-divisions telescope to
    the single max-division (cmd_cram_demuxlet.cpp:626-663); the max of
    the smoothed table is exactly 1 + 1e-6 because the argmax element of
    the normalized table is exactly 1 in df. Deduped channels are exact:
    bit-identical columns produce bit-identical table entries, so the max
    over unique mixture channels equals the reference's max over all
    (k,l,m)."""
    vh, vl = _normalize_prod(mh, ml, ef, axis=axis, chan_mask=chan_mask)
    wh, wl = df.add(vh, vl, _SMOOTH_DF[0], _SMOOTH_DF[1])
    return df.mul(wh, wl, _K_SMOOTH[0], _K_SMOOTH[1])


def _df_prod_axis(h, l, e, axis):
    """Pairwise df tree-PRODUCT along `axis` with exponent tracking
    (length padded to a power of 2 with exact ones). Returns (m, l, e)
    with m in [1, 2)."""
    n = h.shape[axis]
    p = 1
    while p < n:
        p *= 2
    if p != n:
        pad = [(0, 0)] * h.ndim
        pad[axis] = (0, p - n)
        h = jnp.pad(h, pad, constant_values=1.0)
        l = jnp.pad(l, pad)
        e = jnp.pad(e, pad)
    while h.shape[axis] > 1:
        m = h.shape[axis] // 2
        sl = lambda x, a, b: jax.lax.slice_in_dim(x, a, b, axis=axis)
        h1, h2 = sl(h, 0, m), sl(h, m, 2 * m)
        l1, l2 = sl(l, 0, m), sl(l, m, 2 * m)
        e1, e2 = sl(e, 0, m), sl(e, m, 2 * m)
        h, l = df.mul(h1, l1, h2, l2)
        h, l, e = _renorm(h, l, e1 + e2)
    return (jnp.squeeze(h, axis), jnp.squeeze(l, axis),
            jnp.squeeze(e, axis))


def _df_sum_axis(h, l, axis):
    """Pairwise df tree-sum along `axis` (length padded to a power of 2
    with exact zeros)."""
    n = h.shape[axis]
    p = 1
    while p < n:
        p *= 2
    if p != n:
        pad = [(0, 0)] * h.ndim
        pad[axis] = (0, p - n)
        h = jnp.pad(h, pad)
        l = jnp.pad(l, pad)
    while h.shape[axis] > 1:
        m = h.shape[axis] // 2
        h1 = jax.lax.slice_in_dim(h, 0, m, axis=axis)
        h2 = jax.lax.slice_in_dim(h, m, 2 * m, axis=axis)
        l1 = jax.lax.slice_in_dim(l, 0, m, axis=axis)
        l2 = jax.lax.slice_in_dim(l, m, 2 * m, axis=axis)
        h, l = df.add(h1, l1, h2, l2)
    return jnp.squeeze(h, axis), jnp.squeeze(l, axis)


def _gl_table_df(mh, ml, ef):
    """Pass-1 GL table (cmd_cram_demuxlet.cpp:428-452) in df32,
    probability domain: per-UMI products, sum-normalize, +1e-6,
    renormalize. Takes the (3,B,S) product planes (the GL channels of the
    shared pair-code gather — the singlet factors f0/f1/f2 coincide
    exactly with the p in {0, .5, 1} mixture columns, so dedup shares
    them); channel-leading layout keeps every df op at full lane width.
    Masked slots carry the none-code products (exactly uniform), masked
    downstream. Returns (3,B,S) df planes."""
    uh, ul = _normalize_prod(mh, ml, ef, axis=0)
    # sequential l-order sum (reference :440-443)
    sh, sl = df.add(uh[0], ul[0], uh[1], ul[1])
    sh, sl = df.add(sh, sl, uh[2], ul[2])
    rh, rl = df.div(np.float32(1.0), np.float32(0.0), sh, sl)
    glh, gll = df.mul(uh, ul, rh[None], rl[None])
    glh, gll = df.add(glh, gll, _SMOOTH_DF[0], _SMOOTH_DF[1])
    s2h, s2l = df.add(glh[0], gll[0], glh[1], gll[1])
    s2h, s2l = df.add(s2h, s2l, glh[2], gll[2])
    r2h, r2l = df.div(np.float32(1.0), np.float32(0.0), s2h, s2l)
    glh, gll = df.mul(glh, gll, r2h[None], r2l[None])
    return glh, gll


def split_tables(gps, gp0, w, logf, rows=None):
    """Host-side: build the df gps/gp0 planes plus the PAIR-code product
    LUT for the device front.

    w and logf are the LOG-domain LUTs (ops/luts.py) — converted here to
    probability domain (exp) with a 1.0 none-row appended, since this
    path multiplies probabilities directly like the reference
    (cmd_cram_demuxlet.cpp:606-663). The exp round-trip recovers the f64
    probabilities to 1 ulp.

    Two front optimizations are baked in here:
    * Channel dedup: the mixture value pr*(1-p)+pa*p depends only on
      p = 0.5*l + (m-l)*0.5*alpha, so the A*9 mixture columns collapse to
      the unique p values (5 for the default [0, .5] grid), and the
      singlet GL factors f0/f1/f2 are exactly the p in {0, .5, 1}
      columns. expand_w/expand_gl map logical channels to unique ones.
    * Pair-code LUT: rows are code PAIRS (c0*(NB+1)+c1) holding the
      f64-exact per-channel product — one device gather covers two UMIs
      with no df mul. Used by the interpret/CPU front.
    * Single-code transposed table: the same T columns as (3C, 128)
      mantissa-df + exponent planes (codes zero-padded to the 128-lane
      one-hot width) — the _onehot_prod_front kernel's selection operand
      for the TPU front.

    Returns (gps_pair, gp0_pair, tabs, meta):
      tabs = (pm_h, pm_l, pe, tT): the pair-LUT planes each ((NB+1)^2, C)
        f32 — mantissa df pair (hi in [1,2)) + integer-valued exponent
        plane — plus the (3C, 128) transposed single-code table;
      meta = (C, expand_w, expand_gl) — static (hashable) channel maps.
    """
    gps_h, gps_l = df.from_f64(gps)
    gp0_h, gp0_l = df.from_f64(gp0)
    nw = w.shape[1]
    allc = np.ones((w.shape[0] + 1, nw + 3), dtype=np.float64)
    allc[:-1, :nw] = np.exp(w)
    allc[:-1, nw:] = np.exp(logf)
    if rows is not None:
        # wire-v2 dictionary: keep only the LUT rows whose codes occur
        # in the run (host.wire.WireCfg, sorted) + the none row — wire
        # codes index this subset directly, the one-hot front narrows,
        # and selection stays bit-exact (same f64 values, fewer rows)
        allc = allc[list(rows) + [w.shape[0]]]
    seen, cols, inv = {}, [], []
    for j in range(allc.shape[1]):
        key = allc[:, j].tobytes()
        if key not in seen:
            seen[key] = len(cols)
            cols.append(allc[:, j])
        inv.append(seen[key])
    T = np.stack(cols, axis=1)  # (NB+1, C)
    P = (T[:, None, :] * T[None, :, :]).reshape(-1, T.shape[1])
    mant, ex = np.frexp(P)
    pm_h, pm_l = df.from_f64(mant * 2.0)  # exact scale: mant -> [1, 2)
    pe = (ex - 1).astype(np.float32)
    n_rows = T.shape[0]
    # one-hot lane width: next 128 multiple >= n_rows (n_rows = 2*(cap_bq
    # +1)+1 <= 255 under the u8 code contract, so <= 256; --cap-BQ >= 63
    # pads to 256 instead of crashing — advisor r3 finding)
    assert n_rows <= 256, "u8 codes bound the single-code LUT at 256 rows"
    n_pad = -(-n_rows // 128) * 128
    smant, sex = np.frexp(T)
    sh, sl = df.from_f64(smant * 2.0)
    pad = lambda a: np.pad(a.T.astype(np.float32), ((0, 0), (0, n_pad - n_rows)))
    tT = np.concatenate(
        [pad(sh), pad(sl), pad((sex - 1).astype(np.float32))], axis=0)
    meta = (len(cols), tuple(inv[:nw]), tuple(inv[nw:]))
    return (gps_h, gps_l), (gp0_h, gp0_l), (pm_h, pm_l, pe, tT), meta


def demux_block_exact_impl(
    codes, idx, msk, gps_pair, gp0_pair, tabs, meta,
    n_alpha, n_samples, interpret=False, a0_zero=False, sym_a=None,
    wire=None, front=None,
):
    """Fused exact-mode (df32) block step.

    codes (B,S,U) uint8 (255 = none; 254 = the shrunk-block empty-valid
    marker, same contract as the fast path); idx (B,S) int32 or any
    shipped form pallas_pair.unpack_block_inputs accepts (u8-delta tuple,
    16-bit pairs); msk (B,S) bool or None (derived from codes); wire:
    static (S, U, K) when codes is the fused int32 wire buffer (engine
    _to_wire). gps_pair ((NS,V,3) hi, lo); gp0_pair ((NS,3) hi, lo);
    tabs/meta from split_tables (pair-code product LUT + single-code
    transposed table + static channel-dedup maps).
    front: "pair" (XLA pair-code LUT take) or "onehot" (standalone
    one-hot Pallas kernel, _onehot_prod_front); None picks "pair" under
    interpret (the one-hot kernel's interpret-mode compile is slow) and
    "onehot" on the real TPU (measured faster, probe_gather3).
    Returns df pairs: (llk (B,V), llk0 (B,), llk_ab (B,V,V,A), llk00 (B,A)),
    each as (hi, lo) f32 — combine to f64 on the host."""
    from demuxlet_tpu.ops.pallas_pair import unpack_block_inputs

    codes, idx, msk = unpack_block_inputs(codes, idx, msk, wire)
    B, S, U = codes.shape
    V, A = n_samples, n_alpha
    C, expand_w, expand_gl = meta
    n_rows = int(round(np.sqrt(tabs[0].shape[0])))
    none_row = n_rows - 1
    # shared v1/v2 LUT-row mapping (see demux_block_fast_impl): marker
    # and none clamp onto the 1.0 none row
    c = jnp.minimum(codes.astype(jnp.int32), jnp.int32(none_row))

    if front is None:
        front = "pair" if interpret else "onehot"
    if front == "onehot":
        cP = jnp.transpose(c, (2, 0, 1))  # (U, B, S)
        mh, ml, ef = _onehot_prod_front(cP, tabs[3], interpret)
    else:
        mh, ml, ef = _pair_prod_gather(tabs[:3], c, n_rows)  # (C,B,S)
    w_used = sorted(set(expand_w))
    cmask = None
    if w_used != list(range(C)):
        cmask = tuple(i in w_used for i in range(C))

    NS = gps_pair[0].shape[0]
    mskf = msk[None].astype(jnp.float32)
    plan = plan_pair_tiles_df(V, A, a0_zero, sym_a)
    if plan is not None:
        # tiled pools gather the INTERLEAVED per-sample layout (hi0 hi1
        # hi2 lo0 lo1 lo2, padded samples neutral) + gp0 as the final 6
        # planes, so a (Jt*6)-plane BlockSpec slices one tile's samples
        Vp = plan[2]
        gh = gps_pair[0].reshape(NS, V, 1, 3)
        gl_ = gps_pair[1].reshape(NS, V, 1, 3)
        gint = jnp.concatenate([gh, gl_], axis=2).reshape(NS, V * 6)
        if Vp != V:
            neu = np.zeros((1, (Vp - V) * 6), dtype=np.float32)
            neu[0, 0::6] = 1.0
            gint = jnp.concatenate(
                [gint,
                 jnp.broadcast_to(jnp.asarray(neu), (NS, (Vp - V) * 6))],
                axis=1)
        # masked slots gather the NEUTRAL ROW at index NS (index redirect
        # instead of masking the gathered planes — see the fast path)
        neutral_r = np.zeros((1, Vp * 6 + 6), dtype=np.float32)
        neutral_r[0, 0 : Vp * 6 : 6] = 1.0
        neutral_r[0, Vp * 6] = 1.0
        fused_g = jnp.concatenate(
            [jnp.concatenate([gint, gp0_pair[0], gp0_pair[1]], axis=1),
             jnp.asarray(neutral_r)], axis=0)
        idx_n = jnp.where(msk, idx, jnp.int32(NS))
        gall = jnp.transpose(jnp.take(fused_g, idx_n, axis=0), (2, 0, 1))
        ab, z0, sing = _call_pair_kernel_df_tiled(
            (mh, ml, ef), gall, mskf, V, A, interpret, expand_gl,
            plan, a0_zero, expand_w, sym_a, cmask,
        )
        llk_ab = (ab[0].reshape(B, V, V, A), ab[1].reshape(B, V, V, A))
        llk = (sing[0][:, :V], sing[1][:, :V])
        llk0 = (sing[0][:, V], sing[1][:, V])
        return llk, llk0, llk_ab, z0

    # ONE fused gather for gps-hi|gp0-hi|gps-lo|gp0-lo: a single wide
    # take measures ~4x faster than the split 24/24/3/3-channel takes
    # (probe_gather_variants v8 = 2.7ms vs 10.4ms — narrow takes are
    # row-transaction-bound, and the (NS, V, 3) 3D form is 5.6x worse
    # still); the row-major V*3 reshape preserves the kernel's j*3+l
    # channel order and the concat of the small host tables fuses away.
    W3 = V * 3 + 3
    # masked slots -> the appended NEUTRAL ROW (exact (1,0,0) identity;
    # index redirect instead of masking the gathered planes)
    neutral_r = np.zeros((1, 2 * W3), dtype=np.float32)
    neutral_r[0, 0 : V * 3 : 3] = 1.0
    neutral_r[0, V * 3] = 1.0
    fused_g = jnp.concatenate(
        [jnp.concatenate(
            [gps_pair[0].reshape(NS, V * 3), gp0_pair[0],
             gps_pair[1].reshape(NS, V * 3), gp0_pair[1]], axis=1),
         jnp.asarray(neutral_r)], axis=0)
    idx_n = jnp.where(msk, idx, jnp.int32(NS))
    gall = jnp.transpose(jnp.take(fused_g, idx_n, axis=0), (2, 0, 1))

    # The mixture-table normalization and the pass-1 GL table (with its
    # masked-slot neutral substitution) are computed INSIDE the kernel
    # from the raw product planes — their XLA forms were HBM-bound.
    ab, z0, sing = _call_pair_kernel_df(
        (mh, ml, ef), gall, mskf,
        V, A, interpret, a0_zero=a0_zero, expand=expand_w, sym_a=sym_a,
        cmask=cmask, gsel=expand_gl,
    )
    llk_ab = (ab[0].reshape(B, V, V, A), ab[1].reshape(B, V, V, A))
    llk = (sing[0][:, :V], sing[1][:, :V])
    llk0 = (sing[0][:, V], sing[1][:, V])
    return llk, llk0, llk_ab, z0


demux_block_exact = jax.jit(
    demux_block_exact_impl,
    static_argnames=("meta", "n_alpha", "n_samples", "interpret", "a0_zero",
                     "sym_a", "wire", "front"),
)


def combine(pair):
    """(hi, lo) device pair -> host f64."""
    return df.to_f64(np.asarray(pair[0]), np.asarray(pair[1]))
