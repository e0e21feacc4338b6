"""Pallas TPU kernel for the doublet pair-search pass in df32 precision
("exact" mode on TPU).

The byte-parity contract (models/likelihood.py) needs ~1e-10 absolute
agreement with the reference's f64 loops — far tighter than f32 but well
within double-single f32 (ops/df32.py, ~6e-15/op). The TPU has no f64
ALUs, so the XLA f64 kernels run ~50x slower than fast mode; computing in
df32 recovers most of the gap while keeping exact-mode outputs at
reference-printed precision.

Division of labor (mirrors ops/pallas_pair.py):
  * XLA front (fused elementwise f32): per-UMI LUT gathers summed in df,
    the telescoped max-shift, df exp, the reference's +1e-6 smoothing and
    max-renormalization (cmd_cram_demuxlet.cpp:626-663) — emitting the
    mixture table t as TWO f32 planes, plus the full df32 singlet pass 1
    (:415-461) with a pairwise df tree-sum over slots.
  * Pallas kernel (VPU): the (l,m,j,k,a) contraction and log in df32 —
    per-(cell,slot) U[j,a,m] = sum_l g[j,l] t[a,l,m]; inner[j,k,a] =
    sum_m g[k,m] U[j,a,m]; acc[j,k,a] += log(inner) — with (hi, lo)
    accumulator planes in VMEM scratch across slot-tile steps and a
    roll-butterfly compensated lane reduction at the end (a plain f32
    lane sum would lose ~1e-4).

Padded slots are exactly neutral: zero codes -> lograw == 0 -> t == 1
exactly in df (verified: exp(0)=1, x/x=1, (1+1e-6)/(1+1e-6)=1 are exact
in ops/df32.py), and neutral (1,0,0) gps rows make inner == 1 -> log == 0.

Kernel tile: TB=16 cells x TS=128 slots (the df accumulator scratch is
2 planes x V*V*A x TB x TS f32 ~ 5.2 MB at V=8, A=5).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from demuxlet_tpu.ops import df32 as df

TB = 16  # cells per tile (sublanes)
TS = 128  # slots per tile (lanes)

_SMOOTH = 1e-6


def _lane_sum_df(h, l, width=TS):
    """Compensated (df32) sum over the lane axis via a roll butterfly.

    After log2(width) stages every lane holds the full sum; column 0 is
    returned. Tree order differs from the reference's sequential slot
    order — irrelevant at df precision (~1e-13 << printed 1e-4/1e-5)."""
    sh = width // 2
    while sh >= 1:
        h2 = pltpu.roll(h, shift=sh, axis=1)
        l2 = pltpu.roll(l, shift=sh, axis=1)
        h, l = df.add(h, l, h2, l2)
        sh //= 2
    return h, l


def _pair_kernel_df(
    th_ref, tl_ref, gh_ref, gl_ref, g0h_ref, g0l_ref,
    outh_ref, outl_ref, out0h_ref, out0l_ref,
    acch_ref, accl_ref, acc0h_ref, acc0l_ref,
    *, V, A, n_s,
):
    s_step = pl.program_id(1)

    @pl.when(s_step == 0)
    def _():
        acch_ref[:] = jnp.zeros_like(acch_ref)
        accl_ref[:] = jnp.zeros_like(accl_ref)
        acc0h_ref[:] = jnp.zeros_like(acc0h_ref)
        acc0l_ref[:] = jnp.zeros_like(acc0l_ref)

    t = [(th_ref[x], tl_ref[x]) for x in range(A * 9)]
    g = [(gh_ref[i], gl_ref[i]) for i in range(V * 3)]
    g0 = [(g0h_ref[i], g0l_ref[i]) for i in range(3)]

    def dot3(ga, gb, gc, ta, tb, tc):
        """sum_l g[l]*t[l] in the reference's l-ascending order."""
        s = df.mul(*ga, *ta)
        s = df.add(*s, *df.mul(*gb, *tb))
        s = df.add(*s, *df.mul(*gc, *tc))
        return s

    for j in range(V):
        u = []
        for a in range(A):
            for m in range(3):
                u.append(dot3(
                    g[j * 3], g[j * 3 + 1], g[j * 3 + 2],
                    t[a * 9 + m], t[a * 9 + 3 + m], t[a * 9 + 6 + m],
                ))
        for k in range(V):
            for a in range(A):
                inner = dot3(
                    g[k * 3], g[k * 3 + 1], g[k * 3 + 2],
                    u[a * 3], u[a * 3 + 1], u[a * 3 + 2],
                )
                lgh, lgl = df.log(*inner)
                idx = (j * V + k) * A + a
                nh, nl = df.add(acch_ref[idx], accl_ref[idx], lgh, lgl)
                acch_ref[idx] = nh
                accl_ref[idx] = nl

    # background pair term llks00 (:700-709), host-exact gp0 planes
    for a in range(A):
        u0 = [dot3(g0[0], g0[1], g0[2],
                   t[a * 9 + m], t[a * 9 + 3 + m], t[a * 9 + 6 + m])
              for m in range(3)]
        inner0 = dot3(g0[0], g0[1], g0[2], u0[0], u0[1], u0[2])
        lgh, lgl = df.log(*inner0)
        nh, nl = df.add(acc0h_ref[a], acc0l_ref[a], lgh, lgl)
        acc0h_ref[a] = nh
        acc0l_ref[a] = nl

    @pl.when(s_step == n_s - 1)
    def _():
        colsh, colsl = [], []
        for idx in range(V * V * A):
            rh, rl = _lane_sum_df(acch_ref[idx], accl_ref[idx])
            colsh.append(rh[:, 0])
            colsl.append(rl[:, 0])
        while len(colsh) < outh_ref.shape[1]:
            colsh.append(jnp.zeros_like(colsh[0]))
            colsl.append(jnp.zeros_like(colsl[0]))
        outh_ref[:] = jnp.stack(colsh, axis=1)
        outl_ref[:] = jnp.stack(colsl, axis=1)
        cols0h, cols0l = [], []
        for a in range(A):
            rh, rl = _lane_sum_df(acc0h_ref[a], acc0l_ref[a])
            cols0h.append(rh[:, 0])
            cols0l.append(rl[:, 0])
        while len(cols0h) < out0h_ref.shape[1]:
            cols0h.append(jnp.zeros_like(cols0h[0]))
            cols0l.append(jnp.zeros_like(cols0l[0]))
        out0h_ref[:] = jnp.stack(cols0h, axis=1)
        out0l_ref[:] = jnp.stack(cols0l, axis=1)


def _call_pair_kernel_df(t_pair, g_pair, g0_pair, V, A, interpret):
    th, tl = t_pair
    gh, gl = g_pair
    g0h, g0l = g0_pair
    _, B, S = th.shape
    n_s = S // TS
    w_ab = -(-(V * V * A) // 128) * 128
    kernel = functools.partial(_pair_kernel_df, V=V, A=A, n_s=n_s)
    in_spec3 = lambda C: pl.BlockSpec((C, TB, TS), lambda ib, is_: (ib * 0, ib, is_))
    out_spec = lambda W: pl.BlockSpec((TB, W), lambda ib, is_: (ib, ib * 0))
    outh, outl, out0h, out0l = pl.pallas_call(
        kernel,
        grid=(B // TB, n_s),
        in_specs=[in_spec3(A * 9), in_spec3(A * 9),
                  in_spec3(V * 3), in_spec3(V * 3),
                  in_spec3(3), in_spec3(3)],
        out_specs=[out_spec(w_ab), out_spec(w_ab),
                   out_spec(128), out_spec(128)],
        out_shape=[
            jax.ShapeDtypeStruct((B, w_ab), jnp.float32),
            jax.ShapeDtypeStruct((B, w_ab), jnp.float32),
            jax.ShapeDtypeStruct((B, 128), jnp.float32),
            jax.ShapeDtypeStruct((B, 128), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((V * V * A, TB, TS), jnp.float32),
            pltpu.VMEM((V * V * A, TB, TS), jnp.float32),
            pltpu.VMEM((A, TB, TS), jnp.float32),
            pltpu.VMEM((A, TB, TS), jnp.float32),
        ],
        interpret=interpret,
    )(th, tl, gh, gl, g0h, g0l)
    ab = (outh[:, : V * V * A], outl[:, : V * V * A])
    z0 = (out0h[:, :A], out0l[:, :A])
    return ab, z0


# ---------------------------------------------------------------- XLA front
def _gather_sum_df(tab_h, tab_l, codes_i32):
    """lograw = sum_u LUT[code_u] in df32. codes (B,S,U) int32 with the
    none-row index for absent UMIs (LUT none-row is exactly 0)."""
    U = codes_i32.shape[-1]
    h = jnp.take(tab_h, codes_i32[..., 0], axis=0)
    l = jnp.take(tab_l, codes_i32[..., 0], axis=0)
    for uu in range(1, U):
        h2 = jnp.take(tab_h, codes_i32[..., uu], axis=0)
        l2 = jnp.take(tab_l, codes_i32[..., uu], axis=0)
        h, l = df.add(h, l, h2, l2)
    return h, l


def _df_max_last(h, l):
    """df max over the last axis: hi-argmax element with its lo word."""
    mh = jnp.max(h, axis=-1, keepdims=True)
    mask = h == mh
    ml = jnp.max(jnp.where(mask, l, -jnp.inf), axis=-1, keepdims=True)
    return mh, ml


def _mixture_table_df(lograw_h, lograw_l):
    """lograw (B,S,A9) df -> reference-normalized mixture table t (df).

    t = ((exp(lograw - max) / M) + 1e-6) / (1 + 1e-6): the per-UMI
    max-divisions telescope to the single max-shift; the max of the
    smoothed table is exactly 1 + 1e-6 because the argmax element of the
    normalized table is exactly 1 in df (x/x == 1, verified)."""
    mh = jnp.max(lograw_h, axis=-1, keepdims=True)
    dh, dl = df.add_f32(lograw_h, lograw_l, -mh)
    uh, ul = df.exp(dh, dl)
    Mh, Ml = _df_max_last(uh, ul)
    rh, rl = df.div(np.float32(1.0), np.float32(0.0), Mh, Ml)
    vh, vl = df.mul(uh, ul, rh, rl)
    wh, wl = df.add(vh, vl, _SMOOTH_DF[0], _SMOOTH_DF[1])
    kh, kl = _K_SMOOTH
    return df.mul(wh, wl, kh, kl)


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


def _singlet_df(codes_i32, msk, gps_g, gp0_g, logf_h, logf_l):
    """Pass 1 (cmd_cram_demuxlet.cpp:415-461) in df32.

    gps_g: ((B,S,V,3) hi, lo) df pair; gp0_g likewise (B,S,3).
    Returns ((B,V) df llk, (B,) df llk0)."""
    lh, ll = _gather_sum_df(logf_h, logf_l, codes_i32)  # (B,S,3)
    mh = jnp.max(lh, axis=-1, keepdims=True)
    dh, dl = df.add_f32(lh, ll, -mh)
    uh, ul = df.exp(dh, dl)
    # sequential l-order sum (reference :440-443)
    sh, sl = df.add(uh[..., 0], ul[..., 0], uh[..., 1], ul[..., 1])
    sh, sl = df.add(sh, sl, uh[..., 2], ul[..., 2])
    rh, rl = df.div(np.float32(1.0), np.float32(0.0), sh, sl)
    glh, gll = df.mul(uh, ul, rh[..., None], rl[..., None])
    glh, gll = df.add(glh, gll, _SMOOTH_DF[0], _SMOOTH_DF[1])
    s2h, s2l = df.add(glh[..., 0], gll[..., 0], glh[..., 1], gll[..., 1])
    s2h, s2l = df.add(s2h, s2l, glh[..., 2], gll[..., 2])
    r2h, r2l = df.div(np.float32(1.0), np.float32(0.0), s2h, s2l)
    glh, gll = df.mul(glh, gll, r2h[..., None], r2l[..., None])

    gh, gl_ = gps_g
    g0h, g0l = gp0_g

    def contrib(ph, pl_):
        """log(sum_l gl[l] * p[l]) per slot, masked to exact zero."""
        ih, il = df.mul(glh[..., 0], gll[..., 0], ph[..., 0], pl_[..., 0])
        ih, il = df.add(ih, il, *df.mul(glh[..., 1], gll[..., 1],
                                        ph[..., 1], pl_[..., 1]))
        ih, il = df.add(ih, il, *df.mul(glh[..., 2], gll[..., 2],
                                        ph[..., 2], pl_[..., 2]))
        ch, cl = df.log(ih, il)
        z = np.float32(0.0)
        return jnp.where(msk, ch, z), jnp.where(msk, cl, z)

    llk_h, llk_l = [], []
    V = gh.shape[2]
    for j in range(V):
        ch, cl = contrib(gh[:, :, j], gl_[:, :, j])
        vh, vl = _df_sum_axis(ch, cl, axis=1)
        llk_h.append(vh)
        llk_l.append(vl)
    c0h, c0l = contrib(g0h, g0l)
    z0h, z0l = _df_sum_axis(c0h, c0l, axis=1)
    return (jnp.stack(llk_h, 1), jnp.stack(llk_l, 1)), (z0h, z0l)


def split_tables(gps, gp0, w, logf):
    """Host-side: split f64 tables into df planes with the zero none-row
    appended to the LUTs (mirrors pallas_pair.extend_luts)."""
    gps_h, gps_l = df.from_f64(gps)
    gp0_h, gp0_l = df.from_f64(gp0)
    wz = np.zeros((w.shape[0] + 1, w.shape[1]), dtype=np.float64)
    wz[:-1] = w
    lz = np.zeros((logf.shape[0] + 1, 3), dtype=np.float64)
    lz[:-1] = logf
    w_h, w_l = df.from_f64(wz)
    logf_h, logf_l = df.from_f64(lz)
    return (gps_h, gps_l), (gp0_h, gp0_l), (w_h, w_l), (logf_h, logf_l)


def demux_block_exact_impl(
    codes, idx, msk, gps_pair, gp0_pair, w_pair, logf_pair,
    n_alpha, n_samples, interpret=False,
):
    """Fused exact-mode (df32) block step.

    codes (B,S,U) uint8 (255 = none); idx (B,S) int32; msk (B,S) bool;
    gps_pair ((NS,V,3) hi, lo); gp0_pair ((NS,3) hi, lo); w_pair
    ((NB+1, A*9) hi, lo); logf_pair ((NB+1, 3) hi, lo).
    Returns df pairs: (llk (B,V), llk0 (B,), llk_ab (B,V,V,A), llk00 (B,A)),
    each as (hi, lo) f32 — combine to f64 on the host."""
    B, S, U = codes.shape
    V, A = n_samples, n_alpha
    none_row = w_pair[0].shape[0] - 1
    c = jnp.where(codes == 255, jnp.uint8(none_row), codes).astype(jnp.int32)

    lograw_h, lograw_l = _gather_sum_df(w_pair[0], w_pair[1], c)
    th, tl = _mixture_table_df(lograw_h, lograw_l)  # (B,S,A9)
    t_h = jnp.transpose(th, (2, 0, 1))
    t_l = jnp.transpose(tl, (2, 0, 1))

    neutral = jnp.zeros((3,), jnp.float32).at[0].set(1.0)
    zero3 = jnp.zeros((3,), jnp.float32)
    gh = jnp.take(gps_pair[0], idx, axis=0)  # (B,S,V,3)
    gl = jnp.take(gps_pair[1], idx, axis=0)
    gh = jnp.where(msk[..., None, None], gh, neutral)
    gl = jnp.where(msk[..., None, None], gl, zero3)
    g0h = jnp.take(gp0_pair[0], idx, axis=0)  # (B,S,3)
    g0l = jnp.take(gp0_pair[1], idx, axis=0)
    g0h = jnp.where(msk[..., None], g0h, neutral)
    g0l = jnp.where(msk[..., None], g0l, zero3)

    g_t = lambda x: jnp.transpose(x, (2, 3, 0, 1)).reshape(V * 3, B, S)
    g0_t = lambda x: jnp.transpose(x, (2, 0, 1))
    ab, z0 = _call_pair_kernel_df(
        (t_h, t_l), (g_t(gh), g_t(gl)), (g0_t(g0h), g0_t(g0l)),
        V, A, interpret,
    )
    llk_ab = (ab[0].reshape(B, V, V, A), ab[1].reshape(B, V, V, A))

    llk, llk0 = _singlet_df(c, msk, (gh, gl), (g0h, g0l),
                            logf_pair[0], logf_pair[1])
    return llk, llk0, llk_ab, z0


demux_block_exact = jax.jit(
    demux_block_exact_impl,
    static_argnames=("n_alpha", "n_samples", "interpret"),
)


def combine(pair):
    """(hi, lo) device pair -> host f64."""
    return df.to_f64(np.asarray(pair[0]), np.asarray(pair[1]))
