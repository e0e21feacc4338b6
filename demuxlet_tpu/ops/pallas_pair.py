"""Pallas TPU kernel for the doublet pair-search pass (fast mode).

The reference's hot loop (cmd_cram_demuxlet.cpp:671-709) computes, per cell
and covered SNP, llkAB[j,k,a] += log(sum_lm gps[j,l]*gps[k,m]*pGs[a,l,m]).
XLA maps this contraction badly: per-(cell,slot) (A*3,3)@(3,V) matmuls have
<1% MXU utilization, and einsum formulations materialize huge broadcasts.

Division of labor here:
  * XLA (MXU + fused VPU): count LUT matmul lograw = cnt @ W, exp-normalize
    -> mixture table t, emitted in (A*9, B, S) layout.
  * Pallas (VPU): the (l,m,j,k,a) contraction + log + slot reduction, with
    (cell, slot) mapped onto (sublane, lane): one grid step owns a
    (32 cells x 128 slots) tile and the tiny loops are unrolled into vector
    ops over 4096 slots, via the factorization
        U[j,a,m]     = sum_l g[j,l] * t[a,l,m]        (V*A*3 FMAs)
        inner[j,k,a] = sum_m g[k,m] * U[j,a,m]        (V*V*A*3 FMAs)
    Per-(j,k,a) accumulators live in VMEM scratch across slot-tile steps;
    the lane reduction happens once per cell-tile on the last slot step.

Padded slots are exactly neutral by construction (zero counts => t == 1;
gps row (1,0,0) => inner == 1 => log == 0), so no mask input is needed.

Precision: f32 ("fast" mode; abs error ~1e-4 relative on O(1e4) LLKs — demux
calls identical, printed LLKs may differ in the last digit; the alpha=0.5
symmetric-pair argmax tie can resolve to the mirrored pair). The byte-parity
path is the f64 XLA kernel in models/likelihood.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TB = 32  # cells per tile (sublanes)
TS = 128  # slots per tile (lanes)

# scoped-VMEM budget for picking the slot-group width (halves): double-
# buffered input blocks + accumulator scratch must stay under the default
# 16 MB window on v5e (leave headroom for Mosaic temporaries)
_VMEM_BUDGET = 13 * 2**20


def dedup_channels(grid_alpha):
    """Static channel-dedup map for the A*9 mixture columns.

    The per-UMI mixture factor pr*(1-p) + pa*p depends on (a,l,m) only
    through p = 0.5*l + (m-l)*0.5*alpha (cmd_cram_demuxlet.cpp:606-625),
    so LUT columns with equal p are bit-identical (same expression, same
    inputs — luts.pair_lut) and the A*9 logical channels collapse to the
    unique p values (18 for the 5-alpha bench grid, 5 for the default
    [0, 0.5] grid). Cuts the XLA front's gather/normalize width and the
    kernel's HBM t-traffic by ~2.5x.

    Returns (cols, expand): cols = A*9-order indices of first-occurrence
    unique columns (select them from the full LUT with w[:, cols]);
    expand = per-logical-channel index into the deduped table.
    """
    seen, cols, expand = {}, [], []
    for a, alpha in enumerate(grid_alpha):
        for l in range(3):
            for m in range(3):
                p = 0.5 * l + (m - l) * 0.5 * alpha
                if p not in seen:
                    seen[p] = len(cols)
                    cols.append(a * 9 + l * 3 + m)
                expand.append(seen[p])
    return tuple(cols), tuple(expand)


# exact-neutrality constant: with q = fl(1 + 1e-6), fl(q * fl(1/q)) == 1.0,
# so a padded slot (lograw == 0 everywhere) yields t == 1 exactly and
# contributes log(1) == 0 — no mask needed (checked in tests/test_pallas.py)
_SMOOTH = np.float32(1e-6)
_KNORM = np.float32(1.0) / (np.float32(1.0) + np.float32(1e-6))


def _norm_t(lograw, axis):
    """Mixture table from raw LUT log-sums: t = (exp(lr-max)+1e-6)/(1+1e-6).

    The reference divides by the (telescoped) running max and smooths once
    (cmd_cram_demuxlet.cpp:631-663); the final max-division is the CONSTANT
    1+1e-6 because max(exp(lr-max)) == 1 exactly — saving a second reduce
    pass, and fl(q*fl(1/q)) == 1 keeps padded slots exactly neutral. Runs
    in XLA, not the kernel: the kernel is VPU-op-bound, and A*9 exps per
    tile on its critical path measured ~7%% slower than letting XLA fuse
    them into the front (161.5K vs 173.3K barcodes/s)."""
    mx = jnp.max(lograw, axis=axis, keepdims=True)
    return (jnp.exp(lograw - mx) + _SMOOTH) * _KNORM


def _pair_kernel(t_ref, g_ref, out_ref, out0_ref, acc_ref, acc0_ref,
                 accs_ref, *, V, A, n_g, halves, a0_sep, sym_a, expand):
    """Accumulates per-slot log(inner mixture) into VMEM scratch planes.

    expand: static per-logical-channel map into the DEDUPED t table
    (dedup_channels) — t_ref carries only the unique p-value columns.

    Three structural cuts on the V*V*A log+dot count per slot:
    * halves >= 2: each grid step owns `halves` 128-lane slot groups and
      accumulates log(inner_1 * ... * inner_halves) — dividing the
      transcendental count (safe: inner >= ~1e-6 since t >= 1e-6/(1+1e-6)
      and gps rows sum to 1, so even a 4-product stays >= 1e-24, far
      above f32 underflow; the extra roundings are ~1e-7 relative,
      inside fast-mode tolerance).
    * a0_sep: the alpha == 0 plane factorizes — llk_ab[j,k,0] =
      sum_s log d_s[j] + sum_s log gsum_s[k] (t[0,l,m] identical across
      m) — so V + V separable accumulators (accs_ref) replace V*V.
    * sym_a: the alpha == 0.5 plane is (j,k)-symmetric (the W LUT columns
      for (l,m) and (m,l) coincide at alpha = 0.5), so j > k channels
      are skipped and mirrored in the finish.

    Measured dead end (round 2): replacing the per-slot jnp.log with
    mantissa-PRODUCT accumulation + i32 exponent tracking (log once per
    lane at the end, renorm every 2nd grid step) ran 157.1K b/s vs
    173.3K — Mosaic's vector log is cheap, and the extra scratch traffic
    + renorm pass cost more than the 320 logs saved (it also pushed
    scoped VMEM past the 16MB default)."""
    s_step = pl.program_id(1)

    @pl.when(s_step == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        acc0_ref[:] = jnp.zeros_like(acc0_ref)
        if a0_sep:
            accs_ref[:] = jnp.zeros_like(accs_ref)

    def lane_half(x, h):
        return x[:, h * TS : (h + 1) * TS] if halves > 1 else x

    n_t = 1 + max(expand)
    tu = [[lane_half(t_ref[c], h) for c in range(n_t)]
          for h in range(halves)]
    t = [[tu[h][expand[x]] for x in range(A * 9)] for h in range(halves)]
    g = [[lane_half(g_ref[i], h) for i in range(V * 3)]
         for h in range(halves)]

    def logprod(vals):
        p = vals[0]
        for v in vals[1:]:
            p = p * v
        return jnp.log(p)

    if a0_sep:
        for k in range(V):
            gs = [g[h][k * 3] + g[h][k * 3 + 1] + g[h][k * 3 + 2]
                  for h in range(halves)]
            accs_ref[V + k] = accs_ref[V + k] + logprod(gs)

    for j in range(V):
        u = [[] for _ in range(halves)]
        for h in range(halves):
            for a in range(A):
                if a0_sep and a == 0:
                    d = (g[h][j * 3] * t[h][0]
                         + g[h][j * 3 + 1] * t[h][3]
                         + g[h][j * 3 + 2] * t[h][6])
                    u[h] += [d, d, d]
                    continue
                for m in range(3):
                    u[h].append(
                        g[h][j * 3] * t[h][a * 9 + m]
                        + g[h][j * 3 + 1] * t[h][a * 9 + 3 + m]
                        + g[h][j * 3 + 2] * t[h][a * 9 + 6 + m]
                    )
        if a0_sep:
            accs_ref[j] = accs_ref[j] + logprod(
                [u[h][0] for h in range(halves)]
            )
        for k in range(V):
            for a in range(A):
                if a0_sep and a == 0:
                    continue  # separable accumulators above
                if sym_a == a and j > k:
                    continue  # mirrored from (k, j, a) at finish
                inner = [
                    g[h][k * 3] * u[h][a * 3]
                    + g[h][k * 3 + 1] * u[h][a * 3 + 1]
                    + g[h][k * 3 + 2] * u[h][a * 3 + 2]
                    for h in range(halves)
                ]
                idx = (j * V + k) * A + a
                acc_ref[idx] = acc_ref[idx] + logprod(inner)

    # background pair term llks00 (reference :700-709): g0 = mean over samples
    inv_v = jnp.float32(1.0 / V)
    g0 = []
    for h in range(halves):
        g0h = []
        for l in range(3):
            s = g[h][l]
            for j in range(1, V):
                s = s + g[h][j * 3 + l]
            g0h.append(s * inv_v)
        g0.append(g0h)
    if a0_sep:
        d0 = [g0[h][0] * t[h][0] + g0[h][1] * t[h][3] + g0[h][2] * t[h][6]
              for h in range(halves)]
        accs_ref[2 * V] = accs_ref[2 * V] + logprod(d0)
        g0s = [g0[h][0] + g0[h][1] + g0[h][2] for h in range(halves)]
        accs_ref[2 * V + 1] = accs_ref[2 * V + 1] + logprod(g0s)
    for a in range(A):
        if a0_sep and a == 0:
            continue
        inner0 = []
        for h in range(halves):
            u0 = [
                g0[h][0] * t[h][a * 9 + m]
                + g0[h][1] * t[h][a * 9 + 3 + m]
                + g0[h][2] * t[h][a * 9 + 6 + m]
                for m in range(3)
            ]
            inner0.append(
                g0[h][0] * u0[0] + g0[h][1] * u0[1] + g0[h][2] * u0[2]
            )
        acc0_ref[a] = acc0_ref[a] + logprod(inner0)

    @pl.when(s_step == n_g - 1)
    def _():
        # separate outputs, each padded to a 128-multiple lane width — a
        # single fused odd-width output sends Mosaic into a compile tailspin
        if a0_sep:
            sd = [jnp.sum(accs_ref[j], axis=1) for j in range(V)]
            sg = [jnp.sum(accs_ref[V + k], axis=1) for k in range(V)]
        cols = []
        for idx in range(V * V * A):
            a = idx % A
            jk = idx // A
            j, k = jk // V, jk % V
            if a0_sep and a == 0:
                cols.append(sd[j] + sg[k])
            elif sym_a == a and j > k:
                cols.append(cols[(k * V + j) * A + a])
            else:
                cols.append(jnp.sum(acc_ref[idx], axis=1))
        while len(cols) < out_ref.shape[1]:
            cols.append(jnp.zeros_like(cols[0]))
        out_ref[:] = jnp.stack(cols, axis=1)
        cols0 = []
        for a in range(A):
            if a0_sep and a == 0:
                cols0.append(jnp.sum(accs_ref[2 * V], axis=1)
                             + jnp.sum(accs_ref[2 * V + 1], axis=1))
            else:
                cols0.append(jnp.sum(acc0_ref[a], axis=1))
        while len(cols0) < out0_ref.shape[1]:
            cols0.append(jnp.zeros_like(cols0[0]))
        out0_ref[:] = jnp.stack(cols0, axis=1)


@functools.partial(
    jax.jit,
    static_argnames=("n_alpha", "n_samples", "interpret", "a0_sep", "sym_a",
                     "expand"),
)
def pair_llks_pallas(cnt_t, gps_t, wt, n_alpha, n_samples, interpret=False,
                     a0_sep=False, sym_a=None, expand=None):
    """Fast-mode pair-search LLKs.

    cnt_t: (NB, B, S) f32 — slot counts; B %% 32 == 0, S %% 128 == 0,
           padded slots all-zero.
    gps_t: (V*3, B, S) f32 — per-slot genotype posteriors ((j,l) major);
           padded slots carry the neutral row (1,0,0) per sample.
    wt:    (NB, A*9) f32 — pair LUT (log domain); with expand set, the
           column-DEDUPED LUT (NB, C) instead (dedup_channels).
    a0_sep: grid's alpha[0] == 0 (separable plane); sym_a: index of
           alpha == 0.5 in the grid, if present (symmetric plane) — see
           _pair_kernel.
    Returns (llk_ab[B, V, V, A] f32, llk_00[B, A] f32).
    """
    NB, B, S = cnt_t.shape
    V, A = n_samples, n_alpha
    assert B % TB == 0 and S % TS == 0, (B, S)

    # XLA front: LUT matmul (MXU) + exp-normalization (_norm_t; fused
    # elementwise). The per-UMI max-divisions telescope to one max-shift,
    # so the smoothing order matches the reference exactly in real
    # arithmetic — fast mode's only approximation is f32 rounding.
    # The max over deduped channels equals the max over all A*9 (dropping
    # duplicates never changes a max), so dedup is numerically free.
    # precision=HIGHEST: the TPU default rounds f32 matmul inputs to bf16
    # (~1.6e-3 relative on lograw — beyond fast-mode tolerance); HIGHEST
    # (bf16x6 passes) reproduces the take()-based sums bit-exactly for
    # one-hot/count inputs (measured on v5e).
    lograw = jnp.einsum(
        "nbs,nx->xbs", cnt_t, wt, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    return _call_pair_kernel(_norm_t(lograw, 0), gps_t, V, A, interpret,
                             a0_sep=a0_sep, sym_a=sym_a, expand=expand)


def _call_pair_kernel(t, gps_t, V, A, interpret, a0_sep=False, sym_a=None,
                      expand=None, gp0_t=None):
    """Invoke the pair kernel; each output lane width padded to 128-mult.

    Dispatch: V*V*A accumulator channels beyond _UNROLL_CAP route to the
    (j,k)-tiled kernel (trace time and VMEM flat in V); smaller pools run
    the fully unrolled kernel below. gp0_t ((3, B, S) background planes)
    feeds the tiled path; when absent it is the f32 sample mean (the
    unrolled kernel's in-kernel order, to rounding).

    Grid steps own `halves` 128-lane slot groups (batched logs) — the
    widest of 1/2/4 that divides the slot-tile count and keeps the
    double-buffered input blocks + scratch under the VMEM budget."""
    n_t, B, S = t.shape
    if expand is None:
        expand = tuple(range(A * 9))
    plan = plan_pair_tiles(V, A, a0_sep, sym_a)
    if plan is not None:
        if gp0_t is None:
            gp0_t = (
                sum(gps_t[j * 3 : j * 3 + 3] for j in range(V))
                * jnp.float32(1.0 / V)
            )
        return _call_pair_kernel_tiled(
            t, gps_t, gp0_t, V, A, interpret, plan,
            a0_sep=a0_sep, sym_a=sym_a, expand=expand,
        )
    n_s = S // TS
    # widest log batching first (fewest transcendentals), shrinking the
    # cell-tile height to fit VMEM before giving up a batching level
    tb, halves, done = TB, 1, False
    for cand_h in (4, 2, 1):
        if n_s % cand_h:
            continue
        for cand_tb in (TB, TB // 2, TB // 4):
            if B % cand_tb:
                continue
            scratch = (V * V * A + A + 2 * V + 2) * cand_tb * TS * 4
            blocks = 2 * (n_t + V * 3) * cand_tb * TS * cand_h * 4
            if blocks + scratch <= _VMEM_BUDGET:
                tb, halves = cand_tb, cand_h
                done = True
                break
        if done:
            break
    # never silently accept an over-budget config (round-3 verdict): any
    # pool too big for the unrolled scratch routes to the tiled kernel
    # via plan_pair_tiles, so reaching here unfit is a planner bug
    assert done, (V, A, n_t, "unrolled pair kernel does not fit VMEM")
    n_g = n_s // halves
    w_ab = -(-(V * V * A) // 128) * 128
    kernel = functools.partial(_pair_kernel, V=V, A=A, n_g=n_g,
                               halves=halves, a0_sep=a0_sep, sym_a=sym_a,
                               expand=expand)
    TSW = TS * halves
    out, out0 = pl.pallas_call(
        kernel,
        grid=(B // tb, n_g),
        in_specs=[
            pl.BlockSpec((n_t, tb, TSW), lambda ib, is_: (ib * 0, ib, is_)),
            pl.BlockSpec((V * 3, tb, TSW), lambda ib, is_: (ib * 0, ib, is_)),
        ],
        out_specs=[
            pl.BlockSpec((tb, w_ab), lambda ib, is_: (ib, ib * 0)),
            pl.BlockSpec((tb, 128), lambda ib, is_: (ib, ib * 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, w_ab), jnp.float32),
            jax.ShapeDtypeStruct((B, 128), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((V * V * A, tb, TS), jnp.float32),
            pltpu.VMEM((A, tb, TS), jnp.float32),
            pltpu.VMEM((2 * V + 2, tb, TS), jnp.float32),
        ],
        interpret=interpret,
    )(t, gps_t)
    out_ab = out[:, : V * V * A].reshape(B, V, V, A)
    out_00 = out0[:, :A]
    return out_ab, out_00


# ------------------------------------------------------------- tiled path
#
# The unrolled kernel above materializes ALL V*V*A accumulator channels in
# one trace: trace time and VMEM scratch scale ~V^2*A, which is fine at the
# V<=8 pools it was built for but takes minutes to trace at V=32 and blows
# scoped VMEM beyond (round-3 verdict #1). The reference handles arbitrary
# nv (cmd_cram_demuxlet.cpp:671-709, with an nv^2 gpAB precompute that hits
# 18 GB at nv=64). Here the (j,k) pair axis tiles instead: grid
# (B/tb, n_tiles, n_s) with s innermost, each step owning a (Jt x Kt) pair
# tile whose accumulator scratch is (Jt*Kt*Ac, tb, TS) — flat in V. The
# tile list ships as scalar-prefetch arrays so the default [0, 0.5] grid
# enumerates only upper-triangle tiles (the alpha=0.5 plane is symmetric);
# the separable alpha=0 plane, llks00 background term and (for the exact
# kernel) pass-1 move to a small O(V)-channel extras kernel.

_UNROLL_CAP = 384  # max V*V*A accumulator channels for the unrolled kernel


def tile_pos_map(V, nA, parts, mirror):
    """Host position map (V, V, nA) -> channel index into the
    concatenated tiled-kernel outputs. parts: (tiles, Jt, Kt, Wt, tri,
    offset) per kernel invocation (tri = packed upper-triangle channel
    layout, tri_index). mirror: fill missing (j, k) from the (k, j)
    transpose (the symmetric-plane lower triangle). Shared by the f32
    and df32 tiled reassemblies."""
    pos = np.full((V, V, nA), -1, dtype=np.int64)
    for tiles, Jt, Kt, Wt, tri, off in parts:
        t_idx = tri_index(Jt, Kt)[0] if tri else None
        for tix, (jt, kt) in enumerate(tiles):
            for dj in range(Jt):
                j = jt * Jt + dj
                if j >= V:
                    continue
                for dk in range(dj if tri else 0, Kt):
                    k = kt * Kt + dk
                    if k >= V:
                        continue
                    ch = (t_idx[(dj, dk)] if tri else dj * Kt + dk) * nA
                    base = off + tix * Wt + ch
                    pos[j, k, :] = np.arange(base, base + nA)
    if mirror:
        miss = pos < 0
        pos = np.where(miss, np.transpose(pos, (1, 0, 2)), pos)
    assert (pos >= 0).all()
    return pos


def plan_pair_tiles(V, A, a0_sep, sym_a):
    """Tile plan for the pair axis, or None to run the unrolled kernel.

    Returns (Jt, Kt, Vp, tiles, ac_list, triangular):
      Jt/Kt   tile extents on the (j, k) axes (equal; 16 when the padded
              sample count allows, else 8 — bigger tiles amortize the
              per-tile U recompute, 3/Kt of the inner FMAs);
      Vp      V padded up to a Jt multiple (padded samples get neutral
              rows and their channels are dropped at reassembly);
      tiles   static (jt, kt) list — upper-triangular when the ONLY
              tiled plane is the symmetric alpha=0.5 one (default grid);
      ac_list alpha indices the tiled kernel computes (alpha[0] == 0 is
              separable and lives in the extras kernel).

    Bit-symmetry caveat (advisor r4 #2): on MULTI-alpha grids
    (ac_list != [sym_a]) the tiled path computes the symmetric
    alpha=0.5 plane's (j,k) and (k,j) channels in independent tiles, so
    they can differ by ulps — unlike the unrolled kernel, which mirrors
    them bit-exactly. Doublet pair order on exact ties can therefore
    flip between tiled and unrolled/oracle modes; covered by the
    documented canonicalize-on-tie parity contract
    (parity_utils.canonicalize_best).
    """
    if V * V * A <= _UNROLL_CAP:
        return None
    # 16x16 tiles amortize the U recompute best; 8x8 when 16 would pad
    # the sample axis (padded-channel compute is pure waste)
    Jt = 16 if V % 16 == 0 else 8
    Vp = -(-V // Jt) * Jt
    n_t = Vp // Jt
    ac_list = [a for a in range(A) if not (a0_sep and a == 0)]
    triangular = a0_sep and ac_list == [sym_a]
    if triangular:
        tiles = [(jt, kt) for jt in range(n_t) for kt in range(jt, n_t)]
    else:
        tiles = [(jt, kt) for jt in range(n_t) for kt in range(n_t)]
    return Jt, Jt, Vp, tiles, ac_list, triangular


def plan_groups(plan, sym_a, default=False):
    """Split a tile plan into per-plane execution groups
    [(ac_sublist, tiles, tri_enum)] (round-5 verdict #3).

    On MULTI-alpha grids the symmetric alpha=0.5 plane's j > k channels
    previously computed in full tiles (~0.5/nA of the tiled work
    wasted). With the split, the sym plane runs alone on
    upper-triangular tile enumeration (diagonal tiles take the
    statically triangular body) and mirrors at reassembly, while the
    remaining alphas keep the full square enumeration.

    MEASURED same-session on v5e at V=32/A=5 (round 5, /tmp A/B via
    bench.measure_tpu): fast 104,974 -> 101,308 b/s (split 3.5% SLOWER
    — the second pallas_call re-streams the t/g blocks, which costs the
    bandwidth-lean f32 kernel more than the saved dots) vs exact
    6,143 -> 6,558 b/s (+6.8% — the df kernel is ALU-bound, so saved
    dot3 chains show through). Defaults follow: fast OFF, exact ON
    (`default` arg per caller); DEMUX_TPU_SPLIT_SYM=0/1 overrides both.
    Single-plane/default-grid plans pass through unchanged.
    Bit-symmetry: mirrored (k,j) channels become exact copies of (j,k)
    (previously independently computed, ulp-different) — covered by the
    documented canonicalize-on-tie contract either way."""
    import os

    Jt, Kt, Vp, tiles, ac_list, triangular = plan
    env = os.environ.get("DEMUX_TPU_SPLIT_SYM")
    split = default if env is None else env != "0"
    if (
        not split
        or triangular
        or sym_a is None
        or sym_a not in ac_list
        or len(ac_list) <= 1
    ):
        return Jt, Kt, Vp, [(ac_list, tiles, triangular)]
    n_t = Vp // Jt
    others = [a for a in ac_list if a != sym_a]
    tri_tiles = [(jt, kt) for jt in range(n_t) for kt in range(jt, n_t)]
    return Jt, Kt, Vp, [(others, tiles, False), ([sym_a], tri_tiles, True)]


def tri_index(Jt, Kt):
    """Packed channel index for the upper triangle of a (Jt, Kt) tile:
    (dj, dk) with dk >= dj -> dense [0, Jt*(Jt+1)/2). Shared by the f32
    and df32 diagonal-tile kernels and the reassembly pos maps."""
    idx, n = {}, 0
    for dj in range(Jt):
        for dk in range(dj, Kt):
            idx[(dj, dk)] = n
            n += 1
    return idx, n


def _pair_kernel_tiled(tj_ref, tk_ref, t_ref, gj_ref, gk_ref, out_ref,
                       acc_ref, *, Jt, Kt, ac_list, n_g, halves, expand,
                       tri=False):
    """One (Jt x Kt) pair tile per grid step; s (slot groups) innermost so
    each tile's accumulator sweep is contiguous and its output block
    flushes once. Same math per channel as _pair_kernel; U[j, a, m] is
    recomputed per tile (3/Kt of the inner FMAs — the price of a flat-in-V
    scratch). tri: DIAGONAL tiles of a symmetric plane — only dk >= dj
    channels computed (packed by tri_index; the dj > dk half mirrors at
    reassembly), recovering the ~47%%/tile the dynamic tile index cannot
    skip."""
    s_step = pl.program_id(2)

    @pl.when(s_step == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    def lane_half(x, h):
        return x[:, h * TS : (h + 1) * TS] if halves > 1 else x

    n_t = 1 + max(expand)
    tu = [[lane_half(t_ref[c], h) for c in range(n_t)]
          for h in range(halves)]
    t = [[tu[h][expand[x]] for x in range(len(expand))]
         for h in range(halves)]
    gj = [[lane_half(gj_ref[i], h) for i in range(Jt * 3)]
          for h in range(halves)]
    gk = [[lane_half(gk_ref[i], h) for i in range(Kt * 3)]
          for h in range(halves)]

    def logprod(vals):
        p = vals[0]
        for v in vals[1:]:
            p = p * v
        return jnp.log(p)

    nA = len(ac_list)
    t_idx = tri_index(Jt, Kt)[0] if tri else None
    for dj in range(Jt):
        u = [[] for _ in range(halves)]
        for h in range(halves):
            for a in ac_list:
                for m in range(3):
                    u[h].append(
                        gj[h][dj * 3] * t[h][a * 9 + m]
                        + gj[h][dj * 3 + 1] * t[h][a * 9 + 3 + m]
                        + gj[h][dj * 3 + 2] * t[h][a * 9 + 6 + m]
                    )
        for dk in range(dj if tri else 0, Kt):
            for ai in range(nA):
                inner = [
                    gk[h][dk * 3] * u[h][ai * 3]
                    + gk[h][dk * 3 + 1] * u[h][ai * 3 + 1]
                    + gk[h][dk * 3 + 2] * u[h][ai * 3 + 2]
                    for h in range(halves)
                ]
                ch = (t_idx[(dj, dk)] if tri else dj * Kt + dk) * nA + ai
                acc_ref[ch] = acc_ref[ch] + logprod(inner)

    @pl.when(s_step == n_g - 1)
    def _():
        cols = [jnp.sum(acc_ref[c], axis=1)
                for c in range(acc_ref.shape[0])]
        while len(cols) < out_ref.shape[1]:
            cols.append(jnp.zeros_like(cols[0]))
        out_ref[:] = jnp.stack(cols, axis=1)


def _extras_kernel(t_ref, g_ref, out_ref, acc_ref, *, V, A, n_g, halves,
                   a0_sep, expand):
    """O(V)-channel companion to the tiled kernel: the separable alpha=0
    plane factors (d[j] = g[j].t0, gsum[k]; llk_ab[j,k,0] recombines in
    XLA as logD[j] + logG[k]) and the llks00 background term for every
    alpha. g_ref carries gps|gp0 ((V*3+3) planes; gp0 host-exact rather
    than the in-kernel f32 mean)."""
    s_step = pl.program_id(1)

    @pl.when(s_step == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    def lane_half(x, h):
        return x[:, h * TS : (h + 1) * TS] if halves > 1 else x

    n_t = 1 + max(expand)
    tu = [[lane_half(t_ref[c], h) for c in range(n_t)]
          for h in range(halves)]
    t = [[tu[h][expand[x]] for x in range(len(expand))]
         for h in range(halves)]
    g = [[lane_half(g_ref[i], h) for i in range(V * 3 + 3)]
         for h in range(halves)]

    def logprod(vals):
        p = vals[0]
        for v in vals[1:]:
            p = p * v
        return jnp.log(p)

    ch = 0
    if a0_sep:
        for j in range(V):
            d = [g[h][j * 3] * t[h][0] + g[h][j * 3 + 1] * t[h][3]
                 + g[h][j * 3 + 2] * t[h][6] for h in range(halves)]
            acc_ref[ch] = acc_ref[ch] + logprod(d)
            ch += 1
        for k in range(V):
            gs = [g[h][k * 3] + g[h][k * 3 + 1] + g[h][k * 3 + 2]
                  for h in range(halves)]
            acc_ref[ch] = acc_ref[ch] + logprod(gs)
            ch += 1
        d0 = [g[h][V * 3] * t[h][0] + g[h][V * 3 + 1] * t[h][3]
              + g[h][V * 3 + 2] * t[h][6] for h in range(halves)]
        acc_ref[ch] = acc_ref[ch] + logprod(d0)
        ch += 1
        g0s = [g[h][V * 3] + g[h][V * 3 + 1] + g[h][V * 3 + 2]
               for h in range(halves)]
        acc_ref[ch] = acc_ref[ch] + logprod(g0s)
        ch += 1
    for a in range(A):
        if a0_sep and a == 0:
            continue
        inner0 = []
        for h in range(halves):
            g0 = (g[h][V * 3], g[h][V * 3 + 1], g[h][V * 3 + 2])
            u0 = [
                g0[0] * t[h][a * 9 + m]
                + g0[1] * t[h][a * 9 + 3 + m]
                + g0[2] * t[h][a * 9 + 6 + m]
                for m in range(3)
            ]
            inner0.append(g0[0] * u0[0] + g0[1] * u0[1] + g0[2] * u0[2])
        acc_ref[ch] = acc_ref[ch] + logprod(inner0)
        ch += 1

    @pl.when(s_step == n_g - 1)
    def _():
        cols = [jnp.sum(acc_ref[c], axis=1) for c in range(acc_ref.shape[0])]
        while len(cols) < out_ref.shape[1]:
            cols.append(jnp.zeros_like(cols[0]))
        out_ref[:] = jnp.stack(cols, axis=1)


def _call_extras_only(t, gps_t, gp0_t, V, A, interpret, a0_sep, expand):
    """Invoke just the O(V)-channel extras kernel (separable alpha=0
    factors + llks00); used by the tiled path and standalone when a
    single-point alpha=0 grid leaves no tiled channels. Fits its own
    (tb, halves) — its input block ((V*3+3) g-planes) outgrows the pair
    kernel's ((Jt+Kt)*3) for big V, so reusing the pair fit could blow
    VMEM (round-4 review #1). Returns the raw (B, Wx) output (see
    _extras_kernel's channel order)."""
    n_t_ch, B, S = t.shape
    n_s = S // TS
    tb, halves, done = TB, 1, False
    for cand_h in (4, 2, 1):
        if n_s % cand_h:
            continue
        for cand_tb in (TB, TB // 2, TB // 4):
            if B % cand_tb:
                continue
            n_x0 = (2 * V + 2 if a0_sep else 0) + (
                A - 1 if a0_sep else A)
            scratch = n_x0 * cand_tb * TS * 4
            blocks = 2 * (n_t_ch + V * 3 + 3) * cand_tb * TS * cand_h * 4
            if blocks + scratch <= _VMEM_BUDGET:
                tb, halves = cand_tb, cand_h
                done = True
                break
        if done:
            break
    assert done, (V, A, n_t_ch, "extras kernel does not fit VMEM")
    n_g = n_s // halves
    TSW = TS * halves
    n_x = (2 * V + 2 if a0_sep else 0) + (A - 1 if a0_sep else A)
    Wx = -(-n_x // 128) * 128
    g_all = jnp.concatenate([gps_t, gp0_t], axis=0)
    xkernel = functools.partial(
        _extras_kernel, V=V, A=A, n_g=n_g, halves=halves, a0_sep=a0_sep,
        expand=tuple(expand),
    )
    return pl.pallas_call(
        xkernel,
        grid=(B // tb, n_g),
        in_specs=[
            pl.BlockSpec((n_t_ch, tb, TSW), lambda ib, is_: (ib * 0, ib, is_)),
            pl.BlockSpec((V * 3 + 3, tb, TSW),
                         lambda ib, is_: (ib * 0, ib, is_)),
        ],
        out_specs=pl.BlockSpec((tb, Wx), lambda ib, is_: (ib, ib * 0)),
        out_shape=jax.ShapeDtypeStruct((B, Wx), jnp.float32),
        scratch_shapes=[pltpu.VMEM((n_x, tb, TS), jnp.float32)],
        interpret=interpret,
    )(t, g_all)


def _call_pair_kernel_tiled(t, gps_t, gp0_t, V, A, interpret, plan,
                            a0_sep=False, sym_a=None, expand=None):
    """(j,k)-tiled pair-search: tiled kernel + extras kernel + XLA
    reassembly. gp0_t: (3, B, S) background-gps planes (required here —
    the tiled kernel never sees all samples at once, so the in-kernel
    mean of the unrolled path is unavailable)."""
    n_t_ch, B, S = t.shape
    if expand is None:
        expand = tuple(range(A * 9))
    Jt, Kt, Vp, tiles, ac_list, triangular = plan
    groups = plan_groups(plan, sym_a, default=False)[3]
    nA = len(ac_list)
    n_s = S // TS
    if nA == 0:
        # single-point alpha=0 grid: every plane is separable — the
        # extras kernel alone carries the whole result
        ex = _call_extras_only(t, gps_t, gp0_t, V, A, interpret, a0_sep,
                               expand)
        sd = ex[:, :V]
        sg = ex[:, V : 2 * V]
        llk_ab = (sd[:, :, None] + sg[:, None, :])[..., None]
        llk_00 = (ex[:, 2 * V] + ex[:, 2 * V + 1])[:, None]
        return llk_ab, llk_00

    if Vp != V:
        # padded samples: neutral (1,0,0) rows — their channels never
        # reach the reassembled output
        neutral = np.zeros(((Vp - V) * 3, 1, 1), dtype=np.float32)
        neutral[0::3] = 1.0
        g_pad = jnp.broadcast_to(
            jnp.asarray(neutral), ((Vp - V) * 3, B, S)
        )
        gps_p = jnp.concatenate([gps_t, g_pad], axis=0)
    else:
        gps_p = gps_t

    # fit: halves (batched logs) then tb, under the double-buffered
    # input blocks + the LARGEST part's scratch across all groups
    # (all-diagonal tile sets only allocate the packed-triangle count)
    max_ch = 0
    for g_ac, g_tiles, g_tri in groups:
        diag = [tt for tt in g_tiles if g_tri and tt[0] == tt[1]]
        if len(diag) < len(g_tiles):
            max_ch = max(max_ch, Jt * Kt * len(g_ac))
        if diag:
            max_ch = max(max_ch, tri_index(Jt, Kt)[1] * len(g_ac))
    tb, halves = TB, 1
    done = False
    for cand_h in (4, 2, 1):
        if n_s % cand_h:
            continue
        for cand_tb in (TB, TB // 2, TB // 4):
            if B % cand_tb:
                continue
            scratch = max_ch * cand_tb * TS * 4
            blocks = 2 * (n_t_ch + (Jt + Kt) * 3) * cand_tb * TS * cand_h * 4
            if blocks + scratch <= _VMEM_BUDGET:
                tb, halves = cand_tb, cand_h
                done = True
                break
        if done:
            break
    assert done, (
        f"pair tile (Jt={Jt}, Kt={Kt}, Ac={nA}) does not fit VMEM even at "
        f"tb={TB // 4}; shrink the tile plan"
    )
    n_g = n_s // halves
    TSW = TS * halves

    def run_part(part_tiles, tri, ac):
        """One pallas_call over a tile subset; tri = the statically
        triangular diagonal-tile body (packed channels); ac = the alpha
        indices this group computes."""
        n_ch = (tri_index(Jt, Kt)[1] if tri else Jt * Kt) * len(ac)
        Wp = -(-n_ch // 128) * 128
        tile_j = jnp.asarray([jt for jt, _ in part_tiles], jnp.int32)
        tile_k = jnp.asarray([kt for _, kt in part_tiles], jnp.int32)
        kernel = functools.partial(
            _pair_kernel_tiled, Jt=Jt, Kt=Kt, ac_list=tuple(ac),
            n_g=n_g, halves=halves, expand=tuple(expand), tri=tri,
        )
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(B // tb, len(part_tiles), n_g),
            in_specs=[
                pl.BlockSpec((n_t_ch, tb, TSW),
                             lambda ib, jk, is_, tj, tk: (ib * 0, ib, is_)),
                pl.BlockSpec((Jt * 3, tb, TSW),
                             lambda ib, jk, is_, tj, tk: (tj[jk], ib, is_)),
                pl.BlockSpec((Kt * 3, tb, TSW),
                             lambda ib, jk, is_, tj, tk: (tk[jk], ib, is_)),
            ],
            out_specs=pl.BlockSpec(
                (tb, Wp), lambda ib, jk, is_, tj, tk: (ib, jk)
            ),
            scratch_shapes=[pltpu.VMEM((n_ch, tb, TS), jnp.float32)],
        )
        out = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct(
                (B, len(part_tiles) * Wp), jnp.float32),
            interpret=interpret,
        )(tile_j, tile_k, t, gps_p, gps_p)
        return out, Wp

    # per-group execution (plan_groups): diagonal tiles of a symmetric
    # plane run a statically triangular body (the dynamic tile index
    # cannot skip dj > dk; ~47% of each diagonal tile's dot work
    # otherwise recomputes the mirror); with the sym-split, the whole
    # alpha=0.5 plane enumerates upper tiles only
    outs, group_maps, off = [], [], 0
    for g_ac, g_tiles, g_tri in groups:
        tiles_diag = [tt for tt in g_tiles if g_tri and tt[0] == tt[1]]
        tiles_full = [tt for tt in g_tiles if tt not in tiles_diag]
        parts_g = []
        if tiles_full:
            o, Wp = run_part(tiles_full, False, g_ac)
            outs.append(o)
            parts_g.append((tiles_full, Jt, Kt, Wp, False, off))
            off += o.shape[1]
        if tiles_diag:
            o, Wp = run_part(tiles_diag, True, g_ac)
            outs.append(o)
            parts_g.append((tiles_diag, Jt, Kt, Wp, True, off))
            off += o.shape[1]
        group_maps.append((g_ac, parts_g, g_tri))
    out_t = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=1)

    # extras: separable alpha=0 factors + llks00 (self-fitted tb/halves)
    ex = _call_extras_only(t, gps_t, gp0_t, V, A, interpret, a0_sep,
                           expand)

    # XLA reassembly: gather the tiled channels into (B, V, V, nA) via a
    # host-precomputed position map (mirror fills the lower triangle when
    # only upper tiles ran), then prepend the separable alpha=0 plane.
    # Per-group maps merge column-wise in ac_list order.
    posa = {}
    for g_ac, parts_g, g_tri in group_maps:
        pos_g = tile_pos_map(V, len(g_ac), parts_g, g_tri)
        for i, a in enumerate(g_ac):
            posa[a] = pos_g[:, :, i]
    pos = np.stack([posa[a] for a in ac_list], axis=2)
    ab_part = jnp.take(out_t, jnp.asarray(pos.reshape(-1)), axis=1)
    ab_part = ab_part.reshape(B, V, V, nA)
    if a0_sep:
        sd = ex[:, :V]
        sg = ex[:, V : 2 * V]
        a0_plane = sd[:, :, None] + sg[:, None, :]
        llk_ab = jnp.concatenate([a0_plane[..., None], ab_part], axis=3)
        z_a0 = (ex[:, 2 * V] + ex[:, 2 * V + 1])[:, None]
        llk_00 = jnp.concatenate(
            [z_a0, ex[:, 2 * V + 2 : 2 * V + 2 + A - 1]], axis=1
        )
    else:
        llk_ab = ab_part
        llk_00 = ex[:, :A]
    return llk_ab, llk_00


def _unpack_bits_dev(by, width, n):
    """(B, n*width/8) u8 -> (B, n) i32; width in {4, 6, 8}. Device twin
    of host.wire.unpack_bits (probe_wire_v2.py: 0.14-0.25 ms/2048x2048
    on v5e — vector shifts, no gathers)."""
    B = by.shape[0]
    if width == 8:
        return by.astype(jnp.int32)[:, :n]
    if width == 4:
        b = by.astype(jnp.int32)
        return jnp.stack([b & 15, b >> 4], axis=-1).reshape(B, -1)[:, :n]
    b = by.astype(jnp.int32).reshape(B, -1, 3)
    q0 = b[..., 0] & 63
    q1 = ((b[..., 0] >> 6) | (b[..., 1] << 2)) & 63
    q2 = ((b[..., 1] >> 4) | (b[..., 2] << 4)) & 63
    q3 = b[..., 2] >> 2
    return jnp.stack([q0, q1, q2, q3], axis=-1).reshape(B, -1)[:, :n]


def _unpack_wire_v2(wbuf, meta, parts=False):
    """Decode the v2 packed wire (host.wire.pack_wire_block) on device:
    dict-index codes at 4/6/8 bits with the dense planes capped at U0
    and deeper lanes in the sparse (u16 pos, u8 code) tail;
    generalized-escape deltas.

    parts=False: returns (codes (B,S,U) i32 in WIRE-code space
    [0, n_real+1], idx, msk) — deep lanes reconstructed by a .at[].set
    scatter (the exact front consumes explicit lane pairs).
    parts=True: returns (dense (B,S,U0) i32, (tpos, tcode) or None,
    idx, msk) WITHOUT materializing the deep lanes — the fast front
    scatter-ADDS the tail into its count tensor instead (counts are all
    the math needs there), keeping its one-hot cost at U0 lanes even on
    PCR-hot blocks where U is 16+. msk derives from the dense lanes
    alone: the packer's marker rule guarantees a tail-only-visible slot
    carries the marker in lane 0.

    Callers map codes into LUT rows with jnp.minimum(codes, n_real) —
    the marker (n_real) and none (n_real+1) both land on the zero/none
    row."""
    _, S, U, U0, K2p, Kp, cw, dw, n_real, tw = meta
    B = wbuf.shape[0]
    none = jnp.int32(n_real + 1)
    off = 0
    ncb = S * U0 * cw // 8 // 4
    by = jax.lax.bitcast_convert_type(
        wbuf[:, :ncb], jnp.uint8).reshape(B, -1)
    dense = _unpack_bits_dev(by, cw, S * U0).reshape(B, S, U0)
    off = ncb
    tail_parts = None
    if K2p:
        if tw == 16:
            ntp = K2p * 2 // 4
            tpos = jax.lax.bitcast_convert_type(
                wbuf[:, off : off + ntp], jnp.uint16
            ).reshape(B, K2p).astype(jnp.int32)
        elif tw == 24:
            # (slot u16, lane u8) planes — rebuilt into the flat pos the
            # scatters consume; pad entries (slot == S) land on the same
            # S*(U-U0) OOB sentinel as tw == 32
            ns = K2p * 2 // 4
            nl = K2p // 4
            tslot = jax.lax.bitcast_convert_type(
                wbuf[:, off : off + ns], jnp.uint16
            ).reshape(B, K2p).astype(jnp.int32)
            tlane = jax.lax.bitcast_convert_type(
                wbuf[:, off + ns : off + ns + nl], jnp.uint8
            ).reshape(B, K2p).astype(jnp.int32)
            tpos = tslot * jnp.int32(U - U0) + tlane
            ntp = ns + nl
        else:  # i32 positions: lane index outgrew u8 (deep-U pathology)
            ntp = K2p
            tpos = wbuf[:, off : off + ntp]
        off += ntp
        ntc = K2p * cw // 8 // 4
        tcode = _unpack_bits_dev(
            jax.lax.bitcast_convert_type(
                wbuf[:, off : off + ntc], jnp.uint8).reshape(B, -1),
            cw, K2p)
        off += ntc
        tail_parts = (tpos, tcode)
    if dw == 16:
        ndb = S // 2
        d = jax.lax.bitcast_convert_type(
            wbuf[:, off : off + ndb], jnp.uint16
        ).reshape(B, S).astype(jnp.int32)
    else:
        ndb = S * dw // 8 // 4
        d = _unpack_bits_dev(
            jax.lax.bitcast_convert_type(
                wbuf[:, off : off + ndb], jnp.uint8).reshape(B, -1),
            dw, S)
    off += ndb
    base = wbuf[:, off]
    fix_pos = jax.lax.bitcast_convert_type(
        wbuf[:, off + 1 : off + 1 + Kp // 2], jnp.uint16
    ).reshape(B, Kp).astype(jnp.int32)
    fix_val = wbuf[:, off + 1 + Kp // 2 : off + 1 + Kp // 2 + Kp]
    d = d.at[jnp.arange(B)[:, None], fix_pos].add(fix_val)
    idx = base[:, None] + jnp.cumsum(d, axis=1)
    msk = jnp.any(dense != none, axis=-1)
    if parts:
        return dense, tail_parts, idx, msk
    if tail_parts is not None:
        tpos, tcode = tail_parts
        tail = jnp.full((B, S * (U - U0)), none, jnp.int32)
        # pad entries carry pos 0xFFFF > S*(U-U0)-1 (packer invariant)
        # and drop here
        tail = tail.at[jnp.arange(B)[:, None], tpos].set(tcode,
                                                         mode="drop")
        codes = jnp.concatenate(
            [dense, tail.reshape(B, S, U - U0)], axis=2)
    else:
        codes = dense
    return codes, idx, msk


def unpack_block_inputs(codes, idx, msk, wire):
    """Device-side unpack of the shipped block forms, shared by the fast
    and exact block steps (see demux_block_fast_impl's docstring for the
    wire / delta-idx / packed-idx encodings and the 254-marker msk
    contract). Returns (codes (B,S,U) u8 — or i32 wire-code space for
    the v2 packed wire — idx (B,S) i32, msk (B,S) bool).
    """
    if wire is not None and wire[0] == "w2":
        return _unpack_wire_v2(codes, wire)
    if wire is not None:
        S, U, K = wire
        B = codes.shape[0]
        nc, nd = S * U // 4, S // 4
        bytes_c = jax.lax.bitcast_convert_type(codes[:, :nc], jnp.uint8)
        d8 = jax.lax.bitcast_convert_type(
            codes[:, nc : nc + nd], jnp.uint8
        ).reshape(B, S)
        base = codes[:, nc + nd]
        fix_pos = codes[:, nc + nd + 1 : nc + nd + 1 + K]
        fix_val = codes[:, nc + nd + 1 + K : nc + nd + 1 + 2 * K]
        codes = bytes_c.reshape(B, S, U)
        idx = (d8, base, fix_pos, fix_val)
    B, S, U = codes.shape
    if msk is None:
        msk = jnp.any(codes != jnp.uint8(255), axis=-1)
    if isinstance(idx, (tuple, list)):
        d, base, fix_pos, fix_val = idx
        d32 = d.astype(jnp.int32)
        # dummy fixes carry (pos=0, val=0): slot 0's delta is always 0
        # (idx[:,0] == base), so the scatter-add no-ops there
        d32 = d32.at[jnp.arange(B)[:, None], fix_pos].add(fix_val)
        idx = base[:, None].astype(jnp.int32) + jnp.cumsum(d32, axis=1)
    elif idx.shape[1] == S // 2 and S > 1:
        u = jax.lax.bitcast_convert_type(idx.astype(jnp.int32), jnp.uint32)
        pair = jnp.stack([u & 0xFFFF, u >> 16], axis=-1)
        idx = pair.reshape(B, S).astype(jnp.int32)
    else:
        idx = idx.astype(jnp.int32)
    return codes, idx, msk


def demux_block_fast_impl(
    codes, idx, msk, gps_table, gp0_table, w_ext, logf_ext,
    n_alpha, n_samples, interpret=False, a0_sep=False, sym_a=None,
    expand=None, wire=None,
):
    """Fused fast-mode block step: codes -> (llk, llk0, llk_ab, llk_00).

    codes (B,S,U) uint8 per-UMI observation codes (255 = none);
    idx: slot SNP ids — (B,S) int-typed; or (B,S//2) int32 with two
    16-bit ids packed per lane (low half = even slot); or the u8-delta
    tuple (d (B,S) u8, base (B,) i32, fix_pos (B,K) i32, fix_val (B,K)
    i32) — ids are per-cell sorted, so idx = base + cumsum(d) with the
    rare deltas > 255 restored by the sparse fixes (engine
    _shrink_codes_blk; ~1B/slot instead of 2 over thin links). All
    shipped forms are unpacked here; msk (B,S) bool, or None to derive it on
    device as any(codes != 255, -1) — exact under the shrunk-block
    contract (_shrink_codes_blk): masked-out slots carry all-255, and a
    valid slot with zero real codes (all its observations were allele==2;
    it still owes the uniform-GL term, cmd_cram_demuxlet.cpp:435) carries
    the reserved marker 254, which maps to the neutral LUT row like 255.
    Saves the B*S bool transfer;
    gps_table (NS,V,3) f32; gp0_table (NS,3) f32;
    w_ext (NB+1, A*9) f32 pair LUT with a zero "none" row appended — or,
    with the static `expand` map set (dedup_channels), the column-deduped
    (NB+1, C) LUT;
    logf_ext (NB+1, 3) f32 singlet LUT with a zero row appended.

    wire: static (S, U, K) when `codes` is instead the single fused
    (B, S*U/4 + S/4 + 1 + 2K) int32 WIRE buffer carrying
    [codes-bytes | delta-bytes | base | fix_pos | fix_val] per row
    (engine _to_wire) — the tunneled transport charges a fixed ~30 ms
    per H2D buffer, so one buffer per block beats five; idx/msk must be
    None. Little-endian byte packing both sides (bitcast round-trip
    pinned by tests).

    Everything (gather, LUT sums, normalization, Pallas pair kernel, singlet
    contraction) runs on device in one jit — the host ships only the compact
    codes. Transfer: B*S*U bytes vs B*S*NB*4 for dense counts.
    """
    V, A = n_samples, n_alpha
    none_row = w_ext.shape[0] - 1
    C = w_ext.shape[1]
    R = w_ext.shape[0]
    ar = jnp.arange(R, dtype=jnp.int32)

    # Front: one-hot observation counts (R, B, S) -> ONE MXU einsum against
    # the fused [pair|singlet] LUT, emitting lograw CHANNEL-LEADING with no
    # gather or relayout anywhere. The previous per-UMI jnp.take pair
    # (+add) defeated XLA's gather/transpose fusion and cost ~9.6 ms/block
    # vs 0.6 ms for this route (one-hot build + matmul fuse cleanly; the
    # none row is all-zero so padding is exactly neutral: lograw == 0 ->
    # t == 1, gl uniform).
    if wire is not None and wire[0] == "w2":
        # v2 packed wire, PARTS decode: the one-hot runs over the U0
        # dense lanes only; deep-lane tail entries scatter-ADD straight
        # into the count tensor (f32 adds of small integers are exact,
        # so cnt_t is bit-identical to the dense reconstruction) — on
        # PCR-hot blocks (U 16+) this keeps the front cost flat.
        dense, tail, idx, msk = _unpack_wire_v2(codes, wire, parts=True)
        B, S, _U0 = dense.shape
        c = jnp.minimum(dense, jnp.int32(none_row))
        cnt_t = jnp.sum(
            (c[None] == ar[:, None, None, None]).astype(jnp.float32),
            axis=-1,
        )  # (R, B, S)
        if tail is not None:
            tpos, tcode = tail
            tslot = tpos // jnp.int32(wire[2] - wire[3])  # pos -> slot
            # pad entries drop twice over: tcode == none (row R, OOB on
            # axis 0) and tslot >= S (packer u16 invariant)
            cnt_t = cnt_t.at[
                tcode, jnp.arange(B)[:, None], tslot
            ].add(jnp.float32(1.0), mode="drop")
    else:
        codes, idx, msk = unpack_block_inputs(codes, idx, msk, wire)
        B, S, U = codes.shape
        # LUT-row mapping, shared by the u8 (v1) and dict-i32 (v2) code
        # spaces: real codes sit below none_row in both, and the
        # marker/none values (254/255 v1; n_real/n_real+1 v2) clamp onto
        # the zero none row. Equivalent to the old where(codes >= 254)
        # for v1 since real codes < 2*(cap_bq+1) == none_row.
        c = jnp.minimum(codes.astype(jnp.int32), jnp.int32(none_row))
        cnt_t = jnp.sum(
            (c[None] == ar[:, None, None, None]).astype(jnp.float32),
            axis=-1,
        )  # (R, B, S)
    wl = jnp.concatenate([w_ext, logf_ext], axis=1)  # (R, C+3)
    # HIGHEST: the TPU f32-matmul default rounds inputs to bf16 (~1.6e-3
    # relative error on lograw); with one-hot counts HIGHEST reproduces
    # the take()-based per-UMI sums bit-exactly (measured on v5e)
    lograw = jnp.einsum(
        "nbs,nx->xbs", cnt_t, wl, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    t_x = _norm_t(lograw[:C], 0)  # (C, B, S)

    # pass-1 GL table (cmd_cram_demuxlet.cpp:428-452), channel-leading
    ls = lograw[C:]
    gl = jnp.exp(ls - jnp.max(ls, axis=0, keepdims=True))
    gl = gl / jnp.sum(gl, axis=0, keepdims=True)
    gl = gl + jnp.float32(1e-6)
    gl = gl / jnp.sum(gl, axis=0, keepdims=True)
    neutral3 = np.zeros((3, 1, 1), dtype=np.float32)
    neutral3[0] = 1.0
    gl = jnp.where(msk[None], gl, neutral3)  # masked slots -> exact log 0

    # per-slot genotype posteriors + gp0, ONE fused 2D take (the transpose
    # fuses into the gather; a 3D (NS, V, 3) table lowers ~5.6x slower —
    # benchmarks/probe_gather_variants.py). Masked slots gather a NEUTRAL
    # ROW appended at index NS: redirecting the (B, S) i32 index costs
    # ~8 MB/2048-block vs the ~450 MB read+write of masking the gathered
    # (V*3+3) planes — the gather stage was the largest piece of the
    # step's non-kernel time (benchmarks/probe_fast_front.py: 5.1 ms of
    # 12.9 at V=8).
    NS = gps_table.shape[0]
    neutral_g = np.zeros((1, V * 3 + 3), dtype=np.float32)
    neutral_g[0, 0 : V * 3 : 3] = 1.0
    neutral_g[0, V * 3] = 1.0
    gps_all = jnp.concatenate(
        [jnp.concatenate([gps_table.reshape(NS, V * 3), gp0_table],
                         axis=1),
         jnp.asarray(neutral_g)], axis=0
    )
    idx_n = jnp.where(msk, idx, jnp.int32(NS))
    g_all = jnp.transpose(jnp.take(gps_all, idx_n, axis=0), (2, 0, 1))
    gps_t = g_all[: V * 3]
    gp0_t = g_all[V * 3 :]

    llk_ab, llk_00 = _call_pair_kernel(t_x, gps_t, V, A, interpret,
                                       a0_sep=a0_sep, sym_a=sym_a,
                                       expand=expand, gp0_t=gp0_t)

    # singlet pass (pass 1, :415-461), channel-leading: masked slots hit
    # exact-neutral rows (gl = gps = gp0 = (1,0,0) -> log 1 == 0), so no
    # mask multiply is needed
    contrib = jnp.stack(
        [
            jnp.log(
                gps_t[j * 3] * gl[0]
                + gps_t[j * 3 + 1] * gl[1]
                + gps_t[j * 3 + 2] * gl[2]
            )
            for j in range(V)
        ]
    )  # (V, B, S)
    llk = jnp.sum(contrib, axis=-1).T
    contrib0 = jnp.log(
        jnp.maximum(
            gp0_t[0] * gl[0] + gp0_t[1] * gl[1] + gp0_t[2] * gl[2], 1e-30
        )
    )
    llk0 = jnp.sum(contrib0, axis=-1)
    return llk, llk0, llk_ab, llk_00


demux_block_fast = jax.jit(
    demux_block_fast_impl,
    static_argnames=("n_alpha", "n_samples", "interpret", "a0_sep", "sym_a",
                     "expand", "wire"),
)


def extend_luts(w, logf):
    """Append the zero 'none' row used by code 255."""
    w_ext = np.zeros((w.shape[0] + 1, w.shape[1]), dtype=np.float32)
    w_ext[:-1] = w
    logf_ext = np.zeros((logf.shape[0] + 1, 3), dtype=np.float32)
    logf_ext[:-1] = logf
    return w_ext, logf_ext


def pack_block(cnt, msk, gps_g, w, cap_bq=40):
    """Host-side packing: SlotBlock tensors -> kernel layouts.

    cnt (B,S,NB) int, msk (B,S) bool, gps_g (B,S,V,3) f64, w (NB, A*9) f64.
    Pads B to 32, S to 128; padded/masked slots get zero counts and neutral
    (1,0,0) gps rows. Returns (cnt_t (NB,B,S), gps_t (V*3,B,S), wt (NB,A*9)).
    """
    B, S, NB = cnt.shape
    V = gps_g.shape[2]
    Bp = -(-B // TB) * TB
    Sp = -(-S // TS) * TS
    m = np.asarray(msk, dtype=bool)
    cnt_t = np.zeros((NB, Bp, Sp), dtype=np.float32)
    cnt_t[:, :B, :S] = np.transpose(
        np.asarray(cnt, dtype=np.float32) * m[:, :, None], (2, 0, 1)
    )
    neutral = np.zeros((V, 3), dtype=np.float32)
    neutral[:, 0] = 1.0
    gps_p = np.broadcast_to(neutral[None, None], (Bp, Sp, V, 3)).copy()
    gps_p[:B, :S] = np.where(
        m[..., None, None], np.asarray(gps_g, dtype=np.float32), neutral
    )
    gps_t = np.ascontiguousarray(
        np.transpose(gps_p, (2, 3, 0, 1)).reshape(V * 3, Bp, Sp)
    )
    wt = np.ascontiguousarray(np.asarray(w, dtype=np.float32))
    return cnt_t, gps_t, wt
