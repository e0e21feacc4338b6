"""Dense JAX likelihood kernels over the slot representation.

These replace the reference's two scalar passes (cmd_cram_demuxlet.cpp
:415-461 singlet, :576-709 pair search) with batched contractions:

  log-raw likelihoods  = counts @ LUT           (MXU matmul)
  posterior mixing     = einsum over the tiny (l, m) genotype axes
  per-cell LLKs        = masked log-reduction over the slot (SNP) axis

Everything is shape-static and jit/pjit friendly; the barcode axis is the
data-parallel axis for multi-chip sharding (parallel/mesh.py).

Normalization semantics preserved exactly (they telescope — SURVEY.md §2.1):
GL: normalize, +1e-6, renormalize (:446-452); pGs: max-normalize, +1e-6,
max-renormalize (:626-663).
"""

from __future__ import annotations



import jax
import jax.numpy as jnp


def singlet_llks_impl(cnt, msk, gps_g, gp0_g, logf, dtype=jnp.float64):
    """Pass 1: per-(cell, sample) singlet log-likelihoods (traceable impl).

    cnt:   (B, S, NB) int/float counts
    msk:   (B, S) bool
    gps_g: (B, S, V, 3) genotype posteriors gathered per slot
    gp0_g: (B, S, 3) background (mean) genotype posteriors per slot
    logf:  (NB, 3) singlet LUT
    Returns (llk[B, V], llk0[B]).
    """
    cnt = cnt.astype(dtype)
    logf = logf.astype(dtype)
    gps_g = gps_g.astype(dtype)
    gp0_g = gp0_g.astype(dtype)
    lograw = jnp.einsum("bsn,ng->bsg", cnt, logf)  # (B,S,3)
    mx = jnp.max(lograw, axis=-1, keepdims=True)
    gl = jnp.exp(lograw - mx)
    gl = gl / jnp.sum(gl, axis=-1, keepdims=True)
    gl = gl + 1e-6
    gl = gl / jnp.sum(gl, axis=-1, keepdims=True)
    m = msk.astype(dtype)
    contrib = jnp.log(jnp.einsum("bsg,bsvg->bsv", gl, gps_g))
    llk = jnp.sum(contrib * m[..., None], axis=1)
    contrib0 = jnp.log(jnp.einsum("bsg,bsg->bs", gl, gp0_g))
    llk0 = jnp.sum(contrib0 * m, axis=1)
    return llk, llk0


singlet_llks = jax.jit(singlet_llks_impl, static_argnames=("dtype",))


def _pair_block(cnt, msk, gps_g, gp0_g, w, n_alpha, dtype):
    """Pair-search LLK contribution of one slot chunk.

    Returns (llkAB[B,V,V,A], llk00[B,A]) contributions (to be summed over
    chunks)."""
    B, S = cnt.shape[0], cnt.shape[1]
    V = gps_g.shape[2]
    A = n_alpha
    lograw = jnp.einsum("bsn,nx->bsx", cnt, w)  # (B,S,A*9)
    mx = jnp.max(lograw, axis=-1, keepdims=True)
    t = jnp.exp(lograw - mx)
    t = t + 1e-6
    t = t / jnp.max(t, axis=-1, keepdims=True)
    t = t.reshape(B, S, A, 3, 3)
    m = msk.astype(dtype)

    # The (l,m,j,k,a) contraction unrolls over the tiny sample/genotype axes
    # into pure VPU broadcast arithmetic: batched (A*3,3)@(3,V) matmuls
    # waste >99% of the MXU and the einsum form materializes (B,S,V,V,A)
    # broadcasts; this form is ~2.8x faster on-chip in emulated f64.
    # Term products and summation ORDER mirror the reference scalar loop
    # (cmd_cram_demuxlet.cpp:671-684: (l,m) l-major, product
    # (g_j[l]*g_k[m])*pGs) so that exact symmetric-pair ulp ties at
    # alpha=0.5 resolve the same way the reference's do.
    cols = []
    for j in range(V):
        for k in range(V):
            inner = None
            for l in range(3):
                for mm in range(3):
                    p = gps_g[:, :, j, l] * gps_g[:, :, k, mm]  # (B,S)
                    term = p[:, :, None] * t[:, :, :, l, mm]  # (B,S,A)
                    inner = term if inner is None else inner + term
            cols.append(jnp.sum(jnp.log(inner) * m[:, :, None], axis=1))
    llk_ab = jnp.stack(cols, axis=1).reshape(B, V, V, A)

    # Background pair term llks00 (:700-709), same sequential (l,m) order.
    t00 = None
    for l in range(3):
        for mm in range(3):
            p = gp0_g[:, :, l] * gp0_g[:, :, mm]
            term = p[:, :, None] * t[:, :, :, l, mm]
            t00 = term if t00 is None else t00 + term
    llk_00 = jnp.sum(jnp.log(t00) * m[:, :, None], axis=1)
    return llk_ab, llk_00


def pair_llks_impl(cnt, msk, gps_g, gp0_g, w, n_alpha, slot_chunk=0, dtype=jnp.float64):
    """Pass 2: doublet pair-search LLKs.

    cnt: (B, S, NB); msk: (B, S); gps_g: (B, S, V, 3); gp0_g: (B, S, 3);
    w: (NB, A*9) pair LUT.
    Returns (llkAB[B, V, V, A], llk00[B, A]).

    The (nv x nv x A) intermediate per slot is the memory hog; slot_chunk > 0
    processes the slot axis in chunks via lax.scan to bound it.
    """
    cnt = cnt.astype(dtype)
    w = w.astype(dtype)
    gps_g = gps_g.astype(dtype)
    gp0_g = gp0_g.astype(dtype)
    B, S = cnt.shape[0], cnt.shape[1]
    if slot_chunk <= 0 or S <= slot_chunk:
        return _pair_block(cnt, msk, gps_g, gp0_g, w, n_alpha, dtype)

    pad = (-S) % slot_chunk
    if pad:
        cnt = jnp.pad(cnt, ((0, 0), (0, pad), (0, 0)))
        msk = jnp.pad(msk, ((0, 0), (0, pad)))
        gps_g = jnp.pad(gps_g, ((0, 0), (0, pad), (0, 0), (0, 0)))
        gp0_g = jnp.pad(gp0_g, ((0, 0), (0, pad), (0, 0)))
    nc = (S + pad) // slot_chunk
    V = gps_g.shape[2]

    def chunk(i):
        sl = lambda x: jax.lax.dynamic_slice_in_dim(x, i * slot_chunk, slot_chunk, 1)
        return _pair_block(
            sl(cnt), sl(msk), sl(gps_g), sl(gp0_g), w, n_alpha, dtype
        )

    def body(carry, i):
        ab, z = carry
        dab, dz = chunk(i)
        return (ab + dab, z + dz), None

    init = (
        jnp.zeros((B, V, V, n_alpha), dtype),
        jnp.zeros((B, n_alpha), dtype),
    )
    (llk_ab, llk_00), _ = jax.lax.scan(body, init, jnp.arange(nc))
    return llk_ab, llk_00


pair_llks = jax.jit(
    pair_llks_impl, static_argnames=("n_alpha", "slot_chunk", "dtype")
)
