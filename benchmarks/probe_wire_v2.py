"""Probe: wire-format v2 decode primitives + compacted gps gather (round 5).

The round-4 verdict's top item is the H2D wire diet (3,151 B/barcode is
the binding e2e constraint on the tunneled link) and the gps-gather bound
(5.1 of 12.9 ms/2048-cell fast step). Before committing to a format,
measure the device-side decode candidates on the real chip:

  codes-plane decodes ((B, S, U) u8 out of packed forms):
    c0_bitcast   current form: i32 wire lanes -> bytes (baseline)
    c1_nibble    4-bit dict codes, 2/byte (B, S*U/2 bytes)
    c2_6bit      6-bit dict codes, 4/3 bytes
    c3_stream    variable-U stream: per-slot occ counts (u8 here) +
                 flat code stream; codes[b,s,u] = stream[b, start+u]
                 via ONE take_along_axis gather (B,S,U from B,Lp)
    c4_tailscat  plane0 dense + sparse tail scatter .at[].set
                 ((B,K2) u16 pos into (B, S*(U-1)))

  delta decodes ((B, S) i32 slot ids):
    d0_u8        current: u8 deltas + fix scatter-add + cumsum
    d1_nibble    4-bit deltas (2/byte) + same fix machinery

  gps gather (the 5.1 ms item — unique-SNP compaction candidate):
    g_full       (B,S) row gather from the (NS=50K, 28) f32 table
    g_c4k/g_c16k same gather from a compacted (Su, 28) table
                 (content identical; only the table height changes)

Usage: python benchmarks/probe_wire_v2.py   (serialize TPU use!)
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax

    from demuxlet_tpu.utils.jaxcfg import enable_compilation_cache

    enable_compilation_cache()
    import jax.numpy as jnp

    B, S, U = 2048, 1024, 2
    NS = 50_000
    rng = np.random.default_rng(0)

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

    # ---- codes decodes ----
    codes_h = rng.integers(0, 56, size=(B, S, U)).astype(np.uint8)

    wire8 = jax.device_put(jnp.asarray(
        np.ascontiguousarray(codes_h.reshape(B, -1)).view(np.int32)))

    @jax.jit
    def c0_bitcast(w):
        by = jax.lax.bitcast_convert_type(w, jnp.uint8).reshape(B, S, U)
        return jnp.sum(by.astype(jnp.int32))

    print("c0_bitcast  %7.3f ms" % timeit(c0_bitcast, wire8))

    # 4-bit: two codes per byte
    nib_h = (codes_h.reshape(B, -1, 2) % 16)
    packed4 = (nib_h[:, :, 0] | (nib_h[:, :, 1] << 4)).astype(np.uint8)
    w4 = jax.device_put(jnp.asarray(packed4.view(np.int32)))

    @jax.jit
    def c1_nibble(w):
        by = jax.lax.bitcast_convert_type(w, jnp.uint8).reshape(B, -1)
        lo = by & jnp.uint8(15)
        hi = by >> jnp.uint8(4)
        c = jnp.stack([lo, hi], axis=-1).reshape(B, S, U)
        return jnp.sum(c.astype(jnp.int32))

    print("c1_nibble   %7.3f ms" % timeit(c1_nibble, w4))

    # 6-bit: 4 codes per 3 bytes
    c6 = codes_h.reshape(B, -1, 4).astype(np.uint32)
    b0 = (c6[..., 0] | (c6[..., 1] << 6)) & 0xFF
    b1 = ((c6[..., 1] >> 2) | (c6[..., 2] << 4)) & 0xFF
    b2 = ((c6[..., 2] >> 4) | (c6[..., 3] << 2)) & 0xFF
    packed6 = np.stack([b0, b1, b2], axis=-1).reshape(B, -1).astype(np.uint8)
    w6 = jax.device_put(jnp.asarray(packed6.view(np.int32)))

    @jax.jit
    def c2_6bit(w):
        by = jax.lax.bitcast_convert_type(w, jnp.uint8).reshape(B, -1, 3)
        by = by.astype(jnp.int32)
        q0 = by[..., 0] & 63
        q1 = (by[..., 0] >> 6) | ((by[..., 1] & 15) << 2)
        q2 = (by[..., 1] >> 4) | ((by[..., 2] & 3) << 4)
        q3 = by[..., 2] >> 2
        c = jnp.stack([q0, q1, q2, q3], axis=-1).reshape(B, S, U)
        return jnp.sum(c)

    print("c2_6bit     %7.3f ms" % timeit(c2_6bit, w6))

    # stream layout: occ in {1, 2}, mean ~1.25; Lp = 1.5*S
    occ_h = (rng.random((B, S)) < 0.25).astype(np.int32) + 1
    Lp = int(np.ceil(occ_h.sum(axis=1).max() / 128) * 128)
    start_h = np.cumsum(occ_h, axis=1) - occ_h
    stream_h = np.full((B, Lp), 255, np.uint8)
    for b in range(B):  # host-side reference fill (probe only)
        L = occ_h[b].sum()
        stream_h[b, :L] = rng.integers(0, 56, size=L)
    occ_d = jax.device_put(jnp.asarray(occ_h.astype(np.uint8).view(np.int32)
                                       .reshape(B, -1)))
    stream_d = jax.device_put(jnp.asarray(stream_h.view(np.int32)))

    @jax.jit
    def c3_stream(occ_w, stream_w):
        occ = jax.lax.bitcast_convert_type(occ_w, jnp.uint8).reshape(B, S)
        occ = occ.astype(jnp.int32)
        stream = jax.lax.bitcast_convert_type(
            stream_w, jnp.uint8).reshape(B, Lp)
        start = jnp.cumsum(occ, axis=1) - occ
        pos = start[:, :, None] + jnp.arange(U, dtype=jnp.int32)
        valid = jnp.arange(U, dtype=jnp.int32)[None, None] < occ[:, :, None]
        c = jnp.take_along_axis(
            stream, pos.reshape(B, S * U), axis=1, mode="clip"
        ).reshape(B, S, U)
        c = jnp.where(valid, c, jnp.uint8(255))
        return jnp.sum(c.astype(jnp.int32))

    print("c3_stream   %7.3f ms (Lp=%d)" % (timeit(c3_stream, occ_d,
                                                   stream_d), Lp))

    # sparse tail scatter: K2 entries into the (B, S*(U-1)) tail plane
    K2 = 512
    tpos_h = np.sort(
        np.argsort(rng.random((B, S * (U - 1))), axis=1)[:, :K2], axis=1
    ).astype(np.int32)
    tcode_h = rng.integers(0, 56, size=(B, K2)).astype(np.int32)
    tpos_d = jax.device_put(jnp.asarray(tpos_h))
    tcode_d = jax.device_put(jnp.asarray(tcode_h))

    @jax.jit
    def c4_tailscat(tpos, tcode):
        tail = jnp.full((B, S * (U - 1)), 255, jnp.int32)
        tail = tail.at[jnp.arange(B)[:, None], tpos].set(tcode)
        return jnp.sum(tail)

    print("c4_tailscat %7.3f ms (K2=%d)" % (timeit(c4_tailscat, tpos_d,
                                                   tcode_d), K2))

    # stream via ONE flat 1D element gather (B*Lp stream, global indices)
    flat_stream = jax.device_put(jnp.asarray(
        stream_h.reshape(-1).view(np.int32)))

    @jax.jit
    def c5_stream1d(occ_w, flat_w):
        occ = jax.lax.bitcast_convert_type(occ_w, jnp.uint8).reshape(B, S)
        occ = occ.astype(jnp.int32)
        flat = jax.lax.bitcast_convert_type(flat_w, jnp.uint8).reshape(-1)
        start = jnp.cumsum(occ, axis=1) - occ
        pos = (start[:, :, None] + jnp.arange(U, dtype=jnp.int32)
               + (jnp.arange(B, dtype=jnp.int32) * Lp)[:, None, None])
        valid = jnp.arange(U, dtype=jnp.int32)[None, None] < occ[:, :, None]
        c = jnp.take(flat, pos.reshape(-1), mode="clip").reshape(B, S, U)
        c = jnp.where(valid, c, jnp.uint8(255))
        return jnp.sum(c.astype(jnp.int32))

    print("c5_stream1d %7.3f ms" % timeit(c5_stream1d, occ_d, flat_stream))

    # tail scatter at a smaller K2 (the realistic deep-tail count)
    K2b = 128
    tpos2 = jax.device_put(jnp.asarray(tpos_h[:, :K2b]))
    tcode2 = jax.device_put(jnp.asarray(tcode_h[:, :K2b]))

    @jax.jit
    def c4b_tailscat(tpos, tcode):
        tail = jnp.full((B, S * (U - 1)), 255, jnp.int32)
        tail = tail.at[jnp.arange(B)[:, None], tpos].set(tcode)
        return jnp.sum(tail)

    print("c4b_scat128 %7.3f ms (K2=%d)" % (timeit(c4b_tailscat, tpos2,
                                                   tcode2), K2b))

    # ---- delta decodes ----
    d8_h = rng.integers(0, 100, size=(B, S)).astype(np.uint8)
    K = 8
    fixp_h = np.zeros((B, K), np.int32)
    fixv_h = np.zeros((B, K), np.int32)
    d8_d = jax.device_put(jnp.asarray(d8_h.view(np.int32)))
    fixp_d = jax.device_put(jnp.asarray(fixp_h))
    fixv_d = jax.device_put(jnp.asarray(fixv_h))

    @jax.jit
    def d0_u8(dw, fp, fv):
        d = jax.lax.bitcast_convert_type(dw, jnp.uint8).reshape(B, S)
        d32 = d.astype(jnp.int32)
        d32 = d32.at[jnp.arange(B)[:, None], fp].add(fv)
        return jnp.sum(jnp.cumsum(d32, axis=1))

    print("d0_u8       %7.3f ms" % timeit(d0_u8, d8_d, fixp_d, fixv_d))

    dn_h = (d8_h.reshape(B, -1, 2) % 16)
    dp4 = (dn_h[:, :, 0] | (dn_h[:, :, 1] << 4)).astype(np.uint8)
    d4_d = jax.device_put(jnp.asarray(dp4.view(np.int32)))

    @jax.jit
    def d1_nibble(dw, fp, fv):
        by = jax.lax.bitcast_convert_type(dw, jnp.uint8).reshape(B, -1)
        d32 = jnp.stack([by & jnp.uint8(15), by >> jnp.uint8(4)],
                        axis=-1).reshape(B, S).astype(jnp.int32)
        d32 = d32.at[jnp.arange(B)[:, None], fp].add(fv)
        return jnp.sum(jnp.cumsum(d32, axis=1))

    print("d1_nibble   %7.3f ms" % timeit(d1_nibble, d4_d, fixp_d, fixv_d))

    # ---- gps gather: full vs compacted table ----
    idx_full = jax.device_put(jnp.asarray(
        np.sort(rng.integers(0, NS, size=(B, S)), axis=1).astype(np.int32)))

    for name, su in (("g_full", NS), ("g_c16k", 16384), ("g_c4k", 4096)):
        tab = jax.device_put(jnp.asarray(
            rng.random((su + 1, 28), dtype=np.float32)))
        idx_d = jax.device_put(jnp.asarray(
            np.sort(rng.integers(0, su, size=(B, S)), axis=1)
            .astype(np.int32))) if su != NS else idx_full

        def g(idx, tab=tab):
            out = jnp.transpose(jnp.take(tab, idx, axis=0), (2, 0, 1))
            return jnp.sum(out)

        gj = jax.jit(g)
        print("%-11s %7.3f ms (rows=%d)" % (name, timeit(gj, idx_d), su + 1))


if __name__ == "__main__":
    main()
