"""Probe: XLA TPU lowering cost of the exact-path g-gather stage.

probe_exact_stages shows the gps/gp0 idx-gather + mask + transpose stage at
~41ms/block — ~50x off HBM roofline — while the similar-shaped t transpose
adds ~1ms. Variants isolate gather form (3D vs 2D table, split vs fused
hi/lo, axis-0 vs axis-1), mask, and transpose costs.

Usage: python benchmarks/probe_gather_variants.py (serialize TPU use).
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

    B, S, V, NSNP = 1024, 1024, 8, 4096
    rng = np.random.default_rng(0)
    gps = rng.random((NSNP, V, 3), dtype=np.float32)
    idx_h = rng.integers(0, NSNP, size=(B, S)).astype(np.int32)
    msk_h = np.ones((B, S), dtype=bool)

    gps3d_h = jax.device_put(jnp.asarray(gps))
    gps3d_l = jax.device_put(jnp.asarray(gps * 1e-8))
    gps2d_h = jax.device_put(jnp.asarray(gps.reshape(NSNP, V * 3)))
    gps2d_l = jax.device_put(jnp.asarray(gps.reshape(NSNP, V * 3) * 1e-8))
    gps_cat = jax.device_put(jnp.asarray(
        np.concatenate([gps.reshape(NSNP, V * 3),
                        gps.reshape(NSNP, V * 3) * 1e-8], axis=1)))
    gps_catT = jax.device_put(jnp.asarray(
        np.ascontiguousarray(
            np.concatenate([gps.reshape(NSNP, V * 3),
                            gps.reshape(NSNP, V * 3) * 1e-8], axis=1).T)))
    idx = jax.device_put(jnp.asarray(idx_h))
    msk = jax.device_put(jnp.asarray(msk_h))

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
        t1 = run(iters)
        t2 = run(2 * iters)
        dt = (t2 - t1) / iters
        return (dt if dt > 0 else t2 / (2 * iters)) * 1e3

    neutral24 = np.zeros(V * 3, dtype=np.float32)
    neutral24[0::3] = 1.0
    neutral24 = jnp.asarray(neutral24)

    @jax.jit
    def v0_current(idx, msk):
        neutral = jnp.zeros((3,), jnp.float32).at[0].set(1.0)
        zero3 = jnp.zeros((3,), jnp.float32)
        gh = jnp.take(gps3d_h, idx, axis=0)
        gl = jnp.take(gps3d_l, idx, axis=0)
        gh = jnp.where(msk[..., None, None], gh, neutral)
        gl = jnp.where(msk[..., None, None], gl, zero3)
        g_t = lambda x: jnp.transpose(x, (2, 3, 0, 1)).reshape(V * 3, B, S)
        return jnp.sum(g_t(gh)) + jnp.sum(g_t(gl))

    @jax.jit
    def v1_2d_takes(idx, msk):
        gh = jnp.take(gps2d_h, idx, axis=0)  # (B,S,24)
        gl = jnp.take(gps2d_l, idx, axis=0)
        gh = jnp.where(msk[..., None], gh, neutral24)
        gl = jnp.where(msk[..., None], gl, 0.0)
        g_t = lambda x: jnp.transpose(x, (2, 0, 1))
        return jnp.sum(g_t(gh)) + jnp.sum(g_t(gl))

    @jax.jit
    def v2_cat_take(idx, msk):
        g = jnp.take(gps_cat, idx, axis=0)  # (B,S,48)
        neutral48 = jnp.concatenate([neutral24, jnp.zeros(V * 3)])
        g = jnp.where(msk[..., None], g, neutral48)
        gt = jnp.transpose(g, (2, 0, 1))
        return jnp.sum(gt[: V * 3]) + jnp.sum(gt[V * 3 :])

    @jax.jit
    def v3_axis1(idx, msk):
        g = jnp.take(gps_catT, idx, axis=1)  # (48, B, S) directly
        neutral48 = jnp.concatenate([neutral24, jnp.zeros(V * 3)])
        g = jnp.where(msk[None], g, neutral48[:, None, None])
        return jnp.sum(g[: V * 3]) + jnp.sum(g[V * 3 :])

    @jax.jit
    def v4_no_mask_no_t(idx):
        gh = jnp.take(gps2d_h, idx, axis=0)
        gl = jnp.take(gps2d_l, idx, axis=0)
        return jnp.sum(gh) + jnp.sum(gl)

    @jax.jit
    def v5_no_mask_t(idx):
        gh = jnp.take(gps2d_h, idx, axis=0)
        gl = jnp.take(gps2d_l, idx, axis=0)
        g_t = lambda x: jnp.transpose(x, (2, 0, 1))
        return jnp.sum(g_t(gh)) + jnp.sum(g_t(gl))

    @jax.jit
    def v6_3d_take_only(idx):
        gh = jnp.take(gps3d_h, idx, axis=0)
        gl = jnp.take(gps3d_l, idx, axis=0)
        return jnp.sum(gh) + jnp.sum(gl)

    # g-stage fusion candidates: gp0 (3 narrow channels) rides the gps
    # take — narrow (<128B-row) takes cost nearly as much as wide ones
    gp0 = gps.mean(axis=1)  # (NSNP, 3)
    g27_h = jax.device_put(jnp.asarray(
        np.concatenate([gps.reshape(NSNP, V * 3), gp0], axis=1)))
    g27_l = jax.device_put(jnp.asarray(
        np.concatenate([gps.reshape(NSNP, V * 3), gp0], axis=1) * 1e-8))
    g54 = jax.device_put(jnp.concatenate([g27_h, g27_l], axis=1))

    @jax.jit
    def v7_merged27_pair(idx, msk):
        gh = jnp.take(g27_h, idx, axis=0)  # (B,S,27)
        gl = jnp.take(g27_l, idx, axis=0)
        g_t = lambda x: jnp.transpose(x, (2, 0, 1))
        gh, gl = g_t(gh), g_t(gl)
        gh = jnp.where(msk[None], gh, 0.5)
        return jnp.sum(gh) + jnp.sum(gl)

    @jax.jit
    def v8_merged54_single(idx, msk):
        g = jnp.take(g54, idx, axis=0)  # (B,S,54)
        gt = jnp.transpose(g, (2, 0, 1))
        gt = jnp.where(msk[None], gt, 0.5)
        return jnp.sum(gt)

    @jax.jit
    def v9_narrow3(idx):
        g0h = jnp.take(jnp.asarray(g27_h[:, -3:]), idx, axis=0)
        g0l = jnp.take(jnp.asarray(g27_l[:, -3:]), idx, axis=0)
        return jnp.sum(g0h) + jnp.sum(g0l)

    @jax.jit
    def v10_concat_in_jit(idx, msk):
        g54x = jnp.concatenate([g27_h, g27_l], axis=1)
        g = jnp.take(g54x, idx, axis=0)
        gt = jnp.transpose(g, (2, 0, 1))
        gt = jnp.where(msk[None], gt, 0.5)
        return jnp.sum(gt)

    neutral_c = np.zeros((54, 1, 1), dtype=np.float32)
    neutral_c[0:24:3] = 1.0
    neutral_c[24] = 1.0

    @jax.jit
    def v11_impl_form(idx, msk):
        # exactly demux_block_exact_impl's g stage: in-jit concat, one
        # take, transpose, broadcast-neutral where, 4 slices
        g54x = jnp.concatenate([g27_h, g27_l], axis=1)
        gall = jnp.transpose(jnp.take(g54x, idx, axis=0), (2, 0, 1))
        gall = jnp.where(msk[None], gall, neutral_c)
        return (jnp.sum(gall[:24]) + jnp.sum(gall[24:27])
                + jnp.sum(gall[27:51]) + jnp.sum(gall[51:]))

    @jax.jit
    def v12_bcast_where(idx, msk):
        g54x = jnp.concatenate([g27_h, g27_l], axis=1)
        gall = jnp.transpose(jnp.take(g54x, idx, axis=0), (2, 0, 1))
        gall = jnp.where(msk[None], gall, neutral_c)
        return jnp.sum(gall)

    @jax.jit
    def v13_four_slices(idx, msk):
        g54x = jnp.concatenate([g27_h, g27_l], axis=1)
        gall = jnp.transpose(jnp.take(g54x, idx, axis=0), (2, 0, 1))
        gall = jnp.where(msk[None], gall, 0.5)
        return (jnp.sum(gall[:24]) + jnp.sum(gall[24:27])
                + jnp.sum(gall[27:51]) + jnp.sum(gall[51:]))

    res = {
        "v0_current": timeit(v0_current, idx, msk),
        "v1_2d_takes": timeit(v1_2d_takes, idx, msk),
        "v2_cat_take": timeit(v2_cat_take, idx, msk),
        "v3_axis1": timeit(v3_axis1, idx, msk),
        "v4_2d_take_only": timeit(v4_no_mask_no_t, idx),
        "v5_2d_take_transpose": timeit(v5_no_mask_t, idx),
        "v6_3d_take_only": timeit(v6_3d_take_only, idx),
        "v7_merged27_pair": timeit(v7_merged27_pair, idx, msk),
        "v8_merged54_single": timeit(v8_merged54_single, idx, msk),
        "v9_narrow3_takes": timeit(v9_narrow3, idx),
        "v10_concat_in_jit": timeit(v10_concat_in_jit, idx, msk),
        "v11_impl_form": timeit(v11_impl_form, idx, msk),
        "v12_bcast_where": timeit(v12_bcast_where, idx, msk),
        "v13_four_slices": timeit(v13_four_slices, idx, msk),
    }
    print({k: round(v, 3) for k, v in res.items()})


if __name__ == "__main__":
    main()
