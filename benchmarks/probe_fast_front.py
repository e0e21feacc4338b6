#!/usr/bin/env python
"""Localize the fast step's ~9.7 ms of non-kernel time (full step 12.93
ms vs bare kernel 3.2 ms, probe_step_parts.py): time the XLA front
(one-hot counts -> einsum lograw -> _norm_t + GL) and the gps gather
stage in isolation on device-resident inputs. Decides whether a
standalone one-hot Pallas front (the exact path's trick) is worth
porting to fast mode — the PCIe-host e2e bound is the FULL step.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from demuxlet_tpu.utils.jaxcfg import enable_compilation_cache

    enable_compilation_cache()
    jax.config.update("jax_enable_x64", True)

    from demuxlet_tpu.models.engine import DemuxEngine
    from demuxlet_tpu.models import decision as D
    from demuxlet_tpu.ops import pallas_pair as PP

    B, S, U, NV, NA, NSNP = 2048, 1024, 2, 8, 5, 50000
    rng = np.random.default_rng(0)
    nq = 41
    codes = np.zeros((B, S, U), dtype=np.uint8)
    for u in range(U):
        al = rng.integers(0, 2, size=(B, S))
        bq = rng.integers(13, 41, size=(B, S))
        codes[:, :, u] = (al * nq + bq).astype(np.uint8)
    idx = np.sort(rng.integers(0, NSNP, size=(B, S)), axis=1).astype(np.int32)
    gps = rng.dirichlet(np.ones(3), size=(NSNP, NV))
    grid = np.linspace(0.0, 0.5, NA).tolist()
    eng = DemuxEngine(gps, grid, cell_block=B, mode="fast")
    w_ext, logf_ext, expand = eng._fast_tables()
    codes_d = jax.device_put(jnp.asarray(codes))
    idx_d = jax.device_put(jnp.asarray(idx))
    msk_d = jax.device_put(jnp.asarray(np.ones((B, S), bool)))

    C = w_ext.shape[1]

    @jax.jit
    def f_front(codes, msk, w_ext, logf_ext):
        c = jnp.where(codes >= 254, jnp.uint8(w_ext.shape[0] - 1),
                      codes).astype(jnp.int32)
        R = w_ext.shape[0]
        ar = jnp.arange(R, dtype=jnp.int32)
        cnt_t = jnp.sum(
            (c[None] == ar[:, None, None, None]).astype(jnp.float32),
            axis=-1)
        wl = jnp.concatenate([w_ext, logf_ext], axis=1)
        lograw = jnp.einsum("nbs,nx->xbs", cnt_t, wl,
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST)
        t_x = PP._norm_t(lograw[:C], 0)
        ls = lograw[C:]
        gl = jnp.exp(ls - jnp.max(ls, axis=0, keepdims=True))
        gl = gl / jnp.sum(gl, axis=0, keepdims=True)
        gl = gl + jnp.float32(1e-6)
        gl = gl / jnp.sum(gl, axis=0, keepdims=True)
        return jnp.sum(t_x) + jnp.sum(gl)

    @jax.jit
    def f_gather(idx, msk):
        NS = eng._gps_dev.shape[0]
        V = NV
        gps_all = jnp.concatenate(
            [eng._gps_dev.astype(jnp.float32).reshape(NS, V * 3),
             eng._gp0_dev.astype(jnp.float32)], axis=1)
        g_all = jnp.transpose(jnp.take(gps_all, idx, axis=0), (2, 0, 1))
        neutral_g = np.zeros((V * 3 + 3, 1, 1), dtype=np.float32)
        neutral_g[0 : V * 3 : 3] = 1.0
        neutral_g[V * 3] = 1.0
        g_all = jnp.where(msk[None], g_all, neutral_g)
        return jnp.sum(g_all)

    def timeit(fn, *args):
        out = fn(*args)
        float(out)
        ests = []
        for _ in range(3):
            def run(n):
                t0 = time.time()
                for _ in range(n):
                    o = fn(*args)
                float(o)
                return time.time() - t0
            t1, t2 = run(4), run(8)
            dt = (t2 - t1) / 4
            ests.append(dt if dt > 0 else t2 / 8)
        ests.sort()
        return round(ests[1] * 1e3, 2)

    out = {
        "front_ms": timeit(f_front, codes_d, msk_d, w_ext, logf_ext),
        "gather_ms": timeit(f_gather, idx_d, msk_d),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
