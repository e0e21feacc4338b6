"""Child process for the cold df32 parity smoke gate.

Run by tests/test_pallas_exact.py::test_exact_smoke_cold_budget in a
subprocess with a FRESH compile cache: CPU backend at LLVM opt level 0
(compile-time-bound interpret kernels; value parity is unaffected at the
asserted tolerances — same rationale as __graft_entry__.dryrun_multichip).
Checks:
  * tiny V=2/A=2 one-tile df32 kernel (default-grid a0_zero+sym_a engine
    config) vs the XLA f64 kernels at 1e-10;
  * the 256-wide one-hot front (--cap-BQ 63) vs the pair-code gather.
Prints SMOKE_OK on success.
"""

import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_backend_optimization_level" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_backend_optimization_level=0"
    ).strip()
os.environ["JAX_ENABLE_X64"] = "true"

import numpy as np  # noqa: E402
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")  # .axon_site overrides the env var
jax.config.update("jax_enable_x64", True)

from demuxlet_tpu.utils.jaxcfg import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import jax.numpy as jnp  # noqa: E402

from demuxlet_tpu.models.likelihood import pair_llks, singlet_llks  # noqa: E402
from demuxlet_tpu.ops import luts  # noqa: E402
from demuxlet_tpu.ops import pallas_pair_exact as PE  # noqa: E402


def workload(seed, B, S, U, V, A, NS, cap=40):
    rng = np.random.default_rng(seed)
    codes = rng.integers(0, 2 * (cap + 1), size=(B, S, U)).astype(np.uint8)
    codes[rng.random((B, S, U)) < 0.35] = 255
    idx = rng.integers(0, NS, size=(B, S)).astype(np.int32)
    msk = rng.random((B, S)) < 0.9
    codes[~msk] = 255
    gps = rng.dirichlet(np.ones(3), size=(NS, V))
    tiny = rng.random((NS, V)) < 0.1
    gps[tiny] = np.array([1 - 2e-8, 1e-8, 1e-8])
    gp0 = gps.mean(axis=1)
    grid = np.linspace(0.0, 0.5, A).tolist()
    return codes, idx, msk, gps, gp0, luts.pair_lut(grid, cap), \
        luts.singlet_lut(cap), grid


def dense(codes, msk, cap=40):
    B, S, U = codes.shape
    cnt = np.zeros((B, S, 2 * (cap + 1)), dtype=np.int32)
    for u in range(U):
        c = codes[..., u]
        valid = (c != 255) & msk
        bi, si = np.nonzero(valid)
        np.add.at(cnt, (bi, si, c[valid].astype(np.int64)), 1)
    return cnt


def main():
    codes, idx, msk, gps, gp0, w, logf, grid = workload(
        3, B=8, S=128, U=2, V=2, A=2, NS=50)
    assert grid == [0.0, 0.5]
    gps_pair, gp0_pair, tabs, meta = PE.split_tables(gps, gp0, w, logf)
    got = PE.demux_block_exact(
        jnp.asarray(codes), jnp.asarray(idx), jnp.asarray(msk),
        tuple(map(jnp.asarray, gps_pair)), tuple(map(jnp.asarray, gp0_pair)),
        tuple(map(jnp.asarray, tabs)), meta,
        2, 2, interpret=True, a0_zero=True, sym_a=1,
    )
    cnt = dense(codes, msk)
    neutral = np.array([1.0, 0, 0])
    gps_g = np.where(msk[..., None, None], gps[idx], neutral)
    gp0_g = np.where(msk[..., None], gp0[idx], neutral)
    ref_ab, ref_00 = pair_llks(
        jnp.asarray(cnt, jnp.float64), jnp.asarray(msk),
        jnp.asarray(gps_g), jnp.asarray(gp0_g), jnp.asarray(w), 2,
        slot_chunk=0, dtype=jnp.float64)
    ref_llk, ref_llk0 = singlet_llks(
        jnp.asarray(cnt, jnp.float64), jnp.asarray(msk),
        jnp.asarray(gps_g), jnp.asarray(gp0_g), jnp.asarray(logf),
        dtype=jnp.float64)
    for name, g, r in zip(
        ("llk", "llk0", "llk_ab", "llk_00"), got,
        (ref_llk, ref_llk0, ref_ab, ref_00),
    ):
        err = np.abs(PE.combine(g) - np.asarray(r)).max()
        assert err < 1e-10, (name, err)
    print("PARITY_OK")

    # 256-wide one-hot front (--cap-BQ 63, advisor r3 finding)
    cap = 63
    rng = np.random.default_rng(11)
    codes = rng.integers(0, 2 * (cap + 1), size=(8, 128, 2)).astype(np.uint8)
    codes[rng.random(codes.shape) < 0.3] = 255
    gps = rng.dirichlet(np.ones(3), size=(10, 2))
    _, _, tabs, _ = PE.split_tables(
        gps, gps.mean(axis=1), luts.pair_lut([0.0, 0.5], cap),
        luts.singlet_lut(cap))
    assert tabs[3].shape[1] == 256
    n_rows = 2 * (cap + 1) + 1
    c = jnp.where(codes >= 254, jnp.uint8(n_rows - 1), codes).astype(jnp.int32)
    tabs_j = tuple(map(jnp.asarray, tabs))
    want = PE._pair_prod_gather(tabs_j[:3], c, n_rows)
    one = PE._onehot_prod_front(
        jnp.transpose(c, (2, 0, 1)), tabs_j[3], interpret=True)

    def val(t):
        h, l, e = (np.asarray(x, np.float64) for x in t)
        return (h + l) * np.exp2(e)

    np.testing.assert_allclose(val(one), val(want), rtol=1e-12)
    print("SMOKE_OK")


if __name__ == "__main__":
    main()
