"""df32 exact-mode Pallas kernel vs the XLA f64 reference kernels.

The df32 path must agree with f64 to ~1e-10 absolute on every LLK — far
below the printed output precision (%.4f/%.5f), so exact-mode byte parity
is preserved when the engine swaps kernels.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from demuxlet_tpu.models.likelihood import pair_llks, singlet_llks
from demuxlet_tpu.ops import luts
from demuxlet_tpu.ops import pallas_pair_exact as PE


def _workload(seed, B=16, S=128, U=3, V=4, A=3, NS=100, cap=40):
    rng = np.random.default_rng(seed)
    nq = cap + 1
    codes = rng.integers(0, 2 * nq, size=(B, S, U)).astype(np.uint8)
    codes[rng.random((B, S, U)) < 0.35] = 255
    idx = rng.integers(0, NS, size=(B, S)).astype(np.int32)
    msk = rng.random((B, S)) < 0.9
    codes[~msk] = 255  # build_codes_block contract: masked slots are empty
    gps = rng.dirichlet(np.ones(3), size=(NS, V))
    # sprinkle extreme posteriors (PL-field EM can produce tiny values)
    tiny = rng.random((NS, V)) < 0.1
    gps[tiny] = np.array([1 - 2e-8, 1e-8, 1e-8])
    gp0 = gps.mean(axis=1)
    grid = np.linspace(0.0, 0.5, A).tolist()
    w = luts.pair_lut(grid, cap)
    logf = luts.singlet_lut(cap)
    return codes, idx, msk, gps, gp0, w, logf, grid


def _dense_from_codes(codes, msk, cap=40):
    B, S, U = codes.shape
    nb = 2 * (cap + 1)
    cnt = np.zeros((B, S, nb), dtype=np.int32)
    for u in range(U):
        c = codes[..., u]
        valid = (c != 255) & msk
        np.add.at(cnt, (np.nonzero(valid)[0], np.nonzero(valid)[1],
                        c[valid].astype(np.int64)), 1)
    return cnt


def test_exact_smoke_cold_budget():
    """COLD-runnable df32 parity gate (not marked slow): a subprocess with
    a FRESH compile cache runs tests/_exact_smoke_child.py — the tiny
    V=2/A=2 one-tile default-grid kernel vs the XLA f64 kernels at 1e-10,
    plus the 256-wide one-hot front (--cap-BQ 63, advisor r3 finding) —
    on the CPU backend at LLVM opt level 0 (compile-time-bound interpret
    kernels; measured 31.8 s cold). `pytest -m "not slow"` therefore gives
    direct df32 parity coverage anywhere in <5 min, without the
    production-size kernels' multi-minute interpret compiles (marked
    slow), and the fresh cache pins the cold budget every run."""
    import os
    import subprocess
    import sys
    import tempfile

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with tempfile.TemporaryDirectory() as cache:
        env = dict(os.environ)
        env["DEMUX_TPU_JAX_CACHE"] = cache  # fresh: cold compile
        env.pop("XLA_FLAGS", None)  # child sets its own opt-level-0 flags
        env.pop("JAX_PLATFORMS", None)
        proc = subprocess.run(
            [sys.executable, os.path.join(repo, "tests",
                                          "_exact_smoke_child.py")],
            cwd=repo, env=env, capture_output=True, text=True, timeout=120,
        )
    assert proc.returncode == 0, proc.stderr[-4000:]
    assert "SMOKE_OK" in proc.stdout, (proc.stdout, proc.stderr[-2000:])


@pytest.mark.slow
@pytest.mark.parametrize("seed", [0])  # interpret mode is slow; one adversarial seed
def test_exact_pallas_matches_xla_f64(seed):
    codes, idx, msk, gps, gp0, w, logf, grid = _workload(seed)
    V, A = gps.shape[1], len(grid)

    gps_pair, gp0_pair, tabs, meta = PE.split_tables(gps, gp0, w, logf)
    llk, llk0, llk_ab, llk00 = PE.demux_block_exact(
        jnp.asarray(codes), jnp.asarray(idx), jnp.asarray(msk),
        tuple(map(jnp.asarray, gps_pair)), tuple(map(jnp.asarray, gp0_pair)),
        tuple(map(jnp.asarray, tabs)), meta,
        A, V, interpret=True,
    )

    # f64 reference on the equivalent dense block
    cnt = _dense_from_codes(codes, msk)
    gps_g = gps[idx]  # (B,S,V,3)
    gp0_g = gp0[idx]
    m3 = msk[..., None, None]
    neutral = np.array([1.0, 0, 0])
    gps_g = np.where(m3, gps_g, neutral)
    gp0_g = np.where(msk[..., None], gp0_g, neutral)
    ref_ab, ref_00 = pair_llks(
        jnp.asarray(cnt, jnp.float64), jnp.asarray(msk),
        jnp.asarray(gps_g), jnp.asarray(gp0_g), jnp.asarray(w), A,
        slot_chunk=0, dtype=jnp.float64,
    )
    ref_llk, ref_llk0 = singlet_llks(
        jnp.asarray(cnt, jnp.float64), jnp.asarray(msk),
        jnp.asarray(gps_g), jnp.asarray(gp0_g), jnp.asarray(logf),
        dtype=jnp.float64,
    )

    got_ab = PE.combine(llk_ab)
    got_00 = PE.combine(llk00)
    got_llk = PE.combine(llk)
    got_llk0 = PE.combine(llk0)
    for name, got, ref in (
        ("llk_ab", got_ab, np.asarray(ref_ab)),
        ("llk_00", got_00, np.asarray(ref_00)),
        ("llk", got_llk, np.asarray(ref_llk)),
        ("llk0", got_llk0, np.asarray(ref_llk0)),
    ):
        err = np.abs(got - ref).max()
        assert err < 1e-9, (name, err)


@pytest.mark.slow
@pytest.mark.parametrize("V,A", [(16, 2), (17, 3), (20, 2)])
def test_exact_pallas_tiled_matches_xla_f64(V, A):
    """(j,k)-TILED df32 kernel (pools past the unroll cap; round-3 verdict
    #1) vs the XLA f64 kernels: V=16 is the exact-tile default-grid
    triangular case, V=17 pads the sample axis (Vp=24, 8x8 tiles) on a
    3-alpha grid; V=20 on the default grid combines BOTH — triangular
    tiles whose diagonal tri tiles hold neutral padded rows (advisor
    r4 #3)."""
    codes, idx, msk, gps, gp0, w, logf, grid = _workload(
        0, B=8, S=128, U=2, V=V, A=A, NS=60)
    assert PE.plan_pair_tiles_df(V, A, grid[0] == 0.0, A - 1) is not None

    gps_pair, gp0_pair, tabs, meta = PE.split_tables(gps, gp0, w, logf)
    llk, llk0, llk_ab, llk00 = PE.demux_block_exact(
        jnp.asarray(codes), jnp.asarray(idx), jnp.asarray(msk),
        tuple(map(jnp.asarray, gps_pair)), tuple(map(jnp.asarray, gp0_pair)),
        tuple(map(jnp.asarray, tabs)), meta,
        A, V, interpret=True, a0_zero=grid[0] == 0.0, sym_a=A - 1,
    )

    cnt = _dense_from_codes(codes, msk)
    neutral = np.array([1.0, 0, 0])
    gps_g = np.where(msk[..., None, None], gps[idx], neutral)
    gp0_g = np.where(msk[..., None], gp0[idx], neutral)
    ref_ab, ref_00 = pair_llks(
        jnp.asarray(cnt, jnp.float64), jnp.asarray(msk),
        jnp.asarray(gps_g), jnp.asarray(gp0_g), jnp.asarray(w), A,
        slot_chunk=0, dtype=jnp.float64,
    )
    ref_llk, ref_llk0 = singlet_llks(
        jnp.asarray(cnt, jnp.float64), jnp.asarray(msk),
        jnp.asarray(gps_g), jnp.asarray(gp0_g), jnp.asarray(logf),
        dtype=jnp.float64,
    )
    for name, got, ref in (
        ("llk_ab", PE.combine(llk_ab), np.asarray(ref_ab)),
        ("llk_00", PE.combine(llk00), np.asarray(ref_00)),
        ("llk", PE.combine(llk), np.asarray(ref_llk)),
        ("llk0", PE.combine(llk0), np.asarray(ref_llk0)),
    ):
        err = np.abs(got - ref).max()
        assert err < 1e-9, (name, err)


@pytest.mark.slow
def test_exact_pallas_empty_slots_neutral():
    """All-padding block: every LLK must be exactly 0."""
    codes = np.full((16, 128, 2), 255, dtype=np.uint8)
    idx = np.zeros((16, 128), np.int32)
    msk = np.zeros((16, 128), bool)
    gps = np.random.default_rng(0).dirichlet(np.ones(3), size=(10, 4))
    gp0 = gps.mean(axis=1)
    w = luts.pair_lut([0.0, 0.5], 40)
    logf = luts.singlet_lut(40)
    gps_pair, gp0_pair, tabs, meta = PE.split_tables(gps, gp0, w, logf)
    llk, llk0, llk_ab, llk00 = PE.demux_block_exact(
        jnp.asarray(codes), jnp.asarray(idx), jnp.asarray(msk),
        tuple(map(jnp.asarray, gps_pair)), tuple(map(jnp.asarray, gp0_pair)),
        tuple(map(jnp.asarray, tabs)), meta,
        2, 4, interpret=True,
    )
    assert (PE.combine(llk_ab) == 0).all()
    assert (PE.combine(llk) == 0).all()


@pytest.mark.slow
def test_exact_pallas_cli_byte_parity(tmp_path):
    """CLI --exact-kernel pallas (interpret on CPU) produces byte-identical
    .single/.sing2/.best to the XLA f64 exact path on a real workload."""
    import random

    import sys
    sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent))
    from fixtures import random_workload, write_bam, write_vcf
    from demuxlet_tpu import cli

    rng = random.Random(41)
    contigs, names, variants, reads, truth = random_workload(
        rng, n_cells=12, n_snps=30, n_samples=3, reads_per_cell=40
    )
    vcf = write_vcf(str(tmp_path / "w.vcf"), names, variants, contigs=contigs)
    bam = write_bam(str(tmp_path / "w.bam"), contigs, reads)
    common = ["--sam", bam, "--vcf", vcf, "--field", "GT", "--device", "cpu",
              "--mode", "exact", "--cell-block", "16", "--mesh", "none"]
    assert cli.main(common + ["--exact-kernel", "xla",
                              "--out", str(tmp_path / "x")]) == 0
    assert cli.main(common + ["--exact-kernel", "pallas",
                              "--out", str(tmp_path / "p")]) == 0
    from parity_utils import canonicalize_best

    for ext in (".single", ".sing2", ".best"):
        want = open(str(tmp_path / "x") + ext).read()
        got = open(str(tmp_path / "p") + ext).read()
        if ext == ".best":
            # symmetric alpha=0.5 doublet pairs are exact real-arithmetic
            # ties; which mirror ulp-rounds higher is kernel-dependent
            # (documented exact-mode contract) — canonicalize the order
            want = "\n".join(canonicalize_best(want.splitlines()))
            got = "\n".join(canonicalize_best(got.splitlines()))
        assert got == want, f"{ext} differs between pallas-df32 and XLA f64"


@pytest.mark.slow
def test_exact_compact_matches_full_run():
    """Exact-mode run_compact (device decision pass over f64-combined df
    pairs) matches run() + host compact_from_result: argmax/llk fields
    exactly, exp-sum posteriors to ~1e-12 relative (device vs host exp
    ulp — far below the %.3g printed precision and the df32 1e-10
    contract)."""
    import random

    from demuxlet_tpu.models import decision as D
    from demuxlet_tpu.models.engine import DemuxEngine
    from oracle.numpy_oracle import PileupData

    nv, nsnps, ncells, grid = 3, 40, 10, [0.0, 0.5]
    rng = random.Random(5)
    g = np.random.RandomState(5).dirichlet([2, 2, 2], size=(nsnps, nv))
    scl = PileupData([f"S{i}" for i in range(nv)],
                     [g[i] for i in range(nsnps)])
    for c in range(ncells):
        scl.add_cell(f"BC{c:03d}")
        for _ in range(60):
            s = rng.randrange(nsnps)
            scl.cell_totl[c] += 1
            scl.add_read(s, c, f"U{rng.randrange(10000)}",
                         rng.choice([0, 0, 1, 1, 2]), rng.randrange(13, 41))
    gps = np.stack(scl.snp_gps)
    eng = DemuxEngine(gps, grid, cell_block=16, exact_kernel="pallas")
    assert eng.use_exact_pallas
    res = eng.run(scl)
    want = D.compact_from_result(res.llk_ab, res.llk_00, grid, 0.5)
    llks_c, llk0s_c, got = eng.run_compact(scl, doublet_prior=0.5)
    np.testing.assert_array_equal(llks_c, res.llks)
    np.testing.assert_array_equal(llk0s_c, res.llk0s)
    for f in ("sing_col", "llk_00", "max_llk", "max_sing2", "pair_llk12",
              "pair_llk10", "pair_llk20", "i_sing1", "i_sing2", "best_flat"):
        np.testing.assert_array_equal(getattr(got, f), getattr(want, f), f)
    for f in ("sum_single", "sum_double"):
        np.testing.assert_allclose(
            getattr(got, f), getattr(want, f), rtol=1e-12, err_msg=f)


@pytest.mark.slow
@pytest.mark.parametrize("seed", [1])
def test_exact_pallas_a0_zero_factorization(seed):
    """a0_zero=True (engine path for grids starting at alpha=0) agrees
    with the general kernel to df precision: inner[j,k,0] factorizes as
    (g[j].t[0,:,0]) * sum(g[k]) bit-compatibly at the 1e-10 contract."""
    codes, idx, msk, gps, gp0, w, logf, grid = _workload(seed)
    assert grid[0] == 0.0
    V, A = gps.shape[1], len(grid)
    gps_pair, gp0_pair, tabs, meta = PE.split_tables(gps, gp0, w, logf)
    args = (
        jnp.asarray(codes), jnp.asarray(idx), jnp.asarray(msk),
        tuple(map(jnp.asarray, gps_pair)), tuple(map(jnp.asarray, gp0_pair)),
        tuple(map(jnp.asarray, tabs)), meta,
        A, V,
    )
    gen = PE.demux_block_exact(*args, interpret=True, a0_zero=False)
    fac = PE.demux_block_exact(*args, interpret=True, a0_zero=True)
    for name, a, b in zip(
        ("llk", "llk0", "llk_ab", "llk00"), gen, fac
    ):
        err = np.abs(PE.combine(a) - PE.combine(b)).max()
        assert err < 1e-10, (name, err)

    # sym_a (alpha == 0.5 plane mirrored over j <= k, the engine path for
    # grids containing 0.5): agrees with the general kernel at df
    # precision, and the mirrored entries come out bit-identical
    sym = PE.demux_block_exact(*args, interpret=True, a0_zero=True,
                               sym_a=grid.index(0.5))
    for name, a, b in zip(
        ("llk", "llk0", "llk_ab", "llk00"), gen, sym
    ):
        err = np.abs(PE.combine(a) - PE.combine(b)).max()
        assert err < 1e-10, (name, err)
    ab = PE.combine(sym[2])
    sa = grid.index(0.5)
    assert (ab[:, :, :, sa] == np.swapaxes(ab[:, :, :, sa], 1, 2)).all()


@pytest.mark.slow
def test_onehot_front_matches_pair():
    """The TPU-default one-hot MXU front (standalone Pallas selection
    kernel, PE._onehot_prod_front) must reproduce the pair-code-LUT XLA
    front: same per-slot products to df noise (the pair LUT carries
    f64-exact host pair products; the one-hot path does the UMI mul in
    device df — ~1e-15 relative). Tiny V/A keeps the interpret-mode
    compile of the second kernel variant cheap."""
    codes, idx, msk, gps, gp0, w, logf, grid = _workload(
        7, B=16, S=128, U=3, V=2, A=2)
    gps, gp0 = gps[:, :2], gp0
    gps_pair, gp0_pair, tabs, meta = PE.split_tables(gps, gp0, w, logf)
    args = (
        jnp.asarray(codes), jnp.asarray(idx), jnp.asarray(msk),
        tuple(map(jnp.asarray, gps_pair)), tuple(map(jnp.asarray, gp0_pair)),
        tuple(map(jnp.asarray, tabs)), meta, 2, 2,
    )
    kw = dict(interpret=True, a0_zero=True, sym_a=1)
    o_pair = PE.demux_block_exact_impl(*args, front="pair", **kw)
    o_onehot = PE.demux_block_exact_impl(*args, front="onehot", **kw)
    for p, q in zip(o_pair, o_onehot):
        a = np.asarray(p[0], np.float64) + np.asarray(p[1], np.float64)
        b = np.asarray(q[0], np.float64) + np.asarray(q[1], np.float64)
        np.testing.assert_allclose(a, b, rtol=1e-12, atol=1e-12)
