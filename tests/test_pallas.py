"""Pallas fast-mode kernel vs the exact f64 XLA path (interpret mode on CPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from demuxlet_tpu.models.likelihood import pair_llks
from demuxlet_tpu.ops import luts
from demuxlet_tpu.ops.pallas_pair import pack_block, pair_llks_pallas


def _case(B, S, V, A, seed=0):
    rng = np.random.default_rng(seed)
    nb = 82
    cnt = rng.integers(0, 3, size=(B, S, nb)).astype(np.int32)
    msk = rng.random((B, S)) < 0.8
    cnt *= msk[:, :, None]
    gps = rng.dirichlet(np.ones(3), size=(B, S, V))
    gp0 = gps.mean(axis=2)
    grid = np.linspace(0, 0.5, A).tolist()
    w = luts.pair_lut(grid, 40)
    return cnt, msk, gps, gp0, w


@pytest.mark.parametrize(
    "B,S,V,A,opt",
    [
        (4, 64, 3, 2, False),
        (6, 100, 4, 3, False),
        # S=200 pads to 256 -> even slot-tile count -> the paired-lane
        # log path (halves == 2); opt also turns on a0_sep + sym_a
        (4, 200, 3, 2, True),
        (6, 100, 4, 3, True),
        # V*V*A > _UNROLL_CAP -> the (j,k)-TILED kernel (round-3 verdict
        # #1: V=16-64 pools; trace time / VMEM flat in V). 16: exact tile
        # fit; 17: sample-axis padding (Vp=24, neutral rows dropped at
        # reassembly); 32 triangular default grid.
        (4, 64, 16, 2, False),
        (4, 200, 17, 3, True),
        (4, 64, 32, 2, True),
        # single-point alpha=0 grid past the unroll cap: no tiled
        # channels at all — the extras-only path carries the result
        (4, 64, 20, 1, True),
        # triangular AND sample-padded (advisor r4 #3): V=20 on the
        # default [0, 0.5] grid -> Vp=24, upper-triangle tiles whose
        # diagonal tri tiles contain neutral padded rows; mirror-fill
        # must interact correctly with the dropped padded channels
        (4, 64, 20, 2, True),
    ],
)
def test_pallas_matches_exact(B, S, V, A, opt):
    cnt, msk, gps, gp0, w = _case(B, S, V, A)
    ref_ab, ref_00 = pair_llks(
        jnp.asarray(cnt), jnp.asarray(msk), jnp.asarray(gps),
        jnp.asarray(gp0), jnp.asarray(w), A,
    )
    cnt_t, gps_t, wt = pack_block(cnt, msk, gps, w)
    ab, z0 = pair_llks_pallas(
        jnp.asarray(cnt_t), jnp.asarray(gps_t), jnp.asarray(wt), A, V,
        interpret=True, a0_sep=opt,
        sym_a=A - 1 if opt and A > 1 else None,
    )
    scale = np.maximum(1.0, np.abs(np.asarray(ref_ab)))
    err = np.abs(np.asarray(ab)[:B] - np.asarray(ref_ab)) / scale
    assert err.max() < 2e-5, err.max()
    err0 = np.abs(np.asarray(z0)[:B] - np.asarray(ref_00)) / np.maximum(
        1.0, np.abs(np.asarray(ref_00))
    )
    assert err0.max() < 2e-5


def test_plan_pair_tiles_shapes():
    """Tile-plan invariants: small pools stay unrolled; the default
    [0, 0.5] grid enumerates only upper-triangle tiles; padded sample
    counts round up to the tile size."""
    from demuxlet_tpu.ops.pallas_pair import plan_pair_tiles

    assert plan_pair_tiles(8, 5, True, 4) is None  # 320 <= cap
    # V=32 default grid: a0_sep leaves only the symmetric alpha=0.5 plane
    Jt, Kt, Vp, tiles, ac_list, tri = plan_pair_tiles(32, 2, True, 1)
    assert (Jt, Kt, Vp) == (16, 16, 32) and ac_list == [1] and tri
    assert tiles == [(0, 0), (0, 1), (1, 1)]
    # V=17 pads to 24 with 8x8 tiles; 5-alpha grid tiles all of a>=1
    Jt, Kt, Vp, tiles, ac_list, tri = plan_pair_tiles(17, 5, True, 4)
    assert (Jt, Kt, Vp) == (8, 8, 24) and ac_list == [1, 2, 3, 4]
    assert not tri and len(tiles) == 9


def test_engine_fast_vs_exact_tiled_pool(tmp_path):
    """Engine-level parity at a tiled pool size (V=16 > unroll cap):
    fast-mode LLKs match the XLA f64 exact path within fast tolerance."""
    import random

    from demuxlet_tpu.host.pileup import build_pileup
    from demuxlet_tpu.io.bam import AlignmentReader
    from demuxlet_tpu.io.vcf import load_snp_table
    from demuxlet_tpu.models.engine import DemuxEngine
    from fixtures import random_workload, write_bam, write_vcf

    rng = random.Random(21)
    contigs, names, variants, reads, truth = random_workload(
        rng, n_cells=12, n_snps=30, n_samples=16, reads_per_cell=50
    )
    vcf = write_vcf(str(tmp_path / "w.vcf"), names, variants, contigs=contigs)
    bam = write_bam(str(tmp_path / "w.bam"), contigs, reads)
    table = load_snp_table(vcf, field_name="GT")
    scl, _ = build_pileup(AlignmentReader(bam), table)

    grid = [0.0, 0.5]
    rf = DemuxEngine(table.gps, grid, cell_block=8, mode="fast").run(scl)
    rx = DemuxEngine(table.gps, grid, cell_block=8, mode="exact").run(scl)
    scale = np.maximum(1.0, np.abs(rx.llk_ab))
    assert (np.abs(rf.llk_ab - rx.llk_ab) / scale).max() < 2e-4
    assert (np.abs(rf.llk_00 - rx.llk_00)
            / np.maximum(1.0, np.abs(rx.llk_00))).max() < 2e-4
    assert (np.abs(rf.llks - rx.llks)
            / np.maximum(1.0, np.abs(rx.llks))).max() < 2e-4


def test_fast_engine_same_calls(tmp_path):
    """Fast-mode engine produces identical .best calls on a synthetic run."""
    import random

    from demuxlet_tpu.host.pileup import build_pileup
    from demuxlet_tpu.io.bam import AlignmentReader
    from demuxlet_tpu.io.vcf import load_snp_table
    from demuxlet_tpu.models.engine import DemuxEngine, cell_stats
    from demuxlet_tpu.models import outputs as out_mod
    from fixtures import random_workload, write_bam, write_vcf

    rng = random.Random(5)
    contigs, names, variants, reads, truth = random_workload(
        rng, n_cells=20, n_snps=40, n_samples=3, reads_per_cell=60
    )
    vcf = write_vcf(str(tmp_path / "w.vcf"), names, variants, contigs=contigs)
    bam = write_bam(str(tmp_path / "w.bam"), contigs, reads)
    table = load_snp_table(vcf, field_name="GT")
    rdr = AlignmentReader(bam)
    scl, _ = build_pileup(rdr, table)
    stats = cell_stats(scl)

    def calls(mode):
        eng = DemuxEngine(table.gps, [0.0, 0.5], cell_block=8, mode=mode)
        res = eng.run(scl)
        import io

        s2, sb = io.StringIO(), io.StringIO()
        out_mod.write_pass2(
            stats, table.sample_ids, res.llk_ab, res.llk_00,
            [0.0, 0.5], 0.5, s2, sb,
        )
        out = []
        for ln in sb.getvalue().splitlines()[1:]:
            best = ln.split("\t")[5]
            if best.startswith("DBL-"):
                # (j,k,0.5) and (k,j,0.5) are the same call: the doublet LLK
                # is symmetric at alpha=0.5 and the argmax tie is broken by
                # fp rounding luck (also true of the reference). Canonicalize.
                _, a, b, al = best.split("-")
                best = "DBL-%s-%s-%s" % (min(a, b), max(a, b), al)
            out.append(best)
        return out

    assert calls("fast") == calls("exact")


def test_compact_decision_path_bytes(tmp_path):
    """run_compact + write_pass2_compact == run + write_pass2 byte-for-byte
    in fast mode (the device decision pass ships ~30 scalars/cell)."""
    import io
    import random

    from demuxlet_tpu.host.pileup import build_pileup
    from demuxlet_tpu.io.bam import AlignmentReader
    from demuxlet_tpu.io.vcf import load_snp_table
    from demuxlet_tpu.models import outputs as out_mod
    from demuxlet_tpu.models.engine import DemuxEngine, cell_stats
    from fixtures import random_workload, write_bam, write_vcf

    rng = random.Random(8)
    contigs, names, variants, reads, truth = random_workload(
        rng, n_cells=22, n_snps=40, n_samples=3, reads_per_cell=60
    )
    vcf = write_vcf(str(tmp_path / "w.vcf"), names, variants, contigs=contigs)
    bam = write_bam(str(tmp_path / "w.bam"), contigs, reads)
    table = load_snp_table(vcf, field_name="GT")
    scl, _ = build_pileup(AlignmentReader(bam), table)
    stats = cell_stats(scl)
    grid = [0.0, 0.3, 0.5]
    eng = DemuxEngine(table.gps, grid, cell_block=8, mode="fast")

    res = eng.run(scl)
    s2a, sba = io.StringIO(), io.StringIO()
    out_mod.write_pass2(
        stats, table.sample_ids, res.llk_ab, res.llk_00, grid, 0.5, s2a, sba
    )

    llks, llk0s, compact = eng.run_compact(scl, doublet_prior=0.5)
    s2b, sbb = io.StringIO(), io.StringIO()
    out_mod.write_pass2_compact(
        stats, table.sample_ids, compact, grid, 0.5, s2b, sbb
    )
    assert s2b.getvalue() == s2a.getvalue()
    assert sbb.getvalue() == sba.getvalue()
    import numpy as np

    np.testing.assert_allclose(llks, res.llks, rtol=0, atol=0)


def test_allele2_only_slot_keeps_uniform_gl_term():
    """A slot whose only observations are allele==2 carries no codes but
    must stay masked-in: the reference includes the SNP in the cell's
    covered set and every sample's LLK gains the uniform-GL log(1/3) term
    (cmd_cram_demuxlet.cpp:426-459 with the :435 skip). The shrunk fast
    path (msk derived on device) marks such slots with the reserved code
    254 — without it they would silently drop ~1.1 nats per slot."""
    import random

    import numpy as np

    from demuxlet_tpu.models.engine import DemuxEngine
    from oracle.numpy_oracle import PileupData, compute_gp0s, pass1_singlet

    rng = random.Random(11)
    nv, nsnps = 3, 8
    g = np.random.RandomState(11).dirichlet([2, 2, 2], size=(nsnps, nv))
    scl = PileupData([f"S{i}" for i in range(nv)], list(g))
    for c in range(2):
        scl.add_cell(f"BC{c:03d}")
        for u in range(12):
            s = 1 + rng.randrange(nsnps - 1)
            scl.cell_totl[c] += 1
            scl.add_read(s, c, f"U{u}", rng.choice([0, 1]), 30)
    # cell 0, snp 0: only mismatch-both observations -> zero codes
    scl.cell_totl[0] += 2
    scl.add_read(0, 0, "UX1", 2, 30)
    scl.add_read(0, 0, "UX2", 2, 30)

    gp0s = compute_gp0s(scl)
    o_llks, o_llk0s = pass1_singlet(scl, gp0s)

    eng = DemuxEngine(np.stack(scl.snp_gps), [0.0, 0.5], mode="fast")
    res = eng.run(scl)
    np.testing.assert_allclose(res.llks, o_llks, rtol=0, atol=2e-3)
    np.testing.assert_allclose(res.llk0s, o_llk0s, rtol=0, atol=2e-3)
