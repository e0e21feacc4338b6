"""Native C++ ingest parity vs the pure Python ingest on synthetic BAMs."""

import random

import numpy as np
import pytest

from demuxlet_tpu.host.csr import CsrPileup, build_slots_csr
from demuxlet_tpu.host.pileup import build_pileup
from demuxlet_tpu.host.slots import build_slots
from demuxlet_tpu.io.bam import AlignmentReader
from demuxlet_tpu.io.vcf import load_snp_table
from fixtures import SimRead, random_workload, write_bam, write_vcf

native = pytest.importorskip("demuxlet_tpu.native.ingest")

if not native.available():
    pytest.skip("native ingest not built", allow_module_level=True)


def _workload(tmp_path, seed=7, n_cells=25, n_snps=40, n_samples=3):
    rng = random.Random(seed)
    contigs, names, variants, reads, truth = random_workload(
        rng, n_cells=n_cells, n_snps=n_snps, n_samples=n_samples,
        reads_per_cell=60,
    )
    vcf = write_vcf(str(tmp_path / "w.vcf"), names, variants, contigs=contigs)
    bam = write_bam(str(tmp_path / "w.bam"), contigs, reads)
    table = load_snp_table(vcf, field_name="GT")
    return bam, table


def _py_csr(bam, table, **kw):
    rdr = AlignmentReader(bam)
    scl, ctr = build_pileup(rdr, table, **kw)
    return CsrPileup.from_pileup(scl), ctr


def test_native_matches_python(tmp_path):
    bam, table = _workload(tmp_path)
    csr_n, ctr_n = native.build_pileup(bam, table)
    csr_p, ctr_p = _py_csr(bam, table)

    assert csr_n.barcodes == csr_p.barcodes
    np.testing.assert_array_equal(csr_n.cell_totl, csr_p.cell_totl)
    np.testing.assert_array_equal(csr_n.cell_pass, csr_p.cell_pass)
    np.testing.assert_array_equal(csr_n.cell_uniq, csr_p.cell_uniq)
    assert ctr_n == ctr_p

    # identical slot tensors for every cell block
    cells = list(range(csr_n.nbcs))
    bn = build_slots(csr_n, cells)
    bp = build_slots(csr_p, cells)
    np.testing.assert_array_equal(bn.idx, bp.idx)
    np.testing.assert_array_equal(bn.msk, bp.msk)
    np.testing.assert_array_equal(bn.cnt, bp.cnt)


def test_native_group_list(tmp_path):
    bam, table = _workload(tmp_path, seed=9)
    keep = {"BC%05d" % i for i in range(0, 25, 2)}
    csr_n, ctr_n = native.build_pileup(bam, table, group_set=keep)
    csr_p, ctr_p = _py_csr(bam, table, group_set=keep)
    assert csr_n.barcodes == csr_p.barcodes
    assert set(csr_n.barcodes) <= keep
    assert ctr_n == ctr_p
    np.testing.assert_array_equal(csr_n.cell_uniq, csr_p.cell_uniq)


def test_native_filters(tmp_path):
    bam, table = _workload(tmp_path, seed=11)
    kw = dict(min_bq=20, min_td=5, cap_bq=30, min_mq=30)
    csr_n, ctr_n = native.build_pileup(bam, table, **kw)
    rdr = AlignmentReader(bam, min_mq=30)
    scl, ctr_p = build_pileup(
        rdr, table, min_bq=20, min_td=5, cap_bq=30
    )
    csr_p = CsrPileup.from_pileup(scl)
    assert ctr_n == ctr_p
    cells = list(range(csr_n.nbcs))
    bn = build_slots(csr_n, cells)
    bp = build_slots(csr_p, cells)
    np.testing.assert_array_equal(bn.cnt, bp.cnt)


def test_csr_engine_same_output(tmp_path):
    """Engine over native CSR == engine over Python dict pileup."""
    from demuxlet_tpu.models.engine import DemuxEngine

    bam, table = _workload(tmp_path, seed=13)
    csr_n, _ = native.build_pileup(bam, table)
    rdr = AlignmentReader(bam)
    scl, _ = build_pileup(rdr, table)
    eng = DemuxEngine(table.gps, [0.0, 0.5], cell_block=16)
    rn = eng.run(csr_n)
    rp = eng.run(scl)
    np.testing.assert_allclose(rn.llks, rp.llks, rtol=0, atol=0)
    np.testing.assert_allclose(rn.llk_ab, rp.llk_ab, rtol=0, atol=0)
