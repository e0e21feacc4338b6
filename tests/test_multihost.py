"""Barcode-shard invariance: N-shard merged outputs == unsharded outputs."""

import io
import pytest
import random

import numpy as np

from demuxlet_tpu.host.pileup import build_pileup
from demuxlet_tpu.io.bam import AlignmentReader
from demuxlet_tpu.io.vcf import load_snp_table
from demuxlet_tpu.models import outputs as out_mod
from demuxlet_tpu.models.engine import DemuxEngine, cell_stats
from demuxlet_tpu.parallel import multihost as mh
from fixtures import random_workload, write_bam, write_vcf


def _outputs(scl, table, res):
    stats = cell_stats(scl)
    s1, s2, sb = io.StringIO(), io.StringIO(), io.StringIO()
    out_mod.write_single(s1, stats, table.sample_ids, res.llks, res.llk0s)
    out_mod.write_pass2(
        stats, table.sample_ids, res.llk_ab, res.llk_00, [0.0, 0.5], 0.5,
        s2, sb,
    )
    return s1.getvalue(), s2.getvalue(), sb.getvalue()


def test_shard_merge_invariance(tmp_path):
    rng = random.Random(17)
    contigs, names, variants, reads, truth = random_workload(
        rng, n_cells=30, n_snps=40, n_samples=3, reads_per_cell=50
    )
    vcf = write_vcf(str(tmp_path / "w.vcf"), names, variants, contigs=contigs)
    bam = write_bam(str(tmp_path / "w.bam"), contigs, reads)
    table = load_snp_table(vcf, field_name="GT")

    # unsharded reference run
    scl, _ = build_pileup(AlignmentReader(bam), table)
    eng = DemuxEngine(table.gps, [0.0, 0.5], cell_block=16)
    full = _outputs(scl, table, eng.run(scl))

    # 3 shards, merged
    N = 3
    shards = []
    for k in range(N):
        sclk, _ = build_pileup(
            AlignmentReader(bam), table, n_shards=N, shard_id=k
        )
        resk = eng.run(sclk)
        statsk = cell_stats(sclk)
        shards.append(
            mh.ShardResult(
                barcodes=statsk.barcodes, totl=statsk.totl,
                pass_=statsk.pass_, uniq=statsk.uniq, nsnp=statsk.nsnp,
                llks=resk.llks, llk0s=resk.llk0s, llk_ab=resk.llk_ab,
                llk_00=resk.llk_00,
            )
        )
    # disjoint, complete partition
    allbc = [b for s in shards for b in s.barcodes]
    assert sorted(allbc) == sorted(scl.barcodes)
    merged = mh.merge_shards(shards)
    assert merged.barcodes == sorted(scl.barcodes)

    # rebuild outputs from the merged arrays and compare byte-for-byte
    from demuxlet_tpu.models.outputs import CellStats

    mstats = CellStats(
        barcodes=merged.barcodes, totl=merged.totl, pass_=merged.pass_,
        uniq=merged.uniq, nsnp=merged.nsnp,
    )
    s1, s2, sb = io.StringIO(), io.StringIO(), io.StringIO()
    out_mod.write_single(s1, mstats, table.sample_ids, merged.llks, merged.llk0s)
    out_mod.write_pass2(
        mstats, table.sample_ids, merged.llk_ab, merged.llk_00,
        [0.0, 0.5], 0.5, s2, sb,
    )
    assert (s1.getvalue(), s2.getvalue(), sb.getvalue()) == full


def test_owns_barcode_partition():
    bcs = ["BC%05d" % i for i in range(500)]
    for n in (1, 2, 5):
        owners = [
            [b for b in bcs if mh.owns_barcode(b, k, n)] for k in range(n)
        ]
        assert sorted(b for o in owners for b in o) == sorted(bcs)
        flat = [b for o in owners for b in o]
        assert len(flat) == len(set(flat))


def test_gather_results_single_process():
    r = mh.ShardResult(
        barcodes=["B2", "B1"], totl=np.array([2, 1]), pass_=np.array([2, 1]),
        uniq=np.array([2, 1]), nsnp=np.array([2, 1]),
        llks=np.zeros((2, 3)), llk0s=np.zeros(2),
        llk_ab=np.zeros((2, 3, 3, 2)), llk_00=np.zeros((2, 2)),
    )
    m = mh.gather_results(r)
    assert m.barcodes == ["B1", "B2"]
    assert list(m.totl) == [1, 2]


def test_shard_merge_invariance_native(tmp_path):
    """Same shard-merge invariance through the native C++ ingest."""
    pytest.importorskip("demuxlet_tpu.native.ingest")
    from demuxlet_tpu.native import ingest as native

    if not native.available():
        pytest.skip("native ingest not built")
    rng = random.Random(19)
    contigs, names, variants, reads, truth = random_workload(
        rng, n_cells=20, n_snps=30, n_samples=3, reads_per_cell=40
    )
    vcf = write_vcf(str(tmp_path / "w.vcf"), names, variants, contigs=contigs)
    bam = write_bam(str(tmp_path / "w.bam"), contigs, reads)
    table = load_snp_table(vcf, field_name="GT")
    full, _ = native.build_pileup(bam, table)
    bcs = []
    for k in range(3):
        s, _ = native.build_pileup(bam, table, n_shards=3, shard_id=k)
        bcs.extend(s.barcodes)
    assert sorted(bcs) == sorted(full.barcodes)
    assert len(bcs) == len(set(bcs))
