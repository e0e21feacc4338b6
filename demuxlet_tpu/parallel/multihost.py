"""Multi-host execution: distributed init, barcode sharding, result merge.

The reference scales across machines only by manual `--group-list` splits
(cmd_cram_demuxlet.cpp:68). Here the same decomposition is first-class:

  1. every process calls `initialize()` (jax.distributed) and learns its
     (process_id, n_processes);
  2. each process ingests + demuxes only the barcodes in its stripe
     (`owns_barcode`) — results are pure functions of a barcode's reads, so
     shards are embarrassingly parallel;
  3. per-barcode result rows merge to process 0 with `gather_results`
     (all-gather over DCN/ICI via multihost_utils), which re-sorts by
     barcode to reproduce the reference's std::map output order
     (cmd_cram_demuxlet.cpp:472,576).

The merge path is pure (arrays in, arrays out) and is unit-tested
single-process by splitting a workload into stripes and comparing against
the unsharded run (tests/test_multihost.py).
"""

from __future__ import annotations

import zlib
from dataclasses import dataclass
from typing import List, Optional, Sequence

import numpy as np


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> tuple[int, int]:
    """jax.distributed.initialize (no-op fallback single-process).

    Returns (process_id, n_processes)."""
    import jax

    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    return jax.process_index(), jax.process_count()


def owns_barcode(barcode: str, shard_id: int, n_shards: int) -> bool:
    """Deterministic barcode -> shard assignment (stable across runs/hosts)."""
    if n_shards <= 1:
        return True
    h = zlib.crc32(barcode.encode()) & 0xFFFFFFFF
    return h % n_shards == shard_id


def shard_filter(shard_id: int, n_shards: int):
    """A group-set-style predicate for the ingest layer."""
    return lambda bc: owns_barcode(bc, shard_id, n_shards)


@dataclass
class ShardResult:
    """One shard's per-barcode outputs, ready to merge."""

    barcodes: List[str]
    totl: np.ndarray
    pass_: np.ndarray
    uniq: np.ndarray
    nsnp: np.ndarray
    llks: np.ndarray  # (n, nv)
    llk0s: np.ndarray  # (n,)
    llk_ab: np.ndarray  # (n, nv, nv, na)
    llk_00: np.ndarray  # (n, na)


def merge_shards(shards: Sequence[ShardResult]) -> ShardResult:
    """Concatenate shard rows and sort by barcode (reference output order).

    Barcodes must be disjoint across shards (they are, by owns_barcode)."""
    barcodes: List[str] = []
    for s in shards:
        barcodes.extend(s.barcodes)
    order = np.argsort(np.asarray(barcodes, dtype=object), kind="stable")
    cat = lambda f: np.concatenate([getattr(s, f) for s in shards])[order]
    return ShardResult(
        barcodes=[barcodes[i] for i in order],
        totl=cat("totl"),
        pass_=cat("pass_"),
        uniq=cat("uniq"),
        nsnp=cat("nsnp"),
        llks=cat("llks"),
        llk0s=cat("llk0s"),
        llk_ab=cat("llk_ab"),
        llk_00=cat("llk_00"),
    )


def _encode_barcodes(barcodes: Sequence[str]) -> np.ndarray:
    """Fixed-width byte matrix sized to the GLOBAL max barcode length
    (allgathered), so no barcode is ever truncated."""
    from jax.experimental import multihost_utils as mhu

    raws = [b.encode() for b in barcodes]
    local_max = max((len(r) for r in raws), default=0)
    width = int(
        mhu.process_allgather(np.asarray([local_max], dtype=np.int64)).max()
    )
    width = max(width, 1)
    bc = np.zeros((len(raws), width), dtype=np.uint8)
    for i, raw in enumerate(raws):
        bc[i, : len(raw)] = np.frombuffer(raw, dtype=np.uint8)
    return bc


def gather_results(local: ShardResult) -> Optional[ShardResult]:
    """All-gather FULL shard results across processes; returns the merged
    result on process 0 and None elsewhere. Single-process: identity.

    Ships the whole (n,V,V,A) tensor — needed only for --write-pair; the
    default distributed path is gather_compact (per-cell decision rows)."""
    import jax

    if jax.process_count() == 1:
        return merge_shards([local])

    from jax.experimental import multihost_utils as mhu

    n = len(local.barcodes)
    bc = _encode_barcodes(local.barcodes)

    counts = mhu.process_allgather(np.asarray([n], dtype=np.int64))
    nmax = int(counts.max())

    def pad(a):
        out = np.zeros((nmax,) + a.shape[1:], dtype=a.dtype)
        out[: len(a)] = a
        return out

    fields = [
        bc.astype(np.int32), local.totl, local.pass_, local.uniq, local.nsnp,
        local.llks, local.llk0s, local.llk_ab, local.llk_00,
    ]
    gathered = [mhu.process_allgather(pad(np.asarray(f))) for f in fields]
    if jax.process_index() != 0:
        return None
    shards = []
    for p in range(jax.process_count()):
        np_ = int(counts[p])
        g = [arr[p][:np_] for arr in gathered]
        names = [
            bytes(row.astype(np.uint8)).rstrip(b"\x00").decode()
            for row in g[0]
        ]
        shards.append(
            ShardResult(
                barcodes=names, totl=g[1], pass_=g[2], uniq=g[3], nsnp=g[4],
                llks=g[5], llk0s=g[6], llk_ab=g[7], llk_00=g[8],
            )
        )
    return merge_shards(shards)


# ---------------------------------------------------------------- compact
@dataclass
class CompactShard:
    """One shard's per-barcode outputs in compact (decision-row) form:
    O(V + A) floats per cell instead of the (V,V,A) tensor — what actually
    crosses DCN/ICI in the default distributed path."""

    barcodes: List[str]
    totl: np.ndarray
    pass_: np.ndarray
    uniq: np.ndarray
    nsnp: np.ndarray
    llks: np.ndarray  # (n, V) pass-1 singlet LLKs
    llk0s: np.ndarray  # (n,)
    compact: "object"  # models.decision.CompactResult


def merge_compact_shards(shards: Sequence[CompactShard]) -> CompactShard:
    """Concatenate shard rows and sort by barcode (reference output order,
    cmd_cram_demuxlet.cpp:472,576). Barcodes must be disjoint."""
    from demuxlet_tpu.models.decision import CompactResult

    barcodes: List[str] = []
    for s in shards:
        barcodes.extend(s.barcodes)
    order = np.argsort(np.asarray(barcodes, dtype=object), kind="stable")
    cat = lambda f: np.concatenate([getattr(s, f) for s in shards])[order]
    ccat = lambda f: np.concatenate(
        [getattr(s.compact, f) for s in shards]
    )[order]
    compact = CompactResult(
        **{f: ccat(f) for f in CompactResult.__dataclass_fields__}
    )
    return CompactShard(
        barcodes=[barcodes[i] for i in order],
        totl=cat("totl"),
        pass_=cat("pass_"),
        uniq=cat("uniq"),
        nsnp=cat("nsnp"),
        llks=cat("llks"),
        llk0s=cat("llk0s"),
        compact=compact,
    )


_COMPACT_F64 = (
    "sing_col", "llk_00", "max_llk", "sum_single", "sum_double",
    "max_sing2", "pair_llk12", "pair_llk10", "pair_llk20",
)
_COMPACT_I64 = ("i_sing1", "i_sing2", "best_flat")


def gather_compact(local: CompactShard) -> Optional[CompactShard]:
    """All-gather compact decision rows across processes; merged result on
    process 0, None elsewhere. Three allgathers total (barcode bytes, one
    packed f64 matrix, one packed i64 matrix): ~(2V+A+12) values/cell."""
    import jax

    if jax.process_count() == 1:
        return merge_compact_shards([local])

    from jax.experimental import multihost_utils as mhu

    from demuxlet_tpu.models.decision import CompactResult

    n = len(local.barcodes)
    V = local.llks.shape[1]
    A = local.compact.llk_00.shape[1]
    bc = _encode_barcodes(local.barcodes)

    fcols = [np.asarray(local.llks, np.float64).reshape(n, V),
             np.asarray(local.llk0s, np.float64).reshape(n, 1)]
    for f in _COMPACT_F64:
        a = np.asarray(getattr(local.compact, f), np.float64)
        fcols.append(a.reshape(n, -1))
    fmat = np.concatenate(fcols, axis=1) if n else np.zeros(
        (0, 2 * V + A + 8), np.float64
    )
    icols = [
        np.asarray(local.totl, np.int64), np.asarray(local.pass_, np.int64),
        np.asarray(local.uniq, np.int64), np.asarray(local.nsnp, np.int64),
    ] + [np.asarray(getattr(local.compact, f), np.int64) for f in _COMPACT_I64]
    imat = np.stack(icols, axis=1) if n else np.zeros((0, 7), np.int64)

    counts = mhu.process_allgather(np.asarray([n], dtype=np.int64))
    nmax = int(max(counts.max(), 1))

    def pad(a):
        out = np.zeros((nmax,) + a.shape[1:], dtype=a.dtype)
        out[: len(a)] = a
        return out

    g_bc = mhu.process_allgather(pad(bc))
    g_f = mhu.process_allgather(pad(fmat))
    g_i = mhu.process_allgather(pad(imat))
    if jax.process_index() != 0:
        return None

    shards = []
    for p in range(jax.process_count()):
        np_ = int(counts[p])
        names = [
            bytes(row).rstrip(b"\x00").decode()
            for row in np.asarray(g_bc[p][:np_], np.uint8)
        ]
        f = np.asarray(g_f[p][:np_], np.float64)
        ii = np.asarray(g_i[p][:np_], np.int64)
        o = 0
        llks = f[:, o : o + V]; o += V
        llk0s = f[:, o]; o += 1
        cvals = {}
        for name in _COMPACT_F64:
            w = {"sing_col": V, "llk_00": A}.get(name, 1)
            col = f[:, o : o + w]; o += w
            cvals[name] = col if w > 1 else col[:, 0]
        for k, name in enumerate(_COMPACT_I64):
            cvals[name] = ii[:, 4 + k]
        shards.append(CompactShard(
            barcodes=names,
            totl=ii[:, 0], pass_=ii[:, 1], uniq=ii[:, 2], nsnp=ii[:, 3],
            llks=llks, llk0s=llk0s, compact=CompactResult(**cvals),
        ))
    return merge_compact_shards(shards)


# ---------------------------------------------------------- genome shards
def merge_shards_sum(shards: Sequence[ShardResult]) -> ShardResult:
    """Merge GENOME-sharded results: the same barcode appears in several
    shards with partial (disjoint-SNP) contributions, and log-likelihoods,
    read counters and SNP counts all SUM. Output rows sort by barcode
    (reference output order)."""
    order: List[str] = []
    index = {}
    for s in shards:
        for b in s.barcodes:
            if b not in index:
                index[b] = len(order)
                order.append(b)
    sorted_bcs = sorted(order)
    pos = {b: i for i, b in enumerate(sorted_bcs)}
    n = len(sorted_bcs)
    first = shards[0]
    out = ShardResult(
        barcodes=sorted_bcs,
        totl=np.zeros(n, first.totl.dtype),
        pass_=np.zeros(n, first.pass_.dtype),
        uniq=np.zeros(n, first.uniq.dtype),
        nsnp=np.zeros(n, first.nsnp.dtype),
        llks=np.zeros((n,) + first.llks.shape[1:], np.float64),
        llk0s=np.zeros(n, np.float64),
        llk_ab=np.zeros((n,) + first.llk_ab.shape[1:], np.float64),
        llk_00=np.zeros((n,) + first.llk_00.shape[1:], np.float64),
    )
    for s in shards:
        idx = np.asarray([pos[b] for b in s.barcodes], dtype=np.int64)
        if not len(idx):
            continue
        np.add.at(out.totl, idx, s.totl)
        np.add.at(out.pass_, idx, s.pass_)
        np.add.at(out.uniq, idx, s.uniq)
        np.add.at(out.nsnp, idx, s.nsnp)
        np.add.at(out.llks, idx, np.asarray(s.llks, np.float64))
        np.add.at(out.llk0s, idx, np.asarray(s.llk0s, np.float64))
        np.add.at(out.llk_ab, idx, np.asarray(s.llk_ab, np.float64))
        np.add.at(out.llk_00, idx, np.asarray(s.llk_00, np.float64))
    return out


def gather_results_sum(local: ShardResult) -> Optional[ShardResult]:
    """All-gather genome-shard results and SUM-merge by barcode; merged
    result on process 0, None elsewhere."""
    import jax

    if jax.process_count() == 1:
        return merge_shards_sum([local])

    from jax.experimental import multihost_utils as mhu

    n = len(local.barcodes)
    bc = _encode_barcodes(local.barcodes)
    counts = mhu.process_allgather(np.asarray([n], dtype=np.int64))
    nmax = int(max(counts.max(), 1))

    def pad(a):
        out = np.zeros((nmax,) + a.shape[1:], dtype=a.dtype)
        out[: len(a)] = a
        return out

    fields = [
        bc.astype(np.int32), local.totl, local.pass_, local.uniq, local.nsnp,
        local.llks, local.llk0s, local.llk_ab, local.llk_00,
    ]
    gathered = [mhu.process_allgather(pad(np.asarray(f))) for f in fields]
    if jax.process_index() != 0:
        return None
    shards = []
    for p in range(jax.process_count()):
        np_ = int(counts[p])
        g = [arr[p][:np_] for arr in gathered]
        names = [
            bytes(row.astype(np.uint8)).rstrip(b"\x00").decode()
            for row in g[0]
        ]
        shards.append(ShardResult(
            barcodes=names, totl=g[1], pass_=g[2], uniq=g[3], nsnp=g[4],
            llks=g[5], llk0s=g[6], llk_ab=g[7], llk_00=g[8],
        ))
    return merge_shards_sum(shards)
