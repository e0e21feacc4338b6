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


def gather_results(local: ShardResult, max_bc_len: int = 32) -> Optional[ShardResult]:
    """All-gather shard results across processes; returns the merged result
    on process 0 and None elsewhere. Single-process: identity."""
    import jax

    if jax.process_count() == 1:
        return merge_shards([local])

    from jax.experimental import multihost_utils as mhu

    # fixed-width byte encoding for the barcode strings
    n = len(local.barcodes)
    bc = np.zeros((n, max_bc_len), dtype=np.uint8)
    for i, b in enumerate(local.barcodes):
        raw = b.encode()[:max_bc_len]
        bc[i, : len(raw)] = np.frombuffer(raw, dtype=np.uint8)

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
