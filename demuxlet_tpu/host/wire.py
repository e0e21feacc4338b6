"""Wire format v2: the packed H2D block encoding (round-5 top item).

The v1 wire (engine._to_wire) ships 8-bit observation codes and 8-bit
slot-id deltas — 3,151 B/barcode at the 100K e2e shape, THE binding
constraint on the tunneled link (E2E_r04.json: ~80 MB/s H2D = 25K
barcodes/s ceiling). v2 cuts the two dominant sections:

* codes: a per-RUN sorted dictionary of the distinct observation codes
  actually present (real droplet data has few: modern sequencers bin
  base qualities to ~4 values, so dict sizes of 8-16 are typical; the
  tutorial data has ~#distinct-BQ x 2 alleles). Wire codes are dict
  indices packed at 4/6/8 bits. The dictionary never ships per block:
  the engine gathers the LUT row subset once (sorted order keeps f32
  reduction order stable and the exact path's selection bit-exact), so
  the device kernels consume dict indices directly — the one-hot fronts
  get NARROWER (fewer rows), a speedup on top of the byte cut.
  Wire code space: [0, n) real codes, n = the empty-valid marker
  (v1's 254: a covered slot whose observations were all allele==2,
  cmd_cram_demuxlet.cpp:435), n+1 = none (v1's 255).
* slot-id deltas: 4/6/8-bit with the v1 escape mechanism generalized —
  stored min(d, E), E = 2^w - 1, excess restored from the sparse
  (fix_pos, fix_val) list the device already scatter-adds before the
  cumsum (pallas_pair.unpack_block_inputs).
* UMI lanes: the v1 plane count U is the BLOCK MAX per-slot observation
  count — one PCR-hot slot forces U=8 dense planes shipping ~85%
  255-sentinels on realistic (mean ~1.1 UMIs/slot) data. v2 caps the
  dense planes at a per-run U0 and ships the rare deeper lanes as a
  sparse (u16 position, u8 code) tail list the device scatters into
  place. probe_wire_v2.py killed the alternatives: a per-row
  take_along_axis stream reconstruction costs 40-47 ms/block on v5e,
  while .at[].set scatter scales ~10 us/entry-row — fine for the
  realistic tail counts (<=128/cell -> ~1.2 ms), so U0 is chosen to
  keep the expected tail small.

Layout per row (all sections i32-lane aligned; one buffer per block —
the tunneled transport charges ~30 ms fixed per H2D array):

  [codes S*U0*cw/8 B] [tail_pos 2*K2 B] [tail_code K2 B (4-pad)]
  [deltas S*dw/8 B] [base 4B] [fix_pos 4K B] [fix_val 4K B]

The bit packers here are the host reference implementation (numpy) and
the fallback when the native prep is absent; device decode lives in
pallas_pair.unpack_block_inputs (probe_wire_v2.py: nibble 0.14 ms,
6-bit 0.25 ms per 2048x1024x2 block — as cheap as the v1 bitcast).

Measured dead end (probe_wire_v2.py, round 5): per-block unique-SNP
compaction of the gps gather table — gathering (B, S) rows from a
compacted (4K, 28) table costs the SAME 5.3-5.5 ms as from the full
(50K, 28) table on v5e; the gather is output-materialization/row-
transaction-bound, not table-residency-bound, so local-id remapping
buys no device time (only marginally smaller deltas).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import numpy as np


@dataclass(frozen=True)
class WireCfg:
    """Per-RUN wire configuration (static: one compiled variant per
    slot-shape bucket, like v1 — per-block adaptivity would multiply
    the remote-compile cost by the config count)."""

    dict_codes: Tuple[int, ...]  # sorted distinct global codes present
    code_w: int  # bits per wire code: 4, 6, or 8
    delta_w: int  # bits per slot-id delta: 4, 6, 8, or 16
    u_cap: int = 8  # dense UMI lanes; deeper lanes ride the sparse tail
    # adaptive=True (production): the packer picks U0 per (S, U) shape
    # key from the first such block's occupancy (the run-level sample
    # misprices heterogeneous blocks — the round-5 realistic e2e found
    # a top-coverage block paying 2.5x in max-padded tails under the
    # global choice); the engine's meta registry then pins it so
    # same-key blocks share one compiled variant. u_cap seeds the
    # non-adaptive path. Tests pin layouts with adaptive=False.
    adaptive: bool = True

    @property
    def n_real(self) -> int:
        return len(self.dict_codes)

    @property
    def marker(self) -> int:  # the v1-254 empty-valid marker
        return self.n_real

    @property
    def none(self) -> int:  # the v1-255 no-observation value
        return self.n_real + 1

    def code_lut(self) -> np.ndarray:
        """(256,) u8 map: v1 code byte -> wire code."""
        lut = np.full(256, self.none, dtype=np.uint8)
        lut[list(self.dict_codes)] = np.arange(self.n_real, dtype=np.uint8)
        lut[254] = self.marker
        return lut


def size_bucket(n: int, lo: int) -> int:
    """Smallest {2^k, 3*2^(k-1)} ladder value >= n, from lo up (lo a
    power of two; half-steps start at 3*lo so every value stays a
    multiple of lo). The tail/fix planes pad per cell to the BLOCK max
    entry count: pure pow2 rounding wastes up to 2x there (round-5
    realistic probe_tail_pad: K2p need 1089 -> 2048), the half-pow2
    ladder caps it at 1.5x for at most one extra compiled variant per
    shape key. lo=16 keeps K2p a multiple of 16 (i32-lane alignment of
    the cw-packed tail codes at every cw), lo=8 likewise for Kp."""
    b = lo
    while b < n:
        h = b + b // 2
        if b >= 2 * lo and h >= n:
            return h
        b *= 2
    return b


def _width_for(n_values: int) -> int:
    if n_values <= 16:
        return 4
    if n_values <= 64:
        return 6
    return 8


def choose_cfg(csr, cap_bq: int, sample_cells: int = 1024) -> WireCfg:
    """Pick the run's wire config from the pileup's own statistics.

    dict: exact distinct-code set (a chunked bincount pass over all
    observations — the dict MUST cover every code, there is no escape
    for codes). delta width: total-cost model over {4, 6, 8, 16} bits
    (payload + escape fraction x 6-byte fix entry). u_cap: minimizes
    wire-bytes + scatter-cost over the sampled per-slot occupancy
    histogram (tail entries cost ~3 wire B + ~10 us/entry of device
    scatter ~ 0.8 equivalent link B at 80 MB/s -> weight 5.4); with
    cfg.adaptive the packer refines U0 per block-shape key from the
    actual block data.
    """
    nq = cap_bq + 1
    counts = np.zeros(3 * nq + 1, dtype=np.int64)
    n = len(csr.obs_snp)
    step = 16 << 20
    b16 = np.empty(min(step, n), dtype=np.uint16)
    b8 = np.empty(min(step, n), dtype=np.uint8)
    for lo in range(0, n, step):
        al = csr.obs_allele[lo : lo + step]
        bq = csr.obs_bq[lo : lo + step]
        m = len(al)
        # narrow-int arithmetic into reused buffers (the chunked pass
        # runs over up to ~2e8 observations; fancy-index copies and
        # int64 temps measured ~10x slower on this first-touch-bound
        # host): code = al*nq + min(bq, cap); al == 2 rows land in
        # [2nq, 3nq) and are dropped by the final < 2nq slice
        np.multiply(al, np.uint16(nq), out=b16[:m], casting="unsafe")
        np.minimum(bq, np.uint8(cap_bq), out=b8[:m])
        np.add(b16[:m], b8[:m], out=b16[:m], casting="unsafe")
        counts += np.bincount(b16[:m], minlength=len(counts))
    dict_codes = tuple(int(c) for c in np.flatnonzero(counts[: 2 * nq]))
    code_w = _width_for(len(dict_codes) + 2)

    # sampled per-cell run structure over the first `sample_cells` cells
    ncells = min(csr.nbcs, sample_cells)
    hi = int(csr.cell_ptr[ncells])
    snp = csr.obs_snp[:hi]
    if len(snp) > 1:
        new_cell = np.zeros(len(snp), dtype=bool)
        starts = csr.cell_ptr[:ncells][np.diff(csr.cell_ptr[: ncells + 1]) > 0]
        new_cell[starts] = True
        d = np.diff(snp.astype(np.int64))
        keep = (~new_cell[1:]) & (d > 0)  # in-cell slot transitions
        dsamp = d[keep]
        run_start = np.ones(len(snp), dtype=bool)
        run_start[1:] = (d != 0) | new_cell[1:]
        starts_idx = np.flatnonzero(run_start)
        occ = np.diff(np.append(starts_idx, len(snp)))
    else:
        dsamp = np.zeros(0, np.int64)
        occ = np.ones(1, np.int64)
    # delta width by TOTAL expected bytes/slot: w/8 payload + escape
    # fraction x 6-byte fix entry (u16 pos + i32 val). A threshold rule
    # ("escapes <= 1/16") mispriced clustered real data, where in-gene
    # deltas are tiny but every gene jump escapes at ANY width <= 8 —
    # the cost model picks 4-bit there (round-5 e2e diagnosis).
    delta_w = 8
    if len(dsamp):
        best = None
        for w in (4, 6, 8, 16):
            cost = w / 8.0 + float(
                (dsamp > (1 << w) - 1).mean()) * 6.0
            if best is None or cost < best:
                best, delta_w = cost, w

    # u_cap: per sampled slot, dense lanes cost u_cap*code_w/8 bytes;
    # lanes beyond it cost ~5.4 equivalent bytes each (3 wire + scatter)
    nslots = max(len(occ), 1)
    best, u_cap = None, 8
    for cand in (1, 2, 4, 8):
        dense = nslots * cand * code_w / 8.0
        tail = float(np.maximum(occ - cand, 0).sum()) * 5.4
        cost = dense + tail
        if best is None or cost < best:
            best, u_cap = cost, cand
    return WireCfg(dict_codes=dict_codes, code_w=code_w, delta_w=delta_w,
                   u_cap=u_cap)


# ---------------------------------------------------------- bit packing


def pack_bits(a: np.ndarray, width: int) -> np.ndarray:
    """(B, N) small-int u8 -> (B, N*width/8) u8. width in {4, 6, 8};
    N % 16 == 0 (block slot axes are 128-multiples)."""
    B, N = a.shape
    if width == 8:
        return np.ascontiguousarray(a)
    if width == 4:
        a2 = a.reshape(B, N // 2, 2).astype(np.uint8)
        return np.ascontiguousarray(a2[:, :, 0] | (a2[:, :, 1] << 4))
    if width == 6:
        a4 = a.reshape(B, N // 4, 4).astype(np.uint16)
        b0 = (a4[:, :, 0] | (a4[:, :, 1] << 6)) & 0xFF
        b1 = ((a4[:, :, 1] >> 2) | (a4[:, :, 2] << 4)) & 0xFF
        b2 = ((a4[:, :, 2] >> 4) | (a4[:, :, 3] << 2)) & 0xFF
        return np.ascontiguousarray(
            np.stack([b0, b1, b2], axis=-1).reshape(B, -1).astype(np.uint8)
        )
    raise ValueError(width)


def unpack_bits(p: np.ndarray, width: int, n: int) -> np.ndarray:
    """Host-side inverse of pack_bits (tests + oracle use)."""
    B = p.shape[0]
    if width == 8:
        return p[:, :n]
    if width == 4:
        lo = p & 0x0F
        hi = p >> 4
        return np.stack([lo, hi], axis=-1).reshape(B, -1)[:, :n]
    if width == 6:
        b = p.reshape(B, -1, 3).astype(np.uint16)
        q0 = b[:, :, 0] & 63
        q1 = ((b[:, :, 0] >> 6) | (b[:, :, 1] << 2)) & 63
        q2 = ((b[:, :, 1] >> 4) | (b[:, :, 2] << 4)) & 63
        q3 = b[:, :, 2] >> 2
        return (
            np.stack([q0, q1, q2, q3], axis=-1)
            .reshape(B, -1)[:, :n]
            .astype(np.uint8)
        )
    raise ValueError(width)


# ------------------------------------------------------------- packing


def _ragged_fill(mask_rows: np.ndarray):
    """(B, N) bool -> (rows, within-row rank, per-row counts): the fix-
    list fill pattern shared by delta escapes and the UMI tail."""
    counts = mask_rows.sum(axis=1)
    rows, cols = np.nonzero(mask_rows)
    rank = np.concatenate(
        [np.arange(k) for k in counts if k]
    ).astype(np.int64) if counts.sum() else np.zeros(0, np.int64)
    return rows, cols, rank, counts


def _tail_width(S: int, U: int, u0: int) -> int:
    """Tail position width in bits: 16 = flat u16 pos (cheapest), 24 =
    (slot u16, lane u8) split planes when the flat space outgrows u16
    but the lane index fits u8, 32 = flat i32 (deep-U pathology)."""
    if S * (U - u0) <= 0xFFFF:
        return 16
    return 24 if U - u0 <= 0xFF else 32


def _choose_u0(wc: np.ndarray, cfg: WireCfg) -> int:
    """Per-block dense-lane cap by wire-byte cost: dense lanes cost
    S*code_w/8 per lane; each tail entry costs pos+code bytes at the
    BLOCK-MAX padded count (the real cost — every cell pays the padded
    lanes). Candidates are powers of two up to U."""
    B, S, U = wc.shape
    occupied = wc != cfg.none  # (B, S, U)
    lane_counts = occupied.sum(axis=1)  # (B, U) entries per lane
    best_u0, best_cost = U, S * U * cfg.code_w / 8.0
    u0 = 1
    while u0 < U:
        tails = lane_counts[:, u0:].sum(axis=1)
        K2 = int(tails.max()) if B else 0
        # same 16-floor + half-pow2 ladder as _split_tail / the native
        # wrapper (the cost model must price the shipped layout)
        K2p = size_bucket(max(K2, 1), 16)
        tw = _tail_width(S, U, u0)
        cost = (S * u0 * cfg.code_w / 8.0
                + K2p * (tw / 8.0 + cfg.code_w / 8.0))
        if cost < best_cost:
            best_u0, best_cost = u0, cost
        u0 *= 2
    return best_u0


def _split_tail(wc: np.ndarray, cfg: WireCfg, u0_pin=None,
                k2p_floor=16):
    """(B, S, U) wire codes -> (dense (B,S,U0), U0, K2p, tw, tail_pos,
    tail_code): the dense-lane cap + sparse deep tail. tw = tail
    position width (16, or 32 when the tail plane outgrows u16
    addressing — big-S deep-U blocks; a round-5 e2e diagnosis caught
    the old fallback-to-dense shipping 128 KB/cell there). Tail codes
    pack at code_w bits like the dense planes. u0_pin / k2p_floor:
    the engine's meta registry harmonizes these across same-(S, U)
    blocks so the run compiles a bounded set of shapes."""
    B, S, U = wc.shape
    if u0_pin is not None:
        U0 = u0_pin
    else:
        U0 = _choose_u0(wc, cfg) if cfg.adaptive else min(cfg.u_cap, U)
    if U == U0:
        return wc, U0, 0, 16, None, None
    tw = _tail_width(S, U, U0)
    deep = wc[:, :, U0:]  # (B, S, U-U0)
    tmask = (deep != cfg.none).reshape(B, -1)
    rows, cols, rank, counts = _ragged_fill(tmask)
    K2 = int(counts.max()) if B else 0
    # 16-floor keeps the code_w-packed tail-code bytes lane-aligned;
    # half-pow2 ladder (size_bucket) caps max-padding at 1.5x
    K2p = size_bucket(max(K2, k2p_floor, 1), 16)
    # pad entries point past the tail plane: the device scatter drops
    # out-of-bounds rows (mode="drop"); the pad value stays OOB because
    # S*(U-U0) <= 0xFFFF was checked for tw == 16. tw == 24 ships
    # (slot u16, lane u8) planes — 3 B/entry where the flat i32 form
    # needs 4 — with pad slot = S (u16-safe: S <= 0xFFFF; device
    # rebuilds flat pos = slot*(U-U0) + lane, so the pad decodes to
    # the same S*(U-U0) OOB sentinel as tw == 32)
    if tw == 16:
        tail_pos = np.full((B, K2p), 0xFFFF, dtype=np.uint16)
    elif tw == 24:
        tail_slot = np.full((B, K2p), S, dtype=np.uint16)
        tail_lane = np.zeros((B, K2p), dtype=np.uint8)
        tail_pos = (tail_slot, tail_lane)
    else:
        tail_pos = np.full((B, K2p), S * (U - U0), dtype=np.int32)
    tail_code = np.full((B, K2p), cfg.none, dtype=np.uint8)
    if K2:
        if tw == 24:
            tail_slot[rows, rank] = (cols // (U - U0)).astype(np.uint16)
            tail_lane[rows, rank] = (cols % (U - U0)).astype(np.uint8)
        else:
            tail_pos[rows, rank] = cols.astype(tail_pos.dtype)
        tail_code[rows, rank] = deep.reshape(B, -1)[rows, cols]
    dense = wc[:, :, :U0].copy()
    # marker rule: a slot whose real codes live ONLY in deep lanes
    # (dense lanes all holes) gets the marker in lane 0, so the device
    # mask derives from the dense lanes alone (the fast front never
    # reconstructs deep lanes — it scatter-adds the tail into the count
    # tensor). The marker maps to the zero/none LUT row, contributing
    # nothing, exactly like the hole it replaces.
    only_deep = (dense == cfg.none).all(axis=-1) & (
        deep != cfg.none).any(axis=-1)
    if only_deep.any():
        b, s = np.nonzero(only_deep)
        dense[b, s, 0] = cfg.marker
    return dense, U0, K2p, tw, tail_pos, tail_code


def _pack_deltas(d: np.ndarray, cfg: WireCfg, kp_floor=8):
    """Full (B, S) i64 deltas -> (dsm, delta_w, Kp, fix_pos u16,
    fix_val i32) with the generalized escape: stored min(d, E),
    E = 2^delta_w - 1. Fix entries cost 6 bytes (slot positions fit
    u16: S <= 65535)."""
    B, S = d.shape
    # u16 fix positions bound the slot axis at 65535; pack_wire_block
    # returns None above this (engine falls back to the v1 wire)
    assert S <= 0xFFFF
    # width is a PER-RUN choice (choose_cfg's cost model): per-block
    # width adaptation multiplied the compiled-shape count — every
    # distinct meta costs a fresh ~5-10 s jit on the remote backend
    # (round-5 realistic e2e: 50 blocks -> ~50 compiles, 263 s engine)
    delta_w = cfg.delta_w
    E = (1 << delta_w) - 1
    rows, cols, rank, n_over = _ragged_fill(d > E)
    K = int(n_over.max()) if B else 0
    Kp = size_bucket(max(K, kp_floor, 1), 8)
    fix_pos = np.zeros((B, Kp), dtype=np.uint16)
    fix_val = np.zeros((B, Kp), dtype=np.int32)
    if K:
        fix_pos[rows, rank] = cols.astype(np.uint16)
        fix_val[rows, rank] = (d[rows, cols] - E).astype(np.int32)
    dt = np.uint16 if delta_w == 16 else np.uint8
    return np.minimum(d, E).astype(dt), delta_w, Kp, fix_pos, fix_val


def _assemble(wc, base, d, cfg: WireCfg, floors=None):
    """Wire codes (with markers placed) + full deltas -> (wire, meta).
    floors = (u0_pin, k2p_floor, kp_floor) from the engine's meta
    registry (shape-bucketing: same-(S, U) blocks share one compiled
    variant unless a block genuinely outgrows it)."""
    B, S, U = wc.shape
    assert int(wc.max(initial=0)) < (1 << cfg.code_w), (
        "dict does not cover the block's codes"
    )
    u0_pin, k2p_floor, kp_floor = floors if floors else (None, 16, 8)
    dense, U0, K2p, tw, tail_pos, tail_code = _split_tail(
        wc, cfg, u0_pin=u0_pin, k2p_floor=k2p_floor)
    dsm, dw, Kp, fix_pos, fix_val = _pack_deltas(d, cfg,
                                                 kp_floor=kp_floor)
    parts = [pack_bits(dense.reshape(B, S * U0), cfg.code_w).view(np.int32)]
    if K2p:
        if tw == 24:  # (slot u16, lane u8) planes
            tail_slot, tail_lane = tail_pos
            parts.append(np.ascontiguousarray(tail_slot).view(np.int32))
            parts.append(np.ascontiguousarray(tail_lane).view(np.int32))
        else:
            parts.append(np.ascontiguousarray(tail_pos).view(np.int32))
        parts.append(pack_bits(tail_code, cfg.code_w).view(np.int32))
    if dw == 16:
        parts.append(np.ascontiguousarray(dsm).view(np.int32))
    else:
        parts.append(pack_bits(dsm, dw).view(np.int32))
    parts += [
        base[:, None],
        np.ascontiguousarray(fix_pos).view(np.int32),
        fix_val,
    ]
    wire = np.concatenate(parts, axis=1)
    meta = ("w2", S, U, U0, K2p, Kp, cfg.code_w, dw, cfg.n_real, tw)
    return wire, meta


def pack_wire_block(codes: np.ndarray, idx: np.ndarray, msk: np.ndarray,
                    cfg: WireCfg, floors=None):
    """build_codes_block output -> (wire (B, W) i32, meta) in v2 form.

    Python reference packer (the engine's native path calls
    native/prep.pack_block_v2, which must emit identical bytes;
    pack_from_shrunk covers the shrunk-form route in tests).
    meta = ("w2", S, U, U0, K2p, Kp, code_w, delta_w, n_real, tw) —
    the static half of the jit key; see
    pallas_pair.unpack_block_inputs for the device decode. U is the
    block's full lane count (reconstruction shape), U0 the dense lanes;
    lanes >= U0 with a real code ship as (u16 pos, u8 code) tail
    entries (255 holes in deep lanes need no entry — the tail plane
    fills with none). Reconstruction is lane-position-exact, so device
    results are bit-identical to the v1 dense form in both modes.
    """
    B, S, U = codes.shape
    if S > 0xFFFF:
        return None  # u16 fix/tail positions can't address the slots
    wc = cfg.code_lut()[codes]
    # empty-valid slots: all observations dropped (allele==2) -> marker
    # in lane 0 (engine._shrink_codes_blk semantics)
    empty = msk & (wc == cfg.none).all(axis=-1)
    if empty.any():
        b, s = np.nonzero(empty)
        wc[b, s, 0] = cfg.marker
    d = np.zeros_like(idx, dtype=np.int64)
    d[:, 1:] = np.diff(idx.astype(np.int64), axis=1)
    d[~msk] = 0  # masked slots (padding suffix) contribute zero deltas
    assert (d >= 0).all(), "slot ids must be per-cell sorted"
    return _assemble(wc, idx[:, 0].astype(np.int32), d, cfg, floors)


def pack_from_shrunk(codes: np.ndarray, d8: np.ndarray, base: np.ndarray,
                     fix_pos: np.ndarray, fix_val: np.ndarray,
                     cfg: WireCfg, floors=None):
    """Native-prep (v1 shrunk) output -> v2 wire: codes already carry
    the 254 markers (cfg.code_lut maps 254 -> marker), the full deltas
    reconstruct from the u8 stream + its 255-escape fixes, then repack
    at the configured width."""
    d = d8.astype(np.int64)
    np.add.at(d, (np.arange(d.shape[0])[:, None], fix_pos), fix_val)
    return _assemble(cfg.code_lut()[codes], base.astype(np.int32), d,
                     cfg, floors)
