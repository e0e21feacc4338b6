// Native single-pass block prep for the device fast/exact wire path.
//
// Replaces host/csr.py::build_codes_block + engine._shrink_codes_blk on
// the production path: one walk over the block's CSR observation slice
// emits the SHRUNK form directly — per-UMI codes (u8, 255 = none, 254 =
// the empty-valid marker), u8 slot-id deltas with a sparse >255 fix list,
// and the per-cell base id. The numpy pipeline makes ~10 temporary
// array passes per block (measured 215 ms/2048-cell block at 1000
// slots/cell) and was the warm end-to-end bottleneck
// (benchmarks/probe_block_marginal.py: prep 279 ms vs H2D+step 167 ms).
//
// Semantics mirror the Python path BIT-FOR-BIT (pinned by
// tests/test_native.py::test_native_prep_matches_python), including
// code placement: a code lands at its observation's index within the
// slot counted over ALL observations, so dropped allele==2 entries
// leave 255 holes exactly like build_codes_block. Identical arrays in
// guarantee identical device results in BOTH modes on any host, with
// or without the native library (the exact pair-LUT front pairs codes
// two-at-a-time, so even hole-position changes would shift df ulps).
//   * slots = runs of equal snp id within a (cell,snp)-sorted CSR slice
//     (sc_drop_seq.cpp:62-65's dual map, flattened)
//   * allele==2 observations are dropped; a valid slot left with no
//     codes carries 254 in lane 0 (uniform-GL term,
//     cmd_cram_demuxlet.cpp:435 semantics)
//   * code = allele * (cap_bq+1) + min(bq, cap_bq)
//   * d8[s] = min(snp[s] - snp[s-1], 255), fixes restore the excess
//
// dmx_prep_dims returns the block's slot/umi/fix maxima; the caller
// buckets them (Sp, U, Kp) and calls dmx_prep_fill into preallocated
// arrays. flags bit0 = a negative delta was seen (unsorted input —
// caller must fall back to the Python path).

#include <cstdint>
#include <cstring>

extern "C" {

int dmx_prep_dims(const int64_t* cell_ptr, const int32_t* obs_snp,
                  const uint8_t* obs_allele, const int64_t* ids,
                  int64_t B, int64_t* out /* smax, umax, kmax, flags */) {
    int64_t smax = 0, umax = 0, kmax = 0, flags = 0;
    for (int64_t r = 0; r < B; ++r) {
        const int64_t a = cell_ptr[ids[r]], b = cell_ptr[ids[r] + 1];
        int64_t nslots = 0, nover = 0, run = 0, runmax = 0;
        int32_t prev = 0;
        for (int64_t i = a; i < b; ++i) {
            const int32_t s = obs_snp[i];
            if (i == a || s != prev) {
                if (nslots > 0) {
                    const int64_t d = (int64_t)s - (int64_t)prev;
                    if (d < 0) flags |= 1;
                    if (d > 255) ++nover;
                }
                ++nslots;
                if (run > runmax) runmax = run;
                run = 0;
                prev = s;
            }
            /* UMI width counts ALL slot observations (incl. dropped
             * allele==2) — matches build_codes_block's occ, keeping the
             * U bucket and code placement bit-identical to Python */
            ++run;
        }
        if (run > runmax) runmax = run;
        if (nslots > smax) smax = nslots;
        if (runmax > umax) umax = runmax;
        if (nover > kmax) kmax = nover;
    }
    out[0] = smax;
    out[1] = umax;
    out[2] = kmax;
    out[3] = flags;
    return 0;
}

int dmx_prep_fill(const int64_t* cell_ptr, const int32_t* obs_snp,
                  const uint8_t* obs_allele, const uint8_t* obs_bq,
                  const int64_t* ids, int64_t B,
                  int64_t cap_bq, int64_t Sp, int64_t U, int64_t Kp,
                  int64_t Bp,
                  uint8_t* codes /* (Bp, Sp, U) */,
                  uint8_t* d8 /* (Bp, Sp) */,
                  int32_t* base /* (Bp,) */,
                  int32_t* fix_pos /* (Bp, Kp) */,
                  int32_t* fix_val /* (Bp, Kp) */) {
    const uint8_t cap = (uint8_t)cap_bq;
    const int64_t nq = cap_bq + 1;
    memset(codes, 0xFF, (size_t)(Bp * Sp * U));
    memset(d8, 0, (size_t)(Bp * Sp));
    memset(base, 0, (size_t)(Bp * 4));
    memset(fix_pos, 0, (size_t)(Bp * Kp * 4));
    memset(fix_val, 0, (size_t)(Bp * Kp * 4));
    for (int64_t r = 0; r < B; ++r) {
        const int64_t a = cell_ptr[ids[r]], b = cell_ptr[ids[r] + 1];
        uint8_t* crow = codes + r * Sp * U;
        uint8_t* drow = d8 + r * Sp;
        int32_t* fprow = fix_pos + r * Kp;
        int32_t* fvrow = fix_val + r * Kp;
        int64_t s = -1, occ = 0, k = 0;
        int32_t prev = 0;
        bool has_code = false;
        for (int64_t i = a; i < b; ++i) {
            const int32_t snp = obs_snp[i];
            if (s < 0 || snp != prev) {
                if (s >= 0) {
                    if (!has_code) crow[s * U] = 254;
                    const int64_t d = (int64_t)snp - (int64_t)prev;
                    drow[s + 1] = (uint8_t)(d > 255 ? 255 : d);
                    if (d > 255) {
                        fprow[k] = (int32_t)(s + 1);
                        fvrow[k] = (int32_t)(d - 255);
                        ++k;
                    }
                } else {
                    base[r] = snp;
                }
                ++s;
                occ = 0;
                has_code = false;
                prev = snp;
            }
            const uint8_t al = obs_allele[i];
            if (al < 2) {
                const uint8_t q = obs_bq[i] > cap ? cap : obs_bq[i];
                crow[s * U + occ] = (uint8_t)(al * nq + q);
                has_code = true;
            }
            ++occ; /* every observation advances the lane (255 holes) */
        }
        if (s >= 0 && !has_code) crow[s * U] = 254;
    }
    return 0;
}

}  // extern "C"
