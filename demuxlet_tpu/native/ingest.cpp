// Native host-ingest: BGZF/BAM streaming pileup for demuxlet-tpu.
//
// TPU-native replacement for the reference's ingest stack
// (sam_filtered_reader.cpp + hts_utils.cpp:279-359 + sc_drop_seq.cpp), built
// from scratch without htslib: a zlib-based BGZF block reader, a BAM record
// parser, and a single-pass coordinate-sweep pileup with streaming per-SNP
// finalization (the reference instead keeps every (snp,cell)->umi map alive
// for the whole run).
//
// Semantics mirrored exactly (parity contract, see io/bam.py + host/pileup.py
// which implement the same rules in Python and are cross-checked by tests):
//   * MQ/flag filter: mapq < minMQ || (flag & exclFlag)  -> skip
//   * CIGAR walk per (read, SNP): only 'M' consumes read+ref; 'D'/'N' consume
//     ref (no base); 'S'/'I' consume read; 'H','P','=','X' advance nothing
//     (quirk of hts_utils.cpp:304-328 kept for parity).
//   * skip base 'N'; BQ < minBQ; tail-distance (rpos < minTD-1 ||
//     rpos+minTD > l_qseq); allele = ref?0 : alt?1 : 2; bq = min(BQ, capBQ)
//   * UMI dedup: first (snp, cell, umi) occurrence wins; repeats counted as
//     redundant; per-read accounting counters identical to
//     cmd_cram_demuxlet.cpp:295-361.
//
// Threading: BGZF blocks are inflated by a worker pool (blocks are
// independent gzip members); record parsing + pileup stay on one thread,
// preserving file order (required for first-seen barcode ids and
// first-occurrence UMI dedup).

#include <zlib.h>

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <thread>
#include <unordered_map>
#include <unordered_set>
#include <vector>

namespace {

// ---------------------------------------------------------------- errors
struct IngestError {
  std::string msg;
};

static void fail(const std::string& m) { throw IngestError{m}; }

// ---------------------------------------------------------------- BGZF
// A BGZF file is a series of gzip members whose extra field carries the
// compressed block size (BC subfield). We parse headers sequentially (cheap)
// and inflate payloads on a thread pool.
struct BgzfBlock {
  size_t comp_off;   // offset of deflate payload in file buffer
  size_t comp_len;   // CDATA length
  uint32_t isize;    // uncompressed size
};

class BgzfReader {
 public:
  explicit BgzfReader(const char* path, int n_threads) {
    FILE* f = fopen(path, "rb");
    if (!f) fail(std::string("cannot open ") + path);
    fseek(f, 0, SEEK_END);
    long sz = ftell(f);
    fseek(f, 0, SEEK_SET);
    buf_.resize((size_t)sz);
    if (sz > 0 && fread(buf_.data(), 1, (size_t)sz, f) != (size_t)sz) {
      fclose(f);
      fail(std::string("short read on ") + path);
    }
    fclose(f);
    parse_blocks(path);
    inflate_all(n_threads);
  }

  const std::vector<uint8_t>& data() const { return out_; }

 private:
  void parse_blocks(const char* path) {
    size_t off = 0;
    const size_t n = buf_.size();
    while (off + 18 <= n) {
      const uint8_t* p = &buf_[off];
      if (p[0] != 0x1f || p[1] != 0x8b) fail(std::string(path) + ": bad gzip magic");
      const uint8_t flg = p[3];
      size_t hdr = 10;
      uint32_t bsize = 0;
      if (flg & 4) {  // FEXTRA
        uint16_t xlen = (uint16_t)(p[10] | (p[11] << 8));
        size_t xoff = 12, xend = 12 + xlen;
        while (xoff + 4 <= xend) {
          uint8_t si1 = p[xoff], si2 = p[xoff + 1];
          uint16_t slen = (uint16_t)(p[xoff + 2] | (p[xoff + 3] << 8));
          if (si1 == 'B' && si2 == 'C' && slen == 2)
            bsize = (uint32_t)(p[xoff + 4] | (p[xoff + 5] << 8)) + 1;
          xoff += 4 + slen;
        }
        hdr = xend;
      }
      if (bsize == 0) fail(std::string(path) + ": not BGZF (no BC subfield)");
      if (off + bsize > n) fail(std::string(path) + ": truncated BGZF block");
      const uint8_t* tail = &buf_[off + bsize - 4];
      uint32_t isize = (uint32_t)(tail[0] | (tail[1] << 8) | (tail[2] << 16) |
                                  ((uint32_t)tail[3] << 24));
      BgzfBlock b;
      b.comp_off = off + hdr;
      b.comp_len = bsize - hdr - 8;
      b.isize = isize;
      blocks_.push_back(b);
      off += bsize;
    }
    size_t total = 0;
    offsets_.reserve(blocks_.size() + 1);
    for (auto& b : blocks_) {
      offsets_.push_back(total);
      total += b.isize;
    }
    offsets_.push_back(total);
    out_.resize(total);
  }

  void inflate_all(int n_threads) {
    std::atomic<size_t> next{0};
    std::atomic<bool> bad{false};
    auto work = [&]() {
      z_stream zs;
      memset(&zs, 0, sizeof(zs));
      if (inflateInit2(&zs, -15) != Z_OK) {
        bad = true;
        return;
      }
      for (;;) {
        size_t i = next.fetch_add(1);
        if (i >= blocks_.size()) break;
        const BgzfBlock& b = blocks_[i];
        if (b.isize == 0) continue;
        inflateReset(&zs);
        zs.next_in = const_cast<Bytef*>(&buf_[b.comp_off]);
        zs.avail_in = (uInt)b.comp_len;
        zs.next_out = &out_[offsets_[i]];
        zs.avail_out = b.isize;
        int rc = inflate(&zs, Z_FINISH);
        if (rc != Z_STREAM_END || zs.avail_out != 0) {
          bad = true;
          break;
        }
      }
      inflateEnd(&zs);
    };
    if (n_threads <= 1) {
      work();
    } else {
      std::vector<std::thread> ts;
      for (int t = 0; t < n_threads; ++t) ts.emplace_back(work);
      for (auto& t : ts) t.join();
    }
    if (bad.load()) fail("BGZF inflate failed");
    buf_.clear();
    buf_.shrink_to_fit();
  }

  std::vector<uint8_t> buf_;
  std::vector<BgzfBlock> blocks_;
  std::vector<size_t> offsets_;
  std::vector<uint8_t> out_;
};

// ---------------------------------------------------------------- pileup
constexpr const char* kSeqNt16 = "=ACMGRSVTWYHKDBN";

struct Obs {
  int32_t cell;
  int32_t snp;
  uint8_t allele;
  uint8_t bq;
};

struct PairHash {
  size_t operator()(const std::pair<int64_t, uint64_t>& k) const {
    uint64_t h = (uint64_t)k.first * 0x9E3779B97F4A7C15ull;
    h ^= k.second + 0x9E3779B97F4A7C15ull + (h << 6) + (h >> 2);
    return (size_t)h;
  }
};

static uint64_t hash_bytes(const uint8_t* s, size_t n) {
  uint64_t h = 1469598103934665603ull;  // FNV-1a 64
  for (size_t i = 0; i < n; ++i) {
    h ^= s[i];
    h *= 1099511628211ull;
  }
  return h;
}

struct ActiveSnp {
  // (cell, umi_hash) -> seen; value packs first-wins (allele, bq).
  std::unordered_map<std::pair<int64_t, uint64_t>, uint16_t, PairHash> umis;
};

struct Counters {
  int64_t n_read = 0, n_skip = 0, n_skip_bcd = 0, n_tmp = 0, n_multi_snps = 0;
  int64_t n_pass = 0, n_redundant = 0, n_lq = 0, n_n = 0;
  int64_t n_no_gtag = 0, n_no_utag = 0;
};

struct Result {
  std::vector<std::string> barcodes;
  std::vector<int64_t> cell_totl, cell_pass, cell_uniq;
  std::vector<Obs> obs;
  Counters ctr;
};

class Ingest {
 public:
  Ingest(int n_chroms, const char* chrom_concat, const int64_t* chrom_off,
         const int64_t* chrom_ptr, const int64_t* snp_pos,
         const int32_t* snp_ids, const uint8_t* snp_ref,
         const uint8_t* snp_alt, const char* tag_group, const char* tag_umi,
         int cap_bq, int min_bq, int min_td, int min_mq, int excl_flag,
         const char* grp_concat, const int64_t* grp_off, int64_t n_group)
      : chrom_ptr_(chrom_ptr),
        snp_pos_(snp_pos),
        snp_ids_(snp_ids),
        snp_ref_(snp_ref),
        snp_alt_(snp_alt),
        cap_bq_(cap_bq),
        min_bq_(min_bq),
        min_td_(min_td),
        min_mq_(min_mq),
        excl_flag_(excl_flag) {
    for (int i = 0; i < n_chroms; ++i)
      chrom_index_.emplace(
          std::string(chrom_concat + chrom_off[i],
                      (size_t)(chrom_off[i + 1] - chrom_off[i])),
          i);
    has_group_tag_ = tag_group && tag_group[0];
    has_umi_tag_ = tag_umi && tag_umi[0];
    if (has_group_tag_) memcpy(tg_, tag_group, 2);
    if (has_umi_tag_) memcpy(tu_, tag_umi, 2);
    if (grp_concat && n_group > 0) {
      use_group_set_ = true;
      for (int64_t i = 0; i < n_group; ++i)
        group_set_.emplace(std::string(grp_concat + grp_off[i],
                                       (size_t)(grp_off[i + 1] - grp_off[i])));
    }
  }

  void run_bam(const char* path, int n_threads) {
    BgzfReader rdr(path, n_threads);
    const std::vector<uint8_t>& d = rdr.data();
    size_t off = 0;
    parse_bam_header(d, off);
    const size_t n = d.size();
    while (off + 4 <= n) {
      uint32_t block_size;
      memcpy(&block_size, &d[off], 4);
      off += 4;
      if (off + block_size > n) fail("truncated BAM record");
      process_record(&d[off], block_size);
      off += block_size;
    }
    finalize_all();
  }

  Result take() { return std::move(res_); }

 private:
  void parse_bam_header(const std::vector<uint8_t>& d, size_t& off) {
    if (d.size() < 12 || memcmp(&d[0], "BAM\1", 4) != 0)
      fail("not a BAM file (bad magic)");
    off = 4;
    int32_t l_text;
    memcpy(&l_text, &d[off], 4);
    off += 4 + (size_t)l_text;
    int32_t n_ref;
    memcpy(&n_ref, &d[off], 4);
    off += 4;
    tid_to_chrom_.assign(n_ref, -1);
    for (int32_t i = 0; i < n_ref; ++i) {
      int32_t l_name;
      memcpy(&l_name, &d[off], 4);
      off += 4;
      std::string name((const char*)&d[off], (size_t)(l_name - 1));
      off += (size_t)l_name + 4;  // name + l_ref
      auto it = chrom_index_.find(name);
      if (it != chrom_index_.end()) tid_to_chrom_[i] = it->second;
    }
  }

  int32_t cell_id(const std::string& bcd) {
    auto it = bc_map_.find(bcd);
    if (it != bc_map_.end()) return it->second;
    int32_t id = (int32_t)res_.barcodes.size();
    bc_map_.emplace(bcd, id);
    res_.barcodes.push_back(bcd);
    res_.cell_totl.push_back(0);
    res_.cell_pass.push_back(0);
    res_.cell_uniq.push_back(0);
    return id;
  }

  // Streaming finalization: a SNP at pos p can only gain reads with
  // read.pos <= p; once the sweep's read.pos passes p, flush it.
  void finalize_before(int chrom, int64_t pos) {
    while (active_head_ < active_order_.size()) {
      auto [c, k] = active_order_[active_head_];
      if (c > chrom || (c == chrom && snp_pos_[k] >= pos)) break;
      flush_snp(c, k);
      ++active_head_;
    }
  }

  void flush_snp(int chrom, int64_t k) {
    auto it = active_.find(((int64_t)chrom << 40) | k);
    if (it == active_.end()) return;
    const int32_t sid = snp_ids_[k];
    for (auto& kv : it->second.umis) {
      Obs o;
      o.cell = (int32_t)kv.first.first;
      o.snp = sid;
      o.allele = (uint8_t)(kv.second >> 8);
      o.bq = (uint8_t)(kv.second & 0xff);
      res_.obs.push_back(o);
    }
    active_.erase(it);
  }

  void finalize_all() {
    for (size_t i = active_head_; i < active_order_.size(); ++i)
      flush_snp(active_order_[i].first, active_order_[i].second);
    active_order_.clear();
    active_head_ = 0;
  }

  // Replicates AlignedRead.base_qual_at (io/bam.py; hts_utils.cpp:279-359).
  static bool base_at(const uint8_t* cig, uint16_t n_cigar, int64_t read_pos,
                      int64_t gpos, int32_t l_qseq, const uint8_t* seq4,
                      const uint8_t* qual, char* base, int* bq, int32_t* rpos) {
    int64_t cpos = read_pos;
    int64_t rp = 0;
    bool hit = false;
    for (uint16_t i = 0; i < n_cigar; ++i) {
      uint32_t c;
      memcpy(&c, cig + 4 * i, 4);
      const uint32_t op = c & 0xF, ln = c >> 4;
      switch (op) {
        case 0:  // M
          if (cpos <= gpos && gpos <= cpos + (int64_t)ln - 1) {
            rp += gpos - cpos;
            hit = true;
            i = n_cigar;  // break out
            break;
          }
          cpos += ln;
          rp += ln;
          break;
        case 2:  // D
        case 3:  // N
          if (cpos <= gpos && gpos <= cpos + (int64_t)ln - 1) {
            rp = -1;
            hit = true;
            i = n_cigar;
            break;
          }
          cpos += ln;
          break;
        case 1:  // I
        case 4:  // S
          rp += ln;
          break;
        default:  // H, P, =, X: advance nothing (parity quirk)
          break;
      }
    }
    (void)hit;
    if (rp < 0 || rp >= l_qseq) {
      *rpos = -1;
      return false;
    }
    uint8_t code = (rp & 1) ? (seq4[rp >> 1] & 0xF) : (seq4[rp >> 1] >> 4);
    *base = kSeqNt16[code];
    *bq = qual[rp];
    *rpos = (int32_t)rp;
    return true;
  }

  void process_record(const uint8_t* r, uint32_t len) {
    res_.ctr.n_read++;
    int32_t tid, pos, l_seq;
    memcpy(&tid, r, 4);
    memcpy(&pos, r + 4, 4);
    const uint8_t l_read_name = r[8];
    const uint8_t mapq = r[9];
    uint16_t n_cigar, flag;
    memcpy(&n_cigar, r + 12, 2);
    memcpy(&flag, r + 14, 2);
    memcpy(&l_seq, r + 16, 4);
    if (mapq < min_mq_ || (flag & excl_flag_)) {
      res_.ctr.n_skip++;
      return;
    }
    const int chrom = (tid >= 0 && tid < (int32_t)tid_to_chrom_.size())
                          ? tid_to_chrom_[tid]
                          : -1;
    if (chrom < 0) return;

    const uint8_t* cig = r + 32 + l_read_name;
    const uint8_t* seq4 = cig + 4 * n_cigar;
    const uint8_t* qual = seq4 + (l_seq + 1) / 2;
    const uint8_t* tags = qual + l_seq;
    const uint8_t* end = r + len;

    // endpos: pos + ref-consumed (M/D/N/=/X)
    int64_t rlen = 0;
    for (uint16_t i = 0; i < n_cigar; ++i) {
      uint32_t c;
      memcpy(&c, cig + 4 * i, 4);
      const uint32_t op = c & 0xF;
      if (op == 0 || op == 2 || op == 3 || op == 7 || op == 8) rlen += c >> 4;
    }
    const int64_t endpos = pos + (rlen ? rlen : 1);

    // tag scan
    const uint8_t* cb = nullptr;
    size_t cb_len = 0;
    const uint8_t* ub = nullptr;
    size_t ub_len = 0;
    scan_tags(tags, end, &cb, &cb_len, &ub, &ub_len);

    // barcode
    int32_t ibcd;
    if (!has_group_tag_) {
      ibcd = cell_id(".");
    } else {
      std::string sbcd;
      if (cb)
        sbcd.assign((const char*)cb, cb_len);
      else {
        res_.ctr.n_no_gtag++;
        sbcd = ".";
      }
      if (use_group_set_ && !group_set_.count(sbcd)) {
        res_.ctr.n_skip_bcd++;
        return;
      }
      ibcd = cell_id(sbcd);
    }
    res_.ctr.n_tmp++;

    uint64_t umih;
    if (!has_umi_tag_) {
      umih = umi_counter_++;
    } else if (ub) {
      umih = hash_bytes(ub, ub_len);
    } else {
      res_.ctr.n_no_utag++;
      umih = hash_bytes((const uint8_t*)".", 1);
    }

    res_.cell_totl[ibcd]++;

    finalize_before(chrom, pos);

    // overlapping SNPs: binary search in this chrom's sorted positions
    const int64_t lo0 = chrom_ptr_[chrom], hi0 = chrom_ptr_[chrom + 1];
    int64_t lo = lower_bound(lo0, hi0, pos);
    int64_t hi = lower_bound(lo, hi0, endpos);

    int nv_pass = 0, nv_redundant = 0, nv_valid = 0;
    for (int64_t k = lo; k < hi; ++k) {
      char base;
      int bq;
      int32_t rpos;
      if (!base_at(cig, n_cigar, pos, snp_pos_[k], l_seq, seq4, qual, &base,
                   &bq, &rpos))
        continue;
      if (base == 'N') continue;
      nv_valid++;
      if (bq < min_bq_) continue;
      if (rpos < min_td_ - 1) continue;
      if (rpos + min_td_ > l_seq) continue;
      const int32_t sid = snp_ids_[k];
      const char refc = (char)snp_ref_[sid];
      const char altc = (char)snp_alt_[sid];
      const uint8_t allele = base == refc ? 0 : (base == altc ? 1 : 2);
      const uint8_t cbq = (uint8_t)(bq > cap_bq_ ? cap_bq_ : bq);
      if (add_umi(chrom, k, ibcd, umih, allele, cbq))
        nv_pass++;
      else
        nv_redundant++;
    }
    if (nv_pass > 1) res_.ctr.n_multi_snps++;
    if (nv_pass > 0)
      res_.ctr.n_pass++;
    else if (nv_redundant > 0)
      res_.ctr.n_redundant++;
    else if (nv_valid > 0)
      res_.ctr.n_lq++;
    else
      res_.ctr.n_n++;
  }

  bool add_umi(int chrom, int64_t k, int32_t cell, uint64_t umih,
               uint8_t allele, uint8_t bq) {
    res_.cell_pass[cell]++;
    const int64_t key = ((int64_t)chrom << 40) | k;
    auto [it, inserted] = active_.try_emplace(key);
    if (inserted) active_order_.emplace_back(chrom, k);
    auto [uit, fresh] =
        it->second.umis.try_emplace({cell, umih},
                                    (uint16_t)(((uint16_t)allele << 8) | bq));
    if (!fresh) return false;  // redundant: first occurrence wins
    res_.cell_uniq[cell]++;
    return true;
  }

  int64_t lower_bound(int64_t lo, int64_t hi, int64_t val) const {
    while (lo < hi) {
      int64_t mid = (lo + hi) >> 1;
      if (snp_pos_[mid] < val)
        lo = mid + 1;
      else
        hi = mid;
    }
    return lo;
  }

  void scan_tags(const uint8_t* p, const uint8_t* end, const uint8_t** cb,
                 size_t* cb_len, const uint8_t** ub, size_t* ub_len) {
    while (p + 3 <= end) {
      const uint8_t t0 = p[0], t1 = p[1];
      const char typ = (char)p[2];
      p += 3;
      size_t vlen = 0;
      switch (typ) {
        case 'Z':
        case 'H': {
          const uint8_t* z = p;
          while (z < end && *z) ++z;
          if (typ == 'Z') {
            if (has_group_tag_ && t0 == tg_[0] && t1 == tg_[1]) {
              *cb = p;
              *cb_len = (size_t)(z - p);
            } else if (has_umi_tag_ && t0 == tu_[0] && t1 == tu_[1]) {
              *ub = p;
              *ub_len = (size_t)(z - p);
            }
          }
          p = z + 1;
          continue;
        }
        case 'A':
        case 'c':
        case 'C':
          vlen = 1;
          break;
        case 's':
        case 'S':
          vlen = 2;
          break;
        case 'i':
        case 'I':
        case 'f':
          vlen = 4;
          break;
        case 'B': {
          if (p + 5 > end) return;
          const char sub = (char)p[0];
          uint32_t cnt;
          memcpy(&cnt, p + 1, 4);
          size_t esz = (sub == 'c' || sub == 'C')   ? 1
                       : (sub == 's' || sub == 'S') ? 2
                                                    : 4;
          vlen = 5 + (size_t)cnt * esz;
          break;
        }
        default:
          return;  // unknown tag type: stop scanning (matches Python)
      }
      p += vlen;
    }
  }

  // --- config
  std::unordered_map<std::string, int> chrom_index_;
  const int64_t* chrom_ptr_;
  const int64_t* snp_pos_;
  const int32_t* snp_ids_;
  const uint8_t* snp_ref_;
  const uint8_t* snp_alt_;
  int cap_bq_, min_bq_, min_td_, min_mq_, excl_flag_;
  bool has_group_tag_ = false, has_umi_tag_ = false;
  char tg_[2] = {0, 0}, tu_[2] = {0, 0};
  bool use_group_set_ = false;
  std::unordered_set<std::string> group_set_;
  std::unordered_map<std::string, int> bc_map_;
  std::vector<int> tid_to_chrom_;
  uint64_t umi_counter_ = 0;

  // --- state
  std::unordered_map<int64_t, ActiveSnp> active_;
  std::vector<std::pair<int, int64_t>> active_order_;  // append order
  size_t active_head_ = 0;
  Result res_;
};

}  // namespace

// ---------------------------------------------------------------- C API
extern "C" {

struct DmxHandle {
  Result res;
  std::string err;
};

DmxHandle* dmx_ingest_bam(
    const char* path, int32_t n_chroms, const char* chrom_concat,
    const int64_t* chrom_off, const int64_t* chrom_ptr, const int64_t* snp_pos,
    const int32_t* snp_ids, const uint8_t* snp_ref, const uint8_t* snp_alt,
    const char* tag_group, const char* tag_umi, int32_t cap_bq, int32_t min_bq,
    int32_t min_td, int32_t min_mq, int32_t excl_flag, const char* grp_concat,
    const int64_t* grp_off, int64_t n_group, int32_t n_threads) {
  DmxHandle* h = new DmxHandle();
  try {
    Ingest ing(n_chroms, chrom_concat, chrom_off, chrom_ptr, snp_pos, snp_ids,
               snp_ref, snp_alt, tag_group, tag_umi, cap_bq, min_bq, min_td,
               min_mq, excl_flag, grp_concat, grp_off, n_group);
    ing.run_bam(path, n_threads);
    h->res = ing.take();
  } catch (const IngestError& e) {
    h->err = e.msg;
  } catch (const std::exception& e) {
    h->err = e.what();
  }
  return h;
}

const char* dmx_error(DmxHandle* h) {
  return h->err.empty() ? nullptr : h->err.c_str();
}

int64_t dmx_n_cells(DmxHandle* h) { return (int64_t)h->res.barcodes.size(); }
int64_t dmx_n_obs(DmxHandle* h) { return (int64_t)h->res.obs.size(); }

const char* dmx_barcode(DmxHandle* h, int64_t i) {
  return h->res.barcodes[(size_t)i].c_str();
}

void dmx_get_cell_counters(DmxHandle* h, int64_t* totl, int64_t* pass,
                           int64_t* uniq) {
  const size_t n = h->res.barcodes.size();
  memcpy(totl, h->res.cell_totl.data(), n * 8);
  memcpy(pass, h->res.cell_pass.data(), n * 8);
  memcpy(uniq, h->res.cell_uniq.data(), n * 8);
}

void dmx_get_obs(DmxHandle* h, int32_t* cell, int32_t* snp, uint8_t* allele,
                 uint8_t* bq) {
  const size_t n = h->res.obs.size();
  for (size_t i = 0; i < n; ++i) {
    cell[i] = h->res.obs[i].cell;
    snp[i] = h->res.obs[i].snp;
    allele[i] = h->res.obs[i].allele;
    bq[i] = h->res.obs[i].bq;
  }
}

void dmx_get_counters(DmxHandle* h, int64_t* out11) {
  const Counters& c = h->res.ctr;
  out11[0] = c.n_read;
  out11[1] = c.n_skip;
  out11[2] = c.n_skip_bcd;
  out11[3] = c.n_tmp;
  out11[4] = c.n_multi_snps;
  out11[5] = c.n_pass;
  out11[6] = c.n_redundant;
  out11[7] = c.n_lq;
  out11[8] = c.n_n;
  out11[9] = c.n_no_gtag;
  out11[10] = c.n_no_utag;
}

void dmx_free(DmxHandle* h) { delete h; }
}
