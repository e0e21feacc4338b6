/* htshim CRAM 3.0 support: decode a CRAM stream into SAM TEXT at open
 * time, so the reference binary's whole read path runs through the
 * shim's existing SAM text parser unchanged — the same decode-at-open
 * pattern as shim_bcf.cpp (BCF -> VCF text). Closes the last of the four
 * binary input formats in the golden harness (reference analog:
 * sam_filtered_reader.cpp:76-102 reading CRAM via htslib cram_*).
 *
 * Independent implementation (ported from the repo's own Python decoder
 * io/cram.py, NOT from htslib): containers/blocks, ITF8/LTF8,
 * raw/gzip/rANS-4x8 block compression, EXTERNAL / HUFFMAN (incl. the
 * zero-bit constant) / BETA / GAMMA / SUBEXP / BYTE_ARRAY_STOP /
 * BYTE_ARRAY_LEN encodings over external streams and the slice's shared
 * CORE bitstream, multi-slice containers and multi-ref (-2 + RI) slices.
 *
 * Unlike the demux pipeline (which resolves read bases lazily at SNP
 * positions from the VCF REF), SAM text needs the FULL sequence, so a
 * reference FASTA is required for mapped reads — set SHIM_CRAM_REF to
 * its path (the analog of htslib's REF_PATH). Validation tooling only:
 * whole-file decode, simplicity over streaming. */

#include <algorithm>
#include <cctype>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <map>
#include <string>
#include <vector>

#include <zlib.h>

extern "C" {
FILE *shim_cram_to_sam_text(FILE *in, const char *fn);
}

namespace {

void cdie(const char *what) {
    fprintf(stderr, "[htshim/cram] corrupt or unsupported CRAM: %s\n", what);
    abort();
}

/* ------------------------------------------------------------- buffers */
struct Buf {
    const uint8_t *d;
    size_t n, o;
    int u8() {
        if (o >= n) cdie("unexpected EOF");
        return d[o++];
    }
    const uint8_t *bytes(size_t k) {
        if (o + k > n) cdie("truncated");
        const uint8_t *p = d + o;
        o += k;
        return p;
    }
    int32_t i32() {
        const uint8_t *p = bytes(4);
        int32_t v;
        memcpy(&v, p, 4);
        return v;
    }
    int64_t itf8() {
        int64_t b0 = u8();
        int64_t v;
        if (b0 < 0x80) return b0;
        if (b0 < 0xC0) return ((b0 & 0x3F) << 8) | u8();
        if (b0 < 0xE0) return ((b0 & 0x1F) << 16) | (u8() << 8) | u8();
        if (b0 < 0xF0) {
            v = (b0 & 0x0F) << 24;
            v |= ((int64_t)u8() << 16) | ((int64_t)u8() << 8) | u8();
            return v;
        }
        v = (b0 & 0x0F) << 28;
        v |= ((int64_t)u8() << 20) | ((int64_t)u8() << 12) |
             ((int64_t)u8() << 4);
        v |= u8() & 0x0F;
        return v >= (1LL << 31) ? v - (1LL << 32) : v;
    }
    int64_t itf8_signed() {
        int64_t v = itf8();
        return v >= (1LL << 31) ? v - (1LL << 32) : v;
    }
    int64_t ltf8() {
        int64_t b0 = u8();
        int nlead = 0;
        while (nlead < 8 && ((b0 << nlead) & 0x80)) nlead++;
        int64_t v = nlead < 8 ? (b0 & (0xFF >> nlead)) : 0;
        for (int i = 0; i < nlead; ++i) v = (v << 8) | u8();
        return v;
    }
};

struct Bits {
    const uint8_t *d;
    size_t n, byte;
    int bit;
    int read_bit() {
        if (byte >= n) cdie("core bitstream exhausted");
        int v = (d[byte] >> bit) & 1;
        if (bit == 0) {
            bit = 7;
            byte++;
        } else {
            bit--;
        }
        return v;
    }
    int64_t read_bits(int k) {
        int64_t v = 0;
        for (int i = 0; i < k; ++i) v = (v << 1) | read_bit();
        return v;
    }
};

/* -------------------------------------------------------------- rANS */
constexpr uint32_t TOTFREQ = 1u << 12;
constexpr uint32_t RANS_L = 1u << 23;

struct RRd {
    const uint8_t *d;
    size_t n, o;
    uint8_t u8() {
        if (o >= n) cdie("rANS truncated");
        return d[o++];
    }
    uint32_t freq() {
        uint32_t f = u8();
        if (f >= 128) f = ((f & 0x7F) << 8) | u8();
        return f;
    }
    const uint8_t *bytesp(size_t k) {
        if (o + k > n) cdie("rANS truncated");
        const uint8_t *p = d + o;
        o += k;
        return p;
    }
};

template <class F>
void rans_read_alphabet(RRd &rd, F &&read_freq) {
    int sym = rd.u8();
    int rle = 0;
    for (;;) {
        read_freq(sym);
        if (rle > 0) {
            rle -= 1;
            sym += 1;
        } else {
            int nxt = rd.u8();
            if (nxt == 0) break;
            if (nxt == sym + 1) {
                rle = rd.u8();
                sym = nxt;
            } else {
                sym = nxt;
            }
        }
    }
}

void rans_tables(const uint32_t *freqs, uint32_t *cum, uint8_t *sym_of) {
    cum[0] = 0;
    for (int i = 0; i < 256; ++i) cum[i + 1] = cum[i] + freqs[i];
    if (cum[256] > TOTFREQ) cdie("rANS frequency overflow");
    for (int s = 0; s < 256; ++s)
        for (uint32_t x = cum[s]; x < cum[s + 1]; ++x) sym_of[x] = (uint8_t)s;
}

void rans_decompress(const uint8_t *blob, size_t bn,
                     std::vector<uint8_t> *out) {
    if (bn < 9) cdie("rANS truncated");
    int order = blob[0];
    uint32_t rsize;
    memcpy(&rsize, blob + 5, 4);
    out->assign(rsize, 0);
    if (rsize == 0) return;
    RRd rd{blob, bn, 9};
    if (order == 0) {
        std::vector<uint32_t> freqs(256, 0);
        rans_read_alphabet(rd, [&](int s) { freqs[s] = rd.freq(); });
        std::vector<uint32_t> cum(257);
        std::vector<uint8_t> sym_of(TOTFREQ);
        rans_tables(freqs.data(), cum.data(), sym_of.data());
        uint32_t states[4];
        for (int j = 0; j < 4; ++j) memcpy(&states[j], rd.bytesp(4), 4);
        size_t o = rd.o;
        for (uint32_t i = 0; i < rsize; ++i) {
            int j = i & 3;
            uint32_t x = states[j];
            uint32_t slot = x & (TOTFREQ - 1);
            uint8_t s = sym_of[slot];
            (*out)[i] = s;
            x = freqs[s] * (x >> 12) + slot - cum[s];
            while (x < RANS_L && o < bn) x = (x << 8) | blob[o++];
            states[j] = x;
        }
    } else if (order == 1) {
        std::vector<std::vector<uint32_t>> freqs(256);
        rans_read_alphabet(rd, [&](int c) {
            freqs[c].assign(256, 0);
            rans_read_alphabet(rd, [&](int s) { freqs[c][s] = rd.freq(); });
        });
        std::vector<std::vector<uint32_t>> cums(256);
        std::vector<std::vector<uint8_t>> syms(256);
        for (int c = 0; c < 256; ++c) {
            if (freqs[c].empty()) continue;
            cums[c].assign(257, 0);
            syms[c].assign(TOTFREQ, 0);
            rans_tables(freqs[c].data(), cums[c].data(), syms[c].data());
        }
        uint32_t states[4];
        for (int j = 0; j < 4; ++j) memcpy(&states[j], rd.bytesp(4), 4);
        size_t o = rd.o;
        uint32_t isz4 = rsize >> 2;
        size_t ptrs[4] = {0, isz4, 2ull * isz4, 3ull * isz4};
        size_t ends[4] = {isz4, 2ull * isz4, 3ull * isz4, rsize};
        int ctxs[4] = {0, 0, 0, 0};
        size_t remaining = rsize;
        while (remaining) {
            for (int j = 0; j < 4; ++j) {
                if (ptrs[j] >= ends[j]) continue;
                uint32_t x = states[j];
                uint32_t slot = x & (TOTFREQ - 1);
                int c = ctxs[j];
                if (freqs[c].empty()) cdie("rANS bad order-1 context");
                uint8_t s = syms[c][slot];
                (*out)[ptrs[j]] = s;
                x = freqs[c][s] * (x >> 12) + slot - cums[c][s];
                while (x < RANS_L && o < bn) x = (x << 8) | blob[o++];
                states[j] = x;
                ctxs[j] = s;
                ptrs[j]++;
                remaining--;
            }
        }
    } else {
        cdie("rANS unknown order");
    }
}

/* ------------------------------------------------------------- blocks */
enum { M_RAW = 0, M_GZIP = 1, M_BZIP2 = 2, M_LZMA = 3, M_RANS = 4 };
enum { CT_FILE_HEADER = 0, CT_COMP_HEADER = 1, CT_SLICE = 2, CT_EXT = 4,
       CT_CORE = 5 };

struct Block {
    int ctype;
    int64_t cid;
    std::vector<uint8_t> data;
};

Block read_block(Buf &b) {
    Block out;
    int method = b.u8();
    out.ctype = b.u8();
    out.cid = b.itf8();
    int64_t csize = b.itf8();
    int64_t rsize = b.itf8();
    const uint8_t *payload = b.bytes((size_t)csize);
    b.bytes(4); /* CRC */
    if (method == M_RAW) {
        out.data.assign(payload, payload + csize);
    } else if (method == M_GZIP) {
        out.data.assign((size_t)rsize, 0);
        z_stream zs;
        memset(&zs, 0, sizeof zs);
        if (inflateInit2(&zs, 15 + 32) != Z_OK) cdie("inflateInit");
        zs.next_in = const_cast<uint8_t *>(payload);
        zs.avail_in = (uInt)csize;
        zs.next_out = out.data.data();
        zs.avail_out = (uInt)rsize;
        int r = inflate(&zs, Z_FINISH);
        if (r != Z_STREAM_END) cdie("gzip block inflate");
        inflateEnd(&zs);
    } else if (method == M_RANS) {
        rans_decompress(payload, (size_t)csize, &out.data);
    } else {
        cdie("block compression method (only raw/gzip/rANS)");
    }
    if ((int64_t)out.data.size() != rsize) cdie("block size mismatch");
    return out;
}

/* ---------------------------------------------------------- encodings */
struct Enc {
    int codec = 0; /* 1 EXT, 3 HUFF, 4 BA_LEN, 5 BA_STOP, 6 BETA,
                      7 SUBEXP, 9 GAMMA */
    std::vector<uint8_t> params;
};

struct Huff {
    /* canonical (CRAM 3.0 s13.4): alphabet sorted by (len, symbol),
       codes ascending */
    std::map<int, std::map<int64_t, int64_t>> by_len;
    bool constant = false;
    int64_t const_sym = 0;

    void init(const std::vector<int64_t> &symbols,
              const std::vector<int64_t> &lengths) {
        bool all_zero = true;
        for (auto l : lengths)
            if (l != 0) all_zero = false;
        if (all_zero) {
            constant = true;
            const_sym = symbols.empty() ? 0 : symbols[0];
            return;
        }
        std::vector<std::pair<int64_t, int64_t>> pairs;
        for (size_t i = 0; i < symbols.size(); ++i)
            pairs.push_back({lengths[i], symbols[i]});
        std::sort(pairs.begin(), pairs.end());
        int64_t code = 0;
        int64_t prev_len = pairs[0].first;
        for (auto &p : pairs) {
            code <<= (p.first - prev_len);
            prev_len = p.first;
            by_len[(int)p.first][code] = p.second;
            code += 1;
        }
    }
    int64_t decode(Bits &bits) const {
        if (constant) return const_sym;
        int64_t code = 0;
        for (int ln = 1; ln <= 32; ++ln) {
            code = (code << 1) | bits.read_bit();
            auto it = by_len.find(ln);
            if (it != by_len.end()) {
                auto jt = it->second.find(code);
                if (jt != it->second.end()) return jt->second;
            }
        }
        cdie("invalid huffman code");
        return 0;
    }
};

struct Slice;

struct Series {
    int kind = 0; /* mirrors Enc.codec; 0 = absent */
    int64_t p0 = 0, p1 = 0; /* external cid / beta offset+len / ... */
    Huff huff;
    Series *ba_len = nullptr, *ba_val = nullptr;

    void init(const Enc &e);
    int64_t read_int(Slice &sl);
    int read_byte(Slice &sl);
    void read_bytes(Slice &sl, size_t k, std::vector<uint8_t> *out);
    void read_array(Slice &sl, std::vector<uint8_t> *out);
};

void Series::init(const Enc &e) {
    kind = e.codec;
    Buf b{e.params.data(), e.params.size(), 0};
    if (e.codec == 1) {
        p0 = b.itf8();
    } else if (e.codec == 3) {
        int64_t n = b.itf8();
        std::vector<int64_t> symbols, lengths;
        for (int64_t i = 0; i < n; ++i) symbols.push_back(b.itf8_signed());
        int64_t n2 = b.itf8();
        for (int64_t i = 0; i < n2; ++i) lengths.push_back(b.itf8());
        huff.init(symbols, lengths);
    } else if (e.codec == 4) {
        Enc le, ve;
        le.codec = (int)b.itf8();
        int64_t lp = b.itf8();
        const uint8_t *lpp = b.bytes((size_t)lp);
        le.params.assign(lpp, lpp + lp);
        ve.codec = (int)b.itf8();
        int64_t vp = b.itf8();
        const uint8_t *vpp = b.bytes((size_t)vp);
        ve.params.assign(vpp, vpp + vp);
        ba_len = new Series();
        ba_len->init(le);
        ba_val = new Series();
        ba_val->init(ve);
    } else if (e.codec == 5) {
        p0 = b.u8();  /* stop byte */
        p1 = b.itf8(); /* content id */
    } else if (e.codec == 6 || e.codec == 7) {
        p0 = b.itf8_signed(); /* offset */
        p1 = b.itf8();        /* bit length / k */
    } else if (e.codec == 9) {
        p0 = b.itf8_signed();
    } else if (e.codec != 0) {
        cdie("unsupported encoding codec");
    }
}

struct Slice {
    std::map<int64_t, Buf> streams;
    Bits core{nullptr, 0, 0, 7};
    Buf &stream(int64_t cid) {
        auto it = streams.find(cid);
        if (it == streams.end()) cdie("missing external block id");
        return it->second;
    }
};

int64_t Series::read_int(Slice &sl) {
    if (kind == 1) return sl.stream(p0).itf8_signed();
    if (kind == 3) return huff.decode(sl.core);
    if (kind == 6) return sl.core.read_bits((int)p1) - p0;
    if (kind == 9) { /* Elias gamma */
        int n = 0;
        while (sl.core.read_bit() == 0) n++;
        int64_t v = 1;
        for (int i = 0; i < n; ++i) v = (v << 1) | sl.core.read_bit();
        return v - 1 - p0;
    }
    if (kind == 7) { /* subexp */
        int u = 0;
        while (sl.core.read_bit() == 1) u++;
        int64_t v;
        if (u == 0) {
            v = sl.core.read_bits((int)p1);
        } else {
            int bl = u + (int)p1 - 1;
            v = sl.core.read_bits(bl) + (1LL << bl);
        }
        return v - p0;
    }
    cdie("encoding cannot produce ints");
    return 0;
}

int Series::read_byte(Slice &sl) {
    if (kind == 3 || kind == 6 || kind == 7 || kind == 9)
        return (int)read_int(sl);
    if (kind == 1) return sl.stream(p0).u8();
    cdie("encoding cannot produce bytes");
    return 0;
}

void Series::read_bytes(Slice &sl, size_t k, std::vector<uint8_t> *out) {
    if (kind != 1) cdie("encoding cannot produce byte runs");
    const uint8_t *p = sl.stream(p0).bytes(k);
    out->assign(p, p + k);
}

void Series::read_array(Slice &sl, std::vector<uint8_t> *out) {
    if (kind == 5) {
        Buf &s = sl.stream(p1);
        size_t e = s.o;
        while (e < s.n && s.d[e] != (uint8_t)p0) e++;
        if (e >= s.n) cdie("byte_array_stop: no stop byte");
        out->assign(s.d + s.o, s.d + e);
        s.o = e + 1;
        return;
    }
    if (kind == 4) {
        int64_t ln = ba_len->read_int(sl);
        ba_val->read_bytes(sl, (size_t)ln, out);
        return;
    }
    cdie("encoding cannot produce arrays");
}

/* --------------------------------------------------------- sub matrix */
struct SubMat {
    char rows[5][5];
    void init(const uint8_t *sm) {
        const char *bases = "ACGTN";
        for (int i = 0; i < 5; ++i) {
            char others[5];
            int no = 0;
            for (int j = 0; j < 5 && no < 4; ++j)
                if (bases[j] != bases[i]) others[no++] = bases[j];
            if (!sm) {
                memcpy(rows[i], others, 4);
            } else {
                for (int j = 0; j < 4; ++j) {
                    int code = (sm[i] >> (6 - 2 * j)) & 0x3;
                    rows[i][code] = others[j];
                }
            }
            rows[i][4] = 0;
        }
    }
    char resolve(char ref_b, int code) const {
        const char *bases = "ACGTN";
        const char *hit = strchr(bases, toupper(ref_b));
        int row = hit ? (int)(hit - bases) : 4;
        return (code >= 0 && code < 4) ? rows[row][code] : 'N';
    }
};

/* ------------------------------------------------------------- FASTA */
std::map<std::string, std::string> load_fasta(const char *path) {
    std::map<std::string, std::string> out;
    FILE *f = fopen(path, "r");
    if (!f) cdie("SHIM_CRAM_REF fasta not readable");
    std::string name, seq;
    char line[1 << 16];
    while (fgets(line, sizeof line, f)) {
        size_t l = strlen(line);
        while (l && (line[l - 1] == '\n' || line[l - 1] == '\r')) line[--l] = 0;
        if (line[0] == '>') {
            if (!name.empty()) out[name] = seq;
            name.assign(line + 1);
            size_t sp = name.find_first_of(" \t");
            if (sp != std::string::npos) name.resize(sp);
            seq.clear();
        } else {
            seq.append(line);
        }
    }
    if (!name.empty()) out[name] = seq;
    fclose(f);
    return out;
}

/* ------------------------------------------------------------ feature */
struct Feat {
    char code;
    int64_t pos; /* 1-based read offset */
    int64_t ival = 0;
    std::vector<uint8_t> bv;
};

void append_cigar(std::string *cig, int64_t n, char op) {
    if (n <= 0) return;
    char tmp[32];
    snprintf(tmp, sizeof tmp, "%lld%c", (long long)n, op);
    cig->append(tmp);
}

} /* namespace */

FILE *shim_cram_to_sam_text(FILE *in, const char *fn) {
    (void)fn;
    /* slurp the whole stream */
    std::vector<uint8_t> data;
    {
        char buf[1 << 16];
        size_t r;
        while ((r = fread(buf, 1, sizeof buf, in)) > 0)
            data.insert(data.end(), buf, buf + r);
    }
    Buf b{data.data(), data.size(), 0};
    if (b.n < 6 || memcmp(b.bytes(4), "CRAM", 4) != 0) cdie("bad magic");
    int major = b.u8();
    b.u8();
    if (major != 3) cdie("only CRAM 3.x");
    b.bytes(20); /* file id */

    FILE *out = tmpfile();
    if (!out) cdie("tmpfile");

    auto container_header = [&](Buf &cb, int64_t *length, int64_t *nrec,
                                int64_t *nblocks) {
        *length = cb.i32();
        cb.itf8_signed(); /* ref id */
        cb.itf8();        /* start */
        cb.itf8();        /* span */
        *nrec = cb.itf8();
        cb.ltf8(); /* counter */
        cb.ltf8(); /* bases */
        *nblocks = cb.itf8();
        int64_t nland = cb.itf8();
        for (int64_t i = 0; i < nland; ++i) cb.itf8();
        cb.bytes(4); /* CRC */
    };

    /* container 1: SAM header text */
    std::vector<std::string> refs;
    {
        int64_t length, nrec, nblocks;
        container_header(b, &length, &nrec, &nblocks);
        Block hb = read_block(b);
        if (hb.ctype != CT_FILE_HEADER) cdie("expected SAM header block");
        Buf h{hb.data.data(), hb.data.size(), 0};
        int64_t tlen = h.i32();
        std::string text((const char *)h.bytes((size_t)tlen), (size_t)tlen);
        for (int64_t i = 1; i < nblocks; ++i) read_block(b);
        /* emit header text verbatim (strip trailing NULs/newline dupes) */
        size_t e = text.size();
        while (e && (text[e - 1] == 0)) e--;
        text.resize(e);
        fwrite(text.data(), 1, text.size(), out);
        if (!text.empty() && text.back() != '\n') fputc('\n', out);
        /* @SQ names in order = rid -> name */
        size_t p = 0;
        while (p < text.size()) {
            size_t nl = text.find('\n', p);
            if (nl == std::string::npos) nl = text.size();
            std::string line = text.substr(p, nl - p);
            if (line.rfind("@SQ", 0) == 0) {
                size_t sn = line.find("SN:");
                if (sn != std::string::npos) {
                    size_t end = line.find('\t', sn);
                    refs.push_back(line.substr(
                        sn + 3, (end == std::string::npos ? line.size()
                                                          : end) - sn - 3));
                }
            }
            p = nl + 1;
        }
    }

    const char *ref_path = getenv("SHIM_CRAM_REF");
    std::map<std::string, std::string> fasta;
    bool have_fasta = false;
    if (ref_path && *ref_path) {
        fasta = load_fasta(ref_path);
        have_fasta = true;
    }

    int64_t synth_qname = 0;

    /* containers until EOF */
    while (b.o + 4 <= b.n) {
        int64_t length, nrec, nblocks;
        container_header(b, &length, &nrec, &nblocks);
        size_t body_start = b.o;
        if (nrec == 0) { /* EOF (or empty) container */
            b.o = body_start + (size_t)length;
            continue;
        }
        Block ch = read_block(b);
        if (ch.ctype != CT_COMP_HEADER) cdie("expected compression header");

        /* compression header */
        bool rn_pres = true, ap_delta = true;
        SubMat smt;
        smt.init(nullptr);
        std::vector<std::vector<std::pair<std::string, char>>> td;
        std::map<std::string, Series> ds;
        std::map<int64_t, Series> te;
        {
            Buf cb{ch.data.data(), ch.data.size(), 0};
            cb.itf8(); /* preservation map size */
            int64_t np = cb.itf8();
            for (int64_t i = 0; i < np; ++i) {
                char key[3] = {(char)cb.u8(), (char)cb.u8(), 0};
                if (!strcmp(key, "RN")) {
                    rn_pres = cb.u8() != 0;
                } else if (!strcmp(key, "AP")) {
                    ap_delta = cb.u8() != 0;
                } else if (!strcmp(key, "RR")) {
                    cb.u8();
                } else if (!strcmp(key, "SM")) {
                    smt.init(cb.bytes(5));
                } else if (!strcmp(key, "TD")) {
                    int64_t bl = cb.itf8();
                    const uint8_t *p = cb.bytes((size_t)bl);
                    size_t q = 0, start = 0;
                    std::vector<std::pair<std::string, char>> cur;
                    while (q < (size_t)bl) {
                        if (p[q] == 0) {
                            td.push_back(cur);
                            cur.clear();
                            start = q + 1;
                        } else {
                            if (q + 3 > (size_t)bl) cdie("bad TD entry");
                            cur.push_back({std::string((const char *)p + q, 2),
                                           (char)p[q + 2]});
                            q += 2;
                        }
                        q += 1;
                    }
                    (void)start;
                } else {
                    cdie("unknown preservation key");
                }
            }
            if (td.empty()) td.push_back({});
            cb.itf8(); /* data series map size */
            int64_t ndd = cb.itf8();
            for (int64_t i = 0; i < ndd; ++i) {
                char key[3] = {(char)cb.u8(), (char)cb.u8(), 0};
                Enc e;
                e.codec = (int)cb.itf8();
                int64_t pl = cb.itf8();
                const uint8_t *pp = cb.bytes((size_t)pl);
                e.params.assign(pp, pp + pl);
                ds[key].init(e);
            }
            cb.itf8(); /* tag encoding map size */
            int64_t nt = cb.itf8();
            for (int64_t i = 0; i < nt; ++i) {
                int64_t k = cb.itf8();
                Enc e;
                e.codec = (int)cb.itf8();
                int64_t pl = cb.itf8();
                const uint8_t *pp = cb.bytes((size_t)pl);
                e.params.assign(pp, pp + pl);
                te[k].init(e);
            }
        }
        auto have = [&](const char *k) { return ds.count(k) != 0; };
        auto S = [&](const char *k) -> Series & {
            auto it = ds.find(k);
            if (it == ds.end()) cdie("data series missing");
            return it->second;
        };

        /* slices until container body consumed */
        while (b.o < body_start + (size_t)length) {
            Block sh = read_block(b);
            if (sh.ctype != CT_SLICE) cdie("expected slice header");
            Buf sb{sh.data.data(), sh.data.size(), 0};
            int64_t ref_id = sb.itf8_signed();
            int64_t a_start = sb.itf8();
            sb.itf8(); /* span */
            int64_t snrec = sb.itf8();
            sb.ltf8(); /* counter */
            int64_t snblocks = sb.itf8();
            int64_t ncids = sb.itf8();
            for (int64_t i = 0; i < ncids; ++i) sb.itf8();
            sb.itf8_signed(); /* embedded ref id */
            sb.bytes(16);     /* MD5 */

            Slice sl;
            std::vector<Block> blocks;
            blocks.reserve((size_t)snblocks);
            for (int64_t i = 0; i < snblocks; ++i)
                blocks.push_back(read_block(b));
            for (auto &blk : blocks) {
                if (blk.ctype == CT_CORE) {
                    sl.core = Bits{blk.data.data(), blk.data.size(), 0, 7};
                } else {
                    sl.streams[blk.cid] =
                        Buf{blk.data.data(), blk.data.size(), 0};
                }
            }

            int64_t prev_pos = a_start;
            std::vector<uint8_t> tmp;
            for (int64_t ri = 0; ri < snrec; ++ri) {
                int64_t bf = S("BF").read_int(sl);
                int64_t cf = S("CF").read_int(sl);
                int64_t rid = ref_id;
                if (ref_id == -2 && have("RI")) rid = S("RI").read_int(sl);
                int64_t rl = S("RL").read_int(sl);
                int64_t ap = S("AP").read_int(sl);
                int64_t pos1;
                if (ap_delta) {
                    pos1 = prev_pos + ap;
                    prev_pos = pos1;
                } else {
                    pos1 = ap;
                }
                S("RG").read_int(sl);
                std::string qname;
                if (rn_pres && have("RN")) {
                    S("RN").read_array(sl, &tmp);
                    qname.assign((const char *)tmp.data(), tmp.size());
                }
                if (cf & 0x2) { /* detached */
                    if (have("MF")) S("MF").read_int(sl);
                    if (!rn_pres && have("RN")) {
                        S("RN").read_array(sl, &tmp);
                        qname.assign((const char *)tmp.data(), tmp.size());
                    }
                    if (have("NS")) S("NS").read_int(sl);
                    if (have("NP")) S("NP").read_int(sl);
                    if (have("TS")) S("TS").read_int(sl);
                } else if (cf & 0x4) {
                    if (have("NF")) S("NF").read_int(sl);
                }
                int64_t tl = S("TL").read_int(sl);
                std::string cb_tag, ub_tag;
                bool has_cb = false, has_ub = false;
                if (tl >= 0 && tl < (int64_t)td.size()) {
                    for (auto &tg : td[(size_t)tl]) {
                        int64_t key =
                            ((int64_t)(uint8_t)tg.first[0] << 16) |
                            ((int64_t)(uint8_t)tg.first[1] << 8) |
                            (int64_t)(uint8_t)tg.second;
                        auto it = te.find(key);
                        if (it == te.end()) cdie("tag without encoding");
                        it->second.read_array(sl, &tmp);
                        if (tg.second == 'Z') {
                            std::string v((const char *)tmp.data(),
                                          tmp.size());
                            if (tg.first == "CB") {
                                cb_tag = v;
                                has_cb = true;
                            } else if (tg.first == "UB") {
                                ub_tag = v;
                                has_ub = true;
                            }
                        }
                    }
                }

                std::vector<Feat> feats;
                std::vector<uint8_t> quals;
                std::vector<uint8_t> bases;
                bool unmapped = (bf & 0x4) != 0;
                int64_t mq = 0;
                if (!unmapped) {
                    int64_t fnc = S("FN").read_int(sl);
                    int64_t fpos = 0;
                    for (int64_t fi = 0; fi < fnc; ++fi) {
                        char fc = (char)S("FC").read_byte(sl);
                        fpos += S("FP").read_int(sl);
                        Feat f;
                        f.code = fc;
                        f.pos = fpos;
                        if (fc == 'X') {
                            f.ival = S("BS").read_byte(sl);
                        } else if (fc == 'D') {
                            f.ival = S("DL").read_int(sl);
                        } else if (fc == 'N') {
                            f.ival = S("RS").read_int(sl);
                        } else if (fc == 'I') {
                            S("IN").read_array(sl, &f.bv);
                        } else if (fc == 'S') {
                            S("SC").read_array(sl, &f.bv);
                        } else if (fc == 'i') {
                            f.bv.assign(1, (uint8_t)S("BA").read_byte(sl));
                        } else if (fc == 'b') {
                            S("BB").read_array(sl, &f.bv);
                        } else if (fc == 'q') {
                            S("QQ").read_array(sl, &tmp);
                            continue;
                        } else if (fc == 'Q') {
                            S("QS").read_byte(sl);
                            continue;
                        } else if (fc == 'H') {
                            f.ival = S("HC").read_int(sl);
                        } else if (fc == 'P') {
                            f.ival = S("PD").read_int(sl);
                        } else if (fc == 'B') {
                            /* base + qual at one position: a 1-length
                             * 'b' run (stored base overrides ref) */
                            f.code = 'b';
                            f.bv.assign(
                                1, (uint8_t)S("BA").read_byte(sl));
                            S("QS").read_byte(sl);
                        } else {
                            cdie("feature code unsupported");
                        }
                        feats.push_back(std::move(f));
                    }
                    mq = have("MQ") ? S("MQ").read_int(sl) : 0;
                    if (cf & 0x1) S("QS").read_bytes(sl, (size_t)rl, &quals);
                } else {
                    if (have("BA")) S("BA").read_bytes(sl, (size_t)rl, &bases);
                    else bases.assign((size_t)rl, 'N');
                    if (cf & 0x1) S("QS").read_bytes(sl, (size_t)rl, &quals);
                }

                /* ---- SAM text: CIGAR + SEQ reconstruction ---- */
                std::string cig, seq;
                if (unmapped) {
                    cig = "*";
                    seq.assign(bases.begin(), bases.end());
                } else {
                    const std::string *ref = nullptr;
                    if (rid >= 0 && rid < (int64_t)refs.size() &&
                        have_fasta) {
                        auto it = fasta.find(refs[(size_t)rid]);
                        if (it != fasta.end()) ref = &it->second;
                    }
                    if (!ref) cdie("mapped CRAM record needs SHIM_CRAM_REF "
                                   "fasta with the record's contig");
                    int64_t rpos = 0;          /* read offset consumed */
                    int64_t gpos = pos1 - 1;   /* 0-based ref cursor */
                    int64_t m_run = 0;         /* pending M length */
                    auto ref_at = [&](int64_t g) -> char {
                        return (g >= 0 && g < (int64_t)ref->size())
                                   ? (*ref)[(size_t)g] : 'N';
                    };
                    auto flush_match = [&](int64_t upto_read) {
                        int64_t gap = upto_read - rpos;
                        for (int64_t i = 0; i < gap; ++i)
                            seq.push_back(ref_at(gpos + i));
                        m_run += gap;
                        gpos += gap;
                        rpos += gap;
                    };
                    for (auto &f : feats) {
                        int64_t fread = f.pos - 1;
                        flush_match(fread);
                        if (f.code == 'X') {
                            seq.push_back(
                                smt.resolve(ref_at(gpos), (int)f.ival));
                            m_run += 1;
                            gpos += 1;
                            rpos += 1;
                        } else if (f.code == 'D' || f.code == 'N') {
                            append_cigar(&cig, m_run, 'M');
                            m_run = 0;
                            append_cigar(&cig, f.ival,
                                         f.code == 'D' ? 'D' : 'N');
                            gpos += f.ival;
                        } else if (f.code == 'I' || f.code == 'S' ||
                                   f.code == 'i') {
                            append_cigar(&cig, m_run, 'M');
                            m_run = 0;
                            append_cigar(&cig, (int64_t)f.bv.size(),
                                         f.code == 'S' ? 'S' : 'I');
                            seq.append(f.bv.begin(), f.bv.end());
                            rpos += (int64_t)f.bv.size();
                        } else if (f.code == 'b') {
                            for (auto c : f.bv) seq.push_back((char)c);
                            m_run += (int64_t)f.bv.size();
                            gpos += (int64_t)f.bv.size();
                            rpos += (int64_t)f.bv.size();
                        } else if (f.code == 'H') {
                            append_cigar(&cig, m_run, 'M');
                            m_run = 0;
                            append_cigar(&cig, f.ival, 'H');
                        } else if (f.code == 'P') {
                            append_cigar(&cig, m_run, 'M');
                            m_run = 0;
                            append_cigar(&cig, f.ival, 'P');
                        }
                    }
                    flush_match(rl);
                    append_cigar(&cig, m_run, 'M');
                    if (cig.empty()) cig = "*";
                    if ((int64_t)seq.size() != rl)
                        cdie("feature walk does not consume the read");
                }
                std::string qstr;
                if (!quals.empty()) {
                    qstr.reserve(quals.size());
                    for (auto q : quals) qstr.push_back((char)(q + 33));
                } else {
                    qstr = "*";
                }
                if (qname.empty()) {
                    char tmpn[32];
                    snprintf(tmpn, sizeof tmpn, "shimread%lld",
                             (long long)synth_qname++);
                    qname = tmpn;
                }
                const char *rname =
                    (rid >= 0 && rid < (int64_t)refs.size())
                        ? refs[(size_t)rid].c_str() : "*";
                fprintf(out, "%s\t%lld\t%s\t%lld\t%lld\t%s\t*\t0\t0\t%s\t%s",
                        qname.c_str(), (long long)bf, rname,
                        (long long)(rid >= 0 ? pos1 : 0), (long long)mq,
                        cig.c_str(), seq.empty() ? "*" : seq.c_str(),
                        qstr.c_str());
                if (has_cb) fprintf(out, "\tCB:Z:%s", cb_tag.c_str());
                if (has_ub) fprintf(out, "\tUB:Z:%s", ub_tag.c_str());
                fputc('\n', out);
            }
        }
        b.o = body_start + (size_t)length;
    }
    rewind(out);
    return out;
}
