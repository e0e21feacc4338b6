/* htshim binary BCF2 support: decode a (pre-inflated) BCF stream into
 * VCF TEXT at open time, so the reference binary's whole read path runs
 * through the shim's existing text parser (shim_vcf.cpp) unchanged.
 * Validation tooling only — simplicity over streaming (the BAM/VCF.gz
 * paths already inflate whole files at hts_open, shim.cpp).
 *
 * Float values render with %.9g (round-trips any f32 exactly through
 * the text parser's (float)atof), so GP/PL golden comparisons see the
 * same bits the binary carries. Typed-value decode follows the BCF2.2
 * spec (VCFv4.x specification §6.3): dictionary ids are first-seen over
 * the embedded header text with implicit PASS at 0, explicit IDX=
 * honored; int missing/END sentinels 0x80/0x8000/0x80000000 +1;
 * float missing 0x7F800001, end 0x7F800002. */

#include <cstdarg>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <map>
#include <string>
#include <vector>

extern "C" {
FILE *shim_bcf_to_vcf_text(FILE *in);
}

namespace {

void bdie(const char *what) {
    fprintf(stderr, "[htshim/bcf] corrupt or unsupported BCF: %s\n", what);
    abort();
}

struct Rd {
    FILE *f;
    int u8(int *eof = NULL) {
        int c = fgetc(f);
        if (c == EOF) {
            if (eof) {
                *eof = 1;
                return 0;
            }
            bdie("unexpected EOF");
        }
        return c;
    }
    uint32_t u32(int *eof = NULL) {
        unsigned char b[4];
        size_t n = fread(b, 1, 4, f);
        if (n != 4) {
            if (eof && n == 0) {
                *eof = 1;
                return 0;
            }
            bdie("truncated u32");
        }
        return (uint32_t)b[0] | ((uint32_t)b[1] << 8) |
               ((uint32_t)b[2] << 16) | ((uint32_t)b[3] << 24);
    }
};

struct Buf {
    const unsigned char *p, *end;
    int u8() {
        if (p >= end) bdie("typed value past block end");
        return *p++;
    }
    int64_t intN(int type) {
        int64_t v = 0;
        int n = type == 1 ? 1 : type == 2 ? 2 : 4;
        if (p + n > end) bdie("int past block end");
        for (int i = 0; i < n; ++i) v |= (int64_t)p[i] << (8 * i);
        p += n;
        if (type == 1) return (int8_t)v;
        if (type == 2) return (int16_t)v;
        return (int32_t)v;
    }
    uint32_t f32bits() {
        if (p + 4 > end) bdie("float past block end");
        uint32_t v = (uint32_t)p[0] | ((uint32_t)p[1] << 8) |
                     ((uint32_t)p[2] << 16) | ((uint32_t)p[3] << 24);
        p += 4;
        return v;
    }
};

/* typed descriptor: low 4 bits type, high 4 bits length (15 -> a typed
 * int follows with the real length) */
void typed_head(Buf &b, int *type, int64_t *len) {
    int d = b.u8();
    *type = d & 0x0F;
    *len = d >> 4;
    if (*len == 15) {
        int t2 = b.u8();
        *len = b.intN(t2 & 0x0F);
    }
}

std::string typed_string(Buf &b) {
    int type;
    int64_t len;
    typed_head(b, &type, &len);
    if (len == 0) return "";
    if (type != 7) bdie("expected char string");
    if (b.p + len > b.end) bdie("string past block end");
    std::string s((const char *)b.p, (size_t)len);
    b.p += len;
    /* strip NUL padding */
    while (!s.empty() && s.back() == '\0') s.pop_back();
    return s;
}

bool int_is_missing(int type, int64_t v) {
    if (type == 1) return v == (int8_t)0x80;
    if (type == 2) return v == (int16_t)0x8000;
    return v == (int32_t)0x80000000;
}

bool int_is_end(int type, int64_t v) {
    if (type == 1) return v == (int8_t)0x81;
    if (type == 2) return v == (int16_t)0x8001;
    return v == (int32_t)0x80000001;
}

struct Dicts {
    std::vector<std::string> contigs;  /* BCF_DT_CTG by IDX */
    std::vector<std::string> ids;      /* FILTER/INFO/FORMAT by IDX */
};

void dict_put(std::vector<std::string> &v, size_t idx,
              const std::string &name) {
    if (v.size() <= idx) v.resize(idx + 1);
    if (v[idx].empty()) v[idx] = name;
}

/* minimal header-text scan: ##contig and ##FILTER/INFO/FORMAT lines in
 * first-seen order build the implicit dictionaries; IDX= overrides. */
void build_dicts(const std::string &text, Dicts *d) {
    d->ids.push_back("PASS"); /* implicit, spec */
    size_t pos = 0;
    std::map<std::string, bool> seen_id;
    seen_id["PASS"] = true;
    while (pos < text.size()) {
        size_t eol = text.find('\n', pos);
        if (eol == std::string::npos) eol = text.size();
        std::string line = text.substr(pos, eol - pos);
        pos = eol + 1;
        if (line.rfind("##", 0) != 0) continue;
        bool is_ctg = line.rfind("##contig=<", 0) == 0;
        bool is_id = line.rfind("##FILTER=<", 0) == 0 ||
                     line.rfind("##INFO=<", 0) == 0 ||
                     line.rfind("##FORMAT=<", 0) == 0;
        if (!is_ctg && !is_id) continue;
        size_t lt = line.find('<');
        std::string body = line.substr(lt + 1);
        if (!body.empty() && body.back() == '>') body.pop_back();
        std::string id;
        long idx = -1;
        size_t p2 = 0;
        while (p2 < body.size()) {
            size_t eq = body.find('=', p2);
            if (eq == std::string::npos) break;
            std::string key = body.substr(p2, eq - p2);
            size_t vend;
            std::string val;
            if (eq + 1 < body.size() && body[eq + 1] == '"') {
                /* skip escaped quotes inside Description strings */
                size_t q = eq + 2;
                while (q < body.size() &&
                       !(body[q] == '"' && body[q - 1] != '\\'))
                    ++q;
                vend = q;
                val = body.substr(eq + 2, vend - eq - 2);
                vend = body.find(',', vend);
            } else {
                vend = body.find(',', eq + 1);
                val = body.substr(
                    eq + 1,
                    (vend == std::string::npos ? body.size() : vend) - eq -
                        1);
            }
            if (key == "ID") id = val;
            if (key == "IDX") idx = strtol(val.c_str(), NULL, 10);
            if (vend == std::string::npos) break;
            p2 = vend + 1;
        }
        if (id.empty()) continue;
        if (is_ctg) {
            if (idx >= 0)
                dict_put(d->contigs, (size_t)idx, id);
            else
                d->contigs.push_back(id);
        } else {
            if (idx >= 0) {
                dict_put(d->ids, (size_t)idx, id);
                seen_id[id] = true;
            } else if (!seen_id.count(id)) {
                d->ids.push_back(id);
                seen_id[id] = true;
            }
        }
    }
}

void appendf(std::string &out, const char *fmt, ...) {
    char tmp[64];
    va_list ap;
    va_start(ap, fmt);
    vsnprintf(tmp, sizeof tmp, fmt, ap);
    va_end(ap);
    out += tmp;
}

const uint32_t F_MISSING = 0x7F800001u;
const uint32_t F_END = 0x7F800002u;

/* one FORMAT field's per-sample text values */
void render_fmt(Buf &b, int n_sample, bool is_gt,
                std::vector<std::string> *samples) {
    int type;
    int64_t len;
    typed_head(b, &type, &len);
    for (int s = 0; s < n_sample; ++s) {
        std::string v;
        if (type == 7) { /* char string */
            if (b.p + len > b.end) bdie("char field past end");
            std::string raw((const char *)b.p, (size_t)len);
            b.p += len;
            size_t nul = raw.find('\0');
            v = nul == std::string::npos ? raw : raw.substr(0, nul);
            if (v.empty()) v = ".";
        } else if (type == 5) { /* float */
            bool first = true;
            bool ended = false;
            for (int64_t k = 0; k < len; ++k) {
                uint32_t bits = b.f32bits();
                if (ended) continue;
                if (bits == F_END) {
                    ended = true;
                    continue;
                }
                if (!first) v += ",";
                first = false;
                if (bits == F_MISSING) {
                    v += ".";
                } else {
                    float f;
                    memcpy(&f, &bits, 4);
                    appendf(v, "%.9g", (double)f);
                }
            }
            if (v.empty()) v = ".";
        } else if (type >= 1 && type <= 3) { /* ints (or GT) */
            bool first = true;
            bool ended = false;
            for (int64_t k = 0; k < len; ++k) {
                int64_t x = b.intN(type);
                if (ended) continue;
                if (int_is_end(type, x)) {
                    ended = true;
                    continue;
                }
                if (is_gt) {
                    if (!first) v += (x & 1) ? "|" : "/";
                    first = false;
                    int64_t a = x >> 1;
                    if (a == 0 || int_is_missing(type, x))
                        v += ".";
                    else
                        appendf(v, "%lld", (long long)(a - 1));
                } else {
                    if (!first) v += ",";
                    first = false;
                    if (int_is_missing(type, x))
                        v += ".";
                    else
                        appendf(v, "%lld", (long long)x);
                }
            }
            if (v.empty()) v = ".";
        } else if (type == 0 && len == 0) {
            v = ".";
        } else {
            bdie("unsupported FORMAT value type");
        }
        (*samples)[s] += v;
    }
}

}  // namespace

extern "C" FILE *shim_bcf_to_vcf_text(FILE *in) {
    Rd rd{in};
    char magic[5];
    if (fread(magic, 1, 5, in) != 5 || memcmp(magic, "BCF\2", 4))
        bdie("magic");
    uint32_t l_text = rd.u32();
    std::string text(l_text, '\0');
    if (fread(&text[0], 1, l_text, in) != l_text) bdie("header text");
    while (!text.empty() && text.back() == '\0') text.pop_back();

    Dicts d;
    build_dicts(text, &d);
    int n_sample = 0;
    {
        size_t chrom = text.rfind("#CHROM");
        if (chrom == std::string::npos) bdie("no #CHROM line");
        size_t eol = text.find('\n', chrom);
        std::string line = text.substr(
            chrom, (eol == std::string::npos ? text.size() : eol) - chrom);
        int cols = 1;
        for (char c : line) cols += c == '\t';
        n_sample = cols > 9 ? cols - 9 : 0;
    }

    FILE *out = tmpfile();
    if (!out) bdie("tmpfile");
    fwrite(text.data(), 1, text.size(), out);
    if (text.empty() || text.back() != '\n') fputc('\n', out);

    for (;;) {
        int eof = 0;
        uint32_t l_shared = rd.u32(&eof);
        if (eof) break;
        uint32_t l_indiv = rd.u32();
        std::vector<unsigned char> shared(l_shared), indiv(l_indiv);
        if (fread(shared.data(), 1, l_shared, in) != l_shared)
            bdie("shared block");
        if (fread(indiv.data(), 1, l_indiv, in) != l_indiv)
            bdie("indiv block");
        Buf sb{shared.data(), shared.data() + l_shared};

        int32_t rid = (int32_t)sb.intN(3);
        int32_t pos0 = (int32_t)sb.intN(3);
        sb.intN(3); /* rlen */
        uint32_t qbits = sb.f32bits();
        uint32_t n_ai = (uint32_t)sb.intN(3);
        uint32_t n_fs = (uint32_t)sb.intN(3);
        int n_allele = (int)(n_ai >> 16);
        if (n_allele == 0) bdie("n_allele == 0");
        int n_fmt = (int)(n_fs >> 24);
        int ns = (int)(n_fs & 0xFFFFFF);
        if (ns != n_sample) bdie("n_sample mismatch");
        if (rid < 0 || (size_t)rid >= d.contigs.size())
            bdie("rid out of range");

        std::string line = d.contigs[rid];
        appendf(line, "\t%lld\t", (long long)pos0 + 1);
        std::string id = typed_string(sb);
        line += id.empty() ? "." : id;
        std::string alts;
        for (int a = 0; a < n_allele; ++a) {
            std::string al = typed_string(sb);
            if (a == 0) {
                line += "\t" + al;
            } else {
                if (a > 1) alts += ",";
                alts += al;
            }
        }
        line += "\t" + (n_allele > 1 ? alts : std::string("."));
        /* QUAL: bcf_float_missing, or any NaN (some writers use qNaN) */
        if (qbits == F_MISSING ||
            ((qbits & 0x7F800000u) == 0x7F800000u && (qbits & 0x7FFFFFu))) {
            line += "\t.";
        } else {
            float q;
            memcpy(&q, &qbits, 4);
            appendf(line, "\t%.9g", (double)q);
        }
        /* FILTER (typed int vector of dict ids) */
        {
            int type;
            int64_t len;
            typed_head(sb, &type, &len);
            std::string flt;
            for (int64_t k = 0; k < len; ++k) {
                int64_t fid = sb.intN(type ? type : 1);
                if (fid < 0 || (size_t)fid >= d.ids.size())
                    bdie("FILTER id out of range");
                if (k) flt += ";";
                flt += d.ids[(size_t)fid];
            }
            line += "\t" + (len ? flt : std::string("."));
        }
        /* INFO is last in the shared block and demuxlet never reads it:
         * render "." and skip the remaining shared bytes */
        line += "\t.";

        Buf ib{indiv.data(), indiv.data() + l_indiv};
        std::vector<std::string> keys;
        std::vector<std::string> samples((size_t)n_sample);
        for (int f = 0; f < n_fmt; ++f) {
            int ktype;
            int64_t klen;
            typed_head(ib, &ktype, &klen);
            (void)klen;
            int64_t kid = ib.intN(ktype);
            if (kid < 0 || (size_t)kid >= d.ids.size())
                bdie("FORMAT key id out of range");
            std::string key = d.ids[(size_t)kid];
            keys.push_back(key);
            for (auto &s : samples)
                if (f) s += ":";
            render_fmt(ib, n_sample, key == "GT", &samples);
        }
        if (n_fmt) {
            std::string fk;
            for (size_t i = 0; i < keys.size(); ++i) {
                if (i) fk += ":";
                fk += keys[i];
            }
            line += "\t" + fk;
            for (auto &s : samples) line += "\t" + s;
        }
        line += "\n";
        fwrite(line.data(), 1, line.size(), out);
    }
    rewind(out);
    return out;
}
