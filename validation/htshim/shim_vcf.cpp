/* htshim VCF: plain-text VCF parsing behind the htslib bcf_* API subset
 * the upstream demuxlet sources use. Validation tooling only — see
 * shim.cpp. */

#include <cctype>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

#include "htslib/hts.h"
#include "htslib/khash.h"
#include "htslib/kstring.h"
#include "htslib/vcf.h"

/* Must match hts_utils.cpp's declaration exactly (same macro, same
 * layout) so the reference code can walk our dicts. */
KHASH_MAP_INIT_STR(vdict, bcf_idinfo_t)
typedef khash_t(vdict) vdict_t;

extern "C" {

static void vdie(const char *what) {
    fprintf(stderr, "[htshim/vcf] unsupported: %s\n", what);
    abort();
}

/* ------------------------------------------------------------- header */
static bcf_hrec_t *make_hrec(int type, const char *key, const char *value) {
    bcf_hrec_t *r = (bcf_hrec_t *)calloc(1, sizeof(bcf_hrec_t));
    r->type = type;
    r->key = strdup(key);
    r->value = value ? strdup(value) : NULL;
    return r;
}

static void hrec_add_kv(bcf_hrec_t *r, const char *k, const char *v) {
    r->keys = (char **)realloc(r->keys, sizeof(char *) * (r->nkeys + 1));
    r->vals = (char **)realloc(r->vals, sizeof(char *) * (r->nkeys + 1));
    r->keys[r->nkeys] = strdup(k);
    r->vals[r->nkeys] = strdup(v);
    r->nkeys++;
}

int bcf_hrec_find_key(bcf_hrec_t *hrec, const char *key) {
    for (int i = 0; i < hrec->nkeys; ++i)
        if (strcmp(hrec->keys[i], key) == 0) return i;
    return -1;
}

bcf_hrec_t *bcf_hdr_get_hrec(const bcf_hdr_t *hdr, int type, const char *key,
                             const char *value, const char *str_class) {
    (void)str_class;
    for (int i = 0; i < hdr->nhrec; ++i) {
        bcf_hrec_t *r = hdr->hrec[i];
        if (r->type != type) continue;
        int k = bcf_hrec_find_key(r, key);
        if (k >= 0 && strcmp(r->vals[k], value) == 0) return r;
    }
    return NULL;
}

bcf_hdr_t *bcf_hdr_init(const char *mode) {
    (void)mode;
    bcf_hdr_t *h = (bcf_hdr_t *)calloc(1, sizeof(bcf_hdr_t));
    for (int i = 0; i < 3; ++i) h->dict[i] = kh_init(vdict);
    return h;
}

static int dict_add(bcf_hdr_t *h, int which, const char *id, int coltype,
                    uint64_t info_bits, bcf_hrec_t *hrec) {
    vdict_t *d = (vdict_t *)h->dict[which];
    khint_t k = kh_get(vdict, d, id);
    int newid;
    if (k == kh_end(d)) {
        int ret;
        char *key = strdup(id);
        k = kh_put(vdict, d, key, &ret);
        memset(&kh_val(d, k), 0, sizeof(bcf_idinfo_t));
        for (int i = 0; i < 3; ++i) kh_val(d, k).info[i] = 0xf; /* undef */
        newid = h->n[which]++;
        kh_val(d, k).id = newid;
    } else {
        newid = kh_val(d, k).id;
    }
    if (which == BCF_DT_ID && coltype >= 0 && coltype < 3) {
        kh_val(d, k).info[coltype] = info_bits;
        kh_val(d, k).hrec[coltype] = hrec;
    } else if (which == BCF_DT_CTG) {
        kh_val(d, k).hrec[0] = hrec;
        if (hrec) {
            int li = bcf_hrec_find_key(hrec, "length");
            if (li >= 0)
                kh_val(d, k).info[0] =
                    (uint64_t)strtoull(hrec->vals[li], NULL, 10);
        }
    }
    return newid;
}

static void hdr_sync_arrays(bcf_hdr_t *h) {
    for (int which = 0; which < 3; ++which) {
        vdict_t *d = (vdict_t *)h->dict[which];
        free(h->id[which]);
        h->id[which] =
            (bcf_idpair_t *)calloc(h->n[which] + 1, sizeof(bcf_idpair_t));
        for (khint_t k = kh_begin(d); k != kh_end(d); ++k) {
            if (!kh_exist(d, k)) continue;
            int i = kh_val(d, k).id;
            h->id[which][i].key = kh_key(d, k);
            h->id[which][i].val = &kh_val(d, k);
        }
    }
    free(h->samples);
    h->samples =
        (char **)calloc(h->n[BCF_DT_SAMPLE] + 1, sizeof(char *));
    for (int i = 0; i < h->n[BCF_DT_SAMPLE]; ++i)
        h->samples[i] = (char *)h->id[BCF_DT_SAMPLE][i].key;
}

static uint64_t parse_info_bits(const char *number, const char *type,
                                int coltype) {
    int ht = BCF_HT_FLAG;
    if (type) {
        if (strcmp(type, "Integer") == 0) ht = BCF_HT_INT;
        else if (strcmp(type, "Float") == 0) ht = BCF_HT_REAL;
        else if (strcmp(type, "String") == 0 ||
                 strcmp(type, "Character") == 0)
            ht = BCF_HT_STR;
    }
    int vl = BCF_VL_FIXED;
    uint64_t num = 1;
    if (number) {
        if (strcmp(number, "A") == 0) vl = BCF_VL_A;
        else if (strcmp(number, "G") == 0) vl = BCF_VL_G;
        else if (strcmp(number, "R") == 0) vl = BCF_VL_R;
        else if (strcmp(number, ".") == 0) vl = BCF_VL_VAR;
        else num = (uint64_t)strtoull(number, NULL, 10);
    }
    return (num << 12) | ((uint64_t)vl << 8) | ((uint64_t)ht << 4) |
           (uint64_t)coltype;
}

static void hdr_parse_line(bcf_hdr_t *h, const char *line) {
    if (strncmp(line, "##", 2) != 0) return;
    const char *eq = strchr(line, '=');
    if (!eq) return;
    std::string key(line + 2, (size_t)(eq - line - 2));
    int coltype = -1;
    if (key == "FILTER") coltype = BCF_HL_FLT;
    else if (key == "INFO") coltype = BCF_HL_INFO;
    else if (key == "FORMAT") coltype = BCF_HL_FMT;
    else if (key == "contig") coltype = BCF_HL_CTG;

    bcf_hrec_t *rec;
    if (eq[1] == '<') {
        rec = make_hrec(coltype < 0 ? BCF_HL_GEN : coltype, key.c_str(),
                        NULL);
        /* parse <k=v,k=v,...>, honoring quotes */
        const char *p = eq + 2;
        while (*p && *p != '>') {
            const char *ke = strchr(p, '=');
            if (!ke) break;
            std::string k(p, (size_t)(ke - p));
            p = ke + 1;
            std::string v;
            if (*p == '"') {
                ++p;
                while (*p && *p != '"') v.push_back(*p++);
                if (*p == '"') ++p;
            } else {
                while (*p && *p != ',' && *p != '>') v.push_back(*p++);
            }
            hrec_add_kv(rec, k.c_str(), v.c_str());
            if (*p == ',') ++p;
        }
    } else {
        rec = make_hrec(BCF_HL_GEN, key.c_str(), eq + 1);
    }
    h->hrec = (bcf_hrec_t **)realloc(h->hrec,
                                     sizeof(bcf_hrec_t *) * (h->nhrec + 1));
    h->hrec[h->nhrec++] = rec;

    if (coltype == BCF_HL_CTG) {
        int idx = bcf_hrec_find_key(rec, "ID");
        if (idx >= 0) dict_add(h, BCF_DT_CTG, rec->vals[idx], -1, 0, rec);
    } else if (coltype >= 0) {
        int idx = bcf_hrec_find_key(rec, "ID");
        if (idx >= 0) {
            int ni = bcf_hrec_find_key(rec, "Number");
            int ti = bcf_hrec_find_key(rec, "Type");
            uint64_t bits =
                parse_info_bits(ni >= 0 ? rec->vals[ni] : NULL,
                                ti >= 0 ? rec->vals[ti] : NULL, coltype);
            dict_add(h, BCF_DT_ID, rec->vals[idx], coltype, bits, rec);
        }
    }
}

bcf_hdr_t *bcf_hdr_read(htsFile *fp) {
    if (fp->format.format != vcf) vdie("bcf_hdr_read on non-VCF input");
    bcf_hdr_t *h = bcf_hdr_init("r");
    /* implicit PASS at ID 0 (spec) */
    bcf_hrec_t *pass = make_hrec(BCF_HL_FLT, "FILTER", NULL);
    hrec_add_kv(pass, "ID", "PASS");
    dict_add(h, BCF_DT_ID, "PASS",
             BCF_HL_FLT, parse_info_bits("0", NULL, BCF_HL_FLT), pass);
    kstring_t line = KS_INITIALIZE;
    long pos = ftell(fp->shim_fp);
    while (hts_getline(fp, KS_SEP_LINE, &line) >= 0) {
        if (line.l >= 2 && strncmp(line.s, "##", 2) == 0) {
            hdr_parse_line(h, line.s);
        } else if (line.l >= 1 && line.s[0] == '#') {
            /* #CHROM line: samples from column 10 on */
            int nf = 0;
            char *save = line.s;
            char *tok = strtok(save, "\t");
            while (tok) {
                if (++nf > 9) dict_add(h, BCF_DT_SAMPLE, tok, -1, 0, NULL);
                tok = strtok(NULL, "\t");
            }
            pos = ftell(fp->shim_fp);
            break;
        } else {
            fseek(fp->shim_fp, pos, SEEK_SET);
            break;
        }
        pos = ftell(fp->shim_fp);
    }
    free(line.s);
    hdr_sync_arrays(h);
    return h;
}

void bcf_hdr_destroy(bcf_hdr_t *h) {
    if (!h) return; /* leak internals: validation process is short-lived */
    free(h);
}

int bcf_hdr_append(bcf_hdr_t *h, const char *line) {
    hdr_parse_line(h, line);
    hdr_sync_arrays(h);
    return 0;
}

int bcf_hdr_sync(bcf_hdr_t *h) {
    hdr_sync_arrays(h);
    return 0;
}

int bcf_hdr_id2int(const bcf_hdr_t *hdr, int type, const char *id) {
    vdict_t *d = (vdict_t *)hdr->dict[type];
    khint_t k = kh_get(vdict, d, id);
    if (k == kh_end(d)) return -1;
    return kh_val(d, k).id;
}

const char *bcf_hdr_int2id(const bcf_hdr_t *hdr, int type, int int_id) {
    if (int_id < 0 || int_id >= hdr->n[type]) return NULL;
    return hdr->id[type][int_id].key;
}

int bcf_hdr_name2id(const bcf_hdr_t *hdr, const char *id) {
    return bcf_hdr_id2int(hdr, BCF_DT_CTG, id);
}

const char *bcf_hdr_id2name(const bcf_hdr_t *hdr, int rid) {
    return bcf_hdr_int2id(hdr, BCF_DT_CTG, rid);
}

int bcf_hdr_write(htsFile *fp, bcf_hdr_t *h) {
    (void)fp;
    (void)h;
    vdie("bcf_hdr_write");
    return -1;
}

/* ------------------------------------------------------------- record */
bcf1_t *bcf_init(void) { return (bcf1_t *)calloc(1, sizeof(bcf1_t)); }

static void fmt_free(bcf1_t *v) {
    for (int i = 0; i < (int)v->n_fmt; ++i) free(v->d.fmt[i].p);
    free(v->d.fmt);
    v->d.fmt = NULL;
}

void bcf_clear(bcf1_t *v) {
    fmt_free(v);
    free(v->d.als);
    free(v->d.allele);
    free(v->d.flt);
    free(v->d.id);
    free(v->d.raw.s);
    kstring_t sh = v->shared, in = v->indiv;
    memset(v, 0, sizeof(*v));
    v->shared = sh;
    v->indiv = in;
    v->rid = -1;
}

void bcf_empty(bcf1_t *v) { bcf_clear(v); }

void bcf_destroy(bcf1_t *v) {
    if (!v) return;
    bcf_clear(v);
    free(v->shared.s);
    free(v->indiv.s);
    free(v);
}

int bcf_unpack(bcf1_t *b, int which) {
    (void)b;
    (void)which; /* shim parses eagerly */
    return 0;
}

static int fmt_type_of(const char *vals, int is_gt) {
    if (is_gt) return BCF_BT_INT32;
    int has_float = 0;
    for (const char *p = vals; *p; ++p) {
        if (*p == '.' || *p == 'e' || *p == 'E') has_float = 1;
        if (isalpha((unsigned char)*p) && *p != 'e' && *p != 'E')
            return BCF_BT_CHAR;
        if (*p == '-' || *p == '+' || *p == ',' || *p == ':' ||
            isdigit((unsigned char)*p) || *p == '.' || *p == 'e' ||
            *p == 'E')
            continue;
        return BCF_BT_CHAR;
    }
    return has_float ? BCF_BT_FLOAT : BCF_BT_INT32;
}

int vcf_parse1(kstring_t *s, const bcf_hdr_t *h, bcf1_t *v) {
    bcf_clear(v);
    kputsn(s->s, s->l, &v->d.raw);

    std::vector<char *> cols;
    {
        char *p = v->d.raw.s;
        cols.push_back(p);
        for (char *c = p; *c; ++c)
            if (*c == '\t') {
                *c = 0;
                cols.push_back(c + 1);
            }
    }
    if (cols.size() < 8) return -1;
    v->rid = bcf_hdr_id2int(h, BCF_DT_CTG, cols[0]);
    if (v->rid < 0) {
        fprintf(stderr, "[htshim/vcf] contig %s not in header\n", cols[0]);
        abort();
    }
    v->pos = atoi(cols[1]) - 1;
    v->d.id = strdup(cols[2]);
    /* alleles */
    const char *ref = cols[3];
    const char *alt = cols[4];
    v->rlen = (int32_t)strlen(ref);
    std::vector<std::string> als;
    als.push_back(ref);
    if (strcmp(alt, ".") != 0) {
        std::string cur;
        for (const char *p = alt;; ++p) {
            if (*p == ',' || *p == 0) {
                als.push_back(cur);
                cur.clear();
                if (*p == 0) break;
            } else {
                cur.push_back(*p);
            }
        }
    }
    v->n_allele = (uint32_t)als.size();
    size_t tot = 0;
    for (auto &a : als) tot += a.size() + 1;
    v->d.als = (char *)malloc(tot);
    v->d.allele = (char **)malloc(sizeof(char *) * als.size());
    {
        char *p = v->d.als;
        for (size_t i = 0; i < als.size(); ++i) {
            v->d.allele[i] = p;
            memcpy(p, als[i].c_str(), als[i].size() + 1);
            p += als[i].size() + 1;
        }
    }
    v->d.m_allele = (int)als.size();
    /* qual */
    if (strcmp(cols[5], ".") == 0)
        memcpy(&v->qual, &bcf_float_missing, 4);
    else
        v->qual = (float)atof(cols[5]);
    /* filter */
    if (strcmp(cols[6], ".") == 0) {
        v->d.n_flt = 0;
    } else {
        std::vector<int> ids;
        std::string cur;
        for (const char *p = cols[6];; ++p) {
            if (*p == ';' || *p == 0) {
                int fid = bcf_hdr_id2int(h, BCF_DT_ID, cur.c_str());
                if (fid >= 0) ids.push_back(fid);
                cur.clear();
                if (*p == 0) break;
            } else {
                cur.push_back(*p);
            }
        }
        v->d.n_flt = (int)ids.size();
        v->d.flt = (int *)malloc(sizeof(int) * (ids.size() + 1));
        for (size_t i = 0; i < ids.size(); ++i) v->d.flt[i] = ids[i];
    }
    /* INFO skipped (demuxlet never reads it) */
    v->n_info = 0;
    v->n_sample = (uint32_t)h->n[BCF_DT_SAMPLE];
    v->n_fmt = 0;
    v->unpacked = BCF_UN_ALL;
    if (cols.size() < 10) return 0;

    /* FORMAT keys */
    std::vector<std::string> keys;
    {
        std::string cur;
        for (const char *p = cols[8];; ++p) {
            if (*p == ':' || *p == 0) {
                keys.push_back(cur);
                cur.clear();
                if (*p == 0) break;
            } else {
                cur.push_back(*p);
            }
        }
    }
    int nfmt = (int)keys.size();
    int nsmpl = (int)v->n_sample;
    if ((int)cols.size() < 9 + nsmpl) vdie("VCF row with missing samples");

    /* split each sample into per-key strings */
    std::vector<std::vector<std::string>> svals(
        (size_t)nsmpl, std::vector<std::string>((size_t)nfmt, "."));
    for (int sidx = 0; sidx < nsmpl; ++sidx) {
        const char *p = cols[9 + sidx];
        int ki = 0;
        std::string cur;
        for (;; ++p) {
            if (*p == ':' || *p == 0) {
                if (ki < nfmt) svals[sidx][ki] = cur;
                cur.clear();
                ki++;
                if (*p == 0) break;
            } else {
                cur.push_back(*p);
            }
        }
    }

    v->n_fmt = (uint32_t)nfmt;
    v->d.fmt = (bcf_fmt_t *)calloc((size_t)nfmt, sizeof(bcf_fmt_t));
    for (int ki = 0; ki < nfmt; ++ki) {
        bcf_fmt_t *f = &v->d.fmt[ki];
        f->id = bcf_hdr_id2int(h, BCF_DT_ID, keys[ki].c_str());
        int is_gt = keys[ki] == "GT";
        /* per-sample value counts & type */
        int n = 1, type = BCF_BT_INT32;
        int saw_any = 0;
        for (int sidx = 0; sidx < nsmpl; ++sidx) {
            const std::string &val = svals[sidx][ki];
            int cnt = 1;
            char sep = is_gt ? '/' : ',';
            for (char c : val)
                if (c == sep || (is_gt && c == '|')) cnt++;
            if (cnt > n) n = cnt;
            if (!is_gt && val != "." && !saw_any) {
                type = fmt_type_of(val.c_str(), 0);
                saw_any = 1;
            }
        }
        if (is_gt) type = BCF_BT_INT32;
        if (type == BCF_BT_CHAR) {
            size_t maxlen = 1;
            for (int sidx = 0; sidx < nsmpl; ++sidx)
                if (svals[sidx][ki].size() > maxlen)
                    maxlen = svals[sidx][ki].size();
            f->n = (int)maxlen;
            f->size = (int)maxlen;
            f->type = BCF_BT_CHAR;
            f->p = (uint8_t *)calloc((size_t)nsmpl, maxlen);
            for (int sidx = 0; sidx < nsmpl; ++sidx) {
                const std::string &val = svals[sidx][ki];
                memcpy(f->p + (size_t)sidx * maxlen, val.c_str(),
                       val.size());
                for (size_t z = val.size(); z < maxlen; ++z)
                    f->p[(size_t)sidx * maxlen + z] = 0;
            }
            f->p_len = (uint32_t)((size_t)nsmpl * maxlen);
            continue;
        }
        f->n = n;
        f->type = type;
        f->size = (type == BCF_BT_FLOAT || type == BCF_BT_INT32) ? 4 : 4;
        f->p = (uint8_t *)calloc((size_t)nsmpl * (size_t)n, 4);
        for (int sidx = 0; sidx < nsmpl; ++sidx) {
            const std::string &val = svals[sidx][ki];
            /* tokenize */
            std::vector<std::string> toks;
            {
                std::string cur;
                char sep = is_gt ? '/' : ',';
                int phased = 0;
                for (char c : val) {
                    if (c == sep || (is_gt && c == '|')) {
                        if (is_gt && c == '|') phased = 1;
                        toks.push_back(cur);
                        cur.clear();
                    } else {
                        cur.push_back(c);
                    }
                }
                toks.push_back(cur);
                (void)phased;
            }
            for (int vi = 0; vi < n; ++vi) {
                uint8_t *dst = f->p + ((size_t)sidx * n + vi) * 4;
                if (vi >= (int)toks.size()) {
                    if (type == BCF_BT_FLOAT)
                        memcpy(dst, &bcf_float_vector_end, 4);
                    else {
                        int32_t e = bcf_int32_vector_end;
                        memcpy(dst, &e, 4);
                    }
                    continue;
                }
                const std::string &t = toks[(size_t)vi];
                if (is_gt) {
                    int32_t code;
                    if (t == "." || t.empty())
                        code = bcf_gt_missing;
                    else
                        code = bcf_gt_unphased(atoi(t.c_str()));
                    memcpy(dst, &code, 4);
                } else if (type == BCF_BT_FLOAT) {
                    if (t == "." || t.empty())
                        memcpy(dst, &bcf_float_missing, 4);
                    else {
                        float x = (float)atof(t.c_str());
                        memcpy(dst, &x, 4);
                    }
                } else {
                    int32_t x = (t == "." || t.empty())
                                    ? bcf_int32_missing
                                    : atoi(t.c_str());
                    memcpy(dst, &x, 4);
                }
            }
        }
        f->p_len = (uint32_t)((size_t)nsmpl * (size_t)n * 4);
    }
    return 0;
}

int bcf_read(htsFile *fp, const bcf_hdr_t *h, bcf1_t *v) {
    kstring_t line = KS_INITIALIZE;
    int r;
    do {
        r = hts_getline(fp, KS_SEP_LINE, &line);
        if (r < 0) {
            free(line.s);
            return -1;
        }
    } while (line.l == 0 || line.s[0] == '#');
    int ret = vcf_parse1(&line, h, v);
    free(line.s);
    return ret;
}

int vcf_format(const bcf_hdr_t *h, const bcf1_t *v, kstring_t *s) {
    (void)h;
    if (v->d.raw.s) kputsn(v->d.raw.s, strlen(v->d.raw.s), s);
    return 0;
}

int bcf_write(htsFile *fp, bcf_hdr_t *h, bcf1_t *v) {
    (void)fp;
    (void)h;
    (void)v;
    vdie("bcf_write");
    return -1;
}

int bcf_get_variant_types(bcf1_t *rec) {
    int t = VCF_REF;
    for (int i = 1; i < (int)rec->n_allele; ++i) {
        size_t l = strlen(rec->d.allele[i]);
        if (l == 1 && rec->rlen == 1) t |= VCF_SNP;
        else if ((int)l != rec->rlen) t |= VCF_INDEL;
        else t |= VCF_MNP;
    }
    return t;
}

int bcf_is_snp(bcf1_t *v) {
    if (v->rlen != 1) return 0;
    for (int i = 0; i < (int)v->n_allele; ++i)
        if (strlen(v->d.allele[i]) != 1) return 0;
    return 1;
}

static bcf_fmt_t *find_fmt(const bcf_hdr_t *hdr, bcf1_t *line,
                           const char *tag) {
    int id = bcf_hdr_id2int(hdr, BCF_DT_ID, tag);
    if (id < 0) return NULL;
    for (int i = 0; i < (int)line->n_fmt; ++i)
        if (line->d.fmt[i].id == id) return &line->d.fmt[i];
    return NULL;
}

bcf_fmt_t *bcf_get_fmt(const bcf_hdr_t *hdr, bcf1_t *line, const char *key) {
    return find_fmt(hdr, line, key);
}

int bcf_get_format_values(const bcf_hdr_t *hdr, bcf1_t *line,
                          const char *tag, void **dst, int *ndst, int type) {
    bcf_fmt_t *f = find_fmt(hdr, line, tag);
    if (!f) return -3;
    int nsmpl = (int)line->n_sample;
    int n = f->n * nsmpl;
    if (type == BCF_HT_STR) {
        if (f->type != BCF_BT_CHAR) return -4;
        if (*ndst < n) {
            *dst = realloc(*dst, (size_t)n);
            *ndst = n;
        }
        memcpy(*dst, f->p, (size_t)n);
        return n;
    }
    if (*ndst < n) {
        *dst = realloc(*dst, (size_t)n * 4);
        *ndst = n;
    }
    for (int i = 0; i < n; ++i) {
        const uint8_t *src = f->p + (size_t)i * 4;
        if (type == BCF_HT_INT) {
            int32_t x;
            if (f->type == BCF_BT_FLOAT) {
                float fx;
                memcpy(&fx, src, 4);
                x = (int32_t)fx;
            } else {
                memcpy(&x, src, 4);
            }
            ((int32_t *)*dst)[i] = x;
        } else {
            float x;
            if (f->type == BCF_BT_FLOAT) {
                memcpy(&x, src, 4);
                ((float *)*dst)[i] = x;
            } else {
                int32_t ix;
                memcpy(&ix, src, 4);
                if (ix == bcf_int32_missing)
                    memcpy(&((float *)*dst)[i], &bcf_float_missing, 4);
                else if (ix == bcf_int32_vector_end)
                    memcpy(&((float *)*dst)[i], &bcf_float_vector_end, 4);
                else
                    ((float *)*dst)[i] = (float)ix;
            }
        }
    }
    return n;
}

int bcf_get_format_string(const bcf_hdr_t *hdr, bcf1_t *line,
                          const char *tag, char ***dst, int *ndst) {
    bcf_fmt_t *f = find_fmt(hdr, line, tag);
    if (!f || f->type != BCF_BT_CHAR) return -3;
    int nsmpl = (int)line->n_sample;
    /* htslib contract: caller frees dst[0] (the string block) and dst
     * (the pointer array) separately — two allocations required */
    char **ptrs = (char **)malloc(sizeof(char *) * (size_t)nsmpl);
    char *buf = (char *)malloc((size_t)nsmpl * ((size_t)f->n + 1));
    for (int i = 0; i < nsmpl; ++i) {
        ptrs[i] = buf + (size_t)i * ((size_t)f->n + 1);
        memcpy(ptrs[i], f->p + (size_t)i * (size_t)f->n, (size_t)f->n);
        ptrs[i][f->n] = 0;
    }
    *dst = ptrs;
    *ndst = nsmpl;
    return nsmpl;
}

int bcf_update_format(const bcf_hdr_t *hdr, bcf1_t *line, const char *key,
                      const void *values, int n, int type) {
    (void)hdr;
    (void)line;
    (void)key;
    (void)values;
    (void)n;
    (void)type;
    vdie("bcf_update_format");
    return -1;
}

int bcf_update_format_string_shim(const bcf_hdr_t *hdr, bcf1_t *line,
                                  const char *key, const char **values,
                                  int n) {
    (void)hdr;
    (void)line;
    (void)key;
    (void)values;
    (void)n;
    vdie("bcf_update_format_string");
    return -1;
}

int bcf_update_id(const bcf_hdr_t *hdr, bcf1_t *line, const char *id) {
    (void)hdr;
    free(line->d.id);
    line->d.id = strdup(id);
    return 0;
}

} /* extern "C" */
