/* Stub for the vendored bcftools filter engine: demuxlet never exposes
 * --include-expr/--exclude-expr, so vfilt.filt stays NULL and these are
 * unreachable (SURVEY.md section 2 row 8). Abort loudly if ever hit. */
#include <cstdio>
#include <cstdlib>

#include "htslib/vcf.h"
#include "filter.h"

filter_t *filter_init(bcf_hdr_t *hdr, const char *str) {
    (void)hdr;
    (void)str;
    fprintf(stderr, "[htshim] filter expressions unsupported\n");
    abort();
}
int filter_test(filter_t *filter, bcf1_t *rec, const uint8_t **samples) {
    (void)filter;
    (void)rec;
    (void)samples;
    abort();
}
void filter_destroy(filter_t *filter) { (void)filter; }
int filter_max_unpack(filter_t *filter) { (void)filter; return 0; }
