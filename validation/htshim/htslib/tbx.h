/* Minimal tbx.h for the reference-validation build: tabix regions are
 * unsupported (abort if used). */
#ifndef HTSHIM_TBX_H
#define HTSHIM_TBX_H
#include "htslib/hts.h"
#ifdef __cplusplus
extern "C" {
#endif
typedef struct tbx_t tbx_t;
tbx_t *tbx_index_load(const char *fn);
void tbx_destroy(tbx_t *tbx);
hts_itr_t *tbx_itr_querys_shim(tbx_t *tbx, const char *s);
#define tbx_itr_querys(tbx, s) tbx_itr_querys_shim(tbx, s)
int tbx_itr_next_shim(htsFile *fp, tbx_t *tbx, hts_itr_t *itr, void *data);
#define tbx_itr_next(fp, tbx, itr, d) tbx_itr_next_shim(fp, tbx, itr, d)
#define tbx_itr_destroy(itr) hts_itr_destroy(itr)
#ifdef __cplusplus
}
#endif
#endif
