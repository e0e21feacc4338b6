/* Minimal kseq.h placeholder for the reference-validation build (the
 * upstream sources include it but use no kseq_* entry points). */
#ifndef HTSHIM_KSEQ_H
#define HTSHIM_KSEQ_H
#endif
