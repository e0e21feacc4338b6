/* Minimal vcfutils.h placeholder for the reference-validation build. */
#ifndef HTSHIM_VCFUTILS_H
#define HTSHIM_VCFUTILS_H
#include "htslib/vcf.h"
#endif
