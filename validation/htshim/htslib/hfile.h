/* Minimal hfile.h for the reference-validation build. */
#ifndef HTSHIM_HFILE_H
#define HTSHIM_HFILE_H
#include "htslib/hts.h"
#endif
