#ifndef NTL_SHIM_MAT_ZZ_H
#define NTL_SHIM_MAT_ZZ_H

// Included by the fork but unused at any call site; the ZZ_p shims carry
// everything needed.
#include <NTL/mat_ZZ_p.h>

#endif
