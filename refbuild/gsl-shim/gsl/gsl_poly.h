/* shim: forwards to the single-core shim header */
#include "gsl_shim_core.h"
