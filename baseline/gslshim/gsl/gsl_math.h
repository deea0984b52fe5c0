/* shim header for the reference build — see ../gsl_shim.h */
#include <math.h>
#include "../gsl_shim.h"
