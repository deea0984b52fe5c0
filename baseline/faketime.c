/* LD_PRELOAD shim: pin time(NULL) to FAKE_TIME (default 42).
 *
 * The reference seeds every PRNG from the wall clock (reference
 * statistics/fisher/cFisher.c:77-79, statistics/css/css.c:112-115: an
 * unsigned-short truncation of time(NULL) for nrand48,
 * srand48(time(NULL)) for the SMACOF restarts), which is the
 * ONLY obstacle to differentially testing its stochastic outputs.
 * Preloading this shim makes the compiled reference fully
 * deterministic, so the oracle's exact rand48 replicas
 * (oracle/reference.py compute_fet_c_replica) can be compared bitwise.
 * gettimeofday (used for wall-clock printfs only) is left untouched.
 */
#include <stdlib.h>
#include <time.h>

time_t time(time_t *t) {
    const char *e = getenv("FAKE_TIME");
    time_t v = e ? (time_t)atoll(e) : (time_t)42;
    if (t) *t = v;
    return v;
}
