#!/bin/bash
# Build the reference C kernels (UNMODIFIED, compiled in place from
# /root/reference) into honest-baseline timing binaries.
#
# Mirrors the reference build flags (css_setup.sh:7-13,
# fisher_parallel_setup.sh:13 — icc -O3 -xAVX -mavx -fPIC; the '-03'
# typo in fisher_parallel_setup.sh:13 is fixed here as -O3) with gcc,
# the compiler available in this image.  GSL is satisfied by the shim
# in gslshim/ (only css.c's cmds path uses it; see gsl_shim.c).
set -euo pipefail

HERE="$(cd "$(dirname "$0")" && pwd)"
REF=/root/reference/statistics
BUILD="$HERE/build"
mkdir -p "$BUILD"

# -fgnu89-inline: the reference uses bare `inline` definitions
# (cFisher.c:124 etc.) that only link under gnu89 inline semantics
# (icc's default); without it gcc emits no out-of-line symbol.
CFLAGS="-DNDEBUG -O3 -mavx -fPIC -pthread -fgnu89-inline"

# --- FET: cFisher.c + threadfisher.c + comparative.c + driver ---
gcc $CFLAGS -I"$REF/fisher" \
    -o "$BUILD/bench_ref_fet" \
    "$HERE/bench_ref_fet.c" \
    "$REF/fisher/cFisher.c" \
    "$REF/fisher/threadfisher.c" \
    "$REF/fisher/comparative.c" \
    -lm -lpthread

# --- CSS: css.c + threadcss.c + comparative.c + gsl shim + driver ---
gcc $CFLAGS -I"$REF/css" -I"$HERE/gslshim" \
    -o "$BUILD/bench_ref_css" \
    "$HERE/bench_ref_css.c" \
    "$REF/css/css.c" \
    "$REF/css/threadcss.c" \
    "$REF/css/comparative.c" \
    "$HERE/gslshim/gsl_shim.c" \
    -lm -lpthread

# --- faketime preload: pins time(NULL) so the reference's wall-clock
# PRNG seeding becomes deterministic (differential tests of the
# stochastic columns) ---
gcc -O2 -fPIC -shared -o "$BUILD/libfaketime.so" "$HERE/faketime.c"

# --- strict-fp probe variants: identical sources, -ffp-contract=off so
# every C expression rounds per-operation and the oracle's exact op-order
# replicas can match bit-for-bit (gcc contracts a*b+c to fma by default,
# which is unreplicable from numpy).  Timing baselines above keep the
# default contraction — these are for differential exactness tests only.
gcc $CFLAGS -ffp-contract=off -I"$REF/fisher" \
    -o "$BUILD/bench_ref_fet_strict" \
    "$HERE/bench_ref_fet.c" \
    "$REF/fisher/cFisher.c" \
    "$REF/fisher/threadfisher.c" \
    "$REF/fisher/comparative.c" \
    -lm -lpthread
gcc $CFLAGS -ffp-contract=off -I"$REF/css" -I"$HERE/gslshim" \
    -o "$BUILD/bench_ref_css_strict" \
    "$HERE/bench_ref_css.c" \
    "$REF/css/css.c" \
    "$REF/css/threadcss.c" \
    "$REF/css/comparative.c" \
    "$HERE/gslshim/gsl_shim.c" \
    -lm -lpthread

echo "built: $BUILD/bench_ref_fet $BUILD/bench_ref_css $BUILD/libfaketime.so"
