/* Timing driver for the reference FET kernel (honest C baseline).
 *
 * Links the UNMODIFIED reference objects (cFisher.c, threadfisher.c,
 * comparative.c from /root/reference/statistics/fisher) and times
 * `compute` (serial) or `threadcompute` (64-thread pool) on a GTrack
 * pair, following the reference's own protocol (testFisher.c:138-312:
 * read valued-point rows, regend = last position + 1, wsize=2500,
 * wstep=500, perc=0.95, wall-clock around the compute call).
 *
 * Usage: bench_ref_fet <gtrackA> <gtrackB> <serial|thread> [regend]
 * Prints: WINDOWS/NONZERO/WALL lines for the python runner to parse.
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <sys/time.h>

#include "cFisher.h"
#include "comparative.h"
#include "threadfisher.h"

static int read_gtrack(const char *path, int **pos_out, double **val_out) {
    FILE *f = fopen(path, "r");
    char line[256];
    int cap = 1 << 20, count = 0, header = 0;
    int *pos;
    double *val;
    if (!f) {
        fprintf(stderr, "cannot open %s\n", path);
        exit(1);
    }
    pos = (int *)malloc(cap * sizeof(int));
    val = (double *)malloc(cap * sizeof(double));
    while (fgets(line, sizeof(line), f)) {
        char *tab;
        if (line[0] == '#' || header < 5) {
            header++; /* reference harness skips 5 header lines */
            continue;
        }
        tab = strchr(line, '\t');
        if (!tab) continue;
        if (count == cap) {
            cap *= 2;
            pos = (int *)realloc(pos, cap * sizeof(int));
            val = (double *)realloc(val, cap * sizeof(double));
        }
        pos[count] = (int)strtol(tab, &tab, 10);
        val[count] = strtod(tab, NULL);
        count++;
    }
    fclose(f);
    *pos_out = pos;
    *val_out = val;
    return count;
}

int main(int argc, char *argv[]) {
    int *apos, *bpos;
    double *avals, *bvals, *scores, *stddev;
    int acount, bcount, regend, totalpos, i, nonzero = 0;
    int wsize = 2500, wstep = 500;
    double perc = 0.95;
    /* WSIZE / WSTEP: window-geometry overrides for differential parity
     * tests (default is the reference protocol). */
    {
        const char *e;
        if ((e = getenv("WSIZE")) && atoi(e) > 0) wsize = atoi(e);
        if ((e = getenv("WSTEP")) && atoi(e) > 0) wstep = atoi(e);
    }
    struct timeval before, after;

    if (argc < 4) {
        fprintf(stderr,
                "usage: %s <gtrackA> <gtrackB> <serial|thread> [regend]\n",
                argv[0]);
        return 1;
    }
    acount = read_gtrack(argv[1], &apos, &avals);
    bcount = read_gtrack(argv[2], &bpos, &bvals);
    regend = apos[acount - 1] + 1;
    if (argc > 4) {
        int r = atoi(argv[4]);
        if (r > 0 && r < regend) regend = r;
    }
    totalpos = regend / wstep;
    scores = (double *)calloc(totalpos, sizeof(double));
    stddev = (double *)calloc(totalpos, sizeof(double));

    gettimeofday(&before, NULL);
    if (strcmp(argv[3], "thread") == 0) {
        threadcompute(avals, bvals, apos, bpos, 0, regend, wsize, wstep,
                      acount, bcount, perc, scores, stddev);
    } else {
        compute(avals, bvals, apos, bpos, 0, regend, wsize, wstep, acount,
                bcount, perc, scores, stddev);
    }
    gettimeofday(&after, NULL);

    for (i = 0; i < totalpos; i++)
        if (scores[i] != 0) nonzero++;

    /* DUMP_SCORES=<path>: per-slot "<i> <score> <stddev>" rows for
     * differential parity tests.  The score column is deterministic
     * (bitwise-comparable); stddev is bootstrap-RNG-dependent —
     * wall-clock seeded at cFisher.c:79-81 — and comparable only in
     * distribution. */
    {
        const char *dump = getenv("DUMP_SCORES");
        if (dump) {
            FILE *df = fopen(dump, "w");
            if (!df) {
                fprintf(stderr, "cannot open %s\n", dump);
                return 1;
            }
            for (i = 0; i < totalpos; i++)
                fprintf(df, "%d %.17g %.17g\n", i, scores[i], stddev[i]);
            fclose(df);
        }
    }

    printf("WINDOWS %d\n", totalpos);
    printf("NONZERO %d\n", nonzero);
    printf("WALL %f\n", time_ddiff(before, after));
    return 0;
}
