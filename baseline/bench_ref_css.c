/* Timing driver for the reference CSS kernel (honest C baseline).
 *
 * Links the UNMODIFIED reference objects (css.c, threadcss.c,
 * comparative.c from /root/reference/statistics/css, GSL calls
 * satisfied by ../gslshim) and times `compute` (serial) or
 * `threadcompute` (64-thread pool), following the reference protocol
 * (testcss.c:145-334: wsize=2500, wstep=500, treshold=10, runs=200000,
 * wall-clock around the compute call).
 *
 * Usage: bench_ref_css <gtrackA> <gtrackB> <serial|thread> [regend]
 *        [mdsalg (default 0=cmds)] [drosophila (default 0)]
 * Prints: WINDOWS/NONZERO/WALL lines for the python runner to parse.
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <sys/time.h>

#include "comparative.h"
#include "css.h"
#include "threadcss.h"

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
            header++;
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
    double *avals, *bvals, *scores, *p;
    int acount, bcount, regend, totalpos, i, nonzero = 0;
    int wsize = 2500, wstep = 500, treshold = 10, runs = 200000;
    int drosophila = 0, mdsalg = 0;
    struct timeval before, after;

    if (argc < 4) {
        fprintf(stderr,
                "usage: %s <gtrackA> <gtrackB> <serial|thread> [regend] "
                "[mdsalg] [drosophila]\n",
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
    if (argc > 5) mdsalg = atoi(argv[5]);
    if (argc > 6) drosophila = atoi(argv[6]);
    /* CSS_TRESHOLD / CSS_RUNS: cheap-MC overrides for differential
     * parity tests (scores are MC-independent; only p consumes runs).
     * WSIZE / WSTEP: window-geometry overrides, same purpose. */
    {
        const char *e;
        if ((e = getenv("CSS_TRESHOLD")) && atoi(e) > 0) treshold = atoi(e);
        if ((e = getenv("CSS_RUNS")) && atoi(e) > 0) runs = atoi(e);
        if ((e = getenv("WSIZE")) && atoi(e) > 0) wsize = atoi(e);
        if ((e = getenv("WSTEP")) && atoi(e) > 0) wstep = atoi(e);
    }
    totalpos = regend / wstep;
    scores = (double *)calloc(totalpos, sizeof(double));
    p = (double *)calloc(totalpos, sizeof(double));

    gettimeofday(&before, NULL);
    if (strcmp(argv[3], "thread") == 0) {
        threadcompute(avals, bvals, apos, bpos, 0, regend, wsize, wstep,
                      acount, bcount, treshold, runs, drosophila, mdsalg,
                      scores, p);
    } else {
        compute(avals, bvals, apos, bpos, 0, regend, wsize, wstep, acount,
                bcount, treshold, runs, drosophila, mdsalg, scores, p);
    }
    gettimeofday(&after, NULL);

    for (i = 0; i < totalpos; i++)
        if (scores[i] != 0) nonzero++;

    /* DUMP_SCORES=<path>: per-slot "<i> <score> <p>" rows for
     * differential parity tests.  The score column is deterministic
     * (bitwise-comparable); p is MC-RNG-dependent — wall-clock seeded
     * at css.c:112-115 — and comparable only in distribution. */
    {
        const char *dump = getenv("DUMP_SCORES");
        if (dump) {
            FILE *df = fopen(dump, "w");
            if (!df) {
                fprintf(stderr, "cannot open %s\n", dump);
                return 1;
            }
            for (i = 0; i < totalpos; i++)
                fprintf(df, "%d %.17g %.17g\n", i, scores[i], p[i]);
            fclose(df);
        }
    }

    printf("WINDOWS %d\n", totalpos);
    printf("NONZERO %d\n", nonzero);
    printf("WALL %f\n", time_ddiff(before, after));
    return 0;
}
