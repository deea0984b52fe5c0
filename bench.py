"""Benchmark harness: FET/CSS engine throughput vs the measured baselines.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}

Protocol (BASELINE.md): the reference publishes no numbers, so the
baselines are (a) the CPU oracle (exact reference semantics, CPython,
serial) and (b) the reference C itself compiled with gcc -O3 -mavx and
run through its own 64-thread pool on this machine
(baseline/run_baseline.py -> baseline/RESULTS.json).  Workload = the
reference default FET scan (wsize=2500, wstep=500, perc=0.95, 100
bootstrap replicates, stickleback panel 11+10 individuals) on one
synthetic chromosome; CSS = the worst-case adaptive MC (every window
divergent -> full 200k permutations).

Extras in the JSON line: css_perms_per_sec, achieved FLOP/s and MFU from
an analytic FLOP model (see _fet_flops/_css_mc_flops), and the
reference-C comparison when baseline/RESULTS.json exists.
"""

from __future__ import annotations

import json
import pathlib
import sys
import time

import numpy as np

# v5e chip peak: 197 TFLOP/s bf16 / 394 TOPS int8 (public spec).  The
# engines' fast path computes in f32; MFU is reported against the bf16
# peak to keep the denominator the hardware's headline number.
PEAK_FLOPS = 197e12


def _timed_runs(fn, n: int) -> list[float]:
    """Wall-clock ``fn()`` ``n`` times (after the caller's warmup run).

    The remote-compile tunnel produces binaries of varying quality (up to
    5x run-to-run on identical HLO, BASELINE.md), so every headline
    metric is reported as min AND median over n>=3 runs — single
    best-of-N numbers cannot distinguish a 20% regression from noise
    across rounds (VERDICT r3 weak #5)."""
    times = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        times.append(time.perf_counter() - t0)
    return times


def make_chromosome(npos: int, region: int, asize: int, bsize: int, seed: int):
    rng = np.random.default_rng(seed)
    if npos > 500_000:
        # materializing arange(region) for choice(replace=False) costs
        # GBs at chromosome-1 scale; oversampled unique ints give the
        # same sorted-distinct-position contract (different stream, so
        # gated to the new large sizes — existing workloads keep their
        # round-2..4 content for cross-round comparability)
        cand = rng.integers(1, region, size=int(npos * 1.05) + 64)
        positions = np.unique(cand)
        assert len(positions) >= npos, (len(positions), npos)
        positions = positions[
            np.sort(rng.choice(len(positions), npos, replace=False))
        ]
    else:
        positions = np.sort(
            rng.choice(
                np.arange(1, region, dtype=np.int64), npos, replace=False
            )
        )

    def draw(size):
        p_major = rng.uniform(0.2, 0.9, size=(npos, 1))
        g = rng.random((npos, size))
        het = p_major * (1 - p_major) * 2
        mat = np.where(
            g < p_major**2,
            3.0,
            np.where(g < p_major**2 + het, 0.0, -3.0),
        )
        miss = rng.random((npos, size)) < 0.03
        return np.where(miss, -10000.0, mat)

    return positions, draw(asize), draw(bsize)


def _fet_flops(n_snps: int, maxs: int, nsamples: int, n_windows: int,
               avg_npos: float, asize: int = 11, bsize: int = 10) -> float:
    """Analytic FLOP model of the FET path — models the work the engine
    ACTUALLY performs (per-SNP tests are computed once per chromosome,
    kernels/fet.py:fet_snp_logs; windows re-gather, sort, and bootstrap).

    The support scan runs once per POSSIBLE table when the LUT path is
    active ((asize+1)^2(bsize+1)^2 grid entries), else once per SNP; ~12
    flop-equivalents per support point (lgamma-sum terms, exp,
    compare-accumulate; transcendentals counted as 1).  fet_snp_logs'
    LUT switch is panel-static since round 5 (kernels/fet.py:lut_active
    — chromosome-length-independent so host partitioning cannot flip
    the branch); the model mirrors it through the same predicate.
    Per SNP: table counting (4 masked compare-reduces over asize+bsize
    genotypes) and the LUT gather.  Per window: an ascending sort
    (~2 P log2 P compare-swaps) and nsamples order-statistic bootstrap
    replicates (~8 ops each)."""
    from divergence_tpu.kernels.fet import lut_active

    grid = (asize + 1) ** 2 * (bsize + 1) ** 2
    support_units = grid if lut_active(asize, bsize) else n_snps
    support = support_units * maxs * 12.0
    count = n_snps * (asize + bsize) * 4.0 + n_snps
    sort = n_windows * avg_npos * np.log2(max(avg_npos, 2.0)) * 2.0
    bootstrap = n_windows * nsamples * 8.0
    return support + count + sort + bootstrap


def _css_mc_flops(perms: int, m: int) -> float:
    """Analytic FLOP model of the rank-fused permutation MC
    (kernels/perm.py:_perm_scores): per permutation, ~10 elementwise
    flop-equivalents per m^2 cell (pairwise compares + rank reduce +
    coefficient assembly + the final reduce against D)."""
    return perms * 10.0 * m**2


def _probe_backend(timeout_s: int, attempts: int, wait_s: int) -> bool:
    """True if a non-CPU JAX backend initializes within the timeout.

    Run in a subprocess: a wedged remote-TPU tunnel blocks backend init
    indefinitely and a thread cannot be killed.  Retries with a pause —
    round 1's capture fell back to CPU because the tunnel was down at
    the single probe attempt (VERDICT item 1)."""
    import subprocess

    for i in range(attempts):
        if i:
            print(
                f"[bench] backend probe attempt {i} failed; "
                f"retrying in {wait_s}s",
                file=sys.stderr,
            )
            time.sleep(wait_s)
        try:
            r = subprocess.run(
                [
                    sys.executable,
                    "-c",
                    "import divergence_tpu, jax; d = jax.devices(); "
                    "assert d[0].platform != 'cpu', d; print('ok')",
                ],
                timeout=timeout_s,
                capture_output=True,
            )
            if r.returncode == 0 and b"ok" in r.stdout:
                return True
        except subprocess.SubprocessError:
            pass
    return False


def _ref_c_numbers() -> dict:
    """The gcc-built reference C results, if captured on this machine."""
    p = pathlib.Path(__file__).parent / "baseline" / "RESULTS.json"
    if not p.exists():
        return {}
    try:
        return json.loads(p.read_text())
    except (OSError, json.JSONDecodeError):
        return {}


def _wait_for_capture_battery(max_wait_s: int = 5400) -> None:
    """If the tunnel-watcher's one-shot capture battery is mid-run
    (baseline/tunnel_watch.sh -> run_tpu_capture.sh), wait for it: two
    concurrent claimants of the single remote chip have been observed
    to wedge the tunnel, and the driver-invoked bench must not sabotage
    (or be sabotaged by) the battery.  The lock is the battery's
    RUNNING marker; stale markers (no mtime progress for 2h) are
    ignored."""
    import os

    if os.environ.get("CAPTURE_BATTERY") == "1":
        return  # invoked BY the battery itself — its own marker is ours
    lock = pathlib.Path(__file__).parent / "baseline" / "tpu_capture" / "RUNNING"
    waited = 0
    while lock.exists() and waited < max_wait_s:
        if time.time() - lock.stat().st_mtime > 7200:
            break  # stale: battery died without cleanup
        if waited == 0:
            print(
                "[bench] TPU capture battery in progress - waiting",
                file=sys.stderr,
            )
        time.sleep(60)
        waited += 60


def main() -> None:
    import os

    _wait_for_capture_battery()
    cpu_fallback = False
    attempts = int(os.environ.get("BENCH_PROBE_ATTEMPTS", "3"))
    # BENCH_FORCE_FULL=1: run the full (TPU-shaped) benchmark on whatever
    # backend is available — CI validation of the whole script off-TPU
    force_full = os.environ.get("BENCH_FORCE_FULL") == "1"
    if not force_full and (
        attempts == 0
        or not _probe_backend(timeout_s=240, attempts=attempts, wait_s=45)
    ):
        print(
            "[bench] default backend unavailable (tunnel down?) - "
            "falling back to CPU with a reduced workload",
            file=sys.stderr,
        )
        os.environ["JAX_PLATFORMS"] = "cpu"
        cpu_fallback = True

    import jax

    if cpu_fallback:
        jax.config.update("jax_platforms", "cpu")

    import divergence_tpu  # noqa: F401  (x64)
    from divergence_tpu.config import FetConfig
    from divergence_tpu.core.windows import plan_windows
    from divergence_tpu.engine import run_fet
    from divergence_tpu.engine.snp import SnpPair
    from divergence_tpu.kernels import fet as kfet
    from divergence_tpu.oracle import reference as oracle

    asize, bsize = 11, 10
    # FET headline workload: human-chromosome-1 scale (round 5).  The
    # round-2..4 workload (200k SNPs, 10 Mbp, ~0.145s warm) sat on the
    # ~70ms fixed dispatch/RTT floor, so the captured number was at the
    # mercy of tunnel variance and under-reported the chip ~2x
    # (VERDICT r4 weak #1; baseline/exp_fet_floor.py measured the
    # genome-scale execute itself at ~13M tests/s).  40M window-SNP
    # tests put the warm wall >= ~1s even after the round-5 gather +
    # one-hot-pick kernel work (~25-50M tests/s), amortizing fixed
    # costs to <5%.
    region = 400_000_000 if not cpu_fallback else 1_000_000
    npos = 8_000_000 if not cpu_fallback else 20_000
    # precision="fast" (f32) is the production configuration on TPU:
    # scores agree with the f64 path to ~1e-5 relative (docs/PARITY.md)
    # while f64 is software-emulated on this hardware.
    cfg = FetConfig(precision="fast")
    w = cfg.window

    positions, amat, bmat = make_chromosome(npos, region, asize, bsize, 7)
    pair = SnpPair(positions=positions, avals=amat, bvals=bmat)
    plan = plan_windows(positions, region, w.wsize, w.wstep)
    valid = plan.valid_mask()
    # a "SNP FET test" = one per-SNP exact test inside an evaluated window
    n_tests = int(plan.npos[valid].sum())
    n_windows = int(valid.sum())
    avg_npos = n_tests / max(n_windows, 1)

    dev = jax.devices()[0]
    print(
        f"[bench] device={dev.platform} windows={n_windows} "
        f"snp_tests={n_tests}",
        file=sys.stderr,
    )

    # --- TPU engine: warmup (compile) + timed runs; min + median over
    # N runs (binary quality varies run to run on the remote tunnel) ---
    n_runs = int(os.environ.get("BENCH_RUNS", "2" if cpu_fallback else "4"))
    scores = stddev = None

    def _fet_once():
        nonlocal scores, stddev
        scores, stddev = run_fet(pair, region, cfg)

    _fet_once()  # warmup/compile
    fet_times = _timed_runs(_fet_once, n_runs)
    tpu_s = min(fet_times)
    fet_median_s = float(np.median(fet_times))
    tpu_rate = n_tests / tpu_s

    # Degraded-stream detection: a process's tunnel connection can draw
    # a 100-250x-slow stream while the chip itself is fine (verified by
    # killing the process and re-probing — docs/ROUND4.md measurement
    # hygiene).  Flag it so a bad capture is interpretable rather than
    # read as a regression; rate-based so it tracks the workload size
    # (normal >= ~10M tests/s; a degraded stream reads ~100x lower).
    tunnel_degraded = not cpu_fallback and tpu_rate < 1.5e6
    if tunnel_degraded:
        print(
            f"[bench] WARNING: warm FET ran at {tpu_rate:,.0f} tests/s "
            "(>= ~10M expected) — this process likely drew a degraded "
            "tunnel stream; numbers below underreport the chip "
            "(rerun bench.py in a fresh process)",
            file=sys.stderr,
        )

    fet_flops = _fet_flops(
        npos, kfet.support_size(asize, bsize), cfg.bootstrap_samples,
        n_windows, avg_npos, asize, bsize,
    )
    fet_flops_per_s = fet_flops / tpu_s
    fet_mfu = fet_flops_per_s / PEAK_FLOPS

    # --- CPU oracle baseline on a slice, extrapolated ---
    n_slice = 24
    widx = np.nonzero(valid)[0][:n_slice]
    rng = np.random.default_rng(0)
    slice_tests = 0
    t0 = time.perf_counter()
    for i in widx:
        lo, np_ = int(plan.lo[i]), int(plan.npos[i])
        oracle.window_fet(
            amat[lo : lo + np_],
            bmat[lo : lo + np_],
            cfg.percentile,
            cfg.bootstrap_samples,
            rng,
        )
        slice_tests += np_
    oracle_s = time.perf_counter() - t0
    oracle_rate = slice_tests / oracle_s

    vs = tpu_rate / oracle_rate
    print(
        f"[bench] tpu={tpu_s:.3f}s ({tpu_rate:,.0f} tests/s)  "
        f"oracle[{n_slice}w]={oracle_s:.3f}s ({oracle_rate:,.0f} tests/s)  "
        f"speedup={vs:.1f}x  windows/s={n_windows / tpu_s:,.0f}  "
        f"fet_flops/s={fet_flops_per_s:.2e} (mfu={fet_mfu:.4%})",
        file=sys.stderr,
    )
    nz = int(np.count_nonzero(scores))
    print(f"[bench] nonzero-score windows: {nz}", file=sys.stderr)

    ref_c = _ref_c_numbers()
    extras = {
        "fet_windows_per_sec": round(n_windows / tpu_s, 1),
        "fet_flops_per_sec": round(fet_flops_per_s),
        "fet_mfu": round(fet_mfu, 6),
        "bench_runs_n": n_runs,
        "fet_tests_per_sec_median": round(n_tests / fet_median_s, 1),
        "fet_wall_s_min": round(tpu_s, 3),
        "fet_wall_s_median": round(fet_median_s, 3),
    }
    if tunnel_degraded:
        extras["tunnel_degraded"] = True
    if ref_c:
        rate = ref_c.get("fet_thread", {}).get("snp_tests_per_s")
        if rate:
            extras["ref_c_fet_tests_per_sec_64thr"] = rate
            extras["vs_ref_c_fet"] = round(tpu_rate / rate, 2)

    from divergence_tpu.config import CssConfig
    from divergence_tpu.engine import run_css
    from divergence_tpu.utils.summary import RunSummary

    # CPU fallback still measures CSS (the other headline number), on a
    # reduced region so the divergent-window 200k-permutation cap keeps
    # the fallback run in tens of seconds.
    css_npos, css_region = (10_000, 500_000) if not cpu_fallback else (2_000, 100_000)
    cpos, camat, cbmat = make_chromosome(css_npos, css_region, asize, bsize, 11)
    cpair = SnpPair(positions=cpos, avals=camat, bvals=cbmat)
    css_cfg = CssConfig(precision="fast")
    run_css(cpair, css_region, css_cfg)
    cs = csum = None

    def _css_once():
        nonlocal cs, csum
        csum = RunSummary()
        cs, _ = run_css(cpair, css_region, css_cfg, summary=csum)

    css_times = _timed_runs(_css_once, n_runs)
    css_s = min(css_times)
    css_median_s = float(np.median(css_times))
    ncw = int(np.count_nonzero(cs))
    mc = csum.counters.get("mc_permutations", 0)

    css_flops_per_s = _css_mc_flops(mc, asize + bsize) / css_s
    css_mfu = css_flops_per_s / PEAK_FLOPS

    rng_o = np.random.default_rng(0)
    dref = rng_o.random((asize + bsize, asize + bsize))
    dref = dref + dref.T
    np.fill_diagonal(dref, 0.0)
    t0 = time.perf_counter()
    oracle.significance(dref, asize, bsize, 1e9, 10, 3000, rng_o)
    oracle_perm_rate = 3000 / (time.perf_counter() - t0)
    print(
        f"[bench] css: {css_s:.2f}s for {ncw} windows "
        f"({ncw / css_s:,.0f} win/s), {mc / 1e6:.0f}M permutations "
        f"({mc / css_s / 1e6:.0f}M perms/s; oracle "
        f"{oracle_perm_rate / 1e3:.0f}k/s -> "
        f"{mc / css_s / oracle_perm_rate:,.0f}x)  "
        f"css_flops/s={css_flops_per_s:.2e} (mfu={css_mfu:.4%})",
        file=sys.stderr,
    )

    # Since the round-4 shared-stream MC, the worst-case workload's wall
    # is dominated by phase 1 (eigensolves) + fixed tunnel costs, so the
    # e2e css_perms_per_sec no longer measures the MC.  Report the MC
    # phase's own rate (stage timer) alongside.
    mc_stage_s = csum.timings_s.get("css_mc", 0.0)
    extras.update(
        {
            "css_perms_per_sec": round(mc / css_s, 1),
            "css_windows_per_sec": round(ncw / css_s, 2),
            "css_flops_per_sec": round(css_flops_per_s),
            "css_mfu": round(css_mfu, 6),
            "css_perms_per_sec_median": round(mc / css_median_s, 1),
            "css_wall_s_min": round(css_s, 3),
            "css_wall_s_median": round(css_median_s, 3),
            "css_mc_stage_s": round(mc_stage_s, 3),
            "css_mc_perms_per_sec": round(mc / mc_stage_s, 1)
            if mc_stage_s
            else None,
        }
    )

    # 16x worst-case workload (round 5): the historical css_perms_per_sec
    # workload finishes in ~0.2s, where the fixed dispatch/RTT floor
    # (~0.17s measured: a 4x workload ran 796M perms in 0.244s) eats
    # ~75%+ of the wall — the same defect VERDICT r4 weak #1 called out
    # on the FET headline.  The original fields stay byte-identical for
    # round-over-round comparability; this field (16k all-divergent
    # windows, 3.2G perms, ~0.5s wall) measures the chip with fixed
    # costs amortized.
    if not cpu_fallback:
        lpos, lam, lbm = make_chromosome(160_000, 8_000_000, asize, bsize, 11)
        lpair = SnpPair(positions=lpos, avals=lam, bvals=lbm)
        run_css(lpair, 8_000_000, css_cfg)  # warmup/compile
        ls = lsum = None

        def _css_large_once():
            nonlocal ls, lsum
            lsum = RunSummary()
            ls, _ = run_css(lpair, 8_000_000, css_cfg, summary=lsum)

        l_times = _timed_runs(_css_large_once, max(2, n_runs - 1))
        l_s = min(l_times)
        l_mc = lsum.counters.get("mc_permutations", 0)
        print(
            f"[bench] css 16x worst-case: {l_s:.2f}s, {l_mc / 1e6:.0f}M perms "
            f"({l_mc / l_s / 1e6:.0f}M perms/s; median "
            f"{l_mc / float(np.median(l_times)) / 1e6:.0f}M)",
            file=sys.stderr,
        )
        extras["css_perms_per_sec_large"] = round(l_mc / l_s, 1)
        extras["css_perms_per_sec_large_median"] = round(
            l_mc / float(np.median(l_times)), 1
        )
        extras["css_large_wall_s_min"] = round(l_s, 3)

    # Sustained MC throughput at production shape (VERDICT r3 #1): the
    # in-loop shared-stream evaluator over 8192 windows x 256-perm
    # chunks with unreachable scores (every window consumes its full
    # budget) — the steady-state rate of SURVEY §3.2 hot loop B.
    if not cpu_fallback:
        from divergence_tpu.tools.bench_mc import run_mc_bench

        mcb = run_mc_bench(
            window_batch=8192, chunk=256, iters=256,
            backends=("inloop_shared",),
        )
        rate = mcb.get("inloop_shared", {}).get("perms_per_s")
        if rate:
            extras["css_mc_inloop_perms_per_sec"] = rate
            print(
                f"[bench] css MC in-loop (8192x256x256, shared stream): "
                f"{rate / 1e9:.2f}G perms/s",
                file=sys.stderr,
            )

    # mid-scale chromosome: the round-2..4 FET workload (200k SNPs,
    # 10 Mbp, seed 7) — kept byte-identical so css_chrom_scale_* stays
    # comparable across rounds now that the FET headline moved to
    # chromosome-1 scale
    if not cpu_fallback:
        mpos_n, m_region = 200_000, 10_000_000
        mp, ma, mb = make_chromosome(mpos_n, m_region, asize, bsize, 7)
        mpair = SnpPair(positions=mp, avals=ma, bvals=mb)
    else:
        mpair, m_region = pair, region

    # chromosome-scale CSS scan (200k SNPs, ~20k windows, mixed
    # significance like production data): measures the DISPATCH path —
    # genome-sized runs were launch-bound on the remote tunnel
    # (~100 batches x fixed round trip) before the fused one-program
    # sweeps (round 3), which the 997-window worst-case above is too
    # small to expose
    if not cpu_fallback:
        run_css(mpair, m_region, css_cfg)
        gs = gsum = None

        def _chrom_once():
            nonlocal gs, gsum
            gsum = RunSummary()
            gs, _ = run_css(
                mpair, m_region, css_cfg, summary=gsum, seqid="chrG"
            )

        g_times = _timed_runs(_chrom_once, max(2, n_runs - 1))
        g_s = min(g_times)
        g_nw = int(np.count_nonzero(gs))
        g_mc = gsum.counters.get("mc_permutations", 0)
        print(
            f"[bench] css chromosome-scale: {g_s:.2f}s for {g_nw} windows "
            f"({g_nw / g_s:,.0f} win/s, {g_mc / 1e6:.0f}M MC perms)",
            file=sys.stderr,
        )
        extras["css_chrom_scale_windows_per_sec"] = round(g_nw / g_s, 1)
        extras["css_chrom_scale_wall_s"] = round(g_s, 2)
        extras["css_chrom_scale_wall_s_median"] = round(
            float(np.median(g_times)), 2
        )

    # Approx (Pearson-III) mode is DEMOTED from the timed headline
    # (round 5): it is anti-conservative in the extreme tail and the
    # fused shared-stream exact MC matches its wall time at genome
    # scale (BENCH_r04 css_approx_speedup_vs_mc = 0.6) — `run-css
    # --p-mode approx` now warns at runtime; the tail bound stays
    # pinned in CI (tests/test_perm_kernel.py approx-tail bound).

    # --- exact-precision mode (the reference-parity configuration,
    # `--precision exact`; all-doubles like the C,
    # reference statistics/fisher/cFisher.c:38).  Measured every round
    # since round 5 (VERDICT r4 missing #2: the parity mode was flying
    # unmeasured while being the then-CLI default). ---
    e_runs = max(2, n_runs - 1)
    e_cfg = FetConfig(precision="exact")
    # Exact FET runs on the HEADLINE chromosome-1-scale workload, not
    # the mid-scale one: the fields are new in round 5 (no cross-round
    # comparability to preserve) and at 0.2s wall the mid-scale figure
    # was floor-dominated — the same defect VERDICT r4 weak #1 called
    # out on the fast headline (the rank path keeps emulated f64 out of
    # the sort/selection, so the exact wall stays ~2s here).
    m_tests = n_tests

    def _fet_exact_once():
        run_fet(pair, region, e_cfg)

    _fet_exact_once()  # warmup/compile
    fe_times = _timed_runs(_fet_exact_once, e_runs)
    fe_s = min(fe_times)
    print(
        f"[bench] fet exact: {fe_s:.3f}s ({m_tests / fe_s:,.0f} tests/s; "
        f"median {m_tests / float(np.median(fe_times)):,.0f})",
        file=sys.stderr,
    )
    extras["fet_exact_tests_per_sec"] = round(m_tests / fe_s, 1)
    extras["fet_exact_tests_per_sec_median"] = round(
        m_tests / float(np.median(fe_times)), 1
    )
    extras["fet_exact_wall_s_min"] = round(fe_s, 3)

    ce_cfg = CssConfig(precision="exact")
    ces = cesum = None

    def _css_exact_once():
        nonlocal ces, cesum
        cesum = RunSummary()
        ces, _ = run_css(cpair, css_region, ce_cfg, summary=cesum)

    _css_exact_once()  # warmup/compile
    ce_times = _timed_runs(_css_exact_once, e_runs)
    ce_s = min(ce_times)
    ce_mc = cesum.counters.get("mc_permutations", 0)
    print(
        f"[bench] css exact: {ce_s:.2f}s, {ce_mc / 1e6:.0f}M perms "
        f"({ce_mc / ce_s / 1e6:.0f}M perms/s; median "
        f"{ce_mc / float(np.median(ce_times)) / 1e6:.0f}M)",
        file=sys.stderr,
    )
    extras["css_exact_perms_per_sec"] = round(ce_mc / ce_s, 1)
    extras["css_exact_perms_per_sec_median"] = round(
        ce_mc / float(np.median(ce_times)), 1
    )
    extras["css_exact_wall_s_min"] = round(ce_s, 3)

    if cpu_fallback:
        # On a CPU host the production MC evaluator is the threaded
        # native backend (native/mc_native.cpp — same stream, same
        # estimator, per-window early exit).  Time it on the FULL CSS
        # workload, the exact workload behind the reference-C 64-thread
        # number (baseline/run_baseline.py), for a like-for-like row.
        from divergence_tpu.native import native_available

        if native_available():
            npos_f, region_f = 10_000, 500_000
            fpos, famat, fbmat = make_chromosome(
                npos_f, region_f, asize, bsize, 11
            )
            fpair = SnpPair(positions=fpos, avals=famat, bvals=fbmat)
            nat_cfg = CssConfig(precision="fast", perm_backend="native")
            nsum = RunSummary()
            t0 = time.perf_counter()
            ns, _ = run_css(fpair, region_f, nat_cfg, summary=nsum)
            nat_s = time.perf_counter() - t0
            nmc = nsum.counters.get("mc_permutations", 0)
            extras["css_native_perms_per_sec"] = round(nmc / nat_s, 1)
            msg = (
                f"[bench] css native (full workload): {nat_s:.2f}s, "
                f"{nmc / 1e6:.0f}M perms ({nmc / nat_s / 1e6:.1f}M perms/s)"
            )
            if ref_c:
                perm_rate = ref_c.get("css_thread", {}).get(
                    "approx_perms_per_s"
                )
                if perm_rate:
                    extras["vs_ref_c_css_native"] = round(
                        nmc / nat_s / perm_rate, 2
                    )
                    msg += f"  vs_ref_c={nmc / nat_s / perm_rate:.2f}x"
            print(msg, file=sys.stderr)

    if ref_c:
        perm_rate = ref_c.get("css_thread", {}).get("approx_perms_per_s")
        if perm_rate:
            extras["ref_c_css_perms_per_sec_64thr"] = perm_rate
            extras["vs_ref_c_css"] = round(mc / css_s / perm_rate, 2)

    # The marker reflects the ACTUAL execution platform, not the probe's
    # verdict — a silent in-process fall-back to CPU must never present
    # a CPU number under the TPU metric name (round-1 VERDICT weak #1).
    unit = (
        "tests/s"
        if dev.platform != "cpu"
        else "tests/s (CPU FALLBACK - no TPU available)"
    )
    print(
        json.dumps(
            {
                "metric": "fet_snp_tests_per_sec_chip",
                "value": round(tpu_rate, 1),
                "unit": unit,
                "vs_baseline": round(vs, 2),
                **extras,
            }
        )
    )


if __name__ == "__main__":
    main()
