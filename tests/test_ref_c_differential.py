"""Differential parity against the COMPILED reference C.

The strongest parity evidence available: the unmodified reference
kernels (cFisher.c / css.c, built by baseline/build.sh) and this
framework score the SAME GTrack pair, and the deterministic per-window
score columns are compared slot by slot.  This closes the chain
oracle == engine (tests/test_*_kernel.py) with reference-C == oracle,
so every parity claim in docs/PARITY.md is anchored to the real C
binary, not just our restatement of its semantics.

The stochastic columns (bootstrap stddev, MC p) are compared
distributionally AND exactly under the faketime preload: the reference
seeds its PRNGs from the wall clock (reference
statistics/fisher/cFisher.c:78, statistics/css/css.c:112-115), which
LD_PRELOAD baseline/build/libfaketime.so pins so the oracle's rand48
replicas can match bit-for-bit.

Shared GTrack/driver helpers come from divergence_tpu.tools.fuzz_ref —
one implementation for the fixed-panel tests and the randomized sweep.
Skipped when gcc/the baseline build is unavailable.
"""

from __future__ import annotations

import pathlib
import sys

import numpy as np
import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent
BASELINE = REPO / "baseline"
sys.path.insert(0, str(REPO))

from bench import make_chromosome  # noqa: E402
from divergence_tpu.tools.fuzz_ref import (  # noqa: E402
    draw_trial,
    ensure_binaries,
    run_ref as _run_ref,
    write_gtrack as _write_gtrack,
)


@pytest.fixture(scope="module")
def binaries():
    if not ensure_binaries():
        pytest.skip("baseline build unavailable")
    return (
        BASELINE / "build" / "bench_ref_fet",
        BASELINE / "build" / "bench_ref_css",
    )


def _preload_effective(binary, fa, fb, tmp, extra=(), env=None):
    """True when the faketime preload actually interposes time():
    different FAKE_TIME values must yield different stochastic columns.
    (Running the same FAKE_TIME twice is NOT a valid probe — without
    interposition both runs can land in the same wall-clock second.)"""
    env = env or {}
    _, a1 = _run_ref(binary, fa, fb, tmp / "pe1.dump", extra=extra,
                     env={**env, "FAKE_TIME": "42"}, aux=True)
    _, a2 = _run_ref(binary, fa, fb, tmp / "pe2.dump", extra=extra,
                     env={**env, "FAKE_TIME": "12345"}, aux=True)
    return not np.array_equal(a1, a2)


@pytest.fixture(scope="module")
def panel(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("refdiff")
    positions, amat, bmat = make_chromosome(3000, 150_000, 11, 10, 23)
    fa, fb = tmp / "a.gtrack", tmp / "b.gtrack"
    _write_gtrack(fa, positions, amat)
    _write_gtrack(fb, positions, bmat)
    return tmp, fa, fb, positions, amat, bmat


def _flat(positions, mat):
    size = mat.shape[1]
    pos = np.repeat(positions.astype(np.int64), size)
    return pos, mat.reshape(-1).astype(np.float64)


def test_fet_scores_match_reference_c(binaries, panel):
    """Per-slot FET window scores: compiled cFisher.c vs oracle vs
    engine, same slots nonzero, values equal to f64 round-off (the
    integer-binomial recurrence vs the lgamma support scan)."""
    from divergence_tpu.config import FetConfig, WindowConfig
    from divergence_tpu.engine import run_fet
    from divergence_tpu.engine.snp import SnpPair
    from divergence_tpu.oracle import compute_fet

    fet_bin, _ = binaries
    tmp, fa, fb, positions, amat, bmat = panel
    regend = int(positions[-1]) + 1

    ref = _run_ref(fet_bin, fa, fb, tmp / "fet.dump")

    apos, avals = _flat(positions, amat)
    bpos, bvals = _flat(positions, bmat)
    orc, _ = compute_fet(avals, bvals, apos, bpos, regend, 2500, 500)
    assert ref.shape == orc.shape
    np.testing.assert_array_equal(ref != 0, orc != 0)
    np.testing.assert_allclose(ref, orc, rtol=1e-9, atol=1e-12)

    pair = SnpPair(positions=positions, avals=amat, bvals=bmat)
    cfg = FetConfig(window=WindowConfig(wsize=2500, wstep=500),
                    bootstrap_samples=4)
    eng, _ = run_fet(pair, regend, cfg)
    np.testing.assert_allclose(ref, eng, rtol=1e-9, atol=1e-12)


@pytest.mark.parametrize("mds", [0, 2])
def test_css_scores_match_reference_c(binaries, panel, mds):
    """Per-slot CSS window scores vs compiled css.c (GSL satisfied by
    the Jacobi shim) vs oracle vs engine, for both deterministic MDS
    modes: 0 = CMDS, 2 = CMDS refined by SMACOF (css.c:208-218; mode 1
    is excluded — its drand48 restarts make the C wall-clock
    nondeterministic).  Looser tolerance than FET: three different
    symmetric eigensolvers on the same double-centered matrix."""
    from divergence_tpu.config import CssConfig, MdsAlgorithm, WindowConfig
    from divergence_tpu.engine import run_css
    from divergence_tpu.engine.snp import SnpPair
    from divergence_tpu.oracle import compute_css

    _, css_bin = binaries
    tmp, fa, fb, positions, amat, bmat = panel
    regend = int(positions[-1]) + 1

    ref = _run_ref(
        css_bin, fa, fb, tmp / f"css{mds}.dump",
        extra=(regend, mds),
        env={"CSS_TRESHOLD": "2", "CSS_RUNS": "20"},
    )

    apos, avals = _flat(positions, amat)
    bpos, bvals = _flat(positions, bmat)
    orc, _ = compute_css(avals, bvals, apos, bpos, regend, 2500, 500,
                         threshold=2, runs=20, mds=mds)
    assert ref.shape == orc.shape
    np.testing.assert_array_equal(ref != 0, orc != 0)
    np.testing.assert_allclose(ref, orc, rtol=1e-6, atol=1e-8)

    pair = SnpPair(positions=positions, avals=amat, bvals=bmat)
    cfg = CssConfig(window=WindowConfig(wsize=2500, wstep=500),
                    mc_threshold=2, mc_runs=20, mds=MdsAlgorithm(mds))
    eng, _ = run_css(pair, regend, cfg)
    np.testing.assert_allclose(ref, eng, rtol=1e-6, atol=1e-8)


def test_asymmetric_panel_matches_reference_c(binaries, tmp_path):
    """Differential on a small asymmetric panel (3+7 individuals,
    skewed genotype mix): panel shapes where exact probability ties in
    the FET second tail are likelier — the randomized sweep that found
    the tie-rule divergence (docs/PARITY.md deviation 7) hit them on
    panels like this."""
    from divergence_tpu.config import FetConfig, WindowConfig
    from divergence_tpu.engine import run_fet
    from divergence_tpu.engine.snp import SnpPair
    from divergence_tpu.oracle import compute_fet

    fet_bin, _ = binaries
    rng = np.random.default_rng(1000)  # fuzz trial t0 parameters
    codes = np.array([3.0, -3.0, 0.0, -10000.0])
    asize, bsize, npos, region = 3, 7, 2000, 90_000
    probs = rng.dirichlet([3, 3, 1.5, 0.4])
    positions = np.sort(rng.choice(np.arange(1, region), npos, replace=False))
    amat = rng.choice(codes, size=(npos, asize), p=probs)
    bmat = rng.choice(codes, size=(npos, bsize), p=probs)
    fa, fb = tmp_path / "a.gtrack", tmp_path / "b.gtrack"
    _write_gtrack(fa, positions, amat)
    _write_gtrack(fb, positions, bmat)
    regend = int(positions[-1]) + 1

    ref = _run_ref(fet_bin, fa, fb, tmp_path / "fet.dump")
    apos, avals = _flat(positions, amat)
    bpos, bvals = _flat(positions, bmat)
    orc, _ = compute_fet(avals, bvals, apos, bpos, regend, 2500, 500)
    np.testing.assert_allclose(ref, orc, rtol=1e-9, atol=1e-12)
    pair = SnpPair(positions=positions, avals=amat, bvals=bmat)
    eng, _ = run_fet(
        pair, regend,
        FetConfig(window=WindowConfig(2500, 500), bootstrap_samples=4),
    )
    np.testing.assert_allclose(ref, eng, rtol=1e-9, atol=1e-12)


def test_tie_heavy_panel_c_replica_matches_reference_c(binaries, tmp_path):
    """On a panel where exact second-tail probability ties occur (the
    fuzz trial that exposed PARITY deviation 7(b): skewed genotype mix,
    7+13 individuals), the oracle's bit-faithful C replica must equal
    the compiled C on EVERY slot — ties included — proving the
    framework-vs-C discrepancies on such panels are exactly the C's own
    floating-point tie accidents and nothing else."""
    from divergence_tpu.oracle import reference as orc

    fet_bin, _ = binaries
    # fuzz trial t6's exact draw sequence, via the harness's own
    # generator so the "fuzz trial" claim cannot silently drift
    rng = np.random.default_rng(5006)
    positions, amat, bmat, asize, bsize, wsize, wstep = draw_trial(
        rng, dros=False
    )
    assert (asize, bsize) == (7, 13)  # the documented tie-heavy panel
    fa, fb = tmp_path / "a.gtrack", tmp_path / "b.gtrack"
    _write_gtrack(fa, positions, amat)
    _write_gtrack(fb, positions, bmat)
    regend = int(positions[-1]) + 1

    ref = _run_ref(
        fet_bin, fa, fb, tmp_path / "tie.dump",
        env={"WSIZE": str(wsize), "WSTEP": str(wstep)},
    )
    apos, avals = _flat(positions, amat)
    bpos, bvals = _flat(positions, bmat)
    rep, _ = orc.compute_fet(
        avals, bvals, apos, bpos, regend, wsize, wstep,
        two_tailed=orc.fet_two_tailed_c_replica,
    )
    np.testing.assert_allclose(ref, rep, rtol=1e-12, atol=1e-14)

    # and the framework rule differs ONLY via tie windows (if any on
    # this panel) — every differing slot must contain a tied table
    frw, _ = orc.compute_fet(avals, bvals, apos, bpos, regend, wsize, wstep)
    differing = np.nonzero(~np.isclose(ref, frw, rtol=1e-9, atol=1e-12))[0]
    assert len(differing) >= 1  # the panel is tie-heavy by construction


def test_odd_window_geometry_matches_reference_c(binaries, panel):
    """Non-divisible geometry (wsize % wstep != 0, regend % wstep != 0):
    the window-loop edge semantics — evaluate while start + wsize <=
    regend + wstep, slot = start // wstep, regend // wstep output slots
    (css.c:117-135) — differentially against the real C for both
    engines."""
    from divergence_tpu.config import (
        CssConfig, FetConfig, WindowConfig,
    )
    from divergence_tpu.engine import run_css, run_fet
    from divergence_tpu.engine.snp import SnpPair
    from divergence_tpu.oracle import compute_css, compute_fet

    fet_bin, css_bin = binaries
    tmp, fa, fb, positions, amat, bmat = panel
    regend = int(positions[-1]) + 1  # not a wstep multiple in general
    assert regend % 300 != 0
    wsize, wstep = 1100, 300
    geom = {"WSIZE": str(wsize), "WSTEP": str(wstep)}

    apos, avals = _flat(positions, amat)
    bpos, bvals = _flat(positions, bmat)
    pair = SnpPair(positions=positions, avals=amat, bvals=bmat)
    w = WindowConfig(wsize=wsize, wstep=wstep)

    ref = _run_ref(fet_bin, fa, fb, tmp / "fetg.dump", env=geom)
    orc, _ = compute_fet(avals, bvals, apos, bpos, regend, wsize, wstep)
    np.testing.assert_array_equal(ref != 0, orc != 0)
    np.testing.assert_allclose(ref, orc, rtol=1e-9, atol=1e-12)
    eng, _ = run_fet(pair, regend, FetConfig(window=w, bootstrap_samples=4))
    np.testing.assert_allclose(ref, eng, rtol=1e-9, atol=1e-12)

    ref = _run_ref(
        css_bin, fa, fb, tmp / "cssg.dump",
        env={**geom, "CSS_TRESHOLD": "2", "CSS_RUNS": "20"},
    )
    orc, _ = compute_css(avals, bvals, apos, bpos, regend, wsize, wstep,
                         threshold=2, runs=20)
    np.testing.assert_array_equal(ref != 0, orc != 0)
    np.testing.assert_allclose(ref, orc, rtol=1e-7, atol=1e-9)
    eng, _ = run_css(
        pair, regend,
        CssConfig(window=w, mc_threshold=2, mc_runs=20),
    )
    np.testing.assert_allclose(ref, eng, rtol=1e-7, atol=1e-9)


def test_sparse_window_geometry_matches_reference_c(binaries, panel):
    """wstep > wsize (sparse, non-overlapping sampling — legal in the
    reference, whose GUI validates only integer-ness): FET and CSS
    scores match the compiled C slot for slot."""
    from divergence_tpu.config import CssConfig, FetConfig, WindowConfig
    from divergence_tpu.engine import run_css, run_fet
    from divergence_tpu.engine.snp import SnpPair
    from divergence_tpu.oracle import compute_css, compute_fet

    fet_bin, css_bin = binaries
    tmp, fa, fb, positions, amat, bmat = panel
    regend = int(positions[-1]) + 1
    wsize, wstep = 900, 2100
    geom = {"WSIZE": str(wsize), "WSTEP": str(wstep)}
    w = WindowConfig(wsize=wsize, wstep=wstep)
    apos, avals = _flat(positions, amat)
    bpos, bvals = _flat(positions, bmat)
    pair = SnpPair(positions=positions, avals=amat, bvals=bmat)

    ref = _run_ref(fet_bin, fa, fb, tmp / "sp_f.dump", env=geom)
    orc, _ = compute_fet(avals, bvals, apos, bpos, regend, wsize, wstep)
    assert (ref != 0).sum() > 10
    np.testing.assert_allclose(ref, orc, rtol=1e-9, atol=1e-12)
    eng, _ = run_fet(pair, regend, FetConfig(window=w, bootstrap_samples=4))
    np.testing.assert_allclose(ref, eng, rtol=1e-9, atol=1e-12)

    ref = _run_ref(
        css_bin, fa, fb, tmp / "sp_c.dump",
        env={**geom, "CSS_TRESHOLD": "2", "CSS_RUNS": "20"},
    )
    orc, _ = compute_css(avals, bvals, apos, bpos, regend, wsize, wstep,
                         threshold=2, runs=20)
    np.testing.assert_allclose(ref, orc, rtol=1e-7, atol=1e-9)
    eng, _ = run_css(
        pair, regend, CssConfig(window=w, mc_threshold=2, mc_runs=20)
    )
    np.testing.assert_allclose(ref, eng, rtol=1e-7, atol=1e-9)


def test_css_pvalues_match_reference_c_distribution(binaries, panel):
    """CSS MC p-values vs the compiled C, distributionally: with the
    early-stop threshold above the runs cap both sides evaluate exactly
    `runs` permutations per scored window, so each p is
    (hits+1)/(runs+1) with binomial sd sqrt(p(1-p)/runs).  Independent
    RNG streams (the C is wall-clock seeded) must agree within combined
    sampling error."""
    from divergence_tpu.config import CssConfig, WindowConfig
    from divergence_tpu.engine import run_css
    from divergence_tpu.engine.snp import SnpPair
    from divergence_tpu.oracle import compute_css  # noqa: F401

    _, css_bin = binaries
    tmp, fa, fb, positions, amat, bmat = panel
    regend = int(positions[-1]) + 1
    runs = 2000

    ref_s, ref_p = _run_ref(
        css_bin, fa, fb, tmp / "cssp.dump",
        extra=(regend,),
        env={"CSS_TRESHOLD": "1000000", "CSS_RUNS": str(runs)},
        aux=True,
    )

    pair = SnpPair(positions=positions, avals=amat, bvals=bmat)
    cfg = CssConfig(window=WindowConfig(wsize=2500, wstep=500),
                    mc_threshold=1_000_000, mc_runs=runs)
    eng_s, eng_p = run_css(pair, regend, cfg)

    nz = ref_s != 0
    assert nz.sum() > 50
    pbar = np.clip((ref_p[nz] + eng_p[nz]) / 2, 1.0 / runs, 1.0)
    bound = 6.0 * np.sqrt(2.0 * pbar * (1 - pbar) / runs) + 2.0 / runs
    np.testing.assert_array_less(np.abs(ref_p[nz] - eng_p[nz]), bound)


def test_fet_stddev_matches_reference_c_distribution(binaries, panel):
    """FET bootstrap stddev vs the compiled C, distributionally: both
    estimate the sd of the window-percentile bootstrap (100 replicates,
    nsamples hardcoded at cFisher.c:62) from independent streams —
    ratios must be near 1 in aggregate, with generous per-window slack
    for 100-replicate sampling noise on discrete percentile atoms."""
    from divergence_tpu.config import FetConfig, WindowConfig
    from divergence_tpu.engine import run_fet
    from divergence_tpu.engine.snp import SnpPair

    fet_bin, _ = binaries
    tmp, fa, fb, positions, amat, bmat = panel
    regend = int(positions[-1]) + 1

    ref_s, ref_d = _run_ref(fet_bin, fa, fb, tmp / "fetd.dump", aux=True)

    pair = SnpPair(positions=positions, avals=amat, bvals=bmat)
    cfg = FetConfig(window=WindowConfig(wsize=2500, wstep=500),
                    bootstrap_samples=100)
    eng_s, eng_d = run_fet(pair, regend, cfg)

    sel = (ref_s != 0) & (np.maximum(ref_d, eng_d) > 0.05)
    assert sel.sum() > 50
    ratio = ref_d[sel] / eng_d[sel]
    assert np.all((ratio > 1 / 3) & (ratio < 3)), (
        ratio.min(), ratio.max()
    )
    med = float(np.median(ratio))
    assert 0.85 < med < 1.18, med


def test_fet_stddev_bitwise_under_faketime(binaries, panel):
    """The LAST stochastic column, pinned: with the reference's
    wall-clock seed fixed via the LD_PRELOAD faketime shim, the oracle's
    exact rand48 replica (compute_fet_c_replica) reproduces the compiled
    C's bootstrap stddev essentially bit-for-bit — completing exact
    differential coverage of every FET output."""
    from divergence_tpu.oracle import reference as orc

    fet_bin, _ = binaries
    lib = BASELINE / "build" / "libfaketime.so"
    if not lib.exists():
        pytest.skip("faketime shim not built")
    tmp, fa, fb, positions, amat, bmat = panel
    regend = int(positions[-1]) + 1

    if not _preload_effective(fet_bin, fa, fb, tmp,
                              env={"LD_PRELOAD": str(lib)}):
        pytest.skip("time() preload not effective on this platform")
    env = {"LD_PRELOAD": str(lib), "FAKE_TIME": "42"}
    ref_s1, ref_d1 = _run_ref(fet_bin, fa, fb, tmp / "ft1.dump",
                              env=env, aux=True)
    assert (ref_d1 != 0).sum() > 100  # the clock pin really ran the C

    apos, avals = _flat(positions, amat)
    bpos, bvals = _flat(positions, bmat)
    rep_s, rep_d = orc.compute_fet_c_replica(
        avals, bvals, apos, bpos, regend, 2500, 500, time_seed=42
    )
    np.testing.assert_allclose(ref_s1, rep_s, rtol=1e-12, atol=1e-14)
    np.testing.assert_allclose(ref_d1, rep_d, rtol=1e-12, atol=1e-14)


def test_css_pvalues_exact_under_faketime(binaries, tmp_path):
    """CSS MC p, pinned: with the clock preload fixing the reference's
    nrand48 seed, the oracle replica reproduces the compiled C's exact
    p = (hits+1)/(runs+1) per window — same cumulative Fisher-Yates
    stream over the chromosome-persistent signtracks array.  Fixed-n
    protocol; a comparison inside the ~1e-15 eigensolver margin may
    flip one hit, so a tiny number of windows may differ by exactly
    1/(runs+1).

    The panel is NULL-ish (both populations drawn from one shared
    allele-frequency field): on a divergent panel every window gets 0
    hits and p = 1/(runs+1) regardless of the stream, which would make
    this test — and the preload-effectiveness probe — vacuous."""
    from divergence_tpu.oracle import reference as orc

    _, css_bin = binaries
    lib = BASELINE / "build" / "libfaketime.so"
    if not lib.exists():
        pytest.skip("faketime shim not built")
    rng = np.random.default_rng(5)
    npos, region, asize, bsize = 1500, 90_000, 6, 5
    positions = np.sort(rng.choice(np.arange(1, region), npos, replace=False))
    p_major = rng.uniform(0.2, 0.9, size=(npos, 1))

    def draw(size):
        g = rng.random((npos, size))
        het = p_major * (1 - p_major) * 2
        return np.where(
            g < p_major ** 2,
            3.0,
            np.where(g < p_major ** 2 + het, 0.0, -3.0),
        )

    amat, bmat = draw(asize), draw(bsize)
    tmp = tmp_path
    fa, fb = tmp / "a.gtrack", tmp / "b.gtrack"
    _write_gtrack(fa, positions, amat)
    _write_gtrack(fb, positions, bmat)
    regend = int(positions[-1]) + 1
    runs = 400

    mc_env = {
        "LD_PRELOAD": str(lib),
        "CSS_TRESHOLD": "1000000",
        "CSS_RUNS": str(runs),
    }
    if not _preload_effective(css_bin, fa, fb, tmp, env=mc_env):
        pytest.skip("time() preload not effective on this platform")
    ref_s1, ref_p1 = _run_ref(css_bin, fa, fb, tmp / "cft1.dump",
                              env={**mc_env, "FAKE_TIME": "42"}, aux=True)

    apos, avals = _flat(positions, amat)
    bpos, bvals = _flat(positions, bmat)
    rep_s, rep_p = orc.compute_css_p_c_replica(
        avals, bvals, apos, bpos, regend, 2500, 500,
        threshold=1_000_000, runs=runs, time_seed=42,
    )
    np.testing.assert_allclose(ref_s1, rep_s, rtol=1e-7, atol=1e-9)
    scored = ref_s1 != 0
    assert scored.sum() > 100
    diff = np.abs(ref_p1[scored] - rep_p[scored])
    exact = diff == 0
    # allow at most 1% single-hit flips, each exactly 1/(runs+1)
    assert exact.mean() > 0.99, (1 - exact.mean())
    assert np.all(diff[~exact] <= 1.0 / (runs + 1) + 1e-12)


def test_css_smacof_mode_exact_under_faketime(binaries, tmp_path):
    """mds=1 (SMACOF with drand48 restarts) — the final uncovered
    output: against the strict-fp reference build (-ffp-contract=off)
    with the clock pinned, the oracle replica reproduces scores AND MC
    p per window.  The mds=1 chain has no eigensolver, so with exact
    drand48 inits and op-order-replicated float math the embedding and
    the best-of-4 selection are bit-faithful."""
    from divergence_tpu.oracle import reference as orc

    _ = binaries  # ensures the build ran
    css_strict = BASELINE / "build" / "bench_ref_css_strict"
    lib = BASELINE / "build" / "libfaketime.so"
    if not css_strict.exists() or not lib.exists():
        pytest.skip("strict-fp build unavailable")

    rng = np.random.default_rng(77)
    codes = np.array([3.0, -3.0, 0.0, -10000.0])
    asize, bsize, npos, region = 5, 4, 600, 50_000
    positions = np.sort(rng.choice(np.arange(1, region), npos, replace=False))
    amat = rng.choice(codes, size=(npos, asize), p=[.45, .35, .15, .05])
    bmat = rng.choice(codes, size=(npos, bsize), p=[.45, .35, .15, .05])
    fa, fb = tmp_path / "a.gtrack", tmp_path / "b.gtrack"
    _write_gtrack(fa, positions, amat)
    _write_gtrack(fb, positions, bmat)
    regend = int(positions[-1]) + 1
    runs = 100

    mc_env = {
        "LD_PRELOAD": str(lib),
        "CSS_TRESHOLD": "1000000",
        "CSS_RUNS": str(runs),
    }
    if not _preload_effective(css_strict, fa, fb, tmp_path,
                              extra=(regend, 1), env=mc_env):
        pytest.skip("time() preload not effective on this platform")
    ref_s1, ref_p1 = _run_ref(css_strict, fa, fb, tmp_path / "s1.dump",
                              extra=(regend, 1),
                              env={**mc_env, "FAKE_TIME": "42"}, aux=True)

    apos, avals = _flat(positions, amat)
    bpos, bvals = _flat(positions, bmat)
    rep_s, rep_p = orc.compute_css_mds1_c_replica(
        avals, bvals, apos, bpos, regend, 2500, 500,
        threshold=1_000_000, runs=runs, time_seed=42,
    )
    scored = ref_s1 != 0
    assert scored.sum() > 50
    np.testing.assert_allclose(ref_s1, rep_s, rtol=1e-12, atol=1e-14)
    # p exact except single-hit flips at an fp comparison boundary
    diff = np.abs(ref_p1[scored] - rep_p[scored])
    exact = diff == 0
    assert exact.mean() > 0.98, (1 - exact.mean())
    assert np.all(diff[~exact] <= 1.0 / (runs + 1) + 1e-12)


def test_approx_pmode_calibrated_against_reference_c(binaries, tmp_path):
    """The production approx estimator (--p-mode approx, Pearson-III
    moment fit) calibrated DIRECTLY against the compiled C's Monte-Carlo
    on the same windows: with the clock pinned and a large fixed n, the
    C's p is a tight estimate of the true permutation p, so the fitted
    p must track it within model+sampling error over the bulk of the
    distribution."""
    from divergence_tpu.config import CssConfig, WindowConfig
    from divergence_tpu.engine import run_css
    from divergence_tpu.engine.snp import SnpPair

    _, css_bin = binaries
    lib = BASELINE / "build" / "libfaketime.so"
    if not lib.exists():
        pytest.skip("faketime shim not built")
    # null-ish panel (shared frequency field) -> p spread over (0, 1]
    rng = np.random.default_rng(11)
    npos, region, asize, bsize = 1200, 70_000, 6, 5
    positions = np.sort(rng.choice(np.arange(1, region), npos, replace=False))
    p_major = rng.uniform(0.2, 0.9, size=(npos, 1))

    def draw(size):
        g = rng.random((npos, size))
        het = p_major * (1 - p_major) * 2
        return np.where(
            g < p_major ** 2, 3.0,
            np.where(g < p_major ** 2 + het, 0.0, -3.0),
        )

    amat, bmat = draw(asize), draw(bsize)
    fa, fb = tmp_path / "a.gtrack", tmp_path / "b.gtrack"
    _write_gtrack(fa, positions, amat)
    _write_gtrack(fb, positions, bmat)
    regend = int(positions[-1]) + 1
    runs = 4000

    ref_s, ref_p = _run_ref(
        css_bin, fa, fb, tmp_path / "cal.dump",
        env={
            "LD_PRELOAD": str(lib),
            "FAKE_TIME": "42",
            "CSS_TRESHOLD": "1000000",
            "CSS_RUNS": str(runs),
        },
        aux=True,
    )

    pair = SnpPair(positions=positions, avals=amat, bvals=bmat)
    cfg = CssConfig(window=WindowConfig(2500, 500), p_mode="approx")
    app_s, app_p = run_css(pair, regend, cfg)
    np.testing.assert_allclose(ref_s, app_s, rtol=1e-7, atol=1e-9)

    sel = (ref_s != 0) & (ref_p > 0.02) & (ref_p < 0.5)
    assert sel.sum() > 40
    ratio = np.log10(app_p[sel]) - np.log10(ref_p[sel])
    # |log10 ratio| bulk bound: Pearson-III model error + the C's
    # binomial noise (sd(p)/p <~ 11% at p=0.02, runs=4000)
    assert np.median(np.abs(ratio)) < 0.06, float(np.median(np.abs(ratio)))
    assert np.quantile(np.abs(ratio), 0.95) < 0.22, (
        float(np.quantile(np.abs(ratio), 0.95))
    )


def test_css_drosophila_scores_match_reference_c(binaries, tmp_path):
    """Frequency-track (drosophila) mode differential: 2 pseudo-
    individuals, dissimilarity = mean |freqA-freqB| (css.c:245-264) —
    deterministic, so the C scores are directly comparable."""
    from divergence_tpu.config import CssConfig, WindowConfig
    from divergence_tpu.engine import run_css
    from divergence_tpu.engine.snp import SnpPair
    from divergence_tpu.oracle import compute_css

    _, css_bin = binaries
    rng = np.random.default_rng(41)
    npos, region = 2000, 120_000
    positions = np.sort(
        rng.choice(np.arange(1, region), npos, replace=False)
    )
    famat = rng.uniform(0.0, 1.0, (npos, 1))
    fbmat = rng.uniform(0.0, 1.0, (npos, 1))
    fa, fb = tmp_path / "fa.gtrack", tmp_path / "fb.gtrack"
    _write_gtrack(fa, positions, famat)
    _write_gtrack(fb, positions, fbmat)
    regend = int(positions[-1]) + 1

    ref = _run_ref(
        css_bin, fa, fb, tmp_path / "dros.dump",
        extra=(regend, 0, 1),
        env={"CSS_TRESHOLD": "2", "CSS_RUNS": "20"},
    )

    orc, _ = compute_css(
        famat.ravel(), fbmat.ravel(), positions, positions,
        regend, 2500, 500, threshold=2, runs=20, drosophila=True,
    )
    assert ref.shape == orc.shape
    np.testing.assert_array_equal(ref != 0, orc != 0)
    np.testing.assert_allclose(ref, orc, rtol=1e-9, atol=1e-12)

    pair = SnpPair(positions=positions, avals=famat, bvals=fbmat)
    cfg = CssConfig(window=WindowConfig(wsize=2500, wstep=500),
                    mc_threshold=2, mc_runs=20, drosophila=True)
    eng, _ = run_css(pair, regend, cfg)
    np.testing.assert_allclose(ref, eng, rtol=1e-9, atol=1e-12)
