"""Pearson-III (moment-fitted) permutation p-values vs the exact MC.

The permuted CSS is a bilinear permutation statistic; MRPP-style
Pearson-III fits are the classical fast approximation for that class.
These tests check calibration against the exact Monte-Carlo estimator in
the regime where both are reliable (p in ~[2e-3, 0.5])."""

import numpy as np
import pytest

import jax

from divergence_tpu.kernels import perm as kperm


@pytest.fixture(scope="module")
def null_batch(rng):
    B, m = 48, 21
    d = rng.random((B, m, m)) * 2.0
    d = d + d.transpose(0, 2, 1)
    for i in range(B):
        np.fill_diagonal(d[i], 0.0)
    return d


def _observed_at_quantile(dist, q, asize, bsize, key):
    """Observed scores placed at a chosen null quantile (so the true p is
    known by construction)."""
    import jax.numpy as jnp

    B = len(dist)
    keys = kperm.window_keys(
        jax.random.fold_in(key, 99),
        jnp.zeros(B, dtype=jnp.int64),
        jnp.arange(B, dtype=jnp.int64),
    )
    s = np.asarray(
        kperm._perm_scores(
            jnp.asarray(dist).astype(jnp.float32), keys, asize, bsize, 4096
        )
    )
    return np.quantile(s, 1 - q, axis=-1), None


def test_approx_matches_mc_moderate_tail(null_batch):
    asize, bsize = 11, 10
    key = jax.random.PRNGKey(5)
    for q in (0.3, 0.05, 0.01):
        obs, _ = _observed_at_quantile(null_batch, q, asize, bsize, key)
        approx = kperm.approx_significance(
            null_batch, obs, asize, bsize, jax.random.fold_in(key, 1),
            chunk=1024,
        )
        mc = kperm.significance(
            null_batch, obs, asize, bsize, threshold=50, runs=20_000,
            key=jax.random.fold_in(key, 2), chunk=1024,
        )
        # both should estimate ~q; compare log-p within a factor
        ratio = approx.pvals / np.maximum(mc.pvals, 1e-12)
        med = np.median(ratio)
        assert 0.4 < med < 2.5, (q, med)
        # and approx should center near the true quantile
        assert 0.4 < np.median(approx.pvals) / q < 2.5, (
            q,
            np.median(approx.pvals),
        )


def test_approx_monotone_and_bounded(null_batch):
    asize, bsize = 11, 10
    key = jax.random.PRNGKey(7)
    # a very extreme observed score must give a tiny p; a terrible one ~1
    hi = np.full(len(null_batch), 1e6)
    lo = np.full(len(null_batch), -1e6)
    p_hi = kperm.approx_significance(
        null_batch, hi, asize, bsize, key
    ).pvals
    p_lo = kperm.approx_significance(
        null_batch, lo, asize, bsize, key
    ).pvals
    assert (p_hi < 1e-6).all()
    assert (p_lo > 0.999).all()


def test_approx_deep_tail_vs_exact_mc(null_batch):
    """Tail calibration at p ~ 1e-3: the Pearson-III fit must agree with
    the exact adaptive MC (threshold reached around 50k permutations)
    within a factor of ~3 in p — the regime BH-FDR thresholds live in."""
    asize, bsize = 11, 10
    key = jax.random.PRNGKey(21)
    dist = null_batch[:8]
    obs, _ = _observed_at_quantile(dist, 1e-3, asize, bsize, key)
    mc = kperm.significance(
        dist, obs, asize, bsize, threshold=50, runs=500_000,
        key=jax.random.fold_in(key, 1), chunk=4096,
    )
    approx = kperm.approx_significance(
        dist, obs, asize, bsize, jax.random.fold_in(key, 2),
        chunk=1024, n_chunks=4,
    )
    # per-window agreement within half a decade, median tighter
    ratio = np.log10(approx.pvals) - np.log10(np.maximum(mc.pvals, 1e-12))
    assert np.abs(np.median(ratio)) < 0.35, ratio
    assert (np.abs(ratio) < 0.6).mean() >= 0.75, ratio


def test_approx_moment_convergence(null_batch):
    """Doubling the moment sample must leave fitted p-values stable
    (|log10 drift| small) for p >= ~1e-3, and the adaptive doubling must
    record its extra spending in nscores."""
    asize, bsize = 11, 10
    key = jax.random.PRNGKey(13)
    obs, _ = _observed_at_quantile(null_batch, 0.02, asize, bsize, key)
    small = kperm.approx_significance(
        null_batch, obs, asize, bsize, key, chunk=512, n_chunks=2
    )
    big = kperm.approx_significance(
        null_batch, obs, asize, bsize, key, chunk=512, n_chunks=8
    )
    drift = np.abs(np.log10(small.pvals) - np.log10(big.pvals))
    assert np.median(drift) < 0.25, np.median(drift)
    assert (small.nscores >= 2 * 512).all()
    assert (big.nscores >= 8 * 512).all()


def test_approx_escalation_extends_stream(null_batch):
    """Escalation rounds must EXTEND the chunk-indexed permutation
    stream, not replay chunk 0 (the round-2 review bug): forcing full
    escalation must (a) spend the advertised permutations and (b) land
    on exactly the same fit as a single-shot run over the same chunks."""
    asize, bsize = 11, 10
    key = jax.random.PRNGKey(17)
    obs, _ = _observed_at_quantile(null_batch[:8], 0.05, asize, bsize, key)
    forced = kperm.approx_significance(
        null_batch[:8], obs, asize, bsize, key, chunk=256,
        n_chunks=2, stable_log10=-1.0, max_rounds=2,
    )
    assert (forced.nscores == 2 * 256 * 4).all(), forced.nscores
    single = kperm.approx_significance(
        null_batch[:8], obs, asize, bsize, key, chunk=256,
        n_chunks=8, max_rounds=0, stable_log10=1e9,
    )
    np.testing.assert_allclose(forced.pvals, single.pvals, rtol=1e-12)


def test_approx_extreme_tail_anticonservative_bound():
    """Extreme-tail pin (VERDICT r3 #5): on two-cluster windows whose
    true p (measured by a FIXED 250k-permutation MC, shared stream) lies
    in [1e-4, 1e-2], the Pearson-III tail is ANTI-conservative — it
    UNDERestimates p by up to ~0.65 decades (~4.5x) and never
    overestimates it beyond MC noise.  Measured campaign:
    baseline/exp_approx_tail.py (1M perms: max |dlog10| = 0.55 over
    p in [1e-5, 1e-3], MC sigma_log10 <= 0.09).  This is the model
    error the CLI help and docs/PARITY.md now state; BH-FDR consumers
    needing calibrated extreme tails must use the exact MC (default)."""
    asize, bsize = 11, 10
    m = asize + bsize
    rng = np.random.default_rng(3)
    # the ladder of baseline/exp_approx_tail.py (same seed / geometry)
    from divergence_tpu.oracle import reference as orc

    gaps = np.linspace(0.35, 1.15, 24)
    dists, scores = [], []
    for g in gaps:
        xa = rng.normal(size=(asize, 2))
        xb = rng.normal(size=(bsize, 2)) + np.array([2.0 * g, 0.0])
        x = np.vstack([xa, xb])
        d = orc.calc_dist(x)
        dists.append(d)
        scores.append(
            orc.css_score(d, np.arange(asize), np.arange(asize, m))
        )
    dists, scores = np.asarray(dists), np.asarray(scores)
    key = jax.random.PRNGKey(0)
    n = 250_000
    mc = kperm.significance(
        dists, scores, asize, bsize, 10**9, n, key,
        chunk=8192, stream="shared",
    )
    ap = kperm.approx_significance(
        dists, scores, asize, bsize, key, chunk=2048, stream="shared",
    )
    dlog = np.log10(ap.pvals) - np.log10(mc.pvals)
    band = (mc.pvals >= 1e-4) & (mc.pvals <= 1e-2)
    assert band.sum() >= 5, mc.pvals
    # bounded model error in the tail band...
    assert np.abs(dlog[band]).max() <= 0.8, dlog[band]
    # ...one-sided: anti-conservative (never overestimates p by > MC
    # noise + slack)
    assert dlog[band].max() <= 0.15, dlog[band]
    # moderate-p windows stay calibrated
    mod = mc.pvals > 1e-2
    assert np.median(np.abs(dlog[mod])) <= 0.1, dlog[mod]


def test_engine_p_mode_approx(rng):
    from divergence_tpu.config import CssConfig, WindowConfig
    from divergence_tpu.engine import run_css
    from divergence_tpu.engine.snp import SnpPair

    npos, region = 300, 15_000
    positions = np.sort(rng.choice(np.arange(1, region), npos, replace=False))
    av = rng.choice([3.0, -3.0, 0.0], size=(npos, 6))
    bv = rng.choice([3.0, -3.0, 0.0], size=(npos, 5))
    pair = SnpPair(positions=positions, avals=av, bvals=bv)
    cfg = CssConfig(
        window=WindowConfig(2500, 500), p_mode="approx", mc_chunk=512
    )
    scores, pvals = run_css(pair, region, cfg)
    nz = scores != 0
    assert nz.any()
    assert (pvals[nz] > 0).all() and (pvals[nz] <= 1).all()
    # null-ish data: p-values should not cluster at tiny values
    assert np.median(pvals[nz]) > 0.01
