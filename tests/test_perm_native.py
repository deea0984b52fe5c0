"""Native threaded MC evaluator (native/mc_native.cpp): stream parity
with the XLA backend, estimator semantics, and engine integration.

The native backend replays the SAME fold_in(seed, chrom, slot, chunk)
mix stream as kernels/perm.py's XLA path (Threefry-2x32 fold_in + the
_mix32 counter expansion, re-implemented in C++), so p-values are
expected to be identical — not merely statistically equivalent (the
only divergence channel is f64-vs-f32 score accumulation flipping a
``>=`` on an exact tie, measure-zero for continuous distance matrices;
docs/PARITY.md).
"""

from __future__ import annotations

import numpy as np
import pytest

import jax

from divergence_tpu import native
from divergence_tpu.kernels import perm as kperm

pytestmark = pytest.mark.skipif(
    not native.native_available(), reason="native toolchain unavailable"
)


def _dists(B, m, seed):
    rng = np.random.default_rng(seed)
    d = rng.random((B, m, m))
    d = d + d.transpose(0, 2, 1)
    for i in range(B):
        np.fill_diagonal(d[i], 0.0)
    return d


def test_fold_in_matches_jax():
    """C++ Threefry-2x32 fold_in == jax.random.fold_in on raw words."""
    key = jax.random.PRNGKey(987654321)
    kd = np.asarray(jax.random.key_data(key), dtype=np.uint32)
    for data in [0, 1, 7, 255, 123456, 2**31 - 1]:
        jx = tuple(
            np.asarray(jax.random.key_data(jax.random.fold_in(key, data)))
        )
        nt = native.fold_in_native(int(kd[0]), int(kd[1]), data)
        assert nt == jx, (data, nt, jx)


def test_native_matches_xla_backend():
    """Identical (pvals, nscores, hits) to the XLA while-loop path —
    same stream, same estimator, independent implementations."""
    B, a, b = 32, 11, 10
    d = _dists(B, a + b, 5)
    rng = np.random.default_rng(6)
    scores = rng.uniform(0.0, 0.12, B)
    chroms = np.full(B, kperm.chrom_hash("chrVII"), dtype=np.int64)
    slots = np.arange(40, 40 + B, dtype=np.int64)
    kw = dict(
        threshold=7,
        runs=4000,
        key=jax.random.PRNGKey(42),
        chunk=128,
        chroms=chroms,
        slots=slots,
    )
    r_x = kperm.significance(d, scores, a, b, **kw)
    r_n = kperm.significance(d, scores, a, b, backend="native", **kw)
    np.testing.assert_array_equal(r_x.pvals, r_n.pvals)
    np.testing.assert_array_equal(r_x.nscores, r_n.nscores)
    np.testing.assert_array_equal(r_x.hits, r_n.hits)


def test_native_matches_xla_small_m():
    """m=2 (drosophila shape) and asymmetric tiny groups."""
    for a, b in [(1, 1), (2, 1), (3, 2)]:
        m = a + b
        d = _dists(8, m, 10 * a + b)
        scores = np.full(8, -1e9)  # every permutation hits
        kw = dict(
            threshold=3, runs=500, key=jax.random.PRNGKey(1), chunk=64
        )
        r_x = kperm.significance(d, scores, a, b, **kw)
        r_n = kperm.significance(d, scores, a, b, backend="native", **kw)
        np.testing.assert_array_equal(r_x.pvals, r_n.pvals)
        np.testing.assert_array_equal(r_x.nscores, r_n.nscores)


def test_native_matches_xla_odd_shapes():
    """Edge geometries: runs not divisible by chunk (partial last chunk),
    chunk not a lane multiple (tail lane groups), and a large panel
    (m=33 — a much deeper sorting network than the stickleback m=21)."""
    cases = [
        dict(a=11, b=10, chunk=96, runs=1000),   # tails everywhere
        dict(a=17, b=16, chunk=64, runs=700),    # large m, partial chunk
        dict(a=4, b=9, chunk=7, runs=100),       # tiny odd chunk
    ]
    for c in cases:
        m = c["a"] + c["b"]
        d = _dists(12, m, m)
        rng = np.random.default_rng(m)
        scores = rng.uniform(0.0, 0.1, 12)
        kw = dict(
            threshold=4,
            runs=c["runs"],
            key=jax.random.PRNGKey(9),
            chunk=c["chunk"],
        )
        r_x = kperm.significance(d, scores, c["a"], c["b"], **kw)
        r_n = kperm.significance(
            d, scores, c["a"], c["b"], backend="native", **kw
        )
        np.testing.assert_array_equal(r_x.pvals, r_n.pvals, err_msg=str(c))
        np.testing.assert_array_equal(
            r_x.nscores, r_n.nscores, err_msg=str(c)
        )


def test_native_estimator_limits():
    """Reference estimator at both extremes (css.c:727-752): every
    permutation hits -> stop at the threshold-th permutation with p = 1;
    no permutation hits -> n = runs, p = 1/(runs+1)."""
    B, a, b = 4, 5, 4
    d = _dists(B, a + b, 3)
    thr, runs = 10, 1000
    lo = kperm.significance(
        d, np.full(B, -1e9), a, b, threshold=thr, runs=runs,
        key=jax.random.PRNGKey(0), backend="native",
    )
    np.testing.assert_array_equal(lo.nscores, thr)
    np.testing.assert_array_equal(lo.hits, thr)
    np.testing.assert_array_equal(lo.pvals, 1.0)
    hi = kperm.significance(
        d, np.full(B, 1e9), a, b, threshold=thr, runs=runs,
        key=jax.random.PRNGKey(0), backend="native",
    )
    np.testing.assert_array_equal(hi.nscores, runs)
    np.testing.assert_array_equal(hi.hits, 0)
    np.testing.assert_allclose(hi.pvals, 1.0 / (runs + 1))


def test_native_requires_mix_stream():
    with pytest.raises(ValueError, match="mix"):
        kperm.significance(
            _dists(2, 5, 0), np.zeros(2), 3, 2, threshold=2, runs=100,
            key=jax.random.PRNGKey(0), backend="native", bitgen="threefry",
        )


def test_css_engine_native_backend():
    """run_css(perm_backend='native') == the default XLA engine run."""
    from divergence_tpu.config import CssConfig
    from divergence_tpu.engine import run_css
    from divergence_tpu.engine.snp import SnpPair

    rng = np.random.default_rng(19)
    npos, region = 400, 20_000
    positions = np.sort(
        rng.choice(np.arange(1, region, dtype=np.int64), npos, replace=False)
    )

    def draw(size):
        g = rng.random((npos, size))
        return np.where(g < 0.45, 3.0, np.where(g < 0.9, 0.0, -3.0))

    pair = SnpPair(positions=positions, avals=draw(6), bvals=draw(5))
    # native replays the per-WINDOW stream (mc_stream="window"); the
    # shared-stream default is a different (coarser-keyed) stream
    cfg = dict(
        precision="fast", mc_runs=2000, mc_threshold=5, mc_stream="window"
    )
    s_x, p_x = run_css(pair, region, CssConfig(**cfg))
    s_n, p_n = run_css(
        pair, region, CssConfig(perm_backend="native", **cfg)
    )
    np.testing.assert_array_equal(s_x, s_n)
    np.testing.assert_array_equal(p_x, p_n)
