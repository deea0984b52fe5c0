"""Pallas permutation-scoring kernel: correctness on the CPU (Mosaic
interpret mode) against the oracle, via the deterministic-keys variant."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from divergence_tpu.kernels.pallas.perm_pallas import (
    LANE,
    perm_scores_pallas_with_keys,
)
from divergence_tpu.oracle import reference as orc


@pytest.fixture(scope="module")
def dists(rng):
    B, m = 3, 21
    d = rng.random((B, m, m))
    d = d + d.transpose(0, 2, 1)
    for i in range(B):
        np.fill_diagonal(d[i], 0.0)
    return d


def test_sort_network_and_scoring_vs_oracle(dists, rng):
    B, m = dists.shape[0], dists.shape[-1]
    asize, bsize = 11, 10
    m_pad, nkt = 24, 2
    keys = rng.integers(
        0, 2**32, size=(B, nkt, m_pad, LANE), dtype=np.uint32
    )
    s = np.asarray(
        perm_scores_pallas_with_keys(
            jnp.asarray(dists, jnp.float32),
            jnp.asarray(keys),
            asize,
            bsize,
            interpret=True,
        )
    )
    assert s.shape == (B, nkt * LANE)
    for b in range(B):
        for kt in range(nkt):
            for lane in range(0, LANE, 13):
                perm = np.argsort(keys[b, kt, :m, lane], kind="stable")
                want = orc.css_score(
                    dists[b], perm[:asize], perm[asize:]
                )
                got = s[b, kt * LANE + lane]
                assert got == pytest.approx(want, abs=5e-7), (b, kt, lane)


def test_pallas_backend_plumbing():
    """perm_backend config/CLI plumbing (the kernel itself only compiles
    on TPU Mosaic; hardware equivalence is checked in the bench)."""
    import pytest as _pytest

    from divergence_tpu.config import CssConfig

    cfg = CssConfig(perm_backend="pallas")
    assert cfg.perm_backend == "pallas"
    with _pytest.raises(ValueError):
        CssConfig(perm_backend="cuda")


@pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="Mosaic kernel requires TPU (interpret mode lacks the "
    "on-core PRNG)",
)
def test_pallas_backend_significance_tpu():
    """On hardware: the pallas-backend adaptive MC agrees with the XLA
    backend statistically (same estimator, different stream)."""
    from divergence_tpu.kernels import perm as kperm

    rng = np.random.default_rng(0)
    B, m, asize, bsize = 16, 21, 11, 10
    d = rng.random((B, m, m))
    d = d + d.transpose(0, 2, 1)
    for i in range(B):
        np.fill_diagonal(d[i], 0.0)
    obs = np.quantile(d.reshape(B, -1), 0.75, axis=-1)
    key = jax.random.PRNGKey(1)
    r_x = kperm.significance(d, obs, asize, bsize, 20, 5000, key, chunk=256)
    r_p = kperm.significance(
        d, obs, asize, bsize, 20, 5000, key, chunk=256, backend="pallas"
    )
    ratio = r_p.pvals / np.maximum(r_x.pvals, 1e-12)
    assert 0.3 < np.median(ratio) < 3.0


def test_unbalanced_groups(dists, rng):
    """Chain weights with a singleton group (w == 0 for that side)."""
    m = dists.shape[-1]
    asize, bsize = 1, 20
    keys = rng.integers(0, 2**32, size=(1, 1, 24, LANE), dtype=np.uint32)
    s = np.asarray(
        perm_scores_pallas_with_keys(
            jnp.asarray(dists[:1], jnp.float32),
            jnp.asarray(keys),
            asize,
            bsize,
            interpret=True,
        )
    )
    for lane in range(0, LANE, 31):
        perm = np.argsort(keys[0, 0, :m, lane], kind="stable")
        want = orc.css_score(dists[0], perm[:asize], perm[asize:])
        assert s[0, lane] == pytest.approx(want, abs=5e-7)
