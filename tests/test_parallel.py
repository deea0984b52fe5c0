"""Mesh / shard_map parallelism tests on the virtual 8-device CPU mesh.

The reference's only parallel-correctness test is a serial-vs-threaded
output diff (reference testcss.c:31-142).  The TPU-native equivalent is
1-device-vs-N-device equivalence of the sharded divergence step.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from divergence_tpu.parallel import (
    make_divergence_step,
    make_mesh,
    merge_score_shards,
    pad_to_multiple,
    partition_chromosomes,
    window_sharding,
)


def _batch(B, P, asize=5, bsize=4, seed=3):
    rng = np.random.default_rng(seed)
    codes = np.array([3.0, -3.0, 0.0, -10000.0])
    av = rng.choice(codes, size=(B, P, asize), p=[0.45, 0.35, 0.15, 0.05])
    bv = rng.choice(codes, size=(B, P, bsize), p=[0.45, 0.35, 0.15, 0.05])
    npos = rng.integers(P // 2, P + 1, size=(B,))
    return jnp.asarray(av), jnp.asarray(bv), jnp.asarray(npos)


def test_mesh_construction():
    assert len(jax.devices()) >= 8, "conftest must provide 8 CPU devices"
    mesh = make_mesh(8)
    assert mesh.devices.shape == (8,)
    with pytest.raises(ValueError):
        make_mesh(10_000)


def test_pad_to_multiple():
    assert pad_to_multiple(13, 8) == 16
    assert pad_to_multiple(16, 8) == 16
    assert pad_to_multiple(1, 8) == 8


def _run(mesh, av, bv, npos, **kw):
    step = make_divergence_step(mesh, av.shape[-1], bv.shape[-1], **kw)
    sh = window_sharding(mesh)
    out = step(
        jax.device_put(av, sh),
        jax.device_put(bv, sh),
        jax.device_put(npos, sh),
        jax.random.PRNGKey(0),
    )
    return jax.tree.map(np.asarray, out)


def test_one_vs_eight_device_equivalence():
    """Deterministic outputs (FET scores, CSS/CMDS scores) must be
    identical across mesh sizes; RNG-dependent outputs (bootstrap stddev,
    MC hits) use per-shard streams and are only shape/validity checked."""
    B, P = 16, 32
    av, bv, npos = _batch(B, P)
    out1 = _run(make_mesh(1), av, bv, npos, nsamples=4, mc_chunk=8)
    out8 = _run(make_mesh(8), av, bv, npos, nsamples=4, mc_chunk=8)

    np.testing.assert_allclose(
        out1["fet_scores"], out8["fet_scores"], rtol=1e-12, atol=1e-12
    )
    np.testing.assert_allclose(
        out1["css_scores"], out8["css_scores"], rtol=1e-9, atol=1e-11
    )
    np.testing.assert_array_equal(out1["css_valid"], out8["css_valid"])
    assert int(out1["windows_evaluated"]) == int(out8["windows_evaluated"])
    np.testing.assert_allclose(
        out1["score_sum"], out8["score_sum"], rtol=1e-9
    )
    assert out8["fet_stddev"].shape == (B,)
    assert (out8["fet_stddev"][np.asarray(npos) > 0] >= 0).all()


def test_sharded_matches_unsharded_kernels():
    """The shard_map step's deterministic outputs equal direct kernel calls."""
    from divergence_tpu.kernels import css as kcss
    from divergence_tpu.kernels import fet as kfet

    B, P, asize, bsize = 8, 32, 5, 4
    av, bv, npos = _batch(B, P, asize, bsize, seed=11)
    out = _run(make_mesh(8), av, bv, npos, nsamples=4, mc_chunk=8)

    maxs = kfet.support_size(asize, bsize)
    s, _ = kfet.fet_window_batch(
        av,
        bv,
        npos,
        jnp.float64(0.95),
        jax.random.PRNGKey(1),
        nsamples=4,
        maxs=maxs,
        nmax=asize + bsize + 2,
    )
    np.testing.assert_allclose(out["fet_scores"], np.asarray(s), rtol=1e-12)

    cs, _, valid = kcss.css_window_batch(
        av,
        bv,
        npos,
        jax.random.PRNGKey(2),
        asize=asize,
        bsize=bsize,
    )
    np.testing.assert_allclose(
        out["css_scores"], np.asarray(cs), rtol=1e-9, atol=1e-11
    )
    np.testing.assert_array_equal(out["css_valid"], np.asarray(valid))


def test_engine_sharding_path(panel):
    """run_fet with an explicit window sharding gives identical scores to
    the unsharded path."""
    from divergence_tpu.engine import run_fet
    from divergence_tpu.engine.snp import SnpPair

    apos, avals, bpos, bvals, positions, amat, bmat = panel
    pair = SnpPair(positions=positions, avals=amat, bvals=bmat)
    regend = int(positions[-1]) + 1

    s0, d0 = run_fet(pair, regend)
    sh = window_sharding(make_mesh(8))
    s1, d1 = run_fet(pair, regend, sharding=sh)
    np.testing.assert_allclose(s0, s1, rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(d0, d1, rtol=1e-12, atol=1e-12)


def test_partition_chromosomes_balanced_and_deterministic():
    weights = {f"chr{i}": (i + 1) * 100 for i in range(10)}
    parts = [partition_chromosomes(weights, 4, p) for p in range(4)]
    all_seqids = [s for p in parts for s in p.seqids]
    assert sorted(all_seqids) == sorted(weights)
    loads = [sum(weights[s] for s in p.seqids) for p in parts]
    assert max(loads) <= 2 * min(loads)
    with pytest.raises(ValueError):
        partition_chromosomes(weights, 4, 7)


def test_merge_score_shards():
    a = {"chr1": (np.ones(3), np.zeros(3))}
    b = {"chr2": (np.ones(2), np.zeros(2))}
    merged = merge_score_shards([a, b])
    assert set(merged) == {"chr1", "chr2"}
    with pytest.raises(ValueError):
        merge_score_shards([a, a])
