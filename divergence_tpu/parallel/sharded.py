"""shard_map full divergence step over a device mesh.

One compiled SPMD program evaluates a padded window batch sharded over the
mesh's window axis: each shard scores its windows (FET score + bootstrap
stddev, CSS score + distance matrix, one permutation-MC chunk of the null)
entirely locally — the TPU replacement for the reference's pthread pool
(threadfisher.c:47-100, threadcss.c:52-109) — and the chromosome-level
summary statistics (window counts, score sums/maxima used by the region
callers) reduce with ``psum``/``pmax`` over ICI.

This is the "full training step" of the framework: the thing
``__graft_entry__.dryrun_multichip`` compiles over an N-device mesh.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from divergence_tpu.kernels import css as kcss
from divergence_tpu.kernels import fet as kfet
from divergence_tpu.kernels import perm as kperm
from divergence_tpu.parallel.mesh import WINDOW_AXIS


def make_divergence_step(
    mesh: Mesh,
    asize: int,
    bsize: int,
    *,
    percentile: float = 0.95,
    nsamples: int = 100,
    mds: int = 0,
    smacof_iters: int = 300,
    smacof_inits: int = 4,
    smacof_eps: float = 1e-6,
    mc_chunk: int = 128,
    drosophila: bool = False,
):
    """Build the jitted sharded step.

    Returned callable signature::

        step(av, bv, npos, key) -> dict

    with ``av``: [B, P, asize] genotype codes, ``bv``: [B, P, bsize],
    ``npos``: [B] true SNP counts, ``key``: PRNG key (replicated).  ``B``
    must divide evenly by the mesh size.  Outputs: per-window arrays
    (sharded over the window axis) ``fet_scores``, ``fet_stddev``,
    ``css_scores``, ``css_valid``, ``mc_hits``, and replicated global
    summary scalars ``windows_evaluated``, ``score_sum``, ``score_max``.
    """
    maxs = kfet.support_size(asize, bsize)
    nmax = asize + bsize + 2

    def _local(av, bv, npos, key):
        # independent RNG stream per shard
        shard = jax.lax.axis_index(WINDOW_AXIS)
        key = jax.random.fold_in(key, shard)
        fet_s, fet_d = kfet.fet_window_batch(
            av,
            bv,
            npos,
            jnp.float64(percentile),
            jax.random.fold_in(key, 0),
            nsamples=nsamples,
            maxs=maxs,
            nmax=nmax,
        )
        css_s, dist, valid = kcss.css_window_batch(
            av,
            bv,
            npos,
            jax.random.fold_in(key, 1),
            asize=asize,
            bsize=bsize,
            drosophila=drosophila,
            mds=mds,
            smacof_iters=smacof_iters,
            smacof_inits=smacof_inits,
            smacof_eps=smacof_eps,
        )

        # one fixed-shape chunk of the permutation null for every local
        # window (the engine's adaptive MC drives many of these)
        a_mc = 1 if drosophila else asize
        b_mc = 1 if drosophila else bsize
        Bl = av.shape[0]
        hits, _, _ = kperm.permutation_chunk(
            dist,
            css_s,
            jnp.ones((Bl,), dtype=jnp.int32),
            jnp.asarray(mc_chunk),
            jax.random.fold_in(key, 2),
            a_mc,
            b_mc,
            mc_chunk,
        )

        # chromosome-level summary: the only genuinely collective step
        # (region callers consume global medians/maxima; SURVEY.md §5)
        n_eval = jax.lax.psum(jnp.sum(npos > 0), WINDOW_AXIS)
        s_sum = jax.lax.psum(jnp.sum(jnp.where(valid, css_s, 0.0)), WINDOW_AXIS)
        s_max = jax.lax.pmax(
            jnp.max(jnp.where(valid, css_s, -jnp.inf)), WINDOW_AXIS
        )
        return fet_s, fet_d, css_s, valid, hits, n_eval, s_sum, s_max

    sharded = shard_map(
        _local,
        mesh=mesh,
        in_specs=(P(WINDOW_AXIS), P(WINDOW_AXIS), P(WINDOW_AXIS), P()),
        out_specs=(
            P(WINDOW_AXIS),
            P(WINDOW_AXIS),
            P(WINDOW_AXIS),
            P(WINDOW_AXIS),
            P(WINDOW_AXIS),
            P(),
            P(),
            P(),
        ),
    )

    @jax.jit
    def step(av, bv, npos, key):
        fet_s, fet_d, css_s, valid, hits, n_eval, s_sum, s_max = sharded(
            av, bv, npos, key
        )
        return {
            "fet_scores": fet_s,
            "fet_stddev": fet_d,
            "css_scores": css_s,
            "css_valid": valid,
            "mc_hits": hits,
            "windows_evaluated": n_eval,
            "score_sum": s_sum,
            "score_max": s_max,
        }

    return step
