"""Chunked permutation Monte-Carlo for CSS significance (TPU-native).

The reference permutes labels one at a time per window until 10 hits or
200k permutations (css.c:727-752) — up to 200k serial CSS re-evaluations
per significant window, THE dominant cost (SURVEY.md §3.2).  Here the
adaptive loop becomes fixed-shape device chunks:

* a chunk evaluates K random permutations for every still-active window
  at once;
* the permuted CSS decomposes into one batched matmul plus tiny gathers —
  no m x m matrix is ever materialized per permutation:
  between-sum = u^T D (1-u) with u the group-A indicator of the
  permutation (computed as one [K, m] x [m, m] matmul per window), and
  the within-group *adjacent-chain* sums (order-dependent!
  css.c:627-641) are m-2 gathers from the flattened distance matrix;
* the estimator is exactly the reference's p = (hits+1)/(n+1) with
  n = the permutation index of the threshold-th hit (located inside the
  chunk by cumulative sum), or n = runs at the cap.

The host drives rounds, compacting finished windows out of the batch, so
non-significant windows (the vast majority) exit after one chunk.
"""

from __future__ import annotations

import dataclasses
import functools

import numpy as np

import jax
import jax.numpy as jnp

from divergence_tpu.kernels.css import chain_weights


@functools.partial(
    jax.jit, static_argnames=("asize", "bsize", "chunk")
)
def permutation_chunk(
    dist: jnp.ndarray,      # [B, m, m] distances of active windows
    scores: jnp.ndarray,    # [B] observed CSS per window
    need: jnp.ndarray,      # [B] hits still needed to reach the threshold
    limit: jnp.ndarray,     # scalar: #permutations of this chunk that count
    key: jax.Array,
    asize: int,
    bsize: int,
    chunk: int,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Evaluate ``chunk`` permutations per window.

    Returns (chunk_hits [B], reached [B] bool, pos [B]) where ``pos`` is
    the 0-based in-chunk index of the permutation that delivered the
    ``need``-th hit (valid only where ``reached``)."""
    B, m = dist.shape[0], dist.shape[-1]

    # uniform random permutations via argsort of uniforms
    u = jax.random.uniform(key, (B, chunk, m), dtype=jnp.float32)
    perm = jnp.argsort(u, axis=-1)               # [B, K, m]

    distf = dist.astype(jnp.float32)
    # group-A indicator of each permutation
    ua = jnp.sum(
        jax.nn.one_hot(perm[..., :asize], m, dtype=jnp.float32), axis=-2
    )                                             # [B, K, m]
    rowsum = jax.lax.dot_general(
        ua,
        distf,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )                                             # [B, K, m]
    between = jnp.sum(rowsum * (1.0 - ua), axis=-1) / (asize * bsize)

    # adjacent-chain terms: gather D[p_i, p_{i+1}] for consecutive pairs
    flat = distf.reshape(B, m * m)
    pair_idx = perm[..., :-1] * m + perm[..., 1:]  # [B, K, m-1]
    d_pairs = jnp.take_along_axis(
        flat[:, None, :], pair_idx.reshape(B, -1)[:, None, :], axis=-1
    ).reshape(B, chunk, m - 1)
    w = chain_weights(asize, bsize).astype(jnp.float32)
    chain = jnp.sum(d_pairs * w, axis=-1)

    new_scores = between - (asize + bsize) * chain  # [B, K]

    counted = jnp.arange(chunk)[None, :] < limit
    hit = (new_scores >= scores[:, None].astype(jnp.float32)) & counted
    cum = jnp.cumsum(hit.astype(jnp.int32), axis=-1)
    reached = cum[:, -1] >= need
    pos = jnp.argmax(cum >= need[:, None], axis=-1)
    return cum[:, -1], reached, pos


@dataclasses.dataclass
class McResult:
    pvals: np.ndarray      # [B]
    nscores: np.ndarray    # [B] permutations consumed
    hits: np.ndarray       # [B]


def significance(
    dist: np.ndarray,
    scores: np.ndarray,
    asize: int,
    bsize: int,
    threshold: int,
    runs: int,
    key: jax.Array,
    chunk: int = 4096,
) -> McResult:
    """Adaptive permutation p-values for a set of windows.

    Drives fixed-shape chunks, compacting finished windows each round.
    Estimator parity with css.c:727-752: stop at the ``threshold``-th hit
    (n = its permutation index + 1) or at ``runs``; p = (hits+1)/(n+1).
    RNG stream is deterministic per (key, window, round) and differs from
    the wall-clock-seeded reference by design."""
    B = len(scores)
    hits = np.zeros(B, dtype=np.int64)
    nsc = np.zeros(B, dtype=np.int64)
    done = np.zeros(B, dtype=bool)
    offset = 0
    rnd = 0
    dist_d = jnp.asarray(dist)

    while not done.all() and offset < runs:
        active = np.nonzero(~done)[0]
        k_eff = min(chunk, runs - offset)
        # pad the active set to a power of two to bound recompilation
        Bp = 8
        while Bp < len(active):
            Bp *= 2
        pad = Bp - len(active)
        sel = np.concatenate([active, np.zeros(pad, dtype=np.int64)])

        ch_hits, reached, pos = permutation_chunk(
            dist_d[sel],
            jnp.asarray(scores[sel]),
            jnp.asarray(threshold - hits[sel]),
            jnp.asarray(k_eff),
            jax.random.fold_in(key, rnd),
            asize,
            bsize,
            chunk,
        )
        # one host sync per round (pack into a single device array; a
        # pytree device_get fetches leaf-by-leaf, one round trip each);
        # block before packing — see fet_engine on the slow path for
        # eager ops over in-flight inputs
        jax.block_until_ready((ch_hits, reached, pos))
        packed = jax.device_get(
            jnp.stack(
                [
                    ch_hits.astype(jnp.int64),
                    reached.astype(jnp.int64),
                    pos.astype(jnp.int64),
                ]
            )
        )
        ch_hits = packed[0, : len(active)]
        reached = packed[1, : len(active)].astype(bool)
        pos = packed[2, : len(active)]

        fin = active[reached]
        hits[fin] = threshold
        nsc[fin] = offset + pos[reached] + 1
        done[fin] = True

        cont = active[~reached]
        hits[cont] += ch_hits[~reached]
        offset += k_eff
        nsc[cont] = offset
        rnd += 1

    pvals = (hits + 1.0) / (nsc + 1.0)
    return McResult(pvals=pvals, nscores=nsc, hits=hits)
