"""Chunked permutation Monte-Carlo for CSS significance (TPU-native).

The reference permutes labels one at a time per window until 10 hits or
200k permutations (css.c:727-752) — up to 200k serial CSS re-evaluations
per significant window, THE dominant cost (SURVEY.md §3.2).  Here the
whole adaptive loop runs ON DEVICE as a ``lax.while_loop`` over
fixed-shape chunks:

* one iteration evaluates ``chunk`` random permutations for every window
  of the batch at once;
* the permuted CSS decomposes into one batched matmul plus tiny gathers —
  no m x m matrix is ever materialized per permutation:
  between-sum = u^T D (1-u) with u the group-A indicator of the
  permutation, and the within-group *adjacent-chain* sums
  (order-dependent!  css.c:627-641) are m-2 gathers from the flattened
  distance matrix;
* the estimator is exactly the reference's p = (hits+1)/(n+1) with
  n = the permutation index of the threshold-th hit (located inside the
  chunk by cumulative sum), or n = runs at the cap;
* the loop exits as soon as every window of the batch has either reached
  the hit threshold or consumed ``runs`` permutations — one host
  dispatch and one device->host sync for the entire Monte-Carlo of a
  window batch (the host-driven round trip per chunk dominated wall
  time on remote-device backends).

RNG is deterministic per (key, chunk index) and differs from the
wall-clock-seeded reference by design (SURVEY.md §5).
"""

from __future__ import annotations

import dataclasses
import functools

import numpy as np

import jax
import jax.numpy as jnp

from divergence_tpu.kernels.css import chain_weights


def _perm_scores(
    distf: jnp.ndarray,   # [B, m, m] f32
    key: jax.Array,
    asize: int,
    bsize: int,
    chunk: int,
) -> jnp.ndarray:
    """CSS of ``chunk`` random label permutations per window: [B, K] f32.

    Gather-free: with the permutation one-hot Pi ([B, K, m, m],
    Pi[i, p_i] = 1) ONE batched matmul A = Pi @ D gives
    A[..., i, :] = D[p_i, :], from which

    * between-sum: rowsum_j = sum_{i<asize} A[..., i, j] = (u^T D)_j and
      u_j = sum_{i<asize} Pi[..., i, j], so
      between = sum_j rowsum_j (1 - u_j) / (a*b);
    * adjacent chain: D[p_i, p_{i+1}] = sum_j A[..., i, j] Pi[..., i+1, j]
      — an elementwise product + reduce instead of 20M scalar gathers
      (TPU gathers ran ~70 M/s and dominated the chunk; the matmul form
      is pure MXU/VPU work).
    """
    B, m = distf.shape[0], distf.shape[-1]
    u = jax.random.uniform(key, (B, chunk, m), dtype=jnp.float32)
    perm = jnp.argsort(u, axis=-1)               # [B, K, m]

    pi = jax.nn.one_hot(perm, m, dtype=jnp.float32)   # [B, K, m, m]
    a = jax.lax.dot_general(
        pi.reshape(B, chunk * m, m),
        distf,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).reshape(B, chunk, m, m)                     # A[..., i, :] = D[p_i, :]

    ua = jnp.sum(pi[..., :asize, :], axis=-2)     # [B, K, m]
    rowsum = jnp.sum(a[..., :asize, :], axis=-2)  # [B, K, m]
    between = jnp.sum(rowsum * (1.0 - ua), axis=-1) / (asize * bsize)

    d_pairs = jnp.sum(a[..., :-1, :] * pi[..., 1:, :], axis=-1)  # [B,K,m-1]
    w = chain_weights(asize, bsize).astype(jnp.float32)
    chain = jnp.sum(d_pairs * w, axis=-1)

    return between - (asize + bsize) * chain       # [B, K]


@functools.partial(
    jax.jit,
    static_argnames=("asize", "bsize", "chunk", "runs", "threshold"),
)
def mc_significance(
    dist: jnp.ndarray,      # [B, m, m]
    scores: jnp.ndarray,    # [B] observed CSS
    key: jax.Array,
    asize: int,
    bsize: int,
    chunk: int,
    runs: int,
    threshold: int,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Full adaptive permutation MC for one window batch, on device.

    Returns (pvals [B] f64, nscores [B] i32, hits [B] i32) with the
    reference estimator: stop a window at its ``threshold``-th hit
    (n = that permutation's 1-based index) or at ``runs``;
    p = (hits+1)/(n+1) (css.c:727-752)."""
    B = dist.shape[0]
    distf = dist.astype(jnp.float32)
    scoresf = scores.astype(jnp.float32)
    n_chunks = (runs + chunk - 1) // chunk

    def cond(carry):
        k, hits, nsc, done = carry
        return (k < n_chunks) & ~jnp.all(done)

    def body(carry):
        k, hits, nsc, done = carry
        new_scores = _perm_scores(
            distf, jax.random.fold_in(key, k), asize, bsize, chunk
        )
        offset = k * chunk
        counted = (offset + jnp.arange(chunk)) < runs       # [K]
        hit = (new_scores >= scoresf[:, None]) & counted[None, :]
        cum = jnp.cumsum(hit.astype(jnp.int32), axis=-1)    # [B, K]
        chunk_hits = cum[:, -1]
        n_counted = jnp.sum(counted.astype(jnp.int32))

        need = threshold - hits                              # [B]
        reached = (chunk_hits >= need) & ~done
        pos = jnp.argmax(cum >= need[:, None], axis=-1).astype(jnp.int32)

        hits = jnp.where(
            done, hits, jnp.where(reached, threshold, hits + chunk_hits)
        ).astype(jnp.int32)
        nsc = jnp.where(
            done,
            nsc,
            jnp.where(reached, offset + pos + 1, offset + n_counted),
        ).astype(jnp.int32)
        return k + jnp.int32(1), hits, nsc, done | reached

    zero = jnp.zeros(B, dtype=jnp.int32)
    _, hits, nsc, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), zero, zero, jnp.zeros(B, dtype=bool))
    )
    pvals = (hits + 1.0) / (nsc.astype(jnp.float64) + 1.0)
    return pvals, nsc, hits


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
    """One fixed-shape chunk of the null (building block / sharded step).

    Returns (chunk_hits [B], reached [B] bool, pos [B]) where ``pos`` is
    the 0-based in-chunk index of the permutation that delivered the
    ``need``-th hit (valid only where ``reached``)."""
    new_scores = _perm_scores(
        dist.astype(jnp.float32), key, asize, bsize, chunk
    )
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


@functools.partial(
    jax.jit, static_argnames=("asize", "bsize", "chunk")
)
def _null_moments(
    dist: jnp.ndarray,     # [B, m, m]
    key: jax.Array,
    asize: int,
    bsize: int,
    chunk: int,
) -> jnp.ndarray:
    """First three central moments of the permutation null from one chunk
    of ``chunk`` permutations per window: [3, B] (mean, var, mu3)."""
    s = _perm_scores(dist.astype(jnp.float32), key, asize, bsize, chunk)
    s64 = s.astype(jnp.float64)
    mean = jnp.mean(s64, axis=-1)
    d = s64 - mean[:, None]
    var = jnp.mean(d * d, axis=-1)
    mu3 = jnp.mean(d * d * d, axis=-1)
    return jnp.stack([mean, var, mu3])


def approx_significance(
    dist: np.ndarray,
    scores: np.ndarray,
    asize: int,
    bsize: int,
    key: jax.Array,
    chunk: int = 1024,
    window_batch: int = 1024,
) -> McResult:
    """Pearson-III (moment-fitted) permutation p-values.

    The permuted CSS is a bilinear permutation statistic of the fixed
    distance matrix (between-block + adjacent-chain sums over sigma), the
    class of statistics the MRPP literature shows is well-approximated by
    a Pearson type III (shifted-gamma) null fitted to its first three
    moments (Mielke & Berry, Permutation Methods).  One fixed-size chunk
    of permutations estimates the moments; the tail is evaluated
    analytically — ~200x less device work than the adaptive MC at 200k
    runs, at the cost of model error in the extreme tail.  Use the exact
    MC (``significance``) when reference-exact estimators are required.
    """
    from scipy import stats as sstats

    B = len(scores)
    pvals = np.ones(B, dtype=np.float64)
    if B == 0:
        return McResult(
            pvals=pvals,
            nscores=np.zeros(B, dtype=np.int64),
            hits=np.zeros(B, dtype=np.int64),
        )

    dist_d = jnp.asarray(dist)
    moments = np.zeros((3, B))
    for bi, start in enumerate(range(0, B, window_batch)):
        sel = np.arange(start, min(start + window_batch, B))
        Bp = 8
        while Bp < len(sel):
            Bp *= 2
        sel_p = np.concatenate([sel, np.full(Bp - len(sel), sel[0])])
        mom = _null_moments(
            dist_d[sel_p],
            jax.random.fold_in(key, bi),
            asize,
            bsize,
            chunk,
        )
        jax.block_until_ready(mom)
        moments[:, sel] = jax.device_get(mom)[:, : len(sel)]

    mean, var, mu3 = moments
    sd = np.sqrt(np.maximum(var, 1e-30))
    skew = mu3 / np.maximum(sd**3, 1e-30)
    z = (scores - mean) / sd

    # Pearson III: standardized gamma with shape a = 4/skew^2, matching
    # the third moment; sign of the skew mirrors the distribution.
    # |skew| ~ 0 degenerates to the normal tail.
    small = np.abs(skew) < 1e-3
    p = np.empty(B)
    p[small] = sstats.norm.sf(z[small])
    big = ~small
    if big.any():
        a = 4.0 / (skew[big] ** 2)
        pos = skew[big] > 0
        # X = (Z * sign) * sqrt(a) + a  ~ Gamma(a, 1) under Pearson III
        zz = np.where(pos, z[big], -z[big])
        x = zz * np.sqrt(a) + a
        tail_hi = sstats.gamma.sf(np.maximum(x, 0.0), a)
        tail_lo = sstats.gamma.cdf(np.maximum(x, 0.0), a)
        p[big] = np.where(pos, tail_hi, tail_lo)
        # beyond the distribution's support bound, the tail is 0/1
        p[big] = np.where(x <= 0.0, np.where(pos, 1.0, 0.0), p[big])
    p = np.clip(p, 1e-300, 1.0)
    return McResult(
        pvals=p,
        nscores=np.full(B, chunk, dtype=np.int64),
        hits=np.zeros(B, dtype=np.int64),
    )


def significance(
    dist: np.ndarray,
    scores: np.ndarray,
    asize: int,
    bsize: int,
    threshold: int,
    runs: int,
    key: jax.Array,
    chunk: int = 256,
    window_batch: int = 1024,
) -> McResult:
    """Adaptive permutation p-values for a set of windows.

    Drives :func:`mc_significance` over padded window batches — one
    device dispatch + one host sync per batch, with the adaptive
    chunk loop entirely on device."""
    B = len(scores)
    pvals = np.zeros(B, dtype=np.float64)
    nsc = np.zeros(B, dtype=np.int64)
    hits = np.zeros(B, dtype=np.int64)
    if B == 0:
        return McResult(pvals=pvals, nscores=nsc, hits=hits)

    dist_d = jnp.asarray(dist)
    for bi, start in enumerate(range(0, B, window_batch)):
        sel = np.arange(start, min(start + window_batch, B))
        Bp = 8
        while Bp < len(sel):
            Bp *= 2
        pad = Bp - len(sel)
        sel_p = np.concatenate([sel, np.full(pad, sel[0], dtype=np.int64)])
        pv, n, h = mc_significance(
            dist_d[sel_p],
            jnp.asarray(scores[sel_p]),
            jax.random.fold_in(key, bi),
            asize,
            bsize,
            chunk,
            runs,
            threshold,
        )
        jax.block_until_ready(pv)
        packed = jax.device_get(
            jnp.stack(
                [pv, n.astype(jnp.float64), h.astype(jnp.float64)]
            )
        )
        pvals[sel] = packed[0, : len(sel)]
        nsc[sel] = packed[1, : len(sel)].astype(np.int64)
        hits[sel] = packed[2, : len(sel)].astype(np.int64)

    return McResult(pvals=pvals, nscores=nsc, hits=hits)
