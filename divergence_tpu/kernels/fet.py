"""Batched Fisher's Exact Test kernel (TPU-native).

Replaces the reference's per-SNP scalar recurrences
(cFisher.c: fetcount :208-238, fet :405-455, fet_p :473-483,
percentile :136-144, calc_std :590-597) with fixed-shape vector math:

* the 2x2 tables of *every* SNP of *every* window in a bucket are counted
  with one masked reduction;
* the two-tailed p is evaluated over the whole hypergeometric support at
  once (support size <= (asize+bsize)//2 + 1) using a precomputed
  log-factorial table — no data-dependent loops, so everything vmaps and
  jits;
* the Feldman-Klinger/Zar tail semantics are reproduced exactly:
  first tail = all tables from the observed one (minimum cell) down to
  zero; second tail = tables scanned from the opposite extreme inward
  while *strictly* less probable than the observed table (a suffix-AND
  instead of a sequential scan); equal row/column margins double the
  first tail; the total clamps at 1 (cFisher.c:433-452);
* the window percentile and the 100 bootstrap-replicate percentiles use
  ``lax.top_k`` (only the top (1-perc) tail of each replicate is ever
  needed) instead of full sorts.

Shapes: a bucket is [B, P, size] — B windows, P padded SNPs.
Probability math runs in float64 (the reference is all C doubles).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def support_size(asize: int, bsize: int) -> int:
    """Static bound on the hypergeometric support after table shifting.

    With the minimum cell leading, hi = min(R1', C1') <= N/2 where
    N <= asize + bsize individuals enter the table."""
    return (asize + bsize) // 2 + 2


def _log_factorials(nmax: int) -> np.ndarray:
    """lgamma(i+1) for i in 0..nmax, computed host-side once."""
    from scipy.special import gammaln

    return gammaln(np.arange(nmax + 1, dtype=np.float64) + 1.0)


def count_tables(avals: jnp.ndarray, bvals: jnp.ndarray) -> jnp.ndarray:
    """2x2 allele-count tables for every (window, SNP).

    ``avals``: [..., asize], ``bvals``: [..., bsize] genotype codes.
    Only homozygous calls are counted (cFisher.c:208-238).
    Returns [..., 4] int32 (f0..f3)."""
    f0 = jnp.sum(avals == 3, axis=-1, dtype=jnp.int32)
    f1 = jnp.sum(avals == -3, axis=-1, dtype=jnp.int32)
    f2 = jnp.sum(bvals == 3, axis=-1, dtype=jnp.int32)
    f3 = jnp.sum(bvals == -3, axis=-1, dtype=jnp.int32)
    return jnp.stack([f0, f1, f2, f3], axis=-1)


def _shift_min_first(f: jnp.ndarray) -> jnp.ndarray:
    """Rotate each table in clockwise order so the minimum cell leads
    (cFisher.c:327-346).  argmin == first minimum, like min_idx."""
    cw = jnp.stack([f[..., 0], f[..., 1], f[..., 3], f[..., 2]], axis=-1)
    idx = jnp.argmin(cw, axis=-1)
    offs = (idx[..., None] + jnp.arange(4, dtype=idx.dtype)) % 4
    rot = jnp.take_along_axis(cw, offs, axis=-1)
    return jnp.stack(
        [rot[..., 0], rot[..., 1], rot[..., 3], rot[..., 2]], axis=-1
    )


def fet_two_tailed(tables: jnp.ndarray, maxs: int, nmax: int) -> jnp.ndarray:
    """Two-tailed FET p for a batch of 2x2 tables.

    ``tables``: [..., 4] int32; ``maxs``: static support bound;
    ``nmax``: static max total count (for the log-factorial table).
    Returns [...] float64 p-values, Zar-shortcut semantics."""
    lf = jnp.asarray(_log_factorials(nmax), dtype=jnp.float64)

    def lchoose(n, k):
        ok = (k >= 0) & (k <= n) & (n >= 0)
        kc = jnp.clip(k, 0, nmax)
        nc = jnp.clip(n, 0, nmax)
        val = lf[nc] - lf[kc] - lf[jnp.clip(nc - kc, 0, nmax)]
        return jnp.where(ok, val, -jnp.inf)

    f = tables
    R1 = f[..., 0] + f[..., 1]
    R2 = f[..., 2] + f[..., 3]
    C1 = f[..., 0] + f[..., 2]
    C2 = f[..., 1] + f[..., 3]
    equal_margins = (R1 == R2) | (C1 == C2)

    s = _shift_min_first(f)
    a0 = s[..., 0]
    r1 = s[..., 0] + s[..., 1]
    r2 = s[..., 2] + s[..., 3]
    c1 = s[..., 0] + s[..., 2]
    n = r1 + r2
    hi = jnp.minimum(r1, c1)

    x = jnp.arange(maxs, dtype=jnp.int32)
    shape = (1,) * f[..., 0].ndim + (maxs,)
    x = x.reshape(shape)
    r1e, r2e, c1e, ne = (t[..., None] for t in (r1, r2, c1, n))
    logp = lchoose(r1e, x) + lchoose(r2e, c1e - x) - lchoose(ne, c1e)
    valid = x <= hi[..., None]
    p = jnp.where(valid, jnp.exp(logp), 0.0)

    p0 = jnp.take_along_axis(p, a0[..., None].astype(jnp.int32), axis=-1)
    # first tail: every table from the observed minimum cell down to zero
    # (cFisher.c:422-427) — unconditional, even across the mode (the
    # shortcut is conservative for near-mode tables; oracle-verified).
    t1 = jnp.sum(jnp.where(x <= a0[..., None], p, 0.0), axis=-1)

    # second tail: scanned from the opposite extreme (x = hi) inward while
    # not more probable than the observed table (cFisher.c:436-448).
    # Probability *ties* are included — the framework's deterministic
    # tie rule (see oracle.reference.FET_TIE_RTOL); the reference's own
    # tie behavior is FP-rounding-dependent.  valid-suffix AND: a position
    # contributes iff no table at >= x fails the comparison.
    bad = (p > p0 * (1.0 + 1e-12)) & valid
    blocked = jnp.flip(
        jnp.cumsum(jnp.flip(bad, axis=-1).astype(jnp.int32), axis=-1), axis=-1
    )
    ok = (blocked == 0) & valid & (x > a0[..., None])
    t2 = jnp.sum(jnp.where(ok, p, 0.0), axis=-1)

    total = jnp.where(equal_margins, 2.0 * t1, t1 + t2)
    return jnp.minimum(total, 1.0)


def _percentile_from_topk(
    topk_desc: jnp.ndarray, npos: jnp.ndarray, perc: jnp.ndarray
) -> jnp.ndarray:
    """Interpolated percentile from a descending top-k slice.

    Reproduces the reference percentile (cFisher.c:136-144): with the
    ascending order statistic s[.], result = (1-d)*s[idx] + d*s[idx+1],
    idx = int((n-1)*perc).  Ascending rank j maps to descending rank
    n-1-j, which lives in the top-k slice for all j >= n-1-(k-1)."""
    nf = npos.astype(jnp.float64)
    xpos = (nf - 1.0) * perc
    idx = jnp.floor(xpos).astype(jnp.int32)
    delta = xpos - idx.astype(jnp.float64)
    hi_idx = jnp.minimum(idx + 1, npos - 1)
    r_lo = (npos - 1 - idx).astype(jnp.int32)
    r_hi = (npos - 1 - hi_idx).astype(jnp.int32)
    v_lo = jnp.take_along_axis(topk_desc, r_lo[..., None], axis=-1)[..., 0]
    v_hi = jnp.take_along_axis(topk_desc, r_hi[..., None], axis=-1)[..., 0]
    return (1.0 - delta) * v_lo + delta * v_hi


def topk_needed(pmax: int, perc: float) -> int:
    """Static k: descending ranks needed for the percentile of any window
    with npos <= pmax (monotone in npos, so the bound is at npos == pmax)."""
    return max(pmax - int((pmax - 1) * perc), 2)


@functools.partial(
    jax.jit, static_argnames=("nsamples", "maxs", "nmax", "k")
)
def fet_window_batch(
    avals: jnp.ndarray,       # [B, P, asize] genotype codes (any float/int)
    bvals: jnp.ndarray,       # [B, P, bsize]
    npos: jnp.ndarray,        # [B] true SNP count per window
    perc: jnp.ndarray,        # scalar f64
    key: jax.Array,           # PRNG key for the bootstrap
    nsamples: int,
    maxs: int,
    nmax: int,
    k: int,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """FET scores + bootstrap stddev for one padded bucket of windows.

    Padding rows (snp index >= npos) never influence the result: their
    scores are pinned to -inf before the top-k and bootstrap draws index
    only the valid prefix."""
    B, P = avals.shape[0], avals.shape[1]
    tables = count_tables(avals, bvals)          # [B, P, 4]
    pvals = fet_two_tailed(tables, maxs, nmax)   # [B, P]
    logs = -jnp.log10(pvals)

    snp_mask = jnp.arange(P)[None, :] < npos[:, None]
    neg = jnp.float64(-jnp.inf)
    logs_m = jnp.where(snp_mask, logs, neg)

    top = jax.lax.top_k(logs_m, k)[0]            # [B, k] descending
    scores = _percentile_from_topk(top, npos, perc)

    # bootstrap: nsamples replicates of npos draws with replacement
    # (cFisher.c:562-571, 590-597); draws only index the valid prefix.
    u = jax.random.uniform(key, (B, nsamples, P), dtype=jnp.float64)
    draw = jnp.floor(u * npos[:, None, None].astype(jnp.float64))
    draw = jnp.clip(draw.astype(jnp.int32), 0, P - 1)
    samples = jnp.take_along_axis(
        logs_m[:, None, :], draw, axis=-1
    )                                             # [B, S, P]
    samples = jnp.where(snp_mask[:, None, :], samples, neg)
    top_s = jax.lax.top_k(samples, k)[0]          # [B, S, k]
    reps = _percentile_from_topk(
        top_s, npos[:, None], perc
    )                                             # [B, S]
    mu = jnp.mean(reps, axis=-1, keepdims=True)
    stddev = jnp.sqrt(jnp.mean((reps - mu) ** 2, axis=-1))

    valid_w = npos > 0
    return (
        jnp.where(valid_w, scores, 0.0),
        jnp.where(valid_w, stddev, 0.0),
    )
