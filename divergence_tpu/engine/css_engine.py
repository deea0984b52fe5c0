"""Per-chromosome CSS engine.

Orchestrates: window plan -> npos buckets -> batched CSS kernel (scores +
per-window distance matrices) -> chromosome-wide chunked permutation MC.
Replaces the reference pthread pool (threadcss.c:52-109); the Monte-Carlo
runs over *all* valid windows of the chromosome at once, so its batch
size is independent of SNP-count bucketing.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from divergence_tpu.config import CssConfig
from divergence_tpu.core.batching import bucketize
from divergence_tpu.engine.fet_engine import _gather_windows
from divergence_tpu.core.windows import plan_windows
from divergence_tpu.engine.snp import SnpPair
from divergence_tpu.kernels import css as kcss
from divergence_tpu.kernels import perm as kperm
from divergence_tpu.utils.summary import RunSummary


def _pad_batch(n: int) -> int:
    p = 8
    while p < n:
        p *= 2
    return p


def run_css(
    pair: SnpPair,
    regend: int,
    cfg: CssConfig | None = None,
    sharding=None,
    summary: RunSummary | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """CSS scan of one chromosome.

    Returns (scores, pvals) of ``regend // wstep`` slots (reference
    statistics/CategoryClusterSeparationStat.py:70-80).  Discarded or
    empty windows keep score 0 / p 0."""
    cfg = cfg or CssConfig()
    w = cfg.window
    plan = plan_windows(pair.positions, regend, w.wsize, w.wstep)
    nslots = plan.nslots
    scores = np.zeros(nslots, dtype=np.float64)
    pvals = np.zeros(nslots, dtype=np.float64)
    if plan.num_windows == 0 or pair.npos == 0:
        return scores, pvals

    asize, bsize = pair.asize, pair.bsize
    m = 2 if cfg.drosophila else asize + bsize
    avals_d, bvals_d = pair.device_values()
    key = jax.random.PRNGKey(cfg.seed)

    in_slots = plan.slot < nslots
    buckets = bucketize(
        plan.lo,
        np.where(in_slots, plan.npos, 0),
        plan.slot,
        max_batch=4096,
    )

    # phase 1: scores + distance matrices for every valid window;
    # dispatch all buckets asynchronously, materialize with one host sync
    pending = []
    for bi, bucket in enumerate(buckets):
        Bw = len(bucket.window_ids)
        Bp = _pad_batch(Bw)
        lo = np.pad(bucket.lo, (0, Bp - Bw))
        npos = np.pad(bucket.npos, (0, Bp - Bw))
        lo_d = jnp.asarray(lo)
        npos_d = jnp.asarray(npos)
        if sharding is not None:
            lo_d = jax.device_put(lo_d, sharding)
            npos_d = jax.device_put(npos_d, sharding)
        av, bv = _gather_windows(
            avals_d, bvals_d, lo_d, npos_d, bucket.padded_npos
        )

        s, dist, valid = kcss.css_window_batch(
            av,
            bv,
            npos_d,
            jax.random.fold_in(key, 1000 + bi),
            asize=asize,
            bsize=bsize,
            drosophila=cfg.drosophila,
            mds=int(cfg.mds),
            smacof_iters=cfg.smacof.max_iters,
            smacof_inits=cfg.smacof.n_init,
            smacof_eps=cfg.smacof.epsilon,
            fast=cfg.precision == "fast",
        )
        pending.append((bucket, s, dist, valid))

    all_slots: list[np.ndarray] = []
    all_scores: list[np.ndarray] = []
    all_dist: list[np.ndarray] = []
    n_discarded = 0
    # pack (dist | score | valid) per window into one [sumB, m*m+2] array:
    # a single device->host round trip for the whole phase.  Block on the
    # in-flight kernels first (see fet_engine: eager ops over still-
    # executing inputs hit a slow path on remote-device backends).
    if not pending:
        return scores, pvals
    jax.block_until_ready([s for _, s, _, _ in pending])
    packed = jnp.concatenate(
        [
            jnp.concatenate(
                [
                    d.reshape(d.shape[0], -1),
                    s[:, None],
                    v[:, None].astype(s.dtype),
                ],
                axis=1,
            )
            for _, s, d, v in pending
        ]
    )
    fetched = jax.device_get(packed)
    off = 0
    for bucket, s_d, _, _ in pending:
        Bp = s_d.shape[0]
        Bw = len(bucket.window_ids)
        rows = fetched[off : off + Bw]
        off += Bp
        dist = rows[:, : m * m].reshape(Bw, m, m)
        s = rows[:, m * m]
        valid = rows[:, m * m + 1] != 0.0
        n_discarded += int((~valid & (bucket.npos > 0)).sum())
        all_slots.append(bucket.slot[valid])
        all_scores.append(s[valid])
        all_dist.append(dist[valid])

    if not all_scores or sum(len(s) for s in all_scores) == 0:
        return scores, pvals

    slots = np.concatenate(all_slots)
    svals = np.concatenate(all_scores)
    dists = np.concatenate(all_dist)

    # phase 2: chromosome-wide adaptive permutation MC
    a_mc = 1 if cfg.drosophila else asize
    b_mc = 1 if cfg.drosophila else bsize
    mc = kperm.significance(
        dists,
        svals,
        a_mc,
        b_mc,
        cfg.mc_threshold,
        cfg.mc_runs,
        jax.random.fold_in(key, 2),
        chunk=cfg.mc_chunk,
    )

    scores[slots] = svals
    pvals[slots] = mc.pvals
    if summary is not None:
        # accumulate across chromosomes (one summary spans a whole run)
        c = summary.counters
        c["windows_planned"] = c.get("windows_planned", 0) + plan.num_windows
        c["windows_scored"] = c.get("windows_scored", 0) + len(svals)
        c["windows_discarded"] = c.get("windows_discarded", 0) + n_discarded
        c["mc_permutations"] = c.get("mc_permutations", 0) + int(
            mc.nscores.sum()
        )
    return scores, pvals
