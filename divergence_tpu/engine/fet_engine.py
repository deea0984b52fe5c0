"""Per-chromosome FET engine.

Orchestrates: window plan (host) -> npos buckets -> device-side window
gather -> batched FET kernel -> dense score/stddev tracks.  Replaces the
reference's pthread pool + mutex task counter (threadfisher.c:47-100) with
static even batches; with a device mesh the window axis shards over ICI
(see divergence_tpu.parallel).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from divergence_tpu.config import FetConfig
from divergence_tpu.core.batching import bucketize, gather_indices
from divergence_tpu.core.windows import plan_windows
from divergence_tpu.engine.snp import SnpPair
from divergence_tpu.kernels import fet as kfet
from divergence_tpu.utils.summary import RunSummary


def _pad_batch(n: int) -> int:
    """Round a bucket's window count up to a power of two (>= 8) so the
    number of distinct compiled shapes stays logarithmic."""
    p = 8
    while p < n:
        p *= 2
    return p


def run_fet(
    pair: SnpPair,
    regend: int,
    cfg: FetConfig | None = None,
    sharding=None,
    summary: RunSummary | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """FET scan of one chromosome.

    Returns (scores, stddev), each of ``regend // wstep`` slots — slot
    ``w.start // wstep`` like the reference adapter
    (statistics/FisherExactScoreStat.py:51-58).  ``sharding`` optionally
    places the window batches over a device mesh (window-axis data
    parallelism)."""
    cfg = cfg or FetConfig()
    w = cfg.window
    plan = plan_windows(pair.positions, regend, w.wsize, w.wstep)
    nslots = plan.nslots
    scores = np.zeros(nslots, dtype=np.float64)
    stddev = np.zeros(nslots, dtype=np.float64)
    if plan.num_windows == 0 or pair.npos == 0:
        return scores, stddev

    # device-resident SNP matrices; window rows are gathered on device
    avals_d = jnp.asarray(pair.avals)
    bvals_d = jnp.asarray(pair.bvals)

    maxs = kfet.support_size(pair.asize, pair.bsize)
    nmax = pair.asize + pair.bsize + 2
    key = jax.random.PRNGKey(cfg.seed)

    in_slots = plan.slot < nslots
    buckets = bucketize(
        plan.lo,
        np.where(in_slots, plan.npos, 0),
        plan.slot,
        max_batch=4096,
    )
    if summary is not None:
        summary.counters["windows_planned"] = plan.num_windows
        summary.counters["windows_evaluated"] = int(
            sum(len(b.window_ids) for b in buckets)
        )
        summary.counters["buckets"] = len(buckets)

    for bi, bucket in enumerate(buckets):
        idx, _ = gather_indices(bucket)
        Bw = len(bucket.window_ids)
        Bp = _pad_batch(Bw)
        if Bp != Bw:
            idx = np.pad(idx, ((0, Bp - Bw), (0, 0)))
        npos = np.pad(bucket.npos, (0, Bp - Bw))

        idx_d = jnp.asarray(idx)
        npos_d = jnp.asarray(npos)
        if sharding is not None:
            idx_d = jax.device_put(idx_d, sharding)
            npos_d = jax.device_put(npos_d, sharding)
        av = jnp.take(avals_d, idx_d, axis=0)  # [Bp, P, asize]
        bv = jnp.take(bvals_d, idx_d, axis=0)

        k = kfet.topk_needed(bucket.padded_npos, cfg.percentile)
        s, d = kfet.fet_window_batch(
            av,
            bv,
            npos_d,
            jnp.float64(cfg.percentile),
            jax.random.fold_in(key, bi),
            nsamples=cfg.bootstrap_samples,
            maxs=maxs,
            nmax=nmax,
            k=k,
        )
        s = np.asarray(s)[:Bw]
        d = np.asarray(d)[:Bw]
        scores[bucket.slot] = s
        stddev[bucket.slot] = d

    return scores, stddev
