"""Per-chromosome FET engine.

Orchestrates: window plan (host) -> npos buckets -> device-side window
gather -> batched FET kernel -> dense score/stddev tracks.  Replaces the
reference's pthread pool + mutex task counter (threadfisher.c:47-100) with
static even batches; with a device mesh the window axis shards over ICI
(see divergence_tpu.parallel).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from divergence_tpu.config import FetConfig
from divergence_tpu.core.batching import bucketize
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


@functools.partial(jax.jit, static_argnames=("P",))
def _gather_windows(avals, bvals, lo, npos, P):
    """Device-side window materialization: [B] descriptors -> [B, P, size]
    padded batches.  Rows past ``npos`` point at SNP 0 and are masked in
    the kernels."""
    offs = jnp.arange(P, dtype=lo.dtype)[None, :]
    idx = lo[:, None] + offs
    idx = jnp.where(offs < npos[:, None], idx, 0)
    return jnp.take(avals, idx, axis=0), jnp.take(bvals, idx, axis=0)


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
    avals_d, bvals_d = pair.device_values()

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
        # accumulate across chromosomes (one summary spans a whole run)
        c = summary.counters
        c["windows_planned"] = c.get("windows_planned", 0) + plan.num_windows
        c["windows_evaluated"] = c.get("windows_evaluated", 0) + int(
            sum(len(b.window_ids) for b in buckets)
        )
        c["buckets"] = c.get("buckets", 0) + len(buckets)

    # dispatch every bucket asynchronously; materialize with ONE host sync
    # at the end (each blocking device->host read costs a full round trip,
    # which dwarfs the kernels themselves on small workloads)
    pending: list[tuple[np.ndarray, int, jnp.ndarray, jnp.ndarray]] = []
    for bi, bucket in enumerate(buckets):
        Bw = len(bucket.window_ids)
        Bp = _pad_batch(Bw)
        # upload only the [B] window descriptors; the [B, P] gather index
        # matrix is built on device (60x less host->device traffic)
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

        s, d = kfet.fet_window_batch(
            av,
            bv,
            npos_d,
            jnp.float64(cfg.percentile),
            jax.random.fold_in(key, bi),
            nsamples=cfg.bootstrap_samples,
            maxs=maxs,
            nmax=nmax,
            fast=cfg.precision == "fast",
        )
        pending.append((bucket.slot, Bw, s, d))

    # pack all buckets into ONE device array so materialization costs a
    # single device->host round trip (device_get of a pytree fetches each
    # leaf separately).  Wait for the in-flight kernels BEFORE dispatching
    # the pack: on remote-device backends an eager op whose inputs are
    # still executing lands on a slow scheduling path (~0.5 s), while
    # blocking on finished work and packing ready buffers is milliseconds.
    if not pending:
        return scores, stddev
    jax.block_until_ready([(s, d) for _, _, s, d in pending])
    packed = jnp.stack(
        [
            jnp.concatenate([s for _, _, s, _ in pending]),
            jnp.concatenate([d for _, _, _, d in pending]),
        ]
    )
    fetched = jax.device_get(packed)
    off = 0
    for slot, Bw, s, _ in pending:
        Bp = s.shape[0]
        scores[slot] = fetched[0, off : off + Bw]
        stddev[slot] = fetched[1, off : off + Bw]
        off += Bp

    return scores, stddev
