"""MC evaluator variant experiments (round 4, VERDICT item 1).

Measures the in-loop permutation rate of candidate CSS-MC chunk
evaluators at PRODUCTION shape (window_batch=8192, chunk=256, m=21)
with enough loop chunks that the tunnel round trip is amortized
(the round-3 in-loop protocol's 32-chunk run spent ~1 RTT of its
0.31 s wall on the fetch alone).

Variants (all evaluate `chunk` permutations per window per loop step,
accumulating hit counts like the production while-loop):

  base       — the production kernel (_perm_scores, mix/broadcast)
  distinct   — rank draws made pairwise-distinct by keying the low
               5 bits with the individual index: cmp collapses from
               (gt | (eq & tie)) to one gt  (DIFFERENT stream)
  xorb       — distinct + between-term via the xor identity
               u_j(1-u_l)+u_l(1-u_j) = [u_j != u_l]  (halved
               between coefficient work, exact same scores as the
               asymmetric form because D is symmetric)
  mxu        — distinct + coefficient contraction on the MXU:
               scores[k] = vec(coeff_k) . vec(D) as a [K, m*m] @
               [m*m] batched matvec in bf16/f32
  bf16       — base with distf and coeff in bf16, f32 accumulation
  k512/k1024 — base at chunk=512/1024

Rates are perms/s; each variant runs its full loop twice (the first
run pays the persistent-cached compile) and reports the better of two
timed runs.
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np

import divergence_tpu  # applies jax config (x64, platform)
import jax
import jax.numpy as jnp

from divergence_tpu.kernels import perm as kperm


def _make_dist(B, m, seed=0):
    rng = np.random.default_rng(seed)
    d = rng.random((B, m, m))
    d = d + d.transpose(0, 2, 1)
    for i in range(B):
        np.fill_diagonal(d[i], 0.0)
    return jnp.asarray(d, dtype=jnp.float32)


def _distinct_bits(keys, chunk, m):
    """Counter bits with the low 5 bits replaced by the individual
    index: all m draws of one permutation are pairwise distinct, so
    the stable-rank tie-break is unnecessary.  [B, m, K] u32."""
    x = kperm._mix_bits(keys, chunk, m)            # [B, K, m]
    j = jnp.arange(m, dtype=jnp.uint32)
    x = (x & jnp.uint32(0xFFFFFFE0)) | j[None, None, :]
    return jnp.moveaxis(x, -1, -2)                 # [B, m, K]


def _ranks_distinct(keys, chunk, m):
    xt = _distinct_bits(keys, chunk, m)
    cmp = xt[:, :, None, :] > xt[:, None, :, :]    # [B, m, m, K]
    return jnp.sum(cmp.astype(jnp.int32), axis=2)  # [B, m, K]


def _scores_base(distf, keys, a, b, chunk):
    return kperm._perm_scores(distf, keys, a, b, chunk)


def _scores_distinct(distf, keys, a, b, chunk):
    m = distf.shape[-1]
    r = _ranks_distinct(keys, chunk, m)
    return kperm._scores_from_ranks(distf, r, a, b, "broadcast")


def _scores_xorb(distf, keys, a, b, chunk):
    m = distf.shape[-1]
    r = _ranks_distinct(keys, chunk, m)
    wa, wb = kperm._chain_weights(a, b)
    wj = wa * (r < a - 1) + wb * ((r >= a) & (r < m - 1))
    adj = (r[:, None, :, :] == r[:, :, None, :] + 1).astype(jnp.float32)
    u = r < a                                       # bool [B, m, K]
    xor = (u[:, :, None, :] ^ u[:, None, :, :]).astype(jnp.float32)
    coeff = xor * (0.5 / (a * b)) - (a + b) * wj[:, :, None, :] * adj
    return jnp.sum(distf[..., None] * coeff, axis=(1, 2))


def _scores_mxu(distf, keys, a, b, chunk):
    m = distf.shape[-1]
    r = _ranks_distinct(keys, chunk, m)
    wa, wb = kperm._chain_weights(a, b)
    wj = wa * (r < a - 1) + wb * ((r >= a) & (r < m - 1))
    adj = (r[:, None, :, :] == r[:, :, None, :] + 1).astype(jnp.float32)
    u = r < a
    xor = (u[:, :, None, :] ^ u[:, None, :, :]).astype(jnp.float32)
    coeff = xor * (0.5 / (a * b)) - (a + b) * wj[:, :, None, :] * adj
    B = distf.shape[0]
    cf = coeff.reshape(B, m * m, chunk)
    dv = distf.reshape(B, 1, m * m)
    return jnp.matmul(dv, cf)[:, 0, :]             # [B, K]


def _scores_bf16(distf, keys, a, b, chunk):
    m = distf.shape[-1]
    r = kperm._ranks(keys, chunk, m, "mix")
    wa, wb = kperm._chain_weights(a, b)
    wjh = (
        wa * (r < a - 1) + wb * ((r >= a) & (r < m - 1))
    ).astype(jnp.bfloat16)
    adj = (r[:, None, :, :] == r[:, :, None, :] + 1).astype(jnp.bfloat16)
    u = (r < a).astype(jnp.bfloat16)
    coeff = (
        u[:, :, None, :] * (1.0 - u[:, None, :, :])
    ) * jnp.bfloat16(1.0 / (a * b)) - jnp.bfloat16(a + b) * (
        wjh[:, :, None, :] * adj
    )
    prod = (distf.astype(jnp.bfloat16)[..., None] * coeff).astype(
        jnp.float32
    )
    return jnp.sum(prod, axis=(1, 2))


def _scores_ranks_only(distf, keys, a, b, chunk):
    """Diagnostic: rank computation alone (returns pseudo-scores so the
    harness's hit-compare uses it)."""
    m = distf.shape[-1]
    r = _ranks_distinct(keys, chunk, m)
    return jnp.sum(r, axis=1).astype(jnp.float32)  # [B, K]


def _scores_bits_only(distf, keys, a, b, chunk):
    """Diagnostic: counter bit expansion alone."""
    m = distf.shape[-1]
    x = kperm._mix_bits(keys, chunk, m)             # [B, K, m]
    return jnp.sum(x.astype(jnp.float32), axis=2) * 1e-12


def _scores_xorb_sel(distf, keys, a, b, chunk):
    """xorb with select-style masking instead of bool->f32 conversions."""
    m = distf.shape[-1]
    r = _ranks_distinct(keys, chunk, m)
    wa, wb = kperm._chain_weights(a, b)
    wj = wa * (r < a - 1) + wb * ((r >= a) & (r < m - 1))   # [B, m, K]
    dw = distf[..., None] * wj[:, :, None, :]               # [B, m, m, K]
    adj = r[:, None, :, :] == r[:, :, None, :] + 1
    u = r < a
    xor = u[:, :, None, :] ^ u[:, None, :, :]
    cell = jnp.where(xor, distf[..., None] * (0.5 / (a * b)), 0.0) \
        - (a + b) * jnp.where(adj, dw, 0.0)
    return jnp.sum(cell, axis=(1, 2))


def _scores_shared(distf, keys, a, b, chunk):
    """Chunk permutations SHARED across windows (Westfall-Young style):
    the rank-coefficient matrix M[m*m, K] is built once per chunk and
    every window's null scores are one MXU matmul D_flat @ M."""
    m = distf.shape[-1]
    B = distf.shape[0]
    k1 = keys[0]                                    # one stream per chunk
    r = kperm._ranks(k1[None], chunk, m, "mix")[0]  # [m, K]
    wa, wb = kperm._chain_weights(a, b)
    wj = wa * (r < a - 1) + wb * ((r >= a) & (r < m - 1))
    adj = (r[None, :, :] == r[:, None, :] + 1).astype(jnp.float32)
    u = (r < a).astype(jnp.float32)
    coeff = (u[:, None, :] * (1.0 - u[None, :, :])) / (a * b) \
        - (a + b) * wj[:, None, :] * adj            # [m, m, K]
    M = coeff.reshape(m * m, chunk)
    return jnp.matmul(distf.reshape(B, m * m), M)   # [B, K] on the MXU


VARIANTS = {
    "shared": (_scores_shared, 256),
    "shared1024": (_scores_shared, 1024),
    "base": (_scores_base, 256),
    "distinct": (_scores_distinct, 256),
    "xorb": (_scores_xorb, 256),
    "xorb512": (_scores_xorb, 512),
    "xorb_sel": (_scores_xorb_sel, 256),
    "mxu": (_scores_mxu, 256),
    "bf16": (_scores_bf16, 256),
    "k512": (_scores_base, 512),
    "k1024": (_scores_base, 1024),
    "ranks_only": (_scores_ranks_only, 256),
    "bits_only": (_scores_bits_only, 256),
}


def run(names, B=8192, n_chunks=256, a=11, b=10):
    m = a + b
    distf = _make_dist(B, m)
    keys = kperm.window_keys(
        jax.random.PRNGKey(1),
        jnp.zeros(B, dtype=jnp.int64),
        jnp.arange(B, dtype=jnp.int64),
    )
    scores_obs = jnp.full(B, 1e30, dtype=jnp.float32)
    out = {"backend": jax.default_backend(), "B": B, "m": m}
    for name in names:
        fn, chunk = VARIANTS[name]
        nloop = max(1, n_chunks * 256 // chunk)

        @jax.jit
        def go(distf, keys, scores_obs, fn=fn, chunk=chunk, nloop=nloop):
            def body(k, acc):
                s = fn(distf, kperm._fold_chunk(keys, k), a, b, chunk)
                return acc + jnp.sum(
                    s >= scores_obs[:, None], dtype=jnp.int32
                )

            return jax.lax.fori_loop(0, nloop, body, jnp.int32(0))

        try:
            jax.device_get(go(distf, keys, scores_obs))   # compile+warm
            best = None
            for _ in range(2):
                t0 = time.perf_counter()
                chk = int(jax.device_get(go(distf, keys, scores_obs)))
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            perms = B * chunk * nloop
            out[name] = {
                "chunk": chunk,
                "loop_chunks": nloop,
                "wall_s": round(best, 4),
                "perms_per_s": round(perms / best),
                "checksum": chk,
            }
        except Exception as e:  # noqa: BLE001 - report and continue
            out[name] = {"error": f"{type(e).__name__}: {e}"[:300]}
        print(json.dumps({name: out[name]}), flush=True)
    return out


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--variants", default="base,distinct,xorb,mxu,bf16")
    ap.add_argument("--window-batch", type=int, default=8192)
    ap.add_argument("--n-chunks", type=int, default=256)
    args = ap.parse_args()
    res = run(
        [v for v in args.variants.split(",") if v],
        B=args.window_batch,
        n_chunks=args.n_chunks,
    )
    print(json.dumps(res, indent=2))
