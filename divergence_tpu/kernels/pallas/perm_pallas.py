"""Pallas TPU kernel: fused permutation generation + CSS scoring.

The XLA path (kernels/perm.py:_perm_scores) materializes the permutation
one-hot Pi and the product A = Pi @ D in HBM (~4 passes over
[B, K, m, m] buffers per chunk, bandwidth-bound).  This kernel fuses the
whole permutation pipeline into VMEM for one window's grid cell — HBM
traffic is just D in (m^2 floats) and scores out (K floats):

* permutation generation: per-lane uint32 keys from the on-core PRNG
  (pltpu.prng_seed / prng_random_bits), sorted along the sublane axis by
  an odd-even transposition network (m_pad rounds of roll + select) with
  the identity carried alongside — lanes are independent permutations;
* scoring: for each permutation position i (static unroll), the one-hot
  of p_i is a sublane-iota comparison and D[p_i, :] is one MXU dot
  D @ oh_i; the between-term accumulates sum_{i<asize} D[p_i, :] and the
  group indicator; the adjacent-chain term pairs each Di with oh_{i+1}
  (reference statistics/css/css.c:608-647 semantics, identical math to kernels/perm._perm_scores).

Scores match the XLA path exactly for the same permutation (validated
against the oracle via the deterministic-keys variant); the RNG stream
differs (on-core PRNG vs threefry) — both are deterministic given their
seed, and the MC estimator is distribution-equivalent.
"""

from __future__ import annotations

import functools
import sys

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import numpy as np

LANE = 128          # perms per lane tile

# the unrolled sort network + scoring chain exceeds CPython's default
# recursion limit during Mosaic lowering
if sys.getrecursionlimit() < 20_000:
    sys.setrecursionlimit(20_000)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _chain_weights_np(asize: int, bsize: int) -> np.ndarray:
    """Host-side adjacent-chain weights — single source of truth is
    kernels.css.chain_weights_host (reference statistics/css/css.c:627-642)."""
    from divergence_tpu.kernels.css import chain_weights_host

    return chain_weights_host(asize, bsize)


def _score_tile(keys, d, sub, *, m, m_pad, asize, bsize, w_np):
    """Score one [m_pad, LANE] tile of key columns: returns [1, LANE]."""
    # sentinel: positions >= m sort to the top and never enter scoring
    keys = jnp.where(sub < jnp.int32(m), keys, jnp.uint32(0xFFFFFFFF))
    idx = sub

    # odd-even transposition sort (ascending in keys) along sublanes;
    # m_pad rounds guarantee a fully sorted column per lane.  All index
    # arithmetic stays int32 (x64-promoted scalars and jnp.remainder trip
    # Mosaic's dtype-conversion lowering): parity via bitwise AND, bounds
    # via explicit int32 scalars.
    parity = sub & jnp.int32(1)
    can_left = sub < jnp.int32(m_pad - 1)
    can_right = sub > jnp.int32(0)
    # int32 shifts: a python-int shift canonicalizes to int64 under x64
    # and tpu.dynamic_rotate only takes 32-bit operands
    up = jnp.int32(m_pad - 1)
    one = jnp.int32(1)
    for r in range(m_pad):
        p32 = jnp.int32(r % 2)
        is_left = (parity == p32) & can_left
        is_right = (parity != p32) & can_right
        up_k = pltpu.roll(keys, up, 0)          # up[s] = keys[s+1]
        dn_k = pltpu.roll(keys, one, 0)         # dn[s] = keys[s-1]
        up_i = pltpu.roll(idx, up, 0)
        dn_i = pltpu.roll(idx, one, 0)
        swap_left = is_left & (keys > up_k)
        swap_right = is_right & (dn_k > keys)
        keys = jnp.where(swap_left, up_k, jnp.where(swap_right, dn_k, keys))
        idx = jnp.where(swap_left, up_i, jnp.where(swap_right, dn_i, idx))

    zero = jnp.zeros((m_pad, LANE), dtype=jnp.float32)
    sa = zero                                      # sum_{i<asize} D[p_i, :]
    ua = zero                                      # group-A indicator
    dprev = zero
    chain = jnp.zeros((1, LANE), dtype=jnp.float32)

    for i in range(m):
        row_i = jax.lax.slice(idx, (i, 0), (i + 1, LANE))  # static slice
        oh = (sub == row_i).astype(jnp.float32)    # [m_pad, LANE]
        di = pl.dot(d, oh)                         # D @ oh = D[p_i, :] cols
        if i > 0 and float(w_np[i - 1]) != 0.0:
            chain = chain + float(w_np[i - 1]) * jnp.sum(
                dprev * oh, axis=0, keepdims=True
            )
        if i < asize:
            sa = sa + di
            ua = ua + oh
        dprev = di

    between = jnp.sum(sa * (1.0 - ua), axis=0, keepdims=True) / (
        asize * bsize
    )
    return between - (asize + bsize) * chain       # [1, LANE]


def _kernel(seed_ref, d_ref, out_ref, *, B, m, m_pad, nkt,
            asize, bsize, w_np, keys_ref=None):
    """Grid-free kernel: one program loops over all B windows (the
    environment's AOT Mosaic compiler rejects any gridded pallas_call;
    the whole working set fits VMEM for the sizes this path accepts)."""
    sub = jax.lax.broadcasted_iota(jnp.int32, (m_pad, LANE), 0)
    pltpu.prng_seed(seed_ref[0])

    def one_window(b, _):
        d = d_ref[b]                               # [m_pad, m_pad] f32
        for kt in range(nkt):
            if keys_ref is None:
                keys = pltpu.bitcast(
                    pltpu.prng_random_bits((m_pad, LANE)), jnp.uint32
                )
            else:
                keys = keys_ref[b, kt]
            tile = _score_tile(
                keys, d, sub, m=m, m_pad=m_pad, asize=asize, bsize=bsize,
                w_np=w_np,
            )                                      # [1, LANE]
            out_ref[b, kt, :] = tile[0]
        return jnp.int32(0)

    jax.lax.fori_loop(
        jnp.int32(0), jnp.int32(B), one_window, jnp.int32(0)
    )


@functools.partial(
    jax.jit,
    static_argnames=("asize", "bsize", "chunk", "interpret"),
)
def perm_scores_pallas(
    distf: jnp.ndarray,     # [B, m, m] f32
    seed: jnp.ndarray,      # scalar int32
    asize: int,
    bsize: int,
    chunk: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """CSS of ``chunk`` random permutations per window: [B, chunk] f32."""
    B, m = distf.shape[0], distf.shape[-1]
    if chunk % LANE != 0:
        raise ValueError(f"chunk must be a multiple of {LANE}")
    nkt = chunk // LANE
    m_pad = max(_round_up(m, 8), 8)
    d_pad = jnp.zeros((B, m_pad, m_pad), dtype=jnp.float32)
    d_pad = d_pad.at[:, :m, :m].set(distf.astype(jnp.float32))
    w_np = _chain_weights_np(asize, bsize)

    kernel = functools.partial(
        _kernel, B=B, m=m, m_pad=m_pad, nkt=nkt, asize=asize, bsize=bsize,
        w_np=w_np,
    )
    out = pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, nkt, LANE), jnp.float32),
        # TPU interpret params (not the generic interpreter): pltpu
        # primitives (prng_seed, roll, ...) only interpret via Mosaic
        interpret=pltpu.InterpretParams() if interpret else False,
    )(jnp.asarray([seed], dtype=jnp.int32).reshape(1), d_pad)
    return out.reshape(B, chunk)


@functools.partial(
    jax.jit,
    static_argnames=("asize", "bsize", "interpret"),
)
def perm_scores_pallas_with_keys(
    distf: jnp.ndarray,     # [B, m, m] f32
    keys: jnp.ndarray,      # [B, nkt, m_pad, LANE] uint32 sort keys
    asize: int,
    bsize: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """Deterministic-keys variant (testing): the permutation of lane l of
    tile kt is the argsort of ``keys[b, kt, :m, l]``.  Lets CPU tests
    validate the sort network + scoring exactly against a reference
    implementation (the on-core PRNG has no interpret-mode support)."""
    B, m = distf.shape[0], distf.shape[-1]
    nkt, m_pad = keys.shape[1], keys.shape[2]
    chunk = nkt * LANE
    d_pad = jnp.zeros((B, m_pad, m_pad), dtype=jnp.float32)
    d_pad = d_pad.at[:, :m, :m].set(distf.astype(jnp.float32))
    w_np = _chain_weights_np(asize, bsize)

    def kernel(seed_ref, d_ref, keys_ref, out_ref):
        _kernel(
            seed_ref, d_ref, out_ref,
            B=B, m=m, m_pad=m_pad, nkt=nkt, asize=asize, bsize=bsize,
            w_np=w_np, keys_ref=keys_ref,
        )

    return pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, nkt, LANE), jnp.float32),
        interpret=pltpu.InterpretParams() if interpret else False,
    )(jnp.zeros(1, dtype=jnp.int32), d_pad, keys).reshape(B, chunk)
