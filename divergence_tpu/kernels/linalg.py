"""Batched small-matrix linear algebra for TPU.

The CSS pipeline needs eigendecompositions of thousands of tiny (m ~ 21)
symmetric matrices per step (reference statistics/css/css.c:529-541 calls GSL's symmv per
window, serially).  XLA's ``eigh`` targets single large matrices; a batched
cyclic Jacobi with a parallel round-robin ordering vectorizes over the
batch axis instead: every round applies mp/2 disjoint rotations to the
whole batch as two batched matmuls.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _round_robin_schedule(n: int) -> np.ndarray:
    """All-pairs round-robin: (n-1) rounds of n/2 disjoint pairs (the
    circle method — player 0 fixed, the rest rotate).  Disjoint pairs
    within a round commute, so one round is a single orthogonal matrix."""
    assert n % 2 == 0
    players = list(range(n))
    rounds = []
    for _ in range(n - 1):
        rounds.append([(players[i], players[n - 1 - i]) for i in range(n // 2)])
        players = [players[0]] + [players[-1]] + players[1:-1]
    return np.asarray(rounds, dtype=np.int32)  # [n-1, n/2, 2]


@functools.partial(jax.jit, static_argnames=("sweeps",))
def jacobi_eigh(
    a: jnp.ndarray, sweeps: int = 10
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Eigendecomposition of a batch of symmetric matrices.

    ``a``: [..., m, m] symmetric.  Returns (eigenvalues [..., m], unsorted;
    eigenvectors [..., m, m], columns).  ``sweeps`` full round-robin sweeps
    give quadratic convergence; 10 reaches f64 roundoff for m <= 64."""
    m = a.shape[-1]
    mp = m + (m % 2)
    if mp != m:
        pad = [(0, 0)] * (a.ndim - 2) + [(0, 1), (0, 1)]
        # decoupled padding eigenpair; zero coupling keeps it inert
        a = jnp.pad(a, pad)

    schedule = jnp.asarray(_round_robin_schedule(mp))  # [R, mp/2, 2]
    eye = jnp.eye(mp, dtype=a.dtype)
    # zeros_like (not broadcast_to) so v0 inherits a's varying manual axes
    # under shard_map — a replicated carry fails the scan vma check
    v0 = jnp.zeros_like(a) + eye

    def one_round(carry, pairs):
        A, V = carry
        p, q = pairs[:, 0], pairs[:, 1]          # [mp/2]
        app = A[..., p, p]
        aqq = A[..., q, q]
        apq = A[..., p, q]
        # inner rotation (|theta| <= pi/4), Golub & Van Loan 8.4: required
        # for cyclic-Jacobi convergence — the atan2 branch admits swap
        # rotations that cycle forever.  The tangent is computed in the
        # overflow-free form t = sign(d)·apq / (|d| + hypot(d, apq)) with
        # d = (aqq−app)/2 (equal to sign(τ)/(|τ|+√(1+τ²)), τ = d/apq) —
        # the τ form divides by apq, which overflows to inf once the
        # off-diagonal goes subnormal after convergence; IEEE inf
        # arithmetic absorbs that on CPU, but TPU's double-float f64
        # emulation turns inf−inf intermediates into NaN.
        safe = jnp.abs(apq) > 0.0
        d = 0.5 * (aqq - app)
        hyp = jnp.sqrt(d * d + apq * apq)
        t = jnp.sign(d) * apq / jnp.where(safe, jnp.abs(d) + hyp, 1.0)
        # d == 0: τ = 0 → t = ±1 both zero the pivot; keep t = 1 like the
        # τ-form special case (sign(0) zeroes the formula above)
        t = jnp.where(d == 0.0, jnp.where(safe, 1.0, 0.0), t)
        c = 1.0 / jnp.sqrt(1.0 + t * t)
        s = t * c
        c = jnp.where(safe, c, 1.0)
        s = jnp.where(safe, s, 0.0)

        # One orthogonal matrix per round: every index is in exactly one
        # pair, so the rotation blocks tile the whole matrix.
        R = jnp.zeros(A.shape, a.dtype)
        R = R.at[..., p, p].set(c)
        R = R.at[..., q, q].set(c)
        R = R.at[..., p, q].set(s)
        R = R.at[..., q, p].set(-s)

        A = jnp.einsum("...ji,...jk,...kl->...il", R, A, R)
        V = V @ R
        # re-symmetrize to kill drift
        A = 0.5 * (A + jnp.swapaxes(A, -1, -2))
        return (A, V), None

    def one_sweep(carry, _):
        carry, _ = jax.lax.scan(one_round, carry, schedule)
        return carry, None

    (A, V), _ = jax.lax.scan(one_sweep, (a, v0), None, length=sweeps)
    w = jnp.diagonal(A, axis1=-2, axis2=-1)
    if mp != m:
        w = w[..., :m]
        V = V[..., :m, :m]
    return w, V


def top2_eig(a: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Top-2 eigenpairs (descending) of a batch of symmetric matrices.

    Returns (vals [..., 2], vecs [..., m, 2]).  Matches the reference's
    'keep the dims largest eigenvalues' (reference statistics/css/css.c:543-553).

    Uses XLA's batched ``eigh`` — measured ~70x faster than the scatter-
    based round-robin Jacobi in :func:`jacobi_eigh` for thousands of
    m~21 problems on TPU — EXCEPT for float64 on the TPU backend, where
    XLA's eigh runs its iteration at ~f32 accuracy (~2e-6 eigenvalue
    error measured) and intermittently returns NaN eigenpairs for
    well-conditioned inputs (emulated-f64 inf/NaN semantics inside the
    solver).  There the batched Jacobi — pure arithmetic, NaN-free by
    construction — provides the full emulated-f64 accuracy that
    ``precision="exact"`` promises."""
    if a.dtype == jnp.float64 and jax.default_backend() == "tpu":
        w, v = jacobi_eigh(a)          # unsorted
        order = jnp.argsort(-w, axis=-1)[..., :2]
        top_vals = jnp.take_along_axis(w, order, axis=-1)
        vecs = jnp.take_along_axis(v, order[..., None, :], axis=-1)
        return top_vals, vecs
    w, v = jnp.linalg.eigh(a)          # ascending
    top_vals = w[..., ::-1][..., :2]
    vecs = v[..., ::-1][..., :2]
    return top_vals, vecs
