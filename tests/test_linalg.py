"""Batched Jacobi eigensolver unit tests.

The Jacobi path is the production CMDS eigensolver for float64 on the
TPU backend, where XLA's emulated-f64 ``eigh`` runs at ~f32 accuracy and
intermittently returns NaN eigenpairs (found round 3 via the e2e verify
drive: one window of a toy panel NaN-poisoned the exact-precision CSS
track on the chip).  These tests pin the solver's accuracy and its
NaN-robustness after convergence — the failure mode was the rotation
tangent's τ form dividing by a subnormal off-diagonal once converged
(inf intermediates; IEEE absorbs them, the TPU's double-float emulation
turns them into NaN).
"""

import numpy as np
import jax.numpy as jnp

from divergence_tpu.kernels.linalg import jacobi_eigh, top2_eig


def _sym(rng, b, m):
    s = rng.standard_normal((b, m, m))
    return s + np.swapaxes(s, -1, -2)


def test_jacobi_matches_numpy_eigh(rng):
    for m in (2, 4, 11, 12, 21, 22):
        s = _sym(rng, 5, m)
        w, v = jacobi_eigh(jnp.asarray(s))
        w = np.asarray(w)
        v = np.asarray(v)
        assert np.isfinite(w).all() and np.isfinite(v).all()
        np.testing.assert_allclose(
            np.sort(w, axis=-1), np.linalg.eigh(s)[0], rtol=1e-10,
            atol=1e-10,
        )
        # eigenpair residual: A v = w v
        res = s @ v - w[..., None, :] * v
        assert np.abs(res).max() < 1e-9


def test_jacobi_post_convergence_stays_finite(rng):
    """Extra sweeps after convergence must not corrupt the result: once
    off-diagonals are subnormal, the old τ = d/apq form overflowed (the
    TPU-f64-emulation NaN source).  30 sweeps on 4x4 problems leaves
    ~27 post-convergence sweeps."""
    s = _sym(rng, 3, 4)
    w, _ = jacobi_eigh(jnp.asarray(s), sweeps=30)
    w = np.asarray(w)
    assert np.isfinite(w).all()
    np.testing.assert_allclose(
        np.sort(w, axis=-1), np.linalg.eigh(s)[0], rtol=1e-10, atol=1e-12
    )


def test_jacobi_degenerate_and_diagonal_inputs():
    # already diagonal (every apq == 0), equal diagonal (d == 0), and a
    # d == 0 with apq != 0 pivot (τ = 0 → t = 1 special case)
    mats = np.stack(
        [
            np.diag([3.0, -1.0, 2.0, 0.5]),
            np.full((4, 4), 1.0),
            np.array(
                [
                    [2.0, 5.0, 0.0, 0.0],
                    [5.0, 2.0, 0.0, 0.0],
                    [0.0, 0.0, 1.0, 0.0],
                    [0.0, 0.0, 0.0, 4.0],
                ]
            ),
        ]
    )
    w, v = jacobi_eigh(jnp.asarray(mats))
    w = np.asarray(w)
    assert np.isfinite(w).all()
    for k in range(len(mats)):
        np.testing.assert_allclose(
            np.sort(w[k]), np.linalg.eigh(mats[k])[0], atol=1e-12
        )
    # zero matrix: all rotations skipped, eigenvectors stay orthonormal
    z = jnp.zeros((1, 6, 6), dtype=jnp.float64)
    wz, vz = jacobi_eigh(z)
    assert np.array_equal(np.asarray(wz), np.zeros((1, 6)))
    np.testing.assert_allclose(
        np.asarray(vz)[0] @ np.asarray(vz)[0].T, np.eye(6), atol=1e-14
    )


def test_top2_eig_matches_numpy(rng):
    s = _sym(rng, 7, 21)
    vals, vecs = top2_eig(jnp.asarray(s))
    wn, vn = np.linalg.eigh(s)
    np.testing.assert_allclose(
        np.asarray(vals), wn[..., ::-1][..., :2], rtol=1e-10, atol=1e-12
    )
    # compare eigenvectors up to sign
    got = np.abs(np.asarray(vecs))
    want = np.abs(vn[..., ::-1][..., :2])
    np.testing.assert_allclose(got, want, rtol=1e-7, atol=1e-8)


def test_jacobi_lanes_matches_einsum_jacobi(rng):
    """The lane-major solver (the TPU production path since round 4 —
    batch on the minor axis, partner-permutation updates) must agree
    with the matmul-form jacobi_eigh to rounding: same schedule, same
    angle math, different layout/association only."""
    from divergence_tpu.kernels.linalg import jacobi_eigh_lanes

    for m in (2, 3, 5, 21, 22):
        s = _sym(rng, 9, m)
        w1, v1 = jacobi_eigh(jnp.asarray(s))
        w2, v2 = jacobi_eigh_lanes(jnp.asarray(s))
        np.testing.assert_allclose(
            np.asarray(w2), np.asarray(w1), rtol=1e-12, atol=1e-12
        )
        np.testing.assert_allclose(
            np.asarray(v2), np.asarray(v1), rtol=1e-10, atol=1e-11
        )


def test_jacobi_lanes_tie_and_degenerate(rng):
    """The d == 0 tie branch keeps the pair antisymmetric via the static
    role sign (own-perspective t would otherwise agree on BOTH sides);
    degenerate/diagonal/zero inputs stay finite and orthonormal."""
    from divergence_tpu.kernels.linalg import jacobi_eigh_lanes

    m = 6
    mats = [np.eye(m), np.zeros((m, m)), np.full((m, m), 3.0)]
    tied = np.eye(m)
    tied[0, m - 1] = tied[m - 1, 0] = 1.0   # equal diagonals, d == 0
    mats.append(tied)
    mats = np.asarray(mats)
    w, v = jacobi_eigh_lanes(jnp.asarray(mats))
    w, v = np.asarray(w), np.asarray(v)
    assert np.isfinite(w).all() and np.isfinite(v).all()
    for k in range(len(mats)):
        np.testing.assert_allclose(
            np.sort(w[k]), np.linalg.eigh(mats[k])[0], atol=1e-12
        )
        np.testing.assert_allclose(v[k].T @ v[k], np.eye(m), atol=1e-12)


def test_jacobi_lanes_f32_seven_sweeps(rng):
    """7 sweeps reach f32 roundoff for m=21 (the fast-mode TPU budget)."""
    from divergence_tpu.kernels.linalg import jacobi_eigh_lanes

    s = _sym(rng, 16, 21).astype(np.float32)
    w, v = jacobi_eigh_lanes(jnp.asarray(s), sweeps=7)
    wref = np.linalg.eigvalsh(s.astype(np.float64))
    err = np.abs(np.sort(np.asarray(w), -1) - wref)
    assert err.max() / np.abs(wref).max() < 1e-5, err.max()


def test_jacobi_chunked_matches_unchunked():
    """The chunked form (TPU worker-crash workaround, round 5) must
    reproduce the plain call: pad/reshape bookkeeping, inert zero-padded
    tail, and slice-back, across non-divisible batch sizes and a chunk
    larger than the batch.  Agreement is to solver roundoff, not
    bitwise — XLA vectorizes the lane-major updates differently per
    batch extent (each engine call uses ONE deterministic chunking per
    shape, so determinism is unaffected)."""
    import numpy as np

    from divergence_tpu.kernels.linalg import (
        jacobi_eigh_lanes,
        jacobi_eigh_lanes_chunked,
    )

    rng = np.random.default_rng(11)
    for B, m, chunk in ((13, 10, 4), (16, 21, 8), (5, 6, 8)):
        X = rng.normal(size=(B, m, m))
        A = 0.5 * (X + np.swapaxes(X, 1, 2))
        w0, v0 = jacobi_eigh_lanes(jnp.asarray(A), sweeps=10)
        w1, v1 = jacobi_eigh_lanes_chunked(
            jnp.asarray(A), sweeps=10, chunk=chunk
        )
        assert w1.shape == w0.shape and v1.shape == v0.shape
        np.testing.assert_allclose(
            np.sort(np.asarray(w0), axis=-1),
            np.sort(np.asarray(w1), axis=-1),
            rtol=1e-12, atol=1e-12,
        )
        # the chunked eigenpairs reconstruct A to solver accuracy
        w1n, v1n = np.asarray(w1), np.asarray(v1)
        recon = np.einsum("bik,bk,bjk->bij", v1n, w1n, v1n)
        np.testing.assert_allclose(recon, A, rtol=1e-9, atol=1e-9)
