"""Partial Cholesky and preconditioner properties.

Mirrors reference tests/test_low_rank/test_low_rank.py: full-rank
reconstruction to eps, pivoted beating non-pivoted at equal rank, the
Woodbury preconditioner solving shifted systems, non-differentiability
guards, and rank validation.
"""

import jax
import jax.numpy as jnp
import pytest

from lanczos_adjoints_tpu import precond
from lanczos_adjoints_tpu.utils import test_util


def _spd_matrix(n, *, decay=2.0):
    eigvals = jnp.exp(-decay * jnp.arange(n, dtype=jnp.float32))
    return test_util.symmetric_matrix_from_eigenvalues(eigvals + 1e-3)


def test_full_rank_reconstructs():
    n = 8
    A = _spd_matrix(n, decay=0.3)
    cholesky = precond.cholesky_partial(rank=n)
    L, _info = cholesky(lambda i, j: A[i, j], n)
    assert jnp.allclose(L @ L.T, A, atol=1e-5, rtol=1e-5)


def test_full_rank_pivoted_reconstructs():
    n = 8
    A = _spd_matrix(n, decay=0.3)
    cholesky = precond.cholesky_partial_pivot(rank=n)
    L, info = cholesky(lambda i, j: A[i, j], n)
    assert bool(info["success"])
    assert jnp.allclose(L @ L.T, A, atol=1e-4, rtol=1e-4)


def test_pivoted_beats_nonpivoted_at_equal_rank():
    n, rank = 20, 4
    A = _spd_matrix(n, decay=1.0)

    L_plain, _ = precond.cholesky_partial(rank=rank)(lambda i, j: A[i, j], n)
    L_pivot, _ = precond.cholesky_partial_pivot(rank=rank)(lambda i, j: A[i, j], n)

    err_plain = jnp.linalg.norm(A - L_plain @ L_plain.T)
    err_pivot = jnp.linalg.norm(A - L_pivot @ L_pivot.T)
    assert err_pivot <= err_plain * 1.001, (err_pivot, err_plain)


def test_preconditioner_solves_shifted_system():
    n, rank = 20, 20
    key = jax.random.PRNGKey(0)
    W = jax.random.normal(key, (n, n))
    A = W @ W.T / n
    sigma = 0.1

    cholesky = precond.cholesky_partial_pivot(rank=rank)
    solve, _info = precond.preconditioner(cholesky)(lambda i, j: A[i, j], n)

    b = jnp.arange(1.0, n + 1.0)
    x = solve(b, sigma)
    x_true = jnp.linalg.solve(A + sigma * jnp.eye(n), b)
    assert jnp.allclose(x, x_true, atol=1e-2, rtol=1e-2)


def test_differentiation_guard_raises():
    n = 6
    A = _spd_matrix(n)
    cholesky = precond.cholesky_partial(rank=3)

    def loss(A):
        L, _ = cholesky(lambda i, j: A[i, j], n)
        return jnp.sum(L**2)

    with pytest.raises(RuntimeError, match="differentiated"):
        jax.grad(loss)(A)


def test_rank_validation():
    cholesky = precond.cholesky_partial(rank=10)
    with pytest.raises(ValueError, match="Rank exceeds"):
        cholesky(lambda i, j: 1.0, 5)
    with pytest.raises(ValueError, match="positive"):
        precond.cholesky_partial(rank=0)(lambda i, j: 1.0, 5)


def test_blocked_full_rank_reconstructs():
    n = 16
    A = _spd_matrix(n, decay=0.3)
    cholesky = precond.cholesky_partial_pivot_blocked(rank=n, block=4)
    L, info = cholesky(lambda i, j: A[i, j], n)
    assert bool(info["success"])
    assert jnp.allclose(L @ L.T, A, atol=1e-4, rtol=1e-4)


def test_blocked_matches_sequential_quality():
    """Block-greedy pivoting approximates as well as per-column greedy."""
    n, rank = 48, 16
    A = _spd_matrix(n, decay=0.25)
    L_seq, _ = precond.cholesky_partial_pivot(rank=rank)(lambda i, j: A[i, j], n)
    L_blk, info = precond.cholesky_partial_pivot_blocked(rank=rank, block=8)(
        lambda i, j: A[i, j], n
    )
    assert bool(info["success"])
    err_seq = jnp.linalg.norm(A - L_seq @ L_seq.T)
    err_blk = jnp.linalg.norm(A - L_blk @ L_blk.T)
    assert err_blk <= 3.0 * err_seq + 1e-6, (float(err_blk), float(err_seq))


def test_blocked_preconditioner_solves():
    n, rank = 32, 32
    A = _spd_matrix(n, decay=0.3)
    precondition = precond.preconditioner(
        precond.cholesky_partial_pivot_blocked(rank=rank, block=8)
    )
    solve, info = precondition(lambda i, j: A[i, j], n)
    b = jnp.arange(1.0, n + 1.0)
    sigma = 0.1
    x = solve(b, sigma)
    assert jnp.allclose((A + sigma * jnp.eye(n)) @ x, b, atol=1e-2, rtol=1e-2)


def test_blocked_forbids_gradients():
    n = 8
    A = _spd_matrix(n)
    cholesky = precond.cholesky_partial_pivot_blocked(rank=4, block=4)

    def loss(a):
        L, _ = cholesky(lambda i, j: a[i, j], n)
        return jnp.sum(L**2)

    with pytest.raises(RuntimeError, match="must not be differentiated"):
        jax.grad(loss)(A)


def test_blocked_rejects_bad_block():
    with pytest.raises(ValueError, match="multiple"):
        precond.cholesky_partial_pivot_blocked(rank=10, block=4)


def test_blocked_handles_duplicate_rows():
    """Duplicate data points make the Schur block singular (UCI protein
    has exact duplicates); the pseudo-inverse update must stay finite."""
    n, rank = 32, 16
    A = _spd_matrix(n, decay=0.3)
    # Make rows/cols 3 and 7 identical (rank-deficient kernel matrix).
    A = A.at[7, :].set(A[3, :]).at[:, 7].set(A[:, 3])
    A = A.at[7, 7].set(A[3, 3])
    cholesky = precond.cholesky_partial_pivot_blocked(rank=rank, block=8)
    L, _info = cholesky(lambda i, j: A[i, j], n)
    assert bool(jnp.isfinite(L).all())
    err = jnp.linalg.norm(A - L @ L.T) / jnp.linalg.norm(A)
    assert err < 0.2, float(err)


def test_pivoted_exhaustion_truncates_instead_of_nan():
    """Numerically rank-deficient kernel: finite L, success=False.

    The reference (low_rank.py:200-204) takes sqrt of a non-positive
    pivot once the residual is exhausted and lets NaN poison L --
    observed in GP training when the learned noise gets small.  This
    framework truncates: remaining columns zero, Woodbury still solves.
    """
    n, true_rank, rank = 40, 5, 12
    key = jax.random.PRNGKey(0)
    U = jax.random.normal(key, (n, true_rank), jnp.float32)
    A = U @ U.T  # exactly rank-5, so pivots 6.. are rounding noise

    cholesky = precond.cholesky_partial_pivot(rank=rank)
    L, info = cholesky(lambda i, j: A[i, j], n)
    assert jnp.all(jnp.isfinite(L))
    assert not bool(info["success"])
    # The factorisation still reconstructs A at its effective rank.
    assert jnp.allclose(L @ L.T, A, atol=1e-3, rtol=1e-3)

    # And the Woodbury preconditioner built from the exhausted
    # factorisation solves (A + sigma I) x = b exactly: the truncated
    # L L^T equals A, so the zero columns must stay inert.
    precondition = precond.preconditioner(precond.cholesky_partial_pivot(rank=rank))
    solve, _info = precondition(lambda i, j: A[i, j], n)
    b = jnp.ones((n,))
    out = solve(b, 0.1)
    assert jnp.all(jnp.isfinite(out))
    x_true = jnp.linalg.solve(A + 0.1 * jnp.eye(n), b)
    assert jnp.allclose(out, x_true, atol=1e-2, rtol=1e-2)
