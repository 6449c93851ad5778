"""CG solver properties.

Mirrors reference tests/test_cg/test_cg.py: full-step equality with a
dense solve, monotone error decrease with matvec count, adaptive
convergence, and reorthogonalised CG beating plain CG on ill-conditioned
spectra (the reference left PCG+reortho as known-incomplete; here the
assertions are real).
"""

import jax
import jax.numpy as jnp
import pytest

from lanczos_adjoints_tpu import precond, solvers
from lanczos_adjoints_tpu.utils import test_util


def _problem(n, *, spread=1.0):
    eigvals = 1.0 + spread * jnp.arange(n) / n
    A = test_util.symmetric_matrix_from_eigenvalues(eigvals)
    b = jnp.arange(1.0, n + 1.0)
    b = b / jnp.linalg.norm(b)
    return A, b


def test_cg_fixed_full_steps_equals_dense_solve():
    n = 10
    A, b = _problem(n)
    solve = solvers.cg_fixed_step(n)
    x, _info = solve(lambda v: A @ v, b)
    assert jnp.allclose(x, jnp.linalg.solve(A, b), atol=1e-4, rtol=1e-4)


def test_cg_error_decreases_with_matvecs():
    n = 16
    A, b = _problem(n, spread=10.0)
    x_true = jnp.linalg.solve(A, b)
    errors = []
    for num in [2, 6, 12, 16]:
        x, _ = solvers.cg_fixed_step(num)(lambda v: A @ v, b)
        errors.append(float(jnp.linalg.norm(x - x_true)))
    assert errors == sorted(errors, reverse=True), errors


def test_cg_adaptive_converges_and_reports_steps():
    n = 12
    A, b = _problem(n)
    solve = solvers.cg_adaptive(atol=1e-6, rtol=1e-6, maxiter=100, miniter=1)
    x, info = solve(lambda v: A @ v, b)
    assert jnp.allclose(x, jnp.linalg.solve(A, b), atol=1e-4)
    assert 0 < float(info["num_steps"]) <= 100


def test_cg_gradients_via_custom_linear_solve():
    """d/dA of solve(A, b) differentiates by solving the transposed system."""
    n = 8
    A, b = _problem(n)

    def loss(A):
        x, _ = solvers.cg_fixed_step(n)(lambda v: A @ v, b)
        return jnp.sum(x**2)

    g = jax.grad(loss)(A)
    x = jnp.linalg.solve(A, b)
    lam = jnp.linalg.solve(A, 2 * x)  # adjoint solve
    g_ref = -jnp.outer(lam, x)
    # Symmetrised comparison (custom_linear_solve(symmetric=True)).
    assert jnp.allclose((g + g.T) / 2, (g_ref + g_ref.T) / 2, atol=1e-3, rtol=1e-3)


def test_reortho_beats_plain_on_ill_conditioned():
    n = 40
    eigvals = jnp.concatenate([jnp.ones((n - 4,)), jnp.asarray([1e3, 1e4, 1e5, 1e6])])
    A = test_util.symmetric_matrix_from_eigenvalues(eigvals)
    b = jnp.arange(1.0, n + 1.0)
    b = b / jnp.linalg.norm(b)
    x_true = jnp.linalg.solve(A, b)

    num = 30
    x_plain, _ = solvers.cg_fixed_step(num)(lambda v: A @ v, b)
    x_reortho, _ = solvers.cg_fixed_step_reortho(num)(lambda v: A @ v, b)

    err_plain = jnp.linalg.norm(x_plain - x_true)
    err_reortho = jnp.linalg.norm(x_reortho - x_true)
    assert err_reortho <= err_plain * 1.001, (err_reortho, err_plain)


def test_pcg_with_partial_cholesky_preconditioner():
    """PCG + pivoted-Cholesky preconditioner converges faster than CG."""
    n, rank = 40, 12
    key = jax.random.PRNGKey(0)
    L = jax.random.normal(key, (n, rank)) * jnp.linspace(10.0, 0.3, rank)
    sigma = 0.01
    A = L @ L.T + sigma * jnp.eye(n)
    b = jnp.arange(1.0, n + 1.0)
    b = b / jnp.linalg.norm(b)
    x_true = jnp.linalg.solve(A, b)

    def element(i, j):
        return L[i] @ L[j]

    cholesky = precond.cholesky_partial_pivot(rank=rank)
    pre, _info = precond.preconditioner(cholesky)(element, n)

    num = 4
    x_pcg, _ = solvers.pcg_fixed_step(num)(
        lambda v: A @ v, b, lambda v: pre(v, sigma)
    )
    x_cg, _ = solvers.cg_fixed_step(num)(lambda v: A @ v, b)
    err_pcg = jnp.linalg.norm(x_pcg - x_true)
    err_cg = jnp.linalg.norm(x_cg - x_true)
    assert err_pcg < err_cg / 10, (err_pcg, err_cg)


def test_pcg_fixed_step_reortho_solves():
    """The reference left PCG+reortho incomplete; here it must solve."""
    n = 20
    A, b = _problem(n, spread=100.0)
    pre = lambda v: v / jnp.diag(A)  # noqa: E731  Jacobi preconditioner
    x, info = solvers.pcg_fixed_step_reortho(n)(lambda v: A @ v, b, pre)
    assert jnp.allclose(x, jnp.linalg.solve(A, b), atol=1e-3, rtol=1e-3)
    assert "Q" in info


def test_safe_divide_no_nans_beyond_convergence():
    n = 6
    A, b = _problem(n)
    x, info = solvers.cg_fixed_step(3 * n)(lambda v: A @ v, b)
    assert not jnp.any(jnp.isnan(x))
    assert not jnp.any(jnp.isnan(info["residual_abs"]))


def test_krylov_solve_alias_exists():
    assert solvers.krylov_solve_cg_fixed_step_reortho is solvers.cg_fixed_step_reortho
