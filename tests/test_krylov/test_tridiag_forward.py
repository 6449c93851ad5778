"""Forward-pass invariants of the Lanczos factorisation.

Oracle pattern 2 of the reference test strategy (SURVEY.md 4):
full-rank reconstruction, orthonormality, and the mid-rank residual
identity; tolerances follow reference
tests/test_lanczos/test_tridiag_forward.py.
"""

import jax.numpy as jnp
import pytest

from lanczos_adjoints_tpu import krylov
from lanczos_adjoints_tpu.utils import test_util


def _dense_tridiag(diags, offdiags):
    return jnp.diag(diags) + jnp.diag(offdiags, 1) + jnp.diag(offdiags, -1)


@pytest.mark.parametrize("reortho", ["none", "full"])
def test_full_rank_reconstruction(reortho):
    n = 12
    eigvals = jnp.linspace(1.0, 2.0, n)
    A = test_util.symmetric_matrix_from_eigenvalues(eigvals)
    v = jnp.arange(1.0, n + 1.0)

    factorise = krylov.tridiag(lambda s, p: p @ s, n, reortho=reortho)
    (X, (diags, offdiags)), _ = factorise(v, A)

    T = _dense_tridiag(diags, offdiags)
    tol = 1e-5 if reortho == "full" else 1e-1
    assert jnp.allclose(X.T @ T @ X, A, atol=tol, rtol=tol)
    assert jnp.allclose(X @ X.T, jnp.eye(n), atol=tol, rtol=tol)


@pytest.mark.parametrize("reortho", ["none", "full"])
def test_mid_rank_residual_identity(reortho):
    n, k = 20, 8
    eigvals = jnp.linspace(1.0, 2.0, n)
    A = test_util.symmetric_matrix_from_eigenvalues(eigvals)
    v = jnp.arange(1.0, n + 1.0)

    factorise = krylov.tridiag(lambda s, p: p @ s, k, reortho=reortho)
    (X, (diags, offdiags)), (x_res, b_res) = factorise(v, A)

    T = _dense_tridiag(diags, offdiags)
    e_k = jnp.eye(k)[-1]
    # A X^T = X^T T + e_K (b * x_res)^T  (transposed residual identity)
    lhs = A @ X.T
    rhs = X.T @ T + jnp.outer(b_res * x_res, e_k)
    assert jnp.allclose(lhs, rhs, atol=1e-4, rtol=1e-4)
    # First basis vector is the normalised start vector.
    assert jnp.allclose(X[0], v / jnp.linalg.norm(v), atol=1e-6)


def test_invalid_reortho_raises():
    with pytest.raises(ValueError, match="reortho"):
        krylov.tridiag(lambda s: s, 3, reortho="sometimes")
