"""Test-matrix factories.

Standalone replacement for the ``matfree.test_util`` helpers the reference
test-suite builds on (e.g. ``symmetric_matrix_from_eigenvalues``, used as
the de-facto SPD test-matrix factory throughout
``/root/reference/tests``), plus a few extras for the TPU build's own
tests.
"""

import jax
import jax.numpy as jnp


def symmetric_matrix_from_eigenvalues(eigvals, /):
    """Construct a symmetric matrix with prescribed eigenvalues.

    Uses a deterministic orthogonal basis (QR of a fixed pseudo-random
    matrix seeded from the spectrum size) so tests are reproducible.
    """
    (n,) = jnp.shape(eigvals)
    key = jax.random.PRNGKey(n)
    basis, _ = jnp.linalg.qr(jax.random.normal(key, (n, n), dtype=eigvals.dtype))
    return (basis * eigvals[None, :]) @ basis.T


def asymmetric_matrix_from_eigenvalues(eigvals, /):
    """Construct a diagonalisable nonsymmetric matrix with prescribed spectrum."""
    (n,) = jnp.shape(eigvals)
    key = jax.random.PRNGKey(n + 1)
    V = jax.random.normal(key, (n, n), dtype=eigvals.dtype)
    V = V + n * jnp.eye(n, dtype=eigvals.dtype)  # well-conditioned eigenbasis
    return V @ jnp.diag(eigvals) @ jnp.linalg.inv(V)


def assert_columns_orthonormal(Q, /, *, atol=1e-5):
    """Assert that the columns of Q are orthonormal."""
    _, k = jnp.shape(Q)
    gram = Q.T.conj() @ Q
    assert jnp.allclose(gram, jnp.eye(k, dtype=gram.dtype), atol=atol), gram


def assert_allclose(a, b, /, *, atol=None, rtol=None):
    """allclose with dtype-aware sqrt(eps) default tolerances."""
    a, b = jnp.asarray(a), jnp.asarray(b)
    tol = jnp.sqrt(jnp.finfo(jnp.result_type(a, b)).eps)
    atol = float(tol) if atol is None else atol
    rtol = float(tol) if rtol is None else rtol
    assert jnp.allclose(a, b, atol=atol, rtol=rtol), (a, b)
