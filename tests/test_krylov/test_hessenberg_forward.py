"""Forward-pass invariants of the Arnoldi factorisation.

Mirrors reference tests/test_arnoldi/test_hessenberg_forward.py:
decomposition identity A Q = Q H + r e_K^T, orthonormality under full
reortho, complex support, Q e_1 = c v, and error paths.
"""

import jax
import jax.numpy as jnp
import pytest

from lanczos_adjoints_tpu import krylov


@pytest.mark.parametrize("reortho", ["none", "full"])
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.complex64])
def test_decomposition_identity(reortho, dtype):
    n, k = 10, 6
    key = jax.random.PRNGKey(0)
    if dtype == jnp.complex64:
        A = jax.random.normal(key, (n, n)) + 1j * jax.random.normal(key, (n, n))
        v = jnp.arange(1.0, n + 1.0) + 0.5j
    else:
        A = jax.random.normal(key, (n, n))
        v = jnp.arange(1.0, n + 1.0)
    A = A.astype(dtype)
    v = v.astype(dtype)

    factorise = krylov.hessenberg(lambda s, p: p @ s, k, reortho=reortho)
    Q, H, res, c = factorise(v, A)

    e_k = jnp.eye(k, dtype=dtype)[-1]
    assert jnp.allclose(A @ Q, Q @ H + jnp.outer(res, e_k), atol=1e-4, rtol=1e-4)
    # First column is the normalised start vector: Q e_1 = c v.
    assert jnp.allclose(Q[:, 0], c * v, atol=1e-5)
    if reortho == "full":
        assert jnp.allclose(Q.conj().T @ Q, jnp.eye(k, dtype=dtype), atol=1e-5)


def test_full_rank_orthonormal():
    n = 8
    A = jax.random.normal(jax.random.PRNGKey(1), (n, n))
    v = jnp.arange(1.0, n + 1.0)
    factorise = krylov.hessenberg(lambda s, p: p @ s, n, reortho="full")
    Q, H, res, _c = factorise(v, A)
    assert jnp.allclose(Q @ Q.T, jnp.eye(n), atol=1e-4)
    assert jnp.allclose(res, jnp.zeros_like(res), atol=1e-3)
    assert jnp.allclose(Q.T @ A @ Q, H, atol=1e-4, rtol=1e-4)


def test_invalid_reortho_raises_typeerror():
    with pytest.raises(TypeError, match="expected"):
        krylov.hessenberg(lambda s: s, 3, reortho="occasionally")


def test_invalid_depth_raises_valueerror():
    factorise = krylov.hessenberg(lambda s: s, 100, reortho="full")
    with pytest.raises(ValueError, match="depth"):
        factorise(jnp.ones((4,)))

    factorise = krylov.hessenberg(lambda s: s, 0, reortho="full")
    with pytest.raises(ValueError, match="depth"):
        factorise(jnp.ones((4,)))
