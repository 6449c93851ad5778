"""Side-by-side numerical equivalence with the reference implementation.

Imports the reference's ``lanczos``/``arnoldi`` modules directly (they
are standalone jax files) and checks that our adjoints produce the same
VJPs on identical inputs -- stronger than the adjoint==autodiff oracle
alone, this pins the *numerics* to the reference implementation.

Skipped when the reference checkout is not mounted.
"""

import os
import sys

import jax
import jax.numpy as jnp
import pytest

from lanczos_adjoints_tpu import krylov
from lanczos_adjoints_tpu.utils import test_util

_REFERENCE_SRC = "/root/reference/src"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(_REFERENCE_SRC), reason="reference checkout not mounted"
)


def _import_reference(module):
    if _REFERENCE_SRC not in sys.path:
        sys.path.insert(0, _REFERENCE_SRC)
    import importlib

    return importlib.import_module(f"matfree_extensions.{module}")


def _vjp_pair(factorise, v, A, key):
    out, vjp = jax.vjp(factorise, v, A)
    flat, unflatten = jax.flatten_util.ravel_pytree(out)
    cot = unflatten(jax.random.normal(key, flat.shape, dtype=flat.dtype))
    return flat, vjp(cot)


def test_lanczos_adjoint_matches_reference():
    ref_lanczos = _import_reference("lanczos")
    n, k = 14, 6
    A = test_util.symmetric_matrix_from_eigenvalues(jnp.linspace(1.0, 2.0, n))
    A = jnp.triu(A) - 0.5 * jnp.diag(jnp.diag(A))
    v = jax.random.normal(jax.random.PRNGKey(1), (n,))

    def matvec(s, p):
        return (p + p.T) @ s

    ours = krylov.tridiag(matvec, k, reortho="none", custom_vjp=True)
    theirs = ref_lanczos.tridiag(matvec, k, reortho="none", custom_vjp=True)

    key = jax.random.PRNGKey(2)
    f_ours, (dv_ours, dA_ours) = _vjp_pair(ours, v, A, key)
    f_ref, (dv_ref, dA_ref) = _vjp_pair(theirs, v, A, key)

    assert jnp.allclose(f_ours, f_ref, atol=1e-5, rtol=1e-5)
    assert jnp.allclose(dv_ours, dv_ref, atol=1e-4, rtol=1e-4)
    assert jnp.allclose(dA_ours, dA_ref, atol=1e-4, rtol=1e-4)


def test_arnoldi_adjoint_matches_reference():
    ref_arnoldi = _import_reference("arnoldi")
    n, k = 12, 7
    A = jax.random.normal(jax.random.PRNGKey(0), (n, n)) + 2 * jnp.eye(n)
    v = jax.random.normal(jax.random.PRNGKey(1), (n,))

    def matvec(s, p):
        return p @ s

    ours = krylov.hessenberg(matvec, k, reortho="full", custom_vjp=True)
    theirs = ref_arnoldi.hessenberg(matvec, k, reortho="full", custom_vjp=True)

    key = jax.random.PRNGKey(3)
    f_ours, (dv_ours, dA_ours) = _vjp_pair(ours, v, A, key)
    f_ref, (dv_ref, dA_ref) = _vjp_pair(theirs, v, A, key)

    assert jnp.allclose(f_ours, f_ref, atol=1e-5, rtol=1e-5)
    assert jnp.allclose(dv_ours, dv_ref, atol=1e-4, rtol=1e-4)
    assert jnp.allclose(dA_ours, dA_ref, atol=1e-4, rtol=1e-4)
