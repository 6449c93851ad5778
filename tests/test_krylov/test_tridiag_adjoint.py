"""Adjoint == autodiff oracle for the Lanczos custom VJP.

Oracle pattern 1 of the reference test strategy (SURVEY.md 4):
build the same factorisation with ``custom_vjp=False`` (JAX
differentiates through the recurrence) and ``custom_vjp=True`` (the
closed-form adjoint), compare VJPs in random cotangent directions.
Tolerances per reference tests/test_lanczos/test_tridiag_adjoint.py:50.
"""

import jax
import jax.flatten_util
import jax.numpy as jnp
import pytest

from lanczos_adjoints_tpu import krylov
from lanczos_adjoints_tpu.utils import test_util


@pytest.mark.parametrize("krylov_depth", [2, 5, 11])
def test_adjoint_matches_backprop(krylov_depth):
    n = 14
    eigvals = jnp.linspace(1.0, 2.0, n)
    A = test_util.symmetric_matrix_from_eigenvalues(eigvals)
    # Symmetrised parametrisation (as in the reference test): with a raw
    # ``p @ s`` matvec the custom adjoint and backprop may legitimately
    # differ by an antisymmetric gradient component.
    A = jnp.triu(A) - jnp.diag(0.5 * jnp.diag(A))
    v = jax.random.normal(jax.random.PRNGKey(1), (n,))

    def matvec(s, p):
        return (p + p.T) @ s

    ref = krylov.tridiag(matvec, krylov_depth, reortho="none", custom_vjp=False)
    ours = krylov.tridiag(matvec, krylov_depth, reortho="none", custom_vjp=True)

    out_ref, vjp_ref = jax.vjp(ref, v, A)
    out_ours, vjp_ours = jax.vjp(ours, v, A)
    # Same forward math, but the two paths compile under different
    # transforms (primal vs linearised), so XLA fuses the per-step
    # division differently; without reorthogonalisation those few-ulp
    # differences amplify with depth in f32 -- scale like the gradient
    # tolerance below.
    assert jnp.allclose(
        jax.flatten_util.ravel_pytree(out_ref)[0],
        jax.flatten_util.ravel_pytree(out_ours)[0],
        atol=1e-6 * (1 + krylov_depth),
    )

    cotangent = jax.tree_util.tree_map(
        lambda s: jax.random.normal(jax.random.PRNGKey(2), s.shape), out_ref
    )
    (dv_ref, dA_ref) = vjp_ref(cotangent)
    (dv_ours, dA_ours) = vjp_ours(cotangent)

    # Reference tolerance is 1e-4 at depth 4; without reorthogonalisation
    # both code paths lose digits linearly with depth in f32, so scale.
    tol = 1e-4 * (1 + krylov_depth)
    assert jnp.allclose(dv_ref, dv_ours, atol=tol, rtol=tol)
    assert jnp.allclose(dA_ref, dA_ours, atol=tol, rtol=tol)


def test_adjoint_with_parameter_pytree():
    """Parameter gradients flow through arbitrary pytrees."""
    n, k = 10, 4
    key = jax.random.PRNGKey(0)
    d1 = jnp.linspace(1.0, 2.0, n)
    d2 = jnp.linspace(0.1, 0.2, n)
    v = jax.random.normal(key, (n,))

    def matvec(s, params):
        return params["a"] * s + params["b"] * s

    params = {"a": d1, "b": d2}

    ref = krylov.tridiag(matvec, k, reortho="none", custom_vjp=False)
    ours = krylov.tridiag(matvec, k, reortho="none", custom_vjp=True)

    def loss(fn):
        def run(v, params):
            (X, (a, b)), _ = fn(v, params)
            return jnp.sum(a) + jnp.sum(b) + jnp.sum(X**2)

        return run

    g_ref = jax.grad(loss(ref), argnums=(0, 1))(v, params)
    g_ours = jax.grad(loss(ours), argnums=(0, 1))(v, params)
    flat_ref = jax.flatten_util.ravel_pytree(g_ref)[0]
    flat_ours = jax.flatten_util.ravel_pytree(g_ours)[0]
    assert jnp.allclose(flat_ref, flat_ours, atol=1e-4, rtol=1e-4)


def test_integrand_spd_logdet_matches_eigh():
    """SLQ integrand at full depth reproduces v^T log(A) v exactly."""
    n = 8
    eigvals = jnp.linspace(1.0, 2.0, n)
    A = test_util.symmetric_matrix_from_eigenvalues(eigvals)
    v = jax.random.normal(jax.random.PRNGKey(3), (n,))

    quadform = krylov.integrand_spd(jnp.log, n, lambda s, p: (p + p.T) @ s / 2)

    def exact(v, A):
        w, V = jnp.linalg.eigh((A + A.T) / 2)
        return (V.T @ v) @ (jnp.log(w) * (V.T @ v))

    val, grad = jax.value_and_grad(quadform, argnums=1)(v, A)
    val_ref, grad_ref = jax.value_and_grad(exact, argnums=1)(v, A)
    assert jnp.allclose(val, val_ref, atol=1e-4, rtol=1e-4)
    assert jnp.allclose(grad, grad_ref, atol=1e-3, rtol=1e-3)


def test_integrand_reuse_vjp_close_to_exact():
    """The decomposition-reusing VJP is close (not equal) to the exact one."""
    n = 8
    eigvals = jnp.linspace(1.0, 2.0, n)
    A = test_util.symmetric_matrix_from_eigenvalues(eigvals)
    v = jax.random.normal(jax.random.PRNGKey(4), (n,))

    exact = krylov.integrand_spd(jnp.log, n, lambda s, p: (p + p.T) @ s / 2)
    reuse = krylov.integrand_spd_custom_vjp_reuse(
        jnp.log, n, lambda s, p: (p + p.T) @ s / 2
    )

    val_e, grad_e = jax.value_and_grad(exact, argnums=1)(v, A)
    val_r, grad_r = jax.value_and_grad(reuse, argnums=1)(v, A)
    assert jnp.allclose(val_e, val_r, atol=1e-5)
    assert jnp.allclose(grad_e, grad_r, atol=1e-2, rtol=1e-1)


def test_integrand_reuse_vjp_probe_vector_gradient():
    """d/dv0 of the reuse-VJP integrand matches autodiff of the exact form.

    The reference leaves this gradient unimplemented and returns zeros
    (reference lanczos.py:130-134); here it comes from the cached
    decomposition: d/dv0 [v0^T f(A) v0] = 2 f(A) v0.
    """
    n = 8
    eigvals = jnp.linspace(1.0, 2.0, n)
    A = test_util.symmetric_matrix_from_eigenvalues(eigvals)
    v = jax.random.normal(jax.random.PRNGKey(5), (n,))

    reuse = krylov.integrand_spd_custom_vjp_reuse(
        jnp.log, n, lambda s, p: (p + p.T) @ s / 2
    )

    def exact(v0, p):
        sym = (p + p.T) / 2
        w, V = jnp.linalg.eigh(sym)
        return (V.T @ v0) @ (jnp.log(w) * (V.T @ v0))

    grad_r = jax.grad(reuse, argnums=0)(v, A)
    grad_e = jax.grad(exact, argnums=0)(v, A)
    assert jnp.abs(grad_r).max() > 0, "probe gradient must not be zeros"
    assert jnp.allclose(grad_r, grad_e, atol=1e-4, rtol=1e-4)

    # Pytree-valued probes flow through the same machinery.
    v_tree = {"a": v[: n // 2], "b": v[n // 2 :]}

    def matvec_tree(s, p):
        flat, unflatten = jax.flatten_util.ravel_pytree(s)
        return unflatten((p + p.T) @ flat / 2)

    reuse_tree = krylov.integrand_spd_custom_vjp_reuse(jnp.log, n, matvec_tree)
    grad_tree = jax.grad(reuse_tree, argnums=0)(v_tree, A)
    flat_tree = jnp.concatenate([grad_tree["a"], grad_tree["b"]])
    assert jnp.allclose(flat_tree, grad_e, atol=1e-4, rtol=1e-4)
