"""Legacy SLQ gradient strategies, kept for comparison studies.

Parity with reference ``src/matfree_extensions/_deprecated.py``: older
gradient strategies pre-dating the closed-form adjoints --

- ``integrand_spd_value_and_grad`` (reference _deprecated.py:11-71):
  returns E[(value, grad)] in one pass, a "clever" direct-estimator
  common in the GP community.  Neither forward- nor reverse-mode: use
  only when SLQ is the whole computational chain.
- ``integrand_spd_custom_vjp_recursive`` (reference
  _deprecated.py:74-157): custom VJP that evaluates two extra SLQ calls
  on asymmetric quadratic forms ``(Z1 - Z2)/4`` in the backward pass;
  admits higher derivatives at ~3x decomposition cost.

Prefer ``lanczos_adjoints_tpu.krylov.integrand_spd`` (exact adjoints)
or ``integrand_spd_custom_vjp_reuse`` (cheap inexact gradients).
"""

import functools

import jax
import jax.flatten_util
import jax.numpy as jnp

from lanczos_adjoints_tpu.krylov import lanczos as _lanczos


def _tridiag_full(matvec_flat, krylov_depth):
    """Full-reortho tridiagonalisation returning (basis, (diag, offdiag))."""
    factorise = _lanczos.tridiag(
        matvec_flat, krylov_depth, reortho="full", custom_vjp=False
    )

    def run(v0_flat, *params):
        (basis, coeffs), _remainder = factorise(v0_flat, *params)
        return basis, coeffs

    return run


def integrand_spd_value_and_grad(matfun, krylov_depth, matvec, /):
    """SLQ integrand returning ``(value, grad)`` in a single evaluation."""

    def quadform(v0, *parameters):
        v0_flat, unflatten = jax.flatten_util.ravel_pytree(v0)
        scale = jnp.linalg.norm(v0_flat)
        v0_unit = v0_flat / scale

        def matvec_flat(v_flat, *p):
            av = matvec(unflatten(v_flat), *p)
            return jax.flatten_util.ravel_pytree(av)[0]

        basis, (diags, offdiags) = _tridiag_full(matvec_flat, krylov_depth)(
            v0_unit, *parameters
        )
        eigvals, eigvecs = jnp.linalg.eigh(
            jnp.diag(diags) + jnp.diag(offdiags, 1) + jnp.diag(offdiags, -1)
        )

        (dim,) = v0_flat.shape
        fx = jax.vmap(matfun)(eigvals)
        first = eigvecs[0, :]
        value = dim * jnp.dot(first, fx * first)

        dfx = jax.vmap(jax.jacfwd(matfun))(eigvals)
        sol = eigvecs @ (dfx * first)
        w1 = scale * (basis.T @ sol)

        grad = jax.grad(lambda *p: jnp.dot(matvec_flat(v0_flat, *p), w1))(
            *parameters
        )
        return value, grad

    return quadform


def integrand_spd_custom_vjp_recursive(matfun, krylov_depth, matvec, /):
    """SLQ integrand whose VJP recursively calls SLQ (higher-order capable)."""

    def quadform(v0, *parameters):
        return _integrand_slq(matfun, krylov_depth, matvec, v0, *parameters)

    return quadform


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _integrand_slq(matfun, krylov_depth, matvec, v0, *parameters):
    return _integrand_fwd(matfun, krylov_depth, matvec, v0, *parameters)[0]


def _integrand_fwd(matfun, krylov_depth, matvec, v0, *parameters):
    v0_flat_unscaled, unflatten = jax.flatten_util.ravel_pytree(v0)
    scale = jnp.linalg.norm(v0_flat_unscaled)
    v0_unit = v0_flat_unscaled / scale

    def matvec_flat(v_flat, *p):
        av = matvec(unflatten(v_flat), *p)
        return jax.flatten_util.ravel_pytree(av)[0]

    basis, (diags, offdiags) = _tridiag_full(matvec_flat, krylov_depth)(
        v0_unit, *parameters
    )
    eigvals, eigvecs = jnp.linalg.eigh(
        jnp.diag(diags) + jnp.diag(offdiags, 1) + jnp.diag(offdiags, -1)
    )

    # Stop gradients through the decomposition; the (cheap) differentiable
    # path runs through the projection of v0 only.
    basis = jax.lax.stop_gradient(basis)
    eigvals = jax.lax.stop_gradient(eigvals)
    eigvecs = jax.lax.stop_gradient(eigvecs)

    # Do not exploit that basis @ v0 is e1 -- that would break gradients.
    z = eigvecs.T @ (basis @ v0_unit)
    fx = jax.vmap(matfun)(eigvals)
    value = scale**2 * jnp.dot(z, fx * z)

    cache = {"v0": unflatten(v0_flat_unscaled), "parameters": parameters}
    return value, cache


def _integrand_bwd(matfun, krylov_depth, matvec, cache, cotangent):
    parameters = cache["parameters"]
    v0 = cache["v0"]

    def asymmetric_quantity(*p):
        """v^T f'(A) (A v) via the polarisation identity of two SLQ calls."""
        mv = matvec(v0, *p)
        z1 = jax.tree_util.tree_map(jnp.add, v0, mv)
        z2 = jax.tree_util.tree_map(jnp.subtract, v0, mv)
        Z1, _ = _integrand_fwd(jax.jacrev(matfun), krylov_depth, matvec, z1, *p)
        Z2, _ = _integrand_fwd(jax.jacrev(matfun), krylov_depth, matvec, z2, *p)
        return (Z1 - Z2) / 4

    _fx, vjp = jax.vjp(asymmetric_quantity, *parameters)
    return 0.0, *vjp(cotangent)


_integrand_slq.defvjp(_integrand_fwd, _integrand_bwd)
