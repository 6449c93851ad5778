"""Legacy SLQ gradient strategies agree with exact computations."""

import jax
import jax.numpy as jnp
import pytest

from lanczos_adjoints_tpu.krylov import deprecated
from lanczos_adjoints_tpu.utils import test_util


@pytest.fixture
def spd_problem():
    n = 8
    eigvals = jnp.linspace(1.0, 2.0, n)
    A = test_util.symmetric_matrix_from_eigenvalues(eigvals)
    A_half = jnp.triu(A) - jnp.diag(0.5 * jnp.diag(A))
    v = jax.random.normal(jax.random.PRNGKey(0), (n,))
    return n, A_half, v


def _matvec(s, p):
    return (p + p.T) @ s


def _exact_quadform(v, p):
    w, V = jnp.linalg.eigh(p + p.T)
    z = V.T @ v
    return z @ (jnp.log(w) * z)


def test_value_and_grad_integrand(spd_problem):
    n, A_half, v = spd_problem
    quadform = deprecated.integrand_spd_value_and_grad(jnp.log, n, _matvec)
    value, grad = quadform(v / jnp.linalg.norm(v), A_half)

    # The estimator is calibrated for unnormalised Rademacher probes
    # (where |v|^2 = dim): the value carries an explicit dim factor and
    # the gradient carries scale factors. With a normalised input the
    # value is dim * quadform and the gradient is 1 * d quadform.
    v_unit = v / jnp.linalg.norm(v)
    expected_value = n * _exact_quadform(v_unit, A_half)
    assert jnp.allclose(value, expected_value, rtol=1e-4, atol=1e-4)

    expected_grad = jax.grad(_exact_quadform, argnums=1)(v_unit, A_half)
    assert jnp.allclose(grad, expected_grad, rtol=1e-2, atol=1e-2)


def test_recursive_vjp_integrand(spd_problem):
    n, A_half, v = spd_problem
    quadform = deprecated.integrand_spd_custom_vjp_recursive(jnp.log, n, _matvec)

    value = quadform(v, A_half)
    expected = _exact_quadform(v, A_half)
    assert jnp.allclose(value, expected, rtol=1e-4, atol=1e-4)

    grad = jax.grad(lambda p: quadform(v, p))(A_half)
    expected_grad = jax.grad(lambda p: _exact_quadform(v, p))(A_half)
    assert jnp.allclose(grad, expected_grad, rtol=0.15, atol=0.1)
