"""Hutchinson estimators and SLQ logdet.

Mirrors reference tests/test_hutchinson.py (custom-VJP gradients are
"similar but different") plus SLQ logdet accuracy against dense slogdet.
"""

import jax
import jax.numpy as jnp

from lanczos_adjoints_tpu import trace
from lanczos_adjoints_tpu.utils import test_util


def test_trace_estimate_converges():
    n = 5
    A = test_util.symmetric_matrix_from_eigenvalues(jnp.linspace(1.0, 2.0, n))

    def integrand(v, p):
        return v @ (p @ v)

    sampler = trace.sampler_rademacher(jnp.ones((n,)), num=5000)
    estimate = trace.hutchinson(integrand, sampler)
    value = estimate(jax.random.PRNGKey(0), A)
    assert jnp.allclose(value, jnp.trace(A), rtol=0.05)


def test_custom_vjp_gradients_similar_but_different():
    n = 5
    A = test_util.symmetric_matrix_from_eigenvalues(jnp.linspace(1.0, 2.0, n))

    def integrand(v, p):
        return v @ (p @ v)

    sampler = trace.sampler_normal(jnp.ones((n,)), num=4000)
    plain = trace.hutchinson(integrand, sampler)
    fresh = trace.hutchinson_custom_vjp(integrand, sampler)

    key = jax.random.PRNGKey(1)
    g_plain = jax.grad(lambda p: plain(key, p))(A)
    g_fresh = jax.grad(lambda p: fresh(key, p))(A)

    assert jnp.allclose(g_plain, g_fresh, rtol=0.25, atol=0.1)
    assert not jnp.allclose(g_plain, g_fresh, rtol=1e-4)


def test_nograd_stops_sample_gradients():
    n = 4
    A = jnp.eye(n)

    def integrand(v, p):
        return v @ (p @ v)

    sampler = trace.sampler_normal(jnp.ones((n,)), num=64)
    estimate = trace.hutchinson_nograd(integrand, sampler)
    value = estimate(jax.random.PRNGKey(0), A)
    assert value.shape == ()


def test_batched_estimator_averages():
    n = 4
    A = test_util.symmetric_matrix_from_eigenvalues(jnp.linspace(1.0, 2.0, n))

    def integrand(v, p):
        return v @ (p @ v)

    sampler = trace.sampler_rademacher(jnp.ones((n,)), num=100)
    single = trace.hutchinson(integrand, sampler)
    batched = trace.hutchinson_batch(single, 20)
    value = batched(jax.random.PRNGKey(0), A)
    assert jnp.allclose(value, jnp.trace(A), rtol=0.05)


def test_slq_logdet_matches_slogdet():
    n = 10
    A = test_util.symmetric_matrix_from_eigenvalues(jnp.linspace(1.0, 2.0, n))
    sampler = trace.sampler_rademacher(jnp.ones((n,)), num=400)

    logdet = trace.krylov_logdet_slq(n, sample=sampler, num_batches=4, checkpoint=False)
    value, info = logdet(lambda v: A @ v, jax.random.PRNGKey(0))
    _sign, expected = jnp.linalg.slogdet(A)
    assert jnp.allclose(value, expected, rtol=0.1, atol=0.1)
    assert "std_abs" in info


def test_slq_logdet_gradient_matches_dense():
    n = 8
    A = test_util.symmetric_matrix_from_eigenvalues(jnp.linspace(1.0, 2.0, n))
    A_half = jnp.triu(A) - jnp.diag(0.5 * jnp.diag(A))
    sampler = trace.sampler_rademacher(jnp.ones((n,)), num=50_000)

    def logdet_slq(p):
        logdet = trace.krylov_logdet_slq(
            n, sample=sampler, num_batches=1, checkpoint=False
        )
        value, _ = logdet(lambda v: (p + p.T) @ v, jax.random.PRNGKey(0))
        return value

    def logdet_dense(p):
        return jnp.linalg.slogdet(p + p.T)[1]

    g_slq = jax.grad(logdet_slq)(A_half)
    g_dense = jax.grad(logdet_dense)(A_half)
    assert jnp.allclose(g_slq, g_dense, atol=0.05, rtol=0.1)


def test_slq_vjp_reuse_gradient_close():
    n = 8
    A = test_util.symmetric_matrix_from_eigenvalues(jnp.linspace(1.0, 2.0, n))
    A_half = jnp.triu(A) - jnp.diag(0.5 * jnp.diag(A))
    sampler = trace.sampler_rademacher(jnp.ones((n,)), num=10_000)

    def logdet_reuse(p):
        logdet = trace.krylov_logdet_slq_vjp_reuse(
            n, sample=sampler, num_batches=1, checkpoint=False
        )
        value, _ = logdet(lambda v: (p + p.T) @ v, jax.random.PRNGKey(0))
        return value

    def logdet_dense(p):
        return jnp.linalg.slogdet(p + p.T)[1]

    g_reuse = jax.grad(logdet_reuse)(A_half)
    g_dense = jax.grad(logdet_dense)(A_half)
    assert jnp.allclose(g_reuse, g_dense, atol=0.1, rtol=0.2)
