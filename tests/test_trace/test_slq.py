"""SLQ logdet estimators: vmapped vs blocked multi-RHS paths."""

import jax
import jax.numpy as jnp
import numpy as np

from lanczos_adjoints_tpu import trace
from lanczos_adjoints_tpu.trace import slq
from lanczos_adjoints_tpu.utils import test_util


def test_blocked_slq_close_to_vmapped_and_exact():
    """Blocked multi-RHS SLQ estimates logdet as well as the vmapped path."""
    n = 64
    eigvals = jnp.linspace(0.5, 8.0, n)
    A = test_util.symmetric_matrix_from_eigenvalues(eigvals)
    exact = float(jnp.sum(jnp.log(eigvals)))

    sample = trace.sampler_rademacher(jnp.ones((n,)), num=400)
    matvec = lambda v: A @ v  # noqa: E731

    for blocked in (False, True):
        logdet_fun = slq.krylov_logdet_slq(
            12, sample=sample, num_batches=1, checkpoint=False, blocked=blocked
        )
        value, _info = logdet_fun(matvec, jax.random.PRNGKey(0))
        assert np.isfinite(float(value))
        assert abs(float(value) - exact) / abs(exact) < 0.05, (
            blocked,
            float(value),
            exact,
        )

    # Gradients flow through the blocked estimator.
    def loss(a):
        logdet_fun = slq.krylov_logdet_slq(
            12, sample=sample, num_batches=1, checkpoint=False, blocked=True
        )
        value, _ = logdet_fun(lambda v: a @ v, jax.random.PRNGKey(0))
        return value

    g = jax.grad(loss)(A)
    # d/dA logdet(A) = A^{-1}; the SLQ estimate should correlate strongly.
    g_exact = jnp.linalg.inv(A)
    cos = jnp.sum(g * g_exact) / (jnp.linalg.norm(g) * jnp.linalg.norm(g_exact))
    assert cos > 0.9, float(cos)


def test_blocked_slq_through_partitioned_policy():
    """The partitioned/sequential gram policies accept (n, m) probe
    blocks (they used to flatten multi-RHS outputs to 1-D)."""
    from lanczos_adjoints_tpu.ops import gram

    n = 32
    x = jax.random.normal(jax.random.PRNGKey(0), (n, 2))
    kern = lambda a, b: jnp.exp(-jnp.sum((a - b) ** 2))  # noqa: E731

    for policy in (
        gram.gram_matvec_partitioned(4, checkpoint=False),
        gram.gram_matvec_sequential(checkpoint=False),
    ):
        mv = policy(kern)

        def matvec(v, mv=mv):
            return mv(x, x, v) + 0.5 * v

        sample = trace.sampler_rademacher(jnp.ones((n,)), num=32)
        logdet_fun = slq.krylov_logdet_slq(
            8, sample=sample, num_batches=1, checkpoint=False, blocked=True
        )
        value, _ = logdet_fun(matvec, jax.random.PRNGKey(1))
        assert np.isfinite(float(value))
