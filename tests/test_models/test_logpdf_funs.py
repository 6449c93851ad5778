"""BNN logpdf backends agree (mirrors reference test_logpdf_funs.py)."""

import jax
import jax.numpy as jnp

from lanczos_adjoints_tpu.models import bnn
from lanczos_adjoints_tpu.utils import test_util


def test_cholesky_and_eigh_logpdfs_agree():
    n = 6
    A = test_util.symmetric_matrix_from_eigenvalues(jnp.linspace(0.5, 2.0, n))
    mean = jnp.zeros(n)
    y = jax.random.normal(jax.random.PRNGKey(0), (n,))

    def cov(v):
        return A @ v

    value_chol, _ = bnn.logpdf_cholesky()(y, mean=mean, cov=cov)
    value_eigh, _ = bnn.logpdf_eigh()(y, mean=mean, cov=cov)
    assert jnp.allclose(value_chol, value_eigh, rtol=1e-4, atol=1e-4)

    # Against the closed-form Gaussian logpdf.
    expected = jax.scipy.stats.multivariate_normal.logpdf(y, mean=mean, cov=A)
    assert jnp.allclose(value_chol, expected, rtol=1e-4, atol=1e-4)


def test_jacfwd_map_matches_jacfwd():
    def fun(x):
        return jnp.stack([jnp.sum(x**2), x[0] * x[1]])

    x = jnp.asarray([1.0, 2.0, 3.0])
    jac_map = bnn.jacfwd_map(fun)(x)
    jac_ref = jax.jacfwd(fun)(x)
    assert jnp.allclose(jac_map, jac_ref, atol=1e-6)
