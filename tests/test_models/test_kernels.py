"""Kernel parametrisation against closed-form values.

Mirrors reference tests/test_util/test_gp_util/test_kernels.py and the
GPyTorch-equivalence checks (test_kernels_versus_gpytorch.py:26-48) --
gpytorch is unavailable here, so the oracle is the closed-form formula
with the softplus-constrained parameters evaluated explicitly.
"""

import jax
import jax.numpy as jnp
import pytest

from lanczos_adjoints_tpu.models import gp


def _softplus(x):
    return jnp.log1p(jnp.exp(x))


@pytest.mark.parametrize(
    "factory",
    [gp.kernel_scaled_rbf, gp.kernel_scaled_matern_12, gp.kernel_scaled_matern_32],
)
def test_kernel_matches_closed_form(factory):
    d = 3
    kernel, params_like = factory(shape_in=(d,), shape_out=())
    raw_ell = jnp.asarray([0.3, -0.2, 0.1])
    raw_out = jnp.asarray(0.4)
    k = kernel(raw_lengthscale=raw_ell, raw_outputscale=raw_out)

    x = jnp.asarray([1.0, -0.5, 0.2])
    y = jnp.asarray([0.3, 0.1, -0.4])

    ell = _softplus(raw_ell)
    out_s = _softplus(raw_out)
    r2 = jnp.sum(((x - y) / ell) ** 2)
    eps = jnp.finfo(jnp.float32).eps

    if factory is gp.kernel_scaled_rbf:
        expected = out_s * jnp.exp(-r2 / 2)
    elif factory is gp.kernel_scaled_matern_12:
        dist = jnp.sqrt(r2 + eps)
        expected = out_s * jnp.exp(-dist)
    else:
        dist = jnp.sqrt(3 * r2 + eps)
        expected = out_s * (1 + dist) * jnp.exp(-dist)

    assert jnp.allclose(k(x, y), expected, rtol=1e-5)
    # Symmetry and the value at zero distance.
    assert jnp.allclose(k(x, y), k(y, x), rtol=1e-6)
    assert jnp.allclose(k(x, x), out_s, rtol=1e-3)


def test_kernel_gradients_finite():
    kernel, _ = gp.kernel_scaled_matern_32(shape_in=(2,), shape_out=())

    def value(raw_ell):
        k = kernel(raw_lengthscale=raw_ell, raw_outputscale=jnp.zeros(()))
        x = jnp.zeros(2)
        return k(x, x)  # zero distance: the epsilon-shift keeps this differentiable

    g = jax.grad(value)(jnp.zeros(2))
    assert jnp.all(jnp.isfinite(g))


def test_params_like_shapes():
    kernel, params_like = gp.kernel_scaled_rbf(shape_in=(5,), shape_out=())
    assert params_like["raw_lengthscale"].shape == (5,)
    assert params_like["raw_outputscale"].shape == ()
