"""Golden-constant MLL fixtures pinning the GPyTorch parametrisation.

Role of reference
``tests/test_util/test_gp_util/test_target_logml_versus_gpytorch.py:109-198``:
the reference compares every {logpdf x gram-matvec} combination against
``gpytorch.mlls.ExactMarginalLogLikelihood`` on a 3-point dataset.
GPyTorch cannot run in this offline environment, so the oracle values
below were computed ONCE in float64 by an independent numpy
implementation of GPyTorch's documented conventions -- softplus
('greater-than-0') constraints on raw lengthscale/outputscale/noise,
``ScaleKernel(MaternKernel/RBFKernel(ard_num_dims=d))`` covariance,
``ConstantMean``, exact Cholesky marginal log likelihood (total over the
batch, i.e. GPyTorch's per-datum value times N) -- and are checked in as
literals.  They pin the *parametrisation*: a silent change to the
constraint, the distance scaling, or the mean handling moves the value
by far more than the f32 tolerance.
"""

import jax
import jax.numpy as jnp
import pytest

from lanczos_adjoints_tpu import precond, solvers, trace
from lanczos_adjoints_tpu.models import gp

_X = jnp.asarray([[0.1, 0.2], [0.4, 0.3], [0.9, 0.6]])
_Y = jnp.asarray([0.5, -0.3, 0.8])
_RAW_ELL = jnp.asarray([0.25, -0.5])
_RAW_OUT = jnp.asarray(0.35)
_RAW_NOISE = jnp.asarray(-1.0)
_MEAN = jnp.asarray(0.1)

# float64 golden values (independent numpy implementation, see module
# docstring).  f32 evaluation matches to ~1e-5 relative.
_GOLDEN_MLL = {
    "rbf": -3.4627322401805616,
    "matern12": -3.381627482922573,
    "matern32": -3.41257287045953,
}

_KERNELS = {
    "rbf": gp.kernel_scaled_rbf,
    "matern12": gp.kernel_scaled_matern_12,
    "matern32": gp.kernel_scaled_matern_32,
}


def _build(kind, likelihood_and_logpdf):
    kernel, _ = _KERNELS[kind](shape_in=(2,), shape_out=())
    mean, _ = gp.mean_constant(shape_out=())
    prior = gp.model_gp(mean, kernel)
    likelihood, _ = likelihood_and_logpdf
    return gp.target_logml(prior, likelihood)


@pytest.mark.parametrize("kind", sorted(_GOLDEN_MLL))
def test_cholesky_mll_matches_golden(kind):
    constrain = gp.constraint_greater_than(0.0)
    lik = gp.likelihood_pdf(gp.gram_matvec(), gp.logpdf_cholesky(), constrain=constrain)
    loss = _build(kind, lik)
    value, _info = loss(
        _X,
        _Y,
        params_mean={"constant_value": _MEAN},
        params_kernel={"raw_lengthscale": _RAW_ELL, "raw_outputscale": _RAW_OUT},
        params_likelihood={"raw_noise": _RAW_NOISE},
    )
    assert jnp.allclose(value, _GOLDEN_MLL[kind], rtol=1e-5), (
        float(value),
        _GOLDEN_MLL[kind],
    )


@pytest.mark.parametrize("kind", sorted(_GOLDEN_MLL))
def test_krylov_mll_matches_golden(kind):
    """The matrix-free path (SLQ logdet + PCG solve) hits the same value.

    Mirrors the reference's near-exact configuration: full-depth Lanczos
    and enough Rademacher probes that the stochastic logdet converges
    (reference test_target_logml_versus_gpytorch.py:24-40 uses 2x50_000
    probes; the residual tolerance reflects the O(1/sqrt(num)) Monte-Carlo floor).
    """
    constrain = gp.constraint_greater_than(0.0)
    sampler = trace.sampler_rademacher(jnp.ones((3,)), num=100_000)
    logdet = gp.krylov_logdet_slq(3, sample=sampler, num_batches=1, checkpoint=False)
    solve = solvers.pcg_adaptive(atol=1e-7, rtol=0.0, maxiter=30, miniter=3)
    precondition = precond.preconditioner(precond.cholesky_partial_pivot(rank=3))
    lik = gp.likelihood_pdf_p(
        gp.gram_matvec(), gp.logpdf_krylov_p(solve, logdet), precondition,
        constrain=constrain,
    )
    loss = _build(kind, lik)
    value, _info = loss(
        _X,
        _Y,
        jax.random.PRNGKey(0),
        params_mean={"constant_value": _MEAN},
        params_kernel={"raw_lengthscale": _RAW_ELL, "raw_outputscale": _RAW_OUT},
        params_likelihood={"raw_noise": _RAW_NOISE},
    )
    assert jnp.allclose(value, _GOLDEN_MLL[kind], rtol=2e-3), (
        float(value),
        _GOLDEN_MLL[kind],
    )
