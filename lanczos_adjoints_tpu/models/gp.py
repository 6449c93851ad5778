"""Gaussian-process models with matrix-free marginal likelihood.

Capability parity with reference ``src/matfree_extensions/util/gp_util.py``:
targets (gp_util.py:15-45), model/mean/kernels with the
GPyTorch-compatible softplus parametrisation (gp_util.py:48-201),
likelihoods exposing the covariance only as a matvec (gp_util.py:216-351),
logpdf backends (gp_util.py:354-431), and the SLQ logdets re-exported
from ``lanczos_adjoints_tpu.trace``.

Everything is a closure factory returning ``(value, info)`` pairs -- the
info-dict convention that threads CG residuals, SLQ std estimates, and
preconditioner flags up to the training loop.

TPU notes: kernels use the expanded-norm trick (|x|^2 + |y|^2 - 2<x,y>)
so vmapped Gram evaluations lower to MXU matmuls; the Gram matvec
execution policies live in ``lanczos_adjoints_tpu.ops.gram`` and the
row-sharded multi-chip variant in ``lanczos_adjoints_tpu.parallel``.
"""

import functools
from typing import Callable

import jax
import jax.numpy as jnp

# Re-exported here because the reference exposes them via gp_util.
from lanczos_adjoints_tpu.ops.gram import (  # noqa: F401
    gram_matrix,
    gram_matvec,
    gram_matvec_partitioned,
    gram_matvec_sequential,
)
from lanczos_adjoints_tpu.trace.slq import (  # noqa: F401
    krylov_logdet_slq,
    krylov_logdet_slq_vjp_reuse,
)

# ---------------------------------------------------------------------------
# Targets
# ---------------------------------------------------------------------------


def target_logml(model: Callable, likelihood: Callable, /) -> Callable:
    """Construct a log-marginal-likelihood target."""

    def mll(
        inputs,
        targets,
        *p_logpdf,
        params_mean: dict,
        params_kernel: dict,
        params_likelihood: dict,
    ):
        mean, kernel = model(params_mean=params_mean, params_kernel=params_kernel)
        loss = likelihood(inputs, mean=mean, kernel=kernel, params=params_likelihood)
        value, info = loss(targets, *p_logpdf)
        return value, info

    return mll


def target_posterior(model: Callable, likelihood: Callable, /) -> Callable:
    """Construct a posterior-predictive target."""

    def posterior(
        inputs, targets, params_mean: dict, params_kernel: dict, params_likelihood: dict
    ):
        mean, kernel = model(params_mean, params_kernel)
        condition = likelihood(inputs, mean, kernel, params=params_likelihood)
        return functools.partial(condition, targets=targets), {}

    return posterior


# ---------------------------------------------------------------------------
# Model, mean, kernels
# ---------------------------------------------------------------------------


def model_gp(mean_fun: Callable, kernel_fun: Callable) -> Callable:
    """Bundle parametrised mean and kernel factories into a prior."""

    def prior(params_mean: dict, params_kernel: dict):
        return mean_fun(**params_mean), kernel_fun(**params_kernel)

    return prior


def mean_constant(*, shape_out) -> tuple:
    """Constant mean function."""

    def parametrize(*, constant_value):
        return lambda _x: constant_value

    return parametrize, {"constant_value": jnp.empty(shape_out)}


def constraint_greater_than(minval, /) -> Callable:
    """Softplus constraint matching GPyTorch/PyTorch semantics."""

    def softplus(x, beta=1.0, threshold=20.0):
        x_safe = jax.lax.select(x * beta < threshold, x, jnp.ones_like(x))
        soft = 1 / beta * jnp.log(1 + jnp.exp(beta * x_safe))
        return jax.lax.select(x * beta < threshold, soft, x)

    return lambda raw: minval + softplus(raw)


def _scaled_sq_distance(x, y, lengthscale):
    """|x - y|^2 / lengthscale^2 via the expanded form (MXU-friendly)."""
    x = x / lengthscale
    y = y / lengthscale
    sq = jnp.dot(x, x) + jnp.dot(y, y) - 2 * jnp.dot(x, y)
    return jnp.maximum(0.0, sq)


def _assert_shapes(x, y, shape_in):
    if jnp.shape(x) != jnp.shape(y):
        msg = f"Argument shapes differ: {jnp.shape(x)} != {jnp.shape(y)}"
        raise ValueError(msg)
    if jnp.shape(x) != shape_in:
        msg = f"Shape {jnp.shape(x)} does not match shape_in={shape_in}"
        raise ValueError(msg)


def kernel_scaled_matern_32(*, shape_in, shape_out) -> tuple:
    """Scaled Matern(nu=3/2); parametrisation matches GPyTorch's
    ``ScaleKernel(MaternKernel(nu=1.5))``."""
    constrain = constraint_greater_than(0.0)

    def parametrize(*, raw_lengthscale, raw_outputscale):
        def k(x, y):
            _assert_shapes(x, y, shape_in)
            lengthscale = constrain(raw_lengthscale)
            outputscale = constrain(raw_outputscale)

            sq = _scaled_sq_distance(jnp.sqrt(3.0) * x, jnp.sqrt(3.0) * y, lengthscale)
            # Epsilon-shift keeps sqrt differentiable at zero distance.
            dist = jnp.sqrt(sq + jnp.finfo(sq.dtype).eps)
            return outputscale * (1.0 + dist) * jnp.exp(-dist)

        return k

    params_like = {
        "raw_lengthscale": jnp.empty(shape_in),
        "raw_outputscale": jnp.empty(shape_out),
    }
    return parametrize, params_like


def kernel_scaled_matern_12(*, shape_in, shape_out) -> tuple:
    """Scaled Matern(nu=1/2) (exponential kernel), GPyTorch-parametrised."""
    constrain = constraint_greater_than(0.0)

    def parametrize(*, raw_lengthscale, raw_outputscale):
        def k(x, y):
            _assert_shapes(x, y, shape_in)
            lengthscale = constrain(raw_lengthscale)
            outputscale = constrain(raw_outputscale)

            sq = _scaled_sq_distance(x, y, lengthscale)
            dist = jnp.sqrt(sq + jnp.finfo(sq.dtype).eps)
            return outputscale * jnp.exp(-dist)

        return k

    params_like = {
        "raw_lengthscale": jnp.empty(shape_in),
        "raw_outputscale": jnp.empty(shape_out),
    }
    return parametrize, params_like


def kernel_scaled_rbf(*, shape_in, shape_out) -> tuple:
    """Scaled RBF kernel, GPyTorch-parametrised."""
    constrain = constraint_greater_than(0.0)

    def parametrize(*, raw_lengthscale, raw_outputscale):
        def k(x, y):
            _assert_shapes(x, y, shape_in)
            lengthscale = constrain(raw_lengthscale)
            outputscale = constrain(raw_outputscale)

            sq = _scaled_sq_distance(x, y, lengthscale)
            return outputscale * jnp.exp(-sq / 2)

        return k

    params_like = {
        "raw_lengthscale": jnp.empty(shape_in),
        "raw_outputscale": jnp.empty(shape_out),
    }
    return parametrize, params_like


# ---------------------------------------------------------------------------
# Likelihoods
# ---------------------------------------------------------------------------


def likelihood_pdf(
    matvec: Callable, logpdf: Callable, *, constrain: Callable
) -> tuple:
    """Gaussian likelihood evaluating the marginal pdf via a lazy matvec."""

    def likelihood(inputs, mean: Callable, kernel: Callable, params: dict):
        noise = constrain(params["raw_noise"])

        def lazy_kernel(i, j):
            return kernel(inputs[i], inputs[j]) + noise * (i == j)

        def cov_matvec(v):
            cov = matvec(lazy_kernel)
            idx = jnp.arange(len(inputs))
            return cov(idx, idx, v)

        def logpdf_partial(targets, *p_logpdf):
            mean_array = jax.vmap(mean)(inputs)
            return logpdf(targets, *p_logpdf, mean=mean_array, cov_matvec=cov_matvec)

        return logpdf_partial

    return likelihood, {"raw_noise": jnp.empty(())}


def likelihood_pdf_p(
    matvec: Callable, logpdf_p: Callable, precondition: Callable, *, constrain: Callable
) -> tuple:
    """Gaussian likelihood with a preconditioned logpdf backend."""

    def likelihood(inputs, mean: Callable, kernel: Callable, params: dict):
        noise = constrain(params["raw_noise"])

        def lazy_kernel(i, j):
            return kernel(inputs[i], inputs[j])

        def cov_matvec(v):
            cov = matvec(lazy_kernel)
            idx = jnp.arange(len(inputs))
            return cov(idx, idx, v)

        pre, info_pre = precondition(lazy_kernel, len(inputs))

        def logpdf_partial(targets, *p_logpdf):
            mean_array = jax.vmap(mean)(inputs)
            value, info = logpdf_p(
                targets,
                *p_logpdf,
                mean=mean_array,
                cov_matvec=lambda v: cov_matvec(v) + noise * v,
                P=lambda v: pre(v, noise),
            )
            return value, {"precondition": info_pre, "logpdf": info}

        return logpdf_partial

    return likelihood, {"raw_noise": jnp.empty(())}


def likelihood_condition(
    matvec: Callable, solve: Callable, *, constrain: Callable
) -> tuple:
    """Gaussian likelihood returning the conditioned (posterior) mean."""

    def likelihood(inputs, mean: Callable, kernel: Callable, params: dict):
        noise = constrain(params["raw_noise"])

        def lazy_kernel(i, j):
            return kernel(inputs[i], inputs[j]) + noise * (i == j)

        def cov_matvec(v):
            cov = matvec(lazy_kernel)
            idx = jnp.arange(len(inputs))
            return cov(idx, idx, v)

        def condition_partial(xs, targets):
            mean_array = jax.vmap(mean)(inputs)
            weights, info = solve(cov_matvec, targets - mean_array)

            def cov_matvec_prior(v):
                cov = matvec(kernel)
                return cov(xs, inputs, v)

            mean_eval = jax.vmap(mean)(xs)
            return mean_eval + cov_matvec_prior(weights), {"solve": info}

        return condition_partial

    return likelihood, {"raw_noise": jnp.empty(())}


def likelihood_condition_p(
    matvec: Callable, solve_p: Callable, *, precondition: Callable, constrain: Callable
) -> tuple:
    """Conditioned mean via a preconditioned solver."""

    def likelihood(inputs, mean: Callable, kernel: Callable, params: dict):
        noise = constrain(params["raw_noise"])

        def lazy_kernel(i, j):
            return kernel(inputs[i], inputs[j])

        def cov_matvec(v):
            cov = matvec(lazy_kernel)
            idx = jnp.arange(len(inputs))
            return cov(idx, idx, v)

        pre, _info_pre = precondition(lazy_kernel, len(inputs))

        def condition_partial(xs, targets):
            mean_array = jax.vmap(mean)(inputs)
            weights, info = solve_p(
                lambda v: cov_matvec(v) + noise * v,
                targets - mean_array,
                P=lambda v: pre(v, noise),
            )

            def cov_matvec_prior(v):
                cov = matvec(kernel)
                return cov(xs, inputs, v)

            mean_eval = jax.vmap(mean)(xs)
            return mean_eval + cov_matvec_prior(weights), {"solve": info}

        return condition_partial

    return likelihood, {"raw_noise": jnp.empty(())}


# ---------------------------------------------------------------------------
# Logpdf backends
# ---------------------------------------------------------------------------


def logpdf_scipy_stats() -> Callable:
    """Materialise the covariance and call jax.scipy multivariate normal."""

    def logpdf(y, /, *, mean, cov_matvec: Callable):
        cov_matrix = jax.jacfwd(cov_matvec)(mean)
        value = jax.scipy.stats.multivariate_normal.logpdf(
            y, mean=mean, cov=cov_matrix
        )
        return value, {}

    return logpdf


def logpdf_cholesky() -> Callable:
    """Materialise the covariance and use a Cholesky factorisation."""

    def logpdf(y, /, *, mean, cov_matvec: Callable):
        cov_matrix = jax.jacfwd(cov_matvec)(mean)
        cholesky = jnp.linalg.cholesky(cov_matrix)

        logdet = jnp.sum(jnp.log(jnp.diag(cholesky)))
        tmp = jax.scipy.linalg.solve_triangular(
            cholesky, y - mean, lower=True, trans=False
        )
        mahalanobis = jnp.dot(tmp, tmp)
        (n,) = jnp.shape(mean)
        return -logdet - 0.5 * mahalanobis - n / 2 * jnp.log(2 * jnp.pi), {}

    return logpdf


def logpdf_krylov(solve: Callable, logdet: Callable) -> Callable:
    """Matrix-free logpdf: SLQ logdet + CG Mahalanobis."""

    def logpdf(y, *params_logdet, mean, cov_matvec: Callable):
        logdet_, info_logdet = logdet(cov_matvec, *params_logdet)
        logdet_ = logdet_ / 2

        tmp, info_solve = solve(cov_matvec, y - mean)
        mahalanobis = jnp.dot(y - mean, tmp)

        (n,) = jnp.shape(mean)
        value = -logdet_ - 0.5 * mahalanobis - n / 2 * jnp.log(2 * jnp.pi)
        return value, {"logdet": info_logdet, "solve": info_solve}

    return logpdf


def logpdf_krylov_p(solve_p: Callable, logdet: Callable) -> Callable:
    """Matrix-free logpdf with a preconditioned Mahalanobis solve."""

    def logpdf(y, *params_logdet, mean, cov_matvec: Callable, P: Callable):
        logdet_, info_logdet = logdet(cov_matvec, *params_logdet)
        logdet_ = logdet_ / 2

        tmp, info_solve = solve_p(cov_matvec, y - mean, P=P)
        mahalanobis = jnp.dot(y - mean, tmp)

        (n,) = jnp.shape(mean)
        value = -logdet_ - 0.5 * mahalanobis - n / 2 * jnp.log(2 * jnp.pi)
        return value, {"logdet": info_logdet, "solve": info_solve}

    return logpdf
