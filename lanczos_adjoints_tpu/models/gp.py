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
    gram_matvec_pallas,
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
    """|x - y|^2 / lengthscale^2 via the expanded form (MXU-friendly).

    Under a double vmap these dots lower to (n, d) x (d, m) MXU matmuls;
    precision is pinned because the TPU default (bf16, ~3 decimal digits)
    perturbs the Gram operator by ~1e-2 relative, which stalls
    tight-tolerance CG and corrupts posterior means.
    """
    x = x / lengthscale
    y = y / lengthscale
    highest = jax.lax.Precision.HIGHEST
    sq = (
        jnp.dot(x, x, precision=highest)
        + jnp.dot(y, y, precision=highest)
        - 2 * jnp.dot(x, y, precision=highest)
    )
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

        k.fused_spec = ("matern32", raw_lengthscale, raw_outputscale, constrain)
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

        k.fused_spec = ("matern12", raw_lengthscale, raw_outputscale, constrain)
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

        k.fused_spec = ("rbf", raw_lengthscale, raw_outputscale, constrain)
        return k

    params_like = {
        "raw_lengthscale": jnp.empty(shape_in),
        "raw_outputscale": jnp.empty(shape_out),
    }
    return parametrize, params_like


# ---------------------------------------------------------------------------
# Likelihoods
#
# All four factories are thin assemblies over one covariance-operator
# helper.  (The reference repeats the lazy-kernel / matvec plumbing in
# each of its four likelihood closures, gp_util.py:216-351; factoring it
# is a deliberate restructuring, and the single place the index-based
# lazy kernel is defined.)
# ---------------------------------------------------------------------------


class _CovarianceOp:
    """Lazy N x N kernel covariance: element access plus matvec.

    ``elem(i, j)`` evaluates ``k(x_i, x_j) (+ noise * delta_ij)`` --
    the access pattern the partial-Cholesky preconditioner needs -- and
    ``matvec_fn(v)`` applies the full Gram matrix through whichever
    execution policy (vmapped / partitioned / sequential) was injected.
    """

    def __init__(self, matvec, kernel, inputs, *, noise=0.0):
        self._policy = matvec
        self._kernel = kernel  # used by cross_matvec
        self._inputs = inputs

        def elem(i, j):
            val = kernel(inputs[i], inputs[j])
            if isinstance(noise, (int, float)) and noise == 0.0:
                return val
            return val + noise * (i == j)

        # Propagate the fused-kernel tag (see ops.gram.gram_matvec_pallas)
        # through the index-based lazy wrapper, together with the data it
        # needs to resolve indices back to feature rows.
        spec = getattr(kernel, "fused_spec", None)
        if spec is not None:
            elem.fused_spec = spec
            elem.fused_data = (inputs, noise)
        self.elem = elem

    def matvec(self, v):
        apply_gram = self._policy(self.elem)
        idx = jnp.arange(len(self._inputs))
        return apply_gram(idx, idx, v)

    def cross_matvec(self, xs, v):
        """K(xs, inputs) @ v -- the posterior-mean cross covariance."""
        apply_gram = self._policy(self._kernel)
        return apply_gram(xs, self._inputs, v)


def _mean_array(mean, xs):
    return jax.vmap(mean)(xs)


def likelihood_pdf(matvec: Callable, logpdf: Callable, *, constrain: Callable) -> tuple:
    """Gaussian likelihood evaluating the marginal pdf via a lazy matvec."""

    def likelihood(inputs, mean: Callable, kernel: Callable, params: dict):
        noise = constrain(params["raw_noise"])
        cov = _CovarianceOp(matvec, kernel, inputs, noise=noise)

        def logpdf_partial(targets, *p_logpdf):
            mu = _mean_array(mean, inputs)
            return logpdf(targets, *p_logpdf, mean=mu, cov_matvec=cov.matvec)

        return logpdf_partial

    return likelihood, {"raw_noise": jnp.empty(())}


def likelihood_pdf_p(
    matvec: Callable, logpdf_p: Callable, precondition: Callable, *, constrain: Callable
) -> tuple:
    """Gaussian likelihood with a preconditioned logpdf backend.

    The preconditioner sees the *noiseless* lazy kernel (it adds the
    noise itself through the Woodbury identity), while the logpdf's
    matvec carries ``+ noise * v``.
    """

    def likelihood(inputs, mean: Callable, kernel: Callable, params: dict):
        noise = constrain(params["raw_noise"])
        cov = _CovarianceOp(matvec, kernel, inputs)
        pre, info_pre = precondition(cov.elem, len(inputs))

        def logpdf_partial(targets, *p_logpdf):
            mu = _mean_array(mean, inputs)
            value, info = logpdf_p(
                targets,
                *p_logpdf,
                mean=mu,
                cov_matvec=lambda v: cov.matvec(v) + noise * v,
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
        cov = _CovarianceOp(matvec, kernel, inputs, noise=noise)

        def condition_partial(xs, targets):
            weights, info = solve(cov.matvec, targets - _mean_array(mean, inputs))
            posterior_mean = _mean_array(mean, xs) + cov.cross_matvec(xs, weights)
            return posterior_mean, {"solve": info}

        return condition_partial

    return likelihood, {"raw_noise": jnp.empty(())}


def likelihood_condition_p(
    matvec: Callable, solve_p: Callable, *, precondition: Callable, constrain: Callable
) -> tuple:
    """Conditioned mean via a preconditioned solver."""

    def likelihood(inputs, mean: Callable, kernel: Callable, params: dict):
        noise = constrain(params["raw_noise"])
        cov = _CovarianceOp(matvec, kernel, inputs)
        pre, _info_pre = precondition(cov.elem, len(inputs))

        def condition_partial(xs, targets):
            weights, info = solve_p(
                lambda v: cov.matvec(v) + noise * v,
                targets - _mean_array(mean, inputs),
                P=lambda v: pre(v, noise),
            )
            posterior_mean = _mean_array(mean, xs) + cov.cross_matvec(xs, weights)
            return posterior_mean, {"solve": info}

        return condition_partial

    return likelihood, {"raw_noise": jnp.empty(())}


# ---------------------------------------------------------------------------
# Logpdf backends
#
# Every backend reduces to the same Gaussian identity
#   log N(y | mu, K) = -1/2 logdet(K) - 1/2 (y-mu)^T K^{-1} (y-mu) - n/2 log 2pi
# differing only in how (logdet, solve) are produced; `_gaussian_logpdf`
# is that shared assembly.
# ---------------------------------------------------------------------------


def _gaussian_logpdf(residual, half_logdet, mahalanobis):
    (n,) = jnp.shape(residual)
    return -half_logdet - 0.5 * mahalanobis - n / 2 * jnp.log(2 * jnp.pi)


def _materialize(cov_matvec, like):
    """Dense covariance from a matvec (small-n debug backends only)."""
    return jax.jacfwd(cov_matvec)(like)


def logpdf_scipy_stats() -> Callable:
    """Materialise the covariance and call jax.scipy multivariate normal."""

    def logpdf(y, /, *, mean, cov_matvec: Callable):
        cov_matrix = _materialize(cov_matvec, mean)
        value = jax.scipy.stats.multivariate_normal.logpdf(y, mean=mean, cov=cov_matrix)
        return value, {}

    return logpdf


def logpdf_cholesky() -> Callable:
    """Materialise the covariance and use a Cholesky factorisation."""

    def logpdf(y, /, *, mean, cov_matvec: Callable):
        chol = jnp.linalg.cholesky(_materialize(cov_matvec, mean))
        white = jax.scipy.linalg.solve_triangular(chol, y - mean, lower=True)
        value = _gaussian_logpdf(
            y - mean,
            half_logdet=jnp.sum(jnp.log(jnp.diag(chol))),
            mahalanobis=jnp.dot(white, white),
        )
        return value, {}

    return logpdf


def _logpdf_matrix_free(logdet: Callable, run_solve: Callable) -> Callable:
    """SLQ logdet + CG Mahalanobis; ``run_solve(cov_matvec, rhs, **kw)``."""

    def logpdf(y, *params_logdet, mean, cov_matvec: Callable, **solve_kwargs):
        logdet_, info_logdet = logdet(cov_matvec, *params_logdet)
        residual = y - mean
        solution, info_solve = run_solve(cov_matvec, residual, **solve_kwargs)
        value = _gaussian_logpdf(
            residual,
            half_logdet=logdet_ / 2,
            mahalanobis=jnp.dot(residual, solution),
        )
        return value, {"logdet": info_logdet, "solve": info_solve}

    return logpdf


def logpdf_krylov(solve: Callable, logdet: Callable) -> Callable:
    """Matrix-free logpdf: SLQ logdet + CG Mahalanobis."""
    return _logpdf_matrix_free(logdet, solve)


def logpdf_krylov_p(solve_p: Callable, logdet: Callable) -> Callable:
    """Matrix-free logpdf with a preconditioned Mahalanobis solve.

    The preconditioner arrives per-call as the ``P=...`` keyword.
    """
    return _logpdf_matrix_free(logdet, solve_p)
