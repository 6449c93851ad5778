"""GP stack: matrix-free MLL equals the exact (Cholesky) oracle.

Replaces the reference's GPyTorch-oracle tests
(tests/test_util/test_gp_util/test_target_logml_versus_gpytorch.py) --
gpytorch is unavailable here, and the Cholesky logpdf is the same
mathematical oracle: every {logpdf x gram-matvec x preconditioner}
combination must produce the same MLL and gradients on a small dataset,
through value_and_grad (differentiability included).  SLQ cases use
many Rademacher probes so the stochastic estimate is near-exact.
"""

import jax
import jax.numpy as jnp
import pytest

from lanczos_adjoints_tpu import precond, solvers, trace
from lanczos_adjoints_tpu.models import gp


def _setup(kernel_factory):
    key = jax.random.PRNGKey(0)
    inputs = jax.random.normal(key, (6, 2))
    targets = jnp.asarray([1.0, -0.5, 0.2, 0.0, 0.3, -1.0])

    kernel, params_kernel = kernel_factory(shape_in=(2,), shape_out=())
    mean, params_mean = gp.mean_constant(shape_out=())
    model = gp.model_gp(mean, kernel)

    params_mean = {"constant_value": jnp.zeros(())}
    params_kernel = jax.tree_util.tree_map(
        lambda lk: jnp.ones(lk.shape) * 0.5, params_kernel
    )
    params_likelihood = {"raw_noise": jnp.asarray(0.3)}
    return inputs, targets, model, params_mean, params_kernel, params_likelihood


def _mll_exact(inputs, targets, model, pm, pk, pl):
    constrain = gp.constraint_greater_than(0.0)
    likelihood, _ = gp.likelihood_pdf(
        gp.gram_matvec(), gp.logpdf_cholesky(), constrain=constrain
    )
    mll = gp.target_logml(model, likelihood)

    def loss(pm, pk, pl):
        value, _ = mll(
            inputs,
            targets,
            params_mean=pm,
            params_kernel=pk,
            params_likelihood=pl,
        )
        return value

    return jax.value_and_grad(loss, argnums=(0, 1, 2))(pm, pk, pl)


@pytest.mark.parametrize(
    "kernel_factory",
    [gp.kernel_scaled_rbf, gp.kernel_scaled_matern_12, gp.kernel_scaled_matern_32],
)
def test_exact_mll_consistent_across_gram_policies(kernel_factory):
    inputs, targets, model, pm, pk, pl = _setup(kernel_factory)
    v_ref, g_ref = _mll_exact(inputs, targets, model, pm, pk, pl)

    constrain = gp.constraint_greater_than(0.0)
    for matvec in [
        gp.gram_matvec(),
        gp.gram_matvec_partitioned(3, checkpoint=True),
        gp.gram_matvec_sequential(checkpoint=False),
    ]:
        likelihood, _ = gp.likelihood_pdf(
            matvec, gp.logpdf_cholesky(), constrain=constrain
        )
        mll = gp.target_logml(model, likelihood)

        def loss(pm, pk, pl):
            value, _ = mll(
                inputs, targets, params_mean=pm, params_kernel=pk, params_likelihood=pl
            )
            return value

        v, g = jax.value_and_grad(loss, argnums=(0, 1, 2))(pm, pk, pl)
        tol = jnp.sqrt(jnp.finfo(jnp.float32).eps)
        assert jnp.allclose(v, v_ref, atol=tol, rtol=tol)
        flat = jax.flatten_util.ravel_pytree(g)[0]
        flat_ref = jax.flatten_util.ravel_pytree(g_ref)[0]
        assert jnp.allclose(flat, flat_ref, atol=10 * tol, rtol=10 * tol)


def test_krylov_mll_matches_cholesky():
    inputs, targets, model, pm, pk, pl = _setup(gp.kernel_scaled_rbf)
    v_ref, g_ref = _mll_exact(inputs, targets, model, pm, pk, pl)

    n = len(targets)
    constrain = gp.constraint_greater_than(0.0)
    sampler = trace.sampler_rademacher(jnp.ones((n,)), num=50_000)
    logdet = gp.krylov_logdet_slq(n, sample=sampler, num_batches=2, checkpoint=False)
    solve = solvers.cg_fixed_step(n)
    likelihood, _ = gp.likelihood_pdf(
        gp.gram_matvec(), gp.logpdf_krylov(solve, logdet), constrain=constrain
    )
    mll = gp.target_logml(model, likelihood)

    def loss(pm, pk, pl):
        value, _ = mll(
            inputs,
            targets,
            jax.random.PRNGKey(1),
            params_mean=pm,
            params_kernel=pk,
            params_likelihood=pl,
        )
        return value

    v, g = jax.value_and_grad(loss, argnums=(0, 1, 2))(pm, pk, pl)
    assert jnp.allclose(v, v_ref, atol=0.05, rtol=0.01)
    flat = jax.flatten_util.ravel_pytree(g)[0]
    flat_ref = jax.flatten_util.ravel_pytree(g_ref)[0]
    assert jnp.allclose(flat, flat_ref, atol=0.05, rtol=0.05)


def test_preconditioned_krylov_mll_matches_cholesky():
    inputs, targets, model, pm, pk, pl = _setup(gp.kernel_scaled_rbf)
    v_ref, g_ref = _mll_exact(inputs, targets, model, pm, pk, pl)

    n = len(targets)
    constrain = gp.constraint_greater_than(0.0)
    sampler = trace.sampler_rademacher(jnp.ones((n,)), num=50_000)
    logdet = gp.krylov_logdet_slq(n, sample=sampler, num_batches=2, checkpoint=False)
    solve_p = solvers.pcg_fixed_step(n)
    cholesky = precond.cholesky_partial_pivot(rank=3)
    precondition = precond.preconditioner(cholesky)

    likelihood, _ = gp.likelihood_pdf_p(
        gp.gram_matvec(),
        gp.logpdf_krylov_p(solve_p, logdet),
        precondition,
        constrain=constrain,
    )
    mll = gp.target_logml(model, likelihood)

    def loss(pm, pk, pl):
        value, _ = mll(
            inputs,
            targets,
            jax.random.PRNGKey(1),
            params_mean=pm,
            params_kernel=pk,
            params_likelihood=pl,
        )
        return value

    v, g = jax.value_and_grad(loss, argnums=(0, 1, 2))(pm, pk, pl)
    assert jnp.allclose(v, v_ref, atol=0.05, rtol=0.01)
    flat = jax.flatten_util.ravel_pytree(g)[0]
    flat_ref = jax.flatten_util.ravel_pytree(g_ref)[0]
    assert jnp.allclose(flat, flat_ref, atol=0.05, rtol=0.05)


def test_posterior_mean_interpolates():
    inputs, targets, model, pm, pk, pl = _setup(gp.kernel_scaled_rbf)
    pl = {"raw_noise": jnp.asarray(-10.0)}  # tiny noise -> interpolation

    constrain = gp.constraint_greater_than(0.0)
    solve = solvers.cg_adaptive(atol=1e-6, rtol=1e-6, maxiter=100, miniter=2)
    likelihood, _ = gp.likelihood_condition(
        gp.gram_matvec(), solve, constrain=constrain
    )
    posterior = gp.target_posterior(model, likelihood)

    condition, _ = posterior(
        inputs, targets, params_mean=pm, params_kernel=pk, params_likelihood=pl
    )
    mean_at_train, _info = condition(inputs)
    assert jnp.allclose(mean_at_train, targets, atol=1e-2)


def test_kernel_parametrisation_softplus():
    """Raw parameters pass through a softplus (GPyTorch convention)."""
    constrain = gp.constraint_greater_than(0.0)
    assert jnp.allclose(constrain(jnp.asarray(0.0)), jnp.log(2.0))
    assert jnp.allclose(constrain(jnp.asarray(30.0)), 30.0)  # linear tail
    kernel, _ = gp.kernel_scaled_rbf(shape_in=(2,), shape_out=())
    k = kernel(raw_lengthscale=jnp.zeros(2), raw_outputscale=jnp.asarray(0.0))
    x = jnp.zeros(2)
    assert jnp.allclose(k(x, x), jnp.log(2.0), atol=1e-6)


def test_kernel_shape_validation():
    kernel, _ = gp.kernel_scaled_rbf(shape_in=(3,), shape_out=())
    k = kernel(raw_lengthscale=jnp.zeros(3), raw_outputscale=jnp.asarray(0.0))
    with pytest.raises(ValueError, match="shape"):
        k(jnp.zeros(2), jnp.zeros(2))


def test_posterior_mean_preconditioned_matches_plain():
    inputs, targets, model, pm, pk, pl = _setup(gp.kernel_scaled_rbf)

    constrain = gp.constraint_greater_than(0.0)
    solve = solvers.pcg_adaptive(atol=1e-6, rtol=0.0, maxiter=200, miniter=2)
    cholesky = precond.cholesky_partial_pivot(rank=3)
    precondition = precond.preconditioner(cholesky)

    lik_plain, _ = gp.likelihood_condition(
        gp.gram_matvec(),
        solvers.cg_adaptive(atol=1e-6, rtol=1e-6, maxiter=200, miniter=2),
        constrain=constrain,
    )
    lik_pre, _ = gp.likelihood_condition_p(
        gp.gram_matvec(), solve, precondition=precondition, constrain=constrain
    )

    xs = inputs[:3] + 0.05

    def posterior_mean(likelihood):
        posterior = gp.target_posterior(model, likelihood)
        condition, _ = posterior(
            inputs, targets, params_mean=pm, params_kernel=pk, params_likelihood=pl
        )
        mean, _info = condition(xs)
        return mean

    mean_plain = posterior_mean(lik_plain)
    mean_pre = posterior_mean(lik_pre)
    assert jnp.allclose(mean_plain, mean_pre, atol=1e-3, rtol=1e-3)
