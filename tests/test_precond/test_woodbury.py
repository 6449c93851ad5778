"""Factor-based Woodbury solve: correctness + the split-step mll identity.

The split-step training mode (`--split_step`, driver _common.py) relies
on two contracts pinned here:

1. ``precond.woodbury_solve(chol, v, s)`` applied to an externally-held
   factor equals ``(s*I + L L^T)^{-1} v``.
2. value_and_grad of the Krylov mll equals the sum of term-wise
   value_and_grads (quadratic/constant term via CG + logdet term via
   SLQ) with the preconditioner factor computed separately -- the
   identity that lets one training step run as three short executables
   (this environment kills executables running longer than ~90 s
   on-device; N=400k needs the split).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lanczos_adjoints_tpu import precond, solvers, trace
from lanczos_adjoints_tpu.models import gp


def test_woodbury_solve_matches_dense():
    rng = np.random.default_rng(0)
    n, rank, s = 40, 12, 0.37
    L = jnp.asarray(rng.standard_normal((n, rank)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((n,)), jnp.float32)
    out = precond.woodbury_solve(L, v, s)
    dense = np.linalg.solve(s * np.eye(n) + np.asarray(L) @ np.asarray(L).T,
                            np.asarray(v))
    np.testing.assert_allclose(np.asarray(out), dense, rtol=5e-4, atol=5e-4)


def test_woodbury_solve_refuses_grad():
    L = jnp.ones((8, 2))
    v = jnp.ones((8,))
    with pytest.raises(RuntimeError, match="must not be differentiated"):
        jax.grad(lambda L: jnp.sum(precond.woodbury_solve(L, v, 0.5)))(L)


def _build(n=96, d=3, rank=16, depth=6, probes=4):
    rng = np.random.default_rng(1)
    X = jnp.asarray(rng.standard_normal((n, d)), jnp.float32)
    y = jnp.asarray(rng.standard_normal((n,)), jnp.float32)
    kernel, p_k = gp.kernel_scaled_matern_32(shape_in=(d,), shape_out=())
    mean, p_m = gp.mean_constant(shape_out=())
    prior = gp.model_gp(mean, kernel)
    constrain = gp.constraint_greater_than(1e-4)
    sample = trace.sampler_rademacher(jnp.ones((n,)), num=probes)
    logdet = gp.krylov_logdet_slq(depth, sample=sample, num_batches=1,
                                  checkpoint=False)
    solve_p = solvers.pcg_adaptive(rtol=0.0, atol=1e-5, maxiter=200, miniter=2)
    cholesky = precond.cholesky_partial_pivot(rank=rank)
    precondition = precond.preconditioner(cholesky)
    likelihood, p_l = gp.likelihood_pdf_p(
        gp.gram_matvec(), gp.logpdf_krylov_p(solve_p, logdet), precondition,
        constrain=constrain,
    )
    mll = gp.target_logml(prior, likelihood)
    params = (p_m, p_k, p_l)
    flat, unflatten = jax.flatten_util.ravel_pytree(params)
    return dict(X=X, y=y, prior=prior, constrain=constrain, logdet=logdet,
                solve_p=solve_p, cholesky=cholesky, mll=mll, flat=flat,
                unflatten=unflatten)


def test_split_step_matches_joint_value_and_grad():
    from lanczos_adjoints_tpu.models.gp import _CovarianceOp, _mean_array

    s = _build()
    X, y = s["X"], s["y"]
    key = jax.random.PRNGKey(7)
    n = len(X)

    def joint(flat):
        p1, p2, p3 = s["unflatten"](flat)
        val, _info = s["mll"](X, y, key, params_mean=p1, params_kernel=p2,
                              params_likelihood=p3)
        return val

    v_joint, g_joint = jax.value_and_grad(joint)(s["flat"])

    # --- split: factor / quadratic term / logdet term ---
    def factor(flat):
        p1, p2, _p3 = s["unflatten"](flat)
        _mean_fn, kernel_fn = s["prior"](params_mean=p1, params_kernel=p2)
        cov = _CovarianceOp(gp.gram_matvec(), kernel_fn, X)
        chol, _ = s["cholesky"](cov.elem, n)
        return chol

    chol = factor(s["flat"])

    def quad(flat):
        p1, p2, p3 = s["unflatten"](flat)
        mean_fn, kernel_fn = s["prior"](params_mean=p1, params_kernel=p2)
        noise = s["constrain"](p3["raw_noise"])
        cov = _CovarianceOp(gp.gram_matvec(), kernel_fn, X)
        r = y - _mean_array(mean_fn, X)
        sol, _info = s["solve_p"](
            lambda v: cov.matvec(v) + noise * v, r,
            P=lambda v: precond.woodbury_solve(chol, v, noise),
        )
        return -0.5 * jnp.dot(r, sol) - n / 2 * jnp.log(2 * jnp.pi)

    def half_logdet(flat):
        p1, p2, p3 = s["unflatten"](flat)
        _mean_fn, kernel_fn = s["prior"](params_mean=p1, params_kernel=p2)
        noise = s["constrain"](p3["raw_noise"])
        cov = _CovarianceOp(gp.gram_matvec(), kernel_fn, X)
        val, _info = s["logdet"](lambda v: cov.matvec(v) + noise * v, key)
        return -0.5 * val

    vq, gq = jax.value_and_grad(quad)(s["flat"])
    vl, gl = jax.value_and_grad(half_logdet)(s["flat"])

    np.testing.assert_allclose(float(vq + vl), float(v_joint), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(gq + gl), np.asarray(g_joint), rtol=2e-3, atol=2e-5
    )
