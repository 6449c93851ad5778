"""Test-NLL estimator study: why was elevators' NLL above the reference?

VERDICT round-2 weak #4: elevators RMSE matched the reference but the
test NLL was -0.548 vs the reference's -0.682.  The test NLL is itself
a stochastic SLQ estimate of the test-set log marginal
(``mll_eval``), so the gap can come from (a) the learned
hyperparameters or (b) the *evaluation estimator*.  This script
separates them: given a trained run's saved ``_params_opt.npy``, it
re-evaluates the test NLL with

- the training-time estimator (``log_clipped`` SLQ, as ``mll_eval``
  used through round 2) -- clipping tiny/negative Ritz values to
  ``log(1)=0`` biases the logdet UP and the reported NLL up with it,
- the reference's estimator (plain ``jnp.log`` SLQ,
  ref optim_logml_adjoints_adaptive.py:155-178),
- the exact dense Cholesky logpdf (the truth: test sets are ~n/5,
  small enough to materialise),

each over several probe keys, and prints the learned noise /
outputscale for comparison.

Usage:
    python nll_study.py --dataset elevators --seed 1 --name <run name> \
        [--num_matvecs 10 --num_samples 10]
"""

import argparse
import glob

import jax
import jax.numpy as jnp
import numpy as np

from _common import load_data

from lanczos_adjoints_tpu import solvers, trace
from lanczos_adjoints_tpu.models import gp
from lanczos_adjoints_tpu.utils import data as data_util
from lanczos_adjoints_tpu.utils import exp_util

if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--name", type=str, required=True)
    parser.add_argument("--dataset", type=str, default="elevators")
    parser.add_argument("--seed", type=int, default=1)
    parser.add_argument("--num_matvecs", type=int, default=10)
    parser.add_argument("--num_samples", type=int, default=10)
    parser.add_argument("--num_eval_keys", type=int, default=5)
    parser.add_argument("--num_partitions", type=int, default=1)
    args = parser.parse_args()
    print(args)

    # Reproduce the training split exactly (same seed pipeline as run()).
    key = jax.random.PRNGKey(args.seed)
    key, subkey = jax.random.split(key)
    inputs, targets = load_data(args.dataset)
    inputs = jnp.asarray(inputs, jnp.float32)
    targets = jnp.asarray(targets, jnp.float32)
    num_raw = len(inputs)
    coeff = num_raw // (5 * args.num_partitions)
    num_data = int(coeff * 5 * args.num_partitions)
    train, test = data_util.split_train_test_shuffle(
        subkey, inputs[:num_data], targets[:num_data], train_fraction=0.8
    )
    (train_x, train_y), (test_x, test_y) = train, test
    print(f"test set: {test_x.shape}")

    directory = exp_util.matching_directory(__file__, "results/")
    directory = directory.replace("/nll_study/", "/optim_logml_adjoints_adaptive/")
    pattern = f"{directory}{args.name}_{args.dataset}_s{args.seed}_params_opt.npy"
    matches = glob.glob(pattern)
    if not matches:
        msg = f"no saved params at {pattern}; re-run training first"
        raise SystemExit(msg)
    p_opt = jnp.asarray(np.load(matches[0]))

    ndim = train_x.shape[-1]
    mean, p_mean = gp.mean_constant(shape_out=())
    kernel, p_kernel = gp.kernel_scaled_matern_32(shape_in=(ndim,), shape_out=())
    prior = gp.model_gp(mean, kernel)
    constrain = gp.constraint_greater_than(1e-4)
    p_template = (p_mean, p_kernel, {"raw_noise": jnp.empty(())})
    _, unflatten = jax.flatten_util.ravel_pytree(p_template)
    p1, p2, p3 = unflatten(p_opt)
    print(
        f"learned noise {float(constrain(p3['raw_noise'])):.5f}  "
        f"outputscale {float(constrain(p2['raw_outputscale'])):.4f}  "
        f"lengthscale|mean| {float(jnp.mean(constrain(p2['raw_lengthscale']))):.4f}"
    )

    from lanczos_adjoints_tpu.precond import (
        cholesky_partial_pivot,
        preconditioner,
    )
    from lanczos_adjoints_tpu.trace.slq import log_clipped

    precondition = preconditioner(cholesky_partial_pivot(rank=100))

    def nll_slq(matfun, key):
        sample = trace.sampler_rademacher(
            jnp.ones((len(test_x),)), num=args.num_samples
        )
        logdet = gp.krylov_logdet_slq(
            args.num_matvecs,
            sample=sample,
            num_batches=1,
            checkpoint=True,
            matfun=matfun,
        )
        solve = solvers.pcg_adaptive(rtol=0.0, atol=1e-4, maxiter=10_000, miniter=10)
        likelihood, _ = gp.likelihood_pdf_p(
            gp.gram_matvec(),
            gp.logpdf_krylov_p(solve, logdet),
            precondition,
            constrain=constrain,
        )
        loss = gp.target_logml(prior, likelihood)
        val, _ = loss(
            test_x,
            test_y,
            key,
            params_mean=p1,
            params_kernel=p2,
            params_likelihood=p3,
        )
        return -val / len(test_x)

    @jax.jit
    def nll_exact():
        likelihood, _ = gp.likelihood_pdf(
            gp.gram_matvec(), gp.logpdf_cholesky(), constrain=constrain
        )
        loss = gp.target_logml(prior, likelihood)
        val, _ = loss(
            test_x,
            test_y,
            params_mean=p1,
            params_kernel=p2,
            params_likelihood=p3,
        )
        return -val / len(test_x)

    exact = float(nll_exact())
    print(f"exact Cholesky test NLL: {exact:.4f}")

    for label, matfun in [("log_clipped", log_clipped()), ("plain log", jnp.log)]:
        fn = jax.jit(lambda key, _m=matfun: nll_slq(_m, key))
        vals = []
        for i in range(args.num_eval_keys):
            vals.append(float(fn(jax.random.PRNGKey(100 + i))))
        vals = np.asarray(vals)
        print(
            f"SLQ ({label:>11}) NLL: {vals.mean():.4f} +/- {vals.std():.4f} "
            f"(bias vs exact {vals.mean() - exact:+.4f})"
        )
