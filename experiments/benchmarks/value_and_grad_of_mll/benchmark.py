"""Wall-time of value_and_grad of the full GP marginal likelihood.

TPU-native re-implementation of the reference benchmark
(``value_and_grad_of_mll/benchmark.py:23-77``), written against the
*current* library API (the reference script calls since-renamed
functions, SURVEY.md 2.3): times the MLL gradient across gram-matvec
policies and checkpointing flags.
"""

import argparse
import functools
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from lanczos_adjoints_tpu import solvers, trace
from lanczos_adjoints_tpu.models import gp
from lanczos_adjoints_tpu.utils import exp_util

if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--num_data", type=int, default=16384)
    parser.add_argument("--data_dim", type=int, default=4)
    parser.add_argument("--num_matvecs", type=int, default=10)
    parser.add_argument("--num_samples", type=int, default=2)
    parser.add_argument("--num_partitions", type=int, default=16)
    args = parser.parse_args()
    print(args)

    key = jax.random.PRNGKey(0)
    n = args.num_data
    x = jax.random.normal(key, (n, args.data_dim), dtype=jnp.float32)
    y = jnp.sin(x[:, 0])

    mean, _ = gp.mean_constant(shape_out=())
    kernel, _ = gp.kernel_scaled_matern_32(shape_in=(args.data_dim,), shape_out=())
    prior = gp.model_gp(mean, kernel)
    constrain = gp.constraint_greater_than(1e-4)

    sampler = trace.sampler_rademacher(jnp.ones((n,)), num=1)
    logdet = gp.krylov_logdet_slq(
        args.num_matvecs, sample=sampler, num_batches=args.num_samples,
        checkpoint=True,
    )
    solve = solvers.cg_fixed_step(args.num_matvecs)

    results = []
    policies = {
        "vmap": gp.gram_matvec(),
        f"partitioned({args.num_partitions})": gp.gram_matvec_partitioned(
            args.num_partitions, checkpoint=True
        ),
    }
    for name, gram in policies.items():
        likelihood, _ = gp.likelihood_pdf(
            gram, gp.logpdf_krylov(solve, logdet), constrain=constrain
        )
        mll = gp.target_logml(prior, likelihood)

        def loss(pk, key):
            value, _ = mll(
                x,
                y,
                key,
                params_mean={"constant_value": jnp.zeros(())},
                params_kernel=pk,
                params_likelihood={"raw_noise": jnp.zeros(())},
            )
            return -value

        pk0 = {
            "raw_lengthscale": jnp.zeros((args.data_dim,)),
            "raw_outputscale": jnp.zeros(()),
        }
        vag = jax.jit(jax.value_and_grad(loss))
        try:
            out = vag(pk0, jax.random.PRNGKey(1))
            jax.block_until_ready(out)
            ts = []
            for _ in range(5):
                t0 = time.perf_counter()
                v, g = vag(pk0, jax.random.PRNGKey(2))
                _ = float(v)
                ts.append(time.perf_counter() - t0)
            t = float(np.median(ts))
            print(f"{name}: {t * 1e3:.1f} ms per value_and_grad")
            results.append({"policy": name, "time_s": t, "n": n})
        except Exception as err:  # noqa: BLE001
            print(f"{name}: failed ({type(err).__name__})")

    directory = exp_util.matching_directory(__file__, "results/")
    os.makedirs(directory, exist_ok=True)
    with open(f"{directory}mll_times.json", "w") as fp:
        json.dump(results, fp, indent=2)
