"""Gram-matvec wall-time across execution policies and problem sizes.

TPU-native re-implementation of the reference KeOps benchmark
(``gram_matvec_versus_keops/matvec/benchmark.py:24-33,82-102``): median
wall-time of the RBF Gram matvec for the vmapped / partitioned /
sequential policies over N and d.  KeOps is CUDA-only; the recorded
V100 KeOps numbers in BASELINE.md are the comparison targets.

Timing protocol: iterates the matvec R times inside one jit (data
dependency between iterations) and reports the R-slope, which removes
the ~30 ms relay round-trip of this environment (see bench.py).
"""

import argparse
import functools
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from lanczos_adjoints_tpu.models import gp
from lanczos_adjoints_tpu.utils import exp_util


def time_matvec(matvec_fn, x, v, *, reps=8, outer=5):
    def repeated(v, reps):
        def body(_i, carry):
            v, acc = carry
            out = matvec_fn(x, x, v)
            return v + 1e-12 * out, acc + jnp.sum(out)

        _v, acc = jax.lax.fori_loop(0, reps, body, (v, 0.0))
        return acc

    fn_many = jax.jit(functools.partial(repeated, reps=reps))
    fn_one = jax.jit(functools.partial(repeated, reps=1))
    np.asarray(fn_many(v))
    np.asarray(fn_one(v))
    t_many, t_one = [], []
    for _ in range(outer):
        t0 = time.perf_counter()
        np.asarray(fn_many(v))
        t_many.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        np.asarray(fn_one(v))
        t_one.append(time.perf_counter() - t0)
    return (float(np.median(t_many)) - float(np.median(t_one))) / (reps - 1)


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--data_sizes", type=int, nargs="+",
                        default=[4096, 16384, 65536])
    parser.add_argument("--data_dim", type=int, default=1)
    parser.add_argument("--num_partitions", type=int, default=16)
    args = parser.parse_args()
    print(args)

    kernel_factory, _ = gp.kernel_scaled_rbf(
        shape_in=(args.data_dim,), shape_out=()
    )
    kernel = kernel_factory(
        raw_lengthscale=jnp.zeros((args.data_dim,)), raw_outputscale=jnp.zeros(())
    )

    results = []
    for n in args.data_sizes:
        key = jax.random.PRNGKey(0)
        x = jax.random.normal(key, (n, args.data_dim), dtype=jnp.float32)
        v = jax.random.normal(key, (n,), dtype=jnp.float32)

        policies = {"vmap": gp.gram_matvec()}
        if n % args.num_partitions == 0:
            policies[f"partitioned({args.num_partitions})"] = (
                gp.gram_matvec_partitioned(args.num_partitions, checkpoint=False)
            )
        for name, policy in policies.items():
            try:
                t = time_matvec(policy(kernel), x, v)
                gcells = n * n / t / 1e9
                print(f"N={n} {name}: {t * 1e3:.3f} ms ({gcells:.1f} Gcells/s)")
                results.append({"n": n, "policy": name, "time_s": t})
            except Exception as err:  # noqa: BLE001  (OOM at large N)
                print(f"N={n} {name}: failed ({type(err).__name__})")

    directory = exp_util.matching_directory(__file__, "results/")
    os.makedirs(directory, exist_ok=True)
    with open(f"{directory}matvec_times.json", "w") as fp:
        json.dump(results, fp, indent=2)
