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
    parser.add_argument(
        "--data_dims", type=int, nargs="*", default=[],
        help="sweep input dimensions at fixed N=data_sizes[-1] "
             "(reference benchmark_dim_toy.py analog)",
    )
    parser.add_argument("--num_partitions", type=int, default=16)
    parser.add_argument(
        "--datasets", type=str, nargs="*", default=[],
        help="also benchmark on bundled UCI datasets (reference "
             "benchmark_datasets.py analog)",
    )
    args = parser.parse_args()
    print(args)

    from lanczos_adjoints_tpu.utils import uci as uci_module

    cases = [("synthetic", n, args.data_dim, None) for n in args.data_sizes]
    cases += [
        (f"synthetic_d{d}", args.data_sizes[-1], d, None) for d in args.data_dims
    ]
    for name in args.datasets:
        X, _y = getattr(uci_module, f"uci_{name}")(normalize=True)
        cases.append((name, len(X), X.shape[1], jnp.asarray(X, jnp.float32)))

    results = []
    for label, n, dim, data in cases:
        key = jax.random.PRNGKey(0)
        if data is None:
            x = jax.random.normal(key, (n, dim), dtype=jnp.float32)
        else:
            x = data
        v = jax.random.normal(key, (n,), dtype=jnp.float32)

        policies = {"vmap": gp.gram_matvec()}
        if n % args.num_partitions == 0:
            policies[f"partitioned({args.num_partitions})"] = (
                gp.gram_matvec_partitioned(args.num_partitions, checkpoint=False)
            )
        kernel_case, _ = gp.kernel_scaled_rbf(shape_in=(x.shape[1],), shape_out=())
        kern = kernel_case(
            raw_lengthscale=jnp.zeros((x.shape[1],)),
            raw_outputscale=jnp.zeros(()),
        )
        # Fused Pallas streaming kernel (same GPyTorch parametrisation:
        # softplus of the zero raw parameters).
        from lanczos_adjoints_tpu.ops import pallas_gram

        softplus0 = jnp.log(2.0)
        fused = pallas_gram.gram_matvec_fused("rbf")
        ell_val = jnp.full((x.shape[1],), softplus0, jnp.float32)

        def fused_mv(x_, y_, v_, _f=fused, _e=ell_val):
            return _f(x_, y_, v_, _e, softplus0)

        policies["fused_pallas"] = lambda _kern, _mv=fused_mv: _mv

        for name, policy in policies.items():
            try:
                t = time_matvec(policy(kern), x, v)
                gcells = n * n / t / 1e9
                print(
                    f"{label} N={n} {name}: {t * 1e3:.3f} ms "
                    f"({gcells:.1f} Gcells/s)"
                )
                results.append(
                    {"case": label, "n": n, "policy": name, "time_s": t}
                )
            except Exception as err:  # noqa: BLE001  (OOM at large N)
                print(f"{label} N={n} {name}: failed ({type(err).__name__})")

    directory = exp_util.matching_directory(__file__, "results/")
    os.makedirs(directory, exist_ok=True)
    with open(f"{directory}matvec_times.json", "w") as fp:
        json.dump(results, fp, indent=2)
