"""Forward/adjoint/backprop wall-clock vs Krylov depth on sparse matrices.

TPU-native re-implementation of the reference suite_sparse benchmark
(``wall_times_vjp_through_lanczos_arnoldi/suite_sparse/benchmark.py:
98-143``): for K in a sweep, time (a) the forward decomposition, (b)
the custom-adjoint VJP, and (c) backprop-through-the-recurrence, for
Lanczos or Arnoldi over a sparse operator (bundled SuiteSparse .mtx or
a synthetic Laplacian).

Uses the on-device R-slope protocol (see bench.py) to cancel the relay
round-trip of this environment.
"""

import argparse
import functools
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from lanczos_adjoints_tpu import krylov
from lanczos_adjoints_tpu.ops import sparse
from lanczos_adjoints_tpu.utils import exp_util


def load_operator(which, path):
    if which == "laplacian_2d":
        m = 128
        n = m * m
        idx = np.arange(n)
        rows, cols, vals = [idx], [idx], [4.0 * np.ones(n)]
        i, j = idx // m, idx % m
        for di, dj in [(-1, 0), (1, 0), (0, -1), (0, 1)]:
            ni, nj = i + di, j + dj
            ok = (ni >= 0) & (ni < m) & (nj >= 0) & (nj < m)
            rows.append(idx[ok])
            cols.append((ni * m + nj)[ok])
            vals.append(-1.0 * np.ones(ok.sum()))
        return sparse.csr_from_coo(
            np.concatenate(rows),
            np.concatenate(cols),
            np.concatenate(vals),
            shape=(n, n),
        )
    return exp_util.suite_sparse_load(which, path=path)


def slope_time(make_one, v0, values, *, reps=6, outer=3, min_window=5e-3, max_reps=3072):
    """R-slope with auto-escalating reps (fast depths need a window that
    clears the relay jitter or the slope can come out negative)."""

    def repeated(v, vals, reps):
        def body(_i, carry):
            v, acc = carry
            contribution, feedback = make_one(v, vals)
            return v + 1e-12 * feedback, acc + contribution

        _v, acc = jax.lax.fori_loop(0, reps, body, (v, 0.0))
        return acc

    fn_one = jax.jit(functools.partial(repeated, reps=1))
    np.asarray(fn_one(v0, values))

    def measure(reps):
        fn_many = jax.jit(functools.partial(repeated, reps=reps))
        np.asarray(fn_many(v0, values))
        t_many, t_one = [], []
        for _ in range(outer):
            t0 = time.perf_counter()
            np.asarray(fn_many(v0, values))
            t_many.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            np.asarray(fn_one(v0, values))
            t_one.append(time.perf_counter() - t0)
        window = float(np.median(t_many)) - float(np.median(t_one))
        return window / (reps - 1), window

    per_iter, window = measure(reps)
    while window < min_window and reps < max_reps:
        reps = min(max_reps, reps * 8)
        per_iter, window = measure(reps)
    if window < min_window:
        print(
            f"WARNING: window {window * 1e3:.2f} ms below {min_window * 1e3:.0f} ms"
            f" at reps={reps}; slope unreliable"
        )
    return per_iter


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "--which", type=str, default="lanczos", choices=["lanczos", "arnoldi"]
    )
    parser.add_argument("--matrix", type=str, default="laplacian_2d")
    parser.add_argument("--matrix_path", type=str,
                        default="/root/reference/data/matrices/")
    parser.add_argument("--reortho", type=str, default="none")
    parser.add_argument("--depths", type=int, nargs="+",
                        default=[10, 30, 50, 90, 150, 250])
    parser.add_argument("--backprop_until", type=int, default=100)
    args = parser.parse_args()
    print(args)

    mat = load_operator(args.matrix, args.matrix_path)
    matvec, values, info = sparse.sparse_operator(mat, with_info=True)
    print(f"matrix {args.matrix}: n={mat.shape[0]} nnz={mat.nnz} fmt={info.format}")
    v0 = jnp.ones((mat.shape[0],), jnp.float32)

    dispatch_log = []

    def factorise_fn(depth, custom_vjp):
        if args.which == "lanczos":
            return krylov.tridiag(
                matvec, depth, reortho=args.reortho, custom_vjp=custom_vjp,
                dispatch_log=dispatch_log,
            )
        return krylov.hessenberg(
            matvec, depth, reortho=args.reortho, custom_vjp=custom_vjp,
            dispatch_log=dispatch_log,
        )

    times = {"fwdpass": [], "custom": [], "autodiff": []}
    for depth in args.depths:
        row = {"depth": depth}

        def fwd_one(v, vals, depth=depth):
            out = factorise_fn(depth, True)(v, vals)
            flat = jax.flatten_util.ravel_pytree(out)[0]
            return jnp.sum(flat), flat[: len(v)] * 0.0

        def vjp_one(v, vals, custom, depth=depth):
            f = factorise_fn(depth, custom)
            out, vjp = jax.vjp(f, v, vals)
            flat, unflatten = jax.flatten_util.ravel_pytree(out)
            dv, _dvals = vjp(unflatten(jnp.ones_like(flat)))
            return jnp.sum(dv), dv

        t_fwd = slope_time(fwd_one, v0, values)
        t_custom = slope_time(functools.partial(vjp_one, custom=True), v0, values)
        times["fwdpass"].append(t_fwd)
        times["custom"].append(t_custom)
        print(f"K={depth}: fwd {t_fwd * 1e3:.2f} ms, custom-vjp {t_custom * 1e3:.2f} ms",
              end="")
        if depth <= args.backprop_until:
            t_auto = slope_time(functools.partial(vjp_one, custom=False), v0, values)
            times["autodiff"].append(t_auto)
            print(f", autodiff {t_auto * 1e3:.2f} ms")
        else:
            print()

    directory = exp_util.matching_directory(__file__, "results/")
    os.makedirs(directory, exist_ok=True)
    tag = f"{args.which}_{args.matrix}_reortho_{args.reortho}"
    for name, vals_ in times.items():
        np.save(f"{directory}{tag}_times_{name}.npy", np.asarray(vals_))
    np.save(f"{directory}{tag}_depths.npy", np.asarray(args.depths))
    # Trace-time record of which code path each compilation actually ran
    # (asserts the fused-vs-XLA claim the RESULTS.md table makes).
    events = sorted(set(dispatch_log))
    print("dispatch events:", events)
    np.save(f"{directory}{tag}_dispatch.npy", np.asarray(events))
    print("saved to", directory)
