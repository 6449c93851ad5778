"""Scaling of the row-partitioned Lanczos+adjoint across a device mesh.

NEW scope beyond the reference (BASELINE config 5): run the Lanczos
fwd+adjoint VJP over a row-partitioned DIA operator (ring halo exchange
via ppermute) on meshes of 1..P devices and report scaling efficiency.

On real multi-chip hardware run as-is; on a single-chip or CPU host set
``--force_cpu_devices P`` to validate correctness on a virtual mesh.
Virtual-mesh timings measure HOST-EMULATION overhead, not scaling --
the artifact marks them ``virtual_mesh: true`` and additionally records
an analytical communication model (halo bytes + scalar-psum latencies
per Lanczos step vs. local work) with stated ICI assumptions, which is
the honest single-chip statement about multi-chip efficiency.
"""

import argparse
import functools
import json
import os
import time

import numpy as np


def main(args):
    import jax
    import jax.numpy as jnp

    from lanczos_adjoints_tpu import krylov, parallel
    from lanczos_adjoints_tpu.ops import sparse

    n = args.num_rows
    idx = np.arange(n)
    offsets = [-args.bandwidth, -1, 0, 1, args.bandwidth]
    rows, cols, vals = [], [], []
    for d in offsets:
        lo, hi = max(0, -d), min(n, n - d)
        rows.append(idx[lo:hi])
        cols.append(idx[lo:hi] + d)
        vals.append((4.0 if d == 0 else -1.0) * np.ones(hi - lo))
    mat = sparse.csr_from_coo(
        np.concatenate(rows), np.concatenate(cols), np.concatenate(vals), shape=(n, n)
    )
    dia = sparse.dia_pack(mat)
    values = sparse.dia_values(dia, mat.data).astype(jnp.float32)
    print(f"operator: n={n} nnz={mat.nnz} diagonals={len(dia.offsets)}")

    results = []
    max_dev = len(jax.devices())
    sizes = [p for p in [1, 2, 4, 8, 16] if p <= max_dev]
    base_time = None
    for p in sizes:
        mesh = parallel.device_mesh(p)
        matvec = parallel.sharded_dia_operator(dia, mesh)
        vals_sharded = parallel.shard_rows(values, mesh, dim=1)
        factorise = krylov.tridiag(
            lambda v, vals: matvec(v, vals), args.depth, reortho="none"
        )
        v0 = parallel.shard_rows(jnp.ones((n,), jnp.float32), mesh)

        def one_vjp(v, vals):
            out, vjp = jax.vjp(factorise, v, vals)
            flat, unflatten = jax.flatten_util.ravel_pytree(out)
            dv, _dvals = vjp(unflatten(jnp.ones_like(flat)))
            return jnp.sum(dv), dv

        def repeated(v, vals, reps):
            def body(_i, carry):
                v, acc = carry
                contribution, dv = one_vjp(v, vals)
                return v + 1e-12 * dv, acc + contribution

            _v, acc = jax.lax.fori_loop(0, reps, body, (v, 0.0))
            return acc

        fn_many = jax.jit(functools.partial(repeated, reps=args.reps))
        fn_one = jax.jit(functools.partial(repeated, reps=1))
        np.asarray(fn_many(v0, vals_sharded))
        np.asarray(fn_one(v0, vals_sharded))
        t_many, t_one = [], []
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(fn_many(v0, vals_sharded))
            t_many.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            np.asarray(fn_one(v0, vals_sharded))
            t_one.append(time.perf_counter() - t0)
        t = (float(np.median(t_many)) - float(np.median(t_one))) / (args.reps - 1)
        if base_time is None:
            base_time = t
        eff = base_time / (t * p)
        print(
            f"devices={p}: {t * 1e3:.2f} ms/VJP  scaling efficiency {eff:.2f}"
        )
        results.append({"devices": p, "time_s": t, "efficiency": eff})

    # Analytical ICI communication model (see module docstring).  Per
    # Lanczos fwd+adjoint step and device: one ring halo exchange of
    # the operator bandwidth in each direction (fwd matvec) plus one in
    # the adjoint, and ~4 scalar psum latencies (alpha/beta and their
    # adjoint reductions).  Local work scales 1/P; a virtual CPU mesh
    # cannot measure any of this, so the model is recorded instead.
    ici_bw = 9e10  # bytes/s effective per direction, v5e ICI (order)
    ici_latency = 2e-6  # seconds per scalar collective (order)
    halo_bytes = 2 * 2 * args.bandwidth * 4  # both directions, fwd+adj
    # On a virtual CPU mesh the measured step time wildly overstates a
    # TPU's local work; pass --model_local_step_s with the real-chip
    # per-step time (e.g. the fused n=1M K=90 pipeline: 8e-5 s/step).
    t_step_local_1 = args.model_local_step_s or base_time / args.depth
    model = []
    for p in [2, 4, 8, 16, 32]:
        t_local = t_step_local_1 / p
        t_comm = halo_bytes / ici_bw + 4 * ici_latency
        model.append(
            {
                "devices": p,
                "predicted_efficiency": t_local / (t_local + t_comm),
            }
        )
    artifact = {
        "virtual_mesh": args.force_cpu_devices > 0
        or jax.default_backend() == "cpu",
        "platform": jax.default_backend(),
        "caveat": (
            "Measured times on a virtual (forced host) mesh reflect "
            "host-emulation overhead, NOT multi-chip scaling; see "
            "comm_model for the analytical ICI statement."
        )
        if args.force_cpu_devices
        else "measured on real devices",
        "measured": results,
        "comm_model": {
            "assumptions": {
                "ici_bytes_per_s_per_direction": ici_bw,
                "ici_scalar_collective_latency_s": ici_latency,
                "halo_bytes_per_step_per_device": halo_bytes,
                "scalar_psums_per_step": 4,
                "local_step_time_1dev_s": t_step_local_1,
            },
            "predicted": model,
        },
    }

    from lanczos_adjoints_tpu.utils import exp_util

    directory = exp_util.matching_directory(__file__, "results/")
    os.makedirs(directory, exist_ok=True)
    with open(f"{directory}scaling.json", "w") as fp:
        json.dump(artifact, fp, indent=2)


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--num_rows", type=int, default=1 << 20)
    parser.add_argument("--bandwidth", type=int, default=1024)
    parser.add_argument("--depth", type=int, default=30)
    parser.add_argument("--reps", type=int, default=4)
    parser.add_argument("--force_cpu_devices", type=int, default=0)
    parser.add_argument("--model_local_step_s", type=float, default=0.0)
    args = parser.parse_args()
    print(args)

    if args.force_cpu_devices:
        import os as _os

        _os.environ["XLA_FLAGS"] = (
            _os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.force_cpu_devices}"
        )
        import jax

        jax.config.update("jax_platforms", "cpu")

    main(args)
