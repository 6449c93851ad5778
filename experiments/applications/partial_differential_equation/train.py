"""Train an MLP wave-speed field through the PDE solve.

TPU-native re-implementation of the reference train.py
(train.py:71-167): an MLP over the mesh parameterises the wave-speed
field; the loss back-propagates through the matrix-exponential solver
(Arnoldi with adjoints, or Euler), vmapped over the training pairs.
"""

import argparse
import os
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from lanczos_adjoints_tpu.models import pde
from lanczos_adjoints_tpu.utils import exp_util


def load_data(resolution, directory):
    prefix = f"{directory}{resolution}x{resolution}"
    inputs = jnp.asarray(np.load(f"{prefix}_data_inputs.npy"), jnp.float32)
    targets = jnp.asarray(np.load(f"{prefix}_data_targets.npy"), jnp.float32)
    return inputs, targets


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--resolution", type=int, default=128)
    parser.add_argument(
        "--method", type=str, default="arnoldi", choices=["arnoldi", "euler"]
    )
    parser.add_argument("--num_matvecs", type=int, default=10)
    parser.add_argument("--num_epochs", type=int, default=100)
    parser.add_argument("--seed", type=int, default=1)
    parser.add_argument("--learning_rate", type=float, default=1e-2)
    parser.add_argument(
        "--output_scale_raw", type=float, default=-5.0,
        help="raw (pre-softplus) output scale of the field MLP; must "
             "cover the wave-speed magnitude of the data",
    )
    parser.add_argument(
        "--steps_per_call", type=int, default=1,
        help="optimizer steps scanned inside one jit call; identical "
             "math, amortises per-call dispatch latency (this "
             "environment's relay costs ~30 ms per call)",
    )
    args = parser.parse_args()
    print(args)

    data_dir = exp_util.matching_directory(__file__, "data/")
    data_dir = data_dir.replace("/train/", "/make_data/")
    inputs, targets = load_data(args.resolution, data_dir)
    print("data:", inputs.shape, targets.shape)

    n = args.resolution
    xs_1d = jnp.linspace(0.0, 1.0, n)
    mesh = pde.mesh_tensorproduct(xs_1d, xs_1d)
    stencil = pde.stencil_laplacian(float(xs_1d[1] - xs_1d[0]))

    parametrize, _ = pde.pde_wave_anisotropic(
        mesh[0],
        stencil,
        constrain=lambda s: s**2,
        boundary=pde.boundary_dirichlet(),
    )

    if args.method == "arnoldi":
        expm = pde.expm_arnoldi(args.num_matvecs)
        solve = pde.solver_expm(
            0.0, 1.0, lambda y, scale: parametrize(scale=scale)(y), expm
        )
    else:
        ts = jnp.linspace(0.0, 1.0, args.num_matvecs + 1)
        solve = pde.solver_euler(ts, lambda y, scale: parametrize(scale=scale)(y))

    init, apply = pde.model_mlp(
        mesh, (500, 500, 1), activation=jnp.tanh,
        output_scale_raw=args.output_scale_raw,
    )
    params, unflatten = init(jax.random.PRNGKey(args.seed))
    loss_mse = pde.loss_mse_relative(nugget=1e-4)

    @jax.jit
    def loss_fn(params_flat):
        scale = apply(unflatten(params_flat), mesh)

        def run_one(y0, y1):
            sol, info = solve(y0, scale)
            return loss_mse(sol, targets=y1), info

        losses, infos = jax.vmap(run_one)(inputs, targets)
        return jnp.mean(losses), infos

    optimizer = optax.adam(args.learning_rate)
    state = optimizer.init(params)

    spc = max(1, args.steps_per_call)

    @jax.jit
    def run_chunk(params, state):
        def step(carry, _):
            params, state = carry
            (value, info), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            updates, state = optimizer.update(grads, state)
            params = optax.apply_updates(params, updates)
            num_mv = jnp.reshape(info["num_matvecs"], (-1,))[0]
            return (params, state), (value, num_mv)

        (params, state), (values, num_mvs) = jax.lax.scan(
            step, (params, state), xs=None, length=spc
        )
        return params, state, values, num_mvs

    convergence, timestamps, matvecs = [], [], []
    start = time.perf_counter()
    for chunk_start in range(0, args.num_epochs, spc):
        try:
            params, state, values, num_mvs = run_chunk(params, state)
            now = time.perf_counter() - start
            convergence.extend(float(v) for v in np.asarray(values))
            # Chunk-granular timestamps: each epoch in the chunk shares
            # the chunk-end wall-clock.
            timestamps.extend([now] * len(values))
            matvecs.extend(
                int(mv) * len(inputs) for mv in np.asarray(num_mvs)
            )
            print(
                f"epoch {chunk_start}: loss {float(values[-1]):.3e}", flush=True
            )
        except KeyboardInterrupt:
            break

    print(f"final loss {convergence[-1]:.3e} after {timestamps[-1]:.1f}s")
    directory = exp_util.matching_directory(__file__, "results/")
    os.makedirs(directory, exist_ok=True)
    label = (
        f"{args.resolution}x{args.resolution}_{args.method}_s{args.seed}"
    )
    np.save(f"{directory}{label}_convergence.npy", np.asarray(convergence))
    np.save(f"{directory}{label}_timestamps.npy", np.asarray(timestamps))
    np.save(f"{directory}{label}_matvecs.npy", np.asarray(matvecs))
    # Learned wave-speed field (constrained), for plot_solution.py.
    learned = np.asarray(apply(unflatten(params), mesh)) ** 2
    np.save(f"{directory}{label}_scale_field.npy", learned)
