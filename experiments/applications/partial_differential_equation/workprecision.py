"""Work-precision of value_and_grad of the matrix exponential.

TPU-native re-implementation of the reference workprecision.py
(workprecision.py:100-141): error of value_and_grad of the wave-PDE
matrix exponential vs number of matvecs, for the Arnoldi expm at
several Krylov depths and Euler/RK4 time steppers, against a
fine-stepped reference solution.  (The reference's diffrax method table
is unavailable here; Euler/RK4 play the explicit-integrator role.)
"""

import argparse
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from lanczos_adjoints_tpu.models import pde
from lanczos_adjoints_tpu.utils import exp_util


def rk4(num_steps, vector_field):
    ts = jnp.linspace(0.0, 1.0, num_steps + 1)

    def solve(y0, *p):
        def step(y, dt):
            k1 = vector_field(y, *p)
            k2 = vector_field(y + dt / 2 * k1, *p)
            k3 = vector_field(y + dt / 2 * k2, *p)
            k4 = vector_field(y + dt * k3, *p)
            return y + dt / 6 * (k1 + 2 * k2 + 2 * k3 + k4), None

        y1, _ = jax.lax.scan(step, y0, xs=jnp.diff(ts))
        return y1, {"num_matvecs": 4 * num_steps}

    return solve


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--resolution", type=int, default=64)
    parser.add_argument("--seed", type=int, default=1)
    parser.add_argument(
        "--x64",
        action="store_true",
        help="float64 on CPU: shows the convergence range below the f32"
        " floor (ROADMAP work-precision item; reference ran f32-GPU only)",
    )
    args = parser.parse_args()
    print(args)

    if args.x64:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)

    n = args.resolution
    xs_1d = jnp.linspace(0.0, 1.0, n)
    mesh = pde.mesh_tensorproduct(xs_1d, xs_1d)
    stencil = pde.stencil_laplacian(float(xs_1d[1] - xs_1d[0]))

    parametrize, _ = pde.pde_wave_anisotropic(
        mesh[0], stencil, constrain=jnp.square, boundary=pde.boundary_dirichlet()
    )
    init_bell, _ = pde.pde_init_bell(5.0)
    u0 = init_bell(center_logits=jnp.zeros(2))(mesh)
    y0 = jnp.stack([u0, jnp.zeros_like(u0)])
    # Keep t * spectral-radius modest so Krylov expm depths in the sweep
    # are meaningful (t*omega ~ 6 here).
    scale = 0.035 * jnp.ones((n, n))

    vf = lambda y, s: parametrize(scale=s)(y)  # noqa: E731

    def value_and_grad_of(solve):
        def loss(s):
            y1, info = solve(y0, s)
            return jnp.mean(y1[0] ** 2), info

        (value, info), grad = jax.jit(jax.value_and_grad(loss, has_aux=True))(scale)
        return float(value), np.asarray(grad), info

    # Reference: very fine RK4.
    v_ref, g_ref, _ = value_and_grad_of(rk4(512, vf))
    g_ref_norm = np.linalg.norm(g_ref)

    results = []
    depths = [4, 6, 8, 10, 14, 20] + ([26, 32] if args.x64 else [])
    for depth in depths:
        solve = pde.solver_expm(0.0, 1.0, vf, pde.expm_arnoldi(depth))
        v, g, info = value_and_grad_of(solve)
        err = float(np.linalg.norm(g - g_ref) / g_ref_norm)
        results.append({"method": "arnoldi", "num_matvecs": depth, "error": err})
        print(f"arnoldi depth {depth}: grad rel-err {err:.3e}")

    for steps in [8, 16, 32, 64]:
        v, g, info = value_and_grad_of(rk4(steps, vf))
        err = float(np.linalg.norm(g - g_ref) / g_ref_norm)
        results.append(
            {"method": "rk4", "num_matvecs": 4 * steps, "error": err}
        )
        print(f"rk4 steps {steps} ({4 * steps} matvecs): grad rel-err {err:.3e}")

    directory = exp_util.matching_directory(__file__, "results/")
    os.makedirs(directory, exist_ok=True)
    tag = "_x64" if args.x64 else ""
    with open(f"{directory}workprecision{tag}_s{args.seed}.json", "w") as fp:
        json.dump(results, fp, indent=2)
    print("saved", f"{directory}workprecision{tag}_s{args.seed}.json")
