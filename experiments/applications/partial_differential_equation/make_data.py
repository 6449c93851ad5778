"""Generate wave-equation training data from a GP random field.

TPU-native re-implementation of the reference's make_data.py: sample an
anisotropic wave-speed field and initial conditions from a Gaussian
random field via the Lanczos sampler (reference make_data.py:38-48),
then integrate the wave equation with a fine Euler scheme as ground
truth (the reference used diffrax dopri8; diffrax is unavailable here
and a 10x-oversampled RK4 is an equivalent reference solution).
"""

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from lanczos_adjoints_tpu.models import pde
from lanczos_adjoints_tpu.utils import exp_util


def solver_rk4(ts, vector_field, /):
    def solve(y0, *p):
        dts = jnp.diff(ts)

        def step(y, dt):
            k1 = vector_field(y, *p)
            k2 = vector_field(y + dt / 2 * k1, *p)
            k3 = vector_field(y + dt / 2 * k2, *p)
            k4 = vector_field(y + dt * k3, *p)
            return y + dt / 6 * (k1 + 2 * k2 + 2 * k3 + k4), None

        y1, _ = jax.lax.scan(step, y0, xs=dts)
        return y1

    return solve


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--resolution", type=int, default=128)
    parser.add_argument("--num_data", type=int, default=80)
    parser.add_argument("--seed", type=int, default=1)
    parser.add_argument("--num_steps", type=int, default=400)
    args = parser.parse_args()
    print(args)

    key = jax.random.PRNGKey(args.seed)
    n = args.resolution
    xs_1d = jnp.linspace(0.0, 1.0, n)
    mesh = pde.mesh_tensorproduct(xs_1d, xs_1d)
    dx = float(xs_1d[1] - xs_1d[0])
    stencil = pde.stencil_laplacian(dx)

    # GRF covariance over the mesh (RBF), sampled with Lanczos.
    coords = mesh.reshape(2, -1).T

    def cov_matvec(v):
        sq = ((coords[:, None, :] - coords[None, :, :]) ** 2).sum(-1)
        return (jnp.exp(-sq / 0.02) + 1e-4 * jnp.eye(len(coords))) @ v

    key, k1, k2 = jax.random.split(key, 3)
    sample_field = pde.sampler_lanczos(
        mean=jnp.zeros(n * n), cov_matvec=cov_matvec, num=1, lanczos_rank=30
    )
    # Tiny wave speeds, as in the reference (its GRF uses
    # raw_outputscale=-10 => field ~0.007): keeps t * spectral-radius
    # at O(1) so a depth-10 Krylov expm resolves the dynamics.
    scale_field = 0.007 * sample_field(k1)[0].reshape(n, n)

    parametrize, _ = pde.pde_wave_anisotropic(
        scale_field,
        stencil,
        constrain=lambda s: s**2,
        boundary=pde.boundary_dirichlet(),
    )
    rhs = parametrize(scale=scale_field)

    # Initial conditions: random bells.
    init_bell, _ = pde.pde_init_bell(10.0)
    keys = jax.random.split(k2, args.num_data)
    centers = jax.vmap(
        lambda k: jax.random.normal(k, (2,))
    )(keys)
    y0s = jax.vmap(lambda c: init_bell(center_logits=c)(mesh))(centers)
    y0s = jnp.stack([y0s, jnp.zeros_like(y0s)], axis=1)  # (num, 2, n, n)

    ts = jnp.linspace(0.0, 1.0, args.num_steps)
    solve = solver_rk4(ts, lambda y: rhs(y))
    y1s = jax.jit(jax.vmap(solve))(y0s)

    directory = exp_util.matching_directory(__file__, "data/")
    os.makedirs(directory, exist_ok=True)
    prefix = f"{directory}{n}x{n}"
    np.save(f"{prefix}_data_inputs.npy", np.asarray(y0s))
    np.save(f"{prefix}_data_targets.npy", np.asarray(y1s))
    np.save(f"{prefix}_data_parameter.npy", np.asarray(scale_field))
    print("saved:", prefix, y0s.shape, y1s.shape)
