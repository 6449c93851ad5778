"""PDE toolkit: stencils, boundaries, solvers, Arnoldi expm."""

import jax
import jax.numpy as jnp
import pytest

from lanczos_adjoints_tpu.models import pde


def test_mesh_and_stencil_shapes():
    x = jnp.linspace(0.0, 1.0, 8)
    mesh = pde.mesh_tensorproduct(x, x)
    assert mesh.shape == (2, 8, 8)
    assert pde.stencil_laplacian(0.1).shape == (3, 3)
    assert pde.stencil_advection_diffusion(0.1).shape == (3, 3)


def test_conv_matches_scipy_signal():
    stencil = pde.stencil_laplacian(0.5)
    x = jax.random.normal(jax.random.PRNGKey(0), (10, 10))
    expected = jax.scipy.signal.convolve2d(stencil, x, mode="valid")
    got = pde._conv2d_valid(stencil, x)
    assert jnp.allclose(got, expected, atol=1e-4, rtol=1e-4)


def test_boundaries():
    x = jnp.ones((4, 4))
    padded_d = pde.boundary_dirichlet()(x)
    padded_n = pde.boundary_neumann()(x)
    assert padded_d.shape == (6, 6)
    assert jnp.allclose(padded_d[0], 0.0)
    assert jnp.allclose(padded_n[0, 1:-1], 1.0)


def test_wave_rhs_shape_and_structure():
    n = 16
    xs = jnp.linspace(0.0, 1.0, n)
    mesh = pde.mesh_tensorproduct(xs, xs)
    stencil = pde.stencil_laplacian(xs[1] - xs[0])
    parametrize, params_like = pde.pde_wave_anisotropic(
        mesh[0], stencil, constrain=jnp.square, boundary=pde.boundary_dirichlet()
    )
    rhs = parametrize(scale=jnp.ones_like(mesh[0]))

    u = jnp.sin(jnp.pi * mesh[0]) * jnp.sin(jnp.pi * mesh[1])
    du = jnp.zeros_like(u)
    out = rhs(jnp.stack([u, du]))
    assert out.shape == (2, n, n)
    # First component of the first-order system is the velocity.
    assert jnp.allclose(out[0], du)


def test_euler_solver_exponential_decay():
    ts = jnp.linspace(0.0, 1.0, 200)
    solve = pde.solver_euler(ts, lambda y, rate: rate * y)
    y1, info = solve(jnp.ones(3), -1.0)
    assert jnp.allclose(y1, jnp.exp(-1.0), atol=1e-2)
    assert info["num_matvecs"] == 199


def test_expm_arnoldi_matches_dense_expm():
    n = 30
    key = jax.random.PRNGKey(0)
    A = jax.random.normal(key, (n, n)) / jnp.sqrt(n)
    y0 = jax.random.normal(jax.random.PRNGKey(1), (n,))

    solve_krylov = pde.solver_expm(0.0, 1.0, lambda y, p: p @ y, pde.expm_arnoldi(20))
    solve_dense = pde.solver_expm(0.0, 1.0, lambda y, p: p @ y, pde.expm_pade())

    y_krylov, info = solve_krylov(y0, A)
    y_dense, _ = solve_dense(y0, A)
    assert info["num_matvecs"] == 20
    assert jnp.allclose(y_krylov, y_dense, atol=1e-3, rtol=1e-3)


def test_expm_arnoldi_gradient_matches_dense():
    n = 16
    key = jax.random.PRNGKey(0)
    A = jax.random.normal(key, (n, n)) / jnp.sqrt(n)
    y0 = jax.random.normal(jax.random.PRNGKey(1), (n,))

    def loss_krylov(A):
        solve = pde.solver_expm(0.0, 1.0, lambda y, p: p @ y, pde.expm_arnoldi(n))
        y1, _ = solve(y0, A)
        return jnp.sum(y1**2)

    def loss_dense(A):
        return jnp.sum((jax.scipy.linalg.expm(A) @ y0) ** 2)

    g_krylov = jax.grad(loss_krylov)(A)
    g_dense = jax.grad(loss_dense)(A)
    assert jnp.allclose(g_krylov, g_dense, atol=1e-2, rtol=1e-2)


def test_solver_diffrax_gated():
    with pytest.raises(ImportError, match="diffrax"):
        pde.solver_diffrax(0.0, 1.0, lambda y, p: y, num_steps=2, method="tsit5",
                           adjoint="direct")


def test_mlp_over_mesh():
    xs = jnp.linspace(0.0, 1.0, 8)
    mesh = pde.mesh_tensorproduct(xs, xs)
    init, apply = pde.model_mlp(
        mesh, (16, 1), activation=jnp.tanh, output_scale_raw=-1.0
    )
    params, unflatten = init(jax.random.PRNGKey(0))
    out = apply(unflatten(params), mesh)
    assert out.shape == (8, 8)


def test_grf_sampler_lanczos():
    n = 32
    idx = jnp.arange(n)
    cov = jnp.exp(-0.1 * (idx[:, None] - idx[None, :]) ** 2) + 0.01 * jnp.eye(n)

    sample = pde.sampler_lanczos(
        mean=jnp.zeros(n), cov_matvec=lambda v: cov @ v, num=500, lanczos_rank=20
    )
    draws = sample(jax.random.PRNGKey(0))
    assert draws.shape == (500, n)
    emp_cov = draws.T @ draws / 500
    # Statistical agreement of the covariance structure.
    assert jnp.linalg.norm(emp_cov - cov) / jnp.linalg.norm(cov) < 0.35
