"""Wave/heat PDE toolkit with Arnoldi matrix exponentials.

Capability parity with reference ``src/matfree_extensions/util/pde_util.py``:
tensor-product meshes and stencils (pde_util.py:14-28), initial
conditions (pde_util.py:31-67), parametrised heat/wave right-hand sides
(pde_util.py:74-143), boundary paddings (pde_util.py:146-157), MSE
losses (pde_util.py:160-173), solvers (Euler scan pde_util.py:177,
diffrax-backed pde_util.py:193 -- gated on diffrax availability, absent
in this environment -- and the Arnoldi matrix exponential
pde_util.py:240-268), a Pade dense reference (pde_util.py:271), a
mesh MLP (pde_util.py:282), and the Lanczos Gaussian-random-field
sampler (pde_util.py:335).

TPU notes: the stencil RHS is expressed as a depthwise conv
(``lax.conv_general_dilated``) so XLA maps it onto the convolution path;
``expm_arnoldi`` keeps the Krylov loop on-device and only the
``krylov_depth x krylov_depth`` dense ``expm`` runs in XLA's small-matrix
path.
"""

import functools
from typing import Callable, Sequence

import jax
import jax.numpy as jnp

from lanczos_adjoints_tpu.krylov import arnoldi, lanczos
from lanczos_adjoints_tpu.utils.precision import highest_precision


def mesh_tensorproduct(x, y, /):
    return jnp.stack(jnp.meshgrid(x, y))


def stencil_laplacian(dx):
    """Standard 5-point 2-D Laplacian stencil.

    Deliberate divergence from the reference (pde_util.py:19), whose
    stencil has a ``-2`` centre: convolving that adds a spurious
    ``+2 u / dx^2`` zeroth-order term, giving the "wave" equation real
    positive eigenvalues (solutions grow like exp(sqrt(2) c t / dx))
    instead of a purely oscillatory spectrum.  The ``-4`` centre is the
    actual discrete Laplacian.
    """
    stencil = jnp.asarray([[0.0, 1.0, 0.0], [1.0, -4.0, 1.0], [0.0, 1.0, 0.0]])
    return stencil / dx**2


def stencil_laplacian_reference(dx):
    """The reference's (-2)-centred stencil, kept for parity experiments."""
    stencil = jnp.asarray([[0.0, 1.0, 0.0], [1.0, -2.0, 1.0], [0.0, 1.0, 0.0]])
    return stencil / dx**2


def stencil_advection_diffusion(dx):
    diffusion = jnp.asarray([[0.0, 1.0, 0.0], [1.0, -4.0, 1.0], [0.0, 1.0, 0.0]])
    advection = jnp.asarray([[0.0, 1.0, 0.0], [1.0, 0.0, -1.0], [0.0, -1.0, 0.0]])
    return diffusion / dx**2 + advection / (2 * dx)


def _conv2d_valid(stencil, x):
    """2-D valid cross-correlation-as-convolution on the conv path.

    Equivalent to ``jax.scipy.signal.convolve2d(stencil, x, mode="valid")``
    for the (flip-symmetric) stencils used here, but lowered through
    ``lax.conv_general_dilated`` which XLA maps to the TPU convolution
    units instead of an im2col gather.
    """
    kernel = jnp.flip(stencil)[None, None, :, :]
    out = jax.lax.conv_general_dilated(
        x[None, None, :, :],
        kernel.astype(x.dtype),
        window_strides=(1, 1),
        padding="VALID",
    )
    return out[0, 0]


# ---------------------------------------------------------------------------
# Initial conditions
# ---------------------------------------------------------------------------


def pde_init_bell(c, /):
    def parametrize(*, center_logits):
        center = jax.nn.sigmoid(center_logits)

        def fun(x, /):
            assert x.ndim == 3 and x.shape[0] == 2, jnp.shape(x)
            diff = x - center[:, None, None]

            def bell(d):
                return jnp.exp(-(c**2) * jnp.dot(d, d))

            bell = jax.vmap(bell, in_axes=-1, out_axes=-1)
            bell = jax.vmap(bell, in_axes=-1, out_axes=-1)
            return bell(diff)

        return fun

    return parametrize, {"center_logits": jnp.empty((2,))}


def pde_init_sine():
    def parametrize(*, scale_sin, scale_cos):
        def fun(x, /):
            assert x.ndim == 3 and x.shape[0] == 2, jnp.shape(x)
            return jnp.sin(scale_sin * x[0]) * jnp.cos(scale_cos * x[1])

        return fun

    return parametrize, {"scale_sin": 5.0, "scale_cos": 3.0}


# ---------------------------------------------------------------------------
# Right-hand sides
# ---------------------------------------------------------------------------


def pde_heat(c: float, /, stencil, *, boundary: Callable):
    def parametrize():
        def rhs(x, /):
            assert x.ndim == 2 and x.shape[0] == x.shape[-1], jnp.shape(x)
            return c * _conv2d_valid(stencil, boundary(x))

        return rhs

    return parametrize, {}


def pde_heat_affine(c: float, drift_like, /, stencil, *, boundary: Callable):
    def parametrize(*, drift):
        def rhs(x, /):
            assert x.ndim == 2 and x.shape[0] == x.shape[-1], jnp.shape(x)
            return c * _conv2d_valid(stencil, boundary(x)) + drift

        return rhs

    return parametrize, {"drift": jnp.empty_like(drift_like)}


def pde_heat_anisotropic(scale_like, /, stencil, *, constrain, boundary: Callable):
    def parametrize(*, scale):
        scale_constrained = constrain(scale)

        def rhs(x, /):
            assert x.ndim == 3 and x.shape[0] == 2, jnp.shape(x)
            assert x.shape[1] == x.shape[2], jnp.shape(x)
            u, du = x
            u_new = -_conv2d_valid(stencil, boundary(u)) * scale_constrained
            return jnp.stack([u_new, du])

        return rhs

    return parametrize, {"scale": jnp.empty_like(scale_like)}


def pde_wave_anisotropic(scale_like, /, stencil, *, constrain, boundary: Callable):
    """Second-order wave equation as the first-order system [u', c Lap u]."""

    def parametrize(*, scale):
        scale_constrained = constrain(scale)

        def rhs(x, /):
            assert x.ndim == 3 and x.shape[0] == 2, jnp.shape(x)
            assert x.shape[1] == x.shape[2], jnp.shape(x)
            u, du = x
            u_new = _conv2d_valid(stencil, boundary(u)) * scale_constrained
            return jnp.stack([du, u_new])

        return rhs

    return parametrize, {"scale": jnp.empty_like(scale_like)}


def boundary_dirichlet():
    return lambda x: jnp.pad(x, 1, mode="constant", constant_values=0.0)


def boundary_neumann():
    return lambda x: jnp.pad(x, 1, mode="edge")


# ---------------------------------------------------------------------------
# Losses
# ---------------------------------------------------------------------------


def loss_mse():
    def loss(sol, /, *, targets):
        return jnp.mean((sol - targets) ** 2)

    return loss


def loss_mse_relative(*, nugget, reduce=jnp.mean):
    def loss(sol, /, *, targets):
        mse_abs = (sol - targets) ** 2
        return reduce(mse_abs / (nugget + jnp.abs(targets)))

    return loss


# ---------------------------------------------------------------------------
# Solvers
# ---------------------------------------------------------------------------


def solver_euler(ts, vector_field, /):
    """Hand-rolled explicit Euler over a lax.scan."""

    def solve(y0, *p):
        t0, dts = ts[0], jnp.diff(ts)

        def step(t_and_y, dt):
            t, y = t_and_y
            y = y + dt * vector_field(y, *p)
            return (t + dt, y), None

        (_t1, y1), _ = jax.lax.scan(step, (t0, y0), xs=dts)
        return y1, {"num_matvecs": len(ts) - 1}

    return solve


def solver_diffrax(t0, t1, vector_field, /, *, num_steps, method, adjoint):
    """Diffrax-backed solver; raises a clear error when diffrax is absent."""
    try:
        import diffrax
    except ImportError as err:
        msg = (
            "solver_diffrax requires the optional 'diffrax' dependency, "
            "which is not installed in this environment. Use solver_euler "
            "or solver_expm(expm_arnoldi(...)) instead."
        )
        raise ImportError(msg) from err

    @diffrax.ODETerm
    def term(t, y, args):  # noqa: ARG001
        return vector_field(y, args)

    solver = {
        "dopri8": diffrax.Dopri8(),
        "dopri5": diffrax.Dopri5(),
        "tsit5": diffrax.Tsit5(),
        "euler": diffrax.Euler(),
        "heun": diffrax.Heun(),
    }[method]
    backprop = {
        "recursive_checkpoint": diffrax.RecursiveCheckpointAdjoint(),
        "direct": diffrax.DirectAdjoint(),
        "backsolve": diffrax.BacksolveAdjoint(),
    }[adjoint]

    dt0 = (t1 - t0) / num_steps

    def solve(y0, p):
        sol = diffrax.diffeqsolve(
            term,
            solver,
            args=p,
            t0=t0,
            t1=t1,
            dt0=dt0,
            y0=y0,
            stepsize_controller=diffrax.ConstantStepSize(),
            adjoint=backprop,
        )
        num_matvecs = sol.stats["num_steps"] * solver.order(term)
        return sol.ys[-1], {"num_matvecs": num_matvecs}

    return solve


def solver_expm(t0, t1, vector_field, /, expm):
    """One-shot matrix-exponential solver ``y1 = exp((t1-t0) A) y0``."""

    def solve(y0, *p):
        y0_flat, unflatten = jax.flatten_util.ravel_pytree(y0)

        def matvec_p(v, p_):
            av = vector_field(unflatten(v), *p_)
            return jax.flatten_util.ravel_pytree(av)[0]

        value, info = expm(matvec_p, t1 - t0, y0_flat, p)
        return unflatten(value), info

    return solve


def expm_arnoldi(krylov_depth, *, max_squarings=32, reortho="full", custom_vjp=True):
    """Krylov matrix exponential: exp(dt A) y0 ~ (1/c) Q expm(dt H) e1.

    Differentiable through the Arnoldi adjoint; krylov_depth matvecs per
    evaluation.
    """

    @highest_precision
    def expm(matvec, dt, y0_flat, *p):
        algorithm = arnoldi.hessenberg(
            matvec, krylov_depth, reortho=reortho, custom_vjp=custom_vjp
        )
        Q, H, _res, c = algorithm(y0_flat, *p)
        e1 = jnp.eye(krylov_depth, dtype=H.dtype)[0]
        expmat = jax.scipy.linalg.expm(dt * H, max_squarings=max_squarings)
        return (1.0 / c) * Q @ (expmat @ e1), {"num_matvecs": krylov_depth}

    return expm


def expm_pade():
    """Dense reference: materialise A and use Pade expm."""

    def expm(matvec, dt, y0_flat, *p):
        matrix = jax.jacfwd(lambda v: matvec(v, *p))(y0_flat)
        return jax.scipy.linalg.expm(dt * matrix) @ y0_flat, {}

    return expm


# ---------------------------------------------------------------------------
# MLP over the mesh
# ---------------------------------------------------------------------------


def model_mlp(mesh_like, features, /, activation: Callable, *, output_scale_raw):
    """Flax MLP mapping mesh coordinates to a scalar field."""
    import flax.linen

    assert features[-1] == 1

    class MLP(flax.linen.Module):
        features: Sequence[int]

        @flax.linen.compact
        def __call__(self, x):
            for feat in self.features[:-1]:
                x = flax.linen.Dense(feat)(x)
                x = activation(x)
            return flax.linen.Dense(self.features[-1])(x)

    assert mesh_like.ndim == 3
    coords_like = mesh_like.reshape((2, -1)).T
    model = MLP(features)

    def init(key):
        variables = model.init(key, coords_like)
        return jax.flatten_util.ravel_pytree(variables)

    output_scale = jax.nn.softplus(output_scale_raw)

    def apply(params, args):
        coords = args.reshape((2, -1)).T
        fx = model.apply(params, coords).reshape((-1,)) * output_scale
        return fx.reshape(args[0].shape)

    return init, apply


# ---------------------------------------------------------------------------
# GRF sampler
# ---------------------------------------------------------------------------


def sampler_lanczos(*, mean, cov_matvec, num, lanczos_rank):
    """Gaussian-random-field sampler: x = mean + C^(1/2) eps via Lanczos."""

    def sample(key):
        factorise = lanczos.tridiag(cov_matvec, lanczos_rank, reortho="full")
        eps = jax.random.normal(key, (num, *mean.shape))
        sample_one = functools.partial(_sample_single, factorise=factorise)
        return jax.vmap(sample_one)(eps) + mean[None, ...]

    @highest_precision
    def _sample_single(eps, *, factorise):
        norm = jnp.linalg.norm(eps)
        eps = eps / norm

        (Q, tridiag_), _ = factorise(eps)
        K = _dense_tridiag(*tridiag_)
        w, V = jnp.linalg.eigh(K)
        w = jnp.maximum(0.0, w)
        factor = (V * jnp.sqrt(w[..., None, :])) @ V.T
        return norm * Q.T @ (factor @ (Q @ eps))

    return sample


def _dense_tridiag(diagonal, off_diagonal):
    return (
        jnp.diag(diagonal) + jnp.diag(off_diagonal, 1) + jnp.diag(off_diagonal, -1)
    )
