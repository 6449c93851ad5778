"""Stochastic Lanczos quadrature log-determinants.

Parity with reference ``gp_util.py:552-621`` (``krylov_logdet_slq`` and
``krylov_logdet_slq_vjp_reuse``): Hutchinson over SLQ integrands with
sequential key batches, remat flags, and std diagnostics in the info
dict.
"""

from typing import Callable

import jax
import jax.numpy as jnp

from lanczos_adjoints_tpu.krylov import lanczos
from lanczos_adjoints_tpu.trace.hutchinson import hutchinson as _hutchinson


def log_clipped(*, clip_value: float = 1.0) -> Callable:
    """log with tiny/negative Ritz values clipped (f32 SLQ robustness).

    Negative Ritz values appear when the operator is numerically
    singular at f32; plain log turns the whole estimate into NaN.
    """

    def log(x):
        eps = jnp.finfo(x.dtype).eps
        return jnp.log(jnp.where(x < eps, clip_value, x))

    return log


def krylov_logdet_slq(
    krylov_depth: int,
    /,
    *,
    sample: Callable,
    num_batches: int,
    checkpoint: bool,
    matfun: Callable = jnp.log,
    blocked: bool = False,
    probe_sharding=None,
) -> Callable:
    """SLQ estimator of ``logdet(A)`` differentiable via Lanczos adjoints.

    ``matfun`` defaults to plain ``jnp.log`` (reference behaviour); pass
    ``log_clipped()`` for NaN-robust training on near-singular spectra.

    ``probe_sharding`` (a ``jax.sharding.Sharding`` over the leading
    probe axis) shards the Hutchinson probe batch across a device mesh:
    the per-probe Lanczos recurrences become the data-parallel axis and
    the probe mean compiles to one psum.  Only meaningful for the
    per-probe (``blocked=False``) mode -- the blocked mode exists to
    amortise kernel evaluations across probes *within* a device, so its
    probes stay local.

    ``blocked=True`` runs all probes' Lanczos recurrences together with
    ONE multi-RHS operator application per step
    (``krylov.lanczos.tridiag_block``): with the fused Gram matvec, each
    kernel tile is evaluated once and contracted against every probe on
    the MXU instead of once per probe.  Requires a matvec that accepts
    ``(n, m)`` blocks (all gram policies do; DIA/BSR operators do not).
    Recurrences re-orthogonalise per probe (blocked Gram-Schmidt),
    matching ``integrand_spd``'s default semantics.
    """

    def logdet(matvec: Callable, /, key):
        if blocked:
            integrand_b = lanczos.integrand_spd_block(matfun, krylov_depth, matvec)

            def estimate(k):
                samples = sample(k)
                flat = jax.vmap(
                    lambda s: jax.flatten_util.ravel_pytree(s)[0]
                )(samples)
                return jnp.mean(integrand_b(flat.T))

        else:
            integrand = lanczos.integrand_spd(matfun, krylov_depth, matvec)
            estimate = _hutchinson(
                integrand, sample, probe_sharding=probe_sharding
            )

        if num_batches == 1:
            value = estimate(key)
            return value, {"std_abs": 0.0, "std_rel": 0.0}

        if checkpoint:
            estimate = jax.checkpoint(estimate)

        keys = jax.random.split(key, num=num_batches)
        values = jax.lax.map(estimate, keys)
        mean = jnp.mean(values, axis=0)
        std = jnp.std(values, axis=0)
        return mean, {"std_abs": std, "std_rel": std / jnp.abs(mean)}

    return logdet


def krylov_logdet_slq_vjp_reuse(
    krylov_depth: int, /, *, sample: Callable, num_batches: int, checkpoint: bool
) -> Callable:
    """SLQ logdet with the cheap decomposition-reusing (inexact) VJP.

    Recycles the forward Lanczos decomposition for the gradient (one
    extra matvec-VJP) instead of running the exact adjoint pass --
    Dong et al., NeurIPS 2017 style.  See reference gp_util.py:579-621.
    """

    def logdet(matvec: Callable, /, key):
        integrand = lanczos.integrand_spd_custom_vjp_reuse(
            jnp.log, krylov_depth, matvec
        )
        estimate = _hutchinson(integrand, sample)

        if checkpoint:
            estimate = jax.checkpoint(estimate)

        keys = jax.random.split(key, num=num_batches)
        values = jax.lax.map(estimate, keys)
        mean = jnp.mean(values, axis=0)
        std = jnp.std(values, axis=0)
        return mean, {"std": std}

    return logdet
