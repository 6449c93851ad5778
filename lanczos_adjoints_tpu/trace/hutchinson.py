"""Hutchinson-style stochastic estimators.

Standalone replacements for the ``matfree.hutchinson`` functions the
reference builds on (``hutchinson``, ``sampler_rademacher``,
``sampler_normal``) plus parity with the reference's own extensions
(``src/matfree_extensions/hutchinson.py``): stop-gradient-through-samples
(hutchinson.py:8), fresh-key-backward custom VJP (hutchinson.py:20), and
sequential batching (hutchinson.py:57).

The probe-vmap axis is the natural data-parallel axis on TPU: under
``jit`` with a sharded probe batch (see ``lanczos_adjoints_tpu.parallel``)
the mean-reduction compiles to one ``psum`` over the mesh.
"""

from typing import Callable

import jax
import jax.numpy as jnp


def sampler_rademacher(x_like, /, *, num: int) -> Callable:
    """Sample ``num`` Rademacher (+-1) probes shaped like ``x_like``."""
    flat, unflatten = jax.flatten_util.ravel_pytree(x_like)

    def sample(key):
        probes = jax.random.rademacher(key, (num, *flat.shape), dtype=flat.dtype)
        return jax.vmap(unflatten)(probes)

    return sample


def sampler_normal(x_like, /, *, num: int) -> Callable:
    """Sample ``num`` standard-normal probes shaped like ``x_like``."""
    flat, unflatten = jax.flatten_util.ravel_pytree(x_like)

    def sample(key):
        probes = jax.random.normal(key, (num, *flat.shape), dtype=flat.dtype)
        return jax.vmap(unflatten)(probes)

    return sample


def hutchinson(
    integrand_fun: Callable, /, sample_fun: Callable, *, probe_sharding=None
) -> Callable:
    """Monte-Carlo mean of ``integrand_fun`` over sampled probes.

    ``probe_sharding`` (a ``jax.sharding.Sharding`` over the leading
    probe axis) turns the probe vmap into the data-parallel axis of a
    device mesh: each device evaluates its probe shard and the final
    mean compiles to one ``psum``.
    """

    def estimate(key, *parameters):
        samples = sample_fun(key)
        if probe_sharding is not None:
            samples = jax.lax.with_sharding_constraint(samples, probe_sharding)
        values = jax.vmap(lambda v: integrand_fun(v, *parameters))(samples)
        return jax.tree_util.tree_map(lambda s: jnp.mean(s, axis=0), values)

    return estimate


def hutchinson_nograd(integrand_fun: Callable, /, sample_fun: Callable) -> Callable:
    """Hutchinson estimator with gradients stopped through the samples."""

    def estimate(key, *parameters):
        samples = jax.lax.stop_gradient(sample_fun(key))
        values = jax.vmap(lambda v: integrand_fun(v, *parameters))(samples)
        return jax.tree_util.tree_map(lambda s: jnp.mean(s, axis=0), values)

    return jax.jit(estimate)


def hutchinson_custom_vjp(integrand_fun: Callable, /, sample_fun: Callable) -> Callable:
    """Hutchinson estimator whose backward pass re-samples with a fresh key.

    The forward estimate and the gradient estimate are decorrelated; the
    gradient is still unbiased.  Only meaningful under differentiation.
    """

    @jax.custom_vjp
    def estimate(_key, *_parameters):
        msg = "hutchinson_custom_vjp is only evaluable inside a VJP"
        raise RuntimeError(msg)

    def estimate_fwd(key, *parameters):
        _key_fwd, key_bwd = jax.random.split(key, num=2)
        value = hutchinson(integrand_fun, sample_fun)(key, *parameters)
        return value, {"key": key_bwd, "parameters": parameters}

    def estimate_bwd(cache, cotangent):
        def integrand_vjp(v, *p):
            _fx, vjp = jax.vjp(integrand_fun, v, *p)
            return vjp(cotangent)

        key, parameters = cache["key"], cache["parameters"]
        return hutchinson(integrand_vjp, sample_fun)(key, *parameters)

    estimate.defvjp(estimate_fwd, estimate_bwd)
    return estimate


def hutchinson_batch(estimate_fun: Callable, /, num: int) -> Callable:
    """Average ``estimate_fun`` over ``num`` sequentially-mapped key batches."""

    def estimate(key, *parameters):
        keys = jax.random.split(key, num=num)
        estimates = jax.lax.map(lambda k: estimate_fun(k, *parameters), keys)
        return jax.tree_util.tree_map(lambda s: jnp.mean(s, axis=0), estimates)

    return jax.jit(estimate)
