"""Probe-sharded Hutchinson (the DP axis) matches the unsharded estimate."""

import jax
import jax.numpy as jnp
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from lanczos_adjoints_tpu import parallel, trace
from lanczos_adjoints_tpu.utils import test_util

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)


def test_probe_sharded_hutchinson_matches():
    n = 16
    A = test_util.symmetric_matrix_from_eigenvalues(jnp.linspace(1.0, 2.0, n))
    mesh = parallel.device_mesh(8, axis="probes")
    sharding = NamedSharding(mesh, P("probes"))

    def integrand(v, p):
        return v @ (p @ v)

    sampler = trace.sampler_rademacher(jnp.ones((n,)), num=64)
    plain = trace.hutchinson(integrand, sampler)
    sharded = trace.hutchinson(integrand, sampler, probe_sharding=sharding)

    key = jax.random.PRNGKey(0)
    v_plain = jax.jit(plain)(key, A)
    v_sharded = jax.jit(sharded)(key, A)
    assert jnp.allclose(v_plain, v_sharded, rtol=1e-5)
