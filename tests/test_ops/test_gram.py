"""Gram matvec execution policies agree with the materialised matrix."""

import jax
import jax.numpy as jnp
import pytest

from lanczos_adjoints_tpu.ops import gram


def _kernel(x, y):
    diff = x - y
    return jnp.exp(-jnp.dot(diff, diff))


@pytest.fixture
def data():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (24, 3))
    v = jax.random.normal(jax.random.PRNGKey(1), (24,))
    return x, v


def test_gram_matrix(data):
    x, _v = data
    K = gram.gram_matrix(_kernel)(x, x)
    assert K.shape == (24, 24)
    assert jnp.allclose(K, K.T, atol=1e-6)
    assert jnp.allclose(jnp.diag(K), jnp.ones(24), atol=1e-6)


def test_policies_agree(data):
    x, v = data
    K = gram.gram_matrix(_kernel)(x, x)
    expected = K @ v

    full = gram.gram_matvec()(_kernel)(x, x, v)
    part = gram.gram_matvec_partitioned(4, checkpoint=True)(_kernel)(x, x, v)
    seq = gram.gram_matvec_sequential(checkpoint=False)(_kernel)(x, x, v)

    for out in (full, part, seq):
        assert jnp.allclose(out, expected, atol=1e-5, rtol=1e-5)


def test_partitioned_requires_divisibility(data):
    x, v = data
    mv = gram.gram_matvec_partitioned(5, checkpoint=False)(_kernel)
    with pytest.raises(ValueError, match="does not divide"):
        mv(x, x, v)


def test_gradients_agree(data):
    x, v = data

    def loss_with(policy):
        def loss(x):
            return jnp.sum(policy(_kernel)(x, x, v) ** 2)

        return jax.grad(loss)(x)

    g_full = loss_with(gram.gram_matvec())
    g_part = loss_with(gram.gram_matvec_partitioned(4, checkpoint=True))
    assert jnp.allclose(g_full, g_part, atol=1e-4, rtol=1e-4)
