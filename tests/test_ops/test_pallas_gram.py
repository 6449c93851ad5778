"""Fused Pallas Gram matvec vs the XLA policies (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import pytest

from lanczos_adjoints_tpu.ops import gram, pallas_gram

pytestmark = pytest.mark.skipif(
    jax.default_backend() not in ("cpu", "tpu"),
    reason="needs cpu (interpret) or tpu",
)


def _reference_kernel(kind, ell, out_s):
    eps = jnp.finfo(jnp.float32).eps

    def k(a, b):
        sq = jnp.sum(((a - b) / ell) ** 2)
        if kind == "rbf":
            return out_s * jnp.exp(-sq / 2)
        if kind == "matern12":
            dist = jnp.sqrt(sq + eps)
            return out_s * jnp.exp(-dist)
        dist = jnp.sqrt(3 * sq + eps)
        return out_s * (1 + dist) * jnp.exp(-dist)

    return k


@pytest.mark.parametrize("kind", ["rbf", "matern12", "matern32"])
def test_fused_matches_xla(kind, monkeypatch):
    if jax.default_backend() == "cpu":
        # Interpret mode: run the kernel without Mosaic.
        import functools

        from jax.experimental import pallas as pl

        monkeypatch.setattr(
            pl, "pallas_call", functools.partial(pl.pallas_call, interpret=True)
        )

    n, d = 2048, 3
    x = jax.random.normal(jax.random.PRNGKey(0), (n, d), jnp.float32)
    v = jax.random.normal(jax.random.PRNGKey(1), (n,), jnp.float32)
    ell, out_s = jnp.asarray(0.8), jnp.asarray(1.2)

    mv = pallas_gram.gram_matvec_fused(kind)
    out = mv(x, x, v, ell, out_s)
    expected = gram.gram_matvec()(_reference_kernel(kind, ell, out_s))(x, x, v)
    assert jnp.allclose(out, expected, rtol=1e-4, atol=1e-4)

    # Gradients: dv, d lengthscale, d outputscale.
    def loss_fused(v, ell, s):
        return jnp.sum(mv(x, x, v, ell, s) ** 2)

    def loss_ref(v, ell, s):
        return jnp.sum(
            gram.gram_matvec()(_reference_kernel(kind, ell, s))(x, x, v) ** 2
        )

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(v, ell, out_s)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(v, ell, out_s)
    for a, b in zip(g_fused, g_ref):
        rel = jnp.linalg.norm(a - b) / (jnp.linalg.norm(b) + 1e-9)
        assert rel < 1e-3, rel
