"""Fused Pallas Gram matvec vs the XLA policies (interpret mode on CPU)."""

import functools

import jax
import jax.numpy as jnp
import pytest

from lanczos_adjoints_tpu.ops import gram, pallas_gram

pytestmark = pytest.mark.skipif(
    jax.default_backend() not in ("cpu", "tpu"),
    reason="needs cpu (interpret) or tpu",
)

# matern12's exp(-sqrt(sq + eps)) is non-smooth at sq = 0: the expanded
# squared distance (x^2 + y^2 - 2xy, used by BOTH the fused kernel and
# the XLA policy, matching reference gp_util.py:89) carries ~1e-6
# cancellation noise near the diagonal, which sqrt amplifies to ~3e-3
# in the kernel value.  The two implementations round differently, so
# the comparison tolerance reflects that shared accuracy floor; rbf and
# matern32 have vanishing sensitivity at sq = 0 and compare tightly.
_TOL = {"rbf": 1e-4, "matern12": 5e-3, "matern32": 1e-4}


@pytest.fixture(autouse=True)
def _interpret_on_cpu(monkeypatch):
    if jax.default_backend() == "cpu":
        from jax.experimental import pallas as pl

        monkeypatch.setattr(
            pallas_gram.pl,
            "pallas_call",
            functools.partial(pl.pallas_call, interpret=True),
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
def test_fused_matches_xla(kind):
    n, d = 2048, 3
    x = jax.random.normal(jax.random.PRNGKey(0), (n, d), jnp.float32)
    v = jax.random.normal(jax.random.PRNGKey(1), (n,), jnp.float32)
    ell, out_s = jnp.asarray(0.8), jnp.asarray(1.2)
    tol = _TOL[kind]

    mv = pallas_gram.gram_matvec_fused(kind)
    out = mv(x, x, v, ell, out_s)
    expected = gram.gram_matvec()(_reference_kernel(kind, ell, out_s))(x, x, v)
    assert jnp.allclose(out, expected, rtol=tol, atol=tol)

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
        assert rel < 10 * tol, rel


@pytest.mark.parametrize("kind,d", [("rbf", 4), ("matern32", 4), ("matern32", 12)])
def test_fused_multivector_and_ard(kind, d):
    """(N, m) RHS and ARD lengthscales; d=12 exercises the MXU path."""
    n, m = 1500, 5  # n deliberately not a block multiple
    key = jax.random.PRNGKey(2)
    kx, kv, kl = jax.random.split(key, 3)
    x = jax.random.normal(kx, (n, d), jnp.float32)
    vs = jax.random.normal(kv, (n, m), jnp.float32)
    ell = 0.5 + jax.random.uniform(kl, (d,), jnp.float32)
    out_s = jnp.asarray(0.7)

    mv = pallas_gram.gram_matvec_fused(kind)
    out = mv(x, x, vs, ell, out_s)
    assert out.shape == (n, m)

    ref = gram.gram_matvec()(_reference_kernel(kind, ell, out_s))
    for k in range(m):
        expected = ref(x, x, vs[:, k])
        assert jnp.allclose(out[:, k], expected, rtol=1e-4, atol=1e-4)

    # ARD lengthscale gradient against the autodiff oracle.
    def loss_fused(v, ell, s):
        return jnp.sum(mv(x, x, v, ell, s) ** 2)

    def loss_ref(v, ell, s):
        ref_ = gram.gram_matvec()(_reference_kernel(kind, ell, s))
        return sum(jnp.sum(ref_(x, x, v[:, k]) ** 2) for k in range(m))

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(vs, ell, out_s)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(vs, ell, out_s)
    for a, b in zip(g_fused, g_ref):
        rel = jnp.linalg.norm(a - b) / (jnp.linalg.norm(b) + 1e-9)
        assert rel < 1e-3, rel


@pytest.mark.parametrize(
    "kind,d,symmetric",
    [
        ("rbf", 3, False),
        ("matern32", 3, False),
        ("rbf", 12, False),
        ("matern12", 3, False),
        ("rbf", 3, True),
        ("matern32", 3, True),
    ],
)
def test_fused_data_gradients(kind, d, symmetric):
    """data_grads=True returns true dx/dy (autodiff oracle); default zeros.

    d=12 exercises the MXU moment kernel.  Rectangular x != y checks
    the dy-by-symmetry path independently of dx; symmetric x == y
    checks the on-diagonal moment cancellation (matern12's derivative
    blows up at sq -> 0, so its symmetric case is documented as a
    caveat in the data_grads docstring rather than tested).
    """
    n, p, m = 520, 260, 3  # deliberately not block multiples
    kx, ky, kv, ku = jax.random.split(jax.random.PRNGKey(3), 4)
    x = jax.random.normal(kx, (n, d), jnp.float32)
    if symmetric:
        p = n
        y = x
    else:
        y = jax.random.normal(ky, (p, d), jnp.float32)
    vs = jax.random.normal(kv, (p, m), jnp.float32)
    us = jax.random.normal(ku, (n, m), jnp.float32)
    ell, out_s = jnp.asarray(0.9), jnp.asarray(1.3)

    mv = pallas_gram.gram_matvec_fused(kind, data_grads=True)

    def loss_fused(x, y):
        return jnp.sum(us * mv(x, y, vs, ell, out_s))

    def loss_ref(x, y):
        ref = gram.gram_matvec()(_reference_kernel(kind, ell, out_s))
        return sum(jnp.sum(us[:, k] * ref(x, y, vs[:, k])) for k in range(m))

    g_fused = jax.grad(loss_fused, argnums=(0, 1))(x, y)
    g_ref = jax.grad(loss_ref, argnums=(0, 1))(x, y)
    for a, b in zip(g_fused, g_ref):
        rel = jnp.linalg.norm(a - b) / (jnp.linalg.norm(b) + 1e-9)
        assert rel < 10 * _TOL[kind], rel

    # The default is explicit symbolic zeros for the data cotangents.
    mv0 = pallas_gram.gram_matvec_fused(kind)
    gz = jax.grad(lambda x: jnp.sum(mv0(x, y, vs, ell, out_s)))(x)
    assert jnp.all(gz == 0.0)


@pytest.mark.parametrize("kind", ["rbf", "matern32"])
def test_gp_policy_gram_matvec_pallas(kind):
    """The gp-layer policy routes tagged kernels to the fused kernel."""
    from lanczos_adjoints_tpu.models import gp
    from lanczos_adjoints_tpu.ops import gram

    factory = {
        "rbf": gp.kernel_scaled_rbf,
        "matern32": gp.kernel_scaled_matern_32,
    }[kind]
    kernel_factory, _ = factory(shape_in=(3,), shape_out=())
    raw_ell = jnp.asarray([0.2, -0.1, 0.4])
    raw_out = jnp.asarray(0.3)
    k = kernel_factory(raw_lengthscale=raw_ell, raw_outputscale=raw_out)

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (64, 3), jnp.float32)
    v = jax.random.normal(jax.random.PRNGKey(1), (64,), jnp.float32)

    mv_ref = gram.gram_matvec()(k)
    mv_fused = gram.gram_matvec_pallas()(k)
    out_ref = mv_ref(x, x, v)
    out_fused = mv_fused(x, x, v)
    assert jnp.allclose(out_fused, out_ref, rtol=_TOL[kind], atol=1e-4), float(
        jnp.max(jnp.abs(out_fused - out_ref))
    )


def test_gp_policy_rejects_untagged_kernel():
    from lanczos_adjoints_tpu.ops import gram

    with pytest.raises(ValueError, match="not tagged"):
        gram.gram_matvec_pallas()(lambda x, y: jnp.sum(x * y))
