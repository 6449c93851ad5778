"""Streaming Pallas BSR SpMV vs dense oracle (interpret on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lanczos_adjoints_tpu.ops import pallas_bsr, sparse

INTERPRET = jax.default_backend() == "cpu"


def _random_symmetric_csr(n, density, seed):
    rng = np.random.default_rng(seed)
    m = (rng.random((n, n)) < density) * rng.standard_normal((n, n))
    m = np.triu(m) + np.triu(m, 1).T + np.eye(n) * n
    return sparse.csr_from_dense(m.astype(np.float32)), m.astype(np.float32)


def test_bsr_spmv_matches_dense():
    mat, dense = _random_symmetric_csr(300, 0.03, 0)
    bsr = sparse.bsr_pack(mat)
    assert bsr.tile_rows == sparse.BSR_TILE_ROWS
    tiles = sparse.bsr_values(bsr, mat.data)
    mv = pallas_bsr.bsr_spmv_pallas(bsr, interpret=INTERPRET)
    v = jax.random.normal(jax.random.PRNGKey(0), (300,), jnp.float32)
    out = mv(v, tiles)
    expected = dense @ np.asarray(v)
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-4, atol=1e-4)


def test_bsr_xla_matvec_matches_dense():
    """The (8, 128)-tile repack keeps the XLA einsum path correct."""
    mat, dense = _random_symmetric_csr(200, 0.05, 1)
    bsr = sparse.bsr_pack(mat)
    tiles = sparse.bsr_values(bsr, mat.data)
    mv = sparse.bsr_matvec_fn(bsr)
    v = jax.random.normal(jax.random.PRNGKey(1), (200,), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(mv(v, tiles)), dense @ np.asarray(v), rtol=1e-4, atol=1e-4
    )


@pytest.mark.parametrize("symmetric", [True, False])
def test_bsr_gradients(symmetric):
    mat, dense = _random_symmetric_csr(260, 0.04, 2)
    bsr = sparse.bsr_pack(mat)
    tiles = sparse.bsr_values(bsr, mat.data)
    mv = pallas_bsr.bsr_matvec_pallas(
        bsr, symmetric=symmetric, interpret=INTERPRET
    )
    mv_xla = sparse.bsr_matvec_fn(bsr)
    v = jax.random.normal(jax.random.PRNGKey(3), (260,), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(4), (260,), jnp.float32)

    def loss(fn, v_, t_):
        return jnp.sum(w * fn(v_, t_)) + jnp.sum(fn(v_, t_) ** 2)

    g = jax.grad(loss, argnums=(1, 2))(mv, v, tiles)
    g_ref = jax.grad(loss, argnums=(1, 2))(mv_xla, v, tiles)
    for a, b in zip(g, g_ref):
        rel = jnp.linalg.norm(a - b) / (jnp.linalg.norm(b) + 1e-9)
        assert rel < 1e-5, rel


def test_fem_test_matrix_properties():
    mat = pallas_bsr.fem_test_matrix(4, dofs=3)
    n = 4 * 4 * 4 * 3
    assert mat.shape == (n, n)
    dense = mat.todense()
    np.testing.assert_allclose(dense, dense.T, atol=1e-6)
    # diagonally dominant -> SPD
    eigmin = np.linalg.eigvalsh(dense).min()
    assert eigmin > 0

    # Lanczos adjoint runs through the streaming matvec.
    bsr = sparse.bsr_pack(mat)
    tiles = sparse.bsr_values(bsr, mat.data)
    mv = pallas_bsr.bsr_matvec_pallas(bsr, symmetric=True, interpret=INTERPRET)
    from lanczos_adjoints_tpu.krylov import lanczos

    tridiag = lanczos.tridiag(mv, 8, reortho="none")
    v0 = jax.random.normal(jax.random.PRNGKey(5), (n,), jnp.float32)

    def slq_like(t_):
        (xs, (alphas, betas)), _ = tridiag(v0, t_)
        return jnp.sum(alphas) + jnp.sum(betas**2)

    g = jax.grad(slq_like)(tiles)
    assert bool(jnp.all(jnp.isfinite(g)))
