"""Fused DIA Lanczos (fwd + adjoint kernels) vs the generic tridiag."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lanczos_adjoints_tpu import krylov
from lanczos_adjoints_tpu.ops import pallas_lanczos, sparse

pytestmark = pytest.mark.skipif(
    jax.default_backend() not in ("cpu", "tpu"),
    reason="needs cpu (interpret) or tpu",
)


def _laplacian_1d(n):
    idx = np.arange(n)
    rows = np.concatenate([idx, idx[:-1], idx[1:]])
    cols = np.concatenate([idx, idx[1:], idx[:-1]])
    vals = np.concatenate([2.5 * np.ones(n), -np.ones(n - 1), -np.ones(n - 1)])
    return sparse.csr_from_coo(rows, cols, vals, shape=(n, n))


def test_fused_matches_generic():
    interpret = jax.default_backend() == "cpu"
    n, K = 512, 12
    mat = _laplacian_1d(n)
    dia = sparse.dia_pack(mat)
    vals = sparse.dia_values(dia, mat.data).astype(jnp.float32)
    matvec = sparse.dia_matvec_fn(dia)
    v0 = jnp.asarray(np.random.default_rng(0).normal(size=n), jnp.float32)

    fused = pallas_lanczos.tridiag_dia_fused(dia, K, interpret=interpret)
    ref = krylov.tridiag(matvec, K, reortho="none")

    (Xf, (af, bf)), (xrf, brf) = fused(v0, vals)
    (Xr, (ar, br)), (xrr, brr) = ref(v0, vals)
    assert jnp.allclose(af, ar, atol=1e-4, rtol=1e-4)
    assert jnp.allclose(bf, br, atol=1e-4, rtol=1e-4)
    assert jnp.allclose(Xf, Xr, atol=1e-4)
    assert jnp.allclose(xrf, xrr, atol=1e-4)

    def loss(fn):
        def run(v, vals):
            (X, (a, b)), (xr, brm) = fn(v, vals)
            return jnp.sum(a) + jnp.sum(b) + jnp.sum(X[3] ** 2) + jnp.sum(xr * brm)

        return run

    gf = jax.grad(loss(fused), argnums=(0, 1))(v0, vals)
    gr = jax.grad(loss(ref), argnums=(0, 1))(v0, vals)
    for a, b in zip(gf, gr):
        rel = jnp.linalg.norm(a - b) / (jnp.linalg.norm(b) + 1e-9)
        assert rel < 1e-3, rel


def test_fused_requires_lane_multiple():
    mat = _laplacian_1d(100)
    dia = sparse.dia_pack(mat)
    with pytest.raises(ValueError, match="multiple"):
        pallas_lanczos.lanczos_forward_dia(dia, 5)


def test_streaming_matches_resident():
    """HBM-streaming kernels == basis-resident kernels, values and grads."""
    interpret = jax.default_backend() == "cpu"
    n, K = 512, 10
    mat = _laplacian_1d(n)
    dia = sparse.dia_pack(mat)
    vals = sparse.dia_values(dia, mat.data).astype(jnp.float32)
    v0 = jnp.asarray(np.random.default_rng(1).normal(size=n), jnp.float32)

    resident = pallas_lanczos.tridiag_dia_fused(
        dia, K, interpret=interpret, stream=False
    )
    streaming = pallas_lanczos.tridiag_dia_fused(
        dia, K, interpret=interpret, stream=True
    )

    (Xs, (as_, bs)), (xrs, brs) = streaming(v0, vals)
    (Xr, (ar, br)), (xrr, brr) = resident(v0, vals)
    assert jnp.allclose(as_, ar, atol=1e-5)
    assert jnp.allclose(bs, br, atol=1e-5)
    assert jnp.allclose(Xs, Xr, atol=1e-5)
    assert jnp.allclose(xrs, xrr, atol=1e-5)
    assert jnp.allclose(brs, brr, atol=1e-5)

    def loss(fn):
        def run(v, vals):
            (X, (a, b)), (xr, brm) = fn(v, vals)
            return jnp.sum(a) + jnp.sum(b) + jnp.sum(X[3] ** 2) + jnp.sum(xr * brm)

        return run

    gs = jax.grad(loss(streaming), argnums=(0, 1))(v0, vals)
    gr = jax.grad(loss(resident), argnums=(0, 1))(v0, vals)
    for a, b in zip(gs, gr):
        rel = jnp.linalg.norm(a - b) / (jnp.linalg.norm(b) + 1e-9)
        assert rel < 1e-5, rel


def test_stream_auto_selection():
    mat = _laplacian_1d(512)
    dia = sparse.dia_pack(mat)
    assert pallas_lanczos._fits_resident(dia, 10)
    big = sparse.DIAData(
        offsets=dia.offsets,
        shape=(1 << 20, 1 << 20),
        nnz=dia.nnz,
        diag_of_entry=dia.diag_of_entry,
        pos_of_entry=dia.pos_of_entry,
    )
    assert not pallas_lanczos._fits_resident(big, 90)
