"""Fused Pallas Arnoldi vs the generic Krylov path (interpret on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lanczos_adjoints_tpu.krylov import arnoldi
from lanczos_adjoints_tpu.ops import pallas_arnoldi, sparse

INTERPRET = jax.default_backend() == "cpu"


def _laplacian_dia(n_grid):
    """5-point Laplacian on an n_grid x n_grid periodic-free grid."""
    n = n_grid * n_grid
    rows, cols, vals = [], [], []
    for i in range(n_grid):
        for j in range(n_grid):
            r = i * n_grid + j
            rows.append(r), cols.append(r), vals.append(4.0)
            for di, dj in ((0, 1), (0, -1), (1, 0), (-1, 0)):
                ii, jj = i + di, j + dj
                if 0 <= ii < n_grid and 0 <= jj < n_grid:
                    rows.append(r), cols.append(ii * n_grid + jj)
                    vals.append(-1.0)
    mat = sparse.csr_from_coo(
        np.asarray(rows), np.asarray(cols), np.asarray(vals, np.float32),
        shape=(n, n),
    )
    dia = sparse.dia_pack(mat)
    return dia, sparse.dia_values(dia, mat.data)


@pytest.mark.parametrize("reortho", ["full", "none"])
# 64 > _UNROLL_DEPTH_CAP exercises the looped masked-projection kernel.
@pytest.mark.parametrize("krylov_depth", [1, 5, 12, 64])
def test_fused_forward_matches_generic(reortho, krylov_depth):
    dia, vals = _laplacian_dia(16)  # n = 256, multiple of 128
    n = dia.shape[0]
    v0 = jax.random.normal(jax.random.PRNGKey(0), (n,), jnp.float32)

    fused = pallas_arnoldi.hessenberg_dia_fused(
        dia, krylov_depth, reortho=reortho, interpret=INTERPRET
    )
    generic = arnoldi.hessenberg(
        sparse.dia_matvec_fn(dia), krylov_depth, reortho=reortho
    )

    Qf, Hf, resf, cf = fused(v0, vals)
    Qg, Hg, resg, cg = generic(v0, vals)
    # Without re-orthogonalisation the recurrence is chaotic in the
    # rounding order, so the two f32 implementations drift ~1e-4 in H by
    # depth 12; the factorisation invariant below is the sharp check.
    # Past depth ~40 on this operator the near-degenerate Laplacian
    # eigenvalue pairs make even the re-orthogonalised directions
    # rounding-chaotic BETWEEN implementations (each stays orthonormal
    # and satisfies the invariant to machine precision; measured: the
    # first 32 columns agree to 7e-7, later ones rotate), so the deep-K
    # case compares the stable prefix elementwise and relies on the
    # invariants for the rest.
    tol = 1e-4 if reortho == "full" else 1e-3
    if krylov_depth <= 32:
        stable_cols = krylov_depth
    else:
        # reortho=none loses the stable prefix faster (no projection
        # pulls the drift back); measured crossover ~16 columns.
        stable_cols = 32 if reortho == "full" else 12
    assert jnp.allclose(Qf[:, :stable_cols], Qg[:, :stable_cols], atol=tol)
    assert jnp.allclose(
        Hf[: stable_cols + 1, :stable_cols], Hg[: stable_cols + 1, :stable_cols],
        atol=tol,
    )
    if krylov_depth <= 32:
        assert jnp.allclose(resf, resg, atol=tol)
    assert jnp.allclose(cf, cg)

    # Invariants: A Q = Q H + res e_k^T to machine precision,
    # orthonormal basis (reortho=full), Hessenberg structure.
    mv = sparse.dia_matvec_fn(dia)
    AQ = jax.vmap(lambda q: mv(q, vals), in_axes=1, out_axes=1)(Qf)
    R = (AQ - Qf @ Hf).at[:, -1].add(-resf)
    assert jnp.max(jnp.abs(R)) < 1e-5
    if reortho == "full":
        eye = Qf.T @ Qf
        assert jnp.allclose(eye, jnp.eye(krylov_depth), atol=1e-5)
    assert jnp.allclose(Hf, jnp.triu(Hf, -1), atol=0.0)


def test_fused_gradients_match_generic():
    dia, vals = _laplacian_dia(16)
    n = dia.shape[0]
    krylov_depth = 6
    key1, key2, key3 = jax.random.split(jax.random.PRNGKey(1), 3)
    v0 = jax.random.normal(key1, (n,), jnp.float32)

    fused = pallas_arnoldi.hessenberg_dia_fused(
        dia, krylov_depth, reortho="full", interpret=INTERPRET
    )
    generic = arnoldi.hessenberg(
        sparse.dia_matvec_fn(dia), krylov_depth, reortho="full"
    )

    dQ = jax.random.normal(key2, (n, krylov_depth), jnp.float32)
    dH = jax.random.normal(key3, (krylov_depth, krylov_depth), jnp.float32)

    def loss(fn, v, vl):
        Q, H, res, c = fn(v, vl)
        return jnp.sum(Q * dQ) + jnp.sum(H * dH) + jnp.sum(res) + c

    gf = jax.grad(loss, argnums=(1, 2))(fused, v0, vals)
    gg = jax.grad(loss, argnums=(1, 2))(generic, v0, vals)
    for a, b in zip(gf, gg):
        rel = jnp.linalg.norm(a - b) / (jnp.linalg.norm(b) + 1e-9)
        assert rel < 1e-4, rel


def test_fused_vmaps():
    """The PDE training loop vmaps the expm over training pairs."""
    dia, vals = _laplacian_dia(16)
    n = dia.shape[0]
    fused = pallas_arnoldi.hessenberg_dia_fused(
        dia, 4, reortho="full", interpret=INTERPRET
    )
    v0s = jax.random.normal(jax.random.PRNGKey(2), (3, n), jnp.float32)
    Qs, Hs, ress, cs = jax.vmap(lambda v: fused(v, vals))(v0s)
    assert Qs.shape == (3, n, 4)
    for b in range(3):
        Q, H, res, c = fused(v0s[b], vals)
        assert jnp.allclose(Qs[b], Q, atol=1e-6)
        assert jnp.allclose(Hs[b], H, atol=1e-6)


def test_depth_validation():
    dia, _vals = _laplacian_dia(16)
    with pytest.raises(ValueError, match="outside the expected range"):
        pallas_arnoldi.hessenberg_dia_forward(dia, 0, reortho="full")
    with pytest.raises(TypeError, match="Unexpected input"):
        pallas_arnoldi.hessenberg_dia_fused(dia, 4, reortho="junk")
