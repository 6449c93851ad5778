"""Sparse operator formats: correctness against dense, gradients, autoselect."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lanczos_adjoints_tpu.ops import sparse


def _laplacian_2d(m):
    n = m * m
    idx = np.arange(n)
    rows, cols, vals = [idx], [idx], [4.0 * np.ones(n)]
    i, j = idx // m, idx % m
    for di, dj in [(-1, 0), (1, 0), (0, -1), (0, 1)]:
        ni, nj = i + di, j + dj
        ok = (ni >= 0) & (ni < m) & (nj >= 0) & (nj < m)
        rows.append(idx[ok])
        cols.append((ni * m + nj)[ok])
        vals.append(-1.0 * np.ones(ok.sum()))
    return sparse.csr_from_coo(
        np.concatenate(rows), np.concatenate(cols), np.concatenate(vals), shape=(n, n)
    )


def _random_csr(n, nnz_per_row, key=0):
    rng = np.random.default_rng(key)
    rows = np.repeat(np.arange(n), nnz_per_row)
    cols = rng.integers(0, n, len(rows))
    vals = rng.normal(size=len(rows))
    return sparse.csr_from_coo(rows, cols, vals, shape=(n, n))


@pytest.mark.parametrize("fmt", ["dia", "bsr", "ell", "hyb"])
def test_matvec_matches_dense_laplacian(fmt):
    mat = _laplacian_2d(12)
    dense = mat.todense()
    v = np.random.default_rng(0).normal(size=mat.shape[0]).astype(np.float32)

    matvec, vals = sparse.sparse_operator(mat, format=fmt)
    out = np.asarray(matvec(jnp.asarray(v), vals))
    np.testing.assert_allclose(out, dense @ v, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("fmt", ["bsr", "ell", "hyb"])
def test_matvec_matches_dense_random(fmt):
    mat = _random_csr(200, 5)
    dense = mat.todense()
    v = np.random.default_rng(1).normal(size=200).astype(np.float32)

    matvec, vals = sparse.sparse_operator(mat, format=fmt)
    out = np.asarray(matvec(jnp.asarray(v), vals))
    np.testing.assert_allclose(out, dense @ v, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("fmt", ["dia", "bsr", "ell", "hyb"])
def test_vjp_matches_dense(fmt):
    mat = _laplacian_2d(8)
    dense = jnp.asarray(mat.todense().astype(np.float32))
    n = mat.shape[0]
    v = jnp.asarray(np.random.default_rng(2).normal(size=n), jnp.float32)
    cot = jnp.asarray(np.random.default_rng(3).normal(size=n), jnp.float32)

    matvec, vals = sparse.sparse_operator(mat, format=fmt)
    _out, vjp = jax.vjp(matvec, v, vals)
    dv, dvals = vjp(cot)
    np.testing.assert_allclose(np.asarray(dv), dense.T @ cot, rtol=1e-4, atol=1e-4)

    # Parameter gradient: compare total derivative of sum(cot * A v)
    # against the dense bilinear form d/dA = outer(cot, v) projected onto
    # the sparsity pattern -- check via directional derivative.
    direction = jax.tree_util.tree_map(jnp.ones_like, vals)
    dir_deriv = jnp.vdot(jax.flatten_util.ravel_pytree(dvals)[0],
                         jax.flatten_util.ravel_pytree(direction)[0])
    eps = 1e-3
    vals_p = jax.tree_util.tree_map(lambda a, d: a + eps * d, vals, direction)
    vals_m = jax.tree_util.tree_map(lambda a, d: a - eps * d, vals, direction)
    fd = (jnp.vdot(cot, matvec(v, vals_p)) - jnp.vdot(cot, matvec(v, vals_m))) / (
        2 * eps
    )
    np.testing.assert_allclose(float(dir_deriv), float(fd), rtol=1e-2, atol=1e-2)


def test_autoselect_dia_for_stencil():
    mat = _laplacian_2d(12)
    _mv, _vals, info = sparse.sparse_operator(mat, with_info=True)
    assert info.format == "dia"
    assert info.fill_efficiency > 0.5


def test_autoselect_hyb_for_scattered():
    mat = _random_csr(600, 3)
    _mv, _vals, info = sparse.sparse_operator(mat, with_info=True)
    assert info.format == "hyb"


def test_hyb_peels_heavy_rows():
    """A near-dense row must not blow up the ELL width (bloweybq case)."""
    n = 400
    mat = _random_csr(n, 4)
    rows = np.concatenate([mat.rows, np.full(n, 7)])
    cols = np.concatenate([mat.indices, np.arange(n)])
    vals = np.concatenate([mat.data, np.ones(n)])
    mat2 = sparse.csr_from_coo(rows, cols, vals, shape=(n, n))

    hyb = sparse.hyb_pack(mat2)
    assert int(hyb.heavy_rows.shape[0]) >= 1
    assert hyb.ell.width <= 16  # not padded to the dense row
    matvec = sparse.hyb_matvec_fn(hyb)
    values = sparse.hyb_values(hyb, mat2.data)
    v = np.random.default_rng(5).normal(size=n).astype(np.float32)
    out = np.asarray(matvec(jnp.asarray(v), values))
    np.testing.assert_allclose(out, mat2.todense() @ v, rtol=1e-4, atol=1e-4)


def test_symmetric_detection():
    mat = _laplacian_2d(6)
    assert mat.is_symmetric()
    asym = _random_csr(30, 3)
    assert not asym.is_symmetric()


def test_coo_matvec_matches_dense():
    mat = _random_csr(100, 4)
    dense = mat.todense()
    v = np.random.default_rng(4).normal(size=100).astype(np.float32)
    matvec, vals = sparse.coo_matvec_fn(mat)
    out = np.asarray(matvec(jnp.asarray(v), vals))
    np.testing.assert_allclose(out, dense @ v, rtol=1e-4, atol=1e-4)


def test_rcm_reduces_bandwidth():
    rng = np.random.default_rng(5)
    n = 80
    perm = rng.permutation(n)
    # banded matrix scrambled by a random permutation
    rows, cols = [], []
    for d in [-2, -1, 0, 1, 2]:
        idx = np.arange(max(0, -d), min(n, n - d))
        rows.append(idx)
        cols.append(idx + d)
    rows, cols = np.concatenate(rows), np.concatenate(cols)
    rows, cols = perm[rows], perm[cols]
    mat = sparse.csr_from_coo(rows, cols, np.ones(len(rows)), shape=(n, n))

    order = sparse.reverse_cuthill_mckee(mat)
    reordered = sparse.permute_symmetric(mat, order)
    bw_before = np.abs(mat.rows - mat.indices).max()
    bw_after = np.abs(reordered.rows - reordered.indices).max()
    assert bw_after < bw_before
    assert bw_after <= 4
