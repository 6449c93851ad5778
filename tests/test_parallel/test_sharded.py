"""Row-partitioned operators on a virtual 8-device CPU mesh.

The new multi-device layer (no reference counterpart, SURVEY.md 2.4):
sharded matvecs must agree with the single-device operators, and the
full Krylov/CG/SLQ stack must run unchanged on top of them.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lanczos_adjoints_tpu import krylov, parallel, solvers, trace
from lanczos_adjoints_tpu.ops import sparse
from lanczos_adjoints_tpu.utils import test_util

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)


def _laplacian_1d(n):
    idx = np.arange(n)
    rows = np.concatenate([idx, idx[:-1], idx[1:]])
    cols = np.concatenate([idx, idx[1:], idx[:-1]])
    vals = np.concatenate([2.02 * np.ones(n), -np.ones(n - 1), -np.ones(n - 1)])
    return sparse.csr_from_coo(rows, cols, vals, shape=(n, n))


def test_sharded_dense_matches_local():
    n = 64
    mesh = parallel.device_mesh(8)
    A = test_util.symmetric_matrix_from_eigenvalues(jnp.linspace(1.0, 2.0, n))
    v = jnp.arange(1.0, n + 1.0)

    matvec = parallel.sharded_dense_operator(mesh)
    A_sharded = parallel.shard_rows(A, mesh)
    out = matvec(v, A_sharded)
    assert jnp.allclose(out, A @ v, atol=1e-4, rtol=1e-4)


def test_sharded_dia_halo_exchange_matches_local():
    n = 128
    mesh = parallel.device_mesh(8)
    mat = _laplacian_1d(n)
    dia = sparse.dia_pack(mat)
    vals = sparse.dia_values(dia, mat.data).astype(jnp.float32)

    local_matvec = sparse.dia_matvec_fn(dia)
    sharded_matvec = parallel.sharded_dia_operator(dia, mesh)

    v = jnp.asarray(np.random.default_rng(0).normal(size=n), jnp.float32)
    out_local = local_matvec(v, vals)
    vals_sharded = parallel.shard_rows(vals, mesh, dim=1)
    v_sharded = parallel.shard_rows(v, mesh)
    out_sharded = sharded_matvec(v_sharded, vals_sharded)
    assert jnp.allclose(out_sharded, out_local, atol=1e-5)


def test_sharded_gram_matches_local():
    n = 48
    mesh = parallel.device_mesh(8)

    def kernel(x, y):
        diff = x - y
        return jnp.exp(-jnp.dot(diff, diff))

    x = jax.random.normal(jax.random.PRNGKey(0), (n, 2))
    v = jax.random.normal(jax.random.PRNGKey(1), (n,))

    from lanczos_adjoints_tpu.ops import gram

    expected = gram.gram_matvec()(kernel)(x, x, v)
    with pytest.raises(ValueError):
        # 48 does not divide 8 evenly -> shard_map rejects; use 48 pad
        parallel.sharded_gram_matvec(kernel, mesh)(x[:46], x, v)

    sharded = parallel.sharded_gram_matvec(kernel, mesh)(x, x, v)
    assert jnp.allclose(sharded, expected, atol=1e-5, rtol=1e-5)


def test_lanczos_on_sharded_operator():
    """The Krylov layer runs unchanged over a row-partitioned matvec."""
    n, k = 64, 12
    mesh = parallel.device_mesh(8)
    A = test_util.symmetric_matrix_from_eigenvalues(jnp.linspace(1.0, 2.0, n))
    v = jnp.arange(1.0, n + 1.0)

    matvec_sharded = parallel.sharded_dense_operator(mesh)
    A_sharded = parallel.shard_rows(A, mesh)

    factorise = krylov.tridiag(matvec_sharded, k, reortho="full")
    (X, (diags, offdiags)), _ = factorise(v, A_sharded)

    factorise_local = krylov.tridiag(lambda s, p: p @ s, k, reortho="full")
    (X_l, (diags_l, offdiags_l)), _ = factorise_local(v, A)
    assert jnp.allclose(diags, diags_l, atol=1e-4, rtol=1e-4)
    assert jnp.allclose(offdiags, offdiags_l, atol=1e-4, rtol=1e-4)


def test_logdet_gradient_on_sharded_operator():
    """End-to-end: SLQ logdet value-and-grad over a sharded operator."""
    n = 64
    mesh = parallel.device_mesh(8)
    A = test_util.symmetric_matrix_from_eigenvalues(jnp.linspace(1.0, 2.0, n))
    matvec_sharded = parallel.sharded_dense_operator(mesh)

    sampler = trace.sampler_rademacher(jnp.ones((n,)), num=5000)
    logdet = trace.krylov_logdet_slq(
        n, sample=sampler, num_batches=1, checkpoint=False
    )

    def loss(A_):
        value, _ = logdet(
            lambda s: matvec_sharded(s, parallel.shard_rows(A_, mesh)),
            jax.random.PRNGKey(0),
        )
        return value

    value = loss(A)
    _sign, expected = jnp.linalg.slogdet(A)
    assert jnp.allclose(value, expected, rtol=0.1, atol=0.2)


def test_cg_on_sharded_operator():
    n = 64
    mesh = parallel.device_mesh(8)
    A = test_util.symmetric_matrix_from_eigenvalues(jnp.linspace(1.0, 2.0, n))
    b = jnp.arange(1.0, n + 1.0)
    b = b / jnp.linalg.norm(b)

    matvec_sharded = parallel.sharded_dense_operator(mesh)
    A_sharded = parallel.shard_rows(A, mesh)
    x, _ = solvers.cg_fixed_step(n)(lambda s: matvec_sharded(s, A_sharded), b)
    assert jnp.allclose(x, jnp.linalg.solve(A, b), atol=1e-3, rtol=1e-3)


def test_lanczos_with_sharded_vectors_gspmd():
    """Fully sharded mode: vectors row-sharded, GSPMD inserts collectives.

    The Krylov code contains plain jnp dots/norms; with row-sharded
    inputs under jit, XLA's SPMD partitioner turns them into
    psum-reduced local ops -- no code changes. This is the large-n mode
    where no single device holds a full vector.
    """
    n, k = 128, 10
    mesh = parallel.device_mesh(8)
    mat = _laplacian_1d(n)
    dia = sparse.dia_pack(mat)
    vals = sparse.dia_values(dia, mat.data).astype(jnp.float32)

    matvec_sharded = parallel.sharded_dia_operator(dia, mesh)
    vals_sharded = parallel.shard_rows(vals, mesh, dim=1)
    v = jnp.asarray(np.random.default_rng(1).normal(size=n), jnp.float32)
    v_sharded = parallel.shard_rows(v, mesh)

    factorise = krylov.tridiag(matvec_sharded, k, reortho="none")

    @jax.jit
    def run(v, vals):
        (X, (diags, offdiags)), _ = factorise(v, vals)
        return diags, offdiags

    diags_sh, offdiags_sh = run(v_sharded, vals_sharded)

    local_matvec = sparse.dia_matvec_fn(dia)
    factorise_local = krylov.tridiag(local_matvec, k, reortho="none")
    (X_l, (diags_l, offdiags_l)), _ = factorise_local(v, vals)

    assert jnp.allclose(diags_sh, diags_l, atol=1e-4, rtol=1e-4)
    assert jnp.allclose(offdiags_sh, offdiags_l, atol=1e-4, rtol=1e-4)


def test_logdet_grad_with_sharded_vectors():
    """value_and_grad of SLQ logdet with row-sharded operator params."""
    n = 128
    mesh = parallel.device_mesh(8)
    mat = _laplacian_1d(n)
    dia = sparse.dia_pack(mat)
    vals = sparse.dia_values(dia, mat.data).astype(jnp.float32)
    matvec_sharded = parallel.sharded_dia_operator(dia, mesh)
    vals_sharded = parallel.shard_rows(vals, mesh, dim=1)

    sampler = trace.sampler_rademacher(jnp.ones((n,)), num=64)
    logdet = trace.krylov_logdet_slq(
        20, sample=sampler, num_batches=1, checkpoint=False
    )

    @jax.jit
    def loss(vals):
        # Shift keeps the spectrum away from zero so shallow SLQ is accurate.
        value, _ = logdet(
            lambda s: matvec_sharded(s, vals) + 0.5 * s, jax.random.PRNGKey(0)
        )
        return value

    value, grad = jax.value_and_grad(loss)(vals_sharded)
    dense = jnp.asarray(mat.todense(), jnp.float32) + 0.5 * jnp.eye(n)
    _sign, expected = jnp.linalg.slogdet(dense)
    assert jnp.allclose(value, expected, rtol=0.1, atol=0.5)
    assert jnp.all(jnp.isfinite(jax.flatten_util.ravel_pytree(grad)[0]))
