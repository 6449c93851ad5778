"""RDMA halo-overlap DIA kernel vs the ppermute operator (interpret mode).

Runs the Pallas TPU interpreter on the 8-virtual-device CPU mesh: the
remote copies, semaphores and barrier execute with real DMA semantics,
so agreement here validates the kernel's communication schedule, not
just the arithmetic.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lanczos_adjoints_tpu import parallel
from lanczos_adjoints_tpu.ops import sparse
from lanczos_adjoints_tpu.parallel import pallas_halo

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)


def _banded(n, offsets):
    rng = np.random.default_rng(3)
    rows, cols, vals = [], [], []
    idx = np.arange(n)
    sym_vals = {}
    for d in offsets:
        ok = (idx + d >= 0) & (idx + d < n)
        rows.append(idx[ok])
        cols.append((idx + d)[ok])
        if d == 0:
            vals.append(4.0 + rng.random(ok.sum()))
        else:
            key = abs(d)
            if key not in sym_vals:
                sym_vals[key] = rng.normal(size=n, scale=0.3)
            v = sym_vals[key]
            # Symmetric values: A[i, i+d] = A[i+d, i].
            vals.append(v[np.minimum(idx[ok], (idx + d)[ok])])
    return sparse.csr_from_coo(
        np.concatenate(rows), np.concatenate(cols), np.concatenate(vals), shape=(n, n)
    )


@pytest.mark.parametrize("offsets", [(-1, 0, 1), (-130, -1, 0, 1, 130)])
def test_halo_kernel_matches_ppermute(offsets):
    n = 16384
    mesh = parallel.device_mesh(8)
    mat = _banded(n, offsets)
    dia = sparse.dia_pack(mat)
    vals = sparse.dia_values(dia, mat.data).astype(jnp.float32)

    ref_matvec = parallel.sharded_dia_operator(dia, mesh)
    halo_matvec = pallas_halo.sharded_dia_operator_pallas(dia, mesh, interpret=True)

    v = jnp.asarray(np.random.default_rng(0).normal(size=n), jnp.float32)
    v_sharded = parallel.shard_rows(v, mesh)
    vals_sharded = parallel.shard_rows(vals, mesh, dim=1)

    out_ref = ref_matvec(v_sharded, vals_sharded)
    out_halo = halo_matvec(v_sharded, vals_sharded)
    assert jnp.allclose(out_halo, out_ref, atol=1e-5), float(
        jnp.max(jnp.abs(out_halo - out_ref))
    )


def test_halo_kernel_gradients_match():
    n = 16384
    offsets = (-128, -1, 0, 1, 128)
    mesh = parallel.device_mesh(8)
    mat = _banded(n, offsets)
    dia = sparse.dia_pack(mat)
    vals = sparse.dia_values(dia, mat.data).astype(jnp.float32)

    ref_matvec = parallel.sharded_dia_operator(dia, mesh)
    halo_matvec = pallas_halo.sharded_dia_operator_pallas(dia, mesh, interpret=True)

    v = jnp.asarray(np.random.default_rng(1).normal(size=n), jnp.float32)
    u = jnp.asarray(np.random.default_rng(2).normal(size=n), jnp.float32)
    v_sharded = parallel.shard_rows(v, mesh)
    vals_sharded = parallel.shard_rows(vals, mesh, dim=1)

    def loss(matvec, vv, vl):
        return jnp.sum(u * matvec(vv, vl))

    g_ref = jax.grad(lambda vv, vl: loss(ref_matvec, vv, vl), argnums=(0, 1))(
        v_sharded, vals_sharded
    )
    g_halo = jax.grad(lambda vv, vl: loss(halo_matvec, vv, vl), argnums=(0, 1))(
        v_sharded, vals_sharded
    )
    assert jnp.allclose(g_halo[0], g_ref[0], atol=1e-4), float(
        jnp.max(jnp.abs(g_halo[0] - g_ref[0]))
    )
    assert jnp.allclose(g_halo[1], g_ref[1], atol=1e-4), float(
        jnp.max(jnp.abs(g_halo[1] - g_ref[1]))
    )


def test_rejects_undersized_local_blocks():
    mesh = parallel.device_mesh(8)
    mat = _banded(1024, (-1, 0, 1))
    dia = sparse.dia_pack(mat)
    with pytest.raises(ValueError, match="divide"):
        pallas_halo.sharded_dia_operator_pallas(dia, mesh)
