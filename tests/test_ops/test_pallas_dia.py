"""Single-pass Pallas DIA matvec vs the XLA roll-FMA path (interpret)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lanczos_adjoints_tpu.ops import pallas_dia, sparse


def _banded(n, offsets, seed=0):
    rng = np.random.default_rng(seed)
    rows, cols, vals = [], [], []
    idx = np.arange(n)
    for d in offsets:
        ok = (idx + d >= 0) & (idx + d < n)
        rows.append(idx[ok])
        cols.append((idx + d)[ok])
        vals.append(rng.normal(size=ok.sum()))
    return sparse.csr_from_coo(
        np.concatenate(rows), np.concatenate(cols), np.concatenate(vals), shape=(n, n)
    )


@pytest.mark.parametrize("offsets", [(-1, 0, 1), (-130, -7, 0, 7, 130)])
def test_matches_xla_dia(offsets):
    n = 2048
    mat = _banded(n, offsets)
    dia = sparse.dia_pack(mat)
    vals = sparse.dia_values(dia, mat.data).astype(jnp.float32)

    mv_xla = sparse.dia_matvec_fn(dia)
    mv_pl = pallas_dia.dia_matvec_pallas(dia, interpret=True)

    v = jnp.asarray(np.random.default_rng(1).normal(size=n), jnp.float32)
    out_xla = mv_xla(v, vals)
    out_pl = mv_pl(v, vals)
    assert jnp.allclose(out_pl, out_xla, atol=1e-5), float(
        jnp.max(jnp.abs(out_pl - out_xla))
    )


def test_gradients_match_xla_autodiff():
    n = 2048
    offsets = (-128, -1, 0, 1, 128)
    mat = _banded(n, offsets)
    dia = sparse.dia_pack(mat)
    vals = sparse.dia_values(dia, mat.data).astype(jnp.float32)

    mv_xla = sparse.dia_matvec_fn(dia)
    mv_pl = pallas_dia.dia_matvec_pallas(dia, interpret=True)

    v = jnp.asarray(np.random.default_rng(2).normal(size=n), jnp.float32)
    u = jnp.asarray(np.random.default_rng(3).normal(size=n), jnp.float32)

    def loss(mv, vv, vl):
        return jnp.sum(u * mv(vv, vl))

    g_xla = jax.grad(lambda vv, vl: loss(mv_xla, vv, vl), argnums=(0, 1))(v, vals)
    g_pl = jax.grad(lambda vv, vl: loss(mv_pl, vv, vl), argnums=(0, 1))(v, vals)
    assert jnp.allclose(g_pl[0], g_xla[0], atol=1e-5), float(
        jnp.max(jnp.abs(g_pl[0] - g_xla[0]))
    )
    assert jnp.allclose(g_pl[1], g_xla[1], atol=1e-5), float(
        jnp.max(jnp.abs(g_pl[1] - g_xla[1]))
    )


def test_rejects_bad_n():
    mat = _banded(100, (-1, 0, 1))
    dia = sparse.dia_pack(mat)
    with pytest.raises(ValueError, match="multiple"):
        pallas_dia.dia_matvec_pallas(dia)
