"""krylov.hessenberg auto-dispatches DIA-tagged operators to the fused kernel."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lanczos_adjoints_tpu.krylov import arnoldi, lanczos
from lanczos_adjoints_tpu.ops import pallas_arnoldi, sparse


def _laplacian_1d(n):
    rows = np.concatenate([np.arange(n), np.arange(n - 1), np.arange(1, n)])
    cols = np.concatenate([np.arange(n), np.arange(1, n), np.arange(n - 1)])
    vals = np.concatenate(
        [np.full(n, 2.0), np.full(n - 1, -1.0), np.full(n - 1, -1.0)]
    ).astype(np.float32)
    return sparse.csr_from_coo(rows, cols, vals, shape=(n, n))


@pytest.fixture()
def _fused_on_cpu(monkeypatch):
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    fused = functools.partial(pallas_arnoldi.hessenberg_dia_fused, interpret=True)
    monkeypatch.setattr(pallas_arnoldi, "hessenberg_dia_fused", fused)


@pytest.mark.parametrize("reortho", ["none", "full"])
def test_dispatch_fires_and_matches_plain(_fused_on_cpu, monkeypatch, reortho):
    mat = _laplacian_1d(256)
    matvec, vals = sparse.sparse_operator(mat, format="dia")

    calls = []
    orig = pallas_arnoldi.hessenberg_dia_fused

    def spy(*a, **k):
        calls.append(a)
        return orig(*a, **k)

    monkeypatch.setattr(pallas_arnoldi, "hessenberg_dia_fused", spy)

    v0 = jax.random.normal(jax.random.PRNGKey(0), (256,), jnp.float32)
    auto = arnoldi.hessenberg(matvec, 8, reortho=reortho)

    plain_mv = sparse.dia_matvec_fn(sparse.dia_pack(mat))
    del plain_mv.dia_data  # untagged: generic path
    plain = arnoldi.hessenberg(plain_mv, 8, reortho=reortho)

    Qa, Ha, ra, ca = auto(v0, vals)
    Qp, Hp, rp, cp = plain(v0, vals)
    assert calls, "fused path was not dispatched"
    assert jnp.allclose(Ha, Hp, atol=1e-4), float(jnp.max(jnp.abs(Ha - Hp)))
    assert jnp.allclose(Qa, Qp, atol=1e-4)
    assert jnp.allclose(ra, rp, atol=1e-4)

    def loss(fn, v, vl):
        Q, H, r, c = fn(v, vl)
        return jnp.sum(H**2) + jnp.sum(Q[:, -1] ** 2)

    ga = jax.grad(loss, argnums=(1, 2))(auto, v0, vals)
    gp = jax.grad(loss, argnums=(1, 2))(plain, v0, vals)
    for a, b in zip(ga, gp):
        assert jnp.allclose(a, b, atol=1e-3), float(jnp.max(jnp.abs(a - b)))


def test_tridiag_full_reortho_dispatches(_fused_on_cpu, monkeypatch):
    """tridiag(reortho='full') runs via Arnoldi and hits the fused kernel."""
    calls = []
    orig = pallas_arnoldi.hessenberg_dia_fused

    def spy(*a, **k):
        calls.append(a)
        return orig(*a, **k)

    monkeypatch.setattr(pallas_arnoldi, "hessenberg_dia_fused", spy)

    mat = _laplacian_1d(256)
    matvec, vals = sparse.sparse_operator(mat, format="dia")
    v0 = jax.random.normal(jax.random.PRNGKey(1), (256,), jnp.float32)
    estimate = lanczos.tridiag(matvec, 6, reortho="full")
    (xs, (al, be)), _rem = estimate(v0, vals)
    assert calls, "tridiag(full) did not reach the fused Arnoldi"
    assert al.shape == (6,)
    assert bool(jnp.all(jnp.isfinite(xs)))


def test_dispatch_falls_back_beyond_depth_cap(_fused_on_cpu, monkeypatch):
    monkeypatch.setattr(
        pallas_arnoldi,
        "hessenberg_dia_fused",
        lambda *a, **k: (_ for _ in ()).throw(AssertionError("fused used")),
    )
    monkeypatch.setattr(arnoldi, "_FUSED_DEPTH_CAP", 4)
    mat = _laplacian_1d(256)
    matvec, vals = sparse.sparse_operator(mat, format="dia")
    est = arnoldi.hessenberg(matvec, 8, reortho="none")
    Q, H, r, c = est(jnp.ones((256,), jnp.float32), vals)
    assert H.shape == (8, 8)


def test_tridiag_full_reortho_dispatches_at_slq_depth(_fused_on_cpu, monkeypatch):
    """K=90 (SLQ-typical, past the unrolled cap) hits the LOOPED fused kernel.

    Round-3 gap: the fused Arnoldi capped at K<=48, so
    ``tridiag(reortho='full')`` at the paper's K=90-250 walltime points
    fell back to the XLA loop.  The looped masked-projection kernel
    lifts the cap; this pins the dispatch AND value agreement.
    """
    dispatch_log = []
    mat = _laplacian_1d(512)
    matvec, vals = sparse.sparse_operator(mat, format="dia")
    v0 = jax.random.normal(jax.random.PRNGKey(2), (512,), jnp.float32)
    estimate = lanczos.tridiag(
        matvec, 90, reortho="full", dispatch_log=dispatch_log
    )
    (xs, (al, be)), _rem = estimate(v0, vals)
    assert "hessenberg:pallas_dia_fused" in dispatch_log, dispatch_log
    assert al.shape == (90,)
    assert bool(jnp.all(jnp.isfinite(xs)))

    plain_mv = sparse.dia_matvec_fn(sparse.dia_pack(mat))
    del plain_mv.dia_data  # untagged: generic path
    generic = lanczos.tridiag(plain_mv, 90, reortho="full")
    (xs_g, (al_g, be_g)), _rem_g = generic(v0, vals)
    # 1-D Laplacian: distinct spectrum, no chaos crossover -- elementwise.
    assert jnp.allclose(al, al_g, atol=1e-3), float(jnp.max(jnp.abs(al - al_g)))
    assert jnp.allclose(be, be_g, atol=1e-3)
